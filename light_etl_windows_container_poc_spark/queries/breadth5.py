"""Multimodal pipeline as driver-checkable queries.

The container ships no codec libs, so the corpus is a deterministic fake:
each document's text bytes prefixed with a real magic number chosen by
doc_id % 6. That makes the SPARK-side plumbing — binary columns, magic-byte
sniffing, Arrow-batched mapInPandas decode, frame-explode shape — fully
real, while the oracle checks the sniffed type/size against the
construction ground truth (DuckDB lacks blob md5/substring, so metadata
parity is asserted on type + byte length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from .registry import query

# (hex magic, media type) in doc_id % 6 order — mirrors operators.multimodal._MAGIC
_FAKE_MEDIA = [
    ("ffd8ff", "image/jpeg"),
    ("89504e47", "image/png"),
    ("47494638", "image/gif"),
    ("52494646", "audio/wav"),
    ("494433", "audio/mp3"),
    ("1a45dfa3", "video/webm"),
]


def fake_media_corpus(docs: DataFrame) -> DataFrame:
    """(doc_id, content binary): utf-8 text bytes behind a real magic
    prefix selected by doc_id % 6."""
    magic = F.lit(bytes.fromhex(_FAKE_MEDIA[5][0]))
    for i in range(5):
        magic = F.when(F.col("doc_id") % 6 == i,
                       F.lit(bytes.fromhex(_FAKE_MEDIA[i][0]))).otherwise(magic)
    return docs.select(
        "doc_id",
        F.concat(magic, F.encode(F.col("text"), "UTF-8")).alias("content"))


# --------------------------------------------------------------------------
# binary metadata + magic-byte sniffing: the sniffed type must round-trip
# the construction ground truth; byte length = prefix + utf8 text bytes
# --------------------------------------------------------------------------
@query("mm_media_meta", oracle="""
SELECT doc_id,
       CASE doc_id % 6 WHEN 0 THEN 'image/jpeg' WHEN 1 THEN 'image/png'
            WHEN 2 THEN 'image/gif' WHEN 3 THEN 'audio/wav'
            WHEN 4 THEN 'audio/mp3' ELSE 'video/webm' END AS media_type,
       CAST(CASE WHEN doc_id % 6 IN (0, 4) THEN 3 ELSE 4 END
            + octet_length(encode(text)) AS BIGINT) AS media_bytes
FROM documents
ORDER BY doc_id
""")
def mm_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import with_media_metadata

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    corp = fake_media_corpus(docs)
    return (with_media_metadata(corp)
            .select("doc_id", "media_type",
                    F.col("media_bytes").cast("long").alias("media_bytes"))
            .orderBy("doc_id"))


# --------------------------------------------------------------------------
# Arrow-batched decode + featurize. The fake decoder is a pure function
# of the content bytes (sha256 over their hex), so the ENTIRE output —
# dimensions, frame count, and the first feature — is SQL-replayable:
# the oracle rebuilds the binary column relationally and recomputes the
# digest byte via sha256(VARCHAR). round(h0/255*1000) never lands on a
# .5 boundary (200·h0/51 = x.5 has no integer solution), so the
# float32→double path can't flip the rounding.
# --------------------------------------------------------------------------
@query("mm_features", oracle="""
WITH m AS (
  SELECT doc_id,
         CASE doc_id % 6 WHEN 0 THEN 'image/jpeg' WHEN 1 THEN 'image/png'
              WHEN 2 THEN 'image/gif' WHEN 3 THEN 'audio/wav'
              WHEN 4 THEN 'audio/mp3' ELSE 'video/webm' END AS media_type,
         CASE doc_id % 6 WHEN 0 THEN 'ffd8ff' WHEN 1 THEN '89504e47'
              WHEN 2 THEN '47494638' WHEN 3 THEN '52494646'
              WHEN 4 THEN '494433' ELSE '1a45dfa3' END
           || lower(hex(encode(text))) AS content_hex,
         CAST(CASE WHEN doc_id % 6 IN (0, 4) THEN 3 ELSE 4 END
              + octet_length(encode(text)) AS BIGINT) AS len
  FROM documents
), h AS (
  SELECT doc_id, media_type, len, sha256(content_hex) AS sha
  FROM m
)
SELECT doc_id AS id, media_type,
       CAST(len % 1920 AS INT) AS width,
       CAST(len % 1080 AS INT) AS height,
       CAST(1 AS INT) AS n_frames,
       CAST(round(((strpos('0123456789abcdef', substring(sha, 1, 1)) - 1) * 16
                   + strpos('0123456789abcdef', substring(sha, 2, 1)) - 1)
                  / 255.0 * 1000) AS BIGINT) AS f0_milli
FROM h
ORDER BY id
""")
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import decode_and_featurize, sniff_media_type

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    corp = sniff_media_type(fake_media_corpus(docs))
    feats = decode_and_featurize(corp, id_col="doc_id",
                                 use_fake_decoder=True, feature_dim=16)
    return (feats.select("id", "media_type", "width", "height", "n_frames",
                         F.round(F.element_at("features", 1) * 1000, 0)
                         .cast("long").alias("f0_milli"))
            .orderBy("id"))


# --------------------------------------------------------------------------
# frame sampling shape (fake decoder: byte-slice frames). The slice
# geometry is pure length arithmetic — frames = min(max(len//100, 1), 8),
# each 100 bytes except a sub-100-byte file's single short frame — so the
# oracle replays it with a generate_series join.
# --------------------------------------------------------------------------
@query("mm_frame_sample", oracle="""
WITH m AS (
  SELECT doc_id,
         CAST(CASE WHEN doc_id % 6 IN (0, 4) THEN 3 ELSE 4 END
              + octet_length(encode(text)) AS BIGINT) AS len
  FROM documents
)
SELECT m.doc_id AS id,
       CAST(t.i AS INT) AS frame_idx,
       CAST(CASE WHEN m.len < 100 THEN m.len ELSE 100 END AS INT)
         AS frame_len
FROM m JOIN generate_series(0, 7) t(i)
  ON t.i < least(greatest(m.len // 100, 1), 8)
ORDER BY id, frame_idx
""")
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import sample_frames

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    corp = fake_media_corpus(docs)
    frames = sample_frames(corp, id_col="doc_id", every_n=100,
                           use_fake_decoder=True)
    return (frames.select("id", "frame_idx",
                          F.length("frame_bytes").alias("frame_len"))
            .orderBy("id", "frame_idx"))


# --------------------------------------------------------------------------
# REAL decode (stdlib codecs): build genuine WAV (even doc_ids) and PNG
# (odd doc_ids) files from doc_id-deterministic signal/pixel functions,
# decode them distributed (wave/zlib — operators/media_codec.py), and
# oracle-check the DECODED properties (rate, samples, duration, peak
# amplitude, dimensions, mean pixel) against the construction arithmetic.
# --------------------------------------------------------------------------
def _real_media_corpus(docs: DataFrame) -> DataFrame:
    import pandas as pd

    def build(batches):
        from ..operators.media_codec import build_png_bytes, build_wav_bytes

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                d = int(r["doc_id"])
                if d % 2 == 0:
                    n = 160 + d % 50
                    rate = 8000 + (d % 3) * 4000
                    samples = [((d * 131 + i * 7919) % 65521) - 32760
                               for i in range(n)]
                    content = build_wav_bytes(samples, rate)
                else:
                    w, h = 8 + d % 9, 8 + d % 7
                    px = bytes((d + 3 * x + 7 * y) % 256
                               for y in range(h) for x in range(w))
                    content = build_png_bytes(w, h, px)
                rows.append({"doc_id": d, "content": content})
            yield pd.DataFrame(rows, columns=["doc_id", "content"])

    return docs.select("doc_id").mapInPandas(build,
                                             "doc_id long, content binary")


@query("mm_decode_real", oracle="""
WITH wav AS (
  SELECT doc_id, 8000 + (doc_id % 3) * 4000 AS sample_rate,
         160 + doc_id % 50 AS n_samples
  FROM documents WHERE doc_id % 2 = 0
),
wav_i AS (
  SELECT doc_id, unnest(range(0, n_samples)) AS i FROM wav
),
wav_peak AS (
  SELECT doc_id,
         max(abs((doc_id * 131 + i * 7919) % 65521 - 32760)) AS peak_abs
  FROM wav_i GROUP BY doc_id
),
png AS (
  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
  FROM documents WHERE doc_id % 2 = 1
),
png_x AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM png),
png_xy AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM png_x),
png_mean AS (
  SELECT doc_id, w, h,
         CAST(floor(sum((doc_id + 3 * x + 7 * y) % 256) * 1000.0
                    / (w * h * 255)) AS BIGINT) AS mean_milli
  FROM png_xy GROUP BY doc_id, w, h
)
SELECT wav.doc_id, 'audio/wav' AS media_type,
       CAST(sample_rate AS BIGINT) AS sample_rate,
       CAST(n_samples AS BIGINT) AS n_samples,
       CAST(floor(n_samples * 1000.0 / sample_rate) AS BIGINT) AS duration_ms,
       CAST(peak_abs AS BIGINT) AS peak_abs,
       NULL AS width, NULL AS height, NULL AS mean_milli
FROM wav JOIN wav_peak USING (doc_id)
UNION ALL
SELECT doc_id, 'image/png', NULL, NULL, NULL, NULL,
       CAST(w AS BIGINT), CAST(h AS BIGINT), mean_milli
FROM png_mean
ORDER BY doc_id
""")
def mm_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import decode_media_real

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    corp = _real_media_corpus(docs)
    return (decode_media_real(corp, id_col="doc_id")
            .withColumnRenamed("id", "doc_id")
            .orderBy("doc_id"))


# --------------------------------------------------------------------------
# REAL resize on the same corpus: PNGs nearest-neighbor-resampled to 4×4
# on the DECODED pixel grid (numpy index gather), WAVs decimated 2× on
# the DECODED samples. Every output is integer-exact, and the fake
# corpus's formulaic pixels/samples let the oracle replay the exact
# nearest-neighbor geometry — src = (dst·size) // target — relationally:
# the hash match certifies decode → resample → reduce end-to-end.
# --------------------------------------------------------------------------
@query("mm_resize_real", oracle="""
WITH png AS (
  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
  FROM documents WHERE doc_id % 2 = 1
),
gx AS (SELECT doc_id, w, h, unnest(range(0, 4)) AS x2 FROM png),
gxy AS (SELECT doc_id, w, h, x2, unnest(range(0, 4)) AS y2 FROM gx),
pm AS (
  SELECT doc_id,
         CAST(sum((doc_id + 3 * ((x2 * w) // 4) + 7 * ((y2 * h) // 4))
                  % 256) AS BIGINT) AS pix_sum
  FROM gxy GROUP BY doc_id
),
wav AS (
  SELECT doc_id, 8000 + (doc_id % 3) * 4000 AS rate,
         160 + doc_id % 50 AS n
  FROM documents WHERE doc_id % 2 = 0
),
wi AS (SELECT doc_id, rate, n, unnest(range(0, n, 2)) AS i FROM wav),
wp AS (
  SELECT doc_id,
         CAST(max(abs((doc_id * 131 + i * 7919) % 65521 - 32760)) AS BIGINT)
           AS peak_abs,
         CAST(count(*) AS BIGINT) AS n2
  FROM wi GROUP BY doc_id
)
SELECT pm.doc_id, 'image/png' AS media_type,
       CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
       pm.pix_sum, CAST(pm.pix_sum * 1000 // 4080 AS INT) AS mean_milli,
       CAST(NULL AS INT) AS sample_rate, CAST(NULL AS INT) AS n_samples,
       CAST(NULL AS INT) AS peak_abs
FROM pm
UNION ALL
SELECT wav.doc_id, 'audio/wav', NULL, NULL, NULL, NULL,
       CAST(wav.rate // 2 AS INT), CAST(wp.n2 AS INT),
       CAST(wp.peak_abs AS INT)
FROM wav JOIN wp USING (doc_id)
ORDER BY doc_id
""")
def mm_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The named fourth multimodal primitive (decode / featurize /
    RESIZE / frame-sample): nearest-neighbor image resample + audio
    decimation on genuinely decoded bytes, Arrow-batched mapInPandas,
    integer-exact outputs. No extra shuffle — the resize rides the
    binary scan exactly like the decode ops."""
    from ..operators.multimodal import resize_media_real

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    corp = _real_media_corpus(docs)
    return (resize_media_real(corp, id_col="doc_id")
            .withColumnRenamed("id", "doc_id")
            .orderBy("doc_id"))
