"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata; transforms
run as Arrow-batched mapInPandas so each executor decodes its own batch.

Decode is REAL where stdlib codecs suffice (`decode_media_real`: WAV via
wave/struct, PNG via zlib with full scanline un-filtering, JPEG/GIF
header dimensions — see operators/media_codec.py). Formats that genuinely
need external libs (JPEG pixels, video frames) stay behind a gated error,
with a deterministic fake for exercising the full Spark-side path
(schema contract, batching, partitioning) in tests and downstream ops.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# magic-byte sniffing — pure JVM expression, no decode needed
_MAGIC = {
    "ffd8ff": "image/jpeg",
    "89504e47": "image/png",
    "47494638": "image/gif",
    "52494646": "audio/wav",   # RIFF
    "494433": "audio/mp3",     # ID3
    "1a45dfa3": "video/webm",  # EBML (webm/mkv)
}


def sniff_media_type(df: DataFrame, content_col: str = "content",
                     out_col: str = "media_type") -> DataFrame:
    """Content-type from magic bytes as a CASE expression over hex(prefix)."""
    prefix = F.lower(F.hex(F.expr(f"substring({content_col}, 1, 8)")))
    expr = F.lit("application/octet-stream")
    for magic, mtype in reversed(list(_MAGIC.items())):
        expr = F.when(prefix.startswith(magic), F.lit(mtype)).otherwise(expr)
    return df.withColumn(out_col, expr)


def with_media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Typed metadata columns: byte length, md5, sniffed type."""
    out = df.withColumn("media_bytes", F.length(F.col(content_col)))
    out = out.withColumn("media_md5", F.md5(F.col(content_col)))
    return sniff_media_type(out, content_col)


_FEATURE_SCHEMA = ("id long, media_type string, width int, height int, "
                   "n_frames int, features array<float>")


def _fake_features(raw: bytes, dim: int = 16) -> list[float]:
    """Deterministic pseudo-features from content bytes (test double for
    the real decoder: same shape, stable values). Hashes the lowercase
    HEX of the bytes, not the bytes: still a pure content function, but
    any SQL engine can replicate it (sha256 over VARCHAR is portable;
    over BLOB it isn't) — the mm_features driver oracle depends on it."""
    h = hashlib.sha256(raw.hex().encode("ascii")).digest()
    return [h[i % len(h)] / 255.0 for i in range(dim)]


def decode_and_featurize(df: DataFrame, id_col: str = "id",
                         content_col: str = "content",
                         use_fake_decoder: bool = False,
                         feature_dim: int = 16) -> DataFrame:
    """Decode media and extract (width, height, n_frames, feature vector).

    Real decode requires PIL/av (NOT in this image) → clear
    NotImplementedError on executors. ``use_fake_decoder=True`` swaps in a
    deterministic content-hash featurizer so the distributed plumbing is
    fully exercisable without codecs.
    """

    from ..session import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not use_fake_decoder:
            try:
                import PIL.Image  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "media decode requires PIL/av which this image does not "
                    "ship; pass use_fake_decoder=True to exercise the "
                    "pipeline, or add the codec libs to the cluster image."
                ) from e
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                raw = bytes(r[content_col])
                rows.append({
                    "id": r[id_col],
                    "media_type": r.get("media_type", "application/octet-stream"),
                    "width": len(raw) % 1920,      # fake-decoder stand-ins
                    "height": len(raw) % 1080,
                    "n_frames": 1,
                    "features": _fake_features(raw, feature_dim),
                })
            yield pd.DataFrame(rows, columns=["id", "media_type", "width",
                                              "height", "n_frames", "features"])

    cols = [id_col, content_col] + (
        ["media_type"] if "media_type" in df.columns else [])
    return df.select(*cols).mapInPandas(run, _FEATURE_SCHEMA)


_REAL_DECODE_SCHEMA = (
    "id long, media_type string, sample_rate int, n_samples int, "
    "duration_ms int, peak_abs int, width int, height int, mean_milli int")


def decode_media_real(df: DataFrame, id_col: str = "id",
                      content_col: str = "content") -> DataFrame:
    """REAL media decode with the stdlib codecs (`operators/media_codec`):
    WAV → sample rate / count / duration / peak amplitude; PNG → full
    pixel decode (un-filtered scanlines) → dimensions + mean-pixel
    milli-units; JPEG/GIF → header dimensions. Formats needing external
    codec libraries keep the gated `decode_and_featurize` path.

    Same distributed shape as every decode here: Arrow-batched
    mapInPandas, one file per row, executor-side work only.
    """
    from ..session import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .media_codec import (decode_png, decode_wav, gif_dimensions,
                                  jpeg_dimensions)

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                raw = bytes(r[content_col])
                out = {"id": r[id_col], "media_type": None,
                       "sample_rate": None, "n_samples": None,
                       "duration_ms": None, "peak_abs": None,
                       "width": None, "height": None, "mean_milli": None}
                if raw[:4] == b"RIFF":
                    meta = decode_wav(raw)
                    out.update(media_type="audio/wav",
                               sample_rate=meta["sample_rate"],
                               n_samples=meta["n_samples"],
                               duration_ms=meta["duration_ms"],
                               peak_abs=meta["peak_abs"])
                elif raw[:8] == b"\x89PNG\r\n\x1a\n":
                    meta = decode_png(raw)
                    px = meta["pixels"]
                    denom = meta["width"] * meta["height"] * meta["channels"] * 255
                    out.update(media_type="image/png",
                               width=meta["width"], height=meta["height"],
                               mean_milli=sum(px) * 1000 // max(denom, 1))
                elif raw[:2] == b"\xff\xd8":
                    w, h = jpeg_dimensions(raw)
                    out.update(media_type="image/jpeg", width=w, height=h)
                elif raw[:3] == b"GIF":
                    w, h = gif_dimensions(raw)
                    out.update(media_type="image/gif", width=w, height=h)
                else:
                    out["media_type"] = "application/octet-stream"
                rows.append(out)
            yield pd.DataFrame(rows, columns=[
                "id", "media_type", "sample_rate", "n_samples",
                "duration_ms", "peak_abs", "width", "height", "mean_milli"])

    return df.select(id_col, content_col).mapInPandas(run, _REAL_DECODE_SCHEMA)


def sample_frames(df: DataFrame, id_col: str = "id",
                  content_col: str = "content", every_n: int = 10,
                  use_fake_decoder: bool = False) -> DataFrame:
    """Frame sampling for video columns: one output row per sampled frame
    (id, frame_idx, frame_bytes). Fake decoder emits byte-slice frames so
    the explode/repartition shape is real."""

    from ..session import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not use_fake_decoder:
            try:
                import av  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "video decode requires PyAV; pass use_fake_decoder=True "
                    "to exercise the pipeline shape.") from e
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                raw = bytes(r[content_col])
                n = max(len(raw) // max(every_n, 1), 1)
                for i in range(min(n, 8)):
                    rows.append({"id": r[id_col], "frame_idx": i,
                                 "frame_bytes": raw[i * every_n:(i + 1) * every_n]})
            yield pd.DataFrame(rows, columns=["id", "frame_idx", "frame_bytes"])

    return (df.select(id_col, content_col)
            .mapInPandas(run, "id long, frame_idx int, frame_bytes binary"))


_RESIZE_SCHEMA = (
    "id long, media_type string, width int, height int, pix_sum long, "
    "mean_milli int, sample_rate int, n_samples int, peak_abs int")


def resize_media_real(df: DataFrame, id_col: str = "id",
                      content_col: str = "content", target_w: int = 4,
                      target_h: int = 4, audio_decimate: int = 2) -> DataFrame:
    """REAL media resizing with the stdlib codecs: PNG → nearest-neighbor
    resample to (target_w, target_h) on the decoded pixel grid (numpy
    integer-index gather — src = floor(dst·size/target)); WAV →
    decimation resample (every ``audio_decimate``-th sample, rate
    divided to match). Formats without an in-image pixel decode (JPEG,
    GIF, video) pass through with NULL resize columns rather than
    pretending.

    Same distributed shape as the decodes: Arrow-batched mapInPandas,
    one file per row, executor-side work only — at 100 TB the resize
    cost rides the existing scan, no extra shuffle. Outputs are
    integer-exact (pixel sum, milli mean, peak) so the transform is
    oracle-checkable end-to-end.
    """
    from ..session import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .media_codec import decode_png, decode_wav

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                raw = bytes(r[content_col])
                out = {"id": r[id_col], "media_type": None, "width": None,
                       "height": None, "pix_sum": None, "mean_milli": None,
                       "sample_rate": None, "n_samples": None,
                       "peak_abs": None}
                if raw[:8] == b"\x89PNG\r\n\x1a\n":
                    meta = decode_png(raw)
                    w, h, ch = meta["width"], meta["height"], meta["channels"]
                    px = np.frombuffer(bytes(meta["pixels"]),
                                       dtype=np.uint8).reshape(h, w * ch)
                    # nearest-neighbor gather on the first channel plane
                    gray = px[:, ::ch] if ch > 1 else px
                    sx = (np.arange(target_w) * w) // target_w
                    sy = (np.arange(target_h) * h) // target_h
                    small = gray[np.ix_(sy, sx)]
                    total = int(small.astype(np.int64).sum())
                    out.update(media_type="image/png", width=target_w,
                               height=target_h, pix_sum=total,
                               mean_milli=total * 1000
                               // (target_w * target_h * 255))
                elif raw[:4] == b"RIFF":
                    meta = decode_wav(raw, return_samples=True)
                    sm = np.asarray(meta["samples"],
                                    dtype=np.int64)[::audio_decimate]
                    out.update(media_type="audio/wav",
                               sample_rate=meta["sample_rate"]
                               // audio_decimate,
                               n_samples=int(sm.size),
                               peak_abs=int(np.abs(sm).max()) if sm.size
                               else 0)
                elif raw[:2] == b"\xff\xd8":
                    out["media_type"] = "image/jpeg"
                elif raw[:3] == b"GIF":
                    out["media_type"] = "image/gif"
                else:
                    out["media_type"] = "application/octet-stream"
                rows.append(out)
            yield pd.DataFrame(rows, columns=[
                "id", "media_type", "width", "height", "pix_sum",
                "mean_milli", "sample_rate", "n_samples", "peak_abs"])

    return df.select(id_col, content_col).mapInPandas(run, _RESIZE_SCHEMA)


def phash64_png(df: DataFrame, id_col: str = "id",
                content_col: str = "content") -> DataFrame:
    """64-bit perceptual hash per PNG image → (id, phash).

    The standard pHash recipe on the REAL decode path: zlib PNG decode
    (operators/media_codec.decode_png), grayscale pixel grid → 2-D
    DCT-II (float64 cosine-matrix GEMM — bit-stable), keep the 8×8
    low-frequency block minus the DC term, threshold the 63
    coefficients at their median. Brightness/contrast shifts move every
    coefficient with the median, so the bits survive them — the
    property that makes pHash the image near-dup fingerprint.
    Downstream pairing is dedup.hamming_band_pairs (16-bit chunk
    banding, pigeonhole-complete at hamming ≤ 3) — the SAME candidate
    discipline as simhash, so image dedup rides the text-dedup
    machinery. Arrow-batched; the DCT basis is built once per batch.
    """
    from ..session import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .media_codec import decode_png

        basis: dict[int, "np.ndarray"] = {}

        def dct_matrix(n: int):
            if n not in basis:
                i = np.arange(n)[:, None]
                j = np.arange(n)[None, :]
                basis[n] = np.cos(np.pi * (2 * j + 1) * i / (2 * n))
            return basis[n]

        for pdf in batches:
            ids, hashes = [], []
            for _, r in pdf.iterrows():
                meta = decode_png(bytes(r[content_col]))
                w, h, ch = meta["width"], meta["height"], meta["channels"]
                px = (np.frombuffer(bytes(meta["pixels"]), dtype=np.uint8)
                      .astype(np.float64).reshape(h, w * ch))
                if ch > 1:  # luma = channel mean (deterministic, exact)
                    px = px.reshape(h, w, ch).mean(axis=2)
                c = dct_matrix(h) @ px @ dct_matrix(w).T
                vals = np.delete(c[:8, :8].ravel(), 0)
                med = np.median(vals)
                bits = 0
                for k, v in enumerate(vals):
                    if v > med:
                        bits |= 1 << k
                ids.append(r[id_col])
                hashes.append(bits)
            yield pd.DataFrame({"id": np.array(ids, dtype=np.int64),
                                "phash": np.array(hashes, dtype=np.int64)})

    return df.select(id_col, content_col).mapInPandas(
        run, "id long, phash long")


def audiofp64_wav(df: DataFrame, id_col: str = "id",
                  content_col: str = "content",
                  n_frames: int = 64) -> DataFrame:
    """63-bit energy-delta audio fingerprint per WAV clip → (id, afp).

    The Haitsma–Kalker shape reduced to its integer-exact core: real
    RIFF/PCM decode (operators/media_codec.decode_wav), samples framed
    into ``n_frames`` windows, per-frame energy = Σ sample² (exact
    BIGINT), bit j = energy[j] > energy[j+1]. Energy-delta SIGNS are
    what survive gain changes and small edits — a constant gain scales
    every energy by the same factor and flips no bit. Pairing rides the
    same dedup.hamming_band_pairs banding as simhash and pHash.
    """
    from ..session import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .media_codec import decode_wav

        for pdf in batches:
            ids, fps = [], []
            for _, r in pdf.iterrows():
                s = decode_wav(bytes(r[content_col]),
                               return_samples=True)["samples"]
                w = len(s) // n_frames
                a = np.asarray(s[:w * n_frames], dtype=np.int64)
                e = (a * a).reshape(n_frames, w).sum(axis=1)
                # int64-exact: |sample| <= 2^15 so each frame energy is
                # <= w * 2^30 — no overflow for any realistic frame
                bits = 0
                for j in range(n_frames - 1):
                    if e[j] > e[j + 1]:
                        bits |= 1 << j
                ids.append(r[id_col])
                fps.append(bits)
            yield pd.DataFrame({"id": np.array(ids, dtype=np.int64),
                                "afp": np.array(fps, dtype=np.int64)})

    return df.select(id_col, content_col).mapInPandas(
        run, "id long, afp long")
