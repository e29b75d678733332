"""pHash image near-dup: hash invariances, banding completeness on the
generic fingerprint pairer, and the planted-pair construction."""

from __future__ import annotations

from light_etl_windows_container_poc_spark.operators.dedup import (
    hamming_band_pairs)
from light_etl_windows_container_poc_spark.operators.media_codec import (
    build_png_bytes)
from light_etl_windows_container_poc_spark.operators.multimodal import (
    phash64_png)


def _hash_images(spark, images):
    df = spark.createDataFrame(
        [(i, build_png_bytes(32, 32, px)) for i, px in images],
        "id long, content binary")
    return {r.id: r.phash for r in phash64_png(df).collect()}


def test_phash_is_brightness_invariant(spark):
    """A constant brightness shift moves every DCT coefficient's share
    with the median — the hash must not change (the property that makes
    pHash a PERCEPTUAL hash, not a byte hash)."""
    base = bytes((i * 37 + (i * i) % 101) % 200 for i in range(1024))
    brighter = bytes(min(255, b + 30) for b in base)
    h = _hash_images(spark, [(0, base), (1, brighter)])
    assert h[0] == h[1]


def test_phash_identical_images_collide_and_noise_does_not(spark):
    import hashlib

    def noise(seed):
        return b"".join(hashlib.md5(f"{seed}:{b}".encode()).digest()
                        for b in range(64))

    h = _hash_images(spark, [(0, noise(1)), (1, noise(1)), (2, noise(2))])
    assert h[0] == h[1]
    assert bin(h[0] ^ h[2]).count("1") > 3


def test_hamming_band_pairs_complete_at_radius_3(spark):
    """Every pair within hamming 3 must surface (pigeonhole over the 4
    16-bit chunks); a 4-bit-spread pair must not."""
    base = 0x0123456789ABCDEF
    fps = spark.createDataFrame(
        [(0, base),
         (1, base ^ 0b111),                # hamming 3, one chunk
         (2, base ^ (1 | (1 << 16) | (1 << 32))),  # hamming 3, 3 chunks
         (3, base ^ (1 | (1 << 16) | (1 << 32) | (1 << 48)))],  # hamming 4
        "id long, fp long")
    got = {(r.a_id, r.b_id) for r in
           hamming_band_pairs(fps, "id", "fp", max_hamming=3).collect()}
    assert (0, 1) in got and (0, 2) in got
    assert (0, 3) not in got
    # hamming-4 pairs are out of contract even though banding MAY see
    # them as candidates; the filter cuts them
    assert all(a < b for a, b in got)


def test_planted_corpus_shape(spark, sf_dir):
    """Even/odd partners differ in exactly the strided pixel set; the
    corpus builder must keep the base image byte-identical otherwise."""
    from pyspark.sql import functions as F

    from light_etl_windows_container_poc_spark.catalog import load_tables
    from light_etl_windows_container_poc_spark.operators.media_codec import (
        decode_png)
    from light_etl_windows_container_poc_spark.queries.breadth33 import (
        _phash_corpus)

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    two = {r.doc_id: bytes(r.content) for r in
           _phash_corpus(docs.filter(F.col("doc_id") < 2)).collect()}
    p0 = bytes(decode_png(two[0])["pixels"])
    p1 = bytes(decode_png(two[1])["pixels"])
    diff = [i for i in range(1024) if p0[i] != p1[i]]
    assert diff == [i for i in range(1024) if i % 97 < 2]
    assert all((p0[i] + 6) % 256 == p1[i] for i in diff)


def test_audiofp_is_gain_invariant(spark):
    """Scaling every sample by the same factor scales every frame
    energy identically — no delta sign flips (the property that makes
    the fingerprint perceptual)."""
    import hashlib

    from light_etl_windows_container_poc_spark.operators.media_codec import (
        build_wav_bytes)
    from light_etl_windows_container_poc_spark.operators.multimodal import (
        audiofp64_wav)

    raw = b"".join(hashlib.md5(f"g:{b}".encode()).digest()
                   for b in range(256))
    s = [max(-10000, min(10000,
             int.from_bytes(raw[2 * i:2 * i + 2], "little", signed=True)))
         for i in range(2048)]
    half = [v // 2 for v in s]
    df = spark.createDataFrame(
        [(0, build_wav_bytes(s)), (1, build_wav_bytes(half))],
        "id long, content binary")
    h = {r.id: r.afp for r in audiofp64_wav(df).collect()}
    # v//2 is not an exact scale for odd samples; energies move a hair
    # but the DELTA SIGNS must survive easily
    assert bin(h[0] ^ h[1]).count("1") <= 1


def test_split_keeps_clusters_whole(spark, sf_dir):
    """Every near-dup cluster lands in exactly one split, and no
    threshold pair straddles the boundary (the zero-leakage theorem the
    driver hashes)."""
    from light_etl_windows_container_poc_spark.queries import QUERIES

    out = {r.split: r for r in
           QUERIES["split_leakage_safe"](spark, sf_dir).collect()}
    assert set(out) == {"train", "test"}
    assert all(r.straddling_pairs == 0 for r in out.values())
    assert all(r.n_docs >= r.n_clusters >= 1 for r in out.values())
