from __future__ import annotations

import pytest

from light_etl_windows_container_poc_spark.operators.multimodal import (
    decode_and_featurize, sample_frames, with_media_metadata)


@pytest.fixture()
def media_df(spark):
    rows = [
        (1, bytes.fromhex("ffd8ff") + b"fake jpeg body"),
        (2, bytes.fromhex("89504e470d0a1a0a") + b"fake png body"),
        (3, b"plain bytes no magic here"),
    ]
    return spark.createDataFrame(rows, "id long, content binary")


def test_media_metadata_sniffing(spark, media_df):
    got = {r.id: (r.media_type, r.media_bytes) for r in
           with_media_metadata(media_df).collect()}
    assert got[1][0] == "image/jpeg"
    assert got[2][0] == "image/png"
    assert got[3][0] == "application/octet-stream"
    assert got[3][1] == 25


def test_decode_gated_without_codecs(spark, media_df):
    try:
        import PIL  # noqa: F401
        pytest.skip("PIL present; gate not exercised")
    except ImportError:
        pass
    df = decode_and_featurize(media_df)
    assert df.schema.simpleString().startswith("struct<id:bigint")  # plan builds
    with pytest.raises(Exception) as ei:
        df.collect()
    assert "use_fake_decoder" in str(ei.value) or "PIL" in str(ei.value)


def test_fake_decoder_exercises_full_plumbing(spark, media_df):
    out = decode_and_featurize(media_df, use_fake_decoder=True, feature_dim=8)
    rows = {r.id: r for r in out.collect()}
    assert len(rows) == 3
    assert len(rows[1].features) == 8
    assert all(0.0 <= v <= 1.0 for v in rows[1].features)
    # determinism: same content → same features
    again = {r.id: r.features for r in
             decode_and_featurize(media_df, use_fake_decoder=True,
                                  feature_dim=8).collect()}
    assert again[2] == list(rows[2].features)


def test_sample_frames_fake(spark, media_df):
    out = sample_frames(media_df, every_n=4, use_fake_decoder=True).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.id, []).append(r.frame_idx)
    assert set(by_id) == {1, 2, 3}
    assert by_id[3] == sorted(by_id[3])


def test_resize_media_real_matches_reference(spark):
    """NN-resized PNG pixel sum and decimated WAV peak equal a direct
    numpy/pure-python reference on hand-built media."""
    import numpy as np

    from light_etl_windows_container_poc_spark.operators.media_codec import (
        build_png_bytes, build_wav_bytes)
    from light_etl_windows_container_poc_spark.operators.multimodal import (
        resize_media_real)

    w, h = 10, 6
    px = bytes((5 * x + 11 * y) % 256 for y in range(h) for x in range(w))
    samples = [((i * 7919) % 65521) - 32760 for i in range(101)]
    df = spark.createDataFrame(
        [(1, build_png_bytes(w, h, px)),
         (2, build_wav_bytes(samples, 16000)),
         (3, bytes.fromhex("ffd8ff") + b"jpeg body")],
        "id long, content binary")
    got = {r.id: r.asDict() for r in resize_media_real(df).collect()}

    grid = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
    sx = (np.arange(4) * w) // 4
    sy = (np.arange(4) * h) // 4
    expect_sum = int(grid[np.ix_(sy, sx)].astype(np.int64).sum())
    assert got[1]["media_type"] == "image/png"
    assert (got[1]["width"], got[1]["height"]) == (4, 4)
    assert got[1]["pix_sum"] == expect_sum
    assert got[1]["mean_milli"] == expect_sum * 1000 // (16 * 255)

    dec = samples[::2]
    assert got[2]["media_type"] == "audio/wav"
    assert got[2]["sample_rate"] == 8000
    assert got[2]["n_samples"] == len(dec)
    assert got[2]["peak_abs"] == max(abs(s) for s in dec)

    # no in-image JPEG pixel decode: passthrough with NULL resize cols
    assert got[3]["media_type"] == "image/jpeg"
    assert got[3]["pix_sum"] is None and got[3]["n_samples"] is None
