"""Stdlib media codec: WAV/PNG round trips (including every PNG scanline
filter type), JPEG/GIF header dimension parsing, clear unsupported errors."""

import struct
import zlib

import pytest

from light_etl_windows_container_poc_spark.operators.media_codec import (
    _png_chunk, build_png_bytes, build_wav_bytes, decode_png, decode_wav,
    gif_dimensions, jpeg_dimensions)


def test_wav_round_trip():
    samples = [0, 100, -32760, 32760, 7]
    raw = build_wav_bytes(samples, sample_rate=12000)
    meta = decode_wav(raw)
    assert meta["sample_rate"] == 12000
    assert meta["n_samples"] == 5
    assert meta["peak_abs"] == 32760
    assert meta["duration_ms"] == 5 * 1000 // 12000
    assert raw[:4] == b"RIFF"  # sniffable by the magic-byte router


def test_png_round_trip_gray_and_rgb():
    px = bytes((3 * i) % 256 for i in range(6 * 4))
    meta = decode_png(build_png_bytes(6, 4, px, color_type=0))
    assert (meta["width"], meta["height"], meta["channels"]) == (6, 4, 1)
    assert meta["pixels"] == px

    rgb = bytes((i * 7) % 256 for i in range(3 * 3 * 3))
    meta = decode_png(build_png_bytes(3, 3, rgb, color_type=2))
    assert meta["channels"] == 3 and meta["pixels"] == rgb


def test_png_all_filter_types_unfilter_correctly():
    # 4x4 gray image, one row per filter type 1..4, hand-filtered
    rows = [bytes([10, 20, 30, 40]), bytes([15, 25, 35, 45]),
            bytes([5, 5, 5, 5]), bytes([200, 100, 50, 25])]

    def sub(row):      # filter 1
        return bytes([(row[i] - (row[i - 1] if i else 0)) & 0xFF
                      for i in range(len(row))])

    def up(row, prev):  # filter 2
        return bytes([(row[i] - prev[i]) & 0xFF for i in range(len(row))])

    def avg(row, prev):  # filter 3
        return bytes([(row[i] - ((row[i - 1] if i else 0) + prev[i]) // 2)
                      & 0xFF for i in range(len(row))])

    def paeth(row, prev):  # filter 4 (left predictor wins on row interior)
        out = []
        for i in range(len(row)):
            a = row[i - 1] if i else 0
            b = prev[i]
            c = prev[i - 1] if i else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out.append((row[i] - pred) & 0xFF)
        return bytes(out)

    raw = (b"\x01" + sub(rows[0])
           + b"\x02" + up(rows[1], rows[0])
           + b"\x03" + avg(rows[2], rows[1])
           + b"\x04" + paeth(rows[3], rows[2]))
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    png = (sig + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", zlib.compress(raw))
           + _png_chunk(b"IEND", b""))
    assert decode_png(png)["pixels"] == b"".join(rows)


def test_png_unsupported_depth_raises():
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)  # 16-bit
    png = sig + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        decode_png(png)


def test_jpeg_and_gif_dimensions():
    # minimal JPEG: SOI + APP0(len 4) + SOF0 (h=480, w=640) …
    sof = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + \
        struct.pack(">HH", 480, 640) + b"\x01\x01\x11\x00"
    jpg = b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 4) + b"JF" + sof
    assert jpeg_dimensions(jpg) == (640, 480)

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
    assert gif_dimensions(gif) == (320, 200)
