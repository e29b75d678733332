"""Stdlib-only media codecs — REAL decode for the formats that need no
external library, used by the multimodal operators' executor-side step.

- WAV (RIFF/PCM): full decode via the stdlib ``wave`` module + struct —
  sample rate, channels, samples, peak amplitude.
- PNG: full pixel decode via zlib — chunk walk, IDAT inflate, complete
  scanline un-filtering (None/Sub/Up/Average/Paeth), 8-bit gray/RGB/RGBA.
- JPEG / GIF: header-level decode (dimensions from SOF segments / the
  logical screen descriptor) — pixel decode genuinely needs libjpeg-class
  codecs, which stay behind the existing gated path.

Writers (`build_wav_bytes`, `build_png_bytes`) produce real files for
tests and the `mm_decode_real` oracle query, mirroring how the xlsx
codec (sources/xlsx.py) made the Excel path fully testable in-image.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib


# -- WAV --------------------------------------------------------------------

def build_wav_bytes(samples: list[int], sample_rate: int = 8000,
                    channels: int = 1) -> bytes:
    """16-bit PCM WAV from integer samples (interleaved if channels>1)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(raw: bytes, return_samples: bool = False) -> dict:
    """Real RIFF/PCM decode: header metadata + samples + peak amplitude.
    ``return_samples`` adds the decoded sample tuple for resampling ops."""
    with wave.open(io.BytesIO(raw), "rb") as w:
        channels = w.getnchannels()
        rate = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        frames = w.readframes(n)
    if width != 2:
        raise NotImplementedError(f"only 16-bit PCM supported, got {width*8}-bit")
    samples = struct.unpack(f"<{n * channels}h", frames)
    out = {
        "sample_rate": rate,
        "channels": channels,
        "n_samples": n,
        "duration_ms": n * 1000 // rate,
        "peak_abs": max((abs(s) for s in samples), default=0),
    }
    if return_samples:
        out["samples"] = samples
    return out


# -- PNG --------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type → samples per pixel


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data)))


def build_png_bytes(width: int, height: int, pixels: bytes,
                    color_type: int = 0) -> bytes:
    """Minimal real PNG (8-bit, filter 0 rows). ``pixels`` is the raw
    scanline data row-major, ``channels`` bytes per pixel."""
    ch = _PNG_CHANNELS[color_type]
    stride = width * ch
    raw = b"".join(b"\x00" + pixels[y * stride:(y + 1) * stride]
                   for y in range(height))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(raw: bytes) -> dict:
    """Real PNG decode: chunk walk → inflate → un-filter every scanline
    (all five filter types). Returns dims/channels plus the recovered
    pixel bytes. 8-bit depth, non-interlaced, gray/RGB/gray+alpha/RGBA."""
    if raw[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, width = 8, None
    idat = bytearray()
    while pos + 8 <= len(raw):
        (length,), typ = struct.unpack(">I", raw[pos:pos + 4]), raw[pos + 4:pos + 8]
        data = raw[pos + 8:pos + 8 + length]
        if typ == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if depth != 8:
                raise NotImplementedError(f"bit depth {depth} unsupported")
            if interlace:
                raise NotImplementedError("interlaced PNG unsupported")
            if color not in _PNG_CHANNELS:
                raise NotImplementedError(f"color type {color} unsupported")
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    ch = _PNG_CHANNELS[color]
    stride = width * ch
    flat = zlib.decompress(bytes(idat))
    out = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = flat[row_start]
        row = bytearray(flat[row_start + 1:row_start + 1 + stride])
        if ftype == 1:    # Sub
            for i in range(ch, stride):
                row[i] = (row[i] + row[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                row[i] = (row[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                upleft = prev[i - ch] if i >= ch else 0
                row[i] = (row[i] + _paeth(left, prev[i], upleft)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter {ftype}")
        out += row
        prev = row
    return {"width": width, "height": height, "channels": ch,
            "pixels": bytes(out)}


# -- JPEG / GIF header decode ----------------------------------------------

_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def jpeg_dimensions(raw: bytes) -> tuple[int, int]:
    """(width, height) from the first SOF segment — header-level decode."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            pos += 1
            continue
        marker = raw[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seg_len = struct.unpack(">H", raw[pos + 2:pos + 4])[0]
        if marker in _JPEG_SOF:
            h, w = struct.unpack(">HH", raw[pos + 5:pos + 9])
            return w, h
        pos += 2 + seg_len
    raise ValueError("JPEG has no SOF segment")


def gif_dimensions(raw: bytes) -> tuple[int, int]:
    """(width, height) from the logical screen descriptor."""
    if raw[:3] != b"GIF":
        raise ValueError("not a GIF")
    w, h = struct.unpack("<HH", raw[6:10])
    return w, h
