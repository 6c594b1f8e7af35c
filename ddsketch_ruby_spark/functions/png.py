"""Minimal pure-Python/NumPy PNG decoder — a REAL image format for the
multimodal pipeline without any image library in the container.

Scope (the common web-image core, everything else raises ValueError and
is absorbed by the operators' poison-pill handling):

- 8-bit samples; color types greyscale (0), RGB (2), grey+alpha (4),
  RGBA (6); non-interlaced. 16-bit, palette, and Adam7 are rejected.
- All five scanline filters (None/Sub/Up/Average/Paeth) per the PNG
  spec (RFC 2083 §6); IDAT may be split across any number of chunks
  (the zlib stream is the concatenation).
- CRCs are VERIFIED for IHDR/IDAT (zlib.crc32) — a truncated or
  bit-flipped crawl blob fails loudly instead of yielding garbage
  pixels.

Color is reduced to 8-bit grayscale with PIL's exact ITU-R 601-2 fixed
point arithmetic — ``L = (19595 R + 38470 G + 7471 B + 32768) >> 16`` —
so a decode through this module is byte-identical to
``PIL.Image.open(...).convert("L")`` for in-scope files (pinned by a
skip-if-no-PIL test). Alpha is ignored (PIL's convert("L") from RGBA
does the same channel drop).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["decode_png", "PNG_SIGNATURE"]

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# channels per pixel by PNG color type (palette omitted on purpose)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering. Returns (height, width*bpp) uint8.
    The row loop is Python but each step is vectorized where the spec
    allows (Sub/Average/Paeth have a serial left-to-right dependency, so
    those run per-byte on the row — test-scale cost only; the production
    decode path is pluggable)."""
    stride = width * bpp
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG: decompressed data length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1)
        pos += stride + 1
        cur = row.astype(np.int32)
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (cur + prev) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(blob: bytes) -> tuple[int, int, np.ndarray]:
    """PNG bytes -> (width, height, flat uint8 grayscale pixels), the
    decoder contract of functions.multimodal.set_image_decoder."""
    if blob[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = None
    idat = bytearray()
    while pos + 8 <= len(blob):
        length, ctype = struct.unpack_from(">I4s", blob, pos)
        data = blob[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(blob):
            raise ValueError("PNG: truncated chunk")
        (crc,) = struct.unpack_from(">I", blob, pos + 8 + length)
        if ctype in (b"IHDR", b"IDAT") and zlib.crc32(ctype + data) != crc:
            raise ValueError(f"PNG: bad CRC in {ctype.decode()} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if bit_depth != 8:
                raise ValueError(f"PNG: unsupported bit depth {bit_depth}")
            if color_type not in _CHANNELS:
                raise ValueError(
                    f"PNG: unsupported color type {color_type} "
                    "(palette/16-bit out of scope)"
                )
            if comp != 0 or filt != 0:
                raise ValueError("PNG: nonstandard compression/filter method")
            if interlace != 0:
                raise ValueError("PNG: Adam7 interlacing unsupported")
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG: missing IHDR or IDAT")
    bpp = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    rows = _unfilter(raw, width, height, bpp)
    px = rows.reshape(height, width, bpp)
    if color_type == 0:
        grey = px[:, :, 0]
    elif color_type == 4:
        grey = px[:, :, 0]  # alpha dropped, as PIL convert("L") does
    else:  # RGB / RGBA: PIL's exact ITU-R 601-2 fixed-point luma
        r = px[:, :, 0].astype(np.uint32)
        g = px[:, :, 1].astype(np.uint32)
        b = px[:, :, 2].astype(np.uint32)
        grey = ((19595 * r + 38470 * g + 7471 * b + 0x8000) >> 16).astype(
            np.uint8
        )
    return int(width), int(height), grey.astype(np.uint8).ravel()
