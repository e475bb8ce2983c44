"""Vendored PNG codec (pure Python: stdlib zlib + numpy; ISO 15948 / RFC
2083 — public spec, original implementation).

The container ships no image library, and PNG is (with JPEG, already
vendored in operators/jpeg.py) the other dominant real-world image format
— so the multimodal decode path decodes it for real instead of gating it
behind PIL:

- :func:`decode_png` — decoder for bit depths 8 and 16 (16-bit returns
  uint16), color types 0 (grayscale), 2 (RGB), 3 (palette), 4
  (gray+alpha), 6 (RGBA); all five row filters (None/Sub/Up/Average/
  Paeth); Adam7 interlace; multi-IDAT streams; every chunk
  CRC-validated. Sub-byte depths (1/2/4) raise ``NotImplementedError``
  — the existing PIL wiring point in multimodal.py:decode_image_bytes
  keeps covering those when installed.
- :func:`make_png` — fixture encoder (the ``make_bmp``/``make_jpeg``
  pattern): 1-4 channels, uint8 or uint16 input (depth follows dtype),
  per-row filter forced or cycled through all five so each unfilter path
  stays exercised, optional Adam7 interlacing and IDAT splitting.
- :func:`make_png_palette` — color-type-3 fixture encoder.

Filtering is BYTE-wise per the spec (§9): the "left" predecessor sits
``bpp`` bytes back where bpp = channels x bytes-per-sample, which is why
one helper pair serves both depths — 16-bit is the same unfilter over a
2x-wide row followed by big-endian sample assembly, and Adam7 is the
same unfilter applied per pass followed by a strided scatter into the
full raster. None and Up are pure row ops, Sub is a per-lane cumulative
sum; Average and Paeth reconstruct sequentially along x (inherent RFC
data dependency) in a bounded per-row loop. Decode runs executor-side
inside mapInPandas batches (multimodal.py:decode_images), so throughput
scales with cores exactly like the BMP/JPEG/WAV decoders.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: channels per color type
_COLOR_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: Adam7 pass grid (spec §8.2): (first row, first col, row step, col step)
_ADAM7 = ((0, 0, 8, 8), (0, 4, 8, 8), (4, 0, 8, 4), (0, 2, 4, 4),
          (2, 0, 4, 2), (0, 1, 2, 2), (1, 0, 2, 1))


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (len(data).to_bytes(4, "big") + tag + data
            + zlib.crc32(tag + data).to_bytes(4, "big"))


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Elementwise Paeth predictor over int arrays (spec §9.4)."""
    p = a.astype(np.int32) + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a,
                    np.where(pb <= pc, b, c))


def _filter_scanlines(rows: np.ndarray, bpp: int,
                      filter_type: int | None) -> bytearray:
    """Filter (n, stride)-byte scanlines for encoding; the previous-row
    state starts at zero (fresh per image AND per Adam7 pass, spec §8.2)."""
    n, stride = rows.shape
    scan = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(n):
        cur = rows[y]
        f = filter_type if filter_type is not None else y % 5
        left = np.zeros(stride, dtype=np.uint8)
        left[bpp:] = cur[:-bpp]
        upleft = np.zeros(stride, dtype=np.uint8)
        upleft[bpp:] = prev[:-bpp]
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - ((left.astype(np.uint16) + prev) // 2) \
                .astype(np.uint8)
        elif f == 4:
            filt = cur - _paeth_vec(left, prev, upleft).astype(np.uint8)
        else:
            raise ValueError(f"filter type {f} out of range 0-4")
        scan.append(f)
        scan += filt.tobytes()
        prev = cur
    return scan


def _unfilter_scanlines(raw: bytes, offset: int, n: int, stride: int,
                        bpp: int) -> tuple[np.ndarray, int]:
    """Unfilter ``n`` scanlines of ``stride`` bytes from ``raw[offset:]``;
    returns ((n, stride) uint8 array, offset past the consumed bytes)."""
    need = offset + (stride + 1) * n
    if len(raw) < need:
        raise ValueError(f"raster truncated: {len(raw)} < {need} bytes")
    out = np.zeros((n, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(n):
        base = offset + y * (stride + 1)
        f = raw[base]
        row = np.frombuffer(raw, np.uint8, stride, base + 1).copy()
        if f == 0:
            cur = row
        elif f == 1:            # Sub: per-lane cumulative sum mod 256
            cur = np.cumsum(
                row.reshape(-1, bpp).astype(np.uint32), axis=0) \
                .astype(np.uint8).reshape(stride)
        elif f == 2:            # Up: vectorized (uint8 wraps mod 256)
            cur = row + prev
        elif f == 3:            # Average: sequential along x (RFC dep)
            acc = row.astype(np.int32)
            pr = prev.astype(np.int32)
            for i in range(stride):
                left = acc[i - bpp] if i >= bpp else 0
                acc[i] = (acc[i] + (left + pr[i]) // 2) & 0xFF
            cur = acc.astype(np.uint8)
        elif f == 4:            # Paeth: sequential along x (RFC dep)
            acc = row.astype(np.int32)
            pr = prev.astype(np.int32)
            for i in range(stride):
                a = acc[i - bpp] if i >= bpp else 0
                b = pr[i]
                c = pr[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                acc[i] = (acc[i] + pred) & 0xFF
            cur = acc.astype(np.uint8)
        else:
            raise ValueError(f"bad row filter {f}")
        out[y] = cur
        prev = cur
    return out, need


def _pass_dims(w: int, h: int, y0: int, x0: int, dy: int, dx: int):
    pw = (w - x0 + dx - 1) // dx if w > x0 else 0
    ph = (h - y0 + dy - 1) // dy if h > y0 else 0
    return pw, ph


def _to_byte_rows(arr: np.ndarray) -> np.ndarray:
    """(h, w, ch) samples -> (h, w*ch*bytes_per_sample) big-endian bytes."""
    h = arr.shape[0]
    if arr.dtype == np.uint16:
        return np.ascontiguousarray(arr.astype(">u2")) \
            .view(np.uint8).reshape(h, -1)
    return arr.reshape(h, -1)


def make_png(pixels, filter_type: int | None = None,
             idat_chunk_size: int | None = None,
             interlace: bool = False) -> bytes:
    """Encode an (h, w[, ch]) uint8 or uint16 array as a PNG; bit depth
    follows the dtype (uint16 -> 16-bit big-endian samples). ``ch``
    1/2/3/4 maps to color type 0/4/2/6. ``filter_type`` forces one row
    filter; None cycles row % 5 so fixtures exercise every unfilter path.
    ``interlace`` emits Adam7 passes (filter state resets per pass).
    ``idat_chunk_size`` splits the compressed stream across multiple IDAT
    chunks (real-world encoders emit ~8 KB chunks; decoders must
    concatenate)."""
    arr = np.asarray(pixels)
    if arr.dtype not in (np.uint8, np.uint16):
        raise ValueError(f"pixels must be uint8 or uint16, got {arr.dtype}")
    depth = 16 if arr.dtype == np.uint16 else 8
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    bpp = ch * depth // 8
    scan = bytearray()
    if interlace:
        for y0, x0, dy, dx in _ADAM7:
            pw, ph = _pass_dims(w, h, y0, x0, dy, dx)
            if pw and ph:
                scan += _filter_scanlines(
                    _to_byte_rows(arr[y0::dy, x0::dx]), bpp, filter_type)
    else:
        scan += _filter_scanlines(_to_byte_rows(arr), bpp, filter_type)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0,
                       1 if interlace else 0)
    comp = zlib.compress(bytes(scan), 6)
    if idat_chunk_size:
        idats = b"".join(_chunk(b"IDAT", comp[i:i + idat_chunk_size])
                         for i in range(0, len(comp), idat_chunk_size))
    else:
        idats = _chunk(b"IDAT", comp)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + idats + _chunk(b"IEND", b"")


def make_png_palette(indices, palette) -> bytes:
    """Encode an (h, w) uint8 index array + (n, 3) palette as a
    color-type-3 PNG (filter 0 rows)."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    scan = bytearray()
    for y in range(h):
        scan.append(0)
        scan += idx[y].tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"PLTE", pal.tobytes())
            + _chunk(b"IDAT", zlib.compress(bytes(scan), 6))
            + _chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG to pixels: (h, w) for grayscale, (h, w, ch) for
    RGB/palette/gray+alpha/RGBA (palette expands to RGB); uint8 for
    8-bit images, uint16 for 16-bit. Handles Adam7 interlace. Raises
    ValueError on corruption (bad signature, CRC mismatch, truncated
    raster) and NotImplementedError on sub-byte (1/2/4) depths."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    header = None
    idat = bytearray()
    palette = None
    while pos + 12 <= len(payload):
        ln = int.from_bytes(payload[pos:pos + 4], "big")
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        if len(data) != ln:
            raise ValueError(f"truncated {tag!r} chunk")
        crc = int.from_bytes(payload[pos + 8 + ln:pos + 12 + ln], "big")
        if zlib.crc32(tag + data) != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            header = struct.unpack(">IIBBBBB", data)
        elif tag == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        # ancillary chunks (tEXt, gAMA, ...) are skipped
        pos += 12 + ln
    if header is None:
        raise ValueError("missing IHDR")
    w, h, depth, color, comp_m, filt_m, interlace = header
    if depth not in (8, 16):
        raise NotImplementedError(
            f"bit depth {depth} not supported (8/16 only; install PIL)")
    if comp_m or filt_m or color not in _COLOR_CHANNELS \
            or interlace not in (0, 1):
        raise ValueError(f"bad IHDR (compression={comp_m}, filter={filt_m}, "
                         f"color={color}, interlace={interlace})")
    if color == 3 and depth == 16:
        raise ValueError("16-bit palette images are invalid (spec table 11.1)")
    ch = _COLOR_CHANNELS[color]
    bpp = ch * depth // 8
    raw = zlib.decompress(bytes(idat))
    if interlace:
        flat = np.zeros((h, w, bpp), dtype=np.uint8)
        off = 0
        for y0, x0, dy, dx in _ADAM7:
            pw, ph = _pass_dims(w, h, y0, x0, dy, dx)
            if pw and ph:
                sub, off = _unfilter_scanlines(raw, off, ph, pw * bpp, bpp)
                flat[y0::dy, x0::dx] = sub.reshape(ph, pw, bpp)
        if off != len(raw):
            raise ValueError(f"raster size {len(raw)} != {off} "
                             "(trailing bytes after last Adam7 pass)")
        byte_rows = flat.reshape(h, w * bpp)
    else:
        if len(raw) != (w * bpp + 1) * h:
            raise ValueError(
                f"raster size {len(raw)} != {(w * bpp + 1) * h}")
        byte_rows, _ = _unfilter_scanlines(raw, 0, h, w * bpp, bpp)
    if depth == 16:
        img = np.ascontiguousarray(byte_rows).view(">u2") \
            .astype(np.uint16).reshape(h, w, ch)
    else:
        img = byte_rows.reshape(h, w, ch)
    if color == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        if int(img.max(initial=0)) >= len(palette):
            raise ValueError("palette index out of range")
        img = palette[img[:, :, 0]]
    if color == 0:
        return img[:, :, 0]
    return img
