"""Vendored PNG codec (pure Python: stdlib zlib + numpy; ISO 15948 / RFC
2083 — public spec, original implementation).

The container ships no image library, and PNG is (with JPEG, already
vendored in operators/jpeg.py) the other dominant real-world image format
— so the multimodal decode path decodes it for real instead of gating it
behind PIL:

- :func:`decode_png` — decoder for EVERY legal IHDR combination: bit
  depths 1/2/4/8/16 (16-bit returns uint16; sub-byte grayscale scales
  to the full 8-bit range per spec §12.5), color types 0 (grayscale),
  2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA); all five row filters
  (None/Sub/Up/Average/Paeth); Adam7 interlace; multi-IDAT streams;
  every chunk CRC-validated.
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


def _row_stride(w: int, ch: int, depth: int) -> int:
    """Bytes per scanline (sub-byte rows pad the last byte, spec §7.2)."""
    return (w * ch * depth + 7) // 8


def _to_byte_rows(arr: np.ndarray, depth: int) -> np.ndarray:
    """(h, w, ch) samples -> (h, stride) scanline bytes (big-endian for
    16-bit, MSB-first bit packing for sub-byte depths)."""
    h, w, ch = arr.shape
    if depth == 16:
        return np.ascontiguousarray(arr.astype(">u2")) \
            .view(np.uint8).reshape(h, -1)
    if depth == 8:
        return arr.reshape(h, -1)
    # sub-byte: each sample contributes its low `depth` bits, MSB first
    bits = np.unpackbits(arr.reshape(h, w * ch, 1).astype(np.uint8),
                         axis=2)[:, :, 8 - depth:]
    return np.packbits(bits.reshape(h, -1), axis=1)


def _bytes_to_samples(rows: np.ndarray, w: int, ch: int,
                      depth: int) -> np.ndarray:
    """(n, stride) scanline bytes -> (n, w, ch) samples (uint16 for
    16-bit, uint8 otherwise; sub-byte row padding bits discarded)."""
    n = rows.shape[0]
    if depth == 16:
        return np.ascontiguousarray(rows).view(">u2") \
            .astype(np.uint16).reshape(n, w, ch)
    if depth == 8:
        return rows.reshape(n, w, ch)
    bits = np.unpackbits(rows, axis=1)
    samples = bits[:, :bits.shape[1] // depth * depth] \
        .reshape(n, -1, depth) \
        .dot(1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return samples[:, :w * ch].reshape(n, w, ch)


def _encode_raster(arr: np.ndarray, depth: int, filter_type,
                   interlace: bool) -> bytearray:
    h, w, ch = arr.shape
    bpp = max(1, ch * depth // 8)
    scan = bytearray()
    if interlace:
        for y0, x0, dy, dx in _ADAM7:
            pw, ph = _pass_dims(w, h, y0, x0, dy, dx)
            if pw and ph:
                scan += _filter_scanlines(
                    _to_byte_rows(np.ascontiguousarray(arr[y0::dy, x0::dx]),
                                  depth), bpp, filter_type)
    else:
        scan += _filter_scanlines(_to_byte_rows(arr, depth),
                                  bpp, filter_type)
    return scan


def make_png(pixels, filter_type: int | None = None,
             idat_chunk_size: int | None = None,
             interlace: bool = False, depth: int | None = None) -> bytes:
    """Encode an (h, w[, ch]) uint8 or uint16 array as a PNG; bit depth
    follows the dtype (uint16 -> 16-bit big-endian samples) unless
    ``depth`` forces a sub-byte depth (1/2/4 — grayscale only, sample
    values must fit the depth). ``ch`` 1/2/3/4 maps to color type
    0/4/2/6. ``filter_type`` forces one row filter; None cycles row % 5
    so fixtures exercise every unfilter path. ``interlace`` emits Adam7
    passes (filter state resets per pass). ``idat_chunk_size`` splits
    the compressed stream across multiple IDAT chunks (real-world
    encoders emit ~8 KB chunks; decoders must concatenate)."""
    arr = np.asarray(pixels)
    if arr.dtype not in (np.uint8, np.uint16):
        raise ValueError(f"pixels must be uint8 or uint16, got {arr.dtype}")
    if depth is None:
        depth = 16 if arr.dtype == np.uint16 else 8
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if depth in (1, 2, 4):
        if ch != 1:
            raise ValueError("sub-byte depth is grayscale-only (color "
                             "types 2/4/6 require depth 8 or 16)")
        if int(arr.max(initial=0)) >= 1 << depth:
            raise ValueError(f"sample values exceed {depth}-bit range")
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    scan = _encode_raster(arr, depth, filter_type, interlace)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0,
                       1 if interlace else 0)
    comp = zlib.compress(bytes(scan), 6)
    if idat_chunk_size:
        idats = b"".join(_chunk(b"IDAT", comp[i:i + idat_chunk_size])
                         for i in range(0, len(comp), idat_chunk_size))
    else:
        idats = _chunk(b"IDAT", comp)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + idats + _chunk(b"IEND", b"")


def make_png_palette(indices, palette, depth: int = 8,
                     interlace: bool = False) -> bytes:
    """Encode an (h, w) index array + (n, 3) palette as a color-type-3
    PNG (filter-0 rows; ``depth`` 1/2/4/8 packs indices sub-byte)."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if depth not in (1, 2, 4, 8):
        raise ValueError("palette depth must be 1/2/4/8")
    if int(idx.max(initial=0)) >= 1 << depth:
        raise ValueError(f"palette indices exceed {depth}-bit range")
    h, w = idx.shape
    scan = _encode_raster(idx[:, :, None], depth, 0, interlace)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0,
                       1 if interlace else 0)
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"PLTE", pal.tobytes())
            + _chunk(b"IDAT", zlib.compress(bytes(scan), 6))
            + _chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG to pixels: (h, w) for grayscale, (h, w, ch) for
    RGB/palette/gray+alpha/RGBA (palette expands to RGB); uint8 for
    depths <= 8 (sub-byte grayscale scaled to 0-255), uint16 for
    16-bit. Handles Adam7 interlace at every depth. Raises ValueError
    on corruption (bad signature, CRC mismatch, truncated raster) or
    spec-illegal depth/color combinations."""
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
    if comp_m or filt_m or color not in _COLOR_CHANNELS \
            or interlace not in (0, 1):
        raise ValueError(f"bad IHDR (compression={comp_m}, filter={filt_m}, "
                         f"color={color}, interlace={interlace})")
    # legal depths per color type (spec table 11.1)
    legal = {0: (1, 2, 4, 8, 16), 3: (1, 2, 4, 8)}.get(color, (8, 16))
    if depth not in legal:
        raise ValueError(f"depth {depth} invalid for color type {color} "
                         f"(legal: {legal})")
    ch = _COLOR_CHANNELS[color]
    bpp = max(1, ch * depth // 8)
    raw = zlib.decompress(bytes(idat))
    if interlace:
        img = np.zeros((h, w, ch),
                       dtype=np.uint16 if depth == 16 else np.uint8)
        off = 0
        for y0, x0, dy, dx in _ADAM7:
            pw, ph = _pass_dims(w, h, y0, x0, dy, dx)
            if pw and ph:
                sub, off = _unfilter_scanlines(
                    raw, off, ph, _row_stride(pw, ch, depth), bpp)
                img[y0::dy, x0::dx] = _bytes_to_samples(sub, pw, ch, depth)
        if off != len(raw):
            raise ValueError(f"raster size {len(raw)} != {off} "
                             "(trailing bytes after last Adam7 pass)")
    else:
        stride = _row_stride(w, ch, depth)
        if len(raw) != (stride + 1) * h:
            raise ValueError(
                f"raster size {len(raw)} != {(stride + 1) * h}")
        byte_rows, _ = _unfilter_scanlines(raw, 0, h, stride, bpp)
        img = _bytes_to_samples(byte_rows, w, ch, depth)
    if color == 0 and depth in (1, 2, 4):
        # sample scaling to full 8-bit range (spec §12.5: exact factors)
        img = img * np.uint8(255 // ((1 << depth) - 1))
    if color == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        if int(img.max(initial=0)) >= len(palette):
            raise ValueError("palette index out of range")
        img = palette[img[:, :, 0]]
    if color == 0:
        return img[:, :, 0]
    return img
