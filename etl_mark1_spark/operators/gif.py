"""Vendored pure-Python GIF codec (palette images, LZW, interlace).

Completes the no-dependency media family beside operators/jpeg.py and
operators/png.py: GIF is the remaining legacy raster format a crawl
corpus actually contains. Implements the public GIF89a specification —
logical screen descriptor, global color table, the GIF variant of LZW
(variable code width from ``min_code_size + 1`` to 12 bits, clear/end
codes, dictionary reset at 4096), sub-block framing, and the four-pass
interlace row order. Extension blocks (graphic control, comments,
application) are skipped on decode, as the spec directs for unknown
content. Animation is out of scope: the first image descriptor is
decoded, matching what thumbnailing pipelines do.

GIF is lossless for palettized content, so the codec is verified by
exact round-trip property fuzz (tests/test_property.py) across image
shapes, palette sizes, and the interlace flag — plus decode of the
degenerate single-color and 1xN shapes where LZW's early dictionary
resets bite.
"""

from __future__ import annotations

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(height: int) -> np.ndarray:
    """Row indices in GIF interlace transmission order."""
    return np.concatenate([np.arange(start, height, step)
                           for start, step in _INTERLACE_PASSES
                           if start < height]).astype(np.int64)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW: emits a bitstream LSB-first, growing the code
    width as the dictionary fills, resetting at 4096 entries."""
    clear = 1 << min_code_size
    end = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, int], int] = {}
    next_code = end + 1
    width = min_code_size + 1

    emit(clear, width)
    prefix = -1
    for k in indices.tolist():
        if prefix < 0:
            prefix = k
            continue
        got = table.get((prefix, k))
        if got is not None:
            prefix = got
            continue
        emit(prefix, width)
        table[(prefix, k)] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code > 4095:
            emit(clear, width)
            table.clear()
            next_code = end + 1
            width = min_code_size + 1
        prefix = k
    if prefix >= 0:
        emit(prefix, width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int,
                expected: int) -> np.ndarray:
    """Inverse of :func:`_lzw_encode`; stops after ``expected`` pixels
    (trailing bits after the end code are padding)."""
    clear = 1 << min_code_size
    end = clear + 1
    base = {i: (i,) for i in range(clear)}

    table = dict(base)
    next_code = end + 1
    width = min_code_size + 1

    out: list[int] = []
    acc = 0
    nbits = 0
    prev: tuple[int, ...] | None = None
    pos = 0
    n = len(data)
    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                raise ValueError("GIF: LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = dict(base)
            next_code = end + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + (prev[0],)      # the KwKwK special case
        else:
            raise ValueError(f"GIF: bad LZW code {code}")
        out.extend(entry)
        if prev is not None and next_code <= 4095:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < expected:
        raise ValueError("GIF: pixel data ended early")
    return np.asarray(out[:expected], dtype=np.uint8)


def make_gif(indices, palette, interlace: bool = False) -> bytes:
    """Encode an (h, w) uint8 index array + (n<=256, 3) palette as a
    single-frame GIF89a with a global color table."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2:
        raise ValueError("indices must be (h, w)")
    if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= pal.shape[0] <= 256:
        raise ValueError("palette must be (n<=256, 3)")
    if idx.max(initial=0) >= pal.shape[0]:
        raise ValueError("index out of palette range")
    h, w = idx.shape

    size_bits = max(1, int(pal.shape[0] - 1).bit_length())
    table = np.zeros((1 << size_bits, 3), dtype=np.uint8)
    table[:pal.shape[0]] = pal
    min_code_size = max(2, size_bits)

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | (7 << 4) | (size_bits - 1))  # global table present
    out += b"\x00\x00"                             # bg color, aspect
    out += table.tobytes()
    out += b"\x2c\x00\x00\x00\x00"                 # image descriptor at 0,0
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x40 if interlace else 0x00)
    rows = idx[_interlace_order(h)] if interlace else idx
    out.append(min_code_size)
    stream = _lzw_encode(rows.reshape(-1), min_code_size)
    for i in range(0, len(stream), 255):
        block = stream[i:i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"                             # block end + trailer
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the first frame of a GIF into an (h, w, 3) RGB uint8 array."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    pos = 6
    sw = int.from_bytes(payload[pos:pos + 2], "little")
    sh = int.from_bytes(payload[pos + 2:pos + 4], "little")
    packed = payload[pos + 4]
    pos += 7
    global_table = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_table = np.frombuffer(
            payload, dtype=np.uint8, count=n * 3, offset=pos).reshape(n, 3)
        pos += n * 3

    while pos < len(payload):
        intro = payload[pos]
        pos += 1
        if intro == 0x21:                          # extension: skip blocks
            pos += 1                               # label
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif intro == 0x2C:                        # image descriptor
            w = int.from_bytes(payload[pos + 4:pos + 6], "little")
            h = int.from_bytes(payload[pos + 6:pos + 8], "little")
            flags = payload[pos + 8]
            pos += 9
            table = global_table
            if flags & 0x80:                       # local color table
                n = 2 << (flags & 0x07)
                table = np.frombuffer(payload, dtype=np.uint8, count=n * 3,
                                      offset=pos).reshape(n, 3)
                pos += n * 3
            if table is None:
                raise ValueError("GIF: no color table")
            min_code_size = payload[pos]
            pos += 1
            chunks = []
            while payload[pos]:
                ln = payload[pos]
                chunks.append(payload[pos + 1:pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(b"".join(chunks), min_code_size, w * h)
            idx = idx.reshape(h, w)
            if flags & 0x40:                       # undo interlacing
                out = np.empty_like(idx)
                out[_interlace_order(h)] = idx
                idx = out
            return table[idx.reshape(-1)].reshape(h, w, 3)
        elif intro == 0x3B:
            break
        else:
            raise ValueError(f"GIF: unknown block 0x{intro:02x}")
    raise ValueError("GIF: no image data")
