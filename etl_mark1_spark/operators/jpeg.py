"""Vendored baseline JPEG codec (pure Python + numpy, ITU-T T.81).

The container ships no image library, but JPEG is the dominant real-world
image format — so the multimodal decode path (operators/multimodal.py)
vendors a baseline-sequential codec instead of gating JPEG behind PIL:

- :func:`decode_jpeg` — baseline/extended-sequential (SOF0/SOF1) decoder:
  8-bit samples, 1 or 3 components, ANY sampling factors (4:4:4, 4:2:0,
  4:2:2, ...), restart intervals. Progressive (SOF2) and arithmetic coding
  raise ``NotImplementedError`` (the PIL wiring point keeps covering those).
- :func:`make_jpeg` — fixture encoder (the ``make_bmp``/``make_wav``
  pattern): grayscale or YCbCr, optional 4:2:0 subsampling and restart
  intervals, quality-scaled Annex-K quantization. Huffman tables are built
  from the image's own symbol set (canonical, fixed length) rather than the
  Annex-K defaults — any prefix code is legal JPEG, and generated tables
  keep this implementation self-contained.

Scale note: the codec is driver-free — it runs inside ``mapInPandas``
batches on executors (multimodal.py:decode_images), so throughput scales
with cores exactly like the BMP/WAV decoders. A per-row pure-Python
Huffman loop is the honest price of a no-dependency container; swap in
PIL/turbojpeg via the existing fallback when the environment has it.
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# shared tables
# --------------------------------------------------------------------------


def _zigzag() -> list[tuple[int, int]]:
    """(row, col) of the k-th coefficient in zigzag scan order."""
    out: list[tuple[int, int]] = []
    for s in range(15):
        diag = [(y, s - y) for y in range(8) if 0 <= s - y < 8]
        out.extend(diag[::-1] if s % 2 == 0 else diag)
    return out


ZIGZAG = _zigzag()
_ZZ_ROWS = np.array([r for r, _ in ZIGZAG])
_ZZ_COLS = np.array([c for _, c in ZIGZAG])


def _dct_matrix() -> np.ndarray:
    a = np.zeros((8, 8))
    for u in range(8):
        cu = (1 / np.sqrt(2)) if u == 0 else 1.0
        a[u] = cu / 2 * np.cos((2 * np.arange(8) + 1) * u * np.pi / 16)
    return a


_DCT = _dct_matrix()          # forward: C @ B @ C.T ; inverse: C.T @ F @ C

#: Annex-K base quantization tables (row-major), scaled by ``quality``.
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]).reshape(8, 8)


def _scaled_table(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over a de-stuffed entropy segment."""

    __slots__ = ("buf", "pos", "acc", "n")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.buf):
                raise ValueError("truncated JPEG scan")
            self.acc = self.buf[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, count: int) -> int:
        v = 0
        for _ in range(count):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _read_huff(reader: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG scan")


def _parse_dht(seg: bytes, tables: dict) -> None:
    i = 0
    while i < len(seg):
        tc_th = seg[i]
        counts = list(seg[i + 1:i + 17])
        i += 17
        table: dict = {}
        code = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                table[(length, code)] = seg[i]
                code += 1
                i += 1
            code <<= 1
        tables[(tc_th >> 4, tc_th & 15)] = table


def _parse_dqt(seg: bytes, tables: dict) -> None:
    i = 0
    while i < len(seg):
        pq, tq = seg[i] >> 4, seg[i] & 15
        i += 1
        if pq:
            vals = np.frombuffer(seg[i:i + 128], dtype=">u2").astype(np.int32)
            i += 128
        else:
            vals = np.frombuffer(seg[i:i + 64], dtype=np.uint8) \
                .astype(np.int32)
            i += 64
        tbl = np.zeros((8, 8), dtype=np.int32)
        tbl[_ZZ_ROWS, _ZZ_COLS] = vals
        tables[tq] = tbl


def _decode_block(reader: _BitReader, dc_tab: dict, ac_tab: dict,
                  pred: int) -> tuple[np.ndarray, int]:
    coefs = np.zeros(64, dtype=np.int32)
    s = _read_huff(reader, dc_tab)
    pred += _extend(reader.bits(s), s) if s else 0
    coefs[0] = pred
    k = 1
    while k < 64:
        rs = _read_huff(reader, ac_tab)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:        # ZRL: sixteen zeros
                k += 16
                continue
            break              # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        coefs[k] = _extend(reader.bits(s), s)
        k += 1
    return coefs, pred


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to uint8 pixels: (h, w, 3) RGB for color,
    (h, w) for grayscale. Reference semantics target: what
    ``duckdb_engine.py``-era stacks get from any stock JPEG decoder —
    this exists so the multimodal path needs no image library."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    scan: bytes | None = None
    scan_map: list[tuple[int, int]] = []          # per component (dc, ac)

    i = 2
    while i + 1 < len(payload):
        if payload[i] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[i + 1]
        i += 2
        if marker == 0xD9 or 0xD0 <= marker <= 0xD8 or marker == 0x01:
            continue
        ln = int.from_bytes(payload[i:i + 2], "big")
        seg = payload[i + 2:i + ln]
        if marker == 0xDB:
            _parse_dqt(seg, qt)
        elif marker in (0xC0, 0xC1):
            comps = []
            n = seg[5]
            for c in range(n):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (int.from_bytes(seg[1:3], "big"),   # height
                     int.from_bytes(seg[3:5], "big"),   # width
                     comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline/extended-sequential JPEG (progressive or "
                "arithmetic-coded input; install PIL for those)")
        elif marker == 0xC4:
            _parse_dht(seg, huff)
        elif marker == 0xDD:
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:
            n = seg[0]
            by_id = {cid: k for k, (cid, *_r) in enumerate(frame[2])}
            scan_map = [(0, 0)] * len(frame[2])
            for c in range(n):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_map[by_id[cid]] = (tabs >> 4, tabs & 15)
            # entropy data runs to the next real marker (FF00 is stuffing,
            # FFD0-D7 are restarts)
            j = i + ln
            while j + 1 < len(payload):
                if payload[j] == 0xFF and payload[j + 1] != 0x00 and \
                        not (0xD0 <= payload[j + 1] <= 0xD7):
                    break
                j += 1
            scan = payload[i + ln:j]
            break
        i += ln
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")

    h, w, comps = frame
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))

    planes = [np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), dtype=np.float64)
              for (_cid, hs, vs, _tq) in comps]
    preds = [0] * len(comps)

    # restart markers byte-align and reset predictors: split the scan into
    # independently-decodable segments and de-stuff each
    segments = []
    start = k = 0
    while k + 1 < len(scan):
        if scan[k] == 0xFF and 0xD0 <= scan[k + 1] <= 0xD7:
            segments.append(scan[start:k])
            start = k + 2
            k += 2
        else:
            k += 1
    segments.append(scan[start:])
    seg_iter = iter(segments)
    reader = _BitReader(next(seg_iter).replace(b"\xff\x00", b"\xff"))

    total_mcus = mcus_x * mcus_y
    for mcu in range(total_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            reader = _BitReader(next(seg_iter).replace(b"\xff\x00", b"\xff"))
            preds = [0] * len(comps)
        mx, my = mcu % mcus_x, mcu // mcus_x
        for ci, (_cid, hs, vs, tq) in enumerate(comps):
            dc_tab = huff[(0, scan_map[ci][0])]
            ac_tab = huff[(1, scan_map[ci][1])]
            for by in range(vs):
                for bx in range(hs):
                    coefs, preds[ci] = _decode_block(
                        reader, dc_tab, ac_tab, preds[ci])
                    block = np.zeros((8, 8), dtype=np.float64)
                    block[_ZZ_ROWS, _ZZ_COLS] = coefs * \
                        qt[tq][_ZZ_ROWS, _ZZ_COLS]
                    pix = _DCT.T @ block @ _DCT + 128.0
                    y0 = (my * vs + by) * 8
                    x0 = (mx * hs + bx) * 8
                    planes[ci][y0:y0 + 8, x0:x0 + 8] = pix

    full = []
    for ci, (_cid, hs, vs, _tq) in enumerate(comps):
        p = planes[ci]
        if hs != max_h or vs != max_v:
            p = p.repeat(max_v // vs, axis=0).repeat(max_h // hs, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        # round like the color path: truncation would bias every sample up
        # to 1 LSB low vs stock decoders
        return np.clip(full[0], 0, 255).round().astype(np.uint8)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255) \
        .round().astype(np.uint8)


# --------------------------------------------------------------------------
# encoder (fixture generator)
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        for k in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:      # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)              # pad with 1-bits


def _magnitude(v: int) -> tuple[int, int]:
    s = abs(v).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _block_symbols(coefs: np.ndarray, pred: int):
    """(symbols, pred): each symbol is (huff_class_sym, extra_bits, n_extra)
    with huff_class_sym ∈ DC cat / AC run-size alphabet."""
    syms = []
    s, bits = _magnitude(int(coefs[0]) - pred)
    syms.append(("dc", s, bits, s))
    run = 0
    for k in range(1, 64):
        v = int(coefs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            syms.append(("ac", 0xF0, 0, 0))
            run -= 16
        s, bits = _magnitude(v)
        syms.append(("ac", (run << 4) | s, bits, s))
        run = 0
    if run:
        syms.append(("ac", 0x00, 0, 0))
    return syms, int(coefs[0])


def _build_codes(symbols: set[int]) -> tuple[list[int], list[int], dict]:
    """Canonical fixed-length code set over the used symbols: legal JPEG,
    no memorized default tables. Returns (bits16, vals, sym->(code,len))."""
    vals = sorted(symbols)
    n = len(vals)
    length = 1
    while (1 << length) <= n:     # need strictly more codes than symbols
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    return bits, vals, {v: (i, length) for i, v in enumerate(vals)}


def _forward_blocks(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """DCT + quantize every 8x8 block; returns (by, bx, 64) zigzag coefs."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane.astype(np.float64) - 128.0,
                    ((0, ph - h), (0, pw - w)), mode="edge")
    by, bx = ph // 8, pw // 8
    blocks = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    freq = np.einsum("ux,abxy,vy->abuv", _DCT, blocks, _DCT)
    quant = np.round(freq / qtab).astype(np.int32)
    return quant[:, :, _ZZ_ROWS, _ZZ_COLS]


def make_jpeg(pixels, quality: int = 95, subsample: bool = False,
              restart_interval: int = 0) -> bytes:
    """Encode uint8 pixels — (h, w, 3) RGB or (h, w) grayscale — as a
    baseline JPEG. ``subsample=True`` emits 4:2:0 chroma; and a nonzero
    ``restart_interval`` emits DRI + RSTn markers, exercising the decoder's
    full marker surface."""
    arr = np.asarray(pixels, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    q_luma = _scaled_table(_Q_LUMA, quality)
    q_chroma = _scaled_table(_Q_CHROMA, quality)

    if gray:
        planes = [arr.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            cb = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            cr = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]

    max_h = max(s[0] for s in samp)
    max_v = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))

    coefs = []
    for ci, plane in enumerate(planes):
        qtab = q_luma if qsel[ci] == 0 else q_chroma
        hs, vs = samp[ci]
        # pad the plane so its block grid covers the full MCU grid
        need_h, need_w = mcus_y * vs * 8, mcus_x * hs * 8
        p = np.pad(plane, ((0, need_h - plane.shape[0]),
                           (0, need_w - plane.shape[1])), mode="edge")
        coefs.append(_forward_blocks(p, qtab))

    # pass 1: symbol streams per MCU (restart resets DC predictors)
    def mcu_stream():
        preds = [0] * len(planes)
        for mcu in range(mcus_x * mcus_y):
            if restart_interval and mcu and mcu % restart_interval == 0:
                preds = [0] * len(planes)
                yield "rst", None
            mx, my = mcu % mcus_x, mcu // mcus_x
            for ci in range(len(planes)):
                hs, vs = samp[ci]
                for by in range(vs):
                    for bx in range(hs):
                        block = coefs[ci][my * vs + by, mx * hs + bx]
                        syms, preds[ci] = _block_symbols(block, preds[ci])
                        yield ci, syms

    stream = list(mcu_stream())
    used: dict[tuple[int, str], set] = {}
    for ci, syms in stream:
        if ci == "rst":
            continue
        tsel = 0 if qsel[ci] == 0 else 1
        for kind, sym, _bits, _n in syms:
            used.setdefault((tsel, kind), set()).add(sym)
    tables = {key: _build_codes(symbols) for key, symbols in used.items()}

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(bytes([0xFF, marker]))
        out.extend((len(body) + 2).to_bytes(2, "big"))
        out.extend(body)

    for tq, qtab in ([(0, q_luma)] if gray else
                     [(0, q_luma), (1, q_chroma)]):
        zz = qtab[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
        seg(0xDB, bytes([tq]) + zz)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([len(planes)])
    for ci in range(len(planes)):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qsel[ci]])
    seg(0xC0, sof)
    for (tsel, kind), (bits, vals, _codes) in sorted(tables.items()):
        tc = 0 if kind == "dc" else 1
        seg(0xC4, bytes([(tc << 4) | tsel]) + bytes(bits) + bytes(vals))
    if restart_interval:
        seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        tsel = 0 if qsel[ci] == 0 else 1
        sos += bytes([ci + 1, (tsel << 4) | tsel])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    writer = _BitWriter()
    rst_n = 0
    for ci, syms in stream:
        if ci == "rst":
            writer.flush()
            out.extend(writer.out)
            writer = _BitWriter()
            out.extend(bytes([0xFF, 0xD0 + rst_n % 8]))
            rst_n += 1
            continue
        tsel = 0 if qsel[ci] == 0 else 1
        for kind, sym, bits, n in syms:
            code, length = tables[(tsel, kind)][2][sym]
            writer.write(code, length)
            if n:
                writer.write(bits, n)
    writer.flush()
    out.extend(writer.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


def _sof_dims(payload: bytes) -> tuple[int, int]:
    """(height, width) from the first SOF0/1/2 marker — a header peek for
    container writers (operators/avi.py) that must not decode pixels."""
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker in (0xC0, 0xC1, 0xC2):
            h = int.from_bytes(payload[pos + 5:pos + 7], "big")
            w = int.from_bytes(payload[pos + 7:pos + 9], "big")
            return h, w
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        pos += 2 + int.from_bytes(payload[pos + 2:pos + 4], "big")
    raise ValueError("JPEG: no SOF marker")
