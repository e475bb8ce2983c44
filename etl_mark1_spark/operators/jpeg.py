"""Vendored JPEG codec (pure Python + numpy, ITU-T T.81).

The container ships no image library, but JPEG is the dominant real-world
image format — so the multimodal decode path (operators/multimodal.py)
vendors a codec instead of gating JPEG behind PIL:

- :func:`decode_jpeg` — baseline/extended-sequential (SOF0/SOF1) AND
  progressive (SOF2) decoder: 8-bit samples, 1 or 3 components, ANY
  sampling factors (4:4:4, 4:2:0, 4:2:2, ...), restart intervals;
  progressive covers spectral selection, successive approximation (DC and
  AC first + refinement scans, T.81 Annex G), EOB runs, and per-scan
  Huffman redefinition. Arithmetic coding and hierarchical mode raise
  ``NotImplementedError`` (the PIL wiring point keeps covering those).
- :func:`make_jpeg` — fixture encoder (the ``make_bmp``/``make_wav``
  pattern): grayscale or YCbCr, optional 4:2:0 subsampling, restart
  intervals, quality-scaled Annex-K quantization, and
  ``progressive=True`` (a libjpeg-shaped scan script: approximated DC
  first + refinement, per-component spectral AC bands at Al=2 with two
  refinement passes — exercising EOB runs and the correction-bit
  buffering of Annex G.1.2.3). Huffman tables are built from the image's
  own symbol set (canonical, fixed length) rather than the Annex-K
  defaults — any prefix code is legal JPEG, and generated tables keep
  this implementation self-contained.

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


# ---- progressive block routines (T.81 Annex G.2; coefficient arrays are
# ---- zigzag-ordered int32, refined in place across scans) ----


def _dc_first(reader: _BitReader, dc_tab: dict, pred: int, blk: np.ndarray,
              al: int) -> int:
    s = _read_huff(reader, dc_tab)
    pred += _extend(reader.bits(s), s) if s else 0
    blk[0] = pred << al
    return pred


def _dc_refine(reader: _BitReader, blk: np.ndarray, al: int) -> None:
    if reader.bit():
        blk[0] |= (1 << al)


def _ac_first(reader: _BitReader, ac_tab: dict, blk: np.ndarray,
              ss: int, se: int, al: int, eobrun: int) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _read_huff(reader, ac_tab)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r < 15:                       # EOBn: run of all-done blocks
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.bits(r)
                return eobrun
            k += 16                          # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("AC run past end of band")
            blk[k] = _extend(reader.bits(s), s) << al
            k += 1
    return 0


def _ac_refine(reader: _BitReader, ac_tab: dict, blk: np.ndarray,
               ss: int, se: int, al: int, eobrun: int) -> int:
    """Successive-approximation AC refinement: newly-significant
    coefficients arrive as ±1<<Al; already-significant ones absorb one
    correction bit each as the scan passes over them (G.2, mirroring
    libjpeg's decode_mcu_AC_refine shape — public spec, original code)."""
    p1, m1 = 1 << al, -(1 << al)

    def correct(k: int) -> None:
        if reader.bit() and (blk[k] & p1) == 0:
            blk[k] += p1 if blk[k] > 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _read_huff(reader, ac_tab)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.bits(r)
                    break
                # ZRL: skip 16 still-zero coefficients, correcting history
            else:
                if s != 1:
                    raise ValueError("AC refinement size must be 1")
                val = p1 if reader.bit() else m1
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                if k > se:
                    raise ValueError("AC refinement run past end of band")
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:                       # EOB run still corrects history
            if blk[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _split_restarts(scan: bytes) -> list[bytes]:
    """Split entropy data at RSTn markers; each segment de-stuffed by the
    caller. Restarts byte-align and reset predictors/EOB runs."""
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
    return segments


def _idct_plane(coefs_zz: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Dequantize + inverse DCT a whole component at once: (by, bx, 64)
    zigzag coefficients -> (by*8, bx*8) float pixels. One einsum instead
    of a per-block matmul loop."""
    dq = coefs_zz.astype(np.float64) * qtab[_ZZ_ROWS, _ZZ_COLS]
    blocks = np.zeros(coefs_zz.shape[:2] + (8, 8))
    blocks[:, :, _ZZ_ROWS, _ZZ_COLS] = dq
    pix = np.einsum("ux,abuv,vy->abxy", _DCT, blocks, _DCT) + 128.0
    by, bx = pix.shape[:2]
    return pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline, extended-sequential, or progressive JPEG to
    uint8 pixels: (h, w, 3) RGB for color, (h, w) for grayscale.
    Reference semantics target: what ``duckdb_engine.py``-era stacks get
    from any stock JPEG decoder — this exists so the multimodal path
    needs no image library.

    Every scan decodes into per-component zigzag coefficient arrays
    (progressive scans refine them in place); reconstruction is one
    vectorized dequantize+IDCT per component at the end."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    progressive = False
    restart_interval = 0
    #: (comp_sel [(ci, dc_sel, ac_sel)], ss, se, ah, al, dri, huff
    #:  snapshot, entropy bytes)
    scans: list[tuple] = []

    i = 2
    while i + 1 < len(payload):
        if payload[i] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[i + 1]
        i += 2
        if marker == 0xD9:                    # EOI
            break
        if 0xD0 <= marker <= 0xD8 or marker == 0x01:
            continue
        ln = int.from_bytes(payload[i:i + 2], "big")
        seg = payload[i + 2:i + ln]
        if marker == 0xDB:
            _parse_dqt(seg, qt)
        elif marker in (0xC0, 0xC1, 0xC2):
            comps = []
            n = seg[5]
            for c in range(n):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (int.from_bytes(seg[1:3], "big"),   # height
                     int.from_bytes(seg[3:5], "big"),   # width
                     comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline/extended-sequential/progressive Huffman "
                "JPEG (arithmetic-coded or hierarchical input; install "
                "PIL for those)")
        elif marker == 0xC4:
            _parse_dht(seg, huff)
        elif marker == 0xDD:
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            n = seg[0]
            by_id = {cid: k for k, (cid, *_r) in enumerate(frame[2])}
            comp_sel = []
            for c in range(n):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                comp_sel.append((by_id[cid], tabs >> 4, tabs & 15))
            ss, se = seg[1 + 2 * n], seg[2 + 2 * n]
            ah, al = seg[3 + 2 * n] >> 4, seg[3 + 2 * n] & 15
            # entropy data runs to the next real marker (FF00 is stuffing,
            # FFD0-D7 are restarts)
            j = i + ln
            while j + 1 < len(payload):
                if payload[j] == 0xFF and payload[j + 1] != 0x00 and \
                        not (0xD0 <= payload[j + 1] <= 0xD7):
                    break
                j += 1
            scans.append((comp_sel, ss, se, ah, al, restart_interval,
                          dict(huff), payload[i + ln:j]))
            i = j
            continue
        i += ln
    if frame is None or not scans:
        raise ValueError("JPEG missing SOF/SOS")

    h, w, comps = frame
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    # per-component zigzag coefficient store on the MCU-padded block grid
    coef = [np.zeros((mcus_y * vs, mcus_x * hs, 64), dtype=np.int32)
            for (_cid, hs, vs, _tq) in comps]

    for comp_sel, ss, se, ah, al, dri, tabs, data in scans:
        if progressive:
            if ss == 0 and se != 0:
                raise ValueError("progressive DC scan must have Se=0")
            if ss > 0 and len(comp_sel) != 1:
                raise ValueError("progressive AC scans are single-component")
        if ss > se or se > 63:
            raise ValueError("invalid spectral band")
        interleaved = len(comp_sel) > 1
        if interleaved:
            units = mcus_x * mcus_y
        else:
            ci = comp_sel[0][0]
            _cid, hs, vs, _tq = comps[ci]
            # non-interleaved scans cover the component's OWN ceil grid
            # (T.81 A.2.2), not the MCU-padded one
            comp_w = -(-(w * hs) // max_h)
            comp_h = -(-(h * vs) // max_v)
            bw = -(-comp_w // 8)
            bh = -(-comp_h // 8)
            units = bw * bh
        seg_iter = iter(_split_restarts(data))
        reader = _BitReader(next(seg_iter).replace(b"\xff\x00", b"\xff"))
        preds = [0] * len(comps)
        eobrun = 0
        for u in range(units):
            if dri and u and u % dri == 0:
                reader = _BitReader(
                    next(seg_iter).replace(b"\xff\x00", b"\xff"))
                preds = [0] * len(comps)
                eobrun = 0
            if interleaved:
                mx, my = u % mcus_x, u // mcus_x
                blocks = [(ci, my * comps[ci][2] + by,
                           mx * comps[ci][1] + bx, dc_s, ac_s)
                          for ci, dc_s, ac_s in comp_sel
                          for by in range(comps[ci][2])
                          for bx in range(comps[ci][1])]
            else:
                ci, dc_s, ac_s = comp_sel[0]
                blocks = [(ci, u // bw, u % bw, dc_s, ac_s)]
            for ci, by, bx, dc_s, ac_s in blocks:
                blk = coef[ci][by, bx]
                if not progressive:
                    coefs, preds[ci] = _decode_block(
                        reader, tabs[(0, dc_s)], tabs[(1, ac_s)], preds[ci])
                    blk[:] = coefs
                elif ss == 0 and ah == 0:
                    preds[ci] = _dc_first(reader, tabs[(0, dc_s)],
                                          preds[ci], blk, al)
                elif ss == 0:
                    _dc_refine(reader, blk, al)
                elif ah == 0:
                    eobrun = _ac_first(reader, tabs[(1, ac_s)], blk,
                                       ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine(reader, tabs[(1, ac_s)], blk,
                                        ss, se, al, eobrun)

    full = []
    for ci, (_cid, hs, vs, tq) in enumerate(comps):
        p = _idct_plane(coef[ci], qt[tq])
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


def _ac_first_ops(blocks, ss: int, se: int, al: int, tsel: int) -> list:
    """Spectral-selection AC first-scan symbol stream (T.81 G.1.2.2):
    runs, magnitudes point-transformed toward zero by Al, EOB-run
    accumulation across all-done blocks."""
    ops: list = []
    eobrun = 0

    def flush() -> None:
        nonlocal eobrun
        if eobrun:
            nb = eobrun.bit_length() - 1
            ops.append(("sym", "ac", tsel, nb << 4))
            if nb:
                ops.append(("bits", eobrun - (1 << nb), nb))
            eobrun = 0

    for blk in blocks:
        vals = [(1 if int(v) >= 0 else -1) * (abs(int(v)) >> al)
                for v in blk[ss:se + 1]]
        nz = [i for i, v in enumerate(vals) if v]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        r = 0
        for i in range(nz[-1] + 1):
            v = vals[i]
            if v == 0:
                r += 1
                continue
            while r > 15:
                ops.append(("sym", "ac", tsel, 0xF0))
                r -= 16
            s, bits = _magnitude(v)
            ops.append(("sym", "ac", tsel, (r << 4) | s))
            ops.append(("bits", bits, s))
            r = 0
        if nz[-1] < se - ss:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()
    return ops


def _ac_refine_ops(blocks, ss: int, se: int, al: int, tsel: int) -> list:
    """Successive-approximation AC refinement symbol stream (T.81
    G.1.2.3, the jcphuff.c shape — public spec, original code): newly-
    significant coefficients as run+sign, one buffered correction bit
    per already-significant coefficient passed over, correction bits of
    EOB-run blocks buffered and emitted after the EOBn symbol."""
    ops: list = []
    eobrun = 0
    be: list[int] = []                    # correction bits riding the EOBRUN

    def flush() -> None:
        nonlocal eobrun, be
        if eobrun:
            nb = eobrun.bit_length() - 1
            ops.append(("sym", "ac", tsel, nb << 4))
            if nb:
                ops.append(("bits", eobrun - (1 << nb), nb))
            ops.extend(("bits", b, 1) for b in be)
            be = []
            eobrun = 0

    for blk in blocks:
        absv = [abs(int(v)) >> al for v in blk[ss:se + 1]]
        sgn = [0 if int(v) < 0 else 1 for v in blk[ss:se + 1]]
        eob = -1
        for i, a in enumerate(absv):
            if a == 1:
                eob = i
        r = 0
        br: list[int] = []                # bits awaiting the next symbol
        for i, a in enumerate(absv):
            if a == 0:
                r += 1
                continue
            while r > 15 and i <= eob:    # fold trailing zeros into EOB
                flush()
                ops.append(("sym", "ac", tsel, 0xF0))
                r -= 16
                ops.extend(("bits", b, 1) for b in br)
                br = []
            if a > 1:
                br.append(a & 1)          # history: one correction bit
                continue
            flush()
            ops.append(("sym", "ac", tsel, (r << 4) | 1))
            ops.append(("bits", sgn[i], 1))
            ops.extend(("bits", b, 1) for b in br)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            be.extend(br)
            if eobrun == 0x7FFF or len(be) > 900:
                flush()
    flush()
    return ops


def _encode_progressive(coefs, samp, qsel, h, w, mcus_x, mcus_y,
                        max_h, max_v, q_luma, q_chroma, gray) -> bytes:
    """SOF2 emission for :func:`make_jpeg(progressive=True)`: the scan
    script covers spectral selection, successive approximation (DC and
    AC), EOB runs, and correction-bit buffering — every decoder path."""
    ncomp = len(coefs)

    def comp_grid(ci):
        """Non-interleaved scans cover the component's OWN ceil grid
        (T.81 A.2.2) — padded MCU blocks carry no AC in progressive."""
        hs, vs = samp[ci]
        bw = -(-(-(-(w * hs) // max_h)) // 8)
        bh = -(-(-(-(h * vs) // max_v)) // 8)
        return [coefs[ci][by, bx] for by in range(bh) for bx in range(bw)]

    def dc_blocks():
        """DC scans are interleaved in MCU order when multi-component."""
        if ncomp == 1:
            return [(0, blk) for blk in comp_grid(0)]
        out = []
        for mcu in range(mcus_x * mcus_y):
            mx, my = mcu % mcus_x, mcu // mcus_x
            for ci in range(ncomp):
                hs, vs = samp[ci]
                for by in range(vs):
                    for bx in range(hs):
                        out.append((ci, coefs[ci][my * vs + by,
                                                  mx * hs + bx]))
        return out

    scans = []                       # (comp_idxs, ss, se, ah, al, ops)
    # DC first at Al=1 (arithmetic shift per T.81), then one refine bit
    ops: list = []
    preds = [0] * ncomp
    for ci, blk in dc_blocks():
        dcv = int(blk[0]) >> 1
        s, bits = _magnitude(dcv - preds[ci])
        preds[ci] = dcv
        ops.append(("sym", "dc", qsel[ci] and 1, s))
        if s:
            ops.append(("bits", bits, s))
    scans.append((list(range(ncomp)), 0, 0, 0, 1, ops))
    scans.append((list(range(ncomp)), 0, 0, 1, 0,
                  [("bits", int(blk[0]) & 1, 1) for _ci, blk in dc_blocks()]))
    for ci in range(ncomp):
        tsel = qsel[ci] and 1
        grid = comp_grid(ci)
        scans.append(([ci], 1, 5, 0, 2, _ac_first_ops(grid, 1, 5, 2, tsel)))
        scans.append(([ci], 6, 63, 0, 2,
                      _ac_first_ops(grid, 6, 63, 2, tsel)))
    for ci in range(ncomp):
        tsel = qsel[ci] and 1
        grid = comp_grid(ci)
        scans.append(([ci], 1, 63, 2, 1,
                      _ac_refine_ops(grid, 1, 63, 1, tsel)))
        scans.append(([ci], 1, 63, 1, 0,
                      _ac_refine_ops(grid, 1, 63, 0, tsel)))

    used: dict[tuple[int, str], set] = {}
    for _comps, _ss, _se, _ah, _al, ops in scans:
        for op in ops:
            if op[0] == "sym":
                _tag, kind, tsel, sym = op
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
        + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qsel[ci]])
    seg(0xC2, sof)
    for (tsel, kind), (bits, vals, _codes) in sorted(tables.items()):
        tc = 0 if kind == "dc" else 1
        seg(0xC4, bytes([(tc << 4) | tsel]) + bytes(bits) + bytes(vals))

    for comp_idxs, ss, se, ah, al, ops in scans:
        sos = bytes([len(comp_idxs)])
        for ci in comp_idxs:
            tsel = qsel[ci] and 1
            sos += bytes([ci + 1, (tsel << 4) | tsel])
        sos += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, sos)
        writer = _BitWriter()
        for op in ops:
            if op[0] == "sym":
                _tag, kind, tsel, sym = op
                code, length = tables[(tsel, kind)][2][sym]
                writer.write(code, length)
            else:
                _tag, bits, n = op
                if n:
                    writer.write(bits, n)
        writer.flush()
        out.extend(writer.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


def make_jpeg(pixels, quality: int = 95, subsample: bool = False,
              restart_interval: int = 0, progressive: bool = False) -> bytes:
    """Encode uint8 pixels — (h, w, 3) RGB or (h, w) grayscale — as a
    baseline JPEG. ``subsample=True`` emits 4:2:0 chroma; and a nonzero
    ``restart_interval`` emits DRI + RSTn markers, exercising the decoder's
    full marker surface. ``progressive=True`` emits SOF2 with a
    libjpeg-shaped scan script — DC at Al=1 + refinement, per-component
    AC bands 1-5/6-63 at Al=2 with two refinement passes — the SAME
    quantized coefficients as the sequential form, so a progressive
    round-trip decodes bit-identically to its sequential sibling."""
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

    if progressive:
        if restart_interval:
            raise ValueError(
                "progressive fixtures do not support restart intervals")
        return _encode_progressive(coefs, samp, qsel, h, w,
                                   mcus_x, mcus_y, max_h, max_v,
                                   q_luma, q_chroma, gray)

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


# ---------------------------------------------------------------------------
# EXIF (APP1) metadata — build + parse
# ---------------------------------------------------------------------------
#
# EXIF rides in an APP1 segment as a TIFF structure ("Exif\0\0" + byte-order
# header + IFD0), per JEITA CP-3451. The subset here is the curation-relevant
# one: orientation (auto-rotate before any pixel op), camera make/model,
# capture time, and the Exif-subIFD pixel dimensions. Parsing is TOLERANT —
# metadata is advisory, so absent or malformed EXIF yields {} rather than
# failing the document (the opposite of the WARC walker, where truncation is
# data loss and raises).

_EXIF_IFD0 = {0x010F: "make", 0x0110: "model", 0x0112: "orientation",
              0x0132: "datetime"}
_EXIF_SUB = {0x9003: "datetime_original", 0xA002: "pixel_x",
             0xA003: "pixel_y"}
_EXIF_POINTER = 0x8769


def make_exif_app1(orientation: int | None = 1, make: str | None = None,
                   model: str | None = None,
                   datetime_original: str | None = None,
                   pixel_x: int | None = None, pixel_y: int | None = None,
                   big_endian: bool = False) -> bytes:
    """A complete APP1 segment (FF E1 + length + Exif TIFF body) carrying
    the given tags, in either byte order — the fixture builder for tests
    and catalog entries."""
    import struct

    bo = ">" if big_endian else "<"

    def entry(tag: int, typ: int, count: int, value: bytes) -> bytes:
        return struct.pack(bo + "HHI", tag, typ, count) + value.ljust(4,
                                                                      b"\0")

    ifd0 = []
    sub = []
    extra = b""  # out-of-line ASCII values, appended after both IFDs

    # layout: TIFF header (8) + IFD0 + [sub IFD] + out-of-line data.
    # Sizes are known up front, so offsets resolve in one pass.
    n_ifd0 = sum(x is not None for x in (make, model, orientation))
    has_sub = any(v is not None for v in (datetime_original, pixel_x,
                                          pixel_y))
    if has_sub:
        n_ifd0 += 1
    n_sub = sum(v is not None for v in (datetime_original, pixel_x,
                                        pixel_y))
    ifd0_off = 8
    ifd0_size = 2 + 12 * n_ifd0 + 4
    sub_off = ifd0_off + ifd0_size
    sub_size = (2 + 12 * n_sub + 4) if has_sub else 0
    data_off = sub_off + sub_size
    import struct as _s

    def build_ascii(tag: int, s: str) -> bytes:
        nonlocal extra, data_off
        data = s.encode("ascii") + b"\0"
        if len(data) <= 4:
            return entry(tag, 2, len(data), data)
        e = entry(tag, 2, len(data), _s.pack(bo + "I", data_off))
        extra += data
        data_off += len(data)
        return e

    if make is not None:
        ifd0.append(build_ascii(0x010F, make))
    if model is not None:
        ifd0.append(build_ascii(0x0110, model))
    if orientation is not None:
        ifd0.append(entry(0x0112, 3, 1, _s.pack(bo + "H", orientation)))
    if has_sub:
        ifd0.append(entry(_EXIF_POINTER, 4, 1, _s.pack(bo + "I", sub_off)))
    if datetime_original is not None:
        sub.append(build_ascii(0x9003, datetime_original))
    if pixel_x is not None:
        sub.append(entry(0xA002, 4, 1, _s.pack(bo + "I", pixel_x)))
    if pixel_y is not None:
        sub.append(entry(0xA003, 4, 1, _s.pack(bo + "I", pixel_y)))

    tiff = (b"II*\0" if not big_endian else b"MM\0*") \
        + _s.pack(bo + "I", ifd0_off) \
        + _s.pack(bo + "H", len(ifd0)) + b"".join(sorted(ifd0)) \
        + _s.pack(bo + "I", 0)
    if has_sub:
        tiff += _s.pack(bo + "H", len(sub)) + b"".join(sorted(sub)) \
            + _s.pack(bo + "I", 0)
    tiff += extra
    body = b"Exif\0\0" + tiff
    return b"\xff\xe1" + _s.pack(">H", len(body) + 2) + body


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment right after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    return jpeg[:2] + app1 + jpeg[2:]


def parse_exif(jpeg: bytes) -> dict:
    """EXIF tags from a JPEG's APP1 segment: ``orientation`` (int),
    ``make``/``model``/``datetime_original`` (str), ``pixel_x``/
    ``pixel_y`` (int) — whichever are present. Both byte orders. Returns
    ``{}`` for images without EXIF or with malformed EXIF (tolerant by
    design; metadata is advisory)."""
    import struct

    try:
        if jpeg[:2] != b"\xff\xd8":
            return {}
        i = 2
        body = None
        while i + 4 <= len(jpeg):
            if jpeg[i] != 0xFF:
                return {}
            marker = jpeg[i + 1]
            if marker in (0xD9, 0xDA):
                break
            seg_len = struct.unpack(">H", jpeg[i + 2:i + 4])[0]
            if marker == 0xE1 and jpeg[i + 4:i + 10] == b"Exif\0\0":
                body = jpeg[i + 10:i + 2 + seg_len]
                break
            i += 2 + seg_len
        if body is None or len(body) < 8:
            return {}
        if body[:4] == b"II*\0":
            bo = "<"
        elif body[:4] == b"MM\0*":
            bo = ">"
        else:
            return {}

        def read_ifd(off: int, tag_names: dict) -> dict:
            out = {}
            n = struct.unpack_from(bo + "H", body, off)[0]
            for k in range(n):
                tag, typ, count = struct.unpack_from(
                    bo + "HHI", body, off + 2 + 12 * k)
                voff = off + 2 + 12 * k + 8
                if typ == 2:  # ASCII
                    if count > 4:
                        voff = struct.unpack_from(bo + "I", body, voff)[0]
                    raw = body[voff:voff + count]
                    val = raw.split(b"\0", 1)[0].decode("ascii",
                                                        errors="replace")
                elif typ == 3:  # SHORT
                    val = struct.unpack_from(bo + "H", body, voff)[0]
                elif typ == 4:  # LONG
                    val = struct.unpack_from(bo + "I", body, voff)[0]
                else:
                    continue
                if tag == _EXIF_POINTER:
                    out.update(read_ifd(val, _EXIF_SUB))
                elif tag in tag_names:
                    out[tag_names[tag]] = val
            return out

        ifd0_off = struct.unpack_from(bo + "I", body, 4)[0]
        return read_ifd(ifd0_off, _EXIF_IFD0)
    except (struct.error, IndexError, UnicodeDecodeError):
        return {}
