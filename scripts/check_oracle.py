"""Local mirror of the driver's correctness gate.

Runs every ``queries()[name]`` on Spark at sf0.01 and, where an oracle
exists, the same-named ``oracle_sql()[name]`` on DuckDB over the same parquet
files; compares row count, column names, and order-insensitive values
(floats rounded to 9 significant digits before hashing). Prints one line per
query and exits non-zero on any mismatch.

Usage: python scripts/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as contract
from etl_mark1_spark import get_spark
from etl_mark1_spark.catalog import TABLES


def canon(v):
    """Canonicalize a value for order-insensitive comparison.

    Deliberately at-least-driver-strict (round-6 lesson: the old
    Decimal→float-9-sig-digits canon here PASSED entries the driver's
    pandas canonicalizer hash-failed): Decimals compare as exact decimal
    strings — a Decimal on one side and a float on the other never
    canonicalize equal, mirroring how the driver's value hash treats the
    carrier types engine-dependently. The output-typing convention in
    ``etl_mark1_spark/catalog/__init__.py`` (no arrays/maps, no decimals
    wider than precision 18 in final oracle-exact output) is enforced
    separately by a schema check in ``main``."""
    import datetime
    from decimal import Decimal

    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return "f:0"
        return f"f:{v:.9e}"
    if isinstance(v, Decimal):
        s = format(v, "f")
        if "." in s:
            s = s.rstrip("0").rstrip(".")
        if s in ("", "-0"):
            s = "0"
        return f"d:{s}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return f"t:{v.isoformat()}"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={canon(v[k])}" for k in sorted(v)) + "}"
    return f"s:{v}"


def driver_hostile_fields(schema) -> list[str]:
    """Names+types of output fields the driver's canonicalizer can't hash
    portably: arrays/maps (pandas ``sort_values`` raises on list cells)
    and decimals wider than precision 18 (Spark's Decimal object vs the
    oracle engine's carrier type hash differently despite equal values).
    Shared by this checker and the conformance sweep in
    ``tests/test_entry_contract.py``."""
    from pyspark.sql import types as T

    bad = []
    for f in schema.fields:
        dt = f.dataType
        if isinstance(dt, (T.ArrayType, T.MapType)):
            bad.append(f"{f.name}: {dt.simpleString()}")
        elif isinstance(dt, T.DecimalType) and dt.precision > 18:
            bad.append(f"{f.name}: {dt.simpleString()}")
    return bad


def oracle_hostile_fields(con, sql: str) -> list[str]:
    """DuckDB-side mirror of :func:`driver_hostile_fields` (the round-8
    driver red: ``sum(BIGINT)`` returns HUGEINT, whose pandas carrier is
    float64 while Spark's int64 hashes differently despite equal values —
    and the local gate structurally cannot see it because ``fetchall()``
    yields Python ints). ``DESCRIBE`` the oracle SQL — schema only, no
    rows run — and refuse any output column whose DuckDB type the
    driver's pandas canonicalizer carries non-portably: HUGEINT /
    UHUGEINT (→ float64/object), DECIMAL wider than precision 18, and
    list/struct/map containers."""
    import re

    bad = []
    for row in con.execute(f"DESCRIBE {sql}").fetchall():
        name, typ = row[0], row[1].upper()
        if typ in ("HUGEINT", "UHUGEINT"):
            bad.append(f"{name}: {typ}")
            continue
        m = re.match(r"DECIMAL\((\d+)", typ)
        if m and int(m.group(1)) > 18:
            bad.append(f"{name}: {typ}")
            continue
        if "[]" in typ or typ.startswith(("MAP(", "STRUCT(", "LIST(",
                                          "UNION(")):
            bad.append(f"{name}: {typ}")
    return bad


def row_set(columns: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


#: Sketch entries whose estimates cannot hash-match an exact answer (DuckDB
#: uses a different HLL implementation): checked against the exact
#: COUNT(DISTINCT) within the sketch's own error bound instead of
#: rows-only. lgK=12 -> relative standard error ~1.6%; the band is 4 sigma.
_EXACT_DISTINCT_USERS = """
    SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY 1
"""
#: quartiles_approx: sketch cutoffs (rank error <= rows/accuracy = ~2 rows
#: at sf0.01) vs exact ntile bucket counts; 1% per-bucket band.
_EXACT_NTILE_COUNTS = """
    SELECT q, count(*) FROM (
        SELECT CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey)
                 AS BIGINT) AS q
        FROM orders) GROUP BY q
"""
#: quantile_digest_merge outputs each merged estimate's EXACT rank
#: (n_below); the band holds it within 4% of the target rank — covering
#: the documented N/k + N/accuracy rank-error bound (<1% of N at k=128)
#: relative to the smallest target (0.25 N).
_EXACT_QUANTILE_RANKS = """
    SELECT 'p25' AS q, CAST(round(0.25 * count(*)) AS BIGINT) AS r
    FROM orders
    UNION ALL
    SELECT 'p50', CAST(round(0.50 * count(*)) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'p75', CAST(round(0.75 * count(*)) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'p90', CAST(round(0.90 * count(*)) AS BIGINT) FROM orders
"""
APPROX_ORACLES = {
    "approx_distinct_users":
        (_EXACT_DISTINCT_USERS, "event_type", "approx_distinct", 0.065),
    "hll_rollup_merge":
        (_EXACT_DISTINCT_USERS, "event_type", "approx_distinct", 0.065),
    "quartiles_approx":
        (_EXACT_NTILE_COUNTS, "q", "n", 0.01),
    "quantile_digest_merge":
        (_EXACT_QUANTILE_RANKS, "q", "n_below", 0.04),
    "streaming_hll_distinct":
        ("""SELECT date_trunc('hour', ts), count(DISTINCT user_id)
            FROM events GROUP BY 1""",
         "window_start", "approx_distinct", 0.065),
}

#: ANN entries checked as RECALL vs the exact top-k (the scheme the pytest
#: recall floors used before this sweep covered them): the exact SQL is
#: brute-force cosine top-10 in DuckDB; PASS iff |approx ∩ exact| / k meets
#: the floor AND every recovered id's similarity matches the exact score to
#: 1e-6 (approximation may MISS neighbors, never mis-score one). Floors
#: mirror tests/test_goldens.py: LSH 0.6 (this corpus's nearest neighbors
#: are only ~0.37 cosine — the hard case for hyperplane LSH), IVF 0.7.
_EXACT_COSINE_TOPK = """
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 1)
    SELECT e.vec_id,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        CAST(q.embedding AS DOUBLE[])), 6)
               AS similarity
    FROM embeddings e, q
    WHERE e.vec_id <> 1
    ORDER BY similarity DESC, e.vec_id
    LIMIT 10
"""
#: IVF-PQ refines its ADC shortlist against the ORIGINAL vectors, so its
#: score column is exact L2 — the exact oracle is brute-force L2 top-10.
#: Floor 0.6: measured 0.7 at sf0.01 (nprobe=4 of 8, m=8, ksub=16).
_EXACT_L2_TOPK = """
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id = 1)
    SELECT e.vec_id,
           round(list_distance(CAST(e.embedding AS DOUBLE[]), q.qe), 6)
               AS l2_dist
    FROM embeddings e, q
    WHERE e.vec_id <> 1
    ORDER BY l2_dist ASC, e.vec_id
    LIMIT 10
"""
RECALL_ORACLES = {
    "ann_lsh_topk": (_EXACT_COSINE_TOPK, "vec_id", "similarity", 0.6),
    "ann_ivf_topk": (_EXACT_COSINE_TOPK, "vec_id", "similarity", 0.7),
    "ann_ivfpq_topk": (_EXACT_L2_TOPK, "vec_id", "l2_dist", 0.6),
}


def _check_compression_ratio(con, rows: list[dict]) -> list[str]:
    """Independent recomputation (round-8, graduating the entry from
    rows-only): read every document via DuckDB, zlib-compress at the
    same fixed level 6, and demand the EXACT per-doc ratio — zlib is
    deterministic for a fixed level, so there is no band to grant."""
    import zlib

    exact = {}
    for doc_id, text in con.execute(
            "SELECT doc_id, text FROM documents").fetchall():
        if text is None or len(text) == 0:
            exact[doc_id] = None
        else:
            raw = text.encode("utf-8")
            exact[doc_id] = round(len(zlib.compress(raw, 6)) / len(raw), 6)
    got = {r["doc_id"]: r["zlib_ratio"] for r in rows}
    if set(got) != set(exact):
        return [f"doc universe differs: {len(got)} vs {len(exact)}"]
    bad = [f"doc {i}: {got[i]} != {exact[i]}" for i in exact
           if got[i] != exact[i]]
    return bad[:3]


def _check_pca_embeddings(con, rows: list[dict]) -> list[str]:
    """Independent full-matrix PCA (round-8 graduation): pull the raw
    vectors via DuckDB into numpy, eigendecompose the biased covariance
    directly (no Gram partials, no Spark), and hold the entry's
    eigenvalues, empirical projected variances, and cumulative
    explained-variance ratios to tight relative bands."""
    import numpy as np

    X = np.array([list(v) for (v,) in con.execute(
        "SELECT embedding FROM embeddings ORDER BY vec_id").fetchall()],
        dtype=np.float64)
    Xc = X - X.mean(axis=0)
    cov = (Xc.T @ Xc) / X.shape[0]
    eig = np.sort(np.linalg.eigvalsh(cov))[::-1]
    total = float(eig.sum())
    bad = []
    if len(rows) != 8:
        return [f"expected 8 components, got {len(rows)}"]
    for r in sorted(rows, key=lambda r: r["component"]):
        i = int(r["component"])
        want = float(eig[i])
        if abs(r["eigval"] - want) > 1e-6 * max(want, 1e-12):
            bad.append(f"c{i}: eigval {r['eigval']} vs numpy {want:.9g}")
        if abs(r["empirical_var"] - want) > 1e-4 * max(want, 1e-12):
            bad.append(f"c{i}: empirical_var {r['empirical_var']} "
                       f"vs eigval {want:.9g}")
        want_evr = float(eig[:i + 1].sum() / total)
        if abs(r["evr_cum"] - want_evr) > 1e-5:
            bad.append(f"c{i}: evr_cum {r['evr_cum']} vs {want_evr:.6f}")
    return bad


# -- Round-9 graduations: media decode + BPE checker-side recomputation ----
# Each restates the entry's documented SYNTHESIS branches (the same way
# _URL_CTE restates the synth URLs) and recomputes the expected features
# in plain numpy / pure Python here in the checker — independent of the
# vendored encoders, decoders, Arrow transfer, and the distributed path.
# A corrupted encode, a wrong unfilter, a batch/id mix-up, or a dropped
# row all break the comparison.

def _synth_gradient(i: int):
    """The id-seeded RGB gradient the BMP/JPEG/PNG attach synthesizers
    document (operators/multimodal.py): w=16+i%16, h=16+(i//2)%16, red
    ramps over x, green over y, blue constant i%256. Returns
    (w, h, r, g, b) as int64 planes."""
    import numpy as np

    w, h = 16 + i % 16, 16 + (i // 2) % 16
    x = np.arange(w, dtype=np.int64)
    y = np.arange(h, dtype=np.int64)
    r = np.broadcast_to(x * 255 // max(w - 1, 1), (h, w))
    g = np.broadcast_to((y * 255 // max(h - 1, 1))[:, None], (h, w))
    b = np.full((h, w), i % 256, dtype=np.int64)
    return w, h, r, g, b


def _expected_pixels(fmt: str, i: int):
    """(expected decoded array, w, h) for doc ``i`` under format ``fmt``,
    from the synthesis contracts: BMP/JPEG always RGB; PNG cycles
    RGB / grayscale ((r+g+b)//3) / RGBA (alpha dropped on decode -> RGB);
    GIF is the documented palette pattern."""
    import numpy as np

    if fmt == "gif":
        w, h = 12 + i % 21, 12 + (i // 3) % 17
        n_colors = (4, 16, 97, 256)[i % 4]
        yy, xx = np.mgrid[0:h, 0:w]
        idx = ((xx * 7 + yy * 3 + i) % n_colors).astype(np.uint8)
        pal = np.stack([
            (np.arange(n_colors) * 5 + i) % 256,
            (np.arange(n_colors) * 11) % 256,
            (np.arange(n_colors) * 29 + 2 * i) % 256,
        ], axis=1).astype(np.uint8)
        return pal[idx], w, h
    w, h, r, g, b = _synth_gradient(i)
    if fmt == "png" and i % 3 == 1:     # grayscale color type
        return ((r + g + b) // 3).astype(np.uint8), w, h
    return np.stack([r, g, b], axis=-1).astype(np.uint8), w, h


def _ref_ahash(img) -> str:
    """Independent restatement of the 64-bit average-hash contract:
    channel-mean grayscale, 8x8 nearest-sample grid, threshold at the
    grid mean, row-major bits as 16 hex chars."""
    import numpy as np

    gray = img.mean(axis=2) if img.ndim == 3 else img
    h, w = gray.shape
    ys = (np.arange(8) * h // 8).clip(0, h - 1)
    xs = (np.arange(8) * w // 8).clip(0, w - 1)
    grid = gray[np.ix_(ys, xs)]
    bits = (grid > grid.mean()).flatten()
    val = 0
    for bit in bits:
        val = (val << 1) | int(bit)
    return f"{val:016x}"


def _check_image_decode(fmt: str, lossless: bool = True):
    """Golden check for the image-decode entries: dims always exact; for
    LOSSLESS formats (BMP/PNG/GIF) the decoded mean pixel and average
    hash must equal the synthesized pixels' exactly (the round trip is
    the identity); for JPEG (quality 95 on smooth gradients) the mean
    must land within 2.0 of the source's — hash is not compared (a
    threshold pixel may flip under quantization)."""

    def check(con, rows: list[dict]) -> list[str]:
        got = {r["doc_id"]: r for r in rows}
        ids = [i for (i,) in con.execute(
            "SELECT doc_id FROM documents").fetchall()]
        if set(got) != set(ids):
            return [f"doc universe differs: {len(got)} vs {len(ids)}"]
        bad = []
        for i in ids:
            img, w, h = _expected_pixels(fmt, i)
            r = got[i]
            if (r["width"], r["height"]) != (w, h):
                bad.append(f"doc {i}: dims {r['width']}x{r['height']} "
                           f"!= {w}x{h}")
                continue
            exp_mean = round(float(img.mean()), 6)
            if lossless:
                if r["mean_pixel"] != exp_mean:
                    bad.append(f"doc {i}: mean {r['mean_pixel']} "
                               f"!= {exp_mean}")
                elif r["phash"] != _ref_ahash(img):
                    bad.append(f"doc {i}: ahash {r['phash']} "
                               f"!= {_ref_ahash(img)}")
            elif abs(r["mean_pixel"] - exp_mean) > 2.0:
                bad.append(f"doc {i}: jpeg mean {r['mean_pixel']} off "
                           f"source {exp_mean} by > 2.0")
        return bad[:3]

    return check


def _synth_wav(i: int, rate: int = 16000):
    """The id-seeded sine the WAV attach synthesizer documents: int16
    samples of sin(2*pi*f*t) at f=110*(1+i%8) Hz, amplitude
    0.1+(i%9)/10, n = rate/10 + (i%5)*rate/100 samples."""
    import numpy as np

    n = rate // 10 + (i % 5) * rate // 100
    freq = 110.0 * (1 + i % 8)
    amp = 0.1 + (i % 9) / 10.0
    t = np.arange(n) / rate
    return (np.sin(2 * np.pi * freq * t) * amp * 32767).astype(np.int16)


def _check_wav_decode(con, rows: list[dict]) -> list[str]:
    """Exact recomputation for multimodal_wav_decode: re-synthesize each
    id's int16 sine here, normalize by 32768 (the full-scale convention
    the decoder documents), and demand the exact (rate, duration_ms,
    rms) triple — the WAV encode->Spark->decode round trip must be the
    identity on the samples."""
    import numpy as np

    got = {r["doc_id"]: r for r in rows}
    ids = [i for (i,) in con.execute(
        "SELECT doc_id FROM documents").fetchall()]
    if set(got) != set(ids):
        return [f"doc universe differs: {len(got)} vs {len(ids)}"]
    bad = []
    for i in ids:
        s = _synth_wav(i)
        x = s.astype(np.float64) / 32768.0
        exp = (16000, int(len(s) * 1000 // 16000),
               round(float(np.sqrt(np.mean(x * x))), 6))
        r = got[i]
        if (r["sample_rate"], r["duration_ms"], r["rms"]) != exp:
            bad.append(f"doc {i}: {(r['sample_rate'], r['duration_ms'], r['rms'])} != {exp}")
    return bad[:3]


def _check_audio_spectral(con, rows: list[dict]) -> list[str]:
    """Recomputation for audio_spectral_wav from the synthesis parameters:
    rms/zcr must match exactly (identical float ops on identical
    arrays); the FFT statistics get hair-width bands — centroid and
    bandwidth within 0.05 Hz, rolloff within one FFT bin (it is a bin
    EDGE picked by a cumulative-power threshold, so a 1-ulp cumsum
    difference may legally shift it by one 31.25 Hz bin)."""
    import numpy as np

    got = {r["doc_id"]: r for r in rows}
    ids = [i for (i,) in con.execute(
        "SELECT doc_id FROM documents").fetchall()]
    if set(got) != set(ids):
        return [f"doc universe differs: {len(got)} vs {len(ids)}"]
    rate, n_fft = 16000, 512
    bin_hz = rate / n_fft
    bad = []
    for i in ids:
        x = _synth_wav(i).astype(np.float64) / 32768.0
        rms = round(float(np.sqrt(np.mean(x * x))), 6)
        zcr = round(float(np.mean(np.signbit(x[1:])
                                  != np.signbit(x[:-1]))), 6)
        hop = n_fft // 2
        if len(x) < n_fft:
            frames = np.zeros((1, n_fft))
            frames[0, :len(x)] = x
        else:
            n_frames = 1 + (len(x) - n_fft) // hop
            idx = np.arange(n_fft)[None, :] \
                + hop * np.arange(n_frames)[:, None]
            frames = x[idx]
        spec = np.abs(np.fft.rfft(frames * np.hanning(n_fft),
                                  axis=1)) ** 2
        power = spec.mean(axis=0)
        freqs = np.fft.rfftfreq(n_fft, d=1.0 / rate)
        total = power.sum()
        centroid = float((freqs * power).sum() / total)
        rolloff = float(freqs[np.searchsorted(np.cumsum(power),
                                              0.85 * total)])
        bandwidth = float(np.sqrt(((freqs - centroid) ** 2
                                   * power).sum() / total))
        r = got[i]
        if r["rms"] != rms or r["zcr"] != zcr:
            bad.append(f"doc {i}: rms/zcr {(r['rms'], r['zcr'])} "
                       f"!= {(rms, zcr)}")
        elif abs(r["spectral_centroid_hz"] - centroid) > 0.05 \
                or abs(r["spectral_bandwidth_hz"] - bandwidth) > 0.05:
            bad.append(f"doc {i}: centroid/bandwidth off: "
                       f"{r['spectral_centroid_hz']}/{r['spectral_bandwidth_hz']}"
                       f" vs {centroid:.2f}/{bandwidth:.2f}")
        elif abs(r["spectral_rolloff_hz"] - rolloff) > bin_hz + 0.01:
            bad.append(f"doc {i}: rolloff {r['spectral_rolloff_hz']} "
                       f"vs {rolloff:.2f} (> one bin)")
    return bad[:3]


def _ref_bpe_train(texts, num_merges: int = 30):
    """Independent pure-Python BPE trainer (the classic word-frequency
    algorithm; same reference as tests/test_corpus.py): words split on
    [^a-z0-9]+ of the lowercased text, symbols are chars + '</w>', the
    most frequent adjacent pair merges each round, lexicographic tie
    break, merges apply leftmost-first."""
    import re
    from collections import Counter

    wc = Counter()
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", (t or "").lower()):
            if w:
                wc[w] += 1
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in wc.items()}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        nxt = {}
        for syms, c in vocab.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    out.append(syms[j] + syms[j + 1])
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + c
        vocab = nxt
    return merges


def _ref_bpe_segment(text, merges):
    """Segment one document under a trained merge list, leftmost-first
    per rank — the independent mirror of operators/bpe.py:bpe_segment."""
    import re

    toks = []
    for w in re.split(r"[^a-z0-9]+", (text or "").lower()):
        if not w:
            continue
        syms = list(w) + ["</w>"]
        for a, b in merges:
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = out
        toks.extend(syms)
    return toks


def _check_bpe_train(con, rows: list[dict]) -> list[str]:
    """The distributed trainer's 30 ranked merges must equal the
    independent reference's, trained on the same corpus pulled via
    DuckDB."""
    texts = [t for (t,) in con.execute(
        "SELECT text FROM documents").fetchall()]
    ref = _ref_bpe_train(texts, num_merges=30)
    got = [(r["left"], r["right"])
           for r in sorted(rows, key=lambda r: r["rank"])]
    if got != ref:
        for k, (g, e) in enumerate(zip(got, ref)):
            if g != e:
                return [f"merge rank {k}: {g} != reference {e}"]
        return [f"merge count {len(got)} != reference {len(ref)}"]
    return []


def _check_bpe_segment(con, rows: list[dict]) -> list[str]:
    """Every document's token count and first 8 tokens must equal the
    independent reference segmentation under the reference-trained
    merges."""
    docs = dict(con.execute(
        "SELECT doc_id, text FROM documents").fetchall())
    merges = _ref_bpe_train(list(docs.values()), num_merges=30)
    got = {r["doc_id"]: r for r in rows}
    if set(got) != set(docs):
        return [f"doc universe differs: {len(got)} vs {len(docs)}"]
    bad = []
    for i, text in docs.items():
        toks = _ref_bpe_segment(text, merges)
        r = got[i]
        if r["n_bpe_tokens"] != len(toks) \
                or list(r["first_tokens"]) != toks[:8]:
            bad.append(f"doc {i}: ({r['n_bpe_tokens']}, "
                       f"{list(r['first_tokens'])[:3]}...) != "
                       f"({len(toks)}, {toks[:3]}...)")
    return bad[:3]


def _ref_bilinear_mean(img, width: int, height: int) -> float:
    """Independent restatement of the bilinear-resample contract
    (pixel-center sampling, src = (dst + 0.5) * scale - 0.5, edge
    clamp), written per-output-pixel rather than vectorized so it does
    not share code shape with the operator: returns the mean of the
    resized image."""
    import numpy as np

    arr = np.asarray(img, dtype=np.float64)
    h, w = arr.shape[:2]
    total = 0.0
    cnt = 0
    for dy in range(height):
        sy = min(max((dy + 0.5) * h / height - 0.5, 0.0), h - 1)
        y0, fy = int(sy), sy - int(sy)
        y1 = min(y0 + 1, h - 1)
        for dx in range(width):
            sx = min(max((dx + 0.5) * w / width - 0.5, 0.0), w - 1)
            x0, fx = int(sx), sx - int(sx)
            x1 = min(x0 + 1, w - 1)
            px = (arr[y0, x0] * (1 - fx) * (1 - fy)
                  + arr[y0, x1] * fx * (1 - fy)
                  + arr[y1, x0] * (1 - fx) * fy
                  + arr[y1, x1] * fx * fy)
            px = np.clip(np.round(px), 0, 255)
            total += float(np.mean(px))
            cnt += 1
    return total / cnt


def _check_resize_images(con, rows: list[dict]) -> list[str]:
    """Checker-golden for multimodal_resize_images (round-10 graduation
    from rows-only): the chain is JPEG decode -> bilinear 12x10 -> BMP
    re-encode -> re-decode, so expected stats are RE-DERIVED FROM THE
    SYNTHESIS BRANCH: the id-seeded gradient the JPEG attach documents,
    resampled by the independent per-pixel bilinear above. Dims must be
    exactly 12x10 (the BMP re-decode leg is exact); the mean pixel must
    land within 3.0 of the synthesis-derived mean (quality-95 JPEG on
    smooth gradients deviates <= 2.0 per the decode band, and bilinear
    is a convex combination so it cannot amplify that; +1.0 covers the
    resampler's round-to-uint8). The average hash is not compared —
    threshold pixels flip under quantization (same policy as the JPEG
    decode band)."""
    import numpy as np

    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    valid = {i for (i,) in con.execute(
        "SELECT doc_id FROM documents").fetchall()}
    if len(rows) != min(200, n_docs):
        return [f"row count {len(rows)} != {min(200, n_docs)}"]
    bad = []
    for r in rows:
        i = r["doc_id"]
        if i not in valid:
            bad.append(f"doc {i}: not a documents id")
            continue
        if (r["width"], r["height"]) != (12, 10):
            bad.append(f"doc {i}: dims {r['width']}x{r['height']} "
                       f"!= 12x10")
            continue
        w, h, red, g, b = _synth_gradient(i)
        src = np.stack([red, g, b], axis=-1).astype(np.uint8)
        exp = _ref_bilinear_mean(src, 12, 10)
        if abs(r["mean_pixel"] - exp) > 3.0:
            bad.append(f"doc {i}: resized mean {r['mean_pixel']} off "
                       f"synthesis-derived {round(exp, 3)} by > 3.0")
    return bad[:3]


def _check_video_frames(con, rows: list[dict]) -> list[str]:
    """Checker-golden for multimodal_video_frames (round-11 graduation
    from rows-only, the same construction as the resize graduation):
    expected stats are RE-DERIVED FROM THE SYNTHESIS BRANCH, not from a
    checker-side AVI decoder. attach_avi_media documents the per-id
    geometry (w = 16 + i%4*8, h = 16 + (i//2)%3*8), frame count
    (3 + i%4), rate (2 + i%3), and per-frame pixel formula; the sampler
    contract fixes the timestamp grid (t = 0, 1000, ... < n*1000//fps)
    and the nearest-frame index (min(t*fps//1000, n-1)). So for every
    output row the checker knows EXACTLY which synthesized frame was
    decoded: dims and the (doc, t) row-set must match exactly, and the
    decoded mean pixel must land within 1.0 of the formula's mean
    (quality-90 JPEG on these gradients deviates <= 0.29, measured over
    60+ ids; the band leaves 3x headroom). The average hash is not
    compared — threshold pixels flip under quantization (same policy as
    the JPEG decode band)."""
    import numpy as np

    ids = [i for (i,) in con.execute(
        "SELECT doc_id FROM documents").fetchall()]
    expect = {}
    for i in ids:
        i = int(i)
        w, h = 16 + (i % 4) * 8, 16 + ((i // 2) % 3) * 8
        n_frames, fps = 3 + i % 4, 2 + i % 3
        dur_ms = n_frames * 1000 // fps
        yy, xx = np.mgrid[0:h, 0:w]
        t = 0
        while t == 0 or t < dur_ms:
            f = min(t * fps // 1000, n_frames - 1)
            px = np.stack([
                (xx * 8 + f * 40 + i) % 256,
                (yy * 8 + f * 23) % 256,
                np.full((h, w), (i * 7 + f * 11) % 256),
            ], axis=-1)
            expect[(i, t)] = (w, h, float(px.astype(float).mean()))
            t += 1000
    got_keys = {(r["doc_id"], r["frame_ms"]) for r in rows}
    if got_keys != set(expect):
        return [f"sampled (doc, ms) grid differs: "
                f"{len(got_keys ^ set(expect))} rows off"]
    bad = []
    for r in rows:
        w, h, mean = expect[(r["doc_id"], r["frame_ms"])]
        if (r["width"], r["height"]) != (w, h):
            bad.append(f"doc {r['doc_id']}@{r['frame_ms']}ms: dims "
                       f"{r['width']}x{r['height']} != {w}x{h}")
        elif abs(r["mean_pixel"] - mean) > 1.0:
            bad.append(f"doc {r['doc_id']}@{r['frame_ms']}ms: mean "
                       f"{r['mean_pixel']} off synthesis-derived "
                       f"{round(mean, 3)} by > 1.0")
    return bad[:3]


#: Entries whose check is an independent CHECKER-SIDE recomputation
#: (no SQL engine exposes zlib / eigendecomposition / codecs / FFT /
#: iterative BPE): the callable gets (duckdb_con, result rows as dicts)
#: and returns problem strings.
GOLDEN_CHECKS = {
    "text_compression_ratio": _check_compression_ratio,
    "pca_embeddings": _check_pca_embeddings,
    # round-9 graduations (formerly rows-only):
    "multimodal_bmp_decode": _check_image_decode("bmp"),
    "multimodal_png_decode": _check_image_decode("png"),
    "multimodal_gif_decode": _check_image_decode("gif"),
    "multimodal_jpeg_decode": _check_image_decode("jpeg", lossless=False),
    "multimodal_wav_decode": _check_wav_decode,
    "audio_spectral_wav": _check_audio_spectral,
    "bpe_train_merges": _check_bpe_train,
    "bpe_segment_docs": _check_bpe_segment,
    # round-10 graduation (formerly rows-only): expected resize stats
    # re-derived from the synthesis branch + an independent resampler
    "multimodal_resize_images": _check_resize_images,
    # round-11 graduation (formerly rows-only): per-(doc, timestamp)
    # frame stats re-derived from the synthesis formula + sampling math
    "multimodal_video_frames": _check_video_frames,
}

#: The 1 entry that remains rows-only HERE, with why (it is pinned
#: elsewhere by committed goldens and/or differential tests):
#:   multimodal_image_features — the FAKE-codec plumbing entry: its stats
#:     derive from raw payload bytes by construction, so a recomputation
#:     would restate the same byte arithmetic, not verify anything new;
#:     the REAL decode path it shares is golden-checked above 4 ways.


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[2:])

    spark = get_spark(app_name="check_oracle")
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{name}.parquet')")

    queries = contract.queries()
    oracles = contract.oracle_sql()
    failures = []

    for name, fn in queries.items():
        if only and name not in only:
            continue
        started = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            failures.append(name)
            continue
        elapsed = time.monotonic() - started

        if name in APPROX_ORACLES:
            exact_sql, key_col, est_col, rel_tol = APPROX_ORACLES[name]
            exact = dict(con.execute(exact_sql).fetchall())
            got = {r[key_col]: r[est_col] for r in
                   (dict(zip(scols, row)) for row in srows)}
            bad = []
            if set(got) != set(exact):
                bad.append(f"groups {sorted(got)} != {sorted(exact)}")
            for g, n in exact.items():
                est = got.get(g, 0)
                if abs(est - n) > max(2, rel_tol * n):
                    bad.append(f"{g}: est {est} vs exact {n} "
                               f"(tol {rel_tol:.1%})")
            if bad:
                print(f"FAIL  {name}: {'; '.join(bad)}")
                failures.append(name)
            else:
                worst = max((abs(got[g] - n) / n for g, n in exact.items()
                             if n), default=0.0)
                print(f"PASS  {name}: within {rel_tol:.1%} of the exact "
                      f"oracle (worst err {worst:.2%}, "
                      f"{len(srows)} rows, {elapsed:.1f}s)")
            continue

        if name in RECALL_ORACLES:
            exact_sql, id_col, score_col, floor = RECALL_ORACLES[name]
            exact = dict(con.execute(exact_sql).fetchall())
            got = {r[id_col]: r[score_col] for r in
                   (dict(zip(scols, row)) for row in srows)}
            bad = []
            hits = set(got) & set(exact)
            recall = len(hits) / len(exact) if exact else 0.0
            if recall < floor:
                bad.append(f"recall@{len(exact)} = {recall:.2f} "
                           f"< floor {floor:.2f}")
            for i in sorted(hits):
                if abs(got[i] - exact[i]) > 1e-6:
                    bad.append(f"id {i}: score {got[i]} != exact {exact[i]}")
            if bad:
                print(f"FAIL  {name}: {'; '.join(bad)}")
                failures.append(name)
            else:
                print(f"PASS  {name}: recall@{len(exact)} = {recall:.2f} "
                      f">= {floor:.2f}, recovered scores exact "
                      f"({len(srows)} rows, {elapsed:.1f}s)")
            continue

        if name in GOLDEN_CHECKS:
            rows_d = [dict(zip(scols, row)) for row in srows]
            bad = GOLDEN_CHECKS[name](con, rows_d)
            if bad:
                print(f"FAIL  {name}: {'; '.join(bad)}")
                failures.append(name)
            else:
                print(f"PASS  {name}: checker-golden recomputation exact "
                      f"({len(srows)} rows, {elapsed:.1f}s)")
            continue

        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(srows)} rows, "
                  f"{elapsed:.1f}s)")
            if len(srows) == 0 and name != "anti_join_customers":
                print(f"      WARNING: {name} returned 0 rows")
            continue

        # Output-typing convention (catalog/__init__.py): oracle-exact
        # entries must not emit array/map columns (the driver's pandas
        # canonicalizer crashes on unhashable cells) nor DECIMAL wider
        # than precision 18 (hashes engine-dependently). Refuse here so a
        # local PASS predicts a driver PASS — round 6's four driver reds
        # were exactly this class, and the old checker passed them.
        hostile = driver_hostile_fields(sdf.schema)
        # Mirror the sweep on the ORACLE side (round-8 lesson:
        # domain_capped_docs shipped a HUGEINT sum the Spark-only check
        # could not see).
        try:
            hostile += [f"oracle {h}"
                        for h in oracle_hostile_fields(con, oracles[name])]
        except Exception as exc:
            hostile.append(f"oracle DESCRIBE failed: {exc}")
        if hostile:
            print(f"FAIL  {name}: driver-hostile output columns: "
                  f"{', '.join(hostile)}")
            failures.append(name)
            continue

        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures.append(name)
            continue

        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns {sorted(scols)} != {sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} != {len(drows)}")
        if not problems:
            sset, dset = row_set(scols, srows), row_set(dcols, drows)
            if sset != dset:
                dlookup, slookup = set(dset), set(sset)
                diff_a = [r for r in sset if r not in dlookup][:3]
                diff_b = [r for r in dset if r not in slookup][:3]
                problems.append(f"values differ; spark-only={diff_a} "
                                f"duckdb-only={diff_b}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"PASS  {name} ({len(srows)} rows, {elapsed:.1f}s)")

    spark.stop()
    if not only:  # full sweep: print the coverage line README quotes
        n_total = len(queries)
        n_band = len([n for n in APPROX_ORACLES if n in queries])
        n_recall = len([n for n in RECALL_ORACLES if n in queries])
        n_golden = len([n for n in GOLDEN_CHECKS if n in queries])
        n_oracle = len([n for n in oracles if n not in APPROX_ORACLES
                        and n not in RECALL_ORACLES])
        print(f"\ncatalog: {n_total} entries = {n_oracle} oracle-exact + "
              f"{n_band} error-band + {n_recall} recall-band + "
              f"{n_golden} checker-golden + "
              f"{n_total - n_oracle - n_band - n_recall - n_golden} "
              f"rows-only (goldens)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
