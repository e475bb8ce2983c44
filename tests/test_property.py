"""Property-based fuzz (hypothesis) for the hand-written codecs and the
dialect translator — the components most likely to harbor parsing edge
cases a fixed example suite misses."""

import string

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_mark1_spark.plans.dialect import _strf_to_java
from etl_mark1_spark.sources.excel import read_xlsx_rows, write_xlsx
from etl_mark1_spark.sources.pdf import extract_pdf_pages, make_pdf

# printable latin-1 minus control chars; PDF literals must escape (, ), \
_PDF_TEXT = st.text(
    alphabet=string.ascii_letters + string.digits + string.punctuation + " ",
    max_size=200)


@given(st.lists(_PDF_TEXT, min_size=1, max_size=6))
@settings(max_examples=60, deadline=None)
def test_pdf_roundtrip_any_ascii(pages):
    assert extract_pdf_pages(make_pdf(pages)) == pages
    assert extract_pdf_pages(make_pdf(pages, compress=False)) == pages


_CELL = st.one_of(
    st.none(),
    st.integers(min_value=-10**12, max_value=10**12),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.booleans(),
    st.text(alphabet=string.printable.replace("\x0b", "").replace("\x0c", ""),
            max_size=60),
)


@given(st.lists(st.lists(_CELL, min_size=1, max_size=6),
                min_size=1, max_size=8))
@settings(max_examples=60, deadline=None)
def test_xlsx_roundtrip_any_cells(rows):
    import os
    import tempfile

    width = max(len(r) for r in rows)
    rows = [r + [None] * (width - len(r)) for r in rows]
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.xlsx")
        write_xlsx(rows, path)
        got = read_xlsx_rows(path)

    def norm(v):
        if isinstance(v, bool) or not isinstance(v, float):
            return v
        if v.is_integer():
            return int(v)  # codec stores 2.0 as "2.0", reads back int-valued
        return pytest.approx(v, rel=1e-9)

    # trailing all-None columns collapse (no cells were written for them)
    assert len(got) == len(rows)
    for grow, wrow in zip(got, rows):
        for g, w in zip(grow, wrow):
            assert g == norm(w)


_STRF_DIRS = "YymdHIMSfjaAbBp%"


@given(st.lists(
    st.one_of(
        st.sampled_from([f"%{d}" for d in _STRF_DIRS]),
        st.text(alphabet=string.ascii_letters + " -:/.,", min_size=1,
                max_size=4),
    ),
    min_size=1, max_size=6).map("".join))
@settings(max_examples=200, deadline=None)
def test_strf_translation_matches_duckdb(fmt):
    """For ANY format built from supported directives and literal text, the
    translated Java pattern must produce DuckDB's exact strftime output.
    (Spark's date_format and Java's DateTimeFormatter agree on these
    patterns; parity with Spark itself is covered by the corpus test.)"""
    try:
        java = _strf_to_java(fmt)
    except Exception:
        pytest.skip("refused format (dangling % etc.) — refusal is fine")

    want = duckdb.sql(
        "SELECT strftime(TIMESTAMP '2024-03-05 17:08:09.123456', ?)",
        params=[fmt]).fetchone()[0]

    from datetime import datetime

    ts = datetime(2024, 3, 5, 17, 8, 9, 123456)
    mapping = {
        "Y": "2024", "y": "24", "m": "03", "d": "05", "H": "17",
        "I": "05", "M": "08", "S": "09", "f": "123456", "j": "065",
        "a": ts.strftime("%a"), "A": ts.strftime("%A"),
        "b": ts.strftime("%b"), "B": ts.strftime("%B"), "p": "PM",
        "%": "%",
    }
    # scan left-to-right (a replace() loop corrupts adjacent directives
    # like '%%A'); this is the reference expansion DuckDB must match
    expect, i = [], 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            expect.append(mapping[fmt[i + 1]])
            i += 2
        else:
            expect.append(fmt[i])
            i += 1
    assert want == "".join(expect)


@pytest.mark.parametrize("fmt", ["%Y-%m-%d %H:%M:%S", "%I %p on %A",
                                 "%j/%y %f", "T%H layered 'quotes' %d"])
def test_strf_java_side_matches_duckdb_via_spark(spark, fmt):
    """End-to-end: the translated pattern through Spark equals DuckDB."""
    from etl_mark1_spark.plans.dialect import translate

    lit = fmt.replace("'", "''")
    sql = (f"SELECT strftime(TIMESTAMP '2024-03-05 17:08:09.123456', "
           f"'{lit}') AS x")
    want = duckdb.sql(sql).fetchone()[0]
    got = spark.sql(translate(sql)).first().x
    assert got == want


@given(
    st.integers(min_value=1, max_value=40),   # width
    st.integers(min_value=1, max_value=40),   # height
    st.integers(min_value=0, max_value=2**32 - 1),  # pixel seed
    st.sampled_from([(False, 0, False), (True, 0, False), (False, 2, False),
                     (True, 3, False), (False, 0, True), (True, 0, True)]),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_roundtrip_any_shape(w, h, seed, variant):
    """Any image shape (odd dims, 1xN strips, MCU-straddling sizes) must
    survive encode->decode at q100 within quantization-rounding distance
    for 4:4:4, and within the documented chroma band when subsampled.
    Progressive encodings carry the same coefficients, so their decode
    must additionally be bit-identical to the sequential sibling's."""
    import numpy as np

    from etl_mark1_spark.operators.jpeg import decode_jpeg, make_jpeg

    subsample, restart, progressive = variant
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    blob = make_jpeg(img, quality=100, subsample=subsample,
                     restart_interval=restart, progressive=progressive)
    dec = decode_jpeg(blob)
    if progressive:
        seq = decode_jpeg(make_jpeg(img, quality=100, subsample=subsample))
        assert np.array_equal(dec, seq)
    assert dec.shape == img.shape
    err = abs(dec.astype(int) - img.astype(int)).max()
    if subsample:
        # chroma averaged over 2x2 then re-expanded: on noise, chroma error
        # is unbounded by design, and out-of-gamut clipping lets a little
        # of it bleed into reconstructed luma — so bound the luma error in
        # aggregate (tight) and pointwise (loose, clipping-limited)
        y = img @ [0.299, 0.587, 0.114]
        y2 = dec @ [0.299, 0.587, 0.114]
        # pointwise luma error under subsampled noise is clip-dependent
        # (wrong chroma pushes channels out of gamut and clipping cuts
        # them asymmetrically) — the aggregate bound is the invariant
        assert abs(y2 - y).mean() <= 3
        assert abs(y2 - y).max() <= 64
    else:
        # q100 quantizes every DCT coefficient to the nearest integer;
        # +-0.5 on all 64 coefficients stacks to at most
        # 0.5 * sum|basis| ~ 6 pixel units on adversarial blocks (plus
        # color-transform rounding) — bound above the theoretical worst
        # case so a stochastic fuzz run can never flake on a real codec
        assert err <= 8
        assert abs(dec.astype(int) - img.astype(int)).mean() <= 2


@given(
    st.integers(min_value=1, max_value=40),   # width
    st.integers(min_value=1, max_value=40),   # height
    st.integers(min_value=0, max_value=2**32 - 1),  # pixel seed
    st.sampled_from([1, 2, 3, 4]),            # channels
    st.sampled_from([None, 0, 1, 2, 3, 4]),   # row filter (None = cycle)
    st.sampled_from([8, 16, 1, 2, 4]),        # bit depth
    st.booleans(),                            # Adam7 interlace
)
@settings(max_examples=80, deadline=None)
def test_png_roundtrip_is_lossless(w, h, seed, ch, filt, depth, interlace):
    """PNG is lossless: any shape x channel count x row filter x legal
    bit depth x interlacing must round-trip encode->decode bit-exactly —
    including 1xN strips where the left/up predecessors are all edge
    cases, sub-byte rows with padding bits, and Adam7 passes a pixel
    wide. Sub-byte depths are grayscale-only per spec; grayscale scales
    by the spec's exact factor on decode."""
    import numpy as np

    from etl_mark1_spark.operators.png import decode_png, make_png

    if depth in (1, 2, 4) and ch != 1:
        depth = 8                              # spec-illegal: nearest legal
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    hi = 1 << min(depth, 16)
    img = rng.integers(0, hi, shape,
                       dtype=np.uint16 if depth == 16 else np.uint8)
    dec = decode_png(make_png(img, filter_type=filt, interlace=interlace,
                              depth=depth if depth != 16 else None))
    assert dec.shape == img.shape
    scale = 255 // (hi - 1) if depth in (1, 2, 4) else 1
    assert (dec == img * scale).all()


@given(st.integers(min_value=0, max_value=2**32 - 1),
       st.integers(min_value=1, max_value=300))
@settings(max_examples=25, deadline=None)
def test_png_single_byte_corruption_never_misdecodes(seed, pos):
    """Flipping any byte must either still decode to the exact original
    (flip landed in padding/irrelevant bits — impossible here since every
    chunk is CRC-covered) or raise cleanly; silent wrong pixels are the
    one unacceptable outcome."""
    import numpy as np
    import zlib

    from etl_mark1_spark.operators.png import decode_png, make_png

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    blob = bytearray(make_png(img))
    pos = 8 + pos % (len(blob) - 8)  # leave the signature alone
    blob[pos] ^= 0x5A
    try:
        dec = decode_png(bytes(blob))
    except (ValueError, NotImplementedError, zlib.error):
        return
    assert (dec == img).all()


@given(st.integers(min_value=1, max_value=60),
       st.integers(min_value=1, max_value=60),
       st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=25, deadline=None)
def test_jpeg_grayscale_roundtrip_any_shape(w, h, seed):
    import numpy as np

    from etl_mark1_spark.operators.jpeg import decode_jpeg, make_jpeg

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    dec = decode_jpeg(make_jpeg(img, quality=100))
    assert dec.shape == img.shape
    assert abs(dec.astype(int) - img.astype(int)).max() <= 2


# -- semantic invariants of the round-4 curation operators ------------------

@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                min_size=5, max_size=40),
       st.integers(min_value=0, max_value=10**6))
@settings(max_examples=8, deadline=None, derandomize=True)
def test_winsorize_bounds_tails_preserves_interior_and_order(spark, vals,
                                                             seed):
    """Outputs lie in the [p10, p90] cutoff range, values already inside
    the range pass through bit-identical, and the value ordering is
    (non-strictly) preserved. NOT asserted: idempotence — interpolated
    cutoffs (pandas clip(quantile) semantics) legitimately move inward
    when re-estimated on clipped data whose cutoff fell between points."""
    import numpy as np

    from etl_mark1_spark.plans.quality import winsorize

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], ["k", "v"])
    got = {r.k: r.v for r in winsorize(df, "v", 0.1, 0.9).collect()}
    lo, hi = np.quantile(np.array(vals), [0.1, 0.9])
    assert all(lo <= v <= hi or abs(v - lo) < 1e-9 or abs(v - hi) < 1e-9
               for v in got.values())
    for i, v in enumerate(vals):
        if lo <= v <= hi:
            assert got[i] == v  # interior untouched, bit-identical
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    clipped = [got[i] for i in order]
    assert clipped == sorted(clipped)  # monotone


@given(st.lists(st.integers(min_value=0, max_value=50),
                min_size=2, max_size=60),
       st.lists(st.integers(min_value=0, max_value=50),
                min_size=2, max_size=60))
@settings(max_examples=8, deadline=None, derandomize=True)
def test_ks_drift_is_symmetric_and_bounded(spark, xs, ys):
    """KS is a metric-like statistic: symmetric in its arguments and in
    [0, 1]; 0 iff the empirical distributions coincide."""
    from etl_mark1_spark.plans.quality import ks_drift

    a = spark.createDataFrame([(float(v),) for v in xs], ["v"])
    b = spark.createDataFrame([(float(v),) for v in ys], ["v"])
    ab = ks_drift(a, b, "v").first().ks_stat
    ba = ks_drift(b, a, "v").first().ks_stat
    assert ab == ba
    assert 0.0 <= ab <= 1.0
    from collections import Counter

    if Counter(xs) == Counter(ys):
        assert ab == 0.0


@given(st.integers(min_value=4, max_value=9),
       st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=6, deadline=None, derandomize=True)
def test_triangle_count_matches_bruteforce(spark, n, seed):
    """Random graph on n nodes vs an O(n^3) driver-side recount."""
    import itertools
    import random

    from etl_mark1_spark.operators.graph import triangle_count

    rng = random.Random(seed)
    edges = [(a, b) for a, b in itertools.combinations(range(n), 2)
             if rng.random() < 0.5]
    if not edges:
        return
    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for a, b, c in itertools.combinations(range(n), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1
    got = {r.node: r.n_triangles
           for r in triangle_count(
               spark.createDataFrame(edges, ["src", "dst"])).collect()}
    assert got == want


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.sampled_from([2, 5, 16, 97, 256]),
    st.booleans(),
)
@settings(max_examples=30, deadline=None)
def test_gif_roundtrip_is_exact(w, h, seed, n_colors, interlace):
    """GIF is lossless for palettized content: encode -> decode must be
    bit-exact for any shape, palette size (covering every LZW starting
    code width), and the interlace flag."""
    import numpy as np

    from etl_mark1_spark.operators.gif import decode_gif, make_gif

    rng = np.random.default_rng(seed)
    idx = rng.integers(0, n_colors, size=(h, w)).astype(np.uint8)
    pal = rng.integers(0, 256, size=(n_colors, 3)).astype(np.uint8)
    out = decode_gif(make_gif(idx, pal, interlace=interlace))
    assert out.shape == (h, w, 3)
    assert (out == pal[idx]).all()


@given(st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=10, deadline=None)
def test_gif_dictionary_reset_and_degenerate_shapes(seed):
    """Highly repetitive large images force the 4096-entry LZW dictionary
    reset mid-stream; 1xN and Nx1 shapes exercise interlace passes that
    skip rows entirely."""
    import numpy as np

    from etl_mark1_spark.operators.gif import decode_gif, make_gif

    rng = np.random.default_rng(seed)
    big = np.tile(rng.integers(0, 4, size=(4, 256)).astype(np.uint8),
                  (64, 1))
    pal = rng.integers(0, 256, size=(4, 3)).astype(np.uint8)
    assert (decode_gif(make_gif(big, pal)) == pal[big]).all()
    for shape in ((1, 37), (37, 1), (1, 1)):
        idx = rng.integers(0, 4, size=shape).astype(np.uint8)
        for inter in (False, True):
            assert (decode_gif(make_gif(idx, pal, interlace=inter))
                    == pal[idx]).all()


@given(seed=st.integers(min_value=0, max_value=2**32 - 1),
       n_nodes=st.integers(min_value=1, max_value=12),
       edge_p=st.floats(min_value=0.0, max_value=1.0))
@settings(max_examples=40, deadline=None)
def test_dag_random_graphs_terminate_or_fail_loudly(spark, seed, n_nodes,
                                                    edge_p):
    """Property fuzz of the executor's GRAPH handling: any random digraph
    of pass-through nodes (incl. self-loops, parallel edges, dangling
    references, dense meshes) must either run to success in a valid
    topological order or raise ExecutionError for a cycle/bad reference
    — never hang, crash with a non-ExecutionError graph error, or visit
    a node before one of its parents."""
    import random

    from etl_mark1_spark.plans.dag import ExecutionError, PipelineExecutor

    rng = random.Random(seed)
    nodes = [{"id": f"n{i}", "type": "no_such_op_passthrough",
              "config": {}} for i in range(n_nodes)]
    edges = []
    for a in range(n_nodes):
        for b in range(n_nodes):
            if rng.random() < edge_p:
                edges.append({"source": f"n{a}", "target": f"n{b}"})
    if rng.random() < 0.3 and edges:            # sprinkle a dangling ref
        edges.append({"source": f"n{rng.randrange(n_nodes)}",
                      "target": "ghost"})
    definition = {"nodes": nodes, "edges": edges}

    ex = PipelineExecutor(spark)
    try:
        report = ex.execute(definition)
    except ExecutionError:
        return                                   # loud, typed failure: fine
    assert report.status in ("succeeded", "failed")
    if report.status == "succeeded":
        order = [log.node_id for log in report.node_logs]
        pos = {nid: i for i, nid in enumerate(order)}
        for e in edges:
            if e["source"] in pos and e["target"] in pos:
                assert pos[e["source"]] < pos[e["target"]], e
