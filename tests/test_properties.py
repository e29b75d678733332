"""Property-based tests (hypothesis): operator invariants that hold for
ANY input, not just the curated corpus."""

from __future__ import annotations

from hypothesis import example, given, settings, strategies as st

from light_etl_windows_container_poc_spark.operators.cleaning import sanitize_name

names = st.text(min_size=1, max_size=40)


@given(names)
@settings(max_examples=200, deadline=None)
def test_sanitize_name_idempotent(name):
    once = sanitize_name(name)
    assert sanitize_name(once) == once  # fixpoint: cleaning clean names is a no-op


@given(names)
@settings(max_examples=200, deadline=None)
def test_sanitize_name_output_charset(name):
    out = sanitize_name(name)
    assert all(c.islower() or c.isdigit() or c == "_" for c in out)
    assert not out.startswith("_") and not out.endswith("_")


@given(st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=30))
@settings(max_examples=50, deadline=None)
def test_shingles_count_matches_formula(tokens):
    # spark-side property checked via a tiny local session is too slow per
    # example; validate the python-reference formula the operator encodes:
    # n-word text yields max(n - 2, 0) 3-gram shingles (before dedup)
    n = len(tokens)
    expected_raw = max(n - 2, 0)
    shingles = [" ".join(tokens[i:i + 3]) for i in range(expected_raw)]
    assert len(shingles) == expected_raw
    assert len(set(shingles)) <= max(expected_raw, 0) + (0 if n >= 3 else 0)


def test_minhash_agreement_tracks_jaccard(spark):
    """Signature agreement must approximate true Jaccard (±0.15 at 128
    hashes) across constructed overlap levels."""
    from pyspark.sql import functions as F

    from light_etl_windows_container_poc_spark.functions.texts import (
        minhash_signature, signature_agreement, word_shingles)

    base = [f"w{i}" for i in range(60)]
    rows = []
    for frac in (0.0, 0.5, 0.9, 1.0):
        shared = int(60 * frac)
        other = base[:shared] + [f"x{i}" for i in range(60 - shared)]
        rows.append((" ".join(base), " ".join(other)))
    df = spark.createDataFrame(rows, "ta string, tb string")
    out = df.select(
        signature_agreement(minhash_signature(F.col("ta")),
                            minhash_signature(F.col("tb"))).alias("est"),
        (F.size(F.array_intersect(word_shingles(F.col("ta")),
                                  word_shingles(F.col("tb"))))
         / F.size(F.array_union(word_shingles(F.col("ta")),
                                word_shingles(F.col("tb"))))).alias("true_j"),
    ).collect()
    for r in out:
        assert abs(r.est - r.true_j) <= 0.15, (r.est, r.true_j)


def test_shingle_zipchain_matches_python_reference(spark):
    """word_shingles / word_ngrams_raw (zip_with-chain forms) must equal
    the straightforward Python sliding-window reference on adversarial
    token layouts: empty text, 1..n-1 tokens, exact n, repeats, long
    runs, multi-whitespace."""
    from pyspark.sql import functions as F

    from light_etl_windows_container_poc_spark.functions.texts import (
        word_ngrams_raw, word_shingles)

    texts = ["", " ", "a", "a b", "a b c", "a  b\tc", "a b c d e",
             "x x x x x x", "a b a b a b a b", " lead", "trail ",
             " ".join(f"t{i % 7}" for i in range(200))]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id long, text string")
    got = {r.id: (list(r.sh), list(r.bg)) for r in
           df.select("id", word_shingles(F.col("text"), 3).alias("sh"),
                     word_ngrams_raw(F.col("text"), 2).alias("bg"))
           .collect()}
    for i, t in enumerate(texts):
        toks = t.split()
        ref_sh = list(dict.fromkeys(  # array_distinct keeps first-seen order
            " ".join(toks[j:j + 3]) for j in range(max(len(toks) - 2, 0))))
        ref_bg = [" ".join(toks[j:j + 2])
                  for j in range(max(len(toks) - 1, 0))]
        assert got[i] == (ref_sh, ref_bg), f"text={t!r}"


# ---------------------------------------------------------------------------
# binary workbook codecs: round-trip fidelity for ANY grid (the curated
# tests cover known record shapes; these sweep arbitrary cell content)
# ---------------------------------------------------------------------------

_cell = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2 ** 40), max_value=2 ** 40),
    st.floats(allow_nan=False, allow_infinity=False, width=64,
              min_value=-1e12, max_value=1e12),
    st.text(max_size=25),
)
_grid = st.lists(st.lists(_cell, min_size=1, max_size=6),
                 min_size=1, max_size=12)


def _norm_cell(v):
    # writers canonicalize: floats that are exact integers come back as
    # ints (both codecs apply the same int-collapse the readers do)
    if isinstance(v, float) and v.is_integer() and abs(v) < 2 ** 53:
        return int(v)
    return v


def _norm_grid(grid):
    # a workbook stores a sparse cell map: fully-empty trailing rows and
    # columns are unrepresentable, and row widths are ragged-normalized
    cells = {(r, c): _norm_cell(v)
             for r, row in enumerate(grid) for c, v in enumerate(row)
             if v is not None}  # empty strings are real cells and round-trip
    if not cells:
        return []
    n_rows = max(r for r, _ in cells) + 1
    width = max(c for _, c in cells) + 1
    return [[cells.get((r, c)) for c in range(width)] for r in range(n_rows)]


@given(_grid)
@settings(max_examples=60, deadline=None)
def test_xls_biff8_round_trip_any_grid(grid):
    from light_etl_windows_container_poc_spark.sources.xls_biff import (
        build_xls_bytes, parse_xls_rows)

    got = parse_xls_rows(build_xls_bytes({"s": grid}))
    assert got == _norm_grid(grid)


@given(_grid)
@settings(max_examples=60, deadline=None)
def test_xlsb_biff12_round_trip_any_grid(grid):
    from light_etl_windows_container_poc_spark.sources.xlsb_biff12 import (
        build_xlsb_bytes, parse_xlsb_rows)

    got = parse_xlsb_rows(build_xlsb_bytes({"s": grid}))
    assert got == _norm_grid(grid)


@given(_grid)
@example([["_x005F\x01"]])          # escape creates a false token tail
@example([["_x0041\x01"]])          # literal tail + escaped char
@example([["_x005F_x0041_"]])        # overlapping escape-like runs
@example([["a_x000D_b"]])            # literal text that LOOKS escaped
@example([["\r\n\t_x"]])            # CR normalization + bare '_x'
@settings(max_examples=60, deadline=None)
def test_xlsx_spreadsheetml_round_trip_any_grid(grid):
    # completes the format set: all three codecs hold the same
    # round-trip law under the same normalization
    from light_etl_windows_container_poc_spark.sources.xlsx import (
        build_xlsx_bytes, parse_xlsx_rows)

    got = parse_xlsx_rows(build_xlsx_bytes({"s": grid}))
    assert got == _norm_grid(grid)


@given(st.integers(min_value=4, max_value=64),
       st.integers(min_value=4, max_value=64),
       st.integers(min_value=0, max_value=2 ** 31))
@settings(max_examples=60, deadline=None)
def test_png_resize_geometry_any_dims(w, h, seed):
    """Nearest-neighbor gather through the real PNG codec equals the
    direct numpy reference for ANY source dims — build → decode →
    unfilter → gather, no Spark session needed per example."""
    import numpy as np

    from light_etl_windows_container_poc_spark.operators.media_codec import (
        build_png_bytes, decode_png)

    rng = np.random.default_rng(seed)
    grid = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    meta = decode_png(build_png_bytes(w, h, grid.tobytes()))
    back = np.frombuffer(bytes(meta["pixels"]), dtype=np.uint8).reshape(h, w)
    assert (back == grid).all()  # codec round-trip exact

    sx = (np.arange(4) * w) // 4
    sy = (np.arange(4) * h) // 4
    small = back[np.ix_(sy, sx)]
    assert small.shape == (4, 4)
    # gather picks real source pixels: every value exists at its mapped coord
    for yi, y in enumerate(sy):
        for xi, x in enumerate(sx):
            assert small[yi, xi] == grid[y, x]


@given(st.lists(st.integers(min_value=0, max_value=10_000),
                min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)
def test_ewma_dyadic_weights_reference(series):
    """The lag-window EWMA formula: renormalized dyadic weights over the
    trailing ≤8 observations, exact in integers — warm-up equals the
    plain value, and a constant series is a fixpoint."""
    for t in range(len(series)):
        lags = series[max(0, t - 7):t + 1][::-1]  # n0 (today) first
        num = sum(v * (128 >> k) for k, v in enumerate(lags))
        den = sum(128 >> k for k in range(len(lags)))
        ewma_milli = 1000 * num // den
        if t == 0:
            assert ewma_milli == 1000 * series[0]
        if len(set(series[:t + 1])) == 1:
            assert ewma_milli == 1000 * series[t]
        lo, hi = min(lags), max(lags)
        assert 1000 * lo <= ewma_milli <= 1000 * hi


@given(st.lists(st.integers(min_value=1, max_value=10 ** 9),
                min_size=2, max_size=40))
@settings(max_examples=100, deadline=None)
def test_gini_formula_bounds_and_invariance(masses):
    """Gini stays in [0, 1), equals 0 for equal masses, and is
    invariant to the order of tied ranks (the Σ i·x identity the
    source_gini docstring claims)."""
    n, tot = len(masses), sum(masses)
    xs = sorted(masses)
    iw = sum((i + 1) * x for i, x in enumerate(xs))
    gini_micro = (1_000_000 * (2 * iw - (n + 1) * tot)) // (n * tot)
    assert 0 <= gini_micro < 1_000_000
    if len(set(masses)) == 1:
        assert gini_micro == 0
    # tie-order invariance: any permutation of equal values gives same Σi·x
    import itertools
    if n <= 6:
        for perm in itertools.permutations(range(n)):
            ys = [xs[i] for i in perm]
            if ys == sorted(ys):
                iw2 = sum((i + 1) * x for i, x in enumerate(ys))
                assert iw2 == iw
