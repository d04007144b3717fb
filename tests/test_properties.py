"""Property-based tests (hypothesis) for the pure-Python hot paths —
codec round-trips and hash-family invariants.  The reference has no
property tests (SURVEY §5); these cover the code the DuckDB oracle
can't reach."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from csp_gateway_spark.operators.dedup import _AFFINE_P, _affine_coeffs
from csp_gateway_spark.operators.multimodal import (
    _decode_bmp_bytes,
    _decode_png_bytes,
    _nearest_resize,
)
from csp_gateway_spark.operators.similarity import _hyperplanes
from tests.test_multimodal_decode import make_bmp, make_png


@st.composite
def images(draw, max_side=12):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    data = draw(st.binary(min_size=h * w * 3, max_size=h * w * 3))
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


@given(images())
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_any_image(px):
    assert np.array_equal(_decode_png_bytes(make_png(px)), px)


@given(images(), st.sampled_from([0, 2]))
@settings(max_examples=25, deadline=None)
def test_png_roundtrip_any_filter(px, ftype):
    assert np.array_equal(_decode_png_bytes(make_png(px, filter_type=ftype)), px)


@given(images())
@settings(max_examples=25, deadline=None)
def test_bmp_roundtrip_any_image(px):
    assert np.array_equal(_decode_bmp_bytes(make_bmp(px)), px)


@given(images(), st.integers(1, 16), st.integers(1, 16))
@settings(max_examples=25, deadline=None)
def test_resize_samples_source_pixels(px, out_w, out_h):
    out = _nearest_resize(px, out_w, out_h)
    assert out.shape == (out_h, out_w, 3)
    # every output pixel exists somewhere in the source
    src = {tuple(p) for row in px for p in row}
    assert all(tuple(p) in src for row in out for p in row)


@given(st.integers(1, 64), st.integers(0, 2**31))
@settings(max_examples=50, deadline=None)
def test_affine_coeffs_in_field(num, seed):
    coeffs = _affine_coeffs(num, seed)
    assert len(coeffs) == num
    for a, c in coeffs:
        assert 1 <= a < _AFFINE_P  # multiplier never 0 (degenerate hash)
        assert 0 <= c < _AFFINE_P
    # deterministic per seed
    assert coeffs == _affine_coeffs(num, seed)


@given(st.integers(1, 16), st.integers(1, 64), st.integers(0, 2**31))
@settings(max_examples=30, deadline=None)
def test_hyperplanes_unit_norm_and_deterministic(bits, dim, seed):
    planes = _hyperplanes(dim, bits, seed)
    assert len(planes) == bits and all(len(p) == dim for p in planes)
    for p in planes:
        assert abs(sum(x * x for x in p) - 1.0) < 1e-9  # unit norm
    assert planes == _hyperplanes(dim, bits, seed)


@given(st.binary(max_size=64))
@settings(max_examples=200, deadline=None)
def test_jpeg_marker_walk_total_on_any_bytes(tail):
    """The marker walk terminates on arbitrary bytes with either a
    ValueError or sane dimensions — never another exception, and never
    dimensions parsed from entropy-coded data (SOS guard)."""
    from csp_gateway_spark.operators.multimodal import _jpeg_meta_bytes

    for data in (tail, b"\xff\xd8" + tail):
        try:
            w, h, comps, prog = _jpeg_meta_bytes(data)
        except ValueError:
            continue
        assert 0 <= w <= 0xFFFF and 0 <= h <= 0xFFFF
        assert 0 <= comps <= 255 and isinstance(prog, bool)


@given(st.binary(max_size=64))
@settings(max_examples=100, deadline=None)
def test_jpeg_sos_before_sof_always_rejects(tail):
    """Anything after an SOS marker is entropy-coded data: a JPEG whose
    scan starts before any SOF must raise, no matter what byte soup
    (including fake 0xFF 0xCx pairs) follows."""
    import pytest

    from csp_gateway_spark.operators.multimodal import _jpeg_meta_bytes

    data = b"\xff\xd8" + b"\xff\xda" + (8).to_bytes(2, "big") + bytes(6) + tail
    with pytest.raises(ValueError):
        _jpeg_meta_bytes(data)


def test_norm_tokens_equals_composed_tokenization(spark):
    """norm_tokens (single-regex fast path) must emit the IDENTICAL
    token stream as filter(tokens(normalize_text(.)), != '') on
    adversarial inputs — punctuation runs, unicode, empties, NULLs."""
    import pyspark.sql.functions as F

    from csp_gateway_spark.operators.text import norm_tokens, normalize_text, tokens

    texts = [
        "Hello, World!  foo--bar __x__ 42",
        "",
        None,
        "   ",
        "...!!!",
        "a",
        "CamelCase mixedUP 0x1f 1,000.50",
        "tab\tsep\nnewline\r\nwin",
        "émigré naïve 日本語 test",  # non-ascii folds to separators
        "trailing space ",
        " leading",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    composed = F.filter(tokens(normalize_text(F.col("t"))), lambda x: x != F.lit(""))
    a = df.select("i", F.posexplode_outer(composed)).collect()
    b = df.select("i", F.posexplode_outer(norm_tokens(F.col("t")))).collect()
    assert a == b


# ---------------------------------------------------------------------------
# Randomized edge patterns for the round-5 advisory fixes: scd2's
# all-NULL first row, merge_snapshot's duplicate-key refusal, and
# fk_audit's NULL-FK accounting stay fixed under arbitrary key/NULL
# shapes, checked against plain-Python reference models.
# ---------------------------------------------------------------------------

_attr_vals = st.one_of(st.none(), st.integers(0, 3))


@st.composite
def scd2_streams(draw):
    n_keys = draw(st.integers(1, 3))
    rows = []
    for k in range(n_keys):
        n = draw(st.integers(1, 6))
        # unique ts per key (contract), attrs nullable with repeats
        for t in range(n):
            rows.append((k, t, draw(_attr_vals), draw(_attr_vals)))
    return rows


@given(scd2_streams())
@settings(max_examples=10, deadline=None)
def test_scd2_matches_reference_model_with_nulls(spark, rows):
    from csp_gateway_spark.operators.state import scd2

    df = spark.createDataFrame(rows, "k int, ts int, a int, b int")
    got = {
        (r.k, r.valid_from): (r.a, r.b, r.valid_to, r.is_current)
        for r in scd2(df, ["k"], "ts", ["a", "b"]).collect()
    }
    # reference model: first row always opens a version; runs of
    # None-safe-equal attrs collapse; valid_to = next version's ts
    want = {}
    by_key = {}
    for k, ts, a, b in rows:
        by_key.setdefault(k, []).append((ts, a, b))
    for k, seq in by_key.items():
        seq.sort()
        versions = []
        prev = object()
        for ts, a, b in seq:
            if (a, b) != prev:
                versions.append((ts, a, b))
            prev = (a, b)
        for i, (ts, a, b) in enumerate(versions):
            nxt = versions[i + 1][0] if i + 1 < len(versions) else None
            want[(k, ts)] = (a, b, nxt, nxt is None)
    assert got == want


@st.composite
def cdc_batches(draw):
    cur = [(k, draw(st.integers(0, 9))) for k in range(draw(st.integers(1, 4)))]
    n_ch = draw(st.integers(1, 5))
    ch_keys = draw(
        st.lists(st.integers(0, 5), min_size=n_ch, max_size=n_ch)
    )
    changes = [
        (k, draw(st.integers(10, 19)), draw(st.sampled_from(["I", "U", "D"])))
        for k in ch_keys
    ]
    return cur, changes


@given(cdc_batches())
@settings(max_examples=10, deadline=None)
def test_merge_snapshot_dup_refusal_and_model(spark, data):
    import pytest as _pytest

    from csp_gateway_spark.sources.versioned import merge_snapshot

    cur_rows, ch_rows = data
    cur = spark.createDataFrame(cur_rows, "k int, v int")
    ch = spark.createDataFrame(ch_rows, "k int, v int, op string")
    keys = [k for k, _, _ in ch_rows]
    if len(set(keys)) != len(keys):
        # duplicate key in a ts-less batch MUST refuse, not fan out
        with _pytest.raises(ValueError):
            merge_snapshot(cur, ch, ["k"]).collect()
        return
    got = {r.k: r.v for r in merge_snapshot(cur, ch, ["k"]).collect()}
    want = dict(cur_rows)
    for k, v, op in ch_rows:
        if op == "D":
            want.pop(k, None)
        else:
            want[k] = v
    assert got == want


@st.composite
def fk_cases(draw):
    child = draw(
        st.lists(st.one_of(st.none(), st.integers(0, 5)), min_size=0, max_size=12)
    )
    parent = draw(
        st.lists(st.one_of(st.none(), st.integers(0, 5)), min_size=0, max_size=8)
    )
    return child, parent


@given(fk_cases())
@settings(max_examples=10, deadline=None)
def test_fk_audit_null_fk_accounting(spark, case):
    from csp_gateway_spark.operators.analytics import fk_audit

    child_vals, parent_vals = case
    child = spark.createDataFrame([(v,) for v in child_vals], "fk int")
    parent = spark.createDataFrame([(v,) for v in parent_vals], "pk int")
    r = fk_audit(child, parent, "fk", "pk").collect()[0]
    pk_set = {v for v in parent_vals if v is not None}
    n_null = sum(1 for v in child_vals if v is None)
    n_orph = sum(1 for v in child_vals if v is not None and v not in pk_set)
    assert (r.n_child, r.n_orphans, r.n_null_fk) == (
        len(child_vals), n_orph, n_null,
    )
