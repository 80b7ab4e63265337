"""Property-based tests (hypothesis) for the pure text kernels that
run inside the fused Arrow UDF — totality on arbitrary input, bounded
outputs, and the scrub chain's fixed-point contract. These kernels
see raw web bytes at 10^12-doc scale; 'never crashes, always bounded'
is the property that matters more than any single example."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from standard_data_quality_framework_spark.functions.textpure import (
    extract_text, native_signals, repetition_signals, scrub,
    scrub_edit_breakdown, tokenize)
from standard_data_quality_framework_spark.models.langid import (
    train_langid)

_MODEL = train_langid()


@given(st.binary(max_size=2000))
@settings(max_examples=300, deadline=None)
def test_extract_text_total_on_arbitrary_bytes(b):
    out = extract_text(b)
    assert isinstance(out, str)
    # contract rule 5: outer whitespace stripped, no 3+ newline runs
    assert out == out.strip("\n ") or out == ""
    assert "\n\n\n" not in out
    # deterministic (byte-identical contract)
    assert extract_text(b) == out


@given(st.text(max_size=1500))
@settings(max_examples=300, deadline=None)
def test_repetition_signals_bounded(t):
    a, b, c = repetition_signals(t)
    for v in (a, b, c):
        assert 0.0 <= v <= 1.0
    toks = tokenize(t)
    assert all(isinstance(x, str) and x for x in toks)


@given(st.text(max_size=1500))
@settings(max_examples=300, deadline=None)
def test_scrub_is_a_fixed_point_and_counts_match(t):
    out, n = scrub(t)
    assert n >= 0
    if n == 0:
        assert out == t
    # placeholders are never re-scrubbed: one pass reaches the fixed
    # point (the idempotence a PII scrubber must have, or re-runs of a
    # resumed pipeline would mangle already-scrubbed text)
    out2, n2 = scrub(out)
    assert n2 == 0 and out2 == out
    # the per-rule breakdown accounts for every edit
    assert sum(scrub_edit_breakdown(t).values()) == n


@given(st.text(max_size=800))
@settings(max_examples=200, deadline=None)
def test_native_signals_and_langid_total(t):
    sig = native_signals(t)
    assert isinstance(sig, dict)
    lang, conf = _MODEL.predict_one(t)
    assert isinstance(lang, str) and lang
    assert 0.0 <= conf <= 1.0
