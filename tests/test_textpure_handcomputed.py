"""Hand-computed expectations for the pure text kernels — the ground
level of the test pyramid (SURVEY §5.1): these values were worked out
by hand, not by running the code.
"""

from __future__ import annotations

import math

from standard_data_quality_framework_spark.functions.textpure import (
    extract_text, native_signals, repetition_signals, scrub)


def test_native_signals_hand():
    text = "The cat... sat ### on a mat"
    s = native_signals(text)
    # tokens: The cat... sat ### on a mat -> 7
    assert s["n_words"] == 7
    assert s["n_chars"] == len(text) == 27
    # non-ws chars: 27 - 6 spaces = 21; mean word len = 21/7 = 3.0
    assert math.isclose(s["mean_word_len"], 3.0)
    # symbols: '...' once, '#' three times -> 4; 4/7
    assert math.isclose(s["symbol_to_word"], 4 / 7)
    # stopwords: the, on, a, at (inside 'cat...'? no: \b(at)\b matches
    # in 'cat...'? 'cat' has 'at' preceded by 'c' (word char) -> no \b.
    # 'mat' likewise no. Hits: The->the, on, a -> plus 'a' in 'a' only.
    # "sat" no. So hits = [the, on, a] = 3; 3/7
    assert math.isclose(s["stopword_frac"], 3 / 7)
    assert s["distinct_stopwords"] == 3
    # non-alnum: '.'x3 + '#'x3 = 6 of 27 chars
    assert math.isclose(s["nonalnum_frac"], 6 / 27)


def test_native_signals_empty():
    s = native_signals("")
    assert s["n_words"] == 0 and s["mean_word_len"] == 0.0
    assert s["stopword_frac"] == 0.0 and s["nonalnum_frac"] == 0.0


def test_repetition_hand():
    # 3 lines, one duplicated -> dup_line_frac = 1 - 2/3 = 1/3
    text = "aa bb\naa bb\ncc dd"
    d, top2, dup5 = repetition_signals(text)
    assert math.isclose(d, 1 / 3)
    # tokens: aa bb aa bb cc dd; top 2-gram (aa,bb) x2 covers 2*(2+2)=8
    # of 12 token chars
    assert math.isclose(top2, 8 / 12)
    # 5-grams: (aa,bb,aa,bb,cc),(bb,aa,bb,cc,dd) all unique -> 0
    assert dup5 == 0.0


def test_extract_text_hand():
    html = b"<html><body><p>Hello &amp; hi</p><p>there</p></body></html>"
    assert extract_text(html) == "Hello & hi\n\nthere"
    assert extract_text(b"<p>x</p><script>var a=1;</script>") == "x"
    assert extract_text(None) == ""
    # invalid utf-8 -> U+FFFD replacement, never an exception
    assert "�" in extract_text(b"\xff\xfe<p>a</p>")


def test_scrub_hand():
    text = ("mail bob1@mail2.example or call +1-555-201-3344, "
            "host 10.1.2.3 id 123-45-6789 you badword1")
    out, n = scrub(text)
    assert out == ("mail <EMAIL> or call <PHONE>, "
                   "host <IP> id <SSN> you <TOX>")
    assert n == 5
    # idempotent on clean text
    clean, zero = scrub("nothing sensitive here")
    assert clean == "nothing sensitive here" and zero == 0
