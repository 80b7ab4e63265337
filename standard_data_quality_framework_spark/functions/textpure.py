"""Pure-Python text primitives shared by the Spark pandas-UDFs and the
pure-pandas reference labeler (tests/oracle.py).

Single source of truth for the byte-level contracts the north rule
demands ("byte-identical extracted text per url", byte-identical
scrubbed text): the pandas UDF and the oracle call the SAME functions,
so divergence is impossible by construction. Everything here is
deterministic, dependency-free (stdlib + re), and vectorizes cleanly
over an Arrow batch (the UDFs call these via pandas .map / .str ops).

The heuristic semantics recast the reference's per-record checks
(/root/reference/src/quality_checks.py:77-133 value-ranges,
215-242 completeness) as public C4/Gopher-style web-text rules.
"""

from __future__ import annotations

import html as _htmllib
import math
import re
from collections import Counter

from ..config import (RULES, SCRUB_RULES, STOPWORD_PATTERN,  # noqa: F401
                      TOXICITY_WORDS)

# ---------------------------------------------------------------------------
# HTML → text extraction (deterministic, regex-based)
# ---------------------------------------------------------------------------

_RE_SCRIPT = re.compile(r"(?s)<(script|style)\b[^>]*>.*?</\1\s*>")
_RE_BLOCK = re.compile(r"(?i)</?(p|div|br|h[1-6]|li|tr|title)\b[^>]*>")
_RE_TAG = re.compile(r"(?s)<[^>]*>")
_RE_BLANK = re.compile(r"\n{2,}")
_RE_TRAILWS = re.compile(r"[ \t]+\n")
_RE_MULTISPACE = re.compile(r"[ \t]{2,}")


def extract_text(html_bytes: bytes | None) -> str:
    """Deterministic HTML→text. Byte-identical contract per url.

    Rules (fixed, documented, test-pinned):
      1. decode UTF-8 with errors='replace'
      2. drop <script>/<style> blocks
      3. block-level tags become newlines, all other tags vanish
      4. HTML entities unescaped
      5. collapse runs of spaces/tabs, trailing space before newline,
         3+ newlines → 2, strip outer whitespace
    """
    if html_bytes is None:
        return ""
    s = bytes(html_bytes).decode("utf-8", errors="replace")
    s = _RE_SCRIPT.sub("", s)
    s = _RE_BLOCK.sub("\n", s)
    s = _RE_TAG.sub("", s)
    s = _htmllib.unescape(s)
    s = _RE_TRAILWS.sub("\n", s)
    s = _RE_MULTISPACE.sub(" ", s)
    s = _RE_BLANK.sub("\n\n", s)
    return s.strip()


# ---------------------------------------------------------------------------
# Tokenization + native-signal mirrors
# ---------------------------------------------------------------------------
# These mirror the NATIVE Spark column expressions in pipeline.py; parity
# is asserted by tests. Keep ASCII-whitespace semantics (Java \s).

_RE_WS = re.compile(r"[ \t\n\x0b\f\r]+")
_RE_TOKEN = re.compile(r"[^ \t\n\x0b\f\r]+")
_RE_WS_CHAR = re.compile(r"[ \t\n\x0b\f\r]")
_RE_SYMBOL = re.compile(r"#|\.\.\.")
_RE_NONALNUM = re.compile(r"[^A-Za-z0-9 \t\n\x0b\f\r]")
_RE_STOP = re.compile(STOPWORD_PATTERN)


def tokenize(text: str) -> list[str]:
    t = text.strip()
    return _RE_WS.split(t) if t else []


def native_signals(text: str) -> dict:
    """Python mirror of the native Spark signal columns.

    Everything is a regex COUNT over the raw text — the Spark side is
    the same six regexp_count/extract_all expressions (pipeline.py),
    with no token-array materialization on either side.
    """
    n_words = len(_RE_TOKEN.findall(text))
    n_chars = len(text)
    tok_chars = n_chars - len(_RE_WS_CHAR.findall(text))
    mean_wl = (tok_chars / n_words) if n_words else 0.0
    n_sym = len(_RE_SYMBOL.findall(text))
    sym_ratio = (n_sym / n_words) if n_words else 0.0
    stop_hits = _RE_STOP.findall(text.lower())
    stop_frac = (len(stop_hits) / n_words) if n_words else 0.0
    distinct_stops = len(set(stop_hits))
    n_nonalnum = len(_RE_NONALNUM.findall(text))
    nonalnum_frac = (n_nonalnum / n_chars) if n_chars else 0.0
    return {
        "n_words": n_words,
        "n_chars": n_chars,
        "mean_word_len": mean_wl,
        "symbol_to_word": sym_ratio,
        "stopword_frac": stop_frac,
        "distinct_stopwords": distinct_stops,
        "nonalnum_frac": nonalnum_frac,
    }


# ---------------------------------------------------------------------------
# Repetition signals (Gopher-style) — pandas-UDF payload
# ---------------------------------------------------------------------------

def repetition_signals(text: str) -> tuple[float, float, float]:
    """(dup_line_frac, top2gram_frac, dup5gram_frac).

    - dup_line_frac: fraction of non-empty lines that are duplicates of an
      earlier line.
    - top2gram_frac: fraction of word-occupied chars covered by the most
      common word 2-gram.
    - dup5gram_frac: fraction of word-occupied chars inside word 5-grams
      that occur more than once (overlap-collapsed upper bound: sum of
      char lengths of duplicated 5-gram types ÷ total token chars).
    """
    lines = [ln for ln in text.split("\n") if ln.strip()]
    if lines:
        dup_line_frac = 1.0 - len(set(lines)) / len(lines)
    else:
        dup_line_frac = 0.0

    toks = tokenize(text)
    # map(len,…) and zip-of-shifted-lists stay in C — the genexpr /
    # per-i slicing forms cost ~2× in the UDF hot path (30% of the
    # fused kernel); values are identical
    total_chars = sum(map(len, toks))
    top2 = 0.0
    dup5 = 0.0
    if len(toks) >= 2 and total_chars:
        grams2 = Counter(zip(toks, toks[1:]))
        (g, cnt) = grams2.most_common(1)[0]
        top2 = cnt * (len(g[0]) + len(g[1])) / total_chars
    if len(toks) >= 5 and total_chars:
        grams5 = Counter(zip(toks, toks[1:], toks[2:], toks[3:], toks[4:]))
        dup_chars = sum(
            sum(map(len, g)) for g, c in grams5.items() if c > 1
        )
        dup5 = min(1.0, dup_chars / total_chars)
    return (dup_line_frac, top2, dup5)


# ---------------------------------------------------------------------------
# PII / toxicity scrub — byte-identical contract
# ---------------------------------------------------------------------------

_COMPILED_SCRUB: list[tuple[str, re.Pattern, str]] = [
    (rid, re.compile(pat), repl) for rid, pat, repl in SCRUB_RULES
]
_TOX_RE = re.compile(
    r"\b(" + "|".join(re.escape(w) for w in TOXICITY_WORDS) + r")\b"
)
# quick-reject alternation of every scrub pattern: most web docs have
# zero PII/toxicity hits, so ONE combined scan replaces five subn
# scans on the no-hit path. Exact: alternation branches match wherever
# the standalone pattern would (the rules hold no backreferences, and
# captured groups are irrelevant to search()); any hit falls through
# to the ordered chain, so output bytes and edit counts are untouched.
_ANY_SCRUB = re.compile("|".join(
    [f"(?:{pat})" for _rid, pat, _repl in SCRUB_RULES]
    + [_TOX_RE.pattern]))


def scrub(text: str) -> tuple[str, int]:
    """Apply the ordered scrub chain; return (scrubbed_text, edit_count)."""
    if _ANY_SCRUB.search(text) is None:
        return text, 0
    edits = 0
    for _rid, pat, repl in _COMPILED_SCRUB:
        text, n = pat.subn(repl, text)
        edits += n
    text, n = _TOX_RE.subn("<TOX>", text)
    edits += n
    return text, edits


def scrub_edit_breakdown(text: str) -> dict[str, int]:
    """Per-rule edit counts (for the metrics table)."""
    out: dict[str, int] = {}
    for rid, pat, repl in _COMPILED_SCRUB:
        text, n = pat.subn(repl, text)
        out[rid] = n
    text, n = _TOX_RE.subn("<TOX>", text)
    out["toxicity"] = n
    return out
