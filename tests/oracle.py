"""Pure-pandas reference labeler — the ground truth the Spark pipeline
is measured against (keep/drop F1 ≥ 0.99; byte-identical scrubbed text).

Implements the reference semantics (SDQF checks recast as per-document
web-text rules, SURVEY.md §0) in plain Python/pandas with NO Spark.
It shares the pure text primitives and model code with the pipeline
(textpure / models) — the SURVEY §7.4 mitigation for byte-identical
contracts — but re-implements all rule logic and aggregation
independently, so verdict/threshold/ordering bugs on either side show
up as parity failures.
"""

from __future__ import annotations

import pandas as pd

from standard_data_quality_framework_spark.config import RULES
from standard_data_quality_framework_spark.functions.textpure import (
    extract_text, native_signals, repetition_signals, scrub)
from standard_data_quality_framework_spark.models.langid import train_langid
from standard_data_quality_framework_spark.models.perplexity import (
    train_perplexity)

_LID = None
_LM = None


def _models():
    global _LID, _LM
    if _LID is None:
        _LID = train_langid()
        _LM = train_perplexity()
    return _LID, _LM


def label_pages(pages: pd.DataFrame) -> pd.DataFrame:
    """Produce the golden per-document verdict frame."""
    lid, lm = _models()
    R = RULES
    rows = []
    for r in pages.itertuples(index=False):
        etext = extract_text(r.html) if r.html is not None else (r.text or "")
        sig = native_signals(etext)
        lang_pred, lang_conf = lid.predict_one(etext)
        ppl = lm.perplexity(etext)
        dup_line, top2, dup5 = repetition_signals(etext)
        reasons: list[str] = []
        nw = sig["n_words"]
        if nw == 0:
            reasons.append("empty_text")
        if 0 < nw < R["min_words"]:
            reasons.append("min_words")
        if nw > R["max_words"]:
            reasons.append("max_words")
        if nw > 0 and not (R["min_mean_word_len"] <= sig["mean_word_len"]
                           <= R["max_mean_word_len"]):
            reasons.append("mean_word_len")
        if sig["symbol_to_word"] > R["max_symbol_to_word"]:
            reasons.append("symbol_to_word")
        if nw > 0 and (sig["stopword_frac"] < R["min_stopword_frac"]
                       or sig["distinct_stopwords"]
                       < R["min_distinct_stopwords"]):
            reasons.append("stopword_frac")
        if sig["nonalnum_frac"] > R["max_nonalnum_frac"]:
            reasons.append("nonalnum_frac")
        if dup_line > R["max_dup_line_frac"]:
            reasons.append("dup_line_frac")
        if top2 > R["max_top2gram_frac"]:
            reasons.append("top2gram_frac")
        if dup5 > R["max_dup5gram_frac"]:
            reasons.append("dup5gram_frac")
        if lang_conf < R["min_langid_conf"]:
            reasons.append("langid_conf")
        if r.lang is not None and lang_pred != r.lang:
            reasons.append("lang_mismatch")
        if ppl > R["max_perplexity"]:
            reasons.append("perplexity")
        scrubbed, edits = scrub(etext)
        rows.append({
            "url": r.url, "etext": etext, "lang_pred": lang_pred,
            "lang_conf": lang_conf, "perplexity": ppl,
            "n_words": nw, "mean_word_len": sig["mean_word_len"],
            "symbol_to_word": sig["symbol_to_word"],
            "stopword_frac": sig["stopword_frac"],
            "distinct_stopwords": sig["distinct_stopwords"],
            "nonalnum_frac": sig["nonalnum_frac"],
            "dup_line_frac": dup_line, "top2gram_frac": top2,
            "dup5gram_frac": dup5,
            "reasons": reasons, "scrubbed_text": scrubbed,
            "scrub_edits": edits,
        })
    out = pd.DataFrame(rows)
    # cross-document exact-dup, scoped to the crawl day: first
    # occurrence by url per (warc_date, etext) wins
    out["_day"] = pd.to_datetime(pages["warc_ts"].values, utc=True).date
    first_url = out.groupby(["_day", "etext"])["url"].transform("min")
    is_dup = out["url"] != first_url
    out = out.drop(columns=["_day"])
    out["drop_reasons"] = [
        rs + (["exact_dup"] if d else [])
        for rs, d in zip(out["reasons"], is_dup)
    ]
    out["keep"] = out["drop_reasons"].map(len) == 0
    return out.drop(columns=["reasons"])
