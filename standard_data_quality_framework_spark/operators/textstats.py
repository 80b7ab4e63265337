"""Text-analysis operators: token counting, quality scoring,
heuristic language ID, document fingerprinting.

All native column expressions (oracle-SQL-checkable); the model-based
langid lives in models/langid.py and runs inside the pipeline UDF —
this module is the cheap, pure-SQL tier a 100 TB pre-pass would use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import STOPWORDS
from ..fanout import fan_out
from ..functions.hashing import hash60


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, n_chars, avg_token_len, n_bpe_ish) per doc.

    n_bpe_ish: BPE-like subword count estimated with the classic
    pre-tokenizer regex (letter runs / digit runs / single symbols).
    """
    df = fan_out(df)
    t = F.col(text_col)
    trimmed = F.trim(t)
    n_tokens = F.when(F.length(trimmed) == 0, 0).otherwise(
        F.size(F.split(trimmed, r"\s+")))
    tok_chars = F.length(F.regexp_replace(t, r"\s+", ""))
    return df.select(
        F.col(id_col).alias("id"),
        n_tokens.alias("n_tokens"),
        F.length(t).alias("n_chars"),
        F.round(F.when(n_tokens > 0, tok_chars / n_tokens)
                .otherwise(F.lit(0.0)), 6).alias("avg_token_len"),
        F.regexp_count(t, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
        .alias("n_bpe_ish"),
    )


def quality_scores(df: DataFrame, id_col: str, text_col: str,
                   keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """(id, *keep_cols, len_score, punct_ratio, stop_frac, quality) —
    composite heuristic quality score in [0,1] (C4-ish). ``keep_cols``
    ride along in the same projection so downstream consumers (e.g.
    quality_stratified_sample) never need a join back to the source."""
    df = fan_out(df)
    t = F.col(text_col)
    trimmed = F.trim(t)
    n_tokens = F.when(F.length(trimmed) == 0, 0).otherwise(
        F.size(F.split(trimmed, r"\s+")))
    len_score = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    punct = F.when(F.length(t) > 0,
                   F.regexp_count(t, F.lit(r"[^A-Za-z0-9\s]"))
                   / F.length(t)).otherwise(F.lit(0.0))
    stops = [w for ws in STOPWORDS.values() for w in ws]
    stop_hits = F.size(F.filter(
        F.when(F.length(trimmed) == 0,
               F.array().cast("array<string>"))
        .otherwise(F.transform(F.split(trimmed, r"\s+"),
                               lambda x: F.lower(x))),
        lambda x: x.isin(*sorted(set(stops)))))
    stop_frac = F.when(n_tokens > 0, stop_hits / n_tokens) \
                 .otherwise(F.lit(0.0))
    quality = (F.lit(0.4) * len_score
               + F.lit(0.3) * F.least(stop_frac * 4, F.lit(1.0))
               + F.lit(0.3) * (F.lit(1.0) - F.least(punct * 5, F.lit(1.0))))
    return df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in keep_cols],
        F.round(len_score, 6).alias("len_score"),
        F.round(punct, 6).alias("punct_ratio"),
        F.round(stop_frac, 6).alias("stop_frac"),
        F.round(quality, 6).alias("quality"),
    )


def langid_heuristic(df: DataFrame, id_col: str, text_col: str,
                     claimed_col: str | None = None) -> DataFrame:
    """(id, lang_pred [, lang_match]) — stop-word-marker voting.

    Counts per-language stop-word hits; argmax with a fixed language-
    order tie-break. The cheap SQL-only tier; the real classifier is
    models/langid.py."""
    df = fan_out(df)
    trimmed = F.trim(F.col(text_col))
    toks = F.when(F.length(trimmed) == 0, F.array().cast("array<string>")) \
            .otherwise(F.transform(F.split(trimmed, r"\s+"),
                                   lambda x: F.lower(x)))
    df2 = df.select(F.col(id_col).alias("id"),
                    *([F.col(claimed_col).alias("lang_claim")]
                      if claimed_col else []),
                    toks.alias("_toks"))
    votes = [
        F.size(F.filter(F.col("_toks"),
                        lambda x: x.isin(*STOPWORDS[lang]))).alias(
            f"v_{lang}")
        for lang in sorted(STOPWORDS)
    ]
    df2 = df2.select("id",
                     *([F.col("lang_claim")] if claimed_col else []),
                     *votes)
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"v_{lg}") for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):  # earlier lang wins ties
        pred = F.when(F.col(f"v_{lg}") == best, F.lit(lg)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    out = df2.withColumn("lang_pred", pred)
    if claimed_col:
        out = out.withColumn("lang_match",
                             F.col("lang_pred") == F.col("lang_claim"))
    return out.drop(*[f"v_{lg}" for lg in langs])


def doc_fingerprint(df: DataFrame, id_col: str, text_col: str,
                    n: int = 5) -> DataFrame:
    """(id, fingerprint) — min 60-bit hash over word n-gram shingles
    (winnowing-lite): equal fingerprints ⇒ shared rare shingle, a
    cheap near-dup pre-cluster key. Docs shorter than n words hash
    the whole text."""
    df = fan_out(df)
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.array_min(F.transform(grams, lambda g: hash60(g)))
        .alias("fingerprint"),
    )


def winnowing_fingerprints(df: DataFrame, id_col: str, text_col: str,
                           k: int = 8, w: int = 4) -> DataFrame:
    """(id, fp) — winnowing document fingerprints (MOSS-style local
    sampling of char-k-gram hashes; Schleimer/Wilkerson/Aiken,
    SIGMOD'03): hash every k-char gram, slide a w-gram window, keep
    the MINIMUM hash of each window, emit the distinct kept hashes.

    Guarantee: any shared substring of length ≥ k + w − 1 between two
    docs contributes at least one IDENTICAL fingerprint to both — an
    equi-joinable key for plagiarism/quotation-grade overlap detection,
    denser than minhash (which samples globally) but position-robust
    unlike the single doc_fingerprint hash.

    Shape (row-local after one adaptive fan-out; the fan_out exchange
    only fires when the scan under-splits — see fanout.py, and the
    plan audit allows exactly that one Exchange): the k-gram hash
    array is
    computed ONCE per row behind a projection boundary (the alias is
    non-cheap and referenced w times, so CollapseProject keeps the
    boundary instead of inlining w copies), then the sliding minimum
    over the w-window is the element-wise ``least`` of w SHIFTED
    ``slice``s of that array — row-local, then ``array_distinct`` +
    ``explode``. The round-1 design posexploded one row per CHARACTER
    through an Exchange into a window function (a multi-PB shuffle at
    100 TB of text); this computes the identical fingerprint set with
    no Exchange at all. Deliberately NOT a nested per-window
    array-lambda either: higher-order functions are CodegenFallback
    with no common-subexpression elimination, so `slice(khashes, s,
    w)` inside a second transform re-evaluates the whole k-gram hash
    array per window — O(len²) per doc (observed as a wedged single
    task on 10 KB docs). The w-way zip_with tree evaluates each slice
    child exactly once.
    Recast of the reference's content-hash duplicate intent
    (uc1_image_quality_checks.py:589-659) for partial overlap.
    """
    df = fan_out(df)
    t = F.col(text_col)
    n_grams = F.length(t) - (k - 1)
    khashes = (F.when(n_grams >= w, F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: hash60(t.substr(i, F.lit(k)))))
        .otherwise(F.array().cast("array<long>")))
    kh = df.select(F.col(id_col).alias("id"), khashes.alias("_kh"))

    n_windows = F.size("_kh") - (w - 1)
    shifted = [F.slice("_kh", j + 1, n_windows) for j in range(w)]
    wmin = shifted[0]
    for s in shifted[1:]:
        wmin = F.zip_with(wmin, s, lambda a, b: F.least(a, b))
    # the when() guard (not just upstream emptiness) matters: slice
    # with a non-positive length throws, and the optimizer may evaluate
    # this projection on rows the khashes guard zeroed out
    fps = (F.when(F.size("_kh") >= w, F.array_distinct(wmin))
           .otherwise(F.array().cast("array<long>")))
    # explode_OUTER, then drop the null rows above the Generate: a
    # plain explode lets InferFiltersFromGenerate push a
    # `size(_fps) > 0` filter below both projections, inlining ~10
    # copies of the md5 k-gram transform into one interpreted filter
    # condition (measured 12× slower); outer + isNotNull keeps the
    # filter on the generated column, above the boundary
    return (kh.select("id", fps.alias("_fps"))
            .select("id", F.explode_outer("_fps").alias("fp"))
            .filter(F.col("fp").isNotNull()))


def _word_gram_hashes(df: DataFrame, id_col: str, text_col: str,
                      n: int) -> DataFrame:
    """(id, grams: array<long>) — DISTINCT 60-bit hashes of the doc's
    word n-grams (space-joined). Row-local; the token array is
    materialized behind a projection boundary (size() + transform =
    two non-cheap references, so CollapseProject keeps the boundary —
    same trick as winnowing_fingerprints) so the split never
    re-evaluates per gram."""
    t = fan_out(df).select(
        F.col(id_col).alias("id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_toks"))
    n_grams = F.size("_toks") - (n - 1)
    # when() guard INSIDE the projection: sequence(1, k) with k <= 0
    # generates a DESCENDING sequence, not an empty one
    grams = (F.when(n_grams > 0, F.array_distinct(F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: hash60(F.concat_ws(" ", F.slice(F.col("_toks"), i, n))))))
        .otherwise(F.array().cast("array<long>")))
    return t.select("id", grams.alias("grams"))


def decontaminate(train: DataFrame, evals: DataFrame, id_col: str,
                  text_col: str, n: int = 13,
                  eval_id_col: str | None = None,
                  eval_text_col: str | None = None) -> DataFrame:
    """(id, n_grams, n_contaminated, contaminated_frac, contaminated)
    — benchmark-decontamination flagging, GPT-3/Pile-style: a training
    document is contaminated if it shares at least one word n-gram
    (n=13 in the GPT-3 appendix) with any document of the evaluation
    set.

    Scale shape: the EVAL side is small by definition (a benchmark);
    its distinct gram hashes are BROADCAST and the train side probes
    them with one broadcast hash join over its exploded gram rows —
    the hash relation is built once per task, not once per row. (The
    r5 shape kept the eval set as ONE collected array and ran a
    row-local ``array_intersect`` per train doc; ArrayIntersect
    rebuilds its lookup set from the eval array on EVERY row, so the
    operator was O(|train| · |eval grams|) — measured quadratic,
    1.9 s at sf0.1 → 200 s at sf1.0. The join probe is O(|train
    grams|) total and re-aggregates per doc with a map-side-combined
    count on the id key — the one narrow shuffle, one row per train
    doc.) Recasts the reference's cross-dataset membership checks
    (app.py:899-907 set-intersection coverage) onto the train/eval
    leakage axis.
    """
    eval_grams = (
        _word_gram_hashes(evals, eval_id_col or id_col,
                          eval_text_col or text_col, n)
        .select(F.explode_outer("grams").alias("_eg"))
        .filter(F.col("_eg").isNotNull())
        .distinct()
        .withColumn("_hit", F.lit(1)))
    g = _word_gram_hashes(train, id_col, text_col, n)
    # grams are already distinct per doc, so post-explode counts equal
    # the set sizes; explode_OUTER keeps zero-gram docs (count("_g")=0)
    ex = g.select("id", F.explode_outer("grams").alias("_g"))
    joined = ex.join(F.broadcast(eval_grams),
                     ex["_g"] == eval_grams["_eg"], "left")
    n_grams = F.count("_g").cast("int")
    overlap = F.count("_hit").cast("int")
    return (joined.groupBy("id")
            .agg(n_grams.alias("n_grams"),
                 overlap.alias("n_contaminated"),
                 F.when(n_grams > 0,
                        F.round(overlap / n_grams, 6))
                 .otherwise(F.lit(0.0)).alias("contaminated_frac"),
                 (overlap > 0).alias("contaminated")))


def vocab_stats(df: DataFrame, id_col: str, text_col: str,
                top_n: int = 100) -> DataFrame:
    """(token, tf, df) — corpus vocabulary statistics: total term
    frequency and document frequency for the ``top_n`` most frequent
    whitespace tokens.  The first step of tokenizer training / corpus
    profiling (Zipf-curve inspection, stop-list derivation, df-cap
    tuning for the shingle dedups).

    Scale shape: explode + groupBy(token) — the mega-token skew ("the"
    appears in every doc) is absorbed by map-side partial aggregation
    (count and the (token, id)-keyed partial distinct both combine
    before the shuffle), and the final top-N plans as
    TakeOrderedAndProject, never a full sort of the vocabulary.
    Tie-break (tf desc, token asc) makes the cut deterministic.
    """
    df = fan_out(df)
    toks = (df.select(F.col(id_col).alias("id"),
                      F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                                        "\\s+")).alias("token"))
            .where(F.length("token") > 0))
    agg = toks.groupBy("token").agg(
        F.count("*").alias("tf"),
        F.countDistinct("id").alias("df"))
    return agg.orderBy(F.desc("tf"), F.asc("token")).limit(top_n)
