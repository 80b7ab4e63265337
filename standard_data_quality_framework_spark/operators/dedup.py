"""Deduplication operators for training-data pipelines.

Five families, all Catalyst-native (no UDFs), all with exact SQL
oracles via the md5-prefix hash (functions/hashing.py):

  exact        — content-hash groupBy, keep min-id               O(n)
  ngram-jaccard— shingle self-join, exact Jaccard on candidates   O(shared shingles)
  minhash-LSH  — k permutations → b bands → bucket join           O(n·k + collisions)
  simhash      — 60-bit sign fingerprint, hamming pairs           O(n) + banded pairing
  embedding    — cosine near-dup over array<float>                O(pairs in bucket)

Scale notes (10^12 docs): every family shuffles on a *hash* key —
uniform by construction, no skew. The Jaccard verify joins are
candidate-limited (LSH band buckets), never all-pairs. MinHash
signatures are one `groupBy(doc).agg(min per seed)` over the exploded
(shingle × seed) frame — map-side partial min keeps the shuffle tiny.
Recast of the reference's duplicate detection: exact-hash dedup
(uc1_image_quality_checks.py:589-659 md5-of-bytes), duplicate-row
ratio (quality_checks.py:245-275), O(k²)→O(k) fingerprinting
(uc3_timeseries_quality_checks.py:644-774).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import (MERSENNE31, hash60, minhash_coeffs)


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------

def word_shingles(df: DataFrame, id_col: str, text_col: str,
                  n: int = 5) -> DataFrame:
    """(id, shingle) — distinct word n-grams ('␠'-joined) per doc.

    Native: split → sliding window via transform over index sequence.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return (df
            .filter(F.size(toks) >= n)
            .select(F.col(id_col).alias("id"),
                    F.explode(F.array_distinct(grams)).alias("shingle")))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(df: DataFrame, id_col: str,
                     text_col: str) -> DataFrame:
    """(id, content_hash, is_dup, kept_id): min-id per content wins."""
    h = F.md5(F.col(text_col)).alias("content_hash")
    w = Window.partitionBy("content_hash")
    return (df.select(F.col(id_col).alias("id"), h)
            .withColumn("kept_id", F.min("id").over(w))
            .withColumn("is_dup", F.col("id") != F.col("kept_id")))


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        n: int = 5, threshold: float = 0.5) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs sharing ≥1 shingle and
    Jaccard ≥ threshold. Exact on candidates; candidate generation is
    the shingle self-join (LSH-bucket it at scale → minhash_lsh_pairs)."""
    sh = word_shingles(df, id_col, text_col, n)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col("a.id") < F.col("b.id")))
             .groupBy(F.col("a.id").alias("id_a"),
                      F.col("b.id").alias("id_b"))
             .agg(F.count("*").alias("n_inter")))
    sa = sizes.select(F.col("id").alias("id_a"),
                      F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"),
                      F.col("n_sh").alias("n_b"))
    return (inter.join(sa, "id_a").join(sb, "id_b")
            .select("id_a", "id_b",
                    (F.col("n_inter")
                     / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
                    .alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       n: int = 5, num_hashes: int = 16,
                       shingles: DataFrame | None = None) -> DataFrame:
    """(id, seed, minhash) — k permutation-min values per doc.

    One explode (shingle × seed) + one groupBy-min: partial aggregation
    handles the fan-out map-side, so the shuffle carries ≤ n·k rows.
    Pass ``shingles`` to reuse an already-built (id, shingle) frame.
    """
    coeffs = minhash_coeffs(num_hashes)
    sh = shingles if shingles is not None \
        else word_shingles(df, id_col, text_col, n)
    x = F.pmod(hash60(F.col("shingle")), F.lit(MERSENNE31))
    hashed = sh.select(
        "id",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("seed"),
                     F.pmod(F.lit(a) * x + F.lit(b),
                            F.lit(MERSENNE31)).alias("h"))
            for i, (a, b) in enumerate(coeffs)
        ])).alias("sh"))
    return (hashed.groupBy("id", F.col("sh.seed").alias("seed"))
            .agg(F.min("sh.h").alias("minhash")))


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      n: int = 5, num_hashes: int = 16, bands: int = 4,
                      threshold: float = 0.5) -> DataFrame:
    """Banded-LSH candidate pairs verified with exact Jaccard.

    bands × rows = num_hashes; docs agreeing on ALL rows of any band
    become candidates (join on the band-signature hash — uniform key,
    no skew), then exact shingle Jaccard filters false positives.
    """
    rows = num_hashes // bands
    # build the shingle frame ONCE and persist: signatures, sizes and
    # the candidate-verify join all read it (3× recompute otherwise)
    sh = word_shingles(df, id_col, text_col, n).persist()
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes,
                             shingles=sh)
    banded = (sig.withColumn("band", (F.col("seed") / rows).cast("int"))
              .groupBy("id", "band")
              .agg(F.md5(F.concat_ws(
                  ",", F.sort_array(F.collect_list(
                      F.concat_ws(":", F.col("seed"), F.col("minhash"))))))
                  .alias("band_sig")))
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.band_sig") == F.col("b.band_sig"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"))
            .distinct())
    # exact Jaccard on CANDIDATES ONLY — joining shingles through the
    # candidate pair list keeps the verify cost O(candidates · shingles
    # per doc); a global shingle self-join here would defeat the LSH.
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    sa = sh.select(F.col("id").alias("id_a"), "shingle")
    sb = sh.select(F.col("id").alias("_id_b"),
                   F.col("shingle").alias("_shingle_b"))
    inter = (cand.join(sa, "id_a")
             .join(sb, (F.col("id_b") == F.col("_id_b"))
                   & (F.col("shingle") == F.col("_shingle_b")))
             .groupBy("id_a", "id_b")
             .agg(F.count("*").alias("n_inter")))
    na = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (inter.join(na, "id_a").join(nb, "id_b")
            .select("id_a", "id_b",
                    (F.col("n_inter")
                     / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
                    .alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

# default 32 bits: the pair join buckets on fingerprint HALVES, and
# 2^8 buckets (16-bit fingerprints) collide massively on same-domain
# text (measured 698k candidate pairs on 5k docs); 2^16 buckets keep
# candidates near-linear. The oracle-checked entry query pins 16 bits
# (its SQL mirror enumerates bit positions).
N_SIMHASH_BITS = 32


def simhash(df: DataFrame, id_col: str, text_col: str,
            n_bits: int = N_SIMHASH_BITS) -> DataFrame:
    """(id, simhash) — sign fingerprint over term-frequency-weighted
    word hashes. Native: explode words → explode bit positions →
    conditional sum per bit → assemble. Shuffle key = id (uniform)."""
    toks = (df.select(F.col(id_col).alias("id"),
                      F.explode(F.split(F.trim(F.col(text_col)),
                                        r"\s+")).alias("w"))
            .filter(F.length("w") > 0)
            .groupBy("id", "w").agg(F.count("*").alias("tf"))
            .withColumn("h", hash60(F.col("w"))))
    bits = toks.select(
        "id",
        F.explode(F.array(*[
            F.struct(
                F.lit(j).alias("bit"),
                (F.col("tf") * F.when(
                    F.pmod(F.shiftright(F.col("h"), j),
                           F.lit(2)) == 1, 1).otherwise(-1)).alias("v"))
            for j in range(n_bits)
        ])).alias("bv"))
    per_bit = (bits.groupBy("id", F.col("bv.bit").alias("bit"))
               .agg(F.sum("bv.v").alias("s")))
    return (per_bit.groupBy("id")
            .agg(F.sum(F.when(F.col("s") > 0,
                              F.pow(F.lit(2.0), F.col("bit"))
                              .cast("long")).otherwise(0))
                 .alias("simhash")))


def simhash_pairs(df: DataFrame, id_col: str, text_col: str,
                  max_hamming: int = 2,
                  n_bits: int = N_SIMHASH_BITS) -> DataFrame:
    """(id_a, id_b, hamming) with hamming ≤ max_hamming.

    Pairing strategy: join on half-fingerprint bands (a pair within
    hamming ≤ 2 of 16 bits agrees on at least one 8-bit half) — the
    pigeonhole trick that avoids the all-pairs product at scale."""
    sig = simhash(df, id_col, text_col, n_bits)
    half = 2 ** (n_bits // 2)
    sig = (sig.withColumn("lo", F.pmod("simhash", F.lit(half)))
           .withColumn("hi", (F.col("simhash") / half).cast("long")))
    # an OR of two equi-conditions cannot hash-join (Spark would fall
    # back to a nested-loop cartesian): run one equi-join PER band and
    # union — each is a plain shuffle-hash join on a uniform key
    def _band_join(key: str):
        a = sig.alias("a")
        b = sig.alias("b")
        return (a.join(b, (F.col(f"a.{key}") == F.col(f"b.{key}"))
                       & (F.col("a.id") < F.col("b.id")))
                .select(F.col("a.id").alias("id_a"),
                        F.col("b.id").alias("id_b"),
                        F.col("a.simhash").alias("sh_a"),
                        F.col("b.simhash").alias("sh_b")))

    cand = _band_join("lo").unionByName(_band_join("hi")).distinct()
    xor = F.col("sh_a").bitwiseXOR(F.col("sh_b"))
    ham = F.aggregate(
        F.sequence(F.lit(0), F.lit(n_bits - 1)),
        F.lit(0),
        lambda acc, j: acc + F.pmod(
            (xor / F.pow(F.lit(2.0), j)).cast("long"), F.lit(2))
        .cast("int"),
    )
    return (cand.withColumn("hamming", ham)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_neardup_pairs(df: DataFrame, id_col: str, vec_col: str,
                            threshold: float = 0.95) -> DataFrame:
    """(id_a, id_b, cos_sim) for cosine ≥ threshold (rounded to 4 dp
    for cross-engine float stability). All-pairs here; at scale, bucket
    by sign-LSH first (similarity.lsh_buckets) and pair within bucket."""
    v = df.select(F.col(id_col).alias("id"),
                  F.col(vec_col).cast("array<double>").alias("v"))
    a = v.alias("a")
    b = v.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.col("a.v"), F.lit(0.0),
                            lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(F.col("b.v"), F.lit(0.0),
                            lambda acc, x: acc + x * x))
    return (a.join(b, F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"),
                    F.round(dot / (na * nb), 4).alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold))
