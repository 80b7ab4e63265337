"""Size-balanced output sharding — the writer-side step of a curation
pipeline.

A 100-TB training corpus is consumed as a directory of shard files
whose SIZES must be even (data-loader workers stream one shard each;
a 10× outlier shard straggles the whole epoch).  Spark's knobs don't
give this directly: ``repartition(n)`` balances ROW COUNTS (a shard of
long documents comes out huge), ``maxRecordsPerFile`` caps records not
bytes, and ``repartitionByRange`` on a size column would SORT BY SIZE
(all the big docs land together — the opposite of balance).

``size_balanced_shards`` assigns every row a shard id such that each
shard holds ~``target_bytes`` of payload, rows ordered by a salted
hash of the id (so every shard is an unbiased corpus sample — the
property loaders want), computed with a SEGMENTED PREFIX SCAN instead
of a global sort: exact cumulative sums, no single-partition window.

Write path: ``df.repartition(n_shards, "shard")`` (hash on the shard
id co-locates each shard in one task) then
``.write.partitionBy("shard")`` — or pass ``shard`` straight to an
Iceberg bucket transform.  The assignment operator is the testable
part; the write is stock Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import _BUCKETS, _bucket


def size_balanced_shards(df: DataFrame, id_col: str, bytes_col: str,
                         target_bytes: int, n_slices: int = 64,
                         salt: str = "shard") -> DataFrame:
    """Input plus a ``shard`` column: contiguous ~``target_bytes``
    runs over the (salted id-hash bucket, id) ordering.

    shard(row) = floor(cum_bytes_before(row) / target_bytes) — exact
    integer math (no float drift at any scale), every shard's payload
    in [target − max_doc, target + max_doc) bytes, shard ids dense
    from 0.

    Scale shape — an exact global running sum with NO global sort
    (the classic two-phase scan, same trick as
    ``crawlplan.politeness_schedule``): the hash-bucket space splits
    into ``n_slices`` CONTIGUOUS ranges, so slice order is a prefix of
    the total order; (1) within-slice running sums — window partitions
    are ~corpus/``n_slices``, a knob; (2) per-slice totals — one
    partial-agg'd ``n_slices``-row frame — prefix-summed in a single
    trivially small window; (3) before = slice offset + within-slice
    running sum − own bytes.  Two bounded shuffles; the bytes column
    is a long throughout, so sums are order-independent and
    oracle-exact.
    """
    width = -(-_BUCKETS // n_slices)  # ceil
    b = _bucket(F.col(id_col), salt)
    d = (df.withColumn("_b", b)
         .withColumn("_slice", F.floor(F.col("_b") / width)))
    w_in = (Window.partitionBy("_slice").orderBy("_b", id_col)
            .rowsBetween(Window.unboundedPreceding, 0))
    run = d.withColumn(
        "_run", F.sum(F.col(bytes_col).cast("long")).over(w_in))
    totals = d.groupBy("_slice").agg(
        F.sum(F.col(bytes_col).cast("long")).alias("_tot"))
    w_off = (Window.orderBy("_slice")
             .rowsBetween(Window.unboundedPreceding, -1))
    offs = totals.select(
        "_slice",
        F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias("_off"))
    out = (run.join(F.broadcast(offs), "_slice")
           .withColumn("_before",
                       F.col("_off") + F.col("_run")
                       - F.col(bytes_col).cast("long"))
           # integer `div`, not floor(double /): bit-exact at any
           # corpus size (a double quotient loses exactness past 2^53)
           .withColumn("shard",
                       F.expr(f"_before div {int(target_bytes)}")))
    return out.drop("_b", "_slice", "_run", "_off", "_before")


def shard_manifest(sharded: DataFrame, bytes_col: str) -> DataFrame:
    """(shard, n_docs, shard_bytes) — the manifest a loader reads to
    plan an epoch, and the balance check for ``size_balanced_shards``
    (max/min shard_bytes ratio → 1 as corpus/target grows).  One
    map-side-combined aggregation on the dense shard key."""
    return (sharded.groupBy("shard")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.col(bytes_col).cast("long"))
                 .alias("shard_bytes")))


def warc_offset_index(sharded: DataFrame, id_col: str, bytes_col: str,
                      shard_col: str = "shard",
                      salt: str = "shard") -> DataFrame:
    """Input (a ``size_balanced_shards`` output) plus ``offset`` — the
    byte position of every record inside its shard file, in the same
    (salted id-hash bucket, id) order the shard was assigned in.
    (shard, offset, length) is the CDX-style record index a web
    archive serves: a reader range-requests one record out of a
    multi-GB WARC/shard without scanning it, the standard access path
    for CommonCrawl-shaped corpora.

    Scale shape: ONE window partitioned by the shard id.  Partitions
    are bounded BY CONSTRUCTION — a shard holds ~target_bytes of
    payload (a knob), so unlike a per-host or per-content-hash window
    no input distribution can create a hot key; the running sum is
    integer-exact, so the oracle matches bit-for-bit.  ``salt`` must
    match the one the shards were assigned with, or the within-shard
    order (and therefore every offset) is undefined.
    """
    b = _bucket(F.col(id_col), salt)
    w = (Window.partitionBy(shard_col).orderBy(b, id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    return sharded.withColumn(
        "offset",
        F.coalesce(F.sum(F.col(bytes_col).cast("long")).over(w),
                   F.lit(0).cast("long")))


def sequence_packing(df: DataFrame, id_col: str, tokens_col: str,
                     context_len: int, n_slices: int = 64,
                     salt: str = "pack") -> DataFrame:
    """Input plus (start_token, seq_idx, offset_in_seq, n_seqs_spanned)
    — the GPT-style pack-and-chunk plan: documents are concatenated in
    salted-hash order and the token stream is cut every
    ``context_len`` tokens, so every document knows which training
    sequence(s) it lands in and at what offset.  The deterministic
    hash order makes each sequence an unbiased document mix (no
    same-source runs) and the plan reproducible across runs and
    engines — the loader can materialize any sequence independently.

    seq_idx = start_token div context_len; offset_in_seq = start_token
    mod context_len; n_seqs_spanned counts the boundary crossings
    (a doc longer than its sequence remainder continues into the next
    sequence(s), standard causal-LM packing with cross-doc attention
    masking left to the loader).

    Scale shape: identical to ``size_balanced_shards`` — an exact
    global running sum of token counts via the segmented prefix scan
    (bounded per-slice windows + one ``n_slices``-row offset window),
    all integer math.
    """
    width = -(-_BUCKETS // n_slices)  # ceil
    b = _bucket(F.col(id_col), salt)
    d = (df.withColumn("_b", b)
         .withColumn("_slice", F.floor(F.col("_b") / width)))
    w_in = (Window.partitionBy("_slice").orderBy("_b", id_col)
            .rowsBetween(Window.unboundedPreceding, 0))
    run = d.withColumn(
        "_run", F.sum(F.col(tokens_col).cast("long")).over(w_in))
    totals = d.groupBy("_slice").agg(
        F.sum(F.col(tokens_col).cast("long")).alias("_tot"))
    w_off = (Window.orderBy("_slice")
             .rowsBetween(Window.unboundedPreceding, -1))
    offs = totals.select(
        "_slice",
        F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias("_off"))
    L = int(context_len)
    out = (run.join(F.broadcast(offs), "_slice")
           .withColumn("start_token",
                       F.col("_off") + F.col("_run")
                       - F.col(tokens_col).cast("long"))
           .withColumn("seq_idx", F.expr(f"start_token div {L}"))
           .withColumn("offset_in_seq",
                       F.pmod(F.col("start_token"), F.lit(L)))
           # last token of the doc sits at start+n-1; empty docs span 1
           .withColumn(
               "n_seqs_spanned",
               F.expr(f"(start_token + greatest({tokens_col}, 1) - 1) "
                      f"div {L}") - F.col("seq_idx") + 1))
    return out.drop("_b", "_slice", "_run", "_off")
