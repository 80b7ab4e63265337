"""Checkpoint-resumable job runner.

One "run" = quality-filter the pages table into the warehouse:

  tables written:
    pages_filtered   (partitioned by warc_date)            — dynamic overwrite
    metrics          (partitioned by stage × partition_key) — dynamic overwrite
    dropped_by_rule  (partitioned by stage × partition_key) — dynamic overwrite
    lineage          (append, one row per warc_date; commit LAST)

Resume contract: lineage is committed only after the data/metrics
writes for the covered partitions succeed, and EVERY data/metrics
write is an idempotent per-partition overwrite — a replayed partition
replaces its own previous rows instead of appending next to them, so
a crash after the metrics write but before the lineage commit cannot
double-count. On restart we anti-join the input's warc_dates against
completed lineage rows for this stage and re-process only the
remainder. (Duplicate 'done' lineage rows from a crash mid-append are
harmless: pending_dates reads the distinct partition_key set.)
"""

from __future__ import annotations

import hashlib
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .metrics import dimension_metrics, dropped_by_rule, lineage_rows
from .pipeline import run_quality_filter, with_partition_cols
from .sources.catalog import ParquetCatalog

STAGE = "quality_filter"
GLOBAL_DEDUP_STAGE = "global_dedup"


def pending_dates(catalog: ParquetCatalog, pages: DataFrame) -> DataFrame:
    """Distinct input warc_dates minus already-completed lineage rows."""
    all_dates = (with_partition_cols(pages.select("warc_ts", "url"))
                 .select("warc_date").distinct())
    if not catalog.exists("lineage"):
        return all_dates
    done = (catalog.read("lineage")
            .filter((F.col("stage") == STAGE)
                    & (F.col("status") == "done"))
            .select(F.col("partition_key").cast("date").alias("warc_date"))
            .distinct())
    return all_dates.join(done, "warc_date", "left_anti")


def run(spark: SparkSession, pages: DataFrame, warehouse: str,
        run_id: str | None = None) -> dict:
    """Execute (or resume) the quality-filter run. Returns summary."""
    run_id = run_id or uuid.uuid4().hex[:12]
    catalog = ParquetCatalog(spark, warehouse)

    # scored schema-presence check against the use-case contract
    # (config.EXPECTED_PAGE_COLUMNS) — plan-time, no data pass
    from .config import EXPECTED_PAGE_COLUMNS
    from .operators.quality import expected_columns_presence
    schema_row = expected_columns_presence(
        pages, EXPECTED_PAGE_COLUMNS).first()
    if schema_row.score < 1.0:
        raise ValueError(
            f"input is missing expected columns: {schema_row.missing_cols} "
            f"(schema presence {schema_row.score})")

    todo = pending_dates(catalog, pages)
    n_dates = todo.count()
    if n_dates == 0:
        return {"run_id": run_id, "dates_processed": 0, "resumed": True,
                "schema_presence": float(schema_row.score)}

    # restrict input to pending partitions (broadcast the small date set
    # — partition pruning at the scan on a real Iceberg table)
    pages_todo = (with_partition_cols(pages)
                  .join(F.broadcast(todo), "warc_date", "left_semi")
                  .drop("warc_date", "url_bucket"))

    out = run_quality_filter(spark, pages_todo)
    # cheap run-level counters ride along with the first action via
    # observe() (A19 summary-stats pattern — no extra pass)
    from pyspark.sql import Observation
    obs = Observation(f"qf_{run_id}")
    observed = out.verdicts.observe(
        obs,
        F.count(F.lit(1)).alias("docs_scanned"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("docs_kept"),
        F.sum(F.col("scrub_edits").cast("long")).alias("scrub_edits"))
    # one materialization of the verdict frame feeds all four sinks
    verdicts = observed.persist()
    try:
        kept = (verdicts.filter(F.col("keep"))
                .select("url", "warc_ts",
                        F.col("scrubbed_text").alias("text"),
                        F.col("lang_pred").alias("lang"),
                        "warc_date", "url_bucket"))
        catalog.overwrite_partitions(kept, "pages_filtered", ["warc_date"])

        # per-partition overwrite (NOT append): a replay of a partition
        # whose lineage never committed replaces its own rows — resume
        # cannot double-count metrics
        mets = dimension_metrics(verdicts).withColumn(
            "run_id", F.lit(run_id)).withColumn("stage", F.lit(STAGE))
        catalog.overwrite_partitions(mets, "metrics",
                                     ["stage", "partition_key"])

        dbr = dropped_by_rule(verdicts).withColumn(
            "run_id", F.lit(run_id)).withColumn("stage", F.lit(STAGE))
        catalog.overwrite_partitions(dbr, "dropped_by_rule",
                                     ["stage", "partition_key"])

        # lineage commit LAST — the resume barrier
        lin = lineage_rows(verdicts, run_id, STAGE)
        catalog.append(lin, "lineage")

        n_in = verdicts.count()
        n_kept = kept.count()
        counters = dict(obs.get)
    finally:
        verdicts.unpersist()
    return {"run_id": run_id, "dates_processed": n_dates,
            "rows_in": n_in, "rows_kept": n_kept, "resumed": False,
            "observed": counters,
            "schema_presence": float(schema_row.score)}


def _neardup_edges(docs: DataFrame, n: int, num_hashes: int, bands: int,
                   threshold: float, max_bucket_size: int | None) -> DataFrame:
    """(id_a, id_b) near-dup edges = MinHash-LSH verified pairs ∪
    exact-duplicate star edges.

    The exact-hash union is the hot-bucket cap's other half: the cap
    drops band buckets above ``max_bucket_size`` from LSH candidate
    generation (a 10^5-doc template cluster would alone emit ~5·10^9
    candidate pairs), and the exact path guarantees byte-identical
    template docs still cluster — B identical docs cost B−1 star
    edges through a uniform-key window, never B²/2 pairs."""
    from .operators.dedup import exact_duplicates, minhash_lsh_pairs
    lsh = (minhash_lsh_pairs(docs, "id", "text", n=n,
                             num_hashes=num_hashes, bands=bands,
                             threshold=threshold,
                             max_bucket_size=max_bucket_size)
           .select("id_a", "id_b"))
    exact = (exact_duplicates(docs, "id", "text")
             .filter(F.col("is_dup"))
             .select(F.col("kept_id").alias("id_a"),
                     F.col("id").alias("id_b")))
    return lsh.unionByName(exact).distinct()


def _labels_for(all_ids: DataFrame, edges: DataFrame) -> DataFrame:
    """(id, label) for EVERY id in all_ids: connected components run
    over edge-incident nodes only (the duplicate subgraph — small),
    singletons keep label = id via the left join. At 10^12 docs this
    bounds the iterative CC frame to the dup subgraph instead of the
    whole corpus."""
    from .operators.dedup import connected_components
    incident = (edges.select(F.col("id_a").alias("id"))
                .unionByName(edges.select(F.col("id_b").alias("id")))
                .distinct())
    labels = connected_components(incident, edges)
    # NOTE: labels is localCheckpoint'ed (RDD-level persistence);
    # Dataset.unpersist would be a no-op. The checkpoint blocks are
    # reclaimed by the ContextCleaner once the frame is unreferenced
    # after the dup_clusters write.
    return (all_ids.join(labels, "id", "left")
            .select("id", F.coalesce("label", "id").alias("label")))


def run_global_dedup(spark: SparkSession, warehouse: str,
                     run_id: str | None = None, n: int = 5,
                     num_hashes: int = 16, bands: int = 4,
                     threshold: float = 0.85,
                     max_bucket_size: int | None = 500,
                     incremental: bool = True,
                     delta_member_sample: int = 0,
                     full_rebuild_every: int | None = None) -> dict:
    """Cross-day near-duplicate clustering over the whole
    ``pages_filtered`` warehouse table → ``dup_clusters``.

    The in-pipeline exact-dup window is deliberately scoped to one
    crawl day (pipeline.py with_verdict); this job supplies the
    reference's DATASET-GLOBAL duplicate semantics
    (/root/reference/src/quality_checks.py:245-275,
    uc1_image_quality_checks.py:589-659) across all days at once:
    MinHash-LSH + exact-hash edges on the kept text, verified Jaccard
    ≥ threshold, then connected components → one cluster id (the min
    url) per near-dup group.

    Incremental (delta) mode — the 10^12-doc continuous-ingest path:
    when the existing ``dup_clusters`` covers a strict subset of the
    current day set (confirmed by its own done lineage row), only the
    NEW days' docs are paired — against themselves and against one
    representative (the canonical url) of every prior cluster — and
    the new edges are merged with the prior clusters' star edges
    (member → canonical) before a CC pass over the affected subgraph.
    Per ingested day that is O(new ∪ canonicals) LSH work instead of
    O(all history). This is an APPROXIMATION of a from-scratch run
    (reported as mode='delta-approx'): a new doc within threshold of
    a prior NON-canonical member but not of that cluster's canonical
    is missed, and two prior clusters merge only if a new doc (or
    their canonicals) links them — near-dup similarity is not
    transitive, so labels CAN diverge from a full rebuild. For
    near-clique LSH clusters (threshold ≥ 0.85) the canonical is
    usually an ε-cover of its cluster and the labels coincide (the
    warehouse tests exercise that benign case), but it is a
    heuristic, not a guarantee. Two knobs bound the drift:
    ``delta_member_sample=k`` also pairs new docs against up to k
    deterministically-sampled non-canonical members per prior
    cluster; ``full_rebuild_every=m`` forces a full rebuild after m
    consecutive delta ingests (chain depth is tracked in the tiny
    ``dedup_state`` table).

    Resume contract: the unit of work is the SNAPSHOT — the sorted set
    of warc_dates present in pages_filtered, fingerprinted into
    ``partition_key``. A lineage row (stage=global_dedup, that key,
    done) means dup_clusters is already current for exactly this day
    set; re-running is a no-op, and adding a day changes the key so
    the job re-runs (full or delta). The dup_clusters write is a full
    idempotent overwrite — any new day can merge old clusters and move
    canonicals, so per-partition carry-over would be wrong; the
    rewrite is one linear pass, the saved work is the quadratic part.

    Output table dup_clusters: (url, warc_date, cluster_id,
    is_canonical, cluster_size). ``clusters`` in the summary counts
    DISTINCT cluster ids (a canonical url kept on multiple days is
    one cluster, not one per day).
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    catalog = ParquetCatalog(spark, warehouse)
    pages = catalog.read("pages_filtered")

    # day set = the snapshot identity; one tiny row per day (partition
    # listing on a real Iceberg table), not a data collect
    days = sorted(str(r[0]) for r in
                  pages.select("warc_date").distinct().collect())
    snap = hashlib.md5(",".join(days).encode()).hexdigest()[:16]

    def _lineage_done(key: str) -> bool:
        if not catalog.exists("lineage"):
            return False
        return (catalog.read("lineage")
                .filter((F.col("stage") == GLOBAL_DEDUP_STAGE)
                        & (F.col("status") == "done")
                        & (F.col("partition_key") == key))
                .count()) > 0

    if _lineage_done(snap):
        return {"run_id": run_id, "snapshot": snap, "resumed": True}

    docs = pages.select(F.col("url").alias("id"), "text", "warc_date")
    all_ids = docs.select("id").distinct()

    # delta eligibility: dup_clusters holds a committed strict-subset
    # snapshot of the current day set, and the delta chain is shorter
    # than full_rebuild_every (drift bound)
    mode = "full"
    prior = None
    prior_depth = 0
    st = None
    if catalog.exists("dedup_state"):
        st = catalog.read("dedup_state").first()
    if incremental and catalog.exists("dup_clusters"):
        prior = catalog.read("dup_clusters")
        prior_days = sorted(str(r[0]) for r in
                            prior.select("warc_date").distinct().collect())
        prior_snap = hashlib.md5(
            ",".join(prior_days).encode()).hexdigest()[:16]
        # honor chain_depth only when the state row was written FOR the
        # snapshot dup_clusters currently represents (ADVICE r4): a
        # stale marker — dup_clusters wiped/rebuilt out-of-band, or
        # state left by an aborted sequence — would force or defer full
        # rebuilds at the wrong cadence. Mismatch ⇒ treat depth as 0.
        if st is not None and str(st.snapshot) == prior_snap:
            prior_depth = int(st.chain_depth)
        if (prior_days and set(prior_days) < set(days)
                and _lineage_done(prior_snap)
                and (full_rebuild_every is None
                     or prior_depth + 1 < full_rebuild_every)):
            mode = "delta"
            new_days = sorted(set(days) - set(prior_days))

    if mode == "delta":
        canon_ids = (prior.filter(F.col("is_canonical"))
                     .select(F.col("url").alias("id")).distinct())
        pair_ids = canon_ids
        if delta_member_sample > 0:
            # bounded sample of NON-canonical members per prior cluster
            # (deterministic: best k by url hash) — narrows the
            # "similar to a member but not the canonical" miss window
            # at O(k · clusters) extra LSH work
            from pyspark.sql import Window
            wm = (Window.partitionBy("cluster_id")
                  .orderBy(F.xxhash64("url"), "url"))
            member_ids = (prior.filter(~F.col("is_canonical"))
                          .select("url", "cluster_id").distinct()
                          .withColumn("_rk", F.row_number().over(wm))
                          .filter(F.col("_rk") <= delta_member_sample)
                          .select(F.col("url").alias("id")))
            pair_ids = canon_ids.unionByName(member_ids).distinct()
        pool = (docs.filter(F.col("warc_date").cast("string")
                            .isin(new_days))
                .select("id", "text")
                .unionByName(docs.select("id", "text")
                             .join(pair_ids, "id", "left_semi"))
                .dropDuplicates(["id", "text"]))
        lsh_docs = pool.count()
        new_edges = _neardup_edges(pool, n, num_hashes, bands,
                                   threshold, max_bucket_size)
        prior_star = (prior.filter(F.col("url") != F.col("cluster_id"))
                      .select(F.col("cluster_id").alias("id_a"),
                              F.col("url").alias("id_b"))
                      .distinct())
        edges = new_edges.unionByName(prior_star).distinct()
    else:
        lsh_docs = all_ids.count()
        edges = _neardup_edges(docs, n, num_hashes, bands,
                               threshold, max_bucket_size)

    labels = _labels_for(all_ids, edges)
    csize = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    clusters = (docs.select("id", "warc_date")
                .join(labels, "id")
                .join(csize, "label")
                .select(F.col("id").alias("url"), "warc_date",
                        F.col("label").alias("cluster_id"),
                        (F.col("id") == F.col("label"))
                        .alias("is_canonical"),
                        "cluster_size"))
    # full overwrite, THEN the lineage commit — same barrier as run().
    # dup_clusters is also the delta baseline for the NEXT ingest, so
    # stage through a temp dir: overwriting the parquet dir we are
    # reading (delta mode) would corrupt the self-read.
    # no leading underscore — Spark treats _-prefixed paths as hidden
    tmp = catalog.path(f"dup_clusters.stage.{run_id}")
    clusters.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite") \
        .parquet(catalog.path("dup_clusters"))
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)

    out = catalog.read("dup_clusters")
    n_rows = out.count()
    n_clusters = out.select("cluster_id").distinct().count()
    lin = spark.createDataFrame(
        [(run_id, GLOBAL_DEDUP_STAGE, snap, "done", n_rows, n_clusters)],
        "run_id string, stage string, partition_key string, "
        "status string, rows_in long, rows_out long") \
        .withColumn("finished_ts", F.current_timestamp())
    catalog.append(lin, "lineage")
    # delta-chain depth marker for full_rebuild_every (one tiny row)
    depth = 0 if mode == "full" else prior_depth + 1
    spark.createDataFrame(
        [(snap, mode, depth, run_id)],
        "snapshot string, mode string, chain_depth int, run_id string") \
        .write.mode("overwrite").parquet(catalog.path("dedup_state"))
    return {"run_id": run_id, "snapshot": snap, "resumed": False,
            # 'delta-approx', not 'delta': labels can diverge from a
            # from-scratch rebuild (see docstring)
            "mode": "delta-approx" if mode == "delta" else mode,
            "delta_depth": depth, "lsh_docs": lsh_docs,
            "rows": n_rows, "clusters": n_clusters,
            "dup_rows": n_rows - out.filter("is_canonical").count()}
