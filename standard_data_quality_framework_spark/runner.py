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


def run_global_dedup(spark: SparkSession, warehouse: str,
                     run_id: str | None = None, n: int = 5,
                     num_hashes: int = 16, bands: int = 4,
                     threshold: float = 0.85) -> dict:
    """Cross-day near-duplicate clustering over the whole
    ``pages_filtered`` warehouse table → ``dup_clusters``.

    The in-pipeline exact-dup window is deliberately scoped to one
    crawl day (pipeline.py with_verdict); this job supplies the
    reference's DATASET-GLOBAL duplicate semantics
    (/root/reference/src/quality_checks.py:245-275,
    uc1_image_quality_checks.py:589-659) across all days at once:
    MinHash-LSH candidate pairs on the kept text, verified Jaccard ≥
    threshold, then connected components → one cluster id (the min
    url) per near-dup group.

    Resume contract: the unit of work is the SNAPSHOT — the sorted set
    of warc_dates present in pages_filtered, fingerprinted into
    ``partition_key``. A lineage row (stage=global_dedup, that key,
    done) means dup_clusters is already current for exactly this day
    set; re-running is a no-op, and adding a day changes the key so
    the job re-runs. The dup_clusters write is a full idempotent
    overwrite (clusters are global — any new day can merge old
    clusters, so per-partition carry-over would be wrong).

    Output table dup_clusters: (url, warc_date, cluster_id,
    is_canonical, cluster_size).
    """
    from .operators.dedup import connected_components, minhash_lsh_pairs

    run_id = run_id or uuid.uuid4().hex[:12]
    catalog = ParquetCatalog(spark, warehouse)
    pages = catalog.read("pages_filtered")

    # day set = the snapshot identity; one tiny row per day (partition
    # listing on a real Iceberg table), not a data collect
    days = sorted(str(r[0]) for r in
                  pages.select("warc_date").distinct().collect())
    snap = hashlib.md5(",".join(days).encode()).hexdigest()[:16]

    if catalog.exists("lineage"):
        done = (catalog.read("lineage")
                .filter((F.col("stage") == GLOBAL_DEDUP_STAGE)
                        & (F.col("status") == "done")
                        & (F.col("partition_key") == snap))
                .count())
        if done > 0:
            return {"run_id": run_id, "snapshot": snap, "resumed": True}

    docs = pages.select(F.col("url").alias("id"), "text", "warc_date")
    pairs = minhash_lsh_pairs(docs, "id", "text", n=n,
                              num_hashes=num_hashes, bands=bands,
                              threshold=threshold)
    labels = connected_components(docs.select("id").distinct(), pairs)
    csize = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    clusters = (docs.select("id", "warc_date")
                .join(labels, "id")
                .join(csize, "label")
                .select(F.col("id").alias("url"), "warc_date",
                        F.col("label").alias("cluster_id"),
                        (F.col("id") == F.col("label"))
                        .alias("is_canonical"),
                        "cluster_size"))
    # full overwrite, THEN the lineage commit — same barrier as run()
    clusters.write.mode("overwrite").parquet(catalog.path("dup_clusters"))
    labels.unpersist()  # release the CC result's checkpoint blocks

    out = catalog.read("dup_clusters")
    n_rows = out.count()
    n_clusters = out.filter("is_canonical").count()
    lin = spark.createDataFrame(
        [(run_id, GLOBAL_DEDUP_STAGE, snap, "done", n_rows, n_clusters)],
        "run_id string, stage string, partition_key string, "
        "status string, rows_in long, rows_out long") \
        .withColumn("finished_ts", F.current_timestamp())
    catalog.append(lin, "lineage")
    return {"run_id": run_id, "snapshot": snap, "resumed": False,
            "rows": n_rows, "clusters": n_clusters,
            "dup_rows": n_rows - n_clusters}
