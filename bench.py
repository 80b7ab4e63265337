"""Benchmark harness — one JSON line on stdout.

Env knobs:
  SPARK_GRAFT_SF_DIR   input tables dir   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] cores     (default 32)
  SDQF_BENCH_PAGES     pages-table rows   (default scaled from sf)
  SDQF_BENCH_SAMPLES   timed runs/query   (default 3 — median reported)
  SDQF_BENCH_WARMUP    warm-up runs/query (default 1)

Headline suite: the end-to-end quality-filter pipeline (north-star
metric: docs/sec for keep/drop + scrub over the synthesized pages
table) plus representative operator queries over the driver testdata.
Each query is forced with a noop write (full computation, no driver
collect) and timed as the MEDIAN of SDQF_BENCH_SAMPLES runs after
SDQF_BENCH_WARMUP warm-ups — this VM flips between burst and throttle
phases (identical runs measured 2.3× apart), so single samples are
noise, not signal.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q9_product_profit",
    "user_sessions",
    "dedup_exact_keep_first",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "embedding_neardup_lsh",
    "global_dedup_clusters",
    "ann_topk_bruteforce",
    "ann_ivf_probed",
    "ann_ivf_kmeans",
    "winnowing_fingerprints_documents",
    "crawl_diff_documents",
    "scd2_history_documents",
    "q10_returned_revenue",
    "q18_large_volume_orders",
    "hll_distinct_users",
    "bottomk_users_per_type",
    "asof_last_purchase_value",
    "range_join_event_bands",
    "price_quantiles_by_flag",
    "token_stats_documents",
    "quality_scores_documents",
    "metrics_details_documents",
    "pipeline_verdict_documents",
    "series_fingerprint_native_users",
    "quality_stratified_sample_documents",
    "template_clusters_documents",
    "domain_quota_sample_documents",
    "q6_forecast_revenue",
    "q8_market_share",
    "curation_pipeline_documents",
    "decontaminate_documents",
    "dsir_select_documents",
    "mixture_resample_documents",
    "line_dedup_documents",
    "url_dedup_documents",
    "host_stats_documents",
    "blocklist_filter_documents",
    "host_indegree_documents",
    "host_pagerank_documents",
    "vocab_stats_documents",
    "host_concentration_documents",
    "robots_filter_documents",
    "politeness_schedule_documents",
    "revisit_policy_events",
    "size_balanced_shards_documents",
    "calibration_report_documents",
    "pr_curve_documents",
    "frontier_pipeline_documents",
    "bloom_membership_documents",
    "score_drift_psi_documents",
    "sequence_packing_documents",
    "warc_offset_index_documents",
    "recrawl_queue_events",
]


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _pages_path(sf: float, n_pages: int,
                dup_frac: float = 0.0) -> str:
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    tag = f"_dup{dup_frac}" if dup_frac else ""
    path = os.path.join(cache, f"pages_n{n_pages}_seed42{tag}_parts")
    if not os.path.exists(path):
        from standard_data_quality_framework_spark.fixtures import (
            write_pages_parquet)
        write_pages_parquet(path, n=n_pages, seed=42, n_files=48,
                            dup_frac=dup_frac)
    return path


def _force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def _timed_median(fn, samples: int, warmup: int) -> tuple[float, list]:
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(samples):
        t0 = time.perf_counter()
        fn()
        ts.append(round(time.perf_counter() - t0, 3))
    return statistics.median(ts), ts


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)
    n_pages = int(os.environ.get("SDQF_BENCH_PAGES",
                                 max(2000, int(600_000 * sf))))

    from standard_data_quality_framework_spark.session import get_spark
    from standard_data_quality_framework_spark.functions.udfs import make_udfs
    from standard_data_quality_framework_spark.pipeline import (
        run_quality_filter)
    from standard_data_quality_framework_spark.plans.entry_queries import (
        QUERIES)

    pages_path = _pages_path(sf, n_pages)
    spark = get_spark("sdqf_bench", cores=cpus, shuffle_partitions=cpus)
    udfs = make_udfs(spark)  # model training/broadcast outside the timers

    samples = int(os.environ.get("SDQF_BENCH_SAMPLES", "3"))
    warmup = int(os.environ.get("SDQF_BENCH_WARMUP", "1"))
    timings: dict[str, float] = {}
    all_samples: dict[str, list] = {}

    # north-star pipeline throughput
    pages = spark.read.parquet(pages_path)
    med, runs = _timed_median(
        lambda: _force(run_quality_filter(spark, pages, udfs=udfs)
                       .verdicts), samples, warmup)
    timings["pipeline_quality_filter"] = med
    all_samples["pipeline_quality_filter"] = runs
    docs_per_sec = n_pages / med

    # adversarial mega-duplication fixture (judge r4 task #6): 30% of
    # all pages are same-day verbatim copies of ONE viral template —
    # the hot content-hash that wedged the old window-based dedup into
    # a single sorting task. The agg+join verdict must stay within the
    # clean fixture's throughput band.
    pages_skew = spark.read.parquet(_pages_path(sf, n_pages,
                                                dup_frac=0.3))
    med, runs = _timed_median(
        lambda: _force(run_quality_filter(spark, pages_skew, udfs=udfs)
                       .verdicts), samples, warmup)
    timings["pipeline_quality_filter_dupskew"] = med
    all_samples["pipeline_quality_filter_dupskew"] = runs

    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        med, runs = _timed_median(lambda: _force(fn(spark, sf_dir)),
                                  samples, warmup)
        timings[name] = med
        all_samples[name] = runs

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "bench_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "pages_rows": n_pages,
        "docs_per_sec_pipeline": round(docs_per_sec, 1),
        "docs_per_sec_dupskew": round(
            n_pages / timings["pipeline_quality_filter_dupskew"], 1),
        "protocol": f"median of {samples} after {warmup} warm-up",
    }
    # raw per-run samples go to a sidecar file, NOT stdout: the driver
    # keeps only the tail of stdout, so the final line must stay small
    # enough to survive intact (judge r3 task #7)
    sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_samples.json")
    with open(sidecar, "w") as f:
        json.dump({**result, "samples": all_samples}, f, indent=1)
    spark.stop()
    # compact medians JSON as the very LAST stdout line
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
