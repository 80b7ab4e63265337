"""Per-query isolation bench (guide §1.4) — NOT the frozen bench.py.

Runs selected registry queries against an arbitrary data dir with the
noop sink, reporting per-query seconds and (optionally) dumping
``explain("formatted")`` to plans/r06/.

Usage:
  python bench_extra.py QUERY [QUERY...] [--dir DIR] [--samples N]
                        [--warmup N] [--explain TAG]

Env: SPARK_GRAFT_CPUS (default 32).
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--dir", default="/root/sf1x")
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--explain", default=None,
                    help="dump plans/r06/<query>_<TAG>.txt")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from standard_data_quality_framework_spark.session import get_spark
    from standard_data_quality_framework_spark.plans.entry_queries import (
        QUERIES)
    spark = get_spark("sdqf_bench_extra", cores=cpus,
                      shuffle_partitions=cpus)

    out = {}
    for name in args.queries:
        fn = QUERIES[name]
        if args.explain:
            os.makedirs("plans/r06", exist_ok=True)
            plan = fn(spark, args.dir)._jdf.queryExecution() \
                .explainString(spark._jvm.org.apache.spark.sql.execution
                               .ExplainMode.fromString("formatted"))
            with open(f"plans/r06/{name}_{args.explain}.txt", "w") as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(name)

        def run():
            fn(spark, args.dir).write.format("noop") \
                .mode("overwrite").save()

        if args.samples == 0:
            continue  # --explain-only mode
        for _ in range(args.warmup):
            run()
        ts = []
        for _ in range(args.samples):
            t0 = time.perf_counter()
            run()
            ts.append(round(time.perf_counter() - t0, 3))
        out[name] = {"median": statistics.median(ts), "samples": ts}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"dir": args.dir, "cpus": cpus, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
