#!/bin/bash
# Sequential protocol scaling runs r5b..r5f (r5a already recorded).
# Each run: burn calibration + best-of-3 per level at 4 and 16 cores,
# separate JVMs, drain + 45s cooldown before every sample.
# NEVER run other Spark work while this is in flight (_drain pkills
# SparkSubmit).
cd /root/repo
for tag in b c d e f; do
  SDQF_CORES_LO=4 SDQF_CORES_HI=16 \
  SDQF_BENCH_MD=BENCH/r5${tag}_scaling.md \
  python bench_scaling.py 1000000 \
    > BENCH/r5${tag}_scaling.log 2> BENCH/r5${tag}_scaling.err
  echo "=== r5${tag} done $(date +%H:%M:%S) ===" >> BENCH/r5_chain_status.txt
  tail -1 BENCH/r5${tag}_scaling.log >> BENCH/r5_chain_status.txt
done
echo "=== CHAIN COMPLETE $(date +%H:%M:%S) ===" >> BENCH/r5_chain_status.txt
