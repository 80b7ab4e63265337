#!/bin/bash
# Two extra protocol scaling runs r5m, r5n (same protocol as a-l).
cd /root/repo
for tag in m n; do
  SDQF_CORES_LO=4 SDQF_CORES_HI=16 \
  SDQF_BENCH_MD=BENCH/r5${tag}_scaling.md \
  python bench_scaling.py 1000000 \
    > BENCH/r5${tag}_scaling.log 2> BENCH/r5${tag}_scaling.err
  echo "=== r5${tag} done $(date +%H:%M:%S) ===" >> BENCH/r5_chain_status.txt
  tail -1 BENCH/r5${tag}_scaling.log >> BENCH/r5_chain_status.txt
done
echo "=== CHAIN5 COMPLETE $(date +%H:%M:%S) ===" >> BENCH/r5_chain_status.txt
