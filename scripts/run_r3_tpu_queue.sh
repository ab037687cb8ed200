#!/bin/bash
# Round-3 TPU job queue: streaming bench -> in-game matrix -> csvo A/B.
cd /root/repo
echo "=== streaming bench ==="
timeout 3600 python -u scripts/bench_streaming.py 2>&1 | grep -v cpu_aot_loader
echo "=== in-game matrix ==="
timeout 28800 python -u scripts/benchmark_ingame.py --passes 2 \
  --sample-seconds 15 --out results.csv --resume 2>&1 | grep -v cpu_aot_loader
echo "=== csvo frame A/B ==="
timeout 3600 python -u scripts/csvo_bench.py 2>&1 | grep -v cpu_aot_loader
echo "=== queue done rc=$? ==="
