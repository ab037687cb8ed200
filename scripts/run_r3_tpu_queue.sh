#!/bin/bash
# Round-3 TPU job queue: streaming bench -> SEG=16 A/B -> in-game matrix.
cd /root/repo
echo "=== streaming bench ==="
timeout 2400 python scripts/bench_streaming.py 2>&1 | grep -v cpu_aot_loader
echo "=== seg16 bench ==="
timeout 2400 env VOXELRS_SEG=16 python bench.py 2>&1 | grep -v cpu_aot_loader
echo "=== in-game matrix ==="
timeout 14400 python scripts/benchmark_ingame.py --passes 2 \
  --sample-seconds 15 --out results.csv 2>&1 | grep -v cpu_aot_loader
echo "=== queue done rc=$? ==="
