#!/bin/bash
# Round-3 post-matrix TPU jobs: regen the shader microbench (CSVO window
# containment landed), re-run the streaming bench (async sun fix), then
# one default bench.py to confirm the headline before the driver's run.
cd /root/repo
echo "=== shader microbench regen ==="
timeout 3600 python -u scripts/shader_microbench.py 2>&1 | grep -v cpu_aot_loader
echo "=== streaming bench (async sun) ==="
timeout 3600 python -u scripts/bench_streaming.py 2>&1 | grep -v cpu_aot_loader
echo "=== quick in-game (picker memo) ==="
timeout 1800 python -u scripts/benchmark_ingame.py --quick --passes 1 \
  --sample-seconds 15 --formats esvo --out docs/results_quick.csv \
  2>&1 | grep -v cpu_aot_loader
echo "=== bench.py default confirm ==="
timeout 3600 python -u bench.py 2>&1 | grep -v cpu_aot_loader
echo "=== post-matrix queue done ==="
