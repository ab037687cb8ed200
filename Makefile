# Convenience targets (reference: Makefile:1-14)

test:
	python -m pytest tests/ -q

bench:
	python bench.py

bench_mc_esvo:
	python scripts/benchmark_ingame.py --quick --out results_esvo.csv

showcase:
	python scripts/showcase.py

run:
	python -m voxelrs_tpu.gamelogic.game --render-distance 8 --frames 30
