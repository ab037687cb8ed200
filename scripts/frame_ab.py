"""Hardware A/B of frame-level features and knobs (VERDICT r2 item 1).

Runs bench.py in a fresh subprocess per configuration (env knobs are read
at pipeline-build time) and collects the emitted JSON lines into
docs/ab_r3.json. Every number is measured on the attached TPU — no cost
models. Expect several minutes per NEW configuration (remote compiles of
fresh program shapes; the persistent .jax_cache makes re-runs fast).

Run: python scripts/frame_ab.py [--quick]
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    ("base", {}),
    ("fused_frame_off", {"VOXELRS_FUSED_FRAME": "0"}),
    ("replay_multiprogram", {"VOXELRS_FUSED_FRAME": "0",
                             "VOXELRS_FUSED_REPLAY": "0"}),
    ("sun_certificates_off", {"VOXELRS_SUN": "0"}),
    ("beams_off", {"VOXELRS_BEAMS": "0"}),
    ("adaptive_off", {"VOXELRS_ADAPTIVE": "0"}),
    ("hierarchy_on", {"VOXELRS_HIERARCHY": "1"}),
    ("hierarchy3", {"VOXELRS_HIERARCHY": "2"}),
    ("seg8", {"VOXELRS_SEG": "8"}),
    ("seg16", {"VOXELRS_SEG": "16"}),
    ("substeps3", {"VOXELRS_SUBSTEPS": "3"}),
    ("substeps6", {"VOXELRS_SUBSTEPS": "6"}),
]

# Round-4 matrix (post engine-slim; bench.py gained the MC scene, so the
# A/B rows pin the procedural scene for r3-comparability). docs/ab_r4.json.
CONFIGS_R4 = [
    ("base", {}),  # two-level hierarchy default, slimmed engine
    ("hierarchy3", {"VOXELRS_HIERARCHY": "2"}),
    ("hierarchy_off", {"VOXELRS_HIERARCHY": "0"}),
    ("substeps6", {"VOXELRS_SUBSTEPS": "6"}),
    ("seg16", {"VOXELRS_SEG": "16"}),
]


# Round-5 matrix: re-validate the headline on the MC scene (VERDICT r4
# item 2 — the three headline-path commits that landed after the last A/B
# get individual hardware rows via their gates) + hierarchy3 on MC
# (item 5). docs/ab_r5.json.
CONFIGS_R5 = [
    ("mc_default", {}),
    ("mc_hole_fill_off", {"VOXELRS_HOLE_FILL": "0"}),
    ("mc_defer_flush_off", {"VOXELRS_DEFER_FLUSH": "0"}),
    ("mc_fresh_off", {"VOXELRS_FRESH_OPAQUE": "0"}),
    ("mc_hierarchy3", {"VOXELRS_HIERARCHY": "2"}),
]


def main() -> None:
    quick = "--quick" in sys.argv
    if "--r5" in sys.argv:
        out_path = os.path.join(ROOT, "docs", "ab_r5.json")
        os.environ["VOXELRS_BENCH_SCENE"] = "mc"
        os.environ["VOXELRS_BENCH_BATCH"] = "0"
        _run(CONFIGS_R5, out_path)
        return
    if "--r4" in sys.argv:
        configs = CONFIGS_R4
        out_path = os.path.join(ROOT, "docs", "ab_r4.json")
        os.environ["VOXELRS_BENCH_SCENE"] = "procedural"
        os.environ["VOXELRS_BENCH_BATCH"] = "0"
        _run(configs, out_path)
        return
    configs = CONFIGS[:4] if quick else CONFIGS
    out_path = os.path.join(ROOT, "docs", "ab_r3.json")
    _run(configs, out_path)


def _run(configs, out_path) -> None:
    results = {}
    if os.path.exists(out_path):
        results = json.load(open(out_path))
    for name, env_over in configs:
        if name in results and "--redo" not in sys.argv:
            print(f"# {name}: cached {results[name]}", flush=True)
            continue
        env = dict(os.environ)
        env.update(env_over)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "bench.py"], cwd=ROOT, env=env,
            capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        stderr_tail = [l for l in proc.stderr.splitlines()
                       if l.startswith("#")]
        rec = {
            "env": env_over,
            "wall_s": round(time.time() - t0, 1),
            "frames": stderr_tail[-1] if stderr_tail else None,
        }
        if proc.returncode == 0 and line:
            rec.update(json.loads(line[-1]))
        else:
            rec["error"] = proc.returncode
            rec["tail"] = proc.stderr[-500:]
        results[name] = rec
        print(f"# {name}: {rec}", flush=True)
        json.dump(results, open(out_path, "w"), indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
