"""In-game benchmark harness: runs the engine over the reference's config
matrix and writes results.csv (reference: benchmark-ingame.py:9-121).

Matrix: svo_format {esvo,csvo} x render_distance {10,20,30,40} x
shadows {on,off} x no_lod {on,off}, 1080p, fov 80, the bundled MC benchmark
world, N passes each (the reference's full axis set,
benchmark-ingame.py:85-95). The camera
starts inside the world's generated strip (the reference's recorded
position predates its bundled world snapshot and sits in the void; see
notes in the repo docs).
"""

from __future__ import annotations

import argparse
import csv
import itertools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from voxelrs_tpu.utils import enable_compile_cache

enable_compile_cache()

from voxelrs_tpu.gamelogic import benchmark  # noqa: E402
from voxelrs_tpu.gamelogic.game import Game, GameArgs  # noqa: E402

# camera inside the MC world's dense terrain strip (engine chunks
# x ~ [-36,-6], z ~ [48,65])
CAM_POS = (-26 * 32 + 16.0, 102.0, 62 * 32 + 24.0)
CAM_ROT = (-18.0, 90.0, 0.0)


def run_config(world_path, fmt, rd, shadows, no_lod, width, height, sample_s,
               passes):
    """One config, ``passes`` sampling passes.

    The world LOADS ONCE per config and the Game is reused across passes
    (the reference harness restarts the binary per pass, but what a pass
    measures is the steady frame rate AFTER "all chunks loaded" — the
    reload would re-measure the identical deterministic world while
    costing minutes of single-core serialization per pass, which is what
    limited round 3 to 2 passes). Each pass still resets the metrics and
    re-warms."""
    rows = []
    game = None
    for p in range(passes):
        benchmark.reset_all()
        if game is None:
            game = Game(
                GameArgs(
                    mc_world=world_path,
                    player_pos=CAM_POS,
                    player_euler_rot=CAM_ROT,
                    render_distance=rd,
                    fov=80.0,
                    render_shadows=shadows,
                    no_lod=no_lod,
                    gpu_buffer_size_mb=256,
                    width=width,
                    height=height,
                    benchmark_mode=True,
                    svo_format=fmt,
                )
            )
            loaded = game.wait_for_world(timeout=600)
        for _ in range(8):  # absorb compiles + plan-replay warmup
            img = game.step_frame(render=True, width=width, height=height)
            img.block_until_ready()
            _ = float(np.asarray(img[0, 0, 0]))
        benchmark.reset_fps()
        t_end = time.time() + sample_s
        t_cap = time.time() + 4 * sample_s  # frames>=20 floor, bounded
        frames = 0
        while time.time() < t_end or (frames < 20 and time.time() < t_cap):
            t0 = time.time()
            img = game.step_frame(render=True, width=width, height=height)
            img.block_until_ready()
            _ = float(np.asarray(img[0, 0, 0]))
            dt = time.time() - t0
            print(f"  frame {frames}: {dt*1e3:.0f} ms", flush=True)
            benchmark.push_frame(1.0 / dt, dt * 1e3)
            frames += 1
        m = benchmark.collect()
        rows.append(
            dict(
                svo_format=fmt,
                render_distance=rd,
                shadows=shadows,
                no_lod=no_lod,
                pass_=p,
                loaded=loaded,
                frames=frames,
                fps_avg=round(m["fps"]["avg"], 2),
                fps_med=round(m["fps"]["med"], 2),
                frame_ms_avg=round(m["frame_time_ms"]["avg"], 2),
                frame_ms_med=round(m["frame_time_ms"]["med"], 2),
                svo_mb=round(m["svo_size_mb"], 1),
                ser_chunk_ms_avg=round(
                    m["traces"].get("serialize_chunk", {}).get("avg", 0.0)
                    * 1e3, 3),
                ser_chunk_ms_med=round(
                    m["traces"].get("serialize_chunk", {}).get("med", 0.0)
                    * 1e3, 3),
                ser_world_ms=round(
                    m["traces"].get("serialize_world", {}).get("avg", 0.0)
                    * 1e3, 1),
            )
        )
        print(rows[-1], flush=True)
    if game is not None:
        game.shutdown()
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--world", default="/root/reference/assets/worlds/benchmark")
    ap.add_argument("--out", default="results.csv")
    ap.add_argument("--passes", type=int, default=1)
    ap.add_argument("--sample-seconds", type=float, default=20.0)
    ap.add_argument("--quick", action="store_true", help="small matrix")
    ap.add_argument("--formats", default="esvo,csvo",
                    help="comma-separated svo formats to run")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--resume", action="store_true",
                    help="skip configs already present in --out (a long "
                    "matrix run killed mid-way restarts where it stopped)")
    args = ap.parse_args()

    rds = [10] if args.quick else [10, 20, 30, 40]
    shadow_opts = [True] if args.quick else [True, False]
    lod_opts = [False] if args.quick else [False, True]
    fmts = args.formats.split(",")

    rows = []
    done = set()
    if args.resume:
        try:
            with open(args.out, newline="") as f:
                rows = list(csv.DictReader(f))
            done = {
                (r["svo_format"], int(r["render_distance"]),
                 r["shadows"] == "True", r["no_lod"] == "True")
                for r in rows
            }
            print(f"resuming: {len(rows)} rows, {len(done)} configs done",
                  flush=True)
        except FileNotFoundError:
            pass

    for fmt, rd, sh, nl in itertools.product(fmts, rds, shadow_opts, lod_opts):
        if (fmt, rd, sh, nl) in done:
            continue
        rows += run_config(
            args.world, fmt, rd, sh, nl, args.width, args.height,
            args.sample_seconds, args.passes,
        )
        # checkpoint after every config: a long matrix run should not lose
        # finished rows to a crash or timeout
        with open(args.out, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            writer.writeheader()
            writer.writerows(rows)

    with open(args.out, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    print(f"wrote {args.out} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
