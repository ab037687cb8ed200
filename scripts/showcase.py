"""Render showcase images: procedural terrain + the Minecraft benchmark
world, through the full streaming engine (storage -> chunks -> SVO -> frame).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def save(img, path):
    from PIL import Image

    Image.fromarray((np.asarray(img)[..., :3] * 255).astype(np.uint8)).save(path)
    print(f"wrote {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="docs")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mc-world", default="/root/reference/assets/worlds/benchmark")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from voxelrs_tpu.utils import enable_compile_cache

    enable_compile_cache()

    from voxelrs_tpu.gamelogic.game import Game, GameArgs

    os.makedirs(args.out_dir, exist_ok=True)

    # procedural terrain
    # seed-1 surface at (16,-30) is y~165 since the noise-crate parity
    # rebuild moved the terrain; camera sits above it looking down-valley
    g = Game(GameArgs(player_pos=(16.0, 185.0, -30.0),
                      player_euler_rot=(-22.0, 75.0, 0.0),
                      render_distance=6, gpu_buffer_size_mb=64,
                      width=args.width, height=args.height))
    t0 = time.time()
    assert g.wait_for_world(timeout=300)
    print(f"procedural world streamed in {time.time()-t0:.1f}s "
          f"({len(g.world.world.chunks)} chunks)")
    img = g.step_frame(render=True, width=args.width, height=args.height)
    save(img, os.path.join(args.out_dir, "showcase_procedural.png"))
    g.shutdown()

    # Minecraft benchmark world (camera inside the generated strip)
    if os.path.isdir(args.mc_world):
        g = Game(GameArgs(mc_world=args.mc_world,
                          player_pos=(-26 * 32 + 16.0, 102.0, 62 * 32 + 24.0),
                          player_euler_rot=(-18.0, 90.0, 0.0),
                          render_distance=6, gpu_buffer_size_mb=128,
                          width=args.width, height=args.height))
        t0 = time.time()
        assert g.wait_for_world(timeout=600)
        print(f"mc world streamed in {time.time()-t0:.1f}s "
              f"({len(g.world.world.chunks)} chunks)")
        img = g.step_frame(render=True, width=args.width, height=args.height)
        save(img, os.path.join(args.out_dir, "showcase_mc.png"))
        g.shutdown()


if __name__ == "__main__":
    main()
