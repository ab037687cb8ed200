"""Per-stage timing of MC-world frames (the reference's ingame benchmark
scene — exercises the translucent/judged pipeline)."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("VOXELRS_TIMING", "1")

from voxelrs_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np  # noqa: E402

from voxelrs_tpu.gamelogic.game import Game, GameArgs  # noqa: E402

W, H = 1920, 1080
CAM_POS = (-26 * 32 + 16.0, 102.0, 62 * 32 + 24.0)
CAM_ROT = (-18.0, 90.0, 0.0)

world = os.environ.get(
    "MC_WORLD", "/root/reference/assets/worlds/benchmark"
)
game = Game(GameArgs(
    mc_world=world, player_pos=CAM_POS, player_euler_rot=CAM_ROT,
    render_distance=int(os.environ.get("RD", "10")), fov=80.0,
    render_shadows=True, no_lod=False, gpu_buffer_size_mb=256,
    benchmark_mode=True, width=W, height=H,
))
print("loading world...", flush=True)
ok = game.wait_for_world(timeout=600)
print(f"loaded: {ok}", flush=True)

svo = game.world.world_svo
print(f"translucent? mask={svo.graphics_svo.world_value_mask & svo.graphics_svo.translucent_block_mask:#x}"
      if hasattr(svo, "graphics_svo") else "", flush=True)

for i in range(int(os.environ.get("FRAMES", "4"))):
    t0 = time.perf_counter()
    img = game.world.render(W, H)
    _ = float(np.asarray(img[0, 0, 0]))
    print(f"frame {i}: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)
game.shutdown()
