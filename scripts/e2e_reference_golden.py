"""End-to-end golden check against the reference's expected image.

Reproduces the reference's gamelogic end-to-end test
(reference: src/gamelogic/world.rs:461-498): a standalone World with seed-1
noise terrain, radius 15, streams + serializes everything, renders
1024x768 from player (-24, 80, 174) yaw -90deg, and diffs against
/root/reference/assets/tests/gamelogic_world_end_to_end_expected.png using
the reference's metric (framebuffer.rs:120-134) and the CI threshold 0.015.

Run on the TPU (full streaming render; too slow under the test suite's
forced-CPU backend):  python scripts/e2e_reference_golden.py
Recorded result (round 2): diff = 0.00472 — see docs/PARITY.md.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from voxelrs_tpu.utils import enable_compile_cache

enable_compile_cache()

from voxelrs_tpu.gamelogic.world import World
from voxelrs_tpu.systems.jobs import JobSystem
from voxelrs_tpu.systems.physics import AABBDef, Entity

EXPECTED = "/root/reference/assets/tests/gamelogic_world_end_to_end_expected.png"
W, H = 1024, 768


def main() -> int:
    js = JobSystem(max(2, os.cpu_count() - 1))
    world = World(
        js, fov_y_deg=72.0, render_shadows=True, loading_radius=15,
        no_lod=False, mc_world_path=None, gpu_size_mb=800.0,
        texture_dir="/root/reference/assets/textures",
    )
    player = Entity(
        position=np.array([-24.0, 80.0, 174.0], np.float32),
        aabb_def=AABBDef(np.array([-0.4, -1.7, -0.4], np.float32),
                         np.array([0.8, 1.8, 0.8], np.float32)),
    )
    player.euler_rotation[1] = np.radians(-90.0)
    player.caps.flying = True

    t0 = time.time()
    while True:
        world.update(player)
        if (not world.storage.has_pending_jobs()
                and not world.world_generator.has_pending_jobs()
                and not world.world_svo.has_pending_jobs()
                and not world.world.has_changed_chunks()
                and not world.world.has_borrowed_chunks()):
            break
        time.sleep(0.005)
    print(f"world loaded in {time.time() - t0:.0f}s")

    img = np.asarray(world.render(W, H, max_steps=600))
    js.stop()

    from PIL import Image

    exp = np.asarray(Image.open(EXPECTED).convert("RGB"), np.float64)
    act = np.round(np.clip(img[..., :3], 0, 1) * 255.0)
    diff = float(np.abs(act - exp).mean() / 255.0)
    out = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "e2e_reference_actual.png")
    Image.fromarray(act.astype(np.uint8)).save(out)
    print(f"diff vs reference expected = {diff:.5f} (budget 0.015)")
    return 0 if diff < 0.015 else 1


if __name__ == "__main__":
    raise SystemExit(main())
