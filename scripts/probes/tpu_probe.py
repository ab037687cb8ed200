"""First-light TPU benchmark: 1080p frame render timing on the real chip."""

import time

import numpy as np

from voxelrs_tpu.utils import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402

print("devices:", jax.devices(), flush=True)

from voxelrs_tpu.gamelogic.content import new_registry  # noqa: E402
from voxelrs_tpu.graphics.svo import RenderParams, Svo  # noqa: E402
from voxelrs_tpu.world import ChunkPos, Position  # noqa: E402
from voxelrs_tpu.world.esvo import Esvo, SerializedChunk  # noqa: E402


def terrain(cx, cz):
    x, z = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    gx, gz = x + 32 * cx, z + 32 * cz
    h = (10 + 6 * np.sin(gx / 9) + 5 * np.cos(gz / 11) + 3 * np.sin(gz / 5 + gx / 13)).astype(int)
    vox = np.zeros((32, 32, 32), np.uint32)
    for y in range(32):
        vox[:, y, :] = np.where(y <= h, np.where(y == h, 1, np.where(y >= h - 3, 2, 3)), 0)
    return vox


world_svo = Esvo()
for cx in range(4):
    for cz in range(4):
        world_svo.set_leaf(
            Position(cx, 0, cz),
            SerializedChunk.from_voxels(ChunkPos(cx, 0, cz), terrain(cx, cz), 5),
            True,
        )
world_svo.serialize()
svo = Svo(new_registry(), capacity_mb=32)
t0 = time.time()
svo.update(world_svo)
print(f"update: {time.time()-t0:.1f}s depth={svo.depth}", flush=True)

fwd = np.array([0.4, -0.35, 0.85], np.float32)
fwd /= np.linalg.norm(fwd)

for W, H, shadows in [(1280, 720, False), (1920, 1080, False), (1920, 1080, True)]:
    params = RenderParams(
        cam_pos=np.array([34.0, 30.0, -10.0], np.float32),
        cam_fwd=fwd,
        aspect_ratio=W / H,
        render_shadows=shadows,
        shadow_distance=300.0,
    )
    try:
        t0 = time.time()
        img = svo.render(params, W, H)
        img.block_until_ready()
        print(f"{W}x{H} shadows={shadows} first(+compile): {time.time()-t0:.1f}s", flush=True)
        times = []
        for _ in range(5):
            t0 = time.time()
            img = svo.render(params, W, H)
            img.block_until_ready()
            times.append(time.time() - t0)
        dt = float(np.median(times))
        rays = W * H * (2 if shadows else 1)
        print(
            f"{W}x{H} shadows={shadows}: {dt*1e3:.0f}ms median -> "
            f"{rays/dt/1e6:.0f} Mrays/s ({1/dt:.1f} fps)",
            flush=True,
        )
        arr = np.asarray(img)
        print("  nan-free:", not np.isnan(arr).any(), "mean", arr[..., :3].mean().round(3), flush=True)
        if W == 1920 and shadows:
            from PIL import Image

            Image.fromarray((arr[..., :3] * 255).astype(np.uint8)).save("/tmp/tpu_1080p.png")
    except Exception as e:
        print(f"{W}x{H} shadows={shadows} FAILED: {type(e).__name__}: {e}", flush=True)
