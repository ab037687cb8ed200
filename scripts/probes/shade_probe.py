"""Probe: surface_shading cost vs lane count (dense-path anomaly hunt)."""

import sys
import time

sys.path.insert(0, "/root/repo")
from voxelrs_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from voxelrs_tpu.gamelogic.content import new_registry  # noqa: E402
from voxelrs_tpu.ops.shading import surface_shading  # noqa: E402
from voxelrs_tpu.ops.traversal import TraversalResult  # noqa: E402

mips, mat_params, mat_tex = new_registry().build()
light = jnp.asarray(np.array([-1, -1, -1], np.float32) / np.sqrt(3))
cam = jnp.asarray([16.0, 95.0, -20.0], jnp.float32)
hl = jnp.asarray(np.full(3, np.nan, np.float32))


def fn(value, face, uv, lod, pos):
    res = TraversalResult(
        t=lod, value=value, face_id=face, pos=pos, uv=uv, lod=lod,
        inside_voxel=None, steps=None, trace=None,
    )
    color, normal, diffuse, specular = surface_shading(
        res, mips, mat_params, mat_tex, cam, light, hl
    )
    return color, diffuse, specular


jfn = jax.jit(fn)

for B in (1048576, 1572864, 2073600, 2097152):
    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.integers(1, 12, B).astype(np.uint32))
    face = jnp.asarray(rng.integers(0, 6, B).astype(np.int32))
    uv = jnp.asarray(rng.random((B, 2), np.float32))
    lod = jnp.asarray((rng.random(B) * 3).astype(np.float32))
    pos = jnp.asarray(rng.random((B, 3), np.float32) * 100)

    r = jfn(value, face, uv, lod, pos)
    _ = np.asarray(r[0][0])
    ts = []
    for _i in range(5):
        t0 = time.perf_counter()
        r = jfn(value, face, uv, lod, pos)
        _ = np.asarray(r[0][0, 0])
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print(f"B={B:8d}: {dt*1e3:7.1f} ms  ({dt/B*1e9:.1f} ns/lane)", flush=True)
