"""Isolate the judged adaptive-merge's device cost at real frame widths.

The round-4 MC stage cut attributes +90 ms to the pixel-level judged
merge (cut adaptive-merge minus cut coarse) — but cut attribution is
DCE-blurred: the pixel merge FORCES the level-2 merge's fill/identity
chains (scale/plane/passed at half-grid width) that the coarse cut's
t-anchor let XLA drop. This probe times the merge programs standalone
with synthetic inputs at the exact production widths:

  a) pixel-level merge (B=2,073,600) anchored on hit only (guard chain)
  b) pixel-level merge, all outputs forced (guards + fills)
  c) half-grid merge (Bc=519,  ...) all outputs forced

Standalone timings floor at ~3-5 ms/call on this attachment (PERF.md
microbench caveat); deltas well above that are trustworthy.

Run on the TPU:  python -u scripts/probes/merge_cost_probe.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from voxelrs_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from voxelrs_tpu.ops import shading  # noqa: E402

W, H = 1920, 1080
B = W * H

pipe = shading._deferred_pipeline(B, W, H, True, 1000, 4)
adaptive_merge_j = pipe[12]
adaptive_merge_jq = pipe[15]
Bc_j = pipe[20]
Hc, Wc = H // 2 + 1, W // 2 + 1
Bc = Hc * Wc
Hq, Wq = Hc // 2 + 1, Wc // 2 + 1
Bq = Hq * Wq
print(f"# B={B} Bc={Bc} Bq={Bq}")

rng = np.random.default_rng(0)


def synth(n):
    """Synthetic half-grid results: blocky regions so guards pass often."""
    y, x = np.divmod(np.arange(n), Wc if n == Bc else Wq)
    region = ((y // 8) * 131 + (x // 8)) % 7
    t = np.where(region > 0, 10.0 + region, -1.0).astype(np.float32)
    value = (region + 1).astype(np.uint32)
    face = np.full(n, 3, np.int32)
    pos = rng.random((n, 3), np.float32)
    uv = rng.random((n, 2), np.float32)
    lod = np.zeros(n, np.float32)
    scale = np.full(n, 17, np.int32)
    plane = np.full(n, 1.5, np.float32)
    passed = np.zeros(n, bool)
    inside = np.zeros(n, bool)
    dev = lambda a: jnp.asarray(a)  # noqa: E731
    return ((dev(t), dev(value), dev(face), dev(pos), dev(uv), dev(lod)),
            dev(scale), dev(plane), dev(passed), dev(inside))


cam = (jnp.asarray([2.0, 120.0, -4.0], jnp.float32),
       jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
       jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
       jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
       jnp.float32(np.radians(80.0)), jnp.float32(W / H))
octree_scale = jnp.float32(2.0 ** -5)

reg_mips = None
from voxelrs_tpu.gamelogic.content import new_registry  # noqa: E402
from voxelrs_tpu.graphics.svo import Svo  # noqa: E402

svo = Svo(new_registry(), capacity_mb=4)
mips, mat_tex = svo.mips, svo.mat_tex

res_c, scale_c, plane_c, passed_c, inside_c = synth(Bc)


def t_ms(fn, reps=8):
    fn()  # compile
    out = fn()
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _i in range(reps):
        out = fn()
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / reps * 1e3


# (a) guard chain only: jit a wrapper that returns just hit + count
@jax.jit
def guards_only(res_c, scale_c, plane_c, passed_c, inside_c):
    out = adaptive_merge_j(res_c, scale_c, plane_c, passed_c, inside_c,
                           octree_scale, cam, mips, mat_tex, True)
    return out[1], out[7]


@jax.jit
def full_merge(res_c, scale_c, plane_c, passed_c, inside_c):
    out = adaptive_merge_j(res_c, scale_c, plane_c, passed_c, inside_c,
                           octree_scale, cam, mips, mat_tex, True)
    return tuple(jnp.sum(x[..., 0] if x.ndim == 2 else x.astype(jnp.float32))
                 if x.dtype != jnp.uint32 else jnp.sum(x.astype(jnp.int32))
                 for x in (list(out[0]) + [out[1], out[2]]))


@jax.jit
def guards_only_nofill(res_c, scale_c, plane_c, passed_c, inside_c):
    out = adaptive_merge_j(res_c, scale_c, plane_c, passed_c, inside_c,
                           octree_scale, cam, mips, mat_tex, False)
    return out[1], out[7]


print(f"pixel merge, guards only (hole_fill=1): "
      f"{t_ms(lambda: guards_only(res_c, scale_c, plane_c, passed_c, inside_c)):.1f} ms")
print(f"pixel merge, guards only (hole_fill=0): "
      f"{t_ms(lambda: guards_only_nofill(res_c, scale_c, plane_c, passed_c, inside_c)):.1f} ms")
print(f"pixel merge, all outputs: "
      f"{t_ms(lambda: full_merge(res_c, scale_c, plane_c, passed_c, inside_c)):.1f} ms")

res_q, scale_q, plane_q, passed_q, inside_q = synth(Bq)


@jax.jit
def full_merge_q(res_q, scale_q, plane_q, passed_q, inside_q):
    out = adaptive_merge_jq(res_q, scale_q, plane_q, passed_q, inside_q,
                            octree_scale, cam, mips, mat_tex, True)
    return tuple(jnp.sum(x[..., 0] if x.ndim == 2 else x.astype(jnp.float32))
                 if x.dtype != jnp.uint32 else jnp.sum(x.astype(jnp.int32))
                 for x in (list(out[0]) + [out[1], out[2], out[3], out[4]]))


print(f"half-grid merge, all outputs: "
      f"{t_ms(lambda: full_merge_q(res_q, scale_q, plane_q, passed_q, inside_q)):.1f} ms")
