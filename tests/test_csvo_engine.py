"""Restartable CSVO engine tests: the deferred-engine rounds (+ compaction
restarts) must reproduce the fused CSVO kernel's first-hit results exactly
(model: the ESVO deferred==canonical ULP test, applied to the CSVO engine)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voxelrs_tpu.ops.traversal import make_ray_consts
from voxelrs_tpu.ops.traversal_csvo import (
    finalize_csvo,
    init_state_csvo,
    intersect_octree_csvo,
    restart_state_csvo,
    run_loop_csvo,
)

from test_traversal_csvo import build_csvo


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    ro = rng.uniform(-5, 40, (n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def _world():
    rng = np.random.default_rng(3)
    vox = (rng.random((32, 32, 32)) < 0.06).astype(np.uint32) * (
        rng.integers(1, 5, (32, 32, 32)).astype(np.uint32)
    )
    vox[:, :3, :] = 1  # floor
    b = np.zeros((32, 32, 32), np.uint32)
    b[:, :5, :] = 2
    return build_csvo({(0, 0, 0): vox, (1, 0, 0): b})


@pytest.fixture(scope="module")
def world():
    return _world()


def _engine_one_shot(world, ro, rd, iters=500):  # 1000 steps = fused budget
    words, scale, root_ptr, depth = world
    H = 12  # must match the fused kernel's STACK_HEIGHT: inside-voxel rays
    # descend below leaf scale at t=0 and use deep stack slots

    @jax.jit
    def run(words, ro, rd):
        c = make_ray_consts(scale, ro, rd, jnp.float32(-1.0))
        s = init_state_csvo(c, jnp.uint32(root_ptr), depth, H)
        steps, s = run_loop_csvo(words, c, s, iters, 2)
        return finalize_csvo(words, c, s, steps)

    return run(words, ro, rd)


def _fused_ref(world, ro, rd):
    """Fused kernel under jit — comparisons must pit jitted program against
    jitted program: XLA's FMA contraction inside a jit differs from eager
    op-by-op execution, shifting grazing-ray t by ~1 contracted ULP."""
    words, scale, root_ptr, depth = world

    @jax.jit
    def run(w, o, r):
        return intersect_octree_csvo(w, scale, jnp.uint32(root_ptr), depth,
                                     o, r, jnp.float32(-1.0), False)

    return run(words, ro, rd)


def test_engine_matches_fused_first_hit(world):
    ro, rd = _rays(512)
    ref = _fused_ref(world, ro, rd)
    got = _engine_one_shot(world, ro, rd)
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))
    np.testing.assert_array_equal(np.asarray(got.value), np.asarray(ref.value))
    np.testing.assert_array_equal(np.asarray(got.face_id), np.asarray(ref.face_id))
    hit = np.asarray(ref.t) > 0
    np.testing.assert_allclose(np.asarray(got.uv)[hit], np.asarray(ref.uv)[hit],
                               atol=0, rtol=0)
    np.testing.assert_array_equal(np.asarray(got.inside_voxel),
                                  np.asarray(ref.inside_voxel))


def test_engine_restart_compaction_matches(world):
    """Run a few short rounds, compact the unfinished lanes via a restart
    (re-descend from the root at the old t_min), finish, scatter back —
    results must equal the uncompacted run exactly."""
    words, scale, root_ptr, depth = world
    H = 12  # must match the fused kernel's STACK_HEIGHT: inside-voxel rays
    # descend below leaf scale at t=0 and use deep stack slots
    ro, rd = _rays(512, seed=7)

    full = _engine_one_shot(world, ro, rd)

    # head/tail run under jit like the pipelines (and like _engine_one_shot:
    # eager-vs-jit FMA contraction would shift grazing-ray t otherwise)
    @jax.jit
    def head(words, ro, rd):
        c = make_ray_consts(scale, ro, rd, jnp.float32(-1.0))
        s = init_state_csvo(c, jnp.uint32(root_ptr), depth, H)
        steps1, s = run_loop_csvo(words, c, s, 6, 2)
        return s, finalize_csvo(words, c, s, steps1)

    s, res_head = head(words, ro, rd)

    n_active = int(jnp.sum(s.active))
    assert n_active > 0, "test wants unfinished lanes after 6 iterations"
    bucket = 1 << int(np.ceil(np.log2(max(n_active, 2))))
    sub = jnp.nonzero(s.active, size=bucket, fill_value=0)[0]

    @jax.jit
    def tail(words, ro_k, rd_k, t_floor, inside, adj_last, missed, suppress,
             active_k):
        ck = make_ray_consts(scale, ro_k, rd_k, jnp.float32(-1.0))
        sk = restart_state_csvo(
            ck, t_floor=t_floor, inside=inside, adj_last=adj_last,
            missed=missed, suppress=suppress, root_ptr=jnp.uint32(root_ptr),
            total_depth=depth, stack_height=H,
        )
        sk = sk._replace(active=sk.active & active_k)
        steps2, sk = run_loop_csvo(words, ck, sk, 500, 2)
        return sk, finalize_csvo(words, ck, sk, steps2)

    sk, res_tail = tail(words, ro[sub], rd[sub], s.t_min[sub], s.inside[sub],
                        s.adj_last[sub], s.missed[sub], s.suppress[sub],
                        s.active[sub])
    assert int(jnp.sum(sk.active)) == 0

    # merge: lanes finished in the head keep theirs; restarted lanes take tail
    t = np.asarray(res_head.t).copy()
    v = np.asarray(res_head.value).copy()
    f = np.asarray(res_head.face_id).copy()
    uv = np.asarray(res_head.uv).copy()
    was_active = np.asarray(s.active)
    sub_np = np.asarray(sub)
    tail_t = np.asarray(res_tail.t)
    tail_v = np.asarray(res_tail.value)
    tail_f = np.asarray(res_tail.face_id)
    tail_uv = np.asarray(res_tail.uv)
    for i, lane in enumerate(sub_np):
        if was_active[lane]:
            t[lane] = tail_t[i]
            v[lane] = tail_v[i]
            f[lane] = tail_f[i]
            uv[lane] = tail_uv[i]

    # rays that start INSIDE a voxel descend through sub-leaf garbage space
    # at t==0 (faithful to the fused kernel and the reference GLSL alike);
    # that walk is not memoryless, so restarts are only exact for outside
    # rays — which is all the pipelines ever compact in practice (camera /
    # offset shadow origins).
    outside = ~np.asarray(full.inside_voxel)
    assert outside.sum() > 450  # the comparison must retain real coverage
    np.testing.assert_array_equal(t[outside], np.asarray(full.t)[outside])
    np.testing.assert_array_equal(v[outside], np.asarray(full.value)[outside])
    np.testing.assert_array_equal(f[outside], np.asarray(full.face_id)[outside])
    hit = (t > 0) & outside
    np.testing.assert_array_equal(uv[hit], np.asarray(full.uv)[hit])
