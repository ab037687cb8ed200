"""Traversal kernel tests (model: reference svo_shader_tests.rs:286-1225).

Cross-validates the batched ESVO traversal against a brute-force voxel DDA
marcher on dense arrays, plus hand-built cases for faces/uv/translucency/
inside-voxel, and step-trace structure checks.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from voxelrs_tpu.ops.traversal import intersect_octree
from voxelrs_tpu.world import ChunkPos, Position
from voxelrs_tpu.world.esvo import PREAMBLE_LENGTH_IN_U32, Esvo, SerializedChunk


def build_svo(chunks: dict):
    """chunks: {(cx,cy,cz): (32,32,32) uint32}. Returns (buf, scale, depth)."""
    svo = Esvo()
    for (cx, cy, cz), vox in chunks.items():
        sc = SerializedChunk.from_voxels(ChunkPos(cx, cy, cz), vox, 5)
        svo.set_leaf(Position(cx, cy, cz), sc, True)
    svo.serialize()
    # pad to a fixed bucket so all tests share one compiled kernel signature
    n = svo.size_in_u32() + PREAMBLE_LENGTH_IN_U32
    buf = np.zeros(max(1 << 14, 1 << (n - 1).bit_length()), np.uint32)
    svo.write_to(buf)
    return jnp.asarray(buf), np.float32(2.0 ** -svo.depth()), svo.depth()


_jit_cache: dict = {}


def trace(buf, scale, ro, rd, max_dst=-1.0, cast_translucent=False, alpha_fn=None,
          **kw):
    import jax

    key = (cast_translucent, alpha_fn, tuple(sorted(kw.items())))
    if key not in _jit_cache:
        _jit_cache[key] = jax.jit(
            lambda b, s, o, d, m: intersect_octree(
                b, s, o, d, m, cast_translucent, alpha_fn=alpha_fn, **kw
            )
        )
    ro = jnp.asarray(np.atleast_2d(np.asarray(ro, np.float32)))
    rd = jnp.asarray(np.atleast_2d(np.asarray(rd, np.float32)))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    return _jit_cache[key](buf, scale, ro, rd, jnp.float32(max_dst))


def dda_march(world: np.ndarray, ro, rd, world_size):
    """Brute-force first-hit voxel march. Returns (t, value, face) or None.
    Skips the voxel containing the origin (reference semantics: rays cast
    from inside a voxel don't hit it)."""
    ro = np.asarray(ro, np.float64)
    rd = np.asarray(rd, np.float64)
    rd = rd / np.linalg.norm(rd)
    inv = np.where(np.abs(rd) < 1e-12, np.inf, 1.0 / rd)

    # clip ray to the world cube [0, world_size)^3
    t0 = (0.0 - ro) * inv
    t1 = (world_size - ro) * inv
    tmin = np.maximum.reduce(np.minimum(t0, t1))
    tmax = np.minimum.reduce(np.maximum(t0, t1))
    if tmax <= max(tmin, 0.0):
        return None
    t = max(tmin, 0.0) + 1e-9

    p = ro + t * rd
    ipos = np.floor(p).astype(int)
    # only the voxel containing the ray *origin* is excluded from hits
    start_voxel = tuple(np.floor(ro).astype(int)) if (
        (ro >= 0).all() and (ro < world_size).all()
    ) else None
    step = np.where(rd > 0, 1, -1)
    tdelta = np.abs(inv)
    next_boundary = np.where(rd > 0, ipos + 1, ipos)
    tnext = (next_boundary - ro) * inv
    tnext = np.where(np.isfinite(tnext), tnext, np.inf)

    entry_axis = int(np.argmax(np.where(np.minimum(t0, t1) == tmin, 1, 0)))
    for _ in range(4 * world_size):
        if (0 <= ipos).all() and (ipos < world_size).all():
            if ipos.shape == (3,):
                v = (
                    world[tuple(ipos)]
                    if (ipos < np.array(world.shape)).all()
                    else 0
                )
            if v != 0 and tuple(ipos) != start_voxel and t > 1e-9:
                face = entry_axis * 2 + (1 if rd[entry_axis] < 0 else 0)
                return t, int(v), face
        axis = int(np.argmin(tnext))
        t = tnext[axis]
        tnext[axis] += tdelta[axis]
        ipos[axis] += step[axis]
        entry_axis = axis
        if t > tmax:
            return None
        if not ((-1 <= ipos).all() and (ipos <= world_size).all()):
            return None
    return None


@pytest.fixture(scope="module")
def simple_world():
    vox = np.zeros((32, 32, 32), np.uint32)
    vox[5, 5, 5] = 1
    vox[10, 5, 5] = 2
    vox[5, 20, 5] = 3
    vox[31, 31, 31] = 5
    buf, scale, depth = build_svo({(0, 0, 0): vox})
    return vox, buf, scale, depth


def test_axis_hits_and_uv(simple_world):
    vox, buf, scale, _ = simple_world
    # +x ray: hits x- face (0)
    r = trace(buf, scale, [-10, 5.5, 5.5], [1, 0, 0])
    assert float(r.t[0]) == pytest.approx(15.0, abs=1e-4)
    assert int(r.value[0]) == 1 and int(r.face_id[0]) == 0
    np.testing.assert_allclose(np.asarray(r.pos[0]), [5.0, 5.5, 5.5], atol=1e-4)
    np.testing.assert_allclose(np.asarray(r.uv[0]), [0.5, 0.5], atol=1e-4)

    # -x ray: x+ face (1)
    r = trace(buf, scale, [40, 5.5, 5.5], [-1, 0, 0])
    assert int(r.value[0]) == 2 and int(r.face_id[0]) == 1
    assert float(r.t[0]) == pytest.approx(29.0, abs=1e-4)

    # -y ray from above: y+ face (3)
    r = trace(buf, scale, [5.5, 50, 5.5], [0, -1, 0])
    assert int(r.value[0]) == 3 and int(r.face_id[0]) == 3
    assert float(r.t[0]) == pytest.approx(29.0, abs=1e-4)

    # +y ray from below: y- face (2)
    r = trace(buf, scale, [5.5, -10, 5.5], [0, 1, 0])
    assert int(r.value[0]) == 1 and int(r.face_id[0]) == 2

    # +z / -z
    r = trace(buf, scale, [5.5, 5.5, -3], [0, 0, 1])
    assert int(r.value[0]) == 1 and int(r.face_id[0]) == 4
    r = trace(buf, scale, [5.5, 5.5, 40], [0, 0, -1])
    assert int(r.value[0]) == 1 and int(r.face_id[0]) == 5


def test_uv_orientation_all_faces(simple_world):
    """uv must vary with position on the face consistently with GLSL mapping."""
    vox, buf, scale, _ = simple_world
    # x- face (rd.x > 0): uv = (z - pz, y - py) with uv.x flipped
    r = trace(buf, scale, [-10, 5.75, 5.25], [1, 0, 0])
    np.testing.assert_allclose(np.asarray(r.uv[0]), [1 - 0.25, 0.75], atol=1e-3)
    # x+ face of voxel (10,5,5) (rd.x < 0): no flip
    r = trace(buf, scale, [40, 5.75, 5.25], [-1, 0, 0])
    np.testing.assert_allclose(np.asarray(r.uv[0]), [0.25, 0.75], atol=1e-3)
    # y+ face (top) of (5,20,5): uv = (x - px, z - pz), uv.y flipped for rd.y<0? no:
    # rd.y < 0 hits y+ (face 3); flip only when rd.y > 0
    r = trace(buf, scale, [5.25, 50, 5.75], [0, -1, 0])
    np.testing.assert_allclose(np.asarray(r.uv[0]), [0.25, 0.75], atol=1e-3)
    # y- face: rd.y > 0 -> uv.y flipped
    r = trace(buf, scale, [5.25, -10, 5.75], [0, 1, 0])
    np.testing.assert_allclose(np.asarray(r.uv[0]), [0.25, 1 - 0.75], atol=1e-3)
    # z- face: rd.z > 0, no flip of uv.x; uv = (x - px, y - py)
    r = trace(buf, scale, [5.25, 5.75, -10], [0, 0, 1])
    np.testing.assert_allclose(np.asarray(r.uv[0]), [0.25, 0.75], atol=1e-3)
    # z+ face: rd.z < 0 -> uv.x flipped
    r = trace(buf, scale, [5.25, 5.75, 40], [0, 0, -1])
    np.testing.assert_allclose(np.asarray(r.uv[0]), [1 - 0.25, 0.75], atol=1e-3)


def test_inside_voxel_flag(simple_world):
    vox, buf, scale, _ = simple_world
    r = trace(buf, scale, [5.5, 5.5, 5.5], [1, 0, 0])
    assert bool(r.inside_voxel[0])
    # passes through its own voxel, then hits voxel (10,5,5)
    assert int(r.value[0]) == 2
    assert float(r.t[0]) == pytest.approx(4.5, abs=1e-4)

    r = trace(buf, scale, [2.5, 2.5, 2.5], [1, 0, 0])
    assert not bool(r.inside_voxel[0])


def test_max_dst(simple_world):
    vox, buf, scale, _ = simple_world
    r = trace(buf, scale, [-10, 5.5, 5.5], [1, 0, 0], max_dst=5.0)
    assert float(r.t[0]) == -1.0
    r = trace(buf, scale, [-10, 5.5, 5.5], [1, 0, 0], max_dst=20.0)
    assert float(r.t[0]) == pytest.approx(15.0, abs=1e-4)


def _alpha_translucent7(value, face_id, uv, lod):
    return jnp.where(value == 7, 0.0, 1.0)


def _alpha_semi7(value, face_id, uv, lod):
    return jnp.where(value == 7, 0.5, 1.0)


def _alpha_uv_gate(value, face_id, uv, lod):
    # texel transparent below uv.y = 0.5 for value 7
    return jnp.where((value == 7) & (uv[:, 1] < 0.5), 0.0, 1.0)


def _alpha_uv_gate_low(value, face_id, uv, lod):
    return jnp.where((value == 7) & (uv[:, 1] < 0.4), 0.0, 1.0)


def test_translucency_semantics():
    """Translucent texel handling (reference: svo.esvo.glsl:239-265):
    zero-alpha texels are passed through; a later same-value adjacent voxel
    is skipped even if its texel is opaque; opaque casts ignore alpha."""
    vox = np.zeros((32, 32, 32), np.uint32)
    vox[4, 5, 5] = 7  # translucent pair
    vox[5, 5, 5] = 7
    vox[8, 5, 5] = 7  # separated same-value
    vox[12, 5, 5] = 2  # opaque
    buf, scale, _ = build_svo({(0, 0, 0): vox})

    # semi-transparent texel (alpha > 0): reported like opaque
    r = trace(buf, scale, [-10, 5.5, 5.5], [1, 0, 0],
              cast_translucent=True, alpha_fn=_alpha_semi7)
    assert int(r.value[0]) == 7
    assert float(r.t[0]) == pytest.approx(14.0, abs=1e-4)

    # alpha == 0 everywhere for value 7: ray passes all of them, hits opaque 2
    r = trace(buf, scale, [-10, 5.5, 5.5], [1, 0, 0],
              cast_translucent=True, alpha_fn=_alpha_translucent7)
    assert int(r.value[0]) == 2
    assert float(r.t[0]) == pytest.approx(22.0, abs=1e-4)

    # opaque cast (picker): first voxel reported regardless of alpha
    r = trace(buf, scale, [-10, 5.5, 5.5], [1, 0, 0], cast_translucent=False)
    assert int(r.value[0]) == 7
    assert float(r.t[0]) == pytest.approx(14.0, abs=1e-4)


def test_translucency_adjacent_same_value_skip():
    """After passing a transparent texel of value V, an adjacent V voxel is
    skipped even where its texel is opaque (first_of_kind gating)."""
    vox = np.zeros((32, 32, 32), np.uint32)
    vox[4, 5, 5] = 7
    vox[5, 5, 5] = 7
    buf, scale, _ = build_svo({(0, 0, 0): vox})

    # ray rising in y: enters voxel 4 at uv.y≈0.45 (transparent), voxel 5 at
    # uv.y≈0.53 (opaque texel) -> adjacency skip -> overall miss
    ro = [-1.0, 5.05, 5.5]
    rd = [1.0, 0.08, 0.0]
    r = trace(buf, scale, ro, rd, cast_translucent=True, alpha_fn=_alpha_uv_gate)
    assert float(r.t[0]) == -1.0

    # control: lower gate -> first voxel texel already opaque -> direct hit
    r = trace(buf, scale, ro, rd, cast_translucent=True, alpha_fn=_alpha_uv_gate_low)
    assert int(r.value[0]) == 7
    assert float(r.pos[0][0]) == pytest.approx(4.0, abs=1e-3)


def test_multi_chunk_boundary():
    """Absolute pointers at chunk boundaries must resolve."""
    a = np.zeros((32, 32, 32), np.uint32)
    b = np.zeros((32, 32, 32), np.uint32)
    a[31, 5, 5] = 1
    b[0, 5, 5] = 2
    buf, scale, _ = build_svo({(0, 0, 0): a, (1, 0, 0): b})
    r = trace(buf, scale, [-5, 5.5, 5.5], [1, 0, 0])
    assert int(r.value[0]) == 1 and float(r.t[0]) == pytest.approx(36.0, abs=1e-3)
    r = trace(buf, scale, [70, 5.5, 5.5], [-1, 0, 0])
    assert int(r.value[0]) == 2 and float(r.t[0]) == pytest.approx(37.0, abs=1e-3)
    # ray crossing the boundary between the voxels
    r = trace(buf, scale, [31.5, 5.5, 5.5], [1, 0, 0])
    assert int(r.value[0]) == 2


def test_step_trace_structure(simple_world):
    """Step trace: scales descend on PUSH, t_min is monotonic non-decreasing."""
    vox, buf, scale, _ = simple_world
    r = trace(buf, scale, [-10, 5.5, 5.5], [1, 0, 0],
              record_trace=True, max_steps=200)
    n = int(r.trace["n"][0])
    assert n > 0
    ts = np.asarray(r.trace["t"][0][:n])
    assert (np.diff(ts) >= -1e-5).all()
    scales = np.asarray(r.trace["scale"][0][:n])
    assert scales[0] == 22
    # final recorded step must be the leaf hit
    assert r.trace["is_leaf"][0][n - 1] == 1
    assert r.trace["is_child"][0][n - 1] == 1
    # the hit happened at the deepest scale (leaf level): 22 - (depth-1)
    assert scales[n - 1] == 22 - 5


def test_brute_force_randomized():
    """Randomized cross-check against a dense DDA marcher."""
    rng = np.random.default_rng(42)
    vox = np.where(
        rng.random((32, 32, 32)) < 0.02, rng.integers(1, 13, (32, 32, 32)), 0
    ).astype(np.uint32)
    buf, scale, depth = build_svo({(0, 0, 0): vox})
    world_size = 1 << depth
    world = np.zeros((world_size,) * 3, np.uint32)
    world[:32, :32, :32] = vox

    N = 300
    ro = rng.uniform(-20, 52, (N, 3))
    target = rng.uniform(4, 28, (N, 3))
    rd = target - ro
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)

    r = trace(buf, scale, ro.astype(np.float32), rd.astype(np.float32))
    t = np.asarray(r.t)
    vals = np.asarray(r.value)
    faces = np.asarray(r.face_id)

    mismatches = 0
    for i in range(N):
        expect = dda_march(world, ro[i], rd[i], world_size)
        if expect is None:
            ok = t[i] == -1.0
        else:
            et, ev, ef = expect
            ok = (
                t[i] != -1.0
                and abs(t[i] - et) < 1e-2
                and vals[i] == ev
                and faces[i] == ef
            )
        mismatches += not ok
    assert mismatches == 0, f"{mismatches}/{N} rays disagree with DDA"


def test_high_coordinate_epsilon():
    """Rays far from origin still resolve (float-precision edge cases,
    model: reference svo_shader_tests epsilon suites)."""
    vox = np.zeros((32, 32, 32), np.uint32)
    vox[16, 16, 16] = 9
    # world root at depth 7 => 128-block cube; chunk at (2,2,2) chunk coords
    buf, scale, depth = build_svo({(2, 2, 2): vox})
    base = 64.0
    r = trace(buf, scale, [base - 30, base + 16.5, base + 16.5], [1, 0, 0])
    assert int(r.value[0]) == 9
    assert float(r.t[0]) == pytest.approx(46.0, abs=1e-2)


def test_step_trace_exact_sequence():
    """Exact frame-by-frame traversal record for a known ray (the reference
    asserts whole step stacks the same way, svo_shader_tests.rs:293-334).

    World: single chunk (depth-6 SVO), one voxel at (5,5,5); ray from
    (-10, 5.5, 5.5) along +x enters the cube at t=10 and hits at t=15.
    """
    vox = np.zeros((32, 32, 32), np.uint32)
    vox[5, 5, 5] = 1
    buf, scale, _ = build_svo({(0, 0, 0): vox})
    r = trace(buf, scale, [-10, 5.5, 5.5], [1, 0, 0],
              record_trace=True, max_steps=64)
    n = int(r.trace["n"][0])
    got = {
        k: [int(v) for v in np.asarray(r.trace[k][0][:n])]
        for k in ("ptr", "idx", "parent_idx", "scale", "is_child", "is_leaf")
    }
    ts = [round(float(v), 4) for v in np.asarray(r.trace["t"][0][:n])]

    # PUSH x3 from the preamble through root + upper levels (t stays 10),
    # one ADVANCE at scale 19 (idx 6 empty -> idx 7), PUSH, ADVANCE at 17,
    # then the leaf hit at t=15.
    assert ts == [10.0, 10.0, 10.0, 10.0, 14.0, 14.0, 14.0, 15.0]
    assert got["scale"] == [22, 21, 20, 19, 19, 18, 17, 17]
    assert got["idx"] == [0, 0, 0, 6, 7, 0, 6, 7]
    assert got["is_child"] == [1, 1, 1, 0, 1, 1, 0, 1]
    assert got["is_leaf"] == [0, 0, 0, 0, 0, 0, 0, 1]
    # ptr chain: preamble block 0 -> root block after the 60-word chunk blob
    # (12 + 60 = 72) -> chunk blocks 12, 24, 24, 36, 48, 48
    assert got["ptr"] == [0, 72, 12, 24, 24, 36, 48, 48]
    assert got["parent_idx"] == [0, 0, 0, 0, 0, 7, 0, 0]
    # final result consistent with the trace
    assert float(r.t[0]) == pytest.approx(15.0, abs=1e-4)
    assert int(r.value[0]) == 1
