"""CSVO traversal kernel tests: cross-checked against the same dense DDA
marcher used for the ESVO kernel, plus ESVO-vs-CSVO agreement."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voxelrs_tpu.ops.traversal import intersect_octree
from voxelrs_tpu.ops.traversal_csvo import intersect_octree_csvo
from voxelrs_tpu.world import ChunkPos, Position
from voxelrs_tpu.world.csvo import Csvo, CsvoSerializedChunk
from voxelrs_tpu.world.esvo import PREAMBLE_LENGTH_IN_U32, Esvo, SerializedChunk

from test_traversal import dda_march


def build_csvo(chunks: dict):
    world = Csvo()
    for (cx, cy, cz), vox in chunks.items():
        sc = CsvoSerializedChunk.from_voxels(ChunkPos(cx, cy, cz), vox, 5)
        world.set_leaf(Position(cx, cy, cz), sc, True)
    world.serialize()
    buf = np.zeros(((world.size_in_bytes() + 4 + 15) // 16 + 2) * 16, np.uint8)
    world.write_to(buf)
    root_ptr = int.from_bytes(bytes(buf[:4]), "little")
    words = jnp.asarray(buf[4:].view(np.uint32))
    depth = world.depth()
    return words, np.float32(2.0 ** -depth), root_ptr, depth


_jit_cache = {}


def trace_csvo(world, ro, rd, max_dst=-1.0, cast_translucent=False, alpha_fn=None):
    words, scale, root_ptr, depth = world
    key = (cast_translucent, alpha_fn)
    if key not in _jit_cache:
        _jit_cache[key] = jax.jit(
            lambda w, s, rp, d, o, r, m: intersect_octree_csvo(
                w, s, rp, d, o, r, m, cast_translucent, alpha_fn=alpha_fn
            ),
            static_argnums=(3,),
        )
    ro = jnp.asarray(np.atleast_2d(np.asarray(ro, np.float32)))
    rd = jnp.asarray(np.atleast_2d(np.asarray(rd, np.float32)))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    return _jit_cache[key](words, scale, jnp.uint32(root_ptr), depth, ro, rd,
                           jnp.float32(max_dst))


@pytest.fixture(scope="module")
def simple_world():
    vox = np.zeros((32, 32, 32), np.uint32)
    vox[5, 5, 5] = 1
    vox[10, 5, 5] = 2
    vox[5, 20, 5] = 3
    return vox, build_csvo({(0, 0, 0): vox})


def test_axis_hits(simple_world):
    vox, world = simple_world
    r = trace_csvo(world, [-10, 5.5, 5.5], [1, 0, 0])
    assert float(r.t[0]) == pytest.approx(15.0, abs=1e-4)
    assert int(r.value[0]) == 1 and int(r.face_id[0]) == 0
    np.testing.assert_allclose(np.asarray(r.pos[0]), [5.0, 5.5, 5.5], atol=1e-4)

    r = trace_csvo(world, [40, 5.5, 5.5], [-1, 0, 0])
    assert int(r.value[0]) == 2 and int(r.face_id[0]) == 1

    r = trace_csvo(world, [5.5, 50, 5.5], [0, -1, 0])
    assert int(r.value[0]) == 3 and int(r.face_id[0]) == 3
    assert float(r.t[0]) == pytest.approx(29.0, abs=1e-4)

    r = trace_csvo(world, [-10, 2.5, 2.5], [1, 0, 0])
    assert float(r.t[0]) == -1.0


def test_inside_voxel_and_max_dst(simple_world):
    vox, world = simple_world
    r = trace_csvo(world, [5.5, 5.5, 5.5], [1, 0, 0])
    assert bool(r.inside_voxel[0]) and int(r.value[0]) == 2

    r = trace_csvo(world, [-10, 5.5, 5.5], [1, 0, 0], max_dst=5.0)
    assert float(r.t[0]) == -1.0


def test_multi_chunk_boundary_materials():
    a = np.zeros((32, 32, 32), np.uint32)
    b = np.zeros((32, 32, 32), np.uint32)
    a[31, 5, 5] = 4
    b[0, 5, 5] = 9
    world = build_csvo({(0, 0, 0): a, (1, 0, 0): b})
    r = trace_csvo(world, [-5, 5.5, 5.5], [1, 0, 0])
    assert int(r.value[0]) == 4
    r = trace_csvo(world, [70, 5.5, 5.5], [-1, 0, 0])
    assert int(r.value[0]) == 9
    # crossing between chunks re-resolves the material section
    r = trace_csvo(world, [31.5, 5.5, 5.5], [1, 0, 0])
    assert int(r.value[0]) == 9


def test_matches_esvo_kernel_randomized():
    rng = np.random.default_rng(11)
    vox = np.where(
        rng.random((32, 32, 32)) < 0.03, rng.integers(1, 13, (32, 32, 32)), 0
    ).astype(np.uint32)
    world_c = build_csvo({(0, 0, 0): vox})

    esvo = Esvo()
    esvo.set_leaf(Position(0, 0, 0), SerializedChunk.from_voxels(ChunkPos(0, 0, 0), vox, 5), True)
    esvo.serialize()
    ebuf = np.zeros(1 << 16, np.uint32)
    esvo.write_to(ebuf)
    escale = np.float32(2.0 ** -esvo.depth())

    N = 200
    ro = rng.uniform(-20, 52, (N, 3)).astype(np.float32)
    target = rng.uniform(4, 28, (N, 3))
    rd = (target - ro).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)

    rc = trace_csvo(world_c, ro, rd)
    re = intersect_octree(jnp.asarray(ebuf), escale, jnp.asarray(ro), jnp.asarray(rd), -1.0, False)

    np.testing.assert_allclose(np.asarray(rc.t), np.asarray(re.t), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(rc.value), np.asarray(re.value))
    np.testing.assert_array_equal(np.asarray(rc.face_id), np.asarray(re.face_id))


def test_brute_force_randomized():
    rng = np.random.default_rng(12)
    vox = np.where(
        rng.random((32, 32, 32)) < 0.02, rng.integers(1, 13, (32, 32, 32)), 0
    ).astype(np.uint32)
    world = build_csvo({(0, 0, 0): vox})
    depth = world[3]
    ws = 1 << depth
    dense = np.zeros((ws,) * 3, np.uint32)
    dense[:32, :32, :32] = vox

    N = 150
    ro = rng.uniform(-20, 52, (N, 3))
    target = rng.uniform(4, 28, (N, 3))
    rd = target - ro
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)

    r = trace_csvo(world, ro.astype(np.float32), rd.astype(np.float32))
    t = np.asarray(r.t)
    vals = np.asarray(r.value)

    mism = 0
    for i in range(N):
        e = dda_march(dense, ro[i], rd[i], ws)
        if e is None:
            ok = t[i] == -1.0
        else:
            ok = t[i] != -1.0 and abs(t[i] - e[0]) < 1e-2 and vals[i] == e[1]
        mism += not ok
    assert mism == 0, f"{mism}/{N} disagree with DDA"
