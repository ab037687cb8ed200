"""Native C++ serializer must be byte-identical to the numpy path."""

import time

import numpy as np
import pytest

from voxelrs_tpu.native import get_lib, serialize_chunk_native
from voxelrs_tpu.world.esvo_dense import serialize_dense_chunk

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native toolchain unavailable"
)


def cases():
    rng = np.random.default_rng(0)
    empty = np.zeros((32, 32, 32), np.uint32)
    single = empty.copy()
    single[5, 17, 30] = 7
    sparse = np.where(
        rng.random((32, 32, 32)) < 0.03, rng.integers(1, 13, (32, 32, 32)), 0
    ).astype(np.uint32)
    dense = np.full((32, 32, 32), 3, np.uint32)
    x, z = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    h = (8 + 6 * np.sin(x / 5.0) + 4 * np.cos(z / 7.0)).astype(np.int32)
    terrain = np.zeros((32, 32, 32), np.uint32)
    for y in range(32):
        terrain[:, y, :] = np.where(y <= h, np.where(y == h, 1, 3), 0)
    return {"empty": empty, "single": single, "sparse": sparse,
            "dense": dense, "terrain": terrain}


@pytest.mark.parametrize("lod", [1, 2, 3, 4, 5, 0])
def test_native_matches_numpy(lod):
    for name, vox in cases().items():
        ref_buf, ref_res = serialize_dense_chunk(vox, lod)
        native = serialize_chunk_native(vox, lod)
        assert native is not None
        buf, (cm, lm, depth) = native
        assert (cm, lm, depth) == (
            ref_res.child_mask, ref_res.leaf_mask, ref_res.depth
        ), (name, lod)
        np.testing.assert_array_equal(buf, ref_buf, err_msg=f"{name} lod={lod}")


def test_native_speed():
    vox = cases()["terrain"]
    serialize_chunk_native(vox, 5)  # warm
    t0 = time.perf_counter()
    n = 50
    for _ in range(n):
        serialize_chunk_native(vox, 5)
    native_us = (time.perf_counter() - t0) / n * 1e6

    t0 = time.perf_counter()
    for _ in range(10):
        serialize_dense_chunk(vox, 5)
    numpy_us = (time.perf_counter() - t0) / 10 * 1e6
    print(f"\nnative {native_us:.0f} us/chunk vs numpy {numpy_us:.0f} us/chunk "
          f"(reference Rust fill_with: 53381 ns)")
    assert native_us < numpy_us

@pytest.mark.parametrize("lod", [1, 2, 3, 4, 5, 0])
def test_csvo_native_matches_python(lod):
    from voxelrs_tpu.native import serialize_csvo_native
    from voxelrs_tpu.world.csvo import serialize_dense_csvo

    rng = np.random.default_rng(17)
    extra = {"random": (rng.random((32, 32, 32)) < 0.2).astype(np.uint32) * 7}
    for name, vox in {**cases(), **extra}.items():
        ref_nodes, ref_mats, ref_cut = serialize_dense_csvo(vox, lod)
        native = serialize_csvo_native(vox, lod)
        assert native is not None, "native csvo unavailable"
        nodes, mats, cut = native
        assert cut == ref_cut, (name, lod)
        if ref_nodes is None:
            assert nodes is None, (name, lod)
            continue
        np.testing.assert_array_equal(nodes, ref_nodes,
                                      err_msg=f"{name} lod={lod}")
        assert list(mats) == list(ref_mats), (name, lod)


def test_csvo_native_speed():
    from voxelrs_tpu.native import serialize_csvo_native
    from voxelrs_tpu.world.csvo import serialize_dense_csvo

    vox = cases()["terrain"]
    serialize_csvo_native(vox, 5)  # warm (builds the .so on first use)
    t0 = time.perf_counter()
    n = 50
    for _ in range(n):
        serialize_csvo_native(vox, 5)
    native_us = (time.perf_counter() - t0) / n * 1e6
    t0 = time.perf_counter()
    for _ in range(5):
        serialize_dense_csvo(vox, 5)
    py_us = (time.perf_counter() - t0) / 5 * 1e6
    print(f"\ncsvo native {native_us:.0f} us/chunk vs python {py_us:.0f} us")
    assert native_us < py_us
