"""Dense vectorized serializer must be byte-identical to the octree walk."""

import numpy as np
import pytest

from voxelrs_tpu.world.esvo import serialize_block_octree
from voxelrs_tpu.world.esvo_dense import serialize_dense_chunk
from voxelrs_tpu.world.octree import Octree, Position


def octree_from_voxels(vox):
    tree = Octree()
    tree.construct_octants_with(
        5, lambda p: int(vox[p.x, p.y, p.z]) if vox[p.x, p.y, p.z] else None
    )
    return tree


def assert_equivalent(vox, lod):
    tree = octree_from_voxels(vox)
    ref_buf, ref_res = serialize_block_octree(tree, lod)
    got_buf, got_res = serialize_dense_chunk(vox, lod)
    assert got_res == ref_res
    np.testing.assert_array_equal(got_buf, ref_buf)


def test_empty_chunk():
    vox = np.zeros((32, 32, 32), dtype=np.uint32)
    buf, res = serialize_dense_chunk(vox, 5)
    assert len(buf) == 0 and res.depth == 0


def test_single_voxel():
    vox = np.zeros((32, 32, 32), dtype=np.uint32)
    vox[0, 0, 0] = 7
    assert_equivalent(vox, 5)
    vox2 = np.zeros((32, 32, 32), dtype=np.uint32)
    vox2[31, 17, 5] = 3
    assert_equivalent(vox2, 5)


def test_checkerboard():
    x, y, z = np.meshgrid(np.arange(32), np.arange(32), np.arange(32), indexing="ij")
    vox = np.where((x + y + z) % 2 == 0, 1, 0).astype(np.uint32)
    assert_equivalent(vox, 5)


@pytest.mark.parametrize("lod", [1, 2, 3, 4, 5, 0])
@pytest.mark.parametrize("seed", [0, 1])
def test_random_sparse_all_lods(lod, seed):
    rng = np.random.default_rng(seed)
    vox = np.where(
        rng.random((32, 32, 32)) < 0.03,
        rng.integers(1, 13, size=(32, 32, 32)),
        0,
    ).astype(np.uint32)
    assert_equivalent(vox, lod)


@pytest.mark.parametrize("lod", [2, 5])
def test_terrain_like(lod):
    # heightmap fill: grass on top, dirt below — the worldgen shape
    x, z = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    h = (8 + 6 * np.sin(x / 5.0) + 4 * np.cos(z / 7.0)).astype(np.int32)
    vox = np.zeros((32, 32, 32), dtype=np.uint32)
    for y in range(32):
        layer = np.where(y <= h, np.where(y == h, 1, np.where(y >= h - 3, 2, 3)), 0)
        vox[:, y, :] = layer
    assert_equivalent(vox, lod)


def test_dense_full_chunk():
    vox = np.full((32, 32, 32), 3, dtype=np.uint32)
    assert_equivalent(vox, 5)
    assert_equivalent(vox, 1)
