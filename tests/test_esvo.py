"""ESVO serializer exact-buffer tests (model: reference esvo.rs:562-1228)."""

import numpy as np

from voxelrs_tpu.world.chunk import ChunkPos
from voxelrs_tpu.world.esvo import (
    PREAMBLE_LENGTH_IN_U32,
    Esvo,
    SerializationResult,
    SerializedChunk,
    serialize_block_octree,
)
from voxelrs_tpu.world.octree import Octree, Position


def test_single_leaf_block():
    tree = Octree()
    tree.set_leaf(Position(0, 0, 0), 255)
    buf, res = serialize_block_octree(tree, 0)
    assert res == SerializationResult(child_mask=1, leaf_mask=1, depth=1)
    assert list(buf) == [0, 0, 0, 0, 255, 0, 0, 0, 0, 0, 0, 0]


def test_two_leaves_one_block():
    # (0,0,0) -> idx 0, (1,0,0) -> idx 1
    tree = Octree()
    tree.set_leaf(Position(0, 0, 0), 10)
    tree.set_leaf(Position(1, 0, 0), 11)
    buf, res = serialize_block_octree(tree, 0)
    assert res == SerializationResult(3, 3, 1)
    assert list(buf) == [0, 0, 0, 0, 10, 11, 0, 0, 0, 0, 0, 0]


def test_depth_two_relative_pointer():
    # leaf at (3,0,0): root child idx 1 -> octant, inner child idx 1 -> leaf 7
    tree = Octree()
    tree.set_leaf(Position(3, 0, 0), 7)
    tree.compact()  # expansion leaves an empty octant in root slot 0
    buf, res = serialize_block_octree(tree, 0)
    assert res == SerializationResult(child_mask=0b10, leaf_mask=0, depth=2)
    expected = [0] * 24
    # root header word 0, high 16 bits: child block has cm=0b10, lm=0b10
    expected[0] = ((0b10 << 8) | 0b10) << 16
    # root body idx 1: relative ptr = 12 - 4 - 1 = 7, bit 31 set
    expected[5] = (1 << 31) | 7
    # child block body idx 1 = 7
    expected[12 + 4 + 1] = 7
    assert list(buf) == expected


def test_depth_first_sibling_order():
    # two subtrees under root: idx 0 (leaf at (1,1,1) depth 2) and idx 7
    tree = Octree()
    tree.set_leaf(Position(1, 1, 1), 100)  # root idx 0, inner idx 7
    tree.set_leaf(Position(2, 2, 2), 200)  # root idx 7, inner idx 0
    tree.compact()
    buf, res = serialize_block_octree(tree, 0)
    assert res == SerializationResult(0b10000001, 0, 2)
    assert len(buf) == 36
    # first child block (root idx 0) serialized first at offset 12
    assert buf[4] == (1 << 31) | (12 - 4 - 0)
    assert buf[12 + 4 + 7] == 100
    # second child block at offset 24
    assert buf[4 + 7] == (1 << 31) | (24 - 4 - 7)
    assert buf[24 + 4 + 0] == 200
    # root header: idx 0 slot (word 0 low) cm=0b10000000 lm=same; idx 7 slot
    assert buf[0] == (0b10000000 << 8) | 0b10000000
    assert buf[3] == (((0b1 << 8) | 0b1) << 16)


def test_lod_truncation_uses_pick_order():
    # depth-2 tree, cut at lod=1: children encoded as representative leaves
    tree = Octree()
    tree.set_leaf(Position(0, 0, 0), 1)  # root idx 0 subtree, inner idx 0
    tree.set_leaf(Position(0, 1, 0), 2)  # same subtree, inner idx 2 (y=1)
    tree.set_leaf(Position(3, 3, 3), 9)  # root idx 7 subtree
    tree.compact()
    buf, res = serialize_block_octree(tree, 1)
    assert res == SerializationResult(0b10000001, 0b10000001, 1)
    assert len(buf) == 12
    # pick order prefers y=1 leaf (idx 2) => value 2
    assert buf[4 + 0] == 2
    assert buf[4 + 7] == 9


def test_lod_matches_full_when_deep_enough():
    tree = Octree()
    tree.set_leaf(Position(1, 0, 1), 5)
    full, rf = serialize_block_octree(tree, 0)
    lod1, r1 = serialize_block_octree(tree, 1)
    assert list(full) == list(lod1)
    assert rf == SerializationResult(0b100000, 0b100000, 1) == r1


def make_chunk(pos, fill):
    """Build a SerializedChunk from an octree filled by fill(x,y,z)."""
    tree = Octree()
    tree.construct_octants_with(5, lambda p: fill(p.x, p.y, p.z))
    return SerializedChunk.from_octree(pos, tree, 5)


def test_esvo_world_container_write_to():
    svo = Esvo()
    chunk = make_chunk(ChunkPos(0, 0, 0), lambda x, y, z: 255 if (x, y, z) == (0, 0, 0) else None)
    svo.set_leaf(Position(0, 0, 0), chunk, serialize=True)
    svo.serialize()

    out = np.zeros(256, dtype=np.uint32)
    n = svo.write_to(out)

    # chunk blob: depth-5 path of blocks 0..4 then leaf
    # blob size: 5 levels of internal blocks = 5 * 12 = 60 words
    assert svo.depth() == 6  # chunk depth 5 + root level
    blob_words = 60
    assert n == PREAMBLE_LENGTH_IN_U32 + blob_words + 12

    # preamble: root child mask << 8, abs pointer to root block
    assert out[0] == 1 << 8
    assert out[4] == PREAMBLE_LENGTH_IN_U32 + blob_words

    # root block: header slot idx0 = chunk masks (cm=1, lm=0 — the chunk's
    # own root children are octants, leaves sit at its bottom level)
    root = PREAMBLE_LENGTH_IN_U32 + blob_words
    assert out[root] == 1 << 8
    # body idx0 = absolute pointer to chunk blob start
    assert out[root + 4] == PREAMBLE_LENGTH_IN_U32


def test_esvo_move_leaf_keeps_blob():
    svo = Esvo()
    chunk = make_chunk(ChunkPos(0, 0, 0), lambda x, y, z: 1 if y == 0 else None)
    leaf_id, _ = svo.set_leaf(Position(0, 0, 0), chunk, serialize=True)
    svo.serialize()
    size_before = svo.buffer.size

    # move: no re-serialization of the chunk blob, only root rebuild
    new_id, _ = svo.move_leaf(leaf_id, Position(1, 0, 0))
    svo.serialize()
    uid = chunk.unique_id()
    assert svo.leaf_info[uid].buf_offset * 1 >= 0
    # blob range unchanged; root block reinserted (same total size)
    assert svo.buffer.size == size_before

    out = np.zeros(8192, dtype=np.uint32)
    svo.write_to(out)
    root = out[4]
    # chunk pointer now at body idx 1
    assert out[root + 4 + 1] == svo.leaf_info[uid].buf_offset + PREAMBLE_LENGTH_IN_U32


def test_esvo_remove_leaf_frees_range():
    svo = Esvo()
    c0 = make_chunk(ChunkPos(0, 0, 0), lambda x, y, z: 1 if x == 0 else None)
    c1 = make_chunk(ChunkPos(1, 0, 0), lambda x, y, z: 2 if x == 1 else None)
    id0, _ = svo.set_leaf(Position(0, 0, 0), c0, serialize=True)
    svo.set_leaf(Position(1, 0, 0), c1, serialize=True)
    svo.serialize()

    svo.remove_leaf(id0)
    svo.serialize()
    assert c0.unique_id() not in svo.leaf_info
    assert len(svo.buffer.free_ranges) >= 1


def test_write_changes_to_incremental():
    svo = Esvo()
    c0 = make_chunk(ChunkPos(0, 0, 0), lambda x, y, z: 1 if z == 0 else None)
    svo.set_leaf(Position(0, 0, 0), c0, serialize=True)
    svo.serialize()

    full = np.zeros(65536, dtype=np.uint32)
    svo.write_to(full)
    svo.buffer.updated_ranges.clear()

    # add a second chunk; apply only deltas to a copy of the full buffer
    c1 = make_chunk(ChunkPos(1, 0, 0), lambda x, y, z: 2 if z == 1 else None)
    svo.set_leaf(Position(1, 0, 0), c1, serialize=True)
    svo.serialize()

    incremental = full.copy()
    ranges = svo.write_changes_to(incremental, reset=True)
    assert ranges, "expected delta ranges"

    fresh = np.zeros(65536, dtype=np.uint32)
    svo.write_to(fresh)
    np.testing.assert_array_equal(incremental, fresh)
    assert not svo.buffer.updated_ranges
