"""RangeBuffer insert/remove/merge tests (model: reference internal.rs:279-453)."""

import numpy as np

from voxelrs_tpu.world.rangebuf import Range, RangeBuffer, merge_ranges


def u32(*vals):
    return np.array(vals, dtype=np.uint32)


def test_insert_appends_and_tracks():
    b = RangeBuffer()
    assert b.insert(1, u32(1, 2, 3)) == 0
    assert b.insert(2, u32(4, 5)) == 3
    assert b.size == 5
    assert list(b.data[:5]) == [1, 2, 3, 4, 5]
    assert b.id_to_range == {1: Range(0, 3), 2: Range(3, 2)}
    assert b.updated_ranges == [Range(0, 5)]


def test_remove_frees_and_reuse_first_fit():
    b = RangeBuffer()
    b.insert(1, u32(1, 1, 1))
    b.insert(2, u32(2, 2))
    b.insert(3, u32(3, 3, 3))
    b.remove(2)
    assert b.free_ranges == [Range(3, 2)]

    # a fitting insert reuses the free range
    assert b.insert(4, u32(9)) == 3
    assert b.free_ranges == [Range(4, 1)]

    # too large goes to the end
    assert b.insert(5, u32(7, 7, 7)) == 8
    assert b.size == 11


def test_adjacent_free_ranges_merge():
    b = RangeBuffer()
    b.insert(1, u32(1, 1))
    b.insert(2, u32(2, 2))
    b.insert(3, u32(3, 3))
    b.remove(1)
    b.remove(3)
    assert b.free_ranges == [Range(0, 2), Range(4, 2)]
    b.remove(2)
    assert b.free_ranges == [Range(0, 6)]


def test_reinsert_same_id_removes_old_range():
    b = RangeBuffer()
    b.insert(1, u32(1, 1, 1))
    b.insert(1, u32(2, 2, 2, 2))
    # old range freed, new one appended (old is too small)
    assert b.id_to_range[1] == Range(3, 4)
    assert b.free_ranges == [Range(0, 3)]


def test_updated_ranges_merge_and_reset():
    b = RangeBuffer()
    b.insert(1, u32(1, 1))
    b.insert(2, u32(2, 2))
    assert b.updated_ranges == [Range(0, 4)]
    b.updated_ranges.clear()
    b.insert(1, u32(9, 9))  # in-place overwrite at 0
    assert b.updated_ranges == [Range(0, 2)]


def test_merge_ranges_overlap_cases():
    r = [Range(4, 2), Range(0, 2), Range(2, 2)]
    assert merge_ranges(r) == [Range(0, 6)]

    r = [Range(0, 4), Range(2, 1)]  # contained
    assert merge_ranges(r) == [Range(0, 4)]

    r = [Range(0, 3), Range(2, 4)]  # partial overlap
    assert merge_ranges(r) == [Range(0, 6)]

    r = [Range(0, 1), Range(5, 1)]  # disjoint
    assert merge_ranges(r) == [Range(0, 1), Range(5, 1)]


def test_capacity_preallocation():
    b = RangeBuffer(capacity=16)
    assert b.free_ranges == [Range(0, 16)]
    assert b.insert(1, u32(1, 2, 3, 4)) == 0
    assert b.free_ranges == [Range(4, 12)]
    assert b.size_in_bytes() == 64
