"""World chunk-map + borrow protocol tests
(model: reference world/world.rs:289-364 four-case borrow test)."""

import numpy as np

from voxelrs_tpu.gamelogic import content
from voxelrs_tpu.world.chunk import Chunk, ChunkPos
from voxelrs_tpu.world.world import World


def chunk_at(x, y=0, z=0):
    return Chunk(ChunkPos(x, y, z))


def test_set_get_remove_and_change_queue():
    w = World()
    w.set_chunk(chunk_at(0))
    w.set_chunk(chunk_at(1))
    assert w.get_chunk(ChunkPos(0, 0, 0)) is not None
    assert sorted(p.x for p in w.get_changed_chunks(10)) == [0, 1]
    assert w.get_changed_chunks(10) == []

    w.remove_chunk(ChunkPos(0, 0, 0))
    assert w.get_chunk(ChunkPos(0, 0, 0)) is None
    assert [p.x for p in w.get_changed_chunks(10)] == [0]


def test_change_queue_dedup_and_limit():
    w = World()
    for i in range(5):
        w.set_chunk(chunk_at(i))
        w.set_chunk(chunk_at(i))  # duplicate mark
    first = w.get_changed_chunks(3)
    rest = w.get_changed_chunks(10)
    assert len(first) == 3 and len(rest) == 2


def test_borrow_and_return():
    w = World()
    w.set_chunk_unchanged(chunk_at(0))
    b = w.borrow_chunk(ChunkPos(0, 0, 0))
    assert b is not None
    # while borrowed, the chunk is not in the map
    assert w.get_chunk(ChunkPos(0, 0, 0)) is None
    assert w.has_borrowed_chunks()
    # double borrow fails
    assert w.borrow_chunk(ChunkPos(0, 0, 0)) is None

    w.return_chunk(b)
    assert w.get_chunk(ChunkPos(0, 0, 0)) is not None
    assert not w.has_borrowed_chunks()
    # returning does NOT mark the chunk changed (no feedback loop)
    assert w.get_changed_chunks(10) == []


def test_return_after_override_is_noop():
    w = World()
    old = chunk_at(0)
    old.set_block(0, 0, 0, content.STONE)
    w.set_chunk_unchanged(old)
    b = w.borrow_chunk(ChunkPos(0, 0, 0))

    new = chunk_at(0)
    new.set_block(0, 0, 0, content.GRASS)
    w.set_chunk(new)  # overrides while borrowed

    w.return_chunk(b)  # must not clobber the override
    assert w.get_block(0, 0, 0) == content.GRASS


def test_return_after_remove_is_noop():
    w = World()
    w.set_chunk_unchanged(chunk_at(0))
    b = w.borrow_chunk(ChunkPos(0, 0, 0))
    w.remove_chunk(ChunkPos(0, 0, 0))
    w.return_chunk(b)
    assert w.get_chunk(ChunkPos(0, 0, 0)) is None


def test_dropped_borrow_cleans_up():
    w = World()
    w.set_chunk_unchanged(chunk_at(0))
    b = w.borrow_chunk(ChunkPos(0, 0, 0))
    b.drop()
    w.get_changed_chunks(1)  # triggers lazy cleanup
    assert not w.has_borrowed_chunks()


def test_block_access_on_borrowed_chunk():
    w = World()
    c = chunk_at(0)
    c.set_block(1, 2, 3, content.DIRT)
    w.set_chunk_unchanged(c)
    assert w.get_block(1, 2, 3) == content.DIRT
    w.borrow_chunk(ChunkPos(0, 0, 0))
    # borrowed chunk reads as empty / writes fail
    assert w.get_block(1, 2, 3) == content.AIR
    assert not w.set_block(1, 2, 3, content.STONE)


def test_mark_all_changed():
    w = World()
    for i in range(3):
        w.set_chunk_unchanged(chunk_at(i))
    assert not w.has_changed_chunks()
    w.mark_all_chunks_as_changed()
    assert len(w.get_changed_chunks(10)) == 3


def test_storage_pool_release_on_unload():
    """Dropped chunks return voxel storage to the pool; rejected borrows
    release once the loan comes back (reference: src/world/memory.rs:16-117)."""
    from voxelrs_tpu.world.chunk import ChunkSlotPool

    pool = ChunkSlotPool()
    w = World(storage_pool=pool)

    c1 = Chunk(ChunkPos(0, 0, 0), 5, pool.allocate())
    c2 = Chunk(ChunkPos(1, 0, 0), 5, pool.allocate())
    w.set_chunk(c1)
    w.set_chunk(c2)
    assert pool.used_count() == 2

    # plain unload releases immediately
    w.remove_chunk(ChunkPos(1, 0, 0))
    assert pool.used_count() == 1
    assert pool.allocated_count() == 2  # array kept on the free list

    # removing while borrowed defers release until the borrow returns
    borrowed = w.borrow_chunk(ChunkPos(0, 0, 0))
    w.remove_chunk(ChunkPos(0, 0, 0))
    assert pool.used_count() == 1  # serializer may still read the array
    w.return_chunk(borrowed)
    assert pool.used_count() == 0

    # freed storage is reused, not reallocated
    arr = pool.allocate()
    assert pool.allocated_count() == 2
    assert not arr.any()


def test_storage_pool_release_on_override():
    from voxelrs_tpu.world.chunk import ChunkSlotPool

    pool = ChunkSlotPool()
    w = World(storage_pool=pool)
    w.set_chunk(Chunk(ChunkPos(0, 0, 0), 5, pool.allocate()))
    w.set_chunk(Chunk(ChunkPos(0, 0, 0), 5, pool.allocate()))
    assert pool.used_count() == 1


def test_storage_pool_ignores_foreign_arrays():
    from voxelrs_tpu.world.chunk import ChunkSlotPool

    pool = ChunkSlotPool()
    w = World(storage_pool=pool)
    w.set_chunk(Chunk(ChunkPos(0, 0, 0)))  # non-pool storage
    w.remove_chunk(ChunkPos(0, 0, 0))
    assert pool.used_count() == 0
    assert pool.allocated_count() == 0
