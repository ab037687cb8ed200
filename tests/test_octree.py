"""Octree state-machine tests (model: reference octree.rs:507-894 suites)."""

import numpy as np

from voxelrs_tpu.world.octree import LeafId, Octree, Position, pick_leaf_for_lod


def test_position_math():
    assert Position(0, 0, 0).idx() == 0
    assert Position(1, 0, 1).idx() == 5
    assert Position(0, 1, 0).idx() == 2
    assert Position(1, 1, 1).idx() == 7
    assert Position(0, 0, 0).required_depth() == 1
    assert Position(1, 0, 0).required_depth() == 1
    assert Position(2, 0, 0).required_depth() == 2
    assert Position(31, 0, 0).required_depth() == 5
    assert Position(32, 0, 0).required_depth() == 6


def test_set_and_get_leaf():
    tree = Octree()
    leaf_id, prev = tree.set_leaf(Position(1, 1, 1), 42)
    assert prev is None
    assert tree.depth() == 1
    assert tree.get_leaf(Position(1, 1, 1)) == 42
    assert tree.get_leaf(Position(0, 0, 0)) is None

    # override
    _, prev = tree.set_leaf(Position(1, 1, 1), 43)
    assert prev == 42
    assert tree.get_leaf(Position(1, 1, 1)) == 43

    # deeper position forces expansion; root goes into child slot 0
    tree.set_leaf(Position(3, 0, 0), 7)
    assert tree.depth() == 2
    assert tree.get_leaf(Position(1, 1, 1)) == 43
    assert tree.get_leaf(Position(3, 0, 0)) == 7


def test_remove_leaf_and_compact():
    tree = Octree()
    tree.set_leaf(Position(0, 0, 0), 1)
    tree.set_leaf(Position(3, 3, 3), 2)
    assert tree.depth() == 2

    value, leaf_id = tree.remove_leaf(Position(3, 3, 3))
    assert value == 2
    assert leaf_id is not None
    assert tree.get_leaf(Position(3, 3, 3)) is None
    assert tree.get_leaf(Position(0, 0, 0)) == 1

    # empty subtree still exists until compact
    used_before = len(tree.octants) - len(tree.free_list)
    tree.compact()
    used_after = len(tree.octants) - len(tree.free_list)
    assert used_after < used_before
    assert tree.get_leaf(Position(0, 0, 0)) == 1

    # removing a non-existing leaf is a no-op
    value, leaf_id = tree.remove_leaf(Position(3, 3, 3))
    assert value is None and leaf_id is None


def test_remove_leaf_by_id():
    tree = Octree()
    leaf_id, _ = tree.set_leaf(Position(1, 0, 0), 9)
    assert tree.remove_leaf_by_id(leaf_id) == 9
    assert tree.get_leaf(Position(1, 0, 0)) is None
    assert tree.remove_leaf_by_id(leaf_id) is None


def test_move_leaf():
    tree = Octree()
    leaf_id, _ = tree.set_leaf(Position(0, 0, 0), 10)
    tree.set_leaf(Position(1, 0, 0), 20)

    # move onto occupied slot returns the displaced value
    new_id, old = tree.move_leaf(leaf_id, Position(1, 0, 0))
    assert old == 20
    assert tree.get_leaf(Position(1, 0, 0)) == 10
    assert tree.get_leaf(Position(0, 0, 0)) is None

    # move to itself is a no-op
    same_id, old = tree.move_leaf(new_id, Position(1, 0, 0))
    assert same_id == new_id and old is None

    # move to an empty distant slot expands the tree
    far_id, old = tree.move_leaf(new_id, Position(3, 2, 1))
    assert old is None
    assert tree.get_leaf(Position(3, 2, 1)) == 10
    assert tree.depth() == 2


def test_free_list_reuse():
    tree = Octree()
    tree.set_leaf(Position(0, 0, 0), 1)
    tree.set_leaf(Position(7, 7, 7), 2)
    count = len(tree.octants)
    tree.remove_leaf(Position(7, 7, 7))
    tree.compact()
    assert len(tree.free_list) > 0
    tree.set_leaf(Position(7, 7, 7), 3)
    # octant storage was reused, not grown
    assert len(tree.octants) == count


def test_construct_octants_with():
    tree = Octree()
    tree.construct_octants_with(
        2, lambda p: (p.x + p.y * 4 + p.z * 16) if (p.x + p.y + p.z) % 2 == 0 else None
    )
    assert tree.depth() == 2
    for z in range(4):
        for y in range(4):
            for x in range(4):
                expect = (x + y * 4 + z * 16) if (x + y + z) % 2 == 0 else None
                got = tree.get_leaf(Position(x, y, z))
                if expect == 0:
                    # value 0 is a valid stored leaf here
                    assert got == 0
                else:
                    assert got == expect

    # constructing with no values produces an empty tree
    tree.construct_octants_with(2, lambda p: None)
    assert tree.root is None and tree.depth() == 0


def test_construct_matches_set_leaf_content():
    rng = np.random.default_rng(0)
    vox = rng.integers(0, 3, size=(8, 8, 8))

    a = Octree()
    a.construct_octants_with(3, lambda p: int(vox[p.x, p.y, p.z]) or None)

    b = Octree()
    for z in range(8):
        for y in range(8):
            for x in range(8):
                if vox[x, y, z]:
                    b.set_leaf(Position(x, y, z), int(vox[x, y, z]))
    b.expand_to(3)

    for z in range(8):
        for y in range(8):
            for x in range(8):
                assert a.get_leaf(Position(x, y, z)) == b.get_leaf(Position(x, y, z))


def test_pick_leaf_for_lod_order():
    # y=1 children (idx 2,3,6,7) have priority over y=0 children
    tree = Octree()
    tree.set_leaf(Position(0, 0, 0), 100)  # idx 0
    tree.set_leaf(Position(0, 1, 0), 200)  # idx 2
    assert pick_leaf_for_lod(tree, tree.octants[tree.root]) == 200

    tree2 = Octree()
    tree2.set_leaf(Position(1, 0, 1), 300)  # idx 5 only
    assert pick_leaf_for_lod(tree2, tree2.octants[tree2.root]) == 300

    # descends into octants in the same order when no direct leaf exists
    tree3 = Octree()
    tree3.set_leaf(Position(0, 0, 0), 1)  # deep, under root child idx 0
    tree3.set_leaf(Position(0, 3, 0), 2)  # deep, under root child idx 2
    tree3.expand_to(2)
    assert pick_leaf_for_lod(tree3, tree3.octants[tree3.root]) == 2
