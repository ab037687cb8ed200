"""Pointer-based octree with free-list reuse.

Host-side bookkeeping structure used for (a) hand-built test worlds and
(b) the world-root octree that maps chunk slots to serialized-chunk blobs.
Bulk per-chunk work never walks this structure — dense ``(32,32,32)`` arrays
plus the vectorized serializer in ``esvo_dense`` handle that path.

Semantics mirror the reference octree (reference: src/world/hds/octree.rs:56-418):
flat octant storage, parent pointers, free-list reuse of deleted octants,
``construct_octants_with`` bottom-up bulk construction, ``expand``/``compact``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Callable, Iterable, Optional


@dataclass(frozen=True)
class LeafId:
    """Position of a leaf: child slot ``idx`` inside octant ``parent``.

    Reference: src/world/hds/octree.rs:12-15.
    """

    parent: int
    idx: int


@dataclass(frozen=True)
class Position:
    """Integer leaf position inside an octree of depth d, coords in [0, 2^d).

    Child index convention: ``idx = x + y*2 + z*4``
    (reference: src/world/hds/octree.rs:21-23).
    """

    x: int
    y: int
    z: int

    def idx(self) -> int:
        return self.x + self.y * 2 + self.z * 4

    def required_depth(self) -> int:
        d = max(1, self.x, self.y, self.z)
        return int(math.floor(math.log2(d))) + 1

    def div(self, s: int) -> "Position":
        return Position(self.x // s, self.y // s, self.z // s)

    def mod(self, s: int) -> "Position":
        return Position(self.x % s, self.y % s, self.z % s)


# Child encodings inside Octant.children:
#   None            — empty
#   ("o", octant_id) — child octant
#   ("l", value)     — leaf value
_OCTANT = "o"
_LEAF = "l"


class Octant:
    __slots__ = ("parent", "children", "children_count")

    def __init__(self, parent: Optional[int]):
        self.parent = parent
        self.children: list = [None] * 8
        self.children_count = 0

    def set_child(self, idx: int, child) -> Any:
        """Replace child at idx, returning the previous entry."""
        prev = self.children[idx]
        if prev is not None:
            self.children_count -= 1
        if child is not None:
            self.children_count += 1
        self.children[idx] = child
        return prev


class Octree:
    """Generic octree over a flat octant list with a free list."""

    def __init__(self) -> None:
        self.root: Optional[int] = None
        self.octants: list[Octant] = []
        self.free_list: list[int] = []
        self._depth = 0

    # -- basic state ---------------------------------------------------------

    def reset(self) -> None:
        self.root = None
        self.octants.clear()
        self.free_list.clear()
        self._depth = 0

    def depth(self) -> int:
        return self._depth

    # -- leaf ops ------------------------------------------------------------

    def set_leaf(self, pos: Position, leaf) -> tuple[LeafId, Any]:
        """Insert ``leaf`` at ``pos``, expanding the tree as needed.

        Returns the new LeafId and any previous leaf value that was replaced.
        Reference: src/world/hds/octree.rs:101-122.
        """
        self.expand_to(pos.required_depth())

        it = self.root
        p = pos
        size = 1 << self._depth
        while size >= 1:
            size //= 2
            idx = p.div(size).idx() if size > 0 else p.idx()
            p = p.mod(size) if size > 0 else p

            if size == 1:
                prev = self.octants[it].set_child(idx, (_LEAF, leaf))
                prev_val = prev[1] if (prev is not None and prev[0] == _LEAF) else None
                return LeafId(it, idx), prev_val

            it = self._step_into_or_create(it, idx)
        raise AssertionError("could not reach end of tree")

    def construct_octants_with(
        self, depth: int, f: Callable[[Position], Any]
    ) -> None:
        """Rebuild the tree bottom-up at ``depth``; ``f`` returns a leaf value or
        None per position. Branches with no leaves are skipped, so the result is
        already compacted. Reference: src/world/hds/octree.rs:127-172.
        """
        self.reset()
        size = 1 << depth
        root = self._construct_impl(size, Position(0, 0, 0), f)
        if root is not None:
            self.root = root
            self._depth = depth

    def _construct_impl(self, size: int, pos: Position, f) -> Optional[int]:
        size //= 2
        new_parent: Optional[int] = None
        for i in range(8):
            child_pos = Position(
                pos.x + size * (i & 1),
                pos.y + size * ((i >> 1) & 1),
                pos.z + size * ((i >> 2) & 1),
            )
            if size > 1:
                child_id = self._construct_impl(size, child_pos, f)
                if child_id is None:
                    continue
                if new_parent is None:
                    new_parent = self._new_octant(None)
                self.octants[new_parent].set_child(i, (_OCTANT, child_id))
                self.octants[child_id].parent = new_parent
                continue

            value = f(child_pos)
            if value is not None:
                if new_parent is None:
                    new_parent = self._new_octant(None)
                self.octants[new_parent].set_child(i, (_LEAF, value))
        return new_parent

    def move_leaf(self, leaf_id: LeafId, to_pos: Position) -> tuple[LeafId, Any]:
        """Move the leaf to a new position. The old slot becomes empty; returns
        the new LeafId plus any replaced value at the target.
        Reference: src/world/hds/octree.rs:177-218.
        """
        self.expand_to(to_pos.required_depth())

        it = self.root
        p = to_pos
        size = 1 << self._depth
        while size >= 1:
            size //= 2
            idx = p.div(size).idx() if size > 0 else p.idx()
            p = p.mod(size) if size > 0 else p

            if size == 1:
                if it == leaf_id.parent and idx == leaf_id.idx:
                    return leaf_id, None

                old_leaf = self.octants[it].set_child(idx, None)
                new_leaf = self.octants[leaf_id.parent].set_child(leaf_id.idx, None)
                if new_leaf is not None and new_leaf[0] == _LEAF:
                    self.octants[it].set_child(idx, new_leaf)

                new_leaf_id = LeafId(it, idx)
                if old_leaf is None:
                    return new_leaf_id, None
                if old_leaf[0] == _OCTANT:
                    raise AssertionError("found unexpected octant")
                return new_leaf_id, old_leaf[1]

            it = self._step_into_or_create(it, idx)
        raise AssertionError("could not reach end of tree")

    def remove_leaf(self, pos: Position) -> tuple[Any, Optional[LeafId]]:
        """Remove the leaf at pos (empty parents kept — use ``compact``).
        Reference: src/world/hds/octree.rs:239-267."""
        if pos.required_depth() > self._depth or self.root is None:
            return None, None

        it = self.root
        p = pos
        size = 1 << self._depth
        while size >= 1:
            size //= 2
            idx = p.div(size).idx() if size > 0 else p.idx()
            p = p.mod(size) if size > 0 else p

            child = self.octants[it].children[idx]
            if child is None:
                break
            if child[0] == _OCTANT:
                it = child[1]
            else:
                removed = self.octants[it].set_child(idx, None)
                return removed[1], LeafId(it, idx)
        return None, None

    def remove_leaf_by_id(self, leaf_id: LeafId) -> Any:
        child = self.octants[leaf_id.parent].children[leaf_id.idx]
        if child is None or child[0] == _OCTANT:
            return None
        removed = self.octants[leaf_id.parent].set_child(leaf_id.idx, None)
        return removed[1]

    def get_leaf(self, pos: Position) -> Any:
        if self.root is None or pos.required_depth() > self._depth:
            return None
        it = self.root
        p = pos
        size = 1 << self._depth
        while size > 0:
            size //= 2
            idx = p.div(size).idx() if size > 0 else p.idx()
            p = p.mod(size) if size > 0 else p

            child = self.octants[it].children[idx]
            if child is None:
                break
            if child[0] == _OCTANT:
                it = child[1]
            else:
                return child[1]
        return None

    def get_leaf_id(self, pos: Position) -> Optional[LeafId]:
        """Find the LeafId holding ``pos``'s value, if any."""
        if self.root is None or pos.required_depth() > self._depth:
            return None
        it = self.root
        p = pos
        size = 1 << self._depth
        while size > 0:
            size //= 2
            idx = p.div(size).idx() if size > 0 else p.idx()
            p = p.mod(size) if size > 0 else p
            child = self.octants[it].children[idx]
            if child is None:
                return None
            if child[0] == _OCTANT:
                it = child[1]
            else:
                return LeafId(it, idx)
        return None

    # -- structure ops -------------------------------------------------------

    def expand(self, by: int) -> None:
        """Wrap the root in ``by`` new parents (root lands in child slot 0).
        Reference: src/world/hds/octree.rs:311-324."""
        for _ in range(by):
            new_root = self._new_octant(None)
            if self.root is not None:
                self.octants[self.root].parent = new_root
                self.octants[new_root].set_child(0, (_OCTANT, self.root))
            self.root = new_root
        self._depth += by

    def expand_to(self, to: int) -> None:
        if self._depth >= to:
            return
        self.expand(to - self._depth)

    def compact(self) -> None:
        """Prune empty octants depth-first. Reference: octree.rs:341-376."""
        if self.root is None:
            return
        self._compact_octant(self.root)
        if self.octants[self.root].children_count != 0:
            return
        self.reset()

    def _compact_octant(self, octant_id: int) -> None:
        for i in range(8):
            child = self.octants[octant_id].children[i]
            if child is None or child[0] != _OCTANT:
                continue
            cid = child[1]
            self._compact_octant(cid)
            if self.octants[cid].children_count == 0:
                self._delete_octant(cid)
                # _delete_octant already detaches from parent

    # -- internal ------------------------------------------------------------

    def _step_into_or_create(self, it: int, idx: int) -> int:
        child = self.octants[it].children[idx]
        if child is None:
            nxt = self._new_octant(it)
            self.octants[it].set_child(idx, (_OCTANT, nxt))
            return nxt
        if child[0] == _OCTANT:
            return child[1]
        raise AssertionError("found unexpected leaf")

    def _new_octant(self, parent: Optional[int]) -> int:
        if self.free_list:
            free_id = self.free_list.pop()
            self.octants[free_id].parent = parent
            return free_id
        self.octants.append(Octant(parent))
        return len(self.octants) - 1

    def _delete_octant(self, oid: int) -> None:
        octant = self.octants[oid]
        parent = octant.parent
        if parent is not None:
            pchildren = self.octants[parent].children
            for i in range(8):
                c = pchildren[i]
                if c is not None and c[0] == _OCTANT and c[1] == oid:
                    self.octants[parent].set_child(i, None)
                    break
        octant.parent = None
        octant.children_count = 0
        octant.children = [None] * 8
        self.free_list.append(oid)

    # -- iteration helpers ----------------------------------------------------

    def iter_leaves(self) -> Iterable[tuple[LeafId, Any]]:
        """Yield (LeafId, value) for every leaf (DFS in idx order)."""
        if self.root is None:
            return
        stack = [self.root]
        while stack:
            oid = stack.pop()
            for i in range(8):
                c = self.octants[oid].children[i]
                if c is None:
                    continue
                if c[0] == _OCTANT:
                    stack.append(c[1])
                else:
                    yield LeafId(oid, i), c[1]


def pick_leaf_for_lod(octree: Octree, octant: Octant) -> Any:
    """Pick a representative leaf for LOD truncation, breadth-first with a
    y-high-first child order for nicer terrain LOD.
    Reference: src/world/hds/internal.rs:461-485."""
    order = (2, 3, 6, 7, 0, 1, 4, 5)
    for i in order:
        c = octant.children[i]
        if c is not None and c[0] == _LEAF:
            return c[1]
    for i in order:
        c = octant.children[i]
        if c is None or c[0] != _OCTANT:
            continue
        result = pick_leaf_for_lod(octree, octree.octants[c[1]])
        if result is not None:
            return result
    return None
