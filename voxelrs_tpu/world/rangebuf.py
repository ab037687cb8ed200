"""RangeBuffer — the SVO mega-buffer allocator.

Tracks which byte/word ranges of a linear buffer belong to which id, reuses
freed ranges first-fit, merges adjacent free ranges, and records updated
ranges so only deltas are copied to the device each frame.
Mirrors reference: src/world/hds/internal.rs:150-277.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class Range:
    start: int
    length: int


def merge_ranges(ranges: list[Range]) -> list[Range]:
    """Sort by start and merge adjacent/overlapping ranges in place."""
    ranges.sort(key=lambda r: r.start)
    i = 1
    while i < len(ranges):
        lhs = ranges[i - 1]
        rhs = ranges[i]
        if rhs.start <= lhs.start + lhs.length:
            diff = lhs.start + lhs.length - rhs.start
            if rhs.length > diff:
                ranges[i - 1] = Range(lhs.start, lhs.length + rhs.length - diff)
            ranges.pop(i)
        else:
            i += 1
    return ranges


class RangeBuffer:
    """Linear typed buffer with id→range bookkeeping.

    ``data`` grows only; removal marks ranges free. ``updated_ranges``
    accumulates ranges that changed since the last reset — the delta-upload
    set for the device buffer.
    """

    def __init__(self, capacity: int = 0, dtype=np.uint32) -> None:
        self.dtype = np.dtype(dtype)
        self.data = np.zeros(capacity, dtype=self.dtype)
        self.size = capacity  # number of valid elements in data
        self.free_ranges: list[Range] = []
        self.updated_ranges: list[Range] = []
        self.id_to_range: dict[int, Range] = {}
        if capacity > 0:
            self.free_ranges.append(Range(0, capacity))

    def clear(self) -> None:
        self.free_ranges = [Range(0, len(self.data))] if len(self.data) else []
        self.size = len(self.data)
        self.updated_ranges.clear()
        self.id_to_range.clear()

    def insert(self, id_: int, buf: np.ndarray) -> int:
        """Copy ``buf`` into the first fitting free range (or append at the
        end). Returns the element offset the data landed at."""
        self.remove(id_)

        length = len(buf)
        ptr = self.size

        fit = next(
            (i for i, r in enumerate(self.free_ranges) if length <= r.length), None
        )
        if fit is not None:
            r = self.free_ranges[fit]
            ptr = r.start
            if length < r.length:
                self.free_ranges[fit] = Range(r.start + length, r.length - length)
            else:
                self.free_ranges.pop(fit)
            self.data[ptr : ptr + length] = buf
        else:
            if self.size + length > len(self.data):
                new_cap = max(len(self.data) * 2, self.size + length, 1024)
                grown = np.zeros(new_cap, dtype=self.dtype)
                grown[: self.size] = self.data[: self.size]
                self.data = grown
            self.data[self.size : self.size + length] = buf
            self.size += length

        self.id_to_range[id_] = Range(ptr, length)
        self.updated_ranges.append(Range(ptr, length))
        merge_ranges(self.updated_ranges)
        return ptr

    def remove(self, id_: int) -> None:
        r = self.id_to_range.pop(id_, None)
        if r is None:
            return
        self.free_ranges.append(r)
        merge_ranges(self.free_ranges)

    def size_in_bytes(self) -> int:
        return self.size * self.dtype.itemsize
