"""Minecraft Anvil world reader: region files + NBT + palette decoding.

Pure-Python/numpy implementation of the `.mca` import the reference gets
from the fastanvil/fastnbt crates (reference: src/systems/storage.rs:58-160).
Supports the modern (1.18+, root "sections"/"block_states") and legacy
("Level"→"Sections") layouts, and both 1.16+ non-spanning and pre-1.16
spanning long packing.

Engine mapping (same as the reference): one 32³ engine chunk at (cx,cy,cz)
covers MC chunks (2cx..2cx+1, 2cz..2cz+1) and world y ∈ [32cy, 32cy+32);
block names map onto the engine's block ids.
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Optional

import numpy as np

from ..gamelogic import content

# -- NBT ------------------------------------------------------------------------

TAG_END, TAG_BYTE, TAG_SHORT, TAG_INT, TAG_LONG = 0, 1, 2, 3, 4
TAG_FLOAT, TAG_DOUBLE, TAG_BYTE_ARRAY, TAG_STRING = 5, 6, 7, 8
TAG_LIST, TAG_COMPOUND, TAG_INT_ARRAY, TAG_LONG_ARRAY = 9, 10, 11, 12


class _NbtReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def u8(self):
        v = self.data[self.pos]
        self.pos += 1
        return v

    def _unpack(self, fmt: str, size: int):
        v = struct.unpack_from(fmt, self.data, self.pos)[0]
        self.pos += size
        return v

    def string(self) -> str:
        n = self._unpack(">H", 2)
        s = self.data[self.pos : self.pos + n].decode("utf-8", "replace")
        self.pos += n
        return s

    def payload(self, tag: int):
        if tag == TAG_BYTE:
            return self._unpack(">b", 1)
        if tag == TAG_SHORT:
            return self._unpack(">h", 2)
        if tag == TAG_INT:
            return self._unpack(">i", 4)
        if tag == TAG_LONG:
            return self._unpack(">q", 8)
        if tag == TAG_FLOAT:
            return self._unpack(">f", 4)
        if tag == TAG_DOUBLE:
            return self._unpack(">d", 8)
        if tag == TAG_BYTE_ARRAY:
            n = self._unpack(">i", 4)
            v = np.frombuffer(self.data, np.int8, n, self.pos)
            self.pos += n
            return v
        if tag == TAG_STRING:
            return self.string()
        if tag == TAG_LIST:
            etag = self.u8()
            n = self._unpack(">i", 4)
            return [self.payload(etag) for _ in range(n)]
        if tag == TAG_COMPOUND:
            out = {}
            while True:
                t = self.u8()
                if t == TAG_END:
                    return out
                name = self.string()
                out[name] = self.payload(t)
        if tag == TAG_INT_ARRAY:
            n = self._unpack(">i", 4)
            v = np.frombuffer(self.data, ">i4", n, self.pos)
            self.pos += 4 * n
            return v
        if tag == TAG_LONG_ARRAY:
            n = self._unpack(">i", 4)
            v = np.frombuffer(self.data, ">i8", n, self.pos)
            self.pos += 8 * n
            return v
        raise ValueError(f"unknown NBT tag {tag}")


def parse_nbt(data: bytes) -> dict:
    r = _NbtReader(data)
    tag = r.u8()
    assert tag == TAG_COMPOUND, tag
    r.string()  # root name
    return r.payload(TAG_COMPOUND)


# -- block-name mapping (reference: storage.rs:126-153) -----------------------

_NAME_TABLE = {
    "minecraft:dirt": content.DIRT,
    "minecraft:grass_block": content.GRASS,
    "minecraft:gravel": content.GRAVEL,
    "minecraft:clay": content.GRAVEL,
    "minecraft:sand": content.SAND,
    "minecraft:sandstone": content.SAND,
    "minecraft:water": content.WATER,
    "minecraft:stone": content.STONE,
    "minecraft:andesite": content.STONE,
    "minecraft:diorite": content.STONE,
    "minecraft:deepslate": content.STONE,
    "minecraft:tuff": content.STONE,
    "minecraft:granite": content.STONE,
    "minecraft:cobblestone": content.COBBLESTONE,
}


def map_block_name(name: str) -> int:
    if "_ore" in name:
        return content.AIR
    if "_leaves" in name:
        return content.OAK_LEAVES
    if "_log" in name:
        return content.OAK_LOG
    if "_planks" in name:
        return content.OAK_PLANKS
    return _NAME_TABLE.get(name, content.AIR)


# -- packed palette-index decoding -----------------------------------------------


def decode_packed_indices(longs: np.ndarray, bits: int, count: int = 4096) -> np.ndarray:
    """Decode ``count`` palette indices of ``bits`` width from int64 data.
    Handles both 1.16+ per-long packing and pre-1.16 bit-spanning."""
    u = longs.astype(np.uint64)
    per_long = 64 // bits
    if len(u) >= (count + per_long - 1) // per_long and len(u) * per_long >= count:
        # non-spanning: indices never cross long boundaries
        shifts = (np.arange(per_long, dtype=np.uint64) * np.uint64(bits))[None, :]
        vals = (u[:, None] >> shifts) & np.uint64((1 << bits) - 1)
        return vals.reshape(-1)[:count].astype(np.uint16)
    # spanning: contiguous bit stream, little-endian within each long
    bytes_le = u.astype("<u8").view(np.uint8)
    bit_arr = np.unpackbits(bytes_le, bitorder="little")
    take = bit_arr[: count * bits].reshape(count, bits).astype(np.uint16)
    return (take << np.arange(bits, dtype=np.uint16)).sum(axis=1, dtype=np.uint16)


# -- region + chunk access ----------------------------------------------------------


class AnvilWorld:
    """Preloads all region files in a directory and serves engine chunks."""

    def __init__(self, region_dir: str):
        self._sections: dict[tuple[int, int], dict[int, np.ndarray]] = {}
        self._raw: dict[tuple[int, int], bytes] = {}
        for fname in sorted(os.listdir(region_dir)):
            parts = fname.split(".")
            if len(parts) != 4 or parts[0] != "r" or parts[3] != "mca":
                continue
            rx, rz = int(parts[1]), int(parts[2])
            self._load_region(os.path.join(region_dir, fname), rx, rz)
        print(f"anvil: indexed {len(self._raw)} chunk columns from {region_dir}")

    def _load_region(self, path: str, rx: int, rz: int) -> None:
        with open(path, "rb") as f:
            data = f.read()
        if len(data) < 8192:
            return
        for i in range(1024):
            off = struct.unpack_from(">I", data, i * 4)[0]
            sectors = off & 0xFF
            sector_off = off >> 8
            if sectors == 0:
                continue
            base = sector_off * 4096
            if base + 5 > len(data):
                continue
            length = struct.unpack_from(">I", data, base)[0]
            comp = data[base + 4]
            blob = data[base + 5 : base + 4 + length]
            if comp == 2:
                raw = zlib.decompress(blob)
            elif comp == 1:
                import gzip

                raw = gzip.decompress(blob)
            elif comp == 3:
                raw = blob
            else:
                continue
            cx = rx * 32 + (i & 31)
            cz = rz * 32 + (i >> 5)
            self._raw[(cx, cz)] = raw

    # -- section decoding (lazy, cached) -------------------------------------

    def _column_sections(self, cx: int, cz: int) -> Optional[dict[int, np.ndarray]]:
        key = (cx, cz)
        if key in self._sections:
            return self._sections[key]
        raw = self._raw.get(key)
        if raw is None:
            return None
        root = parse_nbt(raw)
        sections = root.get("sections")
        if sections is None:
            sections = root.get("Level", {}).get("Sections", [])
        out: dict[int, np.ndarray] = {}
        for sec in sections:
            arr = self._decode_section(sec)
            if arr is not None:
                out[int(sec["Y"])] = arr
        self._sections[key] = out
        return out

    @staticmethod
    def _decode_section(sec: dict) -> Optional[np.ndarray]:
        """Section -> (16,16,16) uint32 block ids indexed [x, y, z]."""
        bs = sec.get("block_states")
        if bs is not None:
            palette = bs.get("palette")
            data = bs.get("data")
        else:
            palette = sec.get("Palette")
            data = sec.get("BlockStates")
        if palette is None:
            return None
        ids = np.array([map_block_name(p["Name"]) for p in palette], np.uint32)
        if data is None or len(palette) == 1:
            if ids[0] == 0:
                return None
            return np.full((16, 16, 16), ids[0], np.uint32)
        bits = max(4, (len(palette) - 1).bit_length())
        idx = decode_packed_indices(np.asarray(data), bits)
        blocks = ids[np.clip(idx, 0, len(ids) - 1)]
        # NBT order is y,z,x; ours is [x,y,z]
        return blocks.reshape(16, 16, 16).transpose(2, 0, 1).copy()

    # -- engine chunk assembly ----------------------------------------------------

    def read_chunk_voxels(self, cx: int, cy: int, cz: int) -> Optional[np.ndarray]:
        """32³ engine chunk voxels at engine chunk pos, or None if empty."""
        vox = np.zeros((32, 32, 32), np.uint32)
        any_data = False
        for dx in range(2):
            for dz in range(2):
                col = self._column_sections(cx * 2 + dx, cz * 2 + dz)
                if col is None:
                    continue
                for dy in range(2):
                    sy = cy * 2 + dy
                    sec = col.get(sy)
                    if sec is None:
                        continue
                    vox[
                        dx * 16 : dx * 16 + 16,
                        dy * 16 : dy * 16 + 16,
                        dz * 16 : dz * 16 + 16,
                    ] = sec
                    any_data = True
        if not any_data or not vox.any():
            return None
        return vox

    def column_exists(self, cx: int, cz: int) -> bool:
        return (cx * 2, cz * 2) in self._raw or (cx * 2 + 1, cz * 2 + 1) in self._raw
