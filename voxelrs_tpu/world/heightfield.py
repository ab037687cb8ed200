"""Conservative terrain upper envelope for the beam pre-pass.

The renderer's beam pre-pass (ops/beams.py) needs, per (x,z) column of the
SVO coordinate space, a height H such that *no geometry anywhere in the
column pokes above H*. Tile beams then ray-march this 2D envelope (a
max-pyramid DDA) instead of the full SVO to find a conservative per-tile
entry distance — see docs/PERF.md. This file owns the host-side envelope:
per-chunk column tops computed in the serializer's background threads, a
world-sized (4·Gc)² column map assembled from them, the 3×3 dilated copy
the beams actually test (it absorbs ±1 cell of beam-cone deviation), and
the max-pyramid uploaded to the device.

This is a TPU-side acceleration structure with no reference counterpart
(the reference traces every ray from the root; reference:
src/graphics/svo.rs renders with no pre-pass). Conservativeness is the only
correctness requirement — a too-LOW envelope would pop geometry, a too-high
one only costs speed — and is covered by tests/test_beams.py.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

# One envelope column covers an 8x8-voxel footprint: 4x4 columns per chunk.
CELL = 8
COLS_PER_CHUNK = 32 // CELL  # 4


def chunk_voxel_tops(voxels: np.ndarray, lod: int = 0) -> np.ndarray:
    """(32,32) int16 per-VOXEL-column geometry tops for one chunk (0 =
    empty), LOD-rounded like ``chunk_column_tops``. Feeds the sun
    visibility map (shadow-ray elision needs voxel resolution — the 8-voxel
    envelope columns quantize slopes away)."""
    assert voxels.shape == (32, 32, 32)
    b = 1 << (5 - lod) if 1 <= lod <= 5 else 1
    occ = voxels.reshape(32 // b, b, 32 // b, b, 32 // b, b) != 0
    occ = occ.any(axis=(1, 3, 5))
    nb = occ.shape[0]
    ys = (np.arange(nb, dtype=np.int16) + 1) * b
    top_b = (occ * ys[None, :, None]).max(axis=1).astype(np.int16)
    if b == 1:
        return top_b
    return np.repeat(np.repeat(top_b, b, axis=0), b, axis=1)


def chunk_solid_bases(voxels: np.ndarray, lod: int = 0,
                      opaque: Optional[np.ndarray] = None) -> np.ndarray:
    """(32,32) int16 per-voxel-column CONTIGUOUS OPAQUE run height from the
    chunk's bottom (y=0): the column is provably solid-opaque for
    y in [0, run). Feeds the certainly-blocked half of the sun map — a sun
    ray proven to pass below a column's world run top must hit.

    ``opaque`` is a bool LUT over block values (None = any nonzero).
    LOD-conservative: at LOD L a rendered 2^(5-L) block counts toward the
    run only when EVERY source voxel in it is opaque (then whatever
    representative pick_leaf chooses renders opaque); partially-solid
    blocks render MORE geometry than the source, so under-counting them
    only loses coverage, never soundness."""
    assert voxels.shape == (32, 32, 32)
    b = 1 << (5 - lod) if 1 <= lod <= 5 else 1
    op = (voxels != 0) if opaque is None else opaque[voxels]
    blocks = op.reshape(32 // b, b, 32 // b, b, 32 // b, b).all(axis=(1, 3, 5))
    run_b = np.cumprod(blocks, axis=1).sum(axis=1)  # (nbx, nbz) blocks
    run = (run_b * b).astype(np.int16)
    if b == 1:
        return run
    return np.repeat(np.repeat(run, b, axis=0), b, axis=1)


def opaque_lut_from_mask(translucent_block_mask: int) -> np.ndarray:
    """(256,) bool LUT from graphics.Svo.translucent_block_mask: True for
    block values the renderer treats as fully opaque (bit 63 = overflow
    values, always translucent there, always non-opaque here)."""
    lut = np.zeros(256, bool)
    for v in range(1, 63):
        lut[v] = not (translucent_block_mask >> v) & 1
    return lut


def chunk_column_tops(voxels: np.ndarray, lod: int = 0) -> np.ndarray:
    """(4,4) int16 map of per-column geometry tops for one chunk.

    ``tops[cx, cz]`` is one past the highest voxel y that RENDERS in the
    8x8-voxel column footprint (0 = column empty). LOD-aware: a chunk
    serialized at ``lod`` L renders whole 2^(5-L) blocks when any voxel in
    the block is set (world/esvo_dense.py pick-leaf semantics), so tops are
    rounded UP to block granularity — the envelope must cover the rendered
    geometry, not the source voxels.
    """
    assert voxels.shape == (32, 32, 32)
    b = 1 << (5 - lod) if 1 <= lod <= 5 else 1
    occ = voxels.reshape(32 // b, b, 32 // b, b, 32 // b, b) != 0
    occ = occ.any(axis=(1, 3, 5))  # (nb, nb, nb) block occupancy, [x, y, z]
    nb = occ.shape[0]
    # top of the highest occupied block, in voxels (0 if none)
    ys = (np.arange(nb, dtype=np.int16) + 1) * b
    top_b = (occ * ys[None, :, None]).max(axis=1).astype(np.int16)  # (nb, nb)
    if b <= CELL:
        f = CELL // b  # blocks per column footprint
        return top_b.reshape(COLS_PER_CHUNK, f, COLS_PER_CHUNK, f).max(axis=(1, 3))
    # block wider than a column: every covered column inherits the block top
    r = b // CELL
    return np.repeat(np.repeat(top_b, r, axis=0), r, axis=1)


def _enc_int(a: np.ndarray) -> np.ndarray:
    """u16 quarter-voxel encoding (value = raw*0.25 - 1) of an INTEGER-
    valued plane — (v+1)*4 is an exact f32 product for any world height,
    so no rounding direction is needed."""
    return ((a + np.float32(1.0)) * np.float32(4.0)).astype(np.uint16)


def _enc_up(a: np.ndarray) -> np.ndarray:
    """Conservative-UP u16 quarter encoding of a float plane: the decoded
    value is >= the source (the 1e-3 nudge absorbs f32 product rounding),
    for thresholds that gate LIT claims (kill more when in doubt)."""
    q = np.ceil((a + np.float32(1.0)) * np.float32(4.0) + np.float32(1e-3))
    return np.clip(q, 0.0, 65535.0).astype(np.uint16)


def _enc_dn(a: np.ndarray) -> np.ndarray:
    """Conservative-DOWN u16 quarter encoding (decoded <= source), for
    bounds that gate BLOCKED claims (claim less when in doubt)."""
    q = np.floor((a + np.float32(1.0)) * np.float32(4.0) - np.float32(1e-3))
    return np.clip(q, 0.0, 65535.0).astype(np.uint16)


class HeightField:
    """World-space column-top envelope over the SVO coordinate space.

    Incrementally maintained from per-chunk ``chunk_column_tops`` maps keyed
    by the chunk's SVO-space position; ``device()`` returns the dilated
    max-pyramid ready for ops/beams.py (rebuilt lazily after changes — the
    whole pyramid is ~100 KB, a full rebuild is cheaper than delta
    plumbing).
    """

    # sun-map window: the per-voxel certificate table covers at most this
    # many voxel columns per axis, centered on the camera; worlds that fit
    # get full coverage, larger worlds get a sliding window (out-of-window
    # shadow rays simply trace — no soundness impact)
    SUN_WINDOW = 1024
    SUN_COOLDOWN = 0.75  # s: don't rebuild the sun map while streaming
    # build the table on a worker thread (the streaming engine enables
    # this: a ~seconds host build must not stall a frame); synchronous by
    # default so tests and static scenes get the map on the first call
    sun_async = False

    def __init__(self) -> None:
        self._tops: dict[tuple[int, int, int], np.ndarray] = {}
        self._vtops: dict[tuple[int, int, int], np.ndarray] = {}
        self._sbase: dict[tuple[int, int, int], np.ndarray] = {}
        # (cx, cz) -> chunk positions stacked in that column
        self._cols: dict[tuple[int, int], set] = {}
        self._n = 0  # columns per axis (4 * chunks per axis)
        self._H: Optional[np.ndarray] = None  # (n, n) int16, exact envelope
        self._dirty = True
        self._device: Optional[tuple] = None
        self._version = 0
        self._sun: Optional[tuple] = None  # (version, key, origin, dev, ...)
        self._sun_last_build = -1e9
        self._sun_thread = None  # async build single-flight
        self._sun_pending: Optional[tuple] = None  # (version, built)
        self._sun_quiet = (-1, -1e9)  # (version, first seen at)

    # -- host maintenance --------------------------------------------------

    def _ensure_size(self, n: int) -> None:
        if n <= self._n:
            return
        old, old_n = self._H, self._n
        self._n = n
        self._H = np.zeros((n, n), np.int16)
        if old is not None:
            self._H[:old_n, :old_n] = old
        self._dirty = True

    def reserve(self, chunks_per_axis: int) -> None:
        """Pre-size the envelope for a known chunk span (the streaming
        engine's shifted window is bounded by the render distance): the
        beam pyramid's array shapes are a function of ``_n``, so growing
        it mid-play recompiles the beam-march programs (measured 5-12 s
        frames at pow2 span crossings over the remote-compile tunnel).
        One upfront reservation keeps the shapes constant for the whole
        session."""
        self._ensure_size(self._required_n((chunks_per_axis - 1, 0,
                                            chunks_per_axis - 1)))

    def set_chunk(self, pos: tuple[int, int, int], tops: np.ndarray,
                  vtops: Optional[np.ndarray] = None,
                  sbase: Optional[np.ndarray] = None) -> None:
        """Insert/replace the (4,4) top map (and optional (32,32) voxel
        top / solid-base maps) of the chunk at SVO chunk position ``pos``
        and refresh its envelope columns."""
        self._tops[pos] = tops
        if vtops is not None:
            self._vtops[pos] = vtops
        else:
            self._vtops.pop(pos, None)
        if sbase is not None:
            self._sbase[pos] = sbase
        else:
            self._sbase.pop(pos, None)
        self._cols.setdefault((pos[0], pos[2]), set()).add(pos)
        self._ensure_size(self._required_n(pos))
        self._refresh_cols(pos[0], pos[2])

    def remove_chunk(self, pos: tuple[int, int, int], expect=None) -> None:
        """Remove the chunk at ``pos``. When ``expect`` is given, only
        remove if the stored top map IS that object — a chunk whose SVO
        slot was overridden by a shift must not clear its successor."""
        cur = self._tops.get(pos)
        if cur is None or (expect is not None and cur is not expect):
            return
        del self._tops[pos]
        self._vtops.pop(pos, None)
        self._sbase.pop(pos, None)
        col = self._cols.get((pos[0], pos[2]))
        if col is not None:
            col.discard(pos)
        self._refresh_cols(pos[0], pos[2])

    def clear(self) -> None:
        self._tops.clear()
        self._vtops.clear()
        self._sbase.clear()
        self._cols.clear()
        if self._H is not None:
            self._H[:] = 0
        self._dirty = True
        self._version += 1

    def rebuild(self, chunks: dict[tuple[int, int, int], np.ndarray],
                vchunks: Optional[dict] = None,
                schunks: Optional[dict] = None) -> None:
        """Replace the whole envelope (chunk shift / coord-space change)."""
        self._tops = dict(chunks)
        self._vtops = dict(vchunks) if vchunks is not None else {}
        self._sbase = dict(schunks) if schunks is not None else {}
        self._cols = {}
        for pos in self._tops:
            self._cols.setdefault((pos[0], pos[2]), set()).add(pos)
        self._n = 0
        self._H = None
        for pos in self._tops:
            self._ensure_size(self._required_n(pos))
        if self._H is None:
            self._H = np.zeros((0, 0), np.int16)
        cols = {(p[0], p[2]) for p in self._tops}
        for cx, cz in cols:
            self._refresh_cols(cx, cz)
        self._dirty = True

    @staticmethod
    def _required_n(pos: tuple[int, int, int]) -> int:
        # the envelope is an (x, z) map: only those axes size the grid
        # (a tall chunk stack must not inflate it quadratically)
        span = max(pos[0], pos[2]) + 1  # chunks needed per axis
        p = 1
        while p < span:
            p <<= 1
        return p * COLS_PER_CHUNK

    def _refresh_cols(self, cx: int, cz: int) -> None:
        """Recompute the 4x4 envelope columns under chunk column (cx, cz)
        as the max over that column's loaded chunk stack."""
        acc = np.zeros((COLS_PER_CHUNK, COLS_PER_CHUNK), np.int32)
        stack = sorted(self._cols.get((cx, cz), ()), key=lambda p: p[1])
        for pos in stack:
            t = self._tops[pos].astype(np.int32)
            acc = np.maximum(acc, np.where(t > 0, t + pos[1] * 32, 0))
        x0, z0 = cx * COLS_PER_CHUNK, cz * COLS_PER_CHUNK
        self._H[x0 : x0 + COLS_PER_CHUNK, z0 : z0 + COLS_PER_CHUNK] = acc.astype(
            np.int16
        )
        self._dirty = True
        self._version += 1

    def _stack_column(self, cx: int, cz: int, src=None):
        """(vox_tops, run_top, run_bottom) (32,32) int32 world-height maps
        of chunk column (cx, cz), combined over its loaded chunk stack.

        run_top/run_bottom track the topmost contiguous opaque run per
        voxel column — the "skin" a certainly-blocked claim must pierce: a
        chunk whose solid base meets the current run top extends it; a
        chunk starting a fresh run replaces it (higher chunks always win).
        Missing chunks / missing solid info break continuity."""
        cols, vtops, sbase = (src if src is not None
                              else (self._cols, self._vtops, self._sbase))
        acc1 = np.zeros((32, 32), np.int32)
        accb = np.zeros((32, 32), np.int32)
        accb_bot = np.zeros((32, 32), np.int32)
        for pos in sorted(cols.get((cx, cz), ()), key=lambda p: p[1]):
            v = vtops.get(pos)
            if v is not None:
                v = v.astype(np.int32)
                acc1 = np.maximum(acc1, np.where(v > 0, v + pos[1] * 32, 0))
            sb = sbase.get(pos)
            if sb is not None:
                base_y = pos[1] * 32
                sbi = sb.astype(np.int32)
                cont = (accb == base_y) & (sbi > 0)
                start = ~cont & (sbi > 0)
                accb = np.where(cont | start, base_y + sbi, accb)
                accb_bot = np.where(start, base_y, accb_bot)
        return acc1, accb, accb_bot

    def _window_fields(self, ox: int, oz: int, nx: int, nz: int, src=None):
        """Assemble (vox_tops, run_top, run_bottom) float32 (nx, nz) maps
        for the voxel window [ox, ox+nx) x [oz, oz+nz) from the per-chunk
        dicts. ``ox``/``oz`` are voxel coordinates aligned to 32 (may be
        negative for sun-direction extensions past the world origin).
        Columns with no loaded chunks — outside the world grid or simply
        not streamed in — are truly empty FOR THE TRACE (the SVO renders
        loaded chunks only), so they correctly read 0."""
        h1 = np.zeros((nx, nz), np.float32)
        b1 = np.zeros((nx, nz), np.float32)
        bb1 = np.zeros((nx, nz), np.float32)
        cols = src[0] if src is not None else self._cols
        c0x, c1x = ox >> 5, (ox + nx - 1) >> 5
        c0z, c1z = oz >> 5, (oz + nz - 1) >> 5
        for (cx, cz) in cols:
            if not (c0x <= cx <= c1x and c0z <= cz <= c1z):
                continue
            a1, ab, abb = self._stack_column(cx, cz, src)
            xs = cx * 32 - ox
            zs = cz * 32 - oz
            x0, x1 = max(0, xs), min(nx, xs + 32)
            z0, z1 = max(0, zs), min(nz, zs + 32)
            if x0 >= x1 or z0 >= z1:
                continue
            sl = np.s_[x0 - xs : x1 - xs, z0 - zs : z1 - zs]
            h1[x0:x1, z0:z1] = a1[sl]
            b1[x0:x1, z0:z1] = ab[sl]
            bb1[x0:x1, z0:z1] = abb[sl]
        return h1, b1, bb1

    # -- device pyramid ----------------------------------------------------

    def exact(self) -> Optional[np.ndarray]:
        return self._H

    def near_window(self, ccx: int, ccz: int, r: int = 2) -> np.ndarray:
        """(2r+1, 2r+1) EXACT envelope window around column (ccx, ccz),
        clamped at the borders (outside = 0), for the near-field tests."""
        n = self._n
        out = np.zeros((2 * r + 1, 2 * r + 1), np.int32)
        if self._H is None or n == 0:
            return out
        for i in range(2 * r + 1):
            for j in range(2 * r + 1):
                x, z = ccx - r + i, ccz - r + j
                if 0 <= x < n and 0 <= z < n:
                    out[i, j] = int(self._H[x, z])
        return out

    def device(self):
        """(levels_concat (R,) i32 jnp, offsets tuple, n, h_max, bounds) —
        the 3x3 dilated envelope and its max-pyramid, row-major x*n+z per
        level; ``bounds`` = (x0, x1, z0, z1) occupied-column extent in
        VOXELS (half-open) for the beam kernel's per-tile hard stop. None
        when the field is empty."""
        if self._H is None or self._n == 0:
            return None
        if not self._dirty and self._device is not None:
            return self._device
        import jax.numpy as jnp

        h = self._H.astype(np.int32)
        nz = np.nonzero(h)
        if len(nz[0]):
            bounds = np.array(
                [nz[0].min() * CELL, (nz[0].max() + 1) * CELL,
                 nz[1].min() * CELL, (nz[1].max() + 1) * CELL], np.float32)
        else:
            bounds = np.zeros(4, np.float32)
        # 3x3 max dilation (edge-clamped): absorbs one column of beam-cone
        # deviation — see ops/beams.py validity clamp
        p = np.pad(h, 1, mode="edge")
        d = h
        for dx in (0, 1, 2):
            for dz in (0, 1, 2):
                d = np.maximum(d, p[dx : dx + self._n, dz : dz + self._n])
        def pyramid(base):
            levels = [base]
            while levels[-1].shape[0] > 1:
                m = levels[-1]
                k = m.shape[0] // 2
                levels.append(m.reshape(k, 2, k, 2).max(axis=(1, 3)))
            offsets, flat, off = [], [], 0
            for m in levels:
                offsets.append(off)
                flat.append(m.reshape(-1))
                off += m.size
            return jnp.asarray(np.concatenate(flat)), tuple(offsets)

        lv_d, offsets = pyramid(d)
        lv_e, _ = pyramid(h)  # exact pyramid: per-ray shadow marches
        self._device = (
            lv_d,
            offsets,
            self._n,
            int(h.max()) if h.size else 0,
            bounds,
            lv_e,
        )
        self._dirty = False
        return self._device

    # -- sun visibility map ------------------------------------------------

    def sun_map(self, light_dir, center=None):
        """Per-VOXEL-column sun visibility certificates over a (possibly
        camera-centered) window: conservative precomputed equivalents of
        marching every shadow ray over the voxel-top field, built fresh
        from the per-chunk dicts each (cooldown-gated) rebuild.

        Returns (SB_dev (n1*n1, 1+75+2K) u16, n1, d_len, d, origin) or
        None when unavailable: missing voxel tops, sun too low, or rebuilt
        too recently (streaming cooldown — a stale map is UNSOUND, so
        changes disable it until the world goes quiet). Rows are u16
        quarter-voxel fixed point (value = raw * 0.25 - 1), each plane
        rounded toward its conservative side; integer-valued planes encode
        exactly. Row layout: [S_far, 25 near voxel tops, 25 near run tops,
        25 near run bottoms, K band los, K band his]; the near planes are
        the 5x5 neighborhood in (dx,dz) row-major order for the verdict
        kernel's exact window tests. ``d_len`` bounds the distance of any
        band-claimed blocker; ``d`` is the unit direction toward the sun;
        ``origin`` is the window's (x, z) voxel offset — rays originating
        outside the window get no claims and simply trace. Worlds up to
        SUN_WINDOW voxels per axis are fully covered at origin 0."""
        import time as _time

        pending = self._sun_pending
        if pending is not None:  # a finished async build attaches here
            self._sun_pending = None
            ver, built = pending
            if ver == self._version:  # stale builds are UNSOUND: discard
                self._attach_sun(ver, built)
        if self._n == 0 or len(self._vtops) != len(self._tops):
            return None
        d = -np.asarray(light_dir, np.float64)
        d = d / max(np.linalg.norm(d), 1e-9)
        if d[1] < 0.1:
            return None  # sun at/below the horizon: nothing elidable
        # exact-direction key: the verdict kernel tests the BUILD-time d
        # while the trace walks the caller's direction — any difference
        # voids the verdict==trace contract, so close-but-unequal suns
        # rebuild (cooldown-gated) instead of reusing
        key = tuple(d.astype(np.float32))

        # window geometry: worlds that fit SUN_WINDOW get full coverage at
        # origin 0; larger worlds get a 32-aligned window centered on the
        # camera, re-centered (cooldown-gated) when it drifts past the
        # window's inner half
        span = self._n * CELL
        n1 = min(span, self.SUN_WINDOW)
        if n1 >= span:
            origin = (0, 0)
        else:
            if center is not None:
                cx_c, cz_c = float(center[0]), float(center[2])
            else:
                nz = np.nonzero(self._H)
                cx_c = (float(nz[0].mean()) + 0.5) * CELL if len(nz[0]) \
                    else span / 2
                cz_c = (float(nz[1].mean()) + 0.5) * CELL if len(nz[0]) \
                    else span / 2
            ox = int(np.clip(((cx_c - n1 / 2) // 32) * 32, 0, span - n1))
            oz = int(np.clip(((cz_c - n1 / 2) // 32) * 32, 0, span - n1))
            origin = (ox, oz)
        if self._sun is not None and self._sun[0] == self._version \
                and self._sun[1] == key:
            c_ox, c_oz = self._sun[2]
            drift = max(abs(origin[0] - c_ox), abs(origin[1] - c_oz))
            if drift <= n1 // 4:
                return self._sun[3:]
        now = _time.monotonic()
        if now - self._sun_last_build < self.SUN_COOLDOWN:
            return None
        if not self.sun_async:
            built = self._sun_build(d, key, origin, n1, self._H,
                                    (self._cols, self._vtops, self._sbase))
            self._attach_sun(self._version, built)
            self._sun_last_build = _time.monotonic()
            return self._sun[3:]
        # quiet gate (async only): while chunks stream in, every build
        # would be version-stale by the time it finishes and its attach
        # discarded — only start once the world has been unchanged for a
        # full cooldown
        if self._sun_quiet[0] != self._version:
            self._sun_quiet = (self._version, now)
            return None
        if now - self._sun_quiet[1] < self.SUN_COOLDOWN:
            return None
        # async single-flight: snapshot the chunk dicts (values are
        # immutable-by-convention arrays; set_chunk replaces, never
        # mutates) and build on a worker thread — frames render without
        # elision until the finished table attaches on a later call.
        # Device conversion stays on the MAIN thread (_attach_sun): the
        # axon tunnel client is not assumed thread-safe.
        if self._sun_thread is None or not self._sun_thread.is_alive():
            import threading

            snap_version = self._version
            snap = ({k: set(v) for k, v in self._cols.items()},
                    dict(self._vtops), dict(self._sbase))
            snap_h = self._H.copy()

            def work():
                try:
                    self._sun_pending = (
                        snap_version,
                        self._sun_build(d, key, origin, n1, snap_h, snap))
                except Exception:  # a failed build just means no elision
                    self._sun_pending = None

            self._sun_last_build = _time.monotonic()
            self._sun_thread = threading.Thread(
                target=work, name="sun-map-build", daemon=True)
            self._sun_thread.start()
        return None

    def _attach_sun(self, version, built) -> None:
        import jax.numpy as jnp

        key, origin, sb, n1, d_len, d32 = built
        self._sun = (version, key, origin, jnp.asarray(sb), n1,
                     jnp.float32(d_len), jnp.asarray(d32),
                     jnp.asarray(np.array(origin, np.float32)))

    def _sun_build(self, d, key, origin, n1, H, src):
        """Heavy host-side table construction (numpy only — safe off the
        main thread); returns the pre-device tuple for ``_attach_sun``."""
        ox, oz = origin
        hmax_glob = float(H.max())
        dxz = float(np.hypot(d[0], d[2]))
        slope = float(d[1] / max(dxz, 1e-9))
        v = (np.array([d[0], d[2]]) / dxz if dxz >= 1e-4
             else np.zeros(2))

        # assembled field: the core window plus a 3-cell margin all around
        # (near planes + 3x3 morphology) plus a sun-direction extension
        # covering the whole far sweep, so every sampled cell reads REAL
        # loaded-chunk data (beyond the sweep, the analytic hmax cap rules)
        if dxz < 1e-4:
            length = len_rungs = 0.0  # straight-up: 5x5 near field rules
        else:
            # LIT sweep only spans the height band that exists: origins
            # below the window's lowest surface are under terrain (their
            # own-column near test denies lit anyway), so the sweep may
            # stop once a ray from (lowest surface - 4) clears the global
            # max — the analytic cap term rules beyond. The BLOCKED rung
            # ladder keeps the full hmax reach (its deep-valley claims
            # are exactly about low origins, and rungs are cheap).
            ec = H[ox >> 3 : (ox + n1 + 7) >> 3,
                   oz >> 3 : (oz + n1 + 7) >> 3]
            pos = ec[ec > 0]
            hmin_w = float(pos.min()) if pos.size else 0.0
            hmin_floor = max(0.0, hmin_w - 4.0)
            length = min((hmax_glob - hmin_floor) / max(slope, 1e-3) + 2.0,
                         768.0)
            len_rungs = min(hmax_glob / max(slope, 1e-3) + 2.0, 768.0)
        ext = max(length, len_rungs) + 1.0
        ext_x_lo = 3 + int(np.ceil(max(0.0, -v[0] * ext)))
        ext_x_hi = 3 + int(np.ceil(max(0.0, v[0] * ext)))
        ext_z_lo = 3 + int(np.ceil(max(0.0, -v[1] * ext)))
        ext_z_hi = 3 + int(np.ceil(max(0.0, v[1] * ext)))
        ax0, az0 = ox - ext_x_lo, oz - ext_z_lo
        anx = n1 + ext_x_lo + ext_x_hi
        anz = n1 + ext_z_lo + ext_z_hi
        h1a, b1a, bb1a = self._window_fields(ax0, az0, anx, anz, src)
        cx0, cz0 = ext_x_lo, ext_z_lo  # core origin within the assembly
        core = np.s_[cx0 : cx0 + n1, cz0 : cz0 + n1]
        h1 = h1a[core]

        def shift_a(a, sx, sz):
            """assembled array shifted by (sx, sz), zero-filled (beyond
            the assembly nothing is loaded, so zero is the truth)."""
            out = np.zeros_like(a)
            nx_, nz_ = a.shape
            if abs(sx) >= nx_ or abs(sz) >= nz_:
                return out
            xs = slice(max(0, -sx), nx_ - max(0, sx))
            zs = slice(max(0, -sz), nz_ - max(0, sz))
            xd = slice(max(0, sx), nx_ - max(0, -sx))
            zd = slice(max(0, sz), nz_ - max(0, -sz))
            out[xs, zs] = a[xd, zd]
            return out

        b_map = None
        d_len = np.float32(0.0)
        s_map = np.full_like(h1, -1e9)
        if dxz >= 1e-4:
            # Dense exact far sweep: S[c] = max over sampled distances D
            # of (dil3x3(h1)[c + rint(D*v)] - (D - 0.25)*slope). Sampling
            # every 0.5 voxels puts a sample within 0.25 of every real
            # crossing; the landing column then deviates by < 1.75 per
            # axis (0.5 in-column origin + 0.25 sample gap + 0.5
            # rounding), so ONE 3x3 dilation covers it. FAR field only:
            # samples landing >= 2 cells out (their 3x3 covers every
            # crossing >= 3 columns out); crossings within the 5x5 are
            # resolved EXACTLY by the verdict kernel's per-column window
            # tests (ops/beams.py) from the origin's true position.
            # Beyond the sampled length, the analytic cap rules: a ray at
            # y >= hmax_glob - length*slope is above ALL loaded terrain
            # once it has travelled that far.
            hda = h1a.copy()
            for sx in (-1, 0, 1):
                for sz in (-1, 0, 1):
                    if sx or sz:
                        np.maximum(hda, shift_a(h1a, sx, sz), out=hda)
            cap = hmax_glob - length * slope
            s_map = np.full_like(h1, min(cap, 1e4))
            buf = np.empty_like(s_map)
            seen = set()
            D = 0.25
            while D <= length:
                o = (int(np.rint(v[0] * D)), int(np.rint(v[1] * D)))
                if o not in seen:  # later D, same cell: smaller term
                    seen.add(o)
                    if max(abs(o[0]), abs(o[1])) >= 2:
                        view = hda[cx0 + o[0] : cx0 + o[0] + n1,
                                   cz0 + o[1] : cz0 + o[1] + n1]
                        np.subtract(view, np.float32((D - 0.25) * slope),
                                    out=buf)
                        np.maximum(s_map, buf, out=s_map)
                D += 0.5

            if b1a.any():
                # certainly-BLOCKED distance ladder: at horizontal travel
                # Dh the ray's height is EXACTLY y + Dh*slope (no drift in
                # height — only the landing COLUMN is uncertain, by the
                # origin's in-column position [<=0.71] plus the offset
                # rounding [<=0.71], all within a 3x3 neighborhood). A
                # claim at rung Dh therefore needs the ray height to sit
                # >=1 voxel inside the topmost contiguous-opaque run of
                # EVERY 3x3 neighbor of the landing column: 3x3-eroded run
                # top above, 3x3-dilated run bottom below. Rungs grow by
                # ~sqrt2 so the (typically tens-of-voxels wide) window of
                # distances where a blocked ray is inside the terrain skin
                # contains a rung. Single-hop tests: no error accumulation,
                # and rays that duck UNDER hollow mountain interiors (the
                # SVO only holds surface-straddling chunks) are simply not
                # claimed at those rungs.
                rungs = []
                dh = 3.0  # closer blockers are kernel-exact (5x5 windows)
                while dh <= len_rungs and len(rungs) < 12:
                    rungs.append(dh)
                    dh = max(dh + 1.0, round(dh * 1.45))
                los, his = [], []
                for dh in rungs:
                    sx = int(np.rint(v[0] * dh))
                    sz = int(np.rint(v[1] * dh))
                    top_s = shift_a(b1a, sx, sz)
                    bot_s = shift_a(bb1a, sx, sz)
                    # empty neighbors (top 0) kill the claim via ero-1<0
                    # (COPIES: the in-place min/max below must not mutate
                    # the arrays still being shifted)
                    ero = top_s.copy()
                    dil = bot_s.copy()
                    for ddx in (-1, 0, 1):
                        for ddz in (-1, 0, 1):
                            if ddx or ddz:
                                np.minimum(ero, shift_a(top_s, ddx, ddz),
                                           out=ero)
                                np.maximum(dil, shift_a(bot_s, ddx, ddz),
                                           out=dil)
                    rise = dh * slope
                    his.append(ero[core] - rise - 1.0)  # claim: y <= hi
                    los.append(dil[core] - rise + 1.0)  # claim: y >= lo
                if rungs:
                    b_map = (los, his)
                    d_len = np.float32(rungs[-1] / dxz + 4.0)

        # assemble the encoded u16 table column-directly (no full-size
        # float intermediate): [S_far | 25 near voxel tops | 25 near run
        # tops | 25 near run bottoms | K band los | K band his]
        K = len(b_map[0]) if b_map is not None else 0
        sb = np.empty((n1 * n1, 76 + 2 * K), np.uint16)
        sb[:, 0] = _enc_up(s_map.reshape(-1))
        i = 0
        for plane, enc in ((h1a, _enc_int), (b1a, _enc_int),
                           (bb1a, _enc_int)):
            for ddx in (-2, -1, 0, 1, 2):
                for ddz in (-2, -1, 0, 1, 2):
                    sb[:, 1 + i] = enc(
                        plane[cx0 + ddx : cx0 + ddx + n1,
                              cz0 + ddz : cz0 + ddz + n1]).reshape(-1)
                    i += 1
        for j in range(K):
            sb[:, 76 + j] = _enc_up(b_map[0][j].reshape(-1))
            sb[:, 76 + K + j] = _enc_dn(b_map[1][j].reshape(-1))
        return key, origin, sb, n1, d_len, d.astype(np.float32)
