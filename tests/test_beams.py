"""Beam pre-pass: envelope maintenance, floor conservativeness, and
bit-exactness of floored rendering (ops/beams.py, world/heightfield.py).

The only correctness requirement of the pre-pass is conservativeness:
floors never exceed the true first-hit distance of ANY ray in their tile,
and a certain-miss verdict implies every ray of the tile misses. Rendering
with floors must then be bit-exact (floored starts are restarts, which are
exact re-descents — ops/traversal.py restart_state_push)."""

import numpy as np
import pytest

from voxelrs_tpu.gamelogic.content import (GLASS, GRASS, STONE,
                                           new_registry)
from voxelrs_tpu.graphics.svo import RenderParams, Svo
from voxelrs_tpu.world import ChunkPos, Position
from voxelrs_tpu.world.esvo import Esvo, SerializedChunk
from voxelrs_tpu.world.heightfield import (HeightField, chunk_column_tops,
                                           chunk_solid_bases,
                                           chunk_voxel_tops,
                                           opaque_lut_from_mask)

W, H = 128, 96

_OPAQUE_LUT = None


def _opaque_lut():
    """Renderer-opaque LUT (glass/water/leaves excluded) for solid-base
    maps, derived once from the real registry's texture alpha."""
    global _OPAQUE_LUT
    if _OPAQUE_LUT is None:
        svo = Svo(new_registry(), capacity_mb=1)
        _OPAQUE_LUT = opaque_lut_from_mask(svo.translucent_block_mask)
    return _OPAQUE_LUT


# -- chunk column tops -------------------------------------------------------


def test_column_tops_full_detail():
    vox = np.zeros((32, 32, 32), np.uint32)
    vox[0, 5, 0] = STONE           # cell (0, 0): top 6
    vox[9, 17, 2] = STONE          # cell (1, 0): top 18
    vox[31, 0, 31] = STONE         # cell (3, 3): top 1
    tops = chunk_column_tops(vox, 5)
    expect = np.zeros((4, 4), np.int16)
    expect[0, 0] = 6
    expect[1, 0] = 18
    expect[3, 3] = 1
    assert (tops == expect).all()


def test_column_tops_match_bruteforce_random():
    rng = np.random.default_rng(3)
    vox = (rng.random((32, 32, 32)) < 0.05).astype(np.uint32)
    tops = chunk_column_tops(vox, 5)
    for cx in range(4):
        for cz in range(4):
            sub = vox[cx * 8 : cx * 8 + 8, :, cz * 8 : cz * 8 + 8]
            ys = np.nonzero(sub.any(axis=(0, 2)))[0]
            assert tops[cx, cz] == (ys.max() + 1 if len(ys) else 0)


@pytest.mark.parametrize("lod", [1, 2, 3, 4])
def test_column_tops_lod_rounds_up(lod):
    """A LOD chunk renders whole 2^(5-lod) blocks: tops must cover the
    rendered block, not just the source voxel."""
    b = 1 << (5 - lod)
    vox = np.zeros((32, 32, 32), np.uint32)
    vox[3, 3, 3] = STONE  # inside the first block on every axis
    tops = chunk_column_tops(vox, lod)
    covered = max(b // 8, 1)  # columns the rendered block spans
    top = (3 // b + 1) * b  # block containing y=3, rounded UP
    for cx in range(4):
        for cz in range(4):
            if cx < covered and cz < covered:
                assert tops[cx, cz] == top
            else:
                assert tops[cx, cz] == 0


# -- heightfield maintenance -------------------------------------------------


def test_heightfield_stacking_and_removal():
    hf = HeightField()
    t_low = np.full((4, 4), 10, np.int16)
    t_high = np.zeros((4, 4), np.int16)
    t_high[2, 1] = 5
    hf.set_chunk((0, 0, 0), t_low)
    hf.set_chunk((0, 2, 0), t_high)  # same column stack, higher chunk
    Hx = hf.exact()
    assert Hx[2, 1] == 2 * 32 + 5
    assert Hx[0, 0] == 10
    hf.remove_chunk((0, 2, 0))
    assert hf.exact()[2, 1] == 10
    hf.remove_chunk((0, 0, 0))
    assert hf.exact().max() == 0


def test_heightfield_override_protection():
    hf = HeightField()
    a = np.full((4, 4), 7, np.int16)
    b = np.full((4, 4), 9, np.int16)
    hf.set_chunk((1, 0, 1), a)
    hf.set_chunk((1, 0, 1), b)  # b displaces a in the same slot
    hf.remove_chunk((1, 0, 1), expect=a)  # stale removal: must be a no-op
    assert hf.exact()[4:8, 4:8].max() == 9
    hf.remove_chunk((1, 0, 1), expect=b)
    assert hf.exact().max() == 0


def test_heightfield_device_pyramid_is_max():
    hf = HeightField()
    rng = np.random.default_rng(5)
    for cx in range(2):
        for cz in range(2):
            hf.set_chunk(
                (cx, 0, cz),
                rng.integers(0, 30, (4, 4)).astype(np.int16),
            )
    levels, offsets, n, hmax, bounds, levels_e = hf.device()
    lv = np.asarray(levels)
    h0 = lv[offsets[0] : offsets[0] + n * n].reshape(n, n)
    # level 0 is the 3x3 dilation of the exact field
    Hx = hf.exact().astype(np.int32)
    p = np.pad(Hx, 1, mode="edge")
    d = Hx.copy()
    for dx in range(3):
        for dz in range(3):
            d = np.maximum(d, p[dx : dx + n, dz : dz + n])
    assert (h0 == d).all()
    assert hmax == Hx.max()
    nzx, nzz = np.nonzero(Hx)
    assert (bounds == [nzx.min() * 8, (nzx.max() + 1) * 8,
                       nzz.min() * 8, (nzz.max() + 1) * 8]).all()
    # exact pyramid: level 0 is the UNdilated field
    lve = np.asarray(levels_e)
    assert (lve[offsets[0] : offsets[0] + n * n].reshape(n, n) == Hx).all()
    # each pyramid level is the 2x2 max of the previous
    for li in range(1, len(offsets)):
        nl = n >> li
        cur = lv[offsets[li] : offsets[li] + nl * nl].reshape(nl, nl)
        prev = lv[offsets[li - 1] : offsets[li - 1] + (nl * 2) ** 2]
        prev = prev.reshape(nl, 2, nl, 2).max(axis=(1, 3))
        assert (cur == prev).all()


# -- world fixtures ----------------------------------------------------------


def _terrain_chunk(cx, cz, rng, glass_tower=False):
    vox = np.zeros((32, 32, 32), np.uint32)
    x = np.arange(32) + cx * 32
    z = np.arange(32) + cz * 32
    hh = (
        10
        + 6 * np.sin(x[:, None] * 0.11)
        + 5 * np.cos(z[None, :] * 0.17)
    ).astype(np.int32)
    for ix in range(32):
        for iz in range(32):
            h = max(1, hh[ix, iz])
            vox[ix, : h - 1, iz] = STONE
            vox[ix, h - 1, iz] = GRASS
    if glass_tower:
        vox[12:15, 14:26, 12:15] = GLASS
    return vox


@pytest.fixture(scope="module")
def beam_scene():
    """3x3 chunk terrain + glass tower + one floating block, with a
    matching heightfield."""
    rng = np.random.default_rng(7)
    world = Esvo()
    hf = HeightField()
    for cx in range(3):
        for cz in range(3):
            vox = _terrain_chunk(cx, cz, rng, glass_tower=(cx == cz == 1))
            if cx == 2 and cz == 0:
                vox[5, 30, 5] = STONE  # floating block near the top
            world.set_leaf(
                Position(cx, 0, cz),
                SerializedChunk.from_voxels(ChunkPos(cx, 0, cz), vox, 5),
                True,
            )
            hf.set_chunk((cx, 0, cz), chunk_column_tops(vox, 5),
                         vtops=chunk_voxel_tops(vox, 5),
                         sbase=chunk_solid_bases(vox, 5, _opaque_lut()))
    world.serialize()
    svo = Svo(new_registry(), capacity_mb=8)
    svo.update(world)
    return svo, hf


CAMS = {
    "horizon": ([48.0, 30.0, -20.0], [0.0, -0.12, 1.0]),
    "down": ([48.0, 70.0, 48.0], [0.01, -1.0, 0.01]),
    "on-ground": ([40.0, 13.0, 40.0], [0.7, 0.05, 0.7]),
    "sky": ([48.0, 25.0, 48.0], [0.2, 0.95, 0.1]),
    "outside": ([-40.0, 50.0, -40.0], [0.6, -0.25, 0.6]),
    "underground": ([49.0, 4.0, 49.0], [0.8, 0.1, 0.5]),
    "grazing": ([48.0, 22.5, -10.0], [0.0, -0.004, 1.0]),
}


def _params(cam):
    pos, fwd = cam
    fwd = np.asarray(fwd, np.float32)
    fwd /= np.linalg.norm(fwd)
    return RenderParams(
        cam_pos=np.asarray(pos, np.float32), cam_fwd=fwd,
        aspect_ratio=W / H, fov_y_rad=np.radians(70.0),
        render_shadows=True, shadow_distance=100.0,
    )


def _floors(svo, params):
    from voxelrs_tpu.graphics.camera import Camera

    cam = Camera(np.degrees(params.fov_y_rad), params.aspect_ratio, 0.01,
                 1024)
    cam.position = np.asarray(params.cam_pos, np.float32)
    cam.forward = np.asarray(params.cam_fwd, np.float32)
    s, u, f = cam.camera_basis()
    ctx = svo._beam_floors(cam, s, u, f, params, W, H)
    return None if ctx is None else ctx.t_floor


@pytest.mark.parametrize("cam", sorted(CAMS))
def test_floors_conservative(beam_scene, cam):
    """floor <= true first-geometry distance for EVERY pixel; +inf floors
    only where the pixel provably misses."""
    import jax.numpy as jnp

    from voxelrs_tpu.ops.shading import generate_rays
    from voxelrs_tpu.ops.traversal import intersect_octree

    svo, hf = beam_scene
    svo.set_heightfield(hf)
    try:
        params = _params(CAMS[cam])
        floors = _floors(svo, params)
        assert floors is not None
        floors = np.asarray(floors)

        from voxelrs_tpu.graphics.camera import Camera

        c = Camera(np.degrees(params.fov_y_rad), params.aspect_ratio, 0.01,
                   1024)
        c.position = np.asarray(params.cam_pos, np.float32)
        c.forward = np.asarray(params.cam_fwd, np.float32)
        s, u, f = c.camera_basis()
        ro, rd = generate_rays(
            W, H, jnp.asarray(c.position), jnp.asarray(s), jnp.asarray(u),
            jnp.asarray(f), jnp.float32(params.fov_y_rad),
            jnp.float32(params.aspect_ratio),
        )
        res = intersect_octree(
            svo.device_buf, jnp.float32(svo.octree_scale), ro, rd,
            jnp.float32(-1.0), False, max_steps=640,
        )
        t = np.asarray(res.t)
        hit = t > 0
        finite = np.isfinite(floors)
        bad = hit & finite & (floors > t + 1e-3)
        assert not bad.any(), (
            f"{cam}: {bad.sum()} pixels floored past their hit "
            f"(worst overshoot {(floors - t)[bad].max():.3f})"
        )
        popped = hit & ~finite
        assert not popped.any(), (
            f"{cam}: {popped.sum()} hit pixels declared certain-miss"
        )
    finally:
        svo.set_heightfield(None)


@pytest.mark.parametrize("cam", ["horizon", "on-ground", "sky", "down"])
def test_floored_render_bit_exact(beam_scene, cam):
    svo, hf = beam_scene
    params = _params(CAMS[cam])
    base = np.asarray(svo.render(params, W, H, max_steps=400))
    base2 = np.asarray(svo.render(params, W, H, max_steps=400))
    svo.set_heightfield(hf)
    try:
        on = np.asarray(svo.render(params, W, H, max_steps=400))
        on2 = np.asarray(svo.render(params, W, H, max_steps=400))
    finally:
        svo.set_heightfield(None)
    assert (base == base2).all()  # plan replay is deterministic
    assert (on == base).all(), (
        f"{cam}: floored render differs on "
        f"{(on != base).any(-1).sum()} pixels"
    )
    assert (on2 == base).all()


def test_floored_render_bit_exact_adaptive(beam_scene, monkeypatch):
    monkeypatch.setenv("VOXELRS_ADAPTIVE", "1")
    svo, hf = beam_scene
    params = _params(CAMS["horizon"])
    base = np.asarray(svo.render(params, W, H, max_steps=400))
    svo.set_heightfield(hf)
    try:
        on = np.asarray(svo.render(params, W, H, max_steps=400))
    finally:
        svo.set_heightfield(None)
    assert (on == base).all()


def test_floored_render_bit_exact_opaque(monkeypatch):
    """Opaque-world pipeline (no translucent blocks) with floors."""
    rng = np.random.default_rng(11)
    world = Esvo()
    hf = HeightField()
    for cx in range(2):
        for cz in range(2):
            vox = _terrain_chunk(cx, cz, rng)
            world.set_leaf(
                Position(cx, 0, cz),
                SerializedChunk.from_voxels(ChunkPos(cx, 0, cz), vox, 5),
                True,
            )
            hf.set_chunk((cx, 0, cz), chunk_column_tops(vox, 5))
    world.serialize()
    svo = Svo(new_registry(), capacity_mb=8)
    svo.update(world)
    params = _params(CAMS["horizon"])
    base = np.asarray(svo.render(params, W, H, max_steps=400))
    svo.set_heightfield(hf)
    on = np.asarray(svo.render(params, W, H, max_steps=400))
    assert (on == base).all()


def test_floors_save_work_on_terrain(beam_scene):
    """Sanity: the horizon view gets a meaningful fraction of non-trivial
    floors (the pre-pass actually claims something)."""
    svo, hf = beam_scene
    svo.set_heightfield(hf)
    try:
        floors = np.asarray(_floors(svo, _params(CAMS["horizon"])))
    finally:
        svo.set_heightfield(None)
    assert np.isinf(floors).mean() > 0.2      # sky tiles elided
    finite = floors[np.isfinite(floors)]
    assert (finite > 5.0).mean() > 0.3        # real air-walk skipped


@pytest.mark.parametrize("cam", ["horizon", "down", "on-ground"])
def test_shadow_floors_conservative(beam_scene, cam):
    """Per-ray shadow floors never exceed the first-geometry distance of
    the shadow ray; +inf only where the ray misses everything."""
    import jax.numpy as jnp

    from voxelrs_tpu.ops.shading import FACE_NORMALS, generate_rays
    from voxelrs_tpu.ops.traversal import intersect_octree

    svo, hf = beam_scene
    svo.set_heightfield(hf)
    try:
        params = _params(CAMS[cam])
        from voxelrs_tpu.graphics.camera import Camera

        c = Camera(np.degrees(params.fov_y_rad), params.aspect_ratio, 0.01,
                   1024)
        c.position = np.asarray(params.cam_pos, np.float32)
        c.forward = np.asarray(params.cam_fwd, np.float32)
        s, u, f = c.camera_basis()
        ro, rd = generate_rays(
            W, H, jnp.asarray(c.position), jnp.asarray(s), jnp.asarray(u),
            jnp.asarray(f), jnp.float32(params.fov_y_rad),
            jnp.float32(params.aspect_ratio),
        )
        res = intersect_octree(
            svo.device_buf, jnp.float32(svo.octree_scale), ro, rd,
            jnp.float32(-1.0), False, max_steps=640,
        )
        hit = np.asarray(res.t) > 0
        normal = FACE_NORMALS[jnp.clip(res.face_id, 0, 5)]
        sro = (res.pos + normal * 0.001)[jnp.asarray(hit)]
        light = np.array([-1.0, -1.0, -1.0], np.float32) / np.sqrt(3)
        to_light = jnp.asarray(-light)

        ctx = svo._beam_floors(c, s, u, f, params, W, H)
        floors = np.asarray(ctx.shadow_ray_floors(
            sro, jnp.full(sro.shape[0], -1.0, jnp.float32), to_light))

        sres = intersect_octree(
            svo.device_buf, jnp.float32(svo.octree_scale), sro,
            jnp.broadcast_to(to_light, sro.shape),
            jnp.float32(-1.0), False, max_steps=640,
        )
        st = np.asarray(sres.t)
        shit = st > 0
        fin = np.isfinite(floors)
        bad = shit & fin & (floors > st + 1e-3)
        assert not bad.any(), (
            f"{cam}: {bad.sum()} shadow rays floored past their hit "
            f"(worst {(floors - st)[bad].max():.3f})"
        )
        popped = shit & ~fin
        assert not popped.any(), (
            f"{cam}: {popped.sum()} blocked rays declared lit"
        )
        if cam == "horizon":
            # the per-voxel sun map resolves a share of even this cliffy
            # terrain's shadow rays without tracing (flat scenes approach
            # 100% — see the flat test). The exact-sweep rewrite traded
            # some near-field coverage for soundness (the old doubling
            # sweep under-covered D<1 neighbors and leaked at skewed sun
            # angles); the exact near-field kernel recovers it.
            assert np.isinf(floors).mean() > 0.05, (
                f"only {np.isinf(floors).mean():.1%} elided"
            )
    finally:
        svo.set_heightfield(None)


def test_shadow_floors_elide_on_flat_ground():
    """On flat terrain the per-ray gate passes and open rays resolve as
    certainly lit (the effectiveness half of the scheme; slopes fall back
    to floor 0 by design)."""
    import jax.numpy as jnp

    flat = np.zeros((32, 32, 32), np.uint32)
    flat[:, :10, :] = STONE
    vox0 = flat.copy()
    vox0[14:18, 10:14, 14:18] = STONE  # one block casting shadow
    world = Esvo()
    hf = HeightField()
    for cx in range(2):
        for cz in range(2):
            vox = vox0 if cx == cz == 0 else flat
            world.set_leaf(
                Position(cx, 0, cz),
                SerializedChunk.from_voxels(ChunkPos(cx, 0, cz), vox, 5),
                True,
            )
            hf.set_chunk((cx, 0, cz), chunk_column_tops(vox, 5))
    world.serialize()
    svo = Svo(new_registry(), capacity_mb=8)
    svo.update(world)
    svo.set_heightfield(hf)

    # shadow origins on the flat top surface AWAY from the block (the
    # block's 3x3-column dilation ring rightly gates out its vicinity)
    xs = np.linspace(34, 62, 15, dtype=np.float32)
    pts = np.array([[x, 10.001, z] for x in xs for z in xs], np.float32)
    light = np.array([-1.0, -1.0, -1.0], np.float32) / np.sqrt(3)
    from voxelrs_tpu.graphics.camera import Camera

    params = RenderParams(
        cam_pos=np.array([16.0, 30.0, -10.0], np.float32),
        cam_fwd=np.array([0.0, -0.5, 1.0], np.float32) / np.sqrt(1.25),
        aspect_ratio=W / H, fov_y_rad=np.radians(70.0),
        render_shadows=True, shadow_distance=100.0,
    )
    cam = Camera(np.degrees(params.fov_y_rad), params.aspect_ratio, 0.01,
                 1024)
    cam.position = params.cam_pos
    cam.forward = params.cam_fwd
    s, u, f = cam.camera_basis()
    bctx = svo._beam_floors(cam, s, u, f, params, W, H)
    floors = np.asarray(bctx.shadow_ray_floors(
        jnp.asarray(pts), jnp.full(len(pts), -1.0, jnp.float32),
        jnp.asarray(-light)))
    # most of the flat ground resolves as certainly lit; points in the
    # block's shadow band keep floor 0 or a finite floor
    assert np.isinf(floors).mean() > 0.5

    from voxelrs_tpu.ops.traversal import intersect_octree

    sres = intersect_octree(
        svo.device_buf, jnp.float32(svo.octree_scale), jnp.asarray(pts),
        jnp.broadcast_to(jnp.asarray(-light), (len(pts), 3)),
        jnp.float32(-1.0), False, max_steps=400,
    )
    st = np.asarray(sres.t)
    shit = st > 0
    fin = np.isfinite(floors)
    assert not (shit & ~fin).any()  # no blocked ray declared lit
    assert not (shit & fin & (floors > st + 1e-3)).any()


def test_floored_render_bit_exact_csvo():
    """The CSVO engine's floored start matches its unfloored render."""
    rng = np.random.default_rng(21)
    from voxelrs_tpu.world.csvo import Csvo, CsvoSerializedChunk

    world = Csvo()
    hf = HeightField()
    for cx in range(2):
        for cz in range(2):
            vox = _terrain_chunk(cx, cz, rng, glass_tower=(cx == cz == 1))
            world.set_leaf(
                Position(cx, 0, cz),
                CsvoSerializedChunk.from_voxels(ChunkPos(cx, 0, cz), vox, 5),
                True,
            )
            hf.set_chunk((cx, 0, cz), chunk_column_tops(vox, 5),
                         vtops=chunk_voxel_tops(vox, 5),
                         sbase=chunk_solid_bases(vox, 5, _opaque_lut()))
    world.serialize()
    svo = Svo(new_registry(), capacity_mb=8, buffer_dtype=np.uint8)
    svo.update(world)
    params = _params(CAMS["horizon"])
    base = np.asarray(svo.render(params, W, H, max_steps=400))
    svo.set_heightfield(hf)
    try:
        on = np.asarray(svo.render(params, W, H, max_steps=400))
    finally:
        svo.set_heightfield(None)
    assert (on == base).all(), (
        f"csvo floored render differs on {(on != base).any(-1).sum()} px"
    )


# -- sun certificate soundness ------------------------------------------------


def test_sun_certificates_sound_random():
    """Randomized soundness of BOTH sun-map certificates against an exact
    fine-step ray march over the source voxels: a lit claim (y >= S) must
    imply the sun ray clears ALL geometry; a blocked claim (y <= B) must
    imply it passes through renderer-opaque solid within d_len. Terrain
    spans two vertical chunks (exercises the contiguous-run stacking),
    with carved caves (run breaks) and glass columns (non-opaque, must
    not ground a blocked claim)."""
    rng = np.random.default_rng(11)
    lut = _opaque_lut()
    for light in (
        np.array([-1.0, -1.0, -1.0]),
        np.array([0.3, -0.8, 0.52]),
        np.array([-0.9, -0.5, 0.1]),
    ):
        light = (light / np.linalg.norm(light)).astype(np.float32)
        hf = HeightField()
        occ_any = np.zeros((64, 64, 64), bool)  # [x, y, z] world voxels
        occ_op = np.zeros((64, 64, 64), bool)
        ph = rng.uniform(0, 6.28, size=4)
        for cx in range(2):
            for cz in range(2):
                # smooth hills (amplitude ~35, wavelength ~45 voxels) with
                # +-2 voxel jitter: the regime the sweep targets — ragged
                # white-noise terrain erodes B to nothing (by design)
                x = np.arange(32) + cx * 32
                z = np.arange(32) + cz * 32
                hh = (30 + 20 * np.sin(x[:, None] * 0.14 + ph[0])
                      + 16 * np.cos(z[None, :] * 0.11 + ph[1])
                      + rng.integers(-1, 2, size=(32, 32))).astype(int)
                hh = np.clip(hh, 2, 62)
                glass_col = rng.random((32, 32)) < 0.05
                for cy in range(2):
                    ys = np.arange(32) + cy * 32
                    fill = ys[None, :, None] < hh[:, None, :]
                    vox = np.where(fill, STONE, 0).astype(np.uint32)
                    vox = np.where(glass_col[:, None, :] & fill, GLASS, vox)
                    # caves only in the upper half: they exercise the run
                    # -break logic without eroding every lower-chunk run
                    pocket = rng.random((32, 32, 32)) < (0.004 * cy)
                    vox[pocket] = 0
                    hf.set_chunk(
                        (cx, cy, cz), chunk_column_tops(vox, 5),
                        vtops=chunk_voxel_tops(vox, 5),
                        sbase=chunk_solid_bases(vox, 5, lut))
                    sl = (slice(cx * 32, cx * 32 + 32),
                          slice(cy * 32, cy * 32 + 32),
                          slice(cz * 32, cz * 32 + 32))
                    occ_any[sl] = vox != 0
                    occ_op[sl] = lut[vox]
        sm = hf.sun_map(light)
        assert sm is not None
        sb_dev, n1, d_len, d_dev, origin_dev = (
            sm[0], sm[1], float(sm[2]), sm[3], sm[4])
        assert n1 == 64

        # random air points, biased to just-above-the-surface (where
        # shadow-ray origins live; high air is all trivially lit)
        pts_u = rng.uniform(0, 64, size=(3000, 3)).astype(np.float32)
        px = rng.uniform(0, 64, size=6000).astype(np.float32)
        pz = rng.uniform(0, 64, size=6000).astype(np.float32)
        tops = occ_any[px.astype(int), :, pz.astype(int)]
        top_y = 64 - np.argmax(tops[:, ::-1], axis=1)
        top_y = np.where(tops.any(axis=1), top_y, 0).astype(np.float32)
        py = top_y + rng.uniform(0.001, 18.0, size=6000).astype(np.float32)
        pts_s = np.stack([px, np.minimum(py, 63.9), pz], axis=1)
        pts = np.concatenate([pts_u, pts_s]).astype(np.float32)
        ix = pts.astype(int)
        in_air = ~occ_any[ix[:, 0], ix[:, 1], ix[:, 2]]
        pts = pts[in_air]
        from voxelrs_tpu.ops.beams import sun_verdict_masks

        lit_d, blk_d = sun_verdict_masks(
            sb_dev, n1=n1, ro=pts, max_dst=np.full(len(pts), -1.0,
                                                   np.float32),
            d_len=np.float32(d_len), d=d_dev, origin=origin_dev)
        lit = np.asarray(lit_d)
        blk = np.asarray(blk_d)

        d = (-light / np.linalg.norm(light)).astype(np.float64)
        t_max = 64.0 * 3.0 / max(np.hypot(d[0], d[2]), 1e-6)
        ts = np.arange(0.02, t_max, 0.05)

        def march(p0s, grid, tmax):
            """True where the ray from p0 hits an occupied voxel by tmax."""
            hit = np.zeros(len(p0s), bool)
            for s in range(0, len(p0s), 400):
                p = p0s[s:s + 400, None, :] + ts[None, :, None] * d[None, None, :]
                valid = ((ts[None, :] <= tmax)
                         & (p >= 0).all(-1) & (p < 64).all(-1))
                q = np.clip(p.astype(int), 0, 63)
                occ = grid[q[..., 0], q[..., 1], q[..., 2]]
                hit[s:s + 400] = (occ & valid).any(axis=1)
            return hit

        n_lit, n_blk = int(lit.sum()), int(blk.sum())
        assert n_lit > 50, f"vacuous lit coverage ({n_lit})"
        assert n_blk > 30, f"vacuous blocked coverage ({n_blk})"
        hit_any = march(pts[lit], occ_any, np.inf)
        assert not hit_any.any(), (
            f"{hit_any.sum()} lit claims hit geometry (light {light})")
        hit_op = march(pts[blk], occ_op, d_len)
        if not hit_op.all():
            # a >=1-voxel-deep pass can still clip a corner for a tiny
            # t-span the coarse march steps over; refine before judging
            miss = pts[blk][~hit_op]
            fine = np.arange(0.005, float(ts[-1]), 0.005)
            refined = np.zeros(len(miss), bool)
            for i, p0 in enumerate(miss):
                p = p0[None, :] + fine[:, None] * d[None, :]
                ok = ((fine <= d_len) & (p >= 0).all(-1)
                      & (p < 64).all(-1))
                q = np.clip(p.astype(int), 0, 63)
                refined[i] = (occ_op[q[:, 0], q[:, 1], q[:, 2]] & ok).any()
            assert refined.all(), (
                f"{(~refined).sum()}/{n_blk} blocked claims miss all "
                f"opaque solid (light {light})")


def test_sun_map_windowed_sound():
    """A camera-centered window smaller than the world: in-window points
    get SOUND claims (verified against the FULL world occupancy — the
    assembly extension must see the tall ridge outside the window toward
    the sun), out-of-window points get no claims at all."""
    rng = np.random.default_rng(23)
    lut = _opaque_lut()
    light = np.array([-1.0, -1.0, -1.0], np.float32)
    light /= np.linalg.norm(light)
    hf = HeightField()
    hf.SUN_WINDOW = 64  # world is 4x4 chunks = 128 voxels
    occ_any = np.zeros((128, 64, 128), bool)
    occ_op = np.zeros((128, 64, 128), bool)
    for cx in range(4):
        for cz in range(4):
            x = np.arange(32) + cx * 32
            z = np.arange(32) + cz * 32
            hh = (14 + 8 * np.sin(x[:, None] * 0.13)
                  + 7 * np.cos(z[None, :] * 0.09)
                  + rng.integers(-1, 2, size=(32, 32))).astype(int)
            # tall ridge along world x in [100, 112): DOWN-SUN (the sun
            # direction is +x+z from any origin) of the window the test
            # centers at (48, 48) -> origin (0,0)..(64,64); the ridge lies
            # OUTSIDE that window and must still kill far-lit claims for
            # rays that would cross it
            ridge = (x[:, None] >= 100) & (x[:, None] < 112)
            hh = np.where(ridge, 60, hh)
            hh = np.clip(hh, 2, 62)
            for cy in range(2):
                ys = np.arange(32) + cy * 32
                fill = ys[None, :, None] < hh[:, None, :]
                vox = np.where(fill, STONE, 0).astype(np.uint32)
                hf.set_chunk(
                    (cx, cy, cz), chunk_column_tops(vox, 5),
                    vtops=chunk_voxel_tops(vox, 5),
                    sbase=chunk_solid_bases(vox, 5, lut))
                sl = (slice(cx * 32, cx * 32 + 32),
                      slice(cy * 32, cy * 32 + 32),
                      slice(cz * 32, cz * 32 + 32))
                occ_any[sl] = vox != 0
                occ_op[sl] = lut[vox]

    sm = hf.sun_map(light, center=(48.0, 30.0, 48.0))
    assert sm is not None
    sb_dev, n1, d_len, d_dev, origin_dev = (
        sm[0], sm[1], float(sm[2]), sm[3], sm[4])
    assert n1 == 64
    origin = np.asarray(origin_dev)
    assert 0 <= origin[0] <= 64 and 0 <= origin[1] <= 64  # window < world

    from voxelrs_tpu.ops.beams import sun_verdict_masks

    # random air points across the WHOLE world (in- and out-of-window)
    px = rng.uniform(0, 128, size=4000).astype(np.float32)
    pz = rng.uniform(0, 128, size=4000).astype(np.float32)
    tops = occ_any[px.astype(int), :, pz.astype(int)]
    top_y = 64 - np.argmax(tops[:, ::-1], axis=1)
    top_y = np.where(tops.any(axis=1), top_y, 0).astype(np.float32)
    py = np.minimum(top_y + rng.uniform(0.001, 14.0, size=4000), 63.9)
    pts = np.stack([px, py.astype(np.float32), pz], axis=1)
    ix = pts.astype(int)
    pts = pts[~occ_any[ix[:, 0], ix[:, 1], ix[:, 2]]]

    lit_d, blk_d = sun_verdict_masks(
        sb_dev, n1=n1, ro=pts,
        max_dst=np.full(len(pts), -1.0, np.float32),
        d_len=np.float32(d_len), d=d_dev, origin=origin_dev)
    lit = np.asarray(lit_d)
    blk = np.asarray(blk_d)

    # the kernel allows a 0.125 tolerance band (boundary-face origins)
    inw = ((pts[:, 0] >= origin[0] - 0.125)
           & (pts[:, 0] < origin[0] + n1 + 0.125)
           & (pts[:, 2] >= origin[1] - 0.125)
           & (pts[:, 2] < origin[1] + n1 + 0.125))
    assert not lit[~inw].any() and not blk[~inw].any(), \
        "claims escaped the window"
    assert lit[inw].sum() > 40, f"vacuous windowed lit ({lit.sum()})"

    d = (-light / np.linalg.norm(light)).astype(np.float64)
    t_max = 128.0 * 3.0 / max(np.hypot(d[0], d[2]), 1e-6)
    ts = np.arange(0.02, t_max, 0.05)

    def march(p0s, grid, tmax):
        hit = np.zeros(len(p0s), bool)
        for s in range(0, len(p0s), 400):
            p = p0s[s:s + 400, None, :] + ts[None, :, None] * d[None, None, :]
            valid = ((ts[None, :] <= tmax)
                     & (p[..., [0, 2]] >= 0).all(-1) & (p[..., 1] >= 0)
                     & (p[..., [0, 2]] < 128).all(-1) & (p[..., 1] < 64))
            q = np.clip(p.astype(int), 0,
                        np.array([127, 63, 127]))
            occ = grid[q[..., 0], q[..., 1], q[..., 2]]
            hit[s:s + 400] = (occ & valid).any(axis=1)
        return hit

    hit_any = march(pts[lit], occ_any, np.inf)
    assert not hit_any.any(), (
        f"{hit_any.sum()} windowed lit claims hit geometry (ridge?)")
    if blk.any():
        hit_op = march(pts[blk], occ_op, d_len)
        if not hit_op.all():
            miss = pts[blk][~hit_op]
            fine = np.arange(0.005, float(ts[-1]), 0.005)
            refined = np.zeros(len(miss), bool)
            for i, p0 in enumerate(miss):
                p = p0[None, :] + fine[:, None] * d[None, :]
                ok = ((fine <= d_len) & (p[:, 0] >= 0) & (p[:, 0] < 128)
                      & (p[:, 1] >= 0) & (p[:, 1] < 64)
                      & (p[:, 2] >= 0) & (p[:, 2] < 128))
                q = np.clip(p.astype(int), 0, np.array([127, 63, 127]))
                refined[i] = (occ_op[q[:, 0], q[:, 1], q[:, 2]] & ok).any()
            assert refined.all(), (
                f"{(~refined).sum()} windowed blocked claims miss solid")


def test_sun_map_async_attach_and_stale_discard():
    """sun_async=True: the first call kicks a background build and
    returns None; a later call attaches the finished table. A world
    change during the build must discard the (unsound) stale result."""
    import time

    lut = _opaque_lut()
    light = np.array([-1.0, -1.0, -1.0], np.float32) / np.sqrt(3)
    vox = np.zeros((32, 32, 32), np.uint32)
    vox[:, :8, :] = STONE

    def make_hf():
        hf = HeightField()
        hf.sun_async = True
        hf.SUN_COOLDOWN = 0.0
        hf.set_chunk((0, 0, 0), chunk_column_tops(vox, 5),
                     vtops=chunk_voxel_tops(vox, 5),
                     sbase=chunk_solid_bases(vox, 5, lut))
        return hf

    hf = make_hf()
    assert hf.sun_map(light) is None  # build kicked, nothing yet
    for _ in range(100):
        time.sleep(0.05)
        sm = hf.sun_map(light)
        if sm is not None:
            break
    assert sm is not None, "async build never attached"
    assert sm[1] == 32  # 1-chunk world: 32-voxel window

    # stale discard: mutate the world while a build is in flight
    hf2 = make_hf()
    assert hf2.sun_map(light) is None
    hf2.set_chunk((0, 1, 0), chunk_column_tops(vox, 5),
                  vtops=chunk_voxel_tops(vox, 5),
                  sbase=chunk_solid_bases(vox, 5, lut))  # version bump
    if hf2._sun_thread is not None:
        hf2._sun_thread.join(timeout=30)
    sm2 = hf2.sun_map(light)  # stale pending discarded, new build kicked
    assert hf2._sun is None or hf2._sun[0] == hf2._version
    for _ in range(100):
        time.sleep(0.05)
        sm2 = hf2.sun_map(light)
        if sm2 is not None:
            break
    assert sm2 is not None
    assert hf2._sun[0] == hf2._version


@pytest.mark.parametrize("lod", [0, 1, 2, 3, 4, 5])
def test_column_tops_equal_voxel_top_maxpool(lod):
    """The (4,4) column tops are exactly the 8x8 max-pool of the (32,32)
    voxel tops at every LOD (systems/worldsvo.py derives them that way)."""
    rng = np.random.default_rng(29)
    vox = (rng.random((32, 32, 32)) < 0.1).astype(np.uint32) * 3
    vt = chunk_voxel_tops(vox, lod)
    ct = chunk_column_tops(vox, lod)
    assert (vt.reshape(4, 8, 4, 8).max(axis=(1, 3)) == ct).all()
