"""Cross-validation against the reference's own checked-in expected image.

Rebuilds the exact scene of reference src/graphics/svo.rs:342-399 (5x5
stone floor + 8 grass blocks, camera (2.5, 2.5, 7.5) looking -z, fov 72,
640x490, selected voxel (1,1,3), shadows, the reference's real PNG
textures) and diffs our render against
/root/reference/assets/tests/graphics_svo_render_expected.png with the
reference CI's 0.015 mean-abs-diff budget (.github/workflows/ci.yaml:40-42,
diff metric: framebuffer.rs:120-134).
"""

import os

import numpy as np
import pytest

REF = "/root/reference"
EXPECTED = os.path.join(REF, "assets/tests/graphics_svo_render_expected.png")
TEXTURES = os.path.join(REF, "assets/textures")

W, H = 640, 490


def _registry():
    """The reference render test's registry (svo.rs:323-339)."""
    from voxelrs_tpu.graphics.registry import Material, VoxelRegistry

    reg = VoxelRegistry()
    for name in ["stone", "stone_normal", "dirt", "dirt_normal",
                 "grass_side", "grass_side_normal",
                 "grass_top", "grass_top_normal"]:
        reg.add_texture_file(
            name, os.path.join(TEXTURES, f"{name.replace('_normal', '_n')}.png")
        )
    reg.add_material(0, Material())
    reg.add_material(1, Material().specular(70.0, 0.4).all_sides("stone").with_normals())
    reg.add_material(2, Material().specular(14.0, 0.4).top("grass_top").side("grass_side").bottom("dirt").with_normals())
    return reg


def _voxels():
    vox = np.zeros((32, 32, 32), np.uint32)
    for x in range(5):
        for z in range(5):
            vox[x, 0, z] = 1
    for x in (1, 3):
        for y in (1, 3):
            for z in (1, 3):
                vox[x, y, z] = 2
    return vox


def _params():
    from voxelrs_tpu.graphics.svo import RenderParams

    return RenderParams(
        cam_pos=np.array([2.5, 2.5, 7.5], np.float32),
        cam_fwd=np.array([0.0, 0.0, -1.0], np.float32),
        cam_up=np.array([0.0, 1.0, 0.0], np.float32),
        fov_y_rad=np.radians(72.0),
        aspect_ratio=W / H,
        ambient_intensity=0.3,
        light_dir=np.array([-1.0, -1.0, -1.0], np.float32) / np.sqrt(3.0),
        render_shadows=True,
        shadow_distance=500.0,
        selected_voxel=np.array([1.0, 1.0, 3.0], np.float32),
    )


def _expected_u8():
    from PIL import Image

    return np.asarray(Image.open(EXPECTED).convert("RGB"), np.float64)


def _diff(actual01: np.ndarray, expected_u8: np.ndarray) -> float:
    """Reference diff metric: sum |r|+|g|+|b| / (255*3*pixels)."""
    act = np.round(np.clip(actual01[..., :3], 0.0, 1.0) * 255.0)
    return float(np.abs(act - expected_u8).mean() / 255.0)


@pytest.mark.skipif(not os.path.exists(EXPECTED), reason="reference assets absent")
@pytest.mark.parametrize("fmt", ["esvo", "csvo"])
def test_render_matches_reference_expected_png(fmt, monkeypatch):
    monkeypatch.setenv("VOXELRS_ADAPTIVE", "0")  # exact per-pixel render

    from voxelrs_tpu.graphics.svo import Svo
    from voxelrs_tpu.world import ChunkPos, Position

    vox = _voxels()
    if fmt == "esvo":
        from voxelrs_tpu.world.esvo import Esvo, SerializedChunk

        world = Esvo()
        world.set_leaf(
            Position(0, 0, 0), SerializedChunk.from_voxels(ChunkPos(0, 0, 0), vox, 5), True
        )
        world.serialize()
        svo = Svo(_registry(), capacity_mb=10)
    else:
        from voxelrs_tpu.world.csvo import Csvo, CsvoSerializedChunk

        world = Csvo()
        world.set_leaf(
            Position(0, 0, 0),
            CsvoSerializedChunk.from_voxels(ChunkPos(0, 0, 0), vox, 5), True
        )
        world.serialize()
        svo = Svo(_registry(), capacity_mb=10, buffer_dtype=np.uint8)

    svo.update(world)
    img = np.asarray(svo.render(_params(), W, H, max_steps=400))
    assert not np.isnan(img).any()

    d = _diff(img, _expected_u8())
    print(f"{fmt}: diff vs reference expected PNG = {d:.5f}")
    assert d < 0.015, f"{fmt} diff {d:.5f} >= 0.015"
