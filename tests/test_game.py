"""Headless end-to-end: generate terrain on the job system until all queues
drain, render, and exercise gameplay edits
(model: reference gamelogic/world.rs:461-498 end-to-end test)."""

import numpy as np
import pytest

from voxelrs_tpu.gamelogic import content
from voxelrs_tpu.gamelogic.game import Game, GameArgs
from voxelrs_tpu.gamelogic.gameplay import Input


@pytest.fixture(scope="module")
def game():
    g = Game(
        GameArgs(
            player_pos=(16.0, 60.0, 16.0),
            player_euler_rot=(-30.0, 45.0, 0.0),
            render_distance=2,
            width=96,
            height=72,
            gpu_buffer_size_mb=16,
            workers=2,
        )
    )
    yield g
    g.shutdown()


def test_world_streams_and_renders(game):
    assert game.wait_for_world(timeout=120), "world did not finish loading"
    assert len(game.world.world.chunks) > 0
    assert game.world.world_svo.get_stats().used_bytes > 0

    img = np.asarray(game.step_frame(render=True, width=96, height=72))
    assert img.shape == (72, 96, 4)
    assert not np.isnan(img).any()
    # looking down at terrain: mostly not sky
    sky = img[..., 2] > 0.75
    assert sky.mean() < 0.9


def test_player_falls_when_not_flying(game):
    game.player.caps.flying = False
    y0 = float(game.player.position[1])
    for _ in range(5):
        game.step_frame(dt=1 / 60)
    assert game.player.position[1] < y0
    game.player.caps.flying = True


def test_look_ray_and_block_break(game):
    # aim straight down at the terrain below
    game.player.position = np.array([16.0, 40.0, 16.0], np.float32)
    game.player.euler_rotation[:] = (-np.pi / 2 + 1e-3, 0.0, 0.0)
    game.step_frame(dt=1 / 60)
    hit = game.gameplay.looking_at
    if hit is None:
        pytest.skip("terrain below is farther than the look ray")
    assert hit.did_hit()
    x, y, z = (int(np.floor(v)) for v in hit.pos)
    block_before = game.world.world.get_block(x, y, z)
    assert block_before != content.AIR

    game.input.buttons_pressed = {1}
    game.step_frame(dt=1 / 60)
    assert game.world.world.get_block(x, y, z) == content.AIR


def test_block_place_roundtrip(game):
    # place a block far from the player via the world API
    assert game.world.set_block(100, 50, 100, content.STONE)
    assert game.world.world.get_block(100, 50, 100) == content.STONE
    # placing AIR outside loaded chunks is a no-op
    assert not game.world.set_block(5000, 50, 5000, content.AIR)


def test_debug_stats(game):
    stats = game.debug_stats()
    assert stats["chunks_loaded"] > 0
    assert stats["svo"]["used_bytes"] > 0
    assert stats["chunk_slot_pool"]["allocated"] > 0
    assert isinstance(stats["player"]["position"], list)
