"""Golden dynamics tests for the pong family — pinning the step semantics
against hand-computed reference traces (the if-chains, bounce windows, and
clamping quirks documented in envs/pong_family.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scmgan_tpu.envs import pong_family as pf


def test_mediumpong_ball_bounces_at_right_wall(key):
    s = pf.MediumpongState(jnp.int32(10), jnp.int32(10), jnp.int32(58),
                           jnp.int32(30), jnp.int32(2))
    s2, _, _ = pf.mediumpong_step(s, jnp.int32(0), key)
    # ball moves to 60 >= 64-5, velocity flips (envs/mediumpong.py:50-55)
    assert int(s2.ball_x) == 60
    assert int(s2.vel) == -2


def test_mediumpong_paddles_unclamped(key):
    # mediumpong does NOT clamp paddles in step (clipped only at render)
    s = pf.MediumpongState(jnp.int32(0), jnp.int32(0), jnp.int32(30),
                           jnp.int32(30), jnp.int32(2))
    s2, _, _ = pf.mediumpong_step(s, jnp.int32(0), key)  # right paddle up
    assert int(s2.right_y) == -3


def test_superpong_sequential_bounce_order(key):
    """Wall flip happens BEFORE the paddle check, which then sees the
    updated velocity (envs/superpong.py:57-66 if-chain)."""
    # ball at 60 moving +2 -> 62 >= 61 triggers wall flip; right paddle
    # aligned would re-flip ONLY if vx still > 0 — it isn't.
    s = pf.VelState(jnp.int32(32), jnp.int32(62), jnp.int32(60),
                    jnp.int32(62), jnp.int32(2), jnp.int32(2))
    s2, _, _ = pf.superpong_step(s, jnp.int32(4) % 4, key)
    assert int(s2.vel_x) == -2  # single net flip


def test_hardpong_paddle_clamp(key):
    s = pf.VelState(jnp.int32(64), jnp.int32(64), jnp.int32(30),
                    jnp.int32(30), jnp.int32(2), jnp.int32(2))
    s2, _, _ = pf.hardpong_step(s, jnp.int32(1), key)  # right paddle down
    assert int(s2.right_y) == 64  # clamped at GAME_SIZE


def test_realpong_red_scores_negative_and_done(key):
    s = pf.VelState(jnp.int32(32), jnp.int32(32), jnp.int32(1),
                    jnp.int32(32), jnp.int32(-3), jnp.int32(2))
    s2, r, done = pf.realpong_step(s, jnp.int32(0), key)
    assert float(r[0]) == -1.0
    assert bool(done)


def test_minipong_render_is_monochrome(key):
    s = pf.MinipongState(jnp.int32(20), jnp.int32(40), jnp.int32(30),
                         jnp.int32(30))
    f = np.asarray(pf.minipong_render(s))
    # all three channels identical (white sprites, envs/minipong.py:52-73)
    np.testing.assert_array_equal(f[..., 0], f[..., 1])
    np.testing.assert_array_equal(f[..., 1], f[..., 2])
    assert f.max() == 1.0


def test_mediumpong_tail_rendered_right_of_ball(key):
    """The render-time velocity override (-1) puts the tail on the right
    (envs/mediumpong.py:70,88-91)."""
    s = pf.MediumpongState(jnp.int32(20), jnp.int32(40), jnp.int32(30),
                           jnp.int32(30), jnp.int32(2))
    f = np.asarray(pf.mediumpong_render(s))
    # green channel extends to ball_x + ball_size + 3 - 1 = 34
    assert f[30, 34, 1] == 1.0
    # color (0, 1, .5): red 0, blue 0.5 on tail pixels
    assert f[30, 34, 0] == 0.0 and f[30, 34, 2] == 0.5


def test_roomba_no_push_without_contact(key):
    from scmgan_tpu.envs import roomba

    s = roomba.State(robot_x=jnp.int32(10), robot_y=jnp.int32(10),
                     ball_x=jnp.int32(40), ball_y=jnp.int32(40))
    s2, r, _ = roomba.step(s, jnp.int32(1), key)
    assert float(r[0]) == 0.0
    assert int(s2.ball_x) == 40  # ball untouched
    assert int(s2.robot_x) == 13


def test_gridworld_clamps_at_margins(key):
    from scmgan_tpu.envs import gridworld

    s = gridworld.State(ball_x=jnp.int32(8), ball_y=jnp.int32(2))
    s2, _, _ = gridworld.step(s, jnp.int32(0), key)  # up: y-3 clamped
    assert int(s2.ball_y) == gridworld.MARGIN_Y
