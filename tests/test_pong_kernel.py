"""Pallas fused-rollout kernel vs the XLA scan path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from pingpong_tpu.config import EnvConfig
from pingpong_tpu.env.pong import (
    env_params_from_config,
    observe,
    reset,
    step,
)
from pingpong_tpu.models.policy import ball_follower_action
from pingpong_tpu.ops.pong_kernel import pallas_rollout

CFG = EnvConfig(enable_spin=True, magnus_factor=0.01)
B = 256  # 2 rows x 128 lanes


def _batch_state(key):
    params = env_params_from_config(CFG)
    keys = jax.random.split(key, B)
    return params, jax.vmap(reset, in_axes=(None, 0))(params, keys)


def xla_rollout(params, state, steps, tol):
    def one(carry, _):
        st = carry
        obs_a, obs_b = observe(st)
        aa = ball_follower_action(obs_a, tolerance=tol)
        ab = ball_follower_action(obs_b, tolerance=tol)
        st, out = jax.vmap(step, in_axes=(None, 0, 0, 0))(params, st, aa, ab)
        return st, out.reward_b

    state, rewards = jax.lax.scan(one, state, None, length=steps)
    return state, rewards.sum(axis=0)


def test_kernel_matches_xla_before_any_reset():
    params, state = _batch_state(jax.random.PRNGKey(0))
    steps = 30  # short horizon: bots catch everything, no resets
    ks, kr = pallas_rollout(
        params, state, steps, seed=7, bot_tolerance=0.02,
        tile_rows=1, interpret=True,
    )
    xs, xr = xla_rollout(params, state, steps, 0.02)
    # envs with no score events diverge in neither impl (no serve RNG
    # involved): their trajectories must agree exactly
    untouched = (np.asarray(xs.score_a) == 0) & (np.asarray(xs.score_b) == 0)
    assert untouched.mean() > 0.6  # most rallies survive 30 steps
    for name in ("ball_x", "ball_y", "ball_vx", "ball_vy", "spin",
                 "top_paddle_x", "bottom_paddle_x"):
        a = np.asarray(getattr(ks, name))[untouched]
        b = np.asarray(getattr(xs, name))[untouched]
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg=name)
    np.testing.assert_allclose(
        np.asarray(kr)[untouched], np.asarray(xr)[untouched], atol=1e-6
    )


def test_kernel_long_rollout_sane():
    params, state = _batch_state(jax.random.PRNGKey(1))
    steps = 400
    ks, kr = pallas_rollout(
        params, state, steps, seed=3, bot_tolerance=0.02,
        tile_rows=1, interpret=True,
    )
    # auto-reset keeps everything in bounds and scores bounded
    assert np.asarray(ks.ball_x).min() >= 0 and np.asarray(ks.ball_x).max() <= 1
    assert np.asarray(ks.score_a).max() < CFG.max_score
    assert np.asarray(ks.t).max() <= steps
    assert np.isfinite(np.asarray(kr)).all()


def test_kernel_deterministic_same_seed():
    params, state = _batch_state(jax.random.PRNGKey(2))
    a1, r1 = pallas_rollout(params, state, 200, seed=11, tile_rows=1,
                            interpret=True)
    a2, r2 = pallas_rollout(params, state, 200, seed=11, tile_rows=1,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(a1.ball_x), np.asarray(a2.ball_x))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
