"""Env step/reset tests: oracle tracking, determinism, vmap batching."""

import numpy as np
import jax
import jax.numpy as jnp

from pingpong_tpu.config import EnvConfig
from pingpong_tpu.env import (
    EnvState,
    env_params_from_config,
    observe,
    reset,
    step,
    step_autoreset,
)
from tests.oracle import OracleEnv

CFG = EnvConfig()  # reference constructor defaults
TUNED = EnvConfig(
    paddle_speed=0.03, magnus_factor=0.025, restitution=1.0, friction=0.6,
    ball_speed_range=(0.03, 0.05), spin_range=(-5, 5),
    speed_scale_every=1, speed_increment=0.1,
)


def make_state(cfg, x, y, vx, vy, spin, top=0.5, bot=0.5):
    return EnvState(
        ball_x=jnp.float32(x), ball_y=jnp.float32(y),
        ball_vx=jnp.float32(vx), ball_vy=jnp.float32(vy),
        spin=jnp.float32(spin),
        top_paddle_x=jnp.float32(top), bottom_paddle_x=jnp.float32(bot),
        score_a=jnp.int32(0), score_b=jnp.int32(0),
        bounce_count=jnp.int32(0), t=jnp.int32(0),
        done=jnp.asarray(False),
    )


def oracle_from(cfg):
    return OracleEnv(
        paddle_width=cfg.paddle_width, paddle_speed=cfg.paddle_speed,
        max_score=cfg.max_score, enable_spin=cfg.enable_spin,
        magnus_factor=cfg.magnus_factor, restitution=cfg.restitution,
        friction=cfg.friction, ball_mass=cfg.ball_mass,
        ball_radius=cfg.world_ball_radius,
        speed_scale_every=cfg.speed_scale_every,
        speed_increment=cfg.speed_increment,
    )


def _run_against_oracle(cfg, seed, n_steps=400, tol=2e-4):
    rng = np.random.default_rng(seed)
    x, y = 0.5, 0.5
    ang = rng.uniform(np.deg2rad(30), np.deg2rad(60)) * rng.choice([-1, 1])
    speed = rng.uniform(*cfg.ball_speed_range)
    vx, vy = speed * np.cos(ang), speed * np.sin(ang)
    spin = rng.uniform(*cfg.spin_range)

    params = env_params_from_config(cfg)
    state = make_state(cfg, x, y, vx, vy, spin)
    oracle = oracle_from(cfg)
    oracle.set_state(x, y, vx, vy, spin)

    jstep = jax.jit(step)
    for i in range(n_steps):
        a_top = int(rng.integers(0, 3))
        a_bot = int(rng.integers(0, 3))
        state, out = jstep(params, state, jnp.int32(a_top), jnp.int32(a_bot))
        (ra, rb), done = oracle.step(a_top, a_bot)
        np.testing.assert_allclose(float(state.ball_x), oracle.x, atol=tol,
                                   err_msg=f"x at step {i}")
        np.testing.assert_allclose(float(state.ball_y), oracle.y, atol=tol,
                                   err_msg=f"y at step {i}")
        np.testing.assert_allclose(float(state.ball_vx), oracle.vx, atol=tol)
        np.testing.assert_allclose(float(state.ball_vy), oracle.vy, atol=tol)
        np.testing.assert_allclose(float(state.spin), oracle.spin, atol=tol * 50)
        assert float(out.reward_a) == ra and float(out.reward_b) == rb, i
        assert int(state.score_a) == oracle.score_a
        assert int(state.score_b) == oracle.score_b
        assert bool(out.done) == done
        if done:
            break


def test_golden_trajectory_defaults():
    for seed in range(4):
        _run_against_oracle(CFG, seed)


def test_golden_trajectory_tuned_config():
    for seed in range(4):
        _run_against_oracle(TUNED, seed + 100)


def test_reset_ranges_and_determinism():
    params = env_params_from_config(TUNED)
    keys = jax.random.split(jax.random.PRNGKey(7), 2048)
    batch = jax.vmap(reset, in_axes=(None, 0))(params, keys)
    speed = np.hypot(np.asarray(batch.ball_vx), np.asarray(batch.ball_vy))
    assert speed.min() >= TUNED.ball_speed_range[0] - 1e-6
    assert speed.max() <= TUNED.ball_speed_range[1] + 1e-6
    ang = np.rad2deg(np.arctan2(np.asarray(batch.ball_vy), np.asarray(batch.ball_vx)))
    assert np.all((np.abs(ang) >= 30 - 1e-4) & (np.abs(ang) <= 60 + 1e-4))
    # both serve intervals used
    assert (ang > 0).any() and (ang < 0).any()
    sp = np.asarray(batch.spin)
    assert sp.min() >= TUNED.spin_range[0] and sp.max() <= TUNED.spin_range[1]
    # bit-identical under same key
    batch2 = jax.vmap(reset, in_axes=(None, 0))(params, keys)
    for a, b in zip(jax.tree_util.tree_leaves(batch), jax.tree_util.tree_leaves(batch2)):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_batched_step_equals_scalar_step():
    params = env_params_from_config(CFG)
    keys = jax.random.split(jax.random.PRNGKey(3), 32)
    batch = jax.vmap(reset, in_axes=(None, 0))(params, keys)
    rng = np.random.default_rng(0)
    aA = jnp.asarray(rng.integers(0, 3, 32), jnp.int32)
    aB = jnp.asarray(rng.integers(0, 3, 32), jnp.int32)
    vstep = jax.jit(jax.vmap(step, in_axes=(None, 0, 0, 0)))
    bstate, bout = vstep(params, batch, aA, aB)
    for i in range(32):
        single = jax.tree_util.tree_map(lambda l: l[i], batch)
        sstate, sout = step(params, single, aA[i], aB[i])
        np.testing.assert_allclose(float(sstate.ball_x), float(bstate.ball_x[i]), atol=1e-6)
        np.testing.assert_allclose(float(sstate.ball_vy), float(bstate.ball_vy[i]), atol=1e-6)
        assert float(sout.reward_b) == float(bout.reward_b[i])


def test_miss_keeps_scoring_until_done():
    # Reference quirk: a missed ball is not reset; it keeps flying out of
    # bounds and scores every subsequent step until max_score ends the game
    # (my_pong_env_2p.py:179-186 early return leaves ball_y < 0).
    cfg = EnvConfig(enable_spin=False, max_score=3)
    params = env_params_from_config(cfg)
    # ball heading straight up, top paddle far away
    state = make_state(cfg, 0.9, 0.02, 0.0, -0.05, 0.0, top=0.1, bot=0.5)
    rewards = []
    for _ in range(4):
        state, out = step(params, state, jnp.int32(1), jnp.int32(1))
        rewards.append(float(out.reward_b))
        if bool(out.done):
            break
    assert rewards == [1.0, 1.0, 1.0]
    assert int(state.score_b) == 3
    assert bool(state.done)


def test_autoreset_reserves_ball():
    cfg = EnvConfig(enable_spin=False, max_score=1)
    params = env_params_from_config(cfg)
    state = make_state(cfg, 0.9, 0.02, 0.0, -0.05, 0.0, top=0.1)
    key = jax.random.PRNGKey(0)
    state2, out = step_autoreset(params, state, key, jnp.int32(1), jnp.int32(1))
    assert bool(out.done)
    assert float(out.reward_b) == 1.0
    # fresh serve from center
    assert float(state2.ball_x) == 0.5 and float(state2.ball_y) == 0.5
    assert int(state2.score_b) == 0 and int(state2.t) == 0


def test_truncation_cap():
    cfg = EnvConfig(enable_spin=False)
    params = env_params_from_config(cfg)
    state = make_state(cfg, 0.5, 0.5, 0.001, 0.0, 0.0)  # ball drifts sideways
    key = jax.random.PRNGKey(0)
    for i in range(5):
        state, out = step_autoreset(
            params, state, key, jnp.int32(1), jnp.int32(1), max_episode_steps=3
        )
    # t resets when cap reached; never exceeds cap
    assert int(state.t) <= 3


def test_observation_views():
    cfg = EnvConfig()
    state = make_state(cfg, 0.3, 0.8, 0.01, -0.02, 4.0, top=0.6, bot=0.2)
    obs_a, obs_b = observe(state)
    np.testing.assert_allclose(
        np.asarray(obs_a),
        [0.3, 1 - 0.8, 0.01, 0.02, 0.6, 0.2, 4.0], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(obs_b),
        [0.3, 0.8, 0.01, -0.02, 0.2, 0.6, 4.0], rtol=1e-6)


def test_wall_reflection_mirrors_position():
    cfg = EnvConfig(enable_spin=False)
    params = env_params_from_config(cfg)
    state = make_state(cfg, 0.02, 0.5, -0.05, 0.001, 0.0)
    state, _ = step(params, state, jnp.int32(1), jnp.int32(1))
    np.testing.assert_allclose(float(state.ball_x), 0.03, atol=1e-6)
    assert float(state.ball_vx) > 0
