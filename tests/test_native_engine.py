"""Native C++ engine: build, bind, and differential-test vs the JAX env."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pingpong_tpu.config import EnvConfig
from pingpong_tpu.env.pong import EnvState, env_params_from_config, step
from pingpong_tpu.native.engine import (
    NativeEngine,
    SoAState,
    engine_available,
)

pytestmark = pytest.mark.skipif(
    not engine_available(), reason="g++ toolchain unavailable"
)

CFG = EnvConfig()


def random_state(n, seed=0):
    rng = np.random.default_rng(seed)
    s = SoAState.zeros(n)
    s.ball_x[:] = rng.uniform(0.05, 0.95, n).astype(np.float32)
    s.ball_y[:] = rng.uniform(0.05, 0.95, n).astype(np.float32)
    ang = rng.uniform(np.deg2rad(20), np.deg2rad(70), n) * rng.choice([-1, 1], n)
    speed = rng.uniform(0.01, 0.05, n)
    s.ball_vx[:] = (speed * np.cos(ang)).astype(np.float32)
    s.ball_vy[:] = (speed * np.sin(ang)).astype(np.float32)
    s.spin[:] = rng.uniform(-10, 10, n).astype(np.float32)
    s.top_x[:] = rng.uniform(0.2, 0.8, n).astype(np.float32)
    s.bottom_x[:] = rng.uniform(0.2, 0.8, n).astype(np.float32)
    return s


def to_env_state(s: SoAState) -> EnvState:
    # NB: jnp.asarray can zero-copy numpy buffers on CPU; the native engine
    # mutates them in place, so explicit copies are mandatory here.
    c = lambda a: jnp.array(np.copy(a))
    return EnvState(
        ball_x=c(s.ball_x), ball_y=c(s.ball_y),
        ball_vx=c(s.ball_vx), ball_vy=c(s.ball_vy),
        spin=c(s.spin),
        top_paddle_x=c(s.top_x),
        bottom_paddle_x=c(s.bottom_x),
        score_a=c(s.score_a), score_b=c(s.score_b),
        bounce_count=c(s.bounce), t=c(s.t),
        done=jnp.zeros(len(s.ball_x), bool),
    )


def test_differential_vs_jax_many_steps():
    # A chaotic system with discrete branches: an ULP difference at a
    # paddle-edge test can flip hit<->miss and fork the trajectory. The
    # differential harness therefore tracks a per-env agreement mask and
    # asserts the fork rate stays tiny while agreeing envs stay tight.
    n, steps = 512, 200
    native = NativeEngine(CFG)
    s = random_state(n, seed=1)
    jstate = to_env_state(s)
    params = env_params_from_config(CFG)
    vstep = jax.jit(jax.vmap(step, in_axes=(None, 0, 0, 0)))
    rng = np.random.default_rng(2)
    agree = np.ones(n, bool)
    for k in range(steps):
        aa = rng.integers(0, 3, n).astype(np.int32)
        ab = rng.integers(0, 3, n).astype(np.int32)
        rb_n, done_n = native.step(s, aa, ab)
        jstate, out = vstep(params, jstate, jnp.asarray(aa), jnp.asarray(ab))
        jx = np.asarray(jstate.ball_x)
        forked = np.abs(s.ball_x - jx) > 2e-5
        agree &= ~forked
        np.testing.assert_allclose(s.ball_x[agree], jx[agree], atol=2e-5,
                                   err_msg=f"ball_x at step {k}")
        np.testing.assert_allclose(
            s.ball_vy[agree], np.asarray(jstate.ball_vy)[agree], atol=2e-5)
        np.testing.assert_allclose(
            s.spin[agree], np.asarray(jstate.spin)[agree], atol=2e-3)
        np.testing.assert_array_equal(
            s.score_a[agree], np.asarray(jstate.score_a)[agree],
            err_msg=f"score_a at step {k}")
        np.testing.assert_allclose(
            rb_n[agree], np.asarray(out.reward_b)[agree])
    assert agree.mean() > 0.97, f"too many forks: {1 - agree.mean():.2%}"


def test_rollout_bot_terminates_and_is_fast():
    import time

    native = NativeEngine(CFG)
    n = 4096
    s = random_state(n, seed=3)
    t0 = time.perf_counter()
    reward, done = native.rollout_bot(s, steps=3000, tolerance=0.02)
    dt = time.perf_counter() - t0
    assert done.mean() > 0.5  # most games finish in 3000 steps
    steps_per_s = n * 3000 / dt  # upper bound (early-outs make it higher)
    assert steps_per_s > 1e6    # sanity: native engine is at least 1M steps/s
    assert np.isfinite(reward).all()


def test_scores_bounded_by_max_score():
    native = NativeEngine(CFG)
    s = random_state(64, seed=4)
    for _ in range(500):
        aa = np.ones(64, np.int32)
        ab = np.ones(64, np.int32)
        _, done = native.step(s, aa, ab)
    # scores beyond max only via post-done stepping (caller's choice, as in
    # the reference); they must at least be monotone and finite
    assert (s.score_a >= 0).all() and (s.score_b >= 0).all()
