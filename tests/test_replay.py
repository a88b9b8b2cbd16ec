"""PER buffer unit tests."""

import numpy as np
import jax
import jax.numpy as jnp

from pingpong_tpu.replay.per import (
    Transition,
    beta_schedule,
    per_init,
    per_push,
    per_sample,
    per_update_priorities,
)


def make_batch(n, start=0):
    return Transition(
        obs=jnp.arange(start, start + n, dtype=jnp.float32)[:, None] * jnp.ones(7),
        action=jnp.arange(start, start + n, dtype=jnp.int32) % 3,
        reward=jnp.ones((n,), jnp.float32),
        next_obs=jnp.zeros((n, 7), jnp.float32),
        done=jnp.zeros((n,), jnp.bool_),
    )


def test_push_ring_and_max_priority():
    buf = per_init(8)
    buf = per_push(buf, make_batch(3))
    assert int(buf.size) == 3 and int(buf.pos) == 3
    np.testing.assert_allclose(np.asarray(buf.prios[:3]), 1.0)
    # bump a priority, then push more: new entries get the new max
    buf = per_update_priorities(buf, jnp.asarray([1]), jnp.asarray([5.0]))
    buf = per_push(buf, make_batch(2, start=10))
    np.testing.assert_allclose(np.asarray(buf.prios[3:5]), 5.0 + 1e-6)
    # wrap-around
    buf = per_push(buf, make_batch(5, start=20))
    assert int(buf.size) == 8 and int(buf.pos) == 2
    # slot 0 was overwritten by the wrap (start=20 batch elements 3,4)
    np.testing.assert_allclose(float(buf.obs[0, 0]), 23.0)


def test_sampling_follows_priorities():
    buf = per_init(64)
    buf = per_push(buf, make_batch(64))
    # give index 7 overwhelming priority
    buf = per_update_priorities(buf, jnp.asarray([7]), jnp.asarray([1000.0]))
    s = per_sample(buf, jax.random.PRNGKey(0), 256, alpha=1.0, beta=jnp.float32(0.4))
    frac = (np.asarray(s.indices) == 7).mean()
    assert frac > 0.9
    # weights: rare (low-prio) samples get the max weight 1.0
    assert np.asarray(s.weights).max() <= 1.0 + 1e-6
    hi = np.asarray(s.weights)[np.asarray(s.indices) == 7]
    lo = np.asarray(s.weights)[np.asarray(s.indices) != 7]
    if len(lo):
        assert hi.max() < lo.min()


def test_sample_respects_fill_level():
    buf = per_init(128)
    buf = per_push(buf, make_batch(10))
    s = per_sample(buf, jax.random.PRNGKey(1), 512, alpha=0.6, beta=jnp.float32(1.0))
    assert np.asarray(s.indices).max() < 10
    # uniform priorities -> importance weights all 1
    np.testing.assert_allclose(np.asarray(s.weights), 1.0, rtol=1e-5)


def test_alpha_flattens_distribution():
    buf = per_init(32)
    buf = per_push(buf, make_batch(32))
    buf = per_update_priorities(
        buf, jnp.arange(32), jnp.linspace(0.1, 10.0, 32)
    )
    s0 = per_sample(buf, jax.random.PRNGKey(2), 4096, alpha=0.0, beta=jnp.float32(0.4))
    counts = np.bincount(np.asarray(s0.indices), minlength=32)
    # alpha=0 -> uniform
    assert counts.min() > 4096 / 32 * 0.5


def test_beta_schedule():
    np.testing.assert_allclose(float(beta_schedule(jnp.int32(0), 0.4, 100)), 0.4, rtol=1e-6)
    np.testing.assert_allclose(float(beta_schedule(jnp.int32(50), 0.4, 100)), 0.7)
    assert float(beta_schedule(jnp.int32(500), 0.4, 100)) == 1.0


def test_update_priorities_abs_plus_eps():
    buf = per_init(8)
    buf = per_push(buf, make_batch(4))
    buf = per_update_priorities(buf, jnp.asarray([0, 2]), jnp.asarray([-2.0, 0.5]))
    np.testing.assert_allclose(float(buf.prios[0]), 2.0 + 1e-6)
    np.testing.assert_allclose(float(buf.prios[2]), 0.5 + 1e-6)
