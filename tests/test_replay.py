"""PER buffer unit tests (two-level layout)."""

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

A = 0.6  # alpha used throughout


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
    buf = per_push(buf, make_batch(3), A)
    assert int(buf.size) == 3 and int(buf.pos) == 3
    np.testing.assert_allclose(np.asarray(buf.prios[:3]), 1.0)
    # bump a priority, then push more: new entries get the new max
    buf = per_update_priorities(buf, jnp.asarray([1]), jnp.asarray([5.0]), A)
    buf = per_push(buf, make_batch(2, start=10), A)
    np.testing.assert_allclose(np.asarray(buf.prios[3:5]), 5.0 + 1e-6)
    # wrap-around
    buf = per_push(buf, make_batch(5, start=20), A)
    assert int(buf.size) == 8 and int(buf.pos) == 2
    # slot 0 was overwritten by the wrap (start=20 batch elements 3,4)
    np.testing.assert_allclose(float(buf.obs[0, 0]), 23.0)


def test_mixed_push_sizes_misaligned_cursor_wraps_correctly():
    """cap % m == 0 but pos % m != 0: the slice fast path would clamp at the
    ring end and corrupt slots — must fall back to the scatter path."""
    buf = per_init(8)
    buf = per_push(buf, make_batch(4, start=0), A)    # pos=4
    buf = per_push(buf, make_batch(2, start=10), A)   # pos=6
    # m=4 divides cap=8 but pos=6 is misaligned; wraps to slots 6,7,0,1
    buf = per_push(buf, make_batch(4, start=20), A)
    assert int(buf.pos) == 2 and int(buf.size) == 8
    got = np.asarray(buf.obs[:, 0])
    np.testing.assert_allclose(got, [22, 23, 2, 3, 10, 11, 20, 21])


def test_chunk_summaries_consistent():
    buf = per_init(4096)
    n_chunks = buf.chunk_sums.shape[0]
    buf = per_push(buf, make_batch(1500), A)
    # duplicate indices exercise the incremental dedup path: each slot's
    # delta must count exactly once
    buf = per_update_priorities(
        buf, jnp.asarray([0, 700, 1400, 700, 0]),
        jnp.asarray([2.0, 3.0, 4.0, 9.0, 5.0]), A
    )
    p_alpha = np.asarray(buf.p_alpha)
    sums = p_alpha.reshape(n_chunks, -1).sum(axis=1)
    np.testing.assert_allclose(np.asarray(buf.chunk_sums), sums, rtol=1e-4)


def test_push_max_stamp_tracks_decreases():
    """The push stamp is the true max over priorities — it must DROP after
    updates lower the previous max (ref: prios.max() per push)."""
    buf = per_init(8)
    buf = per_push(buf, make_batch(4), A)
    buf = per_update_priorities(buf, jnp.asarray([1]), jnp.asarray([9.0]), A)
    buf = per_push(buf, make_batch(2, start=50), A)
    np.testing.assert_allclose(np.asarray(buf.prios[4:6]), 9.0 + 1e-6)
    # lower every priority below 1.0, next push stamps the new (lower) max
    buf = per_update_priorities(
        buf, jnp.arange(6), jnp.full((6,), 0.25), A, eps=0.0
    )
    buf = per_push(buf, make_batch(2, start=60), A)
    np.testing.assert_allclose(np.asarray(buf.prios[6:8]), 0.25)


def test_push_larger_than_chunk_wraps_summaries():
    buf = per_init(2048)
    n_chunks = buf.chunk_sums.shape[0]
    buf = per_push(buf, make_batch(2000), A)
    buf = per_push(buf, make_batch(1500, start=5000), A)  # wraps
    p_alpha = np.asarray(buf.p_alpha)
    sums = p_alpha.reshape(n_chunks, -1).sum(axis=1)
    np.testing.assert_allclose(np.asarray(buf.chunk_sums), sums, rtol=1e-5)
    assert int(buf.pos) == (2000 + 1500) % 2048


def test_sampling_follows_priorities():
    buf = per_init(64)
    buf = per_push(buf, make_batch(64), 1.0)
    # give index 7 overwhelming priority (alpha=1 for direct proportionality)
    buf = per_update_priorities(buf, jnp.asarray([7]), jnp.asarray([1000.0]), 1.0)
    s = per_sample(buf, jax.random.PRNGKey(0), 256, beta=jnp.float32(0.4))
    frac = (np.asarray(s.indices) == 7).mean()
    assert frac > 0.9
    assert np.asarray(s.weights).max() <= 1.0 + 1e-6
    hi = np.asarray(s.weights)[np.asarray(s.indices) == 7]
    lo = np.asarray(s.weights)[np.asarray(s.indices) != 7]
    if len(lo):
        assert hi.max() < lo.min()


def test_sampling_two_level_distribution():
    # priorities proportional across chunks: chunk hit counts must follow
    buf = per_init(4096)
    buf = per_push(buf, make_batch(4096), 1.0)
    prios = jnp.concatenate([
        jnp.full((1024,), 1.0), jnp.full((1024,), 3.0),
        jnp.full((1024,), 0.5), jnp.full((1024,), 0.0001),
    ])
    buf = per_update_priorities(buf, jnp.arange(4096), prios, 1.0, eps=0.0)
    s = per_sample(buf, jax.random.PRNGKey(1), 8192, beta=jnp.float32(0.0))
    counts = np.bincount(np.asarray(s.indices) // 1024, minlength=4)
    frac = counts / counts.sum()
    np.testing.assert_allclose(frac, [1 / 4.5, 3 / 4.5, 0.5 / 4.5, 0.0001 / 4.5],
                               atol=0.02)


def test_sample_respects_fill_level():
    buf = per_init(128)
    buf = per_push(buf, make_batch(10), A)
    s = per_sample(buf, jax.random.PRNGKey(1), 512, beta=jnp.float32(1.0))
    assert np.asarray(s.indices).max() < 10
    # uniform priorities -> importance weights all 1
    np.testing.assert_allclose(np.asarray(s.weights), 1.0, rtol=1e-5)


def test_beta_schedule():
    np.testing.assert_allclose(
        float(beta_schedule(jnp.int32(0), 0.4, 100)), 0.4, rtol=1e-6)
    np.testing.assert_allclose(float(beta_schedule(jnp.int32(50), 0.4, 100)), 0.7)
    assert float(beta_schedule(jnp.int32(500), 0.4, 100)) == 1.0


def test_update_priorities_abs_plus_eps():
    buf = per_init(8)
    buf = per_push(buf, make_batch(4), A)
    buf = per_update_priorities(buf, jnp.asarray([0, 2]), jnp.asarray([-2.0, 0.5]), A)
    np.testing.assert_allclose(float(buf.prios[0]), 2.0 + 1e-6)
    np.testing.assert_allclose(float(buf.prios[2]), 0.5 + 1e-6)
