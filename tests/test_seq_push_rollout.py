"""Bulk rollout push must be equivalent to per-step pushes."""

import numpy as np
import jax
import jax.numpy as jnp

from pingpong_tpu.replay.sequence import (
    seq_init,
    seq_push_rollout,
    seq_push_step,
)

TRACE = 3


def random_chunk(T, B, seed):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(T, B, 7)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 3, (T, B)).astype(np.int32)),
        jnp.asarray(rng.normal(size=(T, B)).astype(np.float32)),
        jnp.asarray(rng.random((T, B)) < 0.15),
    )


def assert_buf_equal(a, b):
    for name in a._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            err_msg=name,
        )


def test_bulk_equals_stepwise():
    T, B, R = 17, 5, 32
    obs, act, rew, done = random_chunk(T, B, 0)
    bulk = seq_push_rollout(seq_init(B, R), obs, act, rew, done, TRACE)
    steps = seq_init(B, R)
    for t in range(T):
        steps = seq_push_step(
            steps, obs[t], act[t], rew[t], done[t], TRACE
        )
    assert_buf_equal(bulk, steps)


def test_bulk_equals_stepwise_with_wrap_and_carryover():
    T, B, R = 13, 4, 16
    buf_a = seq_init(B, R)
    buf_b = seq_init(B, R)
    for chunk in range(4):  # 52 columns into a 16-ring: multiple wraps
        obs, act, rew, done = random_chunk(T, B, 10 + chunk)
        buf_a = seq_push_rollout(buf_a, obs, act, rew, done, TRACE)
        for t in range(T):
            buf_b = seq_push_step(
                buf_b, obs[t], act[t], rew[t], done[t], TRACE
            )
        assert_buf_equal(buf_a, buf_b)


def test_bulk_admission_counting():
    B, R = 2, 64
    T = 12
    done = np.zeros((T, B), bool)
    # env 0: episodes of length 4 (admitted), 2 (too short), rest in-flight
    done[3, 0] = True
    done[5, 0] = True
    # env 1: one episode of length 12 (admitted)
    done[11, 1] = True
    obs = jnp.zeros((T, B, 7))
    act = jnp.zeros((T, B), jnp.int32)
    rew = jnp.zeros((T, B))
    buf = seq_push_rollout(
        seq_init(B, R), obs, act, rew, jnp.asarray(done), TRACE
    )
    assert int(buf.ep_count) == 2
    np.testing.assert_array_equal(np.asarray(buf.cur_ep_id), [2, 1])
    np.testing.assert_array_equal(np.asarray(buf.cur_ep_len), [6, 0])


def test_bulk_equals_stepwise_with_episode_directory():
    """The directory (episode-uniform parity knob) must be byte-identical
    between bulk and per-step pushes, including append order and wrap of
    the directory ring itself."""
    T, B, R = 13, 4, 32
    buf_a = seq_init(B, R, dir_cap=8)
    buf_b = seq_init(B, R, dir_cap=8)
    for chunk in range(3):
        obs, act, rew, done = random_chunk(T, B, 20 + chunk)
        buf_a = seq_push_rollout(buf_a, obs, act, rew, done, TRACE)
        for t in range(T):
            buf_b = seq_push_step(
                buf_b, obs[t], act[t], rew[t], done[t], TRACE
            )
        assert_buf_equal(buf_a, buf_b)
    assert int(buf_a.dir_cursor) > 8  # directory ring wrapped at least once
