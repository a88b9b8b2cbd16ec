"""Batched match-runner tests."""

import numpy as np
import jax
import jax.numpy as jnp

from pingpong_tpu.config import EnvConfig
from pingpong_tpu.env.pong import env_params_from_config
from pingpong_tpu.evaluation.match import (
    BOT,
    QNET,
    RNN,
    PolicySpec,
    make_match_fn,
)
from pingpong_tpu.models import qnet_init, qnet_rnn_init

ENVP = env_params_from_config(EnvConfig())


def _stack(params_list):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params_list)


def test_all_games_terminate_and_have_winner():
    match = make_match_fn(ENVP, PolicySpec(QNET, None), PolicySpec(QNET, None),
                          max_steps=5000)
    a = _stack([qnet_init(jax.random.PRNGKey(0))])
    b = _stack([qnet_init(jax.random.PRNGKey(1))])
    n = 64
    keys = jax.random.split(jax.random.PRNGKey(2), n)
    idx = jnp.zeros((n,), jnp.int32)
    res = match(a, b, idx, idx, keys)
    total = np.asarray(res.win_a) | np.asarray(res.win_b) | np.asarray(res.draw)
    assert total.all()
    # someone reached max_score in (nearly) all games
    scores = np.maximum(np.asarray(res.score_a), np.asarray(res.score_b))
    assert (scores == 3).mean() > 0.9
    assert not (np.asarray(res.win_a) & np.asarray(res.win_b)).any()


def test_bot_vs_bot_is_long_rally():
    match = make_match_fn(ENVP, PolicySpec(BOT, None), PolicySpec(BOT, None),
                          max_steps=3000)
    n = 16
    keys = jax.random.split(jax.random.PRNGKey(3), n)
    idx = jnp.zeros((n,), jnp.int32)
    res = match(None, None, idx, idx, keys)
    # two perfect ball-followers rally for a long time
    assert np.asarray(res.steps).mean() > 50


def test_bot_beats_random_qnet():
    match = make_match_fn(ENVP, PolicySpec(BOT, None), PolicySpec(QNET, None),
                          max_steps=5000)
    b = _stack([qnet_init(jax.random.PRNGKey(1))])
    n = 128
    keys = jax.random.split(jax.random.PRNGKey(4), n)
    idx = jnp.zeros((n,), jnp.int32)
    res = match(None, b, idx, idx, keys)
    # the ball-follower should dominate an untrained net
    assert np.asarray(res.win_a).mean() > 0.7


def test_per_game_opponent_indexing():
    match = make_match_fn(ENVP, PolicySpec(QNET, None), PolicySpec(QNET, None),
                          max_steps=5000)
    a = _stack([qnet_init(jax.random.PRNGKey(i)) for i in range(3)])
    b = _stack([qnet_init(jax.random.PRNGKey(9))])
    n = 32
    keys = jax.random.split(jax.random.PRNGKey(5), n)
    idx_a = jnp.asarray(np.arange(n) % 3, jnp.int32)
    idx_b = jnp.zeros((n,), jnp.int32)
    res = match(a, b, idx_a, idx_b, keys)
    assert (np.asarray(res.score_a) + np.asarray(res.score_b) > 0).all()


def test_rnn_policy_side():
    match = make_match_fn(ENVP, PolicySpec(RNN, None), PolicySpec(QNET, None),
                          max_steps=2000)
    a = _stack([qnet_rnn_init(jax.random.PRNGKey(0), feature_dim=32,
                              lstm_hidden_dim=16, head_hidden_dim=0)])
    b = _stack([qnet_init(jax.random.PRNGKey(1))])
    n = 8
    keys = jax.random.split(jax.random.PRNGKey(6), n)
    idx = jnp.zeros((n,), jnp.int32)
    res = match(a, b, idx, idx, keys)
    assert (np.asarray(res.win_a) | np.asarray(res.win_b) | np.asarray(res.draw)).all()


def test_match_determinism():
    match = make_match_fn(ENVP, PolicySpec(QNET, None), PolicySpec(QNET, None))
    a = _stack([qnet_init(jax.random.PRNGKey(0))])
    b = _stack([qnet_init(jax.random.PRNGKey(1))])
    keys = jax.random.split(jax.random.PRNGKey(7), 16)
    idx = jnp.zeros((16,), jnp.int32)
    r1 = match(a, b, idx, idx, keys)
    r2 = match(a, b, idx, idx, keys)
    np.testing.assert_array_equal(np.asarray(r1.score_a), np.asarray(r2.score_a))
    np.testing.assert_array_equal(np.asarray(r1.win_b), np.asarray(r2.win_b))
