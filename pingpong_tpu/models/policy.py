"""Batched action-selection policies.

The reference dispatches per model type in ``select_action_universal``
(``/root/reference/tests/test_round_robin.py:190-235``, ``arena.py:199-219``)
with batch-size-1 tensors per env step. Here every policy is a pure batched
function ``obs (B, 7) -> actions (B,)`` so thousands of envs act in one
fused forward on the MXU.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from pingpong_tpu.models.qnet import QNetParams, qnet_apply, qnet_sample_noise
from pingpong_tpu.models.qnet_rnn import (
    Hidden,
    QNetRNNParams,
    qnet_rnn_sample_noise,
    qnet_rnn_step,
)

Array = jax.Array


def epsilon_greedy(
    key: Array, q_values: Array, epsilon: Array, n_actions: int = 3
) -> Array:
    """Per-row epsilon-greedy over batched Q-values (B, n_actions)."""
    k_mask, k_rand = jax.random.split(key)
    batch = q_values.shape[:-1]
    explore = jax.random.uniform(k_mask, batch) < epsilon
    random_a = jax.random.randint(k_rand, batch, 0, n_actions, dtype=jnp.int32)
    greedy_a = jnp.argmax(q_values, axis=-1).astype(jnp.int32)
    return jnp.where(explore, random_a, greedy_a)


def qnet_act_train(
    key: Array, params: QNetParams, obs: Array, epsilon: Array
) -> Array:
    """Learner-side actor: fresh head noise + epsilon-greedy, the analog of
    the reference's per-step ``select_action_B`` (train_iterative.py:124-130)
    which calls ``reset_noise()`` before every action."""
    k_noise, k_eps = jax.random.split(key)
    noise = qnet_sample_noise(k_noise, params)
    q = qnet_apply(params, obs, noise)
    return epsilon_greedy(k_eps, q, epsilon, q.shape[-1])


def qnet_act_greedy(params: QNetParams, obs: Array) -> Array:
    """Eval-mode greedy (no noise, no epsilon)."""
    return jnp.argmax(qnet_apply(params, obs), axis=-1).astype(jnp.int32)


def rnn_act_train(
    key: Array,
    params: QNetRNNParams,
    obs: Array,
    hidden: Hidden,
    epsilon: Array,
) -> Tuple[Array, Hidden]:
    """RNN actor step: advances hidden state even on explore branches (the
    reference always runs the forward to carry (h, c),
    train_rnn_iterative.py:371-389)."""
    k_noise, k_eps = jax.random.split(key)
    noise = qnet_rnn_sample_noise(k_noise, params)
    q, new_hidden = qnet_rnn_step(params, obs, hidden, noise)
    action = epsilon_greedy(k_eps, q, epsilon, q.shape[-1])
    return action, new_hidden


def rnn_act_greedy(
    params: QNetRNNParams, obs: Array, hidden: Hidden
) -> Tuple[Array, Hidden]:
    q, new_hidden = qnet_rnn_step(params, obs, hidden)
    return jnp.argmax(q, axis=-1).astype(jnp.int32), new_hidden


def ball_follower_action(obs: Array, tolerance: float = 0.02) -> Array:
    """HardcodedBallFollower baseline bot: chase ball_x with a dead zone.

    Reference semantics (test_round_robin.py:210-232 / arena.py:199-219):
    if ball_x < my_paddle_x - tol -> move left (0); if ball_x >
    my_paddle_x + tol -> move right (2); else stay (1). ``obs[..., 0]`` is
    ball_x, ``obs[..., 4]`` is the player's own paddle x.
    """
    ball_x = obs[..., 0]
    my_x = obs[..., 4]
    return jnp.where(
        ball_x < my_x - tolerance,
        jnp.int32(0),
        jnp.where(ball_x > my_x + tolerance, jnp.int32(2), jnp.int32(1)),
    )
