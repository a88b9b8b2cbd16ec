"""Dueling NoisyNet DQN (feed-forward).

Re-design of the reference ``QNet`` (``/root/reference/models/qnet.py:52-75``):
noise-free feature trunk ``Linear(obs,64)-ReLU-Linear(64,64)-ReLU``, noisy
dueling heads ``fc_V: Noisy(64,1)`` / ``fc_A: Noisy(64,n_actions)``, and
``Q = V + (A - mean(A))``. Pure functions over a :class:`QNetParams`
pytree; noise is an explicit value (see models/noisy.py) so that one fresh
key per actor step reproduces the reference's per-step ``reset_noise()``
(train_iterative.py:124-130) without any mutable state under ``jit``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from pingpong_tpu.models.noisy import (
    DenseParams,
    NoisyNoise,
    NoisyParams,
    dense_apply,
    dense_init,
    noisy_apply,
    noisy_init,
    noisy_shape,
    sample_noise,
)

Array = jax.Array

OBS_DIM = 7
N_ACTIONS = 3
HIDDEN = 64


class QNetParams(NamedTuple):
    feat1: DenseParams
    feat2: DenseParams
    fc_v: NoisyParams
    fc_a: NoisyParams


class QNetNoise(NamedTuple):
    v: NoisyNoise
    a: NoisyNoise


def qnet_init(
    key: Array,
    obs_dim: int = OBS_DIM,
    n_actions: int = N_ACTIONS,
    hidden: int = HIDDEN,
) -> QNetParams:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return QNetParams(
        feat1=dense_init(k1, obs_dim, hidden),
        feat2=dense_init(k2, hidden, hidden),
        fc_v=noisy_init(k3, hidden, 1),
        fc_a=noisy_init(k4, hidden, n_actions),
    )


def qnet_sample_noise(key: Array, params: QNetParams) -> QNetNoise:
    """One fresh factorized-noise draw for both heads (= ``reset_noise()``)."""
    kv, ka = jax.random.split(key)
    return QNetNoise(
        v=sample_noise(kv, *noisy_shape(params.fc_v)),
        a=sample_noise(ka, *noisy_shape(params.fc_a)),
    )


def qnet_apply(
    params: QNetParams, obs: Array, noise: Optional[QNetNoise] = None
) -> Array:
    """Q-values, shape ``obs.shape[:-1] + (n_actions,)``.

    ``noise=None`` = eval mode (heads use mu weights only), matching the
    reference's ``model.eval()`` forward.
    """
    h = jax.nn.relu(dense_apply(params.feat1, obs))
    h = jax.nn.relu(dense_apply(params.feat2, h))
    v = noisy_apply(params.fc_v, h, noise.v if noise else None)
    a = noisy_apply(params.fc_a, h, noise.a if noise else None)
    return v + (a - jnp.mean(a, axis=-1, keepdims=True))


def qnet_greedy_action(params: QNetParams, obs: Array) -> Array:
    """Eval-mode argmax action (ref eval_vs_model, train_iterative.py:171-181)."""
    return jnp.argmax(qnet_apply(params, obs), axis=-1).astype(jnp.int32)
