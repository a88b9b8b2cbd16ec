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


def qnet_fold_noise(params: QNetParams, noise: QNetNoise) -> QNetParams:
    """Fold one factorized-noise draw into the noisy heads:
    ``mu' = mu + sigma * eps``, sigmas zeroed.

    Models the reference's stale-noise frozen A: ``train_iterative.py``
    leaves modelA in train mode, so A plays with whatever noise buffers
    its checkpoint carried — FIXED for the whole generation (only B's
    noise is re-sampled per step, :124-130). A mu-forward of the folded
    params == a train-mode forward of the originals under that one draw,
    so the quirk costs nothing in-kernel (``selfplay.frozen_a_stale_noise``)."""

    def fold(p: NoisyParams, n: NoisyNoise) -> NoisyParams:
        return NoisyParams(
            w_mu=p.w_mu + p.w_sigma * n.eps_w,
            w_sigma=jnp.zeros_like(p.w_sigma),
            b_mu=p.b_mu + p.b_sigma * n.eps_b,
            b_sigma=jnp.zeros_like(p.b_sigma),
        )

    return params._replace(
        fc_v=fold(params.fc_v, noise.v),
        fc_a=fold(params.fc_a, noise.a),
    )


def bot_qnet_params(
    tolerance: float = 0.02,
    obs_dim: int = OBS_DIM,
    hidden: int = HIDDEN,
) -> QNetParams:
    """The HardcodedBallFollower bot expressed EXACTLY as QNet weights.

    Lets the baseline bot (ref arena.py:199-219) join anything built for
    QNet parameter stacks — training opponent pools, promotion-gate
    pools, the fused eval kernels — with zero special-casing. With
    ``d = my_paddle_x - ball_x`` the construction is::

        feat1: h0 = relu(d), h1 = relu(-d)        (so h0 - h1 == d)
        feat2: identity pass-through of h0, h1
        fc_A (mu):  A = [d, tolerance, -d]        (all sigmas zero)

    ``argmax A`` = move left iff ``d > tolerance``, right iff
    ``-d > tolerance``, else stay — exactly
    ``models/policy.py::ball_follower_action``, including the dead zone
    (boundary ties `d == ±tolerance` resolve to the move, a
    measure-zero deviation). All noise sigmas are zero, so the policy is
    identical in train mode (NoisyNet noise multiplies into nothing) and
    eval mode.
    """
    z = jnp.zeros
    w1 = z((obs_dim, hidden), jnp.float32)
    w1 = w1.at[4, 0].set(1.0).at[0, 0].set(-1.0)     # h0 = relu(my_x - ball_x)
    w1 = w1.at[4, 1].set(-1.0).at[0, 1].set(1.0)     # h1 = relu(ball_x - my_x)
    w2 = z((hidden, hidden), jnp.float32)
    w2 = w2.at[0, 0].set(1.0).at[1, 1].set(1.0)
    wa = z((hidden, N_ACTIONS), jnp.float32)
    wa = wa.at[0, 0].set(1.0).at[1, 0].set(-1.0)     # A(left)  = d
    wa = wa.at[0, 2].set(-1.0).at[1, 2].set(1.0)     # A(right) = -d
    ba = z((N_ACTIONS,), jnp.float32).at[1].set(float(tolerance))
    return QNetParams(
        feat1=DenseParams(w=w1, b=z((hidden,), jnp.float32)),
        feat2=DenseParams(w=w2, b=z((hidden,), jnp.float32)),
        fc_v=NoisyParams(
            w_mu=z((hidden, 1), jnp.float32),
            w_sigma=z((hidden, 1), jnp.float32),
            b_mu=z((1,), jnp.float32),
            b_sigma=z((1,), jnp.float32),
        ),
        fc_a=NoisyParams(
            w_mu=wa,
            w_sigma=z((hidden, N_ACTIONS), jnp.float32),
            b_mu=ba,
            b_sigma=z((N_ACTIONS,), jnp.float32),
        ),
    )
