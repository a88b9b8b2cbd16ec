"""Recurrent dueling NoisyNet DQN (DRQN-style), scanned LSTM.

Re-design of the reference ``QNetRNN``
(``/root/reference/models/qnet_rnn.py:53-152``):

* per-frame feature MLP ``obs -> feature_dim//2 -> feature_dim`` with ReLU;
* LSTM over the feature sequence (``lstm_layers`` stacked cells, torch gate
  order i,f,g,o — verified against ``torch.nn.LSTM`` in tests);
* optional shared noisy head ``Noisy(lstm_hidden, head_hidden)+ReLU``;
* noisy dueling V/A heads applied to the **last timestep** LSTM output
  only (ref forward :107-144);
* ``init_hidden`` = zeros of shape ``(layers, batch, hidden)`` (ref :146-152).

TPU-native design: time is rolled with ``lax.scan`` (sequential by nature),
batch stays a free axis that ``vmap``/sharding can split. The same
``lstm_cell`` powers both training on ``(B, T, obs)`` traces and
single-step rollout with carried ``(h, c)``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

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


class LSTMLayerParams(NamedTuple):
    w_ih: Array   # (input, 4*hidden), gate order i,f,g,o
    w_hh: Array   # (hidden, 4*hidden)
    b_ih: Array   # (4*hidden,)
    b_hh: Array   # (4*hidden,)


class QNetRNNParams(NamedTuple):
    feat1: DenseParams
    feat2: DenseParams
    lstm: Tuple[LSTMLayerParams, ...]
    shared: Optional[NoisyParams]   # None when head_hidden_dim == 0
    fc_v: NoisyParams
    fc_a: NoisyParams


class QNetRNNNoise(NamedTuple):
    shared: Optional[NoisyNoise]
    v: NoisyNoise
    a: NoisyNoise


class Hidden(NamedTuple):
    h: Array   # (layers, batch, hidden) — or (layers, hidden) unbatched
    c: Array


def lstm_layer_init(key: Array, input_dim: int, hidden: int) -> LSTMLayerParams:
    ks = jax.random.split(key, 4)
    bound = 1.0 / jnp.sqrt(jnp.float32(hidden))

    def u(k, shape):
        return jax.random.uniform(k, shape, jnp.float32, -bound, bound)

    return LSTMLayerParams(
        w_ih=u(ks[0], (input_dim, 4 * hidden)),
        w_hh=u(ks[1], (hidden, 4 * hidden)),
        b_ih=u(ks[2], (4 * hidden,)),
        b_hh=u(ks[3], (4 * hidden,)),
    )


def _gates_to_hc(gates: Array, c: Array) -> Tuple[Array, Array]:
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_cell(
    p: LSTMLayerParams, x: Array, h: Array, c: Array
) -> Tuple[Array, Array]:
    """One LSTM step. x: (..., input), h/c: (..., hidden)."""
    gates = x @ p.w_ih + p.b_ih + h @ p.w_hh + p.b_hh
    return _gates_to_hc(gates, c)


def qnet_rnn_init(
    key: Array,
    obs_dim: int = OBS_DIM,
    n_actions: int = N_ACTIONS,
    feature_dim: int = 128,
    lstm_hidden_dim: int = 128,
    lstm_layers: int = 1,
    head_hidden_dim: int = 128,
) -> QNetRNNParams:
    keys = jax.random.split(key, 5 + lstm_layers)
    lstm = tuple(
        lstm_layer_init(
            keys[2 + l],
            feature_dim if l == 0 else lstm_hidden_dim,
            lstm_hidden_dim,
        )
        for l in range(lstm_layers)
    )
    shared = (
        noisy_init(keys[-3], lstm_hidden_dim, head_hidden_dim)
        if head_hidden_dim > 0
        else None
    )
    head_in = head_hidden_dim if head_hidden_dim > 0 else lstm_hidden_dim
    return QNetRNNParams(
        feat1=dense_init(keys[0], obs_dim, feature_dim // 2),
        feat2=dense_init(keys[1], feature_dim // 2, feature_dim),
        lstm=lstm,
        shared=shared,
        fc_v=noisy_init(keys[-2], head_in, 1),
        fc_a=noisy_init(keys[-1], head_in, n_actions),
    )


def qnet_rnn_sample_noise(key: Array, params: QNetRNNParams) -> QNetRNNNoise:
    ks, kv, ka = jax.random.split(key, 3)
    shared = (
        sample_noise(ks, *noisy_shape(params.shared))
        if params.shared is not None
        else None
    )
    return QNetRNNNoise(
        shared=shared,
        v=sample_noise(kv, *noisy_shape(params.fc_v)),
        a=sample_noise(ka, *noisy_shape(params.fc_a)),
    )


def init_hidden(params: QNetRNNParams, batch_shape: Tuple[int, ...] = ()) -> Hidden:
    """Zero hidden state (ref init_hidden, qnet_rnn.py:146-152)."""
    layers = len(params.lstm)
    hidden = params.lstm[0].w_hh.shape[0]
    shape = (layers,) + tuple(batch_shape) + (hidden,)
    return Hidden(h=jnp.zeros(shape, jnp.float32), c=jnp.zeros(shape, jnp.float32))


def _features(params: QNetRNNParams, obs: Array) -> Array:
    h = jax.nn.relu(dense_apply(params.feat1, obs))
    return jax.nn.relu(dense_apply(params.feat2, h))


def _lstm_step(
    params: QNetRNNParams, feat: Array, hidden: Hidden
) -> Tuple[Array, Hidden]:
    """Advance all stacked layers one timestep. feat: (..., feature_dim)."""
    hs, cs = [], []
    x = feat
    for l, layer in enumerate(params.lstm):
        h_new, c_new = lstm_cell(layer, x, hidden.h[l], hidden.c[l])
        hs.append(h_new)
        cs.append(c_new)
        x = h_new
    return x, Hidden(h=jnp.stack(hs), c=jnp.stack(cs))


def _dueling_head(
    params: QNetRNNParams, x: Array, noise: Optional[QNetRNNNoise]
) -> Array:
    if params.shared is not None:
        x = jax.nn.relu(
            noisy_apply(params.shared, x, noise.shared if noise else None)
        )
    v = noisy_apply(params.fc_v, x, noise.v if noise else None)
    a = noisy_apply(params.fc_a, x, noise.a if noise else None)
    return v + (a - jnp.mean(a, axis=-1, keepdims=True))


def qnet_rnn_apply(
    params: QNetRNNParams,
    obs_seq: Array,
    hidden: Hidden,
    noise: Optional[QNetRNNNoise] = None,
) -> Tuple[Array, Hidden]:
    """Sequence forward: obs_seq (B, T, obs) or (T, obs), returns
    (Q of last timestep, next hidden) — the reference forward (:107-144).

    TPU shape: layer 0's input projection ``x @ w_ih + b_ih`` is hoisted
    out of the time scan and computed for ALL timesteps as one batched
    matmul (inputs are known upfront; only the h-recurrence is inherently
    sequential) — halving the scanned matmul chain. Algebraically
    identical up to float reassociation.
    """
    batched = obs_seq.ndim == 3
    time_axis = 1 if batched else 0
    feats = _features(params, obs_seq)          # (..., T, feature)
    feats_t = jnp.moveaxis(feats, time_axis, 0)  # (T, ..., feature)
    l0 = params.lstm[0]
    xp0_t = feats_t @ l0.w_ih + l0.b_ih          # (T, ..., 4*hidden)

    def scan_fn(carry: Hidden, xs):
        xp0, x_t = xs
        hs, cs = [], []
        x = x_t
        for l, layer in enumerate(params.lstm):
            if l == 0:
                gates = xp0 + carry.h[0] @ layer.w_hh + layer.b_hh
                h_new, c_new = _gates_to_hc(gates, carry.c[0])
            else:
                h_new, c_new = lstm_cell(layer, x, carry.h[l], carry.c[l])
            hs.append(h_new)
            cs.append(c_new)
            x = h_new
        return Hidden(h=jnp.stack(hs), c=jnp.stack(cs)), x

    # trace windows are short and static (trace_length=8 by default):
    # fully unrolling the time loop removes per-iteration loop overhead
    # and lets XLA fuse the elementwise gate chain across steps — the
    # training update is latency-bound, not FLOP-bound
    final_hidden, outs = jax.lax.scan(
        scan_fn, hidden, (xp0_t, feats_t), unroll=True
    )
    last = outs[-1]                              # (..., hidden)
    q = _dueling_head(params, last, noise)
    return q, final_hidden


def qnet_rnn_step(
    params: QNetRNNParams,
    obs: Array,
    hidden: Hidden,
    noise: Optional[QNetRNNNoise] = None,
) -> Tuple[Array, Hidden]:
    """Single-timestep forward for rollout: obs (..., obs_dim)."""
    feat = _features(params, obs)
    out, new_hidden = _lstm_step(params, feat, hidden)
    q = _dueling_head(params, out, noise)
    return q, new_hidden
