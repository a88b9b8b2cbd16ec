"""NoisyNet layers and plain dense layers as pure param-pytree functions.

Functional re-design of the reference ``NoisyLinear``
(``/root/reference/models/qnet.py:6-50``; duplicated at
``qnet_rnn.py:8-50``). Semantics preserved:

* learnable ``(w_mu, w_sigma, b_mu, b_sigma)``;
* factorized Gaussian noise ``eps_w = f(eps_out) ⊗ f(eps_in)``,
  ``eps_b = f(eps_out)`` with ``f(x) = sign(x) * sqrt(|x|)``;
* mu-init U(±1/sqrt(fan_in)), sigma-init constant (default 0.017);
* training forward uses ``mu + sigma * eps``; eval forward uses ``mu``.

TPU-native difference: noise is not a stateful buffer mutated by a
``reset_noise()`` method — it is a value drawn from an explicit PRNG key at
the call site (``sample_noise``), so noise refresh is just passing a new
key, and the whole actor/learner stays functionally pure under ``jit``.
Weights are stored as ``(in, out)`` so the MXU sees plain ``x @ w``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class NoisyParams(NamedTuple):
    w_mu: Array      # (in, out)
    w_sigma: Array   # (in, out)
    b_mu: Array      # (out,)
    b_sigma: Array   # (out,)


class NoisyNoise(NamedTuple):
    eps_w: Array     # (in, out)
    eps_b: Array     # (out,)


class DenseParams(NamedTuple):
    w: Array         # (in, out)
    b: Array         # (out,)


def dense_init(key: Array, in_features: int, out_features: int) -> DenseParams:
    """Plain linear layer, U(±1/sqrt(fan_in)) init for both w and b."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.float32(in_features))
    w = jax.random.uniform(kw, (in_features, out_features), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (out_features,), jnp.float32, -bound, bound)
    return DenseParams(w=w, b=b)


def dense_apply(params: DenseParams, x: Array) -> Array:
    return x @ params.w + params.b


def noisy_init(
    key: Array, in_features: int, out_features: int, sigma_init: float = 0.017
) -> NoisyParams:
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.float32(in_features))
    w_mu = jax.random.uniform(kw, (in_features, out_features), jnp.float32, -bound, bound)
    b_mu = jax.random.uniform(kb, (out_features,), jnp.float32, -bound, bound)
    w_sigma = jnp.full((in_features, out_features), sigma_init, jnp.float32)
    b_sigma = jnp.full((out_features,), sigma_init, jnp.float32)
    return NoisyParams(w_mu=w_mu, w_sigma=w_sigma, b_mu=b_mu, b_sigma=b_sigma)


def _scale_noise(key: Array, n: int) -> Array:
    x = jax.random.normal(key, (n,), jnp.float32)
    return jnp.sign(x) * jnp.sqrt(jnp.abs(x))


def sample_noise(key: Array, in_features: int, out_features: int) -> NoisyNoise:
    """Factorized Gaussian noise (the reference's ``reset_noise``)."""
    k_in, k_out = jax.random.split(key)
    eps_in = _scale_noise(k_in, in_features)
    eps_out = _scale_noise(k_out, out_features)
    return NoisyNoise(eps_w=jnp.outer(eps_in, eps_out), eps_b=eps_out)


def noisy_apply(
    params: NoisyParams, x: Array, noise: Optional[NoisyNoise] = None
) -> Array:
    """Forward. ``noise=None`` = eval mode (mu only)."""
    if noise is None:
        return x @ params.w_mu + params.b_mu
    w = params.w_mu + params.w_sigma * noise.eps_w
    b = params.b_mu + params.b_sigma * noise.eps_b
    return x @ w + b


def noisy_shape(params: NoisyParams) -> Tuple[int, int]:
    return params.w_mu.shape[0], params.w_mu.shape[1]
