"""Fused DRQN update kernel (ops/drqn_update.py) vs autodiff reference.

The reference below reproduces train/drqn.py::_update's per-update math
(fused online (s,s') forward, Double-DQN last-step target, masked Huber,
clip_by_global_norm + Adam on the raveled vector, hard sync / Polyak)
with jax.grad + optax on the SAME explicit minibatches and noise; the
kernel must match to float-reassociation tolerance, including its
hand-derived LSTM BPTT.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pingpong_tpu.models.qnet_rnn import (
    qnet_rnn_apply,
    qnet_rnn_init,
    qnet_rnn_sample_noise,
)
from pingpong_tpu.ops.drqn_update import (
    pack_upd_noise,
    pack_upd_params,
    pallas_drqn_update_block,
    unpack_upd_params,
)

K, BS, T = 3, 8, 4
GAMMA = 0.99
LR = 1e-3
CLIP = 1.0


def _inputs(seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 8)
    params = qnet_rnn_init(ks[0])
    target = qnet_rnn_init(ks[1])
    obs = jax.random.uniform(ks[2], (K, BS, T, 7), minval=-1, maxval=1)
    nxt = jax.random.uniform(ks[3], (K, BS, T, 7), minval=-1, maxval=1)
    act = jax.random.randint(ks[4], (K, BS), 0, 3)
    rew = jax.random.normal(ks[5], (K, BS))
    done = jax.random.bernoulli(ks[6], 0.2, (K, BS))
    valid = jax.random.bernoulli(ks[7], 0.9, (K, BS))
    noise_all = jax.vmap(
        lambda k: qnet_rnn_sample_noise(k, params)
    )(jax.random.split(jax.random.PRNGKey(seed + 100), K))
    return params, target, obs, nxt, act, rew, done, valid, noise_all


def _reference(params, target, obs, nxt, act, rew, done, valid, noise_all,
               interval, tau, train_steps0=0):
    from jax.flatten_util import ravel_pytree

    flat_b, unravel = ravel_pytree(params)
    flat_t, _ = ravel_pytree(target)
    tx = optax.chain(optax.clip_by_global_norm(CLIP), optax.adam(LR))
    opt_state = tx.init(flat_b)
    losses = []
    ts = train_steps0
    for k in range(K):
        noise = jax.tree_util.tree_map(lambda x: x[k], noise_all)
        sample_obs, sample_nxt = obs[k], nxt[k]
        w = valid[k].astype(jnp.float32)
        tparams = unravel(flat_t)
        q_t, _ = qnet_rnn_apply(
            tparams, sample_nxt,
            _zero_hidden(tparams, BS), None,
        )

        def loss_fn(flat):
            p = unravel(flat)
            x = jnp.concatenate([sample_obs, sample_nxt])
            q, _ = qnet_rnn_apply(p, x, _zero_hidden(p, 2 * BS), noise)
            q_last, q_no = q[:BS], q[BS:]
            q_a = jnp.take_along_axis(q_last, act[k][:, None], -1)[:, 0]
            na = jnp.argmax(q_no, -1)
            nq = jnp.take_along_axis(q_t, na[:, None], -1)[:, 0]
            y = rew[k] + GAMMA * nq * (1.0 - done[k].astype(jnp.float32))
            td = q_a - jax.lax.stop_gradient(y)
            h = jnp.where(jnp.abs(td) <= 1.0, 0.5 * td * td,
                          jnp.abs(td) - 0.5)
            return jnp.sum(w * h) / jnp.maximum(jnp.sum(w), 1.0)

        loss, g = jax.value_and_grad(loss_fn)(flat_b)
        upd, opt_state = tx.update(g, opt_state, flat_b)
        flat_b = optax.apply_updates(flat_b, upd)
        ts += 1
        if tau > 0.0:
            flat_t = flat_t + tau * (flat_b - flat_t)
        else:
            flat_t = jnp.where((ts % interval) == 0, flat_b, flat_t)
        losses.append(loss)
    return unravel(flat_b), unravel(flat_t), jnp.stack(losses)


def _zero_hidden(params, n):
    from pingpong_tpu.models.qnet_rnn import init_hidden

    return init_hidden(params, (n,))


def _run_kernel(params, target, obs, nxt, act, rew, done, valid, noise_all,
                interval, tau, train_steps0=0):
    po = pack_upd_params(params)
    pt = pack_upd_params(target)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, po)
    o2, t2, m2, v2, losses, ts2 = pallas_drqn_update_block(
        jnp.int32(train_steps0), jnp.int32(0),
        obs, nxt, act, rew, done, valid,
        pack_upd_noise(noise_all), po, pt, zeros, zeros,
        K=K, bs=BS, T=T, lr=LR, clip=CLIP, gamma=GAMMA,
        interval=interval, tau=tau, interpret=True,
    )
    return (
        unpack_upd_params(o2, params),
        unpack_upd_params(t2, target),
        losses,
        ts2,
    )


def _assert_trees_close(a, b, rtol=2e-5, atol=2e-6):
    fa = jax.flatten_util.ravel_pytree(a)[0]
    fb = jax.flatten_util.ravel_pytree(b)[0]
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                               rtol=rtol, atol=atol)


@pytest.mark.parametrize("interval,tau,ts0", [
    (10_000, 0.0, 0),     # no sync in block
    (2, 0.0, 0),          # hard syncs mid-block
    (10_000, 0.05, 0),    # Polyak
    (10_000, 0.0, 123),   # bias correction at a later step count
])
def test_kernel_matches_autodiff(interval, tau, ts0):
    args = _inputs(0)
    ref_b, ref_t, ref_losses = _reference(*args, interval, tau, ts0)
    ker_b, ker_t, ker_losses, ts2 = _run_kernel(*args, interval, tau, ts0)
    np.testing.assert_allclose(np.asarray(ker_losses),
                               np.asarray(ref_losses), rtol=1e-5, atol=1e-6)
    _assert_trees_close(ker_b, ref_b)
    _assert_trees_close(ker_t, ref_t)
    assert int(ts2) == ts0 + K


def test_pack_unpack_roundtrip():
    params = qnet_rnn_init(jax.random.PRNGKey(3))
    rt = unpack_upd_params(pack_upd_params(params), params)
    _assert_trees_close(rt, params, rtol=0, atol=0)
