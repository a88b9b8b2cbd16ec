"""Fused DQN update kernel (ops/dqn_update.py) vs autodiff reference.

Three layers of parity evidence:

1. kernel vs a jax.grad + optax reference reproducing train/dqn.py::_update's
   per-update math (PER sample via replay/per.py, IS-weighted MSE, flat Adam
   with the heads-only grad mask, hard sync / Polyak, sequential
   last-writer-wins priority write-back) on the SAME pre-drawn uniforms and
   noise — sampled indices must match EXACTLY, tensors to float-reassociation
   tolerance;
2. block replay layout (replay/per.py ``per_init(block=True)``) vs the classic
   row layout: pushes (slice + scatter paths) and samples must agree;
3. learner-level: a DQNLearner on the Pallas-interpret update path vs one on
   the XLA scan path, same seed/params, two full train iterations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.flatten_util import ravel_pytree

from pingpong_tpu.config import DQNConfig, EnvConfig
from pingpong_tpu.models.qnet import qnet_apply, qnet_init, qnet_sample_noise
from pingpong_tpu.ops.dqn_update import (
    pack_dqn_noise,
    pack_dqn_params,
    pallas_dqn_update_block,
    supports_pallas_dqn_update,
    unpack_dqn_params,
)
from pingpong_tpu.replay.per import (
    Transition,
    beta_schedule,
    per_init,
    per_push,
    per_sample,
)
from pingpong_tpu.train.dqn import DQNLearner, stack_opponents, trainable_mask

CAP = 16384          # smallest supported capacity (128^2)
BS = 128
K = 3
LR = 2.5e-4
GAMMA = 0.99
ALPHA = 0.6
PER_EPS = 1e-6
BETA_START = 0.4
BETA_FRAMES = 1000


def _random_batch(key, m):
    ks = jax.random.split(key, 5)
    return Transition(
        obs=jax.random.uniform(ks[0], (m, 7), minval=-1.0, maxval=1.0),
        action=jax.random.randint(ks[1], (m,), 0, 3),
        reward=jax.random.normal(ks[2], (m,)),
        next_obs=jax.random.uniform(ks[3], (m, 7), minval=-1.0, maxval=1.0),
        done=jax.random.bernoulli(ks[4], 0.2, (m,)),
    )


def _filled_buffer(seed, n_filled=512):
    key = jax.random.PRNGKey(seed)
    k_batch, k_prio = jax.random.split(key)
    buf = per_init(CAP, block=True)
    buf = per_push(buf, _random_batch(k_batch, n_filled), ALPHA)
    # heterogeneous priorities (pushes stamp a uniform max otherwise)
    prios = jnp.zeros((CAP,), jnp.float32).at[:n_filled].set(
        jax.random.uniform(k_prio, (n_filled,), minval=0.1, maxval=2.0)
    )
    p_alpha = jnp.where(prios > 0.0, prios ** ALPHA, 0.0)
    chunk_sums = jnp.sum(p_alpha.reshape(-1, 128), axis=1)
    return buf._replace(prios=prios, p_alpha=p_alpha, chunk_sums=chunk_sums)


def _inputs(seed=0):
    key = jax.random.PRNGKey(seed + 50)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = qnet_init(k1)
    target = qnet_init(k2)
    noise_all = jax.vmap(lambda k: qnet_sample_noise(k, params))(
        jax.random.split(k3, K)
    )
    u_all = jax.random.uniform(k4, (K, BS, 1), jnp.float32)
    return _filled_buffer(seed), params, target, noise_all, u_all


def _reference(buf, params, target, noise_all, u_all, interval, tau,
               heads_only, ts0, frame0):
    """train/dqn.py::_update semantics, one explicit python-loop update at a
    time; priority write-back is the reference's sequential last-writer-wins
    loop (train_iterative.py:69-72)."""
    flat_b, unravel = ravel_pytree(params)
    flat_t, _ = ravel_pytree(target)
    mask = ravel_pytree(
        jax.tree_util.tree_map(
            lambda p, m: jnp.full(jnp.shape(p), 1.0 if m else 0.0),
            params, trainable_mask(params, heads_only),
        )
    )[0]
    tx = optax.adam(LR)
    opt = tx.init(flat_b)
    prios = np.asarray(buf.prios).copy()
    p_alpha = np.asarray(buf.p_alpha).copy()
    losses, idx_all = [], []
    ts = ts0
    for k in range(K):
        chunk_sums = p_alpha.reshape(-1, 128).sum(axis=1, dtype=np.float32)
        jbuf = buf._replace(
            prios=jnp.asarray(prios),
            p_alpha=jnp.asarray(p_alpha),
            chunk_sums=jnp.asarray(chunk_sums),
        )
        beta = beta_schedule(jnp.int32(frame0 + k + 1), BETA_START, BETA_FRAMES)
        sample = per_sample(jbuf, None, BS, beta, u01=u_all[k, :, 0])
        tr = sample.batch
        noise = jax.tree_util.tree_map(lambda x: x[k], noise_all)
        tparams = unravel(flat_t)

        def loss_fn(flat):
            p = unravel(flat)
            q = qnet_apply(p, tr.obs, noise)
            q_a = jnp.take_along_axis(q, tr.action[:, None], -1)[:, 0]
            na = jnp.argmax(qnet_apply(p, tr.next_obs, noise), -1)
            q_t = qnet_apply(tparams, tr.next_obs, None)
            nq = jnp.take_along_axis(q_t, na[:, None], -1)[:, 0]
            y = tr.reward + GAMMA * nq * (1.0 - tr.done.astype(jnp.float32))
            td = q_a - jax.lax.stop_gradient(y)
            return jnp.mean(sample.weights * td * td), td

        (loss, td), g = jax.value_and_grad(loss_fn, has_aux=True)(flat_b)
        upd, opt = tx.update(g * mask, opt, flat_b)
        flat_b = optax.apply_updates(flat_b, upd)
        ts += 1
        if tau > 0.0:
            flat_t = flat_t + tau * (flat_b - flat_t)
        else:
            flat_t = jnp.where((ts % interval) == 0, flat_b, flat_t)
        losses.append(loss)
        idx = np.asarray(sample.indices)
        newp = np.abs(np.asarray(td)) + PER_EPS
        for i in range(BS):
            prios[idx[i]] = newp[i]
            p_alpha[idx[i]] = np.float32(newp[i]) ** np.float32(ALPHA)
        idx_all.append(idx)
    mu, nu = jax.tree_util.tree_leaves(opt)[1:3]
    return (unravel(flat_b), unravel(flat_t), unravel(mu), unravel(nu),
            jnp.stack(losses), np.stack(idx_all), prios, p_alpha)


def _run_kernel(buf, params, target, noise_all, u_all, interval, tau,
                heads_only, ts0, frame0):
    po = pack_dqn_params(params)
    pt = pack_dqn_params(target)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, po)
    nc = CAP // 128
    (pa2, cs2, o2, t2, m2, v2, newp, idx, losses, ts2) = (
        pallas_dqn_update_block(
            jnp.int32(ts0), jnp.int32(0), jnp.int32(frame0), buf.size,
            u_all, pack_dqn_noise(noise_all),
            buf.p_alpha.reshape(nc, 128), buf.chunk_sums.reshape(nc // 128, 128),
            po, pt, zeros, zeros, buf.data,
            K=K, bs=BS, lr=LR, gamma=GAMMA, interval=interval, tau=tau,
            alpha=ALPHA, per_eps=PER_EPS, beta_start=BETA_START,
            beta_frames=BETA_FRAMES, heads_only=heads_only, interpret=True,
        )
    )
    return (
        unpack_dqn_params(o2, params), unpack_dqn_params(t2, target),
        unpack_dqn_params(m2, params), unpack_dqn_params(v2, target),
        pa2.reshape(-1), cs2.reshape(-1), newp, idx, losses, ts2,
    )


def _assert_trees_close(a, b, rtol=2e-5, atol=2e-6):
    fa = np.asarray(ravel_pytree(a)[0])
    fb = np.asarray(ravel_pytree(b)[0])
    np.testing.assert_allclose(fa, fb, rtol=rtol, atol=atol)


@pytest.mark.parametrize("interval,tau,heads_only,ts0", [
    (10_000, 0.0, True, 0),      # no sync in block, frozen features
    (2, 0.0, True, 1),           # hard syncs mid-block, offset clock
    (10_000, 0.05, True, 0),     # Polyak
    (10_000, 0.0, False, 0),     # full backward through the trunk
])
def test_kernel_matches_autodiff(interval, tau, heads_only, ts0):
    buf, params, target, noise_all, u_all = _inputs(0)
    frame0 = 7
    (ref_b, ref_t, ref_m, ref_v, ref_losses, ref_idx, ref_prios,
     ref_pa) = _reference(buf, params, target, noise_all, u_all,
                          interval, tau, heads_only, ts0, frame0)
    (ker_b, ker_t, ker_m, ker_v, ker_pa, ker_cs, ker_newp, ker_idx,
     ker_losses, ker_ts) = _run_kernel(buf, params, target, noise_all,
                                       u_all, interval, tau, heads_only,
                                       ts0, frame0)
    # sampled slots must match EXACTLY or everything downstream is moot
    np.testing.assert_array_equal(np.asarray(ker_idx), ref_idx)
    np.testing.assert_allclose(np.asarray(ker_losses),
                               np.asarray(ref_losses), rtol=1e-5, atol=1e-6)
    _assert_trees_close(ker_b, ref_b)
    _assert_trees_close(ker_t, ref_t)
    _assert_trees_close(ker_m, ref_m, rtol=1e-4, atol=1e-7)
    _assert_trees_close(ker_v, ref_v, rtol=1e-4, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ker_pa), ref_pa,
                               rtol=1e-4, atol=1e-7)
    # chunk sums: kernel re-sums touched rows exactly
    np.testing.assert_allclose(
        np.asarray(ker_cs),
        ref_pa.reshape(-1, 128).sum(axis=1, dtype=np.float32),
        rtol=1e-4, atol=1e-6,
    )
    # raw-priority stream: |td| + eps of each update, in order
    touched = {}
    for k in range(K):
        for i in range(BS):
            touched[int(ker_idx[k, i])] = float(np.asarray(ker_newp)[k, i])
    for slot, val in touched.items():
        np.testing.assert_allclose(ref_prios[slot], val, rtol=5e-5)
    assert int(ker_ts) == ts0 + K


def test_pack_unpack_roundtrip():
    params = qnet_init(jax.random.PRNGKey(3))
    rt = unpack_dqn_params(pack_dqn_params(params), params)
    _assert_trees_close(rt, params, rtol=0, atol=0)


def test_shipped_config_engages_kernel():
    # configs/qnet.yaml must keep shapes inside the fused-kernel gate
    # (memory_size rounded to 2^20 etc.) — drifting out silently falls
    # back to the slower XLA scan path on TPU
    from pingpong_tpu.config.loader import load_config

    cfg = load_config("configs/qnet.yaml")
    assert supports_pallas_dqn_update(cfg.dqn)


def test_supports_gate():
    ok = DQNConfig(batch_size=256, memory_size=1 << 20, num_envs=4096,
                   rollout_length=64)
    assert supports_pallas_dqn_update(ok)
    bad_bs = DQNConfig(batch_size=100, memory_size=1 << 20, num_envs=4096,
                       rollout_length=64)
    assert not supports_pallas_dqn_update(bad_bs)
    bad_cap = DQNConfig(batch_size=256, memory_size=1_000_000, num_envs=4096,
                        rollout_length=64)
    assert not supports_pallas_dqn_update(bad_cap)
    bad_chunk = DQNConfig(batch_size=256, memory_size=1 << 20, num_envs=4096,
                          rollout_length=96)  # chunk does not divide capacity
    assert not supports_pallas_dqn_update(bad_chunk)


# ---- block replay layout parity -------------------------------------------

def test_block_push_slice_and_sample_parity():
    m = 256
    batch = _random_batch(jax.random.PRNGKey(11), m)
    row = per_push(per_init(4096), batch, ALPHA)
    blk = per_push(per_init(4096, block=True), batch, ALPHA)
    np.testing.assert_allclose(np.asarray(blk.obs), np.asarray(row.obs),
                               atol=0)
    np.testing.assert_array_equal(np.asarray(blk.action),
                                  np.asarray(row.action))
    np.testing.assert_allclose(np.asarray(blk.reward), np.asarray(row.reward),
                               atol=0)
    np.testing.assert_array_equal(np.asarray(blk.done), np.asarray(row.done))
    u = jax.random.uniform(jax.random.PRNGKey(12), (64,))
    s_row = per_sample(row, None, 64, jnp.float32(0.5), u01=u)
    s_blk = per_sample(blk, None, 64, jnp.float32(0.5), u01=u)
    np.testing.assert_array_equal(np.asarray(s_blk.indices),
                                  np.asarray(s_row.indices))
    np.testing.assert_allclose(np.asarray(s_blk.data), np.asarray(s_row.data),
                               atol=0)
    np.testing.assert_allclose(np.asarray(s_blk.weights),
                               np.asarray(s_row.weights), atol=0)


def test_block_push_scatter_path_wraps():
    # m=96 not a multiple of 128 -> lane-scatter fallback, with ring wrap
    m, cap = 96, 256
    buf_r = per_init(cap)
    buf_b = per_init(cap, block=True)
    for i in range(4):  # 384 transitions into 256 slots: wraps
        batch = _random_batch(jax.random.PRNGKey(100 + i), m)
        buf_r = per_push(buf_r, batch, ALPHA)
        buf_b = per_push(buf_b, batch, ALPHA)
    assert int(buf_b.pos) == int(buf_r.pos) == (4 * m) % cap
    assert int(buf_b.size) == cap
    np.testing.assert_allclose(np.asarray(buf_b._rows()),
                               np.asarray(buf_r.data), atol=0)


# ---- learner-level cross-path parity ---------------------------------------

ENV = EnvConfig(max_episode_steps=500)


def _mk_learner(use_pallas):
    cfg = DQNConfig(
        num_envs=128, rollout_length=2, updates_per_iteration=3,
        batch_size=128, memory_size=CAP, target_update_interval=4,
        use_pallas_rollout=False, use_pallas_update=use_pallas,
    )
    learner = DQNLearner(ENV, cfg)
    if use_pallas:
        assert supports_pallas_dqn_update(cfg)
        # force the TPU-only fast path through the Pallas interpreter
        learner._pallas_update_ok = True
        learner._pallas_interpret = True
    return learner


def test_learner_paths_match():
    params0 = qnet_init(jax.random.PRNGKey(5))
    opp = qnet_init(jax.random.PRNGKey(6))
    results = []
    for use_pallas in (False, True):
        learner = _mk_learner(use_pallas)
        state = learner.init_state(jax.random.PRNGKey(7), params_b=params0)
        assert state.buffer.is_block == use_pallas
        stack, n = stack_opponents(opp, [], learner.cfg.pool_max)
        for _ in range(2):
            state, metrics = learner.train_iteration(state, stack,
                                                     jnp.int32(n))
        results.append((jax.tree_util.tree_map(np.asarray, state),
                        jax.tree_util.tree_map(np.asarray, metrics)))
    (s_xla, m_xla), (s_pal, m_pal) = results
    assert int(s_pal.train_steps) == int(s_xla.train_steps) == 6
    assert int(s_pal.frame_idx) == int(s_xla.frame_idx)
    assert int(s_pal.buffer.size) == int(s_xla.buffer.size)
    assert int(s_pal.buffer.pos) == int(s_xla.buffer.pos)
    np.testing.assert_allclose(float(m_pal.mean_loss), float(m_xla.mean_loss),
                               rtol=1e-4)
    _assert_trees_close(s_pal.params_b, s_xla.params_b,
                        rtol=2e-4, atol=1e-6)
    _assert_trees_close(s_pal.target_b, s_xla.target_b,
                        rtol=2e-4, atol=1e-6)
    # priorities of near-zero TDs amplify pow-vs-exp(log) f32 rounding;
    # an index mismatch would show up as O(1) differences, far above this
    np.testing.assert_allclose(s_pal.buffer.prios, s_xla.buffer.prios,
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(s_pal.buffer.p_alpha, s_xla.buffer.p_alpha,
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(s_pal.buffer.chunk_sums,
                               s_xla.buffer.chunk_sums, rtol=1e-3, atol=1e-5)
