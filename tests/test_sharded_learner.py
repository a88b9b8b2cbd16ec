"""Sharded-PER learner mode (round-4 VERDICT item 1).

Three layers of evidence, run on the 8-virtual-device CPU mesh:

1. **Sampler distribution** (`test_stratified_*`): the per-shard sampler
   (``per_sample`` on the shard's slice, ``normalize=False``) realizes the
   documented stratified design ``P_tilde(i) = (1/n) p_i^a / mass_s`` —
   identical to global PER when shard masses are equal, exact marginal
   under imbalance, and the beta=1 importance-weighted estimator matches
   global PER's expectation for an arbitrary integrand.
2. **Implementation parity** (`test_sharded_*_matches_emulation`): one
   full mesh-sharded train iteration equals a single-device emulation of
   the same stratified semantics (per-shard pushes, folded sample keys,
   psum-ordered gradient combine) to float tolerance — params, target,
   optimizer state, priorities and chunk sums all compared.
3. **Scaling facts** (`test_sharded_*_layout`): replay leaves shard 1/n
   per chip; the per-update batch is batch_size/n per shard (enforced by
   the emulation's shapes); the mode engages via config and falls back
   with a warning on bad divisibility.

Semantics source: /root/reference/scripts/train_iterative.py:49-76,
132-168 (PER + update), train_rnn_iterative.py:100-176 (sequence ring).
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pingpong_tpu.config import DQNConfig, DRQNConfig, EnvConfig
from pingpong_tpu.config.schema import MeshConfig
from pingpong_tpu.models.qnet import qnet_apply, qnet_init, qnet_sample_noise
from pingpong_tpu.models.qnet_rnn import Hidden, qnet_rnn_apply, \
    qnet_rnn_sample_noise
from pingpong_tpu.parallel.mesh import create_mesh
from pingpong_tpu.replay.per import (
    PERBuffer,
    beta_schedule,
    per_init,
    per_push,
    per_sample,
    per_update_priorities,
)
from pingpong_tpu.replay.sequence import seq_push_rollout, seq_sample
from pingpong_tpu.train.dqn import DQNLearner, stack_opponents
from pingpong_tpu.train.drqn import DRQNLearner, stack_rnn_opponents

ENV = EnvConfig(max_episode_steps=128)


# ---------------------------------------------------------------------------
# 1. sampler distribution
# ---------------------------------------------------------------------------

def _make_buf(prios, alpha=0.6):
    """A filled row-layout PER buffer with the given raw priorities."""
    cap = prios.shape[0]
    buf = per_init(cap, obs_dim=7)
    return buf._replace(
        prios=prios,
        p_alpha=prios ** alpha,
        chunk_sums=jnp.sum(
            (prios ** alpha).reshape(buf.chunk_sums.shape[0], -1), axis=1
        ),
        pos=jnp.int32(0),
        size=jnp.int32(cap),
    )


def _shard_bufs(prios, n, alpha=0.6):
    cap = prios.shape[0]
    capl = cap // n
    return [_make_buf(prios[s * capl:(s + 1) * capl], alpha)
            for s in range(n)]


def _stratified_draw(bufs, key, bs_local, beta, n_draws):
    """Draw n_draws batches from each shard's local sampler — the exact
    operation _push_update_sharded performs — returning global indices
    and raw weights."""
    n = len(bufs)
    capl = bufs[0].prios.shape[0]
    idx_all, w_all = [], []
    for s in range(n):
        ks = jax.random.fold_in(key, s)
        u = jax.random.uniform(ks, (n_draws, bs_local))
        smp = jax.vmap(
            lambda u1: per_sample(bufs[s], None, bs_local, beta, u01=u1,
                                  normalize=False)
        )(u)
        idx_all.append(np.asarray(smp.indices) + s * capl)
        w_all.append(np.asarray(smp.weights))
    return np.concatenate(idx_all, axis=1), np.concatenate(w_all, axis=1)


def test_stratified_distribution_balanced_matches_global():
    """Equal shard masses => the stratified sampler's index distribution
    IS global PER's (the histogram check the VERDICT asked for)."""
    n, cap, alpha = 4, 512, 0.6
    key = jax.random.PRNGKey(0)
    # same priority multiset in every shard (shuffled) => equal masses
    base = jax.random.uniform(key, (cap // n,)) + 0.1
    prios = jnp.concatenate([
        jax.random.permutation(jax.random.PRNGKey(10 + s), base)
        for s in range(n)
    ])
    bufs = _shard_bufs(prios, n, alpha)
    idx, _ = _stratified_draw(bufs, jax.random.PRNGKey(1), 64,
                              jnp.float32(0.4), 400)
    counts = np.bincount(idx.ravel(), minlength=cap).astype(np.float64)
    emp = counts / counts.sum()
    pa = np.asarray(prios, np.float64) ** alpha
    expect = pa / pa.sum()
    # 102400 draws: per-slot expected ~200; 4-sigma band ~ 0.28 relative
    np.testing.assert_allclose(emp, expect, atol=4 * np.sqrt(
        expect.max() / idx.size))
    assert np.max(np.abs(emp - expect) / expect) < 0.4


def test_stratified_marginal_unbalanced_matches_design():
    """Unequal shard masses: the marginal is the documented
    P_tilde(i) = (1/n) p_i^a / mass_s — NOT global PER — and the raw
    weight is (N * P_tilde)^-beta exactly."""
    n, cap, alpha = 4, 512, 0.6
    capl = cap // n
    # shard s's priorities scaled by (s+1): strongly unequal masses
    prios = jnp.concatenate([
        (jax.random.uniform(jax.random.PRNGKey(s), (capl,)) + 0.1) * (s + 1)
        for s in range(n)
    ])
    bufs = _shard_bufs(prios, n, alpha)
    beta = jnp.float32(0.7)
    idx, w = _stratified_draw(bufs, jax.random.PRNGKey(2), 64, beta, 400)
    counts = np.bincount(idx.ravel(), minlength=cap).astype(np.float64)
    emp = counts / counts.sum()
    pa = np.asarray(prios, np.float64) ** alpha
    ptilde = np.concatenate([
        pa[s * capl:(s + 1) * capl] / pa[s * capl:(s + 1) * capl].sum() / n
        for s in range(n)
    ])
    assert np.max(np.abs(emp - ptilde) / ptilde) < 0.4
    # and it must NOT match global PER here (the design difference —
    # shard masses differ by ~2.3x, so relative deviations far exceed
    # the ~0.4 sampling-noise band that bounds the P_tilde match above)
    glob = pa / pa.sum()
    assert np.max(np.abs(emp - glob) / glob) > 0.6
    # raw weight = (N_glob * P_tilde)^-beta at every sampled slot
    w_expect = (cap * ptilde[idx]) ** (-float(beta))
    np.testing.assert_allclose(w, w_expect, rtol=2e-4)


def test_stratified_beta1_estimator_unbiased():
    """At beta=1 the IS-weighted estimator (1/bs) sum w_raw f(i) has the
    SAME expectation under the stratified sampler as under global PER —
    sum_i f(i) / N — for an arbitrary integrand f."""
    n, cap, alpha = 4, 512, 0.6
    capl = cap // n
    prios = jnp.concatenate([
        (jax.random.uniform(jax.random.PRNGKey(s), (capl,)) + 0.1) * (s + 1)
        for s in range(n)
    ])
    bufs = _shard_bufs(prios, n, alpha)
    f = np.asarray(jax.random.normal(jax.random.PRNGKey(9), (cap,)),
                   np.float64)
    idx, w = _stratified_draw(bufs, jax.random.PRNGKey(3), 64,
                              jnp.float32(1.0), 2000)
    bs = idx.shape[1]
    est = float(np.mean(np.sum(w * f[idx], axis=1) / bs))
    target = float(f.sum() / cap)
    assert abs(est - target) < 5e-3, (est, target)


# ---------------------------------------------------------------------------
# 2. implementation parity (mesh vs single-device emulation)
# ---------------------------------------------------------------------------

def _dqn_cfg():
    return DQNConfig(num_envs=64, rollout_length=16,
                     updates_per_iteration=4, batch_size=32,
                     memory_size=8192, use_pallas_rollout=False,
                     learner_sharding="sharded")


def _emulate_sharded_dqn(learner, state, traj, n):
    """Single-device emulation of _push_update_sharded (same stratified
    semantics, python-loop over shards)."""
    cfg = learner.cfg
    bs, bs_local = cfg.batch_size, cfg.batch_size // n
    K = cfg.updates_per_iteration
    cap = cfg.memory_size
    capl = cap // n
    Bl = cfg.num_envs // n
    flat_b, unravel = learner._flat_util(state.params_b)
    flat_t, _ = learner._flat_util(state.target_b)
    grad_mask = learner._grad_mask
    tx = learner.tx(None)

    key, k_noise, k_u = jax.random.split(state.key, 3)
    noise_all = jax.vmap(
        lambda k: qnet_sample_noise(k, state.params_b)
    )(jax.random.split(k_noise, K))
    noise2_all = jax.tree_util.tree_map(
        lambda x: jnp.stack([x, jnp.zeros_like(x)], axis=1), noise_all
    )

    nch = state.buffer.chunk_sums.shape[0]
    nchl = nch // n
    bufs, u_alls = [], []
    for s in range(n):
        b = PERBuffer(
            data=state.buffer.data[s * capl:(s + 1) * capl],
            prios=state.buffer.prios[s * capl:(s + 1) * capl],
            p_alpha=state.buffer.p_alpha[s * capl:(s + 1) * capl],
            chunk_sums=state.buffer.chunk_sums[s * nchl:(s + 1) * nchl],
            pos=state.buffer.pos, size=state.buffer.size,
        )
        traj_l = jax.tree_util.tree_map(
            lambda x: x[:, s * Bl:(s + 1) * Bl], traj
        )
        flat_tr = jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:]), traj_l
        )
        bufs.append(per_push(b, flat_tr, cfg.per_alpha))
        u_alls.append(jax.random.uniform(
            jax.random.fold_in(k_u, s), (K, bs_local), jnp.float32
        ))

    opt_state = state.opt_state
    train_steps = state.train_steps
    frame = state.frame_idx
    losses = []
    for k in range(K):
        frame = frame + 1
        beta = beta_schedule(frame, cfg.per_beta_start, cfg.per_beta_frames)
        noise2 = jax.tree_util.tree_map(lambda x: x[k], noise2_all)
        g_sum = jnp.zeros_like(flat_b)
        loss_sum = jnp.float32(0.0)
        wmax = jnp.float32(0.0)
        per_shard = []
        for s in range(n):
            sample = per_sample(bufs[s], None, bs_local, beta,
                                u01=u_alls[s][k], normalize=False)
            tr = sample.batch
            d = bufs[s].obs_dim
            pairs = sample.data[:, :2 * d].reshape(2 * bs_local, d)
            nexts = sample.data[:, d:2 * d]
            x2 = jnp.stack([pairs, jnp.concatenate([nexts, nexts])])
            w_raw = sample.weights

            def loss_fn(flat):
                both = jax.vmap(unravel)(jnp.stack([flat, flat_t]))
                q2 = jax.vmap(qnet_apply)(both, x2, noise2)
                q = q2[0, 0::2]
                q_a = jnp.take_along_axis(q, tr.action[:, None], -1)[:, 0]
                na = jnp.argmax(q2[0, 1::2], axis=-1)
                nq = jnp.take_along_axis(
                    q2[1, :bs_local], na[:, None], -1)[:, 0]
                y = tr.reward + cfg.gamma * nq * (
                    1.0 - tr.done.astype(jnp.float32))
                td = q_a - jax.lax.stop_gradient(y)
                return jnp.sum(w_raw * td * td), jnp.abs(td)

            (raw_sum, td_abs), g_raw = jax.value_and_grad(
                loss_fn, has_aux=True)(flat_b)
            g_sum = g_sum + g_raw
            loss_sum = loss_sum + raw_sum
            wmax = jnp.maximum(wmax, jnp.max(w_raw))
            per_shard.append((sample.indices, td_abs))
        scale = 1.0 / (bs * jnp.maximum(wmax, 1e-30))
        updates, opt_state = tx.update(
            g_sum * scale * grad_mask, opt_state, flat_b)
        flat_b = optax.apply_updates(flat_b, updates)
        for s in range(n):
            bufs[s] = per_update_priorities(
                bufs[s], per_shard[s][0], per_shard[s][1],
                cfg.per_alpha, cfg.per_eps)
        train_steps = train_steps + 1
        sync = (train_steps % cfg.target_update_interval) == 0
        flat_t = jnp.where(sync, flat_b, flat_t)
        losses.append(loss_sum * scale)
    return dict(
        params=unravel(flat_b), target=unravel(flat_t),
        opt_state=opt_state, bufs=bufs, frame=frame,
        train_steps=train_steps, losses=jnp.stack(losses),
        key=key,
    )


def test_sharded_dqn_matches_emulation():
    mesh = create_mesh(MeshConfig())
    n = mesh.shape["data"]
    cfg = _dqn_cfg()
    learner = DQNLearner(ENV, cfg, mesh=mesh)
    assert learner._learner_sharded
    opp, pn = stack_opponents(qnet_init(jax.random.PRNGKey(1)), [], 0)
    pn = jnp.int32(pn)

    state0 = learner.init_state(jax.random.PRNGKey(0))
    # warm the buffer two iterations so priorities are non-trivial
    state = learner.shard_state(state0)
    for _ in range(2):
        state, _ = learner.train_iteration(state, opp, pn)
    state_before = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    state, m = learner.train_iteration(state, opp, pn)
    got = jax.device_get(state)

    # single-device emulation from the same pre-iteration state
    ref_learner = DQNLearner(ENV, cfg, mesh=None)
    st = jax.tree_util.tree_map(jnp.asarray, state_before)
    st = type(state)(*st)
    st2, stats, ret_sum, traj = jax.jit(
        lambda s: ref_learner._rollout(s, opp, pn, push=False)
    )(st)
    emu = _emulate_sharded_dqn(ref_learner, st2, traj, n)

    np.testing.assert_allclose(
        np.asarray(got.params_b.feat1.w),
        np.asarray(emu["params"].feat1.w), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got.params_b.fc_a.w_mu),
        np.asarray(emu["params"].fc_a.w_mu), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got.target_b.fc_v.w_mu),
        np.asarray(emu["target"].fc_v.w_mu), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got.buffer.prios),
        np.concatenate([np.asarray(b.prios) for b in emu["bufs"]]),
        rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(got.buffer.chunk_sums),
        np.concatenate([np.asarray(b.chunk_sums) for b in emu["bufs"]]),
        rtol=1e-4)
    assert int(got.train_steps) == int(emu["train_steps"])
    assert int(got.frame_idx) == int(emu["frame"])


def test_sharded_dqn_layout_and_fallbacks():
    mesh = create_mesh(MeshConfig())
    cfg = _dqn_cfg()
    learner = DQNLearner(ENV, cfg, mesh=mesh)
    state = learner.shard_state(learner.init_state(jax.random.PRNGKey(0)))
    # replay HBM 1/n per shard
    assert state.buffer.data.addressable_shards[0].data.shape[0] \
        == cfg.memory_size // 8
    assert state.buffer.p_alpha.addressable_shards[0].data.shape[0] \
        == cfg.memory_size // 8
    # auto stays replicated at n=8 (crossover documented at 16)
    auto = DQNLearner(ENV, DQNConfig(**{**cfg.__dict__,
                                        "learner_sharding": "auto"}),
                      mesh=mesh)
    assert not auto._learner_sharded
    # bad divisibility falls back with a warning
    bad = DQNConfig(**{**cfg.__dict__, "batch_size": 28})
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        lr = DQNLearner(ENV, bad, mesh=mesh)
    assert not lr._learner_sharded
    assert any("falling back" in str(x.message) for x in w)


# ---------------------------------------------------------------------------
# 3. DRQN family
# ---------------------------------------------------------------------------

def _drqn_cfg():
    return DRQNConfig(feature_dim=32, lstm_hidden_dim=16,
                      head_hidden_dim=16, trace_length=4, num_envs=64,
                      rollout_length=32, updates_per_iteration=4,
                      batch_size=16, min_episodes_for_training_start=1,
                      ring_len=512, use_pallas_rollout=False,
                      learner_sharding="sharded")


def _emulate_sharded_drqn(learner, state, traj, n):
    cfg = learner.cfg
    bs_local = cfg.batch_size // n
    K = cfg.updates_per_iteration
    Bl = cfg.num_envs // n
    flat_b, unravel = learner._flat_util(state.params_b)
    flat_t, _ = learner._flat_util(state.target_b)
    tx = learner.tx()

    key, k_noise = jax.random.split(state.key)
    noise_all = jax.vmap(
        lambda k: qnet_rnn_sample_noise(k, state.params_b)
    )(jax.random.split(k_noise, K))
    key, k_samples = jax.random.split(key)

    obs_t, act_t, rew_t, done_t = traj
    ep_glob = state.buffer.ep_count
    bufs, samples = [], []
    for s in range(n):
        sl = slice(s * Bl, (s + 1) * Bl)
        b = state.buffer._replace(
            data=state.buffer.data[sl], ep_id=state.buffer.ep_id[sl],
            ep_count=jnp.int32(0),
            cur_ep_id=state.buffer.cur_ep_id[sl],
            cur_ep_len=state.buffer.cur_ep_len[sl],
        )
        b = seq_push_rollout(b, obs_t[:, sl], act_t[:, sl], rew_t[:, sl],
                             done_t[:, sl], cfg.trace_length)
        bufs.append(b)
        smp = seq_sample(b, jax.random.fold_in(k_samples, s),
                         K * bs_local, cfg.trace_length)
        samples.append(jax.tree_util.tree_map(
            lambda x: x.reshape((K, bs_local) + x.shape[1:]), smp))
    ep_glob = ep_glob + sum(b.ep_count for b in bufs)

    opt_state = state.opt_state
    train_steps = state.train_steps
    gate = cfg.batch_size * cfg.min_episodes_for_training_start
    assert int(ep_glob) > gate, "emulation expects the gate open"
    losses = []
    synced = cfg.target_tau > 0.0
    # per-shard precomputed target Q (as run_all does, per shard)
    qt = [learner._target_q(unravel(flat_t),
                            samples[s].next_obs.reshape(
                                (K * bs_local,) + samples[s].next_obs.shape[2:])
                            )[0].reshape(K, bs_local, -1)
          for s in range(n)]
    for k in range(K):
        noise = jax.tree_util.tree_map(lambda x: x[k], noise_all)
        g_sum = jnp.zeros_like(flat_b)
        num = jnp.float32(0.0)
        den = jnp.float32(0.0)
        for s in range(n):
            sample = jax.tree_util.tree_map(lambda x: x[k], samples[s])
            if synced:
                q_next_target = learner._target_q(
                    unravel(flat_t), sample.next_obs)[0]
            else:
                q_next_target = qt[s][k]
            h0_t = learner._zero_hidden(bs_local)
            w = sample.valid.astype(jnp.float32)

            def loss_fn(flat):
                params = unravel(flat)
                x = jnp.concatenate([sample.obs, sample.next_obs])
                h0 = learner._zero_hidden(bs_local)
                h = Hidden(h=jnp.concatenate([h0.h, h0_t.h], axis=1),
                           c=jnp.concatenate([h0.c, h0_t.c], axis=1))
                q, _ = qnet_rnn_apply(params, x, h, noise)
                q_last, q_next_online = q[:bs_local], q[bs_local:]
                a_last = sample.action[:, -1]
                q_a = jnp.take_along_axis(
                    q_last, a_last[:, None], -1)[:, 0]
                na = jnp.argmax(q_next_online, axis=-1)
                nq = jnp.take_along_axis(
                    q_next_target, na[:, None], -1)[:, 0]
                y = sample.reward[:, -1] + cfg.gamma * nq * (
                    1.0 - sample.done[:, -1].astype(jnp.float32))
                td = q_a - jax.lax.stop_gradient(y)
                huber = jnp.where(jnp.abs(td) <= 1.0, 0.5 * td * td,
                                  jnp.abs(td) - 0.5)
                return jnp.sum(w * huber), jnp.sum(w)

            (num_l, den_l), g_raw = jax.value_and_grad(
                loss_fn, has_aux=True)(flat_b)
            g_sum = g_sum + g_raw
            num = num + num_l
            den = den + den_l
        denom = jnp.maximum(den, 1.0)
        updates, opt_state = tx.update(g_sum / denom, opt_state, flat_b)
        flat_b = optax.apply_updates(flat_b, updates)
        train_steps = train_steps + 1
        sync = (train_steps % cfg.target_update_interval) == 0
        flat_t = jnp.where(sync, flat_b, flat_t)
        synced = synced or bool(sync)
        losses.append(num / denom)
    return dict(params=unravel(flat_b), target=unravel(flat_t),
                ep_count=ep_glob, train_steps=train_steps,
                losses=jnp.stack(losses))


def test_sharded_drqn_matches_emulation():
    mesh = create_mesh(MeshConfig())
    n = mesh.shape["data"]
    cfg = _drqn_cfg()
    learner = DRQNLearner(ENV, cfg, mesh=mesh)
    assert learner._learner_sharded
    params = learner.init_params(jax.random.PRNGKey(0))
    opp, pn = stack_rnn_opponents(params, [])
    pn = jnp.int32(pn)

    state = learner.shard_state(
        learner.init_state(jax.random.PRNGKey(1), params))
    # fill past the readiness gate
    for _ in range(4):
        state, m = learner.train_iteration(state, opp, pn)
    state_before = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    state, m = learner.train_iteration(state, opp, pn)
    assert int(m.updates_run) == cfg.updates_per_iteration
    got = jax.device_get(state)

    ref_learner = DRQNLearner(ENV, cfg, mesh=None)
    st = type(state)(*jax.tree_util.tree_map(jnp.asarray, state_before))
    st2, stats, ret_sum, traj = jax.jit(
        lambda s: ref_learner._rollout(s, opp, pn, push=False)
    )(st)
    emu = _emulate_sharded_drqn(ref_learner, st2, traj, n)

    np.testing.assert_allclose(
        np.asarray(got.params_b.lstm[0].w_ih),
        np.asarray(emu["params"].lstm[0].w_ih), rtol=3e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got.target_b.lstm[0].w_hh),
        np.asarray(emu["target"].lstm[0].w_hh), rtol=3e-4, atol=1e-6)
    assert int(got.buffer.ep_count) == int(emu["ep_count"])
    assert int(got.train_steps) == int(emu["train_steps"])


def test_sharded_drqn_ep_count_matches_replicated():
    """The psum'd global admitted-episode count equals the replicated
    ring's count for the same rollout stream."""
    mesh = create_mesh(MeshConfig())
    cfg = _drqn_cfg()
    sh = DRQNLearner(ENV, cfg, mesh=mesh)
    rp = DRQNLearner(ENV, DRQNConfig(**{**cfg.__dict__,
                                        "learner_sharding": "replicated"}),
                     mesh=None)
    params = rp.init_params(jax.random.PRNGKey(0))
    opp, pn = stack_rnn_opponents(params, [])
    pn = jnp.int32(pn)
    s_sh = sh.shard_state(sh.init_state(jax.random.PRNGKey(1), params))
    s_rp = rp.init_state(jax.random.PRNGKey(1), params)
    for _ in range(3):
        s_sh, m_sh = sh.train_iteration(s_sh, opp, pn)
        s_rp, m_rp = rp.train_iteration(s_rp, opp, pn)
    assert int(m_sh.buffer_episodes) == int(m_rp.buffer_episodes)
    assert int(s_sh.episodes) == int(s_rp.episodes)


def test_sharded_drqn_layout_and_fallbacks():
    mesh = create_mesh(MeshConfig())
    cfg = _drqn_cfg()
    learner = DRQNLearner(ENV, cfg, mesh=mesh)
    state = learner.shard_state(
        learner.init_state(jax.random.PRNGKey(0),
                           learner.init_params(jax.random.PRNGKey(1))))
    assert state.buffer.data.addressable_shards[0].data.shape[0] \
        == cfg.num_envs // 8
    # episode_uniform_sampling needs the global directory: falls back
    bad = DRQNConfig(**{**cfg.__dict__, "episode_uniform_sampling": True})
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        lr = DRQNLearner(ENV, bad, mesh=mesh)
    assert not lr._learner_sharded
    assert any("falling back" in str(x.message) for x in w)


def test_sharded_drqn_burn_in_runs():
    """Burn-in composes with the sharded update (the per-shard target
    burn-in hidden reshape is the shape-fragile part)."""
    mesh = create_mesh(MeshConfig())
    cfg = DRQNConfig(**{**_drqn_cfg().__dict__,
                        "trace_length": 6, "burn_in_length": 2})
    learner = DRQNLearner(ENV, cfg, mesh=mesh)
    assert learner._learner_sharded
    params = learner.init_params(jax.random.PRNGKey(0))
    state = learner.shard_state(
        learner.init_state(jax.random.PRNGKey(1), params))
    opp, pn = stack_rnn_opponents(params, [])
    m = None
    for _ in range(6):
        state, m = learner.train_iteration(state, opp, jnp.int32(pn))
    assert int(m.updates_run) == cfg.updates_per_iteration
    assert bool(jnp.isfinite(m.mean_loss))
