"""Pallas fused recurrent actor-rollout kernel tests (interpret on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from pingpong_tpu.config import DRQNConfig, EnvConfig
from pingpong_tpu.config.schema import SelfPlayConfig
from pingpong_tpu.env.pong import env_params_from_config, observe, reset, step
from pingpong_tpu.models.qnet_rnn import (
    init_hidden,
    qnet_rnn_init,
    qnet_rnn_step,
)
from pingpong_tpu.ops.recurrent_rollout import (
    pack_qnet_rnn,
    pack_rnn_sigma,
    pallas_recurrent_rollout,
    supports_pallas,
)
from pingpong_tpu.train.drqn import DRQNLearner, stack_rnn_opponents

B = 128
CFG = EnvConfig()
ENVP = env_params_from_config(CFG)


def make_net(seed):
    return qnet_rnn_init(
        jax.random.PRNGKey(seed),
        feature_dim=64, lstm_hidden_dim=32, lstm_layers=1, head_hidden_dim=32,
    )


def zero_sigma(params):
    def zs(p):
        return p._replace(
            w_sigma=jnp.zeros_like(p.w_sigma),
            b_sigma=jnp.zeros_like(p.b_sigma),
        )

    return params._replace(
        shared=zs(params.shared), fc_v=zs(params.fc_v), fc_a=zs(params.fc_a)
    )


def batch_state(key):
    keys = jax.random.split(key, B)
    return jax.vmap(reset, in_axes=(None, 0))(ENVP, keys)


def run_kernel(state, learner_p, opp_p, steps, epsilon=0.0, seed=5):
    stacked = jax.tree_util.tree_map(lambda x: x[None], opp_p)
    H = learner_p.lstm[0].w_hh.shape[0]
    hid = jnp.zeros((4 * H, B), jnp.float32)
    return pallas_recurrent_rollout(
        ENVP, state, jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.float32),
        hid,
        pack_qnet_rnn(learner_p), pack_rnn_sigma(learner_p),
        pack_qnet_rnn(stacked, mirror=True),
        seed=jnp.int32(seed), epsilon=jnp.float32(epsilon),
        steps=steps, tile_rows=B, interpret=True,
    )


def test_supports_pallas():
    assert supports_pallas(make_net(0))
    two_layer = qnet_rnn_init(
        jax.random.PRNGKey(0), feature_dim=64, lstm_hidden_dim=32,
        lstm_layers=2, head_hidden_dim=32,
    )
    assert not supports_pallas(two_layer)
    no_shared = qnet_rnn_init(
        jax.random.PRNGKey(0), feature_dim=64, lstm_hidden_dim=32,
        lstm_layers=1, head_hidden_dim=0,
    )
    assert not supports_pallas(no_shared)


def test_matches_xla_greedy_before_resets():
    """Kernel trajectory == XLA recurrent path with randomness disabled
    (sigma=0, eps=0): actions, observations, rewards and therefore both
    LSTM streams' evolution, per step until each env's first reset."""
    learner_p = zero_sigma(make_net(0))
    opp_p = make_net(1)
    state0 = batch_state(jax.random.PRNGKey(2))
    steps = 24
    _, _, _, hid_out, tr, _, _, _ = run_kernel(state0, learner_p, opp_p, steps)

    st = state0
    hid_b = init_hidden(learner_p, (B,))
    hid_a = init_hidden(opp_p, (B,))
    ok = np.ones(B, bool)
    for t in range(steps):
        obs_a, obs_b = observe(st)
        qa, hid_a = qnet_rnn_step(opp_p, obs_a, hid_a, None)
        qb, hid_b = qnet_rnn_step(learner_p, obs_b, hid_b, None)
        aa = jnp.argmax(qa, -1).astype(jnp.int32)
        ab = jnp.argmax(qb, -1).astype(jnp.int32)
        np.testing.assert_allclose(
            np.asarray(tr["obs"][t])[ok], np.asarray(obs_b)[ok],
            atol=1e-5, err_msg=f"obs at t={t}")
        np.testing.assert_array_equal(
            np.asarray(tr["action"][t])[ok], np.asarray(ab)[ok],
            err_msg=f"learner action at t={t}")
        st, out = jax.vmap(step, in_axes=(None, 0, 0, 0))(ENVP, st, aa, ab)
        np.testing.assert_allclose(
            np.asarray(tr["reward"][t])[ok], np.asarray(out.reward_b)[ok])
        ok &= ~np.asarray(out.done)
    assert ok.mean() > 0.5
    # surviving envs' final learner hidden matches the XLA stream
    H = learner_p.lstm[0].w_hh.shape[0]
    np.testing.assert_allclose(
        np.asarray(hid_out[0:H]).T[ok], np.asarray(hid_b.h[0])[ok], atol=1e-4
    )


def test_stats_and_epsilon_one():
    learner_p = make_net(0)
    opp_p = make_net(1)
    state0 = batch_state(jax.random.PRNGKey(3))
    _, _, _, _, tr, stats, ret_sum, ended = run_kernel(
        state0, learner_p, opp_p, steps=96, epsilon=1.0
    )
    dones = int(np.asarray(tr["done"]).sum())
    assert int(stats[0] + stats[2]) == dones
    assert int(stats[1]) <= int(stats[0])
    assert int(stats[2]) == 0   # pool_size 0 -> no pool episodes
    assert np.isfinite(float(ret_sum))
    counts = np.bincount(np.asarray(tr["action"]).reshape(-1), minlength=3)
    frac = counts / counts.sum()
    assert (np.abs(frac - 1 / 3) < 0.06).all()
    assert bool(np.asarray(ended).any()) == (dones > 0)


def small_cfg(**kw):
    base = dict(
        feature_dim=32, lstm_hidden_dim=16, lstm_layers=1, head_hidden_dim=16,
        trace_length=4, num_envs=16, rollout_length=32,
        updates_per_iteration=2, batch_size=8,
        min_episodes_for_training_start=1, ring_len=256, pool_max=2,
        target_update_interval=8, max_episode_steps=60,
    )
    base.update(kw)
    sp = base.pop("selfplay", None)
    if sp is not None:
        return DRQNConfig(selfplay=sp, **base)
    return DRQNConfig(**base)


def test_ring_rows_stay_per_env_under_sorting():
    """The pallas path sorts envs by bound member per chunk; transitions
    must be un-permuted before the per-env ring push or rows would splice
    different envs' episodes. Invariant: within a row, consecutive
    non-boundary columns chain (obs[t+1] == next_obs[t])."""
    env = EnvConfig(max_episode_steps=60)
    cfg = small_cfg(selfplay=SelfPlayConfig(opponent_pool_ratio=0.5))
    learner = DRQNLearner(env, cfg)
    assert learner._pallas_ok and cfg.use_pallas_rollout
    state = learner.init_state(jax.random.PRNGKey(0))
    params_a = learner.init_params(jax.random.PRNGKey(1))
    pool = [learner.init_params(jax.random.PRNGKey(2)),
            learner.init_params(jax.random.PRNGKey(3))]
    opp, n = stack_rnn_opponents(params_a, pool)
    for _ in range(4):
        state, m = learner.train_iteration(state, opp, jnp.int32(n))
    assert int(m.games_vs_pool) + int(m.games_vs_a) > 0
    buf = state.buffer
    written = int(buf.cursor)
    assert written == 4 * cfg.rollout_length
    obs = np.asarray(buf.obs)[:, :written]
    done = np.asarray(buf.done)[:, :written]
    # within an episode a row must be ONE env's trajectory: the paddle
    # kinematics bound |Δpaddle| <= paddle_speed per step — splicing
    # different envs' episodes into a row would show position jumps
    chain = ~done[:, :-1]
    dpad = np.abs(obs[:, 1:, 4] - obs[:, :-1, 4])
    assert (dpad[chain] <= float(env.paddle_speed) + 1e-5).all(), \
        "ring rows mix envs: sorting leaked into the buffer"
    # episode ids advance exactly on done
    ep = np.asarray(buf.ep_id)[:, :written]
    np.testing.assert_array_equal(
        ep[:, 1:] - ep[:, :-1], done[:, :-1].astype(np.int32)
    )


def test_pallas_vs_xla_paths_both_learn_and_count():
    """Same config through both rollout backends: episode/stat accounting
    in the same ballpark and updates run on both."""
    env = EnvConfig(max_episode_steps=60)
    results = {}
    for use_pallas in (False, True):
        cfg = small_cfg(use_pallas_rollout=use_pallas)
        learner = DRQNLearner(env, cfg)
        state = learner.init_state(jax.random.PRNGKey(0))
        opp, n = stack_rnn_opponents(learner.init_params(jax.random.PRNGKey(1)), [])
        eps = 0
        upd = 0
        for _ in range(5):
            state, m = learner.train_iteration(state, opp, jnp.int32(n))
            eps += int(m.episodes)
            upd += int(m.updates_run)
        results[use_pallas] = (eps, upd, float(state.epsilon))
        assert np.isfinite(float(m.mean_loss))
    e_x, u_x, _ = results[False]
    e_p, u_p, _ = results[True]
    assert u_x > 0 and u_p > 0
    assert e_x > 0 and e_p > 0
    # both backends play the same game: episode counts within 2x
    assert 0.5 < (e_p + 1) / (e_x + 1) < 2.0
