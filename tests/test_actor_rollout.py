"""Pallas fused actor-rollout kernel tests (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from pingpong_tpu.config import DQNConfig, EnvConfig
from pingpong_tpu.env.pong import env_params_from_config, observe, reset, step
from pingpong_tpu.models import qnet_apply, qnet_init
from pingpong_tpu.ops.actor_rollout import pack_qnet, pallas_actor_rollout
from pingpong_tpu.train.dqn import DQNLearner, stack_opponents

B = 256
CFG = EnvConfig()
ENVP = env_params_from_config(CFG)


def zero_sigma(params):
    return params._replace(
        fc_a=params.fc_a._replace(
            w_sigma=jnp.zeros_like(params.fc_a.w_sigma),
            b_sigma=jnp.zeros_like(params.fc_a.b_sigma),
        )
    )


def batch_state(key):
    keys = jax.random.split(key, B)
    return jax.vmap(reset, in_axes=(None, 0))(ENVP, keys)


def run_kernel(state, learner_p, opp_p, steps, epsilon=0.0, seed=5):
    stacked = jax.tree_util.tree_map(lambda x: x[None], opp_p)
    return pallas_actor_rollout(
        ENVP, state, jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.float32),
        pack_qnet(learner_p), pack_qnet(stacked, mirror=True),
        seed=jnp.int32(seed), epsilon=jnp.float32(epsilon),
        pool_size=jnp.int32(0), steps=steps, pool_ratio=0.0,
        tile_rows=B, interpret=True,
    )


def test_matches_xla_greedy_before_resets():
    learner_p = zero_sigma(qnet_init(jax.random.PRNGKey(0)))
    opp_p = qnet_init(jax.random.PRNGKey(1))
    state0 = batch_state(jax.random.PRNGKey(2))
    steps = 24
    _, _, _, tr, _, _, _ = run_kernel(state0, learner_p, opp_p, steps)

    # XLA comparator: greedy mu actions both sides (sigma=0, eps=0)
    st = state0
    ok = np.ones(B, bool)
    for t in range(steps):
        obs_a, obs_b = observe(st)
        aa = jnp.argmax(qnet_apply(opp_p, obs_a), -1).astype(jnp.int32)
        ab = jnp.argmax(qnet_apply(learner_p, obs_b), -1).astype(jnp.int32)
        np.testing.assert_allclose(
            np.asarray(tr["obs"][t])[ok], np.asarray(obs_b)[ok],
            atol=1e-5, err_msg=f"obs at t={t}")
        np.testing.assert_array_equal(
            np.asarray(tr["action"][t])[ok], np.asarray(ab)[ok])
        st, out = jax.vmap(step, in_axes=(None, 0, 0, 0))(ENVP, st, aa, ab)
        np.testing.assert_allclose(
            np.asarray(tr["reward"][t])[ok], np.asarray(out.reward_b)[ok])
        # once an env finishes, the kernel re-serves with its own RNG: stop
        # comparing that env
        ok &= ~np.asarray(out.done)
    assert ok.mean() > 0.5


def test_stats_consistency():
    learner_p = qnet_init(jax.random.PRNGKey(0))
    opp_p = qnet_init(jax.random.PRNGKey(1))
    state0 = batch_state(jax.random.PRNGKey(3))
    _, _, _, tr, stats, ret_sum, ended = run_kernel(
        state0, learner_p, opp_p, steps=96, epsilon=0.1
    )
    dones = int(np.asarray(tr["done"]).sum())
    assert int(stats[0] + stats[2]) == dones
    assert int(stats[1]) <= int(stats[0])
    assert int(stats[3]) <= int(stats[2])
    assert int(stats[2]) == 0  # pool_size 0 -> no pool episodes
    assert np.isfinite(float(ret_sum))
    # rewards consistent: total return of finished episodes == ret_sum +
    # contributions cancel for unfinished (can't assert equality), so just
    # bound: |ret_sum| <= total |reward|
    assert abs(float(ret_sum)) <= float(np.abs(np.asarray(tr["reward"])).sum()) + 1e-5


def test_epsilon_one_gives_uniformish_actions():
    learner_p = qnet_init(jax.random.PRNGKey(0))
    opp_p = qnet_init(jax.random.PRNGKey(1))
    state0 = batch_state(jax.random.PRNGKey(4))
    _, _, _, tr, _, _, _ = run_kernel(state0, learner_p, opp_p, steps=32,
                                   epsilon=1.0)
    counts = np.bincount(np.asarray(tr["action"]).reshape(-1), minlength=3)
    frac = counts / counts.sum()
    assert (np.abs(frac - 1 / 3) < 0.05).all()


def test_chunk_boundary_rebinding_reaches_pool():
    """Bindings are fixed within a chunk and re-drawn at chunk boundaries
    for envs that finished an episode; with pool_ratio=1 every re-bind
    lands on a pool member, so pool episodes must appear by chunk 2+."""
    from pingpong_tpu.config.schema import SelfPlayConfig

    cfg = DQNConfig(
        selfplay=SelfPlayConfig(opponent_pool_ratio=1.0),
        num_envs=B, rollout_length=64, updates_per_iteration=0,
        batch_size=32, memory_size=B * 64, pool_max=2,
        use_pallas_rollout=True, pallas_tile_rows=B,
    )
    env_cfg = EnvConfig(max_episode_steps=100)
    learner = DQNLearner(env_cfg, cfg)
    state = learner.init_state(jax.random.PRNGKey(0))
    pool = [qnet_init(jax.random.PRNGKey(2)), qnet_init(jax.random.PRNGKey(3))]
    opp, n = stack_opponents(qnet_init(jax.random.PRNGKey(1)), pool, 2)
    pool_games = 0
    for _ in range(4):
        state, m = learner.train_iteration(state, opp, jnp.int32(n))
        pool_games += int(m.games_vs_pool)
    assert pool_games > 0
    # after several chunks, most envs are bound to pool slots (>0)
    assert float(jnp.mean((state.opp_idx > 0).astype(jnp.float32))) > 0.5
    # and envs arrive at the kernel sorted by member within each chunk —
    # verified indirectly: bindings only in {0..n}
    assert int(jnp.max(state.opp_idx)) <= n


def test_learner_integration_pallas_path():
    cfg = DQNConfig(
        num_envs=B, rollout_length=16, updates_per_iteration=2,
        batch_size=32, memory_size=8192, pool_max=2,
        target_update_interval=8, use_pallas_rollout=True,
        pallas_tile_rows=B,
    )
    env_cfg = EnvConfig(max_episode_steps=500)
    learner = DQNLearner(env_cfg, cfg)
    state = learner.init_state(jax.random.PRNGKey(0))
    params_a = qnet_init(jax.random.PRNGKey(1))
    pool = [qnet_init(jax.random.PRNGKey(2))]
    opp, n = stack_opponents(params_a, pool, cfg.pool_max)
    total_eps = 0
    for _ in range(3):
        state, m = learner.train_iteration(state, opp, jnp.int32(n))
        total_eps += int(m.episodes)
    assert int(m.env_steps) == B * 16
    assert int(m.buffer_size) == min(3 * B * 16, cfg.memory_size)
    assert np.isfinite(float(m.mean_loss))
    assert total_eps > 0
    assert float(state.epsilon) < 1.0

    # determinism of the full pallas-path iteration
    def run():
        l2 = DQNLearner(env_cfg, cfg)
        s = l2.init_state(jax.random.PRNGKey(0))
        for _ in range(2):
            s, mm = l2.train_iteration(s, opp, jnp.int32(n))
        return jax.device_get(s.params_b), int(mm.episodes)

    p1, e1 = run()
    p2, e2 = run()
    assert e1 == e2
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(a, b)


def test_shared_trunk_member_loop_matches_full_loop():
    """PreparedOpponents.shared_trunk engages the trunk-once member loop;
    actions/state must match the full-forward member loop bitwise when
    every slot really shares the trunk (heads-only lineage invariant)."""
    import numpy as np

    from pingpong_tpu.config import DQNConfig, EnvConfig
    from pingpong_tpu.models import qnet_init
    from pingpong_tpu.train.dqn import DQNLearner, stack_opponents

    cfg = DQNConfig(
        num_envs=32, rollout_length=16, updates_per_iteration=2,
        batch_size=16, memory_size=1024, pool_max=3,
        target_update_interval=8,
        selfplay=__import__("pingpong_tpu.config.schema",
                            fromlist=["SelfPlayConfig"]).SelfPlayConfig(
            opponent_pool_ratio=0.75),
    )
    env = EnvConfig(max_episode_steps=64)
    base = qnet_init(jax.random.PRNGKey(1))
    pool = [
        base._replace(fc_a=qnet_init(jax.random.PRNGKey(10 + i)).fc_a,
                      fc_v=qnet_init(jax.random.PRNGKey(10 + i)).fc_v)
        for i in range(3)
    ]
    stack, n = stack_opponents(base, pool, cfg.pool_max)

    def run(opp):
        learner = DQNLearner(env, cfg)
        state = learner.init_state(jax.random.PRNGKey(0))
        for _ in range(3):
            state, m = learner.train_iteration(state, opp, jnp.int32(n))
        return jax.device_get(state)

    learner0 = DQNLearner(env, cfg)
    prepared = learner0.prepare_opponents(stack)
    assert prepared.shared_trunk          # detection on equal trunks
    s_shared = run(prepared)
    s_full = run(stack)                   # raw stack -> full member loop
    for a, b in zip(jax.tree_util.tree_leaves(s_shared.params_b),
                    jax.tree_util.tree_leaves(s_full.params_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(s_shared.opp_idx),
                                  np.asarray(s_full.opp_idx))

    # differing trunks must NOT claim the invariant
    stack2, _ = stack_opponents(qnet_init(jax.random.PRNGKey(5)), pool,
                                cfg.pool_max)
    assert not learner0.prepare_opponents(stack2).shared_trunk
