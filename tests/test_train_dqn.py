"""DQN actor-learner integration tests (small shapes, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from pingpong_tpu.config import DQNConfig, EnvConfig
from pingpong_tpu.config.schema import SelfPlayConfig
from pingpong_tpu.models import qnet_init
from pingpong_tpu.train.dqn import DQNLearner, stack_opponents

ENV = EnvConfig(max_episode_steps=500)


def small_cfg(**kw):
    base = dict(
        num_envs=16,
        rollout_length=32,
        updates_per_iteration=4,
        batch_size=32,
        memory_size=4096,
        pool_max=2,
        target_update_interval=8,
    )
    base.update(kw)
    return DQNConfig(**base)


def test_train_iteration_runs_and_counts():
    cfg = small_cfg()
    learner = DQNLearner(ENV, cfg)
    state = learner.init_state(jax.random.PRNGKey(0))
    params_a = qnet_init(jax.random.PRNGKey(1))
    opp, pool_size = stack_opponents(params_a, [], cfg.pool_max)
    state, m = learner.train_iteration(state, opp, jnp.int32(pool_size))
    assert int(m.env_steps) == 16 * 32
    assert int(m.buffer_size) == 16 * 32
    assert int(m.updates_run) == 4  # buffer filled by first push
    assert int(m.train_steps) == 4
    # epsilon decayed from 1.0 only if episodes finished
    if int(m.episodes) > 0:
        assert float(m.epsilon) < 1.0
    # second iteration: params must change (loss nonzero, Adam applied).
    # NB: the train state is donated, so snapshot to host first.
    p_before = jax.tree_util.tree_map(np.asarray, state.params_b.fc_a)
    state, m2 = learner.train_iteration(state, opp, jnp.int32(pool_size))
    diff = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - np.asarray(b)).max()),
        p_before, state.params_b.fc_a,
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_feature_layers_frozen():
    cfg = small_cfg()
    learner = DQNLearner(ENV, cfg)
    state = learner.init_state(jax.random.PRNGKey(0))
    params_a = qnet_init(jax.random.PRNGKey(1))
    opp, n = stack_opponents(params_a, [], cfg.pool_max)
    feat_before = jax.tree_util.tree_map(np.asarray, state.params_b.feat1)
    for _ in range(3):
        state, _ = learner.train_iteration(state, opp, jnp.int32(n))
    np.testing.assert_array_equal(feat_before.w, np.asarray(state.params_b.feat1.w))


def test_pool_opponents_selected():
    cfg = small_cfg()
    # force pool usage
    cfg = DQNConfig(
        **{f: getattr(cfg, f) for f in (
            "num_envs", "rollout_length", "updates_per_iteration", "batch_size",
            "memory_size", "pool_max", "target_update_interval")},
        selfplay=SelfPlayConfig(opponent_pool_ratio=1.0),
    )
    learner = DQNLearner(ENV, cfg)
    state = learner.init_state(jax.random.PRNGKey(0))
    params_a = qnet_init(jax.random.PRNGKey(1))
    pool = [qnet_init(jax.random.PRNGKey(2)), qnet_init(jax.random.PRNGKey(3))]
    opp, n = stack_opponents(params_a, pool, cfg.pool_max)
    total_pool_games = 0
    for _ in range(6):
        state, m = learner.train_iteration(state, opp, jnp.int32(n))
        total_pool_games += int(m.games_vs_pool)
    # with ratio 1.0 every re-bound episode is vs pool
    assert (np.asarray(state.opp_idx) > 0).any()
    assert total_pool_games > 0


def test_determinism_same_seed():
    cfg = small_cfg()
    params_a = qnet_init(jax.random.PRNGKey(1))
    opp, n = stack_opponents(params_a, [], cfg.pool_max)

    def run():
        learner = DQNLearner(ENV, cfg)
        state = learner.init_state(jax.random.PRNGKey(42))
        for _ in range(2):
            state, m = learner.train_iteration(state, opp, jnp.int32(n))
        return state, m

    s1, m1 = run()
    s2, m2 = run()
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params_b), jax.tree_util.tree_leaves(s2.params_b)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(m1.episodes) == int(m2.episodes)
    assert float(m1.mean_loss) == float(m2.mean_loss)


def test_target_sync():
    cfg = small_cfg(target_update_interval=4, updates_per_iteration=4)
    learner = DQNLearner(ENV, cfg)
    state = learner.init_state(jax.random.PRNGKey(0))
    params_a = qnet_init(jax.random.PRNGKey(1))
    opp, n = stack_opponents(params_a, [], cfg.pool_max)
    state, _ = learner.train_iteration(state, opp, jnp.int32(n))
    # after exactly 4 updates with interval 4, target == online
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params_b),
        jax.tree_util.tree_leaves(state.target_b),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reset_learner():
    cfg = small_cfg()
    learner = DQNLearner(ENV, cfg)
    state = learner.init_state(jax.random.PRNGKey(0))
    params_a = qnet_init(jax.random.PRNGKey(1))
    opp, n = stack_opponents(params_a, [], cfg.pool_max)
    state, _ = learner.train_iteration(state, opp, jnp.int32(n))
    fresh = qnet_init(jax.random.PRNGKey(9))
    state = learner.reset_learner(state, fresh)
    assert int(state.buffer.size) == 0
    assert float(state.epsilon) == 1.0
    assert int(state.train_steps) == 0


def test_bucket_binding_proportions():
    """bucket_opp_idx matches the reference's per-episode opponent
    marginal (train_iterative.py:235-236) exactly, stratified."""
    from pingpong_tpu.train.dqn import bucket_opp_idx

    idx = np.asarray(bucket_opp_idx(1000, 0.35, jnp.int32(4)))
    counts = np.bincount(idx, minlength=5)
    assert counts[0] == 650                      # (1 - ratio) * B vs A
    assert counts[1:].sum() == 350               # ratio * B vs pool
    assert counts[1:].max() - counts[1:].min() <= 1   # even member split
    assert (np.diff(idx) >= 0).all()             # contiguous buckets
    # empty pool -> everyone vs A (reference: pool draw needs a pool)
    assert (np.asarray(bucket_opp_idx(64, 0.5, jnp.int32(0))) == 0).all()
    # ratio 1.0 -> nobody vs A
    assert (np.asarray(bucket_opp_idx(64, 1.0, jnp.int32(2))) > 0).all()


def test_bucketed_binding_mixes_opponents():
    """Default (bucketed) binding on the fused rollout path plays both
    frozen A and pool members, without ever permuting the env batch."""
    cfg = small_cfg(
        num_envs=64, rollout_length=64,
        selfplay=SelfPlayConfig(opponent_pool_ratio=0.5),
    )
    assert cfg.opponent_binding == "bucketed"
    learner = DQNLearner(EnvConfig(max_episode_steps=64), cfg)
    state = learner.init_state(jax.random.PRNGKey(0))
    params_a = qnet_init(jax.random.PRNGKey(1))
    pool = [qnet_init(jax.random.PRNGKey(2)), qnet_init(jax.random.PRNGKey(3))]
    opp, n = stack_opponents(params_a, pool, cfg.pool_max)
    games_a = games_p = 0
    for _ in range(4):
        state, m = learner.train_iteration(state, opp, jnp.int32(n))
        games_a += int(m.games_vs_a)
        games_p += int(m.games_vs_pool)
    assert games_a > 0 and games_p > 0
    # once every env has finished an episode, bindings sit exactly on the
    # bucket layout: nondecreasing in env index
    oi = np.asarray(state.opp_idx)
    from pingpong_tpu.train.dqn import bucket_opp_idx

    target = np.asarray(bucket_opp_idx(64, 0.5, jnp.int32(n)))
    ended_all = np.asarray(state.ended)
    assert (oi[ended_all] == target[ended_all]).all()


def test_bucketed_rotation_reaches_starved_members():
    """ADVICE r4/r5: when the pool bucket span has fewer env lanes than
    pool members, a fixed bucket map would never train against the
    lane-less members. Round 5 replaces the round-4 fall-back-to-sorted
    (whose static check saw only the PADDED pool_max and fired
    spuriously) with a rotating member offset: over successive chunks
    every member is reached, no warning, still sort-free."""
    import warnings

    from pingpong_tpu.train.dqn import bucket_opp_idx, bucketed_covers_pool

    assert bucketed_covers_pool(1000, 0.35, 4)
    assert not bucketed_covers_pool(16, 0.25, 6)   # span 4 < 6 members

    # unit: the rotating map covers every member across phases — also
    # under a CONSTANT phase increment with gcd(c, pool_size) > 1 (the
    # aliasing mode of a raw `phase % pool`: lockstep time-limit
    # episodes make the per-chunk episode count constant, e.g. c=16
    # with pool 6 -> residues {0, 4, 2} only). The hashed phase breaks
    # the arithmetic structure.
    for step in (1, 16, 6):          # gcd(16,6)=2; gcd(6,6)=6 (worst)
        covered = set()
        for k in range(32):
            ids = np.asarray(bucket_opp_idx(16, 0.25, jnp.int32(6),
                                            phase=jnp.int32(k * step)))
            covered |= set(ids[ids > 0].tolist())
        assert covered == set(range(1, 7)), (step, covered)
    # covered regime: phase leaves the fixed map untouched
    fixed = np.asarray(bucket_opp_idx(1000, 0.35, jnp.int32(4)))
    rot = np.asarray(bucket_opp_idx(1000, 0.35, jnp.int32(4),
                                    phase=jnp.int32(3)))
    np.testing.assert_array_equal(fixed, rot)

    cfg = small_cfg(
        num_envs=16, rollout_length=64, pool_max=6,
        selfplay=SelfPlayConfig(opponent_pool_ratio=0.25),
    )
    assert cfg.opponent_binding == "bucketed"
    learner = DQNLearner(EnvConfig(max_episode_steps=32), cfg)
    state = learner.init_state(jax.random.PRNGKey(0))
    pool = [qnet_init(jax.random.PRNGKey(10 + i)) for i in range(6)]
    opp, n = stack_opponents(qnet_init(jax.random.PRNGKey(1)), pool,
                             cfg.pool_max)
    seen = set()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        for _ in range(10):
            state, m = learner.train_iteration(state, opp, jnp.int32(n))
            seen |= set(np.asarray(state.opp_idx).tolist())
    assert not any("falling back" in str(w.message) for w in caught)
    # rotation reaches members beyond the 4-lane bucket span over chunks
    assert len(seen & set(range(1, 7))) >= 5
