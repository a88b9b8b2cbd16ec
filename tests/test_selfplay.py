"""Self-play generation-loop integration tests (tiny scales)."""

import jax
import numpy as np

from pingpong_tpu.config import DQNConfig, EnvConfig
from pingpong_tpu.config.schema import SelfPlayConfig
from pingpong_tpu.checkpoint.store import list_checkpoints, load_checkpoint
from pingpong_tpu.selfplay.loop import QNetSelfPlay
from pingpong_tpu.utils.metrics import MetricsLogger

ENV = EnvConfig(max_episode_steps=200)


def tiny_cfg(**sp_kw):
    sp = dict(
        max_generations=2,
        episodes_per_generation=8,
        eval_episodes=16,
        max_retries_for_generation=2,
        win_rate_interval=8,
        opponent_pool_ratio=0.33,
    )
    sp.update(sp_kw)
    return DQNConfig(
        selfplay=SelfPlayConfig(**sp),
        num_envs=8,
        rollout_length=32,
        updates_per_iteration=2,
        batch_size=32,
        memory_size=4096,
        pool_max=4,
        target_update_interval=16,
    )


def test_promotion_path(tmp_path):
    # thresholds 0 -> every generation promotes on the first try
    cfg = tiny_cfg(curr_win_threshold=0.0, pool_win_threshold=0.0)
    driver = QNetSelfPlay(ENV, cfg, workdir=str(tmp_path), seed=0,
                          logger=MetricsLogger(echo=False))
    records = driver.run()
    assert len(records) == 2
    assert all(r.promoted for r in records)
    assert all(r.tries == 1 for r in records)
    names = [p.name for p in list_checkpoints(tmp_path / "checkpoints")]
    assert names == ["model5-1", "model5-2"]
    ck = load_checkpoint(tmp_path / "checkpoints" / "model5-1")
    assert ck["generation"] == 1
    assert ck["model_kind"] == "qnet"
    assert 0 <= ck["epsilon"] <= 1


def test_fault_path_resets_learner(tmp_path):
    # impossible thresholds -> fault after max retries, learner reset
    cfg = tiny_cfg(
        max_generations=1,
        curr_win_threshold=1.1,
        pool_win_threshold=1.1,
        max_retries_for_generation=2,
    )
    driver = QNetSelfPlay(ENV, cfg, workdir=str(tmp_path), seed=0,
                          logger=MetricsLogger(echo=False))
    records = driver.run()
    assert len(records) == 1
    assert not records[0].promoted
    assert records[0].tries == 2
    names = [p.name for p in list_checkpoints(tmp_path / "checkpoints")]
    assert names == ["model5-1_fault"]
    # reset semantics: fresh buffer + epsilon back to 1
    assert float(driver.state.epsilon) == 1.0
    assert int(driver.state.buffer.size) == 0


def test_warm_start_from_checkpoint(tmp_path):
    cfg = tiny_cfg(curr_win_threshold=0.0, pool_win_threshold=0.0,
                   max_generations=1)
    d1 = QNetSelfPlay(ENV, cfg, workdir=str(tmp_path), seed=0,
                      logger=MetricsLogger(echo=False))
    d1.run()
    episodes_after = int(d1.state.episodes)

    import dataclasses
    import shutil

    # drop the tier-0 full-state autosave so this exercises the warm-start
    # tier specifically
    shutil.rmtree(tmp_path / "checkpoints" / "latest_qnet_training_state")
    cfg2 = dataclasses.replace(cfg, init_model_path="checkpoints/model5-1")
    d2 = QNetSelfPlay(ENV, cfg2, workdir=str(tmp_path), seed=1,
                      logger=MetricsLogger(echo=False))
    # warm start restores episode counter and epsilon (ref :106-108)
    assert int(d2.state.episodes) == episodes_after
    assert float(d2.state.epsilon) < 1.0
    # pool picked up the promoted checkpoint (ref :199-207)
    assert len(d2.pool) == 1


def test_tier0_full_state_resume_mid_generation(tmp_path):
    """Kill mid-generation, restart: the full-state autosave (PER buffer
    included) must continue the same generation with identical state."""
    cfg = tiny_cfg(curr_win_threshold=0.0, pool_win_threshold=0.0,
                   max_generations=2)
    d1 = QNetSelfPlay(ENV, cfg, workdir=str(tmp_path), seed=0,
                      logger=MetricsLogger(echo=False))
    # simulate an interrupted generation 2 mid-training
    d1.current_generation = 2
    d1.done_generations = 1
    d1._train_block(4)
    d1.autosave(wait=True)
    saved_leaves = jax.tree_util.tree_leaves(jax.device_get(d1.state))

    d2 = QNetSelfPlay(ENV, cfg, workdir=str(tmp_path), seed=7,
                      logger=MetricsLogger(echo=False))
    assert d2._resumed_mid_generation
    assert d2.current_generation == 2 and d2.done_generations == 1
    # bit-compatible: every leaf of the train state (incl. the PER buffer
    # contents and the jit PRNG key) restored exactly
    restored_leaves = jax.tree_util.tree_leaves(jax.device_get(d2.state))
    assert len(saved_leaves) == len(restored_leaves)
    for a, b in zip(saved_leaves, restored_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    records = d2.run()
    assert records[0].generation == 2  # label continued, not skipped


def test_frozen_a_stale_noise_knob(tmp_path):
    """frozen_a_stale_noise: the PLAYING A carries one folded noise draw
    (ref train_iterative.py:86-104 stale-noise quirk); promoted
    checkpoints stay clean; the fold refreshes only when A changes."""
    import dataclasses

    import numpy as np

    from pingpong_tpu.config.schema import SelfPlayConfig
    from pingpong_tpu.selfplay.loop import QNetSelfPlay

    cfg = tiny_cfg(
        frozen_a_stale_noise=True, max_generations=1,
        curr_win_threshold=0.0, pool_win_threshold=0.0,
        episodes_per_generation=4, eval_episodes=4,
    )
    sp = QNetSelfPlay(ENV, cfg, workdir=str(tmp_path), seed=3)
    a = sp.params_a
    play = sp.params_a_play
    # heads differ by the folded draw; sigmas zeroed on the playing copy
    assert not np.allclose(np.asarray(a.fc_a.w_mu),
                           np.asarray(play.fc_a.w_mu))
    assert (np.asarray(play.fc_a.w_sigma) == 0).all()
    assert (np.asarray(play.fc_v.w_sigma) == 0).all()
    # feature trunk untouched
    np.testing.assert_array_equal(np.asarray(a.feat1.w),
                                  np.asarray(play.feat1.w))
    recs = sp.run()
    assert recs[0].promoted
    # after promotion A_play refreshed against the NEW A
    assert not np.allclose(np.asarray(sp.params_a.fc_a.w_mu),
                           np.asarray(sp.params_a_play.fc_a.w_mu))
    # the saved checkpoint holds the clean A (sigma intact), not the fold
    from pingpong_tpu.selfplay.pool import load_params_any

    saved = load_params_any(recs[0].checkpoint)
    assert np.asarray(saved.fc_a.w_sigma).any()


def test_frozen_a_fold_persists_across_resume(tmp_path):
    """ADVICE r4: a resumed run must re-fold the SAME stale-noise draw
    into frozen A (the fold key rides the autosave meta), so the playing
    A is bit-identical before and after a kill-and-restart."""
    cfg = tiny_cfg(
        frozen_a_stale_noise=True,
        curr_win_threshold=0.0, pool_win_threshold=0.0,
    )
    d1 = QNetSelfPlay(ENV, cfg, workdir=str(tmp_path), seed=0,
                      logger=MetricsLogger(echo=False))
    d1.current_generation = 1
    d1._train_block(4)
    d1.autosave(wait=True)
    play1 = jax.device_get(d1.params_a_play)

    # different seed: without the persisted fold key the fresh driver
    # would draw different noise
    d2 = QNetSelfPlay(ENV, cfg, workdir=str(tmp_path), seed=99,
                      logger=MetricsLogger(echo=False))
    play2 = jax.device_get(d2.params_a_play)
    for a, b in zip(jax.tree_util.tree_leaves(play1),
                    jax.tree_util.tree_leaves(play2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_autosave_snapshot_is_donation_safe(tmp_path):
    """VERDICT r4 item 2: the async autosave snapshots the state AT CALL
    TIME; continuing to train (which DONATES the live state's buffers to
    the next jitted iteration) must not corrupt the in-flight write. The
    restored state equals the state when save() was called, not the
    later one."""
    cfg = tiny_cfg(curr_win_threshold=0.0, pool_win_threshold=0.0)
    assert cfg.async_autosave
    d1 = QNetSelfPlay(ENV, cfg, workdir=str(tmp_path), seed=0,
                      logger=MetricsLogger(echo=False))
    d1.current_generation = 1
    d1._train_block(4)
    at_save = jax.tree_util.tree_leaves(jax.device_get(d1.state))
    d1.autosave()               # async: returns with the write in flight
    d1._train_block(4)          # donates + overwrites the live buffers
    d1.flush_autosave()
    after = jax.tree_util.tree_leaves(jax.device_get(d1.state))
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(at_save, after)
    )

    d2 = QNetSelfPlay(ENV, cfg, workdir=str(tmp_path), seed=5,
                      logger=MetricsLogger(echo=False))
    restored = jax.tree_util.tree_leaves(jax.device_get(d2.state))
    assert len(at_save) == len(restored)
    for a, b in zip(at_save, restored):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
