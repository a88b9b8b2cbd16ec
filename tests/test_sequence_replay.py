"""Sequence replay (per-env time ring) tests."""

import numpy as np
import jax
import jax.numpy as jnp

from pingpong_tpu.replay.sequence import (
    seq_init,
    seq_push_step,
    seq_sample,
)

TRACE = 4


def push_pattern(buf, episode_lens, num_envs=2):
    """Drive the buffer: env 0 follows episode_lens, env 1 runs one long
    episode. Obs encodes (env, step) for verification."""
    t = 0
    ep_marks = []
    lens = list(episode_lens)
    cur = 0
    remaining = lens[cur] if lens else 10**9
    while lens and cur < len(lens):
        obs = jnp.asarray(
            [[e + 1, t, 0, 0, 0, 0, 0] for e in range(num_envs)], jnp.float32
        )
        done0 = remaining == 1
        done = jnp.asarray([done0] + [False] * (num_envs - 1))
        buf = seq_push_step(
            buf, obs, jnp.zeros((num_envs,), jnp.int32),
            jnp.ones((num_envs,), jnp.float32), done, TRACE,
        )
        t += 1
        remaining -= 1
        if done0:
            ep_marks.append(t)
            cur += 1
            remaining = lens[cur] if cur < len(lens) else 0
    return buf, t


def test_admission_rule_counts_only_long_episodes():
    buf = seq_init(2, 64)
    # episodes of length 2 (too short), 6 (ok), 3 (too short), 4 (ok)
    buf, _ = push_pattern(buf, [2, 6, 3, 4])
    assert int(buf.ep_count) == 2


def test_windows_never_cross_episodes():
    buf = seq_init(2, 64)
    buf, steps = push_pattern(buf, [5, 7, 6])
    s = seq_sample(buf, jax.random.PRNGKey(0), 256, TRACE, rejection_rounds=8)
    valid = np.asarray(s.valid)
    # sparse ring (18/64 columns, 9 valid windows of 122 positions): the
    # rejection sampler lands ~46% of draws; production rings are dense
    assert valid.mean() > 0.2
    obs = np.asarray(s.obs)           # (N, T, 7): [env+1, step,...]
    done = np.asarray(s.done)
    for i in np.nonzero(valid)[0]:
        env_col = obs[i, :, 0]
        steps_col = obs[i, :, 1]
        assert (env_col == env_col[0]).all()
        # consecutive steps
        np.testing.assert_array_equal(np.diff(steps_col), 1)
        # done only allowed at the last position
        assert not done[i, :-1].any()
        if env_col[0] == 1:  # env 0 had episode boundaries
            # window must not span a boundary: check via ep id equality was
            # enforced; consecutive steps + no interior done implies it
            pass


def test_inflight_episode_excluded():
    buf = seq_init(1, 64)
    # one long episode never finishing
    for t in range(20):
        obs = jnp.asarray([[1, t, 0, 0, 0, 0, 0]], jnp.float32)
        buf = seq_push_step(
            buf, obs, jnp.zeros((1,), jnp.int32), jnp.ones((1,), jnp.float32),
            jnp.asarray([False]), TRACE,
        )
    s = seq_sample(buf, jax.random.PRNGKey(0), 64, TRACE, rejection_rounds=8)
    assert not np.asarray(s.valid).any()


def test_ring_wrap_invalidates_stale_windows():
    ring = 16
    buf = seq_init(1, ring)
    # finish an episode of 10, then another of 12 which wraps
    buf, _ = push_pattern(buf, [10, 12], num_envs=1)
    s = seq_sample(buf, jax.random.PRNGKey(1), 512, TRACE, rejection_rounds=8)
    valid = np.asarray(s.valid)
    obs = np.asarray(s.obs)
    # every valid window must come from intact (non-overwritten) data:
    # consecutive steps of one env
    for i in np.nonzero(valid)[0]:
        np.testing.assert_array_equal(np.diff(obs[i, :, 1]), 1)


def test_seam_straddling_window_rejected_for_ring_spanning_episode():
    """One episode spanning ~ring_len steps has equal ep-ids on both sides
    of the write seam; the seam check must still reject such windows."""
    ring = 16
    buf = seq_init(1, ring)
    # single episode of ring+6 steps: wraps, same ep id everywhere
    for t in range(ring + 6):
        obs = jnp.asarray([[1, t, 0, 0, 0, 0, 0]], jnp.float32)
        done = jnp.asarray([t == ring + 5])
        buf = seq_push_step(
            buf, obs, jnp.zeros((1,), jnp.int32), jnp.ones((1,), jnp.float32),
            done, TRACE,
        )
    s = seq_sample(buf, jax.random.PRNGKey(7), 512, TRACE, rejection_rounds=8)
    valid = np.asarray(s.valid)
    obs = np.asarray(s.obs)
    # no valid window may be time-discontinuous (mix newest + one-revolution
    # -old steps across the seam)
    for i in np.nonzero(valid)[0]:
        np.testing.assert_array_equal(np.diff(obs[i, :, 1]), 1)


def test_derived_next_obs_matches_shifted_obs():
    """next_obs is not stored; the sampler must return obs shifted by one
    for every window position except the final step of an episode-ending
    window (whose bootstrap term the loss masks by 1-done)."""
    buf = seq_init(2, 64)
    buf, _ = push_pattern(buf, [6, 9, 7])
    s = seq_sample(buf, jax.random.PRNGKey(11), 512, TRACE,
                   rejection_rounds=8)
    valid = np.asarray(s.valid)
    assert valid.any()
    obs = np.asarray(s.obs)
    nxt = np.asarray(s.next_obs)
    done = np.asarray(s.done)
    for i in np.nonzero(valid)[0]:
        # steps encode time: next must be exactly one step ahead
        for j in range(TRACE):
            if j == TRACE - 1 and done[i, j]:
                continue  # undefined by contract, masked in the loss
            assert nxt[i, j, 1] == obs[i, j, 1] + 1, (i, j)
            assert nxt[i, j, 0] == obs[i, j, 0], (i, j)  # same env


def test_mid_episode_window_at_write_frontier_rejected():
    """A window ending mid-episode exactly at the write frontier has no
    obs[t0+T] to derive next from — it must be invalid; one ending ON an
    episode boundary at the frontier needs no next value and stays
    valid."""
    # env 0: a single in-flight episode of exactly TRACE+1 steps: the only
    # full-trace window ends mid-episode at the frontier AND is in-flight
    buf = seq_init(1, 64)
    for t in range(TRACE + 1):
        obs = jnp.asarray([[1, t, 0, 0, 0, 0, 0]], jnp.float32)
        buf = seq_push_step(
            buf, obs, jnp.zeros((1,), jnp.int32), jnp.ones((1,), jnp.float32),
            jnp.asarray([False]), TRACE,
        )
    s = seq_sample(buf, jax.random.PRNGKey(0), 128, TRACE, rejection_rounds=8)
    assert not np.asarray(s.valid).any()

    # an episode of exactly TRACE steps ENDING at the frontier: its single
    # window terminates the episode, so it is valid despite no next value
    buf2 = seq_init(1, 64)
    buf2, _ = push_pattern(buf2, [TRACE], num_envs=1)
    s2 = seq_sample(buf2, jax.random.PRNGKey(0), 128, TRACE,
                    rejection_rounds=8)
    v2 = np.asarray(s2.valid)
    assert v2.any()
    done2 = np.asarray(s2.done)
    assert done2[v2, -1].all()


def test_sample_determinism():
    buf = seq_init(2, 64)
    buf, _ = push_pattern(buf, [8, 8])
    s1 = seq_sample(buf, jax.random.PRNGKey(3), 32, TRACE)
    s2 = seq_sample(buf, jax.random.PRNGKey(3), 32, TRACE)
    np.testing.assert_array_equal(np.asarray(s1.obs), np.asarray(s2.obs))
    np.testing.assert_array_equal(np.asarray(s1.valid), np.asarray(s2.valid))


def test_episode_uniform_matches_reference_distribution():
    """The parity knob must reproduce the reference's two-stage rule
    (train_rnn_iterative.py:129-144): episodes uniform with replacement,
    then offset uniform. Episode A (len 4 = TRACE, 1 window) and episode
    B (len 13, 10 windows) must each be sampled ~50%; window-uniform
    would put A at ~1/11."""
    buf = seq_init(2, 64, dir_cap=16)
    buf, _ = push_pattern(buf, [4, 13])
    assert int(buf.ep_count) == 2
    assert int(buf.dir_cursor) == 2

    s = seq_sample(buf, jax.random.PRNGKey(0), 4096, TRACE,
                   rejection_rounds=8, episode_uniform=True)
    valid = np.asarray(s.valid)
    assert valid.mean() > 0.95  # directory candidates are almost never bad
    step0 = np.asarray(s.obs)[valid, 0, 1]  # first step index of window
    frac_a = (step0 < 4).mean()             # episode A covers steps 0..3
    assert 0.45 < frac_a < 0.55, frac_a

    # contrast: window-uniform keeps the documented default behavior
    sw = seq_sample(buf, jax.random.PRNGKey(0), 4096, TRACE,
                    rejection_rounds=8, episode_uniform=False)
    vw = np.asarray(sw.valid)
    frac_a_w = (np.asarray(sw.obs)[vw, 0, 1] < 4).mean()
    assert frac_a_w < 0.2, frac_a_w

    # offsets within episode B must be uniform over its 10 windows
    off_b = step0[step0 >= 4] - 4.0
    counts = np.bincount(off_b.astype(int), minlength=10)
    assert counts.min() > 0.6 * counts.mean()


def test_episode_uniform_rejects_stale_directory_records():
    """After the ring overwrites an episode, its directory record must be
    rejected (id mismatch), and every valid sample must still be a real
    single-episode window."""
    buf = seq_init(2, 16, dir_cap=8)
    # 4 episodes of len 6 = 24 steps into a 16-ring: the first episode's
    # columns are fully overwritten, its directory record is stale
    buf, _ = push_pattern(buf, [6, 6, 6, 6])
    assert int(buf.dir_cursor) == 4
    s = seq_sample(buf, jax.random.PRNGKey(1), 1024, TRACE,
                   rejection_rounds=8, episode_uniform=True)
    valid = np.asarray(s.valid)
    assert valid.mean() > 0.3
    obs = np.asarray(s.obs)
    done = np.asarray(s.done)
    for i in np.nonzero(valid)[0]:
        assert not done[i, :-1].any()                   # no mid-window end
        np.testing.assert_array_equal(np.diff(obs[i, :, 1]), 1)


def test_episode_uniform_requires_directory():
    buf = seq_init(2, 64)  # dir_cap=0
    try:
        seq_sample(buf, jax.random.PRNGKey(0), 8, TRACE,
                   episode_uniform=True)
    except ValueError:
        return
    raise AssertionError("expected ValueError without a directory")
