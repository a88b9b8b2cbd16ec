"""Measure the train-loop stall of a full-state autosave (VERDICT r4 #2).

The reference RNN trainer autosaves its training state synchronously every
10k steps (``/root/reference/scripts/train_rnn_iterative.py:630-667``);
SURVEY §5 prescribes *async* checkpointing as the TPU equivalent. This
tool quantifies, at the SHIPPED bench config (8192 envs x 128 steps, 64
updates, 1M-slot block-layout PER — the exact state ``bench.py`` trains),
three numbers on the real chip:

1. ``sync_save_s``   — wall time of a synchronous Orbax full-state save
                       (what every autosave used to cost the train loop);
2. ``async_call_s``  — host-blocking time of ``AsyncAutosaver.save()``
                       (one jitted device-side snapshot dispatch + thread
                       start — the only part left on the critical path);
3. ``stall_per_autosave_s`` — end-to-end throughput accounting: the extra
   wall time of a window of train iterations that fires one async save
   mid-window (background fetch + write contend with the loop's
   dispatches) versus the same window without, median over trials.

Prints one JSON line. Timing uses host-fetch barriers per the
``docs/PERF.md`` discipline (the train state is donated, so
block_until_ready lies on this backend).
"""

from __future__ import annotations

import json
import statistics
import sys
import tempfile
import time
from pathlib import Path


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pingpong_tpu.checkpoint.orbax_io import (
        AsyncAutosaver,
        autosave_full_state,
    )
    from pingpong_tpu.config import DQNConfig, EnvConfig
    from pingpong_tpu.train.dqn import DQNLearner, stack_opponents

    cfg = DQNConfig(num_envs=8192, rollout_length=128,
                    updates_per_iteration=64, batch_size=256,
                    memory_size=1_048_576)
    env_cfg = EnvConfig(
        paddle_speed=0.03, magnus_factor=0.025, restitution=1.0,
        friction=0.6, ball_speed_range=(0.03, 0.05), spin_range=(-5, 5),
        speed_scale_every=1, speed_increment=0.1, max_episode_steps=4096,
    )
    learner = DQNLearner(env_cfg, cfg)
    state = learner.init_state(jax.random.PRNGKey(0))
    # independent buffers: the train state is donated every iteration
    params_a = jax.tree_util.tree_map(jnp.copy, state.params_b)
    opp, n = stack_opponents(params_a, [], 0)
    opp = learner.prepare_opponents(opp)
    n = jnp.int32(n)
    key = jax.random.PRNGKey(1)

    state, m = learner.train_iteration(state, opp, n)   # compile
    np.asarray(m.mean_loss)

    tmp = Path(tempfile.mkdtemp(prefix="autosave_bench_"))
    meta = {"generation": 1, "done_generations": 0, "model_kind": "qnet"}

    # -- 1. synchronous save cost (the old per-autosave stall) ----------
    t0 = time.perf_counter()
    autosave_full_state(tmp / "sync_state", state, params_a, key, meta)
    sync_save_s = time.perf_counter() - t0

    saver = AsyncAutosaver()
    # warm the snapshot program's compile outside the timed region
    saver.save(tmp / "warm_state", (state, params_a, key), meta)
    saver.wait()

    # -- 2. host-blocking time of the async save call -------------------
    call_times = []
    for _ in range(5):
        t0 = time.perf_counter()
        saver.save(tmp / "async_state", (state, params_a, key), meta)
        call_times.append(time.perf_counter() - t0)
        saver.wait()   # outside the timed region
    # first timed call may still join warm-up work; report the median
    async_call_s = statistics.median(call_times)

    # -- 3. throughput accounting: window with one background save ------
    def window(n_iters: int, fire_save: bool) -> float:
        nonlocal state, m
        t0 = time.perf_counter()
        for i in range(n_iters):
            state, m = learner.train_iteration(state, opp, n)
            if fire_save and i == 1:
                saver.save(tmp / "bg_state", (state, params_a, key), meta)
        np.asarray(m.mean_loss)
        dt = time.perf_counter() - t0
        saver.wait()
        return dt

    n_iters = 60   # ~2.9ms/iter => ~170ms window, covers the bg write
    window(n_iters, False)   # warm
    plain, saved = [], []
    for _ in range(6):
        plain.append(window(n_iters, False))
        saved.append(window(n_iters, True))
    stall = statistics.median(saved) - statistics.median(plain)

    result = {
        "metric": "autosave_stall",
        "sync_save_s": round(sync_save_s, 4),
        "async_call_s": round(async_call_s, 6),
        "stall_per_autosave_s": round(stall, 6),
        "window_plain_s": [round(x, 4) for x in plain],
        "window_with_save_s": [round(x, 4) for x in saved],
        "config": "8192x128 envs, 64 upd, PER 2^20 (bench shape)",
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
