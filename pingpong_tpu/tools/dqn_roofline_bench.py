"""DQN fused-update roofline measurements (round-4 VERDICT item 8).

Times the three stages of the headline DQN train iteration separately on
the real chip — fused Pallas rollout, fused update block (K updates),
full iteration — with the floor-difference slope estimator (bench.py
discipline), and prints the analytic FLOP/byte accounting the
docs/ROOFLINE.md DQN section quotes.

Run: ``python -m pingpong_tpu.tools.dqn_roofline_bench``
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pingpong_tpu.config import DQNConfig, EnvConfig


def _slope_time(run_n, n1=10, n2=50, trials=5):
    t1s, t2s = [], []
    for _ in range(trials):
        t1s.append(run_n(n1))
        t2s.append(run_n(n2))
    return (min(t2s) - min(t1s)) / (n2 - n1)


def _bench_env_cfg():
    return EnvConfig(
        paddle_speed=0.03, magnus_factor=0.025, restitution=1.0, friction=0.6,
        ball_speed_range=(0.03, 0.05), spin_range=(-5, 5),
        speed_scale_every=1, speed_increment=0.1, max_episode_steps=4096,
    )


def main():
    from pingpong_tpu.models import qnet_init
    from pingpong_tpu.train.dqn import DQNLearner, stack_opponents

    cfg = DQNConfig(num_envs=8192, rollout_length=128,
                    updates_per_iteration=64, batch_size=256,
                    memory_size=1_048_576)
    learner = DQNLearner(_bench_env_cfg(), cfg)
    state = learner.init_state(jax.random.PRNGKey(0))
    base = qnet_init(jax.random.PRNGKey(1))
    opp, n = stack_opponents(base, [], 0)
    opp = learner.prepare_opponents(opp)
    n = jnp.int32(n)

    # warm the buffer with real trajectories + priority structure
    for _ in range(4):
        state, m = learner.train_iteration(state, opp, n)
    np.asarray(m.mean_loss)

    # ---- full iteration --------------------------------------------------
    def run_full(k):
        nonlocal state, m
        t0 = time.perf_counter()
        for _ in range(k):
            state, m = learner.train_iteration(state, opp, n)
        np.asarray(m.mean_loss)
        return time.perf_counter() - t0

    t_full = _slope_time(run_full)
    print(f"full iteration: {t_full*1e3:.3f} ms "
          f"({cfg.num_envs*cfg.rollout_length/t_full/1e6:.0f}M env-steps/s)",
          file=sys.stderr)

    # ---- update block alone ---------------------------------------------
    upd = jax.jit(learner._update_pallas)
    state2, ml, nr = upd(state)
    np.asarray(ml)

    def run_upd(k):
        nonlocal state2
        t0 = time.perf_counter()
        for _ in range(k):
            state2, ml, _ = upd(state2)
        np.asarray(ml)
        return time.perf_counter() - t0

    t_upd = _slope_time(run_upd)
    print(f"update block ({cfg.updates_per_iteration} updates): "
          f"{t_upd*1e3:.3f} ms ({t_upd/cfg.updates_per_iteration*1e6:.1f} "
          "us/update)", file=sys.stderr)

    # ---- rollout alone ---------------------------------------------------
    roll = jax.jit(lambda s: learner._rollout(s, opp, n))
    state3, st, rs = roll(state)
    np.asarray(rs)

    def run_roll(k):
        nonlocal state3
        t0 = time.perf_counter()
        for _ in range(k):
            state3, st, rs = roll(state3)
        np.asarray(rs)
        return time.perf_counter() - t0

    t_roll = _slope_time(run_roll)
    print(f"rollout (+PER push): {t_roll*1e3:.3f} ms", file=sys.stderr)
    print(f"glue (full - update - rollout): "
          f"{(t_full - t_upd - t_roll)*1e3:.3f} ms", file=sys.stderr)

    # ---- analytic counts -------------------------------------------------
    H, bs, K = 128, cfg.batch_size, cfg.updates_per_iteration
    B2 = 2 * bs
    S = cfg.memory_size // 128 // 128
    heads = cfg.train_heads_only
    # sampler matmuls (f32 HIGHEST = 6-pass on MXU)
    mac_sample = (128 * S            # super sums
                  + S * S            # super cumsum
                  + bs * S * 128     # crows
                  + bs * 128 * 128   # lcdf? (bs,128)x(128,128)? no: crows@tri
                  + bs * 128 * 128)  # rcdf
    # online fwd (obs||next): w1 (H,8)x(8,B2), w2 (H,H)x(H,B2), heads 2x(8,H)x(H,B2)
    mac_fwd_on = H * 8 * B2 + H * H * B2 + 2 * 8 * H * B2
    # target fwd (next only, bs cols)
    mac_fwd_tg = H * 8 * bs + H * H * bs + 2 * 8 * H * bs
    # backward heads-only: dwv/dwa (8,B2)x(B2,H) x2
    mac_bwd = 2 * 8 * B2 * H
    if not heads:
        mac_bwd += 2 * 8 * H * B2 + H * H * B2 + H * H * B2 + H * 8 * B2
    mac_upd = mac_sample + mac_fwd_on + mac_fwd_tg + mac_bwd
    flop_block = 2 * mac_upd * K
    # bytes: per update one (R,128) f32 chunk DMA per sample row
    R = 2 * 7 + 2
    bytes_dma = bs * R * 128 * 4 * K
    # p_alpha plane resident in VMEM (4MB) — loaded once per block
    bytes_plane = cfg.memory_size * 4 * 2  # load pa + store pa
    print(f"analytic: {mac_upd/1e6:.2f} MMAC/update, "
          f"{flop_block/1e9:.2f} GFLOP/block, "
          f"DMA {bytes_dma/1e6:.1f} MB/block, plane {bytes_plane/1e6:.1f} MB",
          file=sys.stderr)
    peak = 197e12   # v5e bf16 MXU; sampler runs 6-pass f32 (~1/6)
    hbm = 819e9
    print(f"block at {flop_block/t_upd/1e12:.2f} TFLOP/s "
          f"({100*flop_block/t_upd/peak:.1f}% of bf16 peak); "
          f"DMA at {bytes_dma/t_upd/1e9:.1f} GB/s "
          f"({100*bytes_dma/t_upd/hbm:.1f}% of HBM)", file=sys.stderr)


if __name__ == "__main__":
    main()
