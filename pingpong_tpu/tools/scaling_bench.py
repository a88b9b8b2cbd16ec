"""Weak-scaling benchmark for the data-parallel train iteration.

Measures env-steps/s of ``DQNLearner.train_iteration`` as the device
count grows with a FIXED per-device env batch (weak scaling): the
BASELINE.md target is >=80% linear scaling to 2+ hosts. SPMD comes from
the ``data``-axis mesh (``parallel/mesh.py``) — the env batch, replay
ring, and rollout transitions shard across devices; parameters and the
update replicate (grads reduce over ICI via XLA-inserted psums).

Run it on a real pod slice::

    python -m pingpong_tpu.tools.scaling_bench            # all devices
    python -m pingpong_tpu.tools.scaling_bench --per-device-envs 8192

Multi-host: launch one process per host with ``--distributed`` (the CLI
flag wires jax.distributed.initialize); each process reports the global
rate from its local dispatch.

On this development box only ONE real TPU chip is reachable, so the
harness is validated on a virtual CPU mesh
(``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8``)
— mechanism-correct, not a performance statement (CPU "devices" share
cores). tests/test_scaling_bench.py runs the 1->2->4->8 ladder there.

Timing discipline: host-fetch-terminated slope (see bench.py) — on this
backend ``block_until_ready`` on donated outputs returns at dispatch.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pingpong_tpu.config.schema import DQNConfig, EnvConfig, MeshConfig


def _env_cfg() -> EnvConfig:
    return EnvConfig(
        paddle_speed=0.03, magnus_factor=0.025, restitution=1.0, friction=0.6,
        ball_speed_range=(0.03, 0.05), spin_range=(-5, 5),
        speed_scale_every=1, speed_increment=0.1, max_episode_steps=4096,
    )


def measure_rate(
    n_devices: int,
    per_device_envs: int,
    rollout_length: int = 128,
    updates: int = 64,
    n1: int = 5,
    n2: int = 15,
    use_pallas: Optional[bool] = None,
    learner_sharding: str = "auto",
) -> float:
    """env-steps/s of the full train iteration on the first ``n_devices``
    visible devices (weak scaling: global batch = per_device * n)."""
    from jax.sharding import Mesh

    from pingpong_tpu.models import qnet_init
    from pingpong_tpu.train.dqn import DQNLearner, stack_opponents

    devices = np.array(jax.devices()[:n_devices]).reshape(n_devices, 1)
    mesh = Mesh(devices, ("data", "model"))
    if use_pallas is None:
        # the fused kernel path is TPU-only at speed; the interpreter is
        # too slow for a CPU-mesh mechanism check
        use_pallas = jax.devices()[0].platform == "tpu"
    cfg = DQNConfig(
        num_envs=per_device_envs * n_devices,
        rollout_length=rollout_length,
        updates_per_iteration=updates,
        batch_size=256,
        memory_size=max(per_device_envs * n_devices * 64, 65536),
        use_pallas_rollout=use_pallas,
        use_pallas_eval=use_pallas,
        learner_sharding=learner_sharding,
    )
    learner = DQNLearner(_env_cfg(), cfg, mesh=mesh)
    state = learner.shard_state(learner.init_state(jax.random.PRNGKey(0)))
    opp, n = stack_opponents(qnet_init(jax.random.PRNGKey(1)), [], 0)
    n = jnp.int32(n)
    state, m = learner.train_iteration(state, opp, n)
    np.asarray(m.mean_loss)

    def run(k):
        nonlocal state, m
        t0 = time.perf_counter()
        for _ in range(k):
            state, m = learner.train_iteration(state, opp, n)
        np.asarray(m.mean_loss)
        return time.perf_counter() - t0

    t1 = run(n1)
    t2 = run(n2)
    dt = (t2 - t1) / (n2 - n1)
    if dt <= 0.0:
        # Timing noise (e.g. a loaded CPU box running the test suite) can
        # make the two-point slope non-positive; the per-call average is
        # positive by construction and still a sane rate for the
        # mechanism check. Real benchmark runs use large n1/n2 where the
        # slope is stable.
        dt = (t1 + t2) / (n1 + n2)
    return cfg.num_envs * cfg.rollout_length / dt


def run_ladder(
    device_counts: List[int], per_device_envs: int, **kw
) -> List[dict]:
    rows = []
    base = None
    for n in device_counts:
        rate = measure_rate(n, per_device_envs, **kw)
        if base is None:
            base = rate
        eff = rate / (base * n / device_counts[0])
        rows.append({
            "devices": n,
            "global_envs": per_device_envs * n,
            "env_steps_per_s": round(rate),
            "scaling_efficiency": round(eff, 4),
        })
        print(json.dumps(rows[-1]), file=sys.stderr)
    return rows


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--per-device-envs", type=int, default=4096)
    ap.add_argument("--rollout-length", type=int, default=128)
    ap.add_argument("--updates", type=int, default=64,
                    help="SGD updates per iteration")
    ap.add_argument("--learner-sharding", default="auto",
                    choices=("auto", "replicated", "sharded"),
                    help="multi-chip learner layout (docs/PODRUN.md): "
                         "auto switches to the sharded-PER learner "
                         "above 16 chips")
    ap.add_argument("--n1", type=int, default=5)
    ap.add_argument("--n2", type=int, default=15,
                    help="slope-timing window (see bench.py discipline)")
    ap.add_argument(
        "--devices", type=str, default=None,
        help="comma-separated ladder (default: 1,2,4,...,N_visible)",
    )
    ap.add_argument(
        "--distributed", action="store_true",
        help="multi-host: jax.distributed.initialize() before backend "
             "init (one process per host; see docs/PODRUN.md)",
    )
    args = ap.parse_args(argv)
    if args.distributed:
        from pingpong_tpu.parallel.mesh import initialize_distributed

        initialize_distributed()
    n_vis = len(jax.devices())
    if args.devices:
        ladder = [int(x) for x in args.devices.split(",")]
    else:
        ladder = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_vis]
    rows = run_ladder(ladder, args.per_device_envs,
                      rollout_length=args.rollout_length,
                      updates=args.updates, n1=args.n1, n2=args.n2,
                      learner_sharding=args.learner_sharding)
    print(json.dumps({
        "metric": "weak_scaling_efficiency",
        "value": rows[-1]["scaling_efficiency"],
        "unit": "fraction",
        "ladder": rows,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
