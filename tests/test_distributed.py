"""Real multi-process SPMD: 2 OS processes x 4 virtual CPU devices each.

The single-process suite already proves the sharded numerics on 8 virtual
devices (tests/test_sharding.py); this exercises the actual multi-host
path (SURVEY.md §2.7 contract): ``jax.distributed.initialize`` across two
processes, a global ``data``-axis mesh spanning both, one jitted
``train_iteration`` whose gradient/metric psums cross the process
boundary, and the host-0-only checkpoint-write guard.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, sys
coordinator, pid, out_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]

from pingpong_tpu.parallel.mesh import (
    create_mesh, initialize_distributed, is_coordinator,
)
initialize_distributed(
    coordinator_address=coordinator, num_processes=2, process_id=pid,
)
import jax
import jax.numpy as jnp
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert len(jax.local_devices()) == 4
assert is_coordinator() == (pid == 0)

from pingpong_tpu.config import DQNConfig, EnvConfig
from pingpong_tpu.config.schema import MeshConfig
from pingpong_tpu.models import qnet_init
from pingpong_tpu.train.dqn import DQNLearner, stack_opponents

cfg = DQNConfig(
    num_envs=16, rollout_length=8, updates_per_iteration=2, batch_size=16,
    memory_size=1024, use_pallas_rollout=False, use_pallas_eval=False,
    target_update_interval=4,
)
mesh = create_mesh(MeshConfig())
learner = DQNLearner(EnvConfig(max_episode_steps=64), cfg, mesh=mesh)
state = learner.shard_state(learner.init_state(jax.random.PRNGKey(0)))
opp, _ = stack_opponents(qnet_init(jax.random.PRNGKey(1)), [], 0)
for _ in range(3):
    state, m = learner.train_iteration(state, opp, jnp.int32(0))

# replicated leaves are fully addressable on every process
from jax.flatten_util import ravel_pytree
params_sum = float(jnp.sum(ravel_pytree(jax.device_get(state.params_b))[0]))
result = {
    "pid": pid,
    "params_sum": params_sum,
    "train_steps": int(state.train_steps),
    "episodes": int(state.episodes),
    "mean_loss": float(m.mean_loss),
    "buffer_size": int(state.buffer.size),
}
with open(f"{out_dir}/result_{pid}.json", "w") as f:
    json.dump(result, f)
print("worker", pid, "ok", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_spmd_train_iteration(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "PYTHONPATH": str(REPO),
    })
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, f"localhost:{port}", str(pid),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=str(REPO), text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    r0 = json.loads((tmp_path / "result_0.json").read_text())
    r1 = json.loads((tmp_path / "result_1.json").read_text())
    # SPMD: both processes executed the same global program — replicated
    # learner state must be bit-identical across hosts (the gradient psum
    # crossed the process boundary)
    assert r0["params_sum"] == r1["params_sum"]
    assert r0["train_steps"] == r1["train_steps"] > 0
    assert r0["episodes"] == r1["episodes"]
    assert r0["buffer_size"] == r1["buffer_size"] == 16 * 8 * 3
    assert np.isfinite(r0["mean_loss"])
