"""Reproducibility regression harness.

The framework's contract: identical seed + config + batch layout =>
bit-identical trajectories on the same backend. This test freezes a golden
trajectory fingerprint (generated once on the CPU backend and committed)
so any change to env math, serve RNG layout, or action selection that
silently alters trajectories fails loudly. Regenerate deliberately with:

    python tests/test_golden_repro.py --regen
"""

import json
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from pingpong_tpu.config import EnvConfig
from pingpong_tpu.env.pong import (
    env_params_from_config,
    observe,
    reset,
    step_autoreset_batch,
)
from pingpong_tpu.models.policy import ball_follower_action

GOLDEN = Path(__file__).parent / "golden" / "trajectory_fingerprint.json"

CFG = EnvConfig(
    paddle_speed=0.03, magnus_factor=0.025, restitution=1.0, friction=0.6,
    ball_speed_range=(0.03, 0.05), spin_range=(-5, 5),
    speed_scale_every=1, speed_increment=0.1,
)


def compute_fingerprint(seed=123, batch=64, steps=256):
    params = env_params_from_config(CFG)
    key = jax.random.PRNGKey(seed)
    key, k_env = jax.random.split(key)
    state = jax.vmap(reset, in_axes=(None, 0))(
        params, jax.random.split(k_env, batch)
    )

    def one(carry, _):
        st, k = carry
        k, k_step = jax.random.split(k)
        obs_a, obs_b = observe(st)
        aa = ball_follower_action(obs_a)
        ab = ball_follower_action(obs_b)
        st, out = step_autoreset_batch(params, st, k_step, aa, ab)
        return (st, k), (out.reward_b.sum(), st.ball_x.sum())

    (state, _), (rews, xs) = jax.lax.scan(one, (state, key), None, length=steps)
    return {
        "reward_sum": float(jnp.sum(rews)),
        "x_checksum": float(jnp.sum(xs)),
        "final_ball_x_mean": float(jnp.mean(state.ball_x)),
        "final_score_total": int(
            jnp.sum(state.score_a) + jnp.sum(state.score_b)
        ),
    }


def test_golden_trajectory_fingerprint():
    assert GOLDEN.is_file(), "golden fingerprint missing — run --regen"
    want = json.loads(GOLDEN.read_text())
    got = compute_fingerprint()
    assert got["final_score_total"] == want["final_score_total"]
    np.testing.assert_allclose(got["reward_sum"], want["reward_sum"], rtol=0)
    np.testing.assert_allclose(got["x_checksum"], want["x_checksum"],
                               rtol=1e-6)
    np.testing.assert_allclose(
        got["final_ball_x_mean"], want["final_ball_x_mean"], rtol=1e-6
    )


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        GOLDEN.parent.mkdir(exist_ok=True)
        GOLDEN.write_text(json.dumps(compute_fingerprint(), indent=2))
        print(f"wrote {GOLDEN}")
