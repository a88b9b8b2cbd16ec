"""Fused-kernel win-rate estimation for self-play gates.

The generation gate needs an accurate win-rate estimate of learner B vs a
frozen opponent over >= N episodes (``eval_vs_model``,
``/root/reference/scripts/train_iterative.py:171-181``). The batched
while-loop runner (:mod:`evaluation.match`) plays exactly-N games; this
path instead streams episodes through the Pallas actor-rollout kernel
(greedy: sigma and epsilon zero, auto-reset) and reads the win/episode
accumulators — one kernel launch for tens of thousands of episodes.
Statistically the estimator differs from exactly-N games only in that the
episode count is >= N (documented); the per-episode win distribution is
identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pingpong_tpu.env.pong import EnvParams, reset
from pingpong_tpu.models.qnet import QNetParams
from pingpong_tpu.ops.actor_rollout import pack_qnet, pallas_actor_rollout


def _zero_sigma(params: QNetParams) -> QNetParams:
    return params._replace(
        fc_a=params.fc_a._replace(
            w_sigma=jnp.zeros_like(params.fc_a.w_sigma),
            b_sigma=jnp.zeros_like(params.fc_a.b_sigma),
        )
    )


def pallas_win_rate(
    env_params: EnvParams,
    params_a: QNetParams,       # frozen opponent (single)
    params_b: QNetParams,       # learner under evaluation
    key,
    min_episodes: int,
    n_envs: int = 4096,
    chunk_steps: int = 256,
    max_chunks: int = 32,
    tile_rows: int = 512,
    interpret: bool = None,
):
    """Returns (win_rate_b, episodes_played). Streams rollout chunks until
    at least ``min_episodes`` episodes finished (or ``max_chunks``)."""
    learner = pack_qnet(_zero_sigma(params_b))
    opp = pack_qnet(
        jax.tree_util.tree_map(lambda x: x[None], params_a), mirror=True
    )
    key, k_env, k_seed = jax.random.split(key, 3)
    state = jax.vmap(reset, in_axes=(None, 0))(
        env_params, jax.random.split(k_env, n_envs)
    )
    opp_idx = jnp.zeros((n_envs,), jnp.int32)
    ep_ret = jnp.zeros((n_envs,), jnp.float32)
    wins = 0
    episodes = 0
    for chunk in range(max_chunks):
        seed = jax.random.randint(
            jax.random.fold_in(k_seed, chunk), (), 0, jnp.int32(2**31 - 1)
        )
        state, opp_idx, ep_ret, _, stats, _, _ = pallas_actor_rollout(
            env_params, state, opp_idx, ep_ret, learner, opp,
            seed=seed, epsilon=jnp.float32(0.0), pool_size=jnp.int32(0),
            steps=chunk_steps, pool_ratio=0.0,
            tile_rows=tile_rows, interpret=interpret,
            emit_transitions=False,
        )
        episodes += int(stats[0] + stats[2])
        wins += int(stats[1] + stats[3])
        if episodes >= min_episodes:
            break
    return (wins / episodes if episodes else 0.0), episodes
