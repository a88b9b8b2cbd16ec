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
from pingpong_tpu.models.qnet_rnn import QNetRNNParams
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
    wins, _, episodes = _stream_seat(
        env_params, params_b, params_a, key, min_episodes,
        n_envs, chunk_steps, max_chunks, tile_rows, interpret,
    )
    return (wins / episodes if episodes else 0.0), episodes


def _stream_seat(env_params, bottom_params, top_params, key, min_episodes,
                 n_envs, chunk_steps, max_chunks, tile_rows, interpret):
    """Stream >= min_episodes greedy episodes with ``bottom_params`` in the
    kernel's learner seat (player B) and ``top_params`` as the bound
    opponent (player A, mirror-folded). Returns (bottom_wins, draws,
    episodes)."""
    learner = pack_qnet(_zero_sigma(bottom_params))
    opp = pack_qnet(
        jax.tree_util.tree_map(lambda x: x[None], top_params), mirror=True
    )
    key, k_env, k_seed = jax.random.split(key, 3)
    state = jax.vmap(reset, in_axes=(None, 0))(
        env_params, jax.random.split(k_env, n_envs)
    )
    opp_idx = jnp.zeros((n_envs,), jnp.int32)
    ep_ret = jnp.zeros((n_envs,), jnp.float32)
    wins = draws = episodes = 0
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
        draws += int(stats[4])
        if episodes >= min_episodes:
            break
    return wins, draws, episodes


def pallas_win_rate_balanced(
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
    """Side-balanced fused gate eval: >= min_episodes/2 streamed episodes
    per SEATING. Seat 1 puts B in the kernel's bottom (learner) seat; seat
    2 swaps the packing — A becomes the in-kernel learner and B the
    mirror-folded top player, so B's wins are ``episodes - A_wins -
    draws`` (the kernel counts a step-cap score tie as a draw, matching
    ``evaluation.match``'s strict-score win rule on both seats).

    Returns ``(win_rate_total, win_rate_as_b, win_rate_as_a,
    episodes_total)``.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    k_b, k_a = jax.random.split(key)
    half = max(1, min_episodes // 2)
    wins_b, _, eps_b = _stream_seat(
        env_params, params_b, params_a, k_b, half,
        n_envs, chunk_steps, max_chunks, tile_rows, interpret,
    )
    wins_a_opp, draws_a, eps_a = _stream_seat(
        env_params, params_a, params_b, k_a, half,
        n_envs, chunk_steps, max_chunks, tile_rows, interpret,
    )
    wins_top = eps_a - wins_a_opp - draws_a      # B's wins from the top seat
    total = eps_b + eps_a
    # the streamed episode counts per seat are NOT equal (chunks overshoot
    # differently), and the env favors the bottom seat — a raw
    # wins/episodes aggregate would overweight whichever seat streamed
    # more (measured ~2.6x once) and leak the seat advantage into the
    # gate. Weight the SEATS equally, as the match-runner
    # eval_win_rate_balanced does by construction.
    rate_b = wins_b / max(eps_b, 1)
    rate_a = wins_top / max(eps_a, 1)
    return (
        (rate_b + rate_a) / 2,
        rate_b,
        rate_a,
        total,
    )


# ---- recurrent (DRQN) family --------------------------------------------


def _zero_rnn_sigma(params: QNetRNNParams) -> QNetRNNParams:
    def z(layer):
        return layer._replace(
            w_sigma=jnp.zeros_like(layer.w_sigma),
            b_sigma=jnp.zeros_like(layer.b_sigma),
        )

    out = params._replace(fc_a=z(params.fc_a))
    if params.shared is not None:
        out = out._replace(shared=z(params.shared))
    return out


def _stream_seat_rnn(env_params, bottom_params, top_params, key,
                     min_episodes, n_envs, chunk_steps, max_chunks,
                     tile_rows, max_episode_steps, interpret):
    """Recurrent analog of :func:`_stream_seat`: greedy episodes with
    ``bottom_params`` in the kernel's learner seat, hidden states carried
    across chunks (zero-reset on episode boundaries in-kernel). Returns
    (bottom_wins, draws, episodes)."""
    from pingpong_tpu.ops.recurrent_rollout import (
        pack_qnet_rnn,
        pack_rnn_sigma,
        pallas_recurrent_rollout,
    )

    learner = pack_qnet_rnn(bottom_params)
    sigma = jax.tree_util.tree_map(
        jnp.zeros_like, pack_rnn_sigma(bottom_params)
    )
    opp = pack_qnet_rnn(
        jax.tree_util.tree_map(lambda x: x[None], top_params), mirror=True
    )
    key, k_env, k_seed = jax.random.split(key, 3)
    state = jax.vmap(reset, in_axes=(None, 0))(
        env_params, jax.random.split(k_env, n_envs)
    )
    H = bottom_params.lstm[0].w_hh.shape[0]
    hid = jnp.zeros((4 * H, n_envs), jnp.float32)
    opp_idx = jnp.zeros((n_envs,), jnp.int32)
    ep_ret = jnp.zeros((n_envs,), jnp.float32)
    wins = draws = episodes = 0
    for chunk in range(max_chunks):
        seed = jax.random.randint(
            jax.random.fold_in(k_seed, chunk), (), 0, jnp.int32(2**31 - 1)
        )
        (state, opp_idx, ep_ret, hid, _, stats, _, _) = (
            pallas_recurrent_rollout(
                env_params, state, opp_idx, ep_ret, hid, learner, sigma,
                opp, seed=seed, epsilon=jnp.float32(0.0),
                steps=chunk_steps, max_episode_steps=max_episode_steps,
                tile_rows=tile_rows, interpret=interpret,
                emit_transitions=False,
            )
        )
        episodes += int(stats[0] + stats[2])
        wins += int(stats[1] + stats[3])
        draws += int(stats[4])
        if episodes >= min_episodes:
            break
    return wins, draws, episodes


def rnn_win_rate(
    env_params: EnvParams,
    params_a: QNetRNNParams,
    params_b: QNetRNNParams,
    key,
    min_episodes: int,
    n_envs: int = 2048,
    chunk_steps: int = 256,
    max_chunks: int = 32,
    tile_rows: int = 512,
    max_episode_steps: int = 1000,
    interpret: bool = None,
):
    """Fused single-seat gate eval for the recurrent family. Returns
    (win_rate_b, episodes_played)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    wins, _, episodes = _stream_seat_rnn(
        env_params, params_b, params_a, key, min_episodes, n_envs,
        chunk_steps, max_chunks, tile_rows, max_episode_steps, interpret,
    )
    return (wins / episodes if episodes else 0.0), episodes


def rnn_win_rate_balanced(
    env_params: EnvParams,
    params_a: QNetRNNParams,
    params_b: QNetRNNParams,
    key,
    min_episodes: int,
    n_envs: int = 2048,
    chunk_steps: int = 256,
    max_chunks: int = 32,
    tile_rows: int = 512,
    max_episode_steps: int = 1000,
    interpret: bool = None,
):
    """Side-balanced fused gate eval for the recurrent family (see
    :func:`pallas_win_rate_balanced` for the seat-swap construction).
    Returns ``(win_rate_total, win_rate_as_b, win_rate_as_a,
    episodes_total)``."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    k_b, k_a = jax.random.split(key)
    half = max(1, min_episodes // 2)
    wins_b, _, eps_b = _stream_seat_rnn(
        env_params, params_b, params_a, k_b, half, n_envs,
        chunk_steps, max_chunks, tile_rows, max_episode_steps, interpret,
    )
    wins_a_opp, draws_a, eps_a = _stream_seat_rnn(
        env_params, params_a, params_b, k_a, half, n_envs,
        chunk_steps, max_chunks, tile_rows, max_episode_steps, interpret,
    )
    wins_top = eps_a - wins_a_opp - draws_a
    total = eps_b + eps_a
    # equal SEAT weighting — see pallas_win_rate_balanced
    rate_b = wins_b / max(eps_b, 1)
    rate_a = wins_top / max(eps_a, 1)
    return (
        (rate_b + rate_a) / 2,
        rate_b,
        rate_a,
        total,
    )
