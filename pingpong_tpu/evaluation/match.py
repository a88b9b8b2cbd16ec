"""Batched policy-vs-policy match execution on device.

The reference evaluates strength by playing episodes one at a time with
batch-1 forwards (``eval_vs_model``/``eval_vs_pool``,
``/root/reference/scripts/train_iterative.py:171-196``; tournament loops in
``tests/arena.py:294-319`` and ``tests/test_round_robin.py:310-318``).
Here N games run in lockstep as one jitted ``lax.while_loop``: every
iteration advances all unfinished games; finished games freeze. Thousands
of eval games complete in a handful of device dispatches.

Win determination matches the reference: the winner of a game is the side
whose score reached ``max_score`` (equivalently, ``rB > rA`` on the final
step, train_iterative.py:180). Games that somehow exceed ``max_steps``
count as a draw (score comparison decides; equal scores = draw), which the
round-robin reporting already models (test_round_robin.py draws).

Policies are *eval-mode* (mu weights, no exploration). A policy is either
a QNet param stack, an RNN param stack (hidden state carried inside the
loop), or the hardcoded ball-follower bot; each game indexes into its
side's stack, so mixed pools (A vs many opponents) run in one batch.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pingpong_tpu.env.pong import (
    EnvParams,
    observe_a,
    observe_b,
    reset,
    step,
)
from pingpong_tpu.models.policy import ball_follower_action
from pingpong_tpu.models.qnet import qnet_apply
from pingpong_tpu.models.qnet_rnn import (
    Hidden,
    init_hidden,
    qnet_rnn_step,
)

Array = jax.Array

# Policy kinds (static ints baked into the compiled match program)
QNET = 0
RNN = 1
BOT = 2


class PolicySpec(NamedTuple):
    """A batched side: ``kind`` is static; ``params`` is a stacked pytree
    (leading axis = stack slots) or None for the bot; per-game ``idx``
    selects the slot."""

    kind: int
    params: Optional[object]


class MatchResult(NamedTuple):
    score_a: Array    # (N,) i32
    score_b: Array    # (N,) i32
    win_a: Array      # (N,) bool
    win_b: Array      # (N,) bool
    draw: Array       # (N,) bool
    steps: Array      # (N,) i32


def _policy_actions(spec: PolicySpec, idx: Array, obs: Array, hidden, tol: float):
    """Greedy eval actions for one side. Returns (actions, new_hidden)."""
    if spec.kind == BOT:
        return ball_follower_action(obs, tolerance=tol), hidden
    if spec.kind == QNET:
        q_all = jax.vmap(lambda p: qnet_apply(p, obs))(spec.params)  # (K, N, 3)
        act_all = jnp.argmax(q_all, axis=-1).astype(jnp.int32)
        return jnp.take_along_axis(act_all, idx[None, :], axis=0)[0], hidden
    if spec.kind == RNN:
        # hidden: (N, L, H) per game; select per-game params slot, run the
        # cell per game via vmap over (params-slot gather is avoided by
        # computing all slots batched, like QNET, then gathering).
        def one_member(p):
            h = Hidden(
                h=jnp.moveaxis(hidden.h, 0, 1), c=jnp.moveaxis(hidden.c, 0, 1)
            )  # (L, N, H)
            q, new_h = qnet_rnn_step(p, obs, h)
            return q, new_h

        q_all, h_all = jax.vmap(one_member)(spec.params)  # (K, N, 3), (K, L, N, H)
        act_all = jnp.argmax(q_all, axis=-1).astype(jnp.int32)
        act = jnp.take_along_axis(act_all, idx[None, :], axis=0)[0]
        # gather each game's hidden from its member slot
        sel = idx[None, :, None]  # broadcast over (K, N, H) after moveaxis
        new_h = jnp.take_along_axis(
            jnp.moveaxis(h_all.h, 2, 1), idx[None, :, None, None], axis=0
        )[0]  # (N, L, H)
        new_c = jnp.take_along_axis(
            jnp.moveaxis(h_all.c, 2, 1), idx[None, :, None, None], axis=0
        )[0]
        return act, Hidden(h=new_h, c=new_c)
    raise ValueError(f"unknown policy kind {spec.kind}")


def _init_side_hidden(spec: PolicySpec, n_games: int):
    if spec.kind != RNN:
        return None
    one = jax.tree_util.tree_map(lambda x: x[0], spec.params)
    hid = init_hidden(one, (n_games,))  # (L, N, H)
    return Hidden(h=jnp.moveaxis(hid.h, 0, 1), c=jnp.moveaxis(hid.c, 0, 1))


def make_match_fn(
    env_params: EnvParams,
    spec_a: PolicySpec,
    spec_b: PolicySpec,
    max_steps: int = 20_000,
    bot_tolerance: float = 0.01,
):
    """Build a jitted ``(params_a_stack, params_b_stack, idx_a, idx_b, keys)
    -> MatchResult`` runner. Policy kinds and max_steps are static."""

    def run(params_a, params_b, idx_a: Array, idx_b: Array, keys: Array) -> MatchResult:
        n_games = keys.shape[0]
        sa = PolicySpec(spec_a.kind, params_a)
        sb = PolicySpec(spec_b.kind, params_b)
        env_state = jax.vmap(reset, in_axes=(None, 0))(env_params, keys)
        hid_a = _init_side_hidden(sa, n_games)
        hid_b = _init_side_hidden(sb, n_games)

        finished = jnp.zeros((n_games,), jnp.bool_)
        win_a = jnp.zeros((n_games,), jnp.bool_)
        win_b = jnp.zeros((n_games,), jnp.bool_)
        end_steps = jnp.zeros((n_games,), jnp.int32)
        t = jnp.int32(0)

        carry = (env_state, hid_a, hid_b, finished, win_a, win_b, end_steps, t)

        def cond(c):
            _, _, _, fin, _, _, _, tt = c
            return (~jnp.all(fin)) & (tt < max_steps)

        def body(c):
            env_state, hid_a, hid_b, fin, wa, wb, es, tt = c
            obs_a = observe_a(env_state)
            obs_b = observe_b(env_state)
            act_a, hid_a_new = _policy_actions(sa, idx_a, obs_a, hid_a, bot_tolerance)
            act_b, hid_b_new = _policy_actions(sb, idx_b, obs_b, hid_b, bot_tolerance)
            new_state, out = jax.vmap(step, in_axes=(None, 0, 0, 0))(
                env_params, env_state, act_a, act_b
            )
            just_done = out.done & ~fin
            wa = wa | (just_done & (out.reward_a > out.reward_b))
            wb = wb | (just_done & (out.reward_b > out.reward_a))
            es = jnp.where(just_done, tt + 1, es)
            # freeze finished games
            env_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    fin.reshape((-1,) + (1,) * (new.ndim - 1)), old, new
                ),
                new_state,
                env_state,
            )
            if hid_a is not None:
                mask = fin[:, None, None]
                hid_a = Hidden(
                    h=jnp.where(mask, hid_a.h, hid_a_new.h),
                    c=jnp.where(mask, hid_a.c, hid_a_new.c),
                )
            if hid_b is not None:
                mask = fin[:, None, None]
                hid_b = Hidden(
                    h=jnp.where(mask, hid_b.h, hid_b_new.h),
                    c=jnp.where(mask, hid_b.c, hid_b_new.c),
                )
            fin = fin | out.done
            return (env_state, hid_a, hid_b, fin, wa, wb, es, tt + 1)

        (env_state, _, _, finished, win_a, win_b, end_steps, t) = jax.lax.while_loop(
            cond, body, carry
        )
        # unfinished games: decide by score (draw if equal)
        unfinished = ~finished
        win_a = win_a | (unfinished & (env_state.score_a > env_state.score_b))
        win_b = win_b | (unfinished & (env_state.score_b > env_state.score_a))
        end_steps = jnp.where(unfinished, t, end_steps)
        return MatchResult(
            score_a=env_state.score_a,
            score_b=env_state.score_b,
            win_a=win_a,
            win_b=win_b,
            draw=~(win_a | win_b),
            steps=end_steps,
        )

    return jax.jit(run)


def eval_win_rate(
    match_fn,
    params_a_stack,
    params_b_stack,
    idx_a: Array,
    idx_b: Array,
    key: Array,
    n_games: int,
) -> Tuple[float, MatchResult]:
    """Host helper: play ``n_games`` and return B's win rate (the gate
    metric of train_iterative.py:171-196: wins / episodes)."""
    keys = jax.random.split(key, n_games)
    result = match_fn(params_a_stack, params_b_stack, idx_a, idx_b, keys)
    return float(jnp.mean(result.win_b.astype(jnp.float32))), result


def eval_win_rate_balanced(
    match_fn,
    opp_stack,
    learner_stack,
    idx_opp: Array,
    idx_learner: Array,
    key: Array,
    n_games: int,
) -> Tuple[float, float, float]:
    """Side-balanced gate eval (no reference equivalent — the reference
    always seats the candidate as B, the bottom seat the spin/mirror quirk
    favors, /root/reference/envs/my_pong_env_2p.py:235-245; see
    tests/test_side_asymmetry.py). Half the games seat the learner as B,
    half as A; a win is a win from the learner's perspective either way.

    Requires a ``match_fn`` built with the SAME policy kind on both seats.
    Returns ``(win_rate_total, win_rate_as_b, win_rate_as_a)``.
    """
    n_b = n_games // 2
    n_a = n_games - n_b
    k_b, k_a = jax.random.split(key)
    res_b = match_fn(opp_stack, learner_stack, idx_opp[:n_b],
                     idx_learner[:n_b], jax.random.split(k_b, n_b))
    res_a = match_fn(learner_stack, opp_stack, idx_learner[:n_a],
                     idx_opp[:n_a], jax.random.split(k_a, n_a))
    wins_as_b = float(jnp.sum(res_b.win_b.astype(jnp.float32)))
    wins_as_a = float(jnp.sum(res_a.win_a.astype(jnp.float32)))
    return (
        (wins_as_b + wins_as_a) / n_games,
        wins_as_b / max(n_b, 1),
        wins_as_a / max(n_a, 1),
    )
