"""Locks in a reference parity quirk: spin makes the sides asymmetric —
and verifies the framework's side-balanced evaluation corrects for it.

The dual-perspective observation mirrors y and vy for player A but passes
``spin`` through unchanged (exactly as the reference's ``_get_obs_for_A``,
/root/reference/envs/my_pong_env_2p.py:235-245). Physically, a y-mirror
flips angular velocity, so the mirrored player perceives spin with the
wrong sign and the Magnus drift curves opposite to what its policy
expects. Measured effect: an identical net playing the mirrored top side
loses ~80-90% of games to itself on the bottom when spin is enabled, and
plays ~50/50 with spin disabled.

Consequences (shared with the reference, by design):
* "win rate vs A" promotion gates measure the learner on the FAVORED
  side — thresholds are effectively softer than their nominal value;
* tournament p1 (top) seats carry a handicap under spin.

The framework keeps single-seat gates as the reference-parity default and
offers ``swap_sides_eval`` / ``--swap-sides`` (N/2 games per seating) as
the corrected mode; the balanced self-play rate of an identical policy is
0.5 by construction, which the test verifies.

The spin-exploiting policy is a COMMITTED FIXTURE
(``tests/fixtures/rnn_agent_4``, imported once from the reference's
``checkpoints_rnn/rnn_agent_4.pth`` via ``tools/import_torch``), so this
quirk stays guarded in environments without the reference mount.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from pingpong_tpu.config import EnvConfig
from pingpong_tpu.env.pong import env_params_from_config
from pingpong_tpu.evaluation.match import (
    RNN,
    PolicySpec,
    eval_win_rate_balanced,
    make_match_fn,
)

FIXTURE = Path(__file__).parent / "fixtures" / "rnn_agent_4"

SPIN_CFG = EnvConfig(
    enable_spin=True, magnus_factor=0.025, spin_range=(-5, 5),
    restitution=1.0, friction=0.6, paddle_speed=0.03,
    ball_speed_range=(0.03, 0.05), speed_scale_every=1,
    speed_increment=0.1,
)


def _trained_params():
    from pingpong_tpu.selfplay.pool import load_params_any

    return load_params_any(FIXTURE)


def _match(cfg):
    return make_match_fn(
        env_params_from_config(cfg), PolicySpec(RNN, None),
        PolicySpec(RNN, None), max_steps=4000,
    )


def _self_play_split(cfg, params, n=150):
    match = _match(cfg)
    stack = jax.tree_util.tree_map(lambda x: x[None], params)
    keys = jax.random.split(jax.random.PRNGKey(1), n)
    idx = jnp.zeros((n,), jnp.int32)
    res = match(stack, stack, idx, idx, keys)
    return float(np.asarray(res.win_a).mean()), float(np.asarray(res.win_b).mean())


def test_spin_biases_against_the_mirrored_side():
    p = _trained_params()
    wa, wb = _self_play_split(SPIN_CFG, p)
    # identical trained policies: the bottom (unmirrored) side dominates
    assert wb > wa + 0.15, (wa, wb)


def test_no_spin_is_roughly_fair():
    p = _trained_params()
    wa, wb = _self_play_split(EnvConfig(
        enable_spin=False, restitution=1.0, friction=0.6, paddle_speed=0.03,
        ball_speed_range=(0.03, 0.05), speed_scale_every=1,
        speed_increment=0.1,
    ), p)
    assert abs(wa - wb) < 0.3, (wa, wb)


def test_swap_sides_eval_corrects_the_bias():
    """Side-balanced eval of an identical policy against itself is 0.5 by
    construction — and quantifies the correction vs the single-seat gate."""
    p = _trained_params()
    match = _match(SPIN_CFG)
    stack = jax.tree_util.tree_map(lambda x: x[None], p)
    n = 150
    idx = jnp.zeros((n,), jnp.int32)
    total, as_b, as_a = eval_win_rate_balanced(
        match, stack, stack, idx, idx, jax.random.PRNGKey(2), n,
    )
    # each half reproduces the per-seat split...
    assert as_b > as_a + 0.15, (as_b, as_a)
    # ...and the balanced aggregate is fair up to draws (draws count as
    # losses for both seats, so total <= 0.5 exactly)
    assert total <= 0.5 + 1e-6
    assert total > 0.4, total
