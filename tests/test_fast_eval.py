"""Fused-kernel eval vs the while-loop match runner (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from pingpong_tpu.config import EnvConfig
from pingpong_tpu.env.pong import env_params_from_config
from pingpong_tpu.evaluation.fast_eval import pallas_win_rate
from pingpong_tpu.evaluation.match import QNET, PolicySpec, make_match_fn
from pingpong_tpu.models import qnet_init

ENVP = env_params_from_config(EnvConfig())


def test_win_rate_agrees_with_match_runner():
    pa = qnet_init(jax.random.PRNGKey(0))
    pb = qnet_init(jax.random.PRNGKey(1))

    wr_k, eps = pallas_win_rate(
        ENVP, pa, pb, jax.random.PRNGKey(2), min_episodes=300,
        n_envs=256, chunk_steps=256, tile_rows=256, interpret=True,
    )
    assert eps >= 300

    match = make_match_fn(ENVP, PolicySpec(QNET, None), PolicySpec(QNET, None),
                          max_steps=5000)
    stack = lambda p: jax.tree_util.tree_map(lambda x: x[None], p)
    n = 400
    keys = jax.random.split(jax.random.PRNGKey(3), n)
    idx = jnp.zeros((n,), jnp.int32)
    res = match(stack(pa), stack(pb), idx, idx, keys)
    wr_m = float(np.asarray(res.win_b).mean())

    # independent estimators of the same Bernoulli rate: agree within ~4
    # sigma of the coarser estimate
    sigma = (wr_m * (1 - wr_m) / min(eps, n)) ** 0.5
    assert abs(wr_k - wr_m) < 4 * sigma + 0.02, (wr_k, wr_m)


def test_win_rate_detects_strength_gap():
    # a net vs itself must be ~0.5; stronger-vs-weaker detectable is
    # covered by the demo; here check self-play symmetry
    p = qnet_init(jax.random.PRNGKey(7))
    wr, eps = pallas_win_rate(
        ENVP, p, p, jax.random.PRNGKey(8), min_episodes=300,
        n_envs=256, chunk_steps=256, tile_rows=256, interpret=True,
    )
    assert 0.3 < wr < 0.7


def test_balanced_win_rate_agrees_with_balanced_match_runner():
    """The fused side-balanced gate (two seat-swapped kernel packings)
    must agree with evaluation.match.eval_win_rate_balanced."""
    from pingpong_tpu.evaluation.fast_eval import pallas_win_rate_balanced
    from pingpong_tpu.evaluation.match import eval_win_rate_balanced

    pa = qnet_init(jax.random.PRNGKey(0))
    pb = qnet_init(jax.random.PRNGKey(1))

    wr_k, as_b, as_a, eps = pallas_win_rate_balanced(
        ENVP, pa, pb, jax.random.PRNGKey(2), min_episodes=400,
        n_envs=256, chunk_steps=256, tile_rows=256, interpret=True,
    )
    assert eps >= 400
    assert 0.0 <= wr_k <= 1.0
    assert 0.0 <= as_b <= 1.0 and 0.0 <= as_a <= 1.0

    match = make_match_fn(ENVP, PolicySpec(QNET, None), PolicySpec(QNET, None),
                          max_steps=5000)
    stack = lambda p: jax.tree_util.tree_map(lambda x: x[None], p)
    n = 400
    idx = jnp.zeros((n,), jnp.int32)
    wr_m, m_as_b, m_as_a = eval_win_rate_balanced(
        match, stack(pa), stack(pb), idx, idx, jax.random.PRNGKey(3), n,
    )
    sigma = max(wr_m * (1 - wr_m) / min(eps, n), 1e-4) ** 0.5
    assert abs(wr_k - wr_m) < 4 * sigma + 0.02, (wr_k, wr_m)
    # the per-seat estimates must rank the same way (the seat asymmetry
    # is large, tests/test_side_asymmetry.py)
    if abs(m_as_b - m_as_a) > 0.15:
        assert (as_b - as_a) * (m_as_b - m_as_a) > 0


def test_balanced_win_rate_self_play_symmetric():
    from pingpong_tpu.evaluation.fast_eval import pallas_win_rate_balanced

    p = qnet_init(jax.random.PRNGKey(7))
    wr, as_b, as_a, eps = pallas_win_rate_balanced(
        ENVP, p, p, jax.random.PRNGKey(8), min_episodes=400,
        n_envs=256, chunk_steps=256, tile_rows=256, interpret=True,
    )
    # identical nets: the aggregate must sit at parity (the two seats
    # individually may be far from 0.5 — the spin/mirror seat bias)
    assert 0.4 < wr < 0.6, (wr, as_b, as_a)
