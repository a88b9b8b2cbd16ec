"""Pallas TPU kernel: fused multi-step Pong rollout resident in VMEM.

The XLA path (``jit(scan(vmap(step)))``) re-reads and re-writes the whole
batched env state from HBM every scan iteration — at ~48 bytes/env/step
that makes a billion-step/s rollout HBM-bound. This kernel keeps a tile of
envs' state in VMEM for all ``steps`` iterations: per grid program, load
the tile once, loop the *same pure* :func:`pingpong_tpu.env.pong.step`
function (its jnp ops lower through Mosaic unchanged — one env
implementation, two compilation paths), and write the final state plus
per-env reward/score accumulators back once.

Auto-reset serves use the Pallas per-core PRNG (``pltpu.prng_seed`` /
``prng_random_bits``) seeded from a user seed + program id; the serve
distribution matches :func:`pingpong_tpu.env.pong._serve` (same intervals
and ranges), but the bitstream is backend-specific — the framework's
reproducibility contract is per-backend (see env/pong.py docstring).

Both players act with the hardcoded ball-follower policy in-kernel (the
physics-saturating benchmark workload; paddles always engaged, maximal
collision/spin activity). This is the headline-bench kernel; the
actor-learner keeps the XLA path, where policy matmuls dominate anyway.

State layout: each scalar leaf of the batched ``EnvState`` is reshaped to
``(B/128, 128)`` so tiles are native ``(8k, 128)`` VPU shapes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pingpong_tpu.env.pong import EnvParams, EnvState, step

LANE = 128
SUBLANE_TILE = 64          # rows of 128 lanes per grid program (8192 envs)


def _static_params(p: EnvParams) -> EnvParams:
    """Bake EnvParams leaves to Python scalars: Pallas kernels cannot
    capture traced constants; static values compile straight into Mosaic."""
    import numpy as np

    vals = {}
    for name, v in p._asdict().items():
        arr = np.asarray(v)
        if name == "angle_intervals":
            vals[name] = (
                (float(arr[0][0]), float(arr[0][1])),
                (float(arr[1][0]), float(arr[1][1])),
            )
        elif arr.dtype.kind in "iu":
            vals[name] = int(arr)
        else:
            vals[name] = float(arr)
    return EnvParams(**vals)


def _tpu_uniform(shape, lo, hi, _seed, _ctr, _k):
    """U[lo, hi) from the per-core hardware PRNG (stateful, seeded once)."""
    bits = pltpu.prng_random_bits(shape)
    u01 = bits.astype(jnp.float32) * (1.0 / 4294967296.0) + 0.5
    return lo + u01 * (hi - lo)


def _hash_uniform(shape, lo, hi, seed, ctr, k):
    """Counter-based xorshift fallback (pure jnp: runs under interpret
    mode and any backend; used when the Mosaic PRNG is unavailable)."""
    row = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    col = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = (
        jnp.uint32(seed)
        + (ctr.astype(jnp.uint32) * jnp.uint32(2654435761))
        + (jnp.uint32(k) * jnp.uint32(0x9E3779B9))
        + row * jnp.uint32(40503)
        + col * jnp.uint32(69069)
    )
    for _ in range(2):
        x = x ^ (x << jnp.uint32(13))
        x = x ^ (x >> jnp.uint32(17))
        x = x ^ (x << jnp.uint32(5))
    u01 = x.astype(jnp.float32) * (1.0 / 4294967296.0)
    return lo + u01 * (hi - lo)


def _serve_fields(params: EnvParams, shape, uniform, seed, ctr):
    """Random serve (vx, vy, spin) matching env/pong.py:_serve."""
    speed = uniform(shape, params.speed_min, params.speed_max, seed, ctr, 1)
    pick = uniform(shape, 0.0, 1.0, seed, ctr, 2) >= 0.5
    u = uniform(shape, 0.0, 1.0, seed, ctr, 3)
    lo0, hi0 = params.angle_intervals[0][0], params.angle_intervals[0][1]
    lo1, hi1 = params.angle_intervals[1][0], params.angle_intervals[1][1]
    ang = jnp.where(pick, lo1 + u * (hi1 - lo1), lo0 + u * (hi0 - lo0))
    ang = ang * (jnp.pi / 180.0)
    spin = uniform(shape, params.spin_min, params.spin_max, seed, ctr, 4)
    return speed * jnp.cos(ang), speed * jnp.sin(ang), spin


def _bot_actions(ball_x, paddle_x, tol):
    return jnp.where(
        ball_x < paddle_x - tol,
        jnp.int32(0),
        jnp.where(ball_x > paddle_x + tol, jnp.int32(2), jnp.int32(1)),
    )


_FIELDS = [
    "ball_x", "ball_y", "ball_vx", "ball_vy", "spin",
    "top_paddle_x", "bottom_paddle_x",
]
_IFIELDS = ["score_a", "score_b", "bounce_count", "t"]


def _rollout_kernel(params: EnvParams, steps: int, bot_tol: float,
                    use_tpu_prng: bool, seed_ref, *refs):
    n_in = len(_FIELDS) + len(_IFIELDS)
    in_refs = refs[:n_in]
    out_refs = refs[n_in:n_in * 2]
    reward_ref = refs[-1]

    if use_tpu_prng:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        uniform = _tpu_uniform
        seed_mix = jnp.uint32(0)
    else:
        uniform = _hash_uniform
        seed_mix = (
            seed_ref[0].astype(jnp.uint32)
            ^ (pl.program_id(0).astype(jnp.uint32) * jnp.uint32(747796405))
        )

    f = {name: r[:] for name, r in zip(_FIELDS + _IFIELDS, in_refs)}
    shape = f["ball_x"].shape
    reward_acc = jnp.zeros(shape, jnp.float32)

    def body(i, carry):
        (bx, by, vx, vy, sp, tx, bot_x, sa, sb, bc, t, racc) = carry
        state = EnvState(
            ball_x=bx, ball_y=by, ball_vx=vx, ball_vy=vy, spin=sp,
            top_paddle_x=tx, bottom_paddle_x=bot_x,
            score_a=sa, score_b=sb, bounce_count=bc, t=t,
            done=jnp.zeros(shape, jnp.bool_),
        )
        act_a = _bot_actions(bx, tx, bot_tol)
        act_b = _bot_actions(bx, bot_x, bot_tol)
        new, out = step(params, state, act_a, act_b)
        # masked auto-reset with in-kernel serve randomness
        svx, svy, ssp = _serve_fields(params, shape, uniform, seed_mix, i)
        d = out.done
        return (
            jnp.where(d, 0.5, new.ball_x),
            jnp.where(d, 0.5, new.ball_y),
            jnp.where(d, svx, new.ball_vx),
            jnp.where(d, svy, new.ball_vy),
            jnp.where(d, ssp, new.spin),
            jnp.where(d, 0.5, new.top_paddle_x),
            jnp.where(d, 0.5, new.bottom_paddle_x),
            jnp.where(d, 0, new.score_a),
            jnp.where(d, 0, new.score_b),
            jnp.where(d, 0, new.bounce_count),
            jnp.where(d, 0, new.t),
            racc + out.reward_b,
        )

    init = (
        f["ball_x"], f["ball_y"], f["ball_vx"], f["ball_vy"], f["spin"],
        f["top_paddle_x"], f["bottom_paddle_x"],
        f["score_a"], f["score_b"], f["bounce_count"], f["t"],
        reward_acc,
    )
    final = jax.lax.fori_loop(0, steps, body, init)
    for r, val in zip(out_refs, final[:-1]):
        r[:] = val
    reward_ref[:] = final[-1]


def pallas_rollout(
    params: EnvParams,
    state: EnvState,
    steps: int,
    seed: int,
    bot_tolerance: float = 0.02,
    tile_rows: int = SUBLANE_TILE,
    interpret: bool = False,
) -> Tuple[EnvState, jax.Array]:
    """Run ``steps`` fused env steps on a batched state (B % (tile*128)==0).

    Returns (final state, per-env summed reward_b). ``done`` is recomputed
    as all-False (episodes auto-reset in-kernel).
    """
    params = _static_params(params)
    B = state.ball_x.shape[0]
    rows = B // LANE
    if rows % tile_rows != 0 or B % LANE != 0:
        raise ValueError(f"batch {B} must be a multiple of {tile_rows * LANE}")
    grid = (rows // tile_rows,)

    def shape2d(x):
        return x.reshape(rows, LANE)

    inputs = [shape2d(getattr(state, n)) for n in _FIELDS + _IFIELDS]
    f32 = jax.ShapeDtypeStruct((rows, LANE), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows, LANE), jnp.int32)
    out_shapes = [f32] * len(_FIELDS) + [i32] * len(_IFIELDS) + [f32]

    block = pl.BlockSpec(
        (tile_rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _rollout_kernel, params, steps, bot_tolerance, not interpret
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [block] * len(inputs),
        out_specs=[block] * len(out_shapes),
        out_shape=out_shapes,
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), *inputs)

    leaves = [o.reshape(B) for o in outs[:-1]]
    vals = dict(zip(_FIELDS + _IFIELDS, leaves))
    new_state = EnvState(
        done=jnp.zeros((B,), jnp.bool_), **vals
    )
    return new_state, outs[-1].reshape(B)
