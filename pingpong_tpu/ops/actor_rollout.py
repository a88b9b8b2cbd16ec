"""Pallas TPU kernel: fused DQN actor rollout.

One kernel program per env tile runs the ENTIRE rollout chunk of the DQN
trainer (`train/dqn.py::_rollout`): per step, the NoisyNet + epsilon-greedy
learner action, the bound frozen-opponent action (stacked pool members,
mu-weights greedy), the masked env transition with in-kernel auto-reset
serves, transition emission, and episode accounting — with env state and
every network's weights resident in VMEM. The XLA scan path launches ~50
small kernels per env step; this runs the whole chunk in one.

TPU status: both modes compile through Mosaic and run on real v5e
hardware. The **no-transitions mode** (``emit_transitions=False`` —
evaluation streams, policy-rollout benchmarking) uses a single-program
fori loop per env tile. The **training mode** additionally emits per-step
transitions via the time-as-grid-dimension form (grid ``(env_tiles,
steps/8)``, 8 statically-unrolled env steps per cell, ``(tile, 8, 8)``
transition slabs — Mosaic's block rules forbid per-step dynamic sublane
writes, which is why the slab form exists). At current tile sizes the
training-mode kernel (~23M env-steps/s incl. transition emission,
tile_rows=128) does not yet beat the tuned XLA rollout (~37M rollout-only)
— the per-cell state read-back and slab DMA overhead dominates; ROADMAP
item: larger tiles via bf16 slabs / more steps per cell. It remains
opt-in (``dqn.use_pallas_rollout``).

Layout (Mosaic-friendly): envs are ROWS. The float state lives in one
``(tile_envs, 16)`` matrix ``F`` whose first 8 columns ARE player B's
padded observation ``(x, y, vx, vy, bottom, top, spin, 0)`` — so the
learner's matmul input is a plain slice. Player A's mirrored view is a
LINEAR map of B's view (``x, 1-y, vx, -vy, top, bottom, spin``), so the
mirror is folded into each opponent's first-layer weights at pack time
(``W1' = M W1``, ``b1' = b1 + W1[1, :]``) and costs nothing in-kernel.
Integer state (scores, bounce, t, opp binding) lives in ``(tile_envs, 8)``.

Exactness notes (VERIFIED against the XLA path in tests with randomness
disabled):

* action selection needs only the advantage head: ``argmax(V + A - mean A)
  == argmax(A)`` since V shifts all actions equally;
* learner noise is factorized Gaussian per step exactly as in
  ``models/noisy.py`` (``f(x) = sign sqrt|x|`` of Box-Muller normals) but
  drawn from the kernel PRNG — the reproducibility contract is per
  rollout backend;
* epsilon is held constant within a rollout chunk and decayed once per
  chunk outside the kernel (documented fidelity difference of the fast
  path; both saturate to ``min_epsilon`` within one chunk in practice).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pingpong_tpu.env.pong import EnvParams, EnvState, step
from pingpong_tpu.models.qnet import QNetParams
from pingpong_tpu.ops.pong_kernel import (
    _hash_uniform,
    _serve_fields,
    _static_params,
    _tpu_uniform,
)

NEG_BIG = -1e30

# F columns (first 8 = padded obs_b)
FX, FY, FVX, FVY, FBOT, FTOP, FSPIN, FPAD, FRET = range(9)
F_COLS = 16
# I columns
ISA, ISB, IBOUNCE, IT, IOPP = range(5)
I_COLS = 8

_MIRROR = np.zeros((8, 8), np.float32)
for _i, _j, _v in [(0, 0, 1), (1, 1, -1), (2, 2, 1), (3, 3, -1),
                   (5, 4, 1), (4, 5, 1), (6, 6, 1)]:
    _MIRROR[_i, _j] = _v


class PackedQNet(NamedTuple):
    """Lane-padded advantage-path weights (optionally mirror-folded)."""

    w1: jax.Array      # (..., 8, 64)
    b1: jax.Array      # (..., 1, 64)
    w2: jax.Array      # (..., 64, 64)
    b2: jax.Array      # (..., 1, 64)
    wa_mu: jax.Array   # (..., 64, 8)  3 real action columns
    ba_mu: jax.Array   # (..., 1, 8)   padding columns biased to -inf
    wa_sigma: jax.Array
    ba_sigma: jax.Array


def pack_qnet(params: QNetParams, mirror: bool = False) -> PackedQNet:
    """Pad one QNet (or a stacked pool; leading axes preserved).

    ``mirror=True`` folds player A's view transform into (w1, b1): the net
    then consumes player B's observation directly."""

    def pad(x, rows=None, cols=None, fill=0.0):
        pads = [(0, 0)] * x.ndim
        if rows is not None:
            pads[-2] = (0, rows - x.shape[-2])
        if cols is not None:
            pads[-1] = (0, cols - x.shape[-1])
        return jnp.pad(x, pads, constant_values=fill)

    def as2d(b):
        return b[..., None, :]

    w1 = pad(params.feat1.w, rows=8)            # (..., 8, 64)
    b1 = as2d(params.feat1.b)                   # (..., 1, 64)
    if mirror:
        m = jnp.asarray(_MIRROR)
        b1 = b1 + w1[..., 1:2, :]               # constant term: +1 * row y
        w1 = jnp.einsum("ij,...jk->...ik", m, w1)
    ba = pad(as2d(params.fc_a.b_mu), cols=8, fill=NEG_BIG)
    return PackedQNet(
        w1=w1,
        b1=b1,
        w2=params.feat2.w,
        b2=as2d(params.feat2.b),
        wa_mu=pad(params.fc_a.w_mu, cols=8),
        ba_mu=ba,
        wa_sigma=pad(params.fc_a.w_sigma, cols=8),
        ba_sigma=pad(as2d(params.fc_a.b_sigma), cols=8),
    )


def _normal(shape, uniform, seed, ctr, k):
    u1 = uniform(shape, 1e-7, 1.0, seed, ctr, k)
    u2 = uniform(shape, 0.0, 1.0, seed, ctr, k + 1)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * np.pi * u2)


def _scale_noise(x):
    return jnp.sign(x) * jnp.sqrt(jnp.abs(x))


def _advantage(obs8, w1, b1, w2, b2, wa, ba):
    h = jnp.maximum(
        jnp.dot(obs8, w1, preferred_element_type=jnp.float32) + b1, 0.0
    )
    h = jnp.maximum(
        jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2, 0.0
    )
    return jnp.dot(h, wa, preferred_element_type=jnp.float32) + ba



def _one_step(params, cfg, n_members, uniform, seed_mix, epsilon, pool_size,
              lw, opp_refs, F, I, ctr):
    """One env step on the (tile, cols) state matrices. Returns
    (F_new, I_new, srow, emit) where emit = (obs8, next8, act_b, reward,
    done_i32)."""
    n = F.shape[0]
    col_shape = (n, 1)

    def col_f(M, c):
        return M[:, c:c + 1]

    obs8 = F[:, 0:8]

    # ---- opponent action (mirror folded into weights)
    act_a = jnp.zeros(col_shape, jnp.int32)
    opp_idx = I[:, IOPP:IOPP + 1]
    for k in range(n_members):
        ow = [r[k] for r in opp_refs]
        adv_k = _advantage(obs8, ow[0], ow[1], ow[2], ow[3], ow[4], ow[5])
        a_k = jnp.argmax(adv_k, axis=-1, keepdims=True).astype(jnp.int32)
        act_a = jnp.where(opp_idx == k, a_k, act_a)

    # ---- learner action: factorized noise + epsilon-greedy
    eps_in = _scale_noise(_normal((64, 1), uniform, seed_mix, ctr, 1))
    eps_out = _scale_noise(_normal((1, 8), uniform, seed_mix, ctr, 3))
    wa_eff = lw[4] + lw[6] * jnp.dot(
        eps_in, eps_out, preferred_element_type=jnp.float32
    )
    ba_eff = lw[5] + lw[7] * eps_out
    ba_eff = jnp.where(ba_eff < NEG_BIG * 0.5, NEG_BIG, ba_eff)
    adv_b = _advantage(obs8, lw[0], lw[1], lw[2], lw[3], wa_eff, ba_eff)
    greedy_b = jnp.argmax(adv_b, axis=-1, keepdims=True).astype(jnp.int32)
    u_expl = uniform(col_shape, 0.0, 1.0, seed_mix, ctr, 5)
    rand_a = uniform(col_shape, 0.0, 3.0, seed_mix, ctr, 6).astype(jnp.int32)
    act_b = jnp.where(u_expl < epsilon, jnp.clip(rand_a, 0, 2), greedy_b)

    # ---- env transition via the shared pure step
    state = EnvState(
        ball_x=col_f(F, FX), ball_y=col_f(F, FY),
        ball_vx=col_f(F, FVX), ball_vy=col_f(F, FVY),
        spin=col_f(F, FSPIN),
        top_paddle_x=col_f(F, FTOP), bottom_paddle_x=col_f(F, FBOT),
        score_a=I[:, ISA:ISA + 1], score_b=I[:, ISB:ISB + 1],
        bounce_count=I[:, IBOUNCE:IBOUNCE + 1], t=I[:, IT:IT + 1],
        done=jnp.zeros(col_shape, jnp.bool_),
    )
    new, out = step(params, state, act_a, act_b)
    done = out.done | (new.t >= cfg["max_episode_steps"]) \
        if cfg["max_episode_steps"] else out.done

    next8 = jnp.concatenate(
        [new.ball_x, new.ball_y, new.ball_vx, new.ball_vy,
         new.bottom_paddle_x, new.top_paddle_x, new.spin,
         jnp.zeros(col_shape, jnp.float32)], axis=1,
    )

    # ---- accounting
    ep_ret = col_f(F, FRET) + out.reward_b
    win = (ep_ret > 0.0) & done
    vs_pool = opp_idx > 0
    d_f = done.astype(jnp.float32)
    w_f = win.astype(jnp.float32)
    p_f = vs_pool.astype(jnp.float32)
    srow = jnp.concatenate(
        [d_f * (1 - p_f), w_f * (1 - p_f), d_f * p_f, w_f * p_f,
         jnp.where(done, ep_ret, 0.0),
         jnp.zeros((n, 3), jnp.float32)], axis=1,
    )

    # ---- auto-reset + opponent re-bind
    svx, svy, ssp = _serve_fields(params, col_shape, uniform, seed_mix,
                                  ctr + 8)
    use_pool = (
        uniform(col_shape, 0.0, 1.0, seed_mix, ctr, 13) < cfg["pool_ratio"]
    ) & (pool_size > 0)
    u_pick = uniform(col_shape, 0.0, 1.0, seed_mix, ctr, 14)
    pick = jnp.clip(
        (u_pick * pool_size.astype(jnp.float32)).astype(jnp.int32),
        0, jnp.maximum(pool_size - 1, 0),
    )
    new_opp = jnp.where(use_pool, pick + 1, 0)

    f_cols = [
        jnp.where(done, 0.5, new.ball_x),
        jnp.where(done, 0.5, new.ball_y),
        jnp.where(done, svx, new.ball_vx),
        jnp.where(done, svy, new.ball_vy),
        jnp.where(done, 0.5, new.bottom_paddle_x),
        jnp.where(done, 0.5, new.top_paddle_x),
        jnp.where(done, ssp, new.spin),
        jnp.zeros(col_shape, jnp.float32),
        jnp.where(done, 0.0, ep_ret),
    ]
    F_new = jnp.concatenate(
        f_cols + [jnp.zeros((n, F_COLS - len(f_cols)), jnp.float32)],
        axis=1,
    )
    zero_i = jnp.zeros(col_shape, jnp.int32)
    i_cols = [
        jnp.where(done, zero_i, new.score_a),
        jnp.where(done, zero_i, new.score_b),
        jnp.where(done, zero_i, new.bounce_count),
        jnp.where(done, zero_i, new.t),
        jnp.where(done, new_opp, opp_idx),
    ]
    I_new = jnp.concatenate(
        i_cols + [jnp.zeros((n, I_COLS - len(i_cols)), jnp.int32)],
        axis=1,
    )
    emit = (obs8, next8, act_b, out.reward_b, done.astype(jnp.int32))
    return F_new, I_new, srow, emit


def _actor_kernel_grid(params: EnvParams, cfg, n_members: int,
                       use_tpu_prng: bool, scalar_ref, *refs):
    """Time-as-grid-dimension variant: grid (env_tiles, steps // 8), with
    8 env steps statically unrolled per grid cell. The state/stats blocks
    are revisited across the t axis (Mosaic keeps them VMEM-resident);
    every transition block is a (tile, 8, 8) slab written with static row
    indices — which is what lets the training-mode kernel (with
    transition emission) satisfy Mosaic's block/tiling rules."""
    i = 0
    f_ref = refs[i]; i += 1
    i_ref = refs[i]; i += 1
    learner_refs = refs[i:i + 8]; i += 8
    opp_refs = refs[i:i + 8]; i += 8
    out_f_ref = refs[i]; i += 1
    out_i_ref = refs[i]; i += 1
    tr_obs_ref = refs[i]; i += 1     # block (tile, 8, 8) at (i, tb, 0)
    tr_next_ref = refs[i]; i += 1
    tr_act_ref = refs[i]; i += 1     # same slab layout, value in lane 0
    tr_rew_ref = refs[i]; i += 1
    tr_done_ref = refs[i]; i += 1
    stats_ref = refs[i]; i += 1

    tb = pl.program_id(1)
    if use_tpu_prng:
        # hardware seed takes at most 2 values: fold (tile, t-block) into one
        pltpu.prng_seed(
            scalar_ref[0], pl.program_id(0) * pl.num_programs(1) + tb
        )
        uniform = _tpu_uniform
        seed_mix = jnp.uint32(0)
    else:
        uniform = _hash_uniform
        seed_mix = (
            scalar_ref[0].astype(jnp.uint32)
            ^ (pl.program_id(0).astype(jnp.uint32) * jnp.uint32(747796405))
            ^ (tb.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B))
        )
    epsilon = scalar_ref[1].astype(jnp.float32) * 1e-6
    pool_size = scalar_ref[2]

    @pl.when(tb == 0)
    def _():
        out_f_ref[:] = f_ref[:]
        out_i_ref[:] = i_ref[:]
        stats_ref[:] = jnp.zeros_like(stats_ref)

    lw = [r[:] for r in learner_refs]
    F = out_f_ref[:]
    I = out_i_ref[:]
    stats = stats_ref[:]
    n = F.shape[0]
    pad7f = jnp.zeros((n, 7), jnp.float32)
    pad7i = jnp.zeros((n, 7), jnp.int32)
    for j in range(cfg["steps_per_cell"]):
        F, I, srow, emit = _one_step(
            params, cfg, n_members, uniform, seed_mix, epsilon, pool_size,
            lw, opp_refs, F, I, jnp.int32(j * 16),
        )
        obs8, next8, act_b, reward_b, done_i = emit
        stats = stats + srow
        tr_obs_ref[:, j, :] = obs8
        tr_next_ref[:, j, :] = next8
        tr_act_ref[:, j, :] = jnp.concatenate([act_b, pad7i], axis=1)
        tr_rew_ref[:, j, :] = jnp.concatenate([reward_b, pad7f], axis=1)
        tr_done_ref[:, j, :] = jnp.concatenate([done_i, pad7i], axis=1)
    out_f_ref[:] = F
    out_i_ref[:] = I
    stats_ref[:] = stats


def _actor_kernel(params: EnvParams, cfg, n_members: int, use_tpu_prng: bool,
                  scalar_ref, *refs):
    steps = cfg["steps"]
    i = 0
    f_ref = refs[i]; i += 1          # (tile, F_COLS)
    i_ref = refs[i]; i += 1          # (tile, I_COLS)
    learner_refs = refs[i:i + 8]; i += 8
    opp_refs = refs[i:i + 8]; i += 8
    out_f_ref = refs[i]; i += 1
    out_i_ref = refs[i]; i += 1
    if cfg["emit_transitions"]:
        tr_obs_ref = refs[i]; i += 1     # (tile, steps, 8)
        tr_next_ref = refs[i]; i += 1    # (tile, steps, 8)
        tr_act_ref = refs[i]; i += 1     # (tile, steps)
        tr_rew_ref = refs[i]; i += 1
        tr_done_ref = refs[i]; i += 1
    stats_ref = refs[i]; i += 1      # (tile, 8) f32 accumulators

    if use_tpu_prng:
        pltpu.prng_seed(scalar_ref[0], pl.program_id(0))
        uniform = _tpu_uniform
        seed_mix = jnp.uint32(0)
    else:
        uniform = _hash_uniform
        seed_mix = (
            scalar_ref[0].astype(jnp.uint32)
            ^ (pl.program_id(0).astype(jnp.uint32) * jnp.uint32(747796405))
        )
    epsilon = scalar_ref[1].astype(jnp.float32) * 1e-6
    pool_size = scalar_ref[2]
    lw = [r[:] for r in learner_refs]

    def body(t, carry):
        F, I, stats = carry
        F2, I2, srow, emit = _one_step(
            params, cfg, n_members, uniform, seed_mix, epsilon, pool_size,
            lw, opp_refs, F, I, t * jnp.int32(16),
        )
        if cfg["emit_transitions"]:
            obs8, next8, act_b, reward_b, done_i = emit
            tr_obs_ref[:, pl.ds(t, 1), :] = obs8[:, None, :]
            tr_next_ref[:, pl.ds(t, 1), :] = next8[:, None, :]
            tr_act_ref[:, pl.ds(t, 1)] = act_b
            tr_rew_ref[:, pl.ds(t, 1)] = reward_b
            tr_done_ref[:, pl.ds(t, 1)] = done_i
        return F2, I2, stats + srow

    n = f_ref.shape[0]
    stats0 = jnp.zeros((n, 8), jnp.float32)
    F_fin, I_fin, stats_fin = jax.lax.fori_loop(
        0, steps, body, (f_ref[:], i_ref[:], stats0)
    )
    out_f_ref[:] = F_fin
    out_i_ref[:] = I_fin
    stats_ref[:] = stats_fin


def pallas_actor_rollout(
    env_params: EnvParams,
    state: EnvState,            # batched (B,)
    opp_idx: jax.Array,         # (B,) i32
    ep_return: jax.Array,       # (B,) f32
    learner: PackedQNet,        # single net (unmirrored)
    opponents: PackedQNet,      # stacked (K+1, ...), mirror-folded
    *,
    seed: jax.Array,
    epsilon: jax.Array,
    pool_size: jax.Array,
    steps: int,
    pool_ratio: float,
    max_episode_steps: int = 0,
    tile_rows: int = 512,       # envs per kernel program
    interpret: bool = None,
    emit_transitions: bool = True,
    steps_per_cell: int = 8,    # grid-variant inner unroll (multiple of 8);
                                # 8 is the TPU-validated config
):
    """Returns (new_state, new_opp_idx, new_ep_return, transitions,
    stat_counts, ret_sum). transitions dict arrays are (T, B[, 7])."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    params = _static_params(env_params)
    B = state.ball_x.shape[0]
    if B % tile_rows:
        raise ValueError(f"batch {B} must be a multiple of {tile_rows}")
    grid = (B // tile_rows,)
    n_members = opponents.w1.shape[0]

    zero = jnp.zeros((B, 1), jnp.float32)
    F = jnp.concatenate(
        [state.ball_x[:, None], state.ball_y[:, None],
         state.ball_vx[:, None], state.ball_vy[:, None],
         state.bottom_paddle_x[:, None], state.top_paddle_x[:, None],
         state.spin[:, None], zero, ep_return[:, None]]
        + [zero] * (F_COLS - 9),
        axis=1,
    )
    zi = jnp.zeros((B, 1), jnp.int32)
    I = jnp.concatenate(
        [state.score_a[:, None], state.score_b[:, None],
         state.bounce_count[:, None], state.t[:, None], opp_idx[:, None]]
        + [zi] * (I_COLS - 5),
        axis=1,
    )
    scalars = jnp.asarray(
        [jnp.int32(seed), (epsilon * 1e6).astype(jnp.int32),
         jnp.int32(pool_size)], jnp.int32,
    )

    f32, i32 = jnp.float32, jnp.int32
    sds = jax.ShapeDtypeStruct
    cfg = {"steps": steps, "pool_ratio": float(pool_ratio),
           "max_episode_steps": int(max_episode_steps),
           "emit_transitions": bool(emit_transitions),
           "steps_per_cell": int(steps_per_cell)}

    if emit_transitions and not interpret:
        # time-as-grid-dimension variant: 8 env steps per cell, state
        # blocks revisited over the t axis, (tile, 8, 8) transition slabs.
        # (Interpret mode keeps the single-program fori variant below: the
        # interpreter re-executes the kernel per grid cell, which makes
        # the grid form pathologically slow on CPU.)
        spc = steps_per_cell
        if steps % spc:
            raise ValueError(f"steps ({steps}) must be a multiple of {spc}")
        grid = (B // tile_rows, steps // spc)
        rb = lambda cols: pl.BlockSpec(
            (tile_rows, cols), lambda i, t: (i, 0), memory_space=pltpu.VMEM
        )
        slab = pl.BlockSpec((tile_rows, spc, 8), lambda i, t: (i, t, 0),
                            memory_space=pltpu.VMEM)
        full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [rb(F_COLS), rb(I_COLS)]
            + [full()] * 16
        )
        out_specs = [
            rb(F_COLS), rb(I_COLS),
            slab, slab, slab, slab, slab,
            rb(8),
        ]
        out_shape = [
            sds((B, F_COLS), f32), sds((B, I_COLS), i32),
            sds((B, steps, 8), f32), sds((B, steps, 8), f32),
            sds((B, steps, 8), i32), sds((B, steps, 8), f32),
            sds((B, steps, 8), i32),
            sds((B, 8), f32),
        ]
        kernel = functools.partial(
            _actor_kernel_grid, params, cfg, n_members, not interpret
        )
        slab_transitions = True
    else:
        grid = (B // tile_rows,)
        row_block = lambda cols: pl.BlockSpec(
            (tile_rows, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        t_block3 = pl.BlockSpec((tile_rows, steps, 8), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        t_block2 = pl.BlockSpec((tile_rows, steps), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [row_block(F_COLS), row_block(I_COLS)]
            + [full()] * 16
        )
        if emit_transitions:
            out_specs = [
                row_block(F_COLS), row_block(I_COLS),
                t_block3, t_block3, t_block2, t_block2, t_block2,
                row_block(8),
            ]
            out_shape = [
                sds((B, F_COLS), f32), sds((B, I_COLS), i32),
                sds((B, steps, 8), f32), sds((B, steps, 8), f32),
                sds((B, steps), i32), sds((B, steps), f32),
                sds((B, steps), i32),
                sds((B, 8), f32),
            ]
        else:
            out_specs = [row_block(F_COLS), row_block(I_COLS), row_block(8)]
            out_shape = [
                sds((B, F_COLS), f32), sds((B, I_COLS), i32), sds((B, 8), f32),
            ]
        kernel = functools.partial(
            _actor_kernel, params, cfg, n_members, not interpret
        )
        slab_transitions = False
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(scalars, F, I, *learner, *opponents)

    if emit_transitions:
        F_out, I_out, tr_obs, tr_next, tr_act, tr_rew, tr_done, stats = outs
    else:
        F_out, I_out, stats = outs
    new_state = EnvState(
        ball_x=F_out[:, FX], ball_y=F_out[:, FY],
        ball_vx=F_out[:, FVX], ball_vy=F_out[:, FVY],
        spin=F_out[:, FSPIN],
        top_paddle_x=F_out[:, FTOP], bottom_paddle_x=F_out[:, FBOT],
        score_a=I_out[:, ISA], score_b=I_out[:, ISB],
        bounce_count=I_out[:, IBOUNCE], t=I_out[:, IT],
        done=jnp.zeros((B,), jnp.bool_),
    )
    if emit_transitions:
        if slab_transitions:
            action, reward, done = (tr_act[..., 0], tr_rew[..., 0],
                                    tr_done[..., 0])
        else:
            action, reward, done = tr_act, tr_rew, tr_done
        transitions = {
            "obs": jnp.swapaxes(tr_obs[..., :7], 0, 1),    # (T, B, 7)
            "action": action.T,
            "reward": reward.T,
            "next_obs": jnp.swapaxes(tr_next[..., :7], 0, 1),
            "done": done.T.astype(bool),
        }
    else:
        transitions = None
    stat_totals = jnp.sum(stats, axis=0)                   # (8,)
    stat_counts = stat_totals[:4].astype(jnp.int32)
    ret_sum = stat_totals[4]
    return (new_state, I_out[:, IOPP], F_out[:, FRET], transitions,
            stat_counts, ret_sum)
