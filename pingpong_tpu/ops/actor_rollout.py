"""Pallas TPU kernel: fused DQN actor rollout (lane-major layout).

One kernel program per env tile runs the ENTIRE rollout chunk of the DQN
trainer (`train/dqn.py::_rollout`): per step, the NoisyNet + epsilon-greedy
learner action, the bound frozen-opponent action (stacked pool members,
mu-weights greedy), the masked env transition with in-kernel auto-reset
serves, transition emission, and episode accounting — with env state and
every network's weights resident in VMEM. The XLA scan path launches ~50
small kernels per env step; this runs the whole chunk in one.

Layout — the round-2 redesign that made the training path fast: envs live
along LANES. Every scalar env field is a ``(1, E)`` row (E envs per
program, a multiple of 128), so the ~50 elementwise physics ops per step
run at full VPU lane width instead of the round-1 env-per-row form whose
``(tile, 1)`` columns used 1 lane in 128 (~1% VPU utilization — measured
44 ms per 1M env-steps regardless of opponent count; this form is ~10x
faster). Player B's padded observation is simply the stack of the first 8
state rows, so the policy matmuls run TRANSPOSED: ``h = W1^T @ obs``
with shapes ``(64, 8) @ (8, E)``, ``(64, 64) @ (64, E)``,
``(8, 64) @ (64, E)`` — N = E lanes keeps the MXU wide. Player A's
mirrored view is a LINEAR map of B's view (``x, 1-y, vx, -vy, top,
bottom, spin``), folded into each opponent's first layer at pack time
(``W1t' = W1t M``, ``b1' = b1 + W1t[:, 1:2]``) so the mirror costs nothing
in-kernel.

Training mode (``emit_transitions=True``) uses the time-as-grid form:
grid ``(env_tiles, steps/steps_per_cell)`` with statically unrolled steps
per cell and ``(spc, 8, E)`` transition slabs (Mosaic's block rules forbid
per-step dynamic sublane writes). Eval mode is a single fori-loop program
per tile.

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

# F rows (first 8 = padded obs_b, transposed: envs on lanes)
FX, FY, FVX, FVY, FBOT, FTOP, FSPIN, FPAD, FRET = range(9)
F_ROWS = 16
# I rows
ISA, ISB, IBOUNCE, IT, IOPP = range(5)
I_ROWS = 8

# obs_a = _MIRROR @ obs_b (+ e_y): x, 1-y, vx, -vy, top, bottom, spin
_MIRROR = np.zeros((8, 8), np.float32)
for _i, _j, _v in [(0, 0, 1), (1, 1, -1), (2, 2, 1), (3, 3, -1),
                   (4, 5, 1), (5, 4, 1), (6, 6, 1)]:
    _MIRROR[_i, _j] = _v


class PackedQNet(NamedTuple):
    """Transposed, padded advantage-path weights (optionally mirror-folded).

    All matrices are laid out for left-multiplication of an ``(·, E)``
    activations matrix: ``h1 = relu(w1t @ obs8 + b1t)`` etc."""

    w1t: jax.Array       # (..., 64, 8)
    b1t: jax.Array       # (..., 64, 1)
    w2t: jax.Array       # (..., 64, 64)
    b2t: jax.Array       # (..., 64, 1)
    wat_mu: jax.Array    # (..., 8, 64)   3 real action rows
    bat_mu: jax.Array    # (..., 8, 1)    padding rows biased to -inf
    wat_sigma: jax.Array
    bat_sigma: jax.Array


def pack_qnet(params: QNetParams, mirror: bool = False) -> PackedQNet:
    """Pad + transpose one QNet (or a stacked pool; leading axes kept).

    ``mirror=True`` folds player A's view transform into (w1t, b1t): the
    net then consumes player B's observation rows directly."""

    def pad_rows(x, rows, fill=0.0):
        pads = [(0, 0)] * x.ndim
        pads[-2] = (0, rows - x.shape[-2])
        return jnp.pad(x, pads, constant_values=fill)

    def t(x):  # transpose the trailing two dims
        return jnp.swapaxes(x, -1, -2)

    def col(b):  # (..., n) bias -> (..., n, 1)
        return b[..., None]

    w1t = t(jnp.pad(params.feat1.w, [(0, 0)] * (params.feat1.w.ndim - 2)
                    + [(0, 1), (0, 0)]))          # (..., 64, 8)
    b1t = col(params.feat1.b)                     # (..., 64, 1)
    if mirror:
        m = jnp.asarray(_MIRROR.T)                # fold: w1t' = w1t @ M^T? see below
        # obs_a = M @ obs_b + e_y  =>  w1t @ obs_a = (w1t @ M) @ obs_b
        #                              + w1t[:, y]
        b1t = b1t + w1t[..., 1:2]
        w1t = jnp.einsum("...ik,kj->...ij", w1t, jnp.asarray(_MIRROR))
    return PackedQNet(
        w1t=w1t,
        b1t=b1t,
        w2t=t(params.feat2.w),
        b2t=col(params.feat2.b),
        wat_mu=pad_rows(t(params.fc_a.w_mu), 8),
        bat_mu=pad_rows(col(params.fc_a.b_mu), 8, fill=NEG_BIG),
        wat_sigma=pad_rows(t(params.fc_a.w_sigma), 8),
        bat_sigma=pad_rows(col(params.fc_a.b_sigma), 8),
    )


def _scale_noise(x):
    return jnp.sign(x) * jnp.sqrt(jnp.abs(x))


def _advantage_t(obs8, w1t, b1t, w2t, b2t, wat, bat):
    """Transposed forward: obs8 (8, E) -> advantages (8, E)."""
    h = jnp.maximum(
        jnp.dot(w1t, obs8, preferred_element_type=jnp.float32) + b1t, 0.0
    )
    h = jnp.maximum(
        jnp.dot(w2t, h, preferred_element_type=jnp.float32) + b2t, 0.0
    )
    return jnp.dot(wat, h, preferred_element_type=jnp.float32) + bat


def _argmax3_rows(adv):
    """argmax over the first 3 rows of (8, E); ties -> lowest index,
    matching jnp.argmax."""
    a0, a1, a2 = adv[0:1], adv[1:2], adv[2:3]
    best01 = jnp.maximum(a0, a1)
    i01 = jnp.where(a1 > a0, jnp.int32(1), jnp.int32(0))
    return jnp.where(a2 > best01, jnp.int32(2), i01)     # (1, E) i32


def obs8_from_rows(rows):
    """Player B's padded observation: the first 8 state rows. (8, E)."""
    (bx, by, vx, vy, bot, top, sp, *_rest) = rows
    row_f = (1, bx.shape[1])
    return jnp.concatenate(
        [bx, by, vx, vy, bot, top, sp, jnp.zeros(row_f, jnp.float32)], axis=0
    )


def _env_transition(params, cfg, uniform, seed_mix, rows, ctr,
                    act_a, act_b, obs8):
    """Masked env transition + auto-reset + accounting on (1, E) rows.

    Shared by the feed-forward and recurrent actor kernels. Returns
    (rows', srow, emit) where srow is the (8, E) stats block row and emit
    is ``(obs8, next8, act_b, reward_b, done_i32)``."""
    (bx, by, vx, vy, bot, top, sp, ret, sa, sb, bc, tt, opp) = rows
    E = bx.shape[1]
    row_f = (1, E)

    # ---- env transition via the shared pure step (shape-polymorphic)
    state = EnvState(
        ball_x=bx, ball_y=by, ball_vx=vx, ball_vy=vy, spin=sp,
        top_paddle_x=top, bottom_paddle_x=bot,
        score_a=sa, score_b=sb, bounce_count=bc, t=tt,
        done=jnp.zeros(row_f, jnp.bool_),
    )
    new, out = step(params, state, act_a, act_b)
    done = out.done | (new.t >= cfg["max_episode_steps"]) \
        if cfg["max_episode_steps"] else out.done

    next8 = jnp.concatenate(
        [new.ball_x, new.ball_y, new.ball_vx, new.ball_vy,
         new.bottom_paddle_x, new.top_paddle_x, new.spin,
         jnp.zeros(row_f, jnp.float32)], axis=0,
    )

    # ---- accounting rows (row 5 counts per-env episode ends so the host
    # can re-bind opponents at the next chunk boundary)
    ep_ret = ret + out.reward_b
    win = (ep_ret > 0.0) & done
    vs_pool = opp > 0
    d_f = done.astype(jnp.float32)
    w_f = win.astype(jnp.float32)
    p_f = vs_pool.astype(jnp.float32)
    draw_f = (d_f * (ep_ret == 0.0)).astype(jnp.float32)  # step-cap ties
    srow = jnp.concatenate(
        [d_f * (1 - p_f), w_f * (1 - p_f), d_f * p_f, w_f * p_f,
         jnp.where(done, ep_ret, 0.0), d_f, draw_f,
         jnp.zeros((1, E), jnp.float32)], axis=0,
    )                                                     # (8, E)

    # ---- auto-reset; binding is FIXED within the chunk (re-bind happens
    # at chunk boundaries on the host side, where envs are re-sorted)
    svx, svy, ssp = _serve_fields(params, row_f, uniform, seed_mix, ctr + 8)

    zero_i = jnp.zeros(row_f, jnp.int32)
    rows_new = (
        jnp.where(done, 0.5, new.ball_x),
        jnp.where(done, 0.5, new.ball_y),
        jnp.where(done, svx, new.ball_vx),
        jnp.where(done, svy, new.ball_vy),
        jnp.where(done, 0.5, new.bottom_paddle_x),
        jnp.where(done, 0.5, new.top_paddle_x),
        jnp.where(done, ssp, new.spin),
        jnp.where(done, 0.0, ep_ret),
        jnp.where(done, zero_i, new.score_a),
        jnp.where(done, zero_i, new.score_b),
        jnp.where(done, zero_i, new.bounce_count),
        jnp.where(done, zero_i, new.t),
        opp,
    )
    emit = (obs8, next8, act_b, out.reward_b, done.astype(jnp.int32))
    return rows_new, srow, emit


def _one_step(params, cfg, member_ranges, uniform, seed_mix, epsilon,
              lw, opp_refs, rows, ctr):
    """One env step on (1, E) field rows. Returns (rows', srow, emit).

    ``member_ranges`` = list of G (lo, hi) pairs: the opponent slots bound
    to envs of each E/G-lane GROUP of this tile. Envs are SORTED by bound
    member at chunk boundaries (see train/dqn.py::_rollout_pallas), so
    each group spans ~1 member regardless of pool size; running the
    masked member forwards per narrow group instead of per full tile cuts
    the pool tax by ~G/(span+G) (a tile spanning m members costs
    ~(m+G)/G group-width forwards instead of m tile-width ones)."""
    (bx, by, vx, vy, bot, top, sp, ret, sa, sb, bc, tt, opp) = rows
    E = bx.shape[1]
    row_f = (1, E)

    obs8 = obs8_from_rows(rows)                           # (8, E)

    # ---- opponent action (mirror folded into weights): only the member
    # slots actually present in each lane group are computed. One stacked
    # slot (empty pool) needs no loop at all — the dynamic fori_loop is a
    # Mosaic scheduling barrier for a statically-known single iteration.
    if cfg.get("n_slots", 0) == 1:
        ow = [r[0:1][0] for r in opp_refs]
        act_a = _argmax3_rows(
            _advantage_t(obs8, ow[0], ow[1], ow[2], ow[3], ow[4], ow[5])
        )
    else:
        G = len(member_ranges)
        Eg = E // G
        shared_trunk = cfg.get("shared_trunk", False)
        parts = []
        for g, (lo, hi) in enumerate(member_ranges):
            obs8_g = obs8[:, g * Eg:(g + 1) * Eg]
            opp_g = opp[:, g * Eg:(g + 1) * Eg]

            if shared_trunk:
                # heads-only lineages (the reference default,
                # train_iterative.py:96-104) share one frozen feature
                # trunk across A and every pool member — verified on the
                # host at pack time (PreparedOpponents.shared_trunk).
                # The trunk runs ONCE per group; the member loop is only
                # the (8, 64) advantage head — ~3x fewer serialized ops
                # per member iteration than the full-forward loop.
                w1t, b1t = opp_refs[0][0:1][0], opp_refs[1][0:1][0]
                w2t, b2t = opp_refs[2][0:1][0], opp_refs[3][0:1][0]
                h = jnp.maximum(
                    jnp.dot(w1t, obs8_g,
                            preferred_element_type=jnp.float32) + b1t, 0.0
                )
                h2_g = jnp.maximum(
                    jnp.dot(w2t, h,
                            preferred_element_type=jnp.float32) + b2t, 0.0
                )

                def member_body(k, act_a, h2_g=h2_g, opp_g=opp_g):
                    wat = opp_refs[4][pl.ds(k, 1)][0]
                    bat = opp_refs[5][pl.ds(k, 1)][0]
                    adv_k = jnp.dot(
                        wat, h2_g, preferred_element_type=jnp.float32
                    ) + bat
                    a_k = _argmax3_rows(adv_k)
                    return jnp.where(opp_g == k, a_k, act_a)
            else:
                def member_body(k, act_a, obs8_g=obs8_g, opp_g=opp_g):
                    ow = [r[pl.ds(k, 1)][0] for r in opp_refs]
                    adv_k = _advantage_t(
                        obs8_g, ow[0], ow[1], ow[2], ow[3], ow[4], ow[5]
                    )
                    a_k = _argmax3_rows(adv_k)
                    return jnp.where(opp_g == k, a_k, act_a)

            parts.append(jax.lax.fori_loop(
                lo, hi + 1, member_body,
                jnp.zeros((1, Eg), jnp.int32),
            ))
        act_a = parts[0] if G == 1 else jnp.concatenate(parts, axis=1)

    # ---- learner action: factorized noise + epsilon-greedy
    u1 = uniform((8, 128), 1e-7, 1.0, seed_mix, ctr, 1)
    u2 = uniform((8, 128), 0.0, 1.0, seed_mix, ctr, 2)
    nrm = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * np.pi * u2)
    eps_in = _scale_noise(nrm[0:1, 0:64])                 # (1, 64)
    eps_out = _scale_noise(nrm[0:8, 64:65])               # (8, 1)
    wa_eff = lw[4] + lw[6] * (eps_out * eps_in)           # (8, 64)
    ba_eff = lw[5] + lw[7] * eps_out                      # (8, 1)
    ba_eff = jnp.where(ba_eff < NEG_BIG * 0.5, NEG_BIG, ba_eff)
    adv_b = _advantage_t(obs8, lw[0], lw[1], lw[2], lw[3], wa_eff, ba_eff)
    greedy_b = _argmax3_rows(adv_b)
    u_expl = uniform(row_f, 0.0, 1.0, seed_mix, ctr, 5)
    rand_a = uniform(row_f, 0.0, 3.0, seed_mix, ctr, 6).astype(jnp.int32)
    act_b = jnp.where(u_expl < epsilon, jnp.clip(rand_a, 0, 2), greedy_b)

    return _env_transition(
        params, cfg, uniform, seed_mix, rows, ctr, act_a, act_b, obs8
    )


def _rows_from_blocks(f_blk, i_blk):
    return (
        f_blk[FX:FX + 1], f_blk[FY:FY + 1], f_blk[FVX:FVX + 1],
        f_blk[FVY:FVY + 1], f_blk[FBOT:FBOT + 1], f_blk[FTOP:FTOP + 1],
        f_blk[FSPIN:FSPIN + 1], f_blk[FRET:FRET + 1],
        i_blk[ISA:ISA + 1], i_blk[ISB:ISB + 1], i_blk[IBOUNCE:IBOUNCE + 1],
        i_blk[IT:IT + 1], i_blk[IOPP:IOPP + 1],
    )


def _blocks_from_rows(rows):
    (bx, by, vx, vy, bot, top, sp, ret, sa, sb, bc, tt, opp) = rows
    E = bx.shape[1]
    f_blk = jnp.concatenate(
        [bx, by, vx, vy, bot, top, sp, jnp.zeros((1, E), jnp.float32), ret]
        + [jnp.zeros((F_ROWS - 9, E), jnp.float32)], axis=0,
    )
    i_blk = jnp.concatenate(
        [sa, sb, bc, tt, opp] + [jnp.zeros((I_ROWS - 5, E), jnp.int32)],
        axis=0,
    )
    return f_blk, i_blk


def _actor_kernel_grid(params: EnvParams, cfg, n_members: int,
                       use_tpu_prng: bool, scalar_ref, *refs):
    """Time-as-grid-dimension training kernel: grid (env_tiles,
    steps // spc), spc env steps statically unrolled per cell. State and
    stats blocks are revisited across the t axis (Mosaic keeps them
    VMEM-resident); each transition block is a (spc, 8|1, E) slab written
    at static step indices."""
    i = 0
    f_ref = refs[i]; i += 1
    i_ref = refs[i]; i += 1
    learner_refs = refs[i:i + 8]; i += 8
    opp_refs = refs[i:i + 8]; i += 8
    out_f_ref = refs[i]; i += 1
    out_i_ref = refs[i]; i += 1
    tr_obs_ref = refs[i]; i += 1     # block (spc, 8, E) at (t, 0, i)
    tr_next_ref = refs[i]; i += 1
    tr_act_ref = refs[i]; i += 1     # block (spc, E) at (t, i)
    tr_rew_ref = refs[i]; i += 1
    tr_done_ref = refs[i]; i += 1
    stats_ref = refs[i]; i += 1      # block (8, E) revisited

    tb = pl.program_id(1)
    tile = pl.program_id(0)
    # gtile = tile id in the GLOBAL env batch: under shard_map each data
    # shard runs tiles [tile0, tile0 + n_local); keying the PRNG by the
    # global id keeps the noise streams identical to the single-device
    # program (scalars/member ranges stay local to the shard)
    gtile = scalar_ref[3] + tile
    if use_tpu_prng:
        pltpu.prng_seed(
            scalar_ref[0], gtile * pl.num_programs(1) + tb
        )
        uniform = _tpu_uniform
        seed_mix = jnp.uint32(0)
    else:
        uniform = _hash_uniform
        seed_mix = (
            scalar_ref[0].astype(jnp.uint32)
            ^ (gtile.astype(jnp.uint32) * jnp.uint32(747796405))
            ^ (tb.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B))
        )
    epsilon = scalar_ref[1].astype(jnp.float32) * 1e-6
    n_tiles = pl.num_programs(0)
    G = cfg["member_groups"]
    member_ranges = [
        (scalar_ref[4 + tile * G + g],
         scalar_ref[4 + n_tiles * G + tile * G + g])
        for g in range(G)
    ]

    @pl.when(tb == 0)
    def _():
        out_f_ref[:] = f_ref[:]
        out_i_ref[:] = i_ref[:]
        stats_ref[:] = jnp.zeros_like(stats_ref)

    lw = [r[:] for r in learner_refs]
    rows = _rows_from_blocks(out_f_ref[:], out_i_ref[:])
    stats = stats_ref[:]
    for j in range(cfg["steps_per_cell"]):
        rows, srow, emit = _one_step(
            params, cfg, member_ranges, uniform, seed_mix, epsilon,
            lw, opp_refs, rows, jnp.int32(j * 16),
        )
        obs8, next8, act_b, reward_b, done_i = emit
        stats = stats + srow
        tr_obs_ref[j] = obs8
        tr_next_ref[j] = next8
        tr_act_ref[j:j + 1, :] = act_b
        tr_rew_ref[j:j + 1, :] = reward_b
        tr_done_ref[j:j + 1, :] = done_i
    f_blk, i_blk = _blocks_from_rows(rows)
    out_f_ref[:] = f_blk
    out_i_ref[:] = i_blk
    stats_ref[:] = stats


def _actor_kernel(params: EnvParams, cfg, n_members: int, use_tpu_prng: bool,
                  scalar_ref, *refs):
    """Single-program fori variant: eval mode (no transitions) on TPU, and
    all modes under the interpreter (the interpreter re-executes the kernel
    per grid cell, making the grid form pathologically slow on CPU)."""
    steps = cfg["steps"]
    i = 0
    f_ref = refs[i]; i += 1
    i_ref = refs[i]; i += 1
    learner_refs = refs[i:i + 8]; i += 8
    opp_refs = refs[i:i + 8]; i += 8
    out_f_ref = refs[i]; i += 1
    out_i_ref = refs[i]; i += 1
    if cfg["emit_transitions"]:
        tr_obs_ref = refs[i]; i += 1     # (steps, 8, E)
        tr_next_ref = refs[i]; i += 1
        tr_act_ref = refs[i]; i += 1     # (steps, E)
        tr_rew_ref = refs[i]; i += 1
        tr_done_ref = refs[i]; i += 1
    stats_ref = refs[i]; i += 1          # (8, E)

    tile = pl.program_id(0)
    gtile = scalar_ref[3] + tile   # global tile id (see grid variant)
    if use_tpu_prng:
        pltpu.prng_seed(scalar_ref[0], gtile)
        uniform = _tpu_uniform
        seed_mix = jnp.uint32(0)
    else:
        uniform = _hash_uniform
        seed_mix = (
            scalar_ref[0].astype(jnp.uint32)
            ^ (gtile.astype(jnp.uint32) * jnp.uint32(747796405))
        )
    epsilon = scalar_ref[1].astype(jnp.float32) * 1e-6
    n_tiles = pl.num_programs(0)
    G = cfg["member_groups"]
    member_ranges = [
        (scalar_ref[4 + tile * G + g],
         scalar_ref[4 + n_tiles * G + tile * G + g])
        for g in range(G)
    ]
    lw = [r[:] for r in learner_refs]

    def body(t, carry):
        rows, stats = carry
        rows, srow, emit = _one_step(
            params, cfg, member_ranges, uniform, seed_mix, epsilon,
            lw, opp_refs, rows, t * jnp.int32(16),
        )
        if cfg["emit_transitions"]:
            obs8, next8, act_b, reward_b, done_i = emit
            tr_obs_ref[pl.ds(t, 1)] = obs8[None]
            tr_next_ref[pl.ds(t, 1)] = next8[None]
            tr_act_ref[pl.ds(t, 1), :] = act_b
            tr_rew_ref[pl.ds(t, 1), :] = reward_b
            tr_done_ref[pl.ds(t, 1), :] = done_i
        return rows, stats + srow

    E = f_ref.shape[1]
    rows0 = _rows_from_blocks(f_ref[:], i_ref[:])
    stats0 = jnp.zeros((8, E), jnp.float32)
    rows_fin, stats_fin = jax.lax.fori_loop(0, steps, body, (rows0, stats0))
    f_blk, i_blk = _blocks_from_rows(rows_fin)
    out_f_ref[:] = f_blk
    out_i_ref[:] = i_blk
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
    tile_rows: int = 512,       # envs per kernel program (multiple of 128)
    interpret: bool = None,
    emit_transitions: bool = True,
    steps_per_cell: int = 8,    # grid-variant inner unroll
    tile0: jax.Array | int = 0, # global index of this call's first tile:
                                # under shard_map each data shard passes
                                # axis_index * local_tile_count so PRNG
                                # streams match the single-device program
    member_groups: int = 8,     # lane groups per tile for the masked
                                # opponent pass (pool tax ~ span/G);
                                # clamped to >=256 lanes per group,
                                # forced 1 for a single stacked slot
    member_shared_trunk: bool = False,  # all stacked slots share one
                                # frozen feature trunk (heads-only
                                # lineages): trunk once per group,
                                # member loop = advantage head only.
                                # Caller must VERIFY equality (see
                                # train/dqn.py::DQNLearner.prepare_opponents)
):
    """Returns (new_state, new_opp_idx, new_ep_return, transitions,
    stat_counts, ret_sum, ended). transitions dict arrays are (T, B[, 7]);
    ``ended`` is a per-env bool — "finished >= 1 episode this chunk" — the
    host's signal to re-bind that env's opponent at the next chunk
    boundary. Bindings are FIXED within a chunk; callers should pass envs
    SORTED by ``opp_idx`` so each tile spans a short member range (the
    kernel computes only slots [lo, hi] per tile)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    params = _static_params(env_params)
    B = state.ball_x.shape[0]
    E = tile_rows
    if B % E:
        raise ValueError(f"batch {B} must be a multiple of {E}")
    n_members = opponents.w1t.shape[0]
    n_tiles = B // E
    # per-(tile, group) bound-member range (envs sorted by opp_idx ⇒
    # contiguous): the masked opponent forwards run per E/G-lane group
    G = 1 if n_members == 1 else max(1, min(member_groups, E // 256))
    opp_by_group = opp_idx.reshape(n_tiles * G, E // G)
    tile_lo = jnp.min(opp_by_group, axis=1).astype(jnp.int32)
    tile_hi = jnp.max(opp_by_group, axis=1).astype(jnp.int32)

    zero = jnp.zeros((1, B), jnp.float32)
    F = jnp.concatenate(
        [state.ball_x[None], state.ball_y[None],
         state.ball_vx[None], state.ball_vy[None],
         state.bottom_paddle_x[None], state.top_paddle_x[None],
         state.spin[None], zero, ep_return[None]]
        + [zero] * (F_ROWS - 9),
        axis=0,
    )
    zi = jnp.zeros((1, B), jnp.int32)
    I = jnp.concatenate(
        [state.score_a[None], state.score_b[None],
         state.bounce_count[None], state.t[None], opp_idx[None]]
        + [zi] * (I_ROWS - 5),
        axis=0,
    )
    scalars = jnp.concatenate([
        jnp.stack([jnp.int32(seed), (epsilon * 1e6).astype(jnp.int32),
                   jnp.int32(pool_size), jnp.int32(tile0)]),
        tile_lo, tile_hi,
    ]).astype(jnp.int32)

    f32, i32 = jnp.float32, jnp.int32
    sds = jax.ShapeDtypeStruct
    cfg = {"steps": steps, "pool_ratio": float(pool_ratio),
           "max_episode_steps": int(max_episode_steps),
           "emit_transitions": bool(emit_transitions),
           "steps_per_cell": int(steps_per_cell),
           "n_slots": int(n_members), "member_groups": int(G),
           "shared_trunk": bool(member_shared_trunk)}

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    if emit_transitions and not interpret:
        spc = steps_per_cell
        if steps % spc:
            raise ValueError(f"steps ({steps}) must be a multiple of {spc}")
        grid = (B // E, steps // spc)
        rb = lambda rows_n: pl.BlockSpec(
            (rows_n, E), lambda i, t: (0, i), memory_space=pltpu.VMEM
        )
        slab3 = pl.BlockSpec((spc, 8, E), lambda i, t: (t, 0, i),
                             memory_space=pltpu.VMEM)
        slab2 = pl.BlockSpec((spc, E), lambda i, t: (t, i),
                             memory_space=pltpu.VMEM)
        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [rb(F_ROWS), rb(I_ROWS)]
            + [full()] * 16
        )
        out_specs = [
            rb(F_ROWS), rb(I_ROWS),
            slab3, slab3, slab2, slab2, slab2,
            rb(8),
        ]
        out_shape = [
            sds((F_ROWS, B), f32), sds((I_ROWS, B), i32),
            sds((steps, 8, B), f32), sds((steps, 8, B), f32),
            sds((steps, B), i32), sds((steps, B), f32),
            sds((steps, B), i32),
            sds((8, B), f32),
        ]
        kernel = functools.partial(
            _actor_kernel_grid, params, cfg, n_members, not interpret
        )
    else:
        grid = (B // E,)
        rb = lambda rows_n: pl.BlockSpec(
            (rows_n, E), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        t_block3 = pl.BlockSpec((steps, 8, E), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)
        t_block2 = pl.BlockSpec((steps, E), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [rb(F_ROWS), rb(I_ROWS)]
            + [full()] * 16
        )
        if emit_transitions:
            out_specs = [
                rb(F_ROWS), rb(I_ROWS),
                t_block3, t_block3, t_block2, t_block2, t_block2,
                rb(8),
            ]
            out_shape = [
                sds((F_ROWS, B), f32), sds((I_ROWS, B), i32),
                sds((steps, 8, B), f32), sds((steps, 8, B), f32),
                sds((steps, B), i32), sds((steps, B), f32),
                sds((steps, B), i32),
                sds((8, B), f32),
            ]
        else:
            out_specs = [rb(F_ROWS), rb(I_ROWS), rb(8)]
            out_shape = [
                sds((F_ROWS, B), f32), sds((I_ROWS, B), i32),
                sds((8, B), f32),
            ]
        kernel = functools.partial(
            _actor_kernel, params, cfg, n_members, not interpret
        )
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
        ball_x=F_out[FX], ball_y=F_out[FY],
        ball_vx=F_out[FVX], ball_vy=F_out[FVY],
        spin=F_out[FSPIN],
        top_paddle_x=F_out[FTOP], bottom_paddle_x=F_out[FBOT],
        score_a=I_out[ISA], score_b=I_out[ISB],
        bounce_count=I_out[IBOUNCE], t=I_out[IT],
        done=jnp.zeros((B,), jnp.bool_),
    )
    if emit_transitions:
        # (T, 8, B) -> (T, B, 7): one XLA transpose per chunk, off the
        # kernel's critical path
        transitions = {
            "obs": jnp.swapaxes(tr_obs, 1, 2)[..., :7],
            "action": tr_act,
            "reward": tr_rew,
            "next_obs": jnp.swapaxes(tr_next, 1, 2)[..., :7],
            "done": tr_done.astype(bool),
        }
    else:
        transitions = None
    stat_totals = jnp.sum(stats, axis=1)                   # (8,)
    # [games_vs_a, wins_vs_a, games_vs_pool, wins_vs_pool, draws]
    stat_counts = jnp.concatenate(
        [stat_totals[:4], stat_totals[6:7]]
    ).astype(jnp.int32)
    ret_sum = stat_totals[4]
    ended = stats[5] > 0.0                                 # (B,) bool
    return (new_state, I_out[IOPP], F_out[FRET], transitions,
            stat_counts, ret_sum, ended)
