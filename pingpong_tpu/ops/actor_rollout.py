"""Pallas TPU kernel: fused DQN actor rollout.

One kernel program per env tile runs the ENTIRE rollout chunk of the DQN
trainer (`train/dqn.py::_rollout`): per step, the NoisyNet + epsilon-greedy
learner action, the bound frozen-opponent action (stacked pool members,
mu-weights greedy), the masked env transition with in-kernel auto-reset
serves, transition emission, and episode accounting — with env state and
every network's weights resident in VMEM. The XLA scan path launches ~50
small kernels per env step; this runs the whole chunk in one.

Exactness notes (all VERIFIED against the XLA path in tests when
randomness is disabled):

* action selection only needs the advantage head: ``argmax(V + A - mean A)
  == argmax(A)`` since V shifts all actions equally — so the value head is
  never computed during rollout;
* learner noise is factorized Gaussian per step exactly as in
  ``models/noisy.py`` (``f(x) = sign sqrt|x|`` of Box-Muller normals), but
  drawn from the kernel PRNG — the reproducibility contract is per
  rollout backend;
* epsilon is held constant within a rollout chunk and decayed once per
  chunk by ``decay^episodes_finished`` outside the kernel (the XLA path
  decays per step within the chunk; with thousands of episodes per chunk
  both saturate to ``min_epsilon`` almost immediately — documented
  fidelity difference of the fast path);
* epsilon-greedy random actions use ``bits % 3`` (modulo bias ~2^-30).

Weight layout: feature matrices are zero-padded to lane-friendly shapes
((8, 64) first layer, advantage head padded to 8 columns with -inf bias on
the padding so argmax ignores it).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pingpong_tpu.env.pong import EnvParams, EnvState, step
from pingpong_tpu.models.qnet import QNetParams
from pingpong_tpu.ops.pong_kernel import (
    LANE,
    _hash_uniform,
    _serve_fields,
    _static_params,
    _tpu_uniform,
)

_FIELDS = [
    "ball_x", "ball_y", "ball_vx", "ball_vy", "spin",
    "top_paddle_x", "bottom_paddle_x",
]
_IFIELDS = ["score_a", "score_b", "bounce_count", "t"]
NEG_BIG = -1e30


class PackedQNet(NamedTuple):
    """Lane-padded advantage-path weights of one or more stacked QNets."""

    w1: jax.Array      # (..., 8, 64)   obs padded 7 -> 8
    b1: jax.Array      # (..., 1, 64)
    w2: jax.Array      # (..., 64, 64)
    b2: jax.Array      # (..., 1, 64)
    wa_mu: jax.Array   # (..., 64, 8)   3 real action columns
    ba_mu: jax.Array   # (..., 1, 8)    padding columns biased to -inf
    wa_sigma: jax.Array
    ba_sigma: jax.Array


def pack_qnet(params: QNetParams) -> PackedQNet:
    """Pad one QNet (or a stacked pool: leading axes preserved)."""

    def pad(x, rows=None, cols=None, fill=0.0):
        pads = [(0, 0)] * x.ndim
        if rows is not None:
            pads[-2] = (0, rows - x.shape[-2])
        if cols is not None:
            pads[-1] = (0, cols - x.shape[-1])
        return jnp.pad(x, pads, constant_values=fill)

    def as2d(b):  # (..., n) -> (..., 1, n)
        return b[..., None, :]

    ba = pad(as2d(params.fc_a.b_mu), cols=8, fill=NEG_BIG)
    return PackedQNet(
        w1=pad(params.feat1.w, rows=8),
        b1=as2d(params.feat1.b),
        w2=params.feat2.w,
        b2=as2d(params.feat2.b),
        wa_mu=pad(params.fc_a.w_mu, cols=8),
        ba_mu=ba,
        wa_sigma=pad(params.fc_a.w_sigma, cols=8),
        ba_sigma=pad(as2d(params.fc_a.b_sigma), cols=8),
    )


def _normal_pair(shape, uniform, seed, ctr, k):
    """Box-Muller standard normals from two uniform draws."""
    u1 = uniform(shape, 1e-7, 1.0, seed, ctr, k)
    u2 = uniform(shape, 0.0, 1.0, seed, ctr, k + 1)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * np.pi * u2)


def _scale_noise(x):
    return jnp.sign(x) * jnp.sqrt(jnp.abs(x))


def _advantage_argmax(obs8, w1, b1, w2, b2, wa, ba):
    """obs8 (tile, 8) -> greedy action (tile,) via the advantage path."""
    h = jnp.maximum(
        jnp.dot(obs8, w1, preferred_element_type=jnp.float32) + b1, 0.0
    )
    h = jnp.maximum(
        jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2, 0.0
    )
    adv = jnp.dot(h, wa, preferred_element_type=jnp.float32) + ba  # (tile, 8)
    return jnp.argmax(adv, axis=-1).astype(jnp.int32)


def _obs8(x, y, vx, vy, mine, other, spin):
    """(tile,128) components -> (tile*128, 8) padded observation matrix."""
    cols = [x, y, vx, vy, mine, other, spin]
    flat = [c.reshape(-1, 1) for c in cols]
    flat.append(jnp.zeros_like(flat[0]))
    return jnp.concatenate(flat, axis=1)


def _actor_kernel(params: EnvParams, cfg, n_members: int, use_tpu_prng: bool,
                  scalar_ref, *refs):
    (steps, pool_ratio, tile_rows) = (cfg["steps"], cfg["pool_ratio"],
                                      cfg["tile_rows"])
    n_state = len(_FIELDS) + len(_IFIELDS)
    i = 0
    state_refs = refs[i:i + n_state]; i += n_state
    opp_idx_ref = refs[i]; i += 1
    ep_ret_ref = refs[i]; i += 1
    learner_refs = refs[i:i + 8]; i += 8          # PackedQNet fields
    opp_refs = refs[i:i + 8]; i += 8              # stacked PackedQNet
    out_state_refs = refs[i:i + n_state]; i += n_state
    out_opp_idx_ref = refs[i]; i += 1
    out_ep_ret_ref = refs[i]; i += 1
    tr_obs_refs = refs[i:i + 7]; i += 7           # (T, tile, LANE) each
    tr_act_ref = refs[i]; i += 1
    tr_rew_ref = refs[i]; i += 1
    tr_next_refs = refs[i:i + 7]; i += 7
    tr_done_ref = refs[i]; i += 1
    stats_refs = refs[i:i + 5]; i += 5            # (tile, LANE) accumulators

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
    epsilon = scalar_ref[1].astype(jnp.float32) * 1e-6  # fixed-point scalar
    pool_size = scalar_ref[2]

    lw = [r[:] for r in learner_refs]
    shape = state_refs[0].shape

    def body(t, carry):
        (bx, by, vx, vy, sp, tx, botx, sa, sb, bc, tt, opp_idx, ep_ret) = carry
        ctr = t * jnp.int32(16)

        # ---- opponent action: mirrored view, mu-weights advantage argmax
        obs_a8 = _obs8(bx, 1.0 - by, vx, -vy, tx, botx, sp)
        act_a_flat = jnp.zeros((shape[0] * LANE,), jnp.int32)
        for k in range(n_members):
            ow = [r[k] for r in opp_refs]
            a_k = _advantage_argmax(obs_a8, ow[0], ow[1], ow[2], ow[3],
                                    ow[4], ow[5])
            act_a_flat = jnp.where(opp_idx.reshape(-1) == k, a_k, act_a_flat)
        act_a = act_a_flat.reshape(shape)

        # ---- learner action: fresh factorized noise + epsilon-greedy
        eps_in = _scale_noise(_normal_pair((64, LANE), uniform, seed_mix,
                                           ctr, 1)[:, 0:1])       # (64,1)
        eps_out = _scale_noise(_normal_pair((8, LANE), uniform, seed_mix,
                                            ctr, 3)[:, 0:1].T)    # (1,8)
        wa_eff = lw[4] + lw[6] * (eps_in @ eps_out)               # (64,8)
        ba_eff = lw[5] + lw[7] * eps_out
        ba_eff = jnp.where(ba_eff < NEG_BIG * 0.5, NEG_BIG, ba_eff)
        obs_b8 = _obs8(bx, by, vx, vy, botx, tx, sp)
        greedy_b = _advantage_argmax(obs_b8, lw[0], lw[1], lw[2], lw[3],
                                     wa_eff, ba_eff).reshape(shape)
        u_expl = uniform(shape, 0.0, 1.0, seed_mix, ctr, 5)
        rand_a = (
            uniform(shape, 0.0, 3.0, seed_mix, ctr, 6).astype(jnp.int32) % 3
        )
        act_b = jnp.where(u_expl < epsilon, rand_a, greedy_b)

        # ---- env transition (the same pure step function)
        state = EnvState(
            ball_x=bx, ball_y=by, ball_vx=vx, ball_vy=vy, spin=sp,
            top_paddle_x=tx, bottom_paddle_x=botx,
            score_a=sa, score_b=sb, bounce_count=bc, t=tt,
            done=jnp.zeros(shape, jnp.bool_),
        )
        new, out = step(params, state, act_a, act_b)
        done = out.done | (new.t >= cfg["max_episode_steps"]) \
            if cfg["max_episode_steps"] else out.done

        # ---- emit transition (pre-reset next obs)
        for r, v in zip(tr_obs_refs, (bx, by, vx, vy, botx, tx, sp)):
            r[t] = v
        tr_act_ref[t] = act_b
        tr_rew_ref[t] = out.reward_b
        nxt = (new.ball_x, new.ball_y, new.ball_vx, new.ball_vy,
               new.bottom_paddle_x, new.top_paddle_x, new.spin)
        for r, v in zip(tr_next_refs, nxt):
            r[t] = v
        tr_done_ref[t] = done.astype(jnp.int32)

        # ---- episode accounting accumulators
        ep_ret_new = ep_ret + out.reward_b
        win = (ep_ret_new > 0.0) & done
        vs_pool = opp_idx > 0
        d_i = done.astype(jnp.int32)
        w_i = win.astype(jnp.int32)
        p_i = vs_pool.astype(jnp.int32)
        stats_refs[0][:] = stats_refs[0][:] + d_i * (1 - p_i)
        stats_refs[1][:] = stats_refs[1][:] + w_i * (1 - p_i)
        stats_refs[2][:] = stats_refs[2][:] + d_i * p_i
        stats_refs[3][:] = stats_refs[3][:] + w_i * p_i
        stats_refs[4][:] = stats_refs[4][:] + jnp.where(done, ep_ret_new, 0.0)

        # ---- auto-reset + opponent re-bind
        svx, svy, ssp = _serve_fields(params, shape, uniform, seed_mix,
                                      ctr + 8)
        use_pool = (
            uniform(shape, 0.0, 1.0, seed_mix, ctr, 13) < pool_ratio
        ) & (pool_size > 0)
        u_pick = uniform(shape, 0.0, 1.0, seed_mix, ctr, 14)
        pick = jnp.clip(
            (u_pick * pool_size.astype(jnp.float32)).astype(jnp.int32),
            0, jnp.maximum(pool_size - 1, 0),
        )
        new_opp = jnp.where(use_pool, pick + 1, 0)
        return (
            jnp.where(done, 0.5, new.ball_x),
            jnp.where(done, 0.5, new.ball_y),
            jnp.where(done, svx, new.ball_vx),
            jnp.where(done, svy, new.ball_vy),
            jnp.where(done, ssp, new.spin),
            jnp.where(done, 0.5, new.top_paddle_x),
            jnp.where(done, 0.5, new.bottom_paddle_x),
            jnp.where(done, 0, new.score_a),
            jnp.where(done, 0, new.score_b),
            jnp.where(done, 0, new.bounce_count),
            jnp.where(done, 0, new.t),
            jnp.where(done, new_opp, opp_idx),
            jnp.where(done, 0.0, ep_ret_new),
        )

    for r in stats_refs:
        r[:] = jnp.zeros_like(r)
    init = tuple(r[:] for r in state_refs) + (opp_idx_ref[:], ep_ret_ref[:])
    final = jax.lax.fori_loop(0, steps, body, init)
    for r, v in zip(out_state_refs, final[:n_state]):
        r[:] = v
    out_opp_idx_ref[:] = final[n_state]
    out_ep_ret_ref[:] = final[n_state + 1]


def pallas_actor_rollout(
    env_params: EnvParams,
    state: EnvState,            # batched (B,)
    opp_idx: jax.Array,         # (B,) i32
    ep_return: jax.Array,       # (B,) f32
    learner: PackedQNet,        # single net
    opponents: PackedQNet,      # stacked (K+1, ...)
    *,
    seed: jax.Array,            # i32 scalar
    epsilon: jax.Array,         # f32 scalar
    pool_size: jax.Array,       # i32 scalar
    steps: int,
    pool_ratio: float,
    max_episode_steps: int = 0,
    tile_rows: int = 8,
    interpret: bool = None,
):
    if interpret is None:
        # CPU backends have no Mosaic: fall back to the interpreter so the
        # same learner code runs in tests and on accel-free hosts
        interpret = jax.default_backend() == "cpu"
    """Returns (new_state, new_opp_idx, new_ep_return, transitions, stats).

    transitions: dict with obs/action/reward/next_obs/done shaped (T, B[,7]).
    stats: (5,) array [dones_vs_a, wins_vs_a, dones_vs_pool, wins_vs_pool,
    ret_sum(float bits as f32 in slot 4 — returned separately)].
    """
    params = _static_params(env_params)
    B = state.ball_x.shape[0]
    rows = B // LANE
    if B % LANE or rows % tile_rows:
        raise ValueError(f"batch {B} must be a multiple of {tile_rows * LANE}")
    grid = (rows // tile_rows,)
    n_members = opponents.w1.shape[0]

    shape2 = lambda x: x.reshape(rows, LANE)
    state_in = [shape2(getattr(state, n)) for n in _FIELDS + _IFIELDS]
    scalars = jnp.asarray(
        [jnp.int32(seed),
         (epsilon * 1e6).astype(jnp.int32),
         jnp.int32(pool_size)], jnp.int32,
    )

    f32 = jnp.float32
    i32 = jnp.int32
    tile_block = pl.BlockSpec((tile_rows, LANE), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    t_block = pl.BlockSpec((steps, tile_rows, LANE), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)

    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [tile_block] * len(state_in)
        + [tile_block, tile_block]
        + [full()] * 16
    )
    out_specs = (
        [tile_block] * len(state_in)
        + [tile_block, tile_block]
        + [t_block] * 17
        + [tile_block] * 5
    )
    sds = lambda sh, dt: jax.ShapeDtypeStruct(sh, dt)
    out_shape = (
        [sds((rows, LANE), f32)] * len(_FIELDS)
        + [sds((rows, LANE), i32)] * len(_IFIELDS)
        + [sds((rows, LANE), i32), sds((rows, LANE), f32)]
        + [sds((steps, rows, LANE), f32)] * 7
        + [sds((steps, rows, LANE), i32), sds((steps, rows, LANE), f32)]
        + [sds((steps, rows, LANE), f32)] * 7
        + [sds((steps, rows, LANE), i32)]
        + [sds((rows, LANE), i32)] * 4 + [sds((rows, LANE), f32)]
    )
    cfg = {"steps": steps, "pool_ratio": float(pool_ratio),
           "tile_rows": tile_rows, "max_episode_steps": int(max_episode_steps)}
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
    )(scalars, *state_in, shape2(opp_idx), shape2(ep_return),
      *learner, *opponents)

    i = 0
    n_state = len(_FIELDS) + len(_IFIELDS)
    st_leaves = outs[i:i + n_state]; i += n_state
    new_opp = outs[i].reshape(B); i += 1
    new_ret = outs[i].reshape(B); i += 1
    obs7 = outs[i:i + 7]; i += 7
    act = outs[i]; i += 1
    rew = outs[i]; i += 1
    next7 = outs[i:i + 7]; i += 7
    done = outs[i]; i += 1
    stats = outs[i:i + 5]

    vals = dict(zip(_FIELDS + _IFIELDS,
                    [o.reshape(B) for o in st_leaves]))
    new_state = EnvState(done=jnp.zeros((B,), jnp.bool_), **vals)
    stack7 = lambda comps: jnp.stack(
        [c.reshape(steps, B) for c in comps], axis=-1
    )
    transitions = {
        "obs": stack7(obs7),
        "action": act.reshape(steps, B),
        "reward": rew.reshape(steps, B),
        "next_obs": stack7(next7),
        "done": done.reshape(steps, B).astype(bool),
    }
    stat_counts = jnp.stack([jnp.sum(s) for s in stats[:4]]).astype(jnp.int32)
    ret_sum = jnp.sum(stats[4])
    return new_state, new_opp, new_ret, transitions, stat_counts, ret_sum
