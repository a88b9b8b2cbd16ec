"""Pallas TPU kernel: fused DRQN (recurrent) actor rollout, lane-major.

The recurrent trainer's rollout is inherently latency-bound under XLA: the
LSTM step chain is serial, and every env step dispatches a dozen small
kernels (feature MLP, input/recurrent gate matmuls, noisy head, env
physics). This kernel runs the ENTIRE rollout chunk of
``train/drqn.py::_rollout`` as one program per env tile — per step: the
bound frozen opponent's recurrent forward (mu weights, mirror folded), the
learner's NoisyNet + epsilon-greedy recurrent forward, the masked env
transition with in-kernel auto-reset, transition emission, and episode
accounting — with env state, BOTH LSTM streams, and every network's
weights resident in VMEM.

Layout follows :mod:`pingpong_tpu.ops.actor_rollout`: envs live along
LANES. Every scalar env field is a ``(1, E)`` row; hidden states are
``(H, E)`` blocks (one lane column per env); all matmuls run TRANSPOSED so
N = E lanes keeps the MXU wide:

    f1    = relu(W1t @ obs8 + b1t)            (F1, 8) @ (8, E)
    f2    = relu(W2t @ f1 + b2t)              (F, F1) @ (F1, E)
    gates = Wght @ [f2; h] + bgt              (4H, F+H) @ (F+H, E)
            (Wght = [w_ih | w_hh] packed host-side: ONE gates matmul)
    h', c' per torch gate order i,f,g,o       row slices of (4H, E)
    s     = relu(Wst @ h' + bst)              (HH, H) @ (H, E)   [shared noisy]
    adv   = Wat @ s + bat                     (8, HH) @ (HH, E)  [A head]

Action selection needs only the advantage head (argmax(V + A - mean A) ==
argmax(A)); the V head never enters the kernel. Player A's mirrored view
is folded into each opponent's first feature layer at pack time, exactly
as in the feed-forward kernel.

Opponent streams: each env carries ONE opponent hidden state — the bound
member's (the XLA path advances a stream per pool slot; all but one are
dead state, VERDICT round-1 weak #2). Envs arrive SORTED by bound member
(train/drqn.py::_rollout_pallas), so each tile computes only member slots
``[lo, hi]`` — opponent compute does not scale with pool size. All member
candidates advance from the SAME bound stream and the bound one is
selected by mask, which is exactly the per-slot result for the bound
member. Hidden states (learner + opponent) zero-reset on episode
boundaries in-kernel; the host zero-resets the opponent stream when it
re-binds an env at a chunk boundary.

Constraints (callers fall back to the XLA path otherwise, see
``supports_pallas``): ``lstm_layers == 1``, a shared noisy head present
(``head_hidden_dim > 0``) — the reference's shipped architecture
(``/root/reference/config_rnn.yaml:38-42``) — and dims <= 128 so noise
rows fit one lane register. Exactness and reproducibility notes match
``actor_rollout.py``: learner noise is factorized Gaussian per step from
the kernel PRNG (shared across a tile's envs, as the XLA path's per-step
noise is shared across all envs); epsilon is held constant within a chunk.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pingpong_tpu.env.pong import EnvParams, EnvState
from pingpong_tpu.models.qnet_rnn import QNetRNNParams
from pingpong_tpu.ops.actor_rollout import (
    F_ROWS,
    FBOT,
    FRET,
    FSPIN,
    FTOP,
    FVX,
    FVY,
    FX,
    FY,
    I_ROWS,
    IBOUNCE,
    IOPP,
    ISA,
    ISB,
    IT,
    NEG_BIG,
    _MIRROR,
    _argmax3_rows,
    _blocks_from_rows,
    _env_transition,
    _rows_from_blocks,
    _scale_noise,
    obs8_from_rows,
)
from pingpong_tpu.ops.pong_kernel import (
    _hash_uniform,
    _static_params,
    _tpu_uniform,
)


class PackedQNetRNN(NamedTuple):
    """Transposed, padded mu-weights of one QNetRNN (or a stacked pool;
    leading axes kept). All matrices left-multiply ``(·, E)`` activations.
    The V head is omitted (argmax-invariant); LSTM biases are pre-summed
    (``bgt = b_ih + b_hh``)."""

    w1t: jax.Array    # (..., F1, 8)
    b1t: jax.Array    # (..., F1, 1)
    w2t: jax.Array    # (..., F, F1)
    b2t: jax.Array    # (..., F, 1)
    wght: jax.Array   # (..., 4H, F+H)  [w_ih | w_hh] fused at pack time:
                      #   one gates matmul per step instead of two
    bgt: jax.Array    # (..., 4H, 1)
    wst: jax.Array    # (..., HH, H)   shared noisy mu
    bst: jax.Array    # (..., HH, 1)
    wat: jax.Array    # (..., 8, HH)   3 real action rows
    bat: jax.Array    # (..., 8, 1)    padding rows biased to -inf


class RNNSigma(NamedTuple):
    """Learner-only noisy sigmas (opponents/targets run mu-only)."""

    wst_sigma: jax.Array  # (HH, H)
    bst_sigma: jax.Array  # (HH, 1)
    wat_sigma: jax.Array  # (8, HH)
    bat_sigma: jax.Array  # (8, 1)


def supports_pallas(params: QNetRNNParams) -> bool:
    """Whether the kernel handles this architecture (else: XLA path)."""
    if len(params.lstm) != 1 or params.shared is None:
        return False
    f1 = params.feat1.w.shape[1]
    f = params.feat2.w.shape[1]
    h = params.lstm[0].w_hh.shape[0]
    hh = params.shared.w_mu.shape[1]
    return max(f1, f, h, hh) <= 128


def _t(x):
    return jnp.swapaxes(x, -1, -2)


def _col(b):
    return b[..., None]


def pack_qnet_rnn(params: QNetRNNParams, mirror: bool = False) -> PackedQNetRNN:
    """Pad + transpose one QNetRNN (or a stacked pool). ``mirror=True``
    folds player A's view transform into the first feature layer so the
    net consumes player B's observation rows directly."""
    if len(params.lstm) != 1 or params.shared is None:
        raise ValueError("kernel supports lstm_layers=1 with a shared head")

    def pad_rows(x, rows, fill=0.0):
        pads = [(0, 0)] * x.ndim
        pads[-2] = (0, rows - x.shape[-2])
        return jnp.pad(x, pads, constant_values=fill)

    w1t = _t(jnp.pad(params.feat1.w, [(0, 0)] * (params.feat1.w.ndim - 2)
                     + [(0, 1), (0, 0)]))          # (..., F1, 8)
    b1t = _col(params.feat1.b)
    if mirror:
        # obs_a = M @ obs_b + e_y  =>  w1t @ obs_a = (w1t @ M) @ obs_b
        #                              + w1t[:, y]
        b1t = b1t + w1t[..., 1:2]
        w1t = jnp.einsum("...ik,kj->...ij", w1t, jnp.asarray(_MIRROR))
    lstm = params.lstm[0]
    return PackedQNetRNN(
        w1t=w1t,
        b1t=b1t,
        w2t=_t(params.feat2.w),
        b2t=_col(params.feat2.b),
        wght=jnp.concatenate([_t(lstm.w_ih), _t(lstm.w_hh)], axis=-1),
        bgt=_col(lstm.b_ih + lstm.b_hh),
        wst=_t(params.shared.w_mu),
        bst=_col(params.shared.b_mu),
        wat=pad_rows(_t(params.fc_a.w_mu), 8),
        bat=pad_rows(_col(params.fc_a.b_mu), 8, fill=NEG_BIG),
    )


def pack_rnn_sigma(params: QNetRNNParams) -> RNNSigma:
    def pad_rows(x, rows):
        pads = [(0, 0)] * x.ndim
        pads[-2] = (0, rows - x.shape[-2])
        return jnp.pad(x, pads)

    return RNNSigma(
        wst_sigma=_t(params.shared.w_sigma),
        bst_sigma=_col(params.shared.b_sigma),
        wat_sigma=pad_rows(_t(params.fc_a.w_sigma), 8),
        bat_sigma=pad_rows(_col(params.fc_a.b_sigma), 8),
    )


def _rnn_advantage(w, obs8, h, c, noisy_eff=None):
    """Transposed recurrent forward. Returns (adv (8, E), h', c').

    The input and recurrent LSTM projections run as ONE matmul over the
    stacked ``[f2; h]`` activations — ``wght`` is packed ``[w_ih | w_hh]``
    host-side, so the per-step cost is a single (4H, F+H) @ (F+H, E)."""
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    f1 = jnp.maximum(dot(w[0], obs8) + w[1], 0.0)
    f2 = jnp.maximum(dot(w[2], f1) + w[3], 0.0)
    gates = dot(w[4], jnp.concatenate([f2, h], axis=0)) + w[5]
    H = h.shape[0]
    gi = jax.nn.sigmoid(gates[0:H])
    gf = jax.nn.sigmoid(gates[H:2 * H])
    gg = jnp.tanh(gates[2 * H:3 * H])
    go = jax.nn.sigmoid(gates[3 * H:4 * H])
    c_new = gf * c + gi * gg
    h_new = go * jnp.tanh(c_new)
    if noisy_eff is None:
        ws, bs, wa, ba = w[6], w[7], w[8], w[9]
    else:
        ws, bs, wa, ba = noisy_eff
    s = jnp.maximum(dot(ws, h_new) + bs, 0.0)
    adv = dot(wa, s) + ba
    return adv, h_new, c_new


def _draw_noise(uniform, seed_mix, ctr, dims):
    """Per-step factorized learner noise: f(N(0,1)) rows/cols for the
    shared and advantage noisy layers (V head skipped)."""
    H, HH = dims
    u1 = uniform((8, 128), 1e-7, 1.0, seed_mix, ctr, 10)
    u2 = uniform((8, 128), 0.0, 1.0, seed_mix, ctr, 11)
    nr = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * np.pi * u2)
    rows = max(HH, 8)
    u3 = uniform((rows, 128), 1e-7, 1.0, seed_mix, ctr, 12)
    u4 = uniform((rows, 128), 0.0, 1.0, seed_mix, ctr, 13)
    nc = jnp.sqrt(-2.0 * jnp.log(u3)) * jnp.cos(2.0 * np.pi * u4)
    return (
        _scale_noise(nr[0:1, :H]),      # eps_in shared  (1, H)
        _scale_noise(nc[:HH, 0:1]),     # eps_out shared (HH, 1)
        _scale_noise(nr[1:2, :HH]),     # eps_in A       (1, HH)
        _scale_noise(nc[:8, 1:2]),      # eps_out A      (8, 1)
    )


def _draw_noise_batch(uniform, seed_mix, ctr, dims, n_steps):
    """All ``n_steps`` steps' factorized noise in four wide draws — same
    per-step shapes as :func:`_draw_noise` (128-lane slice j), but the
    Box-Muller transcendentals issue as ``n_steps``-wide VPU ops instead
    of one small op per step. Returns a per-step list of tuples."""
    H, HH = dims
    W = n_steps * 128
    u1 = uniform((8, W), 1e-7, 1.0, seed_mix, ctr, 10)
    u2 = uniform((8, W), 0.0, 1.0, seed_mix, ctr, 11)
    nr = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * np.pi * u2)
    # column noise via the full Box-Muller PAIR (cos+sin halves): half the
    # uniform draws and half the log/sqrt for the (128, W) normal block
    rows = max(HH, 8)
    half = max(rows // 2, 8)
    u3 = uniform((half, W), 1e-7, 1.0, seed_mix, ctr, 12)
    u4 = uniform((half, W), 0.0, 1.0, seed_mix, ctr, 13)
    r = jnp.sqrt(-2.0 * jnp.log(u3))
    a = 2.0 * np.pi * u4
    nc = jnp.concatenate([r * jnp.cos(a), r * jnp.sin(a)], axis=0)[:rows]
    nr = _scale_noise(nr)
    nc = _scale_noise(nc)
    out = []
    for j in range(n_steps):
        o = j * 128
        out.append((
            nr[0:1, o:o + H],           # eps_in shared  (1, H)
            nc[:HH, o:o + 1],           # eps_out shared (HH, 1)
            nr[1:2, o:o + HH],          # eps_in A       (1, HH)
            nc[:8, o + 1:o + 2],        # eps_out A      (8, 1)
        ))
    return out


def _one_step_rnn(params, cfg, member_range, uniform, seed_mix, epsilon,
                  lw, lsig, opp_refs, rows, hid, ctr, noise=None):
    """One recurrent env step on (1, E) rows + (H, E) hidden blocks.

    ``hid`` = (h_b, c_b, h_opp, c_opp). Returns (rows', hid', srow, emit).
    ``noise`` — optional pre-drawn per-step factorized noise tuple (the
    grid kernel batches all steps of a cell via _draw_noise_batch).
    """
    (bx, by, vx, vy, bot, top, sp, ret, sa, sb, bc, tt, opp) = rows
    h_b, c_b, h_opp, c_opp = hid
    E = bx.shape[1]
    row_f = (1, E)
    lo, hi = member_range
    H, HH = cfg["lstm_hidden_dim"], cfg["head_hidden_dim"]

    obs8 = obs8_from_rows(rows)                           # (8, E)

    # ---- bound opponent: only member slots present in this tile. With a
    # single stacked slot (empty pool — every gen-1 try and the headline
    # bench) the dynamic member loop is a Mosaic scheduling barrier for
    # one statically-known iteration: specialize it away.
    if cfg.get("n_slots", 0) == 1:
        ow = [r[0:1][0] for r in opp_refs]
        adv_0, h_opp_new, c_opp_new = _rnn_advantage(
            ow, obs8, h_opp, c_opp
        )
        act_a = _argmax3_rows(adv_0)
    else:
        def member_body(k, carry):
            act_a, h_n, c_n = carry
            ow = [r[pl.ds(k, 1)][0] for r in opp_refs]
            adv_k, h_k, c_k = _rnn_advantage(ow, obs8, h_opp, c_opp)
            m = opp == k                                  # (1, E)
            return (
                jnp.where(m, _argmax3_rows(adv_k), act_a),
                jnp.where(m, h_k, h_n),
                jnp.where(m, c_k, c_n),
            )

        act_a, h_opp_new, c_opp_new = jax.lax.fori_loop(
            lo, hi + 1, member_body,
            (jnp.zeros(row_f, jnp.int32), h_opp, c_opp),
        )

    # ---- learner: fresh factorized noise each step + epsilon-greedy;
    # hidden advances on explore steps too (ref :371-389)
    if noise is None:
        noise = _draw_noise(uniform, seed_mix, ctr, (H, HH))
    e_in_s, e_out_s, e_in_a, e_out_a = noise
    ws_eff = lw[6] + lsig[0] * (e_out_s * e_in_s)
    bs_eff = lw[7] + lsig[1] * e_out_s
    wa_eff = lw[8] + lsig[2] * (e_out_a * e_in_a)
    ba_eff = lw[9] + lsig[3] * e_out_a
    ba_eff = jnp.where(ba_eff < NEG_BIG * 0.5, NEG_BIG, ba_eff)
    adv_b, h_b_new, c_b_new = _rnn_advantage(
        lw, obs8, h_b, c_b, (ws_eff, bs_eff, wa_eff, ba_eff)
    )
    greedy_b = _argmax3_rows(adv_b)
    u_expl = uniform(row_f, 0.0, 1.0, seed_mix, ctr, 5)
    rand_a = uniform(row_f, 0.0, 3.0, seed_mix, ctr, 6).astype(jnp.int32)
    act_b = jnp.where(u_expl < epsilon, jnp.clip(rand_a, 0, 2), greedy_b)

    rows_new, srow, emit = _env_transition(
        params, cfg, uniform, seed_mix, rows, ctr, act_a, act_b, obs8
    )

    # zero both streams on episode boundary (new episode, fresh memory)
    done = emit[4] > 0                                    # (1, E)
    hid_new = tuple(
        jnp.where(done, 0.0, x)
        for x in (h_b_new, c_b_new, h_opp_new, c_opp_new)
    )
    return rows_new, hid_new, srow, emit


def _hid_from_block(blk, H):
    return (blk[0:H], blk[H:2 * H], blk[2 * H:3 * H], blk[3 * H:4 * H])


def _block_from_hid(hid):
    return jnp.concatenate(hid, axis=0)


def _rnn_kernel_grid(params: EnvParams, cfg, use_tpu_prng: bool,
                     scalar_ref, *refs):
    """Time-as-grid training kernel: grid (env_tiles, steps // spc), spc
    steps statically unrolled per cell; state/hidden/stats blocks are
    revisited across the t axis (VMEM-resident), transition slabs are
    written per cell at static step indices."""
    i = 0
    f_ref = refs[i]; i += 1
    i_ref = refs[i]; i += 1
    hid_ref = refs[i]; i += 1
    learner_refs = refs[i:i + 10]; i += 10
    sigma_refs = refs[i:i + 4]; i += 4
    opp_refs = refs[i:i + 10]; i += 10
    out_f_ref = refs[i]; i += 1
    out_i_ref = refs[i]; i += 1
    out_hid_ref = refs[i]; i += 1
    tr_obs_ref = refs[i]; i += 1     # block (spc, 8, E) at (t, 0, i)
    tr_act_ref = refs[i]; i += 1     # block (spc, E) at (t, i)
    tr_rew_ref = refs[i]; i += 1
    tr_done_ref = refs[i]; i += 1
    stats_ref = refs[i]; i += 1      # block (8, E) revisited

    tb = pl.program_id(1)
    tile = pl.program_id(0)
    # gtile = tile id in the GLOBAL env batch (shard_map passes tile0 =
    # axis_index * local_tile_count) — keeps PRNG streams identical to
    # the single-device program; see ops/actor_rollout.py
    gtile = scalar_ref[3] + tile
    if use_tpu_prng:
        pltpu.prng_seed(scalar_ref[0], gtile * pl.num_programs(1) + tb)
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
    member_range = (scalar_ref[4 + tile], scalar_ref[4 + n_tiles + tile])

    @pl.when(tb == 0)
    def _():
        out_f_ref[:] = f_ref[:]
        out_i_ref[:] = i_ref[:]
        out_hid_ref[:] = hid_ref[:]
        stats_ref[:] = jnp.zeros_like(stats_ref)

    lw = [r[:] for r in learner_refs]
    lsig = [r[:] for r in sigma_refs]
    H = cfg["lstm_hidden_dim"]
    HH = cfg["head_hidden_dim"]
    spc = cfg["steps_per_cell"]
    rows = _rows_from_blocks(out_f_ref[:], out_i_ref[:])
    hid = _hid_from_block(out_hid_ref[:], H)
    stats = stats_ref[:]
    noise_steps = _draw_noise_batch(
        uniform, seed_mix, jnp.int32(0), (H, HH), spc
    )
    for j in range(spc):
        rows, hid, srow, emit = _one_step_rnn(
            params, cfg, member_range, uniform, seed_mix, epsilon,
            lw, lsig, opp_refs, rows, hid, jnp.int32(j * 16),
            noise=noise_steps[j],
        )
        obs8, _next8, act_b, reward_b, done_i = emit
        stats = stats + srow
        tr_obs_ref[j] = obs8
        tr_act_ref[j:j + 1, :] = act_b
        tr_rew_ref[j:j + 1, :] = reward_b
        tr_done_ref[j:j + 1, :] = done_i
    f_blk, i_blk = _blocks_from_rows(rows)
    out_f_ref[:] = f_blk
    out_i_ref[:] = i_blk
    out_hid_ref[:] = _block_from_hid(hid)
    stats_ref[:] = stats


def _rnn_kernel(params: EnvParams, cfg, use_tpu_prng: bool,
                scalar_ref, *refs):
    """Single-program fori variant: interpreter mode (the interpreter
    re-executes grid-form kernels per cell — pathological on CPU) and
    no-transitions eval mode."""
    steps = cfg["steps"]
    i = 0
    f_ref = refs[i]; i += 1
    i_ref = refs[i]; i += 1
    hid_ref = refs[i]; i += 1
    learner_refs = refs[i:i + 10]; i += 10
    sigma_refs = refs[i:i + 4]; i += 4
    opp_refs = refs[i:i + 10]; i += 10
    out_f_ref = refs[i]; i += 1
    out_i_ref = refs[i]; i += 1
    out_hid_ref = refs[i]; i += 1
    if cfg["emit_transitions"]:
        tr_obs_ref = refs[i]; i += 1     # (steps, 8, E)
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
    member_range = (scalar_ref[4 + tile], scalar_ref[4 + n_tiles + tile])
    lw = [r[:] for r in learner_refs]
    lsig = [r[:] for r in sigma_refs]
    H = cfg["lstm_hidden_dim"]

    def body(t, carry):
        rows, hid, stats = carry
        rows, hid, srow, emit = _one_step_rnn(
            params, cfg, member_range, uniform, seed_mix, epsilon,
            lw, lsig, opp_refs, rows, hid, t * jnp.int32(16),
        )
        if cfg["emit_transitions"]:
            obs8, _next8, act_b, reward_b, done_i = emit
            tr_obs_ref[pl.ds(t, 1)] = obs8[None]
            tr_act_ref[pl.ds(t, 1), :] = act_b
            tr_rew_ref[pl.ds(t, 1), :] = reward_b
            tr_done_ref[pl.ds(t, 1), :] = done_i
        return rows, hid, stats + srow

    E = f_ref.shape[1]
    rows0 = _rows_from_blocks(f_ref[:], i_ref[:])
    hid0 = _hid_from_block(hid_ref[:], H)
    stats0 = jnp.zeros((8, E), jnp.float32)
    rows_fin, hid_fin, stats_fin = jax.lax.fori_loop(
        0, steps, body, (rows0, hid0, stats0)
    )
    f_blk, i_blk = _blocks_from_rows(rows_fin)
    out_f_ref[:] = f_blk
    out_i_ref[:] = i_blk
    out_hid_ref[:] = _block_from_hid(hid_fin)
    stats_ref[:] = stats_fin


def pallas_recurrent_rollout(
    env_params: EnvParams,
    state: EnvState,            # batched (B,)
    opp_idx: jax.Array,         # (B,) i32
    ep_return: jax.Array,       # (B,) f32
    hid: jax.Array,             # (4H, B): [h_b; c_b; h_opp; c_opp]
    learner: PackedQNetRNN,     # single net (unmirrored)
    sigma: RNNSigma,            # learner noisy sigmas
    opponents: PackedQNetRNN,   # stacked (K+1, ...), mirror-folded
    *,
    seed: jax.Array,
    epsilon: jax.Array,
    steps: int,
    max_episode_steps: int = 0,
    tile_rows: int = 512,       # envs per kernel program (multiple of 128)
    interpret: bool = None,
    emit_transitions: bool = True,
    steps_per_cell: int = 8,    # grid-variant inner unroll (the (spc, E)
                                # transition slabs need spc % 8 == 0)
    tile0: jax.Array | int = 0, # global index of this call's first tile
                                # (shard_map: axis_index * local tiles)
):
    """Returns (new_state, new_opp_idx, new_ep_return, new_hid,
    transitions, stat_counts, ret_sum, ended). Same contract as
    ``pallas_actor_rollout`` plus the packed hidden block: callers pass
    envs SORTED by ``opp_idx`` and re-bind (zeroing the opponent stream
    rows of ``hid``) at chunk boundaries for envs flagged ``ended``."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    params = _static_params(env_params)
    B = state.ball_x.shape[0]
    E = tile_rows
    if B % E:
        raise ValueError(f"batch {B} must be a multiple of {E}")
    H4 = hid.shape[0]
    H = H4 // 4
    HH = learner.wst.shape[0]
    n_tiles = B // E
    opp_by_tile = opp_idx.reshape(n_tiles, E)
    tile_lo = jnp.min(opp_by_tile, axis=1).astype(jnp.int32)
    tile_hi = jnp.max(opp_by_tile, axis=1).astype(jnp.int32)

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
                   jnp.int32(0), jnp.int32(tile0)]),
        tile_lo, tile_hi,
    ]).astype(jnp.int32)

    f32, i32 = jnp.float32, jnp.int32
    sds = jax.ShapeDtypeStruct
    cfg = {"steps": steps, "max_episode_steps": int(max_episode_steps),
           "emit_transitions": bool(emit_transitions),
           "steps_per_cell": int(steps_per_cell),
           "lstm_hidden_dim": int(H), "head_hidden_dim": int(HH),
           "n_slots": int(opponents.w1t.shape[0])}

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    if emit_transitions and not interpret:
        spc = steps_per_cell
        if steps % spc:
            raise ValueError(f"steps ({steps}) must be a multiple of {spc}")
        grid = (n_tiles, steps // spc)
        rb = lambda rows_n: pl.BlockSpec(
            (rows_n, E), lambda i, t: (0, i), memory_space=pltpu.VMEM
        )
        slab3 = pl.BlockSpec((spc, 8, E), lambda i, t: (t, 0, i),
                             memory_space=pltpu.VMEM)
        slab2 = pl.BlockSpec((spc, E), lambda i, t: (t, i),
                             memory_space=pltpu.VMEM)
        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [rb(F_ROWS), rb(I_ROWS), rb(H4)]
            + [full()] * 24
        )
        out_specs = [
            rb(F_ROWS), rb(I_ROWS), rb(H4),
            slab3, slab2, slab2, slab2,
            rb(8),
        ]
        out_shape = [
            sds((F_ROWS, B), f32), sds((I_ROWS, B), i32), sds((H4, B), f32),
            sds((steps, 8, B), f32),
            sds((steps, B), i32), sds((steps, B), f32),
            sds((steps, B), i32),
            sds((8, B), f32),
        ]
        kernel = functools.partial(_rnn_kernel_grid, params, cfg,
                                   not interpret)
    else:
        grid = (n_tiles,)
        rb = lambda rows_n: pl.BlockSpec(
            (rows_n, E), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        t_block3 = pl.BlockSpec((steps, 8, E), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)
        t_block2 = pl.BlockSpec((steps, E), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [rb(F_ROWS), rb(I_ROWS), rb(H4)]
            + [full()] * 24
        )
        if emit_transitions:
            out_specs = [
                rb(F_ROWS), rb(I_ROWS), rb(H4),
                t_block3, t_block2, t_block2, t_block2,
                rb(8),
            ]
            out_shape = [
                sds((F_ROWS, B), f32), sds((I_ROWS, B), i32),
                sds((H4, B), f32),
                sds((steps, 8, B), f32),
                sds((steps, B), i32), sds((steps, B), f32),
                sds((steps, B), i32),
                sds((8, B), f32),
            ]
        else:
            out_specs = [rb(F_ROWS), rb(I_ROWS), rb(H4), rb(8)]
            out_shape = [
                sds((F_ROWS, B), f32), sds((I_ROWS, B), i32),
                sds((H4, B), f32), sds((8, B), f32),
            ]
        kernel = functools.partial(_rnn_kernel, params, cfg, not interpret)

    # Alias the env-state/hidden inputs onto their outputs: the kernel
    # copies in->out at the first grid cell and never reads the input
    # again, so in/out can share one VMEM window — saving ~2.1MB at
    # E=1024 (the margin that used to OOM the Mosaic scoped-vmem stack
    # for tiles > 512). Unlike the PER-plane trap (docs/PERF.md), F, I
    # and hid are freshly packed intermediates of THIS jit — never
    # bitcast views of donated train-state buffers.
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={1: 0, 2: 1, 3: 2},
        interpret=interpret,
    )(scalars, F, I, hid, *learner, *sigma, *opponents)

    if emit_transitions:
        (F_out, I_out, hid_out, tr_obs, tr_act, tr_rew, tr_done,
         stats) = outs
    else:
        F_out, I_out, hid_out, stats = outs
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
        # next_obs is not emitted: the sequence ring derives it from obs
        # at sample time (replay/sequence.py::SeqSample)
        transitions = {
            "obs": jnp.swapaxes(tr_obs, 1, 2)[..., :7],
            "action": tr_act,
            "reward": tr_rew,
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
    return (new_state, I_out[IOPP], F_out[FRET], hid_out, transitions,
            stat_counts, ret_sum, ended)
