"""Pallas TPU kernel: fused DQN update block — PER sampling + K SGD steps
in one program.

The XLA update scan (``train/dqn.py::_update``) costs ~95us per update on
v5e: each of the K serialized Double-DQN steps dispatches dozens of small
kernels (two-level CDF sample, row gather, dual-net forward, backward,
Adam, priority write-back) whose per-op launch latency — not FLOPs — is
the wall-clock. This kernel runs the ENTIRE block as ONE program. Unlike
the DRQN sibling (:mod:`pingpong_tpu.ops.drqn_update`), the minibatches
cannot be pre-drawn outside: PER feeds every update's TD errors back into
the sampling distribution, so the sampler itself lives in the kernel:

* ``p_alpha`` stays VMEM-resident as a ``(S, 128, 128)`` plane
  ``[super, chunk lane, slot lane]`` (4MB at the 2^20-slot default)
  across all K updates; ``chunk_sums`` as ``(S, 128)``;
* the inverse-CDF search is THREE-level so every stage is a dense VPU/MXU
  op: super-sums (one matmul) -> super cumsum (triangular matmul) ->
  broadcast-compare, then the same within the super row and within the
  chunk row — no gather, no searchsorted loop. Same distribution as
  ``replay/per.py::per_sample``; f32 association differs only at
  cumulative-sum boundaries. The search matmuls run at
  ``Precision.HIGHEST`` (see ``_mm_hi``);
* transition DATA stays in HBM in a chunk-block layout ``(NC, R, 128)``
  (R = 2*obs_dim+2 packed fields; see ``replay/per.py`` block mode) and
  each sampled chunk is fetched with one async copy, issued before the
  within-chunk offset search so the flight time hides under the sampling
  tail; ONE wait descriptor spanning all bs chunks collects them;
* priority write-back is a sequential read-modify-write loop over the
  sampled slots: later duplicates win (exactly the reference's
  last-writer-wins loop); every chunk sum is then refreshed EXACTLY with
  one full-plane lane reduce — tighter than the XLA path's incremental
  deltas and off the sequential loop;
* raw priorities are NOT carried in VMEM (they only feed the max-priority
  stamp at push time): the kernel emits each update's ``(indices, new_p)``
  and the caller replays them into ``prios`` with one dedup-scatter off
  the serial chain.

Optimizer semantics are bit-compatible with the XLA path's flat
``optax.adam`` on the raveled vector (elementwise Adam == flat Adam);
``train_heads_only`` skips the feature backward entirely, which equals the
0/1 grad mask because masked moments start at zero and stay zero.

Reference semantics source: ``/root/reference/scripts/train_iterative.py``
:49-76 (PER), :132-168 (update step).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pingpong_tpu.models.qnet import QNetNoise, QNetParams

LANE = 128


class UpdQParams(NamedTuple):
    """Transposed QNet tensors (padded). Pads: obs col 7 of ``w1t``,
    V rows 1-7, A rows 3-7 — zero inputs => zero grads => zero Adam
    updates, so pads stay exactly zero through training."""

    w1t: jax.Array       # (H, 8)   feat1.T, col 7 pad
    b1t: jax.Array       # (H, 1)
    w2t: jax.Array       # (H, H)   feat2.T
    b2t: jax.Array       # (H, 1)
    wvt_mu: jax.Array    # (8, H)   V head, row 0 real
    wvt_sig: jax.Array   # (8, H)
    bvt_mu: jax.Array    # (8, 1)
    bvt_sig: jax.Array   # (8, 1)
    wat_mu: jax.Array    # (8, H)   A head, rows 0-2 real
    wat_sig: jax.Array   # (8, H)
    bat_mu: jax.Array    # (8, 1)
    bat_sig: jax.Array   # (8, 1)


class UpdQNoise(NamedTuple):
    """Per-update transposed factorized noise (leading K axis)."""

    evt_w: jax.Array     # (K, 8, H)
    evt_b: jax.Array     # (K, 8, 1)
    eat_w: jax.Array     # (K, 8, H)
    eat_b: jax.Array     # (K, 8, 1)


def pack_dqn_params(p: QNetParams) -> UpdQParams:
    """QNetParams -> transposed/padded kernel tensors."""
    h = p.feat1.w.shape[1]
    obs_dim = p.feat1.w.shape[0]

    def pad_rows(x):
        return jnp.zeros((8, x.shape[1]), x.dtype).at[: x.shape[0]].set(x)

    w1t = jnp.zeros((h, 8), jnp.float32).at[:, :obs_dim].set(p.feat1.w.T)
    return UpdQParams(
        w1t=w1t,
        b1t=p.feat1.b[:, None],
        w2t=p.feat2.w.T,
        b2t=p.feat2.b[:, None],
        wvt_mu=pad_rows(p.fc_v.w_mu.T),
        wvt_sig=pad_rows(p.fc_v.w_sigma.T),
        bvt_mu=pad_rows(p.fc_v.b_mu[:, None]),
        bvt_sig=pad_rows(p.fc_v.b_sigma[:, None]),
        wat_mu=pad_rows(p.fc_a.w_mu.T),
        wat_sig=pad_rows(p.fc_a.w_sigma.T),
        bat_mu=pad_rows(p.fc_a.b_mu[:, None]),
        bat_sig=pad_rows(p.fc_a.b_sigma[:, None]),
    )


def unpack_dqn_params(u: UpdQParams, template: QNetParams) -> QNetParams:
    """Kernel tensors -> QNetParams with the template's shapes."""
    obs_dim = template.feat1.w.shape[0]
    n_act = template.fc_a.w_mu.shape[1]
    return QNetParams(
        feat1=template.feat1._replace(w=u.w1t[:, :obs_dim].T, b=u.b1t[:, 0]),
        feat2=template.feat2._replace(w=u.w2t.T, b=u.b2t[:, 0]),
        fc_v=template.fc_v._replace(
            w_mu=u.wvt_mu[:1].T, w_sigma=u.wvt_sig[:1].T,
            b_mu=u.bvt_mu[:1, 0], b_sigma=u.bvt_sig[:1, 0],
        ),
        fc_a=template.fc_a._replace(
            w_mu=u.wat_mu[:n_act].T, w_sigma=u.wat_sig[:n_act].T,
            b_mu=u.bat_mu[:n_act, 0], b_sigma=u.bat_sig[:n_act, 0],
        ),
    )


def pack_dqn_noise(noise_all: QNetNoise) -> UpdQNoise:
    """(K,)-stacked QNetNoise -> transposed kernel tensors."""

    def pad_mid(x):
        k, n, h = x.shape
        return jnp.zeros((k, 8, h), x.dtype).at[:, :n].set(x)

    tr = lambda x: jnp.swapaxes(x, 1, 2)
    return UpdQNoise(
        evt_w=pad_mid(tr(noise_all.v.eps_w)),
        evt_b=pad_mid(noise_all.v.eps_b[:, :, None]),
        eat_w=pad_mid(tr(noise_all.a.eps_w)),
        eat_b=pad_mid(noise_all.a.eps_b[:, :, None]),
    )


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _mm_hi(a, b):
    """Full-f32 matmul (MXU 6-pass). The inverse-CDF search matmuls need
    this: they implement EXACT cumulative sums whose compare boundaries
    become sample indices — Mosaic's default single-pass bf16 matmul has
    an 8-bit mantissa, and once priorities pick up fractional parts the
    ~O(10) absolute error on ~1e4-sized cumsums shifts sampled slots by
    dozens of lanes (found on v5e: k=0 exact — all-power-of-two sums are
    bf16-exact — then diverging every later update)."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _mm_tn(a, b):
    """a @ b.T with f32 accumulation."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _mm_nt(a, b):
    """a.T @ b — dot over the row (sublane) axes."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _rowsum(x):
    return jnp.sum(x, axis=1, keepdims=True)


def _tri(n):
    """(n, n) lower-inclusive triangle: cumsum-as-matmul operand."""
    kk = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (kk <= jj).astype(jnp.float32)


def _update_kernel(
    # refs -----------------------------------------------------------------
    sc_ref,            # (1, 4) i32 SMEM — [train_steps0, adam_count0,
                       #                    frame0, size]
    u_ref,             # (1, BS, 1) f32 block — this update's uniforms
    noise_ref,         # UpdQNoise pytree of (1, ...) blocks
    pa_in,             # (S, 128, 128) f32 — p_alpha plane [super, chunk
                       #   lane, slot lane]; 3D so the per-update exact
                       #   chunk-sum refresh is ONE lane reduce
    cs_in,             # (S, 128) f32 — chunk sums
    online_in,         # UpdQParams
    target_in,
    m_in,
    v_in,
    data_hbm,          # (NC, R, 128) f32, HBM-resident transition blocks
    pa_ref,            # state outputs: initialized from the *_in refs at
    cs_ref,            #   k==0, then persist across the sequential K-grid
                       #   (const-index revisiting). NOT input/output-
                       #   aliased: the inputs are (bitcasts of) the
                       #   caller's DONATED train-state buffers, and
                       #   aliasing pallas outputs onto donated entry
                       #   buffers corrupted the plane under jit donation
                       #   on v5e — fresh output buffers are airtight.
    online_out,
    target_out,
    m_out,
    v_out,
    newp_ref,          # (K, BS) f32 — per-update new priorities (row k)
    idx_ref,           # (K, BS) i32 — per-update sampled slots (row k)
    losses_ref,        # (1, K) f32 SMEM
    ts_out,            # (1, 1) i32 SMEM
    # scratch ----------------------------------------------------------------
    dat_s,             # (BS, R, 128) f32 — DMA'd chunk blocks
    rows_s,            # (BS, 128) f32 — sampled chunks' p_alpha rows
    cvec_s,            # (BS, 1) i32 — chunk indices (VMEM staging)
    idx_smem,          # (BS, 1) i32 SMEM — chunk indices for scalar loops
    ohv_s,             # (BS, 128) f32 — within-chunk one-hot rows
    newp_s,            # (BS, 1) f32
    newpa_s,           # (BS, 1) f32
    sem_d,             # DMA semaphore (chunk fetches)
    sem_s,             # DMA semaphore (VMEM->SMEM index copy)
    *,
    H: int,
    R: int,
    K: int,
    bs: int,
    lr: float,
    gamma: float,
    interval: int,
    tau: float,
    alpha: float,
    per_eps: float,
    beta_start: float,
    beta_frames: int,
    heads_only: bool,
    b1: float,
    b2: float,
    eps: float,
):
    S = cs_in.shape[0]
    B2 = 2 * bs
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init_state():
        pa_ref[...] = pa_in[...]
        cs_ref[...] = cs_in[...]
        for dst_tree, src_tree in (
            (online_out, online_in), (target_out, target_in),
            (m_out, m_in), (v_out, v_in),
        ):
            for dst, src in zip(dst_tree, src_tree):
                dst[...] = src[...]

    ts0 = sc_ref[0, 0]
    count0 = sc_ref[0, 1]
    frame0 = sc_ref[0, 2]
    size = sc_ref[0, 3]

    # ---- three-level inverse-CDF PER sample -----------------------------
    u = u_ref[0]                                        # (BS, 1)
    cs = cs_ref[...]                                    # (S, 128)
    ones = jnp.ones((LANE, 1), jnp.float32)
    r = jax.lax.dot_general(                            # (1, S) super sums
        ones, cs, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    cdf_s = _mm_hi(r, _tri(S))                          # (1, S) incl. cumsum
    total = cdf_s[0:1, S - 1:S]
    uu = u * total                                      # (BS, 1)
    sidx = jnp.sum((cdf_s < uu).astype(jnp.int32), axis=1, keepdims=True)
    sidx = jnp.clip(sidx, 0, S - 1)
    oh_s = (jax.lax.broadcasted_iota(jnp.int32, (bs, S), 1)
            == sidx).astype(jnp.float32)
    crows = _mm_hi(oh_s, cs)                            # (BS, 128)
    ecdf = _rowsum(oh_s * (cdf_s - r))                  # excl. super cdf
    resid = uu - ecdf
    tri128 = _tri(LANE)
    lcdf = _mm_hi(crows, tri128)                        # (BS, 128)
    c2 = jnp.clip(
        jnp.sum((lcdf < resid).astype(jnp.int32), axis=1, keepdims=True),
        0, LANE - 1,
    )
    cidx = sidx * LANE + c2                             # (BS, 1) chunk ids
    # size is a multiple of 128 in block mode, so clipping the CHUNK id is
    # the XLA path's clip(idx, 0, size-1) (only reachable via f32
    # boundary rounding; zero-padded tails make overshoot measure-zero)
    cidx = jnp.minimum(cidx, size // LANE - 1)

    # ---- stage chunk ids to SMEM; issue data DMAs + gather pa rows ------
    cvec_s[...] = cidx
    cp = pltpu.make_async_copy(cvec_s, idx_smem, sem_s)
    cp.start()
    cp.wait()

    def fetch_body(i, _):
        ci = idx_smem[i, 0]
        pltpu.make_async_copy(
            data_hbm.at[pl.ds(ci, 1), :, :],
            dat_s.at[pl.ds(i, 1), :, :],
            sem_d,
        ).start()
        rows_s[pl.ds(i, 1), :] = pa_ref[ci // LANE, pl.ds(ci % LANE, 1), :]
        return 0

    jax.lax.fori_loop(0, bs, fetch_body, 0, unroll=bs)

    # within-chunk offset search (overlaps the DMA flight time)
    rcdf = _mm_hi(rows_s[...], tri128)
    oh_c2 = (jax.lax.broadcasted_iota(jnp.int32, (bs, LANE), 1)
             == c2).astype(jnp.float32)
    resid2 = resid - _rowsum(oh_c2 * (lcdf - crows))    # excl. chunk cdf
    off = jnp.clip(
        jnp.sum((rcdf < resid2).astype(jnp.int32), axis=1, keepdims=True),
        0, LANE - 1,
    )
    idx = cidx * LANE + off                             # (BS, 1) slot ids
    oh_off = (jax.lax.broadcasted_iota(jnp.int32, (bs, LANE), 1)
              == off).astype(jnp.float32)

    # ---- importance weights (ref: (N*P(i))^-beta, max-normalized) -------
    pa_val = _rowsum(oh_off * rows_s[...])              # (BS, 1)
    probs = pa_val / jnp.maximum(total, 1e-30)
    frame = (frame0 + k + 1).astype(jnp.float32)
    beta = jnp.minimum(
        1.0, beta_start + frame * ((1.0 - beta_start) / beta_frames)
    )
    n_f = size.astype(jnp.float32)
    w_raw = jnp.exp(-beta * jnp.log(n_f * jnp.maximum(probs, 1e-30)))
    w = w_raw / jnp.maximum(jnp.max(w_raw), 1e-30)      # (BS, 1)

    # ONE wait for all bs chunk fetches: the DMA semaphore accumulates
    # each copy's size, and a descriptor spanning bs chunks waits for
    # exactly the sum of the bs single-chunk copies issued above
    pltpu.make_async_copy(
        data_hbm.at[pl.ds(0, bs), :, :], dat_s, sem_d
    ).wait()

    # ---- unpack transitions: lane `off` of each fetched chunk -----------
    d = (R - 2) // 2
    ext = jnp.sum(dat_s[...] * oh_off.reshape(bs, 1, LANE), axis=2)
    extT = jnp.transpose(ext, (1, 0))                   # (R, BS)
    zrow = jnp.zeros((1, bs), jnp.float32)
    obs8 = jnp.concatenate([extT[0:d], zrow], axis=0)   # (8, BS)
    nxt8 = jnp.concatenate([extT[d:2 * d], zrow], axis=0)
    xt = jnp.concatenate([obs8, nxt8], axis=1)          # (8, B2)
    rew = extT[2 * d:2 * d + 1]                         # (1, BS)
    ad = extT[2 * d + 1:2 * d + 2]                      # act + 4*done
    done = (ad > 3.5).astype(jnp.float32)
    act = ad - 4.0 * done

    # ---- online fused forward (obs‖next) with this update's noise -------
    O = online_out
    f1 = jnp.maximum(_mm(O.w1t[...], xt) + O.b1t[...], 0.0)    # (H, B2)
    f2 = jnp.maximum(_mm(O.w2t[...], f1) + O.b2t[...], 0.0)    # (H, B2)
    wv = O.wvt_mu[...] + O.wvt_sig[...] * noise_ref.evt_w[0]
    bv = O.bvt_mu[...] + O.bvt_sig[...] * noise_ref.evt_b[0]
    wa = O.wat_mu[...] + O.wat_sig[...] * noise_ref.eat_w[0]
    ba = O.bat_mu[...] + O.bat_sig[...] * noise_ref.eat_b[0]
    v8 = _mm(wv, f2) + bv                               # (8, B2), row 0 real
    a8 = _mm(wa, f2) + ba                               # rows 0-2 real
    a_mean = (a8[0:1] + a8[1:2] + a8[2:3]) / 3.0
    q8 = v8[0:1] + a8 - a_mean                          # rows 0-2 = Q
    q_s = q8[:, :bs]
    q_ns = q8[:, bs:]

    # ---- target forward, mu-only, next half only ------------------------
    Tg = target_out
    f1t = jnp.maximum(_mm(Tg.w1t[...], nxt8) + Tg.b1t[...], 0.0)
    f2t = jnp.maximum(_mm(Tg.w2t[...], f1t) + Tg.b2t[...], 0.0)
    v8t = _mm(Tg.wvt_mu[...], f2t) + Tg.bvt_mu[...]
    a8t = _mm(Tg.wat_mu[...], f2t) + Tg.bat_mu[...]
    q_t = v8t[0:1] + a8t - (a8t[0:1] + a8t[1:2] + a8t[2:3]) / 3.0

    # ---- Double-DQN TD + IS-weighted MSE --------------------------------
    na0 = (q_ns[1:2] > q_ns[0:1]).astype(jnp.float32)
    na = jnp.where(q_ns[2:3] > jnp.maximum(q_ns[0:1], q_ns[1:2]), 2.0, na0)
    sel = lambda q, i: (
        q[0:1] * (i == 0.0) + q[1:2] * (i == 1.0) + q[2:3] * (i == 2.0)
    )
    nq = sel(q_t, na)
    q_a = sel(q_s, act)
    y = rew + gamma * nq * (1.0 - done)
    td = q_a - y                                        # (1, BS)
    wl = jnp.transpose(w, (1, 0))                       # (1, BS)
    loss = jnp.sum(wl * td * td) * (1.0 / bs)
    losses_ref[0, k] = loss

    # ---- backward ---------------------------------------------------------
    dq_a = (2.0 / bs) * wl * td                         # (1, BS)
    zeros_b = jnp.zeros((1, bs), jnp.float32)
    row = lambda j: jnp.concatenate(
        [dq_a * (act == float(j)), zeros_b], axis=1
    )
    dq_rows = [row(0), row(1), row(2)]
    dq_sum = dq_rows[0] + dq_rows[1] + dq_rows[2]       # (1, B2) == dV
    pad5 = jnp.zeros((5, B2), jnp.float32)
    da8 = jnp.concatenate(
        [dq_rows[0] - dq_sum / 3.0, dq_rows[1] - dq_sum / 3.0,
         dq_rows[2] - dq_sum / 3.0, pad5], axis=0
    )
    dv8 = jnp.concatenate(
        [dq_sum, jnp.zeros((7, B2), jnp.float32)], axis=0
    )

    dwv_mu = _mm_tn(dv8, f2)                            # (8, H)
    dbv = _rowsum(dv8)
    dwa_mu = _mm_tn(da8, f2)
    dba = _rowsum(da8)

    if heads_only:
        zf = jnp.zeros
        dw1 = zf((H, 8), jnp.float32)
        db1 = zf((H, 1), jnp.float32)
        dw2 = zf((H, H), jnp.float32)
        db2 = zf((H, 1), jnp.float32)
    else:
        df2 = _mm_nt(wv, dv8) + _mm_nt(wa, da8)         # (H, B2)
        dz2 = df2 * (f2 > 0.0)
        dw2 = _mm_tn(dz2, f1)
        db2 = _rowsum(dz2)
        df1 = _mm_nt(O.w2t[...], dz2)
        dz1 = df1 * (f1 > 0.0)
        dw1 = _mm_tn(dz1, xt)
        db1 = _rowsum(dz1)

    grads = UpdQParams(
        w1t=dw1, b1t=db1, w2t=dw2, b2t=db2,
        wvt_mu=dwv_mu, wvt_sig=dwv_mu * noise_ref.evt_w[0],
        bvt_mu=dbv, bvt_sig=dbv * noise_ref.evt_b[0],
        wat_mu=dwa_mu, wat_sig=dwa_mu * noise_ref.eat_w[0],
        bat_mu=dba, bat_sig=dba * noise_ref.eat_b[0],
    )

    # ---- Adam (== flat optax.adam; no clip in the DQN chain) -----------
    step = (count0 + k + 1).astype(jnp.float32)
    # Mosaic has no scalar powf: b^t == exp(t*log b), log b static
    bc1 = 1.0 - jnp.exp(step * math.log(b1))
    bc2 = 1.0 - jnp.exp(step * math.log(b2))
    sync = ((ts0 + k + 1) % interval) == 0
    feature_leaves = (0, 1, 2, 3)                       # w1t b1t w2t b2t
    for j, g in enumerate(grads):
        frozen = heads_only and j in feature_leaves
        if not frozen:
            # masked-grad XLA equivalence note: frozen leaves' moments are
            # zero at opt init and zero grads keep them zero, so skipping
            # the whole Adam step equals the 0/1 grad mask
            mj = m_out[j][...] * b1 + g * (1.0 - b1)
            vj = v_out[j][...] * b2 + g * g * (1.0 - b2)
            m_out[j][...] = mj
            v_out[j][...] = vj
            upd = (mj / bc1) / (jnp.sqrt(vj / bc2) + eps)
            p_new = online_out[j][...] - lr * upd
            online_out[j][...] = p_new
        else:
            p_new = online_out[j][...]
        if tau > 0.0:
            target_out[j][...] = (
                target_out[j][...] + tau * (p_new - target_out[j][...])
            )
        else:
            target_out[j][...] = jnp.where(sync, p_new, target_out[j][...])

    # ---- priority write-back (sequential => exact last-writer-wins) -----
    newp = jnp.abs(td) + per_eps                        # (1, BS)
    newp_ref[pl.ds(k, 1), :] = newp
    idx_ref[pl.ds(k, 1), :] = jnp.transpose(idx, (1, 0))
    newp_s[...] = jnp.transpose(newp, (1, 0))
    # newp > 0 strictly (>= per_eps), so log is safe
    newpa_s[...] = jnp.exp(alpha * jnp.log(newp_s[...]))
    ohv_s[...] = oh_off

    def rmw_body(i, _):
        ci = idx_smem[i, 0]
        ohrow = ohv_s[pl.ds(i, 1), :]                   # (1, 128)
        npa = newpa_s[pl.ds(i, 1), :]                   # (1, 1)
        si = ci // LANE
        li = ci % LANE
        parow = pa_ref[si, pl.ds(li, 1), :]
        pa_ref[si, pl.ds(li, 1), :] = jnp.where(ohrow > 0.0, npa, parow)
        return 0

    jax.lax.fori_loop(0, bs, rmw_body, 0, unroll=bs)
    # refresh ALL chunk sums EXACTLY with one lane reduce over the fresh
    # plane — cheaper than per-sample masked row-sum RMWs on cs, and
    # self-correcting vs the XLA path's incremental deltas
    cs_ref[...] = jnp.sum(pa_ref[...], axis=2)
    ts_out[0, 0] = ts0 + K


def supports_pallas_dqn_update(cfg) -> bool:
    """Shapes the fused kernel handles; callers fall back to the XLA path
    otherwise. Requirements: lane-aligned batch, a chunk-block ring
    (capacity % 128^2 == 0 so chunk_sums reshape to (S, 128)), a VMEM
    budget for the p_alpha plane (capacity <= 2^20 slots -> 4MB), and
    aligned block pushes (one rollout chunk divides capacity)."""
    m = cfg.num_envs * cfg.rollout_length
    return (
        cfg.batch_size % LANE == 0
        and cfg.batch_size <= 512
        and cfg.memory_size % (LANE * LANE) == 0
        and cfg.memory_size <= 1 << 20
        and m % LANE == 0
        and cfg.memory_size % m == 0
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "K", "bs", "lr", "gamma", "interval", "tau", "alpha", "per_eps",
        "beta_start", "beta_frames", "heads_only", "interpret",
    ),
)
def pallas_dqn_update_block(
    train_steps: jax.Array,          # i32 scalar (drives the sync schedule)
    adam_count: jax.Array,           # i32 scalar (optax adam step count)
    frame_idx: jax.Array,            # i32 scalar (PER beta anneal clock)
    size: jax.Array,                 # i32 scalar (filled slots)
    u01: jax.Array,                  # (K, bs, 1) f32 pre-drawn uniforms
    noise: UpdQNoise,
    pa: jax.Array,                   # (NC, 128) f32 p_alpha plane
    cs: jax.Array,                   # (S, 128) f32 chunk sums
    online: UpdQParams,
    target: UpdQParams,
    m: UpdQParams,
    v: UpdQParams,
    data_blocks: jax.Array,          # (NC, R, 128) f32 transition blocks
    *,
    K: int,
    bs: int,
    lr: float,
    gamma: float,
    interval: int,
    tau: float,
    alpha: float,
    per_eps: float,
    beta_start: float,
    beta_frames: int,
    heads_only: bool,
    interpret: bool = False,
):
    """Run K fused PER+SGD updates; returns
    ``(pa' (S,128,128), cs', online', target', m', v', newp (K,bs),
    idx (K,bs), losses (K,), train_steps')``."""
    NC, _ = pa.shape
    S = cs.shape[0]
    R = data_blocks.shape[1]
    H = online.w2t.shape[0]
    if NC != S * LANE:
        raise ValueError(f"chunk_sums plane {cs.shape} != {NC} chunks")
    pa = pa.reshape(S, LANE, LANE)   # [super, chunk lane, slot lane]

    sc = jnp.stack([
        jnp.asarray(train_steps, jnp.int32),
        jnp.asarray(adam_count, jnp.int32),
        jnp.asarray(frame_idx, jnp.int32),
        jnp.asarray(size, jnp.int32),
    ]).reshape(1, 4)

    kernel = functools.partial(
        _update_kernel,
        H=H, R=R, K=K, bs=bs, lr=lr, gamma=gamma, interval=interval,
        tau=tau, alpha=alpha, per_eps=per_eps, beta_start=beta_start,
        beta_frames=beta_frames, heads_only=heads_only,
        b1=0.9, b2=0.999, eps=1e-8,
    )

    def _const_spec(x):
        nd = x.ndim
        return pl.BlockSpec(x.shape, lambda k, _n=nd: (0,) * _n)

    def _kblock_spec(x):
        rest = x.shape[1:]
        nz = len(rest)
        return pl.BlockSpec((1,) + rest, lambda k, _n=nz: (k,) + (0,) * _n)

    param_specs = jax.tree_util.tree_map(_const_spec, online)
    noise_specs = jax.tree_util.tree_map(_kblock_spec, noise)
    shapes = lambda tree: jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree
    )
    out = pl.pallas_call(
        kernel,
        grid=(K,),
        in_specs=(
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
            _kblock_spec(u01),
            noise_specs,
            _const_spec(pa),
            _const_spec(cs),
            param_specs, param_specs, param_specs, param_specs,
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ),
        out_specs=(
            _const_spec(pa),
            _const_spec(cs),
            param_specs, param_specs, param_specs, param_specs,
            pl.BlockSpec((K, bs), lambda k: (0, 0)),
            pl.BlockSpec((K, bs), lambda k: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(pa.shape, jnp.float32),
            jax.ShapeDtypeStruct(cs.shape, jnp.float32),
            shapes(online), shapes(target), shapes(m), shapes(v),
            jax.ShapeDtypeStruct((K, bs), jnp.float32),
            jax.ShapeDtypeStruct((K, bs), jnp.int32),
            jax.ShapeDtypeStruct((1, K), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bs, R, LANE), jnp.float32),
            pltpu.VMEM((bs, LANE), jnp.float32),
            pltpu.VMEM((bs, 1), jnp.int32),
            pltpu.SMEM((bs, 1), jnp.int32),
            pltpu.VMEM((bs, LANE), jnp.float32),
            pltpu.VMEM((bs, 1), jnp.float32),
            pltpu.VMEM((bs, 1), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(sc, u01, noise, pa, cs, online, target, m, v, data_blocks)
    (pa2, cs2, online2, target2, m2, v2, newp, idx, losses, ts2) = out
    return pa2, cs2, online2, target2, m2, v2, newp, idx, losses[0], ts2[0, 0]
