"""Device-resident prioritized experience replay (PER), two-level layout.

Re-design of the reference's flat-array PER
(``/root/reference/scripts/train_iterative.py:49-76``) as fixed-shape jnp
arrays living in HBM, so pushes, sampling, and priority write-back all run
inside the jitted training iteration — no host round trips. Semantics
preserved:

* ring buffer of capacity N; new transitions get the current max priority
  (1.0 when empty);
* sampling probabilities ``p_i^alpha / sum p^alpha`` over the filled
  prefix; importance weights ``(N_filled * P(i))^-beta`` normalized by
  their max;
* ``update_priorities(idx, |td| + eps)``.

Performance layout — the TPU version of a sum-tree: priorities are cached
as ``p_alpha = prios**alpha`` and summarized per chunk of ``CHUNK``
entries (``chunk_sums``). Sampling is two-level inverse-CDF:

1. cumsum over the N/CHUNK chunk sums, broadcast-compare the batch of
   uniforms into chunks (one fused VPU op — measured faster than the
   log-step ``searchsorted`` loop at these sizes);
2. gather each sampled chunk's CHUNK priorities, row-cumsum, and offset-
   search within the row.

This removes the reference-shaped O(N) scan per sample — the dominant
cost at N=1M with dozens of updates per iteration — while sampling from
exactly the same distribution.

Latency notes (the update loop is a serial dependency chain
sample -> grads -> write-back -> sample, so per-op latency is wall-clock):

* ``CHUNK`` is 128, not the bandwidth-optimal sqrt(N): the per-sample row
  gather is 256 random reads of CHUNK*4 bytes, and small rows cut that
  latency-bound traffic 8x (measured 62M -> 77M env-steps/s on the full
  train iteration at N=1M).
* ``per_update_priorities`` maintains ``chunk_sums`` INCREMENTALLY
  (sort + first-occurrence dedup + segment-add of the per-slot delta)
  instead of re-gathering and re-summing whole chunks — the re-gather sat
  on the serial chain. Float drift from incremental adds is bounded by a
  full dense recompute of every chunk sum at each push (once per
  iteration).
* the max-priority stamp for pushes is a dense ``max(prios)`` at push
  time (off the serial chain), so no per-update chunk_max maintenance —
  and unlike a running max it correctly DECREASES when updates lower the
  max, matching the reference's ``prios.max()`` per push.

Batched-push note: the reference pushes one transition per env step, each
stamped with the running max priority; pushes never change the max, so
stamping a whole rollout chunk with one max is equivalent to the
sequential semantics. Duplicate sampled indices are possible exactly as in
the reference (``np.random.choice`` with replacement); duplicate scatter
writes in ``update_priorities`` resolve to one of the written values,
matching the reference's last-writer-wins loop up to update order.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

MAX_CHUNK = 128


def _chunk_size(capacity: int) -> int:
    """Largest power-of-two divisor of capacity, capped at MAX_CHUNK."""
    c = 1
    while c < MAX_CHUNK and capacity % (c * 2) == 0:
        c *= 2
    return c


def _chunk_of(buf: "PERBuffer") -> int:
    return buf.prios.shape[0] // buf.chunk_sums.shape[0]


class Transition(NamedTuple):
    """A batch of transitions (leading axis = batch)."""

    obs: Array        # (M, obs_dim) f32
    action: Array     # (M,) i32
    reward: Array     # (M,) f32
    next_obs: Array   # (M, obs_dim) f32
    done: Array       # (M,) bool


class PERBuffer(NamedTuple):
    """Transitions are PACKED row-wise into one ``(N, 2*obs_dim+3)`` f32
    array — columns ``[obs | next_obs | action | reward | done]`` — so a
    sampled batch is ONE row gather instead of five. The TPU core executes
    kernels serially, and the update loop is a serial dependency chain, so
    each eliminated gather is wall-clock. Actions (0..2) and done flags
    round-trip exactly through f32.

    BLOCK layout (``per_init(block=True)``, the fused-update-kernel fast
    path): ``data`` is instead ``(N/128, 2*obs_dim+2, 128)`` — chunk-major
    blocks whose row r, lane l holds field r of slot ``chunk*128 + l``,
    fields ``[obs | next_obs | reward | action + 4*done]`` (action and
    done share one f32 exactly: both are small ints). One sampled chunk is
    then a single aligned DMA for the Pallas update kernel
    (ops/dqn_update.py). All public functions accept both layouts."""

    data: Array       # (N, 2d+3) f32 rows, or (N/128, 2d+2, 128) blocks
    prios: Array      # (N,) raw priorities
    p_alpha: Array    # (N,) cached prios**alpha (0 for empty slots)
    chunk_sums: Array # (N/CHUNK,) per-chunk sums of p_alpha
    pos: Array        # i32 ring cursor
    size: Array       # i32 filled count

    @property
    def is_block(self) -> bool:
        return self.data.ndim == 3

    @property
    def obs_dim(self) -> int:
        if self.is_block:
            return (self.data.shape[1] - 2) // 2
        return (self.data.shape[1] - 3) // 2

    def _rows(self) -> Array:
        """Classic (N, 2d+3) row view [obs|next|act|rew|done] of either
        layout (test/tool convenience; hot paths never call this)."""
        if not self.is_block:
            return self.data
        nb, r, _ = self.data.shape
        flat = jnp.transpose(self.data, (0, 2, 1)).reshape(nb * 128, r)
        return _decode_block_rows(flat, self.obs_dim)

    # read-only views for tests/tools; the hot paths use `data` directly
    @property
    def obs(self) -> Array:
        return self._rows()[:, : self.obs_dim]

    @property
    def next_obs(self) -> Array:
        return self._rows()[:, self.obs_dim: 2 * self.obs_dim]

    @property
    def action(self) -> Array:
        return self._rows()[:, 2 * self.obs_dim].astype(jnp.int32)

    @property
    def reward(self) -> Array:
        return self._rows()[:, 2 * self.obs_dim + 1]

    @property
    def done(self) -> Array:
        return self._rows()[:, 2 * self.obs_dim + 2] > 0.5


class PERSample(NamedTuple):
    batch: Transition
    data: Array       # (bs, 2*obs_dim+3) packed rows (obs|next|a|r|d)
    indices: Array    # (bs,)
    weights: Array    # (bs,) importance weights, max-normalized


def per_init(capacity: int, obs_dim: int = 7, block: bool = False) -> PERBuffer:
    n_chunks = capacity // _chunk_size(capacity)
    if block:
        if capacity % 128 != 0:
            raise ValueError(
                f"block layout needs capacity % 128 == 0, got {capacity}"
            )
        data = jnp.zeros((capacity // 128, 2 * obs_dim + 2, 128), jnp.float32)
    else:
        data = jnp.zeros((capacity, 2 * obs_dim + 3), jnp.float32)
    return PERBuffer(
        data=data,
        prios=jnp.zeros((capacity,), jnp.float32),
        p_alpha=jnp.zeros((capacity,), jnp.float32),
        chunk_sums=jnp.zeros((n_chunks,), jnp.float32),
        pos=jnp.int32(0),
        size=jnp.int32(0),
    )


def pack_transitions(batch: Transition) -> Array:
    """(M, ...) Transition -> packed (M, 2*obs_dim+3) f32 rows."""
    return jnp.concatenate(
        [
            batch.obs,
            batch.next_obs,
            batch.action.astype(jnp.float32)[:, None],
            batch.reward[:, None],
            batch.done.astype(jnp.float32)[:, None],
        ],
        axis=1,
    )


def _pack_block_fields(batch: Transition) -> Array:
    """(M, ...) Transition -> (M, 2*obs_dim+2) block-layout field rows
    [obs | next_obs | reward | action + 4*done]."""
    ad = batch.action.astype(jnp.float32) + 4.0 * batch.done.astype(
        jnp.float32
    )
    return jnp.concatenate(
        [batch.obs, batch.next_obs, batch.reward[:, None], ad[:, None]],
        axis=1,
    )


def _decode_block_rows(fields: Array, d: int) -> Array:
    """(M, 2d+2) block field rows -> classic (M, 2d+3) packed rows."""
    ad = fields[:, 2 * d + 1]
    done = (ad > 3.5).astype(jnp.float32)
    act = ad - 4.0 * done
    return jnp.concatenate(
        [
            fields[:, : 2 * d],
            act[:, None],
            fields[:, 2 * d: 2 * d + 1],
            done[:, None],
        ],
        axis=1,
    )


def per_push(buf: PERBuffer, batch: Transition, alpha: float) -> PERBuffer:
    """Append M transitions at the ring cursor with max-priority stamps.

    Fast path: when capacity is a multiple of the push size, the ring
    cursor always lands on aligned boundaries and the write is ONE
    contiguous ``dynamic_update_slice`` — a large-index scatter on TPU
    serializes and can cost two orders of magnitude more than the slice.
    Block layout additionally needs M % 128 == 0 on the fast path (whole
    chunk blocks); otherwise the scatter fallback lane-scatters into the
    blocks.
    """
    m = batch.action.shape[0]
    cap = buf.prios.shape[0]
    block = buf.is_block
    # dense max over the raw priorities (reference: prios.max() per push);
    # runs off the update loop's serial chain, once per rollout chunk
    max_p = jnp.where(buf.size > 0, jnp.max(buf.prios), jnp.float32(1.0))
    chunk = _chunk_of(buf)
    prio_src = jnp.full((m,), max_p, jnp.float32)
    pa_src = jnp.full((m,), max_p ** alpha, jnp.float32)
    if block:
        field_rows = _pack_block_fields(batch)          # (m, R)
        n_fields = field_rows.shape[1]
    else:
        data_src = pack_transitions(batch)

    def slice_write(buf):
        start = buf.pos  # multiple of m ⇒ no wrap mid-push

        def put(dst, src):
            idx0 = (start,) + (0,) * (src.ndim - 1)
            return jax.lax.dynamic_update_slice(dst, src, idx0)

        if block:
            blk = jnp.transpose(
                field_rows.reshape(m // 128, 128, n_fields), (0, 2, 1)
            )
            data = jax.lax.dynamic_update_slice(
                buf.data, blk, (start // 128, 0, 0)
            )
        else:
            data = put(buf.data, data_src)
        return data, put(buf.prios, prio_src), put(buf.p_alpha, pa_src)

    def scatter_write(buf):
        idx = (buf.pos + jnp.arange(m, dtype=jnp.int32)) % cap
        if block:
            data = buf.data.at[
                (idx // 128)[:, None],
                jnp.arange(n_fields, dtype=jnp.int32)[None, :],
                (idx % 128)[:, None],
            ].set(field_rows)
        else:
            data = buf.data.at[idx].set(data_src)
        return (
            data,
            buf.prios.at[idx].set(prio_src),
            buf.p_alpha.at[idx].set(pa_src),
        )

    aligned_ok = cap % m == 0 and (not block or m % 128 == 0)
    if aligned_ok:
        # Fast path is valid only when the cursor itself is m-aligned
        # (guaranteed if callers always push m, but guard against mixed
        # push sizes: dynamic_update_slice clamps at the ring end and
        # would silently write to the wrong slots).
        fields = jax.lax.cond(buf.pos % m == 0, slice_write, scatter_write, buf)
    else:
        fields = scatter_write(buf)
    data, prios, p_alpha = fields

    # full dense chunk-sum recompute: bounds the float drift accumulated
    # by the incremental per-update maintenance, at dense-reduce cost
    chunk_sums = jnp.sum(p_alpha.reshape(-1, chunk), axis=1)
    return buf._replace(
        data=data,
        prios=prios,
        p_alpha=p_alpha,
        chunk_sums=chunk_sums,
        pos=(buf.pos + m) % cap,
        size=jnp.minimum(buf.size + m, cap),
    )


def per_sample(
    buf: PERBuffer, key: Array, batch_size: int, beta: Array,
    u01: Array = None, normalize: bool = True,
) -> PERSample:
    """Two-level prioritized sample with importance weights. (alpha is
    baked into the cached ``p_alpha`` at write time — pushes and priority
    updates take it as an argument.) ``u01`` optionally supplies the
    pre-generated U[0,1) batch — callers looping K updates generate all K
    batches in one op outside the loop, keeping PRNG kernels off the
    serialized update chain.

    ``normalize=False`` returns the RAW ``(N * P(i))^-beta`` weights
    (no batch-max normalization). The sharded learner mode
    (train/dqn.py::_push_update_sharded) needs this: each shard's raw
    local weight IS the exact stratified-proposal importance weight —
    ``N_glob * P_tilde(i) = (n * N_loc) * (1/n) * p_i^a / mass_loc =
    N_loc * p_i^a / mass_loc``, the n's cancel — and the normalizer must
    be the GLOBAL batch max (a pmax outside this function)."""
    cap = buf.prios.shape[0]
    chunk = _chunk_of(buf)
    n_chunks = cap // chunk
    chunk_cdf = jnp.cumsum(buf.chunk_sums)
    total = chunk_cdf[-1]
    if u01 is None:
        u01 = jax.random.uniform(key, (batch_size,), jnp.float32)
    u = u01 * total
    # one fused compare+sum beats searchsorted's log-step loop on the
    # serialized update chain
    cidx = jnp.clip(
        jnp.sum((chunk_cdf[None, :] < u[:, None]).astype(jnp.int32), axis=1),
        0, n_chunks - 1,
    )
    residual = u - jnp.where(cidx > 0, chunk_cdf[cidx - 1], 0.0)
    rows = buf.p_alpha.reshape(n_chunks, chunk)[cidx]       # (bs, chunk)
    row_cdf = jnp.cumsum(rows, axis=1)
    offset = jnp.sum(
        (row_cdf < residual[:, None]).astype(jnp.int32), axis=1
    )
    offset = jnp.clip(offset, 0, chunk - 1)
    idx = cidx * chunk + offset
    idx = jnp.clip(idx, 0, jnp.maximum(buf.size - 1, 0)).astype(jnp.int32)
    probs = buf.p_alpha[idx] / jnp.maximum(total, 1e-30)
    n = buf.size.astype(jnp.float32)
    weights = (n * jnp.maximum(probs, 1e-30)) ** (-beta)
    if normalize:
        weights = weights / jnp.maximum(jnp.max(weights), 1e-30)
    d = buf.obs_dim
    if buf.is_block:
        fields = buf.data[idx // 128, :, idx % 128]     # (bs, 2d+2)
        rows = _decode_block_rows(fields, d)
    else:
        rows = buf.data[idx]             # ONE gather for all five fields
    batch = Transition(
        obs=rows[:, :d],
        action=rows[:, 2 * d].astype(jnp.int32),
        reward=rows[:, 2 * d + 1],
        next_obs=rows[:, d: 2 * d],
        done=rows[:, 2 * d + 2] > 0.5,
    )
    return PERSample(batch=batch, data=rows, indices=idx, weights=weights)


def per_update_priorities(
    buf: PERBuffer, indices: Array, td_errors: Array, alpha: float,
    eps: float = 1e-6,
) -> PERBuffer:
    """Priority write-back with INCREMENTAL chunk-sum maintenance.

    The naive refresh (re-gather + re-sum every touched chunk) sits on the
    update loop's serial chain; instead the per-slot delta is segment-added
    into ``chunk_sums``. Duplicate indices are deduplicated by sort +
    first-occurrence masking so each slot's delta counts exactly once
    (scatter resolves duplicates last-writer-wins; the delta uses the value
    actually left in the array)."""
    chunk = _chunk_of(buf)
    new_p = jnp.abs(td_errors) + eps
    old_pa = buf.p_alpha[indices]
    prios = buf.prios.at[indices].set(new_p)
    p_alpha = buf.p_alpha.at[indices].set(new_p ** alpha)
    # per-slot delta, counted once per distinct index
    written = p_alpha[indices]           # the winner value at each slot
    order = jnp.argsort(indices)
    sorted_idx = indices[order]
    first = jnp.concatenate([
        jnp.ones((1,), bool), sorted_idx[1:] != sorted_idx[:-1]
    ])
    delta = jnp.where(first, written[order] - old_pa[order], 0.0)
    chunk_ids = (sorted_idx // chunk).astype(jnp.int32)
    chunk_sums = buf.chunk_sums.at[chunk_ids].add(delta)
    return buf._replace(prios=prios, p_alpha=p_alpha, chunk_sums=chunk_sums)


def beta_schedule(frame_idx: Array, beta_start: float, beta_frames: int) -> Array:
    """Linear beta anneal (ref train_iterative.py:113-114, 136-137)."""
    return jnp.minimum(
        1.0,
        beta_start + frame_idx.astype(jnp.float32) * (1.0 - beta_start) / beta_frames,
    )
