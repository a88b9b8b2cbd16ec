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
entries (``chunk_sums``, ``chunk_max``). Writes touch only the affected
chunks; sampling is two-level inverse-CDF:

1. cumsum over the ~N/CHUNK chunk sums (a few thousand elements, not N),
   binary-search the batch of uniforms into chunks;
2. gather each sampled chunk's CHUNK priorities, row-cumsum, and offset-
   search within the row (batch x CHUNK elements).

This removes the reference-shaped O(N) scan per sample — the dominant
cost at N=1M with dozens of updates per iteration — while sampling from
exactly the same distribution. The max-priority stamp for pushes comes
from ``chunk_max`` instead of an O(N) reduction.

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

MAX_CHUNK = 1024


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
    obs: Array        # (N, obs_dim)
    action: Array     # (N,)
    reward: Array     # (N,)
    next_obs: Array   # (N, obs_dim)
    done: Array       # (N,)
    prios: Array      # (N,) raw priorities
    p_alpha: Array    # (N,) cached prios**alpha (0 for empty slots)
    chunk_sums: Array # (N/CHUNK,) per-chunk sums of p_alpha
    chunk_max: Array  # (N/CHUNK,) per-chunk max of prios
    pos: Array        # i32 ring cursor
    size: Array       # i32 filled count


class PERSample(NamedTuple):
    batch: Transition
    indices: Array    # (bs,)
    weights: Array    # (bs,) importance weights, max-normalized


def per_init(capacity: int, obs_dim: int = 7) -> PERBuffer:
    n_chunks = capacity // _chunk_size(capacity)
    return PERBuffer(
        obs=jnp.zeros((capacity, obs_dim), jnp.float32),
        action=jnp.zeros((capacity,), jnp.int32),
        reward=jnp.zeros((capacity,), jnp.float32),
        next_obs=jnp.zeros((capacity, obs_dim), jnp.float32),
        done=jnp.zeros((capacity,), jnp.bool_),
        prios=jnp.zeros((capacity,), jnp.float32),
        p_alpha=jnp.zeros((capacity,), jnp.float32),
        chunk_sums=jnp.zeros((n_chunks,), jnp.float32),
        chunk_max=jnp.zeros((n_chunks,), jnp.float32),
        pos=jnp.int32(0),
        size=jnp.int32(0),
    )


def _refresh_chunks(
    p_alpha: Array, prios: Array, chunk_sums: Array, chunk_max: Array,
    chunk_ids: Array,
) -> Tuple[Array, Array]:
    """Recompute summaries for the given chunk ids (duplicates fine)."""
    n_chunks = chunk_sums.shape[0]
    rows_a = p_alpha.reshape(n_chunks, -1)[chunk_ids]   # (K, chunk)
    rows_p = prios.reshape(n_chunks, -1)[chunk_ids]
    chunk_sums = chunk_sums.at[chunk_ids].set(jnp.sum(rows_a, axis=1))
    chunk_max = chunk_max.at[chunk_ids].set(jnp.max(rows_p, axis=1))
    return chunk_sums, chunk_max


def _write_fields(buf: PERBuffer, put, prio_src, pa_src, batch: Transition):
    return (
        put(buf.obs, batch.obs),
        put(buf.action, batch.action),
        put(buf.reward, batch.reward),
        put(buf.next_obs, batch.next_obs),
        put(buf.done, batch.done),
        put(buf.prios, prio_src),
        put(buf.p_alpha, pa_src),
    )


def per_push(buf: PERBuffer, batch: Transition, alpha: float) -> PERBuffer:
    """Append M transitions at the ring cursor with max-priority stamps.

    Fast path: when capacity is a multiple of the push size, the ring
    cursor always lands on aligned boundaries and the write is ONE
    contiguous ``dynamic_update_slice`` — a large-index scatter on TPU
    serializes and can cost two orders of magnitude more than the slice.
    """
    m = batch.action.shape[0]
    cap = buf.prios.shape[0]
    max_p = jnp.where(buf.size > 0, jnp.max(buf.chunk_max), jnp.float32(1.0))
    chunk = _chunk_of(buf)
    prio_src = jnp.full((m,), max_p, jnp.float32)
    pa_src = jnp.full((m,), max_p ** alpha, jnp.float32)

    def slice_write(buf):
        start = buf.pos  # multiple of m ⇒ no wrap mid-push

        def put(dst, src):
            idx0 = (start,) + (0,) * (src.ndim - 1)
            return jax.lax.dynamic_update_slice(dst, src, idx0)

        return _write_fields(buf, put, prio_src, pa_src, batch)

    def scatter_write(buf):
        idx = (buf.pos + jnp.arange(m, dtype=jnp.int32)) % cap

        def put(dst, src):
            return dst.at[idx].set(src)

        return _write_fields(buf, put, prio_src, pa_src, batch)

    if cap % m == 0:
        # Fast path is valid only when the cursor itself is m-aligned
        # (guaranteed if callers always push m, but guard against mixed
        # push sizes: dynamic_update_slice clamps at the ring end and
        # would silently write to the wrong slots).
        fields = jax.lax.cond(buf.pos % m == 0, slice_write, scatter_write, buf)
    else:
        fields = scatter_write(buf)
    obs, action, reward, next_obs, done, prios, p_alpha = fields

    # affected chunks: a contiguous cyclic range of ceil(m/chunk)+1 chunks
    n_aff = min(m // chunk + 2, cap // chunk)
    first = buf.pos // chunk
    chunk_ids = (first + jnp.arange(n_aff, dtype=jnp.int32)) % (cap // chunk)
    chunk_sums, chunk_max = _refresh_chunks(
        p_alpha, prios, buf.chunk_sums, buf.chunk_max, chunk_ids
    )
    return buf._replace(
        obs=obs,
        action=action,
        reward=reward,
        next_obs=next_obs,
        done=done,
        prios=prios,
        p_alpha=p_alpha,
        chunk_sums=chunk_sums,
        chunk_max=chunk_max,
        pos=(buf.pos + m) % cap,
        size=jnp.minimum(buf.size + m, cap),
    )


def per_sample(
    buf: PERBuffer, key: Array, batch_size: int, beta: Array
) -> PERSample:
    """Two-level prioritized sample with importance weights. (alpha is
    baked into the cached ``p_alpha`` at write time — pushes and priority
    updates take it as an argument.)"""
    cap = buf.prios.shape[0]
    chunk = _chunk_of(buf)
    n_chunks = cap // chunk
    chunk_cdf = jnp.cumsum(buf.chunk_sums)
    total = chunk_cdf[-1]
    u = jax.random.uniform(key, (batch_size,), jnp.float32) * total
    cidx = jnp.clip(
        jnp.searchsorted(chunk_cdf, u, side="right"), 0, n_chunks - 1
    ).astype(jnp.int32)
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
    weights = weights / jnp.maximum(jnp.max(weights), 1e-30)
    batch = Transition(
        obs=buf.obs[idx],
        action=buf.action[idx],
        reward=buf.reward[idx],
        next_obs=buf.next_obs[idx],
        done=buf.done[idx],
    )
    return PERSample(batch=batch, indices=idx, weights=weights)


def per_update_priorities(
    buf: PERBuffer, indices: Array, td_errors: Array, alpha: float,
    eps: float = 1e-6,
) -> PERBuffer:
    chunk = _chunk_of(buf)
    new_p = jnp.abs(td_errors) + eps
    prios = buf.prios.at[indices].set(new_p)
    p_alpha = buf.p_alpha.at[indices].set(new_p ** alpha)
    chunk_ids = (indices // chunk).astype(jnp.int32)
    chunk_sums, chunk_max = _refresh_chunks(
        p_alpha, prios, buf.chunk_sums, buf.chunk_max, chunk_ids
    )
    return buf._replace(
        prios=prios, p_alpha=p_alpha,
        chunk_sums=chunk_sums, chunk_max=chunk_max,
    )


def beta_schedule(frame_idx: Array, beta_start: float, beta_frames: int) -> Array:
    """Linear beta anneal (ref train_iterative.py:113-114, 136-137)."""
    return jnp.minimum(
        1.0,
        beta_start + frame_idx.astype(jnp.float32) * (1.0 - beta_start) / beta_frames,
    )
