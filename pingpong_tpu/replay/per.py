"""Device-resident prioritized experience replay (PER).

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

TPU-native differences:

* pushes are batched (a whole rollout chunk at once). The reference pushes
  one transition per env step, each stamped with the running max priority;
  since pushes never change the max, stamping a batch with one max is
  byte-equivalent to the sequential semantics.
* categorical sampling is inverse-CDF: one ``cumsum`` over the priority
  array plus a vectorized binary search (``searchsorted``) for the batch
  of uniforms. This is O(N) streaming work on the VPU — the natural Pallas
  fusion target if it ever shows up in profiles.
* duplicate sampled indices are possible exactly as in the reference
  (``np.random.choice`` with replacement); the scatter in
  ``update_priorities`` then resolves duplicates to one of the written
  values, matching the reference's last-writer-wins loop up to update
  order (the written values differ only by float noise on the same TD).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


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
    prios: Array      # (N,) raw priorities (not alpha-powered)
    pos: Array        # i32 ring cursor
    size: Array       # i32 filled count


class PERSample(NamedTuple):
    batch: Transition
    indices: Array    # (bs,)
    weights: Array    # (bs,) importance weights, max-normalized


def per_init(capacity: int, obs_dim: int = 7) -> PERBuffer:
    return PERBuffer(
        obs=jnp.zeros((capacity, obs_dim), jnp.float32),
        action=jnp.zeros((capacity,), jnp.int32),
        reward=jnp.zeros((capacity,), jnp.float32),
        next_obs=jnp.zeros((capacity, obs_dim), jnp.float32),
        done=jnp.zeros((capacity,), jnp.bool_),
        prios=jnp.zeros((capacity,), jnp.float32),
        pos=jnp.int32(0),
        size=jnp.int32(0),
    )


def per_push(buf: PERBuffer, batch: Transition) -> PERBuffer:
    """Append M transitions at the ring cursor with max-priority stamps."""
    m = batch.action.shape[0]
    cap = buf.prios.shape[0]
    idx = (buf.pos + jnp.arange(m, dtype=jnp.int32)) % cap
    max_p = jnp.where(buf.size > 0, jnp.max(buf.prios), jnp.float32(1.0))
    return PERBuffer(
        obs=buf.obs.at[idx].set(batch.obs),
        action=buf.action.at[idx].set(batch.action),
        reward=buf.reward.at[idx].set(batch.reward),
        next_obs=buf.next_obs.at[idx].set(batch.next_obs),
        done=buf.done.at[idx].set(batch.done),
        prios=buf.prios.at[idx].set(max_p),
        pos=(buf.pos + m) % cap,
        size=jnp.minimum(buf.size + m, cap),
    )


def per_sample(
    buf: PERBuffer, key: Array, batch_size: int, alpha: float, beta: Array
) -> PERSample:
    """Prioritized sample with importance weights (ref sample(), :64-73)."""
    cap = buf.prios.shape[0]
    mask = jnp.arange(cap, dtype=jnp.int32) < buf.size
    p = jnp.where(mask, buf.prios, 0.0) ** alpha
    p = jnp.where(mask, p, 0.0)  # 0**alpha == 0 but guard inf for alpha<0
    cdf = jnp.cumsum(p)
    total = cdf[-1]
    u = jax.random.uniform(key, (batch_size,), jnp.float32) * total
    idx = jnp.clip(
        jnp.searchsorted(cdf, u, side="right"), 0, jnp.maximum(buf.size - 1, 0)
    ).astype(jnp.int32)
    probs = p[idx] / jnp.maximum(total, 1e-30)
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
    buf: PERBuffer, indices: Array, td_errors: Array, eps: float = 1e-6
) -> PERBuffer:
    new_p = jnp.abs(td_errors) + eps
    return buf._replace(prios=buf.prios.at[indices].set(new_p))


def beta_schedule(frame_idx: Array, beta_start: float, beta_frames: int) -> Array:
    """Linear beta anneal (ref train_iterative.py:113-114, 136-137)."""
    return jnp.minimum(
        1.0,
        beta_start + frame_idx.astype(jnp.float32) * (1.0 - beta_start) / beta_frames,
    )
