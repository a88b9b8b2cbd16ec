"""Device-resident sequence replay for DRQN trace training.

Re-design of the reference ``SequenceReplayBuffer``
(``/root/reference/scripts/train_rnn_iterative.py:100-176``), which stores
ragged whole-episode lists in host RAM and samples fixed ``trace_length``
windows uniformly within episodes (episodes shorter than the trace are
never admitted).

TPU-native design — a **per-env time ring** instead of episode slots:

* ``num_envs`` lockstep envs write one transition per step into a shared
  column cursor of a ``(num_envs, ring_len)`` ring: constant, coalesced
  bandwidth, no episode-flush scatters;
* every entry is stamped with its env's monotonically increasing episode
  id. A window ``[t0, t0+T)`` of row ``b`` is a valid trace iff the ids at
  its two ends match (ids are monotone, so equal endpoints imply one
  episode covers the window) and the window lies in the written region;
* sampling draws (env, t0) uniformly and rejects invalid windows over a
  few rounds; samples still invalid after that carry weight 0 (the loss
  masks them). Once the ring has data, the invalid fraction is the small
  episode-boundary band, ~(T-1)/mean_episode_length.

Distribution note: the reference samples episode-uniform then
offset-uniform (``train_rnn_iterative.py:129-144``: ``np.random.choice``
over stored episodes with replacement, then
``randint(0, len - trace_length + 1)``), which over-weights windows from
short episodes; this buffer samples (approximately) window-uniform by
default. The reference rule is available as a parity knob: build the
buffer with ``dir_cap > 0`` (an **episode directory** — a small ring of
``(env, start_cursor, len, ep_id)`` records appended when an episode is
admitted) and sample with ``episode_uniform=True``; staleness (directory
records whose ring columns have been overwritten) is rejected by the same
id checks that guard window-uniform candidates. The admission rule
(len >= trace_length) is preserved exactly in both modes — shorter
episodes produce no valid window. Unlike the reference, an episode cut by
the step cap is treated as a proper boundary; the reference leaves the
partial trajectory in its staging list and silently concatenates it with
the next episode (train_rnn_iterative.py:113-116 never fires without
``done``), which we consider a bug, not behavior to port.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

CHUNK = 128   # chunk-major column-block width (lane-aligned)


class SeqReplay(NamedTuple):
    """``next_obs`` is NOT stored: within a valid window (single episode,
    consecutive columns) ``next_obs[j] == obs[j+1]``, so :func:`seq_sample`
    derives the next-sequence by sampling T+1-column windows — halving the
    ring's dominant storage and the rollout kernel's transition-emit
    traffic. The one position where the identity fails, a window whose
    LAST step ends the episode, is exactly the position whose bootstrap
    term the Double-DQN loss multiplies by ``(1 - done)``: the garbage
    value is mathematically unreachable (train/drqn.py::_update).

    PACKED, CHUNK-MAJOR layout (round-4 perf): obs/action/reward/done
    live in ONE f32 plane ``data`` with per-step field rows
    ``[obs | action | reward | done]`` (F = obs_dim+3 values each).
    When ``ring_len % 128 == 0`` the plane is stored CHUNK-major,
    ``(B, R/128, 128*F)`` — each row is one env's 128-step column chunk.
    Why: XLA's TPU gather is latency-bound per ROW, and reshaping across
    a padded minor dim is a full physical relayout (measured: the naive
    ``(B, R, F)`` plane costs 2.2ms to sample N=2048 windows row-wise
    and ~10ms if reshaped first). Chunk-major makes the window fetch a
    two-stage op with NO big relayout: gather each window's enclosing
    chunk PAIR as 2N wide rows (free leading-dim flatten), then slice
    the T+1 window from the small (N, 256, F) intermediate. Rings with
    ``ring_len % 128 != 0`` (tiny test buffers) fall back to a flat
    ``(B, R, F)`` plane and 2-D indexed gathers. Actions (0..2) and
    done flags round-trip exactly through f32; tests and tools keep the
    field view via the read-only ``obs/action/reward/done`` properties."""

    data: Array       # (B, R/128, 128*F) chunk-major, or (B, R, F) flat
    ep_id: Array      # (B, R) i32, -1 = never written
    cursor: Array     # i32 shared column cursor (total steps written)
    ep_count: Array   # i32 completed episodes admitted (len >= trace)
    cur_ep_id: Array  # (B,) i32 current episode id per env
    cur_ep_len: Array # (B,) i32 running length of the in-flight episode
    # episode directory (parity knob; all (D,) — a single dummy slot,
    # D=1, when disabled):
    dir_env: Array    # (D,) i32 env row of the admitted episode
    dir_start: Array  # (D,) i32 ABSOLUTE cursor of the episode's first step
    dir_len: Array    # (D,) i32 episode length (>= trace_length)
    dir_id: Array     # (D,) i32 the episode's ep_id (staleness check)
    dir_cursor: Array # i32 total episodes ever appended to the directory

    @property
    def is_chunked(self) -> bool:
        return self.data.shape[1] != self.ep_id.shape[1]

    @property
    def obs_dim(self) -> int:
        if self.is_chunked:
            ring = self.ep_id.shape[1]
            c = ring // self.data.shape[1]
            return self.data.shape[2] // c - 3
        return self.data.shape[-1] - 3

    def _brf(self) -> Array:
        """Flat (B, R, F) logical view (tests/tools; a relayout when
        chunked — hot paths never call this)."""
        if not self.is_chunked:
            return self.data
        B, ring = self.ep_id.shape
        f = self.obs_dim + 3
        return self.data.reshape(B, ring, f)

    # read-only field views (tests/tools; hot paths use `data` directly)
    @property
    def obs(self) -> Array:
        return self._brf()[..., : self.obs_dim]

    @property
    def action(self) -> Array:
        return self._brf()[..., self.obs_dim].astype(jnp.int32)

    @property
    def reward(self) -> Array:
        return self._brf()[..., self.obs_dim + 1]

    @property
    def done(self) -> Array:
        return self._brf()[..., self.obs_dim + 2] > 0.5


class SeqSample(NamedTuple):
    obs: Array        # (N, T, obs_dim)
    action: Array     # (N, T)
    reward: Array     # (N, T)
    next_obs: Array   # (N, T, obs_dim) — derived obs[t0+1 .. t0+T]; the
                      #   final element is undefined when done[T-1] (the
                      #   loss masks that bootstrap term by 1-done)
    done: Array       # (N, T)
    valid: Array      # (N,) bool — invalid samples must be masked in loss


def seq_init(num_envs: int, ring_len: int, obs_dim: int = 7,
             dir_cap: int = 0) -> SeqReplay:
    """``dir_cap >= 2`` enables the episode directory (needed only for
    ``seq_sample(..., episode_uniform=True)``; sized to hold at least the
    episodes live in the ring — undersizing just raises the stale-record
    rejection rate, it cannot corrupt samples). Disabled buffers carry a
    single dummy slot (zero-size leaves cannot round-trip through Orbax
    checkpointing)."""
    dir_n = max(dir_cap, 1)
    f = obs_dim + 3
    if ring_len % CHUNK == 0:
        data = jnp.zeros((num_envs, ring_len // CHUNK, CHUNK * f),
                         jnp.float32)
    else:
        data = jnp.zeros((num_envs, ring_len, f), jnp.float32)
    return SeqReplay(
        data=data,
        ep_id=jnp.full((num_envs, ring_len), -1, jnp.int32),
        cursor=jnp.int32(0),
        ep_count=jnp.int32(0),
        cur_ep_id=jnp.zeros((num_envs,), jnp.int32),
        cur_ep_len=jnp.zeros((num_envs,), jnp.int32),
        dir_env=jnp.zeros((dir_n,), jnp.int32),
        dir_start=jnp.zeros((dir_n,), jnp.int32),
        dir_len=jnp.zeros((dir_n,), jnp.int32),
        dir_id=jnp.full((dir_n,), -1, jnp.int32),
        dir_cursor=jnp.int32(0),
    )


def _field_at(buf: SeqReplay, env: Array, t: Array, field: int) -> Array:
    """Hot-path scalar-field read at (env, t) — layout-aware, no relayout
    (the chunked branch's leading-dim flatten is free)."""
    if buf.is_chunked:
        cf = buf.data.shape[2]
        nc = buf.data.shape[1]
        f = cf // CHUNK
        flat = buf.data.reshape(-1, cf)
        return flat[env * nc + t // CHUNK, (t % CHUNK) * f + field]
    return buf.data[env, t, field]


def _pack_fields(obs: Array, action: Array, reward: Array,
                 done: Array) -> Array:
    """(..., obs_dim) fields -> (..., obs_dim+3) packed f32 rows."""
    return jnp.concatenate(
        [obs, action.astype(jnp.float32)[..., None],
         reward.astype(jnp.float32)[..., None],
         done.astype(jnp.float32)[..., None]], axis=-1,
    )


def _dir_append(buf: SeqReplay, admitted: Array, env: Array, start: Array,
                length: Array, ep_id: Array):
    """Append admitted episodes (flat masked arrays) to the directory ring.
    Returns the updated (dir_env, dir_start, dir_len, dir_id, dir_cursor).
    Non-admitted entries scatter out of bounds and are dropped."""
    cap = buf.dir_env.shape[0]
    adm_i = admitted.astype(jnp.int32)
    rank = jnp.cumsum(adm_i) - adm_i                      # exclusive rank
    slot = jnp.where(admitted, (buf.dir_cursor + rank) % cap, cap)
    return (
        buf.dir_env.at[slot].set(env, mode="drop"),
        buf.dir_start.at[slot].set(start, mode="drop"),
        buf.dir_len.at[slot].set(length, mode="drop"),
        buf.dir_id.at[slot].set(ep_id, mode="drop"),
        buf.dir_cursor + jnp.sum(adm_i),
    )


def seq_push_step(
    buf: SeqReplay,
    obs: Array,        # (B, obs_dim)
    action: Array,     # (B,)
    reward: Array,     # (B,)
    done: Array,       # (B,) bool — episode boundary (incl. truncation)
    trace_length: int,
) -> SeqReplay:
    """Write one lockstep step for every env at the shared cursor column."""
    ring = buf.ep_id.shape[1]
    col = buf.cursor % ring
    new_len = buf.cur_ep_len + 1
    admitted = done & (new_len >= trace_length)
    B = done.shape[0]
    dirs = (buf.dir_env, buf.dir_start, buf.dir_len, buf.dir_id,
            buf.dir_cursor)
    if buf.dir_env.shape[0] > 1:
        # an episode ending at absolute cursor c with length L started at
        # c - L + 1 (this push writes at absolute position buf.cursor)
        dirs = _dir_append(
            buf, admitted, jnp.arange(B, dtype=jnp.int32),
            buf.cursor - new_len + 1, new_len, buf.cur_ep_id,
        )
    packed = _pack_fields(obs, action, reward, done)       # (B, F)
    if buf.is_chunked:
        f = packed.shape[-1]
        data = jax.lax.dynamic_update_slice(
            buf.data, packed[:, None, :], (0, col // CHUNK, (col % CHUNK) * f)
        )
    else:
        data = buf.data.at[:, col].set(packed)
    return SeqReplay(
        data=data,
        ep_id=buf.ep_id.at[:, col].set(buf.cur_ep_id),
        cursor=buf.cursor + 1,
        ep_count=buf.ep_count + jnp.sum(admitted.astype(jnp.int32)),
        cur_ep_id=buf.cur_ep_id + done.astype(jnp.int32),
        cur_ep_len=jnp.where(done, 0, new_len),
        dir_env=dirs[0], dir_start=dirs[1], dir_len=dirs[2],
        dir_id=dirs[3], dir_cursor=dirs[4],
    )


def seq_push_rollout(
    buf: SeqReplay,
    obs: Array,        # (T, B, obs_dim)
    action: Array,     # (T, B)
    reward: Array,     # (T, B)
    done: Array,       # (T, B) bool
    trace_length: int,
) -> SeqReplay:
    """Write a whole rollout chunk (T lockstep steps) in one bulk update.

    Equivalent to T calls of :func:`seq_push_step` (episode ids, admission
    counting and cursors are reconstructed vectorially from the done
    mask), but the rollout scan no longer needs to carry the ring buffer —
    a large-carry scan makes XLA thread hundreds of MB through every
    iteration.
    """
    T, B = done.shape
    ring = buf.ep_id.shape[1]
    if T > ring:
        raise ValueError(f"rollout chunk T={T} exceeds ring length {ring}")
    cols = (buf.cursor + jnp.arange(T, dtype=jnp.int32)) % ring

    done_bt = done.T.astype(jnp.int32)                      # (B, T)
    # episode id at each written column: cur_ep_id + dones before t
    prefix = jnp.cumsum(done_bt, axis=1) - done_bt          # exclusive
    ep_ids = buf.cur_ep_id[:, None] + prefix                # (B, T)

    # per-step episode length at t: steps since last done (exclusive) + 1,
    # seeded with the in-flight length
    idx = jnp.arange(T, dtype=jnp.int32)[None, :]
    marked = jnp.where(done_bt > 0, idx, -1)
    last_done_incl = jax.lax.associative_scan(jnp.maximum, marked, axis=1)
    last_done_excl = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), last_done_incl[:, :-1]], axis=1
    )
    length_t = jnp.where(
        last_done_excl < 0,
        buf.cur_ep_len[:, None] + idx + 1,
        idx - last_done_excl,
    )
    admitted = (done_bt > 0) & (length_t >= trace_length)
    n_admitted = jnp.sum(admitted.astype(jnp.int32))

    any_done = jnp.any(done_bt > 0, axis=1)
    new_cur_len = jnp.where(
        any_done, (T - 1) - last_done_incl[:, -1], buf.cur_ep_len + T
    )
    new_cur_id = buf.cur_ep_id + jnp.sum(done_bt, axis=1)

    dirs = (buf.dir_env, buf.dir_start, buf.dir_len, buf.dir_id,
            buf.dir_cursor)
    if buf.dir_env.shape[0] > 1:
        # episode ending at absolute position cursor+t with length L
        # started at cursor + t - L + 1; appended TIME-major so the
        # directory order is identical to T seq_push_step calls
        start_abs = buf.cursor + idx - length_t + 1        # (B, T)
        env_flat = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[:, None], (B, T)
        ).T.reshape(-1)
        dirs = _dir_append(
            buf, admitted.T.reshape(-1), env_flat,
            start_abs.T.reshape(-1), length_t.T.reshape(-1),
            ep_ids.T.reshape(-1),
        )

    aligned = ring % T == 0  # static: cursor % ring is then a multiple of T
    col0 = buf.cursor % ring
    fw = obs.shape[-1] + 3
    packed = jnp.moveaxis(
        _pack_fields(obs, action, reward, done), 0, 1
    )                                                       # (B, T, F)

    def put_data(dst):
        if not buf.is_chunked:
            if aligned:
                # contiguous column block: one dynamic_update_slice beats
                # a T-index scatter by a wide margin on TPU
                return jax.lax.dynamic_update_slice(dst, packed, (0, col0, 0))
            return dst.at[:, cols].set(packed)
        # chunk-major: the T-column block is whole chunk rows (T >= 128)
        # or a contiguous span inside one chunk row (T | 128) — one DUS
        chunk_ok = aligned and (T % CHUNK == 0 or CHUNK % T == 0)
        if chunk_ok and T >= CHUNK:
            blk = packed.reshape(B, T // CHUNK, CHUNK * fw)
            return jax.lax.dynamic_update_slice(
                dst, blk, (0, col0 // CHUNK, 0)
            )
        if chunk_ok:
            blk = packed.reshape(B, 1, T * fw)
            return jax.lax.dynamic_update_slice(
                dst, blk, (0, col0 // CHUNK, (col0 % CHUNK) * fw)
            )
        out = dst                        # general fallback: per-column DUS
        for t in range(T):
            out = jax.lax.dynamic_update_slice(
                out, packed[:, t][:, None, :],
                (0, cols[t] // CHUNK, (cols[t] % CHUNK) * fw),
            )
        return out

    def put_bt(dst, src_bt):
        if aligned:
            return jax.lax.dynamic_update_slice(dst, src_bt, (0, col0))
        return dst.at[:, cols].set(src_bt)

    return SeqReplay(
        data=put_data(buf.data),
        ep_id=put_bt(buf.ep_id, ep_ids),
        cursor=buf.cursor + T,
        ep_count=buf.ep_count + n_admitted,
        cur_ep_id=new_cur_id,
        cur_ep_len=new_cur_len,
        dir_env=dirs[0], dir_start=dirs[1], dir_len=dirs[2],
        dir_id=dirs[3], dir_cursor=dirs[4],
    )


def _window_valid(buf: SeqReplay, env: Array, t0: Array, trace_length: int) -> Array:
    """Endpoint-id equality + written-region check for (env, t0) windows.

    Because ``next_obs`` is derived as ``obs[t0+1 .. t0+T]``, a window
    whose last step does NOT end its episode additionally needs the
    element at ``t0+T`` to be written and time-adjacent — i.e. the
    EXTENDED interval ``[t0, t0+T]`` must not abut the write frontier.
    Windows that end exactly on an episode boundary need no next value
    (the loss masks the bootstrap term by ``1-done``) and keep the
    original, unextended rules."""
    ring = buf.ep_id.shape[1]
    T = trace_length
    id_lo = buf.ep_id[env, t0]
    id_hi = buf.ep_id[env, t0 + T - 1]
    written = jnp.minimum(buf.cursor, ring)
    in_range = (t0 + T) <= written
    # exclude the in-flight episode's tail: those entries are being actively
    # overwritten next wrap; simpler correctness: windows entirely of one
    # finished-or-current episode are fine (ref trains on stored full
    # episodes only — the in-flight exclusion keeps parity with "complete
    # episodes only")
    current = buf.cur_ep_id[env]
    not_inflight = id_hi != current
    # Once the ring has wrapped, the write seam (newest entry at column
    # cursor%ring - 1, oldest at cursor%ring) is a time discontinuity. The
    # endpoint-id check alone can admit a seam-straddling window when one
    # episode spans ~ring_len steps (same id on both sides of the seam);
    # reject any window whose columns contain both seam sides.
    seam = buf.cursor % ring
    straddles_seam = (buf.cursor >= ring) & (seam > t0) & (seam < t0 + T)
    ok = (id_lo == id_hi) & (id_lo >= 0) & in_range & not_inflight \
        & ~straddles_seam
    # derived-next frontier/seam rules for windows still needing obs[t0+T]
    end_done = _field_at(buf, env, t0 + T - 1, buf.obs_dim + 2) > 0.5
    next_written = (t0 + T) < buf.cursor            # pre-wrap frontier
    next_seam_ok = ~((buf.cursor >= ring) & (seam == (t0 + T) % ring))
    next_ok = end_done | (
        jnp.where(buf.cursor >= ring, next_seam_ok, next_written)
    )
    return ok & next_ok


def seq_sample(
    buf: SeqReplay,
    key: Array,
    batch_size: int,
    trace_length: int,
    rejection_rounds: int = 4,
    episode_uniform: bool = False,
) -> SeqSample:
    """Draw ``batch_size`` trace windows; a few rejection rounds re-draw
    invalid candidates, leftovers are flagged ``valid=False``.

    ``episode_uniform=True`` reproduces the reference's two-stage rule
    (``train_rnn_iterative.py:129-144``): a stored episode uniformly with
    replacement, then a uniform window offset within it — requires the
    buffer to carry an episode directory (``seq_init(dir_cap > 0)``).
    Stale directory records (episodes the ring has since overwritten) and
    windows whose columns would wrap the row end are rejected and redrawn.
    """
    num_envs, ring = buf.ep_id.shape
    t_max = ring - trace_length + 1
    if episode_uniform and buf.dir_env.shape[0] <= 1:
        raise ValueError("episode_uniform sampling needs seq_init(dir_cap>=2)")

    # ALL rejection rounds' candidates are drawn and validity-checked in
    # ONE vectorized pass of (rounds * batch) width, then each slot takes
    # its FIRST valid round — identical in distribution to sequential
    # redraw rounds (candidates are iid), but the ~10 gather/compare ops
    # of the validity rules run once at 4x width instead of 4 times (the
    # update path is latency-bound; op count is wall-clock).
    R_ = rejection_rounds
    nrb = R_ * batch_size
    if episode_uniform:
        cap = buf.dir_env.shape[0]
        n_dir = jnp.minimum(buf.dir_cursor, cap)
        key, k_slot, k_off = jax.random.split(key, 3)
        slot = jax.random.randint(k_slot, (nrb,), 0, jnp.maximum(n_dir, 1))
        cand_env = buf.dir_env[slot]
        length = buf.dir_len[slot]
        off = jax.random.randint(
            k_off, (nrb,), 0, jnp.maximum(length - trace_length + 1, 1)
        )
        cand_t0 = (buf.dir_start[slot] + off) % ring
        no_wrap = cand_t0 + trace_length <= ring
        cand_ok = (
            (n_dir > 0) & no_wrap
            & _window_valid(buf, cand_env, cand_t0, trace_length)
            & (buf.ep_id[cand_env, cand_t0] == buf.dir_id[slot])
        )
    else:
        key, k_env, k_t = jax.random.split(key, 3)
        cand_env = jax.random.randint(k_env, (nrb,), 0, num_envs)
        cand_t0 = jax.random.randint(k_t, (nrb,), 0, t_max)
        cand_ok = _window_valid(buf, cand_env, cand_t0, trace_length)
    ok_r = cand_ok.reshape(R_, batch_size)
    first = jnp.argmax(ok_r, axis=0)                 # first valid round
    pick = first * batch_size + jnp.arange(batch_size, dtype=jnp.int32)
    env = cand_env[pick]
    t0 = cand_t0[pick]
    valid = jnp.any(ok_r, axis=0)
    env = jnp.where(valid, env, 0)
    t0 = jnp.where(valid, t0, 0)

    # Window fetch. Each window is a CONTIGUOUS (T+1, F) column span of
    # one env row of the packed ring (fields [obs|action|reward|done] in
    # one plane; the derived next-sequence is the +1-shifted slice of
    # the same span — the one possibly-wrapping element is either
    # time-adjacent or masked by done, per the validity rules above).
    T = trace_length
    d = buf.obs_dim
    F = d + 3
    if buf.is_chunked and T + 1 <= CHUNK:
        # two-stage fetch on the chunk-major plane: XLA's gather is
        # latency-bound per ROW, so stage 1 gathers each window's
        # enclosing CHUNK PAIR as wide (128*F-element) rows — 2N wide
        # rows instead of N*(T+1) tiny ones, with NO relayout (the
        # leading-dim flatten is free on the chunk-major layout) — and
        # stage 2 slices the T+1 window out of the small (N, 256, F)
        # intermediate with take_along_axis.
        nc = buf.data.shape[1]
        flat_c = buf.data.reshape(num_envs * nc, CHUNK * F)
        c0 = t0 // CHUNK
        idx_pair = jnp.concatenate([
            env * nc + c0,
            env * nc + (c0 + 1) % nc,
        ])
        pair = jnp.take(flat_c, idx_pair, axis=0)       # (2N, 128*F)
        win = jnp.concatenate(
            [pair[:batch_size], pair[batch_size:]], axis=1
        ).reshape(batch_size, 2 * CHUNK, F)
        off = (t0 % CHUNK)[:, None] + jnp.arange(
            T + 1, dtype=jnp.int32)[None, :]
        rows = jnp.take_along_axis(win, off[:, :, None], axis=1)
    else:
        offs = jnp.arange(T + 1, dtype=jnp.int32)[None, :]
        tt = (t0[:, None] + offs) % ring
        ee = jnp.broadcast_to(env[:, None], tt.shape)
        rows = buf._brf()[ee, tt]

    return SeqSample(
        obs=rows[:, :T, :d],
        action=rows[:, :T, d].astype(jnp.int32),
        reward=rows[:, :T, d + 1],
        next_obs=rows[:, 1:, :d],
        done=rows[:, :T, d + 2] > 0.5,
        valid=valid,
    )
