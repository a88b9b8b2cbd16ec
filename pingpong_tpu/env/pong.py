"""Two-player spin-physics Pong as a pure-functional JAX state machine.

This is the TPU-native re-design of the reference environment
(``/root/reference/envs/my_pong_env_2p.py:10-263``). Behavioral parity:

* unit-square world; paddles at y=0 (player A, top) and y=1 (player B,
  bottom); actions {0: -paddle_speed, 1: stay, 2: +paddle_speed}, paddle x
  clipped to [0, 1]  (ref :117-128)
* Magnus force ``vx += magnus_factor * spin * vy`` when spin is enabled
  (ref :135-136), then Euler integration (ref :139-140)
* side walls reflect with position mirroring ``x<0 -> -x``, ``x>1 -> 2-x``
  (ref :143-148)
* when the ball crosses a paddle line it either hits the paddle (rigid-body
  collision via :func:`collide_sphere_with_moving_plane`, ball snapped back
  onto the line, bounce counter incremented, possible speed scale-up,
  ref :151-178/189-215) or scores for the opponent (+1/-1 reward, score
  increment, episode done at ``max_score``, ref :179-186/216-223). A missed
  ball is NOT reset: subsequent steps keep scoring while it stays out of
  bounds, exactly as in the reference (whose early `return` leaves the ball
  beyond the line).
* per-player 7-D observations ``(ball_x, ball_y, ball_vx, ball_vy,
  my_paddle_x, other_paddle_x, spin)`` with player A's view vertically
  mirrored (ref :235-257)
* serve randomization: ball at (0.5, 0.5); speed ~ U(ball_speed_range);
  serve angle from one of two intervals chosen with p=0.5; spin ~
  U(spin_range) (ref :94-111)

TPU-native differences (deliberate, documented):

* the step is branchless (``jnp.where`` masks instead of Python ``if``) so
  it jits once and ``vmap``s over arbitrarily large env batches;
* all state lives in a flat :class:`EnvState` pytree of f32/i32 leaves —
  batching is just a leading axis, and sharding the batch over a device
  mesh is a ``NamedSharding`` on that axis;
* randomness is counter-based ``jax.random`` threaded through explicit
  keys (the reference uses the global Python ``random``). The framework's
  reproducibility contract: identical seed + config + batch layout =>
  bit-identical trajectories, scores and returns on the same backend.
* computations are float32 (the reference runs Python float64 math with
  f32 observations). Trajectories agree with a float64 oracle to ~1e-5
  per step; the compounding speed scale-up means long-horizon states can
  drift, which is within the framework's tolerance story (scores/returns
  remain distribution-identical).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from pingpong_tpu.config.schema import EnvConfig
from pingpong_tpu.env.physics import collide_sphere_with_moving_plane

Array = jax.Array


class EnvParams(NamedTuple):
    """Static-per-run env parameters (a pytree of scalars: jit-friendly)."""

    paddle_width: Array
    paddle_speed: Array
    max_score: Array          # i32
    enable_spin: Array        # f32 mask (0.0 or 1.0)
    magnus_factor: Array
    restitution: Array
    friction: Array
    ball_mass: Array
    ball_radius: Array
    speed_min: Array
    speed_max: Array
    spin_min: Array
    spin_max: Array
    angle_intervals: Array    # (2, 2) degrees
    speed_scale_every: Array  # i32
    speed_increment: Array


class EnvState(NamedTuple):
    """Per-env dynamic state. Batched: every leaf gains a leading axis."""

    ball_x: Array
    ball_y: Array
    ball_vx: Array
    ball_vy: Array
    spin: Array
    top_paddle_x: Array      # player A
    bottom_paddle_x: Array   # player B
    score_a: Array           # i32
    score_b: Array           # i32
    bounce_count: Array      # i32
    t: Array                 # i32 steps since reset
    done: Array              # bool


class StepOut(NamedTuple):
    obs_a: Array
    obs_b: Array
    reward_a: Array
    reward_b: Array
    done: Array


def env_params_from_config(cfg: EnvConfig) -> EnvParams:
    f32 = jnp.float32
    return EnvParams(
        paddle_width=f32(cfg.paddle_width),
        paddle_speed=f32(cfg.paddle_speed),
        max_score=jnp.int32(cfg.max_score),
        enable_spin=f32(1.0 if cfg.enable_spin else 0.0),
        magnus_factor=f32(cfg.magnus_factor),
        restitution=f32(cfg.restitution),
        friction=f32(cfg.friction),
        ball_mass=f32(cfg.ball_mass),
        ball_radius=f32(cfg.world_ball_radius),
        speed_min=f32(cfg.ball_speed_range[0]),
        speed_max=f32(cfg.ball_speed_range[1]),
        spin_min=f32(cfg.spin_range[0]),
        spin_max=f32(cfg.spin_range[1]),
        angle_intervals=jnp.asarray(cfg.ball_angle_intervals, dtype=jnp.float32),
        speed_scale_every=jnp.int32(cfg.speed_scale_every),
        speed_increment=f32(cfg.speed_increment),
    )


# ---------------------------------------------------------------------------
# Serve / reset
# ---------------------------------------------------------------------------

def _serve(params: EnvParams, key: Array) -> Tuple[Array, Array, Array]:
    """Randomized serve: returns (vx, vy, spin). Ref my_pong_env_2p.py:94-111."""
    k_speed, k_side, k_angle, k_spin = jax.random.split(key, 4)
    speed = jax.random.uniform(
        k_speed, (), jnp.float32, params.speed_min, params.speed_max
    )
    u = jax.random.uniform(k_angle, (), jnp.float32)
    lo0, hi0 = params.angle_intervals[0, 0], params.angle_intervals[0, 1]
    lo1, hi1 = params.angle_intervals[1, 0], params.angle_intervals[1, 1]
    pick_second = jax.random.uniform(k_side, (), jnp.float32) >= 0.5
    angle_deg = jnp.where(
        pick_second, lo1 + u * (hi1 - lo1), lo0 + u * (hi0 - lo0)
    )
    angle = jnp.deg2rad(angle_deg)
    vx = speed * jnp.cos(angle)
    vy = speed * jnp.sin(angle)
    spin = jax.random.uniform(
        k_spin, (), jnp.float32, params.spin_min, params.spin_max
    )
    return vx, vy, spin


def reset(params: EnvParams, key: Array) -> EnvState:
    """Fresh episode state (single env; ``vmap`` over keys for a batch)."""
    vx, vy, spin = _serve(params, key)
    f32 = jnp.float32
    i32 = jnp.int32
    return EnvState(
        ball_x=f32(0.5),
        ball_y=f32(0.5),
        ball_vx=vx,
        ball_vy=vy,
        spin=spin,
        top_paddle_x=f32(0.5),
        bottom_paddle_x=f32(0.5),
        score_a=i32(0),
        score_b=i32(0),
        bounce_count=i32(0),
        t=i32(0),
        done=jnp.asarray(False),
    )


# ---------------------------------------------------------------------------
# Observations
# ---------------------------------------------------------------------------

def observe_a(state: EnvState) -> Array:
    """A's mirrored view (ref :235-245). Works on scalar or batched state."""
    return jnp.stack(
        [
            state.ball_x,
            1.0 - state.ball_y,
            state.ball_vx,
            -state.ball_vy,
            state.top_paddle_x,
            state.bottom_paddle_x,
            state.spin,
        ],
        axis=-1,
    )


def observe_b(state: EnvState) -> Array:
    """B's direct view (ref :247-257)."""
    return jnp.stack(
        [
            state.ball_x,
            state.ball_y,
            state.ball_vx,
            state.ball_vy,
            state.bottom_paddle_x,
            state.top_paddle_x,
            state.spin,
        ],
        axis=-1,
    )


def observe(state: EnvState) -> Tuple[Array, Array]:
    return observe_a(state), observe_b(state)


# ---------------------------------------------------------------------------
# Step
# ---------------------------------------------------------------------------

def _paddle_velocity(action: Array, paddle_speed: Array) -> Array:
    """Action {0,1,2} -> {-v, 0, +v}."""
    a = action.astype(jnp.float32)
    return (a - 1.0) * paddle_speed  # 0->-v, 1->0, 2->+v


def step(
    params: EnvParams, state: EnvState, action_a: Array, action_b: Array
) -> Tuple[EnvState, StepOut]:
    """One masked env transition. Pure; ``vmap``/``jit``-safe.

    Mirrors the control flow of ``my_pong_env_2p.py:116-225`` with the two
    mutually-exclusive paddle-line branches expressed as masks.
    """
    f32 = jnp.float32
    ps = params.paddle_speed

    # --- paddle kinematics (ref :117-128)
    top_x = jnp.clip(state.top_paddle_x + _paddle_velocity(action_a, ps), 0.0, 1.0)
    bot_x = jnp.clip(state.bottom_paddle_x + _paddle_velocity(action_b, ps), 0.0, 1.0)

    # --- Magnus + integration (ref :135-140)
    vx = state.ball_vx + params.enable_spin * params.magnus_factor * state.spin * state.ball_vy
    vy = state.ball_vy
    x = state.ball_x + vx
    y = state.ball_y + vy

    # --- side walls (ref :143-148)
    hit_left = x < 0.0
    hit_right = x > 1.0
    x = jnp.where(hit_left, -x, jnp.where(hit_right, 2.0 - x, x))
    vx = jnp.where(hit_left | hit_right, -vx, vx)

    half_w = params.paddle_width * 0.5

    # --- top paddle line y<0 (player A defends) (ref :151-186)
    cross_top = y < 0.0
    in_top = (top_x - half_w <= x) & (x <= top_x + half_w)
    hit_top = cross_top & in_top
    miss_top = cross_top & ~in_top
    u_a = _paddle_velocity(action_a, ps)
    vn_t, vt_t, om_t = collide_sphere_with_moving_plane(
        vy, vx, u_a, state.spin,
        params.restitution, params.friction, params.ball_mass, params.ball_radius,
    )

    # --- bottom paddle line y>1 (player B defends) (ref :189-223)
    cross_bot = y > 1.0
    in_bot = (bot_x - half_w <= x) & (x <= bot_x + half_w)
    hit_bot = cross_bot & in_bot
    miss_bot = cross_bot & ~in_bot
    u_b = _paddle_velocity(action_b, ps)
    vn_b, vt_b, om_b = collide_sphere_with_moving_plane(
        -vy, vx, u_b, state.spin,
        params.restitution, params.friction, params.ball_mass, params.ball_radius,
    )

    # --- compose collision outcomes (branches are exclusive: y<0 vs y>1)
    hit_any = hit_top | hit_bot
    vy = jnp.where(hit_top, vn_t, jnp.where(hit_bot, -vn_b, vy))
    vx = jnp.where(hit_top, vt_t, jnp.where(hit_bot, vt_b, vx))
    spin = jnp.where(hit_top, om_t, jnp.where(hit_bot, om_b, state.spin))
    y = jnp.where(hit_top, 0.0, jnp.where(hit_bot, 1.0, y))

    # --- bounce counting + progressive speed-up (ref :176-178, 227-232)
    bounce = state.bounce_count + hit_any.astype(jnp.int32)
    scale_now = hit_any & (bounce % params.speed_scale_every == 0)
    scale = jnp.where(scale_now, 1.0 + params.speed_increment, 1.0)
    vx = vx * scale
    vy = vy * scale

    # --- scoring (ref :179-186, 216-223)
    reward_b = miss_top.astype(f32) - miss_bot.astype(f32)
    reward_a = -reward_b
    score_a = state.score_a + miss_bot.astype(jnp.int32)
    score_b = state.score_b + miss_top.astype(jnp.int32)
    done = (score_a >= params.max_score) | (score_b >= params.max_score)

    new_state = EnvState(
        ball_x=x,
        ball_y=y,
        ball_vx=vx,
        ball_vy=vy,
        spin=spin,
        top_paddle_x=top_x,
        bottom_paddle_x=bot_x,
        score_a=score_a,
        score_b=score_b,
        bounce_count=bounce,
        t=state.t + 1,
        done=done,
    )
    out = StepOut(
        obs_a=observe_a(new_state),
        obs_b=observe_b(new_state),
        reward_a=reward_a,
        reward_b=reward_b,
        done=done,
    )
    return new_state, out


def _serve_batch(params: EnvParams, key: Array, batch_shape) -> Tuple[Array, Array, Array]:
    """Batched serve randomization: one key yields (vx, vy, spin) arrays of
    ``batch_shape``. Distribution identical to :func:`_serve`; draws cost
    4 batch-shaped uniforms instead of a per-env key-split chain (the
    throughput-critical difference for lockstep auto-reset: threefry key
    splitting per env per step dominated rollout time)."""
    k_speed, k_side, k_angle, k_spin = jax.random.split(key, 4)
    speed = jax.random.uniform(
        k_speed, batch_shape, jnp.float32, params.speed_min, params.speed_max
    )
    u = jax.random.uniform(k_angle, batch_shape, jnp.float32)
    lo0, hi0 = params.angle_intervals[0, 0], params.angle_intervals[0, 1]
    lo1, hi1 = params.angle_intervals[1, 0], params.angle_intervals[1, 1]
    pick_second = jax.random.uniform(k_side, batch_shape, jnp.float32) >= 0.5
    angle = jnp.deg2rad(
        jnp.where(pick_second, lo1 + u * (hi1 - lo1), lo0 + u * (hi0 - lo0))
    )
    spin = jax.random.uniform(
        k_spin, batch_shape, jnp.float32, params.spin_min, params.spin_max
    )
    return speed * jnp.cos(angle), speed * jnp.sin(angle), spin


def step_autoreset_batch(
    params: EnvParams,
    state: EnvState,
    key: Array,
    action_a: Array,
    action_b: Array,
    max_episode_steps: int = 0,
) -> Tuple[EnvState, StepOut]:
    """Batched step + masked auto-reset using ONE key for the whole batch.

    The hot-loop form: ``state`` has a leading batch axis; the env step is
    vmapped, termination/truncation is masked, and fresh serves for the
    ended envs come from :func:`_serve_batch`. Identical semantics to
    vmapping :func:`step_autoreset` over per-env keys, with a different
    (cheaper) randomness layout — the framework's reproducibility contract
    covers layout + seed, not cross-layout bit equality.
    """
    new_state, out = jax.vmap(step, in_axes=(None, 0, 0, 0))(
        params, state, action_a, action_b
    )
    ended = out.done
    if max_episode_steps:
        truncated = new_state.t >= max_episode_steps
        ended = ended | truncated
        out = out._replace(done=out.done | truncated)
    batch_shape = state.ball_x.shape
    svx, svy, sspin = _serve_batch(params, key, batch_shape)
    f32 = jnp.float32
    i32 = jnp.int32
    zero_i = jnp.zeros(batch_shape, i32)
    next_state = EnvState(
        ball_x=jnp.where(ended, f32(0.5), new_state.ball_x),
        ball_y=jnp.where(ended, f32(0.5), new_state.ball_y),
        ball_vx=jnp.where(ended, svx, new_state.ball_vx),
        ball_vy=jnp.where(ended, svy, new_state.ball_vy),
        spin=jnp.where(ended, sspin, new_state.spin),
        top_paddle_x=jnp.where(ended, f32(0.5), new_state.top_paddle_x),
        bottom_paddle_x=jnp.where(ended, f32(0.5), new_state.bottom_paddle_x),
        score_a=jnp.where(ended, zero_i, new_state.score_a),
        score_b=jnp.where(ended, zero_i, new_state.score_b),
        bounce_count=jnp.where(ended, zero_i, new_state.bounce_count),
        t=jnp.where(ended, zero_i, new_state.t),
        done=jnp.zeros(batch_shape, jnp.bool_),
    )
    return next_state, out


def step_autoreset(
    params: EnvParams,
    state: EnvState,
    key: Array,
    action_a: Array,
    action_b: Array,
    max_episode_steps: int = 0,
) -> Tuple[EnvState, StepOut]:
    """Step with masked auto-reset-on-done (single env; vmap for batches).

    The returned :class:`StepOut` carries the *terminal* observation and
    reward of the finishing step (what a transition should store); the
    returned state is already re-served when the episode ended. This is the
    lockstep-vectorization replacement for the reference's per-episode
    ``env.reset()`` host loop (train_iterative.py:238-245).

    ``max_episode_steps > 0`` additionally truncates episodes at a step cap
    (the RNN trainer's cap, train_rnn_iterative.py:752); truncation sets
    ``done`` in the emitted transition without a score having been reached.
    """
    new_state, out = step(params, state, action_a, action_b)
    ended = out.done
    if max_episode_steps:
        truncated = new_state.t >= max_episode_steps
        ended = ended | truncated
        out = out._replace(done=out.done | truncated)
    fresh = reset(params, key)
    next_state = jax.tree_util.tree_map(
        lambda r, n: jnp.where(ended, r, n), fresh, new_state
    )
    return next_state, out
