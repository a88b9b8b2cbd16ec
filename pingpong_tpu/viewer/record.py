"""Device-side trajectory recording for the viewer.

The reference viewer steps the env and models frame-by-frame inside the UI
loop (``/root/reference/tests/test_viewer_v2.py:134-187``). TPU-native
split: the episode is played entirely on device as one jitted scan
(policies greedy, hidden state threaded), the full state trajectory is
stacked and fetched to host once, and rendering replays it offline — the
UI never blocks the accelerator.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pingpong_tpu.env.pong import EnvParams, observe_a, observe_b, reset, step
from pingpong_tpu.evaluation.match import BOT, QNET, RNN
from pingpong_tpu.evaluation.registry import ModelEntry, load_entry
from pingpong_tpu.models.policy import ball_follower_action
from pingpong_tpu.models.qnet import qnet_apply
from pingpong_tpu.models.qnet_rnn import init_hidden, qnet_rnn_step


@dataclasses.dataclass
class Trajectory:
    """Host-side episode record (arrays of length T)."""

    ball_x: np.ndarray
    ball_y: np.ndarray
    ball_vx: np.ndarray
    ball_vy: np.ndarray
    spin: np.ndarray
    top_paddle_x: np.ndarray
    bottom_paddle_x: np.ndarray
    score_a: np.ndarray
    score_b: np.ndarray
    action_a: np.ndarray
    action_b: np.ndarray
    done: np.ndarray
    length: int

    def clipped(self) -> "Trajectory":
        t = self.length
        return Trajectory(
            **{
                f.name: getattr(self, f.name)[:t]
                for f in dataclasses.fields(self)
                if f.name != "length"
            },
            length=t,
        )


def _act(entry: ModelEntry, obs, hidden, tol: float):
    if entry.kind == BOT:
        return ball_follower_action(obs, tolerance=tol), hidden
    if entry.kind == QNET:
        q = qnet_apply(entry.params, obs)
        return jnp.argmax(q, axis=-1).astype(jnp.int32), hidden
    q, hidden = qnet_rnn_step(entry.params, obs, hidden)
    return jnp.argmax(q, axis=-1).astype(jnp.int32), hidden


def record_episode(
    env_params: EnvParams,
    entry_a: ModelEntry,
    entry_b: ModelEntry,
    key,
    max_steps: int = 5000,
    bot_tolerance: float = 0.02,
) -> Trajectory:
    """Play one greedy episode and return the full state trajectory."""
    load_entry(entry_a)
    load_entry(entry_b)
    state0 = reset(env_params, key)
    hid_a0 = init_hidden(entry_a.params) if entry_a.kind == RNN else jnp.zeros(())
    hid_b0 = init_hidden(entry_b.params) if entry_b.kind == RNN else jnp.zeros(())

    def step_fn(carry, _):
        state, hid_a, hid_b, finished = carry
        obs_a = observe_a(state)
        obs_b = observe_b(state)
        act_a, hid_a = _act(entry_a, obs_a, hid_a, bot_tolerance)
        act_b, hid_b = _act(entry_b, obs_b, hid_b, bot_tolerance)
        new_state, out = step(env_params, state, act_a, act_b)
        new_state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(finished, o, n), new_state, state
        )
        rec = (
            new_state.ball_x, new_state.ball_y, new_state.ball_vx,
            new_state.ball_vy, new_state.spin, new_state.top_paddle_x,
            new_state.bottom_paddle_x, new_state.score_a, new_state.score_b,
            act_a, act_b, out.done | finished,
        )
        return (new_state, hid_a, hid_b, finished | out.done), rec

    @jax.jit
    def run(state):
        carry = (state, hid_a0, hid_b0, jnp.asarray(False))
        _, recs = jax.lax.scan(step_fn, carry, None, length=max_steps)
        return recs

    recs = [np.asarray(r) for r in run(state0)]
    done = recs[11]
    length = int(done.argmax()) + 1 if done.any() else max_steps
    names = [
        "ball_x", "ball_y", "ball_vx", "ball_vy", "spin", "top_paddle_x",
        "bottom_paddle_x", "score_a", "score_b", "action_a", "action_b", "done",
    ]
    return Trajectory(**dict(zip(names, recs)), length=length).clipped()
