"""Numerical-safety and profiling utilities.

The SURVEY §5 aux plan: the reference has no profiler hooks or sanitizers;
the TPU framework supplies ``jax.profiler`` trace capture around hot
sections and ``checkify``-based NaN/overflow checking for the physics
kernel (useful when tuning env params like restitution > 1 that can
diverge).
"""

from __future__ import annotations

import contextlib
import jax
import jax.numpy as jnp


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def checked_env_step(params, state, action_a, action_b):
    """Env step wrapped in checkify: returns (error, (state, out)).

    ``error.throw()`` raises with a message if any NaN/Inf appeared in the
    ball state after the step — the compounding speed scale-up
    (my_pong_env_2p.py:227-232 analog) can overflow f32 on degenerate
    configs.
    """
    from jax.experimental import checkify

    from pingpong_tpu.env.pong import step

    def body(params, state, aa, ab):
        new_state, out = step(params, state, aa, ab)
        checkify.check(
            jnp.isfinite(new_state.ball_x) & jnp.isfinite(new_state.ball_vx)
            & jnp.isfinite(new_state.ball_vy) & jnp.isfinite(new_state.spin),
            "non-finite ball state after env step",
        )
        return new_state, out

    checked = checkify.checkify(body)
    return checked(params, state, action_a, action_b)


def assert_finite_tree(tree, name: str = "tree") -> None:
    """Host-side finite check over every leaf of a pytree."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            raise FloatingPointError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}"
            )
