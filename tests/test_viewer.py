"""Viewer tests: trajectory recording + headless rendering."""

import dataclasses

import jax
import numpy as np

from pingpong_tpu.config import EnvConfig, ExperimentConfig
from pingpong_tpu.checkpoint.serialize import qnet_to_dict
from pingpong_tpu.checkpoint.store import save_checkpoint
from pingpong_tpu.env.pong import env_params_from_config
from pingpong_tpu.evaluation.match import BOT
from pingpong_tpu.evaluation.registry import BOT_ID, ModelEntry
from pingpong_tpu.models import qnet_init
from pingpong_tpu.viewer.record import record_episode
from pingpong_tpu.viewer.render import FrameRenderer, render_gif
from pingpong_tpu.viewer.replay import run_viewer

ENVP = env_params_from_config(EnvConfig())
BOT_ENTRY = ModelEntry(BOT_ID, BOT, None)


def test_record_episode_bot_vs_bot():
    traj = record_episode(ENVP, BOT_ENTRY, BOT_ENTRY, jax.random.PRNGKey(0),
                          max_steps=2000)
    assert traj.length > 10
    assert traj.done[-1] or traj.length == 2000
    # physics stayed in bounds horizontally
    assert (traj.ball_x >= 0).all() and (traj.ball_x <= 1).all()
    # scores are monotone
    assert (np.diff(traj.score_a.astype(int)) >= 0).all()


def test_frame_renderer_shapes():
    traj = record_episode(ENVP, BOT_ENTRY, BOT_ENTRY, jax.random.PRNGKey(1),
                          max_steps=500)
    frame = FrameRenderer().render_frame(traj, traj.length - 1, 0.2, 200)
    assert frame.shape == (200, 200, 3)
    assert frame.dtype == np.uint8
    assert frame.max() > 50  # something was drawn


def test_render_gif(tmp_path):
    traj = record_episode(ENVP, BOT_ENTRY, BOT_ENTRY, jax.random.PRNGKey(2),
                          max_steps=300)
    out = render_gif(traj, tmp_path / "ep.gif", 0.2, size=160, every=4)
    from PIL import Image

    img = Image.open(out)
    assert img.n_frames > 1


def test_effect_manager_spawns_and_decays_particles():
    from pingpong_tpu.viewer.render import EffectManager

    m = EffectManager()
    m.add_collision(100.0, 0.0)
    # one ring + N particles
    assert m.active_count == 1 + EffectManager.N_PARTICLES
    for e in list(m.effects):
        x0 = e.x
        e.update()
    # particles moved, everything still alive after one tick
    assert any(e.x != 100.0 for e in m.effects)
    for _ in range(40):
        for e in m.effects:
            e.update()
        m.effects = [e for e in m.effects if e.alive]
    assert m.active_count == 0


def test_ball_sprite_rotates_with_spin():
    """The ball sprite angle accumulates spin (ref test_viewer.py:282-293):
    frames of a spinning ball must differ at the ball pixels."""
    from pingpong_tpu.viewer.render import FrameRenderer, make_ball_sprite

    spr = make_ball_sprite()
    assert spr.size[0] > 8 and spr.mode == "RGBA"
    traj = record_episode(ENVP, BOT_ENTRY, BOT_ENTRY, jax.random.PRNGKey(3),
                          max_steps=50)
    r = FrameRenderer(ball_sprite=True)
    f1 = r.render_frame(traj, 5, 0.2, 200)
    a1 = float(r.spin_angle)
    r2 = FrameRenderer(ball_sprite=True)
    # render the same frame but with a different accumulated angle
    r2.spin_angle = a1 + 90.0
    f2 = r2.render_frame(traj, 5, 0.2, 200)
    assert (f1 != f2).any()


def test_speed_slider_mapping():
    from pingpong_tpu.viewer.pygame_ui import SPEED_MAX, SPEED_MIN, SpeedSlider

    s = SpeedSlider(x=60, y=400, w=280, value=1.0)
    assert s._value_from_px(60) == SPEED_MIN
    assert abs(s._value_from_px(60 + 280) - SPEED_MAX) < 1e-9
    # round trip: handle position maps back to the value
    s.value = 2.5
    assert abs(s._value_from_px(s.handle_px()) - 2.5) < 0.05
    # clamped outside the track
    assert s._value_from_px(-100) == SPEED_MIN
    assert abs(s._value_from_px(10_000) - SPEED_MAX) < 1e-9


def test_run_viewer_with_checkpoint(tmp_path):
    save_checkpoint(tmp_path / "m1", {"params_b": qnet_to_dict(
        qnet_init(jax.random.PRNGKey(0)))})
    cfg = dataclasses.replace(
        ExperimentConfig(), env=EnvConfig(render_size=160, max_episode_steps=300)
    )
    rc = run_viewer(cfg, model_a=None, model_b=str(tmp_path / "m1"),
                    out=str(tmp_path / "v.gif"), episodes=1, seed=0,
                    max_steps=300)
    assert rc == 0
    assert (tmp_path / "v.gif").exists()


def test_env_debug_renderer_headless():
    """In-env debug renderer (ref my_pong_env_2p.py:265-306 parity):
    renders any batched EnvState headlessly to RGB frames."""
    import jax
    import numpy as np

    from pingpong_tpu.config import EnvConfig
    from pingpong_tpu.env.debug_render import DebugRenderer
    from pingpong_tpu.env.pong import (
        env_params_from_config,
        reset,
        step_autoreset_batch,
    )
    from pingpong_tpu.models.policy import ball_follower_action
    from pingpong_tpu.env.pong import observe

    cfg = EnvConfig(max_episode_steps=64)
    params = env_params_from_config(cfg)
    key = jax.random.PRNGKey(0)
    state = jax.vmap(reset, in_axes=(None, 0))(
        params, jax.random.split(key, 4)
    )
    r = DebugRenderer(cfg.paddle_width, size=200, window=False)
    frames = []
    for i in range(5):
        obs_a, obs_b = observe(state)
        state, _ = step_autoreset_batch(
            params, state, jax.random.PRNGKey(i),
            ball_follower_action(obs_a), ball_follower_action(obs_b),
        )
        frames.append(r.render(state, index=1))
    assert frames[0].shape == (200, 200, 3)
    # consecutive frames differ (the ball moves)
    assert any(
        not np.array_equal(frames[i], frames[i + 1]) for i in range(4)
    )
    r.close()
