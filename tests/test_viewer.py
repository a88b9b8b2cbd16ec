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
