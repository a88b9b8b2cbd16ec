"""Live viewer: host numpy inference parity + headless frame generation.

The live mode (viewer/live.py) steps the native C++ engine with host
numpy policies — the analog of the reference viewer's frame-by-frame loop
(/root/reference/tests/test_viewer_v2.py:134-187). These tests pin:
(1) numpy eval forwards == JAX eval forwards for both model families,
(2) the frame generator plays full episodes to a terminal score.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pingpong_tpu.config.schema import EnvConfig
from pingpong_tpu.models.qnet import qnet_apply, qnet_init
from pingpong_tpu.models.qnet_rnn import (
    init_hidden,
    qnet_rnn_init,
    qnet_rnn_step,
)
from pingpong_tpu.native.engine import engine_available
from pingpong_tpu.viewer.host_policy import (
    HostBot,
    HostQNet,
    HostQNetRNN,
    host_policy,
    observe_pair,
)

needs_engine = pytest.mark.skipif(
    not engine_available(), reason="native engine toolchain unavailable"
)


def test_host_qnet_matches_jax():
    params = qnet_init(jax.random.PRNGKey(3))
    host = HostQNet(params)
    obs = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(4), (32, 7), minval=-1, maxval=1)
    )
    q_jax = np.asarray(qnet_apply(params, jnp.asarray(obs)))
    q_np = host.q(obs)
    np.testing.assert_allclose(q_np, q_jax, rtol=1e-5, atol=1e-6)


def test_host_qnet_rnn_matches_jax_stream():
    params = qnet_rnn_init(
        jax.random.PRNGKey(5), feature_dim=32, lstm_hidden_dim=16,
        lstm_layers=2, head_hidden_dim=16,
    )
    host = HostQNetRNN(params)
    hid = init_hidden(params)
    key = jax.random.PRNGKey(6)
    for t in range(12):
        key, k = jax.random.split(key)
        obs = jax.random.uniform(k, (7,), minval=-1, maxval=1)
        q_jax, hid = qnet_rnn_step(params, obs, hid)
        q_np = host.q(np.asarray(obs))
        np.testing.assert_allclose(q_np, np.asarray(q_jax),
                                   rtol=2e-5, atol=1e-5, err_msg=f"t={t}")
    # reset gives back the zero-state response
    host.reset()
    obs0 = np.zeros(7, np.float32)
    q_fresh = HostQNetRNN(params).q(obs0)
    np.testing.assert_allclose(host.q(obs0), q_fresh, rtol=1e-6)


def test_host_policy_dispatch():
    assert isinstance(host_policy(None), HostBot)
    assert isinstance(host_policy(qnet_init(jax.random.PRNGKey(0))), HostQNet)
    assert isinstance(
        host_policy(qnet_rnn_init(jax.random.PRNGKey(0))), HostQNetRNN
    )


def test_observe_pair_mirror():
    from pingpong_tpu.native.engine import SoAState

    s = SoAState.zeros(1)
    s.ball_x[0], s.ball_y[0] = 0.3, 0.2
    s.ball_vx[0], s.ball_vy[0] = 0.01, -0.02
    s.top_x[0], s.bottom_x[0], s.spin[0] = 0.6, 0.4, 1.5
    a, b = observe_pair(s)
    np.testing.assert_allclose(
        a, [0.3, 0.8, 0.01, 0.02, 0.6, 0.4, 1.5], rtol=1e-6
    )
    np.testing.assert_allclose(
        b, [0.3, 0.2, 0.01, -0.02, 0.4, 0.6, 1.5], rtol=1e-6
    )


@needs_engine
def test_run_live_plays_episode_to_completion():
    from pingpong_tpu.viewer.live import run_live

    env_cfg = EnvConfig(
        paddle_speed=0.03, ball_speed_range=(0.03, 0.05), max_score=1,
    )
    frames = list(run_live(env_cfg, None, None, episodes=2, seed=1,
                           max_steps=3000, size=160))
    assert len(frames) > 20
    assert frames[0].shape == (160, 160, 3)
    assert frames[0].dtype == np.uint8


@needs_engine
def test_run_live_with_models():
    from pingpong_tpu.viewer.live import run_live

    env_cfg = EnvConfig(
        paddle_speed=0.03, ball_speed_range=(0.03, 0.05), max_score=1,
    )
    qa = qnet_init(jax.random.PRNGKey(1))
    rb = qnet_rnn_init(jax.random.PRNGKey(2))
    n = 0
    for _f in run_live(env_cfg, qa, rb, episodes=1, seed=0, max_steps=400,
                       size=120):
        n += 1
    assert n > 5
