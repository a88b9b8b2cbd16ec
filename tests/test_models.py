"""Model unit tests: shapes, noisy semantics, dueling identity, LSTM
parity vs torch.nn.LSTM, policy behavior."""

import numpy as np
import jax
import jax.numpy as jnp

from pingpong_tpu.models import (
    Hidden,
    ball_follower_action,
    epsilon_greedy,
    init_hidden,
    lstm_cell,
    noisy_apply,
    noisy_init,
    qnet_apply,
    qnet_init,
    qnet_rnn_apply,
    qnet_rnn_init,
    qnet_rnn_sample_noise,
    qnet_rnn_step,
    qnet_sample_noise,
    sample_noise,
)


def test_noisy_eval_uses_mu_only():
    key = jax.random.PRNGKey(0)
    p = noisy_init(key, 8, 4)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 8))
    out = noisy_apply(p, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(x @ p.w_mu + p.b_mu), rtol=1e-6
    )


def test_noisy_train_perturbs_and_noise_is_factorized():
    key = jax.random.PRNGKey(0)
    p = noisy_init(key, 8, 4)
    noise = sample_noise(jax.random.PRNGKey(2), 8, 4)
    # eps_w must be the outer product of the two factor vectors
    ew = np.asarray(noise.eps_w)
    assert np.linalg.matrix_rank(ew, tol=1e-5) == 1
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 8))
    out_train = noisy_apply(p, x, noise)
    out_eval = noisy_apply(p, x)
    assert not np.allclose(np.asarray(out_train), np.asarray(out_eval))
    # f(x) = sign(x)sqrt(|x|): |eps_b| entries distributed as sqrt|N(0,1)|
    assert np.abs(np.asarray(noise.eps_b)).max() < 5.0


def test_noisy_init_ranges():
    p = noisy_init(jax.random.PRNGKey(3), 64, 3, sigma_init=0.017)
    bound = 1 / np.sqrt(64)
    assert np.abs(np.asarray(p.w_mu)).max() <= bound
    assert np.allclose(np.asarray(p.w_sigma), 0.017)
    assert np.allclose(np.asarray(p.b_sigma), 0.017)


def test_qnet_shapes_and_dueling_identity():
    params = qnet_init(jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(1), (32, 7))
    q = qnet_apply(params, obs)
    assert q.shape == (32, 3)
    # dueling: mean_a Q = V  =>  Q - mean(Q) == A - mean(A); check the
    # decomposition is consistent: advantage of Q rows sums to zero after
    # subtracting V. Equivalent check: Q row-mean equals V head output.
    from pingpong_tpu.models.noisy import dense_apply
    h = jax.nn.relu(dense_apply(params.feat1, obs))
    h = jax.nn.relu(dense_apply(params.feat2, h))
    v = noisy_apply(params.fc_v, h)
    np.testing.assert_allclose(
        np.asarray(q.mean(axis=-1)), np.asarray(v[:, 0]), rtol=1e-4, atol=1e-5
    )


def test_qnet_noise_changes_q_but_same_key_is_deterministic():
    params = qnet_init(jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(1), (4, 7))
    n1 = qnet_sample_noise(jax.random.PRNGKey(5), params)
    n2 = qnet_sample_noise(jax.random.PRNGKey(6), params)
    n1b = qnet_sample_noise(jax.random.PRNGKey(5), params)
    q1 = np.asarray(qnet_apply(params, obs, n1))
    q2 = np.asarray(qnet_apply(params, obs, n2))
    q1b = np.asarray(qnet_apply(params, obs, n1b))
    assert not np.allclose(q1, q2)
    np.testing.assert_array_equal(q1, q1b)


def test_lstm_cell_matches_torch():
    import torch

    hidden, inp = 16, 12
    params = qnet_rnn_init(
        jax.random.PRNGKey(0), feature_dim=inp * 2, lstm_hidden_dim=hidden,
        lstm_layers=1, head_hidden_dim=0,
    )
    layer = params.lstm[0]
    # torch LSTM with identical weights (torch stores (4H, in))
    t = torch.nn.LSTM(input_size=inp * 2, hidden_size=hidden, num_layers=1,
                      batch_first=True)
    with torch.no_grad():
        t.weight_ih_l0.copy_(torch.tensor(np.asarray(layer.w_ih).T))
        t.weight_hh_l0.copy_(torch.tensor(np.asarray(layer.w_hh).T))
        t.bias_ih_l0.copy_(torch.tensor(np.asarray(layer.b_ih)))
        t.bias_hh_l0.copy_(torch.tensor(np.asarray(layer.b_hh)))

    B, T = 3, 5
    x = np.random.default_rng(0).normal(size=(B, T, inp * 2)).astype(np.float32)
    h0 = np.zeros((1, B, hidden), np.float32)
    with torch.no_grad():
        t_out, (t_h, t_c) = t(torch.tensor(x), (torch.tensor(h0), torch.tensor(h0)))

    # jax: scan the cell over time
    h = jnp.zeros((B, hidden))
    c = jnp.zeros((B, hidden))
    outs = []
    for step in range(T):
        h, c = lstm_cell(layer, jnp.asarray(x[:, step]), h, c)
        outs.append(h)
    np.testing.assert_allclose(
        np.stack([np.asarray(o) for o in outs], axis=1),
        t_out.numpy(), rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(h), t_h[0].numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), t_c[0].numpy(), rtol=1e-5, atol=1e-5)


def test_qnet_rnn_forward_shapes_and_step_consistency():
    params = qnet_rnn_init(jax.random.PRNGKey(0))
    B, T = 4, 8
    obs_seq = jax.random.normal(jax.random.PRNGKey(1), (B, T, 7))
    hidden = init_hidden(params, (B,))
    q, hid2 = qnet_rnn_apply(params, obs_seq, hidden)
    assert q.shape == (B, 3)
    assert hid2.h.shape == (1, B, 128)

    # stepping frame by frame must equal the scanned sequence forward
    hid = init_hidden(params, (B,))
    for step in range(T):
        q_step, hid = qnet_rnn_step(params, obs_seq[:, step], hid)
    np.testing.assert_allclose(np.asarray(q_step), np.asarray(q), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hid.h), np.asarray(hid2.h), rtol=1e-5, atol=1e-5)


def test_qnet_rnn_multilayer_and_no_shared_head():
    params = qnet_rnn_init(
        jax.random.PRNGKey(0), feature_dim=32, lstm_hidden_dim=16,
        lstm_layers=2, head_hidden_dim=0,
    )
    assert params.shared is None
    obs_seq = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 7))
    q, hid = qnet_rnn_apply(params, obs_seq, init_hidden(params, (2,)))
    assert q.shape == (2, 3) and hid.h.shape == (2, 2, 16)
    noise = qnet_rnn_sample_noise(jax.random.PRNGKey(2), params)
    assert noise.shared is None
    q2, _ = qnet_rnn_apply(params, obs_seq, init_hidden(params, (2,)), noise)
    assert not np.allclose(np.asarray(q), np.asarray(q2))


def test_epsilon_greedy_limits():
    q = jnp.asarray(np.tile([0.0, 1.0, 0.0], (1000, 1)))
    a0 = epsilon_greedy(jax.random.PRNGKey(0), q, jnp.float32(0.0))
    assert (np.asarray(a0) == 1).all()
    a1 = epsilon_greedy(jax.random.PRNGKey(0), q, jnp.float32(1.0))
    counts = np.bincount(np.asarray(a1), minlength=3)
    assert (counts > 200).all()  # roughly uniform


def test_ball_follower():
    # obs = (ball_x, ball_y, vx, vy, my_x, other_x, spin)
    obs = jnp.asarray([
        [0.2, 0.5, 0, 0, 0.5, 0.5, 0],   # ball left of paddle -> 0
        [0.8, 0.5, 0, 0, 0.5, 0.5, 0],   # right -> 2
        [0.505, 0.5, 0, 0, 0.5, 0.5, 0], # within tolerance -> 1
    ], dtype=jnp.float32)
    a = ball_follower_action(obs, tolerance=0.02)
    assert list(np.asarray(a)) == [0, 2, 1]


def test_bot_qnet_params_equals_hardcoded_bot():
    """bot_qnet_params: greedy argmax == ball_follower_action on random
    observations (train mode with real noise too — sigmas are zero)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pingpong_tpu.models.policy import ball_follower_action
    from pingpong_tpu.models.qnet import (
        bot_qnet_params,
        qnet_apply,
        qnet_greedy_action,
        qnet_sample_noise,
    )

    params = bot_qnet_params(tolerance=0.02)
    obs = jax.random.uniform(
        jax.random.PRNGKey(0), (4096, 7), minval=-1.0, maxval=1.0
    )
    # keep clear of the measure-zero |d| == tolerance boundary
    d = obs[:, 4] - obs[:, 0]
    obs = obs[jnp.abs(jnp.abs(d) - 0.02) > 1e-4]
    want = np.asarray(ball_follower_action(obs, tolerance=0.02))
    got = np.asarray(qnet_greedy_action(params, obs))
    np.testing.assert_array_equal(got, want)
    # train-mode forward with sampled noise: sigmas are all zero
    noise = qnet_sample_noise(jax.random.PRNGKey(1), params)
    got_train = np.asarray(
        jnp.argmax(qnet_apply(params, obs, noise), axis=-1)
    )
    np.testing.assert_array_equal(got_train, want)
