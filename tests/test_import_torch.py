"""Torch-checkpoint import: schema conversion + numerical parity vs torch.

Uses synthetic torch state dicts shaped exactly like the reference's three
checkpoint schemas (legacy flat QNet, dueling NoisyNet QNet, QNetRNN), and
— when the read-only reference mount is present — the reference's real
committed checkpoints as an integration fixture.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from pingpong_tpu.checkpoint.serialize import params_from_dict
from pingpong_tpu.checkpoint.store import load_checkpoint
from pingpong_tpu.models.qnet import qnet_apply
from pingpong_tpu.models.qnet_rnn import init_hidden, qnet_rnn_apply
from pingpong_tpu.tools.import_torch import (
    convert_state_dict,
    import_torch_checkpoint,
)

REF = "/root/reference"


def make_legacy_qnet_sd(seed=0):
    g = torch.Generator().manual_seed(seed)
    return {
        "fc.0.weight": torch.randn(64, 7, generator=g),
        "fc.0.bias": torch.randn(64, generator=g),
        "fc.2.weight": torch.randn(64, 64, generator=g) * 0.1,
        "fc.2.bias": torch.randn(64, generator=g),
        "fc.4.weight": torch.randn(3, 64, generator=g) * 0.1,
        "fc.4.bias": torch.randn(3, generator=g),
    }


def torch_legacy_forward(sd, x):
    h = torch.relu(torch.nn.functional.linear(x, sd["fc.0.weight"], sd["fc.0.bias"]))
    h = torch.relu(torch.nn.functional.linear(h, sd["fc.2.weight"], sd["fc.2.bias"]))
    return torch.nn.functional.linear(h, sd["fc.4.weight"], sd["fc.4.bias"])


def test_legacy_qnet_q_values_identical():
    sd = make_legacy_qnet_sd()
    params = params_from_dict(convert_state_dict(sd))
    x = np.random.default_rng(0).normal(size=(16, 7)).astype(np.float32)
    want = torch_legacy_forward(sd, torch.tensor(x)).numpy()
    got = np.asarray(qnet_apply(params, jnp.asarray(x)))
    # migrated dueling net must equal the legacy flat net exactly:
    # Q = V + (A - mean A) with V = row-mean of fc.4 collapses to fc4(x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_rnn_conversion_parity():
    g = torch.Generator().manual_seed(1)
    H, F = 16, 32
    sd = {
        "features_extractor.0.weight": torch.randn(F // 2, 7, generator=g) * 0.3,
        "features_extractor.0.bias": torch.randn(F // 2, generator=g) * 0.1,
        "features_extractor.2.weight": torch.randn(F, F // 2, generator=g) * 0.3,
        "features_extractor.2.bias": torch.randn(F, generator=g) * 0.1,
        "lstm.weight_ih_l0": torch.randn(4 * H, F, generator=g) * 0.2,
        "lstm.weight_hh_l0": torch.randn(4 * H, H, generator=g) * 0.2,
        "lstm.bias_ih_l0": torch.randn(4 * H, generator=g) * 0.1,
        "lstm.bias_hh_l0": torch.randn(4 * H, generator=g) * 0.1,
        "fc_V.weight_mu": torch.randn(1, H, generator=g) * 0.2,
        "fc_V.bias_mu": torch.randn(1, generator=g) * 0.1,
        "fc_V.weight_sigma": torch.full((1, H), 0.017),
        "fc_V.bias_sigma": torch.full((1,), 0.017),
        "fc_A.weight_mu": torch.randn(3, H, generator=g) * 0.2,
        "fc_A.bias_mu": torch.randn(3, generator=g) * 0.1,
        "fc_A.weight_sigma": torch.full((3, H), 0.017),
        "fc_A.bias_sigma": torch.full((3,), 0.017),
    }
    params = params_from_dict(convert_state_dict(sd))
    assert params.shared is None

    # torch reference forward (eval mode: mu weights only)
    B, T = 3, 5
    x = np.random.default_rng(2).normal(size=(B, T, 7)).astype(np.float32)
    xt = torch.tensor(x)
    feat = torch.relu(torch.nn.functional.linear(
        xt.reshape(-1, 7), sd["features_extractor.0.weight"],
        sd["features_extractor.0.bias"]))
    feat = torch.relu(torch.nn.functional.linear(
        feat, sd["features_extractor.2.weight"],
        sd["features_extractor.2.bias"])).reshape(B, T, F)
    lstm = torch.nn.LSTM(F, H, 1, batch_first=True)
    with torch.no_grad():
        lstm.weight_ih_l0.copy_(sd["lstm.weight_ih_l0"])
        lstm.weight_hh_l0.copy_(sd["lstm.weight_hh_l0"])
        lstm.bias_ih_l0.copy_(sd["lstm.bias_ih_l0"])
        lstm.bias_hh_l0.copy_(sd["lstm.bias_hh_l0"])
        out, _ = lstm(feat)
    last = out[:, -1]
    v = torch.nn.functional.linear(last, sd["fc_V.weight_mu"], sd["fc_V.bias_mu"])
    a = torch.nn.functional.linear(last, sd["fc_A.weight_mu"], sd["fc_A.bias_mu"])
    want = (v + a - a.mean(dim=1, keepdim=True)).detach().numpy()

    q, _ = qnet_rnn_apply(params, jnp.asarray(x), init_hidden(params, (B,)))
    np.testing.assert_allclose(np.asarray(q), want, rtol=1e-4, atol=1e-5)


def test_import_wrapper_and_scalars(tmp_path):
    sd = make_legacy_qnet_sd(3)
    src = tmp_path / "m.pth"
    torch.save({"modelB": sd, "modelA": sd, "epsilon": 0.25, "episode": 77}, src)
    out = import_torch_checkpoint(str(src), str(tmp_path / "native"))
    payload = load_checkpoint(out)
    assert payload["model_kind"] == "qnet"
    assert payload["epsilon"] == 0.25 and payload["episode"] == 77
    assert payload["params_a"] is not None
    params_from_dict(payload["params_b"])  # loads cleanly


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference mount absent")
def test_import_real_reference_checkpoints(tmp_path):
    from pingpong_tpu.tools.import_torch import import_torch_dir

    # legacy flat QNet (model2-0) and modern RNN agent
    out1 = import_torch_checkpoint(
        f"{REF}/checkpoints/model2-0.pth", str(tmp_path / "model2-0")
    )
    p = params_from_dict(load_checkpoint(out1)["params_b"])
    q = qnet_apply(p, jnp.zeros((4, 7)))
    assert q.shape == (4, 3) and np.isfinite(np.asarray(q)).all()

    out2 = import_torch_checkpoint(
        f"{REF}/checkpoints_rnn/rnn_agent_4.pth", str(tmp_path / "rnn_agent_4")
    )
    pr = params_from_dict(load_checkpoint(out2)["params_b"])
    q, _ = qnet_rnn_apply(pr, jnp.zeros((2, 4, 7)), init_hidden(pr, (2,)))
    assert q.shape == (2, 3) and np.isfinite(np.asarray(q)).all()
