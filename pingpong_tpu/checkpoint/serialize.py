"""Param-pytree <-> plain-dict conversion for stable checkpoint schemas.

NamedTuple pytrees are converted to nested dicts of arrays before saving so
the on-disk schema is independent of Python class layout, and rebuilt into
typed pytrees on load. The reference's checkpoint-compat headache (a 6-key
fallback chain plus a legacy layer-name migration,
``/root/reference/tests/test_round_robin.py:117-187``) is answered here
with explicit versioned schemas instead.
"""

from __future__ import annotations


import jax
import numpy as np

from pingpong_tpu.models.noisy import DenseParams, NoisyParams
from pingpong_tpu.models.qnet import QNetParams
from pingpong_tpu.models.qnet_rnn import LSTMLayerParams, QNetRNNParams


def _nt_to_dict(node):
    if hasattr(node, "_asdict"):
        return {k: _nt_to_dict(v) for k, v in node._asdict().items()}
    if isinstance(node, (tuple, list)):
        return [_nt_to_dict(v) for v in node]
    if node is None:
        return None
    return np.asarray(node)


def qnet_to_dict(params: QNetParams) -> dict:
    return {"kind": "qnet", **_nt_to_dict(params)}


def qnet_from_dict(d: dict) -> QNetParams:
    import jax.numpy as jnp

    def dense(sub):
        return DenseParams(w=jnp.asarray(sub["w"]), b=jnp.asarray(sub["b"]))

    def noisy(sub):
        return NoisyParams(
            w_mu=jnp.asarray(sub["w_mu"]),
            w_sigma=jnp.asarray(sub["w_sigma"]),
            b_mu=jnp.asarray(sub["b_mu"]),
            b_sigma=jnp.asarray(sub["b_sigma"]),
        )

    return QNetParams(
        feat1=dense(d["feat1"]),
        feat2=dense(d["feat2"]),
        fc_v=noisy(d["fc_v"]),
        fc_a=noisy(d["fc_a"]),
    )


def qnet_rnn_to_dict(params: QNetRNNParams) -> dict:
    return {"kind": "qnet_rnn", **_nt_to_dict(params)}


def qnet_rnn_from_dict(d: dict) -> QNetRNNParams:
    import jax.numpy as jnp

    def dense(sub):
        return DenseParams(w=jnp.asarray(sub["w"]), b=jnp.asarray(sub["b"]))

    def noisy(sub):
        if sub is None:
            return None
        return NoisyParams(
            w_mu=jnp.asarray(sub["w_mu"]),
            w_sigma=jnp.asarray(sub["w_sigma"]),
            b_mu=jnp.asarray(sub["b_mu"]),
            b_sigma=jnp.asarray(sub["b_sigma"]),
        )

    lstm = tuple(
        LSTMLayerParams(
            w_ih=jnp.asarray(l["w_ih"]),
            w_hh=jnp.asarray(l["w_hh"]),
            b_ih=jnp.asarray(l["b_ih"]),
            b_hh=jnp.asarray(l["b_hh"]),
        )
        for l in d["lstm"]
    )
    return QNetRNNParams(
        feat1=dense(d["feat1"]),
        feat2=dense(d["feat2"]),
        lstm=lstm,
        shared=noisy(d.get("shared")),
        fc_v=noisy(d["fc_v"]),
        fc_a=noisy(d["fc_a"]),
    )


def opt_state_to_leaves(opt_state) -> list:
    """Optimizer state -> flat list of arrays (structure is rebuilt at
    restore time from a freshly initialized state of the same optimizer,
    so the on-disk schema stays a plain array list)."""
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(opt_state)]


def opt_state_from_leaves(template_opt_state, leaves: list):
    import jax.numpy as jnp

    treedef = jax.tree_util.tree_structure(template_opt_state)
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(x) for x in leaves]
    )


def params_from_dict(d: dict):
    kind = d.get("kind", "qnet")
    if kind == "qnet":
        return qnet_from_dict(d)
    if kind == "qnet_rnn":
        return qnet_rnn_from_dict(d)
    raise ValueError(f"unknown params kind {kind!r}")
