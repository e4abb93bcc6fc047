"""Device mesh + sharding specs for multi-chip serving.

The reference is single-device by design (SURVEY.md §2.12); the TPU-native
scale-out axes are:
  dp — data parallel over concurrent streams (batch axis of every
       activation and KV cache),
  tp — tensor parallel over attention heads / FFN hidden, for models or
       batch sizes that exceed one chip's HBM.
PP/SP/EP are deliberately absent: layers stay in one jitted graph, long
context is handled by sliding-window ring caches, and the model is dense.

Shardings are expressed as NamedSharding annotations; XLA GSPMD inserts the
ICI collectives.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import VoxtralConfig

PyTree = Any


def make_mesh(dp: int, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= dp * tp, f"need {dp * tp} devices, have {len(devices)}"
    devs = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(devs, ("dp", "tp"))


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def param_shardings(cfg: VoxtralConfig, mesh: Mesh) -> PyTree:
    """Weight shardings: replicated over dp, partitioned over tp on the
    head/hidden axes (megatron-style column/row parallel linears)."""
    rep = _ns(mesh)
    col = _ns(mesh, None, "tp", None)   # [L, out, in]: shard out (column-parallel)
    row = _ns(mesh, None, None, "tp")   # [L, out, in]: shard in (row-parallel)
    vec = _ns(mesh, None, None)

    enc = {
        "conv0_w": _ns(mesh, None, "tp"),
        "conv0_b": _ns(mesh, "tp"),
        "conv1_w": _ns(mesh, None, "tp"),
        "conv1_b": _ns(mesh, "tp"),
        "layers": {
            "attn_norm": vec, "bqkv": vec, "bo": vec, "b2": vec,
            "ffn_norm": vec,
            "wqkv": col, "wo": row, "w13": col, "w2": row,
        },
        "final_norm": rep,
    }
    ada_hid = _ns(mesh, None, None, None)
    dec = {
        "tok_embeddings": _ns(mesh, "tp", None),  # row-shard vocab for logits
        "layers": {
            "attn_norm": vec, "ffn_norm": vec,
            "wqkv": col, "wo": row, "w13": col, "w2": row,
            "ada_down": ada_hid, "ada_up": ada_hid,
        },
        "final_norm": rep,
    }
    adapter = {"w0": _ns(mesh, "tp", None), "w1": _ns(mesh, None, "tp")}
    return {"encoder": enc, "adapter": adapter, "decoder": dec}


def batch_shardings(mesh: Mesh):
    """Leading-axis (stream batch) sharding for activations and caches."""
    return NamedSharding(mesh, P("dp"))


def cache_shardings(mesh: Mesh):
    """KV caches [B, L, KH, cap, D]: streams over dp, kv heads over tp."""
    return NamedSharding(mesh, P("dp", None, "tp", None, None))


def shard_params(params: PyTree, shardings: PyTree) -> PyTree:
    return jax.tree.map(jax.device_put, params, shardings)
