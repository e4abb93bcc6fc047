"""Fused streaming encode step: conv stem + encoder + adapter in ONE program.

The general streaming path runs ~9 device programs per feed (bucketed conv0,
conv1, encoder, adapter) — exact for arbitrary chunk sizes, but each dispatch
costs host/tunnel latency, which dominates p50 token latency at small
processing intervals.  For QUANTUM-ALIGNED chunks (mel multiple of 8) there
are no stride/grouping residuals at all:

    Q mel -> conv0 -> Q -> conv1/2 -> Q/2 enc positions -> adapter -> Q/8 rows

so the whole audio side fuses into one jitted program carrying the conv
tails and the encoder ring as explicit state.  The stream uses this path
whenever the pending mel is a quantum multiple (it processes the largest
aligned prefix and leaves the remainder for the exact bucketed path at
flush/finish).  One device call per feed + one burst call = the minimal
dispatch schedule per chunk.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..config import VoxtralConfig
from .encoder import EncKVCache, _enc_layer_step, _im2col, adapter_forward
from ..ops.norms import gelu, rms_norm
from ..ops.rope import rope_cos_sin

PyTree = Any


class ConvTails(NamedTuple):
    mel_tail: jax.Array   # [2, 128] f32
    c0_tail: jax.Array    # [2, 1280] cdtype

    @classmethod
    def create(cls, cfg: VoxtralConfig):
        return cls(
            jnp.zeros((2, cfg.encoder.n_mel), jnp.float32),
            jnp.zeros((2, cfg.encoder.dim), cfg.cdtype),
        )


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def fused_encode_chunk(
    enc_params: PyTree,
    adapter_params: PyTree,
    cfg: VoxtralConfig,
    mel: jax.Array,        # [Q, 128], Q a multiple of 8
    tails: ConvTails,
    cache: EncKVCache,
    enc_pos: jax.Array,    # scalar int32: encoder position of the first
                           # conv output in this chunk
):
    """Returns (adapter_rows [Q//8, 3072], new_tails, cache)."""
    e = cfg.encoder
    cdtype = cfg.cdtype
    q = mel.shape[0]
    assert q % 8 == 0, q

    # conv0 (k3 s1 causal, tail of 2 mel frames)
    xin = jnp.concatenate([tails.mel_tail, mel], axis=0)
    cols = _im2col(xin, 3, 1).astype(cdtype)
    c0 = gelu(
        jnp.dot(cols, enc_params["conv0_w"], preferred_element_type=jnp.float32)
        + enc_params["conv0_b"]
    ).astype(cdtype)
    new_mel_tail = xin[-2:]

    # conv1 (k3 s2 causal, tail of 2 conv0 outputs)
    xin1 = jnp.concatenate([tails.c0_tail, c0], axis=0)
    cols1 = _im2col(xin1, 3, 2).astype(cdtype)
    x = gelu(
        jnp.dot(cols1, enc_params["conv1_w"], preferred_element_type=jnp.float32)
        + enc_params["conv1_b"]
    ).astype(cdtype)
    new_c0_tail = xin1[-2:]

    # encoder transformer over Q/2 positions through the ring cache
    t = q // 2
    positions = enc_pos + jnp.arange(t, dtype=jnp.int32)
    cos, sin = rope_cos_sin(positions, e.head_dim, e.rope_theta)

    def body(carry, xs):
        x, k_all, v_all = carry
        lp, li = xs
        x, k_all, v_all = _enc_layer_step(
            e, cdtype, x, lp, k_all, v_all, li, enc_pos, cos, sin
        )
        return (x, k_all, v_all), None

    (x, k_all, v_all), _ = jax.lax.scan(
        body,
        (x, cache.k, cache.v),
        (enc_params["layers"], jnp.arange(e.n_layers, dtype=jnp.int32)),
    )
    y = rms_norm(x, enc_params["final_norm"], e.norm_eps).astype(cdtype)

    rows = adapter_forward(adapter_params, cfg, y)   # [Q//8, 3072]
    return rows, ConvTails(new_mel_tail, new_c0_tail), EncKVCache(k_all, v_all)
