"""Causal audio encoder (32-layer, window 750) + conv stem + adapter.

TPU-native chunked design: every function here is shape-static and
composable — processing a sequence as one chunk or as any partition into
chunks yields identical results, because
  - the conv stem takes its 2-frame boundary tail as an explicit input
    (the stream state machine owns the tails, voxtral.c:537-715), and
  - the transformer attends through a ring KV cache with logical positions
    (vox_encoder_forward_incremental, voxtral_encoder.c:452-636).

Conv stem contract (voxtral_kernels.c:293-340, python:327-338):
  conv0: causal conv1d(128->1280, k3, s1) + GELU
  conv1: causal conv1d(1280->1280, k3, s2) + GELU
Causal padding = k - s zeros on the left; with an explicit 2-frame tail of
zeros this is exactly "prepend tail, drop the first ceil((k-s)/s) outputs",
which makes the first chunk and subsequent chunks a single code path.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..config import DOWNSAMPLE_FACTOR, EncoderConfig, VoxtralConfig
from . import quant
from ..ops.flash_encode import flash_bulk_attention
from ..ops.norms import gelu, rms_norm, silu
from ..ops.ring import ring_attention, ring_chunk_write, ring_write
from ..ops.rope import apply_rope_interleaved, rope_cos_sin

PyTree = Any


class EncKVCache(NamedTuple):
    k: jax.Array  # [L, KH, cap, D]
    v: jax.Array

    @classmethod
    def create(cls, cfg: EncoderConfig, kv_dtype, cap: int | None = None):
        cap = cap or cfg.kv_ring
        shape = (cfg.n_layers, cfg.n_kv_heads, cap, cfg.head_dim)
        return cls(jnp.zeros(shape, kv_dtype), jnp.zeros(shape, kv_dtype))


# ---------------------------------------------------------------------------
# Conv stem
# ---------------------------------------------------------------------------

def _im2col(x: jax.Array, kernel: int, stride: int) -> jax.Array:
    """x: [Tin, C] (tail already prepended).  Returns [Tout, kernel*C] where
    output j reads rows (stride*j + offset + k) with the causal alignment
    described in the module docstring (offset = stride - 1 relative to a
    2-frame tail for k=3)."""
    tin, c = x.shape
    start = stride - 1  # k=3, tail=2: s1 -> rows [t..t+2]; s2 -> rows [2j+1..2j+3]
    tout = (tin - start - kernel) // stride + 1
    cols = [
        jax.lax.slice_in_dim(x, start + k, start + k + stride * (tout - 1) + 1, stride)
        for k in range(kernel)
    ]
    return jnp.concatenate(cols, axis=-1).reshape(tout, kernel * c)


@partial(jax.jit, static_argnames=("cdtype_name",))
def conv0_chunk(enc_params: PyTree, mel: jax.Array, tail: jax.Array,
                cdtype_name: str = "bfloat16"):
    """mel: [T, 128]; tail: [2, 128] (zeros for the first chunk) ->
    ([T, 1280] GELU'd conv0 output, new tail [2, 128])."""
    cdtype = jnp.dtype(cdtype_name)
    xin = jnp.concatenate([tail, mel], axis=0)
    cols = _im2col(xin, 3, 1).astype(cdtype)
    y = (
        jnp.dot(cols, enc_params["conv0_w"], preferred_element_type=jnp.float32)
        + enc_params["conv0_b"]
    )
    new_tail = xin[-2:]
    return gelu(y).astype(cdtype), new_tail


@partial(jax.jit, static_argnames=("cdtype_name",))
def conv1_chunk(enc_params: PyTree, feed: jax.Array, tail: jax.Array,
                cdtype_name: str = "bfloat16"):
    """feed: [F, 1280] (F even); tail: [2, 1280] (zeros first) ->
    ([F//2, 1280], new tail [2, 1280])."""
    cdtype = jnp.dtype(cdtype_name)
    xin = jnp.concatenate([tail, feed], axis=0)
    cols = _im2col(xin, 3, 2).astype(cdtype)
    y = (
        jnp.dot(cols, enc_params["conv1_w"], preferred_element_type=jnp.float32)
        + enc_params["conv1_b"]
    )
    new_tail = xin[-2:]
    return gelu(y).astype(cdtype), new_tail


# ---------------------------------------------------------------------------
# Transformer
# ---------------------------------------------------------------------------

def _enc_layer_step(cfg: EncoderConfig, cdtype, x, lp, k_all, v_all, li,
                    pos0, cos, sin):
    t = x.shape[0]
    qkv_dim = cfg.qkv_dim

    xn = rms_norm(x, lp["attn_norm"], cfg.norm_eps).astype(cdtype)
    qkv = quant.mm(xn, lp, "wqkv", cdtype) + lp["bqkv"]
    q = qkv[:, :qkv_dim].reshape(t, cfg.n_heads, cfg.head_dim)
    k = qkv[:, qkv_dim : 2 * qkv_dim].reshape(t, cfg.n_kv_heads, cfg.head_dim)
    v = qkv[:, 2 * qkv_dim :].reshape(t, cfg.n_kv_heads, cfg.head_dim)

    q = apply_rope_interleaved(q, cos, sin)
    k = apply_rope_interleaved(k, cos, sin)

    if t == 1:
        slot = jnp.mod(pos0, k_all.shape[2])
        kt = jnp.swapaxes(k, 0, 1).astype(k_all.dtype)[None]
        vt = jnp.swapaxes(v, 0, 1).astype(v_all.dtype)[None]
        k_all = jax.lax.dynamic_update_slice(k_all, kt, (li, 0, slot, 0))
        v_all = jax.lax.dynamic_update_slice(v_all, vt, (li, 0, slot, 0))
        k_ring = jax.lax.dynamic_index_in_dim(k_all, li, axis=0, keepdims=False)
        v_ring = jax.lax.dynamic_index_in_dim(v_all, li, axis=0, keepdims=False)
    else:
        # custom_vmap: unbatched = rotate ring_write; under stream-vmap =
        # one in-place Pallas launch (the vmapped rotate's per-stream shift
        # lowers to a whole-cache gather — tools/tick_probe.py round 5)
        k_all, v_all, k_ring, v_ring = ring_chunk_write(
            k_all, v_all, k, v, li, pos0)

    use_flash = t > 1 and k_all.dtype.itemsize >= 2 and cfg.attn_impl == "flash"
    # "auto" resolves to xla: the Pallas bulk kernel measured SLOWER at the
    # full-size encoder shape (ops/flash_encode.py STATUS, docs/PERF.md)
    if use_flash:
        # online-softmax Pallas kernel: scores never reach HBM (the XLA
        # path round-trips [KH, T, cap] f32 per layer).  k_ring here is a
        # real buffer (ring_write's output), not a sliced-gather operand.
        attn = flash_bulk_attention(
            q.astype(cdtype), k_ring, v_ring, pos0,
            window=cfg.window, out_dtype=cdtype,
        ).reshape(t, qkv_dim)
    else:
        attn = ring_attention(
            q.astype(cdtype), k_ring, v_ring, pos0,
            window=cfg.window, out_dtype=cdtype,
        ).reshape(t, qkv_dim)

    x = x + (quant.mm(attn, lp, "wo", cdtype) + lp["bo"]).astype(x.dtype)

    hn = rms_norm(x, lp["ffn_norm"], cfg.norm_eps).astype(cdtype)
    g13 = quant.mm(hn, lp, "w13", cdtype)
    gate = silu(g13[:, : cfg.hidden]) * g13[:, cfg.hidden :]
    ffn = quant.mm(gate.astype(cdtype), lp, "w2", cdtype) + lp["b2"]
    return x + ffn.astype(x.dtype), k_all, v_all


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def encode_chunk(
    enc_params: PyTree,
    cfg: VoxtralConfig,
    x: jax.Array,        # [T, 1280] post-conv positions
    cache: EncKVCache,
    pos0: jax.Array,     # logical encoder position of x[0]
):
    """Incremental encoder forward over one chunk; returns the final-normed
    chunk output [T, 1280] and the updated ring cache."""
    e = cfg.encoder
    cdtype = cfg.cdtype
    t = x.shape[0]
    positions = pos0 + jnp.arange(t, dtype=jnp.int32)
    cos, sin = rope_cos_sin(positions, e.head_dim, e.rope_theta)
    x = x.astype(cdtype)

    def body(carry, xs):
        x, k_all, v_all = carry
        lp, li = xs
        x, k_all, v_all = _enc_layer_step(
            e, cdtype, x, lp, k_all, v_all, li, pos0, cos, sin
        )
        return (x, k_all, v_all), None

    (x, k_all, v_all), _ = jax.lax.scan(
        body,
        (x, cache.k, cache.v),
        (enc_params["layers"], jnp.arange(e.n_layers, dtype=jnp.int32)),
    )
    y = rms_norm(x, enc_params["final_norm"], e.norm_eps).astype(cdtype)
    return y, EncKVCache(k_all, v_all)


@partial(jax.jit, static_argnames=("cfg",))
def adapter_forward(adapter_params: PyTree, cfg: VoxtralConfig, enc_out: jax.Array):
    """[4G, 1280] -> 4x downsample reshape -> MLP -> [G, 3072]
    (voxtral_encoder.c:642-674, python:446-463).  No normalization."""
    cdtype = cfg.cdtype
    g = enc_out.shape[0] // DOWNSAMPLE_FACTOR
    ds = enc_out.reshape(g, DOWNSAMPLE_FACTOR * cfg.encoder.dim).astype(cdtype)
    h = gelu(
        jnp.einsum(
            "ti,oi->to", ds, adapter_params["w0"],
            preferred_element_type=jnp.float32,
        )
    ).astype(cdtype)
    return jnp.einsum(
        "th,dh->td", h, adapter_params["w1"], preferred_element_type=jnp.float32
    ).astype(cdtype)
