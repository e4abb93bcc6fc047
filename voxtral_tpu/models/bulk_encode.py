"""Bulk (offline) whole-clip encoder: conv stem + 32 layers + adapter with
NO ring cache — the reference's batch `vox_encoder_forward` analog
(voxtral_encoder.c:135-312, ~5x its own incremental mode; README.md:103).

When the whole clip is available, the incremental machinery is pure
overhead: the ring rotates O(cap) per chunk and the XLA ring attention
round-trips [KH, T, cap] f32 scores through HBM per layer.  Here attention
is the static-band Pallas kernel (ops/banded_encode.py) — scores stay in
VMEM, k/v are plain [T, KH, D] activations, and there is no cache state at
all, which also removes the ~671 MB/stream encoder ring from serving-mode
memory budgets (the round-2 full-pipeline OOM ceiling).

Chunking invariance does not apply offline (there is exactly one chunk);
equivalence with the incremental path is covered by
tests/test_bulk_encode.py.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..config import VoxtralConfig
from . import quant
from .encoder import _im2col, adapter_forward
from ..ops.banded_encode import banded_attention
from ..ops.norms import gelu, rms_norm, silu
from ..ops.rope import apply_rope_interleaved, rope_cos_sin

PyTree = Any


def _conv_stem(enc_params: PyTree, cfg: VoxtralConfig, mel: jax.Array,
               mel_tail: jax.Array, c0_tail: jax.Array):
    """conv0 + conv1 over one chunk with explicit boundary tails ->
    (x [Tm//2, dim], new_mel_tail, new_c0_tail)."""
    e = cfg.encoder
    cdtype = cfg.cdtype
    xin = jnp.concatenate([mel_tail, mel], axis=0)
    c0 = gelu(
        jnp.dot(_im2col(xin, 3, 1).astype(cdtype), enc_params["conv0_w"],
                preferred_element_type=jnp.float32)
        + enc_params["conv0_b"]
    ).astype(cdtype)
    xin1 = jnp.concatenate([c0_tail, c0], axis=0)
    x = gelu(
        jnp.dot(_im2col(xin1, 3, 2).astype(cdtype), enc_params["conv1_w"],
                preferred_element_type=jnp.float32)
        + enc_params["conv1_b"]
    ).astype(cdtype)
    return x, xin[-2:], xin1[-2:]


def bulk_transformer(enc_params: PyTree, cfg: VoxtralConfig, x: jax.Array,
                     kv_lo=None) -> jax.Array:
    """32-layer no-ring transformer over [T, dim] at positions 0..T-1
    (banded Pallas attention), final-normed.  `kv_lo` masks leading
    positions (the window-recompute streaming mode: positions below it are
    stale context padding).  RoPE uses relative positions — exact, since
    rotary attention depends only on position DIFFERENCES."""
    e = cfg.encoder
    cdtype = cfg.cdtype
    t = x.shape[0]
    positions = jnp.arange(t, dtype=jnp.int32)
    cos, sin = rope_cos_sin(positions, e.head_dim, e.rope_theta)
    qkv_dim = e.qkv_dim
    if kv_lo is None:
        kv_lo = jnp.int32(0)

    def body(x, lp):
        xn = rms_norm(x, lp["attn_norm"], e.norm_eps).astype(cdtype)
        qkv = quant.mm(xn, lp, "wqkv", cdtype) + lp["bqkv"]
        q = qkv[:, :qkv_dim].reshape(t, e.n_heads, e.head_dim)
        k = qkv[:, qkv_dim : 2 * qkv_dim].reshape(t, e.n_kv_heads, e.head_dim)
        v = qkv[:, 2 * qkv_dim :].reshape(t, e.n_kv_heads, e.head_dim)
        q = apply_rope_interleaved(q, cos, sin)
        k = apply_rope_interleaved(k, cos, sin)
        attn = banded_attention(
            q.astype(cdtype), k.astype(cdtype), v.astype(cdtype), kv_lo,
            window=e.window, out_dtype=cdtype,
        ).reshape(t, qkv_dim)
        x = x + (quant.mm(attn, lp, "wo", cdtype) + lp["bo"]).astype(x.dtype)
        hn = rms_norm(x, lp["ffn_norm"], e.norm_eps).astype(cdtype)
        g13 = quant.mm(hn, lp, "w13", cdtype)
        gate = silu(g13[:, : e.hidden]) * g13[:, e.hidden :]
        ffn = quant.mm(gate.astype(cdtype), lp, "w2", cdtype) + lp["b2"]
        return x + ffn.astype(x.dtype), None

    x, _ = jax.lax.scan(body, x.astype(cdtype), enc_params["layers"])
    return rms_norm(x, enc_params["final_norm"], e.norm_eps).astype(cdtype)


@partial(jax.jit, static_argnames=("cfg",))
def bulk_encode_clip(
    enc_params: PyTree,
    adapter_params: PyTree,
    cfg: VoxtralConfig,
    mel: jax.Array,        # [Tm, 128] whole padded clip, Tm % 8 == 0
) -> jax.Array:
    """Whole-clip mel -> adapter rows [Tm//8, 3072] (f32).

    Same math as the incremental path (models/encoder.py) with zero conv
    tails and positions 0..T-1; only the attention mechanism differs (banded
    kernel over activations instead of ring attention over a cache).
    vmap over a leading stream axis routes the kernel to one batched launch.
    """
    e = cfg.encoder
    assert mel.shape[0] % 8 == 0, mel.shape
    x, _, _ = _conv_stem(
        enc_params, cfg, mel,
        jnp.zeros((2, e.n_mel), mel.dtype),
        jnp.zeros((2, e.dim), cfg.cdtype),
    )
    y = bulk_transformer(enc_params, cfg, x)
    return adapter_forward(adapter_params, cfg, y).astype(jnp.float32)


def window_pad(cfg: VoxtralConfig, extra: int = 0) -> int:
    """Rows of encoder-INPUT context the window-recompute mode retains
    (8-aligned).  The minimum (extra=0) is window-1: every kept query sees
    its full layer-1 window.  Deeper layers' receptive fields reach further
    back (layer l depends on inputs up to l*(window-1) positions before the
    query), so the recompute TRUNCATES them — each `extra` window of
    retained context pushes the truncation one attention-hop deeper
    (exact through layer 1+extra), at ~window more recompute rows per tick
    and ~2 MB/stream of extra state at full size."""
    return -(-((1 + extra) * (cfg.encoder.window - 1)) // 8) * 8


@partial(jax.jit, static_argnames=("cfg",))
def window_encode_chunk(
    enc_params: PyTree,
    adapter_params: PyTree,
    cfg: VoxtralConfig,
    mel: jax.Array,        # [Q, 128], Q % 8 == 0
    mel_tail: jax.Array,   # [2, 128]
    c0_tail: jax.Array,    # [2, dim]
    xwin: jax.Array,       # [Wp, dim] last Wp conv outputs (encoder inputs)
    n_ctx: jax.Array,      # scalar i32: valid rows at the END of xwin
):
    """Window-RECOMPUTE streaming encode: instead of holding a per-stream
    MHA-32 KV ring (~0.5 GB/stream at full size — the serving-density
    wall), keep only the last `xwin.shape[0]` encoder INPUTS (~2 MB/stream
    at the window_pad minimum) and re-run the transformer over
    [context + chunk] each tick, keeping the chunk's outputs.

    This is the standard block-streaming APPROXIMATION, not the exact
    incremental math: every kept query sees its full layer-1 window, but
    context positions near the start of xwin are recomputed from truncated
    lower-layer windows (the ring path caches K/V computed from full
    history), so deep-layer outputs differ slightly — size xwin via
    window_pad(cfg, extra=k) to push the truncation k attention-hops
    deeper.  RoPE itself is relative, so the position shift adds no error
    beyond reduction order.  ~8x encoder FLOPs at typical intervals at the
    minimum pad, but the encoder is ~15% of serving compute and the banded
    kernel keeps it MXU-bound.

    Returns (rows [Q//8, 3072] f32, new_mel_tail, new_c0_tail, new_xwin,
    new_n_ctx)."""
    e = cfg.encoder
    assert mel.shape[0] % 8 == 0, mel.shape
    wp = xwin.shape[0]
    c1, new_mel_tail, new_c0_tail = _conv_stem(
        enc_params, cfg, mel, mel_tail, c0_tail
    )
    t = c1.shape[0]
    x_full = jnp.concatenate([xwin, c1], axis=0)     # [Wp + t, dim]
    kv_lo = jnp.maximum(wp - n_ctx, 0)
    y = bulk_transformer(enc_params, cfg, x_full, kv_lo)[wp:]
    rows = adapter_forward(adapter_params, cfg, y).astype(jnp.float32)
    new_xwin = x_full[t:]
    new_n_ctx = jnp.minimum(n_ctx + t, wp)
    return rows, new_mel_tail, new_c0_tail, new_xwin, new_n_ctx


# one jitted vmapped callable per config (params stay explicit arguments —
# closing over GB-scale weights embeds them as HLO constants and wedges TPU
# constant folding, the round-2 batched-encode lesson in CLAUDE.md)
@partial(jax.jit, static_argnames=("cfg",))
def bulk_encode_clips(enc_params, adapter_params, cfg: VoxtralConfig,
                      mel_b: jax.Array) -> jax.Array:
    """[B, Tm, 128] -> [B, Tm//8, 3072] f32: batched whole-clip encode in
    one program (the banded kernel's custom_vmap rule folds the stream axis
    into a single launch)."""
    return jax.vmap(
        lambda m: bulk_encode_clip(enc_params, adapter_params, cfg, m)
    )(mel_b)
