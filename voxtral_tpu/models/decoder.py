"""Ministral-3 decoder: prefill, single-step, and burst decode on TPU.

TPU-native design (SURVEY.md §7):
  - One jitted program per phase; the reference's "monolithic Metal command
    buffer per token" (voxtral_metal.m:2443-2711) becomes one XLA program.
  - Layers run under lax.scan over stacked params; the KV cache is a carry
    updated in place via dynamic_update_slice (donated buffers).
  - The rolling KV cache (voxtral_decoder.c:171-404) is a fixed ring; see
    ops/ring.py.  RoPE uses logical positions, so ring reuse is exact.
  - Burst decode: the reference decodes one token per available adapter
    position in a host loop (voxtral.c:1056-1092); here the whole burst is a
    single lax.scan with on-device argmax + embedding feedback — one device
    round-trip per encoder chunk instead of one per token.

Numerics follow python_simple_implementation.py:522-664: RMSNorm/RoPE/softmax/
logits in float32, matmuls in bf16 with f32 accumulation.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..config import (
    FLASH_RING_THRESHOLD,
    TOKEN_TEXT_MIN,
    DecoderConfig,
    VoxtralConfig,
)
from . import quant
from ..ops.flash_decode import flash_decode_write_attention
from ..ops.norms import gelu, rms_norm, silu
from ..ops.ring import ring_attention, ring_rows_write, ring_write
from ..ops.rope import apply_rope_interleaved, rope_cos_sin

PyTree = Any


class KVCache(NamedTuple):
    """Per-layer ring buffers: k/v are [L, KH, cap, D] (head-major so the
    slot axis streams contiguously per head)."""
    k: jax.Array
    v: jax.Array

    @classmethod
    def create(cls, cfg: DecoderConfig, kv_dtype, cap: int | None = None):
        cap = cap or cfg.kv_ring
        shape = (cfg.n_layers, cfg.n_kv_heads, cap, cfg.head_dim)
        return cls(jnp.zeros(shape, kv_dtype), jnp.zeros(shape, kv_dtype))


def time_embedding(t_value: float, dim: int, theta: float = 10_000.0) -> jax.Array:
    """Sinusoidal embedding of the delay scalar -> [dim] float32
    (python_simple_implementation.py:344-349)."""
    half = dim // 2
    inv_freq = jnp.exp(
        -math.log(theta) * jnp.arange(half, dtype=jnp.float32) / half
    )
    emb = jnp.float32(t_value) * inv_freq
    return jnp.concatenate([jnp.cos(emb), jnp.sin(emb)])


def ada_scales(dec_params: PyTree, cfg: VoxtralConfig) -> jax.Array:
    """Precompute the per-layer ada-RMSNorm scale for the configured delay:
    ada_up(GELU(ada_down(t_cond))) -> [L, dim] float32.  Constant at runtime
    (the reference precomputes it too, voxtral.c:57-79)."""
    t_cond = time_embedding(
        float(cfg.delay_tokens), cfg.decoder.dim, cfg.decoder.ada_theta
    )
    lp = dec_params["layers"]
    hid = gelu(
        jnp.einsum(
            "d,lad->la",
            t_cond,
            lp["ada_down"].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
    )
    return jnp.einsum(
        "la,lda->ld",
        hid,
        lp["ada_up"].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )


def _layer_step(
    cfg: DecoderConfig,
    cdtype,
    x: jax.Array,            # [T, dim]
    lp: PyTree,              # one layer's params (leading L axis sliced away)
    ada: jax.Array,          # [dim] f32
    k_all: jax.Array,        # [L, KH, cap, D]
    v_all: jax.Array,
    li: jax.Array,           # layer index
    pos0: jax.Array,         # logical position of x[0]
    cos: jax.Array,          # [T, D/2]
    sin: jax.Array,
):
    t = x.shape[0]
    q_dim, kv_dim = cfg.q_dim, cfg.kv_dim

    xn = rms_norm(x, lp["attn_norm"], cfg.norm_eps).astype(cdtype)
    qkv = quant.mm(xn, lp, "wqkv", cdtype, li=li)
    q = qkv[:, :q_dim].reshape(t, cfg.n_heads, cfg.head_dim)
    k = qkv[:, q_dim : q_dim + kv_dim].reshape(t, cfg.n_kv_heads, cfg.head_dim)
    v = qkv[:, q_dim + kv_dim :].reshape(t, cfg.n_kv_heads, cfg.head_dim)

    q = apply_rope_interleaved(q, cos, sin)
    k = apply_rope_interleaved(k, cos, sin)

    cap = k_all.shape[2]
    use_flash = cfg.attn_impl == "flash" or (
        cfg.attn_impl == "auto" and cap > FLASH_RING_THRESHOLD
    )
    # flash requires a >=2-byte float ring (bf16/f32).  fp8 rings fall
    # back to XLA: the kernel's in-VMEM fp8->f32 widening runs on the VPU
    # at element rate and measured ~3x SLOWER than XLA's fused widening at
    # realistic fill (31.2 vs 10.2 ms at B=56 x ring 896, pos ~806 —
    # docs/PERF.md round 3); non-float storage (e.g. a future packed-int4
    # ring) likewise.
    use_flash = (
        use_flash
        and jnp.issubdtype(k_all.dtype, jnp.floating)
        and k_all.dtype.itemsize >= 2
    )
    if t == 1:
        # single-token fast path: write the one new row straight into the
        # stacked cache — no whole-ring gather/scatter round trip.  Under
        # stream-vmap this routes to one Pallas in-place DMA launch for all
        # streams (ops/ring.py ring_rows_write).
        if use_flash:
            # fused write+attention: ONE Pallas launch per layer under
            # stream-vmap (the kernel slices layer li inside its DMAs;
            # pre-slicing would materialize a per-layer ring copy as the
            # pallas operand — ops/flash_decode.py docstring)
            attn, k_all, v_all = flash_decode_write_attention(
                q[0].astype(cdtype), k_all, v_all, k[0], v[0], li, pos0,
                window=cfg.window, block=cfg.flash_block, out_dtype=cdtype,
            )
            attn = attn[None].reshape(t, q_dim)
        else:
            k_all, v_all = ring_rows_write(k_all, v_all, k[0], v[0], li, pos0)
            k_ring = jax.lax.dynamic_index_in_dim(
                k_all, li, axis=0, keepdims=False
            )
            v_ring = jax.lax.dynamic_index_in_dim(
                v_all, li, axis=0, keepdims=False
            )
            attn = ring_attention(
                q.astype(cdtype), k_ring, v_ring, pos0,
                window=cfg.window, out_dtype=cdtype,
            ).reshape(t, q_dim)
    else:
        k_ring = jax.lax.dynamic_index_in_dim(k_all, li, axis=0, keepdims=False)
        v_ring = jax.lax.dynamic_index_in_dim(v_all, li, axis=0, keepdims=False)
        k_ring = ring_write(k_ring, k, pos0)
        v_ring = ring_write(v_ring, v, pos0)
        k_all = jax.lax.dynamic_update_index_in_dim(k_all, k_ring, li, axis=0)
        v_all = jax.lax.dynamic_update_index_in_dim(v_all, v_ring, li, axis=0)
        attn = ring_attention(
            q.astype(cdtype), k_ring, v_ring, pos0,
            window=cfg.window, out_dtype=cdtype,
        ).reshape(t, q_dim)

    x = x + quant.mm(attn, lp, "wo", cdtype, li=li).astype(x.dtype)

    hn = rms_norm(x, lp["ffn_norm"], cfg.norm_eps).astype(jnp.float32)
    hn = (hn * (1.0 + ada)).astype(cdtype)  # ada-RMSNorm (python:607-616)
    g13 = quant.mm(hn, lp, "w13", cdtype, li=li)
    gate = silu(g13[:, : cfg.hidden]) * g13[:, cfg.hidden :]
    ffn = quant.mm(gate.astype(cdtype), lp, "w2", cdtype, li=li)
    return x + ffn.astype(x.dtype), k_all, v_all


def decoder_forward(
    params: PyTree,
    cfg: VoxtralConfig,
    embeds: jax.Array,       # [T, dim] input embeddings
    cache: KVCache,
    pos0: jax.Array,         # scalar int32
    ada: jax.Array,          # [L, dim] f32 precomputed ada scales
    unroll_layers: bool = False,
):
    """Run all layers over T embeddings (prefill / teacher-forced forward).
    Returns (hidden [T, dim], cache).

    `unroll_layers=True` replaces the layer scan with a static Python loop:
    every ring access becomes a constant-index slice/update that XLA keeps
    in place.  The scan variant carries the whole stacked cache and, under
    stream-vmap, XLA re-lays it out layer-major — two full-cache HLO-temp
    copies (2 x 2.49 GB at B=56 x ring 896, the allocation that capped
    batched prefill; measured round 3).  Batched prefill (serving.bprefill)
    uses the unrolled form; single-stream paths keep the scan (smaller
    compile, no layout pressure at B=1)."""
    d = cfg.decoder
    cdtype = cfg.cdtype
    t = embeds.shape[0]
    positions = pos0 + jnp.arange(t, dtype=jnp.int32)
    cos, sin = rope_cos_sin(positions, d.head_dim, d.rope_theta)
    x = embeds.astype(cdtype)

    lyrs = params["layers"]
    packed4 = quant.stack_is_packed4(lyrs)

    if unroll_layers:
        k_all, v_all = cache.k, cache.v
        for li in range(d.n_layers):
            lp = {
                k: (v if (packed4 and k in quant.PACKED_STACK_KEYS) else v[li])
                for k, v in lyrs.items()
            }
            x, k_all, v_all = _layer_step(
                d, cdtype, x, lp, ada[li], k_all, v_all, jnp.int32(li),
                pos0, cos, sin,
            )
        return x, KVCache(k_all, v_all)
    if packed4:
        # int4: the packed matrices stay OUT of the scan xs — the Pallas
        # matmul kernel takes the full stack + layer index and slices the
        # layer in its grid spec (a scan-sliced operand would materialize
        # the per-layer gather; same rule as the flash-decode cache)
        xs_lp = {
            k: v for k, v in lyrs.items()
            if k not in quant.PACKED_STACK_KEYS
        }
    else:
        xs_lp = lyrs

    def body(carry, xs):
        x, k_all, v_all = carry
        lp, ada_l, li = xs
        if packed4:
            lp = dict(lp)
            for k in quant.PACKED_STACK_KEYS:
                if k in lyrs:
                    lp[k] = lyrs[k]
        x, k_all, v_all = _layer_step(
            d, cdtype, x, lp, ada_l, k_all, v_all, li, pos0, cos, sin
        )
        return (x, k_all, v_all), None

    (x, k_all, v_all), _ = jax.lax.scan(
        body,
        (x, cache.k, cache.v),
        (xs_lp, ada, jnp.arange(d.n_layers, dtype=jnp.int32)),
        unroll=d.scan_unroll,
    )
    return x, KVCache(k_all, v_all)


def final_logits(params: PyTree, cfg: VoxtralConfig, x: jax.Array) -> jax.Array:
    """RMSNorm + tied-embedding logits with f32 accumulation (python:657-664;
    the Metal path runs this matmul in f16, voxtral_metal.m:1254).  Operands
    stay in the embedding dtype — casting the 131072x3072 table to f32 would
    materialize 1.6 GB every step.  x: [T, dim] -> [T, vocab] f32."""
    emb = params["tok_embeddings"]
    xn = rms_norm(x, params["final_norm"], cfg.decoder.norm_eps)
    if quant._is_packed4(emb, params.get("tok_embeddings_scale")):
        # nibble-packed int4 table, per-half scales [V, 2] — the Pallas
        # kernel unpacks in VMEM so table reads stay 0.5 B/element
        from ..ops.quant_mm import int4_mm

        return int4_mm(
            xn.astype(jnp.bfloat16), emb[None],
            params["tok_embeddings_scale"][None], jnp.int32(0),
        )
    if emb.dtype == jnp.int8:
        # int8 table (quant.quantize_params embeddings=True): widen in the
        # matmul operand stream, rescale per vocab row — HBM reads stay 1B
        y = jnp.einsum(
            "td,vd->tv",
            xn.astype(jnp.bfloat16),
            emb.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return y * params["tok_embeddings_scale"][None, :]
    return jnp.einsum(
        "td,vd->tv",
        xn.astype(emb.dtype),
        emb,
        preferred_element_type=jnp.float32,
    )


@partial(
    jax.jit,
    static_argnames=("cfg", "unroll_layers"),
    donate_argnames=("cache",),
)
def prefill(
    params: PyTree,
    cfg: VoxtralConfig,
    embeds: jax.Array,
    cache: KVCache,
    pos0: jax.Array,
    ada: jax.Array,
    unroll_layers: bool = False,
) -> KVCache:
    """Teacher-forced prefill: write KV for `embeds`, discard hidden states
    (vox_decoder_prefill analog, voxtral_decoder.c:410-558).  `params` is the
    decoder subtree.  `unroll_layers`: see decoder_forward — batched callers
    pass True to keep the vmapped cache updates in place."""
    _, cache = decoder_forward(
        params, cfg, embeds, cache, pos0, ada, unroll_layers=unroll_layers
    )
    return cache


def _alts_from_logits(logits: jax.Array, n_alt: int):
    """Top-`n_alt` text-range candidates (ids >= TOKEN_TEXT_MIN) by
    probability, plus the probability of the argmax token.  Host-side code
    applies the 1 - p_i/p_best <= cutoff rule (voxtral.c:910-966).

    Implemented as n_alt iterated argmaxes rather than lax.top_k — a full
    top-k over a 131072-wide vocab lowers to a sort on TPU and compiles/runs
    pathologically slowly inside the decode scan; n_alt <= 4 argmax sweeps
    are near-free (the same trick as the reference's repeated linear scans,
    voxtral.c:941-957)."""
    probs = jax.nn.softmax(logits)
    best = jnp.argmax(logits).astype(jnp.int32)
    best_prob = probs[best]
    text_probs = probs[TOKEN_TEXT_MIN:]

    def body(i, state):
        vals, idxs, rem = state
        j = jnp.argmax(rem).astype(jnp.int32)
        vals = vals.at[i].set(rem[j])
        idxs = idxs.at[i].set(j)
        rem = rem.at[j].set(-jnp.inf)
        return vals, idxs, rem

    vals0 = jnp.zeros((n_alt,), jnp.float32)
    idxs0 = jnp.zeros((n_alt,), jnp.int32)
    top_p, top_i, _ = jax.lax.fori_loop(
        0, n_alt, body, (vals0, idxs0, text_probs.astype(jnp.float32))
    )
    return best, best_prob, top_i + TOKEN_TEXT_MIN, top_p


@partial(
    jax.jit,
    static_argnames=("cfg", "n_alt"),
    donate_argnames=("cache",),
)
def decode_burst(
    params: PyTree,
    cfg: VoxtralConfig,
    adapter_chunk: jax.Array,   # [T, dim] audio embeddings for positions pos0..
    prev_token: jax.Array,      # scalar int32
    cache: KVCache,
    pos0: jax.Array,            # scalar int32: decode position of step 0
    ada: jax.Array,             # [L, dim]
    n_alt: int = 0,
):
    """Greedy burst decode of T steps with on-device token feedback.

    step t: embed = adapter_chunk[t] + tok_embeddings[prev]; forward; argmax.
    Returns (tokens [T] i32, alt_ids [T, n_alt] i32, alt_probs [T, n_alt] f32,
    best_probs [T] f32, cache).  With n_alt=0 the alt outputs are empty.
    Post-EOS steps still execute (static shapes); the host discards them —
    behaviorally identical because the reference never decodes again without
    a cache reset after EOS (voxtral.c:1049, 1137-1186).
    """
    d = cfg.decoder
    t_total = adapter_chunk.shape[0]

    def step(carry, xs):
        prev, k_all, v_all = carry
        a_row, pos = xs
        embed = (
            a_row.astype(jnp.float32) + quant.embed_rows(params, prev)
        )[None, :]
        x, cache2 = decoder_forward(
            params, cfg, embed, KVCache(k_all, v_all), pos, ada
        )
        logits = final_logits(params, cfg, x)[0]
        if n_alt > 0:
            tok, best_p, alt_i, alt_p = _alts_from_logits(logits, n_alt)
        else:
            tok = jnp.argmax(logits).astype(jnp.int32)
            best_p = jnp.float32(0)
            alt_i = jnp.zeros((0,), jnp.int32)
            alt_p = jnp.zeros((0,), jnp.float32)
        return (tok, cache2.k, cache2.v), (tok, alt_i, alt_p, best_p)

    positions = pos0 + jnp.arange(t_total, dtype=jnp.int32)
    (_, k_all, v_all), (tokens, alt_ids, alt_probs, best_probs) = jax.lax.scan(
        step, (prev_token, cache.k, cache.v), (adapter_chunk, positions)
    )
    return tokens, alt_ids, alt_probs, best_probs, KVCache(k_all, v_all)
