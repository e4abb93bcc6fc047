"""Weight-only int8 / int4 quantization: halve / quarter decode HBM traffic.

The decode step is bandwidth-bound on weight reads (~6.9 GB/step bf16 —
docs/ARCHITECTURE.md §6).  Per-output-channel symmetric int8 halves that:
W8[o,i] = round(W[o,i] / s[o]), s[o] = max_i |W[o,i]| / 127, and the matmul
dequantizes in-register: y = (x @ W8ᵀ) * s — exact for per-output scales, so
only the rounding error (~0.4% RMS) touches the math.  XLA fuses the
int8→bf16 convert into the matmul operand stream; the weights stay int8 in
HBM.

The int4 rung quarters the traffic.  Storage is NIBBLE-PACKED int8
([out, in/2]; low nibbles hold input columns [0, in/2), high nibbles
[in/2, in) — column-halves rather than interleaved pairs so unpacking is
two shift chains, no reshuffle), because `jnp.int4` arrays cannot cross the
jit boundary on every PJRT plugin (the dev tunnel backend rejects them).
Scales are per (output row, nibble half) — the halves ARE the scale groups
— so the matmul is two plain MXU dots (one per half) with row-scale
epilogues and ZERO extra intermediates; the shift/convert unpack fuses into
the dot's operand staging and weights stay 4-bit in HBM.  (Finer GPTQ-style
group-128 scales were measured 2.2 ms/step SLOWER at B=16: the grouped
einsum's [B,out,G] f32 intermediate round-trips HBM — docs/PERF.md.)

The analog ladder in the reference is fp16 KV + f16 weights on Metal
(SPEED.md:171-182); this module is the ladder's int8 and int4 rungs, plus
the fp8 KV-storage rung lives in config (VOXTRAL_KV_DTYPE).

Off by default: quantization perturbs logits, so transcripts may differ from
the bf16 reference on near-tied tokens.  Enable with engine(quantize="int8")
(or "int4") / CLI --int8 / --int4.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

PyTree = Any

# weights quantized in the decoder/encoder layer stacks
_QUANT_KEYS = ("wqkv", "wo", "w13", "w2")

def _quantize(w: jax.Array):
    """[..., out, in] float -> (int8 [..., out, in], f32 scale [..., out, 1])."""
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return q, s


def _quantize4(w: jax.Array):
    """[..., out, in] float -> (nibble-packed int8 [..., out, in/2],
    f32 scale [..., out, 2]) with one symmetric scale per nibble half.

    Packing: p[..., j] = (q[..., j] & 0xF) | (q[..., j + in/2] << 4)."""
    wf = w.astype(jnp.float32)
    in_dim = wf.shape[-1]
    assert in_dim % 2 == 0, in_dim
    wg = wf.reshape(*wf.shape[:-1], 2, in_dim // 2)
    s = jnp.max(jnp.abs(wg), axis=-1) / 7.0          # [..., out, 2]
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(wg / s[..., None]), -7, 7)
    q = q.reshape(wf.shape).astype(jnp.int8)
    half = in_dim // 2
    lo, hi = q[..., :half], q[..., half:]
    return (lo & 0xF) | (hi << 4), s


def _unpack4(p: jax.Array, cdtype):
    """Nibble-packed int8 [..., in/2] -> (lo, hi) halves in cdtype.
    int8 shifts are arithmetic, so (p << 4) >> 4 sign-extends the low
    nibble and p >> 4 the high one."""
    lo = jnp.right_shift(jnp.left_shift(p, 4), 4)
    hi = jnp.right_shift(p, 4)
    return lo.astype(cdtype), hi.astype(cdtype)


@partial(jax.jit, static_argnames=("c",))
def _quantize_table4(emb: jax.Array, c: int):
    """Group-wise int4 quantize a [V, dim] table, mapping over `c` row
    chunks to bound the f32 temporaries (the full table would materialize
    1.6 GB twice at full size)."""
    v, dim = emb.shape
    q, s = jax.lax.map(_quantize4, emb.reshape(c, v // c, dim))
    return q.reshape(v, dim // 2), s.reshape(v, s.shape[-1])


@partial(jax.jit, static_argnames=("bits",))
def quantize_layer_stack(layers: PyTree, bits: int = 8) -> PyTree:
    """Quantize the big matrices of a stacked layer dict in place; adds
    '<name>_scale' siblings ([L, out] for int8, [L, out, G] for int4).
    Norms/biases/ada stay as-is.  The int4 path maps over the layer axis:
    quantizing the whole [L, out, in] stack at once materializes two f32
    copies (5.5 GB each for w13 at full size) and OOMs a 16 GB chip."""
    out = dict(layers)
    for k in _QUANT_KEYS:
        if k in out:
            if bits == 4:
                out[k], out[k + "_scale"] = jax.lax.map(_quantize4, out[k])
            else:
                q, s = _quantize(out[k])
                out[k] = q
                out[k + "_scale"] = s.squeeze(-1)  # [L, out]
    return out


def quantize_params(params: PyTree, *, encoder: bool = True,
                    decoder: bool = True, embeddings: bool = True,
                    bits: int = 8) -> PyTree:
    """Return params with layer-stack matrices quantized (int8, or int4
    nibble-packed when bits=4).

    With `embeddings`, the decoder's tied 131072×3072 embedding table is
    quantized per-row too: the LOGITS matmul reads the whole table every
    step (~800 MB bf16 — the largest single non-layer read), while lookups
    gather a handful of rows, so per-row scales halve/quarter the big read
    and only add rounding noise to the few gathered rows."""
    out = dict(params)
    if decoder and "decoder" in out:
        d = dict(out["decoder"])
        d["layers"] = quantize_layer_stack(d["layers"], bits=bits)
        if embeddings:
            if bits == 4:
                emb = d["tok_embeddings"]
                c = 8 if emb.shape[0] % 8 == 0 else 1
                d["tok_embeddings"], d["tok_embeddings_scale"] = \
                    _quantize_table4(emb, c)  # scale [V, G]
            else:
                q, s = _quantize(d["tok_embeddings"])
                d["tok_embeddings"] = q
                d["tok_embeddings_scale"] = s.squeeze(-1)  # [V]
        out["decoder"] = d
    if encoder and "encoder" in out:
        e = dict(out["encoder"])
        e["layers"] = quantize_layer_stack(e["layers"], bits=bits)
        out["encoder"] = e
    return out


def _is_packed4(w: jax.Array, s: jax.Array | None) -> bool:
    """int4 rung marker: int8 storage whose half-scale keeps the full rank
    ([out, 2] next to w [out, in/2]; plain int8 scales drop to [out])."""
    return s is not None and w.dtype == jnp.int8 and s.ndim == w.ndim


# stacked-layer keys that stay OUT of the scan xs when int4-packed: the
# Pallas kernel wants the full [L, out, in/2] stack + a layer index (a
# scan-sliced operand would materialize the per-layer gather — the same
# rule as the flash-decode cache, ops/flash_decode.py docstring)
PACKED_STACK_KEYS = tuple(
    k for key in _QUANT_KEYS for k in (key, key + "_scale")
)


def stack_is_packed4(layers: PyTree) -> bool:
    """True when a stacked layer dict holds nibble-packed int4 matrices."""
    w, s = layers.get("wqkv"), layers.get("wqkv_scale")
    return (
        s is not None and w.dtype == jnp.int8
        and s.ndim == 3 and s.shape[-1] == 2
    )


def embed_rows(dparams: PyTree, ids: jax.Array) -> jax.Array:
    """tok_embeddings[ids] -> f32, transparent to int8/int4 table storage.
    ids: any integer shape; returns ids.shape + [dim]."""
    emb = dparams["tok_embeddings"]
    s = dparams.get("tok_embeddings_scale")
    if _is_packed4(emb, s):
        lo, hi = _unpack4(emb[ids], jnp.float32)
        rows = jnp.concatenate([lo, hi], axis=-1)          # [.., dim]
        sg = s[ids].astype(jnp.float32)                    # [.., G]
        g = rows.shape[-1] // sg.shape[-1]
        return (
            rows.reshape(*rows.shape[:-1], sg.shape[-1], g) * sg[..., None]
        ).reshape(rows.shape)
    rows = emb[ids].astype(jnp.float32)
    if emb.dtype == jnp.int8:
        rows = rows * jnp.expand_dims(s[ids].astype(jnp.float32), -1)
    return rows


def _mm4(x: jax.Array, p: jax.Array, s: jax.Array, cdtype) -> jax.Array:
    """Half-scaled int4 matmul: x [T, in], p nibble-packed int8 [out, in/2],
    s f32 [out, 2] -> f32 [T, out].  Two plain MXU dots (one per nibble
    half) with row-scale epilogues; the shift+convert unpack fuses into the
    dot operand staging, so HBM reads stay 0.5 B/element and nothing but
    the [T, out] results is materialized."""
    half = x.shape[-1] // 2
    lo, hi = _unpack4(p, cdtype)
    y_lo = jnp.einsum(
        "td,od->to", x[:, :half], lo, preferred_element_type=jnp.float32
    )
    y_hi = jnp.einsum(
        "td,od->to", x[:, half:], hi, preferred_element_type=jnp.float32
    )
    return y_lo * s[None, :, 0] + y_hi * s[None, :, 1]


def mm(x: jax.Array, lp: PyTree, name: str, cdtype, li=None) -> jax.Array:
    """einsum('td,od->to') with transparent int8/int4 dequantization.

    x: [T, in] (cdtype); lp[name]: [out, in] (cdtype or int8 with
    lp[name+'_scale'] [out]) or nibble-packed int4 [out, in/2] with
    per-half scales [out, 2].  When lp holds the full STACKED int4 weight
    ([L, out, in/2]) and `li` is given, the Pallas kernel unpacks in VMEM
    (ops/quant_mm.py) — 0.5 B/element HBM reads, which the XLA shift-chain
    path cannot achieve (it materializes the unpack).  Returns f32 [T, out].
    """
    w = lp[name]
    s = lp.get(name + "_scale") if hasattr(lp, "get") else None
    if s is not None and li is not None and w.ndim == 3 and s.ndim == 3:
        from ..ops.quant_mm import int4_mm

        return int4_mm(x.astype(cdtype), w, s, li)
    if _is_packed4(w, s):
        return _mm4(x, w, s, cdtype)
    if w.dtype == jnp.int8:
        y = jnp.einsum(
            "td,od->to", x, w.astype(cdtype),
            preferred_element_type=jnp.float32,
        )
        return y * s[None, :]
    return jnp.einsum("td,od->to", x, w, preferred_element_type=jnp.float32)
