"""Weight-only int8 / int4 quantization: halve / quarter decode HBM traffic.

The decode step is bandwidth-bound on weight reads (~6.9 GB/step bf16 —
docs/ARCHITECTURE.md §6).  Per-output-channel symmetric int8 halves that:
W8[o,i] = round(W[o,i] / s[o]), s[o] = max_i |W[o,i]| / 127, and the matmul
dequantizes in-register: y = (x @ W8ᵀ) * s — exact for per-output scales, so
only the rounding error (~0.4% RMS) touches the math.  XLA fuses the
int8→bf16 convert into the matmul operand stream; the weights stay int8 in
HBM.

int4 (jnp.int4 — bit-packed on TPU) quarters the traffic but per-channel
scales are too coarse at 4 bits (~9% RMS), so the int4 rung uses GROUP-WISE
scales (128 input channels per scale group, the GPTQ/AWQ convention): the
matmul becomes G grouped MXU passes 'tgi,ogi->tog' followed by a scale-
weighted reduction over g — still one fused XLA program, weights still 4-bit
in HBM (~1.3% RMS error).

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

# input channels per int4 scale group; dims not divisible fall back to one
# group (per-output-channel)
GROUP = 128


def _quantize(w: jax.Array):
    """[..., out, in] float -> (int8 [..., out, in], f32 scale [..., out, 1])."""
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return q, s


def _group_size(in_dim: int) -> int:
    return GROUP if in_dim % GROUP == 0 else in_dim


def _quantize4(w: jax.Array):
    """[..., out, in] float -> (int4 [..., out, in], f32 scale [..., out, G])
    with group-wise symmetric scales over `GROUP` input channels."""
    wf = w.astype(jnp.float32)
    in_dim = wf.shape[-1]
    g = _group_size(in_dim)
    wg = wf.reshape(*wf.shape[:-1], in_dim // g, g)
    s = jnp.max(jnp.abs(wg), axis=-1) / 7.0          # [..., out, G]
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(wg / s[..., None]), -7, 7)
    return q.reshape(wf.shape).astype(jnp.int4), s


@partial(jax.jit, static_argnames=("bits",))
def quantize_layer_stack(layers: PyTree, bits: int = 8) -> PyTree:
    """Quantize the big matrices of a stacked layer dict in place; adds
    '<name>_scale' siblings ([L, out] for int8, [L, out, G] for int4).
    Norms/biases/ada stay as-is."""
    out = dict(layers)
    for k in _QUANT_KEYS:
        if k in out:
            if bits == 4:
                out[k], out[k + "_scale"] = _quantize4(out[k])
            else:
                q, s = _quantize(out[k])
                out[k] = q
                out[k + "_scale"] = s.squeeze(-1)  # [L, out]
    return out


def quantize_params(params: PyTree, *, encoder: bool = True,
                    decoder: bool = True, embeddings: bool = True,
                    bits: int = 8) -> PyTree:
    """Return params with layer-stack matrices int8-quantized.

    With `embeddings`, the decoder's tied 131072×3072 embedding table is
    quantized per-row too: the LOGITS matmul reads the whole table every
    step (~800 MB bf16 — the largest single non-layer read), while lookups
    gather a handful of rows, so per-row scales halve the big read and only
    add rounding noise (~0.4% RMS) to the few gathered rows."""
    out = dict(params)
    if decoder and "decoder" in out:
        d = dict(out["decoder"])
        d["layers"] = quantize_layer_stack(d["layers"], bits=bits)
        if embeddings:
            if bits == 4:
                d["tok_embeddings"], d["tok_embeddings_scale"] = _quantize4(
                    d["tok_embeddings"]
                )  # scale [V, G]
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


def embed_rows(dparams: PyTree, ids: jax.Array) -> jax.Array:
    """tok_embeddings[ids] -> f32, transparent to int8/int4 table storage.
    ids: any integer shape; returns ids.shape + [dim]."""
    emb = dparams["tok_embeddings"]
    rows = emb[ids].astype(jnp.float32)
    if emb.dtype == jnp.int8:
        rows = rows * jnp.expand_dims(
            dparams["tok_embeddings_scale"][ids].astype(jnp.float32), -1
        )
    elif emb.dtype == jnp.int4:
        s = dparams["tok_embeddings_scale"][ids].astype(jnp.float32)  # [.., G]
        g = rows.shape[-1] // s.shape[-1]
        rows = (
            rows.reshape(*rows.shape[:-1], s.shape[-1], g) * s[..., None]
        ).reshape(rows.shape)
    return rows


def _mm4(x: jax.Array, q: jax.Array, s: jax.Array, cdtype) -> jax.Array:
    """Group-wise int4 matmul: x [T, in], q int4 [out, in], s f32 [out, G]
    -> f32 [T, out].  G grouped MXU passes + a scale-weighted g-reduction;
    the int4->bf16 widening fuses into the operand stream (0.5 B/elem HBM)."""
    t, in_dim = x.shape
    o, grp = q.shape[0], s.shape[-1]
    g = in_dim // grp
    xg = x.reshape(t, grp, g)
    qg = q.reshape(o, grp, g).astype(cdtype)
    y = jnp.einsum("tgi,ogi->tog", xg, qg, preferred_element_type=jnp.float32)
    return jnp.einsum("tog,og->to", y, s, preferred_element_type=jnp.float32)


def mm(x: jax.Array, lp: PyTree, name: str, cdtype) -> jax.Array:
    """einsum('td,od->to') with transparent int8/int4 dequantization.

    x: [T, in] (cdtype); lp[name]: [out, in] (cdtype, int8 with
    lp[name+'_scale'] [out], or int4 with group scales [out, G]).
    Returns f32 [T, out].
    """
    w = lp[name]
    if w.dtype == jnp.int8:
        y = jnp.einsum(
            "td,od->to", x, w.astype(cdtype),
            preferred_element_type=jnp.float32,
        )
        return y * lp[name + "_scale"][None, :]
    if w.dtype == jnp.int4:
        return _mm4(x, w, lp[name + "_scale"], cdtype)
    return jnp.einsum("td,od->to", x, w, preferred_element_type=jnp.float32)
