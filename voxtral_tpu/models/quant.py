"""Weight-only int8 quantization: halve decode-step HBM traffic.

The decode step is bandwidth-bound on weight reads (~6.9 GB/step bf16 —
docs/ARCHITECTURE.md §6).  Per-output-channel symmetric int8 halves that:
W8[o,i] = round(W[o,i] / s[o]), s[o] = max_i |W[o,i]| / 127, and the matmul
dequantizes in-register: y = (x @ W8ᵀ) * s — exact for per-output scales, so
only the rounding error (~0.4% RMS) touches the math.  XLA fuses the
int8→bf16 convert into the matmul operand stream; the weights stay int8 in
HBM.

The analog ladder in the reference is fp16 KV + f16 weights on Metal
(SPEED.md:171-182); PAPERS.md's int4-KV paper pushes further — int4 and
quantized KV are natural round-2 extensions of this module.

Off by default: quantization perturbs logits, so transcripts may differ from
the bf16 reference on near-tied tokens.  Enable with engine(quantize=True) /
CLI --int8.
"""

from __future__ import annotations

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


@jax.jit
def quantize_layer_stack(layers: PyTree) -> PyTree:
    """Quantize the big matrices of a stacked layer dict in place; adds
    '<name>_scale' siblings.  Norms/biases/ada stay as-is."""
    out = dict(layers)
    for k in _QUANT_KEYS:
        if k in out:
            q, s = _quantize(out[k])
            out[k] = q
            out[k + "_scale"] = s.squeeze(-1)  # [L, out]
    return out


def quantize_params(params: PyTree, *, encoder: bool = True,
                    decoder: bool = True, embeddings: bool = True) -> PyTree:
    """Return params with layer-stack matrices int8-quantized.

    With `embeddings`, the decoder's tied 131072×3072 embedding table is
    quantized per-row too: the LOGITS matmul reads the whole table every
    step (~800 MB bf16 — the largest single non-layer read), while lookups
    gather a handful of rows, so per-row scales halve the big read and only
    add rounding noise (~0.4% RMS) to the few gathered rows."""
    out = dict(params)
    if decoder and "decoder" in out:
        d = dict(out["decoder"])
        d["layers"] = quantize_layer_stack(d["layers"])
        if embeddings:
            q, s = _quantize(d["tok_embeddings"])
            d["tok_embeddings"] = q
            d["tok_embeddings_scale"] = s.squeeze(-1)  # [V]
        out["decoder"] = d
    if encoder and "encoder" in out:
        e = dict(out["encoder"])
        e["layers"] = quantize_layer_stack(e["layers"])
        out["encoder"] = e
    return out


def embed_rows(dparams: PyTree, ids: jax.Array) -> jax.Array:
    """tok_embeddings[ids] -> f32, transparent to int8 table storage.
    ids: any integer shape; returns ids.shape + [dim]."""
    emb = dparams["tok_embeddings"]
    rows = emb[ids].astype(jnp.float32)
    if emb.dtype == jnp.int8:
        rows = rows * jnp.expand_dims(
            dparams["tok_embeddings_scale"][ids].astype(jnp.float32), -1
        )
    return rows


def mm(x: jax.Array, lp: PyTree, name: str, cdtype) -> jax.Array:
    """einsum('td,od->to') with transparent int8 dequantization.

    x: [T, in] (cdtype); lp[name]: [out, in] (cdtype or int8, with
    lp[name+'_scale'] [out] when int8).  Returns f32 [T, out].
    """
    w = lp[name]
    if w.dtype == jnp.int8:
        y = jnp.einsum(
            "td,od->to", x, w.astype(cdtype),
            preferred_element_type=jnp.float32,
        )
        return y * lp[name + "_scale"][None, :]
    return jnp.einsum("td,od->to", x, w, preferred_element_type=jnp.float32)
