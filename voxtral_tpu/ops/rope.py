"""Interleaved (GPT-J style) rotary position embeddings.

Mistral safetensors store Q/K weights in interleaved format per head, so
interleaved RoPE applied to *unpermuted* weights is exact
(python_simple_implementation.py:494-496, MODEL.md:223-227).

RoPE is always computed in float32 (an f32 island inside the bf16 model,
mirroring python_simple_implementation.py:552-559).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float):
    """cos/sin tables for integer positions.

    positions: int32 [...], returns (cos, sin) each float32 [..., head_dim//2].
    (python_simple_implementation.py:243-247)
    """
    freqs = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    angles = positions.astype(jnp.float32)[..., None] * freqs
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope_interleaved(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate pairs (0,1),(2,3),... of the last axis.

    x: [..., seq, n_heads, head_dim] (any float dtype; computed in f32)
    cos/sin: [..., seq, head_dim//2] (broadcast over the heads axis)
    (python_simple_implementation.py:249-275, is_neox_style=False branch)
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    shape = xf.shape
    xf = xf.reshape(*shape[:-1], shape[-1] // 2, 2)
    x1 = xf[..., 0]
    x2 = xf[..., 1]
    c = cos[..., None, :]  # broadcast over heads axis
    s = sin[..., None, :]
    o1 = x1 * c - x2 * s
    o2 = x2 * c + x1 * s
    out = jnp.stack([o1, o2], axis=-1).reshape(shape)
    return out.astype(orig_dtype)
