"""RMSNorm and activations — float32 islands inside the bf16 model.

Semantics follow python_simple_implementation.py:229-237 (RMSNorm always in
float32) and voxtral_kernels.c:346-409 (tanh-approx GELU, SiLU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    """RMSNorm in float32, cast back to x.dtype.

    x: [..., dim]; weight: [dim] float32.
    """
    xf = x.astype(jnp.float32)
    rms = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * rms * weight.astype(jnp.float32)).astype(x.dtype)


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU, matching the authoritative Python spec's F.gelu
    (python_simple_implementation.py:366-367, 459).  The C engine uses the
    tanh approximation (voxtral_kernels.c:376-384); the difference is < 1e-3
    and below bf16 resolution for the activations seen here."""
    return jax.nn.gelu(x, approximate=False)


def silu(x: jax.Array) -> jax.Array:
    return jax.nn.silu(x)
