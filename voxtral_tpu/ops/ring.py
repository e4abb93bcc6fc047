"""Ring-buffer KV cache + sliding-window GQA attention (XLA reference path).

The C reference keeps rolling KV caches it compacts with memmove when full
(voxtral_decoder.c:317-347, voxtral_encoder.c:388-406).  On TPU we replace
data movement with index arithmetic: a fixed-capacity ring where position p
lives in slot p % cap.  The logical position of slot s, given that the last
written position is p_end, is

    l(s) = p_end - ((p_end - s) mod cap)        (in (p_end - cap, p_end])

so the sliding-window causal mask for a query at position q is simply

    valid(s) = 0 <= l(s) <= q  and  l(s) > q - window.

No position bookkeeping array, no compaction, no copies.  RoPE is applied at
*logical* positions before the write, so cached K never needs re-rotation —
the same argument the reference makes at voxtral_decoder.c:313-316.

Ring layout is head-major [KH, cap, D]: the slot axis is contiguous per head,
which is what both the XLA attention einsum and the Pallas flash-decode
kernel (ops/flash_decode.py) want to stream from HBM.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def ring_write(ring: jax.Array, vals: jax.Array, pos0: jax.Array) -> jax.Array:
    """Write T rows into the ring at slots (pos0 .. pos0+T-1) mod cap.

    ring: [KH, cap, D]; vals: [T, KH, D]; pos0: scalar int32 (logical position
    of vals[0]).  Returns the updated ring.  T == 1 uses a
    dynamic_update_slice fast path; larger T uses a scatter with unique mod
    indices.
    """
    kh, cap, d = ring.shape
    t = vals.shape[0]
    vals = vals.astype(ring.dtype)
    vals_t = jnp.swapaxes(vals, 0, 1)  # [KH, T, D]
    def rotate(x, shift):  # left-rotate axis 1 by `shift`
        return jax.lax.dynamic_slice(
            jnp.concatenate([x, x], axis=1), (0, shift, 0), x.shape
        )

    if t == 1:
        slot = jnp.mod(pos0, cap)
        return jax.lax.dynamic_update_slice(ring, vals_t, (0, slot, 0))
    if t >= cap:
        # Only the last `cap` rows survive; row i lands at slot
        # (start + i) mod cap, i.e. a right-rotation by `start` — expressed
        # as the same concat+dynamic_slice rotate as the wraparound path
        # (dynamic-shift roll on cache-sized arrays stalls TPU compiles).
        vals_t = vals_t[:, t - cap :]
        start = jnp.mod(pos0 + (t - cap), cap)
        return rotate(vals_t, jnp.mod(cap - start, cap))
    # Bulk write with wraparound: rotate the ring so the write lands at slot
    # 0, update contiguously, rotate back.  Rotation by a dynamic amount is
    # expressed as concat + dynamic_slice (static shapes, no gather/scatter —
    # both of which compile pathologically on some TPU toolchains).
    start = jnp.mod(pos0, cap)

    rolled = rotate(ring, start)
    rolled = jax.lax.dynamic_update_slice(rolled, vals_t, (0, 0, 0))
    return rotate(rolled, jnp.mod(cap - start, cap))


def slot_logical_positions(p_end: jax.Array, cap: int) -> jax.Array:
    """Logical position currently held by each slot (int32 [cap])."""
    slots = jnp.arange(cap, dtype=jnp.int32)
    return p_end - jnp.mod(p_end - slots, cap)


@partial(jax.jit, static_argnames=("window", "out_dtype"))
def ring_attention(
    q: jax.Array,
    k_ring: jax.Array,
    v_ring: jax.Array,
    q_pos0: jax.Array,
    *,
    window: int,
    out_dtype=None,
) -> jax.Array:
    """Sliding-window causal GQA attention over a ring cache.

    q:       [T, H, D]   queries at logical positions q_pos0 .. q_pos0+T-1
    k_ring:  [KH, cap, D]  (K/V for those T positions must already be written)
    v_ring:  [KH, cap, D]
    Returns: [T, H, D] in out_dtype (default q.dtype).

    Numerics: scores and softmax in float32 (matching the f32 SDPA island in
    python_simple_implementation.py:313-318); the PV matmul accumulates f32.
    """
    t, h, d = q.shape
    kh, cap, _ = k_ring.shape
    g = h // kh
    out_dtype = out_dtype or q.dtype
    scale = 1.0 / math.sqrt(d)

    p_end = q_pos0 + (t - 1)
    l = slot_logical_positions(p_end, cap)                    # [cap]
    q_pos = q_pos0 + jnp.arange(t, dtype=jnp.int32)           # [T]
    valid = (
        (l[None, :] >= 0)
        & (l[None, :] <= q_pos[:, None])
        & (l[None, :] > q_pos[:, None] - window)
    )                                                          # [T, cap]

    qg = q.reshape(t, kh, g, d)
    # scores: [KH, G, T, cap]
    scores = jnp.einsum(
        "tkgd,ksd->kgts", qg, k_ring, preferred_element_type=jnp.float32
    ) * scale
    scores = jnp.where(valid[None, None, :, :], scores, -jnp.inf)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    # PV matmul in the cache dtype with f32 accumulation: casting the probs
    # down (bf16 on TPU, exactly the reference Metal f16 path) avoids
    # materializing an f32 copy of the V ring every step.
    out = jnp.einsum(
        "kgts,ksd->tkgd", probs.astype(v_ring.dtype), v_ring,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(t, h, d).astype(out_dtype)
