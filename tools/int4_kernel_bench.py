#!/usr/bin/env python
"""Standalone on-chip benchmark of the Pallas int4 matmul kernel.

Times one decode-shaped matmul per decoder matrix (B*T=16 rows) three ways:
bf16 XLA dot, int8 XLA dot, int4 Pallas kernel (ops/quant_mm.py) — without
loading the full engine, so kernel wins/losses are not confounded by
resident weights.  Traffic floors at 819 GB/s (v5e): bf16 2 B/elem,
int8 1 B/elem, int4 0.5 B/elem.

Usage: python tools/int4_kernel_bench.py [rows]
"""

from __future__ import annotations

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, iters=30):
    fn()  # compile + first-exec (lazy server compile on the tunnel)
    np.asarray(jax.tree.leaves(fn())[0])  # sync via D2H (CLAUDE.md rule)
    t0 = time.monotonic()
    out = None
    for _ in range(iters):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0])
    return (time.monotonic() - t0) / iters


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    L = 26
    mats = {
        "wqkv": (6144, 3072),
        "wo": (3072, 4096),
        "w13": (18432, 3072),
        "w2": (3072, 9216),
    }
    from voxtral_tpu.models.quant import _quantize, _quantize4
    from voxtral_tpu.ops.quant_mm import int4_mm

    key = jax.random.PRNGKey(0)
    print(f"device={jax.devices()[0]} rows={rows}", file=sys.stderr)
    for name, (o, i) in mats.items():
        kw, kx, key = jax.random.split(key, 3)
        w = jax.random.normal(kw, (L, o, i), jnp.bfloat16) * 0.02
        x = jax.random.normal(kx, (rows, i), jnp.bfloat16)
        p4, s4 = jax.lax.map(_quantize4, w)
        q8, s8 = jax.jit(_quantize)(w)
        s8 = s8.squeeze(-1)
        jax.block_until_ready((p4, s4, q8))
        li = jnp.int32(L // 2)

        def f_bf16():
            wl = jax.lax.dynamic_index_in_dim(w, li, 0, keepdims=False)
            return jnp.einsum("td,od->to", x, wl,
                              preferred_element_type=jnp.float32)

        def f_int8():
            wl = jax.lax.dynamic_index_in_dim(q8, li, 0, keepdims=False)
            sl = jax.lax.dynamic_index_in_dim(s8, li, 0, keepdims=False)
            y = jnp.einsum("td,od->to", x, wl.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            return y * sl[None, :]

        def f_int4():
            return int4_mm(x, p4, s4, li)

        t16 = timeit(jax.jit(f_bf16))
        t8 = timeit(jax.jit(f_int8))
        t4 = timeit(jax.jit(f_int4))
        gb = L and (o * i)  # per-layer elements
        print(f"{name} [{o}x{i}]: bf16 {t16*1e6:.0f} us "
              f"(floor {gb*2/819e3:.0f}) | int8 {t8*1e6:.0f} us "
              f"(floor {gb/819e3:.0f}) | int4-pallas {t4*1e6:.0f} us "
              f"(floor {gb/2/819e3:.0f})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
