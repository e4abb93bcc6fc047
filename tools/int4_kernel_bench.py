#!/usr/bin/env python
"""Standalone on-chip benchmark of the Pallas int4 matmul kernel.

Times one decode-shaped matmul per decoder matrix (B*T=16 rows) three ways:
bf16 XLA dot, int8 XLA dot, int4 Pallas kernel (ops/quant_mm.py) — without
loading the full engine, so kernel wins/losses are not confounded by
resident weights.  Traffic floors at 819 GB/s (v5e): bf16 2 B/elem,
int8 1 B/elem, int4 0.5 B/elem.

Usage: python tools/int4_kernel_bench.py [rows] [matrix ...]
(default matrix: w13 — the dominant read; pass "all" for every matrix)
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


def _sync1(out):
    # one-element D2H: a whole-leaf fetch ships it at ~0.05 GB/s (CLAUDE.md)
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)


def timeit(fn, iters=10):
    fn()  # compile + first-exec (lazy server compile on the tunnel)
    _sync1(fn())
    t0 = time.monotonic()
    out = None
    for _ in range(iters):
        out = fn()
    _sync1(out)
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
    pick = sys.argv[2:] or ["w13"]
    if pick != ["all"]:
        mats = {k: v for k, v in mats.items() if k in pick}
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

        # Time a 26-LAYER CHAIN per dispatch (fori_loop over the layer
        # index), matching real decode usage — a single standalone matmul
        # is dominated by the remote tunnel's per-dispatch latency.
        # Weights/activations are explicit ARGUMENTS: a jitted closure
        # over GB-scale arrays embeds them as HLO constants and wedges the
        # TPU compiler's constant folding (CLAUDE.md rule).
        def chain(step):
            def run(x, *ws):
                def body(li, acc):
                    y = step(x, li, *ws)
                    # reduce over ALL columns so XLA cannot narrow the dot
                    return acc + jnp.sum(y, axis=1, keepdims=True)
                return jax.lax.fori_loop(
                    0, L, body, jnp.zeros((x.shape[0], 1), jnp.float32)
                )
            return jax.jit(run)

        def s_bf16(x, li, w):
            wl = jax.lax.dynamic_index_in_dim(w, li, 0, keepdims=False)
            return jnp.einsum("td,od->to", x, wl,
                              preferred_element_type=jnp.float32)

        def s_int8(x, li, q8, s8):
            wl = jax.lax.dynamic_index_in_dim(q8, li, 0, keepdims=False)
            sl = jax.lax.dynamic_index_in_dim(s8, li, 0, keepdims=False)
            y = jnp.einsum("td,od->to", x, wl.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            return y * sl[None, :]

        def s_int4(x, li, p4, s4):
            return int4_mm(x, p4, s4, li)

        f16, f8, f4 = chain(s_bf16), chain(s_int8), chain(s_int4)
        t16 = timeit(lambda: f16(x, w)) / L
        t8 = timeit(lambda: f8(x, q8, s8)) / L
        t4 = timeit(lambda: f4(x, p4, s4)) / L
        gb = L and (o * i)  # per-layer elements
        print(f"{name} [{o}x{i}]: bf16 {t16*1e6:.0f} us "
              f"(floor {gb*2/819e3:.0f}) | int8 {t8*1e6:.0f} us "
              f"(floor {gb/819e3:.0f}) | int4-pallas {t4*1e6:.0f} us "
              f"(floor {gb/2/819e3:.0f})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
