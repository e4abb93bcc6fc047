#!/usr/bin/env python
"""Isolate encoder matmul efficiency: bare einsum chains at model shapes."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.expanduser("~/.cache/voxtral_tpu/jax")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print(f"device: {jax.devices()[0]}", flush=True)

    t = int(os.environ.get("PROBE_T", "3200"))
    rng = np.random.default_rng(0)
    L = 32

    def timeit(name, fn, *args, flops=None):
        r = fn(*args)
        np.asarray(jax.tree.leaves(r)[0])[..., :1]
        t0 = time.monotonic()
        for _ in range(3):
            r = fn(*args)
        np.asarray(jax.tree.leaves(r)[0])[..., :1]
        dt = (time.monotonic() - t0) / 3
        extra = f" = {flops / dt / 1e12:.1f} TFLOP/s" if flops else ""
        print(f"{name}: {dt * 1000:.1f} ms{extra}", flush=True)

    x = jnp.asarray(rng.standard_normal((t, 1280)), jnp.bfloat16)

    # 1. single big matmul shape, "to" orientation (the model's), f32 accum
    w_od = jnp.asarray(rng.standard_normal((L, 3840, 1280)), jnp.bfloat16)

    @jax.jit
    def chain_to(x, ws):
        def body(x, w):
            y = jnp.einsum("td,od->to", x, w,
                           preferred_element_type=jnp.float32)
            return y[:, :1280].astype(jnp.bfloat16), None
        x, _ = jax.lax.scan(body, x, ws)
        return x

    fl = L * 2 * t * 1280 * 3840
    timeit("einsum td,od->to f32acc", chain_to, x, w_od, flops=fl)

    # 2. "do" orientation (contraction on rhs sublanes — MXU-native)
    w_do = jnp.asarray(rng.standard_normal((L, 1280, 3840)), jnp.bfloat16)

    @jax.jit
    def chain_do(x, ws):
        def body(x, w):
            y = jnp.einsum("td,do->to", x, w,
                           preferred_element_type=jnp.float32)
            return y[:, :1280].astype(jnp.bfloat16), None
        x, _ = jax.lax.scan(body, x, ws)
        return x

    timeit("einsum td,do->to f32acc", chain_do, x, w_do, flops=fl)

    # 3. bf16 accumulate
    @jax.jit
    def chain_bf(x, ws):
        def body(x, w):
            y = jnp.einsum("td,od->to", x, w)
            return y[:, :1280], None
        x, _ = jax.lax.scan(body, x, ws)
        return x

    timeit("einsum td,od->to bf16acc", chain_bf, x, w_od, flops=fl)

    # 4. no scan: one big unrolled dot over stacked weights
    @jax.jit
    def batched(x, ws):
        return jnp.einsum("td,lod->lto", x, ws,
                          preferred_element_type=jnp.float32)

    timeit("one batched einsum td,lod->lto", batched, x, w_od, flops=fl)

    # 5. w13-size (the widest matmul)
    w13 = jnp.asarray(rng.standard_normal((L, 10240, 1280)), jnp.bfloat16)

    @jax.jit
    def chain13(x, ws):
        def body(x, w):
            y = jnp.einsum("td,od->to", x, w,
                           preferred_element_type=jnp.float32)
            return y[:, :1280].astype(jnp.bfloat16), None
        x, _ = jax.lax.scan(body, x, ws)
        return x

    timeit("einsum w13 10240-wide", chain13, x, w13,
           flops=L * 2 * t * 1280 * 10240)

    # 6. batched-heads matmul at kernel shapes: [32,256,64]x[32,256,64]
    qh = jnp.asarray(rng.standard_normal((32, 256, 64)), jnp.bfloat16)
    kh = jnp.asarray(rng.standard_normal((32, 256, 64)), jnp.bfloat16)

    @jax.jit
    def scores(q, k):
        def body(c, _):
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            return c + s[..., 0], None
        c, _ = jax.lax.scan(body, jnp.zeros((32, 256), jnp.float32),
                            None, length=65)
        return c

    timeit("65x batched head dots (XLA)", scores, qh, kh,
           flops=65 * 32 * 2 * 256 * 256 * 64)


if __name__ == "__main__":
    main()
