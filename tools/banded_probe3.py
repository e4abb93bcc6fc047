#!/usr/bin/env python
"""Clean matmul/attention throughput: device-generated weights, chains
repeated inside jit (fori_loop) so host sync amortizes to ~zero."""

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

    t = 3200
    L = 32
    reps = int(os.environ.get("PROBE_REPS", "10"))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (t, 1280), jnp.bfloat16)
    w = jax.random.normal(key, (L, 3840, 1280), jnp.bfloat16)

    def timeit(name, fn, *args, flops=None):
        r = fn(*args)
        np.asarray(jax.tree.leaves(r)[0])[..., :1]
        t0 = time.monotonic()
        r = fn(*args)
        np.asarray(jax.tree.leaves(r)[0])[..., :1]
        dt = (time.monotonic() - t0) / reps
        extra = f" = {flops / dt / 1e12:.1f} TFLOP/s" if flops else ""
        print(f"{name}: {dt * 1000:.2f} ms/chain{extra}", flush=True)

    def chain(x, ws):
        def body(x, w):
            y = jnp.einsum("td,od->to", x, w,
                           preferred_element_type=jnp.float32)
            return y[:, :1280].astype(jnp.bfloat16), None
        x, _ = jax.lax.scan(body, x, ws)
        return x

    @jax.jit
    def chain_n(x, ws):
        return jax.lax.fori_loop(0, reps, lambda i, x: chain(x, ws), x)

    fl = L * 2 * t * 1280 * 3840
    timeit(f"einsum chain x{reps} (scan, f32acc)", chain_n, x, w, flops=fl)

    # no scan: unrolled python loop over layers inside jit
    @jax.jit
    def chain_unrolled_n(x, ws):
        def one(x):
            for i in range(L):
                y = jnp.einsum("td,od->to", x, ws[i],
                               preferred_element_type=jnp.float32)
                x = y[:, :1280].astype(jnp.bfloat16)
            return x
        return jax.lax.fori_loop(0, reps, lambda i, x: one(x), x)

    timeit(f"einsum chain x{reps} (unrolled)", chain_unrolled_n, x, w,
           flops=fl)

    # batched head dots at banded-kernel block shapes
    qh = jax.random.normal(key, (32, 256, 64), jnp.bfloat16)
    kh = jax.random.normal(key, (32, 256, 64), jnp.bfloat16)

    @jax.jit
    def dots_n(q, k):
        def body(c, _):
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            return c + s[..., 0], None
        c, _ = jax.lax.scan(body, jnp.zeros((32, 256), jnp.float32),
                            None, length=65 * reps)
        return c

    timeit(f"batched head dots x{65 * reps}", dots_n, qh, kh,
           flops=65 * reps * 32 * 2 * 256 * 256 * 64)


if __name__ == "__main__":
    main()
