#!/usr/bin/env python
"""Bare banded-attention cost, fori-amortized: kernel vs XLA-banded vs
XLA-full-ring-style, one layer's shape, 32 reps."""

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

    from voxtral_tpu.ops.banded_encode import banded_attention_batched

    t, h, d, w = 3328, 32, 64, 750
    reps = 32
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (1, t, h, d), jnp.bfloat16)
    k = jax.random.normal(key, (1, t, h, d), jnp.bfloat16)
    v = jax.random.normal(key, (1, t, h, d), jnp.bfloat16)

    def timeit(name, fn):
        r = fn(q, k, v)
        np.asarray(jax.tree.leaves(r)[0])[..., :1]
        t0 = time.monotonic()
        r = fn(q, k, v)
        np.asarray(jax.tree.leaves(r)[0])[..., :1]
        dt = (time.monotonic() - t0) / reps * 1000
        print(f"{name}: {dt:.2f} ms/layer-call", flush=True)

    for bq, bk in [(256, 256), (128, 128), (256, 128)]:
        @jax.jit
        def kn(q, k, v, bq=bq, bk=bk):
            def body(i, acc):
                o = banded_attention_batched(
                    q, k, v, window=w, block_q=bq, block_k=bk,
                    out_dtype=jnp.bfloat16)
                return acc + o
            return jax.lax.fori_loop(
                0, reps, body, jnp.zeros_like(q, jnp.float32))

        timeit(f"pallas banded bq={bq} bk={bk}", kn)

    # XLA banded: q tiles gather their k band, f32 scores in HBM
    def xla_banded(q3, k3, v3, bq=256):
        n_i = t // bq
        band = 1024
        qt = q3.reshape(n_i, bq, h, d)
        starts = jnp.arange(n_i) * bq - (band - bq)
        idx = jnp.clip(starts[:, None] + jnp.arange(band)[None, :], 0, t - 1)
        kb = k3[idx]
        vb = v3[idx]
        scores = jnp.einsum("ithd,iskd->ihts", qt, kb,
                            preferred_element_type=jnp.float32) / np.sqrt(d)
        pos = starts[:, None] + jnp.arange(band)[None, :]
        qpos = (jnp.arange(n_i) * bq)[:, None] + jnp.arange(bq)[None]
        valid = ((pos[:, None, :] <= qpos[:, :, None])
                 & (pos[:, None, :] > qpos[:, :, None] - w)
                 & (pos[:, None, :] >= 0))
        scores = jnp.where(valid[:, None], scores, -1e30)
        p = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
        o = jnp.einsum("ihts,iskd->ithd", p, vb,
                       preferred_element_type=jnp.float32)
        return o.reshape(1, t, h, d)

    @jax.jit
    def xb(q, k, v):
        def body(i, acc):
            return acc + xla_banded(q[0], k[0], v[0])
        return jax.lax.fori_loop(0, reps, body,
                                 jnp.zeros_like(q, jnp.float32))

    timeit("xla banded (f32 scores via HBM)", xb)


if __name__ == "__main__":
    main()
