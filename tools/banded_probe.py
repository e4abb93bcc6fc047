#!/usr/bin/env python
"""Decompose bulk-encoder time: matmuls-only vs banded kernel vs XLA banded.

Profiles one full-size clip encode (T ~3196 positions) on chip."""

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

    from voxtral_tpu.config import full_config
    from voxtral_tpu.models.params import init_params
    from voxtral_tpu.models import quant
    from voxtral_tpu.ops.banded_encode import banded_attention_batched
    from voxtral_tpu.ops.norms import rms_norm, silu
    from voxtral_tpu.ops.rope import apply_rope_interleaved, rope_cos_sin

    print(f"device: {jax.devices()[0]}", flush=True)
    cfg = full_config()
    e = cfg.encoder
    params = init_params(cfg, seed=0)
    enc = params["encoder"]
    cdtype = cfg.cdtype
    t = int(os.environ.get("PROBE_T", "3200"))
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((t, e.dim)), cdtype)

    def sync(x):
        # device-slice BEFORE the fetch: np.asarray of a full leaf
        # transfers everything over the ~0.05 GB/s tunnel
        leaf = jax.tree.leaves(x)[0]
        return np.asarray(leaf[(0,) * (leaf.ndim - 1)][:1])

    def timeit(name, fn, *args):
        print(f"compiling {name}...", flush=True)
        r = fn(*args)
        sync(r)
        t0 = time.monotonic()
        for _ in range(3):
            r = fn(*args)
        sync(r)
        print(f"{name}: {(time.monotonic() - t0) / 3 * 1000:.1f} ms",
              flush=True)

    qkv_dim = e.qkv_dim

    def make_transformer(attn_fn):
        @jax.jit
        def run(layers, x):
            positions = jnp.arange(t, dtype=jnp.int32)
            cos, sin = rope_cos_sin(positions, e.head_dim, e.rope_theta)

            def body(x, lp):
                xn = rms_norm(x, lp["attn_norm"], e.norm_eps).astype(cdtype)
                qkv = quant.mm(xn, lp, "wqkv", cdtype) + lp["bqkv"]
                q = qkv[:, :qkv_dim].reshape(t, e.n_heads, e.head_dim)
                k = qkv[:, qkv_dim : 2 * qkv_dim].reshape(
                    t, e.n_kv_heads, e.head_dim)
                v = qkv[:, 2 * qkv_dim :].reshape(t, e.n_kv_heads, e.head_dim)
                q = apply_rope_interleaved(q, cos, sin)
                k = apply_rope_interleaved(k, cos, sin)
                attn = attn_fn(q, k, v).reshape(t, qkv_dim)
                x = x + (quant.mm(attn, lp, "wo", cdtype) + lp["bo"]).astype(
                    x.dtype)
                hn = rms_norm(x, lp["ffn_norm"], e.norm_eps).astype(cdtype)
                g13 = quant.mm(hn, lp, "w13", cdtype)
                gate = silu(g13[:, : e.hidden]) * g13[:, e.hidden :]
                ffn = quant.mm(gate.astype(cdtype), lp, "w2", cdtype) + lp["b2"]
                return x + ffn.astype(x.dtype), None

            x, _ = jax.lax.scan(body, x, layers)
            return x

        return run

    # 1. matmuls only (attention = v passthrough)
    timeit("matmul-only (attn=v)",
           make_transformer(lambda q, k, v: v.astype(cdtype)), enc["layers"],
           x0)

    # 2. banded kernel variants
    for bq, bk in [(256, 256), (512, 512), (128, 256), (512, 256)]:
        fn = make_transformer(
            lambda q, k, v, bq=bq, bk=bk: banded_attention_batched(
                q.astype(cdtype)[None], k.astype(cdtype)[None],
                v.astype(cdtype)[None], window=e.window, block_q=bq,
                block_k=bk, out_dtype=cdtype,
            )[0]
        )
        timeit(f"banded kernel bq={bq} bk={bk}", fn, enc["layers"], x0)

    # 3. XLA banded: q tiles x gathered k bands, f32 scores through HBM
    def xla_banded(q, k, v, bq=256):
        n_i = t // bq
        band = ((e.window - 1 + bq - 1) // bq + 1 + 1) * bq
        qt = q.reshape(n_i, bq, e.n_heads, e.head_dim)
        starts = jnp.arange(n_i) * bq - (band - bq)
        idx = starts[:, None] + jnp.arange(band)[None, :]
        safe = jnp.clip(idx, 0, t - 1)
        kb = k[safe]                      # [n_i, band, KH, D]
        vb = v[safe]
        scores = jnp.einsum(
            "ithd,iskd->ihts", qt.astype(cdtype), kb.astype(cdtype),
            preferred_element_type=jnp.float32,
        ) / np.sqrt(e.head_dim)
        qpos = (jnp.arange(n_i) * bq)[:, None] + jnp.arange(bq)[None]
        valid = (
            (idx[:, None, :] <= qpos[:, :, None])
            & (idx[:, None, :] > qpos[:, :, None] - e.window)
            & (idx[:, None, :] >= 0)
        )
        scores = jnp.where(valid[:, None], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "ihts,iskd->ithd", probs.astype(cdtype), vb,
            preferred_element_type=jnp.float32,
        )
        return out.reshape(t, e.n_heads, e.head_dim)

    if t % 256 == 0:
        timeit("xla banded bq=256",
               make_transformer(lambda q, k, v: xla_banded(q, k, v).astype(cdtype)),
               enc["layers"], x0)


if __name__ == "__main__":
    main()
