#!/usr/bin/env python
"""Bisect the TPU compile wedge in the vmapped fused-encode program.

AOT-lowers each candidate sub-program with ShapeDtypeStructs (no arrays,
no init) and times .compile() on the target backend.  Run pieces one at a
time: python tools/probe_bencode_bisect.py <case> [B]
cases: ringwrite | attn | layer | scan | conv | full
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from voxtral_tpu.config import full_config
from voxtral_tpu.models.encoder import EncKVCache, _enc_layer_step
from voxtral_tpu.models.fused_stream import ConvTails, fused_encode_chunk
from voxtral_tpu.models.params import init_params
from voxtral_tpu.ops.ring import ring_attention, ring_write
from voxtral_tpu.ops.rope import rope_cos_sin

cfg = full_config()
e = cfg.encoder
Q, RING, T = 512, 1280, 256
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
S = jax.ShapeDtypeStruct


def timed_compile(name, fn, *shapes, donate=()):
    t0 = time.monotonic()
    low = jax.jit(fn, donate_argnums=donate).lower(*shapes)
    t_low = time.monotonic() - t0
    t0 = time.monotonic()
    low.compile()
    print(f"{name}: lower {t_low:.1f}s compile {time.monotonic()-t0:.1f}s",
          flush=True)


def main():
    case = sys.argv[1]
    print(f"backend={jax.devices()[0]} case={case} B={B}", flush=True)
    ring_s = S((e.n_layers, e.n_kv_heads, RING, e.head_dim), cfg.kvdtype)
    ring1_s = S((e.n_kv_heads, RING, e.head_dim), cfg.kvdtype)
    kv_s = S((T, e.n_kv_heads, e.head_dim), cfg.cdtype)
    q_s = S((T, e.n_heads, e.head_dim), cfg.cdtype)
    pos_s = S((), jnp.int32)

    if case == "ringwrite":
        f = lambda r, v, p: ring_write(r, v.astype(r.dtype), p)
        timed_compile("ring_write single", f, ring1_s, kv_s, pos_s)
        timed_compile(
            "ring_write vmapped",
            jax.vmap(f, in_axes=(0, 0, None)),
            S((B,) + ring1_s.shape, ring1_s.dtype),
            S((B,) + kv_s.shape, kv_s.dtype), pos_s,
        )

    elif case == "attn":
        f = lambda q, k, v, p: ring_attention(
            q, k, v, p, window=e.window, out_dtype=cfg.cdtype
        )
        timed_compile("ring_attention single", f, q_s, ring1_s, ring1_s, pos_s)
        timed_compile(
            "ring_attention vmapped",
            jax.vmap(f, in_axes=(0, 0, 0, None)),
            S((B,) + q_s.shape, q_s.dtype),
            S((B,) + ring1_s.shape, ring1_s.dtype),
            S((B,) + ring1_s.shape, ring1_s.dtype), pos_s,
        )

    elif case == "layer":
        params_shape = jax.eval_shape(lambda: init_params(cfg, seed=0))
        lp_s = jax.tree.map(
            lambda x: S(x.shape[1:], x.dtype),
            params_shape["encoder"]["layers"],
        )
        x_s = S((T, e.dim), cfg.cdtype)

        def f(x, lp, k_all, v_all, p):
            cos, sin = rope_cos_sin(
                p + jnp.arange(T, dtype=jnp.int32), e.head_dim, e.rope_theta
            )
            return _enc_layer_step(
                e, cfg.cdtype, x, lp, k_all, v_all, jnp.int32(0), p, cos, sin
            )

        timed_compile("enc layer single", f, x_s, lp_s, ring_s, ring_s, pos_s)
        bx = lambda s: S((B,) + s.shape, s.dtype)
        timed_compile(
            "enc layer vmapped",
            jax.vmap(f, in_axes=(0, None, 0, 0, None)),
            bx(x_s), lp_s, bx(ring_s), bx(ring_s), pos_s,
        )

    elif case == "full":
        params_shape = jax.eval_shape(lambda: init_params(cfg, seed=0))
        enc_s, ad_s = params_shape["encoder"], params_shape["adapter"]
        mel_s = S((Q, 128), jnp.float32)
        tails_s = ConvTails(S((2, 128), jnp.float32), S((2, e.dim), cfg.cdtype))
        cache_s = EncKVCache(ring_s, ring_s)

        def run(enc, ad, m, t, c, p):
            return fused_encode_chunk(enc, ad, cfg, m, t, c, p)

        bx = lambda s: S((B,) + s.shape, s.dtype)
        timed_compile(
            "fused encode vmapped",
            jax.vmap(run, in_axes=(None, None, 0, 0, 0, None)),
            enc_s, ad_s, bx(mel_s),
            ConvTails(bx(tails_s.mel_tail), bx(tails_s.c0_tail)),
            EncKVCache(bx(cache_s.k), bx(cache_s.v)), pos_s,
            donate=(4,),
        )

    elif case == "fullsingle":
        params_shape = jax.eval_shape(lambda: init_params(cfg, seed=0))
        enc_s, ad_s = params_shape["encoder"], params_shape["adapter"]
        mel_s = S((Q, 128), jnp.float32)
        tails_s = ConvTails(S((2, 128), jnp.float32), S((2, e.dim), cfg.cdtype))
        cache_s = EncKVCache(ring_s, ring_s)

        def run(enc, ad, m, t, c, p):
            return fused_encode_chunk(enc, ad, cfg, m, t, c, p)

        timed_compile(
            "fused encode single", run,
            enc_s, ad_s, mel_s, tails_s, cache_s, pos_s, donate=(4,),
        )

    else:
        raise SystemExit(f"unknown case {case}")


if __name__ == "__main__":
    main()
