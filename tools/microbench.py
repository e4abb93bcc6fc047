#!/usr/bin/env python
"""Micro-benchmarks for the hot programs on the real chip.

Usage: python tools/microbench.py [decode|encode|all]
Env: MB_BATCH (default 16), MB_RING (default 1024), MB_BURST (default 64)

Reports ms/step for the batched decode burst (the HBM-bandwidth-bound core),
the prefill, and the batched encoder chunk, with roofline context:
weights ~6.9 GB/step read => ~8.4 ms at 819 GB/s on v5e.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(out):
    """Force completion via a D2H fetch of ONE ELEMENT of the first array
    leaf — block_until_ready alone has proven unreliable on remote tunnels,
    and fetching a whole leaf ships it at ~0.05 GB/s (round-3 lesson:
    un-sliced fetches inflated short measurements by 50-500 ms)."""
    import jax

    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)
    return out


def timeit(fn, n=5):
    _sync(fn())  # compile + settle
    _sync(fn())  # one hot run un-timed
    t0 = time.monotonic()
    for _ in range(n):
        out = fn()
    _sync(out)
    return (time.monotonic() - t0) / n


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    batch = int(os.environ.get("MB_BATCH", "16"))
    ring = int(os.environ.get("MB_RING", "1024"))
    burst = int(os.environ.get("MB_BURST", "64"))

    import jax
    import jax.numpy as jnp

    from voxtral_tpu.config import full_config
    from voxtral_tpu.models.params import init_params
    from voxtral_tpu.parallel import serving as sv
    from voxtral_tpu.runtime.engine import VoxtralEngine
    from voxtral_tpu.tokenizer import TekkenTokenizer

    print(f"device={jax.devices()[0]} batch={batch} ring={ring} burst={burst}",
          file=sys.stderr)
    cfg = full_config()
    if os.environ.get("MB_ATTN"):  # force xla/flash/auto for A/B runs
        import dataclasses as _dc

        cfg = cfg.replace(
            decoder=_dc.replace(cfg.decoder, attn_impl=os.environ["MB_ATTN"])
        )
    if os.environ.get("MB_KV"):    # KV ring storage dtype (e.g. float8_e4m3fn)
        cfg = cfg.replace(kv_dtype=os.environ["MB_KV"])
    if os.environ.get("MB_UNROLL"):  # layer-scan unroll factor A/B
        import dataclasses as _dc

        cfg = cfg.replace(decoder=_dc.replace(
            cfg.decoder, scan_unroll=int(os.environ["MB_UNROLL"])
        ))
    t0 = time.monotonic()
    params = init_params(cfg, seed=0)  # generated on device — no host transfer
    jax.block_until_ready(params)
    print(f"init_params on device: {time.monotonic() - t0:.1f}s", file=sys.stderr)
    tok = TekkenTokenizer([b"x"] * 1000, 1000)
    eng = VoxtralEngine(cfg, params, tokenizer=tok, buckets=(256, 64, 16, 4, 1),
                        enc_kv_ring=1024, dec_kv_ring=ring)
    ada = eng.ada()

    if which in ("decode", "all"):
        import dataclasses

        chunk = jnp.zeros((batch, burst, cfg.decoder.dim), jnp.float32)
        prev = jnp.full((batch,), 32, jnp.int32)
        pos = jnp.full((batch,), 500, jnp.int32)
        cfg_flash = cfg.replace(
            decoder=dataclasses.replace(cfg.decoder, attn_impl="flash")
        )
        dparams = eng.params["decoder"]
        if os.environ.get("MB_INT8") or os.environ.get("MB_INT4"):
            # int8/int4 layers + embedding table
            from voxtral_tpu.models.quant import quantize_params

            bits = 4 if os.environ.get("MB_INT4") else 8
            dparams = quantize_params(
                eng.params, encoder=False, bits=bits
            )["decoder"]
            jax.block_until_ready(dparams)
        # "auto" resolves to the fused flash path inside bdecode_burst for
        # batched bursts; "xla" pins the whole-ring XLA attention for A/Bs
        cfg_xla = cfg.replace(
            decoder=dataclasses.replace(cfg.decoder, attn_impl="xla")
        )
        variants = (
            ("auto", cfg),
            ("xla", cfg_xla),
            ("flash", cfg_flash),
        )
        for name, c in variants:
            state = {"cache": sv.batched_dec_cache(cfg, batch, ring)}

            def step(c=c):
                toks, _, _, _, state["cache"] = sv.bdecode_burst(
                    dparams, c, chunk, prev, state["cache"],
                    pos, ada,
                )
                return toks

            t = timeit(step)
            ms = 1000 * t / burst
            print(f"decode burst [{name}]: {1000*t:.1f} ms / {burst} steps = "
                  f"{ms:.2f} ms/step ({batch} streams) -> "
                  f"{batch*80/ms:.1f}x realtime aggregate")

    if which in ("prefill", "all"):
        cache = sv.batched_dec_cache(cfg, batch, ring)
        embeds = jnp.zeros((batch, 38, cfg.decoder.dim), jnp.float32)
        state = {"c": cache}

        def pf():
            state["c"] = sv.bprefill_lockstep(
                eng.params["decoder"], cfg, embeds, state["c"], jnp.int32(0), ada
            )
            return state["c"].k

        t = timeit(pf)
        print(f"prefill(38): {1000*t:.1f} ms ({batch} streams)")

    if which in ("encode", "all"):
        ecache = sv.batched_enc_cache(cfg, batch, 1024)
        x = jnp.zeros((batch, 256, cfg.encoder.dim), jnp.bfloat16)
        state = {"c": ecache}

        def enc():
            y, state["c"] = sv.bencode_lockstep(
                eng.params["encoder"], cfg, x, state["c"], jnp.int32(100)
            )
            return y

        t = timeit(enc)
        # 256 encoder positions = 20.48 s of audio
        print(f"encode chunk 256: {1000*t:.1f} ms ({batch} streams) "
              f"-> {batch*256*0.08/t:.0f}x realtime aggregate")

    if which in ("single", "all"):
        from voxtral_tpu.models import decoder as dmod
        from voxtral_tpu.models.decoder import KVCache

        cache = KVCache.create(cfg.decoder, cfg.kvdtype, ring)
        chunk = jnp.zeros((burst, cfg.decoder.dim), jnp.float32)
        state = {"c": cache}

        def sstep():
            toks, _, _, _, state["c"] = dmod.decode_burst(
                eng.params["decoder"], cfg, chunk, jnp.int32(32), state["c"],
                jnp.int32(500), ada,
            )
            return toks

        t = timeit(sstep)
        ms = 1000 * t / burst
        print(f"single-stream sequential: {ms:.2f} ms/step "
              f"-> {80/ms:.1f}x realtime")

    if which in ("jacobi", "all"):
        from voxtral_tpu.models.decoder import KVCache
        from voxtral_tpu.models.jacobi import decode_burst_jacobi

        cache = KVCache.create(cfg.decoder, cfg.kvdtype, ring)
        chunk = jnp.zeros((burst, cfg.decoder.dim), jnp.float32)
        state = {"c": cache, "it": None}

        def jstep():
            toks, _, _, _, state["c"], iters = decode_burst_jacobi(
                eng.params["decoder"], cfg, chunk, jnp.int32(32), state["c"],
                jnp.int32(500), ada, window=min(64, burst),
            )
            state["it"] = iters
            return toks

        t = timeit(jstep)
        iters = int(state["it"])
        per_iter = 1000 * t / max(iters, 1)
        print(f"jacobi: {1000*t:.1f} ms / {burst} tokens in {iters} iters "
              f"({per_iter:.2f} ms/iter; random weights ~= worst case). "
              f"Speedup vs sequential = tokens-settled-per-iter.")

    if which in ("logits", "all"):
        x = jnp.zeros((batch, cfg.decoder.dim), jnp.float32)

        from voxtral_tpu.models.decoder import final_logits

        @jax.jit
        def lg(dp, x):
            # params explicit: closed-over weights become HLO constants and
            # can wedge TPU constant folding (see docs/PERF.md)
            return jax.vmap(
                lambda xi: final_logits(dp, cfg, xi[None, :])
            )(x).argmax(-1)

        t = timeit(lambda: lg(eng.params["decoder"], x))
        print(f"logits+argmax: {1000*t:.2f} ms ({batch} streams)")


if __name__ == "__main__":
    main()
