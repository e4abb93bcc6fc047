#!/usr/bin/env python
"""Decompose the batched decode step into measured terms on the real chip.

The B=32 bf16 burst step measures ~16 ms (bench.py) against a ~10-11 ms
HBM-traffic floor (weights 5.6 GB + logits 0.81 GB + KV reads ~1.4 GB at
mid-clip fill).  VERDICT r2 #5 asks for the gap to be attributed before it
is attacked: this tool times each term in isolation with the same shapes,
dtypes, and cache fill as the bench decode phase, then prints the ledger.

Terms
  weights   one full read of every decoder layer matrix + the embed table
            (per-array sums — a pure HBM weight stream, the step's floor)
  logits    [B, dim] x [vocab, dim] tied-embedding matmul + argmax
  attn      26 flash-decode kernel launches over a realistically-filled ring
  rowwrite  26 batched Pallas KV row writes (ops/ring.py ring_rows_write)
  matmuls   26-layer qkv/wo/w13/w2 chain with attention stubbed out (pure
            matmul+norm path, no KV traffic, no Pallas launches)
  step      the real sv.bdecode_burst, ms per token

All timings sync via a ONE-ELEMENT device-sliced D2H fetch and amortize
across an in-jit fori/scan where the per-call cost is small (CLAUDE.md
timing rules for the axon tunnel).

Usage: python tools/decode_profile.py   [env: DP_BATCH=32 DP_RING=896
       DP_POS=500 DP_BURST=64 DP_KV=bfloat16
       DP_TERMS=weights,logits,attn,xla,rowwrite,matmuls,step (subset to
       run — at B=56 the full set's probes OOM next to each other; split
       across two invocations)]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(out):
    import jax

    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)
    return out


def timeit(fn, n=5):
    _sync(fn())
    _sync(fn())
    t0 = time.monotonic()
    for _ in range(n):
        out = fn()
    _sync(out)
    return (time.monotonic() - t0) / n


def main():
    batch = int(os.environ.get("DP_BATCH", "32"))
    ring = int(os.environ.get("DP_RING", "896"))
    pos_v = int(os.environ.get("DP_POS", "500"))
    burst = int(os.environ.get("DP_BURST", "64"))

    import jax
    import jax.numpy as jnp

    from voxtral_tpu.config import full_config
    from voxtral_tpu.models import decoder as dmod
    from voxtral_tpu.models import quant
    from voxtral_tpu.models.params import init_params
    from voxtral_tpu.ops.flash_decode import flash_decode_attention_batched
    from voxtral_tpu.ops.norms import rms_norm, silu
    from voxtral_tpu.ops.ring import ring_rows_write
    from voxtral_tpu.parallel import serving as sv

    cfg = full_config()
    if os.environ.get("DP_KV"):
        cfg = cfg.replace(kv_dtype=os.environ["DP_KV"])
    if os.environ.get("DP_ATTN"):   # force the full step's attention impl
        import dataclasses as _dc

        cfg = cfg.replace(decoder=_dc.replace(
            cfg.decoder, attn_impl=os.environ["DP_ATTN"]
        ))
    d = cfg.decoder
    print(f"device={jax.devices()[0]} B={batch} ring={ring} pos={pos_v} "
          f"kv={cfg.kv_dtype}", file=sys.stderr, flush=True)

    params = init_params(cfg, seed=0)
    jax.block_until_ready(params)
    dp = params["decoder"]
    # this tool profiles the DECODE phase only; drop the ~2 GB
    # encoder+adapter weights so B>=48 probes fit next to the bf16 decoder
    # (the bench pipeline pages them out the same way — engine.offload_encoder)
    params.pop("encoder", None)
    params.pop("adapter", None)
    ada = dmod.ada_scales(dp, cfg)

    # DP_QUANT=int8|int4: profile the quantized serving path's terms (the
    # int4+fp8 step sits at ~10 ms at B=32 vs a ~6 ms floor — attribute
    # before attacking).  The bf16 masters are dropped so big batches fit.
    quant_mode = os.environ.get("DP_QUANT", "")
    if quant_mode == "int8":
        from voxtral_tpu.models.quant import quantize_layer_stack

        dp = dict(dp)
        dp["layers"] = quantize_layer_stack(dp["layers"])
        jax.block_until_ready(dp["layers"]["wqkv"])
        params["decoder"] = dp
    elif quant_mode == "int4":
        from voxtral_tpu.models.quant import quantize_params

        dp = quantize_params({"decoder": dp}, encoder=False, bits=4)[
            "decoder"]
        jax.block_until_ready(dp["layers"]["wqkv"])
        params["decoder"] = dp
    if quant_mode:
        print(f"quant={quant_mode}", file=sys.stderr, flush=True)

    gib = 1 << 30
    # every term amortizes REP iterations inside ONE jitted dispatch: a
    # single-dispatch probe on this tunnel is ~5 ms of pure dispatch
    # latency (verify SKILL round-2 note), which at B>=32 is the same
    # order as the term being measured
    rep = int(os.environ.get("DP_REP", "4"))
    terms = set(os.environ.get(
        "DP_TERMS", "weights,logits,attn,xla,rowwrite,matmuls,step"
    ).split(","))

    # --- term: pure weight stream ---------------------------------------
    layer_bytes = sum(
        int(np.prod(v.shape)) * v.dtype.itemsize
        for v in jax.tree.leaves(dp["layers"])
    )
    embed_bytes = int(np.prod(dp["tok_embeddings"].shape)) * \
        dp["tok_embeddings"].dtype.itemsize

    @jax.jit
    def weight_stream(lyrs, emb):
        # the carry feeds back into every element read, so XLA cannot
        # hoist the (loop-invariant) sums out of the scan — each of the
        # rep iterations must re-stream all weight bytes from HBM
        def body(acc, _):
            s = jnp.float32(0)
            for v in jax.tree.leaves(lyrs):
                s += jnp.sum((v.astype(jnp.float32) + acc * 1e-30))
            s += jnp.sum((emb.astype(jnp.float32) + acc * 1e-30))
            return s, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=rep)
        return acc

    t_w = 0.0
    if "weights" in terms:
        t_w = timeit(
            lambda: weight_stream(dp["layers"], dp["tok_embeddings"]), n=2
        ) / rep
        wb = (layer_bytes + embed_bytes) / gib
        print(f"weights : {1000*t_w:7.2f} ms   ({wb:.2f} GiB -> "
              f"{wb/t_w:.0f} GiB/s)")

    # --- term: logits + argmax ------------------------------------------
    x_l = jnp.ones((rep, batch, d.dim), jnp.float32) * \
        jnp.arange(rep, dtype=jnp.float32)[:, None, None]

    @jax.jit
    def logits_fn(dpp, xs):
        def body(_, x):
            toks = jax.vmap(
                lambda xi: dmod.final_logits(dpp, cfg, xi[None, :])
            )(x).argmax(-1)
            return 0, toks
        _, toks = jax.lax.scan(body, 0, xs)
        return toks

    t_l = 0.0
    if "logits" in terms:
        t_l = timeit(lambda: logits_fn(dp, x_l), n=2) / rep
        print(f"logits  : {1000*t_l:7.2f} ms   ({embed_bytes/gib:.2f} GiB -> "
              f"{embed_bytes/gib/t_l:.0f} GiB/s)")

    # --- terms over a realistically-filled batched cache ----------------
    # build the filled cache directly (zeros-then-ones_like holds TWO
    # copies of the 5.3 GiB B=56 cache and OOMs next to the weights)
    kv_shape = (batch, d.n_layers, d.n_kv_heads, ring, d.head_dim)
    cache = sv.KVCache(jnp.ones(kv_shape, cfg.kvdtype),
                       jnp.ones(kv_shape, cfg.kvdtype))
    pos = jnp.full((batch,), pos_v, jnp.int32)
    q = jnp.zeros((batch, d.n_heads, d.head_dim), jnp.bfloat16)
    krow = jnp.zeros((batch, d.n_kv_heads, d.head_dim), cfg.kvdtype)

    blk = int(os.environ["DP_BLOCK"]) if os.environ.get("DP_BLOCK") else None

    @partial(jax.jit, static_argnames=("flat",))
    def attn26(k_all, v_all, q, pos, flat):
        # rep iterations in one dispatch; the q perturbation by the carry
        # keeps the kernel calls loop-variant (un-hoistable)
        def rbody(r, acc):
            qq = q + acc.astype(q.dtype) * jnp.asarray(1e-30, q.dtype)
            def body(li, acc2):
                out = flash_decode_attention_batched(
                    qq, k_all, v_all, jnp.int32(li), pos,
                    window=d.window, block=blk, out_dtype=jnp.bfloat16,
                    flat=flat,
                )
                return acc2 + out.astype(jnp.float32)
            return jax.lax.fori_loop(0, d.n_layers, body, acc * 1e-30)
        return jax.lax.fori_loop(
            0, rep, rbody,
            jnp.zeros((batch, d.n_heads, d.head_dim), jnp.float32),
        )

    valid = min(pos_v + 1, d.window, ring)
    kv_gib = 2 * batch * d.n_layers * d.n_kv_heads * valid * d.head_dim * \
        cache.k.dtype.itemsize / gib
    t_a = 0.0
    if "attn" in terms:
        for flat in (False, True):
            t_a = timeit(lambda: attn26(cache.k, cache.v, q, pos, flat),
                         n=2) / rep
            tag = "flat" if flat else "grid"
            print(f"attn/{tag}: {1000*t_a:7.2f} ms   (26 flash launches; "
                  f"~{kv_gib:.2f} GiB live KV -> {kv_gib/t_a:.0f} GiB/s)",
                  flush=True)

    # same term through the XLA ring-attention path (what auto picks at
    # cap <= FLASH_RING_THRESHOLD): reads the WHOLE ring every layer
    from voxtral_tpu.ops.ring import ring_attention

    @jax.jit
    def attn26_xla(k_all, v_all, q, pos):
        def one(qi, ki_all, vi_all, pi):
            def rbody(r, acc0):
                qq = qi + acc0.astype(qi.dtype) * jnp.asarray(
                    1e-30, qi.dtype)
                def body(li, acc):
                    k_ring = jax.lax.dynamic_index_in_dim(
                        ki_all, li, axis=0, keepdims=False
                    )
                    v_ring = jax.lax.dynamic_index_in_dim(
                        vi_all, li, axis=0, keepdims=False
                    )
                    out = ring_attention(
                        qq[None].astype(jnp.bfloat16), k_ring, v_ring, pi,
                        window=d.window, out_dtype=jnp.bfloat16,
                    )
                    return acc + out[0].reshape(
                        d.n_heads, d.head_dim).astype(jnp.float32)
                return jax.lax.fori_loop(
                    0, d.n_layers, body, acc0 * 1e-30
                )
            return jax.lax.fori_loop(
                0, rep, rbody,
                jnp.zeros((d.n_heads, d.head_dim), jnp.float32),
            )
        return jax.vmap(one)(q, k_all, v_all, pos)

    if "xla" in terms:
        t_ax = timeit(
            lambda: attn26_xla(cache.k, cache.v, q, pos), n=2
        ) / rep
        full_gib = 2 * batch * d.n_layers * d.n_kv_heads * ring * \
            d.head_dim * cache.k.dtype.itemsize / gib
        print(f"attn/xla: {1000*t_ax:7.2f} ms   (whole-ring reads; "
              f"{full_gib:.2f} GiB -> {full_gib/t_ax:.0f} GiB/s)")

    # --- term: 26 batched row writes (donated carry — an undonated copy
    # of the 3 GB cache next to the attn probes OOMs a 16 GB chip) --------
    state = {"k": cache.k, "v": cache.v}
    del cache

    @partial(jax.jit, donate_argnums=(0, 1))
    def write26(k_all, v_all, krow, pos):
        def rbody(r, carry):
            def body(li, carry):
                k_all, v_all = carry
                f = lambda ka, va, kr, vr, p: ring_rows_write(
                    ka, va, kr, vr, jnp.int32(li), p
                )
                k_all, v_all = jax.vmap(f)(k_all, v_all, krow, krow, pos)
                return k_all, v_all
            return jax.lax.fori_loop(0, d.n_layers, body, carry)
        return jax.lax.fori_loop(0, rep, rbody, (k_all, v_all))

    def wfn():
        state["k"], state["v"] = write26(state["k"], state["v"], krow, pos)
        return state["k"]

    t_rw = 0.0
    if "rowwrite" in terms:
        t_rw = timeit(wfn, n=2) / rep
        print(f"rowwrite: {1000*t_rw:7.2f} ms   (26 batched Pallas row "
              f"writes)", flush=True)
    state.clear()

    # --- term: matmul+norm chain, attention stubbed ---------------------
    cdtype = cfg.cdtype

    @jax.jit
    def matmuls_only(lyrs, ada, x):
        # int4: packed stacks stay OUT of the scan xs (same rule as
        # decoder_forward — a scan-sliced packed operand materializes the
        # per-layer gather)
        packed4 = quant.stack_is_packed4(lyrs)
        xs_lp = (
            {k: v for k, v in lyrs.items()
             if k not in quant.PACKED_STACK_KEYS} if packed4 else lyrs
        )

        def body(carry, xs):
            x = carry
            lp, ada_l, li = xs
            if packed4:
                lp = dict(lp)
                for kk in quant.PACKED_STACK_KEYS:
                    if kk in lyrs:
                        lp[kk] = lyrs[kk]
            xn = rms_norm(x, lp["attn_norm"], d.norm_eps).astype(cdtype)
            qkv = quant.mm(xn, lp, "wqkv", cdtype, li=li)
            attn = qkv[:, : d.q_dim]                      # stub: no KV/flash
            x = x + quant.mm(attn, lp, "wo", cdtype, li=li).astype(x.dtype)
            hn = rms_norm(x, lp["ffn_norm"], d.norm_eps).astype(jnp.float32)
            hn = (hn * (1.0 + ada_l)).astype(cdtype)
            g13 = quant.mm(hn, lp, "w13", cdtype, li=li)
            gate = silu(g13[:, : d.hidden]) * g13[:, d.hidden:]
            ffn = quant.mm(gate.astype(cdtype), lp, "w2", cdtype, li=li)
            return x + ffn.astype(x.dtype), None
        def rbody(r, xr):
            out, _ = jax.lax.scan(
                body, xr * 1e-3,
                (xs_lp, ada, jnp.arange(d.n_layers, dtype=jnp.int32)),
            )
            return out
        return jax.lax.fori_loop(0, rep, rbody, x)

    x_m = jnp.zeros((batch, d.dim), jnp.float32)
    t_m = 0.0
    if "matmuls" in terms:
        t_m = timeit(lambda: matmuls_only(dp["layers"], ada, x_m), n=2) / rep
        print(f"matmuls : {1000*t_m:7.2f} ms   (26-layer qkv/wo/w13/w2 "
              f"chain, {layer_bytes/gib:.2f} GiB -> "
              f"{layer_bytes/gib/t_m:.0f} GiB/s)")

    # --- the real step ---------------------------------------------------
    cache2 = sv.batched_dec_cache(cfg, batch, ring)
    chunk = jnp.zeros((batch, burst, d.dim), jnp.float32)
    prev = jnp.full((batch,), 32, jnp.int32)
    st = {"c": cache2}

    def step():
        toks, _, _, _, st["c"] = sv.bdecode_burst(
            dp, cfg, chunk, prev, st["c"], pos, ada,
        )
        return toks

    t_s = timeit(step)
    ms = 1000 * t_s / burst
    total_terms = 1000 * (t_m + t_l) / 1 + 1000 * (t_a + t_rw) / 1
    print(f"step    : {ms:7.2f} ms/token (burst {burst}, B={batch}) — "
          f"terms sum {1000*(t_m+t_l+t_a+t_rw):.2f} ms "
          f"-> residual {ms - 1000*(t_m+t_l+t_a+t_rw):+.2f} ms "
          f"(scan/fusion overhead)")
    _ = total_terms


if __name__ == "__main__":
    main()
