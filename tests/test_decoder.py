"""Decoder: prefill + burst decode (ring cache, scan feedback) vs the naive
torch oracle running the offline greedy schedule."""

import jax.numpy as jnp
import numpy as np

from voxtral_tpu.config import TOKEN_EOS, TOKEN_STREAMING_PAD


def _run_engine_decode(engine, adapter_out, buckets=(16, 4, 1)):
    """Prefill + bucketed bursts, like the stream does."""
    cfg = engine.cfg
    L = engine.prompt_len
    rows = adapter_out[:L].copy()
    rows[0] += engine.embed_bos
    rows[1:] += engine.embed_pad
    cache = engine.new_dec_cache()
    cache = engine.prefill(rows[: L - 1], cache, 0)

    tokens = []
    prev = TOKEN_STREAMING_PAD
    pos = L - 1
    n = len(adapter_out)
    while pos < n:
        b = next(x for x in sorted(buckets, reverse=True) if x <= n - pos)
        chunk = adapter_out[pos : pos + b]
        toks, _, _, _, cache = engine.decode_burst(chunk, prev, cache, pos)
        toks = np.asarray(toks)
        done = False
        for t in toks:
            tokens.append(int(t))
            prev = int(t)
            if int(t) == TOKEN_EOS:
                done = True
                break
        if done:
            break
        pos += b
    return tokens


def test_decode_matches_oracle_greedy(engine, params_np, cfg):
    from oracle import oracle_decode_greedy

    rng = np.random.default_rng(0)
    n_audio = 90  # decode positions wrap the 64-slot ring, window 48
    adapter_out = (rng.standard_normal((n_audio, cfg.decoder.dim)) * 0.5).astype(
        np.float32
    )
    ref = oracle_decode_greedy(params_np["decoder"], cfg, adapter_out)
    got = _run_engine_decode(engine, adapter_out)
    # Greedy argmax over random-weight logits: tolerate divergence only after
    # a genuine near-tie; require exact match (ties are unlikely at f32).
    assert got == ref, f"engine {got[:20]} vs oracle {ref[:20]}"


def test_decode_bucketing_invariance(engine, params_np, cfg):
    """Any burst bucketing must give identical tokens."""
    rng = np.random.default_rng(3)
    adapter_out = (rng.standard_normal((61, cfg.decoder.dim)) * 0.5).astype(
        np.float32
    )
    a = _run_engine_decode(engine, adapter_out, buckets=(16, 4, 1))
    b = _run_engine_decode(engine, adapter_out, buckets=(4, 1))
    assert a == b


def test_scan_unroll_equivalence(cfg, params, engine):
    """scan_unroll > 1 (layer-scan unrolling, DecoderConfig.scan_unroll) must
    be numerically identical to the rolled scan — it only changes loop
    structure, not math (f32 tiny config: bitwise)."""
    import dataclasses

    import jax.numpy as jnp

    from voxtral_tpu.config import TOKEN_STREAMING_PAD
    from voxtral_tpu.models import decoder as dec_mod

    rng = np.random.default_rng(7)
    adapter = (rng.standard_normal((12, cfg.decoder.dim)) * 0.5).astype(
        np.float32
    )
    cfg2 = cfg.replace(
        decoder=dataclasses.replace(cfg.decoder, scan_unroll=2)
    )
    outs = []
    for c in (cfg, cfg2):
        cache = engine.new_dec_cache()
        toks, _, _, _, _ = dec_mod.decode_burst(
            params["decoder"], c, jnp.asarray(adapter),
            jnp.int32(TOKEN_STREAMING_PAD), cache, jnp.int32(0), engine.ada(),
        )
        outs.append(np.asarray(toks))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_teacher_forced_logits_match_oracle(engine, params_np, cfg):
    """Per-step logits under teacher forcing (removes argmax-flip chaos)."""
    import torch
    from oracle import OracleDecoder, t32

    from voxtral_tpu.models import decoder as dec_mod

    rng = np.random.default_rng(5)
    T = 12
    embeds = (rng.standard_normal((T, cfg.decoder.dim)) * 0.5).astype(np.float32)

    odec = OracleDecoder(params_np["decoder"], cfg)
    with torch.no_grad():
        h_ref = odec.forward(t32(embeds), 0)
        logits_ref = odec.logits(h_ref).numpy()

    cache = engine.new_dec_cache()
    ada = engine.ada()
    h, cache = dec_mod.decoder_forward(
        engine.params["decoder"], cfg, jnp.asarray(embeds), cache,
        jnp.int32(0), ada,
    )
    logits = np.asarray(
        dec_mod.final_logits(engine.params["decoder"], cfg, h)
    )
    np.testing.assert_allclose(logits, logits_ref, atol=2e-3, rtol=2e-3)


def test_alt_outputs(engine, cfg):
    """decode_burst with n_alt returns the argmax's probability and top text
    candidates consistent with the logits."""
    rng = np.random.default_rng(7)
    adapter_out = (rng.standard_normal((8, cfg.decoder.dim)) * 0.5).astype(
        np.float32
    )
    cache = engine.new_dec_cache()
    toks, alt_ids, alt_probs, best_probs, cache = engine.decode_burst(
        adapter_out, TOKEN_STREAMING_PAD, cache, 0, n_alt=4
    )
    toks = np.asarray(toks)
    alt_ids = np.asarray(alt_ids)
    alt_probs = np.asarray(alt_probs)
    best_probs = np.asarray(best_probs)
    assert alt_ids.shape == (8, 4)
    assert (alt_ids >= 1000).all()
    # alt probs sorted descending
    assert (np.diff(alt_probs, axis=1) <= 1e-7).all()
    assert (best_probs > 0).all() and (best_probs <= 1.0).all()
    # the argmax token, when in text range, must equal the top text candidate
    for j in range(8):
        if toks[j] >= 1000:
            assert alt_ids[j, 0] == toks[j]
            np.testing.assert_allclose(alt_probs[j, 0], best_probs[j], rtol=1e-5)


def test_prefill_unroll_layers_equivalence(cfg, params, engine):
    """unroll_layers=True (the batched-prefill form that keeps vmapped ring
    updates in place — serving.bprefill) must produce a bitwise-identical
    cache to the layer scan, both single-stream and stream-vmapped."""
    import jax
    import jax.numpy as jnp

    from voxtral_tpu.models import decoder as dec_mod
    from voxtral_tpu.parallel import serving as sv

    rng = np.random.default_rng(11)
    emb = jnp.asarray(
        rng.standard_normal((7, cfg.decoder.dim)).astype(np.float32)
    )
    outs = []
    for unroll in (False, True):
        cache = engine.new_dec_cache()
        out = dec_mod.prefill(
            params["decoder"], cfg, emb, cache, jnp.int32(0), engine.ada(),
            unroll_layers=unroll,
        )
        outs.append(out)
    np.testing.assert_array_equal(np.asarray(outs[0].k), np.asarray(outs[1].k))
    np.testing.assert_array_equal(np.asarray(outs[0].v), np.asarray(outs[1].v))

    # batched: bprefill (unrolled under vmap) == stacked single-stream caches
    b = 3
    bemb = jnp.asarray(
        rng.standard_normal((b, 7, cfg.decoder.dim)).astype(np.float32)
    )
    bcache = sv.batched_dec_cache(cfg, b, engine.dec_kv_ring)
    got = sv.bprefill(
        params["decoder"], cfg, bemb, bcache,
        jnp.zeros((b,), jnp.int32), engine.ada(),
    )
    for s in range(b):
        ref = dec_mod.prefill(
            params["decoder"], cfg, bemb[s], engine.new_dec_cache(),
            jnp.int32(0), engine.ada(),
        )
        np.testing.assert_array_equal(np.asarray(got.k[s]), np.asarray(ref.k))
        np.testing.assert_array_equal(np.asarray(got.v[s]), np.asarray(ref.v))
