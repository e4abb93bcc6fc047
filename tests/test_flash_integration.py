"""attn_impl="flash" decode path must produce identical tokens to "xla"."""

import dataclasses

import numpy as np

from voxtral_tpu.config import tiny_config
from voxtral_tpu.models.params import init_params
from voxtral_tpu.runtime.engine import VoxtralEngine
from test_decoder import _run_engine_decode


def test_flash_decode_burst_matches_xla(tiny_tokenizer):
    cfg = tiny_config()
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    adapter_out = (rng.standard_normal((70, cfg.decoder.dim)) * 0.5).astype(
        np.float32
    )

    eng_x = VoxtralEngine(cfg, params, tokenizer=tiny_tokenizer,
                          buckets=(16, 4, 1), enc_kv_ring=64, dec_kv_ring=64)
    tokens_xla = _run_engine_decode(eng_x, adapter_out, buckets=(1,))

    cfg_f = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, attn_impl="flash")
    )
    eng_f = VoxtralEngine(cfg_f, params, tokenizer=tiny_tokenizer,
                          buckets=(16, 4, 1), enc_kv_ring=64, dec_kv_ring=64)
    tokens_flash = _run_engine_decode(eng_f, adapter_out, buckets=(1,))
    assert tokens_flash == tokens_xla


def test_flash_batched_serving_matches_xla(tiny_tokenizer):
    """bdecode_burst (vmapped serving path) with attn_impl=flash must equal
    the XLA path — exercises the custom_vmap kernel routing end-to-end."""
    import jax.numpy as jnp
    from voxtral_tpu.parallel import serving as sv

    cfg = tiny_config()
    params = init_params(cfg, seed=0)
    cfg_f = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, attn_impl="flash")
    )
    rng = np.random.default_rng(3)
    B, T = 3, 12
    chunks = jnp.asarray(
        (rng.standard_normal((B, T, cfg.decoder.dim)) * 0.5).astype(np.float32)
    )
    prev = jnp.asarray([32, 32, 32], jnp.int32)
    pos = jnp.asarray([0, 0, 0], jnp.int32)

    c1 = sv.batched_dec_cache(cfg, B, 64)
    toks_x, _, _, _, _ = sv.bdecode_burst(
        params["decoder"], cfg, chunks, prev, c1, pos,
        jnp.zeros((cfg.decoder.n_layers, cfg.decoder.dim), jnp.float32),
    )
    c2 = sv.batched_dec_cache(cfg, B, 64)
    toks_f, _, _, _, _ = sv.bdecode_burst(
        params["decoder"], cfg_f, chunks, prev, c2, pos,
        jnp.zeros((cfg.decoder.n_layers, cfg.decoder.dim), jnp.float32),
    )
    np.testing.assert_array_equal(np.asarray(toks_f), np.asarray(toks_x))


def test_auto_routing_fp8_rings_never_flash(tiny_tokenizer, monkeypatch):
    """attn_impl="auto" must route fp8 rings to the XLA attention path and
    bf16 rings (batched burst) to the flash kernel.  The fp8 flash path
    measured ~3x SLOWER than XLA at realistic fill (31.2 vs 10.2 ms at
    B=56 x ring 896 — docs/PERF.md round 3): the kernel's in-VMEM fp8->f32
    widening runs on the VPU at element rate, while XLA fuses the widening
    into its attention loop.  Trace-time sentinel: the flash entry is
    monkeypatched to record invocation."""
    import jax.numpy as jnp

    from voxtral_tpu.models import decoder as dmod
    from voxtral_tpu.ops.flash_decode import flash_decode_write_attention
    from voxtral_tpu.parallel import serving as sv

    cfg = tiny_config()
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(5)
    B, T = 2, 3  # unique shapes so jit re-traces inside this test
    chunks = jnp.asarray(
        (rng.standard_normal((B, T, cfg.decoder.dim)) * 0.5).astype(np.float32)
    )
    prev = jnp.full((B,), 32, jnp.int32)
    pos = jnp.zeros((B,), jnp.int32)
    ada = jnp.zeros((cfg.decoder.n_layers, cfg.decoder.dim), jnp.float32)

    hits = []

    def sentinel(*a, **kw):
        hits.append(1)
        return flash_decode_write_attention(*a, **kw)

    monkeypatch.setattr(dmod, "flash_decode_write_attention", sentinel)

    assert cfg.decoder.attn_impl == "auto"
    cfg8 = cfg.replace(kv_dtype="float8_e4m3fn")
    c8 = sv.batched_dec_cache(cfg8, B, 32)
    sv.bdecode_burst(params["decoder"], cfg8, chunks, prev, c8, pos, ada)
    assert not hits, "fp8 rings must not take the flash-decode path"

    c16 = sv.batched_dec_cache(cfg, B, 32)
    sv.bdecode_burst(params["decoder"], cfg, chunks, prev, c16, pos, ada)
    assert hits, "batched bf16 bursts must take the flash-decode path"
