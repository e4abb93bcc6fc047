"""int8 weight-only quantization: runs end-to-end, logits stay close."""

import jax.numpy as jnp
import numpy as np

from voxtral_tpu.config import TOKEN_STREAMING_PAD
from voxtral_tpu.models import decoder as dec_mod
from voxtral_tpu.models.quant import quantize_params


def test_quantized_decode_runs_and_tracks(engine, cfg, params):
    rng = np.random.default_rng(0)
    t = 24
    adapter = (rng.standard_normal((t, cfg.decoder.dim)) * 0.5).astype(np.float32)

    qparams = quantize_params(params)
    assert qparams["decoder"]["layers"]["wqkv"].dtype == jnp.int8
    assert "wqkv_scale" in qparams["decoder"]["layers"]
    assert qparams["decoder"]["tok_embeddings"].dtype == jnp.int8

    cache = engine.new_dec_cache()
    toks_f, _, _, _, _ = dec_mod.decode_burst(
        params["decoder"], cfg, jnp.asarray(adapter),
        jnp.int32(TOKEN_STREAMING_PAD), cache, jnp.int32(0), engine.ada(),
    )
    cache = engine.new_dec_cache()
    toks_q, _, _, _, _ = dec_mod.decode_burst(
        qparams["decoder"], cfg, jnp.asarray(adapter),
        jnp.int32(TOKEN_STREAMING_PAD), cache, jnp.int32(0), engine.ada(),
    )
    agree = float(np.mean(np.asarray(toks_f) == np.asarray(toks_q)))
    # random tiny weights are the worst case for quantization-flip chaos;
    # require the sequences to broadly track (real checkpoints agree far more)
    assert agree >= 0.5, agree


def test_quantized_embeddings_and_logits_close(cfg, params):
    """Per-row int8 embedding table: lookups and the tied-logits matmul must
    stay within quantization rounding of the bf16 path."""
    from voxtral_tpu.models.quant import embed_rows

    qd = quantize_params(params)["decoder"]
    d = params["decoder"]

    ids = jnp.asarray([1, 2, 32, 7], jnp.int32)
    r_q = np.asarray(embed_rows(qd, ids))
    r_f = np.asarray(embed_rows(d, ids))
    scale = np.abs(r_f).max() + 1e-9
    assert np.abs(r_q - r_f).max() / scale < 0.02

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((3, cfg.decoder.dim)), jnp.float32)
    lg_q = np.asarray(dec_mod.final_logits(qd, cfg, x))
    lg_f = np.asarray(dec_mod.final_logits(d, cfg, x))
    rel = np.abs(lg_q - lg_f).max() / (np.abs(lg_f).max() + 1e-9)
    assert rel < 0.05, rel


def test_engine_quantize_kwarg_end_to_end(cfg, params, tiny_tokenizer):
    """VoxtralEngine(quantize=True) — the CLI --int8 path — must stream a
    clip end-to-end (decoder weights int8, encoder exact)."""
    from conftest import make_audio
    from voxtral_tpu.runtime.engine import VoxtralEngine
    from voxtral_tpu.runtime.stream import transcribe_tokens

    eng = VoxtralEngine(
        cfg, params, tokenizer=tiny_tokenizer, buckets=(16, 4, 1),
        enc_kv_ring=64, dec_kv_ring=64, quantize=True,
    )
    assert eng.quantized
    assert eng.params["decoder"]["layers"]["wqkv"].dtype == jnp.int8
    assert eng.params["encoder"]["layers"]["wqkv"].dtype != jnp.int8
    toks = transcribe_tokens(eng, make_audio(1.6, seed=41))
    assert len(toks) > 0


def test_fp8_kv_cache_end_to_end(params, tiny_tokenizer):
    """kv_dtype="float8_e4m3fn" (the VOXTRAL_KV_DTYPE fp8 ladder rung —
    halves KV ring traffic vs bf16): streams end-to-end, and the decoded
    sequence broadly tracks the f32-KV engine on the same audio."""
    from conftest import make_audio
    from voxtral_tpu.config import tiny_config
    from voxtral_tpu.runtime.engine import VoxtralEngine
    from voxtral_tpu.runtime.stream import transcribe_tokens

    audio = make_audio(1.6, seed=47)

    def run(kv):
        cfg = tiny_config().replace(kv_dtype=kv)
        eng = VoxtralEngine(
            cfg, params, tokenizer=tiny_tokenizer, buckets=(16, 4, 1),
            enc_kv_ring=64, dec_kv_ring=64,
        )
        assert eng.new_dec_cache().k.dtype == jnp.dtype(kv)
        return run_tokens(eng)

    def run_tokens(eng):
        return transcribe_tokens(eng, audio)

    ref = run("float32")
    got = run("float8_e4m3fn")
    assert len(got) > 0
    m = min(len(ref), len(got))
    agree = sum(a == b for a, b in zip(ref[:m], got[:m])) / m
    # random tiny weights are the worst case for rounding-flip chaos
    assert agree >= 0.5, (agree, ref, got)


def test_enc_kv_dtype_override(params, tiny_tokenizer):
    """enc_kv_dtype lets a serving mode drop the DECODER rings to fp8 while
    the encoder ring stays exact (bench.py BENCH_MODE=int4 contract) — both
    the engine's cache factory and the batched serving factory honor it."""
    from conftest import make_audio
    from voxtral_tpu.config import tiny_config
    from voxtral_tpu.parallel import serving as sv
    from voxtral_tpu.runtime.engine import VoxtralEngine
    from voxtral_tpu.runtime.stream import transcribe_tokens

    cfg = tiny_config().replace(
        kv_dtype="float8_e4m3fn", enc_kv_dtype="float32"
    )
    eng = VoxtralEngine(
        cfg, params, tokenizer=tiny_tokenizer, buckets=(16, 4, 1),
        enc_kv_ring=64, dec_kv_ring=64,
    )
    assert eng.new_dec_cache().k.dtype == jnp.dtype("float8_e4m3fn")
    assert eng.new_enc_cache().k.dtype == jnp.float32
    assert sv.batched_dec_cache(cfg, 2, 64).k.dtype == jnp.dtype(
        "float8_e4m3fn"
    )
    assert sv.batched_enc_cache(cfg, 2, 64).k.dtype == jnp.float32
    # default: enc follows kv_dtype
    cfg2 = tiny_config().replace(kv_dtype="float8_e4m3fn")
    assert sv.batched_enc_cache(cfg2, 2, 64).k.dtype == jnp.dtype(
        "float8_e4m3fn"
    )
    assert len(transcribe_tokens(eng, make_audio(1.6, seed=47))) > 0


def test_int4_groupwise_mm_close():
    """Half-scaled int4 matmul (quant.mm nibble-packed path) tracks the f32
    matmul to within 4-bit rounding error."""
    import jax

    from voxtral_tpu.models import quant

    rng = np.random.default_rng(11)
    w = jnp.asarray(rng.standard_normal((2, 64, 512)), jnp.float32)  # [L,O,I]
    x = jnp.asarray(rng.standard_normal((5, 512)), jnp.float32)

    lp = quant.quantize_layer_stack({"wqkv": w}, bits=4)
    assert lp["wqkv"].dtype == jnp.int8
    assert lp["wqkv"].shape == (2, 64, 256)  # nibble-packed halves
    assert lp["wqkv_scale"].shape == (2, 64, 2)  # one scale per half

    lp0 = jax.tree.map(lambda a: a[0], lp)
    y = np.asarray(quant.mm(x, lp0, "wqkv", jnp.float32))
    ref = np.asarray(x @ w[0].T)
    rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
    # iid-Gaussian weights are 4-bit's worst case (uniform variance, ~3.5σ
    # row maxima): bounded by plain 4-bit rounding noise; real checkpoints
    # (outlier-heavy rows) benefit far more from the group scales
    assert rel < 0.15, rel

    # group scales must not be WORSE than one scale per output row
    wf = np.asarray(w[0])
    s_row = np.abs(wf).max(axis=1, keepdims=True) / 7.0
    q_row = np.clip(np.round(wf / s_row), -7, 7) * s_row
    rel_row = np.abs(np.asarray(x) @ q_row.T - ref).max() / (
        np.abs(ref).max() + 1e-9
    )
    assert rel <= rel_row * 1.05, (rel, rel_row)


def test_int4_pallas_kernel_matches_xla():
    """The Pallas nibble-packed matmul (ops/quant_mm.py, interpret mode on
    CPU) must match the XLA half-scale path for every layer index, and the
    custom_vmap rule must serve a whole stream batch with shared weights."""
    import jax

    from voxtral_tpu.models import quant
    from voxtral_tpu.ops.quant_mm import int4_mm

    rng = np.random.default_rng(13)
    w = jnp.asarray(rng.standard_normal((3, 64, 512)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((5, 512)), jnp.float32)
    lp = quant.quantize_layer_stack({"wqkv": w}, bits=4)
    p, s = lp["wqkv"], lp["wqkv_scale"]

    for li in (0, 2):
        y_pal = np.asarray(int4_mm(x, p, s, li))
        y_xla = np.asarray(quant._mm4(x, p[li], s[li], jnp.float32))
        np.testing.assert_allclose(y_pal, y_xla, rtol=2e-5, atol=2e-5)

    xb = jnp.asarray(rng.standard_normal((4, 5, 512)), jnp.float32)
    yb = jax.vmap(int4_mm, in_axes=(0, None, None, None))(xb, p, s, 1)
    assert yb.shape == (4, 5, 64)
    for i in range(4):
        np.testing.assert_allclose(
            np.asarray(yb[i]),
            np.asarray(quant._mm4(xb[i], p[1], s[1], jnp.float32)),
            rtol=2e-5, atol=2e-5,
        )

    # prefill-sized row counts exercise the row-tile + padding path
    # (batched prefill folds B*38 rows; untiled x blocks blow VMEM on chip)
    xl = jnp.asarray(rng.standard_normal((300, 512)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(int4_mm(xl, p, s, 0)),
        np.asarray(quant._mm4(xl, p[0], s[0], jnp.float32)),
        rtol=2e-5, atol=2e-5,
    )


def test_int4_engine_end_to_end(cfg, params, tiny_tokenizer):
    """VoxtralEngine(quantize="int4") — the CLI --int4 path — must stream a
    clip end-to-end (decoder weights int4 + group scales, encoder exact)."""
    from conftest import make_audio
    from voxtral_tpu.runtime.engine import VoxtralEngine
    from voxtral_tpu.runtime.stream import transcribe_tokens

    eng = VoxtralEngine(
        cfg, params, tokenizer=tiny_tokenizer, buckets=(16, 4, 1),
        enc_kv_ring=64, dec_kv_ring=64, quantize="int4",
    )
    lyr = eng.params["decoder"]["layers"]
    assert lyr["wqkv"].dtype == jnp.int8
    assert lyr["wqkv"].shape[-1] == cfg.decoder.dim // 2  # nibble-packed
    assert lyr["wqkv_scale"].ndim == lyr["wqkv"].ndim  # group scales
    emb = eng.params["decoder"]["tok_embeddings"]
    assert emb.shape[-1] == cfg.decoder.dim // 2
    toks = transcribe_tokens(eng, make_audio(1.6, seed=43))
    assert len(toks) > 0


def test_quantized_forward_logits_close(engine, cfg, params):
    rng = np.random.default_rng(3)
    embeds = (rng.standard_normal((6, cfg.decoder.dim)) * 0.5).astype(np.float32)
    qparams = quantize_params(params)

    cache = engine.new_dec_cache()
    h_f, _ = dec_mod.decoder_forward(
        params["decoder"], cfg, jnp.asarray(embeds), cache, jnp.int32(0),
        engine.ada(),
    )
    lg_f = np.asarray(dec_mod.final_logits(params["decoder"], cfg, h_f))
    cache = engine.new_dec_cache()
    h_q, _ = dec_mod.decoder_forward(
        qparams["decoder"], cfg, jnp.asarray(embeds), cache, jnp.int32(0),
        engine.ada(),
    )
    lg_q = np.asarray(dec_mod.final_logits(qparams["decoder"], cfg, h_q))
    # relative error bounded by accumulated int8 rounding
    denom = np.maximum(np.abs(lg_f).max(), 1e-6)
    assert np.abs(lg_q - lg_f).max() / denom < 0.15
