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
