"""Phase-lifetime weight paging (engine.offload_encoder/restore_encoder).

The batch pipeline drops the encoder+adapter weights from HBM during the
decode phase (they are never read there) and re-materializes them via the
engine's `param_source` hook before the next encode phase.  Paging must be
(a) transparent — transcripts identical across an offload/restore cycle,
(b) self-healing — encode paths auto-restore if called while offloaded,
(c) refused without a restore hook.
"""

import numpy as np
import pytest

from conftest import make_audio
from voxtral_tpu.runtime.stream import VoxStream


def _fresh_engine(cfg, params, tiny_tokenizer, source):
    from voxtral_tpu.runtime.engine import VoxtralEngine

    # shallow-copy the params dict: offload pops keys, and the session-scoped
    # `params` fixture is shared with every other test
    return VoxtralEngine(
        cfg, dict(params), tokenizer=tiny_tokenizer, buckets=(16, 4, 1),
        enc_kv_ring=64, dec_kv_ring=64, param_source=source,
    )


def _transcribe(engine, audio):
    s = VoxStream(engine)
    s.feed(audio)
    s.finish()
    s.get()
    return list(s.generated_ids)


def test_offload_restore_transcript_identical(cfg, params, tiny_tokenizer):
    from voxtral_tpu.models.params import (
        init_adapter_params,
        init_encoder_params,
    )
    import jax

    def source():
        k0, k1, _ = jax.random.split(jax.random.PRNGKey(0), 3)
        return {"encoder": init_encoder_params(cfg, k0),
                "adapter": init_adapter_params(cfg, k1)}

    eng = _fresh_engine(cfg, params, tiny_tokenizer, source)
    audio = make_audio(1.2, seed=3)
    before = _transcribe(eng, audio)

    eng.offload_encoder()
    assert "encoder" not in eng.params and "adapter" not in eng.params
    # decoder-side state is untouched while offloaded
    assert "decoder" in eng.params

    eng.restore_encoder()
    assert "encoder" in eng.params and "adapter" in eng.params
    after = _transcribe(eng, audio)
    assert before == after

    # restored weights are bit-identical to init_params(seed=0)'s
    np.testing.assert_array_equal(
        np.asarray(eng.params["encoder"]["layers"]["wqkv"]),
        np.asarray(params["encoder"]["layers"]["wqkv"]),
    )


def test_encode_auto_restores_while_offloaded(cfg, params, tiny_tokenizer):
    from voxtral_tpu.models.params import (
        init_adapter_params,
        init_encoder_params,
    )
    import jax

    def source():
        k0, k1, _ = jax.random.split(jax.random.PRNGKey(0), 3)
        return {"encoder": init_encoder_params(cfg, k0),
                "adapter": init_adapter_params(cfg, k1)}

    eng = _fresh_engine(cfg, params, tiny_tokenizer, source)
    audio = make_audio(1.2, seed=3)
    before = _transcribe(eng, audio)
    eng.offload_encoder()
    # no explicit restore: the encode path lazily re-materializes
    after = _transcribe(eng, audio)
    assert before == after


def test_offload_without_source_refused(cfg, params, tiny_tokenizer):
    eng = _fresh_engine(cfg, params, tiny_tokenizer, None)
    with pytest.raises(RuntimeError, match="param_source"):
        eng.offload_encoder()
    assert "encoder" in eng.params  # nothing was dropped
