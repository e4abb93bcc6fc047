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


def test_restore_without_source_clear_error(cfg, params, tiny_tokenizer):
    """An engine whose encoder weights vanished without a param_source hook
    must fail with a clear RuntimeError, not 'NoneType is not callable'."""
    eng = _fresh_engine(cfg, params, tiny_tokenizer, None)
    eng.params.pop("encoder")
    with pytest.raises(RuntimeError, match="param_source"):
        eng.restore_encoder()
    with pytest.raises(RuntimeError, match="param_source"):
        eng._encp()


def test_shared_param_source_matches_init(cfg):
    """encoder_param_source (no checkpoint) re-derives weights bit-identical
    to init_params(seed)'s encoder/adapter entries."""
    from voxtral_tpu.models.params import encoder_param_source, init_params

    src = encoder_param_source(cfg, "", seed=0)
    assert not src.use_checkpoint
    fresh = src()
    ref = init_params(cfg, seed=0)
    np.testing.assert_array_equal(
        np.asarray(fresh["encoder"]["layers"]["wqkv"]),
        np.asarray(ref["encoder"]["layers"]["wqkv"]),
    )
    np.testing.assert_array_equal(
        np.asarray(fresh["adapter"]["w0"]), np.asarray(ref["adapter"]["w0"])
    )


def test_pool_tick_on_offloaded_engine(cfg, params, tiny_tokenizer):
    """A StreamPool ticked while the engine is offloaded must auto-restore
    the encoder weights (ADVICE r3 medium), in both encoder modes, and
    produce the same transcript as a never-offloaded pool."""
    from voxtral_tpu.models.params import encoder_param_source
    from voxtral_tpu.parallel.scheduler import StreamPool

    src = encoder_param_source(cfg, "", seed=0)
    audio = make_audio(2.4, seed=5)

    def run_pool(enc_mode, offload):
        eng = _fresh_engine(cfg, params, tiny_tokenizer, src)
        if offload:
            eng.offload_encoder()
        pool = StreamPool(eng, 2, dec_kv_ring=64, enc_mode=enc_mode)
        i = pool.add_stream()
        pool.set_processing_interval(i, 0.25)
        step = 8000
        for off in range(0, len(audio), step):
            pool.feed(i, audio[off : off + step])
            pool.tick()
        pool.finish(i)
        return pool.get(i)

    for enc_mode in ("ring", "window"):
        assert run_pool(enc_mode, True) == run_pool(enc_mode, False)


def test_batched_transcriber_on_offloaded_engine(cfg, params, tiny_tokenizer):
    """BatchedTranscriber.feed_mel on an offloaded engine self-heals too."""
    from voxtral_tpu.parallel.serving import BatchedTranscriber
    from voxtral_tpu.models.params import encoder_param_source

    src = encoder_param_source(cfg, "", seed=0)

    def run(offload):
        eng = _fresh_engine(cfg, params, tiny_tokenizer, src)
        if offload:
            eng.offload_encoder()
        tr = BatchedTranscriber(eng, 2)
        rng = np.random.default_rng(0)
        mel = (rng.standard_normal((2, 320, cfg.encoder.n_mel)) * 0.3
               ).astype(np.float32)
        tr.transcribe(mel, interval_frames=160)
        return tr.tokens

    assert run(True) == run(False)
