"""BatchedTranscriber (lockstep serving) must reproduce single-stream
transcripts for every stream in the batch."""

import numpy as np
import pytest

from conftest import make_audio
from voxtral_tpu.parallel.serving import BatchedTranscriber
from voxtral_tpu.runtime.stream import VoxStream
from voxtral_tpu.audio.mel import MelContext
from voxtral_tpu.config import (
    N_LEFT_PAD_TOKENS,
    RAW_AUDIO_LENGTH_PER_TOK,
    n_right_pad_tokens,
)


def _padded_mel(engine, audio):
    ctx = MelContext(N_LEFT_PAD_TOKENS * RAW_AUDIO_LENGTH_PER_TOK)
    ctx.feed(audio)
    align = (
        RAW_AUDIO_LENGTH_PER_TOK - (len(audio) % RAW_AUDIO_LENGTH_PER_TOK)
    ) % RAW_AUDIO_LENGTH_PER_TOK
    pad = align + n_right_pad_tokens(engine.delay_tokens) * RAW_AUDIO_LENGTH_PER_TOK
    ctx.feed(np.zeros(pad, np.float32))
    ctx.finish(0)
    return ctx.data()


def test_ring_rows_write_batched_matches_loop(cfg):
    """The Pallas batched KV row write (custom_vmap path of ring_rows_write,
    interpret mode on CPU) must equal per-stream dynamic_update_slice."""
    import jax
    import jax.numpy as jnp

    from voxtral_tpu.ops.ring import ring_rows_write

    b, n_layers, kh, cap, d = 5, 3, 2, 16, 8
    rng = np.random.default_rng(9)
    k_all = jnp.asarray(rng.standard_normal((b, n_layers, kh, cap, d)),
                        jnp.float32)
    v_all = jnp.asarray(rng.standard_normal((b, n_layers, kh, cap, d)),
                        jnp.float32)
    k_row = jnp.asarray(rng.standard_normal((b, kh, d)), jnp.float32)
    v_row = jnp.asarray(rng.standard_normal((b, kh, d)), jnp.float32)
    pos = jnp.asarray([0, 3, 15, 17, 31], jnp.int32)  # incl. ring wraps
    li = jnp.int32(1)

    # reference: per-stream single-stream path
    ref_k, ref_v = [], []
    for s in range(b):
        ks, vs = ring_rows_write(
            k_all[s], v_all[s], k_row[s], v_row[s], li, pos[s]
        )
        ref_k.append(np.asarray(ks))
        ref_v.append(np.asarray(vs))

    got_k, got_v = jax.vmap(ring_rows_write, in_axes=(0, 0, 0, 0, None, 0))(
        k_all, v_all, k_row, v_row, li, pos
    )
    np.testing.assert_array_equal(np.asarray(got_k), np.stack(ref_k))
    np.testing.assert_array_equal(np.asarray(got_v), np.stack(ref_v))


@pytest.mark.slow
def test_batched_matches_single(engine):
    audios = [make_audio(2.0, seed=s) for s in (61, 62, 63)]
    mels = [_padded_mel(engine, a) for a in audios]
    n = min(m.shape[0] for m in mels)
    batch_mel = np.stack([m[:n] for m in mels])

    tr = BatchedTranscriber(engine, batch=3, dec_kv_ring=64)
    tok_lists = tr.transcribe(batch_mel, interval_frames=48)

    def single(audio):
        s = VoxStream(engine)
        s.set_processing_interval(0.1)
        s.feed(audio)
        s.finish()
        return s.get()

    tok = engine.tokenizer
    for i, audio in enumerate(audios):
        ref = single(audio)
        got = [tok.decode(t) for t in tok_lists[i]
               if tok.classify(t) == tok.TOK_TEXT]
        m = min(len(got), len(ref))
        assert m > 0
        assert got[:m] == ref[:m], f"stream {i}"
