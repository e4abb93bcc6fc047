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


@pytest.mark.parametrize("dtype_name", ["float32", "bfloat16",
                                         "float8_e4m3fn"])
def test_ring_chunk_write_batched_matches_single(dtype_name):
    """The batched one-hot-matmul blend (custom_vmap path of
    ring_chunk_write) must equal the per-stream rotate ring_write exactly
    for every dtype/wrap/alignment case (T < cap takes the blend path)."""
    import jax
    import jax.numpy as jnp

    from voxtral_tpu.ops.ring import _win, ring_chunk_write

    dtype = jnp.dtype(dtype_name)
    win = _win(dtype)    # merged-row alignment
    b, n_layers, kh, d = 6, 3, 4, 64   # d=64: the kernel's encoder shape
    cap = 8 * win        # cap/2 is a multiple of win
    t = 2 * win - 3      # odd T, spans multiple windows, both parities
    rng = np.random.default_rng(11)

    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.float32).astype(
            dtype)

    k_all = arr(b, n_layers, kh, cap, d)
    v_all = arr(b, n_layers, kh, cap, d)
    k_c = arr(b, t, kh, d)
    v_c = arr(b, t, kh, d)
    # aligned start, unaligned, window-crossing, full-ring wrap cases
    pos = jnp.asarray(
        [0, 5, win - 1, cap - t + 1, cap - 1, 3 * cap + 7], jnp.int32)
    li = jnp.int32(2)

    ref_k, ref_v = [], []
    for s in range(b):
        ks, vs, _, _ = ring_chunk_write(
            k_all[s], v_all[s], k_c[s], v_c[s], li, pos[s])
        ref_k.append(np.asarray(ks.astype(jnp.float32)))
        ref_v.append(np.asarray(vs.astype(jnp.float32)))

    got_k, got_v, got_kr, got_vr = jax.vmap(
        ring_chunk_write, in_axes=(0, 0, 0, 0, None, 0)
    )(k_all, v_all, k_c, v_c, li, pos)
    np.testing.assert_array_equal(
        np.asarray(got_k.astype(jnp.float32)), np.stack(ref_k))
    np.testing.assert_array_equal(
        np.asarray(got_v.astype(jnp.float32)), np.stack(ref_v))
    # the returned rings are the updated layer slice
    np.testing.assert_array_equal(
        np.asarray(got_kr.astype(jnp.float32)), np.stack(ref_k)[:, 2])
    np.testing.assert_array_equal(
        np.asarray(got_vr.astype(jnp.float32)), np.stack(ref_v)[:, 2])


@pytest.mark.parametrize("t", [5, 29])
def test_ring_chunk_write_tiny_cap_and_overflow(t):
    """Tiny caps take the blend path (t=5 < cap); t > cap routes through the
    vmapped-rotate fallback (whole-ring rewrite).  Both must match the
    unbatched path exactly."""
    import jax
    import jax.numpy as jnp

    from voxtral_tpu.ops.ring import ring_chunk_write

    b, n_layers, kh, cap, d = 3, 2, 2, 12, 8
    rng = np.random.default_rng(13)
    k_all = jnp.asarray(rng.standard_normal((b, n_layers, kh, cap, d)),
                        jnp.float32)
    v_all = jnp.asarray(rng.standard_normal((b, n_layers, kh, cap, d)),
                        jnp.float32)
    k_c = jnp.asarray(rng.standard_normal((b, t, kh, d)), jnp.float32)
    v_c = jnp.asarray(rng.standard_normal((b, t, kh, d)), jnp.float32)
    pos = jnp.asarray([0, 9, 23], jnp.int32)
    li = jnp.int32(0)

    ref = [ring_chunk_write(k_all[s], v_all[s], k_c[s], v_c[s], li, pos[s])
           for s in range(b)]
    got = jax.vmap(ring_chunk_write, in_axes=(0, 0, 0, 0, None, 0))(
        k_all, v_all, k_c, v_c, li, pos)
    for j in range(4):
        np.testing.assert_array_equal(
            np.asarray(got[j]), np.stack([np.asarray(r[j]) for r in ref]))


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
