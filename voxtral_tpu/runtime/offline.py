"""Offline (whole-clip) transcription through the bulk no-ring encoder.

The streaming state machine (runtime/stream.py) is exact and
chunking-invariant but pays incremental-mode costs the reference also pays
(voxtral_encoder.c:452-636); when the entire clip is in hand there is no
reason to ring-buffer anything.  This path mirrors the reference's batch
composition — pad the clip, run the batch encoder, prefill the prompt,
burst-decode every audio position, stop at EOS (vox_encoder_forward +
vox_decoder_* as a pipeline).

Transcripts match the streaming path up to near-tie argmax flips: the
banded kernel accumulates softmax in a different order than ring attention
(tests/test_offline.py pins the agreement)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    N_LEFT_PAD_TOKENS,
    RAW_AUDIO_LENGTH_PER_TOK,
    TOKEN_EOS,
    n_right_pad_tokens,
)
from ..native import make_mel_context
from ..tokenizer import TekkenTokenizer
from .engine import VoxtralEngine, decompose


def padded_clip_mel(engine: VoxtralEngine, samples: np.ndarray) -> np.ndarray:
    """Left-pad context + clip + alignment + right padding -> [Tm, 128] mel
    with Tm % 8 == 0 (the offline padding schedule, voxtral.c:1593-1597)."""
    ctx = make_mel_context(N_LEFT_PAD_TOKENS * RAW_AUDIO_LENGTH_PER_TOK)
    ctx.feed(np.asarray(samples, np.float32))
    align = (
        RAW_AUDIO_LENGTH_PER_TOK - (len(samples) % RAW_AUDIO_LENGTH_PER_TOK)
    ) % RAW_AUDIO_LENGTH_PER_TOK
    pad = align + n_right_pad_tokens(engine.delay_tokens) * RAW_AUDIO_LENGTH_PER_TOK
    ctx.feed(np.zeros(pad, np.float32))
    ctx.finish(0)
    mel = ctx.data()
    return mel[: (mel.shape[0] // 8) * 8]


def transcribe_offline_ids(
    engine: VoxtralEngine,
    samples: np.ndarray,
    dec_cache=None,
) -> list[int]:
    """Whole-clip greedy decode -> ALL generated token ids (callers
    classify).  Stops at EOS."""
    mel = padded_clip_mel(engine, samples)
    rows = engine.encode_clip_bulk(mel)            # [n, 3072] f32, on device
    n = rows.shape[0]
    L = engine.prompt_len
    assert n >= L, (n, L)
    if engine.dec_kv_ring < engine.cfg.decoder.window:
        assert n <= engine.dec_kv_ring, (
            f"clip needs {n} decode positions but the ring holds "
            f"{engine.dec_kv_ring}; size the engine with adaptive_dec_ring"
        )

    cache = dec_cache if dec_cache is not None else engine.new_dec_cache()
    prompt = engine.prompt_embeds(
        jax.lax.slice_in_dim(rows, 0, L - 1, axis=0)
    )
    cache = engine.prefill(prompt, cache, 0)
    out: list[int] = []
    prev = jnp.int32(32)
    pos = L - 1
    for b in decompose(n - pos, engine.buckets):
        chunk = jax.lax.slice_in_dim(rows, pos, pos + b, axis=0)
        toks, _, _, _, cache = engine.decode_burst(chunk, prev, cache, pos)
        toks = np.asarray(toks)
        for t in toks:
            t = int(t)
            if t == TOKEN_EOS:
                return out
            out.append(t)
        prev = jnp.int32(int(toks[-1]))
        pos += b
    return out


def transcribe_offline(engine: VoxtralEngine, samples: np.ndarray) -> str:
    """Whole-clip transcription text (text-class tokens joined)."""
    tok: Optional[TekkenTokenizer] = engine.tokenizer
    assert tok is not None, "engine has no tokenizer"
    ids = transcribe_offline_ids(engine, samples)
    return "".join(
        tok.decode(t) for t in ids
        if tok.classify(t) == TekkenTokenizer.TOK_TEXT
    ).strip()
