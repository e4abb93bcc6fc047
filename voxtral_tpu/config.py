"""Model/audio configuration for the Voxtral Realtime 4B TPU engine.

These constants form the *contract* with the reference implementation
(/root/reference/voxtral.h:19-50, python_simple_implementation.py:31-78,
MODEL.md:24-108).  Everything else in this package is free to be TPU-native,
but these numbers must not drift or transcripts diverge.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Audio constants (voxtral.h:19-27)
# ---------------------------------------------------------------------------
SAMPLE_RATE = 16_000
NUM_MEL_BINS = 128
HOP_LENGTH = 160
WINDOW_SIZE = 400          # STFT window == n_fft
N_FFT = 400
N_FREQ = N_FFT // 2 + 1    # 201 rfft bins
FRAME_RATE = 12.5          # decoder tokens per second of audio
GLOBAL_LOG_MEL_MAX = 1.5
RAW_AUDIO_LENGTH_PER_TOK = int(SAMPLE_RATE // FRAME_RATE)   # 1280 samples / token
AUDIO_LENGTH_PER_TOK = RAW_AUDIO_LENGTH_PER_TOK // HOP_LENGTH  # 8 mel frames / token
DOWNSAMPLE_FACTOR = 4      # encoder positions per decoder token (post conv /2)

# ---------------------------------------------------------------------------
# Special tokens (voxtral.c:362-365, python_simple_implementation.py:74-78)
# ---------------------------------------------------------------------------
TOKEN_BOS = 1
TOKEN_EOS = 2
TOKEN_STREAMING_PAD = 32
TOKEN_TEXT_MIN = 1000      # first non-special token id

# ---------------------------------------------------------------------------
# Streaming schedule constants (voxtral.c:360-386, python:69-99)
# ---------------------------------------------------------------------------
N_LEFT_PAD_TOKENS = 32
# attn_impl="auto": ring capacities strictly above this use the Pallas
# flash-decode kernel for single-token steps (see DecoderConfig.attn_impl)
FLASH_RING_THRESHOLD = 1024
DEFAULT_DELAY_TOKENS = 6           # 480 ms
OFFLINE_STREAMING_BUFFER_TOKENS = 10
STREAM_FIRST_CHUNK_MIN_MEL = 312   # enough mel for the 39 prompt adapter tokens
STREAM_DEFAULT_INTERVAL_S = 2.0
STREAM_MAX_DECODE_KV = 2000
STREAM_MAX_NON_TEXT_STREAK = 64
STREAM_MAX_NO_DECODE_SAMPLES = SAMPLE_RATE * 20
STREAM_EMPTY_RESTARTS_FOR_FULL_RESET = 2
MAX_ALT = 4


def n_right_pad_tokens(delay_tokens: int) -> int:
    """(delay+1)+10 tokens of right padding (voxtral.c:1593-1597, python:99)."""
    return (delay_tokens + 1) + OFFLINE_STREAMING_BUFFER_TOKENS


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """Causal Whisper-style audio encoder (voxtral.h:29-38, MODEL.md:44-66)."""
    dim: int = 1280
    n_layers: int = 32
    n_heads: int = 32
    head_dim: int = 64
    hidden: int = 5120
    n_kv_heads: int = 32           # MHA
    window: int = 750              # causal sliding window
    norm_eps: float = 1e-5
    rope_theta: float = 1_000_000.0
    n_mel: int = NUM_MEL_BINS
    conv_kernel: int = 3
    # KV ring capacity: must cover window + largest encode bucket. 2048 covers
    # 750 + 512 with headroom; ring semantics replace the memmove compaction of
    # the reference (voxtral_encoder.c:388-406).
    kv_ring: int = 2048
    # Bulk (T>1) attention implementation: "xla"/"auto" = ring_attention,
    # "flash" = the Pallas online-softmax kernel (ops/flash_encode.py) —
    # measured SLOWER at the full-size encoder shape, kept as an explicit
    # option (the kernel's STATUS note and docs/PERF.md have the numbers).
    attn_impl: str = "auto"

    @property
    def qkv_dim(self) -> int:
        return self.n_heads * self.head_dim


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """Ministral-3 3.4B decoder (voxtral.h:40-50, MODEL.md:76-89)."""
    dim: int = 3072
    n_layers: int = 26
    n_heads: int = 32
    head_dim: int = 128
    hidden: int = 9216
    n_kv_heads: int = 8            # GQA 32q/8kv
    window: int = 8192             # causal sliding window
    norm_eps: float = 1e-5
    rope_theta: float = 1_000_000.0
    vocab_size: int = 131072
    ada_dim: int = 32              # ada_rms_norm_t_cond bottleneck
    ada_theta: float = 10_000.0    # TimeEmbedding theta
    # KV ring capacity.  cap == window makes the modular-index sliding window
    # exact for single-token decode; smaller caps are valid whenever the
    # stream restarts before kv_len exceeds them (live mode restarts at
    # STREAM_MAX_DECODE_KV=2000, so 2048 suffices for serving).
    kv_ring: int = 8192
    # Single-token decode attention:
    #   "xla":   full-ring masked attention (reads the whole ring + masks).
    #   "flash": Pallas flash-decode kernel — streams only the live-window
    #            ring blocks from HBM (ops/flash_decode.py).
    #   "auto":  flash when the ring is larger than the live window can
    #            fill cheaply (cap > FLASH_RING_THRESHOLD), else xla.
    #            Measured crossover on v5e (docs/PERF.md): at cap 1024 XLA
    #            wins (12.66 vs 13.39 ms B=16); at cap >= 2048 the ring is
    #            mostly dead slots and flash's skipped reads win.
    attn_impl: str = "auto"
    # Flash-decode ring block size (slots per DMA'd KV block).  None = the
    # kernel's auto rule (ops/flash_decode.py).  Measured at B=56 x cap 896
    # pos 806: block 448 reads the same bytes in 1/3 the walk steps and is
    # ~9% faster than the auto-picked 128 (docs/PERF.md round 4) — but a
    # bigger block reads MORE dead slots at early fill, so the default
    # stays data-driven per the end-to-end step A/B, not this probe alone.
    flash_block: Optional[int] = None
    # lax.scan unroll factor for the 26-layer stack (1 = no unrolling).
    # >1 trades compile time for less per-iteration scan overhead; A/B with
    # MB_UNROLL in tools/microbench.py before changing the default.
    scan_unroll: int = 1

    @property
    def q_dim(self) -> int:
        return self.n_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.n_kv_heads * self.head_dim


@dataclasses.dataclass(frozen=True)
class VoxtralConfig:
    encoder: EncoderConfig = dataclasses.field(default_factory=EncoderConfig)
    decoder: DecoderConfig = dataclasses.field(default_factory=DecoderConfig)
    adapter_hidden: int = 3072     # audio_language_projection.0 output
    delay_tokens: int = DEFAULT_DELAY_TOKENS
    # dtype policy: big matmuls in `compute_dtype`; norms / RoPE / softmax /
    # logits stay float32 (f32 islands, mirroring python ref :539-558,661-663).
    param_dtype: str = "bfloat16"
    compute_dtype: str = "bfloat16"
    kv_dtype: str = "bfloat16"
    # Encoder KV ring storage dtype; None = follow kv_dtype.  Set explicitly
    # (e.g. "bfloat16") when the decoder rings drop to fp8 in a serving mode
    # but the encoder must stay exact (bench.py BENCH_MODE=int4).
    enc_kv_dtype: Optional[str] = None

    @property
    def prompt_len(self) -> int:
        """[BOS] + [STREAMING_PAD]*(32+delay) (voxtral.c:972, python:739)."""
        return 1 + N_LEFT_PAD_TOKENS + self.delay_tokens

    @property
    def cdtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def pdtype(self):
        return jnp.dtype(self.param_dtype)

    @property
    def kvdtype(self):
        return jnp.dtype(self.kv_dtype)

    @property
    def enc_kvdtype(self):
        return jnp.dtype(self.enc_kv_dtype or self.kv_dtype)

    def replace(self, **kw) -> "VoxtralConfig":
        return dataclasses.replace(self, **kw)


def full_config(**kw) -> VoxtralConfig:
    """The real Voxtral-Mini-4B-Realtime config."""
    return VoxtralConfig(**kw)


def tiny_config(
    *,
    compute_dtype: str = "float32",
    dec_kv_ring: int = 64,
    enc_kv_ring: int = 64,
    dec_window: int = 48,
    enc_window: int = 24,
    vocab_size: int = 1256,
) -> VoxtralConfig:
    """A miniature config for unit tests (runs on CPU, matches oracle in f32)."""
    enc = EncoderConfig(
        dim=16, n_layers=2, n_heads=4, head_dim=4, hidden=32, n_kv_heads=4,
        window=enc_window, kv_ring=enc_kv_ring,
    )
    dec = DecoderConfig(
        dim=24, n_layers=2, n_heads=4, head_dim=6, hidden=48, n_kv_heads=2,
        window=dec_window, vocab_size=vocab_size, ada_dim=8,
        kv_ring=dec_kv_ring,
    )
    return VoxtralConfig(
        encoder=enc, decoder=dec, adapter_hidden=24,
        param_dtype=compute_dtype, compute_dtype=compute_dtype,
        kv_dtype=compute_dtype,
    )


def mid_config(
    *,
    compute_dtype: str = "float32",
    dec_kv_ring: int = 64,
    enc_kv_ring: int = 64,
    vocab_size: int = 1256,
) -> VoxtralConfig:
    """REAL head/layer geometry at reduced widths, for multi-chip dry runs.

    The tiny test config has 2 decoder KV heads and 2 layers, so a tp=2 mesh
    run on it proves little about the flagship's sharding.  This config keeps
    everything a NamedSharding divides or a scan iterates at the flagship's
    true counts — decoder 26 layers x 32 q heads / 8 KV heads (GQA),
    encoder 32 layers x 32 MHA heads — and shrinks only head_dim / hidden /
    vocab, so tp in {2, 4, 8} exercises the exact partition lattice of the
    real model on the virtual CPU mesh (VERDICT r3 weak #5)."""
    enc = EncoderConfig(
        dim=128, n_layers=32, n_heads=32, head_dim=4, hidden=256,
        n_kv_heads=32, window=24, kv_ring=enc_kv_ring,
    )
    dec = DecoderConfig(
        dim=128, n_layers=26, n_heads=32, head_dim=8, hidden=256,
        n_kv_heads=8, window=48, vocab_size=vocab_size, ada_dim=8,
        kv_ring=dec_kv_ring,
    )
    return VoxtralConfig(
        encoder=enc, decoder=dec, adapter_hidden=64,
        param_dtype=compute_dtype, compute_dtype=compute_dtype,
        kv_dtype=compute_dtype,
    )


def num_audio_tokens(audio_len: int) -> int:
    """Token count for a raw audio length (python_simple_implementation.py:91-96)."""
    if audio_len % HOP_LENGTH != 0:
        audio_len = math.ceil(audio_len / HOP_LENGTH - 1)
    else:
        audio_len = audio_len // HOP_LENGTH
    return math.ceil(audio_len / AUDIO_LENGTH_PER_TOK)


def delay_tokens_from_ms(delay_ms: int) -> int:
    """vox_set_delay clamping (voxtral.c:1629-1635)."""
    delay_ms = min(max(delay_ms, 80), 2400)
    return delay_ms // 80
