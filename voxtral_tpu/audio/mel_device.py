"""Device-side (jittable) log-mel spectrogram: STFT-as-GEMM on the MXU.

The streaming engine computes mel on host (audio/mel.py, native C++ variant
in csrc/) because per-chunk frame counts are tiny; this module is the batch
path — whole padded clips, optionally batched over streams — with windowing,
the 201-bin DFT as two GEMMs, the Slaney filterbank matmul, and the log/clamp
epilogue in one jitted program (the "fused mel frontend" of SURVEY.md §7,
replacing the reference's hand-rolled direct DFT, voxtral_audio.c:339-374).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import GLOBAL_LOG_MEL_MAX, HOP_LENGTH, N_FFT
from .mel import _MelTables

_REFLECT_PAD = N_FFT // 2


def _tables():
    t = _MelTables.get()
    return (
        jnp.asarray(t.window),
        jnp.asarray(t.dft_cos),
        jnp.asarray(t.dft_sin),
        jnp.asarray(t.filters),
    )


@partial(jax.jit, static_argnames=("n_frames",))
def _mel_from_padded(padded: jax.Array, n_frames: int) -> jax.Array:
    """padded: [..., n] already reflect-padded; returns [..., n_frames, 128]."""
    window, dft_cos, dft_sin, filters = _tables()
    idx = (
        jnp.arange(n_frames, dtype=jnp.int32)[:, None] * HOP_LENGTH
        + jnp.arange(N_FFT, dtype=jnp.int32)[None, :]
    )
    frames = jnp.take(padded, idx, axis=-1)          # [..., T, 400]
    w = frames * window
    re = jnp.einsum("...tn,nk->...tk", w, dft_cos,
                    preferred_element_type=jnp.float32)
    im = jnp.einsum("...tn,nk->...tk", w, dft_sin,
                    preferred_element_type=jnp.float32)
    power = re * re + im * im
    mel = jnp.einsum("...tk,km->...tm", power, filters,
                     preferred_element_type=jnp.float32)
    log = jnp.log10(jnp.maximum(mel, 1e-10))
    log = jnp.maximum(log, GLOBAL_LOG_MEL_MAX - 8.0)
    return (log + 4.0) / 4.0


def mel_spectrogram_device(samples: jax.Array) -> jax.Array:
    """samples: [..., n] float32 -> [..., frames, 128] with center=True
    reflect padding and the drop-last-frame convention (exact recipe of
    audio/mel.py)."""
    n = samples.shape[-1]
    pad_widths = [(0, 0)] * (samples.ndim - 1) + [(_REFLECT_PAD, _REFLECT_PAD)]
    padded = jnp.pad(samples, pad_widths, mode="reflect")
    n_frames = (padded.shape[-1] - N_FFT) // HOP_LENGTH + 1 - 1
    if n_frames <= 0:
        return jnp.zeros(samples.shape[:-1] + (0, 128), jnp.float32)
    return _mel_from_padded(padded, n_frames)
