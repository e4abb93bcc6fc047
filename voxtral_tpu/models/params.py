"""Parameter pytrees: random init (tests) and safetensors loading (real model).

Layout conventions (TPU-first, not a translation of the C structs):
  - Linear weights keep the checkpoint's [out_dim, in_dim] layout; matmuls
    contract the last axes (einsum "td,od->to").  The MXU is agnostic to the
    logical orientation (XLA assigns tiled layouts either way), and keeping
    the native layout means loading is memmap -> stack -> HBM with ZERO host
    transposes — the mmap-speed load discipline of the reference
    (voxtral_safetensors.c zero-copy bf16 views).
  - Per-layer weights are stacked on axis 0 -> lax.scan over layers.
  - QKV is merged into one [q+k+v, in] matrix (single MXU pass per token —
    the reference's packed-QKV optimization, SPEED.md:183-191, for free).
    Encoder biases exist only on q and v (voxtral_encoder.c:87-97); the
    merged bias holds zeros in the k segment.
  - w1/w3 are merged into [2*hidden, in] ([gate; up]).
  - Conv stem weights are im2col matrices [K*C_in, C_out].
  - Norm weights and biases stay float32 (f32 islands).

Reference tensor names: voxtral_encoder.c:50-117, voxtral_decoder.c:49-108,
voxtral.c:102-110, python_simple_implementation.py:355-513.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VoxtralConfig
from ..io.safetensors import SafetensorsFile

PyTree = Any

ENC_PREFIX = "mm_streams_embeddings.embedding_module.whisper_encoder"
MM_PREFIX = "mm_streams_embeddings.embedding_module"


# ---------------------------------------------------------------------------
# Random init (unit tests / benchmarks without the real checkpoint)
# ---------------------------------------------------------------------------

def _rand(key, shape, dtype, scale=None):
    # weights are [..., out, in]: fan-in is the last axis
    if scale is None:
        scale = 1.0 / np.sqrt(shape[-1])
    return (jax.random.normal(key, shape, dtype=jnp.float32) * scale).astype(dtype)


def init_encoder_params(cfg: VoxtralConfig, key) -> PyTree:
    e = cfg.encoder
    pd = cfg.pdtype
    ks = jax.random.split(key, 16)
    L = e.n_layers
    qkv = 3 * e.qkv_dim
    bqkv = np.zeros((L, qkv), np.float32)
    bqkv[:, : e.qkv_dim] = 0.01            # q bias
    bqkv[:, 2 * e.qkv_dim :] = -0.01       # v bias (k segment stays zero)
    return {
        "conv0_w": _rand(ks[0], (e.conv_kernel * e.n_mel, e.dim), pd),
        "conv0_b": jnp.zeros((e.dim,), jnp.float32),
        "conv1_w": _rand(ks[1], (e.conv_kernel * e.dim, e.dim), pd),
        "conv1_b": jnp.zeros((e.dim,), jnp.float32),
        "layers": {
            "attn_norm": jnp.ones((L, e.dim), jnp.float32),
            "wqkv": _rand(ks[2], (L, qkv, e.dim), pd),
            "bqkv": jnp.asarray(bqkv),
            "wo": _rand(ks[3], (L, e.dim, e.qkv_dim), pd),
            "bo": jnp.zeros((L, e.dim), jnp.float32),
            "ffn_norm": jnp.ones((L, e.dim), jnp.float32),
            "w13": _rand(ks[4], (L, 2 * e.hidden, e.dim), pd),
            "w2": _rand(ks[5], (L, e.dim, e.hidden), pd),
            "b2": jnp.zeros((L, e.dim), jnp.float32),
        },
        "final_norm": jnp.ones((e.dim,), jnp.float32),
    }


def init_adapter_params(cfg: VoxtralConfig, key) -> PyTree:
    e = cfg.encoder
    d = cfg.decoder
    k0, k1 = jax.random.split(key)
    return {
        "w0": _rand(k0, (cfg.adapter_hidden, 4 * e.dim), cfg.pdtype),
        "w1": _rand(k1, (d.dim, cfg.adapter_hidden), cfg.pdtype),
    }


def init_decoder_params(cfg: VoxtralConfig, key) -> PyTree:
    d = cfg.decoder
    pd = cfg.pdtype
    ks = jax.random.split(key, 8)
    L = d.n_layers
    return {
        "tok_embeddings": _rand(ks[0], (d.vocab_size, d.dim), pd, scale=0.02),
        "layers": {
            "attn_norm": jnp.ones((L, d.dim), jnp.float32),
            "wqkv": _rand(ks[1], (L, d.q_dim + 2 * d.kv_dim, d.dim), pd),
            "wo": _rand(ks[2], (L, d.dim, d.q_dim), pd),
            "ffn_norm": jnp.ones((L, d.dim), jnp.float32),
            "w13": _rand(ks[3], (L, 2 * d.hidden, d.dim), pd),
            "w2": _rand(ks[4], (L, d.dim, d.hidden), pd),
            "ada_down": _rand(ks[5], (L, d.ada_dim, d.dim), pd),
            "ada_up": _rand(ks[6], (L, d.dim, d.ada_dim), pd, scale=0.02),
        },
        "final_norm": jnp.ones((d.dim,), jnp.float32),
    }


def init_params(cfg: VoxtralConfig, seed: int = 0) -> PyTree:
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(seed), 3)
    return {
        "encoder": init_encoder_params(cfg, k0),
        "adapter": init_adapter_params(cfg, k1),
        "decoder": init_decoder_params(cfg, k2),
    }


# ---------------------------------------------------------------------------
# Safetensors loading
# ---------------------------------------------------------------------------

def _linear(sf: SafetensorsFile, name: str, dtype) -> np.ndarray:
    """torch Linear [out, in] — kept as-is (zero-copy mmap view for bf16)."""
    return sf.get(name).astype(dtype, copy=False)


def _conv_im2col(w: np.ndarray, dtype) -> np.ndarray:
    """torch Conv1d [C_out, C_in, K] -> [K*C_in, C_out] so a window flattened
    as (k-major, channel-minor) left-multiplies it."""
    c_out, c_in, k = w.shape
    return np.ascontiguousarray(
        w.transpose(2, 1, 0).reshape(k * c_in, c_out)
    ).astype(dtype, copy=False)


class _Stacker:
    """Fills preallocated [L, ...] host arrays straight from mmap views —
    one host copy per tensor (page-in + memcpy), then one device transfer."""

    def __init__(self, n_layers: int):
        self.n = n_layers
        self.bufs: dict[str, np.ndarray] = {}

    def put(self, name: str, i: int, *parts: np.ndarray, dtype=None):
        """Copy `parts` (concatenated on axis 0) into slot i of buffer `name`."""
        total0 = sum(p.shape[0] for p in parts)
        shape = (total0,) + parts[0].shape[1:]
        buf = self.bufs.get(name)
        if buf is None:
            buf = np.empty((self.n,) + shape, dtype=dtype or parts[0].dtype)
            self.bufs[name] = buf
        o = 0
        for part in parts:
            buf[i, o : o + part.shape[0]] = part
            o += part.shape[0]

    def device(self, name: str) -> jax.Array:
        arr = jnp.asarray(self.bufs.pop(name))
        return arr


def load_encoder_params(sf: SafetensorsFile, cfg: VoxtralConfig) -> PyTree:
    e = cfg.encoder
    pd = np.dtype(cfg.param_dtype)
    p = ENC_PREFIX
    st = _Stacker(e.n_layers)
    for i in range(e.n_layers):
        lp = f"{p}.transformer.layers.{i}"
        st.put(
            "wqkv", i,
            _linear(sf, f"{lp}.attention.wq.weight", pd),
            _linear(sf, f"{lp}.attention.wk.weight", pd),
            _linear(sf, f"{lp}.attention.wv.weight", pd),
        )
        bq = sf.get_f32(f"{lp}.attention.wq.bias")
        st.put("bqkv", i, bq, np.zeros_like(bq),
               sf.get_f32(f"{lp}.attention.wv.bias"))
        st.put("wo", i, _linear(sf, f"{lp}.attention.wo.weight", pd))
        st.put("bo", i, sf.get_f32(f"{lp}.attention.wo.bias"))
        st.put("attn_norm", i, sf.get_f32(f"{lp}.attention_norm.weight"))
        st.put("ffn_norm", i, sf.get_f32(f"{lp}.ffn_norm.weight"))
        st.put(
            "w13", i,
            _linear(sf, f"{lp}.feed_forward.w1.weight", pd),
            _linear(sf, f"{lp}.feed_forward.w3.weight", pd),
        )
        st.put("w2", i, _linear(sf, f"{lp}.feed_forward.w2.weight", pd))
        st.put("b2", i, sf.get_f32(f"{lp}.feed_forward.w2.bias"))
    return {
        "conv0_w": jnp.asarray(
            _conv_im2col(sf.get(f"{p}.conv_layers.0.conv.weight").astype(np.float32), pd)
        ),
        "conv0_b": jnp.asarray(sf.get_f32(f"{p}.conv_layers.0.conv.bias")),
        "conv1_w": jnp.asarray(
            _conv_im2col(sf.get(f"{p}.conv_layers.1.conv.weight").astype(np.float32), pd)
        ),
        "conv1_b": jnp.asarray(sf.get_f32(f"{p}.conv_layers.1.conv.bias")),
        "layers": {k: st.device(k) for k in list(st.bufs)},
        "final_norm": jnp.asarray(sf.get_f32(f"{p}.transformer.norm.weight")),
    }


def load_adapter_params(sf: SafetensorsFile, cfg: VoxtralConfig) -> PyTree:
    pd = np.dtype(cfg.param_dtype)
    return {
        "w0": jnp.asarray(_linear(sf, f"{MM_PREFIX}.audio_language_projection.0.weight", pd)),
        "w1": jnp.asarray(_linear(sf, f"{MM_PREFIX}.audio_language_projection.2.weight", pd)),
    }


def load_decoder_params(sf: SafetensorsFile, cfg: VoxtralConfig) -> PyTree:
    d = cfg.decoder
    pd = np.dtype(cfg.param_dtype)
    st = _Stacker(d.n_layers)
    for i in range(d.n_layers):
        lp = f"layers.{i}"
        st.put(
            "wqkv", i,
            _linear(sf, f"{lp}.attention.wq.weight", pd),
            _linear(sf, f"{lp}.attention.wk.weight", pd),
            _linear(sf, f"{lp}.attention.wv.weight", pd),
        )
        st.put("wo", i, _linear(sf, f"{lp}.attention.wo.weight", pd))
        st.put("attn_norm", i, sf.get_f32(f"{lp}.attention_norm.weight"))
        st.put("ffn_norm", i, sf.get_f32(f"{lp}.ffn_norm.weight"))
        st.put(
            "w13", i,
            _linear(sf, f"{lp}.feed_forward.w1.weight", pd),
            _linear(sf, f"{lp}.feed_forward.w3.weight", pd),
        )
        st.put("w2", i, _linear(sf, f"{lp}.feed_forward.w2.weight", pd))
        st.put("ada_down", i, _linear(sf, f"{lp}.ada_rms_norm_t_cond.0.weight", pd))
        st.put("ada_up", i, _linear(sf, f"{lp}.ada_rms_norm_t_cond.2.weight", pd))
    return {
        "tok_embeddings": jnp.asarray(
            sf.get(f"{MM_PREFIX}.tok_embeddings.weight").astype(pd, copy=False)
        ),
        "layers": {k: st.device(k) for k in list(st.bufs)},
        "final_norm": jnp.asarray(sf.get_f32("norm.weight")),
    }


def load_params(model_dir: str, cfg: VoxtralConfig, verbose: bool = False) -> PyTree:
    """Stream consolidated.safetensors bf16 straight to HBM (per stacked
    tensor; host peak stays ~2 GB, file pages are evicted by the OS)."""
    import os
    import sys
    import time

    t0 = time.monotonic()

    def log(msg):
        if verbose:
            print(f"  load: {msg} (+{time.monotonic() - t0:.1f}s)",
                  file=sys.stderr)

    sf = SafetensorsFile(os.path.join(model_dir, "consolidated.safetensors"))
    log("header parsed")
    enc = load_encoder_params(sf, cfg)
    jax.block_until_ready(enc)
    log("encoder in HBM")
    ada = load_adapter_params(sf, cfg)
    dec = load_decoder_params(sf, cfg)
    jax.block_until_ready(dec)
    log("decoder in HBM")
    return {"encoder": enc, "adapter": ada, "decoder": dec}


def encoder_param_source(cfg: VoxtralConfig, model_dir: str = "",
                         seed: int = 0):
    """The engine's `param_source` hook (phase-lifetime weight paging,
    engine.offload_encoder): a closure re-materializing ONLY the
    encoder+adapter weights — re-read from the checkpoint when `model_dir`
    holds one, else re-init mirroring `init_params(cfg, seed)`'s key split so
    the restored random weights are bit-identical to the originals.  One
    source of truth for both the initial load's checkpoint detection and
    every later restore (they must agree, or pass-2+ transcripts silently
    diverge from pass 1)."""
    import os

    ckpt = os.path.join(model_dir, "consolidated.safetensors")
    use_checkpoint = bool(model_dir) and os.path.exists(ckpt)

    def source():
        if use_checkpoint:
            sf = SafetensorsFile(ckpt)
            return {"encoder": load_encoder_params(sf, cfg),
                    "adapter": load_adapter_params(sf, cfg)}
        k0, k1, _ = jax.random.split(jax.random.PRNGKey(seed), 3)
        return {"encoder": init_encoder_params(cfg, k0),
                "adapter": init_adapter_params(cfg, k1)}

    source.use_checkpoint = use_checkpoint
    return source
