"""Independent PyTorch float32 oracle for numerics tests.

Implemented directly from the model spec (MODEL.md, and the behavior of
python_simple_implementation.py) as a straightforward full-sequence,
no-cache-tricks implementation: naive concat KV truncated to the window,
dense masks, torch.stft mel.  It deliberately shares no code with the JAX
engine so that chunked/ring/bucketed execution is checked against an
independent formulation.

Parameters are taken in the engine's pytree layout ([out, in] matrices —
torch Linear orientation — merged QKV / w13, stacked layers) and consumed
via F.linear here.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F

from voxtral_tpu.config import (
    DOWNSAMPLE_FACTOR,
    GLOBAL_LOG_MEL_MAX,
    HOP_LENGTH,
    TOKEN_BOS,
    TOKEN_EOS,
    TOKEN_STREAMING_PAD,
    WINDOW_SIZE,
    VoxtralConfig,
)
from voxtral_tpu.audio.mel import mel_filterbank


def t32(x) -> torch.Tensor:
    return torch.tensor(np.asarray(x, dtype=np.float32))


# ---------------------------------------------------------------------------
# Mel
# ---------------------------------------------------------------------------

def oracle_mel(samples: np.ndarray) -> np.ndarray:
    """torch.stft-based log-mel, [frames, 128]."""
    audio = t32(samples)
    window = torch.hann_window(WINDOW_SIZE)
    stft = torch.stft(
        audio, WINDOW_SIZE, HOP_LENGTH, window=window, return_complex=True,
        center=True, pad_mode="reflect",
    )
    mag = stft[..., :-1].abs() ** 2                      # [201, T]
    fb = t32(mel_filterbank())                           # [201, 128]
    mel = fb.T @ mag                                     # [128, T]
    log = torch.clamp(mel, min=1e-10).log10()
    log = torch.maximum(log, torch.tensor(GLOBAL_LOG_MEL_MAX) - 8.0)
    return ((log + 4.0) / 4.0).T.numpy()                 # [T, 128]


# ---------------------------------------------------------------------------
# Common blocks
# ---------------------------------------------------------------------------

def rms_norm(x, w, eps):
    rms = torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + eps)
    return x * rms * w


def rope_apply(x, positions, n_heads, head_dim, theta):
    """Interleaved RoPE. x: [T, n_heads*head_dim]."""
    t = x.shape[0]
    freqs = 1.0 / (theta ** (torch.arange(0, head_dim, 2).float() / head_dim))
    angles = positions.float().unsqueeze(-1) * freqs
    cos, sin = torch.cos(angles), torch.sin(angles)      # [T, hd/2]
    x = x.view(t, n_heads, head_dim)
    x1, x2 = x[..., ::2], x[..., 1::2]
    c, s = cos.unsqueeze(1), sin.unsqueeze(1)
    o1 = x1 * c - x2 * s
    o2 = x2 * c + x1 * s
    return torch.stack([o1, o2], dim=-1).flatten(-2).view(t, n_heads * head_dim)


def windowed_attention(q, k, v, n_heads, n_kv_heads, head_dim, window,
                       q_start, kv_start):
    sq, skv = q.shape[0], k.shape[0]
    g = n_heads // n_kv_heads
    q = q.view(sq, n_heads, head_dim).transpose(0, 1)
    k = k.view(skv, n_kv_heads, head_dim).transpose(0, 1)
    v = v.view(skv, n_kv_heads, head_dim).transpose(0, 1)
    if g > 1:
        k = k.repeat_interleave(g, dim=0)
        v = v.repeat_interleave(g, dim=0)
    qi = (q_start + torch.arange(sq)).unsqueeze(1)
    kj = (kv_start + torch.arange(skv)).unsqueeze(0)
    mask = (kj <= qi) & (kj >= qi - (window - 1))
    scores = (q @ k.transpose(1, 2)) / math.sqrt(head_dim)
    scores = scores.masked_fill(~mask.unsqueeze(0), float("-inf"))
    probs = scores.softmax(dim=-1)
    out = probs @ v                                       # [nh, sq, hd]
    return out.transpose(0, 1).reshape(sq, n_heads * head_dim)


# ---------------------------------------------------------------------------
# Conv stem
# ---------------------------------------------------------------------------

def oracle_conv_stem(enc_params, cfg: VoxtralConfig, mel: np.ndarray) -> np.ndarray:
    """mel [F, 128] -> [F // 2, 1280] using torch conv1d with causal padding.
    enc_params conv weights are im2col [K*C_in, C_out]; unpack them."""
    e = cfg.encoder
    k = e.conv_kernel

    def unpack(w_im2col, c_in, c_out):
        w = t32(w_im2col).view(k, c_in, c_out)            # [K, Cin, Cout]
        return w.permute(2, 1, 0)                         # conv1d [Cout, Cin, K]

    w0 = unpack(enc_params["conv0_w"], e.n_mel, e.dim)
    b0 = t32(enc_params["conv0_b"])
    w1 = unpack(enc_params["conv1_w"], e.dim, e.dim)
    b1 = t32(enc_params["conv1_b"])

    x = t32(mel).T.unsqueeze(0)                           # [1, 128, F]
    x = F.pad(x, (k - 1, 0))
    h = F.gelu(F.conv1d(x, w0, b0, stride=1))
    h = F.pad(h, (k - 2, 0))
    h = F.gelu(F.conv1d(h, w1, b1, stride=2))
    return h.squeeze(0).T.numpy()                         # [F//2, 1280]


# ---------------------------------------------------------------------------
# Encoder / adapter
# ---------------------------------------------------------------------------

def oracle_encoder(enc_params, cfg: VoxtralConfig, x: np.ndarray) -> np.ndarray:
    """Full-sequence encoder transformer on post-conv positions [S, dim]."""
    e = cfg.encoder
    h = t32(x)
    s = h.shape[0]
    positions = torch.arange(s)
    lp = enc_params["layers"]
    qkv_dim = e.qkv_dim
    for i in range(e.n_layers):
        xn = rms_norm(h, t32(lp["attn_norm"][i]), e.norm_eps)
        qkv = F.linear(xn, t32(lp["wqkv"][i]), t32(lp["bqkv"][i]))
        q, k, v = qkv[:, :qkv_dim], qkv[:, qkv_dim:2*qkv_dim], qkv[:, 2*qkv_dim:]
        q = rope_apply(q, positions, e.n_heads, e.head_dim, e.rope_theta)
        k = rope_apply(k, positions, e.n_kv_heads, e.head_dim, e.rope_theta)
        attn = windowed_attention(
            q, k, v, e.n_heads, e.n_kv_heads, e.head_dim, e.window, 0, 0
        )
        h = h + F.linear(attn, t32(lp["wo"][i]), t32(lp["bo"][i]))
        hn = rms_norm(h, t32(lp["ffn_norm"][i]), e.norm_eps)
        g13 = F.linear(hn, t32(lp["w13"][i]))
        gate = F.silu(g13[:, : e.hidden]) * g13[:, e.hidden :]
        h = h + F.linear(gate, t32(lp["w2"][i]), t32(lp["b2"][i]))
    return rms_norm(h, t32(enc_params["final_norm"]), e.norm_eps).numpy()


def oracle_adapter(adapter_params, cfg: VoxtralConfig, enc_out: np.ndarray):
    x = t32(enc_out)
    s = x.shape[0]
    ds = x.reshape(s // DOWNSAMPLE_FACTOR, DOWNSAMPLE_FACTOR * cfg.encoder.dim)
    h = F.gelu(F.linear(ds, t32(adapter_params["w0"])))
    return F.linear(h, t32(adapter_params["w1"])).numpy()


# ---------------------------------------------------------------------------
# Decoder (naive concat KV truncated to window)
# ---------------------------------------------------------------------------

class OracleDecoder:
    def __init__(self, dec_params, cfg: VoxtralConfig):
        self.p = dec_params
        self.cfg = cfg
        self.kv = {}
        d = cfg.decoder
        half = d.dim // 2
        inv = torch.exp(
            -math.log(d.ada_theta) * torch.arange(half).float() / half
        )
        emb = float(cfg.delay_tokens) * inv
        t_cond = torch.cat([emb.cos(), emb.sin()])
        lp = dec_params["layers"]
        self.ada = []
        for i in range(d.n_layers):
            hidden = F.gelu(F.linear(t_cond, t32(lp["ada_down"][i])))
            self.ada.append(F.linear(hidden, t32(lp["ada_up"][i])))

    def forward(self, embeds: torch.Tensor, pos: int) -> torch.Tensor:
        d = self.cfg.decoder
        lp = self.p["layers"]
        h = embeds
        seq = h.shape[0]
        positions = torch.arange(pos, pos + seq)
        for i in range(d.n_layers):
            xn = rms_norm(h, t32(lp["attn_norm"][i]), d.norm_eps)
            qkv = F.linear(xn, t32(lp["wqkv"][i]))
            q = qkv[:, : d.q_dim]
            k = qkv[:, d.q_dim : d.q_dim + d.kv_dim]
            v = qkv[:, d.q_dim + d.kv_dim :]
            q = rope_apply(q, positions, d.n_heads, d.head_dim, d.rope_theta)
            k = rope_apply(k, positions, d.n_kv_heads, d.head_dim, d.rope_theta)
            if i in self.kv:
                kc, vc = self.kv[i]
                kc = torch.cat([kc, k], dim=0)
                vc = torch.cat([vc, v], dim=0)
            else:
                kc, vc = k, v
            if kc.shape[0] > d.window:
                kc, vc = kc[-d.window :], vc[-d.window :]
            self.kv[i] = (kc, vc)
            kv_start = (pos + seq - 1) - (kc.shape[0] - 1)
            attn = windowed_attention(
                q, kc, vc, d.n_heads, d.n_kv_heads, d.head_dim, d.window,
                pos, kv_start,
            )
            h = h + F.linear(attn, t32(lp["wo"][i]))
            hn = rms_norm(h, t32(lp["ffn_norm"][i]), d.norm_eps)
            hn = hn * (1.0 + self.ada[i])
            g13 = F.linear(hn, t32(lp["w13"][i]))
            gate = F.silu(g13[:, : d.hidden]) * g13[:, d.hidden :]
            h = h + F.linear(gate, t32(lp["w2"][i]))
        return h

    def logits(self, h_last: torch.Tensor) -> torch.Tensor:
        d = self.cfg.decoder
        xn = rms_norm(h_last, t32(self.p["final_norm"]), d.norm_eps)
        return xn @ t32(self.p["tok_embeddings"]).T


def oracle_decode_greedy(dec_params, cfg: VoxtralConfig, adapter_out: np.ndarray):
    """The offline decode schedule (python_simple_implementation.py:790-850):
    prefill prompt_len-1, sample at prompt_len-1, then one step per adapter
    position.  Returns the raw generated token list (EOS included)."""
    dec = OracleDecoder(dec_params, cfg)
    emb = t32(dec_params["tok_embeddings"])
    a = t32(adapter_out)
    n_audio = a.shape[0]
    L = cfg.prompt_len
    prompt_ids = [TOKEN_BOS] + [TOKEN_STREAMING_PAD] * (L - 1)
    prefix = a[:L] + emb[torch.tensor(prompt_ids)]
    with torch.no_grad():
        if L > 1:
            dec.forward(prefix[:-1], 0)
        h = dec.forward(prefix[-1:], L - 1)
        token = int(dec.logits(h).argmax())
        generated = [token]
        for pos in range(L, n_audio):
            if token == TOKEN_EOS:
                break
            e = (a[pos] + emb[token]).unsqueeze(0)
            h = dec.forward(e, pos)
            token = int(dec.logits(h).argmax())
            generated.append(token)
    return generated
