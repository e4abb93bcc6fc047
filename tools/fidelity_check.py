#!/usr/bin/env python
"""Full-size fidelity differential: engine (TPU bf16, real loader) vs the
independent torch f32 oracle, token-for-token on >= 50 decoded steps.

The tiny-config oracle tests (tests/) validate the math; this validates the
FULL-SIZE wiring — checkpoint name->tree mapping, merged-QKV/w13 offsets at
real dimensions, 131072-vocab logits, ring behavior at the 4B config — the
runtest.sh/README.md:42-51 discipline of the reference applied to this
environment's synthetic checkpoint (/root/ckpt-fake by default).

The oracle tree is built here with its OWN safetensors->tree mapping
(independent of models/params.py), so loader mapping bugs are caught, not
mirrored.  Comparison is teacher-forced on the engine's greedy tokens:
sequential greedy decode would diverge permanently at one bf16-vs-f32
argmax tie flip, so instead the oracle replays the engine's schedule and we
require per-step argmax agreement, tolerating only near-ties (oracle's own
top-2 logit gap below a relative epsilon).  A wiring bug produces ~0%
agreement; numerics ties produce a handful of flagged flips.

Usage: python tools/fidelity_check.py [model_dir] [seconds]
Exit 0 = PASS.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))  # the torch oracle lives there

MIN_STEPS = 50
MIN_EXACT_AGREE = 0.90     # ties may flip a few argmaxes between bf16/f32
TIE_REL_EPS = 0.02         # a disagreement must be a near-tie in the oracle


def log(msg):
    print(f"[fidelity] {msg}", file=sys.stderr, flush=True)


def oracle_tree_from_checkpoint(model_dir: str, n_enc: int = 32, n_dec: int = 26):
    """np float32 param tree in the engine layout, mapped INDEPENDENTLY of
    models/params.py (names per voxtral_encoder.c:50-117,
    voxtral_decoder.c:49-108, voxtral.c:102-110).  Layer counts are
    parameters so tests can run it against tiny checkpoints."""
    from voxtral_tpu.io.safetensors import SafetensorsFile

    sf = SafetensorsFile(os.path.join(model_dir, "consolidated.safetensors"))
    enc_p = "mm_streams_embeddings.embedding_module.whisper_encoder"
    mm_p = "mm_streams_embeddings.embedding_module"

    def f32(name):
        return sf.get(name).astype(np.float32)

    def stack(fmt, n, merge=None):
        if merge:
            return np.stack(
                [np.concatenate([f32(fmt.format(i=i, part=p)) for p in merge])
                 for i in range(n)]
            )
        return np.stack([f32(fmt.format(i=i)) for i in range(n)])

    def conv_im2col(name):
        w = f32(name)                       # [C_out, C_in, K]
        c_out, c_in, k = w.shape
        return w.transpose(2, 1, 0).reshape(k * c_in, c_out)

    log("building oracle encoder tree")
    el = f"{enc_p}.transformer.layers.{{i}}"
    bq = stack(f"{el}.attention.wq.bias", n_enc)
    bv = stack(f"{el}.attention.wv.bias", n_enc)
    enc = {
        "conv0_w": conv_im2col(f"{enc_p}.conv_layers.0.conv.weight"),
        "conv0_b": f32(f"{enc_p}.conv_layers.0.conv.bias"),
        "conv1_w": conv_im2col(f"{enc_p}.conv_layers.1.conv.weight"),
        "conv1_b": f32(f"{enc_p}.conv_layers.1.conv.bias"),
        "layers": {
            "attn_norm": stack(f"{el}.attention_norm.weight", n_enc),
            "wqkv": stack(
                f"{el}.attention.{{part}}.weight", n_enc,
                merge=("wq", "wk", "wv"),
            ),
            "bqkv": np.concatenate([bq, np.zeros_like(bq), bv], axis=1),
            "wo": stack(f"{el}.attention.wo.weight", n_enc),
            "bo": stack(f"{el}.attention.wo.bias", n_enc),
            "ffn_norm": stack(f"{el}.ffn_norm.weight", n_enc),
            "w13": stack(
                f"{el}.feed_forward.{{part}}.weight", n_enc, merge=("w1", "w3")
            ),
            "w2": stack(f"{el}.feed_forward.w2.weight", n_enc),
            "b2": stack(f"{el}.feed_forward.w2.bias", n_enc),
        },
        "final_norm": f32(f"{enc_p}.transformer.norm.weight"),
    }
    adapter = {
        "w0": f32(f"{mm_p}.audio_language_projection.0.weight"),
        "w1": f32(f"{mm_p}.audio_language_projection.2.weight"),
    }
    log("building oracle decoder tree (~14 GB f32)")
    dl = "layers.{i}"
    dec = {
        "tok_embeddings": f32(f"{mm_p}.tok_embeddings.weight"),
        "layers": {
            "attn_norm": stack(f"{dl}.attention_norm.weight", n_dec),
            "wqkv": stack(
                f"{dl}.attention.{{part}}.weight", n_dec, merge=("wq", "wk", "wv")
            ),
            "wo": stack(f"{dl}.attention.wo.weight", n_dec),
            "ffn_norm": stack(f"{dl}.ffn_norm.weight", n_dec),
            "w13": stack(
                f"{dl}.feed_forward.{{part}}.weight", n_dec, merge=("w1", "w3")
            ),
            "w2": stack(f"{dl}.feed_forward.w2.weight", n_dec),
            "ada_down": stack(f"{dl}.ada_rms_norm_t_cond.0.weight", n_dec),
            "ada_up": stack(f"{dl}.ada_rms_norm_t_cond.2.weight", n_dec),
        },
        "final_norm": f32("norm.weight"),
    }
    return {"encoder": enc, "adapter": adapter, "decoder": dec}


def main():
    model_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "VOXTRAL_MODEL_DIR", "/root/ckpt-fake"
    )
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 7.0

    import jax
    import jax.numpy as jnp

    from voxtral_tpu.audio.mel import MelContext
    from voxtral_tpu.config import (
        N_LEFT_PAD_TOKENS,
        RAW_AUDIO_LENGTH_PER_TOK,
        full_config,
        n_right_pad_tokens,
    )
    from voxtral_tpu.models.params import load_params
    from voxtral_tpu.runtime.engine import VoxtralEngine, adaptive_dec_ring
    from voxtral_tpu.tokenizer import TekkenTokenizer

    cfg = full_config()
    log(f"device: {jax.devices()[0]}")

    # deterministic synthetic speech-band audio
    rng = np.random.default_rng(7)
    n = int(seconds * 16000)
    tt = np.arange(n) / 16000.0
    audio = (0.25 * np.sin(2 * np.pi * 210 * tt) * np.sin(2 * np.pi * 1.7 * tt)
             + 0.05 * rng.standard_normal(n)).astype(np.float32)

    ctx = MelContext(N_LEFT_PAD_TOKENS * RAW_AUDIO_LENGTH_PER_TOK)
    ctx.feed(audio)
    align = (RAW_AUDIO_LENGTH_PER_TOK - (n % RAW_AUDIO_LENGTH_PER_TOK)) \
        % RAW_AUDIO_LENGTH_PER_TOK
    pad = align + n_right_pad_tokens(cfg.delay_tokens) * RAW_AUDIO_LENGTH_PER_TOK
    ctx.feed(np.zeros(pad, np.float32))
    ctx.finish(0)
    mel = ctx.data()
    log(f"{seconds:.1f}s audio -> {mel.shape[0]} padded mel frames")

    # --- engine path: real loader -> TPU -> greedy offline decode ----------
    t0 = time.monotonic()
    params = load_params(model_dir, cfg, verbose=True)
    tok = TekkenTokenizer.load(os.path.join(model_dir, "tekken.json"))
    log(f"engine weights in HBM (+{time.monotonic() - t0:.0f}s)")
    engine = VoxtralEngine(
        cfg, params, tokenizer=tok, buckets=(64, 16, 4, 1),
        dec_kv_ring=adaptive_dec_ring(cfg, n),
    )

    from voxtral_tpu.models.fused_stream import ConvTails

    tails = ConvTails.create(cfg)
    enc_cache = engine.new_enc_cache()
    rows_out = []
    q_total = (mel.shape[0] // 8) * 8
    i = enc_pos = 0
    for q in engine.fused_sizes(q_total):
        rows, tails, enc_cache = engine.fused_encode(
            jnp.asarray(mel[i : i + q]), tails, enc_cache, enc_pos
        )
        enc_pos += q // 2
        rows_out.append(rows)
        i += q
    adapter_rows = np.asarray(
        jnp.concatenate(rows_out, axis=0).astype(jnp.float32)
    )
    log(f"engine adapter rows: {adapter_rows.shape}")

    L = engine.prompt_len
    dec_cache = engine.new_dec_cache()
    dec_cache = engine.prefill(
        np.asarray(engine.prompt_embeds(jnp.asarray(adapter_rows[: L - 1]))),
        dec_cache, 0,
    )
    n_audio = adapter_rows.shape[0]
    engine_tokens = []
    prev = 32  # STREAMING_PAD
    pos = L - 1
    from voxtral_tpu.runtime.engine import decompose

    for b in decompose(n_audio - pos, (64, 16, 4, 1)):
        toks, _, _, _, dec_cache = engine.decode_burst(
            adapter_rows[pos : pos + b], prev, dec_cache, pos
        )
        toks = np.asarray(toks)
        engine_tokens.extend(int(t) for t in toks)
        prev = int(toks[-1])
        pos += b
    log(f"engine decoded {len(engine_tokens)} steps")
    assert len(engine_tokens) >= MIN_STEPS, len(engine_tokens)

    # free HBM before the oracle (params stay; caches dropped)
    del dec_cache, enc_cache

    # --- oracle path: independent mapping + torch f32 ----------------------
    import torch

    t0 = time.monotonic()
    otree = oracle_tree_from_checkpoint(model_dir)
    log(f"oracle tree built (+{time.monotonic() - t0:.0f}s)")

    from oracle import OracleDecoder, oracle_adapter, oracle_conv_stem, oracle_encoder

    t0 = time.monotonic()
    conv = oracle_conv_stem(otree["encoder"], cfg, mel[: q_total])
    enc = oracle_encoder(otree["encoder"], cfg, conv)
    usable = (len(enc) // 4) * 4
    o_adapter = oracle_adapter(otree["adapter"], cfg, enc[:usable])
    log(f"oracle adapter rows: {o_adapter.shape} (+{time.monotonic() - t0:.0f}s)")
    assert o_adapter.shape == adapter_rows.shape

    # adapter-row agreement (bf16 engine vs f32 oracle)
    rel = np.abs(adapter_rows - o_adapter) / (np.abs(o_adapter).max() + 1e-9)
    log(f"adapter rel err: max {rel.max():.4f}")
    assert rel.max() < 0.05, "adapter outputs diverge: wiring bug upstream"

    # teacher-forced oracle replay of the engine's schedule
    dec = OracleDecoder(otree["decoder"], cfg)
    emb = torch.tensor(otree["decoder"]["tok_embeddings"])
    a = torch.tensor(o_adapter)
    prompt_ids = [1] + [32] * (L - 1)
    prefix = a[:L] + emb[torch.tensor(prompt_ids)]
    agree = 0
    near_tie_flips = []
    t0 = time.monotonic()
    with torch.no_grad():
        dec.forward(prefix[: L - 1], 0)
        prev = 32
        for step, eng_tok in enumerate(engine_tokens):
            p = L - 1 + step
            e = (a[p] + emb[prev]).unsqueeze(0)
            h = dec.forward(e, p)
            lg = dec.logits(h)[0]
            o_tok = int(lg.argmax())
            if o_tok == eng_tok:
                agree += 1
            else:
                top2 = torch.topk(lg, 2).values
                gap = float((top2[0] - lg[eng_tok]) / (top2[0].abs() + 1e-9))
                near_tie_flips.append((step, eng_tok, o_tok, gap))
            prev = eng_tok  # teacher-force the engine's token
            if (step + 1) % 16 == 0:
                log(f"oracle step {step + 1}/{len(engine_tokens)} "
                    f"(+{time.monotonic() - t0:.0f}s)")
    n_steps = len(engine_tokens)
    frac = agree / n_steps
    log(f"agreement: {agree}/{n_steps} = {frac:.3f}")
    for step, et, ot, gap in near_tie_flips:
        log(f"  flip @step {step}: engine {et} vs oracle {ot} "
            f"(oracle rel gap {gap:.4f})")
    ok = frac >= MIN_EXACT_AGREE and all(
        g < TIE_REL_EPS for _, _, _, g in near_tie_flips
    )
    print(f"FIDELITY {'PASS' if ok else 'FAIL'}: {agree}/{n_steps} exact, "
          f"{len(near_tie_flips)} near-tie flips")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
