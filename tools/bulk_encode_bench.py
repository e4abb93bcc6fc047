#!/usr/bin/env python
"""A/B the bulk no-ring encoder vs the incremental ring path on chip.

Prints per-clip encode wall for: incremental fused (1024-buckets, the old
bench path), bulk single-stream, and bulk groups of G (BULK_GROUPS env,
default "1,4,8").  60 s clip by default (BULK_SECONDS)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cache = os.path.expanduser("~/.cache/voxtral_tpu/jax")


def main():
    import jax
    import jax.numpy as jnp

    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from voxtral_tpu.audio.mel import MelContext
    from voxtral_tpu.config import (
        N_LEFT_PAD_TOKENS,
        RAW_AUDIO_LENGTH_PER_TOK,
        full_config,
        n_right_pad_tokens,
    )
    from voxtral_tpu.models.params import init_params
    from voxtral_tpu.runtime.engine import VoxtralEngine

    print(f"device: {jax.devices()[0]}", flush=True)
    cfg = full_config()
    params = init_params(cfg, seed=0)
    engine = VoxtralEngine(
        cfg, params, buckets=(512, 256, 64, 16, 4, 1), enc_kv_ring=1280,
        dec_kv_ring=896,
    )

    seconds = float(os.environ.get("BULK_SECONDS", "60"))
    rng = np.random.default_rng(0)
    n = int(seconds * 16000)
    audio = (0.1 * rng.standard_normal(n)).astype(np.float32)
    ctx = MelContext(N_LEFT_PAD_TOKENS * RAW_AUDIO_LENGTH_PER_TOK)
    ctx.feed(audio)
    align = (RAW_AUDIO_LENGTH_PER_TOK - (n % RAW_AUDIO_LENGTH_PER_TOK)) \
        % RAW_AUDIO_LENGTH_PER_TOK
    ctx.feed(np.zeros(
        align + n_right_pad_tokens(6) * RAW_AUDIO_LENGTH_PER_TOK, np.float32))
    ctx.finish(0)
    mel = ctx.data()
    mel = mel[: (mel.shape[0] // 8) * 8]
    print(f"mel: {mel.shape}", flush=True)

    def sync(x):
        # device-slice BEFORE the fetch: np.asarray of a full leaf
        # transfers everything over the ~0.05 GB/s tunnel
        leaf = jax.tree.leaves(x)[0]
        return np.asarray(leaf[(0,) * (leaf.ndim - 1)][:1])

    # incremental fused path (the old bench encode)
    if os.environ.get("BULK_SKIP_INC") != "1":
        from voxtral_tpu.models.fused_stream import ConvTails

        def inc_once():
            cache_ = engine.new_enc_cache()
            tails = ConvTails.create(cfg)
            pos = i = 0
            outs = []
            for q in engine.fused_sizes(mel.shape[0]):
                rows, tails, cache_ = engine.fused_encode(
                    jnp.asarray(mel[i : i + q]), tails, cache_, pos)
                pos += q // 2
                outs.append(rows)
                i += q
            return outs[-1]

        print("compiling incremental...", flush=True)
        sync(inc_once())
        t0 = time.monotonic()
        for _ in range(3):
            r = inc_once()
        sync(r)
        print(f"incremental fused: {(time.monotonic() - t0) / 3 * 1000:.1f} "
              f"ms/clip", flush=True)

    # bulk
    print("compiling bulk B=1...", flush=True)
    sync(engine.encode_clip_bulk(mel))
    t0 = time.monotonic()
    for _ in range(3):
        r = engine.encode_clip_bulk(mel)
    sync(r)
    print(f"bulk B=1: {(time.monotonic() - t0) / 3 * 1000:.1f} ms/clip",
          flush=True)

    mel_dev = jnp.asarray(mel)
    for g in [int(x) for x in
              os.environ.get("BULK_GROUPS", "4,8").split(",") if x]:
        mb = jnp.broadcast_to(mel_dev, (g,) + mel_dev.shape)
        print(f"compiling bulk B={g}...", flush=True)
        sync(engine.encode_clips_bulk(mb))
        t0 = time.monotonic()
        for _ in range(3):
            r = engine.encode_clips_bulk(mb)
        sync(r)
        dt = (time.monotonic() - t0) / 3 * 1000
        print(f"bulk B={g}: {dt:.1f} ms/dispatch = {dt / g:.1f} ms/clip "
              f"({seconds * 1000 * g / dt:.0f}x realtime)", flush=True)


if __name__ == "__main__":
    main()
