#!/usr/bin/env python
"""Compile/run probe for the vmapped fused-encode program (bench.py's
opt-in BENCH_ENC_BATCH path).  The batched program wedged the remote
compiler (>900 s) in round 2; this probe bounds the experiment so the
wedge can be re-tested per-shape without risking an unattended bench run.

Usage: [PB_BATCH=4] [PB_Q=512] [PB_RING=1280] python tools/probe_bencode.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    b = int(os.environ.get("PB_BATCH", "4"))
    q = int(os.environ.get("PB_Q", "512"))
    ring = int(os.environ.get("PB_RING", "1280"))

    import jax
    import jax.numpy as jnp

    from voxtral_tpu.config import full_config
    from voxtral_tpu.models.fused_stream import ConvTails, fused_encode_chunk
    from voxtral_tpu.models.params import init_params
    from voxtral_tpu.parallel import serving as sv

    print(f"device={jax.devices()[0]} enc_batch={b} q={q} ring={ring}",
          file=sys.stderr, flush=True)
    cfg = full_config()
    params = init_params(cfg, seed=0)
    jax.block_until_ready(params["encoder"]["layers"]["wqkv"])

    # params as explicit args — closing over them embeds 1.2 GB of weights
    # as HLO constants and wedges the TPU compiler's constant folding
    fn = jax.jit(
        jax.vmap(
            lambda ep, ap, m, t, c, p: fused_encode_chunk(
                ep, ap, cfg, m, t, c, p
            ),
            in_axes=(None, None, 0, 0, 0, None),
        ),
        donate_argnums=(4,),
    )
    mel = jnp.zeros((b, q, cfg.encoder.n_mel), jnp.float32)
    tails = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (b,) + x.shape), ConvTails.create(cfg)
    )
    cache = sv.batched_enc_cache(cfg, b, ring)

    t0 = time.monotonic()
    rows, tails, cache = fn(params["encoder"], params["adapter"],
                            mel, tails, cache, jnp.int32(0))
    np.asarray(rows[0, 0, :4])
    t_compile = time.monotonic() - t0
    print(f"compile+first run: {t_compile:.1f}s", flush=True)

    t0 = time.monotonic()
    n = 4
    for i in range(n):
        rows, tails, cache = fn(params["encoder"], params["adapter"],
                                mel, tails, cache, jnp.int32((i + 1) * q // 2))
    np.asarray(rows[0, 0, :4])
    dt = (time.monotonic() - t0) / n
    audio_s = b * q * 0.01  # 1 mel frame = 10 ms
    print(f"steady: {dt*1000:.1f} ms per {b}x{q}-frame chunk "
          f"-> {audio_s/dt:.0f}x realtime encode", flush=True)


if __name__ == "__main__":
    main()
