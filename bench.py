#!/usr/bin/env python
"""Benchmark: aggregate transcription throughput per chip (x-realtime).

Workload (BASELINE.json baseline is 16 streams; default here 56): N
streams of a 60 s clip transcribed on one chip,
batch-mode schedule — full pipeline: mel, conv stem, 32-layer encoder,
adapter, 26-layer decoder greedy bursts.  Primary metric: x-realtime per
chip = (streams x audio seconds) / wall.  Reference best: RTF 0.3998 ==
2.5x realtime on an M3 Max (SPEED.md:8-18).

Phasing matches the HBM budget on a 16 GB v5e: the encoder is compute-bound
and cheap, so streams encode SEQUENTIALLY sharing ONE ring cache (epoch
resets are free — ring masking), keeping peak memory at params + one encoder
cache; then all streams decode TOGETHER (the bandwidth-bound phase where
batching pays), with only decoder caches resident.

Weights: real checkpoint from $VOXTRAL_MODEL_DIR when present, else random
bf16 of identical shapes (identical compute/memory traffic; transcript
fidelity is covered by the oracle test suite, not this bench).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
A built-in supervisor retries the measurement if the (remote-tunnel) device
stalls; set BENCH_NO_SUPERVISOR=1 to run inline.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REF_X_REALTIME = 1.0 / 0.3998  # reference corpus RTF (SPEED.md:16)

ANCHORS_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "docs", "bench_anchors.json"
)

# Any of these set => NOT the default configuration: the run must not
# overwrite the measured end-to-end anchors (a round-4 72-stream capacity
# probe clobbered the recorded int4 headline because the old writer keyed
# on mode alone — VERDICT r4 weak #1).  BENCH_MODE itself is fine (it IS
# the anchor key); supervisor OOM-sheds set BENCH_STREAMS and are thereby
# excluded too.  Only vars that can change the HEADLINE (the timed
# run_once passes) are overrides: BENCH_LAT / BENCH_LOAD* / the bf16-only
# step-probe toggles all gate side phases that run strictly AFTER the
# timed passes, so a mode run may skip them and still record its anchor.
_ANCHOR_OVERRIDE_VARS = (
    "BENCH_STREAMS", "BENCH_TRIES", "BENCH_SECONDS", "BENCH_BURST",
    "BENCH_DEC_RING", "BENCH_ENC", "BENCH_ENC_GROUP", "BENCH_ENC_BATCH",
    "BENCH_PIPE",
)


def anchor_update_allowed(env=None) -> bool:
    """True iff this run is the default configuration for its mode — the
    only kind allowed to update docs/bench_anchors.json."""
    env = os.environ if env is None else env
    return not any(env.get(v) for v in _ANCHOR_OVERRIDE_VARS)


def load_anchors(path: str = None) -> dict:
    """mode -> last measured default-config end-to-end result."""
    try:
        with open(path or ANCHORS_PATH) as f:
            return json.load(f)
    except Exception:
        return {}


def record_anchor(mode: str, entry: dict, env=None, path: str = None) -> bool:
    """Write the measured end-to-end anchor for a non-default mode.  Guarded:
    only default-config runs (anchor_update_allowed) may write, so capacity
    probes with BENCH_STREAMS/BENCH_TRIES/... overrides provably cannot
    clobber a recorded headline (tests/test_bench_guard.py)."""
    if mode == "bf16" or not anchor_update_allowed(env):
        return False
    path = path or ANCHORS_PATH
    anchors = load_anchors(path)
    anchors[mode] = entry
    with open(path, "w") as f:
        json.dump(anchors, f, indent=1, sort_keys=True)
    return True


def _default_streams(mode: str) -> int:
    """One source of truth for the per-mode default stream count (used by
    both the supervisor's OOM-shed logic and main()).  bf16 64: with
    phase-lifetime weight paging (engine.offload_encoder) + the unrolled
    batched prefill, 48/56/64 all fit end-to-end (measured 143/195/205x;
    the 64-stream full run incl. extras + 3 load configs is rc-0 clean,
    docs/PERF.md round 4).  int4/int8 keep 56: 72 fits post-paging
    (5.47 GiB resident int4) but the encode phase scales linearly with
    streams and eats the decode win — 205.5x at 72 vs 244.7x at 56
    (docs/PERF.md round 4).  fp8kv (exact bf16 weights + fp8 decoder
    rings, the reference's default degraded-KV ladder rung) runs 80: the
    halved rings buy ~2.8 GiB of HBM that converts to streams bf16 cannot
    fit — measured 208x@64 / 226.7x@80 / 210.6x@88 / 207.8x@96 (the step
    degrades superlinearly near the ceiling; docs/PERF.md round 5).  The
    supervisor sheds 8 streams per RESOURCE_EXHAUSTED attempt as the
    net."""
    return {"int4": 56, "int8": 56, "fp8kv": 80}.get(mode, 64)


def _supervised() -> int:
    """Run the measurement in a child process with a stall watchdog.

    The remote-TPU tunnel in some environments occasionally drops an RPC and
    wedges the client forever; the child prints progress lines, and a parent
    that sees no output for BENCH_STALL_S seconds kills and retries."""
    # must exceed the longest single remote compile (the batched fused
    # encoder has taken ~7 min on a slow tunnel day)
    stall = float(os.environ.get("BENCH_STALL_S", "900"))
    attempts = int(os.environ.get("BENCH_ATTEMPTS", "5"))
    env = dict(os.environ, BENCH_INNER="1")

    def device_up() -> bool:
        """Cheap tunnel probe: a tiny matmul + one-element D2H in a child
        with a short timeout.  The axon tunnel goes down for an hour+ at a
        time (round 3); without this, every attempt burns a full `stall`
        window wedged at device discovery."""
        try:
            return subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp, numpy as np;"
                 "x = jnp.ones((128, 128));"
                 "np.asarray((x @ x)[0, :1])"],
                timeout=120, capture_output=True,
            ).returncode == 0
        except subprocess.TimeoutExpired:
            return False

    for a in range(1, attempts + 1):
        waited = 0.0
        while not device_up():
            print("[bench] device probe failed (tunnel down?); waiting 120s",
                  file=sys.stderr, flush=True)
            time.sleep(120)
            waited += 120
            if waited > float(os.environ.get("BENCH_TUNNEL_WAIT_S", "3600")):
                print("[bench] tunnel still down; trying anyway",
                      file=sys.stderr, flush=True)
                break
        print(f"[bench] attempt {a}/{attempts}", file=sys.stderr, flush=True)
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        last = time.monotonic()
        result = None
        oom = False
        import selectors

        sel = selectors.DefaultSelector()
        sel.register(proc.stdout, selectors.EVENT_READ)
        while proc.poll() is None:
            events = sel.select(timeout=15)
            if events:
                line = proc.stdout.readline()
                if line:
                    last = time.monotonic()
                    if line.lstrip().startswith("{") and '"metric"' in line:
                        result = line.strip()
                    else:
                        if "RESOURCE_EXHAUSTED" in line or \
                                "Ran out of memory" in line:
                            oom = True
                        print(line, end="", file=sys.stderr, flush=True)
            if time.monotonic() - last > stall:
                print(f"[bench] stalled {stall:.0f}s; killing child",
                      file=sys.stderr, flush=True)
                proc.kill()
                break
        for line in proc.stdout:
            if line.lstrip().startswith("{") and '"metric"' in line:
                result = line.strip()
            elif "RESOURCE_EXHAUSTED" in line or "Ran out of memory" in line:
                oom = True
        if result:
            print(result)
            return 0
        if oom:
            # HBM doesn't grow back on retry: shed streams instead of
            # burning attempts on the same OOM.  -8 down to 16, then halve;
            # an OOM at the 8-stream floor is unrecoverable — bail out
            # rather than retrying the identical configuration.
            cur = int(env.get(
                "BENCH_STREAMS",
                str(_default_streams(env.get("BENCH_MODE", "bf16")))))
            if cur <= 8:
                print("[bench] OOM at the 8-stream floor; giving up",
                      file=sys.stderr, flush=True)
                print(json.dumps({
                    "metric": "aggregate_x_realtime_per_chip",
                    "value": -1, "unit": "x_realtime", "vs_baseline": -1,
                    "extra": {"error": "OOM at 8 streams"},
                }))
                return 1
            env["BENCH_STREAMS"] = str(cur - 8 if cur > 16 else max(8, cur // 2))
            print(f"[bench] OOM at {cur} streams; retrying with "
                  f"{env['BENCH_STREAMS']}", file=sys.stderr, flush=True)
        print("[bench] attempt failed; cooling down 60s", file=sys.stderr,
              flush=True)
        time.sleep(60)
    print(json.dumps({
        "metric": "aggregate_x_realtime_per_chip",
        "value": -1, "unit": "x_realtime", "vs_baseline": -1,
        "extra": {"error": "all attempts stalled (TPU tunnel)"},
    }))
    return 1


def _encode_clip(engine, mel: np.ndarray, enc_cache, progress=None):
    """Single-stream encode of a full padded mel -> device adapter rows via
    the fused conv+encoder+adapter program (one dispatch per chunk).
    Reuses `enc_cache` across streams (epoch reset via positions is free)."""
    import jax.numpy as jnp

    from voxtral_tpu.models.fused_stream import ConvTails

    cfg = engine.cfg
    tails = ConvTails.create(cfg)
    rows_out = []
    q_total = (mel.shape[0] // 8) * 8  # the <8-frame tail holds no full token
    i = 0
    enc_pos = 0
    for q in engine.fused_sizes(q_total):
        rows, tails, enc_cache = engine.fused_encode(
            jnp.asarray(mel[i : i + q]), tails, enc_cache, enc_pos
        )
        enc_pos += q // 2
        rows_out.append(rows)
        i += q
        if progress:
            progress(f"enc {enc_pos}/{q_total // 2}")
    out = jnp.concatenate(rows_out, axis=0)
    return out.astype(jnp.float32), enc_cache


def _encode_clips_batched(engine, mel: np.ndarray, enc_batch: int,
                          enc_cache, progress=None):
    """Encode `enc_batch` identical-length streams per fused dispatch (vmap
    over the one-program conv+encoder+adapter).  The encoder is compute-
    bound, so batching amortizes dispatch overhead and fills the MXU; the
    batched MHA-32 ring cache is the memory constraint (CLAUDE.md), so
    enc_batch stays small and the cache is reused across groups (epoch reset
    via positions is free).  mel: [T, 128] shared content per stream.
    Returns [enc_batch, n_audio, dim] f32 adapter rows + the cache."""
    import jax
    import jax.numpy as jnp

    from voxtral_tpu.models.fused_stream import ConvTails, fused_encode_chunk

    cfg = engine.cfg
    tails = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (enc_batch,) + x.shape),
        ConvTails.create(cfg),
    )
    rows_out = []
    q_total = (mel.shape[0] // 8) * 8  # the <8-frame tail holds no full token
    i = 0
    enc_pos = 0
    # one jitted callable per engine (a fresh lambda every call would retrace).
    # Params MUST be explicit arguments: closing over the 1.2 GB encoder
    # weights embeds them as HLO constants and the TPU compiler's constant
    # folding wedges for >15 min on the vmapped program (the round-2
    # "batched-encode wedge"; explicit-arg AOT compile takes ~3 s).
    cache_key = ("bfused", enc_batch)
    memo = getattr(engine, "_bench_fns", None)
    if memo is None:
        memo = engine._bench_fns = {}
    fn = memo.get(cache_key)
    if fn is None:
        fn = jax.jit(
            jax.vmap(
                lambda ep, ap, m, t, c, p: fused_encode_chunk(
                    ep, ap, cfg, m, t, c, p,
                ),
                in_axes=(None, None, None, 0, 0, None),
            ),
            donate_argnums=(4,),
        )
        memo[cache_key] = fn
    for q in engine.fused_sizes(q_total):
        rows, tails, enc_cache = fn(
            engine._encp(), engine._adap(),
            jnp.asarray(mel[i : i + q]), tails, enc_cache, jnp.int32(enc_pos)
        )
        enc_pos += q // 2
        rows_out.append(rows)
        i += q
        if progress:
            progress(f"enc {enc_pos}/{q_total // 2}")
    out = jnp.concatenate(rows_out, axis=1)      # [enc_batch, n_audio, dim]
    return out.astype(jnp.float32), enc_cache


def main():
    # 56 streams bf16 on a 16 GB v5e: decode is weight-read-bound, so batch
    # amortizes weight reads (16.45 ms/step at B=56 vs 12.45 at B=16, ring
    # 896).  Phase-lifetime weight paging (the ~2 GB encoder+adapter leave
    # HBM for the decode phase) + the unrolled batched prefill (the layer
    # scan copied the whole stacked cache 2x as HLO temps under stream-vmap)
    # are what make 48/56/64 fit end-to-end — see docs/PERF.md round 3.
    # The supervisor sheds 8 streams per RESOURCE_EXHAUSTED attempt as a net.
    # BENCH_MODE — the measured dtype ladder, exactness-first (each rung's
    # end-to-end number is recorded in docs/bench_anchors.json and echoed by
    # bf16 runs; transcripts on the degraded rungs may flip near-tied tokens,
    # so bf16 stays the default headline):
    #   bf16   exact weights + exact rings (the headline)
    #   fp8kv  exact bf16 weights + fp8 decoder rings — the direct analog of
    #          the reference's DEFAULT (fp16 KV, VOX_DECODER_KV_FP16
    #          voxtral.c:166-167 / SPEED.md:171-182): weights stay exact,
    #          the cache degrades one dtype rung
    #   int8   int8 weight-only decoder (Pallas-free XLA path) + fp8 rings
    #   int4   int4 decoder (Pallas nibble-unpack kernel) + fp8 rings — the
    #          high-density rung (244.7x at 56 streams, round 4)
    mode = os.environ.get("BENCH_MODE", "bf16")
    assert mode in ("bf16", "fp8kv", "int8", "int4"), mode
    n_streams = int(os.environ.get("BENCH_STREAMS", _default_streams(mode)))
    seconds = float(os.environ.get("BENCH_SECONDS", "60"))
    burst = int(os.environ.get("BENCH_BURST", "64"))

    import jax
    import jax.numpy as jnp

    from voxtral_tpu.audio.mel import MelContext
    from voxtral_tpu.config import (
        N_LEFT_PAD_TOKENS,
        RAW_AUDIO_LENGTH_PER_TOK,
        TOKEN_EOS,
        full_config,
        n_right_pad_tokens,
    )
    from voxtral_tpu.models.params import init_params, load_params
    from voxtral_tpu.parallel import serving as sv
    from voxtral_tpu.runtime.engine import VoxtralEngine
    from voxtral_tpu.tokenizer import TekkenTokenizer

    # persistent compile cache: supervisor retries (and later rounds) reuse
    # every already-finished warm-up compile instead of redoing ~minutes of
    # remote compilation (same knob as the CLI's --compile-cache)
    cache_dir = os.environ.get(
        "VOXTRAL_COMPILE_CACHE",
        os.path.expanduser("~/.cache/voxtral_tpu/jax"),
    )
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    dev = jax.devices()[0]
    print(f"bench device: {dev}", file=sys.stderr, flush=True)

    cfg = full_config()
    if mode != "bf16":
        # every degraded rung: decoder rings fp8; the encoder ring stays
        # exact bf16 (enc_kv_dtype override — only the decoder degrades)
        cfg = cfg.replace(kv_dtype="float8_e4m3fn", enc_kv_dtype="bfloat16")
    # big encode buckets cut per-call dispatch overhead (matters on remote
    # tunnels); enc ring must cover window 750 + the largest bucket
    # enc ring 1280 enables the 1024-frame fused-encode bucket (474x vs 326x
    # realtime at 512 — fewer O(cap) ring rotates per clip); bigger chunks
    # need a bigger ring, whose attention reads then dominate (227x at 2048)
    # dec ring 896 fits the 60 s workload exactly (39 prompt + 750 audio +
    # 17 right-pad = 806 positions; adaptive_dec_ring math) — ~12% less KV
    # read traffic and ring memory than the old pow2 1024
    eng_kwargs = dict(buckets=(512, 256, 64, 16, 4, 1), enc_kv_ring=1280,
                      dec_kv_ring=int(os.environ.get("BENCH_DEC_RING", "896")))

    # ONE checkpoint decision shared by the initial load and every later
    # restore_encoder() (the paging hook): if they drift, pass-2+ transcripts
    # silently diverge from pass 1 (ADVICE r3)
    from voxtral_tpu.models.params import encoder_param_source

    model_dir = os.environ.get("VOXTRAL_MODEL_DIR", "")
    encoder_source = encoder_param_source(cfg, model_dir, seed=0)
    if encoder_source.use_checkpoint:
        print(f"loading real weights from {model_dir}", file=sys.stderr)
        params = load_params(model_dir, cfg)
        tok = TekkenTokenizer.load(os.path.join(model_dir, "tekken.json"))
    else:
        print("no checkpoint found; using random bf16 weights (same "
              "compute/memory traffic)", file=sys.stderr, flush=True)
        params = init_params(cfg, seed=0)
        tok = TekkenTokenizer([bytes([i % 256]) for i in range(1000)], 1000)

    engine = VoxtralEngine(
        cfg, params, tokenizer=tok, param_source=encoder_source,
        quantize=mode if mode in ("int4", "int8") else False, **eng_kwargs
    )
    # rebind so the pre-quantization bf16 decoder copies become garbage and
    # their HBM is freed (the whole point of the int4 serving mode)
    params = engine.params
    if engine.quantized:
        # drain the async queue so the 6.9 GiB bf16 decoder-master frees
        # LAND before the pipeline dispatches: the pipelined path has no
        # phase barrier, and with the frees still queued the first warmup
        # pass transiently holds masters + quantized copies + caches —
        # measured as a spurious RESOURCE_EXHAUSTED shed at int4@56
        # (docs/PERF.md round 5)
        _ = np.asarray(jnp.zeros((1,)))
    L = engine.prompt_len

    # --- the audio workload -------------------------------------------------
    rng = np.random.default_rng(0)
    n = int(seconds * 16000)
    t = np.arange(n) / 16000.0
    audio = (0.25 * np.sin(2 * np.pi * 220 * t) * np.sin(2 * np.pi * 1.3 * t)
             + 0.05 * rng.standard_normal(n)).astype(np.float32)

    def padded_mel(a: np.ndarray) -> np.ndarray:
        ctx = MelContext(N_LEFT_PAD_TOKENS * RAW_AUDIO_LENGTH_PER_TOK)
        ctx.feed(a)
        align = (RAW_AUDIO_LENGTH_PER_TOK - (len(a) % RAW_AUDIO_LENGTH_PER_TOK)) \
            % RAW_AUDIO_LENGTH_PER_TOK
        pad = align + n_right_pad_tokens(engine.delay_tokens) * RAW_AUDIO_LENGTH_PER_TOK
        ctx.feed(np.zeros(pad, np.float32))
        ctx.finish(0)
        return ctx.data()

    mel_one = padded_mel(audio)
    print(f"workload: {n_streams} streams x {seconds:.0f}s "
          f"({mel_one.shape[0]} mel frames each)", file=sys.stderr, flush=True)

    def log(msg):
        print(f"  {msg}", file=sys.stderr, flush=True)

    mem_ledger = {}

    def logmem(tag, *extra_arrays):
        """HBM ledger at phase boundaries: backend bytes_in_use when the
        runtime exposes it, PLUS the shape-derived ledger
        (engine.memory_ledger + this run's big buffers) which works
        everywhere — the axon backend has no memory_stats(), and the
        36-vs-40-stream OOM ceiling sat ~3 GB above what OOM-dump
        archaeology suggested, so both views are recorded."""
        gib = 1 << 30
        try:
            st = dev.memory_stats()
            mem_ledger[f"hbm_gib_{tag.split()[-1]}"] = round(
                st["bytes_in_use"] / gib, 2)
            mem_ledger["hbm_gib_peak"] = round(
                st.get("peak_bytes_in_use", 0) / gib, 2)
            log(f"mem[{tag}]: in_use {st['bytes_in_use'] / gib:.2f} GiB, "
                f"peak {st.get('peak_bytes_in_use', 0) / gib:.2f} GiB, "
                f"limit {st.get('bytes_limit', 0) / gib:.2f} GiB")
        except Exception:
            pass
        led = engine.memory_ledger()
        resident = led["params_total"] + sum(
            int(sum(x.nbytes for x in jax.tree.leaves(a)))
            for a in extra_arrays if a is not None
        )
        mem_ledger[f"ledger_gib_{tag.split()[-1]}"] = round(resident / gib, 2)
        log(f"ledger[{tag}]: {resident / gib:.2f} GiB resident "
            f"(weights {led['params_total'] / gib:.2f})")

    # Encode-phase mode: "inc" (default) = the incremental fused ring path,
    # sequential with ONE shared cache — measured fastest per clip (~107 ms,
    # which round-3 probing showed is the axon toolchain's matmul floor;
    # docs/PERF.md round 3).  Rows now land in ONE preallocated [B, n, dim]
    # buffer via donated updates: the round-2 40-stream OOM was the
    # adapter stack/concat transients (~0.8 GB), not steady residency.
    # "bulk" = the no-ring banded whole-clip encoder in groups of
    # BENCH_ENC_GROUP (fewer dispatches; currently ~2x slower per clip —
    # kernel ledger in docs/PERF.md).  BENCH_ENC_BATCH > 1 vmaps the
    # incremental encoder (historical A/B; ring traffic scales with B).
    enc_mode = os.environ.get("BENCH_ENC", "inc")
    enc_group = max(1, min(int(os.environ.get("BENCH_ENC_GROUP", "4")),
                           n_streams))
    enc_batch = max(1, int(os.environ.get("BENCH_ENC_BATCH", "1")))
    enc_batch = min(enc_batch, n_streams)

    set_rows = jax.jit(
        lambda a, r, o: jax.lax.dynamic_update_slice(a, r, (o, 0, 0)),
        donate_argnums=(0,),
    )

    # Pipelined phases (BENCH_PIPE=1): skip the phase barrier — no encoder
    # weight paging, no inter-phase queue drain, and no per-burst token
    # fetches; the whole encode+prefill+decode pipeline dispatches
    # asynchronously with ONE D2H fetch of the token ids at the end, so the
    # device queue never drains on a tunnel round trip.  Only modes whose
    # working set fits withOUT paging can run this way: int4/int8 drop the
    # 6.9 GB bf16 decoder masters, and fp8kv's halved rings leave room for
    # the resident encoder even at 80 streams (12.54 GiB measured) — all
    # three default on.  bf16 at 64 streams needs the paging barrier
    # (default off).  Measured effect: +0.7% (the barrier costs only
    # ~0.12 s — XLA's async dispatch already pipelines everything else;
    # docs/PERF.md round 5) — kept because it is free and drops the
    # per-burst token fetches.
    pipelined = os.environ.get(
        "BENCH_PIPE", "0" if mode == "bf16" else "1") == "1"

    def run_once(label):
        """Full two-phase pipeline over all streams; returns wall + stats."""
        t_start = time.monotonic()
        # Phase E: encode.  Encoder+adapter weights are paged back in first
        # (the previous pass's decode phase dropped them) — the re-
        # materialization cost is part of the timed pipeline.
        engine.restore_encoder()
        if enc_mode == "bulk":
            n_rows = mel_one.shape[0] // 8
            mel_dev = jnp.asarray(mel_one)
            # rows land directly in one preallocated [B, n, dim] buffer
            # (donated updates — no stack/concat transient doubling)
            adapter = jnp.zeros(
                (n_streams, n_rows, cfg.decoder.dim), jnp.float32
            )
            for g0 in range(0, n_streams, enc_group):
                g = min(enc_group, n_streams - g0)
                rows = engine.encode_clips_bulk(
                    jnp.broadcast_to(mel_dev, (g,) + mel_dev.shape)
                )
                adapter = set_rows(adapter, rows, jnp.int32(g0))
                log(f"{label} encoded streams {g0 + g}/{n_streams}")
            del mel_dev
        elif enc_batch > 1:
            enc_cache = sv.batched_enc_cache(cfg, enc_batch, engine.enc_kv_ring)
            adapter_rows = []
            for g in range(0, n_streams, enc_batch):
                rows, enc_cache = _encode_clips_batched(
                    engine, mel_one, enc_batch, enc_cache,
                    progress=(lambda m: log(f"{label} group0 {m}"))
                    if g == 0 else None,
                )
                adapter_rows.append(rows)
                log(f"{label} encoded streams {min(g + enc_batch, n_streams)}"
                    f"/{n_streams}")
            adapter = jnp.concatenate(adapter_rows, axis=0)[:n_streams]
            del enc_cache, adapter_rows
        else:
            enc_cache = engine.new_enc_cache()
            adapter = jnp.zeros(
                (n_streams, mel_one.shape[0] // 8, cfg.decoder.dim),
                jnp.float32,
            )
            for s in range(n_streams):
                rows, enc_cache = _encode_clip(
                    engine, mel_one, enc_cache,
                    progress=(lambda m, s=s: log(f"{label} stream {s} {m}"))
                    if s == 0 else None,
                )
                # straight into the preallocated buffer (donated update) —
                # no per-stream list + jnp.stack transient (the round-2
                # 40-stream OOM)
                adapter = set_rows(adapter, rows[None], jnp.int32(s))
                log(f"{label} encoded stream {s + 1}/{n_streams}")
            del enc_cache
        if pipelined:
            # no barrier: t_enc is DISPATCH time only (the device is still
            # executing encode work while decode dispatch begins); the
            # phase split is not separately measurable in this mode
            t_enc = time.monotonic()
        else:
            # sync via a D2H fetch (block_until_ready is unreliable for
            # timing on the axon tunnel — CLAUDE.md)
            _ = np.asarray(adapter[0, 0, :1])          # [B, n_audio, dim]
            t_enc = time.monotonic()
            logmem(f"{label} post-encode", adapter)
            # Phase D: batched decode.  Page the encoder+adapter weights
            # (~2 GB bf16) out of HBM first: the decode step never reads
            # them, and at 44 streams the full pipeline otherwise sits ~tens
            # of MB from the ceiling (measured: the first 34 MB burst-chunk
            # slice OOMs).
            engine.offload_encoder()
            _ = np.asarray(jnp.zeros((1,)))    # drain queue so frees land
        n_audio = adapter.shape[1]
        dec_cache = sv.batched_dec_cache(cfg, n_streams, engine.dec_kv_ring)
        prompt = jax.vmap(engine.prompt_embeds)(adapter[:, :L])
        dec_cache = sv.bprefill(
            params["decoder"], cfg, prompt[:, : L - 1], dec_cache,
            jnp.zeros((n_streams,), jnp.int32), engine.ada(),
        )
        # prev-token feedback between bursts stays ON DEVICE (toks[:, -1]);
        # the old per-burst np.asarray(toks) drained the dispatch queue on a
        # tunnel round trip every 64 steps — all token ids now come home in
        # one end-of-clip fetch (195 KB at B=64) and EOS handling moves to
        # host post-processing (identical transcripts: the lockstep decode
        # runs every position either way)
        toks_parts = []
        prev = jnp.full((n_streams,), 32, jnp.int32)
        pos = L - 1
        steps = 0
        from voxtral_tpu.runtime.engine import decompose

        for b in decompose(n_audio - pos, (burst, 16, 4, 1)):
            chunk = jax.lax.slice_in_dim(adapter, pos, pos + b, axis=1)
            toks, _, _, _, dec_cache = sv.bdecode_burst(
                params["decoder"], cfg, chunk, prev, dec_cache,
                jnp.full((n_streams,), pos, jnp.int32), engine.ada(),
            )
            toks_parts.append(toks)
            prev = toks[:, -1].astype(jnp.int32)
            pos += b
            steps += b
            if steps % 256 == 0 or pos >= n_audio:
                log(f"{label} decode dispatched {pos}/{n_audio}")
        all_toks = np.asarray(jnp.concatenate(toks_parts, axis=1))
        tokens = [[] for _ in range(n_streams)]
        for s in range(n_streams):
            for tk in all_toks[s]:
                tk = int(tk)
                if tk == TOKEN_EOS:
                    break
                tokens[s].append(tk)
        wall = time.monotonic() - t_start
        logmem(f"{label} post-decode", adapter, dec_cache)
        del dec_cache
        return wall, t_enc - t_start, wall - (t_enc - t_start), steps, tokens

    # warmup (compiles) then timed — best of BENCH_TRIES passes: the remote
    # tunnel's RPC jitter adds 1-2 s to a ~15 s pass often enough to swing
    # the headline by ~8% between otherwise identical runs (r3: 136.8 vs
    # 126.6 with the faster decode).  The workload is fixed, so min() is
    # the standard de-noised estimate; transcripts come from the first pass.
    run_warm = run_once("warmup")
    log(f"warmup total {run_warm[0]:.1f}s")
    wall, enc_s, dec_s, steps, tokens = run_once("timed")
    for extra_try in range(int(os.environ.get("BENCH_TRIES", "2")) - 1):
        w2, e2, d2, _, _ = run_once(f"timed{extra_try + 2}")
        log(f"pass {extra_try + 2}: {w2:.2f}s (vs {wall:.2f}s)")
        if w2 < wall:
            wall, enc_s, dec_s = w2, e2, d2

    def run_extra(tag, fn):
        """An extra must not kill the run (its allocations are GBs next to
        the headline's residents): contain OOMs — the supervisor would
        otherwise shed HEADLINE streams over a side measurement."""
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — RESOURCE_EXHAUSTED etc.
            if "RESOURCE_EXHAUSTED" not in str(e) and \
                    "Ran out of memory" not in str(e):
                raise
            log(f"{tag}: OOM — skipped")
            return -1.0

    def step_extra(tag, n, dec, dcfg):
        """Quantized/degraded-KV decode-step timing at n streams: build a
        cache, run 4x64-step bursts at mid-clip fill (a near-empty ring
        flatters fill-sensitive attention paths), report ms/step."""
        state = {"c": sv.batched_dec_cache(dcfg, n, engine.dec_kv_ring)}
        chunk = jnp.zeros((n, 64, cfg.decoder.dim), jnp.float32)
        prev = jnp.full((n,), 32, jnp.int32)

        def q_step():
            toks, _, _, _, state["c"] = sv.bdecode_burst(
                dec, dcfg, chunk, prev, state["c"],
                jnp.full((n,), 500, jnp.int32), engine.ada(),
            )
            return toks

        _ = np.asarray(q_step())
        t0 = time.monotonic()
        for _ in range(4):
            toks = q_step()
        _ = np.asarray(toks)
        ms = 1000.0 * (time.monotonic() - t0) / (4 * 64)
        log(f"{tag} step {ms:.2f} ms ({n} streams)")
        return ms

    # --- int8 weight-only variant: step time only (transcripts differ at
    # near-ties, so it is reported as an extra, not the headline) -----------
    int8_step_ms = -1.0
    # the int8 weight copy (3.4 GB) lives NEXT TO the bf16 weights, so this
    # extra runs at <=16 streams regardless of the headline batch — at B=32
    # the combined footprint (8.9 bf16 + 3.4 int8 + 3.5 rings GB) OOMs
    n_int8 = min(n_streams, 16)
    if mode == "bf16" and os.environ.get("BENCH_INT8", "1") != "0":
        def _int8():
            from voxtral_tpu.models.quant import quantize_layer_stack

            qdec = dict(params["decoder"])
            qdec["layers"] = quantize_layer_stack(qdec["layers"])
            jax.block_until_ready(qdec["layers"]["wqkv"])
            return step_extra("int8", n_int8, qdec, cfg)

        int8_step_ms = run_extra("int8", _int8)

    # --- int4 (Pallas in-VMEM-unpack kernel) + fp8 KV: the full dtype
    # ladder's bottom rung; step time only, like the int8 extra.  The int4
    # copy is only 1.6 GB and fp8 rings are half-size, so this extra runs
    # at up to 32 streams next to the resident bf16 weights ---------------
    int4_step_ms = -1.0
    n_int4 = min(n_streams, 32)
    if mode == "bf16" and os.environ.get("BENCH_INT4", "1") != "0":
        def _int4():
            from voxtral_tpu.models.quant import quantize_params

            cfg4 = cfg.replace(kv_dtype="float8_e4m3fn")
            qdec4 = quantize_params(
                {"decoder": params["decoder"]}, encoder=False, bits=4
            )["decoder"]
            jax.block_until_ready(qdec4["layers"]["wqkv"])
            return step_extra("int4+fp8kv", n_int4, qdec4, cfg4)

        int4_step_ms = run_extra("int4+fp8kv", _int4)

    # --- EXACT bf16 weights + fp8 KV rings: the reference's own Metal
    # default is a degraded-KV cache (fp16, VOX_DECODER_KV_FP16 default-on —
    # voxtral.c:166-167), so this rung is its direct analog one step down
    # the ladder.  fp8 rings are half-size (47.7 MB/stream at cap 896), so
    # capacity roughly doubles vs the all-bf16 headline; weights stay exact.
    # Step time only, like the other extras. -------------------------------
    fp8_step_ms = -1.0
    n_fp8 = int(os.environ.get("BENCH_FP8_STREAMS", "64"))
    if mode == "bf16" and os.environ.get("BENCH_FP8", "1") != "0":
        fp8_step_ms = run_extra(
            "bf16w+fp8kv",
            lambda: step_extra(
                "bf16w+fp8kv", n_fp8, params["decoder"],
                cfg.replace(kv_dtype="float8_e4m3fn"),
            ),
        )

    # --- phase 2: single-stream p50 token latency at -I 0.5 ----------------
    # (the quantized step-time extras above ran with the encoder still paged
    # out — more HBM headroom for their weight copies; streaming needs it back)
    engine.restore_encoder()
    from voxtral_tpu.runtime.stream import VoxStream

    chunk_n = 8000
    lat_ms: list[float] = []
    lat_runs = 2 if os.environ.get("BENCH_LAT", "1") != "0" else 0
    for run_i in range(lat_runs):  # first run absorbs single-stream compiles
        lat_ms = []
        s = VoxStream(engine)
        s.set_processing_interval(0.5)
        for j, i in enumerate(range(0, len(audio), chunk_n)):
            gen_before = s.n_generated
            t1 = time.monotonic()
            s.feed(audio[i : i + chunk_n])
            dt = (time.monotonic() - t1) * 1000.0
            # latency applies to every token decoded in this feed (random
            # weights rarely produce "text" tokens, so count decode steps)
            lat_ms += [dt] * (s.n_generated - gen_before)
            s.get()
            if j % 16 == 0:
                log(f"latency run {run_i} chunk {j}")
        s.finish()
        s.get()
    p50 = float(np.percentile(lat_ms, 50)) if lat_ms else -1.0
    p90 = float(np.percentile(lat_ms, 90)) if lat_ms else -1.0

    # --- phase 3: per-stream token latency UNDER LOAD (the number a serving
    # deployment cares about: how long a 0.5 s feed takes to return its
    # tokens while N-1 other live streams share the chip).  StreamPool in
    # window-recompute encoder mode (no per-stream MHA-32 ring), continuous
    # self-healing on, one slot churns (leave/join) mid-run.  Reference
    # metric contract: per-stream step latency, voxtral.c:1306-1317. -------
    load_extra = {}
    load_n = int(os.environ.get(
        "BENCH_LOAD_STREAMS", str(min(n_streams, 32))))
    if load_n > 1 and os.environ.get("BENCH_LOAD", "1") != "0":
        from voxtral_tpu.parallel.scheduler import StreamPool

        def run_load(tag, n, interval_s, n_ticks, gate_s=None, **pool_kw):
            """Two rounds of n_ticks 1x-realtime feeds for n live streams
            (round 0 absorbs pool compiles: encode lands once the 312-mel
            gate fills, then prefill, then decode); round 1 is measured,
            with one slot churning (leave+join) mid-round.  A tick serves
            every stream's feed, so the tick wall bounds each decoded
            token's latency — that is the reported per-feed latency.

            gate_s decouples the encode gate from the feed cadence: mel
            frames lag samples by the 400-sample STFT window, so a gate of
            exactly interval_s*100 frames fires on ALTERNATING ticks (each
            0.5 s feed completes ~48-52 frames) — bimodal 20/330 ms latency
            with p50 pinned AT the bar (measured, docs/PERF.md round 4).  A
            0.8x gate fires every tick; transcripts are unchanged (chunking
            invariance) — it only moves WHEN encode runs."""
            pool = StreamPool(engine, n, **pool_kw)
            slots = []
            for _ in range(n):
                sidx = pool.add_stream()
                pool.set_processing_interval(
                    sidx, interval_s if gate_s is None else gate_s)
                pool.set_continuous(sidx, True)
                slots.append(sidx)
            feed_n = int(interval_s * 16000)
            tick_ms, tick_tokens = [], []
            for rnd in range(2):
                for ti in range(n_ticks):
                    if rnd and ti == n_ticks // 2:
                        pool.close(slots[0])
                        slots[0] = pool.add_stream()
                        pool.set_processing_interval(
                            slots[0], interval_s if gate_s is None else gate_s)
                        pool.set_continuous(slots[0], True)
                    off = (ti * feed_n) % (len(audio) - feed_n)
                    gen_before = sum(s.n_generated for s in pool.slots)
                    t1 = time.monotonic()
                    for sidx in slots:
                        pool.feed(sidx, audio[off : off + feed_n])
                    pool.tick()
                    dt = (time.monotonic() - t1) * 1000.0
                    made = sum(s.n_generated for s in pool.slots) - gen_before
                    if rnd:
                        tick_ms.append(dt)
                        tick_tokens.append(made)
                    for sidx in slots:
                        pool.get(sidx)
                    if ti % 8 == 0:
                        log(f"{tag} round {rnd} tick {ti}/{n_ticks} "
                            f"{dt:.0f} ms ({made} tok)")
            p50l = float(np.percentile(tick_ms, 50))
            p90l = float(np.percentile(tick_ms, 90))
            # sustainable = the chip keeps up with 1x-realtime feeds
            sustain = p50l <= interval_s * 1000.0
            log(f"{tag}: p50 {p50l:.0f} / p90 {p90l:.0f} ms per "
                f"{interval_s:.1f}s feed x{n} streams "
                f"({np.mean(tick_tokens):.0f} tok/tick, "
                f"{'SUSTAINABLE' if sustain else 'OVERLOADED'}; "
                f"tick split enc {pool.encoder_ms / max(1, 2 * n_ticks):.0f}"
                f" / dec {pool.decoder_ms / max(1, 2 * n_ticks):.0f} ms avg)")
            del pool
            return {
                f"p50_token_latency_ms_under_{n}stream_load_I"
                f"{interval_s:g}": round(p50l, 1),
                f"p90_token_latency_ms_under_{n}stream_load_I"
                f"{interval_s:g}": round(p90l, 1),
                f"load_{tag}_sustainable": sustain,
            }

        def run_load_safe(tag, *a, **kw):
            """A load-config OOM must not shed the HEADLINE stream count:
            contain it, record the config as failed, free, and move on."""
            import gc

            try:
                return run_load(tag, *a, **kw)
            except Exception as e:  # noqa: BLE001 — RESOURCE_EXHAUSTED etc.
                if "RESOURCE_EXHAUSTED" not in str(e) and \
                        "Ran out of memory" not in str(e):
                    raise
                log(f"{tag}: OOM — config skipped")
                return {f"load_{tag}_sustainable": False,
                        f"load_{tag}_oom": True}
            finally:
                # settle deallocation before the next pool builds its caches
                # (async frees + the lazy server-side compile queue otherwise
                # overlap two pools' footprints)
                gc.collect()
                _ = np.asarray(jnp.zeros((1,)))
                time.sleep(2)

        ticks = int(os.environ.get("BENCH_LOAD_TICKS", "16"))
        # high-density live: window-recompute encoder (no per-stream ring).
        # The per-tick recompute re-encodes [context + chunk] where context
        # is CONSTANT (window_pad rows) — overhead per audio-second scales
        # as context/interval, so the (enc_ctx_extra, interval) pair sets
        # the sustainable density.  Two measured operating points:
        #  - throughput mode (the extra=0 default: 752-row context;
        #    transcripts carry a <=47 flips/1k truncation bound,
        #    docs/PERF.md round 4) at -I 2.0 — p50 1.7 s/feed, 32 streams;
        #  - exact mode (enc_ctx_extra=2: 2248 rows, measured
        #    transcript-exact vs ring) — UNSUSTAINABLE at 32 slots even at
        #    -I 8.0 (p50 9.33 s, round 4); its sustainable point is ~16
        #    slots x -I 8, demonstrated below.
        load_extra.update(run_load_safe(
            "load-window", load_n, 2.0, ticks,
            dec_kv_ring=1024, enc_mode="window",
            dec_kv_dtype="float8_e4m3fn",
        ))
        load_extra.update(run_load_safe(
            "load-window-exact", min(load_n, 16), 8.0, max(4, ticks // 2),
            dec_kv_ring=1024, enc_mode="window", enc_ctx_extra=2,
            dec_kv_dtype="float8_e4m3fn",
        ))
        # low-latency live: exact incremental ring encoder at a tight fp8
        # 896 cap (117 MB/stream), 8 slots (the ring-mode serving domain —
        # scheduler auto picks ring only at <=8) — the -I 0.5 responsive
        # configuration
        load_extra.update(run_load_safe(
            "load-ring", min(load_n, 8), 0.5, ticks,
            dec_kv_ring=1024, enc_mode="ring", enc_kv_ring=896,
            enc_kv_dtype="float8_e4m3fn", dec_kv_dtype="float8_e4m3fn",
        ))
        # the BASELINE.md conjunction: >=16 live streams AND p50 < 300 ms at
        # -I 0.5 on one chip.  Same fp8 ring recipe as load-ring at 16 slots
        # (1.9 GB enc rings + 0.9 GB dec rings next to the 8.9 GB weights).
        # gate_s=0.4 (0.8x the cadence) keeps encode firing EVERY tick — at
        # gate 0.5 the mel-frame lag makes it fire on alternating ticks and
        # the bimodal latency pins p50 exactly AT 300 ms (PERF round 4)
        load_extra.update(run_load_safe(
            "load-ring16", 16, 0.5, ticks, gate_s=0.4,
            dec_kv_ring=1024, enc_mode="ring", enc_kv_ring=896,
            enc_kv_dtype="float8_e4m3fn", dec_kv_dtype="float8_e4m3fn",
        ))

    total_audio = n_streams * seconds
    x_rt = total_audio / wall
    step_ms = 1000.0 * dec_s / max(steps, 1)
    extra = {
        "wall_s": round(wall, 3),
        "encode_phase_s": round(enc_s, 3),
        "decode_phase_s": round(dec_s, 3),
        "streams": n_streams,
        "audio_s_per_stream": seconds,
        "decode_steps_per_stream": steps,
        "decoder_step_ms_batched": round(step_ms, 3),
        "tokens_per_s_aggregate": round(n_streams * steps / wall, 1),
        "p50_token_latency_ms_I0.5": round(p50, 1),
        "p90_token_latency_ms_I0.5": round(p90, 1),
        **load_extra,
        # MEASURED step times for the quantized rungs (mid-clip fill).
        # No extrapolated x-realtime "estimates" here any more: a round-3
        # extrapolation hid a 3x fp8-flash collapse, and the round-4
        # step-probe "308.7x" for fp8kv ignored the encode phase entirely.
        # The throughput truth for every rung is its measured end-to-end
        # anchor (`BENCH_MODE=<rung>`), echoed as e2e_anchors_measured.
        "int8_decoder_step_ms_batched": round(int8_step_ms, 3),
        "int8_streams": n_int8,
        "int4_fp8kv_decoder_step_ms_batched": round(int4_step_ms, 3),
        "bf16w_fp8kv_decoder_step_ms_batched": round(fp8_step_ms, 3),
        "bf16w_fp8kv_streams": n_fp8,
        "pipelined_phases": pipelined,
        **mem_ledger,
        "device": str(dev),
        "weights": "real" if encoder_source.use_checkpoint else "random",
        "mode": mode,
    }
    if mode == "bf16":
        # the measured END-TO-END anchors from the last default-config
        # `BENCH_MODE=<mode>` runs on this machine (not estimates)
        anchors = load_anchors()
        if anchors:
            extra["e2e_anchors_measured"] = anchors
    result = {
        "metric": f"aggregate_x_realtime_per_chip_60s_{n_streams}streams"
                  + ("" if mode == "bf16" else f"_{mode}"),
        "value": round(x_rt, 2),
        "unit": "x_realtime",
        "vs_baseline": round(x_rt / REF_X_REALTIME, 2),
        "extra": extra,
    }
    if mode != "bf16":
        # record the measured end-to-end for bf16-mode runs to echo —
        # guarded so probe configurations cannot clobber the anchor
        try:
            record_anchor(mode, {
                "x_realtime": round(x_rt, 2), "streams": n_streams,
                "wall_s": round(wall, 3), "step_ms": round(step_ms, 3),
            })
        except Exception:
            pass
    print(json.dumps(result))


if __name__ == "__main__":
    if os.environ.get("BENCH_INNER") or os.environ.get("BENCH_NO_SUPERVISOR"):
        main()
    else:
        sys.exit(_supervised())
