"""StreamPool v2: FULL transcript equality with VoxStream (per slot),
restart-mid-pool, alt tokens, flush/finish, join/leave churn, and the
window-recompute encoder mode."""

import numpy as np

from conftest import make_audio
from voxtral_tpu.parallel.scheduler import StreamPool
from voxtral_tpu.runtime.stream import VoxStream


def run_voxstream(engine, audio, chunk_s=0.5, interval=0.25,
                  continuous=False, n_alt=0, cutoff=0.0):
    s = VoxStream(engine)
    s.set_processing_interval(interval)
    s.set_continuous(continuous)
    if n_alt:
        s.set_alt(n_alt, cutoff)
    step = int(chunk_s * 16000)
    for i in range(0, len(audio), step):
        s.feed(audio[i : i + step])
    s.finish()
    return s.get_alt() if n_alt else [(t,) for t in s.get()]


def drive_pool(pool, audios, chunk_s=0.5, interval=0.25, continuous=False,
               n_alt=0, cutoff=0.0):
    """Feed each slot its own audio in lockstep chunks, tick after each
    round, finish each slot."""
    slots = []
    for a in audios:
        i = pool.add_stream()
        pool.set_processing_interval(i, interval)
        pool.set_continuous(i, continuous)
        if n_alt:
            pool.set_alt_cutoff(i, cutoff)
        slots.append(i)
    step = int(chunk_s * 16000)
    n = max(len(a) for a in audios)
    for off in range(0, n, step):
        for i, a in zip(slots, audios):
            if off < len(a):
                pool.feed(i, a[off : off + step])
        pool.tick()
    for i in slots:
        pool.finish(i)
    if n_alt:
        return [pool.get_alt(i) for i in slots]
    return [[(t,) for t in pool.get(i)] for i in slots]


def test_pool_full_equality(engine):
    """Ring-mode pool == VoxStream, FULL transcript, two different streams
    (one shorter — drains early and rides along)."""
    a = make_audio(2.4, seed=1)
    b = make_audio(1.7, seed=2)
    ref_a = run_voxstream(engine, a)
    ref_b = run_voxstream(engine, b)
    pool = StreamPool(engine, 3, dec_kv_ring=64, enc_mode="ring")
    got_a, got_b = drive_pool(pool, [a, b])
    assert got_a == ref_a
    assert got_b == ref_b


def test_pool_restart_mid_pool(params, tiny_tokenizer):
    """Continuous mode with a KV ring smaller than the window: streams hit
    ring-overflow full resets (and, with random weights, nontext-streak and
    EOS restarts) mid-pool; transcripts must STILL equal VoxStream's."""
    from voxtral_tpu.config import tiny_config
    from voxtral_tpu.runtime.engine import VoxtralEngine

    cfg = tiny_config(dec_window=96, dec_kv_ring=64)
    eng = VoxtralEngine(
        cfg, params, tokenizer=tiny_tokenizer, buckets=(16, 4, 1),
        enc_kv_ring=64, dec_kv_ring=64,
    )
    a = make_audio(4.5, seed=7)
    b = make_audio(4.5, seed=8)
    ref_a = run_voxstream(eng, a, continuous=True)
    ref_b = run_voxstream(eng, b, continuous=True)
    pool = StreamPool(eng, 2, dec_kv_ring=64, enc_mode="ring")
    got_a, got_b = drive_pool(pool, [a, b], continuous=True)
    assert sum(s.n_restarts for s in pool.slots) > 0, "no restart exercised"
    assert got_a == ref_a
    assert got_b == ref_b


def test_pool_parked_slot_near_ring_cap(params, tiny_tokenizer):
    """A slot that PARKS (backlog 0) near the ring cap while another slot
    keeps bursting must not have its ride-along garbage writes wrap past the
    cap onto real low-position rows — the resumed (pre-overflow) decodes
    attend those slots.  The burst length is clamped to every rider's
    headroom (scheduler._tick_decoder); transcripts must equal VoxStream
    exactly through the pause/resume and the eventual overflow restart."""
    from voxtral_tpu.config import tiny_config
    from voxtral_tpu.runtime.engine import VoxtralEngine

    cfg = tiny_config(dec_window=96, dec_kv_ring=64)
    eng = VoxtralEngine(
        cfg, params, tokenizer=tiny_tokenizer, buckets=(16, 4, 1),
        enc_kv_ring=64, dec_kv_ring=64,
    )
    a = make_audio(3.6, seed=61)
    b = make_audio(10.0, seed=62)

    pool = StreamPool(eng, 2, dec_kv_ring=64, enc_mode="ring")
    ia = pool.add_stream()
    ib = pool.add_stream()
    for i in (ia, ib):
        pool.set_processing_interval(i, 0.25)
        pool.set_continuous(i, True)
    step = 8000
    b_feeds = []   # b's exact feed schedule, for the schedule-matched ref

    def feed_b(chunk):
        b_feeds.append(chunk)
        pool.feed(ib, chunk)

    # phase 1: feed both for 2.0 s — both reach dec_pos near cap 64
    for off in range(0, 32000, step):
        pool.feed(ia, a[off : off + step])
        feed_b(b[off : off + step])
        pool.tick()
    # phase 2a: a pauses (parks near the cap); b alone crosses the cap and
    # takes the overflow FULL reset (dec_pos back to 0 => big headroom)
    off_b = 32000
    while pool.slots[ib].n_restarts == 0:
        feed_b(b[off_b : off_b + step])
        pool.tick()
        off_b += step
    parked = pool.slots[ia].dec_pos
    headroom_a = pool.dec_ring - parked
    assert 0 < headroom_a < 16, (parked, "a must park just below the cap")
    # a's low ring slots hold REAL rows (positions 0..15) that its resumed
    # pre-overflow decodes will attend; only a wrapped parked write can
    # touch them (a's parked ride-alongs land at parked..parked+t-1)
    low_k_before = np.asarray(pool.dec_cache.k[ia][:, :, :16])
    # phase 2b: one BIG feed gives restarted b a bucket-sized burst backlog
    # (t=16 > a's parked headroom — the wrap hazard)
    big = 4 * 16000
    feed_b(b[off_b : off_b + big])
    pool.tick()
    off_b += big
    np.testing.assert_array_equal(
        np.asarray(pool.dec_cache.k[ia][:, :, :16]), low_k_before,
        err_msg="parked ride-along write wrapped past the ring cap onto "
                "real low-position rows",
    )
    # phase 3: a resumes (its pre-overflow decodes attend low ring slots),
    # then both finish
    for off in range(32000, len(a), step):
        pool.feed(ia, a[off : off + step])
        if off_b < len(b):
            feed_b(b[off_b : off_b + step])
            off_b += step
        pool.tick()
    pool.finish(ia)
    while off_b < len(b):
        feed_b(b[off_b : off_b + step])
        pool.tick()
        off_b += step
    pool.finish(ib)
    got_a = [(t,) for t in pool.get(ia)]
    got_b = [(t,) for t in pool.get(ib)]

    # refs: a's schedule is uniform (the pause only delays feeds, which
    # cannot move its cap-exact restart point); b restarts repeatedly with
    # ring 64 over 10 s, and restart drops depend on the feed partition, so
    # its ref must REPLAY the pool's exact schedule.
    ref_a = run_voxstream(eng, a, continuous=True)
    sb = VoxStream(eng)
    sb.set_processing_interval(0.25)
    sb.set_continuous(True)
    for chunk in b_feeds:
        sb.feed(chunk)
    sb.finish()
    ref_b = [(t,) for t in sb.get()]
    assert got_a == ref_a
    assert got_b == ref_b


def test_pool_parked_rider_wrap_at_cap_ge_window(engine):
    """cap >= window (dec_kv_ring 64 >= dec window 48, the 'size the ring
    to the clip' configuration): an ACTIVE slot's wrap writes are exactly
    ring-correct, but a PARKED rider's garbage write at logical dec_pos+j
    displaces logical dec_pos+j-cap — still inside the window the slot
    attends after it resumes once j >= cap-window+1.  The burst clamp must
    bound t by max(cap - dec_pos, cap - window + 1) for parked riders;
    transcripts must equal VoxStream through the pause/resume."""
    cap, window = 64, engine.cfg.decoder.window
    assert cap >= window
    a = make_audio(6.5, seed=71)
    b = make_audio(8.0, seed=72)

    pool = StreamPool(engine, 2, dec_kv_ring=cap, enc_mode="ring")
    ia = pool.add_stream()
    ib = pool.add_stream()
    for i in (ia, ib):
        pool.set_processing_interval(i, 0.25)
        pool.set_continuous(i, False)
    step = 8000
    b_feeds = []

    def feed_b(chunk):
        b_feeds.append(chunk)
        pool.feed(ib, chunk)

    # phase 1: feed both 4.5 s -> both park with dec_pos ~56 (> window 48,
    # so the parked-rider threshold is cap-window+1 = 17 < exact-burst max)
    for off in range(0, 72000, step):
        pool.feed(ia, a[off : off + step])
        feed_b(b[off : off + step])
        pool.tick()
    d = pool.slots[ia].dec_pos
    # d > window makes the parked-rider threshold cap-window+1 = 17 (< the
    # 24-row exact burst below); d may already sit past the cap — the
    # displacement threshold j >= cap-window+1 is the same either way
    assert d > window, (d, "a must park above the window length")
    assert pool.slots[ia].backlog == 0

    # a's live window rows sit at slots (d-window+1 .. d-1) % cap; a parked
    # ride-along burst of t rows writes slots (d .. d+t-1) % cap, and any
    # j >= cap-window+1 displaces an in-window row.  Snapshot the displace-
    # able range before b's big burst.
    live = np.arange(max(d - window + 1, 0), d) % cap
    k_before = np.asarray(pool.dec_cache.k[ia][:, :, live])

    # phase 2: b alone gets a 24-row backlog (18..31 decodes as ONE exact
    # burst if unclamped — t=24 > 17, the wrap hazard for parked a)
    big = 24 * 8 * 160  # 24 rows = 192 mel frames = 1.92 s
    feed_b(b[72000 : 72000 + big])
    pool.tick()
    np.testing.assert_array_equal(
        np.asarray(pool.dec_cache.k[ia][:, :, live]), k_before,
        err_msg="parked ride-along write displaced in-window rows "
                "(cap >= window burst clamp missing)",
    )

    # phase 3: a resumes; both finish; full equality vs VoxStream
    off_b = 72000 + big
    for off in range(72000, len(a), step):
        pool.feed(ia, a[off : off + step])
        if off_b < len(b):
            feed_b(b[off_b : off_b + step])
            off_b += step
        pool.tick()
    pool.finish(ia)
    while off_b < len(b):
        feed_b(b[off_b : off_b + step])
        pool.tick()
        off_b += step
    pool.finish(ib)
    got_a = [(t,) for t in pool.get(ia)]
    got_b = [(t,) for t in pool.get(ib)]

    ref_a = run_voxstream(engine, a)   # a's schedule is uniform 0.5 s chunks
    sb = VoxStream(engine)             # b's ref replays the exact schedule
    sb.set_processing_interval(0.25)
    for chunk in b_feeds:
        sb.feed(chunk)
    sb.finish()
    ref_b = [(t,) for t in sb.get()]
    assert got_a == ref_a
    assert got_b == ref_b


def test_pool_alt_tokens(engine):
    """Pool alt-token queues equal VoxStream's (n_alt=3, loose cutoff)."""
    a = make_audio(2.0, seed=11)
    ref = run_voxstream(engine, a, n_alt=3, cutoff=0.9)
    pool = StreamPool(engine, 2, dec_kv_ring=64, enc_mode="ring", n_alt=3)
    (got,) = drive_pool(pool, [a], n_alt=3, cutoff=0.9)
    assert got == ref


def test_pool_flush_midstream(engine):
    """flush() forces a full pass and leaves the slot open for more audio;
    the final transcript equals VoxStream with the same flush point."""
    a = make_audio(1.2, seed=13)
    b = make_audio(1.0, seed=14)

    s = VoxStream(engine)
    s.set_processing_interval(0.25)
    s.feed(a)
    s.flush()
    mid_ref = len(s.get_alt(0))  # don't drain; just mark the point
    s.feed(b)
    s.finish()
    ref = [(t,) for t in s.get()]

    pool = StreamPool(engine, 2, dec_kv_ring=64, enc_mode="ring")
    i = pool.add_stream()
    pool.set_processing_interval(i, 0.25)
    pool.feed(i, a)
    pool.tick()
    pool.flush(i)
    assert not pool.slots[i].finished
    pool.feed(i, b)
    pool.tick()
    pool.finish(i)
    got = [(t,) for t in pool.get(i)]
    assert got == ref


def test_pool_join_leave_churn(engine):
    """Slots join at different times and leave; each transcript equals its
    own VoxStream run."""
    a = make_audio(2.2, seed=21)
    b = make_audio(1.6, seed=22)
    ref_a = run_voxstream(engine, a)
    ref_b = run_voxstream(engine, b)

    pool = StreamPool(engine, 2, dec_kv_ring=64, enc_mode="ring")
    ia = pool.add_stream()
    pool.set_processing_interval(ia, 0.25)
    step = 8000
    # stream a alone for 1s
    for off in range(0, 16000, step):
        pool.feed(ia, a[off : off + step])
        pool.tick()
    # b joins
    ib = pool.add_stream()
    pool.set_processing_interval(ib, 0.25)
    off_b = 0
    for off in range(16000, len(a), step):
        pool.feed(ia, a[off : off + step])
        if off_b < len(b):
            pool.feed(ib, b[off_b : off_b + step])
            off_b += step
        pool.tick()
    pool.finish(ia)
    got_a = [(t,) for t in pool.get(ia)]
    pool.close(ia)
    # a's slot is reusable while b continues
    ic = pool.add_stream()
    assert ic == ia
    pool.close(ic)
    while off_b < len(b):
        pool.feed(ib, b[off_b : off_b + step])
        pool.tick()
        off_b += step
    pool.finish(ib)
    got_b = [(t,) for t in pool.get(ib)]
    assert got_a == ref_a
    assert got_b == ref_b


def test_pool_finish_bypasses_interval_gate(engine):
    """A finish() with less pending mel than the processing interval must
    still flush everything (VoxStream's finished bypass, stream.py:190)."""
    a = make_audio(2.3, seed=41)
    ref = run_voxstream(engine, a, chunk_s=2.3, interval=2.0)
    pool = StreamPool(engine, 1, dec_kv_ring=64, enc_mode="ring")
    i = pool.add_stream()
    pool.set_processing_interval(i, 2.0)
    pool.feed(i, a[:32000])
    pool.tick()
    pool.feed(i, a[32000:])   # 0.3 s < the 2.0 s interval
    pool.tick()
    pool.finish(i)
    got = [(t,) for t in pool.get(i)]
    assert got == ref


def test_pool_window_mode_tracks_ring(engine):
    """Window-recompute encoder mode (the high-density serving path) broadly
    tracks ring mode — different reduction order can flip near-ties on
    random tiny weights, so this is an agreement bound, not equality."""
    a = make_audio(2.0, seed=31)
    # continuous: restarts fire on random weights, covering window-mode
    # slot resets (n_ctx writability, xwin masking)
    pool_r = StreamPool(engine, 2, dec_kv_ring=64, enc_mode="ring")
    (ref,) = drive_pool(pool_r, [a], continuous=True)
    pool_w = StreamPool(engine, 2, dec_kv_ring=64, enc_mode="window")
    (got,) = drive_pool(pool_w, [a], continuous=True)
    assert len(got) > 0
    m = min(len(ref), len(got))
    agree = sum(x == y for x, y in zip(ref[:m], got[:m])) / max(m, 1)
    assert agree >= 0.6, (agree, ref, got)


def test_pool_cache_overrides(engine):
    """Per-pool KV geometry/storage overrides (high-density live configs):
    fp8 ring caches + a tight encoder cap still produce transcripts that
    broadly track the exact pool."""
    import jax.numpy as jnp

    a = make_audio(1.8, seed=51)
    pool = StreamPool(engine, 2, dec_kv_ring=64, enc_mode="ring")
    (ref,) = drive_pool(pool, [a])
    pool8 = StreamPool(
        engine, 2, dec_kv_ring=64, enc_mode="ring", enc_kv_ring=48,
        enc_kv_dtype="float8_e4m3fn", dec_kv_dtype="float8_e4m3fn",
    )
    assert pool8.enc_cache.k.dtype == jnp.dtype("float8_e4m3fn")
    assert pool8.dec_cache.k.dtype == jnp.dtype("float8_e4m3fn")
    assert pool8.enc_cache.k.shape[3] == 48
    (got,) = drive_pool(pool8, [a])
    assert len(got) > 0
    m = min(len(ref), len(got))
    agree = sum(x == y for x, y in zip(ref[:m], got[:m])) / max(m, 1)
    assert agree >= 0.5, (agree, ref, got)


def test_pool_no_decode_watchdog(engine):
    """Cause-4 watchdog: a continuous slot fed >20 s of audio that never
    decodes (queue starved by a tiny row ring is hard to fake, so starve by
    silence: random weights DO decode — instead verify the counter wiring
    by feeding with decoding disabled via an inactive decoder)."""
    from voxtral_tpu.config import STREAM_MAX_NO_DECODE_SAMPLES

    pool = StreamPool(engine, 1, dec_kv_ring=64, enc_mode="ring")
    i = pool.add_stream()
    pool.set_continuous(i, True)
    s = pool.slots[i]
    s.real_samples_fed = STREAM_MAX_NO_DECODE_SAMPLES + 1
    s.last_decode_sample = 0
    pool._maybe_restart(i)
    assert pool.slots[i].n_restarts == 1


def test_pool_print_stats(engine, capsys):
    """print_stats emits the parser-compatible pool metric lines
    (voxtral.c:1306-1317 contract) plus per-slot summaries at verbose 2."""
    from voxtral_tpu.runtime import stream as stream_mod

    a = make_audio(1.2, seed=71)
    pool = StreamPool(engine, 2, dec_kv_ring=64, enc_mode="ring")
    drive_pool(pool, [a])
    old = stream_mod.verbose
    stream_mod.verbose = 2
    try:
        pool.print_stats()
    finally:
        stream_mod.verbose = old
    err = capsys.readouterr().err
    assert "Encoder:" in err and "mel ->" in err
    assert "slot 0:" in err
    assert "Memory:" in err and "GiB resident" in err


def test_memory_ledger(engine):
    """Shape-derived HBM ledger (vox_metal_memory_used analog): engine-level
    weight bytes match the real arrays; pool-level adds the pool's caches;
    per-stream cache formulas match the actual batched cache arrays."""
    import jax

    led = engine.memory_ledger()
    want_dec = int(sum(
        x.nbytes for x in jax.tree.leaves(engine.params["decoder"])
    ))
    assert led["params_decoder"] == want_dec
    assert led["params_total"] >= (
        led["params_decoder"] + led["params_encoder"] + led["params_adapter"]
    )

    pool = StreamPool(engine, 3, dec_kv_ring=64, enc_mode="ring")
    pled = pool.memory_ledger()
    # the per-stream formula at the POOL's ring geometry matches its arrays
    cfg = engine.cfg
    per = (2 * cfg.decoder.n_layers * cfg.decoder.n_kv_heads * 64
           * cfg.decoder.head_dim * pool.dec_cache.k.dtype.itemsize)
    assert pled["pool_dec_cache"] == 3 * per
    assert pled["total_resident"] == pled["params_total"] + pled["pool_total"]
    # window mode accounts xwin instead of an encoder KV ring
    pool_w = StreamPool(engine, 3, dec_kv_ring=64, enc_mode="window")
    pled_w = pool_w.memory_ledger()
    assert "pool_xwin" in pled_w and "pool_enc_cache" not in pled_w


def test_pool_monitor_symbol_stream(engine, capsys):
    """--monitor emits the per-slot symbol stream from the pool (VERDICT r4
    weak #7): encoder chunks, prefill, decode classification, and the
    restart cause/scope pairs — slot-prefixed, one line per tick."""
    from voxtral_tpu.config import STREAM_MAX_NO_DECODE_SAMPLES
    from voxtral_tpu.runtime import stream as stream_mod

    stream_mod.monitor = True
    try:
        pool = StreamPool(engine, 2, dec_kv_ring=64, enc_mode="ring")
        drive_pool(pool, [make_audio(1.2, seed=3), make_audio(1.2, seed=4)],
                   continuous=True)
        err = capsys.readouterr().err
        assert "0:" in err and "1:" in err       # slot prefixes
        assert "▶" in err                        # encoder chunk
        assert "·" in err                        # prefill
        assert any(c in err for c in "▪▸✗✘▫▹◦")  # a decode symbol

        # restart path: trip the no-decode watchdog directly (cause 4) and
        # the EOS cause (1); both must emit their cause+scope symbols
        capsys.readouterr()
        pool.close(0)
        i = pool.add_stream()
        pool.set_continuous(i, True)
        s = pool.slots[i]
        s.real_samples_fed = STREAM_MAX_NO_DECODE_SAMPLES + 1
        pool._maybe_restart(i)
        s2 = pool.slots[i]
        s2.eos_seen = True
        s2.decoder_started = True
        pool._maybe_restart(i)
        pool._mon_flush()
        err = capsys.readouterr().err
        assert "⌚" in err                        # no-decode cause
        assert "↺" in err                        # EOS cause
        assert "♻" in err or "✂" in err          # reset scope
    finally:
        stream_mod.monitor = False


def test_pool_monitor_off_accumulates_nothing(engine):
    """With --monitor off, ticks must not grow per-slot symbol state."""
    pool = StreamPool(engine, 1, dec_kv_ring=64, enc_mode="ring")
    drive_pool(pool, [make_audio(1.0, seed=5)])
    assert all(not s.syms for s in pool.slots)
