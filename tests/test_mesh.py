"""Multi-chip mesh/sharding tests on the conftest's 8 virtual CPU devices.

Exercises parallel/mesh.py's param_shardings / cache_shardings /
batch_shardings through the real batched serving programs, and runs the
driver's dry run in-process.  The reference has no distributed mode
(SURVEY.md §2.12); these validate the TPU-native dp×tp scale-out design.
"""

import jax
import numpy as np
import pytest

from voxtral_tpu.parallel import serving as sv
from voxtral_tpu.parallel.mesh import (
    batch_shardings,
    cache_shardings,
    make_mesh,
    param_shardings,
    shard_params,
)
from voxtral_tpu.runtime.engine import VoxtralEngine



def _mel_batch(cfg, batch, n_frames, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((batch, n_frames, cfg.encoder.n_mel)) * 0.3).astype(
        np.float32
    )


def _run_batched(engine, mel, sharded_mesh=None):
    tr = sv.BatchedTranscriber(engine, mel.shape[0])
    if sharded_mesh is not None:
        cs = cache_shardings(sharded_mesh)
        bs = batch_shardings(sharded_mesh)
        tr.enc_cache = type(tr.enc_cache)(
            jax.device_put(tr.enc_cache.k, cs), jax.device_put(tr.enc_cache.v, cs)
        )
        tr.dec_cache = type(tr.dec_cache)(
            jax.device_put(tr.dec_cache.k, cs), jax.device_put(tr.dec_cache.v, cs)
        )
        tr.c0_tail = jax.device_put(tr.c0_tail, bs)
        tr.c1_tail = jax.device_put(tr.c1_tail, bs)
    tr.feed_mel(mel)
    tr.run_decoder()
    return tr


def test_eight_virtual_devices():
    assert len(jax.devices()) >= 8
    assert jax.devices()[0].platform == "cpu"


def test_param_shardings_tree_matches(cfg, params):
    """param_shardings must mirror the params tree exactly (same structure),
    and every sharding must divide the corresponding tensor shape."""
    mesh = make_mesh(4, 2)
    sh = param_shardings(cfg, mesh)
    # tree.map raises on structure mismatch
    def check(x, s):
        for dim, names in enumerate(s.spec):
            if names is None:
                continue
            size = np.prod([mesh.shape[n] for n in (
                (names,) if isinstance(names, str) else names)])
            assert x.shape[dim] % size == 0, (x.shape, dim, s.spec)
        return x

    jax.tree.map(check, params, sh)


def test_shard_params_roundtrip_values(cfg, params):
    mesh = make_mesh(4, 2)
    sharded = shard_params(params, param_shardings(cfg, mesh))
    w = params["decoder"]["layers"]["wqkv"]
    ws = sharded["decoder"]["layers"]["wqkv"]
    np.testing.assert_array_equal(np.asarray(w), np.asarray(ws))
    assert len(ws.sharding.device_set) == 8


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2)])
def test_sharded_batched_equals_unsharded(cfg, params, tiny_tokenizer, dp, tp):
    """The dp×tp-sharded serving step must produce exactly the tokens of the
    unsharded one (GSPMD partitioning is numerics-preserving in f32)."""
    mesh = make_mesh(dp, tp)
    eng_plain = VoxtralEngine(
        cfg, params, tokenizer=tiny_tokenizer, buckets=(16, 4, 1),
        enc_kv_ring=64, dec_kv_ring=64,
    )
    sharded = shard_params(params, param_shardings(cfg, mesh))
    eng_sh = VoxtralEngine(
        cfg, sharded, tokenizer=tiny_tokenizer, buckets=(16, 4, 1),
        enc_kv_ring=64, dec_kv_ring=64,
    )
    batch = dp * 2
    mel = _mel_batch(cfg, batch, 320)
    tr0 = _run_batched(eng_plain, mel)
    tr1 = _run_batched(eng_sh, mel, sharded_mesh=mesh)
    assert tr0.decoder_started and tr1.decoder_started
    assert tr0.tokens == tr1.tokens
    assert tr1.gen_pos == tr1.total_adapter == 40


def test_cache_sharding_layout(cfg, params):
    """cache_shardings places streams on dp and KV heads on tp."""
    mesh = make_mesh(4, 2)
    cs = cache_shardings(mesh)
    cache = sv.batched_dec_cache(cfg, 8, cap=64, sharding=cs)
    # [B, L, KH, cap, D]: B split 4-way, KH split 2-way
    shard_shape = cache.k.sharding.shard_shape(cache.k.shape)
    assert shard_shape[0] == 8 // 4
    assert shard_shape[2] == cfg.decoder.n_kv_heads // 2


@pytest.mark.parametrize("dp,tp", [(2, 4), (4, 2)])
def test_midsize_tp4_real_kv_lattice(tiny_tokenizer, dp, tp):
    """tp=4 against the flagship's REAL partition lattice (26 layers, 32 q /
    8 KV heads GQA): the tiny config's 2 KV heads can't exercise tp>2, so
    this runs mid_config — sharded tokens must equal unsharded (VERDICT r3
    weak #5)."""
    from voxtral_tpu.config import mid_config
    from voxtral_tpu.models.params import init_params

    cfg = mid_config(enc_kv_ring=64, dec_kv_ring=64)
    params = init_params(cfg, seed=0)
    mesh = make_mesh(dp, tp)
    eng_plain = VoxtralEngine(
        cfg, params, tokenizer=tiny_tokenizer, buckets=(16, 4, 1),
        enc_kv_ring=64, dec_kv_ring=64,
    )
    sharded = shard_params(params, param_shardings(cfg, mesh))
    eng_sh = VoxtralEngine(
        cfg, sharded, tokenizer=tiny_tokenizer, buckets=(16, 4, 1),
        enc_kv_ring=64, dec_kv_ring=64,
    )
    batch = dp * 2
    mel = _mel_batch(cfg, batch, 320)
    tr0 = _run_batched(eng_plain, mel)
    tr1 = _run_batched(eng_sh, mel, sharded_mesh=mesh)
    assert tr0.decoder_started and tr1.decoder_started
    assert tr0.tokens == tr1.tokens


def test_driver_dryrun_inprocess():
    """Exactly what the driver validates, on the conftest's virtual mesh."""
    from __graft_entry__ import _dryrun_impl

    _dryrun_impl(8)
