"""Safetensors round-trip + checkpoint-layout loading, WAV parse, tokenizer."""

import base64
import json

import numpy as np

from voxtral_tpu.config import tiny_config
from voxtral_tpu.io.safetensors import SafetensorsFile, write_safetensors
from voxtral_tpu.io.wav import load_wav, parse_wav_bytes, resample_linear, write_wav
from voxtral_tpu.tokenizer import TekkenTokenizer


def test_safetensors_roundtrip(tmp_path):
    import ml_dtypes

    path = str(tmp_path / "t.safetensors")
    tensors = {
        "a": np.arange(12, dtype=np.float32).reshape(3, 4),
        "b": (np.arange(6) * 0.5).astype(ml_dtypes.bfloat16).reshape(2, 3),
        "c": np.array([7], dtype=np.int64),
    }
    write_safetensors(path, tensors)
    sf = SafetensorsFile(path)
    assert set(sf.names()) == {"a", "b", "c"}
    np.testing.assert_array_equal(sf.get("a"), tensors["a"])
    np.testing.assert_array_equal(
        sf.get("b").astype(np.float32), tensors["b"].astype(np.float32)
    )
    assert sf.shape("b") == (2, 3)
    assert "a" in sf and "zz" not in sf


def _torch_layout_checkpoint(cfg, rng):
    """Build a synthetic consolidated.safetensors in the *reference's* tensor
    naming/layout (torch [out,in] Linear, conv [C_out,C_in,K])."""
    import ml_dtypes

    e, d = cfg.encoder, cfg.decoder
    bf = ml_dtypes.bfloat16
    t = {}

    def r(*shape):
        return (rng.standard_normal(shape) * 0.1).astype(np.float32)

    p = "mm_streams_embeddings.embedding_module.whisper_encoder"
    t[f"{p}.conv_layers.0.conv.weight"] = r(e.dim, e.n_mel, 3).astype(bf)
    t[f"{p}.conv_layers.0.conv.bias"] = r(e.dim)
    t[f"{p}.conv_layers.1.conv.weight"] = r(e.dim, e.dim, 3).astype(bf)
    t[f"{p}.conv_layers.1.conv.bias"] = r(e.dim)
    for i in range(e.n_layers):
        lp = f"{p}.transformer.layers.{i}"
        t[f"{lp}.attention_norm.weight"] = r(e.dim)
        t[f"{lp}.attention.wq.weight"] = r(e.qkv_dim, e.dim).astype(bf)
        t[f"{lp}.attention.wq.bias"] = r(e.qkv_dim)
        t[f"{lp}.attention.wk.weight"] = r(e.qkv_dim, e.dim).astype(bf)
        t[f"{lp}.attention.wv.weight"] = r(e.qkv_dim, e.dim).astype(bf)
        t[f"{lp}.attention.wv.bias"] = r(e.qkv_dim)
        t[f"{lp}.attention.wo.weight"] = r(e.dim, e.qkv_dim).astype(bf)
        t[f"{lp}.attention.wo.bias"] = r(e.dim)
        t[f"{lp}.ffn_norm.weight"] = r(e.dim)
        t[f"{lp}.feed_forward.w1.weight"] = r(e.hidden, e.dim).astype(bf)
        t[f"{lp}.feed_forward.w2.weight"] = r(e.dim, e.hidden).astype(bf)
        t[f"{lp}.feed_forward.w2.bias"] = r(e.dim)
        t[f"{lp}.feed_forward.w3.weight"] = r(e.hidden, e.dim).astype(bf)
    t[f"{p}.transformer.norm.weight"] = r(e.dim)

    mm = "mm_streams_embeddings.embedding_module"
    t[f"{mm}.audio_language_projection.0.weight"] = r(
        cfg.adapter_hidden, 4 * e.dim
    ).astype(bf)
    t[f"{mm}.audio_language_projection.2.weight"] = r(
        d.dim, cfg.adapter_hidden
    ).astype(bf)
    t[f"{mm}.tok_embeddings.weight"] = r(d.vocab_size, d.dim).astype(bf)
    t["norm.weight"] = r(d.dim)
    for i in range(d.n_layers):
        lp = f"layers.{i}"
        t[f"{lp}.attention_norm.weight"] = r(d.dim)
        t[f"{lp}.attention.wq.weight"] = r(d.q_dim, d.dim).astype(bf)
        t[f"{lp}.attention.wk.weight"] = r(d.kv_dim, d.dim).astype(bf)
        t[f"{lp}.attention.wv.weight"] = r(d.kv_dim, d.dim).astype(bf)
        t[f"{lp}.attention.wo.weight"] = r(d.dim, d.q_dim).astype(bf)
        t[f"{lp}.ffn_norm.weight"] = r(d.dim)
        t[f"{lp}.feed_forward.w1.weight"] = r(d.hidden, d.dim).astype(bf)
        t[f"{lp}.feed_forward.w2.weight"] = r(d.dim, d.hidden).astype(bf)
        t[f"{lp}.feed_forward.w3.weight"] = r(d.hidden, d.dim).astype(bf)
        t[f"{lp}.ada_rms_norm_t_cond.0.weight"] = r(d.ada_dim, d.dim).astype(bf)
        t[f"{lp}.ada_rms_norm_t_cond.2.weight"] = r(d.dim, d.ada_dim).astype(bf)
    return t


def test_load_params_layout(tmp_path):
    """Checkpoint in reference layout -> our pytree: shapes + transposes."""
    from voxtral_tpu.models.params import load_params

    cfg = tiny_config(compute_dtype="float32").replace(param_dtype="float32")
    rng = np.random.default_rng(0)
    tensors = _torch_layout_checkpoint(cfg, rng)
    write_safetensors(str(tmp_path / "consolidated.safetensors"), tensors)
    params = load_params(str(tmp_path), cfg)

    e, d = cfg.encoder, cfg.decoder
    lp = params["decoder"]["layers"]
    assert lp["wqkv"].shape == (d.n_layers, d.q_dim + 2 * d.kv_dim, d.dim)
    # native [out, in] layout is preserved (zero-transpose load)
    wq_t = tensors["layers.0.attention.wq.weight"].astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(lp["wqkv"][0, : d.q_dim, :]), wq_t, atol=1e-6
    )
    # encoder merged bias: k segment must be zero
    be = np.asarray(params["encoder"]["layers"]["bqkv"][0])
    np.testing.assert_array_equal(
        be[e.qkv_dim : 2 * e.qkv_dim], np.zeros(e.qkv_dim, np.float32)
    )
    # conv im2col layout: W_mat[k*C_in + c, o] == conv_w[o, c, k]
    cw = tensors[
        "mm_streams_embeddings.embedding_module.whisper_encoder"
        ".conv_layers.0.conv.weight"
    ].astype(np.float32)
    got = np.asarray(params["encoder"]["conv0_w"]).reshape(3, e.n_mel, e.dim)
    np.testing.assert_allclose(got[2, 1, :], cw[:, 1, 2], atol=1e-6)
    assert params["decoder"]["tok_embeddings"].shape == (d.vocab_size, d.dim)


def test_loader_agrees_with_independent_oracle_mapping(tmp_path):
    """models/params.py and tools/fidelity_check.py map the checkpoint to
    the engine tree with two independently written readers; they must agree
    exactly (a bug in either shows up as a mismatch)."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
    )
    import jax
    from fidelity_check import oracle_tree_from_checkpoint

    from voxtral_tpu.models.params import load_params

    cfg = tiny_config(compute_dtype="float32").replace(param_dtype="float32")
    rng = np.random.default_rng(1)
    tensors = _torch_layout_checkpoint(cfg, rng)
    write_safetensors(str(tmp_path / "consolidated.safetensors"), tensors)

    a = load_params(str(tmp_path), cfg)
    b = oracle_tree_from_checkpoint(
        str(tmp_path), n_enc=cfg.encoder.n_layers, n_dec=cfg.decoder.n_layers
    )
    flat_a = jax.tree.leaves_with_path(a)
    flat_b = dict(jax.tree.leaves_with_path(b))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf, dtype=np.float32), flat_b[path],
            atol=1e-6, err_msg=str(path),
        )


def test_wav_roundtrip(tmp_path):
    path = str(tmp_path / "t.wav")
    samples = (np.sin(np.arange(8000) * 0.01) * 0.5).astype(np.float32)
    write_wav(path, samples, 16000)
    got = load_wav(path)
    np.testing.assert_allclose(got, samples, atol=1e-4)


def test_wav_stereo_downmix():
    import struct

    pcm = np.zeros((100, 2), dtype="<i2")
    pcm[:, 0] = 1000
    pcm[:, 1] = 3000
    body = pcm.tobytes()
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 16000, 64000, 4, 16)
        + b"data" + struct.pack("<I", len(body)) + body
    )
    samples, rate = parse_wav_bytes(hdr)
    assert rate == 16000
    np.testing.assert_allclose(samples, np.full(100, 2000 / 32768.0), atol=1e-6)


def test_resample_linear():
    x = np.arange(100, dtype=np.float32)
    y = resample_linear(x, 8000, 16000)
    assert len(y) == 200
    np.testing.assert_allclose(y[:10], np.arange(10) * 0.5, atol=1e-5)


def test_tokenizer_decode_and_classify(tmp_path):
    vocab = [{"token_bytes": base64.b64encode(b).decode()} for b in
             [b"\x00", b"Hello", b" world", b"\xc3\xa9", b"\xc3", b"\xa9"]]
    data = {
        "config": {"default_num_special_tokens": 1000},
        "vocab": vocab,
        "special_tokens": [{"rank": 0}, {"rank": 1}, {"rank": 2}],
    }
    path = str(tmp_path / "tekken.json")
    with open(path, "w") as f:
        json.dump(data, f)
    tok = TekkenTokenizer.load(path)
    assert tok.decode(1001) == "Hello"
    assert tok.decode_seq([1001, 1002]) == "Hello world"
    # split UTF-8 reassembles in decode_seq
    assert tok.decode_seq([1004, 1005]) == "é"
    assert tok.decode(1) == ""  # special
    assert tok.classify(2) == tok.TOK_EOS
    assert tok.classify(5) == tok.TOK_CONTROL
    assert tok.classify(1000) == tok.TOK_INVALID  # NUL byte
    assert tok.classify(1001) == tok.TOK_TEXT
