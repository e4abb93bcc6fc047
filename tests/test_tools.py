"""Smoke tests for the developer tools on a tiny fixture checkpoint."""

import subprocess
import sys
import os

import numpy as np

from voxtral_tpu.config import tiny_config
from voxtral_tpu.io.safetensors import write_safetensors
from test_io import _torch_layout_checkpoint

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_inspect_weights(tmp_path):
    cfg = tiny_config()
    tensors = _torch_layout_checkpoint(cfg, np.random.default_rng(0))
    path = tmp_path / "consolidated.safetensors"
    write_safetensors(str(path), tensors)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "inspect_weights.py"),
         str(tmp_path)],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-500:]
    assert "tok_embeddings.weight" in out.stdout
    assert "TOTAL" in out.stderr


def test_runtest_skips_without_model():
    out = subprocess.run(
        ["bash", os.path.join(REPO, "tools", "runtest.sh")],
        capture_output=True, text=True, timeout=60,
        env={**os.environ, "VOXTRAL_MODEL_DIR": ""},
    )
    assert out.returncode == 0
    assert "SKIP" in out.stderr


def test_make_fake_ckpt_matches_loader_layout(tmp_path):
    """tools/make_fake_ckpt.py must emit exactly the tensor names/shapes/
    dtypes the loader consumes (the synthetic-checkpoint tool and
    load_params must never drift apart — the tool is how every full-size
    drive on this machine gets its weights)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_fake_ckpt as mk

    cfg = tiny_config()
    specs = mk.tensor_specs(cfg)
    tensors = _torch_layout_checkpoint(cfg, np.random.default_rng(0))
    spec_names = {name for name, _, _ in specs}
    assert spec_names == set(tensors)
    for name, shape, dt in specs:
        assert tensors[name].shape == shape, name
        assert tensors[name].dtype == np.dtype(dt), name

    # and the written file round-trips through the real loader
    mk.write_streaming(
        str(tmp_path / "consolidated.safetensors"), specs, seed=0
    )
    from voxtral_tpu.models.params import load_params

    params = load_params(str(tmp_path), cfg)
    d = cfg.decoder
    assert params["decoder"]["layers"]["wqkv"].shape == (
        d.n_layers, d.q_dim + 2 * d.kv_dim, d.dim
    )


def test_make_fake_ckpt_tekken_roundtrip(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_fake_ckpt as mk

    from voxtral_tpu.tokenizer import TekkenTokenizer

    mk.write_tekken(str(tmp_path / "tekken.json"), 2000, n_special=1000)
    tok = TekkenTokenizer.load(str(tmp_path / "tekken.json"))
    assert tok.vocab_size == 2000
    # byte-fallback range + word-like tokens decode cleanly
    assert tok.token_bytes(1000 + 65) == b"A"
    assert tok.decode(1990).startswith(" ")


def test_make_golden_fingerprint_gating(tmp_path):
    """`check` must SKIP (not FAIL) fixtures recorded on another checkpoint
    or against a renamed/wrong-content wav (ADVICE r4: synthetic fixtures
    were hard-FAILing real-checkpoint runtest.sh runs)."""
    import json
    import types

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_golden as mg

    cfg = tiny_config()
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    tensors = _torch_layout_checkpoint(cfg, np.random.default_rng(0))
    write_safetensors(str(ckpt / "consolidated.safetensors"), tensors)
    fp = mg.weights_fingerprint(str(ckpt))
    assert fp == mg.weights_fingerprint(str(ckpt))  # stable

    ckpt2 = tmp_path / "ckpt2"
    ckpt2.mkdir()
    tensors2 = _torch_layout_checkpoint(cfg, np.random.default_rng(1))
    write_safetensors(str(ckpt2 / "consolidated.safetensors"), tensors2)
    assert mg.weights_fingerprint(str(ckpt2)) != fp

    fixdir = tmp_path / "golden"
    fixdir.mkdir()
    wavdir = tmp_path / "wavs"
    wavdir.mkdir()
    (wavdir / "clip.wav").write_bytes(b"RIFF-not-really-the-same-audio")

    def write_fixture(name, **kw):
        fx = {"name": name, "engine": "voxtral_tpu", "quant": "bf16",
              "token_ids": [1, 2, 3], "text": "abc", **kw}
        with open(fixdir / f"{name}.engine.json", "w") as f:
            json.dump(fx, f)

    # fixture recorded on ANOTHER checkpoint -> fingerprint SKIP
    write_fixture("clip", weights_fingerprint="0" * 64,
                  audio_sha256="1" * 64)
    args = types.SimpleNamespace(
        fixtures=str(fixdir), model_dir=str(ckpt), quant="bf16",
        wav_dir=str(wavdir), min_ratio=0.9, names=[],
    )
    assert mg.cmd_check(args) == 0  # SKIP, not FAIL (and no engine load)

    # right checkpoint, WRONG wav content -> audio SKIP
    write_fixture("clip", weights_fingerprint=fp, audio_sha256="1" * 64)
    assert mg.cmd_check(args) == 0
