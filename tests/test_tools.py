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
