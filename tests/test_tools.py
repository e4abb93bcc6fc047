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
