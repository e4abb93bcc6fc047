"""Test harness: force the CPU backend with 8 virtual devices so sharding
tests run anywhere, and keep the real TPU free for benchmarks."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# Oracle-parity tests pin the pure-Python mel (the native C++ mel agrees to
# ~2e-4, enough to flip argmax on random tiny models); test_native.py
# covers the native path explicitly.
os.environ["VOXTRAL_NO_NATIVE"] = "1"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The container's sitecustomize force-registers the TPU tunnel backend and
# overrides JAX_PLATFORMS; the config update below wins.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"


import numpy as np  # noqa: E402
import pytest  # noqa: E402

from voxtral_tpu.config import tiny_config  # noqa: E402
from voxtral_tpu.models.params import init_params  # noqa: E402
from voxtral_tpu.tokenizer import TekkenTokenizer  # noqa: E402


@pytest.fixture(scope="session")
def cfg():
    return tiny_config()


@pytest.fixture(scope="session")
def params(cfg):
    return init_params(cfg, seed=0)


@pytest.fixture(scope="session")
def params_np(params):
    """Host float32 copies for the torch oracle."""
    import jax

    return jax.tree.map(lambda x: np.asarray(x, dtype=np.float32), params)


@pytest.fixture(scope="session")
def tiny_tokenizer():
    """256 single-byte tokens at ids 1000.. (covers classify/decode paths).
    Token 1000 is the NUL byte, like real Tekken."""
    toks = [bytes([i]) for i in range(256)]
    return TekkenTokenizer(toks, 1000)


@pytest.fixture(scope="session")
def engine(cfg, params, tiny_tokenizer):
    from voxtral_tpu.runtime.engine import VoxtralEngine

    return VoxtralEngine(
        cfg, params, tokenizer=tiny_tokenizer, buckets=(16, 4, 1),
        enc_kv_ring=64, dec_kv_ring=64,
    )


def make_audio(seconds: float, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = int(seconds * 16000)
    t = np.arange(n) / 16000.0
    tone = 0.3 * np.sin(2 * np.pi * 440.0 * t) * np.sin(2 * np.pi * 3.0 * t)
    noise = 0.05 * rng.standard_normal(n)
    return (tone + noise).astype(np.float32)
