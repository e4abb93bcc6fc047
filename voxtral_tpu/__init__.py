"""voxtral_tpu: TPU-native streaming speech-to-text engine for
Voxtral-Mini-4B-Realtime (JAX/XLA/Pallas), built from scratch with the
capabilities of the C reference (antirez/voxtral.c)."""

from .config import VoxtralConfig, full_config, tiny_config  # noqa: F401

__version__ = "0.1.0"
