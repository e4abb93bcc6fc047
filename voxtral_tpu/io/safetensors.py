"""Zero-copy safetensors reader: mmap -> numpy views -> HBM device arrays.

Mirror of voxtral_safetensors.c semantics (header parse :156, open :204,
bounds validation :271-281, zero-copy bf16 views :424) built on np.memmap.
TPU is bf16-native, so — unlike the reference's Metal warm-up which converts
8.4 GB of bf16 to f16 (voxtral_metal.m:111-147) — tensors stream straight
from the file pages into HBM with no format conversion.
"""

from __future__ import annotations

import json
import struct
from typing import Iterable

import ml_dtypes
import numpy as np

_DTYPES = {
    "BF16": np.dtype(ml_dtypes.bfloat16),
    "F16": np.dtype(np.float16),
    "F32": np.dtype(np.float32),
    "F64": np.dtype(np.float64),
    "I8": np.dtype(np.int8),
    "U8": np.dtype(np.uint8),
    "I16": np.dtype(np.int16),
    "I32": np.dtype(np.int32),
    "I64": np.dtype(np.int64),
    "BOOL": np.dtype(np.bool_),
}


class SafetensorsFile:
    """Read-only safetensors file backed by an OS page-cache mmap."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            header_len = struct.unpack("<Q", f.read(8))[0]
            header = json.loads(f.read(header_len))
        self._data_start = 8 + header_len
        self._meta = {k: v for k, v in header.items() if k != "__metadata__"}
        self.metadata = header.get("__metadata__", {})
        self._mm = np.memmap(path, dtype=np.uint8, mode="r")
        data_len = len(self._mm) - self._data_start
        # Bounds validation (voxtral_safetensors.c:271-281)
        for name, info in self._meta.items():
            lo, hi = info["data_offsets"]
            if not (0 <= lo <= hi <= data_len):
                raise ValueError(f"tensor {name!r}: offsets out of bounds")

    def names(self) -> Iterable[str]:
        return self._meta.keys()

    def shape(self, name: str) -> tuple[int, ...]:
        return tuple(self._meta[name]["shape"])

    def dtype(self, name: str) -> np.dtype:
        return _DTYPES[self._meta[name]["dtype"]]

    def __contains__(self, name: str) -> bool:
        return name in self._meta

    def get(self, name: str) -> np.ndarray:
        """Zero-copy numpy view of a tensor (bf16 via ml_dtypes)."""
        info = self._meta[name]
        dt = _DTYPES[info["dtype"]]
        lo, hi = info["data_offsets"]
        lo += self._data_start
        hi += self._data_start
        n = int(np.prod(info["shape"])) if info["shape"] else 1
        if hi - lo != n * dt.itemsize:
            raise ValueError(f"tensor {name!r}: size mismatch")
        return self._mm[lo:hi].view(dt).reshape(info["shape"])

    def get_f32(self, name: str) -> np.ndarray:
        """Tensor converted to float32 (copies — for norms/biases)."""
        return self.get(name).astype(np.float32)


def write_safetensors(path: str, tensors: dict[str, np.ndarray]):
    """Minimal writer (for test fixtures and weight export)."""
    inv = {v: k for k, v in _DTYPES.items()}
    meta = {}
    offset = 0
    blobs = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        blob = arr.tobytes()
        meta[name] = {
            "dtype": inv[arr.dtype],
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(blob)],
        }
        offset += len(blob)
        blobs.append(blob)
    header = json.dumps(meta).encode("utf-8")
    pad = (-len(header)) % 8
    header += b" " * pad
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(header)))
        f.write(header)
        for blob in blobs:
            f.write(blob)
