#!/usr/bin/env python
"""Dump safetensors tensor names/shapes/dtypes + per-prefix summaries
(inspect_weights.c analog).

Usage: python tools/inspect_weights.py model_dir_or_file [--prefix P]
"""

from __future__ import annotations

import os
import sys


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from voxtral_tpu.io.safetensors import SafetensorsFile

    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 1
    path = sys.argv[1]
    if os.path.isdir(path):
        path = os.path.join(path, "consolidated.safetensors")
    prefix = None
    if "--prefix" in sys.argv:
        prefix = sys.argv[sys.argv.index("--prefix") + 1]

    sf = SafetensorsFile(path)
    totals: dict[str, tuple[int, int]] = {}
    n_shown = 0
    for name in sorted(sf.names()):
        shape = sf.shape(name)
        dtype = sf.dtype(name)
        numel = 1
        for s in shape:
            numel *= s
        nbytes = numel * dtype.itemsize
        top = name.split(".")[0]
        c, b = totals.get(top, (0, 0))
        totals[top] = (c + numel, b + nbytes)
        if prefix is None or name.startswith(prefix):
            print(f"{name:80s} {str(dtype):10s} {str(list(shape)):24s} "
                  f"{nbytes / 1e6:10.2f} MB")
            n_shown += 1
    print(f"\n{n_shown} tensors shown. Prefix summary:", file=sys.stderr)
    gp = gb = 0
    for top, (numel, nbytes) in sorted(totals.items()):
        print(f"  {top:40s} {numel / 1e6:10.1f} M params "
              f"{nbytes / 1e9:8.2f} GB", file=sys.stderr)
        gp += numel
        gb += nbytes
    print(f"  {'TOTAL':40s} {gp / 1e6:10.1f} M params {gb / 1e9:8.2f} GB",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
