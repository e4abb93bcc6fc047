#!/usr/bin/env python
"""Download the Voxtral-Mini-4B-Realtime checkpoint from Hugging Face
(download_model.sh analog: consolidated.safetensors, tekken.json,
params.json).

Usage: python tools/download_model.py [dest_dir]
"""

from __future__ import annotations

import os
import sys
import urllib.request

REPO = "mistralai/Voxtral-Mini-4B-Realtime-2602"
FILES = ["consolidated.safetensors", "tekken.json", "params.json"]


def main():
    dest = sys.argv[1] if len(sys.argv) > 1 else "voxtral-model"
    os.makedirs(dest, exist_ok=True)
    base = f"https://huggingface.co/{REPO}/resolve/main"
    for name in FILES:
        out = os.path.join(dest, name)
        if os.path.exists(out):
            print(f"{name}: already present", file=sys.stderr)
            continue
        url = f"{base}/{name}"
        print(f"downloading {url} -> {out}", file=sys.stderr)

        def hook(blocks, bs, total, _last=[0]):
            done = blocks * bs
            if done - _last[0] > 100 * 1024 * 1024:
                _last[0] = done
                print(f"  {done / 1e9:.1f} / {total / 1e9:.1f} GB",
                      file=sys.stderr)

        urllib.request.urlretrieve(url, out, reporthook=hook)
    print("done", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
