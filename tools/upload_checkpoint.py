#!/usr/bin/env python
"""Upload a model checkpoint to the object-store registry.

Reference behavior: tmp.py:1-3 (manual `upload_model_checkpoint(...)` call).
"""

import argparse

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geoguessr_ai_tpu.data.s3 import ObjectStore


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("path", help="checkpoint file or directory")
    ap.add_argument("--store-url", default=None)
    args = ap.parse_args()
    store = ObjectStore(args.store_url)
    key = store.upload_model_checkpoint(args.path)
    print(key)


if __name__ == "__main__":
    main()
