#!/usr/bin/env python
"""Duplicate dataset SQLite files so parallel jobs read separate copies.

Reference behavior (training/duplicate_sqlites.py): copy each
``dataset_sqlite*.sqlite`` next to the repo with a ``_2`` infix, avoiding
reader lock contention between concurrently running jobs.
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
from typing import List


def duplicate_files(
    search_dir: str, infix: str = "_2", dry_run: bool = False
) -> List[str]:
    out = []
    for path in sorted(
        glob.glob(os.path.join(search_dir, "dataset_sqlite*.sqlite"))
    ):
        base, ext = os.path.splitext(path)
        if base.endswith(infix):
            continue
        dst = f"{base}{infix}{ext}"
        if os.path.exists(dst):
            continue
        if not dry_run:
            shutil.copy2(path, dst)
        out.append(dst)
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dir", default=os.path.dirname(os.getcwd()))
    ap.add_argument("--infix", default="_2")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()
    created = duplicate_files(args.dir, args.infix, args.dry_run)
    for p in created:
        print(p)


if __name__ == "__main__":
    main()
