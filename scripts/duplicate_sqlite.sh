#!/usr/bin/env bash
# SQLite duplication launcher — the equivalent of the reference's
# duplicate-sqlite.slurm (CPU job running training/duplicate_sqlites.py).
#
# Usage: duplicate_sqlite.sh [--dir DIR] [--infix _2] [--dry-run]
set -euo pipefail
cd "$(dirname "$0")/.."

python tools/duplicate_sqlites.py "$@"
