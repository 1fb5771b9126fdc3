#!/usr/bin/env bash
# Raw-JPEG SQLite dataset build launcher — the equivalent of the
# reference's build_sqlite_raw.slurm:1-35 driving
# create_and_upload_sqlite_from_latest_snapshot (backend/s3bucket.py:549).
# Like the reference, the file stays local by default (the reference's
# upload lines are commented out, s3bucket.py:730-753); pass --publish
# to restore the upload + _latest.json pointer behavior.
#
# Usage: build_sqlite_raw.sh <out.sqlite> [--holdout] [--publish]
#                            [--threads N]
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${1:?out sqlite path}
shift
HOLDOUT=false
PUBLISH=false
THREADS=64
while [ $# -gt 0 ]; do
  case "$1" in
    --holdout) HOLDOUT=true ;;
    --publish) PUBLISH=true ;;
    --threads) shift; THREADS=$1 ;;
    *) echo "unknown arg: $1" >&2; exit 2 ;;
  esac
  shift
done

python - "$OUT" "$HOLDOUT" "$PUBLISH" "$THREADS" <<'PY'
import sys

from geoguessr_ai_tpu.data.s3 import ObjectStore

out, holdout, publish, threads = sys.argv[1:5]
store = ObjectStore()
rows = store.build_sqlite_from_snapshot(
    out,
    holdout=holdout == "true",
    fetch_threads=int(threads),
    publish=publish == "true",
)
print(f"wrote {rows} rows -> {out}")
PY
