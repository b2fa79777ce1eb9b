#!/usr/bin/env bash
# Package lexor_spark and launch the extraction job via spark-submit
# --py-files (BASELINE.json north_rule launch contract).
#
#   scripts/submit.sh [cores] [output_dir] [extra run_extract.py args...]
#
# On a real cluster, replace --master local[N] with yarn/k8s master and
# ship the same zip; nothing else changes.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CORES="${1:-8}"; shift || true
OUT="${1:-/tmp/lexor_spark_out}"; shift || true

ZIP="$REPO/.bench/lexor_spark.zip"
mkdir -p "$REPO/.bench"
(cd "$REPO" && zip -qr "$ZIP" lexor_spark -x '*__pycache__*')

exec spark-submit \
  --master "local[$CORES]" \
  --py-files "$ZIP" \
  --conf spark.sql.shuffle.partitions="$CORES" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=2048 \
  --conf spark.driver.memory=8g \
  --conf spark.ui.enabled=false \
  "$REPO/scripts/run_extract.py" --output "$OUT" "$@"
