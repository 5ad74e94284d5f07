#!/usr/bin/env bash
# Package logzoom_spark and run the pipeline via spark-submit --py-files —
# the cluster launch path required by the north rule. On a real cluster,
# replace --master local[*] with your cluster master / k8s / yarn URL.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${1:-/tmp/logzoom_submit_out}"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.001}"
CPUS="${SPARK_GRAFT_CPUS:-8}"

ZIP="$(mktemp -d)/logzoom_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" logzoom_spark -x '*__pycache__*')

exec spark-submit \
  --master "local[$CPUS]" \
  --py-files "$ZIP" \
  --conf spark.sql.shuffle.partitions="$CPUS" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  "$REPO/scripts/submit_job.py" --sf-dir "$SF_DIR" --out-dir "$OUT"
