#!/usr/bin/env bash
# Launch the pipeline the way a cluster would: package the engine as a zip
# and ship it with --py-files (north rule launch shape). Locally the master
# is local[N]; on a real cluster swap in --master yarn/k8s + executor conf.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${SPARK_SUBMIT_MASTER:-local[8]}"
ZIP="$(mktemp -d)/openaip_yaixm_to_geojson_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" openaip_yaixm_to_geojson_spark -x '*__pycache__*')
exec spark-submit --master "$MASTER" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --py-files "$ZIP" \
  "$REPO/tools/submit_job.py" "$@"
