#!/usr/bin/env bash
# spark-submit deployment (north rule: "run via spark-submit --py-files on a
# multi-executor cluster"). Packages the engine as a zip and submits the
# flagship pipeline; MASTER defaults to the local stand-in, point it at a
# real cluster (yarn / k8s / spark://...) unchanged.
#
#   MASTER=spark://host:7077 EXECUTORS=8 bash scripts/submit_job.sh
set -euo pipefail
cd "$(dirname "$0")/.."

MASTER="${MASTER:-local[8]}"
N_IMAGES="${SPARK_GRAFT_SCALE_IMAGES:-1024}"

ZIP=/tmp/data_model_spark.zip
rm -f "$ZIP"
python -c "
import shutil, zipfile, pathlib
with zipfile.ZipFile('$ZIP', 'w', zipfile.ZIP_DEFLATED) as z:
    for p in pathlib.Path('data_model_spark').rglob('*.py'):
        z.write(p, p)
print('packaged', '$ZIP')
"

exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-64}" \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=256 \
  scripts/flagship_job.py "$N_IMAGES"
