#!/bin/sh
# Package the engine and submit a crawl to a cluster (north rule:
# spark-submit --py-files on multi-executor clusters at N and 4N
# executors). Local-mode equivalent shown last.
set -e
cd "$(dirname "$0")/.."

python -m zipfile -c /tmp/goskyr_spark.zip goskyr_spark/

# N executors
spark-submit \
  --py-files /tmp/goskyr_spark.zip \
  --num-executors "${N_EXECUTORS:-8}" --executor-cores 4 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.files.maxPartitionBytes=16m \
  scripts/crawl_job.py --workdir "$1" --pages "$2" --seeds "$3"

# single-box stand-in used by bench.py: local[8] vs local[32]
# SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py
