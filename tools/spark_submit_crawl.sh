#!/usr/bin/env bash
# Package the engine and run a crawl via spark-submit --py-files
# (BASELINE.json north_rule submission shape). Extra args pass through to
# tools/run_crawl.py, e.g.:
#   tools/spark_submit_crawl.sh --store /tmp/crawl_store --rounds 4
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/dwcs.zip
zip -qr dist/dwcs.zip distributed_web_crawler_spark -x '*__pycache__*'
exec spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-8}]" \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_CPUS:-8}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --py-files dist/dwcs.zip \
  tools/run_crawl.py "$@"
