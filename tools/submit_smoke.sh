#!/bin/sh
# End-to-end evidence for the north rule's launch mode: package the engine
# as a zip, then run the build and query jobs via `spark-submit --py-files`
# from a scratch directory OUTSIDE the repo, so every import must resolve
# from the shipped zip (exactly what a cluster executor sees).
#
# Usage: sh tools/submit_smoke.sh [sf_dir]   (default /root/testdata/sf0.001)
set -e
REPO=$(cd "$(dirname "$0")/.." && pwd)
SF=${1:-/root/testdata/sf0.001}
WORK=$(mktemp -d)
trap 'rm -rf "$WORK"' EXIT

(cd "$REPO" && zip -qr "$WORK/mdse.zip" mini_distributed_search_engine_spark -x '*__pycache__*')
mkdir -p "$WORK/jobs"
cp "$REPO"/jobs/build_index_job.py "$REPO"/jobs/query_job.py "$WORK/jobs/"

cd "$WORK"
spark-submit --master 'local[8]' --py-files "$WORK/mdse.zip" \
    jobs/build_index_job.py --out "$WORK/index" --documents "$SF" --shard-span 256
spark-submit --master 'local[8]' --py-files "$WORK/mdse.zip" \
    jobs/query_job.py --index "$WORK/index" --query "spark shuffle" --k 5
echo "submit_smoke: OK"
