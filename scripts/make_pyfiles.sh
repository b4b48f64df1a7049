#!/usr/bin/env bash
# Package the engine for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/apt_bron_re_spark.zip
zip -qr dist/apt_bron_re_spark.zip apt_bron_re_spark -x '*__pycache__*'
echo "wrote dist/apt_bron_re_spark.zip"
echo "usage: spark-submit --py-files dist/apt_bron_re_spark.zip your_job.py"
