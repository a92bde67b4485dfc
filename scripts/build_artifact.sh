#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (north rule: the identical
# artifact runs on a multi-executor cluster).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/vdf_spark.zip
zip -qr dist/vdf_spark.zip video_duplicate_finder_python_spark -x '*__pycache__*'
echo "dist/vdf_spark.zip:"
unzip -l dist/vdf_spark.zip | tail -3
