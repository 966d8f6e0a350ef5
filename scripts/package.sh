#!/usr/bin/env bash
# Build the --py-files archive for spark-submit deployment.
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f equi7grid_spark.zip
# include package code + data artifacts (extracted at runtime by
# equi7grid_spark/data_loader.py when imported from the zip)
zip -qr equi7grid_spark.zip equi7grid_spark -x '*__pycache__*'
echo "built equi7grid_spark.zip ($(du -h equi7grid_spark.zip | cut -f1))"
