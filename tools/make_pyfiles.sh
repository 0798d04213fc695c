#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (north rule launch path).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/schemasaurus_spark.zip
zip -qr dist/schemasaurus_spark.zip schemasaurus_spark -x '*__pycache__*'
echo "dist/schemasaurus_spark.zip"
