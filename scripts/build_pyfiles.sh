#!/usr/bin/env bash
# Package the library for spark-submit --py-files (north rule: the job
# ships to a multi-executor cluster as a zip).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/ddsketch_ruby_spark.zip
zip -qr dist/ddsketch_ruby_spark.zip ddsketch_ruby_spark -x '*__pycache__*'
echo "dist/ddsketch_ruby_spark.zip"
