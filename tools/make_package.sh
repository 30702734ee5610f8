#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit (north_rule packaging).
set -euo pipefail
cd "$(dirname "$0")/.."
out="${1:-/tmp/deepgraph_spark.zip}"
rm -f "$out"
zip -qr "$out" deepgraph_spark -x "*__pycache__*"
echo "$out"
