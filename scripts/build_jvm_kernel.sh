#!/usr/bin/env bash
# Build equi7grid_spark/jvm/equi7-kernel.jar from the Java sources.
# The jar is checked in (tiny); rebuild whenever jvm/src changes.
set -euo pipefail
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
SRC="$ROOT/equi7grid_spark/jvm/src"
OUT="$ROOT/equi7grid_spark/jvm"
SPARK_JARS="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "jars"))')"
TMP="$(mktemp -d)"
javac -cp "$SPARK_JARS/*" -d "$TMP" "$SRC"/equi7/*.java
cp -r "$ROOT/equi7grid_spark/jvm/resources/equi7/." "$TMP/equi7/"
jar cf "$OUT/equi7-kernel.jar" -C "$TMP" equi7
rm -rf "$TMP"
echo "built $OUT/equi7-kernel.jar"
