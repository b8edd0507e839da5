#!/usr/bin/env bash
# Build degenter-spark-ext.jar with the Scala compiler that ships inside
# pyspark's own jars directory (no separate Scala toolchain needed).
#
#   bash degenter_clickhouse_spark/jvm/build_jvm.sh
set -euo pipefail

HERE="$(cd "$(dirname "$0")" && pwd)"
JARS="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "jars"))')"
CP="$(ls "$JARS"/*.jar | tr '\n' ':')"
OUT="$HERE/build/classes"
rm -rf "$OUT" && mkdir -p "$OUT"

java -cp "$JARS/scala-compiler-2.13.17.jar:$JARS/scala-library-2.13.17.jar:$JARS/scala-reflect-2.13.17.jar" \
  scala.tools.nsc.Main \
  -classpath "$CP" \
  -d "$OUT" \
  "$HERE"/src/*.scala

jar cf "$HERE/degenter-spark-ext.jar" -C "$OUT" .
echo "built: $HERE/degenter-spark-ext.jar"
