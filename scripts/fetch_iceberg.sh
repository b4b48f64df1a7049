#!/usr/bin/env bash
# Fetch the Apache Iceberg Spark runtime jar and run the env-gated
# Iceberg tests (tests/test_iceberg_optional.py) for real.
#
# This sandbox has NO network (DNS resolution itself is blocked — the
# exact blocked command is the curl below), so the two Iceberg tests
# skip here; on any machine with Maven Central access this script is
# the one-command validation the tests document.
#
# Coordinates: PySpark in this repo is 4.1.x (Scala 2.13).  As of
# Iceberg 1.10.x the newest published Spark runtime line is
# iceberg-spark-runtime-4.0_2.13 (Spark 4.0); pass a different
# version/artifact as $1/$2 when an exact 4.1 runtime ships.
set -euo pipefail

ICEBERG_VERSION="${1:-1.10.0}"
ARTIFACT="${2:-iceberg-spark-runtime-4.0_2.13}"
BASE="https://repo1.maven.org/maven2/org/apache/iceberg"
URL="$BASE/$ARTIFACT/$ICEBERG_VERSION/$ARTIFACT-$ICEBERG_VERSION.jar"
DEST="${3:-/tmp/$ARTIFACT-$ICEBERG_VERSION.jar}"

echo "fetching $URL"
curl -fSL -o "$DEST" "$URL"
# integrity: Maven Central publishes a .sha1 next to every artifact
curl -fsSL -o "$DEST.sha1" "$URL.sha1"
echo "$(cat "$DEST.sha1")  $DEST" | sha1sum -c -

export SPARK_ICEBERG_JAR="$DEST"
echo "SPARK_ICEBERG_JAR=$SPARK_ICEBERG_JAR"
exec python -m pytest tests/test_iceberg_optional.py -v
