#!/bin/sh
# Compile the Catalyst extension against the bundled pyspark jars.
# Produces jvmext/aqo-spark-extension.jar (committed so tests don't need
# a JDK at runtime; re-run this after editing the Java source).
set -e
cd "$(dirname "$0")"
JARS=$(python -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), 'jars'))")
rm -rf build && mkdir -p build
javac -proc:none -encoding UTF-8 -cp "$JARS/*" -d build src/org/aqo/spark/LearnedJoinExtensions.java
jar cf aqo-spark-extension.jar -C build .
rm -rf build
echo "built $(pwd)/aqo-spark-extension.jar"
