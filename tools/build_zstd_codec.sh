#!/bin/sh
# Compiles the bakerspark.ZstdJniCodec Hadoop codec against the pyspark
# jars already on this machine and drops the (tiny) jar into
# baker_spark/jars/ where session.get_spark picks it up. Rerun after
# editing tools/java/bakerspark/ZstdJniCodec.java.
set -e
cd "$(dirname "$0")/.."
PYSPARK_JARS=$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "jars"))')
BUILD=/tmp/bakerspark_codec_build
rm -rf "$BUILD" && mkdir -p "$BUILD" baker_spark/jars
javac -encoding UTF-8 -cp "$PYSPARK_JARS/*" -d "$BUILD" tools/java/bakerspark/ZstdJniCodec.java
jar cf baker_spark/jars/bakerspark-zstd-codec.jar -C "$BUILD" bakerspark
echo "built baker_spark/jars/bakerspark-zstd-codec.jar"
