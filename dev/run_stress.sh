#!/bin/bash
# Generates sf1 (10x) + sf10 (100x) from sf0.1, then runs ScaleStress at each scale.
set -x
CP="/opt/spark/jars/*:/root/repo/target/scala-2.13/classes"
cd /root/repo
J="java -XX:+IgnoreUnrecognizedVMOptions --add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED -Xmx96g -cp $CP"
[ -d dev/sf1/lineitem.parquet ]  || $J graft.GenScale /root/testdata/sf0.1 dev/sf1 10   2>&1 | tail -12
[ -d dev/sf10/lineitem.parquet ] || $J graft.GenScale /root/testdata/sf0.1 dev/sf10 100 2>&1 | tail -12
$J graft.queries.ScaleStress /root/testdata/sf0.1 2 2>dev/stress_sf01.err | tail -1 > dev/stress_sf01.json
$J graft.queries.ScaleStress dev/sf1  2 2>dev/stress_sf1.err  | tail -1 > dev/stress_sf1.json
$J graft.queries.ScaleStress dev/sf10 2 2>dev/stress_sf10.err | tail -1 > dev/stress_sf10.json
echo DONE
