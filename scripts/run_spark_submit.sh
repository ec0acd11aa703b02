#!/usr/bin/env bash
# Package the library as a --py-files zip and run the sketch-build job via
# spark-submit (the north rule's deployment contract).
#
#   scripts/run_spark_submit.sh [--cores N] [--rows R] [...]
#
# Extra args are forwarded to scripts/submit_sketch_job.py.
set -euo pipefail
cd "$(dirname "$0")/.."

mkdir -p dist
ZIP=dist/bloomfilter_spark.zip
# SKIP_ZIP=1 reuses an existing zip (concurrent fleet launches must not
# race on rebuilding it)
if [[ "${SKIP_ZIP:-0}" != "1" || ! -f "$ZIP" ]]; then
  rm -f "$ZIP"
  # library only — no tests, no caches
  (cd . && python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/bloomfilter_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("bloomfilter_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
EOF
  )
fi

CORES="${SPARK_GRAFT_CPUS:-32}"
ARGS=()
while [[ $# -gt 0 ]]; do
  case "$1" in
    --cores) CORES="$2"; shift 2 ;;
    *) ARGS+=("$1"); shift ;;
  esac
done

# SPARK_JVM_CPUS caps the JVM's auto-sized thread pools (GC/JIT/netty) the
# way a cluster manager's cgroup would for an executor container
JVM_OPTS=""
if [[ -n "${SPARK_JVM_CPUS:-}" ]]; then
  JVM_OPTS="-XX:ActiveProcessorCount=${SPARK_JVM_CPUS}"
fi

exec spark-submit \
  --master "local[$CORES]" \
  --conf spark.sql.shuffle.partitions="$CORES" \
  --conf spark.driver.memory="${SPARK_DRIVER_MEMORY:-16g}" \
  --conf spark.driver.extraJavaOptions="$JVM_OPTS" \
  --py-files "$ZIP" \
  scripts/submit_sketch_job.py --cores "$CORES" "${ARGS[@]}"
