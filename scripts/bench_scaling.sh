#!/usr/bin/env bash
# Two-parallelism scaling evidence (BASELINE.json north rule: throughput
# scaling efficiency >= 0.8 from N to 4N executors; in-sandbox protocol =
# the identical job at local[8] vs local[32] on the same input).
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.1}"
CP="/opt/spark/jars/*:target/scala-2.13/classes"
OPENS=$(cat scripts/addopens.txt)
run() {
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$1" \
  java $OPENS -Xmx${SPARK_DRIVER_MEM:-48g} -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Bench 2>/dev/null | tail -1
}
echo "== local[8] =="
R8=$(run 8); echo "$R8"
echo "== local[32] =="
R32=$(run 32); echo "$R32"
python3 - "$R8" "$R32" <<'EOF'
import json, sys
r8, r32 = json.loads(sys.argv[1]), json.loads(sys.argv[2])
t8, t32 = r8["fv_rows_per_sec"], r32["fv_rows_per_sec"]
eff = (t32 / t8) / (32 / 8)
print(f"fv rows/sec @8 cores:  {t8:.0f}")
print(f"fv rows/sec @32 cores: {t32:.0f}")
print(f"scaling efficiency (8 -> 32 cores): {eff:.3f}")
EOF
