#!/bin/bash
# Round-15 verdict item 1: separate the SPILL confound from the df²
# prefix-work term in q_containment's sf60→sf100 step. The round-14
# measurement ran at a 16 g heap and logged MemoryStore evictions at
# sf100 (absent at sf60), so its 1.57 growth exponent charges shuffle
# spill I/O to the larger SF. This audit re-runs q_containment at sf60
# AND sf100 with a 32 g pinned+pretouched heap in one session; if the
# 32 g exponent returns to ~1.2 the curve is characterized (the 16 g
# step was spill), if it stays >= 1.5 the df² term dominates and the
# documented fallback (tighter df cap / grid decomposition,
# Dedup.scala) gets implemented.
#
# Prereqs: `sbt -batch compile`; /tmp/graft_sf60 and /tmp/graft_sf100
# (round-14 new-law subset corpora, documents/embeddings/customer).
#
# Produces /tmp/bench_sf60_32g.json, /tmp/bench_sf100_32g.json.
set -e
cd "$(dirname "$0")/.."

QS="q_containment"

for d in /tmp/graft_run_* /tmp/graft_stream_ckpt*; do
  [ -d "$d" ] || continue
  pid=$(cat "$d/owner.pid" 2>/dev/null || true)
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then continue; fi
  if [ -z "$pid" ] && [ -n "$(find "$d" -maxdepth 0 -mmin -120)" ]; then continue; fi
  rm -rf "$d" 2>/dev/null || true
done

export SPARK_LOCAL_DIRS=/tmp/graft_spark_scratch

for SF in sf60 sf100; do
  rm -rf "$SPARK_LOCAL_DIRS"; mkdir -p "$SPARK_LOCAL_DIRS"
  echo "== q_containment at $SF, 32g pinned heap =="
  SPARK_GRAFT_SF_DIR=/tmp/graft_$SF SPARK_GRAFT_CPUS=32 \
    SPARK_DRIVER_MEM=32g GRAFT_PRETOUCH=1 \
    SPARK_GRAFT_BENCH_DETAIL=/tmp/bench_${SF}_32g.json \
    tools/graft_java.sh graft.Bench "$QS" > /tmp/bench_${SF}_32g.log 2>&1
  grep "BENCHFAIL" /tmp/bench_${SF}_32g.log || true
  # evidence for the spill-confound adjudication: eviction lines present?
  N_EVICT=$(grep -c "MemoryStore.*evict\|spill" /tmp/bench_${SF}_32g.log || true)
  echo "[$SF] eviction/spill log lines: $N_EVICT"
  tail -1 /tmp/bench_${SF}_32g.json
done
rm -rf "$SPARK_LOCAL_DIRS"

python3 - <<'EOF'
import json, math
a = json.load(open('/tmp/bench_sf60_32g.json'))["queries"]["q_containment"]
b = json.load(open('/tmp/bench_sf100_32g.json'))["queries"]["q_containment"]
r = b / a
print(f"q_containment 32g: sf60={a:.1f}s sf100={b:.1f}s ratio={r:.2f}x "
      f"(1.67x data) exponent={math.log(r)/math.log(100/60):.2f}")
EOF
