#!/bin/bash
# End-to-end FRAMEWORK bench: drive the load -> dedup -> curate -> split
# -> unload jobnet through the real CLI entry point (graft.runner
# .JobNetMain over bench-home/), the way a production deployment runs the
# engine — every per-query number elsewhere measures operators; this one
# measures the jobnet/runner/jobclass layer end to end (round-11 verdict
# item 8).
#
# Usage: tools/run_pipeline_bench.sh [SF_DIR]   (default /tmp/graft_sf1)
set -e
cd "$(dirname "$0")/.."

SF_DIR="${1:-/tmp/graft_sf1}"
OUT=/tmp/graft_pipeline_out
rm -rf "$OUT" spark-warehouse/pipe.db

echo "== pipeline jobnet at $SF_DIR =="
START=$(date +%s.%N)
SPARK_MASTER="local[${SPARK_GRAFT_CPUS:-32}]" \
SPARK_SHUFFLE_PARTITIONS="${SPARK_GRAFT_CPUS:-32}" \
sbt -batch "runMain graft.runner.JobNetMain --home=bench-home \
  -v sf_dir=$SF_DIR -v unload_dir=$OUT \
  bench-home/pipeline/pipeline.jobnet" > /tmp/pipeline_bench.log 2>&1 || RC=$?
RC=${RC:-0}
END=$(date +%s.%N)
WALL=$(python3 -c "print(round($END - $START, 1))")

grep -E "\[job|\[net|ERROR|error:" /tmp/pipeline_bench.log | tail -20 || true

# sanity: the unloaded train split must be non-empty and smaller than the
# raw corpus (dedup + curation filter real rows)
python3 - "$SF_DIR" "$OUT" "$WALL" <<'EOF'
import sys, glob
import pandas as pd
sf_dir, out, wall = sys.argv[1], sys.argv[2], sys.argv[3]
raw_files = glob.glob(f"{sf_dir}/documents.parquet") + \
    glob.glob(f"{sf_dir}/documents.parquet/*.parquet")
raw = sum(len(pd.read_parquet(f, columns=["doc_id"]))
          for f in raw_files if not f.endswith("_SUCCESS"))
train_files = glob.glob(f"{out}/train/*.parquet")
train = sum(len(pd.read_parquet(f, columns=["doc_id"])) for f in train_files)
assert train > 0, "pipeline produced an empty train split"
assert train < raw, f"train {train} not smaller than raw {raw}"
print(f"[pipeline] raw={raw} train={train} wall={wall}s "
      f"(jobnet: setup -> load -> dedup -> curate -> split -> unload)")
EOF
exit $RC
