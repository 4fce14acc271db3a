#!/bin/bash
# CPU-vs-wall ambient validation (BENCH.md r13): run a fixed 5-query
# focused bench three times — quiet, under a synthetic 16-spinner CPU
# load, quiet again (sandwich order) — and compare how far wall vs
# executor-task CPU move. Artifacts land in bench_runs/cpuval_*.json.
set -e
cd /root/repo
export SPARK_GRAFT_ONLY=d2_minhash_lsh,d4_ngram_jaccard,x23_bm25,x18_winnowing,x11_containment
export SPARK_GRAFT_REPS=5
export SPARK_GRAFT_WARMUP=1

run() {
  SPARK_GRAFT_BENCH_OUT=/root/repo/bench_runs/cpuval_$1.json \
    sbt -batch "runMain graft.Bench" 2>&1 | tail -2
}

echo "== phase 1: quiet =="
run quiet1

echo "== phase 2: 16-spinner load =="
for i in $(seq 16); do (while :; do :; done) & done
HOGS=$(jobs -p)
run loaded
kill $HOGS 2>/dev/null || true
wait 2>/dev/null || true

echo "== phase 3: quiet =="
run quiet2
