#!/bin/bash
# Config-5 reproducibility chain (VERDICT r3 item 5): N CLEAN runs from
# scratch, no checkpoint resume, tracing on.  Done-criterion: all runs
# converge within +-1 Picard iteration of each other (Anderson m=3 pins
# the fast early-transient branch by construction; this chain is the
# evidence).
#
#   bash tools/run_config5_repro.sh [n_runs] [logdir]
#
# Each run writes .bench_state/c5_repro_<i>.log + _stages.jsonl; the
# summary table prints at the end.  State in .bench_state/ is gitignored
# scratch — the BENCH.md row is the durable artifact.
set -u
cd "$(dirname "$0")/.."
N="${1:-3}"
DIR="${2:-.bench_state}"
mkdir -p "$DIR"

for i in $(seq 1 "$N"); do
    LOG="$DIR/c5_repro_$i.log"
    echo "[repro] run $i/$N $(date -u +%FT%TZ)" | tee -a "$LOG"
    MFV2D_TPU_TRACE=1 \
    MFV2D_TPU_TRACE_FILE="$DIR/c5_repro_${i}_stages.jsonl" \
        python bench_vms.py >> "$LOG" 2>&1
    grep -h vms_nonlinear_flow_seconds "$LOG" | tail -1
    sleep 30
done

echo "[repro] summary:"
for i in $(seq 1 "$N"); do
    grep -h vms_nonlinear_flow_seconds "$DIR/c5_repro_$i.log" | tail -1 \
        | python -c "import json,sys; r=json.loads(sys.stdin.read()); print(f'  run $i: {r[\"value\"]}s  {r[\"picard_iters\"]} its  rms {r[\"solution_rms_err\"]:.2e}')"
done
