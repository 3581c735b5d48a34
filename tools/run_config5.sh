#!/bin/bash
# BASELINE config-5 runner with a relay-crash retry chain.
#
# Relaunches bench_vms.py (64x64 p=8 +2 fine, Anderson m=3 default) up to
# $MAX_ATTEMPTS times, resuming from the per-Picard-iteration checkpoint on
# every retry.  State lives in .bench_state/ (gitignored scratch): commit
# nothing from there — the BENCH.md row is the durable artifact.
#
#   bash tools/run_config5.sh [logfile]
#
# Success = the bench JSON line ("vms_nonlinear_flow_seconds") lands in the
# log; the chain exits 0 as soon as it appears.
set -u
cd "$(dirname "$0")/.."
mkdir -p .bench_state
LOG="${1:-.bench_state/vms64_c5.log}"
CKPT=.bench_state/vms64_c5_ckpt.npz
STAGES="${LOG%.log}_stages.jsonl"
MAX_ATTEMPTS="${MAX_ATTEMPTS:-8}"

for attempt in $(seq 1 "$MAX_ATTEMPTS"); do
    echo "[chain] attempt $attempt/$MAX_ATTEMPTS $(date -u +%FT%TZ)" >> "$LOG"
    MFV2D_TPU_VMS_CKPT="$CKPT" \
    MFV2D_TPU_TRACE=1 \
    MFV2D_TPU_TRACE_FILE="$STAGES" \
        python bench_vms.py >> "$LOG" 2>&1
    if grep -q vms_nonlinear_flow_seconds "$LOG"; then
        echo "[chain] success on attempt $attempt $(date -u +%FT%TZ)" >> "$LOG"
        exit 0
    fi
    echo "[chain] attempt $attempt died without a result; retrying in 60 s" >> "$LOG"
    sleep 60
done
echo "[chain] exhausted $MAX_ATTEMPTS attempts" >> "$LOG"
exit 1
