#!/usr/bin/env bash
# Sequential experiment batch runner (reference analog:
# tools/scripts/run_experiment_batch.sh — torchrun replaced by the JAX CLI).
# Each experiment = "name|extra --opts...". Runs under timeout, continues on
# failure, cools down between runs so the TPU/host settles.
set -uo pipefail

TIMEOUT="${TIMEOUT:-3600}"          # seconds per experiment
COOLDOWN="${COOLDOWN:-30}"          # seconds between experiments
BASE_CFG="${BASE_CFG:-configs/experiments/example_experiment.yaml}"
PYTHON="${PYTHON:-python}"
LOG_ROOT="${LOG_ROOT:-logs/batch_$(date +%Y%m%d_%H%M%S)}"
mkdir -p "$LOG_ROOT"

# Options applied to every experiment (yacs --opts pairs)
COMMON_OPTS=(
  EXPERIMENT.GROUP batch_$(date +%Y%m%d)
)

# name|opts... — one line per experiment; edit to taste
EXPERIMENTS=(
  "baseline|"
  "accum2|TRAIN.ACCUMULATION_STEPS 2"
  "no_mix|SCHEDULE.MIX.PROB.START_PROB 0.0 SCHEDULE.MIX.PROB.END_PROB 0.0"
)

status=0
for spec in "${EXPERIMENTS[@]}"; do
  name="${spec%%|*}"
  opts="${spec#*|}"
  echo "=== [$name] starting (timeout ${TIMEOUT}s) ==="
  # shellcheck disable=SC2086
  # $PYTHON unquoted on purpose: allows "env JAX_PLATFORMS=cpu python"
  if timeout "$TIMEOUT" $PYTHON -m linnaeus_tpu.train.main \
      --cfg "$BASE_CFG" \
      --opts "${COMMON_OPTS[@]}" EXPERIMENT.NAME "$name" $opts \
      > "$LOG_ROOT/$name.stdout" 2>&1; then
    echo "=== [$name] OK ==="
  else
    rc=$?
    if [ "$rc" -eq 124 ]; then
      echo "=== [$name] hit the ${TIMEOUT}s timeout (expected for capped runs) ==="
    else
      echo "=== [$name] FAILED rc=$rc (see $LOG_ROOT/$name.stdout) ==="
      status=1
    fi
  fi
  sleep "$COOLDOWN"
done
exit "$status"
