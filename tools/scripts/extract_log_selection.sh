#!/usr/bin/env bash
# Extract line ranges from one experiment's logs into a selections dir for
# sharing/bug reports (reference analog: tools/scripts/extract_log_selection.sh).
# Usage: extract_log_selection.sh <experiment_output_dir> [out_dir]
#   env: MAIN_RANGE=start:end  H5_RANGE=start:end  METRICS_RANGE=start:end
set -euo pipefail

EXP_DIR="${1:?usage: extract_log_selection.sh <experiment_output_dir> [out_dir]}"
OUT_DIR="${2:-$EXP_DIR/selections}"
mkdir -p "$OUT_DIR"

extract() {
  local src="$1" range="$2" dst="$3"
  [ -f "$src" ] || { echo "skip: $src not found"; return; }
  local start="${range%%:*}" end="${range##*:}"
  sed -n "${start},${end}p" "$src" > "$dst"
  echo "wrote $dst ($(wc -l < "$dst") lines from $src [$start,$end])"
}

extract "$EXP_DIR/logs/main_p0.log"   "${MAIN_RANGE:-1:100000}"    "$OUT_DIR/main_selection.log"
extract "$EXP_DIR/logs/h5data_p0.log" "${H5_RANGE:-1:100000}"      "$OUT_DIR/h5data_selection.log"
extract "$EXP_DIR/logs/metrics.jsonl" "${METRICS_RANGE:-1:100000}" "$OUT_DIR/metrics_selection.jsonl"
