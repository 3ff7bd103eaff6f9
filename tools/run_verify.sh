#!/bin/bash
# Run graft.Verify in the warm sbt tmux session and wait for completion,
# then preflight. Usage: run_verify.sh [sfDir] [outDir]
set -u
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/vout}
tmux clear-history -t sbt
tmux send-keys -t sbt "runMain graft.Verify $SF $OUT" Enter
sleep 5
for i in $(seq 1 120); do
  last=$(tmux capture-pane -t sbt -p | grep -v '^$' | tail -1)
  case "$last" in
    *"sbt:dcosbcassandraspark>"*) break ;;
  esac
  sleep 5
done
tmux capture-pane -t sbt -pS -2000 | grep -E "\[verify\]|Compilation failed|error\] Total" | head -20
python3 "$(dirname "$0")/preflight.py" "$SF" "$OUT"
