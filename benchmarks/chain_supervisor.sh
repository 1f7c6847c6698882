#!/bin/bash
# Wait for the PID in /tmp/queue_supervisor.pid to exit, then start a fresh
# queue supervisor (it runs only steps whose completion predicate fails).
# Detach with: nohup bash benchmarks/chain_supervisor.sh & disown
set -u
cd "$(dirname "$0")/.."
prev=$(cat /tmp/queue_supervisor.pid 2>/dev/null || echo "")
if [ -n "$prev" ]; then
  while kill -0 "$prev" 2>/dev/null; do sleep 120; done
fi
nohup python benchmarks/queue_supervisor.py >> benchmarks/logs/queue_supervisor.log 2>&1 &
echo $! > /tmp/queue_supervisor.pid
echo "[chain] started follow-up supervisor pid $(cat /tmp/queue_supervisor.pid)"
