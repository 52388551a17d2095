#!/bin/bash
# Round-5 widened hermetic batch protocol (VERDICT r4 weak #7 / next #8):
# gibson_small means over >=3 scenes (mock habitat sim) and ALL THREE
# synthetic_big scenes, one set per process (XLA:CPU in-process compile
# accumulation segfaults — see CLAUDE.md), nice'd so a concurrent TPU
# episode keeps the single host core when it needs it. Repetitions stay at
# 1: one 150-step run costs 30-60 min on this 1-core host (recorded in the
# artifact's protocol block) — the budget goes to scene coverage first.
set -u
cd "$(dirname "$0")/.."

for SET in gibson_small synthetic_big; do
  echo "=== batch set: $SET ==="
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu BATCH_SETS="$SET" \
    BATCH_MAX_RUNS=3 nice -n 19 \
    timeout 14400 python -u scripts/run_batch_protocol.py
done
