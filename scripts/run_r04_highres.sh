#!/bin/bash
# High-resolution hardware validation (VERDICT r3 item 4): bench.py at
# 512x512 plus a 300-step episode with the ported gibson_high_resolution
# protocol knobs (512px sensor, mapping_iters=10, window=12 — see
# configs/datasets/gibson_high_resolution.json) on the synthetic scene.
set -u
cd "$(dirname "$0")/.."

if [ -z "${SKIP_BENCH:-}" ]; then
  echo "=== bench @512px ==="
  BENCH_RES=512 BENCH_SKIP_1M=1 BENCH_SKIP_ROOFLINE=1 \
    timeout 3600 python bench.py
fi

echo "=== 300-step high-res episode ==="
JAX_TRACEBACK_FILTERING=off \
  EP_NAME=r04_highres EP_STEPS=300 EP_RES=512 EP_ITERS=10 EP_WINDOW=12 \
  EP_STRIDE=20 timeout 10800 python -u scripts/episode_hw.py 2>&1
