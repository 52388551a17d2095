#!/bin/bash
# Round-5 definitive episode pair (VERDICT r4 item 1): the same 1000-step
# two_room protocol as r3/r4, run on the ACTUAL round-4+5 stack —
# exact_training="auto" (flips to the hybrid compositor at the k ceiling),
# incremental topdown, pano LOS cache instrumented, relay retry + IO
# counters live. One COLD run populates a dedicated fresh compile cache,
# then the identical run WARM from it (same seed => identical trajectory).
set -u
cd "$(dirname "$0")/.."
CACHE="${HOME}/.cache/activesplat_tpu/jax_r05"

if [ "${1:-}" != "warm-only" ]; then
  rm -rf "$CACHE"
  echo "=== COLD run (fresh cache at $CACHE) ==="
  ACTIVESPLAT_COMPILE_CACHE="$CACHE" EP_NAME=r05_cold EP_STEPS=1000 \
    timeout 10800 python -u scripts/episode_hw.py 2>&1 | tail -150
fi

echo "=== WARM run (reusing $CACHE) ==="
ACTIVESPLAT_COMPILE_CACHE="$CACHE" EP_NAME=r05_warm EP_STEPS=1000 \
  timeout 10800 python -u scripts/episode_hw.py 2>&1 | tail -150

echo "=== cache stats ==="
du -sh "$CACHE"; ls "$CACHE" | wc -l
