#!/bin/bash
# Round-4 episode pair (VERDICT r3 item 1): one COLD 1000-step run that
# populates a dedicated fresh compile cache, then the identical run WARM
# from that cache. Same seed => identical trajectory => the warm run is a
# pure cache-hit replay; the two wall-clocks bracket compile overhead.
set -u
cd "$(dirname "$0")/.."
CACHE="${HOME}/.cache/activesplat_tpu/jax_r04"

if [ "${1:-}" != "warm-only" ]; then
  rm -rf "$CACHE"
  echo "=== COLD run (fresh cache at $CACHE) ==="
  ACTIVESPLAT_COMPILE_CACHE="$CACHE" EP_NAME=r04_cold EP_STEPS=1000 \
    timeout 10800 python -u scripts/episode_hw.py 2>&1 | tail -120
fi

echo "=== WARM run (reusing $CACHE) ==="
ACTIVESPLAT_COMPILE_CACHE="$CACHE" EP_NAME=r04_warm EP_STEPS=1000 \
  timeout 10800 python -u scripts/episode_hw.py 2>&1 | tail -120

echo "=== cache stats ==="
du -sh "$CACHE"; ls "$CACHE" | wc -l
