#!/bin/bash
# Round-5 high-resolution validation (VERDICT r4 missing #1): the 512px
# protocol (gibson_high_resolution.json knobs: 512px sensor,
# mapping_iters=10, window=12) end-to-end on hardware. Round 4 crashed at
# action 23 with VMEM exhaustion inside the fused densify program at 1M
# capacity; the fix (split densify stages / bounded CSR working set) was
# verified by scripts/perf/repro_highres_512.py this round. This script
# produces the episode artifact + the 512px bench line the VERDICT asks for.
set -u
cd "$(dirname "$0")/.."
CACHE="${ACTIVESPLAT_COMPILE_CACHE:-$HOME/.cache/activesplat_tpu/jax_r05_hr}"

echo "=== 300-step high-res episode (512px, iters=10) ==="
# EP_CAP=1M: v5e-1 (16 GB) OOMs above ~1M gaussians at 512px with hybrid
# exact training at k=1024 — the capacity bound is the documented memory
# adaptation for this chip (the reference runs dynamic lists on a 24 GB 3090)
ACTIVESPLAT_COMPILE_CACHE="$CACHE" JAX_TRACEBACK_FILTERING=off \
  EP_NAME=r05_highres EP_STEPS=300 EP_RES=512 EP_ITERS=10 EP_WINDOW=12 \
  EP_STRIDE=20 EP_CAP=$((1<<20)) timeout 14400 python -u scripts/episode_hw.py

if [ -z "${SKIP_BENCH:-}" ]; then
  echo "=== bench @512px ==="
  ACTIVESPLAT_COMPILE_CACHE="$CACHE" \
    BENCH_RES=512 BENCH_SKIP_1M=1 BENCH_SKIP_ROOFLINE=1 \
    timeout 3600 python bench.py
fi
