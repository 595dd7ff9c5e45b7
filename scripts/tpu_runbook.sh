#!/bin/bash
# TPU measurement runbook for the round-2 perf work. Run when the tunnel
# is healthy; logs to docs/tpu_runs/<timestamp>/. Each step is chained
# (one TPU process at a time) and individually timeout-guarded.
set -u
cd "$(dirname "$0")/.."
TS=$(date +%m%d_%H%M)
OUT=docs/tpu_runs/$TS
mkdir -p "$OUT"
log() { echo "== $*" | tee -a "$OUT/runbook.log"; }

log "0. probe"
timeout 120 python -c "
import jax, jax.numpy as jnp, time
t0=time.time(); print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()), round(time.time()-t0,1))
" >> "$OUT/runbook.log" 2>&1 || { log "tunnel down, aborting"; exit 1; }

log "1. bench suite (baseline, current defaults)"
timeout 3600 python bench.py > "$OUT/bench_default.json" 2> "$OUT/bench_default.err"
tail -1 "$OUT/bench_default.json" | tee -a "$OUT/runbook.log"

log "2. config-3 phase breakdown"
timeout 3600 python scripts/exp_config3_phases.py > "$OUT/phases.log" 2>&1
tail -20 "$OUT/phases.log" | tee -a "$OUT/runbook.log"

log "3. beam sweep on bench (l_sc / w_factor)"
for lsc in 24 32 48; do
  for wf in 16 24; do
    log "   l_sc=$lsc w_factor=$wf"
    MTS_WL_L_SC=$lsc MTS_WL_W_FACTOR=$wf timeout 3600 \
      python bench.py > "$OUT/bench_l${lsc}_w${wf}.json" 2>/dev/null
    tail -1 "$OUT/bench_l${lsc}_w${wf}.json" | tee -a "$OUT/runbook.log"
  done
done

log "4. overflow-fallback A/B (pallas packet BVH)"
MTS_OVERFLOW_FB=pallas timeout 3600 python bench.py \
  > "$OUT/bench_fb_pallas.json" 2>/dev/null
tail -1 "$OUT/bench_fb_pallas.json" | tee -a "$OUT/runbook.log"

log "done — results in $OUT"
