#!/bin/bash
# Unattended TPU measurement batch: waits for the axon tunnel, then runs
# the pending measurements in sequence, each logged to /tmp/tpu_*.log.
cd /root/repo
export PYTHONPATH=/root/repo
log() { echo "[tpu_batch] $(date -u +%H:%M:%S) $*" >> /tmp/tpu_batch.log; }

log "waiting for tunnel"
while true; do
  if timeout 120 python -c "import jax; assert jax.devices()[0].platform=='tpu'" >/dev/null 2>&1; then
    log "tunnel UP"
    break
  fi
  sleep 120
done

# 1. headline bench (includes blocked xor-bake, first in-context TPU run)
log "headline bench start"
BENCH_REPS=1 timeout 2400 python bench.py > /tmp/tpu_bench_headline.json 2> /tmp/tpu_bench_headline.log
log "headline bench done rc=$?"

# 2. paired-gather probe (is a [2,C]-slice gather one transaction?)
log "paired gather probe start"
timeout 1200 python scripts/bench_paired_gather.py > /tmp/tpu_paired_gather.log 2>&1
log "paired gather probe done rc=$?"

# 3. isolated encode fwd+bwd: xor vs paired variants
log "bench_hash_bwd xor start"
timeout 1800 python scripts/bench_hash_bwd.py > /tmp/tpu_hash_bwd_xor.log 2>&1
log "bench_hash_bwd xor done rc=$?"
log "bench_hash_bwd paired start"
SCENEDREAMER_HASH_VARIANT=paired timeout 1800 python scripts/bench_hash_bwd.py > /tmp/tpu_hash_bwd_paired.log 2>&1
log "bench_hash_bwd paired done rc=$?"

# 4. full GAN step bench
log "full GAN bench start"
BENCH_FULL=1 BENCH_REPS=1 timeout 3000 python bench.py > /tmp/tpu_bench_full.json 2> /tmp/tpu_bench_full.log
log "full GAN bench done rc=$?"

log "ALL DONE"
