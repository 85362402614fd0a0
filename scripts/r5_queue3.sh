#!/bin/bash
# Round-5 extended queue: the driver heartbeat shows long runway, so
# finish the evidence list — TPU-marked suite (warm retry), then a
# longer-budget indoor full-budget rerun (task-2 floor: beat r2 on all
# four maps), then photo_e2e to completion.
cd /root/repo || exit 1
export PYTHONPATH=/root/.axon_site:/root/repo
Q=runs/r5_queue
mkdir -p "$Q"
DEADLINE_EPOCH=${DEADLINE_EPOCH:-1787287800}   # 2026-08-21 04:50 UTC

log() { echo "[queue3] $*" | tee -a "$Q/queue.log"; }

stage() {
  name=$1; tmo=$2; min=$3; shift 3
  if [ -f "$Q/$name.done" ]; then log "$name: already done, skip"; return; fi
  now=$(date +%s)
  remain=$((DEADLINE_EPOCH - now))
  if [ "$remain" -lt "$min" ]; then log "$name: SKIPPED, ${remain}s < ${min}s needed"; return; fi
  [ "$tmo" -gt "$remain" ] && tmo=$remain
  sleep 90
  log "$name START $(date -u '+%H:%M:%S') (timeout ${tmo}s)"
  timeout "$tmo" "$@" > "$Q/$name.log" 2>&1
  rc=$?
  log "$name END rc=$rc $(date -u '+%H:%M:%S')"
  [ $rc -eq 0 ] && touch "$Q/$name.done"
}

log "queue3 start $(date -u '+%H:%M:%S'), deadline $(date -u -d @$DEADLINE_EPOCH '+%H:%M:%S')"

# 1. TPU-marked suite — cold attempt hit 18 min; this retry rides the
#    warmed remote-compile + .jax_cache entries
stage tpu_tests2 2400 1500 python scripts/run_tpu_tests.py

# 2. longer full-budget indoor rerun: 70-min budget-split optimization.
#    The 45-min split run scored 20.49/12.64/8.49/7.52; the analysis's
#    monotone-in-iterations claim predicts all four maps improve.
stage indoor_b 4800 3000 python scripts/run_inverse_parity.py indoor \
  --epochs 2000 --spp 64 --chunk 8 --trace-every 8 --time-budget 4200 \
  --out runs/parity_indoor_r5b

# 3. photo_e2e to completion (the 25-min slot was killed mid loop-2)
stage photo_e2e3 2700 1500 python -m materialist_tpu.cli.inverse \
  --img_inverse_path /root/reference/examples/indoor2.png \
  --save_name photo_e2e --opt_src a --opt_order rm a --opt_env_from 2 \
  --model_name pos_mlp --save_path runs \
  --weights runs/matnet_r5/matnet_scratch.npz \
  --num_epochs 60 --frame_every 0

log "QUEUE3 COMPLETE $(date -u '+%H:%M:%S')"
