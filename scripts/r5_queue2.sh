#!/bin/bash
# Round-5 follow-on queue: fixed MaterialNet training + photo->materials
# end-to-end, after bench2 releases the TPU. Same ledger/stage discipline
# as r5_queue.sh, tighter deadline (TPU must be free for the driver).
cd /root/repo || exit 1
export PYTHONPATH=/root/.axon_site:/root/repo
Q=runs/r5_queue
mkdir -p "$Q"
DEADLINE_EPOCH=${DEADLINE_EPOCH:-1787272200}

log() { echo "[queue2] $*" | tee -a "$Q/queue.log"; }

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

# wait for bench2 (or any python TPU client we know by pid file) to exit
if [ -n "$WAIT_PID" ]; then
  log "waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 15; done
fi
log "TPU free, queue2 starting $(date -u '+%H:%M:%S')"

stage matnet2 2100 300 python scripts/train_matnet_device.py \
  runs/matnet_r5 --tuples 128 --steps 2500 --batch 4 --time-budget 600

stage photo_e2e2 1500 300 python -m materialist_tpu.cli.inverse \
  --img_inverse_path /root/reference/examples/indoor2.png \
  --save_name photo_e2e --opt_src a --opt_order rm a --opt_env_from 2 \
  --model_name pos_mlp --save_path runs \
  --weights runs/matnet_r5/matnet_scratch.npz \
  --num_epochs 60 --frame_every 0

# TPU-marked suite (r3 artifact: 762s for 4 tests; now more) — only
# worth starting with full headroom, a partial run writes no artifact
stage tpu_tests 1800 1300 python scripts/run_tpu_tests.py

log "QUEUE2 COMPLETE $(date -u '+%H:%M:%S')"
