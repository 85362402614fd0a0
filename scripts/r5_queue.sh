#!/bin/bash
# Round-5 TPU work queue: strictly sequential (one TPU process at a time),
# survives builder-session death (launch under nohup). Each stage logs to
# runs/r5_queue/<stage>.log; queue.log is the ledger. Stages marked .done
# are skipped on relaunch.
#
# DEADLINE-GUARDED: the driver runs bench.py + dryrun at round end and
# needs the TPU free; every stage's timeout is clamped to the remaining
# time before DEADLINE_EPOCH, and stages with <300s remaining are skipped.
cd /root/repo || exit 1
export PYTHONPATH=/root/.axon_site:/root/repo
Q=runs/r5_queue
mkdir -p "$Q"

# Hard stop (UTC epoch). Default: 2026-08-21 00:35 UTC.
DEADLINE_EPOCH=${DEADLINE_EPOCH:-1787272500}

log() { echo "[queue] $*" | tee -a "$Q/queue.log"; }

stage() {
  name=$1; tmo=$2; shift 2
  if [ -f "$Q/$name.done" ]; then log "$name: already done, skip"; return; fi
  now=$(date +%s)
  remain=$((DEADLINE_EPOCH - now))
  if [ "$remain" -lt 300 ]; then log "$name: SKIPPED, ${remain}s to deadline"; return; fi
  [ "$tmo" -gt "$remain" ] && tmo=$remain
  # cool-down between TPU clients: connecting while the previous lease
  # is still releasing can wedge the new client on the tunnel forever
  # (r5: two wedges, CPU frozen at ~20 s, futex wait on the reply)
  sleep 90
  log "$name START $(date -u '+%H:%M:%S') (timeout ${tmo}s)"
  timeout "$tmo" "$@" > "$Q/$name.log" 2>&1
  rc=$?
  log "$name END rc=$rc $(date -u '+%H:%M:%S')"
  [ $rc -eq 0 ] && touch "$Q/$name.done"
}

log "queue (re)start $(date -u '+%H:%M:%S'), deadline $(date -u -d @$DEADLINE_EPOCH '+%H:%M:%S')"

# 1. forward-parity artifact: both fixtures + interval_frac ladder +
#    thick synthetic + brightness ratios (VERDICT task 5). Writes
#    runs/forward_parity_r5.json — STATUS.md cites it.
stage fwdparity 3000 python scripts/run_forward_parity.py

# 2. MaterialNet reduced checkpoint trained on self-rendered data
#    (VERDICT task 4, part 1)
stage matnet 2700 python scripts/train_matnet_device.py \
  runs/matnet_r5 --tuples 192 --steps 2500 --batch 4 --time-budget 1200

# 3. photograph -> materials end-to-end from the raw photo with ZERO
#    fixture inputs (VERDICT task 4, part 2)
stage photo_e2e 2400 python -m materialist_tpu.cli.inverse \
  --img_inverse_path /root/reference/examples/indoor2.png \
  --save_name photo_e2e --opt_src a --opt_order rm a --opt_env_from 2 \
  --model_name pos_mlp --save_path runs \
  --weights runs/matnet_r5/matnet_scratch.npz \
  --num_epochs 120 --frame_every 0

# 4. bench re-run: re-warms the (restart-emptied) .jax_cache with the
#    exact 10242/512-relight compiles the driver's end-of-round bench
#    needs, and re-confirms the green numbers on this boot.
stage bench2 2400 python bench.py

# 5. TPU-marked suite on the real chip (VERDICT task 6) — writes
#    TPU_TESTS_r5.json (r3 artifact format)
stage tpu_tests 2400 python scripts/run_tpu_tests.py

log "QUEUE COMPLETE $(date -u '+%H:%M:%S')"
