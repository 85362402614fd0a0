#!/bin/bash
# Round-5 TPU work queue: strictly sequential (one TPU process at a time),
# survives builder-session death (launch under nohup). Each stage logs to
# runs/r5_queue/<stage>.log; queue.log is the ledger. Stages marked .done
# are skipped on relaunch.
cd /root/repo || exit 1
export PYTHONPATH=/root/.axon_site:/root/repo
Q=runs/r5_queue
mkdir -p "$Q"

log() { echo "[queue] $*" | tee -a "$Q/queue.log"; }

stage() {
  name=$1; shift
  if [ -f "$Q/$name.done" ]; then log "$name: already done, skip"; return; fi
  # cool-down between TPU clients: connecting while the previous lease
  # is still releasing can wedge the new client on the tunnel forever
  # (r5: two wedges, CPU frozen at ~20 s, futex wait on the reply)
  sleep 150
  log "$name START $(date -u '+%H:%M:%S')"
  "$@" > "$Q/$name.log" 2>&1
  rc=$?
  log "$name END rc=$rc $(date -u '+%H:%M:%S')"
  [ $rc -eq 0 ] && touch "$Q/$name.done"
}

# wait for an in-flight TPU run (pid via WAIT_PID) to release the device
if [ -n "$WAIT_PID" ]; then
  log "waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
log "TPU free, queue starting $(date -u '+%H:%M:%S')"

# 1. BENCH verification (VERDICT r4 task 1) — DONE 08:13 rc=0:
#    fresh 10,860.7 ms / amortized 7,283.3 / relight 0.107 fps
stage bench timeout 3600 python bench.py

# 2. indoor full-budget parity restart (snapshot_every hardened)
stage indoor timeout 3300 python scripts/run_inverse_parity.py indoor \
  --epochs 2000 --spp 64 --chunk 8 --trace-every 8 --time-budget 2700 \
  --out runs/parity_indoor_r5

# 3. forward-parity artifact: both fixtures + interval_frac ladder +
#    thick synthetic + brightness ratios (VERDICT task 5)
stage fwdparity timeout 3000 python scripts/run_forward_parity.py

# 4. MaterialNet reduced checkpoint trained on self-rendered data
#    (VERDICT task 4, part 1)
stage matnet timeout 2700 python scripts/train_matnet_device.py \
  runs/matnet_r5 --tuples 192 --steps 2500 --batch 4 --time-budget 1200

# 5. photograph -> materials end-to-end from the raw photo with ZERO
#    fixture inputs (VERDICT task 4, part 2)
stage photo_e2e timeout 2400 python -m materialist_tpu.cli.inverse \
  --img_inverse_path /root/reference/examples/indoor2.png \
  --save_name photo_e2e --opt_src a --opt_order rm a --opt_env_from 2 \
  --model_name pos_mlp --save_path runs \
  --weights runs/matnet_r5/matnet_scratch.npz \
  --num_epochs 120 --frame_every 0

# 6. TPU-marked suite on the real chip (VERDICT task 6) — writes
#    TPU_TESTS_r5.json (r3 artifact format)
stage tpu_tests timeout 2400 python scripts/run_tpu_tests.py

# 7. envmap observability diagnostic (root-cause evidence for task 2)
stage envcov timeout 1800 python scripts/diag_env_coverage.py \
  --recovered runs/parity_indoor_r5/best_results/envmap.hdr

log "QUEUE COMPLETE $(date -u '+%H:%M:%S')"
