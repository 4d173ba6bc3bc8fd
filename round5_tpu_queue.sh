#!/bin/bash
# Round-5 pending TPU measurements, fired when the axon tunnel returns.
# Each step logs to /tmp/q5_*.log; one TPU process at a time.
set -u
cd /root/repo
LOG=/tmp/q5_status.log
echo "queue start $(date)" >> $LOG

probe() {
  timeout 90 python -c "import jax; jax.devices()" > /dev/null 2>&1
}

# wait up to ~3.5 h for the tunnel
tries=0
until probe; do
  tries=$((tries+1))
  echo "probe $tries failed $(date)" >> $LOG
  if [ $tries -gt 42 ]; then echo "giving up $(date)" >> $LOG; exit 1; fi
  sleep 300
done
echo "tunnel back $(date)" >> $LOG

run() {
  name=$1; shift
  echo "start $name $(date)" >> $LOG
  timeout 3500 "$@" > /tmp/q5_$name.log 2>&1
  echo "end $name rc=$? $(date)" >> $LOG
}

run lu32k python -m capital_tpu.bench.lu --n 32768 --nb 2048 --num-iter 2 --donate
run lu32k_high python -m capital_tpu.bench.lu --n 32768 --nb 2048 --num-iter 2 --donate --precision high
run lu_bf16_solve python -m capital_tpu.bench.lu --n 16384 --nb 2048 --num-iter 2 --solve-k 256 --refine 3 --factor-dtype bfloat16
run eigh_partial32k python -m capital_tpu.bench.eigh --op partial --n 32768 --k 256 --num-iter 1 --probe-dtype bfloat16 --refine 3
run svd_partial python -m capital_tpu.bench.eigh --op svd_partial --m 524288 --n 4096 --k 256 --dtype bfloat16 --num-iter 1
run benchpy python bench.py
echo "queue done $(date)" >> $LOG
