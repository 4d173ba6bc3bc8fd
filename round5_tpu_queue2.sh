#!/bin/bash
# Round-5 stage-2 TPU measurements: waits for round5_tpu_queue.sh to
# finish (the tunnel serializes clients), then measures the lookahead
# and Schur-slab-budget axes at the n=32768 frontier.
set -u
cd /root/repo
LOG=/tmp/q5_status.log
echo "queue2 waiting $(date)" >> $LOG
tries=0
until grep -q "queue done" $LOG 2>/dev/null; do
  tries=$((tries+1))
  if [ $tries -gt 120 ]; then echo "queue2 giving up $(date)" >> $LOG; exit 1; fi
  sleep 60
done

run() {
  name=$1; shift
  echo "start $name $(date)" >> $LOG
  timeout 3500 "$@" > /tmp/q5_$name.log 2>&1
  echo "end $name rc=$? $(date)" >> $LOG
}

run lu32k_la python -m capital_tpu.bench.lu --n 32768 --nb 2048 --num-iter 2 --donate --lookahead
CAPITAL_LU_SCHUR_MB=1024 run lu32k_slab1g python -m capital_tpu.bench.lu --n 32768 --nb 2048 --num-iter 2 --donate
echo "queue2 done $(date)" >> $LOG
