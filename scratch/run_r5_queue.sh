#!/bin/bash
# Round-5 serialized TPU measurement queue (one chip — never run two at once).
# Detached via setsid so it survives builder-session interruptions.
cd /root/repo
set -x
echo "=== [1/3] dtfwd clean-window confirm (VERDICT r4 item 3) ==="
BENCH_ORDER=td,dt,td timeout 3600 python scratch/bench_train_dtfwd.py
echo "=== [2/3] serving operating-point sweep (VERDICT r4 item 5) ==="
BENCH_BATCHES=8,16 BENCH_CONCS=16,32 BENCH_PART1=0 timeout 5400 python scratch/bench_serving_sweep.py
echo "=== [3/3] long-form gap attribution (VERDICT r4 item 6) ==="
BENCH_STAGES=1 timeout 9000 python scratch/bench_longform_attrib.py
echo "=== QUEUE DONE ==="
