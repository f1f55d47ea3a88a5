#!/bin/bash
# One-shot TPU measurement batch for round-3 session 4 (run when the axon
# tunnel is up; everything logs under /tmp/tpu_s4/).
set -x
mkdir -p /tmp/tpu_s4
cd /root/repo

# 1. e2e device-time attribution + codec conv-impl variants
timeout 3600 python scratch/bench_e2e_attrib.py 2>&1 | tee /tmp/tpu_s4/attrib.log

# 2. honest train step (encode no longer hoisted) + backward attribution
for v in full nocodec noloss nohead; do
  BENCH_RBG=1 SURG=$v timeout 2400 python scratch/bench_train_surgery.py 2>&1 | tee /tmp/tpu_s4/train_$v.log
done

# 3. full bench with the PCM16 single-stream transfer
timeout 2400 python bench.py 2>&1 | tee /tmp/tpu_s4/bench.log
