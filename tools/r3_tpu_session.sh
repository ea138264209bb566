#!/bin/sh
# Round-3 TPU measurement session (run when the axon tunnel is back).
# 1. nck iso probe on the 540-grid stage kernels (the 72%-of-frame pair)
# 2. e2e serving bench at candidate policies via BNT_DECODE_* env
# 3. E-NeRV-Boost 720p rerun at train_precision highest (chain3)
# Run from /root/repo with NO PYTHONPATH:  sh tools/r3_tpu_session.sh &
set -x
cd /root/repo
echo $$ > /tmp/r3_tpu_session.pid

timeout 4000 python -c "exec(open('tools/r3_nck_probe.py').read())" \
  > /tmp/r3_nck_probe.log 2>&1

# VPU/MXU split of the B+head@540 kernel (nodots / noprolog bounds):
# decides whether int8 dots can pay post-chunking
timeout 2400 python -c "exec(open('tools/r3_prologue_probe.py').read())" \
  --tpu > /tmp/r3_prologue_probe.log 2>&1

# e2e candidates: current default, chunked, and chunked+split on the
# 540-zone kernels (keys: stage coarse height; "A540"/"B540" variants)
BNT_TAG=cur timeout 1200 python bench.py > /tmp/bench_nck_cur.log 2>&1
BNT_DECODE_NCK='{"540": 3}' timeout 1200 python bench.py \
  > /tmp/bench_nck540_3.log 2>&1
BNT_DECODE_NCK='{"540": 3}' BNT_DECODE_SPLIT='{"540": 1}' \
  timeout 1200 python bench.py > /tmp/bench_split540_3.log 2>&1
BNT_DECODE_NCK='{"540": 4, "270": 2}' BNT_DECODE_SPLIT=1 \
  timeout 1200 python bench.py > /tmp/bench_split_all.log 2>&1

# planar training forward: b>=2 720p step times vs the b=1 standard path
# (memory fit proven offline by tools/aot_train_mem_check.py)
timeout 4000 python -c "exec(open('tools/planar_train_probe.py').read())" \
  > /tmp/planar_train_probe.log 2>&1

sh tools/r3_run_chain3.sh

echo "TPU SESSION DONE" > /tmp/r3_tpu_session_done
