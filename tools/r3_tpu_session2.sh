#!/bin/sh
# Round-3 TPU measurement session, resumed after the first chain was cut
# (host session died at the A@540 probe, /tmp/r3_nck_probe.log has the
# B+head rows).  Value order: e2e bench candidates with the measured
# th=12/nck=3 win first, then the remaining iso probes, then the
# training-side probes and the E-NeRV rerun.
# Run from /root/repo with NO PYTHONPATH:
#   setsid sh tools/r3_tpu_session2.sh </dev/null >/tmp/r3_s2.out 2>&1 &
set -x
cd /root/repo
echo $$ > /tmp/r3_tpu_session2.pid

# 1) e2e serving bench candidates (headline number)
BNT_DECODE_TH='{"270":16,"B540":12}' BNT_DECODE_NCK='{"B540":3}' \
  timeout 1800 python bench.py > /tmp/bench_b540_nck3.log 2>&1
BNT_DECODE_TH='{"270":16,"540":12}' BNT_DECODE_NCK='{"540":3}' \
  timeout 1800 python bench.py > /tmp/bench_540_nck3.log 2>&1

# 2) remaining iso probe: A@540 chunked variants
timeout 3000 python -c "exec(open('tools/r3_nck_probe2.py').read())" \
  > /tmp/r3_nck_probe2.log 2>&1

# 3) VPU/MXU split of the 540 kernels (int8 decision data)
timeout 2400 python -c "exec(open('tools/r3_prologue_probe.py').read())" \
  --tpu > /tmp/r3_prologue_probe.log 2>&1

# 4) planar training forward: b>=2 720p step times vs b=1 standard
timeout 4000 python -c "exec(open('tools/planar_train_probe.py').read())" \
  > /tmp/planar_train_probe.log 2>&1

# 5) E-NeRV-Boost 720p rerun at train_precision highest
sh tools/r3_run_chain3.sh

echo "TPU SESSION2 DONE" > /tmp/r3_tpu_session2_done
