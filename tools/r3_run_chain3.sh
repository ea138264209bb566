#!/bin/sh
# Round-3 at-scale chain, phase 3: E-NeRV-Boost 720p regression rerun.
#
# The chain2 run at --train_precision high flatlined at 15 dB from epoch
# 5 (run starved/killed at ep42); the same model+recipe converges on CPU
# fp32 at 180x320 (24.7 dB @ 25 ep, /tmp/ediag3.log), and NeRV-Boost
# (MLP stem, no attention) converged at "high" on TPU.  Hypothesis: the
# transformer trunk needs "highest" matmul precision.  Fresh run (not a
# resume — the ep41 state is a plateaued basin).
# Run from /root/repo with NO PYTHONPATH:  sh tools/r3_run_chain3.sh &
set -x
cd /root/repo
echo $$ > /tmp/r3_chain3.pid

timeout 4200 python train_nerv_all.py \
  --outf atscale_enerv_hp --model ENeRV_Boost --sft_block res_sft --ch_t 32 \
  --block_dim 128 \
  --data_path data/synth720 --vid synth720 \
  --optim_type Adan --conv_type convnext pshuffel_3x3 --act sin --norm none \
  --crop_list 720_1280 --resize_list -1 --loss Fusion10_freq \
  --embed pe_1.25_80 --fc_hw 9_16 \
  --dec_strds 5 2 2 2 2 --ks 0_3_3 --reduce 2 --dec_blks 1 1 2 2 2 \
  --modelsize 1.25 -e 60 --eval_freq 20 --lower_width 12 -b 1 --lr 0.0015 \
  --train_precision highest --not_resume \
  > /tmp/run_enerv_hp.log 2>&1

echo "CHAIN3 DONE" > /tmp/r3_chain3_done
