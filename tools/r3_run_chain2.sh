#!/bin/sh
# Round-3 at-scale chain, phase 2 (after the perf-probe window).
# 1. CEM real-ANS coding eval at the paper operating point (resumes the
#    cem_tb4 finetune state: learned scale/scalebeta qparams + embed qp).
# 2. Interpolation at 480p (VERDICT r2 item 5).
# 3+4. NeRV-Boost / E-NeRV-Boost synth-720p regression (bunny recipe,
#    epoch count trimmed to the round's wall-clock budget; ordering vs
#    HNeRV-Boost per img/bunny_time_ep.png is the evidence target).
# Run from /root/repo with NO PYTHONPATH:  sh tools/r3_run_chain2.sh &
set -x
cd /root/repo
echo $$ > /tmp/r3_chain2.pid

timeout 1800 python train_nerv_compression.py \
  --outf cem_tb4 --model HNeRV_Boost --sft_block res_sft --ch_t 32 \
  --data_path data/synth720 --vid synth720 \
  --optim_type Adan --conv_type convnext pshuffel_3x3 --act sin --norm none \
  --crop_list 720_1280 --resize_list -1 --loss Fusion10_freq \
  --embed pe_1.25_80 --enc_strds 5 2 2 2 2 --enc_dim 64_16 \
  --dec_strds 5 2 2 2 2 --ks 0_1_5 --reduce 1.2 --dec_blks 1 1 2 2 2 \
  --modelsize 1.275 -e 40 --eval_freq 10 --lower_width 12 -b 1 --lr 0.0005 \
  --lr_type cosine_0_1_0.1 --embed_entropy \
  --quant --quant_model_bit 8 --quant_bias_bit 8 --quant_embed_bit 8 \
  --quantizer_w scale --quantizer_b scale --quantizer_e scalebeta \
  --lambda_rate 0.05 --target_bit 4 --train_precision high --eval_only \
  > /tmp/run_cem_eval.log 2>&1

timeout 2700 python train_nerv_all.py \
  --outf atscale_interp --model HNeRV_Boost --sft_block res_sft --ch_t 32 \
  --data_path data/synth480 --vid synth480 \
  --optim_type Adan --conv_type convnext pshuffel_3x3 --act sin --norm none \
  --crop_list 480_960 --resize_list -1 --loss Fusion10_freq \
  --embed pe_1.05_80 --enc_strds 5 2 2 2 2 --enc_dim 64_16 \
  --dec_strds 5 2 2 2 2 --ks 0_1_5 --reduce 1.2 --dec_blks 1 1 2 2 2 \
  --modelsize 1.0 -e 60 --eval_freq 30 --lower_width 12 -b 1 --lr 0.001 \
  --interpolation --data_split 1_1_2 --embed_inter --train_precision high \
  > /tmp/run_interp480.log 2>&1

timeout 3300 python train_nerv_all.py \
  --outf atscale_nerv --model NeRV_Boost --sft_block res_sft --ch_t 32 \
  --data_path data/synth720 --vid synth720 \
  --optim_type Adan --conv_type convnext pshuffel_3x3 --act sin --norm none \
  --crop_list 720_1280 --resize_list -1 --loss Fusion10_freq \
  --embed pe_1.25_80 --fc_hw 9_16 \
  --dec_strds 5 2 2 2 2 --ks 0_3_3 --reduce 2 --dec_blks 1 1 2 2 2 \
  --modelsize 0.8 -e 60 --eval_freq 20 --lower_width 12 -b 1 --lr 0.003 \
  --train_precision high \
  > /tmp/run_nerv.log 2>&1

timeout 3300 python train_nerv_all.py \
  --outf atscale_enerv --model ENeRV_Boost --sft_block res_sft --ch_t 32 \
  --block_dim 128 \
  --data_path data/synth720 --vid synth720 \
  --optim_type Adan --conv_type convnext pshuffel_3x3 --act sin --norm none \
  --crop_list 720_1280 --resize_list -1 --loss Fusion10_freq \
  --embed pe_1.25_80 --fc_hw 9_16 \
  --dec_strds 5 2 2 2 2 --ks 0_3_3 --reduce 2 --dec_blks 1 1 2 2 2 \
  --modelsize 1.25 -e 60 --eval_freq 20 --lower_width 12 -b 1 --lr 0.0015 \
  --train_precision high \
  > /tmp/run_enerv.log 2>&1

echo "CHAIN2 DONE" > /tmp/r3_chain2_done
