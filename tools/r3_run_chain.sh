#!/bin/sh
# Round-3 at-scale run chain (sequential: the TPU is single-client).
# VERDICT r2 items 4 & 5: CEM at the paper operating point, the missing
# task x model cells (inpainting + interpolation >=480p, NeRV-Boost and
# E-NeRV-Boost 720p regression at the bunny recipe).
# Run from /root/repo with NO PYTHONPATH:  sh tools/r3_run_chain.sh &
set -x
cd /root/repo
echo $$ > /tmp/r3_chain.pid

# 1. CEM finetune at the paper bpp (target_bpp ~0.0496): exact compression
#    recipe (scripts/compression/hnerv_boost.sh) from the converged ep204
#    synth-720p regression checkpoint.
timeout 5400 python train_nerv_compression.py \
  --outf cem_tb4 --model HNeRV_Boost --sft_block res_sft --ch_t 32 \
  --data_path data/synth720 --vid synth720 \
  --optim_type Adan --conv_type convnext pshuffel_3x3 --act sin --norm none \
  --crop_list 720_1280 --resize_list -1 --loss Fusion10_freq \
  --embed pe_1.25_80 --enc_strds 5 2 2 2 2 --enc_dim 64_16 \
  --dec_strds 5 2 2 2 2 --ks 0_1_5 --reduce 1.2 --dec_blks 1 1 2 2 2 \
  --modelsize 1.275 -e 40 --eval_freq 10 --lower_width 12 -b 1 --lr 0.0005 \
  --weight output/atscale/synth720/Size1.275/model_latest.ckpt \
  --lr_type cosine_0_1_0.1 --not_resume --embed_entropy \
  --quant --quant_model_bit 8 --quant_bias_bit 8 --quant_embed_bit 8 \
  --quantizer_w scale --quantizer_b scale --quantizer_e scalebeta \
  --lambda_rate 0.05 --target_bit 4 --train_precision high \
  > /tmp/run_cem_tb4.log 2>&1

# 2. Inpainting at 480p (DAVIS recipe scaled: scripts/inpanting/
#    hnerv_boost.sh, fixed-50 mask mode).
timeout 2700 python train_nerv_all.py \
  --outf atscale_inp --model HNeRV_Boost --sft_block res_sft --ch_t 32 \
  --data_path data/synth480 --vid synth480 \
  --optim_type Adan --conv_type convnext pshuffel_3x3 --act sin --norm none \
  --crop_list 480_960 --resize_list -1 --loss Fusion10_freq \
  --embed pe_1.25_80 --enc_strds 5 2 2 2 2 --enc_dim 64_16 \
  --dec_strds 5 2 2 2 2 --ks 0_1_5 --reduce 1.2 --dec_blks 1 1 2 2 2 \
  --modelsize 1.0 -e 60 --eval_freq 30 --lower_width 12 -b 1 --lr 0.003 \
  --inpanting inpanting_fixed_50 --train_precision high \
  > /tmp/run_inp480.log 2>&1

# 3. Frame interpolation at 480p (scripts/interpolation/hnerv_boost.sh:
#    even frames train, odd validate, neighbour-embedding average).
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

# 4. NeRV-Boost synth-720p regression (bunny recipe, 1.5M tier:
#    scripts/regression/bunny/nerv_boost.sh size 0.8)
timeout 6300 python train_nerv_all.py \
  --outf atscale_nerv --model NeRV_Boost --sft_block res_sft --ch_t 32 \
  --data_path data/synth720 --vid synth720 \
  --optim_type Adan --conv_type convnext pshuffel_3x3 --act sin --norm none \
  --crop_list 720_1280 --resize_list -1 --loss Fusion10_freq \
  --embed pe_1.25_80 --fc_hw 9_16 \
  --dec_strds 5 2 2 2 2 --ks 0_3_3 --reduce 2 --dec_blks 1 1 2 2 2 \
  --modelsize 0.8 -e 110 --eval_freq 30 --lower_width 12 -b 1 --lr 0.003 \
  --train_precision high \
  > /tmp/run_nerv.log 2>&1

# 5. E-NeRV-Boost synth-720p regression (bunny recipe, 1.5M tier:
#    scripts/regression/bunny/enerv_boost.sh size 1.25)
timeout 6300 python train_nerv_all.py \
  --outf atscale_enerv --model ENeRV_Boost --sft_block res_sft --ch_t 32 \
  --block_dim 128 \
  --data_path data/synth720 --vid synth720 \
  --optim_type Adan --conv_type convnext pshuffel_3x3 --act sin --norm none \
  --crop_list 720_1280 --resize_list -1 --loss Fusion10_freq \
  --embed pe_1.25_80 --fc_hw 9_16 \
  --dec_strds 5 2 2 2 2 --ks 0_3_3 --reduce 2 --dec_blks 1 1 2 2 2 \
  --modelsize 1.25 -e 110 --eval_freq 30 --lower_width 12 -b 1 --lr 0.0015 \
  --train_precision high \
  > /tmp/run_enerv.log 2>&1

echo "CHAIN DONE" > /tmp/r3_chain_done
