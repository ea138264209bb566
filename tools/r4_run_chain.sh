#!/bin/sh
# Round-4 at-scale chain (VERDICT tasks 3 + 5 prerequisites).
#
# A) HNeRV-Boost 720p regression @1.275M, b=1 standard, 30 ep: the CEM
#    base ckpt AND the b=1 per-frame encode-timing baseline.
# B) Same recipe, b=2 --planar_train 180, 6 ep: the hardware proof that
#    the planar forward (a) fits (AOT said 8.8-9.4G) and (b) its
#    per-frame time vs A (VERDICT: "either b=2 beats b=1 per-frame or
#    the lever is retired with numbers").
# C) Regression @0.64M and D) @2.5M: the low/high ends of the bpp sweep
#    (reference sweeps bpp via modelsize at fixed target_bit 4 —
#    /root/reference/scripts/compression/hnerv_boost.sh).  D uses the
#    planar forward for memory headroom.
# E) CEM finetunes (target_bit 4, lambda_rate 0.05, paper flags) from
#    A/C/D ckpts -> the 3-row PSNR-vs-bpp table for BASELINE.md.
#
# Run from /root/repo with NO PYTHONPATH, chip free:
#   sh tools/r4_run_chain.sh > /tmp/r4_chain_outer.log 2>&1 &
set -x
cd /root/repo
echo $$ > /tmp/r4_chain.pid

COMMON="--model HNeRV_Boost --sft_block res_sft --ch_t 32 \
  --data_path data/synth720 --vid synth720 \
  --optim_type Adan --conv_type convnext pshuffel_3x3 --act sin --norm none \
  --crop_list 720_1280 --resize_list -1 --loss Fusion10_freq \
  --embed pe_1.25_80 --enc_strds 5 2 2 2 2 --enc_dim 64_16 \
  --dec_strds 5 2 2 2 2 --ks 0_1_5 --reduce 1.2 --dec_blks 1 1 2 2 2 \
  --lower_width 12 --train_precision high --not_resume"

timeout 2700 python train_nerv_all.py --outf r4_reg $COMMON \
  --modelsize 1.275 -e 30 --eval_freq 15 -b 1 --lr 0.003 \
  > /tmp/r4_regA.log 2>&1

timeout 1500 python train_nerv_all.py --outf r4_planarb2 $COMMON \
  --modelsize 1.275 -e 6 --eval_freq 6 -b 2 --planar_train 180 --lr 0.003 \
  > /tmp/r4_planarB.log 2>&1

timeout 2400 python train_nerv_all.py --outf r4_reg $COMMON \
  --modelsize 0.64 -e 30 --eval_freq 15 -b 1 --lr 0.003 \
  > /tmp/r4_regC.log 2>&1

timeout 3600 python train_nerv_all.py --outf r4_reg $COMMON \
  --modelsize 2.5 -e 30 --eval_freq 15 -b 1 --lr 0.003 --planar_train 180 \
  > /tmp/r4_regD.log 2>&1

CEM="--lr_type cosine_0_1_0.1 --embed_entropy \
  --quant --quant_model_bit 8 --quant_bias_bit 8 --quant_embed_bit 8 \
  --quantizer_w scale --quantizer_b scale --quantizer_e scalebeta \
  --lambda_rate 0.05 --target_bit 4"

for size in 1.275 0.64 2.5; do
  timeout 2100 python train_nerv_compression.py --outf r4_cem $COMMON \
    --modelsize $size -e 15 --eval_freq 15 -b 1 --lr 0.0005 $CEM \
    --weight output/r4_reg/synth720/Size$size/model_latest.ckpt \
    > /tmp/r4_cem_$size.log 2>&1
done

echo "R4 CHAIN DONE" > /tmp/r4_chain_done
