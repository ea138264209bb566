#!/bin/sh
# Round-5 at-scale chain (VERDICT tasks 4, 5, 8), ordered by value:
#
# A) HNeRV-Boost 720p regression @1.275M, b=2 planar_train, 60 ep:
#    the STRONG CEM base (round-4 weak #2: the sweep ran from a 15-ep
#    30 dB base; 60 ep should clear 34 dB).  b=2 planar encodes 1.51x
#    faster than b=1 standard (BASELINE.md round 4).
# E) CEM finetunes from A at target_bit 4/2/6, 15 ep each, real-ANS
#    eval rows -> the 3-point bpp/PSNR table (VERDICT task 4).
# G) E-NeRV-Boost at plot depth: 150 ep with the measured-correct
#    clip=1.0 + highest recipe (42.7 s/ep -> ~1.8 h) (VERDICT task 5).
# F) 1080p bench-config training, 30 ep -> the trained ckpt for the
#    W8A8 trained-weights quality row (VERDICT task 8).
#
# Timeout discipline (round-4 postmortem): every timeout is sized so it
# can only fire AFTER the first eval/ckpt of its step (never
# mid-compile), and the chain finishes hours before any driver bench.
# Run from /root/repo with NO PYTHONPATH, chip free:
#   sh tools/r5_run_chain.sh > /tmp/r5_chain_outer.log 2>&1 &
set -x
cd /root/repo
echo $$ > /tmp/r5_chain.pid
export JAX_COMPILATION_CACHE_DIR=/tmp/bnt_xla_cache

COMMON="--model HNeRV_Boost --sft_block res_sft --ch_t 32 \
  --data_path data/synth720 --vid synth720 \
  --optim_type Adan --conv_type convnext pshuffel_3x3 --act sin --norm none \
  --crop_list 720_1280 --resize_list -1 --loss Fusion10_freq \
  --embed pe_1.25_80 --enc_strds 5 2 2 2 2 --enc_dim 64_16 \
  --dec_strds 5 2 2 2 2 --ks 0_1_5 --reduce 1.2 --dec_blks 1 1 2 2 2 \
  --lower_width 12 --train_precision high --not_resume"

# A) strong CEM base: 60 ep, b=2 planar (eval every 20 -> resumable rows)
timeout 4200 python train_nerv_all.py --outf r5_reg $COMMON \
  --modelsize 1.275 -e 60 --eval_freq 20 -b 2 --planar_train 180 --lr 0.003 \
  > /tmp/r5_regA.log 2>&1
touch /tmp/r5_A_done

CEM="--lr_type cosine_0_1_0.1 --embed_entropy \
  --quant --quant_model_bit 8 --quant_bias_bit 8 --quant_embed_bit 8 \
  --quantizer_w scale --quantizer_b scale --quantizer_e scalebeta \
  --lambda_rate 0.05"

# E) the 3-point sweep (tb4 first: the row format is hardware-proven)
for tb in 4 2 6; do
  timeout 2400 python train_nerv_compression.py --outf r5_cem_tb$tb $COMMON \
    --modelsize 1.275 -e 15 --eval_freq 15 -b 1 --lr 0.0005 $CEM \
    --target_bit $tb \
    --weight output/r5_reg/synth720/Size1.275/model_latest.ckpt \
    > /tmp/r5_cem_tb$tb.log 2>&1
done
touch /tmp/r5_E_done

# G) E-NeRV-Boost to plot depth (150 ep, eval every 50)
timeout 8400 python train_nerv_all.py --outf r5_enerv150 \
  --model ENeRV_Boost --sft_block res_sft --ch_t 32 --block_dim 128 \
  --data_path data/synth720 --vid synth720 \
  --optim_type Adan --conv_type convnext pshuffel_3x3 --act sin --norm none \
  --crop_list 720_1280 --resize_list -1 --loss Fusion10_freq \
  --embed pe_1.25_80 --fc_hw 9_16 --dec_strds 5 2 2 2 2 --ks 0_3_3 \
  --reduce 2 --dec_blks 1 1 2 2 2 --lower_width 12 --not_resume \
  --modelsize 1.25 -e 150 --eval_freq 50 -b 1 --lr 0.0015 \
  --train_precision highest --clip_max_norm 1.0 \
  > /tmp/r5_enervG.log 2>&1
touch /tmp/r5_G_done

# F) 1080p trained ckpt for the W8A8 quality row (30 ep, ~15 min)
timeout 3000 python train_nerv_all.py --outf r5_1080p \
  --model HNeRV_Boost --sft_block res_sft --ch_t 32 \
  --data_path data/synth1080 --vid synth1080 \
  --optim_type Adan --conv_type convnext pshuffel_3x3 --act sin --norm none \
  --crop_list 1080_1920 --resize_list -1 --loss Fusion10_freq \
  --embed pe_1.25_80 --enc_strds 5 3 2 2 2 --enc_dim 64_16 \
  --dec_strds 5 3 2 2 2 --ks 0_1_5 --reduce 1.2 --dec_blks 1 1 2 2 2 \
  --lower_width 12 --train_precision high --not_resume \
  --modelsize 2.8 -e 30 --eval_freq 30 -b 1 --planar_train 270 --lr 0.003 \
  > /tmp/r5_1080p.log 2>&1
touch /tmp/r5_F_done

echo "R5 CHAIN DONE" > /tmp/r5_chain_done
