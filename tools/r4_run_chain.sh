#!/bin/sh
# Round-4 at-scale chain, ordered by remaining-budget value
# (VERDICT tasks 3, 4, 6, 5 in that order).
#
# B) b=2 --planar_train 180, 6 ep: the hardware proof that the planar
#    forward (a) fits (AOT said 8.8-9.4G vs 22.7G standard-OOM) and
#    (b) its per-frame time vs the measured b=1 standard baseline
#    (288 ms/step at "high", BASELINE.md).  Standalone: needs no ckpt.
# G) E-NeRV-Boost flatline fix candidate: same recipe as the flatlined
#    atscale_enerv_hp run + --clip_max_norm 1.0.  Postmortem
#    (tools/r4_enerv_postmortem.py) shows the norm-free transformer
#    trunk's activations explode (trans2 std 14398 vs 0.12 at init)
#    through correlated small weights — sin wraps downstream so the
#    loss never penalizes scale; clipping caps the early steps that
#    walk there.  Flatlined run was stuck at 15.0 dB from ep2, so
#    15 ep discriminates.
# F) 1080p training feasibility (VERDICT task 6): bench config
#    (dec 5 3 2 2 2, modelsize 2.8) on 48-frame synth-1080p,
#    b=1 --planar_train 270, 5 ep — memory fit + ms/step is the claim.
# A) HNeRV-Boost 720p regression @1.275M, b=1, 30 ep: CEM base ckpt.
# E) CEM finetunes from A at target_bit 4/2/6 -> PSNR-vs-bpp rows.
#
# Run from /root/repo with NO PYTHONPATH, chip free:
#   sh tools/r4_run_chain.sh > /tmp/r4_chain_outer.log 2>&1 &
set -x
cd /root/repo
echo $$ > /tmp/r4_chain.pid
export JAX_COMPILATION_CACHE_DIR=/tmp/bnt_xla_cache

COMMON="--model HNeRV_Boost --sft_block res_sft --ch_t 32 \
  --data_path data/synth720 --vid synth720 \
  --optim_type Adan --conv_type convnext pshuffel_3x3 --act sin --norm none \
  --crop_list 720_1280 --resize_list -1 --loss Fusion10_freq \
  --embed pe_1.25_80 --enc_strds 5 2 2 2 2 --enc_dim 64_16 \
  --dec_strds 5 2 2 2 2 --ks 0_1_5 --reduce 1.2 --dec_blks 1 1 2 2 2 \
  --lower_width 12 --train_precision high --not_resume"

timeout 1500 python train_nerv_all.py --outf r4_planarb2 $COMMON \
  --modelsize 1.275 -e 6 --eval_freq 6 -b 2 --planar_train 180 --lr 0.003 \
  > /tmp/r4_planarB.log 2>&1
touch /tmp/r4_B_done

timeout 1800 python train_nerv_all.py --outf r4_enerv_clip \
  --model ENeRV_Boost --sft_block res_sft --ch_t 32 --block_dim 128 \
  --data_path data/synth720 --vid synth720 \
  --optim_type Adan --conv_type convnext pshuffel_3x3 --act sin --norm none \
  --crop_list 720_1280 --resize_list -1 --loss Fusion10_freq \
  --embed pe_1.25_80 --fc_hw 9_16 --dec_strds 5 2 2 2 2 --ks 0_3_3 \
  --reduce 2 --dec_blks 1 1 2 2 2 --lower_width 12 --not_resume \
  --modelsize 1.25 -e 15 --eval_freq 15 -b 1 --lr 0.0015 \
  --train_precision highest --clip_max_norm 1.0 \
  > /tmp/r4_enervG.log 2>&1
touch /tmp/r4_G_done

timeout 2400 python train_nerv_all.py --outf r4_1080p \
  --model HNeRV_Boost --sft_block res_sft --ch_t 32 \
  --data_path data/synth1080 --vid synth1080 \
  --optim_type Adan --conv_type convnext pshuffel_3x3 --act sin --norm none \
  --crop_list 1080_1920 --resize_list -1 --loss Fusion10_freq \
  --embed pe_1.25_80 --enc_strds 5 3 2 2 2 --enc_dim 64_16 \
  --dec_strds 5 3 2 2 2 --ks 0_1_5 --reduce 1.2 --dec_blks 1 1 2 2 2 \
  --lower_width 12 --train_precision high --not_resume \
  --modelsize 2.8 -e 5 --eval_freq 5 -b 1 --planar_train 270 --lr 0.003 \
  > /tmp/r4_1080p.log 2>&1
touch /tmp/r4_F_done

timeout 2700 python train_nerv_all.py --outf r4_reg $COMMON \
  --modelsize 1.275 -e 30 --eval_freq 15 -b 1 --lr 0.003 \
  > /tmp/r4_regA.log 2>&1
touch /tmp/r4_A_done

CEM="--lr_type cosine_0_1_0.1 --embed_entropy \
  --quant --quant_model_bit 8 --quant_bias_bit 8 --quant_embed_bit 8 \
  --quantizer_w scale --quantizer_b scale --quantizer_e scalebeta \
  --lambda_rate 0.05"

for tb in 4 2 6; do
  timeout 2100 python train_nerv_compression.py --outf r4_cem_tb$tb $COMMON \
    --modelsize 1.275 -e 15 --eval_freq 15 -b 1 --lr 0.0005 $CEM \
    --target_bit $tb \
    --weight output/r4_reg/synth720/Size1.275/model_latest.ckpt \
    > /tmp/r4_cem_tb$tb.log 2>&1
done

echo "R4 CHAIN DONE" > /tmp/r4_chain_done
