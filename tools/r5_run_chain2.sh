#!/bin/sh
# Round-5 chain, part 2 (after the tb4 timeout fired inside its ep-11
# eval COMPILE — the eval also triggers at `last in (1,3,5)`, which the
# part-1 budgets missed).  Budgets here include one COLD eval compile
# for tb2 (~15 min) and assume warm for the rest; every timeout has
# >= 25 min slack over the worst-case step so it can only fire after
# that step's artifacts exist.
#
# Order: tb2 (cold, 5400) -> tb6 (3000) -> tb4 --eval_only (1500, warm
# eval from tb2/tb6; its ep-10 ckpt already sits at the bpp target) ->
# F 1080p ckpt (3000) -> G E-NeRV 150ep (8400, LAST so an overrun can
# be stopped at an epoch boundary without costing other artifacts).
#
# Run from /root/repo with NO PYTHONPATH, chip free:
#   sh tools/r5_run_chain2.sh > /tmp/r5_chain2_outer.log 2>&1 &
set -x
cd /root/repo
echo $$ > /tmp/r5_chain2.pid
export JAX_COMPILATION_CACHE_DIR=/tmp/bnt_xla_cache

COMMON="--model HNeRV_Boost --sft_block res_sft --ch_t 32 \
  --data_path data/synth720 --vid synth720 \
  --optim_type Adan --conv_type convnext pshuffel_3x3 --act sin --norm none \
  --crop_list 720_1280 --resize_list -1 --loss Fusion10_freq \
  --embed pe_1.25_80 --enc_strds 5 2 2 2 2 --enc_dim 64_16 \
  --dec_strds 5 2 2 2 2 --ks 0_1_5 --reduce 1.2 --dec_blks 1 1 2 2 2 \
  --lower_width 12 --train_precision high"

CEM="--lr_type cosine_0_1_0.1 --embed_entropy \
  --quant --quant_model_bit 8 --quant_bias_bit 8 --quant_embed_bit 8 \
  --quantizer_w scale --quantizer_b scale --quantizer_e scalebeta \
  --lambda_rate 0.05"
W=output/r5_reg/synth720/Size1.275/model_latest.ckpt

timeout 5400 python train_nerv_compression.py --outf r5_cem_tb2 $COMMON \
  --not_resume --modelsize 1.275 -e 15 --eval_freq 15 -b 1 --lr 0.0005 \
  $CEM --target_bit 2 --weight $W > /tmp/r5_cem_tb2.log 2>&1

timeout 3000 python train_nerv_compression.py --outf r5_cem_tb6 $COMMON \
  --not_resume --modelsize 1.275 -e 15 --eval_freq 15 -b 1 --lr 0.0005 \
  $CEM --target_bit 6 --weight $W > /tmp/r5_cem_tb6.log 2>&1

# tb4: training was killed at ep-11 eval; real-ANS row from its ckpt
timeout 1500 python train_nerv_compression.py --outf r5_cem_tb4 $COMMON \
  --modelsize 1.275 -e 15 --eval_freq 15 -b 1 --lr 0.0005 \
  $CEM --target_bit 4 --eval_only > /tmp/r5_cem_tb4_eval.log 2>&1
touch /tmp/r5_E_done

# F) 1080p trained ckpt for the W8A8 trained-weights quality row
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

# G) E-NeRV-Boost at plot depth (150 ep, eval every 50)
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

echo "R5 CHAIN2 DONE" > /tmp/r5_chain2_done
