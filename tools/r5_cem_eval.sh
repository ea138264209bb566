#!/bin/sh
# Round-5 CEM sweep evals (real-ANS coding rows for BASELINE.md).
#
# The r5_run_chain.sh CEM finetunes hit their per-run timeout inside the
# first eval COMPILE (~15 min on this 1-core host, uncached), so no
# real-ANS row landed.  This reruns the eval alone via --eval_only from
# each run's model_latest.ckpt; the persistent XLA cache makes the
# second and third evals near-instant (identical shapes, only the
# target_bit scalar differs).
#
# Run from /root/repo with NO PYTHONPATH, chip free:
#   sh tools/r5_cem_eval.sh > /tmp/r5_cem_eval_outer.log 2>&1 &
set -x
cd /root/repo
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

for tb in 4 2 6; do
  timeout 2700 python train_nerv_compression.py --outf r5_cem_tb$tb \
    $COMMON --modelsize 1.275 -e 15 --eval_freq 15 -b 1 --lr 0.0005 \
    $CEM --target_bit $tb --eval_only \
    > /tmp/r5_cem_eval_tb$tb.log 2>&1
done

echo "R4 CEM EVAL DONE" > /tmp/r5_cem_eval_done
