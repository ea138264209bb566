#!/bin/sh
# HNeRV-Boost UVG-1080p regression (paper sizes 3M/5M/10M/15M).
tail="_1920x1080_120"
for size in 2.8 4.6 9.1 13.6; do
for video in Beauty Bosphorus HoneyBee Jockey ReadySteadyGo YachtRide; do
  python train_nerv_all.py \
    --outf regression/HNeRV_Boost/epoch_300 --model HNeRV_Boost \
    --sft_block res_sft --ch_t 32 \
    --data_path ./dataset/UVG_Full/$video$tail --vid "$video" \
    --optim_type Adan --conv_type convnext pshuffel_3x3 --act sin --norm none \
    --crop_list 1080_1920 --resize_list -1 --loss Fusion10_freq \
    --embed pe_1.25_80 --enc_strds 5 3 2 2 2 --enc_dim 64_16 \
    --dec_strds 5 3 2 2 2 --ks 0_1_5 --reduce 1.2 --dec_blks 1 1 2 2 2 \
    --modelsize "$size" -e 300 --eval_freq 30 --lower_width 12 -b 1 --lr 0.003 --train_precision high
done
done
# ShakeNDry has 300 frames; slightly smaller sizes keep the same budgets
for size in 2.75 4.5 9.05 13.55; do
for video in ShakeNDry; do
  python train_nerv_all.py \
    --outf regression/HNeRV_Boost/epoch_300 --model HNeRV_Boost \
    --sft_block res_sft --ch_t 32 \
    --data_path ./dataset/UVG_Full/$video$tail --vid "$video" \
    --optim_type Adan --conv_type convnext pshuffel_3x3 --act sin --norm none \
    --crop_list 1080_1920 --resize_list -1 --loss Fusion10_freq \
    --embed pe_1.25_80 --enc_strds 5 3 2 2 2 --enc_dim 64_16 \
    --dec_strds 5 3 2 2 2 --ks 0_1_5 --reduce 1.2 --dec_blks 1 1 2 2 2 \
    --modelsize "$size" -e 300 --eval_freq 30 --lower_width 12 -b 1 --lr 0.003 --train_precision high
done
done
