#!/bin/sh
# Baseline HNeRV bunny-720p regression.
for size in 0.75 1.5 3; do
  python train_nerv_all.py \
    --outf regression/HNeRV/epoch_300 --model HNeRV \
    --data_path ./dataset/bunny --vid bunny \
    --optim_type Adan --conv_type convnext pshuffel_3x3 --act gelu --norm none \
    --crop_list 720_1280 --resize_list -1 --loss Fusion6 \
    --enc_strds 5 2 2 2 2 --enc_dim 64_16 \
    --dec_strds 5 2 2 2 2 --ks 0_1_5 --reduce 1.2 --dec_blks 1 1 1 1 1 \
    --modelsize "$size" -e 300 --eval_freq 30 --lower_width 12 -b 1 --lr 0.001 --train_precision high
done
