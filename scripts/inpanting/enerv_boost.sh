#!/bin/sh
# ENeRV_Boost DAVIS-1080p inpainting (center + five fixed 50x50 boxes).
for mode in inpanting_center inpanting_fixed_50; do
for video in blackswan bmx-trees breakdance camel car-roundabout car-shadow cows dance-twirl dog drift-chicane drift-straight goat horsejump-high kite-surf libby motocross-jump paragliding-launch parkour scooter-black soapbox; do
  python train_nerv_all.py \
    --outf ${mode}/ENeRV_Boost/epoch_300 --model ENeRV_Boost --sft_block res_sft --ch_t 32 --block_dim 128 --fc_hw 9_16 --ks 0_3_3 --reduce 2 \
    --data_path ./dataset/DAVIS/JPEGImages/1080p/$video --vid "$video" \
    --optim_type Adan --conv_type convnext pshuffel_3x3 --act sin --norm none \
    --crop_list 1080_1920 --resize_list -1 --loss Fusion10_freq \
    --embed pe_1.25_80 \
    --dec_strds 5 3 2 2 2 --dec_blks 1 1 2 2 2 \
    --modelsize 1.8 -e 300 --eval_freq 30 --lower_width 12 -b 1 --lr 0.0015 --train_precision highest --clip_max_norm 1.0 \
    --inpanting $mode
done
done
