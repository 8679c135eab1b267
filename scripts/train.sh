#!/bin/bash
# Flagship training config (parity with reference scripts/train.sh:2)
python -m masterthesis_tpu.train --dataroot $1 --model AdaINModel --dataset PairedDataset \
    --batch_size 1 --num_workers 1 --use_dis_content --num_domains 4 --concat --reparam
