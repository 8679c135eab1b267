#!/bin/bash
cd /root/repo
python scripts/reference_headtohead.py --side tpu --model BaseModel --concat --seed 0 --dtype float32 --init_from /tmp/headtohead/ref_init_basemodel.ckpt --tag basemodel_f32_refinit > /tmp/tpu_bm_f32_refinit.log 2>&1
python scripts/reference_headtohead.py --side tpu --model BaseModel --concat --seed 0 --dtype float32 --tag basemodel_f32_s0 > /tmp/tpu_bm_f32_s0.log 2>&1
