#!/bin/bash
# Round-5 flagship-scale BaseModel evidence (VERDICT r4 Missing #4 / Next #4):
# both sides at 128px / dim 64 (the scale of the r3 quality-trend collapse),
# same iterations, same eval protocol. Ref side ~23.4 s/it on this host's
# single CPU core -> 500 iters ~= 3.5h; run it LAST (after fork_probe frees
# the core). The tpu side runs both seeds on the TPU first (~minutes each).
set -e
cd /root/repo
OUT=/tmp/headtohead
case "$1" in
  tpu)
    JAX_COMPILATION_CACHE_DIR=/tmp/tpu_jax_cache python scripts/reference_headtohead.py \
      --side tpu --model BaseModel --concat --dim 64 --size 128 --iters 500 \
      --ckpt_every 125 --seed 0 --tag basemodel_scale_s0 --out $OUT
    JAX_COMPILATION_CACHE_DIR=/tmp/tpu_jax_cache python scripts/reference_headtohead.py \
      --side tpu --model BaseModel --concat --dim 64 --size 128 --iters 500 \
      --ckpt_every 125 --seed 1 --tag basemodel_scale_s1 --out $OUT
    ;;
  ref)
    nice -n 19 python scripts/reference_headtohead.py \
      --side ref --model BaseModel --concat --dim 64 --size 128 --iters 500 \
      --ckpt_every 125 --seed 0 --tag basemodel_scale --out $OUT
    ;;
  *) echo "usage: $0 {tpu|ref}"; exit 2 ;;
esac
