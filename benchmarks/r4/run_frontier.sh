#!/bin/bash
# On-chip quantization-frontier runs over the r4 study checkpoints
# (single shared chip - serialized).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
SCHEMES=fp32,bf16,fp16,int8,int8_g32,int4,int4_qat,int4_g64,int4_g64_qat,int4_g128,int4_g128_qat,int3_g64,int3_g64_qat,int3_g128,int3_g128_qat
date
python -m nerf_attention_tpu.experiments quantize \
  --kv_dir benchmarks/r4/hard_study/kv_cache \
  --siren_dir benchmarks/r4/hard_study/fits \
  --results_root benchmarks/r4/hard_study_frontier \
  --values_mode hard --schemes $SCHEMES && echo HARD_OK || echo HARD_FAIL
date
python -m nerf_attention_tpu.experiments quantize \
  --kv_dir benchmarks/r4/fm_study/kv_cache \
  --siren_dir benchmarks/r4/fm_study/fits \
  --results_root benchmarks/r4/fm_study_frontier \
  --values_mode hard --schemes $SCHEMES && echo FM_OK || echo FM_FAIL
date
echo FRONTIER_DONE
