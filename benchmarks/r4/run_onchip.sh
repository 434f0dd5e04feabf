#!/bin/bash
# Serialized on-chip artifact runs for round 4 (single shared chip — never
# run two of these concurrently).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
date
python tools/train_impl_bench.py --out benchmarks/r4/train_impl_fm.json \
  --variants xla:fast,xla:fast:fm64,pallas:fast,pallas:fast:fm64 \
  && echo STEP1_OK || echo STEP1_FAIL
date
python -m nerf_attention_tpu.study --values_mode hard --fm_mult 64 \
  --root benchmarks/r4/fm_study && echo STEP2_OK || echo STEP2_FAIL
date
python -m nerf_attention_tpu.study --values_mode hard \
  --root benchmarks/r4/hard_study && echo STEP3_OK || echo STEP3_FAIL
date
echo ALL_DONE
