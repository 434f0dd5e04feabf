#!/bin/bash
# Pending on-chip runs interrupted by the 2026-08-17 axon outage
# (single shared chip — run serially, never concurrently with bench).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
date
# 1. FM-64 incremental refit (the non-FM row landed in
#    benchmarks/r4/hard_study/incremental; this is the FM twin, reusing the
#    already-generated 4096 cache under fm_study/incremental/kv_cache).
python -m nerf_attention_tpu.experiments incremental \
  --values_mode hard --fm_mult 64 \
  --results_root benchmarks/r4/fm_study \
  --siren_dir benchmarks/r4/fm_study/fits \
  --kv_dir benchmarks/r4/fm_study/kv_cache \
  && echo INCR_FM_OK || echo INCR_FM_FAIL
date
# 2. Quantized warm-restart study at the shared-omega frontier point
#    (int4_g128+QAT): can the shipped artifact sustain a growing cache?
python tools/quantized_sustain_study.py \
  --kv_dir benchmarks/r4/hard_study/incremental/kv_cache \
  --out benchmarks/r4/quantized_sustain.json \
  && echo SUSTAIN_OK || echo SUSTAIN_FAIL
date
# 3. FM twin at the FM frontier point (int8_g32), on the FM incremental cache.
python tools/quantized_sustain_study.py \
  --kv_dir benchmarks/r4/fm_study/incremental/kv_cache \
  --out benchmarks/r4/quantized_sustain_fm64.json \
  --scheme int8_g32 --fm_mult 64 \
  && echo SUSTAIN_FM_OK || echo SUSTAIN_FM_FAIL
date
echo PENDING_DONE
