"""nerf-attention-tpu: TPU-native SIREN compression study of LLM KV caches.

A from-scratch JAX/XLA/Pallas rebuild of the nerf-attention research pipeline
(reference: ruskaruma/nerf-attention). Public facade mirrors the reference's
package API (`/root/reference/nerf_attention/__init__.py`).
"""

from nerf_attention_tpu.types import (
    CONFIGS_FULL,
    CONFIGS_QUICK,
    AnalysisResult,
    FitResult,
    KVMetadata,
    LayerSummary,
    SIRENConfig,
)
from nerf_attention_tpu.models.siren import (
    fm_frequency_multipliers,
    init_siren,
    positions,
    siren_apply,
    siren_apply_fm,
    siren_apply_maybe_fm,
    siren_forward,
)
from nerf_attention_tpu.extract import (
    extract_kv_cache,
    extract_kv_cache_jax,
    extract_kv_cache_synthetic,
    get_sample_text,
)
from nerf_attention_tpu.models.llama_hybrid import (
    llama_decode_step_quantcache,
    make_hybrid_decode_step,
    make_hybrid_rollout,
    pack_llama_kv_cache,
)
from nerf_attention_tpu.models.llama_jax import (
    llama_decode_rollout,
    llama_decode_step,
    llama_prefill_kv,
    llama_prefill_kv_pp,
    llama_prefill_kv_sp,
)
from nerf_attention_tpu.models.mla_jax import (
    MLAConfig,
    load_mla_params,
    materialize_from_latent,
    mla_decode_rollout,
    mla_decode_step,
    mla_decode_step_absorbed,
    mla_decode_step_absorbed_quant,
    pack_mla_latent_stack,
    mla_decode_step_latent,
    mla_prefill_kv,
    shard_mla_params,
)
from nerf_attention_tpu.synthetic import generate_synthetic_kv
from nerf_attention_tpu.analyze import analyze_kv_cache
from nerf_attention_tpu.fit import fit_kv_cache, fit_siren
from nerf_attention_tpu.parallel.mesh import fit_mesh
from nerf_attention_tpu.parallel.sweep import fit_batch
from nerf_attention_tpu.models.siren_shared import (
    fit_shared_batch,
    init_shared,
    shared_apply,
    shared_bytes_per_unit,
)
from nerf_attention_tpu.evaluate import (
    generate_summary_figure,
    load_results,
    plot_keys_vs_values,
    plot_pareto_frontier,
    plot_per_position_error,
    profile_latency,
)

# Beyond-reference TPU additions (fused kernels + fast transcendentals).
from nerf_attention_tpu.ops.fastmath import fast_cos, fast_sin, fast_sincos
from nerf_attention_tpu.ops.qat import qat_finetune_batch
from nerf_attention_tpu.io.quantized import save_quantized_siren_checkpoint
from nerf_attention_tpu.ops.quantize import (
    param_bytes,
    parse_scheme,
    quantize_params,
    split_scheme,
)
from nerf_attention_tpu.ops.siren_pallas import (
    siren_decode_batch,
    siren_decode_fused,
)
from nerf_attention_tpu.ops.siren_attention_pallas import (
    siren_attention_decode,
    siren_attention_decode_fused,
)
from nerf_attention_tpu.ops.siren_quant_pallas import (
    pack_resident_params,
    resident_param_bytes,
    siren_attention_decode_quant,
    siren_attention_decode_quant_sharded,
    siren_decode_batch_quant,
    siren_decode_batch_quant_sharded,
)
from nerf_attention_tpu.ops.mla_absorbed_pallas import mla_absorbed_attention
from nerf_attention_tpu.ops.kv_quant_pallas import (
    kv_cache_attention_quant,
    pack_kv_unit_stack,
    resident_kv_bytes,
)
from nerf_attention_tpu.ops.mla_quant_pallas import (
    mla_absorbed_attention_quant,
    pack_resident_latent,
    resident_latent_bytes,
)
from nerf_attention_tpu.measure_entropy import measure_model_entropy
from nerf_attention_tpu.serve_plan import (
    apply_layer_windows,
    build_plan,
    build_tiered_plan,
    fit_reprice,
    latent_units_from_json,
    law_cost,
    recommend_probes,
    reprice_units,
    tiered_units_from_policy_json,
    units_from_fits,
    units_from_policy_json,
)

__all__ = [
    "CONFIGS_FULL",
    "CONFIGS_QUICK",
    "AnalysisResult",
    "FitResult",
    "KVMetadata",
    "LayerSummary",
    "SIRENConfig",
    "init_siren",
    "positions",
    "siren_apply",
    "siren_forward",
    "extract_kv_cache",
    "extract_kv_cache_jax",
    "extract_kv_cache_synthetic",
    "generate_synthetic_kv",
    "get_sample_text",
    "analyze_kv_cache",
    "fit_kv_cache",
    "fit_siren",
    "fit_mesh",
    "fit_batch",
    "fit_shared_batch",
    "init_shared",
    "shared_apply",
    "shared_bytes_per_unit",
    "load_results",
    "plot_pareto_frontier",
    "plot_keys_vs_values",
    "plot_per_position_error",
    "profile_latency",
    "generate_summary_figure",
    "fast_sin",
    "fast_cos",
    "fast_sincos",
    "siren_decode_fused",
    "siren_decode_batch",
    "siren_attention_decode",
    "siren_attention_decode_fused",
    "siren_attention_decode_quant",
    "siren_attention_decode_quant_sharded",
    "siren_decode_batch_quant",
    "siren_decode_batch_quant_sharded",
    "pack_resident_params",
    "resident_param_bytes",
    "llama_decode_rollout",
    "llama_decode_step",
    "make_hybrid_decode_step",
    "make_hybrid_rollout",
    "llama_decode_step_quantcache",
    "pack_llama_kv_cache",
    "llama_prefill_kv",
    "llama_prefill_kv_pp",
    "llama_prefill_kv_sp",
    "MLAConfig",
    "load_mla_params",
    "materialize_from_latent",
    "mla_absorbed_attention",
    "mla_decode_rollout",
    "mla_decode_step",
    "mla_decode_step_absorbed",
    "mla_decode_step_absorbed_quant",
    "pack_mla_latent_stack",
    "mla_absorbed_attention_quant",
    "kv_cache_attention_quant",
    "pack_kv_unit_stack",
    "resident_kv_bytes",
    "pack_resident_latent",
    "resident_latent_bytes",
    "mla_decode_step_latent",
    "mla_prefill_kv",
    "shard_mla_params",
    "fm_frequency_multipliers",
    "siren_apply_fm",
    "siren_apply_maybe_fm",
    "quantize_params",
    "save_quantized_siren_checkpoint",
    "param_bytes",
    "parse_scheme",
    "split_scheme",
    "qat_finetune_batch",
    "build_plan",
    "apply_layer_windows",
    "build_tiered_plan",
    "latent_units_from_json",
    "measure_model_entropy",
    "law_cost",
    "fit_reprice",
    "recommend_probes",
    "reprice_units",
    "tiered_units_from_policy_json",
    "units_from_fits",
    "units_from_policy_json",
]

__version__ = "0.1.0"
