from nerf_attention_tpu.experiments.scaling import (
    plot_full_layer_profile,
    plot_scaling_crossover,
    plot_scaling_quality,
    run_full_layer_profile,
    run_scaling_experiment,
)
from nerf_attention_tpu.experiments.multi_prompt import (
    plot_multi_prompt,
    run_multi_prompt_experiment,
)
from nerf_attention_tpu.experiments.svd import plot_siren_vs_svd, run_svd_experiment
from nerf_attention_tpu.experiments.summary import generate_final_summary
from nerf_attention_tpu.experiments.aggregate_decode import (
    plot_aggregate_decode,
    run_aggregate_decode_experiment,
)
from nerf_attention_tpu.experiments.quantized_params import (
    plot_quantized_pareto,
    run_quantization_experiment,
)
from nerf_attention_tpu.experiments.incremental import (
    plot_incremental,
    run_incremental_experiment,
)
from nerf_attention_tpu.experiments.attention_error import (
    plot_attention_error,
    run_attention_error_experiment,
)
from nerf_attention_tpu.experiments.head_policy import (
    plot_head_policy,
    run_head_policy_experiment,
)
