"""Pre-compile the standard sweep programs into the persistent cache.

Compiles through the tunneled TPU backend cost 20-160s per program; this
warms `.jax_cache/` with the programs bench.py and the full sweep need (7
architectures at the reference geometry) plus the fused decode kernels, so a
later timed run pays only cache loads. Run once per fresh container:

    python tools/warm_cache.py [--seq_len 2048] [--epochs 2000]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--seq_len", type=int, default=2048)
    parser.add_argument("--head_dim", type=int, default=128)
    parser.add_argument("--n_fits", type=int, default=40)
    parser.add_argument("--epochs", type=int, default=2000)
    args = parser.parse_args()

    from nerf_attention_tpu.utils.compile_cache import enable

    enable()

    import jax
    import numpy as np

    from nerf_attention_tpu.parallel.mesh import fit_mesh
    from nerf_attention_tpu.parallel.sweep import fit_batch_dispatch
    from nerf_attention_tpu.types import CONFIGS_FULL

    # Mirror bench.py's mesh choice — sharded programs have different cache
    # keys, so warming unsharded executables on a multi-chip host would miss.
    mesh = fit_mesh() if len(jax.devices()) > 1 else None
    print(f"backend={jax.default_backend()} mesh={mesh is not None}", flush=True)
    rng = np.random.default_rng(0)
    targets = rng.standard_normal(
        (args.n_fits, args.seq_len, args.head_dim)
    ).astype(np.float32)

    handles = []
    for config in CONFIGS_FULL:
        t0 = time.perf_counter()
        handles.append(
            (config.name,
             fit_batch_dispatch(targets, config, epochs=args.epochs, mesh=mesh))
        )
        print(f"  {config.name}: dispatched (compile/load "
              f"{time.perf_counter() - t0:.1f}s)", flush=True)
    for name, (_, _, metrics) in handles:
        np.asarray(metrics["final_mse"])
        print(f"  {name}: executed", flush=True)

    if jax.default_backend() == "tpu":
        from nerf_attention_tpu.models.siren import init_siren
        from nerf_attention_tpu.ops.siren_pallas import siren_decode, siren_decode_batch
        from nerf_attention_tpu.types import CONFIGS_BY_NAME

        medium = CONFIGS_BY_NAME["medium"]
        params = init_siren(jax.random.PRNGKey(0), medium, args.head_dim)
        np.asarray(siren_decode(params, medium.omega_0, args.seq_len))
        print("  decode kernel: compiled", flush=True)
        # Aggregate-decode geometry (32L x 8H x K/V = 512 networks).
        keys = jax.random.split(jax.random.PRNGKey(1), 512)
        batched = jax.vmap(lambda k: init_siren(k, medium, args.head_dim))(keys)
        np.asarray(siren_decode_batch(batched, medium.omega_0, args.seq_len))
        print("  batched decode kernel: compiled", flush=True)

    print("cache warm")


if __name__ == "__main__":
    main()
