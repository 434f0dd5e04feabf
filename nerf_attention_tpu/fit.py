"""Fit SIRENs to KV cache tensors across architecture configurations.

The sweep driver groups fits by architecture (same param shapes) and trains
each group as a single batched XLA program — the reference runs the same 280
fits sequentially (`/root/reference/nerf_attention/fit.py:20-92`). Sweep
structure, experiment naming (``L{l}_H{h}_{kv}_{config}``), the
fit_results.json record schema, medium-config checkpointing, and the printed
summary all match the reference contracts.
"""

from __future__ import annotations

import argparse
import json
import time
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from nerf_attention_tpu.io import checkpoint, kvstore
from nerf_attention_tpu.parallel.sweep import (
    BatchFitMetrics,
    fit_batch,
    fit_batch_collect,
    fit_batch_dispatch,
    resolve_impl,
    select_fit_params,
)
from nerf_attention_tpu.types import (
    CONFIGS_FULL,
    CONFIGS_QUICK,
    FitResult,
    SIRENConfig,
)


def fit_siren(
    kv_tensor: np.ndarray,
    config: SIRENConfig,
    epochs: int = 5000,
    lr: float = 1e-4,
    seed: int = 0,
    verbose: bool = True,
) -> FitResult:
    """Fit one SIREN to one (seq_len, d_head) tensor. Pure function.

    API parity with reference siren.py:70-149; implemented as a batch of one
    so single fits and sweep fits share the same compiled training path.
    """
    seq_len, d_head = kv_tensor.shape
    batch = fit_batch(kv_tensor[None], config, epochs=epochs, lr=lr, seed=seed)
    result = _batch_to_fit_result(batch, 0, config, seq_len, d_head)
    if verbose:
        print(
            f"  CosSim: {result.final_cosine_mean:.4f} | "
            f"MSE: {result.final_mse:.6f} | "
            f"Time: {result.train_time_seconds:.2f}s"
        )
    return result


def _batch_to_fit_result(
    batch: BatchFitMetrics,
    i: int,
    config: SIRENConfig,
    seq_len: int,
    d_head: int,
) -> FitResult:
    # params may be absent (fit_batch_collect(with_params=False) skips the
    # device->host pull for groups that never checkpoint) — the size comes
    # from the config, identical to counting the arrays.
    params = select_fit_params(batch.params, i) if batch.params else []
    num_params = config.num_parameters(d_head)
    raw_size = seq_len * d_head * 2  # KV cache is natively fp16 (siren.py:127)
    siren_size = num_params * 4  # params stored fp32
    return FitResult(
        params=params,
        config=config,
        target_mean=batch.target_mean[i],
        target_std=batch.target_std[i],
        losses=batch.losses[i].tolist(),
        final_mse=float(batch.final_mse[i]),
        final_cosine_mean=float(batch.cosine_mean[i]),
        final_cosine_min=float(batch.cosine_min[i]),
        final_cosine_std=float(batch.cosine_std[i]),
        per_pos_mse=batch.per_pos_mse[i],
        cosine_sims=batch.cosine_sims[i],
        compression_ratio=raw_size / siren_size,
        raw_size_bytes=raw_size,
        siren_size_bytes=siren_size,
        train_time_seconds=batch.seconds_per_fit,
        seq_len=seq_len,
        d_head=d_head,
        num_parameters=num_params,
    )


@dataclass(frozen=True)
class FitItem:
    """One cell of the sweep grid."""

    layer: int
    head: int
    kv_type: str  # 'key' | 'value'

    @property
    def name_prefix(self) -> str:
        return f"L{self.layer}_H{self.head}_{self.kv_type}"


def sweep_layers(num_layers: int, quick: bool) -> list[int]:
    """Layer sampling: {0, L/2, L-1} quick, {0, L/4, L/2, 3L/4, L-1} full
    (reference fit.py:39-49)."""
    if quick:
        layers = [0, num_layers // 2, num_layers - 1]
    else:
        layers = [
            0,
            num_layers // 4,
            num_layers // 2,
            3 * num_layers // 4,
            num_layers - 1,
        ]
    return sorted({l for l in layers if l < num_layers})


def fit_kv_cache(
    kv_dir: Path,
    output_dir: Path,
    epochs: int = 5000,
    quick: bool = False,
    lr: float = 1e-4,
    seed: int = 0,
    mesh=None,
    verbose: bool = True,
    resume: bool = False,
    impl: str = "auto",
    sin_impl: str = "fast",
    torch_checkpoints: bool = False,
    fm_mult: float | None = None,
) -> list[dict]:
    """Run the architecture sweep over an extracted KV cache.

    Grid (reference fit.py:39-50): quick = 3 layers x 1 head x 2 configs;
    full = 5 layers x min(H,4) heads x 7 configs; both key and value — 280
    fits for Llama-3.1-8B. Fits are grouped by architecture and each group
    trains as one jit(vmap(scan)) program over the mesh.

    ``resume=True`` skips architecture groups whose complete results already
    exist in ``fit_results.json`` (group-level recovery — the reference can
    only resume at extraction granularity, scaling.py:56-61; individual fits
    there are 2000-epochs-or-nothing).
    """
    kv_dir, output_dir = Path(kv_dir), Path(output_dir)
    # Validate statically-knowable option combinations BEFORE touching the
    # output dir: the stale-results unlink below must never run for an
    # invocation that is going to be rejected.
    for c in (CONFIGS_QUICK if quick else CONFIGS_FULL):
        resolve_impl(impl, config=c)
    output_dir.mkdir(parents=True, exist_ok=True)
    metadata = kvstore.load_metadata(kv_dir)
    if metadata.v_head_dim not in (None, metadata.head_dim):
        # MLA caches (DeepSeek): K and V rows have different widths, which
        # this sweep's single stacked batch cannot hold. The right fit
        # target there is the latent surface anyway — fail with the path.
        raise NotImplementedError(
            f"this cache has asymmetric K/V head dims ({metadata.head_dim} "
            f"vs {metadata.v_head_dim} — an MLA extraction); the sweep "
            "driver fits uniform tensors. Fit the latent surface instead "
            "(tools/mla_latent_study.py / parallel.sweep.fit_batch)"
        )

    if verbose:
        print(f"KV Cache: {metadata.num_layers} layers x {metadata.num_kv_heads} heads")
        print(
            f"Per tensor: ({metadata.seq_len}, {metadata.head_dim}) = "
            f"{metadata.seq_len * metadata.head_dim * 2 / 1024:.1f} KB (float16 baseline)"
        )
        print(f"Epochs: {epochs}, grouped-batch training on "
              f"{'mesh' if mesh is not None else 'default device'}")

    configs = CONFIGS_QUICK if quick else CONFIGS_FULL
    heads_per_layer = 1 if quick else min(metadata.num_kv_heads, 4)
    layers_to_fit = sweep_layers(metadata.num_layers, quick)

    # Load every needed tensor once; build the grid of fit items.
    items: list[FitItem] = []
    tensors: list[np.ndarray] = []
    for layer_idx in layers_to_fit:
        if not kvstore.has_layer(kv_dir, layer_idx):
            if verbose:
                print(f"  Skipping layer {layer_idx} (not found)")
            continue
        keys, values = kvstore.load_layer(kv_dir, layer_idx)
        for head_idx in range(heads_per_layer):
            for kv_type, tensor in (("key", keys[head_idx]), ("value", values[head_idx])):
                items.append(FitItem(layer_idx, head_idx, kv_type))
                tensors.append(np.asarray(tensor, dtype=np.float32))

    if not items:
        raise FileNotFoundError(
            f"no layer files under {kv_dir} for the sweep layers "
            f"{layers_to_fit} — nothing to fit"
        )
    total = len(items) * len(configs)
    if verbose:
        print(f"Sweep: {len(items)} tensors x {len(configs)} configs = {total} fits")

    # Resume: a group is complete when every expected record for its config
    # is already present in a prior fit_results.json AND the prior run used
    # the same sweep parameters (sweep_meta.json stamp) — records carry no
    # epochs/seed field, so without the stamp a 100-epoch run would be
    # silently merged into a 5000-epoch one.
    # The stamp records the RESOLVED per-group implementation, not the
    # user's impl string: the XLA and fused-kernel paths differ by fp32
    # reduction-order rounding, and 'auto' resolves differently across
    # backends/meshes — a crash on TPU resumed on CPU must rerun, not merge.
    multi_device = mesh is not None and int(np.prod(mesh.devices.shape)) > 1
    sweep_meta = {
        "epochs": epochs, "lr": lr, "seed": seed, "quick": quick,
        "seq_len": metadata.seq_len, "kv_dir": str(kv_dir),
        "sin_impl": sin_impl,
        "fm_mult": fm_mult,
        "impl": {
            c.name: resolve_impl(impl, multi_device=multi_device, config=c)
            for c in configs
        },
    }
    meta_path = output_dir / "sweep_meta.json"
    results_path = output_dir / "fit_results.json"
    try:
        prior_meta = json.loads(meta_path.read_text()) if meta_path.exists() else None
    except json.JSONDecodeError:
        prior_meta = None  # torn stamp from a crash mid-write: treat as stale
    done_records: dict[str, list[dict]] = {}
    if resume and prior_meta == sweep_meta and results_path.exists():
        with open(results_path) as f:
            prior = json.load(f)
        expected = {f"{it.name_prefix}_{c.name}" for it in items for c in configs}
        by_config: dict[str, list[dict]] = {}
        for r in prior:
            if r["name"] in expected:
                by_config.setdefault(r["config_name"], []).append(r)
        for config in configs:
            recs = by_config.get(config.name, [])
            if len(recs) == len(items):
                done_records[config.name] = recs
        if verbose and done_records:
            print(f"  Resume: skipping completed groups {sorted(done_records)}")
    elif resume and verbose and results_path.exists():
        print(
            "  Resume: prior sweep used different parameters "
            f"({prior_meta} != {sweep_meta}) — rerunning everything"
        )
    if prior_meta != sweep_meta:
        # Remove stale results BEFORE stamping the new parameters: a crash
        # after the stamp but before the first group write must not leave
        # old-parameter records that a later --resume would adopt.
        results_path.unlink(missing_ok=True)
        meta_tmp = output_dir / "sweep_meta.json.tmp"
        with open(meta_tmp, "w") as f:
            json.dump(sweep_meta, f, indent=2)
        meta_tmp.replace(meta_path)  # atomic: a crash can't tear the stamp

    # Durable results, keyed by config group and always serialized in config
    # order. Seeded with ALL resumed groups up front so a crash mid-sweep
    # can never drop a previously-complete group from disk (they used to be
    # appended lazily when their slot came up in collect order, leaving a
    # window where later resumed groups were absent from the file).
    results_by_config: dict[str, list[dict]] = dict(done_records)

    def write_durable() -> list[dict]:
        ordered = [
            r
            for c in configs
            if c.name in results_by_config
            for r in results_by_config[c.name]
        ]
        tmp = output_dir / "fit_results.json.tmp"
        with open(tmp, "w") as f:
            json.dump(ordered, f, indent=2)
        tmp.replace(output_dir / "fit_results.json")
        return ordered

    if done_records:
        write_durable()

    import jax.numpy as jnp

    start = time.perf_counter()

    # Dispatch every architecture group before collecting any: group k+1's
    # compile / persistent-cache load (host-side, blocking) overlaps group
    # k's execution (device-side, async), so the device never idles between
    # groups. Groups execute in dispatch order on the device queue.
    #
    # Dispatch order is DESCENDING estimated cost (widest/deepest first):
    # host-side dispatch of all 7 groups takes several seconds (cache
    # deserialization through the tunnel), and in registry order the cheap
    # groups dispatched first finish in well under that, idling the device
    # until the expensive programs arrive. Front-loading the big groups
    # hides the whole dispatch tail behind their execution (measured ~4-5 s
    # off the 280-fit sweep). Seeds stay tied to the config's registry
    # index, so results are bit-identical to registry-order dispatch.
    def group_cost(config: SIRENConfig) -> int:
        h = config.hidden_features
        return h * h * config.hidden_layers + h * (metadata.head_dim + 1)

    order = sorted(
        enumerate(configs), key=lambda ic: group_cost(ic[1]), reverse=True
    )
    # Only non-resumed groups dispatch; binding `stacked` under the same
    # predicate keeps a fully-resumed run off the tunnel entirely (no
    # host->device transfer, no first-dispatch client warmup).
    todo_order = [(gi, c) for gi, c in order if c.name not in done_records]
    if todo_order:
        # One host->device transfer shared by all group dispatches.
        stacked = jnp.asarray(np.stack(tensors, axis=0), dtype=jnp.float32)
    handles: dict[int, tuple] = {}
    # Log a dispatch-sequence counter (position in todo_order), not the
    # registry index gi — cost-descending order would otherwise print
    # "[dispatch 4/7]" before "[dispatch 1/7]" and read as skipped groups.
    for di, (gi, config) in enumerate(todo_order):
        if verbose:
            print(
                f"[dispatch {di + 1}/{len(todo_order)}] {config.name}: "
                f"{len(items)} fits x {epochs} epochs",
                flush=True,
            )
        handles[gi] = fit_batch_dispatch(
            stacked, config, epochs=epochs, lr=lr,
            seed=seed + gi * 10_000, mesh=mesh, impl=impl,
            sin_impl=sin_impl, fm_mult=fm_mult,
        )

    prev_done = start
    # Collect in dispatch (device-queue) order.
    for di, (gi, config) in enumerate(todo_order):
        handle = handles[gi]
        np.asarray(handle[2]["final_mse"])  # wait for this group's completion
        now = time.perf_counter()
        # Groups run back-to-back on the device queue, so the gap between
        # consecutive completions is this group's device time (the first
        # gap also carries all overlapped compile time not yet amortized).
        # Params are only ever used for the medium group's checkpoints;
        # skipping the pull for other groups avoids ~200 MB/sweep of dead
        # device->host traffic (large alone is ~94 MB through the tunnel).
        batch = fit_batch_collect(
            handle, now - prev_done, with_params=config.name == "medium"
        )
        prev_done = now
        if verbose:
            print(
                f"[group {di + 1}/{len(todo_order)}] {config.name}: done in "
                f"{batch.train_time_seconds:.1f}s ({batch.seconds_per_fit:.3f} s/fit)",
                flush=True,
            )

        group_records = []
        for i, item in enumerate(items):
            result = _batch_to_fit_result(
                batch, i, config, metadata.seq_len, metadata.head_dim
            )
            name = f"{item.name_prefix}_{config.name}"
            record = result_to_record(name, item.layer, item.head, item.kv_type, result)
            group_records.append(record)
            if config.name == "medium":
                checkpoint.save_siren_checkpoint(
                    output_dir / f"{name}_model.npz",
                    result.params,
                    config,
                    metadata.head_dim,
                    result.target_mean,
                    result.target_std,
                    record,
                    fm_mult=fm_mult,
                )
                if torch_checkpoints and fm_mult is not None:
                    # The reference SIREN has no per-unit frequencies; a
                    # reference-format .pt of an FM network would silently
                    # evaluate as the wrong architecture over there.
                    if verbose and i == 0:
                        print(
                            "  (skipping reference-format .pt checkpoints: "
                            "fm_mult networks have no reference equivalent)"
                        )
                elif torch_checkpoints:
                    # Reference-format .pt beside the .npz: the reference's
                    # own evaluate.py then runs unmodified on this sweep's
                    # output (reverse interop; see tools/reference_interop.py).
                    checkpoint.save_torch_siren_checkpoint(
                        output_dir / f"{name}_model.pt",
                        result.params,
                        config,
                        metadata.head_dim,
                        result.target_mean,
                        result.target_std,
                        record,
                    )

        # Durable after every group: a crash mid-sweep leaves completed
        # groups on disk for --resume (atomic replace, no torn JSON).
        results_by_config[config.name] = group_records
        write_durable()

    all_results = [
        r
        for c in configs
        if c.name in results_by_config
        for r in results_by_config[c.name]
    ]
    wall = time.perf_counter() - start

    if verbose:
        trained = len(handles) * len(items)  # resumed fits did not train
        resumed_note = f" ({total - trained} resumed)" if trained < total else ""
        print(f"\nTotal sweep wall-clock: {wall:.1f}s for {trained} fits"
              f"{resumed_note} ({trained / max(wall, 1e-9):.2f} fits/s)")
        print_summary(all_results, layers_to_fit)
    return all_results


def result_to_record(
    name: str, layer: int, head: int, kv_type: str, result: FitResult
) -> dict:
    """Flat JSON record, schema-identical to reference fit.py:95-118."""
    return {
        "name": name,
        "layer": layer,
        "head": head,
        "kv_type": kv_type,
        "config_name": result.config.name,
        "hidden_features": result.config.hidden_features,
        "hidden_layers": result.config.hidden_layers,
        "omega_0": result.config.omega_0,
        "final_mse": result.final_mse,
        "final_cosine_mean": result.final_cosine_mean,
        "final_cosine_min": result.final_cosine_min,
        "final_cosine_std": result.final_cosine_std,
        "compression_ratio": result.compression_ratio,
        "raw_size_bytes": result.raw_size_bytes,
        "siren_size_bytes": result.siren_size_bytes,
        "train_time_seconds": result.train_time_seconds,
        "num_parameters": result.num_parameters,
        "seq_len": result.seq_len,
        "d_head": result.d_head,
    }


def print_summary(all_results: list[dict], layers_to_fit: list[int]) -> None:
    """Ranked table + aggregate findings (content parity: fit.py:140-180)."""
    print(f"\n{'=' * 80}")
    print("RESULTS SUMMARY")
    print(f"{'=' * 80}")
    print(f"{'Name':<35} {'CosSim':>8} {'MSE':>10} {'Compress':>10} {'Time':>8}")
    print(f"{'-' * 35} {'-' * 8} {'-' * 10} {'-' * 10} {'-' * 8}")
    for r in sorted(all_results, key=lambda x: x["final_cosine_mean"], reverse=True):
        print(
            f"{r['name']:<35} {r['final_cosine_mean']:>8.4f} "
            f"{r['final_mse']:>10.6f} {r['compression_ratio']:>9.1f}x "
            f"{r['train_time_seconds']:>7.2f}s"
        )

    print(f"\n{'=' * 80}")
    print("KEY FINDINGS")
    print(f"{'=' * 80}")
    for cn in sorted({r["config_name"] for r in all_results}):
        cr = [r for r in all_results if r["config_name"] == cn]
        print(
            f"  {cn:<10}: avg CosSim="
            f"{np.mean([r['final_cosine_mean'] for r in cr]):.4f}, "
            f"avg Compression="
            f"{np.mean([r['compression_ratio'] for r in cr]):.1f}x"
        )

    key_r = [r for r in all_results if r["kv_type"] == "key"]
    val_r = [r for r in all_results if r["kv_type"] == "value"]
    if key_r and val_r:
        k_avg = np.mean([r["final_cosine_mean"] for r in key_r])
        v_avg = np.mean([r["final_cosine_mean"] for r in val_r])
        print(f"\n  Keys avg CosSim:   {k_avg:.4f}")
        print(f"  Values avg CosSim: {v_avg:.4f}")
        diff = v_avg - k_avg
        if diff > 0.01:
            print("  -> Values compress better (smoother signal)")
        elif diff < -0.01:
            print("  -> Keys compress better (stronger positional structure)")
        else:
            print("  -> Similar compressibility")

    for layer_idx in layers_to_fit:
        lr_ = [
            r
            for r in all_results
            if r["layer"] == layer_idx and r["config_name"] == "medium"
        ]
        if lr_:
            print(
                f"  Layer {layer_idx:2d} (medium): avg CosSim="
                f"{np.mean([r['final_cosine_mean'] for r in lr_]):.4f}"
            )


def main() -> None:
    from nerf_attention_tpu.utils.compile_cache import enable as _enable_cache
    _enable_cache()
    parser = argparse.ArgumentParser(description="Fit SIRENs to KV cache")
    parser.add_argument("--kv_dir", type=str, default="results/kv_cache")
    parser.add_argument("--output_dir", type=str, default="results/fits")
    parser.add_argument("--epochs", type=int, default=5000)
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--mesh", action="store_true", help="shard the fit axis over all devices"
    )
    parser.add_argument(
        "--profile_dir", type=str, default=None,
        help="capture a jax.profiler trace of the sweep into this directory",
    )
    parser.add_argument(
        "--device", type=str, default=None, choices=["cpu", "tpu"],
        help="pin the jax platform (reference fit.py:188 --device parity); "
        "default: jax's platform auto-selection",
    )
    parser.add_argument(
        "--resume", action="store_true",
        help="skip architecture groups already completed in fit_results.json",
    )
    parser.add_argument(
        "--impl", type=str, default="auto", choices=["auto", "xla", "pallas"],
        help="training step implementation (auto = fused pallas kernel on a "
        "single TPU chip, XLA autodiff elsewhere; pallas is single-device)",
    )
    parser.add_argument(
        "--sin_impl", type=str, default="fast", choices=["fast", "exact"],
        help="sine implementation for training (fast = polynomial, ~2.5-3x "
        "faster per step on TPU, CosSim-parity verified; exact = jnp.sin)",
    )
    parser.add_argument(
        "--torch_checkpoints", action="store_true",
        help="also write reference-format .pt checkpoints for the medium "
        "group (the reference's evaluate.py runs unmodified on them)",
    )
    parser.add_argument(
        "--fm_mult", type=float, default=None,
        help="FM-SIREN per-unit first-layer frequency spread 1..M (equal "
        "parameter count; measured r3: M=64 recovers most of the hard-mode "
        "value gap). Runs on any impl incl. the fused Pallas kernel",
    )
    args = parser.parse_args()
    from nerf_attention_tpu.utils.platform import pin_platform

    pin_platform(args.device)

    mesh = None
    if args.mesh:
        from nerf_attention_tpu.parallel.mesh import fit_mesh

        mesh = fit_mesh()
        print(f"Mesh: {mesh.devices.size} device(s)")

    from nerf_attention_tpu.utils.tracing import trace

    with trace(args.profile_dir):
        fit_kv_cache(
            Path(args.kv_dir),
            Path(args.output_dir),
            epochs=args.epochs,
            quick=args.quick,
            seed=args.seed,
            mesh=mesh,
            resume=args.resume,
            impl=args.impl,
            sin_impl=args.sin_impl,
            torch_checkpoints=args.torch_checkpoints,
            fm_mult=args.fm_mult,
        )


if __name__ == "__main__":
    main()
