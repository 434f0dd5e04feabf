"""Compress a fit sweep's checkpoints into bit-packed quantized storage.

Beyond-reference CLI (round 4): the serving half of the quantization study.
``experiments quantize`` measures which storage scheme survives
(FINDINGS_TPU.md: shared-omega nets ship at int4-g128+QAT, FM nets at
int8-g32); this tool actually SHIPS them — it rewrites every checkpoint in
a sweep directory as a bit-packed quantized ``.npz`` (`io/quantized.py`),
optionally running the batched straight-through QAT repair first
(`ops/qat.py`), then verifies the round-trip by reloading each file through
the standard loader and re-measuring CosSim against the cache on disk.

The output directory is a drop-in replacement for the fits dir: same
``L{l}_H{h}_{kv}_{config}_model.npz`` stems, loadable by ``evaluate``,
``experiments aggregate_decode``, and the fused Pallas decode kernel via
the unmodified ``load_siren_checkpoint`` dispatch. A
``compress_manifest.json`` records per-checkpoint bytes, the measured
on-disk total, and the verification CosSim.

The reference has no storage path but fp32 torch pickles
(`/root/reference/nerf_attention/fit.py:121-137`).

Usage (the measured frontier point):
    python -m nerf_attention_tpu.compress \
        --siren_dir results/fits --kv_dir results/kv_cache \
        --out_dir results/fits_int4 --scheme int4_g128 --qat
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(
        description="Rewrite SIREN checkpoints as bit-packed quantized storage"
    )
    parser.add_argument("--siren_dir", type=str, required=True)
    parser.add_argument("--out_dir", type=str, required=True)
    parser.add_argument(
        "--scheme", type=str, default="int4_g128",
        help="storage scheme (fp16/bf16/int8/int8_g32/int4/int<B>_g<N>)",
    )
    parser.add_argument(
        "--qat", action="store_true",
        help="run the batched straight-through QAT repair before storing "
             "(needs --kv_dir for the training targets; group-wise int only)",
    )
    parser.add_argument("--qat_epochs", type=int, default=300)
    parser.add_argument(
        "--kv_dir", type=str, default=None,
        help="KV cache the sweep trained on — required for --qat and for "
             "the round-trip CosSim verification (skipped if absent)",
    )
    parser.add_argument("--max_models", type=int, default=None)
    args = parser.parse_args(argv)

    from nerf_attention_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()

    from nerf_attention_tpu.io import checkpoint, kvstore
    from nerf_attention_tpu.io.quantized import save_quantized_siren_checkpoint
    from nerf_attention_tpu.ops.quantize import parse_scheme, param_bytes

    kind, bits, group = parse_scheme(args.scheme)  # fail fast on typos
    if args.qat and (kind != "int" or group is None):
        parser.error(f"--qat needs a group-wise integer scheme, got {args.scheme!r}")
    if args.qat and args.kv_dir is None:
        parser.error("--qat needs --kv_dir (the cache the sweep trained on)")

    siren_dir, out_dir = Path(args.siren_dir), Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    model_files = checkpoint.checkpoint_glob(siren_dir)
    if args.max_models is not None:
        model_files = model_files[: args.max_models]
    if not model_files:
        raise FileNotFoundError(f"no checkpoints under {siren_dir}")

    kv_dir = Path(args.kv_dir) if args.kv_dir else None
    loaded = []
    for model_file in model_files:
        ckpt = checkpoint.load_siren_checkpoint(model_file)
        entry = {"stem": model_file.stem, "ckpt": ckpt, "original": None}
        if kv_dir is not None:
            metrics = ckpt["metrics"]
            keys, values = kvstore.load_layer(kv_dir, metrics["layer"])
            entry["original"] = np.asarray(
                (keys if metrics["kv_type"] == "key" else values)[
                    metrics["head"]
                ],
                dtype=np.float32,
            )
        loaded.append(entry)
    print(f"Loaded {len(loaded)} checkpoints from {siren_dir}")

    if args.qat:
        _qat_repair(loaded, args.scheme, args.qat_epochs)

    manifest = {"scheme": args.scheme, "qat": args.qat, "checkpoints": []}
    total_in = total_out = 0
    for entry in loaded:
        ckpt = entry["ckpt"]
        out_path = out_dir / f"{entry['stem']}.npz"
        save_quantized_siren_checkpoint(
            out_path,
            [(np.asarray(w), np.asarray(b)) for w, b in ckpt["params"]],
            args.scheme,
            ckpt["config"],
            ckpt["out_features"],
            ckpt["target_mean"],
            ckpt["target_std"],
            ckpt["metrics"],
            fm_mult=ckpt.get("fm_mult"),
        )
        stored = param_bytes(ckpt["params"], args.scheme)
        fp32_bytes = sum(
            np.asarray(w).nbytes + np.asarray(b).nbytes
            for w, b in ckpt["params"]
        )
        total_in += fp32_bytes
        total_out += stored
        manifest["checkpoints"].append(
            {
                "name": entry["stem"],
                "file": out_path.name,
                "fp32_param_bytes": fp32_bytes,
                "stored_param_bytes": stored,
                "file_bytes": out_path.stat().st_size,
            }
        )

    if kv_dir is not None:
        _verify(loaded, out_dir, manifest)

    _write_sidecars(siren_dir, out_dir, args, manifest)

    manifest["total_fp32_param_bytes"] = total_in
    manifest["total_stored_param_bytes"] = total_out
    manifest["param_compression_vs_fp32"] = round(total_in / total_out, 4)
    with open(out_dir / "compress_manifest.json", "w") as f:
        json.dump(manifest, f, indent=2)
    print(
        f"Stored {len(loaded)} checkpoints as {args.scheme}"
        f"{' (+QAT)' if args.qat else ''}: params "
        f"{total_in / 1e6:.2f} MB -> {total_out / 1e6:.2f} MB "
        f"({total_in / total_out:.2f}x), manifest at "
        f"{out_dir / 'compress_manifest.json'}"
    )


def _write_sidecars(
    siren_dir: Path, out_dir: Path, args, manifest: dict
) -> None:
    """Make the quantized dir an HONEST drop-in for the fits dir.

    evaluate/experiments read ``fit_results.json`` from siren_dir, so it is
    carried over — but filtered to the checkpoints that actually exist here,
    with storage-dependent fields rewritten: ``siren_size_bytes`` and
    ``compression_ratio`` price the quantized payload, and (when the cache
    was available to verify against) the cosine/mse fields are the measured
    RELOADED-checkpoint quality, not the fp32 sweep's. Schema is a superset
    of the reference record (additive ``storage_scheme``/``qat`` keys)."""
    import shutil

    meta_src = siren_dir / "sweep_meta.json"
    if meta_src.exists():
        shutil.copy2(meta_src, out_dir / "sweep_meta.json")
    results_src = siren_dir / "fit_results.json"
    if not results_src.exists():
        return
    by_name = {rec["name"]: rec for rec in manifest["checkpoints"]}
    records = []
    for rec in json.loads(results_src.read_text()):
        stem = rec["name"] + "_model"
        stored = by_name.get(stem)
        if stored is None:
            continue  # only medium nets are checkpointed/stored
        rec = dict(rec)
        rec["storage_scheme"] = args.scheme
        rec["qat"] = args.qat
        rec["siren_size_bytes"] = stored["stored_param_bytes"]
        rec["compression_ratio"] = rec["raw_size_bytes"] / stored[
            "stored_param_bytes"
        ]
        for src_key, dst_key in (
            ("verified_cosine_mean", "final_cosine_mean"),
            ("verified_cosine_min", "final_cosine_min"),
            ("verified_cosine_std", "final_cosine_std"),
            ("verified_mse", "final_mse"),
        ):
            if src_key in stored:
                rec[dst_key] = stored[src_key]
        records.append(rec)
    with open(out_dir / "fit_results.json", "w") as f:
        json.dump(records, f, indent=2)
    print(
        f"Wrote {len(records)} fit_results.json records re-priced at "
        f"{args.scheme} storage"
        + (
            " with verified reloaded quality"
            if "verified_cosine_mean" in manifest
            else " (quality fields are the fp32 sweep's — no --kv_dir to verify)"
        )
    )


def _qat_repair(loaded: list[dict], scheme: str, epochs: int) -> None:
    """Batched straight-through fine-tune of every checkpoint's master
    weights against the stored grid (shared with the quantization
    experiment: `ops/qat.py:qat_finetune_checkpoints`, which also
    validates the batch is forward-homogeneous), applied in place so the
    saved payload is the tuned one."""
    from nerf_attention_tpu.ops.qat import qat_finetune_checkpoints

    print(
        f"QAT: fine-tuning {len(loaded)} checkpoints x {epochs} epochs "
        f"against the {scheme} grid (one batched program)"
    )
    for entry, per_net in zip(
        loaded, qat_finetune_checkpoints(loaded, scheme, epochs)
    ):
        entry["ckpt"]["params"] = per_net


def _verify(loaded: list[dict], out_dir: Path, manifest: dict) -> None:
    """Reload every stored file through the standard loader and re-measure
    CosSim against the cache — the round-trip proof the manifest records."""
    import jax.numpy as jnp

    from nerf_attention_tpu.experiments.quantized_params import _reconstruct
    from nerf_attention_tpu.io import checkpoint
    from nerf_attention_tpu.parallel.sweep import cosine_similarity

    cos_all = []
    for entry, rec in zip(loaded, manifest["checkpoints"]):
        ckpt = checkpoint.load_siren_checkpoint(out_dir / rec["file"])
        original = entry["original"]
        pred = _reconstruct(
            ckpt["params"],
            ckpt["config"].omega_0,
            original.shape[0],
            ckpt["target_mean"],
            ckpt["target_std"],
            fm_mult=ckpt.get("fm_mult"),
        )
        per_pos = np.asarray(
            cosine_similarity(jnp.asarray(pred), jnp.asarray(original))
        )
        cos = float(per_pos.mean())
        rec["verified_cosine_mean"] = cos
        rec["verified_cosine_min"] = float(per_pos.min())
        rec["verified_cosine_std"] = float(per_pos.std(ddof=1))
        rec["verified_mse"] = float(np.mean((pred - original) ** 2))
        cos_all.append(cos)
    manifest["verified_cosine_mean"] = float(np.mean(cos_all))
    print(
        f"Round-trip verified: mean CosSim {np.mean(cos_all):.4f} over "
        f"{len(cos_all)} reloaded checkpoints"
    )


if __name__ == "__main__":
    sys.exit(main())
