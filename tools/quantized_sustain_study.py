"""Quantized warm-starts: can a compressed artifact SUSTAIN a growing cache?

The r4 storage frontier says shared-omega nets ship at int4-g128+QAT
(6x, FINDINGS), and the incremental experiment says sustaining a growing
cache from the fp32 master is ~22x cheaper than refitting
(`experiments/incremental.py`). This tool closes the loop between them:
when the cache grows, can the server warm-restart from the DEQUANTIZED
stored payload, or must it keep the fp32 master weights around (doubling
the storage story back down)?

Protocol (same prefix semantics as the incremental experiment, one growth
step): fit at ``start_len`` on the prefix of a longer cache, then fine-tune
at ``start_len + chunk`` from three starts, each against the same
from-scratch control:

  * master      — the fp32 weights (the incremental experiment's row)
  * stored      — quantize_params(master, scheme)'s dequantized view (what
                  a server restoring from disk actually has)
  * stored_qat  — the QAT-repaired master's dequantized payload (the
                  shipped frontier point)

Reported per start: epochs to reach the scratch control's final quality
minus tolerance, read off per-epoch trajectories. If stored(_qat) needs
about the same epochs as master, the compressed artifact is sufficient to
sustain; a large gap means int rounding destroys the warm-start basin.

Run on the chip (reuses the incremental study's 4096 cache):
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/quantized_sustain_study.py \
        --kv_dir benchmarks/r4/hard_study/incremental/kv_cache
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--kv_dir", type=str,
        default="benchmarks/r4/hard_study/incremental/kv_cache",
        help="cache at the FINAL length (prefixes are earlier states)",
    )
    parser.add_argument(
        "--out", type=str, default="benchmarks/r4/quantized_sustain.json"
    )
    parser.add_argument("--scheme", type=str, default="int4_g128")
    parser.add_argument("--start_len", type=int, default=2048)
    parser.add_argument("--chunk", type=int, default=256)
    parser.add_argument("--layer", type=int, default=8)
    parser.add_argument("--max_heads", type=int, default=2)
    parser.add_argument("--epochs_full", type=int, default=2000)
    parser.add_argument("--warm_epochs", type=int, default=1000)
    parser.add_argument("--qat_epochs", type=int, default=300)
    parser.add_argument("--tolerance", type=float, default=0.005)
    parser.add_argument(
        "--fm_mult", type=float, default=None,
        help="run the whole protocol on FM-SIRENs (per-unit first-layer "
        "frequency multipliers up to this value); pair with the FM "
        "frontier's storage point, e.g. --scheme int8_g32",
    )
    args = parser.parse_args()

    from nerf_attention_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_attention_tpu.experiments.incremental import (
        _fit_with_trajectory,
        _init_batch,
    )
    from nerf_attention_tpu.io import kvstore
    from nerf_attention_tpu.ops.quantize import (
        parse_scheme,
        quantize_params,
        split_scheme,
    )
    from nerf_attention_tpu.types import CONFIGS_BY_NAME

    medium = CONFIGS_BY_NAME["medium"]
    _, bits, group = parse_scheme(args.scheme)
    skip_first = split_scheme(args.scheme)[1]
    if group is None:
        raise SystemExit(f"--scheme must be group-wise int, got {args.scheme!r}")

    kv_dir = Path(args.kv_dir)
    metadata = kvstore.load_metadata(kv_dir)
    grown_len = args.start_len + args.chunk
    if metadata.seq_len < grown_len:
        raise SystemExit(
            f"cache seq_len {metadata.seq_len} < start+chunk {grown_len}"
        )
    keys_a, values_a = kvstore.load_layer(kv_dir, args.layer)
    tensors = []
    for h in range(min(metadata.num_kv_heads, args.max_heads)):
        tensors.append(np.asarray(keys_a[h], np.float32))
        tensors.append(np.asarray(values_a[h], np.float32))
    full = np.stack(tensors)
    n = full.shape[0]
    log(f"backend={jax.default_backend()}, {n} tensors, "
        f"{args.start_len}->{grown_len}, scheme {args.scheme}")

    t0 = time.perf_counter()
    # Initial fit at start_len — the fp32 master every start derives from.
    master, _ = _fit_with_trajectory(
        jnp.asarray(full[:, : args.start_len]),
        _init_batch(n, medium, full.shape[-1], seed=0),
        config=medium, epochs=args.epochs_full, lr=1e-4, fm_mult=args.fm_mult,
    )

    def dequantize_batched(params):
        """Per-network dequantized view of the stored payload (the exact
        numpy storage grid), restacked into batched leaves."""
        leaves = [(np.asarray(w), np.asarray(b)) for w, b in params]
        per_net = [
            quantize_params([(w[i], b[i]) for w, b in leaves], args.scheme)[1]
            for i in range(n)
        ]
        return [
            (
                jnp.asarray(np.stack([net[l][0] for net in per_net])),
                jnp.asarray(np.stack([net[l][1] for net in per_net])),
            )
            for l in range(len(leaves))
        ]

    # QAT repair of the master at start_len (the shipped payload's weights).
    from nerf_attention_tpu.ops.qat import qat_finetune_batch
    from nerf_attention_tpu.parallel.sweep import normalize_targets

    tn = np.stack(
        [
            np.asarray(
                normalize_targets(jnp.asarray(t[: args.start_len]))[0]
            )
            for t in full
        ]
    )
    qat_master, _ = qat_finetune_batch(
        master, jnp.asarray(tn), omega=medium.omega_0, fm_mult=args.fm_mult,
        epochs=args.qat_epochs, group=group, bits=bits,
        # _l0fp32 schemes store layer 0 fp32 — the repair must tune against
        # the same grid the payload uses.
        skip_first=skip_first,
    )

    starts = {
        "master": master,
        "stored": dequantize_batched(master),
        "stored_qat": dequantize_batched(qat_master),
    }

    grown = jnp.asarray(full[:, :grown_len])
    _, scratch_traj = _fit_with_trajectory(
        grown, _init_batch(n, medium, full.shape[-1], seed=1),
        config=medium, epochs=args.epochs_full, lr=1e-4, fm_mult=args.fm_mult,
    )
    scratch_final = float(np.asarray(scratch_traj)[:, -1].mean())
    target_q = scratch_final - args.tolerance

    results = {
        "scheme": args.scheme,
        "fm_mult": args.fm_mult,
        "start_len": args.start_len,
        "grown_len": grown_len,
        "n_tensors": n,
        "tolerance": args.tolerance,
        "scratch_final_cosine": scratch_final,
        "scratch_epochs": args.epochs_full,
        "qat_epochs": args.qat_epochs,
        "starts": {},
    }
    for name, params in starts.items():
        _, traj = _fit_with_trajectory(
            grown, params, config=medium, epochs=args.warm_epochs, lr=1e-4,
            fm_mult=args.fm_mult,
        )
        mean = np.asarray(traj).mean(axis=0)
        hits = np.nonzero(mean >= target_q)[0]
        rec = {
            "start_cosine": float(mean[0]),
            "final_cosine": float(mean[-1]),
            "epochs_to_parity": int(hits[0]) if hits.size else None,
            "warm_epochs_budget": args.warm_epochs,
        }
        results["starts"][name] = rec
        log(f"  {name}: start {rec['start_cosine']:.4f} -> final "
            f"{rec['final_cosine']:.4f}, parity at "
            f"{rec['epochs_to_parity'] if rec['epochs_to_parity'] is not None else f'>{args.warm_epochs}'}"
            f" (scratch {scratch_final:.4f})")

    results["wall_seconds"] = time.perf_counter() - t0
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    log(f"wrote {out} in {results['wall_seconds']:.0f}s")


if __name__ == "__main__":
    main()
