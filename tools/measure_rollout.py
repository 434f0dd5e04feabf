"""Measure the T-token rollout scan against the per-step decode loop.

`llama_decode_rollout` exists because autoregressive serving is a
dependent chain: a per-token dispatch pays the host->device round trip T
times, and through a tunneled chip (CLAUDE.md: sub-ms per-call timing
measures RTT, not the device) that overhead IS the decode latency. This
tool prices both implementations of the same serving loop on the real
chip:

  * loop — T x (`llama_decode_step` + two `dynamic_update_slice`
    appends), host-materializing each token's hidden state: the naive
    server;
  * scan — ONE `llama_decode_rollout` dispatch.

Both produce identical hidden states
(`tests/test_llama_jax.py::test_decode_rollout_matches_sequential_steps`);
only the dispatch structure differs. Writes ``rollout_dispatch.json``
under --out.

Run on the real chip:
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/measure_rollout.py \
        --out benchmarks/r4
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
    parser.add_argument("--out", type=str, default="benchmarks/r4")
    parser.add_argument("--seq_len", type=int, default=512)
    parser.add_argument("--steps", type=int, default=64)
    parser.add_argument("--layers", type=int, default=8)
    parser.add_argument("--samples", type=int, default=5)
    args = parser.parse_args()

    from nerf_attention_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_attention_tpu.models.llama_jax import (
        LlamaConfig,
        init_random_llama,
        llama_decode_rollout,
        llama_decode_step,
        llama_prefill_kv,
    )

    config = LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_hidden_layers=args.layers, num_attention_heads=8,
        num_key_value_heads=4, head_dim=32,
    )
    s, t_steps = args.seq_len, args.steps
    params = init_random_llama(config, seed=0)
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, config.vocab_size, s + t_steps), jnp.int32)
    keys, values = llama_prefill_kv(config, params, ids)
    pad = jnp.zeros(keys.shape[:2] + (t_steps, keys.shape[3]), keys.dtype)
    k_buf0 = jnp.concatenate([keys[:, :, :s, :], pad], axis=2)
    v_buf0 = jnp.concatenate([values[:, :, :s, :], pad], axis=2)
    toks = ids[s:]
    log(f"backend={jax.default_backend()}  L={args.layers} S={s} T={t_steps}")

    update = jax.jit(
        lambda buf, row, pos: jax.lax.dynamic_update_slice(
            buf, row, (0, 0, pos, 0)
        )
    )

    def run_loop():
        kb, vb = k_buf0, v_buf0
        last = None
        for t in range(t_steps):
            h, (kn, vn), _ = llama_decode_step(
                config, params, toks[t], s + t, kb, vb
            )
            kb = update(kb, kn, s + t)
            vb = update(vb, vn, s + t)
            last = np.asarray(h)  # the server reads every token out
        return last

    def run_scan():
        hs, _, _, _ = llama_decode_rollout(
            config, params, toks, s, k_buf0, v_buf0
        )
        return np.asarray(hs)[-1]

    # Warm both programs (compiles excluded from timing), then interleave
    # samples so contention hits both arms alike.
    h_loop = run_loop()
    h_scan = run_scan()
    np.testing.assert_allclose(h_loop, h_scan, atol=1e-5, rtol=1e-5)
    loop_s, scan_s = [], []
    for _ in range(args.samples):
        t0 = time.perf_counter()
        run_loop()
        loop_s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run_scan()
        scan_s.append(time.perf_counter() - t0)

    loop_ms = float(np.median(loop_s) * 1e3)
    scan_ms = float(np.median(scan_s) * 1e3)
    result = {
        "model": {
            "num_hidden_layers": args.layers, "seq_len": s,
            "rollout_steps": t_steps,
        },
        "samples": args.samples,
        "loop_ms_median": loop_ms,
        "scan_ms_median": scan_ms,
        "loop_ms_all": [float(x * 1e3) for x in loop_s],
        "scan_ms_all": [float(x * 1e3) for x in scan_s],
        "per_token_ms_loop": loop_ms / t_steps,
        "per_token_ms_scan": scan_ms / t_steps,
        "speedup": loop_ms / scan_ms,
        "note": (
            "loop = T x (decode_step + 2 appends) with per-token host "
            "readout; scan = one llama_decode_rollout dispatch. Identical "
            "outputs asserted before timing. Through a tunneled chip the "
            "loop is dispatch-RTT-bound (CLAUDE.md), which is the point."
        ),
    }
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "rollout_dispatch.json", "w") as f:
        json.dump(result, f, indent=2)
    log(
        f"loop {loop_ms:.1f} ms ({loop_ms / t_steps:.2f} ms/tok) vs scan "
        f"{scan_ms:.1f} ms ({scan_ms / t_steps:.3f} ms/tok) — "
        f"{result['speedup']:.1f}x"
    )
    log(f"wrote {out_dir / 'rollout_dispatch.json'}")


if __name__ == "__main__":
    main()
