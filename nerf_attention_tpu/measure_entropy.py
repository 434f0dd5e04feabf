"""Measure per-(layer, kv-head) attention entropies from a model.

Beyond-reference CLI (round 4): produces the ``--entropy_json`` input of
``serve-plan --fits`` — the predicted serving-plan mode — so the full
real-weights workflow is three commands (extract + fit, measure-entropy,
serve-plan). The reference has no serving layer; its closest surface is
the per-tensor fit table (`/root/reference/nerf_attention/fit.py:95-118`),
which supplies the OTHER input of that mode.

Protocol (the head-policy experiment's measurement, productized —
``experiments/head_policy.py``): prefill the model on the text, re-decode
the last ``--queries`` in-prefix tokens over the full cache
(``llama_decode_step`` returns each token's per-head attention entropy in
nats), and average per (layer, kv-head) with GQA grouping
(``kv_head_entropy``). Works on any of the 12 supported HF checkpoint
families (``--model``; sink families also get cache-conditional stats) or on a hermetic random-init model
(``--random_init``, for demos and tests — random init has near-uniform
entropies; real checkpoints are the point).

Output schema is the dense layout ``serve_plan.load_entropy_json``
accepts: ``{"entropy_nats": [[...per kv-head...], ...per layer]}`` plus
provenance fields.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def measure_model_entropy(
    config, params, token_ids, *, n_queries: int = 8,
    sink_stats: bool = False,
):
    """(num_layers, num_kv_heads) mean attention entropy in nats.

    ``token_ids`` (S,) is the prefix; the last ``n_queries`` tokens are
    re-decoded at their own positions over the full prefill cache (each
    sees only rows strictly before itself plus its own concat column —
    the decode-mask contract of ``llama_decode_step``).

    ``sink_stats=True`` (attention-sink families, ``config.attn_sinks``)
    returns ``(entropy, cache_entropy, cache_mass)``: each head's sink
    mass is captured from the same decodes and the cache-conditional
    entropy is computed per (query, head) BEFORE the GQA group-mean
    (the identity is nonlinear — `head_policy.cache_conditional_entropy`).
    Sink-model serving plans must price on the cache-conditional stats:
    the full-distribution entropy counts the sink as sharpness, while
    the sink's mass is exactly the softmax fraction no cache row (and so
    no reconstruction error) can touch.
    """
    import jax
    import jax.numpy as jnp

    from nerf_attention_tpu.experiments.head_policy import (
        cache_conditional_entropy,
        kv_head_entropy,
    )
    from nerf_attention_tpu.models.llama_jax import (
        llama_decode_step,
        llama_prefill_kv,
    )

    ids = jnp.asarray(token_ids, jnp.int32)
    s = int(ids.shape[0])
    if not 0 < n_queries <= s:
        raise ValueError(f"n_queries must be in [1, {s}], got {n_queries}")
    keys, values = llama_prefill_kv(config, params, ids)
    ck = jnp.asarray(keys[:, :, :s, :])
    cv = jnp.asarray(values[:, :, :s, :])
    toks = ids[s - n_queries : s]
    pos = jnp.arange(s - n_queries, s, dtype=jnp.int32)

    @jax.jit
    def decode_all(toks, pos):
        fn = jax.vmap(
            lambda t, q: llama_decode_step(
                config, params, t, q, ck, cv, capture_sink_mass=True
            ),
            in_axes=(0, 0),
        )
        _, _, ent, smass = fn(toks, pos)
        return ent, smass  # each (n_queries, num_layers, num_heads)

    ent, smass = (np.asarray(a) for a in decode_all(toks, pos))
    n_kv = config.num_key_value_heads
    if not sink_stats:
        return kv_head_entropy(ent, n_kv)
    cache_ent = cache_conditional_entropy(ent, smass)
    return (
        kv_head_entropy(ent, n_kv),
        kv_head_entropy(cache_ent, n_kv),
        1.0 - kv_head_entropy(smass, n_kv),
    )


def measure_mla_entropy(config, params, token_ids, *, n_queries: int = 8):
    """(num_layers,) mean attention entropy for an MLA model (round 5).

    The MLA serving unit is the LAYER — every head reads one shared latent
    (`models/mla_jax.py`), so the per-(layer, kv-head) grouping of
    :func:`measure_model_entropy` collapses to a per-layer mean over query
    heads. Feeds the per-layer latent tiers of ``serve-plan --latent_json``
    (`tools/mla_latent_study.py` measures the matching solo costs).
    """
    import jax
    import jax.numpy as jnp

    from nerf_attention_tpu.models.mla_jax import (
        mla_decode_step,
        mla_prefill_kv,
    )

    ids = jnp.asarray(token_ids, jnp.int32)
    s = int(ids.shape[0])
    if not 0 < n_queries <= s:
        raise ValueError(f"n_queries must be in [1, {s}], got {n_queries}")
    keys, values = mla_prefill_kv(config, params, ids)
    toks = ids[s - n_queries : s]
    pos = jnp.arange(s - n_queries, s, dtype=jnp.int32)

    @jax.jit
    def decode_all(toks, pos):
        _, _, ent = jax.vmap(
            lambda t, q: mla_decode_step(config, params, t, q, keys, values),
            in_axes=(0, 0),
        )(toks, pos)
        return ent  # (n_queries, L, H)

    return np.asarray(decode_all(toks, pos)).mean(axis=(0, 2))


def _is_mla_checkpoint(model_dir: Path) -> bool:
    import json as _json

    cfg = Path(model_dir) / "config.json"
    if not cfg.exists():
        return False
    with open(cfg) as f:
        return _json.load(f).get("model_type") in ("deepseek_v2", "deepseek_v3")


def main(argv: list[str] | None = None) -> None:
    from nerf_attention_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    parser = argparse.ArgumentParser(
        description="Measure per-(layer, kv-head) attention entropies — "
        "the --entropy_json input of serve-plan --fits"
    )
    parser.add_argument(
        "--model", type=str, default=None,
        help="HF checkpoint directory (any of the 12 supported families)",
    )
    parser.add_argument(
        "--random_init", action="store_true",
        help="hermetic random-init model instead of a checkpoint (demo/test "
        "path; random init has near-uniform entropies)",
    )
    parser.add_argument(
        "--mla_random_init", action="store_true",
        help="hermetic random-init DeepSeek-style MLA model: per-LAYER "
        "latent units (the latent is shared by every head), one entropy "
        "column per layer — the serve-plan --latent_json geometry. MLA "
        "checkpoints are auto-detected under --model",
    )
    parser.add_argument("--seq_len", type=int, default=512)
    parser.add_argument(
        "--queries", type=int, default=8,
        help="how many tail in-prefix tokens to re-decode and average over",
    )
    parser.add_argument(
        "--text", type=str, default=None,
        help="path to a prompt file (default: the built-in sample text)",
    )
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument(
        "--sinks", action="store_true",
        help="random_init only: give every head a learnable attention sink "
        "(GPT-OSS attention) so the sink-aware output fields are "
        "exercised; checkpoints carry attn_sinks in their own config",
    )
    # Hermetic-model geometry (--random_init only; None sentinels let the
    # CLI reject these under --model instead of silently ignoring them).
    parser.add_argument("--layers", type=int, default=None)
    parser.add_argument("--heads", type=int, default=None)
    parser.add_argument("--kv_heads", type=int, default=None)
    parser.add_argument("--head_dim", type=int, default=None)
    parser.add_argument("--hidden", type=int, default=None)
    parser.add_argument("--intermediate", type=int, default=None)
    parser.add_argument("--vocab", type=int, default=None)
    parser.add_argument(
        "--out", type=str, default="results/entropy.json",
        help="where to write the entropy JSON",
    )
    args = parser.parse_args(argv)

    n_sources = sum(
        [args.model is not None, args.random_init, args.mla_random_init]
    )
    if n_sources != 1:
        parser.error(
            "pass exactly one of --model / --random_init / --mla_random_init"
        )
    geometry = {
        "layers": args.layers, "heads": args.heads,
        "kv_heads": args.kv_heads, "head_dim": args.head_dim,
        "hidden": args.hidden, "intermediate": args.intermediate,
        "vocab": args.vocab, "seed": args.seed,
    }
    if args.model is not None:
        if args.sinks:
            parser.error(
                "--sinks only applies to --random_init; a checkpoint's "
                "config says whether it has attention sinks"
            )
        set_flags = [f"--{k}" for k, v in geometry.items() if v is not None]
        if set_flags:
            parser.error(
                f"{' '.join(set_flags)} only apply to --random_init; a "
                f"checkpoint supplies its own geometry"
            )
    elif args.text is not None:
        parser.error(
            "--text only applies to --model; random inits measure over "
            "random token ids (random init has no meaningful vocabulary)"
        )
    if args.mla_random_init and args.sinks:
        parser.error("--sinks does not apply to MLA (no attention sinks)")
    if not 0 < args.queries <= args.seq_len:
        parser.error(f"--queries must be in [1, --seq_len={args.seq_len}]")

    mla = False
    if args.mla_random_init:
        from nerf_attention_tpu.models.mla_jax import MLAConfig, init_random_mla

        mla = True
        seed = 0 if args.seed is None else args.seed
        config = MLAConfig(
            model_type="deepseek_v3",
            vocab_size=args.vocab or 512,
            hidden_size=args.hidden or 128,
            intermediate_size=args.intermediate or 256,
            num_hidden_layers=args.layers or 4,
            num_attention_heads=args.heads or 8,
            kv_lora_rank=32,
            qk_nope_head_dim=args.head_dim or 16,
            qk_rope_head_dim=8,
            v_head_dim=args.head_dim or 16,
        )
        params = init_random_mla(config, seed=seed)
        ids = np.random.RandomState(seed).randint(
            0, config.vocab_size, args.seq_len
        )
        source = f"mla_random_init(seed={seed})"
    elif args.random_init:
        from nerf_attention_tpu.models.llama_jax import (
            LlamaConfig,
            init_random_llama,
        )

        seed = 0 if args.seed is None else args.seed
        config = LlamaConfig(
            vocab_size=args.vocab or 512,
            hidden_size=args.hidden or 256,
            intermediate_size=args.intermediate or 512,
            num_hidden_layers=args.layers or 8,
            num_attention_heads=args.heads or 8,
            num_key_value_heads=args.kv_heads or 4,
            head_dim=args.head_dim or 32,
            attn_sinks=args.sinks,
        )
        params = init_random_llama(config, seed=seed)
        ids = np.random.RandomState(seed).randint(
            0, config.vocab_size, args.seq_len
        )
        source = f"random_init(seed={seed})"
    else:
        from transformers import AutoTokenizer

        from nerf_attention_tpu.extract import get_sample_text
        from nerf_attention_tpu.models.llama_jax import load_llama_params

        text = (
            Path(args.text).read_text()
            if args.text is not None
            else get_sample_text()
        )
        # Tokenize BEFORE the (expensive) checkpoint load so a too-short
        # prompt fails in milliseconds, not after minutes of weight IO.
        tokenizer = AutoTokenizer.from_pretrained(args.model)
        ids = np.asarray(
            tokenizer(text, return_tensors="np").input_ids[0][: args.seq_len]
        )
        if ids.shape[0] < args.seq_len:
            print(
                f"note: text tokenizes to {ids.shape[0]} < --seq_len "
                f"{args.seq_len}; measuring at {ids.shape[0]}"
            )
        if args.queries > ids.shape[0]:
            parser.error(
                f"--queries {args.queries} > the {ids.shape[0]} tokens the "
                f"text provides"
            )
        if _is_mla_checkpoint(Path(args.model)):
            from nerf_attention_tpu.models.mla_jax import load_mla_params

            mla = True
            config, params = load_mla_params(Path(args.model))
        else:
            config, params = load_llama_params(Path(args.model))
        source = str(args.model)

    if mla:
        # MLA: the serving unit is the layer (one shared latent per token),
        # so the dense layout has ONE column per layer — serve-plan's
        # latent mode and load_entropy_json both accept it directly.
        ent_l = measure_mla_entropy(config, params, ids, n_queries=args.queries)
        result = {
            "entropy_nats": [[float(e)] for e in ent_l],
            "mla_latent": True,
            "latent_dim": int(config.latent_dim),
            "raw_latent_fp16_bytes_per_layer": int(
                ids.shape[0] * config.latent_dim * 2
            ),
            "attn_sinks": False,
            "layer_windows": [0] * int(config.num_hidden_layers),
            "model": source,
            "num_hidden_layers": int(config.num_hidden_layers),
            "seq_len": int(ids.shape[0]),
            "n_queries": int(args.queries),
            "uniform_entropy_nats": float(np.log(ids.shape[0])),
        }
        out = Path(args.out)
        out.parent.mkdir(parents=True, exist_ok=True)
        with open(out, "w") as f:
            json.dump(result, f, indent=2)
        print(
            f"Measured per-layer MLA entropies over {args.queries} queries at "
            f"S={ids.shape[0]}: {ent_l.min():.2f}-{ent_l.max():.2f} nats "
            f"(uniform = {np.log(ids.shape[0]):.2f}) -> {out}"
        )
        return

    sink_extra = {}
    if config.attn_sinks:
        ent, cache_ent, cache_mass = measure_model_entropy(
            config, params, ids, n_queries=args.queries, sink_stats=True
        )
        sink_extra = {
            "cache_entropy_nats": [
                [float(e) for e in row] for row in cache_ent
            ],
            "cache_mass": [[float(m) for m in row] for row in cache_mass],
            "sink_mass": [
                [float(1.0 - m) for m in row] for row in cache_mass
            ],
        }
    else:
        ent = measure_model_entropy(
            config, params, ids, n_queries=args.queries
        )
    lw = (
        [w or 0 for w in config.layer_windows]
        if config.layer_windows is not None
        else [config.sliding_window or 0] * config.num_hidden_layers
    )
    result = {
        "entropy_nats": [[float(e) for e in row] for row in ent],
        "attn_sinks": bool(config.attn_sinks),
        **sink_extra,
        # The checkpoint's sliding-window layer map (0 = full attention):
        # serve-plan caps raw-byte accounting with it (--layer_windows
        # semantics) so windowed models plan with honest net memory.
        "layer_windows": lw,
        "model": source,
        "num_hidden_layers": int(config.num_hidden_layers),
        "num_key_value_heads": int(config.num_key_value_heads),
        "seq_len": int(ids.shape[0]),
        "n_queries": int(args.queries),
        "uniform_entropy_nats": float(np.log(ids.shape[0])),
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(
        f"Measured entropies over {args.queries} queries at S={ids.shape[0]}: "
        f"{ent.min():.2f}-{ent.max():.2f} nats "
        f"(uniform = {np.log(ids.shape[0]):.2f}) -> {out}"
    )


if __name__ == "__main__":
    sys.exit(main())
