"""Head-selection policy: which heads to serve from parameters at a budget.

Beyond-reference experiment (the reference has no serving layer; its
closest surface is the per-tensor fit table,
`/root/reference/nerf_attention/fit.py:20-118`). The r4 entropy law
(`experiments/attention_error.py`, `benchmarks/r4/attention_error_entropy_law.json`)
prices a K/V reconstruction at one attention output: error scales as
(1 - proxy) * e^(-H) in the head's weight entropy H. The full-model
end-metric study (`tools/model_end_metric_study.py`) showed the law
survives depth but that PARTIAL cache swaps interact with layer position
(early-layer-only swaps dip below the full swap). This experiment asks
the operator's question those two findings set up: given a memory budget
that lets only a FRACTION of (layer, kv-head) cache slices be served
from SIREN parameters, which slices should they be — and is the entropy
law's ranking actually optimal at the model output, or does depth
override it?

Protocol (hermetic — random-init model, no weights in this environment):

* per-(layer, kv-head) gains, log-spaced and shuffled, scale each head's
  K projection slice, inducing REAL per-head entropy diversity (the
  thing random init lacks and real checkpoints have — this unblocks the
  policy experiment the r4 roadmap marked degenerate);
* per-head entropies are MEASURED from `llama_decode_step`'s entropy
  output on the true cache, never assumed from the gains;
* every (layer, kv-head, K|V) slice is fitted by one SIREN in a single
  batched program (the sweep's exact trainer);
* per-unit SOLO swaps (one head served from parameters, all others true)
  measure each unit's standalone output cost and re-fit the entropy law
  at the model output;
* selection policies (entropy-ranked, law-priced, proxy-ranked,
  layer-position, random, adversarial) are swept over the budget axis,
  each point one masked decode, and compared at the final-hidden-state
  cosine;
* the serve-plan ranking (measured solo cost ascending — exactly what
  ``serve_plan.build_plan`` emits in ``--policy_json`` mode) is decoded
  as its own curve for every payload, and ``serve_plan_validation``
  records cumulative-sum-vs-measured cost along it, pricing the plan
  tool's cut rule against ground truth;
* with ``num_local_experts`` set (sparse-MoE FFNs — Mixtral-style
  softmax-then-top-k or GPT-OSS-style top-k-then-softmax via
  ``moe_style``), the router's top-k expert selections are replayed
  outside the forward from captured router inputs (``route_weights`` /
  ``route_weights_gpt_oss``) and the FLIP RATE — the stack's one
  discontinuous error channel — is measured along the same budget axis
  (``moe_routing``);
* with ``attn_sinks`` (GPT-OSS attention), per-unit sink-logit offsets
  induce sink-mass diversity decorrelated from the gain axis, the true
  decode captures each head's SINK MASS (the softmax fraction no cache
  row can influence), and the sink-aware rankings ``law_sink``
  ((1-proxy) * e^(-H_cache) * cache_mass on the cache-conditional
  entropy) and ``cache_mass_asc`` join the sweep — the falsifiable
  prediction being that the sink-blind law misprices sink-dominated
  heads (their full-distribution entropy reads sharp = expensive while
  their cache rows carry no mass = actually free).

Writes ``head_policy_results.json`` + a two-panel figure.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

DEFAULT_POLICIES = (
    "law",           # ascending predicted cost (1 - proxy) * e^(-H)
    "entropy_desc",  # most-diffuse heads first (entropy law, quality-blind)
    "proxy_desc",    # best-fit heads first (the table a reference user has)
    "late_first",    # deepest layers first (the rollout-direction finding)
    "entropy_asc",   # sharpest heads first (adversarial bound)
)

_DECODE_CHUNK = 32  # masks per jitted dispatch (one compile for the run)


def assign_head_gains(
    n_layers: int, n_kv: int, *, lo: float = 1.0, hi: float = 64.0,
    seed: int = 0,
) -> np.ndarray:
    """Log-spaced per-(layer, kv-head) logit gains, shuffled across units.

    Shuffling decorrelates gain from layer index so the entropy and
    layer-position policies are genuinely distinct rankings.
    """
    n = n_layers * n_kv
    gains = np.logspace(np.log10(lo), np.log10(hi), n)
    np.random.RandomState(seed).shuffle(gains)
    return gains.reshape(n_layers, n_kv).astype(np.float64)


def assign_sink_offsets(
    n_layers: int, n_kv: int, *, lo: float = -4.0, hi: float = 18.0,
    seed: int = 0,
) -> np.ndarray:
    """Linearly spaced per-(layer, kv-head) sink-logit offsets, shuffled.

    Sinks are LOGITS, so the knob is additive and linear (gains on K are
    multiplicative because they scale a dot product). Shuffled with a
    seed offset so sink dominance decorrelates from the K-gain sharpness
    axis — the sink leg needs heads that are sharp-but-sinkless and
    diffuse-but-sink-dominated to tell the rankings apart. The default
    range is calibrated against the default gain range at S=512: the
    sink competes with ~logsumexp(cache logits) (= ln S for gain-1
    heads, tens of nats for gain-64 ones), and [-4, 18] spreads the
    measured sink mass over quartiles ~0.004/0.27/0.996 — a narrow
    [-2, 6] leaves the median head at 0.004 mass and the sink axis
    unmeasurable (benchmarks/r4/head_policy_sinks/narrow_*).
    """
    n = n_layers * n_kv
    offsets = np.linspace(lo, hi, n)
    np.random.RandomState(seed + 101).shuffle(offsets)
    return offsets.reshape(n_layers, n_kv).astype(np.float64)


def apply_sink_offsets(config, params: dict, offsets: np.ndarray) -> dict:
    """Add per-(layer, kv-head) offsets to the learnable sink logits.

    The sink competes with the cache columns inside one softmax
    (`models/llama_jax.py:_layer_decode`), so raising a head's sink
    logit moves probability mass off every cache row — the per-head
    "how much of this head can a cache reconstruction even touch" knob.
    Offsets repeat across each kv head's GQA query group.
    """
    import jax.numpy as jnp

    group = config.num_attention_heads // config.num_key_value_heads
    off = np.repeat(np.asarray(offsets, np.float32), group, axis=1)
    layers = dict(params["layers"])
    layers["sinks"] = layers["sinks"] + jnp.asarray(off)
    return {**params, "layers": layers}


def cache_conditional_entropy(
    ent_full: np.ndarray, sink_mass: np.ndarray
) -> np.ndarray:
    """Entropy of the cache-row distribution given the full-softmax stats.

    With sink mass p and full entropy H (both over [cache rows, sink]),
    the renormalized cache-row distribution q_i = p_i / (1-p) has

        H_cache = (H + p*ln(p)) / (1-p) + ln(1-p)

    (H + p*ln(p) is exactly the cache rows' unnormalized -sum p_i ln p_i).
    p=0 reduces to H; p->1 is guarded (a fully sink-dominated head has no
    cache distribution to speak of — entropy reported as 0).
    """
    p = np.clip(np.asarray(sink_mass, np.float64), 0.0, 1.0 - 1e-9)
    c = 1.0 - p
    plogp = np.where(p > 0, p * np.log(np.maximum(p, 1e-300)), 0.0)
    return np.maximum((np.asarray(ent_full, np.float64) + plogp) / c
                      + np.log(c), 0.0)


def apply_head_gains(config, params: dict, gains: np.ndarray) -> dict:
    """Scale each (layer, kv-head)'s K projection slice by its gain.

    RoPE is a rotation (linear), so a pre-RoPE K scale of g multiplies
    that head's attention logits by g — a per-head sharpness knob. The
    cache CONTENT changes too (scaled keys, drifted deeper activations);
    the controlled comparisons are between policies on the same cache.
    """
    import jax.numpy as jnp

    d = int(config.head_dim)
    scale = np.repeat(np.asarray(gains, np.float32), d, axis=1)  # (L, kv*d)
    layers = dict(params["layers"])
    layers["k"] = layers["k"] * jnp.asarray(scale)[:, None, :]
    layers["k_bias"] = layers["k_bias"] * jnp.asarray(scale)
    return {**params, "layers": layers}


def kv_head_entropy(ent: np.ndarray, n_kv: int) -> np.ndarray:
    """Per-kv-head mean attention entropy from a (T, L, H) decode sample.

    GQA maps kv head i to query heads [i*g, (i+1)*g) — `jnp.repeat`
    order in the attention path (`models/llama_jax.py:412-415`).
    """
    t, n_l, n_h = ent.shape
    group = n_h // n_kv
    return ent.reshape(t, n_l, n_kv, group).mean(axis=(0, 3))


def route_weights(
    ffn_x: np.ndarray, routers: np.ndarray, top_k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Recompute MoE combine weights from captured router inputs.

    ``ffn_x`` (T, L, 1, hidden) is `llama_decode_step`'s
    ``capture_ffn_input=True`` output — each layer's normed FFN input;
    ``routers`` (L, hidden, E) the per-layer router weights. Replays
    `_ffn`'s eval-path routing (`models/llama_jax.py:325-334`: fp32
    softmax over all experts, top-k, renormalize) outside the forward.

    Returns (weights (T, L, E) renormalized top-k combine weights,
    top_idx (T, L, top_k) the selected experts, ascending). Softmax is
    monotone, so top-k of the probabilities equals top-k of the logits.
    """
    x = np.asarray(ffn_x, np.float32)[:, :, 0, :]
    logits = np.einsum("tlh,lhe->tle", x, np.asarray(routers, np.float32))
    z = logits - logits.max(axis=-1, keepdims=True)
    p = np.exp(z)
    p /= p.sum(axis=-1, keepdims=True)
    idx = np.argsort(-p, kind="stable", axis=-1)[..., :top_k]
    vals = np.take_along_axis(p, idx, axis=-1)
    vals = vals / vals.sum(axis=-1, keepdims=True)
    weights = np.zeros_like(p)
    np.put_along_axis(weights, idx, vals, axis=-1)
    return weights, np.sort(idx, axis=-1)


def route_weights_gpt_oss(
    ffn_x: np.ndarray, routers: np.ndarray, router_bias: np.ndarray,
    top_k: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Recompute GPT-OSS MoE combine weights from captured router inputs.

    GPT-OSS routing reverses Mixtral's order (`models/llama_jax.py:
    _ffn_gpt_oss`): top-k runs on the raw BIASED logits, then softmax
    normalizes over just the k survivors. Same return contract as
    `route_weights`: (weights (T, L, E), top_idx (T, L, top_k) ascending).
    """
    x = np.asarray(ffn_x, np.float32)[:, :, 0, :]
    logits = np.einsum(
        "tlh,lhe->tle", x, np.asarray(routers, np.float32)
    ) + np.asarray(router_bias, np.float32)[None]
    idx = np.argsort(-logits, kind="stable", axis=-1)[..., :top_k]
    vals = np.take_along_axis(logits, idx, axis=-1)
    z = vals - vals.max(axis=-1, keepdims=True)
    p = np.exp(z)
    p /= p.sum(axis=-1, keepdims=True)
    weights = np.zeros_like(logits)
    np.put_along_axis(weights, idx, p, axis=-1)
    return weights, np.sort(idx, axis=-1)


def policy_orders(
    entropy_u: np.ndarray,
    proxy_u: np.ndarray,
    *,
    n_layers: int,
    n_kv: int,
    n_random: int = 3,
    seed: int = 0,
    cache_entropy_u: np.ndarray | None = None,
    cache_mass_u: np.ndarray | None = None,
) -> dict[str, np.ndarray]:
    """Unit orderings (first = first slice served from parameters).

    ``cache_entropy_u``/``cache_mass_u`` (set together, sink models only)
    add the sink-aware rankings: ``law_sink`` prices a unit at
    (1 - proxy) * e^(-H_cache) * cache_mass — the law evaluated on the
    distribution a reconstruction can actually touch, weighted by how
    much of the softmax that is — and ``cache_mass_asc`` serves the most
    sink-dominated heads first (mass alone, quality-blind).
    """
    n = entropy_u.size
    pred_cost = (1.0 - proxy_u) * np.exp(-entropy_u)
    layer_of = np.arange(n) // n_kv
    orders = {
        "law": np.argsort(pred_cost, kind="stable"),
        "entropy_desc": np.argsort(-entropy_u, kind="stable"),
        "proxy_desc": np.argsort(-proxy_u, kind="stable"),
        # deepest layers first; entropy breaks ties within a layer
        "late_first": np.lexsort((-entropy_u, -layer_of)),
        "entropy_asc": np.argsort(entropy_u, kind="stable"),
    }
    if cache_entropy_u is not None:
        sink_cost = (
            (1.0 - proxy_u) * np.exp(-cache_entropy_u) * cache_mass_u
        )
        orders["law_sink"] = np.argsort(sink_cost, kind="stable")
        orders["cache_mass_asc"] = np.argsort(cache_mass_u, kind="stable")
    rng = np.random.RandomState(seed)
    for i in range(n_random):
        orders[f"random_{i}"] = rng.permutation(n)
    return orders


def _masks_for(orders: dict[str, np.ndarray], budgets, n_units: int):
    """All swap masks the study needs, deduplicated, as one (B, n) array.

    Returns (masks, solo_idx (n_units,), curve_idx {policy: (len(budgets),)}).
    """
    mask_index: dict[bytes, int] = {}
    masks: list[np.ndarray] = []

    def intern(mask: np.ndarray) -> int:
        key = np.packbits(mask).tobytes()
        if key not in mask_index:
            mask_index[key] = len(masks)
            masks.append(mask)
        return mask_index[key]

    solo_idx = np.empty(n_units, dtype=np.int64)
    for u in range(n_units):
        m = np.zeros(n_units, dtype=bool)
        m[u] = True
        solo_idx[u] = intern(m)
    curve_idx: dict[str, np.ndarray] = {}
    for name, order in orders.items():
        idx = np.empty(len(budgets), dtype=np.int64)
        for j, m_units in enumerate(budgets):
            m = np.zeros(n_units, dtype=bool)
            m[order[:m_units]] = True
            idx[j] = intern(m)
        curve_idx[name] = idx
    return np.stack(masks), solo_idx, curve_idx


def run_head_policy_experiment(
    output_dir: Path,
    *,
    seq_len: int = 512,
    n_queries: int = 8,
    epochs: int = 2000,
    config_name: str = "small",
    num_layers: int = 8,
    num_heads: int = 8,
    num_kv_heads: int = 4,
    head_dim: int = 32,
    hidden_size: int = 256,
    intermediate_size: int = 512,
    gain_lo: float = 1.0,
    gain_hi: float = 64.0,
    num_local_experts: int | None = None,
    moe_style: str = "mixtral",
    attn_sinks: bool = False,
    sink_lo: float = -4.0,
    sink_hi: float = 18.0,
    sliding_window: int | None = None,
    attn_logit_softcap: float | None = None,
    nope: bool = False,
    schemes: tuple[str, ...] = ("int8_g32_l0fp32",),
    qat_epochs: int = 300,
    budget_points: int = 8,
    n_random: int = 3,
    seed: int = 0,
    impl: str = "auto",
    fm_mult: float | None = None,
    verbose: bool = True,
) -> dict:
    """Run the policy sweep; returns (and writes) the results dict."""
    import jax
    import jax.numpy as jnp

    from nerf_attention_tpu.experiments.attention_error import (
        _quantized_view,
        _reconstruct,
    )
    from nerf_attention_tpu.models.llama_jax import (
        LlamaConfig,
        init_random_llama,
        llama_decode_step,
        llama_prefill_kv,
    )
    from nerf_attention_tpu.ops.quantize import param_bytes, parse_scheme
    from nerf_attention_tpu.parallel.sweep import fit_batch
    from nerf_attention_tpu.types import CONFIGS_BY_NAME

    for s in schemes:  # fail fast before any device time (quantize contract)
        base = s[: -len("_qat")] if s.endswith("_qat") else s
        kind, _, group = parse_scheme(base)
        if s.endswith("_qat") and (kind != "int" or group is None):
            raise ValueError(
                f"QAT needs a group-wise integer base scheme, got {s!r}"
            )

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    net = CONFIGS_BY_NAME[config_name]
    t0 = time.perf_counter()

    # num_local_experts swaps every layer's dense MLP for a Mixtral-style
    # sparse-MoE block (top-2 routing). The policy question it adds: a
    # reconstructed cache perturbs hidden states, which can FLIP router
    # top-k selections — a DISCONTINUOUS error channel the dense stack
    # lacks. Does the (1-proxy)*e^(-H) law survive it?
    # GPT-OSS layer alternation: sliding unless (i+1) is even (the HF
    # GptOssConfig derivation _resolve_windows reproduces) — layers
    # 0, 2, 4, ... window-masked, the rest full attention.
    layer_windows = (
        tuple(
            sliding_window if (i + 1) % 2 else None
            for i in range(num_layers)
        )
        if sliding_window
        else None
    )
    # Round-5 stress axes (VERDICT #4): `attn_logit_softcap` compresses the
    # logit range the entropies are computed from (gemma2's cap*tanh(x/cap)
    # — does the (1-proxy)*e^-H law survive a squashed-H axis?); `nope`
    # turns FULL-attention layers position-blind (cohere2's
    # rope_skip_full_layers — with --hp_window, sliding layers keep rope,
    # the true command-r7b pattern; without, every layer is NoPE), changing
    # what position structure the SIRENs can exploit.
    config = LlamaConfig(
        vocab_size=512,
        hidden_size=hidden_size,
        intermediate_size=intermediate_size,
        num_hidden_layers=num_layers,
        num_attention_heads=num_heads,
        num_key_value_heads=num_kv_heads,
        head_dim=head_dim,
        num_local_experts=num_local_experts,
        moe_style=moe_style,
        attn_sinks=attn_sinks,
        layer_windows=layer_windows,
        attn_logit_softcap=attn_logit_softcap,
        rope_skip_full_layers=nope,
    )
    n_l, n_kv, d, s = num_layers, num_kv_heads, head_dim, seq_len
    n_units = n_l * n_kv

    gains = assign_head_gains(n_l, n_kv, lo=gain_lo, hi=gain_hi, seed=seed)
    params = apply_head_gains(config, init_random_llama(config, seed=seed), gains)
    sink_offsets = None
    if attn_sinks:
        # A second, decorrelated per-unit axis: how much of each head's
        # softmax the SINK absorbs. Random-init sink logits sit in the
        # same range as the (gained) cache logits, so without offsets
        # sink mass would just mirror the gain axis.
        sink_offsets = assign_sink_offsets(
            n_l, n_kv, lo=sink_lo, hi=sink_hi, seed=seed
        )
        params = apply_sink_offsets(config, params, sink_offsets)

    rng = np.random.RandomState(seed)
    # Queries are the last n_queries IN-PREFIX tokens (each re-decoded at
    # its own position over the swappable cache), so exactly s tokens are
    # ever needed. randint draws sequentially, so this stream equals the
    # first s values of any longer draw — artifact-stable across sizings.
    ids = jnp.asarray(rng.randint(0, config.vocab_size, s), jnp.int32)
    keys, values = llama_prefill_kv(config, params, ids)
    ck = jnp.asarray(keys[:, :, :s, :])
    cv = jnp.asarray(values[:, :, :s, :])
    tokens = ids[s - n_queries : s]
    positions = jnp.arange(s - n_queries, s, dtype=jnp.int32)

    @jax.jit
    def decode_true(p, toks, pos, k_c, v_c):
        fn = jax.vmap(
            lambda t, q: llama_decode_step(
                config, p, t, q, k_c, v_c, capture_sink_mass=True
            ),
            in_axes=(0, 0),
        )
        h, _, ent, smass = fn(toks, pos)
        return h, ent, smass

    @jax.jit
    def decode_masked(p, toks, pos, k_c, v_c, k_hat, v_hat, unit_masks, h_ref):
        """(B, n_units) bool -> (B, T) output cosine vs the h_ref decode."""

        def one(mask):
            m = mask.reshape(n_l, n_kv)[:, :, None, None]
            ka = jnp.where(m, k_hat, k_c)
            va = jnp.where(m, v_hat, v_c)
            h, _, _ = jax.vmap(
                lambda t, q: llama_decode_step(config, p, t, q, ka, va),
                in_axes=(0, 0),
            )(toks, pos)
            return h

        h = jax.vmap(one)(unit_masks)  # (B, T, hidden)
        num = jnp.sum(h * h_ref[None], -1)
        den = jnp.maximum(
            jnp.linalg.norm(h, axis=-1) * jnp.linalg.norm(h_ref, axis=-1)[None],
            1e-12,
        )
        return num / den

    h_true, ent_true, smass_true = decode_true(params, tokens, positions, ck, cv)
    ent_u = kv_head_entropy(np.asarray(ent_true), n_kv).reshape(-1)  # (units,)
    cache_ent_u = cache_mass_u = None
    if attn_sinks:
        # Per-token, per-query-head cache-conditional stats FIRST (the
        # entropy identity is nonlinear), then the same GQA group-mean
        # the full entropy uses.
        cache_ent = cache_conditional_entropy(
            np.asarray(ent_true), np.asarray(smass_true)
        )
        cache_ent_u = kv_head_entropy(cache_ent, n_kv).reshape(-1)
        sink_u = kv_head_entropy(np.asarray(smass_true), n_kv).reshape(-1)
        cache_mass_u = 1.0 - sink_u

    # --- fit every slice in one batched program (K rows then V rows) ---
    targets = np.concatenate([np.asarray(ck), np.asarray(cv)]).reshape(
        2 * n_units, s, d
    )
    fit = fit_batch(
        targets, net, epochs=epochs, seed=seed, impl=impl, fm_mult=fm_mult
    )
    k_cos = np.asarray(fit.cosine_mean[:n_units], np.float64)
    v_cos = np.asarray(fit.cosine_mean[n_units:], np.float64)
    proxy_u = 0.5 * (k_cos + v_cos)
    if verbose:
        print(
            f"Head policy: L={n_l} kv={n_kv} S={s} {net.name} x {epochs} ep | "
            f"entropy {ent_u.min():.2f}-{ent_u.max():.2f} nats | "
            f"fit K {k_cos.mean():.4f} V {v_cos.mean():.4f}"
        )

    orders = policy_orders(
        ent_u, proxy_u, n_layers=n_l, n_kv=n_kv, n_random=n_random, seed=seed,
        cache_entropy_u=cache_ent_u, cache_mass_u=cache_mass_u,
    )
    step = max(1, n_units // budget_points)
    budgets = list(range(0, n_units + 1, step))
    if budgets[-1] != n_units:
        budgets.append(n_units)
    masks, solo_idx, curve_idx = _masks_for(orders, budgets, n_units)

    def decode_cosines(k_hat, v_hat, sub: np.ndarray) -> np.ndarray:
        """Mean-over-queries output cosine for each (n_units,) mask in sub."""
        vals = np.empty(sub.shape[0], dtype=np.float64)
        for lo_i in range(0, sub.shape[0], _DECODE_CHUNK):
            chunk = sub[lo_i : lo_i + _DECODE_CHUNK]
            pad = _DECODE_CHUNK - chunk.shape[0]
            if pad:  # keep one compiled shape for every dispatch
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, n_units), dtype=bool)]
                )
            cos = np.asarray(
                decode_masked(
                    params, tokens, positions, ck, cv,
                    jnp.asarray(k_hat), jnp.asarray(v_hat),
                    jnp.asarray(chunk), h_true,
                )
            ).mean(axis=1)
            vals[lo_i : lo_i + _DECODE_CHUNK - pad] = cos[: _DECODE_CHUNK - pad]
        return vals

    def cosine_for_masks(k_hat, v_hat, idx=None) -> np.ndarray:
        """Mean-over-queries output cosine, indexed like the interned masks.

        ``idx`` restricts the decode to a subset of masks (entries outside
        it come back NaN) — stored schemes read the policy CURVE masks
        plus the n_units SOLO masks (per-scheme solo costs feed the
        tiered planner), skipping any leftover interned masks.
        """
        sel = np.arange(masks.shape[0]) if idx is None else np.asarray(idx)
        out = np.full(masks.shape[0], np.nan)
        out[sel] = decode_cosines(k_hat, v_hat, masks[sel])
        return out

    # --- payload views: master fit + each stored scheme ---
    raw_slice_bytes = 2 * s * d * 2  # one unit's K+V at raw fp16, full S
    # Per-unit serving-relevant raw bytes: a sliding layer only ever
    # reads its last min(S, W) cache rows, so that is all the true cache
    # a served unit frees (`serve_plan.apply_layer_windows` semantics).
    window_of = [
        layer_windows[u // n_kv] if layer_windows else None
        for u in range(n_units)
    ]
    raw_bytes_u = [
        2 * min(s, w or s) * d * 2 for w in window_of
    ]
    # Stored schemes decode their policy-curve masks AND the n_units solo
    # masks: per-(unit, scheme) solo costs are what lets a TIERED serving
    # plan assign each unit its cheapest-bytes scheme under a shared
    # output-cost budget (serve_plan --tiered).
    curve_mask_idx = np.unique(
        np.concatenate([solo_idx] + list(curve_idx.values()))
    )
    payloads: dict[str, dict] = {}
    results_payloads: dict[str, dict] = {}
    for scheme in ("master",) + tuple(schemes):
        if scheme == "master":
            view = fit
        else:
            view = _quantized_view(
                fit, scheme, targets=targets, config=net,
                fm_mult=fm_mult, qat_epochs=qat_epochs,
            )
        # stored bytes for ONE unit = its K net + V net under the scheme
        # (the dequantized view keeps the stored layout's shapes; a _qat
        # payload ships in its base scheme's layout)
        one = [(np.asarray(w)[0], np.asarray(b)[0]) for w, b in view.params]
        price_scheme = (
            "fp32" if scheme == "master"
            else scheme[: -len("_qat")] if scheme.endswith("_qat")
            else scheme
        )
        unit_bytes = 2 * param_bytes(one, price_scheme)
        recon = _reconstruct(view, np.arange(2 * n_units), s, net, fm_mult)
        k_hat = jnp.asarray(recon[:n_units].reshape(n_l, n_kv, s, d))
        v_hat = jnp.asarray(recon[n_units:].reshape(n_l, n_kv, s, d))
        cos_all = cosine_for_masks(
            k_hat, v_hat, idx=None if scheme == "master" else curve_mask_idx
        )
        payloads[scheme] = {"cos_all": cos_all}
        if scheme == "master":
            # The serve-plan ranking: MEASURED solo cost ascending, the
            # exact order `serve_plan.build_plan` emits in --policy_json
            # mode (its (cost, layer, kv_head) tie-break equals stable
            # argsort here because units are layer-major). Only knowable
            # after the master solo decodes, hence built mid-loop and
            # decoded as a second pass for every payload.
            solo_cos = cos_all[solo_idx]
            solo_cost = np.maximum(1.0 - solo_cos, 0.0)
            solo_asc = np.argsort(solo_cost, kind="stable")
            serve_masks = np.zeros((len(budgets), n_units), dtype=bool)
            for j, m in enumerate(budgets):
                serve_masks[j, solo_asc[:m]] = True
        serve_cos = decode_cosines(k_hat, v_hat, serve_masks)
        payloads[scheme]["serve_cos"] = serve_cos
        payloads[scheme]["k_hat"] = k_hat  # retained for the tiered mix
        payloads[scheme]["v_hat"] = v_hat
        scheme_solo_cost = np.maximum(1.0 - cos_all[solo_idx], 0.0)
        results_payloads[scheme] = {
            "stored_bytes_per_unit": unit_bytes,
            "raw_bytes_per_unit": raw_slice_bytes,
            **(
                {"raw_bytes_units": list(raw_bytes_u)}
                if layer_windows
                else {}
            ),
            "solo_cost": [float(c) for c in scheme_solo_cost],
            "policies": {
                **{
                    name: {
                        "budgets": budgets,
                        "fraction": [m / n_units for m in budgets],
                        "output_cosine": [
                            float(cos_all[i]) for i in curve_idx[name]
                        ],
                    }
                    for name in orders
                },
                "solo_asc": {
                    "budgets": budgets,
                    "fraction": [m / n_units for m in budgets],
                    "output_cosine": [float(c) for c in serve_cos],
                },
            },
        }
        if verbose:
            half = budgets[len(budgets) // 2]
            j = len(budgets) // 2
            shown = DEFAULT_POLICIES + tuple(
                n for n in ("law_sink", "cache_mass_asc") if n in curve_idx
            )
            print(
                f"  {scheme}: full swap {cos_all[curve_idx['law'][-1]]:.4f} | "
                f"@{half}/{n_units} " + " ".join(
                    f"{n}={cos_all[curve_idx[n][j]]:.4f}" for n in shown
                ) + f" solo_asc={serve_cos[j]:.4f}"
            )

    # --- model-level entropy law from the master solo costs (computed in
    # the payload loop, where the serve-plan order also comes from) ---
    fit_mask = solo_cost > 1e-9  # diffuse heads cost ~0; log needs support
    law = law2 = None
    if fit_mask.sum() >= 4:
        x, y = ent_u[fit_mask], np.log(solo_cost[fit_mask])
        slope, intercept = np.polyfit(x, y, 1)
        r2 = float(np.corrcoef(x, y)[0, 1] ** 2)
        law = {
            "slope": float(slope),
            "intercept": float(intercept),
            "r2": r2,
            "n_points": int(fit_mask.sum()),
            "n_excluded_below_1e-9": int((~fit_mask).sum()),
        }
        # Two-factor law — what the 'law' policy actually prices:
        # log(cost) = a + b*H + c*log(1 - proxy)
        lq = np.log(np.maximum(1.0 - proxy_u[fit_mask], 1e-12))
        design = np.stack([np.ones_like(x), x, lq], axis=1)
        coef, *_ = np.linalg.lstsq(design, y, rcond=None)
        resid = y - design @ coef
        ss_tot = float(((y - y.mean()) ** 2).sum())
        law2 = {
            "intercept": float(coef[0]),
            "entropy_slope": float(coef[1]),
            "log1mproxy_slope": float(coef[2]),
            "r2": 1.0 - float((resid**2).sum()) / ss_tot if ss_tot else 1.0,
            "n_points": int(fit_mask.sum()),
        }
        if verbose:
            print(
                f"  model-level entropy law: log(cost) = {intercept:.2f} "
                f"{slope:+.3f}*H  R^2={r2:.3f}  ({int(fit_mask.sum())} units)"
            )
            print(
                f"  two-factor law: log(cost) = {coef[0]:.2f} {coef[1]:+.3f}*H "
                f"{coef[2]:+.3f}*log(1-proxy)  R^2={law2['r2']:.3f}"
            )
    law_cache = law_sink3 = None
    if attn_sinks and fit_mask.sum() >= 4:
        # The sink question: the full-distribution entropy H counts the
        # sink as sharpness, so a sink-dominated head looks expensive to
        # the plain law while its cache rows (the only thing a swap
        # touches) barely matter. Re-fit on the cache-conditional stats.
        y = np.log(solo_cost[fit_mask])
        xc = cache_ent_u[fit_mask]
        lc = np.log(np.maximum(cache_mass_u[fit_mask], 1e-12))
        slope_c, icpt_c = np.polyfit(xc, y, 1)
        law_cache = {
            "slope": float(slope_c),
            "intercept": float(icpt_c),
            "r2": float(np.corrcoef(xc, y)[0, 1] ** 2),
            "n_points": int(fit_mask.sum()),
        }
        lq = np.log(np.maximum(1.0 - proxy_u[fit_mask], 1e-12))
        design = np.stack([np.ones_like(xc), xc, lq, lc], axis=1)
        coef3, *_ = np.linalg.lstsq(design, y, rcond=None)
        resid = y - design @ coef3
        ss_tot = float(((y - y.mean()) ** 2).sum())
        law_sink3 = {
            "intercept": float(coef3[0]),
            "cache_entropy_slope": float(coef3[1]),
            "log1mproxy_slope": float(coef3[2]),
            "log_cache_mass_slope": float(coef3[3]),
            "r2": 1.0 - float((resid**2).sum()) / ss_tot if ss_tot else 1.0,
            "n_points": int(fit_mask.sum()),
        }
        if verbose:
            print(
                f"  sink-aware law: log(cost) vs H_cache R^2="
                f"{law_cache['r2']:.3f} (full-H R^2={law['r2']:.3f}); "
                f"3-factor [H_cache, log(1-proxy), log(cache_mass)] "
                f"R^2={law_sink3['r2']:.3f}"
            )

    # Calibration: is the budget curve the SUM of its served units' solo
    # costs? Additivity is what lets an operator pick a budget from the
    # solo table alone (serve greedily while sum of predicted costs stays
    # under the output-cost target); sub-additivity means the sum is a
    # conservative bound.
    law_order = orders["law"]
    law_curve = payloads["master"]["cos_all"][curve_idx["law"]]
    additivity = [
        {
            "budget": int(m),
            "sum_solo_cost": float(solo_cost[law_order[:m]].sum()),
            "measured_cost": float(max(1.0 - law_curve[j], 0.0)),
        }
        for j, m in enumerate(budgets)
    ]
    # The same calibration for the serve-plan's own ranking: does the plan
    # tool's cumulative_cost (running sum of measured solo costs, ascending)
    # bound the measured cost of actually serving that prefix?
    serve_curve = payloads["master"]["serve_cos"]
    serve_validation = [
        {
            "budget": int(m),
            "sum_solo_cost": float(solo_cost[solo_asc[:m]].sum()),
            "measured_cost": float(max(1.0 - serve_curve[j], 0.0)),
        }
        for j, m in enumerate(budgets)
    ]

    # --- tiered-plan EXECUTION: compose the mixed payload a tiered plan
    # actually ships (per-unit scheme choice) and measure it end-to-end.
    # The tiered planner assumes solo costs stay additive ACROSS schemes;
    # this is the measurement of that assumption.
    from nerf_attention_tpu.serve_plan import (
        build_tiered_plan,
        tiered_units_from_policy_json,
    )

    tiered_units = tiered_units_from_policy_json(
        {
            "units": [
                {
                    "layer": int(u // n_kv),
                    "kv_head": int(u % n_kv),
                    "entropy_nats": float(ent_u[u]),
                    "key_fit_cosine": float(k_cos[u]),
                    "value_fit_cosine": float(v_cos[u]),
                }
                for u in range(n_units)
            ],
            "payloads": results_payloads,
        }
    )
    if layer_windows:
        # Honest byte accounting for the executed plans: sliding layers'
        # raw slices are window-capped, and units no tier can shrink
        # below that are SKIPPED (the planner's net-negative rule) —
        # this is the rule's executed validation.
        from nerf_attention_tpu.serve_plan import apply_layer_windows

        tiered_units = apply_layer_windows(tiered_units, layer_windows, s)
    total_master_cost = float(solo_cost.sum())
    tiered_validation = []
    for frac in (0.02, 0.1, 0.5):
        target = frac * total_master_cost
        plan = build_tiered_plan(tiered_units, cost_target=target)
        served = [r for r in plan["plan"] if r["serve"]]
        mask = np.zeros(n_units, dtype=bool)
        k_mix = np.array(np.asarray(ck), copy=True)
        v_mix = np.array(np.asarray(cv), copy=True)
        counts: dict[str, int] = {}
        for r in served:
            u = r["layer"] * n_kv + r["kv_head"]
            mask[u] = True
            counts[r["scheme"]] = counts.get(r["scheme"], 0) + 1
            pk = payloads[r["scheme"]]
            k_mix[r["layer"], r["kv_head"]] = np.asarray(
                pk["k_hat"][r["layer"], r["kv_head"]]
            )
            v_mix[r["layer"], r["kv_head"]] = np.asarray(
                pk["v_hat"][r["layer"], r["kv_head"]]
            )
        cos = decode_cosines(
            jnp.asarray(k_mix), jnp.asarray(v_mix), mask[None]
        )[0]
        tiered_validation.append(
            {
                "cost_target": target,
                "target_frac_of_total": frac,
                "n_served": plan["n_served"],
                "scheme_counts": counts,
                "stored_bytes_served": plan["stored_bytes_served"],
                "raw_bytes_served": plan["raw_bytes_served"],
                "net_bytes_saved": plan["net_bytes_saved"],
                "n_skipped_net_negative": plan["n_skipped_net_negative"],
                "predicted_cost": plan["predicted_cost_at_cut"],
                "measured_cost": float(max(1.0 - cos, 0.0)),
            }
        )
    if verbose:
        for row in tiered_validation:
            print(
                f"  tiered@{row['target_frac_of_total']:g}: "
                f"{row['n_served']}/{n_units} served {row['scheme_counts']} | "
                f"predicted {row['predicted_cost']:.2e} measured "
                f"{row['measured_cost']:.2e}"
            )

    # --- MoE routing sensitivity: does serving heads from parameters FLIP
    # the router's expert selections? Routing is the one DISCONTINUOUS
    # error channel in the stack: a perturbed hidden state either keeps
    # the same top-k experts (error stays continuous) or swaps one in/out
    # (the FFN jumps to a different function). Measured along the
    # serve-plan (solo_asc) budget axis on the master payload, by
    # capturing each layer's router input (`capture_ffn_input=True`) and
    # replaying the routing outside the forward (`route_weights`).
    moe_routing = None
    if num_local_experts:
        routers = np.asarray(params["layers"]["router"])
        top_k = int(config.num_experts_per_tok)

        @jax.jit
        def decode_ffn_masked(p, toks, pos, k_c, v_c, k_hat, v_hat, mask):
            m = mask.reshape(n_l, n_kv)[:, :, None, None]
            ka = jnp.where(m, k_hat, k_c)
            va = jnp.where(m, v_hat, v_c)
            return jax.vmap(
                lambda t, q: llama_decode_step(
                    config, p, t, q, ka, va, capture_ffn_input=True
                )[3],
                in_axes=(0, 0),
            )(toks, pos)  # (T, L, 1, hidden)

        k_hat_m, v_hat_m = payloads["master"]["k_hat"], payloads["master"]["v_hat"]

        def routing_for(mask: np.ndarray):
            ffn_x = np.asarray(
                decode_ffn_masked(
                    params, tokens, positions, ck, cv,
                    k_hat_m, v_hat_m, jnp.asarray(mask),
                )
            )
            if config.moe_style == "gpt_oss":
                return route_weights_gpt_oss(
                    ffn_x, routers,
                    np.asarray(params["layers"]["router_bias"]), top_k,
                )
            return route_weights(ffn_x, routers, top_k)

        w_true, idx_true = routing_for(np.zeros(n_units, dtype=bool))
        # Flip rate along BOTH serving orders the additivity calibrations
        # use (solo_asc = serve_plan_validation, law = law_curve_additivity)
        # so a calibration break at budget m is directly attributable (or
        # not) to routing flips in THAT prefix.
        per_layer_full = None
        full_swap = None  # all-True mask is order-independent; decode once
        by_order: dict[str, dict] = {}
        for order_name, order in (("solo_asc", solo_asc), ("law", law_order)):
            flip_rate, weight_l1 = [], []
            for m_units in budgets:
                if m_units == 0:
                    w, idx = w_true, idx_true
                elif m_units == n_units and full_swap is not None:
                    w, idx = full_swap
                else:
                    mask = np.zeros(n_units, dtype=bool)
                    mask[order[:m_units]] = True
                    w, idx = routing_for(mask)
                    if m_units == n_units:
                        full_swap = (w, idx)
                flips = np.any(idx != idx_true, axis=-1)  # (T, L)
                flip_rate.append(float(flips.mean()))
                weight_l1.append(float(np.abs(w - w_true).sum(axis=-1).mean()))
                if order_name == "solo_asc" and m_units == n_units:
                    per_layer_full = [float(f) for f in flips.mean(axis=0)]
            cos_curve = (
                payloads["master"]["serve_cos"]
                if order_name == "solo_asc"
                else payloads["master"]["cos_all"][curve_idx["law"]]
            )
            by_order[order_name] = {
                "flip_rate": flip_rate,
                "combine_weight_l1": weight_l1,
                "measured_cost": [
                    float(max(1.0 - c, 0.0)) for c in cos_curve
                ],
            }
        moe_routing = {
            "num_experts": int(num_local_experts),
            "moe_style": moe_style,
            "top_k": top_k,
            "payload": "master",
            "budgets": [int(m) for m in budgets],
            "fraction": [m / n_units for m in budgets],
            "orders": by_order,
            # back-compat aliases for the solo_asc curve
            "order": "solo_asc",
            "flip_rate": by_order["solo_asc"]["flip_rate"],
            "combine_weight_l1": by_order["solo_asc"]["combine_weight_l1"],
            "measured_cost": by_order["solo_asc"]["measured_cost"],
            "per_layer_flip_rate_full_swap": per_layer_full,
        }
        if verbose:
            fr = by_order["solo_asc"]["flip_rate"]
            print(
                f"  MoE routing: full-swap flip rate {fr[-1]:.3f} "
                f"(weight L1 {by_order['solo_asc']['combine_weight_l1'][-1]:.3f})"
                f" over {len(budgets)} budgets x 2 orders"
            )

    units = [
        {
            "layer": int(u // n_kv),
            "kv_head": int(u % n_kv),
            "gain": float(gains.reshape(-1)[u]),
            "entropy_nats": float(ent_u[u]),
            "key_fit_cosine": float(k_cos[u]),
            "value_fit_cosine": float(v_cos[u]),
            "solo_output_cosine": float(solo_cos[u]),
            "solo_cost": float(solo_cost[u]),
            **(
                {
                    "window": window_of[u],
                    "raw_bytes": int(raw_bytes_u[u]),
                }
                if layer_windows
                else {}
            ),
            **(
                {
                    "sink_offset": float(sink_offsets.reshape(-1)[u]),
                    "sink_mass": float(1.0 - cache_mass_u[u]),
                    "cache_mass": float(cache_mass_u[u]),
                    "cache_entropy_nats": float(cache_ent_u[u]),
                }
                if attn_sinks
                else {}
            ),
        }
        for u in range(n_units)
    ]

    results = {
        "model": {
            "num_hidden_layers": n_l,
            "num_attention_heads": num_heads,
            "num_key_value_heads": n_kv,
            "head_dim": d,
            "hidden_size": hidden_size,
            "seq_len": s,
            "n_queries": n_queries,
            "num_local_experts": num_local_experts,
            "moe_style": moe_style if num_local_experts else None,
            "attn_sinks": attn_sinks,
            "attn_logit_softcap": attn_logit_softcap,
            "nope": nope,
            "layer_windows": (
                [w or 0 for w in layer_windows] if layer_windows else None
            ),
        },
        "net": net.name,
        "epochs": epochs,
        "seed": seed,
        "fm_mult": fm_mult,
        "gain_lo": gain_lo,
        "gain_hi": gain_hi,
        "n_random": n_random,
        "uniform_entropy_nats": float(np.log(s)),
        "units": units,
        "entropy_law_solo": law,
        "entropy_law_solo_2factor": law2,
        "entropy_law_solo_cache": law_cache,
        "entropy_law_solo_sink3": law_sink3,
        "sink_lo": sink_lo if attn_sinks else None,
        "sink_hi": sink_hi if attn_sinks else None,
        "law_curve_additivity": additivity,
        "serve_plan_validation": serve_validation,
        "tiered_plan_validation": tiered_validation,
        "moe_routing": moe_routing,
        "payloads": results_payloads,
        "wall_seconds": time.perf_counter() - t0,
    }
    with open(output_dir / "head_policy_results.json", "w") as f:
        json.dump(results, f, indent=2)
    if verbose:
        print(
            f"Head policy done in {results['wall_seconds']:.0f}s -> "
            f"{output_dir / 'head_policy_results.json'}"
        )
    return results


def plot_head_policy(results: dict, figures_dir: Path) -> None:
    """Panels: the entropy law, policy budget curves, the plan cut-rule
    calibration (running solo sum vs measured cost), and — for MoE
    stacks — router flip rate along the serving budget axis."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    figures_dir = Path(figures_dir)
    figures_dir.mkdir(parents=True, exist_ok=True)
    units = results["units"]
    has_validation = "serve_plan_validation" in results
    moe = results.get("moe_routing")
    n_panels = 2 + bool(has_validation) + bool(moe)
    fig, axes = plt.subplots(1, n_panels, figsize=(6.0 * n_panels + 0.5, 4.8))
    ax_law, ax_pol = axes[0], axes[1]

    h = np.array([u["entropy_nats"] for u in units])
    cost = np.array([u["solo_cost"] for u in units])
    ax_law.scatter(h, np.maximum(cost, 1e-12), s=22, alpha=0.8, zorder=3)
    law = results.get("entropy_law_solo")
    if law:
        xs = np.linspace(h.min(), h.max(), 50)
        ax_law.plot(
            xs,
            np.exp(law["intercept"] + law["slope"] * xs),
            "--",
            color="0.35",
            label=(
                f"slope {law['slope']:.2f}, $R^2$ {law['r2']:.2f}"
            ),
            zorder=2,
        )
        ax_law.legend(fontsize=8)
    law_c = results.get("entropy_law_solo_cache")
    if law_c and "cache_entropy_nats" in units[0]:
        hc = np.array([u["cache_entropy_nats"] for u in units])
        ax_law.scatter(
            hc, np.maximum(cost, 1e-12), s=22, alpha=0.6, marker="^",
            color="C1", zorder=3,
            label=f"cache-conditional H ($R^2$ {law_c['r2']:.2f})",
        )
        xs = np.linspace(hc.min(), hc.max(), 50)
        ax_law.plot(
            xs, np.exp(law_c["intercept"] + law_c["slope"] * xs),
            ":", color="C1", zorder=2,
        )
        ax_law.legend(fontsize=8)
    ax_law.set_yscale("log")
    ax_law.set_xlabel("measured head entropy (nats)")
    ax_law.set_ylabel("solo-swap output cost (1 − cosine)")
    ax_law.set_title("Per-head cost at the model output")
    ax_law.grid(alpha=0.3)

    master = results["payloads"]["master"]["policies"]
    randoms = np.array(
        [v["output_cosine"] for k, v in master.items() if k.startswith("random")]
    )
    frac = master[next(iter(master))]["fraction"]
    if randoms.size:
        ax_pol.fill_between(
            frac, randoms.min(axis=0), randoms.max(axis=0),
            color="0.8", label=f"random (n={randoms.shape[0]})",
        )
    for name in DEFAULT_POLICIES + ("law_sink", "cache_mass_asc", "solo_asc"):
        if name in master:
            ax_pol.plot(frac, master[name]["output_cosine"], "-o", ms=3.5,
                        label=name)
    ax_pol.set_xlabel("fraction of (layer, kv-head) slices served from params")
    ax_pol.set_ylabel("output cosine vs true-cache decode")
    ax_pol.set_title("Selection policies over the budget axis")
    ax_pol.grid(alpha=0.3)
    ax_pol.legend(fontsize=8)

    if has_validation:
        ax_cal = axes[2]
        tables = [
            ("serve-plan order", results["serve_plan_validation"], "o"),
            ("law order", results.get("law_curve_additivity", []), "s"),
        ]
        lo = hi = None
        for label, rows, marker in tables:
            xs = np.array([r["sum_solo_cost"] for r in rows if r["budget"]])
            ys = np.array([r["measured_cost"] for r in rows if r["budget"]])
            keep = (xs > 0) & (ys > 0)
            if not keep.any():
                continue
            ax_cal.plot(
                xs[keep], ys[keep], marker, ms=5, alpha=0.85, label=label
            )
            lo = min(xs[keep].min(), ys[keep].min(), lo or np.inf)
            hi = max(xs[keep].max(), ys[keep].max(), hi or 0.0)
        if lo is not None:
            grid = np.geomspace(lo, hi, 8)
            ax_cal.plot(grid, grid, "--", color="0.5", lw=1, label="y = x")
        ax_cal.set_xscale("log")
        ax_cal.set_yscale("log")
        ax_cal.set_xlabel("running sum of solo costs (the plan's cut rule)")
        ax_cal.set_ylabel("measured cost of serving that prefix")
        ax_cal.set_title("Cut-rule calibration")
        ax_cal.grid(alpha=0.3, which="both")
        ax_cal.legend(fontsize=8)

    if moe:
        ax_moe = axes[-1]
        frac_m = moe["fraction"]
        ax_moe.plot(
            frac_m, moe["flip_rate"], "-o", ms=4, color="C3",
            label=f"top-{moe['top_k']} flip rate",
        )
        law_flips = moe.get("orders", {}).get("law", {}).get("flip_rate")
        if law_flips:
            ax_moe.plot(
                frac_m, law_flips, ":^", ms=4, color="C3", alpha=0.7,
                label="flip rate (law order)",
            )
        ax_moe.plot(
            frac_m, moe["combine_weight_l1"], "-s", ms=4, color="C0",
            label="combine-weight L1",
        )
        ax_moe.plot(
            frac_m, moe["measured_cost"], "--", color="0.5",
            label="output cost (1 − cos)",
        )
        ax_moe.set_xlabel("fraction served from params (solo_asc order)")
        ax_moe.set_ylabel("routing perturbation / output cost")
        ax_moe.set_title(
            f"MoE router sensitivity (E={moe['num_experts']})"
        )
        ax_moe.grid(alpha=0.3)
        ax_moe.legend(fontsize=8)

    fig.tight_layout()
    fig.savefig(figures_dir / "head_policy.png", dpi=130)
    plt.close(fig)
    print(f"  Saved {figures_dir / 'head_policy.png'}")
