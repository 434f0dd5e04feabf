"""KV cache extraction: synthetic generation, HF-interop, or native JAX Llama.

Three backends produce the same on-disk contract (kvstore layout):

  * ``synthetic`` — the deterministic signal generator (synthetic.py), the
    hermetic path used by quickstart/tests. No model weights needed.
  * ``hf`` — HuggingFace transformers (torch) as a pure data producer,
    equivalent to the reference's 4-bit extraction
    (`/root/reference/nerf_attention/extract.py:95-179`). Quantization is
    used when bitsandbytes is available, otherwise fp16/bf16.
  * ``jax`` — the native path: a JAX Llama forward pass on the TPU mesh with
    per-layer post-RoPE K/V capture (models/llama_jax.py).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from nerf_attention_tpu.io import kvstore
from nerf_attention_tpu.synthetic import generate_synthetic_kv
from nerf_attention_tpu.types import KVMetadata

# Re-export under the reference's public name (extract.py:182).
extract_kv_cache_synthetic = generate_synthetic_kv


def get_sample_text() -> str:
    """Mixed narrative + code + technical text exercising diverse attention.

    Plays the role of the reference's built-in corpus (extract.py:13-92):
    prose with long-range references, Python source, and dense numeric
    technical content, repeated 3x to fill long contexts. When the reference
    checkout is mounted, its exact sample text is loaded at runtime (it is
    data the extraction results depend on — SURVEY.md §7.6) so results are
    directly comparable to BASELINE.md; the original text below is the
    fallback.
    """
    from nerf_attention_tpu.reference_data import load_reference_sample_text

    reference_text = load_reference_sample_text()
    if reference_text is not None:
        return reference_text
    narrative = """
Long documents stress a transformer's memory in a very particular way. A
contract, for instance, establishes its defined terms in the first pages and
then leans on them for hundreds of paragraphs: the model reading clause 9.4
must still attend sharply to the definition of "Effective Date" given in
clause 1.2, thousands of tokens earlier. These references are sparse and
spiky — nothing like the smooth local correlations of natural images — and
they are exactly what a key-value cache preserves. Every token's key and
value vector is kept so that any later query can reach back to it.

The cost of that guarantee grows linearly with context. Each decoded token
must re-read the entire cache from high-bandwidth memory, and at long
contexts the accelerator spends most of its time waiting on memory rather
than computing. The question this pipeline studies is whether the cache's
contents are structured enough, as a function of position, to be replaced by
a small continuous network evaluated on demand.
"""
    code = '''
def scaled_dot_attention(q, k, v, mask=None):
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = (q @ k.swapaxes(-2, -1)) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, -1e9)
    weights = jax.nn.softmax(logits, axis=-1)
    return weights @ v, weights

class CachedAttention:
    """Decode-time attention over an explicit KV cache."""

    def __init__(self, num_heads, head_dim):
        self.num_heads = num_heads
        self.head_dim = head_dim
        self.k_cache = []
        self.v_cache = []

    def step(self, q_t, k_t, v_t):
        self.k_cache.append(k_t)
        self.v_cache.append(v_t)
        k = jnp.stack(self.k_cache, axis=-2)
        v = jnp.stack(self.v_cache, axis=-2)
        out, _ = scaled_dot_attention(q_t, k, v)
        return out

def positional_spectrum(cache_slice):
    seq_len, d_head = cache_slice.shape
    spectra = []
    for dim in range(d_head):
        amplitude = np.abs(np.fft.rfft(cache_slice[:, dim]))
        spectra.append(amplitude)
    return np.stack(spectra)
'''
    technical = """
Arithmetic intensity decides everything at serving time. A TPU v5e chip pairs
roughly 197 bf16 TFLOPS with 819 GB/s of HBM bandwidth, so a kernel needs on
the order of 240 floating point operations per byte loaded before the matrix
units stop starving. Attention over a cached context performs about two
operations per element read — three orders of magnitude short. For a 100K
token context on an 8-KV-head model with 128-dim heads and 80 layers, the
cache weighs in around 32 GB in fp16: reading it once per decode step costs
milliseconds while the arithmetic costs microseconds. Quantized caches,
token eviction, windowed attention, and learned low-rank summaries all trade
recall for bandwidth; an implicit positional network would instead trade
memory traffic for compute, which only pays off if the network is far
smaller than the cache and its evaluation saturates the matrix units.
"""
    return (narrative + code + technical) * 3


def load_hf_model(model_name: str, state: dict | None = None):
    """Load (tokenizer, model) with 4-bit NF4 when bitsandbytes is present.

    ``state`` caches the pair across calls (the reference loads the model
    once for all seq-lengths / prompts, scaling.py:40-48, multi_prompt.py:46).
    """
    if state is not None and "model" in state:
        return state["tokenizer"], state["model"]

    import torch
    from transformers import AutoModelForCausalLM, AutoTokenizer

    load_kwargs: dict = {"device_map": "auto"}
    try:  # 4-bit NF4 double-quant when bitsandbytes is present (extract.py:106-111)
        from transformers import BitsAndBytesConfig

        import bitsandbytes  # noqa: F401

        load_kwargs["quantization_config"] = BitsAndBytesConfig(
            load_in_4bit=True,
            bnb_4bit_compute_dtype=torch.float16,
            bnb_4bit_use_double_quant=True,
            bnb_4bit_quant_type="nf4",
        )
        load_kwargs["torch_dtype"] = torch.float16
        print(f"Loading {model_name} in 4-bit quantization...")
    except ImportError:
        load_kwargs["torch_dtype"] = "auto"
        print(f"Loading {model_name} (no bitsandbytes; full-precision)...")

    tokenizer = AutoTokenizer.from_pretrained(model_name)
    model = AutoModelForCausalLM.from_pretrained(model_name, **load_kwargs)
    model.eval()
    if state is not None:
        state["tokenizer"], state["model"] = tokenizer, model
    return tokenizer, model


def extract_with_hf(
    model_name: str,
    text: str,
    seq_len: int,
    output_dir: Path,
    state: dict | None = None,
    device: str | None = None,
) -> KVMetadata:
    """One HF prefill extraction: tokenize, forward w/ use_cache, persist.

    The single implementation behind the extract CLI and the scaling /
    multi-prompt experiment loops (which pass a shared ``state`` so the
    model loads once).
    """
    import torch

    tokenizer, model = load_hf_model(model_name, state)
    inputs = tokenizer(
        text, return_tensors="pt", max_length=seq_len, truncation=True
    )
    if device is not None:
        inputs = inputs.to(device)
    actual_seq_len = inputs["input_ids"].shape[1]
    print(f"Sequence length: {actual_seq_len} tokens")

    with torch.no_grad():
        outputs = model(**inputs, output_hidden_states=False, use_cache=True)
    metadata = save_torch_cache(
        outputs.past_key_values, Path(output_dir), model_name, actual_seq_len
    )
    del outputs
    return metadata


def extract_kv_cache(
    model_name: str,
    seq_len: int,
    output_dir: Path,
    device: str = "cpu",
    text: str | None = None,
) -> KVMetadata:
    """Extract per-layer KV tensors with HF transformers (torch backend).

    Equivalent of reference extract.py:95-179: tokenize, one prefill forward
    with use_cache=True, then persist each layer's (H, S, D) K/V as float32.
    Handles the DynamicCache/v5-layers/legacy-tuple cache formats.
    """
    return extract_with_hf(
        model_name,
        text if text is not None else get_sample_text(),
        seq_len,
        output_dir,
        device=device,
    )


def _torch_cache_layers(past_kv) -> list[tuple]:
    """Normalize any transformers cache format to [(keys, values), ...].

    Covers the three formats the reference sniffs (extract.py:134-158):
    v5 ``.layers[i].keys/.values``, v4 DynamicCache ``.key_cache/.value_cache``,
    and the legacy tuple-of-tuples.
    """
    if hasattr(past_kv, "layers"):
        return [(layer.keys, layer.values) for layer in past_kv.layers]
    if hasattr(past_kv, "key_cache"):
        return list(zip(past_kv.key_cache, past_kv.value_cache))
    return [(layer[0], layer[1]) for layer in past_kv]


def save_torch_cache(
    past_kv, output_dir: Path, model_name: str, actual_tokens: int
) -> KVMetadata:
    """Persist a transformers KV cache in the standard kvstore layout."""
    layers = _torch_cache_layers(past_kv)
    num_layers = len(layers)
    _, num_kv_heads, cache_seq_len, head_dim = layers[0][0].shape
    print(
        f"KV cache: {num_layers} layers, {num_kv_heads} heads, "
        f"seq_len={cache_seq_len}, head_dim={head_dim}"
    )

    for layer_idx, (keys, values) in enumerate(layers):
        kvstore.save_layer(
            output_dir,
            layer_idx,
            keys.squeeze(0).float().cpu().numpy(),
            values.squeeze(0).float().cpu().numpy(),
        )

    metadata = KVMetadata(
        model_name=model_name,
        num_layers=num_layers,
        num_kv_heads=int(num_kv_heads),
        seq_len=int(cache_seq_len),
        head_dim=int(head_dim),
        actual_tokens=int(actual_tokens),
    )
    kvstore.save_metadata(output_dir, metadata)
    print(f"Saved {num_layers} layers to {output_dir}/")
    return metadata


def extract_kv_cache_jax(
    model_dir: str,
    seq_len: int,
    output_dir: Path,
    text: str | None = None,
    mesh=None,
    state: dict | None = None,
    seq_mesh=None,
    pipe_mesh=None,
    expert_mesh=None,
) -> KVMetadata:
    """Native path: JAX Llama prefill on the mesh with per-layer KV capture.

    ``state``: share across calls to load the checkpoint/tokenizer once
    (same contract as extract_with_hf's ``state``). ``mesh`` tensor-shards
    the weights (TP); ``seq_mesh`` shards the token axis instead (SP — the
    long-context path, see ``llama_prefill_kv_sp``); ``pipe_mesh`` shards
    the layer axis (PP, ``llama_prefill_kv_pp``); ``expert_mesh`` shards a
    sparse-MoE checkpoint's expert axis (EP, Mixtral).
    """
    import json as _json

    config_path = Path(model_dir) / "config.json"
    if config_path.exists():
        with open(config_path) as f:
            model_type = _json.load(f).get("model_type")
        if model_type in ("deepseek_v2", "deepseek_v3"):
            # MLA family: its own prefill (latent + materialized surfaces,
            # K/V head dims differ). Mesh sharding not implemented for MLA.
            if any(m is not None for m in (mesh, seq_mesh, pipe_mesh, expert_mesh)):
                raise NotImplementedError(
                    "mesh-sharded extraction is not implemented for the MLA "
                    "family (deepseek_v2/v3) — run single-device"
                )
            from nerf_attention_tpu.models.mla_jax import extract_kv_with_jax_mla

            return extract_kv_with_jax_mla(
                model_dir,
                seq_len=seq_len,
                output_dir=Path(output_dir),
                text=text if text is not None else get_sample_text(),
                state=state,
            )

    from nerf_attention_tpu.models.llama_jax import extract_kv_with_jax_llama

    return extract_kv_with_jax_llama(
        model_dir,
        seq_len=seq_len,
        output_dir=Path(output_dir),
        text=text if text is not None else get_sample_text(),
        mesh=mesh,
        state=state,
        seq_mesh=seq_mesh,
        pipe_mesh=pipe_mesh,
        expert_mesh=expert_mesh,
    )


def main() -> None:
    parser = argparse.ArgumentParser(description="Extract KV cache")
    parser.add_argument("--model", type=str, default="meta-llama/Llama-3.1-8B")
    parser.add_argument("--seq_len", type=int, default=2048)
    parser.add_argument("--output_dir", type=str, default="results/kv_cache")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument(
        "--backend", type=str, default="hf", choices=["hf", "jax", "synthetic"]
    )
    # Reference extract.py:268 defaults --device to 'cuda'; this framework
    # targets TPU hosts where torch is CPU-only, so 'cpu' is the working
    # default (documented divergence — see PARITY.md).
    parser.add_argument("--device", type=str, default="cpu")
    parser.add_argument(
        "--values_mode", type=str, default="reference",
        choices=["reference", "hard"],
        help="synthetic values recipe: 'reference' (smooth sine parity) or "
        "'hard' (attention-sharpened, reproduces the real K>>V gap)",
    )
    parser.add_argument(
        "--mesh", type=str, default=None, choices=["tp", "sp", "pp", "ep"],
        help="jax backend only: shard the prefill over all local devices — "
        "'tp' tensor-shards the weights (Megatron layout), 'sp' shards the "
        "token axis (sequence parallel, the long-context path), 'pp' shards "
        "the layer axis (pipeline parallel, for weights+cache past one chip), "
        "'ep' shards a sparse-MoE checkpoint's expert axis (Mixtral)",
    )
    args = parser.parse_args()

    if args.synthetic or args.backend == "synthetic":
        # Unlike the reference (extract.py:274 appends '_synthetic'), honor
        # --output_dir as given so the documented pipeline — extract
        # --synthetic, then analyze/fit/evaluate with the same --kv_dir —
        # composes without a rename.
        generate_synthetic_kv(
            seq_len=args.seq_len,
            output_dir=Path(args.output_dir),
            values_mode=args.values_mode,
        )
    elif args.backend == "jax":
        meshes = {"tp": None, "sp": None, "pp": None, "ep": None}
        if args.mesh is not None:
            import jax
            import numpy as _np
            from jax.sharding import Mesh

            meshes[args.mesh] = Mesh(_np.array(jax.devices()), (args.mesh,))
        extract_kv_cache_jax(
            args.model, args.seq_len, Path(args.output_dir),
            mesh=meshes["tp"], seq_mesh=meshes["sp"], pipe_mesh=meshes["pp"],
            expert_mesh=meshes["ep"],
        )
    else:
        extract_kv_cache(args.model, args.seq_len, Path(args.output_dir), args.device)


if __name__ == "__main__":
    main()
