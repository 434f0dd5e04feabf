"""Runtime loading of the reference's prompt corpus and sample text.

The multi-prompt and extraction results depend on the exact input texts
(SURVEY.md §7.6): reproducing BASELINE.md's rows apples-to-apples requires
the reference corpus (`/root/reference/nerf_attention/experiments/prompts.py:3-239`)
and mixed sample text (`/root/reference/nerf_attention/extract.py:13-31`).
Those texts are *data*, so when the reference checkout is mounted they are
loaded from it at runtime; this repo ships original fallback texts
(`experiments/prompts.py`, `extract.py`) for when it isn't.

Loading never executes reference code: the corpus files are parsed with
``ast`` and only string constants, ``+``/``*`` of already-allowed values,
name references to previously loaded assignments, and literal dicts are
evaluated. Anything else aborts the load and the fallbacks are used.
"""

from __future__ import annotations

import ast
import os
from functools import lru_cache
from pathlib import Path

_DEFAULT_ROOT = "/root/reference"


def reference_root() -> Path | None:
    """The mounted reference checkout, if present."""
    root = Path(os.environ.get("NERF_REFERENCE_ROOT", _DEFAULT_ROOT))
    return root if (root / "nerf_attention").is_dir() else None


def _eval_data_node(node: ast.expr, bindings: dict):
    """Evaluate a strictly-data expression (strings, + and *, names, dicts)."""
    if isinstance(node, ast.Constant) and isinstance(node.value, (str, int)):
        return node.value
    if isinstance(node, ast.BinOp) and isinstance(node.op, (ast.Add, ast.Mult)):
        left = _eval_data_node(node.left, bindings)
        right = _eval_data_node(node.right, bindings)
        return left + right if isinstance(node.op, ast.Add) else left * right
    if isinstance(node, ast.Name) and node.id in bindings:
        return bindings[node.id]
    if isinstance(node, ast.Dict):
        return {
            _eval_data_node(key, bindings): _eval_data_node(value, bindings)
            for key, value in zip(node.keys, node.values)
        }
    raise ValueError(f"non-data expression: {ast.dump(node)[:80]}")


@lru_cache(maxsize=1)
def load_reference_prompts() -> dict | None:
    """The reference ALL_PROMPTS corpus, or None if unavailable/unparseable."""
    root = reference_root()
    if root is None:
        return None
    source_path = root / "nerf_attention" / "experiments" / "prompts.py"
    try:
        module = ast.parse(source_path.read_text())
        bindings: dict = {}
        for statement in module.body:
            if isinstance(statement, ast.Assign) and len(statement.targets) == 1:
                target = statement.targets[0]
                if isinstance(target, ast.Name):
                    try:
                        bindings[target.id] = _eval_data_node(
                            statement.value, bindings
                        )
                    except (ValueError, TypeError):
                        continue
        corpus = bindings.get("ALL_PROMPTS")
        if (
            isinstance(corpus, dict)
            and corpus
            and all(
                isinstance(k, str) and isinstance(v, str) and v
                for k, v in corpus.items()
            )
        ):
            return corpus
    except (OSError, SyntaxError):
        pass
    return None


@lru_cache(maxsize=1)
def load_reference_sample_text() -> str | None:
    """The reference get_sample_text() literal, or None if unavailable."""
    root = reference_root()
    if root is None:
        return None
    source_path = root / "nerf_attention" / "extract.py"
    try:
        module = ast.parse(source_path.read_text())
    except (OSError, SyntaxError):
        return None
    for statement in module.body:
        if (
            isinstance(statement, ast.FunctionDef)
            and statement.name == "get_sample_text"
        ):
            for inner in ast.walk(statement):
                if isinstance(inner, ast.Return) and inner.value is not None:
                    try:
                        text = _eval_data_node(inner.value, {})
                    except (ValueError, TypeError):
                        return None
                    return text if isinstance(text, str) and text else None
    return None
