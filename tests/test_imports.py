"""Every module in the package (and the repo-root scripts) must import.

Safety net for modules no functional test happens to touch: a mangled
edit once shipped an IndentationError in utils/tracing.py that only the
fit CLI's import surfaced. Importing is cheap and catches syntax/import
errors everywhere at once.
"""

import importlib
import pkgutil
from pathlib import Path

import pytest

import nerf_attention_tpu

REPO_ROOT = Path(nerf_attention_tpu.__file__).resolve().parents[1]

PACKAGE_MODULES = [
    name
    for _, name, _ in pkgutil.walk_packages(
        nerf_attention_tpu.__path__, prefix="nerf_attention_tpu."
    )
]


@pytest.mark.parametrize("module_name", PACKAGE_MODULES)
def test_package_module_imports(module_name):
    importlib.import_module(module_name)


@pytest.mark.parametrize(
    "script",
    ["bench.py", "quickstart.py", "__graft_entry__.py"]
    + sorted(p.relative_to(REPO_ROOT).as_posix() for p in (REPO_ROOT / "tools").glob("*.py")),
)
def test_repo_scripts_compile(script):
    # Scripts aren't importable as modules (argparse mains, sys.path
    # mangling) — compile-check their source instead.
    source = (REPO_ROOT / script).read_text()
    compile(source, script, "exec")
