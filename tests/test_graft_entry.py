"""Driver-contract checks for __graft_entry__ (entry + dryrun_multichip).

The round-1 driver failure (MULTICHIP_r01.json ok=false) happened because the
dryrun fell back to CPU mesh devices while the process default platform was
still the TPU tunnel, so unsharded array traffic touched (that day, broken)
accelerator state. These tests pin the fix: the dryrun must be hermetic — a
CPU correctness check that cannot fail on accelerator health.

Greenfield (no reference counterpart); the contract is the driver check
itself, per CLAUDE.md "keep dryrun_multichip green".
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _shell_like_env():
    """The raw shell environment: axon PYTHONPATH present, no CPU pin.

    conftest.py sets JAX_PLATFORMS=cpu and injects
    --xla_force_host_platform_device_count for in-process tests; strip both
    so the subprocess exercises dryrun_multichip's own platform setup,
    exactly like the driver's fresh-process invocation.
    """
    env = dict(os.environ)
    shell_pin = env.pop("NERF_TEST_SHELL_JAX_PLATFORMS", "")
    if shell_pin:
        env["JAX_PLATFORMS"] = shell_pin  # e.g. "axon" — the tunnel plugin
    else:
        env.pop("JAX_PLATFORMS", None)
    env.pop("NERF_DRYRUN_PLATFORM", None)
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(flags)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}".rstrip(":")
    return env


def test_dryrun_multichip_fresh_subprocess_shell_env():
    """dryrun_multichip(8) passes in a fresh process with the driver's env."""
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)",
        ],
        env=_shell_like_env(),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=570,
    )
    assert proc.returncode == 0, (
        f"dryrun failed\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "dryrun_multichip OK" in proc.stdout


def test_dryrun_subprocess_never_touches_accelerator():
    """With no explicit JAX_PLATFORMS, the dryrun must run purely on CPU."""
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8); "
            "import jax; print('BACKEND=' + jax.default_backend())",
        ],
        env=_shell_like_env(),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=570,
    )
    assert proc.returncode == 0, proc.stderr
    assert "BACKEND=cpu" in proc.stdout


def test_dryrun_inprocess_with_initialized_cpu_backend():
    """In-process call after jax init (conftest pins cpu×8) still works."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(2)


def test_entry_is_jittable():
    import jax

    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2048, 128)
