"""Shared benchmark plumbing for tools/mfu_profile.py and
tools/train_impl_bench.py.

Both tools time the sweep's group training step with the dependent-loop
methodology (`utils/timing.py:_per_iter_samples`): one jitted runner whose
epoch count is a DYNAMIC argument, so a single compile serves every trip
count and the n-vs-4n delta isolates per-epoch device time from tunnel
RTT. Keeping one copy of the runner guarantees the two tools measure the
same program.
"""

from __future__ import annotations


def make_group_runner(
    config,
    head_dim: int,
    seq_len: int,
    impl: str = "xla",
    sin_impl: str = "fast",
    stash: str = "auto",
    mxu: str = "fp32",
    fm_mult: float | None = None,
    lr: float = 1e-4,
    schedule_epochs: int = 2000,
):
    """Dynamic-epoch trainer for one architecture group.

    Returns a jitted ``run(keys, targets, n)`` executing ``n`` optimizer
    steps of the production training step (XLA autodiff or the fused Pallas
    kernel) and returning a tiny scalar that forces completion without a
    bulk transfer.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from nerf_attention_tpu.models.siren import (
        init_siren,
        positions,
        siren_apply_maybe_fm,
    )
    from nerf_attention_tpu.ops.siren_train_pallas import siren_train_grads
    from nerf_attention_tpu.parallel.sweep import (
        _make_optimizer,
        _resolve_sin,
        normalize_targets,
    )

    tx = _make_optimizer(lr, schedule_epochs)
    omega = config.omega_0
    sin = _resolve_sin(sin_impl)
    pos = positions(seq_len)
    interpret = jax.default_backend() != "tpu"

    @jax.jit
    def run(keys, targets, n):
        tn, _, _ = jax.vmap(normalize_targets)(targets)
        params = jax.vmap(lambda k: init_siren(k, config, head_dim))(keys)
        opt_state = tx.init(params)

        if impl == "xla":
            def loss_fn(p):
                pred = jax.vmap(
                    lambda q: siren_apply_maybe_fm(q, omega, fm_mult, pos, sin=sin)
                )(p)
                return jnp.mean((pred - tn) ** 2)

            def body(_, carry):
                p, s = carry
                _, grads = jax.value_and_grad(loss_fn)(p)
                updates, s = tx.update(grads, s, p)
                return (optax.apply_updates(p, updates), s)
        else:
            def body(_, carry):
                p, s = carry
                _, grads = siren_train_grads(
                    p, tn, omega=omega, interpret=interpret,
                    sin_impl=sin_impl, stash=stash, mxu=mxu, fm_mult=fm_mult,
                )
                updates, s = tx.update(grads, s, p)
                return (optax.apply_updates(p, updates), s)

        params, _ = jax.lax.fori_loop(0, n, body, (params, opt_state))
        return jnp.mean(params[-1][1])

    return run
