"""Host-f64 compute context for small ill-conditioned linear algebra.

TPUs have no native f64 Cholesky/LU, and f32 is catastrophically inadequate
for the framework's two small-but-ill-conditioned solves: the derivative-GPR
Gram matrices and the InterpModel polynomial-matching system (condition
number grows like ``alpha^porder``).  Both are tiny (tens of rows), so they
run in f64 pinned to the host CPU backend — the same division of labor as
the reference (GPflow/TF and numpy ran on CPU) while the sample-reduction
kernels stay on the TPU.
"""

from __future__ import annotations

from contextlib import contextmanager, nullcontext

import jax

__all__ = ["host_f64"]


@contextmanager
def host_f64():
    dev_ctx = nullcontext()
    if jax.default_backend() != "cpu":
        try:
            dev_ctx = jax.default_device(jax.devices("cpu")[0])
        except RuntimeError:
            pass
    x64_ctx = nullcontext() if jax.config.jax_enable_x64 else jax.enable_x64(True)
    with dev_ctx, x64_ctx:
        yield
