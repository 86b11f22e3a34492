"""Extending the framework with a custom observable.

The reference's extension seam is subclassing ``SymFuncBase`` with sympy
``fdiff`` rules (reference models.py:60-99).  Here there are two seams,
both shown below:

1. ``Derivatives(coefs_fn=...)`` — write the observable's Taylor series in
   jax directly (full speed, jitted);
2. ``Derivatives.from_sympy(exprs, args)`` — bring sympy expressions (e.g.
   migrated from reference code); they are lambdified to jax once at build
   time.

The demo observable: the second moment <x^2>(beta) of the ideal gas,
treated as a plain vector observable through the standard x_ave machinery,
compared against a hand-built custom engine.

Run: python examples/custom_observable.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from _smoke import setup as _smoke_setup

SMOKE = _smoke_setup()

import math

import jax.numpy as jnp
import numpy as np
import sympy as sp

import thermoextrap_tpu as xtpu
from thermoextrap_tpu import beta, idealgas
from thermoextrap_tpu.models.derivatives import Derivatives
from thermoextrap_tpu.ops.series import series_div


def custom_coefs_fn(args, order):
    """Seam 1: raw <x>(beta0+D) as a jax series ratio (what beta.x_ave does)."""
    u, xu = args
    a = jnp.stack([(-1.0) ** n / math.factorial(n) * xu[n] for n in range(order + 1)])
    b = jnp.stack([(-1.0) ** n / math.factorial(n) * u[n] for n in range(order + 1)])
    return series_div(a, b, order=order)


def sympy_exprs(order):
    """Seam 2: the same series division done symbolically (migration path)."""
    u_sym, xu_sym = sp.IndexedBase("u"), sp.IndexedBase("xu")
    fact = [sp.factorial(n) for n in range(order + 1)]
    a = [(-1) ** n * xu_sym[n] / fact[n] for n in range(order + 1)]
    b = [(-1) ** n * u_sym[n] / fact[n] for n in range(order + 1)]
    c = []
    for n in range(order + 1):
        c.append(sp.expand((a[n] - sum(b[k] * c[n - k] for k in range(1, n + 1))) / b[0]))
    return [sp.expand(c[n] * fact[n]) for n in range(order + 1)], (u_sym, xu_sym)


def main() -> None:
    order, beta0 = 3, 2.0
    pos = np.asarray(
        idealgas.x_sample((2_000, 50) if SMOKE else (20_000, 500), beta0, rng=0)
    )
    xsq = (pos**2).mean(axis=-1)  # custom observable: <x^2> estimator
    u = pos.sum(axis=-1)

    data = xtpu.factory_data_values(uv=u, xv=xsq, order=order, central=False)

    m_native = beta.factory_extrapmodel(beta0, data)  # built-in engine
    m_custom = xtpu.ExtrapModel(
        beta0, data, Derivatives(coefs_fn=custom_coefs_fn, name="custom"), order=order
    )
    exprs, args = sympy_exprs(order)
    m_sympy = xtpu.ExtrapModel(
        beta0, data, Derivatives.from_sympy(exprs, args), order=order
    )

    b_eval = 2.3
    print("native :", float(np.asarray(m_native.predict(b_eval))))
    print("custom :", float(np.asarray(m_custom.predict(b_eval))))
    print("sympy  :", float(np.asarray(m_sympy.predict(b_eval))))


if __name__ == "__main__":
    main()
