r"""Kernel expression factories (sympy) for the derivative GPR
(TPU-native rebuild of /root/reference/src/thermoextrap/gpr_active/
active_utils.py:460-674).  Expressions are differentiated per
derivative-order pair and lambdified to jax by
:class:`~thermoextrap_tpu.gpr_active.gp_models.DerivativeKernel`.
"""

from __future__ import annotations

import sympy as sp

from .gp_models import DerivativeKernel, Parameter

__all__ = [
    "CallableDerivativeKernel",
    "ChangeInnerOuterRBFDerivKernel",
    "RBFDerivKernel",
    "make_matern_expr",
    "make_poly_expr",
    "make_rbf_expr",
]


def make_rbf_expr(n_dims: int = 1):
    """RBF kernel expression + default parameters."""
    var = sp.symbols("var", real=True)
    if n_dims == 1:
        x1, x2, ell = sp.symbols("x1 x2 l", real=True)
        expr = var * sp.exp(-0.5 * (x1 / ell - x2 / ell) ** 2)
        params = {"var": Parameter(1.0, "positive"), "l": Parameter(1.0, "positive")}
        return expr, params
    ls = [sp.symbols(f"l_{i}", real=True) for i in range(n_dims)]
    x1s = [sp.symbols(f"x1_{i}", real=True) for i in range(n_dims)]
    x2s = [sp.symbols(f"x2_{i}", real=True) for i in range(n_dims)]
    sq = sum(((a - b) / l) ** 2 for a, b, l in zip(x2s, x1s, ls))
    expr = var * sp.exp(-0.5 * sq)
    params = {"var": Parameter(1.0, "positive")}
    params.update({f"l_{i}": Parameter(1.0, "positive") for i in range(n_dims)})
    return expr, params


def make_matern_expr(p: int):
    """Matern kernel of half-integer order ``nu = p + 1/2``."""
    d, k = sp.symbols("d k")
    poly = sp.Sum(
        (sp.factorial(p + k) / (sp.factorial(k) * sp.factorial(p - k)))
        * (2 * sp.sqrt(float(2 * p + 1)) * d) ** (p - k),
        (k, 0, p),
    ).doit()
    poly = poly * sp.factorial(p) / sp.factorial(2 * p)
    full = sp.simplify(poly * sp.exp(-sp.sqrt(float(2 * p + 1)) * d))
    x1, x2, ell, var = sp.symbols("x1 x2 l var", real=True)
    dist = sp.sqrt((x1 / ell - x2 / ell) ** 2)
    params = {"var": Parameter(1.0, "positive"), "l": Parameter(1.0, "positive")}
    return var * full.subs(d, dist), params


def make_poly_expr(p: int):
    """Polynomial kernel ``(var x1 x2 + l)^p``."""
    x1, x2, ell, var = sp.symbols("x1 x2 l var", real=True)
    params = {"var": Parameter(1.0, "positive"), "l": Parameter(1.0, "positive")}
    return (var * x1 * x2 + ell) ** p, params


class RBFDerivKernel(DerivativeKernel):
    """Convenience 1-D RBF derivative kernel (reference active_utils.py:600-608)."""

    def __init__(self, **kws) -> None:
        expr, params = make_rbf_expr()
        super().__init__(expr, 1, kernel_params=params, **kws)


class ChangeInnerOuterRBFDerivKernel(DerivativeKernel):
    """Two-changepoint tanh-switched RBF: outer kernel for ``x <= c1`` or
    ``x >= c2``, inner kernel between (reference active_utils.py:611-674)."""

    def __init__(self, c1: float = -7.0, c2: float = -2.0, **kws) -> None:
        x1, x2 = sp.symbols("x1 x2", real=True)
        var, l_out, l_in = sp.symbols("var l_out l_in", real=True)
        k_out = var * sp.exp(-0.5 * (x1 / l_out - x2 / l_out) ** 2)
        k_in = var * sp.exp(-0.5 * (x1 / l_in - x2 / l_in) ** 2)

        x, s, c = sp.symbols("x s c")
        sig = 0.5 * (1.0 + sp.tanh(s * (x - c)))
        low = (1.0 - sig.subs(x, x1)) * (1.0 - sig.subs(x, x2))
        hi = sig.subs(x, x1) * sig.subs(x, x2)

        c1s, c2s = sp.symbols("c1 c2")
        full = (
            k_out * low.subs(c, c1s)
            + hi.subs(c, c1s) * k_in * low.subs(c, c2s)
            + hi.subs(c, c2s) * k_out
        )
        params = {
            "var": Parameter(1.0, "positive"),
            "l_out": Parameter(1.0, "positive"),
            "l_in": Parameter(1.0, "positive"),
            "s": Parameter(10.0, "positive", trainable=False),
            "c1": Parameter(c1, "none", trainable=False),
            "c2": Parameter(c2, "none", trainable=False),
        }
        super().__init__(full, 1, kernel_params=params, **kws)


class CallableDerivativeKernel(DerivativeKernel):
    """Derivative kernel over a plain jax-callable — mixed partials by
    nested ``jax.grad`` instead of sympy (the fully jax-native alternative
    to the reference's sympy-expression kernels; useful when the kernel has
    no closed symbolic form, e.g. learned or numerically-defined kernels).

    Parameters
    ----------
    fn :
        ``fn(x1, x2, *param_values) -> scalar`` with ``x1, x2`` length-
        ``obs_dims`` jax vectors and parameters scalar.
    obs_dims, kernel_params :
        As for :class:`~thermoextrap_tpu.gpr_active.gp_models.DerivativeKernel`
        (``kernel_params`` is required: it defines parameter names/order).
    """

    def __init__(self, fn, obs_dims: int = 1, kernel_params=None) -> None:
        import jax

        if not kernel_params:
            msg = "kernel_params (name -> Parameter/value) is required"
            raise ValueError(msg)
        # bypass DerivativeKernel.__init__ (no sympy expression to mine)
        self.fn = fn
        self.obs_dims = int(obs_dims)
        self.kernel_expr = None
        self.x_syms = []
        self.param_syms = []
        self.params = {}
        for name, spec in kernel_params.items():
            if isinstance(spec, Parameter):
                self.params[name] = spec
            else:
                self.params[name] = Parameter(float(spec), "positive")
        self._fn_cache = {}
        self._jax = jax

    def structure_id(self):
        # the callable IS the functional form; key compiled-core caches on
        # the object itself (hashable by identity — the cache entry keeps
        # it alive, so the identity stays unique).  The base class' sympy
        # srepr would be the constant 'None' here and collide every
        # callable kernel onto one shared compiled core.
        return self.fn

    def _deriv_fn(self, d1: tuple, d2: tuple):
        key = (tuple(d1), tuple(d2))
        if key not in self._fn_cache:
            jax = self._jax
            d = self.obs_dims

            g = self.fn
            for argnum, orders in ((0, d1), (1, d2)):
                for k, n in enumerate(orders):
                    for _ in range(int(n)):
                        g = (
                            lambda f, a=argnum, kk=k: lambda *args: jax.grad(
                                f, argnums=a
                            )(*args)[kk]
                        )(g)

            def eval_fn(*flat, _g=g, _d=d):
                import jax.numpy as jnp

                cols1, cols2 = flat[:_d], flat[_d : 2 * _d]
                pvals = flat[2 * _d :]
                x1 = jnp.stack(jnp.broadcast_arrays(*cols1), axis=-1)
                x2 = jnp.stack(jnp.broadcast_arrays(*cols2), axis=-1)
                pair = lambda a, b: _g(a, b, *pvals)
                flat_shape = x1.shape[:-1]
                out = jax.vmap(pair)(
                    x1.reshape(-1, _d), x2.reshape(-1, _d)
                )
                return out.reshape(flat_shape)

            self._fn_cache[key] = eval_fn
        return self._fn_cache[key]
