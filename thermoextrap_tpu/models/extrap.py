r"""Extrapolation / interpolation models.

TPU-native rebuild of /root/reference/src/thermoextrap/models.py:433-1111
(``ExtrapModel``, ``StateCollection``, ``ExtrapWeightedModel``, ``InterpModel``,
``InterpModelPiecewise``, ``PerturbModel``, ``MBARModel``).

Models are thin host-side orchestration; all numerics (coefficient
evaluation, polynomial assembly/solve, reweighting) are jax array programs
with static shapes.  Output layout: an array-valued ``alpha`` of shape
``(A,)`` produces outputs ``(A, *rest)`` where ``rest`` is the coefficient
batch shape (replicates, values, ...).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.series import derivs_from_coefs
from .derivatives import Derivatives

__all__ = [
    "ExtrapModel",
    "predict_fn",
    "ExtrapWeightedModel",
    "InterpModel",
    "InterpModelPiecewise",
    "MBARModel",
    "PerturbModel",
    "StateCollection",
    "xr_weights_minkowski",
]


def _alpha_powers(dalpha, order: int):
    """(A, order+1) or (order+1,) power stack."""
    dalpha = jnp.asarray(dalpha)
    out = [jnp.ones_like(dalpha)]
    for _ in range(order):
        out.append(out[-1] * dalpha)
    return jnp.stack(out, axis=-1)


def _poly_eval(coefs, dalpha, *, cumsum: bool = False, no_sum: bool = False):
    """Evaluate ``sum_m coefs[m] * dalpha^m``.

    ``coefs``: ``(order+1, *rest)``; ``dalpha``: scalar or ``(A,)``.
    Returns ``(*A, *rest)`` (or with a leading order axis for
    ``cumsum``/``no_sum``, matching reference predict options,
    models.py:554-565).
    """
    order = coefs.shape[0] - 1
    dalpha = jnp.asarray(dalpha)
    p = _alpha_powers(dalpha, order)  # (*A, order+1)
    # terms: (*A, order+1, *rest)
    terms = p.reshape(p.shape + (1,) * (coefs.ndim - 1)) * coefs
    if no_sum:
        return terms
    if cumsum:
        return jnp.cumsum(terms, axis=dalpha.ndim)
    return terms.sum(axis=dalpha.ndim)


def joint_interp_coefs(alpha0s, derivs_list, order: int):
    """Joint-polynomial coefficients through all states: solve the
    ``(porder+1)^2`` derivative-matching system (reference
    models.py:853-932; the shared core of :meth:`InterpModel.coefs` and
    the streaming-interp pipeline's fused predict).  Run under a host-f64
    context — the system's condition number grows like ``alpha^porder``.

    ``derivs_list``: one ``(order+1, *rest)`` UNNORMALIZED derivative
    stack per state (extra ``rest`` axes — e.g. a bootstrap-replicate
    batch — ride through the solve's RHS).
    """
    nstates = len(alpha0s)
    porder = nstates * (order + 1) - 1

    power = np.arange(porder + 1)
    fact = np.array([math.factorial(p) for p in power], dtype=np.float64)

    rows = []
    for a in (float(a) for a in alpha0s):
        for j in range(order + 1):
            with np.errstate(divide="ignore", invalid="ignore"):
                denom = np.array(
                    [math.factorial(p - j) if p >= j else np.inf for p in power]
                )
                row = np.where(power >= j, a ** np.maximum(power - j, 0), 0.0)
                row = row * fact / denom
            rows.append(row)
    mat = jnp.asarray(np.nan_to_num(np.array(rows), posinf=0.0, neginf=0.0))

    derivs = jnp.concatenate(
        [jnp.asarray(d, dtype=jnp.float64) for d in derivs_list], axis=0
    )  # (porder+1, *rest)
    rest = derivs.shape[1:]
    flat = derivs.reshape(porder + 1, -1)
    coefs = jnp.linalg.solve(mat, flat)
    return coefs.reshape((porder + 1, *rest))


def eval_abs_poly(coefs, alpha):
    """Evaluate the joint polynomial in ABSOLUTE alpha (the interp
    convention — extrapolation polynomials use ``dalpha`` powers via
    :func:`_poly_eval` instead)."""
    alpha = jnp.asarray(alpha, dtype=coefs.dtype)
    p = _alpha_powers(alpha, coefs.shape[0] - 1)
    terms = p.reshape(p.shape + (1,) * (coefs.ndim - 1)) * coefs
    return terms.sum(axis=alpha.ndim)


class ExtrapModel:
    """Taylor-series extrapolation (reference models.py:433-576)."""

    def __init__(
        self,
        alpha0: float,
        data: Any,
        derivatives: Derivatives,
        order: int | None = None,
        minus_log: bool = False,
        alpha_name: str = "alpha",
    ) -> None:
        self.alpha0 = float(alpha0)
        self.data = data
        self.derivatives = derivatives
        self.order = int(data.order if order is None else order)
        self.minus_log = bool(minus_log)
        self.alpha_name = alpha_name
        self._coef_cache: dict = {}

    def __call__(self, *args, **kws):
        return self.predict(*args, **kws)

    def coefs(self, order=None, minus_log=None):
        order = self.order if order is None else int(order)
        minus_log = self.minus_log if minus_log is None else bool(minus_log)
        key = (order, minus_log)
        if key not in self._coef_cache:
            self._coef_cache[key] = self.derivatives.coefs(
                data=self.data, order=order, minus_log=minus_log
            )
        return self._coef_cache[key]

    def derivs(self, order=None, minus_log=None, norm=False):
        c = self.coefs(order=order, minus_log=minus_log)
        return c if norm else derivs_from_coefs(c)

    def predict(
        self,
        alpha,
        order=None,
        minus_log=None,
        cumsum: bool = False,
        no_sum: bool = False,
    ):
        coefs = self.coefs(order=order, minus_log=minus_log)
        dalpha = jnp.asarray(alpha) - self.alpha0
        return _poly_eval(coefs, dalpha, cumsum=cumsum, no_sum=no_sum)

    def resample(self, sampler, **kws):
        return type(self)(
            alpha0=self.alpha0,
            data=self.data.resample(sampler, **kws),
            derivatives=self.derivatives,
            order=self.order,
            minus_log=self.minus_log,
            alpha_name=self.alpha_name,
        )


class StateCollection:
    """Sequence of models (reference models.py:580-723)."""

    def __init__(self, states: Sequence, **kws) -> None:
        self.states = list(states)
        self.kws = kws

    def __call__(self, *args, **kws):
        return self.predict(*args, **kws)

    def __len__(self) -> int:
        return len(self.states)

    def __getitem__(self, idx):
        return self.states[idx]

    def __iter__(self):
        return iter(self.states)

    @property
    def alpha_name(self):
        return getattr(self[0], "alpha_name", "alpha")

    @property
    def order(self):
        return min(m.order for m in self)

    @property
    def alpha0(self):
        return [m.alpha0 for m in self]

    def resample(self, sampler, **kws):
        samplers = (
            sampler
            if isinstance(sampler, (list, tuple))
            else [sampler] * len(self)
        )
        if len(samplers) != len(self):
            msg = f"{len(samplers)=} must equal {len(self)=}"
            raise ValueError(msg)
        return type(self)(
            [s.resample(smp, **kws) for s, smp in zip(self.states, samplers)],
            **self.kws,
        )

    def map(self, func, *args, **kws):
        if isinstance(func, str):
            return [getattr(s, func)(*args, **kws) for s in self]
        return [func(s, *args, **kws) for s in self]

    def map_concat(self, func, *args, **kws):
        """Apply ``func`` (callable or method name) to every state and stack
        the results along a new leading per-state axis (reference
        models.py:658-672 concatenates along an ``alpha0`` pandas index;
        here the axis order IS ``self.alpha0``)."""
        return jnp.stack([jnp.asarray(o) for o in self.map(func, *args, **kws)])

    def append(self, states, sort: bool = True, key: Callable | None = None):
        new_states = list(self.states) + list(states)
        if sort:
            key = key if key is not None else (lambda x: x.alpha0)
            new_states = sorted(new_states, key=key)
        return type(self)(new_states, **self.kws)

    def _check_alpha(self, alpha, bounded: bool = False) -> None:
        if bounded:
            seq = np.atleast_1d(np.asarray(alpha))
            lb, ub = self[0].alpha0, self[-1].alpha0
            for a in seq:
                if a < lb or a > ub:
                    msg = f"{a} outside of bounds [{lb}, {ub}]"
                    raise ValueError(msg)


def xr_weights_minkowski(deltas, m: int = 20, axis: int = 0):
    """Minkowski blend weights (reference models.py:726-728).

    Weights are scale-invariant in ``deltas``, so normalize by the max
    before the 20th power: in f32 (the TPU production default) raw
    ``delta**20`` underflows to 0 for deltas below ~0.006, which made the
    weights 1 - 0/0 = NaN for closely spaced bracketing states (the
    reference runs in numpy f64 and never sees this).
    """
    deltas = jnp.asarray(deltas)
    scale = jnp.max(jnp.abs(deltas), axis=axis, keepdims=True)
    deltas_m = (deltas / jnp.where(scale > 0, scale, 1.0)) ** m
    # all-zero deltas (query exactly on every state): equal weights
    s = deltas_m.sum(axis=axis, keepdims=True)
    deltas_m = jnp.where(s > 0, deltas_m, jnp.ones_like(deltas_m))
    return 1.0 - deltas_m / deltas_m.sum(axis=axis, keepdims=True)


class _PiecewiseMixin:
    """Bracketing-state selection (reference models.py:731-757)."""

    def _indices_between_alpha(self, alpha):
        idx = int(np.digitize(alpha, self.alpha0, right=False)) - 1
        idx = max(idx, 0)
        idx = min(idx, len(self) - 2)
        return [idx, idx + 1]

    def _indices_nearest_alpha(self, alpha):
        dalpha = np.abs(np.asarray(self.alpha0) - alpha)
        return list(np.argsort(dalpha)[:2])

    def _indices_alpha(self, alpha, method):
        if method is None or method == "between":
            return self._indices_between_alpha(alpha)
        if method == "nearest":
            return self._indices_nearest_alpha(alpha)
        msg = f"unknown method {method}"
        raise ValueError(msg)


class ExtrapWeightedModel(StateCollection, _PiecewiseMixin):
    """Minkowski-weighted blend of bracketing extrapolations
    (reference models.py:760-850)."""

    def predict(
        self,
        alpha,
        order=None,
        minus_log=None,
        method=None,
        bounded: bool = False,
    ):
        self._check_alpha(alpha, bounded)
        order = self.order if order is None else order

        alpha_arr = np.atleast_1d(np.asarray(alpha))
        scalar = np.ndim(alpha) == 0

        outs = []
        for a in alpha_arr:
            states = (
                self.states
                if len(self) == 2
                else [self[i] for i in self._indices_alpha(float(a), method)]
            )
            preds = jnp.stack(
                [m.predict(a, order=order, minus_log=minus_log) for m in states],
                axis=0,
            )
            deltas = jnp.abs(
                jnp.asarray([float(a) - m.alpha0 for m in states])
            ).reshape((-1,) + (1,) * (preds.ndim - 1))
            w = xr_weights_minkowski(deltas, axis=0)
            outs.append((preds * w).sum(0) / w.sum(0))
        out = jnp.stack(outs, axis=0)
        return out[0] if scalar else out


class InterpModel(StateCollection):
    """Joint polynomial through all states (reference models.py:853-932):
    solve the (porder+1)^2 derivative-matching system with
    ``jnp.linalg.solve`` (vs explicit ``np.linalg.inv`` in the reference).

    Examples
    --------
    Two order-1 states recover a cubic observable exactly (the joint
    polynomial matches values and slopes at both ends):

    >>> import numpy as np
    >>> from types import SimpleNamespace
    >>> from thermoextrap_tpu.models.derivatives import Derivatives
    >>> f = lambda a: a**3 - 2 * a  # noqa: E731
    >>> df = lambda a: 3 * a**2 - 2  # noqa: E731
    >>> def make_state(alpha):
    ...     d = Derivatives.from_funcs(
    ...         [lambda a=alpha: np.float64(f(a)), lambda a=alpha: np.float64(df(a))]
    ...     )
    ...     data = SimpleNamespace(derivs_args=(), order=1)
    ...     return ExtrapModel(alpha0=alpha, data=data, derivatives=d, order=1)
    >>> m = InterpModel([make_state(0.0), make_state(2.0)])
    >>> round(float(np.asarray(m.predict(1.0))), 10)  # 1 - 2 = -1
    -1.0
    """

    def coefs(self, order=None, minus_log=None):
        if order is None:
            order = self.order
        # cached like ExtrapModel.coefs: InterpModelPiecewise.predict calls
        # this once per alpha element — without the cache each call repays
        # the derivative assembly + host-f64 solve (one device round trip
        # per grid point on a remote-dispatch backend)
        key = (int(order), minus_log)
        if not hasattr(self, "_coef_cache"):
            self._coef_cache = {}
        if key in self._coef_cache:
            return self._coef_cache[key]
        # derivatives first, on the normal backend (may hit Pallas kernels)
        derivs_list = [
            m.derivs(order=order, minus_log=minus_log, norm=False)
            for m in self.states
        ]
        # the (porder+1)^2 derivative-matching system has condition number
        # ~alpha^porder: solve in f64 on the host (utils/compute.py)
        from ..utils.compute import host_f64

        with host_f64():
            out = self._coefs(derivs_list, order=order)
        self._coef_cache[key] = out
        return out

    def _coefs(self, derivs_list, order):
        return joint_interp_coefs(
            [float(m.alpha0) for m in self.states], derivs_list, order
        )

    def predict(self, alpha, order=None, minus_log=None):
        from ..utils.compute import host_f64

        coefs = self.coefs(order=order, minus_log=minus_log)
        with host_f64():
            return eval_abs_poly(coefs, alpha)


class InterpModelPiecewise(StateCollection, _PiecewiseMixin):
    """Piecewise pairwise interpolation (reference models.py:935-1006)."""

    def __init__(self, states, **kws) -> None:
        super().__init__(states, **kws)
        self._pair_cache: dict = {}

    def single_interpmodel(self, i: int, j: int) -> InterpModel:
        key = (i, j)
        if key not in self._pair_cache:
            self._pair_cache[key] = InterpModel([self[i], self[j]])
        return self._pair_cache[key]

    def predict(
        self, alpha, order=None, minus_log=None, method=None, bounded: bool = False
    ):
        self._check_alpha(alpha, bounded)
        alpha_arr = np.atleast_1d(np.asarray(alpha))
        scalar = np.ndim(alpha) == 0
        outs = []
        for a in alpha_arr:
            i, j = (
                (0, 1)
                if len(self) == 2
                else self._indices_alpha(float(a), method)
            )
            model = self.single_interpmodel(int(i), int(j))
            outs.append(model.predict(a, order=order, minus_log=minus_log))
        out = jnp.stack(outs, axis=0)
        return out[0] if scalar else out


class PerturbModel:
    """Exponential reweighting perturbation (reference models.py:1009-1046),
    stabilized with a max-shift (equivalent to logsumexp)."""

    def __init__(self, alpha0: float, data: Any, alpha_name: str = "alpha") -> None:
        self.alpha0 = float(alpha0)
        self.data = data
        self.alpha_name = alpha_name

    def predict(self, alpha):
        uv = self.data.uv  # (R,)
        xv = self.data.xv  # (R, *val)
        alpha = jnp.asarray(alpha)
        scalar = alpha.ndim == 0
        alphas = jnp.atleast_1d(alpha)

        dalpha = alphas - self.alpha0  # (A,)
        expo = -dalpha[:, None] * uv[None, :]  # (A, R)
        expo = expo - expo.max(axis=1, keepdims=True)
        ev = jnp.exp(expo)
        xflat = xv.reshape(uv.shape[0], -1)
        num = ev @ xflat / uv.shape[0]
        den = ev.mean(axis=1)
        out = (num / den[:, None]).reshape((alphas.shape[0], *xv.shape[1:]))
        return out[0] if scalar else out

    def __call__(self, *args, **kws):
        return self.predict(*args, **kws)

    def resample(self, sampler, **kws):
        return type(self)(
            alpha0=self.alpha0,
            data=self.data.resample(sampler, **kws),
            alpha_name=self.alpha_name,
        )


@partial(jax.jit, static_argnames="method")
def _mbar_predict_core(uv, xv, alpha0, alphas, method="hybrid"):
    """Pooled-sample MBAR solve + grid of target expectations, one program."""
    from .mbar import mbar_expectations_grid, mbar_solve

    # reduced potential of EVERY state evaluated on ALL pooled samples
    u_kn = alpha0[:, None] * uv.reshape(1, -1)  # (K, K*R)
    n_k = jnp.full((uv.shape[0],), uv.shape[-1] * 1.0, dtype=uv.dtype)
    f_k = mbar_solve(u_kn, n_k, method=method)
    u_flat = uv.reshape(1, -1)
    x_flat = xv.reshape(u_kn.shape[1], -1)
    return mbar_expectations_grid(
        u_kn, n_k, f_k, alphas[:, None] * u_flat, x_flat
    )


class MBARModel(StateCollection):
    """Multistate Bennett acceptance ratio reweighting
    (reference models.py:1049-1111, which delegates to ``pymbar``; here the
    MBAR equations are solved natively in jax by a Newton/self-consistent
    hybrid — see models/mbar.py)."""

    def predict(self, alpha, method: str = "hybrid"):
        uv = jnp.stack([jnp.asarray(m.data.uv) for m in self], axis=0)  # (K, R)
        xv = jnp.stack([jnp.asarray(m.data.xv) for m in self], axis=0)  # (K, R, *val)
        alpha0 = jnp.asarray([m.alpha0 for m in self])  # (K,)

        alpha = jnp.asarray(alpha)
        scalar = alpha.ndim == 0
        alphas = jnp.atleast_1d(alpha)

        out = _mbar_predict_core(uv, xv, alpha0, alphas, method=method)
        out = out.reshape((alphas.shape[0], *xv.shape[2:]))
        return out[0] if scalar else out

    def predict_ci(
        self,
        alpha,
        nrep: int = 100,
        seed: int = 0,
        method: str = "hybrid",
        rep_chunk: int = 8,
    ):
        """Bootstrap ``(mean, std)`` of the reweighted prediction.

        Goes beyond the reference, whose ``MBARModel.resample`` raises
        NotImplementedError (models.py:1108-1111) and whose ``predict``
        discards pymbar's uncertainty output: each Poisson replicate
        re-solves the weighted MBAR problem and re-evaluates every target —
        the full solver pipeline is vmapped over replicates on device
        (models/mbar.py:mbar_bootstrap_expectations).
        """
        from .mbar import mbar_bootstrap_expectations

        uv = jnp.stack([jnp.asarray(m.data.uv) for m in self], axis=0)
        xv = jnp.stack([jnp.asarray(m.data.xv) for m in self], axis=0)
        alpha0 = jnp.asarray([m.alpha0 for m in self])

        alpha = jnp.asarray(alpha)
        scalar = alpha.ndim == 0
        alphas = jnp.atleast_1d(alpha)

        u_flat = uv.reshape(1, -1)
        u_kn = alpha0[:, None] * u_flat
        n_k = np.full(len(self), uv.shape[-1])
        mean, std = mbar_bootstrap_expectations(
            u_kn,
            n_k,
            alphas[:, None] * u_flat,
            xv.reshape(u_kn.shape[1], -1),
            nrep=nrep,
            key=jax.random.key(seed),
            method=method,
            rep_chunk=rep_chunk,
        )
        shape = (alphas.shape[0], *xv.shape[2:])
        mean, std = mean.reshape(shape), std.reshape(shape)
        return (mean[0], std[0]) if scalar else (mean, std)

    def resample(self, *args, **kws):
        msg = (
            "resample not implemented for MBARModel (reference parity, "
            "models.py:1108-1111); use predict_ci(alpha, nrep=) for "
            "bootstrap uncertainties"
        )
        raise NotImplementedError(msg)


def predict_fn(model: ExtrapModel):
    """Return a pure jittable ``fn(alpha) -> prediction`` with the model's
    coefficients captured as constants — for embedding extrapolation
    predictions inside larger jitted/pjit programs (the model object itself
    is host-side orchestration)."""
    coefs = model.coefs()
    alpha0 = model.alpha0

    def fn(alpha):
        return _poly_eval(coefs, jnp.asarray(alpha) - alpha0)

    return fn
