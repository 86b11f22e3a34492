r"""Experimental noise-GP GPR variants (Binois/Ankenman protocol).

TPU-native rebuild of the reference's two experimental models
(/root/reference/src/thermoextrap/gpr_active/gp_models.py):

- :class:`HetGaussianNoiseGP` (reference :261-334) — a heteroscedastic
  Gaussian likelihood whose noise field is itself modeled by an inner GP
  on the *logarithm* of the noise variance.
- :class:`FullyHeteroscedasticGPR` (reference :337-476) — an exact GPR
  whose noise diagonal is the inner GP's posterior prediction, with the
  outer and inner log-likelihoods optimized JOINTLY (Binois et al. 2018,
  over the per-state means protocol of Ankenman et al. 2010).

The reference marks both "EXPERIMENTAL! NOT INTENDED FOR USE, BUT USEFUL
FOR FUTURE WORK!" and exercises them in no test or example; they are
rebuilt here so the component inventory is complete *and* maintained:
everything below trains through jitted value-and-grad cores and is gated
by exact numpy-f64 oracles in ``tests/test_experimental_gps.py``.

Design changes from the reference:

- **No GPflow.** The inner noise GP is a compact exact GPR
  (:class:`PlainGPR`) over closed-form stationary kernels
  (:class:`StationaryKernel`: RBF / Matérn 5/2, per-dimension
  lengthscales — the reference's default ``gpflow.kernels.Matern52``).
- **One jitted joint core.** The reference evaluates two TF graphs and
  sums; here the joint negative LML and its gradient over the
  concatenated unconstrained trainable vector are a single jitted
  function, cached at module level on model structure (the same
  compiled-core pattern as :mod:`.gp_models`).
- **f64 on host.** Cholesky factorizations run under the host-CPU f64
  context (``gp_models._compute_ctx``), same division of labor as the
  rest of the GPR stack.

Reference quirk deliberately *not* reproduced: the reference's
``predict_log_density`` broadcasts a 1-column latent against the 2-column
``Y[:, 1:]`` tail of its 3-column data (gp_models.py:455-476) — here the
noise observation is reconstructed explicitly (``var * n``) so the
density is well-defined; see :meth:`FullyHeteroscedasticGPR.predict_log_density`.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .gp_models import (
    Parameter,
    TrainableGPModel,
    _compute_ctx,
    _softplus,
)

__all__ = [
    "FullyHeteroscedasticGPR",
    "HetGaussianNoiseGP",
    "PlainGPR",
    "StationaryKernel",
]

_JITTER = 1.0e-10


def _gaussian_log_density(x, mu, var):
    """Elementwise N(x | mu, var) log density (gpflow.logdensities.gaussian)."""
    return -0.5 * (jnp.log(2.0 * jnp.pi) + jnp.log(var) + (x - mu) ** 2 / var)


def _mvn_log_density(y, mu, chol):
    """Multivariate-normal log density summed over output columns of ``y``
    with a single shared Cholesky factor ``chol`` (N, N)."""
    a = jax.scipy.linalg.solve_triangular(chol, y - mu, lower=True)
    n, d = y.shape
    return (
        -0.5 * jnp.sum(a**2)
        - 0.5 * n * d * jnp.log(2.0 * jnp.pi)
        - d * jnp.sum(jnp.log(jnp.diagonal(chol)))
    )


# ---------------------------------------------------------------------------
# stationary kernels in closed form
# ---------------------------------------------------------------------------


def _sqdist(x1, x2, ls):
    """Scaled squared distance matrix: ``sum_k ((x1 - x2) / ls)^2``."""
    s1 = x1 / ls
    s2 = x2 / ls
    return jnp.maximum(
        jnp.sum(s1**2, -1)[:, None]
        - 2.0 * s1 @ s2.T
        + jnp.sum(s2**2, -1)[None, :],
        0.0,
    )


class StationaryKernel:
    """Closed-form stationary kernel with per-dimension lengthscales.

    Plain-location analogue of :class:`.gp_models.DerivativeKernel` for the
    experimental noise-GP models, whose inputs carry no derivative columns
    (the reference uses stock ``gpflow.kernels`` there).  ``kind``:

    - ``"rbf"``:      ``variance * exp(-r2 / 2)``
    - ``"matern52"``: ``variance * (1 + sqrt(5) r + 5 r2 / 3) exp(-sqrt(5) r)``

    with ``r2`` the lengthscale-scaled squared distance.  Parameters are
    ``variance`` and ``ls{k}`` for each input dimension, all positive.
    """

    KINDS = ("rbf", "matern52")

    def __init__(self, n_dims: int = 1, kind: str = "matern52", variance: float = 1.0, lengthscales=None) -> None:
        if kind not in self.KINDS:
            msg = f"kind must be one of {self.KINDS}, got {kind!r}"
            raise ValueError(msg)
        self.kind = kind
        self.n_dims = int(n_dims)
        if lengthscales is None:
            lengthscales = np.ones(self.n_dims)
        lengthscales = np.broadcast_to(
            np.asarray(lengthscales, dtype=np.float64), (self.n_dims,)
        )
        self.params = {"variance": Parameter(float(variance), "positive")}
        for k in range(self.n_dims):
            self.params[f"ls{k}"] = Parameter(float(lengthscales[k]), "positive")

    @property
    def param_names(self):
        return ("variance", *(f"ls{k}" for k in range(self.n_dims)))

    def kernel_fn(self):
        """Pure ``(x1, x2, pvals) -> K`` closure; ``pvals`` ordered as
        :attr:`param_names` (positional so it jits/grads cleanly)."""
        kind = self.kind

        def kfun(x1, x2, pvals):
            variance = pvals[0]
            ls = jnp.stack(pvals[1:])
            r2 = _sqdist(x1, x2, ls)
            if kind == "rbf":
                return variance * jnp.exp(-0.5 * r2)
            r = jnp.sqrt(r2 + 1e-36)
            sq5 = math.sqrt(5.0)
            return variance * (1.0 + sq5 * r + (5.0 / 3.0) * r2) * jnp.exp(-sq5 * r)

        return kfun

    def _pvals(self):
        return [self.params[k].value for k in self.param_names]

    def __call__(self, X, X2=None):
        """Eager evaluation at the current parameter values."""
        X = jnp.asarray(X)
        X2 = X if X2 is None else jnp.asarray(X2)
        return self.kernel_fn()(X, X2, [jnp.asarray(v) for v in self._pvals()])


# ---------------------------------------------------------------------------
# plain exact GPR (the inner noise model)
# ---------------------------------------------------------------------------

_EXP_CORE: dict = {}


def _build_split(spec_struct):
    """``(trainable_vec, fixed_vec) -> {name: constrained value}`` for a
    static (name, transform, trainable) layout."""

    def split(vec, fixed):
        out = {}
        ti = fi = 0
        for name, transform, trainable in spec_struct:
            if trainable:
                out[name] = _softplus(vec[ti]) if transform == "positive" else vec[ti]
                ti += 1
            else:
                out[name] = fixed[fi]
                fi += 1
        return out

    return split


def _gpr_chol(kfun, pvals, sigma2, x):
    k = kfun(x, x, pvals)
    eye = jnp.eye(x.shape[0], dtype=k.dtype)
    return jnp.linalg.cholesky(k + (sigma2 + _JITTER) * eye)


def _gpr_predict(kfun, pvals, sigma2, x, y, xnew, full_cov):
    """Latent posterior (mean, var) of an exact zero-mean GPR — the
    ``gpflow.models.GPR.predict_f`` math."""
    chol = _gpr_chol(kfun, pvals, sigma2, x)
    kmn = kfun(x, xnew, pvals)
    a = jax.scipy.linalg.solve_triangular(chol, kmn, lower=True)
    b = jax.scipy.linalg.solve_triangular(chol, y, lower=True)
    mean = a.T @ b
    if full_cov:
        var = kfun(xnew, xnew, pvals) - a.T @ a
    else:
        var = (
            jnp.diagonal(kfun(xnew, xnew, pvals)) - jnp.sum(a**2, axis=0)
        )[:, None] * jnp.ones_like(mean)
    return mean, var


def _build_plain_gpr_fns(kernel, spec_struct):
    split = _build_split(spec_struct)
    kfun = kernel.kernel_fn()
    knames = [f"kernel/{k}" for k in kernel.param_names]

    def lml(vec, fixed, x, y):
        p = split(vec, fixed)
        chol = _gpr_chol(kfun, [p[k] for k in knames], p["likelihood/variance"], x)
        return _mvn_log_density(y, 0.0, chol)

    def neg(*args):
        return -lml(*args)

    def predict(vec, fixed, x, y, xnew):
        p = split(vec, fixed)
        return _gpr_predict(
            kfun, [p[k] for k in knames], p["likelihood/variance"], x, y, xnew, False
        )

    return {
        "lml": jax.jit(lml),
        "neg_vag": jax.jit(jax.value_and_grad(neg)),
        "predict": jax.jit(predict),
    }


class PlainGPR(TrainableGPModel):
    """Exact zero-mean GPR with iid Gaussian noise — the
    ``gpflow.models.GPR`` role for the inner noise model of
    :class:`HetGaussianNoiseGP` (reference gp_models.py:279-287).

    ``data = (X (N, D), Y (N, 1))``; kernel a :class:`StationaryKernel`.
    """

    def __init__(self, data, kernel: StationaryKernel, noise_variance: float = 1.0) -> None:
        X, Y = data
        self.X = np.asarray(X, dtype=np.float64)
        self.Y = np.asarray(Y, dtype=np.float64).reshape(self.X.shape[0], -1)
        self.kernel = kernel
        self.likelihood_variance = Parameter(float(noise_variance), "positive")

    def _param_specs(self):
        specs = {f"kernel/{k}": p for k, p in self.kernel.params.items()}
        specs["likelihood/variance"] = self.likelihood_variance
        return specs

    def _structure_key(self):
        return ("plain_gpr", self.kernel.kind, self.kernel.n_dims, self._spec_struct())

    def _lml_fns(self):
        key = self._structure_key()
        if key not in _EXP_CORE:
            _EXP_CORE[key] = _build_plain_gpr_fns(self.kernel, self._spec_struct())
        return _EXP_CORE[key]

    def _bound_args(self):
        return (self._fixed_constrained(), self.X, self.Y)

    def predict_f(self, Xnew, full_cov: bool = False):
        """Latent posterior at new inputs (``full_cov`` recomputed eagerly —
        the experimental matrices are tiny)."""
        with _compute_ctx():
            if full_cov:
                kfun = self.kernel.kernel_fn()
                pvals = [jnp.asarray(v) for v in self.kernel._pvals()]
                return _gpr_predict(
                    kfun,
                    pvals,
                    jnp.asarray(self.likelihood_variance.value),
                    jnp.asarray(self.X),
                    jnp.asarray(self.Y),
                    jnp.asarray(np.asarray(Xnew, dtype=np.float64)),
                    True,
                )
            return self._lml_fns()["predict"](
                jnp.asarray(self.get_unconstrained()),
                *self._bound_args(),
                np.asarray(Xnew, dtype=np.float64),
            )


# ---------------------------------------------------------------------------
# the noise-GP likelihood
# ---------------------------------------------------------------------------


class HetGaussianNoiseGP:
    """Heteroscedastic Gaussian likelihood whose noise field is an inner GP
    (reference gp_models.py:261-334).

    The latent ``F`` has two columns — ``[mean, noise variance]`` — and the
    observation ``Y`` two columns — ``[value, noise-variance observation]``.
    The log probability adds (a) the Gaussian density of the value given the
    mean/noise columns and (b) the Gaussian density of the *log* noise
    observation around the *log* predicted noise under the inner GP's own
    likelihood variance.  ``data = (X, log_noise_obs)`` seeds the inner GP.
    """

    def __init__(self, data, noise_kernel: StationaryKernel | None = None) -> None:
        X, Z = data
        X = np.asarray(X, dtype=np.float64)
        if noise_kernel is None:
            noise_kernel = StationaryKernel(X.shape[1], "matern52")
        self.noise_gp = PlainGPR((X, Z), noise_kernel)

    @property
    def _lik_var(self):
        return jnp.asarray(self.noise_gp.likelihood_variance.value)

    def scalar_log_prob(self, F, Y):
        """Per-row log p(Y | F) (reference ``_scalar_log_prob``)."""
        F, Y = jnp.asarray(F), jnp.asarray(Y)
        return _gaussian_log_density(Y[:, :1], F[:, :1], F[:, 1:]) + _gaussian_log_density(
            jnp.log(Y[:, 1:]), jnp.log(F[:, 1:]), self._lik_var
        )

    def conditional_mean(self, F):
        return jnp.asarray(F)[:, :1]

    def conditional_variance(self, F):
        return jnp.asarray(F)[:, 1:]

    def predict_mean_and_var(self, Fmu, Fvar):
        """Observation mean/variance given latent ``[mean, noise]`` columns:
        the noise prediction adds straight onto the latent variance."""
        Fmu, Fvar = jnp.asarray(Fmu), jnp.asarray(Fvar)
        return Fmu[:, :1], Fvar[:, :1] + Fmu[:, 1:]

    def predict_log_density(self, Fmu, Fvar, Y):
        """Log density of ``Y = [value, noise obs]`` under the predictive
        (external) and latent log-noise (inner-GP) Gaussians."""
        Fmu, Fvar, Y = jnp.asarray(Fmu), jnp.asarray(Fvar), jnp.asarray(Y)
        external = jnp.sum(
            _gaussian_log_density(Y[:, :1], Fmu[:, :1], Fvar[:, :1] + Fmu[:, 1:]),
            axis=-1,
        )
        latent = jnp.sum(
            _gaussian_log_density(jnp.log(Y[:, 1:]), jnp.log(Fmu[:, 1:]), Fvar[:, 1:]),
            axis=-1,
        )
        return external + latent

    def variational_expectations(self, Fmu, Fvar, Y):
        """E_q[log p(Y | F)] under a factorized Gaussian q(F) (reference
        ``_variational_expectations``; the noise column enters through its
        mean — the reference's simplification, kept for parity)."""
        Fmu, Fvar, Y = jnp.asarray(Fmu), jnp.asarray(Fvar), jnp.asarray(Y)
        log2pi = jnp.log(2.0 * jnp.pi)
        external = jnp.sum(
            -0.5 * log2pi
            - 0.5 * jnp.log(Fmu[:, 1:])
            - 0.5 * ((Y[:, :1] - Fmu[:, :1]) ** 2 + Fvar[:, :1]) / Fmu[:, 1:],
            axis=-1,
        )
        latent = jnp.sum(
            -0.5 * log2pi
            - 0.5 * jnp.log(self._lik_var)
            - 0.5
            * ((Y[:, 1:] - jnp.log(Fmu[:, 1:])) ** 2 + Fvar[:, 1:])
            / self._lik_var,
            axis=-1,
        )
        return external + latent


# ---------------------------------------------------------------------------
# the fully heteroscedastic model
# ---------------------------------------------------------------------------


def _build_joint_fns(kernel, noise_kernel, spec_struct):
    split = _build_split(spec_struct)
    kfun = kernel.kernel_fn()
    nfun = noise_kernel.kernel_fn()
    knames = [f"kernel/{k}" for k in kernel.param_names]
    nnames = [f"noise_kernel/{k}" for k in noise_kernel.param_names]

    def _parts(p, x, z, n):
        """Inner-GP Cholesky + the outer noise diagonal it predicts."""
        pn = [p[k] for k in nnames]
        s2 = p["noise_lik/variance"]
        kn = nfun(x, x, pn)
        eye = jnp.eye(x.shape[0], dtype=kn.dtype)
        chol_n = jnp.linalg.cholesky(kn + (s2 + _JITTER) * eye)
        # inner posterior mean of log noise AT the training points
        alpha = jax.scipy.linalg.cho_solve((chol_n, True), z)
        log_s = kn @ alpha
        s_diag = jnp.exp(log_s[:, 0]) / n
        return chol_n, s_diag

    def _outer_chol(p, x, s_diag):
        po = [p[k] for k in knames]
        k = kfun(x, x, po)
        return jnp.linalg.cholesky(k + jnp.diag(s_diag + _JITTER))

    def lml(vec, fixed, x, y, z, n, mean_x):
        p = split(vec, fixed)
        chol_n, s_diag = _parts(p, x, z, n)
        chol = _outer_chol(p, x, s_diag)
        return _mvn_log_density(y, mean_x, chol) + _mvn_log_density(z, 0.0, chol_n)

    def neg(*args):
        return -lml(*args)

    def predict(vec, fixed, x, y, z, n, mean_x, xnew, mean_new, full_cov):
        p = split(vec, fixed)
        _, s_diag = _parts(p, x, z, n)
        chol = _outer_chol(p, x, s_diag)
        po = [p[k] for k in knames]
        kmn = kfun(x, xnew, po)
        a = jax.scipy.linalg.solve_triangular(chol, kmn, lower=True)
        b = jax.scipy.linalg.solve_triangular(chol, y - mean_x, lower=True)
        f_mean = a.T @ b + mean_new
        if full_cov:
            f_var = kfun(xnew, xnew, po) - a.T @ a
        else:
            f_var = (
                jnp.diagonal(kfun(xnew, xnew, po)) - jnp.sum(a**2, axis=0)
            )[:, None] * jnp.ones_like(f_mean)
        return f_mean, f_var

    def predict_noise(vec, fixed, x, z, xnew):
        p = split(vec, fixed)
        return _gpr_predict(
            nfun,
            [p[k] for k in nnames],
            p["noise_lik/variance"],
            x,
            z,
            xnew,
            False,
        )

    return {
        "lml": jax.jit(lml),
        "neg_vag": jax.jit(jax.value_and_grad(neg)),
        "predict": jax.jit(predict, static_argnums=(9,)),
        "predict_noise": jax.jit(predict_noise),
    }


class FullyHeteroscedasticGPR(TrainableGPModel):
    """Exact GPR whose noise diagonal is predicted by an inner noise GP,
    trained by the JOINT log likelihood (reference gp_models.py:337-476;
    Binois et al. 2018 / Ankenman et al. 2010).

    ``data = (X (N, D), Y (N, 3))`` with ``Y`` columns ``[value,
    variance-of-mean, n_samples]``.  The inner GP regresses
    ``log(variance * n)`` (the per-configuration noise); the outer model
    sees ``exp(prediction) / n`` on its diagonal, so states estimated from
    more samples get proportionally less noise.  The two marginal
    likelihoods are summed and optimized together over the concatenated
    parameter vector (outer kernel + inner kernel + inner likelihood
    variance) by the shared NaN-guarded L-BFGS loop.

    ``mean_function`` must be a FIXED callable: it is evaluated on the
    training inputs once at construction and its parameters are not part
    of the trained vector — the same contract as
    :class:`~.gp_models.HeteroscedasticGPR` and as the reference's own
    mean functions, which are explicitly non-trainable
    (reference gp_models.py:1195, 1241-1242).
    """

    def __init__(self, data, kernel: StationaryKernel, mean_function=None, noise_kernel: StationaryKernel | None = None) -> None:
        X, Y = data
        X = np.asarray(X, dtype=np.float64)
        Y = np.asarray(Y, dtype=np.float64)
        if Y.ndim != 2 or Y.shape[1] != 3:
            msg = f"Y must be (N, 3) = [value, variance, n_samples], got {Y.shape}"
            raise ValueError(msg)
        self.X = X
        self.Y = Y
        self.kernel = kernel
        self.mean_function = mean_function
        self.likelihood = HetGaussianNoiseGP(
            (X, np.log(Y[:, 1:2] * Y[:, 2:3])), noise_kernel
        )
        # conservative per-state sample count for predict_y at new points
        # (reference :382-384)
        self.min_samps = float(np.min(Y[:, -1]))
        with _compute_ctx():
            self._mean_x_np = np.asarray(self._mean(X), dtype=np.float64)

    # -- structure/plumbing -----------------------------------------------------

    def _mean(self, X):
        if self.mean_function is None:
            return jnp.zeros((np.asarray(X).shape[0], 1))
        return jnp.asarray(self.mean_function(X)).reshape(np.asarray(X).shape[0], 1)

    def _param_specs(self):
        specs = {f"kernel/{k}": p for k, p in self.kernel.params.items()}
        specs.update(
            {
                f"noise_kernel/{k}": p
                for k, p in self.likelihood.noise_gp.kernel.params.items()
            }
        )
        specs["noise_lik/variance"] = self.likelihood.noise_gp.likelihood_variance
        return specs

    def _structure_key(self):
        return (
            "fully_het_gpr",
            self.kernel.kind,
            self.kernel.n_dims,
            self.likelihood.noise_gp.kernel.kind,
            self._spec_struct(),
        )

    def _lml_fns(self):
        key = self._structure_key()
        if key not in _EXP_CORE:
            _EXP_CORE[key] = _build_joint_fns(
                self.kernel, self.likelihood.noise_gp.kernel, self._spec_struct()
            )
        return _EXP_CORE[key]

    def _bound_args(self):
        return (
            self._fixed_constrained(),
            self.X,
            self.Y[:, :1],
            self.likelihood.noise_gp.Y,
            self.Y[:, -1],
            self._mean_x_np,
        )

    # -- prediction -------------------------------------------------------------

    def maximum_log_likelihood_objective(self):
        return self.log_marginal_likelihood()

    def predict_noise(self, Xnew):
        """(noise variance, latent log-noise variance) at new inputs —
        ``exp`` of the inner GP's posterior mean (reference :386-389).
        This is the *per-configuration* noise; divide by a sample count
        for the noise of an n-sample mean."""
        with _compute_ctx():
            log_noise, log_noise_var = self._lml_fns()["predict_noise"](
                jnp.asarray(self.get_unconstrained()),
                self._fixed_constrained(),
                self.X,
                self.likelihood.noise_gp.Y,
                np.asarray(Xnew, dtype=np.float64),
            )
            return jnp.exp(log_noise), log_noise_var

    def predict_f(self, Xnew, full_cov: bool = False):
        """Latent posterior at new inputs under the noise-GP-predicted
        training noise diagonal (reference :411-438)."""
        Xnew = np.asarray(Xnew, dtype=np.float64)
        with _compute_ctx():
            mean_new = np.asarray(self._mean(Xnew), dtype=np.float64)
            return self._lml_fns()["predict"](
                jnp.asarray(self.get_unconstrained()),
                *self._bound_args(),
                Xnew,
                mean_new,
                bool(full_cov),
            )

    def predict_y(self, Xnew):
        """Observation mean/variance at new inputs, with new-point noise
        taken conservatively at the SMALLEST training sample count
        (reference :440-453)."""
        f_mean, f_var = self.predict_f(Xnew)
        noise_mean, noise_var = self.predict_noise(Xnew)
        noise_mean = noise_mean / self.min_samps
        return self.likelihood.predict_mean_and_var(
            jnp.concatenate([f_mean, noise_mean], axis=1),
            jnp.concatenate([f_var, noise_var], axis=1),
        )

    def predict_log_density(self, data):
        """Per-point log density of held-out ``(X, Y)`` with ``Y`` in the
        training 3-column layout (the noise observation is ``var * n``,
        matching the inner GP's training target; see module docstring for
        the reference's broadcasting quirk here)."""
        X, Y = data
        Y = np.asarray(Y, dtype=np.float64)
        if Y.ndim != 2 or Y.shape[1] != 3:
            msg = f"Y must be (N, 3) = [value, variance, n_samples], got {Y.shape}"
            raise ValueError(msg)
        f_mean, f_var = self.predict_f(X)
        noise_mean, noise_var = self.predict_noise(X)
        return self.likelihood.predict_log_density(
            jnp.concatenate([f_mean, noise_mean], axis=1),
            jnp.concatenate([f_var, noise_var], axis=1),
            np.stack([Y[:, 0], Y[:, 1] * Y[:, 2]], axis=1),
        )
