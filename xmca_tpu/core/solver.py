"""The MCA/PCA solve pipeline as pure jitted functions.

Reference algorithm (xmca/array.py:509-603): per-field PCA pre-step
``X = K L M^H``, scores ``R = K L``, kernel ``R_l^H R_r / dof``, SVD of the
small kernel, spatial vectors ``V = M V_kernel``.  Here the whole chain is
one XLA graph built from Gram-matrix decompositions
(:func:`xmca_tpu.core.linalg.field_decomposition`) — every heavy op is an
MXU matmul; the only dense factorizations run on ``min(n_obs, n_space)``-
sized matrices.

Specialized entry points avoid wasted work in Monte-Carlo ensembles:
``solve_svals`` never forms the spatial vectors (Rule N unrotated) and
``solve_truncated`` only materializes the leading ``n_modes`` columns
(rotated ensembles need just ``n_rot`` modes).
"""
from functools import partial

import jax
import jax.numpy as jnp

from xmca_tpu.core.linalg import field_decomposition, kernel_svd
from xmca_tpu.core.rotation import promax


_HI = jax.lax.Precision.HIGHEST


def _kernel(Kl, Ll, Kr, Lr, dof):
    """Cross-covariance kernel in score space: ``(K_l L_l)^H (K_r L_r)/dof``.

    True-precision accumulation — the kernel feeds the SVD whose values are
    the user-facing result; TPU default matmul precision (bf16 passes)
    would cost ~1e-3 relative there.
    """
    cross = jnp.matmul(Kl.conj().T, Kr, precision=_HI)
    return (Ll[:, None] * cross * Lr[None, :]) / dof


@partial(jax.jit, static_argnames=('method',))
def solve_mca(Xl, Xr, method='gram'):
    """Bivariate MCA of centered fields ``Xl (n, p_l)``, ``Xr (n, p_r)``.

    Returns (singular_values (r,), V_left (p_l, r), V_right (p_r, r)) with
    ``r = min(min(n, p_l), min(n, p_r))``, descending.
    """
    dof = Xl.shape[0] - 1
    Kl, Ll, Ml = field_decomposition(Xl, method)
    Kr, Lr, Mr = field_decomposition(Xr, method)
    kernel = _kernel(Kl, Ll, Kr, Lr, dof)
    Uk, s, Vkh = kernel_svd(kernel)
    V_left = jnp.matmul(Ml, Uk, precision=_HI)
    V_right = jnp.matmul(Mr, Vkh.conj().T, precision=_HI)
    return s, V_left, V_right


@partial(jax.jit, static_argnames=('method',))
def solve_pca(X, method='gram'):
    """Univariate PCA path (reference uses left field twice,
    xmca/array.py:559): returns (singular_values, V)."""
    dof = X.shape[0] - 1
    K, L, M = field_decomposition(X, method)
    kernel = _kernel(K, L, K, L, dof)
    Uk, s, _ = kernel_svd(kernel)
    V = jnp.matmul(M, Uk, precision=_HI)
    return s, V


def solve(fields, method='gram'):
    """Dispatch on the number of fields; returns (svals, [V_k per field])."""
    if len(fields) == 1:
        s, V = solve_pca(fields[0], method=method)
        return s, [V]
    s, Vl, Vr = solve_mca(fields[0], fields[1], method=method)
    return s, [Vl, Vr]


@partial(jax.jit, static_argnames=('method',))
def solve_svals(Xl, Xr=None, method='gram'):
    """Singular-value spectrum only — no spatial vectors.

    The cheap path for unrotated Rule-N ensembles: two Gram eigh's plus one
    small SVD; the ``(p, r)`` back-projection matmuls are skipped entirely.
    """
    dof = Xl.shape[0] - 1
    Kl, Ll, _ = field_decomposition(Xl, method)
    if Xr is None:
        Kr, Lr = Kl, Ll
    else:
        Kr, Lr, _ = field_decomposition(Xr, method)
    kernel = _kernel(Kl, Ll, Kr, Lr, dof)
    return kernel_svd(kernel, compute_uv=False)


@partial(jax.jit, static_argnames=('n_modes', 'method'))
def solve_truncated(Xl, Xr=None, n_modes=None, method='gram'):
    """Solve keeping only the leading ``n_modes`` spatial vectors."""
    dof = Xl.shape[0] - 1
    Kl, Ll, Ml = field_decomposition(Xl, method)
    if Xr is None:
        Kr, Lr, Mr = Kl, Ll, Ml
    else:
        Kr, Lr, Mr = field_decomposition(Xr, method)
    kernel = _kernel(Kl, Ll, Kr, Lr, dof)
    Uk, s, Vkh = kernel_svd(kernel)
    V_left = jnp.matmul(Ml, Uk[:, :n_modes], precision=_HI)
    V_right = jnp.matmul(Mr, Vkh.conj().T[:, :n_modes], precision=_HI)
    return s[:n_modes], V_left, V_right


@partial(jax.jit, static_argnames=('n_rot', 'power', 'method', 'bivariate'))
def solve_rotated_variance(Xl, Xr=None, n_rot=10, power=1, tol=1e-8,
                           method='gram', bivariate=True):
    """Variance spectrum of a rotated solution, for vmapped ensembles.

    Reproduces ``MCA.solve`` + ``MCA.rotate`` + ``_get_variance()``
    (xmca/array.py:781-844,772-779) but returns a ``converged`` flag instead
    of raising, so non-converged surrogate rotations can be masked the way
    the reference skips them (xmca/array.py:1759-1763).
    """
    s, Vl, Vr = solve_truncated(Xl, Xr, n_modes=n_rot, method=method)
    n_vars_left = Vl.shape[0]
    sqrt_s = jnp.sqrt(s).astype(Vl.dtype)
    if bivariate:
        L = jnp.concatenate([Vl, Vr], axis=0) * sqrt_s[None, :]
    else:
        # PCA: the loading stack holds only the single field's vectors
        # (reference: concat over V.values(), xmca/array.py:821)
        L = Vl * sqrt_s[None, :]
    L_rot, R, phi, converged, _ = promax(L, power=power, tol=tol)
    norm_left = jnp.linalg.norm(L_rot[:n_vars_left, :], axis=0)
    if bivariate:
        norm_right = jnp.linalg.norm(L_rot[n_vars_left:, :], axis=0)
        variance = norm_left * norm_right
    else:
        variance = norm_left ** 2
    variance = jnp.sort(variance)[::-1]
    return variance, converged
