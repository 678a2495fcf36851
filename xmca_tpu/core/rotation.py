"""Varimax / Promax rotation as jit-able fixed-point iterations.

Re-derivation of the reference's rotation module (xmca/tools/rotation.py)
for XLA: the data-dependent ``for``-loop with early ``break`` becomes a
``lax.while_loop``; non-convergence is reported through a boolean flag
instead of a Python ``RuntimeError`` so the whole rotation can live inside
``vmap``-ped Monte-Carlo ensembles (the reference *skips* non-converged
surrogate runs at xmca/array.py:1759-1763 — with a flag we can mask instead).

Math parity notes (vs xmca/tools/rotation.py:15-149):
* Kaiser row-normalization before the iteration, de-normalization after.
* Criterion matrix ``A^H (B^2 conj(B) - gamma/n * B diag(colsum |B|^2))``
  with the update ``R <- unitary-polar-factor(criterion)`` and convergence
  on the relative change of the nuclear norm — identical to the SVD-based
  update ``R = U V^H``, ``d = sum(s)``.
* Complex-safe throughout (conjugates, not transposes).
* Promax: varimax, Kaiser pre-normalization by communalities, column
  max-normalization, Procrustes target ``Xn |Xn|^(p-1)``, regression fit,
  rescale by ``sqrt(diag(inv(L^H L)))``, correlation ``phi``.
"""
from functools import partial

import jax
import jax.numpy as jnp

from xmca_tpu.core.linalg import unitary_polar_factor


def _auto_polar_method():
    """'svd' is exact and fast on CPU; on TPU a small dense SVD inside a
    ``while_loop`` dispatches an iterative QDWH solve per rotation step
    (pathologically slow) — a Newton-Schulz matmul polar is the right
    primitive there.  The default is the convergence-GATED variant:
    real loading stacks can have a large mode-variance spread, where a
    fixed-count NS under-converges and collapses trailing modes of the
    rotation (tests/unit/test_core.py).  Noise-surrogate ensembles pass
    the fixed-count 'ns' explicitly (their criteria are always
    well-conditioned, and the unrolled body batches ~2x faster)."""
    return 'svd' if jax.default_backend() == 'cpu' else 'ns-gated'


def _dot_for(precision):
    """Matmul at the requested precision tier.

    ``'highest'`` forces true-f32 accumulation — on TPU the default f32
    matmul runs in bf16 passes (~1e-3 relative), and the varimax fixed
    point integrates that noise across its ~50 iterations: measured
    2.8e-2 relative drift of the rotated variance on the reference
    fixtures at default precision vs 2e-3 at HIGHEST (the remaining
    2e-3 is the NS-vs-SVD polar difference, scripts/tpu_checks.py).
    The criterion contraction is (p, k) x (k, k)-thin, so HIGHEST costs
    nothing measurable on the public rotate; Monte-Carlo ensembles keep
    the default tier (their quantiles cannot resolve the difference).
    """
    if precision == 'highest':
        hi = jax.lax.Precision.HIGHEST
        return lambda a, b: jnp.matmul(a, b, precision=hi)
    return jnp.matmul


def ensemble_space(n, p, itemsize):
    """Shape gate for opting a MONTE-CARLO ensemble into 'mode' space.

    'mode' runs every iteration on k-space tensors after a one-time
    fourth-moment contraction (see :func:`varimax`); it pays
    ``n * p^4`` build MACs plus an ``(n, p^2)`` intermediate, and wins
    when the loading stack is tall (each data-space iteration re-reads
    the whole (n, p) stack ~3x) and the mode count is small.  The
    gates: the intermediate must stay under ~512 MB and the build must
    amortize within a typical iteration count (n >= 32 p^2 puts the
    build at <= ~p^2/32 data-iterations' worth of traffic).

    Only the generated-null surrogate pipelines consult this gate.
    'mode' is NOT the general default because at f32 the quartic-tensor
    contraction adds ~1e-3-relative iterate noise (measured: 1e-6
    input perturbations reach the rotated loadings at 1.7e-3 via
    'mode' vs 2.7e-6 via 'data') — harmless under a null quantile's
    ~6% Monte-Carlo noise, but it breaks run-for-run reproducibility
    contracts (save->load replays, streamed==resident bootstrap
    equality) that hold to ~1e-5 in data space."""
    return ('mode'
            if p <= 32 and n >= 32 * p * p
            and n * p * p * itemsize <= 512 * 1024 ** 2
            else 'data')


@partial(jax.jit,
         static_argnames=('max_iter', 'polar_method', 'precision',
                          'space'))
def varimax(A, gamma=1.0, max_iter=1000, tol=1e-8, polar_method=None,
            precision='default', space=None):
    """Orthogonal Varimax rotation with Kaiser normalization.

    Parameters mirror the reference (xmca/tools/rotation.py:15); `gamma=1`
    is varimax, `gamma=0` quartimax.  ``polar_method`` defaults per
    backend (see ``_auto_polar_method``); ``precision`` picks the
    matmul tier (see ``_dot_for``).

    ``space`` picks where the fixed point iterates (default 'data';
    Monte-Carlo ensembles opt into 'mode' via :func:`ensemble_space`):

    * ``'data'`` — the textbook iteration: every step forms
      ``basis = An R`` and contracts the elementwise-cubic criterion
      against the full ``(n, p)`` loading stack (memory-bound at tall
      stacks: ~3 passes over the stack per step, and surrogate
      iteration counts are heavy-tailed, 2..530).
    * ``'mode'`` — EXACT algebraic rewrite: every iterate lives in the
      span of the fixed Kaiser-normalized stack, so the criterion is a
      cubic form in ``R`` contracted against the one-time fourth-moment
      tensor ``T[(a,d),(b,c)] = sum_v conj(An_va An_vd) An_vb An_vc``
      (one Gram of the ``(n, p^2)`` column-pair products) and the
      Gram ``G2 = An^H An``:
      ``crit = reshape(T @ (R_bm R_cm), (p,p,p)) . conj(R)  -
      gamma/n * (G2 R) diag(col_ss)`` with
      ``col_ss = diag(R^H G2 R)``.  Each step is p-independent
      (~p^5 MACs, k=10 -> 1e5) instead of a ~3x pass over the stack —
      the identity that moves the whole while_loop off the HBM-bound
      path.  No approximation: same criterion matrix, same polar, same
      convergence scalar, to roundoff — but at f32 that roundoff is
      ~1e-3-relative on the rotated loadings (the quartic contraction
      cancels harder than the data-space sum), so 'mode' is reserved
      for Monte-Carlo ensembles whose statistics cannot resolve it.

    Returns
    -------
    B : rotated loadings, same shape as ``A`` (rows: variables, cols: modes)
    R : (p, p) rotation matrix
    converged : bool scalar — reference raises RuntimeError when False
    n_iter : number of iterations executed
    """
    if polar_method is None:
        polar_method = _auto_polar_method()
    dot = _dot_for(precision)
    n, p = A.shape
    dtype = A.dtype
    if space is None:
        space = 'data'
    # the relative nuclear-norm change cannot resolve below the compute
    # dtype's roundoff floor (the criterion matrix mixes columns with large
    # dynamic range); clamp so f32 runs terminate at their achievable
    # accuracy (~1e-5) while f64 keeps the caller's tolerance
    real_dtype = jnp.finfo(dtype).dtype
    eps = float(jnp.finfo(dtype).eps)
    tol = jnp.maximum(jnp.asarray(tol), 100.0 * eps)

    # Kaiser normalization: scale rows to unit communality
    h = jnp.sqrt(jnp.sum((A * A.conj()).real, axis=1))
    An = A * (1.0 / h)[:, None].astype(dtype)

    gamma_n = jnp.asarray(gamma / n, dtype=real_dtype)

    if space == 'mode':
        G2 = dot(An.conj().T, An)
        Q = (An[:, :, None] * An[:, None, :]).reshape(n, p * p)
        T = dot(Q.conj().T, Q)

        def body(state):
            i, R, d, _ = state
            V = dot(G2, R)
            col_ss = jnp.sum((R.conj() * V).real, axis=0)
            W = (R[:, None, :] * R[None, :, :]).reshape(p * p, p)
            Y = dot(T, W).reshape(p, p, p)
            crit1 = jnp.sum(Y * R.conj()[None, :, :], axis=1)
            criterion = crit1 - gamma_n * (V * col_ss[None, :])
            R_new, d_new = unitary_polar_factor(
                criterion, method=polar_method, dot=dot
            )
            return i + 1, R_new, d_new, d
    else:
        def body(state):
            i, R, d, _ = state
            basis = dot(An, R)
            col_ss = jnp.sum((basis * basis.conj()).real, axis=0)
            criterion = dot(An.conj().T, (
                basis ** 2 * basis.conj()
                - gamma_n * (basis * col_ss[None, :])
            ))
            R_new, d_new = unitary_polar_factor(
                criterion, method=polar_method, dot=dot
            )
            return i + 1, R_new, d_new, d

    def cond(state):
        i, _, d, d_old = state
        keep = jnp.abs(d - d_old) / jnp.where(d == 0, 1.0, d) >= tol
        return jnp.logical_and(i < max_iter, jnp.logical_or(i == 0, keep))

    R0 = jnp.eye(p, dtype=dtype)
    zero = jnp.zeros((), real_dtype)
    i, R, d, d_old = jax.lax.while_loop(cond, body, (0, R0, zero, zero))

    converged = jnp.abs(d - d_old) / jnp.where(d == 0, 1.0, d) < tol
    # de-normalize (A == h * An) and rotate
    B = dot(A, R)
    return B, R, converged, i


@partial(jax.jit,
         static_argnames=('power', 'max_iter', 'polar_method',
                          'precision', 'space'))
def promax1(A, power=1, max_iter=1000, tol=1e-8, polar_method=None,
            precision='default', space=None):
    """:func:`promax` compiled through a 1-element ``vmap``.

    XLA's batched lowering of the varimax fixed point produces a ~2x
    faster loop body on TPU than the unbatched lowering of the same
    function (measured in benchmarks/RESULTS.md) — the public
    ``MCA.rotate`` and the Monte-Carlo ensembles both ride it.
    """
    out = jax.vmap(
        lambda L: promax(L, power=power, max_iter=max_iter, tol=tol,
                         polar_method=polar_method, precision=precision,
                         space=space)
    )(A[None])
    return jax.tree_util.tree_map(lambda x: x[0], out)


@partial(jax.jit,
         static_argnames=('power', 'max_iter', 'polar_method',
                          'precision', 'space'))
def promax(A, power=1, max_iter=1000, tol=1e-8, polar_method=None,
           precision='default', space=None):
    """Oblique Promax rotation (power=1 reduces to Varimax).

    Returns (B, R, phi, converged, n_iter); the reference's signature plus
    the convergence flag (xmca/tools/rotation.py:84-149).
    """
    n, p = A.shape
    dtype = A.dtype
    dot = _dot_for(precision)

    X, R, converged, n_iter = varimax(
        A, max_iter=max_iter, tol=tol, polar_method=polar_method,
        precision=precision, space=space,
    )
    if power == 1:
        # Varimax: orthogonal rotation, PCs stay uncorrelated
        phi = jnp.eye(p, dtype=dtype)
        return X, R, phi, converged, n_iter

    # Kaiser pre-normalization by communalities
    h = jnp.sqrt(jnp.sum((X * X.conj()).real, axis=1))
    Xn_rows = X * (1.0 / h)[:, None].astype(dtype)

    # column max-normalization
    Xn = Xn_rows / jnp.max(jnp.abs(Xn_rows), axis=0)[None, :]

    # Procrustes target (Richman 1986)
    P = Xn * jnp.abs(Xn) ** (power - 1)

    # least-squares fit L = (X^H X)^-1 X^H P
    G = dot(Xn_rows.conj().T, Xn_rows)
    L = jnp.linalg.solve(G, dot(Xn_rows.conj().T, P))

    # rescale columns by sqrt(diag(inv(L^H L)))
    sigma_inv = jnp.diag(jnp.diag(jnp.linalg.pinv(dot(L.conj().T, L))))
    L = dot(L, jnp.sqrt(sigma_inv.astype(dtype)))

    B = dot(Xn_rows, L)
    B = h[:, None].astype(dtype) * B          # Kaiser de-normalization
    R = dot(R, L)

    L_inv = jnp.linalg.inv(L)
    phi = dot(L_inv, L_inv.conj().T)
    return B, R, phi, converged, n_iter
