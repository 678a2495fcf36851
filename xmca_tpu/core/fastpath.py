"""Matmul-only fast path for solves and Monte-Carlo ensembles on TPU.

Motivation: XLA's dense ``eigh``/``svd`` at n ~ 2000 cost O(seconds) on a
TPU core (iterative QDWH-based algorithms), which would dominate surrogate
ensembles.  This module reformulates the MCA spectrum so that everything is
MXU matmuls, Cholesky factorizations and tiny (k x k) factorizations:

**Key identity** (derivation + numerical check in tests/unit/test_fastpath):
for centered fields ``A (n, p_l)``, ``B (n, p_r)`` with ``n <= p``, the
singular values of the cross-covariance ``A^H B`` equal the singular values
of ``La^H Lb`` where ``La = chol(A A^H)``, ``Lb = chol(B B^H)`` are
Cholesky factors of the *temporal* Gram matrices.  Proof sketch: write the
thin QR ``A^H = Q_a R_a``; then ``A^H B = Q_a (R_a R_b^H) Q_b^H`` and
``R_a^H R_a = A A^H``, so any factor with that Gram (e.g. ``La^H``) differs
from ``R_a`` by a left-unitary and leaves singular values unchanged.

On top of the n x n reduced kernel ``M = La^H Lb / dof``:

* ``subspace_svd`` extracts the leading k singular triplets by blocked
  subspace (power) iteration — matmuls + thin QR + one k x k eigh;
* ``nuclear_norm`` computes ``sum(svals)`` via the Newton-Schulz polar
  iteration (pure matmuls) for the Rule-N rescaling of full spectra;
* spatial singular vectors are recovered as ``V_l = A^H (La^-H U)``
  (triangular solve + one tall matmul), which is what rotation needs.

Since centered data has a rank-deficient temporal Gram (the mean direction
is null), a relative jitter ``~1e-6 * mean(diag)`` keeps Cholesky positive
definite; the induced spectral error is of the same relative order — far
below Monte-Carlo sampling noise, and the exact path remains the default
for direct solves.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from xmca_tpu.core.linalg import (ns_polar_apply,
                                  ns_polar_iterate_scaled,
                                  ns_polar_schedule)

# Gram/kernel contractions feed Cholesky and Ritz extraction; on TPU the
# default f32 matmul runs in bf16 passes (~1e-4 relative error), which is
# larger than the rank-deficiency jitter.  Force true-f32 accumulation for
# the small accuracy-critical contractions (n x n work — cheap); the big
# (p-sized) back-projections stay at default precision.
_HI = jax.lax.Precision.HIGHEST


def _dot_hi(a, b):
    return jnp.matmul(a, b, precision=_HI)


def _dot_high(a, b):
    # 3-pass bf16 (~f32 accuracy, half the MXU cost of HIGHEST's 6
    # passes) — the mixed-precision nuclear norm's bulk tier.
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGH)


def _data_dot(a, b):
    """Contraction over the big data axis, dtype-aware.

    bfloat16 operands use the MXU's native single-pass mode with float32
    accumulation (full speed; input quantization ~0.4%/element averages to
    ~1e-5 relative on Gram entries — the surrogate-ensemble setting).
    float32/float64 operands keep true-precision accumulation.
    """
    if a.dtype == jnp.bfloat16 or b.dtype == jnp.bfloat16:
        return jax.lax.dot_general(
            a, b, (((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return jnp.matmul(a, b, precision=_HI)


def _materialize_gram_operand(X):
    """Pin a Gram operand to ONE materialization of its producer.

    ``G = X @ X.T`` is only exactly symmetric (hence PSD up to
    accumulation roundoff) when both dot operands are the SAME array.
    When ``X`` is itself a fused computation (surrogate draw +
    centering, bfloat16), XLA may duplicate that producer into each
    operand's fusion with different intermediate precision — the two
    copies then disagree by an input ULP, the "Gram" becomes visibly
    asymmetric (measured 1e-1 absolute at (492, 155) bf16 on CPU,
    vs 1e-4 eager), and its spectrum goes indefinite far beyond the
    ``_jitter`` floor, so Cholesky returns NaN and whole Monte-Carlo
    ensembles are masked as non-converged.  An optimization barrier
    forces a single shared materialization; the array is ~(n, p) and
    already resident in the production path, so this costs nothing.
    """
    return jax.lax.optimization_barrier(X)


def _jitter(G, p, jitter_rel, input_eps=None):
    """Add the rank-deficiency jitter to a (possibly complex) Gram.

    ``input_eps``: machine epsilon of the DATA dtype the Gram was
    accumulated from.  bfloat16 operands reach the MXU/batched-dot with
    ~2^-8 quantization, and the accumulation order of batched dots is not
    the unbatched order — measured negative eigenvalues of the (exactly
    PSD in real arithmetic) Gram reach ~1e-3 of the mean diagonal under
    ``vmap``, far above the f32 floors.  The 0.5*eps_input*d floor keeps
    Cholesky positive definite with ~5x margin while perturbing null
    spectra by ~1e-3 relative — far below Monte-Carlo sampling noise.
    """
    d = jnp.mean(jnp.real(jnp.diagonal(G)))
    n = G.shape[0]
    # host-side dtype probe: finfo of a complex dtype reports its real
    # component type — never dispatch a device op just to learn a dtype
    # (eager 0-d complex ops fail to compile on the axon TPU backend)
    eps = float(jnp.finfo(G.dtype).eps)
    rel_floor = max(jitter_rel, 8.0 * eps * float(np.sqrt(p)))
    if input_eps is not None:
        rel_floor = max(rel_floor, 0.5 * float(input_eps))
    delta = jnp.maximum(
        rel_floor * d,
        (50.0 * eps) * jnp.linalg.norm(G).real,
    )
    return G + delta * jnp.eye(n, dtype=G.dtype)


def hilbert_imag_matrix(n, dtype=np.float32):
    """The real n x n matrix H with ``analytic(x) = x + i H x``.

    The discrete analytic-signal transform is linear in the (fixed-length)
    time axis: ``A = F^-1 diag(h) F`` with the scipy.signal.hilbert
    weights.  For real input its imaginary part is the real Hilbert
    operator H.  Materializing H turns the per-surrogate FFT (slow on TPU
    for mixed-radix lengths) into MXU matmuls, and more importantly lets
    the complexified temporal Gram be assembled from the *real* data Gram:
    ``G_Z = A G_X A^H = (G + H G H^T) + i (H G - G H^T)`` — the complex
    field is never materialized at all.

    Built once per length on host with float64 FFTs, cached.
    """
    key = (int(n), np.dtype(dtype).str)
    if key not in _HILBERT_CACHE:
        from xmca_tpu.core.preprocess import _analytic_weights
        h = _analytic_weights(int(n), np.float64)
        F = np.fft.fft(np.eye(int(n)), axis=0)
        A = np.fft.ifft(h[:, None] * F, axis=0)
        _HILBERT_CACHE[key] = np.ascontiguousarray(
            A.imag.astype(dtype)
        )
    return _HILBERT_CACHE[key]


_HILBERT_CACHE = {}
_HILBERT_DEVICE_CACHE = {}


def hilbert_imag_matrix_device(n, dtype=np.float32):
    """Device-resident :func:`hilbert_imag_matrix`, cached per
    (length, dtype, backend).

    Every consumer (main solve, complexify, ensembles, streaming) must
    share ONE device buffer: re-uploading H costs an n^2-float host
    transfer per call (~0.35 s for n=2000 on a tunneled TPU link) and
    would change the argument identity seen by cached jitted pipelines.
    """
    key = (int(n), np.dtype(dtype).str, jax.default_backend())
    if key not in _HILBERT_DEVICE_CACHE:
        while len(_HILBERT_DEVICE_CACHE) >= 8:
            _HILBERT_DEVICE_CACHE.pop(next(iter(_HILBERT_DEVICE_CACHE)))
        _HILBERT_DEVICE_CACHE[key] = jnp.asarray(
            hilbert_imag_matrix(int(n), dtype)
        )
    return _HILBERT_DEVICE_CACHE[key]


def _analytic_fold(G, H, dot=_dot_hi):
    """Complexified temporal Gram from the real Gram (no data-sized op).

    ``G_Z = (G + H G H^T) + i (H G - G H^T)`` — three n x n matmuls.
    ``dot`` selects the contraction precision: parity-grade callers
    keep the HIGHEST default; surrogate ensembles may pass a
    single-pass bf16 dot (the ~1e-3 relative error is absorbed by a
    matching jitter floor and sits far below Monte-Carlo noise).
    """
    HG = dot(H, G)
    HGHt = dot(HG, H.T)
    real = G + HGHt
    imag = HG - HG.T          # H G - G H^T == HG - (HG)^T for symmetric G
    return real + 1j * imag


def analytic_temporal_gram(X, H, jitter_rel=1e-6):
    """Jittered temporal Gram of ``analytic(X)`` from real ``X`` directly.

    One big real MXU Gram plus the :func:`_analytic_fold` n x n algebra —
    ~4x cheaper than a complex Gram and no FFT.  ``X`` may be bfloat16
    (surrogate ensembles); the Gram always accumulates in float32.
    """
    X = _materialize_gram_operand(X)
    G = _data_dot(X, X.T)
    GZ = _analytic_fold(G, H)
    return _jitter(GZ.astype(_complex_dtype(X.dtype)), X.shape[1],
                   jitter_rel, input_eps=jnp.finfo(X.dtype).eps)


def _complex_dtype(real_dtype):
    return jnp.result_type(real_dtype, jnp.complex64)


def analytic_reduced_kernel(Xl, Xr, H, jitter_rel=1e-6):
    """Chol-reduced kernel of the complexified fields from real data."""
    dof = Xl.shape[0] - 1
    La = jnp.linalg.cholesky(analytic_temporal_gram(Xl, H, jitter_rel))
    Lb = jnp.linalg.cholesky(analytic_temporal_gram(Xr, H, jitter_rel))
    M = _dot_hi(La.conj().T, Lb) / dof
    return M, La, Lb


def analytic_projection_stack(T, H):
    """Real (n, 2k) stack of the analytic recovery weights.

    ``V = Z^H T`` for ``Z = (I + iH) X`` reduces to
    ``X^T (T - i H^T T)``; stacking real and imaginary parts side by
    side lets any consumer (in-memory, streamed, or regenerated fields)
    run ONE real projection and recombine with
    :func:`combine_analytic_projection` — the single definition all
    complexified back-projections share.
    """
    S = T - 1j * (H.T @ T)
    return jnp.concatenate([jnp.real(S), jnp.imag(S)], axis=1)


def combine_analytic_projection(P):
    """Inverse of the :func:`analytic_projection_stack` split."""
    k = P.shape[1] // 2
    return P[:, :k] + 1j * P[:, k:]


def _analytic_spatial_vectors(X, H, T):
    """``V = Z^H T`` for ``Z = (I + iH) X`` without materializing Z."""
    S = analytic_projection_stack(T, H)
    return combine_analytic_projection(_data_dot(X.T, S))


@partial(jax.jit,
         static_argnames=('n_rot', 'power', 'n_iter', 'bivariate',
                          'polar_method'))
def fast_rotated_variance_analytic(Xl, Xr, H, key, n_rot, power=1,
                                   tol=1e-8, n_iter=8, jitter_rel=1e-6,
                                   bivariate=True, polar_method='ns'):
    """Complex rotated variance spectrum from *real* centered fields.

    The full complex-rotated Rule-N surrogate pipeline with the analytic
    signal folded into the Gram algebra: per surrogate, the only
    data-sized op is one real MXU Gram per field (plus a thin tall matmul
    for the loadings) — no FFT, no complex Gram.
    """
    from xmca_tpu.core.rotation import ensemble_space, promax

    if Xr is None or not bivariate:
        Xr = Xl
    M, La, Lb = analytic_reduced_kernel(Xl, Xr, H, jitter_rel)
    U, s, V = subspace_svd(M, key, k=n_rot, n_iter=n_iter)
    Tl = jax.scipy.linalg.solve_triangular(La.conj().T, U, lower=False)
    Vl = _analytic_spatial_vectors(Xl, H, Tl)
    sqrt_s = jnp.sqrt(s).astype(Vl.dtype)
    if bivariate:
        Tr = jax.scipy.linalg.solve_triangular(
            Lb.conj().T, V, lower=False
        )
        Vr = _analytic_spatial_vectors(Xr, H, Tr)
        L = jnp.concatenate([Vl, Vr], axis=0) * sqrt_s[None, :]
    else:
        L = Vl * sqrt_s[None, :]
    n_vars_left = Vl.shape[0]
    L_rot, R, phi, converged, _ = promax(
        L, power=power, tol=tol, polar_method=polar_method
    )
    norm_left = jnp.linalg.norm(L_rot[:n_vars_left, :], axis=0)
    if bivariate:
        norm_right = jnp.linalg.norm(L_rot[n_vars_left:, :], axis=0)
        variance = norm_left * norm_right
    else:
        variance = norm_left ** 2
    variance = jnp.sort(variance)[::-1]
    converged = jnp.logical_and(converged, jnp.isfinite(variance).all())
    return variance, converged


@partial(jax.jit, static_argnames=('n_rot', 'n_iter', 'bivariate'))
def fast_rotated_loadings_analytic(Xl, Xr, H, key, n_rot, n_iter=8,
                                   jitter_rel=1e-6, bivariate=True):
    """Stage-A of the two-stage rotated ensemble: loadings only.

    Returns the sqrt-eigenvalue-scaled loading stack ``L`` (p_l+p_r, n_rot)
    ready for rotation.  Splitting the pipeline here lets callers batch the
    data-heavy Gram stage by memory and the latency-bound varimax
    ``while_loop`` across the *entire* ensemble at once (one slow run no
    longer stalls its small batch) — see bench.py.
    """
    if Xr is None or not bivariate:
        Xr = Xl
    M, La, Lb = analytic_reduced_kernel(Xl, Xr, H, jitter_rel)
    U, s, V = subspace_svd(M, key, k=n_rot, n_iter=n_iter)
    Tl = jax.scipy.linalg.solve_triangular(La.conj().T, U, lower=False)
    Vl = _analytic_spatial_vectors(Xl, H, Tl)
    sqrt_s = jnp.sqrt(s).astype(Vl.dtype)
    if bivariate:
        Tr = jax.scipy.linalg.solve_triangular(
            Lb.conj().T, V, lower=False
        )
        Vr = _analytic_spatial_vectors(Xr, H, Tr)
        L = jnp.concatenate([Vl, Vr], axis=0) * sqrt_s[None, :]
    else:
        L = Vl * sqrt_s[None, :]
    return L


@partial(jax.jit, static_argnames=('n_rot', 'n_iter', 'bivariate'))
def fast_rotated_loadings(Xl, Xr, key, n_rot, n_iter=8, jitter_rel=1e-6,
                          bivariate=True):
    """Stage-A of the two-stage REAL rotated ensemble: loadings only.

    Real-field counterpart of :func:`fast_rotated_loadings_analytic` —
    Cholesky-reduced kernel, subspace SVD, spatial back-projection,
    sqrt-eigenvalue scaling; rotation happens in stage B
    (:func:`rotated_variance_from_loadings`), batched across the whole
    ensemble.
    """
    if Xr is None or not bivariate:
        Xr = Xl
    M, La, Lb = reduced_kernel(Xl, Xr, jitter_rel)
    U, s, V = subspace_svd(M, key, k=n_rot, n_iter=n_iter)
    Zl = jax.scipy.linalg.solve_triangular(La.conj().T, U, lower=False)
    Vl = Xl.conj().T @ Zl
    sqrt_s = jnp.sqrt(s).astype(Vl.dtype)
    if bivariate:
        Zr = jax.scipy.linalg.solve_triangular(
            Lb.conj().T, V, lower=False
        )
        Vr = Xr.conj().T @ Zr
        L = jnp.concatenate([Vl, Vr], axis=0) * sqrt_s[None, :]
    else:
        L = Vl * sqrt_s[None, :]
    return L


@partial(jax.jit, static_argnames=('n_vars_left', 'power', 'bivariate',
                                   'polar_method'))
def rotated_variance_from_loadings(L, n_vars_left, power=1, tol=1e-8,
                                   bivariate=True, polar_method='ns'):
    """Stage-B: rotate a loading stack and return the variance spectrum."""
    from xmca_tpu.core.rotation import ensemble_space, promax
    L_rot, R, phi, converged, _ = promax(
        L, power=power, tol=tol, polar_method=polar_method
    )
    norm_left = jnp.linalg.norm(L_rot[:n_vars_left, :], axis=0)
    if bivariate:
        norm_right = jnp.linalg.norm(L_rot[n_vars_left:, :], axis=0)
        variance = norm_left * norm_right
    else:
        variance = norm_left ** 2
    variance = jnp.sort(variance)[::-1]
    converged = jnp.logical_and(converged, jnp.isfinite(variance).all())
    return variance, converged


@partial(jax.jit, static_argnames=('k', 'n_iter', 'with_nuclear'))
def fast_spectrum_analytic(Xl, Xr, H, key, k, n_iter=8,
                           with_nuclear=True, jitter_rel=1e-6):
    """Top-k complexified kernel spectrum from real fields (no FFT)."""
    M, _, _ = analytic_reduced_kernel(Xl, Xr, H, jitter_rel)
    _, s, _ = subspace_svd(M, key, k=k, n_iter=n_iter)
    if with_nuclear:
        return s, nuclear_norm_surrogate(M)
    return s, jnp.sum(s)


def temporal_gram(X, jitter_rel=1e-6):
    """Jittered temporal Gram ``X X^H + eps I`` (one MXU matmul).

    The jitter must exceed the Gram's accumulated roundoff so Cholesky
    survives rank deficiency (centered data always has the mean direction
    null; Hilbert-complexified data has only ~n/2 nonzero temporal modes —
    half the spectrum is exactly zero).  Roundoff of a length-p f32
    accumulation scales like ``eps * sqrt(p)`` relative to the diagonal,
    so the effective jitter is ``max(jitter_rel, 8 eps sqrt(p))``.
    """
    # dtype-aware contraction: bfloat16 data accumulates into float32
    # (the Gram feeds Cholesky, which has no low-precision kernel)
    X = _materialize_gram_operand(X)
    G = _data_dot(X, X.conj().T)
    return _jitter(G, X.shape[1], jitter_rel,
                   input_eps=jnp.finfo(X.dtype).eps)


def reduced_kernel(Xl, Xr, jitter_rel=1e-6):
    """n x n matrix with the same singular values as ``X_l^H X_r / dof``.

    Returns (M, La, Lb) — the chol factors are reused for recovering
    spatial vectors.
    """
    dof = Xl.shape[0] - 1
    La = jnp.linalg.cholesky(temporal_gram(Xl, jitter_rel))
    Lb = jnp.linalg.cholesky(temporal_gram(Xr, jitter_rel))
    M = _dot_hi(La.conj().T, Lb) / dof
    return M, La, Lb


def _orthonormalize(Y, method):
    """Orthonormal basis of the thin (n, kk) block ``Y``.

    ``'qr'`` — Householder QR (LAPACK-grade; CPU/f64 default).
    ``'cholqr2'`` — two rounds of Cholesky-QR: ``R = chol(Y^H Y)``,
    ``Q = Y R^-H`` (matmul + kk x kk chol + triangular solve — every op
    MXU-friendly, ~10x faster than thin QR on TPU).  One round squares
    the block's condition number; the second round restores
    orthogonality to working precision (CholQR2, Yamamoto et al. 2015).
    Subspace-iteration blocks are jitter-regularized and re-orthogonalized
    every step, so the squared condition number stays far from overflow.
    """
    if method == 'qr':
        Q, _ = jnp.linalg.qr(Y)
        return Q

    def one_round(Y):
        G = _dot_hi(Y.conj().T, Y)
        # tiny relative ridge keeps the kk x kk Cholesky positive
        # definite when the block is nearly rank-deficient
        d = jnp.mean(jnp.real(jnp.diagonal(G)))
        eps = float(jnp.finfo(G.dtype).eps)
        G = G + (8.0 * eps) * d * jnp.eye(G.shape[0], dtype=G.dtype)
        R = jnp.linalg.cholesky(G)
        # invert the tiny kk x kk triangle and apply it as a tall MXU
        # matmul (a triangular solve against the wide block would run
        # substitution-serial on TPU)
        Rinv = jax.scipy.linalg.solve_triangular(
            R, jnp.eye(R.shape[0], dtype=R.dtype), lower=True
        )
        return _dot_hi(Y, Rinv.conj().T)

    return one_round(one_round(Y))


@partial(jax.jit, static_argnames=('k', 'n_iter', 'oversample', 'orth'))
def subspace_svd(M, key, k, n_iter=8, oversample=16, orth=None):
    """Leading-k singular triplets of square ``M`` by subspace iteration.

    All heavy ops are matmuls; the only factorizations are the block
    orthonormalization (see :func:`_orthonormalize`; thin QR on CPU,
    CholQR2 on TPU) and one small eigh.  Oversampling absorbs the
    slowly-converging directions of clustered spectra so the returned k
    triplets stay accurate.  Returns (U (n,k), s (k,), V (m,k)).
    """
    if orth is None:
        orth = 'cholqr2' if jax.default_backend() == 'tpu' else 'qr'
    n, m = M.shape
    kk = min(k + oversample, n, m)
    real_dtype = jnp.finfo(M.dtype).dtype
    omega = jax.random.normal(key, (m, kk), dtype=real_dtype).astype(M.dtype)
    Q = _orthonormalize(_dot_hi(M, omega), orth)
    for _ in range(n_iter):
        Q = _orthonormalize(
            _dot_hi(M, _dot_hi(M.conj().T, Q)), orth
        )
    B = _dot_hi(Q.conj().T, M)               # (kk, m)
    # small eigendecomposition of B B^H gives the Ritz values/vectors
    w, W = jnp.linalg.eigh(_dot_hi(B, B.conj().T))
    w = jnp.flip(w, -1)
    W = jnp.flip(W, -1)
    s = jnp.sqrt(jnp.clip(w, 0.0))
    U = _dot_hi(Q, W)
    V = _dot_hi(
        M.conj().T, U / jnp.where(s > 0, s, 1.0)[None, :].astype(M.dtype)
    )
    return U[:, :k], s[:k], V[:, :k]


# scale schedules are host constants of (l0, tol): the parity-grade
# schedule converges sigma_min/fro = 1e-9 (the jitter-floor regime) to
# 1e-8 — the old unscaled fixed-50 iteration could not even reach O(1)
# from there (1.5^50 < 1e9); the surrogate-grade schedule stops at 1e-3
_NS_SCALES_EXACT = tuple(ns_polar_schedule(l0=1e-9, tol=1e-8))
_NS_SCALES_SURR = tuple(ns_polar_schedule(l0=1e-7, tol=1e-4))


@jax.jit
def nuclear_norm(M):
    """``sum(svals(M))`` via the SCALED Newton-Schulz polar iteration.

    ``W <- 1.5 s W - 0.5 s^3 W W^H W`` with the greedy minimax scale
    schedule (xmca_tpu.core.linalg.ns_polar_schedule) drives all
    singular values of the Frobenius-prescaled iterate to 1; the
    nuclear norm is then ``Re tr(W^H M)``.  Pure matmuls — no
    factorization at all.

    Mixed precision (round 5): the FIRST eight steps, the final two
    steps, and the trace run at HIGHEST (6-pass bf16 = f32 accuracy);
    the bulk in between runs at HIGH (3 passes, half the MXU cost).
    ``Re tr(W^H M)`` is *first-order stationary* under unitary
    perturbations of the polar factor (``tr(skew x hermitian)`` is
    purely imaginary), so per-step matmul noise enters the total only
    through (a) the radial (singular-value) deviation, which the exact
    final steps contract quadratically (``f(1+e) = 1 - 1.5 e^2``:
    1e-3 -> 1.5e-6 -> ~0), and (b) second-order unitary drift.  The
    drift is imprinted by the EARLY max-scaled steps (scale ~1.732
    repeated), where the schedule amplifies the tiny singular
    directions it is trying to rescue: an on-chip tier-layout A/B
    (scripts/ns_mix_probe.py + the front-prefix sweep) measured a
    cond-1e6 stress matrix at rel 2.3e-4 with the bulk-HIGH-everywhere
    layout, UNCHANGED by protecting the tail (back/tail6 layouts), but
    cut to 3.5e-7 by protecting the first 8 steps; a production-like
    jittered fold kernel went 8.7e-5 -> 1.2e-6.  A first attempt at
    the operator's DEFAULT tier (1-pass bf16, ~4e-3 input rounding)
    missed the spectrum sum by 1.7e-1 on a real v5e.  Cost of the
    HIGHEST prefix: +15 ms once per solve (79.7 -> 94.7 ms at
    (2048, 2048) complex).  Accuracy AND the mixing cost vs an
    all-HIGHEST iterate are asserted on-chip (scripts/tpu_checks.py).
    """
    fro = jnp.linalg.norm(M)
    W = M / jnp.where(fro == 0, 1.0, fro)
    W = ns_polar_apply(W, _NS_SCALES_EXACT[:8], dot=_dot_hi)
    W = ns_polar_apply(W, _NS_SCALES_EXACT[8:-2], dot=_dot_high)
    W = ns_polar_apply(W, _NS_SCALES_EXACT[-2:], dot=_dot_hi)
    return jnp.real(jnp.trace(_dot_hi(W.conj().T, M)))


@jax.jit
def nuclear_norm_surrogate(M):
    """Cheap nuclear norm for per-surrogate rescaling totals.

    Same scaled Newton-Schulz trace as :func:`nuclear_norm` but at the
    MXU's default f32 precision (bf16 passes, ~1e-4/step) and the
    1e-3-tolerance schedule — accuracy far below the Monte-Carlo noise
    of the null-distribution quantiles it rescales.  The analysis' own
    totals (``total_covariance`` parity) keep the HIGHEST-precision
    variant.
    """
    W = ns_polar_iterate_scaled(M, _NS_SCALES_SURR)
    return jnp.real(jnp.trace(_dot_hi(W.conj().T, M)))


@partial(jax.jit, static_argnames=('k', 'n_iter', 'with_nuclear'))
def fast_spectrum(Xl, Xr, key, k, n_iter=8, with_nuclear=True,
                  jitter_rel=1e-6):
    """Top-k singular values of the MCA kernel + (optional) exact-sum.

    The Rule-N fast path: spectra are computed to subspace-iteration
    accuracy while the *rescaling total* (sum over the full spectrum) comes
    from the Newton-Schulz nuclear norm — so the normalization matches the
    exact algorithm to ~1e-5 even though only k values are materialized.
    """
    M, _, _ = reduced_kernel(Xl, Xr, jitter_rel)
    _, s, _ = subspace_svd(M, key, k=k, n_iter=n_iter)
    if with_nuclear:
        total = nuclear_norm_surrogate(M)
        return s, total
    return s, jnp.sum(s)


@partial(jax.jit,
         static_argnames=('n_rot', 'power', 'n_iter', 'bivariate',
                          'polar_method'))
def fast_rotated_variance(Xl, Xr, key, n_rot, power=1, tol=1e-8,
                          n_iter=8, jitter_rel=1e-6, bivariate=True,
                          polar_method='ns'):
    """Rotated variance spectrum via the matmul-only pipeline.

    Mirrors :func:`xmca_tpu.core.solver.solve_rotated_variance` but with
    the chol-reduced kernel and subspace iteration: no large eigh/svd at
    all.  Spatial loadings are recovered with triangular solves:
    ``V_l = X_l^H (La^-H U)``.
    """
    from xmca_tpu.core.rotation import ensemble_space, promax

    if Xr is None:
        Xr = Xl
    M, La, Lb = reduced_kernel(Xl, Xr, jitter_rel)
    U, s, V = subspace_svd(M, key, k=n_rot, n_iter=n_iter)
    # spatial singular vectors (orthonormal up to jitter)
    Zl = jax.scipy.linalg.solve_triangular(
        La.conj().T, U, lower=False
    )
    Vl = Xl.conj().T @ Zl                     # (p_l, n_rot)
    sqrt_s = jnp.sqrt(s).astype(Vl.dtype)
    if bivariate:
        Zr = jax.scipy.linalg.solve_triangular(
            Lb.conj().T, V, lower=False
        )
        Vr = Xr.conj().T @ Zr
        L = jnp.concatenate([Vl, Vr], axis=0) * sqrt_s[None, :]
    else:
        L = Vl * sqrt_s[None, :]
    n_vars_left = Vl.shape[0]
    L_rot, R, phi, converged, _ = promax(
        L, power=power, tol=tol, polar_method=polar_method
    )
    norm_left = jnp.linalg.norm(L_rot[:n_vars_left, :], axis=0)
    if bivariate:
        norm_right = jnp.linalg.norm(L_rot[n_vars_left:, :], axis=0)
        variance = norm_left * norm_right
    else:
        variance = norm_left ** 2
    variance = jnp.sort(variance)[::-1]
    # a numerical breakdown anywhere upstream (e.g. Cholesky on a Gram
    # whose roundoff exceeded the jitter) must mask the run, not poison
    # the ensemble
    converged = jnp.logical_and(converged, jnp.isfinite(variance).all())
    return variance, converged


def _kernel_svd_recovery(M, La, Lb, key, n_modes, n_iter):
    """Shared tail of every truncated solve: subspace SVD of the reduced
    kernel + triangular recovery of the temporal weight stacks."""
    U, s, V = subspace_svd(M, key, k=n_modes, n_iter=n_iter)
    Zl = jax.scipy.linalg.solve_triangular(La.conj().T, U, lower=False)
    Zr = jax.scipy.linalg.solve_triangular(Lb.conj().T, V, lower=False)
    return s, Zl, Zr


@partial(jax.jit, static_argnames=('n_modes', 'n_iter'))
def fast_solve_truncated(Xl, Xr, key, n_modes, n_iter=8, jitter_rel=1e-6):
    """Leading-n_modes MCA solve (svals + spatial vectors), matmul-only.

    The bench-path equivalent of
    :func:`xmca_tpu.core.solver.solve_truncated` for very large fields on
    TPU.
    """
    M, La, Lb = reduced_kernel(Xl, Xr, jitter_rel)
    s, Zl, Zr = _kernel_svd_recovery(M, La, Lb, key, n_modes, n_iter)
    V_left = Xl.conj().T @ Zl
    V_right = Xr.conj().T @ Zr
    return s, V_left, V_right


@partial(jax.jit,
         static_argnames=('n_obs', 'n_vars', 'complexify', 'rotated',
                          'n_rot', 'power', 'n_iter', 'dist',
                          'polar_method'))
def fast_surrogate_variance_gen(seed, key, n_obs, n_vars, H=None,
                                complexify=False, rotated=False,
                                n_rot=10, power=1, tol=1e-8, n_iter=8,
                                jitter_rel=1e-6, dist='normal32',
                                polar_method='ns'):
    """One Rule-N surrogate solve with ON-THE-FLY field generation.

    The fully fused variant: the surrogate fields are never materialized
    at all.  ``xmca_tpu.ops.surrogate.surrogate_gram`` generates
    bfloat16 tiles from the on-core hardware PRNG inside a Pallas kernel
    and accumulates the temporal Gram on the MXU; the spatial loading
    back-projection regenerates identical tiles (``surrogate_project``).
    Everything downstream — Cholesky reduction, subspace SVD, promax —
    operates on n x n / (p, k) arrays exactly like
    :func:`fast_rotated_variance_analytic`.

    NOT the production Rule-N path: measured slower than materialized
    ``bits_field`` draws + XLA matmuls at MCA shapes (see
    ``xmca_tpu.ops.surrogate`` and benchmarks/RESULTS.md); production
    ensembles run ``stats.significance._rule_n_generated``.  Retained
    for shapes/hardware where the fusion wins, with distribution-level
    equivalence tested in tests/unit/test_surrogate.py.

    Centering is exact: the kernels accumulate the rank-1 terms so the
    centered Gram and centered projections are recovered algebraically
    (``centered_gram_from_raw``), matching the pipeline the reference
    applies to its Gaussian surrogates (xmca/array.py:1753-1765).

    Returns ``(variance, total, converged)`` with the same contract as
    ``xmca_tpu.stats.significance._surrogate_variance``.
    """
    from xmca_tpu.core.rotation import ensemble_space, promax
    from xmca_tpu.ops.surrogate import (surrogate_gram, surrogate_project,
                                        centered_gram_from_raw)

    seed = jnp.asarray(seed).astype(jnp.int32)
    bivariate = len(n_vars) == 2
    f_eps = float(np.finfo(np.float32).eps)

    def field_gram(fseed, p):
        G, mu, u, mumu = surrogate_gram(fseed, n_obs, p, dist=dist)
        Gc = centered_gram_from_raw(G, u, mumu)
        if complexify:
            Gz = _analytic_fold(Gc, H).astype(jnp.complex64)
        else:
            Gz = Gc
        return _jitter(Gz, p, jitter_rel, input_eps=f_eps), mu

    seeds = [seed * 2, seed * 2 + 1]
    Gl, mu_l = field_gram(seeds[0], n_vars[0])
    if bivariate:
        Gr, mu_r = field_gram(seeds[1], n_vars[1])
    else:
        Gr, mu_r = Gl, mu_l

    dof = n_obs - 1
    La = jnp.linalg.cholesky(Gl)
    Lb = La if not bivariate else jnp.linalg.cholesky(Gr)
    M = _dot_hi(La.conj().T, Lb) / dof

    if not rotated:
        _, s, _ = subspace_svd(M, key, k=n_rot, n_iter=n_iter)
        total = nuclear_norm_surrogate(M)
        conv = jnp.isfinite(s).all()
        return s, total, conv

    U, s, V = subspace_svd(M, key, k=n_rot, n_iter=n_iter)

    def spatial(fseed, p, mu, L_chol, T_side):
        T = jax.scipy.linalg.solve_triangular(
            L_chol.conj().T, T_side, lower=False
        )
        if complexify:
            # one real (n, 2k) projection so the field regenerates once
            S_stack = analytic_projection_stack(T, H).astype(jnp.float32)
            P = surrogate_project(fseed, S_stack, n_obs, p, dist=dist)
            P = P - mu[:, None] * jnp.sum(S_stack, axis=0)[None, :]
            return combine_analytic_projection(P)
        S_stack = jnp.real(T).astype(jnp.float32)
        P = surrogate_project(fseed, S_stack, n_obs, p, dist=dist)
        return P - mu[:, None] * jnp.sum(S_stack, axis=0)[None, :]

    Vl = spatial(seeds[0], n_vars[0], mu_l, La, U)
    sqrt_s = jnp.sqrt(s).astype(Vl.dtype)
    if bivariate:
        Vr = spatial(seeds[1], n_vars[1], mu_r, Lb, V)
        L = jnp.concatenate([Vl, Vr], axis=0) * sqrt_s[None, :]
    else:
        L = Vl * sqrt_s[None, :]
    n_vars_left = Vl.shape[0]
    L_rot, R, phi, converged, _ = promax(
        L, power=power, tol=tol, polar_method=polar_method,
        # generated-null ensemble: mode-space fixed point when the
        # stack is tall (exact rewrite; ~1e-3 f32 iterate noise is
        # ~70x below the null quantiles' Monte-Carlo noise)
        space=ensemble_space(L.shape[0], L.shape[1],
                             L.dtype.itemsize)
    )
    norm_left = jnp.linalg.norm(L_rot[:n_vars_left, :], axis=0)
    if bivariate:
        norm_right = jnp.linalg.norm(L_rot[n_vars_left:, :], axis=0)
        variance = norm_left * norm_right
    else:
        variance = norm_left ** 2
    variance = jnp.sort(variance)[::-1]
    converged = jnp.logical_and(converged, jnp.isfinite(variance).all())
    return variance, jnp.sum(variance), converged


def _int8_centered_gram(X):
    """Exactly-centered temporal Gram of a ±1 int8 field.

    The raw Gram runs as one s8 x s8 -> s32 MXU contraction (2x the
    bfloat16 rate, integer-exact accumulation — the data contraction
    has ZERO rounding error), and centering is recovered by the rank-1
    identity ``Gc = G - w 1^T - 1 w^T + mu.mu`` like the streaming
    solver's.  Returns (Gc f32, mu f32, X as bfloat16 for the
    downstream back-projection).
    """
    n = X.shape[0]
    G = jax.lax.dot_general(
        X, X, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    colsum = jax.lax.dot_general(
        jnp.ones((1, n), jnp.int8), X, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )[0].astype(jnp.float32)
    mu = colsum / n
    Xb = X.astype(jnp.bfloat16)
    w = jax.lax.dot_general(
        Xb, mu[:, None], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, 0]
    Gc = G - w[:, None] - w[None, :] + jnp.sum(mu * mu)
    return Gc, mu, Xb


@partial(jax.jit,
         static_argnames=('n_obs', 'n_vars', 'complexify', 'rotated',
                          'n_rot', 'power', 'n_iter', 'polar_method',
                          'dist'))
def fast_surrogate_variance_int8(seed, key, n_obs, n_vars, H=None,
                                 complexify=False, rotated=False,
                                 n_rot=10, power=1, tol=1e-8, n_iter=8,
                                 jitter_rel=1e-6, polar_method='ns',
                                 dist='rademacher8'):
    """One Rule-N surrogate solve from ±1 int8 draws.

    The ``surrogate_gen_dist='rademacher8'/'rademacher1'`` pipeline:
    draws cost one random byte (one random BIT for 'rademacher1' —
    the same distribution on an 8x smaller generated-bit budget) per
    element, the data-sized Gram runs in the MXU's int8 mode via
    :func:`_int8_centered_gram`, and everything downstream (analytic
    fold, Cholesky reduction, subspace SVD, rotation) is the standard
    f32 n x n algebra.  Null-spectrum equivalence to Gaussian draws
    rests on the same two-moment universality as 'rademacher'
    (tests/unit/test_surrogate.py,
    tests/integration/test_significance.py); same contract as
    :func:`fast_surrogate_variance_gen`.
    """
    from xmca_tpu.core.rotation import ensemble_space, promax
    from xmca_tpu.ops.surrogate import bits_field

    seed = jnp.asarray(seed).astype(jnp.int32)
    bivariate = len(n_vars) == 2
    f_eps = float(np.finfo(np.float32).eps)

    def field_gram(fseed, p):
        X = bits_field(fseed, (n_obs, p), dist=dist)
        Gc, mu, Xb = _int8_centered_gram(X)
        Gz = _analytic_fold(Gc, H).astype(jnp.complex64) if complexify \
            else Gc
        return _jitter(Gz, p, jitter_rel, input_eps=f_eps), mu, Xb

    seeds = [seed * 2, seed * 2 + 1]
    Gl, mu_l, Xb_l = field_gram(seeds[0], n_vars[0])
    if bivariate:
        Gr, mu_r, Xb_r = field_gram(seeds[1], n_vars[1])
    else:
        Gr, mu_r, Xb_r = Gl, mu_l, Xb_l

    dof = n_obs - 1
    La = jnp.linalg.cholesky(Gl)
    Lb = La if not bivariate else jnp.linalg.cholesky(Gr)
    M = _dot_hi(La.conj().T, Lb) / dof

    if not rotated:
        _, s, _ = subspace_svd(M, key, k=n_rot, n_iter=n_iter)
        total = nuclear_norm_surrogate(M)
        return s, total, jnp.isfinite(s).all()

    U, s, V = subspace_svd(M, key, k=n_rot, n_iter=n_iter)

    def spatial(Xb, mu, L_chol, T_side):
        T = jax.scipy.linalg.solve_triangular(
            L_chol.conj().T, T_side, lower=False
        )
        if complexify:
            S_stack = analytic_projection_stack(T, H).astype(jnp.float32)
            P = _data_dot(Xb.T, S_stack)
            P = P - mu[:, None] * jnp.sum(S_stack, axis=0)[None, :]
            return combine_analytic_projection(P)
        S_stack = jnp.real(T).astype(jnp.float32)
        P = _data_dot(Xb.T, S_stack)
        return P - mu[:, None] * jnp.sum(S_stack, axis=0)[None, :]

    Vl = spatial(Xb_l, mu_l, La, U)
    sqrt_s = jnp.sqrt(s).astype(Vl.dtype)
    if bivariate:
        Vr = spatial(Xb_r, mu_r, Lb, V)
        L = jnp.concatenate([Vl, Vr], axis=0) * sqrt_s[None, :]
    else:
        L = Vl * sqrt_s[None, :]
    n_vars_left = Vl.shape[0]
    L_rot, _, _, converged, _ = promax(
        L, power=power, tol=tol, polar_method=polar_method,
        # generated-null ensemble: mode-space fixed point when the
        # stack is tall (exact rewrite; ~1e-3 f32 iterate noise is
        # ~70x below the null quantiles' Monte-Carlo noise)
        space=ensemble_space(L.shape[0], L.shape[1],
                             L.dtype.itemsize)
    )
    norm_left = jnp.linalg.norm(L_rot[:n_vars_left, :], axis=0)
    if bivariate:
        norm_right = jnp.linalg.norm(L_rot[n_vars_left:, :], axis=0)
        variance = norm_left * norm_right
    else:
        variance = norm_left ** 2
    variance = jnp.sort(variance)[::-1]
    converged = jnp.logical_and(converged, jnp.isfinite(variance).all())
    return variance, jnp.sum(variance), converged


@partial(jax.jit,
         static_argnames=('n_obs', 'n_vars', 'complexify', 'rotated',
                          'n_rot', 'power', 'n_iter', 'polar_method',
                          'dist', 'grade'))
def fast_surrogate_variance_tri(seed, key, n_obs, n_vars, H=None,
                                complexify=False, rotated=False,
                                n_rot=10, power=1, tol=1e-8, n_iter=8,
                                jitter_rel=1e-6, polar_method='ns',
                                dist='rademacher8', grade='exact'):
    """One Rule-N surrogate solve with the TRIANGLE (syrk) Gram.

    The TPU production pipeline (auto-selected by ``rule_n`` for
    generated sign/binomial draws): fields are drawn padded to the
    Pallas syrk's block sizes (pad rows/columns zeroed — they
    contribute nothing and are sliced away), the temporal Gram runs as
    lower-triangle blocks only (xmca_tpu.ops.syrk — the Gram is the
    per-surrogate dominant op and XLA cannot exploit its symmetry),
    centering is recovered by the rank-1 identity on the raw Gram
    (exact for ±1/binomial values: bf16 holds them exactly and the
    f32 accumulation is exact below 2^24), and everything downstream
    (analytic fold, Cholesky reduction, subspace SVD, rotation) is the
    standard n x n algebra.  Same contract as
    :func:`fast_surrogate_variance_int8`; equivalence tested in
    tests/unit/test_surrogate.py (interpret mode) and on-chip in
    scripts/tpu_checks.py.

    ``grade='fast'`` runs the n x n fold and kernel contractions at the
    MXU's single-pass bf16 precision instead of HIGHEST (6 passes) and
    raises the jitter floor to 2e-3 relative so the ~1e-3-relative
    contraction error cannot push the Cholesky off positive definite.
    Both perturbations move null quantiles by ~1e-3 relative — far
    below the Monte-Carlo noise of the quantiles themselves (measured
    on-chip, scripts/tri_stage_probe.py); the analysis' own solve
    never uses this grade.
    """
    from xmca_tpu.core.rotation import ensemble_space, promax
    from xmca_tpu.ops.surrogate import bits_field
    from xmca_tpu.ops.syrk import pad_to, syrk

    seed = jnp.asarray(seed).astype(jnp.int32)
    bivariate = len(n_vars) == 2
    f_eps = float(np.finfo(np.float32).eps)
    interpret = jax.default_backend() != 'tpu'
    if grade == 'fast':
        dot = jnp.matmul                 # single-pass bf16, f32 accum
        jitter_rel = max(jitter_rel, 2e-3)
    else:
        dot = _dot_hi

    def field_gram(fseed, p):
        n_pad, p_pad = pad_to(n_obs, p)
        X = bits_field(fseed, (n_pad, p_pad), dist=dist)
        ok = ((jax.lax.broadcasted_iota(jnp.int32,
                                        (n_pad, p_pad), 0) < n_obs)
              & (jax.lax.broadcasted_iota(jnp.int32,
                                          (n_pad, p_pad), 1) < p))
        # int8 draws (rademacher8) stay int8 all the way into the
        # Gram: the syrk kernel then runs the MXU's 2x int8 path with
        # exact int32 accumulation (bit-equal to the bf16 Gram for ±1
        # values; 2.80 vs 4.41 ms/field measured on a v5e —
        # scripts/int8_syrk_probe.py), and the masked field costs half
        # the HBM of a bf16 copy.  Wider generated values (binomial
        # 'normal16'/'normal32') keep the bf16 route.
        if X.dtype == jnp.int8:
            Xb = jnp.where(ok, X, jnp.int8(0))
            colsum = jnp.sum(Xb, axis=0, dtype=jnp.int32).astype(
                jnp.float32
            )
        else:
            Xb = jnp.where(ok, X.astype(jnp.bfloat16), jnp.bfloat16(0))
            # XLA fuses draw + mask + this column-sum reduction into
            # the single generation pass (measured 2.1 ms/field either
            # way at north-star shapes; a Pallas draw kernel with
            # fused sums — ops.surrogate.sign_field_sums — measured
            # 2.4 ms)
            colsum = jnp.sum(Xb.astype(jnp.float32), axis=0)
        G = syrk(Xb, interpret=interpret)[:n_obs, :n_obs]
        mu = colsum / n_obs
        # centering from the Gram alone: mu_time = X^T 1 / n, so
        # w = X mu_time = G 1 / n and mu_time.mu_time = 1^T G 1 / n^2 —
        # the rank-1 correction needs no further pass over the field
        w = jnp.sum(G, axis=1) / n_obs
        Gc = G - w[:, None] - w[None, :] + jnp.sum(w) / n_obs
        Gz = _analytic_fold(Gc, H, dot=dot).astype(jnp.complex64) \
            if complexify else Gc
        return _jitter(Gz, p, jitter_rel, input_eps=f_eps), mu, Xb

    seeds = [seed * 2, seed * 2 + 1]
    Gl, mu_l, Xb_l = field_gram(seeds[0], n_vars[0])
    if bivariate:
        Gr, mu_r, Xb_r = field_gram(seeds[1], n_vars[1])
    else:
        Gr, mu_r, Xb_r = Gl, mu_l, Xb_l

    dof = n_obs - 1
    La = jnp.linalg.cholesky(Gl)
    Lb = La if not bivariate else jnp.linalg.cholesky(Gr)
    M = dot(La.conj().T, Lb) / dof

    if not rotated:
        _, s, _ = subspace_svd(M, key, k=n_rot, n_iter=n_iter)
        total = nuclear_norm_surrogate(M)
        return s, total, jnp.isfinite(s).all()

    U, s, V = subspace_svd(M, key, k=n_rot, n_iter=n_iter)

    def spatial(Xb, mu, p, L_chol, T_side):
        T = jax.scipy.linalg.solve_triangular(
            L_chol.conj().T, T_side, lower=False
        )
        if complexify:
            S_stack = analytic_projection_stack(T, H).astype(
                jnp.float32
            )
        else:
            S_stack = jnp.real(T).astype(jnp.float32)
        # pad the (n_obs, k) weights to the padded row count
        S_pad = jnp.zeros((Xb.shape[0], S_stack.shape[1]),
                          jnp.float32).at[:n_obs].set(S_stack)
        # int8 fields cast to bf16 inside the contraction (XLA fuses
        # the convert into the operand read — the int8 field is half
        # the HBM traffic of the bf16 copy it replaces)
        Xc = Xb.astype(jnp.bfloat16) if Xb.dtype == jnp.int8 else Xb
        P = _data_dot(Xc.T, S_pad)[:p]
        P = P - mu[:p, None] * jnp.sum(S_stack, axis=0)[None, :]
        return combine_analytic_projection(P) if complexify else P

    Vl = spatial(Xb_l, mu_l, n_vars[0], La, U)
    sqrt_s = jnp.sqrt(s).astype(Vl.dtype)
    if bivariate:
        Vr = spatial(Xb_r, mu_r, n_vars[1], Lb, V)
        L = jnp.concatenate([Vl, Vr], axis=0) * sqrt_s[None, :]
    else:
        L = Vl * sqrt_s[None, :]
    n_vars_left = Vl.shape[0]
    L_rot, _, _, converged, _ = promax(
        L, power=power, tol=tol, polar_method=polar_method,
        # generated-null ensemble: mode-space fixed point when the
        # stack is tall (exact rewrite; ~1e-3 f32 iterate noise is
        # ~70x below the null quantiles' Monte-Carlo noise)
        space=ensemble_space(L.shape[0], L.shape[1],
                             L.dtype.itemsize)
    )
    norm_left = jnp.linalg.norm(L_rot[:n_vars_left, :], axis=0)
    if bivariate:
        norm_right = jnp.linalg.norm(L_rot[n_vars_left:, :], axis=0)
        variance = norm_left * norm_right
    else:
        variance = norm_left ** 2
    variance = jnp.sort(variance)[::-1]
    converged = jnp.logical_and(converged, jnp.isfinite(variance).all())
    return variance, jnp.sum(variance), converged


@partial(jax.jit, static_argnames=('n_modes', 'n_iter'))
def fast_solve_truncated_totals(Xl, Xr, key, n_modes, n_iter=8,
                                jitter_rel=1e-6):
    """Truncated solve + exact spectrum totals, as ONE compiled graph.

    The public ``set_solver(truncate=k)`` path: everything from the
    Gram contraction to the Newton-Schulz nuclear norm compiles into a
    single XLA program (eagerly dispatching the intermediate ops would
    both serialize them and, on the axon TPU backend, hit unimplemented
    standalone complex kernels).  Returns
    (s, V_left, V_right, total_cov, total_sq).
    """
    M, La, Lb = reduced_kernel(Xl, Xr, jitter_rel)
    s, Zl, Zr = _kernel_svd_recovery(M, La, Lb, key, n_modes, n_iter)
    V_left = Xl.conj().T @ Zl
    V_right = Xr.conj().T @ Zr
    total_cov = nuclear_norm(M)
    total_sq = jnp.sum(jnp.abs(M) ** 2)
    return s, V_left, V_right, total_cov, total_sq


@partial(jax.jit, static_argnames=('n_modes', 'n_iter'))
def fast_solve_truncated_totals_analytic(Xl, Xr, H, key, n_modes,
                                         n_iter=8, jitter_rel=1e-6):
    """Truncated solve of the COMPLEXIFIED fields from real data.

    Same contract as :func:`fast_solve_truncated_totals` applied to
    ``analytic(Xl), analytic(Xr)``, but the data-sized contractions run
    on the *real* fields: the complexified temporal Grams come from the
    analytic fold (``G_Z = A G_X A^H`` — n x n algebra on one real
    HIGHEST-precision Gram instead of a 4x-cost complex Gram), and the
    spatial vectors from the stacked real projection
    (:func:`_analytic_spatial_vectors`).  Exact algebra — the public
    ``solve(complexify=True)`` path uses it whenever the matmul-Hilbert
    operator ``H`` exists (no boundary extension, n_obs within the
    matmul-Hilbert range); equivalence to the materialized-Z pipeline
    is pinned in tests/unit/test_fastpath.py.
    """
    M, La, Lb = analytic_reduced_kernel(Xl, Xr, H, jitter_rel)
    s, Zl, Zr = _kernel_svd_recovery(M, La, Lb, key, n_modes, n_iter)
    V_left = _analytic_spatial_vectors(Xl, H, Zl)
    V_right = _analytic_spatial_vectors(Xr, H, Zr)
    total_cov = nuclear_norm(M)
    total_sq = jnp.sum(jnp.abs(M) ** 2)
    return s, V_left, V_right, total_cov, total_sq
