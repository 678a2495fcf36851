"""MXU-friendly linear-algebra primitives for the MCA solve pipeline.

The reference delegates all linear algebra to host LAPACK
(``np.linalg.svd`` at xmca/array.py:479,570).  On TPU the FLOPs belong on the
MXU, so the workhorse here is the *Gram-matrix trick*: instead of a direct
SVD of a tall(or wide) data matrix ``X (n, p)``, form the small Gram matrix
on the MXU (one large matmul), eigendecompose the small side, and recover the
other factor with a second matmul.  Only ``min(n, p) x min(n, p)``
eigendecompositions ever run, everything else is dense matmul — exactly what
the hardware wants.  A direct-SVD path is kept for maximum-accuracy parity
runs, and a randomized range-finder path covers tall-skinny fields where only
the leading modes are needed (BASELINE.md north star).
"""
from functools import partial

import jax
import jax.numpy as jnp


def _rank_eps(dtype):
    return jnp.finfo(jnp.real(jnp.zeros((), dtype)).dtype).eps


def safe_reciprocal(s, rel_cutoff=None):
    """1/s with entries below a relative cutoff zeroed (rank deficiency)."""
    if rel_cutoff is None:
        rel_cutoff = _rank_eps(s.dtype) * s.shape[-1] * 10
    cutoff = jnp.max(s, axis=-1, keepdims=True) * rel_cutoff
    return jnp.where(s > cutoff, 1.0 / jnp.where(s > cutoff, s, 1.0), 0.0)


@partial(jax.jit, static_argnames=('method',))
def field_decomposition(X, method='gram'):
    """Thin SVD ``X = K @ diag(L) @ M^H`` with ``r = min(n, p)`` modes.

    Replaces the per-field LAPACK SVD of the reference's PCA pre-step
    (xmca/array.py:474-483,552).

    method='gram' (TPU-native): eigendecompose the smaller Gram matrix
        (``X^H X`` if p <= n else ``X X^H``) — two big MXU matmuls plus one
        small ``eigh``.
    method='svd': direct ``jnp.linalg.svd`` (closest to the reference's
        LAPACK numerics; useful for f64 parity runs on CPU).

    Returns
    -------
    K : (n, r) left singular vectors
    L : (r,)  singular values, descending
    M : (p, r) right singular vectors
    """
    n, p = X.shape
    r = min(n, p)
    if method == 'svd':
        K, L, Mh = jnp.linalg.svd(X, full_matrices=False)
        return K, L, Mh.conj().T
    if method != 'gram':
        raise ValueError('method must be one of {"gram", "svd"}')

    hi = jax.lax.Precision.HIGHEST
    if p <= n:
        C = jnp.matmul(X.conj().T, X, precision=hi)   # (p, p) on the MXU
        w, V = jnp.linalg.eigh(C)               # ascending
        w = jnp.flip(w, -1)
        V = jnp.flip(V, -1)
        L = jnp.sqrt(jnp.clip(w, 0.0))
        K = jnp.matmul(X, V * safe_reciprocal(L), precision=hi)
        M = V
    else:
        G = jnp.matmul(X, X.conj().T, precision=hi)   # (n, n) on the MXU
        w, Q = jnp.linalg.eigh(G)
        w = jnp.flip(w, -1)
        Q = jnp.flip(Q, -1)
        L = jnp.sqrt(jnp.clip(w, 0.0))
        K = Q
        M = jnp.matmul(X.conj().T, Q * safe_reciprocal(L), precision=hi)
    return K[:, :r], L[:r], M[:, :r]


@partial(jax.jit, static_argnames=('n_modes', 'n_iter'))
def randomized_decomposition(X, key, n_modes, n_iter=2):
    """Randomized thin SVD of ``X (n, p)`` truncated to ``n_modes``.

    Halko-Martinsson-Tropp range finder with power iterations — all dense
    matmuls + small QR, the TPU-native fast path for very tall/wide fields
    when only the leading modes are wanted.  Oversamples by ~10 internally.
    """
    n, p = X.shape
    k = min(n_modes + 10, n, p)
    real_dtype = jnp.real(jnp.zeros((), X.dtype)).dtype
    omega = jax.random.normal(key, (p, k), dtype=real_dtype).astype(X.dtype)
    Y = X @ omega                                     # (n, k)
    Q, _ = jnp.linalg.qr(Y)
    for _ in range(n_iter):
        Z, _ = jnp.linalg.qr(X.conj().T @ Q)          # (p, k)
        Q, _ = jnp.linalg.qr(X @ Z)                   # (n, k)
    B = Q.conj().T @ X                                # (k, p)
    Ub, s, Vh = jnp.linalg.svd(B, full_matrices=False)
    K = Q @ Ub
    r = min(n_modes, k)
    return K[:, :r], s[:r], Vh.conj().T[:, :r]


def _kernel_svd_polar(K, compute_uv=True):
    """SVD via QDWH polar + one hermitian eigendecomposition.

    ``side='right'`` (``K = W P``) needs ``m >= n``; wide matrices use
    ``side='left'`` (``K = P W``) instead:
    ``P = V S V^H`` => ``K = V S (W^H V)^H`` — same triplets, no
    transposed copy of ``K`` materialized.
    """
    m, n = K.shape
    hi = jax.lax.Precision.HIGHEST
    if m >= n:
        W, P = jax.scipy.linalg.polar(K, side='right')
    else:
        W, P = jax.scipy.linalg.polar(K, side='left')
    w, V = jnp.linalg.eigh(P)
    w = jnp.flip(w, -1)
    s = jnp.clip(w, 0.0)
    if not compute_uv:
        return s
    V = jnp.flip(V, -1)
    if m >= n:
        U = jnp.matmul(W, V, precision=hi)
        return U, s, V.conj().T
    # K = P W = (V S V^H) W:  U = V, V^H W has orthonormal rows
    Vh = jnp.matmul(V.conj().T, W, precision=hi)
    return V, s, Vh


def kernel_svd(K, compute_uv=True):
    """Backend-aware SVD of a small dense kernel matrix.

    CPU lowers to LAPACK (exact parity path).  On TPU, XLA's dense SVD
    is an extremely slow iteration; the QDWH polar factorization
    (``jax.scipy.linalg.polar`` — QR + matmuls, designed for TPU)
    followed by one hermitian eigendecomposition is equivalent
    (:func:`_kernel_svd_polar`).
    """
    if jax.default_backend() == 'cpu':
        if not compute_uv:
            return jnp.linalg.svd(K, compute_uv=False)
        return jnp.linalg.svd(K, full_matrices=False)
    return _kernel_svd_polar(K, compute_uv=compute_uv)


def ns_polar_iterate(A, n_steps, dot=None):
    """Fixed-count Newton-Schulz polar iterate of ``A``.

    The recurrence ``W <- 1.5 W - 0.5 W (W^H W)`` drives every singular
    value of the Frobenius-prescaled iterate toward 1 — the shared core
    of the 'ns'/'ns<k>' polar variants and the nuclear-norm traces
    (fastpath.nuclear_norm/_surrogate); the convergence-gated variant
    reuses the same body inside a ``lax.while_loop``.  ``dot`` picks
    the matmul (default operator precision; pass a HIGHEST-precision
    wrapper for accuracy-critical totals).  Zero-safe: a zero matrix
    returns zero instead of NaN-ing the prescale."""
    if dot is None:
        dot = jnp.matmul
    fro = jnp.linalg.norm(A)
    W = A / jnp.where(fro == 0, 1.0, fro)
    for _ in range(n_steps):
        W = 1.5 * W - 0.5 * dot(W, dot(W.conj().T, W))
    return W


def ns_polar_schedule(l0=1e-9, tol=1e-7, max_steps=64):
    """Greedy minimax scale schedule for the SCALED cubic NS iteration.

    One cubic step maps a singular value ``x`` to ``f(s x)`` with
    ``f(y) = 1.5 y - 0.5 y^3``; choosing ``s`` so that
    ``f(s l) = f(s u)`` (``s = sqrt(3 / (u^2 + u l + l^2))``) is the
    per-step minimax choice over a known spectrum interval ``[l, u]``:
    small singular values grow by ``~ 1.5 sqrt(3) ~ 2.6x`` per step
    instead of the unscaled ``1.5x``.  Everything stays inside the
    convergence basin by construction (``s u <= sqrt(3)``, and the
    global max of ``f`` on ``[0, sqrt(3)]`` is 1, so ``u' <= 1``).
    The same composed-polynomial idea appears in the matrix-sign /
    polar literature (optimally scaled Newton, and recent
    "polar express" GPU schedules).

    Returns the host-side scale list reaching ``min sval >= 1 - tol``
    from a worst-case ``sigma_min/||.||_F >= l0``.  The schedule only
    depends on (l0, tol) — callers treat it as a static constant.
    """
    scales, l, u = [], float(l0), 1.0
    for _ in range(max_steps):
        if l >= 1.0 - tol:
            break
        s = (3.0 / (u * u + u * l + l * l)) ** 0.5
        scales.append(s)

        def f(y):
            return 1.5 * y - 0.5 * y ** 3

        fl, fu = f(s * l), f(s * u)
        l = min(fl, fu)
        u = 1.0 if s * u >= 1.0 else max(fl, fu)
    return scales


def ns_polar_apply(W, scales, dot=None):
    """Apply scaled NS steps to an ALREADY-prescaled iterate.

    Split out of :func:`ns_polar_iterate_scaled` so callers can run a
    schedule's phases at different matmul precisions (the
    mixed-precision nuclear norm) without re-prescaling in between.
    """
    if dot is None:
        dot = jnp.matmul
    for s in scales:
        W = (1.5 * s) * W - (0.5 * s ** 3) * dot(W, dot(W.conj().T, W))
    return W


def ns_polar_iterate_scaled(A, scales, dot=None):
    """Scaled Newton-Schulz polar iterate with a precomputed schedule.

    Same contract as :func:`ns_polar_iterate` but each step applies
    ``W <- 1.5 s W - 0.5 s^3 W (W^H W)`` with the
    :func:`ns_polar_schedule` scale — the nuclear-norm trace converges
    in ~26 steps from sigma_min/fro = 1e-9 where the unscaled
    iteration needs 50+ (and never fully converges the tiniest
    directions).  Zero-safe like the unscaled variant.
    """
    fro = jnp.linalg.norm(A)
    W = A / jnp.where(fro == 0, 1.0, fro)
    return ns_polar_apply(W, scales, dot=dot)


def unitary_polar_factor(A, method='svd', dot=None):
    """Unitary polar factor of ``A`` plus its nuclear norm.

    The varimax update (reference xmca/tools/rotation.py:59-61) is
    ``R = U V^H`` from an SVD of the criterion matrix with convergence
    tracked by ``sum(s)``.  ``U V^H`` is exactly the unitary factor of the
    polar decomposition ``A = W P`` and ``sum(s) = trace(P)``.

    method='svd'   — exact, via dense SVD (the CPU/f64 parity path).
    method='polar' — QDWH via ``jax.scipy.linalg.polar`` (QR + matmuls).
    method='ns'    — scaled Newton-Schulz iteration: pure (batchable)
        matmuls, the TPU fast path.  Small dense factorizations inside a
        ``while_loop`` serialize badly on TPU; 30 fused matmul steps of a
        p x p matrix cost microseconds instead.  ``'ns<k>'`` (e.g.
        'ns14') runs k fixed steps instead of 30 — the noise-ensemble
        criteria are well-conditioned enough that shorter counts
        converge (measured in benchmarks/RESULTS.md).

    ``dot`` picks the matmul of the NS variants (default operator
    precision; public rotations pass a HIGHEST wrapper — on TPU the
    default f32 matmul's bf16 passes inject ~1e-3 per iterate).

    Returns (W, nuclear_norm).
    """
    if dot is None:
        dot = jnp.matmul
    if method == 'polar':
        W, P = jax.scipy.linalg.polar(A, side='right')
        return W, jnp.trace(P).real
    if method.startswith('ns') and method[2:].isdigit():
        W = ns_polar_iterate(A, int(method[2:]), dot=dot)
        return W, jnp.real(jnp.trace(dot(W.conj().T, A)))
    if method == 'ns':
        # Fixed-count Newton-Schulz: 30 fused matmul steps.  Valid ONLY
        # for well-conditioned inputs (sigma_min/||A||_F well above
        # ~1e-4) — e.g. the varimax criteria of NOISE-surrogate loading
        # stacks, whose singular values are tightly clustered.  Real
        # loading stacks with a large mode-variance spread need
        # 'ns-gated': tiny singular values grow only 1.5x per step, so
        # a short fixed count leaves the polar factor CONTRACTIVE on
        # the trailing subspace and the varimax fixed point then
        # collapses those columns of R geometrically to exact zero
        # (observed at north-star scale in f32; regression test in
        # tests/unit/test_core.py).
        W = ns_polar_iterate(A, 30, dot=dot)
        return W, jnp.real(jnp.trace(dot(W.conj().T, A)))
    if method == 'ns-gated':
        # Convergence-gated Newton-Schulz: iterate on the orthogonality
        # defect, bounded at 80 steps (enough for sigma_min down to
        # ~1e-7, the f32 representability floor).  The dynamic loop
        # lowers less efficiently than the unrolled body inside batched
        # varimax pipelines — use 'ns' for ensembles of well-conditioned
        # stacks and this for real-data rotations.
        fro = jnp.linalg.norm(A)
        W0 = A / jnp.where(fro == 0, 1.0, fro)
        k = A.shape[-1]
        eye = jnp.eye(k, dtype=A.dtype)
        defect_tol = 10.0 * k * jnp.finfo(A.dtype).eps

        def ns_body(state):
            i, W, _ = state
            H = dot(W.conj().T, W)
            defect = jnp.linalg.norm(H - eye)
            W = 1.5 * W - 0.5 * dot(W, H)
            return i + 1, W, defect

        def ns_cond(state):
            i, _, defect = state
            return jnp.logical_and(i < 80, defect > defect_tol)

        start = jnp.asarray(jnp.inf, jnp.finfo(A.dtype).dtype)
        _, W, _ = jax.lax.while_loop(
            ns_cond, ns_body, (jnp.zeros((), jnp.int32), W0, start)
        )
        d = jnp.real(jnp.trace(dot(W.conj().T, A)))
        return W, d
    u, s, vh = jnp.linalg.svd(A)
    return u @ vh, jnp.sum(s)


@jax.jit
def pinv_hermitian_diag(H):
    """``diag(diag(inv(H)))`` with pseudo-inverse fallback semantics.

    Used by promax (reference xmca/tools/rotation.py:131-134).  ``pinv``
    coincides with ``inv`` for nonsingular matrices and degrades gracefully
    for singular ones, which matches the reference's try/except fallback
    without data-dependent control flow.
    """
    return jnp.diag(jnp.diag(jnp.linalg.pinv(H)))
