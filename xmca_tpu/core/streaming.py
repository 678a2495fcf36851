"""Out-of-core (streaming) MCA solves for fields larger than device HBM.

The reference holds the full ``(time, space)`` matrices in RAM and hands
them to LAPACK (xmca/array.py:474-483) — fields beyond memory are simply
unsolvable there.  On TPU the solve only ever *contracts* over the space
axis (temporal Gram ``X X^T``, spatial back-projection ``X^T Z``), so
the data can stream through the chip in space chunks:

* **pass 1** — accumulate the temporal Gram, the column-mean projection
  ``w = X @ mu`` and ``sum(mu^2)`` chunk by chunk; centering is
  recovered EXACTLY by the rank-1 identity
  ``Gc = G - w 1^T - 1 w^T + (mu.mu)`` (no centered copy ever exists).
* **reduce** — the n x n Cholesky-reduced kernel, subspace SVD, and
  (optionally) the analytic-signal fold ``G_Z = (G + HGH^T) + i(HG -
  GH^T)`` all operate on n x n arrays: complex MCA streams exactly like
  real MCA, with no FFT of the data at all.
* **pass 2** — spatial singular vectors stream back out per chunk:
  ``V_chunk = Xc^T Z = X^T Z - mu (1^T Z)``.

Peak device memory is one chunk plus n x n state — fields of any width
solve on a single chip; the loaders may read from disk (memmap, zarr,
netCDF) so host RAM is not a bound either.  Accuracy matches the
in-memory fast path to float-roundoff (tests/unit/test_streaming.py).
"""
from collections import namedtuple
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from xmca_tpu.core import fastpath as _fast

_HI = jax.lax.Precision.HIGHEST

StreamedMCA = namedtuple('StreamedMCA', [
    'svals',                 # (k,) host
    'V_left', 'V_right',     # (p, k) host loadings (complex if analytic)
    'total_covariance',      # exact nuclear norm of the reduced kernel
    'total_squared_covariance',   # exact Frobenius norm squared
    'scores_left', 'scores_right',  # (n, k) DEVICE unwhitened PC series
    'means', 'stds',         # {'left'/'right': (p,)} host column stats
])


def chunks_from_array(X, chunk_size):
    """Iterate an in-memory ``(n, p)`` array in ``(n, <=chunk)`` slabs.

    Convenience loader; real out-of-core use supplies any iterable of
    host arrays with equal first dimension (e.g. reads from a memmap).
    """
    for s in range(0, X.shape[1], chunk_size):
        yield X[:, s:s + chunk_size]


@jax.jit
def _accumulate(G, w, mumu, chunk):
    """One pass-1 update: Gram + centering accumulators for a chunk,
    plus the chunk's column means and mean squares (the model-state
    statistics — predict/save need them and the chunk is already on
    device)."""
    c = jnp.asarray(chunk)
    G = G + jnp.matmul(c, c.T, precision=_HI)
    mu = jnp.mean(c, axis=0)
    w = w + jnp.matmul(c, mu[:, None], precision=_HI)[:, 0]
    return G, w, mumu + mu @ mu, mu, jnp.mean(c * c, axis=0)


def streamed_gram(chunks, n_obs, dtype=jnp.float32):
    """Centered temporal Gram of a streamed field (pass 1).

    ``chunks``: iterable of host ``(n_obs, p_chunk)`` arrays.  Returns
    ``(G, p, mean, std)``: the exactly-centered ``(n_obs, n_obs)`` Gram
    on device, the total variable count seen (the rank/roundoff scale
    the jitter floor needs — roundoff of a length-p contraction grows
    like ``eps * sqrt(p)``), and the host ``(p,)`` column means/stds.
    """
    G = jnp.zeros((n_obs, n_obs), dtype)
    w = jnp.zeros((n_obs,), dtype)
    mumu = jnp.zeros((), dtype)
    p = 0
    means, msqs = [], []
    for chunk in chunks:
        chunk = np.asarray(chunk, dtype)
        p += chunk.shape[1]
        G, w, mumu, mu, msq = _accumulate(G, w, mumu, chunk)
        means.append(np.asarray(mu))
        msqs.append(np.asarray(msq))
    mean = np.concatenate(means) if means else np.zeros(0, dtype)
    msq = np.concatenate(msqs) if msqs else np.zeros(0, dtype)
    std = np.sqrt(np.maximum(msq - mean ** 2, 0.0))
    return G - w[:, None] - w[None, :] + mumu, p, mean, std


@partial(jax.jit, static_argnames=('complexify',))
def _project_chunk(chunk, Z, colsum_Z, A, complexify):
    """One pass-2 update: centered spatial vectors for a chunk, plus
    the running PC-score accumulator.

    ``Z`` is the (n, k) recovery matrix (complex for analytic solves —
    already folded with ``T - i H^T T`` by the caller, passed as its
    real/imag stack so only real matmuls run).  ``A`` accumulates
    ``Xc @ V`` chunk by chunk — the unwhitened PC series comes out of
    the same pass for one extra small matmul, so the result layer never
    needs the (streamed, possibly disk-resident) data again.
    """
    c = jnp.asarray(chunk)
    mu = jnp.mean(c, axis=0)
    P = jnp.matmul(c.T, Z, precision=_HI)
    P = P - mu[:, None] * colsum_Z[None, :]
    if complexify:
        P = _fast.combine_analytic_projection(P)
    S = jnp.matmul(c, P, precision=_HI) \
        - jnp.matmul(mu[None, :], P, precision=_HI)
    return P, A + S


@jax.jit
def _fold_score_hilbert(A, H):
    """Analytic PC series from the real-data accumulator:
    ``Xz V = (I + iH) Xc V = A + i H A``."""
    return A + 1j * jnp.matmul(H, A, precision=_HI)


def streamed_mca(chunks_left, chunks_right, n_obs, n_modes, *,
                 complexify=False, key=None, n_iter=12,
                 jitter_rel=1e-6, dtype=jnp.float32):
    """Truncated (complex) MCA of two streamed fields.

    Parameters
    ----------
    chunks_left, chunks_right : callables returning fresh iterables of
        host ``(n_obs, p_chunk)`` arrays (each field is streamed twice:
        Gram pass + projection pass).  For a PCA pass ``chunks_right``
        may be None.
    n_modes : leading modes to extract.
    complexify : analytic-signal (Hilbert) MCA via the Gram fold — the
        complex field is never materialized, streamed or otherwise.

    Returns
    -------
    :class:`StreamedMCA` — loadings as host numpy ``(p, n_modes)``
    (complex for analytic solves), assembled chunk by chunk; exact
    spectrum totals (nuclear norm / squared Frobenius norm of the
    reduced kernel — the Rule-N / explained-variance / scf scales);
    and the unwhitened device-resident PC series ``Xz V`` accumulated
    during the projection pass (so the public result layer works
    without ever re-reading the streamed data).
    """
    from xmca_tpu.utils.transfer import to_numpy as _to_np

    if key is None:
        key = jax.random.PRNGKey(0)
    bivariate = chunks_right is not None
    # ONE device-resident Hilbert operator for both fields
    H = jnp.asarray(
        _fast.hilbert_imag_matrix(n_obs, np.dtype(dtype))
    ) if complexify else None

    means, stds = {}, {}

    def field_gram(loader, side):
        G, p, means[side], stds[side] = streamed_gram(
            loader(), n_obs, dtype
        )
        if complexify:
            G = _fast._analytic_fold(G, H).astype(
                _fast._complex_dtype(dtype)
            )
        # the jitter floor scales with the CONTRACTED width p, not n
        return _fast._jitter(
            G, p, jitter_rel,
            input_eps=float(jnp.finfo(dtype).eps),
        )

    Gl = field_gram(chunks_left, 'left')
    Gr = Gl if not bivariate else field_gram(chunks_right, 'right')

    dof = n_obs - 1
    La = jnp.linalg.cholesky(Gl)
    Lb = La if not bivariate else jnp.linalg.cholesky(Gr)
    M = jnp.matmul(La.conj().T, Lb, precision=_HI) / dof
    U, s, V = _fast.subspace_svd(M, key, k=n_modes, n_iter=n_iter)
    totals = jnp.stack([_fast.nuclear_norm(M),
                        jnp.sum(jnp.abs(M) ** 2)])

    score_dtype = (_fast._complex_dtype(dtype) if complexify
                   else np.dtype(dtype))

    def recover(loader, L_chol, T_side):
        T = jax.scipy.linalg.solve_triangular(
            L_chol.conj().T, T_side, lower=False
        )
        if complexify:
            Z = _fast.analytic_projection_stack(T, H).astype(dtype)
        else:
            Z = jnp.real(T).astype(dtype)
        colsum = jnp.sum(Z, axis=0)
        A = jnp.zeros((n_obs, T_side.shape[1]), score_dtype)
        parts = []
        for c in loader():
            P, A = _project_chunk(np.asarray(c, dtype), Z, colsum, A,
                                  complexify)
            parts.append(_to_np(P))
        if complexify:
            A = _fold_score_hilbert(A, H)
        return np.concatenate(parts, axis=0), A

    V_left, S_left = recover(chunks_left, La, U)
    if bivariate:
        V_right, S_right = recover(chunks_right, Lb, V)
    else:
        V_right, S_right = V_left, S_left
    totals = np.asarray(totals)
    return StreamedMCA(
        np.asarray(s), V_left, V_right,
        float(totals[0]), float(totals[1]), S_left, S_right,
        means, stds,
    )
