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
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from xmca_tpu.core import fastpath as _fast

_HI = jax.lax.Precision.HIGHEST


def chunks_from_array(X, chunk_size):
    """Iterate an in-memory ``(n, p)`` array in ``(n, <=chunk)`` slabs.

    Convenience loader; real out-of-core use supplies any iterable of
    host arrays with equal first dimension (e.g. reads from a memmap).
    """
    for s in range(0, X.shape[1], chunk_size):
        yield X[:, s:s + chunk_size]


@jax.jit
def _accumulate(G, w, mumu, chunk):
    """One pass-1 update: Gram + centering accumulators for a chunk."""
    c = jnp.asarray(chunk)
    G = G + jnp.matmul(c, c.T, precision=_HI)
    mu = jnp.mean(c, axis=0)
    w = w + jnp.matmul(c, mu[:, None], precision=_HI)[:, 0]
    return G, w, mumu + mu @ mu


def streamed_gram(chunks, n_obs, dtype=jnp.float32):
    """Centered temporal Gram of a streamed field (pass 1).

    ``chunks``: iterable of host ``(n_obs, p_chunk)`` arrays.  Returns
    ``(G, p)``: the exactly-centered ``(n_obs, n_obs)`` Gram on device
    and the total variable count seen (the rank/roundoff scale the
    jitter floor needs — roundoff of a length-p contraction grows like
    ``eps * sqrt(p)``).
    """
    G = jnp.zeros((n_obs, n_obs), dtype)
    w = jnp.zeros((n_obs,), dtype)
    mumu = jnp.zeros((), dtype)
    p = 0
    for chunk in chunks:
        chunk = np.asarray(chunk, dtype)
        p += chunk.shape[1]
        G, w, mumu = _accumulate(G, w, mumu, chunk)
    return G - w[:, None] - w[None, :] + mumu, p


@partial(jax.jit, static_argnames=('complexify',))
def _project_chunk(chunk, Z, colsum_Z, complexify):
    """One pass-2 update: centered spatial vectors for a chunk.

    ``Z`` is the (n, k) recovery matrix (complex for analytic solves —
    already folded with ``T - i H^T T`` by the caller, passed as its
    real/imag stack so only real matmuls run).
    """
    c = jnp.asarray(chunk)
    mu = jnp.mean(c, axis=0)
    P = jnp.matmul(c.T, Z, precision=_HI)
    P = P - mu[:, None] * colsum_Z[None, :]
    if complexify:
        return _fast.combine_analytic_projection(P)
    return P


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
    (svals, V_left, V_right, total_covariance) — loadings as host numpy
    ``(p, n_modes)`` (complex for analytic solves), assembled chunk by
    chunk; ``total_covariance`` is the exact nuclear norm of the
    reduced kernel (the Rule-N / explained-variance total).
    """
    from xmca_tpu.utils.transfer import to_numpy as _to_np

    if key is None:
        key = jax.random.PRNGKey(0)
    bivariate = chunks_right is not None
    # ONE device-resident Hilbert operator for both fields
    H = jnp.asarray(
        _fast.hilbert_imag_matrix(n_obs, np.dtype(dtype))
    ) if complexify else None

    def field_gram(loader):
        G, p = streamed_gram(loader(), n_obs, dtype)
        if complexify:
            G = _fast._analytic_fold(G, H).astype(
                _fast._complex_dtype(dtype)
            )
        # the jitter floor scales with the CONTRACTED width p, not n
        return _fast._jitter(
            G, p, jitter_rel,
            input_eps=float(jnp.finfo(dtype).eps),
        )

    Gl = field_gram(chunks_left)
    Gr = Gl if not bivariate else field_gram(chunks_right)

    dof = n_obs - 1
    La = jnp.linalg.cholesky(Gl)
    Lb = La if not bivariate else jnp.linalg.cholesky(Gr)
    M = jnp.matmul(La.conj().T, Lb, precision=_HI) / dof
    U, s, V = _fast.subspace_svd(M, key, k=n_modes, n_iter=n_iter)
    total = _fast.nuclear_norm(M)

    def recover(loader, L_chol, T_side):
        T = jax.scipy.linalg.solve_triangular(
            L_chol.conj().T, T_side, lower=False
        )
        if complexify:
            Z = _fast.analytic_projection_stack(T, H).astype(dtype)
        else:
            Z = jnp.real(T).astype(dtype)
        colsum = jnp.sum(Z, axis=0)
        parts = [
            _to_np(_project_chunk(np.asarray(c, dtype), Z, colsum,
                                  complexify))
            for c in loader()
        ]
        return np.concatenate(parts, axis=0)

    V_left = recover(chunks_left, La, U)
    V_right = V_left if not bivariate else recover(chunks_right, Lb, V)
    return (np.asarray(s), V_left, V_right,
            float(np.asarray(total)))
