"""Out-of-core streamed solves vs the in-memory fast path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from numpy.testing import assert_allclose

from xmca_tpu.core.fastpath import (fast_solve_truncated,
                                    hilbert_imag_matrix,
                                    analytic_reduced_kernel,
                                    subspace_svd)
from xmca_tpu.core.streaming import (chunks_from_array, streamed_gram,
                                     streamed_mca)
from tests.conftest import align_modes


@pytest.fixture(scope='module')
def raw_xy():
    rng = np.random.default_rng(11)
    base = rng.standard_normal((128, 6))
    Xl = base @ rng.standard_normal((6, 700)) \
        + 0.3 * rng.standard_normal((128, 700)) + 1.5
    Xr = base @ rng.standard_normal((6, 500)) \
        + 0.3 * rng.standard_normal((128, 500)) - 0.7
    return Xl, Xr                       # deliberately UNcentered


def test_streamed_gram_is_exactly_centered(raw_xy):
    Xl, _ = raw_xy
    G, p, mean, std, keep = streamed_gram(
        chunks_from_array(Xl, 64), Xl.shape[0], jnp.float64
    )
    assert p == Xl.shape[1]
    assert keep.all()
    G = np.asarray(G)
    Xc = Xl - Xl.mean(0)
    ref = Xc @ Xc.T
    assert_allclose(G, ref, atol=1e-10 * abs(ref).max())
    assert_allclose(mean, Xl.mean(0), atol=1e-12)
    assert_allclose(std, Xl.std(0), atol=1e-12)


@pytest.mark.parametrize('chunk', [64, 129, 700])
def test_streamed_matches_in_memory_real(raw_xy, chunk):
    Xl, Xr = raw_xy
    k = 6
    key = jax.random.PRNGKey(2)
    res = streamed_mca(
        lambda: chunks_from_array(Xl, chunk),
        lambda: chunks_from_array(Xr, chunk),
        Xl.shape[0], k, key=key, dtype=jnp.float64,
    )
    s, Vl, Vr = res.svals, res.V_left, res.V_right
    s_ref, Vl_ref, Vr_ref = fast_solve_truncated(
        jnp.asarray(Xl - Xl.mean(0)), jnp.asarray(Xr - Xr.mean(0)),
        key, n_modes=k, n_iter=12,
    )
    assert_allclose(s, np.asarray(s_ref), rtol=1e-10)
    assert_allclose(align_modes(Vl, np.asarray(Vl_ref)),
                    np.asarray(Vl_ref), atol=1e-9)
    assert_allclose(align_modes(Vr, np.asarray(Vr_ref)),
                    np.asarray(Vr_ref), atol=1e-9)
    assert res.total_covariance > 0
    assert res.total_squared_covariance > 0
    # streamed PC accumulator == Xc @ V computed directly
    assert_allclose(np.asarray(res.scores_left),
                    (Xl - Xl.mean(0)) @ Vl, atol=1e-9)
    assert_allclose(np.asarray(res.scores_right),
                    (Xr - Xr.mean(0)) @ Vr, atol=1e-9)


def test_streamed_matches_in_memory_complex(raw_xy):
    """Analytic (Hilbert) streamed solve == in-memory analytic kernel."""
    Xl, Xr = raw_xy
    n = Xl.shape[0]
    k = 6
    key = jax.random.PRNGKey(3)
    res = streamed_mca(
        lambda: chunks_from_array(Xl, 96),
        lambda: chunks_from_array(Xr, 96),
        n, k, complexify=True, key=key, dtype=jnp.float64,
    )
    s, Vl, Vr = res.svals, res.V_left, res.V_right
    H = jnp.asarray(hilbert_imag_matrix(n, np.float64))
    Xlc = jnp.asarray(Xl - Xl.mean(0))
    Xrc = jnp.asarray(Xr - Xr.mean(0))
    M, La, Lb = analytic_reduced_kernel(Xlc, Xrc, H)
    U, s_ref, V = subspace_svd(M, key, k=k, n_iter=12)
    assert_allclose(s, np.asarray(s_ref), rtol=1e-9)
    # reference loadings via the in-memory analytic recovery
    Tl = jax.scipy.linalg.solve_triangular(La.conj().T, U, lower=False)
    S = Tl - 1j * (H.T @ Tl)
    Vl_ref = np.asarray(Xlc.T @ jnp.real(S)) \
        + 1j * np.asarray(Xlc.T @ jnp.imag(S))
    assert_allclose(align_modes(Vl, Vl_ref), Vl_ref, atol=1e-8)
    assert np.iscomplexobj(Vl) and np.iscomplexobj(Vr)
    # streamed analytic PC accumulator == Xz @ V computed directly
    Hn = np.asarray(H)
    Xz = (Xl - Xl.mean(0)) + 1j * (Hn @ (Xl - Xl.mean(0)))
    S_l = np.asarray(jnp.real(res.scores_left)) \
        + 1j * np.asarray(jnp.imag(res.scores_left))
    assert_allclose(S_l, Xz @ Vl, atol=1e-8)


def test_streamed_pca(raw_xy):
    Xl, _ = raw_xy
    res = streamed_mca(
        lambda: chunks_from_array(Xl, 128), None,
        Xl.shape[0], 4, dtype=jnp.float64,
    )
    assert res.V_left is res.V_right
    assert res.svals.shape == (4,) and np.isfinite(res.svals).all()


def test_streamed_univariate_complex(raw_xy):
    """Univariate analytic streamed solve (was untested; the public
    fixture flow goes through exactly this)."""
    Xl, _ = raw_xy
    n, k = Xl.shape[0], 4
    key = jax.random.PRNGKey(9)
    res = streamed_mca(
        lambda: chunks_from_array(Xl, 160), None,
        n, k, complexify=True, key=key, dtype=jnp.float64,
    )
    H = jnp.asarray(hilbert_imag_matrix(n, np.float64))
    Xc = jnp.asarray(Xl - Xl.mean(0))
    M, La, _ = analytic_reduced_kernel(Xc, Xc, H)
    _, s_ref, _ = subspace_svd(M, key, k=k, n_iter=12)
    assert_allclose(res.svals, np.asarray(s_ref), rtol=1e-9)
    assert np.iscomplexobj(res.V_left)
    assert np.isfinite(np.abs(res.V_left)).all()


def test_streamed_large_mean_float32_stable():
    """Kelvin-scale means (~300) with unit variance in float32: the
    raw-Gram + rank-1 centering cancelled catastrophically (NaN
    Cholesky); per-chunk centering must stay stable.  Found by running
    the public solver on the reference's sst fixture."""
    rng = np.random.default_rng(3)
    base = rng.standard_normal((128, 5))
    X = (base @ rng.standard_normal((5, 600))
         + 0.3 * rng.standard_normal((128, 600)) + 300.0)
    k = 4
    key = jax.random.PRNGKey(4)
    res = streamed_mca(
        lambda: chunks_from_array(X.astype(np.float32), 144), None,
        X.shape[0], k, complexify=True, key=key, dtype=jnp.float32,
    )
    assert np.isfinite(res.svals).all()
    assert np.isfinite(np.abs(res.V_left)).all()
    # f64 ground truth from the in-memory analytic kernel
    H = jnp.asarray(hilbert_imag_matrix(X.shape[0], np.float64))
    Xc = jnp.asarray(X - X.mean(0))
    M, _, _ = analytic_reduced_kernel(Xc, Xc, H)
    _, s_ref, _ = subspace_svd(M, jax.random.PRNGKey(4), k=k, n_iter=12)
    assert_allclose(res.svals, np.asarray(s_ref), rtol=2e-3)
    assert_allclose(res.means['left'], X.mean(0), rtol=1e-5)
