"""Fast (matmul-only) spectrum path vs the exact dense path.

Validates the Cholesky-reduced-kernel identity, subspace-iteration
accuracy, Newton-Schulz nuclear norm, and the end-to-end fast rotated
variance against the exact solver.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from numpy.testing import assert_allclose

from xmca_tpu.core.fastpath import (reduced_kernel, subspace_svd,
                                    nuclear_norm, fast_spectrum,
                                    fast_rotated_variance,
                                    fast_solve_truncated)
from xmca_tpu.core.solver import (solve_svals, solve_rotated_variance,
                                  solve_truncated)


@pytest.fixture(scope='module')
def xy():
    rng = np.random.default_rng(0)
    n, pl, pr = 300, 800, 600
    # left field with a decaying (geophysical-like) spectrum
    U0 = np.linalg.qr(rng.standard_normal((n, n)))[0]
    decay = np.geomspace(30, 0.5, n)
    Xl = (U0 * decay) @ rng.standard_normal((n, pl)) / np.sqrt(pl)
    Xr = rng.standard_normal((n, pr))
    return Xl - Xl.mean(0), Xr - Xr.mean(0)


def test_chol_reduced_kernel_identity(xy):
    """svals(X_l^H X_r) == svals(La^H Lb) — the Gram/Cholesky identity."""
    Xl, Xr = xy
    s_exact = np.asarray(solve_svals(jnp.asarray(Xl), jnp.asarray(Xr)))
    M, La, Lb = reduced_kernel(
        jnp.asarray(Xl), jnp.asarray(Xr), jitter_rel=1e-12
    )
    s_chol = np.linalg.svd(np.asarray(M), compute_uv=False)
    n = Xl.shape[0]
    assert (
        np.abs(s_chol[:n - 1] - s_exact[:n - 1]).max() / s_exact[0] < 1e-8
    )


def test_subspace_svd_topk(xy):
    Xl, Xr = xy
    s_exact = np.asarray(solve_svals(jnp.asarray(Xl), jnp.asarray(Xr)))
    M, _, _ = reduced_kernel(jnp.asarray(Xl), jnp.asarray(Xr), 1e-12)
    U, s, V = subspace_svd(M, jax.random.PRNGKey(0), k=10, n_iter=12)
    assert_allclose(np.asarray(s), s_exact[:10], rtol=1e-6)
    # returned triplets reconstruct the action of M on the subspace
    U, s, V = np.asarray(U), np.asarray(s), np.asarray(V)
    assert_allclose(np.asarray(M) @ V, U * s, atol=1e-3 * s[0])


def test_nuclear_norm(xy):
    Xl, Xr = xy
    s_exact = np.asarray(solve_svals(jnp.asarray(Xl), jnp.asarray(Xr)))
    M, _, _ = reduced_kernel(jnp.asarray(Xl), jnp.asarray(Xr), 1e-12)
    nn = float(nuclear_norm(M))
    assert abs(nn - s_exact.sum()) / s_exact.sum() < 1e-5


def test_fast_spectrum(xy):
    Xl, Xr = xy
    s_exact = np.asarray(solve_svals(jnp.asarray(Xl), jnp.asarray(Xr)))
    s, total = fast_spectrum(
        jnp.asarray(Xl), jnp.asarray(Xr), jax.random.PRNGKey(1), k=15,
        n_iter=12,
    )
    assert_allclose(np.asarray(s), s_exact[:15], rtol=1e-4)
    assert abs(float(total) - s_exact.sum()) / s_exact.sum() < 1e-4


def test_fast_rotated_variance(xy):
    Xl, Xr = xy
    var_e, conv_e = solve_rotated_variance(
        jnp.asarray(Xl), jnp.asarray(Xr), n_rot=10, power=1
    )
    var_f, conv_f = fast_rotated_variance(
        jnp.asarray(Xl), jnp.asarray(Xr), jax.random.PRNGKey(2),
        n_rot=10, power=1, n_iter=12,
    )
    assert bool(conv_e) and bool(conv_f)
    assert_allclose(np.asarray(var_f), np.asarray(var_e), rtol=1e-3)


def test_fast_rotated_variance_complex(xy):
    Xl, Xr = xy
    from xmca_tpu.core.preprocess import analytic_signal
    Zl = analytic_signal(jnp.asarray(Xl))
    Zr = analytic_signal(jnp.asarray(Xr))
    var_e, conv_e = solve_rotated_variance(Zl, Zr, n_rot=8, power=1)
    var_f, conv_f = fast_rotated_variance(
        Zl, Zr, jax.random.PRNGKey(3), n_rot=8, power=1, n_iter=12,
    )
    assert bool(conv_e) and bool(conv_f)
    assert_allclose(np.asarray(var_f), np.asarray(var_e), rtol=1e-3)


def test_fast_solve_truncated(xy):
    Xl, Xr = xy
    s_t, Vl_t, Vr_t = solve_truncated(
        jnp.asarray(Xl), jnp.asarray(Xr), n_modes=10
    )
    s_f, Vl_f, Vr_f = fast_solve_truncated(
        jnp.asarray(Xl), jnp.asarray(Xr), jax.random.PRNGKey(4),
        n_modes=10, n_iter=12,
    )
    assert_allclose(np.asarray(s_f), np.asarray(s_t), rtol=1e-5)
    ph = np.sign(np.sum(np.asarray(Vl_f) * np.asarray(Vl_t), axis=0))
    assert np.abs(np.asarray(Vl_f) * ph - np.asarray(Vl_t)).max() < 1e-3


def test_rule_n_fast_mode_statistics(sst, prcp):
    """Fast-mode Rule N matches exact-mode statistics on real data."""
    from xmca_tpu.xarray import xMCA
    m = xMCA(sst, prcp)
    m.solve()
    exact = np.asarray(m.rule_n(16, n_modes=10, seed=21))
    m.set_solver(spectrum='fast')
    fast = np.asarray(m.rule_n(16, n_modes=10, seed=21))
    assert fast.shape == exact.shape
    # same surrogate draws, approximate spectrum: close per entry
    assert_allclose(fast, exact, rtol=2e-2)
    assert_allclose(fast.mean(axis=1), exact.mean(axis=1), rtol=5e-3)


def test_analytic_gram_path(xy):
    """The Hilbert-in-the-Gram identity: G_Z = A G_X A^H, no FFT."""
    import jax
    from xmca_tpu.core.preprocess import analytic_signal
    from xmca_tpu.core.fastpath import (hilbert_imag_matrix,
                                        analytic_temporal_gram,
                                        temporal_gram,
                                        fast_rotated_variance_analytic)
    Xl, Xr = xy
    n = Xl.shape[0]
    H = jnp.asarray(hilbert_imag_matrix(n, np.float64))

    # analytic operator: x + iHx == scipy-style analytic signal
    z_ref = np.asarray(analytic_signal(jnp.asarray(Xl)))
    z_mat = Xl + 1j * np.asarray(H @ Xl)
    assert np.abs(z_ref - z_mat).max() < 1e-10

    Gz_ref = np.asarray(temporal_gram(jnp.asarray(z_ref), 1e-12))
    Gz_mat = np.asarray(
        analytic_temporal_gram(jnp.asarray(Xl), H, 1e-12)
    )
    assert (np.abs(Gz_ref - Gz_mat).max() / np.abs(Gz_ref).max()) < 1e-10

    # end-to-end complex rotated variance vs the exact dense pipeline
    from xmca_tpu.core.solver import solve_rotated_variance
    Zl = analytic_signal(jnp.asarray(Xl))
    Zr = analytic_signal(jnp.asarray(Xr))
    var_e, conv_e = solve_rotated_variance(Zl, Zr, n_rot=8, power=1)
    var_a, conv_a = fast_rotated_variance_analytic(
        jnp.asarray(Xl), jnp.asarray(Xr), H, jax.random.PRNGKey(5),
        n_rot=8, power=1, n_iter=12,
    )
    assert bool(conv_e) and bool(conv_a)
    assert_allclose(np.asarray(var_a), np.asarray(var_e), rtol=2e-3)


def test_fast_solve_truncated_totals_analytic(xy):
    """Fold-based truncated complexified solve == materialized-Z solve."""
    from xmca_tpu.core.preprocess import analytic_signal
    from xmca_tpu.core.fastpath import (
        hilbert_imag_matrix, fast_solve_truncated_totals,
        fast_solve_truncated_totals_analytic)
    Xl, Xr = xy
    n = Xl.shape[0]
    H = jnp.asarray(hilbert_imag_matrix(n, np.float64))
    Zl = analytic_signal(jnp.asarray(Xl))
    Zr = analytic_signal(jnp.asarray(Xr))
    key = jax.random.PRNGKey(9)
    s_z, Vl_z, Vr_z, tc_z, ts_z = fast_solve_truncated_totals(
        Zl, Zr, key, n_modes=8, n_iter=12
    )
    s_a, Vl_a, Vr_a, tc_a, ts_a = fast_solve_truncated_totals_analytic(
        jnp.asarray(Xl), jnp.asarray(Xr), H, key, n_modes=8, n_iter=12
    )
    assert_allclose(np.asarray(s_a), np.asarray(s_z), rtol=1e-8)
    assert float(tc_a) == pytest.approx(float(tc_z), rel=1e-6)
    assert float(ts_a) == pytest.approx(float(ts_z), rel=1e-8)
    # identical subspace iterates up to roundoff: vectors match without
    # any phase alignment
    assert np.abs(np.asarray(Vl_a) - np.asarray(Vl_z)).max() < 1e-6
    assert np.abs(np.asarray(Vr_a) - np.asarray(Vr_z)).max() < 1e-6


def test_rule_n_fast_complex_uses_analytic(sst, prcp):
    """Fast complex Rule N (analytic Gram path) is statistically sane."""
    from xmca_tpu.xarray import xMCA
    m = xMCA(sst, prcp)
    m.solve(complexify=True)
    m.set_solver(spectrum='fast')
    fast = np.asarray(m.rule_n(8, n_modes=10, seed=3))
    assert fast.shape[0] == 10
    assert np.isfinite(fast).all() and (fast > 0).all()


def test_nuclear_norm_surrogate(xy):
    """The cheap 24-step default-precision variant that rescales
    surrogate totals must sit within ~1e-3 of the exact sum (its
    contract — the Monte-Carlo quantiles it feeds have ~6% noise)."""
    from xmca_tpu.core.fastpath import nuclear_norm_surrogate
    Xl, Xr = xy
    s_exact = np.asarray(solve_svals(jnp.asarray(Xl), jnp.asarray(Xr)))
    M, _, _ = reduced_kernel(jnp.asarray(Xl), jnp.asarray(Xr), 1e-12)
    nn = float(nuclear_norm_surrogate(M))
    assert abs(nn - s_exact.sum()) / s_exact.sum() < 1e-3


def test_bf16_gram_symmetric_under_fused_jit():
    """A Gram whose bf16 operand is itself a fused computation must stay
    numerically symmetric (hence Cholesky-safe) under jit.

    XLA can duplicate the fused producer (draw + centering) into each
    dot operand with different intermediate precision; the two copies
    then differ by an input ULP and the 'Gram' goes indefinite past the
    jitter floor (NaN Cholesky masked WHOLE Rule-N ensembles at fixture
    scale).  ``_materialize_gram_operand`` pins one materialization."""
    from xmca_tpu.core.fastpath import (analytic_temporal_gram,
                                        hilbert_imag_matrix)
    from xmca_tpu.ops.surrogate import bits_field

    n_obs, p = 492, 155
    H = hilbert_imag_matrix(n_obs, jnp.float32)

    @jax.jit
    def stage(seed):
        X = bits_field(seed, (n_obs, p), dist='normal16')
        X = X - jnp.mean(X, axis=0, dtype=jnp.float32).astype(X.dtype)
        G = analytic_temporal_gram(X, H)
        return G, jnp.linalg.cholesky(G)

    G, L = stage(jnp.asarray(-2506509236 & 0x7FFFFFFF, dtype=jnp.int32))
    G = np.asarray(G)
    herm_dev = np.abs(G - G.conj().T).max()
    scale = np.abs(np.diagonal(G)).mean()
    assert herm_dev / scale < 1e-5
    assert np.isfinite(np.asarray(L)).all()
