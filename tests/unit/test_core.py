"""Property tests of the jitted numerical core against NumPy/SciPy."""
import numpy as np
import jax.numpy as jnp
import pytest
from numpy.testing import assert_allclose

from xmca_tpu.core.linalg import (field_decomposition,
                                  randomized_decomposition)
from xmca_tpu.core.preprocess import analytic_signal, exp_forecast
from xmca_tpu.core.rotation import varimax, promax
from xmca_tpu.core.solver import (solve_mca, solve_pca, solve_svals,
                                  solve_rotated_variance)
from xmca_tpu.core.theta import theta_forecast


@pytest.fixture(scope='module')
def xy():
    rng = np.random.default_rng(0)
    n, pl, pr = 200, 80, 60
    Xl = rng.standard_normal((n, pl))
    Xr = rng.standard_normal((n, pr))
    return Xl - Xl.mean(0), Xr - Xr.mean(0)


def np_reference_solve(Xl, Xr):
    """Reference algorithm re-derived in NumPy (SURVEY.md section 3.2)."""
    dof = Xl.shape[0] - 1
    kl, ll, mlt = np.linalg.svd(Xl, full_matrices=False)
    kr, lr, mrt = np.linalg.svd(Xr, full_matrices=False)
    kernel = (kl * ll).conj().T @ (kr * lr) / dof
    VL, s, VTR = np.linalg.svd(kernel, full_matrices=False)
    return s, mlt.conj().T @ VL, mrt.conj().T @ VTR.conj().T


def np_reference_varimax(A, gamma=1, max_iter=1000, tol=1e-8):
    """Reference varimax re-derived in NumPy (tools/rotation.py:15-78)."""
    A = A.copy()
    n, p = A.shape
    R = np.eye(p)
    d = 0
    h = np.sqrt(np.sum(A * A.conjugate(), axis=1))
    A = (1. / h)[:, None] * A
    for _ in range(max_iter):
        d_old = d
        basis = A @ R
        transformed = A.conjugate().T @ (
            basis ** 2 * basis.conjugate()
            - (gamma / n) * (basis @ np.diag(
                np.sum(basis * basis.conjugate(), axis=0)))
        )
        u, s, vh = np.linalg.svd(transformed)
        R = u @ vh
        d = np.sum(s)
        if abs(d - d_old) / d < tol:
            break
    A = h[:, None] * A
    return A @ R, R


@pytest.mark.parametrize('shape', [(200, 80), (80, 200), (50, 50)])
@pytest.mark.parametrize('method', ['gram', 'svd'])
def test_field_decomposition(shape, method):
    rng = np.random.default_rng(1)
    X = rng.standard_normal(shape)
    K, L, M = field_decomposition(jnp.asarray(X), method)
    r = min(shape)
    assert K.shape == (shape[0], r)
    assert L.shape == (r,)
    assert M.shape == (shape[1], r)
    # reconstruction + orthonormality
    assert_allclose(np.asarray((K * L) @ M.conj().T), X, atol=1e-9)
    assert_allclose(
        np.asarray(K.conj().T @ K), np.eye(r), atol=1e-9
    )
    s_ref = np.linalg.svd(X, compute_uv=False)
    assert_allclose(np.asarray(L), s_ref, atol=1e-9)


def test_field_decomposition_complex():
    rng = np.random.default_rng(2)
    X = rng.standard_normal((100, 40)) + 1j * rng.standard_normal((100, 40))
    K, L, M = field_decomposition(jnp.asarray(X), 'gram')
    assert_allclose(np.asarray((K * L) @ M.conj().T), X, atol=1e-9)


def test_randomized_decomposition():
    import jax
    rng = np.random.default_rng(3)
    # low effective rank + decaying tail
    U = np.linalg.qr(rng.standard_normal((300, 20)))[0]
    V = np.linalg.qr(rng.standard_normal((150, 20)))[0]
    s = np.geomspace(100, 0.1, 20)
    X = (U * s) @ V.T
    K, L, M = randomized_decomposition(
        jnp.asarray(X), jax.random.PRNGKey(0), n_modes=10, n_iter=3
    )
    assert_allclose(np.asarray(L), s[:10], rtol=1e-6)


def test_solve_matches_reference_math(xy):
    Xl, Xr = xy
    s_ref, Vl_ref, Vr_ref = np_reference_solve(Xl, Xr)
    for method in ['gram', 'svd']:
        s, Vl, Vr = solve_mca(jnp.asarray(Xl), jnp.asarray(Xr),
                              method=method)
        assert_allclose(np.asarray(s), s_ref, atol=1e-10)
        ph = np.sign(np.sum(np.asarray(Vl) * Vl_ref, axis=0))
        assert_allclose(np.asarray(Vl) * ph, Vl_ref, atol=1e-9)
        assert_allclose(np.asarray(Vr) * ph, Vr_ref, atol=1e-9)


def test_solve_pca_matches_reference_math(xy):
    Xl, _ = xy
    s_ref, Vl_ref, _ = np_reference_solve(Xl, Xl)
    s, V = solve_pca(jnp.asarray(Xl))
    assert_allclose(np.asarray(s), s_ref, atol=1e-10)


def test_solve_svals_path(xy):
    Xl, Xr = xy
    s_ref, _, _ = np_reference_solve(Xl, Xr)
    s = solve_svals(jnp.asarray(Xl), jnp.asarray(Xr))
    assert_allclose(np.asarray(s), s_ref, atol=1e-10)


def test_hilbert_matches_scipy(xy):
    from scipy.signal import hilbert
    Xl, _ = xy
    for n in [Xl.shape[0], Xl.shape[0] - 1]:  # even and odd lengths
        ours = np.asarray(analytic_signal(jnp.asarray(Xl[:n])))
        ref = hilbert(Xl[:n], axis=0)
        assert_allclose(ours, ref, atol=1e-12)


def test_hilbert_circulant_long_axis_matches_scipy():
    """The > _HILBERT_MATMUL_MAX_N route: power-of-two-FFT circular
    convolution (TPU's exact long-time-axis path), space chunked."""
    from scipy.signal import hilbert
    from xmca_tpu.core.preprocess import _analytic_signal_circulant
    rng = np.random.default_rng(3)
    for n in (777, 1000):            # odd + even, both non-power-of-two
        X = rng.standard_normal((n, 13))
        ours = np.asarray(_analytic_signal_circulant(
            jnp.asarray(X), chunk=5   # force the chunked branch
        ))
        assert_allclose(ours, hilbert(X, axis=0), atol=1e-10)


def test_varimax_matches_reference_math(xy):
    Xl, Xr = xy
    s, Vl, Vr = np_reference_solve(Xl, Xr)
    L = np.concatenate([Vl[:, :10], Vr[:, :10]]) * np.sqrt(s[:10])
    B_ref, R_ref = np_reference_varimax(L)
    B, R, converged, n_iter = varimax(jnp.asarray(L))
    assert bool(converged)
    assert_allclose(np.asarray(B), B_ref, atol=1e-8)
    assert_allclose(np.asarray(R), R_ref, atol=1e-8)


def test_varimax_complex_matches_reference_math(xy):
    rng = np.random.default_rng(4)
    Xl, Xr = xy
    s, Vl, Vr = np_reference_solve(Xl, Xr)
    L = np.concatenate([Vl[:, :8], Vr[:, :8]]) * np.sqrt(s[:8])
    L = L + 0.1j * rng.standard_normal(L.shape)
    B_ref, _ = np_reference_varimax(L)
    B, _, converged, _ = varimax(jnp.asarray(L))
    assert bool(converged)
    assert_allclose(np.asarray(B), B_ref, atol=1e-7)


def test_promax_properties(xy):
    Xl, Xr = xy
    s, Vl, Vr = np_reference_solve(Xl, Xr)
    L = np.concatenate([Vl[:, :10], Vr[:, :10]]) * np.sqrt(s[:10])
    B, R, phi, converged, _ = promax(jnp.asarray(L), power=4)
    assert bool(converged)
    phi = np.asarray(phi)
    # phi is a correlation-like hermitian matrix with unit diagonal
    assert_allclose(np.diag(phi), np.ones(10), atol=1e-8)
    assert_allclose(phi, phi.conj().T, atol=1e-10)
    # oblique: phi differs from identity
    assert np.abs(phi - np.eye(10)).max() > 1e-3


def test_varimax_mode_space_identity():
    """space='mode' is an EXACT rewrite of the data-space fixed point:
    the criterion is a cubic form in R against the one-time
    fourth-moment tensor of the Kaiser-normalized stack, so a tall
    loading stack iterates p-independently (the TPU surrogate-ensemble
    default).  Same iterates to roundoff -> same B/R/iteration count."""
    rng = np.random.default_rng(11)
    modes = rng.standard_normal((2000, 6)) @ np.diag(
        [5.0, 4.0, 2.5, 1.5, 0.8, 0.4]
    )
    for make in (lambda: modes,
                 lambda: modes + 0.2j * rng.standard_normal(modes.shape)):
        L = jnp.asarray(make())
        B_d, R_d, conv_d, it_d = varimax(L, space='data')
        B_m, R_m, conv_m, it_m = varimax(L, space='mode')
        assert bool(conv_d) and bool(conv_m)
        assert int(it_d) == int(it_m)
        assert_allclose(np.asarray(B_m), np.asarray(B_d), atol=1e-8)
        assert_allclose(np.asarray(R_m), np.asarray(R_d), atol=1e-8)
    # quartimax-leaning gamma exercises the G2-term bookkeeping
    L = jnp.asarray(modes)
    B_d, _, _, _ = varimax(L, gamma=0.5, space='data')
    B_m, _, _, _ = varimax(L, gamma=0.5, space='mode')
    assert_allclose(np.asarray(B_m), np.asarray(B_d), atol=1e-8)


def test_promax_mode_space_identity():
    rng = np.random.default_rng(12)
    L = jnp.asarray(
        rng.standard_normal((2000, 6)) * np.geomspace(5, 0.5, 6)
        + 0.1j * rng.standard_normal((2000, 6))
    )
    out_d = promax(L, power=4, space='data')
    out_m = promax(L, power=4, space='mode')
    for a, b in zip(out_d[:3], out_m[:3]):
        assert_allclose(np.asarray(b), np.asarray(a), atol=1e-8)


def test_varimax_ensemble_space_gate():
    from xmca_tpu.core.rotation import ensemble_space
    assert ensemble_space(200_000, 10, 8) == 'mode'
    assert ensemble_space(200, 10, 8) == 'data'        # short stack
    assert ensemble_space(200_000, 64, 8) == 'data'    # too many modes
    assert ensemble_space(10_000_000, 32, 16) == 'data'  # intermediate > 512MB


def test_varimax_default_space_is_data():
    """The public default stays 'data': at f32 the mode-space quartic
    contraction adds ~1e-3 iterate noise (measured), which would break
    the save->load / streamed==resident reproducibility contracts that
    hold at ~1e-5.  Only the generated-null surrogate pipelines opt in."""
    rng = np.random.default_rng(13)
    L = jnp.asarray(rng.standard_normal((4000, 6)))   # tall: gate says mode
    B_def, R_def, _, it_def = varimax(L)
    B_dat, R_dat, _, it_dat = varimax(L, space='data')
    assert int(it_def) == int(it_dat)
    assert np.array_equal(np.asarray(B_def), np.asarray(B_dat))


def test_exp_forecast_continues_trend():
    t = np.arange(200, dtype=np.float64)
    field = np.stack([2.0 * t + 5.0, -1.5 * t + 3.0], axis=1)
    fc = np.asarray(exp_forecast(jnp.asarray(field), 10.0))
    # extension continues from the last *fitted* value: step k of the
    # extension equals y(n-1+k) (reference convention, xmca/array.py:409)
    expected_last = np.array([2.0 * 398 + 5.0, -1.5 * 398 + 3.0])
    assert_allclose(fc[-1], expected_last, rtol=1e-6)


def test_theta_forecast_sane():
    rng = np.random.default_rng(5)
    t = np.arange(240)
    seasonal = 3 * np.sin(2 * np.pi * t / 12)[:, None]
    trend = 0.05 * t[:, None]
    y = trend + seasonal + 0.1 * rng.standard_normal((240, 4))
    fc = np.asarray(theta_forecast(jnp.asarray(y), steps=48, period=12))
    assert fc.shape == (48, 4)
    assert np.isfinite(fc).all()
    # continues the trend within a reasonable band
    expected_mid = 0.05 * (240 + 24)
    assert np.abs(fc.mean() - expected_mid) < 2.0


def test_rotated_variance_masks_and_sorts(xy):
    Xl, Xr = xy
    var, converged = solve_rotated_variance(
        jnp.asarray(Xl), jnp.asarray(Xr), n_rot=10, power=1
    )
    var = np.asarray(var)
    assert bool(converged)
    assert (np.diff(var) <= 1e-12).all()
    assert (var > 0).all()


def test_kernel_svd_polar_both_orientations():
    """The TPU polar-SVD route must handle tall, square AND wide
    kernels (bivariate fields with different NaN masks produce
    rectangular kernels — found by tutorial/quickstart.py on chip)."""
    from xmca_tpu.core.linalg import _kernel_svd_polar
    rng = np.random.default_rng(8)
    for shape in ((40, 25), (25, 25), (25, 40)):
        for cplx in (False, True):
            K = rng.standard_normal(shape)
            if cplx:
                K = K + 1j * rng.standard_normal(shape)
            U, s, Vh = _kernel_svd_polar(jnp.asarray(K))
            s_ref = np.linalg.svd(K, compute_uv=False)
            assert_allclose(np.asarray(s), s_ref, atol=1e-10)
            # exact reconstruction + orthonormality
            rec = np.asarray(U) * np.asarray(s) @ np.asarray(Vh)
            assert_allclose(rec, K, atol=1e-9)
            assert_allclose(
                np.asarray(U).conj().T @ np.asarray(U),
                np.eye(min(shape)), atol=1e-10,
            )
            assert_allclose(
                np.asarray(Vh) @ np.asarray(Vh).conj().T,
                np.eye(min(shape)), atol=1e-10,
            )
            s_only = _kernel_svd_polar(jnp.asarray(K), compute_uv=False)
            assert_allclose(np.asarray(s_only), s_ref, atol=1e-10)


def test_ns_polar_survives_large_mode_spread_f32():
    """Loading stacks with a ~20x column-scale spread (360x variance)
    drove the fixed-count Newton-Schulz polar contractive on the
    trailing subspace, collapsing those columns of R to exact zero at
    north-star scale in f32.  The convergence-gated NS (what the public
    TPU rotate and the bootstrap ensembles use) must keep R unitary and
    every rotated column alive.  (With polar_method='ns' this input
    demonstrably collapses — which is exactly why noise-only ensembles
    are the sole remaining 'ns' users.)"""
    import numpy as np
    import jax.numpy as jnp
    from xmca_tpu.core.rotation import varimax

    rng = np.random.default_rng(0)
    p, k = 4000, 10
    Q, _ = np.linalg.qr(rng.standard_normal((p, k)))
    scales = np.array([126.0] * 8 + [6.6] * 2)
    L = (Q * scales).astype(np.float32)

    B, R, converged, n_iter = varimax(
        jnp.asarray(L), polar_method='ns-gated'
    )
    R = np.asarray(R)
    orth = np.abs(R.conj().T @ R - np.eye(k)).max()
    assert orth < 1e-3
    col_norms = np.linalg.norm(np.asarray(B), axis=0)
    assert col_norms.min() > 1.0      # trailing modes survive rotation


def test_ns_fixed_count_parameterized():
    """'ns<k>' runs a k-step fixed-count Newton-Schulz polar — the
    short-count variant the loose-tolerance noise ensembles use.  Its
    validity envelope is sigma_min/||A||_F well above zero (noise
    varimax criteria sit at ~k^-1/2); inside that envelope 14 steps
    must deliver a unitary factor and the exact-SVD nuclear norm."""
    import numpy as np
    import jax.numpy as jnp
    from xmca_tpu.core.linalg import unitary_polar_factor

    rng = np.random.default_rng(3)
    Q1, _ = np.linalg.qr(rng.standard_normal((10, 10)))
    Q2, _ = np.linalg.qr(rng.standard_normal((10, 10)))
    s = np.linspace(0.5, 1.0, 10)       # sigma_min/fro ~ 0.2
    A = Q1 @ np.diag(s) @ Q2.T
    W14, d14 = unitary_polar_factor(jnp.asarray(A), method='ns14')
    Wsvd, dsvd = unitary_polar_factor(jnp.asarray(A), method='svd')
    W14 = np.asarray(W14)
    assert np.abs(W14.T @ W14 - np.eye(10)).max() < 1e-8
    assert abs(float(d14) - float(dsvd)) / float(dsvd) < 1e-8
    assert_allclose(W14, np.asarray(Wsvd), atol=1e-7)
