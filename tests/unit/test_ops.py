"""Pallas Gram kernel correctness (XLA-fallback path on CPU; the TPU
kernel itself is exercised on hardware via benchmarks)."""
import numpy as np
import jax.numpy as jnp
from numpy.testing import assert_allclose

from xmca_tpu.ops.gram import fused_center_gram, gram_matmul


def test_fused_center_gram_matches_reference():
    rng = np.random.default_rng(0)
    n, p, q = 96, 130, 70
    X = rng.standard_normal((n, p)).astype(np.float32)
    Y = rng.standard_normal((n, q)).astype(np.float32)
    mu_x = X.mean(0)
    mu_y = Y.mean(0)
    w_x = rng.uniform(0.5, 2.0, p).astype(np.float32)
    w_y = rng.uniform(0.5, 2.0, q).astype(np.float32)

    out = np.asarray(fused_center_gram(
        jnp.asarray(X), jnp.asarray(Y), jnp.asarray(mu_x),
        jnp.asarray(mu_y), jnp.asarray(w_x), jnp.asarray(w_y),
    ))
    ref = ((X - mu_x) * w_x).T @ ((Y - mu_y) * w_y)
    assert_allclose(out, ref, rtol=1e-5, atol=1e-4)


def test_gram_matmul_plain():
    rng = np.random.default_rng(1)
    X = rng.standard_normal((64, 40)).astype(np.float32)
    Y = rng.standard_normal((64, 24)).astype(np.float32)
    out = np.asarray(gram_matmul(jnp.asarray(X), jnp.asarray(Y)))
    assert_allclose(out, X.T @ Y, rtol=1e-5, atol=1e-4)


def test_stage_split_loadings_match_fused():
    """fast_rotated_loadings_analytic + rotated_variance_from_loadings
    reproduce the fused fast_rotated_variance_analytic."""
    import jax
    from xmca_tpu.core.fastpath import (
        hilbert_imag_matrix, fast_rotated_variance_analytic,
        fast_rotated_loadings_analytic, rotated_variance_from_loadings,
    )
    rng = np.random.default_rng(2)
    n, p = 200, 600
    X = rng.standard_normal((n, p)).astype(np.float64)
    Y = rng.standard_normal((n, p)).astype(np.float64)
    X -= X.mean(0)
    Y -= Y.mean(0)
    H = jnp.asarray(hilbert_imag_matrix(n, np.float64))
    key = jax.random.PRNGKey(0)

    var_fused, conv_fused = fast_rotated_variance_analytic(
        jnp.asarray(X), jnp.asarray(Y), H, key, n_rot=6, n_iter=10,
    )
    L = fast_rotated_loadings_analytic(
        jnp.asarray(X), jnp.asarray(Y), H, key, n_rot=6, n_iter=10,
    )
    var_split, conv_split = rotated_variance_from_loadings(L, p)
    assert bool(conv_fused) and bool(conv_split)
    assert_allclose(np.asarray(var_split), np.asarray(var_fused),
                    rtol=1e-8)
