"""Cross-checks of the fastpath stage-split ensemble surface."""
import numpy as np
import jax.numpy as jnp
from numpy.testing import assert_allclose


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


def test_stage_split_loadings_match_fused_real():
    """fast_rotated_loadings (real stage-A) + stage-B reproduce the
    fused fast_rotated_variance for real fields."""
    import jax
    from xmca_tpu.core.fastpath import (
        fast_rotated_variance, fast_rotated_loadings,
        rotated_variance_from_loadings,
    )
    rng = np.random.default_rng(5)
    n, p = 200, 600
    X = rng.standard_normal((n, p)).astype(np.float64)
    Y = rng.standard_normal((n, p)).astype(np.float64)
    X -= X.mean(0)
    Y -= Y.mean(0)
    key = jax.random.PRNGKey(1)

    var_fused, conv_fused = fast_rotated_variance(
        jnp.asarray(X), jnp.asarray(Y), key, n_rot=6, n_iter=10,
    )
    L = fast_rotated_loadings(
        jnp.asarray(X), jnp.asarray(Y), key, n_rot=6, n_iter=10,
    )
    var_split, conv_split = rotated_variance_from_loadings(L, p)
    assert bool(conv_fused) and bool(conv_split)
    assert_allclose(np.asarray(var_split), np.asarray(var_fused),
                    rtol=1e-8)
