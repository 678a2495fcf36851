"""Unit tests of the fused surrogate-generation ops (XLA fallback path).

On CPU these exercise the pure-XLA implementation of the same
distributions; the Pallas kernels themselves are verified on a real
chip by ``python scripts/tpu_checks.py`` (surrogate_field regenerates
the exact tiles the fused kernels consume, on any backend).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from xmca_tpu.ops.surrogate import (centered_gram_from_raw,
                                    surrogate_field, surrogate_gram,
                                    surrogate_project)


@pytest.mark.parametrize('dist', ['normal32', 'rademacher'])
def test_gram_matches_materialized_field(dist):
    n, p = 96, 400
    seed = jnp.int32(21)
    G, mu, u, mumu = surrogate_gram(seed, n, p, dist=dist)
    X = np.asarray(surrogate_field(seed, n, p, dist=dist)).astype(
        np.float64
    )
    np.testing.assert_allclose(np.asarray(G), X @ X.T, atol=1e-3)
    np.testing.assert_allclose(np.asarray(mu), X.mean(0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(u), X @ X.mean(0), atol=1e-4)


@pytest.mark.parametrize('dist', ['normal32', 'rademacher'])
def test_centering_correction_is_exact_algebra(dist):
    n, p = 64, 300
    seed = jnp.int32(5)
    G, mu, u, mumu = surrogate_gram(seed, n, p, dist=dist)
    Gc = np.asarray(centered_gram_from_raw(G, u, mumu))
    X = np.asarray(surrogate_field(seed, n, p, dist=dist)).astype(
        np.float64
    )
    Xc = X - X.mean(0)
    np.testing.assert_allclose(
        Gc, Xc @ Xc.T, atol=1e-3 * abs(Gc).max()
    )


def test_project_matches_materialized_field():
    n, p, m = 80, 256, 7
    seed = jnp.int32(9)
    S = np.random.default_rng(0).standard_normal((n, m)).astype(
        np.float32
    )
    V = np.asarray(surrogate_project(seed, jnp.asarray(S), n, p))
    X = np.asarray(surrogate_field(seed, n, p)).astype(np.float64)
    # the kernel contracts in bfloat16 (surrogate-grade precision)
    Sb = np.asarray(
        jnp.asarray(S).astype(jnp.bfloat16).astype(jnp.float32)
    ).astype(np.float64)
    ref = X.T @ Sb
    np.testing.assert_allclose(V, ref, atol=2e-2 * abs(ref).max())


def test_same_seed_regenerates_same_field():
    a = np.asarray(surrogate_field(jnp.int32(3), 32, 64))
    b = np.asarray(surrogate_field(jnp.int32(3), 32, 64))
    c = np.asarray(surrogate_field(jnp.int32(4), 32, 64))
    assert (a == b).all()
    assert (a != c).any()


@pytest.mark.parametrize('dist', ['normal32', 'rademacher'])
def test_draw_moments(dist):
    X = np.asarray(
        surrogate_field(jnp.int32(17), 256, 2048, dist=dist)
    ).astype(np.float64)
    assert abs(X.mean()) < 5e-3
    assert abs(X.var() - 1.0) < 5e-3
    if dist == 'normal32':
        # Binomial(32, 1/2) standardized: skew 0, excess kurtosis -1/16
        flat = X.ravel()
        assert abs((flat ** 3).mean()) < 2e-2
        assert abs((flat ** 4).mean() - (3.0 - 1.0 / 16.0)) < 5e-2


def test_bits_field_normal16_moments():
    """The production draw: standardized Binomial(16, 1/2) from 16-bit
    random words (half the generated bits of normal32)."""
    from xmca_tpu.ops.surrogate import bits_field
    X = np.asarray(
        bits_field(jnp.int32(23), (256, 2048))
    ).astype(np.float64)
    assert abs(X.mean()) < 5e-3
    assert abs(X.var() - 1.0) < 5e-3
    flat = X.ravel()
    assert abs((flat ** 3).mean()) < 2e-2
    assert abs((flat ** 4).mean() - (3.0 - 1.0 / 8.0)) < 5e-2


def test_gen_surrogate_variance_matches_draw_statistics():
    """Generated vs drawn Rule-N nulls agree in distribution."""
    from xmca_tpu.core.fastpath import (fast_surrogate_variance_gen,
                                        hilbert_imag_matrix)
    from xmca_tpu.stats import significance as sig

    n, pl_, pr = 128, 96, 80
    H = jnp.asarray(hilbert_imag_matrix(n, np.float32))
    gen = []
    for s in range(20):
        var, total, conv = fast_surrogate_variance_gen(
            jnp.int32(1000 + s), jax.random.PRNGKey(s), n, (pl_, pr),
            H=H, complexify=True, rotated=True, n_rot=5, n_iter=10,
        )
        assert bool(conv)
        gen.append(np.asarray(var))
    gen = np.stack(gen)

    spectra, _ = sig.rule_n_spectra(
        n, (pl_, pr), 20, complexify=True, rotated=True, n_rot=5,
        dtype=np.float32, seed=7, spectrum='fast', subspace_iters=10,
    )
    drawn = np.asarray(spectra)
    # medians of the leading-mode null within each other's spread
    g, d = np.median(gen[:, 0]), np.median(drawn[:, 0])
    spread = drawn[:, 0].std() + gen[:, 0].std()
    assert abs(g - d) < 2.0 * spread


def test_int8_centered_gram_is_exact():
    """The s8 raw Gram + rank-1 centering equals the dense centered
    Gram of the same ±1 field, to f32 roundoff of the correction."""
    from xmca_tpu.core.fastpath import _int8_centered_gram
    from xmca_tpu.ops.surrogate import bits_field

    n, p = 200, 333
    X8 = bits_field(jnp.int32(5), (n, p), dist='rademacher8')
    assert X8.dtype == jnp.int8
    Xf = np.asarray(X8).astype(np.float64)
    assert set(np.unique(Xf)) == {-1.0, 1.0}

    Gc, mu, Xb = _int8_centered_gram(X8)
    Xc = Xf - Xf.mean(0)
    ref = Xc @ Xc.T
    err = np.abs(np.asarray(Gc) - ref).max() / np.abs(ref).max()
    assert err < 1e-5
    np.testing.assert_allclose(np.asarray(mu), Xf.mean(0), atol=1e-6)
    assert Xb.dtype == jnp.bfloat16


def test_int8_surrogate_variance_matches_draw_statistics():
    """int8-Gram Rule-N nulls agree in distribution with the drawn
    Gaussian ensemble (two-moment universality)."""
    from xmca_tpu.core.fastpath import (fast_surrogate_variance_int8,
                                        hilbert_imag_matrix)
    from xmca_tpu.stats import significance as sig

    n, pl_, pr = 128, 96, 80
    H = jnp.asarray(hilbert_imag_matrix(n, np.float32))
    gen = []
    for s in range(20):
        var, total, conv = fast_surrogate_variance_int8(
            jnp.int32(2000 + s), jax.random.PRNGKey(s), n, (pl_, pr),
            H=H, complexify=True, rotated=True, n_rot=5, n_iter=10,
        )
        assert bool(conv)
        assert np.isfinite(np.asarray(var)).all()
        gen.append(np.asarray(var))
    gen = np.stack(gen)

    spectra, _ = sig.rule_n_spectra(
        n, (pl_, pr), 20, complexify=True, rotated=True, n_rot=5,
        dtype=np.float32, seed=7, spectrum='fast', subspace_iters=10,
    )
    drawn = np.asarray(spectra)
    g, d = np.median(gen[:, 0]), np.median(drawn[:, 0])
    spread = drawn[:, 0].std() + gen[:, 0].std()
    assert abs(g - d) < 2.0 * spread


def test_rulen_generated_rademacher8_end_to_end():
    """The public generated pipeline accepts dist='rademacher8'."""
    from xmca_tpu.stats import significance as sig
    spectra, totals = sig.rule_n_spectra(
        96, (64, 48), 6, complexify=True, rotated=True, n_rot=4,
        dtype=np.float32, seed=3, spectrum='fast', subspace_iters=8,
        surrogate_source='generated', surrogate_dist='rademacher8',
    )
    assert spectra.shape[1] == 4 and np.isfinite(spectra).all()
    assert np.isfinite(totals).all() and (totals > 0).all()


def test_rulen_generated_runs_per_dispatch_matches_dispatched():
    """lax.map-fused Rule-N (runs_per_dispatch=k) returns the SAME runs
    as the per-run dispatched path at the same seed — including the
    cyclically padded short final batch (13 runs at k=5)."""
    from xmca_tpu.stats import significance as sig
    kw = dict(complexify=True, rotated=True, n_rot=4, dtype=np.float32,
              seed=3, spectrum='fast', subspace_iters=8,
              surrogate_source='generated', surrogate_dist='normal16')
    s1, t1 = sig.rule_n_spectra(96, (64, 48), 13, **kw)
    s2, t2 = sig.rule_n_spectra(96, (64, 48), 13,
                                runs_per_dispatch=5, **kw)
    assert s1.shape == s2.shape
    np.testing.assert_allclose(s1, s2, rtol=0, atol=0)
    np.testing.assert_allclose(t1, t2, rtol=0, atol=0)


def test_bits_field_rademacher1_distribution():
    """'rademacher1' expands one random bit per element into the same
    +-1 int8 distribution as 'rademacher8' (fair independent signs)."""
    from xmca_tpu.ops.surrogate import bits_field

    n, p = 256, 1001                     # p % 8 != 0: exercises the pad
    X = bits_field(jnp.int32(9), (n, p), dist='rademacher1')
    assert X.shape == (n, p) and X.dtype == jnp.int8
    Xf = np.asarray(X).astype(np.float64)
    assert set(np.unique(Xf)) == {-1.0, 1.0}
    # fair signs: mean ~ 0 at the 5-sigma level of n*p Bernoulli trials
    m = Xf.mean()
    assert abs(m) < 5.0 / np.sqrt(n * p)
    # the 8 bit positions of one byte must be independent columns, not
    # copies: adjacent-column correlation stays at noise level
    corr = (Xf[:, :-1] * Xf[:, 1:]).mean()
    assert abs(corr) < 5.0 / np.sqrt(n * (p - 1))
    # column means individually unbiased (catches a bit-order bug that
    # would constant-bias a position)
    col_m = np.abs(Xf.mean(axis=0))
    assert np.quantile(col_m, 0.99) < 4.0 / np.sqrt(n)


def test_rulen_generated_rademacher1_end_to_end():
    """The public generated pipeline accepts dist='rademacher1'."""
    from xmca_tpu.stats import significance as sig
    spectra, totals = sig.rule_n_spectra(
        96, (64, 48), 6, complexify=True, rotated=True, n_rot=4,
        dtype=np.float32, seed=3, spectrum='fast', subspace_iters=8,
        surrogate_source='generated', surrogate_dist='rademacher1',
    )
    assert spectra.shape[1] == 4 and np.isfinite(spectra).all()
    assert np.isfinite(totals).all() and (totals > 0).all()


def test_sign_field_sums_mask_and_sums():
    """sign_field_sums: +-1 in the live region, zero in the pads, and
    the returned column sums equal the masked field's column sums
    exactly (the fallback path; the TPU kernel's invariants are
    asserted on-chip by scripts/tpu_checks.py)."""
    from xmca_tpu.ops.surrogate import sign_field_sums

    n, p, n_pad, p_pad = 200, 3000, 512, 4096
    X, colsum = sign_field_sums(jnp.int32(11), n, p, n_pad, p_pad)
    assert X.shape == (n_pad, p_pad) and X.dtype == jnp.bfloat16
    assert colsum.shape == (p_pad,) and colsum.dtype == jnp.float32
    Xf = np.asarray(X).astype(np.float64)
    assert set(np.unique(Xf[:n, :p])) == {-1.0, 1.0}
    assert (Xf[n:] == 0).all() and (Xf[:, p:] == 0).all()
    np.testing.assert_array_equal(np.asarray(colsum), Xf.sum(axis=0))
    m = Xf[:n, :p].mean()
    assert abs(m) < 5.0 / np.sqrt(n * p)
    # determinism + seed sensitivity
    X2, _ = sign_field_sums(jnp.int32(11), n, p, n_pad, p_pad)
    X3, _ = sign_field_sums(jnp.int32(12), n, p, n_pad, p_pad)
    np.testing.assert_array_equal(np.asarray(X), np.asarray(X2))
    assert np.abs(np.asarray(X3) - np.asarray(X)).max() > 0


def test_gram_centering_identity_from_colsums():
    """The tri pipeline's centering algebra — w = G 1 / n and
    mu.mu = 1^T G 1 / n^2 — equals explicit centering exactly for
    +-1 fields (integer algebra below 2^24)."""
    rng = np.random.default_rng(5)
    n, p = 64, 300
    X = rng.choice([-1.0, 1.0], size=(n, p))
    G = X @ X.T
    w = G.sum(axis=1) / n
    mumu = w.sum() / n
    Gc = G - w[:, None] - w[None, :] + mumu
    Xc = X - X.mean(axis=0, keepdims=True)
    np.testing.assert_allclose(Gc, Xc @ Xc.T, atol=1e-9)


def test_syrk_matches_dense_exactly():
    """The Pallas triangle syrk (interpret mode on CPU) is EXACT for
    +-1 values: bf16 holds them exactly and the f32 accumulator is
    exact for partial sums < 2^24."""
    from xmca_tpu.ops.syrk import pad_to, syrk

    n, p = 96, 700
    n_pad, p_pad = pad_to(n, p)
    rng = np.random.default_rng(1)
    X = rng.choice([-1.0, 1.0], size=(n_pad, p_pad)).astype(np.float32)
    X[n:] = 0.0
    X[:, p:] = 0.0                     # zeroed pads like the pipeline
    G = np.asarray(syrk(jnp.asarray(X, jnp.bfloat16), interpret=True))
    ref = X @ X.T
    np.testing.assert_array_equal(G, ref)
    np.testing.assert_array_equal(G, G.T)


@pytest.mark.slow
def test_fast_surrogate_variance_tri_contract():
    """The triangle-Gram surrogate pipeline (the TPU production path)
    runs under Pallas interpret mode and returns a sorted, finite,
    converged spectrum — same contract as the int8 variant."""
    from xmca_tpu.core.fastpath import (fast_surrogate_variance_int8,
                                        fast_surrogate_variance_tri,
                                        hilbert_imag_matrix_device)

    k = jax.random.PRNGKey(0)
    H = hilbert_imag_matrix_device(96, np.float32)
    var, total, conv = fast_surrogate_variance_tri(
        jnp.int32(7), k, 96, (64, 48), H=H, complexify=True,
        rotated=True, n_rot=4, power=1, tol=1e-6, n_iter=8,
    )
    var = np.asarray(var)
    assert var.shape == (4,) and np.isfinite(var).all()
    assert (np.diff(var) <= 1e-12).all()       # sorted descending
    assert float(total) > 0 and bool(conv)
    # same null-model family as the int8 pipeline: totals of matched
    # configs agree to the Monte-Carlo scale of a single draw
    var8, total8, conv8 = fast_surrogate_variance_int8(
        jnp.int32(7), k, 96, (64, 48), H=H, complexify=True,
        rotated=True, n_rot=4, power=1, tol=1e-6, n_iter=8,
    )
    assert bool(conv8)
    assert abs(float(total) - float(total8)) < 0.5 * float(total8)
