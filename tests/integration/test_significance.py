"""Significance methods: smoke + semantics (reference
test_integration_xarray.py:535-592) plus determinism and mesh parity."""
import numpy as np
import pytest

from xmca_tpu.xarray import xMCA


@pytest.fixture(scope='module')
def solved(sst, prcp):
    m = xMCA(sst, prcp)
    m.solve()
    return m


@pytest.mark.parametrize(
    'uni,flavour,axis,replace,block_size,on_left,on_right,strategy', [
        ('uni', 'std', 0, True, 1, True, True, 'standard'),
        ('uni', 'std', 0, True, 1, False, False, 'standard'),
        ('uni', 'std', 0, True, 1, True, False, 'standard'),
        ('uni', 'cplx', 0, True, 1, True, False, 'standard'),
        ('uni', 'varmx', 0, True, 1, True, False, 'standard'),
        ('uni', 'std', 1, True, 1, True, False, 'standard'),
        ('uni', 'cplx', 1, False, 1, True, False, 'standard'),
        ('bi', 'std', 0, True, 1, True, False, 'standard'),
        ('bi', 'cplx', 0, True, 1, True, False, 'standard'),
        ('bi', 'varmx', 0, True, 1, True, False, 'standard'),
        ('bi', 'std', 1, True, 1, True, False, 'standard'),
        ('bi', 'cplx', 1, False, 1, True, False, 'standard'),
        ('bi', 'varmx', 0, False, 2, True, False, 'standard'),
        ('bi', 'varmx', 0, False, 3, True, False, 'standard'),
        ('bi', 'varmx', 0, False, 3, True, False, 'iterative'),
    ])
def test_significance_methods(sst, prcp, uni, flavour, axis, replace,
                              block_size, on_left, on_right, strategy):
    cplx = flavour == 'cplx'
    n_rot = 10 if flavour == 'varmx' else 0
    model = xMCA(sst) if uni == 'uni' else xMCA(sst, prcp)
    model.solve(complexify=cplx)
    if flavour == 'varmx':
        model.rotate(n_rot, tol=1e-5)

    model.rule_north(3)
    rn = model.rule_n(3, seed=11)
    assert np.isfinite(np.asarray(rn)).all()

    incorrect = (
        (uni == 'uni' and on_right)
        or (axis == 0 and sst.shape[0] % block_size != 0)
    )
    if incorrect:
        with pytest.raises(ValueError):
            model.bootstrapping(
                3, 3, axis, on_left, on_right, block_size, replace,
                strategy, True, seed=12,
            )
    else:
        bs = model.bootstrapping(
            n_runs=3, n_modes=3, axis=axis, on_left=on_left,
            on_right=on_right, block_size=block_size, replace=replace,
            strategy=strategy, disable_progress=True, seed=12,
        )
        assert bs.shape == (3, 3)
        assert np.isfinite(np.asarray(bs)).all()


def test_bootstrapping_invalid_axis(solved):
    with pytest.raises(ValueError):
        solved.bootstrapping(3, 3, axis=2, disable_progress=True)


def test_bootstrapping_block_divisibility(solved, sst):
    assert sst.shape[0] % 5 != 0
    with pytest.raises(ValueError):
        solved.bootstrapping(
            3, 3, axis=0, block_size=5, disable_progress=True
        )


@pytest.mark.slow
def test_bootstrapping_honors_ensemble_tol(sst, prcp, monkeypatch):
    """set_solver(ensemble_tol=...) governs the bootstrap rotation
    tolerance (same Monte-Carlo argument as rule_n), and a loose
    tolerance stays statistically consistent with the tight default."""
    from xmca_tpu.stats import significance as _sig

    seen = {}
    real = _sig.bootstrap_spectra

    def spy(*args, **kwargs):
        seen['tol'] = kwargs.get('tol')
        return real(*args, **kwargs)

    m = xMCA(sst, prcp)
    m.solve()
    m.rotate(4)

    import xmca_tpu.api.array as _arr
    monkeypatch.setattr(_arr._sig, 'bootstrap_spectra', spy)
    bs_tight = m.bootstrapping(4, 4, disable_progress=True, seed=3)
    assert seen['tol'] == pytest.approx(1e-8)      # CPU auto default

    m.set_solver(ensemble_tol=1e-3)
    bs_loose = m.bootstrapping(4, 4, disable_progress=True, seed=3)
    assert seen['tol'] == pytest.approx(1e-3)
    loose = np.asarray(bs_loose)
    tight = np.asarray(bs_tight)
    assert np.isfinite(loose).all()
    # same seed -> same resamples; individual runs stop rotating at
    # different points (per-entry shifts up to ~20% are expected), but
    # the ensemble STATISTICS the user consumes stay consistent
    mean_rel = np.abs(loose.mean(axis=1) - tight.mean(axis=1)) \
        / tight.mean(axis=1)
    assert mean_rel.max() < 0.15


def test_rule_n_shapes_and_scaling(solved):
    rn = np.asarray(solved.rule_n(4, seed=7))
    assert rn.shape[1] == 4
    # spectra are rescaled so each run's *full* spectrum sums to the true
    # total; the returned slice drops the surrogate's extra trailing modes
    # (surrogates use the unpacked variable counts, rank 162 > 155 — same
    # as the reference, xmca/array.py:1744-1769), so allow that tail.
    ref_sum = solved._get_variance().sum()
    sums = rn.sum(axis=0)
    assert (sums <= ref_sum * (1 + 1e-6)).all()
    np.testing.assert_allclose(sums, ref_sum, rtol=5e-3)


def test_rule_n_deterministic_with_seed(solved):
    a = np.asarray(solved.rule_n(3, seed=42))
    b = np.asarray(solved.rule_n(3, seed=42))
    np.testing.assert_array_equal(a, b)


def test_rule_n_rotated_shape(sst, prcp):
    m = xMCA(sst, prcp)
    m.solve()
    m.rotate(10)
    rn = np.asarray(m.rule_n(3, seed=1))
    assert rn.shape[0] == 10


def test_rule_n_mesh_batch_smaller_than_devices(sst, prcp):
    """Sharded ensembles whose final batch has fewer runs than devices.

    Regression: padding a 3-run batch to an 8-device multiple used to
    concatenate only `kb[:pad]` (3 rows when 5 were needed), producing a
    6-row batch that is not divisible by the mesh axis and crashing
    ``jax.device_put``.  Keys must be tiled cyclically instead.
    """
    import jax
    from xmca_tpu.parallel import make_mesh

    mesh = make_mesh(ensemble=len(jax.devices()))
    m = xMCA(sst, prcp)
    m.solve()
    unsharded = np.asarray(m.rule_n(3, seed=21))
    m.set_solver(mesh=mesh)
    sharded = np.asarray(m.rule_n(3, seed=21))
    assert sharded.shape == unsharded.shape
    # GSPMD partitioning changes contraction/reduction order; fixtures are
    # f32 so per-run spectra agree to f32 roundoff, not bitwise
    np.testing.assert_allclose(sharded, unsharded, rtol=1e-4)


@pytest.mark.slow
def test_rule_n_generated_mesh_matches_unsharded(sst, prcp):
    """The generated (bit-transform-draw) ensemble honors a mesh.

    Per-run seeds determine each surrogate (the per-run generator call
    is lane-local, never itself sharded), so GSPMD sharding of the
    ensemble axis must not change results: sharded and unsharded agree
    run-for-run to f32 roundoff WHEN BOTH USE THE SAME BATCH SIZE.
    Batch size is held fixed because the batched-vs-unbatched vmap
    LOWERING legitimately differs in accumulation bits, and the fast
    noise spectrum (randomized subspace iteration on a near-flat
    Marchenko-Pastur spectrum; varimax on near-degenerate modes)
    amplifies one ulp to percent-level per-run wiggle — that cross-
    batch statistical equivalence is covered by
    test_rule_n_ensemble_tol_override's quantile contract.
    This asserts the CPU lowering; 'rbg' bit streams are
    implementation-defined per backend, so cross-BACKEND equality is
    not claimed — only sharded-vs-unsharded consistency within one."""
    import jax
    from xmca_tpu.parallel import make_mesh

    n_dev = len(jax.devices())

    def ensembles(mesh):
        m = xMCA(sst, prcp)
        m.set_solver(spectrum='fast', surrogate_source='generated',
                     batch_size=n_dev)
        if mesh is not None:
            m.set_solver(mesh=mesh)
        m.solve(complexify=True)
        unrot = np.asarray(m.rule_n(11, n_modes=5, seed=4,
                                    disable_progress=True))
        m.rotate(5)
        rot = np.asarray(m.rule_n(11, seed=4, disable_progress=True))
        return unrot, rot

    unrot_u, rot_u = ensembles(None)
    unrot_s, rot_s = ensembles(make_mesh(ensemble=n_dev))

    # measured deviation ~2e-6 (rotated) / ~4e-7 (unrotated): pure
    # GSPMD reduction-reorder roundoff, no amplification at same batch
    assert unrot_s.shape == unrot_u.shape
    np.testing.assert_allclose(unrot_s, unrot_u, rtol=1e-4)
    assert rot_s.shape == rot_u.shape
    np.testing.assert_allclose(rot_s, rot_u, rtol=1e-4)


def test_rule_n_generated_requires_fast_spectrum(sst, prcp):
    m = xMCA(sst, prcp)
    m.set_solver(spectrum='exact', surrogate_source='generated')
    m.solve()
    with pytest.raises(ValueError, match="spectrum='fast'"):
        m.rule_n(2, disable_progress=True)


def test_rule_n_truncated_rescaling_matches_full(sst, prcp):
    """Truncated solves must rescale surrogates by the exact stored total.

    Regression: after ``set_solver(truncate=k)`` the materialized variance
    spans only k modes, so rescaling by its sum biased surrogate
    thresholds low.  With the fix the truncated model's Rule-N thresholds
    match an untruncated model's leading modes (same seed, same surrogate
    pipeline, only the rescale reference differs).
    """
    full = xMCA(sst, prcp)
    full.solve()
    rn_full = np.asarray(full.rule_n(3, seed=9, n_modes=8))

    trunc = xMCA(sst, prcp)
    trunc.set_solver(truncate=8)
    trunc.solve()
    rn_trunc = np.asarray(trunc.rule_n(3, seed=9, n_modes=8))

    np.testing.assert_allclose(rn_trunc, rn_full, rtol=1e-3)


def test_rule_north(solved):
    err = np.asarray(solved.rule_north(10))
    sv = np.asarray(solved.singular_values(10))
    np.testing.assert_allclose(
        err, sv * np.sqrt(2.0 / 492), rtol=1e-6
    )
    mc = xMCA.__new__(xMCA)  # complex factor: err *= sqrt(2)
    from xmca_tpu.stats.significance import rule_north_uncertainty
    errc = rule_north_uncertainty(sv, 492, is_complex=True)
    np.testing.assert_allclose(errc, err * np.sqrt(2), rtol=1e-12)


def test_iterative_bootstrap_monotone_structure(solved):
    bs = solved.bootstrapping(
        n_runs=2, n_modes=3, strategy='iterative', disable_progress=True,
        seed=3,
    )
    assert bs.shape == (3, 2)
    assert np.isfinite(np.asarray(bs)).all()


@pytest.mark.slow
def test_rule_n_ensemble_tol_override(sst, prcp):
    """set_solver(ensemble_tol=1e-4) — the loose rotation tolerance the
    TPU generated-noise path auto-selects (paired with the short
    fixed-count 'ns14' polar) — must yield null-distribution quantiles
    statistically equivalent to a tight-tolerance run of the same seeds:
    the per-run stopping point moves, but the q95 threshold shift stays
    far below the ensemble's own Monte-Carlo noise (~1/sqrt(2N))."""
    m = xMCA(sst, prcp)
    m.set_solver(spectrum='fast', surrogate_source='generated',
                 ensemble_tol=1e-4)
    m.solve(complexify=True)
    m.rotate(5)
    loose = np.asarray(m.rule_n(24, seed=6, disable_progress=True))

    m.set_solver(ensemble_tol=1e-8)
    tight = np.asarray(m.rule_n(24, seed=6, disable_progress=True))
    assert loose.shape == tight.shape
    # same seeds, same draws: only the rotation stopping point differs.
    # Individual runs wiggle ~1% (the fixed point is approached at a
    # slow linear rate); the quantile must move far less than the ~13%
    # seed-to-seed MC noise of a 24-run q95.
    q_loose = np.quantile(loose, 0.95, axis=1)
    q_tight = np.quantile(tight, 0.95, axis=1)
    np.testing.assert_allclose(q_loose, q_tight, rtol=2e-2)
