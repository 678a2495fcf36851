"""Mathematical invariants and API sweeps over the fixture data.

Mirrors the reference's integration suite
(tests/integration/test_integration_xarray.py:92-592).
"""
import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_raises

from xmca_tpu.xarray import xMCA

TOLS = {'atol': 1e-3, 'rtol': 1e-3}

FLAVOURS = [
    # (name, normalized, cplx, n_rot, power)
    ('std', False, False, 0, 1),
    ('cplx', False, True, 0, 1),
    ('varmx', False, False, 10, 1),
    ('cplx_varmx', False, True, 10, 1),
    ('promx', False, False, 10, 4),
    ('cplx_promx', False, True, 10, 4),
    ('std_n', True, False, 0, 1),
    ('cplx_n', True, True, 0, 1),
    ('varmx_n', True, False, 10, 1),
    ('cplx_varmx_n', True, True, 10, 1),
    ('cplx_promx_n', True, True, 10, 4),
]


@pytest.fixture(scope='module')
def models(sst, prcp):
    """Cache solved models per flavour (1 CPU core — avoid re-solving)."""
    cache = {}

    def get(name):
        if name not in cache:
            spec = next(f for f in FLAVOURS if f[0] == name)
            _, norm, cplx, n_rot, power = spec
            m = xMCA(sst, prcp)
            m.set_field_names('sst', 'prcp')
            if norm:
                m.normalize()
            m.solve(complexify=cplx)
            if n_rot > 1:
                m.rotate(n_rot, power)
            cache[name] = m
        return cache[name]

    return get


@pytest.mark.parametrize('name', [f[0] for f in FLAVOURS])
def test_orthogonality(models, name):
    model = models(name)
    V = model._get_V()
    for k, v in V.items():
        result = (v.conjugate().T @ v).real
        expected = np.eye(v.shape[1])
        if not model._analysis['is_rotated']:
            assert_allclose(result, expected, **TOLS)
        else:
            assert_raises(
                AssertionError, assert_allclose, result, expected
            )


@pytest.mark.parametrize('name', [f[0] for f in FLAVOURS])
def test_correlation(models, name, sst):
    model = models(name)
    n_modes = 100
    dof = sst.shape[0] - 1
    if model._analysis['is_rotated']:
        n_modes = model._analysis['n_rot']
    U = model._get_U()
    result = (U['left'].conjugate().T @ U['right']).real / dof
    result = result[:n_modes, :n_modes]
    expected = np.eye(n_modes)
    if model._analysis['power'] > 1:
        assert_raises(AssertionError, assert_allclose, result, expected)
    else:
        assert_allclose(result, expected, **TOLS)


# exact parameter triples of the reference's sweep
# (test_integration_xarray.py:386-402); note 'eigen' with rotated=False on
# a rotated model is not in the reference matrix — it crashes there too
@pytest.mark.parametrize('name,n,scaling,phase_shift,rotated', [
    ('std', None, 'None', 0, True),
    ('cplx', None, 'None', 0, True),
    ('varmx', None, 'None', 0, True),
    ('std', 100, 'None', 0, True),
    ('cplx', 100, 'None', 0, True),
    ('varmx', 100, 'None', 0, True),
    ('std', None, 'max', 0, True),
    ('cplx', None, 'std', 0, True),
    ('varmx', None, 'eigen', 0, True),
    ('std', 100, 'eigen', 0, True),
    ('cplx', 100, 'std', 0, True),
    ('varmx', 100, 'max', 0, True),
    ('cplx', 100, 'std', 1.234, True),
    ('varmx', 100, 'max', 3, True),
    ('std', 100, 'eigen', -2, False),
    ('cplx', 100, 'std', 1.234, False),
    ('varmx', 100, 'max', 3, False),
])
def test_getter(models, name, n, scaling, phase_shift, rotated):
    model = models(name)
    model.pcs(n, scaling, phase_shift, rotated)
    model.eofs(n, scaling, phase_shift, rotated)
    model.spatial_amplitude(n, scaling if scaling in ('None', 'max')
                            else 'None', rotated)
    model.spatial_phase(n, phase_shift, rotated)
    model.temporal_amplitude(n, scaling if scaling in ('None', 'max')
                             else 'None', rotated)
    model.temporal_phase(n, phase_shift, rotated)


def test_eof_scaling_axes_quirk_1d_spatial():
    """Reference parity: eofs 'max'/'std' scaling reduces over the
    literal axes (0, 1) of the scattered grid (xmca/array.py:709-712).
    For a 1-D spatial field the grid is (p, modes), so the reduction
    sweeps the MODE axis too — one global divisor, not per-mode."""
    from xmca_tpu.array import MCA
    r = np.random.default_rng(3)
    m = MCA(r.standard_normal((80, 17)), r.standard_normal((80, 23)))
    m.solve()
    raw = m.eofs(5, scaling='None')
    mx = m.eofs(5, scaling='max')
    sd = m.eofs(5, scaling='std')
    for k in ('left', 'right'):
        assert raw[k].shape == (raw[k].shape[0], 5)
        assert_allclose(
            mx[k], raw[k] / np.nanmax(np.abs(raw[k].real)), rtol=1e-12
        )
        assert_allclose(
            sd[k], raw[k] / np.nanstd(raw[k].real), rtol=1e-12
        )


def test_getter_invalid_scaling(models):
    model = models('std')
    with pytest.raises(ValueError):
        model.pcs(5, scaling='bogus')
    with pytest.raises(ValueError):
        model.eofs(5, scaling='bogus')


@pytest.mark.parametrize('name', ['std', 'cplx', 'varmx'])
def test_hom_het_patterns(models, name):
    model = models(name)
    hom_pat, hom_p = model.homogeneous_patterns(10)
    het_pat, het_p = model.heterogeneous_patterns(10)
    for pat in [hom_pat, het_pat]:
        for k in ['left', 'right']:
            assert np.nanmax(abs(np.asarray(pat[k]))) <= 1 + 1e-9
    for pv in [hom_p, het_p]:
        for k in ['left', 'right']:
            vals = np.asarray(pv[k])
            assert np.nanmin(vals) >= 0 and np.nanmax(vals) <= 1 + 1e-9


@pytest.mark.parametrize('name', ['std', 'cplx', 'varmx'])
def test_field(models, name, sst, prcp):
    model = models(name)
    expected = {'left': np.asarray(sst.values, dtype=np.float64),
                'right': np.asarray(prcp.values, dtype=np.float64)}
    model.fields()
    result = model.fields(original_scale=True)
    assert_allclose(np.asarray(result['left']).real, expected['left'],
                    **TOLS)
    assert_allclose(np.asarray(result['right']).real, expected['right'],
                    **TOLS)


def test_field_scaling(sst, prcp):
    expected = {'left': np.asarray(sst.values, dtype=np.float64),
                'right': np.asarray(prcp.values, dtype=np.float64)}
    model = xMCA(sst, prcp)
    results = [model.fields(original_scale=True)]
    model.normalize()
    results.append(model.fields(original_scale=True))
    model.apply_coslat()
    results.append(model.fields(original_scale=True))
    model.solve()
    results.append(model.fields(original_scale=True))
    model.rotate(10)
    results.append(model.fields(original_scale=True))
    for res in results:
        assert_allclose(np.asarray(res['left']).real, expected['left'],
                        **TOLS)
        assert_allclose(np.asarray(res['right']).real, expected['right'],
                        **TOLS)


def test_reconstruction_all_modes(sst, prcp):
    """Full-mode reconstruction reproduces the input (C8 fidelity)."""
    model = xMCA(sst, prcp)
    model.solve()
    rec = model.reconstructed_fields()
    assert_allclose(
        np.asarray(rec['left']),
        np.asarray(sst.values, dtype=np.float64),
        atol=1e-2, rtol=1e-2,
    )


def test_reconstruction_folded_scaling_matches_explicit(sst, prcp):
    """The rank-k reconstruction folds the inverse scaling (coslat
    un-weighting, std multiply, mean add) into its gemm factors; it
    must agree with the explicit full-field `_scale_X_inverse` pass on
    a NaN-bearing, normalized, coslat-weighted complex rotated model."""
    m = xMCA(sst, prcp)
    m.normalize()
    m.apply_coslat()
    m.solve(complexify=True)
    m.rotate(4)
    fused = m._reconstructed_X(mode=slice(1, 3), original_scale=True)
    raw = m._reconstructed_X(mode=slice(1, 3), original_scale=False)
    explicit = m._scale_X_inverse(raw)
    for k in fused:
        assert_allclose(fused[k], explicit[k], rtol=1e-10, atol=1e-12)
    # and the fields carry NaN columns, so the NaN-row-gemm branch
    # runs: dropped cells are NaN, kept cells equal the packed gemm
    rec = m.reconstructed_fields(mode=slice(1, 3))
    for k in fused:
        flat = np.asarray(rec[k]).reshape(fused[k].shape[0], -1)
        keep = m._no_nan_index[k]
        assert np.isnan(flat[:, ~keep]).all()
        assert_allclose(flat[:, keep], fused[k], rtol=1e-10, atol=1e-12)


def test_reconstruction_mode_subset(models):
    model = models('std')
    rec1 = model.reconstructed_fields(mode=1)
    rec_all = model.reconstructed_fields()
    v1 = np.nanvar(np.asarray(rec1['left']))
    vall = np.nanvar(np.asarray(rec_all['left']))
    assert v1 < vall  # a single mode carries less variance


@pytest.mark.parametrize('uni,flavour,n,scaling,phase_shift,weight', [
    ('uni', 'std', 1, 'None', 0, 'no_weight'),
    ('uni', 'varmx', 15, 'None', 0, 'no_weight'),
    ('uni', 'std', 1, 'max', 0, 'no_weight'),
    ('uni', 'std', 1, 'eigen', 0, 'no_weight'),
    ('uni', 'varmx', 15, 'std', 0, 'no_weight'),
    ('uni', 'varmx', 15, 'std', 0.5, 'no_weight'),
    ('uni', 'varmx', 15, 'eigen', 0.5, 'no_weight'),
    ('bi', 'std', 1, 'None', 0, 'no_weight'),
    ('bi', 'varmx', 15, 'None', 0, 'no_weight'),
    ('bi', 'std', 1, 'max', 0, 'no_weight'),
    ('bi', 'varmx', 15, 'max', 0, 'no_weight'),
    ('bi', 'varmx', 15, 'std', 0.5, 'no_weight'),
    ('bi', 'std', 1, 'None', 0, 'coslat'),
    ('bi', 'std', 1, 'eigen', 0, 'coslat'),
    ('bi', 'varmx', 15, 'None', 0, 'coslat'),
    ('bi', 'std', 1, 'max', 0, 'coslat'),
    ('bi', 'varmx', 15, 'max', 0, 'coslat'),
    ('bi', 'varmx', 15, 'std', 0.5, 'coslat'),
    ('bi', 'varmx', 15, 'eigen', 0.5, 'coslat'),
])
def test_predict(sst, prcp, uni, flavour, n, scaling, phase_shift, weight):
    left, right = sst, prcp
    new_left = left.isel(time=slice(0, 20))
    new_right = left.isel(time=slice(0, 20))

    if uni == 'uni':
        model = xMCA(left)
    else:
        model = xMCA(left, right)
    if weight == 'coslat':
        model.normalize()
        model.apply_coslat()
    model.solve()
    if flavour == 'varmx':
        model.rotate(10)

    pcs = model.pcs(n=n, scaling=scaling, phase_shift=phase_shift)
    expected = {
        k: p.sel(mode=slice(1, 10)).isel(time=slice(0, 20))
        for k, p in pcs.items()
    }
    result = model.predict(
        new_left, n=n, scaling=scaling, phase_shift=phase_shift
    )
    if uni == 'bi':
        model.predict(new_right)
        result = model.predict(
            new_left, new_right, n=n, scaling=scaling,
            phase_shift=phase_shift,
        )
    n_cmp = np.asarray(expected['left']).shape[1]
    assert_allclose(
        np.asarray(expected['left']),
        np.asarray(result['left'])[:, :n_cmp], **TOLS
    )
    with pytest.raises(ValueError):
        model.predict(new_left.isel(time=0))
    with pytest.raises(ValueError):
        model.predict(new_left.isel(lon=slice(0, 10)))


@pytest.mark.parametrize('n', [None, 1, 10, 100])
def test_norm_variance(models, n):
    model = models('cplx_varmx')
    model.norm(n)
    model.variance(n)
    model.scf(n)
    model.explained_variance(n)


def test_summary(models, capsys):
    models('std').summary()
    out = capsys.readouterr().out
    assert 'is_bivariate' in out
    assert 'total_covariance' in out


@pytest.mark.parametrize('uni', ['uni', 'bi'])
@pytest.mark.parametrize('flavour,trunc', [
    ('std', 1), ('std', 10), ('std', 100),
    ('cplx', 10), ('varmx', 1), ('varmx', 10), ('varmx', 100),
])
def test_truncate(sst, prcp, uni, flavour, trunc):
    cplx = flavour == 'cplx'
    n_rot = 10 if flavour == 'varmx' else 0
    model = xMCA(sst) if uni == 'uni' else xMCA(sst, prcp)
    model.solve(complexify=cplx)
    if n_rot > 1:
        model.rotate(n_rot)
    if flavour == 'varmx' and trunc < n_rot:
        assert_raises(ValueError, model.truncate, trunc)
    else:
        model.truncate(trunc)
        if trunc < 100:
            assert model._analysis['is_truncated']
            assert model._analysis['is_truncated_at'] == trunc
            assert len(model.singular_values()) == trunc


def test_apply_weights(sst, prcp):
    model = xMCA(sst, prcp)
    weights = {
        'left': sst.coords['lat'],
        'right': prcp.coords['lat'],
    }
    model.apply_weights(**weights)
    model.solve()
    model.pcs(3)


def test_complex_solver_extensions(sst, prcp):
    model = xMCA(sst, prcp)
    model.solve(complexify=True, extend=False)
    sv1 = np.asarray(model.singular_values(10))
    model = xMCA(sst, prcp)
    model.solve(complexify=True, extend='theta', period=12)
    sv2 = np.asarray(model.singular_values(10))
    model = xMCA(sst, prcp)
    model.solve(complexify=True, extend='exp', period=6)
    sv3 = np.asarray(model.singular_values(10))
    for sv in (sv1, sv2, sv3):
        assert np.isfinite(sv).all() and (sv > 0).all()


def test_solver_errors(sst, prcp):
    model = xMCA(sst, prcp)
    with pytest.raises(RuntimeError):
        model.singular_values()
    model.solve()
    model.rotation_matrix()
    model.correlation_matrix()
    model.rotate(10)
    model.rotation_matrix()
    model.correlation_matrix()
    with pytest.raises(ValueError):
        model.rotate(1)
    with pytest.raises(ValueError):
        model.rotate(10, power=0)


def test_invalid_extension(sst, prcp):
    model = xMCA(sst, prcp)
    with pytest.raises(ValueError):
        model.solve(complexify=True, extend='bogus')


def test_truncated_solver_path(sst64, prcp64):
    """set_solver(truncate=k): leading modes + exact totals via the
    matmul-only pipeline (the huge-field TPU path)."""
    full = xMCA(sst64, prcp64)
    full.solve()
    trunc = xMCA(sst64, prcp64)
    trunc.set_solver(truncate=15, subspace_iters=14)
    trunc.solve()

    assert trunc._analysis['rank'] == 15
    assert trunc._analysis['is_truncated']
    # jitter floor of the fast pipeline is ~1e-6 relative
    assert_allclose(
        np.asarray(trunc.singular_values(10)),
        np.asarray(full.singular_values(10)), rtol=1e-5,
    )
    # totals stay full-spectrum exact despite the truncation
    assert abs(
        trunc._analysis['total_covariance']
        - full._analysis['total_covariance']
    ) / full._analysis['total_covariance'] < 1e-4
    assert abs(
        trunc._analysis['total_squared_covariance']
        - full._analysis['total_squared_covariance']
    ) / full._analysis['total_squared_covariance'] < 1e-6
    # percentages therefore agree with the full solve
    assert_allclose(
        np.asarray(trunc.explained_variance(5)),
        np.asarray(full.explained_variance(5)), rtol=1e-4,
    )
    assert_allclose(
        np.asarray(trunc.scf(5)), np.asarray(full.scf(5)), rtol=1e-4
    )
    # downstream machinery works on the truncated state
    trunc.rotate(10)
    pcs = trunc.pcs(5)
    assert pcs['left'].shape[1] == 5
    rec = trunc.reconstructed_fields(mode=3)
    assert np.isfinite(np.asarray(rec['left'])[~np.isnan(
        np.asarray(rec['left']))]).all()


def test_pattern_phase_shift_matches_host_computation():
    """The fused pattern kernel with a phase shift == a naive host
    Pearson of the (phase-shifted, real-part) PCs against the field."""
    import numpy as np
    rng = np.random.default_rng(8)
    A = rng.standard_normal((80, 6, 7))
    B = rng.standard_normal((80, 6, 7))
    from xmca_tpu.array import MCA
    m = MCA(A, B)
    m.solve(complexify=True)
    m.rotate(4)
    shift = 0.7
    hom, pv = m.homogeneous_patterns(3, phase_shift=shift)

    pcs = m.pcs(3, phase_shift=shift)['left']
    X = m._get_X(real=True)['left']
    Xc = X - X.mean(0)
    Pc = pcs.real - pcs.real.mean(0)
    r_ref = (Xc.T @ Pc) / np.outer(
        np.linalg.norm(Xc, axis=0), np.linalg.norm(Pc, axis=0)
    )
    r_ref = r_ref.reshape(6, 7, 3)
    np.testing.assert_allclose(hom['left'], r_ref, atol=1e-10)
    assert ((pv['left'] >= 0) & (pv['left'] <= 1)).all()


def test_deferred_complexification_matches_eager():
    """Fold solves defer Z = X + iHX; every consumer must see results
    identical to the eagerly materialized pipeline."""
    from xmca_tpu.array import MCA
    rng = np.random.default_rng(11)
    n, lat, lon = 64, 8, 12                    # wide: p=96 > n=64
    A = rng.standard_normal((n, lat, lon))
    B = rng.standard_normal((n, lat, lon))

    def solved():
        m = MCA(A, B)
        m.set_solver(truncate=6)
        m.solve(complexify=True)
        m.rotate(4)
        return m

    m_lazy = solved()
    assert m_lazy._complexify_pending          # rotate never needs Z
    assert not np.iscomplexobj(np.asarray(m_lazy._fields['left']))

    m_eager = solved()
    m_eager._ensure_complex_fields()           # materialize up front
    assert not m_eager._complexify_pending

    # consumers trigger (or already used) materialization; results match
    pcs_l = m_lazy.pcs(4)
    assert not m_lazy._complexify_pending
    pcs_e = m_eager.pcs(4)
    for k in ('left', 'right'):
        np.testing.assert_allclose(pcs_l[k], pcs_e[k], atol=1e-10)

    hom_l, _ = m_lazy.homogeneous_patterns(3)
    hom_e, _ = m_eager.homogeneous_patterns(3)
    rec_l = m_lazy.reconstructed_fields(mode=2)
    rec_e = m_eager.reconstructed_fields(mode=2)
    f_l = m_lazy.fields()
    f_e = m_eager.fields()
    for k in ('left', 'right'):
        np.testing.assert_allclose(hom_l[k], hom_e[k], atol=1e-10)
        np.testing.assert_allclose(rec_l[k], rec_e[k], atol=1e-10)
        np.testing.assert_allclose(f_l[k], f_e[k], atol=1e-12)

    # a re-solve flushes the pending complexification first (reference
    # parity: solve mutates the stored fields permanently)
    m2 = solved()
    m2.solve(complexify=False)
    m3 = solved()
    m3._ensure_complex_fields()
    m3.solve(complexify=False)
    np.testing.assert_allclose(
        m2.singular_values(4), m3.singular_values(4), rtol=1e-9
    )

    # re-deferring on already-complex fields (materialized by a
    # consumer, then solved again): the fold reads the real part, and
    # the lazy re-materialization reproduces the complex field
    m_lazy.solve(complexify=True)
    m_lazy.rotate(4)
    assert m_lazy._complexify_pending
    pcs_again = m_lazy.pcs(4)
    for k in ('left', 'right'):
        np.testing.assert_allclose(pcs_again[k], pcs_e[k], atol=1e-10)
