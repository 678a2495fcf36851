"""Out-of-core solves through the PUBLIC API (`MCA.from_chunks`).

The chunk loaders read from an on-disk memmap — the model never holds a
full field in memory — and every result that flows through the public
surface (singular values, eofs, pcs, rotation, rule_n scaling, predict)
must match the in-memory truncated solve of the same data.
"""
import os

import numpy as np
import pytest
from numpy.testing import assert_allclose

from xmca_tpu.array import MCA
from xmca_tpu.xarray import xMCA


N_OBS, N_LAT, N_LON = 128, 20, 35
K = 6


@pytest.fixture(scope='module')
def disk_fields(tmp_path_factory):
    rng = np.random.default_rng(21)
    base = rng.standard_normal((N_OBS, 6))
    shape = (N_OBS, N_LAT, N_LON)
    p = N_LAT * N_LON
    root = tmp_path_factory.mktemp('chunks')
    out = {}
    for name, seed, off in (('left', 1, 1.5), ('right', 2, -0.7)):
        r = np.random.default_rng(seed)
        data = (base @ r.standard_normal((6, p))
                + 0.3 * r.standard_normal((N_OBS, p)) + off)
        path = root / f'{name}.dat'
        mm = np.memmap(path, dtype=np.float64, mode='w+', shape=(N_OBS, p))
        mm[:] = data
        mm.flush()
        out[name] = (path, data.reshape(shape))
    return out


def _loader(path, chunk):
    """Fresh pass over the memmap in (N_OBS, <=chunk) slabs."""
    def chunks():
        mm = np.memmap(path, dtype=np.float64, mode='r',
                       shape=(N_OBS, N_LAT * N_LON))
        for s in range(0, mm.shape[1], chunk):
            yield np.asarray(mm[:, s:s + chunk])
    return chunks


def _in_memory(disk_fields, complexify=False):
    m = MCA(disk_fields['left'][1], disk_fields['right'][1])
    m.set_solver(truncate=K)
    m.solve(complexify=complexify)
    return m


def _streamed(disk_fields, complexify=False, chunk=97):
    m = MCA.from_chunks(
        _loader(disk_fields['left'][0], chunk),
        _loader(disk_fields['right'][0], chunk),
        n_observations=N_OBS, left_shape=(N_LAT, N_LON),
        right_shape=(N_LAT, N_LON),
    )
    m.set_solver(truncate=K)
    m.solve(complexify=complexify)
    return m


def test_streamed_public_solve_matches_in_memory(disk_fields):
    ms = _streamed(disk_fields)
    mm = _in_memory(disk_fields)
    assert_allclose(ms.singular_values(), mm.singular_values(),
                    rtol=1e-9)
    assert ms._analysis['total_covariance'] == pytest.approx(
        mm._analysis['total_covariance'], rel=1e-9)
    assert ms._analysis['total_squared_covariance'] == pytest.approx(
        mm._analysis['total_squared_covariance'], rel=1e-9)
    eof_s = ms.eofs(K, rotated=False)
    eof_m = mm.eofs(K, rotated=False)
    pcs_s = ms.pcs(K, rotated=False)
    pcs_m = mm.pcs(K, rotated=False)
    for k in ('left', 'right'):
        assert_allclose(eof_s[k], eof_m[k], atol=1e-8)
        assert_allclose(pcs_s[k], pcs_m[k], atol=1e-8)


def test_streamed_public_rotate_and_rulen(disk_fields):
    ms = _streamed(disk_fields)
    mm = _in_memory(disk_fields)
    ms.rotate(4)
    mm.rotate(4)
    assert_allclose(ms.variance(), mm.variance(), rtol=1e-8)
    eof_s = ms.eofs(4)
    eof_m = mm.eofs(4)
    assert_allclose(eof_s['left'], eof_m['left'], atol=1e-7)
    # the rule_n rescaling consumes the exact streamed totals
    surr = np.asarray(ms.rule_n(4, seed=5, disable_progress=True))
    assert np.isfinite(surr).all() and surr.shape[0] == 4


def test_streamed_complex_solve_matches_in_memory(disk_fields):
    ms = _streamed(disk_fields, complexify=True)
    mm = _in_memory(disk_fields, complexify=True)
    assert_allclose(ms.singular_values(), mm.singular_values(),
                    rtol=1e-8)
    eof_s = ms.eofs(K, rotated=False)
    eof_m = mm.eofs(K, rotated=False)
    pcs_s = ms.pcs(K, rotated=False)
    pcs_m = mm.pcs(K, rotated=False)
    # the streamed route folds the analytic signal into the Gram while
    # the in-memory route Hilbert-transforms the data first — identical
    # in exact arithmetic, a few 1e-6 apart in f64 on trailing modes
    for k in ('left', 'right'):
        assert_allclose(eof_s[k], eof_m[k], atol=1e-5)
        assert_allclose(pcs_s[k], pcs_m[k], atol=1e-5)


def test_streamed_predict_matches_in_memory(disk_fields):
    ms = _streamed(disk_fields)
    mm = _in_memory(disk_fields)
    new = disk_fields['left'][1][:7]
    assert_allclose(ms.predict(left=new, n=4)['left'],
                    mm.predict(left=new, n=4)['left'], atol=1e-8)


def _boot_kwargs(**kw):
    base = dict(disable_progress=True)
    base.update(kw)
    return base


@pytest.mark.parametrize('config', [
    # (complexify, rotated, kwargs) — resident and streamed bootstraps
    # share the seed, so the block draws are identical run for run and
    # the spectra agree to subspace-iteration accuracy
    (False, False, dict(n_modes=4, seed=7)),
    (False, True, dict(n_modes=3, seed=3)),
    (True, True, dict(n_modes=3, seed=11, on_left=True, on_right=True,
                      block_size=4)),
    (False, True, dict(n_modes=3, seed=5, strategy='iterative')),
    (False, True, dict(n_modes=3, seed=9, axis=1, on_left=True,
                       on_right=True)),
    (True, True, dict(n_modes=3, seed=4, axis=1, on_left=False,
                      on_right=True, block_size=4)),
    (False, True, dict(n_modes=3, seed=6, axis=1,
                       strategy='iterative')),
    (False, True, dict(n_modes=3, seed=8, replace=False,
                       block_size=8)),
])
def test_streamed_bootstrap_matches_in_memory(disk_fields, config):
    complexify, rotated, kwargs = config
    mm = _in_memory(disk_fields, complexify=complexify)
    ms = _streamed(disk_fields, complexify=complexify)
    if rotated:
        mm.rotate(3)
        ms.rotate(3)
    br = mm.bootstrapping(3, **_boot_kwargs(**kwargs))
    bs = ms.bootstrapping(3, **_boot_kwargs(**kwargs))
    assert br.shape == bs.shape
    assert_allclose(bs, br, rtol=2e-4, atol=1e-6)


def test_streamed_bootstrap_preprocessed(disk_fields):
    """Normalize + weights flow through the streamed Gram resampler."""
    p = N_LAT * N_LON
    w = 0.5 + np.random.default_rng(1).random(p)
    mm = MCA(disk_fields['left'][1], disk_fields['right'][1])
    mm.set_solver(truncate=K)
    ms = MCA.from_chunks(
        _loader(disk_fields['left'][0], 97),
        _loader(disk_fields['right'][0], 97),
        n_observations=N_OBS, left_shape=(N_LAT, N_LON),
        right_shape=(N_LAT, N_LON),
    )
    ms.set_solver(truncate=K)
    for m in (mm, ms):
        m.normalize()
        m.apply_weights(left=w, right=2.0)
        m.solve()
        m.rotate(3)
    br = mm.bootstrapping(3, n_modes=3, seed=13, disable_progress=True)
    bs = ms.bootstrapping(3, n_modes=3, seed=13, disable_progress=True)
    assert_allclose(bs, br, rtol=2e-4, atol=1e-6)


def test_streamed_normalize_matches_in_memory(disk_fields):
    mm = MCA(disk_fields['left'][1], disk_fields['right'][1])
    mm.set_solver(truncate=K)
    mm.normalize()
    mm.solve()
    ms = MCA.from_chunks(
        _loader(disk_fields['left'][0], 97),
        _loader(disk_fields['right'][0], 97),
        n_observations=N_OBS, left_shape=(N_LAT, N_LON),
        right_shape=(N_LAT, N_LON),
    )
    ms.set_solver(truncate=K)
    ms.normalize()
    ms.solve()
    assert ms._analysis['is_normalized']
    assert_allclose(ms.singular_values(), mm.singular_values(),
                    rtol=1e-9)
    eof_s, eof_m = ms.eofs(K, rotated=False), mm.eofs(K, rotated=False)
    for k in ('left', 'right'):
        assert_allclose(eof_s[k], eof_m[k], atol=1e-8)
    # raw stats are unchanged by the scaling (predict's _scale_X needs
    # the ingestion-time stds)
    assert_allclose(
        ms._field_stds['left'],
        disk_fields['left'][1].reshape(N_OBS, -1).std(axis=0),
        rtol=1e-10,
    )


def test_streamed_apply_weights_matches_in_memory(disk_fields):
    p = N_LAT * N_LON
    rng = np.random.default_rng(8)
    w_left = 0.5 + rng.random(p)
    mm = MCA(disk_fields['left'][1], disk_fields['right'][1])
    mm.set_solver(truncate=K)
    mm.apply_weights(left=w_left, right=2.0)
    mm.solve()
    ms = _streamed(disk_fields)     # solve() again below re-streams
    ms.apply_weights(left=w_left, right=2.0)
    ms.solve()
    assert_allclose(ms.singular_values(), mm.singular_values(),
                    rtol=1e-9)
    eof_s, eof_m = ms.eofs(K, rotated=False), mm.eofs(K, rotated=False)
    pcs_s, pcs_m = ms.pcs(K, rotated=False), mm.pcs(K, rotated=False)
    for k in ('left', 'right'):
        assert_allclose(eof_s[k], eof_m[k], atol=1e-8)
        assert_allclose(pcs_s[k], pcs_m[k], atol=1e-8)
    # repeated calls compose multiplicatively like the resident multiply
    ms.apply_weights(left=3.0)
    assert_allclose(ms._stream_weights['left'], w_left * 3.0)
    # non-spatial weights cannot stream
    with pytest.raises(ValueError, match='spatial'):
        ms.apply_weights(left=np.ones((N_OBS, p)))


@pytest.mark.parametrize('complexify', [False, True])
def test_streamed_fields_match_in_memory(disk_fields, complexify):
    ms = _streamed(disk_fields, complexify=complexify)
    mm = _in_memory(disk_fields, complexify=complexify)
    for orig in (False, True):
        fs = ms.fields(original_scale=orig)
        fm = mm.fields(original_scale=orig)
        for k in ('left', 'right'):
            assert_allclose(fs[k], fm[k],
                            atol=1e-6 if complexify else 1e-9)


@pytest.mark.parametrize('complexify', [False, True])
def test_streamed_patterns_match_in_memory(disk_fields, complexify):
    ms = _streamed(disk_fields, complexify=complexify)
    mm = _in_memory(disk_fields, complexify=complexify)
    ms.rotate(4)
    mm.rotate(4)
    shift = 0.4 if complexify else 0
    hs, hps = ms.homogeneous_patterns(3, phase_shift=shift)
    hm, hpm = mm.homogeneous_patterns(3, phase_shift=shift)
    es, eps = ms.heterogeneous_patterns(3)
    em, epm = mm.heterogeneous_patterns(3)
    for k in ('left', 'right'):
        assert_allclose(hs[k], hm[k], atol=5e-6)
        assert_allclose(hps[k], hpm[k], atol=5e-6)
        assert_allclose(es[k], em[k], atol=5e-6)
        assert_allclose(eps[k], epm[k], atol=5e-6)
        assert (np.abs(hs[k]) <= 1 + 1e-12).all()


@pytest.mark.parametrize('complexify', [False, True])
def test_streamed_reconstruction_matches_in_memory(disk_fields,
                                                   complexify):
    ms = _streamed(disk_fields, complexify=complexify)
    mm = _in_memory(disk_fields, complexify=complexify)
    ms.rotate(4)
    mm.rotate(4)
    rs = ms.reconstructed_fields(3)
    rm = mm.reconstructed_fields(3)
    for k in ('left', 'right'):
        assert_allclose(rs[k], rm[k], atol=1e-6)
    # mode-slice addressing matches too
    rs = ms.reconstructed_fields(slice(2, 4), original_scale=False)
    rm = mm.reconstructed_fields(slice(2, 4), original_scale=False)
    for k in ('left', 'right'):
        assert_allclose(rs[k], rm[k], atol=1e-6)


def test_streamed_nan_columns_in_result_layer(disk_fields, tmp_path):
    """Streamed patterns/reconstruction scatter NaN columns like the
    resident path does."""
    p = N_LAT * N_LON
    data = disk_fields['left'][1].reshape(N_OBS, p).copy()
    data[:, [5, 60]] = np.nan
    path = tmp_path / 'nan.dat'
    mmap = np.memmap(path, dtype=np.float64, mode='w+',
                     shape=(N_OBS, p))
    mmap[:] = data
    mmap.flush()
    ms = MCA.from_chunks(
        _loader(path, 97), None,
        n_observations=N_OBS, left_shape=(N_LAT, N_LON),
    )
    ms.set_solver(truncate=K)
    ms.solve()
    mm = MCA(data.reshape(N_OBS, N_LAT, N_LON))
    mm.set_solver(truncate=K)
    mm.solve()
    hs, _ = ms.homogeneous_patterns(3)
    hm, _ = mm.homogeneous_patterns(3)
    assert_allclose(hs['left'], hm['left'], atol=5e-6)
    assert np.isnan(hs['left'].reshape(p, 3)[[5, 60]]).all()
    rs = ms.reconstructed_fields(3)
    rm = mm.reconstructed_fields(3)
    assert_allclose(rs['left'], rm['left'], atol=1e-6)
    fs = ms.fields()
    fm = mm.fields()
    assert_allclose(fs['left'], fm['left'], atol=1e-9)


def test_streamed_xmca_coslat_matches_in_memory(disk_fields):
    from xmca_tpu.compat import xr
    coords = {
        'time': np.arange(N_OBS),
        'lat': np.linspace(-50, 50, N_LAT),
        'lon': np.linspace(0, 340, N_LON),
    }
    da = {
        k: xr.DataArray(
            disk_fields[k][1], dims=('time', 'lat', 'lon'),
            coords=coords, name=k,
        ) for k in ('left', 'right')
    }
    mm = xMCA(da['left'], da['right'])
    mm.set_solver(truncate=K)
    mm.apply_coslat()
    mm.solve()
    ms = xMCA.from_chunks(
        _loader(disk_fields['left'][0], 128),
        _loader(disk_fields['right'][0], 128),
        coords=coords,
    )
    ms.set_solver(truncate=K)
    ms.apply_coslat()
    ms.solve()
    assert ms._analysis['is_coslat_corrected']
    assert_allclose(np.asarray(ms.singular_values().values),
                    np.asarray(mm.singular_values().values), rtol=1e-9)
    eof_s, eof_m = ms.eofs(3), mm.eofs(3)
    for k in ('left', 'right'):
        assert_allclose(np.asarray(eof_s[k].values),
                        np.asarray(eof_m[k].values), atol=1e-8)
    # reconstruction folds the coslat inverse back in
    rs = ms.reconstructed_fields(3)
    rm = mm.reconstructed_fields(3)
    assert_allclose(np.asarray(rs['left'].values),
                    np.asarray(rm['left'].values), atol=1e-6)


def test_streamed_save_load_roundtrip(disk_fields, tmp_path):
    ms = _streamed_xmca(disk_fields)
    path = str(tmp_path / 'analysis')
    ms.save_analysis(path=path)
    m2 = xMCA()
    m2.load_analysis(os.path.join(path, 'info.xmca'))
    assert_allclose(np.asarray(m2.singular_values().values),
                    np.asarray(ms.singular_values().values), rtol=1e-6)
    eof_s = ms.eofs(3, rotated=False)
    eof_2 = m2.eofs(3, rotated=False)
    for k in ('left', 'right'):
        assert_allclose(np.asarray(eof_2[k].values),
                        np.asarray(eof_s[k].values), atol=1e-6)


def test_streamed_nan_columns_match_in_memory(disk_fields, tmp_path):
    """NaN columns are dropped *exactly* during streaming (their Gram/
    score contributions are zeroed), so a streamed solve of NaN-bearing
    data must equal the in-memory solve, which removes those columns —
    and the scattered EOF grids carry the NaN cells in place."""
    p = N_LAT * N_LON
    data = {k: disk_fields[k][1].reshape(N_OBS, p).copy()
            for k in ('left', 'right')}
    data['left'][:, [3, 41]] = np.nan
    data['left'][0, 100] = np.nan           # partial NaN drops it too
    data['right'][:, 7] = np.nan
    paths = {}
    for k in data:
        path = tmp_path / f'{k}_nan.dat'
        mm = np.memmap(path, dtype=np.float64, mode='w+',
                       shape=(N_OBS, p))
        mm[:] = data[k]
        mm.flush()
        paths[k] = path
    ms = MCA.from_chunks(
        _loader(paths['left'], 97), _loader(paths['right'], 97),
        n_observations=N_OBS, left_shape=(N_LAT, N_LON),
        right_shape=(N_LAT, N_LON),
    )
    ms.set_solver(truncate=K)
    ms.solve()
    mm_ = MCA(data['left'].reshape(N_OBS, N_LAT, N_LON),
              data['right'].reshape(N_OBS, N_LAT, N_LON))
    mm_.set_solver(truncate=K)
    mm_.solve()
    assert_allclose(ms.singular_values(), mm_.singular_values(),
                    rtol=1e-9)
    eof_s, eof_m = ms.eofs(K, rotated=False), mm_.eofs(K, rotated=False)
    pcs_s, pcs_m = ms.pcs(K, rotated=False), mm_.pcs(K, rotated=False)
    for k in ('left', 'right'):
        assert_allclose(eof_s[k], eof_m[k], atol=1e-8)
        assert_allclose(pcs_s[k], pcs_m[k], atol=1e-8)
    flat = eof_s['left'].reshape(p, K)
    assert np.isnan(flat[[3, 41, 100]]).all()
    assert np.isfinite(flat[0]).all()


def test_streamed_all_nan_field_raises(disk_fields):
    def all_nan():
        yield np.full((N_OBS, 50), np.nan)
    m = MCA.from_chunks(
        lambda: all_nan(), None,
        n_observations=N_OBS, left_shape=(50,),
    )
    with pytest.raises(RuntimeError, match='no NaN-free columns'):
        m.solve()


@pytest.mark.parametrize('extend,period', [('exp', 1), ('theta', 4)])
def test_streamed_extend_matches_in_memory(disk_fields, extend, period):
    """Boundary-extended complexification streams: chunks carry each
    column's full series, so per-chunk extend+complexify with direct
    complex-Gram accumulation equals the resident extend solve."""
    mm = MCA(disk_fields['left'][1], disk_fields['right'][1])
    mm.set_solver(truncate=K)
    mm.solve(complexify=True, extend=extend, period=period)
    ms = MCA.from_chunks(
        _loader(disk_fields['left'][0], 97),
        _loader(disk_fields['right'][0], 97),
        n_observations=N_OBS, left_shape=(N_LAT, N_LON),
        right_shape=(N_LAT, N_LON),
    )
    ms.set_solver(truncate=K)
    ms.solve(complexify=True, extend=extend, period=period)
    assert ms._analysis['extend'] == extend
    assert_allclose(ms.singular_values(), mm.singular_values(),
                    rtol=1e-7)
    # vector tolerance: the chunked Gram differs from the one-matmul
    # Gram by ~1 ulp, and the Cholesky of the near-rank-deficient
    # complexified Gram (jitter floor 1e-6) plus the subspace iteration
    # amplify that to ~6e-5 on the vectors (measured; the singular
    # values agree to 1e-16 — this is fp sensitivity, not algebra)
    eof_s = ms.eofs(K, rotated=False)
    eof_m = mm.eofs(K, rotated=False)
    pcs_s = ms.pcs(K, rotated=False)
    pcs_m = mm.pcs(K, rotated=False)
    for k in ('left', 'right'):
        assert_allclose(eof_s[k], eof_m[k], atol=2e-4)
        assert_allclose(pcs_s[k], pcs_m[k], atol=2e-4)
    # the rotated result layer consumes the extended score accumulators
    ms.rotate(3)
    mm.rotate(3)
    assert_allclose(ms.variance(), mm.variance(), rtol=1e-4)
    assert_allclose(ms.eofs(3)['left'], mm.eofs(3)['left'], atol=2e-4)
    # fields() re-reads the loaders with the extended complexification
    fs = ms.fields()
    fm = mm.fields()
    for k in ('left', 'right'):
        assert_allclose(fs[k], fm[k], atol=1e-6)


def test_streamed_extend_bootstrap_rejected(disk_fields):
    m = MCA.from_chunks(
        _loader(disk_fields['left'][0], 128), None,
        n_observations=N_OBS, left_shape=(N_LAT, N_LON),
    )
    m.set_solver(truncate=K)
    m.solve(complexify=True, extend='exp')
    with pytest.raises(RuntimeError, match='extend'):
        m.bootstrapping(2, n_modes=2, disable_progress=True)


def _streamed_xmca(disk_fields):
    coords = {
        'time': np.arange(N_OBS),
        'lat': np.linspace(-50, 50, N_LAT),
        'lon': np.linspace(0, 340, N_LON),
    }
    m = xMCA.from_chunks(
        _loader(disk_fields['left'][0], 128),
        _loader(disk_fields['right'][0], 128),
        coords=coords,
    )
    m.set_solver(truncate=K)
    m.solve()
    return m


def test_streamed_xmca_wraps_labeled_results(disk_fields):
    m = _streamed_xmca(disk_fields)
    eofs = m.eofs(3)
    assert eofs['left'].dims == ('lat', 'lon', 'mode')
    assert list(np.asarray(eofs['left'].coords['mode'].values)) == [1, 2, 3]
    pcs = m.pcs(3)
    assert pcs['left'].values.shape == (N_OBS, 3)
    sv = m.singular_values()
    assert np.isfinite(np.asarray(sv.values)).all()
