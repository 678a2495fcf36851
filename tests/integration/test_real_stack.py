"""Execution against the reference's real dependency stack.

The TPU image ships neither xarray nor h5netcdf nor cartopy; these tests
skip there and run in the full-deps CI leg
(.github/workflows/test.yml, job test-full-deps), where
``xmca_tpu.compat`` automatically prefers the real libraries — so the
whole suite exercises real xarray wrapping, and these tests additionally
pin lite-vs-real equivalence and the real netCDF/cartopy branches.
"""
import numpy as np
import pytest

real_xr = pytest.importorskip('xarray')

from xmca_tpu.compat import xr as compat_xr                    # noqa: E402
from xmca_tpu.compat.xarray_lite import DataArray as LiteDA    # noqa: E402
from xmca_tpu.xarray import xMCA                               # noqa: E402


N, LAT, LON = 60, 9, 14


def _data(seed):
    r = np.random.default_rng(seed)
    base = r.standard_normal((N, 4))
    return (base @ r.standard_normal((4, LAT * LON))
            + 0.2 * r.standard_normal((N, LAT * LON))
            ).reshape(N, LAT, LON)


COORDS = {
    'time': np.arange(N, dtype=np.float64),
    'lat': np.linspace(-40, 40, LAT),
    'lon': np.linspace(0, 325, LON),
}
DIMS = ('time', 'lat', 'lon')


def _real(seed):
    return real_xr.DataArray(_data(seed), dims=DIMS, coords=COORDS)


def _lite(seed):
    return LiteDA(_data(seed), dims=DIMS, coords=COORDS)


def test_compat_prefers_real_xarray():
    assert compat_xr.DataArray is real_xr.DataArray


def _solved(make):
    m = xMCA(make(3), make(4))
    m.apply_coslat()
    m.solve(complexify=True)
    m.rotate(4)
    return m


def test_real_equals_lite_end_to_end():
    """The same pipeline over real-xarray and lite inputs produces
    byte-identical numerics and identical labeling."""
    mr = _solved(_real)
    ml = _solved(_lite)

    sv_r, sv_l = mr.singular_values(6), ml.singular_values(6)
    assert isinstance(sv_r, real_xr.DataArray)
    np.testing.assert_array_equal(
        np.asarray(sv_r.values), np.asarray(sv_l.values)
    )

    er, el = mr.eofs(3), ml.eofs(3)
    for k in ('left', 'right'):
        assert er[k].dims == tuple(el[k].dims) == ('lat', 'lon', 'mode')
        np.testing.assert_array_equal(
            np.asarray(er[k].values), np.asarray(el[k].values)
        )
        assert list(np.asarray(er[k].coords['mode'].values)) == [1, 2, 3]
        assert er[k].attrs['is_rotated'] == el[k].attrs['is_rotated']

    pr, pl = mr.pcs(3), ml.pcs(3)
    np.testing.assert_array_equal(
        np.asarray(pr['left'].values), np.asarray(pl['left'].values)
    )

    hr, _ = mr.homogeneous_patterns(2)
    hl, _ = ml.homogeneous_patterns(2)
    np.testing.assert_array_equal(
        np.asarray(hr['left'].values), np.asarray(hl['left'].values)
    )


def test_save_load_round_trip_real_engine(tmp_path):
    """save/load through the real h5netcdf (or netCDF4) engine."""
    engine = None
    for candidate in ('h5netcdf', 'netCDF4'):
        try:
            __import__(candidate)
            engine = candidate.lower() if candidate == 'netCDF4' else candidate
            break
        except ImportError:
            continue
    if engine is None:
        pytest.skip('no real netCDF engine installed')

    m = _solved(_real)
    path = str(tmp_path / 'analysis')
    m.save_analysis(path=path, engine=engine)

    m2 = xMCA()
    import os
    m2.load_analysis(os.path.join(path, 'info.xmca'), engine=engine)
    np.testing.assert_allclose(
        np.asarray(m2.singular_values(6).values),
        np.asarray(m.singular_values(6).values), rtol=1e-6,
    )
    e1, e2 = m.eofs(3), m2.eofs(3)
    np.testing.assert_allclose(
        np.abs(np.asarray(e1['left'].values)),
        np.abs(np.asarray(e2['left'].values)), atol=1e-5,
    )


def test_plot_with_real_cartopy(tmp_path):
    """The cartopy branch with the real library, not the mock."""
    pytest.importorskip('cartopy')
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    m = _solved(_real)
    fig, axes = m.plot(1)
    assert fig is not None
    fig.savefig(str(tmp_path / 'mode1.png'))
    plt.close('all')


def test_weight_alignment_collapse_falls_back_loudly():
    """A DataArray weight whose coordinate alignment (inner join)
    collapses a spatial dim must NOT be silently tiled across the grid:
    the fast path declines (shape check, api/xarray.py _weight_columns)
    and the host fallback reproduces the reference's ValueError
    (xmca/xarray.py full-field multiply + reshape)."""
    m = xMCA(_real(1), _real(2))
    # weight defined on a single latitude: real-xarray alignment shrinks
    # (template * w) to shape (1, LON)
    w = real_xr.DataArray(
        np.full((1, LON), 2.0), dims=('lat', 'lon'),
        coords={'lat': COORDS['lat'][:1], 'lon': COORDS['lon']},
    )
    with pytest.raises(ValueError):
        m.apply_weights(left=w)
