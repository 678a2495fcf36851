"""Compat layer: netCDF round trip and labeled-array semantics."""
import numpy as np
import pytest
from numpy.testing import assert_allclose

from xmca_tpu.compat.xarray_lite import DataArray
from xmca_tpu.compat import netcdf


@pytest.fixture()
def da():
    rng = np.random.default_rng(0)
    return DataArray(
        rng.standard_normal((4, 3, 5)),
        dims=('time', 'lat', 'lon'),
        coords={
            'time': np.arange(4),
            'lat': np.array([10., 20., 30.]),
            'lon': np.linspace(0, 40, 5),
        },
        name='field', attrs={'units': 'K'},
    )


def test_dim_broadcast_mul(da):
    w = DataArray(np.array([1., 2., 3.]), dims=('lat',))
    out = da * w
    assert out.dims == ('time', 'lat', 'lon')
    assert_allclose(out.values, da.values * np.array([1, 2, 3])[:, None])


def test_ufunc_preserves_dims(da):
    lat = da.coords['lat']
    w = np.sqrt(np.cos(np.deg2rad(lat)) + 1e-6)
    assert isinstance(w, DataArray)
    assert w.dims == ('lat',)


def test_isel_sel(da):
    sub = da.isel(time=slice(0, 2))
    assert sub.shape == (2, 3, 5)
    one = da.sel(lat=20.0)
    assert one.dims == ('time', 'lon')
    rng_sel = da.sel(lat=slice(10, 20))
    assert rng_sel.shape == (4, 2, 5)


def test_getitem(da):
    sub = da[..., :2]
    assert sub.shape == (4, 3, 2)
    assert_allclose(sub.coords['lon'].values, da.coords['lon'].values[:2])


def test_netcdf_roundtrip(tmp_path, da):
    path = str(tmp_path / 'x.nc')
    da.to_netcdf(path)
    raw = netcdf.read_dataarray(path)
    assert raw['name'] == 'field'
    assert raw['dims'] == ('time', 'lat', 'lon')
    assert_allclose(raw['values'], da.values)
    assert_allclose(raw['coords']['lat'][0], da.coords['lat'].values)
    assert raw['attrs']['units'] == 'K'


def test_netcdf_complex_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    vals = rng.standard_normal((3, 4)) + 1j * rng.standard_normal((3, 4))
    da = DataArray(vals, dims=('a', 'b'), coords={'a': [1, 2, 3]},
                   name='cplx')
    path = str(tmp_path / 'c.nc')
    da.to_netcdf(path)
    raw = netcdf.read_dataarray(path)
    assert_allclose(raw['values'], vals)


def test_read_reference_fixture(fixtures_path):
    import os
    raw = netcdf.read_dataarray(os.path.join(fixtures_path, 'sst.nc'))
    assert raw['dims'] == ('time', 'lat', 'lon')
    assert raw['values'].shape == (492, 9, 18)


def test_netcdf_chunks_streamed_solve(tmp_path):
    """netcdf_chunks feeds from_chunks straight from disk: the streamed
    solve matches the in-memory solve of the same data."""
    from xmca_tpu.array import MCA

    rng = np.random.default_rng(5)
    n, lat, lon = 40, 12, 9
    A = rng.standard_normal((n, lat, lon))
    B = rng.standard_normal((n, lat, lon))
    A[:, 2, 3] = np.nan                       # NaN column handling
    for name, arr in (('a', A), ('b', B)):
        netcdf.write_dataarray(
            str(tmp_path / (name + '.nc')), name, arr,
            dims=('time', 'lat', 'lon'),
        )

    # tiny budget -> many slabs (lat rows split); dtype cast on read
    ld_a, n_obs, shp_a = netcdf.netcdf_chunks(
        str(tmp_path / 'a.nc'), max_chunk_bytes=40 * 9 * 8 * 3,
    )
    ld_b, _, shp_b = netcdf.netcdf_chunks(str(tmp_path / 'b.nc'))
    assert n_obs == n and shp_a == (lat, lon)
    slabs = list(ld_a())
    assert len(slabs) > 1                     # genuinely chunked
    assert sum(s.shape[1] for s in slabs) == lat * lon

    # _FillValue must be masked at the FILE dtype: after a float32
    # downcast the exact float64 sentinel no longer compares equal
    fill = 9.96920996838687e+36
    C = rng.standard_normal((n, lat, lon))
    C[:, 4, 1] = fill
    netcdf.write_dataarray(
        str(tmp_path / 'c.nc'), 'c', C, dims=('time', 'lat', 'lon'),
        attrs={'_FillValue': fill},
    )
    ld_c, _, _ = netcdf.netcdf_chunks(
        str(tmp_path / 'c.nc'), dtype=np.float32,
    )
    full = np.concatenate(list(ld_c()), axis=1).reshape(n, lat, lon)
    assert full.dtype == np.float32
    assert np.isnan(full[:, 4, 1]).all()
    assert np.isfinite(np.delete(full.reshape(n, -1), 4 * lon + 1,
                                 axis=1)).all()

    ms = MCA.from_chunks(ld_a, ld_b, n_observations=n_obs,
                         left_shape=shp_a, right_shape=shp_b)
    ms.set_solver(truncate=5)
    ms.solve()

    # labeled variant: return_coords feeds xMCA.from_chunks directly
    from xmca_tpu.xarray import xMCA
    ld_a2, _, _, dims, coords = netcdf.netcdf_chunks(
        str(tmp_path / 'a.nc'), return_coords=True,
    )
    assert dims == ('time', 'lat', 'lon')
    assert coords['lat'].size == lat and coords['time'].size == n
    mx = xMCA.from_chunks(ld_a2, None, coords=coords, dims=dims)
    mx.set_solver(truncate=4)
    mx.solve()
    eof = mx.eofs(2, rotated=False)['left']
    assert eof.dims == ('lat', 'lon', 'mode')

    mm = MCA(A, B)
    mm.set_solver(truncate=5)
    mm.solve()
    assert_allclose(ms.singular_values(), mm.singular_values(),
                    rtol=1e-8)
    es, em = ms.eofs(3, rotated=False), mm.eofs(3, rotated=False)
    for k in ('left', 'right'):
        assert_allclose(np.abs(es[k]), np.abs(em[k]), atol=1e-7)
