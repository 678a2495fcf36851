"""Save/load round trips (C11) against our own files and golden fixtures."""
import os

import numpy as np
import pytest
from numpy.testing import assert_allclose

from tests.conftest import align_modes
from xmca_tpu.compat import open_dataarray
from xmca_tpu.xarray import xMCA

TOLS = {'atol': 1e-3, 'rtol': 1e-3}
N = 100


@pytest.mark.parametrize('analysis,cplx,n_rot', [
    ('std', False, 0),
    ('rot', False, 10),
    ('cplx', True, 0),
])
def test_save_load(fixtures_path, sst64, prcp64, tmp_path, analysis, cplx,
                   n_rot):
    sv = open_dataarray(
        os.path.join(fixtures_path, analysis, 'singular_values.nc')
    )[:N]
    V1 = open_dataarray(
        os.path.join(fixtures_path, analysis, 'sst_eofs.nc')
    )[..., :N]

    model = xMCA(sst64, prcp64)
    model.set_field_names('sst', 'prcp')
    model.solve(complexify=cplx)
    if n_rot > 1:
        model.rotate(n_rot)
    model.save_analysis(str(tmp_path / 'a'))

    new = xMCA()
    new.load_analysis(str(tmp_path / 'a' / 'info.xmca'))
    vals = np.asarray(new.singular_values(N))
    eofs = new.eofs(N, rotated=False)
    assert_allclose(np.asarray(sv), vals, **TOLS)
    assert_allclose(
        align_modes(eofs['left'], V1), np.asarray(V1), **TOLS
    )
    # loaded analysis metadata round trips
    for key in ['is_bivariate', 'is_complex', 'is_rotated', 'n_rot',
                'rank']:
        assert new._analysis[key] == model._analysis[key]


def test_save_load_coslat(sst, prcp, tmp_path):
    """Coslat weighting round trip (Issue-25 regression,
    reference test_integration_xarray.py:130-146)."""
    model = xMCA(sst, prcp)
    model.normalize()
    model.apply_coslat()
    model.solve()
    fields = model.fields()
    model.save_analysis(str(tmp_path / 'c'))

    reload = xMCA()
    reload.load_analysis(str(tmp_path / 'c' / 'info.xmca'))
    reload.apply_coslat()
    fields_reloaded = reload.fields()
    for f, r in zip(fields.values(), fields_reloaded.values()):
        assert_allclose(np.asarray(f), np.asarray(r), **TOLS)


def test_info_file_format(sst, prcp, tmp_path):
    """info.xmca layout parity: parseable by the reference's reader."""
    model = xMCA(sst, prcp)
    model.set_field_names('sst', 'prcp')
    model.solve()
    model.save_analysis(str(tmp_path / 'f'))
    info = (tmp_path / 'f' / 'info.xmca').read_text()
    for key in ['left', 'right', 'is_bivariate', 'is_normalized',
                'is_coslat_corrected', 'method', 'is_complex', 'extend',
                'theta_period', 'is_rotated', 'n_rot', 'power',
                'is_truncated', 'is_truncated_at', 'rank',
                'total_covariance', 'total_squared_covariance',
                'version']:
        assert any(
            line.split(':')[0].strip() == key
            for line in info.splitlines() if line and line[0] != '#'
        ), 'missing key %s' % key
    # fixed-width "key : value" layout ('{:<20} : ...'; long keys overflow
    # exactly like the reference's own files)
    for line in info.splitlines():
        if line and line[0] != '#' and ':' in line:
            key = line.split(':')[0]
            assert line.index(':') == max(21, len(key))


def test_saved_netcdf_readable_files(sst, prcp, tmp_path):
    model = xMCA(sst, prcp)
    model.set_field_names('sst', 'prcp')
    model.solve(complexify=True)
    model.save_analysis(str(tmp_path / 'n'))
    for fname in ['singular_values.nc', 'sst_eofs.nc', 'prcp_eofs.nc',
                  'sst.nc', 'prcp.nc']:
        da = open_dataarray(str(tmp_path / 'n' / fname))
        assert da.values.size > 0
    eofs = open_dataarray(str(tmp_path / 'n' / 'sst_eofs.nc'))
    assert np.iscomplexobj(eofs.values)
    assert eofs.dims == ('lat', 'lon', 'mode')
