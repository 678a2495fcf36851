"""Golden regression against the reference's committed fixtures.

The reference's own bar is atol=rtol=1e-3 over the first 100 modes
(tests/integration/test_integration_xarray.py:33-35,54-85).  We assert the
same bar after per-mode phase alignment (XLA and LAPACK use different —
equally arbitrary — sign/phase conventions) and additionally a 1e-5
absolute bar on the aligned EOF entries, the BASELINE.md target.
"""
import os

import numpy as np
import pytest
from numpy.testing import assert_allclose

from tests.conftest import align_modes
from xmca_tpu.compat import open_dataarray
from xmca_tpu.xarray import xMCA

N_MODES = 100
TOLS = {'atol': 1e-3, 'rtol': 1e-3}
STRICT_ATOL = 1e-5


def _load_golden(path, n):
    sv = open_dataarray(os.path.join(path, 'singular_values.nc'))[:n]
    V1 = open_dataarray(os.path.join(path, 'sst_eofs.nc'))[..., :n]
    V2 = open_dataarray(os.path.join(path, 'prcp_eofs.nc'))[..., :n]
    return sv, V1, V2


@pytest.mark.parametrize('analysis,cplx,n_rot', [
    ('std', False, 0),
    ('rot', False, 10),
    ('cplx', True, 0),
])
def test_perform_svd(fixtures_path, sst64, prcp64, analysis, cplx, n_rot):
    sv, V1, V2 = _load_golden(
        os.path.join(fixtures_path, analysis), N_MODES
    )
    model = xMCA(sst64, prcp64)
    model.set_field_names('sst', 'prcp')
    model.solve(complexify=cplx)
    vals = np.asarray(model.singular_values(N_MODES))
    eofs = model.eofs(N_MODES)

    assert_allclose(np.asarray(sv), vals,
                    err_msg='svalues do not match', **TOLS)
    for ours, ref, name in [
        (eofs['left'], V1, 'sst'), (eofs['right'], V2, 'prcp')
    ]:
        aligned = align_modes(ours, ref)
        assert_allclose(aligned, np.asarray(ref),
                        err_msg='%s eofs do not match' % name, **TOLS)
        # BASELINE.md target: modes within 1e-5 of the reference
        diff = np.abs(aligned - np.asarray(ref))
        assert np.nanmax(diff) < STRICT_ATOL, (
            '%s eofs exceed strict 1e-5 bar: %g' % (name, np.nanmax(diff))
        )


def test_totals_match_fixture_statistics(sst, prcp):
    """Reproducible fixture statistics (BASELINE.md)."""
    m = xMCA(sst, prcp)
    m.solve()
    assert abs(
        m._analysis['total_covariance'] - 127.57877
    ) / 127.57877 < 1e-5
    assert abs(
        m._analysis['total_squared_covariance'] - 10205.578
    ) / 10205.578 < 1e-5
    assert m._analysis['rank'] == 155

    mc = xMCA(sst, prcp)
    mc.solve(complexify=True)
    assert abs(
        mc._analysis['total_covariance'] - 272.4936169203272
    ) / 272.49 < 1e-4
    assert abs(
        mc._analysis['total_squared_covariance'] - 55813.69179539744
    ) / 55813.69 < 1e-4


def test_load_reference_written_analysis(fixtures_path):
    """Analyses saved by the *reference* load directly (C11 parity)."""
    model = xMCA()
    model.load_analysis(
        os.path.join(fixtures_path, 'std', 'info.xmca')
    )
    assert model._analysis['is_bivariate']
    assert model._analysis['rank'] == 155
    sv, V1, V2 = _load_golden(
        os.path.join(fixtures_path, 'std'), N_MODES
    )
    assert_allclose(
        np.asarray(model.singular_values(N_MODES)), np.asarray(sv), **TOLS
    )
    # stored EOFs are reused verbatim on load
    assert_allclose(
        np.asarray(model.eofs(N_MODES, rotated=False)['left']),
        np.asarray(V1), **TOLS
    )


def test_load_rotated_reference_analysis(fixtures_path):
    """Rotation is recomputed on load (reference xmca/array.py:2009-2012)."""
    model = xMCA()
    model.load_analysis(
        os.path.join(fixtures_path, 'rot', 'info.xmca')
    )
    assert model._analysis['is_rotated']
    assert model._analysis['n_rot'] == 10
    rotated = model.eofs(10)
    assert np.asarray(rotated['left']).shape[-1] == 10
