"""Plot smoke tests (reference test_integration_array.py:49-72 and
test_integration_xarray.py:343-366)."""
import matplotlib
matplotlib.use('Agg')

import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

from xmca_tpu.array import MCA  # noqa: E402
from xmca_tpu.xarray import xMCA  # noqa: E402


@pytest.mark.parametrize('uni', ['uni', 'bi'])
@pytest.mark.parametrize('flavour,n', [
    ('std', 1), ('cplx', 2), ('varmx', 3),
])
def test_plot_array(sst, prcp, uni, flavour, n):
    cplx = flavour == 'cplx'
    n_rot = 10 if flavour == 'varmx' else 0
    A = np.asarray(sst.values, dtype=np.float64)
    B = np.asarray(prcp.values, dtype=np.float64)
    model = MCA(A) if uni == 'uni' else MCA(A, B)
    model.solve(complexify=cplx)
    if n_rot > 1:
        model.rotate(n_rot)
    model.plot(n)
    plt.close('all')


@pytest.mark.parametrize('uni', ['uni', 'bi'])
@pytest.mark.parametrize('flavour,n', [
    ('std', 1), ('cplx', 2), ('varmx', 3),
])
def test_plot_xarray(sst, prcp, uni, flavour, n):
    cplx = flavour == 'cplx'
    n_rot = 10 if flavour == 'varmx' else 0
    model = xMCA(sst) if uni == 'uni' else xMCA(sst, prcp)
    model.solve(complexify=cplx)
    if n_rot > 1:
        model.rotate(n_rot)
    fig, axes = model.plot(n)
    assert 'pc' in axes and 'eof' in axes
    plt.close('all')


def test_save_plot(sst, prcp, tmp_path):
    model = xMCA(sst, prcp)
    model.solve()
    out = str(tmp_path / 'mode1.png')
    model.save_plot(1, path=out)
    import os
    assert os.path.getsize(out) > 0
    plt.close('all')


def test_plot_vertical_orientation(sst, prcp):
    model = xMCA(sst, prcp)
    model.solve(complexify=True)
    fig, axes = model.plot(1, orientation='vertical')
    plt.close('all')
