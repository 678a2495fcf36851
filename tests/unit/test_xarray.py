"""Input contract of the labeled-array API (mirror of reference
tests/unit/test_xarray.py:30-38)."""
import numpy as np
import pytest

from xmca_tpu.compat import xr
from xmca_tpu.xarray import xMCA


@pytest.fixture(scope='module')
def data():
    np.random.seed(777)
    A = xr.DataArray(np.random.rand(500, 20, 15),
                     dims=['time', 'lat', 'lon'])
    np.random.seed(888)
    B = xr.DataArray(np.random.rand(500, 15, 10),
                     dims=['time', 'lat', 'lon'])
    return A, B


def test_input(data):
    A, B = data
    xMCA()
    xMCA(A)
    xMCA(A, B)
    with pytest.raises(ValueError):
        xMCA(A, B, A)
    with pytest.raises(TypeError):
        xMCA(np.array([1, 2, 3]))
