"""Constructor and shape contracts of the ndarray API.

Mirror of the reference's unit suite (tests/unit/test_array.py:20-50).
"""
import numpy as np
import pytest

from xmca_tpu.array import MCA


@pytest.fixture(scope='module')
def data():
    np.random.seed(7)
    A = np.random.rand(500, 20, 15)
    np.random.seed(8)
    B = np.random.rand(500, 15, 10)
    return A, B


def test_mca_input(data):
    A, B = data
    MCA()
    MCA(A)
    MCA(A, B)
    with pytest.raises(ValueError):
        MCA(A, B, A)
    with pytest.raises(ValueError):
        MCA(A[:-1], B)
    with pytest.raises(TypeError):
        MCA([1, 2, 3])
    A_with_nan = A.copy()
    A_with_nan[1, :] = np.nan
    with pytest.raises(ValueError):
        MCA(A_with_nan, B)


def test_partial_nan_columns_ok(data):
    A, B = data
    A_col_nan = A.copy()
    A_col_nan[:, 0, 0] = np.nan
    m = MCA(A_col_nan, B)
    m.solve()
    eofs = m.eofs(5)
    assert np.isnan(eofs['left'][0, 0, :]).all()
    assert not np.isnan(eofs['left'][1:, :, :]).any()


def test_pcs_shape(data):
    A, B = data
    rank = min(np.prod(A.shape[1:]), np.prod(B.shape[1:]))
    mca = MCA(A, B)
    mca.solve()
    pcs = mca.pcs()
    assert pcs['left'].shape == (A.shape[0], rank)
    assert pcs['right'].shape == (B.shape[0], rank)


def test_eofs_shape(data):
    A, B = data
    rank = min(np.prod(A.shape[1:]), np.prod(B.shape[1:]))
    mca = MCA(A, B)
    mca.solve()
    eofs = mca.eofs()
    assert eofs['left'].shape == A.shape[1:] + (rank,)
    assert eofs['right'].shape == B.shape[1:] + (rank,)


def test_unsolved_getters_raise(data):
    A, B = data
    m = MCA(A, B)
    for call in [m.singular_values, m.pcs, m.eofs, m.norm, m.variance]:
        with pytest.raises(RuntimeError):
            call()


def test_empty_solve_raises():
    with pytest.raises(RuntimeError):
        MCA().solve()
