"""Import-path parity of the tools modules (reference xmca/tools/*)."""
import numpy as np
import pytest
from numpy.testing import assert_allclose


def test_rotation_entry_points():
    from xmca_tpu.tools.rotation import varimax, promax
    rng = np.random.default_rng(0)
    A = rng.standard_normal((50, 6))
    B, R = varimax(A)
    assert_allclose(R.T @ R, np.eye(6), atol=1e-8)
    assert_allclose(B, A @ R, atol=1e-8)
    Bp, Rp, phi = promax(A, power=4)
    assert phi.shape == (6, 6)
    assert_allclose(np.diag(phi), np.ones(6), atol=1e-8)


def test_promax_single_column_branch(capsys):
    from xmca_tpu.tools.rotation import promax
    A = np.random.default_rng(1).standard_normal((10, 1))
    B, R, phi = promax(A)
    assert 'Cannot rotate 1 PC' in capsys.readouterr().out
    assert_allclose(B, A)


def test_pearsonr_matches_scipy():
    import scipy.stats
    from xmca_tpu.tools.array import pearsonr
    rng = np.random.default_rng(2)
    x = rng.standard_normal((80, 4))
    y = rng.standard_normal((80, 3))
    r, p = pearsonr(x, y)
    for i in range(4):
        for j in range(3):
            rr, pp = scipy.stats.pearsonr(x[:, i], y[:, j])
            assert abs(r[i, j] - rr) < 1e-10
            assert abs(p[i, j] - pp) < 1e-8


def test_block_bootstrap():
    from xmca_tpu.tools.array import block_bootstrap
    rng = np.random.default_rng(3)
    arr = rng.standard_normal((24, 5))
    np.random.seed(0)
    out = block_bootstrap(arr, block_size=4)
    assert out.shape == arr.shape
    # blocks stay intact: every output block is one of the input blocks
    blocks_in = arr.reshape(-1, 4, 5)
    blocks_out = out.reshape(-1, 4, 5)
    for b in blocks_out:
        assert any(np.array_equal(b, bi) for bi in blocks_in)
    with pytest.raises(ValueError):
        block_bootstrap(arr, block_size=7)
    with pytest.raises(ValueError):
        block_bootstrap(arr, axis=2)
    # permutation (no replacement) is a reordering of the blocks
    np.random.seed(1)
    perm = block_bootstrap(arr, block_size=4, replace=False)
    assert_allclose(np.sort(perm.ravel()), np.sort(arr.ravel()))


def test_xarray_tools():
    from xmca_tpu.compat import xr
    from xmca_tpu.tools.xarray import (is_DataArray, wrap_lon_to_180,
                                       get_extent)
    da = xr.DataArray(
        np.arange(12.).reshape(3, 4), dims=('lat', 'lon'),
        coords={'lat': [-10., 0., 10.], 'lon': [0., 90., 180., 270.]},
    )
    is_DataArray(da)
    with pytest.raises(TypeError):
        is_DataArray(np.zeros(3))
    wrapped = wrap_lon_to_180(da)
    # reference convention maps 180 -> -180 (xmca/tools/xarray.py:52)
    assert_allclose(np.sort(wrapped.coords['lon'].values),
                    [-180., -90., 0., 90.])
    ext = get_extent(da)
    assert ext[2] == -10. and ext[3] == 10.


def test_nan_tools_reexport():
    from xmca_tpu.tools.array import (get_nan_cols, remove_nan_cols,
                                      has_nan_time_steps, remove_mean)
    arr = np.ones((4, 3))
    arr[2, 1] = np.nan
    assert get_nan_cols(arr).tolist() == [False, True, False]
    assert remove_nan_cols(arr).shape == (4, 2)
    assert not has_nan_time_steps(arr)
    assert_allclose(remove_mean(np.arange(4.)[:, None]).ravel(),
                    [-1.5, -0.5, 0.5, 1.5])
