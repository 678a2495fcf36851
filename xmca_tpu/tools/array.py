"""Array helpers — reference-compatible entry points
(xmca/tools/array.py:14-138)."""
import numpy as np

from xmca_tpu.utils.nan import (get_nan_cols, has_nan_time_steps,  # noqa: F401
                                remove_mean, remove_nan_cols)


def pearsonr(x, y):
    """Column-wise Pearson correlation of two 2-D arrays + p-values.

    Parity with reference xmca/tools/array.py:76-88 (p-values from the
    beta distribution on [-1, 1]).
    """
    if x.shape[0] != y.shape[0]:
        raise ValueError('Time dimensions are different.')
    n = x.shape[0]
    xc = x - x.mean(axis=0)
    yc = y - y.mean(axis=0)
    r = (xc.conj().T @ yc) / np.outer(
        np.linalg.norm(xc, axis=0), np.linalg.norm(yc, axis=0)
    )
    from scipy.special import betainc
    a = n / 2.0 - 1.0
    p = 2 * betainc(a, a, np.clip((1.0 - np.abs(r)) / 2.0, 0, 1))
    return r, p


def block_bootstrap(arr, axis=0, block_size=1, replace=True):
    """(Moving-block) bootstrap resampling of a 2-D array.

    Parity with reference xmca/tools/array.py:91-138; uses numpy's global
    RNG like the reference.  The device-side, key-driven equivalent lives
    in :mod:`xmca_tpu.stats.significance`.
    """
    if axis == 0:
        pass
    elif axis == 1:
        arr = arr.T
    else:
        raise ValueError('{:} not a valid axis. either 0 or 1.'.format(axis))

    n_obs, n_vars = arr.shape
    try:
        block_arr = arr.reshape(-1, block_size, arr.shape[1])
    except ValueError as err:
        raise ValueError(
            'Length of data array ({:}) must be a multiple of block size '
            '{:}'.format(n_obs, block_size)
        ) from err
    n_samples = block_arr.shape[0]
    idx_samples = np.random.choice(
        n_samples, size=n_samples, replace=replace
    )
    new_arr = block_arr[idx_samples].reshape(arr.shape)
    if axis == 1:
        new_arr = new_arr.T
    return new_arr
