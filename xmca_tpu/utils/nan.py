"""Host-side NaN-column utilities.

The reference drops NaN columns dynamically at runtime
(xmca/tools/array.py:26-73).  On TPU, shapes inside jit must be static, so
these helpers run **on host** during ingestion: they compute a static boolean
mask once, the packed (NaN-free) array is shipped to device, and getters
scatter NaNs back on the way out.  All downstream jitted code sees fixed
shapes.
"""
import numpy as np


def get_nan_cols(arr):
    """Boolean index of columns (axis=1) containing at least one NaN.

    Parity: reference xmca/tools/array.py:26-42.
    """
    return np.isnan(arr).any(axis=0)


def remove_nan_cols(arr):
    """Drop columns containing NaNs (parity: xmca/tools/array.py:45-62)."""
    return arr[:, ~get_nan_cols(arr)]


def has_nan_time_steps(array):
    """True if any time step (axis 0 row) is entirely NaN.

    Parity: reference xmca/tools/array.py:65-73.
    """
    return bool(np.isnan(array).all(axis=tuple(range(1, array.ndim))).any())


def remove_mean(arr):
    """Remove the temporal (axis 0) mean (parity: xmca/tools/array.py:14-23)."""
    with np.errstate(invalid='ignore'):
        return arr - arr.mean(axis=0)
