"""Import-path parity module: ``from xmca_tpu.xarray import xMCA``.

Mirrors the reference's ``from xmca.xarray import xMCA`` entry point
(reference: xmca/xarray.py:23).
"""
from xmca_tpu.api.xarray import xMCA

__all__ = ['xMCA']
