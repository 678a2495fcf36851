"""Compatibility shims for optional dependencies.

``xmca_tpu.compat.xr`` resolves to the real :mod:`xarray` package when it is
installed, and to :mod:`xmca_tpu.compat.xarray_lite` otherwise.  The public
``xMCA`` API is written against the common subset, so user code works the
same either way (with real xarray giving richer objects).
"""

try:
    import xarray as xr  # noqa: F401
    HAS_XARRAY = True
except ImportError:  # pragma: no cover - depends on environment
    from xmca_tpu.compat import xarray_lite as xr  # noqa: F401
    HAS_XARRAY = False

try:
    import cartopy  # noqa: F401
    HAS_CARTOPY = True
except ImportError:  # pragma: no cover
    HAS_CARTOPY = False


def open_dataarray(path, engine=None, **kwargs):
    """Open a single-variable netCDF file with whatever backend is available.

    Prefers real xarray (netcdf4/h5netcdf engines); falls back to the
    built-in h5py-based reader which handles the netCDF4/HDF5 layout used by
    the reference's fixtures, including complex data written through
    h5netcdf's ``invalid_netcdf`` mode.
    """
    if HAS_XARRAY:
        try:
            return xr.open_dataarray(path, engine=engine, **kwargs)
        except (ValueError, ImportError, OSError):
            pass
    from xmca_tpu.compat import xarray_lite
    return xarray_lite.open_dataarray(path)


def netcdf_chunks(path, **kwargs):
    """Out-of-core chunk loader over a netCDF variable — see
    :func:`xmca_tpu.compat.netcdf.netcdf_chunks`.  Feeds
    ``MCA.from_chunks`` / ``xMCA.from_chunks`` straight from disk."""
    from xmca_tpu.compat.netcdf import netcdf_chunks as _chunks
    return _chunks(path, **kwargs)
