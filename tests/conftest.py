"""Test configuration: CPU backend with 8 virtual devices, float64.

Multi-chip sharding is validated on a virtual CPU mesh
(``xla_force_host_platform_device_count``); numerical parity against the
reference fixtures runs in float64.  The same code paths compile for TPU
(f32/c64) — see ``__graft_entry__.py`` and ``bench.py``.
"""
import os
import sys

os.environ.setdefault(
    'XLA_FLAGS',
    '--xla_force_host_platform_device_count=8 '
    + os.environ.get('XLA_FLAGS', '')
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# the axon TPU plugin force-registers itself; tests run on CPU
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

FIXTURES = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), 'integration', 'fixtures'
)
REFERENCE_FIXTURES = '/root/reference/tests/integration/fixtures'


def fixture_dir():
    """Prefer the reference's own fixture directory when mounted."""
    if os.path.isdir(REFERENCE_FIXTURES):
        return REFERENCE_FIXTURES
    return FIXTURES


@pytest.fixture(scope='session')
def fixtures_path():
    path = fixture_dir()
    if not os.path.isdir(path):
        pytest.skip('no fixture directory available')
    return path


@pytest.fixture(scope='session')
def sst(fixtures_path):
    from xmca_tpu.compat import open_dataarray
    return open_dataarray(os.path.join(fixtures_path, 'sst.nc'))


@pytest.fixture(scope='session')
def prcp(fixtures_path):
    from xmca_tpu.compat import open_dataarray
    return open_dataarray(os.path.join(fixtures_path, 'prcp.nc'))


def _to_f64(da):
    from xmca_tpu.compat import xr
    return xr.DataArray(
        np.asarray(da.values, dtype=np.float64), dims=da.dims,
        coords=da.coords, name=da.name, attrs=da.attrs,
    )


@pytest.fixture(scope='session')
def sst64(sst):
    """float64 copy — the parity-mode precision for the strict 1e-5 bar."""
    return _to_f64(sst)


@pytest.fixture(scope='session')
def prcp64(prcp):
    return _to_f64(prcp)


def align_modes(ours, ref, axis=-2):
    """Multiply each mode of `ours` by the unit factor best matching `ref`.

    Singular vectors are unique only up to a per-mode sign (real) or unit
    phase (complex); the reference's fixtures carry LAPACK's arbitrary
    convention while XLA uses its own.  Alignment by the phase of the inner
    product is exact for non-degenerate modes.
    """
    o = np.asarray(ours)
    r = np.asarray(ref)
    flat_o = o.reshape(-1, o.shape[-1])
    flat_r = r.reshape(-1, r.shape[-1])
    valid = ~np.isnan(flat_r[:, 0])
    ip = np.nansum(np.conj(flat_o[valid]) * flat_r[valid], axis=0)
    denom = np.abs(ip)
    phase = np.where(denom > 0, ip / np.where(denom > 0, denom, 1), 1.0)
    return o * phase
