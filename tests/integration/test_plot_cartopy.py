"""Execute the CARTOPY branch of the map plotting with a faithful mock.

cartopy is not installable in this image, so the geo path
(projection axes, ``set_extent``, ``coastlines``, ``add_feature(LAND)``,
``transform=`` on pcolormesh — reference xmca/xarray.py:989-1237) would
otherwise never run.  The mock implements matplotlib's actual projection
protocol (``_as_mpl_axes``), so ``fig.add_subplot(..., projection=...)``
really constructs the fake GeoAxes class and every cartopy call site in
``xmca_tpu.viz.plot._MapCanvas`` executes.
"""
import sys
import types

import matplotlib
matplotlib.use('Agg')

import matplotlib.axes as maxes  # noqa: E402
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

from xmca_tpu.xarray import xMCA  # noqa: E402


class FakeGeoAxes(maxes.Axes):
    """Axes subclass recording the geo calls the plot code makes."""

    name = 'fake_geo'

    def __init__(self, *args, **kwargs):
        kwargs.pop('map_projection', None)
        super().__init__(*args, **kwargs)
        self.geo_calls = {'extent': None, 'coastlines': None, 'land': None}

    def pcolormesh(self, *args, **kwargs):
        # cartopy would interpret the CRS; the mock just records + drops it
        self._last_transform = kwargs.pop('transform', None)
        return super().pcolormesh(*args, **kwargs)

    def set_extent(self, extent, crs=None):
        self.geo_calls['extent'] = list(extent)

    def coastlines(self, lw=None, resolution=None):
        self.geo_calls['coastlines'] = (lw, resolution)

    def add_feature(self, feature, **kwargs):
        self.geo_calls['land'] = (feature, kwargs)


class FakePlateCarree:
    def __init__(self, central_longitude=0):
        self.proj4_params = {'lon_0': central_longitude}

    def _as_mpl_axes(self):
        return FakeGeoAxes, {}


LAND_SENTINEL = object()


@pytest.fixture()
def fake_cartopy(monkeypatch):
    crs = types.ModuleType('cartopy.crs')
    crs.PlateCarree = FakePlateCarree
    feature = types.ModuleType('cartopy.feature')
    feature.LAND = LAND_SENTINEL
    root = types.ModuleType('cartopy')
    root.crs = crs
    root.feature = feature
    monkeypatch.setitem(sys.modules, 'cartopy', root)
    monkeypatch.setitem(sys.modules, 'cartopy.crs', crs)
    monkeypatch.setitem(sys.modules, 'cartopy.feature', feature)
    yield
    plt.close('all')


@pytest.fixture(scope='module')
def solved(sst, prcp):
    m = xMCA(sst, prcp)
    m.set_field_names('sst', 'prcp')
    m.solve(complexify=True)
    return m


def test_map_panels_are_projection_axes(fake_cartopy, solved):
    fig, axes = solved.plot(1)
    for key in ('left', 'right'):
        for panel in ('eof', 'phase'):
            ax = axes[panel][key]
            assert isinstance(ax, FakeGeoAxes)
            assert ax._last_transform is not None
            assert isinstance(ax._last_transform, FakePlateCarree)
    # PC panels stay plain axes
    assert not isinstance(axes['pc']['left'], FakeGeoAxes)


def test_geo_decorations_applied(fake_cartopy, solved):
    fig, axes = solved.plot(1, resolution='50m')
    ax = axes['eof']['left']
    lw, res = ax.geo_calls['coastlines']
    assert res == '50m' and lw == .4
    feature, kwargs = ax.geo_calls['land']
    assert feature is LAND_SENTINEL
    assert kwargs.get('zorder') == 0
    assert kwargs.get('color') == '#808080'


def test_extent_wraps_longitude(fake_cartopy, solved):
    fig, axes = solved.plot(1)
    lat = np.asarray(solved._field_coords['left']['lat'].values)
    extent = axes['eof']['left'].geo_calls['extent']
    east, west, south, north = extent
    assert -180.1 <= east < west <= 180.1
    assert south == pytest.approx(float(lat.min()))
    assert north == pytest.approx(float(lat.max()))


def test_projection_override_per_field(fake_cartopy, solved):
    shifted = FakePlateCarree(central_longitude=180)
    fig, axes = solved.plot(
        1, projection={'left': shifted}
    )
    # the central longitude of the field's own projection shifts its extent
    e_left = axes['eof']['left'].geo_calls['extent']
    e_right = axes['eof']['right'].geo_calls['extent']
    assert e_left[0] == pytest.approx(e_right[0] + 180)


def test_single_projection_applies_to_all(fake_cartopy, solved):
    proj = FakePlateCarree(central_longitude=30)
    fig, axes = solved.plot(1, projection=proj)
    # the default-projection extent, for comparison
    fig0, axes0 = solved.plot(1)
    for key in ('left', 'right'):
        assert isinstance(axes['eof'][key], FakeGeoAxes)
        # the SHARED projection's central longitude shifts every
        # field's extent relative to the default projection
        assert axes['eof'][key].geo_calls['extent'][0] == pytest.approx(
            axes0['eof'][key].geo_calls['extent'][0] + 30
        )


def test_vertical_orientation_with_cartopy(fake_cartopy, solved):
    fig, axes = solved.plot(2, orientation='vertical')
    assert isinstance(axes['eof']['left'], FakeGeoAxes)
    assert 'cb' in axes['eof'] and 'cb' in axes['phase']


def test_resolution_off_skips_coastlines(fake_cartopy, solved):
    fig, axes = solved.plot(1, resolution='none', land=False)
    ax = axes['eof']['left']
    assert ax.geo_calls['coastlines'] is None
    assert ax.geo_calls['land'] is None
