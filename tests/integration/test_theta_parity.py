"""Quantified parity of the batched Theta extension vs a per-series oracle.

statsmodels cannot be installed in this image, so the comparison target is
``tests/oracles/theta_oracle.py`` — an independent numpy/scipy
implementation of the documented ThetaModel equations the reference
invokes (/root/reference/xmca/array.py:367-376), with the SES parameters
fitted by a scipy optimizer exactly where statsmodels optimizes.

Measured deviations (f64, sst/prcp fixtures, period=12 — recorded in
PARITY.md):
* forecasts: max 1.1e-3 of the series' std, median 1.6e-5;
* induced error on solve(complexify=True, extend='theta') modes:
  first-10 singular values within 8e-4 relative; unit-norm EOF
  components within 5e-3 (left) / 2.2e-2 (right, near-degenerate
  trailing modes) after phase alignment; leading mode 1.3e-5 / 2.3e-4.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import align_modes
from tests.oracles.theta_oracle import theta_forecast_series
from xmca_tpu.xarray import xMCA
from xmca_tpu.core import preprocess as pre
from xmca_tpu.core.theta import theta_forecast
from xmca_tpu.core.solver import solve_mca

PERIOD = 12


@pytest.fixture(scope='module')
def centered(sst64, prcp64):
    m = xMCA(sst64, prcp64)
    return {k: np.asarray(v, dtype=np.float64)
            for k, v in m._fields.items()}


def _oracle_forecast_field(f, steps, period=PERIOD):
    return np.stack([
        theta_forecast_series(f[:, j], steps, period)
        for j in range(f.shape[1])
    ], axis=1)


def test_theta_forecast_matches_oracle(centered):
    f = centered['left']
    n = f.shape[0]
    ours = np.asarray(theta_forecast(f, steps=n, period=PERIOD, theta=20.0))
    oracle = _oracle_forecast_field(f, n)
    dev = np.max(np.abs(ours - oracle), axis=0) / f.std(axis=0)
    assert dev.max() < 3e-3
    assert np.median(dev) < 1e-4


def test_theta_unseasonal_path_matches_oracle(centered):
    """period=1 skips deseasonalization in both implementations."""
    f = centered['left'][:, ::8]
    n = f.shape[0]
    ours = np.asarray(theta_forecast(f, steps=n, period=1, theta=20.0))
    oracle = np.stack([
        theta_forecast_series(f[:, j], n, period=1)
        for j in range(f.shape[1])
    ], axis=1)
    dev = np.max(np.abs(ours - oracle), axis=0) / f.std(axis=0)
    assert dev.max() < 3e-3


def _oracle_complexify(f, period=PERIOD):
    """The reference's _complexify with oracle theta forecasts
    (xmca/array.py:429-472): [backcast | field | forecast] -> analytic
    signal -> middle third -> re-center."""
    n = f.shape[0]
    post = _oracle_forecast_field(f, n, period)
    back = _oracle_forecast_field(f[::-1], n, period)[::-1]
    full = np.concatenate([back, f, post], axis=0)
    z = np.asarray(pre.analytic_signal(jnp.asarray(full)))[n:2 * n]
    return z - z.mean(axis=0)


@pytest.mark.slow
def test_theta_extension_induced_mode_error(centered):
    """Bound the deviation the re-derived theta induces on the solved
    complex-extended modes (solve(complexify=True, extend='theta'))."""
    Z_ours, Z_oracle = {}, {}
    for k, f in centered.items():
        Z_ours[k] = np.asarray(
            pre.complexify(jnp.asarray(f), extend='theta', period=PERIOD)
        )
        Z_oracle[k] = _oracle_complexify(f)

    s_u, Vl_u, Vr_u = (np.asarray(x) for x in solve_mca(
        jnp.asarray(Z_ours['left']), jnp.asarray(Z_ours['right'])))
    s_o, Vl_o, Vr_o = (np.asarray(x) for x in solve_mca(
        jnp.asarray(Z_oracle['left']), jnp.asarray(Z_oracle['right'])))

    n_check = 10
    rel_s = np.abs(s_u[:n_check] - s_o[:n_check]) / s_o[:n_check]
    assert rel_s.max() < 2e-3

    Vl_a = align_modes(Vl_u[:, :n_check], Vl_o[:, :n_check])
    Vr_a = align_modes(Vr_u[:, :n_check], Vr_o[:, :n_check])
    assert np.abs(Vl_a - Vl_o[:, :n_check]).max() < 1.5e-2
    assert np.abs(Vr_a - Vr_o[:, :n_check]).max() < 5e-2
    # the leading (well-separated) mode is pinned much tighter
    assert rel_s[0] < 1e-4
    assert np.abs(Vl_a[:, 0] - Vl_o[:, 0]).max() < 1e-4
    assert np.abs(Vr_a[:, 0] - Vr_o[:, 0]).max() < 1e-3


# ---------------------------------------------------------------------------
# Differential against the reference's ACTUAL dependency.  statsmodels is
# absent from the TPU image; these run in the full-deps CI leg
# (.github/workflows/test.yml, job test-full-deps) and skip elsewhere.
# ---------------------------------------------------------------------------

def _statsmodels_forecast_field(f, steps, period=PERIOD):
    """Per-column ThetaModel forecasts exactly as the reference invokes
    them (/root/reference/xmca/array.py:367-376)."""
    sm_theta = pytest.importorskip('statsmodels.tsa.forecasting.theta')
    import pandas as pd
    cols = []
    for j in range(f.shape[1]):
        fit = sm_theta.ThetaModel(
            pd.Series(f[:, j]), period=period,
            deseasonalize=True, use_test=False,
        ).fit()
        cols.append(np.asarray(fit.forecast(steps=steps, theta=20)))
    return np.stack(cols, axis=1)


def test_theta_forecast_matches_statsmodels(centered):
    f = centered['left'][:, ::16]          # keep the per-column loop modest
    n = f.shape[0]
    ours = np.asarray(theta_forecast(f, steps=n, period=PERIOD, theta=20.0))
    ref = _statsmodels_forecast_field(f, n)
    dev = np.max(np.abs(ours - ref), axis=0) / f.std(axis=0)
    assert dev.max() < 3e-3
    assert np.median(dev) < 2e-4


def test_oracle_matches_statsmodels(centered):
    """Validates the bundled oracle itself against statsmodels — the
    chain oracle==statsmodels plus the oracle-based bounds above pins
    the batched theta to the reference's dependency."""
    f = centered['left'][:, ::64]
    n = f.shape[0]
    ref = _statsmodels_forecast_field(f, n)
    oracle = _oracle_forecast_field(f, n)
    dev = np.max(np.abs(oracle - ref), axis=0) / f.std(axis=0)
    assert dev.max() < 1e-3
