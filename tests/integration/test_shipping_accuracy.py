"""Accuracy of the SHIPPING TPU configuration (f32 / truncated / bf16).

The strict 1e-5 golden bar is proven in f64 (test_golden.py); production
TPU runs use float32 inputs, the truncated matmul-only solve, and bfloat16
Rule-N surrogate draws.  These tests pin what THAT configuration achieves
(measured on the reference's own fixtures; numbers recorded in PARITY.md):

* f32 exact solve: singular values within 4.2e-6 (real) / 4.2e-4
  (complex) relative; EOF entries within 6.3e-4 / 3.7e-3 absolute over
  the first 100 modes (trailing near-degenerate modes dominate the max —
  the reference's own regression bar is 1e-3);
* f32 truncated(20) solve: singular values within 1e-6 relative and
  unit-norm EOF components within 8e-6 of the f64 golden values — the
  leading-mode subspace iteration is better conditioned than the full
  dense f32 factorization;
* bfloat16 vs float32 Rule-N null quantiles: 95th-percentile shift
  <= 2e-3 relative, the same size as the Monte-Carlo noise of the
  quantile itself at 200 runs (measured 2.3e-3).
"""
import os

import numpy as np
import pytest

from tests.conftest import align_modes
from xmca_tpu.compat import open_dataarray, xr
from xmca_tpu.xarray import xMCA

N_MODES = 100


@pytest.fixture(scope='module')
def f32_fields(fixtures_path):
    out = []
    for name in ('sst.nc', 'prcp.nc'):
        da = open_dataarray(os.path.join(fixtures_path, name))
        out.append(xr.DataArray(
            np.asarray(da.values, np.float32), dims=da.dims,
            coords=da.coords, name=da.name,
        ))
    return out


def _golden(fixtures_path, analysis, n):
    sv = open_dataarray(
        os.path.join(fixtures_path, analysis, 'singular_values.nc'))[:n]
    V1 = open_dataarray(
        os.path.join(fixtures_path, analysis, 'sst_eofs.nc'))[..., :n]
    return np.asarray(sv), np.asarray(V1)


@pytest.mark.parametrize('analysis,cplx,sval_rtol,eof_atol', [
    ('std', False, 2e-5, 2e-3),
    ('cplx', True, 2e-3, 1e-2),
])
def test_golden_f32_exact(fixtures_path, f32_fields, analysis, cplx,
                          sval_rtol, eof_atol):
    sv, V1 = _golden(fixtures_path, analysis, N_MODES)
    m = xMCA(*f32_fields)
    m.solve(complexify=cplx)
    vals = np.asarray(m.singular_values(N_MODES))
    rel = np.abs(vals - sv) / np.abs(sv)
    assert rel.max() < sval_rtol

    eofs = m.eofs(N_MODES)['left']
    aligned = align_modes(eofs, V1)
    assert np.nanmax(np.abs(aligned - V1)) < eof_atol


@pytest.mark.parametrize('analysis,cplx', [
    ('std', False),
    ('cplx', True),
])
def test_golden_f32_truncated(fixtures_path, f32_fields, analysis, cplx):
    """set_solver(truncate=k) at f32: the shipping large-field path."""
    n = 20
    sv, V1 = _golden(fixtures_path, analysis, n)
    m = xMCA(*f32_fields)
    m.set_solver(truncate=n)
    m.solve(complexify=cplx)

    vals = np.asarray(m.singular_values(n))
    assert (np.abs(vals - sv) / sv).max() < 1e-5

    # exact totals survive the truncation (nuclear/Frobenius norms)
    ref_totals = {
        'std': (127.57877, 10205.578),
        'cplx': (272.4936169203272, 55813.69179539744),
    }[analysis]
    assert abs(m._analysis['total_covariance'] - ref_totals[0]) \
        / ref_totals[0] < 1e-4
    assert abs(m._analysis['total_squared_covariance'] - ref_totals[1]) \
        / ref_totals[1] < 1e-4

    # compare unit-normalized EOFs (golden vectors carry LAPACK scaling)
    ours = m.eofs(n)['left']
    aligned = align_modes(ours, V1)

    def unit(v):
        flat = np.nan_to_num(v.reshape(-1, n))
        return v / np.linalg.norm(flat, axis=0)

    assert np.nanmax(np.abs(unit(aligned) - unit(V1))) < 1e-4


@pytest.mark.slow
def test_rule_n_bf16_matches_f32_quantiles():
    """bfloat16 surrogate draws do not move the Rule-N null quantiles.

    Paired comparison (same PRNG keys, so draws differ only by
    quantization) in the shipping regime p >= n_obs through the fast
    analytic-Gram rotated pipeline.
    """
    from xmca_tpu.stats.significance import rule_n_spectra

    n_obs, n_vars = 128, (512, 512)
    kw = dict(complexify=True, rotated=True, n_rot=10, power=1,
              spectrum='fast', subspace_iters=8, seed=123, batch_size=16)
    s32, t32 = rule_n_spectra(n_obs, n_vars, 200, dtype=np.float32, **kw)
    sbf, tbf = rule_n_spectra(n_obs, n_vars, 200, dtype='bfloat16', **kw)

    # every bfloat16 surrogate must survive (jitter floor covers the
    # bf16 accumulation noise of batched Grams — regression for the
    # all-runs-non-converged failure)
    assert sbf.shape[0] == 200
    assert s32.shape[0] == 200

    s32n = s32 / t32[:, None]
    sbfn = np.asarray(sbf, np.float64) / np.asarray(tbf, np.float64)[:, None]
    for q, bound in ((0.5, 3e-3), (0.95, 6e-3)):
        q32 = np.quantile(s32n, q, axis=0)
        qbf = np.quantile(sbfn, q, axis=0)
        assert (np.abs(qbf - q32) / q32).max() < bound
