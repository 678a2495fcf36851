"""Independent per-series Theta-method oracle (numpy + scipy only).

statsmodels is not installable in this image, so this module re-implements
the *documented* model that the reference invokes
(``ThetaModel(series, period, deseasonalize=True, use_test=False).fit()
.forecast(steps, theta=20)``, /root/reference/xmca/array.py:367-376) from
its published equations, one series at a time, with scipy numerical
optimization where statsmodels optimizes:

1. classical seasonal decomposition (centered moving average, NaN-aware
   per-phase means over all cycles, normalized factors), multiplicative
   when the series is strictly positive else additive — statsmodels
   ``method='auto'`` semantics;
2. simple exponential smoothing fitted by SSE minimization over BOTH the
   smoothing parameter and the initial level (Gaussian MLE and SSE
   minimization coincide for SES);
3. drift ``b0`` = OLS trend slope of the deseasonalized series;
4. ``forecast(h) = l_T + (1 - 1/theta) * b0 *
   (h - 1 + 1/alpha - (1-alpha)^T / alpha)``, re-seasonalized.

It deliberately shares NO code with ``xmca_tpu.core.theta`` (which is a
batched JAX re-derivation with a grid-search SES fit): the tests in
``test_theta_parity.py`` quantify the deviation between the two.
"""
import numpy as np
from scipy.optimize import minimize
from scipy.signal import lfilter


def classical_seasonal(y, period, multiplicative):
    """Seasonal factors of classical MA decomposition, per phase.

    Returns factors aligned to phase ``t % period`` of the input index.
    """
    n = len(y)
    if period % 2 == 0:
        w = np.ones(period + 1)
        w[0] = w[-1] = 0.5
        w /= period
    else:
        w = np.ones(period) / period
    half = len(w) // 2

    trend = np.full(n, np.nan)
    trend[half:n - half] = np.convolve(y, w[::-1], mode='valid')

    detrended = y / trend if multiplicative else y - trend
    factors = np.zeros(period)
    for phase in range(period):
        vals = detrended[phase::period]
        factors[phase] = np.nanmean(vals)
    if multiplicative:
        factors = factors / factors.mean()
    else:
        factors = factors - factors.mean()
    return factors


def _ses_levels(alpha, l0, y):
    """SES level series l_t = (1-a) l_{t-1} + a y_t via a linear filter."""
    zi = np.array([(1.0 - alpha) * l0])
    levels, _ = lfilter([alpha], [1.0, -(1.0 - alpha)], y, zi=zi)
    return levels


def ses_fit(y):
    """SES by SSE minimization over (alpha, l0).  Returns (alpha, l_T)."""
    y = np.asarray(y, dtype=np.float64)

    def sse(params):
        alpha, l0 = params
        if not (1e-6 < alpha < 1.0):
            return 1e300
        levels = _ses_levels(alpha, l0, y)
        pred = np.concatenate(([l0], levels[:-1]))
        resid = y - pred
        return float(resid @ resid)

    best = None
    for a0 in (0.1, 0.5, 0.9):
        res = minimize(
            sse, np.array([a0, y[0]]), method='Nelder-Mead',
            options={'xatol': 1e-8, 'fatol': 1e-12, 'maxiter': 2000},
        )
        if best is None or res.fun < best.fun:
            best = res
    alpha = float(np.clip(best.x[0], 1e-6, 1.0))
    l0 = float(best.x[1])
    return alpha, float(_ses_levels(alpha, l0, y)[-1])


def theta_forecast_series(y, steps, period, theta=20.0):
    """Theta forecast of one series, following the statsmodels equations."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)

    deseasonalize = period is not None and period > 1 and n >= 2 * period
    if deseasonalize:
        multiplicative = y.min() > 0
        factors = classical_seasonal(y, period, multiplicative)
        phase = np.arange(n) % period
        y_ds = y / factors[phase] if multiplicative else y - factors[phase]
    else:
        y_ds = y

    alpha, l_T = ses_fit(y_ds)

    t = np.arange(n)
    b0 = np.polyfit(t, y_ds, 1)[0]

    h = np.arange(1, steps + 1, dtype=np.float64)
    drift = h - 1.0 + 1.0 / alpha - (1.0 - alpha) ** n / alpha
    fc = l_T + (1.0 - 1.0 / theta) * b0 * drift

    if deseasonalize:
        fut = (n + np.arange(steps)) % period
        fc = fc * factors[fut] if multiplicative else fc + factors[fut]
    return fc
