"""Batched preprocessing transforms: centering, weighting, complexification.

The reference complexifies via ``scipy.signal.hilbert`` (FFT on host,
xmca/array.py:464) with optional per-column statsmodels Theta forecasts in a
Python loop (xmca/array.py:417 — the reference's hottest loop).  Here the
Hilbert transform is a batched ``jnp.fft`` kernel over all columns at once
and the extensions are fully vectorized jitted transforms, so the whole
complexify step is one XLA graph.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from xmca_tpu.core.theta import theta_forecast


def _analytic_weights(n, dtype):
    """FFT weights of the analytic-signal transform (scipy.signal.hilbert)."""
    h = np.zeros(n, dtype=dtype)
    if n % 2 == 0:
        h[0] = h[n // 2] = 1.0
        h[1:n // 2] = 2.0
    else:
        h[0] = 1.0
        h[1:(n + 1) // 2] = 2.0
    return h


_HILBERT_MATMUL_MAX_N = 8192
_ANALYTIC_KERNEL_CACHE = {}


def _analytic_circulant_kernel(n, m, dtype):
    """Padded frequency response of the analytic transform as a length-m
    circular/linear convolution kernel.

    The analytic-signal operator ``A = F_n^-1 diag(h) F_n`` is circulant
    — applying it is a length-n circular convolution with
    ``a = ifft(h)``.  Circular convolution embeds exactly into a linear
    convolution of the doubled signal ``[x; x]``: outputs ``n..2n-1``
    of ``[x; x] * a`` equal the circular result.  Evaluating THAT with
    a power-of-two FFT of length ``m >= 3n - 1`` sidesteps XLA's slow
    Bluestein lowering of arbitrary-length FFTs on TPU — the route to
    exact long-time-axis complexification (the matmul Hilbert operator
    would need an (n, n) dense H: 1 GB at n=16k).

    Built once per (n, m) on host in float64; returns ``fft(a, m)``.
    """
    key = (int(n), int(m), np.dtype(dtype).str)
    if key not in _ANALYTIC_KERNEL_CACHE:
        a = np.fft.ifft(_analytic_weights(n, np.float64))
        a_pad = np.zeros(m, np.complex128)
        a_pad[:n] = a
        _ANALYTIC_KERNEL_CACHE[key] = np.fft.fft(a_pad).astype(
            np.result_type(dtype, np.complex64)
        )
    return _ANALYTIC_KERNEL_CACHE[key]


def _analytic_signal_circulant(x, chunk=1024):
    """Analytic signal via power-of-two-FFT circular convolution.

    Exact for any time length; the space axis is processed through
    ``lax.map`` (sequential, NOT an unrolled Python loop — unrolling
    would keep every chunk's padded spectrum live at once and exhaust
    HBM at 16k x 20k shapes) so peak memory is one ``m x chunk``
    complex spectrum plus the output.
    """
    n, p = x.shape
    real_dtype = jnp.finfo(x.dtype).dtype
    m = 1 << int(np.ceil(np.log2(3 * n - 1)))
    K = jnp.asarray(_analytic_circulant_kernel(n, m, real_dtype))

    def apply(xc):
        z = jnp.concatenate([xc, xc], axis=0)
        zf = jnp.fft.fft(z, n=m, axis=0)
        return jnp.fft.ifft(zf * K[:, None], axis=0)[n:2 * n]

    if p <= chunk:
        return apply(x)
    pad = (-p) % chunk
    xp = jnp.pad(x, ((0, 0), (0, pad))) if pad else x
    n_chunks = (p + pad) // chunk
    stacked = jnp.moveaxis(
        xp.reshape(n, n_chunks, chunk), 1, 0
    )
    out = jax.lax.map(apply, stacked)
    out = jnp.moveaxis(out, 0, 1).reshape(n, n_chunks * chunk)
    return out[:, :p]


@jax.jit
def analytic_signal(x):
    """Analytic signal of ``x (time, space)`` along axis 0.

    Equivalent of ``scipy.signal.hilbert(x, axis=0)`` (reference call
    site: xmca/array.py:464).  On CPU this is the batched FFT; on TPU,
    mixed-radix FFTs lower to slow Bluestein convolutions, so real
    input runs as one MXU matmul with the real Hilbert operator
    (``z = x + i (H x)``, exact — H built from float64 FFTs on host,
    see ``xmca_tpu.core.fastpath.hilbert_imag_matrix``) up to
    ``_HILBERT_MATMUL_MAX_N`` time steps, and as an exact
    power-of-two-FFT circular convolution beyond that
    (:func:`_analytic_signal_circulant`) — no Bluestein at any length.
    """
    n = x.shape[0]
    real_dtype = jnp.finfo(x.dtype).dtype
    on_accel = jax.default_backend() != 'cpu'
    if on_accel and not jnp.iscomplexobj(x):
        if n <= _HILBERT_MATMUL_MAX_N:
            # host-side numpy H on purpose: this function traces under
            # jit, where a captured DEVICE array costs an n^2 readback
            # at trace time (the device cache serves eager call sites)
            from xmca_tpu.core.fastpath import hilbert_imag_matrix
            H = jnp.asarray(hilbert_imag_matrix(n, real_dtype))
            imag = jnp.matmul(H, x, precision=jax.lax.Precision.HIGHEST)
            return x + 1j * imag
        return _analytic_signal_circulant(x)
    Xf = jnp.fft.fft(x, axis=0)
    h = _analytic_weights(n, real_dtype)
    return jnp.fft.ifft(Xf * h[:, None], axis=0)


@jax.jit
def exp_forecast(field, period):
    """Linear + decaying-exponential continuation of every column.

    Vectorized re-derivation of the reference's ``_exp_forecast``
    (xmca/array.py:394-411): fit a linear trend per column, continue it for
    ``n`` more steps, and add the end-point offset decaying with e-folding
    time ``period``.

    Note: the reference's helper ``_get_reg_coefs`` (xmca/array.py:378-392)
    computes the regression slope as ``cov / mean(x)**2`` — its ``xstd``
    variable actually holds the *mean* of ``x``.  We use the correct OLS
    slope ``cov / var(x)``; the extension exists only to damp Hilbert edge
    effects and the proper trend serves that purpose strictly better.
    """
    n = field.shape[0]
    x = jnp.arange(n, dtype=field.dtype)
    xmean = (n - 1) / 2.0
    xvar = jnp.mean((x - xmean) ** 2)
    ymean = jnp.mean(field, axis=0)
    cov = jnp.sum((x - xmean)[:, None] * (field - ymean), axis=0) / n
    slope = cov / xvar
    intercept = ymean - xmean * slope

    linear_end = slope * x[-1] + intercept
    offset = field[-1, :] - linear_end

    # start at 1: exp(0) would duplicate the final sample
    x_shift = (x + 1.0)[:, None]
    exp_ext = offset[None, :] * jnp.exp(-x_shift / period)
    lin_ext = slope[None, :] * x[:, None] + linear_end[None, :]
    return exp_ext + lin_ext


def extend_field(field, method, period):
    """Forecast continuation of all columns (`method` in {'exp','theta'}).

    Mirrors reference ``_extend`` (xmca/array.py:413-427); backcasts are
    produced by the caller by flipping the time axis.
    """
    if method == 'theta':
        return theta_forecast(
            field, steps=field.shape[0], period=int(period), theta=20.0
        )
    if method == 'exp':
        return exp_forecast(field, float(period))
    raise ValueError(
        '{:} is not a valid extension. Choose either `exp` or `theta`.'
        .format(method)
    )


@partial(jax.jit, static_argnames=('extend', 'period'))
def complexify(field, extend=False, period=1):
    """Hilbert-complexify a centered field, optionally pre/post extended.

    Parity with reference ``_complexify`` (xmca/array.py:429-472): when
    extended, the analytic signal of [backcast | field | forecast] is cut
    back to the middle third and re-centered.
    """
    field = field.real
    n, p = field.shape
    if extend:
        # forecast (post) and backcast (pre, = forecast of the flipped
        # series) in ONE batched call: the columns of [field | flipped]
        # are independent series, so a single vectorized fit covers both
        # directions — halves the extension cost
        both = jnp.concatenate([field, jnp.flip(field, 0)], axis=1)
        ext = extend_field(both, extend, period)
        post = ext[:, :p]
        pre = jnp.flip(ext[:, p:], 0)
        full = jnp.concatenate([pre, field, post], axis=0)
        analytic = analytic_signal(full)[n:2 * n]
        return analytic - jnp.mean(analytic, axis=0)
    return analytic_signal(field)


@jax.jit
def center(field):
    """Remove the temporal mean (reference ``_center``, xmca/array.py:199)."""
    return field - jnp.mean(field, axis=0)


@jax.jit
def standardize(field, std):
    """Divide by a per-column standard deviation (reference ``normalize``)."""
    return field / std
