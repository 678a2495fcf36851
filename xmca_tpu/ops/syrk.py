"""Symmetric rank-k update (``G = X X^T``) as a Pallas TPU kernel.

The temporal Gram is the dominant op of every Monte-Carlo surrogate
(and of the solve): at north-star shapes it is HBM-bandwidth-bound and
XLA's ``dot_general`` cannot exploit the output's symmetry — it streams
the row panels for all ``nb^2`` output blocks.  Computing only the
``nb (nb + 1) / 2`` lower-triangle blocks with LARGE row blocks halves
both the FLOPs and the HBM traffic; the mirror is an n x n shuffle.
Measured on a v5e at (2048, 100352) bf16: 4.6 ms vs 5.7 ms for XLA's
full dot in isolation, and ~4 ms/run saved inside the surrogate
pipeline (where the int8 dot it replaces ran far off the MXU fast
path).  Exact for sign/binomial surrogate values: bf16 holds them
exactly and the f32 accumulator is exact for partial sums < 2^24.

Shapes must be pre-padded: rows to a multiple of the row block (zeros
— they contribute nothing and the caller slices them away), columns to
a multiple of the k block.  ``pad_to`` gives the padded sizes.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['syrk', 'pad_to', 'BK']

BK = 512            # contraction chunk (lanes: multiple of 128)


def _row_block(n_pad):
    """Largest supported row block dividing the padded row count."""
    for bm in (1024, 512, 256, 128):
        if n_pad % bm == 0:
            return bm
    raise ValueError('n_pad must be a multiple of 128 (got %d)' % n_pad)


def pad_to(n, p):
    """Padded (rows, cols) the kernel accepts for true sizes (n, p)."""
    n_pad = -(-n // 512) * 512
    return n_pad, -(-p // BK) * BK


@partial(jax.jit, static_argnames=('interpret',))
def syrk(X, interpret=False):
    """``X X^T`` (f32) of a pre-padded bf16 or int8 ``(n_pad, p_pad)``
    array.

    Lower-triangle blocks only, mirrored into the full symmetric
    output.  int8 input runs the MXU's 2x int8 path with exact int32
    accumulation (measured 2.80 vs 4.41 ms at (2048, 102400) on a v5e
    — 301 vs 191 T-dense-op/s — bit-equal Grams for ±1/binomial
    values, scripts/int8_syrk_probe.py); the f32 return contract is
    unchanged (every partial sum < 2^24 is f32-exact).
    ``interpret=True`` runs the kernel in Pallas interpret mode (CPU
    tests).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad, p_pad = int(X.shape[0]), int(X.shape[1])
    bm = _row_block(n_pad)
    if p_pad % BK:
        raise ValueError('p_pad must be a multiple of %d' % BK)
    acc_dtype = jnp.int32 if X.dtype == jnp.int8 else jnp.float32
    nb = n_pad // bm
    tri = [(i, j) for i in range(nb) for j in range(i + 1)]
    i_arr = jnp.asarray([ij[0] for ij in tri], jnp.int32)
    j_arr = jnp.asarray([ij[1] for ij in tri], jnp.int32)

    def kernel(i_ref, j_ref, xi_ref, xj_ref, g_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            g_ref[:] = jnp.zeros_like(g_ref)

        g_ref[:] += jax.lax.dot_general(
            xi_ref[:], xj_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=acc_dtype,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(len(tri), p_pad // BK),
        in_specs=[
            pl.BlockSpec((None, bm, BK),
                         lambda t, k, ia, ja: (0, ia[t], k)),
            pl.BlockSpec((None, bm, BK),
                         lambda t, k, ia, ja: (0, ja[t], k)),
        ],
        out_specs=pl.BlockSpec((1, bm, bm),
                               lambda t, k, ia, ja: (t, 0, 0)),
    )
    blocks = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((len(tri), bm, bm), acc_dtype),
        interpret=interpret,
    )(i_arr, j_arr, X[None], X[None])
    blocks = blocks.astype(jnp.float32)

    G = jnp.zeros((n_pad, n_pad), jnp.float32)
    for t, (i, j) in enumerate(tri):
        G = jax.lax.dynamic_update_slice(G, blocks[t], (i * bm, j * bm))
        if i != j:
            G = jax.lax.dynamic_update_slice(
                G, blocks[t].T, (j * bm, i * bm)
            )
    return G
