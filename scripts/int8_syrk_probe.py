"""Does an int8 x int8 -> int32 Pallas syrk hit the v5e MXU fast path?

The shipped triangle-syrk Gram (ops/syrk.py) runs bf16 at ~93% of the
chip's dense bf16 peak (benchmarks/RESULTS.md MFU section) — the one
way past that roofline is the MXU's 2x int8 path, and rademacher/
binomial surrogate values are exactly int8.  This probe times the
bf16 kernel against an int8-input variant (identical grid/blocking,
``preferred_element_type=int32``) in isolation at north-star shapes.
A win would justify wiring an int8 Gram into the tri pipeline; a loss
is recorded and nothing ships (the XLA-level int8 dot already measured
far off the fast path — this checks whether Mosaic differs).

Usage: nohup timeout 1800 python -u scripts/int8_syrk_probe.py > log &
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _syrk_i8_impl(X, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from xmca_tpu.ops.syrk import BK, _row_block

    n_pad, p_pad = int(X.shape[0]), int(X.shape[1])
    bm = _row_block(n_pad)
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
            preferred_element_type=jnp.int32,
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
        out_shape=jax.ShapeDtypeStruct((len(tri), bm, bm), jnp.int32),
        interpret=interpret,
    )(i_arr, j_arr, X[None], X[None])

    G = jnp.zeros((n_pad, n_pad), jnp.int32)
    for t, (i, j) in enumerate(tri):
        G = jax.lax.dynamic_update_slice(G, blocks[t], (i * bm, j * bm))
        if i != j:
            G = jax.lax.dynamic_update_slice(
                G, blocks[t].T, (j * bm, i * bm)
            )
    return G


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache',
    )
    try:
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    from xmca_tpu.ops.syrk import pad_to, syrk

    on_tpu = jax.default_backend() == 'tpu'
    interpret = not on_tpu
    if on_tpu:
        n_obs, p = 2000, 100_352
    else:
        n_obs, p = 256, 1024
    n_pad, p_pad = pad_to(n_obs, p)

    syrk_i8 = partial(
        jax.jit(_syrk_i8_impl, static_argnames=('interpret',)),
        interpret=interpret,
    )

    rng = np.random.default_rng(0)
    Xh = (rng.integers(0, 2, size=(n_pad, p_pad)) * 2 - 1)
    Xh[n_obs:] = 0
    Xh[:, p:] = 0
    X8 = jnp.asarray(Xh.astype(np.int8))
    Xb16 = jnp.asarray(Xh.astype(np.float32)).astype(jnp.bfloat16)

    # correctness vs the shipped kernel (exact values: +-1 / 0)
    G8 = np.asarray(jax.device_get(syrk_i8(X8)))[:n_obs, :n_obs]
    Gb = np.asarray(jax.device_get(
        syrk(Xb16, interpret=interpret)))[:n_obs, :n_obs]
    err = np.abs(G8.astype(np.float64) - Gb.astype(np.float64)).max()
    print('max |int8 - bf16| Gram entry: %.3g' % err, flush=True)
    assert err == 0.0, 'int8 and bf16 syrk disagree'

    if not on_tpu:
        print('CPU interpret mode: correctness only, no timing')
        return

    def time_it(fn, arg, n=30):
        o = fn(arg)
        jax.block_until_ready(o)
        # honest remote timing: dependent scalar readback
        float(jnp.sum(o[:1, :1]).astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(arg)
        float(jnp.sum(o[:1, :1]).astype(jnp.float32))
        return (time.perf_counter() - t0) / n

    f_b = jax.jit(lambda x: syrk(x))
    tb = time_it(f_b, Xb16)
    t8 = time_it(syrk_i8, X8)
    macs = (n_pad * n_pad / 2) * p_pad
    print('bf16 syrk: %.3f ms  (%.0f T-dense-FLOP/s-equiv)'
          % (1e3 * tb, 2 * 2 * macs / tb / 1e12), flush=True)
    print('int8 syrk: %.3f ms  (%.0f T-dense-OP/s-equiv)'
          % (1e3 * t8, 2 * 2 * macs / t8 / 1e12), flush=True)
    print('done', flush=True)


if __name__ == '__main__':
    main()
