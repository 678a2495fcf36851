"""On-chip check + timing of the round-4 triangle-syrk surrogate path.

1. syrk exactness at north-star shape vs XLA's dense dot (must be
   bit-exact for +-1 bf16 inputs).
2. Per-run cost of fast_surrogate_variance_tri vs _int8 at the
   production cadence (jit(vmap(.)) batch-1, pipelined dispatch).

Usage: nohup timeout 1800 python -u scripts/tri_probe.py > log &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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
    print('backend:', jax.default_backend(), flush=True)

    from xmca_tpu.ops.surrogate import bits_field
    from xmca_tpu.ops.syrk import pad_to, syrk
    from xmca_tpu.core import fastpath as _fast

    n_obs, p = 2000, 100_000
    n_pad, p_pad = pad_to(n_obs, p)
    print('padded:', (n_pad, p_pad), flush=True)

    # ---- 1. exactness on-chip
    X = bits_field(jnp.int32(3), (n_pad, p_pad), dist='rademacher8')
    ok = ((jax.lax.broadcasted_iota(jnp.int32, (n_pad, p_pad), 0) < n_obs)
          & (jax.lax.broadcasted_iota(jnp.int32, (n_pad, p_pad), 1) < p))
    Xb = jnp.where(ok, X.astype(jnp.bfloat16), jnp.bfloat16(0))
    G_tri = syrk(Xb)[:n_obs, :n_obs]
    G_ref = jax.jit(
        lambda a: jax.lax.dot_general(
            a, a, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )(Xb)[:n_obs, :n_obs]
    err = float(jnp.max(jnp.abs(G_tri - G_ref)))
    print('syrk max abs err vs dense on-chip: %g' % err, flush=True)
    assert err == 0.0, 'syrk mismatch'

    # ---- 2. per-run timing at production cadence
    H = _fast.hilbert_imag_matrix_device(n_obs, np.float32)
    n_runs = 64

    def cadence(tag, fn_name):
        fn = getattr(_fast, fn_name)

        def one_run(seed_row):
            s = seed_row[0]
            k = jax.random.PRNGKey(s.astype(jnp.uint32))
            return fn(
                s, k, n_obs, (p, p), H=H, complexify=True,
                rotated=True, n_rot=10, power=1, tol=1e-4, n_iter=6,
                polar_method='ns14', dist='rademacher8',
            )
        run = jax.jit(jax.vmap(one_run))
        seeds = (np.uint32(12345)
                 + np.arange(n_runs, dtype=np.uint32)).astype(np.int32)
        # warm
        v, t, c = run(jnp.asarray(seeds[:1])[:, None])
        _ = float(t[0])
        t0 = time.perf_counter()
        outs = []
        for i in range(n_runs):
            outs.append(run(jnp.asarray(seeds[i:i + 1])[:, None]))
        # ONE gathered dependent readback (the _ensemble_map
        # discipline) — per-scalar readbacks cost ~30 ms each on the
        # tunnel and would dominate the measurement
        tot = float(jnp.sum(jnp.stack([o[1][0] for o in outs])))
        dt = time.perf_counter() - t0
        print('%-28s %6.1f ms/run (total %.3f s, checksum %.4g)'
              % (tag, 1e3 * dt / n_runs, dt, tot), flush=True)

    cadence('int8 (round-3 path)', 'fast_surrogate_variance_int8')
    cadence('tri  (Pallas syrk)', 'fast_surrogate_variance_tri')
    cadence('tri  (repeat)', 'fast_surrogate_variance_tri')
    print('done', flush=True)


if __name__ == '__main__':
    main()
