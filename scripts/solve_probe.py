"""Where do the ~0.5 s of the warm public solve go?

The fold-solve compute roofline is ~0.1-0.15 s at north-star shapes
(RESULTS.md round-3-late), but `scripts/measure_api_paths.py` measured
the public ``solve(complexify=True)`` at ~0.5 s.  This probe times, in
one clean window (run ALONE on the chip):

  raw      — ``jit(fast_solve_truncated_totals_analytic)`` on resident
             centered real fields, dependent-readback timed;
  stages   — its pieces as separate jits (HIGHEST Gram pair, fold+chol,
             subspace SVD, nuclear norm, back-projection);
  public   — ``m.solve(complexify=True)`` on a fresh pre-uploaded model
             (normalize+coslat applied, like bench.py).

Each timing is the median of 3 after a warmup; honest execution
barriers via dependent scalar readbacks.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _med3(fn):
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    return float(np.median(walls))


def main():
    import jax
    import jax.numpy as jnp
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache',
    )
    try:
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          1.0)
    except Exception:
        pass
    on_tpu = jax.default_backend() == 'tpu'
    if on_tpu:
        n_obs, n_lat, n_lon = 2000, 250, 400
    else:
        n_obs, n_lat, n_lon = 256, 32, 64
    p = n_lat * n_lon
    k = 10

    from xmca_tpu.compat import xr
    from xmca_tpu.xarray import xMCA
    from xmca_tpu.core import fastpath as _fast

    t = np.arange(n_obs, dtype=np.float32)
    modes = np.sin(
        2 * np.pi * t[:, None] * np.arange(1, 9)[None, :] / n_obs
    ).astype(np.float32)

    def make_field(seed):
        r = np.random.default_rng(seed)
        data = modes @ r.standard_normal((8, p), dtype=np.float32)
        data += r.standard_normal((n_obs, p), dtype=np.float32)
        return data.reshape(n_obs, n_lat, n_lon)

    coords = {
        'time': t,
        'lat': np.linspace(-60, 60, n_lat, dtype=np.float32),
        'lon': np.linspace(0, 359, n_lon, dtype=np.float32),
    }
    left = xr.DataArray(make_field(1), dims=('time', 'lat', 'lon'),
                        coords=coords)
    right = xr.DataArray(make_field(2), dims=('time', 'lat', 'lon'),
                         coords=coords)

    # ---------------- public solve on fresh (pre-uploaded) models
    def fresh():
        m = xMCA(left, right)
        m.set_solver(truncate=k)
        m.normalize()
        m.apply_coslat()
        return m

    m = fresh()
    m.solve(complexify=True)          # warm compile
    walls = []
    for _ in range(3):
        m = fresh()
        t0 = time.perf_counter()
        m.solve(complexify=True)
        walls.append(time.perf_counter() - t0)
    print('public solve(complexify=True) warm: %.3f s (runs: %s)'
          % (float(np.median(walls)),
             ' '.join('%.3f' % w for w in walls)), flush=True)

    # ---------------- raw fused program on resident fields
    Xl = jnp.asarray(make_field(3).reshape(n_obs, p))
    Xr = jnp.asarray(make_field(4).reshape(n_obs, p))
    Xl = Xl - jnp.mean(Xl, axis=0)
    Xr = Xr - jnp.mean(Xr, axis=0)
    H = _fast.hilbert_imag_matrix_device(n_obs, np.float32)
    key = jax.random.PRNGKey(0)

    def raw():
        out = _fast.fast_solve_truncated_totals_analytic(
            Xl, Xr, H, key, n_modes=k, n_iter=12
        )
        return float(out[0][0])       # dependent readback

    raw()
    print('raw fast_solve_truncated_totals_analytic: %.3f s'
          % _med3(raw), flush=True)

    # ---------------- stage costs as separate jits
    hi = jax.lax.Precision.HIGHEST

    @jax.jit
    def gram_pair(Xl, Xr):
        Gl = jnp.matmul(Xl, Xl.T, precision=hi)
        Gr = jnp.matmul(Xr, Xr.T, precision=hi)
        return jnp.float32(Gl[0, 0] + Gr[0, 0])

    @jax.jit
    def fold_chol(Xl, Xr, H):
        Gl = _fast.analytic_reduced_kernel(Xl, Xr, H, 1e-6)[1]
        return jnp.float32(jnp.abs(Gl[0, 0]))

    @jax.jit
    def kernel_stage(Xl, Xr, H, key):
        M, La, Lb = _fast.analytic_reduced_kernel(Xl, Xr, H, 1e-6)
        s, Zl, Zr = _fast._kernel_svd_recovery(M, La, Lb, key, k, 12)
        return jnp.float32(s[0])

    @jax.jit
    def with_totals(Xl, Xr, H, key):
        M, La, Lb = _fast.analytic_reduced_kernel(Xl, Xr, H, 1e-6)
        s, Zl, Zr = _fast._kernel_svd_recovery(M, La, Lb, key, k, 12)
        return jnp.float32(s[0] + _fast.nuclear_norm(M)
                           + jnp.sum(jnp.abs(M) ** 2))

    for name, fn in (
        ('HIGHEST Gram pair', lambda: float(gram_pair(Xl, Xr))),
        ('+ analytic fold + chol', lambda: float(fold_chol(Xl, Xr, H))),
        ('+ subspace SVD + recovery weights',
         lambda: float(kernel_stage(Xl, Xr, H, key))),
        ('+ totals (NS nuclear norm)',
         lambda: float(with_totals(Xl, Xr, H, key))),
    ):
        fn()
        print('%s: %.3f s' % (name, _med3(fn)), flush=True)


if __name__ == '__main__':
    main()
