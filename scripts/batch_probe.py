"""Re-probe ensemble batch width under the round-3 loose tolerance.

The batch=1 TPU default was measured under the tight criterion
(tol=1e-8 -> f32 clamp), where the varimax while_loop iteration count
is heavy-tailed (2..530) and wider batches pay the max of their
members.  The loose ensemble tolerance (1e-4, adopted round 3)
truncates that tail, so the coupling penalty may now be smaller than
the per-dispatch latency saved (~10-25 ms/dispatch on the tunnel) —
worth re-measuring before keeping batch=1.

Also times the new rank-k `reconstructed_fields` at north-star scale
(previously 119 s, bounded by a ~2 x 800 MB full-grid tunnel pull).

Usage: nohup timeout 3600 python -u scripts/batch_probe.py > log &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache',
    )
    try:
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    from xmca_tpu.stats.significance import rule_n_spectra

    on_tpu = jax.default_backend() == 'tpu'
    if on_tpu:
        n_obs, p = 2000, 100_000
        n_probe = 48
    else:
        n_obs, p = 256, 2048
        n_probe = 16
    n_vars = (p, p)

    common = dict(
        complexify=True, rotated=True, n_rot=10, power=1,
        dtype=np.dtype('bfloat16') if on_tpu else np.dtype('float32'),
        spectrum='fast', tol=1e-4, polar_method='ns14',
        subspace_iters=12,
        surrogate_source='generated', surrogate_dist='normal16',
    )

    def run(tag, n_runs, seed, **kw):
        t0 = time.perf_counter()
        spectra, totals = rule_n_spectra(
            n_obs, n_vars, n_runs, seed=seed, **common, **kw,
        )
        dt = time.perf_counter() - t0
        frac = spectra / totals[:, None]
        q95 = np.quantile(frac, 0.95, axis=0)
        print(
            f'{tag:34s} n={n_runs:4d}  {dt:7.2f} s '
            f'{1e3 * dt / n_runs:7.1f} ms/run  kept={spectra.shape[0]:4d} '
            f'q95[0]={q95[0]:.5f}',
            flush=True,
        )

    for bs in (1, 2, 4, 8):
        run(f'[warm] batch={bs}', n_probe, seed=1, batch_size=bs)
        run(f'[timed] batch={bs}', n_probe, seed=2, batch_size=bs)

    # ---- rank-k reconstruction at scale (public API path)
    print('--- reconstructed_fields at north-star scale ---', flush=True)
    from xmca_tpu.compat import xr
    from xmca_tpu.xarray import xMCA

    if on_tpu:
        n_lat, n_lon = 250, 400
    else:
        n_lat, n_lon = 32, 64
    t = np.arange(n_obs, dtype=np.float32)
    rng = np.random.default_rng(0)

    def make_field(seed):
        r = np.random.default_rng(seed)
        data = r.standard_normal((n_obs, n_lat * n_lon), dtype=np.float32)
        data[:, 5] = np.nan            # force the NaN-scatter branch
        return data.reshape(n_obs, n_lat, n_lon)

    coords = {
        'time': t,
        'lat': np.linspace(-60, 60, n_lat, dtype=np.float32),
        'lon': np.linspace(0, 359, n_lon, dtype=np.float32),
    }
    left = xr.DataArray(make_field(1), dims=('time', 'lat', 'lon'),
                        coords=coords, name='left')
    right = xr.DataArray(make_field(2), dims=('time', 'lat', 'lon'),
                         coords=coords, name='right')
    del rng

    m = xMCA(left, right)
    m.set_solver(truncate=10)
    m.normalize()
    m.apply_coslat()
    m.solve(complexify=True)
    m.rotate(10)
    for tag in ('warm', 'timed'):
        t0 = time.perf_counter()
        rec = m.reconstructed_fields(mode=slice(1, 10))
        dt = time.perf_counter() - t0
        tot = sum(float(np.nansum(np.asarray(v))) for v in rec.values())
        print(f'[{tag}] reconstructed_fields {dt:7.2f} s  (checksum {tot:.3e})',
              flush=True)


if __name__ == '__main__':
    main()
