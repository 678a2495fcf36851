"""Warm per-stage anatomy of the bench.py north-star workload.

Runs bench.py's exact public pipeline twice (warmup + timed) and
prints the wall of each stage separately, so RESULTS.md's anatomy
table tracks where the headline seconds go.  Must be run alone on the
chip (CLAUDE.md: no concurrent CPU work).
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

    from xmca_tpu.compat import xr
    from xmca_tpu.xarray import xMCA

    on_tpu = jax.default_backend() == 'tpu'
    if on_tpu:
        n_obs, n_lat, n_lon = 2000, 250, 400
        n_surr = 125
    else:
        n_obs, n_lat, n_lon = 256, 32, 64
        n_surr = 16
    n_rot = 10

    t = np.arange(n_obs, dtype=np.float32)
    modes = np.sin(
        2 * np.pi * t[:, None] * np.arange(1, 9)[None, :] / n_obs
    ).astype(np.float32)
    p = n_lat * n_lon

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
                        coords=coords, name='left')
    right = xr.DataArray(make_field(2), dims=('time', 'lat', 'lon'),
                         coords=coords, name='right')

    def run(tag):
        m = xMCA(left, right)
        m.set_solver(truncate=n_rot)
        walls = {}
        t0 = time.perf_counter()
        m.normalize()
        walls['normalize'] = time.perf_counter() - t0
        t0 = time.perf_counter()
        m.apply_coslat()
        walls['coslat'] = time.perf_counter() - t0
        t0 = time.perf_counter()
        m.solve(complexify=True)
        walls['solve'] = time.perf_counter() - t0
        t0 = time.perf_counter()
        m.rotate(n_rot)
        walls['rotate'] = time.perf_counter() - t0
        t0 = time.perf_counter()
        surr = m.rule_n(n_surr, seed=7, disable_progress=True)
        walls['rule_n_%d' % n_surr] = time.perf_counter() - t0
        assert np.isfinite(np.asarray(surr)).all()
        total = sum(walls.values())
        for k, v in walls.items():
            print('%s %-12s %8.3f s' % (tag, k, v), flush=True)
        print('%s %-12s %8.3f s' % (tag, 'TOTAL', total), flush=True)
        return walls

    run('warmup')
    run('timed ')


if __name__ == '__main__':
    main()
