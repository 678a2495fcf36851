"""Round-4 bench levers, measured at north-star scale on the chip.

Two questions, following VERDICT round-3 item 3:

1. What is the WARM bench-path stage anatomy (fresh model, fold-based
   truncated solve — the path the bench actually times), stage by
   stage?
2. At the current ~28 ms/run ensemble cadence (loose tol + ns14, where
   the round-3 varimax tail no longer dominates), do the draw/Gram
   levers pay now?  Probes: subspace_iters {12, 8, 6}, and
   'rademacher8' (int8 draws + s8 x s8 MXU Grams) — re-measured
   because the round-3 "buys nothing" verdict was taken at the 44
   ms/run cadence where rotation set the clock.  Each candidate's null
   q95 must sit inside Monte-Carlo noise of the default's.

Usage: nohup timeout 3600 python -u scripts/round4_probe.py > log &
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
        n_obs, n_lat, n_lon, n_rot, n_surr = 2000, 250, 400, 10, 125
    else:
        n_obs, n_lat, n_lon, n_rot, n_surr = 256, 32, 64, 10, 16

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

    def staged_workload(tag, n_runs, **solver_kw):
        m = xMCA(left, right)
        m.set_solver(truncate=n_rot, **solver_kw)
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
        surr = m.rule_n(n_runs, seed=7, disable_progress=True)
        walls['rule_n'] = time.perf_counter() - t0
        total = sum(walls.values())
        print(
            '%-26s total %6.3f s | norm %5.3f coslat %5.3f solve %5.3f '
            'rotate %5.3f rule_n %6.3f (%.1f ms/run, kept %d)'
            % (tag, total, walls['normalize'], walls['coslat'],
               walls['solve'], walls['rotate'], walls['rule_n'],
               1e3 * walls['rule_n'] / n_runs,
               np.asarray(surr).shape[1]),
            flush=True,
        )
        return np.asarray(surr)

    # ---- 1. bench-path anatomy: warm pass = tracing+compile, then the
    # measured pass on a fresh model (exactly the bench's discipline)
    staged_workload('[warm] default', n_surr)
    base = staged_workload('[timed] default', n_surr)

    # ---- 2. ensemble levers through the public API
    levers = [
        ('it8', dict(subspace_iters=8)),
        ('it6', dict(subspace_iters=6)),
        ('rad8 it12', dict(surrogate_gen_dist='rademacher8')),
        ('rad8 it6', dict(surrogate_gen_dist='rademacher8',
                          subspace_iters=6)),
    ]
    results = {}
    for tag, kw in levers:
        staged_workload('[warm] %s' % tag, n_surr, **kw)
        results[tag] = staged_workload('[timed] %s' % tag, n_surr, **kw)

    # ---- 3. null-quantile stability: candidates vs default
    def q95(s):
        tot = s.sum(axis=0)
        return np.quantile(s / tot[None, :], 0.95, axis=1)

    q_base = q95(base)
    for tag, s in results.items():
        q = q95(s)
        shift = np.abs(q - q_base) / q_base
        print('%-12s q95 rel shift: max %.4f  mode1 %.4f  mode10 %.4f'
              % (tag, shift.max(), shift[0], shift[-1]), flush=True)
    # Monte-Carlo noise scale of the q95 itself at this ensemble size
    print('MC q95 noise scale ~ 1/sqrt(2N) = %.4f' % (1 / np.sqrt(2 * n_surr)),
          flush=True)
    print('done', flush=True)


if __name__ == '__main__':
    main()
