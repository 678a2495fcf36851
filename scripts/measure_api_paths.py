"""Measure the round-3 device-side API paths at north-star scale.

Times the public-API stages that round 2 still ran through full-field
host round trips — preprocessing (normalize/apply_coslat), correlation
patterns, reconstruction, predict — on the real TPU at bench.py's
shapes (2000 x 100k x 2 fields).  Prints one line per stage; results
are recorded in benchmarks/RESULTS.md.

Timing rule: every stage ends on a dependent host materialization (the
returned numpy arrays), which is the honest execution barrier on
tunneled backends.
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
        n_obs, n_lat, n_lon, n_rot = 2000, 250, 400, 10
    else:
        n_obs, n_lat, n_lon, n_rot = 256, 32, 64, 10

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
    new_left = xr.DataArray(
        make_field(3)[:16], dims=('time', 'lat', 'lon'),
        coords={'time': t[:16], 'lat': coords['lat'],
                'lon': coords['lon']},
    )

    def stage(name, fn, warm=True):
        if warm:
            fn()                      # compile + first transfer
        t0 = time.perf_counter()
        out = fn()
        wall = time.perf_counter() - t0
        print('%-38s %8.3f s' % (name, wall), flush=True)
        return out

    m = xMCA(left, right)
    m.set_solver(truncate=n_rot)
    # preprocessing measured cold-per-call (it mutates the fields, so a
    # second call is not the same work): report the first-call wall
    # which includes the (tiny) weight upload
    t0 = time.perf_counter()
    m.normalize()
    print('%-38s %8.3f s' % ('normalize (device)',
                             time.perf_counter() - t0), flush=True)
    t0 = time.perf_counter()
    m.apply_coslat()
    print('%-38s %8.3f s' % ('apply_coslat (device)',
                             time.perf_counter() - t0), flush=True)

    t0 = time.perf_counter()
    m.solve(complexify=True)
    print('%-38s %8.3f s' % ('solve(complexify=True) [cold]',
                             time.perf_counter() - t0), flush=True)
    t0 = time.perf_counter()
    m.rotate(n_rot)
    print('%-38s %8.3f s' % ('rotate(10) [cold]',
                             time.perf_counter() - t0), flush=True)
    t0 = time.perf_counter()
    m.rotate(n_rot)
    print('%-38s %8.3f s' % ('rotate(10) [warm]',
                             time.perf_counter() - t0), flush=True)

    stage('eofs(10) rotated', lambda: m.eofs(n_rot))
    stage('pcs(10) rotated', lambda: m.pcs(n_rot))
    stage('homogeneous_patterns(10)',
          lambda: m.homogeneous_patterns(n_rot))
    stage('heterogeneous_patterns(10)',
          lambda: m.heterogeneous_patterns(n_rot))
    stage('reconstructed_fields(5 modes)',
          lambda: m.reconstructed_fields(mode=5))
    stage('predict(16 new steps)',
          lambda: m.predict(left=new_left, n=n_rot))

    # warm re-solve: the fold-based truncated complexified solve
    # (complexify is idempotent on the resident complex field — the
    # operator consumes the real part)
    t0 = time.perf_counter()
    m.solve(complexify=True)
    print('%-38s %8.3f s' % ('solve(complexify=True) [warm]',
                             time.perf_counter() - t0), flush=True)
    m.rotate(n_rot)

    # bootstrap ensemble cadence under the loose auto-tolerance
    n_boot = 24 if on_tpu else 4
    m.bootstrapping(n_boot, n_modes=n_rot, block_size=8,
                    disable_progress=True, seed=5)      # warm/compile
    t0 = time.perf_counter()
    m.bootstrapping(n_boot, n_modes=n_rot, block_size=8,
                    disable_progress=True, seed=6)
    wall = time.perf_counter() - t0
    print('%-38s %8.3f s  (%.1f ms/run)' % (
        'bootstrapping(%d, standard)' % n_boot, wall,
        1e3 * wall / n_boot), flush=True)
    print('done', flush=True)


if __name__ == '__main__':
    main()
