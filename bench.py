"""Benchmark: the BASELINE.md north-star workload through the PUBLIC API.

North star (BASELINE.md): complex rotated MCA on two 40-year 0.25-degree
fields — solve + rotate + 1000 Rule-N surrogates — in < 60 s on a TPU
v5e-8.  Rule-N surrogates are embarrassingly parallel across chips (the
ensemble axis shards with zero cross-device traffic; linearity is verified
by tests/integration/test_mesh.py), so one chip running 1/8 of the
surrogates in T seconds is the v5e-8 doing all 1000 in ~T seconds.

v5e-8-equivalence assumption (stated explicitly — see also
benchmarks/RESULTS.md): solve+rotate are counted ONCE at their measured
single-chip wall, i.e. the model replicates the fields per chip (~0.8 GB
per field in f32 vs 16 GB HBM) instead of space-sharding them; real-ICI
collective overhead of a sharded solve is not part of the claim.  Those
stages are ~15% of the headline, bounding the assumption's leverage.

Unlike round 1 (which hand-rolled core.fastpath calls), this drives the
exact code path a user gets:

    m = xMCA(left, right)          # 2000-step x 100k-cell DataArrays
    m.set_solver(truncate=10)      # large-field truncated solve
    m.normalize()                  # unit-variance series (on device)
    m.apply_coslat()               # sqrt(cos(lat)) area weights (device)
    m.solve(complexify=True)       # Hilbert complexification on device
    m.rotate(10)                   # varimax via lax.while_loop
    m.rule_n(125)                  # 1/8 of the 1000-surrogate ensemble

following the reference tutorial's preprocessing order
(/root/reference/tutorial/quickstart.py): normalize -> coslat -> solve.

``rule_n`` picks its TPU defaults by itself (fast analytic-Gram spectrum,
bfloat16 draws, batch=1 pipelined dispatches) — nothing here reaches into
the core modules.

On non-TPU backends a small smoke configuration runs instead (same public
pipeline, scaled shapes) so the script always succeeds.
"""
import json
import time

import numpy as np


def main():
    import os
    import jax
    # persistent compilation cache: repeat bench runs skip XLA compiles
    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), '.jax_cache'
    )
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    from xmca_tpu.compat import xr
    from xmca_tpu.xarray import xMCA
    DataArray = xr.DataArray

    try:
        on_tpu = jax.default_backend() == 'tpu'
    except RuntimeError:
        # TPU tunnel down (axon init raises UNAVAILABLE): fall back to
        # the CPU smoke configuration instead of crashing the bench —
        # verified recoverable by re-pointing jax_platforms post-failure
        jax.config.update('jax_platforms', 'cpu')
        on_tpu = False
    if on_tpu:
        n_obs, n_lat, n_lon = 2000, 250, 400      # 100k cells per field
        n_surr = 125          # 1/8 of the 1000-surrogate north star
        n_rot = 10
        target_s = 60.0
        metric = 'cplx_rot_mca_solve_rotate_rulen1000_api_v5e8equiv_s'
    else:
        n_obs, n_lat, n_lon = 256, 32, 64
        n_surr = 16
        n_rot = 10
        target_s = 60.0
        metric = 'cplx_rot_mca_rulen_api_smoke_cpu_s'

    # ---- data: synthetic fields with geophysical-like red spectra,
    # generated on host (float32) — the workload starts at the public
    # constructor, exactly like a user's script.
    rng = np.random.default_rng(0)
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
    left = DataArray(make_field(1), dims=('time', 'lat', 'lon'),
                     coords=coords, name='left')
    right = DataArray(make_field(2), dims=('time', 'lat', 'lon'),
                      coords=coords, name='right')
    del rng

    def workload(m, n_runs):
        m.set_solver(truncate=n_rot)
        m.normalize()
        m.apply_coslat()
        m.solve(complexify=True)
        m.rotate(n_rot)
        return m.rule_n(n_runs, seed=7, disable_progress=True)

    # ---- warmup: compile every stage (solve/rotate plus the vmapped
    # surrogate batch AND the ensemble-sized rescale/gather tail, whose
    # eager ops compile per ensemble size); excluded from the measured
    # wall-clock.  rule_n's return value is host numpy, which is the true
    # execution barrier.
    surr_w = workload(xMCA(left, right), n_surr)
    assert np.isfinite(np.asarray(surr_w)).all()
    del surr_w

    # ---- measured run: the north-star workload (solve + rotate + Rule-N
    # ensemble).  Model construction — i.e. loading the data onto the
    # chip, bounded by host->device link bandwidth, not by this
    # framework — happens before the clock starts, matching the
    # BASELINE.md metric definition.
    m = xMCA(left, right)
    t0 = time.perf_counter()
    surr = workload(m, n_surr)
    wall = time.perf_counter() - t0

    surr = np.asarray(surr)
    assert surr.shape[0] == n_rot
    assert surr.shape[1] >= int(0.9 * n_surr)   # converged runs kept
    assert np.isfinite(surr).all()
    var = np.asarray(m.variance(n_rot))
    assert np.isfinite(var).all()

    print(json.dumps({
        'metric': metric,
        'value': round(wall, 3),
        'unit': 's',
        'vs_baseline': round(target_s / wall, 3),
    }))


if __name__ == '__main__':
    main()
