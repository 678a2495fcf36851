"""Re-probe surrogate draw distributions under the round-3 loose-tol
defaults.

The int8 Rademacher pipeline ('rademacher8': 1-byte draws + s8xs8->s32
MXU Grams) measured ZERO end-to-end delta under the old tol=1e-8/ns30
cadence (43.7 ms/run both ways) because the varimax tail dominated.
The round-3 default (tol=1e-4, ns14 polar) cut the per-run wall to
~28 ms, where draws (7.6 ms) + Grams (8.8 ms) are now ~58% of the
clock — exactly the stages the int8 path accelerates.  This script
re-measures the comparison at north-star scale under the NEW defaults,
plus the q95 null-quantile agreement at the bench's 125-run ensemble
size (must sit inside seed-to-seed Monte-Carlo noise).

Usage: nohup timeout 3600 python -u scripts/dist_probe.py > log &
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
        n_probe, n_full = 48, 125
        if os.environ.get('DIST_PROBE_QUICK'):
            n_probe, n_full = 24, 125   # timing rough, q95 still exact
    else:
        n_obs, p = 256, 2048
        n_probe, n_full = 16, 32
    n_vars = (p, p)

    # round-3 TPU generated-path defaults
    common = dict(
        complexify=True, rotated=True, n_rot=10, power=1,
        dtype=np.dtype('bfloat16') if on_tpu else np.dtype('float32'),
        spectrum='fast',
        surrogate_source='generated',
        tol=1e-4, polar_method='ns14', subspace_iters=12,
    )

    def run(tag, n_runs, seed, dist):
        t0 = time.perf_counter()
        spectra, totals = rule_n_spectra(
            n_obs, n_vars, n_runs, seed=seed,
            surrogate_dist=dist, **common,
        )
        dt = time.perf_counter() - t0
        frac = spectra / totals[:, None]
        q95 = np.quantile(frac, 0.95, axis=0)
        print(
            f'{tag:34s} n={n_runs:4d}  {dt:7.2f} s '
            f'{1e3 * dt / n_runs:7.1f} ms/run  kept={spectra.shape[0]:4d} '
            f'q95[0]={q95[0]:.5f} q95[9]={q95[9]:.5f}',
            flush=True,
        )
        return q95

    # 'rademacher' (bf16 +-1, ordinary Gram) isolates the draw-cost
    # delta from the int8-Gram delta of 'rademacher8'
    for dist in ('normal16', 'rademacher', 'rademacher8'):
        run(f'[warm] {dist}', n_probe, seed=1, dist=dist)
        run(f'[timed] {dist}', n_probe, seed=2, dist=dist)
        run(f'[timed2] {dist}', n_probe, seed=3, dist=dist)

    print('--- q95 agreement at full ensemble size ---', flush=True)
    qn = run('[full] normal16', n_full, seed=11, dist='normal16')
    qr = run('[full] rademacher8', n_full, seed=11, dist='rademacher8')
    rel = np.abs(qr - qn) / qn
    print(f'q95 rel shift per mode: {np.array2string(rel, precision=4)}',
          flush=True)
    qn2 = run('[full] normal16 seed2', n_full, seed=12, dist='normal16')
    noise = np.abs(qn2 - qn) / qn
    print(f'q95 MC noise (seed-to-seed): {np.array2string(noise, precision=4)}',
          flush=True)


if __name__ == '__main__':
    main()
