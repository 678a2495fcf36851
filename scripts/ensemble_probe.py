"""Probe the per-run cost levers of the generated Rule-N ensemble.

The round-2/3 anatomy put the ~44 ms/run north-star floor at:
draws 7.6 / Grams 8.8 / fold+chol ~5 / subspace SVD 4.5 / projection ~3
/ varimax ~15 (amortized).  The varimax share is iteration count x
(body + unrolled NS-30 polar); the SVD share is 12 subspace iterations.
This script measures, at north-star scale on the real chip:

  * baseline (tol=1e-8 -> f32 clamp 1.2e-5, 'ns' 30-step polar, 12
    subspace iters)
  * shorter fixed NS polar ('ns14')
  * looser ensemble tolerance (1e-4 — the null-quantile statistic is a
    Monte-Carlo estimate with ~1/sqrt(2 N) ~ 6% relative error at
    N=125, so 1e-4 rotation accuracy is far below the noise floor)
  * fewer subspace iterations (8)
  * a rotated=False control (the non-rotation floor)

and, for the candidate default, the null-spectrum q95 shift vs the
baseline at the bench's 125-run ensemble size (must sit inside
Monte-Carlo noise).

Usage: nohup timeout 3600 python -u scripts/ensemble_probe.py > log &
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
    else:
        n_obs, p = 256, 2048
        n_probe, n_full = 16, 32
    n_vars = (p, p)

    common = dict(
        complexify=True, rotated=True, n_rot=10, power=1,
        dtype=np.dtype('bfloat16') if on_tpu else np.dtype('float32'),
        spectrum='fast',
        surrogate_source='generated', surrogate_dist='normal16',
    )

    def run(tag, n_runs, seed, **kw):
        t0 = time.perf_counter()
        spectra, totals = rule_n_spectra(
            n_obs, n_vars, n_runs, seed=seed, **common, **kw,
        )
        dt = time.perf_counter() - t0
        frac = spectra / totals[:, None]          # per-run normalized
        q95 = np.quantile(frac, 0.95, axis=0)
        print(
            f'{tag:34s} n={n_runs:4d}  {dt:7.2f} s '
            f'{1e3 * dt / n_runs:7.1f} ms/run  kept={spectra.shape[0]:4d} '
            f'q95[0]={q95[0]:.5f} q95[9]={q95[9]:.5f}',
            flush=True,
        )
        return q95

    configs = [
        ('base ns30 tol1e-8 it12', dict(tol=1e-8, polar_method='ns',
                                        subspace_iters=12)),
        ('ns14 tol1e-8 it12', dict(tol=1e-8, polar_method='ns14',
                                   subspace_iters=12)),
        ('ns30 tol1e-4 it12', dict(tol=1e-4, polar_method='ns',
                                   subspace_iters=12)),
        ('ns14 tol1e-4 it12', dict(tol=1e-4, polar_method='ns14',
                                   subspace_iters=12)),
        ('ns14 tol1e-4 it8', dict(tol=1e-4, polar_method='ns14',
                                  subspace_iters=8)),
    ]
    for tag, kw in configs:
        run(f'[warm] {tag}', n_probe, seed=1, **kw)
        run(f'[timed] {tag}', n_probe, seed=2, **kw)

    # non-rotation floor: same pipeline minus the rotation stage
    ctrl = dict(common)
    ctrl.update(rotated=False, n_rot=0)
    for tag_prefix in ('[warm]', '[timed]'):
        t0 = time.perf_counter()
        spectra, totals = rule_n_spectra(
            n_obs, n_vars, n_probe, seed=2, tol=1e-8,
            n_modes_fast=10, subspace_iters=12, **ctrl,
        )
        dt = time.perf_counter() - t0
        print(f'{tag_prefix} unrotated control          '
              f'n={n_probe:4d}  {dt:7.2f} s '
              f'{1e3 * dt / n_probe:7.1f} ms/run', flush=True)

    # statistical check at the bench ensemble size: candidate vs baseline
    print('--- q95 stability at full ensemble size ---', flush=True)
    qb = run('[full] base', n_full, seed=11, tol=1e-8, polar_method='ns',
             subspace_iters=12)
    qc = run('[full] candidate', n_full, seed=11, tol=1e-4,
             polar_method='ns14', subspace_iters=12)
    rel = np.abs(qc - qb) / qb
    print(f'q95 rel shift per mode: {np.array2string(rel, precision=4)}',
          flush=True)
    # an independent baseline seed calibrates Monte-Carlo noise itself
    qb2 = run('[full] base seed2', n_full, seed=12, tol=1e-8,
              polar_method='ns', subspace_iters=12)
    noise = np.abs(qb2 - qb) / qb
    print(f'q95 MC noise (seed-to-seed): {np.array2string(noise, precision=4)}',
          flush=True)


if __name__ == '__main__':
    main()
