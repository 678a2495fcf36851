"""A/B the varimax iteration space inside the Rule-N ensemble.

Round-5 lever: `core.rotation.varimax(space='mode')` rewrites the fixed
point as a cubic form in R against the one-time fourth-moment tensor of
the Kaiser-normalized loading stack — each iteration becomes
p-independent (~1e5 MACs at k=10) instead of a ~3x memory pass over the
(200k, 10) stack, and surrogate iteration counts are heavy-tailed
(2..530).  The auto gate ships 'mode' for tall stacks; this probe
forces each space in a separate process (the jit + ensemble-fn caches
would otherwise pin the first-traced variant) and records per-run walls
plus the q95 null-quantile shift at the bench ensemble size.

Usage (run each ALONE on the chip):
    python -u scripts/varimax_space_probe.py data
    python -u scripts/varimax_space_probe.py mode
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SPACE = sys.argv[1] if len(sys.argv) > 1 else 'mode'


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

    from xmca_tpu.core import rotation as _rot
    assert SPACE in ('data', 'mode')
    # the surrogate pipelines consult this gate at trace time
    _rot.ensemble_space = lambda *a: SPACE       # force before any trace

    from xmca_tpu.stats.significance import rule_n_spectra

    on_tpu = jax.default_backend() == 'tpu'
    if on_tpu:
        n_obs, p = 2000, 100_000
        n_probe, n_full = 48, 125
    else:
        n_obs, p = 256, 2048
        n_probe, n_full = 16, 32

    # the shipped TPU ensemble defaults (stats/significance.py)
    common = dict(
        complexify=True, rotated=True, n_rot=10, power=1,
        dtype=np.dtype('bfloat16') if on_tpu else np.dtype('float32'),
        spectrum='fast', surrogate_source='generated',
        surrogate_dist='rademacher8', tol=1e-4, polar_method='ns14',
        subspace_iters=6,
    )

    def run(tag, n_runs, seed):
        t0 = time.perf_counter()
        spectra, totals = rule_n_spectra(
            n_obs, (p, p), n_runs, seed=seed, **common,
        )
        dt = time.perf_counter() - t0
        frac = spectra / totals[:, None]
        q95 = np.quantile(frac, 0.95, axis=0)
        print(
            f'[{SPACE}] {tag:8s} n={n_runs:4d}  {dt:7.2f} s '
            f'{1e3 * dt / n_runs:7.1f} ms/run  kept={spectra.shape[0]:4d} '
            f'q95[0]={q95[0]:.5f} q95[9]={q95[9]:.5f}',
            flush=True,
        )
        return q95

    run('warm', n_probe, seed=1)
    run('timed', n_probe, seed=2)
    q = run('full', n_full, seed=11)
    np.save('/tmp/varimax_space_q95_%s.npy' % SPACE, q)
    other = '/tmp/varimax_space_q95_%s.npy' % (
        'data' if SPACE == 'mode' else 'mode')
    if os.path.exists(other):
        qo = np.load(other)
        rel = np.abs(q - qo) / qo
        print(f'q95 rel shift mode-vs-data: '
              f'{np.array2string(rel, precision=4)}', flush=True)


if __name__ == '__main__':
    main()
