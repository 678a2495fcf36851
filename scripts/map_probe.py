"""Does fusing k Rule-N runs into one device program beat the 18 ms
dispatch floor?  (runs_per_dispatch knob; run ALONE on the chip)"""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np

def main():
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    from xmca_tpu.array import MCA

    n_obs, p, n_runs = 2000, 100_000, 125
    rng = np.random.default_rng(0)
    t = np.arange(n_obs, dtype=np.float32)
    modes = np.sin(2*np.pi*t[:,None]*np.arange(1,9)[None,:]/n_obs).astype(np.float32)
    Xl = modes @ rng.standard_normal((8,p), dtype=np.float32) + rng.standard_normal((n_obs,p), dtype=np.float32)
    Xr = modes @ rng.standard_normal((8,p), dtype=np.float32) + rng.standard_normal((n_obs,p), dtype=np.float32)

    m = MCA(Xl, Xr)
    m.set_solver(truncate=12)
    m.solve(complexify=True)
    m.rotate(10)

    q95_ref = None
    for k in (None, 5, 25, 125):
        if k is not None:
            m.set_solver(runs_per_dispatch=k)
        label = 'dispatch' if k is None else 'map%d' % k
        t0 = time.perf_counter()
        sv = m.rule_n(n_runs, seed=7, disable_progress=True)
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        sv = m.rule_n(n_runs, seed=7, disable_progress=True)
        wall = time.perf_counter() - t0
        q95 = np.quantile(np.asarray(sv), 0.95, axis=1)[:10]
        if q95_ref is None:
            q95_ref = q95
        shift = np.max(np.abs(q95 - q95_ref)/np.where(q95_ref==0,1.0,q95_ref))
        print('%-9s warm %7.1f s  timed %6.2f s  %5.1f ms/run  kept=%3d  q95 shift vs dispatch: %.2e'
              % (label, warm, wall, 1e3*wall/n_runs, sv.shape[1], shift), flush=True)

if __name__ == '__main__':
    main()
