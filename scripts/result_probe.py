"""Decompose the result-layer getter walls (round-5 demand: explain the
eofs/reconstructed_fields numbers vs round 3).

Breaks each getter into its device/transfer/host parts at north-star
shapes: eofs = fused kernel + (p, k) c64 transfer x 2 fields;
reconstructed_fields = factor readback + host sgemm + full-grid
allocation; predict = new-data upload + projection.  Also measures the
raw tunnel device->host rate with a plain (p, 10) c64 pull so the
transfer-bound getters can be normalized by the day's link speed.

Run ALONE on the chip.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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
    from xmca_tpu.array import MCA
    from xmca_tpu.utils.transfer import to_numpy as _to_np

    on_tpu = jax.default_backend() == 'tpu'
    n_obs, p = (2000, 100_000) if on_tpu else (256, 2048)
    rng = np.random.default_rng(0)
    t = np.arange(n_obs, dtype=np.float32)
    modes = np.sin(
        2 * np.pi * t[:, None] * np.arange(1, 9)[None, :] / n_obs
    ).astype(np.float32)

    def make(seed):
        r = np.random.default_rng(seed)
        return (modes @ r.standard_normal((8, p), dtype=np.float32)
                + r.standard_normal((n_obs, p), dtype=np.float32))

    m = MCA(make(1), make(2))
    if on_tpu:
        m.set_solver(truncate=12)
    m.solve(complexify=on_tpu)
    m.rotate(10)

    def med3(fn):
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            walls.append(time.perf_counter() - t0)
        return float(np.median(walls))

    # raw link rate: (p, 10) complex pull through the split transfer
    basis = m._basis_dev()['left'][:, :10]
    _to_np(basis)
    wall = med3(lambda: _to_np(basis))
    nbytes = int(np.prod(basis.shape)) * 8
    print('raw (p,10) c64 pull: %.3f s  -> %.1f MB/s'
          % (wall, nbytes / wall / 1e6), flush=True)

    for name, fn in (
        ('pcs(10)', lambda: m.pcs(10)),
        ('eofs(10)', lambda: m.eofs(10)),
        ('hom_patterns(10)', lambda: m.homogeneous_patterns(10)),
        ('predict(20)', lambda: m.predict(left=make(3)[:20])),
    ):
        fn()
        print('%-18s %.3f s' % (name, med3(fn)), flush=True)

    # reconstruction: factors vs host gemm vs total
    m.reconstructed_fields(mode=5)      # warm
    t0 = time.perf_counter()
    A, B = m._reconstruct_host_factors('left', 5, True)
    t_fact = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = A @ B.T
    t_gemm = time.perf_counter() - t0
    gflops = 2.0 * A.shape[0] * A.shape[1] * B.shape[0] / t_gemm / 1e9
    print('reconstruct factors (device+transfer): %.3f s' % t_fact,
          flush=True)
    print('reconstruct host sgemm (%s x %s): %.3f s  (%.1f GFLOP/s)'
          % (A.shape, B.shape[::-1], t_gemm, gflops), flush=True)
    del out
    t0 = time.perf_counter()
    m.reconstructed_fields(mode=5)
    print('reconstructed_fields(5) total: %.3f s'
          % (time.perf_counter() - t0), flush=True)


if __name__ == '__main__':
    main()
