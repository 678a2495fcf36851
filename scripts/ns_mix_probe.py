"""Which phase of the scaled-NS schedule needs the HIGHEST tier?

The on-chip two-gate nuclear-norm check measured the shipped mixed
layout (bulk at HIGH, last two steps + trace at HIGHEST) at a mixing
cost of 2.27e-4 on a cond-1e6 stress matrix — 13% over its 2e-4 gate,
while all-HIGHEST reads 1.2e-6.  The error survives the exact final
steps, i.e. it is unitary/subspace drift imprinted during the bulk, not
radial error (which the final contraction would square away).  This
probe times and scores tier LAYOUTS on-chip to find where the damage
happens and what protection costs:

  hi2       — shipped: HIGH bulk, last 2 HIGHEST
  front     — first half HIGHEST, then HIGH, last 2 HIGHEST
  back      — HIGH first half, HIGHEST second half
  tail6     — HIGH bulk, last 6 HIGHEST
  allhigh   — every step HIGH (trace still HIGHEST)
  allhi     — every step HIGHEST (accuracy ceiling)

Scored against the exact spectrum sum on (a) the cond-1e6 geomspace
stress matrix from tpu_checks and (b) a production-like jittered
analytic fold kernel (2048x2048 complex, real data spectrum + 1e-6
jitter).  Timed at the fold-kernel shape with dependent readbacks.

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
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    from xmca_tpu.core import fastpath as _fast
    from xmca_tpu.core.linalg import kernel_svd, ns_polar_apply

    sc = _fast._NS_SCALES_EXACT
    n_sc = len(sc)
    half = n_sc // 2
    hi, high = _fast._dot_hi, _fast._dot_high

    def make_nuc(phases):
        """phases: list of (scales, dot) applied in order."""
        def nuc(M):
            fro = jnp.linalg.norm(M)
            W = M / jnp.where(fro == 0, 1.0, fro)
            for scales, dot in phases:
                W = ns_polar_apply(W, scales, dot=dot)
            return jnp.real(jnp.trace(hi(W.conj().T, M)))
        return nuc

    layouts = {
        'hi2': [(sc[:-2], high), (sc[-2:], hi)],
        'front': [(sc[:half], hi), (sc[half:-2], high), (sc[-2:], hi)],
        'back': [(sc[:half], high), (sc[half:], hi)],
        'tail6': [(sc[:-6], high), (sc[-6:], hi)],
        'allhigh': [(sc, high)],
        'allhi': [(sc, hi)],
    }

    # ---- stress matrix: cond 1e6, geomspace spectrum (tpu_checks 4c)
    r1 = np.random.default_rng(7)
    d = np.geomspace(1.0, 1e-6, 256)
    Qm = np.linalg.qr(r1.standard_normal((256, 256))
                      + 1j * r1.standard_normal((256, 256)))[0]
    Pm = np.linalg.qr(r1.standard_normal((256, 256))
                      + 1j * r1.standard_normal((256, 256)))[0]
    Ms = (Qm * d) @ Pm.conj().T
    from xmca_tpu.utils.transfer import to_device
    Ms_d = to_device(Ms.astype(np.complex64))
    ssum_s = float(np.sum(d))

    # ---- production-like fold kernel: red-noise fields -> analytic
    # fold -> whitened kernel M (what nuclear_norm sees in solve)
    n_obs, p = 2048, 8192
    r2 = np.random.default_rng(3)
    t = np.arange(n_obs, dtype=np.float32)
    modes = np.sin(
        2 * np.pi * t[:, None] * np.arange(1, 9)[None, :] / n_obs
    ).astype(np.float32)
    Xl = (modes @ r2.standard_normal((8, p), dtype=np.float32)
          + r2.standard_normal((n_obs, p), dtype=np.float32))
    Xr = (modes @ r2.standard_normal((8, p), dtype=np.float32)
          + r2.standard_normal((n_obs, p), dtype=np.float32))
    Xl -= Xl.mean(0)
    Xr -= Xr.mean(0)
    Xl_d, Xr_d = jnp.asarray(Xl), jnp.asarray(Xr)
    H = _fast.hilbert_imag_matrix_device(n_obs, np.float32)

    @jax.jit
    def fold_kernel(Xl, Xr, H):
        return _fast.analytic_reduced_kernel(Xl, Xr, H, 1e-6)[0]

    Mp = fold_kernel(Xl_d, Xr_d, H)
    sv = jax.jit(lambda M: kernel_svd(M, compute_uv=False))(Mp)
    ssum_p = float(jnp.sum(sv))

    print(f'schedule: {n_sc} steps; fold kernel {Mp.shape} '
          f'spectrum sum {ssum_p:.6e}', flush=True)

    for name, phases in layouts.items():
        nuc = jax.jit(make_nuc(phases))
        es = abs(float(nuc(Ms_d)) - ssum_s) / ssum_s
        ep = abs(float(nuc(Mp)) - ssum_p) / ssum_p
        walls = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(nuc(Mp))
            walls.append(time.perf_counter() - t0)
        print(f'{name:8s} stress rel {es:.3e}  fold rel {ep:.3e}  '
              f'{1e3 * float(np.median(walls)):7.2f} ms @ {Mp.shape}',
              flush=True)


if __name__ == '__main__':
    main()
