"""Benchmark: the BASELINE.md north-star workload on one TPU chip.

North star (BASELINE.md): complex rotated MCA on two 40-year 0.25-degree
fields — solve + rotate + 1000 Rule-N surrogates — in < 60 s on a TPU
v5e-8.  Rule-N surrogates are embarrassingly parallel across chips (the
ensemble axis shards with zero cross-device traffic; linearity is verified
by tests/integration/test_mesh.py), so one chip running 1/8 of the
surrogates in T seconds is the v5e-8 doing all 1000 in ~T seconds.

This script runs the 2000-step x 100k-cell configuration (1/8 = 125
surrogates) end-to-end on the available chip using the matmul-only fast
path (Cholesky-reduced kernel + subspace SVD + varimax) and prints ONE
JSON line; ``vs_baseline`` > 1 means the < 60 s target is beaten.

On non-TPU backends a small smoke configuration runs instead (same
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
    import jax.numpy as jnp
    from xmca_tpu.core.preprocess import complexify
    from xmca_tpu.core.fastpath import (fast_solve_truncated,
                                        fast_rotated_variance_analytic,
                                        hilbert_imag_matrix)
    from xmca_tpu.core.rotation import promax

    on_tpu = jax.default_backend() == 'tpu'
    if on_tpu:
        n_obs, p_l, p_r = 2000, 100_000, 100_000
        n_surr = 125          # 1/8 of the 1000-surrogate north star
        batch = 1
        n_rot = 10
        target_s = 60.0
        metric = 'cplx_rot_mca_solve_rotate_rulen1000_v5e8equiv_s'
    else:
        n_obs, p_l, p_r = 256, 2048, 2048
        n_surr = 16
        batch = 8
        n_rot = 10
        target_s = 60.0
        metric = 'cplx_rot_mca_rulen_smoke_cpu_s'

    key = jax.random.PRNGKey(0)
    kl, kr, ke = jax.random.split(key, 3)

    # ---- data: synthetic fields with geophysical-like red spectra
    t = jnp.arange(n_obs, dtype=jnp.float32)
    modes = jnp.sin(
        2 * jnp.pi * t[:, None] * jnp.arange(1, 9)[None, :] / n_obs
    )
    Xl = (modes @ jax.random.normal(kl, (8, p_l), jnp.float32)
          + jax.random.normal(jax.random.fold_in(kl, 1), (n_obs, p_l),
                              jnp.float32))
    Xr = (modes @ jax.random.normal(kr, (8, p_r), jnp.float32)
          + jax.random.normal(jax.random.fold_in(kr, 1), (n_obs, p_r),
                              jnp.float32))
    Xl = Xl - jnp.mean(Xl, axis=0)
    Xr = Xr - jnp.mean(Xr, axis=0)

    # ---- step 1: complex rotated solve of the real data (fast path)
    @jax.jit
    def solve_rotate(Xl, Xr):
        Zl = complexify(Xl)
        Zr = complexify(Xr)
        s, Vl, Vr = fast_solve_truncated(
            Zl, Zr, jax.random.PRNGKey(1), n_modes=n_rot, n_iter=8
        )
        L = jnp.concatenate([Vl, Vr], axis=0) \
            * jnp.sqrt(s).astype(Vl.dtype)[None, :]
        L_rot, R, phi, conv, _ = promax(L, power=1, tol=1e-8)
        n_left = Vl.shape[0]
        variance = (jnp.linalg.norm(L_rot[:n_left], axis=0)
                    * jnp.linalg.norm(L_rot[n_left:], axis=0))
        return s, variance, conv

    # ---- step 2: complex rotated Rule-N surrogates (vmapped batches).
    # The analytic signal is folded into the Gram algebra
    # (core.fastpath.hilbert_imag_matrix): per surrogate the only
    # data-sized op is one real MXU Gram per field — no FFT, no complex
    # field materialization.
    H = jnp.asarray(hilbert_imag_matrix(n_obs, np.float32))

    # Surrogate draws are bfloat16 with float32 MXU accumulation: random
    # data plus ~0.4% quantization noise is an equally valid null sample
    # (the induced relative error on Gram entries is ~1e-5, far below the
    # Monte-Carlo sampling noise of the ensemble), and the Gram runs in
    # the MXU's native single-pass mode.
    surr_dtype = jnp.bfloat16 if on_tpu else jnp.float32

    # Fused surrogate pipeline, vmapped in small batches.  The varimax
    # while_loop is HBM-bandwidth-bound with a heavy-tailed iteration-count
    # distribution, so small batches beat large ones (a batch pays the max
    # iteration count of its members); the polar update uses Newton-Schulz
    # matmuls instead of small SVDs.
    def one_surrogate(run_key):
        ka, kb, kf = jax.random.split(run_key, 3)
        Sl = jax.random.normal(ka, (n_obs, p_l), surr_dtype)
        Sr = jax.random.normal(kb, (n_obs, p_r), surr_dtype)
        Sl = Sl - jnp.mean(Sl, axis=0, dtype=jnp.float32).astype(surr_dtype)
        Sr = Sr - jnp.mean(Sr, axis=0, dtype=jnp.float32).astype(surr_dtype)
        return fast_rotated_variance_analytic(
            Sl, Sr, H, kf, n_rot=n_rot, power=1, n_iter=8,
            polar_method='ns',
        )

    surrogate_batch = jax.jit(jax.vmap(one_surrogate))
    keys = jax.random.split(ke, n_surr)

    # ---- warmup (compile; excluded from the measured wall-clock).
    # Note: remote TPU backends can complete ``block_until_ready`` before
    # execution finishes; a host transfer of a dependent scalar is the only
    # reliable barrier, so timing brackets a float() readback.
    w1 = solve_rotate(Xl, Xr)
    float(jnp.sum(w1[1]).real)
    w2 = surrogate_batch(keys[:batch])
    float(jnp.sum(w2[0]))
    del w1, w2

    # ---- measured run
    t0 = time.perf_counter()
    s, variance, conv = solve_rotate(Xl, Xr)
    var_parts = []
    conv_parts = []
    for start in range(0, n_surr, batch):
        kb = keys[start:start + batch]
        if kb.shape[0] < batch:
            kb = jnp.concatenate([kb, keys[:batch - kb.shape[0]]])
        v, c = surrogate_batch(kb)
        take = min(batch, n_surr - start)
        var_parts.append(v[:take])
        conv_parts.append(c[:take])
    var_all = jnp.concatenate(var_parts, axis=0)
    conv_all = jnp.concatenate(conv_parts, axis=0)
    # dependent host readback = true end-to-end barrier
    total = float(
        jnp.sum(var_all).astype(jnp.float32)
        + jnp.sum(variance).real.astype(jnp.float32)
    )
    wall = time.perf_counter() - t0
    assert np.isfinite(total)

    var_surr = np.asarray(var_all)
    assert np.isfinite(var_surr).all()
    assert int(np.asarray(conv_all).sum()) >= int(0.9 * n_surr)
    assert np.isfinite(np.asarray(variance)).all()

    print(json.dumps({
        'metric': metric,
        'value': round(wall, 3),
        'unit': 's',
        'vs_baseline': round(target_s / wall, 3),
    }))


if __name__ == '__main__':
    main()
