"""Benchmark suite: the five BASELINE.md instrumentation configs.

Each config prints one JSON line.  Sizes scale with the backend (full
production shapes on TPU, smoke shapes on CPU so the suite is always
runnable).  ``python benchmarks/run_all.py [config ...]`` with configs in
{airtemp, rotation, cplx_theta, cplx_rot_large, significance}.

1. air_temperature-like west/east MCA (2920 steps, ~1.3k cells)
2. Varimax/Promax rotated PCA + MCA (n_rot=10, power 1 and 4)
3. Complex MCA with theta extension (monthly 1-degree, 40 yr)
4. Complex rotated MCA on 0.25-degree-scale fields (the north star;
   full run: bench.py at the repo root)
5. Rule-N + block-bootstrap significance ensembles
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _setup():
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
    return jax, jax.default_backend() == 'tpu'


def _fields(jax, n_obs, p_l, p_r, seed=0):
    import jax.numpy as jnp
    key = jax.random.PRNGKey(seed)
    kl, kr = jax.random.split(key)
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
    return np.asarray(Xl), np.asarray(Xr)


def _emit(metric, wall, extra=None):
    rec = {'metric': metric, 'value': round(wall, 3), 'unit': 's'}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def bench_airtemp():
    """Config 1: 2920 steps x ~1.3k cells, plain MCA end to end."""
    jax, on_tpu = _setup()
    from xmca_tpu.array import MCA
    Xl, Xr = _fields(jax, 2920, 36 * 19, 36 * 19)
    m = MCA(Xl.reshape(2920, 19, 36), Xr.reshape(2920, 19, 36))
    m.solve()  # warm compile
    _ = m.pcs(20)
    m2 = MCA(Xl.reshape(2920, 19, 36), Xr.reshape(2920, 19, 36))
    t0 = time.perf_counter()
    m2.solve()
    _ = np.asarray(m2.singular_values(20))
    _ = m2.pcs(20)
    _ = m2.eofs(20)
    _emit('airtemp_mca_solve_getters_s', time.perf_counter() - t0)


def bench_rotation():
    """Config 2: varimax + promax rotated PCA and MCA."""
    jax, on_tpu = _setup()
    from xmca_tpu.array import MCA

    def sweep(Xl, Xr):
        for power in (1, 4):
            pca = MCA(Xl)
            pca.solve()
            pca.rotate(10, power)
            mca = MCA(Xl, Xr)
            mca.solve()
            mca.rotate(10, power)
            _ = np.asarray(mca.explained_variance(10))

    Xl, Xr = _fields(jax, 2920, 684, 684)
    sweep(Xl, Xr)  # warm every shape/power combination (compile)
    t0 = time.perf_counter()
    sweep(Xl, Xr)
    _emit('rotated_pca_mca_varimax_promax_s', time.perf_counter() - t0)


def bench_cplx_theta():
    """Config 3: complex MCA with theta extension, monthly 40 yr."""
    jax, on_tpu = _setup()
    from xmca_tpu.array import MCA
    n_obs = 480  # 40 years monthly
    p = 360 * 180 // 4 if on_tpu else 2000  # ~1-degree grid
    Xl, Xr = _fields(jax, n_obs, p, p)
    m = MCA(Xl, Xr)
    m.solve(complexify=True, extend='theta', period=12)  # warm
    m2 = MCA(Xl, Xr)
    t0 = time.perf_counter()
    m2.solve(complexify=True, extend='theta', period=12)
    _ = np.asarray(m2.singular_values(20))
    _emit('cplx_mca_theta_extension_s', time.perf_counter() - t0,
          {'n_space': p})


def bench_cplx_rot_large():
    """Config 4: complex rotated solve on 0.25-degree-scale fields
    (solve only; the full north-star run incl. 1000 surrogates is
    bench.py)."""
    jax, on_tpu = _setup()
    import jax.numpy as jnp
    from xmca_tpu.core.preprocess import complexify
    from xmca_tpu.core.fastpath import fast_solve_truncated
    from xmca_tpu.core.rotation import promax
    n_obs = 2000
    p = 100_000 if on_tpu else 4000
    Xl, Xr = _fields(jax, n_obs, p, p)
    jXl = jnp.asarray(Xl) - jnp.asarray(Xl).mean(0)
    jXr = jnp.asarray(Xr) - jnp.asarray(Xr).mean(0)

    @jax.jit
    def run(Xl, Xr):
        Zl, Zr = complexify(Xl), complexify(Xr)
        s, Vl, Vr = fast_solve_truncated(
            Zl, Zr, jax.random.PRNGKey(1), n_modes=10, n_iter=8
        )
        L = jnp.concatenate([Vl, Vr], 0) \
            * jnp.sqrt(s).astype(Vl.dtype)[None]
        L_rot, R, phi, conv, _ = promax(L, power=1, tol=1e-8)
        return s, jnp.linalg.norm(L_rot, axis=0), conv

    out = run(jXl, jXr)
    float(jnp.sum(out[1]).astype(jnp.float32))  # warm barrier
    t0 = time.perf_counter()
    out = run(jXl, jXr)
    total = float(jnp.sum(out[1]).astype(jnp.float32))
    wall = time.perf_counter() - t0
    assert np.isfinite(total)
    _emit('cplx_rot_solve_large_s', wall, {'n_space': p})


def bench_significance():
    """Config 5: Rule-N + block-bootstrap ensembles on fixture-scale
    data, exact and fast spectrum modes."""
    jax, on_tpu = _setup()
    from xmca_tpu.array import MCA
    n_runs = 200 if on_tpu else 50
    Xl, Xr = _fields(jax, 492, 684, 684)
    m = MCA(Xl, Xr)
    m.solve()
    # warm at the FULL ensemble size: the gather/rescale tail compiles
    # per run count
    m.rule_n(n_runs, seed=0, disable_progress=True)
    t0 = time.perf_counter()
    rn = m.rule_n(n_runs, seed=1, disable_progress=True)
    _emit('rulen_exact_runs_per_s', time.perf_counter() - t0,
          {'runs': int(rn.shape[1])})
    m.set_solver(spectrum='fast')
    m.rule_n(n_runs, n_modes=20, seed=0, disable_progress=True)  # warm
    t0 = time.perf_counter()
    rn = m.rule_n(n_runs, n_modes=20, seed=1, disable_progress=True)
    _emit('rulen_fast_runs_per_s', time.perf_counter() - t0,
          {'runs': int(rn.shape[1])})
    # bootstrap keeps the backend-default spectrum ('fast' on TPU:
    # dense eigh per resample would be the pathological path there)
    m.bootstrapping(n_runs, 3, block_size=4, disable_progress=True,
                    seed=2)  # warm at full ensemble size
    t0 = time.perf_counter()
    bs = m.bootstrapping(
        n_runs, 3, block_size=4, disable_progress=True, seed=3
    )
    _emit('block_bootstrap_runs_per_s', time.perf_counter() - t0,
          {'runs': int(bs.shape[1])})


def bench_hilbert_long():
    """Config 6: complexification with a LONG time axis (16k steps).

    Exercises the power-of-two circular-convolution route (the dense
    Hilbert operator would be a 1 GB matrix at this length, and XLA's
    native FFT would lower to slow Bluestein convolutions for the
    non-power-of-two length).
    """
    jax, on_tpu = _setup()
    import jax.numpy as jnp
    from xmca_tpu.core.preprocess import complexify
    n_obs = 16_000                       # deliberately not a power of 2
    p = 20_000 if on_tpu else 64
    Xl, _ = _fields(jax, n_obs, p, 1)
    jXl = jnp.asarray(Xl)
    jXl = jXl - jXl.mean(0)

    def run(x):
        z = complexify(x)
        # dependent scalar readback = honest execution barrier
        return float(jnp.sum(jnp.abs(z) ** 2).astype(jnp.float32))

    run(jXl)                             # warm (compile)
    t0 = time.perf_counter()
    total = run(jXl)
    wall = time.perf_counter() - t0
    assert np.isfinite(total)
    _emit('hilbert_complexify_16k_steps_s', wall,
          {'n_obs': n_obs, 'n_space': p})


def bench_promax_ensemble():
    """Config 7: promax (power=4) ROTATED Rule-N ensemble.

    The pinv/regression tail of power>1 rotations runs inside every
    vmapped surrogate here (the reference supports power>1 rotated
    ensembles, xmca/array.py:1935-1943) — the perf evidence for the
    oblique-rotation path at ensemble scale.
    """
    jax, on_tpu = _setup()
    from xmca_tpu.array import MCA
    n_runs = 100 if on_tpu else 16
    Xl, Xr = _fields(jax, 492, 684, 684)
    m = MCA(Xl, Xr)
    m.solve()
    m.rotate(10, power=4)
    # warm at the FULL ensemble size (gather/rescale tail compiles
    # per run count)
    m.rule_n(n_runs, seed=0, disable_progress=True)
    t0 = time.perf_counter()
    rn = m.rule_n(n_runs, seed=1, disable_progress=True)
    _emit('rulen_promax4_rotated_runs_s', time.perf_counter() - t0,
          {'runs': int(rn.shape[1]), 'power': 4})


def bench_streamed():
    """Config 8: out-of-core streamed solve (no reference counterpart).

    Chunks are generated on the fly (seeded per chunk), so the full
    field never exists in host RAM — on TPU this streams a
    (2000, 400k)-column field (3.2 GB f32, 2x the resident north-star
    width) through the chip in 50k-column chunks; complexified
    truncated solve via the streamed analytic fold.
    """
    jax, on_tpu = _setup()
    from xmca_tpu.array import MCA
    if on_tpu:
        n_obs, p, chunk = 2000, 400_000, 50_000
    else:
        n_obs, p, chunk = 256, 4096, 640

    def loader():
        for i, s in enumerate(range(0, p, chunk)):
            r = np.random.default_rng(1000 + i)
            yield r.standard_normal(
                (n_obs, min(chunk, p - s)), dtype=np.float32
            )

    def build():
        m = MCA.from_chunks(loader, None, n_observations=n_obs,
                            left_shape=(p,))
        m.set_solver(truncate=10)
        m.solve(complexify=True)
        return m

    build()                                     # compile both passes
    t0 = time.perf_counter()
    m = build()
    sv = np.asarray(m.singular_values())
    wall = time.perf_counter() - t0
    assert np.isfinite(sv).all()
    _emit('streamed_cplx_trunc_solve_s', wall,
          {'n_space': p, 'chunk': chunk})


def bench_result_layer():
    """Config 9: the result-layer device kernels, regression-tracked.

    Times every fused mode-space getter the round-3 rewrite introduced
    (api/array.py `_loadings_kernel`/`_scores_*`/`_pattern_kernel`/
    `_reconstruct_factors_kernel`): eofs, pcs, homogeneous patterns,
    reconstruction and predict — complex rotated at north-star scale on
    TPU, real rotated at fixture scale on CPU.  Wall time includes the
    host materialization (that IS the user-facing getter cost)."""
    jax, on_tpu = _setup()
    from xmca_tpu.array import MCA
    if on_tpu:
        n_obs, p = 2000, 100_000
    else:
        n_obs, p = 492, 684
    Xl, Xr = _fields(jax, n_obs, p, p)
    m = MCA(Xl, Xr)
    if on_tpu:
        m.set_solver(truncate=12)
    m.solve(complexify=on_tpu)
    m.rotate(10)
    new_left = Xl[:20]

    def paths():
        return [
            ('result_pcs_s', lambda: m.pcs(10)),
            ('result_eofs_s', lambda: m.eofs(10)),
            ('result_hom_patterns_s',
             lambda: m.homogeneous_patterns(10)),
            ('result_reconstructed_fields_s',
             lambda: m.reconstructed_fields(5)),
            ('result_predict_s', lambda: m.predict(left=new_left)),
        ]

    for _, fn in paths():            # warm (compile + basis transfer)
        fn()
    for metric, fn in paths():
        t0 = time.perf_counter()
        out = fn()
        wall = time.perf_counter() - t0
        lead = out['left'] if isinstance(out, dict) else out[0]['left']
        assert np.isfinite(np.asarray(lead).real).any()
        _emit(metric, wall, {'n_space': p, 'complex': bool(on_tpu)})


def bench_streamed_boot():
    """Config 10: Gram-space bootstrap of a chunk-backed model at
    north-star scale (stats/streaming_boot.py) vs the resident
    bootstrap of the same data.

    Three regimes with fundamentally different data-movement cost:
    * axis=0 unrotated — pure index algebra on the stored temporal
      Grams, ZERO passes over the data;
    * axis=0 rotated — one streamed projection pass per run batch
      (per-run weight stacks against every chunk);
    * axis=1 rotated — one counts-weighted Gram pass + one pooled
      projection pass per run batch.
    On the tunneled TPU the per-pass cost is dominated by re-uploading
    the chunks (~45 MB/s link); a production host feeds chunks at
    PCIe/disk rates instead, so the per-batch pass costs scale down by
    ~100x there while the axis=0 unrotated numbers carry over as-is.
    """
    jax, on_tpu = _setup()
    from xmca_tpu.array import MCA
    if on_tpu:
        n_obs, p, chunk, n_runs, batch = 2000, 100_000, 12_500, 16, 8
        n_runs_a0 = 64
    else:
        n_obs, p, chunk, n_runs, batch = 256, 4096, 640, 8, 4
        n_runs_a0 = 16
    Xl, Xr = _fields(jax, n_obs, p, p)

    def loader(X):
        def chunks():
            for s in range(0, p, chunk):
                yield X[:, s:s + chunk]
        return chunks

    ms = MCA.from_chunks(loader(Xl), loader(Xr), n_observations=n_obs,
                         left_shape=(p,), right_shape=(p,))
    ms.set_solver(truncate=10, batch_size=batch)
    ms.solve()

    def timed(metric, m, n_runs, **kw):
        kw.setdefault('block_size', 8)
        kw.setdefault('disable_progress', True)
        m.bootstrapping(n_runs, 10, seed=0, **kw)     # warm (compile)
        t0 = time.perf_counter()
        bs = m.bootstrapping(n_runs, 10, seed=1, **kw)
        wall = time.perf_counter() - t0
        assert np.isfinite(bs).any()
        _emit(metric, wall, {'runs': n_runs,
                             'ms_per_run': round(1e3 * wall / n_runs, 1)})

    timed('streamed_boot_axis0_s', ms, n_runs_a0)
    ms.rotate(10)
    timed('streamed_boot_axis0_rot_s', ms, n_runs)
    timed('streamed_boot_axis1_rot_s', ms, n_runs, axis=1)

    # resident comparison on the same data (fits in memory here; the
    # streamed path exists for when it does not)
    mr = MCA(Xl, Xr)
    mr.set_solver(truncate=10, batch_size=None)
    mr.solve()
    timed('resident_boot_axis0_s', mr, n_runs_a0)
    mr.rotate(10)
    timed('resident_boot_axis0_rot_s', mr, n_runs)


ALL = {
    'airtemp': bench_airtemp,
    'rotation': bench_rotation,
    'cplx_theta': bench_cplx_theta,
    'cplx_rot_large': bench_cplx_rot_large,
    'significance': bench_significance,
    'hilbert_long': bench_hilbert_long,
    'promax_ensemble': bench_promax_ensemble,
    'streamed': bench_streamed,
    'result_layer': bench_result_layer,
    'streamed_boot': bench_streamed_boot,
}

if __name__ == '__main__':
    names = sys.argv[1:] or list(ALL)
    for name in names:
        ALL[name]()
