"""Marginal per-stage cost of the Rule-N surrogate under the REAL
dispatch cadence.

The round-3 anatomy (draws 7.6 / Grams 8.8 / fold+chol 5 / subspace 4.5
/ proj 3 ms) was assembled from isolated stage timings; the round-4
lever sweep contradicts it (rad8 should cut ~10 ms/run, measured -2.7).
This probe times PREFIXES of the actual surrogate program — trivial /
draws / +Grams / +reduction / +loadings / full — each as the production
``jit(vmap(one_run))`` batch-1 pipelined cadence, so the differences
are honest marginal costs including whatever the dispatch pipeline
hides.  Config: rademacher8 + it6 + ns14 + tol 1e-4 (the round-4
candidate), north-star shapes.

Also sweeps batch_size {1, 2, 4, 8} on the full program (the round-3
"batch=1 wins" measurement predates the loose-tolerance rotation).

Usage: nohup timeout 3600 python -u scripts/stage_probe.py > log &
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
    from xmca_tpu.ops.surrogate import bits_field

    on_tpu = jax.default_backend() == 'tpu'
    if on_tpu:
        n_obs, p, n_runs = 2000, 100_000, 48
    else:
        n_obs, p, n_runs = 256, 2048, 8
    n_rot, n_iter, tol = 10, 6, 1e-4
    H = _fast.hilbert_imag_matrix_device(n_obs, np.float32)
    f_eps = float(np.finfo(np.float32).eps)

    def draws(seed):
        s = seed
        return [bits_field(s * 2 + i, (n_obs, p), dist='rademacher8')
                for i in range(2)]

    def grams(seed):
        out = []
        for X in draws(seed):
            Gc, mu, Xb = _fast._int8_centered_gram(X)
            Gz = _fast._analytic_fold(Gc, H).astype(jnp.complex64)
            out.append((_fast._jitter(Gz, p, 1e-6, input_eps=f_eps),
                        mu, Xb))
        return out

    def reduction(seed, key):
        (Gl, _, _), (Gr, _, _) = grams(seed)
        La = jnp.linalg.cholesky(Gl)
        Lb = jnp.linalg.cholesky(Gr)
        M = jnp.matmul(La.conj().T, Lb,
                       precision=jax.lax.Precision.HIGHEST) / (n_obs - 1)
        U, s, V = _fast.subspace_svd(M, key, k=n_rot, n_iter=n_iter)
        return La, Lb, U, s, V

    def loadings(seed, key):
        # regenerate the fields for the back-projection (mirrors the
        # production program, where XLA keeps Xb alive instead)
        gl, gr = grams(seed)
        La = jnp.linalg.cholesky(gl[0])
        Lb = jnp.linalg.cholesky(gr[0])
        M = jnp.matmul(La.conj().T, Lb,
                       precision=jax.lax.Precision.HIGHEST) / (n_obs - 1)
        U, s, V = _fast.subspace_svd(M, key, k=n_rot, n_iter=n_iter)

        def spatial(Xb, mu, L_chol, T_side):
            T = jax.scipy.linalg.solve_triangular(
                L_chol.conj().T, T_side, lower=False
            )
            S_stack = _fast.analytic_projection_stack(T, H).astype(
                jnp.float32
            )
            P = _fast._data_dot(Xb.T, S_stack)
            P = P - mu[:, None] * jnp.sum(S_stack, axis=0)[None, :]
            return _fast.combine_analytic_projection(P)

        Vl = spatial(gl[2], gl[1], La, U)
        Vr = spatial(gr[2], gr[1], Lb, V)
        sq = jnp.sqrt(s).astype(Vl.dtype)
        return jnp.concatenate([Vl, Vr], 0) * sq[None, :], s

    stages = {
        'trivial': lambda sr, key: (sr[0].astype(jnp.float32) * 2.0,),
        'draws': lambda sr, key: tuple(
            jnp.sum(X, dtype=jnp.int32) for X in draws(sr[0])
        ),
        '+grams': lambda sr, key: tuple(
            jnp.real(jnp.trace(g)) for g, _, _ in grams(sr[0])
        ),
        '+reduce': lambda sr, key: (reduction(sr[0], key)[3],),
        '+loadings': lambda sr, key: (
            jnp.linalg.norm(loadings(sr[0], key)[0], axis=0).real,
        ),
        'full': lambda sr, key: _fast.fast_surrogate_variance_int8(
            sr[0], key, n_obs, (p, p), H=H, complexify=True,
            rotated=True, n_rot=n_rot, power=1, tol=tol, n_iter=n_iter,
            polar_method='ns14',
        ),
    }

    def cadence(fn, batch, n):
        seeds = (np.arange(n, dtype=np.int32) + 7)[:, None]
        keys = jax.random.split(jax.random.PRNGKey(3), n)
        outs = []
        for s0 in range(0, n, batch):
            sb = jnp.asarray(seeds[s0:s0 + batch])
            kb = jnp.asarray(keys[s0:s0 + batch])
            outs.append(fn(sb, kb))
        # one trailing gather (the production _ensemble_map discipline)
        return np.asarray(
            jnp.concatenate([jnp.ravel(o[0]).astype(jnp.float32)
                             for o in outs])
        )

    for name, body in stages.items():
        fn = jax.jit(jax.vmap(body, in_axes=(0, 0)))
        cadence(fn, 1, min(8, n_runs))          # warm/compile
        t0 = time.perf_counter()
        out = cadence(fn, 1, n_runs)
        dt = time.perf_counter() - t0
        assert np.isfinite(out).any()
        print('%-10s %7.2f s  %6.2f ms/run' % (name, dt,
                                               1e3 * dt / n_runs),
              flush=True)

    full = jax.jit(jax.vmap(stages['full'], in_axes=(0, 0)))
    for batch in (2, 4, 8):
        cadence(full, batch, min(2 * batch, n_runs))
        t0 = time.perf_counter()
        out = cadence(full, batch, n_runs)
        dt = time.perf_counter() - t0
        assert np.isfinite(out).any()
        print('full batch=%d %6.2f s  %6.2f ms/run' % (batch, dt,
                                                       1e3 * dt / n_runs),
              flush=True)
    print('done', flush=True)


if __name__ == '__main__':
    main()
