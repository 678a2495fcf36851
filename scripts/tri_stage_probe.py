"""Marginal per-stage cost of the TRIANGLE-syrk surrogate pipeline.

Times PREFIXES of fast_surrogate_variance_tri — trivial / draws /
+syrk Grams / +fold+chol+reduce / +loadings / full — each at the
production jit(vmap(one_run)) batch-1 cadence with ONE gathered
readback, so differences are honest marginal costs.  Config:
rademacher8 + it6 + ns14 + tol 1e-4 at north-star shapes.

Usage: nohup timeout 3600 python -u scripts/tri_stage_probe.py > log &

MEASUREMENT CAVEAT (measured 2026-08-19): the FIRST timed cadence of a
fresh process runs ~2.4x slower than every later one (53.5 vs 22.7
ms/run for an identical exact-grade pipeline back-to-back) even after
an 8-run compile warmup — the remote dispatch path itself needs a
few dozen dispatches to reach steady state.  Single-config probes in
fresh processes (not this script — its stages warm each other) must
time a throwaway cadence first or they overstate costs ~2.4x.
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
    from xmca_tpu.ops.syrk import pad_to, syrk

    on_tpu = jax.default_backend() == 'tpu'
    if on_tpu:
        n_obs, p, n_runs = 2000, 100_000, 48
    else:
        n_obs, p, n_runs = 256, 2048, 8
    n_rot, n_iter, tol = 10, 6, 1e-4
    H = _fast.hilbert_imag_matrix_device(n_obs, np.float32)
    f_eps = float(np.finfo(np.float32).eps)
    interpret = not on_tpu
    n_pad, p_pad = pad_to(n_obs, p)

    def draws(seed):
        return [bits_field(seed * 2 + i, (n_pad, p_pad),
                           dist='rademacher8')
                for i in range(2)]

    def masked(X):
        ok = ((jax.lax.broadcasted_iota(jnp.int32, (n_pad, p_pad), 0)
               < n_obs)
              & (jax.lax.broadcasted_iota(jnp.int32, (n_pad, p_pad), 1)
                 < p))
        return jnp.where(ok, X.astype(jnp.bfloat16), jnp.bfloat16(0))

    def grams(seed):
        out = []
        for X in draws(seed):
            Xb = masked(X)
            G = syrk(Xb, interpret=interpret)[:n_obs, :n_obs]
            mu = jnp.sum(Xb, axis=0, dtype=jnp.float32) / n_obs
            w = _fast._data_dot(
                Xb, mu.astype(jnp.bfloat16)[:, None]
            )[:n_obs, 0]
            Gc = G - w[:, None] - w[None, :] + jnp.sum(mu * mu)
            Gz = _fast._analytic_fold(Gc, H).astype(jnp.complex64)
            out.append((_fast._jitter(Gz, p, 1e-6, input_eps=f_eps),
                        mu, Xb))
        return out

    def raw_grams(seed):
        # syrk only — no centering/fold (isolates the kernel cost)
        return [jnp.trace(syrk(masked(X), interpret=interpret))
                for X in draws(seed)]

    def reduction(seed, key):
        (Gl, _, _), (Gr, _, _) = grams(seed)
        La = jnp.linalg.cholesky(Gl)
        Lb = jnp.linalg.cholesky(Gr)
        M = jnp.matmul(La.conj().T, Lb,
                       precision=jax.lax.Precision.HIGHEST) / (n_obs - 1)
        U, s, V = _fast.subspace_svd(M, key, k=n_rot, n_iter=n_iter)
        return La, Lb, U, s, V

    def loadings(seed, key):
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
            S_pad = jnp.zeros((Xb.shape[0], S_stack.shape[1]),
                              jnp.float32).at[:n_obs].set(S_stack)
            P = _fast._data_dot(Xb.T, S_pad)[:p]
            P = P - mu[:p, None] * jnp.sum(S_stack, axis=0)[None, :]
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
        '+syrk': lambda sr, key: tuple(raw_grams(sr[0])),
        '+fold': lambda sr, key: tuple(
            jnp.real(jnp.trace(g)) for g, _, _ in grams(sr[0])
        ),
        '+reduce': lambda sr, key: (reduction(sr[0], key)[3],),
        '+loadings': lambda sr, key: (
            jnp.linalg.norm(loadings(sr[0], key)[0], axis=0).real,
        ),
        'full': lambda sr, key: _fast.fast_surrogate_variance_tri(
            sr[0], key, n_obs, (p, p), H=H, complexify=True,
            rotated=True, n_rot=n_rot, power=1, tol=tol, n_iter=n_iter,
            polar_method='ns14',
        ),
    }

    def cadence(fn, n):
        seeds = (np.arange(n, dtype=np.int32) + 7)[:, None]
        keys = jax.random.split(jax.random.PRNGKey(3), n)
        outs = []
        for s0 in range(n):
            sb = jnp.asarray(seeds[s0:s0 + 1])
            kb = jnp.asarray(keys[s0:s0 + 1])
            outs.append(fn(sb, kb))
        return float(jnp.sum(jnp.stack(
            [jnp.sum(jnp.ravel(o[0]).astype(jnp.float32)) for o in outs]
        )))

    for name, body in stages.items():
        fn = jax.jit(jax.vmap(body, in_axes=(0, 0)))
        cadence(fn, min(8, n_runs))             # warm/compile
        t0 = time.perf_counter()
        cadence(fn, n_runs)
        dt = time.perf_counter() - t0
        print('%-10s %7.2f s  %6.2f ms/run' % (name, dt,
                                               1e3 * dt / n_runs),
              flush=True)
    print('done', flush=True)


if __name__ == '__main__':
    main()
