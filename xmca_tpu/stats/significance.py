"""Monte-Carlo significance testing as vmapped, mesh-shardable ensembles.

The reference runs its Monte-Carlo loops one full solve at a time on host
(``rule_n``: xmca/array.py:1753-1765, ``bootstrapping``:
xmca/array.py:1891-1950) — N x (SVD + rotation) in Python.  Here each
surrogate's *entire* pipeline (draw/resample -> center -> complexify ->
Gram-solve -> varimax/promax) is a single jitted function of a PRNG key;
ensembles are ``vmap``-ped over keys in memory-bounded batches and the batch
axis can be sharded across a ``jax.sharding.Mesh`` so surrogates fan out
over chips with zero cross-talk (one final host gather).

Rotation non-convergence is returned as a mask; callers drop those runs,
matching the reference's skip-on-RuntimeError semantics
(xmca/array.py:1759-1763).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from xmca_tpu.core.preprocess import complexify as _complexify
from xmca_tpu.core.solver import solve_svals, solve_rotated_variance
from xmca_tpu.core import fastpath as _fast

__all__ = ['rule_n_spectra', 'rule_north_uncertainty', 'bootstrap_spectra']


def _auto_batch(n_runs, n_obs, n_vars_total, itemsize, target_bytes=2 << 30,
                rotated=False, spectrum='exact', n_dev=1):
    """Pick a surrogate batch size.

    CPU / exact path: memory-bounded vmap batches.  TPU fast rotated
    path: ONE run per device per dispatch — the varimax ``while_loop``
    has a heavy-tailed iteration-count distribution, so wider batches
    pay the max iteration count of their members; single-run dispatches
    pipeline best (measured in benchmarks/RESULTS.md).  With a device
    mesh the same logic gives ``n_dev`` (one run per chip).
    """
    if (rotated and spectrum == 'fast'
            and jax.default_backend() == 'tpu'):
        return max(1, int(n_dev))
    per_run = max(1, n_obs * n_vars_total * itemsize * 8)
    return int(min(n_runs, max(1, target_bytes // per_run)))


# jitted ensemble pipelines, memoized by their full static configuration.
# jax.jit's own cache is keyed on function identity: wrapping a fresh
# closure with jit(vmap(...)) on every rule_n/bootstrapping call would
# re-trace AND re-compile the entire surrogate pipeline each time (~35 s
# at north-star shapes — 25x the cost of the 125 surrogates themselves).
# Bounded FIFO: long-lived processes sweeping many shapes must not pin
# compiled executables (and their closure-captured device Hilbert
# operators) forever.
_ENSEMBLE_FN_CACHE = {}
_CACHE_MAX_ENTRIES = 32


def _cache_put(cache, key, value):
    while len(cache) >= _CACHE_MAX_ENTRIES:
        cache.pop(next(iter(cache)))
    cache[key] = value
    return value


def _cached_ensemble_fn(cache_key, build, in_axes=0, vmapped=True):
    fn = _ENSEMBLE_FN_CACHE.get(cache_key)
    if fn is None:
        inner = build()
        fn = _cache_put(
            _ENSEMBLE_FN_CACHE, cache_key,
            jax.jit(jax.vmap(inner, in_axes=in_axes) if vmapped
                    else inner),
        )
    return fn


def _device_hilbert(n_obs, dtype):
    """Device-resident Hilbert operator (shared library-wide cache)."""
    return _fast.hilbert_imag_matrix_device(n_obs, dtype)


@jax.jit
def _scatter_batch(bufs, start, res):
    return jax.tree_util.tree_map(
        lambda b, r: jax.lax.dynamic_update_slice_in_dim(b, r, start, 0),
        bufs, res,
    )


def _ensemble_map(fn, keys, batch_size, mesh=None, axis='ensemble',
                  progress=None, extra_args=(), pad_to_batch=False):
    """Run a vmapped ensemble ``fn`` over ``keys`` in batches.

    ``fn`` must already be the jitted vmapped pipeline (see
    ``_cached_ensemble_fn``); ``extra_args`` are broadcast (non-batched)
    arguments passed through to every batch.  With a mesh, each batch's
    key array is placed with its leading axis sharded over ``axis`` — XLA
    runs the independent surrogates fully parallel across devices
    (DCN/ICI traffic: only the final gather).  ``progress`` is an optional
    callable receiving the per-batch run count (e.g. ``tqdm.update``).
    ``pad_to_batch`` cyclically pads a short final batch up to the full
    ``batch_size`` (for ``lax.map``-bodied programs whose leading axis is
    baked into the compiled executable) — padded rows re-run earlier
    seeds and are sliced off before scatter.
    """
    # keys are sliced HOST-side: device-slicing them would dispatch one
    # eager remote op per batch, and on a tunneled TPU backend each eager
    # dispatch costs ~10-25 ms — comparable to the surrogate itself.
    # Uploading an (batch, 2) uint32 array per batch is effectively free.
    keys = np.asarray(keys)
    n_runs = keys.shape[0]
    bufs = None
    pos = 0
    n_dev = 1
    if mesh is not None:
        n_dev = mesh.shape[axis]
        sharding = NamedSharding(mesh, P(axis))
    pad_unit = batch_size if pad_to_batch else n_dev
    for start in range(0, n_runs, batch_size):
        kb = keys[start:start + batch_size]
        n_in_batch = kb.shape[0]
        pad = (-kb.shape[0]) % pad_unit
        if pad:
            # tile cyclically: the final batch may hold fewer rows than the
            # padding needs (n_in_batch < pad), so a single concat of
            # kb[:pad] would under-pad and break the sharded device_put
            kb = np.resize(kb, (n_in_batch + pad,) + kb.shape[1:])
        if mesh is not None:
            kb = jax.device_put(kb, sharding)
        else:
            kb = jnp.asarray(kb)
        res = fn(kb, *extra_args)
        if pad:
            res = jax.tree_util.tree_map(lambda r: r[:n_in_batch], res)
        # keep results on device: a per-batch host transfer would block
        # each dispatch on the previous batch's execution and kill the
        # dispatch pipeline (critical for batch=1 TPU ensembles where the
        # host->device roundtrip rivals the surrogate compute).  Each
        # batch writes into a preallocated buffer through ONE jitted
        # updater: a final jnp.concatenate over n_batches operands would
        # compile per ensemble size (~10 s at 125 one-run batches), while
        # dynamic_update_slice traces the batch index as data.  With a
        # mesh the per-batch (sharded) results collapse into the
        # replicated buffer — small (batch, n_modes) leaves.
        if bufs is None:
            bufs = jax.tree_util.tree_map(
                lambda r: jnp.zeros((n_runs,) + r.shape[1:], r.dtype),
                res,
            )
        bufs = _scatter_batch(bufs, pos, res)
        pos += n_in_batch
        if progress is not None:
            progress(n_in_batch)
    return jax.tree_util.tree_map(np.asarray, bufs)


def _surrogate_variance(fields, complexify, rotated, n_rot, power, tol,
                        method, spectrum='exact', n_modes_fast=None,
                        subspace_iters=12, fast_key=None, hilbert_H=None,
                        polar_method='ns'):
    """Variance spectrum + total + converged-flag of one surrogate solve.

    ``spectrum='exact'`` runs the dense eigh-based pipeline;
    ``spectrum='fast'`` runs the matmul-only chol/subspace pipeline
    (xmca_tpu.core.fastpath) — the TPU ensemble path.  The returned total
    is the full-spectrum sum used for Rule-N rescaling (via the
    Newton-Schulz nuclear norm in fast mode, so rescaling stays exact even
    though only the leading modes are materialized).
    """
    # center; bfloat16 surrogates accumulate the mean in float32 (a bf16
    # accumulation over thousands of steps loses the mean entirely)
    fields = [
        f - jnp.mean(f, axis=0, dtype=jnp.float32).astype(f.dtype)
        if f.dtype == jnp.bfloat16 else f - jnp.mean(f, axis=0)
        for f in fields
    ]
    bivariate = len(fields) == 2
    if (spectrum == 'fast' and complexify and hilbert_H is not None
            and not jnp.iscomplexobj(fields[0])):
        # analytic-in-the-Gram path: the complex field is never built;
        # one real MXU Gram per field (xmca_tpu.core.fastpath)
        Xl = fields[0]
        Xr = fields[1] if bivariate else None
        if rotated:
            var, conv = _fast.fast_rotated_variance_analytic(
                Xl, Xr, hilbert_H, fast_key, n_rot=n_rot, power=power,
                tol=tol, n_iter=subspace_iters, bivariate=bivariate,
                polar_method=polar_method,
            )
            return var, jnp.sum(var), conv
        svals, total = _fast.fast_spectrum_analytic(
            Xl, Xr if bivariate else Xl, hilbert_H, fast_key,
            k=n_modes_fast, n_iter=subspace_iters,
        )
        return svals, total, jnp.asarray(True)
    if complexify:
        fields = [_complexify(f) for f in fields]
    Xl = fields[0]
    Xr = fields[1] if bivariate else None
    if rotated:
        if spectrum == 'fast':
            var, conv = _fast.fast_rotated_variance(
                Xl, Xr if bivariate else None, fast_key, n_rot=n_rot,
                power=power, tol=tol, n_iter=subspace_iters,
                bivariate=bivariate, polar_method=polar_method,
            )
        else:
            var, conv = solve_rotated_variance(
                Xl, Xr, n_rot=n_rot, power=power, tol=tol, method=method,
                bivariate=bivariate,
            )
        # rotated Rule-N rescales by the sum over the n_rot rotated modes
        return var, jnp.sum(var), conv
    if spectrum == 'fast':
        svals, total = _fast.fast_spectrum(
            Xl, Xr if bivariate else Xl, fast_key, k=n_modes_fast,
            n_iter=subspace_iters,
        )
        return svals, total, jnp.asarray(True)
    svals = solve_svals(Xl, Xr, method=method)
    return svals, jnp.sum(svals), jnp.asarray(True)


def rule_n_spectra(n_obs, n_vars, n_runs, *, complexify=False, rotated=False,
                   n_rot=0, power=1, tol=1e-8, dtype=np.float64,
                   method='gram', seed=None, batch_size=None, mesh=None,
                   ensemble_axis='ensemble', spectrum='exact',
                   n_modes_fast=None, subspace_iters=12,
                   surrogate_source='draw', surrogate_dist='normal16',
                   polar_method='ns', progress=None,
                   runs_per_dispatch=None):
    """Rule-N surrogate variance spectra (Overland & Preisendorfer 1982).

    TPU-native replacement for the reference's host loop
    (xmca/array.py:1753-1765): surrogates with the *original* (unpacked)
    variable counts are solved (and rotated) as a device ensemble.

    ``surrogate_source='draw'`` draws threefry Gaussian noise fields
    with jax.random and runs them through the standard pipeline in
    vmapped batches.  ``surrogate_source='generated'`` (the TPU
    production path) draws them as moment-matched bit transforms of
    the hardware-backed 'rbg' generator
    (``xmca_tpu.ops.surrogate.bits_field``) with distribution
    ``surrogate_dist`` ('normal16'/'normal32' popcount-binomial, or 'rademacher')
    — ~5x cheaper than Gaussian draws, which dominate the
    per-surrogate cost at production shapes.

    Returns
    -------
    (spectra, totals) : spectra (n_kept_runs, n_modes) — one variance
        spectrum per run, non-converged rotations dropped (reference
        ``continue``); totals (n_kept_runs,) — per-run full-spectrum sums
        for the Rule-N rescaling.
    """
    if seed is None:
        seed = int(np.random.randint(0, 2 ** 31 - 1))
    n_vars = tuple(int(p) for p in n_vars)
    dtype = np.dtype(dtype)

    if surrogate_source == 'generated':
        if spectrum != 'fast':
            raise ValueError(
                "surrogate_source='generated' requires "
                "spectrum='fast' (set_solver(spectrum='fast'))"
            )
        return _rule_n_generated(
            n_obs, n_vars, n_runs, complexify=complexify,
            rotated=rotated, n_rot=n_rot, power=power, tol=tol,
            seed=seed, n_modes_fast=n_modes_fast,
            subspace_iters=subspace_iters, dist=surrogate_dist,
            polar_method=polar_method,
            batch_size=batch_size, mesh=mesh,
            ensemble_axis=ensemble_axis, progress=progress,
            runs_per_dispatch=runs_per_dispatch,
        )

    if batch_size is None:
        batch_size = _auto_batch(
            n_runs, n_obs, sum(n_vars), dtype.itemsize * (2 if complexify
                                                          else 1),
            rotated=rotated, spectrum=spectrum,
            n_dev=mesh.shape[ensemble_axis] if mesh is not None else 1,
        )

    hilbert_H = None
    if spectrum == 'fast' and complexify:
        # the Hilbert operator stays float32 for bfloat16 draws: H feeds
        # the n x n Gram algebra, which always runs in f32
        h_dtype = np.float32 if dtype == jnp.bfloat16 else dtype
        hilbert_H = _device_hilbert(n_obs, h_dtype)

    cache_key = ('rule_n', n_obs, n_vars, complexify, rotated, n_rot,
                 power, float(tol), method, spectrum, n_modes_fast,
                 subspace_iters, dtype.str, polar_method)

    def build():
        def one_run(key):
            ks = jax.random.split(key, len(n_vars) + 1)
            fields = [
                jax.random.normal(ks[i], (n_obs, p), dtype=dtype)
                for i, p in enumerate(n_vars)
            ]
            return _surrogate_variance(
                fields, complexify, rotated, n_rot, power, tol, method,
                spectrum=spectrum, n_modes_fast=n_modes_fast,
                subspace_iters=subspace_iters, fast_key=ks[-1],
                hilbert_H=hilbert_H, polar_method=polar_method,
            )
        return one_run

    fn = _cached_ensemble_fn(cache_key, build)
    keys = jax.random.split(jax.random.PRNGKey(seed), n_runs)
    spectra, totals, converged = _ensemble_map(
        fn, keys, batch_size, mesh=mesh, axis=ensemble_axis,
        progress=progress,
    )
    keep = np.asarray(converged)
    return spectra[keep], totals[keep]


def _rule_n_generated(n_obs, n_vars, n_runs, *, complexify, rotated,
                      n_rot, power, tol, seed, n_modes_fast,
                      subspace_iters, dist, polar_method='ns',
                      batch_size=None, mesh=None,
                      ensemble_axis='ensemble', progress=None,
                      runs_per_dispatch=None):
    """The single-device TPU Rule-N production pipeline.

    The standard fused per-surrogate solve, with the Gaussian draws
    replaced by cheap bit-transform draws
    (``xmca_tpu.ops.surrogate.bits_field`` — ~5x cheaper; the draws
    dominate the drawn pipeline's cost at production shapes).

    Structure notes, both measured on a v5e chip at (2000, 2 x 100k):

    * one fused program per run, dispatched ``batch_size=1`` — batching
      runs couples their varimax ``while_loop`` tails (every lane
      iterates until the slowest converges) and loses ~20%;
    * the per-run program is built as ``jit(vmap(one_run))`` over a
      single-element batch: XLA's batched lowering of the rotation
      fixed point compiles to a ~2x faster loop body than the unbatched
      lowering of the very same function (55 -> 104 ms/run without it).
    """
    from xmca_tpu.ops.surrogate import bits_field

    hilbert_H = _device_hilbert(n_obs, np.float32) if complexify \
        else None
    base = (int(seed) * 2654435761) % (2 ** 32)
    seeds = (np.uint32(base)
             + np.arange(n_runs, dtype=np.uint32)).astype(np.int32)

    cache_key = ('rule_n_gen', n_obs, n_vars, complexify, rotated,
                 n_rot, power, float(tol), n_modes_fast,
                 subspace_iters, dist, polar_method)

    def build():
        def one_run(seed_row):
            s = seed_row[0]
            k = jax.random.PRNGKey(s.astype(jnp.uint32))
            if dist in ('rademacher8', 'rademacher1'):
                # +-1 draws: on TPU the data-sized Gram runs as the
                # Pallas triangle syrk (lower-triangle blocks only —
                # XLA cannot exploit the output's symmetry, and its
                # int8 dot has no s8 fast path on this backend);
                # elsewhere the int8 MXU-mode pipeline.  'rademacher1'
                # spends one random BIT per element.
                from xmca_tpu.core import fastpath as _fast
                if jax.default_backend() == 'tpu':
                    # grade='fast': single-pass bf16 n x n algebra +
                    # matched jitter — q95 shift measured 1.2e-3,
                    # ~70x below Monte-Carlo noise (grade docstring)
                    return _fast.fast_surrogate_variance_tri(
                        s, k, n_obs, n_vars, H=hilbert_H,
                        complexify=complexify, rotated=rotated,
                        n_rot=n_rot if rotated else n_modes_fast,
                        power=power, tol=tol, n_iter=subspace_iters,
                        polar_method=polar_method, dist=dist,
                        grade='fast',
                    )
                return _fast.fast_surrogate_variance_int8(
                    s, k, n_obs, n_vars, H=hilbert_H,
                    complexify=complexify, rotated=rotated,
                    n_rot=n_rot if rotated else n_modes_fast,
                    power=power, tol=tol, n_iter=subspace_iters,
                    polar_method=polar_method, dist=dist,
                )
            fields = [
                bits_field(s * 2 + i, (n_obs, p), dist=dist)
                for i, p in enumerate(n_vars)
            ]
            return _surrogate_variance(
                fields, complexify, rotated, n_rot, power, tol,
                'gram', spectrum='fast', n_modes_fast=n_modes_fast,
                subspace_iters=subspace_iters, fast_key=k,
                hilbert_H=hilbert_H, polar_method=polar_method,
            )
        return one_run

    if runs_per_dispatch is not None and int(runs_per_dispatch) > 1 \
            and mesh is None:
        # one fused device program covering k sequential runs
        # (lax.map over the seed axis, each step the same
        # vmap-over-one-lane body as the dispatched path).  The
        # dispatched path is HOST-bound on tunneled backends: the
        # enqueue alone costs ~18 ms/dispatch (a trivial jitted op
        # pipelines at the same rate as the full surrogate), so the
        # chip idles between runs.  Mapping k runs into one program
        # pays one enqueue per k runs; the runs stay sequential
        # in-device, so the heavy-tailed varimax while_loop tails
        # never couple (unlike vmap batching, which pays every
        # lane's max iteration count).
        k = int(runs_per_dispatch)

        def build_mapped():
            one_run = build()

            def mapped(seed_rows):                       # (k, 1) int32
                res = jax.lax.map(
                    lambda r: jax.vmap(one_run)(r[None]), seed_rows)
                return jax.tree_util.tree_map(
                    lambda x: jnp.reshape(
                        x, (x.shape[0],) + x.shape[2:]),
                    res,
                )
            return mapped

        fn = _cached_ensemble_fn(cache_key + ('map', k), build_mapped,
                                 vmapped=False)
        spectra, totals, converged = _ensemble_map(
            fn, seeds[:, None], k, progress=progress,
            pad_to_batch=True,
        )
        keep = np.asarray(converged)
        return spectra[keep], totals[keep]

    fn = _cached_ensemble_fn(cache_key, build)
    if batch_size is None:
        # one run per device per dispatch (see _auto_batch rationale)
        n_dev = mesh.shape[ensemble_axis] if mesh is not None else 1
        batch_size = max(1, n_dev)
    spectra, totals, converged = _ensemble_map(
        fn, seeds[:, None], batch_size, mesh=mesh,
        axis=ensemble_axis, progress=progress,
    )
    keep = np.asarray(converged)
    return spectra[keep], totals[keep]


def rule_north_uncertainty(singular_values, n_obs, is_complex=False):
    """North's rule-of-thumb uncertainties (reference xmca/array.py:1800-1811).

    ``err = s * sqrt(2 / n_obs)``, doubled variance (x sqrt(2)) for complex
    solutions per Horel 1984.
    """
    err = np.asarray(singular_values) * np.sqrt(2.0 / n_obs)
    if is_complex:
        err = err * np.sqrt(2)
    return err


def _block_indices(key, n_total, block_size, replace):
    """Device-side moving-block bootstrap row indices."""
    n_blocks = n_total // block_size
    if replace:
        blocks = jax.random.randint(key, (n_blocks,), 0, n_blocks)
    else:
        blocks = jax.random.permutation(key, n_blocks)
    return (blocks[:, None] * block_size
            + jnp.arange(block_size)[None, :]).reshape(-1)


def bootstrap_spectra(fields, n_runs, n_out_modes, *, axis=0, on_left=True,
                      on_right=False, block_size=1, replace=True,
                      complexify=False, extend=False, period=1,
                      rotated=False, n_rot=0, power=1, tol=1e-8,
                      method='gram', seed=None, batch_size=None, mesh=None,
                      ensemble_axis='ensemble', spectrum='exact',
                      subspace_iters=12, progress=None):
    """One round of (moving-block) bootstrap surrogate spectra.

    Vectorized equivalent of the reference's inner run loop
    (xmca/array.py:1902-1947): resample -> re-center -> solve(+rotate) ->
    variance, vmapped over runs.

    Deviations from the reference (deliberate, documented):
    * each run resamples the *original* input — the reference resamples its
      own previous resample in place (xmca/array.py:1905-1928), making runs
      statistically dependent; independent draws implement the documented
      intent.

    Returns (spectra (n_runs, n_out_modes), converged (n_runs,) bool); rows
    of non-converged runs contain unrotated garbage and must be masked by
    the caller (the reference skips them).
    """
    if axis not in (0, 1):
        raise ValueError('{:} not a valid axis. either 0 or 1.'.format(axis))
    if seed is None:
        seed = int(np.random.randint(0, 2 ** 31 - 1))

    fields = [jnp.asarray(f) for f in fields]
    bivariate = len(fields) == 2
    if on_right and not bivariate:
        raise ValueError(
            'No bootstrapping possible. There is no right field. '
            'Set `on_right=False`.'
        )

    # divisibility check of the resampled axis (reference raises from the
    # reshape in tools/array.py:126-130)
    def _check(length):
        if length % block_size != 0:
            raise ValueError(
                'Length of data array ({:}) must be a multiple of block '
                'size {:}'.format(length, block_size)
            )

    if on_left or on_right:
        if axis == 0:
            _check(fields[0].shape[0])
        elif on_left and on_right:
            _check(sum(f.shape[1] for f in fields))
        else:
            _check(fields[0].shape[1] if on_left else fields[1].shape[1])

    n_obs = int(fields[0].shape[0])
    dtype = np.dtype(fields[0].dtype)
    if batch_size is None:
        batch_size = _auto_batch(
            n_runs, n_obs, sum(int(f.shape[1]) for f in fields),
            dtype.itemsize * (2 if complexify else 1),
            rotated=rotated, spectrum=spectrum,
            n_dev=mesh.shape[ensemble_axis] if mesh is not None else 1,
        )

    def resample(key, fs):
        if not (on_left or on_right):
            return fs
        if axis == 0:
            idx_l = _block_indices(key, n_obs, block_size, replace)
            if on_left and on_right:
                # same draw applied jointly (reference concatenates columns
                # and resamples rows of the combined matrix)
                return [f[idx_l] for f in fs]
            if on_left:
                return [fs[0][idx_l]] + fs[1:]
            return [fs[0], fs[1][idx_l]]
        # axis == 1: resample space columns
        if on_left and on_right:
            concat = jnp.concatenate(fs, axis=1)
            idx = _block_indices(key, concat.shape[1], block_size, replace)
            mixed = concat[:, idx]
            w = fs[0].shape[1]
            return [mixed[:, :w], mixed[:, w:]]
        if on_left:
            idx = _block_indices(key, fs[0].shape[1], block_size, replace)
            return [fs[0][:, idx]] + fs[1:]
        idx = _block_indices(key, fs[1].shape[1], block_size, replace)
        return [fs[0], fs[1][:, idx]]

    hilbert_H = None
    if spectrum == 'fast' and complexify and not extend:
        hilbert_H = _device_hilbert(n_obs, dtype)

    # the data enters as a broadcast argument (NOT a closure capture) so
    # the compiled pipeline is reused across bootstrap modes ('iterative'
    # re-invokes with new residual fields every mode) and across calls
    cache_key = ('bootstrap',
                 tuple((f.shape, np.dtype(f.dtype).str) for f in fields),
                 axis, on_left, on_right, block_size, replace,
                 complexify, extend, period, rotated, n_rot, power,
                 float(tol), method, spectrum, n_out_modes,
                 subspace_iters, 'ns-gated')

    def build():
        def one_run(key, fields_in):
            key, fast_key = jax.random.split(key)
            fs = resample(key, list(fields_in))
            kwargs = dict(
                spectrum=spectrum, n_modes_fast=n_out_modes,
                subspace_iters=subspace_iters, fast_key=fast_key,
                hilbert_H=hilbert_H,
                # bootstrap rotates REAL data: a large mode-variance
                # spread needs the convergence-gated polar (noise
                # surrogates in rule_n keep the faster fixed count)
                polar_method='ns-gated',
            )
            if complexify and extend:
                fs = [f - jnp.mean(f, axis=0) for f in fs]
                fs = [_complexify(f, extend=extend, period=period)
                      for f in fs]
                var, _, conv = _surrogate_variance(
                    fs, False, rotated, n_rot, power, tol, method, **kwargs
                )
            else:
                var, _, conv = _surrogate_variance(
                    fs, complexify, rotated, n_rot, power, tol, method,
                    **kwargs
                )
            return var[:n_out_modes], conv
        return one_run

    fn = _cached_ensemble_fn(cache_key, build, in_axes=(0, None))
    keys = jax.random.split(jax.random.PRNGKey(seed), n_runs)
    spectra, converged = _ensemble_map(
        fn, keys, batch_size, mesh=mesh, axis=ensemble_axis,
        progress=progress, extra_args=(tuple(fields),),
    )
    return spectra, np.asarray(converged)
