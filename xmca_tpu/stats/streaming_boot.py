"""Bootstrapping for chunk-backed (out-of-core) models.

The reference bootstrap (xmca/array.py:1813-1952) resamples the full
data matrix and re-solves — impossible when the data does not fit in
memory.  Here the resampling happens in *Gram space*:

**Time axis (axis=0).**  For row-selection ``P`` (the moving-block
draw), the resampled-and-recentered field is ``A = C P Xc``, and its
temporal Gram is pure index algebra on the Gram stored by the streamed
solve::

    A A^T = C (G[idx, :][:, idx]) C          (no data pass at all)

Since ``svals(A^T B) = svals(chol(A A^T)^H chol(B B^T))`` holds for ANY
two matrices sharing the row (time) axis (xmca_tpu.core.fastpath key
identity), the whole unrotated surrogate spectrum needs nothing but the
two stored ``(n, n)`` Grams — every run is a gather + n x n algebra,
vmapped on device.  Rotated runs additionally need the surrogate's
spatial loadings; those come from ONE streamed projection pass per run
batch via the scatter identity ``V = A^T Z = Xc^T (P^T C Z)`` — the
original chunks are projected against per-run weight stacks, never
resampled themselves.

**Space axis (axis=1).**  Column resampling with multiplicities
``c_r`` gives ``G_r = Xd diag(c_r) Xd^T``, accumulated for a whole run
batch in one pass over the chunks; surrogate loadings are row-gathers
of one pooled projection ``V_pool = Xd^T (C Z_r)``.

**Iterative (Winkler) deflation** stays in mode space: with the
rank-k reconstruction ``Rec = real(S W^H)`` (both factors assembled
from the solve-time score accumulators + resident basis),

    G_defl = G - B - B^T + S_st (W_st^T W_st) S_st^T,
    B = (Xc W)_st S_st^T,

where ``_st`` stacks real and imaginary parts side by side and
``Xc W`` is the mode-mixed pre-Hilbert score accumulator — all n x n /
(n, 2k) algebra, no data pass.

Run-for-run parity with the resident ``bootstrap_spectra`` (same seed
=> same block draws) is pinned in tests/integration/test_streaming_api.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from xmca_tpu.core import fastpath as _fast
from xmca_tpu.core.streaming import (_put_chunk, _transform_chunk,
                                     _weight_slice)
from xmca_tpu.stats.significance import (_block_indices,
                                         _cached_ensemble_fn,
                                         _ensemble_map)

_HI = jax.lax.Precision.HIGHEST


# --------------------------------------------------------------- helpers
def _reim_stack(X):
    """Real (..., 2k) stack of a (possibly complex) (..., k) array."""
    return jnp.concatenate([jnp.real(X), jnp.imag(X)], axis=-1)


def _combine_stack(P):
    """Inverse of `_reim_stack`."""
    k = P.shape[-1] // 2
    return P[..., :k] + 1j * P[..., k:]


@jax.jit
def deflated_gram(G, XcW, S, W):
    """Mode-space deflation of a stored temporal Gram.

    ``G``: (n, n) real centered Gram of the transformed data.
    ``XcW``: (n, k) mode-mixed pre-Hilbert scores (``Xc W`` — the
    loadings kernel applied to the raw score accumulator).
    ``S``: (n, k) eigen-scaled rotated PCs, ``W``: (p, k) rotated
    loadings (both possibly complex).  Exact algebra for
    ``(Xc - real(S W^H)) (Xc - real(S W^H))^T``.
    """
    XW = _reim_stack(XcW)
    Ss = _reim_stack(S)
    Ws = _reim_stack(W)
    B = jnp.matmul(XW, Ss.T, precision=_HI)
    C = jnp.matmul(Ws.T, Ws, precision=_HI)
    return G - B - B.T + jnp.matmul(
        jnp.matmul(Ss, C, precision=_HI), Ss.T, precision=_HI
    )


def _center_gram(Gs):
    """``C Gs C`` — the Gram of the re-centered (resampled) data."""
    rm = jnp.mean(Gs, axis=1, keepdims=True)
    cm = jnp.mean(Gs, axis=0, keepdims=True)
    return Gs - rm - cm + jnp.mean(Gs)


def _fold_chol(Gs, p, complexify, H, eps):
    """center -> (fold) -> jitter -> Cholesky of one surrogate Gram."""
    Gs = _center_gram(Gs)
    if complexify:
        Gs = _fast._analytic_fold(Gs, H).astype(
            _fast._complex_dtype(Gs.dtype)
        )
    return jnp.linalg.cholesky(
        _fast._jitter(Gs, p, 1e-6, input_eps=eps)
    )


def _z_stack(L_chol, T_side, complexify, H):
    """Real recovery-weight stack for one side: ``Z = La^-H U`` (the
    triangular solve), folded to the analytic stack when complex."""
    T = jax.scipy.linalg.solve_triangular(
        L_chol.conj().T, T_side, lower=False
    )
    if complexify:
        return _fast.analytic_projection_stack(T, H)
    return jnp.real(T)


# ------------------------------------------------ axis=0: Gram resampling
def _build_axis0_run(*, n_obs, p_l, p_r, kk, n_iter, complexify,
                     bivariate, on_left, on_right, block_size, replace,
                     rotated, eps, H):
    """One axis=0 surrogate in Gram space (vmapped by the caller).

    Key splitting mirrors the resident ``bootstrap_spectra`` one_run
    exactly, so the same seed produces the same block draws.
    """
    dof = n_obs - 1

    def one_run(key, Gl, Gr):
        key, fast_key = jax.random.split(key)
        idx = _block_indices(key, n_obs, block_size, replace)

        def side(G, resample, p):
            Gs = jnp.take(jnp.take(G, idx, axis=0), idx, axis=1) \
                if resample else G
            return _fold_chol(Gs, p, complexify, H, eps)

        La = side(Gl, on_left, p_l)
        Lb = La if not bivariate else side(Gr, on_right, p_r)
        M = jnp.matmul(La.conj().T, Lb, precision=_HI) / dof
        U, s, V = _fast.subspace_svd(M, fast_key, k=kk, n_iter=n_iter)
        if not rotated:
            return (s,)

        def weights(L_chol, T_side, resample):
            Z = _z_stack(L_chol, T_side, complexify, H)
            CZ = Z - jnp.mean(Z, axis=0)
            if resample:
                # V = A^T Z = Xc^T (P^T C Z): duplicate draws scatter-add
                return jnp.zeros_like(CZ).at[idx].add(CZ)
            return CZ

        Yl = weights(La, U, on_left)
        Yr = Yl if not bivariate else weights(Lb, V, on_right)
        return s, Yl, Yr

    return one_run


# --------------------------------------------- axis=1: counts resampling
def _build_axis1_draw(*, pool_w, w_left, block_size, replace, p_full,
                      kept_pos, both):
    """Per-run column draw: pool indices + full-width counts per field.

    ``pool_w``: resampled pool width (kept columns; both fields'
    concatenation when resampling jointly).  ``kept_pos``: device map
    pool position -> full-width position (concatenated full widths when
    joint).  Returns (idx, counts_full) — counts indexed by the FULL
    column layout the chunk passes stream through.
    """
    def draw(key):
        key, fast_key = jax.random.split(key)
        idx = _block_indices(key, pool_w, block_size, replace)
        if both:
            idx_l, idx_r = idx[:w_left], idx[w_left:]
        else:
            idx_l, idx_r = idx, idx
        def counts(ii):
            c = jnp.zeros((pool_w,), jnp.float32).at[ii].add(1.0)
            return jnp.zeros((p_full,), jnp.float32).at[kept_pos].set(c)
        return idx, counts(idx_l), (counts(idx_r) if both else
                                    jnp.zeros((0,), jnp.float32)), \
            fast_key
    return draw


@partial(jax.jit, static_argnames=('normalize', 'has_w', 'deflate'))
def _counts_gram_chunk(Gb, chunk, w, counts_full, off, S_st, Wf_st, *,
                       normalize, has_w, deflate):
    """Accumulate one chunk into a batch of counts-weighted Grams.

    ``Gb``: (R, n, n) accumulator; ``counts_full``: (R, p_full) per-run
    column multiplicities; ``off``: this chunk's column offset (traced).
    With ``deflate``, the chunk is deflated on the fly:
    ``cd = cc - S_st W_rows^T`` (real stacks).
    """
    cc, _, _, _ = _transform_chunk(chunk, w, normalize=normalize,
                                   has_w=has_w)
    wch = cc.shape[1]
    if deflate:
        W_rows = jax.lax.dynamic_slice_in_dim(Wf_st, off, wch, axis=0)
        cc = cc - jnp.matmul(S_st, W_rows.T, precision=_HI)
    c = jax.lax.dynamic_slice_in_dim(counts_full, off, wch, axis=1)
    sc = cc[None, :, :] * jnp.sqrt(c)[:, None, :]      # (R, n, w)
    return Gb + jax.lax.dot_general(
        sc, sc, (((2,), (2,)), ((0,), (0,))),
        precision=_HI,
    )


# ------------------------------------------------- shared projection pass
@partial(jax.jit, static_argnames=('normalize', 'has_w', 'deflate'))
def _project_cat_chunk(chunk, w, Ycat, off, S_st, Wf_st, corr, *,
                       normalize, has_w, deflate):
    """One chunk of the loadings pass: ``(w, cols) = Xd_chunk^T Ycat``.

    Deflation is applied through the correction term
    ``Rec^T Y = W_rows (S_st^T Y)`` — ``corr = S_st^T Ycat`` is
    precomputed once per batch (2k x cols), so the chunk pays one extra
    thin matmul instead of materializing deflated data.
    """
    cc, _, _, _ = _transform_chunk(chunk, w, normalize=normalize,
                                   has_w=has_w)
    P = jnp.matmul(cc.T, Ycat, precision=_HI)
    if deflate:
        W_rows = jax.lax.dynamic_slice_in_dim(
            Wf_st, off, cc.shape[1], axis=0
        )
        P = P - jnp.matmul(W_rows, corr, precision=_HI)
    return P


def _stream_projection(loader, Ycat, *, weights, normalize, dtype,
                       mesh, S_st, Wf_st, deflate):
    """Project every chunk of one field against ``Ycat`` and return the
    device (p_padded_total, cols) stack + the unpadded row selector."""
    corr = (jnp.matmul(S_st.T, Ycat, precision=_HI) if deflate
            else jnp.zeros((0, 0), dtype))
    parts, sel, off, dev_off = [], [], 0, 0
    for chunk in loader():
        chunk, wp, wt = _put_chunk(chunk, dtype, mesh)
        w, has_w = _weight_slice(weights, off, wt, wp, dtype)
        P = _project_cat_chunk(
            chunk, w, Ycat, off, S_st, Wf_st, corr,
            normalize=normalize, has_w=has_w, deflate=deflate,
        )
        parts.append(P)
        sel.append(np.arange(dev_off, dev_off + wt))
        off += wt
        dev_off += wp
    return jnp.concatenate(parts, axis=0), np.concatenate(sel)


def _scatter_full(W_st, kept_pos, p_full):
    """Scatter a kept-width real stack to full column width (device)."""
    out = jnp.zeros((p_full, W_st.shape[1]), W_st.dtype)
    return out.at[jnp.asarray(kept_pos)].set(W_st)


# ------------------------------------------------------------ entry point
def bootstrap_spectra_streamed(
        loaders, keeps, grams, n_obs, n_runs, n_out_modes, *,
        weights=None, normalize=False, axis=0, on_left=True,
        on_right=False, block_size=1, replace=True, complexify=False,
        rotated=False, n_rot=0, power=1, tol=1e-8, seed=None,
        batch_size=None, subspace_iters=12, dtype=np.float32,
        deflate=None, mesh=None, progress=None):
    """One round of bootstrap surrogate spectra for a streamed model.

    Parameters mirror :func:`xmca_tpu.stats.significance.
    bootstrap_spectra` with the data replaced by the streamed-solve
    working set: ``loaders`` (chunk loader per field), ``keeps``
    (full-width kept-column masks), ``grams`` (device real centered
    Grams of the transformed data — ALREADY deflated when
    ``deflate`` is given), and ``deflate`` = per-field
    ``(S, W, XcW)`` device factors of the subtracted reconstruction
    (None for the standard strategy / mode 0).

    axis=0 runs entirely in Gram space (no data pass; rotated runs add
    one streamed projection pass per run batch).  axis=1 accumulates
    counts-weighted Grams in one pass per run batch (+ one projection
    pass when rotated).

    Returns ``(spectra (n_runs, n_out_modes), converged (n_runs,))``.
    """
    if axis not in (0, 1):
        raise ValueError(
            '{:} not a valid axis. either 0 or 1.'.format(axis)
        )
    if seed is None:
        seed = int(np.random.randint(0, 2 ** 31 - 1))
    keys = list(loaders.keys())
    bivariate = len(keys) == 2
    if on_right and not bivariate:
        raise ValueError(
            'No bootstrapping possible. There is no right field. '
            'Set `on_right=False`.'
        )
    weights = weights or {}
    dtype = np.dtype(dtype)
    eps = float(np.finfo(dtype).eps)
    kept_w = {k: int(np.sum(keeps[k])) for k in keys}
    p_l = kept_w['left']
    p_r = kept_w['right'] if bivariate else p_l

    # divisibility contract (the reference raises from its reshape)
    def _check(length):
        if length % block_size != 0:
            raise ValueError(
                'Length of data array ({:}) must be a multiple of '
                'block size {:}'.format(length, block_size)
            )
    if on_left or on_right:
        if axis == 0:
            _check(n_obs)
        elif on_left and on_right:
            _check(p_l + p_r)
        else:
            _check(p_l if on_left else p_r)

    H = _fast.hilbert_imag_matrix_device(n_obs, dtype) if complexify \
        else None
    kk = n_rot if rotated else n_out_modes
    Gl = grams['left']
    Gr = grams['right'] if bivariate else Gl
    run_keys = jax.random.split(jax.random.PRNGKey(seed), n_runs)

    if axis == 0 or not (on_left or on_right):
        # no-resample requests run the (no-op gather) Gram path
        return _bootstrap_axis0(
            loaders, keeps, Gl, Gr, run_keys, n_obs, n_out_modes,
            weights=weights, normalize=normalize, on_left=on_left,
            on_right=on_right, block_size=block_size, replace=replace,
            complexify=complexify, rotated=rotated, kk=kk, power=power,
            tol=tol, batch_size=batch_size, n_iter=subspace_iters,
            dtype=dtype, eps=eps, deflate=deflate, mesh=mesh,
            progress=progress, bivariate=bivariate, p_l=p_l, p_r=p_r,
            H=H,
        )
    return _bootstrap_axis1(
        loaders, keeps, Gl, Gr, run_keys, n_obs, n_out_modes,
        weights=weights, normalize=normalize, on_left=on_left,
        on_right=on_right, block_size=block_size, replace=replace,
        complexify=complexify, rotated=rotated, kk=kk, power=power,
        tol=tol, batch_size=batch_size, n_iter=subspace_iters,
        dtype=dtype, eps=eps, deflate=deflate, mesh=mesh,
        progress=progress, bivariate=bivariate, p_l=p_l, p_r=p_r, H=H,
    )


def _rotate_batch_fn(cache_key, *, complexify, p_l, p_r, power, tol,
                     bivariate, kk):
    """Batched stage-B rotation of per-run loading stacks."""
    def build():
        def one(s, Vl, Vr):
            if complexify:
                Vl = _combine_stack(Vl)
                Vr = _combine_stack(Vr)
            sqrt_s = jnp.sqrt(s).astype(Vl.dtype)
            L = (jnp.concatenate([Vl, Vr], axis=0) * sqrt_s[None, :]
                 if bivariate else Vl * sqrt_s[None, :])
            return _fast.rotated_variance_from_loadings(
                L, p_l, power=power, tol=tol, bivariate=bivariate,
                polar_method='ns-gated',
            )
        return one
    return _cached_ensemble_fn(cache_key, build, in_axes=(0, 0, 0))


def _bootstrap_axis0(loaders, keeps, Gl, Gr, run_keys, n_obs,
                     n_out_modes, *, weights, normalize, on_left,
                     on_right, block_size, replace, complexify, rotated,
                     kk, power, tol, batch_size, n_iter, dtype, eps,
                     deflate, mesh, progress, bivariate, p_l, p_r, H):
    cache_key = ('boot0', n_obs, p_l, p_r, kk, n_iter, complexify,
                 bivariate, on_left, on_right, block_size, replace,
                 rotated, str(dtype))

    def build():
        return _build_axis0_run(
            n_obs=n_obs, p_l=p_l, p_r=p_r, kk=kk, n_iter=n_iter,
            complexify=complexify, bivariate=bivariate,
            on_left=on_left, on_right=on_right, block_size=block_size,
            replace=replace, rotated=rotated, eps=eps, H=H,
        )

    fn = _cached_ensemble_fn(cache_key, build, in_axes=(0, None, None))
    n_runs = run_keys.shape[0]

    if not rotated:
        if batch_size is None:
            batch_size = n_runs       # n x n work only — one dispatch
        (spectra,) = _ensemble_map(
            fn, run_keys, batch_size, mesh=mesh, progress=progress,
            extra_args=(Gl, Gr),
        )
        return (spectra[:, :n_out_modes],
                np.isfinite(spectra[:, :n_out_modes]).all(axis=1))

    # rotated: per batch, stage 1 on device, then ONE projection pass
    if batch_size is None:
        batch_size = min(n_runs, 16)
    kz = 2 * kk if complexify else kk
    spectra = np.zeros((n_runs, n_out_modes))
    converged = np.zeros(n_runs, bool)
    defl = deflate or {}
    S_st, Wf_st = _deflation_stacks(defl, keeps, dtype, mesh=mesh)
    for start in range(0, n_runs, batch_size):
        kb = run_keys[start:start + batch_size]
        nb = kb.shape[0]
        s_b, Yl_b, Yr_b = fn(jnp.asarray(kb), Gl, Gr)
        var_b, conv_b = _project_and_rotate(
            loaders, keeps, s_b, {'left': Yl_b, 'right': Yr_b},
            weights=weights, normalize=normalize, dtype=dtype,
            mesh=mesh, complexify=complexify, power=power, tol=tol,
            bivariate=bivariate, p_l=p_l, p_r=p_r, kk=kk, kz=kz,
            S_st=S_st, Wf_st=Wf_st, deflate=bool(defl),
            gather_idx=None,
        )
        spectra[start:start + nb] = var_b[:, :n_out_modes]
        converged[start:start + nb] = conv_b
        if progress is not None:
            progress(nb)
    return spectra, converged


def _deflation_stacks(defl, keeps, dtype, mesh=None):
    """Per-field real stacks (S_st (n, 2k), W full-width stack) of the
    deflation factors; zero-size placeholders when not deflating.

    The full-width stack carries ``n_shards - 1`` extra zero rows so
    the per-chunk ``dynamic_slice`` stays in bounds when a space mesh
    pads chunk columns (pad columns are zero either way)."""
    from xmca_tpu.core.streaming import _space_shards
    pad = _space_shards(mesh) - 1
    S_st, Wf_st = {}, {}
    for k in keeps:
        if k in defl:
            S, W, _ = defl[k]
            S_st[k] = _reim_stack(S).astype(dtype)
            kept_pos = np.nonzero(np.asarray(keeps[k]))[0]
            Wf_st[k] = _scatter_full(
                _reim_stack(W).astype(dtype), kept_pos,
                int(keeps[k].shape[0]) + pad,
            )
        else:
            S_st[k] = jnp.zeros((0, 0), dtype)
            Wf_st[k] = jnp.zeros((0, 0), dtype)
    return S_st, Wf_st


def _project_and_rotate(loaders, keeps, s_b, Y_b, *, weights, normalize,
                        dtype, mesh, complexify, power, tol, bivariate,
                        p_l, p_r, kk, kz, S_st, Wf_st, deflate,
                        gather_idx):
    """Shared rotated tail: stream the per-run weight stacks through the
    chunks, slice per-run loadings, rotate, return (variance, conv).

    ``Y_b[field]``: (R, n, kz) per-run projection weights.  With
    ``gather_idx`` (axis=1), loadings are row-gathers of the pooled
    projection instead of per-field column blocks.
    """
    keys = list(loaders.keys())
    nb = int(np.asarray(s_b.shape[0]))

    V = {}
    for k in keys:
        # (n, R*kz) column-concatenated weight stack, one pass per field
        Ycat = jnp.transpose(Y_b[k], (1, 0, 2)).reshape(
            Y_b[k].shape[1], nb * kz
        )
        P, sel = _stream_projection(
            loaders[k], Ycat, weights=weights.get(k),
            normalize=normalize, dtype=dtype, mesh=mesh,
            S_st=S_st[k], Wf_st=Wf_st[k], deflate=deflate,
        )
        # one gather: padded device rows -> kept (non-NaN) columns in
        # the in-memory packed layout
        kept_pos = np.nonzero(np.asarray(keeps[k]))[0]
        P = jnp.take(P, jnp.asarray(sel[kept_pos]), axis=0)
        V[k] = P.reshape(P.shape[0], nb, kz).transpose(1, 0, 2)

    if gather_idx is not None:
        V = gather_idx(V)

    Vl = V['left']
    Vr = V['right'] if bivariate else Vl
    cache_key = ('boot_rot', int(Vl.shape[1]),
                 int(Vr.shape[1]) if bivariate else 0, kk, complexify,
                 power, float(tol), bivariate, str(dtype))
    rot = _rotate_batch_fn(
        cache_key, complexify=complexify, p_l=int(Vl.shape[1]),
        p_r=int(Vr.shape[1]) if bivariate else 0, power=power, tol=tol,
        bivariate=bivariate, kk=kk,
    )
    var, conv = rot(s_b, Vl, Vr)
    return np.asarray(var), np.asarray(conv)


def _counts_gram_pass(sources, counts_full, n_obs, n_runs2, *, weights,
                      normalize, dtype, mesh, S_st, Wf_st, deflate):
    """One pass over the (possibly multi-field) column pool: the batch
    of counts-weighted Grams ``G_r = Xd diag(c_r) Xd^T``.

    ``sources``: list of (field key, loader, base column offset) in
    pool order; ``counts_full``: (R', p_full_concat) multiplicities in
    the pool's FULL (per-field pad-reserved) column layout.  Returns
    (R', n, n) device Grams."""
    Gb = jnp.zeros((n_runs2, n_obs, n_obs), dtype)
    for k, loader, base in sources:
        f_off = 0
        for chunk in loader():
            chunk, wp, wt = _put_chunk(chunk, dtype, mesh)
            w, has_w = _weight_slice(weights.get(k), f_off, wt, wp,
                                     dtype)
            Gb = _counts_gram_chunk(
                Gb, chunk, w, counts_full, base + f_off,
                S_st[k], Wf_st[k],
                normalize=normalize, has_w=has_w, deflate=deflate,
            )
            f_off += wt
    return Gb


def _bootstrap_axis1(loaders, keeps, Gl, Gr, run_keys, n_obs,
                     n_out_modes, *, weights, normalize, on_left,
                     on_right, block_size, replace, complexify, rotated,
                     kk, power, tol, batch_size, n_iter, dtype, eps,
                     deflate, mesh, progress, bivariate, p_l, p_r, H):
    """Space-axis bootstrap of a streamed model.

    Per run batch: (1) vmapped block draws -> pool indices + full-width
    counts; (2) ONE pass over the pool's chunks accumulating every
    run's counts-weighted Gram; (3) vmapped n x n reduction; rotated
    runs add (4) one pooled projection pass and per-run row gathers.
    """
    from xmca_tpu.core.streaming import _space_shards
    keys = list(loaders.keys())
    both = on_left and on_right
    kept_pos = {k: np.nonzero(np.asarray(keeps[k]))[0] for k in keys}
    p_full = {k: int(keeps[k].shape[0]) for k in keys}
    # with a space mesh chunks may pad columns; reserve that pad per
    # field in the full layout so the last chunk's dynamic_slice stays
    # in bounds (pad columns are zero and draw zero counts)
    pad = _space_shards(mesh) - 1

    if both:
        pool_w = p_l + p_r
        pool_kept = np.concatenate(
            [kept_pos['left'], p_full['left'] + pad + kept_pos['right']]
        )
        pool_full = p_full['left'] + p_full['right'] + 2 * pad
        sources = [('left', loaders['left'], 0),
                   ('right', loaders['right'], p_full['left'] + pad)]
    else:
        side = 'left' if on_left else 'right'
        pool_w = p_l if on_left else p_r
        pool_kept = kept_pos[side]
        pool_full = p_full[side] + pad
        sources = [(side, loaders[side], 0)]

    defl = deflate or {}
    S_st, Wf_st = _deflation_stacks(defl, keeps, dtype, mesh=mesh)
    dof = n_obs - 1
    kept_pos_dev = jnp.asarray(pool_kept)

    # the un-resampled side's Cholesky, once (re-centered like resident)
    def _orig_chol(G, p):
        return _fold_chol(G, p, complexify, H, eps)

    draw_key = ('boot1_draw', pool_w, p_l if both else 0, block_size,
                replace, pool_full, both,
                hash(pool_kept.tobytes()))

    def build_draw():
        return _build_axis1_draw(
            pool_w=pool_w, w_left=p_l, block_size=block_size,
            replace=replace, p_full=pool_full, kept_pos=kept_pos_dev,
            both=both,
        )

    draw_fn = _cached_ensemble_fn(draw_key, build_draw)

    reduce_key = ('boot1_reduce', n_obs, kk, n_iter, complexify,
                  bivariate, both, on_left, rotated, str(dtype),
                  p_l, p_r)

    def build_reduce():
        def one(Gs_l, Gs_r, La0, Lb0, fast_key):
            # resampled side(s) from the counts Grams, the other from
            # the original (pre-computed chol, broadcast)
            if both:
                La = _fold_chol(Gs_l, p_l, complexify, H, eps)
                Lb = _fold_chol(Gs_r, p_r, complexify, H, eps) \
                    if bivariate else La
            elif on_left:
                La = _fold_chol(Gs_l, p_l, complexify, H, eps)
                Lb = Lb0 if bivariate else La
            else:
                La = La0
                Lb = _fold_chol(Gs_r, p_r, complexify, H, eps)
            M = jnp.matmul(La.conj().T, Lb, precision=_HI) / dof
            U, s, V = _fast.subspace_svd(M, fast_key, k=kk,
                                         n_iter=n_iter)
            if not rotated:
                return (s,)

            def weights_side(L_chol, T_side):
                Z = _z_stack(L_chol, T_side, complexify, H)
                return Z - jnp.mean(Z, axis=0)   # columns resampled,
                #                                  rows untouched: Y=CZ
            return s, weights_side(La, U), weights_side(Lb, V)
        return one

    reduce_fn = _cached_ensemble_fn(
        reduce_key, build_reduce, in_axes=(0, 0, None, None, 0)
    )

    n_runs = run_keys.shape[0]
    if batch_size is None:
        batch_size = min(n_runs, 16)
    spectra = np.zeros((n_runs, n_out_modes))
    converged = np.zeros(n_runs, bool)
    chol_dtype = _fast._complex_dtype(dtype) if complexify else dtype
    placeholder = jnp.zeros((n_obs, n_obs), chol_dtype)
    La0 = _orig_chol(Gl, p_l) if not on_left else placeholder
    Lb0 = (_orig_chol(Gr, p_r) if (bivariate and not on_right)
           else placeholder)

    for start in range(0, n_runs, batch_size):
        kb = jnp.asarray(run_keys[start:start + batch_size])
        nb = int(kb.shape[0])
        idx_b, cl_b, cr_b, fast_b = draw_fn(kb)
        # counts-weighted Grams: stack both sides' counts into ONE pass
        if both:
            counts = jnp.concatenate([cl_b, cr_b], axis=0)
            Gb = _counts_gram_pass(
                sources, counts, n_obs, 2 * nb, weights=weights,
                normalize=normalize, dtype=dtype, mesh=mesh,
                S_st=S_st, Wf_st=Wf_st, deflate=bool(defl),
            )
            Gs_l, Gs_r = Gb[:nb], Gb[nb:]
        else:
            Gb = _counts_gram_pass(
                sources, cl_b, n_obs, nb, weights=weights,
                normalize=normalize, dtype=dtype, mesh=mesh,
                S_st=S_st, Wf_st=Wf_st, deflate=bool(defl),
            )
            Gs_l = Gs_r = Gb
        out = reduce_fn(Gs_l, Gs_r, La0, Lb0, fast_b)
        if not rotated:
            s_b = np.asarray(out[0])
            spectra[start:start + nb] = s_b[:, :n_out_modes]
            converged[start:start + nb] = np.isfinite(
                s_b[:, :n_out_modes]
            ).all(axis=1)
        else:
            s_b, Yl_b, Yr_b = out
            var_b, conv_b = _axis1_project_rotate(
                loaders, keeps, sources, s_b, Yl_b, Yr_b, idx_b,
                weights=weights, normalize=normalize, dtype=dtype,
                mesh=mesh, complexify=complexify, power=power, tol=tol,
                bivariate=bivariate, on_left=on_left,
                on_right=on_right, both=both, p_l=p_l, p_r=p_r, kk=kk,
                S_st=S_st, Wf_st=Wf_st, deflate=bool(defl),
                pool_kept=pool_kept,
            )
            spectra[start:start + nb] = var_b[:, :n_out_modes]
            converged[start:start + nb] = conv_b
        if progress is not None:
            progress(nb)
    return spectra, converged


def _axis1_project_rotate(loaders, keeps, sources, s_b, Yl_b, Yr_b,
                          idx_b, *, weights, normalize, dtype, mesh,
                          complexify, power, tol, bivariate, on_left,
                          on_right, both, p_l, p_r, kk, S_st, Wf_st,
                          deflate, pool_kept):
    """Rotated tail of the axis=1 bootstrap: pooled projection pass,
    per-run row gathers of the resampled side(s), batched rotation."""
    nb = int(np.asarray(s_b).shape[0])
    kz = 2 * kk if complexify else kk

    def cat(Y_b):
        return jnp.transpose(Y_b, (1, 0, 2)).reshape(
            Y_b.shape[1], nb * kz
        )

    # which weight stacks the pool pass must project against
    if both:
        Ycat = jnp.concatenate([cat(Yl_b), cat(Yr_b)], axis=1)
    else:
        Ycat = cat(Yr_b) if on_right else cat(Yl_b)

    # pooled projection: every source field's chunks against Ycat
    parts = []
    for k, loader, _base in sources:
        P, sel = _stream_projection(
            loader, Ycat, weights=weights.get(k), normalize=normalize,
            dtype=dtype, mesh=mesh, S_st=S_st[k], Wf_st=Wf_st[k],
            deflate=deflate,
        )
        kp = np.nonzero(np.asarray(keeps[k]))[0]
        parts.append(jnp.take(P, jnp.asarray(sel[kp]), axis=0))
    P_pool = jnp.concatenate(parts, axis=0)     # (pool_kept_w, cols)

    def block(P, col0):
        """(R, pool, kz) view of one side's columns."""
        B = jax.lax.dynamic_slice_in_dim(P, col0, nb * kz, axis=1)
        return B.reshape(P.shape[0], nb, kz).transpose(1, 0, 2)

    if both:     # both implies bivariate (checked at entry)
        Pl = block(P_pool, 0)
        Pr = block(P_pool, nb * kz)
        idx_l, idx_r = idx_b[:, :p_l], idx_b[:, p_l:]
        Vl = jax.vmap(lambda P, i: jnp.take(P, i, axis=0))(Pl, idx_l)
        Vr = jax.vmap(lambda P, i: jnp.take(P, i, axis=0))(Pr, idx_r)
    else:
        Ps = block(P_pool, 0)
        Vs = jax.vmap(lambda P, i: jnp.take(P, i, axis=0))(Ps, idx_b)
        if on_left:
            Vl = Vs
            Vr = _unresampled_loadings(
                loaders, keeps, 'right', Yr_b, nb, kz, weights=weights,
                normalize=normalize, dtype=dtype, mesh=mesh,
                S_st=S_st, Wf_st=Wf_st, deflate=deflate,
            ) if bivariate else Vs
        else:
            Vr = Vs
            Vl = _unresampled_loadings(
                loaders, keeps, 'left', Yl_b, nb, kz, weights=weights,
                normalize=normalize, dtype=dtype, mesh=mesh,
                S_st=S_st, Wf_st=Wf_st, deflate=deflate,
            )

    cache_key = ('boot_rot', int(Vl.shape[1]),
                 int(Vr.shape[1]) if bivariate else 0, kk, complexify,
                 power, float(tol), bivariate, str(dtype))
    rot = _rotate_batch_fn(
        cache_key, complexify=complexify, p_l=int(Vl.shape[1]),
        p_r=int(Vr.shape[1]) if bivariate else 0, power=power, tol=tol,
        bivariate=bivariate, kk=kk,
    )
    var, conv = rot(s_b, Vl, Vr)
    return np.asarray(var), np.asarray(conv)


def _unresampled_loadings(loaders, keeps, k, Y_b, nb, kz, *, weights,
                          normalize, dtype, mesh, S_st, Wf_st,
                          deflate):
    """Loadings of a NON-resampled side: plain projection pass."""
    Ycat = jnp.transpose(Y_b, (1, 0, 2)).reshape(Y_b.shape[1], nb * kz)
    P, sel = _stream_projection(
        loaders[k], Ycat, weights=weights.get(k), normalize=normalize,
        dtype=dtype, mesh=mesh, S_st=S_st[k], Wf_st=Wf_st[k],
        deflate=deflate,
    )
    kp = np.nonzero(np.asarray(keeps[k]))[0]
    P = jnp.take(P, jnp.asarray(sel[kp]), axis=0)
    return P.reshape(P.shape[0], nb, kz).transpose(1, 0, 2)
