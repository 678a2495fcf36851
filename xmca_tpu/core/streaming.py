"""Out-of-core (streaming) MCA solves for fields larger than device HBM.

The reference holds the full ``(time, space)`` matrices in RAM and hands
them to LAPACK (xmca/array.py:474-483) — fields beyond memory are simply
unsolvable there.  On TPU the solve only ever *contracts* over the space
axis (temporal Gram ``X X^T``, spatial back-projection ``X^T Z``), so
the data can stream through the chip in space chunks:

* **pass 1** — center each chunk on device and accumulate the temporal
  Gram.  Chunks split the COLUMN axis, so every column's full series is
  chunk-local and per-chunk centering is exact full centering (and,
  unlike a raw-Gram + rank-1-correction scheme, numerically stable for
  large-mean geophysical data in float32).
* **reduce** — the n x n Cholesky-reduced kernel, subspace SVD, and
  (optionally) the analytic-signal fold ``G_Z = (G + HGH^T) + i(HG -
  GH^T)`` all operate on n x n arrays: complex MCA streams exactly like
  real MCA, with no FFT of the data at all.
* **pass 2** — spatial singular vectors stream back out per chunk:
  ``V_chunk = Xc^T Z``, with the PC series accumulated along the way.

Peak device memory is one chunk plus n x n state — fields of any width
solve on a single chip; the loaders may read from disk (memmap, zarr,
netCDF) so host RAM is not a bound either.  Accuracy matches the
in-memory fast path to float-roundoff (tests/unit/test_streaming.py).

With a device mesh carrying a ``'space'`` axis, every chunk is
column-sharded across the mesh (GSPMD inserts the psum over ICI for
both contractions): out-of-core and multi-chip compose, so chunks can
be as wide as the mesh's aggregate HBM.
"""
from collections import namedtuple
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec

from xmca_tpu.core import fastpath as _fast
from xmca_tpu.core import preprocess as _pre

_HI = jax.lax.Precision.HIGHEST

StreamedMCA = namedtuple('StreamedMCA', [
    'svals',                 # (k,) host
    'V_left', 'V_right',     # (p_kept, k) host loadings (complex if analytic)
    'total_covariance',      # exact nuclear norm of the reduced kernel
    'total_squared_covariance',   # exact Frobenius norm squared
    'scores_left', 'scores_right',  # (n, k) DEVICE unwhitened PC series
    'means', 'stds',         # {'left'/'right': (p_kept,)} host column stats
    'keep',                  # {'left'/'right': (p,) bool} non-NaN columns
    'grams',        # {'left'/'right': (n, n)} DEVICE real centered Grams
                    # of the transformed data, pre-jitter/pre-fold — the
                    # streamed bootstrap's whole working set (time-axis
                    # resampling is pure index algebra on these).
                    # Extended solves store the COMPLEX Z Z^H instead
                    # (the fold cannot express the boundary forecast);
                    # the streamed bootstrap rejects those models.
    'scores_pre',   # {'left'/'right': (n, k)} DEVICE pre-Hilbert raw
                    # scores ``Xc V`` (== scores for real solves) — the
                    # streamed deflation needs the REAL data's projection
])


def chunks_from_array(X, chunk_size):
    """Iterate an in-memory ``(n, p)`` array in ``(n, <=chunk)`` slabs.

    Convenience loader; real out-of-core use supplies any iterable of
    host arrays with equal first dimension (e.g. reads from a memmap).
    """
    for s in range(0, X.shape[1], chunk_size):
        yield X[:, s:s + chunk_size]


def _space_shards(mesh):
    """Shard count of a mesh's 'space' axis (1 = unsharded)."""
    if mesh is None or 'space' not in mesh.axis_names:
        return 1
    return mesh.shape['space']


def _put_chunk(chunk, dtype, mesh):
    """Stage one host chunk for the streamed kernels.

    Without a mesh the host array is handed to jit directly (one
    upload).  With a mesh carrying a ``'space'`` axis the chunk's
    columns are zero-padded to the shard count and placed column-
    sharded — GSPMD then turns the Gram/projection contractions into
    per-device partials + a ``psum`` over ICI.  Zero pad columns
    contribute nothing to any contraction (the same additive-column
    algebra as the NaN drop); callers slice them back out of the tiny
    per-chunk stats/loadings host-side.  Returns
    ``(staged_chunk, padded_width, true_width)``."""
    chunk = np.asarray(chunk, dtype)
    w = chunk.shape[1]
    n_shards = _space_shards(mesh)
    pad = (-w) % n_shards
    if pad:
        chunk = np.pad(chunk, ((0, 0), (0, pad)))
    if n_shards > 1:
        chunk = jax.device_put(
            chunk, NamedSharding(mesh, PartitionSpec(None, 'space'))
        )
    return chunk, w + pad, w


def _unpad_select(widths):
    """Host index vector selecting true columns from padded-width
    concatenated per-chunk stats (identity when nothing was padded)."""
    if all(wp == wt for wp, wt in widths):
        return None
    sel, off = [], 0
    for wp, wt in widths:
        sel.append(np.arange(off, off + wt))
        off += wp
    return np.concatenate(sel)


@jax.jit
def _zero_nan_cols(c):
    """Zero every column containing a NaN — algebraically identical to
    DROPPING it: column contributions to the Gram (``sum_j x_j x_j^T``)
    and to the score accumulator (``sum_j x_j P_j``) are additive, and
    a zero column contributes nothing.  This is how the streamed path
    reproduces the in-memory/reference NaN-column semantics
    (xmca/tools/array.py remove_nan_cols) without dynamic shapes."""
    nan_cols = jnp.any(jnp.isnan(c), axis=0)
    return jnp.where(nan_cols[None, :], 0, c), nan_cols


def _transform_chunk(chunk, w, *, normalize, has_w):
    """Shared per-chunk preprocessing of EVERY streamed pass.

    NaN-column zeroing, exact centering (columns are chunk-local), then
    the model's column scaling: ``apply_weights`` (per-column weight
    slice ``w``) and/or ``normalize`` (divide by the chunk-local RAW
    std — identical to the in-memory path, where ``normalize`` divides
    by the ingestion-time stds; both scalings commute with centering
    and with each other).  NaN columns keep a unit divisor so they stay
    exactly zero; zero-variance real columns divide to NaN/inf like the
    resident path (reference behavior, xmca/array.py:351-365).

    Returns ``(cc, mu, var, nan_cols)`` with ``mu``/``var`` the RAW
    (pre-scaling) column stats — the model-state means/stds.
    """
    c, nan_cols = _zero_nan_cols(jnp.asarray(chunk))
    mu = jnp.mean(c, axis=0)
    cc = c - mu
    var = jnp.mean(cc * cc, axis=0)
    if has_w:
        cc = cc * w
    if normalize:
        denom = jnp.where(nan_cols, 1.0, jnp.sqrt(var))
        cc = cc / denom
    return cc, mu, var, nan_cols


@partial(jax.jit, static_argnames=('normalize', 'has_w'))
def _accumulate(G, chunk, w, *, normalize, has_w):
    """One pass-1 update: transform the chunk and accumulate its Gram,
    plus the chunk's column means/variances and NaN-column mask (the
    model-state statistics — predict needs them and the chunk is
    already on device).

    Chunks split the COLUMN axis, so every column's full time series is
    chunk-local and per-chunk centering is EXACT full centering.  (An
    earlier design accumulated the raw Gram and recovered centering by
    the rank-1 identity ``Gc = G - w 1^T - 1 w^T + mu.mu`` — exact in
    real arithmetic, but catastrophically cancellative in float32 for
    large-mean geophysical data: Kelvin fields with mean ~300 and
    variance ~1 put the raw Gram 1e5x above the centered one, and the
    f32 roundoff of the big terms lands far above the jitter floor,
    making the Cholesky fail.  Caught by driving the solver on the
    reference's own sst fixture.)
    """
    cc, mu, var, nan_cols = _transform_chunk(
        chunk, w, normalize=normalize, has_w=has_w
    )
    G = G + jnp.matmul(cc, cc.T, precision=_HI)
    return G, mu, var, nan_cols


@partial(jax.jit,
         static_argnames=('normalize', 'has_w', 'extend', 'period'))
def _accumulate_ext(G, chunk, w, *, normalize, has_w, extend, period):
    """Pass-1 update of a boundary-EXTENDED complexified solve.

    Chunks split the COLUMN axis, so each column carries its full time
    series and the reference's extend-then-Hilbert complexification
    (xmca/array.py:367-472: forecast both boundaries, analytic signal
    of the tripled series, keep the middle third, re-center) is exactly
    chunk-local.  The analytic fold used by the plain streamed path
    cannot express the extension (the forecast is a nonlinear
    per-column map), so the complex chunk IS materialized — on device,
    one chunk at a time — and its Hermitian temporal Gram ``Z Z^H``
    accumulated directly.
    """
    cc, mu, var, nan_cols = _transform_chunk(
        chunk, w, normalize=normalize, has_w=has_w
    )
    z = _pre.complexify(cc, extend=extend, period=period)
    G = G + jnp.matmul(z, z.conj().T, precision=_HI)
    return G, mu, var, nan_cols


def _weight_slice(weights, off, wt, wp, dtype):
    """Per-chunk slice of a field's column-weight spec.

    ``weights`` may be None (no ``apply_weights``), a scalar, or a
    full-width ``(p,)`` host vector; pad columns get weight 0 (they
    must stay exactly zero).  Returns ``(w_or_None, has_w)``."""
    if weights is None:
        return jnp.zeros(0, dtype), False
    if np.isscalar(weights) or np.ndim(weights) == 0:
        w = np.full(wp, float(weights), dtype)
    else:
        w = np.zeros(wp, dtype)
        w[:wt] = np.asarray(weights[off:off + wt], dtype)
    return jnp.asarray(w), True


def streamed_gram(chunks, n_obs, dtype=jnp.float32, mesh=None,
                  weights=None, normalize=False, extend=False,
                  period=1):
    """Centered temporal Gram of a streamed field (pass 1).

    With ``extend`` (``'exp'``/``'theta'``), each chunk is
    boundary-extended and complexified on device (`_accumulate_ext`)
    and the returned Gram is the COMPLEX Hermitian ``Z Z^H``.

    ``chunks``: iterable of host ``(n_obs, p_chunk)`` arrays.  Returns
    ``(G, p_kept, mean, std, keep)``: the exactly-centered
    ``(n_obs, n_obs)`` Gram on device, the kept (non-NaN) column count
    (the rank/roundoff scale the jitter floor needs — roundoff of a
    length-p contraction grows like ``eps * sqrt(p)``), the host
    ``(p_kept,)`` packed column means/stds, and the full-width bool
    keep mask.  Columns containing NaN are dropped exactly (see
    `_zero_nan_cols`), matching the in-memory ingestion.
    ``weights``/``normalize`` apply the model's column scaling per
    chunk (`_transform_chunk`) — the returned means/stds stay RAW.
    With a ``mesh`` carrying a ``'space'`` axis, each chunk is
    column-sharded and the Gram comes out of per-device partial
    matmuls + psum (`_put_chunk`).
    """
    gram_dtype = _fast._complex_dtype(dtype) if extend else dtype
    G = jnp.zeros((n_obs, n_obs), gram_dtype)
    widths = []
    means, vars_, masks = [], [], []
    off = 0
    for chunk in chunks:
        chunk, wp, wt = _put_chunk(chunk, dtype, mesh)
        widths.append((wp, wt))
        w, has_w = _weight_slice(weights, off, wt, wp, dtype)
        off += wt
        if extend:
            G, mu, var, nan_cols = _accumulate_ext(
                G, chunk, w, normalize=normalize, has_w=has_w,
                extend=extend, period=period,
            )
        else:
            G, mu, var, nan_cols = _accumulate(
                G, chunk, w, normalize=normalize, has_w=has_w
            )
        # keep the small per-chunk stats ON DEVICE during the loop: a
        # blocking readback here would serialize the bandwidth-bound
        # Gram pass (each tunnel round trip ~30 ms and the next chunk's
        # upload cannot overlap); materialize once after the pipeline
        # has drained
        means.append(mu)
        vars_.append(var)
        masks.append(nan_cols.astype(dtype))
    if not means:
        z = np.zeros(0, dtype)
        return G, 0, z, z, np.zeros(0, bool)
    # ONE gather for every per-chunk statistic: a readback per chunk
    # costs ~30 ms each on the tunnel (~196 chunks at north-star width
    # -> ~12 s of pure latency); a device-side concat + one transfer
    # costs two round trips total
    flat = np.asarray(jnp.concatenate(means + vars_ + masks))
    pp = sum(wp for wp, _ in widths)
    mean, var, nan_cols = flat[:pp], flat[pp:2 * pp], flat[2 * pp:] > 0.5
    sel = _unpad_select(widths)
    if sel is not None:
        mean, var, nan_cols = mean[sel], var[sel], nan_cols[sel]
    keep = ~nan_cols
    mean, var = mean[keep], var[keep]
    return G, int(keep.sum()), mean, np.sqrt(np.maximum(var, 0.0)), keep


@partial(jax.jit, static_argnames=('complexify', 'normalize', 'has_w'))
def _project_chunk(chunk, Z, A, w, *, complexify, normalize, has_w):
    """One pass-2 update: centered spatial vectors for a chunk, plus
    the running PC-score accumulator.

    ``Z`` is the (n, k) recovery matrix (complex for analytic solves —
    already folded with ``T - i H^T T`` by the caller, passed as its
    real/imag stack so only real matmuls run).  ``A`` accumulates
    ``Xc @ V`` chunk by chunk — the unwhitened PC series comes out of
    the same pass for one extra small matmul, so the result layer never
    needs the (streamed, possibly disk-resident) data again.
    """
    cc, _, _, _ = _transform_chunk(          # same drops/scaling as pass 1
        chunk, w, normalize=normalize, has_w=has_w
    )
    P = jnp.matmul(cc.T, Z, precision=_HI)
    if complexify:
        P = _fast.combine_analytic_projection(P)
    return P, A + jnp.matmul(cc, P, precision=_HI)


@partial(jax.jit,
         static_argnames=('normalize', 'has_w', 'extend', 'period'))
def _project_chunk_ext(chunk, Zw, A, Ap, w, *, normalize, has_w,
                       extend, period):
    """Pass-2 update of a boundary-extended complexified solve.

    The complex chunk is re-materialized (extend + Hilbert, exactly as
    in pass 1) and projected against the complex recovery matrix
    ``Zw = La^-H U``: loadings ``P = Z^H Zw``, score accumulator
    ``A += Z P`` and pre-Hilbert (real-data) accumulator
    ``Ap += Xc P`` — the latter feeds the same result-layer slots the
    analytic-fold path fills.
    """
    cc, _, _, _ = _transform_chunk(
        chunk, w, normalize=normalize, has_w=has_w
    )
    z = _pre.complexify(cc, extend=extend, period=period)
    P = jnp.matmul(z.conj().T, Zw, precision=_HI)
    return (P,
            A + jnp.matmul(z, P, precision=_HI),
            Ap + jnp.matmul(cc.astype(P.dtype), P, precision=_HI))


@jax.jit
def _recovery_weights_ext(L_chol, T_side):
    """Complex (n, k) recovery matrix of an extended solve: no fold,
    no real projection — the data itself is complex."""
    return jax.scipy.linalg.solve_triangular(
        L_chol.conj().T, T_side, lower=False
    )


@partial(jax.jit,
         static_argnames=('p', 'jitter_rel', 'eps', 'complexify'))
def _fold_jitter(G, H, p, jitter_rel, eps, *, complexify):
    """Analytic fold + rank-jitter of a streamed Gram, under jit
    (eager complex ops are unsafe on the axon backend).  The scalar
    jitter parameters are static: ``_jitter`` derives its floor with
    host arithmetic."""
    if complexify:
        G = _fast._analytic_fold(G, H).astype(
            _fast._complex_dtype(G.dtype)
        )
    return _fast._jitter(G, p, jitter_rel, input_eps=eps)


@partial(jax.jit, static_argnames=('n_modes', 'n_iter', 'bivariate'))
def _reduce_streamed(Gl, Gr, key, dof, *, n_modes, n_iter, bivariate):
    """Cholesky reduction + subspace SVD + exact totals, one program."""
    La = jnp.linalg.cholesky(Gl)
    Lb = La if not bivariate else jnp.linalg.cholesky(Gr)
    M = jnp.matmul(La.conj().T, Lb, precision=_HI) / dof
    U, s, V = _fast.subspace_svd(M, key, k=n_modes, n_iter=n_iter)
    totals = jnp.stack([_fast.nuclear_norm(M),
                        jnp.sum(jnp.abs(M) ** 2)])
    return La, Lb, U, s, V, totals


@partial(jax.jit, static_argnames=('complexify',))
def _recovery_weights(L_chol, T_side, H, *, complexify):
    """Real (n, k or 2k) recovery matrix, under jit."""
    T = jax.scipy.linalg.solve_triangular(
        L_chol.conj().T, T_side, lower=False
    )
    return (_fast.analytic_projection_stack(T, H) if complexify
            else jnp.real(T))


@partial(jax.jit, static_argnames=('shape', 'dtype'))
def _zeros_dev(*, shape, dtype):
    return jnp.zeros(shape, dtype)


@partial(jax.jit,
         static_argnames=('complexify', 'normalize', 'has_w',
                          'original', 'has_inv', 'extend', 'period'))
def _fields_chunk(chunk, w, H, inv_w, *, complexify, normalize, has_w,
                  original, has_inv, extend=False, period=1):
    """One chunk of a chunk-backed model's ``fields()`` view: the
    preprocessed (and, for analytic solves, complexified) data, with
    the reference's ``original_scale`` inverse — un-weight by
    ``inv_w`` (the xMCA coslat inverse; generic MCA weights are never
    undone, reference xmca/array.py:264-315), un-normalize, re-add the
    mean (xmca/xarray.py:111-130 ordering).  NaN (dropped) columns are
    re-inserted as NaN right here, so the view is correct even before
    any solve has run."""
    cc, mu, var, nan_cols = _transform_chunk(
        chunk, w, normalize=normalize, has_w=has_w
    )
    if complexify and extend:
        z = _pre.complexify(cc, extend=extend, period=period)
    elif complexify:
        z = cc + 1j * jnp.matmul(H, cc, precision=_HI)
    else:
        z = cc
    if original:
        if has_inv:
            z = z * inv_w
        if normalize:
            z = z * jnp.sqrt(var)
        z = z + mu
    return jnp.where(nan_cols[None, :], jnp.nan, z)


def streamed_fields(loader, n_obs, *, complexify=False, extend=False,
                    period=1, weights=None,
                    normalize=False, original_scale=False,
                    inv_colmul=None, dtype=jnp.float32, mesh=None):
    """Materialize a streamed field as one host ``(n_obs, p)`` array.

    Re-reads the loader once, applying the model's per-chunk transform
    — the chunk-backed counterpart of the resident ``fields()`` getter.
    ``inv_colmul``: optional full-width per-column inverse applied by
    ``original_scale`` before the un-normalize (the xMCA coslat
    inverse).  The OUTPUT is full-size by contract (reference parity:
    xmca/array.py:898-913 returns ndarrays); out-of-core models pay
    that host allocation only when the user explicitly asks for the
    data back.
    """
    from xmca_tpu.utils.transfer import to_numpy as _to_np

    extend = extend if complexify else False
    H = _fast.hilbert_imag_matrix_device(n_obs, np.dtype(dtype)) \
        if complexify and not extend else jnp.zeros((0, 0), dtype)
    parts, off = [], 0
    for chunk in loader():
        chunk, wp, wt = _put_chunk(chunk, dtype, mesh)
        w, has_w = _weight_slice(weights, off, wt, wp, dtype)
        inv_w, has_inv = _weight_slice(inv_colmul, off, wt, wp, dtype)
        off += wt
        z = _fields_chunk(
            chunk, w, H, inv_w, complexify=complexify,
            normalize=normalize, has_w=has_w, original=original_scale,
            has_inv=has_inv, extend=extend, period=period,
        )
        parts.append((z, wt))
    return np.concatenate(
        [_to_np(z)[:, :wt] for z, wt in parts], axis=1
    )


@partial(jax.jit, static_argnames=('normalize', 'has_w'))
def _pattern_chunk(chunk, w, Sc, s_norm, *, normalize, has_w):
    """One chunk of a correlation map: Pearson r of the chunk's
    (transformed) columns against the centered PC series."""
    cc, _, _, _ = _transform_chunk(
        chunk, w, normalize=normalize, has_w=has_w
    )
    num = jnp.matmul(cc.T, Sc, precision=_HI)
    xnorm = jnp.linalg.norm(cc, axis=0)
    return num / (xnorm[:, None] * s_norm[None, :])


def streamed_patterns(loader, n_obs, Sc, s_norm, *, weights=None,
                      normalize=False, dtype=jnp.float32, mesh=None):
    """Correlation map of a streamed field against centered PC series.

    ``Sc``: device ``(n_obs, k)`` CENTERED real PC series (phase shift
    already applied), ``s_norm``: their column L2 norms.  One pass over
    the loader; per chunk the Pearson contraction
    ``num = Xc^T Sc``, ``r = num / (||Xc|| ||Sc||)`` runs on device —
    chunk-local, exactly the resident `_pattern_kernel` contraction
    split along columns (api/array.py).  Dropped (NaN) columns emerge
    as 0/0 = NaN rows and are packed out by the caller.  Returns the
    full-width host ``(p, k)`` map.
    """
    from xmca_tpu.utils.transfer import to_numpy as _to_np

    parts, off = [], 0
    for chunk in loader():
        chunk, wp, wt = _put_chunk(chunk, dtype, mesh)
        w, has_w = _weight_slice(weights, off, wt, wp, dtype)
        off += wt
        r = _pattern_chunk(chunk, w, Sc, s_norm,
                           normalize=normalize, has_w=has_w)
        parts.append((r, wt))
    return np.concatenate(
        [_to_np(r)[:wt] for r, wt in parts], axis=0
    )


@jax.jit
def _fold_score_hilbert(A, H):
    """Analytic PC series from the real-data accumulator:
    ``Xz V = (I + iH) Xc V = A + i H A``."""
    return A + 1j * jnp.matmul(H, A, precision=_HI)


def streamed_mca(chunks_left, chunks_right, n_obs, n_modes, *,
                 complexify=False, extend=False, period=1, key=None,
                 n_iter=12, jitter_rel=1e-6, dtype=jnp.float32,
                 mesh=None, weights=None, normalize=False):
    """Truncated (complex) MCA of two streamed fields.

    Parameters
    ----------
    chunks_left, chunks_right : callables returning fresh iterables of
        host ``(n_obs, p_chunk)`` arrays (each field is streamed twice:
        Gram pass + projection pass).  For a PCA pass ``chunks_right``
        may be None.
    n_modes : leading modes to extract.
    complexify : analytic-signal (Hilbert) MCA via the Gram fold — the
        complex field is never materialized, streamed or otherwise.
    extend, period : boundary forecast of the complexification
        (``'exp'``/``'theta'``, reference xmca/array.py:367-472).
        Chunks split the column axis, so each column's full series is
        chunk-local and the extension applies per chunk; the fold no
        longer holds (forecasts are nonlinear), so both passes run on
        the complex chunk directly (`_accumulate_ext` /
        `_project_chunk_ext`).  Ignored unless ``complexify``.
    mesh : jax.sharding.Mesh with a ``'space'`` axis, optional — each
        chunk is column-sharded across the mesh so both streamed passes
        run as per-device partial matmuls + an XLA psum over ICI:
        out-of-core AND multi-chip at once (chunks can be as wide as
        the mesh's aggregate HBM allows).
    weights : {'left'/'right': scalar | (p,) vector | None}, optional —
        per-column ``apply_weights`` scaling applied inside every pass.
    normalize : bool — divide each column by its raw std (``normalize``).

    Returns
    -------
    :class:`StreamedMCA` — loadings as host numpy ``(p, n_modes)``
    (complex for analytic solves), assembled chunk by chunk; exact
    spectrum totals (nuclear norm / squared Frobenius norm of the
    reduced kernel — the Rule-N / explained-variance / scf scales);
    the unwhitened device-resident PC series ``Xz V`` accumulated
    during the projection pass (so the public result layer works
    without ever re-reading the streamed data); and the device-resident
    real centered Grams + pre-Hilbert scores the streamed
    bootstrap/deflation algebra consumes.
    """
    from xmca_tpu.utils.transfer import to_numpy as _to_np

    if key is None:
        key = jax.random.PRNGKey(0)
    bivariate = chunks_right is not None
    weights = weights or {}
    extend = extend if complexify else False
    # ONE device-resident Hilbert operator for both fields (the extend
    # path complexifies per chunk instead — no fold)
    H = _fast.hilbert_imag_matrix_device(n_obs, np.dtype(dtype)) \
        if complexify and not extend else None

    means, stds, keeps, grams = {}, {}, {}, {}

    def field_gram(loader, side):
        G, p, means[side], stds[side], keeps[side] = streamed_gram(
            loader(), n_obs, dtype, mesh=mesh,
            weights=weights.get(side), normalize=normalize,
            extend=extend, period=period,
        )
        if p == 0:
            raise RuntimeError(
                'the %s field has no NaN-free columns — nothing to '
                'decompose.' % side
            )
        grams[side] = G
        # fold + jitter run under jit (eager complex ops are unsafe on
        # axon); the jitter floor scales with the CONTRACTED width p.
        # Extended Grams are already complex — jitter only.
        return _fold_jitter(
            G, jnp.zeros((0, 0), dtype) if extend else H, p,
            jitter_rel, float(jnp.finfo(dtype).eps),
            complexify=complexify and not extend,
        )

    Gl = field_gram(chunks_left, 'left')
    Gr = Gl if not bivariate else field_gram(chunks_right, 'right')

    La, Lb, U, s, V, totals = _reduce_streamed(
        Gl, Gr, key, n_obs - 1,
        n_modes=n_modes, n_iter=n_iter, bivariate=bivariate,
    )

    score_dtype = (_fast._complex_dtype(dtype) if complexify
                   else np.dtype(dtype))

    def recover(loader, L_chol, T_side, keep, side):
        if extend:
            Z = _recovery_weights_ext(L_chol, T_side)
        else:
            Z = _recovery_weights(L_chol, T_side, H,
                                  complexify=complexify).astype(dtype)
        A = _zeros_dev(shape=(n_obs, int(T_side.shape[1])),
                       dtype=np.dtype(score_dtype).str)
        A_pre = A
        parts = []
        off = 0
        for c in loader():
            c, wp, wt = _put_chunk(c, dtype, mesh)
            w, has_w = _weight_slice(weights.get(side), off, wt, wp,
                                     dtype)
            off += wt
            if extend:
                P, A, A_pre = _project_chunk_ext(
                    c, Z, A, A_pre, w, normalize=normalize,
                    has_w=has_w, extend=extend, period=period,
                )
            else:
                P, A = _project_chunk(c, Z, A, w,
                                      complexify=complexify,
                                      normalize=normalize, has_w=has_w)
            # hold the small (p_chunk, k) device results until the loop
            # drains — a blocking readback per chunk would serialize
            # the projection pass on tunneled backends (pad rows are
            # sliced off at materialization)
            parts.append((P, wt))
        # the pre-fold accumulator is the REAL data's raw scores
        # ``Xc V`` — the streamed deflation algebra needs it alongside
        # the analytic ``Xz V`` (for real solves they coincide; the
        # extend path accumulates it explicitly per chunk)
        if not extend:
            A_pre = A
            if complexify:
                A = _fold_score_hilbert(A, H)
        Vf = np.concatenate(
            [_to_np(P)[:wt] for P, wt in parts], axis=0
        )
        # dropped (NaN) columns came through as zero rows — pack them
        # out so the loadings match the in-memory kept-column layout
        return (Vf if keep.all() else Vf[keep]), A, A_pre

    V_left, S_left, P_left = recover(
        chunks_left, La, U, keeps['left'], 'left'
    )
    if bivariate:
        V_right, S_right, P_right = recover(
            chunks_right, Lb, V, keeps['right'], 'right'
        )
    else:
        V_right, S_right, P_right = V_left, S_left, P_left
    totals = np.asarray(totals)
    return StreamedMCA(
        np.asarray(s), V_left, V_right,
        float(totals[0]), float(totals[1]), S_left, S_right,
        means, stds, keeps, grams,
        {'left': P_left, 'right': P_right},
    )
