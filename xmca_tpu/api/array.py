"""``MCA`` — the ndarray-facing model class.

Method-for-method re-implementation of the reference's ``xmca.array.MCA``
(xmca/array.py:30-2024) on top of the jitted TPU core: ingestion and NaN
masking happen once on host (static shapes for XLA), everything numerical —
complexification, the Gram-trick solve, rotation, Monte-Carlo ensembles —
runs as jitted device code.  Results are materialized to NumPy for the
getter layer, which reproduces the reference's slicing / scaling / phase /
NaN-scatter semantics exactly.

Intentional deviations from the reference (each noted at the method):
* ``_scale_X`` applies normalization per field; the reference's loop-scope
  bug (xmca/array.py:269-272) applied it only to the last field when called
  with a multi-field dict (never triggered through its public API).
* ``bootstrapping`` resamples the original data each run instead of
  compounding resamples in place (xmca/array.py:1905-1928).
* SVD sign/phase convention follows XLA's eigendecomposition; singular
  vectors may differ from LAPACK's by a per-mode unit factor (both are
  valid; compare with phase alignment).
"""
import cmath
import os
from datetime import datetime
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from xmca_tpu.version import __version__
from xmca_tpu.utils.transfer import to_numpy as _to_np
from xmca_tpu.utils.transfer import to_device as _to_dev
from xmca_tpu.utils.nan import (get_nan_cols, has_nan_time_steps,
                                remove_nan_cols)
from xmca_tpu.utils.text import secure_str, wrap_str
from xmca_tpu.core import preprocess as _pre
from xmca_tpu.core import solver as _solver
from xmca_tpu.core.rotation import promax1 as _promax1
from xmca_tpu.stats import significance as _sig

_DEFAULT_METHOD = 'gram'
_HI = jax.lax.Precision.HIGHEST


@jax.jit
def _real_dev(x):
    """Real part, on device (eager complex ops fail on the axon TPU)."""
    return jnp.real(x)


@jax.jit
def _all_nan_dev(x):
    """True iff every entry is NaN — device-side reduction; only a bool
    crosses to host (a direct np.asarray of a complex device array fails
    on axon, and eager complex ops are unsafe there)."""
    return jnp.isnan(jnp.abs(x)).all()


@jax.jit
def _sub_dev(a, b):
    return a - b


@jax.jit
def _pack_solve_scalars(s, total_cov, total_sq):
    """(svals, cov, sq) as ONE flat real vector — a single host
    transfer instead of three (each tunnel roundtrip costs ~30 ms)."""
    return jnp.concatenate([
        s, jnp.stack([total_cov, total_sq]).astype(s.dtype)
    ])


@jax.jit
def _mul_dev(a, b):
    return a * b


# ---------------------------------------------------------------------------
# Mode-space device kernels.
#
# Everything the result layer computes is a handful of small products in
# "mode space" — scale the singular vectors by √s, mix them through the
# rotation matrix, re-order by variance, project the data through them.
# Each public getter compiles to ONE fused device program consuming the
# device-resident basis (`MCA._V_dev`): no full-field host round trips,
# no eager complex ops (unsafe on the axon backend), and only the
# requested columns ever cross the host<->device link.  Mode counts
# (`pool`) and result slices (`keep`) are static so XLA sees fixed
# shapes; weights/orderings are traced arguments so re-ordering never
# recompiles.
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=('pool',))
def _loadings_kernel(V, col_w, R, inv_norm, order, *, pool):
    """Rotated spatial vectors: ((V √s) R / ‖·‖), variance-ordered."""
    mixed = jnp.matmul(V[:, :pool] * col_w, R, precision=_HI) * inv_norm
    return jnp.take(mixed, order, axis=1)


@partial(jax.jit, static_argnames=('pool',))
def _scores_kernel(X, V, whiten, *, pool):
    """Unrotated PC series: (X V) / √s."""
    return jnp.matmul(X, V[:, :pool], precision=_HI) * whiten


@partial(jax.jit, static_argnames=('pool',))
def _scores_rotated_kernel(X, V, whiten, R_it, order, *, pool):
    """Rotated PC series: ((X V) / √s) R⁻ᵀ, variance-ordered."""
    S = jnp.matmul(X, V[:, :pool], precision=_HI) * whiten
    return jnp.take(jnp.matmul(S, R_it, precision=_HI), order, axis=1)


@partial(jax.jit, static_argnames=('pool',))
def _whiten_scores_kernel(S, whiten, *, pool):
    """Unrotated PC series from precomputed raw scores (streamed
    solves store ``X V`` — the data itself is gone)."""
    return S[:, :pool] * whiten


@partial(jax.jit, static_argnames=('pool',))
def _whiten_scores_rotated_kernel(S, whiten, R_it, order, *, pool):
    """Rotated PC series from precomputed raw scores."""
    W = S[:, :pool] * whiten
    return jnp.take(jnp.matmul(W, R_it, precision=_HI), order, axis=1)


@partial(jax.jit, static_argnames=('pool', 'keep'))
def _reconstruct_factors_kernel(X, V, whiten, R_it, col_w, R, inv_norm,
                                norm_keep, order, *, pool, keep):
    """Rank-k factors (S, W) of the mode-subset reconstruction.

    The reconstruction is ``real(S Wᴴ)`` with ``S`` the eigen-scaled
    rotated PCs (n_obs, k) and ``W`` the rotated spatial vectors (p, k)
    — both assembled from the resident basis in one program.  ``keep``
    is a (start, stop, step) tuple — slice objects are only hashable
    (jit-static) from Python 3.12."""
    sel = slice(*keep)
    S = jnp.matmul(jnp.matmul(X, V[:, :pool], precision=_HI) * whiten,
                   R_it, precision=_HI)
    S = jnp.take(S, order, axis=1)[:, sel] * norm_keep
    W = jnp.matmul(V[:, :pool] * col_w, R, precision=_HI) * inv_norm
    W = jnp.take(W, order, axis=1)[:, sel]
    return S, W


@partial(jax.jit, static_argnames=('pool', 'keep'))
def _stream_pattern_scores_kernel(S_raw, whiten, R_it, order, cos_p,
                                  sin_p, *, pool, keep):
    """Centered phase-shifted real PC series (+ norms) from streamed
    raw scores — the PC half of `_pattern_kernel` with the projection
    ``Xs V`` replaced by the solve-time accumulator."""
    S = S_raw[:, :pool] * whiten
    S = jnp.take(jnp.matmul(S, R_it, precision=_HI), order,
                 axis=1)[:, slice(*keep)]
    S = jnp.real(S) * cos_p - jnp.imag(S) * sin_p
    Sc = S - jnp.mean(S, axis=0)
    return Sc, jnp.linalg.norm(Sc, axis=0)


@partial(jax.jit, static_argnames=('pool', 'keep'))
def _stream_reconstruct_factors_kernel(S_raw, V, whiten, R_it, col_w,
                                       R, inv_norm, norm_keep, order, *,
                                       pool, keep):
    """`_reconstruct_factors_kernel` fed by streamed raw scores: the
    data projection ``X V`` is replaced by the solve-time accumulator
    ``S_raw = Xz V``; the loadings half is identical."""
    sel = slice(*keep)
    S = jnp.matmul(S_raw[:, :pool] * whiten, R_it, precision=_HI)
    S = jnp.take(S, order, axis=1)[:, sel] * norm_keep
    W = jnp.matmul(V[:, :pool] * col_w, R, precision=_HI) * inv_norm
    W = jnp.take(W, order, axis=1)[:, sel]
    return S, W


@jax.jit
def _real_product_kernel(S, W):
    """real(S Wᴴ) on device — the streamed deflation's reconstruction."""
    return jnp.real(jnp.matmul(S, W.conj().T, precision=_HI))


@partial(jax.jit,
         static_argnames=('n_rot', 'power', 'bivariate', 'n_vars_left'))
def _rotate_kernel(Vl, Vr, sqrt_svals, tol, *, n_rot, power, bivariate,
                   n_vars_left):
    """The whole public rotation as ONE device program + ONE flat real
    readback: loadings assembly, promax fixed point (HIGHEST-precision
    matmuls), per-field norms, and the rotation/correlation matrices
    packed real (complex transfers are split by contract on axon).

    The previous eager sequence (concat, scale, jit, norm stack, a
    bool read, a norms read, an R/Phi transfer) paid ~6 remote
    dispatches + 3 blocking roundtrips ≈ 0.15 s of pure latency at
    north-star shapes; this is one dispatch + one read.
    """
    dtype = Vl.dtype
    real_dtype = jnp.finfo(dtype).dtype
    cols = [Vl[:, :n_rot]]
    if bivariate:
        cols.append(Vr[:, :n_rot])
    L = (jnp.concatenate(cols, axis=0) if bivariate else cols[0]) \
        * sqrt_svals.astype(real_dtype)[None, :]
    L_rot, R, Phi, converged, _ = _promax1(
        L, power=power, max_iter=1000, tol=tol, precision='highest'
    )
    if bivariate:
        norm = jnp.stack([
            jnp.linalg.norm(L_rot[:n_vars_left, :], axis=0),
            jnp.linalg.norm(L_rot[n_vars_left:, :], axis=0),
        ])
    else:
        norm = jnp.tile(jnp.linalg.norm(L_rot, axis=0)[None, :], (2, 1))
    return jnp.concatenate([
        norm.reshape(-1).astype(real_dtype),
        converged.astype(real_dtype)[None],
        jnp.real(R).reshape(-1).astype(real_dtype),
        jnp.imag(R).reshape(-1).astype(real_dtype),
        jnp.real(Phi).reshape(-1).astype(real_dtype),
        jnp.imag(Phi).reshape(-1).astype(real_dtype),
    ])


@partial(jax.jit, static_argnames=('pool', 'keep'))
def _pattern_kernel(X, Xs, V, whiten, R_it, order, cos_p, sin_p, *,
                    pool, keep):
    """Pearson correlation maps of real(X) against the phase-shifted
    real PCs of Xs — projection, rotation, centering and the (p, k)
    correlation contraction in one device program."""
    S = jnp.matmul(Xs, V[:, :pool], precision=_HI) * whiten
    S = jnp.take(jnp.matmul(S, R_it, precision=_HI), order,
                 axis=1)[:, slice(*keep)]
    S = jnp.real(S) * cos_p - jnp.imag(S) * sin_p
    Xr = jnp.real(X)
    Xc = Xr - jnp.mean(Xr, axis=0)
    Sc = S - jnp.mean(S, axis=0)
    num = jnp.matmul(Xc.T, Sc, precision=_HI)
    den = (jnp.linalg.norm(Xc, axis=0)[:, None]
           * jnp.linalg.norm(Sc, axis=0)[None, :])
    return num / den


class MCA:
    """Perform MCA/PCA on one or two ``numpy.ndarray`` fields.

    MCA is a more general form of Principal Component Analysis (PCA)
    for two input fields (left, right).  If only one field is provided,
    MCA reduces to PCA.

    Solver configuration beyond the reference API can be set with
    :meth:`set_solver` (decomposition method, ensemble batch size, device
    mesh for sharded ensembles).
    """

    def __init__(self, *fields):
        """Load data fields and store information about data size/shape.

        Parameters mirror the reference constructor (xmca/array.py:39-143):
        0, 1 or 2 ndarrays whose first dimension is time.
        """
        if len(fields) == 0:
            fields = np.array([])

        if len(fields) > 2:
            raise ValueError("Too many fields. Pass 1 or 2 fields.")

        if len(fields) == 2:
            if fields[0].shape[0] != fields[1].shape[0]:
                raise ValueError(
                    'Time dimensions of given fields are different. '
                    'Time series should have same time lengths.'
                )

        if not all(isinstance(f, np.ndarray) for f in fields):
            raise TypeError(
                'One or more fields are not `numpy.ndarray`. '
                'Please provide `numpy.ndarray` only.'
            )

        # field meta information (host side; shapes are static for XLA)
        self._keys = ['left', 'right']
        self._fields = {}
        self._complexify_pending = False
        self._shape = {}
        self._field_names = {}
        self._field_means = {}
        self._field_stds = {}
        self._fields_spatial_shape = {}
        self._n_variables = {}
        self._no_nan_index = {}
        self._n_observations = {}

        if len(fields) == 1:
            self._keys.pop()
        fields = {k: f for k, f in zip(self._keys, fields)}

        self._set_field_meta(fields)
        fields = self._reshape_to_2d(fields)
        self._fields = self._ingest_on_device(fields)

        self._analysis = {
            'version': __version__,
            'is_bivariate': True if len(self._fields) > 1 else False,
            # pre-processing
            'is_normalized': False,
            'is_coslat_corrected': False,
            'method': 'pca',
            # Complex solution
            'is_complex': False,
            'extend': False,
            'theta_period': 365,
            # Rotated solution
            'is_rotated': False,
            'n_rot': 0,
            'power': 0,
            # Truncated solution
            'is_truncated': False,
            'is_truncated_at': 0,
            'rank': 0,
            'total_covariance': 0.0,
            'total_squared_covariance': 0.0,
        }
        self._analysis['method'] = self._get_method_id()

        # TPU solver configuration (extension over the reference).
        # Backend-aware defaults: on TPU, Monte-Carlo ensembles run the
        # matmul-only fast spectrum (dense eigh/svd are iterative QDWH
        # solves there — pathologically slow); on CPU the exact dense
        # path is both faster and reference-exact.
        self._solver_method = _DEFAULT_METHOD
        self._ensemble_batch_size = None
        self._ensemble_runs_per_dispatch = None
        self._ensemble_mesh = None
        self._ensemble_axis = 'ensemble'
        self._ensemble_spectrum = (
            'fast' if jax.default_backend() == 'tpu' else 'exact'
        )
        self._subspace_iters = 12
        self._solver_truncate = None
        self._solver_seed = 0
        self._surrogate_dtype = None
        self._surrogate_source = None          # auto (see rule_n)
        self._ensemble_tol = None              # auto (see rule_n)
        self._surrogate_gen_dist = None        # auto (see rule_n)
        self._ensemble_subspace_iters = None   # auto (see rule_n)

    # ------------------------------------------------------------ ingestion
    def _set_field_meta(self, data):
        for k, field in data.items():
            self._shape[k] = field.shape
            self._n_observations[k] = field.shape[0]
            self._fields_spatial_shape[k] = field.shape[1:]
            self._n_variables[k] = int(np.prod(field.shape[1:]))
            self._field_names[k] = k

    def _reshape_to_2d(self, data):
        return {
            k: f.reshape(f.shape[0], int(np.prod(f.shape[1:])))
            for k, f in data.items()
        }

    def _set_no_nan_idx(self, data):
        for k, field in data.items():
            self._no_nan_index[k] = ~get_nan_cols(field)

    def _remove_nan_cols(self, data):
        return {k: remove_nan_cols(f) for k, f in data.items()}

    def _set_field_means(self, data):
        for k, field in data.items():
            self._field_means[k] = field.mean(axis=0)

    def _set_field_stds(self, data):
        for k, field in data.items():
            self._field_stds[k] = field.std(axis=0)

    def _ingest_on_device(self, data):
        """Upload each 2-D field ONCE; every ingestion reduction (NaN
        scans, means, stds, centering) runs on device.

        The host->device link can be the slowest part of the whole
        pipeline (a tunneled TPU moves ~45 MB/s), so the one transfer per
        field is the ingestion budget; host-side numpy passes over the
        same data and double uploads are avoided entirely.  NaN masks and
        means/stds come back as small (n_space,) vectors and stay the
        host-side numpy state the getter layer expects.
        """
        packed = {}
        for k, f in data.items():
            d = jnp.asarray(f)                       # the ONE upload
            if bool(jnp.isnan(d).all(axis=1).any()):
                raise ValueError(
                    'One or more fields contain NaN time steps. '
                    'Please remove these prior to analysis.'
                )
            nan_cols = np.asarray(jnp.isnan(d).any(axis=0))
            self._no_nan_index[k] = ~nan_cols
            if nan_cols.any():
                d = d[:, np.nonzero(~nan_cols)[0]]
            mean = jnp.mean(d, axis=0)
            self._field_means[k] = np.asarray(mean)
            self._field_stds[k] = np.asarray(jnp.std(d, axis=0))
            packed[k] = d - mean
        return packed

    def _center(self, data):
        out = {}
        for k, f in data.items():
            d = jnp.asarray(f)
            out[k] = d - d.mean(axis=0)
        return out

    def _get_method_id(self):
        return 'mca' if self._analysis['is_bivariate'] else 'pca'

    # --------------------------------------------------------------- config
    def set_solver(self, method=None, batch_size=None, mesh=None,
                   ensemble_axis='ensemble', spectrum=None,
                   subspace_iters=None, truncate=None, seed=None,
                   surrogate_dtype=None, surrogate_source=None,
                   surrogate_gen_dist=None, ensemble_tol=None,
                   ensemble_subspace_iters=None,
                   runs_per_dispatch=None):
        """Configure the TPU solver (extension over the reference API).

        Parameters
        ----------
        method : {'gram', 'svd'}, optional
            Field-decomposition backend.  'gram' (default) eigendecomposes
            the small Gram matrix — two MXU matmuls; 'svd' uses a direct
            dense SVD (closest to the reference's LAPACK numerics).
        batch_size : int, optional
            Surrogate runs per vmapped batch in Monte-Carlo methods
            (memory bound).  Auto-sized if None.
        mesh : jax.sharding.Mesh, optional
            Device mesh; Monte-Carlo ensembles shard their run axis over
            ``ensemble_axis``, and a mesh carrying a ``'space'`` axis
            additionally shards ``solve``'s space dimension (GSPMD
            partitions the Gram contraction into per-device partials +
            a psum across the mesh).
        spectrum : {'exact', 'fast'}, optional
            Monte-Carlo surrogate spectrum algorithm.  'exact' uses dense
            factorizations (the default on CPU); 'fast' uses the
            matmul-only Cholesky-reduced kernel + subspace iteration +
            Newton-Schulz nuclear norm (xmca_tpu.core.fastpath) —
            accurate to ~1e-4 relative on the leading modes and the
            default on TPU.
        subspace_iters : int, optional
            Power-iteration count of the 'fast' spectrum path (default 12).
        ensemble_subspace_iters : int, optional
            Power-iteration count inside Monte-Carlo ensembles only.
            Default (None) is automatic: 6 on the TPU generated-noise
            Rule-N path (noise kernels have benign spectra; the null
            q95 shifts by ~0.1% vs 12 iterations — 50x below the
            quantile's own Monte-Carlo noise), else ``subspace_iters``.
            The analysis' own solve always uses ``subspace_iters``.
        truncate : int, optional
            Solve only the leading `truncate` modes using the matmul-only
            subspace pipeline (the TPU path for very large fields,
            n_obs <= n_space).  Totals (covariance / squared covariance)
            are still exact: the nuclear norm comes from a Newton-Schulz
            iteration and the Frobenius norm is closed-form, so
            `explained_variance`/`scf` percentages are unaffected by the
            truncation.  `rank` becomes `truncate`.
        seed : int, optional
            Seed of the subspace range-finder used by truncated solves.
        surrogate_dtype : dtype-like, optional
            Draw dtype of Rule-N Gaussian surrogates.  Default: bfloat16
            on the TPU fast path (random draws plus ~0.4% quantization
            noise are an equally valid null sample; the induced shift of
            the null-distribution quantiles is far below Monte-Carlo
            sampling noise — measured in
            tests/integration/test_shipping_accuracy.py), the field's
            real dtype otherwise.  Bootstrap resampling always keeps the
            data's own dtype (quantizing *real* data would bias it).
        surrogate_source : {'draw', 'generated'}, optional
            How Rule-N surrogate fields come to exist.  'draw'
            materializes threefry Gaussian fields with jax.random.
            'generated' (auto-default on the TPU fast path) draws them
            as moment-matched bit transforms of the hardware-backed
            'rbg' generator (xmca_tpu.ops.surrogate.bits_field) — ~5x
            cheaper than a Gaussian draw, which dominates the
            per-surrogate cost at production shapes.
        surrogate_gen_dist : {'normal16', 'normal32', 'rademacher',
            'rademacher8', 'rademacher1'}, optional.  Draw distribution
            of generated surrogates.  'normal16' and 'normal32' are
            popcount-binomials matched to N(0, 1) in their first three
            moments (excess kurtosis -1/8 and -1/16; the 16-bit variant
            halves the generated random bits); 'rademacher' is +-1 in
            bfloat16; 'rademacher8' (the TPU default since round 4)
            stores +-1 as int8 and feeds the Pallas triangle-syrk Gram
            on TPU (lower-triangle blocks only — the Gram is the
            per-surrogate dominant op and XLA cannot exploit its
            symmetry); 'rademacher1' is the same +-1 int8 distribution
            from ONE random bit per element (8x fewer generated bits,
            but measured slower end-to-end — the bit expansion wrecks
            the draw+Gram fusion layout; kept as a documented
            alternative).  Measured q95 shift of the +-1 null vs
            'normal16': <0.2%, 40x below the Monte-Carlo noise of the
            quantile itself.  Null spectra are universal in the first
            two moments at these dimensions; equivalence to Gaussian
            draws is measured in
            tests/integration/test_significance.py.
        ensemble_tol : float, optional
            Convergence tolerance of the rotation inside Monte-Carlo
            ensembles (Rule-N and bootstrapping).  Default (None) is
            automatic: 1e-4 on the TPU paths (generated-surrogate
            Rule-N, any bootstrap), the reference's 1e-8 elsewhere.
            Ensemble quantiles are Monte-Carlo estimates with
            ~1/sqrt(2 N) relative error (~6% at N=125) — rotating each
            surrogate to 1e-4 instead of the f32 floor (1.2e-5) halves
            the per-run cost while shifting q95 by <0.3% (measured at
            north-star scale, benchmarks/RESULTS.md).  Bootstrap runs
            keep the convergence-gated polar either way (real-data
            criteria can be ill-conditioned; only the varimax stopping
            point loosens).  The analysis' own rotation
            (``rotate(tol=...)``) is unaffected.
        runs_per_dispatch : int, optional
            Generated-surrogate Rule-N runs fused into ONE device
            program (``lax.map`` over the seed axis; single-device
            only — a mesh keeps per-device dispatches).  On tunneled
            backends the dispatched path is HOST-bound: each enqueue
            costs ~18 ms regardless of the program (a trivial op
            pipelines no faster than the full surrogate), so the chip
            idles between runs.  Mapping k runs per dispatch pays one
            enqueue per k runs while keeping runs sequential in-device
            (heavy-tailed varimax tails never couple, unlike vmap
            batching).  Default (None): dispatch per run.
        """
        if method is not None:
            if method not in ('gram', 'svd'):
                raise ValueError("method must be 'gram' or 'svd'")
            self._solver_method = method
        if batch_size is not None:
            self._ensemble_batch_size = batch_size
        if mesh is not None:
            self._ensemble_mesh = mesh
        self._ensemble_axis = ensemble_axis
        if spectrum is not None:
            if spectrum not in ('exact', 'fast'):
                raise ValueError("spectrum must be 'exact' or 'fast'")
            self._ensemble_spectrum = spectrum
        if subspace_iters is not None:
            self._subspace_iters = subspace_iters
        if ensemble_subspace_iters is not None:
            self._ensemble_subspace_iters = int(ensemble_subspace_iters)
        if truncate is not None:
            self._solver_truncate = int(truncate)
        if seed is not None:
            self._solver_seed = int(seed)
        if surrogate_dtype is not None:
            self._surrogate_dtype = np.dtype(surrogate_dtype)
        if surrogate_source is not None:
            if surrogate_source not in ('draw', 'generated'):
                raise ValueError(
                    "surrogate_source must be 'draw' or 'generated'"
                )
            self._surrogate_source = surrogate_source
        if surrogate_gen_dist is not None:
            if surrogate_gen_dist not in ('normal16', 'normal32',
                                          'rademacher', 'rademacher8',
                                          'rademacher1'):
                raise ValueError(
                    "surrogate_gen_dist must be 'normal16', "
                    "'normal32', 'rademacher', 'rademacher8' or "
                    "'rademacher1'"
                )
            self._surrogate_gen_dist = surrogate_gen_dist
        if ensemble_tol is not None:
            self._ensemble_tol = float(ensemble_tol)
        if runs_per_dispatch is not None:
            self._ensemble_runs_per_dispatch = int(runs_per_dispatch)

    def set_field_names(self, left='left', right='right'):
        """Set names of the left/right field, used in plots and save files."""
        self._field_names['left'] = left
        self._field_names['right'] = right

    # ------------------------------------------------- out-of-core ingestion
    @classmethod
    def from_chunks(cls, left, right=None, *, n_observations,
                    left_shape, right_shape=None):
        """Build a chunk-backed model for fields larger than device HBM
        (or host RAM) — the out-of-core entry point.

        No reference counterpart: the reference needs the full
        ``(time, space)`` matrices in RAM for LAPACK
        (xmca/array.py:474-483).  Here the data streams through the
        chip in space chunks (xmca_tpu.core.streaming) — peak device
        memory is one chunk plus n x n state.

        Parameters
        ----------
        left, right : callables returning a *fresh* iterable of
            ``(n_observations, p_chunk)`` host arrays, e.g. successive
            reads from a memmap / zarr / netCDF store
            (:func:`xmca_tpu.compat.netcdf_chunks` builds one straight
            from a netCDF file).  Each field is streamed twice per
            solve (Gram pass + projection pass).
            Columns containing NaN are dropped exactly, matching the
            in-memory ingestion (their Gram/score contributions are
            zeroed — algebraically identical to removal).
        n_observations : length of the time axis.
        left_shape, right_shape : spatial shape tuples (or flat column
            counts) of the full fields.

        ``solve`` runs the streamed pipeline (``set_solver(truncate=k)``
        selects the mode count, default 20; plain or Hilbert-complex).
        The FULL public surface works on chunk-backed models:
        preprocessing (``normalize``/``apply_weights``/coslat) applies
        per chunk inside every pass; getters consume the solve-time
        score accumulators; correlation patterns and ``fields`` re-read
        the loaders one pass at a time; ``bootstrapping`` resamples in
        Gram space (time-axis rounds need no data pass at all —
        xmca_tpu.stats.streaming_boot); ``save_analysis`` writes the
        reference's full-size on-disk format via the streamed fields
        pass.  ``solve(complexify=True, extend='exp'/'theta')`` works
        too — chunks carry each column's full series, so the boundary
        forecast is chunk-local and both passes run on the complex
        chunk directly; only ``bootstrapping`` of such extended models
        is rejected (Gram-space resampling cannot express the per-run
        re-extension).
        """
        model = cls()
        model._keys = ['left'] if right is None else ['left', 'right']
        loaders = {'left': left}
        shapes = {'left': left_shape, 'right': right_shape}
        if right is not None:
            loaders['right'] = right
        for k in model._keys:
            sshape = shapes[k]
            if sshape is None:
                raise ValueError(
                    'spatial shape of the %s field is required' % k
                )
            sshape = ((int(sshape),) if np.isscalar(sshape)
                      else tuple(int(s) for s in sshape))
            model._shape[k] = (int(n_observations),) + sshape
            model._n_observations[k] = int(n_observations)
            model._fields_spatial_shape[k] = sshape
            model._n_variables[k] = int(np.prod(sshape))
            model._field_names[k] = k
            model._no_nan_index[k] = np.ones(model._n_variables[k], bool)
        model._chunk_loaders = loaders
        model._stream_weights = {}
        model._analysis['is_bivariate'] = len(model._keys) == 2
        model._analysis['method'] = model._get_method_id()
        return model

    def _stream_transform(self):
        """(weights dict, normalize flag) every streamed pass applies —
        the chunk-backed model's preprocessing state (`normalize` /
        `apply_weights` record intent here; the scaling itself happens
        per chunk inside each pass, xmca_tpu.core.streaming)."""
        return (getattr(self, '_stream_weights', {}) or {},
                bool(self._analysis['is_normalized']))

    def _stream_inverse_colmul(self, key):
        """Extra full-width per-column inverse the streamed
        ``original_scale`` applies — None at the MCA level (generic
        weights are never undone, reference xmca/array.py:264-315);
        the xMCA subclass supplies the coslat inverse here."""
        return None

    def _conform_stream_weights(self, key, w):
        """Validate/flatten a chunk-backed weight to a scalar or a
        full-width per-column vector (chunks carry the FULL spatial
        width; packing onto kept columns happens inside the passes)."""
        w = np.asarray(w, dtype=np.float64)
        if w.ndim == 0:
            return float(w)
        p = self._n_variables[key]
        if w.size == p:
            return w.reshape(-1)
        try:
            return np.broadcast_to(
                w, self._fields_spatial_shape[key]
            ).reshape(-1).copy()
        except ValueError:
            raise ValueError(
                'chunk-backed models support spatial (per-column) '
                'weights only: weights for the {:} field must be a '
                'scalar or broadcast to the spatial shape {:} '
                '(got shape {:}).'.format(
                    key, self._fields_spatial_shape[key], w.shape
                )
            )

    def _is_chunk_backed(self):
        return getattr(self, '_chunk_loaders', None) is not None

    def _require_resident_fields(self, what):
        if self._is_chunk_backed():
            raise RuntimeError(
                '`{:}` needs the full data matrix and is not available '
                'for chunk-backed (out-of-core) models.'.format(what)
            )

    # ------------------------------------------------------- mode selection
    def _get_slice(self, spec):
        """Resolve a 1-based mode spec to a 0-based slice.

        The public API counts modes from 1 and treats slice bounds as
        inclusive; ``None`` selects every solved mode; a plain integer
        ``n`` selects the first ``n`` (behavioral parity with the
        reference's mode addressing, xmca/array.py:145-173).
        """
        rank = self._analysis['rank']
        if spec is None:
            return slice(0, rank)
        if isinstance(spec, slice):
            lo = 0 if spec.start is None else max(0, spec.start - 1)
            hi = rank if spec.stop is None else min(spec.stop, rank)
            return slice(lo, hi, spec.step)
        if np.issubdtype(type(spec), np.integer):
            return slice(0, spec)
        raise ValueError(
            'Invalid type {:}. Must be either int or slice.'
            .format(type(spec))
        )

    def _mode_pool(self, spec, rotated):
        """Mode count entering the mode-space products.

        A rotated result always mixes all ``n_rot`` rotated modes (the
        requested slice applies after the mixing); unrotated results
        only ever touch the requested columns (``None`` = all).
        """
        if rotated:
            return self._analysis['n_rot']
        if isinstance(spec, slice):
            return spec.stop
        return spec

    def _get_min_mode(self, n=None, rotated=False):
        n_modes = [self._analysis['rank']]
        if n is not None:
            n_modes.append(n)
        if rotated:
            n_modes.append(self._analysis['n_rot'])
        return int(np.min(n_modes))

    # -------------------------------------------------------- preprocessing
    def apply_weights(self, left=None, right=None):
        """Apply weights to the left and/or right field.

        Weights broadcast against the packed 2-D (time, space) fields,
        matching reference xmca/array.py:317-349.  On chunk-backed
        (out-of-core) models the weight is recorded as a per-column
        scale and applied inside every streamed pass — spatial
        (per-column) weights only; repeated calls compose
        multiplicatively exactly like the resident multiply.
        """
        if self._is_chunk_backed():
            for k, w in (('left', left), ('right', right)):
                if w is None or k not in self._keys:
                    continue
                w = self._conform_stream_weights(k, w)
                prev = self._stream_weights.get(k)
                self._stream_weights[k] = (
                    w if prev is None else prev * w
                )
            return
        weights = {'left': left, 'right': right}
        weights = {k: 1 if w is None else w for k, w in weights.items()}
        self._note_possible_nan(
            w for w in weights.values() if w is not None
        )
        self._fields = {
            k: _mul_dev(f, jnp.asarray(np.asarray(weights[k])))
            for k, f in self._fields.items()
        }

    def _note_possible_nan(self, host_arrays):
        """Mark the fields as possibly NaN-poisoned (re-arms solve's
        reference-parity all-NaN guard) when a host-side multiplier
        contains NaN."""
        try:
            if any(np.isnan(np.asarray(a, dtype=float)).any()
                   for a in host_arrays):
                self._nan_guard_dirty = True
        except (TypeError, ValueError):
            self._nan_guard_dirty = True

    def normalize(self):
        """Normalize each time series by its standard deviation.

        On chunk-backed (out-of-core) models this records the intent;
        every streamed pass divides each column by its raw std in place
        (identical algebra — the resident path divides by the
        ingestion-time stds, which equal the chunk-local raw stds).
        """
        if not self._is_chunk_backed():
            for k in self._keys:
                stds = np.asarray(self._field_stds[k])
                if (stds == 0).any() or np.isnan(stds).any():
                    # zero-std columns divide to NaN (reference
                    # behavior) — re-arm solve's all-NaN guard
                    self._nan_guard_dirty = True
                self._fields[k] = _pre.standardize(
                    self._fields[k], jnp.asarray(stds)
                )
        self._analysis['is_normalized'] = True
        self._analysis['is_coslat_corrected'] = False
        self._analysis['method'] = self._get_method_id()
        return None

    def _scale_X(self, data_dict):
        """Center (and normalize, if flagged) new data, per field.

        Note: applies normalization to *every* field; the reference's
        version leaks its loop variable so only the last field gets
        normalized when passed a multi-field dict (xmca/array.py:269-272) —
        its public API only ever passes single-field dicts, where both
        behaviors coincide.
        """
        scaled = {}
        for k, field in data_dict.items():
            field = field - self._field_means[k]
            if self._analysis['is_normalized']:
                field = field / self._field_stds[k]
            scaled[k] = field
        return scaled

    def _scale_X_inverse(self, data_dict):
        scaled = {}
        for k, field in data_dict.items():
            if self._analysis['is_normalized']:
                field = field * self._field_stds[k]
            field = field + self._field_means[k]
            scaled[k] = field
        return scaled

    # ------------------------------------------------------------ raw views
    def _ensure_complex_fields(self):
        """Materialize a deferred Hilbert complexification.

        Fold-based solves (`_solve_truncated` via the analytic fold)
        leave the REAL fields resident: rotate/rule_n/variance never
        touch them, so the solve->rotate->significance pipeline skips
        the ``Z = X + iHX`` matmuls and the 2x field memory entirely.
        The first consumer of the complex fields (pcs, patterns,
        reconstruction, ``fields()``, a re-solve) pays them here once.
        """
        if not self._complexify_pending:
            return
        self._complexify_pending = False
        self._fields = {
            k: _pre.complexify(f) for k, f in self._fields.items()
        }

    def _can_defer_complexify(self, extend):
        """True when the upcoming complexified solve will run the
        analytic fold on the real fields (so Z need not exist yet)."""
        from xmca_tpu.core.preprocess import _HILBERT_MATMUL_MAX_N
        if extend or self._solver_truncate is None or not self._fields:
            return False
        n_obs = self._n_observations['left']
        if n_obs > _HILBERT_MATMUL_MAX_N:
            return False
        # wide regime only — the small-space branch of _solve_truncated
        # runs the exact pipeline on the materialized complex fields
        return min(
            int(f.shape[1]) for f in self._fields.values()
        ) >= n_obs

    def _get_X(self, original_scale=False, real=False):
        self._require_resident_fields('fields')
        if not (real and self._complexify_pending):
            self._ensure_complex_fields()
        X = {k: _to_np(f) for k, f in self._fields.items()}
        if real:
            X = {k: x.real for k, x in X.items()}
        if original_scale:
            X = self._scale_X_inverse(X)
        return X

    def _get_X_dev(self, real=False):
        """Device-resident (optionally real-part) fields.

        Monte-Carlo drivers must hand jit DEVICE arrays: a NumPy field
        argument is re-uploaded on every dispatch — measured 3.0 s/run
        vs 0.1 s/run for the at-scale bootstrap ensemble.
        """
        self._require_resident_fields('bootstrapping')
        if not (real and self._complexify_pending):
            self._ensure_complex_fields()
        X = dict(self._fields)
        if real:
            X = {
                k: _real_dev(f) if jnp.iscomplexobj(f) else f
                for k, f in X.items()
            }
        return X

    def _get_fields(self, original_scale=False):
        n_obs = self._n_observations['left']
        n_var = self._n_variables
        fshape = self._fields_spatial_shape
        no_nan_idx = self._no_nan_index

        if self._is_chunk_backed():
            # re-read the loaders once with the model's per-chunk
            # transform; the full-size host array is the contract
            # (reference xmca/array.py:898-913 returns ndarrays)
            from xmca_tpu.core.streaming import streamed_fields
            weights, normalize = self._stream_transform()
            dtype = getattr(self, '_stream_dtype', None) or (
                np.dtype('float64') if jax.config.jax_enable_x64
                else np.dtype('float32')
            )
            fields = {}
            for k in self._keys:
                full = streamed_fields(
                    self._chunk_loaders[k], n_obs,
                    complexify=self._analysis['is_complex'],
                    extend=self._analysis['extend'],
                    period=self._analysis['theta_period'],
                    weights=weights.get(k), normalize=normalize,
                    original_scale=original_scale,
                    inv_colmul=(self._stream_inverse_colmul(k)
                                if original_scale else None),
                    dtype=dtype,
                    mesh=self._ensemble_mesh,
                )
                full[:, ~no_nan_idx[k]] = np.nan
                fields[k] = full.reshape((n_obs,) + fshape[k])
            return fields

        fields_2d = self._get_X(original_scale=original_scale)

        fields = {}
        for k, X in fields_2d.items():
            out = np.zeros([n_obs, n_var[k]], dtype=X.dtype) * np.nan
            out[:, no_nan_idx[k]] = X
            fields[k] = out.reshape((n_obs,) + fshape[k])
        return fields

    def fields(self, original_scale=False):
        """Return `left` (and `right`) input fields on their original grid."""
        return self._get_fields(original_scale)

    # ---------------------------------------------------------------- solve
    def solve(self, complexify=False, extend=False, period=1):
        """Perform the EOF analysis / MCA.

        Parameters mirror the reference (xmca/array.py:509-603); the whole
        pipeline — optional Hilbert complexification with exp/theta
        extension, per-field Gram decompositions, kernel SVD — runs as
        jitted XLA.  Chunk-backed models (``from_chunks``) route through
        the out-of-core streamed pipeline instead.

        .. note:: ``extend='theta'`` accuracy.  The Theta boundary
           forecast is re-derived as a vectorized device scan instead of
           the reference's per-column statsmodels loop
           (xmca/array.py:367-376); the two implementations agree to
           ~1e-5 on the forecasts themselves, but EOFs of *trailing
           near-degenerate modes* (singular-value gaps below ~5%) may
           deviate up to ~2e-2 from the statsmodels-based reference —
           in that regime any forecast difference of either
           implementation rotates the basis within the near-degenerate
           subspace.  Well-separated (leading) modes agree to ~1e-5/2e-4.
           See PARITY.md ("theta") for the spectral-gap-conditioned
           error analysis.
        """
        if self._is_chunk_backed():
            return self._solve_streamed(complexify, extend, period)
        if len(self._fields) == 0 or any(
            f.size == 0 for f in self._fields.values()
        ):
            raise RuntimeError(
                'Fields are empty. Did you forget to load data?'
            )
        # reference guard parity (xmca/array.py:533: np.isnan(X).all()):
        # packed fields carry no NaN by construction, so the device scan
        # only matters after a NaN-introducing mutation (NaN weights,
        # zero-std normalize) — tracked host-side.  The scans DISPATCH
        # here (async, ~1 ms of memory-bound device work each) but their
        # flags are read only after the solve's own blocking readback
        # (`_check_nan_guard`), so the two tunnel roundtrips (~0.1 s,
        # which the normalize+coslat+solve pipeline would otherwise pay
        # on every solve) overlap the solve execution.  With all-NaN
        # fields the solve computes NaN garbage first and the same
        # RuntimeError surfaces before any result is installed.
        nan_guard = None
        if getattr(self, '_nan_guard_dirty', False):
            nan_guard = [
                _all_nan_dev(field) for field in self._fields.values()
            ]
        # a previous fold solve may have deferred its complexification;
        # re-solves operate on the complexified fields (reference
        # parity: solve mutates the stored data permanently).  When THIS
        # solve defers again, flushing would materialize a Z whose real
        # part is all the fold reads — skip it (the algebra is
        # identical: analytic(real(Z)) == Z for the no-extend signal).
        will_defer = complexify and self._can_defer_complexify(extend)
        if not will_defer:
            self._ensure_complex_fields()

        self._analysis['is_complex'] = complexify
        self._analysis['extend'] = extend
        self._analysis['theta_period'] = period

        mesh = self._ensemble_mesh
        if mesh is not None and 'space' in mesh.axis_names:
            # multi-chip solve: shard the space axis over the mesh and
            # let GSPMD partition the jitted pipeline — the temporal
            # Gram becomes per-device partials + a psum over ICI, the
            # n x n reduction stays replicated, and the spatial
            # back-projection is local to each shard
            from jax.sharding import NamedSharding, PartitionSpec
            sharding = NamedSharding(mesh, PartitionSpec(None, 'space'))
            self._fields = {
                k: jax.device_put(f, sharding)
                for k, f in self._fields.items()
            }

        if self._analysis['is_complex']:
            if will_defer:
                # the truncated solve runs the analytic fold on the
                # real fields — Z materializes lazily on first use
                self._complexify_pending = True
            else:
                self._fields = {
                    k: _pre.complexify(f, extend=extend, period=period)
                    for k, f in self._fields.items()
                }

        fields = [self._fields[k] for k in self._keys]
        if self._solver_truncate is not None:
            singular_values, Vs, totals = self._solve_truncated(fields)
        else:
            singular_values, Vs = _solver.solve(
                fields, method=self._solver_method
            )
            singular_values = np.asarray(singular_values)
            totals = (
                float(singular_values.sum()),
                float((singular_values ** 2).sum()),
            )
        if nan_guard is not None:
            # the solve's readback above already waited for the device
            # stream, so these flag reads cost ~nothing (see dispatch
            # site); raise before installing any result
            if any(bool(flag) for flag in nan_guard):
                raise RuntimeError(
                    'Fields are empty. Did you forget to load data?'
                )
        # singular vectors stay ON DEVICE; the host copy materializes
        # lazily on first `_V` access.  The (p, k) vectors are the largest
        # solve output, and a tunneled TPU link moves them at ~45 MB/s —
        # rotate() and the PC projections only ever need the device copy.
        self._V_dev = dict(zip(self._keys, Vs))
        self._V_host = None

        self._singular_values = singular_values
        self._variance = singular_values
        self._var_idx = np.argsort(singular_values)[::-1]
        self._norm = {k: np.sqrt(singular_values) for k in self._keys}

        self._analysis['total_covariance'] = totals[0]
        self._analysis['total_squared_covariance'] = totals[1]
        self._analysis['rank'] = len(singular_values)
        if self._solver_truncate is not None:
            self._analysis['is_truncated'] = True
        self._analysis['is_rotated'] = False
        self._analysis['n_rot'] = len(singular_values)
        self._analysis['power'] = 0
        self._rotation_matrix = np.eye(len(singular_values))
        self._correlation_matrix = np.eye(len(singular_values))
        self._R_dev_cache = None
        self._analysis['is_truncated_at'] = len(singular_values)

    def _fold_hilbert_operator(self, n_obs, field_dtype):
        """The real Hilbert matmul operator H, when the analytic fold
        applies to the current solve (complexified, no boundary
        extension, time axis within the matmul-Hilbert range) — else
        None."""
        from xmca_tpu.core.preprocess import _HILBERT_MATMUL_MAX_N
        from xmca_tpu.core import fastpath as _fast
        if not self._analysis['is_complex'] or self._analysis['extend']:
            return None
        if n_obs > _HILBERT_MATMUL_MAX_N:
            return None
        real_dtype = np.finfo(np.dtype(field_dtype)).dtype
        return _fast.hilbert_imag_matrix_device(n_obs, real_dtype)

    def _solve_truncated(self, fields):
        """Leading-k solve via the matmul-only subspace pipeline.

        Used when ``set_solver(truncate=k)`` is configured — the TPU path
        for fields too large for a dense eigendecomposition.  Totals are
        computed exactly from the reduced kernel: nuclear norm by
        Newton-Schulz, squared sum as the Frobenius norm.
        """
        import jax
        from xmca_tpu.core import fastpath as _fast

        Xl = fields[0]
        Xr = fields[1] if len(fields) == 2 else fields[0]
        n_obs = Xl.shape[0]
        rank_bound = min(
            n_obs, int(Xl.shape[1]), int(Xr.shape[1])
        )
        k = min(self._solver_truncate, rank_bound)
        key = jax.random.PRNGKey(self._solver_seed)

        if min(int(Xl.shape[1]), int(Xr.shape[1])) < n_obs:
            # small-space regime: the temporal Grams are rank deficient
            # beyond the jitter, so the Cholesky reduction is invalid —
            # use the exact pipeline (cheap here) with exact totals
            s_full = np.asarray(_solver.solve_svals(
                Xl, Xr if len(fields) == 2 else None,
                method=self._solver_method,
            ))
            s, Vl, Vr = _solver.solve_truncated(
                Xl, Xr if len(fields) == 2 else None, n_modes=k,
                method=self._solver_method,
            )
            Vs = [Vl]
            if len(fields) == 2:
                Vs.append(Vr)
            return (np.asarray(s),
                    Vs,
                    (float(s_full.sum()), float((s_full ** 2).sum())))

        hilbert_H = self._fold_hilbert_operator(n_obs, Xl.dtype)
        if hilbert_H is not None:
            # complexified solve WITHOUT boundary extension: the
            # analytic signal is ``Z = X + i H X`` with this exact H,
            # so the data-sized contractions can run on the real parts
            # (one HIGHEST-precision real Gram + the n x n analytic
            # fold instead of a 4x-cost complex Gram)
            s, Vl, Vr, total_cov, total_sq = \
                _fast.fast_solve_truncated_totals_analytic(
                    jnp.real(Xl), jnp.real(Xr), hilbert_H, key,
                    n_modes=k, n_iter=self._subspace_iters
                )
        else:
            s, Vl, Vr, total_cov, total_sq = \
                _fast.fast_solve_truncated_totals(
                    Xl, Xr, key, n_modes=k, n_iter=self._subspace_iters
                )
        # Vl/Vr stay on device (complex device->host transfers are split
        # and deferred to the lazy `_V` materialization); the svals and
        # the two scalar totals come back in ONE flat transfer instead
        # of three round trips through the tunnel.
        Vs = [Vl]
        if len(fields) == 2:
            Vs.append(Vr)
        flat = np.asarray(_pack_solve_scalars(s, total_cov, total_sq))
        return (flat[:-2], Vs, (float(flat[-2]), float(flat[-1])))

    def _solve_streamed(self, complexify, extend, period):
        """Out-of-core solve of a chunk-backed model.

        Streams each field through the chip twice (exactly-centered
        Gram pass + projection pass, xmca_tpu.core.streaming), captures
        the column means/stds and the unwhitened PC series along the
        way, and installs the same model state an in-memory truncated
        solve produces — the result layer is oblivious to how the
        decomposition was obtained.
        """
        if extend and extend not in ('exp', 'theta'):
            raise ValueError(
                '{:} is not a valid extension. Choose either `exp` or '
                '`theta`.'.format(extend)
            )
        from xmca_tpu.core.streaming import streamed_mca

        self._analysis['is_complex'] = complexify
        self._analysis['extend'] = extend
        self._analysis['theta_period'] = period

        n_modes = self._solver_truncate or 20
        dtype = (np.dtype('float64') if jax.config.jax_enable_x64
                 else np.dtype('float32'))
        loaders = self._chunk_loaders
        weights, normalize = self._stream_transform()
        res = streamed_mca(
            loaders['left'], loaders.get('right'),
            self._n_observations['left'], n_modes,
            complexify=complexify, extend=extend, period=period,
            key=jax.random.PRNGKey(self._solver_seed),
            n_iter=self._subspace_iters, dtype=dtype,
            # ensemble-only meshes leave chunks unsharded (_space_shards)
            mesh=self._ensemble_mesh,
            weights=weights, normalize=normalize,
        )

        self._field_means = {k: res.means[k] for k in self._keys}
        self._field_stds = {k: res.stds[k] for k in self._keys}
        # NaN columns were dropped exactly during streaming (zeroed
        # contributions); install the mask so getters scatter NaN back
        # like in-memory models do
        self._no_nan_index = {k: res.keep[k] for k in self._keys}
        self._V = dict(zip(self._keys, (res.V_left, res.V_right)))
        self._stream_scores = dict(
            zip(self._keys, (res.scores_left, res.scores_right))
        )
        # streamed-bootstrap working set: real centered (transformed)
        # temporal Grams + pre-Hilbert raw scores (deflation algebra)
        self._stream_grams = {k: res.grams[k] for k in self._keys}
        self._stream_scores_pre = {k: res.scores_pre[k]
                                   for k in self._keys}
        self._stream_dtype = dtype

        svals = res.svals
        self._singular_values = svals
        self._variance = svals
        self._var_idx = np.argsort(svals)[::-1]
        self._norm = {k: np.sqrt(svals) for k in self._keys}
        self._analysis['total_covariance'] = res.total_covariance
        self._analysis['total_squared_covariance'] = (
            res.total_squared_covariance
        )
        self._analysis['rank'] = len(svals)
        self._analysis['is_truncated'] = True
        self._analysis['is_truncated_at'] = len(svals)
        self._analysis['is_rotated'] = False
        self._analysis['n_rot'] = len(svals)
        self._analysis['power'] = 0
        self._rotation_matrix = np.eye(len(svals))
        self._correlation_matrix = np.eye(len(svals))
        self._R_dev_cache = None

    # --------------------------------------------------------------- rotate
    def rotate(self, n_rot, power=1, tol=1e-8):
        """Perform Promax (power>1) / Varimax (power=1) rotation.

        The fixed-point iteration runs as a jitted ``lax.while_loop``
        (xmca_tpu.core.rotation); parity with reference
        xmca/array.py:781-844.
        """
        if n_rot < 2:
            raise ValueError('`n_rot` must be > 1')
        if power < 1:
            raise ValueError('`power` must be >=1')

        singular_values = self._get_svals(n_rot)
        sqrt_svals = np.sqrt(singular_values)

        # rotate loadings (Cheng & Dunkerton 1995).  The (p, n_rot)
        # loading stack is assembled from the device-resident singular
        # vectors — the host round trip (materialize + re-upload through
        # a ~45 MB/s tunnel) costs more than the rotation itself at
        # production shapes.  HIGHEST-precision matmuls: on TPU the
        # default tier's bf16 passes drift the rotated variance by
        # ~3e-2 across the fixed point's ~50 iterations (caught by the
        # on-chip rotated-values golden, scripts/tpu_checks).  The whole
        # stage runs as ONE fused program + ONE flat real readback
        # (`_rotate_kernel`): the previous eager sequence paid ~6
        # remote dispatches + 3 blocking roundtrips of pure latency.
        dev = self._basis_dev()
        bivariate = self._analysis['is_bivariate']
        n_vars_left = int(dev['left'].shape[0])
        real_dtype = np.finfo(
            np.dtype(dev['left'].dtype)
        ).dtype
        flat = np.asarray(_rotate_kernel(
            dev['left'], dev[self._keys[-1]],
            np.asarray(sqrt_svals, real_dtype),
            np.asarray(tol, real_dtype),
            n_rot=int(n_rot), power=int(power), bivariate=bivariate,
            n_vars_left=n_vars_left,
        ))
        norm_np = flat[:2 * n_rot].reshape(2, n_rot)
        if not bool(flat[2 * n_rot] > 0.5):
            raise RuntimeError(
                'Rotation process did not converge. Try decreasing the '
                'tolerance. Invalid NaN entries also might be a problem.'
            )
        blocks = flat[2 * n_rot + 1:].reshape(4, n_rot, n_rot)
        if np.iscomplexobj(np.zeros(0, dev['left'].dtype)):
            R = blocks[0] + 1j * blocks[1]
            Phi = blocks[2] + 1j * blocks[3]
        else:
            R, Phi = blocks[0], blocks[2]
        norm = {'left': norm_np[0], 'right': norm_np[1]}

        variance = norm['left'] * norm['right']
        var_idx = np.argsort(variance)[::-1]

        self._norm = norm
        self._variance = variance
        self._var_idx = var_idx

        self._rotation_matrix = R
        self._correlation_matrix = Phi
        self._R_dev_cache = None
        self._analysis['is_rotated'] = True
        self._analysis['n_rot'] = n_rot
        self._analysis['power'] = power

    def rotation_matrix(self, inverse_transpose=False):
        """Return the rotation matrix (identity if unrotated)."""
        try:
            R = self._rotation_matrix
        except AttributeError:
            R = np.eye(len(self.singular_values()))
        # orthogonal rotations satisfy R == pinv(R)^H
        if inverse_transpose and self._analysis['power'] > 1:
            R = np.linalg.pinv(R).conjugate().T
        return R

    def _rotation_dev(self, inverse_transpose=False):
        """Device copy of the (possibly inverse-transposed) rotation
        matrix, uploaded once per solve/rotate — every result kernel
        consumes it, and each re-upload costs a tunnel round trip."""
        cache = getattr(self, '_R_dev_cache', None)
        if cache is None:
            cache = self._R_dev_cache = {}
        key = bool(inverse_transpose)
        if key not in cache:
            cache[key] = _to_dev(
                self.rotation_matrix(inverse_transpose=key)
            )
        return cache[key]

    def correlation_matrix(self):
        """Return the PC correlation matrix (identity unless oblique)."""
        try:
            var_idx = self._var_idx
            return self._correlation_matrix[var_idx, :][:, var_idx]
        except AttributeError:
            return np.eye(len(self.singular_values()))

    # -------------------------------------------------------------- getters
    @property
    def _V(self):
        """Host-side singular vectors, materialized lazily.

        Solve stores only the device arrays (``_V_dev``); the first host
        consumer pays the (split-complex) transfer once.  Assigning to
        ``_V`` (load_analysis, tests) installs a host dict directly and
        drops the device copy.
        """
        host = getattr(self, '_V_host', None)
        if host is None:
            dev = getattr(self, '_V_dev', None)
            if dev is None:
                raise AttributeError('_V')
            host = {k: _to_np(v) for k, v in dev.items()}
            self._V_host = host
        return host

    @_V.setter
    def _V(self, value):
        self._V_host = value
        self._V_dev = None

    def _basis_dev(self):
        """Device-resident singular vectors, the result layer's input.

        Solve leaves them on device; analyses restored via
        ``load_analysis`` live on host and are uploaded (split-complex)
        at most once.
        """
        dev = getattr(self, '_V_dev', None)
        if dev is None:
            host = getattr(self, '_V_host', None)
            if host is None:
                raise RuntimeError(
                    'Cannot retrieve singular vectors. '
                    'Please call the method `solve` first.'
                )
            dev = {k: _to_dev(v) for k, v in host.items()}
            self._V_dev = dev
        return dev

    def _get_svals(self, n=None):
        modes = self._get_slice(n)
        try:
            return self._singular_values[modes]
        except AttributeError:
            raise RuntimeError(
                'Cannot retrieve singular values. '
                'Please call the method `solve` first.'
            )

    def _get_norm(self, n=None, sorted=True):
        """Per-field mode norms, variance-ordered unless ``sorted=False``."""
        try:
            norms = self._norm
        except AttributeError:
            raise RuntimeError(
                'Cannot retrieve field norms. '
                'Please call the method `solve` first.'
            )
        keep = self._get_slice(n)
        if sorted:
            return {k: v[self._var_idx][keep] for k, v in norms.items()}
        return {k: v[keep] for k, v in norms.items()}

    def _get_variance(self, n=None, sorted=True):
        norms = self._get_norm(n=n, sorted=sorted)
        if self._analysis['is_bivariate']:
            return norms['left'] * norms['right']
        return norms['left'] ** 2

    def _rotation_weights(self, pool):
        """(√s, 1/√s) over the mode pool — the column weights every
        mode-space product needs."""
        roots = np.sqrt(self._get_svals(pool))
        return roots, 1.0 / roots

    def _get_V(self, n=None, rotated=True):
        """Spatial singular vectors as host numpy.

        Rotated vectors are built on device from the resident basis
        (one fused program: scale by √s, mix through R, normalize,
        variance-order) and only the mixed ``n_rot`` columns cross the
        link; unrotated vectors come from the cached host copy.
        """
        pool = self._mode_pool(n, rotated)
        keep = self._get_slice(n)
        if not rotated:
            try:
                host = self._V
            except AttributeError:
                raise RuntimeError(
                    'Cannot retrieve singular vectors. '
                    'Please call the method `solve` first.'
                )
            return {k: host[k][:, :pool][:, keep] for k in self._keys}

        basis = self._basis_dev()
        col_w, _ = self._rotation_weights(pool)
        inv_norm = self._get_norm(pool, sorted=False)
        R = self._rotation_dev()
        return {
            k: _to_np(_loadings_kernel(
                basis[k], col_w, R, 1.0 / inv_norm[k], self._var_idx,
                pool=pool,
            ))[:, keep]
            for k in self._keys
        }

    def _get_U(self, n=None, rotated=True):
        """PC time series: the stored fields projected through the
        device-resident basis, whitened by √s (and mixed through R⁻ᵀ
        when rotated) — one fused device program per field.  Streamed
        solves captured the raw scores during their projection pass;
        those feed the same pipeline without the data."""
        pool = self._mode_pool(n, rotated)
        keep = self._get_slice(n)
        _, whiten = self._rotation_weights(pool)
        self._ensure_complex_fields()
        stream = getattr(self, '_stream_scores', None)
        R_it = self._rotation_dev(inverse_transpose=True) if rotated \
            else None

        def series(k):
            if stream is not None:
                if rotated:
                    return _whiten_scores_rotated_kernel(
                        stream[k], whiten, R_it, self._var_idx,
                        pool=pool,
                    )
                return _whiten_scores_kernel(stream[k], whiten,
                                             pool=pool)
            basis = self._basis_dev()
            if rotated:
                return _scores_rotated_kernel(
                    self._fields[k], basis[k], whiten, R_it,
                    self._var_idx, pool=pool,
                )
            return _scores_kernel(
                self._fields[k], basis[k], whiten, pool=pool,
            )

        return {k: _to_np(series(k))[:, keep] for k in self._keys}

    @staticmethod
    def _rescale_modes(arr, scaling, eigen_norm, ref=None, axes=None):
        """The shared mode-scaling ladder (None / eigen / max / std).

        ``ref`` supplies the max/std statistics (defaults to ``arr``
        itself — ``predict`` normalizes new PCs by the *original* PCs'
        statistics).  ``axes`` picks the reduction axes; the default
        reduces every non-mode axis, which matches the reference for
        PC series (xmca/array.py:741-744, axis=0).  EOF grids pass the
        reference's literal ``(0, 1)`` (xmca/array.py:709-712) — a
        quirk for non-2D spatial grids: 1-D spatial grids reduce over
        the mode axis too (one global divisor), 3-D+ spatial grids get
        per-(trailing-axes, mode) divisors."""
        if scaling == 'None':
            return arr
        if scaling == 'eigen':
            return arr * eigen_norm
        if scaling not in ('max', 'std'):
            raise ValueError(
                'The scaling option {:} is not valid. Please choose '
                'one of the following: None, eigen, std, max'
                .format(scaling)
            )
        stats_src = (arr if ref is None else ref).real
        if axes is None:
            axes = tuple(range(stats_src.ndim - 1))
        if scaling == 'max':
            return arr / np.nanmax(np.abs(stats_src), axis=axes)
        return arr / np.nanstd(stats_src, axis=axes)

    def _shift_phase(self, arr, phase_shift):
        """Rotate a complex result by a global phase (no-op for real
        analyses, matching the reference)."""
        if self._analysis['is_complex']:
            return arr * cmath.rect(1, phase_shift)
        return arr

    def _get_eofs(self, n=None, scaling='None', phase_shift=0,
                  rotated=True):
        V = self._get_V(n, rotated=rotated)
        grids = self._scatter_to_grid(V)
        # quirk parity: eigen scaling keys the norms by *returned mode
        # count*, not by the requested spec (unlike _get_pcs)
        count = V['left'].shape[1]
        return {
            k: self._rescale_modes(
                self._shift_phase(grid, phase_shift), scaling,
                self._get_norm(count, sorted=True)[k], axes=(0, 1),
            )
            for k, grid in grids.items()
        }

    def _get_pcs(self, n=None, scaling='None', phase_shift=0,
                 rotated=True):
        return {
            k: self._rescale_modes(
                self._shift_phase(series, phase_shift), scaling,
                self._get_norm(n, sorted=True)[k],
            )
            for k, series in self._get_U(n, rotated=rotated).items()
        }

    def singular_values(self, n=None):
        """Return the first `n` singular values."""
        return self._get_svals(n)

    def norm(self, n=None, sorted=True):
        """Return the L2 norm of the first `n` singular vectors."""
        return self._get_norm(n=n, sorted=sorted)

    def variance(self, n=None, sorted=True):
        """Return the variance of the first `n` singular vectors."""
        return self._get_variance(n=n, sorted=sorted)

    def scf(self, n=None):
        """Squared covariance fraction (%) of the first `n` modes."""
        variance = self._variance[self._var_idx][:n]
        return (variance ** 2
                / self._analysis['total_squared_covariance'] * 100)

    def explained_variance(self, n=None):
        """Covariance fraction (%) of the first `n` modes."""
        variance = self._get_variance(n=n, sorted=True)
        return variance / self._analysis['total_covariance'] * 100

    def pcs(self, n=None, scaling='None', phase_shift=0, rotated=True):
        """Return the first `n` PCs (scaling: None/eigen/max/std)."""
        return self._get_pcs(n, scaling, phase_shift, rotated)

    def eofs(self, n=None, scaling='None', phase_shift=0, rotated=True):
        """Return the first `n` EOFs (scaling: None/eigen/max/std)."""
        return self._get_eofs(n, scaling, phase_shift, rotated)

    def spatial_amplitude(self, n=None, scaling='None', rotated=True):
        """Spatial amplitude fields of the first `n` EOFs."""
        eofs = self.eofs(n, scaling='None', rotated=rotated)
        amplitudes = {}
        for key, eof in eofs.items():
            amp = np.sqrt(eof * eof.conjugate()).real
            if scaling == 'max':
                amp = amp / np.nanmax(amp, axis=(0, 1))
            amplitudes[key] = amp
        return amplitudes

    def spatial_phase(self, n=None, phase_shift=0, rotated=True):
        """Spatial phase fields of the first `n` EOFs."""
        eofs = self.eofs(n, phase_shift=phase_shift, rotated=rotated)
        return {
            key: np.arctan2(eof.imag, eof.real).real
            for key, eof in eofs.items()
        }

    def temporal_amplitude(self, n=None, scaling='None', rotated=True):
        """Temporal amplitude series of the first `n` PCs."""
        pcs = self.pcs(n, scaling='None', rotated=rotated)
        amplitudes = {}
        for key, pc in pcs.items():
            amp = np.sqrt(pc * pc.conjugate()).real
            if scaling == 'max':
                amp = amp / np.nanmax(amp, axis=0)
            amplitudes[key] = amp
        return amplitudes

    def temporal_phase(self, n=None, phase_shift=0, rotated=True):
        """Temporal phase series of the first `n` PCs."""
        pcs = self.pcs(n, phase_shift=phase_shift, rotated=rotated)
        return {
            key: np.arctan2(pc.imag, pc.real).real
            for key, pc in pcs.items()
        }

    # --------------------------------------------- correlation pattern maps
    @staticmethod
    def _corr_pvalues(r, n_obs):
        """Two-sided p-values of Pearson correlations:
        2 * BetaCDF(-|r|; a=b=n/2-1, loc=-1, scale=2) via the
        regularized incomplete beta function."""
        from scipy.special import betainc
        a = n_obs / 2.0 - 1.0
        return 2 * betainc(a, a, np.clip((1.0 - np.abs(r)) / 2.0, 0, 1))

    def _scatter_to_grid(self, data):
        """Re-insert NaN columns and reshape (n_vars, modes) maps to grid."""
        out = {}
        for k, arr in data.items():
            n_modes = arr.shape[1]
            full = np.zeros(
                [self._n_variables[k], n_modes], dtype=arr.dtype
            ) * np.nan
            full[self._no_nan_index[k], :] = arr
            out[k] = full.reshape(
                self._fields_spatial_shape[k] + (n_modes,)
            )
        return out

    def _correlation_maps(self, pairs, n, phase_shift):
        """Correlation maps field-vs-PCs, fully fused on device.

        ``pairs``: (field key, PC-source key) tuples.  Projection,
        rotation, phase shift, centering and the (p, k) correlation
        contraction run as one device program against the resident
        basis — the full field never crosses to host; only the (p, k)
        map does.  p-values come from the map on host (scipy betainc).
        Chunk-backed models stream the field through the same
        contraction one chunk at a time, correlating against the PC
        series captured at solve time (xmca_tpu.core.streaming).
        """
        pool = self._mode_pool(n, True)
        keep = self._get_slice(n)
        _, whiten = self._rotation_weights(pool)
        R_it = self._rotation_dev(inverse_transpose=True)
        if self._analysis['is_complex']:
            cos_p, sin_p = np.cos(phase_shift), np.sin(phase_shift)
        else:
            cos_p, sin_p = 1.0, 0.0

        if self._is_chunk_backed():
            return self._correlation_maps_streamed(
                pairs, pool, keep, whiten, R_it, cos_p, sin_p
            )

        self._ensure_complex_fields()
        basis = self._basis_dev()
        r, p = {}, {}
        for key, source in pairs:
            rmap = _to_np(_pattern_kernel(
                self._fields[key], self._fields[source], basis[source],
                whiten, R_it, self._var_idx, cos_p, sin_p,
                pool=pool, keep=(keep.start, keep.stop, keep.step),
            ))
            r[key] = rmap
            p[key] = self._corr_pvalues(rmap, self._n_observations[key])
        return self._scatter_to_grid(r), self._scatter_to_grid(p)

    def _correlation_maps_streamed(self, pairs, pool, keep, whiten,
                                   R_it, cos_p, sin_p):
        """Chunk-backed correlation maps: one streamed pass per field.

        The PC series come from the solve-time score accumulators
        (``_stream_scores``) — the only data-sized work is re-reading
        the correlated field's chunks; everything matches the resident
        `_pattern_kernel` contraction column block by column block.
        """
        from xmca_tpu.core.streaming import streamed_patterns
        stream = getattr(self, '_stream_scores', None)
        if stream is None:
            raise RuntimeError(
                'Cannot retrieve singular vectors. '
                'Please call the method `solve` first.'
            )
        weights, normalize = self._stream_transform()
        dtype = getattr(self, '_stream_dtype', np.dtype('float32'))
        keep3 = (keep.start, keep.stop, keep.step)
        r, p = {}, {}
        for key, source in pairs:
            Sc, s_norm = _stream_pattern_scores_kernel(
                stream[source], whiten, R_it, self._var_idx,
                cos_p, sin_p, pool=pool, keep=keep3,
            )
            full = streamed_patterns(
                self._chunk_loaders[key], self._n_observations[key],
                Sc, s_norm, weights=weights.get(key),
                normalize=normalize, dtype=dtype,
                mesh=self._ensemble_mesh,
            )
            rmap = full[self._no_nan_index[key]]
            r[key] = rmap
            p[key] = self._corr_pvalues(rmap, self._n_observations[key])
        return self._scatter_to_grid(r), self._scatter_to_grid(p)

    def homogeneous_patterns(self, n=None, phase_shift=0):
        """Correlation maps of each field with its own PCs (+ p-values)."""
        return self._correlation_maps(
            [(k, k) for k in self._keys], n, phase_shift
        )

    def heterogeneous_patterns(self, n=None, phase_shift=0):
        """Correlation maps of each field with the *other* field's PCs."""
        other = dict(zip(self._keys, self._keys[::-1]))
        try:
            pairs = [(k, other[k]) for k in self._keys]
        except KeyError:
            raise KeyError(
                'Key not found. Two fields needed for heterogenous maps.'
            )
        return self._correlation_maps(pairs, n, phase_shift)

    # ------------------------------------------------------- reconstruction
    def _reconstructed_X_dev(self, key, mode=None):
        """Mode-subset reconstruction of one field, device-resident.

        The eigen-scaled rotated PCs and the rotated spatial vectors are
        both assembled from the resident basis inside one fused program
        and contracted there — nothing crosses to host.  The iterative
        bootstrap consumes this directly (one deflation per mode with no
        full-field transfer; a (2000, 100k) field costs ~18 s each way
        through the tunnel).
        """
        S, W = self._reconstruct_factors_dev(key, mode)
        return _real_product_kernel(S, W)

    def _reconstruct_factors_dev(self, key, mode):
        """Device rank-k factors (S, W) of the mode-subset
        reconstruction — from the resident fields, or (chunk-backed)
        from the solve-time score accumulators."""
        pool = self._analysis['n_rot']
        keep = self._get_slice(mode)
        basis = self._basis_dev()
        col_w, whiten = self._rotation_weights(pool)
        common = (
            basis[key],
            whiten, self._rotation_dev(inverse_transpose=True),
            col_w, self._rotation_dev(),
            1.0 / self._get_norm(pool, sorted=False)[key],
            self._get_norm(mode, sorted=True)[key],
            self._var_idx,
        )
        kw = dict(pool=pool, keep=(keep.start, keep.stop, keep.step))
        if self._is_chunk_backed():
            return _stream_reconstruct_factors_kernel(
                self._stream_scores[key], *common, **kw
            )
        self._ensure_complex_fields()
        return _reconstruct_factors_kernel(
            self._fields[key], *common, **kw
        )

    def _inverse_scale_vectors(self, key):
        """The inverse scaling as per-column vectors over kept columns.

        The whole inverse transform of `_scale_X_inverse` is
        ``X * colmul + coladd`` with both vectors spatial-only, so
        rank-k paths can fold it into their factors instead of running
        full-field host passes.  Returns (colmul, coladd); colmul may
        be None (identity)."""
        colmul = (np.asarray(self._field_stds[key])
                  if self._analysis['is_normalized'] else None)
        return colmul, np.asarray(self._field_means[key])

    def _reconstruct_host_factors(self, key, mode, original_scale):
        """Rank-k reconstruction factors ``(A, B)`` with everything
        folded in, so callers run exactly ``A @ B.T``.

        Only the (n_obs, k) scores and (p, k) loadings cross the
        device->host link (a few MB); the (n_obs, p) outer product runs
        as ONE host sgemm — at north-star scale that replaces a
        ~2 x 800 MB tunnel transfer (~2 min at ~45 MB/s).  The gemm
        also absorbs every elementwise pass over the output grid:
        ``real(S Wᴴ) = Re(S) Re(W)ᵀ + Im(S) Im(W)ᵀ`` (two stacked real
        factor blocks), the inverse column scaling folds into ``W``
        (it is per-column: std, coslat), and the mean add becomes an
        appended ones-column in ``A`` against the means column in
        ``B`` — each extra full-field pass costs ~1 s/field on the
        single host core at (2000, 100k)."""
        S, W = (_to_np(a)
                for a in self._reconstruct_factors_dev(key, mode))
        if np.iscomplexobj(S):
            Sp = [np.ascontiguousarray(S.real),
                  np.ascontiguousarray(S.imag)]
            Wp = [np.ascontiguousarray(W.real),
                  np.ascontiguousarray(W.imag)]
        else:
            Sp, Wp = [S], [W]
        if original_scale:
            colmul, coladd = self._inverse_scale_vectors(key)
            if colmul is not None:
                cm = colmul.astype(Wp[0].dtype)[:, None]
                Wp = [w * cm for w in Wp]
            Sp.append(np.ones((S.shape[0], 1), dtype=Sp[0].dtype))
            Wp.append(coladd.astype(Wp[0].dtype)[:, None])
        A = Sp[0] if len(Sp) == 1 else np.concatenate(Sp, axis=1)
        B = Wp[0] if len(Wp) == 1 else np.concatenate(Wp, axis=1)
        return A, B

    def _reconstructed_X(self, mode=None, original_scale=True):
        """Host reconstruction on the packed (kept) columns — one sgemm
        per field (see `_reconstruct_host_factors`)."""
        rec = {}
        for k in self._keys:
            A, B = self._reconstruct_host_factors(k, mode, original_scale)
            rec[k] = A @ B.T
        return rec

    def _reconstructed_fields(self, mode=None, original_scale=True):
        """Full-grid reconstruction with the NaN scatter folded into
        the gemm: dropped columns become NaN *rows* of the tiny (p, k)
        ``B`` factor, so the sgemm writes the NaN-masked full-width
        grid directly (NaN propagates through every dot product).
        Versus gemm-then-scatter this removes a second ~800 MB/field
        buffer and the full-field copy through it."""
        rec = {}
        for k in self._keys:
            A, B = self._reconstruct_host_factors(k, mode, original_scale)
            idx = self._no_nan_index[k]
            if not idx.all():
                full = np.full((self._n_variables[k], B.shape[1]),
                               np.nan, dtype=B.dtype)
                full[idx] = B
                B = full
            rec[k] = (A @ B.T).reshape(
                (-1,) + self._fields_spatial_shape[k]
            )
        return rec

    def reconstructed_fields(self, mode=None, original_scale=True):
        """Reconstruct input fields from a subset of modes."""
        return self._reconstructed_fields(
            mode=mode, original_scale=original_scale
        )

    # ----------------------------------------------------------- prediction
    def _conform_new_data(self, key, arr):
        """Pack new data onto the solved grid: flatten the space axes,
        drop the training NaN columns, apply the training scaling.

        Shape mismatches raise the same diagnostics a user of the
        reference sees (xmca/array.py:1321-1360)."""
        try:
            flat = arr.reshape(arr.shape[0], self._n_variables[key])
            flat = flat[:, self._no_nan_index[key]]
        except ValueError as err:
            if arr.ndim != len(self._shape[key]):
                msg = (
                    'Error in {:} field. Dimension of new data ({:}) '
                    'and the original field ({:}) do not match. '
                    'Did you forget the time dimension?'
                ).format(key, arr.ndim, len(self._shape[key]))
            elif arr.shape[1:] != self._field_means[key].shape:
                msg = (
                    'Error in {:} field. Spatial dimensions of new '
                    'data {:} and the original field {:} do not match.'
                ).format(key, arr.shape[1:], self._shape[key][1:])
            else:
                msg = 'Dimension mismatch in {:} field.'.format(key)
            raise ValueError(msg) from err
        try:
            return self._scale_X({key: flat})[key]
        except ValueError as err:
            raise ValueError(
                'Error in {:} field. Spatial dimensions of new data '
                '{:} and the original field {:} do not match.'
                .format(key, flat.shape[1:], self._field_means[key].shape)
            ) from err

    def predict(self, left=None, right=None, n=None, scaling='None',
                phase_shift=0):
        """Project new data onto the singular vectors to predict its PCs.

        New data is uploaded once per field and projected through the
        device-resident basis with the same fused kernel the PC getter
        uses (unrotated projection, whitening, rotation mixing, variance
        ordering — behavioral parity with reference
        xmca/array.py:1299-1428).
        """
        new_data = {
            k: d for k, d in zip(self._keys, (left, right))
            if d is not None
        }

        basis = self._basis_dev()
        R_it = self.rotation_matrix(inverse_transpose=True)
        pool = R_it.shape[0]
        R_dev = self._rotation_dev(inverse_transpose=True)
        _, whiten = self._rotation_weights(pool)
        count = pool if n is None else n

        predicted = {}
        for k, arr in new_data.items():
            packed = self._conform_new_data(k, arr)
            scores = _to_np(_scores_rotated_kernel(
                _to_dev(packed), basis[k], whiten, R_dev,
                self._var_idx, pool=pool,
            ))[:, :count]
            scores = self._shift_phase(scores, phase_shift)
            if scaling in ('max', 'std'):
                ref = self._get_pcs(count, 'None', phase_shift)[k]
            else:
                ref = None
            predicted[k] = self._rescale_modes(
                scores, scaling, self._get_norm(count, sorted=True)[k],
                ref=ref,
            )
        return predicted

    # ----------------------------------------------------------- truncation
    def truncate(self, n):
        """Truncate the solution to the first `n` modes."""
        n_rot = self._analysis['n_rot']
        is_rotated = self._analysis['is_rotated']
        if is_rotated & (n < n_rot):
            raise ValueError(
                'Cannot truncte rotated solution. Please ensure '
                '`n` > `n_rot`'
            )
        if n < self._singular_values.size:
            self._singular_values = self._singular_values[:n]
            dev = getattr(self, '_V_dev', None)
            if dev is not None:
                self._V_dev = {k: v[:, :n] for k, v in dev.items()}
            host = getattr(self, '_V_host', None)
            if host is not None:
                self._V_host = {k: v[:, :n] for k, v in host.items()}
            stream = getattr(self, '_stream_scores', None)
            if stream is not None:
                self._stream_scores = {
                    k: s[:, :n] for k, s in stream.items()
                }
            stream_pre = getattr(self, '_stream_scores_pre', None)
            if stream_pre is not None:
                self._stream_scores_pre = {
                    k: s[:, :n] for k, s in stream_pre.items()
                }
            self._analysis['is_truncated'] = True
            self._analysis['is_truncated_at'] = n

    # --------------------------------------------------------- significance
    @staticmethod
    def _progress_bar(n_runs, disable):
        """Per-batch progress callback (reference shows tqdm bars on its
        Monte-Carlo loops, xmca/array.py:1753,1891)."""
        try:
            from tqdm import tqdm
        except ImportError:
            return None, lambda: None
        bar = tqdm(total=n_runs, disable=disable)
        return bar.update, bar.close

    def rule_n(self, n_runs, n_modes=None, seed=None,
               disable_progress=False):
        """Apply *Rule N* (Overland & Preisendorfer 1982).

        Surrogate spectra are computed as a vmapped, optionally
        mesh-sharded device ensemble (xmca_tpu.stats.significance) instead
        of the reference's host loop (xmca/array.py:1753-1765).

        Returns an (n_modes, n_kept_runs) array like the reference.
        """
        m = self._n_observations
        n = self._n_variables
        if self._surrogate_dtype is not None:
            dtype = self._surrogate_dtype
        elif (self._ensemble_spectrum == 'fast'
                and jax.default_backend() == 'tpu'):
            # bfloat16 Gaussian draws on the TPU fast path: the MXU runs
            # the data-sized Gram in native single-pass mode (float32
            # accumulation); see set_solver(surrogate_dtype=...)
            dtype = np.dtype(jnp.bfloat16)
        else:
            lead = self._fields.get(self._keys[0])
            base = (lead.dtype if lead is not None
                    else ('float64' if jax.config.jax_enable_x64
                          else 'float32'))
            dtype = np.dtype(jnp.finfo(base).dtype)

        n_modes_fast = None
        if self._ensemble_spectrum == 'fast':
            slc = self._get_slice(n_modes)
            n_modes_fast = min(
                slc.stop, min(m.values()), min(n.values())
            )
        source = self._surrogate_source
        if source is None:
            # auto: cheap bit-transform draws on the TPU fast path
            # (mesh or not — the ensemble shards seed batches exactly
            # like key batches); CPU gains nothing from generation and
            # keeps exact Gaussian draws
            source = 'generated' if (
                self._ensemble_spectrum == 'fast'
                and jax.default_backend() == 'tpu'
            ) else 'draw'
        tol = self._ensemble_tol
        if tol is None:
            # auto: on the TPU generated-noise path a 1e-4 rotation
            # tolerance halves the per-run cost at a <0.3% q95 shift
            # (see set_solver(ensemble_tol)); elsewhere keep the
            # reference's 1e-8 — on CPU the batched lanes of a sharded
            # ensemble iterate until the SLOWEST lane converges, and a
            # loose stopping point leaves ~1% run-for-run wiggle that
            # the mesh-parity contract (sharded == unsharded, 1e-4)
            # must not absorb
            tol = 1e-4 if (source == 'generated'
                           and jax.default_backend() == 'tpu') else 1e-8
        # shorter fixed-count polar for loose-tolerance noise rotations:
        # at tol=1e-4 the criterion never needs the 30-step tail, and
        # noise criteria are well-conditioned (sigma/fro ~ k^-1/2)
        polar = 'ns14' if (source == 'generated' and tol >= 1e-4) \
            else 'ns'
        # auto: noise kernels have benign spectra — 6 subspace
        # iterations shift the null q95 by ~0.1% (50x below its own
        # Monte-Carlo noise; see set_solver(ensemble_subspace_iters))
        ens_iters = self._ensemble_subspace_iters
        if ens_iters is None:
            ens_iters = 6 if (source == 'generated'
                              and jax.default_backend() == 'tpu') \
                else self._subspace_iters
        progress, close = self._progress_bar(n_runs, disable_progress)
        try:
            spectra, totals = _sig.rule_n_spectra(
                m['left'], tuple(n[k] for k in self._keys), n_runs,
                complexify=self._analysis['is_complex'],
                rotated=self._analysis['is_rotated'],
                n_rot=self._analysis['n_rot'],
                power=max(1, self._analysis['power']),
                tol=tol, polar_method=polar,
                dtype=dtype, method=self._solver_method, seed=seed,
                batch_size=self._ensemble_batch_size,
                mesh=self._ensemble_mesh,
                ensemble_axis=self._ensemble_axis,
                spectrum=self._ensemble_spectrum,
                n_modes_fast=n_modes_fast,
                subspace_iters=ens_iters,
                surrogate_source=source,
                # auto dist: one random byte per +-1 element on the
                # TPU generated path — feeds the Pallas triangle-syrk
                # Gram; same null distribution as 'normal16' to <0.2%
                # q95 (see set_solver(surrogate_gen_dist)).
                # 'rademacher1' measured SLOWER end-to-end despite 8x
                # fewer generated bits (the bit expansion wrecks the
                # draw+Gram fusion layout).  'normal16' elsewhere for
                # exact three-moment matching.
                surrogate_dist=(self._surrogate_gen_dist
                                or ('rademacher8'
                                    if source == 'generated'
                                    and jax.default_backend() == 'tpu'
                                    else 'normal16')),
                progress=progress,
                runs_per_dispatch=self._ensemble_runs_per_dispatch,
            )
        finally:
            close()
        if spectra.shape[0] == 0:
            # every surrogate rotation was masked non-converged (the
            # reference silently `continue`s past these runs,
            # xmca/array.py:1759-1763 — but an EMPTY ensemble would
            # crash any quantile the caller takes on it)
            raise RuntimeError(
                'Rule N: all {:d} surrogate runs failed to converge; '
                'no null distribution available.  Try more runs, a '
                'looser set_solver(ensemble_tol=...), or fewer rotated '
                'modes.'.format(n_runs)
            )
        svals = spectra.T                        # (n_modes, n_runs)
        # Rule-N rescaling normalizes each surrogate's full-spectrum total
        # to the true analysis total.  After set_solver(truncate=k) the
        # materialized variance spans only the k kept modes, so its sum
        # underestimates the true-spectrum total; the exact total (nuclear
        # norm of the reduced kernel) stored at solve time is the right
        # scale for the unrotated case.  Rotated Rule-N compares rotated
        # n_rot-mode totals on both sides, where the materialized sum *is*
        # the correct reference.
        if (self._analysis['is_truncated']
                and not self._analysis['is_rotated']):
            ref_total = self._analysis['total_covariance']
        else:
            ref_total = self._get_variance().sum()
        svals = svals / (totals[None, :] / ref_total)
        n_modes = self._get_slice(n_modes)
        return svals[n_modes]

    def rule_north(self, n=None):
        """North's rule-of-thumb uncertainties of the singular values."""
        return _sig.rule_north_uncertainty(
            self._get_svals(n), self._n_observations['left'],
            self._analysis['is_complex'],
        )

    def bootstrapping(self, n_runs, n_modes=20, axis=0, on_left=True,
                      on_right=False, block_size=1, replace=True,
                      strategy='standard', disable_progress=False,
                      seed=None):
        """Monte-Carlo (moving-block) bootstrapping of the model.

        Parameters mirror the reference (xmca/array.py:1813-1952);
        ``strategy='iterative'`` implements the Winkler residual scheme.
        Each mode's run ensemble executes as one vmapped device batch.

        Deviation: every run independently resamples the original data;
        the reference resamples its own previous resample in place.
        """
        if strategy not in ('standard', 'iterative'):
            raise ValueError(
                "strategy must be 'standard' or 'iterative'"
            )
        complexify = self._analysis['is_complex']
        extend = self._analysis['extend']
        period = self._analysis['theta_period']
        is_rotated = self._analysis['is_rotated']
        n_rot = self._analysis['n_rot']
        power = max(1, self._analysis['power'])

        n_modes_max = self._get_min_mode(n_modes, rotated=True)
        var_surr = np.zeros([n_modes_max, n_runs])

        if seed is None:
            seed = int(np.random.randint(0, 2 ** 31 - 1))

        n_mode_iters = min(n_modes, n_modes_max)
        tol = self._ensemble_tol
        if tol is None:
            # auto: same Monte-Carlo argument as rule_n (the bootstrap
            # quantile cannot resolve rotation accuracy below its own
            # ~1/sqrt(2 N) noise); the CPU/mesh-parity default stays at
            # the reference's 1e-8.  Robustness on real-data criteria
            # comes from the convergence-gated polar, which bootstrap
            # keeps at any tolerance.
            tol = 1e-4 if jax.default_backend() == 'tpu' else 1e-8
        progress, close = self._progress_bar(
            n_runs * (1 if strategy == 'standard' else n_mode_iters),
            disable_progress,
        )
        try:
            self._bootstrap_modes(
                var_surr, n_mode_iters, n_runs, strategy, axis, on_left,
                on_right, block_size, replace, complexify, extend,
                period, is_rotated, n_rot, power, n_modes_max, seed,
                progress, tol,
            )
        finally:
            close()
        return var_surr

    def _bootstrap_modes(self, var_surr, n_mode_iters, n_runs, strategy,
                         axis, on_left, on_right, block_size, replace,
                         complexify, extend, period, is_rotated, n_rot,
                         power, n_modes_max, seed, progress, tol):
        if self._is_chunk_backed():
            return self._bootstrap_modes_streamed(
                var_surr, n_mode_iters, n_runs, strategy, axis, on_left,
                on_right, block_size, replace, complexify, is_rotated,
                n_rot, power, n_modes_max, seed, progress, tol,
            )
        for mode in range(n_mode_iters):
            X_surr = self._get_X_dev(real=True)
            if strategy == 'iterative':
                # deflate the leading modes entirely on device — the
                # reconstruction never exists on host (a full-field
                # round trip per mode would dominate the ensemble)
                for k in X_surr.keys():
                    X_surr[k] = _sub_dev(
                        X_surr[k], self._reconstructed_X_dev(k, mode)
                    )

            spectra, converged = _sig.bootstrap_spectra(
                [X_surr[k] for k in self._keys], n_runs,
                n_modes_max - mode,
                axis=axis, on_left=on_left, on_right=on_right,
                block_size=block_size, replace=replace,
                complexify=complexify, extend=extend, period=period,
                rotated=is_rotated, n_rot=n_rot, power=power, tol=tol,
                method=self._solver_method, seed=seed + mode,
                batch_size=self._ensemble_batch_size,
                mesh=self._ensemble_mesh,
                ensemble_axis=self._ensemble_axis,
                spectrum=self._ensemble_spectrum,
                subspace_iters=self._subspace_iters,
                progress=progress,
            )
            # reference semantics: non-converged rotations leave this
            # mode's rows untouched (skip), xmca/array.py:1939-1943
            var_surr[mode:, converged] = spectra[converged].T

            if strategy == 'standard':
                break

    def _bootstrap_modes_streamed(self, var_surr, n_mode_iters, n_runs,
                                  strategy, axis, on_left, on_right,
                                  block_size, replace, complexify,
                                  is_rotated, n_rot, power, n_modes_max,
                                  seed, progress, tol):
        """Chunk-backed bootstrap rounds: Gram-space resampling.

        The per-mode Winkler deflation stays in mode space —
        ``G_defl = G - B - B^T + S C S^T`` assembled from the
        solve-time score accumulators and the resident basis
        (xmca_tpu.stats.streaming_boot.deflated_gram) — so axis=0
        rounds need NO pass over the data at all (rotated rounds add
        one streamed projection pass per run batch); axis=1 rounds
        accumulate counts-weighted Grams in one pass per batch.
        """
        from xmca_tpu.stats.streaming_boot import (
            bootstrap_spectra_streamed, deflated_gram)
        if self._analysis['extend']:
            # Gram-space resampling cannot express the per-run
            # re-extension (resampled rows change every boundary
            # forecast, so the surrogate Gram is not index algebra on
            # the stored one) — it would need one full data pass per
            # run with per-chunk extend+complexify.  Documented
            # implementation choice, see PARITY.md.
            raise RuntimeError(
                'bootstrapping of chunk-backed models solved with '
                'boundary extension (extend=\'exp\'/\'theta\') is not '
                'supported: re-solve without extend, or use an '
                'in-memory model.'
            )
        weights, normalize = self._stream_transform()
        dtype = getattr(self, '_stream_dtype', np.dtype('float32'))
        grams = self._stream_grams
        pre = self._stream_scores_pre
        pool = self._analysis['n_rot']
        col_w, _ = self._rotation_weights(pool)
        inv_norm = self._get_norm(pool, sorted=False)

        for mode in range(n_mode_iters):
            deflate = None
            g_iter = grams
            if strategy == 'iterative' and mode > 0:
                deflate, g_iter = {}, {}
                for k in self._keys:
                    S, W = self._reconstruct_factors_dev(k, mode)
                    XcW = _loadings_kernel(
                        pre[k], col_w, self._rotation_dev(),
                        1.0 / inv_norm[k], self._var_idx, pool=pool,
                    )[:, :mode]
                    deflate[k] = (S, W, XcW)
                    g_iter[k] = deflated_gram(grams[k], XcW, S, W)

            spectra, converged = bootstrap_spectra_streamed(
                self._chunk_loaders, self._no_nan_index, g_iter,
                self._n_observations['left'], n_runs,
                n_modes_max - mode,
                weights=weights, normalize=normalize, axis=axis,
                on_left=on_left, on_right=on_right,
                block_size=block_size, replace=replace,
                complexify=complexify, rotated=is_rotated, n_rot=n_rot,
                power=power, tol=tol, seed=seed + mode,
                batch_size=self._ensemble_batch_size,
                subspace_iters=self._subspace_iters, dtype=dtype,
                deflate=deflate, mesh=self._ensemble_mesh,
                progress=progress,
            )
            var_surr[mode:, converged] = spectra[converged].T

            if strategy == 'standard':
                break

    # ----------------------------------------------------------- save/load
    def _get_analysis_path(self, path=None):
        if path is None:
            name_folder = '_'.join(self._field_names.values())
            name_folder = secure_str(name_folder)
            path = os.path.join(os.getcwd(), 'xmca', name_folder)
        elif not os.path.isabs(path):
            path = os.path.abspath(path)
        return path

    def _create_analysis_path(self, path):
        path = self._get_analysis_path(path)
        if not os.path.exists(path):
            os.makedirs(path)

    def _create_info_file(self, path):
        """Write the human-readable ``info.xmca`` manifest.

        Format parity with reference xmca/array.py:1629-1659 so analyses
        written by either library load in both.
        """
        sep_line = '\n#' + '-' * 79
        now = datetime.now().strftime("%Y-%m-%d %H:%M:%S")
        file_header = (
            'This file contains information neccessary to load stored '
            'analysisdata from xmca module.'
        )
        path_output = os.path.join(path, 'info.xmca')
        with open(path_output, 'w+') as file:
            file.write(wrap_str(file_header))
            file.write('\n# To load this analysis use:')
            file.write('\n# from xmca.xarray import xMCA')
            file.write('\n# mca = xMCA()')
            file.write('\n# mca.load_analysis(PATH_TO_THIS_FILE)')
            file.write('\n')
            file.write(sep_line)
            file.write(sep_line)
            file.write('\n{:<20} : {:<57}'.format('created', now))
            file.write(sep_line)
            for key, name in self._field_names.items():
                file.write('\n{:<20} : {:<57}'.format(key, str(name)))
            file.write(sep_line)
            for key, info in self._analysis.items():
                if key in [
                    'is_bivariate', 'is_complex', 'is_rotated',
                    'is_truncated'
                ]:
                    file.write(sep_line)
                file.write('\n{:<20} : {:<57}'.format(key, str(info)))

    def _get_file_names(self, format):
        fields = {}
        eofs = {}
        for key, variable in self._field_names.items():
            variable = secure_str(variable)
            fields[key] = '.'.join([variable, format])
            eofs[key] = '.'.join(['_'.join([variable, 'eofs']), format])
        return {
            'fields': fields,
            'eofs': eofs,
            'pcs': {},
            'singular': '.'.join(['singular_values', format]),
            'norm': {},
        }

    def _save_data(self, data_array, path, *args, **kwargs):
        raise NotImplementedError('only works for `xarray`')

    def _set_analysis(self, key, value):
        try:
            key_type = type(self._analysis[key])
        except KeyError:
            raise KeyError("Key `{}` not found in info file.".format(key))
        if key_type == bool:
            self._analysis[key] = (value == 'True')
        else:
            self._analysis[key] = key_type(value)

    def _set_info_from_file(self, path):
        with open(path, 'r') as info_file:
            for line in info_file.readlines():
                if line[0] != '#':
                    key = line.split(':')[0].rstrip()
                    if key in ['left', 'right']:
                        self._field_names[key] = (
                            line.split(':')[1].strip()
                        )
                    if key in self._analysis.keys():
                        self._set_analysis(key, line.split(':')[1].strip())

    def load_analysis(self, path, fields=None, eofs=None,
                      singular_values=None):
        """Rebuild a model saved with ``save_analysis``.

        Parity with reference xmca/array.py:1954-2012: normalization,
        complexification and rotation are *recomputed* from the stored
        fields/EOFs/singular values.
        """
        self._set_info_from_file(path)

        if self._analysis['is_bivariate']:
            self._keys = ['left', 'right']
        else:
            self._keys = ['left']

        self._set_field_meta(fields)
        fields = self._reshape_to_2d(fields)
        self._set_no_nan_idx(fields)
        fields = self._remove_nan_cols(fields)
        self._set_field_means(fields)
        self._set_field_stds(fields)

        self._fields = self._center(fields)

        if self._analysis['is_normalized']:
            self.normalize()
        if self._analysis['is_complex']:
            self._fields = {
                k: _pre.complexify(
                    f, extend=self._analysis['extend'],
                    period=self._analysis['theta_period'],
                )
                for k, f in self._fields.items()
            }

        self._V = {}
        self._norm = {}
        self._R_dev_cache = None
        self._singular_values = singular_values
        self._variance = singular_values
        self._var_idx = np.argsort(singular_values)[::-1]

        for key in self._keys:
            self._norm[key] = np.sqrt(singular_values)
            n_modes = eofs[key].shape[-1]
            eofs_2d = eofs[key].reshape(self._n_variables[key], n_modes)
            VT = remove_nan_cols(eofs_2d.T)
            self._V[key] = VT.T

        if self._analysis['is_rotated']:
            self.rotate(self._analysis['n_rot'], self._analysis['power'])

    # -------------------------------------------------------------- display
    def summary(self):
        """Print meta information of the performed analysis."""
        import yaml
        strings_only = {k: str(v) for k, v in self._analysis.items()}
        print(yaml.dump(
            strings_only, sort_keys=False, default_flow_style=False
        ))

    def plot(self, mode, threshold=0, phase_shift=0, cmap_eof=None,
             cmap_phase=None, figsize=(8.3, 5.0)):
        """Plot PCs/EOFs (and phase, if complex) for `mode`.

        Host-side matplotlib, mirroring reference xmca/array.py:1430-1574.
        """
        from xmca_tpu.viz.plot import plot_mca_mode
        return plot_mca_mode(
            self, mode, threshold=threshold, phase_shift=phase_shift,
            cmap_eof=cmap_eof, cmap_phase=cmap_phase, figsize=figsize,
        )

    def save_plot(self, mode, path=None, plot_kwargs={}, save_kwargs={}):
        """Create and save a plot of `mode` to disk."""
        import matplotlib.pyplot as plt
        if path is None:
            output = 'mode{:}.png'.format(mode)
        else:
            output = path
        self.plot(mode=mode, **plot_kwargs)
        fig = plt.gcf()
        fig.subplots_adjust(left=0.06)
        plt.savefig(output, **save_kwargs)
