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


@jax.jit
def _real_dev(x):
    """Real part, on device (eager complex ops fail on the axon TPU)."""
    return jnp.real(x)


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
        self._surrogate_gen_dist = 'normal16'

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
                   surrogate_gen_dist=None):
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
            ``ensemble_axis``.
        spectrum : {'exact', 'fast'}, optional
            Monte-Carlo surrogate spectrum algorithm.  'exact' uses dense
            factorizations (the default on CPU); 'fast' uses the
            matmul-only Cholesky-reduced kernel + subspace iteration +
            Newton-Schulz nuclear norm (xmca_tpu.core.fastpath) —
            accurate to ~1e-4 relative on the leading modes and the
            default on TPU.
        subspace_iters : int, optional
            Power-iteration count of the 'fast' spectrum path (default 12).
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
        surrogate_gen_dist : {'normal16', 'normal32', 'rademacher'},
            optional.  Draw distribution of generated surrogates.
            'normal16' (default) and 'normal32' are popcount-binomials
            matched to N(0, 1) in their first three moments (excess
            kurtosis -1/8 and -1/16; the 16-bit variant halves the
            generated random bits); 'rademacher' is +-1.  Null spectra are universal in the first two moments at
            these dimensions; equivalence to Gaussian draws is measured
            in tests/integration/test_significance.py.
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
                                          'rademacher'):
                raise ValueError(
                    "surrogate_gen_dist must be 'normal16', "
                    "'normal32' or 'rademacher'"
                )
            self._surrogate_gen_dist = surrogate_gen_dist

    def set_field_names(self, left='left', right='right'):
        """Set names of the left/right field, used in plots and save files."""
        self._field_names['left'] = left
        self._field_names['right'] = right

    # ------------------------------------------------------- slicing helper
    def _get_slice(self, input):
        """Create a slice from a 1-based int/slice mode spec.

        Parity with reference xmca/array.py:145-173.
        """
        if np.issubdtype(type(input), np.integer) or input is None:
            if input is None:
                input = self._analysis['rank']
            output = slice(0, input)
        elif isinstance(input, slice):
            try:
                new_start = max(0, input.start - 1)
            except TypeError:
                new_start = 0
            try:
                new_stop = min(input.stop, self._analysis['rank'])
            except TypeError:
                new_stop = self._analysis['rank']
            output = slice(new_start, new_stop, input.step)
        else:
            raise ValueError(
                'Invalid type {:}. Must be either int or slice.'
                .format(type(input))
            )
        return output

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
        matching reference xmca/array.py:317-349.
        """
        weights = {'left': left, 'right': right}
        weights = {k: 1 if w is None else w for k, w in weights.items()}
        self._fields = {
            k: f * jnp.asarray(np.asarray(weights[k]))
            for k, f in self._fields.items()
        }

    def normalize(self):
        """Normalize each time series by its standard deviation."""
        for k in self._keys:
            self._fields[k] = _pre.standardize(
                self._fields[k], jnp.asarray(self._field_stds[k])
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
    def _get_X(self, original_scale=False, real=False):
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
        jitted XLA.
        """
        if len(self._fields) == 0:
            raise RuntimeError(
                'Fields are empty. Did you forget to load data?'
            )
        if any(
            # device-side reduction; only a bool crosses to host (a direct
            # np.asarray of a complex device array fails on axon)
            bool(jnp.isnan(jnp.abs(field)).all())
            for field in self._fields.values()
        ):
            raise RuntimeError(
                'Fields are empty. Did you forget to load data?'
            )

        self._analysis['is_complex'] = complexify
        self._analysis['extend'] = extend
        self._analysis['theta_period'] = period

        if self._analysis['is_complex']:
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
        self._analysis['is_truncated_at'] = len(singular_values)

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

        s, Vl, Vr, total_cov, total_sq = _fast.fast_solve_truncated_totals(
            Xl, Xr, key, n_modes=k, n_iter=self._subspace_iters
        )
        # Vl/Vr stay on device (complex device->host transfers are split
        # and deferred to the lazy `_V` materialization); the two scalar
        # totals come back in ONE stacked transfer instead of two
        # round trips through the tunnel.
        Vs = [Vl]
        if len(fields) == 2:
            Vs.append(Vr)
        totals = np.asarray(jnp.stack([total_cov, total_sq]))
        return (np.asarray(s), Vs,
                (float(totals[0]), float(totals[1])))

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
        # vectors when solve left them there — the host round trip
        # (materialize + re-upload through a ~45 MB/s tunnel) costs more
        # than the rotation itself at production shapes.
        dev = getattr(self, '_V_dev', None)
        if dev is not None:
            n_vars_left = dev['left'].shape[0]
            L = jnp.concatenate(
                [dev[k][:, :n_rot] for k in self._keys], axis=0
            )
        else:
            V = self._get_V(n_rot, rotated=False)
            n_vars_left = V['left'].shape[0]
            L = _to_dev(np.concatenate([V[k] for k in self._keys]))
        L = L * jnp.asarray(
            sqrt_svals, dtype=jnp.finfo(L.dtype).dtype
        )
        L_rot, R, Phi, converged, _ = _promax1(
            L, power=int(power), max_iter=1000, tol=tol
        )
        # norms reduce on device; only two (n_rot,) vectors come home
        if self._analysis['is_bivariate']:
            norm_dev = jnp.stack([
                jnp.linalg.norm(L_rot[:n_vars_left, :], axis=0),
                jnp.linalg.norm(L_rot[n_vars_left:, :], axis=0),
            ])
        else:
            norm_dev = jnp.tile(
                jnp.linalg.norm(L_rot, axis=0)[None, :], (2, 1)
            )
        if not bool(converged):
            raise RuntimeError(
                'Rotation process did not converge. Try decreasing the '
                'tolerance. Invalid NaN entries also might be a problem.'
            )
        norm_np = np.asarray(norm_dev)
        norm = {'left': norm_np[0], 'right': norm_np[1]}

        variance = norm['left'] * norm['right']
        var_idx = np.argsort(variance)[::-1]

        self._norm = norm
        self._variance = variance
        self._var_idx = var_idx

        # one stacked transfer for the two (n_rot, n_rot) matrices —
        # each tunnel round trip costs ~30 ms
        RP = _to_np(jnp.stack([R, Phi]))
        self._rotation_matrix = RP[0]
        self._correlation_matrix = RP[1]
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
        modes = self._get_slice(n)
        try:
            norm = self._norm
        except AttributeError:
            raise RuntimeError(
                'Cannot retrieve field norms. '
                'Please call the method `solve` first.'
            )
        if sorted:
            idx = self._var_idx
            norm = {k: nrm[idx] for k, nrm in norm.items()}
        return {k: nrm[modes] for k, nrm in norm.items()}

    def _get_variance(self, n=None, sorted=True):
        norm = self._get_norm(n=n, sorted=sorted)
        if self._analysis['is_bivariate']:
            return norm['left'] * norm['right']
        return norm['left'] ** 2

    def _get_V(self, n=None, rotated=True):
        if rotated:
            max_mode = self._analysis['n_rot']
        else:
            max_mode = n.stop if isinstance(n, slice) else n

        keep_modes = self._get_slice(n)
        try:
            V = {k: v[:, :max_mode] for k, v in self._V.items()}
        except AttributeError:
            raise RuntimeError(
                'Cannot retrieve singular vectors. '
                'Please call the method `solve` first.'
            )

        for k in self._keys:
            if rotated:
                sqrt_svals = np.sqrt(self._get_svals(max_mode))
                norm = self._get_norm(max_mode, sorted=False)
                R = self.rotation_matrix()
                V[k] = V[k] * sqrt_svals @ R / norm[k]
                V[k] = V[k][:, self._var_idx]
            V[k] = V[k][:, keep_modes]
        return V

    def _get_U(self, n=None, rotated=True):
        if rotated:
            max_mode = self._analysis['n_rot']
        else:
            max_mode = n.stop if isinstance(n, slice) else n

        keep_modes = self._get_slice(n)
        dev = getattr(self, '_V_dev', None)
        V_host = None if dev is not None else self._get_V(
            max_mode, rotated=False
        )
        sqrt_svals = np.sqrt(self._get_svals(max_mode))
        R = self.rotation_matrix(inverse_transpose=True)

        U = {}
        for k in self._keys:
            # PC time series: one device matmul per field, consuming the
            # device-resident singular vectors when solve left them there
            if dev is not None:
                Vk = dev[k][:, :max_mode]
            else:
                Vk = _to_dev(V_host[k])
            Uk = _to_np(self._fields[k] @ Vk)
            Uk = Uk / sqrt_svals
            if rotated:
                Uk = Uk @ R
                Uk = Uk[:, self._var_idx]
            U[k] = Uk[:, keep_modes]
        return U

    def _get_eofs(self, n=None, scaling='None', phase_shift=0, rotated=True):
        V = self._get_V(n, rotated=rotated)
        n_var = self._n_variables
        no_nan_idx = self._no_nan_index
        field_shape = self._fields_spatial_shape
        eofs = {}

        for k in self._keys:
            n_modes = V[k].shape[1]
            out = np.zeros([n_var[k], n_modes], dtype=V[k].dtype) * np.nan
            out[no_nan_idx[k], :] = V[k]
            eof = out.reshape(field_shape[k] + (n_modes,))
            if self._analysis['is_complex']:
                eof = eof * cmath.rect(1, phase_shift)
            if scaling == 'None':
                pass
            elif scaling == 'eigen':
                n_max_mode = V['left'].shape[1]
                norm = self._get_norm(n_max_mode, sorted=True)
                eof = eof * norm[k]
            elif scaling == 'max':
                eof = eof / np.nanmax(abs(eof.real), axis=(0, 1))
            elif scaling == 'std':
                eof = eof / np.nanstd(eof.real, axis=(0, 1))
            else:
                raise ValueError(
                    'The scaling option {:} is not valid. Please choose '
                    'one of the following: None, eigen, std, max'
                    .format(scaling)
                )
            eofs[k] = eof
        return eofs

    def _get_pcs(self, n=None, scaling='None', phase_shift=0, rotated=True):
        U = self._get_U(n, rotated=rotated)
        for k in self._keys:
            if self._analysis['is_complex']:
                U[k] = U[k] * cmath.rect(1, phase_shift)
            if scaling == 'None':
                pass
            elif scaling == 'eigen':
                norm = self._get_norm(n, sorted=True)
                U[k] = U[k] * norm[k]
            elif scaling == 'max':
                U[k] = U[k] / np.nanmax(abs(U[k].real), axis=0)
            elif scaling == 'std':
                U[k] = U[k] / np.nanstd(U[k].real, axis=0)
            else:
                raise ValueError(
                    'The scaling option {:} is not valid. Please choose '
                    'one of the following: None, eigen, std, max'
                    .format(scaling)
                )
        return U

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
    def _pearsonr(self, x, y):
        """Pearson correlation of columns of x vs columns of y + p-values.

        Device-side matmul equivalent of the reference's
        ``np.corrcoef``-based helper (xmca/tools/array.py:76-88); p-values
        via the regularized incomplete beta function.
        """
        if x.shape[0] != y.shape[0]:
            raise ValueError('Time dimensions are different.')
        n = x.shape[0]
        xc = x - x.mean(axis=0)
        yc = y - y.mean(axis=0)
        xn = np.linalg.norm(xc, axis=0)
        yn = np.linalg.norm(yc, axis=0)
        r = _to_np(jnp.asarray(xc).T @ jnp.asarray(yc))
        r = r / np.outer(xn, yn)
        # two-sided p-value: 2 * BetaCDF(-|r|; a=b=n/2-1, loc=-1, scale=2)
        from scipy.special import betainc
        a = n / 2.0 - 1.0
        p = 2 * betainc(a, a, np.clip((1.0 - np.abs(r)) / 2.0, 0, 1))
        return r, p

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

    def homogeneous_patterns(self, n=None, phase_shift=0):
        """Correlation maps of each field with its own PCs (+ p-values)."""
        pcs = self._get_pcs(n=n, phase_shift=phase_shift)
        Xraw = self._get_X(real=True)
        r, p = {}, {}
        for key in self._keys:
            r[key], p[key] = self._pearsonr(Xraw[key], pcs[key].real)
        return self._scatter_to_grid(r), self._scatter_to_grid(p)

    def heterogeneous_patterns(self, n=None, phase_shift=0):
        """Correlation maps of each field with the *other* field's PCs."""
        pcs = self._get_pcs(n=n, phase_shift=phase_shift)
        Xraw = self._get_X(real=True)
        reverse = dict(zip(self._keys, self._keys[::-1]))
        r, p = {}, {}
        for key in self._keys:
            try:
                r[key], p[key] = self._pearsonr(
                    Xraw[key], pcs[reverse[key]].real
                )
            except KeyError:
                raise KeyError(
                    'Key not found. Two fields needed for heterogenous maps.'
                )
        return self._scatter_to_grid(r), self._scatter_to_grid(p)

    # ------------------------------------------------------- reconstruction
    def _reconstructed_X(self, mode=None, original_scale=True):
        V = self._get_V(n=mode, rotated=True)
        U = self._get_pcs(n=mode, scaling='eigen', rotated=True)
        Xrec = {}
        for loc in self._keys:
            rec = _to_np(
                _to_dev(U[loc]) @ _to_dev(V[loc]).conj().T
            )
            Xrec[loc] = rec.real
        if original_scale:
            Xrec = self._scale_X_inverse(Xrec)
        return Xrec

    def _reconstructed_fields(self, mode=None, original_scale=True):
        Xrec = self._reconstructed_X(mode=mode, original_scale=original_scale)
        n_obs = self._n_observations['left']
        for k in list(Xrec.keys()):
            rec = np.zeros((n_obs, self._n_variables[k])) * np.nan
            rec[:, self._no_nan_index[k]] = Xrec[k]
            Xrec[k] = rec.reshape((-1,) + self._fields_spatial_shape[k])
        return Xrec

    def reconstructed_fields(self, mode=None, original_scale=True):
        """Reconstruct input fields from a subset of modes."""
        return self._reconstructed_fields(
            mode=mode, original_scale=original_scale
        )

    # ----------------------------------------------------------- prediction
    def predict(self, left=None, right=None, n=None, scaling='None',
                phase_shift=0):
        """Project new data onto the singular vectors to predict their PCs.

        Parity with reference xmca/array.py:1299-1428 (including rotation
        and variance reordering of the projected PCs).
        """
        keys = self._keys
        data = [left, right]
        data_new = {
            k: d.copy() for k, d in zip(keys, data) if d is not None
        }

        shape = self._shape
        n_vars = self._n_variables
        no_nan_idx = self._no_nan_index
        fields_mean = self._field_means

        V = self._get_V(rotated=False)
        sqrt_svals = np.sqrt(self._get_svals())
        R = self.rotation_matrix(inverse_transpose=True)
        n_rot = R.shape[0]
        var_idx = self._var_idx
        if n is None:
            n = R.shape[0]

        pcs_new = {}
        for k, x_new in data_new.items():
            try:
                x_new = x_new.reshape(x_new.shape[0], n_vars[k])
                x_new = x_new[:, no_nan_idx[k]]
            except ValueError as err:
                if len(x_new.shape) != len(shape[k]):
                    msg = (
                        'Error in {:} field. Dimension of new data ({:}) '
                        'and the original field ({:}) do not match. '
                        'Did you forget the time dimension?'
                    ).format(k, len(x_new.shape), len(shape[k]))
                elif x_new.shape[1:] != fields_mean[k].shape:
                    msg = (
                        'Error in {:} field. Spatial dimensions of new '
                        'data {:} and the original field {:} do not match.'
                    ).format(k, x_new.shape[1:], shape[k][1:])
                else:
                    msg = 'Dimension mismatch in {:} field.'.format(k)
                raise ValueError(msg) from err
            try:
                x_new = self._scale_X({k: x_new})[k]
            except ValueError as err:
                raise ValueError(
                    'Error in {:} field. Spatial dimensions of new data '
                    '{:} and the original field {:} do not match.'
                    .format(k, x_new.shape[1:], fields_mean[k].shape)
                ) from err

            pcs = _to_np(
                _to_dev(x_new) @ _to_dev(V[k][:, :n_rot])
            ) / sqrt_svals[:n_rot]
            pcs = pcs @ R
            pcs = pcs[:, var_idx]
            pcs = pcs[:, :n]

            if self._analysis['is_complex']:
                pcs = pcs * cmath.rect(1, phase_shift)
            if scaling == 'None':
                pass
            elif scaling == 'eigen':
                norm = self._get_norm(n, sorted=True)
                pcs = pcs * norm[k]
            elif scaling == 'max':
                original_pcs = self._get_pcs(n, 'None', phase_shift)
                pcs = pcs / np.nanmax(abs(original_pcs[k].real), axis=0)
            elif scaling == 'std':
                original_pcs = self._get_pcs(n, 'None', phase_shift)
                pcs = pcs / np.nanstd(original_pcs[k].real, axis=0)
            else:
                raise ValueError(
                    'The scaling option {:} is not valid. Please choose '
                    'one of the following: None, eigen, std, max'
                    .format(scaling)
                )
            pcs_new[k] = pcs
        return pcs_new

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
            dtype = np.dtype(
                jnp.finfo(self._fields[self._keys[0]].dtype).dtype
            )

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
        progress, close = self._progress_bar(n_runs, disable_progress)
        try:
            spectra, totals = _sig.rule_n_spectra(
                m['left'], tuple(n[k] for k in self._keys), n_runs,
                complexify=self._analysis['is_complex'],
                rotated=self._analysis['is_rotated'],
                n_rot=self._analysis['n_rot'],
                power=max(1, self._analysis['power']),
                dtype=dtype, method=self._solver_method, seed=seed,
                batch_size=self._ensemble_batch_size,
                mesh=self._ensemble_mesh,
                ensemble_axis=self._ensemble_axis,
                spectrum=self._ensemble_spectrum,
                n_modes_fast=n_modes_fast,
                subspace_iters=self._subspace_iters,
                surrogate_source=source,
                surrogate_dist=self._surrogate_gen_dist,
                progress=progress,
            )
        finally:
            close()
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
        progress, close = self._progress_bar(
            n_runs * (1 if strategy == 'standard' else n_mode_iters),
            disable_progress,
        )
        try:
            self._bootstrap_modes(
                var_surr, n_mode_iters, n_runs, strategy, axis, on_left,
                on_right, block_size, replace, complexify, extend,
                period, is_rotated, n_rot, power, n_modes_max, seed,
                progress,
            )
        finally:
            close()
        return var_surr

    def _bootstrap_modes(self, var_surr, n_mode_iters, n_runs, strategy,
                         axis, on_left, on_right, block_size, replace,
                         complexify, extend, period, is_rotated, n_rot,
                         power, n_modes_max, seed, progress):
        for mode in range(n_mode_iters):
            X_surr = self._get_X_dev(real=True)
            if strategy == 'iterative':
                X_rec = self._reconstructed_X(
                    mode=mode, original_scale=False
                )
                for k in X_surr.keys():
                    # one upload per MODE (reused by every run's dispatch)
                    X_surr[k] = X_surr[k] - jnp.asarray(
                        np.real(X_rec[k])
                    )

            spectra, converged = _sig.bootstrap_spectra(
                [X_surr[k] for k in self._keys], n_runs,
                n_modes_max - mode,
                axis=axis, on_left=on_left, on_right=on_right,
                block_size=block_size, replace=replace,
                complexify=complexify, extend=extend, period=period,
                rotated=is_rotated, n_rot=n_rot, power=power,
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
