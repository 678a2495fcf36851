"""``xMCA`` — the labeled-array (xarray) model class.

Method-for-method re-implementation of the reference's ``xmca.xarray.xMCA``
(xmca/xarray.py:23-1488): a thin adapter over :class:`xmca_tpu.api.array.MCA`
that captures dims/coords on ingestion, re-wraps every result in labeled
DataArrays with a 1-based ``mode`` coordinate and the analysis metadata in
``attrs``, adds cos-latitude area weighting, netCDF persistence and map
plotting.  Works with real xarray when installed, else with
:mod:`xmca_tpu.compat.xarray_lite` (same subset API).

Intentional deviations (noted at the methods): ``bootstrapping`` honors its
``axis`` argument (the reference wrapper silently forces ``axis=0``,
xmca/xarray.py:1419); ``_scale_X`` applies normalize/coslat per field.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp

from xmca_tpu.api.array import MCA
from xmca_tpu.compat import xr, open_dataarray
from xmca_tpu.utils.text import secure_str


@jax.jit
def _scale_columns_dev(field, cols):
    """Per-column multiply on device (jitted: complex-safe on axon)."""
    return field * cols


def _is_dataarray(obj):
    try:
        import xarray as _real_xr
        if isinstance(obj, _real_xr.DataArray):
            return True
    except ImportError:
        pass
    from xmca_tpu.compat.xarray_lite import DataArray as _LiteDA
    return isinstance(obj, _LiteDA)


class xMCA(MCA):
    """Perform MCA on two ``xarray.DataArray`` (or compat) fields.

    MCA is a more general form of Principal Component Analysis (PCA)
    for two input fields (left, right).  If only one field is provided,
    MCA reduces to PCA.
    """

    def __init__(self, *fields):
        """Load labeled data fields and capture their dims/coords.

        Parity with reference xmca/xarray.py:31-86; spatial dims are
        expected to be named ``lat``/``lon`` and the leading dim ``time``.
        """
        if len(fields) > 2:
            raise ValueError("Too many fields. Pass 1 or 2 fields.")

        if not all(_is_dataarray(f) for f in fields):
            raise TypeError(
                'One or more fields are not `xarray.DataArray`. '
                'Please provide `xarray.DataArray` only.'
            )

        keys = ['left', 'right']
        fields = {keys[i]: field for i, field in enumerate(fields)}

        self._field_dims = {}
        self._field_coords = {}
        for key, field in fields.items():
            self._field_dims[key] = field.dims
            self._field_coords[key] = field.coords

        fields = {key: np.asarray(field.values)
                  for key, field in fields.items()}
        super().__init__(*fields.values())

    @classmethod
    def from_chunks(cls, left, right=None, *, coords, right_coords=None,
                    dims=('time', 'lat', 'lon')):
        """Build a chunk-backed (out-of-core) labeled model.

        ``left``/``right`` are chunk loaders as in
        :meth:`xmca_tpu.array.MCA.from_chunks`; ``coords`` (and
        ``right_coords`` when the grids differ) map every dim in
        ``dims`` to its coordinate values — the field shapes follow
        from the coordinate lengths.  Results wrap into labeled
        DataArrays exactly like the in-memory constructor's.
        """
        rcoords = coords if right_coords is None else right_coords
        spatial = tuple(dims[1:])
        model = super().from_chunks(
            left, right,
            n_observations=int(np.asarray(coords[dims[0]]).size),
            left_shape=tuple(
                int(np.asarray(coords[d]).size) for d in spatial
            ),
            right_shape=tuple(
                int(np.asarray(rcoords[d]).size) for d in spatial
            ) if right is not None else None,
        )
        model._field_dims = {}
        model._field_coords = {}
        for key, c in (('left', coords), ('right', rcoords)):
            if key in model._keys:
                model._field_dims[key] = tuple(dims)
                model._field_coords[key] = {
                    d: np.asarray(c[d]) for d in dims
                }
        return model

    # ------------------------------------------------------------- scaling
    def _coslat_weights_full(self, k):
        """sqrt(cos(lat)) weights on the FULL grid of field `k`,
        flattened."""
        lat = self._field_coords[k]['lat']
        # chunk-backed models store plain ndarrays for coords
        lat = np.asarray(getattr(lat, 'values', lat), dtype=np.float64)
        coslat = np.sqrt(np.cos(np.deg2rad(lat)))
        weights = np.ones(self._fields_spatial_shape[k]) \
            * coslat.reshape(coslat.size, 1)
        return weights.flatten()

    def _coslat_weights(self, k):
        """sqrt(cos(lat)) weights on the packed columns of field `k`."""
        return self._coslat_weights_full(k)[self._no_nan_index[k]]

    def _stream_inverse_colmul(self, key):
        """The coslat inverse the streamed ``original_scale`` undoes
        (mirrors `_scale_X_inverse`'s first factor)."""
        if self._analysis['is_coslat_corrected']:
            return 1.0 / self._coslat_weights_full(key)
        return None

    def _scale_X(self, data_dict):
        """Center / normalize / coslat-weight new data, per field.

        The reference's multi-field loop-scope bug (xmca/xarray.py:97-108)
        is not reproduced; its public API only ever passes single-field
        dicts, where both versions agree.
        """
        scaled = {}
        for k, field in data_dict.items():
            field = field - self._field_means[k]
            if self._analysis['is_normalized']:
                field = field / self._field_stds[k]
            if self._analysis['is_coslat_corrected']:
                field = field * self._coslat_weights(k)
            scaled[k] = field
        return scaled

    def _scale_X_inverse(self, data_dict):
        scaled = {}
        for k, field in data_dict.items():
            if self._analysis['is_coslat_corrected']:
                field = field / self._coslat_weights(k)
            if self._analysis['is_normalized']:
                field = field * self._field_stds[k]
            field = field + self._field_means[k]
            scaled[k] = field
        return scaled

    def _inverse_scale_vectors(self, key):
        """Adds the coslat un-weighting to the base per-column inverse
        (same ordering as `_scale_X_inverse`; all factors commute)."""
        colmul, coladd = super()._inverse_scale_vectors(key)
        if self._analysis['is_coslat_corrected']:
            inv_w = 1.0 / self._coslat_weights(key)
            colmul = inv_w if colmul is None else colmul * inv_w
        return colmul, coladd

    # ----------------------------------------------------------- weighting
    def _weight_columns(self, k, weight):
        """Evaluate a weight on field `k`'s spatial grid and pack it
        onto the kept (non-NaN) columns.

        The broadcast runs against a tiny host-side template carrying
        the field's spatial dims/coords (so DataArray weights align
        exactly as they would against the full field).  Returns None
        when the weight does not reduce to a purely spatial vector
        (e.g. time-varying) — the caller then falls back to the
        materialize-and-repack path.
        """
        spatial_dims = tuple(self._field_dims[k][1:])
        coords = {
            d: self._field_coords[k][d]
            for d in spatial_dims if d in self._field_coords[k]
        }
        template = xr.DataArray(
            np.ones(self._fields_spatial_shape[k]),
            dims=spatial_dims, coords=coords,
        )
        try:
            w = np.asarray((template * weight).values)
        except Exception:
            return None
        if w.shape != tuple(self._fields_spatial_shape[k]):
            # xarray coordinate alignment (inner join) can *shrink* a
            # DataArray weight to a subset of the grid; broadcasting
            # the survivor would silently tile wrong weights across
            # the field.  The reference raises for such inputs
            # (its full-field multiply then fails to reshape,
            # xmca/xarray.py) — fall back to the host path, which
            # reproduces exactly that behavior.  Plain-array weights
            # never land here: multiplying by the full-shape template
            # already numpy-broadcasts them to the full grid.
            return None
        return w.reshape(-1)[self._no_nan_index[k]]

    def _apply_weights_host(self, k, weight):
        """Fallback for weights that are not a per-column spatial
        vector: materialize the field, broadcast, re-pack, re-upload
        (the reference's semantics, at the reference's cost)."""
        field = self.fields()[k]
        new_field = (field * weight).data
        try:
            new_field = new_field.reshape(
                self._n_observations[k], self._n_variables[k]
            )
            new_field = new_field[:, self._no_nan_index[k]]
        except ValueError as err:
            raise ValueError(
                'Error for {:} weights. Mismatch between dimensions '
                'of weights ({:}) and original field ({:}).'
                .format(k, np.shape(weight), field.shape)
            ) from err
        self._fields[k] = jnp.asarray(new_field)

    def _weight_grid(self, k, weight):
        """Evaluate a weight on field `k`'s FULL spatial grid (no
        packing) — the chunk-backed weighting path: streamed chunks
        carry the full spatial width, so per-column weights must too."""
        spatial_dims = tuple(self._field_dims[k][1:])
        coords = {
            d: self._field_coords[k][d]
            for d in spatial_dims if d in self._field_coords[k]
        }
        template = xr.DataArray(
            np.ones(self._fields_spatial_shape[k]),
            dims=spatial_dims, coords=coords,
        )
        try:
            w = np.asarray((template * weight).values)
        except Exception:
            w = None
        if w is None or w.shape != tuple(self._fields_spatial_shape[k]):
            raise ValueError(
                'chunk-backed models support spatial (per-column) '
                'weights only: weights for the {:} field must '
                'broadcast to the spatial shape {:}.'.format(
                    k, self._fields_spatial_shape[k]
                )
            )
        return w

    def apply_weights(self, **weights):
        """Multiply fields by (dim-broadcast) DataArray weights.

        The weight is evaluated on the spatial grid host-side (tiny),
        packed onto the kept columns, and applied to the device-resident
        field under jit — the full field never round-trips through the
        host (at north-star scale that transfer alone costs ~70 s over
        a tunneled TPU link; the device multiply is microseconds).
        On chunk-backed models the full-grid weight is recorded and
        applied per chunk inside every streamed pass.
        """
        if self._is_chunk_backed():
            for k, weight in weights.items():
                if k not in self._keys:
                    raise KeyError(
                        'Key `{:}` not found. Please use `left` or '
                        '`right`'.format(k)
                    )
                MCA.apply_weights(
                    self, **{k: self._weight_grid(k, weight)}
                )
            return
        for k, weight in weights.items():
            if k not in self._fields:
                raise KeyError(
                    'Key `{:}` not found. Please use `left` or `right`'
                    .format(k)
                )
            cols = self._weight_columns(k, weight)
            if cols is None:
                # rare host fallback: re-arm solve's all-NaN guard
                # unconditionally rather than scan the full field
                self._nan_guard_dirty = True
                self._apply_weights_host(k, weight)
            else:
                self._note_possible_nan([cols])
                self._fields[k] = _scale_columns_dev(
                    self._fields[k], jnp.asarray(cols)
                )

    def apply_coslat(self):
        """Apply sqrt(cos(latitude)) area weighting (reference
        xmca/xarray.py:167-181)."""
        coords = self._field_coords
        weights = {}
        for key in self._keys:
            epsilon = 1e-6
            lat = coords[key]['lat']
            if not _is_dataarray(lat):
                # chunk-backed coords are plain ndarrays; label the
                # weight so it broadcasts along the lat dim (a bare
                # (n_lat,) vector would broadcast positionally along
                # the LAST spatial axis)
                lat = xr.DataArray(np.asarray(lat), dims=('lat',))
            weights[key] = np.sqrt(np.cos(np.deg2rad(lat)) + epsilon)
        self.apply_weights(**weights)
        self._analysis['is_coslat_corrected'] = True

    # ----------------------------------------------------- wrapped getters
    def _attrs(self):
        return {k: str(v) for k, v in self._analysis.items()}

    def _mode_coord(self, n, length):
        slc = self._get_slice(n)
        return list(range(slc.start + 1, slc.stop + 1))[:length]

    def _wrap_modes(self, values, n, name):
        return xr.DataArray(
            values, dims=['mode'],
            coords={'mode': self._mode_coord(n, len(values))},
            name=name, attrs=self._attrs(),
        )

    def _wrap_temporal(self, key, values, n, name):
        return xr.DataArray(
            values, dims=['time', 'mode'],
            coords={
                'time': self._field_coords[key]['time'],
                'mode': self._mode_coord(n, values.shape[-1]),
            },
            name=name, attrs=self._attrs(),
        )

    def _wrap_spatial(self, key, values, n, name):
        coords = self._field_coords[key]
        return xr.DataArray(
            values, dims=['lat', 'lon', 'mode'],
            coords={
                'lon': coords['lon'],
                'lat': coords['lat'],
                'mode': self._mode_coord(n, values.shape[-1]),
            },
            name=name, attrs=self._attrs(),
        )

    def fields(self, original_scale=False):
        """Return the input fields as labeled DataArrays."""
        fields = super().fields(original_scale)
        for k in self._keys:
            fields[k] = xr.DataArray(
                fields[k], dims=self._field_dims[k],
                coords=self._field_coords[k], name=self._field_names[k],
            )
        return fields

    def singular_values(self, n=None):
        """Return the first `n` singular values."""
        values = super().singular_values(n)
        return self._wrap_modes(values, n, 'singular values')

    def norm(self, n=None, sorted=True):
        """L2 norm of the first `n` singular vectors per field."""
        norms = super().norm(n=n, sorted=sorted)
        return {
            k: self._wrap_modes(
                data, n, ' '.join([self._field_names[k], 'norm'])
            )
            for k, data in norms.items()
        }

    def variance(self, n=None, sorted=True):
        """Variance of the first `n` singular vectors."""
        var = super().variance(n=n, sorted=sorted)
        return self._wrap_modes(var, n, 'variance')

    def explained_variance(self, n=None):
        """Covariance fraction (%) of the first `n` modes."""
        expvar = super().explained_variance(n)
        return self._wrap_modes(expvar, n, 'covariance fraction')

    def scf(self, n=None):
        """Squared covariance fraction (%) of the first `n` modes."""
        variance = super().scf(n)
        return self._wrap_modes(
            variance, n, 'squared covariance fraction'
        )

    def pcs(self, n=None, scaling='None', phase_shift=0, rotated=True):
        """First `n` PCs as ('time', 'mode') DataArrays."""
        pcs = super().pcs(n, scaling, phase_shift, rotated)
        return {
            k: self._wrap_temporal(
                k, pc, n, ' '.join([self._field_names[k], 'pcs'])
            )
            for k, pc in pcs.items()
        }

    def eofs(self, n=None, scaling='None', phase_shift=0, rotated=True):
        """First `n` EOFs as ('lat', 'lon', 'mode') DataArrays."""
        eofs = super().eofs(n, scaling, phase_shift, rotated)
        return {
            k: self._wrap_spatial(
                k, eof, n, ' '.join([self._field_names[k], 'eofs'])
            )
            for k, eof in eofs.items()
        }

    def spatial_amplitude(self, n=None, scaling='None', rotated=True):
        """Spatial amplitude fields of the first `n` EOFs."""
        amps = super().spatial_amplitude(n, scaling, rotated)
        return {
            k: self._wrap_spatial(
                k, amp, n,
                ' '.join([self._field_names[k], 'spatial amplitude'])
            )
            for k, amp in amps.items()
        }

    def spatial_phase(self, n=None, phase_shift=0, rotated=True):
        """Spatial phase fields of the first `n` EOFs."""
        phases = super().spatial_phase(
            n, phase_shift=phase_shift, rotated=rotated
        )
        return {
            k: self._wrap_spatial(
                k, pha, n,
                ' '.join([self._field_names[k], 'spatial phase'])
            )
            for k, pha in phases.items()
        }

    def temporal_amplitude(self, n=None, scaling='None', rotated=True):
        """Temporal amplitude series of the first `n` PCs."""
        amps = super().temporal_amplitude(n, scaling, rotated)
        return {
            k: self._wrap_temporal(
                k, amp, n,
                ' '.join([self._field_names[k], 'temporal amplitude'])
            )
            for k, amp in amps.items()
        }

    def temporal_phase(self, n=None, phase_shift=0, rotated=True):
        """Temporal phase series of the first `n` PCs."""
        phases = super().temporal_phase(
            n, phase_shift=phase_shift, rotated=rotated
        )
        return {
            k: self._wrap_temporal(
                k, pha, n,
                ' '.join([self._field_names[k], 'temporal phase'])
            )
            for k, pha in phases.items()
        }

    def homogeneous_patterns(self, n=None, phase_shift=0):
        """Homogeneous correlation maps + p-values as DataArrays."""
        hom_pats, pvals = super().homogeneous_patterns(
            n=n, phase_shift=phase_shift
        )
        names = self._field_names
        for key in self._keys:
            hom_pats[key] = self._wrap_spatial(
                key, hom_pats[key], n,
                ' '.join([names[key], 'homogeneous patterns'])
            )
            pvals[key] = self._wrap_spatial(
                key, pvals[key], n,
                ' '.join([names[key], 'pvalues homogeneous patterns'])
            )
        return hom_pats, pvals

    def heterogeneous_patterns(self, n=None, phase_shift=0):
        """Heterogeneous correlation maps + p-values as DataArrays."""
        het_pats, pvals = super().heterogeneous_patterns(
            n=n, phase_shift=phase_shift
        )
        names = self._field_names
        for key in self._keys:
            het_pats[key] = self._wrap_spatial(
                key, het_pats[key], n,
                ' '.join([names[key], 'heterogeneous patterns'])
            )
            pvals[key] = self._wrap_spatial(
                key, pvals[key], n,
                ' '.join([names[key], 'pvalues heterogeneous patterns'])
            )
        return het_pats, pvals

    def reconstructed_fields(self, mode=slice(1, None),
                             original_scale=True):
        """Reconstruct the original input fields from selected modes."""
        rec_fields = super().reconstructed_fields(
            mode=mode, original_scale=original_scale
        )
        for key in self._keys:
            rec_fields[key] = xr.DataArray(
                rec_fields[key], dims=self._field_dims[key],
                coords=self._field_coords[key],
                name='reconstructed_{:}_field'.format(key),
            )
        return rec_fields

    def predict(self, left=None, right=None, n=None, scaling='None',
                phase_shift=0):
        """Predict PCs of new labeled data by projection."""
        keys = self._keys
        data = [left, right]
        try:
            values = {
                k: d if d is None else np.asarray(d.values)
                for k, d in zip(keys, data)
            }
        except AttributeError as err:
            raise ValueError(
                'Please provide `xr.DataArray` to `left` and `right`'
            ) from err

        if self._analysis['is_bivariate']:
            pcs_new = super().predict(
                values['left'], values['right'], n, scaling, phase_shift
            )
        else:
            pcs_new = super().predict(
                values['left'], None, n, scaling, phase_shift
            )

        coords = {
            k: {
                'time': d.coords['time'],
                'mode': list(range(1, pcs_new[k].shape[1] + 1)),
            }
            for k, d in zip(keys, data) if d is not None
        }
        for k, pc in pcs_new.items():
            pcs_new[k] = xr.DataArray(
                pc, dims=('time', 'mode'), coords=coords[k]
            )
        return pcs_new

    # --------------------------------------------------------- significance
    def rule_n(self, n_runs, n_modes=None, seed=None,
               disable_progress=False):
        """Rule-N surrogate spectra as a ('mode', 'run') DataArray."""
        svals = super().rule_n(
            n_runs, n_modes, seed=seed, disable_progress=disable_progress
        )
        slc = self._get_slice(n_modes)
        modes = list(range(slc.start + 1, slc.stop + 1))[:svals.shape[0]]
        return xr.DataArray(
            svals, dims=['mode', 'run'],
            coords={
                'mode': modes,
                'run': np.arange(1, svals.shape[1] + 1),
            },
            name='singular values',
        )

    def rule_north(self, n=None):
        """North's rule-of-thumb uncertainties as a DataArray."""
        uncertainties = super().rule_north(n=n)
        return xr.DataArray(
            uncertainties, dims=['mode'],
            coords={'mode': self._mode_coord(n, len(uncertainties))},
            attrs=self._attrs(), name='singular values',
        )

    def bootstrapping(self, n_runs, n_modes=20, axis=0, on_left=True,
                      on_right=False, block_size=1, replace=True,
                      strategy='standard', disable_progress=False,
                      seed=None):
        """Bootstrap surrogate spectra as a ('mode', 'run') DataArray.

        Note: the reference wrapper discards the ``axis`` argument and
        always resamples along time (xmca/xarray.py:1419); here the
        argument is honored.
        """
        surr_svals = super().bootstrapping(
            n_runs=n_runs, n_modes=n_modes, axis=axis,
            on_left=on_left, on_right=on_right, block_size=block_size,
            replace=replace, strategy=strategy,
            disable_progress=disable_progress, seed=seed,
        )
        slc = self._get_slice(n_modes)
        modes = list(range(slc.start + 1, slc.stop + 1))
        modes = modes[:surr_svals.shape[0]]
        return xr.DataArray(
            surr_svals, dims=['mode', 'run'],
            coords={
                'mode': modes,
                'run': list(range(1, surr_svals.shape[1] + 1)),
            },
            name='singular values', attrs=self._attrs(),
        )

    # ------------------------------------------------------------ save/load
    def _save_data(self, data, path, engine='h5netcdf', *args, **kwargs):
        file_name = secure_str('.'.join([data.name, 'nc']))
        output_path = os.path.join(path, file_name)
        try:
            invalid_netcdf = engine == 'h5netcdf'
            data.to_netcdf(
                path=output_path, engine=engine,
                invalid_netcdf=invalid_netcdf, *args, **kwargs
            )
        except (ImportError, ValueError):
            # no h5netcdf/netcdf4 backend — use the built-in h5py writer
            from xmca_tpu.compat.xarray_lite import DataArray as LiteDA
            LiteDA(
                np.asarray(data.values),
                dims=data.dims,
                coords={
                    d: np.asarray(data.coords[d].values)
                    for d in data.dims if d in data.coords
                },
                name=data.name,
                attrs=dict(data.attrs),
            ).to_netcdf(output_path)

    def save_analysis(self, path=None, engine='h5netcdf'):
        """Save the analysis: ``info.xmca`` manifest + netCDF artifacts.

        File layout parity with reference xmca/xarray.py:1253-1279:
        singular values, per-field unrotated EOFs, per-field original-scale
        (real-part) input fields.

        Chunk-backed (out-of-core) models save too: the streamed
        ``fields()`` pass re-reads the loaders once and the written
        files are full-size (the reference's on-disk format stores the
        fields themselves) — ``load_analysis`` then restores a resident
        model.
        """
        analysis_path = self._get_analysis_path(path)
        self._create_analysis_path(analysis_path)
        self._create_info_file(analysis_path)

        fields = self.fields(original_scale=True)
        eofs = self.eofs(rotated=False)
        singular_values = self.singular_values()

        self._save_data(singular_values, analysis_path, engine)
        for key in self._keys:
            self._save_data(eofs[key], analysis_path, engine)
            # complex parts are cheaply recomputed on load
            self._save_data(fields[key].real, analysis_path, engine)

    def load_analysis(self, path, engine='h5netcdf'):
        """Load an analysis saved by :meth:`save_analysis` (either by this
        library or by the reference — same file format)."""
        self._set_info_from_file(path)
        path_folder, _ = os.path.split(path)
        file_names = self._get_file_names(format='nc')

        path_eigen = os.path.join(path_folder, file_names['singular'])
        singular_values = np.asarray(
            open_dataarray(path_eigen, engine=engine).data
        )

        keys = (['left', 'right'] if self._analysis['is_bivariate']
                else ['left'])
        fields = {}
        eofs = {}
        self._field_coords = {}
        self._field_dims = {}
        for key in keys:
            path_fields = os.path.join(
                path_folder, file_names['fields'][key]
            )
            path_eofs = os.path.join(path_folder, file_names['eofs'][key])
            eofs[key] = np.asarray(
                open_dataarray(path_eofs, engine=engine).data
            )
            da = open_dataarray(path_fields, engine=engine)
            self._field_coords[key] = da.coords
            self._field_dims[key] = da.dims
            fields[key] = np.asarray(da.data)

        super().load_analysis(
            path=path, fields=fields, eofs=eofs,
            singular_values=singular_values,
        )

        if self._analysis['is_coslat_corrected']:
            self.apply_coslat()

    # -------------------------------------------------------------- display
    def plot(self, mode, threshold=0, phase_shift=0, cmap_eof=None,
             cmap_phase=None, figsize=(8.3, 5.0), resolution='110m',
             projection=None, orientation='horizontal', land=True):
        """Map plot of `mode` (cartopy when available)."""
        from xmca_tpu.viz.plot import plot_xmca_mode
        return plot_xmca_mode(
            self, mode, threshold=threshold, phase_shift=phase_shift,
            cmap_eof=cmap_eof, cmap_phase=cmap_phase, figsize=figsize,
            resolution=resolution, projection=projection,
            orientation=orientation, land=land,
        )

    def save_plot(self, mode, path=None, plot_kwargs={}, save_kwargs={}):
        """Create and save a plot of `mode` to disk."""
        import matplotlib.pyplot as plt
        if path is None:
            output = 'mode{:}.png'.format(mode)
        else:
            output = path
        fig, axes = self.plot(mode=mode, **plot_kwargs)
        fig.subplots_adjust(left=0.06)
        plt.savefig(output, **save_kwargs)
