"""Host-side matplotlib visualization of MCA results.

Behavioral port of the reference's plotting (``MCA.plot``
xmca/array.py:1430-1574; ``xMCA.plot`` xmca/xarray.py:989-1237).  Runs
entirely on host over NumPy copies of device results.  Cartopy map
projections are used when cartopy is installed; otherwise geographic panels
fall back to plain lat/lon axes (this image has no cartopy).
"""
import numpy as np

from xmca_tpu.utils.text import boldify_str


def plot_mca_mode(model, mode, threshold=0, phase_shift=0, cmap_eof=None,
                  cmap_phase=None, figsize=(8.3, 5.0)):
    """imshow-panel plot of `mode` for the ndarray API (reference
    xmca/array.py:1430-1574)."""
    import matplotlib.pyplot as plt

    pcs = model.pcs(mode, scaling='max', phase_shift=phase_shift)
    eofs = model.eofs(mode, scaling='max')
    phases = model.spatial_phase(mode, phase_shift=phase_shift)
    var = model.explained_variance(mode)[-1]

    n_cols = 2
    n_rows = len(pcs)
    height_ratios = [1] * n_rows
    n_rows += 1
    height_ratios.append(0.05)

    eof_title = 'EOF'
    cmap_eof_range = [-1, 0, 1]

    is_complex = model._analysis['is_complex']
    if is_complex:
        n_cols += 1
        eofs = model.spatial_amplitude(mode, scaling='max')
        eof_title = 'Amplitude'
        cmap_eof_range = [0, 1]
        cmap_eof = 'Blues' if cmap_eof is None else cmap_eof
        cmap_phase = 'twilight' if cmap_phase is None else cmap_phase
    else:
        cmap_eof = 'RdBu_r' if cmap_eof is None else cmap_eof

    for key in pcs.keys():
        pcs[key] = pcs[key][:, -1].real
        eofs[key] = eofs[key][..., -1]
        phases[key] = phases[key][..., -1]
        eofs[key] = np.where(
            abs(eofs[key]) >= threshold, eofs[key], np.nan
        )
        phases[key] = np.where(
            abs(eofs[key]) >= threshold, phases[key], np.nan
        )

    titles = {
        'pc': r'PC {:d} ({:.1f} %)'.format(mode, var),
        'eof': eof_title,
        'phase': 'Phase',
        'var1': model._field_names['left'],
    }
    if 'right' in model._keys:
        titles['var2'] = model._field_names['right']
    titles = {k: boldify_str(v.replace('_', ' '))
              for k, v in titles.items()}

    fig = plt.figure(figsize=figsize, dpi=150)
    fig.subplots_adjust(hspace=0.1, wspace=.1, left=0.25)
    gs = fig.add_gridspec(n_rows, n_cols, height_ratios=height_ratios)
    axes_pc = [fig.add_subplot(gs[i, 0]) for i in range(n_rows - 1)]
    axes_eof = [fig.add_subplot(gs[i, 1]) for i in range(n_rows - 1)]
    cbax_eof = fig.add_subplot(gs[-1, 1])

    axes_space = list(axes_eof)
    var_names = [titles['var1']]
    if 'right' in model._keys:
        var_names.append(titles['var2'])

    for i, pc in enumerate(pcs.values()):
        axes_pc[i].plot(pc)
        axes_pc[i].set_ylim(-1.2, 1.2)
        axes_pc[i].set_xlabel('')
        axes_pc[i].set_ylabel(var_names[i], fontweight='bold')
        axes_pc[i].set_title('')
        axes_pc[i].set_yticks([-1, 0, 1])
        axes_pc[i].spines['right'].set_visible(False)
        axes_pc[i].spines['top'].set_visible(False)

    axes_pc[0].xaxis.set_visible(False)
    axes_pc[0].set_title(titles['pc'], fontweight='bold')

    for i, eof in enumerate(eofs.values()):
        # 1-D spatial fields still render as an image strip
        img = eof if eof.ndim == 2 else eof[np.newaxis, :]
        cb_eof = axes_eof[i].imshow(
            img.real, origin='lower', vmin=cmap_eof_range[0],
            vmax=cmap_eof_range[-1], cmap=cmap_eof,
        )
        axes_eof[i].set_title('')

    plt.colorbar(cb_eof, cax=cbax_eof, orientation='horizontal')
    cbax_eof.xaxis.set_ticks(cmap_eof_range)
    axes_eof[0].set_title(titles['eof'], fontweight='bold')

    if is_complex:
        axes_phase = [fig.add_subplot(gs[i, 2]) for i in range(n_rows - 1)]
        cbax_phase = fig.add_subplot(gs[-1, 2])
        for i, phase in enumerate(phases.values()):
            img = phase if phase.ndim == 2 else phase[np.newaxis, :]
            cb_phase = axes_phase[i].imshow(
                img, origin='lower', vmin=-np.pi, vmax=np.pi,
                cmap=cmap_phase,
            )
            axes_phase[i].set_title('')
        plt.colorbar(cb_phase, cax=cbax_phase, orientation='horizontal')
        cbax_phase.xaxis.set_ticks([-3.14, 0, 3.14])
        cbax_phase.set_xticklabels([r'-$\pi$', '0', r'$\pi$'])
        axes_space.extend(axes_phase)
        axes_phase[0].set_title(titles['phase'], fontweight='bold')

    for a in axes_space:
        a.set_aspect('auto')
        a.xaxis.set_visible(False)
        a.yaxis.set_visible(False)

    if len(pcs) == 2:
        axes_pc[0].xaxis.set_visible(False)
        axes_pc[0].spines['bottom'].set_visible(False)


def _get_extent(lon, lat, central_longitude=0):
    """Map extent [east, west, south, north] with lon wrapped to -180..179.

    Parity with reference xmca/tools/xarray.py:34-69.
    """
    lon = np.sort(((np.asarray(lon) + 180) % 360) - 180)
    east = lon.min() + central_longitude + 0.001
    west = lon.max() + central_longitude - 0.001
    return [east, west, float(np.min(lat)), float(np.max(lat))]


def plot_xmca_mode(model, mode, threshold=0, phase_shift=0, cmap_eof=None,
                   cmap_phase=None, figsize=(8.3, 5.0), resolution='110m',
                   projection=None, orientation='horizontal', land=True):
    """Cartopy/matplotlib map plot of `mode` for the labeled-array API.

    Reference behavior: xmca/xarray.py:989-1237.  When cartopy is missing
    the maps are drawn on plain axes in data coordinates (no coastlines).
    Returns (fig, axes-dict) like the reference.
    """
    import matplotlib.pyplot as plt
    try:
        import cartopy.crs as ccrs
        import cartopy.feature as cfeature
        has_cartopy = True
    except ImportError:
        ccrs = cfeature = None
        has_cartopy = False

    analysis = model._analysis
    is_complex = analysis['is_complex']
    bivariate = analysis['is_bivariate']

    var = float(
        np.asarray(model.explained_variance(mode).sel(mode=mode))
    )
    pcs = model.pcs(mode, scaling='max', phase_shift=phase_shift)
    eofs = model.eofs(mode, scaling='max')
    phases = model.spatial_phase(mode, phase_shift=phase_shift)
    if is_complex:
        eofs = model.spatial_amplitude(mode, scaling='max')

    ticks = {
        'pc': [-1, 0, 1],
        'eof': [0, 1] if is_complex else [-1, 0, 1],
        'phase': [-np.pi, 0, np.pi],
    }
    tick_labels = {'phase': [r'-$\pi$', '0', r'$\pi$']}
    cmaps = {
        'eof': 'Blues' if is_complex else 'RdBu_r',
        'phase': 'twilight',
    }
    if cmap_eof is not None:
        cmaps['eof'] = cmap_eof
    if cmap_phase is not None:
        cmaps['phase'] = cmap_phase

    titles = {
        'pc': 'PC',
        'eof': 'Amplitude' if is_complex else 'EOF',
        'phase': 'Phase',
        'mode': 'Mode {:d} ({:.1f} %)'.format(mode, var),
    }
    for key, name in model._field_names.items():
        titles[key] = name
    titles = {k: boldify_str(str(v).replace('_', ' '))
              for k, v in titles.items()}

    # projections
    proj = {}
    if has_cartopy:
        proj = {'left': ccrs.PlateCarree(), 'right': ccrs.PlateCarree()}
        if projection is not None:
            try:
                proj.update(projection)
            except TypeError:
                proj = {k: projection for k in proj}
        data_projection = ccrs.PlateCarree()
    else:
        proj = {'left': None, 'right': None}
        data_projection = None

    # layout (reference _create_gridspec, xmca/xarray.py:894-987)
    n_rows = 2 if bivariate else 1
    n_cols = 3 if is_complex else 2
    height_ratios = [1] * n_rows
    width_ratios = [1] * n_cols
    n_rows += 1
    height_ratios.append(0.05)

    if orientation == 'horizontal':
        grid = {'pc': {'left': [0, 0]}, 'eof': {'left': [0, 1]}}
        if is_complex:
            grid['phase'] = {'left': [0, 2]}
        if bivariate:
            for k, panel in grid.items():
                yx = panel['left']
                grid[k]['right'] = [yx[0] + 1, yx[1]]
        for k, panel in grid.items():
            if k in ['eof', 'phase']:
                grid[k]['cb'] = [len(panel), panel['left'][1]]
    elif orientation == 'vertical':
        grid = {'pc': {'left': [-1, 1]}, 'eof': {'left': [0, 1]}}
        if is_complex:
            grid['phase'] = {'left': [1, 1]}
        if bivariate:
            for k, panel in grid.items():
                yx = panel['left']
                grid[k]['right'] = [yx[0], yx[1] + 1]
        for k, panel in grid.items():
            if k in ['eof', 'phase']:
                row, col = panel['left']
                grid[k]['cb'] = [row, col - 1]
        n_rows, n_cols = n_cols, n_rows
        height_ratios = n_rows * [1]
        width_ratios = n_cols * [1]
        width_ratios[0] = 0.05
    else:
        raise ValueError(
            "orientation must be 'horizontal' or 'vertical'"
        )

    fig = plt.figure(figsize=figsize, dpi=150)
    gs = fig.add_gridspec(
        n_rows, n_cols,
        height_ratios=height_ratios, width_ratios=width_ratios,
    )
    axes = {}
    for key_data, panel in grid.items():
        axes[key_data] = {}
        for key_pos, pos in panel.items():
            use_proj = None
            if key_data in ('eof', 'phase') and key_pos in ('left', 'right'):
                use_proj = proj.get(key_pos)
            if use_proj is not None:
                axes[key_data][key_pos] = fig.add_subplot(
                    gs[pos[0], pos[1]], projection=use_proj
                )
            else:
                axes[key_data][key_pos] = fig.add_subplot(
                    gs[pos[0], pos[1]]
                )

    def _panel_data(da):
        vals = np.asarray(da)
        lon = np.asarray(da.coords['lon']) if 'lon' in da.coords else \
            np.arange(vals.shape[-1])
        lat = np.asarray(da.coords['lat']) if 'lat' in da.coords else \
            np.arange(vals.shape[0])
        return vals, lon, lat

    for i, key in enumerate(pcs.keys()):
        pc = pcs[key].sel(mode=mode).real
        eof = eofs[key].sel(mode=mode)
        phase = phases[key].sel(mode=mode)

        eof = eof.where(abs(eof) >= threshold)
        phase = phase.where(abs(eof) >= threshold)

        ax = axes['pc'][key]
        ax.plot(np.arange(len(pc)), np.asarray(pc))
        ax.set_ylim(-1.2, 1.2)
        ax.set_yticks([-1, 0, 1])
        ax.set_ylabel(titles[key], fontweight='bold')
        ax.set_xlabel('')
        ax.set_title('')
        ax.spines['right'].set_visible(False)
        ax.spines['top'].set_visible(False)

        vals, lon, lat = _panel_data(eof)
        ax = axes['eof'][key]
        pm_kwargs = dict(
            vmin=ticks['eof'][0], vmax=ticks['eof'][-1], cmap=cmaps['eof']
        )
        if has_cartopy:
            pm_kwargs['transform'] = data_projection
        cb_eof = ax.pcolormesh(lon, lat, np.real(vals), **pm_kwargs)
        if has_cartopy:
            c_lon = proj[key].proj4_params.get('lon_0', 0)
            ax.set_extent(
                _get_extent(lon, lat, c_lon), crs=data_projection
            )
            if resolution in ['110m', '50m', '10m']:
                ax.coastlines(lw=.4, resolution=resolution)
            if land:
                ax.add_feature(
                    cfeature.LAND, color='#808080', zorder=0
                )
        ax.set_title('')
        ax.set_aspect('auto')

        plt.colorbar(
            cb_eof, cax=axes['eof']['cb'], orientation=orientation
        )
        if orientation == 'horizontal':
            axes['eof']['cb'].xaxis.set_ticks(ticks['eof'])
        else:
            axes['eof']['cb'].yaxis.set_ticks(ticks['eof'])

        if is_complex:
            vals, lon, lat = _panel_data(phase)
            ax = axes['phase'][key]
            pm_kwargs = dict(
                vmin=ticks['phase'][0], vmax=ticks['phase'][-1],
                cmap=cmaps['phase'],
            )
            if has_cartopy:
                pm_kwargs['transform'] = data_projection
            cb_phase = ax.pcolormesh(lon, lat, np.real(vals), **pm_kwargs)
            if has_cartopy:
                c_lon = proj[key].proj4_params.get('lon_0', 0)
                ax.set_extent(
                    _get_extent(lon, lat, c_lon), crs=data_projection
                )
                if resolution in ['110m', '50m', '10m']:
                    ax.coastlines(lw=.4, resolution=resolution)
                if land:
                    ax.add_feature(
                        cfeature.LAND, color='#808080', zorder=0
                    )
            ax.set_title('')
            ax.set_aspect('auto')
            plt.colorbar(
                cb_phase, cax=axes['phase']['cb'], orientation=orientation
            )
            if orientation == 'horizontal':
                axes['phase']['cb'].xaxis.set_ticks(ticks['phase'])
                axes['phase']['cb'].set_xticklabels(tick_labels['phase'])
            else:
                axes['phase']['cb'].yaxis.set_ticks(ticks['phase'])
                axes['phase']['cb'].set_yticklabels(tick_labels['phase'])
            axes['phase']['left'].set_title(
                titles['phase'], fontweight='bold'
            )

    if orientation == 'horizontal':
        axes['pc']['left'].set_title(titles['pc'], fontweight='bold')
        axes['eof']['left'].set_title(titles['eof'], fontweight='bold')
        if bivariate:
            axes['pc']['left'].xaxis.set_visible(False)
            axes['pc']['left'].spines['bottom'].set_visible(False)
    else:
        axes['pc']['left'].set_ylabel(titles['pc'], fontweight='bold')
        axes['pc']['left'].set_title('')
        axes['eof']['left'].set_title(titles['left'], fontweight='bold')
        axes['eof']['cb'].set_ylabel(titles['eof'], fontweight='bold')
        axes['eof']['cb'].yaxis.set_label_position('left')
        axes['eof']['cb'].yaxis.set_ticks_position('left')
        if bivariate:
            axes['pc']['right'].yaxis.set_visible(False)
            axes['pc']['right'].spines['left'].set_visible(False)
            axes['eof']['right'].set_title(
                titles['right'], fontweight='bold'
            )
        if is_complex:
            axes['phase']['cb'].set_ylabel(
                titles['phase'], fontweight='bold'
            )
            axes['phase']['left'].set_title('')
            axes['phase']['cb'].yaxis.set_label_position('left')
            axes['phase']['cb'].yaxis.set_ticks_position('left')

    fig.subplots_adjust(wspace=.1)
    fig.suptitle(titles['mode'], horizontalalignment='left')
    return fig, axes
