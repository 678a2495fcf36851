"""Quickstart: MCA of two gridded fields (mirror of the reference's
tutorial/quickstart.py, using the bundled fixture data so it runs without
network access)."""
import os
import sys

import numpy as np
import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt

# runnable straight from a checkout: python tutorial/quickstart.py
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
from xmca_tpu.compat import open_dataarray  # noqa: E402
from xmca_tpu.xarray import xMCA            # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
FIX = os.path.join(HERE, '..', 'tests', 'integration', 'fixtures')
if not os.path.isdir(FIX):
    FIX = '/root/reference/tests/integration/fixtures'

sst = open_dataarray(os.path.join(FIX, 'sst.nc'))
prcp = open_dataarray(os.path.join(FIX, 'prcp.nc'))

# ---------------------------------------------------------------- MCA
mca = xMCA(sst, prcp)
mca.set_field_names('sst', 'prcp')
mca.solve()

svals = mca.singular_values()
expvar = mca.explained_variance()
pcs = mca.pcs()
eofs = mca.eofs()
print('leading explained variance (%):', np.asarray(expvar)[:5])

# ------------------------------------------------- significance analysis
mca = xMCA(sst, prcp)
mca.normalize()
mca.apply_coslat()
mca.solve()
svals = mca.singular_values()

# North's rule of thumb
north = mca.rule_north()

# Rule N with 50 surrogates (vmapped on device)
rule_n = mca.rule_n(50, seed=0)
median = np.median(np.asarray(rule_n), axis=1)
n_signif = int((np.asarray(svals) > median[:len(svals)]).sum())
print('modes above Rule-N median:', n_signif)

# ------------------------------------------- complex rotated MCA + plots
mca = xMCA(sst, prcp)
mca.set_field_names('sst', 'prcp')
mca.solve(complexify=True, extend='exp', period=12)
mca.rotate(10, power=1)
fig, axes = mca.plot(1)
plt.savefig('/tmp/xmca_tpu_mode1.png')
print('saved /tmp/xmca_tpu_mode1.png')

# ------------------------------------------------------------ save/load
mca.save_analysis('/tmp/xmca_tpu_analysis')
reloaded = xMCA()
reloaded.load_analysis('/tmp/xmca_tpu_analysis/info.xmca')
print('reloaded rank:', reloaded._analysis['rank'])

# ---------------------------------------- out-of-core (streamed) solve
# Fields wider than device memory stream through the chip in space
# chunks; netcdf_chunks builds the loader straight from the file (the
# full grid never exists in host memory).
from xmca_tpu.array import MCA                   # noqa: E402
from xmca_tpu.compat import netcdf_chunks        # noqa: E402

loader, n_obs, shape = netcdf_chunks(
    os.path.join(FIX, 'sst.nc'), max_chunk_bytes=64 * 2 ** 10,
)
stream = MCA.from_chunks(loader, None, n_observations=n_obs,
                         left_shape=shape)
stream.set_solver(truncate=5)
stream.solve()
print('streamed svals:', np.asarray(stream.singular_values())[:3])
