"""Device-mesh parallelism for MCA solves and Monte-Carlo ensembles.

The reference is strictly single-process (SURVEY.md section 2: no
parallelism of any kind).  The TPU-native design distributes along the two
axes the problem actually has:

* ``space`` — the flattened grid axis of the data matrices.  The solve's
  heavy ops contract over either time or space; with the space axis sharded,
  ``X^H X`` becomes per-device partial matmuls + an XLA ``psum`` over ICI,
  and the back-projection ``M @ V_kernel`` stays fully local.  This is how
  fields too large for one chip's HBM (0.25-degree grids) are handled.
* ``ensemble`` — Monte-Carlo surrogate runs (Rule N / bootstrap) are
  embarrassingly parallel; the run axis of each vmapped batch is sharded so
  every device solves its own surrogates, with a single host gather at the
  end (see ``xmca_tpu.stats.significance``).

Everything uses ``jax.sharding.NamedSharding`` + ``jit``; XLA's SPMD
partitioner inserts all collectives.  No hand-written communication.
"""
import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENSEMBLE_AXIS = 'ensemble'
SPACE_AXIS = 'space'


def make_mesh(ensemble=1, space=1, devices=None):
    """Create a 2-D ('ensemble', 'space') device mesh.

    ``ensemble * space`` must equal the number of devices used.  With
    ``ensemble=n_devices`` the mesh is tuned for Monte-Carlo throughput;
    with ``space=n_devices`` for single very-large solves.
    """
    if devices is None:
        devices = jax.devices()
    n = ensemble * space
    if n > len(devices):
        raise ValueError(
            'mesh needs {} devices but only {} are available'
            .format(n, len(devices))
        )
    dev_array = np.asarray(devices[:n]).reshape(ensemble, space)
    return Mesh(dev_array, (ENSEMBLE_AXIS, SPACE_AXIS))


def distribute_array(x, mesh, axis=1, mesh_axis=SPACE_AXIS):
    """Place an array with dimension `axis` sharded over `mesh_axis`.

    For a (time, space) data matrix use ``axis=1`` (the default): the space
    columns spread across devices, time stays replicated.
    """
    spec = [None] * np.ndim(x)
    spec[axis] = mesh_axis
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def sharded_solve(Xl, Xr=None, mesh=None, method='gram'):
    """Run the MCA solve with space-sharded inputs.

    Places the fields' space axes on the mesh and lets GSPMD partition the
    pipeline: Gram matrices come out of per-shard matmuls + psum, the small
    eigh/SVD is replicated, and each device back-projects only its own
    shard of the spatial singular vectors.

    Returns (singular_values, V_left, V_right_or_None) with V still
    device-sharded (use ``np.asarray`` to gather).
    """
    from xmca_tpu.core import solver as _solver
    if mesh is None:
        raise ValueError('mesh is required')
    Xl = distribute_array(Xl, mesh)
    if Xr is None:
        s, V = _solver.solve_pca(Xl, method=method)
        return s, V, None
    Xr = distribute_array(Xr, mesh)
    s, Vl, Vr = _solver.solve_mca(Xl, Xr, method=method)
    return s, Vl, Vr
