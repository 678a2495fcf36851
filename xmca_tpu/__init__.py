"""xmca_tpu — a TPU-native MCA/EOF analysis framework built on JAX/XLA/Pallas.

Provides the full capability surface of the reference ``xmca`` library
(standard / rotated / complex / complex-rotated MCA and PCA, varimax & promax
rotation, Hilbert complexification with exp/theta extension, Rule N / North /
bootstrap significance testing, prediction, reconstruction, netCDF
persistence, plotting) re-designed TPU-first:

* the solve pipeline is a single jitted XLA graph built from MXU-friendly
  Gram-matrix contractions instead of host LAPACK SVDs,
* varimax/promax run as ``lax.while_loop`` fixed-point iterations using the
  QDWH polar decomposition (matmul-only, MXU-native),
* Monte-Carlo significance ensembles are ``vmap``-ped whole-solve batches
  sharded across a ``jax.sharding.Mesh``,
* the Hilbert transform is a batched ``jnp.fft`` kernel,
* hot contractions have Pallas TPU kernels (``xmca_tpu.ops``).

Public entry points mirror the reference (reference: xmca/__init__.py:1-5,
README.md:66-68):

>>> from xmca_tpu.array import MCA       # numpy-facing API
>>> from xmca_tpu.xarray import xMCA     # labeled-array (xarray) API
"""
from xmca_tpu.version import __version__

__author__ = 'xmca_tpu developers'

__all__ = ['__version__', 'MCA', 'xMCA']


def __getattr__(name):
    # lazy top-level conveniences: xmca_tpu.MCA / xmca_tpu.xMCA
    if name == 'MCA':
        from xmca_tpu.api.array import MCA
        return MCA
    if name == 'xMCA':
        from xmca_tpu.api.xarray import xMCA
        return xMCA
    raise AttributeError(name)
