"""Device-to-host materialization helpers.

Some TPU transport backends (e.g. the axon tunnel) cannot transfer complex
arrays device->host (UNIMPLEMENTED) — and, worse, the *failed attempt*
poisons the runtime so that subsequent real-part extractions on the same
array fail too.  Complex arrays are therefore ALWAYS materialized through
an eager real/imag split (two real transfers + host combine); direct
transfer is never attempted on complex dtypes.  Overhead on healthy
backends is one extra host-side combine — negligible next to the transfer
itself.
"""
import numpy as np


def to_numpy(x):
    """Materialize a device array to NumPy, complex-safe on all backends."""
    try:
        import jax.numpy as jnp
        is_jax = hasattr(x, 'devices')
    except ImportError:               # plain numpy input
        return np.asarray(x)
    if is_jax and jnp.iscomplexobj(x):
        return np.asarray(jnp.real(x)) + 1j * np.asarray(jnp.imag(x))
    return np.asarray(x)
