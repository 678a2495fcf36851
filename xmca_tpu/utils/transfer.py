"""Host<->device materialization helpers.

Some TPU transport backends (e.g. the axon tunnel) cannot transfer complex
arrays across the host<->device boundary IN EITHER DIRECTION
(UNIMPLEMENTED) — and, worse, a *failed attempt* poisons the runtime so
that subsequent ops (including fresh compilations) fail too.  Complex
arrays are therefore ALWAYS moved through an eager real/imag split:

* device -> host (:func:`to_numpy`): two real transfers + host combine;
* host -> device (:func:`to_device`): two real transfers + one *jitted*
  on-device combine (eager complex arithmetic has UNIMPLEMENTED paths
  on axon too — all complex math stays under jit).

Overhead on healthy backends is one extra combine — negligible next to
the transfer itself.
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


def to_device(x):
    """Place a host array on device, complex-safe on all backends.

    Complex inputs are uploaded as two real transfers and recombined on
    device; jitted functions then receive an already-device-resident
    complex array and no complex transport ever happens.
    """
    import jax
    import jax.numpy as jnp
    if hasattr(x, 'devices'):          # already a jax array
        return x
    x = np.asarray(x)
    if np.iscomplexobj(x):
        re = jnp.asarray(np.ascontiguousarray(x.real))
        im = jnp.asarray(np.ascontiguousarray(x.imag))
        return _combine_on_device(re, im)  # no complex constant, no
        # complex transport: the combine runs as jitted device code
        # (the only eager-complex envelope verified on axon)
    return jnp.asarray(x)


_COMBINE = None


def _combine_on_device(re, im):
    """``re + 1j im`` under jit — eager complex arithmetic is not part
    of the verified axon envelope, jitted complex math is."""
    global _COMBINE
    if _COMBINE is None:
        import jax
        _COMBINE = jax.jit(jax.lax.complex)
    return _COMBINE(re, im)
