"""Varimax and Promax rotation — reference-compatible entry points.

Same signatures and return conventions as the reference
(xmca/tools/rotation.py:15-149): numpy in, numpy out, ``RuntimeError`` when
the iteration does not converge.  The computation runs as the jitted
``lax.while_loop`` fixed point of :mod:`xmca_tpu.core.rotation`.
"""
import numpy as np
import jax.numpy as jnp

from xmca_tpu.core import rotation as _core
from xmca_tpu.utils.transfer import to_numpy as _to_np
from xmca_tpu.utils.transfer import to_device as _to_dev

_NON_CONVERGENCE_MSG = (
    'Rotation process did not converge. Try decreasing the tolerance. '
    'Invalid NaN entries also might be a problem.'
)


def varimax(A, gamma=1, maxIter=1000, tol=1e-8):
    """Orthogonal Varimax rotation with Kaiser normalization.

    Returns (B, R): the rotated matrix and the rotation matrix.
    """
    B, R, converged, _ = _core.varimax(
        _to_dev(A), gamma=gamma, max_iter=int(maxIter), tol=tol
    )
    if not bool(converged):
        raise RuntimeError(_NON_CONVERGENCE_MSG)
    # materialize via the transfer helper: complex device->host transfers
    # must be split into two real transfers on the axon TPU backend
    return _to_np(B), _to_np(R)


def promax(A, power=1, maxIter=1000, tol=1e-8):
    """Oblique Promax rotation (power=1 reduces to Varimax).

    Returns (B, R, phi): rotated matrix, rotation matrix, and the
    correlation matrix of the rotated components.
    """
    A = np.asarray(A)
    n, p = A.shape
    if p < 2:
        # parity with the reference's degenerate branch
        # (xmca/tools/rotation.py:107-109)
        print('Cannot rotate 1 PC. No rotation performed.')
        return A, np.eye(n), A.conjugate().T @ A

    B, R, phi, converged, _ = _core.promax(
        _to_dev(A), power=int(power), max_iter=int(maxIter), tol=tol
    )
    if not bool(converged):
        raise RuntimeError(_NON_CONVERGENCE_MSG)
    return _to_np(B), _to_np(R), _to_np(phi)
