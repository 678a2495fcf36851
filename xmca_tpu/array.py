"""Import-path parity module: ``from xmca_tpu.array import MCA``.

Mirrors the reference's ``from xmca.array import MCA`` entry point
(reference: xmca/array.py:30).
"""
from xmca_tpu.api.array import MCA

__all__ = ['MCA']
