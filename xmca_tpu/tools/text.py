"""Text helpers — reference-compatible entry points
(xmca/tools/text.py:15-25)."""
from xmca_tpu.utils.text import boldify_str, secure_str, wrap_str  # noqa: F401
