"""Import-path parity with the reference's ``xmca.tools`` utility belt.

Users of the reference import helpers directly
(``from xmca.tools.rotation import varimax``); these modules provide the
same functions with the same signatures and return conventions, backed by
the jitted TPU core.
"""
