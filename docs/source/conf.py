# Sphinx configuration (reference parity: docs/source/conf.py)
import os
import sys
sys.path.insert(0, os.path.abspath('../..'))

project = 'xmca_tpu'
author = 'xmca_tpu developers'
from xmca_tpu.version import __version__ as release  # noqa: E402

extensions = [
    'sphinx.ext.autodoc',
    'sphinx.ext.autosummary',
    'sphinx.ext.napoleon',
    'sphinx.ext.viewcode',
]
autosummary_generate = True
html_theme = 'alabaster'
