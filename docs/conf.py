"""Sphinx configuration for the sanafe_tpu API reference.

Build with `sphinx-build -b html docs docs/_build` (sphinx + the package
installed). Reference analog: /root/reference/docs/conf.py.
"""

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "sanafe_tpu"
author = "sanafe_tpu contributors"
release = "0.2.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
]
autosummary_generate = True
autodoc_member_order = "bysource"
autodoc_typehints = "description"

templates_path = ["_templates"]
exclude_patterns = ["_build"]

html_theme = "alabaster"
html_static_path = ["_static"]
