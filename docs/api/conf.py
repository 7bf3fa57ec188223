"""Sphinx configuration for the instagraal-tpu API reference.

Mirrors the reference's doc/conf.py (instaGRAAL doc/, sphinx autodoc
over the package); the TPU rebuild documents the same surface with
napoleon for the numpy/google-style docstrings used throughout.
"""

import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "instagraal-tpu"
author = "instagraal-tpu contributors"
copyright = "2026, instagraal-tpu contributors"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.intersphinx",
]

# CI builds docs in the package's install environment, so the heavy
# scientific deps are importable; mock only what a docs-only env may
# lack (the native extension loads a shared object at import time).
autodoc_mock_imports = []

autodoc_member_order = "bysource"
autodoc_default_options = {
    "members": True,
    "undoc-members": True,
    "show-inheritance": True,
}

intersphinx_mapping = {
    "python": ("https://docs.python.org/3", None),
    "numpy": ("https://numpy.org/doc/stable/", None),
}

templates_path = []
exclude_patterns = ["_build"]
html_theme = "alabaster"
