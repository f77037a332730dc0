"""Sphinx configuration for the pyloo_tpu documentation site.

Counterpart of the reference's docs skeleton (/root/reference/docs/conf.py),
rebuilt for this package: the narrative pages are the existing markdown files
(rendered through MyST) and the API reference is autodoc'd from the package's
docstrings.  Build locally or in CI (.github/workflows/docs.yml) with:

    pip install -e . sphinx myst-parser furo
    sphinx-build -b html docs docs/_build/html
"""

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "pyloo_tpu"
author = "pyloo_tpu developers"
copyright = "2026, pyloo_tpu developers"

try:
    from pyloo_tpu import __version__ as release
except Exception:  # docs must build even if jax import fails
    release = "0.3.0"

extensions = [
    "myst_parser",
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.intersphinx",
]

source_suffix = {".rst": "restructuredtext", ".md": "markdown"}
master_doc = "index"
exclude_patterns = ["_build", "Thumbs.db", ".DS_Store"]

# numpydoc-style docstrings throughout the package
napoleon_numpy_docstring = True
napoleon_google_docstring = False

autodoc_member_order = "bysource"
autodoc_typehints = "description"
autosummary_generate = True
# heavy/optional imports that must not break the docs build
autodoc_mock_imports = []

myst_enable_extensions = ["colon_fence", "dollarmath"]
myst_heading_anchors = 3

intersphinx_mapping = {
    "python": ("https://docs.python.org/3", None),
    "numpy": ("https://numpy.org/doc/stable", None),
    "jax": ("https://docs.jax.dev/en/latest", None),
}

html_theme = "furo"
html_title = "pyloo_tpu"
html_static_path = []
