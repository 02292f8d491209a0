"""Sphinx configuration for the inference_tpu documentation
(mirrors the reference's readthedocs setup: /root/reference/docs/source/conf.py)."""

import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "inference-tools-tpu"
author = "inference-tools-tpu contributors"
release = "0.2"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.mathjax",
    "sphinx.ext.viewcode",
    "myst_parser",
]

autodoc_member_order = "bysource"
autodoc_typehints = "description"

# heavy/accelerator imports are mocked so docs build anywhere
autodoc_mock_imports = ["jax", "jaxlib"]

templates_path = ["_templates"]
exclude_patterns = []

html_theme = "sphinx_rtd_theme"
