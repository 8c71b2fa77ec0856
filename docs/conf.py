# Sphinx configuration (reference docs/conf.py role).
project = "panoswintransformerobjectdetection_tpu"
copyright = "2026"
author = "panoswin-tpu contributors"
extensions = ["myst_parser"]
source_suffix = {".rst": "restructuredtext", ".md": "markdown"}
master_doc = "index"
exclude_patterns = ["_build"]
html_theme = "alabaster"
