# Sphinx configuration for the fvgp_tpu documentation.
# Build requires sphinx + myst_parser (not bundled in the runtime image):
#   pip install sphinx myst-parser sphinx-rtd-theme && make -C docs html
project = "fvgp_tpu"
author = "fvgp_tpu developers"
release = "0.1"

extensions = ["myst_parser"]
source_suffix = {".rst": "restructuredtext", ".md": "markdown"}
master_doc = "index"
exclude_patterns = []
html_theme = "sphinx_rtd_theme"
html_static_path = ["_static"]
myst_enable_extensions = ["dollarmath", "amsmath"]
