"""Docstring-example testing (reference runs xdoctest over the package,
`/root/reference/pytest.ini:1-3`; xdoctest is not in this image, so the
stdlib doctest runner covers the same `Example:` blocks).  Every module
listed here must contain at least one executable example — the assert
keeps the list honest when docstrings are refactored."""

import doctest
import importlib

import pytest

MODULES = [
    "panoswintransformerobjectdetection_tpu.core.bbox",
    "panoswintransformerobjectdetection_tpu.core.coder",
    "panoswintransformerobjectdetection_tpu.geometry.sphere",
    "panoswintransformerobjectdetection_tpu.ops.nms",
]


@pytest.mark.parametrize("modname", MODULES)
def test_module_doctests(modname):
    mod = importlib.import_module(modname)
    results = doctest.testmod(mod, verbose=False,
                              optionflags=doctest.NORMALIZE_WHITESPACE)
    assert results.attempted > 0, f"no doctest examples found in {modname}"
    assert results.failed == 0, f"{results.failed} doctest failures in {modname}"
