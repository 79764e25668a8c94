"""Setup shim.

All metadata lives in pyproject.toml (PEP 621). This file exists only so the
legacy ``python setup.py develop`` / ``pip install -e . --no-use-pep517`` path
works on environments whose setuptools predates PEP 660 editable-wheel support
(setuptools < 70 without the ``wheel`` package — e.g. this container). On any
modern toolchain, plain ``pip install -e .`` uses pyproject.toml directly.
"""
from setuptools import setup

setup()
