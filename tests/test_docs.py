"""Docs-as-tests analogue (reference ``tests/test_docs.py:36``).

Imports every module in the package (catching broken imports anywhere
in the tree) and checks that every public module, class, and function
carries a docstring.
"""

from __future__ import annotations

import ast
import importlib
import pkgutil
from pathlib import Path

import pytest

import tiatoolbox_tpu

PACKAGE_ROOT = Path(tiatoolbox_tpu.__file__).parent

MODULES = [
    name
    for _, name, _ in pkgutil.walk_packages(
        [str(PACKAGE_ROOT)], prefix="tiatoolbox_tpu."
    )
]


@pytest.mark.parametrize("module_name", MODULES)
def test_module_imports(module_name) -> None:
    importlib.import_module(module_name)


@pytest.mark.parametrize(
    "py_file",
    sorted(PACKAGE_ROOT.rglob("*.py")),
    ids=lambda p: str(p.relative_to(PACKAGE_ROOT)),
)
def test_docstrings_present(py_file: Path) -> None:
    tree = ast.parse(py_file.read_text())
    assert ast.get_docstring(tree), f"{py_file} missing module docstring"
    missing = []
    for node in tree.body:  # top-level definitions only
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            if node.name.startswith("_"):
                continue
            if not ast.get_docstring(node):
                missing.append(f"{py_file.name}:{node.lineno} {node.name}")
    assert not missing, f"Missing docstrings: {missing}"
