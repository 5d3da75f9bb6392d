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
def test_docstring_examples_parse(py_file: Path) -> None:
    """Every ``>>>`` example in every docstring must be valid Python
    (reference ``tests/test_docs.py:36`` doctest-parses the tree)."""
    import doctest

    tree = ast.parse(py_file.read_text())
    parser = doctest.DocTestParser()
    nodes = [tree, *ast.walk(tree)]
    for node in nodes:
        if not isinstance(
            node,
            (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef),
        ):
            continue
        doc = ast.get_docstring(node)
        if not doc or ">>>" not in doc:
            continue
        examples = parser.get_examples(doc)
        assert examples, f"{py_file.name}: unparseable doctest block"
        source = "".join(ex.source for ex in examples)
        try:
            ast.parse(source)
        except SyntaxError as exc:  # pragma: no cover - failure detail
            msg = f"{py_file.name}: invalid docstring example: {exc}"
            raise AssertionError(msg) from exc


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
