"""Every example script must run end-to-end (docs-as-tests;
reference analog: tests/test_docs.py doctests)."""

from __future__ import annotations

import runpy
from pathlib import Path

import pytest

EXAMPLES = sorted(
    (Path(__file__).resolve().parent.parent / "examples").glob("*.py")
)


@pytest.mark.parametrize("script", EXAMPLES, ids=lambda p: p.name)
def test_example_runs(script: Path) -> None:
    runpy.run_path(str(script), run_name="__main__")
