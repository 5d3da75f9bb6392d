"""Regenerate docs/API.md: first docstring line per public symbol.

Walks the package with AST (no imports — fast and side-effect free).
Run: ``python scripts/gen_api_docs.py``.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PKG = REPO / "tiatoolbox_tpu"


def first_line(node) -> str:
    doc = ast.get_docstring(node) or ""
    line = doc.strip().splitlines()[0] if doc.strip() else ""
    return line.replace("|", "\\|")


def module_name(path: Path) -> str:
    rel = path.relative_to(REPO).with_suffix("")
    parts = list(rel.parts)
    if parts[-1] == "__init__":
        parts = parts[:-1]
    return ".".join(parts)


def walk_module(path: Path) -> tuple[str, list[tuple[str, str]]]:
    tree = ast.parse(path.read_text())
    rows = []
    for node in tree.body:
        if isinstance(node, ast.ClassDef) and not node.name.startswith("_"):
            rows.append((f"`class {node.name}`", first_line(node)))
            for sub in node.body:
                if isinstance(
                    sub, (ast.FunctionDef, ast.AsyncFunctionDef)
                ) and not sub.name.startswith("_"):
                    rows.append(
                        (f"`{node.name}.{sub.name}()`", first_line(sub))
                    )
        elif isinstance(
            node, (ast.FunctionDef, ast.AsyncFunctionDef)
        ) and not node.name.startswith("_"):
            rows.append((f"`{node.name}()`", first_line(node)))
    return first_line(tree), rows


def main() -> None:
    out = [
        "# API reference",
        "",
        "Generated from docstrings (first line per public symbol) by",
        "`scripts/gen_api_docs.py`.",
    ]
    for path in sorted(PKG.rglob("*.py")):
        if path.name.startswith("_") and path.name != "__init__.py":
            continue
        mod = module_name(path)
        mod_doc, rows = walk_module(path)
        if not mod_doc and not rows:
            continue
        out.append("")
        out.append(f"## `{mod}`")
        if mod_doc:
            out.append("")
            out.append(mod_doc)
        if rows:
            out.append("")
            out.append("| Symbol | Summary |")
            out.append("|---|---|")
            out.extend(f"| {sym} | {doc} |" for sym, doc in rows)
    (REPO / "docs" / "API.md").write_text("\n".join(out) + "\n")
    sys.stdout.write(f"wrote docs/API.md ({len(out)} lines)\n")


if __name__ == "__main__":
    main()
