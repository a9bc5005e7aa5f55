"""Static source lint (AST-based; ruff is not in the environment):

- F811: a top-level or class-level ``def``/``class`` that silently shadows
  an earlier identical-scope definition (a duplicated ``minhash_dedup_pairs``
  shipped in round 3 — this test keeps it from reappearing).
- F401: imports never referenced in the module (``__init__.py`` re-exports
  exempt).
"""

from __future__ import annotations

import ast
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SOURCES = sorted(
    [
        *(REPO / "usearch_spark").rglob("*.py"),
        REPO / "__spark_entry__.py",
        REPO / "bench.py",
        *(REPO / "tools").glob("*.py"),
    ]
)


def _redefinitions(tree: ast.Module) -> list[str]:
    """def/class names bound twice in the SAME suite (module body or class
    body).  Only direct children count: defs inside if/try branches are
    legitimate conditional definitions, not shadowing."""
    out = []

    def scan(body, scope):
        seen: set[str] = set()
        for node in body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                if node.name in seen:
                    out.append(f"{scope}{node.name} (line {node.lineno})")
                seen.add(node.name)
                if isinstance(node, ast.ClassDef):
                    scan(node.body, f"{scope}{node.name}.")

    scan(tree.body, "")
    return out


def _unused_imports(tree: ast.Module) -> list[str]:
    imported: dict[str, int] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                name = a.asname or a.name.split(".")[0]
                imported[name] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                if a.name == "*":
                    continue
                imported[a.asname or a.name] = node.lineno
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            root = node
            while isinstance(root, ast.Attribute):
                root = root.value
            if isinstance(root, ast.Name):
                used.add(root.id)
    # names re-exported via __all__ count as used
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__" and isinstance(node.value, (ast.List, ast.Tuple)):
                    for elt in node.value.elts:
                        if isinstance(elt, ast.Constant) and isinstance(elt.value, str):
                            used.add(elt.value)
    return [f"{n} (line {ln})" for n, ln in imported.items() if n not in used]


@pytest.mark.parametrize("path", SOURCES, ids=lambda p: str(p.relative_to(REPO)))
def test_no_shadowed_defs_or_unused_imports(path):
    tree = ast.parse(path.read_text(), filename=str(path))
    redefs = _redefinitions(tree)
    assert not redefs, f"shadowed definitions: {redefs}"
    if path.name != "__init__.py":  # __init__ imports are the public API
        unused = _unused_imports(tree)
        assert not unused, f"unused imports: {unused}"
