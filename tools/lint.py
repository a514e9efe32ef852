#!/usr/bin/env python
"""In-repo lint gate (stdlib-only; the image ships no black/mypy/ruff).

Checks, all hard errors (exit 1):

1. every Python file parses (syntax);
2. no unused imports (module scope; ``__init__.py`` re-export surfaces
   and names listed in ``__all__`` are exempt);
3. no tabs in indentation, no trailing whitespace;
4. line length <= MAX_LINE columns (docstring/URL lines exempt up to
   MAX_LONG);
5. no ``print(`` in package code (logging only; tools/examples/tests and
   ``__main__``/bench entry points are exempt);
6. no mutable default arguments (``def f(x=[])`` / ``{}`` / ``set()``).

Run: ``python tools/lint.py`` (from the repo root).  CI runs it as a
hard gate; ``tests/test_lint.py`` keeps it enforced under pytest too.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

MAX_LINE = 110
MAX_LONG = 160

REPO = Path(__file__).resolve().parent.parent
PACKAGE_DIRS = ["queasars_tpu"]
EXTRA_FILES = ["bench.py", "__graft_entry__.py"]
PRINT_EXEMPT = {"__main__.py"}


def iter_files():
    for d in PACKAGE_DIRS:
        yield from sorted((REPO / d).rglob("*.py"))
    for f in EXTRA_FILES:
        path = REPO / f
        if path.exists():
            yield path


def check_unused_imports(tree: ast.AST, path: Path) -> list[str]:
    if path.name == "__init__.py":
        return []
    imported: dict[str, int] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                name = (alias.asname or alias.name).split(".")[0]
                imported[name] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for alias in node.names:
                if alias.name == "*":
                    continue
                imported[alias.asname or alias.name] = node.lineno
    if not imported:
        return []
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            inner = node
            while isinstance(inner, ast.Attribute):
                inner = inner.value
            if isinstance(inner, ast.Name):
                used.add(inner.id)
    exported: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for target in node.targets:
                if isinstance(target, ast.Name) and target.id == "__all__":
                    if isinstance(node.value, (ast.List, ast.Tuple)):
                        exported |= {
                            e.value
                            for e in node.value.elts
                            if isinstance(e, ast.Constant) and isinstance(e.value, str)
                        }
    # names used inside docstring doctests or string annotations are rare
    # here; flag the rest
    return [
        f"{path}:{lineno}: unused import '{name}'"
        for name, lineno in sorted(imported.items(), key=lambda kv: kv[1])
        if name not in used and name not in exported and not name.startswith("_")
    ]


def check_style(text: str, path: Path) -> list[str]:
    errors = []
    for i, line in enumerate(text.splitlines(), 1):
        stripped = line.rstrip("\n")
        if stripped != stripped.rstrip():
            errors.append(f"{path}:{i}: trailing whitespace")
        if "\t" in stripped[: len(stripped) - len(stripped.lstrip())]:
            errors.append(f"{path}:{i}: tab indentation")
        if len(stripped) > MAX_LINE:
            limit = MAX_LONG if ("http" in stripped or '"""' in stripped) else MAX_LINE
            if len(stripped) > limit:
                errors.append(f"{path}:{i}: line too long ({len(stripped)} > {limit})")
    return errors


def check_prints(tree: ast.AST, path: Path) -> list[str]:
    if path.name in PRINT_EXEMPT or path.name in EXTRA_FILES:
        return []
    errors = []
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Name)
            and node.func.id == "print"
        ):
            errors.append(f"{path}:{node.lineno}: print() in package code (use logging)")
    return errors


def check_mutable_defaults(tree: ast.AST, path: Path) -> list[str]:
    errors = []
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for default in list(node.args.defaults) + [
                d for d in node.args.kw_defaults if d is not None
            ]:
                if isinstance(default, (ast.List, ast.Dict, ast.Set)):
                    errors.append(
                        f"{path}:{node.lineno}: mutable default argument in '{node.name}'"
                    )
    return errors


def main() -> int:
    errors: list[str] = []
    n_files = 0
    for path in iter_files():
        n_files += 1
        text = path.read_text()
        try:
            tree = ast.parse(text, filename=str(path))
        except SyntaxError as exc:
            errors.append(f"{path}:{exc.lineno}: syntax error: {exc.msg}")
            continue
        rel = path.relative_to(REPO)
        errors += check_unused_imports(tree, rel)
        errors += check_style(text, rel)
        errors += check_prints(tree, rel)
        errors += check_mutable_defaults(tree, rel)
    for err in errors:
        print(err)
    print(f"lint: {n_files} files checked, {len(errors)} errors")
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
