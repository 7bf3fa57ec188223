#!/usr/bin/env python3
"""Dependency-free static checks (the reference ships ruff + strict
mypy via .pre-commit-config.yaml; this repo wires ruff/mypy into CI in
.github/workflows/test-cpu.yml, and this script covers the highest-value
subset — syntax, unused imports, line length, whitespace hygiene —
with zero installs so it also runs in hermetic environments where
``pip install`` is unavailable).

Checks per file:
  - the file byte-compiles (syntax)
  - E501  line longer than 88 characters (``# noqa: E501`` opts out)
  - W291/W293 trailing whitespace
  - W191  tab indentation
  - F401  module- and function-scope imports that are never used
          (``# noqa: F401`` opts out; ``__init__.py`` re-exports and
          names listed in ``__all__`` are exempt)

Exit code 0 = clean, 1 = findings (printed as path:line: code message).
"""

from __future__ import annotations

import ast
import pathlib
import subprocess
import sys

MAX_LINE = 88


def _attr_root(node: ast.AST) -> str | None:
    while isinstance(node, ast.Attribute):
        node = node.value
    return node.id if isinstance(node, ast.Name) else None


class _ImportUse(ast.NodeVisitor):
    """Collect imported bindings and every name/attribute-root usage."""

    def __init__(self) -> None:
        # bound name -> (lineno, display) for the *innermost* binding
        self.imports: dict[str, tuple[int, str]] = {}
        self.used: set[str] = set()

    def visit_Import(self, node: ast.Import) -> None:
        for alias in node.names:
            bound = alias.asname or alias.name.split(".")[0]
            self.imports[bound] = (node.lineno, alias.name)

    def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
        for alias in node.names:
            if alias.name == "*":
                continue
            bound = alias.asname or alias.name
            self.imports[bound] = (node.lineno, alias.name)

    def visit_Name(self, node: ast.Name) -> None:
        if isinstance(node.ctx, ast.Load):
            self.used.add(node.id)

    def visit_Attribute(self, node: ast.Attribute) -> None:
        root = _attr_root(node)
        if root:
            self.used.add(root)
        self.generic_visit(node)


def _string_names(tree: ast.Module) -> set[str]:
    """Names referenced in __all__ or in string annotations."""
    out: set[str] = set()
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Assign)
            and any(
                isinstance(t, ast.Name) and t.id == "__all__"
                for t in node.targets
            )
            and isinstance(node.value, (ast.List, ast.Tuple))
        ):
            for elt in node.value.elts:
                if isinstance(elt, ast.Constant) and isinstance(
                    elt.value, str
                ):
                    out.add(elt.value)
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            # forward-ref annotations like "np.ndarray"
            out.add(node.value.split(".")[0].split("[")[0].strip())
    return out


def check_file(path: pathlib.Path) -> list[str]:
    findings: list[str] = []
    src = path.read_text()
    lines = src.splitlines()

    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as exc:
        return [f"{path}:{exc.lineno}: E999 syntax error: {exc.msg}"]

    for i, line in enumerate(lines, 1):
        if len(line) > MAX_LINE and "noqa: E501" not in line:
            findings.append(
                f"{path}:{i}: E501 line too long ({len(line)} > {MAX_LINE})"
            )
        if line != line.rstrip():
            code = "W293" if not line.strip() else "W291"
            findings.append(f"{path}:{i}: {code} trailing whitespace")
        stripped = line.lstrip(" ")
        if stripped.startswith("\t"):
            findings.append(f"{path}:{i}: W191 tab indentation")

    if path.name != "__init__.py":
        visitor = _ImportUse()
        visitor.visit(tree)
        exempt = _string_names(tree) | {"annotations"}
        for bound, (lineno, display) in sorted(
            visitor.imports.items(), key=lambda kv: kv[1][0]
        ):
            if bound in visitor.used or bound in exempt:
                continue
            if lineno <= len(lines) and "noqa" in lines[lineno - 1]:
                continue
            findings.append(
                f"{path}:{lineno}: F401 '{display}' imported but unused"
            )
    return findings


def main() -> int:
    repo = pathlib.Path(__file__).resolve().parent.parent
    files = subprocess.run(
        ["git", "ls-files", "*.py"],
        cwd=repo, capture_output=True, text=True, check=True,
    ).stdout.split()
    findings: list[str] = []
    for rel in files:
        findings.extend(check_file(repo / rel))
    for f in findings:
        print(f)
    print(
        f"lint: {len(files)} files, {len(findings)} findings",
        file=sys.stderr,
    )
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
