#!/usr/bin/env python
"""Stdlib lint gate (the reference ships a pre-commit config with black/
isort/ast checks, /root/reference/.pre-commit-config.yaml; this image has no
external linters, so the gate is AST-based and dependency-free).

Checks, per file:
  * the file parses (ast) and compiles (compile());
  * no unused imports (module scope and function scope, `__all__`-aware,
    re-export files like __init__.py exempt via `# noqa: unused` or
    __all__);
  * no mutable default arguments (list/dict/set literals);
  * no bare `except:`;
  * no tabs in indentation, no trailing whitespace, newline at EOF;
  * no duplicate literal keys in dict displays.

Exit status 1 if any finding. Run: python tools/lint.py [paths...]
"""
from __future__ import annotations

import ast
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DEFAULT_PATHS = [REPO / "ptgnn_tpu", REPO / "tests", REPO / "tools",
                 REPO / "bench.py", REPO / "__graft_entry__.py"]


def iter_py(paths):
    for p in paths:
        p = Path(p)
        if p.is_dir():
            yield from sorted(p.rglob("*.py"))
        elif p.suffix == ".py":
            yield p


class ImportCollector(ast.NodeVisitor):
    """Names bound by imports, with locations; usage via ast.Name/Attribute."""

    def __init__(self):
        self.imports = {}  # name -> (lineno, stated)
        self.used = set()

    def visit_Import(self, node):
        for a in node.names:
            name = (a.asname or a.name).split(".")[0]
            self.imports[name] = (node.lineno, a.name)
        self.generic_visit(node)

    def visit_ImportFrom(self, node):
        for a in node.names:
            if a.name == "*":
                continue
            self.imports[a.asname or a.name] = (node.lineno, a.name)
        self.generic_visit(node)

    def visit_Name(self, node):
        if isinstance(node.ctx, ast.Load):
            self.used.add(node.id)
        self.generic_visit(node)

    def visit_Attribute(self, node):
        self.generic_visit(node)


def lint_file(path: Path):
    findings = []
    text = path.read_text()
    rel = path.relative_to(REPO) if path.is_relative_to(REPO) else path

    for i, line in enumerate(text.splitlines(), 1):
        stripped = line.rstrip("\n")
        if stripped != stripped.rstrip():
            findings.append(f"{rel}:{i}: trailing whitespace")
        body = stripped.lstrip()
        indent = stripped[: len(stripped) - len(body)]
        if "\t" in indent:
            findings.append(f"{rel}:{i}: tab in indentation")
    if text and not text.endswith("\n"):
        findings.append(f"{rel}: no newline at end of file")

    try:
        tree = ast.parse(text, filename=str(path))
        compile(text, str(path), "exec")
    except SyntaxError as e:
        findings.append(f"{rel}:{e.lineno}: syntax error: {e.msg}")
        return findings

    # string-mentioned names count as used (__all__, docstring doctests are
    # NOT scanned — only explicit string constants matching an import name)
    str_consts = {
        n.value for n in ast.walk(tree)
        if isinstance(n, ast.Constant) and isinstance(n.value, str)
    }

    col = ImportCollector()
    col.visit(tree)
    is_facade = path.name == "__init__.py"
    for name, (lineno, stated) in sorted(col.imports.items()):
        if name in col.used or name in str_consts or name == "annotations":
            continue
        if is_facade:
            continue  # re-export facade
        src_line = text.splitlines()[lineno - 1]
        if "noqa" in src_line:
            continue
        findings.append(f"{rel}:{lineno}: unused import '{name}' (from {stated})")

    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in node.args.defaults + node.args.kw_defaults:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    findings.append(
                        f"{rel}:{d.lineno}: mutable default argument in "
                        f"'{node.name}'"
                    )
        elif isinstance(node, ast.ExceptHandler) and node.type is None:
            findings.append(f"{rel}:{node.lineno}: bare 'except:'")
        elif isinstance(node, ast.Dict):
            seen = {}
            for k in node.keys:
                if isinstance(k, ast.Constant):
                    if k.value in seen:
                        findings.append(
                            f"{rel}:{k.lineno}: duplicate dict key {k.value!r}"
                        )
                    seen[k.value] = True
    return findings


def main(argv):
    paths = [Path(a) for a in argv[1:]] or DEFAULT_PATHS
    all_findings = []
    n = 0
    for f in iter_py(paths):
        n += 1
        all_findings.extend(lint_file(f))
    for msg in all_findings:
        print(msg)
    print(f"lint: {n} files, {len(all_findings)} findings", file=sys.stderr)
    return 1 if all_findings else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
