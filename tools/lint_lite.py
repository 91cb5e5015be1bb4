#!/usr/bin/env python
"""Dependency-free lint gate (`make lint`).

This image bakes no linters (ruff/flake8/black are absent and installs
are unavailable), so `make lint` runs this AST-based checker instead of
`python -m compileall` alone.  CI additionally runs the real `ruff
check` (pip is available on runners) with a ruleset matching what this
script enforces — see pyproject.toml [tool.ruff.lint] — so the two
gates agree: anything this script accepts, CI's ruff accepts too for
the shared rules.

Checks (ruff/pycodestyle rule ids in parens):

* syntax errors — files must parse (E9)
* unused module-level imports (F401); `__init__.py` re-export surfaces
  and `__future__`/explicitly-marked side-effect imports are exempt
* duplicate same-scope function/class definitions (F811 subset)
* f-strings without any placeholder (F541)
* bare `except:` (E722)
* `== None` / `!= None` / `== True` / `== False` comparisons (E711/E712)
* `l`, `O`, `I` as single-char variable names in assignments (E741)

Exit nonzero with one line per finding (`path:line: CODE message`).
"""

from __future__ import annotations

import ast
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent

SCAN = (
    sorted((ROOT / "pyfocusr_tpu").rglob("*.py"))
    + sorted((ROOT / "pyfocusr").rglob("*.py"))
    + sorted((ROOT / "tests").glob("*.py"))
    + sorted((ROOT / "tools").glob("*.py"))
    + sorted((ROOT / "examples").glob("*.py"))
    + [ROOT / "bench.py", ROOT / "__graft_entry__.py"]
)


def _used_names(tree: ast.AST) -> set:
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # foo.bar marks foo used via the Name node it contains.
            pass
    # Strings listed in __all__ count as usage (matching ruff's F401
    # semantics: only __all__, not arbitrary string literals).
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and any(
            isinstance(t, ast.Name) and t.id == "__all__" for t in node.targets
        ):
            for el in ast.walk(node.value):
                if isinstance(el, ast.Constant) and isinstance(el.value, str):
                    used.add(el.value)
    return used


def check_file(path: pathlib.Path) -> list:
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as exc:
        return [f"{path}:{exc.lineno}: E999 syntax error: {exc.msg}"]
    out = []
    rel = path.relative_to(ROOT)

    # F401 — unused module-level imports (file-level approximation).
    if path.name != "__init__.py":
        lines = src.splitlines()
        imports = {}
        for node in tree.body:
            if isinstance(node, ast.Import):
                for a in node.names:
                    imports[(a.asname or a.name).split(".")[0]] = node.lineno
            elif isinstance(node, ast.ImportFrom):
                if node.module == "__future__":
                    continue
                for a in node.names:
                    if a.name != "*":
                        imports[a.asname or a.name] = node.lineno
        used = _used_names(tree)
        for nm, ln in imports.items():
            line = lines[ln - 1] if ln <= len(lines) else ""
            if nm not in used and "noqa" not in line:
                out.append(f"{rel}:{ln}: F401 unused import '{nm}'")

    # Format specs (f"{x:.3f}") parse as nested placeholder-less
    # JoinedStr nodes; exclude them from the F541 walk.
    spec_ids = {
        id(n.format_spec)
        for n in ast.walk(tree)
        if isinstance(n, ast.FormattedValue) and n.format_spec is not None
    }
    for node in ast.walk(tree):
        # F811 subset — duplicate def/class names in one body.
        if isinstance(node, (ast.Module, ast.ClassDef, ast.FunctionDef,
                             ast.AsyncFunctionDef)):
            body = node.body
            seen = {}
            for st in body:
                if isinstance(st, (ast.FunctionDef, ast.AsyncFunctionDef,
                                   ast.ClassDef)):
                    if st.name in seen:
                        out.append(
                            f"{rel}:{st.lineno}: F811 redefinition of "
                            f"'{st.name}' (first at line {seen[st.name]})"
                        )
                    seen[st.name] = st.lineno
        # F541 — f-string with no placeholders.
        if isinstance(node, ast.JoinedStr) and id(node) not in spec_ids:
            if not any(isinstance(v, ast.FormattedValue) for v in node.values):
                out.append(
                    f"{rel}:{node.lineno}: F541 f-string without placeholders"
                )
        # E722 — bare except.
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            out.append(f"{rel}:{node.lineno}: E722 bare 'except:'")
        # E711/E712 — comparisons to None/True/False with ==/!=.
        if isinstance(node, ast.Compare):
            for op, cmp_ in zip(node.ops, node.comparators):
                if isinstance(op, (ast.Eq, ast.NotEq)) and isinstance(
                    cmp_, ast.Constant
                ) and (cmp_.value is None or cmp_.value is True
                       or cmp_.value is False):
                    code = "E711" if cmp_.value is None else "E712"
                    out.append(
                        f"{rel}:{node.lineno}: {code} comparison to "
                        f"{cmp_.value!r} with ==/!= (use 'is')"
                    )
        # E741 — ambiguous single-letter names in assignments/args.
        if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Store):
            if node.id in ("l", "O", "I"):
                out.append(
                    f"{rel}:{node.lineno}: E741 ambiguous variable "
                    f"name '{node.id}'"
                )
    return out


def main() -> int:
    findings = []
    for p in SCAN:
        if p.exists():
            findings.extend(check_file(p))
    for f in findings:
        print(f)
    print(f"lint_lite: {len(findings)} finding(s) across "
          f"{sum(1 for p in SCAN if p.exists())} files")
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main())
