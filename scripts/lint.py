"""Dependency-free linter (the env ships no black/isort/pylint — reference
gates on those, Makefile:1-17/.pylintrc; this is the equivalent gate here).

Checks, per file:
  * syntax (ast.parse)
  * unused imports (names imported but never referenced)
  * tabs in indentation / trailing whitespace
  * duplicate dict-literal keys
  * `except:` bare excepts
  * line length <= 90 (the reference's black -S -l 90 gate, Makefile:8)
  * stdlib -> third-party -> first-party import-group ordering with
    alphabetized modules inside each group (the isort black-profile
    subset that matters, reference Makefile:10)

Exit code 1 on any finding. Run via `make lint`.
"""

import ast
import sys
from pathlib import Path

MAX_LINE = 90
FIRST_PARTY = ('generative_models_tpu', 'tests', 'gms')

ROOTS = ['generative_models_tpu', 'tests', 'scripts', 'bench.py', '__graft_entry__.py']


def iter_files(repo):
    for root in ROOTS:
        p = repo / root
        if p.is_file():
            yield p
        elif p.is_dir():
            yield from sorted(p.rglob('*.py'))


def used_names(tree):
    names = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            names.add(node.id)
        elif isinstance(node, ast.Attribute):
            # a.b.c -> record base name via the Name child (walk covers it)
            pass
    return names


def _import_group(module):
    """0 stdlib/future, 1 third-party, 2 first-party (isort sections)."""
    base = (module or '').split('.')[0]
    if base in FIRST_PARTY:
        return 2
    if base == '__future__' or base in sys.stdlib_module_names:
        return 0
    return 1


def check_import_order(path, tree):
    """Top-of-module import block: groups must appear stdlib -> third-party
    -> first-party, alphabetized (case-insensitive) within each group."""
    block = []
    for node in tree.body:
        if isinstance(node, ast.Import):
            block.append((node, 0, node.names[0].name))
        elif isinstance(node, ast.ImportFrom):
            if node.level:  # relative import: first-party by construction
                block.append((node, 1, '.' * node.level + (node.module or '')))
            else:
                block.append((node, 1, node.module or ''))
        elif isinstance(node, ast.Expr) and isinstance(node.value, ast.Constant):
            continue  # module docstring
        else:
            break  # end of the leading import block
    problems = []
    prev = (-1, 0, '')  # (section, plain-import-vs-from, module)
    for node, is_from, mod in block:
        group = 2 if mod.startswith('.') else _import_group(mod)
        # isort order within a section: `import x` statements first (sorted),
        # then `from x import y` statements (sorted)
        key = (group, is_from, mod.lower())
        if key[:2] < prev[:2] or (key[:2] == prev[:2] and key[2] < prev[2]):
            problems.append(
                f'{path}:{node.lineno}: import order: {mod!r} '
                f'(section {group}) belongs before its predecessor'
            )
        prev = key
    return problems


def check_file(path):
    problems = []
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f'{path}:{e.lineno}: syntax error: {e.msg}']

    is_init = path.name == '__init__.py'  # re-export surface
    lines = src.split('\n')
    noqa = {i for i, l in enumerate(lines, 1) if '# noqa' in l}
    for i, line in enumerate(lines, 1):
        stripped = line.rstrip('\n')
        if stripped != stripped.rstrip():
            problems.append(f'{path}:{i}: trailing whitespace')
        body = line.lstrip()
        indent = line[: len(line) - len(body)]
        if '\t' in indent:
            problems.append(f'{path}:{i}: tab in indentation')
        # long lines are exempt only when the overflow is an unbreakable URL
        has_url = 'http://' in line or 'https://' in line
        if len(stripped) > MAX_LINE and i not in noqa and not has_url:
            problems.append(
                f'{path}:{i}: line too long ({len(stripped)} > {MAX_LINE})'
            )

    used = used_names(tree)
    # names referenced inside docstring doctests or __all__ strings
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            used.update(node.value.split())

    for node in ast.walk(tree):
        if isinstance(node, ast.Import) and not is_init:
            if node.lineno in noqa:
                continue
            for alias in node.names:
                name = (alias.asname or alias.name).split('.')[0]
                if name not in used:
                    problems.append(
                        f'{path}:{node.lineno}: unused import {name!r}'
                    )
        elif isinstance(node, ast.ImportFrom) and not is_init:
            if node.lineno in noqa:
                continue
            for alias in node.names:
                if alias.name == '*':
                    continue
                name = alias.asname or alias.name
                if name not in used:
                    problems.append(
                        f'{path}:{node.lineno}: unused import {name!r}'
                    )
        elif isinstance(node, ast.Dict):
            keys = [
                k.value
                for k in node.keys
                if isinstance(k, ast.Constant) and isinstance(k.value, (str, int))
            ]
            dupes = {k for k in keys if keys.count(k) > 1}
            if dupes:
                problems.append(
                    f'{path}:{node.lineno}: duplicate dict keys {sorted(dupes)}'
                )
        elif isinstance(node, ast.ExceptHandler) and node.type is None:
            problems.append(f'{path}:{node.lineno}: bare except')
    problems += check_import_order(path, tree)
    return problems


def main():
    repo = Path(__file__).resolve().parent.parent
    all_problems = []
    n = 0
    for f in iter_files(repo):
        n += 1
        all_problems += check_file(f)
    for p in all_problems:
        print(p)
    print(f'lint: {n} files, {len(all_problems)} problems')
    sys.exit(1 if all_problems else 0)


if __name__ == '__main__':
    main()
