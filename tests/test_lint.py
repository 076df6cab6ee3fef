"""Source-tree lint: no module may define the same top-level name
twice.  A later ``def``/``class`` silently shadows the earlier one —
exactly the failure mode that broke tx09 in round 12 (two
``unigram_segment`` defs in operators/tokenize.py) and hid a benign
``tx07`` duplicate in workload/pipeline.py."""
import ast
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _top_level_defs(tree):
    return [node.name for node in tree.body
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef))]


def test_no_duplicate_top_level_defs():
    offenders = []
    for path in sorted(ROOT.glob("nowdb_spark/**/*.py")):
        tree = ast.parse(path.read_text(), filename=str(path))
        seen = set()
        for name in _top_level_defs(tree):
            if name in seen:
                offenders.append(f"{path.relative_to(ROOT)}: {name}")
            seen.add(name)
    assert not offenders, (
        "duplicate top-level definitions (later shadows earlier): "
        + ", ".join(offenders))
