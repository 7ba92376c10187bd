#!/usr/bin/env python
"""Statement-coverage measurement + gate for innr_tpu (no coverage.py).

The reference's coverage CI job exists to prove every dispatch arm
executes (``/root/reference/.github/workflows/ci.yml:174-191``,
cargo-llvm-cov). This environment has no coverage.py, so this script is a
self-contained analog built on Python 3.12 ``sys.monitoring`` (PEP 669):
a LINE-event callback records the first execution of every
``innr_tpu/``-file line and then returns ``DISABLE`` for that location,
so steady-state overhead is near zero (the same trick coverage.py's
sysmon core uses). Executable lines come from walking each module's
compiled code objects (``co_lines``); ``# pragma: no cover`` lines — and
whole ``def``/``class`` bodies whose header carries the pragma — are
excluded.

Usage:
    python scripts/coverage_gate.py                       # full suite
    python scripts/coverage_gate.py tests/test_dense.py   # subset
    python scripts/coverage_gate.py --threshold 0.85

Writes ``COVERAGE_LINES.md`` (per-module table + worst uncovered runs) and
exits 1 when total statement coverage falls below the threshold.
"""

from __future__ import annotations

import argparse
import ast
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "innr_tpu"
TOOL_ID = sys.monitoring.COVERAGE_ID


def executable_lines(path: Path) -> set[int]:
    """Lines that can execute: union of co_lines() over all nested code
    objects, minus pragma exclusions."""
    src = path.read_text()
    code = compile(src, str(path), "exec")
    lines: set[int] = set()

    def walk(co):
        for (_, _, line) in co.co_lines():
            if line is not None:
                lines.add(line)
        for const in co.co_consts:
            if hasattr(const, "co_lines"):
                walk(const)

    walk(code)

    # pragma exclusions: the flagged line, plus the whole body when the
    # pragma sits on a def/class/if header.
    raw = src.splitlines()
    pragma = {
        i + 1 for i, text in enumerate(raw) if "pragma: no cover" in text
    }
    if pragma:
        tree = ast.parse(src)
        for node in ast.walk(tree):
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef,
                       ast.If)
            ) and node.lineno in pragma:
                end = getattr(node, "end_lineno", node.lineno)
                pragma.update(range(node.lineno, end + 1))
    return lines - pragma


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("tests", nargs="*", default=["tests/"])
    ap.add_argument("--threshold", type=float, default=0.80)
    ap.add_argument("--report", default="COVERAGE_LINES.md")
    args = ap.parse_args()

    prefix = str(PKG)
    hits: dict[str, set[int]] = {}

    def on_line(code, line):
        fn = code.co_filename
        if fn.startswith(prefix):
            hits.setdefault(fn, set()).add(line)
        return sys.monitoring.DISABLE  # first-hit only per location

    sys.monitoring.use_tool_id(TOOL_ID, "innr-coverage")
    sys.monitoring.register_callback(
        TOOL_ID, sys.monitoring.events.LINE, on_line
    )
    sys.monitoring.set_events(TOOL_ID, sys.monitoring.events.LINE)
    try:
        import pytest

        rc = pytest.main(["-x", "-q", "-p", "no:cacheprovider",
                          *args.tests])
    finally:
        sys.monitoring.set_events(TOOL_ID, 0)
        sys.monitoring.free_tool_id(TOOL_ID)
    if rc != 0:
        print(f"pytest failed (rc={rc}); coverage not gated", file=sys.stderr)
        return int(rc)

    rows = []
    tot_hit = tot_all = 0
    worst: list[tuple[str, list[int]]] = []
    for path in sorted(PKG.rglob("*.py")):
        exe = executable_lines(path)
        if not exe:
            continue
        got = hits.get(str(path), set()) & exe
        missing = sorted(exe - got)
        tot_hit += len(got)
        tot_all += len(exe)
        rel = str(path.relative_to(REPO))
        rows.append((rel, len(got), len(exe), missing))
    rows.sort(key=lambda r: r[1] / r[2])

    total = tot_hit / max(tot_all, 1)
    lines = [
        "# Statement coverage (sys.monitoring gate)",
        "",
        f"Total: **{total:.1%}** ({tot_hit}/{tot_all} executable lines) — "
        f"threshold {args.threshold:.0%}; suite: {' '.join(args.tests)}",
        "",
        "| module | covered | lines | % | first uncovered lines |",
        "|---|---|---|---|---|",
    ]
    for rel, got_n, all_n, missing in rows:
        head = ", ".join(map(str, missing[:12]))
        if len(missing) > 12:
            head += ", …"
        lines.append(
            f"| {rel} | {got_n} | {all_n} | {got_n / all_n:.0%} | {head} |"
        )
    (REPO / args.report).write_text("\n".join(lines) + "\n")
    print(f"\nTOTAL statement coverage: {total:.1%} "
          f"({tot_hit}/{tot_all}) -> {args.report}")
    return 0 if total >= args.threshold else 1


if __name__ == "__main__":
    sys.exit(main())
