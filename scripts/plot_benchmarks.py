#!/usr/bin/env python
"""Render the pinned benchmark medians (benches/medians.json).

The analog of the reference's ``scripts/plot_benchmarks.py:13-19``, which
pins criterion medians in-repo as the README chart source so performance
regressions diff mechanically. Here the pinned data is
``benches/medians.json`` (recorded same-session measurements + roofline
fractions from PERF.md); this script renders it as

- a markdown table (stdout; paste into README/PERF.md), and
- ``docs/bench_roofline.png`` — a horizontal bar chart of roofline
  fractions (the relay-variance-proof metric) with ``--png``.

Compare a fresh run against the pins with ``--check`` (exit 1 when any
roofline fraction regresses by more than ``--tolerance``, default 0.10):
feed it the ``# name: value roofline=F`` stderr lines of
``python bench.py --full``.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
MEDIANS = REPO / "benches" / "medians.json"


def load():
    return json.loads(MEDIANS.read_text())


def render_table(data) -> str:
    lines = [
        f"Pinned medians — {data['hardware']} (recorded {data['recorded']})",
        "",
        "| config | value | unit | roofline |",
        "|---|---|---|---|",
    ]
    for name, c in data["configs"].items():
        rf = c.get("roofline_fraction")
        rf_s = f"{rf:.2f}" if isinstance(rf, (int, float)) else "—"
        v = c["value"]
        v_s = f"{v:,.4g}" if isinstance(v, float) and v < 1e4 else f"{v:,}"
        lines.append(f"| {name} | {v_s} | {c['unit']} | {rf_s} |")
    return "\n".join(lines)


def render_png(data, out: Path) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = [
        (name, c["roofline_fraction"])
        for name, c in data["configs"].items()
        if isinstance(c.get("roofline_fraction"), (int, float))
    ]
    rows.sort(key=lambda x: x[1])
    names = [n for n, _ in rows]
    fracs = [f for _, f in rows]
    fig, ax = plt.subplots(figsize=(9, 0.45 * len(rows) + 1.2))
    ax.barh(names, fracs, color="#4878a8")
    ax.axvline(1.0, color="#a84848", linestyle="--", linewidth=1,
               label="HBM read roofline")
    ax.set_xlabel("fraction of same-session HBM read bandwidth")
    ax.set_title("innr_tpu kernels vs the bandwidth roofline")
    ax.legend(loc="lower right")
    fig.tight_layout()
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


def check(data, bench_stderr: str, tolerance: float) -> int:
    """Compare `# name: value roofline=F` lines against the pins."""
    seen = {}
    for m in re.finditer(
        r"#\s*([\w./-]+):\s*([\d,.]+)(?:\s+roofline=([\d.]+))?", bench_stderr
    ):
        name, _, rf = m.groups()
        if rf is not None:
            seen[name] = float(rf)
    failures = 0
    for name, c in data["configs"].items():
        pin = c.get("roofline_fraction")
        if not isinstance(pin, (int, float)):
            continue
        got = seen.get(name)
        if got is None:
            continue
        if got < pin - tolerance:
            print(f"REGRESSION {name}: roofline {got:.2f} < pin {pin:.2f}")
            failures += 1
        else:
            print(f"ok {name}: {got:.2f} (pin {pin:.2f})")
    return 1 if failures else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--png", action="store_true")
    ap.add_argument("--check", metavar="BENCH_STDERR_FILE")
    ap.add_argument("--tolerance", type=float, default=0.10)
    args = ap.parse_args()
    data = load()
    if args.check:
        return check(data, Path(args.check).read_text(), args.tolerance)
    print(render_table(data))
    if args.png:
        render_png(data, REPO / "docs" / "bench_roofline.png")
    return 0


if __name__ == "__main__":
    return_code = main()
    sys.exit(return_code)
