"""Per-query bench comparison: makes the round-over-round perf gate
auditable per query instead of only in aggregate (the reference
publishes no numbers -- BASELINE.md -- so the comparable baseline is
the previous round's recorded bench).

Usage: python tools/bench_compare.py OLD.json NEW.json [threshold]

Reads the first JSON line of each file (the full per-query line),
prints common-query totals, and a markdown table of every query whose
wall moved more than ``threshold`` (default 0.3 = 30%) AND more than
0.2 s -- sub-second queries swing +/-60% on this shared VM, so tiny
absolute moves are noise by construction.
"""
from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                d = json.loads(line)
                if "queries" in d:
                    return d["queries"]
    raise SystemExit(f"no per-query bench line in {path}")


def main() -> None:
    old_p, new_p = sys.argv[1], sys.argv[2]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
    old, new = load(old_p), load(new_p)
    common = sorted(set(old) & set(new))
    t_old = sum(old[q] for q in common if old[q] >= 0)
    t_new = sum(new[q] for q in common if new[q] >= 0)
    print(f"common queries: {len(common)}; "
          f"old total {t_old:.1f}s -> new total {t_new:.1f}s "
          f"({t_new / max(t_old, 1e-9) - 1:+.1%} vs old)")
    only_new = sorted(set(new) - set(old))
    if only_new:
        t = sum(new[q] for q in only_new if new[q] >= 0)
        print(f"new-only queries: {len(only_new)} adding {t:.1f}s: "
              f"{', '.join(only_new)}")
    moved = [(q, old[q], new[q]) for q in common
             if old[q] >= 0 and new[q] >= 0
             and abs(new[q] - old[q]) > max(thr * old[q], 0.2)]
    moved.sort(key=lambda r: -(r[2] - r[1]))
    if not moved:
        print(f"no query moved more than {thr:.0%} (+0.2s floor)")
        return
    print("\n| query | old s | new s | delta |")
    print("|---|---|---|---|")
    for q, a, b in moved:
        print(f"| {q} | {a:.2f} | {b:.2f} | {b - a:+.2f} "
              f"({(b - a) / a:+.0%}) |")


if __name__ == "__main__":
    main()
