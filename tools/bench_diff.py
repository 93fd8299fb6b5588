"""Round-over-round per-query bench diff from committed artifacts.

Usage: python tools/bench_diff.py BENCH_local_r07.json BENCH_local_r08.json

Joins the two full-name per-query maps through the newer file's
``renames`` map (old name → new name, recorded by bench.py at each cap
rotation), prints per-query old/new/ratio sorted by ratio, and a
summary. The r7 verdict (item 6) asked for exactly this to be
computable from artifacts alone.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    with open(sys.argv[1]) as f:
        old = json.load(f)
    with open(sys.argv[2]) as f:
        new = json.load(f)
    renames = new.get("renames") or {}
    oldq, newq = old["queries"], new["queries"]
    rows = []
    for oname, t_old in sorted(oldq.items()):
        nname = renames.get(oname, oname)
        t_new = newq.get(nname)
        if t_new is None or t_old <= 0 or t_new <= 0:
            continue
        rows.append((t_new / t_old, oname, nname, t_old, t_new))
    rows.sort()
    if not rows:
        print(
            "no overlapping positively-timed queries between the two "
            "artifacts (check the renames map / file pairing)"
        )
        return 1
    print(f"{'ratio':>6}  {'old_s':>7}  {'new_s':>7}  query")
    for ratio, oname, nname, t_old, t_new in rows:
        label = oname if oname == nname else f"{oname} -> {nname}"
        print(f"{ratio:6.2f}  {t_old:7.3f}  {t_new:7.3f}  {label}")
    joined_old = sum(r[3] for r in rows)
    joined_new = sum(r[4] for r in rows)
    import statistics

    print(
        f"\njoined {len(rows)} queries: old {joined_old:.1f}s -> new "
        f"{joined_new:.1f}s (sum ratio {joined_new / joined_old:.2f}, "
        f"median per-query ratio {statistics.median(r[0] for r in rows):.2f})"
    )
    only_new = sorted(set(newq) - {renames.get(o, o) for o in oldq})
    if only_new:
        t = sum(newq[n] for n in only_new if newq[n] > 0)
        print(f"new-only queries ({len(only_new)}, {t:.1f}s): {', '.join(only_new)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
