"""Regenerate GRADED.md — the external correctness-coverage ledger.

The driver's per-round CORRECTNESS_r{N}.json grades only the first 50
entries of ``queries()`` (the DRIVER_WINDOW-packed grader-facing
ordering). This ledger records, per registered query, which rounds the
external gate has confirmed it green, plus the never-graded backlog
that future DRIVER_WINDOW rotations should draw from. Run after each
round's CORRECTNESS file lands:

    python tools/graded_ledger.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gravity_spark.queries import REGISTRY, _driver_order  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    hist: dict[str, list[str]] = {}
    latest = 0
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", f)
        rnd = str(int(m.group(1)))
        latest = max(latest, int(rnd))
        for name, rec in json.load(open(f)).items():
            ok = rec.get("hash_match") or (
                rec.get("rows_match") and rec.get("err") is None
            )
            if ok:
                hist.setdefault(name, []).append(rnd)
    nxt = latest + 1
    win = set(_driver_order()[:50])
    lines = [
        "# GRADED — external correctness-gate coverage ledger",
        "",
        "Which rounds the driver's CORRECTNESS_r{N} gate graded each query",
        "(it grades the first 50 of `queries()`; rotation policy in",
        f"`gravity_spark/queries.py::DRIVER_WINDOW`). `r{nxt}*` = in the",
        "currently-committed window, graded when the next CORRECTNESS file",
        "lands. Regenerate with `python tools/graded_ledger.py` after each",
        "round.",
        "",
        "| query | externally graded in rounds |",
        "|---|---|",
    ]
    never = []
    for name in REGISTRY:
        tag = ", ".join("r" + r for r in hist.get(name, []))
        if name in win:
            tag = (tag + ", " if tag else "") + f"r{nxt}*"
        if not tag:
            never.append(name)
            tag = "—"
        lines.append(f"| {name} | {tag} |")
    lines += [
        "",
        f"**Totals:** {len(REGISTRY)} registered; "
        f"{sum(1 for n in REGISTRY if hist.get(n))} externally graded at "
        f"least once through r{latest}; {len(win)} in the committed window; "
        f"{len(never)} never graded and not yet windowed.",
        "",
        f"Never-graded backlog (DRIVER_WINDOW rotation candidates for "
        f"r{nxt + 1}+):",
        "",
    ]
    lines += [f"- {n}" for n in never]
    with open(os.path.join(REPO, "GRADED.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(
        f"GRADED.md: {sum(1 for n in REGISTRY if hist.get(n))} graded, "
        f"{len(win)} windowed, {len(never)} backlog"
    )


if __name__ == "__main__":
    main()
