"""Render BENCH/scaling.json into the SCALING_RESULTS block of
BENCH/BASELINE.md (idempotent)."""

from __future__ import annotations

import json
import os
import re

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH")


def render(s: dict) -> str:
    lo, hi = s["low"], s["high"]
    lines = [
        "| metric | local[%d] (N) | local[%d] (4N) |" % (lo["cpus"], hi["cpus"]),
        "|---|---|---|",
        f"| wall (best of {len(lo.get('all_walls', [1]))}) | {lo['wall_sec']} s | {hi['wall_sec']} s |",
        f"| all walls | {lo.get('all_walls')} | {hi.get('all_walls')} |",
        f"| throughput | {lo['files_per_sec']} files/s | {hi['files_per_sec']} files/s |",
        f"| steal fraction | {lo.get('steal_frac')} | {hi.get('steal_frac')} |",
        "",
        f"**rows = {s['n_rows']:,} · speedup = {s['speedup']} · scaling efficiency = "
        f"{s['scaling_efficiency']} · outputs identical across levels: {s['outputs_identical']}**",
    ]
    return "\n".join(lines)


def main() -> None:
    with open(os.path.join(BENCH, "scaling.json")) as f:
        s = json.load(f)
    md_path = os.path.join(BENCH, "BASELINE.md")
    md = open(md_path).read()
    block = "<!-- SCALING_RESULTS -->\n" + render(s) + "\n<!-- /SCALING_RESULTS -->"
    if "<!-- /SCALING_RESULTS -->" in md:
        md = re.sub(
            r"<!-- SCALING_RESULTS -->.*?<!-- /SCALING_RESULTS -->",
            block,
            md,
            flags=re.S,
        )
    else:
        md = md.replace("<!-- SCALING_RESULTS -->", block)
    open(md_path, "w").write(md)
    print(render(s))


if __name__ == "__main__":
    main()
