"""Single-level capacity point: full dedup pipeline over n_rows files
at local[cpus], best-of-N, recording files/sec and the components
fingerprint (must match every earlier run at the same corpus — the
rework-safety determinism check).

Usage: python BENCH/run_capacity.py [n_rows=1000000] [cpus=32] [repeats=2]
Writes BENCH/throughput_<n_rows>.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_scaling import BENCH_DIR, ensure_corpus, run_once  # noqa: E402


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    corpus = ensure_corpus(n_rows)
    runs = [run_once(corpus, cpus, f"c{cpus}") for _ in range(repeats)]
    best = min(runs, key=lambda r: r["wall_sec"])
    best["all_walls"] = [r["wall_sec"] for r in runs]
    assert all(
        r["components_fingerprint"] == best["components_fingerprint"]
        for r in runs
    ), "nondeterministic components across repeats"
    out = {"n_rows": n_rows, "cpus": cpus, "run": best}
    with open(os.path.join(BENCH_DIR, f"throughput_{n_rows}.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
