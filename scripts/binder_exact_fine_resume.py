"""Resume the fine-grid ED pair refinement for one pair (default (12,24)).

binder_exact_fine.py is not resume-aware (a restart would redo completed
pairs); this driver loads the pair's incremental JSON, re-seeds the coarse
thetas (0.9/0.925), and computes only the entries still null - each N=24
point is ~25-30 min of chunked matrix-free Lanczos on one CPU core, so
restarts after a session kill must not repeat finished work.

Usage: python scripts/binder_exact_fine_resume.py [small] [big]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.binder_exact_n24 import binder_exact_large  # noqa: E402
from scripts.binder_exact_fine import coarse_u  # noqa: E402

LOGS = os.path.join(REPO, "logs")


def main() -> None:
    ns = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    path = os.path.join(LOGS, f"binder_exact_fine_{ns}_{nb}.json")
    with open(path) as f:
        out = json.load(f)
    thetas = out["thetas"]
    for n in (ns, nb):
        col = out["U"][str(n)]
        for i, t in enumerate(thetas):
            if col[i] is not None:
                continue
            if t in (0.9, 0.925):
                col[i] = coarse_u(n, t)
                with open(path, "w") as f:
                    json.dump(out, f, indent=1)
                continue
            t0 = time.time()
            r = binder_exact_large(n, t, 2.5)
            col[i] = r["U"]
            print(
                f"pair ({ns},{nb}) N={n} theta={t}: U={r['U']:.6f} "
                f"[{time.time() - t0:.0f}s]",
                flush=True,
            )
            with open(path, "w") as f:
                json.dump(out, f, indent=1)
    print(f"done: {path}", flush=True)


if __name__ == "__main__":
    main()
