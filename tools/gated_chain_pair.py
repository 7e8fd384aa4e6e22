"""Idle-gated 4->16 scaling pairs for the DEDUP CHAIN — the same
shared-host witness protocol as tools/gated_pair.py (pyramid), applied
to the chain-shaped workload (minhash candidates -> exact-Jaccard
verify -> connected components -> labeled clusters).

The chain's only prior multi-CPU reading was an 8->32 pair (0.394),
which the CPU-seconds analysis attributed to this box's memory-bandwidth
ceiling rather than the plan; 4->16 sits below that ceiling and is the
informative pair (BASELINE.md round-4 scaling section). Each leg is a
fresh process (its own ray.init via RAY_GRAFT_CPUS), gated on 1-min
load < --max-load so a leg never starts inside another tenant's burst.
Reports per-pair whole-chain efficiency AND per-stage efficiencies so a
sub-0.8 stage can be named rather than averaged away.

Usage: python tools/gated_chain_pair.py [n_pairs] [n_docs]
         [--max-load L] [--max-wait S]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHAIN = os.path.join(REPO, "tools", "dedup_chain_bench.py")


def wait_idle(max_load: float, max_wait: float) -> float:
    t0 = time.time()
    while True:
        load = os.getloadavg()[0]
        if load < max_load or time.time() - t0 > max_wait:
            return load
        time.sleep(15.0)


def run_leg(ncpu: int, n_docs: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
    out = subprocess.run(
        [sys.executable, CHAIN, str(n_docs)],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_pairs = int(args[0]) if args else 2
    n_docs = int(args[1]) if len(args) > 1 else 2_000_000
    max_load = 0.5
    max_wait = 600.0
    if "--max-load" in sys.argv:
        max_load = float(sys.argv[sys.argv.index("--max-load") + 1])
    if "--max-wait" in sys.argv:
        max_wait = float(sys.argv[sys.argv.index("--max-wait") + 1])

    pairs = []
    for i in range(n_pairs):
        rec: dict = {"pair": i}
        for ncpu in (4, 16):
            gate_load = wait_idle(max_load, max_wait)
            leg = run_leg(ncpu, n_docs)
            rec[str(ncpu)] = {
                "sec": leg["value"],
                "stages": leg["stages"],
                "docs_per_sec": leg["docs_per_sec"],
                "gate_load": round(gate_load, 2),
            }
            # invariants: a leg that miscounts is not a timing sample.
            # LSH misses a theory-predicted ~0.004% of twins (the 20M-doc
            # sweep matched prediction at every scale), so tolerate <0.1%.
            assert (
                abs(leg["verified_pairs"] - leg["expected_pairs"])
                <= max(16, leg["expected_pairs"] // 1000)
            ), leg
            assert (
                abs(leg["clusters"] - leg["expected_clusters"])
                <= max(16, leg["expected_clusters"] // 1000)
            ), leg
        rec["efficiency_4_to_16"] = round(
            (rec["4"]["sec"] / rec["16"]["sec"]) / 4, 3
        )
        rec["stage_efficiency"] = {
            k: round((rec["4"]["stages"][k] / rec["16"]["stages"][k]) / 4, 3)
            for k in rec["4"]["stages"]
        }
        pairs.append(rec)
        print(json.dumps(rec), file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "metric": "idle-gated 4->16 dedup-chain pairs (fresh processes, "
                f"legs gated on 1-min load < {max_load})",
                "n_docs": n_docs,
                "pairs": pairs,
                "efficiencies": [p["efficiency_4_to_16"] for p in pairs],
            }
        )
    )


if __name__ == "__main__":
    main()
