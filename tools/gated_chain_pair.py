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
    # --cpus A,B picks the N and 4N legs (default 4,16). 2,8 sits further
    # below this box's DRAM roofline — the informative pair moves DOWN the
    # ladder as the per-CPU code gets faster (BASELINE.md roofline notes).
    legs = (4, 16)
    if "--cpus" in sys.argv:
        a, b = sys.argv[sys.argv.index("--cpus") + 1].split(",")
        legs = (int(a), int(b))
    assert legs[1] == 4 * legs[0], "pair must be N and 4N"

    pairs = []
    for i in range(n_pairs):
        rec: dict = {"pair": i}
        for ncpu in legs:
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
        lo, hi = str(legs[0]), str(legs[1])
        rec["efficiency_n_to_4n"] = round(
            (rec[lo]["sec"] / rec[hi]["sec"]) / 4, 3
        )
        rec["stage_efficiency"] = {
            k: round((rec[lo]["stages"][k] / rec[hi]["stages"][k]) / 4, 3)
            for k in rec[lo]["stages"]
        }
        pairs.append(rec)
        print(json.dumps(rec), file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "metric": f"idle-gated {legs[0]}->{legs[1]} dedup-chain pairs "
                f"(fresh processes, legs gated on 1-min load < {max_load})",
                "n_docs": n_docs,
                "pairs": pairs,
                "efficiencies": [p["efficiency_n_to_4n"] for p in pairs],
            }
        )
    )


if __name__ == "__main__":
    main()
