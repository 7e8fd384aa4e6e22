"""Idle-gated 4->16 scaling pairs for the shared-host witness protocol.

Runs the pyramid-only bench leg (fresh process per leg, via bench.py's
GRAFT_PYRAMID_ONLY mode) alternating 4 / 16 CPUs, but GATES each leg on
host idleness: it waits until the 1-min load average drops below
--max-load (default 0.5) before launching, so a leg never starts inside
another tenant's burst. BASELINE.md's eighth-witness analysis showed
absolute leg times swing 1.6x with invisible external consumers; gating
both legs of a pair on the same idleness criterion is the cheapest way
to make the RATIO trustworthy. Both raw times and the per-pair
efficiency are printed as one JSON line.

Usage: python tools/gated_pair.py [n_pairs] [--max-load L] [--max-wait S]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def wait_idle(max_load: float, max_wait: float) -> float:
    """Block until 1-min load < max_load; return the load seen (or the
    last sample if max_wait expires — the leg still runs, load reported)."""
    t0 = time.time()
    while True:
        load = os.getloadavg()[0]
        if load < max_load or time.time() - t0 > max_wait:
            return load
        time.sleep(15.0)


def run_leg(ncpu: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_PYRAMID_ONLY="1")
    out = subprocess.run(
        [sys.executable, BENCH], env=env, capture_output=True, text=True, check=True
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_pairs = int(args[0]) if args else 2
    max_load = 0.5
    max_wait = 600.0
    if "--max-load" in sys.argv:
        max_load = float(sys.argv[sys.argv.index("--max-load") + 1])
    if "--max-wait" in sys.argv:
        max_wait = float(sys.argv[sys.argv.index("--max-wait") + 1])
    # --cpus A,B picks the N and 4N legs (default 4,16). 2,8 sits further
    # below this box's DRAM roofline — the informative pair moves DOWN
    # the ladder as the per-CPU code gets faster (BASELINE.md).
    legs = (4, 16)
    if "--cpus" in sys.argv:
        a, b = sys.argv[sys.argv.index("--cpus") + 1].split(",")
        legs = (int(a), int(b))
    assert legs[1] == 4 * legs[0], "pair must be N and 4N"

    pairs = []
    lo, hi = str(legs[0]), str(legs[1])
    for i in range(n_pairs):
        rec: dict = {"pair": i}
        for ncpu in legs:
            gate_load = wait_idle(max_load, max_wait)
            leg = run_leg(ncpu)
            rec[str(ncpu)] = {
                "sec": leg["value"],
                "tiles_per_sec": leg.get("tiles_per_sec"),
                "gate_load": round(gate_load, 2),
                "load_after": leg.get("load_avg_after"),
            }
        rec["efficiency_n_to_4n"] = round(
            (rec[lo]["sec"] / rec[hi]["sec"]) / 4, 3
        )
        pairs.append(rec)
        print(json.dumps(rec), file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "metric": f"idle-gated {legs[0]}->{legs[1]} pyramid pairs "
                f"(fresh processes, legs gated on 1-min load < {max_load})",
                "pairs": pairs,
                "efficiencies": [p["efficiency_n_to_4n"] for p in pairs],
            }
        )
    )


if __name__ == "__main__":
    main()
