"""Run the test tiers and record the result as TESTS_r{N}.json (VERDICT r4
item 10): each round's parity claims should carry their proof as a
committed artifact alongside BENCH_r*/MULTICHIP_r*.

Tiers:
- smoke:  cold-machine verification (torch-parity fwd, 2-step training
          dynamics, sharded grads) — tests/conftest.py's ``-m smoke``.
- light:  the op/data tier (everything not marked heavy) on forced CPU.

Usage: python tools/make_tests_artifact.py ROUND [--skip-light]
"""

import argparse
import json
import platform
import re
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def run_tier(name, args, timeout):
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", *args],
            cwd=ROOT, capture_output=True, text=True, timeout=timeout)
        tail = (proc.stdout or "").strip().splitlines()[-1:]
        summary = tail[0] if tail else ""
        counts = dict(
            (kind, int(n)) for n, kind in re.findall(
                r"(\d+) (passed|failed|skipped|deselected|error)", summary))
        return {
            "tier": name,
            "returncode": proc.returncode,
            "summary": summary,
            "counts": counts,
            "seconds": round(time.time() - t0, 1),
        }
    except subprocess.TimeoutExpired:
        return {"tier": name, "returncode": -1, "summary": "TIMEOUT",
                "counts": {}, "seconds": round(time.time() - t0, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("round", type=int)
    ap.add_argument("--skip-light", action="store_true")
    ap.add_argument("--no-heavy", action="store_true",
                    help="deselect the heavy tier from the light run "
                         "(single-CPU hosts can't fit its multi-minute "
                         "XLA:CPU compiles); the tier name records this")
    ap.add_argument("--light-timeout", type=int, default=1800)
    args = ap.parse_args()

    tiers = [run_tier("smoke", ["-m", "smoke", "tests/"], 900)]
    if not args.skip_light:
        if args.no_heavy:
            tiers.append(run_tier("light (not heavy)",
                                  ["-m", "not heavy", "tests/"],
                                  args.light_timeout))
        else:
            tiers.append(run_tier("light", ["tests/"], args.light_timeout))

    out = {
        "round": args.round,
        "host": platform.node(),
        "machine": platform.machine(),
        "cpus": __import__("os").cpu_count(),
        "python": platform.python_version(),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "tiers": tiers,
        "ok": all(t["returncode"] == 0 for t in tiers),
    }
    path = ROOT / f"TESTS_r{args.round:02d}.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))
    sys.exit(0 if out["ok"] else 1)


if __name__ == "__main__":
    main()
