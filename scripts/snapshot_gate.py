#!/usr/bin/env python
"""Snapshot gate: refuse to snapshot on a red test suite.

Runs the default test suite in a fresh process (``python -m pytest tests/ -q``)
and exits non-zero if it fails — the suite run also refreshes
``SLOW_TIER.json.last_run``, so a green gate leaves ``exitstatus: 0`` on
record in the committed artifact.  Use before any end-of-round snapshot:

    python scripts/snapshot_gate.py            # default tier only
    python scripts/snapshot_gate.py --slow     # also run the slow tier
    python scripts/snapshot_gate.py --bench-ar # refresh BENCH_AR_MODELS.json first
    python scripts/snapshot_gate.py --commit -m "msg"   # gate, then commit

With ``--commit`` the script stages everything and commits ONLY if the suite
is green; a red suite aborts before any git state changes.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_suite(slow: bool) -> int:
    env = dict(os.environ)
    if slow:
        env["TTS_RUN_SLOW"] = "1"
    print(f" > gate: running pytest tests/ -q (slow tier: {slow})", flush=True)
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q"], cwd=REPO, env=env
    )
    return proc.returncode


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--slow", action="store_true", help="also run the slow tier")
    parser.add_argument("--bench-ar", action="store_true",
                        help="regenerate BENCH_AR_MODELS.json (end-to-end Tortoise/"
                             "Bark RTF on the live backend) before gating")
    parser.add_argument("--commit", action="store_true",
                        help="git add -A && git commit -m MSG if (and only if) green")
    parser.add_argument("-m", "--message", default="snapshot: gated green suite")
    args = parser.parse_args()

    if args.bench_ar:
        print(" > gate: refreshing BENCH_AR_MODELS.json", flush=True)
        r = subprocess.run([sys.executable, "bench_ar.py"], cwd=REPO)
        if r.returncode != 0:
            print(" > gate: bench_ar FAILED — refusing to snapshot", flush=True)
            return r.returncode

    rc = run_suite(slow=args.slow)
    if rc != 0:
        print(f" > gate: RED (pytest exit {rc}) — refusing to snapshot", flush=True)
        return rc
    print(" > gate: GREEN", flush=True)
    if args.commit:
        subprocess.run(["git", "add", "-A"], cwd=REPO, check=True)
        r = subprocess.run(["git", "commit", "-m", args.message], cwd=REPO)
        return r.returncode
    return 0


if __name__ == "__main__":
    sys.exit(main())
