#!/usr/bin/env python
# scripts/ci_lanes.py — split the test suite into CI lanes.
#
# Reference behavior being matched (not copied):
# /root/reference/scripts/ci_pytest_lane.py:95-100 — a `fast` profile
# running the focused contract files in a couple of minutes, and a `full`
# profile running everything, with slow tests split out.
#
# Usage:
#   python scripts/ci_lanes.py --profile fast          # <~2 min contracts
#   python scripts/ci_lanes.py --profile full          # everything
#   python scripts/ci_lanes.py --profile full-noslow   # full minus @slow
#   python scripts/ci_lanes.py --list                  # show lane contents

from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

# Fast lane: unit math, contracts, policy gates, codecs — no renders that
# re-jit large programs. Keep this under ~2 minutes on CPU.
FAST_LANE = [
    "tests/test_core.py",
    "tests/test_policy_gates.py",
    "tests/test_assurance.py",
    "tests/test_codec.py",
    "tests/test_laz.py",
    "tests/test_geo.py",
    "tests/test_round2_fixes.py",
    "tests/test_lightsample.py",
    "tests/test_hosek.py",
    "tests/test_misc_modules.py",
]


def run(args: list[str]) -> int:
    cmd = [sys.executable, "-m", "pytest", "-q", *args]
    print("+", " ".join(cmd), flush=True)
    return subprocess.call(cmd, cwd=ROOT)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", choices=["fast", "full", "full-noslow"],
                    default="fast")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("extra", nargs="*", help="extra pytest args")
    ns, unknown = ap.parse_known_args()
    ns.extra = [*ns.extra, *unknown]  # pass flags like -x through to pytest

    if ns.list:
        print("fast lane:")
        for f in FAST_LANE:
            print("  ", f)
        print("full lane: tests/ (everything)")
        return 0

    if ns.profile == "fast":
        # -m 'not slow' keeps any future slow-marked test out of the lane
        return run([*FAST_LANE, "-m", "not slow", *ns.extra])
    if ns.profile == "full-noslow":
        return run(["tests/", "-m", "not slow", *ns.extra])
    return run(["tests/", *ns.extra])


if __name__ == "__main__":
    raise SystemExit(main())
