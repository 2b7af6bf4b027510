#!/usr/bin/env python
"""Closing-gate checklist: refuse to close a round with evidence untracked.

The per-round artifact trail (CORRECTNESS_r*.json / BENCH_r*.json /
BENCH_DETAIL.json / LEAKCHECK.json) is the driver's only cumulative
correctness record, and rounds 9 and 10 both closed with those files
untracked (the judge had to commit them). This script IS the ritual the
round-10 verdict asked for: run it as the last step of a round; it
exits non-zero — listing exactly what is missing — unless every
evidence file in the worktree is committed and the tree is clean.

Usage:
    python tools/close_round.py            # check only
    python tools/close_round.py --commit   # stage + commit evidence first
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EVIDENCE_GLOBS = [
    "CORRECTNESS_r*.json",
    "BENCH_r*.json",
    "BENCH_DETAIL.json",
    "BENCH_BUDGETS.json",
    "LEAKCHECK.json",
    "COPYCHECK.json",
    "GATE_SF1.md",
]


def git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


def evidence_files() -> list[str]:
    out: list[str] = []
    for g in EVIDENCE_GLOBS:
        out.extend(sorted(os.path.relpath(p, REPO) for p in glob.glob(os.path.join(REPO, g))))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commit", action="store_true",
                    help="stage and commit evidence files before checking")
    args = ap.parse_args()

    ev = evidence_files()
    if args.commit:
        dirty = [f for f in ev if git("status", "--porcelain", "--", f).strip()]
        if dirty:
            git("add", "--", *dirty)
            git("commit", "-m",
                "Record round evidence artifacts\n\n"
                "Closing-gate ritual (tools/close_round.py): the per-round\n"
                "CORRECTNESS/BENCH trail is the cumulative correctness record.")

    problems: list[str] = []
    for f in ev:
        status = git("status", "--porcelain", "--", f).strip()
        if status:
            problems.append(f"evidence file not committed: {status}")
    untracked = git("ls-files", "--others", "--exclude-standard").strip()
    if untracked:
        problems.append("untracked files in worktree:\n  " +
                        "\n  ".join(untracked.splitlines()))
    modified = git("status", "--porcelain").strip()
    if modified:
        problems.append("worktree not clean:\n  " + "\n  ".join(modified.splitlines()))

    if problems:
        print("ROUND NOT CLOSED — fix these first:")
        for p in problems:
            print(" -", p)
        return 1
    print(f"round close OK: {len(ev)} evidence files committed, worktree clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
