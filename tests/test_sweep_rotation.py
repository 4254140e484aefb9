"""Guard the sweep-rotation machinery (VERDICT r8 "what's wrong" #4):
`_SWEEP_PRIORITY` is load-bearing for the driver-evidence contract —
the driver's CORRECTNESS sweep covers the FIRST 50 registered queries,
and `registry.promote()` applies the list at import. A stale name only
failed at import before; nothing checked the list's INVARIANTS:
full-registry coverage without duplicates, and every name that still
lacks a driver row sitting inside the 50-slot window (otherwise debt
silently survives the round the rotation claimed to retire it)."""

from __future__ import annotations

import glob
import json
import os
import re

import empdia_iceberg_spark
from empdia_iceberg_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50  # driver sweeps exactly this many names per round (r2+)


def _driver_swept() -> set:
    swept = set()
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(f) as fh:
            swept |= set(json.load(fh))
    return swept


def test_sweep_priority_is_a_permutation_of_the_registry():
    names = list(registry.specs())
    pri = empdia_iceberg_spark._SWEEP_PRIORITY
    assert len(pri) == len(set(pri)), "duplicate names in _SWEEP_PRIORITY"
    assert sorted(pri) == sorted(names), (
        "_SWEEP_PRIORITY must cover the registry exactly once (promote() "
        "catches unknown names but not omissions, which silently fall to "
        "module-import order at the tail)"
    )


def test_all_never_swept_names_sit_inside_the_driver_window():
    window = list(registry.specs())[:WINDOW]
    never = {n for n in registry.specs() if n not in _driver_swept()}
    outside = never - set(window)
    assert not outside, (
        f"{len(outside)} never-driver-swept queries are outside the "
        f"{WINDOW}-slot sweep window and would miss this round's "
        f"CORRECTNESS rows: {sorted(outside)}"
    )


def test_sweep_comment_round_matches_latest_correctness_file():
    """The arithmetic comment above _SWEEP_PRIORITY must be for the
    CURRENT round (latest COMMITTED CORRECTNESS_r{N}.json + 1) — a stale
    comment means the rotation was not rethought this round.

    Only committed artifacts count (r9 ADVICE): the driver drops the
    current round's own CORRECTNESS file as an untracked artifact
    mid-round, and counting it would flip this suite red on every
    artifact-bearing checkout. Gating on ``git ls-files`` makes the
    forcing function fire at the START of the next code round (when the
    round-N artifacts get committed) instead. Falls back to the glob if
    git is unavailable (fresh tarball)."""
    import subprocess

    try:
        tracked = subprocess.run(
            ["git", "ls-files", "CORRECTNESS_r*.json"],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.split()
        files = [os.path.join(REPO, f) for f in tracked]
    except (OSError, subprocess.CalledProcessError):
        files = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    rounds = [
        int(re.search(r"_r(\d+)", os.path.basename(f)).group(1)) for f in files
    ]
    if not rounds:  # fresh clone without driver artifacts
        return
    current = max(rounds) + 1
    src = open(os.path.join(REPO, "empdia_iceberg_spark", "__init__.py")).read()
    m = re.search(r"# ROUND (\d+) ARITHMETIC", src)
    assert m, "rotation arithmetic comment missing"
    assert int(m.group(1)) == current, (
        f"rotation comment says round {m.group(1)} but driver artifacts "
        f"say the current round is {current} — rotate _SWEEP_PRIORITY first"
    )
