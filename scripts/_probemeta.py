"""Reproducibility metadata every committed probe JSON must carry
(VERDICT r4 #7: a committed perf number without its exact reproduce
command, commit hash and run spread cannot be trusted — the round-4
12.38 ms sharded-seg record was off by 6x and nothing could say why).

Usage:
    from scripts._probemeta import probe_meta
    result.update(probe_meta())          # commit, reproduce, date
    result["ms_per_step_runs"] = [...]   # report the SPREAD, not one shot
"""

import datetime
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def probe_meta() -> dict:
    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
        capture_output=True, text=True,
    ).stdout.strip()
    dirty = bool(
        subprocess.run(
            ["git", "status", "--porcelain", "-uno"], cwd=REPO,
            capture_output=True, text=True,
        ).stdout.strip()
    )
    script = pathlib.Path(sys.argv[0]).name
    return {
        "commit": commit + ("-dirty" if dirty else ""),
        "reproduce": "python scripts/" + script + (
            " " + " ".join(sys.argv[1:]) if len(sys.argv) > 1 else ""
        ),
        "date": datetime.date.today().isoformat(),
    }
