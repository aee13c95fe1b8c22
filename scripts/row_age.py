#!/usr/bin/env python3
"""Row-age ledger: diff CORRECTNESS_r*.json against the query registry and
emit, per query, the last round with a fully-green driver row — plus a
per-query OUTPUT FINGERPRINT that mechanically flags queries whose output
changed after their last green driver row.

Outputs:
  1. a human report on stdout (age histogram + stale/never-verified +
     changed-output lists),
  2. (with --write) regenerates
     adventureworkslakehousepoc_spark/queries/_row_age.py — the static
     LAST_VERIFIED / CHANGED_OUTPUT / FINGERPRINT tables the registry
     ordering derives the next driver window from. Making age AND
     change-detection mechanical keeps every future window trivially
     correct: rounds 4 and 5 overflowed hand-planned windows, and the
     hand-maintained changed-output list silently missed
     text_boilerplate_flags for two rounds.

A row counts as green only if rows+schema(+hash when present) all match —
the same bar the judge applies.

Fingerprints are sha256(oracle SQL text + canonical DuckDB result at
sf0.001) — DuckDB-only, no Spark session needed (~20 s for the full
registry). A query is flagged changed-output when its fingerprint differs
from the previous ledger's AND the change is not already attested by a
green driver row from the round the change shipped in. Flags persist
across regenerations until a fresh driver row lands.

Run (and commit the regenerated module) once per round after the driver
drops the new CORRECTNESS file — and again any time an edit changes a
query's output mid-round (tests/test_registry.py enforces both).
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import importlib.util
import json
import os
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODULE = os.path.join(
    REPO, "adventureworkslakehousepoc_spark", "queries", "_row_age.py"
)
SF_DIR = "/root/testdata/sf0.001"


def collect_last_verified(repo: str = REPO) -> dict[str, int]:
    """Latest round, per query, with a fully-green driver CORRECTNESS row."""
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r0*(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, r in rows.items():
            green = (
                r.get("rows_match") is True
                and r.get("schema_match") is True
                # rows-only checks (no oracle) report hash_match null
                and r.get("hash_match") in (True, None)
            )
            if green:
                last[name] = max(last.get(name, 0), rnd)
    return last


def compute_fingerprints(sf_dir: str = SF_DIR) -> dict[str, str]:
    """sha256(oracle SQL + canonical DuckDB sf0.001 result) per query —
    the observable output identity the driver's hash gate attests. DuckDB
    replays the oracle, so this needs no Spark session; any edit that
    changes either the oracle text or the values it produces changes the
    fingerprint."""
    from adventureworkslakehousepoc_spark.queries import all_oracles
    from tests.oracle_compare import canonical_rows, duckdb_connection

    con = duckdb_connection(sf_dir)
    fps: dict[str, str] = {}
    for name, sql in all_oracles().items():
        pdf = con.execute(sql).df()
        h = hashlib.sha256()
        h.update(sql.encode())
        for row in canonical_rows(pdf):
            h.update(repr(row).encode())
        fps[name] = h.hexdigest()[:16]
    return fps


def _load_previous_module():
    """The committed _row_age.py as a standalone module (loaded by path so
    a partially-imported package can't shadow it)."""
    spec = importlib.util.spec_from_file_location("_row_age_prev", MODULE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def derive_changed_output(
    last: dict[str, int],
    current_round: int,
    new_fp: dict[str, str],
    prev,
) -> list[str]:
    """Queries whose output changed after their last green driver row.

    A fingerprint drift is ATTESTED (not flagged) only when this is the
    first regeneration after a new driver round landed AND the query got a
    green row in that round — the driver ran the post-change code, so the
    green row covers the new behavior. A drift detected at a mid-round
    regeneration (GENERATED_AFTER_ROUND already == latest driver round)
    can never be attested: the edit necessarily post-dates the driver run.
    Previously-flagged queries stay flagged until attested the same way.
    """
    old_fp = dict(getattr(prev, "FINGERPRINT", {}))
    old_changed = set(getattr(prev, "CHANGED_OUTPUT", ()))
    first_regen_after_new_round = (
        getattr(prev, "GENERATED_AFTER_ROUND", -1) < current_round
    )

    def attested(q: str) -> bool:
        return first_regen_after_new_round and last.get(q) == current_round

    carried = {q for q in old_changed if q in new_fp and not attested(q)}
    drifted = {
        q
        for q in new_fp
        if q in old_fp and new_fp[q] != old_fp[q] and not attested(q)
    }
    return sorted(carried | drifted)


def render_module(
    last: dict[str, int],
    current_round: int,
    changed: list[str],
    fps: dict[str, str],
) -> str:
    lines = [
        '"""AUTO-GENERATED by scripts/row_age.py — do not edit by hand.',
        "",
        "LAST_VERIFIED: per-query last round with a fully-green driver",
        "CORRECTNESS row (rows+schema+hash). Queries absent from this table",
        "have NEVER been driver-verified and sort to the front of the next",
        "driver window.",
        "",
        "CHANGED_OUTPUT: queries whose output fingerprint drifted after",
        "their last green driver row — fronted right behind never-verified.",
        "",
        "FINGERPRINT: sha256(oracle SQL + canonical DuckDB sf0.001 result)",
        "prefix per query; drift against this table is what flags",
        "CHANGED_OUTPUT at the next regeneration.",
        '"""',
        "",
        f"GENERATED_AFTER_ROUND = {current_round}",
        "",
        "LAST_VERIFIED = {",
    ]
    for name in sorted(last):
        lines.append(f'    "{name}": {last[name]},')
    lines.append("}")
    lines.append("")
    lines.append("CHANGED_OUTPUT = (")
    for name in changed:
        lines.append(f'    "{name}",')
    lines.append(")")
    lines.append("")
    lines.append("FINGERPRINT = {")
    for name in sorted(fps):
        lines.append(f'    "{name}": "{fps[name]}",')
    lines.append("}")
    lines.append("")
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--write", action="store_true", help="regenerate _row_age.py")
    args = ap.parse_args()

    prev = _load_previous_module()
    last = collect_last_verified()
    current_round = max(last.values(), default=0)

    sys.path.insert(0, REPO)
    from adventureworkslakehousepoc_spark.queries import all_oracles

    registry = list(all_oracles())
    fps = compute_fingerprints()
    changed = derive_changed_output(last, current_round, fps, prev)
    never = [q for q in registry if q not in last]
    ages = Counter(last[q] for q in registry if q in last)

    print(f"registry: {len(registry)} queries; latest driver round: r{current_round}")
    print("last-verified histogram:", dict(sorted(ages.items())))
    print(f"never driver-verified: {len(never)}")
    for q in never:
        print(f"  NEVER  {q}  (pos {registry.index(q)})")
    print(f"changed-output (fingerprint drift, unattested): {len(changed)}")
    for q in changed:
        print(f"  CHANGED  {q}")
    stale = sorted(
        (q for q in registry if q in last and last[q] <= current_round - 2),
        key=lambda q: (last[q], q),
    )
    print(f"stale (older than r{current_round - 1}): {len(stale)}")
    for q in stale[:60]:
        print(f"  r{last[q]}  {q}")
    if len(stale) > 60:
        print(f"  ... and {len(stale) - 60} more")

    if args.write:
        with open(MODULE, "w") as f:
            f.write(render_module(last, current_round, changed, fps))
        print(f"wrote {MODULE}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
