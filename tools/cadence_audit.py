"""Cadence ledger audit: recompute every registered row's driver-hash
history straight from the in-repo CORRECTNESS_r*.json files and print
the per-row absence table the ROTATION_LEDGER cites.

Why this exists (r12 verdict item 4): the ledger's "due by rN" prose
was derived by hand from ROTATION round numbers ("rotated out in r7")
instead of LAST-HASH round numbers ("last green hash r6"), producing
an off-by-one that let 10 rows hit the 6-absence tripwire one round
earlier than the prose predicted. The bound is driven by
``max(hashed_rounds)``, the same arithmetic
tests/test_oracle.py::test_no_full_oracle_row_skips_driver_hashing_
beyond_cadence enforces — so this tool shares that computation and the
ledger copies ITS output, never hand arithmetic.

Usage::

    python tools/cadence_audit.py            # full table
    python tools/cadence_audit.py --due 2    # only rows due within 2 rounds

Columns: row, last-hash round, absences entering the NEXT round if the
row stays outside the window, the latest round whose window must
include it, and its current status (in-window / retired-twin /
rows-only / ok / DUE / OVERDUE).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def hash_history(repo: pathlib.Path) -> dict[int, set[str]]:
    """round -> set of query names hashed green that round."""
    rounds: dict[int, set[str]] = {}
    for p in sorted(repo.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.name)
        if m:
            rounds[int(m.group(1))] = set(json.loads(p.read_text()))
    return rounds


def audit_rows(
    repo: pathlib.Path, rounds: "dict[int, set[str]] | None" = None
) -> list[dict]:
    """One dict per registered full-oracle row, sorted most-urgent
    first. ``absent_next`` counts consecutive missed rounds as of the
    IN-FLIGHT round (max recorded + 1) assuming the row is NOT in its
    window — the exact quantity the meta-test bounds — and
    ``due_round`` is the last round whose window can still satisfy the
    cadence (last_hash + CADENCE_MAX_ABSENT). Mirrors the meta-test's
    verdicts exactly: a never-hashed full-oracle row outside the
    window with no CAPACITY_DEFERRED entry is a VIOLATION the test
    fails immediately, so the audit reports it OVERDUE (exit 1), not
    as a benign due date."""
    from flink_kafka_spark.queries import DRIVER_WINDOW, all_queries
    from tests.test_oracle import (
        CADENCE_DEBT,
        CADENCE_MAX_ABSENT,
        CAPACITY_DEFERRED,
        RETIRED_TWINS,
    )

    if rounds is None:
        rounds = hash_history(repo)
    current = max(rounds) + 1
    rows = []
    for name, q in all_queries().items():
        hashed = sorted(r for r, names in rounds.items() if name in names)
        last = hashed[-1] if hashed else None
        entry = {
            "row": name,
            "oracle": q.oracle is not None,
            "last_hash": last,
            "absent_next": None if last is None else current - last,
            "due_round": None,
            "status": "rows-only",
        }
        if q.oracle is None:
            rows.append(entry)
            continue
        # meta-test check order: the never-hashed verdict comes BEFORE
        # the retired-twin exemption — a twin retired in the round it
        # was registered (no hash anywhere) is still the r9 bug class
        if last is None:
            if name in DRIVER_WINDOW:
                entry["due_round"] = current
                entry["status"] = "in-window"
            elif name not in CAPACITY_DEFERRED:
                # the meta-test fails this state immediately (the r9
                # dropped-registration bug class) — no benign due date
                entry["due_round"] = current
                entry["status"] = "OVERDUE (never hashed, not deferred)"
            else:
                deadline = CAPACITY_DEFERRED[name] + 3
                entry["due_round"] = deadline
                entry["status"] = (
                    "OVERDUE" if current > deadline else "DUE (deferred)"
                )
        elif name in RETIRED_TWINS:
            entry["status"] = "retired-twin"
        else:
            entry["due_round"] = last + CADENCE_MAX_ABSENT
            if name in CADENCE_DEBT:
                entry["due_round"] = CADENCE_DEBT[name]
            if name in DRIVER_WINDOW:
                entry["status"] = "in-window"
            elif current > entry["due_round"]:
                entry["status"] = "OVERDUE"
            elif current == entry["due_round"]:
                entry["status"] = "DUE"
            else:
                entry["status"] = f"ok ({entry['due_round'] - current} slack)"
        rows.append(entry)
    rows.sort(
        key=lambda e: (
            e["due_round"] is None,
            e["due_round"] if e["due_round"] is not None else 0,
            e["row"],
        )
    )
    return rows


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--due", type=int, default=None,
        help="only show rows whose due_round is within N rounds of the in-flight round",
    )
    args = ap.parse_args()
    repo = pathlib.Path(__file__).resolve().parent.parent
    rounds = hash_history(repo)
    current = max(rounds) + 1
    rows = audit_rows(repo, rounds)
    print(f"# cadence audit — in-flight round r{current} "
          f"(recorded: r{min(rounds)}..r{max(rounds)})")
    shown = 0
    print(f"{'row':40s} {'last':>5s} {'absent':>6s} {'due':>5s}  status")
    for e in rows:
        if args.due is not None and not (
            e["due_round"] is not None and e["due_round"] - current <= args.due
        ):
            continue
        shown += 1
        last = f"r{e['last_hash']}" if e["last_hash"] is not None else "-"
        due = f"r{e['due_round']}" if e["due_round"] is not None else "-"
        absent = str(e["absent_next"]) if e["absent_next"] is not None else "-"
        print(f"{e['row']:40s} {last:>5s} {absent:>6s} {due:>5s}  {e['status']}")
    overdue = [e for e in rows if e["status"].startswith("OVERDUE")]
    print(f"# {shown} rows shown; {len(overdue)} OVERDUE")
    return 1 if overdue else 0


if __name__ == "__main__":
    raise SystemExit(main())
