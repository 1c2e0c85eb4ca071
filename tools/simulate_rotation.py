"""Simulate the driver's 50-key attestation-window rotation for a
hypothetical next round, BEFORE committing a registry add/retire.

The window takes the first 50 of ``queries()`` (oldest-attestation
first); ``tests/test_oracle_parity.py::test_window_rotation`` enforces
that overflow may only come from the LEAST-stale attested cohort and
that new/touched keys never miss the window.  Round 11 proved the need:
the planned same-round q_dedup_ngram -> q_shard_balance swap simulates
ILLEGAL (one r9 key strands while r10 is least-stale); retire-in-r12 +
register-in-r13 simulate clean.

Usage (from the repo root):

    python tools/simulate_rotation.py                      # status quo
    python tools/simulate_rotation.py --retire q_dedup_ngram
    python tools/simulate_rotation.py --retire q_dedup_ngram \
        --register q_shard_balance
    # chain rounds: apply this round's expected window first
    python tools/simulate_rotation.py --attest-window-first \
        --retire q_dedup_ngram

``--attest-window-first`` transcribes the CURRENT first-50 window as
attested (what the driver will do this round) before applying
retire/register -- i.e. it simulates NEXT round's rotation.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def simulate(last: dict[str, int], new_keys: list[str],
             retired: set[str]) -> str:
    """Replicate test_window_rotation's checks; returns a verdict line
    or raises nothing -- FAIL verdicts are returned, not raised."""
    keys = [k for k in last if k not in retired] + list(new_keys)
    order = sorted(keys, key=lambda k: (last.get(k, 0), k))
    window = set(order[:WINDOW])
    newest = max(last[k] for k in last if k not in retired)
    stale = {k for k in keys if last.get(k, 0) < newest}
    missed = stale - window
    priority = {k for k in stale if k not in last}
    if priority & missed:
        return f"FAIL: new key(s) missed the window: {sorted(priority & missed)}"
    if missed:
        least = max(last[k] for k in stale - priority)
        not_least = {k for k in missed if last.get(k) != least}
        if not_least:
            return (f"FAIL: overflow from non-least-stale cohort "
                    f"{sorted(set(last[k] for k in not_least))} "
                    f"(least-stale is r{least}): {sorted(not_least)[:5]}")
        if not window <= stale:
            return (f"FAIL: window holds fresh keys while stale overflow: "
                    f"{sorted(window - stale)[:5]}")
    return (f"OK: window={len(window)} "
            f"(priority={len(priority & window)}, "
            f"stale cohorts in window={sorted(set(last.get(k, 0) for k in window))}), "
            f"overflow={len(missed)} all from least-stale cohort")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--retire", nargs="*", default=[])
    ap.add_argument("--register", nargs="*", default=[])
    ap.add_argument("--attest-window-first", action="store_true",
                    help="transcribe the current first-50 window as "
                         "attested before applying retire/register "
                         "(simulates NEXT round)")
    args = ap.parse_args()

    from financialtransactionmonitoringsystem_spark import queries as Q

    last = dict(Q.LAST_ATTESTED)
    registry = list(Q.all_queries())

    if args.attest_window_first:
        this_round = max(last.values()) + 1
        for k in registry[:WINDOW]:
            last[k] = this_round
        print(f"(transcribed current window as round {this_round})")

    unknown = [k for k in args.retire if k not in registry]
    if unknown:
        sys.exit(f"--retire names unknown keys: {unknown}")
    # registry keys still unattested after any transcription are
    # priority exactly like --register keys: both go through the
    # new_keys leg so the missed-window check sees them
    new_keys = args.register + [k for k in registry
                                if k not in last and k not in args.retire]
    print(simulate(last, new_keys, set(args.retire)))


if __name__ == "__main__":
    main()
