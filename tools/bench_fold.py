#!/usr/bin/env python3
"""Fold serial bench runs into the round-scoped record board.

Usage:
  python3 tools/bench_fold.py <round> <out.json> <warm_run.json>... \
      [--cold cold.json] [--cold-single cs.json] [--concurrent conc.json]

Reads the full-JSON outputs Bench writes (SPARK_GRAFT_BENCH_OUT), takes
the per-query MIN across the warm runs, archives the previous board
under prior_rounds, and writes the new round-scoped record. The record
is ROUND-SCOPED by policy: reset each round so a regression cannot hide
under a prior round's min (VERDICT r13 #5).

Inputs must be the FILE artifacts, never a captured stdout line: the
stdout copy is precision-adaptive (its "prec" field says how many
decimals survived — at prec<3 per-query values drift up to ~0.05s from
the file's 3-decimal truth), so folding it would bake rounding error
into the record (ADVICE r17). Enforced below: a run carrying "prec"<3
is refused.
"""
import json
import sys


def load_run(path):
    r = json.load(open(path))
    # the stdout copy is reduced-precision (it says so via "prec"); only
    # the SPARK_GRAFT_BENCH_OUT file (full 3-decimal, host-evidence
    # arrays present) may be folded into the record (ADVICE r17)
    if r.get("prec", 3) < 3 or "load" not in r:
        sys.exit(f"{path}: looks like a captured stdout line "
                 f"(prec={r.get('prec')}, load={'load' in r}) - fold the "
                 "SPARK_GRAFT_BENCH_OUT file instead")
    return r


def main():
    args = sys.argv[1:]
    rnd = int(args[0])
    out_path = args[1]
    warm, cold, cold_single, conc = [], None, None, None
    i = 2
    while i < len(args):
        if args[i] == "--cold":
            cold = load_run(args[i + 1]); i += 2
        elif args[i] == "--cold-single":
            cold_single = load_run(args[i + 1]); i += 2
        elif args[i] == "--concurrent":
            conc = load_run(args[i + 1]); i += 2
        else:
            warm.append(load_run(args[i])); i += 1

    # Re-folding the SAME round (the documented workflow: a round's board
    # is folded repeatedly as runs accumulate) replaces the board in
    # place — archiving it would shadow the round under its own
    # prior_rounds key. A first-ever board (no "round") archives nothing.
    try:
        prev = json.load(open(out_path))
    except FileNotFoundError:
        prev = {}
    prior = prev.pop("prior_rounds", {})
    prev_round = prev.pop("round", None)
    if prev and prev_round is None:
        # a legacy/hand-edited board without "round": archive rather
        # than silently discard (review r17)
        prior["unversioned"] = prev
    elif prev and prev_round != rnd:
        prior[f"r{prev_round}"] = prev

    names = sorted({n for r in warm for n in r["queries"]})
    queries = {n: min(r["queries"][n] for r in warm if n in r["queries"])
               for n in names}
    board = {
        "metric": "total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "stat": (f"per-query min across {len(warm)} round-{rnd} serial runs "
                 "(ROUND-SCOPED record: reset each round so a regression "
                 "cannot hide under a prior round's min); each run "
                 "load-stamped; warmups=1 untimed rep/query and shared-memo "
                 "sparing per the warmups/memo_spared markers"),
        "round": rnd,
        "comparable": True,
        "load": [r.get("load") for r in warm],
        "nproc": [r.get("nproc") for r in warm],
        "failed": sorted({f for r in warm for f in r.get("failed", [])}),
        "sf": warm[0].get("sf"),
        "warmups": warm[0].get("warmups"),
        "memo_spared": warm[0].get("memo_spared"),
        "queries": queries,
    }
    if cold:
        board["cold_total"] = cold["value"]
        board["cold_load"] = cold.get("load")
        board["cold_nproc"] = cold.get("nproc")
        board["cold_warmups"] = cold.get("warmups")
    if cold_single:
        board["cold_single_total"] = cold_single["value"]
        board["cold_single_load"] = cold_single.get("load")
    board["cold_single_note"] = (
        "cold_total = fresh JVM, min of 3 timed reps, no untimed warmup; "
        "cold_single_total = one timed rep per query in a fresh JVM")
    if conc:
        board["concurrent_streams"] = conc.get("concurrent_streams")
        board["concurrent_wall_sec"] = conc.get("concurrent_wall_sec")
    board["prior_rounds"] = prior
    json.dump(board, open(out_path, "w"), indent=1)
    prev_note = (f"(prev r{prev_round}: {prior[f'r{prev_round}']['value']}s)"
                 if f"r{prev_round}" in prior else "(no prior board)")
    print(f"round {rnd}: {len(queries)} queries, total {board['value']}s "
          f"{prev_note}")


if __name__ == "__main__":
    main()
