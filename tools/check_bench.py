#!/usr/bin/env python3
"""Bench regression gate — encodes BASELINE.md's acceptance bound so a
slow round fails loudly instead of relying on manual table reads.

  check_bench.py <bench.json> [prev_bench.json]

Gates (nonzero exit on breach):
  1. zero per-query errors in the run;
  2. analytic total (the "queries" map; "fixtures" reported separately)
     within 2x of the 32.67 s round-1 anchor (BASELINE.md contract);
  3. with a previous round's file: no single query above 2x its previous
     time (hard fail); >1.3x is printed as a warning only — BASELINE.md
     documents ~8% box variance, and sub-1.3x single-query deltas are
     noise at sf0.1.
New queries (absent from prev) are listed, never failed.
"""
import json
import sys

ANCHOR_TOTAL_SEC = 32.67  # BENCH_r01.json total, see BASELINE.md
TOTAL_BOUND = 2.0
PER_QUERY_BOUND = 2.0
PER_QUERY_WARN = 1.3


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    def from_lines(text, path):
        # Bench prints the full per-query line and then a short summary
        # line; a truncated capture may hold only one of them (or a
        # headless fragment). Prefer the line that still has the
        # per-query map, else the summary.
        best = None
        for line in text.splitlines():
            i = line.find('{"metric"')
            if i < 0:
                continue
            try:
                d = json.loads(line[i:])
            except ValueError:
                continue
            if "queries" in d:
                return d
            best = d
        if best is None:
            raise ValueError(f"no bench JSON line found in {path}")
        return best

    def load(path):
        # Accept the raw Bench stdout (1-2 JSON lines), a single
        # extracted JSON object, or the driver's BENCH_rN.json wrapper
        # whose "tail" field embeds the lines in captured stdout. A
        # tail that kept only the summary line is upgraded from the
        # bench_full.json Bench writes beside its run when available.
        import os
        text = open(path).read()
        try:
            d = json.loads(text)
            if "queries" not in d and "tail" in d:
                d = from_lines(d["tail"], path)
        except ValueError:
            d = from_lines(text, path)
        if "queries" not in d:
            full = os.path.join(os.path.dirname(os.path.abspath(path)),
                                "bench_full.json")
            if os.path.exists(full):
                try:
                    fd = json.loads(open(full).read())
                    # Only trust the sidecar if it matches this run's
                    # summary (same sf and total within rounding).
                    if (fd.get("sf") == d.get("sf")
                            and abs(float(fd.get("value", -1))
                                    - float(d.get("value", -2))) < 0.01):
                        print(f"note: per-query map recovered from {full}")
                        return fd
                except (ValueError, OSError):
                    pass
        return d

    cur = load(sys.argv[1])
    prev = load(sys.argv[2]) if len(sys.argv) > 2 else None
    failures = []

    errs = cur.get("errors") or {}
    if errs:
        failures.append(f"{len(errs)} queries errored: {sorted(errs)}")
    elif cur.get("n_errors", 0) > 0:
        # A summary-only capture carries the error COUNT but not the
        # names — without this branch a run with errors whose tail kept
        # only the summary line would sail through gate 1.
        failures.append(f"n_errors={cur['n_errors']} (names not captured)")
    if "queries" not in cur:
        print("degraded: summary-only capture, per-query 2x gate skipped")

    queries = cur.get("queries") or {}
    # A summary-only capture has no per-query map but does carry the total.
    total = sum(queries.values()) if queries else float(cur.get("value", 0.0))
    nq = len(queries) if queries else cur.get("n_queries", 0)
    ratio = total / ANCHOR_TOTAL_SEC
    status = "OK" if ratio <= TOTAL_BOUND else "FAIL"
    print(f"total: {total:.2f}s over {nq} queries = "
          f"{ratio:.2f}x of {ANCHOR_TOTAL_SEC}s anchor "
          f"(bound {TOTAL_BOUND}x) {status}")
    if ratio > TOTAL_BOUND:
        failures.append(f"total {total:.2f}s breaches {TOTAL_BOUND}x anchor")

    if prev is not None:
        pq = prev.get("queries") or {}
        new = sorted(set(queries) - set(pq))
        if new:
            print(f"new queries (no prior time): {', '.join(new)}")
        for name in sorted(set(queries) & set(pq)):
            if pq[name] <= 0:
                continue
            r = queries[name] / pq[name]
            if r > PER_QUERY_BOUND:
                failures.append(
                    f"{name}: {queries[name]:.2f}s = {r:.2f}x of previous "
                    f"{pq[name]:.2f}s (bound {PER_QUERY_BOUND}x)")
            elif r > PER_QUERY_WARN:
                print(f"warn: {name} {pq[name]:.2f}s -> {queries[name]:.2f}s "
                      f"({r:.2f}x)")

    if failures:
        print("\nBENCH GATE FAILED:")
        for f in failures:
            print(f"  - {f}")
        return 1
    print("bench gate passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
