#!/usr/bin/env python3
"""Per-query bench regression diff: compare two bench artifacts and
print a markdown table of movers, so a q32-style anomaly is caught in
the round it appears instead of costing judge adjudication.

Usage:
  python3 tools/bench_diff.py BENCH_r05.json BENCH_r06.json [--thresh 0.1]

Accepts either the driver's BENCH_r{N}.json wrapper (reads .parsed,
falling back to the last JSON object embedded in .tail for rounds the
driver failed to parse) or a raw one-line bench JSON from
`runMain graft.Bench`.
"""
import json, re, sys


def load_queries(path):
    text = open(path).read()
    doc = json.loads(text)
    if "queries" in doc:  # raw bench line
        return doc["queries"], doc.get("value")
    parsed = doc.get("parsed")
    if parsed and parsed.get("queries"):
        return parsed["queries"], parsed.get("value")
    # driver recorded parsed=null: fish the line out of the tail
    tail = doc.get("tail", "")
    # pre-round-6 lines carried "sf":"sf0.1" (string) and extra fields
    for m in reversed(re.findall(r'\{"metric".*?"sf":(?:"[^"]*"|[0-9.]+)\}', tail)):
        try:
            line = json.loads(m)
            return line["queries"], line.get("value")
        except Exception:
            continue
    raise SystemExit(f"{path}: no parseable bench line")


def fam(key):
    """Bench lines may carry prefix keys (q21) or full names
    (q21_percentiles) depending on the fit tier — normalize."""
    return key.split("_", 1)[0]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thresh = 0.1
    for a in sys.argv[1:]:
        if a.startswith("--thresh"):
            thresh = float(a.split("=", 1)[1]) if "=" in a else thresh
    old_path, new_path = args
    old_q, old_total = load_queries(old_path)
    new_q, new_total = load_queries(new_path)
    old = {fam(k): v for k, v in old_q.items()}
    new = {fam(k): v for k, v in new_q.items()}

    shared = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    movers = [(k, old[k], new[k], new[k] - old[k]) for k in shared
              if abs(new[k] - old[k]) >= thresh]
    movers.sort(key=lambda t: -abs(t[3]))

    print(f"# bench diff: {old_path} -> {new_path}")
    so, sn = sum(old[k] for k in shared), sum(new[k] for k in shared)
    print(f"\nshared {len(shared)} queries: {so:.2f}s -> {sn:.2f}s "
          f"({sn / so:.2f}x); totals {old_total} -> {new_total}")
    if added:
        print(f"new: {', '.join(added)} "
              f"(+{sum(new[k] for k in added):.2f}s combined)")
    if removed:
        print(f"removed: {', '.join(removed)}")
    if movers:
        print(f"\n| query | {old_path} | {new_path} | delta |")
        print("| --- | --- | --- | --- |")
        for k, o, n, d in movers:
            print(f"| {k} | {o:.2f} | {n:.2f} | {d:+.2f} |")
    else:
        print(f"\nno per-query move >= {thresh}s")
    # exit 1 when a shared query regressed by >= max(thresh, 2x) —
    # wire-able into a round's gate, per BENCH_DIFF_r08_to_r09.md's
    # counting rule: ratio over floored values (FLOOR = 0.05 s noise
    # floor), and failure STUBS excluded from the shared-live set.
    # A stub is a near-zero old reading (the round-8 artifact recorded
    # ~0.01 s for every ts-broken query — reviving them must not read
    # as a 100x regression); a genuinely fast sub-floor query is still
    # compared against the floored baseline, so a 0.04 s -> 5 s
    # regression DOES fail.
    FLOOR, STUB = 0.05, 0.02
    bad = [k for k, o, n, d in movers
           if d >= thresh and o >= STUB and n >= 0.2
           and max(n, FLOOR) >= 2 * max(o, FLOOR)]
    if bad:
        print(f"\nREGRESSIONS (>=2x and >=+{thresh}s): {', '.join(bad)}")
        sys.exit(1)


main()
