#!/usr/bin/env python3
"""Round-over-round bench regression check (builder tooling): compare two
BENCH_LOCAL.json captures. A regression = median > 1.5x AND > +0.3 s vs the
old capture (the r5 verdict's criterion).

Usage: python3 tools/bench_compare.py OLD.json NEW.json
"""
import json, sys

def load(p):
    d = json.load(open(p))
    return {k: v["median"] for k, v in d["queries"].items()}

def main(old_path, new_path):
    old, new = load(old_path), load(new_path)
    overlap = sorted(set(old) & set(new))
    regressions = []
    for q in overlap:
        o, n = old[q], new[q]
        if o >= 0 and n >= 0 and n > 1.5 * o and n > o + 0.3:
            regressions.append((q, o, n))
    print(f"overlap: {len(overlap)} queries; "
          f"old total {sum(old[q] for q in overlap):.1f} s -> "
          f"new total {sum(new[q] for q in overlap):.1f} s")
    for q, o, n in sorted(regressions, key=lambda t: t[2] - t[1], reverse=True):
        print(f"REGRESSION {q}: {o:.3f} -> {n:.3f} s ({n/o:.1f}x)")
    new_only = sorted(set(new) - set(old))
    if new_only:
        tot = sum(new[q] for q in new_only)
        print(f"new queries ({len(new_only)}, {tot:.1f} s): " + ", ".join(
            f"{q}={new[q]:.2f}" for q in sorted(new_only, key=new.get, reverse=True)))
    print(f"{len(regressions)} regressions")
    return 1 if regressions else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
