#!/usr/bin/env python3
"""Paired per-query deltas + sign test over paired_ab.sh output.

Reads a_pass<i>.json / b_pass<i>.json Bench lines from the directory
given as argv[1]; pairs pass i of A with pass i of B (interleaved on the
same box phase), differences each query within its pair, and reports the
median paired delta, win/loss counts, and the exact two-sided binomial
sign-test p-value per query plus the common-subset total. Queries in
only one commit are listed separately, never silently dropped.
"""
import glob
import json
import math
import os
import sys


def sign_p(w, l):
    n = w + l
    if n == 0:
        return 1.0
    k = min(w, l)
    tail = sum(math.comb(n, i) for i in range(k + 1))
    return min(1.0, 2.0 * tail / 2 ** n)


def load(path):
    # Bench can emit two "metric" lines (full map + top-15 tail); take
    # the line with the LARGEST queries map so a stray second line —
    # or a pass file captured without grep -m1 — never crashes the load
    with open(path) as f:
        lines = [json.loads(x) for x in f.read().splitlines() if x.strip()]
    return max((x["queries"] for x in lines), key=len)


def main(d):
    a_passes = sorted(glob.glob(os.path.join(d, "a_pass*.json")))
    b_passes = sorted(glob.glob(os.path.join(d, "b_pass*.json")))
    assert len(a_passes) == len(b_passes) and a_passes, "unbalanced passes"
    pairs = [(load(a), load(b)) for a, b in zip(a_passes, b_passes)]
    common = set(pairs[0][0]) & set(pairs[0][1])
    only_a = set(pairs[0][0]) - common
    only_b = set(pairs[0][1]) - common
    rows = []
    for q in sorted(common):
        deltas = [a[q] - b[q] for a, b in pairs]
        med = sorted(deltas)[len(deltas) // 2] if len(deltas) % 2 else sum(
            sorted(deltas)[len(deltas) // 2 - 1:len(deltas) // 2 + 1]) / 2
        w = sum(1 for x in deltas if x < 0)
        l = sum(1 for x in deltas if x > 0)
        rows.append((q, med, w, l, sign_p(w, l)))
    print("query,median_delta_sec,a_wins,a_losses,p_sign")
    for q, med, w, l, p in rows:
        print(f"{q},{med:.3f},{w},{l},{p:.3f}")
    tot = [(sum(a[q] for q in common), sum(b[q] for q in common))
           for a, b in pairs]
    tdeltas = sorted(ta - tb for ta, tb in tot)
    tmed = tdeltas[len(tdeltas) // 2] if len(tdeltas) % 2 else (
        tdeltas[len(tdeltas) // 2 - 1] + tdeltas[len(tdeltas) // 2]) / 2
    tw = sum(1 for x in tdeltas if x < 0)
    tl = sum(1 for x in tdeltas if x > 0)
    ratios = [ta / tb for ta, tb in tot]
    print(f"TOTAL_common_{len(common)},{tmed:.3f},{tw},{tl},{sign_p(tw, tl):.3f}")
    print(f"total_ratio_a_over_b,{','.join(f'{r:.3f}' for r in sorted(ratios))}")
    big = [(q, m) for q, m, w, l, p in rows if abs(m) >= 0.25 and p <= 0.25]
    if big:
        print("notable (|median| >= 0.25s, p <= 0.25): " +
              "; ".join(f"{q} {m:+.2f}s" for q, m in
                        sorted(big, key=lambda x: x[1])))
    if only_a:
        print("only_in_a: " + ",".join(sorted(only_a)))
    if only_b:
        print("only_in_b: " + ",".join(sorted(only_b)))


if __name__ == "__main__":
    main(sys.argv[1])
