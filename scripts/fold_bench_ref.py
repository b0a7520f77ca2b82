#!/usr/bin/env python3
"""Regenerate BENCH_REF.json from a steady double full run.

Encodes the envelope ritual established through rounds 15-17:

  1. Per-line MIN of the prior envelope and the two runs' values
     (never fold more than one double run — lucky windows drop lines
     unreachably low).
  2. REACHABILITY AUDIT: any line that BOTH runs exceed by the 1.5x
     adjudication bound is a lucky-window line — raise it to the
     better of the two measured values (the honest clean cost).
  3. TRAINING PINS: e113_bpe_train / e115_bpe_apply share one trainer
     (whichever runs first pays ~the whole cost, the other reads the
     cache), so BOTH lines carry the shared training cost: the folded
     max of the pair per run, min-folded across runs with the prior
     pin. Never min-merge them individually (the cached 0.03 s read
     would poison the line).
  4. New queries (no prior line) enter at min(run1, run2).

Usage: fold_bench_ref.py <detail_run1.json> <detail_run2.json> [note]
Rewrites BENCH_REF.json in place; prints a change summary.
"""
import json
import sys

BOUND = 1.5
PINNED_PAIR = ("e113_bpe_train", "e115_bpe_apply")


def main():
    r1 = json.load(open(sys.argv[1]))["queries"]
    r2 = json.load(open(sys.argv[2]))["queries"]
    note = sys.argv[3] if len(sys.argv) > 3 else ""
    ref = json.load(open("BENCH_REF.json"))
    old_comment = ref.pop("comment", "")
    names = sorted(set(r1) | set(r2))
    new, raised, added, lowered = {}, [], [], []
    single = []
    for q in names:
        vals = [r[q] for r in (r1, r2) if q in r]
        prior = ref.get(q)
        m = min(vals + ([prior] if prior is not None else []))
        # raises and new-line entries require BOTH runs to have measured
        # the line: "BOTH runs exceed" is vacuously true on one value,
        # so a single contended run could raise a clean line, and a new
        # query seen once would enter at that lone (possibly noisy)
        # value instead of min(run1, run2).
        if len(vals) < 2:
            single.append(q)
            if prior is None:
                continue  # no line until a double run measures it
            m = prior  # a lone measurement can't raise OR lower a line
        elif all(v > m * BOUND for v in vals):
            # lucky-window line: both runs can't reach it
            m2 = min(vals)
            raised.append((q, m, m2))
            m = m2
        if prior is None:
            added.append((q, m))
        elif m < prior - 1e-9:
            lowered.append((q, prior, m))
        new[q] = round(m, 3)
    # training pins: both lines carry the shared trainer cost
    a, b = PINNED_PAIR
    if a in new and b in new:
        # only runs that actually measured the pair contribute — a detail
        # run missing both lines must not pin the pair to 0.0
        per_run = [max(r.get(a, 0.0), r.get(b, 0.0)) for r in (r1, r2)
                   if a in r or b in r]
        pin_prior = [v for v in (ref.get(a), ref.get(b)) if v is not None]
        if per_run + pin_prior:
            pin = round(min(per_run + pin_prior), 3)
            new[a] = new[b] = pin
    stale = sorted(set(ref) - set(new))
    out = {"comment": (
        f"clean same-host per-query reference envelope (sec) for Bench "
        f"outlier adjudication; {len(new)} lines - per-line min of the "
        f"prior envelope and a steady double full run, reachability-"
        f"audited (a line BOTH runs exceed by {BOUND}x is raised to the "
        f"better measured value). e113/e115 BOTH pinned to the shared "
        f"training cost. {note} Regenerate with "
        f"scripts/fold_bench_ref.py after a clean double run.")}
    out.update({q: new[q] for q in sorted(new)})
    json.dump(out, open("BENCH_REF.json", "w"), indent=1)
    print(f"lines: {len(new)} (added {len(added)}, lowered "
          f"{len(lowered)}, raised {len(raised)}, dropped-stale "
          f"{len(stale)})")
    for q, was, now in raised:
        print(f"  RAISED {q}: {was:.3f} -> {now:.3f} (reachability)")
    for q, v in added:
        print(f"  NEW    {q}: {v:.3f}")
    for q in stale:
        print(f"  STALE  {q} dropped (was {ref[q]})")
    for q in single:
        print(f"  WARN   {q}: measured by only one run - no raise/entry "
              f"applied; rerun a full double run to cover it")


if __name__ == "__main__":
    main()
