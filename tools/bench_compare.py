#!/usr/bin/env python3
"""Per-key bench regression check: compare two Bench JSON lines
(BENCH_r{N}.json or a saved local run) and flag keys that got slower
beyond a threshold — the cross-round check the round verdicts perform
("zero per-key regressions vs r8"), made standing.

Usage: python3 tools/bench_compare.py <old.json> <new.json> [pct]
  pct: regression threshold in percent (default 50 — wide enough that
  ambient-load noise on a shared box doesn't false-positive; a real
  plan regression shows 2-10x). Keys below 0.2 s in BOTH runs are
  skipped (fixed-cost floor, pure scheduling noise). Keys present in
  only one run are listed informationally, never failed — key-set
  growth between rounds is normal.

Exit 1 iff at least one comparable key regressed past the threshold;
exit 2 if either input yielded no per-key data (a gate that compares
nothing must not read as green).
"""
import sys, json, re


def load(path):
    """Accept either a raw Bench JSON line (possibly log-prefixed AND
    log-suffixed — a full `sbt runMain` capture works) or a driver-side
    BENCH_r{N}.json wrapper ({"rc", "tail", ...}) whose tail holds the
    truncated end of the line — scrape whatever "q_key":sec pairs (and
    the trailing total) survived truncation."""
    with open(path) as f:
        txt = f.read()
    dec = json.JSONDecoder()
    # scan every '{' and raw_decode from it: tolerates sbt/log prefixes,
    # trailing "[success] Total time" lines, and stray braces in logs
    best = None
    for m in re.finditer(r"\{", txt):
        try:
            d, _ = dec.raw_decode(txt, m.start())
        except json.JSONDecodeError:
            continue
        if isinstance(d, dict) and ("queries" in d or "tail" in d):
            best = d  # keep the LAST parseable candidate (final output)
    if best is None:
        return {}, None
    if "queries" in best:
        return best["queries"], best.get("value")
    qs = {m.group(1): float(m.group(2)) for m in
          re.finditer(r'"(q_[a-z0-9_]+)":([0-9.eE+-]+)', best["tail"])}
    m = re.search(r'"value":([0-9.eE+-]+)', best["tail"])
    return qs, float(m.group(1)) if m else None


def main(old_path, new_path, pct=50.0):
    old, old_total = load(old_path)
    new, new_total = load(new_path)
    empty = [p for p, d in ((old_path, old), (new_path, new)) if not d]
    if empty:
        print(f"ERROR: no per-key bench data parsed from "
              f"{' and '.join(empty)} — nothing compared")
        return 2
    both = sorted(set(old) & set(new))
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    regressed = []
    for k in both:
        a, b = old[k], new[k]
        if a < 0.2 and b < 0.2:
            continue
        if a > 0 and (b - a) / a * 100.0 > pct:
            regressed.append((k, a, b))
    for k, a, b in sorted(regressed, key=lambda t: t[1] - t[2]):
        print(f"REGRESSED {k}: {a:.2f} s -> {b:.2f} s (+{(b-a)/a*100:.0f}%)")
    if only_old:
        print(f"dropped keys ({len(only_old)}): {' '.join(only_old)}")
    if only_new:
        print(f"new keys ({len(only_new)}): {' '.join(only_new)}")
    fmt = lambda t: f"{t:.1f}" if t is not None else "?"
    print(f"== {len(both)} compared, {len(regressed)} regressed "
          f"(>{pct:.0f}%), totals {fmt(old_total)} -> {fmt(new_total)} s ==")
    return 1 if regressed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  float(sys.argv[3]) if len(sys.argv) > 3 else 50.0))
