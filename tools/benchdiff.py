#!/usr/bin/env python3
"""Compare two Bench JSON artifacts (files or git revs).

Usage:
  python3 tools/benchdiff.py BENCH_r07.json BENCH.json
  python3 tools/benchdiff.py HEAD:BENCH.json BENCH.json   # git rev:path OK

Prints the like-for-like total, per-query regressions (>1.3x and >0.3s)
and improvements (<0.75x from >0.3s), and queries present on one side
only. A regression on a query the diff never touched usually means the
machine was loaded during the run — re-measure that query in isolation
(sbt "runMain graft.Verify <sf> /tmp/x <name>") before believing it.
"""
import json
import re
import signal
import subprocess
import sys

signal.signal(signal.SIGPIPE, signal.SIG_DFL)  # clean exit under `| head`


def from_tail(tail: str) -> dict:
    """Recover per-query seconds from a driver round artifact's `tail` —
    the LAST chunk of Bench stdout, i.e. a truncated JSON line whose
    head (and possibly its first query entry) is cut off. Entries are
    either "q..":[run1,run2,..] (min wins, the Bench rule) or "q..":sec.
    The first entry after the cut may be partial; the regex only accepts
    complete `"name":...` entries so a clipped one simply drops out."""
    out = {}
    for name, runs, single in re.findall(
            r'"(q\w+)":(?:\[([\d.,\s]+)\]|([\d.]+))', tail):
        vals = [float(v) for v in (runs or single).split(",") if v]
        if vals:
            out[name] = min(vals)
    return out


def load(spec: str) -> "tuple[dict, dict | None]":
    if ":" in spec and not spec.endswith(".json") or (
            ":" in spec and not spec.split(":", 1)[0].endswith(".json")
            and "/" not in spec.split(":", 1)[0]):
        rev, path = spec.split(":", 1)
        out = subprocess.run(["git", "show", f"{rev}:{path}"],
                             capture_output=True, text=True, check=True)
        doc = json.loads(out.stdout)
    else:
        with open(spec) as f:
            doc = json.load(f)
    if "queries" in doc:
        return doc["queries"], doc.get("loadavg")
    if "tail" in doc:  # driver round artifact (BENCH_r0N.json)
        parsed = doc.get("parsed")
        if isinstance(parsed, dict) and "queries" in parsed:
            return parsed["queries"], parsed.get("loadavg")
        return from_tail(doc["tail"]), None
    return doc, None


def load_isolated(near: str) -> dict:
    """Per-query minimum over every line of BENCH_ISOLATED.json — the
    isolated re-measure log Bench appends to under SPARK_GRAFT_ONLY.
    Looked for beside the newer artifact, then in the cwd. A flagged
    regression whose isolated time is clean was contention, not code."""
    import os
    cand = []
    if os.path.isfile(near):
        cand.append(os.path.join(os.path.dirname(os.path.abspath(near)),
                                 "BENCH_ISOLATED.json"))
    cand.append("BENCH_ISOLATED.json")
    out: dict = {}
    for path in cand:
        if not os.path.isfile(path):
            continue
        with open(path) as f:
            for ln in f:
                ln = ln.strip()
                if not ln:
                    continue
                try:
                    doc = json.loads(ln)
                except ValueError:
                    continue
                for q, v in doc.get("queries", {}).items():
                    out[q] = min(v, out[q]) if q in out else v
        break
    return out


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    (old, load_old), (new, load_new) = load(sys.argv[1]), load(sys.argv[2])
    # contention gate: Bench stamps 1/5/15-min loadavg + a spin probe;
    # comparing runs taken under >2x different host load is adjudicating
    # noise, not code — warn loudly before any per-query number
    if load_old and load_new:
        l_o = max(load_old.get("start", [-1])[0], 0.01)
        l_n = max(load_new.get("start", [-1])[0], 0.01)
        if l_n / l_o > 2 or l_o / l_n > 2:
            print(f"  WARNING: host load differs >2x between runs "
                  f"(old 1-min loadavg {l_o:.2f}, new {l_n:.2f}) — "
                  f"per-query deltas below are contention-suspect; "
                  f"re-measure in isolation before believing them")
        # two probes, two contention channels: spin = CPU/scheduler,
        # io (write+fsync) = the D-state background-IO blind spot
        for key, what in (("spin_probe_sec", "CPU contention or throttling"),
                          ("io_probe_sec", "IO contention (D-state load)")):
            p_o, p_n = load_old.get(key), load_new.get(key)
            # `is not None`: a probe of exactly 0.0 must not skip the check
            if p_o is None or p_n is None:
                continue
            if min(p_o, p_n) <= 0:
                # a zero/negative probe is a broken measurement, not a
                # divergence — say so instead of claiming a >2x ratio
                print(f"  WARNING: {key} invalid (zero/negative: "
                      f"old {p_o:.3f}s, new {p_n:.3f}s) — probe broken "
                      f"or unrunnable; contention check unavailable")
            elif p_n / p_o > 2 or p_o / p_n > 2:
                print(f"  WARNING: {key} differs >2x "
                      f"(old {p_o:.3f}s, new {p_n:.3f}s) — {what} "
                      f"during one of the runs")
            # a start/end divergence within ONE run catches load that
            # ARRIVED mid-run, which cross-run stamps miss
            end_n = load_new.get(key.replace("_sec", "_end_sec"))
            if end_n is not None and min(p_n, end_n) > 0 and (
                    end_n / p_n > 2 or p_n / end_n > 2):
                print(f"  WARNING: new run's {key} moved >2x start→end "
                      f"({p_n:.3f}s → {end_n:.3f}s) — load arrived or "
                      f"cleared MID-RUN; per-query numbers are mixed-regime")
    elif load_old or load_new:
        print("  note: only one run carries a loadavg stamp; "
              "contention comparison unavailable")
    common = sorted(set(old) & set(new))
    t_old = sum(old[q] for q in common)
    t_new = sum(new[q] for q in common)
    if t_old <= 0:
        # disjoint query sets (e.g. an isolated re-measure vs a subset
        # run) or an all-zero side: there is no like-for-like to state
        print(f"no comparable basis: {len(common)} common queries, "
              f"old total {t_old:.1f}s — pick runs that share queries")
    else:
        print(f"like-for-like over {len(common)} queries: "
              f"{t_old:.1f}s -> {t_new:.1f}s (ratio {t_new / t_old:.3f})")
    regs = [(new[q] / old[q], q) for q in common
            if new[q] > old[q] * 1.3 and new[q] > 0.3]
    # machine adjudication (r14: the protocol lived only in judge prose):
    # an isolated SPARK_GRAFT_ONLY re-measure that lands the query back
    # within the regression threshold refutes the flag — the full-run
    # number was contention, and the exit code must not carry it
    iso = load_isolated(sys.argv[2])
    adj = [(r, q) for r, q in regs if q in iso and iso[q] <= old[q] * 1.3]
    regs = [x for x in regs if x not in adj]
    for r, q in sorted(adj, reverse=True):
        print(f"  ADJ {q}: {old[q]:.2f} -> {new[q]:.2f} flagged, but "
              f"isolated re-measure {iso[q]:.2f}s refutes it (contention)")
    for r, q in sorted(regs, reverse=True):
        print(f"  REG {q}: {old[q]:.2f} -> {new[q]:.2f}  ({r:.2f}x)")
    imps = [(new[q] / old[q], q) for q in common
            if new[q] < old[q] * 0.75 and old[q] > 0.3]
    for r, q in sorted(imps):
        print(f"  IMP {q}: {old[q]:.2f} -> {new[q]:.2f}  ({r:.2f}x)")
    gone = sorted(set(old) - set(new))
    added = sorted(set(new) - set(old))
    if gone:
        print("  only in OLD:", ", ".join(gone))
    if added:
        print("  only in NEW:",
              ", ".join(f"{q}={new[q]:.2f}s" for q in added))
    return 1 if regs else 0


if __name__ == "__main__":
    sys.exit(main())
