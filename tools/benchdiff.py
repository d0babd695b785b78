#!/usr/bin/env python3
"""Compare two Bench JSON artifacts (files or git revs).

Usage:
  python3 tools/benchdiff.py BENCH_r07.json BENCH.json
  python3 tools/benchdiff.py HEAD:BENCH.json BENCH.json   # git rev:path OK

Prints the like-for-like total, per-query regressions and improvements,
and queries present on one side only. Host drift is normalized first: a
pinned set of stable, code-frozen ANCHOR queries yields a median
old->new ratio, and the regression threshold scales by it (r15 burned a
session-day adjudicating a +4.3% close that five untouched anchors
showed was 1.5-1.9x host drift). A surviving regression is then checked
against BENCH_ISOLATED.json (same-sf lines only, newest measurement per
query wins): an isolated re-measure back under the threshold refutes
the flag as contention.
"""
import json
import re
import signal
import subprocess
import sys

signal.signal(signal.SIGPIPE, signal.SIG_DFL)  # clean exit under `| head`

# Stable, code-frozen drift anchors: moderate runtimes, spread across
# subsystems, untouched for many rounds — exactly the five queries whose
# same-code inflation adjudicated the r15 drift fight. The NEWER
# artifact's recorded `anchors` field takes precedence when present
# (single source of truth is the Bench stamp); this list is the
# fallback for artifacts that predate the stamp.
ANCHORS = ["q23_itemcf_histogram", "q40_boardstats_pairs",
           "q211_rfm_segments", "q31_simhash_pairs", "q86_hybrid_stored"]


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


def norm_sf(v) -> "str | None":
    """Normalize the sf stamp: Bench lines carry the sfDir path string
    ("/root/testdata/sf0.1"), driver round artifacts a bare number."""
    if v is None:
        return None
    if isinstance(v, (int, float)):
        return f"{v:g}"
    m = re.search(r"sf([\d.]+)/?$", str(v))
    return m.group(1) if m else str(v)


def load(spec: str) -> "tuple[dict, dict | None, str | None, list | None]":
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
        return (doc["queries"], doc.get("loadavg"), norm_sf(doc.get("sf")),
                doc.get("anchors"))
    if "tail" in doc:  # driver round artifact (BENCH_r0N.json)
        sf = norm_sf(doc.get("sf"))
        parsed = doc.get("parsed")
        if isinstance(parsed, dict) and "queries" in parsed:
            return (parsed["queries"], parsed.get("loadavg"), sf,
                    parsed.get("anchors"))
        return from_tail(doc["tail"]), None, sf, None
    return doc, None, None, None


def load_isolated(near: str, sf: "str | None") -> dict:
    """Per-query isolated re-measures from BENCH_ISOLATED.json (the log
    Bench appends to under SPARK_GRAFT_ONLY), looked for beside the
    newer artifact, then in the cwd. Only lines at the SAME sf as the
    compared artifacts count (r15 ADVICE: a smaller-sf line wrongly
    refutes a real regression), and the NEWEST line per query wins — a
    stale measurement from an older revision must not outlive the code
    it measured. A flagged regression whose isolated time is clean was
    contention, not code."""
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
                line_sf = norm_sf(doc.get("sf"))
                if sf is not None and line_sf is not None and line_sf != sf:
                    continue
                for q, v in doc.get("queries", {}).items():
                    out[q] = v  # later lines overwrite: newest wins
        break
    return out


def drift_factor(old: dict, new: dict,
                 anchors: "list | None") -> "tuple[float, int]":
    """Median new/old ratio over the anchor set — the host-speed scale
    between the two runs, measured on code that did not change. Needs
    >= 3 valid anchors to engage; returns (1.0, n) otherwise."""
    ratios = sorted(new[a] / old[a] for a in (anchors or ANCHORS)
                    if a in old and a in new and old[a] > 0.05
                    and new[a] > 0)
    if len(ratios) < 3:
        return 1.0, len(ratios)
    mid = len(ratios) // 2
    med = ratios[mid] if len(ratios) % 2 else (
        ratios[mid - 1] + ratios[mid]) / 2
    return med, len(ratios)


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    (old, load_old, sf_old, _) = load(sys.argv[1])
    (new, load_new, sf_new, anchors_new) = load(sys.argv[2])
    if sf_old and sf_new and sf_old != sf_new:
        print(f"  WARNING: scale factors differ (old sf{sf_old}, "
              f"new sf{sf_new}) — per-query deltas are not comparable")
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
    # drift normalization: scale the flag threshold by the anchor ratio.
    # Only upward (a FASTER new host must not tighten the threshold and
    # flag noise), capped at 3x (past that the runs aren't comparable
    # and the cap keeps a real 4x regression from self-excusing).
    drift, n_anchor = drift_factor(old, new, anchors_new)
    scale = min(max(drift, 1.0), 3.0)
    thr = 1.3 * scale
    if n_anchor >= 3:
        print(f"  anchor drift: median new/old ratio {drift:.2f} over "
              f"{n_anchor} code-frozen anchors -> regression threshold "
              f"{thr:.2f}x")
    else:
        print(f"  anchor drift: only {n_anchor} anchors present — "
              f"no normalization, threshold 1.30x")
    regs = [(new[q] / old[q], q) for q in common
            if new[q] > old[q] * thr and new[q] > 0.3]
    # machine adjudication (r14: the protocol lived only in judge prose):
    # an isolated SPARK_GRAFT_ONLY re-measure that lands the query back
    # within the DRIFT-SCALED threshold refutes the flag — the isolated
    # run happens on the same (possibly slower) host, so holding it to
    # the unscaled 1.3x would make refutation impossible exactly when
    # drift normalization is engaged
    iso = load_isolated(sys.argv[2], sf_new or sf_old)
    adj = [(r, q) for r, q in regs if q in iso and iso[q] <= old[q] * thr]
    regs = [x for x in regs if x not in adj]
    for r, q in sorted(adj, reverse=True):
        print(f"  ADJ {q}: {old[q]:.2f} -> {new[q]:.2f} flagged, but "
              f"isolated re-measure {iso[q]:.2f}s refutes it (contention)")
    for r, q in sorted(regs, reverse=True):
        print(f"  REG {q}: {old[q]:.2f} -> {new[q]:.2f}  ({r:.2f}x)")
    # symmetric drift normalization (r16 ADVICE): the regression
    # threshold scales UP on a slower host; the improvement cutoff must
    # scale DOWN on a faster one, or pure host drift (anchor ratio < 1)
    # prints as spurious per-query improvements. Same cap discipline:
    # never below 1/3 of the nominal cutoff.
    imp_scale = max(min(drift, 1.0), 1.0 / 3.0)
    imp_thr = 0.75 * imp_scale
    if imp_scale < 1.0:
        print(f"  anchor drift < 1 (faster host): improvement cutoff "
              f"scaled to {imp_thr:.2f}x")
    imps = [(new[q] / old[q], q) for q in common
            if new[q] < old[q] * imp_thr and old[q] > 0.3]
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
