#!/usr/bin/env python3
"""Compare two BENCH_FULL.json dumps and flag per-query regressions.

Usage: python3 tools/benchdiff.py OLD.json NEW.json [threshold] [--since REF]

Also accepts two verify_timings.json files (flat {row: seconds} maps
written by graft.Verify beside each dump): flags per-row verify-time
regressions round-over-round with a harness-bound caveat, so a silent
verify slowdown surfaces at close instead of in a judge soak.

Prints queries slower than `threshold`x (default 1.5) their old time,
new queries, and removed queries. Bench noise on a busy box is 10-30%;
the bench reports median-of-3 per query (BENCH_REPS.json has raw reps),
which removes most single-run blips — but still re-run idle before
believing anything under 2x.

With --since REF, each flagged query is classified by git paths:
  code-change : its registry definition file, or a graft module its
                builder references, changed in REF..HEAD — a real
                suspect, investigate the diff.
  no-diff     : no referenced source changed — contention, environment,
                or a shared-fixture/harness shift; adjudicate with
                BENCH_REPS.json medians, not single runs.

With --reps REPS.json (defaults to BENCH_REPS.json beside NEW.json when
present), any row whose median exceeds its best rep by >2x is flagged
`environment — rerun`: that spread means the run shared the box with
something heavy, and the number is not evidence about the code. The
new file's load_avg / shm_free_gb header (written by graft.Bench) is
echoed for the same reason.
"""
import json
import os
import re
import subprocess
import sys

argv = sys.argv[1:]
since = None
reps_path = None
args = []
i = 0
while i < len(argv):
    if argv[i] == "--since":
        if i + 1 >= len(argv):
            sys.exit("--since requires a git ref")
        since = argv[i + 1]
        i += 2
    elif argv[i] == "--reps":
        if i + 1 >= len(argv):
            sys.exit("--reps requires a path")
        reps_path = argv[i + 1]
        i += 2
    else:
        args.append(argv[i])
        i += 1
if len(args) < 2:
    sys.exit(__doc__)
old_path, new_path = args[0], args[1]
thr = float(args[2]) if len(args) > 2 else 1.5
def load(path):
    """Return (record, mode) where mode is 'bench' or 'verify' — PER
    FILE, so a mixed comparison (one verify_timings map against a bench
    record) fails loudly instead of silently applying verify-mode
    behavior (skipping the contended-run reps check, printing the
    verify caveat) to the bench side."""
    d = json.load(open(path))
    # driver BENCH_rN wrapper: the parsed stdout line sits under "parsed"
    # (None when the driver's 2KB tail clipped it — use BENCH_FULL.json)
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    # verify_timings.json (written by graft.Verify beside each dump) is a
    # flat {row: seconds} map — wrap it so verify gate runs diff
    # round-over-round with the same flagging as bench records. Keyed on
    # the FILENAME: other flat numeric maps exist (BENCH_*_DISK.json)
    # and must not silently enter verify mode with its caveat.
    if ("queries" not in d and d
            and "verify_timings" in os.path.basename(path).lower()
            and all(isinstance(v, (int, float)) for v in d.values())):
        return ({"value": round(sum(d.values()), 2), "queries": d,
                 "n": len(d)}, "verify")
    if "queries" not in d:
        if d and all(isinstance(v, (int, float)) for v in d.values()):
            sys.exit(f"{path}: flat numeric map but not a verify_timings "
                     "file — only verify_timings*.json get the per-row "
                     "wrap (a DISK/REPS record is not a per-query bench)")
        sys.exit(f"{path}: no per-query map (clipped driver tail?) — "
                 "diff BENCH_FULL.json dumps instead")
    return (d, "bench")


old, old_mode = load(old_path)
new, new_mode = load(new_path)
if old_mode != new_mode:
    sys.exit(f"mode mismatch: {old_path} is a {old_mode} record but "
             f"{new_path} is a {new_mode} record — verify timings diff "
             "against verify timings, bench records against bench records")
verify_mode = new_mode == "verify"
oq, nq = old["queries"], new["queries"]

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REG_DIR = os.path.join(ROOT, "src/main/scala/graft/registry")


def module_files():
    """Map graft object/class simple names -> defining source paths."""
    out = {}
    for dirpath, _, names in os.walk(os.path.join(ROOT, "src/main/scala/graft")):
        for n in names:
            if not n.endswith(".scala"):
                continue
            p = os.path.join(dirpath, n)
            for m in re.finditer(r"^\s*(?:private\[\w+\]\s+)?(?:object|class|trait)\s+(\w+)",
                                 open(p).read(), re.M):
                out.setdefault(m.group(1), os.path.relpath(p, ROOT))
    return out


def query_spans():
    """Map query name -> (registry file, builder text span)."""
    spans = {}
    if not os.path.isdir(REG_DIR):
        return spans
    entry_re = re.compile(r'^\s*"([a-zA-Z0-9_]+)" ->', re.M)
    for n in sorted(os.listdir(REG_DIR)):
        if not n.endswith(".scala"):
            continue
        p = os.path.join(REG_DIR, n)
        text = open(p).read()
        marks = list(entry_re.finditer(text))
        for i, m in enumerate(marks):
            end = marks[i + 1].start() if i + 1 < len(marks) else len(text)
            # first definition wins (query map precedes the oracle map)
            spans.setdefault(m.group(1), (os.path.relpath(p, ROOT),
                                          text[m.start():end]))
    return spans


def classify(names):
    """Return {query: (verdict, evidence)} using git paths since REF."""
    changed = set(subprocess.run(
        ["git", "diff", "--name-only", f"{since}..HEAD", "--", "src/main"],
        cwd=ROOT, capture_output=True, text=True).stdout.split())
    mods = module_files()
    spans = query_spans()
    out = {}
    for q in names:
        if q not in spans:
            out[q] = ("unknown", "no registry definition found")
            continue
        reg_file, body = spans[q]
        refs = {reg_file}
        for t in re.findall(r"\b([A-Z]\w+)\s*[.(]", body):
            if t in mods:
                refs.add(mods[t])
        hits = sorted(refs & changed)
        if hits:
            out[q] = ("code-change", ", ".join(hits))
        else:
            out[q] = ("no-diff", f"none of {len(refs)} referenced files changed")
    return out


print(f"total: {old['value']}s ({old.get('n', len(oq))} queries) -> "
      f"{new['value']}s ({new.get('n', len(nq))} queries)")
if verify_mode:
    print("verify-timings mode: rows run 4-concurrent in a shared JVM and "
          "each timing INCLUDES the coalesce(1) parquet dump — a flag on a "
          "row whose RESULT row-count grows with SF is usually dump-bound "
          "(harness), not operator regression; adjudicate suspects with an "
          "isolated filtered bench before believing them.")
if "load_avg" in new or "shm_free_gb" in new:
    print(f"new-run environment: load_avg={new.get('load_avg', '?')} "
          f"shm_free_gb={new.get('shm_free_gb', '?')}")

# environment flag: median > 2x best rep means the run was contended —
# the row's number is about the box, not the code
if reps_path is None and not verify_mode:
    # prefer the record's OWN reps file (BENCH_HEADLINE.json ->
    # BENCH_HEADLINE_REPS.json); BENCH_FULL keeps the legacy name.
    # The legacy-name fallback applies ONLY to BENCH_FULL records — a
    # HEADLINE/FILTERED record whose own _REPS file is missing must
    # skip the env check rather than compute contention flags from a
    # DIFFERENT run's raw timings.
    here = os.path.dirname(os.path.abspath(new_path)) or "."
    stem = os.path.basename(new_path).rsplit(".json", 1)[0]
    cands = [os.path.join(here, f"{stem}_REPS.json")]
    if stem == "BENCH_FULL":
        cands.append(os.path.join(here, "BENCH_REPS.json"))
    for cand in cands:
        if os.path.exists(cand):
            reps_path = cand
            break
env_rows = []
if reps_path:
    try:
        reps = json.load(open(reps_path))
        for k, ts in sorted(reps.items()):
            ts = [t for t in ts if t >= 0]
            if len(ts) >= 2 and sorted(ts)[len(ts) // 2] > 2 * min(ts):
                env_rows.append((k, sorted(ts)[len(ts) // 2], min(ts)))
    except Exception as e:
        print(f"  (reps file {reps_path} unreadable: {e})")
for k, med, best in env_rows:
    print(f"  ENVIRONMENT — rerun {k}: median {med:.2f}s > 2x best rep "
          f"{best:.2f}s")
regressed = [(k, oq[k], nq[k]) for k in sorted(oq.keys() & nq.keys())
             if nq[k] > thr * oq[k] and nq[k] - oq[k] > 0.2]
verdicts = classify([k for k, _, _ in regressed]) if since else {}
for k, a, b in sorted(regressed, key=lambda t: t[1] - t[2]):
    tag = ""
    if k in verdicts:
        v, ev = verdicts[k]
        tag = f"  [{v}: {ev}]"
    print(f"  REGRESSED {k}: {a:.2f}s -> {b:.2f}s ({b / a:.1f}x){tag}")
for k in sorted(nq.keys() - oq.keys()):
    print(f"  NEW       {k}: {nq[k]:.2f}s")
for k in sorted(oq.keys() - nq.keys()):
    print(f"  REMOVED   {k} (was {oq[k]:.2f}s)")
if not regressed:
    print("  no per-query regressions above "
          f"{thr}x (+0.2s absolute)")
