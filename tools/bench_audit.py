#!/usr/bin/env python3
"""Post-run bench artifact audit (the round-5 verdict's procedure,
made mechanical): diff BENCH_FULL.json per-query values against the
COMMITTED artifact (git show HEAD: — never the possibly-just-
overwritten working file), re-measure every >1.5x drift in a fresh
isolated JVM (graft.BenchSub), and splice in the MIN of the committed
and isolation numbers — co-tenant noise only ever adds time, so the
quietest observation is the best estimate of the code's cost. Repeats
until clean or the attempt budget runs out (a sustained burst can span
one audit pass too).

Load-canary refusal (the round-12 verdict's item 4): if the working
artifact's canary queries (t07/d02 — small, stable, touched by nearly
no code change) read >2x their committed values, the WHOLE run was
burst-poisoned; splicing a few drifted queries into it would leave the
rest inflated and poison the next round's drift prior. The audit
refuses (exit 2): restore the committed artifact and re-run the full
bench in a quieter window. GRAFT_AUDIT_FORCE=1 overrides.

Usage: python3 tools/bench_audit.py [max_attempts] [extra_query,...]
       python3 tools/bench_audit.py --selftest
The optional query list forces an isolation pass for those queries on
the first attempt even if they sit inside the drift band (for a value
a spot-audit showed to be burst-inflated but <1.5x prior).
Writes BENCH_FULL.json in place; prints one line per splice.
"""
import json
import os
import re
import subprocess
import sys

THRESH = 1.5
ABS_FLOOR = 0.4
CANARIES = ("t07_char_trigrams", "d02_minhash_pairs")
CANARY_THRESH = 2.0
REBASE_K = 3
REBASE_BAND = 1.3
HISTORY = "BENCH_CANARY_HISTORY.jsonl"


def parse(text):
    return {m.group(1): float(m.group(2)) for m in
            re.finditer(r'"([a-z][0-9a-z_]+)":([0-9.]+)', text)}


def effective_prior(committed, windows):
    """Mirror of Bench.effectivePrior: when the last REBASE_K windows'
    canary values agree within REBASE_BAND while ALL sitting past the
    hot bar vs the committed value, the MACHINE moved, not the run -
    adopt their median as the machine-state prior so the hot/quiet
    verdict keeps separating windows. Returns (prior, rebased names);
    the committed value stays in git as the quiet-machine reference."""
    eff = dict(committed)
    rebased = []
    for c in CANARIES:
        vs = [w[c] for w in windows if w.get(c, 0) > 0][-REBASE_K:]
        p = committed.get(c)
        if (p and len(vs) == REBASE_K and max(vs) <= min(vs) * REBASE_BAND
                and min(vs) > p * CANARY_THRESH):
            eff[c] = sorted(vs)[REBASE_K // 2]
            rebased.append(c)
    return eff, rebased


def load_history():
    """Window history (one line per full bench run, appended by
    Bench itself)."""
    try:
        with open(HISTORY) as f:
            return [parse(line) for line in f if line.strip()]
    except OSError:
        return []


def stamp_reconciled(cur):
    """A splice makes the artifact's values minima over one more
    window; its line must say so instead of wearing the last window's
    verdict as a single observation."""
    cur["reconciled"] = True
    cur["n_windows"] = int(cur.get("n_windows", 1)) + 1
    return cur


def drifted_queries(prior, qs):
    return [q for q, v in qs.items()
            if q in prior and v > prior[q] * THRESH
            and v - prior[q] > ABS_FLOOR]


def poisoned_canaries(prior, qs):
    """Canaries reading >CANARY_THRESH x committed → the run itself is
    contended; name them so the refusal is actionable."""
    return [c for c in CANARIES
            if c in prior and c in qs and qs[c] > prior[c] * CANARY_THRESH]


def selftest():
    prior = {"q1": 1.0, "t07_char_trigrams": 0.5, "d02_minhash_pairs": 2.0}
    # drift band: >1.5x AND >0.4s absolute
    assert drifted_queries(prior, {"q1": 1.6}) == ["q1"]        # 1.6x, +0.6
    assert drifted_queries(prior, {"q1": 1.39}) == []           # <+0.4 abs
    assert drifted_queries(prior, {"q1": 1.48}) == []           # <1.5x ratio
    assert drifted_queries(prior, {"qX": 99.0}) == []           # no prior
    # canary refusal: strictly >2x a committed canary
    assert poisoned_canaries(prior, {"t07_char_trigrams": 1.01}) == \
        ["t07_char_trigrams"]
    assert poisoned_canaries(prior, {"t07_char_trigrams": 0.99}) == []
    assert poisoned_canaries(
        prior, {"t07_char_trigrams": 1.2, "d02_minhash_pairs": 4.5}) == \
        ["t07_char_trigrams", "d02_minhash_pairs"]
    assert poisoned_canaries({}, {"t07_char_trigrams": 9.9}) == []  # no prior
    # committed-prior parse accepts the artifact's compact shape
    assert parse('{"queries":{"q1_agg":1.25,"d02_minhash_pairs":0.8}}') == \
        {"q1_agg": 1.25, "d02_minhash_pairs": 0.8}
    # machine-state rebase: 3 agreeing windows all >2x committed ->
    # adopt their median as the prior for THAT canary only
    committed = {"t07_char_trigrams": 0.2, "d02_minhash_pairs": 1.0}
    hot = [{"t07_char_trigrams": v} for v in (0.50, 0.54, 0.52)]
    eff, reb = effective_prior(committed, hot)
    assert reb == ["t07_char_trigrams"] and eff["t07_char_trigrams"] == 0.52
    assert eff["d02_minhash_pairs"] == 1.0
    # refuse: only 2 windows
    assert effective_prior(committed, hot[:2])[1] == []
    # refuse: windows disagree beyond the band (a burst, not a state)
    assert effective_prior(committed, [
        {"t07_char_trigrams": v} for v in (0.50, 0.90, 0.52)])[1] == []
    # refuse: windows agree but are NOT past the hot bar (no need)
    assert effective_prior(committed, [
        {"t07_char_trigrams": v} for v in (0.30, 0.31, 0.32)])[1] == []
    # the adopted prior flips the poison verdict for a machine-state
    # window without loosening it for a genuinely hot one
    assert poisoned_canaries(committed, {"t07_char_trigrams": 0.55}) == \
        ["t07_char_trigrams"]
    assert poisoned_canaries(eff, {"t07_char_trigrams": 0.55}) == []
    assert poisoned_canaries(eff, {"t07_char_trigrams": 1.2}) == \
        ["t07_char_trigrams"]
    # reconciled artifacts carry their provenance
    cur = {"value": 1.0}
    assert stamp_reconciled(cur)["n_windows"] == 2 and cur["reconciled"]
    assert stamp_reconciled(cur)["n_windows"] == 3
    print("selftest OK")
    return 0


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        return selftest()
    max_attempts = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    extra = sys.argv[2].split(",") if len(sys.argv) > 2 else []
    prior_txt = subprocess.run(
        ["git", "show", "HEAD:BENCH_FULL.json"],
        capture_output=True, text=True).stdout
    prior = parse(prior_txt) if prior_txt else {}

    cur0 = json.load(open("BENCH_FULL.json"))
    eff_prior, rebased = effective_prior(prior, load_history())
    if rebased:
        print(f"canary prior rebased for {','.join(rebased)}: the last "
              f"{REBASE_K} windows agree within {REBASE_BAND}x while "
              f">{CANARY_THRESH}x the committed values - machine-state "
              "change, judging this run against the adopted median")
    bad = poisoned_canaries(eff_prior, cur0["queries"])
    if bad and os.environ.get("GRAFT_AUDIT_FORCE") != "1":
        print("REFUSING to splice: load canaries "
              f"{','.join(bad)} read >{CANARY_THRESH}x their prior "
              f"({'rebased' if rebased else 'committed'}) values - the "
              "whole run is burst-poisoned, not a few "
              "queries. Restore the committed artifact "
              "(git checkout HEAD -- BENCH_FULL.json) and re-run the "
              "full bench in a quieter window. GRAFT_AUDIT_FORCE=1 "
              "overrides.")
        return 2

    for attempt in range(max_attempts):
        cur = json.load(open("BENCH_FULL.json"))
        qs = cur["queries"]
        drifted = drifted_queries(prior, qs)
        if attempt == 0:
            drifted += [q for q in extra if q in qs and q not in drifted]
        if not drifted:
            print(f"audit clean after {attempt} splice pass(es); "
                  f"total={cur['value']}")
            return 0
        print(f"attempt {attempt + 1}: re-isolating {len(drifted)}: "
              f"{','.join(drifted)}")
        out = subprocess.run(
            ["sbt", "-batch", f"runMain graft.BenchSub {','.join(drifted)}"],
            capture_output=True, text=True,
            env={**os.environ,
                 "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1",
                 "SPARK_GRAFT_CPUS": "32"}).stdout
        subs = {m.group(1): float(m.group(2)) for m in
                re.finditer(r"SUB (\S+) ([0-9.]+)", out)}
        if not subs:
            print("isolation pass produced no numbers; keeping artifact")
            return 1
        spliced = False
        for q, v in subs.items():
            if v < qs[q]:
                print(f"  splice {q}: {qs[q]} -> {v}")
                qs[q] = round(v, 3)
                spliced = True
        cur["value"] = round(sum(qs.values()), 3)
        if spliced:
            stamp_reconciled(cur)
        with open("BENCH_FULL.json", "w") as f:
            f.write(json.dumps(cur, separators=(",", ":")) + "\n")
    cur = json.load(open("BENCH_FULL.json"))
    left = drifted_queries(prior, cur["queries"])
    print(f"attempt budget exhausted; still >1.5x prior: {left} "
          f"(reproduced in isolation every pass - treat as real)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
