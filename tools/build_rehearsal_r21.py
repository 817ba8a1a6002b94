#!/usr/bin/env python3
"""Assemble artifacts/rehearsal_r21.json from the raw rehearsal logs
(4-size authoritative run + 2-point confirmation run)."""
import json, sys

def runs_of(path):
    runs, exps = [], None
    for l in open(path):
        if l.startswith('{"metric":"scale_rehearsal"'):
            runs.append(json.loads(l))
        elif l.startswith('{"metric":"scale_growth_exponents"'):
            exps = json.loads(l)
    return runs, exps

runs4, exps4 = runs_of("artifacts/r21/rehearsal_raw.log")
runs2, exps2 = runs_of("artifacts/r21/rehearsal_2pt.log")

out = {
    "round": 21,
    "generator": ("graft.operators.ScaleRehearsal (sbt runMain, sizes "
                  "5000/15000/50000/150000, SPARK_DRIVER_MEM=48g); "
                  "confirmation run at sizes 5000/150000 only "
                  "(fresh JVM, artifacts/r21/rehearsal_2pt.log)"),
    "gate": ("every growth exponent < 1.5 (quadratic ~ 2.0); per-probe "
             "stop-the-world gc_ms on every measurement; ing_admits "
             "must stay 35 = 7 sources x DeltaAdmitCap"),
    "notes": [
  "CONT_SERVE (VERDICT r20 task #2, the one r20 weak): 150k wall 89.3 s -> 35.3 s (4-size run) / 38.2 s (fresh-JVM 2-pt confirmation), stop-the-world GC 59,548 ms -> 7,383 / 10,958 ms (67% of wall -> 21-29%), exponent 1.25 -> 0.88 / 0.99. The exact-class collapse runs the gram-array verify once per CLASS pair; the remaining near-1.0 exponent is OUTPUT-bound, not GC-bound: cont_pairs at 150k grew 74,336 -> 395,400 because the collapse also RESTORES completeness - the planted 600-member exact-copy pile's 359,400 intra-pile pairs are now emitted unconditionally (containment of identical gram sets is 1.0 by definition), where the old capped-postings candidate stage dropped most of them at rehearsal scale. Results at every oracle-checked scale are hash-identical (231/231); per-output-pair serve cost dropped ~13x.",
  "RUN-1 150k TAIL NOISE: the 4-size run's 150k point inflated ing_serve (18.5 s), decon_sec (14.5 s), x31 (6.1 s), edjoin_cand (71.9 s) - all probes that are CLEAN at 50k and in the fresh-JVM 2-pt run (ing_serve 5.3 s, decon 7.0 s, x31 2.0 s, edjoin_cand 20.0 s, each at or under its r20 value). Late-JVM heap state after three corpus generations, not plan regressions; both exponent lines are recorded and both pass the gate.",
  "edjoin_sec 121.6 -> 44.9 / 53.1 s at 150k (checkpoint hygiene; the exponent ~1.0 remains the documented output-bound case - 197,704 true pairs at 150k are quadratic in the planted pile by construction; filter precision edjoin_cand_per_pair exponent 0.39 unchanged).",
  "pipe_delta_ingest steady serve: admit cap BINDS at every size (ing_admits = 35 = 7 x 5 throughout); serve exponent 0.38 (2-pt) / 0.72 (4-size, noise-inflated tail).",
  "all exponents < 1.5 in BOTH runs (worst 0.97 4-size / 1.00 2-pt, the output-bound edjoin); serve paths: mh 0.38/0.46, sh 0.41/0.46, cdc 0.21/0.28, winnow 0.29/0.36, decon 0.35/0.28, g6 0.15/0.18, x27 0.03/0.07, cont 0.88/0.99 (output-bound, see note 1).",
  "*_bs fields are build + first serve (index build billed once per size); *_serve_sec are the steady serve reads whose exponents are the 100 TB serving claim."
],
    "exponents": exps4,
    "exponents_2pt_confirmation": exps2,
    "runs": runs4,
    "runs_2pt_confirmation": runs2,
}
json.dump(out, open("artifacts/rehearsal_r21.json", "w"), indent=1)
print("wrote artifacts/rehearsal_r21.json:",
      len(runs4), "runs,", len(runs2), "confirmation runs")
print("worst exponent (4-size):", exps4 and exps4.get("worst"))
print("worst exponent (2-pt):", exps2 and exps2.get("worst"))
