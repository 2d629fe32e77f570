"""Triple extraction P/R evaluation (the BASELINE.json headline criterion).

Compares the pipeline's canonical (subj, pred, obj) triples against the
ground truth derived *independently* from the pg1 arithmetic spec
(graphiti_ray/sources/synth_spec.py) — the analogue of the reference's
LongMemEval eval (tests/evals/eval_e2e_graph_building.py), with a
set-match instead of an LLM judge.

Ground truth canonicalization mirrors the engine's alias rules by
construction: full-name surfaces are used for subjects/objects, scoped per
group, with the caveat that an alias whose full form never appears in its
group stays unmerged — the truth set accounts for that by computing
in-group surface inventories first.

Usage: python scripts/eval_pr.py [sf_dir]   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def truth_triples(sf_dir: str) -> set[tuple]:
    """Expected canonical triples from doc_id arithmetic + link1 rules."""
    import pyarrow.parquet as pq

    from graphiti_ray.sources.synth_spec import (
        ORGS,
        PERSONS,
        PLACES,
        derive,
        org_alias,
        person_alias,
    )
    from graphiti_ray.stages.link import is_full_form, is_initial_form

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).to_pylist()

    # pass 1: per-group surface inventory (subjects can be aliases)
    group_surfaces: dict[str, set[str]] = {}
    rows = []
    for r in docs:
        d = derive(r["doc_id"])
        group = f"{r['source']}.example.com"
        subj1 = person_alias(d["p_idx"], d["alias_idx"])
        if d["kind"] in (2, 3):
            obj1 = PERSONS[d["q_idx"]]
        else:
            obj1 = org_alias(d["o_idx"], d["org_alias_idx"])
        pred1 = ["WORKS_AT", "CEO_OF", "LIKES", "DISLIKES"][d["kind"]]
        subj2, pred2, obj2 = ORGS[d["o_idx"]], "LOCATED_IN", PLACES[d["place_idx"]]
        ss = group_surfaces.setdefault(group, set())
        ss.update([subj1, obj1, subj2, obj2])
        rows.append((group, subj1, pred1, obj1))
        rows.append((group, subj2, pred2, obj2))

    # pass 2: canonicalize with the link1 rules over the group inventory
    def canonical(group: str, name: str) -> str:
        if is_full_form(name):
            return name
        fulls = [s for s in group_surfaces[group] if is_full_form(s)]
        if is_initial_form(name):
            cands = [
                f
                for f in fulls
                if f[0] == name[0] and f.split(" ")[-1] == name.split(" ")[-1]
            ]
        else:
            cands = [f for f in fulls if f.split(" ")[0] == name]
        return cands[0] if len(cands) == 1 else name

    return {
        (g, canonical(g, s), p, canonical(g, o)) for g, s, p, o in rows
    }


def pipeline_triples(sf_dir: str) -> set[tuple]:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from graphiti_ray.pipelines.kg import build_kg
    from graphiti_ray.sources.pages import pages_dataset

    tables = build_kg(pages_dataset(sf_dir), embeddings=False)
    edges = tables["edges"].select_columns(
        ["group_id", "subj_canonical", "pred", "obj_canonical"]
    ).take_all()
    return {
        (r["group_id"], r["subj_canonical"], r["pred"], r["obj_canonical"])
        for r in edges
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    truth = truth_triples(sf_dir)
    got = pipeline_triples(sf_dir)
    tp = len(truth & got)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(truth) if truth else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    print(
        json.dumps(
            {
                "metric": "triple_pr",
                "sf": sf_dir,
                "n_truth": len(truth),
                "n_extracted": len(got),
                "precision": round(precision, 4),
                "recall": round(recall, 4),
                "f1": round(f1, 4),
                "pass": precision >= 0.95 and recall >= 0.95,
            }
        )
    )
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
