"""Per-stage Ray Data stats for the flagship pipeline.

    python scripts/stats_report.py [sf_dir]

Runs the KG build stages one at a time against ``sf_dir`` (default
/root/testdata/sf0.01) and prints each stage's ``ds.stats()`` — the
feedback loop the tuning workflow uses: check that wall time is dominated
by the map/aggregate compute rows, not by scheduling, block conversion, or
output-size blowups. The numbers feed BASELINE.md's "what made scaling
work" notes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from graphiti_ray.sources.pages import pages_dataset
    from graphiti_ray.stages.extract import episodes_dataset
    from graphiti_ray.stages.link import (
        apply_canonical_broadcast,
        canon_lookup_ref,
        canonical_map,
        mention_edges_broadcast,
        nodes_from_canonical,
    )
    from graphiti_ray.stages.nlp import extracted_dataset, split_extracted
    from graphiti_ray.stages.temporal import (
        episodes_to_list,
        invalidation_sweep_scalable,
        merged_edges,
    )

    def report(name, ds):
        mat = ds.materialize()
        print(f"\n===== {name} ({mat.count()} rows) =====")
        print(mat.stats())
        return mat

    episodes = report("episodes", episodes_dataset(pages_dataset(sf_dir)))
    extracted = report("extracted", extracted_dataset(episodes))
    mentions, triples = split_extracted(extracted)
    canon = report("canonical_map", canonical_map(mentions))
    report("nodes", nodes_from_canonical(canon))
    lut = canon_lookup_ref(canon)
    report("mention_edges", mention_edges_broadcast(mentions, lut))
    edges = invalidation_sweep_scalable(
        merged_edges(apply_canonical_broadcast(triples, lut))
    )
    report("edges", episodes_to_list(edges))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))
