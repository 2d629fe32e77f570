"""Fuzzy linking path + scalable sorted-lead invalidation sweep."""

from datetime import datetime

import pandas as pd
import pytest

import ray.data as rd

from graphiti_ray.stages.link import (
    apply_fuzzy_merges,
    fuzzy_canonical_map,
    fuzzy_merge_pairs,
)
from graphiti_ray.stages.ops import distinct_by_key, sorted_lead


def _mentions(rows):
    return rd.from_items(
        [
            {
                "episode_uuid": f"ep{i}",
                "group_id": g,
                "name": n,
                "label_hint": "Entity",
                "valid_at": datetime(2024, 1, 1),
            }
            for i, (g, n) in enumerate(rows)
        ]
    )


def test_fuzzy_merges_typo_variant(ray_session):
    m = _mentions(
        [
            ("g", "Acme Corp"),
            ("g", "Acme Corp"),
            ("g", "Acme Corpp"),  # typo variant: cosine-close 3-gram profile
            ("g", "Globex Inc"),
        ]
    )
    canon = fuzzy_canonical_map(m, threshold=0.8).to_pandas()
    by_name = dict(zip(canon.name, canon.canonical))
    assert by_name["Acme Corpp"] == "Acme Corp"
    assert by_name["Globex Inc"] == "Globex Inc"
    # uuids rewritten consistently
    uuids = dict(zip(canon.name, canon.entity_uuid))
    assert uuids["Acme Corpp"] == uuids["Acme Corp"]


def test_fuzzy_does_not_merge_distinct_names(ray_session):
    m = _mentions([("g", "Acme Corp"), ("g", "Wayne Enterprises")])
    pairs = fuzzy_merge_pairs(
        m.map_batches(
            lambda t: t.append_column("canonical", t.column("name")),
            batch_format="pyarrow",
        ),
        threshold=0.8,
    ).to_pandas()
    assert pairs.empty


def test_fuzzy_cross_group_isolated(ray_session):
    m = _mentions([("g1", "Acme Corp"), ("g2", "Acme Corpp")])
    canon = fuzzy_canonical_map(m, threshold=0.8).to_pandas()
    # different groups: no merge
    assert set(canon.canonical) == {"Acme Corp", "Acme Corpp"}


def test_sorted_lead_basic(ray_session):
    T = [datetime(2024, 1, d + 1) for d in range(5)]
    ds = rd.from_items(
        [
            {"k": "a", "ts": T[0], "uuid": "1"},
            {"k": "a", "ts": T[2], "uuid": "2"},
            {"k": "a", "ts": T[4], "uuid": "3"},
            {"k": "b", "ts": T[1], "uuid": "4"},
        ]
    ).repartition(3)
    out = sorted_lead(ds, ["k"], ["ts", "uuid"], "ts", out_col="nxt").to_pandas()
    out = out.sort_values(["k", "ts"]).reset_index(drop=True)
    assert list(out.nxt[:2]) == [T[2], T[4]]
    assert pd.isna(out.nxt[2]) and pd.isna(out.nxt[3])


def test_scalable_sweep_equals_grouped_sweep(ray_session):
    """On merged inputs the sorted-lead sweep must equal the per-partition
    grouped sweep exactly (same invalid_at/expired_at)."""
    from graphiti_ray.pipelines.kg import build_kg
    from graphiti_ray.sources.pages import pages_dataset
    from graphiti_ray.stages.link import apply_canonical_broadcast, canon_lookup_ref, canonical_map
    from graphiti_ray.stages.nlp import extracted_dataset, split_extracted
    from graphiti_ray.stages.extract import episodes_dataset
    from graphiti_ray.stages.temporal import (
        invalidation_sweep,
        invalidation_sweep_scalable,
        merged_edges,
    )

    eps = episodes_dataset(pages_dataset("/root/testdata/sf0.001")).materialize()
    extracted = extracted_dataset(eps).materialize()
    mentions, triples = split_extracted(extracted)
    canon = canonical_map(mentions).materialize()
    lut = canon_lookup_ref(canon)
    merged = merged_edges(apply_canonical_broadcast(triples, lut)).materialize()

    a = invalidation_sweep(merged).to_pandas()
    b = invalidation_sweep_scalable(merged).to_pandas()
    cols = ["uuid", "valid_at", "invalid_at", "expired_at"]
    a = a[cols].sort_values("uuid").reset_index(drop=True)
    b = b[cols].sort_values("uuid").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_sorted_lag_list_matches_grouped_windows(ray_session):
    """Scalable T3 equals the grouped implementation on real data, across
    many small blocks (boundary carries exercised)."""
    from graphiti_ray.sources.pages import pages_dataset
    from graphiti_ray.stages.extract import (
        episodes_dataset,
        retrieve_episode_windows,
        retrieve_episode_windows_scalable,
    )

    eps = episodes_dataset(pages_dataset("/root/testdata/sf0.001")).materialize()
    a = retrieve_episode_windows(eps).to_pandas()
    b = retrieve_episode_windows_scalable(
        eps.repartition(17)  # force many boundary exchanges
    ).to_pandas()
    am = {r.uuid: list(r.prev_episode_uuids) for r in a.itertuples(index=False)}
    bm = {r.uuid: list(r.prev_episode_uuids) for r in b.itertuples(index=False)}
    assert am == bm


def test_sorted_lag_list_tiny_blocks(ray_session):
    from graphiti_ray.stages.ops import sorted_lag_list

    rows = [
        {"g": "a", "ts": i, "v": f"v{i}"} for i in range(8)
    ] + [{"g": "b", "ts": i, "v": f"w{i}"} for i in range(3)]
    ds = rd.from_items(rows).repartition(9)  # ~1 row per block
    out = sorted_lag_list(ds, ["g"], ["ts"], "v", k=3, out_col="prev").to_pandas()
    got = {
        (r.g, r.ts): list(r.prev) for r in out.itertuples(index=False)
    }
    assert got[("a", 0)] == []
    assert got[("a", 3)] == ["v0", "v1", "v2"]
    assert got[("a", 7)] == ["v4", "v5", "v6"]
    assert got[("b", 0)] == []
    assert got[("b", 2)] == ["w0", "w1"]


def test_episode_windows_source_filter(ray_session):
    """S5 source filter (graph_data_operations.py:115-188): only episodes of
    the requested EpisodeType participate in the window."""
    from datetime import datetime as dt

    from graphiti_ray.stages.extract import (
        retrieve_episode_windows,
        retrieve_episode_windows_scalable,
    )

    rows = [
        {
            "uuid": f"e{i}",
            "group_id": "g",
            "valid_at": dt(2024, 1, 1 + i),
            "source": "text" if i % 2 == 0 else "message",
        }
        for i in range(6)
    ]
    eps = rd.from_items(rows)
    for fn in (retrieve_episode_windows, retrieve_episode_windows_scalable):
        out = fn(eps, window=2, source="text").to_pandas()
        got = {r.uuid: list(r.prev_episode_uuids) for r in out.itertuples(index=False)}
        # only e0, e2, e4 remain and window over them alone
        assert got == {"e0": [], "e2": ["e0"], "e4": ["e0", "e2"]}


def test_distinct_by_key_cross_block(ray_session):
    rows = [{"k": f"key{i:03d}", "v": i} for i in range(50) for _ in range(3)]
    ds = rd.from_items(rows).repartition(7)
    out = distinct_by_key(ds, "k").to_pandas()
    assert len(out) == 50
    assert out.k.is_unique


def test_pca_top_component_matches_numpy(ray_session):
    """On a corpus with a planted dominant direction, the integer power
    iterate aligns with numpy's top eigenvector of the e3 covariance
    Gram (|cos| > 0.999), and lam approximates its eigenvalue."""
    import numpy as np
    import ray.data as rd_

    from graphiti_ray.stages.similarity import pca_top_component

    rng = np.random.default_rng(3)
    d = 8
    direction = np.ones(d) / np.sqrt(d)
    pts = (
        rng.normal(size=(200, 1)) * 5.0 * direction
        + rng.normal(size=(200, d)) * 0.3
    )
    ds = rd_.from_items(
        [{"vec_id": i, "embedding": list(map(float, v))} for i, v in enumerate(pts)]
    )
    out = pca_top_component(ds, rounds=6).to_pydict()
    x = np.array(out["x_e3"], np.float64)

    v3 = np.floor(pts * 1000).astype(np.int64)
    mu = np.array([int(s) // 200 if s >= 0 else -((-int(s)) // 200) for s in v3.sum(0)])
    c = (v3 - mu).astype(np.float64)
    w, vecs = np.linalg.eigh(c.T @ c)
    top = vecs[:, -1]
    cos = abs(x @ top) / (np.linalg.norm(x) * np.linalg.norm(top))
    assert cos > 0.999
    lam = out["lam"][0]
    assert abs(lam - w[-1]) / w[-1] < 0.01
