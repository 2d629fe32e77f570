"""Above-the-broadcast-bound paths: every operator that ships a key set
via ``ray.put`` + ``pc.is_in`` under a bound must produce IDENTICAL
results through its hash-partitioned ``left_anti`` / semi-join fallback.
The bound is a function parameter, so the tests pin it to ~0 and compare
against the broadcast run on the same input (the
pipelines/corpus.py::_apply_near_dup_drops convention)."""

import pyarrow as pa

import ray.data as rd


def _pairs(ds):
    return {
        (r["node_a"], r["node_b"]): tuple(
            v for k, v in sorted(r.items()) if k not in ("node_a", "node_b")
        )
        for r in ds.take_all()
    }


def test_adamic_adar_left_anti_matches_broadcast(ray_session):
    from graphiti_ray.stages.graph import adamic_adar

    edges = rd.from_items(
        [
            {"subj_uuid": "a", "obj_uuid": "b"},
            {"subj_uuid": "b", "obj_uuid": "c"},
            {"subj_uuid": "c", "obj_uuid": "d"},
            {"subj_uuid": "d", "obj_uuid": "a"},
            {"subj_uuid": "a", "obj_uuid": "c"},
        ]
    )
    want = _pairs(adamic_adar(edges))
    got = _pairs(adamic_adar(edges, edge_key_broadcast_limit=1))
    assert want == got and want  # non-trivial result, identical paths


def test_neighborhood_jaccard_left_anti_matches_broadcast(ray_session):
    from graphiti_ray.stages.graph import neighborhood_jaccard

    edges = rd.from_items(
        [
            {"subj_uuid": "a", "obj_uuid": "b"},
            {"subj_uuid": "b", "obj_uuid": "c"},
            {"subj_uuid": "c", "obj_uuid": "d"},
            {"subj_uuid": "d", "obj_uuid": "a"},
        ]
    )
    want = _pairs(neighborhood_jaccard(edges))
    got = _pairs(neighborhood_jaccard(edges, edge_key_broadcast_limit=1))
    assert want == got and want


def test_negative_samples_left_anti_matches_broadcast(ray_session):
    from graphiti_ray.stages.graph import negative_samples

    edges = rd.from_items(
        [
            {"uuid": "e1", "subj_uuid": "a", "pred": "P", "obj_uuid": "b"},
            {"uuid": "e2", "subj_uuid": "a", "pred": "P", "obj_uuid": "c"},
            {"uuid": "e3", "subj_uuid": "b", "pred": "Q", "obj_uuid": "c"},
        ]
    )
    key = lambda df: sorted(map(tuple, df.to_numpy()))
    want = key(negative_samples(edges, attempts=8).to_pandas())
    got = key(
        negative_samples(
            edges, attempts=8, triple_key_broadcast_limit=0
        ).to_pandas()
    )
    assert want == got and want


def test_naive_bayes_dataset_resident_matches_broadcast(ray_session):
    from graphiti_ray.stages.textstats import naive_bayes_lang

    texts = [
        "the cat sat on the mat", "le chat est sur le tapis",
        "the dog ran fast", "le chien court vite",
        "hello world the", "bonjour le monde",
    ]
    docs = rd.from_items(
        [
            {"doc_id": i, "lang": ["en", "fr"][i % 2], "text": texts[i % 6]}
            for i in range(40)
        ]
    )
    want = (
        naive_bayes_lang(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = (
        naive_bayes_lang(docs, vocab_broadcast_limit=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert want.equals(got) and len(want) == 8


def test_rich_club_semi_join_matches_broadcast(ray_session):
    from graphiti_ray.stages.graph import rich_club

    edges = [("a", "b"), ("b", "c"), ("a", "c"),
             ("a", "l1"), ("b", "l2"), ("c", "l3")]
    t = pa.table(
        {
            "s": pa.array([e[0] for e in edges], pa.string()),
            "t": pa.array([e[1] for e in edges], pa.string()),
        }
    )
    want = rich_club(rd.from_arrow(t), ks=[1, 2, 5], src="s", dst="t")
    got = rich_club(
        rd.from_arrow(t), ks=[1, 2, 5], src="s", dst="t",
        rich_broadcast_limit=0,
    )
    assert want.to_pandas().equals(got.to_pandas())
