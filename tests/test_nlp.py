"""Unit tests: NER / relation extraction / date attachment (M1, M3, M4)."""

from datetime import datetime

import pyarrow as pa

from graphiti_ray.stages.nlp import (
    MentionExtractor,
    TripleExtractor,
    label_for_name,
    parse_explicit_date,
)


def _episodes_batch(contents, ts=datetime(2024, 1, 1)):
    n = len(contents)
    return pa.table(
        {
            "uuid": pa.array([f"ep{i}" for i in range(n)]),
            "group_id": pa.array(["g"] * n),
            "content": pa.array(contents),
            "valid_at": pa.array([ts] * n, pa.timestamp("us")),
        }
    )


def _triples(content, ts=datetime(2024, 1, 1)):
    t = TripleExtractor()(_episodes_batch([content], ts))
    return t.to_pylist()


def test_triples_basic_predicates():
    rows = _triples(
        "Alice Smith works at Acme Corp.\nBob Jones is the CEO of Globex Inc.\n"
        "Carol White likes David Brown.\nEve Davis dislikes Frank Miller.\n"
        "Acme Corp is located in Paris.\nGlobex Inc acquired Initech LLC.\n"
        "Grace Wilson is married to Henry Moore."
    )
    got = {(r["subj_name"], r["pred"], r["obj_name"]) for r in rows}
    assert got == {
        ("Alice Smith", "WORKS_AT", "Acme Corp"),
        ("Bob Jones", "CEO_OF", "Globex Inc"),
        ("Carol White", "LIKES", "David Brown"),
        ("Eve Davis", "DISLIKES", "Frank Miller"),
        ("Acme Corp", "LOCATED_IN", "Paris"),
        ("Globex Inc", "ACQUIRED", "Initech LLC"),
        ("Grace Wilson", "MARRIED_TO", "Henry Moore"),
    }


def test_dislikes_does_not_match_likes_pattern():
    rows = _triples("Grace Wilson dislikes Bob Jones.")
    assert len(rows) == 1 and rows[0]["pred"] == "DISLIKES"


def test_initial_form_subject():
    rows = _triples("A. Smith works at Acme.")
    assert rows[0]["subj_name"] == "A. Smith"
    assert rows[0]["obj_name"] == "Acme"


def test_fact_is_matched_sentence():
    rows = _triples("Alice likes Bob.")
    assert rows[0]["fact"] == "Alice likes Bob."


def test_explicit_date_overrides_warc_ts():
    rows = _triples("Alice Smith works at Acme Corp since March 2021.")
    assert rows[0]["valid_at"] == datetime(2021, 3, 1)
    rows = _triples("Alice Smith works at Acme Corp since 2019.")
    assert rows[0]["valid_at"] == datetime(2019, 1, 1)
    # date in the NEXT paragraph must not bleed in
    rows = _triples("Alice Smith works at Acme Corp.\nsince 2019 things changed")
    assert rows[0]["valid_at"] == datetime(2024, 1, 1)


def test_parse_explicit_date():
    assert parse_explicit_date("since June 2020") == datetime(2020, 6, 1)
    assert parse_explicit_date("in December 1999") == datetime(1999, 12, 1)
    assert parse_explicit_date("nothing") is None


def test_mentions_dedup_and_stopwords():
    m = MentionExtractor()(
        _episodes_batch(["Bob is the CEO of Acme. Bob likes Acme."])
    ).to_pylist()
    names = sorted(r["name"] for r in m)
    assert names == ["Acme", "Bob"]  # CEO filtered, Bob/Acme deduped


def test_mention_labels_from_roles():
    m = MentionExtractor()(
        _episodes_batch(["Alice Smith works at Acme Corp.\nAcme Corp is located in Paris."])
    ).to_pylist()
    labels = {r["name"]: r["label_hint"] for r in m}
    assert labels["Alice Smith"] == "Person"
    assert labels["Acme Corp"] == "Organization"
    assert labels["Paris"] == "Place"


def test_label_fallback_suffix():
    assert label_for_name("Foo Corp") == "Organization"
    assert label_for_name("Madrid") == "Entity"


def test_mentions_with_reflexion_recovers_missed(ray_session):
    """M2 control flow: a deliberately weak first pass (drops names past M)
    is repaired by the second pass; the union equals single-pass full
    extraction and the loop stops once a pass adds nothing."""
    import pyarrow as pa

    import ray.data as rd

    from graphiti_ray.stages.extract import episodes_dataset
    from graphiti_ray.stages.nlp import MentionExtractor, mentions_with_reflexion
    from tests.test_pipeline_e2e import _pages_table

    from datetime import datetime

    pages = rd.from_arrow(
        _pages_table(
            [
                ("Alice Smith works at Zeta Corp.", "g1", datetime(2024, 1, 1)),
                ("Bob Jones likes Nora White.", "g1", datetime(2024, 1, 2)),
            ]
        )
    )
    eps = episodes_dataset(pages)

    full = MentionExtractor()

    def weak(batch: pa.Table) -> pa.Table:
        out = full(batch)
        names = out.column("name").to_pylist()
        keep = pa.array([n[:1] <= "M" for n in names], pa.bool_())
        return out.filter(keep)

    want = (
        eps.map_batches(full, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["episode_uuid", "name"])
        .reset_index(drop=True)
    )
    assert (want.name > "M").any()  # the weak pass really misses some

    got = (
        mentions_with_reflexion(eps, extractors=[weak, full], max_passes=4)
        .to_pandas()
        .sort_values(["episode_uuid", "name"])
        .reset_index(drop=True)
    )
    assert got[["episode_uuid", "name"]].values.tolist() == want[
        ["episode_uuid", "name"]
    ].values.tolist()
