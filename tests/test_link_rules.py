"""Unit tests: alias-resolution rules (D1/J1/D4 stand-in) — FIXTURES.md F4."""

import pandas as pd

from graphiti_ray.stages.link import is_full_form, is_initial_form, resolve_group


def _resolve(rows):
    df = pd.DataFrame(rows, columns=["group_id", "name", "label_hint", "cnt"])
    out = resolve_group(df)
    return dict(zip(out["name"], out["canonical"]))


def test_alias_cluster_merges():
    canon = _resolve(
        [
            ("g", "Alice Smith", "Person", 3),
            ("g", "Alice", "Person", 2),
            ("g", "A. Smith", "Person", 1),
        ]
    )
    assert canon == {
        "Alice Smith": "Alice Smith",
        "Alice": "Alice Smith",
        "A. Smith": "Alice Smith",
    }


def test_near_miss_not_merged_when_ambiguous():
    # "Acme" is ambiguous between Acme Corp and Acme Labs → stays itself
    canon = _resolve(
        [
            ("g", "Acme Corp", "Organization", 2),
            ("g", "Acme Labs", "Organization", 2),
            ("g", "Acme", "Organization", 1),
        ]
    )
    assert canon["Acme"] == "Acme"
    assert canon["Acme Corp"] == "Acme Corp"
    assert canon["Acme Labs"] == "Acme Labs"


def test_alias_without_full_form_stays_itself():
    canon = _resolve([("g", "Alice", "Person", 1), ("g", "Paris", "Place", 2)])
    assert canon == {"Alice": "Alice", "Paris": "Paris"}


def test_initial_form_ambiguity():
    canon = _resolve(
        [
            ("g", "A. Smith", "Person", 1),
            ("g", "Alice Smith", "Person", 1),
            ("g", "Anna Smith", "Person", 1),
        ]
    )
    # two candidate fulls share initial+last → no merge
    assert canon["A. Smith"] == "A. Smith"


def test_form_predicates():
    assert is_full_form("Alice Smith")
    assert not is_full_form("Alice")
    assert not is_full_form("A. Smith")
    assert is_initial_form("A. Smith")
    assert not is_initial_form("Alice Smith")


def test_label_vote_majority_and_priority():
    df = pd.DataFrame(
        [
            ("g", "Acme", "Organization", 3),
            ("g", "Acme", "Entity", 1),
        ],
        columns=["group_id", "name", "label_hint", "cnt"],
    )
    out = resolve_group(df)
    assert out.loc[out["name"] == "Acme", "label"].iloc[0] == "Organization"
