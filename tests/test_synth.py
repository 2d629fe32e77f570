"""Pages generator: determinism + round-trip invariant (FIXTURES.md F1)."""

from graphiti_ray.functions.text import extract_text_from_html
from graphiti_ray.sources.pages import render_page
from graphiti_ray.sources.synth_spec import (
    EXCLUSION_CLASSES,
    derive,
    fact_sentences,
    person_alias,
)


def test_render_roundtrip_byte_identical():
    for doc_id in [0, 1, 7, 8, 40, 123, 499, 12345]:
        url, html, golden = render_page(doc_id, "plain words here", f"src{doc_id % 20}")
        assert extract_text_from_html(html) == golden


def test_render_deterministic():
    a = render_page(42, "t", "src2")
    b = render_page(42, "t", "src2")
    assert a == b


def test_fact_kinds_cycle():
    # doc_id ≡ p (mod 8): kind cycles with doc_id // 8
    f0, _ = fact_sentences(2)        # kind (2//8)%4 = 0 → works at
    assert " works at " in f0
    f1, _ = fact_sentences(2 + 8)    # kind 1 → CEO
    assert " is the CEO of " in f1
    f2, _ = fact_sentences(2 + 16)   # kind 2 → likes
    assert " likes " in f2
    f3, _ = fact_sentences(2 + 24)   # kind 3 → dislikes
    assert " dislikes " in f3


def test_alias_forms():
    assert person_alias(0, 0) == "Alice Smith"
    assert person_alias(0, 1) == "Alice"
    assert person_alias(0, 2) == "A. Smith"


def test_contradiction_chain_same_group_same_pair():
    # docs d and d+40 share group (mod 20) and person (mod 8), with kind+1:
    # kind 2 then kind 3 ⇒ LIKES → DISLIKES contradiction at a later ts
    d = 18  # (18//8)%4 == 2 → LIKES
    assert derive(d)["kind"] == 2 and derive(d + 8 * 5)["kind"] == 3
    assert d % 20 == (d + 40) % 20 and d % 8 == (d + 40) % 8
    f_like, _ = fact_sentences(d)
    f_dislike, _ = fact_sentences(d + 40)
    assert " likes " in f_like and " dislikes " in f_dislike


def test_exclusion_classes_cover_generated_predicates():
    for p in ["WORKS_AT", "CEO_OF", "LIKES", "DISLIKES", "LOCATED_IN"]:
        assert p in EXCLUSION_CLASSES
