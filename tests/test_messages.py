"""Message / JSON episode sources (sources/messages.py, nlp source rules).

Reference parity targets: EpisodeType.message/json (nodes.py:57-79), the
server message formatter (ingest.py:79), the podcast transcript parser
(examples/podcast/transcript_parser.py), and the per-source extraction
prompts (prompts/extract_nodes.py:73-167).
"""

from datetime import datetime, timedelta

import pyarrow as pa

import ray.data as rd

from graphiti_ray.sources.messages import (
    episodes_from_transcript,
    format_message,
    json_episodes_from_documents,
    message_episodes,
    messages_from_documents,
    parse_transcript,
)
from graphiti_ray.stages.nlp import (
    extract_json_record,
    mentions_dataset,
    split_message,
    triples_dataset,
)

SF = "/root/testdata/sf0.001/documents.parquet"


def test_format_and_split_roundtrip():
    body = format_message("Alice Smith", "user", "Bob Jones works at Acme Corp.")
    assert body == "Alice Smith(user): Bob Jones works at Acme Corp."
    speaker, content = split_message(body)
    assert speaker == "Alice Smith"
    assert content == "Bob Jones works at Acme Corp."
    # no prefix → treated as plain text
    assert split_message("no roles here") == (None, "no roles here")


def test_parse_transcript_podcast_format():
    text = (
        "0 (0s): Hello there.\n\n"
        "1 (1m 30s): Carol White works at Initech LLC.\nSecond line.\n\n"
        "0 (2m): Goodbye."
    )
    speakers = {0: ("Kamala Harris", "host"), 1: ("Tim Walz", "guest")}
    anchor = datetime(2024, 7, 1)
    msgs = parse_transcript(text, speakers, anchor=anchor)
    assert [m["role"] for m in msgs] == ["Kamala Harris", "Tim Walz", "Kamala Harris"]
    # the LAST message lands on the anchor; earlier ones are back-dated
    assert msgs[-1]["valid_at"] == anchor
    assert msgs[0]["valid_at"] == anchor - timedelta(minutes=2)
    assert msgs[1]["valid_at"] == anchor - timedelta(seconds=30)
    assert msgs[1]["content"] == "Carol White works at Initech LLC.\nSecond line."
    # unknown speaker index falls back
    fallback = parse_transcript("7 (0s): hi", {}, anchor=anchor)
    assert fallback[0]["role"] == "speaker7"


def test_transcript_to_kg_edges(ray_session):
    """A transcript flows through the standard extraction: the speaker is
    a mention (even though absent from every body), body relations become
    edges."""
    text = (
        "0 (0s): Carol White works at Initech LLC.\n\n"
        "1 (1m): Umbrella Labs is located in Tokyo."
    )
    speakers = {0: ("Henry Moore", "host"), 1: ("Grace Wilson", "guest")}
    eps = episodes_from_transcript(
        text, speakers, conversation_id="conv1", group_id="g1"
    )
    rows = eps.take_all()
    assert [r["source"] for r in rows] == ["message", "message"]
    assert rows[0]["content"].startswith("Henry Moore(host): ")
    mentions = mentions_dataset(rd.from_arrow(pa.Table.from_pylist(rows))).take_all()
    names = {m["name"] for m in mentions}
    assert {"Henry Moore", "Grace Wilson", "Carol White", "Initech LLC"} <= names
    triples = triples_dataset(rd.from_arrow(pa.Table.from_pylist(rows))).take_all()
    preds = {(t["subj_name"], t["pred"], t["obj_name"]) for t in triples}
    assert ("Carol White", "WORKS_AT", "Initech LLC") in preds
    assert ("Umbrella Labs", "LOCATED_IN", "Tokyo") in preds


def test_speaker_not_duplicated_when_in_body(ray_session):
    eps = episodes_from_transcript(
        "0 (0s): Eve Davis likes Bob Jones.",
        {0: ("Eve Davis", "user")},
        conversation_id="c",
        group_id="g",
    )
    mentions = mentions_dataset(eps).take_all()
    names = [m["name"] for m in mentions]
    assert names.count("Eve Davis") == 1
    # speaker rule fires first → label Person even without a relation role
    lab = {m["name"]: m["label_hint"] for m in mentions}
    assert lab["Eve Davis"] == "Person"


def test_extract_json_record_rules():
    assert extract_json_record(
        '{"subject": "Alice Smith", "predicate": "works_at", "object": "Acme Corp"}'
    ) == ("Alice Smith", "WORKS_AT", "Acme Corp")
    assert extract_json_record("not json") is None
    assert extract_json_record('{"subject": "x"}') is None
    assert extract_json_record('["a", "b"]') is None


def test_json_episodes_extraction(ray_session):
    docs = rd.read_parquet(SF, columns=["doc_id", "source"])
    eps = json_episodes_from_documents(docs).materialize()
    rows = eps.take(3)
    assert all(r["source"] == "json" for r in rows)
    triples = triples_dataset(eps).take_all()
    docs_n = rd.read_parquet(SF).count()
    # exactly one triple per json record
    assert len(triples) == docs_n
    preds = {t["pred"] for t in triples}
    assert preds <= {"WORKS_AT", "CEO_OF", "LIKES", "DISLIKES"}
    # the fact string uses the spaced verb form
    t0 = sorted(triples, key=lambda t: t["fact"])[0]
    assert t0["fact"].endswith(".")
    mentions = mentions_dataset(eps).take_all()
    # subject + object per record (minus subject==object collisions)
    assert len(mentions) >= docs_n


def test_message_fixture_deterministic(ray_session):
    docs = rd.read_parquet(SF, columns=["doc_id", "source"])
    a = message_episodes(messages_from_documents(docs)).take_all()
    b = message_episodes(messages_from_documents(docs)).take_all()
    key = lambda r: r["uuid"]  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)
    docs_n = rd.read_parquet(SF).count()
    assert len(a) == 2 * docs_n
