"""Message / JSON episode sources (M15 full parity + S11 transcript parsing).

Reference parity:
- ``EpisodeType.message`` / ``EpisodeType.json`` (graphiti_core/
  nodes.py:57-79): a message episode's content is formatted
  ``"role(role_type): content"`` (server/graph_service/routers/
  ingest.py:79); a json episode's content is a JSON object string whose
  extraction is guided by the source description
  (prompts/extract_nodes.py:118-167).
- transcript parsing (examples/podcast/transcript_parser.py): blank-line
  separated messages, each headed ``"<speaker_index> (<rel_ts>): text"``,
  with a speakers table mapping index → (name, role); actual timestamps
  are anchored so the LAST message lands on the anchor time.

Deterministic message fixture (spec version ``msg1``), pure arithmetic on
``doc_id`` like sources/synth_spec.py so a DuckDB oracle re-derives the
expected graph independently: each ``documents`` row yields a 2-message
conversation at the doc's page url —

    msg 0: speaker PERSONS[(doc_id+5)%8] (role_type "user"),      body fact1
    msg 1: speaker PERSONS[(doc_id+2)%8] (role_type "assistant"), body fact2

message k's event time = the doc's ``warc_ts + k minutes``; episode uuid =
``md5(url + "#m" + k)``. Speakers are always FULL person names, so they
join the group's mention vocabulary and participate in alias resolution —
the message-source graph is NOT the text-source graph with extra nodes.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa

import ray.data as rd

from graphiti_ray.functions.text import first_sentence, md5_hex
from graphiti_ray.sources.synth_spec import PERSONS, fact_sentences, page_url
from graphiti_ray.stages.extract import DEFAULT_RUN_TS

MSG_SPEC_VERSION = "msg1"

MESSAGES_SCHEMA = pa.schema(
    [
        ("conversation_id", pa.string()),
        ("group_id", pa.string()),
        ("msg_idx", pa.int64()),
        ("role", pa.string()),
        ("role_type", pa.string()),
        ("content", pa.string()),
        ("valid_at", pa.timestamp("us")),
    ]
)


def format_message(role: str, role_type: str, content: str) -> str:
    """The reference's episode_body formatter (ingest.py:79)."""
    return f"{role}({role_type}): {content}"


def speaker_of(doc_id: int, msg_idx: int) -> str:
    """Deterministic full-name speaker per (doc, message)."""
    return PERSONS[(doc_id + (5 if msg_idx == 0 else 2)) % 8]


def messages_from_documents(docs: rd.Dataset) -> rd.Dataset:
    """documents → message rows (MESSAGES_SCHEMA), 2 per doc (spec msg1)."""

    def to_messages(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        sources = batch.column("source").to_pylist()
        conv, grp, idxs, roles, rtypes, contents, ts = [], [], [], [], [], [], []
        for d, src in zip(doc_ids, sources):
            f1, f2 = fact_sentences(d)
            url = page_url(src, d)
            base = np.datetime64("2024-01-01", "us") + np.timedelta64(d, "h")
            for k, (body, rtype) in enumerate(((f1, "user"), (f2, "assistant"))):
                conv.append(url)
                grp.append(f"{src}.example.com")
                idxs.append(k)
                roles.append(speaker_of(d, k))
                rtypes.append(rtype)
                contents.append(body)
                ts.append(base + np.timedelta64(k, "m"))
        return pa.table(
            {
                "conversation_id": pa.array(conv, pa.string()),
                "group_id": pa.array(grp, pa.string()),
                "msg_idx": pa.array(idxs, pa.int64()),
                "role": pa.array(roles, pa.string()),
                "role_type": pa.array(rtypes, pa.string()),
                "content": pa.array(np.array(contents, dtype=object), pa.string()),
                "valid_at": pa.array(np.array(ts), pa.timestamp("us")),
            }
        )

    return docs.select_columns(["doc_id", "source"]).map_batches(
        to_messages, batch_format="pyarrow", zero_copy_batch=True
    )


def message_episodes(
    msgs: rd.Dataset, run_ts: datetime = DEFAULT_RUN_TS
) -> rd.Dataset:
    """message rows → EPISODES_SCHEMA rows with ``source='message'`` and
    the reference's ``role(role_type): content`` body format — drop-in
    input for the same extraction → linking → temporal KG pipeline."""
    run_us = np.datetime64(run_ts, "us").astype("int64")

    def to_episodes(batch: pa.Table) -> pa.Table:
        conv = batch.column("conversation_id").to_pylist()
        idxs = batch.column("msg_idx").to_pylist()
        roles = batch.column("role").to_pylist()
        rtypes = batch.column("role_type").to_pylist()
        contents = batch.column("content").to_pylist()
        n = batch.num_rows
        bodies = [
            format_message(r, rt, c) for r, rt, c in zip(roles, rtypes, contents)
        ]
        created = pa.array(np.full(n, run_us, dtype="int64"), pa.timestamp("us"))
        return pa.table(
            {
                "uuid": pa.array(
                    [md5_hex(f"{c}#m{i}") for c, i in zip(conv, idxs)], pa.string()
                ),
                "name": pa.array(
                    [f"{c}#m{i}" for c, i in zip(conv, idxs)], pa.string()
                ),
                "group_id": batch.column("group_id"),
                "source": pa.array(["message"] * n, pa.string()),
                "source_description": pa.array(
                    ["conversation message"] * n, pa.string()
                ),
                "content": pa.array(bodies, pa.string()),
                "valid_at": batch.column("valid_at"),
                "created_at": created,
                "summary_text": pa.array(
                    [first_sentence(b) for b in bodies], pa.string()
                ),
            }
        )

    return msgs.map_batches(to_episodes, batch_format="pyarrow", zero_copy_batch=True)


# --- transcript parsing (examples/podcast/transcript_parser.py parity) ------

_TS_RE = re.compile(r"(?:(\d+)m)?\s*(?:(\d+)s)?$")


def _parse_rel_ts(ts: str) -> timedelta:
    m = _TS_RE.match(ts.strip())
    if not m or (m.group(1) is None and m.group(2) is None):
        return timedelta()
    return timedelta(minutes=int(m.group(1) or 0), seconds=int(m.group(2) or 0))


def parse_transcript(
    text: str,
    speakers: dict[int, tuple[str, str]],
    anchor: datetime = DEFAULT_RUN_TS,
) -> list[dict]:
    """Parse a podcast-style transcript: blank-line separated messages,
    each headed ``"<speaker_index> (<rel_ts>): content"``; continuation
    lines belong to the previous message. ``speakers`` maps index →
    (name, role_type). Timestamps anchor so the LAST message's event time
    equals ``anchor`` (the reference anchors to now; we take it as a
    parameter for determinism). Unknown speaker indexes fall back to
    ``("speaker<N>", "speaker")``."""
    head_re = re.compile(r"^(\d+)\s*\(([^)]*)\)\s*$")
    blocks = text.split("\n\n")
    raw: list[tuple[int, timedelta, str]] = []
    for block in blocks:
        lines = block.strip().split("\n")
        if not lines or ":" not in lines[0]:
            continue
        header, content = lines[0].split(":", 1)
        m = head_re.match(header.strip())
        if not m:
            continue
        rel = _parse_rel_ts(m.group(2))
        if len(lines) > 1:
            content += "\n" + "\n".join(lines[1:])
        raw.append((int(m.group(1)), rel, content.strip()))
    if not raw:
        return []
    start = anchor - raw[-1][1]
    out = []
    for idx, rel, content in raw:
        name, role_type = speakers.get(idx, (f"speaker{idx}", "speaker"))
        out.append(
            {
                "role": name,
                "role_type": role_type,
                "content": content,
                "valid_at": start + rel,
            }
        )
    return out


def episodes_from_transcript(
    text: str,
    speakers: dict[int, tuple[str, str]],
    conversation_id: str,
    group_id: str,
    anchor: datetime = DEFAULT_RUN_TS,
    run_ts: datetime = DEFAULT_RUN_TS,
) -> rd.Dataset:
    """Transcript string → message episodes Dataset (driver-side parse —
    a transcript is one conversation, never corpus-sized)."""
    msgs = parse_transcript(text, speakers, anchor=anchor)
    rows = [
        {
            "conversation_id": conversation_id,
            "group_id": group_id,
            "msg_idx": i,
            "role": m["role"],
            "role_type": m["role_type"],
            "content": m["content"],
            "valid_at": m["valid_at"],
        }
        for i, m in enumerate(msgs)
    ]
    return message_episodes(
        rd.from_arrow(
            pa.Table.from_pylist(rows, schema=MESSAGES_SCHEMA)
            if rows
            else MESSAGES_SCHEMA.empty_table()
        ),
        run_ts=run_ts,
    )


# --- JSON episodes -----------------------------------------------------------


def json_episodes_from_documents(
    docs: rd.Dataset, run_ts: datetime = DEFAULT_RUN_TS
) -> rd.Dataset:
    """documents → ``source='json'`` episodes: a structured-record view of
    the same deterministic facts (EpisodeType.json,
    prompts/extract_nodes.py:118-167 — entities from a JSON document,
    guided by the source description). Content is a stable-key JSON
    object; extraction is the documented key-rule in stages/nlp.py."""
    import json

    run_us = np.datetime64(run_ts, "us").astype("int64")
    pred_verb = {
        "WORKS_AT": "works_at",
        "CEO_OF": "ceo_of",
        "LIKES": "likes",
        "DISLIKES": "dislikes",
    }

    def to_episodes(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        sources = batch.column("source").to_pylist()
        uuids, names, groups, bodies, ts, sums = [], [], [], [], [], []
        for d, src in zip(doc_ids, sources):
            from graphiti_ray.sources.synth_spec import derive, org_alias, person_alias

            dd = derive(d)
            subj = person_alias(dd["p_idx"], dd["alias_idx"])
            kind = dd["kind"]
            if kind in (2, 3):
                obj = PERSONS[dd["q_idx"]]
            else:
                obj = org_alias(dd["o_idx"], dd["org_alias_idx"])
            pred = ["WORKS_AT", "CEO_OF", "LIKES", "DISLIKES"][kind]
            record = {
                "subject": subj,
                "predicate": pred_verb[pred],
                "object": obj,
            }
            body = json.dumps(record, sort_keys=True)
            url = page_url(src, d)
            uuids.append(md5_hex(f"{url}#json"))
            names.append(f"{url}#json")
            groups.append(f"{src}.example.com")
            bodies.append(body)
            ts.append(
                np.datetime64("2024-01-01", "us") + np.timedelta64(d, "h")
            )
            sums.append(first_sentence(body))
        n = len(uuids)
        created = pa.array(np.full(n, run_us, dtype="int64"), pa.timestamp("us"))
        return pa.table(
            {
                "uuid": pa.array(uuids, pa.string()),
                "name": pa.array(names, pa.string()),
                "group_id": pa.array(groups, pa.string()),
                "source": pa.array(["json"] * n, pa.string()),
                "source_description": pa.array(
                    ["structured fact record"] * n, pa.string()
                ),
                "content": pa.array(bodies, pa.string()),
                "valid_at": pa.array(np.array(ts), pa.timestamp("us")),
                "created_at": created,
                "summary_text": pa.array(sums, pa.string()),
            }
        )

    return docs.select_columns(["doc_id", "source"]).map_batches(
        to_episodes, batch_format="pyarrow", zero_copy_batch=True
    )
