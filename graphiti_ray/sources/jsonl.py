"""JSONL source/sink — the lingua-franca interchange format of LLM
training corpora (one JSON object per line; The Pile / RedPajama / Dolma
all ship this way). Reference analogue: the corpus parser family
(SURVEY §2 S11) next to the WARC connector (sources/warc.py).

Write: one ``.jsonl`` shard per block via ``Dataset.write_json`` —
partitioned output, resumable by shard like every sink here. Read:
``ray.data.read_json`` (Arrow JSON reader — vectorized, zero
per-row Python on the hot path).
"""

from __future__ import annotations

import ray.data as rd


def write_jsonl(ds: rd.Dataset, out_dir: str) -> None:
    """Write one .jsonl shard per block (lines format)."""
    ds.write_json(out_dir)


def read_jsonl(path: str | list[str]) -> rd.Dataset:
    """Read a JSONL directory/file set back as a Dataset."""
    return rd.read_json(path)


def write_csv(ds: rd.Dataset, out_dir: str) -> None:
    """CSV sink: one shard per block (Arrow CSV writer — quoted, UTF-8)."""
    ds.write_csv(out_dir)


def read_csv(path: str | list[str]) -> rd.Dataset:
    """Arrow CSV reader back to a Dataset (types inferred per shard).

    ``newlines_in_values=True`` so quoted fields containing embedded
    newlines (legal CSV, produced by the Arrow writer for multi-line
    document text) parse correctly instead of splitting mid-record.
    """
    from pyarrow import csv as pa_csv

    return rd.read_csv(
        path, parse_options=pa_csv.ParseOptions(newlines_in_values=True)
    )
