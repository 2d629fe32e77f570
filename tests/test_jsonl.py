"""JSONL connector roundtrip + partitioned sink pruning."""

import shutil

import pyarrow as pa

import ray.data as rd

from graphiti_ray.sources.jsonl import read_jsonl, write_jsonl


def test_jsonl_roundtrip_types_and_unicode(ray_session):
    shutil.rmtree("/tmp/jsonl_ut", ignore_errors=True)
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(['he said "hi"\nnewline', "ünïcodé ✓"], pa.string()),
            }
        )
    )
    write_jsonl(ds, "/tmp/jsonl_ut")
    back = read_jsonl("/tmp/jsonl_ut").to_pandas().sort_values("doc_id")
    assert back.text.tolist() == ['he said "hi"\nnewline', "ünïcodé ✓"]
    assert back.doc_id.tolist() == [1, 2]


def test_partitioned_write_prunes(ray_session, tmp_path):
    root = str(tmp_path / "part")
    ds = rd.from_items(
        [{"doc_id": i, "lang": "en" if i % 2 else "de"} for i in range(10)]
    )
    ds.write_parquet(root, partition_cols=["lang"])
    en = rd.read_parquet(f"{root}/lang=en").to_pandas()
    assert sorted(en.doc_id) == [1, 3, 5, 7, 9]
    assert "lang" not in en.columns or (en.lang == "en").all()


def test_csv_roundtrip_quoting(ray_session, tmp_path):
    from graphiti_ray.sources.jsonl import read_csv, write_csv

    root = str(tmp_path / "csv")
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(
                    ['with, comma and "quotes"', "and\nnewline"], pa.string()
                ),
            }
        )
    )
    write_csv(ds, root)
    back = read_csv(root).to_pandas().sort_values("doc_id")
    assert back.text.tolist() == ['with, comma and "quotes"', "and\nnewline"]
