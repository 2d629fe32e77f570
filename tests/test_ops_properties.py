"""Randomized equivalence tests for the block-boundary primitives
(distinct_by_key / sorted_lead / sorted_lag_list) against pandas reference
implementations, across adversarial block layouts."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

import ray.data as rd

from graphiti_ray.stages.ops import distinct_by_key, sorted_lag_list, sorted_lead

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["p1", "p2", "p3"]),  # partition
        st.integers(0, 30),  # order/value (may repeat → tie handling)
    ),
    min_size=1,
    max_size=25,
)


@given(rows_strategy, st.integers(1, 6))
@settings(max_examples=10, deadline=None)
def test_sorted_lead_matches_pandas(ray_session, rows, nblocks):
    # unique (part, value) precondition for strict lead (documented)
    uniq = sorted(set(rows))
    df = pd.DataFrame(uniq, columns=["p", "v"])
    df["uuid"] = [f"u{i}" for i in range(len(df))]
    ds = rd.from_pandas(df).repartition(nblocks)
    out = sorted_lead(
        ds, ["p"], ["v"], "v", out_col="nxt", out_type=None or __import__("pyarrow").int64()
    ).to_pandas()
    ref = df.sort_values(["p", "v"]).copy()
    ref["nxt"] = ref.groupby("p")["v"].shift(-1)
    got = dict(zip(zip(out.p, out.v), out.nxt))
    want = dict(zip(zip(ref.p, ref.v), ref.nxt))
    for k in want:
        if pd.isna(want[k]):
            assert pd.isna(got[k]), k
        else:
            assert got[k] == want[k], k


@given(rows_strategy, st.integers(1, 6), st.integers(1, 4))
@settings(max_examples=10, deadline=None)
def test_sorted_lag_list_matches_pandas(ray_session, rows, nblocks, k):
    df = pd.DataFrame(sorted(set(rows)), columns=["p", "v"])
    df["val"] = [f"x{i}" for i in range(len(df))]
    ds = rd.from_pandas(df).repartition(nblocks)
    out = sorted_lag_list(
        ds, ["p"], ["v"], "val", k=k, out_col="prev"
    ).to_pandas()
    ref = df.sort_values(["p", "v"])
    want = {}
    for p, grp in ref.groupby("p"):
        vals = list(grp["val"])
        for i, (v, val) in enumerate(zip(grp["v"], vals)):
            want[(p, v)] = vals[max(0, i - k) : i]
    got = {(r.p, r.v): list(r.prev) for r in out.itertuples(index=False)}
    assert got == want


@given(
    st.lists(st.integers(0, 15), min_size=1, max_size=40), st.integers(1, 7)
)
@settings(max_examples=10, deadline=None)
def test_distinct_by_key_matches_pandas(ray_session, keys, nblocks):
    df = pd.DataFrame({"k": [f"k{x:02d}" for x in keys]})
    df["payload"] = df["k"] + "!"
    ds = rd.from_pandas(df).repartition(nblocks)
    out = distinct_by_key(ds, "k").to_pandas()
    assert sorted(out.k) == sorted(df.k.drop_duplicates())
    assert (out.payload == out.k + "!").all()
