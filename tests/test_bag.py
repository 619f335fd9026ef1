"""Bag monoid (Bag.hs:1-80) — unit semantics against hand-computed values."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simplir_spark.operators.bag import (
    bag_by_frequency,
    bag_from_items,
    bag_from_items_normed,
    bag_normalize,
    bag_scale,
    bag_weighted_union,
)


@pytest.fixture()
def items(spark):
    rows = [("g1", x) for x in ["a", "a", "b", "c"]] + [("g2", x) for x in ["b", "b"]]
    return spark.createDataFrame(rows, "grp string, item string")


def _d(df, keys=("item",)):
    return {tuple(r[k] for k in keys): r["weight"] for r in df.collect()}


def test_from_list_and_normed(spark, items):
    b = bag_from_items(items, group_cols=["grp"])
    assert _d(b, ("grp", "item")) == {
        ("g1", "a"): 2.0, ("g1", "b"): 1.0, ("g1", "c"): 1.0, ("g2", "b"): 2.0,
    }
    bn = bag_from_items_normed(items, group_cols=["grp"])
    got = _d(bn, ("grp", "item"))
    assert got[("g1", "a")] == pytest.approx(0.5)
    assert got[("g2", "b")] == pytest.approx(1.0)


def test_scale_normalize_union_by_frequency(spark, items):
    g1 = bag_from_items(items.filter(F.col("grp") == "g1").select("item"))
    g2 = bag_from_items(items.filter(F.col("grp") == "g2").select("item"))
    assert _d(bag_scale(g1, 3.0)) == {("a",): 6.0, ("b",): 3.0, ("c",): 3.0}

    u = bag_weighted_union([(1.0, g1), (2.0, g2)])
    # a:2, b:1+2*2=5, c:1
    assert _d(u) == {("a",): 2.0, ("b",): 5.0, ("c",): 1.0}

    n = bag_normalize(u)
    got = _d(n)
    assert got[("b",)] == pytest.approx(5 / 8)
    assert sum(got.values()) == pytest.approx(1.0)

    ranked = {r["item"]: r["rank"] for r in bag_by_frequency(u).collect()}
    assert ranked == {"b": 1, "a": 2, "c": 3}  # ties broken by item
