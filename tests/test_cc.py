"""Connected-components tests: driver and distributed paths must agree."""

import numpy as np
import pytest

from sylph_spark.cc import _distributed_cc, _driver_cc, connected_components


@pytest.fixture(scope="module")
def graph(spark):
    rng = np.random.default_rng(5)
    nodes = [f"n{i:04d}" for i in range(400)]
    # chains + cliques + singletons
    edges = []
    for c in range(40):
        members = [f"n{i:04d}" for i in range(c * 8, c * 8 + 5)]
        for a, b in zip(members, members[1:]):  # chain of 5
            edges.append((a, b))
    for extra in range(30):  # random cross edges
        a = f"n{rng.integers(0, 320):04d}"
        b = f"n{rng.integers(0, 320):04d}"
        if a != b:
            edges.append((min(a, b), max(a, b)))
    ndf = spark.createDataFrame([(n,) for n in nodes], ["image_id"])
    edf = spark.createDataFrame(edges, ["id_a", "id_b"])
    return ndf, edf


def _labels(df):
    return {r["image_id"]: r["cluster_id"] for r in df.collect()}


class TestCC:
    def test_driver_equals_distributed(self, graph, spark):
        ndf, edf = graph
        a = _labels(
            _driver_cc(
                ndf, spark, edf.toArrow(), "image_id", "id_a", "id_b", False
            )
        )
        b = _labels(
            _distributed_cc(ndf, edf, "image_id", "id_a", "id_b", 50, False)
        )
        assert a == b

    def test_endpoint_nodes_and_sizes_paths_agree(self, graph, spark):
        """nodes=None labels exactly the edge endpoints; with_sizes counts
        component members — identically on both paths."""
        _, edf = graph

        def rows(df):
            return {
                r["image_id"]: (r["cluster_id"], r["cluster_size"])
                for r in df.collect()
            }

        a = rows(
            _driver_cc(None, spark, edf.toArrow(), "image_id", "id_a", "id_b", True)
        )
        b = rows(_distributed_cc(None, edf, "image_id", "id_a", "id_b", 50, True))
        assert a == b
        touched = {r["id_a"] for r in edf.collect()} | {
            r["id_b"] for r in edf.collect()
        }
        assert set(a) == touched
        from collections import defaultdict

        comp = defaultdict(set)
        for n, (c, _) in a.items():
            comp[c].add(n)
        for n, (c, sz) in a.items():
            assert sz == len(comp[c])

    def test_isolated_nodes_size_one(self, spark):
        ndf = spark.createDataFrame([("a",), ("b",), ("c",)], ["image_id"])
        edf = spark.createDataFrame([("a", "b")], "id_a string, id_b string")
        rows = {
            r["image_id"]: (r["cluster_id"], r["cluster_size"])
            for r in connected_components(ndf, edf, with_sizes=True).collect()
        }
        assert rows == {"a": ("a", 2), "b": ("a", 2), "c": ("c", 1)}

    def test_labels_are_min_member(self, graph):
        ndf, edf = graph
        lbl = _labels(connected_components(ndf, edf))
        # group members by label; each label must equal min member
        from collections import defaultdict

        comp = defaultdict(set)
        for n, c in lbl.items():
            comp[c].add(n)
        for c, members in comp.items():
            assert c == min(members)

    def test_singletons_self_labeled(self, graph):
        ndf, edf = graph
        lbl = _labels(connected_components(ndf, edf))
        touched = {r["id_a"] for r in edf.collect()} | {
            r["id_b"] for r in edf.collect()
        }
        for n in lbl:
            if n not in touched and lbl[n] != n:
                raise AssertionError(f"singleton {n} mislabeled {lbl[n]}")

    def test_empty_edges(self, spark):
        ndf = spark.createDataFrame([("a",), ("b",)], ["image_id"])
        edf = spark.createDataFrame([], "id_a string, id_b string")
        lbl = _labels(connected_components(ndf, edf))
        assert lbl == {"a": "a", "b": "b"}
