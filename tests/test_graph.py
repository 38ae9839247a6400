"""Connected-components / cluster-dedup tests."""

from __future__ import annotations

from social_media_data_pipeline_spark.functions import graph


class TestConnectedComponents:
    def test_two_components_and_chain(self, spark):
        # chain 1-2-3 and pair 10-11; singleton 99 appears via docs only
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "src long, dst long"
        )
        cc = {r.node: r.component for r in graph.connected_components(edges).collect()}
        assert cc == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_dedup_clusters_with_singletons(self, spark):
        docs = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 99]], "doc_id long")
        pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
        out = {r.doc_id: r for r in graph.dedup_clusters(docs, pairs).collect()}
        assert out[99].component == 99 and out[99].is_canonical
        assert out[3].component == 1 and not out[3].is_canonical
        canonical = {k for k, v in out.items() if v.is_canonical}
        assert canonical == {1, 10, 99}

    def test_long_chain_converges(self, spark):
        n = 30
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n)], "src long, dst long"
        )
        cc = graph.connected_components(edges, max_iterations=50)
        comps = {r.component for r in cc.collect()}
        assert comps == {0}
