"""Connected components + canonical dedup filter (operators/graph.py).

A long chain (worst-case diameter), a clique, and a 2-node component
pin the propagation loop; the canonical filter is checked against a
hand-computed survivor set including never-paired docs.
"""

from pyspark.sql import functions as F

from feature_store_spark.operators.graph import (
    canonical_filter,
    connected_components,
)


def _cc_dict(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_chain_clique_and_pair(spark):
    # chain 1-2-3-4-5 (diameter 4), clique {10,11,12}, pair {20,21}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),
         (10, 11), (10, 12), (11, 12),
         (20, 21)],
        "id_a long, id_b long",
    )
    got = _cc_dict(connected_components(pairs, checkpoint=False))
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_chain_needs_multiple_rounds_converges(spark):
    # one hop cannot finish a length-4 chain: max_iter=1 must RAISE
    # (never return the partial labelling); the default cap converges
    import pytest as _pytest

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="not converged"):
        connected_components(pairs, max_iter=1, checkpoint=False)
    full = _cc_dict(connected_components(pairs, checkpoint=False))
    assert set(full.values()) == {1}


def test_reversed_edge_direction_is_symmetric(spark):
    pairs = spark.createDataFrame([(9, 3), (3, 7)], "id_a long, id_b long")
    got = _cc_dict(connected_components(pairs, checkpoint=False))
    assert got == {3: 3, 7: 3, 9: 3}


def test_canonical_filter_keeps_min_and_unpaired(spark):
    corpus = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 10, 11, 50)],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    comp = connected_components(pairs, checkpoint=False)
    kept = sorted(
        r["doc_id"]
        for r in canonical_filter(corpus, comp).select("doc_id").collect()
    )
    # survivors: 1 (of {1,2,3}), 10 (of {10,11}), 50 (never paired)
    assert kept == [1, 10, 50]


def test_checkpointed_path_matches(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    a = _cc_dict(connected_components(pairs, checkpoint=True))
    b = _cc_dict(connected_components(pairs, checkpoint=False))
    assert a == b


def test_self_loops_and_duplicate_pairs_are_harmless(spark):
    pairs = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (1, 2), (7, 7)], "id_a long, id_b long"
    )
    got = _cc_dict(connected_components(pairs, checkpoint=False))
    assert got == {1: 1, 2: 1, 7: 7}


def test_non_convergence_raises(spark):
    """A chain longer than max_iter must fail loudly, never return a
    partially-propagated (wrong) clustering."""
    import pytest as _pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="not converged"):
        connected_components(pairs, max_iter=2, checkpoint=False)
    # and with enough rounds the same graph resolves fine
    got = _cc_dict(connected_components(pairs, max_iter=10, checkpoint=False))
    assert set(got.values()) == {0}


def test_connected_components_string_node_ids(spark):
    """Review r10i (execution-confirmed): the convergence detector
    used a decimal cast of the component id — a CAST_INVALID_INPUT
    crash for string ids under ANSI, and with ANSI off a NULL mass
    that made round one look converged, leaking a partially-
    propagated WRONG clustering. The detector is now type-generic."""
    from feature_store_spark.operators.graph import connected_components

    chain = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    pairs = spark.createDataFrame(chain, "id_a string, id_b string")
    got = {
        (r["node"], r["component"])
        for r in connected_components(pairs).collect()
    }
    assert got == {(x, "a") for x in "abcde"}


def test_graph_null_endpoints_filtered(spark):
    """Review r10i (execution-confirmed): a NULL endpoint must not
    become a phantom node — pagerank counted it into N (diluting
    teleport mass) and dropped the real node whose only edge touched
    NULL; connected_components emitted a (NULL, component) row."""
    from feature_store_spark.operators.graph import (
        connected_components,
        pagerank,
    )

    pairs = spark.createDataFrame(
        [(1, None), (2, 3)], "id_a long, id_b long"
    )
    pr = {r["node"]: r["pagerank"] for r in pagerank(pairs, iterations=2).collect()}
    assert set(pr) == {2, 3}
    assert abs(pr[2] - 0.5) < 1e-9 and abs(pr[3] - 0.5) < 1e-9
    cc = {r["node"] for r in connected_components(pairs).collect()}
    assert cc == {2, 3}
