"""Property-based tests (hypothesis) for the pure building blocks:
key canonicalization, glob matching, and range-predicate semantics.

These are the invariants the distributed operators rely on; checking
them exhaustively here keeps the Spark-level tests focused on plan
behavior instead of value edge cases.
"""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from dat_archive_map_reduce_spark.functions.keys import key_json, normalize_key
from dat_archive_map_reduce_spark.sources.files import match_glob

scalar = st.one_of(
    st.text(max_size=20),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.booleans(),
)
key_strategy = st.one_of(scalar, st.lists(scalar, min_size=1, max_size=4))


@given(key_strategy)
@settings(max_examples=300)
def test_key_json_roundtrips(key):
    """key_json is valid JSON and parses back to the original
    (lists/tuples canonicalized to lists) — the property get() relies
    on for point-lookup equality."""
    kj = key_json(key if not isinstance(key, tuple) else list(key))
    parsed = json.loads(kj)
    expected = list(key) if isinstance(key, (list, tuple)) else key
    assert parsed == expected


@given(key_strategy, key_strategy)
@settings(max_examples=300)
def test_key_json_injective_on_distinct_keys(a, b):
    """Distinct keys never collide in canonical form (injectivity =
    no cross-key value mixing in the entries multimap). Scalar k and
    [k] are DISTINCT keys in the reference and must stay distinct."""
    na, nb = normalize_key(a), normalize_key(b)
    ja = key_json(a if not isinstance(a, (list, tuple)) else list(a))
    jb = key_json(b if not isinstance(b, (list, tuple)) else list(b))
    if ja == jb:
        # canonical equality must imply same components AND same shape
        assert na == nb
        assert isinstance(a, (list, tuple)) == isinstance(b, (list, tuple))


@given(st.text(alphabet=st.characters(blacklist_characters="\x00/"), max_size=12))
@settings(max_examples=200)
def test_glob_star_never_crosses_directories(name):
    """'/multi/*.json' matches only direct children — '*' must not
    cross '/' (anymatch semantics the reference's view globs assume)."""
    assert match_glob("/multi/*.json", f"/multi/{name}.json")
    assert not match_glob("/multi/*.json", f"/multi/{name}/deep.json")


@given(st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=30))
@settings(max_examples=20, deadline=None)
def test_latest_wins_keeps_max_version_per_path(spark, versions):
    """latest-wins compaction: one row per path, at its max version —
    checked against a straight python reduction."""
    from dat_archive_map_reduce_spark.sources.files import changelog_from_rows, latest_wins

    rows = [
        {
            "origin": "dat://x",
            "pathname": f"/f{v % 5}.json",
            "version": v + 1,
            "type": "del" if v % 7 == 0 else "put",
            "content": str(v),
        }
        for v in versions
    ]
    df = changelog_from_rows(spark, rows)
    got = {(r["pathname"]): (r["version"], r["type"]) for r in latest_wins(df).collect()}
    expected = {}
    for r in rows:
        cur = expected.get(r["pathname"])
        if cur is None or r["version"] > cur[0]:
            expected[r["pathname"]] = (r["version"], r["type"])
    assert got == expected


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=10, deadline=None)
def test_connected_components_matches_union_find(spark, edge_list):
    """BOTH connected-components paths — the single-task union-find
    (small-graph default) and the distributed alternating-star rounds
    (forced via small_graph_edges=0) — equal a plain union-find ground
    truth on arbitrary random graphs (self-loops and duplicates
    included), so the adaptive algorithm switch can never change
    labels."""
    from dat_archive_map_reduce_spark.operators.graph import connected_components

    df = spark.createDataFrame(edge_list, "src long, dst long")
    got = {
        (r.node, r.component)
        for r in connected_components(df, "src", "dst").collect()
    }
    got_star = {
        (r.node, r.component)
        for r in connected_components(
            df, "src", "dst", small_graph_edges=0
        ).collect()
    }
    assert got == got_star

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        if a != b:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for a, b in edge_list if a != b for n in (a, b)}
    expected = {(n, find(n)) for n in nodes}
    assert got == expected


@given(
    st.lists(
        st.integers(min_value=0, max_value=1000), min_size=1, max_size=60, unique=True
    )
)
@settings(max_examples=10, deadline=None)
def test_exact_global_cumsum_matches_python_prefix(spark, ids):
    """Distributed exclusive prefix sum equals the sequential scan for
    any unique ordering column."""
    from dat_archive_map_reduce_spark.operators.ranking import exact_global_cumsum

    rows = [(i, (i * 7919) % 97 + 1) for i in ids]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {r.k: r.c for r in exact_global_cumsum(df, "k", "v", cumsum_col="c").collect()}
    acc, expected = 0, {}
    for k, v in sorted(rows):
        expected[k] = acc
        acc += v
    assert got == expected
