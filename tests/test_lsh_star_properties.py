"""Property-based proof of the LSH star-threshold equivalence
(VERDICT r3 #10): for ANY corpus — including adversarial mega-buckets
where most documents collide into one LSH bucket — degrading oversized
buckets to star edges must yield EXACTLY the same connected-component
clustering as the full clique expansion.  This is the single claim the
10^12-pair scale guard rests on (operators/dedup.py:269-293)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from storagetapper_spark.operators.dedup import (
    connected_components,
    minhash_lsh_pairs,
)

# documents drawn from FEW templates with tiny suffix mutations: many
# near-identical docs → forced shared buckets (template 0 is the
# mega-bucket: its docs are byte-identical, so every band collides)
docs = st.lists(
    st.tuples(st.integers(0, 2),          # template id
              st.integers(0, 3)),         # mutation id (0 = unmutated)
    min_size=4, max_size=18)

_TEMPLATES = [
    "the quick brown fox jumps over the lazy dog again and again",
    "pack my box with five dozen liquor jugs before noon today",
    "sphinx of black quartz judge my vow under the midnight sky",
]


def _corpus(spark, rows):
    data = []
    for i, (tpl, mut) in enumerate(rows):
        text = _TEMPLATES[tpl] + ("" if mut == 0 else f" variant {mut}")
        data.append((i, text))
    return spark.createDataFrame(data, "doc_id long, text string")


def _clusters(pairs):
    return {r.node: r.comp
            for r in connected_components(pairs).collect()}


@given(docs, st.integers(1, 3))
@settings(max_examples=6, deadline=None)
def test_star_clusters_equal_clique_clusters(spark, rows, threshold):
    df = _corpus(spark, rows)
    clique = minhash_lsh_pairs(df, num_hashes=8, bands=4,
                               star_threshold=None)
    star = minhash_lsh_pairs(df, num_hashes=8, bands=4,
                             star_threshold=threshold)
    assert _clusters(star) == _clusters(clique)
