"""Property-based tests (hypothesis) for the operators whose value IS a
guarantee: prefix filtering loses no qualifying pair, HLL registers merge
associatively, rendezvous moves only the departed node's keys, salted
join equals the plain join — each checked on adversarial random inputs,
not just the fixtures.

Spark round trips per example are expensive, so examples are capped low;
the generators bias toward the nasty shapes (duplicate rows, shared
tokens, tiny vocabularies) where the guarantees actually bite.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etielle_spark.operators.clusters import rendezvous_assign
from etielle_spark.operators.dedup import prefix_filter_pairs
from etielle_spark.operators.sketches import hll_distinct, hll_estimate, hll_registers
from etielle_spark.plans.skew import salted_join

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tiny vocabulary -> dense token overlap -> many near-threshold pairs
_WORDS = ["red", "green", "blue", "teal", "plum", "rose", "cyan", "gold"]
_docs = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=1, max_size=6),
    min_size=2,
    max_size=12,
)


@given(docs=_docs, threshold=st.sampled_from([0.4, 0.6, 0.8]))
@settings(**_SETTINGS)
def test_prefix_filter_never_loses_a_pair(spark, docs, threshold):
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in prefix_filter_pairs(df, "id", "text", threshold=threshold).collect()
    }
    sets = {i: set(ws) for i, ws in enumerate(docs)}
    want = {}
    for a in sets:
        for b in sets:
            if a < b:
                inter = len(sets[a] & sets[b])
                if inter:
                    j = round(inter / len(sets[a] | sets[b]), 6)
                    if j >= threshold:
                        want[(a, b)] = j
    assert got == want


@given(
    items=st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=120),
    cut=st.integers(min_value=0, max_value=400),
)
@settings(**_SETTINGS)
def test_hll_merge_associative_any_split(spark, items, cut):
    df = spark.createDataFrame([(v,) for v in items], "v int")
    lo, hi = df.filter(F.col("v") <= cut), df.filter(F.col("v") > cut)
    merged_regs = (
        hll_registers(lo, [], "v")
        .unionByName(hll_registers(hi, [], "v"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    merged = hll_estimate(merged_regs, []).collect()[0]["est_distinct"]
    single = hll_distinct(df, [], "v").collect()[0]["est_distinct"]
    assert merged == single
    # linear-counting regime at this cardinality: estimate is near-exact
    assert abs(single - len(set(items))) <= max(2, 0.05 * len(set(items)))


@given(
    n_nodes=st.integers(min_value=2, max_value=5),
    drop=st.integers(min_value=0, max_value=4),
)
@settings(**_SETTINGS)
def test_rendezvous_only_departed_keys_move(spark, n_nodes, drop):
    drop = drop % n_nodes
    nodes = [f"n{i}" for i in range(n_nodes)]
    df = spark.createDataFrame([(i,) for i in range(60)], "id int")
    before = {
        r["id"]: r["node"] for r in rendezvous_assign(df, "id", nodes).collect()
    }
    survivors = [n for i, n in enumerate(nodes) if i != drop]
    after = {
        r["id"]: r["node"] for r in rendezvous_assign(df, "id", survivors).collect()
    }
    for k, owner in before.items():
        if owner != nodes[drop]:
            assert after[k] == owner  # unaffected keys must not move


@given(
    left_keys=st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=40),
    salt=st.sampled_from([2, 5, 8]),
    how=st.sampled_from(["inner", "left"]),
)
@settings(**_SETTINGS)
def test_salted_join_equals_plain_join(spark, left_keys, salt, how):
    left = spark.createDataFrame(
        [(k, i) for i, k in enumerate(left_keys)], "k int, row int"
    )
    right = spark.createDataFrame([(k, k * 10) for k in range(0, 4)], "k int, v int")
    got = salted_join(left, right, ["k"], salt=salt, how=how)
    want = left.join(right, ["k"], how)
    assert sorted(map(tuple, got.select("k", "row", "v").collect())) == sorted(
        map(tuple, want.select("k", "row", "v").collect())
    )


@given(
    words=st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=6),
        min_size=1,
        max_size=10,
    ),
    n_merges=st.sampled_from([0, 2, 6]),
)
@settings(**_SETTINGS)
def test_bpe_encode_concat_invariant(spark, words, n_merges):
    """BPE never loses characters: concatenating a word's tokens yields
    the word, for any learned merge table."""
    from etielle_spark.operators.text import bpe_encode, bpe_train

    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    merges = bpe_train(df, "text", num_merges=n_merges, min_count=1)
    out = bpe_encode(df, "doc_id", "text", merges).collect()
    assert len(out) == 1
    rejoined = "".join(out[0].bpe_tokens)
    assert rejoined == "".join(w.lower() for w in words)
    assert out[0].n_bpe <= sum(len(w) for w in words)


@given(
    prefix=st.lists(st.sampled_from(_WORDS), min_size=0, max_size=5),
    suffix=st.lists(st.sampled_from(_WORDS), min_size=0, max_size=5),
    shared_len=st.sampled_from([7, 9, 12]),
)
@settings(**_SETTINGS)
def test_winnowing_shared_substring_guarantee(spark, prefix, suffix, shared_len):
    """Any shared run of >= window + n - 1 = 7 tokens yields at least one
    common fingerprint between the two documents (the winnowing paper's
    detection guarantee), at any position."""
    from etielle_spark.operators.dedup import winnow_fingerprints

    shared = [f"shared{i}" for i in range(shared_len)]
    d1 = " ".join(prefix + shared + ["tailone"] * 7)
    d2 = " ".join(["headtwo"] * 7 + shared + suffix)
    df = spark.createDataFrame([(1, d1), (2, d2)], ["doc_id", "text"])
    fps = winnow_fingerprints(df, "doc_id", "text", n=4, window=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc.get(1, set()) & by_doc.get(2, set())


@given(
    n_rows=st.sampled_from([5, 20]),
    flips=st.lists(st.integers(min_value=0, max_value=59), max_size=3),
)
@settings(**_SETTINGS)
def test_hamming_near_dup_completeness(spark, n_rows, flips):
    """Pigeonhole completeness: a pair within Hamming distance 3 is
    ALWAYS found by the banded join, wherever the differing bits fall."""
    from etielle_spark.operators.multimodal import hamming_near_dup

    base = 0x5A5A5A5A5A5A5A5 & ((1 << 60) - 1)
    other = base
    for f in set(flips):
        other ^= 1 << f
    rows = [(1, base), (2, other)] + [
        (10 + i, (base * (i + 7)) & ((1 << 60) - 1)) for i in range(n_rows)
    ]
    hashes = spark.createDataFrame(rows, ["id", "phash"])
    out = {(r.id_a, r.id_b): r.hamming
           for r in hamming_near_dup(hashes, "id", "phash").collect()}
    d = len(set(flips))
    if 0 < d <= 3:
        assert out[(1, 2)] == d
    elif d == 0:
        assert out[(1, 2)] == 0


@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    mode=st.sampled_from(["L", "LA", "RGB", "RGBA"]),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(**_SETTINGS)
def test_png_roundtrip_property(w, h, mode, seed):
    """Any 8-bit pixel buffer round-trips encode_png/decode_png exactly."""
    import random

    from etielle_spark.operators import imagecodec as ic

    nch = {"L": 1, "LA": 2, "RGB": 3, "RGBA": 4}[mode]
    rng = random.Random(seed)
    px = bytes(rng.randrange(256) for _ in range(w * h * nch))
    assert ic.decode_png(ic.encode_png(w, h, px, mode)) == (w, h, mode, px)


@given(
    n=st.integers(min_value=1, max_value=200),
    channels=st.integers(min_value=1, max_value=3),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(**_SETTINGS)
def test_wav_roundtrip_property(n, channels, seed):
    """Any int16 sample matrix round-trips encode_wav/decode_wav exactly."""
    import random

    import numpy as np

    from etielle_spark.operators import audiocodec as ac

    rng = random.Random(seed)
    arr = np.asarray(
        [[rng.randrange(-32768, 32768) for _ in range(channels)] for _ in range(n)],
        dtype="<i2",
    )
    rate, ch, got = ac.decode_wav(ac.encode_wav(12345, arr))
    assert (rate, ch) == (12345, channels)
    assert (got == arr.astype(np.int32)).all()


@given(v=st.integers(min_value=0, max_value=(1 << 60) - 1))
@settings(**_SETTINGS)
def test_media_bit_recovery_property(v):
    """EVERY 60-bit value survives the render->encode->decode->hash
    chain for all three media fixtures (pHash DCT, aHash blocks, WAV
    zero-crossings)."""
    from etielle_spark.operators import audiocodec as ac
    from etielle_spark.operators import imagecodec as ic

    assert ic.phash_bytes(ic.render_bits_dct(v)) == v
    assert ic.ahash_bytes(ic.render_bits_blocks(v)) == v
    f = ac.wav_features(ac.render_bits_wav(v))
    assert f["zero_crossings"] == bin((v ^ (v >> 1)) & ((1 << 59) - 1)).count("1")


# values with heavy ties AND near-continuous tails; groups of uneven size
_ks_values = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.one_of(
            st.integers(min_value=0, max_value=5).map(float),  # ties
            st.floats(
                min_value=0.0, max_value=100.0,
                allow_nan=False, allow_infinity=False,
            ),
        ),
    ),
    min_size=4,
    max_size=60,
)


@given(rows=_ks_values, buckets=st.sampled_from([1, 3, 64]))
@settings(**_SETTINGS)
def test_ks_drift_exact_and_bucket_invariant(spark, rows, buckets):
    """The two-level distributed CDF must give the EXACT two-sample KS
    for ANY bucket count (bucket boundaries affect only parallelism):
    compare against a sorted-merge Python reference on adversarial
    tie-heavy inputs."""
    from etielle_spark.operators.profile import ks_drift

    by_g: dict[str, list[float]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    if len(by_g) < 2:
        return
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        (r.group_a, r.group_b): r.ks_stat
        for r in ks_drift(df, "v", "g", cdf_buckets=buckets).collect()
    }

    def exact(a: list[float], b: list[float]) -> float:
        vals = sorted(set(a) | set(b))
        sa, sb = sorted(a), sorted(b)
        ia = ib = 0
        d = 0.0
        for v in vals:
            while ia < len(sa) and sa[ia] <= v:
                ia += 1
            while ib < len(sb) and sb[ib] <= v:
                ib += 1
            d = max(d, abs(ia / len(sa) - ib / len(sb)))
        return d

    gs = sorted(by_g)
    for i, ga in enumerate(gs):
        for gb in gs[i + 1 :]:
            want = round(exact(by_g[ga], by_g[gb]), 6)
            assert abs(got[(ga, gb)] - want) < 1e-9, (ga, gb, buckets)


_edges = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)),
    min_size=0,
    max_size=20,
)
_scores = st.lists(
    st.one_of(st.none(), st.integers(0, 5)), min_size=16, max_size=16
)


@given(edges=_edges, scores=_scores)
@settings(**_SETTINGS)
def test_canonicalize_clusters_matches_union_find(spark, edges, scores):
    """Random graphs + random (possibly NULL, tied) scores: the
    distributed pointer-jump CC + min_by keeper must equal a driver
    union-find with the documented ordering (max score, NULLs last,
    ties -> min id)."""
    from etielle_spark.operators.clusters import canonicalize_clusters

    edges = [(a, b) for a, b in edges if a != b]
    docs = spark.createDataFrame(
        [(i, float(s) if s is not None else None) for i, s in enumerate(scores)],
        "id long, score double",
    )
    pairs = spark.createDataFrame(
        edges or [(0, 0)], "id_a long, id_b long"
    ).filter(F.col("id_a") != F.col("id_b"))

    out = {r["id"]: r for r in canonicalize_clusters(docs, pairs, "id", "score").collect()}

    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for i in range(16):
        comps.setdefault(find(i), []).append(i)
    assert len(out) == 16
    for root, members in comps.items():
        keeper = max(
            members,
            key=lambda i: (
                scores[i] is not None,
                scores[i] if scores[i] is not None else -1,
                -i,
            ),
        )
        for m in members:
            r = out[m]
            assert r["cluster_id"] == min(members)
            assert r["keep"] == (m == keeper)
            assert r["dup_of"] == (None if m == keeper else keeper)
