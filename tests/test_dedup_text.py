"""Dedup / text / similarity operator unit tests (training-data pipeline
ops): recall of LSH candidates on planted near-dups, simhash locality,
token-count edge cases, language-id markers, fingerprint determinism,
IVF recall vs brute force."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fairy_core_spark.operators import dedup
from fairy_core_spark.operators.similarity import cosine_topk_bruteforce, ivf_topk
from fairy_core_spark.operators.text import doc_fingerprint, lang_id, token_count


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    rows = [
        (1, base, "a"),
        (2, base + " again", "a"),  # near-dup of 1
        (3, "completely different words about spark shuffle partitions and joins", "a"),
        (4, base, "b"),  # exact dup of 1, other block
        (5, "el rapido zorro marron salta sobre el perro y la gata", "b"),
        (6, "", "b"),
        (7, "   ", "b"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_exact_dedup(spark, docs):
    groups = dedup.exact_dup_groups(docs, "text", "doc_id").collect()
    assert len(groups) >= 1
    g = [r for r in groups if r["n"] == 2]
    assert g and g[0]["keeper_id"] == 1  # docs 1 and 4 byte-identical


def test_minhash_lsh_recall(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_candidates(docs, "text", "doc_id").collect()
    }
    assert (1, 4) in pairs  # identical docs always share every band
    assert (1, 2) in pairs  # near-dup shares >=1 band at 4x4 banding
    assert (1, 3) not in pairs and (3, 5) not in pairs


def test_ngram_jaccard_blocked(spark, docs):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, "text", "doc_id", "source", 0.5).collect()
    }
    assert got.get((1, 2), 0) >= 0.8  # same block, near-identical
    assert (1, 4) not in got  # exact dup but different block -> not compared


def test_ngram_jaccard_prefix_equals_none_at_zero_threshold(spark, docs):
    """t=0 edge: the prefix theorem needs t > 0 (and empty-token docs have
    no prefix row at all), so prefilter='prefix' must fall back to the
    plain block join and return the identical pair set — including pairs
    involving empty docs."""
    none = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs, "text", "doc_id", "source", threshold=0.0, prefilter="none"
        ).collect()
    }
    pref = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs, "text", "doc_id", "source", threshold=0.0, prefilter="prefix"
        ).collect()
    }
    assert pref == none and len(none) > 0


def test_ngram_jaccard_prefix_equals_none_at_half(spark, docs):
    for pf in ("none", "prefix"):
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup.ngram_jaccard_pairs(
                docs, "text", "doc_id", "source", threshold=0.5, prefilter=pf
            ).collect()
        }
        if pf == "none":
            want = got
    assert got == want


def test_minhash_hot_bucket_cap_preserves_components(spark):
    """Planted degenerate bucket: 40 byte-identical docs share every band
    (clique = 780 pairs/bucket). With hot_bucket_cap=8 the listing must be
    linear in the bucket width while connected components — the consumer
    the guard is for — stay byte-identical to the uncapped run."""
    rows = [(i, "the same boilerplate text repeated for every doc here") for i in range(40)]
    rows += [(100 + i, f"unique document number {i} with its own words {i*7}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    full = dedup.minhash_lsh_candidates(df, "text", "doc_id")
    capped = dedup.minhash_lsh_candidates(df, "text", "doc_id", hot_bucket_cap=8)
    n_full, n_capped = full.count(), capped.count()
    assert n_full >= 40 * 39 / 2  # the uncapped clique really is quadratic
    assert n_capped <= 39 + 8 * 8 * 4  # star + small-bucket residue bound

    cc_full = {(r["doc_id"], r["group_id"]) for r in dedup.connected_components(full).collect()}
    cc_capped = {
        (r["doc_id"], r["group_id"]) for r in dedup.connected_components(capped).collect()
    }
    assert cc_full == cc_capped


def test_simhash_locality(spark, docs):
    rows = {r["doc_id"]: r["simhash"] for r in dedup.simhash_df(docs, "text", "doc_id").collect()}
    from fairy_core_spark.functions.phash import hamming64

    near = hamming64(np.array([rows[1]]), np.array([rows[2]]))[0]
    far = hamming64(np.array([rows[1]]), np.array([rows[3]]))[0]
    assert near < far
    assert rows[1] == rows[4]  # identical text -> identical simhash
    assert rows[6] == 0 and rows[7] == 0  # empty/blank -> 0


def test_token_count_edges(spark, docs):
    got = {r["doc_id"]: r["n"] for r in docs.select("doc_id", token_count(F.col("text")).alias("n")).collect()}
    assert got[6] == 0 and got[7] == 0
    assert got[1] == 15


def test_lang_id_markers(spark, docs):
    got = {r["doc_id"]: r["l"] for r in docs.select("doc_id", lang_id(F.col("text")).alias("l")).collect()}
    assert got[1] == "en"
    assert got[5] == "es"
    assert got[6] == "und"


def test_fingerprint_deterministic(spark, docs):
    a = {r["doc_id"]: r["fingerprint"] for r in docs.select("doc_id", doc_fingerprint()).collect()}
    b = {r["doc_id"]: r["fingerprint"] for r in docs.select("doc_id", doc_fingerprint()).collect()}
    assert a == b
    assert a[1] == a[4] and a[1] != a[2]


def test_embedding_cosine_planted_recall(spark):
    """OR-amplified LSH must find >=95% of planted cosine-0.97 pairs at the
    production defaults (8 planes x 8 tables) — the round-2 single-bucket
    form measured only ~0.43 expected recall here."""
    rng = np.random.default_rng(11)
    dim, n_base, n_planted = 32, 300, 80
    base = rng.standard_normal((n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    c = 0.97
    rows = [(i, base[i].astype(float).tolist()) for i in range(n_base)]
    for i in range(n_planted):
        noise = rng.standard_normal(dim)
        noise -= noise @ base[i] * base[i]  # orthogonal component
        noise /= np.linalg.norm(noise)
        partner = c * base[i] + np.sqrt(1 - c * c) * noise  # exact cosine c
        rows.append((1000 + i, partner.astype(float).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    found = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_cosine_dups(
            df, "embedding", "vec_id", threshold=0.95, dim=dim
        ).collect()
    }
    planted = {(i, 1000 + i) for i in range(n_planted)}
    recall = len(found & planted) / n_planted
    assert recall >= 0.95, f"planted-pair recall {recall:.3f} < 0.95"
    # precision side: nothing below the threshold sneaks through the refine
    assert all(pair in planted for pair in found)


def test_ivf_recall(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where("vec_id < 8")
    bf = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk_bruteforce(emb, q, k=3).collect()}
    ivf_full = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, q, k=3, n_centroids=8, n_probe=8).collect()
    }
    assert bf == ivf_full  # probing every bucket == exact
    ivf_partial = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, q, k=3, n_centroids=8, n_probe=3).collect()
    }
    assert len(bf & ivf_partial) / len(bf) >= 0.5  # partial probe: decent recall


def test_centroid_sampling_survives_clustered_order(spark):
    """train_centroids must draw a real Bernoulli sample: with the corpus
    range-partitioned and sorted by cluster label (worst-case locality), a
    prefix-taking 'sample' would yield centroids from the first cluster(s)
    only and IVF recall would collapse (round-1 defect)."""
    import numpy as np

    from fairy_core_spark.operators.similarity import train_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    clustered = emb.repartitionByRange(8, "label").sortWithinPartitions("label", "vec_id")
    cent = train_centroids(clustered, "embedding", n_centroids=8)
    assert cent.shape == (8, 64)

    # nearest label-mean per centroid must span several clusters
    import pandas as pd

    pdf = emb.select("label", "embedding").toPandas()
    means = {
        lbl: np.mean(np.stack(g["embedding"].to_numpy()), axis=0)
        for lbl, g in pdf.groupby("label")
    }
    labels = sorted(means)
    mean_mat = np.stack([means[l] for l in labels])
    near = {
        labels[int(np.argmin(((mean_mat - c) ** 2).sum(axis=1)))] for c in cent
    }
    assert len(near) >= min(3, len(labels))  # spread, not a locality prefix

    # and IVF recall with these centroids stays at the healthy-probe bar
    q = emb.where("vec_id < 8")
    bf = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk_bruteforce(emb, q, k=3).collect()}
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(clustered, q, k=3, n_centroids=8, n_probe=3, centroids=cent).collect()
    }
    assert len(bf & got) / len(bf) >= 0.5


def test_text_features_df_matches_columnwise(spark):
    """The explode-based scale path must produce byte-identical features to
    the columnwise HOF form on real documents."""
    from fairy_core_spark.operators.text import text_features_df, with_text_features

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cols = ["n_tokens", "n_chars_computed", "punct_ratio", "stopword_ratio", "quality", "lang_pred"]
    slow = {r["doc_id"]: tuple(r[c] for c in cols) for r in with_text_features(docs).collect()}
    fast = {r["doc_id"]: tuple(r[c] for c in cols) for r in text_features_df(docs).collect()}
    assert fast == slow and len(fast) == 500


def test_text_features_null_text_both_forms(spark):
    """NULL text behaves exactly like empty text in BOTH feature forms
    (the pre-fix columnwise form let nulls leak through F.least, yielding
    quality=0.7/lang='de' for null docs)."""
    from fairy_core_spark.operators.text import text_features_df, with_text_features

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "the quick fox")],
        "doc_id long, text string",
    )
    cols = ["n_tokens", "punct_ratio", "stopword_ratio", "quality", "lang_pred"]
    slow = {r["doc_id"]: tuple(r[c] for c in cols) for r in with_text_features(df).collect()}
    fast = {r["doc_id"]: tuple(r[c] for c in cols) for r in text_features_df(df).collect()}
    assert fast == slow
    assert slow[1] == slow[2]  # null == empty
    assert slow[1][0] == 0 and slow[1][4] == "und"


def test_shingles_strings_contract(spark):
    """shingles() (the string form, kept as public API) yields the distinct
    word 3-grams; shingle_hashes yields one hash per distinct gram."""
    from pyspark.sql import functions as F

    from fairy_core_spark.operators.dedup import shingle_hashes, shingles

    df = spark.createDataFrame(
        [(1, "a b c d c d"), (2, "x y"), (3, "")], "i long, t string"
    )
    got = {r["i"]: sorted(r["s"]) for r in df.select("i", shingles(F.col("t")).alias("s")).collect()}
    assert got[1] == ["a b c", "b c d", "c d c", "d c d"]
    assert got[2] == [] and got[3] == []
    nh = {r["i"]: r["n"] for r in df.select("i", F.size(shingle_hashes(F.col("t"))).alias("n")).collect()}
    assert nh == {1: 4, 2: 0, 3: 0}


def test_connected_components_shapes(spark):
    """Chain (forces multi-round propagation), star, two components,
    singleton pair — group_id is always the component minimum."""
    pairs = spark.createDataFrame(
        [
            # chain a-b-c-d-e (diameter 4: needs >1 propagation round)
            ("b", "c"), ("a", "b"), ("d", "e"), ("c", "d"),
            # star centered at m
            ("m", "x"), ("m", "y"), ("m", "z"),
            # isolated pair
            ("p", "q"),
        ],
        ["id_a", "id_b"],
    )
    got = {
        (r["doc_id"], r["group_id"])
        for r in dedup.connected_components(pairs).collect()
    }
    want = (
        {(n, "a") for n in "abcde"}
        | {(n, "m") for n in "mxyz"}
        | {(n, "p") for n in "pq"}
    )
    assert got == want


def test_connected_components_empty(spark):
    pairs = spark.createDataFrame([], "id_a string, id_b string")
    assert dedup.connected_components(pairs).count() == 0


def test_connected_components_long_chain_stats_stay_bounded(spark):
    """Regression for the round-18+ blowup: localCheckpoint carries the
    producing plan's sizeInBytes estimate (originStats), and because each
    round joins the labels frame twice, the size-only join estimate
    (product of children) SQUARES per round — BigInt digits double, and
    the stats visitor's BigInteger math dominated late rounds (56s/round
    measured at round 22, graph-size-independent). _strip_plan_stats
    resets the estimate each round; this pins (a) correctness on a chain
    long enough to need ~18 rounds and (b) the mechanism itself: the
    returned frame's plan-stats estimate stays a normal-sized number
    instead of a 2^(2^rounds)-scale product."""
    n = 400
    pairs = spark.createDataFrame(
        [(f"{i:04d}", f"{i + 1:04d}") for i in range(n - 1)], ["id_a", "id_b"]
    )
    out = dedup.connected_components(pairs, max_iters=40)
    rows = out.collect()
    assert len(rows) == n
    assert {r["group_id"] for r in rows} == {"0000"}
    bits = int(
        out._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    ).bit_length()
    assert bits < 100, f"plan-stats estimate blew up: {bits} bits"


def test_duplicated_spans_planted_boilerplate(spark):
    """Docs sharing an 8-token boilerplate prefix are flagged; a unique
    doc is not; a short doc gets zeros. Within-doc repetition counts."""
    from pyspark.sql import functions as F

    boiler = "the quick brown fox jumps over the lazy"
    rows = [
        (1, boiler + " dog alpha beta gamma delta"),
        (2, boiler + " cat epsilon zeta eta theta"),
        (3, "completely unique words nobody else ever wrote here today friend"),
        (4, "tiny doc"),
        (5, "rep rep rep rep rep rep rep rep rep rep rep rep rep rep rep rep"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in dedup.duplicated_spans(df, window=8, min_count=2).collect()
    }
    assert len(got) == 5
    # docs 1/2 share the 8-token boilerplate window (exactly 1 window pos)
    assert got[1]["n_dup_windows"] >= 1 and got[2]["n_dup_windows"] >= 1
    assert got[3]["n_dup_windows"] == 0 and got[3]["n_windows"] == 3
    assert got[4]["n_windows"] == 0 and got[4]["dup_frac"] == 0.0
    # doc 5: every 8-token window is "rep"*8 -> all 9 positions duplicated
    assert got[5]["n_windows"] == 9 and got[5]["n_dup_windows"] == 9
    assert got[5]["dup_frac"] == 1.0


def test_window_hashes_positional_vs_shingle_distinct(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "a b a b a b")], "id long, text string")
    w = df.select(dedup.window_hashes(F.col("text"), 2).alias("w")).collect()[0]["w"]
    s = df.select(dedup.shingle_hashes(F.col("text"), 2).alias("s")).collect()[0]["s"]
    assert len(w) == 5  # positional: every adjacent pair
    assert len(set(w)) == 2 == len(s)  # only 'a b' / 'b a' distinct
    assert set(w) == set(s)  # same fold -> same hash values


def test_redact_pii_classes_and_order(spark):
    from fairy_core_spark.operators.text import redact_pii

    rows = [
        (1, "mail me at jane.doe+x@corp.example.com or 10.1.2.3 thanks"),
        (2, "call +1 555 123 4567 now"),
        (3, "clean text with no identifiers at all"),
        (4, "two mails a@b.co c@d.org one ip 255.255.255.255"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert got[1]["n_email"] == 1 and got[1]["n_ipv4"] == 1 and got[1]["n_phone"] == 0
    assert "<email>" in got[1]["redacted"] and "<ipv4>" in got[1]["redacted"]
    assert "jane.doe" not in got[1]["redacted"] and "10.1.2.3" not in got[1]["redacted"]
    assert got[2]["n_phone"] == 1 and "<phone>" in got[2]["redacted"]
    assert got[3]["n_email"] == got[3]["n_ipv4"] == got[3]["n_phone"] == 0
    assert got[3]["redacted"] == got[3]["text"]
    assert got[4]["n_email"] == 2 and got[4]["n_ipv4"] == 1


def test_repetition_stats_within_doc(spark):
    rows = [
        (1, "rep rep rep rep rep rep"),  # 4 windows of 3, all identical
        (2, "one two three four five six"),  # 4 windows, all distinct
        (3, "ab"),  # shorter than the window
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dedup.repetition_stats(df, window=3).collect()}
    assert got[1]["n_windows"] == 4 and got[1]["n_distinct_windows"] == 1
    assert got[1]["dup_window_frac"] == 0.75 and got[1]["top_window_frac"] == 1.0
    assert got[2]["n_windows"] == 4 and got[2]["dup_window_frac"] == 0.0
    assert got[2]["top_window_frac"] == 0.25
    assert got[3]["n_windows"] == 0 and got[3]["top_window_frac"] == 0.0


def test_decontaminate_drops_exactly_overlapping_docs(spark):
    bench = spark.createDataFrame(
        [(100, "the secret benchmark answer is forty two")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "prefix text the secret benchmark answer is forty two suffix"),
            (2, "nothing in common with any benchmark document at all here"),
            (3, "the secret benchmark words but differently ordered answer"),
        ],
        "doc_id long, text string",
    )
    kept = dedup.decontaminate(train, bench, window=5)
    assert {r["doc_id"] for r in kept.collect()} == {2, 3}
    flagged = dedup.decontaminate(train, bench, window=5, mode="flag")
    got = {r["doc_id"]: r["contaminated"] for r in flagged.collect()}
    assert got == {1: True, 2: False, 3: False}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup.decontaminate(train, bench, mode="bogus")


def test_canonical_url_contract(spark):
    from fairy_core_spark.operators.text import canonical_url, url_domain

    cases = {
        "HTTPS://WWW.Example.COM:443/Path/To?utm_source=x&b=2&a=1#frag":
            ("https://www.example.com/Path/To?a=1&b=2", "www.example.com"),
        "http://Site.org:80/": ("http://site.org/", "site.org"),
        "http://site.org:8080/x?z=1": ("http://site.org:8080/x?z=1", "site.org"),
        "https://user:pw@Host.Net/path": ("https://user:pw@host.net/path", "host.net"),
        "ftp://Files.example/a?b=1&utm_campaign=c": ("ftp://files.example/a?b=1", "files.example"),
        "https://a.b/?utm_source=only": ("https://a.b/", "a.b"),
    }
    df = spark.createDataFrame([(k,) for k in cases], "u string")
    got = {
        r["u"]: (r["c"], r["d"])
        for r in df.select(
            "u",
            canonical_url(F.col("u")).alias("c"),
            url_domain(F.col("u")).alias("d"),
        ).collect()
    }
    assert got == cases


def test_token_rarity_hand_counts(spark):
    from fairy_core_spark.operators.text import token_rarity

    docs = spark.createDataFrame(
        [
            (1, "the the rare"),     # 'the' freq 3, 'rare' freq 1
            (2, "the common common"),  # 'common' freq 2
            (3, "   "),             # empty -> dropped
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["sum_token_freq"], r["min_token_freq"])
        for r in token_rarity(docs).collect()
    }
    assert got == {1: (3, 7, 1), 2: (3, 7, 2)}


def test_blank_docs_never_pair_as_duplicates(spark):
    """whitespace-only / empty docs have an EMPTY token set — they must not
    pair with each other at jaccard 1.0 (split-on-empty yields [''], which
    the operator now filters), in either prefilter path."""
    docs = spark.createDataFrame(
        [(1, "   ", "s"), (2, "", "s"), (3, "real words here", "s"),
         (4, "real words here", "s")],
        "doc_id long, text string, source string",
    )
    for pf in ("prefix", "none"):
        got = {
            (r["id_a"], r["id_b"])
            for r in dedup.ngram_jaccard_pairs(
                docs, "text", "doc_id", "source", 0.5, prefilter=pf
            ).collect()
        }
        assert got == {(3, 4)}, (pf, got)


def test_zero_norm_embeddings_never_crash_or_pair(spark):
    """all-zero embeddings (padding rows) collide in EVERY sign bucket, so
    the LSH path is guaranteed to generate their pairs — the cosine refine
    must score them 0.0 (not throw ANSI DIVIDE_BY_ZERO) and drop them."""
    import numpy as np

    rng = np.random.default_rng(3)
    rows = [(i, rng.standard_normal(8).tolist()) for i in range(20)]
    rows += [(100, [0.0] * 8), (101, [0.0] * 8)]  # two zero vectors
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = dedup.embedding_cosine_dups(
        emb, "embedding", "vec_id", threshold=0.4, n_planes=4, seed=7, dim=8, n_tables=4
    ).collect()
    ids = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    assert 100 not in ids and 101 not in ids

    from fairy_core_spark.operators.similarity import cosine_topk_bruteforce

    top = cosine_topk_bruteforce(emb, emb.where(F.col("vec_id") == 100), k=3).collect()
    assert len(top) == 3 and all(r["cosine"] == 0.0 for r in top)


def test_cell_vector_sums_exact(spark):
    """Hand-computed fixed-point sums incl. a negative component (floor
    goes toward -inf) and the dims slice."""
    from fairy_core_spark.operators.similarity import cell_vector_sums

    rows = [("a", [0.5, -0.25]), ("a", [0.5, 0.75]), ("b", [1.0, 0.0]),
            ("b", [float("nan"), 0.5])]
    df = spark.createDataFrame(rows, "cell string, embedding array<float>")
    got = {
        (r["cell"], r["pos"]): (r["sum_q"], r["n"])
        for r in cell_vector_sums(df).collect()
    }
    assert got == {
        ("a", 0): (1_000_000, 2),
        ("a", 1): (500_000, 2),  # floor(-0.25e6) + floor(0.75e6)
        ("b", 0): (1_000_000, 1),  # NaN component excluded from sum AND n
        ("b", 1): (500_000, 2),
    }
    sliced = cell_vector_sums(df, dims=1).collect()
    assert {r["pos"] for r in sliced} == {0}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cell_vector_sums(df, dims=0)
