"""Training-data pipeline operator tests over the driver's documents /
embeddings tables (sf0.001) plus synthetic fixtures."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from deepgraph_spark.pipeline import (
    ann_topk_bruteforce,
    ann_topk_lsh,
    embedding_neardup_pairs,
    exact_dedup,
    lang_id,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    text_quality,
    token_stats,
)
from deepgraph_spark.pipeline.multimodal import extract_features, frame_sample, synthetic_assets
from deepgraph_spark.pipeline.textstats import doc_fingerprints

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_exact_dedup(spark, docs):
    got = exact_dedup(docs).toPandas()
    pdf = docs.toPandas()
    exp = pdf.groupby("text").agg(doc_id=("doc_id", "min"), n_copies=("doc_id", "size"))
    assert len(got) == len(exp)
    merged = got.set_index("doc_id").join(exp.set_index("doc_id"), lsuffix="_g")
    assert (merged.n_copies_g == merged.n_copies).all()


def test_incremental_dedup_against_index(spark, docs, tmp_path):
    """The persisted-index path must find a planted near-dup of a corpus doc,
    survive a parquet roundtrip bit-for-bit, and its estimator must equal the
    directly-computed fraction of equal minhashes."""
    from deepgraph_spark.pipeline import dedup_against_index, minhash_signatures

    pdf = docs.toPandas()
    new = pdf.head(5).copy()
    new["doc_id"] = new["doc_id"] + 100000
    new["text"] = new["text"] + " extra"
    new_docs = spark.createDataFrame(new)

    idx = minhash_signatures(docs)
    # parquet roundtrip: the index is a persistable table, not a plan detail
    idx.write.mode("overwrite").parquet(str(tmp_path / "idx"))
    idx2 = spark.read.parquet(str(tmp_path / "idx"))

    got = dedup_against_index(new_docs, idx2, threshold=0.5).toPandas()
    found = set(map(tuple, got[["new_id", "corpus_id"]].values))
    for i in range(5):
        a = int(pdf.doc_id.iloc[i])
        assert (a + 100000, a) in found, (a, sorted(found)[:10])
    assert ((got.est_jaccard >= 0.5) & (got.est_jaccard <= 1.0)).all()
    # estimator granularity: k/32 exactly
    assert ((got.est_jaccard * 32) % 1 == 0).all()

    # estimator parity vs a direct signature comparison (no band filter)
    sig = idx.toPandas().set_index("doc_id")
    nsig = minhash_signatures(new_docs).toPandas().set_index("doc_id")
    hcols = [f"h{i}" for i in range(32)]
    for _, r in got.iterrows():
        direct = float(
            (nsig.loc[r.new_id, hcols].values == sig.loc[r.corpus_id, hcols].values).mean()
        )
        assert abs(direct - r.est_jaccard) < 1e-12


def test_minhash_finds_planted_dups(spark, docs):
    # plant near-duplicates: copy 5 docs with one token changed
    pdf = docs.toPandas()
    dups = pdf.head(5).copy()
    dups["doc_id"] = dups["doc_id"] + 100000
    dups["text"] = dups["text"] + " extra"
    planted = spark.createDataFrame(pd.concat([pdf, dups], ignore_index=True))
    pairs = minhash_lsh_dedup(planted, threshold=0.5).toPandas()
    found = set(map(tuple, pairs[["a", "b"]].values))
    for i in range(5):
        a = int(pdf.doc_id.iloc[i])
        assert (a, a + 100000) in found, (a, sorted(found)[:10])
    # jaccard values are exact
    assert (pairs.jaccard <= 1.0).all() and (pairs.jaccard > 0.4).all()


def test_simhash_deterministic_and_close(spark, docs):
    a = simhash_fingerprints(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        simhash_fingerprints(docs.repartition(7))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # identical docs → identical simhash
    pdf = docs.toPandas().head(3)
    dup = pdf.copy()
    dup["doc_id"] += 500000
    planted = spark.createDataFrame(pd.concat([pdf, dup]))
    sh = simhash_fingerprints(planted).toPandas().set_index("doc_id")["simhash"]
    for i in pdf.doc_id:
        assert sh[i] == sh[i + 500000]


def test_ngram_jaccard(spark, docs):
    got = ngram_jaccard_pairs(docs, group_cols=["source"], threshold=0.0).toPandas()
    pdf = docs.toPandas()
    toks = {r.doc_id: set(str(r.text).split()) for r in pdf.itertuples()}
    # verify a sample of pairs
    sample = got.head(50)
    for r in sample.itertuples():
        a, b = toks[r.a], toks[r.b]
        exp = len(a & b) / len(a | b)
        assert abs(r.jaccard - exp) < 1e-12
    # pairs only within source blocks
    src = pdf.set_index("doc_id")["source"]
    assert (got.a.map(src).values == got.b.map(src).values).all()


def test_ngram_jaccard_block_guard(spark, docs):
    """An oversized block must fail loudly instead of silently going O(n^2)."""
    with pytest.raises(ValueError, match="max_block_rows"):
        ngram_jaccard_pairs(docs, group_cols=["source"], max_block_rows=10).count()
    with pytest.raises(ValueError, match="max_block_rows"):
        ngram_jaccard_pairs(docs, max_block_rows=10).count()
    # an explicit opt-out (or a generous bound) keeps the blocked plan usable
    assert ngram_jaccard_pairs(
        docs, group_cols=["source"], max_block_rows=None, threshold=0.5
    ).count() >= 0


def test_embedding_neardup_and_ann(spark, emb):
    pdf = emb.toPandas()
    m = np.array([np.asarray(x, dtype=np.float64) for x in pdf.embedding.values])
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T

    nd = embedding_neardup_pairs(emb, threshold=0.9).toPandas()
    ids = pdf.vec_id.values
    pos = {x: i for i, x in enumerate(ids)}
    exp_pairs = {
        (ids[i], ids[j])
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if sims[i, j] >= 0.9
    }
    # engine computes in float32-sourced doubles; allow boundary wiggle
    got_pairs = set(map(tuple, nd[["a", "b"]].values))
    assert got_pairs == exp_pairs or (
        len(got_pairs ^ exp_pairs) <= 2
        and all(abs(sims[pos[a], pos[b]] - 0.9) < 1e-6 for a, b in got_pairs ^ exp_pairs)
    )

    topk = ann_topk_bruteforce(emb, k=5).toPandas()
    assert (topk.groupby("query_id").size() == 5).all()
    # verify one query against numpy
    q = ids[0]
    sub = topk[topk.query_id == q].sort_values("rank")
    order = np.argsort([(-round(sims[0, j], 6), ids[j]) if j != 0 else (9, 0) for j in range(len(ids))], axis=0)
    exp_ids = [ids[j] for j in np.lexsort((ids, -np.round(sims[0], 6))) if j != 0][:5]
    assert sub.neighbor_id.tolist() == exp_ids


def test_embedding_neardup_gate_recall(spark, emb):
    """The gate query's LSH settings (n_planes=3, n_tables=48, seed=7) must
    reach recall 1.0 vs the exhaustive cut at threshold 0.4 — the driver
    oracle is exhaustive, so anything below 1.0 would fail the gate."""
    exact = embedding_neardup_pairs(emb, threshold=0.4, method="exact").toPandas()
    lsh = embedding_neardup_pairs(
        emb, threshold=0.4, method="lsh", n_tables=48
    ).toPandas()
    exact_pairs = set(map(tuple, exact[["a", "b"]].values))
    lsh_pairs = set(map(tuple, lsh[["a", "b"]].values))
    recall = len(exact_pairs & lsh_pairs) / max(len(exact_pairs), 1)
    assert recall == 1.0, f"gate-setting LSH recall {recall} < 1.0"


def test_ann_ivf_recall_and_candidate_pruning(spark, emb):
    from deepgraph_spark.pipeline import ann_topk_ivf

    exact = ann_topk_bruteforce(emb, k=5).toPandas()
    # 500 vectors / centroid_mod 50 -> 10 buckets; on UNSTRUCTURED random
    # embeddings IVF recall ~= fraction of buckets probed (no cluster
    # structure to exploit), so nprobe=3 of 10 should land near 0.3 — the
    # assertions below are the properties that must hold regardless of data
    approx = ann_topk_ivf(emb, k=5, centroid_mod=50, nprobe=3).toPandas()
    e = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
    a = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    assert recall >= 0.2, f"IVF recall {recall} below the probed fraction"
    # every reported neighbor's cosine must equal the exact cosine (IVF only
    # prunes candidates, never approximates the score)
    merged = approx.merge(
        exact, on=["query_id", "neighbor_id"], suffixes=("_ivf", "_exact")
    )
    assert len(merged) > 0
    assert (merged.cosine_ivf == merged.cosine_exact).all()
    # probing EVERY bucket degrades gracefully to the exact full scan
    wide = ann_topk_ivf(emb, k=5, centroid_mod=50, nprobe=10).toPandas()
    w = {(r.query_id, r.neighbor_id) for r in wide.itertuples()}
    assert w == e
    assert len(e & w) >= len(e & a)  # recall monotone in nprobe


def test_ann_lsh_recall(spark, emb):
    exact = ann_topk_bruteforce(emb, k=5).toPandas()
    approx = ann_topk_lsh(emb, k=5, n_planes=3, n_tables=10).toPandas()
    e = exact.groupby("query_id")["neighbor_id"].apply(set)
    a = approx.groupby("query_id")["neighbor_id"].apply(set)
    common = e.index.intersection(a.index)
    recall = np.mean([len(e[q] & a[q]) / len(e[q]) for q in common])
    assert recall > 0.5, recall  # bucketed ANN: decent recall at tiny scale


def test_token_stats_and_quality(spark, docs):
    ts = token_stats(docs).toPandas().set_index("doc_id")
    pdf = docs.toPandas().set_index("doc_id")
    for did in list(pdf.index[:20]):
        toks = str(pdf.text[did]).split()
        assert ts.n_tokens[did] == len(toks)
        assert ts.n_chars[did] == len(str(pdf.text[did]))
        assert abs(ts.avg_token_len[did] - np.mean([len(t) for t in toks])) < 1e-9
    q = text_quality(docs).toPandas()
    assert ((q.alpha_ratio >= 0) & (q.alpha_ratio <= 1)).all()
    assert ((q.stopword_ratio >= 0) & (q.stopword_ratio <= 1)).all()


def test_lang_id_deterministic(spark, docs):
    a = lang_id(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = lang_id(docs.repartition(5)).toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert set(a.lang_guess) <= {"en", "de", "es", "fr", "und"}


def test_fingerprints(spark, docs):
    fp = doc_fingerprints(docs).toPandas()
    assert fp.doc_id.nunique() == docs.count()
    # identical docs produce identical fingerprint sets
    fp2 = doc_fingerprints(docs.repartition(3)).toPandas()
    s1 = fp.groupby("doc_id")["fingerprint"].apply(frozenset)
    s2 = fp2.groupby("doc_id")["fingerprint"].apply(frozenset)
    assert (s1 == s2).all()


def test_multimodal_stub(spark):
    assets = synthetic_assets(spark, n=30)
    feats = extract_features(assets, dim=8).toPandas()
    assert len(feats) == 30
    assert all(len(f) == 8 for f in feats.features)
    # deterministic across partitioning
    feats2 = extract_features(synthetic_assets(spark, n=30).repartition(4), dim=8).toPandas()
    m1 = feats.set_index("asset_id")["features"].apply(tuple)
    m2 = feats2.set_index("asset_id")["features"].apply(tuple)
    assert (m1.sort_index() == m2.sort_index()).all()
    frames = frame_sample(assets, every_ms=250).toPandas()
    assert (frames.frame_ms % 250 == 0).all()
    with pytest.raises(Exception, match="NotImplementedError|decoder"):
        extract_features(assets, fake=False).count()


def test_multimodal_codecs_roundtrip():
    """PPM and WAV codecs are exact inverses (numpy-only, no decoder libs)."""
    from deepgraph_spark.pipeline.multimodal import (
        decode_ppm,
        decode_wav,
        encode_ppm,
        encode_wav,
        resize_nearest,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    # comment lines in the header are legal PPM
    with_comment = b"P6\n# a comment\n7 9\n255\n" + img.tobytes()
    assert (decode_ppm(with_comment) == img).all()
    small = resize_nearest(img, 3, 3)
    assert small.shape == (3, 3, 3)

    s = np.sin(np.arange(800) / 10.0) * 0.25
    dec, rate = decode_wav(encode_wav(s, rate=8000))
    assert rate == 8000
    assert np.abs(dec - s).max() < 1e-4  # int16 quantization only


def test_multimodal_real_decode(spark):
    """fake=False end-to-end through extract_features on real PPM/WAV
    payloads — decode + feature extraction inside the Arrow batches."""
    from deepgraph_spark.pipeline.multimodal import _audio_features, _image_features

    assets = synthetic_assets(spark, n=12, real=True)
    decodable = assets.where(F.col("media_type") != "video")
    feats = extract_features(decodable, dim=9, fake=False).toPandas()
    assert len(feats) == 8  # 4 images + 4 audio of the 12
    assert all(len(f) == 9 for f in feats.features)
    # spot-check against driver-side numpy on the same payloads
    raw = decodable.select("asset_id", "media_type", "media").toPandas()
    for r in raw.itertuples():
        got = np.array(feats.set_index("asset_id").loc[r.asset_id, "features"])
        fn = _image_features if r.media_type == "image" else _audio_features
        np.testing.assert_allclose(got, fn(bytes(r.media), 9), atol=1e-12)
    # image features are grayscale in [0,1]; audio features are RMS >= 0
    assert (np.concatenate(feats.features.values) >= 0).all()
    # video (no codec) still fails loudly on the real path
    with pytest.raises(Exception, match="NotImplementedError|decoder"):
        extract_features(assets, fake=False).count()


def test_hash60_duckdb_parity(spark):
    """The shared 60-bit MD5 hash is the contract that makes simhash,
    winnowing fingerprints and the minhash band pipeline oracle-able:
    Spark's conv(substr(md5, 1, 15), 16, 10) must equal DuckDB's
    ('0x' || substr(md5, 1, 15))::BIGINT byte-for-byte."""
    import duckdb
    from pyspark.sql import functions as F

    from deepgraph_spark.pipeline.dedup import hash60

    vals = ["foo", "bar baz", "", "0|the quick fox", "üñïçødé"]
    got = (
        spark.createDataFrame([(v,) for v in vals], "s string")
        .select("s", hash60(F.col("s")).alias("h"))
        .toPandas()
        .set_index("s")["h"]
    )
    con = duckdb.connect()
    for v in vals:
        exp = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [v]
        ).fetchone()[0]
        assert got[v] == exp, v


def test_line_exact_dedup(spark):
    from deepgraph_spark.pipeline import line_exact_dedup

    rows = [
        (1, "alpha beta\ncommon line\nunique one"),
        (2, "common line\ngamma delta"),         # "common line" repeats -> doc 1 keeps it
        (3, "  common line \nunique one\n\n"),   # trims + empty line dropped; both repeats
        (4, "\n\n"),                             # only empty lines -> everything removed
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in line_exact_dedup(docs).collect()
    }
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (3, 3)
    assert out[1]["text"] == "alpha beta\ncommon line\nunique one"
    assert (out[2]["n_lines"], out[2]["n_kept"]) == (2, 1)
    assert out[2]["text"] == "gamma delta"
    assert (out[3]["n_lines"], out[3]["n_kept"]) == (2, 0)
    assert out[3]["text"] == ""
    assert (out[4]["n_lines"], out[4]["n_kept"]) == (0, 0)
    assert out[4]["text"] == ""


def test_line_exact_dedup_first_occurrence_canonical(spark):
    """Winner is min (doc_id, pos) regardless of partitioning/order."""
    from deepgraph_spark.pipeline import line_exact_dedup

    rows = [(i, "dup line\nown %d" % i) for i in range(20, 0, -1)]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(7)
    out = line_exact_dedup(docs).collect()
    keepers = [r["doc_id"] for r in out if r["text"].startswith("dup line")]
    assert keepers == [1]  # the smallest doc_id keeps the shared line
    assert all(r["n_kept"] == (2 if r["doc_id"] == 1 else 1) for r in out)


def test_embedding_neardup_empty_input(spark):
    """Empty embedding input must yield an empty result on EVERY path — the
    dim probe (first()) returns None on empty input, which previously raised
    an opaque TypeError for the seeded-planes path and regressed the
    explicit-planes path (which never needed the probe)."""
    from deepgraph_spark.pipeline.dedup import _hyperplane_buckets

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert embedding_neardup_pairs(empty, threshold=0.9, method="lsh").count() == 0
    # explicit planes: dim check is probe-dependent, must also short-circuit
    planes = np.ones((2, 3, 8))
    got = _hyperplane_buckets(
        empty, vec_col="embedding", id_col="vec_id",
        n_planes=3, n_tables=2, seed=7, planes=planes,
    )
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["vid", "table", "bucket"]


def test_semantic_dedup_matches_numpy_mirror(spark, emb):
    """SemDeDup: full numpy mirror of the pipeline — hash-sampled centroids,
    nearest-centroid assignment (6-dp rounded cosine, cid tie-break), exact
    within-cluster pairwise cut at tau, transitive closure, min-id labels."""
    from deepgraph_spark.pipeline import semantic_dedup

    tau, mod = 0.4, 25
    pdf = emb.toPandas()
    ids = pdf.vec_id.values
    m = np.array([np.asarray(x, dtype=np.float64) for x in pdf.embedding.values])
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    c_idx = [i for i, x in enumerate(ids) if x % mod == 0]
    sims_c = np.round(mn @ mn[c_idx].T, 6)
    # nearest centroid, ties to the smaller cid
    bucket = {}
    for i in range(len(ids)):
        best = max(range(len(c_idx)), key=lambda j: (sims_c[i, j], -ids[c_idx[j]]))
        bucket[ids[i]] = ids[c_idx[best]]
    sims = np.round(mn @ mn.T, 6)
    parent = {x: x for x in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    linked = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if bucket[ids[i]] == bucket[ids[j]] and sims[i, j] >= tau:
                a, b = find(ids[i]), find(ids[j])
                parent[max(a, b)] = min(a, b)
                linked.add(ids[i]); linked.add(ids[j])
    exp = {x: find(x) for x in linked}
    assert exp, "fixture must contain at least one semantic-dup pair"

    got = semantic_dedup(emb, threshold=tau, centroid_mod=mod).toPandas()
    assert dict(zip(got.vec_id, got.cluster)) == exp


def test_semantic_dedup_cluster_guard(spark, emb):
    """A pathological centroid cluster (here: one centroid takes everything)
    must fail loudly instead of silently going quadratic."""
    from deepgraph_spark.pipeline import semantic_dedup

    with pytest.raises(ValueError, match="max_cluster_rows"):
        semantic_dedup(emb, centroid_mod=10_000, max_cluster_rows=50)


def test_codebook_fixed_size_mode(spark, emb):
    """n_centroids= (absolute, open-scale codebook) must equal the
    centroid_mod= form at the helper's derived modulus — identical output
    for both SemDeDup and IVF, since the only difference is where the
    modulus literal comes from."""
    from deepgraph_spark.pipeline import ann_topk_ivf, semantic_dedup
    from deepgraph_spark.pipeline.dedup import _codebook_mod, _emb_base

    n = emb.count()
    k = 24
    mod = max(1, n // k)
    base = _emb_base(emb, "embedding", "vec_id", [])
    assert _codebook_mod(base, "vec_id", 1000, k) == mod
    # derived-modulus codebook size stays O(k) by construction
    n_cents = emb.where(F.col("vec_id") % mod == 0).count()
    assert 0 < n_cents <= 2 * k

    a = semantic_dedup(emb, threshold=0.4, n_centroids=k).toPandas()
    b = semantic_dedup(emb, threshold=0.4, centroid_mod=mod).toPandas()
    assert dict(zip(a.vec_id, a.cluster)) == dict(zip(b.vec_id, b.cluster))
    assert len(a) > 0

    ia = (
        ann_topk_ivf(emb, k=5, n_centroids=k, nprobe=3)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    ib = (
        ann_topk_ivf(emb, k=5, centroid_mod=mod, nprobe=3)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(ia, ib)


def test_codebook_fixed_size_plan_shape(spark, emb):
    """The two codebook modes compile to the SAME physical plan — only the
    modulus literal differs (digits stripped, the explain strings match)."""
    import contextlib
    import io
    import re

    from deepgraph_spark.pipeline import ann_topk_ivf

    n = emb.count()
    mod = max(1, n // 24)

    def shape(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return re.sub(r"\d+", "", buf.getvalue())

    pa = shape(ann_topk_ivf(emb, k=5, n_centroids=24, nprobe=2))
    pb = shape(ann_topk_ivf(emb, k=5, centroid_mod=mod, nprobe=2))
    assert pa == pb


def test_semantic_dedup_kmeans_refinement(spark, emb):
    """kmeans_iters=0 is byte-identical to the default path; a refined
    codebook still yields a valid SemDeDup clustering (labels are min-id of
    their component, and every member has a >= tau partner in its cluster)."""
    from deepgraph_spark.pipeline import semantic_dedup

    tau = 0.4
    d0 = semantic_dedup(emb, threshold=tau, centroid_mod=25).toPandas()
    it0 = semantic_dedup(emb, threshold=tau, centroid_mod=25, kmeans_iters=0).toPandas()
    assert dict(zip(it0.vec_id, it0.cluster)) == dict(zip(d0.vec_id, d0.cluster))

    got = semantic_dedup(emb, threshold=tau, centroid_mod=25, kmeans_iters=2).toPandas()
    assert len(got) > 0
    pdf = emb.toPandas()
    m = np.array([np.asarray(x, dtype=np.float64) for x in pdf.embedding.values])
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.round(mn @ mn.T, 6)
    row_of = {int(v): i for i, v in enumerate(pdf.vec_id.values)}
    for cluster, members in got.groupby("cluster")["vec_id"].apply(list).items():
        assert cluster == min(members)
        for v in members:
            partners = [u for u in members if u != v]
            assert any(sims[row_of[v], row_of[u]] >= tau for u in partners), (
                cluster,
                v,
            )


def test_reparallelize_small_scan_gates_on_bare_scans(spark, tmp_path):
    """The small-scan repartition fires for a narrow chain over a few-file
    scan, and stays out of composed plans whose parallelism is already set
    by upstream shuffle exchanges (round-7 advice)."""
    from deepgraph_spark.pipeline.util import _is_bare_scan, reparallelize_small_scan

    # a fresh single-file parquet: other modules .cache() the shared test
    # tables, and a cache-substituted relation reports no inputFiles() (the
    # helper then correctly leaves partitioning to the cached data)
    path = str(tmp_path / "one.parquet")
    spark.range(100).selectExpr("id as doc_id", "'x' as text").coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    bare = df.select("doc_id", "text").where(F.col("doc_id") >= 0)
    assert _is_bare_scan(bare)
    out = reparallelize_small_scan(bare, "doc_id")
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism

    composed = df.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    assert not _is_bare_scan(composed)
    assert reparallelize_small_scan(composed, "doc_id") is composed

    joined = bare.join(
        df.select(F.col("doc_id").alias("doc_id2")),
        F.col("doc_id") == F.col("doc_id2"),
    )
    assert not _is_bare_scan(joined)
    assert reparallelize_small_scan(joined, "doc_id") is joined


def test_png_codec_roundtrip_and_filters():
    """PNG decoder: roundtrip across color types and encoder filters, plus
    handcrafted Average/Paeth scanlines checked against an independent
    scalar reference, CRC verification, and fail-loud unsupported variants."""
    import struct
    import zlib

    from deepgraph_spark.pipeline.multimodal import _PNG_SIG, decode_png, encode_png

    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, size=(7, 5), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(9, 6, 3), dtype=np.uint8)
    rgba = rng.integers(0, 256, size=(4, 8, 4), dtype=np.uint8)
    for img in (gray, rgb, rgba):
        for ft in (0, 1, 2):
            assert (decode_png(encode_png(img, filter_type=ft)) == img).all()

    # Average (3) and Paeth (4): build the filtered stream with an
    # independent scalar reference, then decode must invert it exactly
    def ref_filter(ft, row, prev, ch):
        out = []
        for k in range(len(row)):
            a = int(row[k - ch]) if k >= ch else 0
            b = int(prev[k])
            c = int(prev[k - ch]) if k >= ch else 0
            if ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((int(row[k]) - pred) % 256)
        return bytes(out)

    img = rng.integers(0, 256, size=(3, 4, 3), dtype=np.uint8)
    flat = img.reshape(3, -1)
    raw = b"\x00" + flat[0].tobytes()
    raw += b"\x03" + ref_filter(3, flat[1], flat[0], 3)
    raw += b"\x04" + ref_filter(4, flat[2], flat[1], 3)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    png = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert (decode_png(png) == img).all()

    # corrupted IDAT payload must fail the CRC check, not decode garbage
    good = bytearray(encode_png(rgb))
    idat_at = bytes(good).index(b"IDAT") + 6
    good[idat_at] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(good))

    # unsupported variants raise at the plug-in point
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_png(
            _PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
            + chunk(b"IEND", b"")
        )
    with pytest.raises(NotImplementedError, match="Adam7"):
        decode_png(
            _PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
            + chunk(b"IEND", b"")
        )
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF....")


def test_ngram_jaccard_prefix_equals_allpairs(spark, docs):
    """Prefix filtering is lossless: at every threshold the candidate+verify
    plan returns exactly the all-pairs result (pairs AND values), grouped and
    ungrouped, including planted near-duplicates."""
    pdf = docs.toPandas()
    dups = pdf.head(4).copy()
    dups["doc_id"] = dups["doc_id"] + 100000
    dups["text"] = dups["text"] + " zq1"
    planted = spark.createDataFrame(pd.concat([pdf, dups], ignore_index=True))

    def canon(res):
        return {
            (int(r.a), int(r.b)): round(float(r.jaccard), 12)
            for r in res.itertuples()
        }

    for tau in (0.1, 0.35, 0.6, 0.9):
        ap = ngram_jaccard_pairs(
            planted, group_cols=["source"], threshold=tau, method="allpairs"
        ).toPandas()
        pf = ngram_jaccard_pairs(
            planted, group_cols=["source"], threshold=tau, method="prefix"
        ).toPandas()
        assert canon(ap) == canon(pf), f"tau={tau}"
    assert len(ap) > 0  # the planted dups survive even tau=0.9

    # ungrouped too
    small = planted.limit(60)
    ap = ngram_jaccard_pairs(small, threshold=0.3, method="allpairs").toPandas()
    pf = ngram_jaccard_pairs(small, threshold=0.3, method="prefix").toPandas()
    assert canon(ap) == canon(pf)

    # auto: prefix at tau > 0 (no block guard), allpairs at tau = 0
    big_block = ngram_jaccard_pairs(
        planted, group_cols=["source"], threshold=0.5, max_block_rows=5
    )
    assert big_block.count() > 0  # prefix path: guard not applicable
    with pytest.raises(ValueError, match="max_block_rows"):
        ngram_jaccard_pairs(
            planted, group_cols=["source"], threshold=0.0, max_block_rows=5
        ).count()
    with pytest.raises(ValueError, match="threshold > 0"):
        ngram_jaccard_pairs(planted, method="prefix", threshold=0.0)


def test_curation_pipeline_span_and_semantic_stages(spark, docs, emb):
    """The widened composed pipeline: strip_spans rewrites survivor text
    (changing token counts downstream) and the semantic stage drops
    non-canonical members of embedding clusters — both verified against the
    unwidened run."""
    from deepgraph_spark.pipeline import curation_pipeline

    corpus = docs.select("doc_id", "text").where(F.col("doc_id") % 17 != 0)
    eval_set = docs.select("doc_id", "text").where(F.col("doc_id") % 17 == 0)
    base = curation_pipeline(corpus, eval_set).toPandas()
    wide = curation_pipeline(
        corpus,
        eval_set,
        strip_spans=True,
        embeddings=emb,
        semantic_threshold=0.35,
        semantic_centroid_mod=11,
    ).toPandas()
    # the semantic stage only removes docs; the span stage only removes
    # tokens — so the widened run is a subset of ids with <= token counts
    assert set(wide.doc_id) <= set(base.doc_id)
    merged = wide.set_index("doc_id").join(
        base.set_index("doc_id"), rsuffix="_base", how="inner"
    )
    assert (merged.n_tokens <= merged.n_tokens_base).all()
    assert len(wide) > 0
