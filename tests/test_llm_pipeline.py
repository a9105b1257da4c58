"""Tests for the LLM-data-pipeline operators (text analysis, dedup,
similarity search, multimodal) against the driver's documents/embeddings
tables and DuckDB cross-checks."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import pandas_expr_spark as pes
from pandas_expr_spark.functions import dedup, multimodal, similarity, text

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"
EMB = f"{SF}/embeddings.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB)


# ------------------------------------------------------------------ text
def test_token_count_matches_duckdb(docs):
    got = (docs.select("doc_id", text.token_count("text").alias("n_tok"))
           .orderBy("doc_id").toPandas())
    exp = duckdb.sql(
        f"select doc_id, len(regexp_split_to_array(trim(text), '\\s+')) n_tok "
        f"from '{DOCS}' order by doc_id").df()
    assert got["n_tok"].tolist() == exp["n_tok"].tolist()


def test_fingerprint_matches_duckdb(docs):
    got = (docs.select("doc_id", text.fingerprint("text").alias("fp"))
           .orderBy("doc_id").toPandas())
    exp = duckdb.sql(
        f"select doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) fp "
        f"from '{DOCS}' order by doc_id").df()
    assert got["fp"].tolist() == exp["fp"].tolist()


def test_quality_score_range_and_determinism(docs):
    pdf = docs.select(text.quality_score("text").alias("q")).toPandas()
    assert ((pdf["q"] >= 0) & (pdf["q"] <= 1)).all()
    pdf2 = docs.select(text.quality_score("text").alias("q")).toPandas()
    assert pdf["q"].tolist() == pdf2["q"].tolist()


def test_lang_id_markers(spark):
    pdf = pd.DataFrame({"text": [
        "the cat and the dog of the house",
        "el gato y la casa de que",
        "der hund und die katze ist das",
        "le chat et les chiens des la",
        "xyzzy plugh",
    ]})
    sdf = spark.createDataFrame(pdf)
    got = sdf.select(text.lang_id("text").alias("lang")).toPandas()["lang"].tolist()
    assert got == ["en", "es", "de", "fr", "unk"]


def test_word_shingles(spark):
    sdf = spark.createDataFrame(pd.DataFrame({"text": ["a b c d"]}))
    got = sdf.select(text.word_shingles("text", 2).alias("s")).collect()[0][0]
    assert sorted(got) == ["a b", "b c", "c d"]


def test_ratios(spark):
    sdf = spark.createDataFrame(pd.DataFrame({"text": ["ab, cd! 12"]}))
    row = sdf.select(
        text.punct_ratio("text").alias("p"),
        text.digit_ratio("text").alias("d"),
        text.stopword_ratio("text").alias("s"),
    ).collect()[0]
    assert row["p"] == pytest.approx(2 / 10)
    assert row["d"] == pytest.approx(2 / 10)
    assert row["s"] == 0.0


def test_bpe_ish_token_count(spark):
    sdf = spark.createDataFrame(pd.DataFrame({"text": ["hello world, 123"]}))
    n = sdf.select(text.bpe_ish_token_count("text").alias("n")).collect()[0]["n"]
    # ceil(10/4)=3 word units + 3 digits + 1 punct
    assert n == 7


# ------------------------------------------------------------------ dedup
@pytest.fixture(scope="module")
def docs_with_dups(spark, docs):
    # append exact + near duplicates with known ids
    rows = docs.limit(3).collect()
    extra = [
        (10_000, rows[0]["text"], "en", "dup", len(rows[0]["text"])),          # exact dup of doc 0
        (10_001, rows[1]["text"] + " extra token tail", "en", "dup",
         len(rows[1]["text"]) + 17),                                            # near dup of doc 1
    ]
    extra_df = spark.createDataFrame(extra, docs.schema)
    return docs.unionByName(extra_df)


def test_exact_dedup(docs_with_dups, docs):
    n_before = docs_with_dups.count()
    groups = dedup.exact_dup_groups(docs_with_dups).collect()
    assert len(groups) == 1
    assert groups[0]["n_dups"] == 2 and groups[0]["keep_id"] == 0
    after = dedup.exact_dedup(docs_with_dups)
    assert after.count() == n_before - 1
    assert after.filter(F.col("doc_id") == 10_000).count() == 0


def test_minhash_lsh_finds_near_dup(docs_with_dups):
    pairs = dedup.minhash_lsh_pairs(docs_with_dups, num_perm=32, bands=16).toPandas()
    pairset = set(map(tuple, pairs[["id_a", "id_b"]].values))
    assert (0, 10_000) in pairset  # exact dup always collides
    assert (1, 10_001) in pairset  # near dup should collide in some band


def test_edit_distance_pairs(docs_with_dups):
    pairs = dedup.edit_distance_pairs(
        docs_with_dups, max_dist=20, num_perm=64, bands=16).toPandas()
    got = {(r.id_a, r.id_b): r.edit_dist for r in pairs.itertuples()}
    assert got[(0, 10_000)] == 0          # exact copy
    assert got[(1, 10_001)] == 17         # " extra token tail" = 17 chars
    # every surviving pair is genuinely within the threshold
    assert (pairs["edit_dist"] <= 20).all() and (pairs["edit_dist"] >= 0).all()


def test_edit_distance_pairs_threshold_prunes(docs_with_dups):
    # with a tight threshold the 17-edit near dup must be dropped but the
    # exact copy kept — proves the verify (not just the LSH) gates output
    pairs = dedup.edit_distance_pairs(
        docs_with_dups, max_dist=5, num_perm=64, bands=16).toPandas()
    pairset = set(map(tuple, pairs[["id_a", "id_b"]].values))
    assert (0, 10_000) in pairset
    assert (1, 10_001) not in pairset


def test_minhash_lsh_dedup(docs_with_dups):
    before = docs_with_dups.count()
    after = dedup.minhash_lsh_dedup(docs_with_dups, num_perm=32, bands=16,
                                    jaccard_threshold=0.5)
    remaining = set(r["doc_id"] for r in after.select("doc_id").collect())
    assert 10_000 not in remaining and 10_001 not in remaining
    assert 0 in remaining and 1 in remaining
    assert after.count() <= before - 2


def test_ngram_jaccard_pairs(docs_with_dups):
    pairs = dedup.ngram_jaccard_pairs(docs_with_dups, threshold=0.5).toPandas()
    pairset = set(map(tuple, pairs[["id_a", "id_b"]].values))
    assert (0, 10_000) in pairset
    assert (1, 10_001) in pairset
    exact = pairs[(pairs.id_a == 0) & (pairs.id_b == 10_000)]["jaccard"].iloc[0]
    assert exact == pytest.approx(1.0)


def test_simhash_pairs(docs_with_dups):
    pairs = dedup.simhash_pairs(docs_with_dups, max_hamming=6).toPandas()
    pairset = set(map(tuple, pairs[["id_a", "id_b"]].values))
    assert (0, 10_000) in pairset  # identical text → hamming 0
    h = pairs[(pairs.id_a == 0) & (pairs.id_b == 10_000)]["hamming"].iloc[0]
    assert h == 0


def test_embedding_near_dup(spark, emb):
    # add an exact copy of vec 0 with id 9999
    r0 = emb.filter(F.col("vec_id") == 0).collect()[0]
    dup = spark.createDataFrame([(9999, r0["embedding"], r0["label"])], emb.schema)
    both = emb.unionByName(dup)
    pairs = dedup.embedding_near_dup_pairs(both, cosine_threshold=0.999).toPandas()
    assert (0, 9999) in set(map(tuple, pairs[["id_a", "id_b"]].values))


# -------------------------------------------------------------- similarity
def test_cosine_topk_vs_numpy(emb):
    pdf = emb.toPandas()
    mat = np.array(pdf["embedding"].tolist(), dtype=float)
    q = mat[0]
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((pdf["vec_id"].values, -cos))
    exp_ids = pdf["vec_id"].values[order][:10].tolist()
    got = similarity.cosine_topk(emb, q.tolist(), k=10).toPandas()
    assert got["vec_id"].tolist() == exp_ids
    assert got["cosine"].iloc[0] == pytest.approx(1.0)


def test_cosine_topk_plan_has_no_shuffle(emb):
    out = similarity.cosine_topk(emb, [0.1] * 64, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan


def test_lsh_topk_recall(emb):
    pdf = emb.toPandas()
    mat = np.array(pdf["embedding"].tolist(), dtype=float)
    q = mat[7]
    got = similarity.lsh_topk(emb, q.tolist(), k=5, num_planes=6, multiprobe=1)
    ids = got.toPandas()["vec_id"].tolist()
    assert 7 in ids  # the vector itself must be found
    assert len(ids) == 5


def test_ivf_topk(emb):
    pdf = emb.toPandas()
    q = np.array(pdf["embedding"].iloc[3], dtype=float)
    got = similarity.ivf_topk(emb, q.tolist(), k=5, n_cells=8, nprobe=3)
    ids = got.toPandas()["vec_id"].tolist()
    assert 3 in ids


# -------------------------------------------------------------- multimodal
@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, bytes([0xFF, 0xD8, 0xFF, 0xE0]) + bytes(range(256)) * (i + 1))
            for i in range(8)]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_attach_media_meta(media):
    out = multimodal.attach_media_meta(media).toPandas()
    assert (out["media_format"] == "jpeg").all()
    assert out["media_n_bytes"].tolist() == [4 + 256 * (i + 1) for i in range(8)]


def test_decode_image_features(media):
    out = multimodal.decode_image_features(media).toPandas()
    assert len(out) == 8
    assert all(len(f) == multimodal.IMAGE_FEATURE_DIM for f in out["features"])
    # deterministic
    out2 = multimodal.decode_image_features(media).toPandas()
    assert out["features"].apply(tuple).tolist() == out2["features"].apply(tuple).tolist()


def test_decode_raise_stub(media):
    out = multimodal.decode_image_features(media, decode_stub="raise")
    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        out.collect()


def test_resize_and_frames_and_audio(media):
    r = multimodal.resize_images(media, 8, 8).toPandas()
    assert all(len(b) == 64 for b in r["resized"])
    fr = multimodal.sample_video_frames(media, every_n=2).toPandas()
    assert fr.groupby("media_id").size().min() >= 1
    au = multimodal.audio_features(media).toPandas()
    assert (au["duration_s"] > 0).all()


def test_embedding_banded_lsh_recall_vs_brute_force(emb):
    """Banded OR-amplified LSH must recover every pair the exact
    crossJoin baseline finds at a high threshold (recall gate for the
    path that runs at scale)."""
    # plant deterministic near-dups: perturb direction slightly
    pert = emb.select(
        (F.col("vec_id") + 5000).alias("vec_id"),
        F.expr("transform(embedding, (x, i) -> x * (1.0d + 0.05d * "
               "sin(cast(i + 1 + vec_id as double))))").alias("embedding"))
    aug = emb.select("vec_id", "embedding").unionByName(pert)
    exact = similarity.brute_force_pairs(aug, cosine_threshold=0.99)
    exact_pairs = set(map(tuple, exact.toPandas()[["id_a", "id_b"]].values))
    got = dedup.embedding_near_dup_pairs(aug, cosine_threshold=0.99,
                                         num_planes=8, bands=4)
    got_pairs = set(map(tuple, got.toPandas()[["id_a", "id_b"]].values))
    assert exact_pairs, "baseline should find the planted pairs"
    assert got_pairs == exact_pairs  # recall 1.0 AND no false survivors


def test_chunk_udtf_matches_jvm_expr(spark):
    """The Python UDTF (API surface) and the JVM chunk_expr (hot path)
    must produce identical chunk rows."""
    from pandas_expr_spark.functions import udtf as u
    from pandas_expr_spark.sources.tables import load_table
    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 40)
    a = (u.chunk_documents(docs, use_udtf=True).toPandas()
         .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
    b = (u.chunk_documents(docs, use_udtf=False).toPandas()
         .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert (a["n_chunk_tokens"] <= 50).all() and (a["n_chunk_tokens"] > 0).all()


def test_repetition_ratio(spark):
    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "text": [
        "a b c a b c a b c",          # heavy trigram repetition
        "one two three four five six", # no repetition
        "x y",                         # shorter than n
    ]})
    sdf = spark.createDataFrame(pdf)
    out = (sdf.select("doc_id", text.repetition_ratio("text", n=3).alias("r"))
           .toPandas().set_index("doc_id")["r"])
    # doc 1: 7 trigrams, 3 distinct -> 1 - 3/7
    assert out[1] == pytest.approx(1 - 3 / 7)
    assert out[2] == 0.0
    assert out[3] == 0.0


def test_lsh_topk_multiprobe_widens(emb):
    """multiprobe=k probes all buckets within Hamming k — candidate sets
    (and thus recall) must be monotonically non-decreasing in k."""
    pdf = emb.toPandas()
    q = list(map(float, pdf["embedding"].iloc[2]))
    import numpy as np
    mat = np.array(pdf["embedding"].tolist(), dtype=float)
    cos = (mat @ np.array(q)) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    exact = set(pdf["vec_id"].values[np.argsort(-cos)[:10]].tolist())
    last = -1.0
    for mp in (0, 1, 3):
        ann = set(similarity.lsh_topk(emb, q, k=10, num_planes=6,
                                      multiprobe=mp).toPandas()["vec_id"])
        rec = len(ann & exact) / 10
        assert rec >= last
        last = rec
    assert last >= 0.5  # Hamming-3 of 6 planes probes most buckets


def test_image_and_wav_header_parsing(spark):
    """REAL header decoding (no codec libs): constructed valid PNG/GIF/BMP/
    WAV payloads must yield their true dimensions / audio params through
    the Arrow-batched parser."""
    import struct
    png = (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR"
           + struct.pack(">II", 640, 480) + b"\x08\x06" + b"\x00" * 30)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 20
    bmp = (b"BM" + b"\x00" * 16 + struct.pack("<ii", 800, -600)
           + b"\x00" * 20)
    rate, ch, secs = 16000, 1, 2.0
    n_data = int(rate * ch * 2 * secs)
    wav = (b"RIFF" + struct.pack("<I", 36 + n_data) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16)
           + struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
           + b"data" + struct.pack("<I", n_data) + b"\x00" * 8)
    pdf = pd.DataFrame({"media_id": [1, 2, 3, 4],
                        "payload": [png, gif, bmp, wav]})
    sdf = spark.createDataFrame(pdf)
    img = multimodal.image_header_meta(sdf).toPandas().set_index("media_id")
    assert (img.loc[1, "img_format"], img.loc[1, "img_width"],
            img.loc[1, "img_height"]) == ("png", 640, 480)
    assert (img.loc[2, "img_format"], img.loc[2, "img_width"],
            img.loc[2, "img_height"]) == ("gif", 320, 200)
    assert (img.loc[3, "img_format"], img.loc[3, "img_width"],
            img.loc[3, "img_height"]) == ("bmp", 800, 600)
    assert img.loc[4, "img_format"] is None
    au = multimodal.wav_header_meta(sdf).toPandas().set_index("media_id")
    assert au.loc[4, "sample_rate"] == rate
    assert au.loc[4, "channels"] == ch
    assert au.loc[4, "duration_s"] == pytest.approx(secs)
    assert au.loc[1, "sample_rate"] == 0


def test_pii_count_and_redact(spark):
    from pandas_expr_spark.functions import text as tx
    from pyspark.sql import functions as F
    rows = [
        (1, "mail me at jo.smith+x@sub.example.co today"),
        (2, "server 192.168.0.1 and ssn 123-45-6789"),
        (3, "call 555-867-5309 or 555.123.4567"),
        (4, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "id: long, t: string")
    got = (df.select("id",
                     tx.pii_count("t", "email").alias("e"),
                     tx.pii_count("t", "ipv4").alias("i"),
                     tx.pii_count("t", "ssn").alias("s"),
                     tx.pii_count("t", "phone").alias("p"),
                     tx.redact_pii("t").alias("r"))
           .orderBy("id").collect())
    assert [(r.e, r.i, r.s, r.p) for r in got] == [
        (1, 0, 0, 0), (0, 1, 1, 0), (0, 0, 0, 2), (0, 0, 0, 0)]
    assert got[0].r == "mail me at [PII] today"
    assert got[1].r == "server [PII] and ssn [PII]"
    assert got[2].r == "call [PII] or [PII]"
    assert got[3].r == "nothing sensitive here"


def test_decontaminate_flags_and_broadcast(spark):
    from pandas_expr_spark.functions.dedup import decontaminate
    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta"),       # shares 'alpha beta gamma'
         (2, "zeta eta theta iota"),          # clean
         (3, "x y alpha beta gamma z")],      # shares via middle
        "doc_id: long, text: string")
    ev = spark.createDataFrame([(99, "alpha beta gamma epsilon")],
                               "doc_id: long, text: string")
    out = decontaminate(train, ev, n=3)
    got = {r.doc_id: (r.n_shared_ngrams, r.contaminated) for r in out.collect()}
    assert got[1][1] and got[3][1] and not got[2][1]
    assert got[2][0] == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_minhash_sql_column_parity(spark):
    """The SQL-string signature (fast plan build) must equal the Column
    HOF twin exactly — including short/empty docs (null signature)."""
    from pandas_expr_spark.functions import dedup
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, ""), (3, "one"), (4, "a b"), (5, "x y z w v u t s")],
        "id: long, text: string")
    for perms, n in [(16, 3), (8, 2), (4, 1)]:
        a = {r.id: r.s for r in df.select(
            "id", dedup.minhash_signature("text", perms, n).alias("s")).collect()}
        b = {r.id: r.s for r in df.select(
            "id", dedup.minhash_signature(F.col("text"), perms, n).alias("s")).collect()}
        assert a == b, (perms, n)


def test_kmeans_recovers_planted_clusters(spark):
    from pandas_expr_spark.functions.clustering import kmeans_assign
    from pyspark.sql import functions as F
    # 5 well-separated axis clusters in 16-d, 40 vectors each
    df = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.expr("transform(sequence(0, 15), j -> CAST(CASE WHEN j = id % 5 "
               "THEN 8.0 ELSE 0.0 END + 0.05 * sin(CAST(id * 16 + j AS DOUBLE)) "
               "AS DOUBLE))").alias("embedding"))
    out = kmeans_assign(df, k=5, max_iter=6)
    rows = out.select("vec_id", "cluster").collect()
    # every planted group maps to exactly one kmeans label and vice versa
    by_truth = {}
    for r in rows:
        by_truth.setdefault(r.vec_id % 5, set()).add(r.cluster)
    assert all(len(v) == 1 for v in by_truth.values()), by_truth
    assert len({next(iter(v)) for v in by_truth.values()}) == 5
    # deterministic across runs
    rows2 = kmeans_assign(df, k=5, max_iter=6).select("vec_id", "cluster").collect()
    assert {(r.vec_id, r.cluster) for r in rows} == {(r.vec_id, r.cluster) for r in rows2}


def test_dedup_against_incremental(spark):
    """Batch-vs-corpus dedup: exact copy and near copy flagged with the
    right canonical corpus id; genuinely new doc untouched."""
    from pandas_expr_spark.functions.dedup import dedup_against
    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep dark forest tonight")
    corpus = spark.createDataFrame(
        [(10, base),
         (11, "completely different corpus material about spark engines "
              "and distributed query planning at scale")],
        "doc_id: long, text: string")
    batch = spark.createDataFrame(
        [(100, base),                      # exact copy of 10
         (101, base + " extra token"),     # near copy of 10
         (102, "fresh unseen content qq1 qq2 qq3 qq4 qq5 qq6 qq7")],
        "doc_id: long, text: string")
    out = dedup_against(corpus, batch, num_perm=64, bands=16,
                        jaccard_threshold=0.8)
    got = {r.batch_id: (r.is_dup, r.dup_of) for r in out.collect()}
    assert got[100] == (True, 10)
    assert got[101] == (True, 10)
    assert got[102] == (False, None)


def test_write_training_shards_manifest(spark, tmp_path):
    from pandas_expr_spark.functions import packing
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "shards")
    manifest = packing.write_training_shards(docs, path, budget=256,
                                             n_buckets=4)
    rows = manifest.collect()
    assert {r["bucket"] for r in rows} <= set(range(4))
    # every doc accounted for exactly once
    assert sum(r["n_docs"] for r in rows) == docs.count()
    # shard read-back partition-prunes by bucket
    back = spark.read.parquet(path).filter("bucket = 1")
    assert back.count() == sum(r["n_docs"] for r in rows if r["bucket"] == 1)
    # token totals consistent
    import pyspark.sql.functions as F
    total = spark.read.parquet(path).agg(F.sum("n_tokens")).first()[0]
    assert total == sum(r["n_tokens"] for r in rows)


def test_line_dedup_removes_boilerplate_preserving_order(spark):
    from pandas_expr_spark.functions import text
    boiler = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [(1, f"unique alpha one\n{boiler}\nunique alpha two"),
         (2, f"{boiler}\nunique beta"),
         (3, f"{boiler}"),                      # all-boilerplate doc
         (4, "no shared lines here\nat all")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           text.line_dedup(docs, min_dup_docs=2).collect()}
    assert out[1]["n_seg"] == 3 and out[1]["n_kept"] == 2
    assert out[1]["kept_text"] == "unique alpha one\nunique alpha two"
    assert out[2]["kept_text"] == "unique beta"
    # a doc whose every line is boilerplate still gets a row
    assert out[3]["n_kept"] == 0 and out[3]["kept_text"] == ""
    assert out[4]["n_kept"] == 2 and "\n" in out[4]["kept_text"]


def test_line_dedup_min_len_keeps_short_lines(spark):
    from pandas_expr_spark.functions import text
    docs = spark.createDataFrame(
        [(1, "ok\nlong shared boilerplate line"),
         (2, "ok\nlong shared boilerplate line"),
         (3, "ok\nfresh")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           text.line_dedup(docs, min_dup_docs=2, min_len=5).collect()}
    # "ok" (<5 chars) survives everywhere despite appearing in 3 docs
    assert out[3]["kept_text"] == "ok\nfresh"
    assert out[1]["kept_text"] == "ok"


def test_duplicate_window_stats_flags_planted_substring(spark):
    from pandas_expr_spark.functions import dedup
    shared = "x" * 45                      # > one full 40-char window
    docs = spark.createDataFrame(
        [(1, "A" * 30 + shared + "B" * 30),
         (2, "C" * 10 + shared + "D" * 55),
         (3, "totally different and long enough " * 3),
         (4, "short")],                    # shorter than the window
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           dedup.duplicate_window_stats(docs, window=40, stride=5,
                                        min_docs=2).collect()}
    assert out[1]["n_dup"] > 0 and out[2]["n_dup"] > 0
    assert out[3]["n_dup"] == 0
    assert out[4]["n_win"] == 0 and out[4]["dup_frac"] == 0.0
    assert 0.0 < out[1]["dup_frac"] <= 1.0
