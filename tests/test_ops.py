"""Tests for the training-data-pipeline operators (ops/)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ultragendataset_datachecker_spark.ops import dedup, similarity, textstats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def docs_pdf(docs):
    return docs.toPandas()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_pdf(emb):
    return emb.toPandas()


# ---------------------------------------------------------------- exact dedup

def test_exact_duplicates_matches_pandas(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    got = dedup.exact_duplicates(e, ["user_id", "event_type"], "event_id",
                                 order_cols=["ts", "event_id"])
    pdf = e.toPandas().sort_values(["ts", "event_id"])
    exp_dups = int(pdf.duplicated(subset=["user_id", "event_type"], keep="first").sum())
    assert got.count() == exp_dups


def test_dedup_keep_first_deterministic(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    kept = dedup.dedup_keep_first(e, ["user_id", "event_type"], ["ts", "event_id"])
    pdf = e.toPandas().sort_values(["ts", "event_id"])
    exp = pdf.drop_duplicates(subset=["user_id", "event_type"], keep="first")
    assert sorted(r["event_id"] for r in kept.select("event_id").collect()) == sorted(exp.event_id)


# ---------------------------------------------------------------- jaccard family

@pytest.fixture(scope="module")
def exact_pairs(docs):
    return {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_duplicates(docs, "doc_id", "text", 2, 0.3).collect()
    }


def test_ngram_jaccard_against_python(docs_pdf, exact_pairs):
    def grams(t):
        w = " ".join(t.split()).split(" ")
        return set(" ".join(w[i:i + 2]) for i in range(len(w) - 1))

    g = {r.doc_id: grams(r.text) for r in docs_pdf.itertuples()}
    exp = {}
    ids = sorted(g)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(g[a] & g[b])
            if inter == 0:
                continue
            j = inter / len(g[a] | g[b])
            if j >= 0.3:
                exp[(a, b)] = j
    assert set(exact_pairs) == set(exp)
    for k in exp:
        assert exact_pairs[k] == pytest.approx(exp[k], rel=1e-12)


def test_minhash_finds_high_jaccard_pairs(docs, exact_pairs):
    found = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_duplicates(
            docs, "doc_id", "text", shingle_n=2, num_hashes=32, bands=16,
            jaccard_threshold=0.3,
        ).collect()
    }
    # verification step makes every reported pair exact → subset of truth
    assert found <= set(exact_pairs)
    # recall: pairs with j >= 0.7 are found w.p. 1-(1-j^2)^16 > 0.999
    strong = {k for k, j in exact_pairs.items() if j >= 0.7}
    assert strong <= found


def test_simhash_pairs_plausible(docs):
    pairs = dedup.simhash_duplicates(docs, "doc_id", "text", shingle_n=2, max_hamming=10).collect()
    assert all(r["id_a"] < r["id_b"] and r["hamming"] <= 10 for r in pairs)
    assert len(pairs) > 0  # the planted near-dups collide within 10 bits


def test_simhash_identical_text_distance_zero(spark, docs):
    dup = docs.limit(3).union(docs.limit(3))
    # identical texts → identical simhash → hamming 0 pairs exist
    pairs = dedup.simhash_duplicates(
        dup.withColumn("doc_id", F.monotonically_increasing_id()),
        "doc_id", "text", shingle_n=2, max_hamming=0,
    )
    assert pairs.count() >= 3


# ---------------------------------------------------------------- similarity

def _np_topk(emb_pdf, qids, k):
    m = np.stack(emb_pdf.embedding.to_numpy()).astype("float64")
    ids = emb_pdf.vec_id.to_numpy()
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    out = {}
    for q in qids:
        qv = mn[ids == q][0]
        sims = mn @ qv
        order = sorted(
            [(float(s), int(i)) for s, i in zip(sims, ids) if i != q],
            key=lambda t: (-t[0], t[1]),
        )
        out[q] = [(i, s) for s, i in order[:k]]
    return out


def test_brute_force_topk_matches_numpy(emb, emb_pdf):
    qids = [0, 1, 2]
    got = similarity.brute_force_topk(emb, emb.where(F.col("vec_id") < 3), k=5)
    exp = _np_topk(emb_pdf, qids, 5)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["cosine"]))
    for q in qids:
        rows = sorted(by_q[q])
        assert [n for _, n, _ in rows] == [i for i, _ in exp[q]]
        for (_, _, c), (_, s) in zip(rows, exp[q]):
            assert c == pytest.approx(s, rel=1e-9)


def test_lsh_topk_returns_true_cosines(emb, emb_pdf):
    got = similarity.lsh_topk(emb, emb.where(F.col("vec_id") < 3), k=5, n_planes=4)
    m = {int(r.vec_id): np.asarray(r.embedding, dtype="float64") for r in emb_pdf.itertuples()}
    for r in got.collect():
        a, b = m[r["query_id"]], m[r["neighbor_id"]]
        c = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert r["cosine"] == pytest.approx(c, rel=1e-9)


def test_pandas_topk_matches_expression_topk(emb, emb_pdf):
    q = emb_pdf[emb_pdf.vec_id < 3]
    got = similarity.brute_force_topk_pandas(emb, q, k=5)
    exp = _np_topk(emb_pdf, [0, 1, 2], 5)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    for qid in exp:
        assert [n for _, n in sorted(by_q[qid])] == [i for i, _ in exp[qid]]


# ---------------------------------------------------------------- textstats

def test_token_count_matches_python(docs, docs_pdf):
    got = {r["doc_id"]: r["n"] for r in docs.select("doc_id", textstats.token_count(F.col("text")).alias("n")).collect()}
    for r in docs_pdf.itertuples():
        assert got[r.doc_id] == len(r.text.split()), r.doc_id


def test_quality_score_in_unit_interval(docs):
    rows = docs.select(textstats.quality_score(F.col("text")).alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)


def test_fingerprint_whitespace_invariant(spark, docs):
    a = docs.select(textstats.fingerprint(F.col("text")).alias("f"))
    b = docs.select(textstats.fingerprint(F.concat(F.lit("  "), F.regexp_replace("text", " ", "   "))).alias("f"))
    assert [r["f"] for r in a.collect()] == [r["f"] for r in b.collect()]


def test_lang_id_und_on_stopword_free_text(spark):
    df = spark.range(1).select(F.lit("xyzzy plugh quux").alias("t"))
    assert df.select(textstats.lang_id(F.col("t"))).first()[0] == "und"


def test_text_profile_schema(docs):
    prof = textstats.text_profile(docs)
    for c in ["n_words", "n_bpe_ish", "stopword_ratio", "punct_ratio", "space_ratio",
              "quality", "lang_pred", "fp"]:
        assert c in prof.columns
    assert prof.count() == docs.count()


# ---------------------------------------------------------------- multimodal

def test_multimodal_fake_pipeline(spark, docs):
    from ultragendataset_datachecker_spark.ops import multimodal as mm

    media = docs.limit(20).select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        F.create_map(F.lit("k"), F.lit("v")).alias("meta"),
    )
    feats = mm.decode_image_batch(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(not r["corrupt"] for r in rows)  # utf-8 text never starts with \x00
    assert feats.schema.simpleString().startswith("struct<media_id:string,width:int")

    frames = mm.sample_video_frames(media, every_n=10, fake=True)
    f = frames.collect()
    assert len(f) >= 20  # 1→N fan-out
    assert all(r["frame_idx"] % 10 == 0 for r in f)

    v = mm.media_integrity_violations(feats, max_width=100, max_height=100)
    assert v.count() >= 0


def test_multimodal_real_decode_is_stubbed(spark, docs):
    from ultragendataset_datachecker_spark.ops import multimodal as mm

    media = docs.limit(2).select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        F.create_map(F.lit("k"), F.lit("v")).alias("meta"),
    )
    with pytest.raises(Exception) as ei:
        mm.decode_image_batch(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, NotImplementedError)


def test_ivf_topk_exact_cosines_and_recall(emb, emb_pdf):
    """IVF candidates carry TRUE cosines (exact verify on the pruned set);
    probing every list is exhaustive and must equal brute force exactly."""
    qids = [0, 1, 2]
    got = similarity.ivf_topk(
        emb, emb.where(F.col("vec_id") < 3), k=5, n_centroids=8, nprobe=2,
        train_size=512,
    )
    m = {int(r.vec_id): np.asarray(r.embedding, dtype="float64") for r in emb_pdf.itertuples()}
    rows = got.collect()
    assert rows
    for r in rows:
        a, b = m[r["query_id"]], m[r["neighbor_id"]]
        c = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert r["cosine"] == pytest.approx(c, rel=1e-9)

    # nprobe = n_centroids -> every inverted list probed -> exact top-k
    full = similarity.ivf_topk(
        emb, emb.where(F.col("vec_id") < 3), k=5, n_centroids=8, nprobe=8,
        train_size=512,
    )
    exp = _np_topk(emb_pdf, qids, 5)
    by_q = {}
    for r in full.collect():
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    for q in qids:
        assert [n for _, n in sorted(by_q[q])] == [i for i, _ in exp[q]]


def test_ivf_centroids_deterministic(emb):
    c1 = similarity.train_ivf_centroids(emb, n_centroids=8, train_size=256, seed=13)
    c2 = similarity.train_ivf_centroids(emb, n_centroids=8, train_size=256, seed=13)
    assert np.array_equal(c1, c2)
    assert c1.shape[0] == 8
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


# ------------------------------------------------- multimodal real decoders

def _make_pgm(w, h, value=128):
    return b"P5\n# comment\n" + f"{w} {h}\n255\n".encode() + bytes([value]) * (w * h)


def _make_ppm(w, h):
    return b"P6\n" + f"{w} {h}\n255\n".encode() + (b"\x10\x20\x30" * (w * h))


def _make_wav(sr=8000, n=1600):
    import io as _io
    import wave

    buf = _io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(b"\x00\x01" * n)
    return buf.getvalue()


def _media_df(spark, payloads, kind="image"):
    rows = [(f"m{i}", kind, p, {"k": "v"}) for i, p in enumerate(payloads)]
    return spark.createDataFrame(rows, mm_schema())


def mm_schema():
    from ultragendataset_datachecker_spark.ops.multimodal import MEDIA_SCHEMA

    return MEDIA_SCHEMA


def test_pnm_decode_real(spark):
    from ultragendataset_datachecker_spark.ops import multimodal as mm

    good = _make_pgm(10, 6)
    rgb = _make_ppm(4, 3)
    truncated = good[:-5]
    media = _media_df(spark, [good, rgb, truncated])
    feats = {r["media_id"]: r for r in mm.decode_image_batch(media).collect()}
    assert (feats["m0"]["width"], feats["m0"]["height"], feats["m0"]["n_channels"]) == (10, 6, 1)
    assert feats["m0"]["format"] == "pgm" and not feats["m0"]["corrupt"]
    assert (feats["m1"]["width"], feats["m1"]["n_channels"], feats["m1"]["format"]) == (4, 3, "ppm")
    assert feats["m2"]["corrupt"]  # truncated raster detected


def test_pnm_resize_real(spark):
    from ultragendataset_datachecker_spark.ops import multimodal as mm

    media = _media_df(spark, [_make_pgm(10, 6, value=77)])
    resized = mm.resize_images(media, width=5, height=3)
    feats = mm.decode_image_batch(resized).collect()[0]
    assert (feats["width"], feats["height"]) == (5, 3) and not feats["corrupt"]
    px = mm.pnm_pixels(bytes(resized.collect()[0]["content"]))
    assert px.shape == (3, 5) and (px == 77).all()  # constant image stays constant


def test_pnm_resize_16bit_scales_instead_of_wrapping(spark):
    """maxval>255 rasters are valid PNM (decode flags them non-corrupt), so
    resize must not wrap their pixels mod 256 on re-encode: values scale
    exactly by 255/maxval into the 8-bit output range."""
    import numpy as np

    from ultragendataset_datachecker_spark.ops import multimodal as mm

    w, h, maxval, value = 8, 4, 65535, 40000  # 40000 % 256 == 64: wrap would be bright-ish but wrong
    raster = np.full(w * h, value, dtype=">u2").tobytes()
    payload = b"P5\n" + f"{w} {h}\n{maxval}\n".encode() + raster
    assert mm.decode_pnm(payload) == (w, h, 1, "pgm", False)

    media = _media_df(spark, [payload])
    resized = mm.resize_images(media, width=4, height=2)
    content = bytes(resized.collect()[0]["content"])
    feats = mm.decode_image_batch(_media_df(spark, [content])).collect()[0]
    assert (feats["width"], feats["height"]) == (4, 2) and not feats["corrupt"]
    px = mm.pnm_pixels(content)
    expected = value * 255 // maxval  # == 155
    assert (px == expected).all(), (px[0, 0], expected)


def test_wav_decode_real(spark):
    from ultragendataset_datachecker_spark.ops import multimodal as mm

    wav = _make_wav(sr=8000, n=1600)
    media = _media_df(spark, [wav, b"not audio at all"], kind="audio")
    feats = {r["media_id"]: r for r in mm.decode_audio_batch(media).collect()}
    assert feats["m0"]["sample_rate"] == 8000
    assert feats["m0"]["n_samples"] == 1600
    assert feats["m0"]["duration_sec"] == pytest.approx(0.2)
    assert not feats["m0"]["corrupt"]
    assert feats["m1"]["corrupt"]  # unparseable -> flagged, not failed


def test_ivf_topk_parallelism_invariant(emb):
    """Same IVF results at any input partitioning: the quantizer trains on a
    hash-ordered (partitioning-independent) sample and assignment/verify are
    per-row deterministic."""
    q = emb.where(F.col("vec_id") < 3)
    a = similarity.ivf_topk(emb, q, k=5, n_centroids=8, nprobe=3, train_size=256)
    b = similarity.ivf_topk(emb.repartition(7), q.repartition(2), k=5,
                            n_centroids=8, nprobe=3, train_size=256)
    ra = sorted((r["query_id"], r["rank"], r["neighbor_id"], round(r["cosine"], 12))
                for r in a.collect())
    rb = sorted((r["query_id"], r["rank"], r["neighbor_id"], round(r["cosine"], 12))
                for r in b.collect())
    assert ra == rb


# ------------------------------------------------------- embedding drift


def test_group_centroid_drift_matches_numpy(emb, emb_pdf):
    from ultragendataset_datachecker_spark.ops.similarity import group_centroid_drift

    got = {r["label"]: r for r in group_centroid_drift(emb, "embedding", "label").collect()}

    pdf = emb_pdf.dropna(subset=["label", "embedding"])
    mats = {lab: np.stack(sub["embedding"].to_numpy()).astype("float64")
            for lab, sub in pdf.groupby("label")}
    pooled = np.concatenate(list(mats.values())).mean(axis=0)
    assert set(got) == set(mats)
    for lab, m in mats.items():
        cg = m.mean(axis=0)
        exp_cos = float(cg @ pooled / (np.linalg.norm(cg) * np.linalg.norm(pooled)))
        exp_l2 = float(np.linalg.norm(cg - pooled))
        r = got[lab]
        assert r["n"] == len(m)
        assert r["cosine"] == pytest.approx(exp_cos, rel=1e-9)
        assert r["l2"] == pytest.approx(exp_l2, rel=1e-9)


def test_group_centroid_drift_partitioning_invariant(emb):
    from ultragendataset_datachecker_spark.ops.similarity import group_centroid_drift

    a = group_centroid_drift(emb.repartition(1), "embedding", "label")
    b = group_centroid_drift(emb.repartition(13), "embedding", "label")
    ra = {r["label"]: (r["n"], round(r["cosine"], 9), round(r["l2"], 9)) for r in a.collect()}
    rb = {r["label"]: (r["n"], round(r["cosine"], 9), round(r["l2"], 9)) for r in b.collect()}
    assert ra == rb


def test_group_centroid_drift_flags_shifted_group(spark, emb):
    """Plant drift: shift one label's vectors by a constant offset — its
    centroid-vs-pooled cosine must drop well below every other label's."""
    from pyspark.sql import functions as F
    from ultragendataset_datachecker_spark.ops.similarity import group_centroid_drift

    shifted = emb.withColumn(
        "embedding",
        F.when(F.col("label") == 3,
               F.transform("embedding", lambda x: x + F.lit(2.0)))
        .otherwise(F.col("embedding")),
    )
    rows = {r["label"]: r["l2"] for r in
            group_centroid_drift(shifted, "embedding", "label").collect()}
    others_max = max(v for k, v in rows.items() if k != 3)
    assert rows[3] > 3.0 * others_max


# ------------------------------------------------------- generic profiler


def test_profile_table_one_pass_all_types(spark):
    """profile_table over a mixed schema: numeric stats only for numerics,
    complex types profile nulls only, exact pandas cross-check."""
    import pandas as pd
    from ultragendataset_datachecker_spark.ops.profile import profile_table

    pdf = pd.DataFrame({
        "id": [1, 2, 3, 4, None],
        "name": ["a", "b", "b", None, "c"],
        "score": [1.5, 2.5, None, 4.0, 4.0],
    })
    df = spark.createDataFrame(pdf, schema="id long, name string, score double")
    df = df.withColumn("tags", F.array(F.lit("x"), F.col("name")))

    rows = {r["column"]: r for r in profile_table(df).collect()}
    assert set(rows) == {"id", "name", "score", "tags"}

    rid = rows["id"]
    assert (rid["n_rows"], rid["n_null"], rid["n_distinct"]) == (5, 1, 4)
    assert rid["mean"] == pytest.approx(2.5)
    assert (rid["min_str"], rid["max_str"]) == ("1", "4")

    rname = rows["name"]
    assert (rname["n_null"], rname["n_distinct"]) == (1, 3)
    assert rname["mean"] is None and rname["std"] is None
    assert (rname["min_str"], rname["max_str"]) == ("a", "c")

    rscore = rows["score"]
    assert rscore["std"] == pytest.approx(pdf["score"].std(), rel=1e-6)

    rtags = rows["tags"]  # complex type: null count only
    assert rtags["n_null"] == 0
    assert rtags["n_distinct"] is None and rtags["min_str"] is None

    # column subset + approx-distinct scale path keep the same shape
    sub = profile_table(df, columns=["id"], exact_distinct=False).collect()
    assert len(sub) == 1 and sub[0]["column"] == "id"
    assert sub[0]["n_distinct"] >= 3  # HLL estimate of 4


# ---------------------------------------------------------------- PNG (real)

def _hand_png(pixels, filters, depth=8):
    """Independent PNG writer for decoder validation: applies the given
    per-row filter types (0-4) with its own arithmetic — NOT encode_png."""
    import struct
    import zlib

    import numpy as np

    from ultragendataset_datachecker_spark.ops.multimodal import PNG_MAGIC

    a = pixels.astype("u2" if depth == 16 else "u1")
    h, w = a.shape[0], a.shape[1]
    ch = 1 if a.ndim == 2 else a.shape[2]
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    if depth == 16:
        assert ch == 1 and all(f == 0 for f in filters)
        raw = b"".join(b"\x00" + a[y].astype(">u2").tobytes() for y in range(h))
    else:
        bpp = ch
        raster = a.reshape(h, w * ch).astype("i4")
        prev = np.zeros(w * ch, "i4")
        parts = []
        for y, f in zip(range(h), filters):
            cur = raster[y]
            left = np.concatenate([np.zeros(bpp, "i4"), cur[:-bpp]])
            upl = np.concatenate([np.zeros(bpp, "i4"), prev[:-bpp]])
            if f == 0:
                enc = cur
            elif f == 1:
                enc = (cur - left) & 0xFF
            elif f == 2:
                enc = (cur - prev) & 0xFF
            elif f == 3:
                enc = (cur - ((left + prev) >> 1)) & 0xFF
            else:  # Paeth
                p = left + prev - upl
                pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upl)
                pred = np.where((pa <= pb) & (pa <= pc), left,
                                np.where(pb <= pc, prev, upl))
                enc = (cur - pred) & 0xFF
            parts.append(bytes([f]) + enc.astype("u1").tobytes())
            prev = cur
        raw = b"".join(parts)

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_png_decode_real(spark):
    import numpy as np

    from ultragendataset_datachecker_spark.ops import multimodal as mm

    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 256, (6, 9, 3)).astype("u1")
    good = mm.encode_png(rgb)
    truncated = good[:-9]
    crc_bad = bytearray(good)
    crc_bad[len(mm.PNG_MAGIC) + 8 + 3] ^= 0x40  # flip an IHDR byte under its CRC
    media = _media_df(spark, [good, truncated, bytes(crc_bad)])
    feats = {r["media_id"]: r for r in mm.decode_image_batch(media).collect()}
    assert (feats["m0"]["width"], feats["m0"]["height"], feats["m0"]["n_channels"]) == (9, 6, 3)
    assert feats["m0"]["format"] == "png" and not feats["m0"]["corrupt"]
    assert feats["m1"]["corrupt"]  # truncation detected
    assert feats["m2"]["corrupt"]  # CRC mismatch detected


def test_png_unfilter_all_filter_types():
    import numpy as np

    from ultragendataset_datachecker_spark.ops import multimodal as mm

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (10, 7, 3)).astype("u1")
    data = _hand_png(img, filters=[0, 1, 2, 3, 4, 4, 3, 2, 1, 0])
    assert mm.decode_png(data) == (7, 10, 3, "png", False)
    assert (mm.png_pixels(data) == img).all()
    gray = rng.randint(0, 256, (5, 8)).astype("u1")
    gdata = _hand_png(gray, filters=[4, 3, 2, 1, 0])
    assert (mm.png_pixels(gdata) == gray).all()


def test_png_16bit_and_palette_structure():
    import struct
    import zlib

    import numpy as np

    from ultragendataset_datachecker_spark.ops import multimodal as mm

    vals = np.array([[0, 1000, 65535], [256, 513, 40000]], dtype="u2")
    data16 = _hand_png(vals, filters=[0, 0], depth=16)
    assert mm.decode_png(data16) == (3, 2, 1, "png", False)
    assert (mm.png_pixels(data16) == vals).all()

    # palette color type: raster is 1 byte/pixel, reported channels = 3;
    # a palette image with NO PLTE chunk is structurally corrupt
    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", 4, 2, 8, 3, 0, 0, 0)
    raw = zlib.compress(b"\x00\x00\x01\x02\x03" * 2)
    plte = bytes(range(12))
    with_plte = (mm.PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
                 + chunk(b"IDAT", raw) + chunk(b"IEND", b""))
    without = (mm.PNG_MAGIC + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", raw) + chunk(b"IEND", b""))
    assert mm.decode_png(with_plte) == (4, 2, 3, "png", False)
    assert mm.decode_png(without)[4] is True or mm.decode_png(without)[4]

    # Adam7 interlaced: raster sized by the 7-pass layout validates clean
    ihdr_i = struct.pack(">IIBBBBB", 5, 4, 8, 0, 0, 0, 1)
    n = mm._png_raster_bytes(5, 4, 1, 8, 1)
    inter = (mm.PNG_MAGIC + chunk(b"IHDR", ihdr_i)
             + chunk(b"IDAT", zlib.compress(bytes(n))) + chunk(b"IEND", b""))
    assert mm.decode_png(inter) == (5, 4, 1, "png", False)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        mm.png_pixels(inter)


def test_png_resize_real(spark):
    import numpy as np

    from ultragendataset_datachecker_spark.ops import multimodal as mm

    img = np.full((12, 8, 3), 99, dtype="u1")
    media = _media_df(spark, [mm.encode_png(img)])
    resized = mm.resize_images(media, width=4, height=6)
    content = bytes(resized.collect()[0]["content"])
    assert mm.decode_png(content) == (4, 6, 3, "png", False)
    assert (mm.png_pixels(content) == 99).all()


# ---------------------------------------------------------------- JPEG codec

def test_jpeg_roundtrip_pure():
    """Encoder→decoder roundtrip within quantization error; structure checks
    (truncation, non-JPEG) behave like the PIL-verify semantics the
    reference relies on (dataset_checker.py:26-62)."""
    import numpy as np

    from ultragendataset_datachecker_spark.ops import jpegcodec as jc

    rng = np.random.RandomState(7)
    h, w = 37, 53  # non-multiple-of-8 dims exercise edge padding + crop
    yy, xx = np.mgrid[0:h, 0:w]
    gray = np.clip(80 + yy * 2 + xx * 1.5 + rng.normal(0, 3, (h, w)), 0, 255).astype("u1")
    rgb = np.stack([gray, np.clip(gray.astype(int) + 30, 0, 255), 255 - gray], axis=-1).astype("u1")

    for img in (gray, rgb):
        data = jc.encode_jpeg(img, quality=90)
        assert jc.jpeg_dims(data) == (w, h, 1 if img.ndim == 2 else 3, "jpeg", False)
        dec = jc.decode_jpeg(data)
        assert dec.shape == img.shape
        err = np.abs(dec.astype(float) - img.astype(float))
        assert err.mean() < 5.0  # quantization noise only

    # constant image survives q95 essentially losslessly
    const = np.full((16, 24, 3), 130, "u1")
    assert np.abs(jc.decode_jpeg(jc.encode_jpeg(const, 95)).astype(int) - 130).max() <= 1

    data = jc.encode_jpeg(rgb, quality=75)
    trunc = data[: len(data) // 2]
    assert jc.jpeg_dims(trunc)[4] is True  # corruption flagged
    import pytest as _pytest
    with _pytest.raises(ValueError):
        jc.decode_jpeg(trunc)
    assert jc.jpeg_dims(b"\x89PNG not a jpeg") is None

    # a baseline stream mislabeled SOF2 carries a scan header that is
    # illegal in progressive mode (Ss=0 with Se=63): detected, not mis-decoded
    prog = bytearray(data)
    sof = prog.find(b"\xff\xc0")
    assert sof > 0
    prog[sof + 1] = 0xC2
    assert jc.jpeg_dims(bytes(prog)) == (53, 37, 3, "jpeg", False)
    with _pytest.raises(ValueError, match="invalid progressive"):
        jc.decode_jpeg(bytes(prog))
    # genuinely unsupported coding mode (lossless SOF3) still refuses
    prog[sof + 1] = 0xC3
    with _pytest.raises(ValueError, match="unsupported"):
        jc.decode_jpeg(bytes(prog))


def test_jpeg_decode_real(spark):
    import numpy as np

    from ultragendataset_datachecker_spark.ops import jpegcodec as jc
    from ultragendataset_datachecker_spark.ops import multimodal as mm

    rng = np.random.RandomState(3)
    rgb = (rng.rand(6, 9, 3) * 255).astype("u1")
    good = jc.encode_jpeg(rgb, quality=85)
    truncated = good[:-9]
    media = _media_df(spark, [good, truncated])
    feats = {r["media_id"]: r for r in mm.decode_image_batch(media).collect()}
    assert (feats["m0"]["width"], feats["m0"]["height"], feats["m0"]["n_channels"]) == (9, 6, 3)
    assert feats["m0"]["format"] == "jpeg" and not feats["m0"]["corrupt"]
    assert feats["m1"]["corrupt"]


def test_jpeg_resize_real(spark):
    import numpy as np

    from ultragendataset_datachecker_spark.ops import jpegcodec as jc
    from ultragendataset_datachecker_spark.ops import multimodal as mm

    img = np.full((12, 8, 3), 99, dtype="u1")
    media = _media_df(spark, [jc.encode_jpeg(img, quality=95)])
    resized = mm.resize_images(media, width=4, height=6)
    content = bytes(resized.collect()[0]["content"])
    assert jc.jpeg_dims(content) == (4, 6, 3, "jpeg", False)
    assert np.abs(jc.decode_jpeg(content).astype(int) - 99).max() <= 2


# ---------------------------------------------------------------- MJPEG AVI

def test_avi_roundtrip_pure():
    import numpy as np

    from ultragendataset_datachecker_spark.ops import avicodec as av
    from ultragendataset_datachecker_spark.ops import jpegcodec as jc

    frames_px = [np.full((16, 24, 3), 40 * i + 20, "u1") for i in range(5)]
    jpegs = [jc.encode_jpeg(p, 90) for p in frames_px]
    avi = av.encode_mjpeg_avi(jpegs, width=24, height=16, fps=10)
    assert av.avi_info(avi) == (24, 16, 5, 10.0, "avi", False)
    fr = av.avi_frames(avi)
    assert [i for i, _ in fr] == [0, 1, 2, 3, 4]
    dec = jc.decode_jpeg(fr[2][1])
    assert dec.shape == (16, 24, 3)
    assert abs(int(dec.mean()) - 100) <= 2
    # truncation -> structurally corrupt, not a crash
    assert av.avi_info(avi[: len(avi) // 2])[5] is True
    assert av.avi_info(b"not a riff container") is None


def test_video_sample_and_decode_real(spark):
    import numpy as np

    from ultragendataset_datachecker_spark.ops import avicodec as av
    from ultragendataset_datachecker_spark.ops import jpegcodec as jc
    from ultragendataset_datachecker_spark.ops import multimodal as mm

    jpegs = [jc.encode_jpeg(np.full((8, 8, 3), 10 * i + 5, "u1"), 90) for i in range(7)]
    avi = av.encode_mjpeg_avi(jpegs, width=8, height=8, fps=5)
    media = _media_df(spark, [avi], kind="video")
    frames = mm.sample_video_frames(media, every_n=3).collect()
    assert sorted(r["frame_idx"] for r in frames) == [0, 3, 6]
    # each sampled frame is a decodable JPEG of the declared dims
    for r in frames:
        assert jc.jpeg_dims(bytes(r["frame"])) == (8, 8, 3, "jpeg", False)

    feats = mm.decode_video_batch(media).collect()[0]
    assert (feats["width"], feats["height"], feats["n_frames"]) == (8, 8, 7)
    assert feats["format"] == "avi" and not feats["corrupt"]

    # corrupt container flagged, non-AVI raises without fake=True
    media_bad = _media_df(spark, [avi[:100]], kind="video")
    assert mm.decode_video_batch(media_bad).collect()[0]["corrupt"]


# ------------------------------------------------ BMP / GIF / TIFF codecs

def test_bmp_roundtrip_pure():
    import numpy as np

    from ultragendataset_datachecker_spark.ops import legacycodecs as lc

    rng = np.random.RandomState(0)
    rgb = (rng.rand(7, 5, 3) * 255).astype("u1")
    b = lc.encode_bmp(rgb)
    assert lc.bmp_dims(b) == (5, 7, 3, "bmp", False)
    assert (lc.bmp_pixels(b) == rgb).all()
    assert lc.bmp_dims(b[:-4])[4]  # truncated raster -> corrupt
    gray = (rng.rand(4, 6) * 255).astype("u1")
    assert (lc.bmp_pixels(lc.encode_bmp(gray))[:, :, 0] == gray).all()
    assert lc.bmp_dims(b"nope") is None


def test_gif_roundtrip_lzw_growth_pure():
    """Exact index/palette roundtrip, incl. the 12-bit code growth + table
    reset path (high-entropy raster forces >4096 LZW entries)."""
    import numpy as np

    from ultragendataset_datachecker_spark.ops import legacycodecs as lc

    rng = np.random.RandomState(1)
    idx = (rng.rand(300, 300) * 256).astype("u1")
    pal = (rng.rand(256, 3) * 255).astype("u1")
    g = lc.encode_gif(idx, pal)
    assert lc.gif_dims(g) == (300, 300, 3, "gif", False)
    assert (lc.gif_pixels(g) == pal[idx]).all()
    assert lc.gif_dims(g[:-3])[4]  # truncated -> corrupt
    assert lc.gif_dims(b"GIF limerick") is None


def test_gif_interlaced_decode_pure():
    """Hand-assembled interlaced GIF (rows in pass order, flag 0x40)
    deinterlaces back to the original raster."""
    import struct

    import numpy as np

    from ultragendataset_datachecker_spark.ops import legacycodecs as lc

    rng = np.random.RandomState(2)
    idx = (rng.rand(17, 11) * 16).astype("u1")
    pal = (rng.rand(16, 3) * 255).astype("u1")
    h, w = idx.shape
    order = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)) for r in range(start, h, step)]
    out = bytearray(b"GIF89a") + struct.pack("<HH", w, h) + bytes([0x80 | 3, 0, 0])
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([0x40, 4])
    data = lc._lzw_encode(idx[order], 4)
    for i in range(0, len(data), 255):
        c = data[i:i + 255]
        out += bytes([len(c)]) + c
    out += b"\x00\x3b"
    assert (lc.gif_pixels(bytes(out)) == pal[idx]).all()


def _mk_tiff(gray, bo, comp, payload):
    """Hand-assemble a single-strip gray TIFF in either byte order."""
    import struct

    h, w = gray.shape
    entries = [(256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 8), (259, 3, 1, comp),
               (262, 3, 1, 1), (277, 3, 1, 1), (278, 4, 1, h)]
    n = len(entries) + 2
    data_off = 8 + 2 + 12 * n + 4
    entries += [(273, 4, 1, data_off), (279, 4, 1, len(payload))]
    magic = b"II*\x00" if bo == "<" else b"MM\x00*"
    t = bytearray(magic + struct.pack(bo + "I", 8)) + struct.pack(bo + "H", n)
    for tag, typ, count, val in sorted(entries):
        t += struct.pack(bo + "HHI", tag, typ, count)
        t += struct.pack(bo + "HH", val, 0) if typ == 3 else struct.pack(bo + "I", val)
    return bytes(t + struct.pack(bo + "I", 0) + payload)


def test_tiff_roundtrip_packbits_and_byteorder_pure():
    import numpy as np

    from ultragendataset_datachecker_spark.ops import legacycodecs as lc

    rng = np.random.RandomState(3)
    rgb = (rng.rand(7, 5, 3) * 255).astype("u1")
    t = lc.encode_tiff(rgb)
    assert lc.tiff_dims(t) == (5, 7, 3, "tiff", False)
    assert (lc.tiff_pixels(t) == rgb).all()
    assert lc.tiff_dims(t[:-4])[4]  # truncated strip -> corrupt
    assert lc.tiff_dims(b"II+\x00") is None

    gray = np.tile(np.arange(8, dtype="u1") * 30, (6, 1))
    # PackBits: each row = one replicate-or-literal stream (rows have no runs
    # >=3 here so encode a literal run per row: header byte = len-1)
    comp = b"".join(bytes([7]) + gray[r].tobytes() for r in range(6))
    tp = _mk_tiff(gray, "<", 32773, comp)
    assert lc.tiff_dims(tp) == (8, 6, 1, "tiff", False)
    assert (lc.tiff_pixels(tp) == gray).all()
    tm = _mk_tiff(gray, ">", 1, gray.tobytes())
    assert lc.tiff_dims(tm) == (8, 6, 1, "tiff", False)
    assert (lc.tiff_pixels(tm) == gray).all()


def test_legacy_formats_decode_real(spark):
    import numpy as np

    from ultragendataset_datachecker_spark.ops import legacycodecs as lc
    from ultragendataset_datachecker_spark.ops import multimodal as mm

    rng = np.random.RandomState(4)
    rgb = (rng.rand(6, 9, 3) * 255).astype("u1")
    idx = (rng.rand(6, 9) * 8).astype("u1")
    pal = (rng.rand(8, 3) * 255).astype("u1")
    payloads = [lc.encode_bmp(rgb), lc.encode_gif(idx, pal), lc.encode_tiff(rgb),
                lc.encode_bmp(rgb)[:-8]]
    feats = {r["media_id"]: r for r in mm.decode_image_batch(_media_df(spark, payloads)).collect()}
    assert (feats["m0"]["width"], feats["m0"]["height"], feats["m0"]["format"]) == (9, 6, "bmp")
    assert (feats["m1"]["width"], feats["m1"]["height"], feats["m1"]["format"]) == (9, 6, "gif")
    assert (feats["m2"]["width"], feats["m2"]["height"], feats["m2"]["format"]) == (9, 6, "tiff")
    assert not any(feats[f"m{i}"]["corrupt"] for i in range(3))
    assert feats["m3"]["corrupt"]


def test_legacy_formats_resize_real(spark):
    import numpy as np

    from ultragendataset_datachecker_spark.ops import legacycodecs as lc
    from ultragendataset_datachecker_spark.ops import multimodal as mm

    rgb = np.full((12, 8, 3), 123, dtype="u1")
    idx = np.full((12, 8), 2, dtype="u1")
    pal = np.array([[1, 2, 3], [4, 5, 6], [70, 80, 90]], dtype="u1")
    media = _media_df(spark, [lc.encode_bmp(rgb), lc.encode_gif(idx, pal), lc.encode_tiff(rgb)])
    out = {r["media_id"]: bytes(r["content"]) for r in mm.resize_images(media, width=4, height=6).collect()}
    assert lc.bmp_dims(out["m0"]) == (4, 6, 3, "bmp", False)
    assert (lc.bmp_pixels(out["m0"]) == 123).all()
    assert lc.gif_dims(out["m1"]) == (4, 6, 3, "gif", False)
    assert (lc.gif_pixels(out["m1"]) == pal[2]).all()  # exact palette color preserved
    assert lc.tiff_dims(out["m2"]) == (4, 6, 3, "tiff", False)
    assert (lc.tiff_pixels(out["m2"]) == 123).all()


# -------------------------------------------------------- progressive JPEG

def test_jpeg_progressive_roundtrip_pure():
    """Progressive encode→decode is BIT-IDENTICAL to the baseline decode of
    the same image at the same quality: both encoders produce the same
    quantized coefficients, so the two decode paths must reconstruct the
    same pixels. Covers all four progressive scan types (DC/AC ×
    first/refine), EOB, ZRL and refinement-bit ordering."""
    import numpy as np

    from ultragendataset_datachecker_spark.ops import jpegcodec as jc

    rng = np.random.RandomState(7)
    h, w = 37, 53
    yy, xx = np.mgrid[0:h, 0:w]
    gray = np.clip(80 + yy * 2 + xx * 1.5 + rng.normal(0, 3, (h, w)), 0, 255).astype("u1")
    rgb = np.stack([gray, np.clip(gray.astype(int) + 30, 0, 255), 255 - gray], -1).astype("u1")
    sparse = np.where(rng.rand(40, 56, 3) > 0.995, 255, 0).astype("u1")

    for img in (gray, rgb, sparse):
        for q in (25, 75, 90):
            base = jc.decode_jpeg(jc.encode_jpeg(img, q))
            data = jc.encode_jpeg_progressive(img, q)
            nc = 1 if img.ndim == 2 else 3
            assert jc.jpeg_dims(data) == (img.shape[1], img.shape[0], nc, "jpeg", False)
            assert (jc.decode_jpeg(data) == base).all()

    import pytest as _pytest
    data = jc.encode_jpeg_progressive(rgb, 85)
    with _pytest.raises(ValueError):
        jc.decode_jpeg(data[: len(data) // 2])


def test_jpeg_noninterleaved_sequential_scans():
    """Sequential JPEGs with one SOS per component (legal, rare) decode
    identically to the interleaved encoding of the same coefficients —
    the multi-scan coefficient-accumulation path, not a refusal."""
    import numpy as np

    from ultragendataset_datachecker_spark.ops import jpegcodec as jc

    rng = np.random.RandomState(11)
    h, w = 24, 31
    rgb = (rng.rand(h, w, 3) * 255).astype("u1")
    qy = jc._scaled_quant(jc.QUANT_LUMA, 85)
    qc = jc._scaled_quant(jc.QUANT_CHROMA, 85)
    planes = [p for p in np.moveaxis(jc._rgb_to_ycbcr(rgb.astype(np.float64)), -1, 0)]
    out = bytearray(b"\xff\xd8")
    out += jc._seg(jc.APP0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += jc._seg(jc.DQT, bytes([0x00]) + bytes(int(v) for v in qy[jc._ZZ_ROWS, jc._ZZ_COLS]))
    out += jc._seg(jc.DQT, bytes([0x01]) + bytes(int(v) for v in qc[jc._ZZ_ROWS, jc._ZZ_COLS]))
    comps = b"".join(bytes([i + 1, 0x11, 0 if i == 0 else 1]) for i in range(3))
    out += jc._seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3]) + comps)
    out += jc._seg(jc.DHT, jc._dht_payload(0, 0, jc._DC_BITS, jc._DC_SYMBOLS))
    out += jc._seg(jc.DHT, jc._dht_payload(1, 0, jc._AC_BITS, jc._AC_SYMBOLS))
    out += jc._seg(jc.DHT, jc._dht_payload(0, 1, jc._DC_BITS, jc._DC_SYMBOLS))
    out += jc._seg(jc.DHT, jc._dht_payload(1, 1, jc._AC_BITS, jc._AC_SYMBOLS))
    for ci in range(3):
        out += jc._seg(jc.SOS, bytes([1, ci + 1, 0x00 if ci == 0 else 0x11, 0, 63, 0]))
        wrt = jc._BitWriter()
        jc._encode_plane(wrt, planes[ci], qy if ci == 0 else qc)
        wrt.flush()
        out += wrt.buf
    out += b"\xff\xd9"
    base = jc.decode_jpeg(jc.encode_jpeg(rgb, 85))
    assert (jc.decode_jpeg(bytes(out)) == base).all()


def test_jpeg_progressive_through_spark_pipeline(spark):
    import numpy as np

    from ultragendataset_datachecker_spark.ops import jpegcodec as jc
    from ultragendataset_datachecker_spark.ops import multimodal as mm

    img = np.full((12, 8, 3), 99, dtype="u1")
    media = _media_df(spark, [jc.encode_jpeg_progressive(img, quality=95)])
    feats = mm.decode_image_batch(media).collect()[0]
    assert (feats["width"], feats["height"], feats["format"], feats["corrupt"]) == (8, 12, "jpeg", False)
    resized = mm.resize_images(media, width=4, height=6)
    content = bytes(resized.collect()[0]["content"])
    assert jc.jpeg_dims(content) == (4, 6, 3, "jpeg", False)
    assert np.abs(jc.decode_jpeg(content).astype(int) - 99).max() <= 2


def test_jpeg_420_subsampling_roundtrip():
    """4:2:0 encode exercises the decoder's sampling-factor-2 MCU layout
    and chroma upsampling; error stays within chroma-subsampling bounds and
    a constant image is lossless."""
    import numpy as np

    from ultragendataset_datachecker_spark.ops import jpegcodec as jc

    rng = np.random.RandomState(5)
    for h, w in [(37, 53), (16, 16), (17, 31), (8, 8)]:
        yy, xx = np.mgrid[0:h, 0:w]
        base = np.clip(60 + yy * 2 + xx * 1.2 + rng.normal(0, 2, (h, w)), 0, 255)
        rgb = np.stack([base, np.clip(base + 40, 0, 255), np.clip(255 - base, 0, 255)], -1).astype("u1")
        data = jc.encode_jpeg(rgb, 90, subsampling="420")
        assert jc.jpeg_dims(data) == (w, h, 3, "jpeg", False)
        dec = jc.decode_jpeg(data)
        assert dec.shape == rgb.shape
        assert np.abs(dec.astype(float) - rgb.astype(float)).mean() < 8.0
    const = np.full((24, 40, 3), 130, "u1")
    d = jc.decode_jpeg(jc.encode_jpeg(const, 95, subsampling="420"))
    assert np.abs(d.astype(int) - 130).max() <= 1


def test_jpeg_restart_markers_decode_identical():
    """DRI + RSTn entropy segments (hand-assembled, per-group DC predictor
    reset and byte alignment) decode bit-identically to the same
    coefficients coded without restarts."""
    import numpy as np

    from ultragendataset_datachecker_spark.ops import jpegcodec as jc

    rng = np.random.RandomState(9)
    h, w = 24, 40  # 15 grayscale MCUs
    gray = (rng.rand(h, w) * 255).astype("u1")
    qy = jc._scaled_quant(jc.QUANT_LUMA, 80)
    b = jc._blocks(gray.astype(np.float64) - 128.0)
    cf = np.einsum("ij,njk,lk->nil", jc._DCT, b, jc._DCT)
    zz = np.round(cf / qy).astype(np.int64)[:, jc._ZZ_ROWS, jc._ZZ_COLS]

    interval = 4
    out = bytearray(b"\xff\xd8")
    out += jc._seg(jc.APP0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += jc._seg(jc.DQT, bytes([0x00]) + bytes(int(v) for v in qy[jc._ZZ_ROWS, jc._ZZ_COLS]))
    out += jc._seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    out += jc._seg(jc.DHT, jc._dht_payload(0, 0, jc._DC_BITS, jc._DC_SYMBOLS))
    out += jc._seg(jc.DHT, jc._dht_payload(1, 0, jc._AC_BITS, jc._AC_SYMBOLS))
    out += jc._seg(jc.DRI, interval.to_bytes(2, "big"))
    out += jc._seg(jc.SOS, bytes([1, 1, 0x00, 0, 63, 0]))
    n = zz.shape[0]
    for g0 in range(0, n, interval):
        wrt = jc._BitWriter()
        pred = 0
        for m in range(g0, min(g0 + interval, n)):
            pred = jc._emit_block_seq(wrt, zz[m], pred)
        wrt.flush()
        out += wrt.buf
        if g0 + interval < n:
            out += bytes([0xFF, 0xD0 + ((g0 // interval) % 8)])
    out += b"\xff\xd9"

    ref = jc.decode_jpeg(jc.encode_jpeg(gray, 80))
    assert (jc.decode_jpeg(bytes(out)) == ref).all()


# --------------------------------------------- container metadata probes

def _mk_webp_vp8(w, h):
    import struct

    d = bytes(3) + b"\x9d\x01\x2a" + struct.pack("<HH", w, h) + bytes(20)
    chunk = b"VP8 " + struct.pack("<I", len(d)) + d
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _mk_mp4(w, h, n_frames, timescale, duration):
    import struct

    def box(t, payload):
        return struct.pack(">I", 8 + len(payload)) + t + payload

    tkhd = box(b"tkhd", bytes(4) + bytes(20) + bytes(16) + bytes(36)
               + struct.pack(">II", w << 16, h << 16))
    mdhd = box(b"mdhd", bytes(4) + struct.pack(">IIII", 0, 0, timescale, duration))
    stsz = box(b"stsz", bytes(4) + struct.pack(">II", 0, n_frames))
    mdia = box(b"mdia", mdhd + box(b"minf", box(b"stbl", stsz)))
    moov = box(b"moov", box(b"trak", tkhd + mdia))
    return box(b"ftyp", b"isom\x00\x00\x02\x00isommp41") + moov + box(b"mdat", bytes(64))


def test_container_probes_pure():
    import struct

    from ultragendataset_datachecker_spark.ops import containerprobe as cp

    # WebP: lossy, lossless+alpha, truncation, non-WebP RIFF
    assert cp.webp_dims(_mk_webp_vp8(320, 240)) == (320, 240, 3, "webp", False)
    assert cp.webp_dims(_mk_webp_vp8(320, 240)[:-10])[4]
    bits = 319 | (239 << 14) | (1 << 28)
    d = bytes([0x2F]) + struct.pack("<I", bits) + bytes(8)
    chunk = b"VP8L" + struct.pack("<I", len(d)) + d
    wl = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    assert cp.webp_dims(wl) == (320, 240, 4, "webp", False)
    assert cp.webp_dims(b"RIFF\x04\x00\x00\x00WAVE") is None

    # MP4: full box-tree walk; fps = frames * timescale / duration
    mp4 = _mk_mp4(640, 360, 300, 90000, 900000)
    assert cp.mp4_info(mp4) == (640, 360, 300, 30.0, "mp4", False)
    assert cp.mp4_info(mp4[:40])[5]
    assert cp.mp4_info(b"\x00\x00\x00\x08free") is None

    # FLAC: STREAMINFO bit unpacking + metadata-chain walk
    packed = (44100 << 44) | (1 << 41) | (15 << 36) | 441000
    si = struct.pack(">HH", 4096, 4096) + bytes(6) + packed.to_bytes(8, "big") + bytes(16)
    flac = b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + si + b"\xff\xf8" + bytes(100)
    assert cp.flac_info(flac) == (44100, 441000, 10.0, False)
    assert cp.flac_info(b"fLaC\x00\x00")[3]
    assert cp.flac_info(b"RIFFxxxx") is None

    # MP3: frame-chain walk (MPEG1 Layer III, 128kbps @ 44100)
    flen = 144 * 128000 // 44100
    frame = bytes([0xFF, 0xFB, 0x90, 0x00]) + bytes(flen - 4)
    assert cp.mp3_info(frame * 5) == (44100, 5760, round(5760 / 44100, 6), False)
    assert cp.mp3_info((frame * 5)[:-10])[3]
    assert cp.mp3_info(b"notanmp3file") is None


def test_container_probes_through_spark(spark):
    import struct

    from ultragendataset_datachecker_spark.ops import multimodal as mm

    # image chain picks up WebP dims
    feats = mm.decode_image_batch(_media_df(spark, [_mk_webp_vp8(99, 77)])).collect()[0]
    assert (feats["width"], feats["height"], feats["format"], feats["corrupt"]) == (99, 77, "webp", False)

    # audio chain: WAV (real decode), FLAC (real sample decode since
    # ops/flaccodec — zero-byte fake frames now correctly read corrupt),
    # MP3, garbage
    import numpy as np

    from ultragendataset_datachecker_spark.ops.flaccodec import encode_flac

    flac = encode_flac(
        np.arange(16000, dtype=np.int64) % 1000 - 500,
        sample_rate=8000, block_size=4096)
    flen = 144 * 128000 // 44100
    mp3 = (bytes([0xFF, 0xFB, 0x90, 0x00]) + bytes(flen - 4)) * 3
    media = _media_df(spark, [_make_wav(8000, 1600), flac, mp3, b"junk"], kind="audio")
    rows = {r["media_id"]: r for r in mm.decode_audio_batch(media).collect()}
    assert (rows["m0"]["sample_rate"], rows["m0"]["n_samples"], rows["m0"]["corrupt"]) == (8000, 1600, False)
    assert (rows["m1"]["sample_rate"], rows["m1"]["n_samples"], rows["m1"]["corrupt"]) == (8000, 16000, False)
    assert (rows["m2"]["sample_rate"], rows["m2"]["n_samples"], rows["m2"]["corrupt"]) == (44100, 3456, False)
    assert rows["m3"]["corrupt"]

    # video chain: MP4 metadata without ffmpeg
    media_v = _media_df(spark, [_mk_mp4(1280, 720, 600, 1000, 20000)], kind="video")
    v = mm.decode_video_batch(media_v).collect()[0]
    assert (v["width"], v["height"], v["n_frames"], v["fps"], v["format"], v["corrupt"]) == (
        1280, 720, 600, 30.0, "mp4", False)
