"""Operator exactness tests: dedup family vs brute-force references,
similarity vs exact cosine, multimodal plumbing, text stats."""

import hashlib
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from strucmotif_search_spark import TOKEN_PATTERN
from strucmotif_search_spark.operators import dedup, multimodal, similarity, textstats

TOK = re.compile(TOKEN_PATTERN)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
        (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
        (3, "import numpy as np def main return np"),
        (4, "completely different content about spark engines"),
        (5, "import numpy as np def main return np extra tail"),  # near 3
        (6, ""),
        (7, "a b c d e f g h i j k l m n o p q r s t"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def _shingles(text, n=3):
    toks = TOK.findall(text)
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _jaccard(a, b):
    A, B = _shingles(a), _shingles(b)
    return len(A & B) / len(A | B) if A | B else 0.0


def test_exact_dedup(docs):
    out = {r["doc_id"]: r["canonical_id"] for r in dedup.exact_dedup(docs).collect()}
    assert out[0] == 0 and out[2] == 0  # identical texts share canonical id
    assert out[1] == 1 and out[3] == 3


def test_ngram_jaccard_matches_bruteforce(docs):
    rows = docs.collect()
    texts = {r["doc_id"]: r["text"] for r in rows}
    expected = {}
    ids = sorted(texts)
    for i in ids:
        for j in ids:
            if i < j:
                jac = _jaccard(texts[i], texts[j])
                if jac >= 0.3:
                    expected[(i, j)] = jac
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    assert set(got) == set(expected)
    for k in got:
        assert got[k] == pytest.approx(expected[k], abs=1e-12)
    assert (0, 2) in got  # exact dup pair found with jaccard 1.0
    assert got[(0, 2)] == 1.0


def test_minhash_lsh_no_false_positives_and_finds_exact(docs):
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_pairs(
            docs, num_hashes=16, bands=8, threshold=0.3
        ).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    # verification stage guarantees zero false positives
    for (a, b), jac in got.items():
        assert jac == pytest.approx(_jaccard(texts[a], texts[b]), abs=1e-12)
        assert jac >= 0.3
    # identical docs collide in every band -> always recalled
    assert (0, 2) in got


def test_simhash_properties(docs):
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert sh[0] == sh[2]  # identical text -> identical fingerprint
    ham_near = bin(sh[0] ^ sh[1]).count("1")
    ham_far = bin(sh[0] ^ sh[4]).count("1")
    assert ham_near < ham_far  # near-dup closer than unrelated
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_near_pairs(docs, max_hamming=3).collect()
    }
    assert pairs[(0, 2)] == 0


def test_cosine_topk_exact_and_lsh_recall(spark):
    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [float(x) for x in vecs[0]]
    exact = [
        r["vec_id"]
        for r in similarity.cosine_topk_bruteforce(df, q, k=10).collect()
    ]
    # numpy ground truth
    v = vecs.astype(np.float64)
    cos = (v @ np.asarray(q)) / (
        np.linalg.norm(v, axis=1) * np.linalg.norm(q)
    )
    order = np.lexsort((np.arange(200), -cos))[:10]
    assert exact == list(order)
    # LSH: results are a subset of the corpus ranked exactly; recall@10 > 0
    lsh = [
        r["vec_id"]
        for r in similarity.lsh_cosine_topk(df, q, k=10, n_planes=6).collect()
    ]
    assert lsh[0] == 0  # the query vector itself is always in its own bucket
    assert len(set(lsh) & set(exact)) >= 3


def test_ivf_topk_determinism_and_recall(spark):
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((300, 16)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [float(x) for x in vecs[0]]
    exact = {
        r["vec_id"]
        for r in similarity.cosine_topk_bruteforce(df, q, k=10).collect()
    }
    # full probe (nprobe == n_cells) degenerates to exact brute force
    full = similarity.ivf_cosine_topk(df, q, k=10, n_cells=8, nprobe=8)
    assert {r["vec_id"] for r in full.collect()} == exact
    # partial probe: deterministic across runs, ranked exactly, recall > 0
    a = [r["vec_id"] for r in
         similarity.ivf_cosine_topk(df, q, k=10, n_cells=8, nprobe=3).collect()]
    b = [r["vec_id"] for r in
         similarity.ivf_cosine_topk(df, q, k=10, n_cells=8, nprobe=3).collect()]
    assert a == b
    assert a[0] == 0  # the query vector lands in a probed cell (it IS cid 0)
    assert len(set(a) & exact) >= 3
    # assignment is a map-only expression: no Exchange before the cell filter
    plan = similarity.ivf_cosine_topk(
        df, q, k=10, n_cells=8, nprobe=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_embedding_near_dup_pairs(spark):
    rng = np.random.default_rng(9)
    base = rng.standard_normal(16).astype(np.float32)
    rows = [
        (0, [float(x) for x in base]),
        (1, [float(x) for x in base * 1.001]),  # same direction -> cos ~ 1
        (2, [float(x) for x in rng.standard_normal(16)]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_near_dup_pairs(df, tau=0.99).collect()
    }
    assert (0, 1) in got


def test_textstats_exact(docs):
    rows = docs.collect()
    prof = {r["doc_id"]: r for r in textstats.text_profile(docs).collect()}
    for r in rows:
        toks = TOK.findall(r["text"])
        assert prof[r["doc_id"]]["n_tokens"] == len(toks)
        norm = " ".join(TOK.findall(r["text"].lower()))
        assert prof[r["doc_id"]]["fingerprint"] == hashlib.md5(
            norm.encode()
        ).hexdigest()
    lang = {r["doc_id"]: r["lang_pred"] for r in textstats.lang_id(docs).collect()}
    assert lang[0] == "en"    # 'the' x2
    assert lang[3] == "py"    # import/def/return markers


def test_multimodal_plumbing(spark):
    media = multimodal.synthesize_media(spark, 30, seed=3)
    assert media.count() == 30
    feats = multimodal.extract_features(media, fake_decode=True).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r["feature"]) == multimodal.FEATURE_DIM
        assert len(r["digest"]) == 64
    # determinism: same payload -> same features
    again = multimodal.extract_features(media, fake_decode=True).collect()
    a = {r["media_id"]: r["feature"] for r in feats}
    b = {r["media_id"]: r["feature"] for r in again}
    assert a == b
    # formats needing external codecs are an explicit stub
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNGxxxx", fake=False)
    plan = multimodal.frame_sample_plan(media, every_ms=60000)
    vids = media.where(F.col("kind") == "video").count()
    assert plan.select("media_id").distinct().count() == vids


def test_multimodal_real_ppm_decode(spark):
    """encode -> Spark decode roundtrip on REAL pixel data (pure-numpy PPM
    decoder), dims + pixel digest verified against the source arrays."""
    import hashlib

    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    imgs = {
        i: rng.integers(0, 256, (int(rng.integers(1, 20)),
                                 int(rng.integers(1, 20)), 3)).astype(np.uint8)
        for i in range(25)
    }
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": list(imgs),
                "payload": [multimodal.encode_ppm(a) for a in imgs.values()],
            }
        )
    )
    out = {r["media_id"]: r for r in multimodal.decode_image_dims(media).collect()}
    assert len(out) == len(imgs)
    for i, a in imgs.items():
        r = out[i]
        assert (r["height"], r["width"]) == a.shape[:2]
        assert r["pixel_sha256"] == hashlib.sha256(a.tobytes()).hexdigest()


def test_multimodal_bmp_decode():
    """24-bit BMP (bottom-up, padded rows) decodes to the original RGB."""
    import numpy as np

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (6, 5, 3)).astype(np.uint8)
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    for row in img[::-1]:
        raster += row[:, ::-1].tobytes()  # RGB -> BGR
        raster += b"\x00" * (stride - w * 3)
    off = 54
    hdr = b"BM" + (off + len(raster)).to_bytes(4, "little") + b"\x00" * 4
    hdr += off.to_bytes(4, "little") + (40).to_bytes(4, "little")
    hdr += w.to_bytes(4, "little", signed=True)
    hdr += h.to_bytes(4, "little", signed=True)
    hdr += (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
    hdr += (0).to_bytes(4, "little") + len(raster).to_bytes(4, "little")
    hdr += b"\x00" * 16
    out = multimodal.decode_image(bytes(hdr) + bytes(raster))
    assert (out == img).all()


def test_repetition_signals_exact(spark):
    rows = [
        # 4 lines, "dup line" twice -> 1 of 4 lines is a repeat copy
        (0, "dup line\nunique one\ndup line\nunique two"),
        # all lines distinct
        (1, "alpha\nbeta\ngamma"),
        # empty / whitespace-only doc: all signals 0
        (2, "   \n\n  "),
        # "x y" appears 3x among 5 grams; token chars = 6*1 = 6
        (3, "x y x y x y"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in textstats.repetition_signals(docs).collect()
    }
    # doc 0: 4 lines, 3 distinct -> dup_line_frac 1/4; chars 8+10+8+10=36,
    # distinct chars 8+10+10=28 -> char frac 8/36
    assert out[0]["dup_line_frac"] == pytest.approx(0.25)
    assert out[0]["dup_line_char_frac"] == pytest.approx(round(8 / 36, 6))
    assert out[1]["dup_line_frac"] == 0.0
    assert out[1]["dup_line_char_frac"] == 0.0
    assert out[2]["dup_line_frac"] == 0.0
    assert out[2]["top_2gram_frac"] == 0.0
    # doc 3 tokens: x y x y x y -> grams: "x y"(3), "y x"(2); top covers
    # 3 * 2 chars of 6 token chars = 1.0
    assert out[3]["top_2gram_frac"] == pytest.approx(1.0)
    # tie-break determinism: equal counts pick the lexicographically
    # smallest gram ("a b" over "b a" when both occur once... doc below)
    tie = spark.createDataFrame(
        [(9, "b a b")], "doc_id long, text string"
    )
    r9 = textstats.repetition_signals(tie).collect()[0]
    # grams "b a"(1), "a b"(1) -> pick "a b"; covers 2 of 3 token chars
    assert r9["top_2gram_frac"] == pytest.approx(round(2 / 3, 6))


def test_semantic_dedup_matches_bruteforce(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(6, 8))
    rows = []
    vid = 0
    for b in base:
        for jitter in (0.0, 0.01, 0.02):  # three near-copies per cluster
            v = b + rng.normal(scale=jitter, size=8)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [(i, r) for i, r in enumerate([list(b) for b in base])]
    out = {
        r["vec_id"]: r["dup_of"]
        for r in similarity.semantic_dedup(
            emb, tau=0.95, centroids=cents
        ).collect()
    }
    # brute-force replay of the keep-lowest-id rule within exact cells
    def cos(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    cell = {}
    for v_id, v in rows:
        sims = [(cos(v, c), -cid) for cid, c in cents]
        cell[v_id] = -max(sims)[1]
    expect = {}
    for v_id, v in rows:
        lower = [
            o for o, ov in rows
            if o < v_id and cell[o] == cell[v_id] and cos(ov, v) >= 0.95
        ]
        if lower:
            expect[v_id] = min(lower)
    assert out == expect
    assert len(expect) > 0  # the fixture actually exercises dedup


def test_corpus_prep_reasons_and_precedence(spark):
    from strucmotif_search_spark.operators import pipeline

    good = (
        "some reasonably long and varied content line here\n"
        "another distinct line with plenty of alphabetic words\n"
        "third line keeps the quality score comfortably high"
    )
    repeated = "repeat this line\n" * 10 + "one more unique closing line"
    rows = [
        (0, good),                      # kept, canonical for fp
        (1, "tiny doc"),                # too_short (2 tokens < 12)
        (2, "@@ ## $$ %% ^^ && ** (( )) !! ~~ ?? // \\\\ ;; :: .. ,, << >>"
            " @@ ## $$ %% ^^"),          # >=12 "tokens"? none match TOKEN_PATTERN -> too_short
        (3, good.upper()),              # same normalized fp as 0 -> exact_dup
        (4, repeated),                  # repetition (dup_line_frac 10/11... > 0.3)
        (5, good + " distinct tail markers alpha beta gamma delta"),  # kept
    ]
    # doc 2 actually has zero TOKEN_PATTERN tokens -> too_short fires first
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["keep"], r["drop_reason"])
        for r in pipeline.corpus_prep(docs, min_quality=0.3).collect()
    }
    assert out[0] == (True, None)
    assert out[1] == (False, "too_short")
    assert out[2] == (False, "too_short")
    assert out[3] == (False, "exact_dup")
    assert out[4] == (False, "repetition")
    assert out[5] == (True, None)

    # precedence: a doc that is BOTH too short and a dup of a kept doc
    # reports too_short (first stage wins), and never claims canonical
    # status: doc 10 is a short dup of nothing kept -> too_short, and a
    # full-quality copy (11) of it is canonical for its own fingerprint
    rows2 = [
        (10, "dup text"),
        (11, "dup text " * 6),  # 12 tokens, survives, own fp
        (12, "dup text " * 6),  # exact dup of 11
    ]
    docs2 = spark.createDataFrame(rows2, "doc_id long, text string")
    out2 = {
        r["doc_id"]: (r["keep"], r["drop_reason"])
        for r in pipeline.corpus_prep(
            docs2, min_quality=0.0, max_top_2gram_frac=2.0
        ).collect()
    }
    assert out2[10] == (False, "too_short")
    assert out2[11] == (True, None)
    assert out2[12] == (False, "exact_dup")

    # summary partitions the corpus: counts per outcome sum to the input
    summ = {
        r["outcome"]: r["n_docs"]
        for r in pipeline.prep_summary(
            pipeline.corpus_prep(docs, min_quality=0.3)
        ).collect()
    }
    assert sum(summ.values()) == len(rows)
    assert summ["kept"] == 2 and summ["too_short"] == 2
