"""Training-data pipeline ops: dedup, similarity, text stats, multimodal."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_spark.pipeline import (
    cosine_topk,
    exact_duplicates,
    lsh_bucket_topk,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dups,
    word_shingles,
)
from lucene_spark.pipeline.multimodal import attach_media_meta, frame_sample, image_features


@pytest.fixture(scope="module")
def dup_docs(spark):
    base = " ".join(
        "the quick brown fox jumps over the lazy dog while the clever cat "
        "watches from the tall green tree and the birds sing morning songs "
        "above the quiet river bank today".split()
    )
    near = base.replace("lazy", "sleepy")  # 1-token edit → jaccard ≈ 0.85
    texts = [base, base, near, "completely different words here entirely", base + " x"]
    return spark.createDataFrame(pd.DataFrame({"doc_id": range(5), "text": texts}))


def test_exact_duplicates(dup_docs):
    groups = exact_duplicates(dup_docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_dups"] == 2 and groups[0]["keeper_id"] == 0


def test_word_shingles_short_docs(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0, 1], "text": ["a b", "a b c d"]}))
    rows = word_shingles(df, n=3).collect()
    got = {(r["doc_id"], r["shingle"]) for r in rows}
    assert got == {(1, "a b c"), (1, "b c d")}  # 2-token doc yields none


def test_minhash_lsh_finds_near_dups(dup_docs):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(
            dup_docs, num_hashes=16, bands=8, threshold=0.5
        ).collect()
    }
    assert (0, 1) in pairs  # exact dup always survives
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup found
    assert not any(3 in p for p in pairs)  # unrelated doc never pairs


def test_ngram_jaccard_exact(dup_docs):
    rows = ngram_jaccard_pairs(dup_docs, threshold=0.99).collect()
    exact = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}
    assert exact[(0, 1)] == 1.0


def test_simhash_near_dups(dup_docs):
    pairs = {(r["doc_a"], r["doc_b"]) for r in simhash_near_dups(dup_docs, max_hamming=10).collect()}
    assert (0, 1) in pairs
    assert not any(3 in p for p in pairs)


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(0)
    base = rng.standard_normal((40, 16)).astype(np.float32)
    base[7] = base[0] + 0.01 * rng.standard_normal(16).astype(np.float32)  # near-dup of 0
    pdf = pd.DataFrame({"vec_id": range(40), "embedding": [v.tolist() for v in base]})
    return spark.createDataFrame(pdf)


def test_cosine_topk_exact(vectors):
    q = [float(x) for x in vectors.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    rows = cosine_topk(vectors, q, k=3).collect()
    assert rows[0]["vec_id"] == 0 and rows[0]["cos"] == 1.0
    assert rows[1]["vec_id"] == 7  # the planted near-duplicate


def test_lsh_topk_recall(vectors):
    q = [float(x) for x in vectors.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    exact = [r["vec_id"] for r in cosine_topk(vectors, q, k=5).collect()]
    approx = [r["vec_id"] for r in lsh_bucket_topk(vectors, q, k=5, n_bits=16, bands=8).collect()]
    # top-1/2 (identical + planted near-dup) must be found
    assert exact[0] in approx and exact[1] in approx


@pytest.fixture(scope="module")
def media(spark):
    pdf = pd.DataFrame(
        {
            "media_id": range(6),
            "kind": ["image", "image", "video", "audio", "video", "image"],
            "payload": [bytes([i] * (10 + i * 7)) for i in range(6)],
        }
    )
    return spark.createDataFrame(pdf)


def test_media_meta_plumbing(media):
    meta = attach_media_meta(media).collect()
    assert len(meta) == 6
    m = {r["media_id"]: r for r in meta}
    assert m[3]["n_bytes"] == 31
    assert all(r["width"] >= 64 and r["height"] >= 64 for r in meta)
    # deterministic: same payload → same meta on re-run
    again = {r["media_id"]: r for r in attach_media_meta(media).collect()}
    assert {k: tuple(v) for k, v in m.items()} == {k: tuple(v) for k, v in again.items()}


def test_media_strict_mode_raises(media):
    with pytest.raises(Exception):  # NotImplementedError inside the UDF
        attach_media_meta(media, strict=True).collect()


def test_image_features_shape(media):
    feats = image_features(media, dim=16).collect()
    assert all(len(r["feat"]) == 16 for r in feats)


def test_frame_sample_fanout(media):
    frames = frame_sample(media, every_ms=1000).collect()
    assert len(frames) >= 6  # at least one frame per item
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    for mid, idxs in by_id.items():
        assert sorted(idxs) == list(range(len(idxs)))


def test_ivf_topk_recall(spark):
    """IVF with enough probes must recover most of the brute-force top-k."""
    from lucene_spark.pipeline import cosine_topk, ivf_assign, ivf_topk

    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 3).collect()[0]["embedding"]]
    exact = [r["vec_id"] for r in cosine_topk(emb, qvec, k=10).collect()]
    assigned, cent = ivf_assign(emb, n_lists=8, seed=7)
    assigned = assigned.persist()
    approx = [r["vec_id"] for r in ivf_topk(assigned, cent, qvec, k=10, n_probes=4).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.6, (recall, exact, approx)
    # all-probes IVF == brute force (sanity: partitioning loses nothing)
    full = [r["vec_id"] for r in ivf_topk(assigned, cent, qvec, k=10, n_probes=8).collect()]
    assert full == exact
    assigned.unpersist()


def test_duplicate_clusters(spark):
    """Connected components over dup pairs: chains collapse to one
    cluster keyed by the min doc_id."""
    from lucene_spark.pipeline import duplicate_clusters

    # components: {1,2,3,4} (chain), {10,11}, {20,21,22} (star)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (20, 22)],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_duplicate_clusters_end_to_end(spark, documents):
    """minhash-LSH pairs -> clusters on real data, keepers consistent."""
    from lucene_spark.pipeline import duplicate_clusters, minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        documents.limit(300), n=3, num_hashes=16, bands=8, threshold=0.3
    ).select("doc_a", "doc_b")
    if pairs.count() == 0:
        import pytest

        pytest.skip("no near-dup pairs at this threshold")
    clusters = duplicate_clusters(pairs)
    # every cluster id is a member of its own cluster
    ids = {r["cluster_id"] for r in clusters.collect()}
    members = {r["doc_id"] for r in clusters.collect()}
    assert ids <= members


# --- round-2 regressions: pigeonhole chunks, vectorized simhash, df cap ----


@pytest.fixture(scope="module")
def near_dup_variants(spark):
    """15 docs: a 30-token base plus variants with 1-3 token edits —
    pairwise simhash hamming distances land in the 0-15 range, so
    recall for budgets above 3 is actually exercised."""
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lamda mu "
        "nu xi omicron pi rho sigma tau upsilon phi chi psi omega one two "
        "three four five six"
    ).split()
    rng = np.random.RandomState(7)
    texts = [" ".join(base)]
    for i in range(14):
        toks = list(base)
        for j in rng.choice(len(toks), size=1 + i % 3, replace=False):
            toks[j] = f"edit{i}_{j}"
        texts.append(" ".join(toks))
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def test_simhash_near_dups_complete_recall_hamming_gt3(near_dup_variants):
    """The fixed n_chunks = max_hamming + 1 pigeonhole must find EVERY
    pair within the budget (the old hardcoded 4 chunks silently lost
    pairs for max_hamming >= 4)."""
    from lucene_spark.pipeline import simhash

    hs = {r["doc_id"]: r["simhash"] for r in simhash(near_dup_variants).collect()}
    ids = sorted(hs)
    want = set()
    for i in ids:
        for j in ids:
            if i < j:
                ham = bin((hs[i] ^ hs[j]) & ((1 << 64) - 1)).count("1")
                if ham <= 8:
                    want.add((i, j, ham))
    assert any(3 < h <= 8 for _, _, h in want), "fixture must exercise hamming 4..8"
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_dups(near_dup_variants, max_hamming=8).collect()
    }
    assert got == want


def test_simhash_vectorized_matches_reference(spark):
    """Batch kernel == per-doc reference loop (the pre-vectorization
    semantics), including empty docs and repeated terms."""
    import hashlib

    from lucene_spark.pipeline.dedup import _simhash64_batch

    texts = pd.Series(
        ["a b a c", "", None, "z z z", "the quick fox", "a", "b c d e f g"]
    )

    def ref_one(t):
        if not isinstance(t, str) or not t:
            return 0
        votes = np.zeros(64, dtype=np.int64)
        shifts = np.arange(63, -1, -1, dtype=np.uint64)
        cnt = pd.Series(t.split(" ")).value_counts()
        for term, freq in cnt.items():
            h = np.uint64(int(hashlib.md5(term.encode()).hexdigest()[:16], 16))
            bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
            votes += np.where(bits == 1, freq, -freq)
        val = np.uint64(0)
        for b in (votes > 0).astype(np.uint64):
            val = (val << np.uint64(1)) | b
        return int(np.array([val], dtype=np.uint64).view(np.int64)[0])

    got = _simhash64_batch(texts).tolist()
    assert got == [ref_one(t) for t in texts]


def test_ngram_jaccard_shingle_df_cap(spark):
    """Head shingles above the df cap stop generating candidates; rare
    shared shingles still pair up (Jaccard over the capped space)."""
    head = "of the and in to for on at by is"  # the ubiquitous content
    docs = [(i, head) for i in range(8)]
    docs.append((100, head + " rare signal shingle"))
    docs.append((101, head + " rare signal shingle"))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    uncapped = ngram_jaccard_pairs(df, n=3, threshold=0.01).collect()
    assert len(uncapped) == 10 * 9 // 2  # all-pairs: the head blowup

    capped = ngram_jaccard_pairs(df, n=3, threshold=0.01, max_shingle_df=4).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in capped} == {(100, 101)}
    assert capped[0]["jaccard"] == 1.0  # over the surviving shingle space


# --- real multimodal codecs (round 2): PPM/PGM/BMP/WAV, frame streams -----


def _ppm_bytes(w, h, rgb):
    import numpy as np

    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :] = rgb
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def _bmp_bytes(w, h, rgb):
    import struct

    row = (bytes([rgb[2], rgb[1], rgb[0]]) * w) + b"\0" * ((4 - (w * 3) % 4) % 4)
    pixels = row * h
    off = 54
    header = (
        b"BM"
        + struct.pack("<IHHI", off + len(pixels), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 0, 0, 0, 0)
    )
    return header + pixels


def _wav_bytes(rate, n_samples):
    import struct

    import numpy as np

    samples = (np.sin(np.arange(n_samples) / 10.0) * 1000).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    data = samples
    riff = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    riff += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def test_real_image_and_wav_metadata(spark):
    from lucene_spark.pipeline.multimodal import attach_media_meta

    rows = [
        (0, "image", bytearray(_ppm_bytes(20, 10, (255, 0, 0)))),
        (1, "image", bytearray(_bmp_bytes(7, 5, (0, 0, 255)))),
        (2, "audio", bytearray(_wav_bytes(8000, 4000))),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    meta = {r["media_id"]: r for r in attach_media_meta(df, strict=True).collect()}
    assert (meta[0]["width"], meta[0]["height"], meta[0]["codec"]) == (20, 10, "ppm")
    assert (meta[1]["width"], meta[1]["height"], meta[1]["codec"]) == (7, 5, "bmp")
    assert meta[2]["codec"] == "pcm_wav" and meta[2]["duration_ms"] == 500


def test_real_image_features_and_resize(spark):
    import numpy as np

    from lucene_spark.pipeline.multimodal import (
        decode_image,
        image_features,
        image_resize,
    )

    # pure red image: mean = (1, 0, 0), stds 0, grid means = red mean
    df = spark.createDataFrame(
        [(0, bytearray(_ppm_bytes(8, 8, (255, 0, 0))))],
        "media_id long, payload binary",
    )
    feat = image_features(df, dim=10, strict=True).collect()[0]["feat"]
    assert feat[0] == pytest.approx(1.0) and feat[1] == pytest.approx(0.0)
    assert feat[3] == pytest.approx(0.0)  # zero std

    out = image_resize(df, 4, 2, strict=True).collect()[0]
    assert (out["width"], out["height"]) == (4, 2)
    arr, codec = decode_image(bytes(out["payload"]))
    assert codec == "ppm" and arr.shape == (2, 4, 3)
    assert (arr[:, :, 0] == 255).all()


def test_ppm_stream_frame_sampling(spark):
    from lucene_spark.pipeline.multimodal import decode_image, frame_sample

    stream = b"".join(_ppm_bytes(4, 4, (i * 20, 0, 0)) for i in range(6))
    df = spark.createDataFrame(
        [(0, bytearray(stream))], "media_id long, payload binary"
    )
    frames = frame_sample(df, every_n=2, strict=True).collect()
    assert [r["frame_idx"] for r in sorted(frames, key=lambda r: r["frame_idx"])] == [0, 2, 4]
    arr, _ = decode_image(bytes(frames[0]["frame"]))
    assert arr.shape == (4, 4, 3)


def test_simhash_multiblock_index_exact_recall(spark):
    """Manku-style widened index (n_blocks > h+1): candidate
    generation over C(n_blocks, keep) concatenated-block keys finds
    EXACTLY the pairs the minimal-fan-out default finds — pigeonhole
    guarantees recall for any block count, and the popcount verify
    fixes precision."""
    import random

    from lucene_spark.pipeline.dedup import simhash_pairs_from_hashes

    rng = random.Random(7)
    rows = []
    doc_id = 0
    for base_i in range(40):
        base = rng.getrandbits(64)
        rows.append((doc_id, base - (1 << 64) if base >= (1 << 63) else base))
        doc_id += 1
        # perturbed copies at hamming 1..5 (some beyond the h=3 budget)
        for h in (1, 2, 3, 4, 5):
            v = base
            for bit in rng.sample(range(64), h):
                v ^= 1 << bit
            rows.append((doc_id, v - (1 << 64) if v >= (1 << 63) else v))
            doc_id += 1
    sh = spark.createDataFrame(rows, "doc_id long, simhash long")

    def pairset(**kw):
        return {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in simhash_pairs_from_hashes(sh, max_hamming=3, **kw).collect()
        }

    narrow = pairset()  # n_blocks = 4 (16-bit keys)
    wide8 = pairset(n_blocks=8)  # 56 keys of ~40 bits — the scale path
    wide6 = pairset(n_blocks=6)
    assert narrow == wide8 == wide6
    # sanity: every planted <=3 pair is present
    assert all(h <= 3 for _, _, h in narrow) and len(narrow) >= 40 * 3


def test_simhash_multiblock_rejects_bad_blocks(spark):
    import pytest as _pytest

    from lucene_spark.pipeline.dedup import simhash_pairs_from_hashes

    sh = spark.createDataFrame([(0, 5)], "doc_id long, simhash long")
    with _pytest.raises(ValueError):
        simhash_pairs_from_hashes(sh, max_hamming=3, n_blocks=3).collect()
