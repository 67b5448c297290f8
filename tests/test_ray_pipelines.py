"""Ray Data pipeline smoke + correctness tests (sf0.001, shared session)."""

import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def test_entry_smoke():
    import __ray_entry__ as e

    ds = e.entry()
    table = ds.take_batch(50, batch_format="pyarrow")
    assert {"doc_id", "url", "date_str"} <= set(table.column_names)
    # every synthesized page embeds a recoverable date
    assert table.column("date_str").null_count == 0


def test_pages_deterministic():
    from go_htmldate_ray.sources.pages import read_pages

    def snapshot():
        rows = read_pages(SF).take_all()
        rows.sort(key=lambda r: r["doc_id"])  # block arrival order varies
        return [(r["doc_id"], r["url"], r["html"], r["warc_ts"]) for r in rows]

    assert snapshot() == snapshot()


def test_extract_matches_embedded_date():
    from go_htmldate_ray.pipelines.extract_dates import extract_dates
    from go_htmldate_ray.sources.pages import page_date

    rows = extract_dates(SF, concurrency=2).take_all()
    assert len(rows) == 500
    for r in rows:
        assert r["date_str"] == page_date(r["doc_id"]).isoformat(), r


def test_minhash_finds_planted_duplicate():
    import ray.data
    from go_htmldate_ray.stages.dedup import minhash_lsh_pairs

    base = " ".join(f"word{i}" for i in range(120))
    near = " ".join(f"word{i}" for i in range(117)) + " tail alpha beta"
    other = " ".join(f"other{i}" for i in range(120))
    ds = ray.data.from_items(
        [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": near},
            {"doc_id": 3, "text": other},
        ]
    )
    pairs = minhash_lsh_pairs(ds, threshold=0.5).take_all()
    found = {(p["doc_a"], p["doc_b"]) for p in pairs}
    assert (1, 2) in found
    assert all(p != (1, 3) and p != (2, 3) for p in found)


def test_simhash_near_duplicates_close():
    import ray.data
    from go_htmldate_ray.stages.dedup import simhash_batch

    base = "alpha beta gamma delta epsilon zeta eta theta " * 8
    ds = ray.data.from_items(
        [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base + " iota"},
            {"doc_id": 3, "text": "unrelated words entirely disjoint vocabulary set " * 8},
        ]
    )
    rows = ds.map_batches(simhash_batch, batch_format="pyarrow").take_all()
    h = {r["doc_id"]: int(r["simhash"], 16) for r in rows}
    dist = lambda a, b: bin(a ^ b).count("1")
    assert dist(h[1], h[2]) < dist(h[1], h[3])


def test_ann_brute_force_exact():
    import numpy as np
    import ray.data
    from go_htmldate_ray.stages.similarity import brute_force_topk

    rng = np.random.RandomState(0)
    vecs = rng.standard_normal((50, 16)).astype(np.float32)
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(50)]
    )
    got = brute_force_topk(ds, query_ids=[0], k=3).take_all()
    # numpy reference
    m = vecs.astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    cos = m @ m[0]
    cos[0] = -np.inf
    expect = list(np.argsort(-cos)[:3])
    assert [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rank"])] == expect


def test_multimodal_stub_plumbing():
    import ray.data
    from go_htmldate_ray.stages.multimodal import ImageDecodeStage, fake_image_features

    items = [{"media_id": i, "payload": bytes([i]) * 64, "media_type": "image"} for i in range(8)]
    ds = ray.data.from_items(items)
    out = ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"feature_fn": fake_image_features},
        batch_format="pyarrow",
        batch_size=4,
        concurrency=1,
    ).take_all()
    assert len(out) == 8
    assert all(len(r["features"]) == 8 for r in out)
    # default kernel is the REAL sniffing decoder: undecodable bytes
    # (e.g. a JPEG, which needs an external codec) raise ValueError
    with pytest.raises(ValueError):
        ImageDecodeStage()(
            pa.table(
                {
                    "media_id": pa.array([1], pa.int64()),
                    "payload": pa.array([b"xx"], pa.binary()),
                    "media_type": pa.array(["image"], pa.string()),
                }
            )
        )


def test_partitioned_sink_resume(tmp_path):
    import os

    from go_htmldate_ray.pipelines.extract_dates import extract_dates
    from go_htmldate_ray.sources.sink import read_partitioned, write_partitioned

    out = str(tmp_path / "sink")
    ds = extract_dates(SF, concurrency=2)
    r1 = write_partitioned(ds, out, n_shards=8)
    assert r1["rows_written"] == 500 and len(r1["shards_written"]) == 8

    # Simulate a partial failure: two shards lose their success marker
    os.remove(f"{out}/shard=3/_SUCCESS")
    os.remove(f"{out}/shard=5/_SUCCESS")
    r2 = write_partitioned(extract_dates(SF, concurrency=2), out, n_shards=8)
    assert r2["shards_written"] == [3, 5]
    assert r2["shards_skipped"] == [0, 1, 2, 4, 6, 7]
    assert read_partitioned(out).count() == 500


def test_streaming_ops_match_duckdb():
    """Windowed aggregate, as-of join, sessionization vs DuckDB oracles."""
    import duckdb

    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in ("events", "orders", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    from tools.check_oracles import canon

    qs = entry.queries()
    oracles = entry.oracle_sql()
    for name in ("windowed_events", "asof_latest_order", "sessionize_events"):
        ray_df = canon(qs[name](SF).to_pandas())
        duck_df = canon(con.sql(oracles[name]).df())
        duck_df = duck_df.astype(ray_df.dtypes.to_dict())
        assert ray_df.equals(duck_df), name


def test_winnow_fingerprints_detect_overlap():
    from go_htmldate_ray.stages.text_stage import winnow_fingerprints

    base = "the quick brown fox jumps over the lazy dog " * 4
    near = base.replace("jumps", "leaps")
    other = "entirely different content with no shared substrings at all " * 4
    fa, fb, fc = (set(winnow_fingerprints(t)) for t in (base, near, other))
    overlap_near = len(fa & fb) / len(fa | fb)
    overlap_far = len(fa & fc) / len(fa | fc)
    assert overlap_near > 0.5 > overlap_far
    # deterministic
    assert winnow_fingerprints(base) == winnow_fingerprints(base)


def test_winnow_batch_query():
    import __ray_entry__ as entry

    rows = entry.queries()["winnow_fingerprints"](SF).take_all()
    assert len(rows) == 500
    assert all(r["n_fingerprints"] > 0 for r in rows)


def test_embedding_dup_pairs_exact_tiles():
    """Distributed tile scorer equals numpy all-pairs, including pairs that
    straddle chunk boundaries (chunk_rows forces several tiles)."""
    import numpy as np
    import ray.data
    from go_htmldate_ray.stages.similarity import embedding_dup_pairs

    rng = np.random.RandomState(3)
    vecs = rng.standard_normal((90, 16)).astype(np.float32)
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(90)]
    )
    got = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in embedding_dup_pairs(ds, threshold=0.3, chunk_rows=16).take_all()
    }
    m = vecs.astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    cos = m @ m.T
    expect = {}
    for i in range(90):
        for j in range(i + 1, 90):
            if cos[i, j] >= 0.3:
                expect[(i, j)] = round(float(cos[i, j]), 6)
    assert got == expect


def test_embedding_dup_pairs_lsh_planted_recall():
    """Banded-LSH path finds every planted near-identical pair with zero
    false positives (verification is exact)."""
    import numpy as np
    import ray.data
    from go_htmldate_ray.stages.similarity import embedding_dup_pairs_lsh

    rng = np.random.RandomState(7)
    rows, expected, vid = [], set(), 0
    for _ in range(3):
        base = rng.standard_normal(64)
        members = []
        for _ in range(5):
            v = base + 0.02 * rng.standard_normal(64)
            rows.append({"vec_id": vid, "embedding": v.astype(np.float32).tolist()})
            members.append(vid)
            vid += 1
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                expected.add((members[i], members[j]))
    for _ in range(100):
        rows.append(
            {"vec_id": vid, "embedding": rng.standard_normal(64).astype(np.float32).tolist()}
        )
        vid += 1
    got = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_dup_pairs_lsh(
            ray.data.from_items(rows), threshold=0.9
        ).take_all()
    }
    assert got == expected


def test_minhash_skewed_bucket_star_sampled():
    """1k identical docs: the hot LSH bucket is star-sampled (999 spanning
    pairs, est 1.0) — bounded output, cluster connectivity preserved,
    nothing silently dropped."""
    import ray.data
    from go_htmldate_ray.stages.dedup import minhash_lsh_pairs

    docs = [{"doc_id": i, "text": "alpha beta gamma delta epsilon " * 20} for i in range(1000)]
    pairs = minhash_lsh_pairs(ray.data.from_items(docs)).take_all()
    assert len(pairs) == 999
    assert all(p["est_jaccard"] == 1.0 for p in pairs)
    assert {p["doc_a"] for p in pairs} == {0}
    assert {p["doc_b"] for p in pairs} == set(range(1, 1000))


def test_minhash_band_rows_are_light():
    """The bucket shuffle carries only (band_key, doc_id) — signatures must
    not ride the band expansion (16× volume otherwise)."""
    import pyarrow as pa
    import numpy as np
    from go_htmldate_ray.stages.dedup import MinHasher, _band_batch

    mh = MinHasher()
    sig = mh.signature("some text with enough tokens to shingle properly here")
    batch = pa.table(
        {
            "key": pa.array([1], pa.int64()),
            "payload": pa.array([np.asarray(sig, dtype=np.int64).tobytes()], pa.binary()),
        }
    )
    banded = _band_batch(batch, 16, 8)
    assert banded.column_names == ["band_key", "doc_id"]
    assert banded.num_rows == 16


def test_multimodal_resize_and_audio_stages():
    """Resize and audio-window plumbing: stubbed kernels behind injected
    fns, real Ray actor-pool stage shape, typed output layouts."""
    import numpy as np
    import ray.data
    from go_htmldate_ray.stages.multimodal import (
        AudioWindowStage,
        ImageResizeStage,
        fake_resize,
    )

    items = [
        {"media_id": i, "payload": bytes(range(i + 1)) * 100, "media_type": "image"}
        for i in range(6)
    ]
    ds = ray.data.from_items(items)
    resized = ds.map_batches(
        ImageResizeStage,
        fn_constructor_kwargs={"width": 8, "height": 4, "resize_fn": fake_resize},
        batch_format="pyarrow",
        batch_size=4,
        concurrency=1,
    ).take_all()
    assert len(resized) == 6
    assert all(len(r["payload"]) == 32 and r["width"] == 8 and r["height"] == 4 for r in resized)
    # default kernel is the REAL sniffing decode→resample→encode path:
    # undecodable bytes raise ValueError
    with pytest.raises(ValueError):
        ImageResizeStage()(
            pa.table(
                {
                    "media_id": pa.array([1], pa.int64()),
                    "payload": pa.array([b"x"], pa.binary()),
                }
            )
        )

    # audio: payload = little-endian int16 PCM; windows of 4 samples
    samples = np.arange(10, dtype="<i2")
    audio = ray.data.from_items([{"media_id": 7, "payload": samples.tobytes()}])
    rows = audio.map_batches(
        AudioWindowStage,
        fn_constructor_kwargs={"window": 4},
        batch_format="pyarrow",
        concurrency=1,
    ).take_all()
    assert [r["window_index"] for r in rows] == [0, 1, 2]
    f = samples.astype(np.float64)
    expect0 = float(np.sqrt((f[:4] ** 2).mean()))
    assert abs(rows[0]["rms"] - expect0) < 1e-12


def test_lsh_verify_modes_equivalent():
    """Broadcast (small-side) and lookup-join (scale) verification paths
    must produce identical pair sets."""
    import numpy as np
    import ray.data
    from go_htmldate_ray.stages.dedup import minhash_lsh_pairs
    from go_htmldate_ray.stages.similarity import embedding_dup_pairs_lsh

    base = " ".join(f"w{i}" for i in range(100))
    docs = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base + " tail"},
        {"doc_id": 3, "text": "x " * 120},
    ]
    key = lambda rows: sorted((r["doc_a"], r["doc_b"]) for r in rows)
    a = key(minhash_lsh_pairs(ray.data.from_items(docs), threshold=0.5,
                              verify_mode="broadcast").take_all())
    b = key(minhash_lsh_pairs(ray.data.from_items(docs), threshold=0.5,
                              verify_mode="join").take_all())
    assert a == b and (1, 2) in a

    rng = np.random.RandomState(11)
    base_v = rng.standard_normal(32)
    vecs = [{"vec_id": i, "embedding": (base_v + 0.01 * rng.standard_normal(32)).tolist()}
            for i in range(4)]
    vecs += [{"vec_id": 4 + i, "embedding": rng.standard_normal(32).tolist()} for i in range(40)]
    vkey = lambda rows: sorted((r["vec_a"], r["vec_b"]) for r in rows)
    va = vkey(embedding_dup_pairs_lsh(ray.data.from_items(vecs), threshold=0.9,
                                      verify_mode="broadcast").take_all())
    vb = vkey(embedding_dup_pairs_lsh(ray.data.from_items(vecs), threshold=0.9,
                                      verify_mode="join").take_all())
    assert va == vb and len(va) == 6


def test_hash_join_semantics():
    """General shuffle equi-join: inner semantics, many-to-many cartesian
    within a key, unmatched keys dropped, right key column elided."""
    import ray.data
    from go_htmldate_ray.stages.joins import hash_join

    left = ray.data.from_items(
        [
            {"k": 1, "lv": "a"},
            {"k": 1, "lv": "b"},
            {"k": 2, "lv": "c"},
            {"k": 9, "lv": "z"},  # unmatched
        ]
    )
    right = ray.data.from_items(
        [
            {"rk": 1, "rv": 10},
            {"rk": 1, "rv": 11},
            {"rk": 2, "rv": 20},
            {"rk": 7, "rv": 70},  # unmatched
        ]
    )
    rows = hash_join(left, right, on="k", right_on="rk").take_all()
    got = sorted((r["k"], r["lv"], r["rv"]) for r in rows)
    assert got == [
        (1, "a", 10), (1, "a", 11), (1, "b", 10), (1, "b", 11), (2, "c", 20),
    ]
    assert set(rows[0]) == {"k", "lv", "rv"}


def test_asof_modes_equivalent():
    """Broadcast and co-partitioned as-of join paths return identical
    (event_id, o_orderkey) mappings."""
    from go_htmldate_ray.pipelines.streaming import asof_join_latest_order

    key = lambda rows: sorted((r["event_id"], r["o_orderkey"]) for r in rows)
    a = key(asof_join_latest_order(SF, mode="broadcast").take_all())
    b = key(asof_join_latest_order(SF, mode="copartition").take_all())
    assert a == b and len(a) > 0


def test_ivf_topk_recall_and_exactness():
    """IVF ANN: exact when probing every cell; high recall at n_probe=4
    of 16 on clustered data."""
    import numpy as np
    import ray.data
    from go_htmldate_ray.stages.similarity import brute_force_topk, ivf_topk

    rng = np.random.RandomState(5)
    centers = rng.standard_normal((8, 32)) * 3
    rows = []
    for i in range(400):
        c = centers[i % 8]
        rows.append({"vec_id": i, "embedding": (c + rng.standard_normal(32)).astype(np.float32).tolist()})
    mk = lambda: ray.data.from_items(rows)
    exact = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in brute_force_topk(mk(), query_ids=[0, 1, 2, 3], k=5).take_all()}
    full = {(r["query_id"], r["rank"]): r["neighbor_id"]
            for r in ivf_topk(mk(), query_ids=[0, 1, 2, 3], k=5,
                              n_centroids=16, n_probe=16).take_all()}
    assert full == exact  # probing all cells degenerates to exact

    approx = {}
    for r in ivf_topk(mk(), query_ids=[0, 1, 2, 3], k=5,
                      n_centroids=16, n_probe=4).take_all():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    exact_sets = {}
    for (q, _rank), n in exact.items():
        exact_sets.setdefault(q, set()).add(n)
    recall = sum(len(approx.get(q, set()) & s) for q, s in exact_sets.items()) / sum(
        len(s) for s in exact_sets.values()
    )
    assert recall >= 0.8, recall


def test_ngram_jaccard_pairs_exact():
    import ray.data
    from go_htmldate_ray.stages.dedup import ngram_jaccard_pairs

    base = " ".join(f"w{i}" for i in range(30))
    ds = ray.data.from_items(
        [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base + " extra"},
            {"doc_id": 3, "text": "totally different words here " * 6},
        ]
    )
    rows = ngram_jaccard_pairs(ds, n=3, max_doc_id=10, min_jaccard=0.5).take_all()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}
    # doc1 has 28 shingles, doc2 has 29, intersection 28 → 28/29
    assert set(got) == {(1, 2)}
    assert abs(got[(1, 2)] - 28 / 29) < 1e-6


def test_extract_stage_full_options_passthrough():
    """Regression: date_parser_config/custom_stages must reach the Ray
    extraction stage (the field-by-field Options rebuild dropped them)."""
    import pyarrow as pa
    from go_htmldate_ray.functions.kernels import DateParserConfig, Options
    from go_htmldate_ray.stages.extract_stage import HtmldateExtractor

    html = "<html><body><p>3 de março de 2020</p></body></html>".encode()
    batch = pa.table(
        {"url": pa.array([""]), "html": pa.array([html], pa.binary())}
    )
    opts = Options(
        use_original_date=True,
        skip_extensive_search=False,
        date_parser_config=DateParserConfig(languages=["pt"]),
    )
    out = HtmldateExtractor(options=opts)(batch)
    assert out.column("date_str").to_pylist() == ["2020-03-03"]
    # restricting to a locale without the month name loses the date
    opts2 = Options(
        use_original_date=True,
        skip_extensive_search=False,
        date_parser_config=DateParserConfig(languages=["fi"]),
    )
    out2 = HtmldateExtractor(options=opts2)(batch)
    assert out2.column("date_str").to_pylist() != ["2020-03-03"]


def test_minhash_ignores_empty_documents():
    """Regression: empty/whitespace docs must not pair as est-1.0 dups
    (all-zero signatures) — matches the SQL oracle's trim filter."""
    import ray.data
    from go_htmldate_ray.stages.dedup import minhash_lsh_pairs

    ds = ray.data.from_items(
        [
            {"doc_id": 1, "text": ""},
            {"doc_id": 2, "text": "   "},
            {"doc_id": 3, "text": "alpha beta gamma delta " * 10},
            {"doc_id": 4, "text": "alpha beta gamma delta " * 10},
        ]
    )
    pairs = {(p["doc_a"], p["doc_b"]) for p in minhash_lsh_pairs(ds).take_all()}
    assert pairs == {(3, 4)}


def test_host_extraction_no_path():
    """Regression: URLs without a path (or with uppercase schemes) must
    still yield their host."""
    import pyarrow as pa
    import pyarrow.compute as pc

    urls = pa.array(
        ["https://a.example.org", "HTTP://B.example/x", "https://c.example.org/p?q#f"]
    )
    hosts = pc.struct_field(
        pc.extract_regex(urls, r"^[A-Za-z][A-Za-z0-9+.\-]*://(?P<host>[^/?#]*)"),
        "host",
    ).to_pylist()
    assert hosts == ["a.example.org", "B.example", "c.example.org"]


def test_cjk_gated_by_language_restriction():
    from go_htmldate_ray.functions.kernels import DateParserConfig
    from go_htmldate_ray.functions.patterns import lenient_absolute_parse

    assert lenient_absolute_parse("2021年3月4日") is not None
    assert lenient_absolute_parse("2021年3月4日", DateParserConfig(languages=["pt"])) is None
    assert lenient_absolute_parse("2021年3月4日", DateParserConfig(languages=["ja"])) is not None
    # malformed CJK match falls through instead of aborting the parse
    assert lenient_absolute_parse("2021年31月40日") is None


def test_bmp_codec_roundtrip_and_features():
    """decode_bmp/encode_bmp are a REAL numpy-only codec: exact roundtrip
    (incl. row padding on odd widths), bottom-up vs top-down handling,
    and genuine decoded-pixel features — no injected fake anywhere."""
    import numpy as np

    from go_htmldate_ray.stages.multimodal import (
        bmp_image_features,
        bmp_resize,
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.RandomState(7)
    for h, w in [(5, 3), (4, 4), (7, 2), (1, 1)]:  # odd widths exercise padding
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img), (h, w)

    # hand-built top-down 32-bit BMP: 1x2, red above blue
    px = bytes([0, 0, 255, 0]) + bytes([255, 0, 0, 0])  # BGRA rows
    hdr = (b"BM" + (54 + len(px)).to_bytes(4, "little") + b"\0\0\0\0"
           + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
           + (1).to_bytes(4, "little", signed=True)
           + (-2).to_bytes(4, "little", signed=True)
           + (1).to_bytes(2, "little") + (32).to_bytes(2, "little")
           + (0).to_bytes(4, "little") + len(px).to_bytes(4, "little")
           + b"\0" * 16)
    img = decode_bmp(hdr + px)
    assert img.shape == (2, 1, 3)
    assert img[0, 0].tolist() == [255, 0, 0] and img[1, 0].tolist() == [0, 0, 255]

    # features: solid gray 4x2 → means 0.5ish, std 0, min=max
    solid = np.full((4, 2, 3), 128, dtype=np.uint8)
    f = bmp_image_features(encode_bmp(solid))
    assert f.shape == (8,)
    assert abs(f[2] - 128 / 255) < 1e-9 and f[5] == 0.0 and f[6] == f[7]

    # nearest-neighbor resize doubles pixels exactly
    img = np.array([[[10, 20, 30], [200, 210, 220]]], dtype=np.uint8)  # 1x2
    payload, w2, h2 = bmp_resize(encode_bmp(img), 4, 2)
    out = decode_bmp(payload)
    assert (w2, h2) == (4, 2) and out.shape == (2, 4, 3)
    assert np.array_equal(out[0, 0], img[0, 0]) and np.array_equal(out[0, 3], img[0, 1])

    import pytest

    for bad in (b"", b"BM" + b"\0" * 10, b"not a bmp at all" * 4):
        with pytest.raises(ValueError):
            decode_bmp(bad)


def test_bmp_kernels_through_ray_stages(ray_session):
    """A real tiny BMP flows through ImageDecodeStage / ImageResizeStage
    with the numpy BMP kernels — an actual decode path, not the fake."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from go_htmldate_ray.stages.multimodal import (
        ImageDecodeStage,
        ImageResizeStage,
        bmp_image_features,
        bmp_resize,
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.RandomState(3)
    imgs = [rng.randint(0, 256, size=(6, 5, 3), dtype=np.uint8) for _ in range(4)]
    tbl = pa.table(
        {
            "media_id": pa.array(range(4), pa.int64()),
            "payload": pa.array([encode_bmp(i) for i in imgs], pa.binary()),
            "media_type": pa.array(["image/bmp"] * 4, pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl)

    feats = ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"feature_fn": bmp_image_features},
        batch_format="pyarrow",
        batch_size=2,
        concurrency=1,
        num_cpus=1,
        max_restarts=0,
    ).take_all()
    assert len(feats) == 4
    by_id = {r["media_id"]: r["features"] for r in feats}
    for i, img in enumerate(imgs):
        expect = bmp_image_features(encode_bmp(img))
        assert np.allclose(by_id[i], expect)
        # sanity: features really derive from decoded pixels
        assert abs(by_id[i][2] - img[..., 0].mean() / 255.0) < 1e-9

    resized = ds.map_batches(
        ImageResizeStage,
        fn_constructor_kwargs={"width": 3, "height": 2, "resize_fn": bmp_resize},
        batch_format="pyarrow",
        batch_size=2,
        concurrency=1,
        num_cpus=1,
        max_restarts=0,
    ).take_all()
    assert len(resized) == 4
    for r in resized:
        out = decode_bmp(r["payload"])
        assert out.shape == (2, 3, 3) and (r["width"], r["height"]) == (3, 2)


def test_bucketed_join_randomized_vs_python(ray_session):
    """The hash-bucketed vectorized join must match a reference Python
    join on randomized data: duplicate keys on both sides (cartesian),
    unmatched keys on each side (inner semantics), many keys per bucket."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from go_htmldate_ray.stages.joins import attach_payload, hash_join

    rng = np.random.RandomState(11)
    lkeys = rng.randint(0, 300, size=2000)
    rkeys = rng.randint(150, 450, size=1500)  # half-overlapping key range
    left = ray.data.from_arrow(
        pa.table({"k": pa.array(lkeys, pa.int64()),
                  "lv": pa.array(rng.randint(0, 10**6, size=2000), pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array(rkeys, pa.int64()),
                  "rv": pa.array(rng.randint(0, 10**6, size=1500), pa.int64())})
    )
    got = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in hash_join(left, right, on="k", right_on="rk", n_buckets=16).take_all()
    )
    lrows = left.take_all()
    rrows = right.take_all()
    want = sorted(
        (l["k"], l["lv"], r["rv"])
        for l in lrows for r in rrows if l["k"] == r["rk"]
    )
    assert got == want

    # attach_payload: ≤1 lookup row per key, duplicate pair rows deduped
    lookup_tbl = pa.table(
        {
            "key": pa.array(range(0, 400, 2), pa.int64()),  # even keys only
            "payload": pa.array([f"p{k}".encode() for k in range(0, 400, 2)], pa.binary()),
        }
    )
    pair_keys = rng.randint(0, 400, size=3000)
    pairs_tbl = pa.table(
        {
            "k": pa.array(pair_keys, pa.int64()),
            "other": pa.array(pair_keys % 7, pa.int64()),  # duplicates abound
        }
    )
    out = attach_payload(
        ray.data.from_arrow(pairs_tbl),
        ray.data.from_arrow(lookup_tbl),
        key_col="k",
        out_col="pl",
        carry_cols={"k": pa.int64(), "other": pa.int64()},
        dedupe=True,
        n_buckets=16,
    ).take_all()
    got_t = sorted((r["k"], r["other"], bytes(r["pl"])) for r in out)
    want_t = sorted(
        {
            (int(k), int(k % 7), f"p{k}".encode())
            for k in pair_keys
            if k % 2 == 0
        }
    )
    assert got_t == want_t


def test_connected_components_vs_union_find(ray_session):
    """Distributed min-label propagation + pointer doubling must agree
    with a Python union-find on a random graph and a long chain (the
    worst case for plain propagation)."""
    import random

    import pyarrow as pa
    import ray.data

    from go_htmldate_ray.stages.dedup import connected_components

    random.seed(5)
    edges = [(random.randint(0, 199), random.randint(0, 199)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for n in {n for e in edges for n in e}:
        comp.setdefault(find(n), []).append(n)
    expect = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            expect[n] = m

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([a for a, _ in edges], pa.int64()),
                "doc_b": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    got = {r["doc_id"]: r["cluster_rep"] for r in connected_components(ds).take_all()}
    assert got == expect

    chain = [(i, i + 1) for i in range(30)]
    ds2 = ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([a for a, _ in chain], pa.int64()),
                "doc_b": pa.array([b for _, b in chain], pa.int64()),
            }
        )
    )
    got2 = {r["doc_id"]: r["cluster_rep"] for r in connected_components(ds2).take_all()}
    assert got2 == {i: 0 for i in range(31)}


def test_near_dup_clusters_consistent_with_pairs(ray_session):
    """Cluster labels must be consistent with the pair graph: every pair's
    two docs share a label, and each label is its cluster's min doc_id."""
    import ray.data

    from go_htmldate_ray.stages.dedup import minhash_lsh_pairs, near_dup_clusters
    from go_htmldate_ray.sources.io import read_parquet_clean

    sf = "/root/testdata/sf0.001"
    docs = read_parquet_clean(f"{sf}/documents.parquet")
    pairs = minhash_lsh_pairs(docs).take_all()
    labels = near_dup_clusters(read_parquet_clean(f"{sf}/documents.parquet"))
    lab = {r["doc_id"]: r["cluster_rep"] for r in labels.take_all()}
    assert lab, "fixture has near-dup pairs, clusters must be non-empty"
    for p in pairs:
        assert lab[p["doc_a"]] == lab[p["doc_b"]], p
    by_cluster = {}
    for n, l in lab.items():
        by_cluster.setdefault(l, []).append(n)
    for rep, members in by_cluster.items():
        assert rep == min(members)


def test_near_dup_keep_matches_clusters(ray_session):
    """keep must be 0 exactly for non-rep cluster members, 1 everywhere
    else, and cover every document exactly once."""
    from go_htmldate_ray.stages.dedup import near_dup_clusters, near_dup_keep
    from go_htmldate_ray.sources.io import read_parquet_clean

    sf = "/root/testdata/sf0.001"
    lab = {
        r["doc_id"]: r["cluster_rep"]
        for r in near_dup_clusters(
            read_parquet_clean(f"{sf}/documents.parquet")
        ).take_all()
    }
    keep = {
        r["doc_id"]: r["keep"]
        for r in near_dup_keep(read_parquet_clean(f"{sf}/documents.parquet")).take_all()
    }
    n_docs = read_parquet_clean(f"{sf}/documents.parquet").count()
    assert len(keep) == n_docs
    dropped = {d for d, k in keep.items() if k == 0}
    expected = {d for d, rep in lab.items() if d != rep}
    assert dropped == expected and expected, "fixture has dups to drop"


def test_distinct_users_by_type(ray_session):
    import duckdb

    from go_htmldate_ray.pipelines.analytics import distinct_users_by_type

    sf = "/root/testdata/sf0.001"
    got = {
        r["event_type"]: r["n_users"]
        for r in distinct_users_by_type(sf).take_all()
    }
    want = {
        t: n
        for t, n in duckdb.sql(
            f"SELECT event_type, count(DISTINCT user_id) FROM "
            f"read_parquet('{sf}/events.parquet') GROUP BY 1"
        ).fetchall()
    }
    assert got == want


def test_date_year_histogram_sums_to_dated_pages(ray_session):
    from go_htmldate_ray.pipelines.extract_dates import (
        date_year_histogram,
        extract_dates,
    )

    sf = "/root/testdata/sf0.001"
    hist = {r["year"]: r["n_pages"] for r in date_year_histogram(sf).take_all()}
    dates = [r["date_str"] for r in extract_dates(sf).take_all()]
    dated = [d for d in dates if d]
    assert sum(hist.values()) == len(dated)
    assert all(len(y) == 4 and y.isdigit() for y in hist)
    import collections

    want = collections.Counter(d[:4] for d in dated)
    assert hist == dict(want)


def test_deterministic_samplers(ray_session):
    """Samplers are pure functions of (id, seed): identical row sets on
    rerun, disjoint-ish across seeds, rate roughly honoured, and
    stratified rates actually differ per stratum."""
    import ray.data

    from go_htmldate_ray.sources.io import read_parquet_clean
    from go_htmldate_ray.stages.sampling import bernoulli_sample, stratified_sample

    sf = "/root/testdata/sf0.001"

    def ids(ds):
        return sorted(r["doc_id"] for r in ds.take_all())

    docs = lambda: read_parquet_clean(f"{sf}/documents.parquet")
    a = ids(bernoulli_sample(docs(), rate=0.3, seed=1))
    b = ids(bernoulli_sample(docs(), rate=0.3, seed=1))
    c = ids(bernoulli_sample(docs(), rate=0.3, seed=2))
    assert a == b  # deterministic
    assert a != c  # seed-sensitive
    n_total = docs().count()
    assert 0.15 * n_total < len(a) < 0.45 * n_total  # rate ±binomial noise

    # rate=1 keeps everything, rate=0 keeps nothing
    assert len(ids(bernoulli_sample(docs(), rate=1.0, seed=1))) == n_total
    assert len(ids(bernoulli_sample(docs(), rate=0.0, seed=1))) == 0

    strat = stratified_sample(
        docs(), strata_col="lang", rates={"en": 1.0}, default_rate=0.0, seed=3
    ).take_all()
    assert strat and all(r["lang"] == "en" for r in strat)
    n_en = sum(1 for r in docs().take_all() if r["lang"] == "en")
    assert len(strat) == n_en  # rate-1.0 stratum kept exactly


def test_top_tokens_vs_counter(ray_session):
    """Combiner + Sum-groupby + total-order top-k must equal a driver-side
    Counter over the same corpus, including the (n DESC, token ASC)
    tie-break."""
    from collections import Counter

    from go_htmldate_ray.sources.io import read_parquet_clean
    from go_htmldate_ray.stages.text_stage import top_tokens

    sf = "/root/testdata/sf0.001"
    docs = read_parquet_clean(f"{sf}/documents.parquet", columns=["text"])
    got = [(r["token"], r["n"]) for r in top_tokens(docs, k=20).take_all()]

    counts = Counter()
    for r in read_parquet_clean(f"{sf}/documents.parquet", columns=["text"]).take_all():
        counts.update((r["text"] or "").split())
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == want


def test_exact_quantiles_vs_numpy(ray_session):
    """Histogram-refinement selection must return the exact ceil(q*n)-rank
    element — including under forced refinement (tiny bin_row_cap) and
    massive duplicate pileups."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data

    from go_htmldate_ray.stages.quantiles import exact_quantiles

    rng = np.random.RandomState(13)
    vals = np.concatenate(
        [
            rng.lognormal(3, 1, size=5000),        # skewed tail
            np.full(2000, 7.125),                  # duplicate pileup
            rng.uniform(-50, 0, size=3000),
        ]
    )
    ds = ray.data.from_arrow(pa.table({"value": pa.array(vals, pa.float64())}))
    qs = [0.0, 0.1, 0.5, 0.62, 0.9, 0.999, 1.0]
    got = exact_quantiles(ds, "value", qs, n_bins=64, bin_row_cap=500)
    srt = np.sort(vals)
    n = len(vals)
    for q, v in zip(got["q"], got["value"]):
        want = srt[max(1, math.ceil(q * n)) - 1]
        assert v == want, (q, v, want)

    # empty dataset → typed empty frame
    empty = ray.data.from_arrow(pa.table({"value": pa.array([], pa.float64())}))
    out = exact_quantiles(empty, "value", [0.5])
    assert len(out) == 0 and list(out.columns) == ["q", "value"]


def test_anti_join_semantics():
    """Left anti-join: keep left rows with no key match in right; matched
    keys drop every duplicate; empty right keeps all; columns unchanged."""
    import ray.data
    from go_htmldate_ray.stages.joins import anti_join

    left = ray.data.from_items(
        [
            {"k": 1, "lv": "a"},
            {"k": 1, "lv": "b"},  # duplicate matched key: both drop
            {"k": 2, "lv": "c"},
            {"k": 9, "lv": "z"},  # unmatched: kept
        ]
    )
    right = ray.data.from_items(
        [{"rk": 1, "rv": 10}, {"rk": 1, "rv": 11}, {"rk": 2, "rv": 20},
         {"rk": 7, "rv": 70}]
    )
    rows = anti_join(left, right, on="k", right_on="rk").take_all()
    assert sorted((r["k"], r["lv"]) for r in rows) == [(9, "z")]
    assert set(rows[0]) == {"k", "lv"}

    empty_right = ray.data.from_items([{"rk": 99, "rv": 0}]).filter(
        lambda r: False
    )
    kept = anti_join(left, empty_right, on="k", right_on="rk").take_all()
    assert len(kept) == 4


def test_anti_join_randomized_vs_python(ray_session):
    """Randomized anti-join vs a Python set difference: duplicate keys on
    both sides, half-overlapping ranges, many keys per bucket."""
    import numpy as np
    import ray.data
    from go_htmldate_ray.stages.joins import anti_join

    rng = np.random.RandomState(23)
    lkeys = rng.randint(0, 300, size=2000)
    rkeys = rng.randint(150, 450, size=1500)
    left = ray.data.from_arrow(
        pa.table({"k": pa.array(lkeys, pa.int64()),
                  "lv": pa.array(np.arange(2000), pa.int64())})
    )
    right = ray.data.from_arrow(pa.table({"k": pa.array(rkeys, pa.int64())}))
    got = sorted(
        (r["k"], r["lv"])
        for r in anti_join(left, right, on="k", n_buckets=16).take_all()
    )
    rset = set(rkeys.tolist())
    want = sorted(
        (int(k), int(v)) for k, v in zip(lkeys, np.arange(2000))
        if int(k) not in rset
    )
    assert got == want and len(got) > 0


def test_new_docs_vs_snapshot():
    """Incremental dedup: today's rows whose exact text already exists in
    the snapshot drop; genuinely new texts survive."""
    import ray.data
    from go_htmldate_ray.stages.dedup import new_docs_vs_snapshot

    rows = [{"doc_id": i, "text": f"snapshot doc {i}"} for i in range(10)]
    rows += [
        {"doc_id": 100, "text": "snapshot doc 3"},   # dup of snapshot: drop
        {"doc_id": 101, "text": "snapshot doc 7"},   # dup of snapshot: drop
        {"doc_id": 102, "text": "fresh content A"},  # new: keep
        {"doc_id": 103, "text": "fresh content B"},  # new: keep
        {"doc_id": 104, "text": "fresh content A"},  # dup of today only: keep
    ]
    out = new_docs_vs_snapshot(
        ray.data.from_items(rows), snapshot_max_id=100
    ).take_all()
    assert sorted(r["doc_id"] for r in out) == [102, 103, 104]


def test_bm25_topk_vs_python_reference(ray_session):
    """Distributed BM25 matches a single-process reference with the same
    nano fixed-point rule on a randomized corpus; k bounds the output;
    all-absent query terms give a typed empty frame."""
    import math

    import numpy as np
    import ray.data
    from go_htmldate_ray.stages.search import bm25_topk

    rng = np.random.RandomState(37)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(300):
        n = rng.randint(3, 60)
        docs.append(" ".join(vocab[j] for j in rng.randint(0, 40, size=n)))
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(docs)]
    )
    terms, k1, b = ("w1", "w7", "w33"), 1.2, 0.75

    tok = [d.split() for d in docs]
    n_docs = len(docs)
    avgdl = sum(len(t) for t in tok) / n_docs
    dfs = {t: sum(1 for d in tok if t in d) for t in terms}
    idfs = {t: math.log((n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1)
            for t in terms if dfs[t] > 0}
    nanos = {}
    for i, d in enumerate(tok):
        nano = 0
        for t, idf in idfs.items():
            f = float(d.count(t))
            if f:
                contrib = idf * f * (k1 + 1) / (
                    f + k1 * (1 - b + b * len(d) / avgdl))
                nano += int(np.floor(contrib * 1e9 + 0.5))
        if nano:
            nanos[i] = nano
    want = sorted(nanos.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    got = bm25_topk(ds, terms, k=10, k1=k1, b=b)
    assert list(got["doc_id"]) == [i for i, _ in want]
    assert list(got["rank"]) == list(range(1, len(want) + 1))
    for s, (_, nano) in zip(got["score"], want):
        assert s == nano / 1e9

    missing = bm25_topk(ds, ("zz_not_in_corpus",), k=5)
    assert len(missing) == 0
    assert list(missing.columns) == ["rank", "doc_id", "score"]

    with pytest.raises(ValueError):
        bm25_topk(ds, ())


def test_inverted_index():
    """Posting rows carry exact tf and a per-term df stamped through the
    term-hash-bucket shuffle; empty/whitespace docs contribute nothing."""
    import ray.data
    from go_htmldate_ray.stages.search import build_inverted_index

    docs = [
        {"doc_id": 0, "text": "apple banana apple"},
        {"doc_id": 1, "text": "  banana   cherry "},
        {"doc_id": 2, "text": ""},
        {"doc_id": 3, "text": "   "},
        {"doc_id": 4, "text": "apple"},
    ]
    rows = build_inverted_index(ray.data.from_items(docs)).take_all()
    got = sorted((r["term"], r["doc_id"], r["tf"], r["df"]) for r in rows)
    assert got == [
        ("apple", 0, 2, 2),
        ("apple", 4, 1, 2),
        ("banana", 0, 1, 2),
        ("banana", 1, 1, 2),
        ("cherry", 1, 1, 1),
    ]


def test_dup_ngrams():
    """5-grams shared by >=2 docs are counted once per doc (within-doc
    repeats collapse); unique grams are dropped."""
    import ray.data
    from go_htmldate_ray.stages.cleaning import _hash63
    from go_htmldate_ray.stages.dedup import dup_ngrams

    shared = "one two three four five"
    docs = [
        {"doc_id": 0, "text": shared + " tail0"},
        {"doc_id": 1, "text": "head1 " + shared},
        # within-doc repeat of the shared gram: still one (gram, doc) pair
        {"doc_id": 2, "text": shared + " " + shared},
        {"doc_id": 3, "text": "totally different words here now okay"},
        {"doc_id": 4, "text": "short doc"},  # < 5 tokens: no grams
    ]
    rows = dup_ngrams(ray.data.from_items(docs), n=5, min_docs=2).take_all()
    by_hash = {r["ngram_hash"]: r["n_docs"] for r in rows}
    assert by_hash[_hash63(shared)] == 3
    # doc2's self-overlap grams ("five one two three four" etc.) appear
    # in only one doc; nothing from doc3/doc4 collides
    assert all(n >= 2 for n in by_hash.values())
    assert _hash63("totally different words here now") not in by_hash


def test_cap_per_group_vs_python(ray_session):
    """Salted two-phase quota matches the reference row_number()<=cap
    rule on randomized data with a mega-group (50% of all rows)."""
    import numpy as np
    import ray.data
    from go_htmldate_ray.stages.sampling import cap_per_group

    rng = np.random.RandomState(41)
    n = 4000
    groups = np.where(
        rng.rand(n) < 0.5, "mega", np.char.add("g", rng.randint(0, 40, n).astype(str))
    )
    ids = rng.permutation(n * 3)[:n]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "source": pa.array(groups.tolist(), pa.string())})
    )
    out = cap_per_group(
        ds, group_col="source", cap=7, salt_buckets=8
    ).take_all()
    got = sorted((r["source"], r["doc_id"]) for r in out)

    want = []
    for g in set(groups.tolist()):
        gids = sorted(int(i) for i, gg in zip(ids, groups) if gg == g)
        want.extend((g, i) for i in gids[:7])
    assert got == sorted(want)

    # cap larger than every group: identity (all rows kept)
    all_rows = cap_per_group(ds, group_col="source", cap=n + 1).take_all()
    assert len(all_rows) == n


def test_pagerank_small_graph_fast_path_parity(ray_session):
    """The bounded driver fast path replays the distributed loop's
    integer arithmetic BIT-EXACTLY — plain, seeded (TrustRank) and
    multi-vector modes — on a graph with phantom srcs/dsts (ids outside
    the node set) and dangling nodes."""
    import numpy as np
    import pyarrow as pa

    import ray.data
    from go_htmldate_ray.stages.graph import pagerank

    rng = np.random.RandomState(3)
    n, m = 400, 2500
    nodes = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(np.arange(n), pa.int64()),
                "seed": pa.array((np.arange(n) % 7 == 0).astype(np.int64)),
            }
        )
    )
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(rng.randint(0, n + 20, m), pa.int64()),
                "dst": pa.array(rng.randint(0, n + 20, m), pa.int64()),
            }
        )
    )

    def run(**kw):
        return {
            r["doc_id"]: r["rank_units"]
            for r in pagerank(nodes, edges, iters=5, **kw).take_all()
        }

    assert run() == run(small_graph_limit=0)  # plain
    assert run(seed_col="seed") == run(
        seed_col="seed", small_graph_limit=0
    )  # TrustRank

    # HITS shares the hybrid: hubs/authorities bit-exact across paths
    from go_htmldate_ray.stages.graph import hits

    def run_hits(**kw):
        return sorted(
            (r["doc_id"], r["hub_units"], r["auth_units"])
            for r in hits(nodes, edges, iters=2, **kw).take_all()
        )

    assert run_hits() == run_hits(small_graph_limit=0)


def test_pagerank_vs_python_reference(ray_session):
    """Integer fixed-point PageRank matches a single-process reference on
    a graph with a dangling node (mass dropped) and a node with no
    in-edges (teleport base only)."""
    import ray.data
    from go_htmldate_ray.stages.graph import pagerank

    # 0->1, 0->2, 1->2, 2->0, 3 dangling (no out), 4->2; nobody links 3, 4
    edge_list = [(0, 1), (0, 2), (1, 2), (2, 0), (4, 2)]
    node_ids = [0, 1, 2, 3, 4]
    nodes = ray.data.from_items([{"id": i} for i in node_ids])
    edges = ray.data.from_items([{"src": s, "dst": d} for s, d in edge_list])
    iters, total = 4, 10**15

    out = {r["doc_id"]: r["rank_units"]
           for r in pagerank(nodes, edges, iters=iters).take_all()}

    outdeg = {}
    for s, _ in edge_list:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(node_ids)
    base = (total * 15) // (100 * n)
    r = {i: total // n for i in node_ids}
    for _ in range(iters):
        nxt = {i: base for i in node_ids}
        for s, d in edge_list:
            nxt[d] += (r[s] * 85) // (100 * outdeg[s])
        r = nxt
    assert out == r
    # node 3 (dangling, no in-edges) and 4 (no in-edges) sit at base
    assert out[3] == base and out[4] == base

    # empty node set -> typed empty result
    none = pagerank(
        ray.data.from_items([{"id": 1}]).filter(lambda _: False),
        edges,
        iters=2,
    )
    assert none.count() == 0


def test_hll_registers_and_estimate(ray_session):
    """HLL sketch: estimate within ~3σ of true cardinality on 20k
    distinct values (σ = 1.04/√m ≈ 3.25% at p=10); duplicates don't
    move the registers; nulls are skipped; small range uses linear
    counting and is near-exact."""
    import numpy as np
    import ray.data
    from go_htmldate_ray.stages.sketches import hll_estimate, hll_registers

    true_n = 20_000
    vals = [f"value-{i}" for i in range(true_n)]
    ds = ray.data.from_items(
        [{"text": v} for v in vals]
        + [{"text": vals[i % 100]} for i in range(5000)]  # duplicates
        + [{"text": None}] * 50
    )
    regs = hll_registers(ds, col="text", p=10)
    est = hll_estimate(regs, p=10)
    assert abs(est - true_n) / true_n < 0.10

    # duplicates alone give the identical register table
    regs_dup = hll_registers(
        ray.data.from_items([{"text": vals[0]}, {"text": vals[0]}]),
        col="text",
        p=10,
    ).take_all()
    regs_one = hll_registers(
        ray.data.from_items([{"text": vals[0]}]), col="text", p=10
    ).take_all()
    assert regs_dup == regs_one and len(regs_one) == 1

    # small cardinality -> linear counting, near exact
    small = ray.data.from_items([{"text": f"s{i}"} for i in range(30)])
    est_small = hll_estimate(hll_registers(small, col="text", p=10), p=10)
    assert abs(est_small - 30) <= 2


def test_degree_histogram(ray_session):
    """In/out-degree histograms include zero-degree nodes and count
    varied degrees correctly."""
    import ray.data
    from go_htmldate_ray.stages.graph import degree_histogram

    nodes = ray.data.from_items([{"id": i} for i in range(6)])
    # in-degrees: 0->3, 1->1, 2->2, 3..5->0 ; out-degrees: 0:0,1:2,2:2,3:1,4:1,5:0
    edges = ray.data.from_items(
        [{"src": 1, "dst": 0}, {"src": 2, "dst": 0}, {"src": 3, "dst": 0},
         {"src": 4, "dst": 1}, {"src": 1, "dst": 2}, {"src": 2, "dst": 2}]
    )
    got_in = {r["degree"]: r["n_nodes"]
              for r in degree_histogram(nodes, edges, col="dst").take_all()}
    assert got_in == {0: 3, 1: 1, 2: 1, 3: 1}
    got_out = {r["degree"]: r["n_nodes"]
               for r in degree_histogram(nodes, edges, col="src").take_all()}
    assert got_out == {0: 2, 1: 2, 2: 2}


def test_graph_ops_drop_phantom_edge_endpoints(ray_session):
    """Edge endpoints absent from the node set must not create rank or
    histogram rows (the SQL oracles restrict every round to real node
    ids via LEFT JOIN — the engine has to agree)."""
    import ray.data
    from go_htmldate_ray.stages.graph import degree_histogram, pagerank

    nodes = ray.data.from_items([{"id": i} for i in range(3)])
    # dst=99 and src=98 are NOT nodes
    edges = ray.data.from_items(
        [{"src": 0, "dst": 1}, {"src": 0, "dst": 99}, {"src": 98, "dst": 2}]
    )
    ranks = pagerank(nodes, edges, iters=3).take_all()
    assert sorted(r["doc_id"] for r in ranks) == [0, 1, 2]

    # reference: same integer rule restricted to real nodes; 0 has
    # outdeg 2 (the phantom edge still splits its mass), src 98's
    # contribution to node 2 is dropped with the phantom src's rank row
    total, n = 10**15, 3
    base = (total * 15) // (100 * n)
    r = {i: total // n for i in range(3)}
    for _ in range(3):
        nxt = {i: base for i in range(3)}
        nxt[1] += (r[0] * 85) // (100 * 2)
        r = nxt
    assert {x["doc_id"]: x["rank_units"] for x in ranks} == r

    hist_in = {r["degree"]: r["n_nodes"]
               for r in degree_histogram(nodes, edges, col="dst").take_all()}
    # in-degrees over real nodes only: 0:0, 1:1, 2:1 (99 excluded)
    assert hist_in == {0: 1, 1: 2}
    hist_out = {r["degree"]: r["n_nodes"]
                for r in degree_histogram(nodes, edges, col="src").take_all()}
    # out-degrees: 0:2, 1:0, 2:0 (98 excluded)
    assert hist_out == {0: 2, 2: 1}


def test_bigram_collocations_vs_python(ray_session):
    """PMI collocations match a single-process reference (same nano
    rule) on a corpus with a planted strong collocation."""
    import math
    from collections import Counter

    import numpy as np
    import ray.data
    from go_htmldate_ray.stages.text_stage import bigram_collocations

    rng = np.random.RandomState(5)
    vocab = [f"t{i}" for i in range(30)]
    docs = []
    for i in range(200):
        toks = [vocab[j] for j in rng.randint(0, 30, size=rng.randint(5, 40))]
        if i % 3 == 0:
            # plant "san francisco" so a high-PMI pair exists
            pos = rng.randint(0, len(toks))
            toks[pos:pos] = ["san", "francisco"]
        docs.append(" ".join(toks))
    ds = ray.data.from_items([{"text": t} for t in docs], override_num_blocks=4)
    k, mc = 10, 4

    uni: Counter = Counter()
    bi: Counter = Counter()
    tu = tb = 0
    for d in docs:
        toks = d.split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
        tu += len(toks)
        tb += max(0, len(toks) - 1)
    scored = []
    for (x, y), c in bi.items():
        if c < mc:
            continue
        nano = int(math.floor(
            math.log(float(c * tu * tu) / float(tb * uni[x] * uni[y])) * 1e9 + 0.5))
        scored.append((x, y, c, nano))
    scored.sort(key=lambda r: (-r[3], r[0], r[1]))
    want = scored[:k]

    got = bigram_collocations(ds, k=k, min_count=mc)
    assert list(zip(got["x"], got["y"], got["n_xy"])) == [
        (x, y, c) for x, y, c, _ in want
    ]
    for s, (_, _, _, nano) in zip(got["score"], want):
        assert s == nano / 1e9
    assert (got["x"][0], got["y"][0]) == ("san", "francisco")


def test_weighted_sample_vs_python(ray_session):
    """Efraimidis-Spirakis sample matches the single-process ranking;
    higher-weight rows win more often; zero/negative weights excluded;
    deterministic across runs."""
    import math

    import numpy as np
    import ray.data
    from go_htmldate_ray.stages.sampling import _keep_hash, weighted_sample

    rng = np.random.RandomState(3)
    n = 500
    weights = rng.randint(1, 1000, size=n).tolist()
    weights[7] = 0    # excluded
    weights[9] = -5   # excluded
    rows = [{"doc_id": i, "w": weights[i]} for i in range(n)]
    ds = ray.data.from_items(rows, override_num_blocks=8)
    k, seed = 25, 11

    ref = []
    for i, w in enumerate(weights):
        if w <= 0:
            continue
        u = float(_keep_hash(seed, i) + 1) / float(1 << 63)
        ref.append((int(math.floor(math.log(u) / float(w) * 1e9 + 0.5)), i))
    ref.sort(key=lambda t: (-t[0], t[1]))
    want = [i for _, i in ref[:k]]

    got = weighted_sample(ds, weight_col="w", k=k, seed=seed)
    assert list(got["doc_id"]) == want
    assert list(got["rank"]) == list(range(1, k + 1))
    again = weighted_sample(ds, weight_col="w", k=k, seed=seed)
    assert list(again["doc_id"]) == want

    # weight sensitivity: a huge-weight row nearly always makes the cut
    rows2 = [{"doc_id": i, "w": 1} for i in range(200)] + [
        {"doc_id": 999, "w": 10**9}
    ]
    got2 = weighted_sample(
        ray.data.from_items(rows2, override_num_blocks=4), weight_col="w", k=5, seed=2
    )
    assert 999 in list(got2["doc_id"])


def test_countmin_sketch(ray_session):
    """Count-Min never undercounts, is exact for tokens with no
    collisions at this width, and the sketch is one Sum groupby over
    light cell rows."""
    from collections import Counter

    import ray.data
    from go_htmldate_ray.stages.sketches import countmin_estimate, countmin_sketch

    docs = [
        "apple banana apple cherry",
        "banana banana durian",
        "apple elderberry",
        "",
    ] * 10
    ds = ray.data.from_items(
        [{"text": t} for t in docs], override_num_blocks=4
    )
    sketch = countmin_sketch(ds, col="text", depth=4, width=256).take_all()

    truth: Counter = Counter()
    for t in docs:
        truth.update(t.split())
    for tok, c in truth.items():
        est = countmin_estimate(sketch, tok, depth=4, width=256)
        assert est >= c  # CM guarantee: never under
    # 5 distinct tokens in 256 columns: no collisions, estimates exact
    assert all(
        countmin_estimate(sketch, tok, depth=4, width=256) == c
        for tok, c in truth.items()
    )
    assert countmin_estimate(sketch, "never-seen", depth=4, width=256) == 0


def test_pnm_codec_and_dispatch():
    """decode_pnm handles P6/P5 binary and P3/P2 ASCII (with comments and
    maxval rescale); encode_ppm roundtrips exactly; decode_image sniffs
    BMP vs netpbm; features flow through ImageDecodeStage."""
    import numpy as np
    import pytest
    import ray.data
    from go_htmldate_ray.stages.multimodal import (
        ImageDecodeStage,
        decode_image,
        decode_pnm,
        encode_bmp,
        encode_ppm,
        pnm_image_features,
    )

    rng = np.random.RandomState(13)
    for h, w in [(3, 5), (1, 1), (4, 2)]:
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_pnm(encode_ppm(img)), img), (h, w)

    # ASCII P3 with a comment line
    p3 = b"P3\n# a comment\n2 1\n255\n255 0 0  0 0 255\n"
    img = decode_pnm(p3)
    assert img.shape == (1, 2, 3)
    assert img[0, 0].tolist() == [255, 0, 0] and img[0, 1].tolist() == [0, 0, 255]

    # P5 grayscale broadcast to RGB; maxval 15 rescales 15 -> 255
    p5 = b"P5\n2 1\n15\n" + bytes([15, 0])
    g = decode_pnm(p5)
    assert g[0, 0].tolist() == [255, 255, 255] and g[0, 1].tolist() == [0, 0, 0]

    # P2 ASCII grayscale
    p2 = b"P2\n1 2\n255\n128\n64\n"
    g2 = decode_pnm(p2)
    assert g2.shape == (2, 1, 3) and g2[0, 0, 0] == 128 and g2[1, 0, 0] == 64

    # sniffing dispatch: BMP bytes -> BMP path, PPM bytes -> PNM path
    img = rng.randint(0, 256, size=(2, 2, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_bmp(img)), img)
    assert np.array_equal(decode_image(encode_ppm(img)), img)

    for bad in (b"", b"P9\n1 1\n255\nX", b"P6\n2 2\n255\nxx",
                b"P6\n0 1\n255\n", b"P6\n1 1\n70000\n"):
        with pytest.raises(ValueError):
            decode_pnm(bad)

    # through the actor stage with the real PNM kernel
    solid = np.full((2, 3, 3), 200, dtype=np.uint8)
    ds = ray.data.from_items(
        [{"media_id": 1, "media_type": "image", "payload": encode_ppm(solid)}]
    )
    out = ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"feature_fn": pnm_image_features},
        batch_format="pyarrow",
        batch_size=8,
        concurrency=1,
    ).take_all()
    assert len(out) == 1
    feats = out[0]["features"]
    assert abs(feats[2] - 200 / 255) < 1e-9 and feats[5] == 0.0


def test_png_codec_roundtrip_filters_and_color_types():
    """encode_png → decode_png is exact for every filter type and for
    gray/RGB/RGBA inputs; hand-built palette and gray+alpha PNGs decode;
    malformed payloads raise; decode_image sniffs PNG."""
    import zlib

    import numpy as np
    import pytest
    from go_htmldate_ray.stages.multimodal import (
        _PNG_SIG,
        decode_image,
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(29)
    # each filter type alone, then all five cycling, across geometries
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        for h, w in [(1, 1), (3, 5), (7, 9), (4, 2)]:
            img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            got = decode_png(encode_png(img, row_filters=filters))
            assert np.array_equal(got, img), (filters, h, w)

    # grayscale (1ch) broadcasts; RGBA drops alpha
    g = rng.randint(0, 256, size=(3, 4, 1), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(g)), np.repeat(g, 3, axis=2))
    rgba = rng.randint(0, 256, size=(2, 3, 4), dtype=np.uint8)
    assert np.array_equal(
        decode_png(encode_png(rgba, row_filters=[4])), rgba[:, :, :3]
    )

    def chunk(typ, data):
        return (
            len(data).to_bytes(4, "big")
            + typ
            + data
            + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    # hand-built palette PNG: 2x2, palette [red, green, blue]
    ihdr = (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([8, 3, 0, 0, 0])
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raster = zlib.compress(bytes([0, 0, 1]) + bytes([0, 2, 0]))  # rows: filt+2px
    pal_png = (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", raster)
        + chunk(b"IEND", b"")
    )
    img = decode_png(pal_png)
    assert img[0, 0].tolist() == [255, 0, 0] and img[0, 1].tolist() == [0, 255, 0]
    assert img[1, 0].tolist() == [0, 0, 255] and img[1, 1].tolist() == [255, 0, 0]

    # gray+alpha (color type 4): alpha dropped, gray broadcast
    ihdr4 = (1).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([8, 4, 0, 0, 0])
    raster4 = zlib.compress(bytes([0, 77, 255]) + bytes([0, 200, 0]))
    ga_png = (
        _PNG_SIG + chunk(b"IHDR", ihdr4) + chunk(b"IDAT", raster4) + chunk(b"IEND", b"")
    )
    ga = decode_png(ga_png)
    assert ga.shape == (2, 1, 3)
    assert ga[0, 0].tolist() == [77, 77, 77] and ga[1, 0].tolist() == [200, 200, 200]

    # sniffing dispatch
    img = rng.randint(0, 256, size=(2, 2, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(img)), img)

    good = encode_png(img)

    def with_ihdr(ihdr_tail):  # 2x2 header + a syntactically-fine IDAT
        ihdr = (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + ihdr_tail
        return (
            _PNG_SIG
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
            + chunk(b"IEND", b"")
        )

    for bad in (
        b"",
        b"\x89PNG\r\n\x1a\nnot-chunks",
        good[:30],  # truncated chunk
        with_ihdr(bytes([16, 2, 0, 0, 0])),  # 16-bit depth
        with_ihdr(bytes([8, 2, 0, 0, 1])),  # interlaced
        with_ihdr(bytes([8, 7, 0, 0, 0])),  # unknown color type
    ):
        with pytest.raises(ValueError):
            decode_png(bad)


def test_png_default_stage_kernels_and_resize(ray_session):
    """The stage defaults are now REAL kernels: ImageDecodeStage with no
    injected fn extracts genuine features from PNG bytes, and
    ImageResizeStage re-encodes a decodable PNG at the target geometry."""
    import numpy as np
    import ray.data
    from go_htmldate_ray.stages.multimodal import (
        ImageDecodeStage,
        ImageResizeStage,
        decode_png,
        encode_png,
    )

    solid = np.full((4, 6, 3), 120, dtype=np.uint8)
    ds = ray.data.from_items(
        [{"media_id": 7, "media_type": "image", "payload": encode_png(solid, row_filters=[2])}]
    )
    out = ds.map_batches(
        ImageDecodeStage, batch_format="pyarrow", batch_size=8, concurrency=1
    ).take_all()
    assert len(out) == 1
    feats = out[0]["features"]
    assert abs(feats[0] - 6 / 4096) < 1e-12 and abs(feats[1] - 4 / 4096) < 1e-12
    assert abs(feats[2] - 120 / 255) < 1e-9 and feats[5] == 0.0

    resized = ray.data.from_items(
        [{"media_id": 7, "payload": encode_png(solid)}]
    ).map_batches(
        ImageResizeStage,
        fn_constructor_kwargs={"width": 3, "height": 2},
        batch_format="pyarrow",
        batch_size=8,
        concurrency=1,
    ).take_all()
    assert resized[0]["width"] == 3 and resized[0]["height"] == 2
    back = decode_png(resized[0]["payload"])
    assert back.shape == (2, 3, 3) and (back == 120).all()


def test_bpe_token_count_batch():
    """BPE-ish pre-tokenizer counts match hand-derivable pieces:
    contractions split off, letter/digit/symbol runs each one piece,
    whitespace runs one piece."""
    import pyarrow as pa
    from go_htmldate_ray.stages.text_stage import bpe_token_count_batch

    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "it's over-the dog",  # it|'s| over|-|the| dog = 6
                    "abc123 !!",           # abc|123| !! = 3
                    "",
                    None,
                ],
                pa.string(),
            ),
        }
    )
    out = bpe_token_count_batch(batch)
    assert out.column("n_bpe_tokens").to_pylist() == [6, 3, 0, 0]
    assert out.column("n_tokens").to_pylist() == [3, 2, 0, 0]


def test_left_join_semantics(ray_session):
    """how='left': unmatched left rows survive with typed nulls; matched
    keys behave exactly like the inner join; randomized equivalence with
    a Python reference."""
    import numpy as np
    import ray.data
    from go_htmldate_ray.stages.joins import hash_join

    left = ray.data.from_items(
        [{"k": 1, "lv": "a"}, {"k": 1, "lv": "b"}, {"k": 2, "lv": "c"},
         {"k": 9, "lv": "z"}]
    )
    right = ray.data.from_items(
        [{"rk": 1, "rv": 10}, {"rk": 1, "rv": 11}, {"rk": 2, "rv": 20},
         {"rk": 7, "rv": 70}]
    )
    rows = hash_join(left, right, on="k", right_on="rk", how="left").take_all()
    got = sorted((r["k"], r["lv"], r["rv"]) for r in rows)
    assert got == [
        (1, "a", 10), (1, "a", 11), (1, "b", 10), (1, "b", 11),
        (2, "c", 20), (9, "z", None),
    ]

    # empty right side (typed — a fn-filtered empty Dataset loses its
    # schema, the known Ray empty-block gotcha): all left rows, null rv
    empty_right = ray.data.from_arrow(
        pa.table({"rk": pa.array([], pa.int64()), "rv": pa.array([], pa.int64())})
    )
    rows2 = hash_join(left, empty_right, on="k", right_on="rk", how="left").take_all()
    assert sorted(r["k"] for r in rows2) == [1, 1, 2, 9]
    assert all(r["rv"] is None for r in rows2)

    rng = np.random.RandomState(31)
    lkeys = rng.randint(0, 200, size=1000)
    rkeys = rng.randint(100, 300, size=800)
    lds = ray.data.from_arrow(
        pa.table({"k": pa.array(lkeys, pa.int64()),
                  "lv": pa.array(np.arange(1000), pa.int64())})
    )
    rds = ray.data.from_arrow(
        pa.table({"rk": pa.array(rkeys, pa.int64()),
                  "rv": pa.array(np.arange(800), pa.int64())})
    )
    got = sorted(
        (r["k"], r["lv"], r["rv"] if r["rv"] is not None else -1)
        for r in hash_join(lds, rds, on="k", right_on="rk",
                           n_buckets=16, how="left").take_all()
    )
    rmap: dict = {}
    for k, v in zip(rkeys.tolist(), range(800)):
        rmap.setdefault(k, []).append(v)
    want = []
    for k, v in zip(lkeys.tolist(), range(1000)):
        if k in rmap:
            want.extend((k, v, rv) for rv in rmap[k])
        else:
            want.append((k, v, -1))
    assert got == sorted(want)

    import pytest
    with pytest.raises(ValueError):
        hash_join(left, right, on="k", right_on="rk", how="right")


def test_full_join_semantics(ray_session):
    """how='full': unmatched rows from BOTH sides survive; right-only
    rows carry their key in the left key column (USING semantics)."""
    import ray.data
    from go_htmldate_ray.stages.joins import hash_join

    left = ray.data.from_items(
        [{"k": 1, "lv": "a"}, {"k": 2, "lv": "c"}, {"k": 9, "lv": "z"}]
    )
    right = ray.data.from_items(
        [{"rk": 1, "rv": 10}, {"rk": 2, "rv": 20}, {"rk": 7, "rv": 70}]
    )
    rows = hash_join(left, right, on="k", right_on="rk", how="full").take_all()
    got = sorted((r["k"], r["lv"], r["rv"]) for r in rows)
    assert got == [
        (1, "a", 10), (2, "c", 20), (7, None, 70), (9, "z", None),
    ]

    # one side empty: the other side passes through whole
    empty_left = ray.data.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "lv": pa.array([], pa.string())})
    )
    rows2 = hash_join(empty_left, right, on="k", right_on="rk", how="full").take_all()
    assert sorted((r["k"], r["rv"]) for r in rows2) == [(1, 10), (2, 20), (7, 70)]
    assert all(r["lv"] is None for r in rows2)


def test_range_join_vs_bruteforce(ray_session):
    """Randomized micro-corpus: range_join == O(n·m) reference, across
    grid sizes (replication factors) and boundary conditions."""
    import numpy as np
    import ray.data

    from go_htmldate_ray.stages.joins import range_join

    rng = np.random.default_rng(7)
    n_pts, n_iv = 400, 60
    ts = rng.integers(0, 10_000, n_pts) * 1_000_000
    starts = rng.integers(0, 9_000, n_iv) * 1_000_000
    widths = rng.integers(0, 2_000, n_iv) * 1_000_000  # incl. zero-width
    left = pa.table(
        {
            "pid": pa.array(np.arange(n_pts), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    right = pa.table(
        {
            "iid": pa.array(np.arange(n_iv), pa.int64()),
            "s": pa.array(starts, pa.timestamp("us")),
            "e": pa.array(starts + widths, pa.timestamp("us")),
        }
    )
    expect = {
        (int(p), int(i))
        for p in range(n_pts)
        for i in range(n_iv)
        if starts[i] <= ts[p] < starts[i] + widths[i]
    }
    for grid_s in (100, 1500, 20_000):  # tiny grid = heavy replication
        got = range_join(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            left_ts="ts",
            right_start="s",
            right_end="e",
            grid_us=grid_s * 1_000_000,
            n_buckets=8,
        ).take_all()
        assert {(r["pid"], r["iid"]) for r in got} == expect
        assert len(got) == len(expect)  # no duplicate emissions


def test_range_join_boundaries(ray_session):
    import ray.data

    from go_htmldate_ray.stages.joins import range_join

    us = 1_000_000
    left = pa.table(
        {
            "pid": pa.array([0, 1, 2, 3], pa.int64()),
            # exactly at start (in), exactly at end (out), inside, far out
            "ts": pa.array([10 * us, 20 * us, 15 * us, 99 * us], pa.timestamp("us")),
        }
    )
    right = pa.table(
        {
            "iid": pa.array([7], pa.int64()),
            "s": pa.array([10 * us], pa.timestamp("us")),
            "e": pa.array([20 * us], pa.timestamp("us")),
        }
    )
    got = range_join(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right),
        left_ts="ts",
        right_start="s",
        right_end="e",
        grid_us=3 * us,  # interval spans 4 cells
        n_buckets=4,
    ).take_all()
    assert {(r["pid"], r["iid"]) for r in got} == {(0, 7), (2, 7)}


def test_interval_overlap_join_vs_bruteforce(ray_session):
    """Randomized: interval_overlap_join == O(n·m) reference across grid
    sizes; exactly-once emission; empty spans match nothing."""
    import numpy as np
    import ray.data

    from go_htmldate_ray.stages.joins import interval_overlap_join

    rng = np.random.default_rng(11)
    n_l, n_r = 150, 80
    us = 1_000_000
    ls = rng.integers(0, 5_000, n_l) * us
    lw = rng.integers(0, 900, n_l) * us  # incl. zero-width (match nothing)
    rs = rng.integers(0, 5_000, n_r) * us
    rw = rng.integers(1, 700, n_r) * us
    left = pa.table(
        {
            "lid": pa.array(np.arange(n_l), pa.int64()),
            "s1": pa.array(ls, pa.timestamp("us")),
            "e1": pa.array(ls + lw, pa.timestamp("us")),
        }
    )
    right = pa.table(
        {
            "rid": pa.array(np.arange(n_r), pa.int64()),
            "s2": pa.array(rs, pa.timestamp("us")),
            "e2": pa.array(rs + rw, pa.timestamp("us")),
        }
    )
    expect = {
        (int(i), int(j))
        for i in range(n_l)
        for j in range(n_r)
        if lw[i] > 0 and ls[i] < rs[j] + rw[j] and rs[j] < ls[i] + lw[i]
    }
    for grid_s in (50, 700, 10_000):
        got = interval_overlap_join(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            left_start="s1",
            left_end="e1",
            right_start="s2",
            right_end="e2",
            grid_us=grid_s * us,
            n_buckets=8,
        ).take_all()
        assert {(r["lid"], r["rid"]) for r in got} == expect
        assert len(got) == len(expect)  # first-shared-cell rule: no dups


def test_pq_topk_recall_and_determinism(ray_session):
    from go_htmldate_ray.sources.io import read_parquet_clean
    from go_htmldate_ray.stages.similarity import brute_force_topk, pq_topk

    ds = read_parquet_clean("/root/testdata/sf0.001/embeddings.parquet")
    qids = list(range(8))
    exact = {}
    for r in brute_force_topk(ds, qids, k=5).take_all():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got = {}
    for r in pq_topk(ds, qids, k=5, m=16, n_codes=64).take_all():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    assert set(got) == set(exact)
    assert all(len(v) == 5 for v in got.values())
    # compressed scan keeps useful recall on the smooth fixture
    recall = sum(len(got[q] & exact[q]) for q in exact) / (5 * len(exact))
    assert recall >= 0.4, recall

    # deterministic across runs (fixed seeds + rounded ADC ties)
    again = {}
    for r in pq_topk(ds, qids, k=5, m=16, n_codes=64).take_all():
        again.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert again == got

    # more codes -> at least comparable recall (sanity of the trainer)
    finer = {}
    for r in pq_topk(ds, qids, k=5, m=16, n_codes=128).take_all():
        finer.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recall_finer = sum(len(finer[q] & exact[q]) for q in exact) / (5 * len(exact))
    assert recall_finer >= recall - 0.1, (recall, recall_finer)


def test_interval_joins_pre_epoch_timestamps(ray_session):
    """Floor-division consistency: spans/points before 1970 (negative
    epoch-µs) must join exactly like positive ones."""
    import numpy as np
    import ray.data

    from go_htmldate_ray.stages.joins import interval_overlap_join, range_join

    day = 86_400 * 1_000_000
    # left spans centered around the epoch, incl. fully-negative ones
    ls = np.array([-3, -2, -1, 0, 1]) * day + day // 4
    lw = np.array([1, 1, 1, 1, 1]) * day // 2
    rs = np.array([-3, -1, 0]) * day
    rw = np.array([2, 1, 2]) * day
    left = pa.table(
        {
            "lid": pa.array(np.arange(5), pa.int64()),
            "s1": pa.array(ls, pa.timestamp("us")),
            "e1": pa.array(ls + lw, pa.timestamp("us")),
        }
    )
    right = pa.table(
        {
            "rid": pa.array(np.arange(3), pa.int64()),
            "s2": pa.array(rs, pa.timestamp("us")),
            "e2": pa.array(rs + rw, pa.timestamp("us")),
        }
    )
    expect = {
        (i, j)
        for i in range(5)
        for j in range(3)
        if ls[i] < rs[j] + rw[j] and rs[j] < ls[i] + lw[i]
    }
    got = interval_overlap_join(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right),
        left_start="s1",
        left_end="e1",
        right_start="s2",
        right_end="e2",
        grid_us=day,
        n_buckets=4,
    ).take_all()
    assert {(r["lid"], r["rid"]) for r in got} == expect
    assert len(got) == len(expect)

    # point-in-interval with negative point timestamps
    pts = pa.table(
        {
            "pid": pa.array(np.arange(5), pa.int64()),
            "ts": pa.array(ls, pa.timestamp("us")),
        }
    )
    expect_pts = {
        (i, j)
        for i in range(5)
        for j in range(3)
        if rs[j] <= ls[i] < rs[j] + rw[j]
    }
    got_pts = range_join(
        ray.data.from_arrow(pts),
        ray.data.from_arrow(right),
        left_ts="ts",
        right_start="s2",
        right_end="e2",
        grid_us=day,
        n_buckets=4,
    ).take_all()
    assert {(r["pid"], r["rid"]) for r in got_pts} == expect_pts


def test_anchor_text_summary_tiebreak_and_distinct(ray_session):
    """Multiple distinct anchor strings for one target: counts, distinct
    count, and the (-count, lexicographic) top-anchor tie-break."""
    import ray

    from go_htmldate_ray.pipelines.extract_dates import anchor_summary_from_pages

    def page(links):
        body = "".join(f'<a href="{h}">{t}</a>' for h, t in links)
        return f"<html><body>{body}</body></html>".encode()

    rows = [
        # 3 anchors to /a: 'zeta' x2, 'alpha' x1 -> top 'zeta'
        {"html": page([("https://x.org/a", "zeta"), ("https://x.org/a", "alpha")])},
        {"html": page([("https://x.org/a", "zeta")])},
        # 2 anchors to /b with EQUAL counts: 'beta' and 'alpha' -> tie ->
        # lexicographically smallest wins
        {"html": page([("https://x.org/b", "beta"), ("https://x.org/b", "alpha")])},
        # whitespace normalization inside anchor text
        {"html": page([("https://x.org/c", "  spaced   out ")])},
        {"html": b"<html><body><a>no href dropped</a></body></html>"},
    ]
    out = {
        r["dst_url"]: r
        for r in anchor_summary_from_pages(ray.data.from_items(rows)).take_all()
    }
    assert out["https://x.org/a"]["n_inlinks"] == 3
    assert out["https://x.org/a"]["n_anchor_texts"] == 2
    assert out["https://x.org/a"]["top_anchor"] == "zeta"
    assert out["https://x.org/b"]["n_inlinks"] == 2
    assert out["https://x.org/b"]["top_anchor"] == "alpha"
    assert out["https://x.org/c"]["top_anchor"] == "spaced out"
    assert set(out) == {"https://x.org/a", "https://x.org/b", "https://x.org/c"}


def test_resolve_pointers_randomized_vs_python_walk(ray_session):
    """Path doubling on a random functional graph == a per-node Python
    walk (terminals are self-loops; chains bounded by construction)."""
    import random

    import ray

    from go_htmldate_ray.stages.graph import resolve_pointers

    rng = random.Random(42)
    n = 400
    # terminals: every 10th node; others point at a strictly smaller id,
    # so every chain terminates (max possible chain length < n)
    nxt = {}
    for i in range(n):
        nxt[i] = i if i % 10 == 0 else rng.randrange(0, i)

    def walk(i):
        hops = 0
        while nxt[i] != i:
            i = nxt[i]
            hops += 1
        return i, hops

    expected = {i: walk(i) for i in range(n)}
    max_chain = max(h for _, h in expected.values())
    assert max_chain >= 3  # the fixture actually exercises doubling

    ds = ray.data.from_items(
        [{"src": i, "next": nxt[i]} for i in range(n)]
    )
    out = resolve_pointers(ds, max_chain=max(2, max_chain)).take_all()
    assert len(out) == n
    for r in out:
        fin, hops = expected[r["src"]]
        assert (r["final"], r["hops"]) == (fin, hops), r

    # chains longer than max_chain: pointer stops at the 2^rounds-th
    # ancestor (documented contract) — with max_chain=2 (1 round... 
    # ceil(log2(2))=1 round) a 3-hop chain is only 2 hops advanced
    chain = ray.data.from_items(
        [
            {"src": 0, "next": 0},
            {"src": 1, "next": 0},
            {"src": 2, "next": 1},
            {"src": 3, "next": 2},
        ]
    )
    short = {r["src"]: r for r in resolve_pointers(chain, max_chain=2).take_all()}
    assert short[3]["hops"] == 2 and short[3]["final"] == 1
    full = {r["src"]: r for r in resolve_pointers(chain, max_chain=4).take_all()}
    assert full[3]["hops"] == 3 and full[3]["final"] == 0


def test_remove_dup_spans_planted_and_modes_equivalent(ray_session):
    """Planted cross-doc 5-gram is cut from BOTH docs (overlapping
    coverage union, not per-gram), unique text survives, and the
    broadcast and join modes produce identical tables."""
    import ray

    from go_htmldate_ray.stages.dedup import remove_dup_spans

    boiler = "subscribe to our newsletter for daily updates today"  # 8 toks
    rows = [
        # boilerplate at the START
        {"doc_id": 0, "text": f"{boiler} alpha beta gamma delta epsilon zeta"},
        # same boilerplate MID-DOC: every 5-gram of the 8-token run is
        # duplicated, so the union covers all 8 tokens
        {"doc_id": 1, "text": f"unique one two three four five {boiler} tail tokens here again"},
        # no duplication: survives untouched (but whitespace-normalized)
        {"doc_id": 2, "text": "  totally   original musing\non nothing shared  "},
        {"doc_id": 3, "text": ""},
        {"doc_id": 4, "text": "short"},
    ]
    ds = ray.data.from_items(rows)

    out = {
        r["doc_id"]: r
        for r in remove_dup_spans(ds, n=5, min_docs=2, mode="broadcast").take_all()
    }
    assert out[0]["clean_text"] == "alpha beta gamma delta epsilon zeta"
    assert out[0]["n_removed"] == 8
    assert (
        out[1]["clean_text"] == "unique one two three four five tail tokens here again"
    )
    assert out[1]["n_removed"] == 8
    assert out[2]["clean_text"] == "totally original musing on nothing shared"
    assert out[2]["n_removed"] == 0
    assert out[3] == {"doc_id": 3, "n_tokens": 0, "n_removed": 0, "clean_text": ""}
    assert out[4]["clean_text"] == "short" and out[4]["n_removed"] == 0

    joined = {
        r["doc_id"]: r
        for r in remove_dup_spans(ds, n=5, min_docs=2, mode="join").take_all()
    }
    assert joined == out


def test_redirect_resolution_broadcast_join_parity(ray_session):
    """The ≤100k broadcast URL re-attach and the scale join path agree."""
    from go_htmldate_ray.pipelines.extract_dates import redirect_resolution

    sf = "/root/testdata/sf0.001"
    fast = sorted(
        (r["url"], r["final_url"], r["hops"])
        for r in redirect_resolution(sf).take_all()
    )
    joined = sorted(
        (r["url"], r["final_url"], r["hops"])
        for r in redirect_resolution(sf, broadcast_limit=0).take_all()
    )
    assert fast == joined and len(fast) == 500


def test_redirect_resolution_broadcast_guard(ray_session, monkeypatch):
    """The broadcast re-attach raises loudly (skew_join convention) when
    the materialized map exceeds broadcast_limit — i.e. when the
    pre-checked doc count understated the map size."""
    import go_htmldate_ray.sources.pages as pages_mod
    from go_htmldate_ray.pipelines.extract_dates import redirect_resolution

    # lie about the corpus size so the ≤limit branch is taken while the
    # real map (500 rows at sf0.001) blows past the limit
    monkeypatch.setattr(pages_mod, "count_documents", lambda sf: 5)
    with pytest.raises(ValueError, match="broadcast map has 500 rows"):
        redirect_resolution("/root/testdata/sf0.001", broadcast_limit=10)


def test_budget_allocation_exact_and_vs_python(ray_session):
    """Cumulative-rounding apportionment: allocations sum to EXACTLY the
    budget, each host is within ±1 of its fractional share, and the
    distributed result equals a single-process reference on a skewed
    random frontier (one mega-host with ~50% of rows)."""
    import random

    import ray

    from go_htmldate_ray.stages.cleaning import _hash63
    from go_htmldate_ray.stages.sampling import budget_allocation

    rng = random.Random(7)
    rows = [{"host": "mega.example.org"} for _ in range(5000)]
    for i in range(40):
        rows += [{"host": f"h{i}.example.org"}] * rng.randrange(1, 250)
    rng.shuffle(rows)
    budget = 137

    out = budget_allocation(
        ray.data.from_items(rows), budget=budget
    ).take_all()
    counts: dict[str, int] = {}
    for r in rows:
        counts[r["host"]] = counts.get(r["host"], 0) + 1
    total = sum(counts.values())

    # single-process cumulative-rounding reference, same h63 order
    ordered = sorted(counts, key=_hash63)
    expected, cum = {}, 0
    rnd = lambda c: (2 * c * budget + total) // (2 * total)
    for h in ordered:
        expected[h] = rnd(cum + counts[h]) - rnd(cum)
        cum += counts[h]

    got = {r["host"]: r["allocated"] for r in out}
    assert got == expected
    assert sum(got.values()) == budget
    for h, a in got.items():
        assert abs(a - counts[h] * budget / total) <= 1, (h, a)
    assert {r["host"]: r["n_urls"] for r in out} == counts


def test_remove_dup_spans_randomized_vs_python(ray_session):
    """Randomized corpora from a tiny vocabulary (dense natural 5-gram
    collisions) match a brute-force single-process reference, in both
    modes."""
    import random

    import ray

    from go_htmldate_ray.stages.dedup import remove_dup_spans

    rng = random.Random(123)
    vocab = ["the", "a", "cat", "dog", "ran", "sat", "on", "mat"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 40))),
        }
        for i in range(60)
    ]

    n = 5

    def reference():
        grams: dict[tuple, set] = {}
        toks_by_doc = {r["doc_id"]: r["text"].split() for r in rows}
        for d, toks in toks_by_doc.items():
            for i in range(len(toks) - n + 1):
                grams.setdefault(tuple(toks[i : i + n]), set()).add(d)
        dup = {g for g, ds_ in grams.items() if len(ds_) >= 2}
        out = {}
        for d, toks in toks_by_doc.items():
            covered = [False] * len(toks)
            for i in range(len(toks) - n + 1):
                if tuple(toks[i : i + n]) in dup:
                    for j in range(i, i + n):
                        covered[j] = True
            kept = [t for t, c in zip(toks, covered) if not c]
            out[d] = (len(toks), sum(covered), " ".join(kept))
        return out

    expected = reference()
    assert any(v[1] > 0 for v in expected.values())  # fixture has dups
    assert any(v[1] == 0 and v[0] > 0 for v in expected.values())  # and clean docs

    ds = ray.data.from_items(rows)
    for mode in ("broadcast", "join"):
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
            for r in remove_dup_spans(ds, n=n, min_docs=2, mode=mode).take_all()
        }
        assert got == expected, mode


def test_anchor_summary_hot_target_collapses_per_block(ray_session):
    """A mega-inlinked URL (80% of all anchors, one anchor string) must
    collapse to per-block partials: the finalize group for it carries
    one row per distinct anchor, not per inlink — asserted through the
    output invariants (exact counts survive the two-stage collapse)."""
    import ray

    from go_htmldate_ray.pipelines.extract_dates import anchor_summary_from_pages

    hot = "https://hot.example.org/"
    n_pages = 400
    rows = []
    for i in range(n_pages):
        links = [f'<a href="{hot}">home</a>'] * 4  # 1600 hot anchors
        links.append(f'<a href="https://t{i % 37}.example.org/">t {i % 37}</a>')
        rows.append({"html": f"<html><body>{''.join(links)}</body></html>".encode()})
    out = {
        r["dst_url"]: r
        for r in anchor_summary_from_pages(
            ray.data.from_items(rows).repartition(8)
        ).take_all()
    }
    assert out[hot]["n_inlinks"] == 4 * n_pages
    assert out[hot]["n_anchor_texts"] == 1
    assert out[hot]["top_anchor"] == "home"
    assert len(out) == 1 + 37
    for i in range(37):
        u = f"https://t{i}.example.org/"
        assert out[u]["n_inlinks"] == len([x for x in range(n_pages) if x % 37 == i])


def test_url_aliases_families_and_canonical(ray_session):
    """Family emission: canonical = lexicographically smallest URL,
    one row per alias, singletons emit nothing, '' contents family too."""
    import ray

    from go_htmldate_ray.stages.dedup import url_aliases

    rows = [
        {"url": "https://b.org/x", "content": "same body"},
        {"url": "https://a.org/x", "content": "same body"},
        {"url": "https://c.org/x", "content": "same body"},
        {"url": "https://solo.org/", "content": "unique body"},
        {"url": "https://e1.org/", "content": ""},
        {"url": "https://e2.org/", "content": None},  # '' and None collide
    ]
    out = sorted(
        (r["canonical_url"], r["alias_url"])
        for r in url_aliases(ray.data.from_items(rows)).take_all()
    )
    assert out == [
        ("https://a.org/x", "https://b.org/x"),
        ("https://a.org/x", "https://c.org/x"),
        ("https://e1.org/", "https://e2.org/"),
    ]


def test_hits_randomized_vs_python_reference(ray_session):
    """Distributed integer HITS equals the single-process recurrence on
    a random graph with skewed degrees (including a no-in-edge node and
    a phantom edge endpoint outside the node set)."""
    import random

    import ray

    from go_htmldate_ray.stages.graph import hits

    rng = random.Random(99)
    n, iters, shift, base_shift = 120, 3, 1, 20
    edges = [(u, rng.randrange(0, n)) for u in range(1, n) for _ in range(rng.randrange(0, 5))]
    edges.append((5, n + 50))  # phantom dst: must be dropped, not scored
    # node 0 has no out-edges by construction (loop starts at 1)

    base = 1 << base_shift
    h = {i: base for i in range(n)}
    for _ in range(iters):
        a = {i: 0 for i in range(n)}
        for u, v in edges:
            if v < n:
                a[v] += h[u]
        a = {i: v >> shift for i, v in a.items()}
        h = {i: 0 for i in range(n)}
        for u, v in edges:
            if v < n:
                h[u] += a[v]
        h = {i: v >> shift for i, v in h.items()}

    out = hits(
        ray.data.from_items([{"id": i} for i in range(n)]),
        ray.data.from_items([{"src": u, "dst": v} for u, v in edges]),
        iters=iters,
        scale_shift=shift,
        base_shift=base_shift,
    ).take_all()
    got_h = {r["doc_id"]: r["hub_units"] for r in out}
    got_a = {r["doc_id"]: r["auth_units"] for r in out}
    assert len(out) == n  # phantom id n+50 absent, node 0 present
    assert got_h == h and got_a == a
    assert len(set(h.values())) > 3  # fixture genuinely non-uniform


def test_decode_with_info_branches():
    """Every sniffing branch: BOM, declared-and-valid, declared-bogus
    (falls to utf-8), undeclared non-utf8 (latin-1), plain ascii — and
    _decode stays byte-identical to the info variant's text."""
    from go_htmldate_ray.dom import _decode, decode_with_info

    cases = {
        b"\xef\xbb\xbfhi": ("hi", "utf-8", "", True),
        b'<meta charset="windows-1252">caf\xe9': (
            '<meta charset="windows-1252">café',
            "windows-1252",
            "windows-1252",
            False,
        ),
        b'<META CHARSET="ISO-8859-1">na\xefve': (
            '<META CHARSET="ISO-8859-1">naïve',  # text keeps original case
            "iso-8859-1",  # sniff is case-insensitive
            "iso-8859-1",
            False,
        ),
        b'<meta charset="bogus-enc">x': (
            '<meta charset="bogus-enc">x',
            "utf-8",
            "bogus-enc",
            False,
        ),
        b"undeclared caf\xe9": ("undeclared café", "latin-1", "", False),
        b"plain": ("plain", "utf-8", "", False),
        b"": ("", "utf-8", "", False),
    }
    for raw, expected in cases.items():
        assert decode_with_info(raw) == expected, raw
        assert _decode(raw) == expected[0], raw


def test_semdedup_planted_duplicate_dropped():
    """A planted exact copy (cosine 1.0) must be dropped; its earlier
    original kept; result covers every input row exactly once."""
    import numpy as np
    import ray.data
    from go_htmldate_ray.stages.similarity import semdedup

    rng = np.random.RandomState(3)
    vecs = rng.standard_normal((60, 16)).astype(np.float64)
    vecs[50] = vecs[7]  # exact duplicate, later vec_id
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(60)]
    )
    rows = semdedup(ds, n_clusters=4, threshold=0.95, refine_iters=1).take_all()
    by_id = {r["vec_id"]: r for r in rows}
    assert sorted(by_id) == list(range(60))
    assert by_id[7]["keep"] == 1
    assert by_id[50]["keep"] == 0
    assert by_id[7]["cluster"] == by_id[50]["cluster"]


def test_semdedup_tiling_matches_bruteforce():
    """Tiny tile sizes must give the identical keep set as an untiled
    numpy column-max reference over each cluster."""
    import numpy as np
    import ray.data
    from go_htmldate_ray.stages.similarity import semdedup

    rng = np.random.RandomState(11)
    vecs = rng.standard_normal((40, 8)).astype(np.float64)
    # densify similarity structure: make several vectors correlated
    for i in range(0, 40, 5):
        vecs[i + 1] = vecs[i] + 0.05 * rng.standard_normal(8)
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(40)]
    )
    tau = 0.8
    rows = semdedup(
        ds, n_clusters=3, threshold=tau, refine_iters=1, tile_rows=4, tile_cols=3
    ).take_all()
    got = {r["vec_id"]: (r["cluster"], r["keep"]) for r in rows}
    # reference: same clustering (read from result), untiled keep rule
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    for cl in {c for c, _ in got.values()}:
        ids = sorted(i for i in got if got[i][0] == cl)
        sub = unit[ids]
        sims = sub @ sub.T
        for j in range(len(ids)):
            expect = 1 if (j == 0 or sims[:j, j].max() < tau) else 0
            assert got[ids[j]][1] == expect, f"vec {ids[j]}"


def test_heavy_hitters_exact_under_truncation():
    """A forced support > 1 truncates per-batch emission; the upper-bound
    pruning must still yield EXACTLY the brute-force threshold set (the
    no-false-negative guarantee), and an unsafely large support must
    fail LOUDLY via the U < threshold runtime check, never silently."""
    from collections import Counter

    import numpy as np
    import pytest
    import ray.data
    from go_htmldate_ray.stages.sketches import heavy_hitters

    rng = np.random.RandomState(5)
    vocab = [f"w{i}" for i in range(40)]
    # zipf-ish skew: token i appears with weight 1/(i+1)
    weights = 1.0 / (np.arange(40) + 1.0)
    weights /= weights.sum()
    docs = [
        " ".join(rng.choice(vocab, size=30, p=weights)) for _ in range(120)
    ]
    ds = ray.data.from_items([{"text": t} for t in docs], override_num_blocks=16)
    truth = Counter()
    for t in docs:
        truth.update(t.split())
    threshold = 400  # large enough that support=threshold//(2*16)=12 truncates
    expect = {tok: c for tok, c in truth.items() if c >= threshold}
    got = {
        r["token"]: r["n"]
        for r in heavy_hitters(ds, threshold=threshold).take_all()
    }
    assert got == expect and len(expect) >= 1
    # explicit safe support, heavier truncation than auto
    got2 = {
        r["token"]: r["n"]
        for r in heavy_hitters(ds, threshold=threshold, support=12).take_all()
    }
    assert got2 == expect
    # unsafe support: truncation mass can hide a heavy hitter -> loud error
    with pytest.raises(ValueError, match="truncation mass"):
        heavy_hitters(ds, threshold=60, support=50)


def test_heavy_hitters_bigrams_match_bruteforce():
    from collections import Counter

    import ray.data
    from go_htmldate_ray.stages.sketches import heavy_hitters

    docs = ["a b a b c", "a b x y", "x y x y x y", ""]
    ds = ray.data.from_items([{"text": t} for t in docs], override_num_blocks=3)
    got = {
        r["token"]: r["n"]
        for r in heavy_hitters(ds, threshold=3, support=1, ngram=2).take_all()
    }
    truth = Counter()
    for t in docs:
        w = t.split()
        truth.update(" ".join(w[i : i + 2]) for i in range(len(w) - 1))
    assert got == {tok: c for tok, c in truth.items() if c >= 3}
    assert "x y" in got and "a b" in got


def test_image_dhash_real_decode_and_scale_invariance():
    """synth_family_bmp bytes must decode back to the exact formula
    pixels (width 9 -> padded 28-byte rows), and dHash must be invariant
    under 2x nearest-neighbor upscaling (the resample path)."""
    import numpy as np
    from go_htmldate_ray.stages.multimodal import (
        decode_bmp,
        dhash64,
        synth_family_bmp,
    )

    fam = 7
    img = decode_bmp(synth_family_bmp(fam))
    assert img.shape == (7, 9, 3)
    x = np.arange(9)[None, :]
    y = np.arange(7)[:, None]
    assert (img[..., 0] == (fam * 37 + x * 11 + y * 23) % 256).all()
    assert (img[..., 1] == (fam * 59 + x * 17 + y * 5) % 256).all()
    assert (img[..., 2] == (fam * 83 + x * 3 + y * 29) % 256).all()
    h = dhash64(img)
    assert 0 <= h < (1 << 56)
    up = img.repeat(2, axis=0).repeat(2, axis=1)
    assert dhash64(up) == h
    assert dhash64(decode_bmp(synth_family_bmp(8))) != h


def test_image_dhash_dedup_groups_by_family():
    from go_htmldate_ray.stages.multimodal import image_dhash_dedup

    rows = image_dhash_dedup(SF, n_families=5).take_all()
    assert len(rows) == 5
    # rep_doc is the min doc_id of each residue class 0..4
    assert sorted(r["rep_doc"] for r in rows) == [0, 1, 2, 3, 4]
    assert sum(r["n_docs"] for r in rows) == 500


def test_image_dhash_dedup_png_mode_matches_formula():
    """PNG mode routes through the real zlib decode (all five scanline
    filters per synth_family_png) and must group identically by family,
    with hashes equal to dhash64 over the formula pixels."""
    import numpy as np
    from go_htmldate_ray.stages.multimodal import (
        decode_png,
        dhash64,
        image_dhash_dedup,
        synth_family_png,
    )

    # decode parity with the planted formulas first
    fam = 3
    img = decode_png(synth_family_png(fam))
    assert img.shape == (7, 9, 3)
    x = np.arange(9)[None, :]
    y = np.arange(7)[:, None]
    assert (img[..., 0] == (fam * 41 + x * 13 + y * 19) % 256).all()
    assert (img[..., 1] == (fam * 67 + x * 7 + y * 31) % 256).all()
    assert (img[..., 2] == (fam * 89 + x * 5 + y * 3) % 256).all()

    rows = image_dhash_dedup(SF, n_families=5, image_format="png").take_all()
    assert len(rows) == 5
    assert sorted(r["rep_doc"] for r in rows) == [0, 1, 2, 3, 4]
    assert sum(r["n_docs"] for r in rows) == 500
    by_rep = {r["rep_doc"]: r["dhash"] for r in rows}
    for f in range(5):
        assert by_rep[f] == dhash64(decode_png(synth_family_png(f)))


def test_crawl_trap_hosts_flags_only_planted_exploders():
    from go_htmldate_ray.pipelines.extract_dates import crawl_trap_hosts

    rows = crawl_trap_hosts(SF).take_all()
    assert len(rows) == 97
    flagged = {r["host"] for r in rows if r["trap"] == 1}
    assert flagged == {
        f"site{h}.example.org" for h in range(97) if h % 13 == 5
    }
    for r in rows:
        # template count stays tiny even on trap hosts (that's the point)
        assert r["n_templates"] <= 3
        if r["trap"]:
            assert r["n_urls"] >= 10 * r["n_templates"]


def test_shard_rendezvous_minimal_movement():
    """Growing 8 -> 9 shards must move only URLs won by the NEW shard,
    at roughly 1/9 of the frontier — the HRW property that makes
    seen-set resharding cheap."""
    from go_htmldate_ray.pipelines.extract_dates import shard_rendezvous

    rows = shard_rendezvous(SF).take_all()
    assert len(rows) == 500
    moved = [r for r in rows if r["moved"] == 1]
    for r in moved:
        assert r["shard_after"] == 8  # every move lands on the new shard
    for r in rows:
        if r["moved"] == 0:
            assert r["shard_before"] == r["shard_after"]
    # expected fraction 1/9 ~= 56 of 500; allow generous binomial slack
    assert 25 <= len(moved) <= 100
    # shrink resize: only URLs owned by the removed shard move
    shrunk = shard_rendezvous(SF, n_before=9, n_after=8).take_all()
    for r in shrunk:
        if r["moved"] == 1:
            assert r["shard_before"] == 8
        else:
            assert r["shard_before"] == r["shard_after"]


def test_bitext_candidates_planted_pairs():
    from go_htmldate_ray.pipelines.extract_dates import bitext_candidates

    rows = bitext_candidates(SF).take_all()
    expect = {i for i in range(500) if i % 23 == 4 and i % 4 != 2}
    assert {r["en_doc"] for r in rows} == expect
    for r in rows:
        assert r["en_doc"] == r["de_doc"]
        assert abs(r["n_tokens_en"] - r["n_tokens_de"]) <= 1
        assert r["n_tokens_en"] <= 2 * r["n_tokens_de"]
        assert r["n_tokens_de"] <= 2 * r["n_tokens_en"]


def test_strip_lang_markers_real_urls():
    """The STRAND normalization must strip real marker segments from each
    side's own URL (not rely on fixture knowledge) and leave everything
    else alone."""
    from go_htmldate_ray.pipelines.extract_dates import (
        insert_lang_marker,
        strip_lang_markers,
    )

    en = "https://site1.example.org/article/42.html"
    de = insert_lang_marker(en, "de")
    assert de == "https://site1.example.org/de/article/42.html"
    assert strip_lang_markers(de) == en
    assert strip_lang_markers(en) == en  # no marker → unchanged
    # region-tagged markers, mid-path markers, multiple markers
    assert (
        strip_lang_markers("https://h.example.org/en-us/docs/a.html")
        == "https://h.example.org/docs/a.html"
    )
    assert (
        strip_lang_markers("https://h.example.org/blog/de/2020/01/x.html")
        == "https://h.example.org/blog/2020/01/x.html"
    )
    assert (
        strip_lang_markers("https://h.example.org/en/de/x.html")
        == "https://h.example.org/x.html"
    )
    # a segment that merely STARTS with a code is not a marker
    assert (
        strip_lang_markers("https://h.example.org/design/x.html")
        == "https://h.example.org/design/x.html"
    )
    # trailing /de (no following slash) is a leaf name, not a marker
    assert (
        strip_lang_markers("https://h.example.org/article/de")
        == "https://h.example.org/article/de"
    )


def test_jsonl_shard_sink_roundtrip_resume_and_determinism(tmp_path):
    import gzip
    import hashlib
    import json
    import os

    import ray.data
    from go_htmldate_ray.sources.sink import read_jsonl_shards, write_jsonl_shards

    rows = [{"doc_id": i, "text": f"doc {i} é"} for i in range(40)]
    ds = ray.data.from_items(rows, override_num_blocks=4)
    out = str(tmp_path / "export")
    rep = write_jsonl_shards(ds, out, n_shards=4)
    assert rep["rows_written"] == 40 and rep["shards_written"] == [0, 1, 2, 3]
    back = sorted(read_jsonl_shards(out).take_all(), key=lambda r: r["doc_id"])
    assert back == sorted(rows, key=lambda r: r["doc_id"])
    # determinism: identical bytes on a fresh run of the same data
    digests = {
        k: hashlib.md5(
            open(os.path.join(out, f"shard={k}", "part.jsonl.gz"), "rb").read()
        ).hexdigest()
        for k in range(4)
    }
    out2 = str(tmp_path / "export2")
    write_jsonl_shards(ray.data.from_items(rows, override_num_blocks=2), out2, n_shards=4)
    for k in range(4):
        assert (
            hashlib.md5(
                open(os.path.join(out2, f"shard={k}", "part.jsonl.gz"), "rb").read()
            ).hexdigest()
            == digests[k]
        )
    # resume: finished shards are skipped entirely
    os.remove(os.path.join(out, "shard=2", "part.jsonl.gz"))
    os.remove(os.path.join(out, "shard=2", "_SUCCESS"))
    rep2 = write_jsonl_shards(ds, out, n_shards=4)
    assert rep2["shards_written"] == [2] and rep2["shards_skipped"] == [0, 1, 3]
    # the rewritten shard carries valid JSON lines
    with gzip.open(os.path.join(out, "shard=2", "part.jsonl.gz"), "rt") as f:
        got = [json.loads(line) for line in f]
    assert {r["doc_id"] for r in got} == {i for i in range(40) if i % 4 == 2}


def test_near_dup_vs_snapshot_cross_side_only_and_planted():
    """A planted near-identical new doc must pair with its snapshot
    original; all emitted pairs must cross the boundary; and the pair
    set must agree with filtering the symmetric all-pairs operator."""
    import ray.data
    from go_htmldate_ray.sources.io import read_parquet_clean
    from go_htmldate_ray.stages.dedup import minhash_lsh_pairs, near_dup_vs_snapshot
    import pyarrow as pa

    docs = read_parquet_clean(f"{SF}/documents.parquet", columns=["doc_id", "text"])

    def plant(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        src = b.filter(pc.equal(b.column("doc_id"), 7))
        texts = [t + " tail" for t in src.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array([2_000_000] * len(texts), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )

    aug = docs.union(docs.map_batches(plant, batch_format="pyarrow"))
    got = {
        (r["new_doc"], r["old_doc"])
        for r in near_dup_vs_snapshot(aug, snapshot_max_id=100, threshold=0.7).take_all()
    }
    assert (2_000_000, 7) in got
    assert all(n >= 100 and o < 100 for n, o in got)
    # equivalence with the symmetric operator filtered to cross-side
    sym = {
        (r["doc_b"], r["doc_a"])
        for r in minhash_lsh_pairs(aug, threshold=0.7, hot_buckets="error").take_all()
        if r["doc_a"] < 100 <= r["doc_b"]
    }
    assert got == sym


def test_reciprocal_links_symmetric_and_loop_free():
    from go_htmldate_ray.pipelines.extract_dates import (
        host_link_edges,
        reciprocal_links,
    )

    edges = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_link_edges(SF).take_all()
    }
    rows = reciprocal_links(SF).take_all()
    assert rows
    seen = set()
    for r in rows:
        a, b = r["host_a"], r["host_b"]
        assert a < b and (a, b) not in seen
        seen.add((a, b))
        assert edges[(a, b)] == r["links_ab"]
        assert edges[(b, a)] == r["links_ba"]
    # completeness: every mutual non-loop pair surfaced
    expect = {
        (s, d)
        for (s, d) in edges
        if s < d and (d, s) in edges
    }
    assert seen == expect


def test_frontier_priority_cap_and_order():
    from collections import Counter

    from go_htmldate_ray.pipelines.extract_dates import frontier_priority

    rows = frontier_priority(SF, per_host_cap=3, budget=100).take_all()
    assert len(rows) == 100
    per_host = Counter(r["host"] for r in rows)
    assert max(per_host.values()) <= 3
    pr = [(r["priority"], -r["doc_id"]) for r in rows]
    assert pr == sorted(pr, reverse=True)  # authority-desc, doc_id-asc order


def test_host_triangles_matches_bruteforce():
    from itertools import combinations

    from go_htmldate_ray.pipelines.extract_dates import (
        host_link_edges,
        host_triangles,
    )

    und = set()
    for r in host_link_edges(SF).take_all():
        s = int(r["src_host"].split(".")[0][4:])
        d = int(r["dst_host"].split(".")[0][4:])
        if s != d:
            und.add((min(s, d), max(s, d)))
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect = {h: 0 for h in adj}
    n_tris = 0
    for a in sorted(adj):
        for b, c in combinations(sorted(x for x in adj[a] if x > a), 2):
            if (b, c) in und:
                n_tris += 1
                for h in (a, b, c):
                    expect[h] += 1
    got = {
        int(r["host"].split(".")[0][4:]): r["n_triangles"]
        for r in host_triangles(SF).take_all()
    }
    assert n_tris > 0
    for h, n in expect.items():
        assert got.get(h, 0) == n


def test_grouped_hll_per_group_estimates():
    """Per-group registers must equal per-group independent sketches,
    and the small-range (linear-counting) estimate must be near-exact
    at fixture cardinalities."""
    from collections import defaultdict

    import ray.data
    from go_htmldate_ray.stages.sketches import grouped_hll_registers, hll_estimate

    docs = [
        {"host": f"h{i % 3}", "text": " ".join(f"w{i % 3}_{j}" for j in range(i + 1))}
        for i in range(30)
    ]
    ds = ray.data.from_items(docs, override_num_blocks=5)
    rows = grouped_hll_registers(ds, group_col="host", col="text", p=8).take_all()
    by_group = defaultdict(list)
    for r in rows:
        by_group[r["group"]].append({"bucket": r["bucket"], "rho_max": r["rho_max"]})
    truth = defaultdict(set)
    for d in docs:
        truth[d["host"]].update(d["text"].split())
    assert set(by_group) == set(truth)
    for g, regs in by_group.items():
        est = hll_estimate(regs, p=8)
        n = len(truth[g])
        assert abs(est - n) <= max(2, 0.15 * n), (g, est, n)


def test_grouped_hll_int_group_column():
    """A non-string group column (int host ids) must carry its own Arrow
    type through to the output group column, not be forced to string."""
    import ray.data
    from go_htmldate_ray.stages.sketches import grouped_hll_registers

    docs = [
        {"hid": i % 3, "text": " ".join(f"w{i % 3}_{j}" for j in range(i + 1))}
        for i in range(12)
    ]
    ds = ray.data.from_items(docs, override_num_blocks=3)
    out = grouped_hll_registers(ds, group_col="hid", col="text", p=8)
    sch = out.schema()
    assert str(dict(zip(sch.names, sch.types))["group"]) == "int64"
    groups = {r["group"] for r in out.take_all()}
    assert groups == {0, 1, 2}


def test_hot_path_subtrees_maximal_depth():
    import ray.data
    from go_htmldate_ray.stages.urlstats import hot_path_subtrees

    rows_in = (
        [{"host": "a", "path": f"/cal/2020/{i}.html"} for i in range(6)]
        + [{"host": "a", "path": "/about.html"}]
        + [{"host": "b", "path": f"/p/{i}.html"} for i in range(3)]
        + [{"host": "b", "path": f"/q/{i}.html"} for i in range(2)]
    )
    ds = ray.data.from_items(rows_in, override_num_blocks=3)
    got = {
        (r["host"], r["prefix"]): r["n_urls"]
        for r in hot_path_subtrees(ds, threshold=4).take_all()
    }
    # host a: /cal/2020/ (6) is the deepest >=4 prefix — '/', '/cal/'
    # are its ancestors and must NOT be reported; host b: only '/' (5)
    assert got == {("a", "/cal/2020/"): 6, ("b", "/"): 5}


def test_boolean_and_search_bruteforce():
    import pyarrow.parquet as pq
    from go_htmldate_ray.sources.io import read_parquet_clean
    from go_htmldate_ray.stages.search import boolean_and_search

    terms = ("merge", "window")
    rows = boolean_and_search(
        read_parquet_clean(f"{SF}/documents.parquet", columns=["doc_id", "text"]),
        terms,
    ).take_all()
    got = {r["doc_id"]: r["total_tf"] for r in rows}
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    expect = {}
    for i, txt in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        toks = (txt or "").split()
        counts = {term: toks.count(term) for term in terms}
        if all(c > 0 for c in counts.values()):
            expect[i] = sum(counts.values())
    assert got == expect and expect


def test_corpus_checksum_order_and_split_invariant():
    import ray.data
    from go_htmldate_ray.stages.sketches import corpus_checksum

    rows = [{"doc_id": i, "text": f"doc {i}"} for i in range(100)]
    a = corpus_checksum(ray.data.from_items(rows, override_num_blocks=2)).take_all()[0]
    b = corpus_checksum(
        ray.data.from_items(list(reversed(rows)), override_num_blocks=13)
    ).take_all()[0]
    assert a == b and a["n_docs"] == 100
    # any single-row change must move both digests
    rows[50]["text"] = "doc 50 CHANGED"
    c = corpus_checksum(ray.data.from_items(rows)).take_all()[0]
    assert c["sum_hash"] != a["sum_hash"] and c["xor_hash"] != a["xor_hash"]


def test_skew_join_equivalent_to_hash_join():
    """Planted mega-key: skew_join's broadcast+bucket split must emit
    exactly hash_join's row multiset, including duplicate right keys."""
    import numpy as np
    import ray.data
    from go_htmldate_ray.stages.joins import hash_join, skew_join

    rng = np.random.RandomState(9)
    # 60% of left rows hit key 7 (the mega-key); right has TWO rows for
    # key 7 (per-left fanout) and one for others
    lk = np.where(rng.rand(3000) < 0.6, 7, rng.randint(0, 40, size=3000))
    left = ray.data.from_items(
        [{"k": int(k), "lv": i} for i, k in enumerate(lk)], override_num_blocks=8
    )
    right_rows = [{"rk": j, "rv": 100 + j} for j in range(40)] + [
        {"rk": 7, "rv": 999}
    ]
    right = ray.data.from_items(right_rows, override_num_blocks=3)
    got = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in skew_join(left, right, on="k", right_on="rk", hot_threshold=100).take_all()
    )
    expect = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in hash_join(left, right, on="k", right_on="rk").take_all()
    )
    assert got == expect and len(got) > 3000  # fanout on the hot key
    # no hot keys -> pure hash_join path, still equivalent
    got2 = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in skew_join(
            left, right, on="k", right_on="rk", hot_threshold=10**9
        ).take_all()
    )
    assert got2 == expect


def test_jsonld_summary_hostile_inputs():
    """Malformed JSON-LD, non-dict payloads, and wrong script types must
    neither raise nor be miscounted — driven through the operator's own
    per-page helper."""
    from go_htmldate_ray.pipelines.extract_dates import jsonld_of

    cases = [
        (b'<script type="application/ld+json">{broken</script>', 1, "", ""),
        (b'<script type="application/ld+json">[1, 2]</script>', 1, "", ""),
        (
            b'<script type="APPLICATION/LD+JSON">'
            b'{"@type":"Person","datePublished":"2020-01-01"}</script>',
            1,
            "Person",
            "2020-01-01",
        ),
        (b'<script type="text/javascript">{"@type":"X"}</script>', 0, "", ""),
        (
            b'<script type="application/ld+json">{"@type":"B"}</script>'
            b'<script type="application/ld+json">{"@type":"A"}</script>',
            2,
            "A,B",
            "",
        ),
        (b"", 0, "", ""),
        (b"\x00garbage<script", 0, "", ""),
        # pathological nesting: RecursionError must be swallowed, not
        # kill the pipeline
        (
            b'<script type="application/ld+json">' + b"[" * 100000 + b"</script>",
            1,
            "",
            "",
        ),
    ]
    for html, n, types, date in cases:
        assert jsonld_of(html) == (n, types, date), html


def test_mirror_hosts_planted_pair_dominates():
    from go_htmldate_ray.pipelines.extract_dates import mirror_hosts

    rows = mirror_hosts(SF).take_all()
    by_pair = {(r["host_a"], r["host_b"]): r["n_pairs"] for r in rows}
    planted = ("site2.example.org", "site86.example.org")
    # every host-2 doc got a verbatim mirror -> the planted pair carries
    # one near-dup per mirrored doc (natural same-pair extras possible
    # at other host pairs, but none can touch the planted count)
    import pyarrow.parquet as pq

    ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]).column(
        "doc_id"
    ).to_pylist()
    assert by_pair[planted] == len([i for i in ids if i % 97 == 2])
    assert all(n >= 2 for n in by_pair.values())
    assert by_pair[planted] == max(by_pair.values())


def test_curate_to_jsonl_funnel(tmp_path):
    from go_htmldate_ray.pipelines.curation import curate_to_jsonl
    from go_htmldate_ray.sources.sink import read_jsonl_shards

    out = str(tmp_path / "curated")
    rep = curate_to_jsonl(SF, out, n_shards=4)
    assert rep["n_kept"] == rep["rows_written"] > 0
    assert rep["n_kept"] <= min(rep["n_quality"], rep["n_exact"], rep["n_semdedup"])
    back = read_jsonl_shards(out).take_all()
    assert len(back) == rep["rows_written"]
    # resume: a second run skips every finished shard
    rep2 = curate_to_jsonl(SF, out, n_shards=4)
    assert rep2["rows_written"] == 0 and rep2["shards_skipped"] == [0, 1, 2, 3]


def test_backfill_embeddings_and_curate_coverage(tmp_path):
    """An embedding-less doc is dropped by the fail-closed vec_id==doc_id
    contract, but survives curation with backfill=True, flagged synthetic
    and counted in the report (verdict item: the promised backfill path)."""
    import pyarrow.parquet as pq

    import ray.data
    from go_htmldate_ray.pipelines.curation import curate_to_jsonl
    from go_htmldate_ray.sources.io import read_parquet_clean
    from go_htmldate_ray.sources.sink import read_jsonl_shards
    from go_htmldate_ray.stages.similarity import backfill_embeddings

    # sf-like dir whose embeddings table is missing the first 10 docs
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf)
    docs_tbl = pq.read_table(f"{SF}/documents.parquet")
    emb_tbl = pq.read_table(f"{SF}/embeddings.parquet")
    import pyarrow.compute as pc

    pq.write_table(docs_tbl, f"{sf}/documents.parquet")
    pq.write_table(
        emb_tbl.filter(pc.greater_equal(emb_tbl.column("vec_id"), 10)),
        f"{sf}/embeddings.parquet",
    )

    # unit: the backfilled table covers every doc, real rows unchanged,
    # synthetic rows deterministic, unit-norm, and dim-matched
    docs = read_parquet_clean(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    emb = read_parquet_clean(f"{sf}/embeddings.parquet")
    filled = {r["vec_id"]: r for r in backfill_embeddings(docs, emb).take_all()}
    assert len(filled) == docs_tbl.num_rows
    dim = len(emb_tbl.column("embedding")[0])
    synth = [r for r in filled.values() if r["synthetic"] == 1]
    assert sorted(r["vec_id"] for r in synth) == list(range(10))
    import numpy as np

    for r in synth:
        v = np.asarray(r["embedding"])
        assert len(v) == dim
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5
    # real rows ride through bit-identical
    assert filled[10]["synthetic"] == 0
    assert filled[10]["embedding"] == emb_tbl.column("embedding")[10].as_py()
    # determinism
    again = {r["vec_id"]: r for r in backfill_embeddings(docs, emb).take_all()}
    assert again[0]["embedding"] == filled[0]["embedding"]

    # funnel: fail-closed without backfill, covered with it
    rep_closed = curate_to_jsonl(sf, str(tmp_path / "closed"), n_shards=2)
    rep_open = curate_to_jsonl(
        sf, str(tmp_path / "open"), n_shards=2, backfill=True
    )
    assert rep_closed["n_backfilled"] == 0
    assert rep_open["n_backfilled"] == 10
    closed_ids = {
        r["doc_id"] for r in read_jsonl_shards(str(tmp_path / "closed")).take_all()
    }
    open_ids = {
        r["doc_id"] for r in read_jsonl_shards(str(tmp_path / "open")).take_all()
    }
    assert not (closed_ids & set(range(10)))  # fail-closed drops them all
    recovered = open_ids & set(range(10))
    assert recovered  # at least one missing doc survives via backfill
    assert rep_open["n_kept"] >= rep_closed["n_kept"]


def test_curate_to_jsonl_matches_driver_set_reference(tmp_path):
    """The scale-safe flag-row/join composition must produce BYTE-identical
    shards to the straightforward driver-side id-set intersection (the
    pre-round-4 implementation, replayed here at fixture scale as the
    reference semantics)."""
    import glob

    import pyarrow.compute as pc
    from go_htmldate_ray.pipelines.curation import curate_to_jsonl
    from go_htmldate_ray.sources.io import read_parquet_clean
    from go_htmldate_ray.sources.sink import write_jsonl_shards
    from go_htmldate_ray.stages.dedup import exact_dedup
    from go_htmldate_ray.stages.similarity import semdedup
    from go_htmldate_ray.stages.text_stage import gopher_quality_batch

    out_new = str(tmp_path / "new")
    rep = curate_to_jsonl(SF, out_new, n_shards=4)

    # reference path: driver id sets + is_in filter (fixture-scale only)
    docs = read_parquet_clean(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    emb = read_parquet_clean(f"{SF}/embeddings.parquet")
    quality_keep = {
        r["doc_id"]
        for r in docs.map_batches(
            gopher_quality_batch,
            fn_kwargs={"min_words": 15, "min_stopword_hits": 1},
            batch_format="pyarrow",
        ).take_all()
        if r["passes"] == 1
    }
    exact_keep = {r["doc_id"] for r in exact_dedup(docs).take_all()}
    sem_keep = {
        r["vec_id"]
        for r in semdedup(emb, n_clusters=8, threshold=0.5).take_all()
        if r["keep"] == 1
    }
    keep = quality_keep & exact_keep & sem_keep
    assert rep["n_quality"] == len(quality_keep)
    assert rep["n_exact"] == len(exact_keep)
    assert rep["n_semdedup"] == len(sem_keep)
    assert rep["n_kept"] == len(keep)

    import pyarrow as pa

    keep_arr = pa.array(sorted(keep), pa.int64())
    out_ref = str(tmp_path / "ref")
    write_jsonl_shards(
        docs.map_batches(
            lambda b: b.filter(pc.is_in(b.column("doc_id"), value_set=keep_arr)),
            batch_format="pyarrow",
        ),
        out_ref,
        n_shards=4,
    )
    new_files = sorted(glob.glob(f"{out_new}/shard=*/part.jsonl.gz"))
    ref_files = sorted(glob.glob(f"{out_ref}/shard=*/part.jsonl.gz"))
    assert [f.split("/shard=")[1] for f in new_files] == [
        f.split("/shard=")[1] for f in ref_files
    ]
    for nf, rf in zip(new_files, ref_files):
        assert open(nf, "rb").read() == open(rf, "rb").read(), nf


def test_oov_rates_bruteforce():
    from collections import Counter

    import pyarrow.parquet as pq
    from go_htmldate_ray.sources.io import read_parquet_clean
    from go_htmldate_ray.stages.text_stage import oov_rates

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    counts = Counter()
    for txt in t.column("text").to_pylist():
        counts.update((txt or "").split())
    vocab = {
        tok
        for tok, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    }
    rows = oov_rates(
        read_parquet_clean(f"{SF}/documents.parquet", columns=["doc_id", "text"]),
        vocab_k=10,
    ).take_all()
    got = {r["doc_id"]: r for r in rows}
    for i, txt in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        toks = (txt or "").split()
        oov = sum(1 for tok in toks if tok not in vocab)
        assert got[i]["n_tokens"] == len(toks)
        assert got[i]["n_oov"] == oov
        assert got[i]["oov_ppm"] == (oov * 1_000_000 // len(toks) if toks else 0)


def test_xling_margin_planted_twins_match():
    from go_htmldate_ray.sources.io import read_parquet_clean
    from go_htmldate_ray.stages.similarity import xling_margin_pairs

    emb = read_parquet_clean(f"{SF}/embeddings.parquet")
    rows = xling_margin_pairs(emb, k=4).take_all()
    assert rows
    for r in rows:
        # every planted twin must match its own origin, with a strongly
        # positive margin (4x micro units: > 0.25 raw margin)
        assert r["matched_id"] == r["src_id"] - 5_000_000
        assert r["margin_micro4"] > 1_000_000


def test_containment_asymmetric_quote_detection():
    """A short doc quoted inside a long one: containment short→long is
    1.0 while long→short and the symmetric Jaccard stay low."""
    import ray.data
    from go_htmldate_ray.stages.dedup import containment_pairs

    short = "alpha beta gamma delta epsilon"
    long = "zero one two three four five six seven " * 5 + short
    ds = ray.data.from_items(
        [
            {"doc_id": 0, "text": short},
            {"doc_id": 1, "text": long},
            {"doc_id": 2, "text": "unrelated words only here now indeed"},
        ]
    )
    rows = containment_pairs(ds, min_containment_ppm=900_000).take_all()
    got = {(r["src_doc"], r["dst_doc"]): r["containment_ppm"] for r in rows}
    assert got[(0, 1)] == 1_000_000  # every shingle of the quote is in the host
    assert (1, 0) not in got  # the host is NOT contained in the quote
    assert (0, 2) not in got and (2, 0) not in got


def test_jl_projection_preserves_cosine_structure():
    """JL property: pairwise cosines in the 16-d projection track the
    64-d originals within a loose distortion tolerance."""
    import numpy as np
    import pyarrow.parquet as pq
    from go_htmldate_ray.sources.io import read_parquet_clean
    from go_htmldate_ray.stages.similarity import jl_project

    rows = jl_project(
        read_parquet_clean(f"{SF}/embeddings.parquet"), out_dim=16
    ).take_all()
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    orig = dict(
        zip(t.column("vec_id").to_pylist(), t.column("embedding").to_pylist())
    )
    def mean_err(rows_k, k):
        pk = {}
        for r in rows_k:
            pk.setdefault(r["vec_id"], [0.0] * k)[r["dim_id"]] = r["val"]
        ids = sorted(pk)[:40]
        P = np.asarray([pk[i] for i in ids])
        O = np.asarray([orig[i] for i in ids], dtype=np.float64)
        P /= np.linalg.norm(P, axis=1, keepdims=True)
        O /= np.linalg.norm(O, axis=1, keepdims=True)
        iu = np.triu_indices(len(ids), k=1)
        return float(np.mean(np.abs((P @ P.T)[iu] - (O @ O.T)[iu])))

    # JL distortion at k=16 scales ~1/sqrt(16): mean absolute cosine
    # error bounded, and it must SHRINK as k grows (the JL guarantee)
    err16 = mean_err(rows, 16)
    rows64 = jl_project(
        read_parquet_clean(f"{SF}/embeddings.parquet"), out_dim=64
    ).take_all()
    err64 = mean_err(rows64, 64)
    assert err16 < 0.3
    assert err64 < err16 / 1.5


def test_scalar_quantize_roundtrip_error_bounded():
    """Dequantized values must sit within half a quantization step of
    the originals, ids/dims must cover the full matrix, and a constant
    dimension must quantize to 0 everywhere."""
    import numpy as np
    import ray.data
    from go_htmldate_ray.stages.similarity import scalar_quantize

    rng = np.random.RandomState(2)
    vecs = rng.standard_normal((50, 8))
    vecs[:, 3] = 7.5  # constant dimension
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(50)],
        override_num_blocks=4,
    )
    rows = scalar_quantize(ds).take_all()
    assert len(rows) == 50 * 8
    lo, hi = vecs.min(axis=0), vecs.max(axis=0)
    for r in rows:
        d = r["dim_id"]
        if d == 3:
            assert r["q"] == 0
            continue
        step = (hi[d] - lo[d]) / 255
        deq = lo[d] + r["q"] * step
        assert abs(deq - vecs[r["vec_id"], d]) <= step / 2 + 1e-9


def test_skew_join_empty_right_side():
    """Hot keys + an empty right side must give an empty inner join,
    not a concat_tables crash (review-found edge, now pinned)."""
    import pyarrow as pa
    import ray.data
    from go_htmldate_ray.stages.joins import skew_join

    left = ray.data.from_items(
        [{"k": 1, "lv": i} for i in range(200)], override_num_blocks=4
    )
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array([], pa.int64()), "rv": pa.array([], pa.int64())})
    )
    got = skew_join(left, right, on="k", right_on="rk", hot_threshold=50).take_all()
    assert got == []
    # materialize_left path: same result, left pinned once
    got2 = skew_join(
        left, right, on="k", right_on="rk", hot_threshold=50, materialize_left=True
    ).take_all()
    assert got2 == []


def test_hot_path_subtrees_deep_trap_paths():
    """Depth-30 calendar-trap paths: the deepest >=threshold prefix wins
    and ancestors stay suppressed even through a 30-level chain."""
    import ray.data
    from go_htmldate_ray.stages.urlstats import hot_path_subtrees

    deep = "/".join(f"d{i}" for i in range(30))
    rows = [{"host": "t", "path": f"/{deep}/{j}.html"} for j in range(5)]
    ds = ray.data.from_items(rows, override_num_blocks=2)
    got = hot_path_subtrees(ds, threshold=4).take_all()
    assert len(got) == 1
    assert got[0]["prefix"] == f"/{deep}/" and got[0]["n_urls"] == 5


def test_heavy_hitters_trigrams():
    from collections import Counter

    import ray.data
    from go_htmldate_ray.stages.sketches import heavy_hitters

    docs = ["a b c d a b c", "a b c x y z", "x y z x y z"]
    ds = ray.data.from_items([{"text": t} for t in docs], override_num_blocks=2)
    got = {
        r["token"]: r["n"]
        for r in heavy_hitters(ds, threshold=2, support=1, ngram=3).take_all()
    }
    truth = Counter()
    for t in docs:
        w = t.split()
        truth.update(" ".join(w[i : i + 3]) for i in range(len(w) - 2))
    assert got == {tok: c for tok, c in truth.items() if c >= 2}
    assert "a b c" in got and got["a b c"] == 3


def test_cocitation_pairs_toy_graph():
    """Pair expansion + counting vs a hand-enumerated toy edge set."""
    import ray.data

    from go_htmldate_ray.stages.graph import cocitation_pairs

    edges = ray.data.from_arrow(
        pa.table(
            {
                "src_host": ["s1", "s1", "s1", "s2", "s2", "s3", "s1"],
                "dst_host": ["a", "b", "c", "a", "c", "b", "d"],
            }
        )
    )
    out = sorted(
        (r["host_a"], r["host_b"], r["n_common"])
        for r in cocitation_pairs(edges, min_common=1, n_buckets=4).take_all()
    )
    # s1 -> {a,b,c,d}: 6 pairs; s2 -> {a,c}: ac; s3 -> {b}: none
    assert out == [
        ("a", "b", 1),
        ("a", "c", 2),
        ("a", "d", 1),
        ("b", "c", 1),
        ("b", "d", 1),
        ("c", "d", 1),
    ]
    # threshold filters
    out2 = cocitation_pairs(edges, min_common=2, n_buckets=4).take_all()
    assert [(r["host_a"], r["host_b"], r["n_common"]) for r in out2] == [
        ("a", "c", 2)
    ]


def test_cocitation_out_degree_cap_is_loud():
    import ray.data

    from go_htmldate_ray.stages.graph import cocitation_pairs

    edges = ray.data.from_arrow(
        pa.table(
            {
                "src_host": ["hub"] * 5,
                "dst_host": [f"d{i}" for i in range(5)],
            }
        )
    )
    with pytest.raises(Exception, match="out-degree"):
        cocitation_pairs(edges, max_out_degree=4, n_buckets=2).take_all()


def test_string_connected_components_two_islands():
    import ray.data

    from go_htmldate_ray.stages.graph import (
        _host_id64,
        string_connected_components,
    )

    edges = ray.data.from_arrow(
        pa.table(
            {
                "src_host": ["a", "b", "x"],
                "dst_host": ["b", "c", "y"],
            }
        )
    )
    out = {
        r["host"]: r["component"]
        for r in string_connected_components(edges).take_all()
    }
    assert set(out) == {"a", "b", "c", "x", "y"}
    # each island labelled by its min-md5-id member, consistently
    abc_rep = min(["a", "b", "c"], key=_host_id64)
    xy_rep = min(["x", "y"], key=_host_id64)
    assert {out["a"], out["b"], out["c"]} == {abc_rep}
    assert {out["x"], out["y"]} == {xy_rep}


def test_char_entropy_batch_hand_computed():
    import math

    from go_htmldate_ray.stages.text_stage import char_entropy_batch

    batch = pa.table(
        {
            "doc_id": [7, 8, 9],
            "text": ["aab", "", "zzzz"],
        }
    )
    out = char_entropy_batch(batch)
    rows = {
        r["doc_id"]: (r["n_cp"], r["ent_term_nano"])
        for r in out.to_pylist()
    }
    # empty doc omitted
    assert set(rows) == {7, 9}
    # "aab": a count 2 (term floor(2 ln2 1e9 + .5)), b count 1 (term 0)
    assert rows[7] == (3, math.floor(2 * math.log(2) * 1e9 + 0.5))
    assert rows[9] == (4, math.floor(4 * math.log(4) * 1e9 + 0.5))
    # recoverable entropy: H = ln(n) - terms/(1e9 n); uniform "ab" = ln 2
    out2 = char_entropy_batch(pa.table({"doc_id": [1], "text": ["ab"]}))
    r = out2.to_pylist()[0]
    h = math.log(r["n_cp"]) - r["ent_term_nano"] / (1e9 * r["n_cp"])
    assert abs(h - math.log(2)) < 1e-9


def test_host_graph_queries_match_duckdb():
    """host_components / host_cocitation / char_entropy /
    lid_disagreement / crawl_delay_compliance vs their DuckDB oracles at
    sf0.001 (the driver gate runs sf0.01; this pins the same contract in
    pytest)."""
    import duckdb

    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    from tools.check_oracles import canon, to_pandas

    qs = entry.queries()
    oracles = entry.oracle_sql()
    for name in (
        "host_components",
        "host_cocitation",
        "host_bib_coupling",
        "host_quality_gate",
        "char_entropy",
        "lid_disagreement",
        "crawl_delay_compliance",
        "trustrank",
        "spam_mass",
        "badword_filter",
        "host_boilerplate",
    ):
        ray_df = canon(to_pandas(qs[name](SF)))
        duck_df = canon(con.sql(oracles[name]).df())
        duck_df = duck_df.astype(ray_df.dtypes.to_dict())
        assert ray_df.equals(duck_df), name


def test_trustrank_mass_stays_near_seeds():
    """Seeded teleport semantics: a node unreachable from any seed ends
    at 0; seeds keep the teleport base; total mass <= total."""
    import ray.data

    from go_htmldate_ray.stages.graph import pagerank

    # seed 0 -> 1 -> 2 chain, node 3 isolated (non-seed, no in-edges)
    nodes = ray.data.from_arrow(
        pa.table({"id": [0, 1, 2, 3], "is_seed": [1, 0, 0, 0]})
    )
    edges = ray.data.from_arrow(pa.table({"src": [0, 1], "dst": [1, 2]}))
    total = 10**15
    out = {
        r["doc_id"]: r["rank_units"]
        for r in pagerank(
            nodes, edges, iters=3, total=total, seed_col="is_seed"
        ).take_all()
    }
    assert set(out) == {0, 1, 2, 3}
    assert out[3] == 0  # no seed path, no teleport
    base = (total * 15) // 100  # one seed -> full base on node 0
    assert out[0] == base
    # node 1 receives 85% of node 0's previous rank each round
    assert out[1] == (base * 85) // 100
    assert 0 < out[2] <= (out[1] * 85) // 100 + 1
    assert sum(out.values()) <= total


def test_spam_mass_toy_graph():
    """A node fed only by non-seed links carries full (1000‰) spam
    mass; a seed node's mass is negative (over-trusted)."""
    import ray.data

    from go_htmldate_ray.stages.graph import spam_mass

    # seed 0 -> 1; spam cluster 2 -> 3 (unreachable from the seed)
    nodes = ray.data.from_arrow(
        pa.table({"id": [0, 1, 2, 3], "is_seed": [1, 0, 0, 0]})
    )
    edges = ray.data.from_arrow(pa.table({"src": [0, 2], "dst": [1, 3]}))
    out = {
        r["doc_id"]: r
        for r in spam_mass(nodes, edges, iters=2).take_all()
    }
    assert out[3]["tr_units"] == 0 and out[3]["pr_units"] > 0
    assert out[3]["spam_mass_permille"] == 1000
    assert out[0]["spam_mass_permille"] < 0  # seed: tr > pr
    # exact floor-division contract on a negative case
    p, t = out[0]["pr_units"], out[0]["tr_units"]
    assert out[0]["spam_mass_permille"] == ((p - t) * 1000) // p


def test_trustrank_requires_nonempty_seed_set():
    import ray.data

    from go_htmldate_ray.stages.graph import pagerank

    nodes = ray.data.from_arrow(pa.table({"id": [0, 1], "is_seed": [0, 0]}))
    edges = ray.data.from_arrow(pa.table({"src": [0], "dst": [1]}))
    with pytest.raises(ValueError, match="seed"):
        pagerank(nodes, edges, seed_col="is_seed")


def test_host_boilerplate_lines_toy():
    """Footer on every doc of a host is flagged; a unique line is not;
    the 50% nav line sits exactly on the >= threshold."""
    import hashlib as _h

    import ray.data

    from go_htmldate_ray.stages.cleaning import host_boilerplate_lines

    # doc_ids 0,97,194,291 all map to host site0; 1,98 to site1 (< min_docs)
    rows = {
        0: "unique zero\nfooter line",
        97: "unique ninetyseven\nfooter line\nnav line",
        194: "unique oneninetyfour\nfooter line\nnav line",
        291: "unique twoninetyone\nfooter line",
        1: "a\nfooter line",
        98: "b\nfooter line",
    }
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": list(rows),
                "text": list(rows.values()),
            }
        )
    )
    out = host_boilerplate_lines(ds, min_docs=3, min_per_mille=500)
    got = {
        (r["host"], r["line_md5"]): (r["n_docs_line"], r["per_mille"])
        for r in out.take_all()
    }
    md5 = lambda s: _h.md5(s.encode()).hexdigest()  # noqa: E731
    # footer: 4/4 docs of site0 -> flagged at 1000 permille
    assert got[("site0.example.org", md5("footer line"))] == (4, 1000)
    # nav: 2/4 -> exactly 500 permille, >= threshold keeps it
    assert got[("site0.example.org", md5("nav line"))] == (2, 500)
    # unique lines never flagged; site1 has only 2 docs (< min_docs)
    assert all(h == "site0.example.org" for h, _ in got)
    assert len(got) == 2


def test_badword_batch_rate_gate():
    from go_htmldate_ray.stages.cleaning import badword_batch

    batch = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "slow slow slow join",  # 3/4 bad -> drop at 5%
                " ".join(["scan"] * 40 + ["dup"]),  # 1/41 bad -> drop (>5%? 1000 <= 41*50=2050 -> keep)
                "clean text only here",
                "",
            ],
        }
    )
    out = {r["doc_id"]: r for r in badword_batch(batch).to_pylist()}
    assert (out[1]["n_bad"], out[1]["keep"]) == (3, 0)
    assert (out[2]["n_bad"], out[2]["n_tokens"], out[2]["keep"]) == (1, 41, 1)
    assert (out[3]["n_bad"], out[3]["keep"]) == (0, 1)
    assert (out[4]["n_tokens"], out[4]["keep"]) == (0, 1)
    # word-boundary: "slowly"/"dupfree" must not match
    out2 = badword_batch(
        pa.table({"doc_id": [9], "text": ["slowly dupfree backup"]})
    ).to_pylist()[0]
    assert out2["n_bad"] == 0
    # strict C4 semantics at max_bad_per_mille=0
    strict = badword_batch(
        pa.table({"doc_id": [5], "text": ["one dup here"]}),
        max_bad_per_mille=0,
    ).to_pylist()[0]
    assert strict["keep"] == 0


def test_jpeg_codec_roundtrip_color_and_gray():
    """Smooth-gradient round trip at quality 95 must land within a few
    levels per channel (PSNR > 40 dB); output is byte-deterministic."""
    import numpy as np

    from go_htmldate_ray.stages.jpeg import decode_jpeg, encode_jpeg

    h, w = 33, 45
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(yy * 255 / h), (xx * 255 / w), ((yy + xx) * 255 / (h + w))],
        axis=-1,
    ).astype(np.uint8)
    data = encode_jpeg(img, quality=95)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert encode_jpeg(img, quality=95) == data  # deterministic
    dec = decode_jpeg(data)
    assert dec.shape == img.shape and dec.dtype == np.uint8
    err = np.abs(dec.astype(int) - img.astype(int))
    mse = (err.astype(float) ** 2).mean()
    assert 10 * np.log10(255**2 / max(mse, 1e-9)) > 40
    assert err.max() <= 8
    # grayscale single-component path
    g = ((yy * 2 + xx) % 200).astype(np.uint8)
    d2 = decode_jpeg(encode_jpeg(g, quality=95))
    assert d2.shape == g.shape and d2.ndim == 2
    # non-multiple-of-8 1x1 edge
    one = np.array([[[10, 200, 30]]], dtype=np.uint8)
    d3 = decode_jpeg(encode_jpeg(one, quality=95))
    assert d3.shape == (1, 1, 3)
    assert np.abs(d3.astype(int) - one.astype(int)).max() <= 12


def _flat_jpeg_420(w: int, h: int, *, dri: int = 0) -> bytes:
    """Hand-crafted 4:2:0 color JPEG of a flat mid-gray (128) image —
    exercises the decoder's general-sampling MCU layout, chroma
    upsampling and (with dri) restart-marker handling, which the 4:4:4
    encoder never emits."""
    import numpy as np

    from go_htmldate_ray.stages import jpeg as J

    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        out.extend((0xFF, marker))
        out.extend((len(payload) + 2).to_bytes(2, "big"))
        out.extend(payload)

    q = J._scaled_quant(J._QUANT_LUM, 90)
    seg(0xDB, bytes([0]) + bytes(q.reshape(64)[J._ZIGZAG].astype(np.uint8)))
    # SOF0: Y h=2 v=2, Cb/Cr h=1 v=1, all quant table 0
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes(
        [3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    seg(0xC0, sof)
    seg(0xC4, bytes([0x00] + J._DC_LUM_BITS + J._DC_LUM_VALS))
    seg(0xC4, bytes([0x10] + J._AC_LUM_BITS + J._AC_LUM_VALS))
    if dri:
        seg(0xDD, dri.to_bytes(2, "big"))
    seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))

    dc = J._build_huffman_codes(J._DC_LUM_BITS, J._DC_LUM_VALS)
    ac = J._build_huffman_codes(J._AC_LUM_BITS, J._AC_LUM_VALS)
    mcus_x, mcus_y = -(-w // 16), -(-h // 16)
    n_mcus = mcus_x * mcus_y
    wtr = J._BitWriter()
    written = 0
    rst = 0
    for m in range(n_mcus):
        if dri and written and written % dri == 0:
            wtr.flush()
            out += wtr.buf
            wtr = J._BitWriter()
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
        # Y(128)->coef 0, Cb/Cr(128)->0: every block is DC diff 0 + EOB
        for _ in range(6):  # 4 Y + Cb + Cr
            c, l = dc[0]
            wtr.write(c, l)
            c, l = ac[0x00]
            wtr.write(c, l)
        written += 1
    wtr.flush()
    out += wtr.buf
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_decoder_420_sampling_and_restarts():
    import numpy as np

    from go_htmldate_ray.stages.jpeg import decode_jpeg

    img = decode_jpeg(_flat_jpeg_420(20, 18))
    assert img.shape == (18, 20, 3)
    assert np.all(img == 128)
    img2 = decode_jpeg(_flat_jpeg_420(36, 20, dri=1))
    assert img2.shape == (20, 36, 3)
    assert np.all(img2 == 128)


def test_jpeg_decoder_rejects_invalid_streams():
    import pytest as _pytest

    from go_htmldate_ray.stages.jpeg import decode_jpeg, encode_jpeg
    import numpy as np

    good = bytearray(encode_jpeg(np.full((8, 8), 99, np.uint8)))
    # flipping SOF0 -> SOF2 leaves a full-spectrum (Ss=0, Se=63) scan,
    # which is illegal under progressive rules (Ss=0 requires Se=0)
    i = good.find(b"\xff\xc0")
    prog = bytes(good[:i]) + b"\xff\xc2" + bytes(good[i + 2 :])
    with _pytest.raises(ValueError, match="progressive"):
        decode_jpeg(prog)
    # lossless / arithmetic SOF markers still reject loudly
    loss = bytes(good[:i]) + b"\xff\xc3" + bytes(good[i + 2 :])
    with _pytest.raises(ValueError, match="only baseline"):
        decode_jpeg(loss)
    with _pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not a jpeg")
    with _pytest.raises((ValueError, IndexError)):
        decode_jpeg(bytes(good[: len(good) // 2]))  # truncated stream


def test_jpeg_dhash_families_survive_lossy_roundtrip():
    """The planted-oracle contract: every family's dHash is identical
    before and after the lossy round trip, and all 37 are distinct."""
    from go_htmldate_ray.stages.jpeg import decode_jpeg
    from go_htmldate_ray.stages.multimodal import dhash64, synth_family_jpeg

    seen = {}
    for fam in range(37):
        payload = synth_family_jpeg(fam)
        import numpy as np

        x = np.arange(9)[None, :]
        y = np.arange(7)[:, None]
        bit = (fam >> (((x // 2) + 4 * y) % 6)) & 1
        gray = np.where(x % 2 == 0, 128, 104 + 48 * bit).astype(np.uint8)
        orig = np.repeat(gray[:, :, None], 3, axis=2)
        assert dhash64(decode_jpeg(payload)) == dhash64(orig), fam
        seen[dhash64(orig)] = fam
    assert len(seen) == 37


def test_jpeg_sniffed_by_decode_image():
    import numpy as np

    from go_htmldate_ray.stages.multimodal import decode_image
    from go_htmldate_ray.stages.jpeg import encode_jpeg

    img = np.full((9, 9, 3), 77, np.uint8)
    out = decode_image(encode_jpeg(img, quality=95))
    assert out.shape == (9, 9, 3)
    assert np.abs(out.astype(int) - 77).max() <= 3


def test_wav_codec_roundtrip_and_chunk_walk():
    import numpy as np

    from go_htmldate_ray.stages.multimodal import decode_wav, encode_wav

    s = (np.sin(np.linspace(0, 20, 500)) * 20000).astype(np.int16)
    dec, rate = decode_wav(encode_wav(s, rate=16000))
    assert rate == 16000
    assert np.array_equal(dec[:, 0], s.astype(np.int32))
    # stereo preserved per channel
    st = np.stack([s, -s], axis=1).astype(np.int16)
    dec2, _ = decode_wav(encode_wav(st))
    assert dec2.shape == (500, 2) and np.array_equal(dec2[:, 1], -s.astype(np.int32))
    # extra chunks (LIST) before data are skipped, odd sizes padded
    raw = bytearray(encode_wav(s))
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    wav = bytes(raw[:12]) + extra + bytes(raw[12:])
    wav = b"RIFF" + (len(wav) - 8).to_bytes(4, "little") + wav[8:]
    dec3, _ = decode_wav(wav)
    assert np.array_equal(dec3[:, 0], s.astype(np.int32))
    # 8-bit unsigned path: value 130 -> (130-128)*256 = 512
    fmt8 = (
        (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
    )
    body = (
        b"WAVEfmt " + len(fmt8).to_bytes(4, "little") + fmt8
        + b"data" + (2).to_bytes(4, "little") + bytes([130, 126])
    )
    dec4, _ = decode_wav(b"RIFF" + len(body).to_bytes(4, "little") + body)
    assert dec4[:, 0].tolist() == [512, -512]
    # rejects
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio at all")


def test_audio_window_stage_sniffs_wav():
    import numpy as np
    import ray.data

    from go_htmldate_ray.stages.multimodal import AudioWindowStage, encode_wav

    s = np.array([3, -4, 0, 0, 5, 12], dtype=np.int16)
    audio = ray.data.from_items(
        [{"media_id": 1, "payload": encode_wav(s)}]
    )
    rows = sorted(
        audio.map_batches(
            AudioWindowStage(window=2), batch_format="pyarrow"
        ).take_all(),
        key=lambda r: r["window_index"],
    )
    assert [round(r["rms"], 6) for r in rows] == [
        round((12.5) ** 0.5, 6),
        0.0,
        round((84.5) ** 0.5, 6),
    ]


def test_mjpeg_avi_container_roundtrip():
    import numpy as np

    from go_htmldate_ray.stages.jpeg import decode_jpeg, encode_jpeg
    from go_htmldate_ray.stages.multimodal import (
        avi_frame_payloads,
        encode_mjpeg_avi,
    )

    frames = [
        encode_jpeg(np.full((7, 9, 3), 40 * (k + 1), np.uint8), quality=95)
        for k in range(4)
    ]
    avi = encode_mjpeg_avi(frames, width=9, height=7)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    got = avi_frame_payloads(avi)
    assert got == frames  # payloads survive the container byte-exactly
    # decoded frames carry the per-frame levels
    for k, f in enumerate(got):
        img = decode_jpeg(f)
        assert abs(int(img.mean()) - 40 * (k + 1)) <= 3, k
    with pytest.raises(ValueError, match="AVI"):
        avi_frame_payloads(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="frames"):
        encode_mjpeg_avi([], width=9, height=7)


def test_gif_codec_roundtrip_interlace_and_kwkwk():
    import numpy as np

    from go_htmldate_ray.stages.multimodal import (
        decode_gif,
        decode_image,
        encode_gif,
        synth_family_gif,
    )

    pal = np.array([[0, 0, 0], [10, 20, 30], [200, 100, 50]], np.uint8)
    # LZW round trip is lossless and byte-deterministic
    idx = (np.arange(13 * 21).reshape(13, 21) % 3).astype(np.uint8)
    g = encode_gif(idx, pal)
    assert g[:6] == b"GIF87a" and encode_gif(idx, pal) == g
    assert np.array_equal(decode_gif(g), pal[idx])
    # KwKwK-heavy runs (the cScSc LZW corner)
    runs = np.tile(np.array([[1, 1, 1, 2, 2, 2, 1, 1, 1]], np.uint8), (40, 13))
    assert np.array_equal(decode_gif(encode_gif(runs, pal)), pal[runs])
    # code-size growth + 4096-entry dictionary reset
    big = (np.arange(200 * 300).reshape(200, 300) * 7919 % 64).astype(np.uint8)
    bpal = np.arange(64 * 3, dtype=np.uint8).reshape(64, 3)
    assert np.array_equal(decode_gif(encode_gif(big, bpal)), bpal[big])
    # interlaced decode: permute rows into pass order and set the flag
    h, w = 13, 9
    base = (np.arange(h * w).reshape(h, w) % 3).astype(np.uint8)
    order = [
        r
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
        for r in range(start, h, step)
    ]
    raw = bytearray(encode_gif(base[order], pal))
    i = raw.index(0x2C, 13 + 3 * 4)
    raw[i + 9] |= 0x40
    assert np.array_equal(decode_gif(bytes(raw)), pal[base])
    # sniffer dispatch + family synth decode
    assert decode_image(synth_family_gif(5)).shape == (7, 9, 3)
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTGIF" + bytes(20))


def test_jpeg_restart_with_stuffed_pad_and_fill_bytes():
    """The interval's closing pad byte may be a stuffed 0xFF (FF 00) and
    fill 0xFF bytes may precede RSTn — both must be stepped over."""
    import numpy as np

    from go_htmldate_ray.stages.jpeg import decode_jpeg

    base = _flat_jpeg_420(36, 20, dri=1)
    i = base.find(b"\xff\xd0")
    assert i > 0
    stuffed = base[:i] + b"\xff\x00" + base[i:]
    assert np.all(decode_jpeg(stuffed) == 128)
    filled = base[:i] + b"\xff" + base[i:]
    assert np.all(decode_jpeg(filled) == 128)


def test_jpeg_progressive_roundtrip():
    """SOF2 encode→decode: DC first+refinement, spectrally-split AC with
    successive approximation (Al=1→0), EOB runs and ZRL — the decoded
    pixels must equal the BASELINE decode of the same coefficients
    exactly (both reconstruct the identical quantized DCT data)."""
    import numpy as np

    from go_htmldate_ray.stages.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(7)
    cases = [
        rng.randint(0, 256, (8, 8)).astype(np.uint8),        # 1 block gray
        rng.randint(0, 256, (24, 33)).astype(np.uint8),      # padded gray
        rng.randint(0, 256, (17, 20, 3)).astype(np.uint8),   # padded color
        rng.randint(0, 256, (64, 48, 3)).astype(np.uint8),
        np.tile(np.linspace(0, 255, 64, dtype=np.uint8), (48, 1)),  # EOB runs
        np.full((40, 40, 3), 128, np.uint8),                 # pure EOB runs
    ]
    for img in cases:
        stream = encode_jpeg(img, quality=90, progressive=True)
        # really progressive: SOF2 present, multiple SOS segments
        assert b"\xff\xc2" in stream and stream.count(b"\xff\xda") >= 4
        assert np.array_equal(
            decode_jpeg(stream), decode_jpeg(encode_jpeg(img, quality=90))
        ), img.shape
    # deterministic bytes (the dedup contract)
    assert encode_jpeg(cases[3], progressive=True) == encode_jpeg(
        cases[3], progressive=True
    )
    # dHash-family planted margin holds for progressive streams too
    from go_htmldate_ray.stages.multimodal import dhash64, synth_family_jpeg

    for fam in range(0, 37, 5):
        prog = decode_jpeg(synth_family_jpeg(fam, progressive=True))
        base = decode_jpeg(synth_family_jpeg(fam))
        assert dhash64(prog) == dhash64(base)


def test_jpeg_multiscan_rejected_loudly():
    """A baseline file whose SOS names fewer components than SOF must
    raise, not silently return luma-only pixels."""
    import numpy as np

    from go_htmldate_ray.stages.jpeg import decode_jpeg, encode_jpeg

    data = bytearray(encode_jpeg(np.full((8, 8, 3), 90, np.uint8)))
    i = data.find(b"\xff\xda")
    # original SOS payload: len(2) ns=3 (id,tt)*3 spectral(3) = 12 bytes
    one_comp = b"\xff\xda" + (8).to_bytes(2, "big") + bytes([1, 1, 0x00, 0, 63, 0])
    data = data[:i] + one_comp + data[i + 2 + 12 :]
    with pytest.raises(ValueError, match="multi-scan"):
        decode_jpeg(bytes(data))


def test_audio_sniff_riff_coincidence_falls_back():
    """Raw PCM whose first samples spell 'RIFF' must fall back to the
    raw interpretation, not crash the stage."""
    import numpy as np

    from go_htmldate_ray.stages.multimodal import _audio_samples

    payload = b"RIFF" + np.array([100, -100], np.int16).tobytes()
    out = _audio_samples(payload)
    expect = np.frombuffer(payload, dtype="<i2").astype(np.float64)
    assert np.array_equal(out, expect)


def test_mn_date_rejects_out_of_range_runs():
    from go_htmldate_ray.functions.patterns import lenient_absolute_parse

    # '40' must not parse as day 4; '152' must not parse as day 15
    assert lenient_absolute_parse("2020 оны 3 сарын 40") is None
    assert lenient_absolute_parse("2020 оны 3 сарын 152") is None
    assert lenient_absolute_parse("2020 оны 133 сарын 5") is None


def test_page_link_stats_counts_real_anchors():
    import __ray_entry__ as entry

    rows = {
        r["doc_id"]: r
        for r in entry.queries()["page_link_stats"](SF).take_all()
    }
    n = len(rows)
    assert n > 0
    # every synthesized page carries exactly the two formula anchors
    d = 3
    t1, t2 = (13 * d + 1) % n, (29 * d + 7) % n
    expect_ext = sum(1 for t in (t1, t2) if t % 97 != d % 97)
    r = rows[d]
    assert r["n_links"] == 2
    assert r["n_external"] == expect_ext
    assert r["n_distinct_hosts"] == len({t1 % 97, t2 % 97})


def test_trusted_frontier_differs_from_pagerank_frontier():
    """The anti-spam variant must actually change the budget: the two
    top-100 sets differ on the fixture graph (trust concentrates near
    the doc_id % 17 seeds)."""
    import __ray_entry__ as entry

    qs = entry.queries()
    pr = {r["doc_id"] for r in qs["frontier_priority"](SF).take_all()}
    tr = {r["doc_id"] for r in qs["trusted_frontier_priority"](SF).take_all()}
    assert len(pr) == 100 and len(tr) == 100
    assert pr != tr


def test_spotsigs_pairs_toy_and_pruning():
    import ray.data

    from go_htmldate_ray.stages.dedup import _spot_signatures, spotsigs_pairs

    # signature extraction: anchors, chain skip-over-stopwords, short
    # tails dropped ('a' and the final 'the' see only one follower)
    assert _spot_signatures("the quick fox saw a the cat") == {"quick fox"}
    assert "quick fox" in _spot_signatures("the quick fox ran")
    assert _spot_signatures("word the") == set()  # no followers -> dropped
    assert _spot_signatures("the a the a") == set()  # only stopwords

    t1 = "the quick fox ran over the lazy dog near a tall tree today"
    t2 = "the quick fox ran over the lazy dog near a tall oak today"
    t3 = "scan merge join group sort the window batch stream a value filter"
    ds = ray.data.from_arrow(
        pa.table({"doc_id": [1, 2, 3], "text": [t1, t2, t3]})
    )
    out = spotsigs_pairs(ds, threshold_ppm=300000).take_all()
    assert [(r["doc_a"], r["doc_b"], r["jaccard_ppm"]) for r in out] == [
        (1, 2, 500000)
    ]
    # threshold above the pair's jaccard filters it
    assert spotsigs_pairs(ds, threshold_ppm=600000).take_all() == []
    # df pruning: a signature shared by EVERY doc generates no candidates
    common = ["the common tail word%d extra" % i for i in range(6)]
    ds2 = ray.data.from_arrow(
        pa.table({"doc_id": list(range(6)), "text": common})
    )
    assert (
        spotsigs_pairs(ds2, threshold_ppm=100000, max_df=4).take_all() == []
    )
    # loud candidate bound
    dup = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [10, 11],
                "text": ["the same rare tail here"] * 2,
            }
        )
    )
    with pytest.raises(ValueError, match="candidate docs"):
        spotsigs_pairs(dup, max_candidate_docs=1).take_all()


def test_spotsigs_docid_bounds_and_whitespace():
    """Pair keys pack (a << 32) | b — out-of-range doc_ids must raise
    loudly, and tokenization must agree with the oracle's RE2 split on
    tab/newline/multi-space text."""
    import ray.data

    from go_htmldate_ray.stages.dedup import _spot_signatures, spotsigs_pairs

    assert _spot_signatures("the quick\tfox  saw a\nthe cat") == {"quick fox"}

    bad = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [1, 1 << 32],
                "text": ["the rare tail one", "the rare tail one"],
            }
        )
    )
    # the raise happens inside a Ray task, so it surfaces wrapped in
    # RayTaskError — match the message, not the (rewrapped) type
    with pytest.raises(Exception, match=r"doc_id .* outside \[0, 2\^32\)"):
        spotsigs_pairs(bad).take_all()


def test_jpeg_truncated_raises_valueerror():
    """Truncations anywhere — header, segment body, entropy data — must
    surface as the documented ValueError, never a bare IndexError."""
    import numpy as np

    from go_htmldate_ray.stages.jpeg import decode_jpeg, encode_jpeg

    img = (np.arange(24 * 24 * 3, dtype=np.uint32) % 251).astype(
        np.uint8
    ).reshape(24, 24, 3)
    data = encode_jpeg(img, quality=90)
    for cut in (3, 8, 40, len(data) // 2, len(data) - 3):
        with pytest.raises(ValueError):
            decode_jpeg(data[:cut])
    # a lone trailing 0xFF (half a marker) is also a truncation
    with pytest.raises(ValueError):
        decode_jpeg(data[:2] + b"\xff")


def test_host_boilerplate_host_col():
    """host_col generalizes the fixture's doc_id % 97 map: explicit host
    strings group the line stats, and the line 1 uniqueness /
    footer 100% / nav ~50% behavior is preserved."""
    import hashlib

    import ray.data

    from go_htmldate_ray.stages.cleaning import host_boilerplate_lines

    rows = []
    for host in ("alpha.example", "beta.example"):
        for i in range(4):
            lines = [f"unique body {host} {i}", f"footer of {host}"]
            if i % 2 == 0:
                lines.append(f"nav of {host}")
            rows.append(
                {"doc_id": len(rows), "host": host, "text": "\n".join(lines)}
            )
    ds = ray.data.from_items(rows)
    out = host_boilerplate_lines(ds, min_docs=3, host_col="host").take_all()
    got = {(r["host"], r["line_md5"]): r for r in out}
    for host in ("alpha.example", "beta.example"):
        foot = hashlib.md5(f"footer of {host}".encode()).hexdigest()
        nav = hashlib.md5(f"nav of {host}".encode()).hexdigest()
        assert got[(host, foot)]["n_docs_line"] == 4
        assert got[(host, foot)]["n_docs_host"] == 4
        assert got[(host, foot)]["per_mille"] == 1000
        assert got[(host, nav)]["n_docs_line"] == 2  # exactly the threshold
        assert got[(host, nav)]["per_mille"] == 500
    # unique body lines never flagged
    assert len(out) == 4


def test_tree_combine_levels_agree_and_match_groupby():
    """tree_combine levels=1 and levels=2 produce identical grouped sums,
    and both equal the plain Ray groupby aggregate — the bit-exactness
    contract the small-aggregate fast path rests on."""
    import ray.data
    from ray.data.aggregate import Sum

    from go_htmldate_ray.stages.combine import tree_combine

    rows = [
        {"k": f"g{i % 5}", "part_sum": float(i), "part_count": i % 3 + 1}
        for i in range(200)
    ]
    ds = ray.data.from_items(rows).repartition(8)

    def combine(batch: pa.Table) -> pa.Table:
        t = batch.group_by("k").aggregate(
            [("part_sum", "sum"), ("part_count", "sum")]
        )
        return pa.table(
            {
                "k": t.column("k"),
                "part_sum": t.column("part_sum_sum"),
                "part_count": t.column("part_count_sum"),
            }
        )

    def norm(rows_out):
        return sorted(
            (r["k"], r["part_sum"], int(r["part_count"])) for r in rows_out
        )

    one = norm(tree_combine(ds, combine).take_all())
    two = norm(tree_combine(ds, combine, levels=2, fanin=3).take_all())
    ref = norm(
        {
            "k": r["k"],
            "part_sum": r["sum(part_sum)"],
            "part_count": r["sum(part_count)"],
        }
        for r in ds.groupby("k").aggregate(Sum("part_sum"), Sum("part_count")).take_all()
    )
    assert one == two == ref
    assert len(one) == 5


def test_tree_combine_rejects_bad_levels():
    import ray.data

    from go_htmldate_ray.stages.combine import tree_combine

    ds = ray.data.from_items([{"k": "a", "part_sum": 1.0, "part_count": 1}])
    try:
        tree_combine(ds, lambda b: b, levels=3)
    except ValueError as e:
        assert "levels" in str(e)
    else:
        raise AssertionError("levels=3 should raise")


def test_grouped_split_is_leakage_safe():
    """grouped_split: every row of a group lands in one split, labels are
    deterministic in (seed, group), and bad fractions raise."""
    import ray.data

    from go_htmldate_ray.stages.sampling import grouped_split

    rows = [
        {"doc_id": i, "source": f"src{i % 7}"} for i in range(210)
    ]
    ds = ray.data.from_items(rows).repartition(6)
    out = grouped_split(ds, group_col="source", seed=11).take_all()
    by_group: dict = {}
    for r in out:
        by_group.setdefault(r["source"], set()).add(r["split"])
    assert all(len(v) == 1 for v in by_group.values())
    assert set().union(*by_group.values()) <= {"train", "val", "test"}
    # deterministic rerun
    out2 = grouped_split(ds, group_col="source", seed=11).take_all()
    assert sorted((r["doc_id"], r["split"]) for r in out) == sorted(
        (r["doc_id"], r["split"]) for r in out2
    )
    try:
        grouped_split(ds, group_col="source", fractions=(0.9, 0.2))
    except ValueError:
        pass
    else:
        raise AssertionError("fractions summing > 1 should raise")


def test_split_contamination_labels_and_totals():
    """split_contamination: totals equal the minhash pair count and each
    label pair follows the dataset_split md5 rule."""
    import ray.data

    from go_htmldate_ray.pipelines.curation import split_contamination
    from go_htmldate_ray.stages.dedup import minhash_lsh_pairs
    from go_htmldate_ray.stages.sampling import _HALF_RANGE, _keep_hash

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = []
    for i in range(30):
        # planted near-dup families of 3 sharing identical text
        rows.append({"doc_id": i, "text": f"{base} family{i // 3}"})
    ds = ray.data.from_items(rows).repartition(4)
    out = split_contamination(ds, hot_buckets="error").take_all()
    n_pairs = minhash_lsh_pairs(ds, hot_buckets="error").count()
    assert sum(r["n_pairs"] for r in out) == n_pairs > 0

    def label(i):
        u = _keep_hash(11, i)
        return (
            "train"
            if u < int(0.8 * _HALF_RANGE)
            else "val" if u < int(0.9 * _HALF_RANGE) else "test"
        )

    from collections import Counter

    expect = Counter()
    for r in minhash_lsh_pairs(ds, hot_buckets="error").take_all():
        expect[(label(r["doc_a"]), label(r["doc_b"]))] += 1
    got = {(r["split_a"], r["split_b"]): r["n_pairs"] for r in out}
    assert got == dict(expect)
