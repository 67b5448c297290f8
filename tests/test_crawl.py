"""Frontier crawl scheduler tests: determinism, politeness, robots,
seen-set exactness, checkpoint/resume equivalence (north-rule criteria)."""

import uuid

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _ns():
    return f"test-{uuid.uuid4().hex[:8]}"


def _run(tmp_path=None, **kw):
    from go_htmldate_ray.pipelines.crawl import crawl

    kw.setdefault("namespace", _ns())
    kw.setdefault("max_waves", 40)
    visited, stats = crawl(SF, **kw)
    rows = visited.take_all()
    rows.sort(key=lambda r: (r["wave"], r["host"], r["fetch_rank"]))
    return rows, stats


def test_crawl_deterministic_ordering():
    rows1, _ = _run()
    rows2, _ = _run()
    assert [
        (r["wave"], r["host"], r["fetch_rank"], r["url"]) for r in rows1
    ] == [(r["wave"], r["host"], r["fetch_rank"], r["url"]) for r in rows2]


def test_no_url_visited_twice():
    rows, stats = _run()
    urls = [r["url"] for r in rows]
    assert len(urls) == len(set(urls))
    assert stats["seen_total"] >= len(urls)


def test_politeness_budget_respected():
    budget = 2
    rows, _ = _run(politeness_budget=budget)
    from collections import Counter

    per_wave_host = Counter((r["wave"], r["host"]) for r in rows)
    assert max(per_wave_host.values()) <= budget


def test_priority_fn_orders_within_host():
    """With a priority_fn, each host's wave budget goes to the best-
    priority URLs ((prio, depth, url) order), on both the driver path
    and the dataset path; default behavior is unchanged."""
    from go_htmldate_ray.pipelines.crawl import doc_id_of_url

    def prio(u):
        d = doc_id_of_url(u)
        return -(d if d is not None else 0)  # highest doc_id first

    for extra in ({}, {"small_wave_threshold": 0}):
        rows, _ = _run(max_waves=6, priority_fn=prio, **extra)
        by_group = {}
        for r in rows:
            by_group.setdefault((r["wave"], r["host"]), []).append(r)
        multi = 0
        for grp in by_group.values():
            grp.sort(key=lambda r: r["fetch_rank"])
            keys = [(prio(r["url"]), r["depth"], r["url"]) for r in grp]
            assert keys == sorted(keys), grp
            multi += len(grp) > 1
        assert multi > 0  # the assertion actually exercised something

    # identical run without priority_fn differs (doc ids ascend instead)
    base_rows, _ = _run(max_waves=6)
    pr_rows, _ = _run(max_waves=6, priority_fn=prio)
    assert [r["url"] for r in base_rows] != [r["url"] for r in pr_rows]


def test_robots_disallowed_never_fetched():
    rows, stats = _run()
    for r in rows:
        host_idx = int(r["host"].split(".")[0].removeprefix("site"))
        if host_idx % 13 == 0:
            assert "/article/" not in r["url"], r
    assert stats["robots_denied"] > 0


def test_crawl_delay_caps_per_wave_fetches():
    """Hosts declaring Crawl-delay: 2 (index % 11 == 3) get at most
    budget // 2 fetches per wave — the wave-discretized token bucket —
    on BOTH the driver and the dataset wave paths, and the crawl still
    converges to the same visited set as an undelayed-budget run."""
    from collections import Counter

    budget = 4
    for extra in ({}, {"small_wave_threshold": 0}):
        rows, _ = _run(politeness_budget=budget, **extra)
        per_wave_host = Counter((r["wave"], r["host"]) for r in rows)
        saw_delay_host = False
        for (wave, host), n in per_wave_host.items():
            idx = int(host.split(".")[0].removeprefix("site"))
            if idx % 11 == 3:
                assert n <= budget // 2, (wave, host, n)
                saw_delay_host = saw_delay_host or n == budget // 2
            else:
                assert n <= budget, (wave, host, n)
        assert saw_delay_host  # the cap actually binds somewhere

    # delays defer, never drop: visited set == a no-delay-capped
    # high-budget run's set
    big, _ = _run(politeness_budget=1000)
    assert {r["url"] for r in rows} == {r["url"] for r in big}


def test_parse_sitemap():
    from go_htmldate_ray.sources.sitemap import (
        parse_sitemap,
        synthetic_sitemap_xml,
    )

    xml = """<?xml version="1.0"?>
    <urlset>
      <url><loc>https://a.org/x</loc><lastmod>2020-01-02</lastmod></url>
      <url><loc> https://a.org/y </loc></url>
      <url><lastmod>orphan</lastmod></url>
      <notaurl><loc>https://a.org/z</loc></notaurl>
    </urlset>"""
    assert parse_sitemap(xml) == [
        ("https://a.org/x", "2020-01-02"),
        ("https://a.org/y", ""),
    ]
    assert parse_sitemap("") == []
    assert parse_sitemap("<urlset></urlset>") == []

    # synthetic sitemap covers exactly the host's page space
    from go_htmldate_ray.sources.pages import page_date, page_url

    ents = parse_sitemap(synthetic_sitemap_xml("site3.example.org", 500))
    assert [u for u, _ in ents] == [page_url(d) for d in range(3, 500, 97)]
    assert all(
        m == page_date(d).isoformat()
        for (_, m), d in zip(ents, range(3, 500, 97))
    )
    assert parse_sitemap(synthetic_sitemap_xml("other.example.com", 500)) == []


def test_sitemap_index_expansion():
    from go_htmldate_ray.sources.sitemap import (
        expand_sitemap,
        parse_sitemap_index,
    )

    index = """<?xml version="1.0"?>
    <sitemapindex>
      <sitemap><loc>https://a.org/sm1.xml</loc><lastmod>2024-01-01</lastmod></sitemap>
      <sitemap><loc> https://a.org/sm2.xml </loc></sitemap>
    </sitemapindex>"""
    assert parse_sitemap_index(index) == [
        "https://a.org/sm1.xml",
        "https://a.org/sm2.xml",
    ]
    assert parse_sitemap_index("<urlset></urlset>") == []

    store = {
        "https://a.org/sm1.xml": "<urlset><url><loc>https://a.org/p1</loc>"
        "<lastmod>2020-05-06</lastmod></url></urlset>",
        "https://a.org/sm2.xml": "<urlset><url><loc>https://a.org/p2</loc></url></urlset>",
    }
    got = expand_sitemap(index, lambda u: store.get(u, ""))
    assert got == [("https://a.org/p1", "2020-05-06"), ("https://a.org/p2", "")]

    # plain urlset passes straight through
    assert expand_sitemap(store["https://a.org/sm2.xml"], lambda u: "") == [
        ("https://a.org/p2", "")
    ]

    # cyclic index terminates at the depth bound with no entries
    cyc = "<sitemapindex><sitemap><loc>https://a.org/self.xml</loc></sitemap></sitemapindex>"
    assert expand_sitemap(cyc, lambda u: cyc) == []
    # missing child fetches degrade to nothing, never raise
    assert expand_sitemap(index, lambda u: "") == []


def test_robots_sitemap_directives():
    from go_htmldate_ray.state.robots import (
        parse_sitemap_directives,
        synthetic_robots_txt,
    )

    txt = (
        "User-agent: *\nDisallow: /private/\n"
        "Sitemap: https://a.org/sitemap.xml\n"
        "# Sitemap: https://a.org/commented.xml\n"
        "User-agent: other\n"
        "Sitemap: https://a.org/sm2.xml\n"  # global directive: still counts
        "sitemap:https://a.org/sm3.xml\n"  # case/space tolerant
    )
    assert parse_sitemap_directives(txt) == [
        "https://a.org/sitemap.xml",
        "https://a.org/sm2.xml",
        "https://a.org/sm3.xml",
    ]
    assert parse_sitemap_directives("") == []
    # every synthetic host declares its sitemap; foreign hosts none
    assert parse_sitemap_directives(synthetic_robots_txt("site5.example.org")) == [
        "https://site5.example.org/sitemap.xml"
    ]
    assert parse_sitemap_directives(synthetic_robots_txt("other.com")) == []


def test_sitemap_from_robots_matches_direct(ray_session):
    from go_htmldate_ray.sources.sitemap import (
        sitemap_urls,
        sitemap_urls_from_robots,
    )

    sf = "/root/testdata/sf0.001"
    direct = {
        (r["host"], r["url"], r["lastmod"]) for r in sitemap_urls(sf).take_all()
    }
    via_robots = {
        (r["host"], r["url"], r["lastmod"])
        for r in sitemap_urls_from_robots(sf).take_all()
    }
    assert via_robots == direct
    assert direct


def test_sitemap_seeds_crawl():
    """Seeding the crawl from one host's sitemap fetches exactly that
    host's pages plus their robots-allowed link closure."""
    from go_htmldate_ray.pipelines.crawl import crawl
    from go_htmldate_ray.sources.pages import count_documents
    from go_htmldate_ray.sources.sitemap import (
        parse_sitemap,
        synthetic_sitemap_xml,
    )

    n = count_documents(SF)
    seeds = [u for u, _ in parse_sitemap(synthetic_sitemap_xml("site1.example.org", n))]
    assert seeds
    visited, stats = crawl(
        SF, seeds=seeds, namespace=_ns(), max_waves=40, politeness_budget=1000
    )
    urls = {r["url"] for r in visited.take_all()}
    assert set(seeds) <= urls  # every sitemap URL of the host was fetched
    import shutil

    shutil.rmtree(stats["checkpoint_dir"], ignore_errors=True)


def test_prededup_pack_unpack_parity():
    """The all-Arrow pack in _prededup_block must produce byte-identical
    packed keys to the scalar _pack_rows layout (the Min aggregate
    compares them lexicographically across blocks), and _unpack_frontier
    must invert it exactly."""
    import pyarrow as pa

    from go_htmldate_ray.pipelines.crawl import (
        _pack_rows,
        _prededup_block,
        _unpack_frontier,
    )

    urls = ["https://a.org/x", "https://b.org/y", "https://a.org/x"]
    batch = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "url_hash": pa.array([5, 9, 5], pa.int64()),
            "host": pa.array(["a.org", "b.org", "a.org"], pa.string()),
            "depth": pa.array([3, 0, 1], pa.int64()),
            "discovered_wave": pa.array([1, 2, 0], pa.int64()),
        }
    )
    out = _prededup_block(batch)
    # per-hash packed minimum inside the block: (1,0) beats (3,1) for hash 5
    assert sorted(out.column("packed").to_pylist()) == sorted(
        _pack_rows([1, 0], [0, 2], [urls[0], urls[1]])
    )
    rt = _unpack_frontier(
        pa.table(
            {
                "url_hash": out.column("url_hash"),
                "min(packed)": out.column("packed"),
            }
        )
    ).to_pylist()
    assert {
        (r["url"], r["host"], r["depth"], r["discovered_wave"]) for r in rt
    } == {(urls[0], "a.org", 1, 0), (urls[1], "b.org", 0, 2)}


def test_host_of_canonical_batch_matches_scalar():
    """The vectorized host kernel used by the wave unpack must agree
    with urlsplit-based host_of on every canonicalize() output."""
    import pyarrow as pa

    from go_htmldate_ray.state.urls import (
        canonicalize,
        host_of,
        host_of_canonical_batch,
    )

    raw = [
        "https://SiteX.Example.org/a/b",
        "http://user:pw@host.com:8080/x",
        "https://h.org:443/q?x=1#frag",
        "http://h.org:80/",
        "https://a.b.c:9999",
        "not a url",
        "",
        "https://h.org/path:8080/x",
        "https://h.org?q=1",
        "https://site0.example.org/article/0.html",
    ]
    canon = [canonicalize(u) for u in raw]
    vec = host_of_canonical_batch(pa.array(canon, pa.string())).to_pylist()
    assert vec == [host_of(u) for u in canon]


def test_parse_crawl_delay():
    from go_htmldate_ray.state.robots import (
        parse_crawl_delay,
        synthetic_robots_txt,
    )

    assert parse_crawl_delay("User-agent: *\nCrawl-delay: 2\n") == 2.0
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: 1.5\n") == 1.5
    assert parse_crawl_delay("User-agent: x\nCrawl-delay: 9\n") == 0.0
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: soon\n") == 0.0
    assert parse_crawl_delay("User-agent: *\nAllow: /\n") == 0.0
    assert parse_crawl_delay(synthetic_robots_txt("site3.example.org")) == 2.0
    assert parse_crawl_delay(synthetic_robots_txt("site4.example.org")) == 0.0
    # host 91: % 13 == 0 (disallow) AND % 11 == 3 (delay) — both apply
    txt = synthetic_robots_txt("site91.example.org")
    assert "Disallow: /article/" in txt and parse_crawl_delay(txt) == 2.0


def test_host_budget_rule():
    from go_htmldate_ray.pipelines.crawl import _host_budget

    assert _host_budget(4, 0.0) == 4
    assert _host_budget(4, 2.0) == 2
    assert _host_budget(4, 1.5) == 2
    assert _host_budget(4, 10.0) == 1   # floored at 1: progress guaranteed
    assert _host_budget(1000, 2.0) == 500


def test_dates_extracted_during_crawl():
    rows, _ = _run(max_waves=3)
    from go_htmldate_ray.sources.pages import page_date

    assert rows
    for r in rows:
        assert r["date_str"] == page_date(r["doc_id"]).isoformat()


def test_checkpoint_resume_equivalence(tmp_path):
    from go_htmldate_ray.pipelines.crawl import crawl

    # Uninterrupted reference run
    full_rows, full_stats = _run()

    # Interrupted run: stop after 3 waves, then resume from checkpoint
    ckpt = str(tmp_path / "ckpt")
    ns = _ns()
    crawl(SF, namespace=ns, max_waves=3, checkpoint_dir=ckpt)
    visited, stats = crawl(
        SF, namespace=ns, max_waves=40, checkpoint_dir=ckpt, resume=True
    )
    rows = visited.take_all()
    rows.sort(key=lambda r: (r["wave"], r["host"], r["fetch_rank"]))

    assert [
        (r["wave"], r["host"], r["fetch_rank"], r["url"]) for r in rows
    ] == [(r["wave"], r["host"], r["fetch_rank"], r["url"]) for r in full_rows]
    assert stats["seen_total"] == full_stats["seen_total"]


def test_resume_from_legacy_robots_checkpoint(tmp_path):
    """Checkpoints written before the per-wave robots deltas carried ONE
    full robots.json — resume must still load it (and a checkpoint with
    NO robots state at all must also resume: robots is a cache, missing
    hosts re-resolve deterministically)."""
    import glob
    import json as _json
    import os

    from go_htmldate_ray.pipelines.crawl import crawl

    full_rows, _ = _run()

    ckpt = str(tmp_path / "ckpt-legacy")
    crawl(SF, namespace=_ns(), max_waves=3, checkpoint_dir=ckpt)
    # fold the per-wave deltas into the legacy full-dump layout
    rules: dict = {}
    delays: dict = {}
    for p in sorted(glob.glob(os.path.join(ckpt, "robots_delta_*.json"))):
        d = _json.loads(open(p).read())
        rules.update(d["rules"])
        delays.update(d["delays"])
        os.remove(p)
    assert rules  # the crawl resolved hosts
    open(os.path.join(ckpt, "robots.json"), "w").write(
        _json.dumps({"rules": rules, "delays": delays})
    )
    visited, _ = crawl(
        SF, namespace=_ns(), max_waves=40, checkpoint_dir=ckpt, resume=True
    )
    assert sorted(r["url"] for r in visited.take_all()) == sorted(
        r["url"] for r in full_rows
    )

    # no robots state at all: still resumes (cache re-fills)
    ckpt2 = str(tmp_path / "ckpt-none")
    crawl(SF, namespace=_ns(), max_waves=3, checkpoint_dir=ckpt2)
    for p in glob.glob(os.path.join(ckpt2, "robots_delta_*.json")):
        os.remove(p)
    visited2, _ = crawl(
        SF, namespace=_ns(), max_waves=40, checkpoint_dir=ckpt2, resume=True
    )
    assert sorted(r["url"] for r in visited2.take_all()) == sorted(
        r["url"] for r in full_rows
    )


def test_resume_across_actor_loss(tmp_path):
    """Resume must rebuild seen/robots state from the checkpoint files even
    when the actors are gone (fresh namespace = simulated restart)."""
    from go_htmldate_ray.pipelines.crawl import crawl

    full_rows, _ = _run()

    ckpt = str(tmp_path / "ckpt2")
    crawl(SF, namespace=_ns(), max_waves=3, checkpoint_dir=ckpt)
    visited, _ = crawl(
        SF, namespace=_ns(), max_waves=40, checkpoint_dir=ckpt, resume=True
    )
    rows = visited.take_all()
    assert sorted(r["url"] for r in rows) == sorted(r["url"] for r in full_rows)


def test_token_bucket_deterministic():
    from go_htmldate_ray.state.politeness import TokenBucket

    b = TokenBucket(rate=1.0, capacity=4.0, now=0.0)
    assert b.grant(10, 0.0) == 4          # burst capacity
    assert b.grant(1, 0.5) == 0           # refill 0.5 tokens: not enough
    assert b.grant(1, 1.5) == 1           # 1.5 tokens accumulated
    assert b.grant(10, 100.0) == 4        # capped at capacity


def test_politeness_shard_actor(ray_session):
    import ray

    from go_htmldate_ray.state.politeness import PolitenessShard

    shard = PolitenessShard.remote(default_rate=2.0, default_capacity=2.0)
    got = ray.get(shard.grant.remote([("a.com", 5), ("b.com", 1)], now=0.0))
    assert got == [2, 1]
    got = ray.get(shard.grant.remote([("a.com", 5)], now=1.0))
    assert got == [2]  # 2 tokens/s refill, capped at capacity
    ray.get(shard.set_crawl_delay.remote("a.com", 10.0))
    got = ray.get(shard.grant.remote([("a.com", 5)], now=2.0))
    assert got == [2]  # fresh bucket at burst capacity
    got = ray.get(shard.grant.remote([("a.com", 5)], now=3.0))
    assert got == [0]  # 0.1 tokens/s: none accumulated in 1s
    ray.kill(shard)


def test_dataset_wave_path_equivalent():
    """Forcing every wave through the full Ray-Data shuffle path
    (small_wave_threshold=0) must produce the same visited set and
    ordering as the driver-side fast path."""
    fast_rows, _ = _run(max_waves=6)
    ds_rows, _ = _run(max_waves=6, small_wave_threshold=0)
    key = lambda rows: [
        (r["wave"], r["host"], r["fetch_rank"], r["url"]) for r in rows
    ]
    assert key(ds_rows) == key(fast_rows)


def test_dataset_path_resume_equivalence(tmp_path):
    """Resume works across the dataset path's directory-format
    checkpoints (frontier_{w}/ and visited_{w}/ parquet parts), and a
    mixed run (interrupted dataset-path, resumed dataset-path) matches
    the uninterrupted driver-path crawl."""
    from go_htmldate_ray.pipelines.crawl import crawl

    full_rows, full_stats = _run()

    ckpt = str(tmp_path / "dsckpt")
    ns = _ns()
    crawl(SF, namespace=ns, max_waves=3, checkpoint_dir=ckpt,
          small_wave_threshold=0)
    visited, stats = crawl(
        SF, namespace=ns, max_waves=40, checkpoint_dir=ckpt, resume=True,
        small_wave_threshold=0,
    )
    rows = visited.take_all()
    rows.sort(key=lambda r: (r["wave"], r["host"], r["fetch_rank"]))
    assert [
        (r["wave"], r["host"], r["fetch_rank"], r["url"]) for r in rows
    ] == [(r["wave"], r["host"], r["fetch_rank"], r["url"]) for r in full_rows]
    assert stats["seen_total"] == full_stats["seen_total"]


def test_wave_rerun_idempotent_after_partial_crash(tmp_path):
    """Regression: Ray write_parquet APPENDS — re-running a wave whose
    outputs were written but whose manifest update was lost (mid-wave
    crash) must not duplicate visited/frontier rows."""
    import json as _json
    import os

    from go_htmldate_ray.pipelines.crawl import crawl

    full_rows, _ = _run(small_wave_threshold=0, max_waves=6)

    ckpt = str(tmp_path / "crashckpt")
    ns = _ns()
    crawl(SF, namespace=ns, max_waves=3, checkpoint_dir=ckpt,
          small_wave_threshold=0)
    # Simulate "crashed after writing wave 2's outputs, before the
    # manifest recorded it": roll the manifest back one wave.
    mpath = os.path.join(ckpt, "manifest.json")
    m = _json.loads(open(mpath).read())
    m["next_wave"] -= 1
    m["lineage"] = m["lineage"][:-1]
    open(mpath, "w").write(_json.dumps(m))

    visited, _ = crawl(SF, namespace=ns, max_waves=6, checkpoint_dir=ckpt,
                       resume=True, small_wave_threshold=0)
    rows = visited.take_all()
    urls = [r["url"] for r in rows]
    assert len(urls) == len(set(urls)), "duplicated visited rows after rerun"
    assert sorted(urls) == sorted(r["url"] for r in full_rows)


def test_salted_politeness_splits_hot_host():
    """SURVEY §4.2 skew splitting: a host owning ~50% of the frontier must
    be spread across the (host, salt) sub-groups, so no politeness
    map_groups task receives the whole hot shard; and the salted two-phase
    ranking must produce exactly the local path's fetch set and ranks."""
    import pyarrow as pa
    import ray.data

    from go_htmldate_ray.pipelines.crawl import (
        _POLITENESS_SALT,
        _frontier_table,
        crawl,
    )

    n_hot, n_cold = 500, 500
    hot = [f"https://hot.example.org/post-{i}.html" for i in range(n_hot)]
    cold = [
        f"https://cold{i % 40}.example.org/post-{n_hot + i}.html"
        for i in range(n_cold)
    ]
    seeds = hot + cold

    # direct check of the salted grouping key: max (host, salt) group size
    t = _frontier_table(seeds, 0, 0)
    salted = pa.table(
        {
            "host": t.column("host"),
            "salt": pa.array(
                [h % _POLITENESS_SALT for h in t.column("url_hash").to_pylist()],
                pa.int64(),
            ),
        }
    )
    sizes = (
        ray.data.from_arrow(salted)
        .groupby(["host", "salt"])
        .map_groups(
            lambda g: pa.table({"n": pa.array([g.num_rows], pa.int64())}),
            batch_format="pyarrow",
        )
        .take_all()
    )
    max_group = max(r["n"] for r in sizes)
    # hot host alone would be one 500-row group un-salted; salted groups
    # must stay near 500/16 ≈ 31 (allow 3x slack for hash unevenness)
    assert max_group <= 3 * n_hot // _POLITENESS_SALT, max_group

    # end-to-end: dataset path (forced) == driver-local path on the skewed
    # frontier, including per-host fetch_rank assignment
    budget = 3
    common = dict(seeds=seeds, max_waves=2, politeness_budget=budget)
    local_rows, _ = _run(**common)
    ds_rows, _ = _run(small_wave_threshold=0, **common)
    key = lambda rows: [(r["wave"], r["host"], r["fetch_rank"], r["url"]) for r in rows]
    assert key(ds_rows) == key(local_rows)
    per_host_wave = {}
    for r in ds_rows:
        per_host_wave.setdefault((r["wave"], r["host"]), []).append(r["fetch_rank"])
    for ranks in per_host_wave.values():
        assert sorted(ranks) == list(range(len(ranks)))
        assert len(ranks) <= budget


def test_legacy_checkpoint_double_resume(tmp_path):
    """A legacy checkpoint (full seen.json, no per-wave deltas) resumed
    twice must not re-fetch URLs: the second resume sees a stale full dump
    PLUS the deltas the first resume wrote, and must replay both."""
    import json as _json
    import os

    from go_htmldate_ray.pipelines.crawl import crawl

    full_rows, _ = _run()

    ckpt = str(tmp_path / "legacyckpt")
    crawl(SF, namespace=_ns(), max_waves=3, checkpoint_dir=ckpt)
    # convert to the legacy layout: one full seen.json, no deltas
    shards = []
    for w in range(3):
        dp = os.path.join(ckpt, f"seen_delta_{w}.json")
        deltas = _json.loads(open(dp).read())
        if not shards:
            shards = [set() for _ in deltas]
        for s, keys in zip(shards, deltas):
            s.update(keys)
        os.remove(dp)
    open(os.path.join(ckpt, "seen.json"), "w").write(
        _json.dumps([sorted(s) for s in shards])
    )

    # first resume under the delta code: runs waves 3..4, writes deltas
    # for them but leaves seen.json stale
    crawl(SF, namespace=_ns(), max_waves=5, checkpoint_dir=ckpt, resume=True)
    # second resume: must replay legacy dump AND the new deltas
    visited, _ = crawl(
        SF, namespace=_ns(), max_waves=40, checkpoint_dir=ckpt, resume=True
    )
    rows = visited.take_all()
    urls = [r["url"] for r in rows]
    assert len(urls) == len(set(urls)), "duplicate fetches after double resume"
    assert sorted(urls) == sorted(r["url"] for r in full_rows)


def test_wave_stats_counter_retry_idempotent(ray_session):
    """A Ray task retry re-reporting the same batch must overwrite its
    previous counts, not accumulate them."""
    import ray

    from go_htmldate_ray.pipelines.crawl import WaveStatsCounter

    c = ray.remote(num_cpus=0)(WaveStatsCounter).remote()
    ray.get(c.add_keyed.remote("batch-a", deduped_in=10, not_new=2))
    ray.get(c.add_keyed.remote("batch-b", deduped_in=5, not_new=1))
    ray.get(c.add_keyed.remote("batch-a", deduped_in=10, not_new=2))  # retry
    got = ray.get(c.get.remote())
    assert got == {"deduped_in": 15, "not_new": 3}
    ray.get(c.reset.remote())
    assert ray.get(c.get.remote()) == {}
    ray.kill(c)


def test_politeness_deferred_urls_eventually_fetched():
    """Regression: a tight politeness budget must only DELAY fetches,
    never drop them — deferred rows stay unmarked in the seen set and
    re-enter later waves, so the converged visited set is
    budget-independent (both wave paths)."""
    wide_rows, _ = _run(politeness_budget=1000, max_waves=64)
    want = sorted(r["url"] for r in wide_rows)

    tight_rows, tight_stats = _run(politeness_budget=1, max_waves=64)
    assert sorted(r["url"] for r in tight_rows) == want
    assert tight_stats["waves"] > 6  # the budget actually throttled

    ds_rows, _ = _run(politeness_budget=1, max_waves=64, small_wave_threshold=0)
    assert sorted(r["url"] for r in ds_rows) == want


def test_robots_wildcard_patterns():
    """RFC 9309 wildcard matching: *, $, most-specific-wins, allow-on-tie."""
    from go_htmldate_ray.state.robots import allowed, parse_robots

    rules = parse_robots(
        "User-agent: *\n"
        "Disallow: /*.pdf$\n"
        "Disallow: /private/\n"
        "Allow: /private/ok/\n"
        "Disallow: /a/*/c\n"
    )
    # trailing-$ anchored wildcard
    assert not allowed("/docs/file.pdf", rules)
    assert allowed("/docs/file.pdf.html", rules)  # $ anchors the end
    # plain prefixes still work, longest wins
    assert not allowed("/private/x.html", rules)
    assert allowed("/private/ok/x.html", rules)
    # mid-pattern *
    assert not allowed("/a/b/c", rules)
    assert not allowed("/a/anything/at/all/c", rules)
    assert allowed("/a/b/d", rules)
    # no match -> allow
    assert allowed("/public/x", rules)

    # equal-length tie: allow wins (least-restrictive tiebreak)
    tie = [("disallow", "/page"), ("allow", "/page")]
    assert allowed("/page1", tie)

    # empty rule list -> everything allowed
    assert allowed("/anything", [])


def test_max_depth_truncates_crawl():
    """max_depth caps the BFS: visited == full-crawl pages whose first
    (min) discovery depth is <= the bound, on both wave paths."""
    full, _ = _run(politeness_budget=1000)
    want = {r["url"] for r in full if r["depth"] <= 2}
    for extra in ({}, {"small_wave_threshold": 0}):
        rows, _ = _run(politeness_budget=1000, max_depth=2, **extra)
        assert max(r["depth"] for r in rows) <= 2
        assert {r["url"] for r in rows} == want


def test_canonicalize_percent_encoding():
    """RFC 3986 §6.2.2: unreserved octets decoded, other escapes
    uppercased, malformed sequences untouched — two spellings of one URL
    canonicalize (and therefore hash) identically."""
    from go_htmldate_ray.state.urls import canonicalize, url_hash

    # unreserved: %7E -> ~, %41 -> A
    assert canonicalize("https://h.org/%7Euser/%41") == "https://h.org/~user/A"
    # reserved escapes stay encoded but uppercase
    assert canonicalize("https://h.org/a%2fb?q=%3a") == "https://h.org/a%2Fb?q=%3A"
    # malformed % passes through
    assert canonicalize("https://h.org/100%") == "https://h.org/100%"
    assert canonicalize("https://h.org/%zz") == "https://h.org/%zz"
    # equivalent spellings collapse to one frontier identity
    a = canonicalize("https://H.org/%7edoc%2Dset/x")
    b = canonicalize("https://h.org/~doc-set/x")
    assert a == b
    assert url_hash(a) == url_hash(b)


def test_robots_agent_group_selection():
    """RFC 9309 group selection: a matching specific group overrides *;
    consecutive User-agent lines share a group; default stays *."""
    from go_htmldate_ray.state.robots import allowed, parse_robots

    txt = (
        "User-agent: *\n"
        "Disallow: /all/\n"
        "\n"
        "User-agent: FancyBot\n"
        "User-agent: go-htmldate-ray\n"  # consecutive lines, one group
        "Disallow: /mine/\n"
        "Allow: /all/\n"
        "\n"
        "User-agent: other\n"
        "Disallow: /other/\n"
    )
    # default (no agent): * group only — previous behavior
    star = parse_robots(txt)
    assert not allowed("/all/x", star)
    assert allowed("/mine/x", star)

    # matching agent (product-token prefix, case-insensitive): its
    # group applies, * is ignored
    mine = parse_robots(txt, agent="Go-Htmldate-Ray/1.0")
    assert not allowed("/mine/x", mine)
    assert allowed("/all/x", mine)  # Allow in the specific group
    assert allowed("/other/x", mine)

    # shared group: FancyBot gets the same rules
    assert parse_robots(txt, agent="FancyBot") == mine

    # non-matching agent falls back to *
    fallback = parse_robots(txt, agent="SomethingElse")
    assert fallback == star


def test_canonicalize_dot_decode_order_and_idempotency():
    """RFC 3986 6.2.2.3: percent-decoding precedes dot-segment removal,
    and canonicalize is idempotent."""
    from go_htmldate_ray.state.urls import canonicalize

    # %2E%2E decodes to '..' and must then resolve
    assert canonicalize("https://h.org/a/%2E%2E/b") == "https://h.org/b"
    assert canonicalize("https://h.org/a/%2E/b") == "https://h.org/a/b"
    for u in [
        "https://h.org/a/%2E%2E/b",
        "https://H.org:443/x/../y/%7Ez?q=%3a#f",
        "https://h.org/100%",
    ]:
        once = canonicalize(u)
        assert canonicalize(once) == once, u


def test_robots_empty_group_carveout_and_empty_token():
    from go_htmldate_ray.state.robots import allowed, parse_robots

    # the standard carve-out: named crawler gets an empty (allow-all)
    # group while * is locked down
    txt = "User-agent: mybot\nDisallow:\n\nUser-agent: *\nDisallow: /\n"
    mine = parse_robots(txt, agent="mybot/1.0")
    assert mine == []
    assert allowed("/anything", mine)
    other = parse_robots(txt, agent="otherbot")
    assert not allowed("/anything", other)

    # malformed empty User-agent token must not match every agent (and
    # must not hijack precedence over *)
    bad = "User-agent:\nDisallow: /secret/\n\nUser-agent: *\nAllow: /\n"
    rules = parse_robots(bad, agent="mybot")
    assert allowed("/secret/x", rules)


def test_robots_cache_uses_agent_groups(ray_session):
    import ray

    from go_htmldate_ray.state.robots import RobotsCache, allowed

    class _Srv:
        pass

    # loopback-free check: synthetic mode has only * groups, so behavior
    # is unchanged; the agent plumb-through is observable via a custom
    # http_base serving an agent-specific policy
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class H(BaseHTTPRequestHandler):
        def do_GET(self):
            body = (
                b"User-agent: go-htmldate-ray-crawler\nDisallow: /mine/\n\n"
                b"User-agent: *\nDisallow: /all/\n"
            )
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    httpd = HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        cache = RobotsCache.remote(
            http_base=f"http://127.0.0.1:{httpd.server_port}", timeout=5
        )
        rules = ray.get(cache.get_rules.remote(["h.org"]))["h.org"]
        # the crawler's specific group applies; * is ignored
        assert not allowed("/mine/x", rules)
        assert allowed("/all/x", rules)
    finally:
        httpd.shutdown()
