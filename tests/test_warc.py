"""WARC source/sink tests (public ISO 28500 / WARC 1.0 framing)."""

from datetime import datetime, timezone

import pytest

from go_htmldate_ray.sources.warc import (
    build_warc_record,
    build_warcinfo,
    parse_warc,
    write_warc_file,
)

TS = datetime(2024, 3, 5, 12, 30, 0, tzinfo=timezone.utc)


def test_record_roundtrip():
    rec = build_warc_record("https://a.example.org/x.html", TS, b"<html>hi</html>")
    out = parse_warc(rec)
    assert out == [("https://a.example.org/x.html", TS, b"<html>hi</html>")]


def test_warcinfo_skipped_and_multiple_records():
    data = (
        build_warcinfo("f.warc")
        + build_warc_record("https://h/1.html", TS, b"one")
        + build_warc_record("https://h/2.html", TS, b"two\r\n\r\nwith crlf body")
    )
    out = parse_warc(data)
    assert [u for u, _, _ in out] == ["https://h/1.html", "https://h/2.html"]
    # body containing CRLFCRLF must survive (split happens on the HTTP
    # head boundary only, via Content-Length framing)
    assert out[1][2] == b"two\r\n\r\nwith crlf body"


def test_truncated_tail_is_dropped_not_raised():
    good = build_warc_record("https://h/1.html", TS, b"ok")
    bad = build_warc_record("https://h/2.html", TS, b"x" * 100)[:-60]
    out = parse_warc(good + bad)
    assert [u for u, _, _ in out] == ["https://h/1.html"]
    assert parse_warc(b"garbage not warc") == []


def test_gzip_member_file_roundtrip(tmp_path):
    p = str(tmp_path / "t.warc.gz")
    records = [
        (f"https://h/{i}.html", TS, f"<html>{i}</html>".encode()) for i in range(5)
    ]
    entries = write_warc_file(p, records, gzip_members=True)
    assert len(entries) == 5
    data = open(p, "rb").read()
    assert data[:2] == b"\x1f\x8b"
    out = parse_warc(data)
    assert out == records


def test_plain_file_roundtrip(tmp_path):
    p = str(tmp_path / "t.warc")
    records = [("https://h/0.html", TS, b"")]
    write_warc_file(p, records, gzip_members=False)
    assert parse_warc(open(p, "rb").read()) == records


def test_deterministic_bytes(tmp_path):
    # rewriting the same shard yields byte-identical output (pinned gzip
    # mtime, content-derived record ids) — resumable/diffable sinks
    a = str(tmp_path / "a.warc.gz")
    records = [("https://h/1.html", TS, b"x")]
    write_warc_file(a, records)
    first = open(a, "rb").read()
    write_warc_file(a, records)
    assert open(a, "rb").read() == first


def test_shard_synthesis_and_ray_read(ray_session, tmp_path):
    from go_htmldate_ray.sources.pages import count_documents
    from go_htmldate_ray.sources.warc import read_warc, synthesize_warc_shards

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "shards")
    manifest = synthesize_warc_shards(sf, out)
    n_docs = count_documents(sf)
    assert sum(manifest.column("n_records").to_pylist()) == n_docs

    pages = read_warc(out)
    t = pages.take_all()
    assert len(t) == n_docs
    urls = {r["url"] for r in t}
    assert all(u.startswith("https://site") for u in urls)
    row = min(t, key=lambda r: r["url"])
    assert row["html"].startswith(b"<html")
    assert row["warc_ts"] is not None


def test_gzip_member_walk_and_random_access(tmp_path):
    from go_htmldate_ray.sources.warc import (
        read_warc_record,
        walk_gzip_members,
    )

    p = str(tmp_path / "t.warc.gz")
    records = [
        (f"https://h/{i}.html", TS, f"<html>{i}</html>".encode()) for i in range(4)
    ]
    entries = write_warc_file(p, records, gzip_members=True)
    assert [u for u, _, _ in entries] == [u for u, _, _ in records]

    data = open(p, "rb").read()
    members = list(walk_gzip_members(data))
    # warcinfo member + one per record, covering the file exactly
    assert len(members) == 5
    assert members[0][0] == 0
    assert members[-1][0] + members[-1][1] == len(data)
    # writer-reported coordinates == walked coordinates (minus warcinfo)
    assert [(o, l) for _, o, l in entries] == members[1:]

    for (url, off, length), (_, _, html) in zip(entries, records):
        rec = read_warc_record(p, off, length)
        assert rec is not None
        assert rec[0] == url
        assert rec[2] == html

    # truncated final member is not yielded
    assert len(list(walk_gzip_members(data[:-10]))) == 4


def test_cdx_index_and_random_access_query(ray_session, tmp_path):
    from go_htmldate_ray.pipelines.extract_dates import (
        extract_dates,
        warc_random_access_dates,
    )
    from go_htmldate_ray.sources.pages import count_documents
    from go_htmldate_ray.sources.warc import cdx_index, synthesize_warc_shards

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "shards")
    synthesize_warc_shards(sf, out)

    idx = cdx_index(out).take_all()
    assert len(idx) == count_documents(sf)
    assert len({r["url"] for r in idx}) == len(idx)
    assert all(r["length"] > 0 and r["offset"] >= 0 for r in idx)

    via_ra = {
        r["doc_id"]: r["date_str"] for r in warc_random_access_dates(sf).take_all()
    }
    assert set(via_ra) == set(range(20))
    via_full = {
        r["doc_id"]: r["date_str"]
        for r in extract_dates(sf).take_all()
        if r["doc_id"] < 20
    }
    assert via_ra == via_full


def test_crawl_archives_fetches_as_warc(ray_session, tmp_path):
    import shutil

    from go_htmldate_ray.pipelines.crawl import crawl
    from go_htmldate_ray.sources.warc import read_warc

    archive = str(tmp_path / "archive")
    visited, stats = crawl(
        "/root/testdata/sf0.001",
        politeness_budget=1000,
        max_waves=64,
        fetcher_kwargs={"archive_dir": archive},
    )
    visited_urls = {r["url"] for r in visited.select_columns(["url"]).take_all()}
    shutil.rmtree(stats["checkpoint_dir"], ignore_errors=True)

    rows = read_warc(archive).take_all()
    archived_urls = {r["url"] for r in rows}
    # every successfully fetched page is archived exactly once; visited
    # rows with no page behind them (doc_id None) never reach the archive
    assert archived_urls
    assert archived_urls <= visited_urls
    assert len(rows) == len(archived_urls)
    assert all(r["html"].startswith(b"<html") for r in rows)


def test_warc_extract_dates_matches_parquet_path(ray_session, tmp_path):
    from go_htmldate_ray.pipelines.extract_dates import (
        extract_dates,
        warc_extract_dates,
    )

    sf = "/root/testdata/sf0.001"
    via_warc = {
        r["doc_id"]: r["date_str"]
        for r in warc_extract_dates(sf, shard_dir=str(tmp_path / "w")).take_all()
    }
    via_parquet = {
        r["doc_id"]: r["date_str"] for r in extract_dates(sf).take_all()
    }
    assert via_warc == via_parquet
