"""WARC (ISO 28500 / WARC 1.0) source + sink — the container format
Common-Crawl-style corpora actually arrive in.

The north rule fixes the engine's logical input as a Parquet table of
``(url, warc_ts, html, text, lang)``; in production that table is *made*
from WARC archives.  This module closes the loop:

* :func:`build_warc_record` / :func:`write_warc_file` — serialize
  ``response`` records per the public WARC 1.0 spec (version line,
  named headers, ``Content-Length``-framed HTTP block, CRLF CRLF
  terminator), optionally one gzip member per record — the Common Crawl
  on-disk convention, which lets a reader split a shard at member
  boundaries without decompressing the whole file.
* :func:`parse_warc` — tolerant streaming parser: walks version-line →
  header block → ``Content-Length`` bytes, keeps ``response`` records,
  skips ``warcinfo``/``request``/unknown types and malformed tails
  rather than raising (a 100 TB crawl always contains truncated shards).
* :func:`synthesize_warc_shards` — distributed sink: the documents
  table streams through ``map_batches`` and every task writes its own
  shard file (named by the batch's min doc_id — batches partition the
  id space, so names are collision-free); the driver sees only a small
  manifest of (path, n_records).
* :func:`read_warc` — Ray Data source: ``read_binary_files`` over the
  shard directory → per-file parse inside ``map_batches`` → the
  input-hint page schema ``(url, warc_ts, html)``.  One file is one
  read task, so at real scale parallelism = number of shard files
  (Common Crawl ships ~1 GB shards precisely so this is enough).
* :func:`cdx_index` / :func:`read_warc_record` — the CDX lookup table
  (gzip member coordinates per record) and single-record random access.

Multi-node note: shard paths here are plain filesystem paths — on a
real cluster they live on shared storage (NFS/object store via fuse),
the same assumption the parquet checkpoint/sink layer makes; the
single-node sandbox writes under /tmp.

No counterpart in the reference (go-htmldate reads single documents);
the record framing follows the public WARC 1.0 specification only.
"""

from __future__ import annotations

import gzip
import hashlib
import io
from datetime import datetime, timezone

import pyarrow as pa

_CRLF = b"\r\n"
_SOFTWARE = b"go-htmldate-ray-warc/1.0"


def _warc_date(ts: datetime) -> bytes:
    return ts.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ").encode()


def _record_id(url: str, ts: datetime) -> bytes:
    # deterministic urn:uuid derived from (url, ts): re-synthesizing a
    # shard yields byte-identical records (resumable, diffable output)
    h = hashlib.md5(f"{url}|{ts.isoformat()}".encode()).hexdigest()
    return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>".encode()


def build_warc_record(url: str, ts: datetime, html: bytes) -> bytes:
    """One WARC 1.0 ``response`` record wrapping an HTTP/1.1 200 reply."""
    http_head = (
        b"HTTP/1.1 200 OK" + _CRLF
        + b"Content-Type: text/html; charset=UTF-8" + _CRLF
        + b"Content-Length: " + str(len(html)).encode() + _CRLF + _CRLF
    )
    block = http_head + html
    head = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: response" + _CRLF
        + b"WARC-Record-ID: " + _record_id(url, ts) + _CRLF
        + b"WARC-Date: " + _warc_date(ts) + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"Content-Type: application/http; msgtype=response" + _CRLF
        + b"Content-Length: " + str(len(block)).encode() + _CRLF + _CRLF
    )
    return head + block + _CRLF + _CRLF


def build_warcinfo(filename: str) -> bytes:
    """Leading ``warcinfo`` record (readers must skip it — ours does)."""
    body = b"software: " + _SOFTWARE + _CRLF + b"format: WARC File Format 1.0" + _CRLF
    head = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: warcinfo" + _CRLF
        + b"WARC-Record-ID: " + _record_id(filename, datetime(2024, 1, 1, tzinfo=timezone.utc)) + _CRLF
        + b"WARC-Date: 2024-01-01T00:00:00Z" + _CRLF
        + b"WARC-Filename: " + filename.encode() + _CRLF
        + b"Content-Type: application/warc-fields" + _CRLF
        + b"Content-Length: " + str(len(body)).encode() + _CRLF + _CRLF
    )
    return head + body + _CRLF + _CRLF


def write_warc_file(
    path: str, records, *, gzip_members: bool = True
) -> list[tuple[str, int, int]]:
    """Write ``(url, ts, html)`` triples as one WARC file; returns CDX
    entries ``(url, byte_offset, byte_length)`` — one per record, the
    member coordinates a CDX index needs for random access.
    ``gzip_members=True`` compresses each record as its own gzip member
    (the Common Crawl layout, which makes those coordinates seekable)."""
    import os

    entries: list[tuple[str, int, int]] = []
    with open(path, "wb") as f:
        info = build_warcinfo(os.path.basename(path))
        f.write(_gz(info) if gzip_members else info)
        pos = f.tell()
        for url, ts, html in records:
            rec = build_warc_record(url, ts, html or b"")
            data = _gz(rec) if gzip_members else rec
            f.write(data)
            entries.append((url, pos, len(data)))
            pos += len(data)
    return entries


def _gz(data: bytes) -> bytes:
    buf = io.BytesIO()
    # mtime pinned: gzip members are byte-deterministic across runs
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
        g.write(data)
    return buf.getvalue()


def parse_warc(data: bytes):
    """WARC file bytes (plain or gzip'd) → list of (url, ts, html).

    Only ``response`` records are returned; the HTTP head inside the
    content block is stripped at the first CRLF CRLF.  Malformed or
    truncated tails end the scan silently — a distributed reader must
    degrade per-shard, not raise per-corpus."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)  # concatenated members supported
        except OSError:
            return []
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        ver_end = data.find(_CRLF, pos)
        if ver_end < 0 or not data[pos:ver_end].startswith(b"WARC/"):
            break
        head_end = data.find(_CRLF + _CRLF, ver_end)
        if head_end < 0:
            break
        headers = {}
        for line in data[ver_end + 2 : head_end].split(_CRLF):
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get(b"content-length", b""))
        except ValueError:
            break
        block_start = head_end + 4
        block_end = block_start + length
        if block_end > n:
            break  # truncated record
        if headers.get(b"warc-type") == b"response":
            url = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
            ts_raw = headers.get(b"warc-date", b"").decode("ascii", "replace")
            try:
                ts = datetime.strptime(ts_raw, "%Y-%m-%dT%H:%M:%SZ").replace(
                    tzinfo=timezone.utc
                )
            except ValueError:
                ts = None
            block = data[block_start:block_end]
            sep = block.find(_CRLF + _CRLF)
            html = block[sep + 4 :] if sep >= 0 else block
            out.append((url, ts, html))
        pos = block_end
        # skip the two record-terminating CRLFs (tolerate their absence)
        while data[pos : pos + 2] == _CRLF:
            pos += 2
    return out


def synthesize_warc_shards(sf_dir: str, out_dir: str, *, gzip_members: bool = True):
    """Materialize the deterministic synthetic page space as WARC shards.

    Streams the documents table through ``map_batches``; every task
    writes one shard (min-doc_id-named — collision-free because batches
    partition the id set) and emits a one-row manifest.  Returns the
    manifest as a small pyarrow Table (path, n_records)."""
    import os

    from .io import read_parquet_clean
    from .pages import WARC_EPOCH, build_page_html, count_documents, page_url
    from datetime import timedelta

    os.makedirs(out_dir, exist_ok=True)
    n_docs = count_documents(sf_dir)
    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    ext = "warc.gz" if gzip_members else "warc"

    def write_shard(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        path = os.path.join(out_dir, f"part-{min(ids):010d}.{ext}")
        records = (
            (
                page_url(i),
                WARC_EPOCH + timedelta(seconds=i),
                build_page_html(i, t or "", lg or "en", n_docs),
            )
            for i, t, lg in zip(ids, texts, langs)
        )
        n = len(write_warc_file(path, records, gzip_members=gzip_members))
        return pa.table({"path": pa.array([path]), "n_records": pa.array([n], pa.int64())})

    import ray

    # manifest is tiny (one row per shard): block refs → driver is fine
    refs = ds.map_batches(
        write_shard, batch_format="pyarrow", batch_size=512
    ).to_arrow_refs()
    tables = [t for t in ray.get(refs) if t.num_rows]
    return (
        pa.concat_tables(tables)
        if tables
        else pa.table(
            {"path": pa.array([], pa.string()), "n_records": pa.array([], pa.int64())}
        )
    )


def walk_gzip_members(data: bytes):
    """Yield ``(offset, length)`` of each gzip member in a
    member-concatenated file — the shard-side half of CDX indexing.
    Non-gzip input yields nothing."""
    import zlib

    pos = 0
    n = len(data)
    while pos < n and data[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        d.decompress(data[pos:])
        consumed = n - pos - len(d.unused_data)
        if consumed <= 0 or not d.eof:
            break  # truncated member
        yield pos, consumed
        pos += consumed


def cdx_index(path: str):
    """Shard dir → CDX Dataset ``(url, shard, offset, length)``.

    One read task per shard: gzip members are walked for their byte
    coordinates and each member's WARC header is parsed for the target
    URI; warcinfo members are skipped.  The result is the lookup table
    that makes single-record random access (``read_warc_record``)
    possible without scanning shards — Common Crawl's CDX(J) service in
    table form, buildable and queryable as a plain Dataset."""
    import os

    import ray.data

    # One light row per shard file (the driver only lists names); the
    # raw-byte read happens in the mapper.  read_binary_files is NOT
    # used here because it auto-decompresses .gz by extension, which
    # destroys the member byte coordinates this index exists to record.
    paths = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith((".warc", ".warc.gz"))
    ) if os.path.isdir(path) else [path]
    ds = ray.data.from_items([{"path": p} for p in paths])

    def index_batch(batch: pa.Table) -> pa.Table:
        urls, shards, offs, lens = [], [], [], []
        for p in batch.column("path").to_pylist():
            with open(p, "rb") as f:
                blob = f.read()
            shard = os.path.basename(p)
            for off, length in walk_gzip_members(blob):
                recs = parse_warc(blob[off : off + length])
                if not recs:  # warcinfo / non-response member
                    continue
                urls.append(recs[0][0])
                shards.append(shard)
                offs.append(off)
                lens.append(length)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "shard": pa.array(shards, pa.string()),
                "offset": pa.array(offs, pa.int64()),
                "length": pa.array(lens, pa.int64()),
            }
        )

    return ds.map_batches(index_batch, batch_format="pyarrow", batch_size=4)


def read_warc_record(path: str, offset: int, length: int):
    """Random access: read ONE record by its CDX coordinates (seek +
    bounded read, nothing else of the shard touched) → (url, ts, html)
    or None."""
    with open(path, "rb") as f:
        f.seek(offset)
        data = f.read(length)
    recs = parse_warc(data)
    return recs[0] if recs else None


def read_warc(path: str):
    """WARC shard file/directory → pages Dataset ``(url, warc_ts, html)``.

    ``read_binary_files`` makes one read task per shard; the parse runs
    inside the mapper, so shards decompress in parallel and the rows
    stream straight into downstream stages (never via the driver)."""
    import ray.data

    ds = ray.data.read_binary_files(path, file_extensions=["warc", "gz"])

    def parse_batch(batch: pa.Table) -> pa.Table:
        urls, tss, htmls = [], [], []
        for blob in batch.column("bytes").to_pylist():
            for url, ts, html in parse_warc(blob):
                urls.append(url)
                tss.append(ts)
                htmls.append(html)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us", tz="UTC")),
                "html": pa.array(htmls, pa.binary()),
            }
        )

    return ds.map_batches(parse_batch, batch_format="pyarrow", batch_size=4)
