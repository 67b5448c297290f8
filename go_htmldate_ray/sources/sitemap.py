"""Sitemap ingestion — the frontier-bootstrap source a production crawl
runs before (or alongside) link discovery.

``parse_sitemap`` handles the sitemaps.org ``<urlset>`` subset (one
``<loc>`` per ``<url>``, optional ``<lastmod>``); the synthetic sitemap
mirrors the deterministic page space (every page of a host, lastmod =
its publication date), so the ingested table is independently
recomputable in SQL from the documents fixture.

The pipeline shape is the scale shape: the host list is derived
distributedly from the corpus (per-block distinct + one tiny groupby on
host), and each host's sitemap is fetched+parsed inside ``map_batches``
— the expansion is local to the block, the driver never sees URLs.
"""

from __future__ import annotations

import re

import pyarrow as pa

from .pages import N_HOSTS, count_documents, page_date, page_url

_URL_ENTRY = re.compile(
    r"<url>\s*<loc>([^<]+)</loc>\s*(?:<lastmod>([^<]*)</lastmod>\s*)?</url>"
)

_INDEX_ENTRY = re.compile(
    r"<sitemap>\s*<loc>([^<]+)</loc>\s*(?:<lastmod>([^<]*)</lastmod>\s*)?</sitemap>"
)


def parse_sitemap_index(xml: str) -> list[str]:
    """sitemapindex XML → child sitemap locations (sitemaps.org's
    second document type: an index of sub-sitemaps, used by sites whose
    URL space exceeds the 50k-entries-per-file protocol cap).  Returns
    [] for a plain urlset document."""
    return [m.group(1).strip() for m in _INDEX_ENTRY.finditer(xml)]


def expand_sitemap(xml: str, fetch, *, max_depth: int = 2) -> list[tuple[str, str]]:
    """Parse a sitemap OR sitemapindex document into (loc, lastmod)
    entries, following index children via ``fetch(url) -> xml`` up to
    ``max_depth`` levels (the protocol allows one level of nesting; the
    bound guards against cyclic indexes on hostile sites)."""
    children = parse_sitemap_index(xml)
    if not children or max_depth <= 0:
        return parse_sitemap(xml)
    out: list[tuple[str, str]] = []
    for child_url in children:
        child_xml = fetch(child_url)
        if child_xml:
            out.extend(expand_sitemap(child_xml, fetch, max_depth=max_depth - 1))
    return out

_SYNTH_HOST = re.compile(r"site(\d+)\.example\.org")


def parse_sitemap(xml: str) -> list[tuple[str, str]]:
    """sitemap.xml → [(loc, lastmod-or-'')]; tolerant of missing
    lastmod and surrounding whitespace, ignores anything outside
    <url> entries."""
    return [(m.group(1).strip(), (m.group(2) or "").strip())
            for m in _URL_ENTRY.finditer(xml)]


def synthetic_sitemap_xml(host: str, n_docs: int) -> str:
    """Deterministic sitemap for a synthetic host: one entry per page
    hosted there (doc_id ≡ host index mod N_HOSTS), lastmod = the
    page's publication date."""
    m = _SYNTH_HOST.fullmatch(host)
    entries = []
    if m is not None:
        idx = int(m.group(1))
        if 0 <= idx < N_HOSTS:
            for doc_id in range(idx, n_docs, N_HOSTS):
                entries.append(
                    f"  <url><loc>{page_url(doc_id)}</loc>"
                    f"<lastmod>{page_date(doc_id).isoformat()}</lastmod></url>"
                )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        + "\n".join(entries)
        + "\n</urlset>\n"
    )


def sitemap_urls_from_robots(sf_dir: str):
    """Sitemap ingestion bootstrapped the way production crawlers do it:
    discover hosts → fetch each host's robots.txt → follow its
    ``Sitemap:`` directives → parse the declared sitemaps.

    Same distributed shape as :func:`sitemap_urls` (light host rows
    through one tiny groupby; robots fetch + sitemap fetch + parse all
    inside the mapper), plus the robots hop.  A host whose robots.txt
    declares no sitemap contributes nothing — frontier bootstrap
    degrades per-host, never fails the job."""
    from urllib.parse import urlsplit

    from ..state.robots import parse_sitemap_directives, synthetic_robots_txt
    from .io import read_parquet_clean

    import numpy as np

    n_docs = count_documents(sf_dir)
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def hosts_partial(b: pa.Table) -> pa.Table:
        idx = np.unique(np.asarray(b.column("doc_id"), dtype=np.int64) % N_HOSTS)
        return pa.table(
            {"host": pa.array([f"site{i}.example.org" for i in idx], pa.string())}
        )

    hosts = (
        ds.map_batches(hosts_partial, batch_format="pyarrow")
        .groupby("host")
        .count()
        .select_columns(["host"])
    )

    def fetch_sitemap_xml(sm_url: str) -> str:
        # sandbox fetch: declared sitemap URL → its host's synthetic
        # sitemap (a live deployment swaps in an HTTP fetch here)
        return synthetic_sitemap_xml(urlsplit(sm_url).hostname or "", n_docs)

    def expand(b: pa.Table) -> pa.Table:
        out_h, out_u, out_m = [], [], []
        for h in b.column("host").to_pylist():
            for sm_url in parse_sitemap_directives(synthetic_robots_txt(h)):
                # expand_sitemap handles both document types (urlset and
                # sitemapindex), following index children via the fetch
                for loc, mod in expand_sitemap(
                    fetch_sitemap_xml(sm_url), fetch_sitemap_xml
                ):
                    out_h.append(h)
                    out_u.append(loc)
                    out_m.append(mod)
        return pa.table(
            {
                "host": pa.array(out_h, pa.string()),
                "url": pa.array(out_u, pa.string()),
                "lastmod": pa.array(out_m, pa.string()),
            }
        )

    return hosts.map_batches(expand, batch_format="pyarrow")


def sitemap_urls(sf_dir: str):
    """Ingest every host's sitemap → (host, url, lastmod) Dataset.

    Host discovery is a per-block distinct + one groupby on host (the
    shuffle moves ≤ N_HOSTS light rows per block); the per-host sitemap
    fetch+parse runs in the mapper, so at web scale this is one
    sitemap HTTP fetch per distinct host, never a driver loop."""
    import numpy as np

    from .io import read_parquet_clean

    n_docs = count_documents(sf_dir)
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def hosts_partial(b: pa.Table) -> pa.Table:
        idx = np.unique(np.asarray(b.column("doc_id"), dtype=np.int64) % N_HOSTS)
        return pa.table(
            {"host": pa.array([f"site{i}.example.org" for i in idx], pa.string())}
        )

    hosts = (
        ds.map_batches(hosts_partial, batch_format="pyarrow")
        .groupby("host")
        .count()
        .select_columns(["host"])
    )

    def expand(b: pa.Table) -> pa.Table:
        out_h, out_u, out_m = [], [], []
        for h in b.column("host").to_pylist():
            for loc, mod in parse_sitemap(synthetic_sitemap_xml(h, n_docs)):
                out_h.append(h)
                out_u.append(loc)
                out_m.append(mod)
        return pa.table(
            {
                "host": pa.array(out_h, pa.string()),
                "url": pa.array(out_u, pa.string()),
                "lastmod": pa.array(out_m, pa.string()),
            }
        )

    return hosts.map_batches(expand, batch_format="pyarrow")
