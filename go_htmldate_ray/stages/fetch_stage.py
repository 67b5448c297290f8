"""HTTP fetch stage.

``HttpFetcher`` mirrors the reference CLI's downloader semantics
(cmd/go-htmldate/main.go:140-160,187-200): custom User-Agent, timeout,
optional TLS-verification skip, and a text/html content-type requirement.
Stdlib urllib only — no third-party HTTP client ships in this container.

In the crawl scheduler the fetcher slot is pluggable: the sandbox uses
the deterministic synthetic store (pipelines/crawl.py::CrawlFetcher._fetch);
a live deployment passes ``HttpFetcher`` per actor (one opener per worker,
built in ``__init__``).
"""

from __future__ import annotations

import ssl
import urllib.error
import urllib.request
from typing import Optional

DEFAULT_USER_AGENT = "go-htmldate-ray/1.0 (+https://example.org/bot)"


class HttpFetcher:
    """Per-actor HTTP session: opener + TLS context built once."""

    def __init__(
        self,
        user_agent: str = DEFAULT_USER_AGENT,
        timeout: float = 30.0,
        skip_tls: bool = False,
        max_bytes: int = 10 * 1024 * 1024,
    ):
        self.user_agent = user_agent
        self.timeout = timeout
        self.max_bytes = max_bytes
        ctx = ssl.create_default_context()
        if skip_tls:
            ctx.check_hostname = False
            ctx.verify_mode = ssl.CERT_NONE
        self.opener = urllib.request.build_opener(
            urllib.request.HTTPSHandler(context=ctx)
        )

    def fetch(self, url: str) -> Optional[bytes]:
        """GET the URL; returns body bytes, or None when the response is
        missing, non-2xx, not text/html, or oversized."""
        result = self.fetch_conditional(url)
        return None if result is None else result[0]

    NOT_MODIFIED = "not_modified"

    def fetch_conditional(
        self,
        url: str,
        *,
        etag: Optional[str] = None,
        last_modified: Optional[str] = None,
    ) -> Optional[tuple[Optional[bytes], dict]]:
        """Conditional GET — the recrawl revalidation primitive.

        Sends ``If-None-Match`` / ``If-Modified-Since`` when validators
        from a previous fetch are supplied.  Returns ``(body, meta)``
        where meta carries the response's ``etag`` / ``last_modified``
        validators and ``meta["status"]``; a 304 yields
        ``(None, {"status": "not_modified", ...})`` (the cached copy is
        still fresh — a recrawl pays headers, not the body), and any
        failure yields None as before."""
        headers = {"User-Agent": self.user_agent}
        if etag:
            headers["If-None-Match"] = etag
        if last_modified:
            headers["If-Modified-Since"] = last_modified
        req = urllib.request.Request(url, headers=headers)
        try:
            with self.opener.open(req, timeout=self.timeout) as resp:
                meta = {
                    "status": resp.status,
                    "etag": resp.headers.get("ETag"),
                    "last_modified": resp.headers.get("Last-Modified"),
                }
                if resp.status // 100 != 2:
                    return None
                ctype = resp.headers.get("Content-Type", "")
                if "text/html" not in ctype and "application/xhtml" not in ctype:
                    return None
                # Read one byte past the limit so "oversized" is
                # detectable — truncating would extract from a cut-off
                # document instead of skipping it as documented.
                body = resp.read(self.max_bytes + 1)
                if len(body) > self.max_bytes:
                    return None
                return body, meta
        except urllib.error.HTTPError as e:
            if e.code == 304:
                # RFC 9110 §15.4.5: a 304 may carry UPDATED validators
                # (rotated ETag, refreshed Last-Modified) — persist those,
                # falling back to the request's, or the next cycle
                # revalidates with stale values and forces a full refetch
                return None, {
                    "status": self.NOT_MODIFIED,
                    "etag": e.headers.get("ETag") or etag,
                    "last_modified": e.headers.get("Last-Modified")
                    or last_modified,
                }
            return None
        except (urllib.error.URLError, TimeoutError, OSError, ValueError):
            return None

    def fetch_robots(self, host: str, scheme: str = "http") -> str:
        """Fetch robots.txt for a host; empty string on any failure
        (= allow-all, the de-facto web standard)."""
        req = urllib.request.Request(
            f"{scheme}://{host}/robots.txt", headers={"User-Agent": self.user_agent}
        )
        try:
            with self.opener.open(req, timeout=self.timeout) as resp:
                if resp.status // 100 != 2:
                    return ""
                return resp.read(256 * 1024).decode("utf-8", errors="replace")
        except (urllib.error.URLError, TimeoutError, OSError, ValueError):
            return ""
