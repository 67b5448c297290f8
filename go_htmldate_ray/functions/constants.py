"""Shared constants for the date-extraction kernel.

Semantics mirror the reference engine's constant inventory
(/root/reference/constant.go:51-258 and the original-pattern headers of
/root/reference/internal/re2go/*.re).  All regexes here are the *original*
published patterns (documented in the re2go file headers), compiled with
Python's engines instead of re2c DFAs.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

import regex  # the third-party `regex` module: needed for \p{} classes

# --- limits (constant.go:51-56) ---------------------------------------------
MIN_SEGMENT_LEN = 6
MAX_SEGMENT_LEN = 52
MAX_POSSIBLE_CANDIDATES = 1_000

# --- date window defaults (constant.go:33-34) -------------------------------
DEFAULT_MIN_DATE = datetime(1995, 1, 1, tzinfo=timezone.utc)


def default_max_date() -> datetime:
    """now + 1 year, mirroring defaultMaxDate (constant.go:34)."""
    now = datetime.now(timezone.utc)
    try:
        return now.replace(year=now.year + 1)
    except ValueError:  # Feb 29
        return now.replace(year=now.year + 1, day=28)


# --- date component regexes (constant.go:61-77) -----------------------------
RX_DAY = r"[0-3]?[0-9]"
RX_MONTH = r"[0-1]?[0-9]"
RX_YEAR = r"199[0-9]|20[0-3][0-9]"

RX_LAST_NON_DIGITS = re.compile(r"\D+$")

RX_YMD_NO_SEP_PATTERN = re.compile(r"(?:\D|^)(\d{8})(?:\D|$)")

# Two-branch Y-M-D / D-M-Y pattern (constant.go:66-71).  The Go original uses
# duplicate named groups across branches; here each branch gets its own
# numbered groups: branch1 = (year1, month1, day1), branch2 = (day2, month2,
# year2).  Branch-2 matches get correct_year + try_swap applied by the caller.
RX_YMD_PATTERN = re.compile(
    r"(?i)(?:\D|^)(?:"
    rf"({RX_YEAR})[\-/.]({RX_MONTH})[\-/.]({RX_DAY})"
    r"|"
    rf"({RX_DAY})[\-/.]({RX_MONTH})[\-/.](\d{{2,4}})"
    r")(?:\D|$)"
)

# Y-M / M-Y pattern (constant.go:72-77): branch1 = (year1, month1),
# branch2 = (month2, year2).
RX_YM_PATTERN = re.compile(
    r"(?i)(?:\D|^)(?:"
    rf"({RX_YEAR})[\-/.]({RX_MONTH})"
    r"|"
    rf"({RX_MONTH})[\-/.]({RX_YEAR})"
    r")(?:\D|$)"
)

# URL date pattern (constant.go:79-80)
RX_COMPLETE_URL = re.compile(
    rf"(?i)\D({RX_YEAR})[/_-]({RX_MONTH})[/_-]({RX_DAY})(?:\D|$)"
)

RX_TEXT_DATE_PATTERN = re.compile(r"(?i)[.:,_/ -]|^\d+$")

# Discard pattern (constant.go:84-94); uses \p classes -> `regex` module.
RX_DISCARD_PATTERN = regex.compile(
    r"^\d{2}:\d{2}(?: |:|$)|"
    r"^\D*\d{4}\D*$|"
    r"[$€¥Ұ£¢₽₱฿#₹]|"          # currency symbols and special characters
    r"[A-Z]{3}[^A-Z]|"          # currency codes
    r"(?:^|\D)(?:\+\d{2}|\d{3}|\d{5})\D|"  # tel./IPs/postal codes
    r"ftps?|https?|sftp|"       # protocols
    r"\.(?:com|net|org|info|gov|edu|de|fr|io)(?:\Z|[^\p{L}\p{M}\d_])|"  # TLDs
    r"IBAN|[A-Z]{2}[0-9]{2}|"   # bank accounts
    r"®"
)

# --- extensive search helper patterns (constant.go:97-106) ------------------
RX_YEAR_PATTERN = re.compile(rf"^\D?({RX_YEAR})")
RX_THREE_CATCH = re.compile(r"([0-9]{4})/([0-9]{2})/([0-9]{2})")
RX_THREE_LOOSE_CATCH = re.compile(r"([0-9]{4})[/.-]([0-9]{2})[/.-]([0-9]{2})")
RX_SELECT_YMD_YEAR = re.compile(rf"({RX_YEAR})\D?$")
RX_YMD_YEAR = re.compile(rf"^({RX_YEAR})")
RX_DATE_STRINGS_CATCH = re.compile(rf"({RX_YEAR})([01][0-9])([0-3][0-9])")
RX_SLASHES_YEAR = re.compile(r"([0-9]{2})$")
RX_YYYY_MM_CATCH = re.compile(rf"({RX_YEAR})[/.-](1[0-2]|0[1-9])")
RX_MM_YYYY_YEAR = re.compile(rf"({RX_YEAR})\D?$")
RX_SIMPLE_W3_CLEANER = re.compile(rf"w3.org\D({RX_YEAR})\D")

# --- time patterns (constant.go:118-120) ------------------------------------
RX_COMMON_TIME = re.compile(
    r"(?i)(?:\D|^)(\d{1,2})(?::|\s*h\s*)(\d{1,2})"
    r"(?::(\d{1,2})(?:\.\d+)?)?(?:\s*((?:a|p)\.?m\.?))?"
)
RX_TZ_CODE = re.compile(r"(?i)(?:\s|^)([-+])(\d{2})(?::?(\d{2}))?")
RX_ISO_TIME = re.compile(
    r"(?i)(\d{2}):(\d{2})(?::(\d{2})(?:\.\d+)?)?(Z|[+-]\d{2}(?::?\d{2})?)"
)

RX_LAST_JSON_BRACKET = re.compile(r"(?i)\s*\}$")

# --- month-name table (constant.go:126-150) ---------------------------------
_MONTH_NAMES = [
    ["jan", "januar", "jänner", "january", "januari", "janvier", "ocak", "oca"],
    ["feb", "februar", "feber", "february", "februari", "février", "şubat", "şub"],
    ["mar", "mär", "märz", "march", "maret", "mart", "mars"],
    ["apr", "april", "avril", "nisan", "nis"],
    ["may", "mai", "mei", "mayıs"],
    ["jun", "juni", "june", "juin", "haziran", "haz"],
    ["jul", "juli", "july", "juillet", "temmuz", "tem"],
    ["aug", "august", "agustus", "ağustos", "ağu", "aout"],
    ["sep", "september", "septembre", "eylül", "eyl"],
    ["oct", "oktober", "october", "octobre", "okt", "ekim", "eki"],
    ["nov", "november", "kasım", "kas", "novembre"],
    ["dec", "dez", "dezember", "december", "desember", "décembre", "aralık", "ara"],
]
MONTH_NUMBER = {name: i + 1 for i, names in enumerate(_MONTH_NAMES) for name in names}

# --- meta attribute keyword sets (constant.go:152-258) ----------------------
DATE_ATTRIBUTES = frozenset({
    "analyticsattributes.articledate", "article.created", "article_date_original",
    "article:post_date", "article.published", "article:published",
    "article:published_date", "article:published_time", "article:publicationdate",
    "bt:pubdate", "citation_date", "citation_publication_date",
    "content_create_date", "created", "cxenseparse:recs:publishtime", "date",
    "date_created", "date_published", "datecreated", "dateposted",
    "datepublished", "dc.date", "dc.created", "dc.date.created",
    "dc.date.issued", "dc.date.publication", "dcsext.articlefirstpublished",
    "dcterms.created", "dcterms.date", "dcterms.issued", "dc:created",
    "dc:date", "displaydate", "doc_date", "field-name-post-date", "gentime",
    "mediator_published_time", "meta", "og:article:published",
    "og:article:published_time", "og:datepublished", "og:pubdate",
    "og:publish_date", "og:published_time", "og:question:published_time",
    "og:regdate", "originalpublicationdate", "parsely-pub-date", "pdate",
    "ptime", "pubdate", "publishdate", "publish_date", "publish_time",
    "publish-date", "published-date", "published_date", "published_time",
    "publisheddate", "publication_date", "rbpubdate", "release_date",
    "rnews:datepublished", "sailthru.date", "shareaholic:article_published_time",
    "timestamp", "twt-published-at", "video:release_date", "vr:published_time",
})

PROPERTY_MODIFIED = frozenset({
    "article:modified", "article:modified_date", "article:modified_time",
    "article:post_modified", "bt:moddate", "datemodified", "dc.modified",
    "dcterms.modified", "lastmodified", "modified_time", "modificationdate",
    "og:article:modified_time", "og:modified_time", "og:updated_time",
    "release_date", "revision_date", "updated_time",
})

ATTR_MODIFIED_NAMES = frozenset({
    "lastdate", "lastmod", "lastmodified", "last-modified", "modified", "utime",
})

ATTR_PUBLISH_CLASSES = frozenset({"published", "date-published", "time-published"})

_ITEMPROP_ATTRS = ["datecreated", "datepublished", "pubyear", "datemodified", "dateupdate"]
ITEMPROP_ATTR_KEYS = frozenset(_ITEMPROP_ATTRS)
ITEMPROP_ORIGINAL = frozenset(_ITEMPROP_ATTRS[:3])
ITEMPROP_MODIFIED = frozenset(_ITEMPROP_ATTRS[3:])

# --- DOM cleanup (utils.go:40-51, selector/discard.go) ----------------------
CLEAN_TAGS = frozenset({
    "object", "embed", "applet",
    "frame", "frameset", "noframes", "iframe",
    "label", "map", "math",
    "audio", "canvas", "datalist",
    "picture", "rdf", "svg", "track", "video",
})
DISCARD_DIV_IDS = frozenset({"wm-ipp-base", "wm-ipp"})

# --- selector token sets (internal/selector/date.go, free-text.go) ----------
FAST_DATE_TAGS = frozenset({"div", "h2", "h3", "h4", "li", "p", "span", "time", "ul"})
FREE_TEXT_TAGS = FAST_DATE_TAGS
