"""Text-analysis stages for large-scale training-data pipelines.

Vectorized batch transforms over the ``documents`` table: token counting,
quality scoring, fingerprinting, and a stopword-profile language
identifier.  All are pure batch functions usable directly in
``ds.map_batches(..., batch_format="pyarrow")``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def token_count_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_tokens — whitespace token count (str.split semantics)."""
    texts = batch.column("text").to_pylist()
    counts = [len(t.split()) if t else 0 for t in texts]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(counts, pa.int64()),
        }
    )


_PUNCT = set(".,;:!?'\"()[]{}-")
_QUALITY_STOPWORDS = frozenset(
    {"the", "and", "of", "to", "in", "is", "that", "for", "with", "a"}
)


def quality_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_chars_calc, n_tokens, n_uniq_tokens, punct_ratio,
    stopword_ratio — the standard web-text quality signals (length,
    vocabulary, punctuation density, stopword density).  Ratios are
    rounded to 6 decimals to match the SQL oracle's arithmetic."""
    texts = batch.column("text").to_pylist()
    n_chars, n_tokens, n_uniq, punct_r, stop_r = [], [], [], [], []
    for t in texts:
        t = t or ""
        toks = t.split()
        n_chars.append(len(t))
        n_tokens.append(len(toks))
        n_uniq.append(len(set(toks)))
        punct_r.append(
            round(sum(1 for c in t if c in _PUNCT) / len(t), 6) if t else 0.0
        )
        stop_r.append(
            round(
                sum(1 for w in toks if w.lower() in _QUALITY_STOPWORDS) / len(toks), 6
            )
            if toks
            else 0.0
        )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars_calc": pa.array(n_chars, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_uniq_tokens": pa.array(n_uniq, pa.int64()),
            "punct_ratio": pa.array(punct_r, pa.float64()),
            "stopword_ratio": pa.array(stop_r, pa.float64()),
        }
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """doc_id, fingerprint — md5 of whitespace-normalized lowercased text,
    first 16 hex chars (mirrors the SQL ``substr(md5(...),1,16)``)."""
    texts = batch.column("text").to_pylist()
    fps = []
    for t in texts:
        norm = " ".join((t or "").split()).lower()
        fps.append(hashlib.md5(norm.encode("utf-8")).hexdigest()[:16])
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fingerprint": pa.array(fps, pa.string()),
        }
    )


# Minimal stopword profiles for the n-gram-free heuristic language ID.
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "a"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "für", "ein", "nicht"},
    "fr": {"le", "la", "les", "et", "de", "est", "pour", "dans", "une", "que"},
    "es": {"el", "la", "los", "de", "y", "es", "para", "con", "una", "por"},
    "id": {"yang", "dan", "di", "ini", "itu", "dengan", "untuk", "dari", "pada", "ke"},
}


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """doc_id, pred_lang, lang_score — stopword-profile argmax; 'und'
    (undetermined) when no profile scores."""
    texts = batch.column("text").to_pylist()
    preds, scores = [], []
    for t in texts:
        toks = (t or "").lower().split()
        if not toks:
            preds.append("und")
            scores.append(0.0)
            continue
        tokset = toks  # count every occurrence, not just unique
        best_lang, best = "und", 0
        for lang, profile in _LANG_PROFILES.items():
            hits = sum(1 for tok in tokset if tok in profile)
            if hits > best:
                best, best_lang = hits, lang
        preds.append(best_lang)
        scores.append(best / len(toks))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "pred_lang": pa.array(preds, pa.string()),
            "lang_score": pa.array(scores, pa.float64()),
        }
    )


# --- rolling-hash winnowing fingerprints -------------------------------------

_ROLL_BASE = 257
_ROLL_MOD = (1 << 61) - 1


def _rolling_hashes(text: str, k: int) -> list[int]:
    """Rabin-Karp rolling hashes of every k-char window (O(n))."""
    n = len(text)
    if n < k:
        return []
    h = 0
    pow_k = pow(_ROLL_BASE, k - 1, _ROLL_MOD)
    out = []
    for i, ch in enumerate(text):
        h = (h * _ROLL_BASE + ord(ch)) % _ROLL_MOD
        if i >= k:
            h = (h - ord(text[i - k]) * pow_k * _ROLL_BASE) % _ROLL_MOD
        if i >= k - 1:
            out.append(h)
    return out


def winnow_fingerprints(text: str, k: int = 8, window: int = 4) -> list[int]:
    """Winnowing (Schleimer et al., SIGMOD 2003): keep the minimum rolling
    hash of each sliding window — a position-robust document fingerprint
    set whose overlap estimates shared substrings."""
    hashes = _rolling_hashes(" ".join(text.split()).lower(), k)
    if not hashes:
        return []
    picked = []
    last = -1
    for i in range(max(1, len(hashes) - window + 1)):
        w = hashes[i : i + window]
        j = i + min(range(len(w)), key=w.__getitem__)
        if j != last:
            picked.append(w[j - i])
            last = j
    return sorted(set(picked))


def winnow_batch(batch: pa.Table, k: int = 8, window: int = 4) -> pa.Table:
    """doc_id, n_fingerprints, min_fingerprint — winnowed rolling-hash
    summary per document (full sets kept out of the driver-facing schema;
    pairwise overlap uses the stage directly)."""
    texts = batch.column("text").to_pylist()
    counts, mins = [], []
    for t in texts:
        fps = winnow_fingerprints(t or "", k, window)
        counts.append(len(fps))
        mins.append(min(fps) if fps else 0)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_fingerprints": pa.array(counts, pa.int64()),
            "min_fingerprint": pa.array(mins, pa.int64()),
        }
    )
