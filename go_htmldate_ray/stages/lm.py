"""Corpus-trained character-bigram language-model scoring.

CCNet (Wenzek et al. 2020) buckets documents by LM perplexity to grade
web-text quality; the container has no pretrained LM, so this stage
trains the simplest honest stand-in — a Laplace-smoothed character
bigram model — on the corpus itself in one streaming pass, then scores
every document's negative log likelihood in a second.

Shape (both passes stream; the corpus never materializes):

1. **Count pass** — per-batch partial (kind, code, count) rows for
   bigram counts, prefix-char counts, and the character vocabulary,
   combined by ONE keyed ``Sum`` groupby.  The model table the driver
   receives is bounded by the distinct-bigram count (≤ ``max_model_rows``,
   loud error beyond — the web's codepoint-bigram vocabulary is bounded,
   unlike its word vocabulary) and is broadcast once via ``ray.put`` as
   sorted int64 numpy arrays (zero-copy from plasma in every task).
2. **Score pass** — per document, UTF-32 codepoints (vectorized numpy),
   bigram codes ``a·2²¹ + b``, model lookups via ``searchsorted`` over
   the batch's UNIQUE codes, and a per-worker nano memo so each distinct
   bigram pays ``math.log`` once per process.

Exactness contract (shared with :mod:`.search` / :mod:`.selection`):
per-bigram NLL contributions are integer **nanos**
(``floor(-ln((c2+1)/(c1+V))·1e9 + 0.5)``; ``math.log`` is bit-identical
to DuckDB's ``ln``), so per-document sums are exact integers the SQL
oracle reproduces bit-for-bit.  Documents with fewer than 2 characters
have no bigram evidence and are omitted on both sides.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

_NANO = 1e9
_K_CHAR, _K_PREFIX, _K_BIGRAM = 0, 1, 2
_SHIFT = 21  # max codepoint 0x10FFFF < 2^21


def _codepoints(text: str) -> np.ndarray:
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(
        np.int64
    )


def _count_rows(batch: pa.Table) -> pa.Table:
    kinds, codes, counts = [], [], []
    all_cp, pre_cp, big = [], [], []
    for t in batch.column("text").to_pylist():
        if not t:
            continue
        cp = _codepoints(t)
        all_cp.append(cp)
        if len(cp) >= 2:
            pre_cp.append(cp[:-1])
            big.append((cp[:-1] << _SHIFT) | cp[1:])
    for kind, parts in (
        (_K_CHAR, all_cp),
        (_K_PREFIX, pre_cp),
        (_K_BIGRAM, big),
    ):
        if not parts:
            continue
        u, c = np.unique(np.concatenate(parts), return_counts=True)
        kinds.append(np.full(len(u), kind, dtype=np.int64))
        codes.append(u)
        counts.append(c.astype(np.int64))
    if not kinds:
        return pa.table(
            {
                "kind": pa.array([], pa.int64()),
                "code": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "kind": pa.array(np.concatenate(kinds)),
            "code": pa.array(np.concatenate(codes)),
            "c": pa.array(np.concatenate(counts)),
        }
    )


def train_char_bigram(ds, *, max_model_rows: int = 2_000_000):
    """One streaming count pass → (bigram codes, bigram counts, prefix
    codes, prefix counts, V) with every code array sorted ascending."""
    from ray.data.aggregate import Sum

    rows = (
        ds.select_columns(["text"])
        .map_batches(_count_rows, batch_format="pyarrow")
        .groupby(["kind", "code"])
        .aggregate(Sum("c"))
        .take_all()
    )
    if len(rows) > max_model_rows:
        raise ValueError(
            f"char-bigram model has {len(rows)} rows > max_model_rows="
            f"{max_model_rows}; raise the cap or hash the alphabet"
        )
    by_kind: dict[int, list[tuple[int, int]]] = {
        _K_CHAR: [],
        _K_PREFIX: [],
        _K_BIGRAM: [],
    }
    for r in rows:
        by_kind[r["kind"]].append((r["code"], r["sum(c)"]))
    v_size = len(by_kind[_K_CHAR])

    def sorted_arrays(pairs):
        pairs.sort()
        if not pairs:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
        codes, counts = zip(*pairs)
        return (
            np.asarray(codes, dtype=np.int64),
            np.asarray(counts, dtype=np.int64),
        )

    bcodes, bcounts = sorted_arrays(by_kind[_K_BIGRAM])
    pcodes, pcounts = sorted_arrays(by_kind[_K_PREFIX])
    return bcodes, bcounts, pcodes, pcounts, v_size


# per-process memo: object-ref hex -> {bigram code: nano NLL} (keyed by
# the broadcast ref so two models in one worker never cross-pollinate)
_NANO_MEMO: dict[str, dict[int, int]] = {}


def charlm_nll(ds, *, max_model_rows: int = 2_000_000):
    """documents → (doc_id, n_bigrams, nll_nano): total negative log
    likelihood (integer nanos) of each document under the corpus-trained
    Laplace char-bigram model.  ``nll_nano / n_bigrams / 1e9`` is the
    cross-entropy in nats; ``exp`` of that is the CCNet-style perplexity
    (derived downstream — the engine emits only exact integers)."""
    import ray

    model_ref = ray.put(train_char_bigram(ds, max_model_rows=max_model_rows))
    ref_key = model_ref.hex()

    def score(batch: pa.Table) -> pa.Table:
        bcodes, bcounts, pcodes, pcounts, v = ray.get(model_ref)
        memo = _NANO_MEMO.setdefault(ref_key, {})
        out_ids, out_n, out_nll = [], [], []
        for d, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            if not t or len(t) < 2:
                continue
            cp = _codepoints(t)
            codes = (cp[:-1] << _SHIFT) | cp[1:]
            uc, inv = np.unique(codes, return_inverse=True)
            nanos = np.empty(len(uc), dtype=np.int64)
            for j, code in enumerate(uc.tolist()):
                n = memo.get(code)
                if n is None:
                    c2 = int(bcounts[np.searchsorted(bcodes, code)])
                    c1 = int(pcounts[np.searchsorted(pcodes, code >> _SHIFT)])
                    n = int(
                        math.floor(
                            -math.log((c2 + 1) / (c1 + v)) * _NANO + 0.5
                        )
                    )
                    memo[code] = n
                nanos[j] = n
            out_ids.append(d)
            out_n.append(len(codes))
            out_nll.append(int(nanos[inv].sum()))
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "n_bigrams": pa.array(out_n, pa.int64()),
                "nll_nano": pa.array(out_nll, pa.int64()),
            }
        )

    return ds.select_columns(["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )
