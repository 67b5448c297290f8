"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ``ray.init`` / ``ray.shutdown``.

``queries()`` maps one entry per implemented operator/pipeline from
SURVEY.md §2 (+ the training-data operators) to a callable over an sf
dir; ``oracle_sql()`` gives the DuckDB-equivalent SQL where the operator
is SQL-expressible (the synthetic pages source embeds its dates through
pure integer arithmetic on doc_id precisely so the extraction pipelines
have independent SQL oracles — see go_htmldate_ray/sources/pages.py).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# SQL fragment recomputing the synthesized page date (sources/pages.py)
_DATE_SQL = "(DATE '2000-01-01' + ((doc_id * 7919) % 9000)::INTEGER)"
_URL_SQL = (
    "CASE WHEN doc_id % 4 = 2 THEN "
    "'https://site' || (doc_id % 97) || '.example.org/' || "
    f"strftime({_DATE_SQL}, '%Y/%m/%d') || '/post-' || doc_id || '.html' "
    "ELSE 'https://site' || (doc_id % 97) || '.example.org/article/' || doc_id || '.html' END"
)


def entry() -> Any:
    """Flagship pipeline on sf0.001: pages → date extraction."""
    from go_htmldate_ray.pipelines.extract_dates import extract_dates

    return extract_dates("/root/testdata/sf0.001", concurrency=(1, 4))


def queries() -> dict[str, Callable[[str], Any]]:
    from go_htmldate_ray.pipelines import analytics, extract_dates as ed
    from go_htmldate_ray.stages import dedup, similarity, text_stage

    def _docs(sf_dir):
        import ray.data

        return ray.data.read_parquet(f"{sf_dir}/documents.parquet")

    def _map(sf_dir, fn, columns):
        import ray.data

        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)
        return ds.map_batches(fn, batch_format="pyarrow")

    return {
        "extract_dates": lambda sf: ed.extract_dates(sf),
        "extract_dates_extensive": lambda sf: ed.extract_dates(
            sf, skip_extensive_search=False
        ),
        "url_dates": ed.url_dates,
        "host_page_counts": ed.host_page_counts,
        "token_counts": lambda sf: _map(
            sf, text_stage.token_count_batch, ["doc_id", "text"]
        ),
        "quality_scores": lambda sf: _map(
            sf, text_stage.quality_batch, ["doc_id", "text"]
        ),
        "fingerprints": lambda sf: _map(
            sf, text_stage.fingerprint_batch, ["doc_id", "text"]
        ),
        "lang_id": lambda sf: _map(sf, text_stage.lang_id_batch, ["doc_id", "text"]),
        "winnow_fingerprints": lambda sf: _map(
            sf, text_stage.winnow_batch, ["doc_id", "text"]
        ),
        "dedup_exact": lambda sf: dedup.exact_dedup(_docs(sf)),
        "minhash_dedup_pairs": lambda sf: dedup.minhash_lsh_pairs(_docs(sf)),
        "simhash": lambda sf: _map(sf, dedup.simhash_batch, ["doc_id", "text"]),
        "token_jaccard_pairs": lambda sf: dedup.token_jaccard_pairs(
            _docs(sf), max_doc_id=200, min_jaccard=0.5
        ),
        "ann_cosine_topk": lambda sf: similarity.brute_force_topk(
            _embeddings(sf), query_ids=list(range(8)), k=5
        ),
        "ann_lsh_topk": lambda sf: similarity.lsh_topk(
            _embeddings(sf), query_ids=list(range(8)), k=5
        ),
        "embedding_dup_pairs": lambda sf: similarity.embedding_dup_pairs(
            _embeddings(sf), threshold=0.4
        ),
        "crawl_reachable": _crawl_reachable,
        "golden_corpus_dates": _golden_corpus_dates,
        "windowed_events": _streaming("windowed_events"),
        "asof_latest_order": _streaming("asof_join_latest_order"),
        "sessionize_events": _streaming("sessionize_events"),
        "events_by_type": analytics.events_by_type,
        "top_users_by_value": analytics.top_users_by_value,
        "orders_by_segment": analytics.orders_by_segment,
        "pricing_summary": analytics.pricing_summary,
    }


def _embeddings(sf_dir):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


def _crawl_reachable(sf_dir):
    from go_htmldate_ray.pipelines.crawl import crawl_reachable

    return crawl_reachable(sf_dir)


def _golden_corpus_dates(sf_dir):
    """Real-page pipeline over the reference's 1000-doc corpus (read-only
    fixture; independent of sf_dir). Rows-only check — the byte-exact
    parity gate lives in tests/test_golden_corpus.py."""
    import json
    from pathlib import Path

    import pyarrow as pa
    import ray.data

    from go_htmldate_ray.stages.extract_stage import HtmldateExtractor

    data = Path(__file__).parent / "tests" / "data" / "comparison_corpus.json"
    entries = json.loads(data.read_text())
    dirs = [
        Path("/root/reference/test-files") / d
        for d in ("mediacloud", "comparison", "mock")
    ]
    items = []
    for e in entries:
        for d in dirs:
            p = d / e["file"]
            if p.exists():
                items.append({"url": e["url"], "path": str(p)})
                break
    ds = ray.data.from_items(items, override_num_blocks=64)

    def load(batch):
        htmls = [open(p, "rb").read() for p in batch.column("path").to_pylist()]
        return pa.table(
            {"url": batch.column("url"), "html": pa.array(htmls, pa.binary())}
        )

    return (
        ds.map_batches(load, batch_format="pyarrow", batch_size=32)
        .map_batches(
            HtmldateExtractor,
            fn_constructor_kwargs={
                "use_original_date": True,
                "skip_extensive_search": True,
            },
            batch_format="pyarrow",
            batch_size=32,
            concurrency=(1, 8),
            num_cpus=1,
        )
        .select_columns(["url", "date_str"])
    )


def _streaming(name):
    def run(sf_dir):
        from go_htmldate_ray.pipelines import streaming

        return getattr(streaming, name)(sf_dir)

    return run


def oracle_sql() -> dict[str, str]:
    return {
        "extract_dates": f"""
            SELECT doc_id, {_URL_SQL} AS url,
                   strftime({_DATE_SQL}, '%Y-%m-%d') AS date_str
            FROM documents""",
        "extract_dates_extensive": f"""
            SELECT doc_id, {_URL_SQL} AS url,
                   strftime({_DATE_SQL}, '%Y-%m-%d') AS date_str
            FROM documents""",
        "url_dates": f"""
            SELECT doc_id,
                   CASE WHEN doc_id % 4 = 2
                        THEN strftime({_DATE_SQL}, '%Y-%m-%d')
                        ELSE '' END AS url_date
            FROM documents""",
        "host_page_counts": """
            SELECT 'site' || (doc_id % 97) || '.example.org' AS host,
                   count(*) AS n_pages
            FROM documents GROUP BY 1""",
        "token_counts": r"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE length(regexp_split_to_array(trim(text), '\s+')) END
                       AS n_tokens
            FROM documents""",
        "quality_scores": r"""
            SELECT doc_id,
                   length(text) AS n_chars_calc,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE length(regexp_split_to_array(trim(text), '\s+')) END
                       AS n_tokens,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE length(list_distinct(regexp_split_to_array(trim(text), '\s+'))) END
                       AS n_uniq_tokens
            FROM documents""",
        "fingerprints": r"""
            SELECT doc_id,
                   substr(md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))), 1, 16)
                       AS fingerprint
            FROM documents""",
        "dedup_exact": """
            SELECT min(doc_id) AS doc_id, count(*) AS n_dups
            FROM documents GROUP BY text""",
        "token_jaccard_pairs": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_distinct(regexp_split_to_array(trim(text), '\s+')) AS ts
                FROM documents WHERE doc_id < 200 AND trim(text) != ''
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   round(length(list_intersect(a.ts, b.ts))::DOUBLE
                         / length(list_distinct(list_concat(a.ts, b.ts))), 6) AS jaccard
            FROM toks a JOIN toks b ON a.doc_id < b.doc_id
            WHERE length(list_intersect(a.ts, b.ts))::DOUBLE
                  / length(list_distinct(list_concat(a.ts, b.ts))) >= 0.5""",
        "ann_cosine_topk": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8),
            scored AS (
                SELECT q.qid, e.vec_id AS nid,
                       list_cosine_similarity(q.qe::DOUBLE[], e.embedding::DOUBLE[]) AS c
                FROM q, embeddings e WHERE e.vec_id != q.qid
            ),
            ranked AS (
                SELECT qid, nid,
                       row_number() OVER (PARTITION BY qid ORDER BY c DESC, nid ASC) AS rnk
                FROM scored
            )
            SELECT qid AS query_id, nid AS neighbor_id, rnk AS rank
            FROM ranked WHERE rnk <= 5""",
        "embedding_dup_pairs": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 6) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]) >= 0.4""",
        # Crawl oracle: the converged robots-respecting visited set equals
        # the reachable set of the deterministic link graph (seeds = docs
        # 0..9, edges doc → (13d+1)%N and (29d+7)%N, hosts with index%13==0
        # disallow /article/ paths) — recomputed here with a recursive CTE.
        "crawl_reachable": f"""
            WITH RECURSIVE reach(id) AS (
                SELECT doc_id FROM documents WHERE doc_id < 10
                  AND NOT ((doc_id % 97) % 13 = 0 AND doc_id % 4 != 2)
                UNION
                SELECT t.target FROM reach r
                JOIN (
                    SELECT doc_id,
                           (doc_id*13+1) % (SELECT count(*) FROM documents) AS target
                    FROM documents
                    UNION ALL
                    SELECT doc_id,
                           (doc_id*29+7) % (SELECT count(*) FROM documents) AS target
                    FROM documents
                ) t ON t.doc_id = r.id
                WHERE NOT ((t.target % 97) % 13 = 0 AND t.target % 4 != 2)
            )
            SELECT id AS doc_id,
                   {_URL_SQL.replace('doc_id', 'id')} AS url
            FROM reach""",
        "windowed_events": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
                   count(*) AS n_events, round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2""",
        "asof_latest_order": """
            SELECT e.event_id,
                   coalesce(o.o_orderkey, -1) AS o_orderkey
            FROM events e
            LEFT JOIN LATERAL (
                SELECT o_orderkey FROM orders o2
                WHERE o2.o_custkey = e.user_id
                  AND o2.o_orderdate <= CAST(e.ts AS DATE)
                ORDER BY o2.o_orderdate DESC, o2.o_orderkey DESC
                LIMIT 1
            ) o ON TRUE""",
        "sessionize_events": """
            WITH ordered AS (
                SELECT event_id, user_id, ts,
                       CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT event_id,
                   CAST(user_id * 1000000
                        + sum(new_session) OVER (
                              PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING
                          ) AS BIGINT) AS session_id
            FROM ordered""",
        "events_by_type": """
            SELECT event_type, count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY event_type""",
        "top_users_by_value": """
            SELECT user_id, round(sum(value), 2) AS total_value
            FROM events GROUP BY user_id
            ORDER BY sum(value) DESC, user_id ASC LIMIT 10""",
        "orders_by_segment": """
            SELECT c.c_mktsegment, count(*) AS n_orders,
                   round(sum(o.o_totalprice), 2) AS total_price
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment""",
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
                   sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0
                       AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus""",
        # lang_id, simhash, minhash_dedup_pairs, ann_lsh_topk: model-style /
        # LSH-bucketed operators, not SQL-expressible → rows-only checks.
    }
