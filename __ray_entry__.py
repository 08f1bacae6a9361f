"""Driver contract for the graft builder (Ray Data target).

- ``entry()``: flagship curation pipeline over the deterministic
  synthetic pages table derived from sf0.001 scale.
- ``queries()``: one entry per implemented operator/pipeline from
  SURVEY.md §2 (plus the scale extensions: dedup family, ANN, text
  analysis).
- ``oracle_sql()``: DuckDB-equivalent SQL for every SQL-expressible
  query — including the near-dup family (minhash clusters, simhash
  pairs, fingerprints), whose shared Mersenne-61 polynomial hashing
  (``neuscraper_ray.functions.polyhash``) was designed to be exactly
  reproducible in SQL. Only model-based / approximate / iterative /
  full-pipeline ops are rows-only (langid, LSH+IVF ANN, the HLL
  sketch, k-means, the multimodal decode stub, annotation offsets,
  curate itself), each with a rationale in its docstring.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in ``neuscraper_ray``) calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on synthetic pages at sf0.001 scale."""
    import ray.data

    from neuscraper_ray.pipelines.curate import CurateConfig, curate
    from neuscraper_ray.queries import _pages_dir_for

    pages = ray.data.read_parquet(
        _pages_dir_for("/root/testdata/sf0.001"), columns=["url", "html"]
    )
    out = curate(pages, CurateConfig())
    df = out.to_pandas().sort_values("url").reset_index(drop=True)
    df["quality_flags"] = df["quality_flags"].map(
        lambda fl: ",".join(list(fl)) if fl is not None else ""
    )
    return df


def queries() -> dict[str, Callable[[str], Any]]:
    from neuscraper_ray.queries import ALL_QUERIES

    return dict(ALL_QUERIES)


def oracle_sql() -> dict[str, str]:
    from neuscraper_ray.functions import dsir as _dsir
    from neuscraper_ray.functions import polyhash
    from neuscraper_ray.functions import ann as _ann
    from neuscraper_ray.functions import urls as _urls
    from neuscraper_ray.queries import docs as _docs_q
    from neuscraper_ray.stages import heuristics as _heur

    def _temp_rate_ctes(tok: str) -> str:
        """The alpha=0.5 temperature-rate CTE chain (integer-corrected
        sqrt, exact below 2^52) over a (source, n_tokens) relation —
        shared by docs_temperature_mix and docs_curation_funnel."""
        return (
            f"tot AS (SELECT source, sum(n_tokens)::BIGINT AS total "
            f"FROM {tok} GROUP BY source), "
            "w0 AS (SELECT source, total, "
            "CAST(floor(sqrt(total::DOUBLE)) AS BIGINT) AS s0 FROM tot), "
            "w1 AS (SELECT source, total, "
            "s0 - (CASE WHEN s0 * s0 > total THEN 1 ELSE 0 END) AS s1 FROM w0), "
            "w2 AS (SELECT source, total, "
            "s1 + (CASE WHEN (s1 + 1) * (s1 + 1) <= total THEN 1 ELSE 0 END) "
            "AS w FROM w1), "
            "c AS (SELECT min((total::HUGEINT * 1000000) // w::HUGEINT) AS cc "
            "FROM w2 WHERE w > 0), "
            "r AS (SELECT source, CASE WHEN total = 0 THEN 0 ELSE "
            "((w::HUGEINT * (SELECT cc FROM c)) // total::HUGEINT) END::BIGINT "
            "AS rate_ppm FROM w2)"
        )

    return {
        "docs_curation_funnel": (
            "WITH uf AS (SELECT doc_id FROM ("
            + _urls.sql_url_filter("documents")
            + ") WHERE keep), "
            "qf AS (" + _heur.sql_quality_filter("documents") + "), "
            "s2 AS (SELECT d.doc_id, d.source, d.text FROM documents d "
            "JOIN uf USING (doc_id) "
            "JOIN qf ON qf.doc_id = d.doc_id AND qf.keep = 1), "
            "s3 AS (SELECT doc_id, source, text FROM ("
            "SELECT s2.*, row_number() OVER (PARTITION BY md5(text) "
            "ORDER BY doc_id) AS rn FROM s2) WHERE rn = 1), "
            "tok AS (SELECT doc_id, source, "
            "len(str_split(text, ' '))::BIGINT AS n_tokens FROM s3), "
            + _temp_rate_ctes("tok")
            + ", s4 AS (SELECT t.doc_id FROM tok t JOIN r USING (source) "
            "WHERE (" + polyhash.sql_gate_ppm("t.doc_id::VARCHAR") + ") "
            "< r.rate_ppm) "
            "SELECT 'input' AS stage, "
            "(SELECT count(*) FROM documents)::BIGINT AS n_docs "
            "UNION ALL SELECT 'url_filter', (SELECT count(*) FROM uf) "
            "UNION ALL SELECT 'quality_filter', (SELECT count(*) FROM s2) "
            "UNION ALL SELECT 'exact_dedup', (SELECT count(*) FROM s3) "
            "UNION ALL SELECT 'temperature_mix', (SELECT count(*) FROM s4)"
        ),
        "docs_fingerprint": (
            "SELECT doc_id, "
            + polyhash.sql_fingerprint("text")
            + " AS fingerprint FROM documents"
        ),
        "docs_simhash_pairs": polyhash.sql_simhash_pairs("documents"),
        "docs_dedup_apply": (
            "WITH cl AS (" + polyhash.sql_minhash_clusters("documents") + ") "
            "SELECT d.doc_id, d.lang, d.n_chars FROM documents d "
            "LEFT JOIN cl ON d.doc_id = cl.doc_id "
            "WHERE cl.doc_id IS NULL OR cl.cluster_id = d.doc_id"
        ),
        "docs_minhash_clusters": polyhash.sql_minhash_clusters("documents"),
        "docs_stratified_sample": (
            "SELECT doc_id, lang FROM documents WHERE "
            "(" + polyhash.sql_fingerprint("doc_id::VARCHAR") + ") "
            "% (CASE WHEN lang = 'en' THEN 2 ELSE 10 END) = 0"
        ),
        "docs_sample_per_lang": (
            "SELECT lang, doc_id, rn FROM ("
            "SELECT lang, doc_id, row_number() OVER (PARTITION BY lang "
            "ORDER BY (" + polyhash.sql_fingerprint("doc_id::VARCHAR") + "), "
            "doc_id)::BIGINT AS rn FROM documents) WHERE rn <= 5"
        ),
        "docs_decontaminate": polyhash.sql_decontaminate("documents"),
        "docs_contamination_frac": polyhash.sql_contamination_frac("documents"),
        "docs_span_decontaminate": polyhash.sql_span_decontaminate("documents"),
        "docs_dsir_weights": _dsir.sql_dsir("documents"),
        "docs_mix_sources": (
            "SELECT doc_id, source FROM documents WHERE "
            "(" + polyhash.sql_fingerprint("doc_id::VARCHAR") + ") % 100 < "
            "((CAST(substring(source, 4) AS BIGINT) % 4) + 1) * 25"
        ),
        "docs_temperature_mix": (
            "WITH tok AS (SELECT doc_id, source, "
            "len(str_split(text, ' '))::BIGINT AS n_tokens FROM documents), "
            + _temp_rate_ctes("tok")
            + " SELECT t.doc_id, t.source, t.n_tokens, r.rate_ppm, "
            "((" + polyhash.sql_gate_ppm("t.doc_id::VARCHAR") + ") "
            "< r.rate_ppm) AS keep "
            "FROM tok t JOIN r USING (source)"
        ),
        "docs_unimax_mix": (
            "WITH RECURSIVE t AS ("
            "SELECT source, sum(len(str_split(text, ' ')))::BIGINT AS n_tokens "
            "FROM documents GROUP BY source), "
            "o AS (SELECT source, n_tokens, 4*n_tokens AS cap_tokens, "
            "row_number() OVER (ORDER BY 4*n_tokens ASC, source ASC) AS rn, "
            "count(*) OVER () AS n FROM t), "
            "b AS (SELECT sum(n_tokens)::BIGINT AS budget FROM t), "
            "wf(rn, alloc, rem) AS ("
            "SELECT 0::BIGINT, 0::BIGINT, (SELECT budget FROM b) "
            "UNION ALL "
            "SELECT o.rn, least(o.cap_tokens, w.rem // (o.n - o.rn + 1)), "
            "w.rem - least(o.cap_tokens, w.rem // (o.n - o.rn + 1)) "
            "FROM wf w JOIN o ON o.rn = w.rn + 1) "
            "SELECT o.source, o.n_tokens, o.cap_tokens, "
            "wf.alloc AS alloc_tokens, "
            "CASE WHEN o.n_tokens > 0 THEN (wf.alloc * 1000000) // o.n_tokens "
            "ELSE 0 END AS epochs_e6 "
            "FROM wf JOIN o USING (rn) WHERE wf.rn >= 1"
        ),
        "docs_token_budget_mix": (
            "WITH qf AS (" + _heur.sql_quality_filter("documents") + "), "
            "t AS (SELECT d.doc_id, d.source, q.keep, "
            f"least(q.n_words, {_docs_q.NW_CLAMP}) AS n_words "
            "FROM documents d JOIN qf q USING (doc_id)), "
            "s AS (SELECT source, sum(n_words)::BIGINT AS total "
            "FROM t GROUP BY source), "
            "c AS (SELECT t.*, sum(n_words) OVER (PARTITION BY source "
            "ORDER BY keep DESC, n_words DESC, doc_id ASC "
            "ROWS UNBOUNDED PRECEDING)::BIGINT AS cum FROM t) "
            "SELECT c.doc_id, c.source, c.keep::BIGINT AS keep_rule, "
            "c.n_words::BIGINT AS n_tokens "
            "FROM c JOIN s USING (source) WHERE cum * 10 <= total * 4"
        ),
        "docs_quality_percentile": (
            "WITH h AS (SELECT n_chars AS v, count(*)::BIGINT AS c "
            "FROM documents GROUP BY 1), "
            "cum AS (SELECT v, (sum(c) OVER (ORDER BY v) - c)::BIGINT AS below "
            "FROM h), "
            "t AS (SELECT greatest(count(*) - 1, 1)::BIGINT AS denom "
            "FROM documents) "
            "SELECT doc_id, n_chars, "
            "((below * 1000000) // denom)::BIGINT AS pct_rank_ppm "
            "FROM documents JOIN cum ON n_chars = v CROSS JOIN t"
        ),
        "docs_jaccard_pairs": polyhash.sql_jaccard_pairs("documents"),
        "docs_minhash_precision": polyhash.sql_minhash_precision("documents"),
        "docs_dedup_cluster_stats": (
            "WITH cl AS (" + polyhash.sql_minhash_clusters("documents") + "), "
            "sz AS (SELECT cluster_id, count(*)::BIGINT AS cluster_size "
            "FROM cl GROUP BY 1), "
            "h AS (SELECT cluster_size, count(*)::BIGINT AS n_clusters "
            "FROM sz GROUP BY 1 UNION ALL SELECT 1, "
            "(SELECT count(*) FROM documents) - (SELECT count(*) FROM cl)) "
            "SELECT cluster_size, sum(n_clusters)::BIGINT AS n_clusters, "
            "(cluster_size * sum(n_clusters))::BIGINT AS n_docs "
            "FROM h GROUP BY cluster_size HAVING sum(n_clusters) > 0 "
            "ORDER BY cluster_size"
        ),
        "docs_cross_source_overlap": (
            "WITH p AS (" + polyhash.sql_jaccard_pairs("documents") + ") "
            "SELECT p.id_a, p.id_b, da.source AS source_a, "
            "db.source AS source_b, p.jacc_e6 "
            "FROM p JOIN documents da ON p.id_a = da.doc_id "
            "JOIN documents db ON p.id_b = db.doc_id "
            "WHERE da.source <> db.source"
        ),
        "docs_token_quantiles": (
            "SELECT unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS p, "
            "unnest(quantile_disc(n_tokens, [0.25, 0.5, 0.75, 0.9, 0.99]))::BIGINT "
            "AS value FROM (SELECT len(str_split(text, ' '))::BIGINT AS n_tokens "
            "FROM documents)"
        ),
        "docs_length_quantiles_by_lang": (
            "SELECT lang, quantile_disc(n_chars, 0.5)::BIGINT AS p50_chars, "
            "quantile_disc(n_chars, 0.9)::BIGINT AS p90_chars "
            "FROM documents GROUP BY lang"
        ),
        "docs_top_terms": (
            "SELECT term, count(*)::BIGINT AS n FROM ("
            "SELECT unnest(list_filter(string_split_regex(text, "
            "'[ \\t\\n\\x0b\\x0c\\r]+'), w -> w != '')) AS term FROM documents) "
            "GROUP BY term ORDER BY n DESC, term ASC LIMIT 20"
        ),
        "docs_vocab_stats": (
            "WITH tok AS (SELECT unnest(list_transform("
            "list_filter(string_split_regex(text, '[ \\t\\n\\x0b\\x0c\\r]+'), "
            "w -> w != ''), w -> lower(w))) AS term FROM documents), "
            "c AS (SELECT term, count(*)::BIGINT AS n FROM tok GROUP BY term) "
            "SELECT count(*)::BIGINT AS n_terms, "
            "sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax, "
            "sum(n)::BIGINT AS total_tokens, "
            "((count(*) * 1000000) // sum(n))::BIGINT AS ttr_ppm FROM c"
        ),
        "docs_bigram_pmi": (
            "WITH d AS (SELECT doc_id, list_transform("
            "list_filter(string_split_regex(text, '[ \\t\\n\\x0b\\x0c\\r]+'), "
            "w -> w != ''), w -> lower(w)) AS ws FROM documents), "
            "bg AS (SELECT unnest(list_zip(ws[1:len(ws)-1], ws[2:len(ws)])) "
            "AS pr FROM d WHERE len(ws) >= 2), "
            "pc AS (SELECT pr[1] AS x, pr[2] AS y, count(*)::BIGINT AS n_xy "
            "FROM bg GROUP BY 1, 2), "
            "uc AS (SELECT term, count(*)::BIGINT AS n FROM ("
            "SELECT unnest(ws) AS term FROM d) GROUP BY term) "
            "SELECT pc.x, pc.y, pc.n_xy, ((pc.n_xy::HUGEINT * 1000000000) // "
            "(ux.n::HUGEINT * uy.n::HUGEINT))::BIGINT AS score "
            "FROM pc JOIN uc ux ON pc.x = ux.term "
            "JOIN uc uy ON pc.y = uy.term WHERE pc.n_xy >= 5 "
            "ORDER BY score DESC, x ASC, y ASC LIMIT 20"
        ),
        "docs_exactsubstr_dedup": polyhash.sql_exactsubstr_dedup(
            "documents", k=20
        ),
        "docs_intra_dedup": polyhash.sql_intra_doc_dedup(
            "documents", k=3
        ),
        "docs_chunk_dedup": (
            "WITH d AS (SELECT doc_id, list_filter(string_split_regex(text, "
            "'[ \\t\\n\\x0b\\x0c\\r]+'), w -> w != '') AS ws FROM documents), "
            "ch AS (SELECT doc_id, unnest(list_transform("
            "range(((len(ws) + 9) // 10)::BIGINT), "
            "k -> struct_pack(ci := k, chunk := array_to_string("
            "ws[(k*10+1)::BIGINT:((k+1)*10)::BIGINT], ' ')))) AS c FROM d), "
            "fl AS (SELECT doc_id, c.ci AS chunk_idx, c.chunk AS chunk FROM ch), "
            "rn AS (SELECT *, row_number() OVER (PARTITION BY chunk "
            "ORDER BY doc_id, chunk_idx) AS rn FROM fl), "
            "agg AS (SELECT doc_id, count(*)::BIGINT AS n_chunks, "
            "sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept, "
            "coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' "
            "ORDER BY chunk_idx), '') AS text_dedup FROM rn GROUP BY doc_id) "
            "SELECT d2.doc_id, coalesce(a.n_chunks, 0)::BIGINT AS n_chunks, "
            "coalesce(a.n_kept, 0)::BIGINT AS n_kept, "
            "coalesce(a.text_dedup, '') AS text_dedup "
            "FROM documents d2 LEFT JOIN agg a ON d2.doc_id = a.doc_id"
        ),
        "docs_posting_lists": (
            "WITH split AS (SELECT doc_id, list_filter(string_split_regex(text, "
            "'[ \\t\\n\\x0b\\x0c\\r]+'), w -> w != '') AS ws FROM documents), "
            "top AS (SELECT term, count(*)::BIGINT AS n FROM ("
            "SELECT unnest(ws) AS term FROM split) GROUP BY term "
            "ORDER BY n DESC, term ASC LIMIT 20), "
            "tok AS (SELECT DISTINCT doc_id, term FROM ("
            "SELECT doc_id, unnest(ws) AS term FROM split)) "
            "SELECT t.term, count(*)::BIGINT AS df, "
            "string_agg(t.doc_id::VARCHAR, ',' ORDER BY t.doc_id) AS doc_ids "
            "FROM tok t JOIN top USING (term) GROUP BY t.term"
        ),
        "docs_length_deciles": (
            "WITH b AS (SELECT quantile_disc(n_chars, "
            "[0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs FROM documents) "
            "SELECT doc_id, n_chars, "
            "len(list_filter((SELECT bs FROM b), x -> x <= n_chars))::BIGINT "
            "AS decile FROM documents"
        ),
        "events_sample": (
            "SELECT event_id, event_type FROM events "
            "WHERE (" + polyhash.sql_fingerprint("event_id::VARCHAR") + ") % 20 = 0"
        ),
        "docs_pack_sequences": (
            "SELECT doc_id, n_tokens, "
            "(sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens)::BIGINT "
            "AS start_offset, "
            "((sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens) // 512)::BIGINT "
            "AS seq_id FROM (SELECT doc_id, "
            "len(str_split(text, ' '))::BIGINT AS n_tokens FROM documents)"
        ),
        "docs_token_count": (
            "SELECT doc_id, len(str_split(text, ' '))::BIGINT AS n_tokens "
            "FROM documents"
        ),
        "docs_content_hash": (
            "SELECT doc_id, md5(text) AS content_hash FROM documents"
        ),
        "docs_exact_dedup": (
            "SELECT min(doc_id) AS doc_id, count(*)::BIGINT AS n_copies "
            "FROM documents GROUP BY text"
        ),
        "docs_exact_dedup_fp": (
            "SELECT min(doc_id) AS doc_id, count(*)::BIGINT AS n_copies "
            "FROM documents GROUP BY " + polyhash.sql_fingerprint("text")
        ),
        "docs_soft_dedup": (
            "SELECT doc_id, "
            "count(*) OVER (PARTITION BY md5(text))::BIGINT AS n_copies, "
            "(1000000 // count(*) OVER (PARTITION BY md5(text)))::BIGINT "
            "AS weight_ppm FROM documents"
        ),
        "docs_line_dedup": """
            WITH l0 AS (
              SELECT doc_id, unnest(string_split(text, chr(10))) AS raw
              FROM documents
            ),
            l AS (
              SELECT DISTINCT doc_id,
                trim(raw, ' ' || chr(9) || chr(13)) AS line
              FROM l0
              WHERE trim(raw, ' ' || chr(9) || chr(13)) <> ''
            ),
            c AS (SELECT line, count(*) AS nd FROM l GROUP BY line),
            p AS (
              SELECT l.doc_id, count(*)::BIGINT AS n_lines,
                sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END)::BIGINT
                  AS n_dup_lines
              FROM l JOIN c USING (line) GROUP BY l.doc_id
            )
            SELECT d.doc_id,
              coalesce(p.n_lines, 0)::BIGINT AS n_lines,
              coalesce(p.n_dup_lines, 0)::BIGINT AS n_dup_lines,
              coalesce((p.n_dup_lines * 1000000) // p.n_lines, 0)::BIGINT
                AS dup_line_ppm
            FROM documents d LEFT JOIN p USING (doc_id)
        """,
        "docs_ngram_coverage": (
            "WITH "
            + polyhash.sql_shingle_ctes("documents")
            + ", c AS (SELECT s32, count(*)::BIGINT AS nd FROM shu GROUP BY s32), "
            "p AS (SELECT shu.doc_id, count(*)::BIGINT AS n_shingles, "
            "sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_shared "
            "FROM shu JOIN c USING (s32) GROUP BY shu.doc_id) "
            "SELECT doc_id, n_shingles, n_shared, "
            "((n_shared * 1000000) // n_shingles)::BIGINT AS coverage_ppm FROM p"
        ),
        "docs_boilerplate_lines": """
            WITH ls AS (
              SELECT doc_id, string_split(text, chr(10)) AS ls
              FROM documents
            ),
            l0 AS (
              SELECT doc_id, unnest(list_transform(range(len(ls)),
                k -> struct_pack(li := k, raw := ls[(k+1)::BIGINT]))) AS s
              FROM ls
            ),
            fl AS (
              SELECT doc_id, s.li AS line_idx,
                trim(s.raw, ' ' || chr(9) || chr(13)) AS line
              FROM l0
            ),
            nz AS (SELECT * FROM fl WHERE line <> ''),
            bl AS (
              SELECT line, count(DISTINCT doc_id)::BIGINT AS nd
              FROM nz GROUP BY line
            ),
            mk AS (
              SELECT nz.doc_id, nz.line_idx, nz.line,
                (b.nd >= 2) AS boiler
              FROM nz JOIN bl b ON nz.line = b.line
            ),
            agg AS (
              SELECT doc_id, count(*)::BIGINT AS n_lines,
                sum(CASE WHEN boiler THEN 1 ELSE 0 END)::BIGINT AS n_boiler,
                coalesce(string_agg(CASE WHEN NOT boiler THEN line END,
                  chr(10) ORDER BY line_idx), '') AS text_clean
              FROM mk GROUP BY doc_id
            )
            SELECT d.doc_id, coalesce(a.n_lines, 0)::BIGINT AS n_lines,
              coalesce(a.n_boiler, 0)::BIGINT AS n_boiler,
              coalesce(a.text_clean, '') AS text_clean
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        "docs_incremental_dedup": """
            WITH oldh AS (
              SELECT DISTINCT md5(text) AS h FROM documents
              WHERE CAST(substr(source, 4) AS BIGINT) % 2 = 0
            ),
            newd AS (
              SELECT doc_id, source, md5(text) AS h FROM documents
              WHERE CAST(substr(source, 4) AS BIGINT) % 2 = 1
            )
            SELECT doc_id, source FROM newd n
            WHERE NOT EXISTS (SELECT 1 FROM oldh o WHERE o.h = n.h)
        """,
        "docs_incremental_near_dedup": polyhash.sql_snapshot_near_anti(
            "documents"
        ),
        "docs_line_dedup_apply": """
            WITH ls AS (
              SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents
            ),
            l0 AS (
              SELECT doc_id, unnest(list_transform(range(len(ls)),
                k -> struct_pack(li := k, raw := ls[(k+1)::BIGINT]))) AS s
              FROM ls
            ),
            fl AS (
              SELECT doc_id, s.li AS line_idx,
                trim(s.raw, ' ' || chr(9) || chr(13)) AS line
              FROM l0
            ),
            nz AS (SELECT * FROM fl WHERE line <> ''),
            rn AS (
              SELECT *, row_number() OVER (PARTITION BY line
                ORDER BY doc_id, line_idx) AS rn FROM nz
            ),
            agg AS (
              SELECT doc_id, count(*)::BIGINT AS n_lines,
                sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
                coalesce(string_agg(CASE WHEN rn = 1 THEN line END, chr(10)
                  ORDER BY line_idx), '') AS text_dedup
              FROM rn GROUP BY doc_id
            )
            SELECT d.doc_id, coalesce(a.n_lines, 0)::BIGINT AS n_lines,
              coalesce(a.n_kept, 0)::BIGINT AS n_kept,
              coalesce(a.text_dedup, '') AS text_dedup
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        "docs_paragraph_dedup": """
            WITH ps AS (
              SELECT doc_id, string_split(text, chr(10) || chr(10)) AS ps
              FROM documents
            ),
            p0 AS (
              SELECT doc_id, unnest(list_transform(range(len(ps)),
                k -> struct_pack(pi := k, raw := ps[(k+1)::BIGINT]))) AS s
              FROM ps
            ),
            fl AS (
              SELECT doc_id, s.pi AS para_idx,
                trim(s.raw, ' ' || chr(9) || chr(13) || chr(10)) AS para
              FROM p0
            ),
            nz AS (SELECT * FROM fl WHERE para <> ''),
            rn AS (
              SELECT *, row_number() OVER (PARTITION BY para
                ORDER BY doc_id, para_idx) AS rn FROM nz
            ),
            agg AS (
              SELECT doc_id, count(*)::BIGINT AS n_paras,
                sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
                coalesce(string_agg(CASE WHEN rn = 1 THEN para END,
                  chr(10) || chr(10) ORDER BY para_idx), '') AS text_dedup
              FROM rn GROUP BY doc_id
            )
            SELECT d.doc_id, coalesce(a.n_paras, 0)::BIGINT AS n_paras,
              coalesce(a.n_kept, 0)::BIGINT AS n_kept,
              coalesce(a.text_dedup, '') AS text_dedup
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        "docs_bigram_lm_score": (
            "WITH d AS (SELECT doc_id, list_transform("
            "list_filter(string_split_regex(text, '[ \\t\\n\\x0b\\x0c\\r]+'), "
            "w -> w != ''), w -> lower(w)) AS ws FROM documents), "
            "bg AS (SELECT doc_id, unnest(list_zip(ws[1:len(ws)-1], "
            "ws[2:len(ws)])) AS pr FROM d WHERE len(ws) >= 2), "
            "fl AS (SELECT doc_id, pr[1] AS x, pr[2] AS y FROM bg), "
            "pc AS (SELECT x, y, count(*)::HUGEINT AS n_xy FROM fl "
            "GROUP BY x, y), "
            "uc AS (SELECT term, count(*)::HUGEINT AS n_x FROM ("
            "SELECT unnest(ws) AS term FROM d) GROUP BY term), "
            "sc AS (SELECT fl.doc_id, count(*)::BIGINT AS n_pairs, "
            "sum((pc.n_xy * 1000000) // uc.n_x)::HUGEINT AS s "
            "FROM fl JOIN pc USING (x, y) JOIN uc ON fl.x = uc.term "
            "GROUP BY fl.doc_id) "
            "SELECT d2.doc_id, coalesce(sc.n_pairs, 0)::BIGINT AS n_pairs, "
            "coalesce(sc.s // sc.n_pairs, 0)::BIGINT AS lm_ppm "
            "FROM documents d2 LEFT JOIN sc USING (doc_id)"
        ),
        "docs_url_dedup": (
            "WITH "
            + _urls.sql_url_norm_ctes("documents")
            + " SELECT doc_id, url_norm, "
            "(doc_id = min(doc_id) OVER (PARTITION BY url_norm)) AS keep "
            "FROM normed"
        ),
        "docs_url_filter": _urls.sql_url_filter("documents"),
        "docs_domain_cap": (
            "WITH "
            + _urls.sql_url_norm_ctes("documents")
            + ", dom AS (SELECT doc_id, "
            "coalesce(regexp_extract(url_norm, '://([^/]*)', 1), '') "
            "AS domain FROM normed) "
            "SELECT domain, doc_id, rn FROM ("
            "SELECT domain, doc_id, row_number() OVER (PARTITION BY domain "
            "ORDER BY (" + polyhash.sql_fingerprint("doc_id::VARCHAR") + "), "
            "doc_id)::BIGINT AS rn FROM dom) WHERE rn <= 25"
        ),
        "docs_train_split": (
            "SELECT doc_id, g AS gate, CASE WHEN g < 10000 THEN 'test' "
            "WHEN g < 60000 THEN 'valid' ELSE 'train' END AS split FROM ("
            "SELECT doc_id, (" + polyhash.sql_gate_ppm("doc_id::VARCHAR")
            + ")::BIGINT AS g FROM documents)"
        ),
        "docs_domain_stats": (
            "WITH "
            + _urls.sql_url_norm_ctes("documents")
            + " SELECT regexp_extract(url_norm, '://([^/]*)', 1) AS domain, "
            "count(*)::BIGINT AS n_docs, "
            "count(DISTINCT url_norm)::BIGINT AS n_unique_urls, "
            "((count(*) - count(DISTINCT url_norm)) * 10000) // count(*) "
            "AS dup_rate_e4 "
            "FROM normed GROUP BY 1"
        ),
        "docs_lang_source_rollup": (
            "SELECT coalesce(lang, '<all>') AS lang, "
            "coalesce(source, '<all>') AS source, "
            "count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS sum_chars "
            "FROM documents "
            "GROUP BY GROUPING SETS ((lang, source), (lang), ())"
        ),
        "docs_lang_stats": (
            "SELECT lang, count(*)::BIGINT AS n_docs, "
            "((sum(n_chars) * 100) // count(*))::BIGINT AS avg_chars_e2 "
            "FROM documents GROUP BY lang"
        ),
        "docs_word_stats": (
            "SELECT doc_id, len(str_split(text, ' '))::BIGINT AS n_words, "
            "len(list_distinct(list_transform(str_split(text, ' '), x -> lower(x))))::BIGINT AS n_distinct_words, "
            "((list_sum(list_transform(str_split(text, ' '), x -> len(x))) * 10000) // len(str_split(text, ' ')))::BIGINT AS mean_word_len_e4 "
            "FROM documents"
        ),
        "docs_repetition_stats": polyhash.sql_repetition_stats("documents"),
        "docs_quality_filter": _heur.sql_quality_filter("documents"),
        "corpus_report": (
            "WITH qf AS (" + _heur.sql_quality_filter("documents") + "), "
            "t AS (SELECT count(*)::BIGINT AS n_docs, "
            "count(DISTINCT lang)::BIGINT AS n_langs, "
            "sum(len(str_split(text, ' ')))::BIGINT AS total_tokens, "
            "count(DISTINCT md5(text))::BIGINT AS n_distinct FROM documents), "
            "k AS (SELECT sum(keep)::BIGINT AS n_kept FROM qf) "
            "SELECT n_docs, n_langs, total_tokens, "
            "((n_kept * 10000) // n_docs)::BIGINT AS keep_rate_e4, "
            "(((n_docs - n_distinct) * 1000000) // n_docs)::BIGINT AS dup_rate_ppm "
            "FROM t, k"
        ),
        "docs_source_quality": (
            "WITH qf AS (" + _heur.sql_quality_filter("documents") + ") "
            "SELECT d.source, count(*)::BIGINT AS n_docs, "
            "sum(qf.keep)::BIGINT AS n_kept, "
            "((sum(qf.keep) * 10000) // count(*))::BIGINT AS keep_rate_e4, "
            "((sum(d.n_chars) * 100) // count(*))::BIGINT AS avg_chars_e2 "
            "FROM documents d JOIN qf USING (doc_id) GROUP BY d.source"
        ),
        "docs_lm_buckets": (
            "WITH d AS (SELECT doc_id, list_filter(string_split_regex(text, "
            "'[ \\t\\n\\x0b\\x0c\\r]+'), w -> w != '') AS ws FROM documents), "
            "tok AS (SELECT doc_id, unnest(list_transform(ws, w -> lower(w))) AS term FROM d), "
            "tc AS (SELECT term, count(*)::HUGEINT AS c FROM tok GROUP BY term), "
            "tot AS (SELECT sum(c)::HUGEINT AS t FROM tc), "
            "fs AS (SELECT doc_id, sum(c)::HUGEINT AS freqsum, count(*)::HUGEINT AS nw "
            "FROM tok JOIN tc USING (term) GROUP BY doc_id), "
            "sc AS (SELECT d.doc_id, coalesce("
            "(fs.freqsum * 1000000) // (fs.nw * (SELECT t FROM tot)), 0)::BIGINT AS score_ppm "
            "FROM d LEFT JOIN fs USING (doc_id)), "
            "th AS (SELECT quantile_disc(score_ppm, 0.3333333333333333) AS t1, "
            "quantile_disc(score_ppm, 0.6666666666666666) AS t2 FROM sc) "
            "SELECT doc_id, score_ppm, CASE WHEN score_ppm >= t2 THEN 'head' "
            "WHEN score_ppm >= t1 THEN 'middle' ELSE 'tail' END AS lm_bucket "
            "FROM sc, th"
        ),
        "docs_tfidf_terms": (
            "WITH d AS (SELECT doc_id, list_filter(string_split_regex(text, "
            "'[ \\t\\n\\x0b\\x0c\\r]+'), w -> w != '') AS ws FROM documents), "
            "tok AS (SELECT doc_id, unnest(list_transform(ws, w -> lower(w))) AS term FROM d), "
            "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term), "
            "df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY term), "
            "sc AS (SELECT tf.doc_id, tf.term, (tf.tf * 1000000) // df.df AS score "
            "FROM tf JOIN df USING (term)), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id "
            "ORDER BY score DESC, term ASC) AS rnk FROM sc) "
            "SELECT doc_id, rnk::BIGINT AS rank, term, score::BIGINT AS score "
            "FROM r WHERE rnk <= 3"
        ),
        "docs_scrub": (
            "WITH aug AS (SELECT doc_id, text || CASE WHEN doc_id % 7 = 0 "
            "THEN ' contact user' || doc_id || '@example.com or 192.168.0.' "
            "|| (doc_id % 256) || ' now' ELSE '' END AS t FROM documents) "
            "SELECT doc_id, "
            "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
            "regexp_replace(regexp_replace(t, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
            "'\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g'), "
            "'(?:\\(\\d{3}\\)\\s?|\\b\\d{3}[-.\\s])\\d{3}[-.\\s]\\d{4}\\b', '<PHONE>', 'g'), "
            "'\\b(?:\\d[ -]?){12,15}\\d\\b', '<CC>', 'g'), "
            "'\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'), "
            "'(?i)\\b(badword1|badword2|slurword|vileword)\\b', '<TOX>', 'g') "
            "AS scrubbed, "
            "(CASE WHEN doc_id % 7 = 0 THEN 2 ELSE 0 END)::BIGINT AS pii_count "
            "FROM aug"
        ),
        "docs_c4_clean": _heur.sql_c4_clean(
            "documents",
            text_expr=(
                "text || CASE doc_id % 4 "
                "WHEN 0 THEN chr(10) || 'One good sentence right here "
                "today. Another good sentence follows it closely. A third "
                "sentence ends this paragraph.' "
                "WHEN 1 THEN chr(10) || 'Too short line.' "
                "WHEN 2 THEN chr(10) || 'Please enable javascript to view "
                "the full content here.' ELSE '' END "
                "|| CASE WHEN doc_id % 11 = 0 THEN chr(10) || "
                "'curly brace line {' ELSE '' END "
                "|| CASE WHEN doc_id % 13 = 0 THEN chr(10) || "
                "'some lorem ipsum filler text' ELSE '' END"
            ),
        ),
        "docs_normalize_text": (
            "SELECT doc_id, "
            "trim(regexp_replace(lower(text), '[ \\t\\n\\x0b\\x0c\\r]+', ' ', 'g')) "
            "AS text_norm, "
            "length(trim(regexp_replace(lower(text), "
            "'[ \\t\\n\\x0b\\x0c\\r]+', ' ', 'g')))::BIGINT AS n_chars_norm "
            "FROM documents"
        ),
        "docs_length_filter": (
            "SELECT doc_id, lang, n_chars FROM documents "
            "WHERE n_chars BETWEEN 150 AND 350"
        ),
        "events_type_agg": (
            "SELECT event_type, count(*)::BIGINT AS n_events, "
            "round(sum(value), 2) AS total_value "
            "FROM events GROUP BY event_type"
        ),
        "events_hourly": (
            "SELECT date_trunc('hour', ts) AS hour, count(*)::BIGINT AS n_events, "
            "round(sum(value), 2) AS total_value "
            "FROM events GROUP BY date_trunc('hour', ts)"
        ),
        "events_user_sessions": (
            "WITH x AS ("
            "  SELECT user_id, CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL "
            "    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE "
            "  THEN 1 ELSE 0 END AS s FROM events) "
            "SELECT user_id, sum(s)::BIGINT AS n_sessions FROM x GROUP BY user_id"
        ),
        "events_rolling_count": (
            "SELECT event_id, count(*) OVER (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 15 MINUTE PRECEDING AND CURRENT ROW)::BIGINT "
            "AS n_15min FROM events"
        ),
        "events_late_arrivals": (
            "WITH w AS ("
            "  SELECT event_id, user_id, ts,"
            "    max(ts) OVER (PARTITION BY user_id ORDER BY ("
            + polyhash.sql_fingerprint("event_id::VARCHAR")
            + ") % 999983, event_id"
            "      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm"
            "  FROM events) "
            "SELECT event_id, user_id, "
            "greatest(coalesce(date_diff('microsecond', ts, wm), 0), 0)::BIGINT"
            " AS behind_us, "
            "greatest(coalesce(date_diff('microsecond', ts, wm), 0), 0)"
            " > 600000000 AS late "
            "FROM w"
        ),
        "events_asof_join": (
            "SELECT p.event_id, v.ts AS view_ts, "
            "date_diff('microsecond', v.ts, p.ts)::BIGINT AS gap_us "
            "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
            "ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v "
            "ON p.user_id = v.user_id AND p.ts >= v.ts"
        ),
        "orders_rank_in_customer": (
            "SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM ("
            "SELECT o_custkey, o_orderkey, o_totalprice, "
            "row_number() OVER (PARTITION BY o_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey ASC)::BIGINT AS rnk "
            "FROM orders) WHERE rnk <= 3"
        ),
        "events_type_dow_pivot": (
            "SELECT event_type, "
            + ", ".join(
                f"count(*) FILTER (WHERE isodow(ts) - 1 = {d})::BIGINT AS dow_{d}"
                for d in range(7)
            )
            + " FROM events GROUP BY event_type"
        ),
        "q4_order_priority": (
            "SELECT o_orderpriority, count(*)::BIGINT AS order_count "
            "FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' "
            "AND o_orderdate < TIMESTAMP '1997-04-01' "
            "AND EXISTS (SELECT 1 FROM lineitem "
            "WHERE l_orderkey = o_orderkey "
            "AND l_shipdate > o_orderdate + INTERVAL 30 DAY) "
            "GROUP BY o_orderpriority"
        ),
        "q18_large_orders": (
            "SELECT o_custkey, c_name, o_orderkey, o_totalprice, sum_qty "
            "FROM orders JOIN customer ON o_custkey = c_custkey JOIN ("
            "SELECT l_orderkey, sum(l_quantity::BIGINT)::BIGINT AS sum_qty "
            "FROM lineitem GROUP BY l_orderkey) s ON o_orderkey = s.l_orderkey "
            "WHERE sum_qty >= 250"
        ),
        "q15_top_supplier": (
            "WITH r AS (SELECT l_suppkey, "
            "sum(round(l_extendedprice * 100)::BIGINT * "
            "(100 - round(l_discount * 100)::BIGINT))::BIGINT AS total_rev_e4 "
            "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) "
            "SELECT s_suppkey, s_name, total_rev_e4 "
            "FROM supplier JOIN r ON s_suppkey = l_suppkey "
            "WHERE total_rev_e4 = (SELECT max(total_rev_e4) FROM r)"
        ),
        "q10_returned_revenue": (
            "SELECT c_custkey, c_name, n_name, revenue_e4 FROM ("
            "SELECT o_custkey, "
            "sum(round(l_extendedprice * 100)::BIGINT * "
            "(100 - round(l_discount * 100)::BIGINT))::BIGINT AS revenue_e4 "
            "FROM orders JOIN lineitem ON l_orderkey = o_orderkey "
            "WHERE l_returnflag = 'R' "
            "AND o_orderdate >= TIMESTAMP '1996-10-01' "
            "AND o_orderdate < TIMESTAMP '1997-01-01' "
            "GROUP BY o_custkey "
            "ORDER BY revenue_e4 DESC, o_custkey ASC LIMIT 20) t "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey"
        ),
        "q17_small_qty_revenue": (
            "WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#4'), "
            "a AS (SELECT l_partkey, sum(l_quantity::BIGINT)::BIGINT AS s, "
            "count(*)::BIGINT AS n FROM lineitem "
            "JOIN bp ON l_partkey = p_partkey GROUP BY l_partkey) "
            "SELECT count(*)::BIGINT AS n_items, "
            "coalesce(sum(round(l_extendedprice * 100)::BIGINT), 0)::BIGINT "
            "AS revenue_e2 FROM lineitem JOIN a ON lineitem.l_partkey = a.l_partkey "
            "WHERE 5 * l_quantity::BIGINT * a.n < a.s"
        ),
        "q22_idle_rich_customers": (
            "WITH t AS (SELECT sum(round(c_acctbal * 100)::BIGINT)::BIGINT AS s, "
            "count(*)::BIGINT AS n FROM customer WHERE c_acctbal > 0) "
            "SELECT n_name, count(*)::BIGINT AS n_custs, "
            "sum(round(c_acctbal * 100)::BIGINT)::BIGINT AS total_acctbal_e2 "
            "FROM customer CROSS JOIN t "
            "JOIN nation ON c_nationkey = n_nationkey "
            "WHERE c_acctbal > 0 AND round(c_acctbal * 100)::BIGINT * t.n > t.s "
            "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
            "AND o_orderpriority = '1-URGENT') "
            "GROUP BY n_name"
        ),
        "docs_pii_stats": (
            "WITH aug AS (SELECT doc_id, source, text "
            "|| CASE WHEN doc_id % 7 = 0 THEN ' contact user' || doc_id "
            "|| '@example.com or 192.168.0.' || (doc_id % 256) || ' now' "
            "ELSE '' END "
            "|| CASE WHEN doc_id % 11 = 0 THEN ' call 555-123-4567 soon' "
            "ELSE '' END "
            "|| CASE WHEN doc_id % 13 = 0 THEN ' ssn 123-45-6789 ok' "
            "ELSE '' END "
            "|| CASE WHEN doc_id % 17 = 0 THEN "
            "' card 4111 1111 1111 1111 end' ELSE '' END "
            "|| CASE WHEN doc_id % 19 = 0 THEN "
            "' plainly badword1 indeed' ELSE '' END AS t FROM documents), "
            "c AS (SELECT source, "
            "len(regexp_extract_all(t, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT AS e, "
            "len(regexp_extract_all(t, "
            "'\\b\\d{3}-\\d{2}-\\d{4}\\b'))::BIGINT AS s, "
            "len(regexp_extract_all(t, "
            "'(?:\\(\\d{3}\\)\\s?|\\b\\d{3}[-.\\s])\\d{3}[-.\\s]\\d{4}\\b'"
            "))::BIGINT AS p, "
            "len(regexp_extract_all(t, "
            "'\\b(?:\\d[ -]?){12,15}\\d\\b'))::BIGINT AS cc, "
            "len(regexp_extract_all(t, "
            "'\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b'))::BIGINT AS ip, "
            "len(regexp_extract_all(t, "
            "'(?i)\\b(badword1|badword2|slurword|vileword)\\b'))::BIGINT AS tox "
            "FROM aug) "
            "SELECT source, count(*)::BIGINT AS n_docs, "
            "sum(CASE WHEN e + s + p + cc + ip > 0 THEN 1 ELSE 0 END)::BIGINT "
            "AS docs_with_pii, sum(e)::BIGINT AS n_email, "
            "sum(s)::BIGINT AS n_ssn, sum(p)::BIGINT AS n_phone, "
            "sum(cc)::BIGINT AS n_cc, sum(ip)::BIGINT AS n_ip, "
            "sum(tox)::BIGINT AS n_tox "
            "FROM c GROUP BY source ORDER BY source"
        ),
        "docs_fertility_by_lang": (
            "WITH c AS (SELECT lang, "
            "len(str_split(text, ' '))::BIGINT AS w, "
            "len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_ ' "
            "|| chr(9) || chr(10) || chr(13) || ']'))::BIGINT AS st, "
            "length(text)::BIGINT AS ch FROM documents) "
            "SELECT lang, count(*)::BIGINT AS n_docs, "
            "sum(w)::BIGINT AS n_words, sum(st)::BIGINT AS n_subtokens, "
            "sum(ch)::BIGINT AS n_chars, "
            "(sum(st)::BIGINT * 1000000 // sum(w)::BIGINT)::BIGINT "
            "AS fertility_ppm, "
            "(CASE WHEN sum(st) = 0 THEN 0 ELSE "
            "sum(ch)::BIGINT * 1000000 // sum(st)::BIGINT END)::BIGINT "
            "AS chars_per_subtoken_ppm "
            "FROM c GROUP BY lang ORDER BY lang"
        ),
        "docs_dedup_keep_best": (
            "WITH cl AS (" + polyhash.sql_minhash_clusters("documents") + "), "
            "w AS (SELECT doc_id, len(str_split(text, ' '))::BIGINT "
            "AS n_words FROM documents), "
            "r AS (SELECT cl.doc_id, row_number() OVER ("
            "PARTITION BY cl.cluster_id "
            "ORDER BY w.n_words DESC, cl.doc_id ASC) AS rk "
            "FROM cl JOIN w USING (doc_id)) "
            "SELECT d.doc_id, d.lang, d.n_chars FROM documents d "
            "LEFT JOIN r ON d.doc_id = r.doc_id "
            "WHERE r.doc_id IS NULL OR r.rk = 1"
        ),
        "q2_min_cost_supplier": (
            "WITH esupp AS (SELECT s_suppkey, s_name, "
            "round(s_acctbal * 100)::BIGINT AS s_acctbal_e2, n_name "
            "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'), "
            "fp AS (SELECT p_partkey, p_name FROM part "
            "WHERE p_size = 15 AND p_name LIKE '%bolt'), "
            "cost AS (SELECT l_partkey, l_suppkey, "
            "min(round(l_extendedprice * 100)::BIGINT)::BIGINT AS cost_e2 "
            "FROM lineitem JOIN esupp ON l_suppkey = s_suppkey "
            "JOIN fp ON l_partkey = p_partkey GROUP BY 1, 2) "
            "SELECT s_acctbal_e2, s_name, n_name, "
            "l_partkey::BIGINT AS p_partkey, p_name, cost_e2 "
            "FROM cost JOIN esupp ON l_suppkey = s_suppkey "
            "JOIN fp ON l_partkey = p_partkey "
            "WHERE cost_e2 = (SELECT min(cost_e2) FROM cost c2 "
            "WHERE c2.l_partkey = cost.l_partkey) "
            "ORDER BY s_acctbal_e2 DESC, n_name ASC, s_name ASC, p_partkey ASC "
            "LIMIT 100"
        ),
        "q9_product_type_profit": (
            "WITH fp AS (SELECT p_partkey, "
            "round(p_retailprice * 100)::BIGINT AS retail_e2 "
            "FROM part WHERE p_name LIKE 'red %'), "
            "l AS (SELECT l_orderkey, n_name AS nation, "
            "(round(l_extendedprice * 100)::BIGINT "
            "* (100 - round(l_discount * 100)::BIGINT) "
            "- retail_e2 * 100 * l_quantity::BIGINT) AS amount_e4 "
            "FROM lineitem JOIN fp ON l_partkey = p_partkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey) "
            "SELECT nation, year(o_orderdate)::BIGINT AS o_year, "
            "sum(amount_e4)::BIGINT AS profit_e4 "
            "FROM l JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY 1, 2 ORDER BY nation ASC, o_year DESC"
        ),
        "q11_important_parts": (
            "WITH asupp AS (SELECT s_suppkey FROM supplier "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'), "
            "v AS (SELECT l_partkey, "
            "sum(round(l_extendedprice * 100)::BIGINT "
            "* (100 - round(l_discount * 100)::BIGINT))::BIGINT AS value_e4 "
            "FROM lineitem JOIN asupp ON l_suppkey = s_suppkey GROUP BY 1) "
            "SELECT l_partkey::BIGINT AS l_partkey, value_e4 FROM v "
            "WHERE value_e4 * 1000 > (SELECT sum(value_e4) FROM v) "
            "ORDER BY value_e4 DESC, l_partkey ASC"
        ),
        "q16_part_supplier_counts": (
            "WITH fp AS (SELECT p_partkey, p_brand, p_type, p_size FROM part "
            "WHERE p_brand <> 'Brand#1' AND p_type <> 'ECONOMY' "
            "AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)), "
            "pairs AS (SELECT DISTINCT p_brand, p_type, p_size, l_suppkey "
            "FROM lineitem JOIN fp ON l_partkey = p_partkey "
            "WHERE l_suppkey NOT IN "
            "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)) "
            "SELECT p_brand, p_type, p_size::BIGINT AS p_size, "
            "count(*)::BIGINT AS supplier_cnt FROM pairs GROUP BY 1, 2, 3 "
            "ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC"
        ),
        "q20_heavy_shippers": (
            "WITH fp AS (SELECT p_partkey FROM part "
            "WHERE p_name LIKE 'small %'), "
            "agg AS (SELECT l_suppkey, l_partkey, "
            "sum(l_quantity::BIGINT)::BIGINT AS qty_all, "
            "sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01' "
            "AND l_shipdate < TIMESTAMP '1998-01-01' "
            "THEN l_quantity::BIGINT ELSE 0 END)::BIGINT AS qty_yr "
            "FROM lineitem JOIN fp ON l_partkey = p_partkey GROUP BY 1, 2), "
            "ok AS (SELECT DISTINCT l_suppkey FROM agg "
            "WHERE 2 * qty_yr > qty_all) "
            "SELECT s_name, round(s_acctbal * 100)::BIGINT AS s_acctbal_e2 "
            "FROM supplier JOIN ok ON s_suppkey = l_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'AMERICA' ORDER BY s_name ASC"
        ),
        "q14_promo_revenue": (
            "WITH l AS (SELECT l_partkey, round(l_extendedprice * 100)::BIGINT * "
            "(100 - round(l_discount * 100)::BIGINT) AS rev FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1997-06-01' "
            "AND l_shipdate < TIMESTAMP '1997-07-01') "
            "SELECT sum(CASE WHEN p_type = 'ECONOMY' THEN rev ELSE 0 END)::BIGINT "
            "AS promo_revenue_e4, sum(rev)::BIGINT AS total_revenue_e4, "
            "((sum(CASE WHEN p_type = 'ECONOMY' THEN rev ELSE 0 END)::HUGEINT "
            "* 1000000) // sum(rev)::HUGEINT)::BIGINT AS promo_share_ppm "
            "FROM l JOIN part ON l_partkey = p_partkey"
        ),
        "events_type_transitions": (
            "WITH x AS (SELECT user_id, event_type, "
            "lag(event_type) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS prev_type FROM events) "
            "SELECT prev_type, event_type AS next_type, count(*)::BIGINT AS n "
            "FROM x WHERE prev_type IS NOT NULL "
            "GROUP BY prev_type, next_type"
        ),
        "events_daily_active_users": (
            "WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id "
            "FROM events), "
            "days AS (SELECT DISTINCT day FROM du) "
            "SELECT d.day, "
            "(SELECT count(*) FROM du WHERE du.day = d.day)::BIGINT AS dau, "
            "(SELECT count(DISTINCT user_id) FROM du "
            "WHERE du.day BETWEEN d.day - INTERVAL 6 DAY AND d.day)::BIGINT "
            "AS dau_7d FROM days d"
        ),
        "events_funnel": (
            "WITH v AS (SELECT user_id, min(ts) AS t FROM events "
            "WHERE event_type = 'view' GROUP BY user_id), "
            "c AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            "JOIN v ON e.user_id = v.user_id AND e.ts > v.t "
            "WHERE e.event_type = 'click' GROUP BY e.user_id), "
            "p AS (SELECT DISTINCT e.user_id FROM events e "
            "JOIN c ON e.user_id = c.user_id AND e.ts > c.t "
            "WHERE e.event_type = 'purchase') "
            "SELECT 'view' AS stage, (SELECT count(*) FROM v)::BIGINT AS n_users "
            "UNION ALL SELECT 'view>click', (SELECT count(*) FROM c)::BIGINT "
            "UNION ALL SELECT 'view>click>purchase', "
            "(SELECT count(*) FROM p)::BIGINT"
        ),
        "orders_retention_cohort": (
            "WITH f AS (SELECT o_custkey, min(year(o_orderdate))::BIGINT "
            "AS cohort_year FROM orders GROUP BY o_custkey), "
            "d AS (SELECT DISTINCT o.o_custkey, f.cohort_year, "
            "year(o.o_orderdate)::BIGINT AS order_year "
            "FROM orders o JOIN f ON o.o_custkey = f.o_custkey) "
            "SELECT cohort_year, order_year, count(*)::BIGINT AS n_customers "
            "FROM d GROUP BY cohort_year, order_year"
        ),
        "events_distinct_users_by_type": (
            "SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users "
            "FROM events GROUP BY event_type"
        ),
        "q13_customer_distribution": (
            "SELECT n_orders, count(*)::BIGINT AS n_customers FROM ("
            "SELECT c.c_custkey, count(o.o_custkey)::BIGINT AS n_orders "
            "FROM customer c LEFT JOIN (SELECT o_custkey FROM orders "
            "WHERE o_orderpriority <> '1-URGENT') o "
            "ON c.c_custkey = o.o_custkey GROUP BY c.c_custkey) "
            "GROUP BY n_orders"
        ),
        "events_purchase_view_window": (
            "SELECT p.event_id, (SELECT count(*) FROM events v "
            "WHERE v.event_type = 'view' AND v.user_id = p.user_id "
            "AND v.ts >= p.ts - INTERVAL 60 MINUTE AND v.ts < p.ts)::BIGINT "
            "AS n_views_1h FROM events p WHERE p.event_type = 'purchase'"
        ),
        "order_totals_join": (
            "SELECT o.o_orderkey, o.o_custkey, s.sum_qty FROM orders o JOIN ("
            "SELECT l_orderkey, sum(l_quantity::BIGINT)::BIGINT AS sum_qty "
            "FROM lineitem GROUP BY l_orderkey) s ON o.o_orderkey = s.l_orderkey "
            "WHERE s.sum_qty >= 100"
        ),
        "events_distinct_types": "SELECT DISTINCT event_type FROM events",
        "events_top_users": (
            "SELECT user_id, round(sum(value), 2) AS total_value "
            "FROM events GROUP BY user_id "
            "ORDER BY sum(value) DESC, user_id LIMIT 10"
        ),
        "q6_forecast_revenue": (
            "SELECT coalesce(sum(round(l_extendedprice * 100)::BIGINT * "
            "round(l_discount * 100)::BIGINT), 0)::BIGINT AS revenue_e4, "
            "count(*)::BIGINT AS n_items FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
            "AND l_shipdate < TIMESTAMP '1998-01-01' "
            "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
        ),
        "orders_monthly_growth": (
            "WITH m AS (SELECT date_trunc('month', o_orderdate) AS month, "
            "count(*)::BIGINT AS n_orders, "
            "sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS total_e2 "
            "FROM orders GROUP BY 1) "
            "SELECT month, n_orders, total_e2, "
            "coalesce(((total_e2 - lag(total_e2) OVER (ORDER BY month)) "
            "* 10000) // lag(total_e2) OVER (ORDER BY month), 0)::BIGINT "
            "AS growth_bp FROM m"
        ),
        "events_top_sessions": (
            "WITH x AS (SELECT user_id, ts, CASE WHEN "
            "lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL OR "
            "ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) "
            "> INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS s FROM events), "
            "y AS (SELECT user_id, ts, sum(s) OVER (PARTITION BY user_id "
            "ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM x), "
            "g AS (SELECT user_id, min(ts) AS session_start, "
            "date_diff('microsecond', min(ts), max(ts))::BIGINT AS duration_us, "
            "count(*)::BIGINT AS n_events FROM y GROUP BY user_id, sid) "
            "SELECT user_id, session_start, duration_us, n_events FROM g "
            "ORDER BY duration_us DESC, user_id ASC, session_start ASC LIMIT 10"
        ),
        "q12_priority_class": (
            "SELECT l_returnflag, "
            "sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
            "THEN 1 ELSE 0 END)::BIGINT AS high_line_count, "
            "sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
            "THEN 1 ELSE 0 END)::BIGINT AS low_line_count "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY l_returnflag ORDER BY l_returnflag"
        ),
        "q19_disjunctive_revenue": (
            "SELECT sum(round(l_extendedprice * 100)::BIGINT * "
            "(100 - round(l_discount * 100)::BIGINT))::BIGINT AS revenue_e4, "
            "count(*)::BIGINT AS n_lines "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 "
            "AND l_quantity BETWEEN 1 AND 15) "
            "OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 25 "
            "AND l_quantity BETWEEN 10 AND 30) "
            "OR (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 40 "
            "AND l_quantity BETWEEN 20 AND 50)"
        ),
        "q21_sole_failing_supplier": (
            "WITH o AS (SELECT l_orderkey, "
            "count(DISTINCT l_suppkey) AS n_supp, "
            "count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) "
            "AS n_rsupp FROM lineitem GROUP BY l_orderkey), "
            "w AS (SELECT DISTINCT l.l_orderkey, l.l_suppkey FROM lineitem l "
            "JOIN o USING (l_orderkey) "
            "WHERE l.l_returnflag = 'R' AND o.n_supp >= 2 AND o.n_rsupp = 1) "
            "SELECT s_suppkey, s_name, count(*)::BIGINT AS numwait "
            "FROM w JOIN supplier ON l_suppkey = s_suppkey "
            "GROUP BY s_suppkey, s_name "
            "ORDER BY numwait DESC, s_suppkey ASC LIMIT 20"
        ),
        "q1_pricing": (
            "SELECT l_returnflag, l_linestatus, "
            "round(sum(l_quantity), 2) AS sum_qty, "
            "round(sum(l_extendedprice), 2) AS sum_base_price, "
            "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
            "count(*)::BIGINT AS count_order "
            "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
            "GROUP BY l_returnflag, l_linestatus"
        ),
        "q3_shipping_priority": (
            "SELECT o_orderkey, "
            "sum(round(l_extendedprice * 100)::BIGINT * "
            "(100 - round(l_discount * 100)::BIGINT))::BIGINT AS revenue_e4, "
            "o_orderdate, o_orderpriority "
            "FROM customer JOIN orders ON c_custkey = o_custkey "
            "JOIN lineitem ON l_orderkey = o_orderkey "
            "WHERE c_mktsegment = 'BUILDING' "
            "AND o_orderdate < TIMESTAMP '1997-03-15' "
            "AND l_shipdate > TIMESTAMP '1997-03-15' "
            "GROUP BY o_orderkey, o_orderdate, o_orderpriority "
            "ORDER BY revenue_e4 DESC, o_orderdate ASC, o_orderkey ASC LIMIT 10"
        ),
        "q5_region_volume": (
            "SELECT n_name, "
            "sum(round(l_extendedprice * 100)::BIGINT * "
            "(100 - round(l_discount * 100)::BIGINT))::BIGINT AS revenue_e4 "
            "FROM customer JOIN orders ON c_custkey = o_custkey "
            "JOIN lineitem ON l_orderkey = o_orderkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE c_nationkey = s_nationkey AND r_name = 'ASIA' "
            "AND o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1997-01-01' "
            "GROUP BY n_name"
        ),
        "q7_volume_shipping": (
            "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
            "year(l_shipdate)::BIGINT AS l_year, "
            "sum(round(l_extendedprice * 100)::BIGINT * "
            "(100 - round(l_discount * 100)::BIGINT))::BIGINT AS revenue_e4 "
            "FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation n1 ON s_nationkey = n1.n_nationkey "
            "JOIN nation n2 ON c_nationkey = n2.n_nationkey "
            "WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') "
            "OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) "
            "AND l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1998-01-01' "
            "GROUP BY supp_nation, cust_nation, l_year "
            "ORDER BY supp_nation, cust_nation, l_year"
        ),
        "q8_market_share": (
            "WITH l AS (SELECT l_orderkey, "
            "round(l_extendedprice * 100)::BIGINT * "
            "(100 - round(l_discount * 100)::BIGINT) AS rev, "
            "(sn.n_name = 'NATION_7') AS is_t "
            "FROM lineitem "
            "JOIN part ON l_partkey = p_partkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation sn ON s_nationkey = sn.n_nationkey "
            "WHERE p_type = 'ECONOMY'), "
            "o AS (SELECT o_orderkey, year(o_orderdate)::BIGINT AS o_year "
            "FROM orders "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'ASIA' "
            "AND o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1998-01-01') "
            "SELECT o_year, sum(rev)::BIGINT AS revenue_e4, "
            "sum(CASE WHEN is_t THEN rev ELSE 0 END)::BIGINT "
            "AS target_revenue_e4, "
            "((sum(CASE WHEN is_t THEN rev ELSE 0 END)::HUGEINT * 1000000) "
            "// sum(rev)::HUGEINT)::BIGINT AS mkt_share_ppm "
            "FROM l JOIN o ON l.l_orderkey = o.o_orderkey "
            "GROUP BY o_year ORDER BY o_year"
        ),
        "segment_order_value": (
            "SELECT c_mktsegment, count(*)::BIGINT AS n_orders, "
            "round(sum(o_totalprice), 2) AS total_value "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_mktsegment"
        ),
        "customers_no_orders": (
            "SELECT c_custkey, c_name FROM customer c "
            "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
            "AND o.o_orderdate < TIMESTAMP '1995-12-01')"
        ),
        "order_line_concat": (
            "SELECT l_orderkey, "
            "string_agg(l_returnflag, '' ORDER BY l_linenumber DESC, l_returnflag) AS flags "
            "FROM lineitem GROUP BY l_orderkey"
        ),
        "lineitem_global_metrics": (
            "SELECT count(*)::BIGINT AS n_rows, "
            "round(sum(l_quantity), 2) AS total_qty, "
            "round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue "
            "FROM lineitem"
        ),
        "embeddings_project": _ann.sql_project("embeddings"),
        "ann_topk": (
            "SELECT e.vec_id FROM embeddings e WHERE e.vec_id != 0 "
            "ORDER BY list_cosine_similarity(e.embedding, "
            "(SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC, e.vec_id "
            "LIMIT 10"
        ),
        "embedding_near_pairs": (
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3"
        ),
        # rows-only, each with a rationale:
        # - docs_langid: trained hashed-ngram softmax model — not SQL-
        #   expressible; behavior asserted on known-language sentences
        #   in tests/test_filters.py (the synthetic documents.lang
        #   column is metadata unrelated to the text, so corpus
        #   agreement is not a meaningful oracle).
        # - ann_topk_lsh / ann_topk_ivf: approximate by design
        #   (hyperplane LSH / inverted lists); recall@10 vs the exact
        #   ann_topk is asserted in tests/test_functions.py.
        # - curate_labels / curate_drop_reasons: full HTML parse +
        #   neural-scorer pipeline — non-SQL; byte-identical text per
        #   url is asserted against the shared-function oracle in
        #   tests/test_curate_pipeline.py.
        # - pages_annotation_offsets: M15 annotation export (HTML parse
        #   + renderer offsets) — non-SQL; semantics pinned in
        #   tests/test_annotation_export.py.
        # - pages_original_html: M16 reconstruction — the pages table is
        #   not a driver-registered oracle view; roundtrip_ok is the
        #   per-row byte-compare proof and the strip chain's DuckDB
        #   twin is pinned value-identical in
        #   tests/test_original_html.py.
        # - curate_task_sweep: A2 full 6-task x 8-threshold grid (ref
        #   inference.py:78-88) — neural node scorer, non-SQL; the
        #   Primary@90 slice is pinned bit-equal to the flagship
        #   predicted set, thresholds nest, and the sweep is
        #   deterministic (tests/test_filters.py).
        # - docs_semantic_dedup: SemDeDup — k-means is an iterative
        #   fixpoint with no SQL oracle; determinism, dup_of validity
        #   and the no-surviving-near-pair invariant are pinned in
        #   tests/test_functions.py.
        # - events_value_quantiles_sketch: mantissa-grid quantile
        #   sketch — approximate by construction (relative error
        #   <= 2^-11); the bound is pinned in tests/test_functions.py
        #   and the query emits value_exact next to value_sketch.
        # - docs_quality_model: fastText-style NB quality classifier
        #   distilled from the heuristic rules — the log-odds weights
        #   depend on corpus-wide counts through float log, so no SQL
        #   twin (the teacher docs_quality_filter is the SQL-anchored
        #   path); determinism across partitionings, signal direction
        #   on planted docs and distillation agreement >= teacher base
        #   rate are pinned in tests/test_functions.py.
        # - docs_bpe_merges / docs_bpe_tokenize: BPE tokenizer training
        #   is an iterative merge fixpoint (and tokenize depends on the
        #   trained table) — no SQL twin; the first merges are pinned
        #   by hand on the classic Sennrich vocab, and determinism /
        #   partitioning-invariance / top_v-invariance / encode
        #   semantics are pinned in tests/test_functions.py.
        # - docs_cms_heavy_hitters: count-min sketch — approximate by
        #   construction (bounded overestimate); the CM bound and the
        #   exact counts are pinned in tests/test_functions.py, and the
        #   query emits n_exact next to n_cms so quality is visible.
    }
