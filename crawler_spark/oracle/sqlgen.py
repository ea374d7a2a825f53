"""DuckDB oracle SQL for every driver-checked query.

Single source of truth for ``__spark_entry__.oracle_sql()``. Each
generator mirrors one Spark plan in ``__spark_entry__.queries()`` and is
derived from the SAME constants (hash spec, thresholds, marker lists,
hyperplanes), so the two sides cannot drift independently.

Portability contract (verified bit-exact in tests/test_entry_parity.py):
- h64: md5-prefix hash — identical in both engines (texthash.sql_h64);
- doubles: every float expression is either a single deterministic
  expression tree (same IEEE ops, same order → bit-equal) or an
  order-insensitive aggregate rounded to ≤4 dp;
- splits: corpus text is single-space-delimited → split/string_split
  agree; n-gram windows use the same (start, width) arithmetic.
"""

from __future__ import annotations

from crawler_spark.functions.texthash import sql_h64, sql_h64_seeded
from crawler_spark.functions.textstats import (
    FINGERPRINT_NGRAM,
    LANG_MARKERS,
    STOPWORDS,
    TOKEN_REGEX,
)
from crawler_spark.operators.similarity import (
    EMBED_DIM,
    NEARDUP_COSINE,
    NUM_PLANES,
    TOPK_K,
    hyperplanes,
)
from crawler_spark.operators.textdedup import (
    JACCARD_THRESHOLD,
    LSH_BANDS,
    LSH_HOT_BUCKET_MAX,
    MINHASH_HASHES,
    NGRAM_N,
    SIMHASH_BITS,
)

# --------------------------------------------------------- text building --


def _occ(word: str, text: str = "text") -> str:
    needle = f" {word} "
    padded = f"(' ' || {text} || ' ')"
    return (
        f"CAST((length({padded}) - length(replace({padded}, '{needle}', '')))"
        f" / {len(needle)} AS BIGINT)"
    )


def _ngrams_cte(n: int, src: str = "documents") -> str:
    """CTEs d(words) + gd(distinct doc_id, ngram) over ``src``."""
    return f"""
d AS (SELECT doc_id, string_split(text, ' ') AS w FROM {src}),
gd AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(w) - {n - 2}),
                               i -> array_to_string(w[i:i+{n - 1}], ' '))) AS ng
  FROM d WHERE len(w) >= {n}
)"""


def _minhash_sig_cte(n: int, k: int, src: str = "documents") -> str:
    mins = ",\n         ".join(
        f"min({sql_h64_seeded('ng', j)}) AS mh{j}" for j in range(k)
    )
    return f"""
WITH {_ngrams_cte(n, src)},
sig AS (SELECT doc_id, {mins} FROM gd GROUP BY doc_id)"""


def _band_selects_union() -> str:
    """The LSH band table as a UNION ALL over ``sig`` — the single
    source of the band-key rule for every oracle that buckets."""
    rows = MINHASH_HASHES // LSH_BANDS
    selects = []
    for b in range(LSH_BANDS):
        concat = " || '_' || ".join(
            f"CAST(mh{b * rows + r} AS VARCHAR)" for r in range(rows)
        )
        selects.append(
            f"SELECT doc_id, {b} AS band_idx, {sql_h64(f'({concat})')} AS band_hash FROM sig"
        )
    return "\nUNION ALL\n".join(selects)


def _pruned_band_ctes() -> str:
    """bt (raw band table) + btk (hot buckets above LSH_HOT_BUCKET_MAX
    dropped) — the twin of operators/textdedup._prune_hot_buckets, so
    the candidate-pair oracles apply the identical fan-out cap."""
    return f"""bt AS ({_band_selects_union()}),
btk AS (
  SELECT bt.* FROM bt
  JOIN (SELECT band_idx, band_hash FROM bt
        GROUP BY band_idx, band_hash
        HAVING count(*) <= {LSH_HOT_BUCKET_MAX}) keep
    USING (band_idx, band_hash)
)"""


def sql_dedup_exact() -> str:
    return """
SELECT min(doc_id) AS doc_id, md5(text) AS content_md5
FROM documents GROUP BY md5(text)"""


def sql_token_stats() -> str:
    return f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS BIGINT) AS n_tokens
FROM documents"""


def sql_quality() -> str:
    stop = " + ".join(_occ(w) for w in STOPWORDS)
    return f"""
WITH f AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         ({stop}) AS n_stop
  FROM documents
), g AS (
  SELECT doc_id, n_chars, n_words, n_stop,
         CAST(floor((n_chars - n_words + 1) * 100 / n_words) AS BIGINT) AS awl_c,
         CAST(floor(n_stop * 1000 / n_words) AS BIGINT) AS stop_pm
  FROM f
), s AS (
  SELECT *, CAST(least(n_words * 4, 400)
                 + least(CAST(floor(n_stop * 2000 / n_words) AS BIGINT), 400)
                 + least(CAST(floor(awl_c / 4) AS BIGINT), 200) AS BIGINT)
              AS quality_score_pm
  FROM g
)
SELECT doc_id, n_words, awl_c, stop_pm, quality_score_pm,
       CASE WHEN quality_score_pm >= 700 THEN 'high'
            WHEN quality_score_pm >= 400 THEN 'medium'
            ELSE 'low' END AS quality_bucket
FROM s"""


def sql_lang_id() -> str:
    langs = sorted(LANG_MARKERS)
    score_exprs = []
    for lang in langs:
        s = " + ".join(_occ(w) for w in LANG_MARKERS[lang])
        score_exprs.append(f"({s}) AS s_{lang}")
    best = f"greatest({', '.join('s_' + lang for lang in langs)})"
    chain = " ".join(f"WHEN s_{lang} = best THEN '{lang}'" for lang in langs)
    return f"""
WITH sc AS (SELECT doc_id, {', '.join(score_exprs)} FROM documents),
b AS (SELECT *, {best} AS best FROM sc)
SELECT doc_id,
       CASE WHEN best = 0 THEN 'und' ELSE (CASE {chain} ELSE 'und' END) END
         AS lang_guess
FROM b"""


def sql_fingerprint() -> str:
    n = FINGERPRINT_NGRAM
    return f"""
WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
SELECT doc_id,
       list_min(list_transform(
         list_transform(range(1, len(w) - {n - 2}),
                        i -> array_to_string(w[i:i+{n - 1}], ' ')),
         ng -> {sql_h64('ng')})) AS fingerprint,
       md5(text) AS content_md5
FROM d WHERE len(w) >= {n}"""


def sql_ngram_jaccard() -> str:
    return f"""
WITH {_ngrams_cte(NGRAM_N)},
sz AS (SELECT doc_id, count(*) AS n_ng FROM gd GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM gd a JOIN gd b ON a.ng = b.ng AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(n_common / (sa.n_ng + sb.n_ng - n_common), 4) AS jaccard
FROM pairs
JOIN sz sa ON sa.doc_id = id_a
JOIN sz sb ON sb.doc_id = id_b
WHERE round(n_common / (sa.n_ng + sb.n_ng - n_common), 4) >= {JACCARD_THRESHOLD}"""


def sql_minhash_signatures() -> str:
    cols = ", ".join(f"mh{j}" for j in range(MINHASH_HASHES))
    return f"{_minhash_sig_cte(NGRAM_N, MINHASH_HASHES)}\nSELECT doc_id, {cols} FROM sig"


def sql_minhash_lsh_pairs() -> str:
    return f"""{_minhash_sig_cte(NGRAM_N, MINHASH_HASHES)},
{_pruned_band_ctes()}
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM btk a JOIN btk b
  ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
 AND a.doc_id < b.doc_id"""


def _cluster_label_ctes(src: str = "documents") -> str:
    """Everything through lab/sz: recursive min-reachability cluster
    labels over the MinHash-LSH candidate graph — shared by the
    dedup_clusters, dupe_census, keep-best and cascade oracles.
    ``src`` names the (doc_id, text) relation to cluster."""
    sig_cte = _minhash_sig_cte(NGRAM_N, MINHASH_HASHES, src=src).replace(
        "WITH ", "WITH RECURSIVE ", 1
    )
    return f"""{sig_cte},
{_pruned_band_ctes()},
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM btk a JOIN btk b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
),
sym AS (SELECT id_a AS u, id_b AS v FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
reach(u, lbl) AS (
  SELECT u, u AS lbl FROM (SELECT DISTINCT u FROM sym)
  UNION
  SELECT s.u, r.lbl FROM sym s JOIN reach r ON r.u = s.v
),
comp AS (SELECT u, min(lbl) AS cluster_id FROM reach GROUP BY u),
lab AS (
  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
  FROM {src} d LEFT JOIN comp c ON c.u = d.doc_id
),
sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
       FROM lab GROUP BY cluster_id)"""


def sql_dedup_clusters() -> str:
    """Duplicate clusters over the MinHash-LSH candidate graph: component
    label = min reachable doc_id, via a recursive min-reachability CTE —
    the declarative twin of the Spark side's large-star/small-star
    contraction (operators/components.py)."""
    return f"""{_cluster_label_ctes()}
SELECT l.doc_id, l.cluster_id, sz.cluster_size,
       l.doc_id = l.cluster_id AS is_canonical
FROM lab l JOIN sz USING (cluster_id)"""


def sql_dupe_census() -> str:
    """Twin of operators/components.duplication_census."""
    return f"""{_cluster_label_ctes()},
cl AS (
  SELECT l.doc_id, l.cluster_id, sz.cluster_size,
         l.doc_id = l.cluster_id AS is_canonical
  FROM lab l JOIN sz USING (cluster_id)
),
j AS (SELECT d.source, c.* FROM documents d JOIN cl c USING (doc_id))
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN is_canonical THEN 1 ELSE 0 END) AS BIGINT)
         AS n_canonical,
       CAST(sum(CASE WHEN is_canonical THEN cluster_size ELSE 0 END)
            AS BIGINT) AS kept_mass,
       CAST(max(cluster_size) AS BIGINT) AS max_cluster,
       CAST(((CAST(count(*) AS BIGINT)
         - sum(CASE WHEN is_canonical THEN 1 ELSE 0 END)) * 1000000)
         // count(*) AS BIGINT) AS dup_rate_ppm
FROM j GROUP BY source"""


def sql_simhash() -> str:
    bit_sums = ",\n         ".join(
        f"sum(((h >> {b}) & 1) * 2 - 1) AS b{b}" for b in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN b{b} >= 0 THEN (CAST(1 AS BIGINT) << {b}) ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, {sql_h64('tok')} AS h
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
),
bits AS (SELECT doc_id, {bit_sums} FROM toks GROUP BY doc_id)
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM bits"""


def sql_lsh_quality() -> str:
    """Twin of operators/textdedup.lsh_quality_report — composed from
    the two existing twins as nested-WITH subqueries so the report can
    never drift from what it measures."""
    return f"""
WITH t AS ({sql_ngram_jaccard()}),
c AS ({sql_minhash_lsh_pairs()}),
j AS (
  SELECT coalesce(t.id_a, c.id_a) AS id_a,
         coalesce(t.id_b, c.id_b) AS id_b,
         t.id_a IS NOT NULL AS in_t, c.id_a IS NOT NULL AS in_c
  FROM t FULL OUTER JOIN c ON t.id_a = c.id_a AND t.id_b = c.id_b
),
agg AS (
  -- count(CASE ...) (not sum) so an EMPTY pair join yields zeros like
  -- Spark's F.count aggregates, not NULLs
  SELECT CAST(count(CASE WHEN in_t THEN 1 END) AS BIGINT) AS n_true,
         CAST(count(CASE WHEN in_c THEN 1 END) AS BIGINT) AS n_candidates,
         CAST(count(CASE WHEN in_t AND in_c THEN 1 END) AS BIGINT) AS n_hit
  FROM j
)
SELECT n_true, n_candidates, n_hit,
       CASE WHEN n_candidates > 0 THEN n_hit * 1000 // n_candidates
            ELSE 0 END AS precision_pm,
       CASE WHEN n_true > 0 THEN n_hit * 1000 // n_true
            ELSE 0 END AS recall_pm
FROM agg"""


def sql_simhash_neardups() -> str:
    """Twin of operators/textdedup.simhash_neardup_pairs: same k+1-block
    pigeonhole candidate join, hot-block cap, bit_count(xor) verify."""
    from crawler_spark.operators.textdedup import (
        SIMHASH_BITS,
        SIMHASH_HAM_K,
        SIMHASH_HOT_BLOCK_MAX,
    )

    nb = SIMHASH_HAM_K + 1
    width = SIMHASH_BITS // nb
    mask = (1 << width) - 1
    fps = sql_simhash().strip()
    return f"""
WITH fps AS ({fps}),
blocks AS (
  SELECT doc_id, simhash, b AS blk, (simhash >> (b * {width})) & {mask} AS val
  FROM fps, unnest([{", ".join(str(b) for b in range(nb))}]) AS t(b)
),
keep AS (
  SELECT blk, val FROM blocks GROUP BY blk, val
  HAVING count(*) <= {SIMHASH_HOT_BLOCK_MAX}
),
pb AS (SELECT blocks.* FROM blocks JOIN keep USING (blk, val))
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM pb a JOIN pb b ON a.blk = b.blk AND a.val = b.val
                    AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_HAM_K}"""


def _seg_lines_cte(k: int) -> str:
    """CTEs sd(words) + segs + lines(doc_id, pos, line): fixed k-word
    segmentation of the word stream (the synthetic corpus has no
    newlines) with 0-based positions — mirrors
    operators/textclean.word_segments + doc_lines(segments=True)."""
    return f"""
sd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
segs AS (
  SELECT doc_id,
         list_transform(range(CAST(ceil(len(w) / {k}.0) AS BIGINT)),
                        i -> array_to_string(w[i*{k}+1:i*{k}+{k}], ' ')) AS s
  FROM sd
),
lines AS (
  SELECT doc_id, u.i - 1 AS pos, s[u.i] AS line
  FROM segs, unnest(generate_series(1, len(s))) AS u(i)
)"""


def sql_boilerplate_removal() -> str:
    from crawler_spark.operators.textclean import (
        BOILERPLATE_MIN_DOCS,
        SEGMENT_WORDS,
    )

    return f"""
WITH {_seg_lines_cte(SEGMENT_WORDS)},
hot AS (
  SELECT line FROM (
    SELECT line, count(DISTINCT doc_id) AS n_docs FROM lines GROUP BY line
  ) WHERE n_docs >= {BOILERPLATE_MIN_DOCS}
),
kept AS (SELECT * FROM lines WHERE line NOT IN (SELECT line FROM hot)),
rebuilt AS (
  SELECT doc_id,
         array_to_string(list(line ORDER BY pos), ' ') AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
),
totals AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id)
SELECT t.doc_id,
       coalesce(r.clean_text, '') AS clean_text,
       CAST(t.n_lines AS BIGINT) AS n_lines,
       CAST(t.n_lines - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
FROM totals t LEFT JOIN rebuilt r ON r.doc_id = t.doc_id"""


def sql_repetition_stats() -> str:
    from crawler_spark.operators.textclean import (
        DUP_LINE_PM_MAX,
        SEGMENT_WORDS,
        TOP_2GRAM_PM_MAX,
    )

    return f"""
WITH {_seg_lines_cte(SEGMENT_WORDS)},
lc AS (SELECT doc_id, line, count(*) AS c FROM lines GROUP BY doc_id, line),
ls AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines, count(*) AS n_distinct
  FROM lc GROUP BY doc_id
),
ld AS (
  SELECT doc_id, n_lines,
         CAST(floor((n_lines - n_distinct) * 1000 / n_lines) AS BIGINT)
           AS dup_line_pm
  FROM ls
),
g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                               i -> array_to_string(w[i:i+1], ' '))) AS ng
  FROM sd WHERE len(w) >= 2
),
gc AS (SELECT doc_id, ng, count(*) AS c FROM g GROUP BY doc_id, ng),
gs AS (
  SELECT doc_id,
         CAST(floor(max(c) * 1000 / sum(c)) AS BIGINT) AS top_2gram_pm
  FROM gc GROUP BY doc_id
)
SELECT ld.doc_id, ld.n_lines, ld.dup_line_pm,
       CAST(coalesce(gs.top_2gram_pm, 0) AS BIGINT) AS top_2gram_pm,
       (ld.dup_line_pm > {DUP_LINE_PM_MAX}
        OR coalesce(gs.top_2gram_pm, 0) > {TOP_2GRAM_PM_MAX}) AS is_repetitive
FROM ld LEFT JOIN gs ON gs.doc_id = ld.doc_id"""


def sql_decontaminate() -> str:
    from crawler_spark.operators.decontam import (
        CONTAM_NGRAM,
        EVAL_MOD,
        EVAL_REM,
    )

    n = CONTAM_NGRAM
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (
  SELECT DISTINCT doc_id, {sql_h64('ng')} AS gh
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) - {n - 2}),
                                 i -> array_to_string(w[i:i+{n - 1}], ' '))) AS ng
    FROM d WHERE len(w) >= {n}
  )
),
ev AS (SELECT DISTINCT gh FROM g WHERE doc_id % {EVAL_MOD} = {EVAL_REM}),
tg AS (SELECT doc_id, gh FROM g WHERE doc_id % {EVAL_MOD} != {EVAL_REM}),
totals AS (SELECT doc_id, count(*) AS n_grams FROM tg GROUP BY doc_id),
hits AS (
  SELECT doc_id, count(*) AS n_hits
  FROM tg JOIN ev USING (gh) GROUP BY doc_id
),
base AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % {EVAL_MOD} != {EVAL_REM})
SELECT b.doc_id,
       CAST(coalesce(t.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(CASE WHEN coalesce(t.n_grams, 0) > 0
                 THEN floor(coalesce(h.n_hits, 0) * 1000 / t.n_grams)
                 ELSE 0 END AS BIGINT) AS contam_pm,
       (coalesce(h.n_hits, 0) > 0) AS is_contaminated
FROM base b
LEFT JOIN totals t ON t.doc_id = b.doc_id
LEFT JOIN hits h ON h.doc_id = b.doc_id"""


def sql_pii_scrub() -> str:
    from crawler_spark.functions.redact import (
        sql_inject_pii_demo,
        sql_pii_count,
        sql_redact_pii,
    )

    inj = sql_inject_pii_demo("text", "doc_id")
    return f"""
WITH t AS (SELECT doc_id, {inj} AS t FROM documents)
SELECT doc_id,
       {sql_redact_pii('t')} AS scrubbed,
       {sql_pii_count('t', 'email')} AS n_emails,
       {sql_pii_count('t', 'phone')} AS n_phones,
       {sql_pii_count('t', 'ssn')} AS n_ssns,
       {sql_pii_count('t', 'ipv4')} AS n_ips
FROM t"""


def sql_stratified_sample() -> str:
    from crawler_spark.operators.sampling import (
        BALANCE_RATES_PM,
        DEFAULT_RATE_PM,
        SAMPLE_SALT,
    )

    whens = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in sorted(BALANCE_RATES_PM.items())
    )
    bucket = sql_h64(f"(CAST(doc_id AS VARCHAR) || '|{SAMPLE_SALT}')")
    return f"""
WITH f AS (
  SELECT lang, doc_id,
         CASE WHEN ({bucket} % 1000) <
                   (CASE lang {whens} ELSE {DEFAULT_RATE_PM} END)
              THEN doc_id END AS sid
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(count(sid) AS BIGINT) AS n_sampled,
       CAST(coalesce(sum(sid), 0) AS BIGINT) AS sum_ids,
       CAST(coalesce(bit_xor(sid), 0) AS BIGINT) AS xor_ids,
       CAST(floor(count(sid) * 1000 / count(*)) AS BIGINT) AS achieved_pm
FROM f GROUP BY lang"""


# ------------------------------------------------------------- embeddings --


def _sql_dot(a: str, b: str, dim: int = EMBED_DIM) -> str:
    return (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def _sql_cosine(a: str, b: str, dim: int = EMBED_DIM) -> str:
    return (
        f"({_sql_dot(a, b, dim)} / "
        f"sqrt(({_sql_dot(a, a, dim)}) * ({_sql_dot(b, b, dim)})))"
    )


def sql_cosine_topk(query_ids: list[int], k: int = TOPK_K) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    cos = _sql_cosine("q.embedding", "e.embedding")
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id IN ({ids})),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, round({cos}, 4) AS cos_sim
  FROM embeddings e JOIN q ON e.vec_id <> q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}"""


def sql_cosine_neardup(threshold: float = NEARDUP_COSINE) -> str:
    cos = _sql_cosine("a.embedding", "b.embedding")
    return f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({cos}, 4) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round({cos}, 4) >= {threshold}"""


def _sql_cell_assign_ctes() -> str:
    """cagg/c CTE pair: the 6-dp-rounded per-label centroids — shared by
    the IVF-Flat and SemDedup oracles (twin of
    similarity.centroid_vectors + assign_cells_mapside)."""
    dims = ", ".join(
        f"round(avg(CAST(embedding[{d + 1}] AS DOUBLE)), 6) AS d{d}"
        for d in range(EMBED_DIM)
    )
    cent = "[" + ", ".join(f"d{d}" for d in range(EMBED_DIM)) + "]"
    return (
        f"cagg AS (SELECT label AS cell, {dims} FROM embeddings GROUP BY label),\n"
        f"c AS (SELECT cell, {cent} AS centroid FROM cagg)"
    )


def sql_ivf_topk(query_ids: list[int], k: int = TOPK_K, nprobe: int = 2) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    cos_ec = _sql_cosine("e.embedding", "c.centroid")
    cos_qc = _sql_cosine("q.q_vec", "c.centroid")
    cos_qa = _sql_cosine("p.q_vec", "a.embedding")
    return f"""
WITH {_sql_cell_assign_ctes()},
a0 AS (SELECT e.vec_id, e.embedding, c.cell,
              row_number() OVER (PARTITION BY e.vec_id
                                 ORDER BY {cos_ec} DESC, c.cell ASC) AS rn
       FROM embeddings e CROSS JOIN c),
assigned AS (SELECT vec_id, embedding, cell FROM a0 WHERE rn = 1),
q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings
      WHERE vec_id IN ({ids})),
p0 AS (SELECT q.query_id, q.q_vec, c.cell,
              row_number() OVER (PARTITION BY q.query_id
                                 ORDER BY {cos_qc} DESC, c.cell ASC) AS rn
       FROM q CROSS JOIN c),
probes AS (SELECT query_id, q_vec, cell FROM p0 WHERE rn <= {nprobe}),
cand AS (SELECT p.query_id, a.vec_id AS neighbor_id, round({cos_qa}, 4) AS cos_sim
         FROM probes p JOIN assigned a
           ON p.cell = a.cell AND a.vec_id <> p.query_id)
SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM cand
) WHERE rank <= {k}"""


def sql_centroids() -> str:
    dims = ",\n         ".join(
        f"avg(CAST(embedding[{d + 1}] AS DOUBLE)) AS d{d}" for d in range(EMBED_DIM)
    )
    sq = " + ".join(f"d{d} * d{d}" for d in range(EMBED_DIM))
    return f"""
WITH agg AS (
  SELECT label, {dims}, count(*) AS n_vecs
  FROM embeddings GROUP BY label
)
SELECT label, n_vecs, round(sqrt({sq}), 4) AS centroid_norm FROM agg"""


def sql_ann_recall(query_ids: list[int], k: int = TOPK_K, nprobe: int = 2) -> str:
    """Twin of operators/similarity.ann_recall: recall@k of the IVF
    oracle against the exact-top-k oracle — composed from the two
    existing twins as nested-WITH subqueries so the three queries can
    never drift apart."""
    return f"""
WITH exact AS ({sql_cosine_topk(query_ids, k)}),
approx AS ({sql_ivf_topk(query_ids, k, nprobe)})
SELECT e.query_id,
       CAST(count(*) AS BIGINT) AS k_eff,
       CAST(count(a.neighbor_id) AS BIGINT) AS hits,
       count(a.neighbor_id) * 1000 // count(*) AS recall_pm
FROM exact e LEFT JOIN approx a
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY e.query_id"""


def sql_ann_lsh(threshold: float = NEARDUP_COSINE) -> str:
    planes = hyperplanes(NUM_PLANES, EMBED_DIM)
    plane_lits = [
        "[" + ", ".join(f"{float(v):.1f}" for v in row) + "]" for row in planes
    ]
    bucket = " + ".join(
        f"(CASE WHEN {_sql_dot('embedding', plane_lits[j])} >= 0 "
        f"THEN (CAST(1 AS BIGINT) << {j}) ELSE 0 END)"
        for j in range(NUM_PLANES)
    )
    cos = _sql_cosine("a.embedding", "b.embedding")
    return f"""
WITH bk AS (SELECT vec_id, embedding, ({bucket}) AS bucket FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({cos}, 4) AS cos_sim
FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round({cos}, 4) >= {threshold}"""


# ------------------------------------------------------------- multimodal --

# Media payloads are deterministic closed-form functions of doc_id
# (crawler_spark/sources/media.py): the Spark side encodes real binary
# containers, shuffles them, and decodes byte-by-byte in mapInPandas; the
# oracle recomputes the expected features arithmetically. Divergence
# anywhere in encode→decode would surface as a value-hash mismatch.

_MEDIA_CTE = """
m AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                         ELSE 'video' END AS media_type,
         CAST(64 + (doc_id * 7) % 448 AS INT) AS w,
         CAST(64 + (doc_id * 13) % 448 AS INT) AS h,
         CAST(8000 + (doc_id % 3) * 4000 AS INT) AS rate,
         CAST(500 + (doc_id * 37) % 9500 AS INT) AS ms,
         CAST(8 + (doc_id * 3) % 120 AS INT) AS n_frames,
         CAST(24 + (doc_id % 2) * 6 AS INT) AS fps
  FROM documents
)"""


def sql_media_features() -> str:
    return f"""
WITH {_MEDIA_CTE}
SELECT doc_id, media_type,
       CAST(CASE media_type WHEN 'image' THEN 76 WHEN 'audio' THEN 16
                            ELSE 12 END AS BIGINT) AS n_bytes,
       CASE WHEN media_type = 'image' THEN w END AS width,
       CASE WHEN media_type = 'image' THEN h END AS height,
       CAST(CASE WHEN media_type = 'image' THEN w * h END AS BIGINT) AS n_pixels,
       CASE WHEN media_type = 'image'
            THEN CAST(doc_id % 251 AS DOUBLE) END AS mean_pixel,
       CASE WHEN media_type = 'audio' THEN rate END AS sample_rate,
       CASE WHEN media_type = 'audio' THEN ms END AS duration_ms,
       CAST(CASE WHEN media_type = 'audio'
                 THEN (rate * ms) // 1000 END AS BIGINT) AS n_samples,
       CASE WHEN media_type = 'video' THEN n_frames END AS n_frames,
       CASE WHEN media_type = 'video' THEN fps END AS fps,
       CASE WHEN media_type = 'video'
            THEN round(CAST(n_frames AS DOUBLE) / fps, 4) END AS duration_s
FROM m"""


def sql_media_frame_sample(every_k: int) -> str:
    return f"""
WITH {_MEDIA_CTE}
SELECT doc_id,
       CAST(unnest(range(0, n_frames, {every_k})) AS INT) AS frame_idx,
       CAST((unnest(range(0, n_frames, {every_k})) * 1000) // fps AS INT) AS ts_ms
FROM m WHERE media_type = 'video'"""


def sql_media_resize(max_side: int) -> str:
    return f"""
WITH {_MEDIA_CTE},
r AS (
  SELECT doc_id, w, h,
         least(1.0, CAST({max_side} AS DOUBLE) / greatest(w, h)) AS scale
  FROM m WHERE media_type = 'image'
)
SELECT doc_id, w AS width, h AS height,
       CAST(greatest(1, CAST(trunc(w * scale) AS INT)) AS INT) AS out_width,
       CAST(greatest(1, CAST(trunc(h * scale) AS INT)) AS INT) AS out_height,
       round(scale, 6) AS scale
FROM r"""


def sql_media_stats() -> str:
    return f"""
WITH {_MEDIA_CTE},
f AS (
  SELECT media_type,
         CASE media_type WHEN 'image' THEN 76 WHEN 'audio' THEN 16
                         ELSE 12 END AS n_bytes,
         CASE WHEN media_type = 'image' THEN w * h END AS n_pixels,
         CASE WHEN media_type = 'audio' THEN (rate * ms) // 1000 END AS n_samples,
         CASE WHEN media_type = 'video'
              THEN (CAST(n_frames AS BIGINT) * 1000000) // fps END AS duration_us
  FROM m
)
SELECT media_type, count(*) AS n, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       round(avg(n_pixels), 4) AS avg_pixels,
       round(avg(n_samples), 4) AS avg_samples,
       round(avg(duration_us) / 1000000.0, 4) AS avg_duration_s
FROM f GROUP BY media_type"""


# ---------------------------------------------------------- EP1 targeted --

# The CDX index derives from pages_from_documents: url =
# https://{source}.example.com/d/{doc_id}, SURT urlkey =
# com,example,{source})/d/{doc_id}, ts = 2026-01-01 + doc_id seconds,
# status 200. The oracle reconstructs those closed forms.

_CDX_CTE = """
cdx AS (
  SELECT 'com,example,' || source || ')/d/' || CAST(doc_id AS VARCHAR) AS urlkey,
         strftime(TIMESTAMP '2026-01-01' + to_seconds(doc_id), '%Y%m%d%H%M%S') AS ts,
         'https://' || source || '.example.com/d/' || CAST(doc_id AS VARCHAR) AS url,
         source || '.example.com' AS host,
         200 AS status,
         source AS filename,
         doc_id
  FROM documents
)"""


def sql_cdx_domain_select(from_ts: str, to_ts: str) -> str:
    return f"""
WITH {_CDX_CTE}
SELECT urlkey, ts, url, CAST(status AS INT) AS status, filename
FROM cdx
WHERE (host = 'example.com' OR host LIKE '%.example.com')
  AND status = 200 AND ts >= '{from_ts}' AND ts <= '{to_ts}'"""


def sql_per_domain_headk(k: int) -> str:
    return f"""
WITH {_CDX_CTE}
SELECT host AS domain, urlkey, ts, url, CAST(status AS INT) AS status, filename
FROM (
  SELECT *, row_number() OVER (PARTITION BY host ORDER BY urlkey, ts) AS rn
  FROM cdx WHERE status = 200
) WHERE rn <= {k}"""


def sql_targeted_classify(from_ts: str) -> str:
    """EP1 end-to-end over the documents-derived pages: flagship closed
    form restricted by the CDX time filter; global-URL dedupe is a no-op
    here (urls unique per doc_id)."""
    return f"""
SELECT source || '.example.com' AS domain,
       'https://' || source || '.example.com/d/' || CAST(doc_id AS VARCHAR) AS url,
       'https' AS schema,
       CASE WHEN doc_id % 10 < 2 THEN 'high' ELSE 'medium' END AS confidence,
       CASE WHEN doc_id % 10 < 2 THEN 'bld' || CAST(doc_id AS VARCHAR) END AS build_id,
       source AS warc_source,
       strftime(TIMESTAMP '2026-01-01' + to_seconds(doc_id), '%Y-%m-%dT%H:%M:%S') AS detected_at,
       strftime(TIMESTAMP '2026-01-01' + to_seconds(doc_id), '%Y%m%d%H%M%S') AS crawl_date
FROM documents
WHERE doc_id % 10 < 4
  AND strftime(TIMESTAMP '2026-01-01' + to_seconds(doc_id), '%Y%m%d%H%M%S') >= '{from_ts}'"""


# -------------------------------------------------------------- flagship --

# doc_id % 10 → planted page class in plans/docpages.py; the oracle derives
# the classifier's expected output from the SAME construction rule. Pages
# with class high carry __NEXT_DATA__ + div#__next + /_next/static/ +
# buildId (detector: max=3 → 'high'); medium carry next-route-announcer
# (max=2 → 'medium'); low carry only /_next/ (max=1 → gated out at
# min_confidence=medium); the rest are negative.


# cdx_latest_index: the documents corpus is partitioned into 5 synthetic
# monthly crawls (doc_id % 5); the catalog scan + newest-first pick
# (reference src/cdx/client.py:32-52) reduce to a groupBy + max.


def sql_cdx_latest_index() -> str:
    return """
SELECT regexp_replace(crawl_id, '^CC-MAIN-', '') AS latest, n_records FROM (
  SELECT 'CC-MAIN-2026-' || lpad(CAST(doc_id % 5 + 1 AS VARCHAR), 2, '0') AS crawl_id,
         count(*) AS n_records
  FROM documents GROUP BY 1
) ORDER BY crawl_id DESC LIMIT 1"""


# warc_ingest: sources/warc.warc_ingest_from_documents builds one
# member-gzip WARC blob per doc_id%16 group (records in doc_id order,
# every 5th blob truncated inside its final record, doc_id%3==0 bodies
# gzip-coded at the HTTP layer), then parses it back with the tolerant
# reader. The oracle recomputes the surviving rows arithmetically: the
# truncated blob drops exactly its max-doc_id record, and the decode
# loop (utf-8 encode → [gzip] → parse → gunzip sniff → utf-8 decode) is
# the identity on text, checked via md5.


def sql_warc_ingest() -> str:
    return """
WITH g AS (
  SELECT doc_id, source, text, doc_id % 16 AS g,
         row_number() OVER (PARTITION BY doc_id % 16 ORDER BY doc_id) - 1 AS off,
         max(doc_id) OVER (PARTITION BY doc_id % 16) AS gmax,
         count(*) OVER (PARTITION BY doc_id % 16) AS gn
  FROM documents
)
SELECT 'https://' || source || '.example.com/d/' || CAST(doc_id AS VARCHAR) AS url,
       CAST(off AS BIGINT) AS warc_offset,
       CAST(200 AS INT) AS status,
       'text/html; charset=utf-8' AS mime,
       CAST(length(text) AS BIGINT) AS n_chars,
       md5(text) AS text_md5
FROM g
WHERE NOT (g % 5 = 0 AND gn > 1 AND doc_id = gmax)"""


def sql_text_chunks() -> str:
    """Twin of operators/chunking.chunk_text: same window/stride
    arithmetic over the split word array."""
    from crawler_spark.operators.chunking import CHUNK_STRIDE, CHUNK_WINDOW

    ov = CHUNK_WINDOW - CHUNK_STRIDE
    s, wdw = CHUNK_STRIDE, CHUNK_WINDOW
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
c AS (
  SELECT doc_id, w,
         CAST(ceil(greatest(len(w) - {ov}, 1) / {s}.0) AS INT) AS nc
  FROM d
)
SELECT doc_id, CAST(i AS INT) AS chunk_idx,
       CAST(i * {s} AS INT) AS word_start,
       CAST(len(array_slice(w, i * {s} + 1, i * {s} + {wdw})) AS INT)
         AS n_words,
       array_to_string(array_slice(w, i * {s} + 1, i * {s} + {wdw}), ' ')
         AS chunk
FROM c, unnest(range(0, nc)) AS t(i)"""


def sql_url_param_strip() -> str:
    """Twin of __spark_entry__._q_url_param_strip: stripped URLs are
    closed-form in m = doc_id % 4 (the Spark side genuinely
    split/filter/rejoins the query string)."""
    return """
WITH p AS (
  SELECT doc_id,
         'https://site' || CAST(doc_id % 50 AS VARCHAR) || '.example.com/p/'
           || CAST(doc_id AS VARCHAR) AS base,
         CAST(doc_id AS VARCHAR) AS ids,
         doc_id % 4 AS m
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       base || CASE m
         WHEN 0 THEN '?utm_source=x&id=' || ids || '&fbclid=a&b=2'
         WHEN 1 THEN '?utm_campaign=c'
         WHEN 2 THEN '?id=' || ids
         ELSE '' END AS url,
       base || CASE m
         WHEN 0 THEN '?id=' || ids || '&b=2'
         WHEN 2 THEN '?id=' || ids
         ELSE '' END AS stripped,
       CAST(CASE m WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 0 END AS INT)
         AS n_stripped
FROM p"""


def sql_warc_outlinks() -> str:
    """Twin of sources/warc.warc_outlinks_from_documents: same survivor
    rule as sql_warc_ingest (every 5th blob's last record is cut), two
    resolved links per survivor — the root-relative /g{g}/next and the
    relative rel{doc_id}.html against base /d/{doc_id}."""
    return """
WITH g AS (
  SELECT doc_id, source, doc_id % 16 AS g,
         max(doc_id) OVER (PARTITION BY doc_id % 16) AS gmax,
         count(*) OVER (PARTITION BY doc_id % 16) AS gn
  FROM documents
),
s AS (
  SELECT doc_id, source, g,
         'https://' || source || '.example.com' AS root,
         'https://' || source || '.example.com/d/' || CAST(doc_id AS VARCHAR)
           AS src
  FROM g
  WHERE NOT (g % 5 = 0 AND gn > 1 AND doc_id = gmax)
)
SELECT src AS src_url, root || '/g' || CAST(g AS VARCHAR) || '/next' AS dst_url
FROM s
UNION ALL
SELECT src, root || '/d/rel' || CAST(doc_id AS VARCHAR) || '.html' FROM s"""


# warc_ingest_targeted: sources/warc.warc_ingest_targeted_from_documents
# builds one uncompressed blob per doc_id%64 group; g%3==0 groups lead
# with an 8 KiB padding response record that the max_bytes=4096 slice cuts
# mid-payload (blob → no rows); every other blob emits exactly its first
# response record = the group's min doc_id = g (doc_id range is
# contiguous from 0). All four header-charset decode paths are the
# identity on the ASCII corpus text, so the oracle recomputes url / mime /
# n_chars / text md5 closed-form.


def sql_warc_ingest_targeted() -> str:
    return """
WITH g AS (
  SELECT doc_id, source, text, doc_id % 64 AS g,
         row_number() OVER (PARTITION BY doc_id % 64 ORDER BY doc_id) AS rn
  FROM documents
)
SELECT 'https://' || source || '.example.com/d/' || CAST(doc_id AS VARCHAR) AS url,
       CAST(0 AS BIGINT) AS warc_offset,
       CAST(200 AS INT) AS status,
       CASE doc_id % 4
         WHEN 0 THEN 'text/html'
         WHEN 1 THEN 'text/html; charset=ISO-8859-1; format=flowed'
         WHEN 2 THEN 'text/html; charset=UTF-16-LE'
         ELSE 'text/html; charset=x-unknown-enc'
       END AS mime,
       CAST(length(text) AS BIGINT) AS n_chars,
       md5(text) AS text_md5
FROM g
WHERE rn = 1 AND g % 3 <> 0"""


# corpus_classify ground truth: the gzip/charset decode + Arrow detector
# pipeline is not expressible in SQL, but the generator is deterministic
# and partition-independent, so the expected confidence histogram over
# generate_pages(n=4000) is a CONSTANT. tools/gen_corpus_fixture.py
# derives it by running the row-at-a-time reference oracles
# (oracle/reference_decode + oracle/reference_detector — independent of
# the vectorized engine) over one numpy batch; tests/test_corpus.py
# re-derives it every run so this fixture cannot drift silently.

CORPUS_CLASSIFY_N_PAGES = 4_000
CORPUS_CLASSIFY_EXPECTED = {"high": 298, "medium": 289}


def sql_corpus_classify() -> str:
    rows = ", ".join(
        f"('{conf}', CAST({n} AS BIGINT))"
        for conf, n in sorted(CORPUS_CLASSIFY_EXPECTED.items())
    )
    return f"SELECT confidence, n FROM (VALUES {rows}) AS t(confidence, n)"


def sql_flagship() -> str:
    return """
SELECT source || '.example.com' AS domain,
       'https://' || source || '.example.com/d/' || CAST(doc_id AS VARCHAR) AS url,
       'https' AS schema,
       CASE WHEN doc_id % 10 < 2 THEN 'high' ELSE 'medium' END AS confidence,
       CASE WHEN doc_id % 10 < 2 THEN 'bld' || CAST(doc_id AS VARCHAR) END AS build_id,
       source AS warc_source
FROM documents
WHERE doc_id % 10 < 4"""


def sql_sink_roundtrip() -> str:
    """Twin of __spark_entry__._q_sink_roundtrip: a LOSSLESS sink
    round-trip means the read-back rows equal the rows that went in —
    i.e. the flagship result set once per sink tag."""
    return f"""
WITH f AS ({sql_flagship()})
SELECT domain, url, schema, confidence, build_id, warc_source, 'csv' AS sink FROM f
UNION ALL
SELECT domain, url, schema, confidence, build_id, warc_source, 'json' AS sink FROM f"""


# ------------------------------------------------------------ robots parse --

# robots_rules ground truth: bodies are a closed-form function of
# g = doc_id % 50 (three shapes: no-* group / CRLF+comment+colon-value /
# multi-group with ignored non-numeric Crawl-delay), so the parse result
# is itself closed-form — the oracle recomputes it arithmetically and
# any divergence in the JVM fold (functions/robots_parse.py) shows up as
# a value-hash mismatch.


def sql_robots_rules() -> str:
    return """
WITH g AS (SELECT DISTINCT doc_id % 50 AS g FROM documents)
SELECT 'site' || CAST(g AS VARCHAR) || '.example.com' AS host,
       CAST(CASE WHEN g % 5 = 0 THEN 0 WHEN g % 3 = 0 THEN 1 ELSE 2 END
            AS BIGINT) AS n_rules,
       CASE WHEN g % 5 = 0 THEN ''
            WHEN g % 3 = 0 THEN '/a:' || CAST(g AS VARCHAR)
            ELSE '/admin,/p' || CAST(g AS VARCHAR) END AS rules,
       CASE WHEN g % 5 = 0 THEN NULL
            WHEN g % 3 = 0 THEN (g % 7) + 0.5
            ELSE CAST(g % 9 AS DOUBLE) END AS crawl_delay
FROM g"""


# -------------------------------------------------------------- span dedup --


def sql_span_dedup() -> str:
    from crawler_spark.functions.texthash import sql_h64
    from crawler_spark.operators.spandedup import SPAN_NGRAM

    k = SPAN_NGRAM
    gh = sql_h64(f"array_to_string(w[i:i+{k - 1}], ' ')")
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
occ AS (
  SELECT doc_id, i - 1 AS pos, {gh} AS gh,
         {{'d': doc_id, 'p': i - 1}} AS okey
  FROM (SELECT doc_id, w, unnest(range(1, len(w) - {k - 2})) AS i
        FROM d WHERE len(w) >= {k})
),
dup AS (SELECT gh, min(okey) AS keep_okey
        FROM occ GROUP BY gh HAVING count(*) >= 2),
dup_occ AS (
  SELECT o.doc_id, o.pos FROM occ o JOIN dup USING (gh)
  WHERE o.okey != dup.keep_okey
),
cov AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + {k})) AS wpos
        FROM dup_occ),
ncov AS (SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY doc_id),
wp AS (SELECT doc_id, unnest(w) AS word, unnest(range(0, len(w))) AS wpos
       FROM d),
kept AS (
  SELECT wp.doc_id, string_agg(wp.word, ' ' ORDER BY wp.wpos) AS ct
  FROM wp ANTI JOIN cov ON wp.doc_id = cov.doc_id AND wp.wpos = cov.wpos
  GROUP BY wp.doc_id
)
SELECT d.doc_id,
       CAST(len(d.w) AS BIGINT) AS n_words,
       CAST(coalesce(n.n_removed, 0) AS BIGINT) AS n_removed,
       CAST(floor(coalesce(n.n_removed, 0) * 1000 / len(d.w)) AS BIGINT)
         AS dup_span_pm,
       md5(coalesce(k.ct, '')) AS clean_md5
FROM d
LEFT JOIN ncov n USING (doc_id)
LEFT JOIN kept k USING (doc_id)"""


def sql_linkgraph_pagerank() -> str:
    """Integer fixed-point PageRank, iterations unrolled as chained CTEs
    (the declarative twin of operators/linkgraph.py's power loop). Every
    value is BIGINT and every update is integer div/sum, so the result
    is bit-identical to the Spark side regardless of aggregation order;
    DuckDB's hugeint sum is cast back at the one place it widens."""
    from crawler_spark.operators.linkgraph import (
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_ITERATIONS,
        PR_SCALE,
    )

    base = f"(SELECT (({PR_SCALE} // n) * {PR_DAMP_DEN - PR_DAMP_NUM}) // {PR_DAMP_DEN} FROM nn)"
    iters = []
    for i in range(1, PR_ITERATIONS + 1):
        iters.append(f"""
r{i} AS (
  SELECT nd.node,
         {base} + ({PR_DAMP_NUM} * coalesce(s.s, 0)) // {PR_DAMP_DEN} AS rank_ppb
  FROM nd LEFT JOIN (
    SELECT e.dst AS node,
           CAST(sum(r.rank_ppb // od.out_deg) AS BIGINT) AS s
    FROM e JOIN od USING (src) JOIN r{i - 1} r ON r.node = e.src
    GROUP BY e.dst
  ) s USING (node)
)""")
    return f"""
WITH {_link_edges_ctes()},
od AS (SELECT src, CAST(count(*) AS BIGINT) AS out_deg FROM e GROUP BY src),
ideg AS (SELECT dst AS node, CAST(count(*) AS BIGINT) AS in_deg
         FROM e GROUP BY dst),
r0 AS (SELECT node, (SELECT {PR_SCALE} // n FROM nn) AS rank_ppb FROM nd),{",".join(iters)}
SELECT nd.node AS doc_id,
       CAST(coalesce(od.out_deg, 0) AS BIGINT) AS out_deg,
       CAST(coalesce(i.in_deg, 0) AS BIGINT) AS in_deg,
       CAST(r.rank_ppb AS BIGINT) AS rank_ppb
FROM nd
LEFT JOIN od ON od.src = nd.node
LEFT JOIN ideg i USING (node)
JOIN r{PR_ITERATIONS} r USING (node)"""


def sql_sequence_pack() -> str:
    """Window-sum twin of operators/packing.py's concat-and-chunk layout."""
    from crawler_spark.operators.packing import PACK_BUDGET, PACK_SHARDS

    b = PACK_BUDGET
    return f"""
WITH t AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(doc_id % {PACK_SHARDS} AS BIGINT) AS shard,
         CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}')) + 1 AS BIGINT)
           AS n_tokens
  FROM documents
), c AS (
  SELECT *,
         CAST(sum(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS end_offset
  FROM t
)
SELECT doc_id, shard, n_tokens,
       end_offset - n_tokens AS start_offset,
       (end_offset - n_tokens) // {b} AS first_chunk,
       ((end_offset - 1) // {b}) - ((end_offset - n_tokens) // {b}) + 1
         AS n_chunks,
       ((end_offset - 1) // {b}) > ((end_offset - n_tokens) // {b})
         AS straddles
FROM c"""


def sql_tfidf_top_terms() -> str:
    """Twin of operators/termstats.py: integer idf surrogate, top-k per
    source with (score desc, term asc) total-order tie-break."""
    from crawler_spark.operators.termstats import IDF_SCALE, TFIDF_TOPK

    stop = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
toks AS (
  SELECT source, doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents
),
ft AS (SELECT * FROM toks WHERE term NOT IN ({stop}) AND term <> ''),
tf AS (SELECT source, term, CAST(count(*) AS BIGINT) AS tf
       FROM ft GROUP BY source, term),
dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df
        FROM (SELECT DISTINCT doc_id, term FROM ft) GROUP BY term),
sc AS (
  SELECT tf.source, tf.term, tf.tf, dfr.df,
         ((SELECT n FROM nn) * {IDF_SCALE}) // dfr.df AS idf_ppm,
         CAST(tf.tf AS DOUBLE)
           * CAST(((SELECT n FROM nn) * {IDF_SCALE}) // dfr.df AS DOUBLE)
           AS score
  FROM tf JOIN dfr USING (term)
)
SELECT source, term, tf, df, idf_ppm, score FROM (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY score DESC, term ASC) AS rn
  FROM sc
) WHERE rn <= {TFIDF_TOPK}"""


# shared by sql_recrawl_report and sql_recrawl_schedule: the closed-form
# synthetic snapshot pair (twin of snapshotdiff.synth_snapshots) and its
# full-outer diff (twin of snapshotdiff.snapshot_diff)
_SNAPSHOT_DIFF_CTES = """
base AS (
  SELECT 'https://' || source || '.example.com/p/' || CAST(doc_id AS VARCHAR)
           AS url,
         source || '.example.com' AS host,
         doc_id, text
  FROM documents
),
prev AS (SELECT url, host, md5(text) AS h FROM base WHERE doc_id % 10 <> 3),
curr AS (SELECT url, host,
                md5(CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]'
                         ELSE text END) AS h
         FROM base WHERE doc_id % 10 <> 7),
d AS (
  SELECT coalesce(p.url, c.url) AS url,
         coalesce(p.host, c.host) AS host,
         CASE WHEN p.url IS NULL THEN 'added'
              WHEN c.url IS NULL THEN 'gone'
              WHEN p.h IS NOT DISTINCT FROM c.h THEN 'unchanged'
              ELSE 'changed' END AS status
  FROM prev p FULL OUTER JOIN curr c ON p.url = c.url
)"""


def sql_recrawl_report() -> str:
    """Twin of operators/snapshotdiff.py over the same closed-form
    synthetic snapshot pair."""
    from crawler_spark.operators.snapshotdiff import CHANGE_SCALE

    return f"""
WITH {_SNAPSHOT_DIFF_CTES},
agg AS (
  SELECT host,
         CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
         CAST(sum(CASE WHEN status = 'gone' THEN 1 ELSE 0 END) AS BIGINT) AS n_gone,
         CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
         CAST(sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
  FROM d GROUP BY host
)
SELECT host, n_added, n_gone, n_changed, n_unchanged,
       CASE WHEN n_changed + n_unchanged > 0
            THEN (n_changed * {CHANGE_SCALE}) // (n_changed + n_unchanged)
            ELSE 0 END AS change_ppm
FROM agg"""


def sql_sessionize() -> str:
    """lag + running-sum twin of operators/sessionize.py over events."""
    from crawler_spark.operators.sessionize import SESSION_GAP_US

    return f"""
WITH e AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events
),
f AS (
  SELECT *,
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_s
  FROM e
),
s AS (
  SELECT *,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_idx
  FROM f
)
SELECT user_id, session_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       min(us) AS start_us, max(us) AS end_us,
       max(us) - min(us) AS duration_us
FROM s GROUP BY user_id, session_idx"""


def sql_lm_familiarity() -> str:
    """Twin of operators/lmscore.py: two-pass corpus bigram familiarity."""
    from crawler_spark.operators.lmscore import (
        LM_COUNT_CAP,
        LM_HEAD_MIN,
        LM_TAIL_MAX,
    )

    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                               i -> w[i] || ' ' || w[i+1])) AS bg
  FROM d WHERE len(w) >= 2
),
model AS (
  SELECT bg, least(CAST(count(*) AS BIGINT), {LM_COUNT_CAP}) AS c
  FROM bg GROUP BY bg
),
per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(c) AS BIGINT) AS raw
  FROM bg JOIN model USING (bg) GROUP BY doc_id
)
SELECT doc_id, n_bigrams, raw // n_bigrams AS familiarity,
       CASE WHEN raw // n_bigrams >= {LM_HEAD_MIN} THEN 'head'
            WHEN raw // n_bigrams <= {LM_TAIL_MAX} THEN 'tail'
            ELSE 'middle' END AS bucket
FROM per_doc"""


_CAPTURE_BASE = """
base AS (
  SELECT 'https://' || source || '.example.com/p/' || CAST(doc_id AS VARCHAR)
           AS url,
         source || '.example.com' AS host, doc_id, text
  FROM documents
),
caps AS (
  SELECT url, host, doc_id,
         TIMESTAMP '{epoch}' + to_seconds(doc_id + k * {gap}) AS ts,
         md5(text || CAST({dk} AS VARCHAR)) AS digest{extra}
  FROM base, unnest([{ks}]) AS t(k)
)"""


def _capture_base(dk: str = "k", with_bytes: bool = False) -> str:
    """base/caps CTE pair for the closed-form multi-capture store
    (twin of asof.synth_captures, same digest_k/with_bytes knobs) —
    shared by the as-of, cdx-closest and revisit oracles."""
    from crawler_spark.operators.asof import (
        CAPTURE_EPOCH,
        CAPTURE_GAP_S,
        CAPTURES_PER_URL,
    )

    extra = ",\n         CAST(length(text) AS BIGINT) AS n_bytes" if with_bytes else ""
    return _CAPTURE_BASE.format(
        epoch=CAPTURE_EPOCH,
        gap=CAPTURE_GAP_S,
        ks=", ".join(str(k) for k in range(CAPTURES_PER_URL)),
        dk=dk,
        extra=extra,
    )


def sql_snapshot_asof() -> str:
    """Twin of operators/asof.asof_join over the same closed-form
    multi-capture store — DuckDB's native ASOF JOIN is the oracle."""
    return f"""
WITH {_capture_base()},
probes AS (
  SELECT url,
         TIMESTAMP '2026-01-01' + to_seconds(
           doc_id + CASE doc_id % 4 WHEN 0 THEN -1 WHEN 1 THEN 1800
                                    WHEN 2 THEN 5400 ELSE 9000 END) AS t
  FROM base
)
SELECT p.url, p.t, c.ts, c.digest
FROM probes p ASOF LEFT JOIN caps c ON p.url = c.url AND p.t >= c.ts"""


def sql_cdx_closest(target_ts: str) -> str:
    """Twin of operators/asof.cdx_closest: per-urlkey capture closest to
    target_ts, ties to the earlier capture."""
    return f"""
WITH {_capture_base()},
cdx AS (
  SELECT 'com,example,' || replace(host, '.example.com', '')
           || ')/p/' || CAST(doc_id AS VARCHAR) AS urlkey,
         strftime(ts, '%Y%m%d%H%M%S') AS ts, url, digest
  FROM caps
)
SELECT urlkey, ts, url, digest FROM (
  SELECT *, row_number() OVER (
    PARTITION BY urlkey
    ORDER BY abs(CAST(ts AS BIGINT) - {int(target_ts)}), ts, url) AS rn
  FROM cdx
) WHERE rn = 1"""


_CAPS_CDX_CTE = """
cdx AS (
  SELECT 'com,example,' || replace(host, '.example.com', '')
           || ')/p/' || CAST(doc_id AS VARCHAR) AS urlkey,
         strftime(ts, '%Y%m%d%H%M%S') AS ts, url, digest
  FROM caps
)"""

# Planted adjacent duplicate: even docs' k=1 capture repeats the k=0
# digest, so digest-collapse drops exactly that row (twin of the
# digest_k Column in __spark_entry__._q_cdx_collapse_digest).
CDX_COLLAPSE_DK = "CASE WHEN doc_id % 2 = 0 AND k = 1 THEN 0 ELSE k END"


def sql_cdx_collapse_digest() -> str:
    """Twin of operators/cdxcollapse.collapse_digest over the capture
    store with planted adjacent-duplicate digests: lag per urlkey in
    (ts, url) order, keep rows whose digest differs from the previous."""
    return f"""
WITH {_capture_base(dk=CDX_COLLAPSE_DK)},
{_CAPS_CDX_CTE},
lagd AS (
  SELECT *, lag(digest) OVER (PARTITION BY urlkey ORDER BY ts, url) AS prev
  FROM cdx
)
SELECT urlkey, ts, url, digest FROM lagd
WHERE prev IS NULL OR prev <> digest"""


def sql_outlink_extract() -> str:
    """Twin of __spark_entry__._q_outlink_extract: every resolved
    outlink reconstructed closed-form (the Spark side parses anchor
    tags and runs the RFC 3986 fold for real)."""
    return """
WITH p AS (
  SELECT doc_id,
         CAST(doc_id % 50 AS VARCHAR) AS g,
         'https://site' || CAST(doc_id % 50 AS VARCHAR) || '.example.com'
           AS root,
         'https://site' || CAST(doc_id % 50 AS VARCHAR)
           || '.example.com/a/b/page' || CAST(doc_id AS VARCHAR) || '.html'
           AS src
  FROM documents
)
SELECT src AS src_url, root || '/root' || g || '.html' AS dst_url FROM p
UNION ALL
SELECT src, root || '/a/up' || CAST(doc_id AS VARCHAR) || '.html' FROM p
UNION ALL
SELECT src, root || '/a/b/rel/deep.html' FROM p
UNION ALL
SELECT src, 'https://cdn' || g || '.example.net/x' FROM p
UNION ALL
SELECT src, src || '?q=' || CAST(doc_id AS VARCHAR) FROM p"""


def sql_nofollow_outlinks() -> str:
    """Twin of __spark_entry__._q_nofollow_outlinks: every directive
    verdict is closed-form in m = doc_id % 4 (the Spark side genuinely
    regexp-parses meta tags and anchor rel attributes)."""
    return """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       doc_id % 4 = 3 AS noindex,
       doc_id % 4 = 1 AS page_nofollow,
       CAST(2 AS BIGINT) AS n_links,
       CAST(CASE doc_id % 4 WHEN 1 THEN 0 WHEN 2 THEN 1 ELSE 2 END
            AS BIGINT) AS n_follow
FROM documents"""


def sql_canonical_cluster() -> str:
    """Twin of __spark_entry__._q_canonical_cluster: even docs map to
    the shared per-group canonical (the Spark side extracts and
    RFC 3986-resolves the root-relative href for real), odd docs are
    self-canonical singletons."""
    return """
WITH p AS (
  SELECT doc_id, CAST(doc_id % 50 AS VARCHAR) AS g,
         'https://site' || CAST(doc_id % 50 AS VARCHAR) || '.example.com/v/'
           || CAST(doc_id AS VARCHAR) || '?utm=x' AS url
  FROM documents
),
c AS (
  SELECT CASE WHEN doc_id % 2 = 0
              THEN 'https://site' || g || '.example.com/page' || g
              ELSE url END AS canonical,
         url
  FROM p
)
SELECT canonical, CAST(count(*) AS BIGINT) AS n_members,
       min(url) AS representative
FROM c GROUP BY canonical"""


def sql_mirror_detect() -> str:
    """Twin of operators/mirrors.mirror_report over the planted-mirror
    capture store (even docs replicated onto mirror{g} hosts)."""
    from crawler_spark.operators.mirrors import (
        MIRROR_MAX_HOSTS,
        MIRROR_MIN_PM,
        MIRROR_MIN_SHARED,
    )

    return f"""
WITH caps AS (
  SELECT 'site' || CAST(doc_id % 50 AS VARCHAR) || '.example.com' AS host,
         md5(text) AS digest
  FROM documents
  UNION ALL
  SELECT 'mirror' || CAST(doc_id % 50 AS VARCHAR) || '.example.com',
         md5(text)
  FROM documents WHERE doc_id % 2 = 0
),
hd AS (SELECT DISTINCT digest, host FROM caps),
keep AS (
  SELECT digest FROM hd GROUP BY digest
  HAVING count(*) <= {MIRROR_MAX_HOSTS}
),
pruned AS (SELECT hd.* FROM hd JOIN keep USING (digest)),
pairs AS (
  SELECT a.host AS host_a, b.host AS host_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM pruned a JOIN pruned b USING (digest)
  WHERE a.host < b.host
  GROUP BY a.host, b.host
  HAVING count(*) >= {MIRROR_MIN_SHARED}
),
totals AS (
  SELECT host, CAST(count(*) AS BIGINT) AS n FROM hd GROUP BY host
)
SELECT host_a, host_b, n_shared, ta.n AS n_a, tb.n AS n_b,
       n_shared * 1000 // least(ta.n, tb.n) AS containment_pm,
       n_shared * 1000 // least(ta.n, tb.n) >= {MIRROR_MIN_PM} AS is_mirror
FROM pairs
JOIN totals ta ON ta.host = host_a
JOIN totals tb ON tb.host = host_b"""


def sql_dsir_select() -> str:
    """Twin of operators/dsir.dsir_select: hashed-bigram importance
    scores (same h64-mod-bucket features, Laplace-smoothed integer
    ratio) with the keep cut at quantile_cont(DSIR_KEEP_Q)."""
    from crawler_spark.functions.texthash import sql_h64
    from crawler_spark.operators.dsir import (
        DSIR_BUCKETS,
        DSIR_KEEP_Q,
        DSIR_SCALE,
    )

    h = sql_h64("bg")
    return f"""
WITH d AS (
  SELECT doc_id, source = 'src0' AS t, string_split(text, ' ') AS w
  FROM documents
),
bg AS (
  SELECT doc_id, t,
         {h} % {DSIR_BUCKETS} AS bucket
  FROM (
    SELECT doc_id, t,
           unnest(list_transform(range(1, len(w)),
                                 i -> w[i] || ' ' || w[i+1])) AS bg
    FROM d WHERE len(w) >= 2
  )
),
weights AS (
  SELECT bucket,
         (sum(CASE WHEN t THEN 1 ELSE 0 END) + 1) * {DSIR_SCALE}
           // (count(*) + 1) AS wgt
  FROM bg GROUP BY bucket
),
per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(wgt) AS BIGINT) AS raw
  FROM bg JOIN weights USING (bucket) GROUP BY doc_id
),
scored AS (
  SELECT doc_id, n_bigrams, raw // n_bigrams AS dsir_score FROM per_doc
)
SELECT doc_id, n_bigrams, dsir_score,
       dsir_score >= (SELECT quantile_cont(dsir_score, {DSIR_KEEP_Q})
                      FROM scored) AS kept
FROM scored"""


def sql_fetch_timetable() -> str:
    """Twin of operators/politeness.schedule_fetches over the same
    closed-form candidate set: row_number per host in (priority desc,
    surt) order, scheduled_ms = slot × delay_ms (delays are multiples
    of 0.5 s — exact in binary — NULL → 0.5 default)."""
    return """
WITH c AS (
  SELECT doc_id,
         'site' || CAST(doc_id % 50 AS VARCHAR) || '.example.com' AS host,
         doc_id % 5 AS priority,
         'com,example,site' || CAST(doc_id % 50 AS VARCHAR) || ')/p/'
           || CAST(doc_id AS VARCHAR) AS surt,
         CASE WHEN doc_id % 50 % 4 = 3 THEN NULL
              ELSE CAST(doc_id % 50 % 4 AS DOUBLE) * 0.5 END AS crawl_delay
  FROM documents
),
s AS (
  SELECT *, row_number() OVER (
    PARTITION BY host ORDER BY priority DESC, surt) - 1 AS slot
  FROM c
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, host,
       CAST(slot AS BIGINT) AS slot,
       CAST(slot * CAST(coalesce(crawl_delay, 0.5) * 1000 AS BIGINT)
            AS BIGINT) AS scheduled_ms
FROM s"""


def sql_robots_wildcard() -> str:
    """Twin of __spark_entry__._q_robots_wildcard: the RFC 9309 verdict
    per path is closed-form in m = doc_id % 6 (the Spark side parses
    and wildcard-matches for real; here every case is pre-derived) —
    m=0 no rule matches; m=1 blocked by ``/private*``; m=2 the longer
    ``/private/ok$`` Allow beats it; m=3 the equal-length ``/t*p/``
    Allow wins the tie; m=4 blocked by the ``$``-anchored ``/g{g}$``;
    m=5 the anchor misses."""
    return """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       'site' || CAST(doc_id % 50 AS VARCHAR) || '.example.com' AS host,
       CASE doc_id % 6
         WHEN 0 THEN '/public/x'
         WHEN 1 THEN '/private/x'
         WHEN 2 THEN '/private/ok'
         WHEN 3 THEN '/tmp/a'
         WHEN 4 THEN '/g' || CAST(doc_id % 50 AS VARCHAR)
         ELSE '/g' || CAST(doc_id % 50 AS VARCHAR) || 'x'
       END AS path,
       doc_id % 6 NOT IN (1, 4) AS allowed,
       CASE doc_id % 6
         WHEN 1 THEN '/private*'
         WHEN 2 THEN '/private/ok$'
         WHEN 3 THEN '/t*p/'
         WHEN 4 THEN '/g' || CAST(doc_id % 50 AS VARCHAR) || '$'
       END AS rule
FROM documents"""


def sql_cdx_collapse_time(digits: int) -> str:
    """Twin of operators/cdxcollapse.collapse_timestamp: first capture
    per urlkey per distinct ``digits``-long ts prefix."""
    return f"""
WITH {_capture_base()},
{_CAPS_CDX_CTE}
SELECT urlkey, ts, url, digest FROM (
  SELECT *, row_number() OVER (
    PARTITION BY urlkey, substr(ts, 1, {digits}) ORDER BY ts, url) AS rn
  FROM cdx
) WHERE rn = 1"""


_PAGE_STATS = """
pstats AS (
  SELECT source || '.example.com' AS host,
         CASE doc_id % 20 WHEN 0 THEN 404 WHEN 1 THEN 500 WHEN 2 THEN 301
              ELSE 200 END AS status,
         n_chars AS n_bytes
  FROM documents
)"""


def sql_crawl_rollup() -> str:
    """Twin of operators/crawlreport.crawl_rollup: ROLLUP(host, status)
    with GROUPING-disambiguated 'ALL' labels."""
    return f"""
WITH {_PAGE_STATS}
SELECT coalesce(host, 'ALL') AS host,
       coalesce(CAST(status AS VARCHAR), 'ALL') AS status,
       CAST(GROUPING(host) * 2 + GROUPING(status) AS BIGINT) AS level,
       CAST(count(*) AS BIGINT) AS n_pages,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes
FROM pstats GROUP BY ROLLUP(host, status)"""


def sql_latency_quantiles() -> str:
    """Twin of operators/crawlreport.latency_quantiles: quantile_cont and
    Spark's exact percentile share the linear-interpolation rule."""
    from crawler_spark.operators.crawlreport import QUANTILES

    cols = ",\n       ".join(
        f"quantile_cont(value, {q}) AS p{int(q * 100)}" for q in QUANTILES
    )
    return f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       {cols}
FROM events GROUP BY event_type"""


def sql_recrawl_schedule() -> str:
    """Twin of operators/snapshotdiff.recrawl_schedule over the same
    closed-form snapshot pair as sql_recrawl_report (shared CTEs; the
    urgency weights come from the operator's own _STATUS_WEIGHT map)."""
    from crawler_spark.operators.snapshotdiff import (
        _STATUS_WEIGHT,
        CHANGE_SCALE,
        RECRAWL_BUDGET,
    )

    weight_case = " ".join(
        f"WHEN '{s}' THEN {w}" for s, w in _STATUS_WEIGHT.items()
    )
    return f"""
WITH {_SNAPSHOT_DIFF_CTES},
rates AS (
  SELECT host,
         CASE WHEN sum(CASE WHEN status IN ('changed','unchanged') THEN 1
                            ELSE 0 END) > 0
              THEN (sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END)
                      * {CHANGE_SCALE})
                   // sum(CASE WHEN status IN ('changed','unchanged') THEN 1
                               ELSE 0 END)
              ELSE 0 END AS change_ppm
  FROM d GROUP BY host
),
scored AS (
  SELECT d.host, d.url,
         CAST(CASE d.status {weight_case} END * {CHANGE_SCALE}
                + r.change_ppm AS BIGINT)
           AS priority
  FROM d JOIN rates r ON d.host = r.host
  WHERE d.status <> 'gone'
)
SELECT host, url, priority, rk FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY host ORDER BY priority DESC, url ASC) AS BIGINT) AS rk
  FROM scored
) WHERE rk <= {RECRAWL_BUDGET}"""


def sql_interval_match() -> str:
    """Twin of operators/intervaljoin.interval_join over the synthetic
    campaign windows — the oracle can afford the naive BETWEEN join."""
    return """
WITH fetches AS (
  SELECT 'https://' || source || '.example.com/p/' || CAST(doc_id AS VARCHAR)
           AS url,
         TIMESTAMP '2026-01-01' + to_seconds(doc_id * 7) AS ts
  FROM documents
),
camps AS (
  SELECT 'camp' || CAST(g AS VARCHAR) AS campaign_id,
         TIMESTAMP '2026-01-01' + to_seconds(g * 600) AS start,
         TIMESTAMP '2026-01-01' + to_seconds(g * 600 + (g % 7 + 1) * 900)
           AS "end"
  FROM (SELECT DISTINCT doc_id % 25 AS g FROM documents)
)
SELECT f.url, f.ts, c.campaign_id, c.start, c."end"
FROM fetches f JOIN camps c ON f.ts >= c.start AND f.ts < c."end" """


def sql_url_filter() -> str:
    """Twin of operators/urlfilter.url_category_filter over the docpages
    URL set and the closed-form every-10th-source blocklist."""
    from crawler_spark.operators.urlfilter import BLOCK_PATH_PATTERN

    return f"""
WITH pages AS (
  SELECT 'https://' || source || '.example.com/d/' || CAST(doc_id AS VARCHAR)
           AS url,
         source || '.example.com' AS host,
         source
  FROM documents
),
bl AS (
  SELECT DISTINCT source || '.example.com' AS bh FROM documents
  WHERE CAST(regexp_extract(source, '(\\d+)$', 1) AS INTEGER) % 10 = 7
)
SELECT url, host,
       reason = 'ok' AS keep, reason
FROM (
  SELECT p.url, p.host,
         CASE WHEN b.bh IS NOT NULL THEN 'domain_blocklist'
              WHEN regexp_matches(p.url, '{BLOCK_PATH_PATTERN}')
                THEN 'path_pattern'
              ELSE 'ok' END AS reason
  FROM pages p LEFT JOIN bl b ON p.host = b.bh
)"""


def sql_host_reputation() -> str:
    """Twin of operators/urlfilter.host_reputation."""
    from crawler_spark.operators.urlfilter import (
        PPM,
        REP_NONEN_REVIEW_PPM,
        REP_SHORT_CHARS,
        REP_SHORT_MAX_PPM,
    )

    return f"""
WITH d AS (
  SELECT source || '.example.com' AS host, lang, n_chars FROM documents
),
agg AS (
  SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN n_chars < {REP_SHORT_CHARS} THEN 1 ELSE 0 END)
              AS BIGINT) AS s,
         CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ne,
         CAST(sum(n_chars) AS BIGINT) AS ch
  FROM d GROUP BY host
)
SELECT host, n_docs,
       (s * {PPM}) // n_docs AS short_ppm,
       (ne * {PPM}) // n_docs AS nonen_ppm,
       ch // n_docs AS avg_chars,
       CASE WHEN (s * {PPM}) // n_docs > {REP_SHORT_MAX_PPM} THEN 'block'
            WHEN (ne * {PPM}) // n_docs > {REP_NONEN_REVIEW_PPM} THEN 'review'
            ELSE 'allow' END AS verdict
FROM agg"""


NEW_DOC_OFFSET = 1_000_000_000


def sql_incremental_neardups() -> str:
    """Twin of operators/textdedup.lsh_match_new: new-batch docs (derived
    closed-form from documents) probed against the full-corpus LSH band
    index; near-dup twins carry an appended tail, decoys are rewrites."""
    # shingle/sig/band CTEs come from the shared helpers (src=all_docs)
    # so the rules can never diverge from the other minhash oracles
    sig_cte = _minhash_sig_cte(NGRAM_N, MINHASH_HASHES, src="all_docs")
    assert sig_cte.startswith("\nWITH ")
    return f"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {NEW_DOC_OFFSET},
         CASE WHEN doc_id % 10 = 0 THEN text || ' extra tail'
              ELSE 'zz ' || CAST(doc_id AS VARCHAR) || ' qq' END
  FROM documents WHERE doc_id % 5 = 0
),
{sig_cte.replace("WITH ", "", 1).lstrip()},
bt AS ({_band_selects_union()}),
cb AS (
  SELECT bt.* FROM bt
  JOIN (SELECT band_idx, band_hash FROM bt WHERE doc_id < {NEW_DOC_OFFSET}
        GROUP BY band_idx, band_hash
        HAVING count(*) <= {LSH_HOT_BUCKET_MAX}) keep
    USING (band_idx, band_hash)
  WHERE doc_id < {NEW_DOC_OFFSET}
)
SELECT nb.doc_id, min(cb.doc_id) AS match_id,
       CAST(count(*) AS BIGINT) AS n_hits
FROM bt nb JOIN cb
  ON nb.band_idx = cb.band_idx AND nb.band_hash = cb.band_hash
WHERE nb.doc_id >= {NEW_DOC_OFFSET}
GROUP BY nb.doc_id"""


def sql_quantize_embeddings() -> str:
    """Twin of operators/similarity.quantize_embeddings — same per-dim
    max-abs scales, same floor(x*127/m) double arithmetic. The qvec
    array is emitted as a CSV string (array_to_string) because the
    driver canonicalizer only sorts scalar columns (VERDICT r4 #2)."""
    from crawler_spark.operators.similarity import EMBED_DIM, QUANT_LEVELS

    return f"""
WITH dm AS (
  SELECT i, max(abs(CAST(embedding[i] AS DOUBLE))) AS m
  FROM embeddings CROSS JOIN
       (SELECT CAST(range AS INTEGER) AS i FROM range(1, {EMBED_DIM + 1})) r
  GROUP BY i
),
mx AS (SELECT list(m ORDER BY i) AS ms FROM dm),
q AS (
  SELECT vec_id,
         list_transform(range(1, {EMBED_DIM + 1}), i ->
           CASE WHEN ms[i] = 0
                THEN 0
                ELSE CAST(floor(CAST(embedding[i] AS DOUBLE) * {QUANT_LEVELS}
                                / ms[i]) AS INTEGER) END) AS qvec
  FROM embeddings CROSS JOIN mx
)
SELECT vec_id,
       array_to_string(qvec, ',') AS qvec_csv,
       CAST(list_aggregate(list_transform(qvec, x -> abs(x)), 'sum')
            AS BIGINT) AS l1
FROM q"""


def sql_trap_detect() -> str:
    """Twin of operators/trapdetect.trap_detect over the planted-trap
    URL synth. DuckDB regexp_replace needs the 'g' flag for the global
    digit/hex collapses (Spark's is global by default)."""
    from crawler_spark.operators.trapdetect import (
        PPM as TRAP_PPM,
        TRAP_MIN_URLS,
        TRAP_RATIO_PPM,
    )

    return f"""
WITH pages AS (
  SELECT CASE WHEN CAST(regexp_extract(source, '(\\d+)$', 1) AS INTEGER)
                   % 5 = 0 AND (doc_id // 20) % 3 <> 2
         THEN 'https://' || source || '.example.com/calendar/2026/'
              || CAST(doc_id % 12 + 1 AS VARCHAR) || '/day-'
              || CAST(doc_id AS VARCHAR)
         ELSE 'https://' || source || '.example.com/section-'
              || substr('abcdefghij', CAST((doc_id // 20) % 10 AS INTEGER) + 1, 1)
              || '/page-' || CAST(doc_id AS VARCHAR) END AS url,
         source || '.example.com' AS host
  FROM documents
),
t AS (
  SELECT host,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(url,
           '^[a-z][a-z0-9+.-]*://[^/]*', ''),
           '\\?.*$', ''),
           '[0-9a-fA-F]{{8,}}', 'H', 'g'),
           '[0-9]+', 'N', 'g') AS template
  FROM pages
),
counts AS (
  SELECT host, template, CAST(count(*) AS BIGINT) AS n_urls
  FROM t GROUP BY host, template
),
m AS (
  SELECT host, CAST(sum(n_urls) AS BIGINT) // count(*) AS mean_n
  FROM counts GROUP BY host
)
SELECT c.host, c.template, c.n_urls, m.mean_n,
       (c.n_urls * {TRAP_PPM}) // m.mean_n AS ratio_ppm,
       (c.n_urls * {TRAP_PPM}) // m.mean_n >= {TRAP_RATIO_PPM} AS is_trap
FROM counts c JOIN m ON c.host = m.host
WHERE c.n_urls >= {TRAP_MIN_URLS}"""


def _link_edges_ctes() -> str:
    """nn/nd/e CTEs: the closed-form synthetic link graph (twin of
    linkgraph.synth_link_graph) — shared by the pagerank and host-graph
    oracles."""
    from crawler_spark.operators.linkgraph import (
        LINK_MAX_DEG,
        LINK_MULT,
        LINK_STEP,
    )

    return f"""
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
nd AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents),
e AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src,
           (src * {LINK_MULT} + {LINK_STEP} * k) % (SELECT n FROM nn) AS dst
    FROM (SELECT node AS src,
                 unnest(range(1, node % {LINK_MAX_DEG} + 2)) AS k
          FROM nd)
  ) WHERE src <> dst
)"""


def sql_host_link_summary() -> str:
    """Twin of operators/linkgraph.host_link_summary over the synthetic
    link graph, hosts resolved through the documents table itself."""
    from crawler_spark.operators.linkgraph import HOSTGRAPH_TOPK

    return f"""
WITH {_link_edges_ctes()},
hosts AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                 source || '.example.com' AS host
          FROM documents),
agg AS (
  SELECT hs.host AS src_host, ht.host AS dst_host,
         CAST(count(*) AS BIGINT) AS n_links
  FROM e JOIN hosts hs ON e.src = hs.doc_id
         JOIN hosts ht ON e.dst = ht.doc_id
  WHERE hs.host <> ht.host
  GROUP BY hs.host, ht.host
)
SELECT src_host, dst_host, n_links, rk FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY src_host ORDER BY n_links DESC, dst_host ASC) AS BIGINT)
    AS rk
  FROM agg
) WHERE rk <= {HOSTGRAPH_TOPK}"""


def sql_cuckoo_unseen() -> str:
    """Twin of the cuckoo-filter unseen query: the filter is an
    accelerator whose probe+exact-confirm output must equal the plain
    NOT-IN anti-join (unseen = doc_id%3==0 ∪ the retracted %9==1 band),
    so the oracle is the set algebra, not the filter."""
    return """
SELECT source, CAST(count(*) AS BIGINT) AS n_unseen
FROM documents
WHERE doc_id % 3 = 0 OR doc_id % 9 = 1
GROUP BY source"""


def sql_cuckoo_retract_cycle() -> str:
    """Twin of the cuckoo build→retract→re-admit lifecycle query: at
    every phase the probe+exact-confirm unseen set must equal the plain
    anti-join against that phase's exact seen table, so the oracle is
    pure set algebra on the doc_id bands — built: unseen = %3==0;
    retracted: plus the %9==1 band; re-admitted: minus the %18==1
    half of it (i.e. plus only %18==10)."""
    return """
SELECT source,
       CAST(count(*) FILTER (WHERE doc_id % 3 = 0) AS BIGINT)
         AS n_unseen_built,
       CAST(count(*) FILTER (WHERE doc_id % 3 = 0 OR doc_id % 9 = 1)
            AS BIGINT) AS n_unseen_retracted,
       CAST(count(*) FILTER (WHERE doc_id % 3 = 0 OR doc_id % 18 = 10)
            AS BIGINT) AS n_unseen_readmitted
FROM documents
GROUP BY source"""


def sql_cogroup_probe_unseen() -> str:
    """Twin of the forced-cogroup probe query: both filter forms'
    probe+confirm paths must reproduce the plain anti-join, so the
    oracle is the set algebra (unseen = the doc_id%4==0 band) for both
    output columns."""
    return """
SELECT source,
       CAST(count(*) FILTER (WHERE doc_id % 4 = 0) AS BIGINT)
         AS n_unseen_bloom_cogroup,
       CAST(count(*) FILTER (WHERE doc_id % 4 = 0) AS BIGINT)
         AS n_unseen_cuckoo_cogroup
FROM documents
GROUP BY source"""


def sql_politeness_equivalence() -> str:
    """Twin of the budget↔multiset equivalence artifact: the token
    bucket's per-round admitted multiset is closed-form — a URL with
    per-host rank r in (priority desc, surt asc) order is admitted in
    round ceil(r/B), B = burst + rate·round_duration = 5 + 2.0·2.0 = 9
    (reference config.py:11-12); 0 = still deferred after 4 rounds.
    The Spark side runs the actual iterative admit loop."""
    from crawler_spark.config import PolitenessConfig

    b = PolitenessConfig(round_duration_s=2.0).budget_per_round
    return f"""
WITH c AS (
  SELECT doc_id,
         'site' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' AS host,
         CAST(doc_id % 5 AS INTEGER) AS priority,
         'com,example,site' || CAST(doc_id % 7 AS VARCHAR) || ')/p/'
           || CAST(doc_id AS VARCHAR) AS surt
  FROM documents
),
r AS (
  SELECT doc_id, host,
         row_number() OVER (
           PARTITION BY host ORDER BY priority DESC, surt ASC) AS rk
  FROM c
)
SELECT doc_id, host,
       CAST(CASE WHEN (rk + {b - 1}) // {b} <= 4
                 THEN (rk + {b - 1}) // {b} ELSE 0 END AS INTEGER)
         AS round_admitted
FROM r"""


def sql_anchor_terms() -> str:
    """Twin of operators/anchortext.anchor_terms_topk over the
    closed-form anchored link graph."""
    from crawler_spark.operators.anchortext import ANCHOR_TOPK, ANCHOR_VOCAB

    vocab = "[" + ", ".join(f"'{w}'" for w in ANCHOR_VOCAB) + "]"
    nv = len(ANCHOR_VOCAB)
    return f"""
WITH {_link_edges_ctes()},
ae AS (
  SELECT dst,
         {vocab}[CAST((src + dst) % {nv} AS INTEGER) + 1] || ' ' ||
         {vocab}[CAST((dst * 3 + src) % {nv} AS INTEGER) + 1] AS anchor
  FROM e
),
terms AS (SELECT dst, unnest(string_split(anchor, ' ')) AS term FROM ae),
agg AS (SELECT dst, term, CAST(count(*) AS BIGINT) AS n_refs
        FROM terms GROUP BY dst, term)
SELECT dst, term, n_refs, rk FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY dst ORDER BY n_refs DESC, term ASC) AS BIGINT) AS rk
  FROM agg
) WHERE rk <= {ANCHOR_TOPK}"""


def sql_registrable_rollup() -> str:
    """Twin of the registrable-domain rollup: same PSL-lite suffix set,
    regex form (synth hosts always carry >=3 labels, so the 2-label
    fallback branch of the Spark CASE is exercised by pytest, not here)."""
    from crawler_spark.functions.url import TWO_LEVEL_SUFFIXES

    suf = ", ".join(f"'{s}'" for s in TWO_LEVEL_SUFFIXES)
    return f"""
WITH h AS (
  SELECT 'sub' || CAST(doc_id % 3 AS VARCHAR) || '.' || source || '.' ||
         ['com','co.uk','org','com.au','de','co.jp'][
           CAST(CAST(regexp_extract(source, '(\\d+)$', 1) AS INTEGER) % 6
                AS INTEGER) + 1] AS host
  FROM documents
),
r AS (
  SELECT host,
         CASE WHEN regexp_extract(host, '([^.]+\\.[^.]+)$', 1) IN ({suf})
              THEN regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+)$', 1)
              ELSE regexp_extract(host, '([^.]+\\.[^.]+)$', 1) END AS registrable
  FROM h
)
SELECT registrable, CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
       CAST(count(*) AS BIGINT) AS n_urls
FROM r GROUP BY registrable"""


def sql_redirect_rollup() -> str:
    """Twin of operators/redirects.redirects_over_documents: DuckDB
    walks the chains with a hop-capped recursive CTE (the sequential
    formulation the pointer-doubling join replaces); same 32-hop cap."""
    return """
WITH RECURSIVE e AS (
  SELECT 'https://r.example.com/u/' || CAST(doc_id AS VARCHAR) AS src,
         'https://r.example.com/u/' ||
         CAST(CASE WHEN doc_id % 100 = 55 THEN doc_id + 2
                   WHEN doc_id % 100 = 57 THEN doc_id - 2
                   ELSE doc_id - 1 END AS VARCHAR) AS dst
  FROM documents WHERE doc_id % 10 <> 0
),
walk AS (
  SELECT src AS url, dst AS cur, CAST(1 AS BIGINT) AS hops FROM e
  UNION ALL
  SELECT w.url, e2.dst, w.hops + 1 FROM walk w JOIN e e2 ON w.cur = e2.src
  WHERE w.hops < 32
),
resolved AS (
  SELECT url, cur AS final_url, hops FROM walk
  WHERE cur NOT IN (SELECT src FROM e)
)
SELECT hops, unresolved, CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT final_url) AS BIGINT) AS n_targets
FROM (
  SELECT url, final_url, hops, false AS unresolved FROM resolved
  UNION ALL
  SELECT src AS url, NULL AS final_url, NULL AS hops, true AS unresolved
  FROM e WHERE src NOT IN (SELECT url FROM resolved)
)
GROUP BY hops, unresolved"""


def sql_sitemap_parse() -> str:
    """Twin of sources/sitemap: the oracle derives the entry SET
    closed-form, so the Spark side must genuinely parse the XML it
    generated to match."""
    return """
SELECT source || '.example.com' AS host,
       'https://' || source || '.example.com/p/' || CAST(doc_id AS VARCHAR)
         AS loc,
       CASE WHEN doc_id % 2 = 1
            THEN '2026-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
       END AS lastmod,
       CAST(CASE WHEN doc_id % 3 = 0 THEN (doc_id % 9 + 1) * 100000
                 ELSE 500000 END AS BIGINT) AS priority_ppm
FROM documents"""


def _mix_plan_ctes() -> str:
    """stats→p CTE chain of the mix plan — shared by the plan and
    execution oracles."""
    from crawler_spark.operators.mixing import (
        MIX_BUDGET_TOKENS,
        PPM as MPPM,
        TAIL_SHIFT as SHIFT,
        TAIL_SHIFT_ABOVE as SHIFT_ABOVE,
    )

    b = MIX_BUDGET_TOKENS
    return f"""
stats AS (
  SELECT source AS stratum, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(regexp_extract_all(text, '{TOKEN_REGEX}'))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY source
),
raw AS (
  SELECT stratum,
         CAST(regexp_extract(stratum, '(\\d+)$', 1) AS BIGINT) % 7 + 1 AS w
  FROM stats
),
tot AS (SELECT CAST(sum(w) AS BIGINT) AS t, min(stratum) AS fst FROM raw),
wts AS (
  SELECT stratum,
         (w * {MPPM}) // (SELECT t FROM tot)
         + CASE WHEN stratum = (SELECT fst FROM tot)
                THEN {MPPM} - (SELECT CAST(sum((w * {MPPM}) // (SELECT t FROM tot)) AS BIGINT) FROM raw)
                ELSE 0 END AS weight_ppm
  FROM raw
),
j AS (
  SELECT coalesce(s.stratum, w.stratum) AS stratum,
         CAST(coalesce(s.n_docs, 0) AS BIGINT) AS n_docs,
         CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens,
         CAST(coalesce(w.weight_ppm, 0) AS BIGINT) AS weight_ppm,
         CAST(({b} // {MPPM}) * coalesce(w.weight_ppm, 0)
              + (({b} % {MPPM}) * coalesce(w.weight_ppm, 0)) // {MPPM}
              AS BIGINT) AS desired_tokens
  FROM stats s FULL OUTER JOIN wts w ON s.stratum = w.stratum
),
p AS (
  SELECT *,
         CAST(CASE WHEN n_tokens > 0 THEN desired_tokens // n_tokens
              ELSE 0 END AS BIGINT) AS full_epochs,
         CAST(CASE WHEN n_tokens <= 0 THEN 0
              WHEN n_tokens > {SHIFT_ABOVE}
              THEN (((desired_tokens % n_tokens) >> {SHIFT}) * {MPPM})
                   // (n_tokens >> {SHIFT})
              ELSE ((desired_tokens % n_tokens) * {MPPM}) // n_tokens
              END AS BIGINT) AS tail_rate_ppm
  FROM j
)"""


def sql_mix_plan() -> str:
    """Twin of operators/mixing.mix_over_documents: same integer-ppm
    arithmetic, weights normalized with the remainder pinned to the
    lexicographically-first stratum."""
    from crawler_spark.operators.mixing import PPM as MPPM

    return f"""
WITH {_mix_plan_ctes()}
SELECT stratum, n_docs, n_tokens, weight_ppm, desired_tokens,
       full_epochs, tail_rate_ppm,
       CAST(n_tokens * full_epochs + (n_tokens // {MPPM}) * tail_rate_ppm
            + ((n_tokens % {MPPM}) * tail_rate_ppm) // {MPPM}
            AS BIGINT) AS planned_tokens
FROM p"""


def sql_semdedup() -> str:
    """Twin of similarity.semdedup: same centroid assignment CTEs as
    the IVF oracle, within-cell lower-id pair drop, with the identical
    deterministic mega-cell sub-split (shard = vec_id % ceil(n/cap))."""
    from crawler_spark.operators.similarity import NEARDUP_COSINE, SEMDEDUP_MAX_CELL

    cos_ec = _sql_cosine("e.embedding", "c.centroid")
    cos_ab = _sql_cosine("a.embedding", "b.embedding")
    return f"""
WITH {_sql_cell_assign_ctes()},
a0 AS (SELECT e.vec_id, e.embedding, c.cell,
              row_number() OVER (PARTITION BY e.vec_id
                                 ORDER BY {cos_ec} DESC, c.cell ASC) AS rn
       FROM embeddings e CROSS JOIN c),
assigned AS (SELECT vec_id, embedding, cell FROM a0 WHERE rn = 1),
sh AS (SELECT cell,
              CAST(ceil(count(*) / {float(SEMDEDUP_MAX_CELL)}) AS BIGINT) AS nsh
       FROM assigned GROUP BY cell),
sub AS (SELECT s.*, CAST(s.vec_id AS BIGINT) % sh.nsh AS shard
        FROM assigned s JOIN sh USING (cell)),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM sub a JOIN sub b
    ON a.cell = b.cell AND a.shard = b.shard AND a.vec_id < b.vec_id
  WHERE round({cos_ab}, 4) >= {NEARDUP_COSINE}
)
SELECT s.vec_id, s.cell, d.vec_id IS NULL AS is_kept
FROM assigned s LEFT JOIN dropped d USING (vec_id)"""


def _revisit_caps_cte() -> str:
    """Capture store WITH planted revisits (twin of
    operators/revisit.synth_revisit_captures): even docs' k=2 capture
    repeats the k=0 digest. Delegates to the shared _capture_base."""
    return _capture_base(
        dk="CASE WHEN doc_id % 2 = 0 AND k = 2 THEN 0 ELSE k END",
        with_bytes=True,
    )


def sql_revisit_rollup() -> str:
    """Twin of operators/revisit.revisit_savings."""
    return f"""
WITH {_revisit_caps_cte()},
m AS (
  SELECT *, row_number() OVER (PARTITION BY url, digest ORDER BY ts) > 1
         AS is_revisit
  FROM caps
)
SELECT host, CAST(count(*) AS BIGINT) AS n_captures,
       CAST(sum(CASE WHEN is_revisit THEN 1 ELSE 0 END) AS BIGINT)
         AS n_revisits,
       CAST(sum(CASE WHEN NOT is_revisit THEN n_bytes ELSE 0 END) AS BIGINT)
         AS bytes_stored,
       CAST(sum(CASE WHEN is_revisit THEN n_bytes ELSE 0 END) AS BIGINT)
         AS bytes_saved
FROM m GROUP BY host"""


def sql_sitemap_recrawl() -> str:
    """Twin of operators/revisit.sitemap_staleness over the closed-form
    sitemap rows + revisit capture store."""
    return f"""
WITH {_revisit_caps_cte()},
sm AS (
  SELECT source || '.example.com' AS host,
         'https://' || source || '.example.com/p/' || CAST(doc_id AS VARCHAR)
           AS loc,
         CASE WHEN doc_id % 2 = 1
              THEN '2026-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
         END AS lastmod
  FROM documents
),
latest AS (SELECT url AS loc, max(ts) AS last_ts FROM caps GROUP BY url),
j AS (SELECT sm.*, l.last_ts FROM sm LEFT JOIN latest l USING (loc))
SELECT host, CAST(count(*) AS BIGINT) AS n_listed,
       CAST(sum(CASE WHEN last_ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_uncaptured,
       CAST(sum(CASE WHEN last_ts IS NOT NULL AND lastmod IS NOT NULL
                      AND CAST(lastmod AS DATE) > CAST(last_ts AS DATE)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_stale,
       CAST(sum(CASE WHEN lastmod IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unknown
FROM j GROUP BY host"""


def sql_shuffle_layout() -> str:
    """Twin of operators/shardshuffle.shuffle_over_documents: md5-keyed
    deterministic shuffle, same hex-digit shard map."""
    from crawler_spark.operators.shardshuffle import HEX, SHUFFLE_SEED

    k = f"md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR))"
    return f"""
WITH lay AS (
  SELECT doc_id, {k} AS k,
         CAST(instr('{HEX}', substr({k}, 1, 1)) - 1 AS INTEGER) AS shard
  FROM documents
),
p AS (
  SELECT doc_id, shard,
         CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
              AS BIGINT) AS pos
  FROM lay
)
SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(pos * doc_id) AS BIGINT) AS pos_dot_id,
       CAST(min(doc_id) AS BIGINT) AS first_id
FROM p GROUP BY shard"""


def sql_main_text() -> str:
    """Twin of operators/justext.extract_main_text: same fixed-block
    segmentation, stopword density gate, and lag/lead context rule."""
    from crawler_spark.operators.justext import (
        BLOCK_WORDS as BW,
        GOOD_STOP_PM as GPM,
        LEN_LOW as LL,
        STOPWORDS,
    )

    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH w0 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
b AS (
  SELECT doc_id, CAST(i AS INTEGER) AS pos,
         array_to_string(ws[(i * {BW} + 1):(i * {BW} + {BW})], ' ') AS block
  FROM w0, unnest(range(CAST(ceil(len(ws) / {BW}.0) AS BIGINT))) AS t(i)
),
c AS (
  SELECT doc_id, pos, block,
         len(string_split(block, ' ')) AS n_words,
         len(list_filter(string_split(block, ' '),
             w -> list_contains([{sw}], w))) AS n_stop
  FROM b
),
d AS (
  SELECT doc_id, pos, block, CAST(n_words AS INTEGER) AS n_words,
         CAST((n_stop * 1000000) // n_words AS BIGINT) AS stop_pm,
         CASE WHEN n_words < {LL} THEN 'short'
              WHEN (n_stop * 1000000) // n_words >= {GPM} THEN 'good'
              ELSE 'bad' END AS cls
  FROM c
),
e AS (
  SELECT *, CASE WHEN cls = 'short' THEN
              CASE WHEN lag(cls) OVER w = 'good' OR lead(cls) OVER w = 'good'
                   THEN 'good' ELSE 'bad' END
            ELSE cls END AS final_cls
  FROM d WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(sum(CASE WHEN final_cls = 'good' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_good,
       CAST(sum(CASE WHEN final_cls = 'bad' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bad,
       CAST(sum(CASE WHEN cls = 'short' AND final_cls = 'good'
                THEN 1 ELSE 0 END) AS BIGINT) AS n_promoted,
       coalesce(string_agg(CASE WHEN final_cls = 'good' THEN block END,
                           ' ' ORDER BY pos), '') AS main_text
FROM e GROUP BY doc_id"""


def sql_politeness_audit() -> str:
    """Twin of operators/crawlreport.politeness_compliance over the
    per-user synthetic host mapping and closed-form crawl delays."""
    viol = ("CASE WHEN gap_us IS NOT NULL AND gap_us < crawl_delay_s * 1000000 "
            "THEN 1 ELSE 0 END")
    return f"""
WITH f AS (
  SELECT 'h' || CAST(user_id AS VARCHAR) AS host, event_id, epoch_us(ts) AS us
  FROM events
),
g AS (
  SELECT host, event_id, us,
         us - lag(us) OVER (PARTITION BY host ORDER BY us, event_id) AS gap_us
  FROM f
),
d AS (
  SELECT host,
         CAST(CAST(regexp_extract(host, '(\\d+)$', 1) AS BIGINT) % 5 + 1
              AS BIGINT) AS crawl_delay_s
  FROM (SELECT DISTINCT host FROM f)
),
j AS (SELECT g.*, d.crawl_delay_s FROM g JOIN d USING (host))
SELECT host, crawl_delay_s, CAST(count(*) AS BIGINT) AS n_fetches,
       CAST(count(gap_us) AS BIGINT) AS n_intervals,
       CAST(sum({viol}) AS BIGINT) AS n_violations,
       CAST(min(gap_us) AS BIGINT) AS min_gap_us,
       CAST(CASE WHEN count(gap_us) > 0
            THEN ((count(gap_us) - sum({viol})) * 1000000) // count(gap_us)
            ELSE 1000000 END AS BIGINT) AS compliance_ppm
FROM j GROUP BY host, crawl_delay_s"""


def sql_mix_execute() -> str:
    """Twin of operators/mixing.mix_execute_over_documents: the SQL side
    multiplies by the copy count instead of exploding — same numbers."""
    from crawler_spark.functions.texthash import HEX_DIGITS as MHEX
    from crawler_spark.operators.mixing import (
        HASH_SPACE,
        MIX_SEED,
        PPM as MPPM,
    )

    h = f"md5('{MIX_SEED}:' || CAST(doc_id AS VARCHAR))"
    v = "0"
    for i in range(6):
        v = f"({v}) * 16 + (instr('{MHEX}', substr({h}, {i + 1}, 1)) - 1)"
    return f"""
WITH {_mix_plan_ctes()},
plan2 AS (
  SELECT stratum, full_epochs, tail_rate_ppm,
         CAST(n_tokens * full_epochs + (n_tokens // {MPPM}) * tail_rate_ppm
              + ((n_tokens % {MPPM}) * tail_rate_ppm) // {MPPM}
              AS BIGINT) AS planned_tokens
  FROM p
),
doc AS (
  SELECT source AS stratum, doc_id,
         CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS BIGINT) AS tok,
         CAST({v} AS BIGINT) AS hu
  FROM documents
),
c AS (
  SELECT d.stratum, d.tok,
         p2.full_epochs
         + CASE WHEN d.hu * {MPPM} < p2.tail_rate_ppm * {HASH_SPACE}
                THEN 1 ELSE 0 END AS copies
  FROM doc d JOIN plan2 p2 USING (stratum)
),
e AS (
  SELECT stratum, CAST(sum(copies) AS BIGINT) AS n_emitted,
         CAST(sum(tok * copies) AS BIGINT) AS tokens_emitted
  FROM c WHERE copies > 0 GROUP BY stratum
)
SELECT p2.stratum, CAST(coalesce(e.n_emitted, 0) AS BIGINT) AS n_emitted,
       CAST(coalesce(e.tokens_emitted, 0) AS BIGINT) AS tokens_emitted,
       p2.planned_tokens
FROM plan2 p2 LEFT JOIN e USING (stratum)"""


def sql_robots_sitemaps() -> str:
    """Twin of the robots sitemap-discovery query: the oracle derives
    counts/URLs arithmetically from the same closed form."""
    return """
SELECT doc_id,
       'h' || CAST(doc_id % 50 AS VARCHAR) AS host,
       CAST(CASE (doc_id % 50) % 3 WHEN 0 THEN 0 WHEN 1 THEN 1 ELSE 2 END
            AS INTEGER) AS n_sitemaps,
       CASE WHEN (doc_id % 50) % 3 >= 1
            THEN 'https://h' || CAST(doc_id % 50 AS VARCHAR) || '.example/s1.xml'
       END AS first_sitemap
FROM documents"""


def sql_ngram_lm_counts() -> str:
    """Twin of operators/ngramlm.py: 1..3-gram counts, tail pruned at
    cnt ≥ prune_min for n ≥ 2, backoff context counts via the adjacent
    order, rf_pm = cnt*1000 div ctx in exact integer per-mille. Same
    bare space split and (start, width) slice arithmetic as Spark."""
    from crawler_spark.operators.ngramlm import NGRAM_PRUNE_MIN, RF_SCALE

    p = NGRAM_PRUNE_MIN
    return f"""
WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
c1 AS (SELECT gram, CAST(count(*) AS BIGINT) AS cnt
       FROM (SELECT unnest(ws) AS gram FROM w) GROUP BY gram),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM c1),
o1 AS (SELECT 1 AS n, gram, cnt, (SELECT t FROM tot) AS ctx_cnt FROM c1),
g2 AS (SELECT array_to_string(ws[i : i + 1], ' ') AS gram, ws[i] AS prefix
       FROM w, unnest(generate_series(1, len(ws) - 1)) AS s(i)),
c2 AS (SELECT gram, prefix, CAST(count(*) AS BIGINT) AS cnt
       FROM g2 GROUP BY gram, prefix HAVING count(*) >= {p}),
o2 AS (SELECT 2 AS n, c2.gram, c2.cnt, c1.cnt AS ctx_cnt
       FROM c2 JOIN c1 ON c2.prefix = c1.gram),
g3 AS (SELECT array_to_string(ws[i : i + 2], ' ') AS gram,
              array_to_string(ws[i : i + 1], ' ') AS prefix
       FROM w, unnest(generate_series(1, len(ws) - 2)) AS s(i)),
c3 AS (SELECT gram, prefix, CAST(count(*) AS BIGINT) AS cnt
       FROM g3 GROUP BY gram, prefix HAVING count(*) >= {p}),
o3 AS (SELECT 3 AS n, c3.gram, c3.cnt, c2.cnt AS ctx_cnt
       FROM c3 JOIN c2 ON c3.prefix = c2.gram),
u AS (SELECT * FROM o1 UNION ALL SELECT * FROM o2 UNION ALL SELECT * FROM o3)
SELECT CAST(n AS INT) AS n, gram, cnt, ctx_cnt,
       (cnt * {RF_SCALE}) // ctx_cnt AS rf_pm
FROM u"""


def sql_cms_heavy_hitters() -> str:
    """Twin of operators/sketches.py: the count-min sketch rebuilt
    counter-for-counter (same seeded md5 row hashes), point-queried
    with min-over-rows, top-k by (est desc, key asc)."""
    from crawler_spark.operators.sketches import (
        CMS_DEPTH,
        CMS_SEED_BASE,
        CMS_WIDTH,
        HH_TOPK,
    )

    col = (
        "CAST(('0x' || substr(md5('s' || CAST({base} + j AS VARCHAR)"
        " || ':' || key), 1, 15)) AS BIGINT) % {w}"
    ).format(base=CMS_SEED_BASE, w=CMS_WIDTH)
    return f"""
WITH k AS (SELECT CAST(user_id AS VARCHAR) AS key FROM events),
js AS (SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS j),
pairs AS (SELECT j, {col} AS col FROM k, js),
sketch AS (SELECT j AS r, col, CAST(count(*) AS BIGINT) AS c
           FROM pairs GROUP BY j, col),
dk AS (SELECT DISTINCT key FROM k),
probe AS (SELECT key, j, {col} AS col FROM dk, js),
est AS (SELECT key, CAST(min(c) AS BIGINT) AS est
        FROM probe JOIN sketch ON probe.j = sketch.r
                              AND probe.col = sketch.col
        GROUP BY key),
exact AS (SELECT key, CAST(count(*) AS BIGINT) AS exact
          FROM k GROUP BY key)
SELECT key, est, exact, est - exact AS overcount
FROM est JOIN exact USING (key)
ORDER BY est DESC, key ASC LIMIT {HH_TOPK}"""


def sql_hashed_quality() -> str:
    """Twin of operators/qualitylinear.py: the deterministic stand-in
    weight table regenerated from the same hash family, hashing-trick
    feature map, integer per-mille mean (both engines truncate toward
    zero on negative div — verified)."""
    from crawler_spark.operators.qualitylinear import (
        QL_BUCKETS,
        QL_WEIGHT_RANGE,
    )

    return f"""
WITH wt AS (
  SELECT b AS bucket,
         ({sql_h64("'qw:' || CAST(b AS VARCHAR)")} % {QL_WEIGHT_RANGE})
           - 1000 AS w_ppm
  FROM (SELECT unnest(generate_series(0, {QL_BUCKETS - 1})) AS b)
),
t AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
      FROM documents),
ft AS (SELECT doc_id, source,
              {sql_h64("'q:' || token")} % {QL_BUCKETS} AS bucket
       FROM t WHERE token <> ''),
s AS (SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(w_ppm) AS BIGINT) AS sw
      FROM ft JOIN wt USING (bucket) GROUP BY doc_id, source)
SELECT doc_id, source, n_tokens, sw // n_tokens AS score_ppm,
       CASE WHEN sw // n_tokens >= 0 THEN 'keep' ELSE 'drop' END AS label
FROM s"""


def sql_hll_distinct() -> str:
    """Twin of operators/hll.py: the HyperLogLog register table rebuilt
    register-for-register (same md5 hash, same bin()-based rank), the
    scaled harmonic sum and the raw estimate in the identical exact
    int64 arithmetic; `//` matches Spark's `div` (both truncate toward
    zero — verified on negatives for err_pm)."""
    from crawler_spark.operators.hll import (
        HLL_ALPHA_PM,
        HLL_M,
        HLL_RHO_CAP,
        LC_RAW_MAX,
        LC_TABLE,
    )

    m, cap = HLL_M, HLL_RHO_CAP
    lc = "[" + ", ".join(str(x) for x in LC_TABLE) + "]"
    return f"""
WITH k AS (SELECT event_type AS key, CAST(user_id AS VARCHAR) AS value
           FROM events),
h AS (SELECT key,
             {sql_h64("'hll:' || value")} AS h
      FROM k),
r AS (SELECT key, h % {m} AS bucket,
             LEAST(CASE WHEN h // {m} = 0 THEN 53
                        ELSE 53 - length(bin(h // {m})) END,
                   {cap}) AS rho
      FROM h),
reg AS (SELECT key, bucket, max(rho) AS rho FROM r GROUP BY key, bucket),
s AS (SELECT key,
             CAST(sum(CAST(1 AS BIGINT) << ({cap} - rho)) AS BIGINT) AS sp,
             CAST(count(*) AS BIGINT) AS present
      FROM reg GROUP BY key),
raw AS (SELECT key, {m} - present AS zeros,
               (CAST({HLL_ALPHA_PM} AS BIGINT) * {m} * {m}
                * (CAST(1 AS BIGINT) << {cap}))
               // (1000 * (sp + ({m} - present)
                                * (CAST(1 AS BIGINT) << {cap}))) AS raw
        FROM s),
est AS (SELECT key,
               CASE WHEN zeros > 0 AND raw <= {LC_RAW_MAX}
                    THEN CAST(({lc})[zeros] AS BIGINT)
                    ELSE raw END AS est
        FROM raw),
exact AS (SELECT key, CAST(count(DISTINCT value) AS BIGINT) AS exact
          FROM k GROUP BY key)
SELECT key, est, exact, ((est - exact) * 1000) // exact AS err_pm
FROM est JOIN exact USING (key)"""


def sql_bucketed_join() -> str:
    """Twin of __spark_entry__._q_bucketed_join: the plain
    customer-orders equi-join + per-customer rollup. The Spark side
    routes both tables through a bucketed (bucketBy + sortBy)
    round-trip so the join AND the aggregation run with zero shuffle
    exchanges — the values must be identical to this direct form."""
    return """
SELECT c_custkey AS custkey, c_name,
       CAST(count(*) AS BIGINT) AS order_cnt,
       round(sum(o_totalprice), 2) AS total_price
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name"""


def sql_inverted_index() -> str:
    """Twin of operators/invindex.py: direct per-term min-K (no salting
    needed at oracle scale — the salted two-phase is output-identical
    by construction, which is exactly what this twin verifies)."""
    from crawler_spark.operators.invindex import INV_HEAD_K, INV_MIN_DF

    return f"""
WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
           FROM documents),
td AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
       FROM t WHERE term <> '' GROUP BY term, doc_id),
stats AS (SELECT term, CAST(count(*) AS BIGINT) AS df,
                 CAST(sum(tf) AS BIGINT) AS cnt
          FROM td GROUP BY term),
r AS (SELECT term, doc_id,
             row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
      FROM td),
head AS (SELECT term, list(doc_id ORDER BY doc_id) AS postings_head
         FROM r WHERE rn <= {INV_HEAD_K} GROUP BY term)
SELECT term, df, cnt,
       array_to_string(postings_head, ',') AS postings_csv
FROM stats JOIN head USING (term)
WHERE df >= {INV_MIN_DF}"""


def sql_bm25_topk() -> str:
    """Twin of operators/retrieval.bm25_topk: the same exact-integer
    BM25 (k1=6/5, b=3/4 as rationals, ‰ scaling, log-free idf
    surrogate) — `div` on the Spark side ≡ `//` here, all operands
    non-negative."""
    from crawler_spark.operators.retrieval import BM25_QUERY, BM25_TOP_K

    terms = ", ".join(f"'{t}'" for t in BM25_QUERY)
    return f"""
WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
           FROM documents),
tk AS (SELECT doc_id, term FROM t WHERE term <> ''),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
       FROM tk GROUP BY doc_id),
tot AS (SELECT CAST(sum(dl) AS BIGINT) AS sumdl,
               CAST(count(*) AS BIGINT) AS n_docs FROM dl),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM tk WHERE term IN ({terms}) GROUP BY doc_id, term),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
sc AS (SELECT tf.doc_id,
              (1000 * (n_docs - df + 1)) // (df + 1) AS idf_pm,
              (22000000 * tf)
                // (10000 * tf + 3000 + 9 * ((dl.dl * 1000 * n_docs) // sumdl))
                AS tf_part_pm
       FROM tf JOIN df USING (term) JOIN dl USING (doc_id), tot)
SELECT doc_id, CAST(count(*) AS BIGINT) AS terms_matched,
       CAST(sum(idf_pm * tf_part_pm) AS BIGINT) AS score_pm
FROM sc GROUP BY doc_id
ORDER BY score_pm DESC, doc_id ASC
LIMIT {BM25_TOP_K}"""


def sql_priority_sample() -> str:
    """Twin of operators/sampling.priority_sample (Duffield–Lund–Thorup):
    u from the shared seeded-md5 hex prefix, priority and the max(w, τ)
    estimator in exact int64 per-mille."""
    from crawler_spark.functions.texthash import HEX_DIGITS as PHEX
    from crawler_spark.operators.sampling import (
        PRIORITY_SAMPLE_K,
        PRIORITY_SEED,
        _PRI_SCALE,
    )

    h = f"md5('{PRIORITY_SEED}:' || CAST(doc_id AS VARCHAR))"
    v = "0"
    for i in range(6):
        v = f"({v}) * 16 + (instr('{PHEX}', substr({h}, {i + 1}, 1)) - 1)"
    k = PRIORITY_SAMPLE_K
    return f"""
WITH w AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
                  CAST({v} AS BIGINT) + 1 AS u
           FROM documents),
p AS (SELECT doc_id, weight,
             CAST((weight * {_PRI_SCALE}) // u AS BIGINT) AS priority_pm
      FROM w),
topk1 AS (SELECT * FROM p
          ORDER BY priority_pm DESC, doc_id ASC LIMIT {k + 1}),
tau AS (SELECT CAST(CASE WHEN count(*) > {k} THEN min(priority_pm)
                    ELSE 0 END AS BIGINT) AS tau_pm FROM topk1),
s AS (SELECT * FROM topk1 ORDER BY priority_pm DESC, doc_id ASC LIMIT {k})
SELECT s.doc_id, s.weight, s.priority_pm,
       CAST(greatest(s.weight * 1000, tau.tau_pm) AS BIGINT) AS est_w_pm
FROM s, tau"""


def sql_fair_budget() -> str:
    """Twin of operators/fairshare.fair_budget: water-filling over
    distinct demand levels, integer θ/remainder, lexicographic +1s.
    The Spark side collects θ and r as driver scalars; this twin
    derives them in-query — same values by construction."""
    from crawler_spark.operators.fairshare import FAIR_BUDGET as B

    return f"""
WITH h AS (SELECT 'h' || CAST(doc_id % 97 AS VARCHAR) AS host,
                  CAST(count(*) AS BIGINT) AS demand
           FROM documents GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM h),
lv AS (SELECT demand AS v, CAST(count(*) AS BIGINT) AS cnt
       FROM h GROUP BY demand),
cum AS (SELECT v,
               CAST(sum(v * cnt) OVER (ORDER BY v) AS BIGINT) AS below,
               CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cumcnt
        FROM lv),
s AS (SELECT v, below + v * (n - cumcnt) AS sv, n - cumcnt AS above_cnt
      FROM cum, tot),
best AS (SELECT v, sv, above_cnt FROM s WHERE sv <= {B}
         ORDER BY v DESC LIMIT 1),
base AS (SELECT coalesce(max(v), 0) AS v0, coalesce(max(sv), 0) AS s0,
                coalesce(max(above_cnt), (SELECT max(n) FROM tot)) AS ac
         FROM best),
th AS (SELECT CASE WHEN ac > 0 THEN v0 + ({B} - s0) // ac
              ELSE v0 END AS theta,
              CASE WHEN ac > 0 THEN ({B} - s0) % ac ELSE 0 END AS r
       FROM base),
bon AS (SELECT host, row_number() OVER (ORDER BY host) AS rn
        FROM h, th WHERE demand > theta)
SELECT h.host, h.demand,
       CAST(least(h.demand, th.theta)
            + CASE WHEN bon.rn IS NOT NULL AND bon.rn <= th.r
                   THEN 1 ELSE 0 END AS BIGINT) AS granted,
       CAST(th.theta AS BIGINT) AS water_level
FROM h CROSS JOIN th LEFT JOIN bon USING (host)"""


def sql_hits_scores() -> str:
    """Integer fixed-point HITS, half-steps unrolled as chained CTEs
    (twin of operators/linkgraph.hits). Every value BIGINT, every
    normalization the identical 10^3/10^6 split division; `//` matches
    `div` on the all-non-negative operands."""
    from crawler_spark.operators.linkgraph import (
        HITS_ITERATIONS,
        HITS_SCALE,
    )

    def norm(raw: str, tot: str, out: str) -> str:
        return (
            f"coalesce({raw}.s, 0) * 1000 // "
            f"greatest(coalesce({tot}.tot, 0) // 1000000, 1) AS {out}"
        )

    iters = []
    for i in range(1, HITS_ITERATIONS + 1):
        iters.append(f"""
ar{i} AS (SELECT e.dst AS node, CAST(sum(h.hub) AS BIGINT) AS s
          FROM e JOIN h{i - 1} h ON h.node = e.src GROUP BY e.dst),
at{i} AS (SELECT CAST(sum(s) AS BIGINT) AS tot FROM ar{i}),
a{i} AS (SELECT nd.node, {norm("ar", f"at{i}", "auth")}
         FROM nd LEFT JOIN ar{i} ar USING (node), at{i}),
hr{i} AS (SELECT e.src AS node, CAST(sum(a.auth) AS BIGINT) AS s
          FROM e JOIN a{i} a ON a.node = e.dst GROUP BY e.src),
ht{i} AS (SELECT CAST(sum(s) AS BIGINT) AS tot FROM hr{i}),
h{i} AS (SELECT nd.node, {norm("hr", f"ht{i}", "hub")}
         FROM nd LEFT JOIN hr{i} hr USING (node), ht{i})""")
    return f"""
WITH {_link_edges_ctes()},
h0 AS (SELECT node, CAST({HITS_SCALE} AS BIGINT) AS hub FROM nd),{",".join(iters)}
SELECT a.node AS doc_id, CAST(a.auth AS BIGINT) AS auth_ppb,
       CAST(h.hub AS BIGINT) AS hub_ppb
FROM a{HITS_ITERATIONS} a JOIN h{HITS_ITERATIONS} h USING (node)"""


def sql_hll_union_rollup() -> str:
    """Twin of operators/hll.hll_union_report: per-group registers,
    merged by max(rho) per bucket, folded with the identical exact
    int64 arithmetic as sql_hll_distinct."""
    from crawler_spark.operators.hll import (
        HLL_ALPHA_PM,
        HLL_M,
        HLL_RHO_CAP,
        LC_RAW_MAX,
        LC_TABLE,
    )

    m, cap = HLL_M, HLL_RHO_CAP
    lc = "[" + ", ".join(str(x) for x in LC_TABLE) + "]"
    return f"""
WITH k AS (SELECT event_type AS key, CAST(user_id AS VARCHAR) AS value
           FROM events),
h AS (SELECT key,
             {sql_h64("'hll:' || value")} AS h
      FROM k),
r AS (SELECT key, h % {m} AS bucket,
             LEAST(CASE WHEN h // {m} = 0 THEN 53
                        ELSE 53 - length(bin(h // {m})) END,
                   {cap}) AS rho
      FROM h),
reg AS (SELECT key, bucket, max(rho) AS rho FROM r GROUP BY key, bucket),
mrg AS (SELECT bucket, max(rho) AS rho FROM reg GROUP BY bucket),
s AS (SELECT CAST(sum(CAST(1 AS BIGINT) << ({cap} - rho)) AS BIGINT) AS sp,
             CAST(count(*) AS BIGINT) AS present
      FROM mrg),
raw AS (SELECT {m} - present AS zeros,
               (CAST({HLL_ALPHA_PM} AS BIGINT) * {m} * {m}
                * (CAST(1 AS BIGINT) << {cap}))
               // (1000 * (sp + ({m} - present)
                                * (CAST(1 AS BIGINT) << {cap}))) AS raw
        FROM s),
est AS (SELECT CASE WHEN zeros > 0 AND raw <= {LC_RAW_MAX}
                    THEN CAST(({lc})[zeros] AS BIGINT)
                    ELSE raw END AS est
        FROM raw),
exact AS (SELECT CAST(count(DISTINCT value) AS BIGINT) AS exact_global
          FROM k),
naive AS (SELECT CAST(sum(d) AS BIGINT) AS naive_group_sum
          FROM (SELECT CAST(count(DISTINCT value) AS BIGINT) AS d
                FROM k GROUP BY key))
SELECT 'all' AS scope, est.est AS merged_est, exact.exact_global,
       naive.naive_group_sum,
       ((est.est - exact.exact_global) * 1000) // exact.exact_global
         AS err_pm
FROM est, exact, naive"""


def sql_split_assign() -> str:
    """Twin of operators/sampling.split_report over grouped_split:
    the same md5 group bucket, cumulative per-mille split bands, and
    doc-measured achieved rate."""
    from crawler_spark.operators.sampling import (
        SPLIT_RATES_PM,
        SPLIT_SALT,
    )

    (t_name, t_pm), (v_name, v_pm), (x_name, _) = SPLIT_RATES_PM
    b = f"{sql_h64(f'''host || '|{SPLIT_SALT}' ''')} % 1000"
    return f"""
WITH d AS (SELECT doc_id, n_chars,
                  'h' || CAST(doc_id % 97 AS VARCHAR) AS host
           FROM documents),
s AS (SELECT host, n_chars, {b} AS b FROM d),
a AS (SELECT CASE WHEN b < {t_pm} THEN '{t_name}'
                  WHEN b < {t_pm + v_pm} THEN '{v_name}'
                  ELSE '{x_name}' END AS split,
             host, n_chars
      FROM s),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM a)
SELECT split, CAST(count(DISTINCT host) AS BIGINT) AS n_groups,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       (CAST(count(*) AS BIGINT) * 1000) // (SELECT n_total FROM tot)
         AS achieved_pm
FROM a GROUP BY split"""


def sql_pad_plan() -> str:
    """Twin of operators/packing.pad_plan: same BPE-ish token count,
    same bin()-based power-of-two bucket, exact ‰ waste."""
    from crawler_spark.operators.packing import (
        PAD_MAX_BUCKET,
        PAD_MIN_BUCKET,
    )

    return f"""
WITH d AS (SELECT least(CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}'))
                             AS BIGINT), {PAD_MAX_BUCKET}) AS u
           FROM documents),
b AS (SELECT u,
             greatest(CAST({PAD_MIN_BUCKET} AS BIGINT),
                      CASE WHEN u <= 1 THEN CAST(1 AS BIGINT)
                           ELSE CAST(1 AS BIGINT)
                                << length(bin(greatest(u - 1, 1)))
                      END) AS bucket_len
      FROM d)
SELECT bucket_len, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(u) AS BIGINT) AS actual_tokens,
       CAST(count(*) * bucket_len AS BIGINT) AS padded_tokens,
       CAST(((count(*) * bucket_len - sum(u)) * 1000)
            // (count(*) * bucket_len) AS BIGINT) AS waste_pm
FROM b GROUP BY bucket_len"""


def sql_bpe_pair_counts() -> str:
    """Twin of operators/termstats.bpe_pair_counts: same within-word
    adjacent character pairs (range(1, len) is end-exclusive, matching
    Spark's sequence(1, len-1)), exact counts, pair-string tie-break."""
    from crawler_spark.operators.termstats import BPE_TOP_K

    return f"""
WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
p AS (SELECT unnest(list_transform(range(1, length(w)),
                                   i -> substr(w, CAST(i AS INTEGER), 2)))
             AS pair
      FROM w WHERE length(w) >= 2)
SELECT pair, CAST(count(*) AS BIGINT) AS cnt
FROM p GROUP BY pair
ORDER BY cnt DESC, pair ASC
LIMIT {BPE_TOP_K}"""


def sql_bpe_merge_round() -> str:
    """Twin of operators/termstats.bpe_merge_round: apply merge #1 via
    replace() (greedy leftmost non-overlapping in BOTH engines), scan
    adjacent symbol pairs of the re-segmented word, map the chr(1)
    sentinel back to "(pair)" for display."""
    from crawler_spark.operators.termstats import BPE_TOP_K

    return f"""
WITH w0 AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
w1 AS (SELECT w FROM w0 WHERE length(w) >= 2),
w AS (SELECT w FROM w1 WHERE strpos(w, chr(1)) = 0),
r1 AS (SELECT unnest(list_transform(range(1, length(w)),
                                    i -> substr(w, CAST(i AS INTEGER), 2)))
              AS pair
       FROM w1),
m1 AS (SELECT pair AS m1 FROM r1 GROUP BY pair
       ORDER BY count(*) DESC, pair ASC LIMIT 1),
w2 AS (SELECT replace(w, (SELECT m1 FROM m1), chr(1)) AS w2 FROM w),
p AS (SELECT unnest(list_transform(range(1, length(w2)),
                                   i -> substr(w2, CAST(i AS INTEGER), 2)))
             AS p
      FROM w2 WHERE length(w2) >= 2)
SELECT replace(p, chr(1), '(' || (SELECT m1 FROM m1) || ')') AS pair,
       CAST(count(*) AS BIGINT) AS cnt
FROM p GROUP BY p
ORDER BY cnt DESC, pair ASC
LIMIT {BPE_TOP_K}"""


def sql_community_labels() -> str:
    """Unrolled-CTE twin of operators/communities.label_propagation:
    synchronous majority-label rounds over the symmetrized synthetic
    link graph, argmax by (cnt DESC, label ASC), isolated nodes keep
    their own label."""
    from crawler_spark.operators.communities import LPA_ITERATIONS

    iters = []
    for i in range(1, LPA_ITERATIONS + 1):
        iters.append(f"""
v{i} AS (SELECT u.node, l.lbl, CAST(count(*) AS BIGINT) AS cnt
         FROM und u JOIN l{i - 1} l ON l.node = u.nbr
         GROUP BY u.node, l.lbl),
b{i} AS (SELECT node, lbl FROM (
           SELECT node, lbl,
                  row_number() OVER (PARTITION BY node
                                     ORDER BY cnt DESC, lbl ASC) AS rn
           FROM v{i}) WHERE rn = 1),
l{i} AS (SELECT p.node, coalesce(b.lbl, p.lbl) AS lbl
         FROM l{i - 1} p LEFT JOIN b{i} b USING (node))""")
    return f"""
WITH {_link_edges_ctes()},
und AS (SELECT src AS node, dst AS nbr FROM e
        UNION SELECT dst, src FROM e),
l0 AS (SELECT node, node AS lbl FROM nd),{",".join(iters)},
sz AS (SELECT lbl AS community, CAST(count(*) AS BIGINT) AS csize
       FROM l{LPA_ITERATIONS} GROUP BY lbl)
SELECT l.node AS doc_id, CAST(l.lbl AS BIGINT) AS community, sz.csize
FROM l{LPA_ITERATIONS} l JOIN sz ON sz.community = l.lbl"""


def sql_pq_encode() -> str:
    """Twin of operators/similarity.pq_encode: same seeded-md5 sampled
    codebook (row_number order = Spark's collect order), same
    per-subspace integer-micro-unit d² argmin with (d, code) tie
    order, same exact int64 Σd reconstruction error (a second decimal
    rounding of summed rounded doubles hits half-boundaries where the
    engines disagree — hence integers)."""
    from crawler_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        PQ_SEED,
        PQ_SUBDIM,
    )

    diff = (
        f"(CAST(e.embedding[m.m * {PQ_SUBDIM} + i] AS DOUBLE)"
        f" - CAST(cb.embedding[m.m * {PQ_SUBDIM} + i] AS DOUBLE))"
    )
    pivots = ",\n       ".join(
        f"CAST(max(CASE WHEN m = {m} THEN code END) AS INTEGER) AS c{m}"
        for m in range(PQ_M)
    )
    return f"""
WITH h AS (SELECT vec_id, embedding,
                  {sql_h64_seeded("CAST(vec_id AS VARCHAR)", PQ_SEED)} AS h
           FROM embeddings),
cb AS (SELECT embedding,
              row_number() OVER (ORDER BY h, vec_id) - 1 AS code
       FROM (SELECT * FROM h ORDER BY h, vec_id LIMIT {PQ_K})),
cand AS (
  SELECT e.vec_id, m.m, cb.code,
         CAST(round(list_sum(list_transform(range(1, {PQ_SUBDIM + 1}),
               i -> {diff} * {diff})) * 1000000) AS BIGINT) AS d
  FROM embeddings e
  CROSS JOIN (SELECT CAST(range AS INTEGER) AS m FROM range(0, {PQ_M})) m
  CROSS JOIN cb
),
best AS (SELECT vec_id, m, code, d,
                row_number() OVER (PARTITION BY vec_id, m
                                   ORDER BY d ASC, code ASC) AS rn
         FROM cand)
SELECT vec_id,
       {pivots},
       CAST(sum(d) AS BIGINT) AS recon_err_u6
FROM best WHERE rn = 1
GROUP BY vec_id"""


def sql_data_card() -> str:
    """Twin of operators/datacard.corpus_data_card: same marker lang-ID
    chain, same integer quality bucket, same regex token count, same
    per-mille share division."""
    from crawler_spark.functions.textstats import (
        LANG_MARKERS,
        STOPWORDS,
        TOKEN_REGEX,
    )

    langs = sorted(LANG_MARKERS)
    score_exprs = []
    for lang in langs:
        s = " + ".join(_occ(w) for w in LANG_MARKERS[lang])
        score_exprs.append(f"({s}) AS s_{lang}")
    best = f"greatest({', '.join('s_' + lang for lang in langs)})"
    chain = " ".join(f"WHEN s_{lang} = best THEN '{lang}'" for lang in langs)
    stop = " + ".join(_occ(w) for w in STOPWORDS)
    return f"""
WITH f AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         ({stop}) AS n_stop,
         CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS BIGINT)
           AS n_tok,
         {', '.join(score_exprs)}
  FROM documents
), g AS (
  SELECT *,
         CAST(floor((n_chars - n_words + 1) * 100 / n_words) AS BIGINT)
           AS awl_c,
         {best} AS best
  FROM f
), s AS (
  SELECT *,
         CAST(least(n_words * 4, 400)
              + least(CAST(floor(n_stop * 2000 / n_words) AS BIGINT), 400)
              + least(CAST(floor(awl_c / 4) AS BIGINT), 200) AS BIGINT)
           AS score,
         CASE WHEN best = 0 THEN 'und'
              ELSE (CASE {chain} ELSE 'und' END) END AS lang
  FROM g
), d AS (
  SELECT lang,
         CASE WHEN score >= 700 THEN 'high'
              WHEN score >= 400 THEN 'medium'
              ELSE 'low' END AS quality_bucket,
         n_words, n_tok
  FROM s
), cells AS (
  SELECT lang, quality_bucket,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         CAST(sum(n_words) AS BIGINT) AS sum_words
  FROM d GROUP BY lang, quality_bucket
), tot AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS td,
         CAST(sum(n_tokens) AS BIGINT) AS tt
  FROM cells
)
SELECT lang, quality_bucket, n_docs, n_tokens,
       CAST(n_docs * 1000 // td AS BIGINT) AS docs_pm,
       CAST(n_tokens * 1000 // tt AS BIGINT) AS tokens_pm,
       CAST(sum_words // n_docs AS BIGINT) AS avg_words
FROM cells, tot"""


def sql_cluster_keep_best() -> str:
    """Twin of operators/components.cluster_keep_best: quality-aware
    canonical selection over the MinHash-LSH duplicate clusters — the
    kept doc per cluster is argmax(quality_score_pm) with min-doc_id
    tie-break, expressed as a row_number window (the declarative twin
    of Spark's min_by-over-struct partial agg)."""
    stop = " + ".join(_occ(w) for w in STOPWORDS)
    return f"""{_cluster_label_ctes()},
cl AS (
  SELECT l.doc_id, l.cluster_id, sz.cluster_size
  FROM lab l JOIN sz USING (cluster_id)
),
qf AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         ({stop}) AS n_stop
  FROM documents
),
q AS (
  SELECT doc_id,
         CAST(least(n_words * 4, 400)
              + least(CAST(floor(n_stop * 2000 / n_words) AS BIGINT), 400)
              + least(CAST(floor(
                  CAST(floor((n_chars - n_words + 1) * 100 / n_words)
                       AS BIGINT) / 4) AS BIGINT), 200) AS BIGINT)
           AS quality_pm
  FROM qf
),
j AS (SELECT cl.*, q.quality_pm FROM cl JOIN q USING (doc_id)),
r AS (
  SELECT *, row_number() OVER (
           PARTITION BY cluster_id
           ORDER BY quality_pm DESC, doc_id ASC) AS rn
  FROM j
)
SELECT doc_id, cluster_id, cluster_size, quality_pm,
       rn = 1 AS is_kept
FROM r"""


def sql_skipgram_pairs() -> str:
    """Twin of operators/cooccur.skipgram_pairs: undirected ±W-window
    co-occurrence counts with the exact integer GloVe-style closeness
    mass Σ (1000 div d), canonical a ≤ b orientation, cnt ≥ min tail
    prune."""
    from crawler_spark.operators.cooccur import (
        COOC_MIN_COUNT,
        COOC_W_SCALE,
        COOC_WINDOW,
    )

    per_d = "\nUNION ALL\n".join(
        f"""SELECT least(ws[i], ws[i + {d}]) AS a,
       greatest(ws[i], ws[i + {d}]) AS b,
       CAST({COOC_W_SCALE // d} AS BIGINT) AS w
FROM w, unnest(generate_series(1, len(ws) - {d})) AS s(i)"""
        for d in range(1, COOC_WINDOW + 1)
    )
    return f"""
WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
p AS (
{per_d}
)
SELECT a, b, CAST(count(*) AS BIGINT) AS cnt,
       CAST(sum(w) AS BIGINT) AS w_pm
FROM p GROUP BY a, b HAVING count(*) >= {COOC_MIN_COUNT}"""


def sql_fetch_shard_plan() -> str:
    """Twin of operators/fairshare.serpentine_shard_plan over the
    synthesized host-load table (host = source '-' doc_id mod 97,
    load = Σ n_chars): load-desc serpentine walk over the shards, then
    the per-shard rollup with exact per-mille load shares."""
    from crawler_spark.operators.fairshare import SHARD_COUNT

    k = SHARD_COUNT
    return f"""
WITH hosts AS (
  SELECT source || '-' || CAST(doc_id % 97 AS VARCHAR) AS host,
         CAST(sum(n_chars) AS BIGINT) AS load
  FROM documents GROUP BY 1
),
r AS (
  SELECT host, load,
         row_number() OVER (ORDER BY load DESC, host ASC) - 1 AS rk
  FROM hosts
),
a AS (
  SELECT host, load,
         CASE WHEN (rk // {k}) % 2 = 0 THEN rk % {k}
              ELSE {k - 1} - rk % {k} END AS shard
  FROM r
),
per AS (
  SELECT shard, CAST(count(*) AS BIGINT) AS n_hosts,
         CAST(sum(load) AS BIGINT) AS total_load,
         CAST(max(load) AS BIGINT) AS max_host_load
  FROM a GROUP BY shard
),
tot AS (SELECT CAST(sum(total_load) AS BIGINT) AS t FROM per)
SELECT CAST(shard AS INT) AS shard, n_hosts, total_load,
       CAST(total_load * 1000 // t AS BIGINT) AS load_pm,
       max_host_load
FROM per, tot"""


def sql_trustrank() -> str:
    """Twin of operators/linkgraph.trustrank over the synthetic graph +
    the doc_id % TR_SEED_MOD seed rule: unrolled integer power
    iteration whose teleport base is paid only to seed nodes."""
    from crawler_spark.operators.linkgraph import (
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_ITERATIONS,
        PR_SCALE,
        TR_SEED_MOD,
    )

    base = (
        f"CASE WHEN nd2.is_seed THEN ((({PR_SCALE} // (SELECT ns FROM sn)) "
        f"* {PR_DAMP_DEN - PR_DAMP_NUM}) // {PR_DAMP_DEN}) ELSE 0 END"
    )
    iters = []
    for i in range(1, PR_ITERATIONS + 1):
        iters.append(f"""
r{i} AS (
  SELECT nd2.node,
         CAST({base}
              + ({PR_DAMP_NUM} * coalesce(s.s, 0)) // {PR_DAMP_DEN}
           AS BIGINT) AS rank_ppb
  FROM nd2 LEFT JOIN (
    SELECT e.dst AS node,
           CAST(sum(r.rank_ppb // od.out_deg) AS BIGINT) AS s
    FROM e JOIN od USING (src) JOIN r{i - 1} r ON r.node = e.src
    GROUP BY e.dst
  ) s USING (node)
)""")
    return f"""
WITH {_link_edges_ctes()},
nd2 AS (SELECT node, node % {TR_SEED_MOD} = 0 AS is_seed FROM nd),
sn AS (SELECT CAST(count(*) AS BIGINT) AS ns FROM nd2 WHERE is_seed),
od AS (SELECT src, CAST(count(*) AS BIGINT) AS out_deg FROM e GROUP BY src),
r0 AS (SELECT node,
              CASE WHEN is_seed THEN {PR_SCALE} // (SELECT ns FROM sn)
                   ELSE 0 END AS rank_ppb
       FROM nd2),{",".join(iters)}
SELECT nd2.node AS doc_id, nd2.is_seed,
       CAST(r.rank_ppb AS BIGINT) AS rank_ppb
FROM nd2 JOIN r{PR_ITERATIONS} r USING (node)"""


def sql_postings_size_plan() -> str:
    """Twin of operators/invindex.postings_size_plan — the NAIVE flat
    lag-gap form (one window per term); the Spark side's hierarchical
    two-level gaps must reproduce it row-for-row."""
    from crawler_spark.operators.invindex import INV_MIN_DF

    return f"""
WITH p AS (
  SELECT DISTINCT term, CAST(doc_id AS BIGINT) AS doc_id
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents)
  WHERE term <> ''
),
g AS (
  SELECT term,
         doc_id - coalesce(
           lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id), -1
         ) AS gap
  FROM p
),
b AS (SELECT term, CAST(length(bin(gap)) AS BIGINT) AS bits FROM g),
s AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df,
         CAST(sum(2 * bits - 1) AS BIGINT) AS gamma_bits,
         CAST(sum((bits + 6) // 7) AS BIGINT) AS varint_bytes
  FROM b GROUP BY term
)
SELECT term, df, CAST(df * 8 AS BIGINT) AS raw_bytes, gamma_bits,
       varint_bytes,
       CAST(varint_bytes * 1000 // (df * 8) AS BIGINT) AS ratio_pm
FROM s WHERE df >= {INV_MIN_DF}"""


def sql_vocab_coverage() -> str:
    """Twin of operators/termstats.vocab_coverage: ranked unigram Zipf
    table, one conditional-sum aggregate, k rows out."""
    from crawler_spark.operators.termstats import VOCAB_KS

    csums = ",\n         ".join(
        f"CAST(sum(CASE WHEN r <= {k} THEN cnt ELSE 0 END) AS BIGINT) AS c{k}"
        for k in VOCAB_KS
    )
    rows = "\nUNION ALL\n".join(
        f"""SELECT CAST({k} AS BIGINT) AS k,
       least(CAST({k} AS BIGINT), v) AS vocab_terms,
       c{k} AS covered_tokens, total AS total_tokens,
       CAST(c{k} * 1000 // total AS BIGINT) AS coverage_pm
FROM a"""
        for k in VOCAB_KS
    )
    return f"""
WITH c AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w
),
r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w ASC) AS r FROM c),
a AS (
  SELECT CAST(count(*) AS BIGINT) AS v,
         CAST(sum(cnt) AS BIGINT) AS total,
         {csums}
  FROM r
)
{rows}"""


def sql_opic() -> str:
    """Twin of operators/linkgraph.opic: the synchronous fixed-iteration
    cash/history loop unrolled as chained CTEs, exact integer div/sum."""
    from crawler_spark.operators.linkgraph import OPIC_ITERATIONS, PR_SCALE

    iters = []
    for i in range(1, OPIC_ITERATIONS + 1):
        iters.append(f"""
s{i} AS (
  SELECT nd.node,
         CAST(coalesce(r.r, 0) AS BIGINT) AS cash,
         CAST(p.history + p.cash AS BIGINT) AS history
  FROM nd
  JOIN s{i - 1} p USING (node)
  LEFT JOIN (
    SELECT e.dst AS node, CAST(sum(p.cash // od.out_deg) AS BIGINT) AS r
    FROM e JOIN od USING (src) JOIN s{i - 1} p ON p.node = e.src
    GROUP BY e.dst
  ) r USING (node)
)""")
    return f"""
WITH {_link_edges_ctes()},
od AS (SELECT src, CAST(count(*) AS BIGINT) AS out_deg FROM e GROUP BY src),
s0 AS (SELECT node, (SELECT {PR_SCALE} // n FROM nn) AS cash,
              CAST(0 AS BIGINT) AS history
       FROM nd),{",".join(iters)}
SELECT nd.node AS doc_id,
       CAST(coalesce(od.out_deg, 0) AS BIGINT) AS out_deg,
       s.cash AS cash_ppb, s.history AS history_ppb,
       CAST(s.cash + s.history AS BIGINT) AS importance_ppb
FROM nd
LEFT JOIN od ON od.src = nd.node
JOIN s{OPIC_ITERATIONS} s USING (node)"""


def sql_degree_histogram() -> str:
    """Twin of operators/linkgraph.degree_histogram over the synthetic
    graph: log2 bucket via length(bin(deg)) - 1, both directions."""
    per = "\nUNION ALL\n".join(
        f"""SELECT '{name}' AS direction,
       CAST(length(bin(deg)) - 1 AS INT) AS log2_bucket,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(min(deg) AS BIGINT) AS min_deg,
       CAST(max(deg) AS BIGINT) AS max_deg
FROM (SELECT {key}, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY {key})
GROUP BY 2"""
        for name, key in (("out", "src"), ("in", "dst"))
    )
    return f"""
WITH {_link_edges_ctes()}
{per}"""


def sql_url_templates() -> str:
    """Twin of operators/urlmining.url_templates over the synthesized
    URL collection: identical normalization order (16+-hex runs first,
    then digit runs) and the identical trap threshold."""
    from crawler_spark.operators.urlmining import TRAP_MIN_URLS

    return f"""
WITH u AS (
  SELECT 'https://site' || CAST(doc_id % 37 AS VARCHAR) || '.example.com' ||
    CASE doc_id % 5
      WHEN 0 THEN '/product/' || CAST(doc_id AS VARCHAR) || '/view'
      WHEN 1 THEN '/product/' || CAST(doc_id AS VARCHAR) || '/reviews'
      WHEN 2 THEN '/session/' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16)
                  || '/cart'
      WHEN 3 THEN '/blog/' || CAST(2020 + doc_id % 5 AS VARCHAR) || '/'
                  || CAST(1 + doc_id % 12 AS VARCHAR) || '/post-'
                  || CAST(doc_id AS VARCHAR)
      ELSE '/about'
    END AS url
  FROM documents
), p AS (
  SELECT url,
         regexp_extract(url, '^https?://([^/]+)', 1) AS host,
         regexp_replace(
           regexp_replace(
             -- same optional-path regex + empty→'/' fallback as the
             -- Spark side (urlmining.py): a path-less https://host URL
             -- must template as '/', not ''
             CASE WHEN regexp_extract(url, '^https?://[^/]*(/.*)?$', 1) = ''
                  THEN '/'
                  ELSE regexp_extract(url, '^https?://[^/]*(/.*)?$', 1) END,
                          '[0-9a-f]{{16,}}', '{{X}}', 'g'),
           '[0-9]+', '{{N}}', 'g') AS template
  FROM u
), agg AS (
  SELECT template,
         CAST(count(*) AS BIGINT) AS n_urls,
         CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
         min(url) AS sample_url
  FROM p GROUP BY template
)
SELECT template, n_urls, n_hosts, sample_url,
       template LIKE '%{{%' AS is_parametric,
       (template LIKE '%{{%' AND n_urls >= {TRAP_MIN_URLS}) AS trap_flag
FROM agg"""


def sql_containment_pairs() -> str:
    """Twin of operators/textdedup.containment_pairs: LSH candidates
    (hot buckets capped identically), exact shingle intersection only
    over candidate docs, integer per-mille containment."""
    from crawler_spark.operators.textdedup import CONTAINMENT_PM

    t = CONTAINMENT_PM
    return f"""{_minhash_sig_cte(NGRAM_N, MINHASH_HASHES)},
{_pruned_band_ctes()},
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM btk a JOIN btk b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
),
ids AS (SELECT id_a AS doc_id FROM cand UNION SELECT id_b FROM cand),
gdc AS (SELECT gd.* FROM gd JOIN ids USING (doc_id)),
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ng FROM gdc GROUP BY doc_id),
com AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_common
  FROM gdc a JOIN gdc b ON a.ng = b.ng AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
cc AS (SELECT com.* FROM com JOIN cand USING (id_a, id_b)),
x AS (
  SELECT id_a, id_b, n_common, sa.n_ng AS n_a, sb.n_ng AS n_b,
         CAST(n_common * 1000 // sa.n_ng AS BIGINT) AS cont_a_pm,
         CAST(n_common * 1000 // sb.n_ng AS BIGINT) AS cont_b_pm
  FROM cc JOIN sz sa ON sa.doc_id = cc.id_a JOIN sz sb ON sb.doc_id = cc.id_b
)
SELECT id_a, id_b, n_common, n_a, n_b, cont_a_pm, cont_b_pm,
       CASE WHEN cont_a_pm >= {t} AND cont_b_pm >= {t} THEN 'near_dup'
            WHEN cont_a_pm >= {t} THEN 'a_in_b'
            ELSE 'b_in_a' END AS relation
FROM x WHERE greatest(cont_a_pm, cont_b_pm) >= {t}"""


def sql_lang_temperature() -> str:
    """Twin of operators/mixing.lang_temperature_allocation: exact isqrt
    (float sqrt + integer correction), largest-remainder apportionment."""
    from crawler_spark.operators.mixing import TEMP_BUDGET

    b = TEMP_BUDGET
    return f"""
WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY lang),
w AS (
  SELECT lang, n_docs,
         CAST(CASE WHEN (s + 1) * (s + 1) <= n_docs THEN s + 1
                   WHEN s * s > n_docs THEN s - 1
                   ELSE s END AS BIGINT) AS weight
  FROM (SELECT lang, n_docs, CAST(floor(sqrt(n_docs)) AS BIGINT) AS s FROM c)
),
t AS (SELECT CAST(sum(weight) AS BIGINT) AS wt,
             CAST(sum(n_docs) AS BIGINT) AS nt FROM w),
j AS (
  SELECT lang, n_docs, weight, nt,
         CAST(weight * {b} // wt AS BIGINT) AS base,
         CAST((weight * {b}) % wt AS BIGINT) AS rem
  FROM w, t
),
l AS (SELECT CAST({b} - sum(base) AS BIGINT) AS leftover FROM j),
r AS (SELECT j.*, leftover,
             row_number() OVER (ORDER BY rem DESC, lang ASC) AS rk
      FROM j, l),
f AS (
  SELECT lang, n_docs, weight,
         CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
           AS budget_docs,
         CAST(n_docs * {b} // nt AS BIGINT) AS prop_budget
  FROM r
)
SELECT lang, n_docs, weight, budget_docs, prop_budget,
       CAST(budget_docs * 1000 // greatest(prop_budget, 1) AS BIGINT) AS boost_pm
FROM f"""


def sql_cdc_chunks() -> str:
    """Twin of operators/cdc.cdc_chunks: identical boundary predicate
    (h64(word) mod CDC_DIV == 0), identical slicing, corpus-wide copy
    counts."""
    from crawler_spark.operators.cdc import CDC_DIV

    h_word = sql_h64("w[p]")
    return f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= 1
),
b AS (
  SELECT doc_id, w,
         list_filter(list_transform(range(1, len(w) + 1),
                       p -> CASE WHEN {h_word} % {CDC_DIV} = 0
                                 THEN p ELSE 0 END),
                     p -> p > 0) AS bp
  FROM d
),
e2 AS (
  SELECT doc_id, w,
         CASE WHEN len(bp) > 0 AND bp[-1] = len(w)
              THEN bp ELSE list_append(bp, len(w)) END AS ends
  FROM b
),
c AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ends) + 1),
           k -> struct_pack(
                  chunk_idx := k - 1,
                  cw := w[(CASE WHEN k = 1 THEN 1 ELSE ends[k - 1] + 1 END)
                          :(ends[k])]))) AS ch
  FROM e2
),
ck AS (
  SELECT doc_id,
         CAST(ch.chunk_idx AS INT) AS chunk_idx,
         CAST(len(ch.cw) AS BIGINT) AS n_words,
         {sql_h64("array_to_string(ch.cw, ' ')")} AS chunk_hash
  FROM c
),
cp AS (SELECT chunk_hash, CAST(count(*) AS BIGINT) AS n_copies
       FROM ck GROUP BY chunk_hash)
SELECT doc_id, chunk_idx, n_words, ck.chunk_hash, n_copies,
       n_copies > 1 AS is_dup
FROM ck JOIN cp USING (chunk_hash)"""


def sql_spam_mass() -> str:
    """Twin of operators/linkgraph.spam_mass: BOTH unrolled integer
    rank loops (pagerank r0..rK over all nodes, trustrank t0..tK over
    the seed teleport) in one WITH, composed by the mass formula."""
    from crawler_spark.operators.linkgraph import (
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_ITERATIONS,
        PR_SCALE,
        SPAM_MASS_FLAG_PM,
        TR_SEED_MOD,
    )

    pr_base = (
        f"(SELECT (({PR_SCALE} // n) * {PR_DAMP_DEN - PR_DAMP_NUM})"
        f" // {PR_DAMP_DEN} FROM nn)"
    )
    tr_base = (
        f"CASE WHEN nd2.is_seed THEN ((({PR_SCALE} // (SELECT ns FROM sn)) "
        f"* {PR_DAMP_DEN - PR_DAMP_NUM}) // {PR_DAMP_DEN}) ELSE 0 END"
    )
    iters = []
    for i in range(1, PR_ITERATIONS + 1):
        iters.append(f"""
r{i} AS (
  SELECT nd.node,
         CAST({pr_base} + ({PR_DAMP_NUM} * coalesce(s.s, 0)) // {PR_DAMP_DEN}
           AS BIGINT) AS rank_ppb
  FROM nd LEFT JOIN (
    SELECT e.dst AS node, CAST(sum(r.rank_ppb // od.out_deg) AS BIGINT) AS s
    FROM e JOIN od USING (src) JOIN r{i - 1} r ON r.node = e.src
    GROUP BY e.dst
  ) s USING (node)
),
t{i} AS (
  SELECT nd2.node,
         CAST({tr_base} + ({PR_DAMP_NUM} * coalesce(s.s, 0)) // {PR_DAMP_DEN}
           AS BIGINT) AS rank_ppb
  FROM nd2 LEFT JOIN (
    SELECT e.dst AS node, CAST(sum(r.rank_ppb // od.out_deg) AS BIGINT) AS s
    FROM e JOIN od USING (src) JOIN t{i - 1} r ON r.node = e.src
    GROUP BY e.dst
  ) s USING (node)
)""")
    return f"""
WITH {_link_edges_ctes()},
nd2 AS (SELECT node, node % {TR_SEED_MOD} = 0 AS is_seed FROM nd),
sn AS (SELECT CAST(count(*) AS BIGINT) AS ns FROM nd2 WHERE is_seed),
od AS (SELECT src, CAST(count(*) AS BIGINT) AS out_deg FROM e GROUP BY src),
r0 AS (SELECT node, (SELECT {PR_SCALE} // n FROM nn) AS rank_ppb FROM nd),
t0 AS (SELECT node,
              CASE WHEN is_seed THEN {PR_SCALE} // (SELECT ns FROM sn)
                   ELSE 0 END AS rank_ppb
       FROM nd2),{",".join(iters)}
SELECT nd2.node AS doc_id,
       CAST(r.rank_ppb AS BIGINT) AS rank_ppb,
       CAST(t.rank_ppb AS BIGINT) AS trust_ppb,
       nd2.is_seed,
       CAST(greatest(0, r.rank_ppb - t.rank_ppb) * 1000 // r.rank_ppb
         AS BIGINT) AS spam_mass_pm,
       greatest(0, r.rank_ppb - t.rank_ppb) * 1000 // r.rank_ppb
         >= {SPAM_MASS_FLAG_PM} AS spam_flag
FROM nd2
JOIN r{PR_ITERATIONS} r USING (node)
JOIN t{PR_ITERATIONS} t USING (node)"""


def sql_winnow_fingerprints() -> str:
    """Twin of operators/winnowing.winnow_fingerprints: identical
    rightmost-min window rule, positions 1-based into the k-gram list,
    cross-doc sharing counts."""
    from crawler_spark.operators.winnowing import WINNOW_K, WINNOW_W

    k, w = WINNOW_K, WINNOW_W
    sub = f"hs[s:s + {w - 1}]"
    sel = (
        f"list_transform(range(1, greatest(len(hs) - {w} + 1, 1) + 1), "
        f"s -> list_max(list_filter(list_transform("
        f"range(1, len({sub}) + 1), "
        f"t -> CASE WHEN ({sub})[t] = list_min({sub}) "
        f"THEN s + t - 1 ELSE -1 END), x -> x > 0)))"
    )
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS wrd FROM documents),
g AS (
  SELECT doc_id,
         list_transform(range(1, len(wrd) - {k} + 2),
                        i -> array_to_string(wrd[i:i + {k - 1}], ' ')) AS ngs
  FROM d WHERE len(wrd) >= {k}
),
h AS (SELECT doc_id, list_transform(ngs, ng -> {sql_h64('ng')}) AS hs
      FROM g WHERE len(ngs) >= 1),
s AS (
  SELECT doc_id, hs, unnest({sel}) AS j FROM h
),
fp AS (
  SELECT DISTINCT doc_id, CAST(j AS INT) AS pos, hs[j] AS fp FROM s
),
sh AS (SELECT fp, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
       FROM fp GROUP BY fp)
SELECT doc_id, pos, fp.fp, n_docs, n_docs > 1 AS shared
FROM fp JOIN sh USING (fp)"""


def sql_collocation_topk() -> str:
    """Twin of operators/cooccur.collocation_topk: identical pair CTE,
    unigram counts, integer lift, (lift desc, a, b) top-k."""
    from crawler_spark.operators.cooccur import (
        COLLOC_TOPK,
        COOC_MIN_COUNT,
        COOC_W_SCALE,
        COOC_WINDOW,
    )

    per_d = "\nUNION ALL\n".join(
        f"""SELECT least(ws[i], ws[i + {d}]) AS a,
       greatest(ws[i], ws[i + {d}]) AS b,
       CAST({COOC_W_SCALE // d} AS BIGINT) AS w
FROM w, unnest(generate_series(1, len(ws) - {d})) AS s(i)"""
        for d in range(1, COOC_WINDOW + 1)
    )
    return f"""
WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
p AS (
{per_d}
),
pc AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(w) AS BIGINT) AS w_pm
  FROM p GROUP BY a, b HAVING count(*) >= {COOC_MIN_COUNT}
),
tk AS (SELECT unnest(ws) AS tok FROM w),
tc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY tok),
nn2 AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM tc)
SELECT a, b, cnt, ta.c AS ca, tb.c AS cb,
       CAST(cnt * (SELECT n FROM nn2) * 1000 // (ta.c * tb.c) AS BIGINT)
         AS lift_pm
FROM pc JOIN tc ta ON ta.tok = pc.a JOIN tc tb ON tb.tok = pc.b
ORDER BY lift_pm DESC, a ASC, b ASC
LIMIT {COLLOC_TOPK}"""


def sql_bowtie_regions() -> str:
    """Twin of operators/linkgraph.bowtie_regions over the synthetic
    graph: same pivot rule (degree desc, node asc), recursive
    reachability both ways, same region merge."""
    ctes = _link_edges_ctes()
    return f"""
WITH RECURSIVE {ctes.lstrip()},
odeg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1),
ideg AS (SELECT dst AS node, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1),
deg AS (
  SELECT nd.node, coalesce(o.d, 0) + coalesce(i.d, 0) AS d
  FROM nd LEFT JOIN odeg o USING (node) LEFT JOIN ideg i USING (node)
),
pv AS (SELECT node FROM deg ORDER BY d DESC, node ASC LIMIT 1),
fwd(node) AS (
  SELECT node FROM pv
  UNION
  SELECT e.dst FROM e JOIN fwd ON fwd.node = e.src
),
bwd(node) AS (
  SELECT node FROM pv
  UNION
  SELECT e.src FROM e JOIN bwd ON bwd.node = e.dst
),
r AS (
  SELECT nd.node,
         CASE WHEN f.node IS NOT NULL AND b.node IS NOT NULL THEN 'core'
              WHEN b.node IS NOT NULL THEN 'in'
              WHEN f.node IS NOT NULL THEN 'out'
              ELSE 'other' END AS region
  FROM nd
  LEFT JOIN fwd f ON f.node = nd.node
  LEFT JOIN bwd b ON b.node = nd.node
)
SELECT region, CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(min(node) AS BIGINT) AS min_node
FROM r GROUP BY region"""


def sql_triangle_counts() -> str:
    """Twin of operators/linkgraph.triangle_counts over the synthetic
    graph: identical (degree, id) orientation, wedge join, closing
    semi-join, and per-mille clustering coefficient."""
    return f"""
WITH {_link_edges_ctes()},
ring AS (
  SELECT node AS src, (node + k) % (SELECT n FROM nn) AS dst
  FROM nd, unnest([1, 2]) AS t(k)
  WHERE node <> (node + k) % (SELECT n FROM nn)
),
e2 AS (SELECT src, dst FROM e UNION SELECT src, dst FROM ring),
ue AS (
  SELECT least(src, dst) AS u, greatest(src, dst) AS v
  FROM e2 GROUP BY 1, 2
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT u AS node FROM ue UNION ALL SELECT v FROM ue
  ) GROUP BY node
),
oe AS (
  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
              THEN u ELSE v END AS s,
         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
              THEN v ELSE u END AS t
  FROM ue
  JOIN deg du ON du.node = ue.u
  JOIN deg dv ON dv.node = ue.v
),
tri AS (
  SELECT a.s AS s, a.t AS x, b.t AS y
  FROM oe a JOIN oe b ON a.s = b.s AND a.t < b.t
  WHERE EXISTS (SELECT 1 FROM ue WHERE ue.u = a.t AND ue.v = b.t)
),
pn AS (
  SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
    SELECT s AS node FROM tri
    UNION ALL SELECT x FROM tri
    UNION ALL SELECT y FROM tri
  ) GROUP BY node
)
SELECT nd.node AS doc_id,
       CAST(coalesce(deg.deg, 0) AS BIGINT) AS deg,
       CAST(coalesce(pn.n_tri, 0) AS BIGINT) AS n_tri,
       CAST(CASE WHEN coalesce(deg.deg, 0) >= 2
                 THEN 2000 * coalesce(pn.n_tri, 0)
                      // (deg.deg * (deg.deg - 1))
                 ELSE 0 END AS BIGINT) AS clustering_pm
FROM nd LEFT JOIN deg USING (node) LEFT JOIN pn USING (node)"""


def sql_heaps_curve() -> str:
    """Twin of operators/termstats.heaps_curve: same ceil bucket width
    from the corpus doc count, min-bucket first occurrence, bounded
    cumulative windows."""
    from crawler_spark.operators.termstats import HEAPS_BUCKETS

    b = HEAPS_BUCKETS
    return f"""
WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
wd AS (SELECT CAST(greatest(1, ((SELECT n FROM nn) + {b - 1}) // {b})
         AS BIGINT) AS width),
toks AS (
  SELECT CAST(doc_id // (SELECT width FROM wd) AS BIGINT) AS bucket,
         unnest(string_split(text, ' ')) AS w
  FROM documents
),
pb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens
       FROM toks GROUP BY bucket),
fs AS (SELECT w, CAST(min(bucket) AS BIGINT) AS bucket FROM toks GROUP BY w),
nw AS (SELECT bucket, CAST(count(*) AS BIGINT) AS new_words
       FROM fs GROUP BY bucket),
j AS (
  SELECT pb.bucket, pb.n_tokens,
         CAST(coalesce(nw.new_words, 0) AS BIGINT) AS new_words
  FROM pb LEFT JOIN nw USING (bucket)
)
SELECT bucket, n_tokens,
       CAST(sum(n_tokens) OVER (ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_tokens,
       new_words,
       CAST(sum(new_words) OVER (ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_vocab
FROM j"""


def sql_hyperanf() -> str:
    """Twin of operators/linkgraph.hyperanf over the synthetic graph:
    per-node HLL register tables (identical portable-HLL arithmetic to
    sql_hll_distinct) propagated through unrolled max-merge rounds,
    each round's neighborhood function as one sum."""
    from crawler_spark.operators.hll import (
        HLL_ALPHA_PM,
        HLL_M,
        HLL_RHO_CAP,
        LC_RAW_MAX,
        LC_TABLE,
    )
    from crawler_spark.operators.linkgraph import ANF_ROUNDS

    m, cap = HLL_M, HLL_RHO_CAP
    lc = "[" + ", ".join(str(x) for x in LC_TABLE) + "]"

    def fold(reg: str, t: int) -> str:
        return f"""
s{t} AS (SELECT grp,
             CAST(sum(CAST(1 AS BIGINT) << ({cap} - rho)) AS BIGINT) AS sp,
             CAST(count(*) AS BIGINT) AS present
      FROM {reg} GROUP BY grp),
raw{t} AS (SELECT grp, {m} - present AS zeros,
               (CAST({HLL_ALPHA_PM} AS BIGINT) * {m} * {m}
                * (CAST(1 AS BIGINT) << {cap}))
               // (1000 * (sp + ({m} - present)
                                * (CAST(1 AS BIGINT) << {cap}))) AS raw
        FROM s{t}),
est{t} AS (SELECT grp,
               CASE WHEN zeros > 0 AND raw <= {LC_RAW_MAX}
                    THEN CAST(({lc})[zeros] AS BIGINT)
                    ELSE raw END AS est
        FROM raw{t}),
nf{t} AS (SELECT CAST({t} AS INT) AS t,
                 CAST(sum(est) AS BIGINT) AS nf_est
          FROM est{t})"""

    parts = [fold("reg0", 0)]
    for t in range(1, ANF_ROUNDS + 1):
        parts.append(f"""
reg{t} AS (
  SELECT grp, bucket, max(rho) AS rho FROM (
    SELECT grp, bucket, rho FROM reg{t - 1}
    UNION ALL
    SELECT e.src AS grp, r.bucket, r.rho
    FROM e JOIN reg{t - 1} r ON r.grp = e.dst
  ) GROUP BY grp, bucket
)""")
        parts.append(fold(f"reg{t}", t))
    unions = "\nUNION ALL\n".join(
        f"SELECT t, nf_est FROM nf{t}" for t in range(ANF_ROUNDS + 1)
    )
    return f"""
WITH {_link_edges_ctes()},
h0 AS (SELECT node AS grp,
              {sql_h64("'hll:' || CAST(node AS VARCHAR)")} AS h
       FROM nd),
reg0 AS (
  SELECT grp, h % {m} AS bucket,
         LEAST(CASE WHEN h // {m} = 0 THEN 53
                    ELSE 53 - length(bin(h // {m})) END, {cap}) AS rho
  FROM h0 GROUP BY 1, 2, 3
),{",".join(parts)}
SELECT t, nf_est,
       CAST(nf_est * 1000
            // ((SELECT n FROM nn) * (SELECT n FROM nn)) AS BIGINT)
         AS pairs_reached_pm
FROM ({unions})"""


def sql_dedup_cascade() -> str:
    """Twin of operators/cascade.dedup_cascade: exact-survivor set,
    the shared recursive cluster labels over it (src='d1'), the
    keep-best rule from sql_cluster_keep_best re-scoped to d1, and the
    three-stage survivor ledger."""
    from crawler_spark.operators.cascade import DUP_MOD, DUP_OFFSET

    stop = " + ".join(_occ(w) for w in STOPWORDS)
    ctes = _cluster_label_ctes(src="d1")
    d1 = f"""raw0 AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
  UNION ALL
  SELECT CAST(doc_id + {DUP_OFFSET} AS BIGINT), text FROM documents
  WHERE doc_id % {DUP_MOD} = 0
),
d1 AS (
  SELECT d.doc_id, d.text FROM raw0 d
  JOIN (SELECT min(doc_id) AS doc_id FROM raw0 GROUP BY md5(text)) k
    USING (doc_id)
)"""
    assert ctes.startswith("\nWITH RECURSIVE ")
    ctes = ctes.replace("WITH RECURSIVE ", f"WITH RECURSIVE {d1},\n", 1)
    return f"""{ctes},
qf AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         ({stop}) AS n_stop
  FROM d1
),
q AS (
  SELECT doc_id,
         CAST(least(n_words * 4, 400)
              + least(CAST(floor(n_stop * 2000 / n_words) AS BIGINT), 400)
              + least(CAST(floor(
                  CAST(floor((n_chars - n_words + 1) * 100 / n_words)
                       AS BIGINT) / 4) AS BIGINT), 200) AS BIGINT)
           AS quality_pm
  FROM qf
),
rk AS (
  SELECT l.doc_id, row_number() OVER (
           PARTITION BY l.cluster_id
           ORDER BY q.quality_pm DESC, l.doc_id ASC) AS rn
  FROM lab l JOIN q USING (doc_id)
),
d2 AS (SELECT d1.* FROM d1 JOIN rk USING (doc_id) WHERE rk.rn = 1)
SELECT 'raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
FROM raw0
UNION ALL
SELECT 'exact', CAST(count(*) AS BIGINT),
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) FROM d1
UNION ALL
SELECT 'neardup_keep_best', CAST(count(*) AS BIGINT),
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) FROM d2"""


def sql_soft404() -> str:
    """Twin of operators/soft404.soft404_over_documents: identical page
    synthesis, replace-length marker counting, verdict CASE."""
    from crawler_spark.operators.soft404 import (
        SOFT404_MARKERS,
        SOFT404_MIN_MASS,
    )

    mass = " + ".join(_occ(w, text="text2") for w in SOFT404_MARKERS)
    return f"""
WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 1 THEN 404 ELSE 200 END AS status,
         CASE WHEN doc_id % 10 = 0
              THEN 'error 404 page not found - the page does not exist ' || text
              WHEN doc_id % 10 = 2
              THEN 'content no longer available 404 ' || text
              ELSE text END AS text2
  FROM documents
),
mm AS (SELECT doc_id, CAST(status AS INT) AS status,
              CAST({mass} AS BIGINT) AS marker_mass
       FROM p)
SELECT doc_id, status, marker_mass,
       CASE WHEN status <> 200 THEN 'hard404'
            WHEN marker_mass >= {SOFT404_MIN_MASS} THEN 'soft404'
            ELSE 'ok' END AS verdict
FROM mm"""


def sql_salsa_scores() -> str:
    """Twin of operators/linkgraph.salsa: the SAME closed form (Lempel
    & Moran Prop. 2), with bipartite components via a recursive
    min-reachability CTE (the declarative twin of the large/small-star
    contraction) and the identical ppb division order."""
    from crawler_spark.operators.linkgraph import SALSA_SCALE

    S = SALSA_SCALE
    return f"""
WITH RECURSIVE {_link_edges_ctes().lstrip()},
bip AS (SELECT 2 * src AS u, 2 * dst + 1 AS v FROM e),
sym AS (SELECT u, v FROM bip UNION SELECT v, u FROM bip),
reach(u, lbl) AS (
  SELECT u, u AS lbl FROM (SELECT DISTINCT u FROM sym)
  UNION
  SELECT s.u, r.lbl FROM sym s JOIN reach r ON r.u = s.v
),
comp AS (SELECT u, min(lbl) AS component FROM reach GROUP BY u),
ain AS (SELECT dst AS node, CAST(count(*) AS BIGINT) AS deg
        FROM e GROUP BY dst),
aout AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
         FROM e GROUP BY src),
aside AS (SELECT a.node, a.deg, c.component
          FROM ain a JOIN comp c ON c.u = 2 * a.node + 1),
hside AS (SELECT a.node, a.deg, c.component
          FROM aout a JOIN comp c ON c.u = 2 * a.node),
atot AS (SELECT CAST(count(*) AS BIGINT) AS n_side FROM aside),
htot AS (SELECT CAST(count(*) AS BIGINT) AS n_side FROM hside),
ac AS (SELECT component, CAST(count(*) AS BIGINT) AS n_c,
              CAST(sum(deg) AS BIGINT) AS dsum_c
       FROM aside GROUP BY component),
hc AS (SELECT component, CAST(count(*) AS BIGINT) AS n_c,
              CAST(sum(deg) AS BIGINT) AS dsum_c
       FROM hside GROUP BY component),
ascore AS (
  SELECT s.node,
         (c.n_c * {S} // greatest(t.n_side, 1))
           * (s.deg * {S} // c.dsum_c) // {S} AS salsa_auth_ppb
  FROM aside s JOIN ac c USING (component), atot t
),
hscore AS (
  SELECT s.node,
         (c.n_c * {S} // greatest(t.n_side, 1))
           * (s.deg * {S} // c.dsum_c) // {S} AS salsa_hub_ppb
  FROM hside s JOIN hc c USING (component), htot t
)
SELECT nd.node AS doc_id,
       CAST(coalesce(a.salsa_auth_ppb, 0) AS BIGINT) AS salsa_auth_ppb,
       CAST(coalesce(h.salsa_hub_ppb, 0) AS BIGINT) AS salsa_hub_ppb
FROM nd LEFT JOIN ascore a ON a.node = nd.node
        LEFT JOIN hscore h ON h.node = nd.node"""


def sql_harmonic_centrality() -> str:
    """Twin of operators/linkgraph.harmonic_centrality: the hyperanf
    register recursion (identical portable-HLL arithmetic to
    sql_hyperanf) run over REVERSED edges, kept per node, with the
    same clamped per-term truncating 1/t weighting."""
    from crawler_spark.operators.hll import (
        HLL_ALPHA_PM,
        HLL_M,
        HLL_RHO_CAP,
        LC_RAW_MAX,
        LC_TABLE,
    )
    from crawler_spark.operators.linkgraph import ANF_ROUNDS, HC_SCALE

    m, cap = HLL_M, HLL_RHO_CAP
    lc = "[" + ", ".join(str(x) for x in LC_TABLE) + "]"

    def fold(reg: str, t: int) -> str:
        return f"""
s{t} AS (SELECT grp,
             CAST(sum(CAST(1 AS BIGINT) << ({cap} - rho)) AS BIGINT) AS sp,
             CAST(count(*) AS BIGINT) AS present
      FROM {reg} GROUP BY grp),
raw{t} AS (SELECT grp, {m} - present AS zeros,
               (CAST({HLL_ALPHA_PM} AS BIGINT) * {m} * {m}
                * (CAST(1 AS BIGINT) << {cap}))
               // (1000 * (sp + ({m} - present)
                                * (CAST(1 AS BIGINT) << {cap}))) AS raw
        FROM s{t}),
est{t} AS (SELECT grp,
               CASE WHEN zeros > 0 AND raw <= {LC_RAW_MAX}
                    THEN CAST(({lc})[zeros] AS BIGINT)
                    ELSE raw END AS est
        FROM raw{t})"""

    parts = [fold("reg0", 0)]
    for t in range(1, ANF_ROUNDS + 1):
        parts.append(f"""
reg{t} AS (
  SELECT grp, bucket, max(rho) AS rho FROM (
    SELECT grp, bucket, rho FROM reg{t - 1}
    UNION ALL
    SELECT re.src AS grp, r.bucket, r.rho
    FROM re JOIN reg{t - 1} r ON r.grp = re.dst
  ) GROUP BY grp, bucket
)""")
        parts.append(fold(f"reg{t}", t))
    terms = " + ".join(
        f"greatest(e{t}.est - e{t - 1}.est, 0) * {HC_SCALE} // {t}"
        for t in range(1, ANF_ROUNDS + 1)
    )
    est_joins = "\n  ".join(
        f"JOIN est{t} e{t} ON e{t}.grp = nd.node"
        for t in range(ANF_ROUNDS + 1)
    )
    return f"""
WITH {_link_edges_ctes()},
re AS (SELECT dst AS src, src AS dst FROM e),
h0 AS (SELECT node AS grp,
              {sql_h64("'hll:' || CAST(node AS VARCHAR)")} AS h
       FROM nd),
reg0 AS (
  SELECT grp, h % {m} AS bucket,
         LEAST(CASE WHEN h // {m} = 0 THEN 53
                    ELSE 53 - length(bin(h // {m})) END, {cap}) AS rho
  FROM h0 GROUP BY 1, 2, 3
),{",".join(parts)}
SELECT nd.node AS doc_id, CAST({terms} AS BIGINT) AS hc_milli
FROM nd
  {est_joins}"""
