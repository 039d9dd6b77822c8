"""Text-analysis surface over `documents` (north-star operators).

Each op is a pure-Column expression (functions/text.py) with a DuckDB twin
computing the identical integers/doubles. Integer-only cores (regexp counts,
rolling hash) are bit-exact by construction; ratio outputs are deterministic
doubles (same IEEE ops, no aggregation-order dependence).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_expenses_spark.caching import track
from etl_expenses_spark.functions.text import (
    lang_id,
    punct_count,
    quality_score,
    rolling_hash,
    token_count,
    tokens,
)
from etl_expenses_spark.plans._util import T
from etl_expenses_spark.plans.registry import query

# DuckDB twin of functions/text.py:tokens — nonempty whitespace tokens.
_D_TOKENS = r"list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '')"
_D_PUNCT = r"""len(regexp_extract_all(text, '[.,;:!?"''()\-]'))"""


@query(
    "text_token_stats",
    oracle=f"""
        SELECT doc_id,
               CAST(len({_D_TOKENS}) AS BIGINT) AS n_tokens,
               CAST({_D_PUNCT} AS BIGINT) AS n_punct,
               CAST({_D_PUNCT} AS DOUBLE) / CAST(GREATEST(LENGTH(text), 1) AS DOUBLE)
                   AS punct_ratio
        FROM documents
    """,
    tags=("text",),
)
def text_token_stats(spark, sf_dir):
    """Token counting + punctuation profile — the quality-scoring raw stats."""
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        punct_count("text").alias("n_punct"),
        (
            punct_count("text").cast("double")
            / F.greatest(F.length("text"), F.lit(1)).cast("double")
        ).alias("punct_ratio"),
    )


@query(
    "text_quality_score",
    oracle=f"""
        SELECT doc_id,
               LEAST(CAST(len({_D_TOKENS}) AS DOUBLE) / 64.0, 1.0) * 0.4
               + (CASE WHEN CAST(GREATEST(LENGTH(text), 1) AS DOUBLE)
                            / GREATEST(CAST(len({_D_TOKENS}) AS DOUBLE), CAST(1 AS DOUBLE))
                            BETWEEN 3.0 AND 12.0
                       THEN 1.0 ELSE 0.5 END) * 0.3
               + (1.0 - LEAST(CAST({_D_PUNCT} AS DOUBLE)
                              / CAST(GREATEST(LENGTH(text), 1) AS DOUBLE) * 4.0, 1.0)) * 0.3
                   AS quality
        FROM documents
    """,
    tags=("text",),
)
def text_quality_score(spark, sf_dir):
    """Heuristic doc-quality score (functions/text.py:quality_score)."""
    d = T(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score("text").alias("quality"))


@query(
    "text_lang_id",
    oracle=r"""
        WITH hits AS (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(lower(text),
                        '\b(the|and|of|to|a|in|is|for|with|on)\b')) AS BIGINT) AS en,
                   CAST(len(regexp_extract_all(lower(text),
                        '\b(el|la|de|que|y|en|un|por|con|para)\b')) AS BIGINT) AS es
            FROM documents)
        SELECT doc_id,
               CASE WHEN en > es AND en > 0 THEN 'en'
                    WHEN es > en AND es > 0 THEN 'es'
                    ELSE 'unk' END AS lang_guess
        FROM hits
    """,
    tags=("text",),
)
def text_lang_id(spark, sf_dir):
    """n-gram-heuristic language ID by stopword-hit majority."""
    d = T(spark, sf_dir, "documents")
    return d.select("doc_id", lang_id("text").alias("lang_guess"))


@query(
    "doc_fingerprint",
    oracle="""
        SELECT doc_id,
               CAST(list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(
                           list_filter(string_split(text, ''), c -> c <> ''),
                           c -> CAST(ascii(c) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 1000000007) AS BIGINT) AS fingerprint
        FROM documents
    """,
    tags=("text", "hash"),
)
def doc_fingerprint(spark, sf_dir):
    """Rolling polynomial hash h=(h*31+c) mod p over the document's
    characters — integer fold, bit-exact across engines."""
    d = T(spark, sf_dir, "documents")
    return d.select("doc_id", rolling_hash("text").alias("fingerprint"))


@query(
    "text_bpe_token_count",
    oracle=f"""
        SELECT doc_id,
               CAST(len({_D_TOKENS}) AS BIGINT) AS n_words,
               CAST(len(regexp_extract_all(text,
                   '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+'))
                   AS BIGINT) AS n_bpe_ish,
               CAST(len(regexp_extract_all(text,
                   '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+'))
                   AS DOUBLE)
                 / CAST(GREATEST(len({_D_TOKENS}), 1) AS DOUBLE) AS fertility
        FROM documents
    """,
    tags=("text", "tokens"),
)
def text_bpe_token_count(spark, sf_dir):
    """Token budgeting both ways: whitespace words and the BPE-ish subword
    estimate (GPT-2-shaped pre-tokenizer regex, lookahead-free so Java and
    RE2 count identically), plus their ratio ('fertility') — the number a
    training pipeline uses to predict LLM token cost per document."""
    from etl_expenses_spark.functions.text import bpe_ish_token_count

    d = T(spark, sf_dir, "documents")
    words = token_count("text")
    bpe = bpe_ish_token_count("text")
    return d.select(
        "doc_id",
        words.alias("n_words"),
        bpe.alias("n_bpe_ish"),
        (bpe.cast("double") / F.greatest(words, F.lit(1)).cast("double")).alias("fertility"),
    )


@query(
    "text_features",
    oracle=f"""
        WITH hits AS (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(lower(text),
                        '\\b(the|and|of|to|a|in|is|for|with|on)\\b')) AS BIGINT) AS en,
                   CAST(len(regexp_extract_all(lower(text),
                        '\\b(el|la|de|que|y|en|un|por|con|para)\\b')) AS BIGINT) AS es
            FROM documents)
        SELECT d.doc_id,
               CAST(len({_D_TOKENS}) AS BIGINT) AS n_tokens,
               CAST({_D_PUNCT} AS BIGINT) AS n_punct,
               CAST({_D_PUNCT} AS DOUBLE) / CAST(GREATEST(LENGTH(text), 1) AS DOUBLE)
                   AS punct_ratio,
               LEAST(CAST(len({_D_TOKENS}) AS DOUBLE) / 64.0, 1.0) * 0.4
               + (CASE WHEN CAST(GREATEST(LENGTH(text), 1) AS DOUBLE)
                            / GREATEST(CAST(len({_D_TOKENS}) AS DOUBLE), CAST(1 AS DOUBLE))
                            BETWEEN 3.0 AND 12.0
                       THEN 1.0 ELSE 0.5 END) * 0.3
               + (1.0 - LEAST(CAST({_D_PUNCT} AS DOUBLE)
                              / CAST(GREATEST(LENGTH(text), 1) AS DOUBLE) * 4.0, 1.0)) * 0.3
                   AS quality,
               CASE WHEN hits.en > hits.es AND hits.en > 0 THEN 'en'
                    WHEN hits.es > hits.en AND hits.es > 0 THEN 'es'
                    ELSE 'unk' END AS lang_guess,
               CAST(len(regexp_extract_all(text,
                   '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+'))
                   AS BIGINT) AS n_bpe_ish,
               CAST(len(regexp_extract_all(text,
                   '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+'))
                   AS DOUBLE)
                 / CAST(GREATEST(len({_D_TOKENS}), 1) AS DOUBLE) AS fertility
        FROM documents d JOIN hits ON d.doc_id = hits.doc_id
    """,
    tags=("text", "tokens"),
)
def text_features(spark, sf_dir):
    """The per-document text-analysis feature vector in ONE scan-fused
    projection: token/punctuation stats, the heuristic quality score,
    stopword-majority language ID, and the BPE-ish subword count + fertility
    (GPT-2-shaped pre-tokenizer regex, lookahead-free so Java and RE2 count
    identically). One pass over `documents`, all row-local Column
    expressions (functions/text.py) — the columns a training pipeline
    filters on before dedup. Consolidates the four single-family demos so
    the whole feature surface sits in one oracle-checked query."""
    from etl_expenses_spark.functions.text import bpe_ish_token_count

    d = T(spark, sf_dir, "documents")
    words = token_count("text")
    bpe = bpe_ish_token_count("text")
    return d.select(
        "doc_id",
        words.alias("n_tokens"),
        punct_count("text").alias("n_punct"),
        (
            punct_count("text").cast("double")
            / F.greatest(F.length("text"), F.lit(1)).cast("double")
        ).alias("punct_ratio"),
        quality_score("text").alias("quality"),
        lang_id("text").alias("lang_guess"),
        bpe.alias("n_bpe_ish"),
        (bpe.cast("double") / F.greatest(words, F.lit(1)).cast("double")).alias("fertility"),
    )


@query(
    "token_frequencies_top20",
    oracle=f"""
        SELECT tok, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
        FROM (SELECT doc_id, unnest({_D_TOKENS.replace('text', 'lower(text)')}) AS tok
              FROM documents)
        GROUP BY tok
        ORDER BY tf DESC, tok
        LIMIT 20
    """,
    tags=("text", "explode", "topk"),
)
def token_frequencies_top20(spark, sf_dir):
    """Corpus term/document frequencies (the wordcount shape): explode the
    token arrays, one hash aggregate over (token), top-20 by frequency.
    At scale the explode multiplies rows ~100×, but partial aggregation
    collapses them map-side before the single shuffle — the plan to check
    is partial_count before Exchange, which Catalyst emits automatically."""
    d = T(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("tf"), F.countDistinct("doc_id").alias("df"))
        .orderBy(F.desc("tf"), "tok")
        .limit(20)
    )


@query(
    "tfidf_top_terms_per_doc",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest({_D_TOKENS.replace('text', 'lower(text)')}) AS tok
            FROM documents WHERE doc_id < 100
        ),
        tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
        df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
        n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM toks),
        scored AS (
            SELECT tf.doc_id, tf.tok,
                   CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS relevance
            FROM tf JOIN df USING (tok) CROSS JOIN n
        ),
        ranked AS (
            SELECT doc_id, tok, relevance,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY relevance DESC, tok) AS rk
            FROM scored
        )
        SELECT doc_id, tok, relevance FROM ranked WHERE rk <= 3
    """,
    tags=("text", "tfidf", "join", "window"),
)
def tfidf_top_terms_per_doc(spark, sf_dir):
    """TF-IDF-style term relevance, top-3 terms per document.

    Deliberately LOG-FREE: relevance = tf × N / df is order-isomorphic to
    tf×idf for ranking within a document, and stays in exact integer/rational
    arithmetic — java.lang.Math.log and libm log differ in the last ulp, so
    a log-based score couldn't be compared bit-exact across engines.
    Plan: explode → two hash aggregates (tf by (doc,term), df by term) →
    broadcast the df side (vocabulary ≪ corpus) → per-doc window top-k.
    At 100 TB the df table is the only global structure and it's
    vocabulary-sized; everything else partitions by doc."""
    toks = (
        T(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
        .persist()
    )
    track(toks)
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df = toks.groupBy("tok").agg(F.count_distinct("doc_id").alias("df"))
    n_docs = toks.agg(F.count_distinct("doc_id").alias("n_docs"))
    from pyspark.sql.window import Window as W

    scored = (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")).alias(
                "relevance"
            ),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("relevance"), "tok")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "tok", "relevance")
    )


@query(
    "explode_outer_rare_tokens",
    oracle=f"""
        WITH l AS (
            SELECT doc_id,
                   list_filter({_D_TOKENS}, t -> len(t) > 6) AS rare
            FROM documents WHERE doc_id < 300
        )
        SELECT doc_id,
               unnest(CASE WHEN len(rare) = 0 THEN [CAST(NULL AS VARCHAR)]
                           ELSE rare END) AS rare_token
        FROM l
    """,
    tags=("text", "explode", "nulls"),
)
def explode_outer_rare_tokens(spark, sf_dir):
    """explode_outer: documents with NO rare (>6-char) tokens keep one NULL
    row instead of vanishing — the left-join-flavored explode a coverage
    report needs (plain explode silently drops empty documents from the
    denominator). DuckDB twin: unnest of a NULL-sentinel list."""
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    rare = F.filter(tokens(F.col("text")), lambda t: F.length(t) > 6)
    return d.select("doc_id", F.explode_outer(rare).alias("rare_token"))


@query(
    "doc_chunk_sliding",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {_D_TOKENS} AS toks FROM documents),
        s AS (
            SELECT doc_id, toks, unnest(range(0, len(toks), 32)) AS start
            FROM t WHERE len(toks) > 0)
        SELECT doc_id,
               CAST(start / 32 AS BIGINT) AS chunk_no,
               CAST(least(start + 64, len(toks)) - start AS BIGINT) AS n_chunk_tokens,
               array_to_string(list_slice(toks, start + 1, least(start + 64, len(toks))), ' ')
                   AS chunk_text
        FROM s
    """,
    tags=("text", "chunking", "rag"),
)
def doc_chunk_sliding(spark, sf_dir):
    """RAG-style document chunking: overlapping token windows (size 64,
    stride 32 → 50% overlap), the 1-doc→N-chunks stage every retrieval /
    embedding pipeline runs before vectorization. Pure array algebra —
    sequence → posexplode-by-start → slice — no Python, so the explosion
    stays in the scan stage's codegen and partitions by doc_id afterwards.
    At 100 TB chunk_no becomes part of the downstream embedding key."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).filter(F.size("toks") > 0)
    starts = F.sequence(F.lit(0), F.size("toks") - 1, F.lit(32))
    chunk = F.slice(F.col("toks"), F.col("start") + 1, F.lit(64))
    return (
        d.select("doc_id", "toks", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            (F.col("start") / 32).cast("long").alias("chunk_no"),
            F.size(chunk).cast("long").alias("n_chunk_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


@query(
    "text_redact_pii",
    oracle=r"""
        WITH synth AS (
            SELECT doc_id,
                   'doc ' || CAST(doc_id AS VARCHAR) || ' contact user' ||
                   CAST(doc_id AS VARCHAR) || '@mail.example.com or +54 11 ' ||
                   CAST(4000 + doc_id % 1000 AS VARCHAR) || '-' ||
                   CAST(1000 + doc_id % 9000 AS VARCHAR) || ' office'
                       AS contact_line
            FROM documents)
        SELECT doc_id, contact_line,
               regexp_replace(
                   regexp_replace(contact_line,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                   '\+\d+[- ]\d+[- ]\d+-\d+', '[PHONE]', 'g') AS redacted
        FROM synth
    """,
    tags=("text", "redaction", "pii"),
)
def text_redact_pii(spark, sf_dir):
    """PII redaction — the compliance pass a training corpus runs before
    release: mask emails and phone numbers with typed placeholders. The
    PII is synthesized deterministically from doc_id (the corpus itself is
    synthetic), then redacted with the same lookahead-free regexes in both
    engines. Row-local regexp_replace chains — scan-fused, no Python."""
    d = T(spark, sf_dir, "documents")
    contact = F.concat(
        F.lit("doc "), F.col("doc_id").cast("string"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or +54 11 "),
        (F.lit(4000) + F.col("doc_id") % 1000).cast("string"),
        F.lit("-"),
        (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
        F.lit(" office"),
    )
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_re = r"\+\d+[- ]\d+[- ]\d+-\d+"
    return d.select(
        "doc_id",
        contact.alias("contact_line"),
        F.regexp_replace(
            F.regexp_replace(contact, email_re, "[EMAIL]"), phone_re, "[PHONE]"
        ).alias("redacted"),
    )


@query(
    "text_repetition_ratio",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {_D_TOKENS.replace("text", "lower(text)")} AS toks
            FROM documents),
        bg AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(toks)),
                                         i -> toks[i] || ' ' || toks[i + 1])) AS bigram
            FROM t WHERE len(toks) >= 2),
        counts AS (
            SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY doc_id, bigram)
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_bigrams,
               CAST(MAX(c) AS BIGINT) AS max_bigram_count,
               CAST(MAX(c) AS DOUBLE) / SUM(c) AS repetition_ratio
        FROM counts GROUP BY doc_id
    """,
    tags=("text", "quality", "dedup"),
)
def text_repetition_ratio(spark, sf_dir):
    """Repetition-ratio quality signal: share of a document's bigrams taken
    by its single most frequent bigram — the cheap detector for boilerplate
    / template / keyword-stuffed documents that near-dup similarity misses
    (the page repeats ITSELF, not another page). Filter threshold upstream
    of pretraining. explode → two hash aggregates keyed by doc_id — partial
    aggregation collapses the bigram explosion map-side."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.lower(F.col("text"))).alias("toks")
    ).filter(F.size("toks") >= 2)
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 1),
        lambda i: F.concat_ws(" ", F.element_at("toks", i), F.element_at("toks", i + 1)),
    )
    counts = (
        d.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.max("c").alias("max_bigram_count"),
        (F.max("c").cast("double") / F.sum("c")).alias("repetition_ratio"),
    )


@query(
    "corpus_mixture_rebalance",
    oracle=f"""
        WITH docs AS (
            SELECT doc_id, source,
                   CAST(len({_D_TOKENS}) AS BIGINT) AS n_tokens
            FROM documents),
        per_src AS (
            SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens
            FROM docs GROUP BY source),
        tot AS (
            SELECT CAST(SUM(src_tokens) AS BIGINT) AS total_tokens,
                   COUNT(*) AS n_sources
            FROM per_src),
        budget AS (
            SELECT p.source, p.src_tokens,
                   LEAST(CAST(10000 AS BIGINT),
                         CAST(FLOOR(0.6 * t.total_tokens * 10000.0
                                    / (t.n_sources * p.src_tokens)) AS BIGINT))
                       AS keep_bp
            FROM per_src p, tot t)
        SELECT d.doc_id, d.source, d.n_tokens, b.keep_bp
        FROM docs d
        JOIN budget b ON b.source = d.source
        WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR) || '|mix'), 1, 8))
                   AS BIGINT) % 10000 < b.keep_bp
    """,
    tags=("text", "sample", "training", "mixture"),
)
def corpus_mixture_rebalance(spark, sf_dir):
    """Corpus MIXTURE rebalancing — the data-mixing step of pretraining:
    give every source an equal share of a token budget (60% of the mean
    source size here), turn each source's budget into a keep-fraction in
    basis points, and admit documents by deterministic hash threshold.
    Over-represented sources get downsampled; small sources keep
    everything (fraction capped at 1).

    Two aggregates (per-source, then 1-row total) + a broadcast join of
    the ~|sources| budget table back onto the corpus — the corpus itself
    shuffles zero times, and the hash-threshold draw is admission-stable
    under corpus growth, same property as sample_stratified_by_lang."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id", "source", token_count("text").alias("n_tokens")
    )
    per_src = d.groupBy("source").agg(F.sum("n_tokens").cast("bigint").alias("src_tokens"))
    tot = per_src.agg(
        F.sum("src_tokens").cast("bigint").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    budget = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(10000).cast("bigint"),
            F.floor(
                F.lit(0.6)
                * F.col("total_tokens")
                * 10000.0
                / (F.col("n_sources") * F.col("src_tokens"))
            ).cast("bigint"),
        ).alias("keep_bp"),
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|mix"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 10000
    )
    return (
        d.join(F.broadcast(budget), "source")
        .filter(bucket < F.col("keep_bp"))
        .select("doc_id", "source", "n_tokens", "keep_bp")
    )


@query(
    "corpus_pack_sequences",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, source,
                   CAST(len({_D_TOKENS}) AS BIGINT) AS n_tokens
            FROM documents),
        c AS (
            SELECT doc_id, source, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cum_before
            FROM d)
        SELECT doc_id, source, n_tokens,
               CAST(FLOOR(cum_before / 2048) AS BIGINT) AS seq_id,
               CAST(cum_before % 2048 AS BIGINT) AS seq_offset
        FROM c
    """,
    tags=("text", "packing", "training"),
)
def corpus_pack_sequences(spark, sf_dir):
    """Sequence PACKING — the last step before tokenized pretraining data
    ships: concatenate documents (per source, in stable doc_id order) into
    fixed 2048-token training sequences, assigning each document the
    sequence it STARTS in and its token offset there. One window over
    (source, doc_id) — integer cumulative sums, so the assignment is
    bit-deterministic and incremental (appending documents never moves
    earlier ones). At 100 TB the partition key is source (or a
    hash-bucketed refinement) and the window never materializes more than
    a partition's running counter."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id", "source", token_count("text").alias("n_tokens")
    )
    from pyspark.sql.window import Window as W

    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return d.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(cum_before / 2048).cast("long").alias("seq_id"),
        (cum_before % 2048).cast("long").alias("seq_offset"),
    )


@query(
    "text_normalize_spanish",
    oracle="""
        WITH synth AS (
            SELECT doc_id,
                   'Categoría: ' ||
                   CASE doc_id % 4 WHEN 0 THEN 'Almacén'
                                   WHEN 1 THEN 'Carnicería'
                                   WHEN 2 THEN 'Panadería'
                                   ELSE 'Electrónica' END ||
                   '  — Año ' || CAST(2020 + doc_id % 5 AS VARCHAR) ||
                   '  ÑANDÚ  ' AS raw
            FROM documents)
        SELECT doc_id, raw,
               trim(regexp_replace(
                   translate(lower(raw),
                             'áéíóúüñ', 'aeiouun'),
                   '\\s+', ' ', 'g')) AS norm
        FROM synth
    """,
    tags=("text", "normalize", "locale"),
)
def text_normalize_spanish(spark, sf_dir):
    """Locale text normalization — the matching key every Spanish-language
    pipeline needs before joins/dedup (the reference's categories and
    merchants carry accents inconsistently across sources): lowercase,
    fold the Spanish accent set (áéíóúüñ → aeiouun) with a single
    ``translate`` (O(1) per char; `regexp_replace` per accent would be 7
    regex passes), collapse whitespace, trim. Identical translate/regex
    chains in both engines; scan-fused, no Python."""
    d = T(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("Categoría: "),
        F.element_at(
            F.array(
                F.lit("Almacén"), F.lit("Carnicería"),
                F.lit("Panadería"), F.lit("Electrónica"),
            ),
            (F.col("doc_id") % 4 + 1).cast("int"),
        ),
        F.lit("  — Año "),
        (F.lit(2020) + F.col("doc_id") % 5).cast("string"),
        F.lit("  ÑANDÚ  "),
    )
    norm = F.trim(
        F.regexp_replace(
            F.translate(F.lower(raw), "áéíóúüñ", "aeiouun"), r"\s+", " "
        )
    )
    return d.select("doc_id", raw.alias("raw"), norm.alias("norm"))


@query(
    "vocab_coverage_topk",
    oracle=f"""
        WITH tf AS (
            SELECT t AS tok, COUNT(*) AS n
            FROM (SELECT unnest({_D_TOKENS}) AS t FROM documents)
            GROUP BY t
        ),
        r AS (
            SELECT tok, n, ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rk
            FROM tf
        ),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM tf),
        ks(k) AS (VALUES (100), (1000), (10000))
        SELECT ks.k,
               CAST(SUM(CASE WHEN r.rk <= ks.k THEN r.n ELSE 0 END) AS BIGINT)
                   AS covered,
               (SELECT total FROM tot) AS total,
               CAST(SUM(CASE WHEN r.rk <= ks.k THEN r.n ELSE 0 END) AS DOUBLE)
                   / (SELECT total FROM tot) AS coverage
        FROM r CROSS JOIN ks
        GROUP BY ks.k
    """,
    tags=("text", "vocab", "training"),
)
def vocab_coverage_topk(spark, sf_dir):
    """Vocabulary-sizing curve: what fraction of all corpus token
    occurrences the top-k most frequent token types cover, for k in
    {100, 1k, 10k} — the first number a tokenizer design consults (the
    coverage knee says how large a vocab buys how little OOV).

    Scale shape: term frequencies are one explode→hash-agg (linear in
    token count); the global frequency rank runs over the VOCABULARY-sized
    relation via the two-phase distributed rank (bucketed by a monotone
    function of descending frequency — no single-partition window even
    when the type vocabulary is billions of rows); the k thresholds and
    the grand total broadcast. Ties broken by token text, so both engines
    rank identically."""
    from etl_expenses_spark.operators.prefixsum import distributed_rank

    d = T(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ranked = distributed_rank(
        tf.withColumn("negn", -F.col("n")),
        ["negn", "tok"],
        bucket=F.expr("negn div 16"),
        out_col="rk",
    )
    # fan each vocab row out to the three thresholds with a projection-side
    # explode (no join operator at all — a 3-row crossJoin would plan as a
    # BroadcastNestedLoopJoin, which the plan audit rightly bans), then one
    # hash aggregate per k; every k-group contains ALL vocab rows, so the
    # grand total is just SUM(n) within the group — no second pass either.
    fanned = ranked.select(
        "rk",
        "n",
        F.explode(F.array(*[F.lit(k) for k in (100, 1000, 10000)])).alias("k"),
    )
    return (
        fanned.groupBy("k")
        .agg(
            F.sum(F.when(F.col("rk") <= F.col("k"), F.col("n")).otherwise(0)).alias(
                "covered"
            ),
            F.sum("n").alias("total"),
        )
        .select(
            "k",
            "covered",
            "total",
            (F.col("covered").cast("double") / F.col("total")).alias("coverage"),
        )
    )


@query(
    "token_bigram_counts",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS words FROM documents
        ),
        b AS (
            SELECT words[i + 1] || ' ' || words[i + 2] AS bigram
            FROM t, LATERAL (
                SELECT unnest(range(GREATEST(len(words) - 1, 0))) AS i
            )
        )
        SELECT bigram, COUNT(*) AS n
        FROM b
        GROUP BY bigram
        ORDER BY n DESC, bigram
        LIMIT 20
    """,
    tags=("text", "bpe", "ngram"),
)
def token_bigram_counts(spark, sf_dir):
    """Corpus-wide adjacent-pair (bigram) counts — the distributed half of
    one BPE merge round (operators/bpe.py builds the full trainer on this
    shape) and the standard collocation statistic. Pairs are materialized
    per-doc with array algebra (no self-join on position: transform over
    an index sequence), then one hash aggregate; top-20 under a total
    order. At 100 TB this is explode→count — the same shape as term
    frequencies, cost linear in token count."""
    words = F.split(F.col("text"), " ")
    d = T(spark, sf_dir, "documents").select(words.alias("words"))
    pairs = F.when(
        F.size("words") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("words") - 2),
            lambda i: F.concat(
                F.element_at("words", i + 1), F.lit(" "), F.element_at("words", i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        d.select(F.explode(pairs).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(20)
    )


@query(
    "bpe_trained_segmentation",
    # COMPUTED oracle (r11, VERDICT r10 #2 — replaces the golden pin):
    # the whole BPE pipeline replayed in DuckDB SQL. The key encoding:
    # each symbol is wrapped chr(30)||sym||chr(31), which makes plain
    # REPLACE's left-to-right non-overlapping scan EXACTLY the BPE merge
    # (both symbol boundaries anchored, and adjacent occurrences share no
    # characters — a separator-joined encoding fails both ways). Training
    # = recursive CTE (working table carries the vocab state; each round
    # counts adjacent pairs via regexp_extract_all + lateral unnest,
    # picks ORDER BY cnt DESC, a, b — Python's (-count, pair) tie-break —
    # and REPLACEs; the chosen pair rides the result as a merge row).
    # Segmentation = second recursion applying, per word per round, the
    # lowest-rank leftmost merge by list surgery; a finished word drops
    # out and its final state is the max-g row of the accumulated result.
    oracle="""
        WITH RECURSIVE
        wc AS (
            SELECT word, CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT unnest(string_split(text, ' ')) AS word
                  FROM documents)
            WHERE word <> '' GROUP BY word),
        init AS (
            SELECT word, n,
                   array_to_string(list_transform(
                       range(1, length(word) + 1),
                       i -> chr(30) || word[i] || chr(31)), '')
                   || chr(30) || '</w>' || chr(31) AS s
            FROM wc),
        train(h, s, n, ma, mb) AS (
            SELECT 0, s, n, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
            FROM init
            UNION ALL
            SELECT * FROM (
                WITH prev AS (SELECT h, s, n FROM train WHERE s IS NOT NULL),
                pc AS (
                    SELECT v.h, v.ls[i.i] AS a, v.ls[i.i + 1] AS b,
                           SUM(v.n) AS cnt
                    FROM (SELECT h, n,
                                 regexp_extract_all(s,
                                     chr(30) || '([^' || chr(31) || ']*)'
                                     || chr(31), 1) AS ls
                          FROM prev) v,
                         LATERAL (SELECT unnest(range(1, len(v.ls))) AS i) i
                    GROUP BY 1, 2, 3),
                best AS (SELECT h, a, b FROM pc
                         ORDER BY cnt DESC, a, b LIMIT 1)
                SELECT p.h + 1 AS h,
                       replace(p.s,
                               chr(30) || bt.a || chr(31)
                                   || chr(30) || bt.b || chr(31),
                               chr(30) || bt.a || bt.b || chr(31)) AS s,
                       SUM(p.n) AS n, CAST(NULL AS VARCHAR),
                       CAST(NULL AS VARCHAR)
                FROM prev p, best bt
                GROUP BY 1, 2
                UNION ALL
                SELECT bt.h + 1, NULL, NULL, bt.a, bt.b FROM best bt
            ) WHERE h <= 40
        ),
        merges AS (SELECT h AS rank, ma, mb FROM train WHERE ma IS NOT NULL),
        seg(g, word, s) AS (
            SELECT 0, word, s FROM init
            UNION ALL
            SELECT * FROM (
                WITH cur AS (
                    SELECT g, word, s,
                           regexp_extract_all(s,
                               chr(30) || '([^' || chr(31) || ']*)'
                               || chr(31), 1) AS ls
                    FROM seg),
                cand AS (
                    SELECT c.g, c.word, c.ls, i.i, m.rank
                    FROM cur c,
                         LATERAL (SELECT unnest(range(1, len(c.ls))) AS i) i
                    JOIN merges m
                      ON m.ma = c.ls[i.i] AND m.mb = c.ls[i.i + 1]),
                pick AS (
                    SELECT g, word, ls, i FROM (
                        SELECT *, ROW_NUMBER() OVER (
                            PARTITION BY word ORDER BY rank, i) AS rk
                        FROM cand) WHERE rk = 1)
                SELECT p.g + 1 AS g, p.word,
                       array_to_string(list_transform(
                           list_concat(list_concat(
                               list_slice(p.ls, 1, p.i - 1),
                               [p.ls[p.i] || p.ls[p.i + 1]]),
                               list_slice(p.ls, p.i + 2, len(p.ls))),
                           x -> chr(30) || x || chr(31)), '') AS s
                FROM pick p
            )
        ),
        final AS (
            SELECT word, s FROM seg
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY word ORDER BY g DESC) = 1),
        pieces AS (
            SELECT word,
                   len(regexp_extract_all(s,
                       chr(30) || '([^' || chr(31) || ']*)' || chr(31), 1))
                       AS np,
                   array_to_string(regexp_extract_all(s,
                       chr(30) || '([^' || chr(31) || ']*)' || chr(31), 1),
                       ' ') AS joined
            FROM final),
        docw AS (
            SELECT doc_id, d.ws[i.i] AS word, i.i AS i
            FROM (SELECT doc_id, string_split(text, ' ') AS ws
                  FROM documents) d,
                 LATERAL (SELECT unnest(range(1, len(d.ws) + 1)) AS i) i
            WHERE d.ws[i.i] <> ''),
        firsts AS (
            SELECT doc_id, word FROM docw
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY i) = 1),
        agg AS (
            SELECT d.doc_id, CAST(COUNT(*) AS INT) AS n_words,
                   CAST(SUM(p.np) AS INT) AS n_pieces
            FROM docw d JOIN pieces p USING (word) GROUP BY d.doc_id)
        SELECT doc.doc_id,
               COALESCE(a.n_words, 0) AS n_words,
               COALESCE(a.n_pieces, 0) AS n_pieces,
               COALESCE(p.joined, '') AS first_word_pieces
        FROM (SELECT doc_id FROM documents) doc
        LEFT JOIN agg a USING (doc_id)
        LEFT JOIN firsts f USING (doc_id)
        LEFT JOIN pieces p ON p.word = f.word
    """,
    tags=("text", "bpe"),
)
def bpe_trained_segmentation(spark, sf_dir):
    """End-to-end BPE tokenizer pipeline on the corpus: distributed word
    counting → deterministic driver-side merge training (40 merges over
    the bounded vocabulary — the standard trainer shape; see
    operators/bpe.py) → distributed Arrow-batched segmentation. Output:
    per-doc word/subword-piece counts, the fertility table a tokenizer
    report is built from. Since r11 the oracle is a COMPUTED DuckDB
    replay of BOTH halves (golden pin retired — VERDICT r10 #2): the
    merge loop as a recursive CTE whose bracket-wrapped symbol encoding
    makes plain REPLACE exactly the non-overlapping BPE merge, and the
    greedy lowest-rank segmentation as a second recursion. The trainer's
    algebra is additionally pinned by hand-computable fixtures in
    tests/test_bpe.py. The piece list is surfaced space-joined
    (driver-window contract: no array/struct/map output columns — the
    harness canonicalizes by sorting cell values)."""
    from etl_expenses_spark.operators.bpe import bpe_segment, train_bpe

    d = T(spark, sf_dir, "documents")
    merges = train_bpe(d, n_merges=40)
    return bpe_segment(d, merges).withColumn(
        "first_word_pieces", F.array_join("first_word_pieces", " ")
    )


@query(
    "corpus_summary_card",
    oracle="""
        WITH t AS (
            SELECT doc_id, lang, source, n_chars,
                   LENGTH(TRIM(text)) - LENGTH(REPLACE(TRIM(text), ' ', '')) + 1
                     AS n_tokens
            FROM documents
        )
        SELECT COUNT(*) AS n_docs,
               COUNT(DISTINCT lang) AS n_langs,
               COUNT(DISTINCT source) AS n_sources,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               MIN(n_chars) AS min_chars,
               MAX(n_chars) AS max_chars,
               CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars,
               CAST(SUM(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_short_docs
        FROM t
    """,
    tags=("text", "profile", "dataset_card"),
)
def corpus_summary_card(spark, sf_dir):
    """Dataset-card headline numbers in ONE scan: doc/lang/source counts,
    char and whitespace-token totals, length extremes and mean, short-doc
    count — the summary block every corpus release ships.

    All nine statistics are partial-aggregatable (distincts via two-level
    hash agg), so the whole card costs a single pass over the corpus and
    one tiny shuffle; at 100 TB this is the cheapest honest profile you
    can produce. Token counts use the simple single-space convention so
    the oracle is expressible in portable SQL (the richer tokenizer lives
    in text_token_stats/text_features)."""
    d = T(spark, sf_dir, "documents")
    n_tokens = (
        F.length(F.trim(F.col("text")))
        - F.length(F.replace(F.trim(F.col("text")), F.lit(" "), F.lit("")))
        + 1
    )
    t = d.select("doc_id", "lang", "source", "n_chars", n_tokens.alias("n_tokens"))
    return t.agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("lang").alias("n_langs"),
        F.count_distinct("source").alias("n_sources"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("mean_chars"),
        F.sum(F.when(F.col("n_chars") < 100, 1).otherwise(0)).alias("n_short_docs"),
    )


@query(
    "text_collapse_token_runs",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, {_D_TOKENS} AS t FROM documents
        ),
        k AS (
            SELECT doc_id, t,
                   [t[i] FOR i IN range(1, len(t) + 1)
                         IF i = 1 OR t[i] <> t[i - 1]] AS kept
            FROM w
        )
        SELECT doc_id,
               CAST(len(t) AS BIGINT) AS n_before,
               CAST(len(kept) AS BIGINT) AS n_after,
               array_to_string(kept, ' ') AS cleaned_text
        FROM k
    """,
    tags=("text", "cleaning", "dedup"),
)
def text_collapse_token_runs(spark, sf_dir):
    """Consecutive-token-run collapse — the C4-style intra-document cleanup
    for stutter artifacts ("batch batch batch" -> "batch"): a token
    survives iff it differs from its predecessor. Pure array expression
    (filter with index lambda), scan-fused, zero shuffles — the cheapest
    possible cleaning pass at any scale. Complements text_repetition_ratio,
    which only MEASURES repetition; this op repairs it and reports the
    before/after token budget."""
    d = T(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    # F.get is 0-based and NULL-safe at -1, so coalesce keeps the first
    # token (x != NULL -> NULL only at i = 0).
    kept = F.filter(
        t, lambda x, i: F.coalesce(x != F.get(t, i - 1), F.lit(True))
    )
    return d.select(
        "doc_id",
        F.size(t).cast("long").alias("n_before"),
        F.size(kept).cast("long").alias("n_after"),
        F.array_join(kept, " ").alias("cleaned_text"),
    )


_D_TOKENS_LC = (
    r"list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> t <> '')"
)


@query(
    "boilerplate_bigram_strip",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source, {_D_TOKENS_LC} AS tk FROM documents),
        pos AS (
            SELECT doc_id, source, tk, unnest(range(1, len(tk))) AS i
            FROM toks WHERE len(tk) >= 2),
        bg AS (
            SELECT doc_id, source, array_to_string(tk[i:i+1], ' ') AS bigram
            FROM pos),
        boiler AS (
            SELECT source, bigram FROM bg
            GROUP BY source, bigram HAVING COUNT(DISTINCT doc_id) >= 5)
        SELECT g.doc_id, g.source,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(CASE WHEN b.bigram IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_boiler,
               CAST(SUM(CASE WHEN b.bigram IS NOT NULL THEN 1 ELSE 0 END)
                    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS boiler_frac
        FROM bg g
        LEFT JOIN boiler b ON b.source = g.source AND b.bigram = g.bigram
        GROUP BY g.doc_id, g.source
    """,
    tags=("text", "quality", "boilerplate"),
)
def boilerplate_bigram_strip(spark, sf_dir):
    """CCNet-style corpus-level boilerplate measurement: a bigram is
    boilerplate when it recurs across >= 5 DISTINCT documents of the same
    source (navigation chrome, footers, templates — per-domain repetition
    that within-document repetition metrics miss). Output is the per-doc
    boilerplate fraction a curation gate thresholds on.

    Plan: one bigram explode feeding two hash aggregates (the boilerplate
    vocabulary needs COUNT(DISTINCT doc) per (source, bigram) — map-side
    partial agg collapses the explosion) and one join back on
    (source, bigram). The boilerplate relation is tiny (HAVING >= 5 prunes
    the long tail) but grows with corpus breadth, so it stays a hash join
    under AQE rather than a pinned broadcast. Integer counts end-to-end;
    the fraction is one double division — bit-identical to the oracle."""
    from etl_expenses_spark.operators.dedup import shingles_of_tokens

    base = (
        T(spark, sf_dir, "documents")
        .select(
            "doc_id", "source", tokens(F.lower(F.col("text"))).alias("toks")
        )
        .filter(F.size("toks") >= 2)
    )
    bg = base.select(
        "doc_id",
        "source",
        F.explode(shingles_of_tokens(F.col("toks"), 2)).alias("bigram"),
    )
    boiler = (
        bg.groupBy("source", "bigram")
        .agg(F.countDistinct("doc_id").alias("dd"))
        .filter(F.col("dd") >= 5)
        .select("source", "bigram", F.lit(True).alias("is_boiler"))
    )
    return (
        bg.join(boiler, ["source", "bigram"], "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(
                F.when(F.col("is_boiler"), F.lit(1)).otherwise(F.lit(0))
            ).alias("n_boiler"),
        )
        .select(
            "doc_id",
            "source",
            "n_bigrams",
            "n_boiler",
            (
                F.col("n_boiler").cast("double")
                / F.col("n_bigrams").cast("double")
            ).alias("boiler_frac"),
        )
    )


@query(
    "mojibake_screen_and_fix",
    oracle="""
        WITH raw AS (
            SELECT doc_id,
                   text || ' café piñata añejo vigésimo' AS clean
            FROM documents),
        damaged AS (
            SELECT doc_id, clean,
                   CASE WHEN doc_id % 3 = 0
                        THEN replace(replace(replace(replace(clean,
                             'á', chr(195) || chr(161)),
                             'é', chr(195) || chr(169)),
                             'ñ', chr(195) || chr(177)),
                             'í', chr(195) || chr(173))
                        ELSE clean END AS wire
            FROM raw),
        screened AS (
            SELECT doc_id, clean, wire,
                   CAST(length(wire) - length(replace(wire, chr(195), ''))
                        AS BIGINT) AS n_moji,
                   replace(replace(replace(replace(wire,
                       chr(195) || chr(161), 'á'),
                       chr(195) || chr(169), 'é'),
                       chr(195) || chr(177), 'ñ'),
                       chr(195) || chr(173), 'í') AS fixed
            FROM damaged)
        SELECT doc_id, n_moji > 0 AS had_mojibake, n_moji,
               fixed = clean AS repaired_ok
        FROM screened
    """,
    tags=("text", "quality", "encoding"),
)
def mojibake_screen_and_fix(spark, sf_dir):
    """Encoding-damage screen + repair (ftfy-lite): detect UTF-8-bytes-
    read-as-Latin-1 mojibake (the 'Ã©'-for-'é' family — the single most
    common corpus encoding defect) and un-damage it with the inverse
    digraph mapping. The fixture plants the damage deterministically (every
    doc gets an accented suffix; doc_id % 3 == 0 docs are corrupted with
    the REAL UTF-8-as-Latin-1 digraphs 'Ã¡ Ã© Ã± Ã­'), so `repaired_ok`
    must be TRUE everywhere — the oracle proves detection count and repair
    are exact. Pure string expressions end-to-end: whole-stage codegen, no
    UDF, no shuffle until display; at 100 TB this is a free map stage
    fused into whatever scan feeds it. The marker count uses UTF-8-aware
    length arithmetic on the 'Ã' (U+00C3) lead character, identical in
    both engines."""
    A_TILDE = "Ã"  # the Latin-1 lead byte of 2-byte UTF-8 sequences
    moji = {"Ã¡": "á", "Ã©": "é",
            "Ã±": "ñ", "Ã­": "í"}

    clean = F.concat(F.col("text"), F.lit(" café piñata añejo vigésimo"))
    wire = clean
    for fixed_ch, damaged in (("á", "Ã¡"), ("é", "Ã©"),
                              ("ñ", "Ã±"), ("í", "Ã­")):
        wire = F.replace(wire, F.lit(fixed_ch), F.lit(damaged))
    wire = F.when(F.col("doc_id") % 3 == 0, wire).otherwise(clean)

    repaired = F.col("wire")
    for damaged, fixed_ch in moji.items():
        repaired = F.replace(repaired, F.lit(damaged), F.lit(fixed_ch))
    n_moji = (
        F.length("wire") - F.length(F.replace(F.col("wire"), F.lit(A_TILDE)))
    ).cast("long")

    return (
        T(spark, sf_dir, "documents")
        .select("doc_id", clean.alias("clean"), wire.alias("wire"))
        .select(
            "doc_id",
            (n_moji > 0).alias("had_mojibake"),
            n_moji.alias("n_moji"),
            (repaired == F.col("clean")).alias("repaired_ok"),
        )
    )


@query(
    "gopher_dup_ngram_chars",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {_D_TOKENS.replace("text", "lower(text)")} AS toks
            FROM documents),
        g AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(toks) - 3),
                          i -> toks[i] || ' ' || toks[i + 1] || ' ' ||
                               toks[i + 2] || ' ' || toks[i + 3] || ' ' ||
                               toks[i + 4])) AS gram
            FROM t WHERE len(toks) >= 5),
        counts AS (
            SELECT doc_id, gram, COUNT(*) AS c, LENGTH(gram) AS glen
            FROM g GROUP BY doc_id, gram)
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN c > 1 THEN c * glen ELSE 0 END) AS BIGINT)
                   AS dup_gram_chars,
               CAST(SUM(c * glen) AS BIGINT) AS total_gram_chars,
               CAST(SUM(CASE WHEN c > 1 THEN c * glen ELSE 0 END) AS DOUBLE)
                   / SUM(c * glen) AS dup_char_fraction
        FROM counts GROUP BY doc_id
    """,
    tags=("text", "quality", "dedup"),
)
def gopher_dup_ngram_chars(spark, sf_dir):
    """Duplicated-5-gram character fraction — the within-document
    repetition signal from the Gopher quality-filter family (Rae et al.
    2021, "fraction of characters in duplicate n-grams"): what share of a
    document's 5-gram character mass belongs to 5-grams that occur more
    than once? Complements text_repetition_ratio (which only looks at the
    single top bigram): this catches documents whose repetition is spread
    across MANY repeated phrases. Character mass is counted as
    count * len(gram) per distinct gram — the standard overlap-free
    simplification. explode -> two hash aggregates keyed by doc_id;
    partial aggregation collapses the gram explosion map-side, and integer
    counts make the one final division the only float op."""
    d = (
        T(spark, sf_dir, "documents")
        .select("doc_id", tokens(F.lower(F.col("text"))).alias("toks"))
        .filter(F.size("toks") >= 5)
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 4),
        lambda i: F.concat_ws(
            " ",
            F.element_at("toks", i),
            F.element_at("toks", i + 1),
            F.element_at("toks", i + 2),
            F.element_at("toks", i + 3),
            F.element_at("toks", i + 4),
        ),
    )
    counts = (
        d.select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("glen", F.length("gram"))
    )
    dup_mass = F.sum(F.when(F.col("c") > 1, F.col("c") * F.col("glen")).otherwise(0))
    tot_mass = F.sum(F.col("c") * F.col("glen"))
    return counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        dup_mass.alias("dup_gram_chars"),
        tot_mass.alias("total_gram_chars"),
        (dup_mass.cast("double") / tot_mass).alias("dup_char_fraction"),
    )


@query(
    "quality_percentile_gate_by_lang",
    oracle=f"""
        WITH q AS (
            SELECT doc_id, lang,
                   LEAST(CAST(len({_D_TOKENS}) AS DOUBLE) / 64.0, 1.0) * 0.4
                   + (CASE WHEN CAST(GREATEST(LENGTH(text), 1) AS DOUBLE)
                                / GREATEST(CAST(len({_D_TOKENS}) AS DOUBLE),
                                           CAST(1 AS DOUBLE))
                                BETWEEN 3.0 AND 12.0
                           THEN 1.0 ELSE 0.5 END) * 0.3
                   + (1.0 - LEAST(CAST({_D_PUNCT} AS DOUBLE)
                                  / CAST(GREATEST(LENGTH(text), 1) AS DOUBLE)
                                  * 4.0, 1.0)) * 0.3 AS quality
            FROM documents),
        r AS (
            SELECT doc_id, lang, quality,
                   ROW_NUMBER() OVER (PARTITION BY lang
                                      ORDER BY quality, doc_id) AS rn,
                   COUNT(*) OVER (PARTITION BY lang) AS n_lang
            FROM q)
        SELECT doc_id, lang, quality, CAST(rn AS BIGINT) AS rn,
               CAST(n_lang AS BIGINT) AS n_lang
        FROM r WHERE rn * 4 > n_lang
    """,
    tags=("text", "quality", "training", "window"),
)
def quality_percentile_gate_by_lang(spark, sf_dir):
    """DYNAMIC quality gate: drop each language's bottom quartile by
    heuristic quality score — the per-stratum relative threshold used when
    a single absolute cutoff would gut low-resource languages (the same
    score distribution sits much lower for them). Rank-based, so the gate
    is an INTEGER comparison (rn*4 > n_lang): no percentile interpolation
    doubles to diverge on. Per-row quality doubles are identical across
    engines (same IEEE ops — the oracle-checked text_quality_score
    expression); (quality, doc_id) makes the order total.

    Scale shape: one window partitioned by lang. Lang cardinality is
    small-and-bounded while partitions are huge, so the per-lang sort is
    the cost — if a single language dominates, swap the window for the
    distributed two-phase rank in operators/prefixsum.py (same output,
    shuffle-balanced); at this corpus the window is the simpler right
    plan."""
    from pyspark.sql.window import Window as W

    d = T(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy("quality", "doc_id")
    q = d.select(
        "doc_id", "lang", quality_score("text").alias("quality")
    ).select(
        "doc_id",
        "lang",
        "quality",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("lang")).alias("n_lang"),
    )
    return q.filter(F.col("rn") * 4 > F.col("n_lang")).select(
        "doc_id",
        "lang",
        "quality",
        F.col("rn").cast("bigint").alias("rn"),
        F.col("n_lang").cast("bigint").alias("n_lang"),
    )


@query(
    "vocab_drift_topk",
    oracle=f"""
        WITH toks AS (
            SELECT CASE WHEN CAST(substr(source, 4) AS BIGINT) % 2 = 0
                        THEN 'a' ELSE 'b' END AS half,
                   unnest({_D_TOKENS.replace("text", "lower(text)")}) AS term
            FROM documents),
        c AS (
            SELECT term,
                   SUM(CASE WHEN half = 'a' THEN 1 ELSE 0 END) AS n_a,
                   SUM(CASE WHEN half = 'b' THEN 1 ELSE 0 END) AS n_b
            FROM toks GROUP BY term),
        tot AS (
            SELECT CAST(SUM(n_a) AS BIGINT) AS ta,
                   CAST(SUM(n_b) AS BIGINT) AS tb FROM c)
        SELECT term, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
               CAST(ABS(n_a * tb - n_b * ta) AS BIGINT) AS scaled_drift
        FROM c, tot
        ORDER BY scaled_drift DESC, term
        LIMIT 20
    """,
    tags=("text", "drift", "training", "topk"),
)
def vocab_drift_topk(spark, sf_dir):
    """Vocabulary drift between two corpus halves (even- vs odd-numbered
    sources): the terms whose relative frequency differs most — the
    domain-shift detector run before mixing a new crawl into the training
    set. Drift is the cross-multiplied integer |n_a*T_b - n_b*T_a|
    (proportional to the difference of relative frequencies scaled by
    T_a*T_b), so ranking needs no division and no floats anywhere —
    bit-exact ordering across engines, with the term as tiebreaker. One
    explode -> one hash aggregate keyed by term -> 1-row total broadcast
    -> TopK."""
    half = F.when(
        F.substring("source", 4, 10).cast("bigint") % 2 == 0, "a"
    ).otherwise("b")
    toks = (
        T(spark, sf_dir, "documents")
        .select(half.alias("half"), F.explode(tokens(F.lower(F.col("text")))).alias("term"))
    )
    c = toks.groupBy("term").agg(
        F.sum(F.when(F.col("half") == "a", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("half") == "b", 1).otherwise(0)).alias("n_b"),
    )
    tot = c.agg(
        F.sum("n_a").cast("bigint").alias("ta"),
        F.sum("n_b").cast("bigint").alias("tb"),
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            "term",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.abs(F.col("n_a") * F.col("tb") - F.col("n_b") * F.col("ta"))
            .cast("bigint")
            .alias("scaled_drift"),
        )
        .orderBy(F.desc("scaled_drift"), F.asc("term"))
        .limit(20)
    )


@query(
    "url_canonicalize_dedup",
    oracle="""
        WITH raw AS (
            SELECT doc_id,
                   CASE doc_id % 6
                     WHEN 0 THEN 'http://example' || (doc_id % 7) || '.com/p/'
                                 || (doc_id % 50) || '?a=1&b=2'
                     WHEN 1 THEN 'HTTP://EXAMPLE' || (doc_id % 7) || '.COM:80/p/'
                                 || (doc_id % 50) || '?a=1&b=2'
                     WHEN 2 THEN 'http://example' || (doc_id % 7) || '.com/p/'
                                 || (doc_id % 50) || '?utm_source=news&a=1&b=2'
                     WHEN 3 THEN 'http://example' || (doc_id % 7) || '.com/p/'
                                 || (doc_id % 50) || '?b=2&a=1&fbclid=xyz'
                     WHEN 4 THEN 'http://example' || (doc_id % 7) || '.com/p/'
                                 || (doc_id % 50) || '?a=1&b=2#section-3'
                     ELSE 'https://example' || (doc_id % 7) || '.com:443/p/'
                          || (doc_id % 50) || '/?a=1&b=2'
                   END AS url
            FROM documents),
        parts AS (
            SELECT doc_id,
                   regexp_replace(url, '#.*$', '', 's') AS nofrag
            FROM raw),
        split_ AS (
            SELECT doc_id,
                   lower(regexp_extract(nofrag, '^([A-Za-z]+)://', 1)) AS scheme,
                   regexp_replace(
                       lower(regexp_extract(nofrag, '^[A-Za-z]+://([^/?]+)', 1)),
                       ':(80|443)$', '') AS host,
                   regexp_extract(regexp_replace(nofrag, '^[A-Za-z]+://[^/?]*', ''),
                                  '^([^?]*)', 1) AS path,
                   CASE WHEN nofrag LIKE '%?%'
                        THEN regexp_replace(nofrag, '^[^?]*\\?', '')
                        ELSE '' END AS qs
            FROM parts),
        canon AS (
            SELECT doc_id,
                   scheme || '://' || host
                   || CASE WHEN regexp_replace(path, '/+$', '') = ''
                           THEN '/' ELSE regexp_replace(path, '/+$', '') END
                   || CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END AS canon_url
            FROM (
                SELECT doc_id, scheme, host, path,
                       array_to_string(
                           list_sort(list_filter(string_split(qs, '&'),
                                     p -> p NOT LIKE 'utm_%'
                                          AND p NOT LIKE 'fbclid=%'
                                          AND p <> '')),
                           '&') AS q2
                FROM split_))
        SELECT canon_url,
               CAST(COUNT(*) AS BIGINT) AS n_urls,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               MIN(doc_id) AS first_doc
        FROM canon
        GROUP BY canon_url
    """,
    tags=("text", "curation", "url", "dedup"),
)
def url_canonicalize_dedup(spark, sf_dir):
    """URL canonicalization + exact URL-level dedup — the first pass of
    every web-crawl curation pipeline (C4/CommonCrawl lineage): the same
    page arrives under scheme/host case variants, default ports, tracking
    parameters (utm_*, fbclid), shuffled query order, fragments, and
    trailing slashes; canonicalizing BEFORE content dedup collapses these
    for free, without shingling a single byte. Six messy variants are
    derived deterministically per doc_id (so the oracle reproduces them);
    the canonicalizer is a pure scan-fused JVM expression chain — regexes
    for scheme/host/port/fragment, array algebra (split → filter lambda →
    sort_array → array_join) for the query string — with byte-identical
    semantics declared on both engines. Zero shuffles before the final
    canonical-key aggregate; at 100 TB the only shuffled relation is
    (canon_url, doc_id), and the aggregate is map-side combined."""
    raw = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            """
            CASE doc_id % 6
              WHEN 0 THEN concat('http://example', doc_id % 7, '.com/p/',
                                 doc_id % 50, '?a=1&b=2')
              WHEN 1 THEN concat('HTTP://EXAMPLE', doc_id % 7, '.COM:80/p/',
                                 doc_id % 50, '?a=1&b=2')
              WHEN 2 THEN concat('http://example', doc_id % 7, '.com/p/',
                                 doc_id % 50, '?utm_source=news&a=1&b=2')
              WHEN 3 THEN concat('http://example', doc_id % 7, '.com/p/',
                                 doc_id % 50, '?b=2&a=1&fbclid=xyz')
              WHEN 4 THEN concat('http://example', doc_id % 7, '.com/p/',
                                 doc_id % 50, '?a=1&b=2#section-3')
              ELSE concat('https://example', doc_id % 7, '.com:443/p/',
                          doc_id % 50, '/?a=1&b=2')
            END
            """
        ).alias("url"),
    )
    nofrag = F.regexp_replace("url", "#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, "^([A-Za-z]+)://", 1))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(nofrag, "^[A-Za-z]+://([^/?]+)", 1)),
        ":(80|443)$",
        "",
    )
    pathq = F.regexp_replace(nofrag, "^[A-Za-z]+://[^/?]*", "")
    path = F.regexp_extract(pathq, "^([^?]*)", 1)
    path_norm = F.when(
        F.regexp_replace(path, "/+$", "") == "", F.lit("/")
    ).otherwise(F.regexp_replace(path, "/+$", ""))
    qstr = F.when(
        nofrag.contains("?"), F.regexp_replace(nofrag, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    q2 = F.array_join(
        F.array_sort(
            F.filter(
                F.split(qstr, "&"),
                lambda p: (~p.startswith("utm_"))
                & (~p.startswith("fbclid="))
                & (p != ""),
            )
        ),
        "&",
    )
    canon = raw.select(
        "doc_id",
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path_norm,
            F.when(q2 == "", F.lit("")).otherwise(F.concat(F.lit("?"), q2)),
        ).alias("canon_url"),
    )
    return canon.groupBy("canon_url").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_urls"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
    )


@query(
    "text_nfc_normalize",
    oracle="""
        WITH raw AS (
            SELECT doc_id,
                   substr(text, 1, 24)
                   || CASE doc_id % 4
                        WHEN 0 THEN ' cafe' || chr(769) || ' ole' || chr(769)
                        WHEN 1 THEN ' man' || chr(771) || 'ana'
                        WHEN 2 THEN ' u' || chr(776) || 'ber'
                        ELSE ''
                      END AS s
            FROM documents),
        norm AS (
            SELECT doc_id, s, nfc_normalize(s) AS ns FROM raw)
        SELECT doc_id,
               CAST(length(s) AS BIGINT) AS cp_before,
               CAST(length(ns) AS BIGINT) AS cp_after,
               (s <> ns) AS changed,
               right(ns, 10) AS tail10
        FROM norm
    """,
    tags=("text", "unicode", "normalize"),
)
def text_nfc_normalize(spark, sf_dir):
    """Unicode NFC normalization — the canonicalization every multilingual
    corpus needs BEFORE hashing/dedup/joins: 'é' arrives both precomposed
    (U+00E9) and decomposed (e + U+0301), and a byte-level exact dedup or
    group-by key treats them as different documents. Spark ships no NFC
    builtin, so this is the legitimate Python-stage case: Arrow-batched
    mapInPandas over `unicodedata.normalize` (C-implemented, vectorized
    per batch), with DuckDB's native `nfc_normalize` as the independent
    oracle — two unrelated Unicode implementations agreeing on code-point
    counts and normalized bytes IS the check. Decomposed suffixes are
    planted deterministically per doc_id (the synthetic corpus is ASCII,
    which NFC fixes as a no-op — the planted rows prove the non-trivial
    path). Scale shape: one scan-fused Python stage, zero shuffles; cost
    is O(bytes), pipeline-parallel with the scan."""
    import pandas as pd
    import unicodedata

    raw = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 24),
            # decomposed forms (base + combining mark), matching the
            # oracle's chr() concatenations -- NFC recomposes both
            F.when(F.col("doc_id") % 4 == 0, F.lit(" cafe\u0301 ole\u0301"))
            .when(F.col("doc_id") % 4 == 1, F.lit(" man\u0303ana"))
            .when(F.col("doc_id") % 4 == 2, F.lit(" u\u0308ber"))
            .otherwise(F.lit("")),
        ).alias("s"),
    )

    def norm(batches):
        for b in batches:
            ns = b["s"].map(lambda x: unicodedata.normalize("NFC", x))
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "cp_before": b["s"].str.len().astype("int64"),
                    "cp_after": ns.str.len().astype("int64"),
                    "changed": (b["s"] != ns),
                    "tail10": ns.str.slice(-10),
                }
            )

    return raw.mapInPandas(
        norm,
        schema="doc_id bigint, cp_before bigint, cp_after bigint, "
        "changed boolean, tail10 string",
    )


@query(
    "training_sequence_packing",
    # Exact computed oracle: greedy boundary-respecting packing is a
    # sequential fold, which the oracle replays as a per-group recursive
    # CTE stepping through the doc_id-ordered rank (working set = one row
    # per group per step — iterations bounded by the largest group, not
    # the table). Token counts are the whitespace tokenizer both engines
    # already share, so the entire assignment is bit-deterministic.
    oracle=r"""
        WITH RECURSIVE d AS (
            SELECT source, doc_id,
                   CAST(len(list_filter(regexp_split_to_array(trim(text),
                        '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
                       AS rn
            FROM documents),
        pack(source, rn, doc_id, n_tokens, bin_id, fill) AS (
            SELECT source, rn, doc_id, n_tokens,
                   CAST(0 AS BIGINT), n_tokens
            FROM d WHERE rn = 1
            UNION ALL
            SELECT d.source, d.rn, d.doc_id, d.n_tokens,
                   CASE WHEN p.fill + d.n_tokens > 512
                        THEN p.bin_id + 1 ELSE p.bin_id END,
                   CASE WHEN p.fill + d.n_tokens > 512
                        THEN d.n_tokens ELSE p.fill + d.n_tokens END
            FROM pack p JOIN d ON d.source = p.source AND d.rn = p.rn + 1)
        SELECT source, doc_id, n_tokens, bin_id,
               CAST(fill AS BIGINT) AS bin_fill_after
        FROM pack
    """,
    tags=("training", "packing", "text"),
)
def training_sequence_packing(spark, sf_dir):
    """SEQUENCE PACKING for training-data assembly: greedy
    boundary-respecting fill of fixed token-budget windows (C=512) — the
    step between a curated corpus and a token-efficient training run.
    Documents are packed in doc_id order; a doc that would overflow the
    current window starts a new one, so no document ever straddles a
    window (no cross-document attention leakage) and padding waste is
    bounded by the tail of each window. A doc longer than C gets a
    dedicated window (truncation is the trainer's policy call, not the
    packer's).

    Scale shape: packing is a SEQUENTIAL fold, so the parallel unit is
    the SHARD — bins never cross `source` groups, each group packs
    independently inside one applyInPandas task ordered by doc_id (at
    100 TB the shard list is the natural partition; the per-task loop is
    O(shard), the shuffle is one groupBy). Emits the full per-doc
    assignment (source, doc_id, n_tokens, bin_id, bin_fill_after); the
    greedy-tightness property (every window break was forced) is pinned
    in tests/test_text_ops_extra.py."""
    import pandas as pd

    docs = T(spark, sf_dir, "documents").select(
        "source", "doc_id", token_count("text").alias("n_tokens")
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        bin_ids, fills = [], []
        bin_id, fill = 0, 0
        first = True
        for n in pdf["n_tokens"]:
            n = int(n)
            if first:
                bin_id, fill, first = 0, n, False
            elif fill + n > 512:
                bin_id, fill = bin_id + 1, n
            else:
                fill += n
            bin_ids.append(bin_id)
            fills.append(fill)
        pdf["bin_id"] = pd.Series(bin_ids, dtype="int64")
        pdf["bin_fill_after"] = pd.Series(fills, dtype="int64")
        return pdf

    return docs.groupBy("source").applyInPandas(
        pack,
        schema="source string, doc_id bigint, n_tokens bigint, "
        "bin_id bigint, bin_fill_after bigint",
    )


@query(
    "training_mixture_rebalance",
    # Exact computed oracle: quotas are closed-form double arithmetic over
    # the per-language counts (identical IEEE ops in both engines before
    # the exact FLOOR), and the selection order is the md5 hex string of
    # the doc id — both engines produce the identical digest and compare
    # it lexicographically, so the sampled SET matches bit-for-bit.
    oracle="""
        WITH counts AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY lang),
        w AS (SELECT lang, n, SQRT(CAST(n AS DOUBLE)) AS wt FROM counts),
        tot AS (SELECT SUM(wt) AS sw, SUM(n) AS total FROM w),
        quota AS (
            SELECT lang, n,
                   CAST(FLOOR(0.6 * CAST(total AS DOUBLE) * wt / sw)
                        AS BIGINT) AS lang_quota
            FROM w, tot),
        ranked AS (
            SELECT d.lang, d.doc_id,
                   CAST(ROW_NUMBER() OVER (
                        PARTITION BY d.lang
                        ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id)
                   AS BIGINT) AS sample_rank
            FROM documents d)
        SELECT r.lang, r.doc_id, r.sample_rank, q.lang_quota
        FROM ranked r JOIN quota q USING (lang)
        WHERE r.sample_rank <= q.lang_quota
    """,
    tags=("training", "sampling", "mixture"),
)
def training_mixture_rebalance(spark, sf_dir):
    """TEMPERATURE-REBALANCED MIXTURE SAMPLING (the multilingual-corpus
    recipe: sample language l with probability ∝ n_l^(1/T); T=2 here, the
    sqrt rule): the high-resource head is down-weighted and the tail
    up-weighted relative to natural proportions, under a total budget of
    60% of the corpus. On this data English holds ~41% of documents but
    receives ~29% of the sample (the four tail languages rise from ~15%
    to ~18% each) — the rebalancing a multilingual pretraining run
    applies before tokenization.

    Selection within each language is the lowest-md5-rank prefix — a
    deterministic uniform sample that is also INCREMENTAL-FRIENDLY: the
    hash order is stable under corpus growth, so yesterday's sample is a
    prefix-superset decision, not a reshuffle. A tail language whose
    quota exceeds its size contributes everything it has (true
    upsampling-with-repetition is the trainer's loop, not the sampler's).
    One groupBy for counts (broadcast back — 5 rows), one window per
    language partition for ranks; no shuffle grows with the budget.
    Scale: the quota computation is dimension-sized; the rank window
    shuffles each doc once on lang."""
    docs = T(spark, sf_dir, "documents").select("lang", "doc_id")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = counts.select("lang", "n", F.sqrt(F.col("n").cast("double")).alias("wt"))
    tot = w.agg(
        F.sum("wt").alias("sw"), F.sum("n").cast("double").alias("total")
    )
    quota = w.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.floor(
            F.lit(0.6) * F.col("total") * F.col("wt") / F.col("sw")
        ).cast("bigint").alias("lang_quota"),
    )
    from pyspark.sql.window import Window as W

    ranked = docs.select(
        "lang",
        "doc_id",
        F.row_number()
        .over(
            W.partitionBy("lang").orderBy(
                F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
            )
        )
        .cast("bigint")
        .alias("sample_rank"),
    )
    return ranked.join(F.broadcast(quota), "lang").filter(
        F.col("sample_rank") <= F.col("lang_quota")
    ).select("lang", "doc_id", "sample_rank", "lang_quota")
