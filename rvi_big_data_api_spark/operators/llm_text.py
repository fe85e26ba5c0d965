"""Text-analysis operators (SURVEY.md §2.10): tokenization, TF-IDF, corpus
stats, and heuristic quality filtering over `documents`.

Everything is split/explode/agg — tokenization stays JVM-side (split on the
fixture's single-space delimiter [F]); no Python in the hot path. At 100 TB
the explode output (doc × term) is the big intermediate: it flows straight
into partial aggregation, so the shuffle carries (term, count) partials, not
raw token streams.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..io import load
from ..registry import REGISTRY, query

STOPWORDS = ("data", "table", "value", "row")
QUALITY_MIN_CHARS = 100
QUALITY_MAX_CHARS = 2000
QUALITY_MAX_STOP_RATIO = 0.30


def _tokens(df: DataFrame) -> DataFrame:
    return df.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("term"))


@query(
    "text_tokenize",
    oracle="""
    SELECT term, count(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
    GROUP BY term
    ORDER BY freq DESC, term ASC
    LIMIT 20
    """,
    tags=("llm", "text"),
)
def text_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize → top-20 global term frequencies (term ASC tiebreak)."""
    d = load(spark, sf_dir, "documents")
    return (
        _tokens(d)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("term").asc())
        .limit(20)
    )


@query(
    "text_tfidf",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY term
    ),
    n AS (SELECT count(*)::BIGINT AS n_docs FROM documents)
    SELECT doc_id, term AS top_term, round(tfidf, 6) AS tfidf
    FROM (
        SELECT tf.doc_id, tf.term,
               tf.tf * ln(n.n_docs::DOUBLE / df.df) AS tfidf,
               row_number() OVER (PARTITION BY tf.doc_id
                                  ORDER BY tf.tf * ln(n.n_docs::DOUBLE / df.df) DESC,
                                           tf.term ASC) AS rn
        FROM tf JOIN df USING (term) CROSS JOIN n
    ) WHERE rn = 1
    """,
    tags=("llm", "text"),
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF (tf × ln(N/df)) and the top-scoring term per document.

    Plan shape: two aggregations over one exploded token stream + a broadcast
    of the (small) df table back onto tf — the document count N is a 1-row
    aggregate folded in with crossJoin(broadcast(...)), the oracle's own
    ``CROSS JOIN n`` (the text_cooccurrence_pmi discipline: an eager
    ``d.count()`` here would scan the documents table once for the scalar
    and again in the plan — at 100 TB that doubles the corpus read).
    Deterministic tiebreak: higher tfidf, then lexicographic."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .withColumn("tfidf_raw", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf_raw").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("term").alias("top_term"), F.round("tfidf_raw", 6).alias("tfidf"))
    )


@query(
    "text_stats",
    oracle="""
    WITH base AS (
        SELECT lang,
               count(*)::BIGINT      AS n_docs,
               round(avg(n_chars), 4) AS avg_chars,
               count(DISTINCT source)::BIGINT AS n_sources
        FROM documents GROUP BY lang
    ),
    vocab AS (
        SELECT lang, count(DISTINCT term)::BIGINT AS vocab_size, count(*)::BIGINT AS n_terms
        FROM (SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents)
        GROUP BY lang
    )
    SELECT base.lang, n_docs, avg_chars, n_sources, vocab_size, n_terms
    FROM base JOIN vocab ON base.lang = vocab.lang
    """,
    tags=("llm", "text"),
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile per language: doc counts, avg length, source spread,
    vocabulary size, token volume."""
    d = load(spark, sf_dir, "documents")
    base = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.countDistinct("source").alias("n_sources"),
    )
    vocab = (
        _tokens(d)
        .groupBy("lang")
        .agg(F.countDistinct("term").alias("vocab_size"), F.count(F.lit(1)).alias("n_terms"))
    )
    return base.join(vocab, "lang")


@query(
    "text_quality",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, n_chars,
               len(string_split(text, ' '))::BIGINT AS n_words,
               (n_chars - (len(string_split(text, ' ')) - 1))::DOUBLE
                   / len(string_split(text, ' ')) AS mean_word_len,
               len(list_filter(string_split(text, ' '),
                               w -> w = 'data' OR w = 'table' OR w = 'value' OR w = 'row'))::DOUBLE
                   / len(string_split(text, ' ')) AS stop_ratio
        FROM documents
    )
    SELECT doc_id, n_words, round(mean_word_len, 4) AS mean_word_len,
           round(stop_ratio, 4) AS stop_ratio,
           CASE
             WHEN n_chars < {QUALITY_MIN_CHARS} THEN 'too_short'
             WHEN n_chars > {QUALITY_MAX_CHARS} THEN 'too_long'
             WHEN stop_ratio > {QUALITY_MAX_STOP_RATIO} THEN 'stopword_heavy'
             ELSE 'pass'
           END AS verdict
    FROM scored
    """,
    tags=("llm", "text"),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality filter: length bounds + stopword-ratio band, emitting
    a verdict with the first failing rule (the standard pre-training corpus
    gate, computed entirely with column expressions)."""
    d = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n_words = F.size(words)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    scored = d.select(
        "doc_id",
        "n_chars",
        n_words.cast("long").alias("n_words"),
        ((F.col("n_chars") - (n_words - 1)).cast("double") / n_words).alias("mwl_raw"),
        (n_stop.cast("double") / n_words).alias("stop_raw"),
    )
    return scored.select(
        "doc_id",
        "n_words",
        F.round("mwl_raw", 4).alias("mean_word_len"),
        F.round("stop_raw", 4).alias("stop_ratio"),
        F.when(F.col("n_chars") < QUALITY_MIN_CHARS, "too_short")
        .when(F.col("n_chars") > QUALITY_MAX_CHARS, "too_long")
        .when(F.col("stop_raw") > QUALITY_MAX_STOP_RATIO, "stopword_heavy")
        .otherwise("pass")
        .alias("verdict"),
    )


# Per-language marker terms for the n-gram/stopword language-ID heuristic.
# The fixture corpus shares one vocabulary across langs [F], so scores are
# driven by character-bigram statistics; the heuristic itself is the operator.
LANGID_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "es": ("el", "los", "de"),
    "fr": ("le", "les", "des"),
    "zh": ("de", "shi", "le"),
}


@query(
    "text_langid",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang AS true_lang,
               len(list_filter(string_split(text, ' '),
                               w -> w = 'the' OR w = 'and' OR w = 'of'))::BIGINT  AS s_en,
               len(list_filter(string_split(text, ' '),
                               w -> w = 'der' OR w = 'und' OR w = 'die'))::BIGINT AS s_de,
               len(list_filter(string_split(text, ' '),
                               w -> w = 'el' OR w = 'los'))::BIGINT               AS s_es,
               ((length(text) - length(replace(text, 'th', ''))) // 2)::BIGINT    AS bigram_th,
               ((length(text) - length(replace(text, 'sc', ''))) // 2)::BIGINT    AS bigram_sc
        FROM documents
    )
    SELECT doc_id, true_lang, s_en, s_de, s_es, bigram_th, bigram_sc,
           CASE WHEN s_en >= s_de AND s_en >= s_es THEN 'en'
                WHEN s_de >= s_es THEN 'de'
                ELSE 'es' END AS predicted_lang
    FROM scored
    """,
    tags=("llm", "text"),
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-marker hits + character-bigram counts
    feed a deterministic argmax. Pure column algebra (list_filter HOF +
    replace-based bigram counting) — at 100 TB this is a map-only pass. The
    fixture's text is language-agnostic [F], so accuracy is not the contract;
    the deterministic scoring pipeline is."""
    d = load(spark, sf_dir, "documents")
    words = F.split("text", " ")

    def marker_score(markers: tuple[str, ...]):
        arr = F.array(*[F.lit(m) for m in markers])
        return F.size(F.filter(words, lambda w: F.array_contains(arr, w))).cast("long")

    def bigram_count(bg: str):
        return ((F.length("text") - F.length(F.replace(F.col("text"), F.lit(bg), F.lit("")))) / 2).cast(
            "long"
        )

    s_en = marker_score(LANGID_MARKERS["en"])
    s_de = marker_score(LANGID_MARKERS["de"])
    s_es = marker_score(("el", "los"))
    return d.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        s_en.alias("s_en"),
        s_de.alias("s_de"),
        s_es.alias("s_es"),
        bigram_count("th").alias("bigram_th"),
        bigram_count("sc").alias("bigram_sc"),
        F.when((s_en >= s_de) & (s_en >= s_es), "en")
        .when(s_de >= s_es, "de")
        .otherwise("es")
        .alias("predicted_lang"),
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
               AS set_fingerprint,
           len(list_distinct(string_split(text, ' ')))::BIGINT AS n_unique_terms,
           md5(concat(string_split(text, ' ')[1], '|',
                      string_split(text, ' ')[-1], '|',
                      len(string_split(text, ' '))::VARCHAR)) AS shape_fingerprint
    FROM documents
    """,
    tags=("llm", "text"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: (1) order-insensitive SET fingerprint =
    md5(sorted distinct tokens) — robust to shuffling, the cheap pre-filter
    before shingle-level comparison; (2) a SHAPE fingerprint over
    (first token, last token, length). The rolling-hash/winnowing variant
    (positional min-xxhash64 over shingles) is the MinHash machinery in
    llm_dedup.minhash_signatures — one signature column IS a rolling-hash
    fingerprint."""
    d = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    uniq = F.array_sort(F.array_distinct(words))
    return d.select(
        "doc_id",
        F.md5(F.array_join(uniq, " ")).alias("set_fingerprint"),
        F.size(F.array_distinct(words)).cast("long").alias("n_unique_terms"),
        F.md5(
            F.concat(
                F.element_at(words, 1),
                F.lit("|"),
                F.element_at(words, -1),
                F.lit("|"),
                F.size(words).cast("string"),
            )
        ).alias("shape_fingerprint"),
    )


# Entity-marker masking demo: the fixture corpus has no real PII [F], so the
# "sensitive" terms are stand-ins; the operator contract is the regex pass.
PII_PATTERN = r"\b(customer|key|hash)\b"
PII_REPLACEMENT = "[MASKED]"


@query(
    "text_pii_mask",
    oracle=rf"""
    SELECT doc_id,
           md5(regexp_replace(text, '{PII_PATTERN}', '[MASKED]', 'g')) AS masked_md5,
           len(regexp_extract_all(text, '{PII_PATTERN}'))::BIGINT AS n_masked
    FROM documents
    WHERE len(regexp_extract_all(text, '{PII_PATTERN}')) > 0
    """,
    tags=("llm", "text"),
)
def text_pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII/entity masking — the redaction pass every training-data pipeline
    runs before tokenization: word-boundary regex → replacement token, plus a
    per-doc redaction count for audit. Emits md5(masked_text) rather than the
    full rewritten document so the result stays hash-comparable and small;
    the production sink would keep the text column.

    Map-only — no shuffle at any scale; regexp_replace/regexp_count are
    JVM-side codegen expressions (both engines use the same \\b word-boundary
    semantics, verified by the hash match)."""
    d = load(spark, sf_dir, "documents")
    n_masked = F.regexp_count("text", F.lit(PII_PATTERN))
    return (
        d.select(
            "doc_id",
            F.md5(F.regexp_replace("text", PII_PATTERN, PII_REPLACEMENT)).alias("masked_md5"),
            n_masked.cast("long").alias("n_masked"),
        )
        .filter(F.col("n_masked") > 0)
    )


TOKEN_BUDGET_PER_LANG = 5000


@query(
    "corpus_token_budget",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, lang, n_chars,
               len(string_split(text, ' '))::BIGINT AS n_tokens
        FROM documents
    )
    SELECT doc_id, lang, n_tokens, cum_tokens FROM (
        SELECT doc_id, lang, n_tokens,
               sum(n_tokens) OVER (PARTITION BY lang
                                   ORDER BY n_chars DESC, doc_id
                                   ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens
        FROM sized
    ) WHERE cum_tokens <= {TOKEN_BUDGET_PER_LANG}
    """,
    tags=("llm", "text"),
)
def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget fill: select documents per language, best-first (longer
    docs first — stand-in for a quality score), until the running token total
    hits the budget — how a training mix is assembled to a target token count
    per language/domain.

    One window shuffle on lang; the running sum is a ROWS UNBOUNDED PRECEDING
    frame over (quality, doc_id) — deterministic total order, so the chosen
    set is reproducible. At 100 TB the per-stratum sort is the cost; coarse
    pre-binning by quality decile cuts it to a partial sort."""
    d = load(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id", "lang", "n_chars",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        sized.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .filter(F.col("cum_tokens") <= TOKEN_BUDGET_PER_LANG)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
    )


# Benchmark-contamination split: docs below this id are the stand-in "eval
# benchmark"; everything else is the training pool under check.
CONTAM_BENCH_MAX_ID = 50
CONTAM_NGRAM = 3


@query(
    "text_contamination",
    oracle=f"""
    WITH grams AS (
        SELECT DISTINCT doc_id,
               array_to_string(toks[i:i+{CONTAM_NGRAM - 1}], ' ') AS gram
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             unnest(generate_series(1, greatest(len(toks) - {CONTAM_NGRAM - 1}, 1))) t(i)
    ),
    bench AS (
        SELECT DISTINCT gram FROM grams WHERE doc_id < {CONTAM_BENCH_MAX_ID}
    ),
    train AS (SELECT * FROM grams WHERE doc_id >= {CONTAM_BENCH_MAX_ID}),
    sizes AS (SELECT doc_id, count(*)::BIGINT AS n_grams FROM train GROUP BY doc_id),
    hits AS (
        SELECT t.doc_id, count(*)::BIGINT AS n_shared
        FROM train t JOIN bench b ON t.gram = b.gram
        GROUP BY t.doc_id
    )
    SELECT h.doc_id AS doc_id, s.n_grams, h.n_shared,
           round(h.n_shared / s.n_grams, 4) AS contamination
    FROM hits h JOIN sizes s ON h.doc_id = s.doc_id
    """,
    tags=("llm", "text"),
)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check — the decontamination pass run before
    training: flag training documents sharing word trigrams (CONTAM_NGRAM) with
    an eval benchmark (here the doc_id < CONTAM_BENCH_MAX_ID slice stands in
    for the benchmark corpus).

    Scale shape: the benchmark's distinct gram set is SMALL by construction
    (eval suites are KBs against a 100 TB corpus), so it broadcasts and the
    training side never shuffles — a map-side semi-join per gram followed by
    one partial-agg groupBy on doc_id. This is the rare case where broadcast
    is the designed scale path, not a fixture-size shortcut."""
    docs = load(spark, sf_dir, "documents")
    grams_expr = F.expr(
        f"transform(sequence(1, greatest(size(toks) - {CONTAM_NGRAM - 1}, 1)),"
        f" i -> array_join(slice(toks, i, {CONTAM_NGRAM}), ' '))"
    )
    grams = (
        docs.select("doc_id", F.split("text", " ").alias("toks"))
        .select("doc_id", F.explode(grams_expr).alias("gram"))
        .distinct()
    )
    bench = grams.filter(F.col("doc_id") < CONTAM_BENCH_MAX_ID).select("gram").distinct()
    train = grams.filter(F.col("doc_id") >= CONTAM_BENCH_MAX_ID)
    sizes = train.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = train.join(F.broadcast(bench), "gram").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shared")
    )
    return (
        hits.join(sizes, "doc_id")
        .select(
            "doc_id",
            "n_grams",
            "n_shared",
            F.round(F.col("n_shared") / F.col("n_grams"), 4).alias("contamination"),
        )
    )


@query(
    "text_normalize",
    oracle="""
    WITH norm AS (
        SELECT doc_id, n_chars,
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                   ' +', ' ', 'g')) AS normalized
        FROM documents
    )
    SELECT doc_id, md5(normalized) AS norm_md5,
           length(normalized)::BIGINT AS n_chars_norm,
           (length(normalized) <> n_chars) AS changed
    FROM norm
    """,
    tags=("llm", "text"),
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization — the canonicalization pass upstream of hashing /
    dedup: lowercase, strip non-alphanumerics to spaces, collapse runs of
    whitespace, trim. Emits md5(normalized) (hash-comparable without shipping
    the rewritten text) plus the new length and a changed flag.

    Map-only JVM regex at any scale; Spark's regexp_replace is global by
    default while DuckDB needs the explicit 'g' flag — same expression tree
    otherwise, so the hashes match exactly."""
    d = load(spark, sf_dir, "documents")
    normalized = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    return d.select(
        "doc_id",
        F.md5(normalized).alias("norm_md5"),
        F.length(normalized).cast("long").alias("n_chars_norm"),
        (F.length(normalized) != F.col("n_chars")).alias("changed"),
    )


REPETITION_TOP_TF_RATIO = 0.20


@query(
    "text_repetition",
    oracle=f"""
    WITH tf AS (
        SELECT doc_id, term, count(*)::BIGINT AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        GROUP BY doc_id, term
    )
    SELECT doc_id,
           sum(tf)::BIGINT AS n_words,
           count(*)::BIGINT AS n_distinct,
           round(count(*) / sum(tf), 4) AS distinct_ratio,
           max(tf)::BIGINT AS top_tf,
           (max(tf) / sum(tf) > {REPETITION_TOP_TF_RATIO}) AS repetitive
    FROM tf GROUP BY doc_id
    """,
    tags=("llm", "text"),
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition profile — the boilerplate/spam gate: token
    count, distinct-token count, distinct ratio, the heaviest term's
    frequency, and a repetitive verdict when one term exceeds 20% of the
    document (REPETITION_TOP_TF_RATIO).

    Two stacked aggregations over one exploded token stream — the (doc_id,
    term) partial absorbs the token volume map-side, and the second groupBy
    shuffles only one row per distinct term per doc."""
    d = load(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return tf.groupBy("doc_id").agg(
        F.sum("tf").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(F.count(F.lit(1)) / F.sum("tf"), 4).alias("distinct_ratio"),
        F.max("tf").alias("top_tf"),
        (F.max("tf") / F.sum("tf") > REPETITION_TOP_TF_RATIO).alias("repetitive"),
    )


NGRAM_LM_MIN_COUNT = 5


@query(
    "text_ngram_lm",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    bigrams AS (
        SELECT ws[i] AS w1, ws[i + 1] AS w2
        FROM toks, unnest(generate_series(1, len(ws) - 1)) t(i)
    ),
    pair_c AS (
        SELECT w1, w2, count(*)::BIGINT AS c12 FROM bigrams GROUP BY w1, w2
    ),
    uni_c AS (
        SELECT w1, sum(c12)::BIGINT AS c1 FROM pair_c GROUP BY w1
    )
    SELECT p.w1, p.w2, p.c12,
           round(p.c12 / u.c1, 6) AS p_w2_given_w1
    FROM pair_c p JOIN uni_c u ON p.w1 = u.w1
    WHERE p.c12 >= {NGRAM_LM_MIN_COUNT}
    """,
    tags=("llm", "text"),
)
def text_ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram language model: P(w2 | w1) = c(w1 w2) / c(w1 ·) with a
    min-count floor — the classic n-gram LM estimation pass (and the
    perplexity denominator for data-quality scoring at corpus scale).

    Two stacked aggregations over one exploded bigram stream — the (w1, w2)
    partial absorbs the token volume map-side, then the unigram margin is a
    SECOND aggregation over the already-tiny pair table (never a rescan of
    the corpus); the margin join shuffles pair-table-sized rows only. At
    100 TB this is the canonical two-agg + broadcast-margin shape."""
    d = load(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    bigram = F.expr(
        "transform(sequence(1, size(ws) - 1), i -> struct(ws[i-1] AS w1, ws[i] AS w2))"
    )
    pairs = (
        d.select(ws.alias("ws"))
        .select(F.explode(bigram).alias("bg"))
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    uni = pairs.groupBy("w1").agg(F.sum("c12").alias("c1"))
    return (
        pairs.join(uni, "w1")
        .filter(F.col("c12") >= NGRAM_LM_MIN_COUNT)
        .select(
            "w1", "w2", "c12", F.round(F.col("c12") / F.col("c1"), 6).alias("p_w2_given_w1")
        )
    )


# Target training-mix shares per language (sums to 1.0); a real pipeline
# feeds these from config — constants keep the oracle exact.
MIX_TARGET = {"en": 0.40, "zh": 0.20, "de": 0.15, "es": 0.15, "fr": 0.10}


@query(
    "corpus_mix_weights",
    oracle=f"""
    WITH have AS (
        SELECT lang, sum(len(string_split(text, ' ')))::BIGINT AS have_tokens
        FROM documents GROUP BY lang
    ),
    tot AS (SELECT sum(have_tokens)::BIGINT AS total FROM have),
    tgt AS (
        SELECT * FROM (VALUES {", ".join(f"('{k}', {v})" for k, v in sorted(MIX_TARGET.items()))})
               t(lang, target_share)
    )
    SELECT h.lang, h.have_tokens,
           t.target_share,
           floor(t.target_share * tot.total)::BIGINT AS target_tokens,
           round(t.target_share * tot.total / h.have_tokens, 4) AS sample_weight,
           (t.target_share * tot.total / h.have_tokens > 1.0) AS needs_upsampling
    FROM have h JOIN tgt t ON h.lang = t.lang CROSS JOIN tot
    """,
    tags=("llm", "text"),
)
def corpus_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix planning: given target language shares, compute each
    language's token inventory, its target token count at the current corpus
    size, and the sampling weight (>1 ⇒ the language must be upsampled /
    epoch-repeated) — the arithmetic behind every data-mixture config.

    One partial-agg pass for the inventory; the 5-row targets and the 1-row
    total broadcast. Downstream, sample_weight feeds sample_stratified /
    corpus_token_budget to materialize the mix."""
    d = load(spark, sf_dir, "documents")
    have = d.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).alias("have_tokens")
    )
    tot = have.agg(F.sum("have_tokens").alias("total"))
    tgt = spark.createDataFrame(
        sorted(MIX_TARGET.items()), "lang string, target_share double"
    )
    w = F.col("target_share") * F.col("total") / F.col("have_tokens")
    return (
        have.join(F.broadcast(tgt), "lang")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "have_tokens",
            "target_share",
            F.floor(F.col("target_share") * F.col("total")).alias("target_tokens"),
            F.round(w, 4).alias("sample_weight"),
            (w > 1.0).alias("needs_upsampling"),
        )
    )


FUZZY_CANON = ("tables", "quary", "batches", "filters", "colum", "streaming")
FUZZY_MAX_DIST = 2


@query(
    "text_fuzzy_join",
    oracle=f"""
    WITH canon(term) AS (
        VALUES {", ".join(f"('{t}')" for t in FUZZY_CANON)}
    ),
    heads AS (
        SELECT doc_id, split_part(text, ' ', 1) AS token
        FROM documents
    )
    SELECT h.doc_id AS doc_id, h.token AS token, c.term AS canon_term,
           levenshtein(h.token, c.term) AS dist
    FROM heads h
    JOIN canon c
      ON abs(length(h.token) - length(c.term)) <= {FUZZY_MAX_DIST}
     AND levenshtein(h.token, c.term) <= {FUZZY_MAX_DIST}
    """,
    tags=("llm", "text", "fuzzy"),
)
def text_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity resolution — match each document's lead token against a
    canonical vocabulary within edit distance 2 (the dictionary-repair /
    alias-merging step of a text-normalization pipeline).

    The length-band predicate (| |a|−|b| | ≤ d is a lower bound on edit
    distance) prunes candidate pairs BEFORE the O(len²) levenshtein runs —
    the standard banding that keeps fuzzy joins from scoring every pair; at
    scale the band becomes the join key (bucket by length, join adjacent
    buckets) and the dictionary side broadcasts. levenshtein has identical
    integer semantics in both engines, so the match set is exact."""
    docs = load(spark, sf_dir, "documents")
    canon = spark.createDataFrame([(t,) for t in FUZZY_CANON], "term string")
    heads = docs.select("doc_id", F.split_part(F.col("text"), F.lit(" "), F.lit(1)).alias("token"))
    band = F.abs(F.length("token") - F.length("term")) <= FUZZY_MAX_DIST
    dist = F.levenshtein("token", "term")
    return (
        heads.join(F.broadcast(canon), band & (dist <= FUZZY_MAX_DIST))
        .select("doc_id", "token", F.col("term").alias("canon_term"), dist.alias("dist"))
    )


# --- round 4: span-level dedup, quality pipeline, sequence packing ---------

SPAN_W = 8  # tokens per span (the C4 paper removed duplicate 3-sentence
            # spans; the fixture's word-soup text has no sentence marks, so
            # fixed-width token windows stand in for sentences)


@query(
    "text_span_dedup",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    spans AS (
        SELECT doc_id, unnest(range(ceil(len(ts) / {SPAN_W}.0)::BIGINT)) AS pos, ts
        FROM toks
    ),
    chunks AS (
        SELECT doc_id, pos,
               array_to_string(ts[pos * {SPAN_W} + 1 : pos * {SPAN_W} + {SPAN_W}], ' ') AS chunk
        FROM spans
    ),
    ranked AS (
        SELECT doc_id, pos, chunk,
               row_number() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, pos) AS rn
        FROM chunks
    )
    SELECT doc_id,
           count(*)::BIGINT AS n_spans,
           sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_removed,
           coalesce(string_agg(chunk, ' ' ORDER BY pos) FILTER (WHERE rn = 1), '') AS kept_text
    FROM ranked GROUP BY doc_id
    """,
    tags=("llm", "text", "dedup"),
)
def text_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document span-level dedup — the C4/RefinedWeb boilerplate
    remover: every document is cut into fixed-width token spans (SPAN_W),
    each span is kept only at its FIRST corpus occurrence (ordered by
    doc_id, pos), and surviving spans are reassembled in order into the
    cleaned document. Unlike doc-level dedup this removes repeated
    passages (headers, license blocks, navigation chrome) *inside*
    otherwise-unique documents.

    Scale shape: the dedup window partitions on md5(span) — a 16-byte
    shuffle key regardless of span width (the dedup_hash discipline), one
    shuffle keyed by content hash whose fan-in tracks duplicate density.
    Reassembly is a second shuffle on doc_id with sorted-struct collect
    (deterministic: pos is unique per doc). Both sides clamp the tail span
    (slice past the end yields the shorter remainder) so span boundaries
    are identical in both engines."""
    return span_dedup_frame(load(spark, sf_dir, "documents"))


def span_dedup_frame(d: DataFrame) -> DataFrame:
    """The span-dedup pipeline on any documents-shaped frame (split out so
    golden tests can run it on inline micro-corpora with known dup spans)."""
    spans = (
        d.select("doc_id", F.split("text", " ").alias("ts"))
        .select(
            "doc_id",
            "ts",
            F.explode(
                F.expr(f"sequence(0, cast(ceil(size(ts)/{SPAN_W}.0) as int) - 1)")
            ).alias("pos"),
        )
        .select(
            "doc_id",
            "pos",
            F.array_join(
                F.slice("ts", F.col("pos") * SPAN_W + 1, SPAN_W), " "
            ).alias("chunk"),
        )
    )
    w = Window.partitionBy(F.md5("chunk")).orderBy("doc_id", "pos")
    ranked = spans.withColumn("rn", F.row_number().over(w))
    kept_struct = F.when(F.col("rn") == 1, F.struct("pos", "chunk"))
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda x: x.chunk
            ),
            " ",
        ).alias("kept_text"),
    )


@query(
    "corpus_quality_pipeline",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, lang, text, n_chars,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS dup_rn
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*)::BIGINT AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM ranked)
        GROUP BY doc_id, term
    ),
    rep AS (
        SELECT doc_id, sum(tf)::BIGINT AS n_words, max(tf)::BIGINT AS top_tf,
               sum(CASE WHEN term IN ({", ".join(f"'{s}'" for s in STOPWORDS)})
                        THEN tf ELSE 0 END)::BIGINT AS n_stop
        FROM tf GROUP BY doc_id
    )
    SELECT r.doc_id AS doc_id, r.lang, p.n_words,
           CASE WHEN r.dup_rn > 1 THEN 'duplicate'
                WHEN r.n_chars < {QUALITY_MIN_CHARS} THEN 'too_short'
                WHEN r.n_chars > {QUALITY_MAX_CHARS} THEN 'too_long'
                WHEN p.n_stop / p.n_words > {QUALITY_MAX_STOP_RATIO} THEN 'stopword_heavy'
                WHEN p.top_tf / p.n_words > {REPETITION_TOP_TF_RATIO} THEN 'repetitive'
                ELSE 'keep' END AS verdict
    FROM ranked r JOIN rep p ON r.doc_id = p.doc_id
    """,
    tags=("llm", "text", "pipeline"),
)
def corpus_quality_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus quality gate — the text twin of
    `corpus_dedup_pipeline`: one pass assigns every document its final
    filter verdict through the standard pre-training cascade (first failing
    rule wins): exact-duplicate → length bounds → stopword ratio →
    single-term repetition → keep. One row per input document, so the
    output is an auditable filter manifest, not just the survivors.

    Scale shape: two shuffles total — the dup window keys on md5(text)
    (hash-sized keys), and the repetition profile reduces the exploded
    token stream through a (doc_id, term) partial agg before the per-doc
    rollup; the final join re-shuffles only doc-level rows. All verdict
    logic is columnar CASE algebra — no UDFs anywhere."""
    d = load(spark, sf_dir, "documents")
    dup_w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    ranked = d.select(
        "doc_id", "lang", "text", "n_chars",
        F.row_number().over(dup_w).alias("dup_rn"),
    )
    tf = (
        ranked.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    rep = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("n_words"),
        F.max("tf").alias("top_tf"),
        F.sum(
            F.when(F.col("term").isin(*STOPWORDS), F.col("tf")).otherwise(0)
        ).alias("n_stop"),
    )
    return ranked.join(rep, "doc_id").select(
        "doc_id",
        "lang",
        "n_words",
        F.when(F.col("dup_rn") > 1, "duplicate")
        .when(F.col("n_chars") < QUALITY_MIN_CHARS, "too_short")
        .when(F.col("n_chars") > QUALITY_MAX_CHARS, "too_long")
        .when(F.col("n_stop") / F.col("n_words") > QUALITY_MAX_STOP_RATIO, "stopword_heavy")
        .when(F.col("top_tf") / F.col("n_words") > REPETITION_TOP_TF_RATIO, "repetitive")
        .otherwise("keep")
        .alias("verdict"),
    )


PACK_SEQ_LEN = 256  # tokens per training sequence


@query(
    "corpus_pack_sequences",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, lang, len(string_split(text, ' '))::BIGINT AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT lang, n_tokens,
               coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0)::BIGINT // {PACK_SEQ_LEN} AS seq_id
        FROM sized
    )
    SELECT lang, seq_id,
           count(*)::BIGINT AS n_docs,
           sum(n_tokens)::BIGINT AS n_tokens
    FROM packed GROUP BY lang, seq_id
    """,
    tags=("llm", "corpus"),
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing — the concat-and-chop step that turns a
    filtered corpus into fixed-length model inputs: per language, documents
    are concatenated in deterministic doc_id order and cut every
    PACK_SEQ_LEN tokens; each document is assigned the sequence its FIRST
    token lands in (seq_id = floor(tokens_before / PACK_SEQ_LEN)). The
    output audits packing efficiency per (lang, seq_id).

    Scale shape: a running prefix-sum window per lang — one shuffle keyed
    by the pack-group key. At 100 TB the pack group is (lang, shard) so
    thousands of prefix sums run independently; packing NEVER needs a
    global order, only a per-group one, which is why the window partitions
    by lang instead of sorting the corpus."""
    d = load(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id", "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = sized.select(
        "lang",
        "n_tokens",
        F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / PACK_SEQ_LEN).alias("seq_id"),
    )
    return packed.groupBy("lang", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )

# --- round 4 (third wave): chunking, sharding, importance sampling ----------

CHUNK_W = 32   # tokens per chunk
CHUNK_STRIDE = 24  # tokens between chunk starts (CHUNK_W - CHUNK_STRIDE overlap)


@query(
    "text_chunk_overlap",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    chunks AS (
        SELECT doc_id, i AS chunk_id,
               ts[i * {CHUNK_STRIDE} + 1 : i * {CHUNK_STRIDE} + {CHUNK_W}] AS chunk
        FROM toks,
             unnest(generate_series(0, greatest((len(ts) - 1) // {CHUNK_STRIDE}, 0)::BIGINT)) t(i)
    )
    SELECT doc_id, chunk_id,
           len(chunk)::BIGINT AS n_tokens,
           md5(array_to_string(chunk, ' ')) AS chunk_hash
    FROM chunks
    """,
    tags=("llm", "text", "corpus"),
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunking — the RAG/pre-training prep step
    that cuts each document into CHUNK_W-token windows every CHUNK_STRIDE
    tokens (so consecutive chunks share CHUNK_W − CHUNK_STRIDE tokens of
    context and no sentence is lost at a boundary). Emits one row per chunk
    with its token count and content hash — the manifest a downstream
    embedding job consumes.

    Scale shape: pure per-row explode algebra — split, `sequence` over the
    chunk starts, `slice` per start. NO shuffle at all (the plan is a single
    project/generate stage over the scan); chunk fan-out is bounded by
    n_tokens/stride per doc, so task output is proportional to input size.
    The hash (not the chunk text) is the output payload, keeping the
    materialized manifest hash-sized — the dedup_hash discipline."""
    d = load(spark, sf_dir, "documents")
    # greatest(…, 0) guards the empty-doc edge: Spark's sequence(0, -1)
    # would DESCEND ([0, -1]) while DuckDB's generate_series returns empty.
    starts = F.expr(f"sequence(0, greatest((size(ts) - 1) div {CHUNK_STRIDE}, 0))")
    return (
        d.select("doc_id", F.split("text", " ").alias("ts"))
        .select("doc_id", "ts", F.explode(starts).alias("chunk_id"))
        .select(
            "doc_id",
            "chunk_id",
            F.slice("ts", F.col("chunk_id") * CHUNK_STRIDE + 1, CHUNK_W).alias("chunk"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.size("chunk").cast("long").alias("n_tokens"),
            F.md5(F.array_join("chunk", " ")).alias("chunk_hash"),
        )
    )


# train/val/test thresholds on the first hex nibble of md5(doc_id):
# 0..b → train (12/16), c..d → val (2/16), e..f → test (2/16).
SHARD_TRAIN_MAX = "c"
SHARD_VAL_MAX = "e"


@query(
    "corpus_shard_split",
    oracle=f"""
    WITH tagged AS (
        SELECT lang,
               len(string_split(text, ' '))::BIGINT AS n_tokens,
               n_chars,
               CASE WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 1) < '{SHARD_TRAIN_MAX}'
                    THEN 'train'
                    WHEN substr(md5(cast(doc_id AS VARCHAR)), 1, 1) < '{SHARD_VAL_MAX}'
                    THEN 'val' ELSE 'test' END AS split
        FROM documents
    )
    SELECT split, lang,
           count(*)::BIGINT AS n_docs,
           sum(n_tokens)::BIGINT AS n_tokens,
           sum(n_chars)::BIGINT AS n_chars
    FROM tagged GROUP BY split, lang
    """,
    tags=("llm", "corpus"),
)
def corpus_shard_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test sharding — the split step every training
    corpus needs, done the only way that survives re-runs and late-arriving
    data: hash the STABLE document key (never `rand()`), bucket on the hash.
    A document's split assignment is a pure function of doc_id, so
    incremental corpus refreshes never migrate documents between splits
    (the property random splits lose). Emits per-(split, lang) audit stats.

    Scale shape: one partial-agg groupBy — the tag is a per-row md5 + CASE,
    so the only shuffle carries (split, lang) partials. The hex-nibble
    threshold compare is a plain string compare, identical bytes in both
    engines (md5 hex is lowercase everywhere)."""
    d = load(spark, sf_dir, "documents")
    nib = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1)
    tagged = d.select(
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        "n_chars",
        F.when(nib < SHARD_TRAIN_MAX, "train")
        .when(nib < SHARD_VAL_MAX, "val")
        .otherwise("test")
        .alias("split"),
    )
    return tagged.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
    )


IMPORTANCE_FULL_CHARS = 400.0  # docs at/above this length keep weight 1.0


@query(
    "corpus_importance_sample",
    oracle=f"""
    WITH weighted AS (
        SELECT doc_id, lang, source,
               len(string_split(text, ' '))::BIGINT AS n_tokens,
               least(1.0, n_chars / {IMPORTANCE_FULL_CHARS}) AS w,
               substr(md5(text), 1, 8) AS u_hex
        FROM documents
    ),
    kept AS (
        SELECT * FROM weighted
        WHERE u_hex < lpad(lower(to_hex(floor(w * 4294967295)::BIGINT)), 8, '0')
    )
    SELECT lang, source,
           count(*)::BIGINT AS n_kept,
           sum(n_tokens)::BIGINT AS kept_tokens,
           round(avg(w), 6) AS avg_weight
    FROM kept GROUP BY lang, source
    """,
    tags=("llm", "corpus"),
)
def corpus_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted corpus subsampling — the data-mixing primitive
    that downsamples low-value documents with probability proportional to a
    quality weight, DETERMINISTICALLY: a document is kept iff the uniform
    draw derived from md5(text) falls below its weight. No `rand()` — the
    draw is a pure function of content, so re-runs, retries, and
    stragglers all keep exactly the same documents (the property a 100 TB
    sampling job cannot do without).

    The [0,1) draw and the threshold are compared IN HEX-STRING SPACE:
    u = first 8 md5 nibbles, threshold = floor(w·(2³²−1)) rendered as 8
    zero-padded lowercase hex digits — a byte-identical compare in both
    engines with no float parsing of hashes anywhere.

    Scale shape: per-row hashing + one partial-agg groupBy; the shuffle
    carries (lang, source) partials only."""
    d = load(spark, sf_dir, "documents")
    w = F.least(F.lit(1.0), F.col("n_chars") / F.lit(IMPORTANCE_FULL_CHARS))
    weighted = d.select(
        "lang", "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        w.alias("w"),
        F.substring(F.md5("text"), 1, 8).alias("u_hex"),
    )
    thr = F.lpad(F.lower(F.hex(F.floor(F.col("w") * 4294967295).cast("long"))), 8, "0")
    kept = weighted.filter(F.col("u_hex") < thr)
    return kept.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_tokens").alias("kept_tokens"),
        F.round(F.avg("w"), 6).alias("avg_weight"),
    )


BPE_TOP_PAIRS = 20


@query(
    "corpus_bpe_pairs",
    oracle=f"""
    WITH wf AS (
        SELECT term, count(*)::BIGINT AS wf
        FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        GROUP BY term
    ),
    pairs AS (
        SELECT substr(term, i, 2) AS pair, wf
        FROM wf, unnest(generate_series(1, len(term) - 1)) t(i)
        WHERE len(term) >= 2
    ),
    agg AS (SELECT pair, sum(wf)::BIGINT AS n_occurrences FROM pairs GROUP BY pair),
    ranked AS (
        SELECT pair, n_occurrences,
               row_number() OVER (ORDER BY n_occurrences DESC, pair ASC) AS rank
        FROM agg
    )
    SELECT rank, pair, n_occurrences FROM ranked WHERE rank <= {BPE_TOP_PAIRS}
    """,
    tags=("llm", "text", "tokenizer"),
)
def corpus_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-training pair statistics — ONE merge-selection step of
    byte-pair encoding, the computation a distributed BPE/WordPiece trainer
    repeats per merge: count every adjacent character pair weighted by word
    frequency and rank the candidates (the top pair is the next merge). The
    deterministic tie-break (count desc, pair asc) is the part naive
    trainers skip and then can't reproduce their own vocab.

    Scale shape — the reason BPE training is feasible on a 100 TB corpus
    at all: pair statistics are computed over the WORD-FREQUENCY table
    (vocabulary-sized, from one partial-agg pass over the corpus), not
    over raw text — the char-pair explode touches |vocab|·avg_len rows
    regardless of corpus size. Iterating merges re-runs only the
    vocab-sized stage. Final ranking is a single-partition window over
    the pair table (alphabet², driver-sized)."""
    d = load(spark, sf_dir, "documents")
    wf = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("wf"))
        .filter(F.length("term") >= 2)
    )
    pair_expr = F.expr("transform(sequence(1, length(term) - 1), i -> substring(term, i, 2))")
    agg = (
        wf.select(F.explode(pair_expr).alias("pair"), "wf")
        .groupBy("pair")
        .agg(F.sum("wf").alias("n_occurrences"))
    )
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("pair"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BPE_TOP_PAIRS)
        .select("rank", "pair", "n_occurrences")
    )


SOURCE_CAP = 20  # max docs any single (lang, source) may contribute


@query(
    "corpus_source_cap",
    oracle=f"""
    WITH ranked AS (
        SELECT lang, source,
               len(string_split(text, ' '))::BIGINT AS n_tokens,
               row_number() OVER (PARTITION BY lang, source
                                  ORDER BY md5(text), doc_id) AS rn
        FROM documents
    )
    SELECT lang, source,
           count(*)::BIGINT AS n_docs,
           sum(CASE WHEN rn <= {SOURCE_CAP} THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           sum(CASE WHEN rn <= {SOURCE_CAP} THEN n_tokens ELSE 0 END)::BIGINT
               AS kept_tokens
    FROM ranked GROUP BY lang, source
    """,
    tags=("llm", "corpus"),
)
def corpus_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-domination capping — the anti-monoculture sampler every web
    corpus applies before training: no single (lang, source) may contribute
    more than SOURCE_CAP documents, and WHICH documents survive is decided
    by a deterministic content-hash order (md5(text), doc_id tie-break) —
    an unbiased within-source sample that re-runs, retries, and
    incremental refreshes reproduce exactly, where `ORDER BY rand()` would
    not. Emits the per-source audit (before/after doc counts, surviving
    token budget) a mixing stage consumes.

    Scale shape: one rank window per (lang, source) partition — bounded
    partitions (sources), hash-sized sort keys; the cap filter is a flag
    inside the same aggregation, so capping adds zero extra passes."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(F.md5("text"), "doc_id")
    ranked = d.select(
        "lang", "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.row_number().over(w).alias("rn"),
    )
    kept = F.col("rn") <= SOURCE_CAP
    return ranked.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(kept, F.col("n_tokens")).otherwise(0)).alias("kept_tokens"),
    )


PMI_WINDOW = 2   # co-occurrence: b follows a within this many positions
PMI_MIN_PAIR = 5  # support floor before PMI is meaningful
PMI_TOP = 20


@query(
    "text_cooccurrence_pmi",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, i AS pos, ts[i] AS term
        FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
             unnest(generate_series(1, len(ts))) t(i)
    ),
    pairs AS (
        SELECT a.term AS term_a, b.term AS term_b, count(*)::BIGINT AS n_pair
        FROM toks a JOIN toks b
          ON a.doc_id = b.doc_id
         AND b.pos - a.pos BETWEEN 1 AND {PMI_WINDOW}
        GROUP BY 1, 2
    ),
    uni AS (SELECT term, count(*)::BIGINT AS n FROM toks GROUP BY term),
    tot AS (SELECT count(*)::BIGINT AS n_tok FROM toks),
    ptot AS (SELECT sum(n_pair)::BIGINT AS n_pairs FROM pairs),
    scored AS (
        SELECT term_a, term_b, n_pair,
               round(ln(n_pair::DOUBLE * n_tok * n_tok
                        / (n_pairs::DOUBLE * ua.n * ub.n)), 6) AS pmi
        FROM pairs
        JOIN uni ua ON ua.term = term_a
        JOIN uni ub ON ub.term = term_b
        CROSS JOIN tot CROSS JOIN ptot
        WHERE n_pair >= {PMI_MIN_PAIR}
    )
    SELECT term_a, term_b, n_pair, pmi FROM (
        SELECT *, row_number() OVER (ORDER BY pmi DESC, term_a, term_b) AS rk
        FROM scored
    ) WHERE rk <= {PMI_TOP}
    """,
    tags=("llm", "text", "stats"),
)
def text_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over positional co-occurrence — the
    collocation statistic (word2vec's training signal, phrase-mining's
    ranking function): how much more often does term b follow term a
    within PMI_WINDOW positions than independence predicts. Emits the
    top-PMI pairs above a support floor (PMI without a floor surfaces
    hapax noise — the support filter is part of the statistic's contract,
    not a shortcut).

    Scale shape: the positional self-join is per-DOCUMENT (equi-key
    doc_id, fan-out ≤ window per token), never corpus-wide; the heavy
    reduction is the (term_a, term_b) partial agg whose shuffle carries
    pair counts. Unigram margins and the two scalar totals join back
    broadcast-sized. All-integer counts until the single ln() at the end
    (the agg_correlation raw-sums discipline), so the twin is exact to
    the 6-dp round.

    Single-job discipline (VERDICT r4 item 2): the scalar totals (corpus
    token count, total pair mass) are 1-row broadcast aggregates folded in
    with crossJoin — exactly the oracle's ``CROSS JOIN tot CROSS JOIN
    ptot`` — NOT eager ``.count()``/``.collect()`` actions, which would
    execute the expensive positional self-join twice (once for the scalar,
    once in the final plan). The ``pairs`` shuffle still appears on two
    plan branches (scored + ptot), but AQE exchange reuse collapses them
    into one physical shuffle (ReusedExchange)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term")
    )
    a, b = toks.alias("a"), toks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") - F.col("a.pos")).between(1, PMI_WINDOW),
        )
        .groupBy(F.col("a.term").alias("term_a"), F.col("b.term").alias("term_b"))
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    uni = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    tot = toks.agg(F.count(F.lit(1)).cast("long").alias("n_tok"))
    ptot = pairs.agg(F.sum("n_pair").alias("n_pairs"))
    scored = (
        pairs.filter(F.col("n_pair") >= PMI_MIN_PAIR)
        .join(F.broadcast(uni.select(F.col("term").alias("term_a"), F.col("n").alias("na"))), "term_a")
        .join(F.broadcast(uni.select(F.col("term").alias("term_b"), F.col("n").alias("nb"))), "term_b")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ptot))
        .select(
            "term_a", "term_b", "n_pair",
            F.round(
                F.log(
                    F.col("n_pair").cast("double") * F.col("n_tok") * F.col("n_tok")
                    / (F.col("n_pairs").cast("double") * F.col("na") * F.col("nb"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    w = Window.orderBy(F.desc("pmi"), F.asc("term_a"), F.asc("term_b"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= PMI_TOP)
        .select("term_a", "term_b", "n_pair", "pmi")
    )


EPOCH_BUDGET_X = 3   # training budget = 3x the corpus token count
EPOCH_CAP = 4.0      # data-constrained cap: no source repeats past 4 epochs
EPOCH_QUALITY_CHARS = 400  # sources averaging >= this get double weight


@query(
    "corpus_epoch_schedule",
    oracle=f"""
    WITH src AS (
        SELECT source,
               sum(len(string_split(text, ' ')))::BIGINT AS n_tokens,
               (CASE WHEN avg(n_chars) >= {EPOCH_QUALITY_CHARS} THEN 2 ELSE 1 END)::BIGINT
                   AS quality_mult
        FROM documents GROUP BY source
    ),
    tot AS (
        SELECT sum(n_tokens)::BIGINT AS corpus_tokens,
               sum(n_tokens * quality_mult)::BIGINT AS weight_mass
        FROM src
    )
    SELECT source, n_tokens, quality_mult,
           round(n_tokens * quality_mult / weight_mass::DOUBLE, 6) AS weight_share,
           round(least({EPOCH_CAP},
                       ({EPOCH_BUDGET_X} * corpus_tokens) * (n_tokens * quality_mult)
                       / (weight_mass::DOUBLE * n_tokens)), 4) AS epochs,
           floor(least({EPOCH_CAP},
                       ({EPOCH_BUDGET_X} * corpus_tokens) * (n_tokens * quality_mult)
                       / (weight_mass::DOUBLE * n_tokens)) * n_tokens)::BIGINT
               AS planned_tokens
    FROM src CROSS JOIN tot
    """,
    tags=("llm", "corpus"),
)
def corpus_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-repetition planner — the data-constrained mixing step that
    turns "train on B tokens from a corpus of C < B" into a per-source
    schedule: budget is allocated ∝ tokens × integer quality multiplier,
    then CAPPED at EPOCH_CAP repeats per source (the data-constrained-
    scaling rule: past ~4 epochs, repeated tokens stop buying loss).
    Emits per source its weight share, fractional epoch count, and the
    planned token allocation a sampler (corpus_importance_sample /
    corpus_source_cap) then realizes.

    Numeric discipline: weights are INTEGER token counts times an integer
    multiplier, so the weight mass is an exact sum (no float reorder
    anywhere); doubles appear only in the final per-row divisions, which
    are identical scalar expressions in both engines — the floor() on
    planned_tokens is therefore boundary-safe. One partial-agg groupBy
    plus a broadcast of the two scalar totals."""
    d = load(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " ")).cast("long")).alias("n_tokens"),
        F.when(F.avg("n_chars") >= EPOCH_QUALITY_CHARS, 2)
        .otherwise(1)
        .cast("long")
        .alias("quality_mult"),
    )
    tot = src.agg(
        F.sum("n_tokens").alias("corpus_tokens"),
        F.sum(F.col("n_tokens") * F.col("quality_mult")).alias("weight_mass"),
    )
    joined = src.crossJoin(F.broadcast(tot))
    epochs = F.least(
        F.lit(EPOCH_CAP),
        (EPOCH_BUDGET_X * F.col("corpus_tokens"))
        * (F.col("n_tokens") * F.col("quality_mult"))
        / (F.col("weight_mass").cast("double") * F.col("n_tokens")),
    )
    return joined.select(
        "source", "n_tokens", "quality_mult",
        F.round(
            F.col("n_tokens") * F.col("quality_mult") / F.col("weight_mass").cast("double"), 6
        ).alias("weight_share"),
        F.round(epochs, 4).alias("epochs"),
        F.floor(epochs * F.col("n_tokens")).cast("long").alias("planned_tokens"),
    )


PPL_BUCKETS = 5  # quality quintiles


@query(
    "corpus_perplexity_filter",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    uni AS (SELECT term, count(*)::BIGINT AS c FROM toks GROUP BY term),
    tot AS (SELECT count(*)::BIGINT AS n, count(DISTINCT term)::BIGINT AS v FROM toks),
    -- per-term surprisal quantized ONCE at the vocab level to an exact
    -- micro-scaled BIGINT (rule 2's quantizer), so every doc score below
    -- is integer algebra — no float ordering anywhere in the bucketing
    surp AS (
        SELECT u.term,
               floor(-ln((u.c + 1.0) / (tot.n + tot.v)) * 1000000 + 0.5)::BIGINT
                   AS s_micro
        FROM uni u CROSS JOIN tot
    ),
    scored AS (
        SELECT t.doc_id, count(*)::BIGINT AS n_tok,
               sum(s.s_micro)::BIGINT AS sum_micro
        FROM toks t JOIN surp s ON s.term = t.term
        GROUP BY t.doc_id
    ),
    keyed AS (
        SELECT doc_id,
               (sum_micro * 1000) // n_tok AS key,
               sum_micro / (n_tok * 1000000.0) AS xent
        FROM scored
    ),
    hist AS (
        SELECT key, count(*)::BIGINT AS g_n,
               sum(xent) AS sum_x, min(xent) AS min_x, max(xent) AS max_x,
               (sum(count(*)) OVER (ORDER BY key
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - count(*))::BIGINT AS cum_before,
               sum(count(*)) OVER ()::BIGINT AS n_total
        FROM keyed GROUP BY key
    ),
    h AS (
        SELECT *, (cum_before * {PPL_BUCKETS}) // n_total AS d_first,
               ((cum_before + g_n - 1) * {PPL_BUCKETS}) // n_total AS d_last
        FROM hist
    ),
    whole AS (
        SELECT d_first + 1 AS bucket, g_n AS n, sum_x, min_x, max_x
        FROM h WHERE d_first = d_last
    ),
    strad AS (
        SELECT ((h.cum_before
                 + row_number() OVER (PARTITION BY k.key ORDER BY k.doc_id)
                 - 1) * {PPL_BUCKETS}) // h.n_total + 1 AS bucket,
               k.xent
        FROM keyed k JOIN h ON k.key = h.key AND h.d_first <> h.d_last
    ),
    strad_g AS (
        SELECT bucket, count(*)::BIGINT AS n, sum(xent) AS sum_x,
               min(xent) AS min_x, max(xent) AS max_x
        FROM strad GROUP BY bucket
    ),
    unioned AS (
        SELECT bucket, n, sum_x, min_x, max_x FROM whole
        UNION ALL
        SELECT bucket, n, sum_x, min_x, max_x FROM strad_g
    )
    SELECT bucket::BIGINT AS bucket, sum(n)::BIGINT AS n_docs,
           round(sum(sum_x) / sum(n), 6) AS avg_xent,
           round(min(min_x), 6) AS min_xent,
           round(max(max_x), 6) AS max_xent
    FROM unioned GROUP BY bucket
    """,
    tags=("llm", "corpus", "quality"),
)
def corpus_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-based quality bucketing — the CCNet-style filter stage
    every web-scale corpus passes through: score each document by its
    cross-entropy under a corpus-trained LM (here add-1-smoothed unigram:
    H(d) = -mean_w ln((c(w)+1)/(N+V)) — enough to rank gibberish vs fluent
    text), then split the corpus into PPL_BUCKETS quantile buckets (keep
    head/middle, drop or downweight tail). Emits per-bucket doc counts and
    the cross-entropy envelope — the audit a mixing stage reads to pick its
    keep-threshold.

    Scale shape: the LM "training" is one unigram aggregate; the scoring
    join is per-TOKEN against the vocab table — broadcast here (fixture
    vocab is tiny, the text_tfidf convention), a term-keyed shuffle equi-
    join at 100 TB where the vocab outgrows broadcast. The two corpus
    scalars fold in via broadcast 1-row aggregates (no eager actions — the
    text_cooccurrence_pmi discipline).

    The quantile split is the HISTOGRAM-BOUNDARY plan (eval_lift_table's
    machinery, ported per VERDICT r9 item 3 — the previous global ntile
    forced every doc through one partition): per-term surprisal is
    quantized ONCE at the vocab level to an exact micro-scaled BIGINT
    (floor(-ln·1e6 + 0.5), rule 2's quantizer — ln over exact integer
    counts, identical expression tree on both engines), so each doc's
    score key (nano-scaled integer mean surprisal) is pure integer
    algebra. Bucket boundaries come from a cumulative window over the
    KEY SUPPORT (distinct score keys, not docs); key groups straddling
    no boundary contribute their pre-aggregated (count, Σxent, min, max)
    wholesale, and only the ≤{PPL_BUCKETS}−1 straddling groups rejoin the
    doc frame for a doc_id tiebreak rank PARTITIONED by key — no
    corpus-sized unpartitioned window remains (pinned in
    tests/test_plans.py). Reported envelopes derive from the same exact
    integers (sum_micro / n_tok·1e6), aggregate-rounded 6dp."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    uni = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    tot = toks.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("term").alias("v")
    )
    surp = uni.crossJoin(F.broadcast(tot)).select(
        "term",
        F.floor(
            -F.log((F.col("c") + F.lit(1.0)) / (F.col("n") + F.col("v")))
            * 1000000
            + 0.5
        )
        .cast("long")
        .alias("s_micro"),
    )
    # The scored doc frame is referenced three times below (support
    # histogram, totals, straddle rejoin); checkpoint it eagerly so the
    # token-explode + vocab-join subtree plans ONCE (the graph_hits
    # lesson — without this the physical plan re-derives it per consumer).
    from ..session import ensure_checkpoint_dir

    ensure_checkpoint_dir(spark)
    keyed = (
        toks.join(F.broadcast(surp), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum("s_micro").alias("sum_micro"),
        )
        .select(
            "doc_id",
            F.expr("(sum_micro * 1000) div n_tok").alias("key"),
            (F.col("sum_micro") / (F.col("n_tok") * F.lit(1000000.0))).alias("xent"),
        )
        .checkpoint(eager=True)
    )
    whist = Window.orderBy("key").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    hist = (
        keyed.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("g_n"),
            F.sum("xent").alias("sum_x"),
            F.min("xent").alias("min_x"),
            F.max("xent").alias("max_x"),
        )
        .select("*", (F.sum("g_n").over(whist) - F.col("g_n")).alias("cum_before"))
    )
    totals = keyed.agg(F.count(F.lit(1)).alias("n_total"))
    h = hist.crossJoin(F.broadcast(totals)).select(
        "*",
        F.expr(f"cum_before * {PPL_BUCKETS} div n_total").alias("d_first"),
        F.expr(f"(cum_before + g_n - 1) * {PPL_BUCKETS} div n_total").alias("d_last"),
    )
    whole = h.filter(F.col("d_first") == F.col("d_last")).select(
        (F.col("d_first") + 1).alias("bucket"),
        F.col("g_n").alias("n"),
        "sum_x",
        "min_x",
        "max_x",
    )
    strad = h.filter(F.col("d_first") != F.col("d_last")).select(
        "key", "cum_before", "n_total"
    )
    wgrp = Window.partitionBy("key").orderBy(F.col("doc_id").asc())
    split = (
        keyed.join(F.broadcast(strad), "key")
        .select(
            "xent",
            "n_total",
            (
                (F.col("cum_before") + F.row_number().over(wgrp) - F.lit(1))
                * F.lit(PPL_BUCKETS)
            ).alias("scaled_rank"),
        )
        .groupBy((F.expr("scaled_rank div n_total") + 1).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("xent").alias("sum_x"),
            F.min("xent").alias("min_x"),
            F.max("xent").alias("max_x"),
        )
    )
    return (
        whole.unionByName(split)
        .groupBy("bucket")
        .agg(
            F.sum("n").alias("n_docs"),
            F.round(F.sum("sum_x") / F.sum("n"), 6).alias("avg_xent"),
            F.round(F.min("min_x"), 6).alias("min_xent"),
            F.round(F.max("max_x"), 6).alias("max_xent"),
        )
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            "n_docs",
            "avg_xent",
            "min_xent",
            "max_xent",
        )
    )


@query(
    "corpus_training_pipeline",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    uni AS (SELECT term, count(*)::BIGINT AS c FROM toks GROUP BY term),
    tot AS (SELECT count(*)::BIGINT AS n, count(DISTINCT term)::BIGINT AS v FROM toks),
    scored AS (
        SELECT t.doc_id, -avg(ln((u.c + 1.0) / (tot.n + tot.v))) AS xent
        FROM toks t JOIN uni u ON u.term = t.term CROSS JOIN tot
        GROUP BY t.doc_id
    ),
    thr AS (SELECT avg(xent) AS t FROM scored),
    q AS (
        SELECT d.doc_id, d.source, d.text
        FROM documents d JOIN scored s ON s.doc_id = d.doc_id CROSS JOIN thr
        WHERE s.xent <= thr.t
    ),
    dd AS (
        SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM q
    ),
    capd AS (
        SELECT *, row_number() OVER (PARTITION BY source
                                     ORDER BY md5(text), doc_id) AS crn
        FROM dd WHERE rn = 1
    ),
    inp AS (SELECT source, count(*)::BIGINT AS n_input FROM documents GROUP BY source),
    qual AS (SELECT source, count(*)::BIGINT AS n_quality FROM q GROUP BY source),
    uniq AS (SELECT source, count(*)::BIGINT AS n_unique FROM dd WHERE rn = 1 GROUP BY source),
    fin AS (
        SELECT source, count(*)::BIGINT AS n_final,
               sum(len(string_split(text, ' ')))::BIGINT AS final_tokens
        FROM capd WHERE crn <= {SOURCE_CAP} GROUP BY source
    )
    SELECT i.source,
           i.n_input,
           coalesce(q.n_quality, 0)::BIGINT AS n_quality,
           coalesce(u.n_unique, 0)::BIGINT AS n_unique,
           coalesce(f.n_final, 0)::BIGINT AS n_final,
           coalesce(f.final_tokens, 0)::BIGINT AS final_tokens
    FROM inp i
    LEFT JOIN qual q ON q.source = i.source
    LEFT JOIN uniq u ON u.source = i.source
    LEFT JOIN fin f ON f.source = i.source
    """,
    tags=("llm", "corpus", "pipeline", "flagship"),
)
def corpus_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus assembly FUNNEL — the audit report every
    corpus build publishes: per source, how many documents survive each
    successive gate. Stages, in pipeline order: (1) LM-quality gate — keep
    docs whose unigram cross-entropy is at most the corpus mean (the
    corpus_perplexity_filter statistic used as a FILTER; a smooth scalar
    threshold, not a quantile cut, so near-tied duplicate docs pass or
    fail TOGETHER — cross-engine tie-safety by construction); (2) exact
    dedup among survivors (min-doc_id keeper, the dedup_exact rule — run
    AFTER quality so a low-quality copy can't shadow a high-quality one);
    (3) per-source domination cap (corpus_source_cap's deterministic
    md5-order sample); then the surviving token mass per source — the
    number corpus_mix_weights consumes. The output is the pipeline's
    ledger: n_input → n_quality → n_unique → n_final (+final_tokens),
    per source, every column an exact integer.

    Scale shape: one token explode feeds both the vocab aggregate and the
    per-doc scoring join (term-keyed at 100 TB, broadcast at fixture
    scale); the threshold is a broadcast 1-row aggregate (no eager
    action); dedup and cap are single-window passes over ever-SHRINKING
    survivor sets; the funnel counts are four source-keyed sub-aggregates
    joined on a source-cardinality key. Stage order is the cost order:
    cheap row-local gates first is the usual rule, but dedup-after-quality
    is a CORRECTNESS ordering (keeper selection must happen among eligible
    docs), worth its price."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    uni = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    tot = toks.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("term").alias("v")
    )
    scored = (
        toks.join(F.broadcast(uni), "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            (-F.avg(
                F.log((F.col("c") + F.lit(1).cast("double")) / (F.col("n") + F.col("v")))
            )).alias("xent")
        )
    )
    thr = scored.agg(F.avg("xent").alias("t"))
    q = (
        d.select("doc_id", "source", "text")
        .join(scored, "doc_id")
        .crossJoin(F.broadcast(thr))
        .filter(F.col("xent") <= F.col("t"))
        .select("doc_id", "source", "text")
    )
    w_text = Window.partitionBy("text").orderBy("doc_id")
    dd = q.withColumn("rn", F.row_number().over(w_text)).filter(F.col("rn") == 1)
    w_src = Window.partitionBy("source").orderBy(F.md5("text"), "doc_id")
    capd = dd.withColumn("crn", F.row_number().over(w_src)).filter(
        F.col("crn") <= SOURCE_CAP
    )
    inp = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_input"))
    qual = q.groupBy("source").agg(F.count(F.lit(1)).alias("n_quality"))
    uniq = dd.groupBy("source").agg(F.count(F.lit(1)).alias("n_unique"))
    fin = capd.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_final"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("final_tokens"),
    )
    return (
        inp.join(qual, "source", "left")
        .join(uniq, "source", "left")
        .join(fin, "source", "left")
        .select(
            "source",
            "n_input",
            F.coalesce("n_quality", F.lit(0)).alias("n_quality"),
            F.coalesce("n_unique", F.lit(0)).alias("n_unique"),
            F.coalesce("n_final", F.lit(0)).alias("n_final"),
            F.coalesce("final_tokens", F.lit(0)).alias("final_tokens"),
        )
    )


SHUFFLE_EPOCH_SALT = "ep1:"  # new salt per epoch = a fresh deterministic order
SHUFFLE_BLOCK = 100          # dataloader block size for the mix audit


@query(
    "corpus_global_shuffle",
    oracle=f"""
    WITH r AS (SELECT doc_id, source,
                      md5('{SHUFFLE_EPOCH_SALT}' || doc_id::VARCHAR) AS shuffle_key,
                      substr(md5('{SHUFFLE_EPOCH_SALT}' || doc_id::VARCHAR), 1, 2)
                          AS bucket
               FROM documents),
    -- per-range broadcast offsets: cumulative counts over the 256-bucket
    -- key-prefix support, so the rank window below is PARTITIONED per range
    off AS (
        SELECT bucket,
               (sum(count(*)) OVER (ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - count(*))::BIGINT AS cum_before
        FROM r GROUP BY bucket
    ),
    rk AS (SELECT r.source,
                  o.cum_before
                  + row_number() OVER (PARTITION BY r.bucket
                                       ORDER BY r.shuffle_key, r.doc_id) AS rk
           FROM r JOIN off o ON r.bucket = o.bucket),
    b AS (SELECT ((rk - 1) // {SHUFFLE_BLOCK})::BIGINT AS block, source FROM rk),
    ps AS (SELECT block, source, count(*)::BIGINT AS n FROM b GROUP BY 1, 2)
    SELECT block,
           sum(n)::BIGINT AS n_docs,
           count(*)::BIGINT AS n_sources,
           round(max(n)::DOUBLE / sum(n), 4) AS max_source_frac
    FROM ps GROUP BY block
    """,
    tags=("corpus", "llm"),
)
def corpus_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle — the interleave step
    between corpus assembly and sharding: training order must mix sources
    (a run of 10k consecutive same-source documents wrecks early training),
    be reproducible run-to-run, and re-randomize per epoch. `rand()` fails
    all three; ordering by a salted hash of the stable document key gives a
    uniform pseudo-random total order that is a pure function of
    (epoch_salt, doc_id) — re-runs agree, epochs differ by salt
    (`corpus_shard_split`'s no-migration discipline applied to ordering).

    Emits the per-block mix audit a dataloader would check: for each block
    of SHUFFLE_BLOCK consecutive ranks, the doc count, distinct sources
    represented, and the largest single-source share. Uniform hashing makes
    max_source_frac concentrate near each source's corpus share — the
    measurable definition of "well mixed".

    100 TB shape: the REGISTERED plan is the range-exchange the previous
    docstring only described (VERDICT r9 item 3 — the old plan was a
    global row_number window, one partition at execution). The first two
    hex chars of the uniform shuffle key split the key space into 256
    ranges whose sizes are uniform BY CONSTRUCTION (hash keys can't
    skew); per-range offsets come from one cumulative window over the
    256-row range SUPPORT (the broadcast-offsets half of a distributed
    sort), and each doc's global rank = its range offset + a rank window
    PARTITIONED by range — no corpus-sized unpartitioned window remains
    (pinned in tests/test_plans.py). Widen the prefix as the corpus
    grows (k hex chars → 16^k ranges); a real pipeline writes this order
    once as the shard layout (compose with corpus_shard_split /
    corpus_pack_sequences) rather than keeping a rank column. The audit
    itself reduces to (block, source) partials before the block rollup."""
    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    key = F.md5(
        F.concat(F.lit(SHUFFLE_EPOCH_SALT), F.col("doc_id").cast("string")).cast("binary")
    )
    keyed = d.withColumn("shuffle_key", key).withColumn(
        "bucket", F.substring("shuffle_key", 1, 2)
    )
    woff = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    off = (
        keyed.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("b_n"))
        .select("bucket", (F.sum("b_n").over(woff) - F.col("b_n")).alias("cum_before"))
    )
    wrng = Window.partitionBy("bucket").orderBy("shuffle_key", "doc_id")
    ranked = keyed.join(F.broadcast(off), "bucket").withColumn(
        "rk", F.col("cum_before") + F.row_number().over(wrng)
    )
    per_src = (
        ranked.withColumn(
            "block", ((F.col("rk") - 1) / F.lit(SHUFFLE_BLOCK)).cast("long")
        )
        .groupBy("block", "source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return per_src.groupBy("block").agg(
        F.sum("n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_sources"),
        F.round(F.max("n").cast("double") / F.sum("n"), 4).alias("max_source_frac"),
    )


# --- round 5 continuation: corpus monitoring ---------------------------------

ZIPF_HEAD_RANKS = 100  # fit the distribution head; the freq=1 tail plateau
                       # would flatten any corpus's slope toward 0


@query(
    "text_zipf_fit",
    oracle=f"""
    WITH freqs AS (
        SELECT lang, term, count(*)::BIGINT AS freq
        FROM (SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents)
        GROUP BY lang, term
    ),
    ranked AS (
        SELECT lang, freq,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY freq DESC, term ASC) AS rank
        FROM freqs
    )
    SELECT lang,
           count(*)::BIGINT AS n_ranks,
           round(regr_slope(ln(freq), ln(rank)), 4) + 0.0 AS zipf_slope,
           round(regr_r2(ln(freq), ln(rank)), 4) AS zipf_r2
    FROM ranked WHERE rank <= {ZIPF_HEAD_RANKS}
    GROUP BY lang
    """,
    tags=("llm", "text", "stats"),
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per language — a one-number naturalness monitor for a
    training corpus: log-log regression of term frequency against frequency
    rank over the head of the distribution. Natural language sits near
    slope −1; machine-generated or template-heavy text drifts shallow, and
    a slope that moves between ingestion batches is a cheap drift alarm
    (corpus_drift_psi is the distributional twin over doc features).

    Shape: tokenize → (lang, term) count (partial aggs carry the shuffle,
    one row per distinct term) → rank window per lang → regr_slope /
    regr_r2 builtins, whose moment pipelines match DuckDB's at 4 dp (the
    agg_correlation discipline; ln() is libm, PARITY rule 8). The head cap
    keeps the fit honest: the freq=1 plateau ties are rank-broken by term
    ASC identically in both dialects."""
    d = load(spark, sf_dir, "documents")
    freqs = _tokens(d).groupBy("lang", "term").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.partitionBy("lang").orderBy(F.col("freq").desc(), F.col("term").asc())
    ranked = freqs.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= ZIPF_HEAD_RANKS
    )
    lf, lr = F.log(F.col("freq").cast("double")), F.log(F.col("rank").cast("double"))
    return ranked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_ranks"),
        (F.round(F.regr_slope(lf, lr), 4) + F.lit(0.0)).alias("zipf_slope"),
        F.round(F.regr_r2(lf, lr), 4).alias("zipf_r2"),
    )


PSI_BUCKET_WIDTH = 60  # n_chars per bucket
PSI_N_BUCKETS = 10     # fixed smoothing denominator (least() caps the last bucket)


@query(
    "corpus_drift_psi",
    oracle=f"""
    WITH bucketed AS (
        SELECT least(n_chars // {PSI_BUCKET_WIDTH}, {PSI_N_BUCKETS - 1}) AS bucket,
               count(CASE WHEN doc_id % 2 = 0 THEN 1 END)::BIGINT AS n_ref,
               count(CASE WHEN doc_id % 2 = 1 THEN 1 END)::BIGINT AS n_cur
        FROM documents GROUP BY 1
    ),
    p AS (
        SELECT bucket, n_ref, n_cur,
               (n_ref + 0.5) / (sum(n_ref) OVER () + 0.5 * {PSI_N_BUCKETS}) AS p_ref,
               (n_cur + 0.5) / (sum(n_cur) OVER () + 0.5 * {PSI_N_BUCKETS}) AS p_cur
        FROM bucketed
    )
    SELECT bucket, n_ref, n_cur,
           round(p_ref, 6) AS p_ref, round(p_cur, 6) AS p_cur,
           round((p_cur - p_ref) * ln(p_cur / p_ref), 6) + 0.0 AS psi_term,
           round(sum((p_cur - p_ref) * ln(p_cur / p_ref)) OVER (), 6) AS psi_total
    FROM p
    """,
    tags=("llm", "corpus", "stats"),
)
def corpus_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift report between two corpus snapshots
    (deterministic even/odd doc_id split stands in for batch N vs N+1):
    doc-length histogram per snapshot, Laplace-smoothed shares, per-bucket
    PSI contribution plus the total. PSI > 0.2 is the conventional
    retrain/investigate alarm; the same shape monitors any bucketable
    feature (quality score, source mix, token counts) between ingestion
    batches of a training pipeline.

    Shape: ONE scan with conditional counts (no self-join of snapshots),
    partial-agg to ≤{PSI_N_BUCKETS} bucket rows, then unpartitioned window
    sums over that driver-sized result — the post-agg single-partition
    window is over ≤{PSI_N_BUCKETS} rows however big the corpus is.
    Smoothing uses the FIXED bucket count so empty buckets shift both
    dialects identically; ln() is libm (PARITY rule 8, 6 dp)."""
    d = load(spark, sf_dir, "documents")
    bucket = F.least(
        F.floor(F.col("n_chars") / PSI_BUCKET_WIDTH).cast("bigint"),
        F.lit(PSI_N_BUCKETS - 1),
    )
    bucketed = d.groupBy(bucket.alias("bucket")).agg(
        F.count(F.when(F.col("doc_id") % 2 == 0, 1)).alias("n_ref"),
        F.count(F.when(F.col("doc_id") % 2 == 1, 1)).alias("n_cur"),
    )
    wall = Window.partitionBy()
    p_ref = (F.col("n_ref") + 0.5) / (
        F.sum("n_ref").over(wall) + 0.5 * PSI_N_BUCKETS
    )
    p_cur = (F.col("n_cur") + 0.5) / (
        F.sum("n_cur").over(wall) + 0.5 * PSI_N_BUCKETS
    )
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    return bucketed.select(
        "bucket",
        "n_ref",
        "n_cur",
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_cur, 6).alias("p_cur"),
        (F.round(term, 6) + F.lit(0.0)).alias("psi_term"),
        F.round(F.sum(term).over(wall), 6).alias("psi_total"),
    )


@query(
    "text_novelty_score",
    oracle="""
    WITH grams AS (
        SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS gram
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             unnest(generate_series(1, greatest(len(toks) - 2, 1))) t(i)
    ),
    gram_df AS (SELECT gram, count(*)::BIGINT AS n_docs FROM grams GROUP BY gram)
    SELECT g.doc_id,
           count(*)::BIGINT AS n_grams,
           sum(CASE WHEN d.n_docs = 1 THEN 1 ELSE 0 END)::BIGINT AS n_unique,
           round(sum(CASE WHEN d.n_docs = 1 THEN 1 ELSE 0 END) / count(*), 4) AS novelty
    FROM grams g JOIN gram_df d ON g.gram = d.gram
    GROUP BY g.doc_id
    """,
    tags=("llm", "text", "quality"),
)
def text_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level novelty per document — the fraction of a doc's distinct
    word-trigrams that appear in NO other document. Low novelty marks
    boilerplate/template/near-dup material a diversity-weighted sampler
    should down-weight; high novelty marks unique content worth keeping
    (text_repetition is the INTRA-doc twin, dedup_* find the pairs — this
    scores every doc against the whole corpus in aggregate, no pair list).

    Scale shape: distinct (doc, gram) on xxhash64 keys, ONE gram-keyed
    partial agg for document frequency, one equi-join back, one doc-keyed
    agg — two shuffles total, both on 8-byte keys, never a doc×doc product.
    The integer ratio divides exactly in both dialects."""
    docs = load(spark, sf_dir, "documents")
    grams_expr = F.expr(
        "transform(sequence(1, greatest(size(toks) - 2, 1)),"
        " i -> array_join(slice(toks, i, 3), ' '))"
    )
    grams = (
        docs.select("doc_id", F.split("text", " ").alias("toks"))
        .select("doc_id", F.explode(grams_expr).alias("g"))
        .select("doc_id", F.xxhash64("g").alias("gram"))
        .distinct()
    )
    gram_df = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("n_docs"))
    uniq = F.sum(F.when(F.col("n_docs") == 1, 1).otherwise(0)).cast("long")
    return (
        grams.join(gram_df, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            uniq.alias("n_unique"),
            F.round(uniq / F.count(F.lit(1)), 4).alias("novelty"),
        )
    )


K_ANON_K = 5  # minimum group size for a quasi-identifier combination


@query(
    "privacy_k_anonymity",
    oracle=f"""
    WITH quasi AS (
        SELECT source, lang,
               CASE WHEN n_chars < 200 THEN 'short'
                    WHEN n_chars < 800 THEN 'medium'
                    ELSE 'long' END AS size_band,
               doc_id % 10 AS sensitive_bucket
        FROM documents
    ),
    groups AS (
        SELECT source, lang, size_band,
               count(*)::BIGINT AS group_size,
               count(DISTINCT sensitive_bucket)::BIGINT AS l_diversity
        FROM quasi GROUP BY source, lang, size_band
    )
    SELECT source, lang, size_band, group_size, l_diversity,
           (group_size < {K_ANON_K}) AS violates_k
    FROM groups
    """,
    tags=("llm", "privacy", "audit"),
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit over the corpus's quasi-identifiers —
    the privacy gate that runs NEXT TO text_pii_mask in a release pipeline:
    masking hides direct identifiers, but a (source, lang, size-band)
    combination shared by fewer than k documents still re-identifies via
    linkage. Each quasi-identifier group reports its size (k-anonymity)
    and the number of distinct sensitive values it spans (l-diversity — a
    k-anonymous group with ONE sensitive value still leaks), with
    violators flagged for suppression or generalization.

    One groupBy on the quasi-identifier tuple — partial-agg friendly, the
    distinct-count is the only shuffle-wide term and it's bounded by the
    sensitive domain (10 here). At 100 TB the audit costs one scan; the
    generalization loop (coarsen bands until violations vanish) re-runs
    only the tiny group table, not the corpus."""
    docs = load(spark, sf_dir, "documents")
    size_band = (
        F.when(F.col("n_chars") < 200, "short")
        .when(F.col("n_chars") < 800, "medium")
        .otherwise("long")
    )
    quasi = docs.select(
        "source",
        "lang",
        size_band.alias("size_band"),
        (F.col("doc_id") % 10).alias("sensitive_bucket"),
    )
    return (
        quasi.groupBy("source", "lang", "size_band")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.countDistinct("sensitive_bucket").alias("l_diversity"),
        )
        .withColumn("violates_k", F.col("group_size") < K_ANON_K)
    )


JSD_TOP_V = 50  # bounded vocabulary: top-V global terms, tail -> '<other>'


@query(
    "text_jsd_drift",
    oracle=f"""
    WITH toks AS MATERIALIZED (
        SELECT doc_id % 2 AS snap, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    vocab AS MATERIALIZED (
        SELECT term, row_number() OVER (ORDER BY count(*) DESC, term ASC) AS r
        FROM toks GROUP BY term
    ),
    bucketed AS (
        SELECT CASE WHEN v.term IS NOT NULL THEN t.term ELSE '<other>' END AS bucket,
               count(CASE WHEN t.snap = 0 THEN 1 END)::BIGINT AS n_ref,
               count(CASE WHEN t.snap = 1 THEN 1 END)::BIGINT AS n_cur
        FROM toks t LEFT JOIN (SELECT term FROM vocab WHERE r <= {JSD_TOP_V}) v
          ON t.term = v.term
        GROUP BY 1
    ),
    p AS (
        SELECT bucket, n_ref, n_cur,
               (n_ref + 0.5) / (sum(n_ref) OVER () + 0.5 * {JSD_TOP_V + 1}) AS p_ref,
               (n_cur + 0.5) / (sum(n_cur) OVER () + 0.5 * {JSD_TOP_V + 1}) AS p_cur
        FROM bucketed
    )
    SELECT bucket, n_ref, n_cur,
           round(0.5 * (p_ref * ln(p_ref / ((p_ref + p_cur) / 2)))
                 + 0.5 * (p_cur * ln(p_cur / ((p_ref + p_cur) / 2))), 6) + 0.0
               AS jsd_term,
           round(sum(0.5 * (p_ref * ln(p_ref / ((p_ref + p_cur) / 2)))
                     + 0.5 * (p_cur * ln(p_cur / ((p_ref + p_cur) / 2)))) OVER (), 6)
               AS jsd_total
    FROM p
    """,
    tags=("llm", "corpus", "stats"),
)
def text_jsd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon drift between two corpus snapshots over the TOKEN
    distribution — the information-theoretic companion to
    corpus_drift_psi's length-histogram PSI: PSI watches a bucketable
    scalar; JSD watches WHAT IS BEING SAID (vocabulary shift — a new
    domain flooding in changes term mass long before doc lengths move).
    Symmetric and bounded in [0, ln 2], so thresholds transfer across
    corpora; same even/odd doc_id split as PSI stands in for batch N vs
    N+1.

    The vocabulary is bounded deterministically — top-{JSD_TOP_V} global
    terms by (freq DESC, term ASC), every other token folded into
    '<other>' — so the report is ≤{JSD_TOP_V + 1} rows at any corpus
    size and the Laplace smoothing denominator is a FIXED bucket count
    (PSI's rule: empty buckets shift both dialects identically).
    Shares are ratios of exact integer counts (identical doubles both
    sides); ln is libm → 6 dp aggregate rounding (rule 8), -0.0 guarded.

    Scale shape: one token explode feeding two partial aggs (global
    vocab rank, per-bucket conditional counts) — snapshots are
    conditional counts in ONE pass, never a self-join; the JSD window
    runs over the ≤{JSD_TOP_V + 1}-row report."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        (F.col("doc_id") % 2).alias("snap"), F.explode(F.split("text", " ")).alias("term")
    )
    topv = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("term").asc())
        .limit(JSD_TOP_V)
        .select("term", F.lit(1).alias("in_vocab"))
    )
    bucketed = (
        toks.join(F.broadcast(topv), "term", "left")
        .select(
            F.when(F.col("in_vocab").isNotNull(), F.col("term"))
            .otherwise("<other>")
            .alias("bucket"),
            "snap",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.when(F.col("snap") == 0, 1)).alias("n_ref"),
            F.count(F.when(F.col("snap") == 1, 1)).alias("n_cur"),
        )
    )
    wall = Window.partitionBy()
    p_ref = (F.col("n_ref") + 0.5) / (F.sum("n_ref").over(wall) + 0.5 * (JSD_TOP_V + 1))
    p_cur = (F.col("n_cur") + 0.5) / (F.sum("n_cur").over(wall) + 0.5 * (JSD_TOP_V + 1))
    shares = bucketed.select("bucket", "n_ref", "n_cur", p_ref.alias("p_ref"), p_cur.alias("p_cur"))
    m = (F.col("p_ref") + F.col("p_cur")) / 2
    term_jsd = 0.5 * (F.col("p_ref") * F.log(F.col("p_ref") / m)) + 0.5 * (
        F.col("p_cur") * F.log(F.col("p_cur") / m)
    )
    return shares.select(
        "bucket",
        "n_ref",
        "n_cur",
        (F.round(term_jsd, 6) + F.lit(0.0)).alias("jsd_term"),
        F.round(F.sum(term_jsd).over(wall), 6).alias("jsd_total"),
    )


VOCAB_COVERAGE_KS = (5, 10, 20, 50)  # vocabulary-size checkpoints


@query(
    "text_vocab_coverage",
    oracle=f"""
    WITH counts AS MATERIALIZED (
        SELECT term, count(*)::BIGINT AS cnt FROM (
            SELECT unnest(string_split(text, ' ')) AS term FROM documents
        ) GROUP BY term
    ),
    ranked AS (
        SELECT cnt,
               row_number() OVER (ORDER BY cnt DESC, term ASC) AS r,
               (sum(cnt) OVER ())::BIGINT AS total,
               (count(*) OVER ())::BIGINT AS vocab
        FROM counts
    ),
    wide AS (
        SELECT max(total)::BIGINT AS total_tokens, max(vocab)::BIGINT AS vocab_size,
               {', '.join(f"sum(CASE WHEN r <= {k} THEN cnt ELSE 0 END)::BIGINT AS cov{k}" for k in VOCAB_COVERAGE_KS)}
        FROM ranked
    )
    {' UNION ALL '.join(
        f"SELECT {k}::INT AS k, vocab_size, total_tokens, cov{k} AS covered_tokens,"
        f" (cov{k} * 1000000 // nullif(total_tokens, 0))::BIGINT AS coverage_ppm FROM wide"
        for k in VOCAB_COVERAGE_KS
    )}
    """,
    tags=("llm", "text", "corpus"),
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve — what fraction of all token OCCURRENCES
    the top-K most frequent terms capture, at a grid of K. This is the
    sizing question every tokenizer/vocab decision starts from (the
    empirical Zipf integral text_zipf_fit parameterizes): a corpus where
    K=50 already covers 99% tolerates a tiny vocab; a flat curve says
    byte-level fallback will fire constantly. Deterministic rank
    (freq DESC, term ASC — the top-V rule text_jsd_drift uses), coverage
    as integer-ppm (rule 25), all counts exact.

    Shape: one token explode → term-count partial agg → a single window
    pass over the VOCABULARY (not the corpus) computing rank/total →
    conditional sums fold every checkpoint in one aggregate; the
    wide→long unpivot is driver-sized. At 100 TB only the explode sees
    corpus rows; the ranked frame is |vocab| rows."""
    d = load(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wr = Window.orderBy(F.col("cnt").desc(), F.col("term").asc())
    wall = Window.partitionBy()
    ranked = counts.select(
        "cnt",
        F.row_number().over(wr).alias("r"),
        F.sum("cnt").over(wall).alias("total"),
        F.count(F.lit(1)).over(wall).alias("vocab"),
    )
    wide = ranked.agg(
        F.max("total").alias("total_tokens"),
        F.max("vocab").alias("vocab_size"),
        *[
            F.sum(F.when(F.col("r") <= k, F.col("cnt")).otherwise(0)).alias(f"cov{k}")
            for k in VOCAB_COVERAGE_KS
        ],
    )
    stack_args = ", ".join(f"{k}, cov{k}" for k in VOCAB_COVERAGE_KS)
    return (
        wide.select(
            "vocab_size",
            "total_tokens",
            F.expr(f"stack({len(VOCAB_COVERAGE_KS)}, {stack_args}) AS (k, covered_tokens)"),
        )
        .select(
            F.col("k").cast("int").alias("k"),
            "vocab_size",
            "total_tokens",
            "covered_tokens",
            F.expr(
                "CAST(covered_tokens * 1000000 DIV nullif(total_tokens, 0) AS BIGINT)"
            ).alias("coverage_ppm"),
        )
    )


@query(
    "privacy_suppression",
    oracle=f"""
    WITH quasi AS (
        SELECT source, lang,
               CASE WHEN n_chars < 200 THEN 'short'
                    WHEN n_chars < 800 THEN 'medium'
                    ELSE 'long' END AS size_band
        FROM documents
    ),
    full_groups AS (
        SELECT source, lang, size_band, count(*)::BIGINT AS n_docs
        FROM quasi GROUP BY source, lang, size_band
    ),
    kept AS (
        SELECT source, lang, size_band, n_docs, 0::BIGINT AS gen_level
        FROM full_groups WHERE n_docs >= {K_ANON_K}
    ),
    coarse AS (
        SELECT source, lang, '*' AS size_band, sum(n_docs)::BIGINT AS n_docs
        FROM full_groups WHERE n_docs < {K_ANON_K}
        GROUP BY source, lang
    ),
    kept2 AS (
        SELECT source, lang, size_band, n_docs, 1::BIGINT AS gen_level
        FROM coarse WHERE n_docs >= {K_ANON_K}
    ),
    suppressed AS (
        SELECT '*' AS source, '*' AS lang, '*' AS size_band,
               coalesce(sum(n_docs), 0)::BIGINT AS n_docs, 2::BIGINT AS gen_level
        FROM coarse WHERE n_docs < {K_ANON_K}
    )
    SELECT * FROM kept
    UNION ALL SELECT * FROM kept2
    UNION ALL SELECT * FROM suppressed WHERE n_docs > 0
    """,
    tags=("llm", "privacy", "pipeline"),
)
def privacy_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalize-then-suppress — the ENFORCEMENT mechanism for the
    violations privacy_k_anonymity only audits: equivalence classes of
    size >= k release at full quasi-identifier precision (gen_level 0);
    violating classes coarsen size_band to '*' and re-test on the merged
    class (gen_level 1); classes still below k after generalization are
    suppressed into one opaque '*' bucket (gen_level 2) whose only
    released fact is its total count. Every released class satisfies
    k-anonymity by construction — the property test re-checks
    min(n_docs) >= k over gen_level <= 1 — and the three levels sum to
    the corpus row count (nothing silently dropped; also pinned).

    The generalization lattice walks ONE level here (size_band is the
    fixture's only coarsenable attribute); a production QI set walks
    attribute-by-attribute up the same lattice, re-running only the
    GROUP table each step — which is why the iteration is cheap at any
    scale: the corpus is scanned once into full_groups (partial-agg,
    map-side combine), and every subsequent step aggregates the tiny
    class table, never the documents. Suppression cost (docs lost) is
    read directly off the gen_level-2 row."""
    docs = load(spark, sf_dir, "documents")
    size_band = (
        F.when(F.col("n_chars") < 200, "short")
        .when(F.col("n_chars") < 800, "medium")
        .otherwise("long")
    )
    full_groups = (
        docs.select("source", "lang", size_band.alias("size_band"))
        .groupBy("source", "lang", "size_band")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    kept = full_groups.filter(F.col("n_docs") >= K_ANON_K).withColumn(
        "gen_level", F.lit(0).cast("long")
    )
    coarse = (
        full_groups.filter(F.col("n_docs") < K_ANON_K)
        .groupBy("source", "lang")
        .agg(F.sum("n_docs").alias("n_docs"))
        .select("source", "lang", F.lit("*").alias("size_band"), "n_docs")
    )
    kept2 = coarse.filter(F.col("n_docs") >= K_ANON_K).withColumn(
        "gen_level", F.lit(1).cast("long")
    )
    suppressed = (
        coarse.filter(F.col("n_docs") < K_ANON_K)
        .agg(F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n_docs"))
        .select(
            F.lit("*").alias("source"),
            F.lit("*").alias("lang"),
            F.lit("*").alias("size_band"),
            "n_docs",
            F.lit(2).cast("long").alias("gen_level"),
        )
        .filter(F.col("n_docs") > 0)
    )
    return kept.unionAll(kept2).unionAll(suppressed)


# --- round 8: preference pairs, length bucketing, record linkage, card -----

PREF_MIN_MARGIN_PPM = 20_000  # 2-point lexical-diversity gap: a pair whose
                              # chosen/rejected scores are closer than this
                              # teaches a preference model nothing


@query(
    "corpus_preference_pairs",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang, source,
               substr(md5(doc_id::VARCHAR), 1, 1) AS bucket,
               len(list_distinct(string_split(text, ' '))) * 1000000
                   // len(string_split(text, ' ')) AS score_ppm
        FROM documents
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY lang, source, bucket
                                  ORDER BY score_ppm DESC, doc_id ASC) AS rn_best,
               row_number() OVER (PARTITION BY lang, source, bucket
                                  ORDER BY score_ppm ASC, doc_id ASC) AS rn_worst
        FROM scored
    )
    SELECT b.lang, b.source, b.bucket,
           b.doc_id AS chosen_doc, w.doc_id AS rejected_doc,
           b.score_ppm::BIGINT AS chosen_score_ppm,
           w.score_ppm::BIGINT AS rejected_score_ppm,
           (b.score_ppm - w.score_ppm)::BIGINT AS margin_ppm
    FROM ranked b
    JOIN ranked w ON b.lang = w.lang AND b.source = w.source
                 AND b.bucket = w.bucket
    WHERE b.rn_best = 1 AND w.rn_worst = 1
      AND b.doc_id != w.doc_id
      AND b.score_ppm - w.score_ppm >= {PREF_MIN_MARGIN_PPM}
    """,
    tags=("llm", "corpus", "preference"),
)
def corpus_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction — the DPO/RLHF data shape: within each
    comparison bucket (here (lang, source, md5-nibble of doc_id) stands in
    for "responses to the same prompt"), pick the highest- and
    lowest-quality document as (chosen, rejected), and keep the pair only
    when the quality margin is wide enough to carry signal. The quality
    score is lexical diversity in EXACT integer ppm (distinct tokens *
    1e6 div tokens — rule 25: integer ratios, never rounded floats), and
    ties break on doc_id, so the pair set is deterministic across engines
    and across reruns — re-labeling a training set must not reshuffle it.

    Shape: one scan computes scores map-side; TWO row_number windows over
    the same (lang, source, bucket) partition (one sort each way) pick the
    extremes; the argmax rows then self-join on the bucket key — both
    sides are |buckets| rows, not |docs|, so the join input collapsed by
    three orders of magnitude before any shuffle pairing. At 100 TB the
    bucket key is the real prompt id and the window is exactly this plan;
    min/max_by would halve the sorts but lose the rank columns a
    multi-pair variant (best-vs-median, best-vs-2nd) reads."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    scored = d.select(
        "doc_id",
        "lang",
        "source",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("bucket"),
        F.expr(
            "size(array_distinct(split(text, ' '))) * 1000000L div size(split(text, ' '))"
        ).alias("score_ppm"),
    )
    wb = Window.partitionBy("lang", "source", "bucket").orderBy(
        F.col("score_ppm").desc(), F.col("doc_id").asc()
    )
    ww = Window.partitionBy("lang", "source", "bucket").orderBy(
        F.col("score_ppm").asc(), F.col("doc_id").asc()
    )
    ranked = scored.select(
        "*", F.row_number().over(wb).alias("rn_best"), F.row_number().over(ww).alias("rn_worst")
    )
    best = ranked.filter(F.col("rn_best") == 1).select(
        "lang", "source", "bucket",
        F.col("doc_id").alias("chosen_doc"), F.col("score_ppm").alias("chosen_score_ppm"),
    )
    worst = ranked.filter(F.col("rn_worst") == 1).select(
        "lang", "source", "bucket",
        F.col("doc_id").alias("rejected_doc"), F.col("score_ppm").alias("rejected_score_ppm"),
    )
    return (
        best.join(worst, ["lang", "source", "bucket"])
        .filter(
            (F.col("chosen_doc") != F.col("rejected_doc"))
            & (F.col("chosen_score_ppm") - F.col("rejected_score_ppm") >= PREF_MIN_MARGIN_PPM)
        )
        .select(
            "lang", "source", "bucket", "chosen_doc", "rejected_doc",
            "chosen_score_ppm", "rejected_score_ppm",
            (F.col("chosen_score_ppm") - F.col("rejected_score_ppm")).alias("margin_ppm"),
        )
    )


@query(
    "corpus_length_buckets",
    oracle="""
    WITH toks AS (
        SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens
        FROM documents
    ),
    bucketed AS (
        SELECT doc_id, n_tokens,
               CASE WHEN n_tokens = 1 THEN 1::BIGINT
                    ELSE (1::BIGINT << length(to_base(n_tokens - 1, 2))) END AS bucket_cap
        FROM toks
    )
    SELECT bucket_cap,
           count(*)::BIGINT AS n_docs,
           sum(n_tokens)::BIGINT AS sum_tokens,
           min(n_tokens)::BIGINT AS min_tokens,
           max(n_tokens)::BIGINT AS max_tokens,
           (bucket_cap * count(*))::BIGINT AS capacity_tokens,
           ((bucket_cap * count(*) - sum(n_tokens)) * 1000000
               // (bucket_cap * count(*)))::BIGINT AS pad_waste_ppm
    FROM bucketed GROUP BY bucket_cap
    """,
    tags=("llm", "corpus", "batching"),
)
def corpus_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching audit — the padding-waste ledger every
    sequence-training pipeline needs: documents are assigned to
    power-of-two capacity buckets (bucket = 2^ceil(log2(tokens)), computed
    with the same exact binary-string-length arithmetic as
    agg_log_histogram_quantile — never float log2), and each bucket
    reports how many pad tokens a batch at that capacity burns
    (capacity − real tokens, as integer ppm of capacity — rule 25).
    corpus_pack_sequences eliminates the waste by packing; THIS op is the
    measurement that justifies packing, and the bucket boundaries are the
    ones a bucketed-batching dataloader would use directly.

    One map-side bucket expression + one partial-agg groupBy over ≤ ~13
    buckets: state is constant, the shuffle carries buckets not documents,
    and the op costs one corpus scan at any scale."""
    d = load(spark, sf_dir, "documents")
    bucketed = d.select(
        F.expr(
            "CASE WHEN size(split(text, ' ')) = 1 THEN cast(1 as bigint)"
            " ELSE shiftleft(cast(1 as bigint),"
            "      length(conv(cast(size(split(text, ' ')) - 1 as bigint), 10, 2))) END"
        ).alias("bucket_cap"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    return (
        bucketed.groupBy("bucket_cap")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .select(
            "bucket_cap",
            "n_docs",
            "sum_tokens",
            "min_tokens",
            "max_tokens",
            (F.col("bucket_cap") * F.col("n_docs")).alias("capacity_tokens"),
            F.expr(
                "(bucket_cap * n_docs - sum_tokens) * 1000000 div (bucket_cap * n_docs)"
            ).alias("pad_waste_ppm"),
        )
    )


ER_VARIANT_BASE = 10_000_000  # variant ids live in a disjoint key range


@query(
    "er_record_linkage",
    oracle=f"""
    WITH base AS (
        SELECT c_custkey AS rec_id, lower(c_name) AS name, c_nationkey AS nation
        FROM customer
    ),
    variants AS (
        -- deterministic dirty re-entries: every third customer re-registers
        -- with ONE digit dropped at position 13 + (custkey % 6) — the last
        -- six digits, the only characters that discriminate TPC-H names
        SELECT c_custkey + {ER_VARIANT_BASE} AS rec_id,
               substr(lower(c_name), 1, 12 + c_custkey % 6)
                   || substr(lower(c_name), 14 + c_custkey % 6, 50) AS name,
               c_nationkey AS nation
        FROM customer WHERE c_custkey % 3 = 0
    ),
    dirty AS (SELECT * FROM base UNION ALL SELECT * FROM variants),
    windows AS (
        SELECT rec_id, name, nation, substr(name, 10, 50) AS w FROM dirty
    ),
    dels AS (
        SELECT DISTINCT rec_id, name, nation,
               substr(w, 1, i) || substr(w, i + 2, 50) AS delkey
        FROM windows, unnest(range(len(w))) t(i)
    ),
    cand AS (
        SELECT DISTINCT d.rec_id AS id_a, s.rec_id AS id_b,
               d.name AS name_a, s.name AS name_b, d.nation AS nation
        FROM dels d
        JOIN windows s
          ON d.nation = s.nation AND d.delkey = s.w
         AND length(s.name) + 1 = length(d.name)
    )
    SELECT id_a, id_b, nation,
           levenshtein(name_a, name_b) AS dist,
           (id_b - {ER_VARIANT_BASE} = id_a) AS true_match
    FROM cand
    WHERE levenshtein(name_a, name_b) = 1
    """,
    tags=("llm", "linkage", "dedup"),
)
def er_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    '''Entity resolution via DELETION-NEIGHBORHOOD blocking (the
    SymSpell / FastSS family) — the record-linkage loop behind every
    customer-dedup / identity-graph job, built to survive its own scale
    math: a dirty universe (originals plus deterministic one-digit-dropped
    re-entries, generated in-plan like mm_phash_band\'s mutated uploads)
    is matched WITHOUT quadratic blocks. Every record emits (a) its
    FULL digit zone (chars 10+ of the name — the window must cover every
    character that can ever discriminate: a first cut windowed only the
    last six digits and the 100x sweep showed key growth adds entropy in
    the HIGH digits, outside that window, so deletion keys saturated and
    candidate blocks went quadratic in the replication factor) as a SELF
    key and (b) each
    single-deletion form of that window as a DELETION key; a dirty
    re-entry then collides with its base record exactly where the base\'s
    deletion key equals the variant\'s own window. The length gate
    (|name_a| = |name_b| + 1) encodes the error model — equal-length
    sequential neighbors ("…001" vs "…002", edit distance 1
    legitimately!) can never pair, which is the classic ER lesson that
    the comparison rule must encode the ERROR MODEL, not just a distance.
    Verified pairs carry a true_match flag (variant ids are offset by
    ER_VARIANT_BASE), so precision — deletion COLLISIONS, distinct bases
    whose deletion neighborhoods overlap — is readable from the output.

    Why not classic value blocking (nation × digit-slice keys)? Fixed-
    cardinality blocks make candidate volume Σ|block|² — quadratic in N
    once the key saturates (the first cut of this op paid N²/25000 at
    sf1). Deletion keys scale WITH the data: ~|window| keys per record,
    key cardinality grows with N, so candidates stay ~linear and the
    O(len²) levenshtein verify runs only on near-certain pairs — at
    100 TB this is one shuffle keyed by (nation, 5-char key) with no
    hot block. The DISTINCTs collapse duplicate keys (adjacent equal
    chars delete to the same form) before and after the join.'''
    cust = load(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_custkey").alias("rec_id"),
        F.lower(F.col("c_name")).alias("name"),
        F.col("c_nationkey").alias("nation"),
    )
    variants = cust.filter(F.col("c_custkey") % 3 == 0).select(
        (F.col("c_custkey") + ER_VARIANT_BASE).alias("rec_id"),
        F.concat(
            F.expr("substr(lower(c_name), 1, cast(12 + c_custkey % 6 as int))"),
            F.expr("substr(lower(c_name), cast(14 + c_custkey % 6 as int), 50)"),
        ).alias("name"),
        F.col("c_nationkey").alias("nation"),
    )
    dirty = base.unionByName(variants)
    windows = dirty.select(
        "rec_id", "name", "nation", F.expr("substr(name, 10, 50)").alias("w")
    )
    dels = windows.select(
        "rec_id",
        "name",
        "nation",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(0, length(w) - 1),"
                    " i -> concat(substr(w, 1, i), substr(w, i + 2, 50)))"
                )
            )
        ).alias("delkey"),
    )
    s = windows.alias("s")
    d = dels.alias("d")
    cand = (
        d.join(
            s,
            (F.col("d.nation") == F.col("s.nation"))
            & (F.col("d.delkey") == F.col("s.w"))
            & (F.length("s.name") + 1 == F.length("d.name")),
        )
        .select(
            F.col("d.rec_id").alias("id_a"),
            F.col("s.rec_id").alias("id_b"),
            F.col("d.name").alias("name_a"),
            F.col("s.name").alias("name_b"),
            F.col("d.nation").alias("nation"),
        )
        .distinct()
    )
    dist = F.levenshtein("name_a", "name_b")
    return cand.filter(dist == 1).select(
        "id_a",
        "id_b",
        "nation",
        dist.alias("dist"),
        (F.col("id_b") - ER_VARIANT_BASE == F.col("id_a")).alias("true_match"),
    )



@query(
    "corpus_dataset_card",
    oracle="""
    WITH toks AS (
        SELECT doc_id, text, lang, source,
               len(string_split(text, ' '))::BIGINT AS n_tokens
        FROM documents
    ),
    hist AS (
        SELECT n_tokens, count(*)::BIGINT AS cnt FROM toks GROUP BY n_tokens
    ),
    cum AS (
        SELECT n_tokens, cnt,
               sum(cnt) OVER (ORDER BY n_tokens
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_n,
               sum(cnt) OVER ()::BIGINT AS n
        FROM hist
    ),
    med AS (
        SELECT min(CASE WHEN cum_n >= (n + 1) // 2 THEN n_tokens END)::BIGINT
                   AS p50_tokens
        FROM cum
    ),
    flat AS (
        SELECT count(*)::BIGINT AS n_docs,
               sum(n_tokens)::BIGINT AS n_tokens,
               count(DISTINCT lang)::BIGINT AS n_langs,
               count(DISTINCT source)::BIGINT AS n_sources,
               count(DISTINCT md5(text))::BIGINT AS n_unique_texts
        FROM toks
    )
    SELECT n_docs, n_tokens, n_langs, n_sources,
           (n_tokens * 1000000 // n_docs)::BIGINT AS mean_tokens_ppm,
           p50_tokens,
           ((n_docs - n_unique_texts) * 1000000 // n_docs)::BIGINT AS dup_ppm
    FROM flat CROSS JOIN med
    """,
    tags=("llm", "corpus", "report"),
)
def corpus_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card — the one-row release artifact summarizing a training
    corpus (the "datasheet" block of a model card): document and token
    inventories, language/source diversity, the median document length
    (via the sort-free cumulative-histogram order statistic of
    agg_quantile_histogram — token counts are already a discrete domain),
    and the exact-duplicate rate by content hash (dedup_exact's md5 rule),
    all as integers or integer ppm (rule 25).

    Cost model at 100 TB: ONE corpus scan feeds every number — the flat
    aggregate is a single partial-agg pass whose two distinct-counts are
    bounded by tiny domains (langs, sources) plus one md5-keyed distinct
    that shuffles 16-byte fingerprints (not text); the median runs over
    the |distinct lengths| histogram. A release gate recomputes this card
    per snapshot and diffs it against the previous one (corpus_drift_psi
    is the distributional sibling)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        "source",
        F.md5(F.col("text")).alias("text_md5"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    hist = toks.groupBy("n_tokens").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = Window.orderBy("n_tokens").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = hist.select(
        "n_tokens",
        F.sum("cnt").over(wcum).alias("cum_n"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    med = cum.agg(
        F.min(F.expr("CASE WHEN cum_n >= (n + 1) div 2 THEN n_tokens END")).alias("p50_tokens")
    )
    flat = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("text_md5").alias("n_unique_texts"),
    )
    return flat.crossJoin(F.broadcast(med)).select(
        "n_docs",
        "n_tokens",
        "n_langs",
        "n_sources",
        F.expr("n_tokens * 1000000 div n_docs").alias("mean_tokens_ppm"),
        "p50_tokens",
        F.expr("(n_docs - n_unique_texts) * 1000000 div n_docs").alias("dup_ppm"),
    )


CURRICULUM_PHASES = 5  # training phases, lowest-diversity first


@query(
    "corpus_curriculum_order",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id,
               len(list_distinct(string_split(text, ' '))) * 1000000
                   // len(string_split(text, ' ')) AS score_ppm,
               len(string_split(text, ' '))::BIGINT AS n_tokens
        FROM documents
    ),
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY score_ppm ASC, doc_id ASC) AS rn,
               count(*) OVER ()::BIGINT AS n
        FROM scored
    ),
    phased AS (
        SELECT ((rn - 1) * {CURRICULUM_PHASES}) // n AS phase, score_ppm, n_tokens
        FROM ranked
    ),
    agged AS (
        SELECT phase::BIGINT AS phase,
               count(*)::BIGINT AS n_docs,
               sum(n_tokens)::BIGINT AS phase_tokens,
               min(score_ppm)::BIGINT AS min_score_ppm,
               max(score_ppm)::BIGINT AS max_score_ppm
        FROM phased GROUP BY phase
    )
    SELECT *, (sum(phase_tokens) OVER (ORDER BY phase
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
               AS cum_tokens
    FROM agged
    """,
    tags=("llm", "corpus", "curriculum"),
)
def corpus_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum schedule construction — order the corpus into training
    phases by a difficulty proxy (lexical diversity in exact integer ppm,
    the corpus_preference_pairs score; lowest-diversity documents train
    first, the anti-curriculum variant is the same table read backwards)
    and emit each phase's token budget with cumulative boundaries — the
    table a phased dataloader consumes directly, and the complement of
    corpus_epoch_schedule (which repeats sources across epochs; this
    orders WITHIN the corpus by difficulty). Phase assignment uses the
    full-tiebreak rank rule (score, doc_id — eval_lift_table's decile
    discipline: ntile without a total order is run-dependent), so the
    schedule is reproducible run over run.

    Scale: the registered plan is the histogram-boundary one (VERDICT r8
    item 2 — previously only described here, now the default). Phase
    BOUNDARIES come from the score histogram's cumulative counts (the
    agg_quantile_histogram trick — scores are integer ppm, a bounded
    discrete domain ≤1e6+1 values, so the cumulative window runs over
    score SUPPORT, never over the corpus-sized frame). Score groups that
    straddle no phase boundary contribute (doc count, token sum) to one
    phase wholesale; only the ≤PHASES-1 boundary-straddling groups rejoin
    per-doc for the (score, doc_id) tiebreak — a row_number PARTITIONED by
    score_ppm (pinned by tests/test_plans.py). Exact-integer algebra, so
    the result is bit-identical to the naive global rank."""
    d = load(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        F.expr(
            "size(array_distinct(split(text, ' '))) * 1000000L div size(split(text, ' '))"
        ).alias("score_ppm"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    hist = scored.groupBy("score_ppm").agg(
        F.count(F.lit(1)).alias("g_n"), F.sum("n_tokens").alias("g_tok")
    )
    whist = Window.orderBy(F.col("score_ppm").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    hist = hist.select(
        "score_ppm",
        "g_n",
        "g_tok",
        (F.sum("g_n").over(whist) - F.col("g_n")).alias("cum_before"),
    )
    totals = scored.agg(F.count(F.lit(1)).alias("n"))
    h = hist.crossJoin(F.broadcast(totals)).select(
        "*",
        F.expr(f"cum_before * {CURRICULUM_PHASES} div n").alias("p_first"),
        F.expr(f"(cum_before + g_n - 1) * {CURRICULUM_PHASES} div n").alias("p_last"),
    )
    whole = h.filter(F.col("p_first") == F.col("p_last")).select(
        F.col("p_first").alias("phase"),
        F.col("g_n").alias("n_docs"),
        F.col("g_tok").alias("phase_tokens"),
        F.col("score_ppm").alias("min_score_ppm"),
        F.col("score_ppm").alias("max_score_ppm"),
    )
    strad = h.filter(F.col("p_first") != F.col("p_last")).select(
        "score_ppm", "cum_before", "n"
    )
    wgrp = Window.partitionBy("score_ppm").orderBy(F.col("doc_id").asc())
    split = (
        scored.join(F.broadcast(strad), "score_ppm")
        .select(
            "score_ppm",
            "n_tokens",
            "n",
            (
                (F.col("cum_before") + F.row_number().over(wgrp) - F.lit(1))
                * F.lit(CURRICULUM_PHASES)
            ).alias("scaled_rank"),
        )
        .groupBy(F.expr("scaled_rank div n").alias("phase"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("phase_tokens"),
            F.min("score_ppm").alias("min_score_ppm"),
            F.max("score_ppm").alias("max_score_ppm"),
        )
    )
    phased = whole.unionByName(split).groupBy("phase").agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("phase_tokens").alias("phase_tokens"),
        F.min("min_score_ppm").alias("min_score_ppm"),
        F.max("max_score_ppm").alias("max_score_ppm"),
    )
    wcum = Window.orderBy("phase").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return phased.select(
        F.col("phase").cast("long").alias("phase"),
        "n_docs",
        "phase_tokens",
        "min_score_ppm",
        "max_score_ppm",
        F.sum("phase_tokens").over(wcum).alias("cum_tokens"),
    )


# --- round 8: declarative BPE training ---------------------------------------

BPE_MERGES = 3  # unrolled merge rounds (the vocabulary artifact's first rows)

# (applicationId, sf_dir) -> (rules, t0, t): both text_bpe_train and
# text_bpe_apply consume IDENTICAL merge rounds, so the full training chain
# (3 checkpointed iterative rounds, ~4.8s at bench scale) runs once per
# session — the _SIM_PAIR_EDGES memo discipline (ADVICE r8 item 3). Safe to
# share: every frame in the tuple is eagerly checkpointed (or derived from
# checkpointed parents), so the memo holds materialized lineage, not live
# subtrees.
_BPE_ROUNDS: dict[tuple[str, str], tuple] = {}


def _bpe_rounds(spark: SparkSession, sf_dir: str):
    """Shared BPE machinery: run BPE_MERGES greedy merge rounds and return
    (per-round rule frames, initial token frame, final token frame),
    computed once per (session, sf_dir).

    Materialization (optimization round 13, VERDICT r12 item 3 — guide
    §2.4/§5): the per-round `big` (lead-windowed token frame) is CACHED,
    not checkpointed. Each round reads it twice (the winning-pair count
    and the merge application), and an InMemoryRelation — unlike a
    checkpoint's ReadRDD — PRESERVES the (doc_id) hash partitioning and
    (pos) sort order of the window that built it, so the merge
    application's cumulative windows run with NO further Exchange or Sort:
    the token frame is exchanged/sorted exactly ONCE for the whole
    training chain (round 0), where the checkpoint formulation re-paid
    exchange+sort in every pass of every round (6 extra exchange+sort
    passes + 2 inner checkpoint writes + read-backs). Only the FINAL
    token frame is eagerly checkpointed — the memo hands out materialized
    disk-backed lineage (the graph_hits lesson), and every inner cache is
    unpersisted before returning (the min_label_components hygiene
    contract). At 100 TB the cached token frame spills to disk
    (MEMORY_AND_DISK) — the same storage bill the checkpoint paid, minus
    the re-exchange."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _BPE_ROUNDS:
        return _BPE_ROUNDS[key]
    from ..session import ensure_checkpoint_dir

    ensure_checkpoint_dir(spark)
    d = load(spark, sf_dir, "documents")
    t0 = d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "tok"),
    )
    t = t0
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    wrun = w_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rules = []
    inner_caches = []
    for k in range(BPE_MERGES):
        big = t.select(
            "doc_id", "pos", "tok", F.lead("tok").over(w_doc).alias("nxt")
        ).cache()
        inner_caches.append(big)
        cnt = (
            big.filter(F.col("nxt").isNotNull())
            .groupBy(F.col("tok").alias("l"), F.col("nxt").alias("r"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # The winning pair is ONE row by construction — collect it and apply
        # the merge with literal predicates instead of a checkpointed
        # broadcast join (guide §1.2/§5: O(1) driver state; round-12 rewrite).
        lrow = (
            cnt.orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )[0]
        l_lit, r_lit, c_lit = lrow["l"], lrow["r"], lrow["c"]
        # Merge application as pure cumulative windows over the ONE doc_id
        # partitioning (replacing the prior broadcast join + (doc_id,
        # pos-rn) window + two (doc_id, pos) equi-joins — every step below
        # rides w_doc's single exchange+sort). Positions are dense within a
        # doc, so "previous position" is the lag row:
        #   m   = this position starts the winning pair;
        #   rnc = running count of matched positions (== the old row_number
        #         over matched rows, evaluated at matched rows);
        #   kk  = index within a RUN of consecutive matched positions
        #         (rnc minus rnc at the run's start, + 1) — the old
        #         row_number over (doc_id, pos - rn);
        #   sel = odd kk ⇒ this pair merges (standard non-overlapping
        #         left-to-right greedy rule);
        #   drop rows whose PREVIOUS position merged (they are the absorbed
        #   right halves — the old left_anti join), re-rank pos, concat.
        # Output is bit-identical to the join formulation (rules + final
        # token frame verified identical at sf0.1; oracle unchanged).
        m = (F.col("tok") == F.lit(l_lit)) & (F.col("nxt") == F.lit(r_lit))
        flagged = big.select("doc_id", "pos", "tok", "nxt", m.cast("int").alias("m"))
        run_start = (F.col("m") == 1) & (
            F.coalesce(F.lag("m").over(w_doc), F.lit(0)) == 0
        )
        staged = flagged.select(
            "doc_id", "pos", "tok", "nxt", "m",
            F.sum("m").over(wrun).alias("rnc"),
            run_start.cast("int").alias("rs"),
        )
        staged = staged.select(
            "doc_id", "pos", "tok", "nxt", "m",
            (
                F.col("rnc")
                - F.last(
                    F.when(F.col("rs") == 1, F.col("rnc")), ignorenulls=True
                ).over(wrun)
                + 1
            ).alias("kk"),
        )
        sel = (F.col("m") == 1) & (F.col("kk") % 2 == 1)
        staged = staged.select(
            "doc_id", "pos", "tok", "nxt", sel.cast("int").alias("sel")
        )
        t = staged.withColumn(
            "prev_sel", F.coalesce(F.lag("sel").over(w_doc), F.lit(0))
        ).filter(F.col("prev_sel") == 0).select(
            "doc_id",
            (F.row_number().over(w_doc) - 1).alias("pos"),
            F.when(F.col("sel") == 1, F.concat("tok", "nxt"))
            .otherwise(F.col("tok"))
            .alias("tok"),
        )
        if k == BPE_MERGES - 1:
            # the memoized final frame: disk-backed materialized lineage
            t = t.checkpoint(eager=True)
        else:
            # inner round: cache preserves the (doc_id) partitioning +
            # (pos) order for the next round's windows (see docstring)
            t = t.cache()
            inner_caches.append(t)
        rules.append(
            spark.createDataFrame(
                [(k + 1, l_lit, r_lit, c_lit, t.count())],
                "merge_rank long, left_tok string, right_tok string,"
                " pair_count long, tokens_after long",
            )
        )
    # the final checkpoint's count() above materialized everything the
    # consumers will read; the inner caches are now released (hygiene)
    for c in inner_caches:
        c.unpersist()
    _BPE_ROUNDS[key] = (rules, t0, t)
    return _BPE_ROUNDS[key]


@query(
    "text_bpe_train",
    oracle="""
    WITH t0 AS MATERIALIZED (
        SELECT doc_id, i AS pos, toks[i + 1] AS tok
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             unnest(range(len(toks))) u(i)
    ),
    big_0 AS MATERIALIZED (
        SELECT doc_id, pos, tok,
               lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        FROM t0
    ),
    cnt_0 AS (
        SELECT tok AS l, nxt AS r, count(*)::BIGINT AS c
        FROM big_0 WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    top1_0 AS MATERIALIZED (
        SELECT l, r, c FROM cnt_0 ORDER BY c DESC, l ASC, r ASC LIMIT 1
    ),
    m_0 AS (
        SELECT b.doc_id, b.pos,
               row_number() OVER (PARTITION BY b.doc_id ORDER BY b.pos) AS rn
        FROM big_0 b, top1_0 WHERE b.tok = top1_0.l AND b.nxt = top1_0.r
    ),
    s_0 AS MATERIALIZED (
        SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY doc_id, pos - rn ORDER BY pos) AS kk
            FROM m_0
        ) WHERE kk % 2 = 1
    ),
    t1 AS MATERIALIZED (
        SELECT b.doc_id,
               row_number() OVER (PARTITION BY b.doc_id ORDER BY b.pos) - 1 AS pos,
               CASE WHEN s1.pos IS NOT NULL THEN b.tok || b.nxt ELSE b.tok END AS tok
        FROM big_0 b
        LEFT JOIN s_0 s1 ON b.doc_id = s1.doc_id AND b.pos = s1.pos
        LEFT JOIN s_0 s2 ON b.doc_id = s2.doc_id AND b.pos = s2.pos + 1
        WHERE s2.pos IS NULL
    ),
    big_1 AS MATERIALIZED (
        SELECT doc_id, pos, tok,
               lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        FROM t1
    ),
    cnt_1 AS (
        SELECT tok AS l, nxt AS r, count(*)::BIGINT AS c
        FROM big_1 WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    top1_1 AS MATERIALIZED (
        SELECT l, r, c FROM cnt_1 ORDER BY c DESC, l ASC, r ASC LIMIT 1
    ),
    m_1 AS (
        SELECT b.doc_id, b.pos,
               row_number() OVER (PARTITION BY b.doc_id ORDER BY b.pos) AS rn
        FROM big_1 b, top1_1 WHERE b.tok = top1_1.l AND b.nxt = top1_1.r
    ),
    s_1 AS MATERIALIZED (
        SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY doc_id, pos - rn ORDER BY pos) AS kk
            FROM m_1
        ) WHERE kk % 2 = 1
    ),
    t2 AS MATERIALIZED (
        SELECT b.doc_id,
               row_number() OVER (PARTITION BY b.doc_id ORDER BY b.pos) - 1 AS pos,
               CASE WHEN s1.pos IS NOT NULL THEN b.tok || b.nxt ELSE b.tok END AS tok
        FROM big_1 b
        LEFT JOIN s_1 s1 ON b.doc_id = s1.doc_id AND b.pos = s1.pos
        LEFT JOIN s_1 s2 ON b.doc_id = s2.doc_id AND b.pos = s2.pos + 1
        WHERE s2.pos IS NULL
    ),
    big_2 AS MATERIALIZED (
        SELECT doc_id, pos, tok,
               lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        FROM t2
    ),
    cnt_2 AS (
        SELECT tok AS l, nxt AS r, count(*)::BIGINT AS c
        FROM big_2 WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    top1_2 AS MATERIALIZED (
        SELECT l, r, c FROM cnt_2 ORDER BY c DESC, l ASC, r ASC LIMIT 1
    ),
    m_2 AS (
        SELECT b.doc_id, b.pos,
               row_number() OVER (PARTITION BY b.doc_id ORDER BY b.pos) AS rn
        FROM big_2 b, top1_2 WHERE b.tok = top1_2.l AND b.nxt = top1_2.r
    ),
    s_2 AS MATERIALIZED (
        SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY doc_id, pos - rn ORDER BY pos) AS kk
            FROM m_2
        ) WHERE kk % 2 = 1
    ),
    t3 AS MATERIALIZED (
        SELECT b.doc_id,
               row_number() OVER (PARTITION BY b.doc_id ORDER BY b.pos) - 1 AS pos,
               CASE WHEN s1.pos IS NOT NULL THEN b.tok || b.nxt ELSE b.tok END AS tok
        FROM big_2 b
        LEFT JOIN s_2 s1 ON b.doc_id = s1.doc_id AND b.pos = s1.pos
        LEFT JOIN s_2 s2 ON b.doc_id = s2.doc_id AND b.pos = s2.pos + 1
        WHERE s2.pos IS NULL
    )
    SELECT 1::BIGINT AS merge_rank, l AS left_tok, r AS right_tok, c AS pair_count,
           (SELECT count(*) FROM t1)::BIGINT AS tokens_after FROM top1_0
    UNION ALL
    SELECT 2::BIGINT AS merge_rank, l AS left_tok, r AS right_tok, c AS pair_count,
           (SELECT count(*) FROM t2)::BIGINT AS tokens_after FROM top1_1
    UNION ALL
    SELECT 3::BIGINT AS merge_rank, l AS left_tok, r AS right_tok, c AS pair_count,
           (SELECT count(*) FROM t3)::BIGINT AS tokens_after FROM top1_2
""",
    tags=("llm", "text", "tokenizer"),
)
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE TRAINING as pure relational algebra — BPE_MERGES merge rounds of
    the byte-pair-encoding loop (Sennrich et al.), each round fully
    declarative: (1) bigram counts from one lead() window over the token
    frame; (2) the merge rule = argmax count with a total-order tiebreak
    (count desc, pair asc — rule 10: never an engine-default argmax);
    (3) GREEDY LEFTMOST NON-OVERLAPPING application of the rule, which
    looks inherently sequential ("a a a a" must merge positions 1 and 3,
    not 2) but is exactly gaps-and-islands: among match positions, runs
    of consecutive positions form islands (pos - row_number is the
    island key) and the greedy choice is the ODD ranks within each
    island; (4) rebuild = drop absorbed positions, concat merged pairs,
    re-rank positions for the next round's adjacency. corpus_bpe_pairs
    counts ONE round's candidates; THIS op runs the actual training
    loop and emits the vocabulary's first BPE_MERGES rules with corpus
    token counts after each merge.

    Scale shape per round: one window pass (doc-partitioned), one
    partial-agg count whose state is the bigram vocabulary, a 1-row
    broadcast rule, and one join-rebuild — all shuffles keyed by doc_id
    or bigram; the token frame is eagerly checkpointed between rounds
    (rule 24 / graph_hits' lesson: each round's frame feeds both the
    next round and its own audit count). At 100 TB this is the
    map-reduce BPE of the original paper, with the engine's monoid
    machinery doing the pair counting — the classic reason tokenizer
    training is a Spark job in production pipelines.

    Twin: the identical chain as MATERIALIZED CTEs; merged tokens are
    plain concatenations, every rank window carries a full tiebreak, so
    the rule list and token counts hash-match exactly."""
    rules, _, _ = _bpe_rounds(spark, sf_dir)
    out = rules[0]
    for r in rules[1:]:
        out = out.unionByName(r)
    return out


@query(
    "text_bpe_apply",
    oracle="""
    WITH t0 AS MATERIALIZED (
        SELECT doc_id, i AS pos, toks[i + 1] AS tok
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             unnest(range(len(toks))) u(i)
    ),
    big_0 AS MATERIALIZED (
        SELECT doc_id, pos, tok,
               lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        FROM t0
    ),
    cnt_0 AS (
        SELECT tok AS l, nxt AS r, count(*)::BIGINT AS c
        FROM big_0 WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    top1_0 AS MATERIALIZED (
        SELECT l, r, c FROM cnt_0 ORDER BY c DESC, l ASC, r ASC LIMIT 1
    ),
    m_0 AS (
        SELECT b.doc_id, b.pos,
               row_number() OVER (PARTITION BY b.doc_id ORDER BY b.pos) AS rn
        FROM big_0 b, top1_0 WHERE b.tok = top1_0.l AND b.nxt = top1_0.r
    ),
    s_0 AS MATERIALIZED (
        SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY doc_id, pos - rn ORDER BY pos) AS kk
            FROM m_0
        ) WHERE kk % 2 = 1
    ),
    t1 AS MATERIALIZED (
        SELECT b.doc_id,
               row_number() OVER (PARTITION BY b.doc_id ORDER BY b.pos) - 1 AS pos,
               CASE WHEN s1.pos IS NOT NULL THEN b.tok || b.nxt ELSE b.tok END AS tok
        FROM big_0 b
        LEFT JOIN s_0 s1 ON b.doc_id = s1.doc_id AND b.pos = s1.pos
        LEFT JOIN s_0 s2 ON b.doc_id = s2.doc_id AND b.pos = s2.pos + 1
        WHERE s2.pos IS NULL
    ),
    big_1 AS MATERIALIZED (
        SELECT doc_id, pos, tok,
               lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        FROM t1
    ),
    cnt_1 AS (
        SELECT tok AS l, nxt AS r, count(*)::BIGINT AS c
        FROM big_1 WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    top1_1 AS MATERIALIZED (
        SELECT l, r, c FROM cnt_1 ORDER BY c DESC, l ASC, r ASC LIMIT 1
    ),
    m_1 AS (
        SELECT b.doc_id, b.pos,
               row_number() OVER (PARTITION BY b.doc_id ORDER BY b.pos) AS rn
        FROM big_1 b, top1_1 WHERE b.tok = top1_1.l AND b.nxt = top1_1.r
    ),
    s_1 AS MATERIALIZED (
        SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY doc_id, pos - rn ORDER BY pos) AS kk
            FROM m_1
        ) WHERE kk % 2 = 1
    ),
    t2 AS MATERIALIZED (
        SELECT b.doc_id,
               row_number() OVER (PARTITION BY b.doc_id ORDER BY b.pos) - 1 AS pos,
               CASE WHEN s1.pos IS NOT NULL THEN b.tok || b.nxt ELSE b.tok END AS tok
        FROM big_1 b
        LEFT JOIN s_1 s1 ON b.doc_id = s1.doc_id AND b.pos = s1.pos
        LEFT JOIN s_1 s2 ON b.doc_id = s2.doc_id AND b.pos = s2.pos + 1
        WHERE s2.pos IS NULL
    ),
    big_2 AS MATERIALIZED (
        SELECT doc_id, pos, tok,
               lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        FROM t2
    ),
    cnt_2 AS (
        SELECT tok AS l, nxt AS r, count(*)::BIGINT AS c
        FROM big_2 WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    top1_2 AS MATERIALIZED (
        SELECT l, r, c FROM cnt_2 ORDER BY c DESC, l ASC, r ASC LIMIT 1
    ),
    m_2 AS (
        SELECT b.doc_id, b.pos,
               row_number() OVER (PARTITION BY b.doc_id ORDER BY b.pos) AS rn
        FROM big_2 b, top1_2 WHERE b.tok = top1_2.l AND b.nxt = top1_2.r
    ),
    s_2 AS MATERIALIZED (
        SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY doc_id, pos - rn ORDER BY pos) AS kk
            FROM m_2
        ) WHERE kk % 2 = 1
    ),
    t3 AS MATERIALIZED (
        SELECT b.doc_id,
               row_number() OVER (PARTITION BY b.doc_id ORDER BY b.pos) - 1 AS pos,
               CASE WHEN s1.pos IS NOT NULL THEN b.tok || b.nxt ELSE b.tok END AS tok
        FROM big_2 b
        LEFT JOIN s_2 s1 ON b.doc_id = s1.doc_id AND b.pos = s1.pos
        LEFT JOIN s_2 s2 ON b.doc_id = s2.doc_id AND b.pos = s2.pos + 1
        WHERE s2.pos IS NULL
    ),
    before AS (SELECT doc_id, count(*)::BIGINT AS tokens_before FROM t0 GROUP BY doc_id),
    after AS (SELECT doc_id, count(*)::BIGINT AS tokens_after FROM t3 GROUP BY doc_id)
    SELECT b.doc_id, b.tokens_before, a.tokens_after,
           ((b.tokens_before - a.tokens_after) * 1000000 // b.tokens_before)::BIGINT
               AS compression_ppm
    FROM before b JOIN after a ON b.doc_id = a.doc_id
""",
    tags=("llm", "text", "tokenizer"),
)
def text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TOKENIZED CORPUS — text_bpe_train's other output: after the
    BPE_MERGES learned merges are applied (same shared round machinery,
    same greedy-leftmost semantics), every document reports its token
    count before and after plus the compression in integer ppm — the
    per-document ledger that decides whether a vocabulary is paying for
    itself on each source, and the input corpus_pack_sequences would
    consume in a real pipeline (fewer tokens per doc = more docs per
    packed sequence). Same cost model as training: the apply pass IS the
    training pass's rebuild chain, one window + one join-rebuild per
    rule, frames checkpointed between rounds."""
    _, t0, t_final = _bpe_rounds(spark, sf_dir)
    before = t0.groupBy("doc_id").agg(F.count(F.lit(1)).alias("tokens_before"))
    after = t_final.groupBy("doc_id").agg(F.count(F.lit(1)).alias("tokens_after"))
    return (
        before.join(after, "doc_id")
        .select(
            "doc_id",
            "tokens_before",
            "tokens_after",
            F.expr(
                "(tokens_before - tokens_after) * 1000000 div tokens_before"
            ).alias("compression_ppm"),
        )
    )


# --- round 9: maximal repeated-substring runs (suffix-array-grade) -----------

RUN_K = SPAN_W  # gram width; = SPAN_W so the superset-of-span-dedup property
                # is provable at the same width (tests/test_round9_properties)


@query(
    "text_substring_dedup",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    grams AS (
        SELECT doc_id, p,
               md5(array_to_string(ts[p + 1 : p + {RUN_K}], ' ')) AS gh
        FROM (
            SELECT doc_id, ts, unnest(range(len(ts) - {RUN_K} + 1)) AS p
            FROM toks WHERE len(ts) >= {RUN_K}
        )
    ),
    counted AS (
        SELECT doc_id, p, count(*) OVER (PARTITION BY gh) AS c FROM grams
    ),
    dup AS (
        SELECT doc_id, p,
               p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS isl
        FROM counted WHERE c >= 2
    ),
    runs AS (
        SELECT doc_id, min(p)::BIGINT AS run_start,
               count(*)::BIGINT AS n_grams,
               (count(*) + {RUN_K} - 1)::BIGINT AS span_tokens
        FROM dup GROUP BY doc_id, isl
    ),
    fingered AS (
        SELECT r.doc_id, r.run_start, r.n_grams, r.span_tokens,
               md5(array_to_string(
                   t.ts[r.run_start + 1 : r.run_start + r.span_tokens], ' '
               )) AS fp
        FROM runs r JOIN toks t ON r.doc_id = t.doc_id
    )
    SELECT doc_id, run_start, n_grams, span_tokens, fp,
           (row_number() OVER (PARTITION BY fp ORDER BY doc_id, run_start) = 1)
               AS keep
    FROM fingered
    """,
    tags=("llm", "text", "dedup"),
)
def text_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal repeated-substring runs — the bounded, relational cut of
    suffix-array exact-substring dedup (the Lee et al. 'Deduplicating
    Training Data' ExactSubstr pass; VERDICT r8 item 6): where
    text_span_dedup removes duplicated FIXED-ALIGNED SPAN_W-token spans,
    this op finds every MAXIMAL contiguous run of positions whose RUN_K-
    token gram recurs anywhere in the corpus (any alignment, either doc) —
    and any repeated substring of >= RUN_K tokens has all its grams
    repeated, so every true exact repeat lies inside a reported run: the
    runs are the provable deletion superset of both span_dedup's removals
    (property-pinned at the same width) and the true suffix-array repeats,
    at O(N) grams instead of suffix-array construction. Honest bound
    stated: a run certifies each of its grams recurs somewhere, not that
    the whole covering span recurs as one unit — the standard gram-run
    over-approximation, priced by the fp keep-first pass below.

    Mechanism: per-position grams by array slice (map-side explode, the
    text_span_dedup shape), corpus-wide recurrence via one count window on
    md5(gram) (16-byte shuffle key), maximal runs via gaps-and-islands
    (p - row_number, the text_bpe_train discipline), covering-text
    fingerprints by doc_id join-back, and keep-first over identical run
    text (rn = 1 keeps the corpus-first occurrence; later identical runs
    are the removable boilerplate). span_tokens = n_grams + RUN_K - 1 is
    the removable region width a C4-style cleaner would strip.

    Scale shape: grams never carry text past the hash (md5 before any
    shuffle); the count window and islands ride (gh) then (doc_id)
    exchanges; the join-back is doc_id-keyed against the already-scanned
    corpus. All integer/hash columns out (rule 25 not needed — no
    ratios)."""
    return substring_dedup_frame(load(spark, sf_dir, "documents"))


def substring_dedup_frame(d: DataFrame) -> DataFrame:
    """The repeated-run pipeline on any documents-shaped frame (split out so
    golden tests can run it on inline micro-corpora with known repeats)."""
    toks = d.select("doc_id", F.split("text", " ").alias("ts"))
    grams = (
        toks.filter(F.size("ts") >= RUN_K)
        .select(
            "doc_id",
            "ts",
            F.explode(F.expr(f"sequence(0, size(ts) - {RUN_K})")).alias("p"),
        )
        .select(
            "doc_id",
            "p",
            F.md5(F.array_join(F.slice("ts", F.col("p") + 1, RUN_K), " ")).alias("gh"),
        )
    )
    counted = grams.withColumn("c", F.count(F.lit(1)).over(Window.partitionBy("gh")))
    dup = counted.filter(F.col("c") >= 2).select(
        "doc_id",
        "p",
        (
            F.col("p")
            - F.row_number().over(Window.partitionBy("doc_id").orderBy("p"))
        ).alias("isl"),
    )
    runs = dup.groupBy("doc_id", "isl").agg(
        F.min("p").alias("run_start"),
        F.count(F.lit(1)).alias("n_grams"),
        (F.count(F.lit(1)) + F.lit(RUN_K) - 1).alias("span_tokens"),
    )
    fingered = runs.join(toks, "doc_id").select(
        "doc_id",
        "run_start",
        "n_grams",
        "span_tokens",
        F.md5(
            F.array_join(
                F.slice("ts", F.col("run_start") + 1, F.col("span_tokens")), " "
            )
        ).alias("fp"),
    )
    return fingered.select(
        "doc_id",
        "run_start",
        "n_grams",
        "span_tokens",
        "fp",
        (
            F.row_number().over(Window.partitionBy("fp").orderBy("doc_id", "run_start"))
            == 1
        ).alias("keep"),
    )


# --- round 9: per-language tokenizer fertility ------------------------------

# The shared BPE round chain (t0 .. t3), identical to the text_bpe_train /
# text_bpe_apply oracles' CTE prefix; kept as one constant so new consumers
# cannot drift from the trained rounds.
_BPE_CHAIN_SQL = """WITH t0 AS MATERIALIZED (
        SELECT doc_id, i AS pos, toks[i + 1] AS tok
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             unnest(range(len(toks))) u(i)
    ),
    big_0 AS MATERIALIZED (
        SELECT doc_id, pos, tok,
               lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        FROM t0
    ),
    cnt_0 AS (
        SELECT tok AS l, nxt AS r, count(*)::BIGINT AS c
        FROM big_0 WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    top1_0 AS MATERIALIZED (
        SELECT l, r, c FROM cnt_0 ORDER BY c DESC, l ASC, r ASC LIMIT 1
    ),
    m_0 AS (
        SELECT b.doc_id, b.pos,
               row_number() OVER (PARTITION BY b.doc_id ORDER BY b.pos) AS rn
        FROM big_0 b, top1_0 WHERE b.tok = top1_0.l AND b.nxt = top1_0.r
    ),
    s_0 AS MATERIALIZED (
        SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY doc_id, pos - rn ORDER BY pos) AS kk
            FROM m_0
        ) WHERE kk % 2 = 1
    ),
    t1 AS MATERIALIZED (
        SELECT b.doc_id,
               row_number() OVER (PARTITION BY b.doc_id ORDER BY b.pos) - 1 AS pos,
               CASE WHEN s1.pos IS NOT NULL THEN b.tok || b.nxt ELSE b.tok END AS tok
        FROM big_0 b
        LEFT JOIN s_0 s1 ON b.doc_id = s1.doc_id AND b.pos = s1.pos
        LEFT JOIN s_0 s2 ON b.doc_id = s2.doc_id AND b.pos = s2.pos + 1
        WHERE s2.pos IS NULL
    ),
    big_1 AS MATERIALIZED (
        SELECT doc_id, pos, tok,
               lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        FROM t1
    ),
    cnt_1 AS (
        SELECT tok AS l, nxt AS r, count(*)::BIGINT AS c
        FROM big_1 WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    top1_1 AS MATERIALIZED (
        SELECT l, r, c FROM cnt_1 ORDER BY c DESC, l ASC, r ASC LIMIT 1
    ),
    m_1 AS (
        SELECT b.doc_id, b.pos,
               row_number() OVER (PARTITION BY b.doc_id ORDER BY b.pos) AS rn
        FROM big_1 b, top1_1 WHERE b.tok = top1_1.l AND b.nxt = top1_1.r
    ),
    s_1 AS MATERIALIZED (
        SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY doc_id, pos - rn ORDER BY pos) AS kk
            FROM m_1
        ) WHERE kk % 2 = 1
    ),
    t2 AS MATERIALIZED (
        SELECT b.doc_id,
               row_number() OVER (PARTITION BY b.doc_id ORDER BY b.pos) - 1 AS pos,
               CASE WHEN s1.pos IS NOT NULL THEN b.tok || b.nxt ELSE b.tok END AS tok
        FROM big_1 b
        LEFT JOIN s_1 s1 ON b.doc_id = s1.doc_id AND b.pos = s1.pos
        LEFT JOIN s_1 s2 ON b.doc_id = s2.doc_id AND b.pos = s2.pos + 1
        WHERE s2.pos IS NULL
    ),
    big_2 AS MATERIALIZED (
        SELECT doc_id, pos, tok,
               lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        FROM t2
    ),
    cnt_2 AS (
        SELECT tok AS l, nxt AS r, count(*)::BIGINT AS c
        FROM big_2 WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    top1_2 AS MATERIALIZED (
        SELECT l, r, c FROM cnt_2 ORDER BY c DESC, l ASC, r ASC LIMIT 1
    ),
    m_2 AS (
        SELECT b.doc_id, b.pos,
               row_number() OVER (PARTITION BY b.doc_id ORDER BY b.pos) AS rn
        FROM big_2 b, top1_2 WHERE b.tok = top1_2.l AND b.nxt = top1_2.r
    ),
    s_2 AS MATERIALIZED (
        SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY doc_id, pos - rn ORDER BY pos) AS kk
            FROM m_2
        ) WHERE kk % 2 = 1
    ),
    t3 AS MATERIALIZED (
        SELECT b.doc_id,
               row_number() OVER (PARTITION BY b.doc_id ORDER BY b.pos) - 1 AS pos,
               CASE WHEN s1.pos IS NOT NULL THEN b.tok || b.nxt ELSE b.tok END AS tok
        FROM big_2 b
        LEFT JOIN s_2 s1 ON b.doc_id = s1.doc_id AND b.pos = s1.pos
        LEFT JOIN s_2 s2 ON b.doc_id = s2.doc_id AND b.pos = s2.pos + 1
        WHERE s2.pos IS NULL
    )"""


@query(
    "corpus_bpe_fertility",
    oracle=_BPE_CHAIN_SQL + """,
    after AS (SELECT doc_id, count(*)::BIGINT AS toks FROM t3 GROUP BY doc_id),
    words AS (
        SELECT doc_id, lang,
               len(string_split(text, ' '))::BIGINT AS words,
               length(text)::BIGINT AS chars
        FROM documents
    )
    SELECT w.lang,
           count(*)::BIGINT AS n_docs,
           sum(w.words)::BIGINT AS words,
           sum(w.chars)::BIGINT AS chars,
           sum(a.toks)::BIGINT AS tokens,
           (sum(a.toks) * 1000000 // sum(w.words))::BIGINT
               AS tokens_per_word_ppm,
           (sum(a.toks) * 1000000 // sum(w.chars))::BIGINT
               AS tokens_per_char_ppm
    FROM words w JOIN after a ON w.doc_id = a.doc_id
    GROUP BY w.lang
""",
    tags=("llm", "corpus", "tokenizer"),
)
def corpus_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer FERTILITY — the vocabulary-equity readout
    every multilingual-tokenizer paper reports (tokens per word / per
    character by language): languages the vocabulary under-serves pay
    more tokens for the same text, which at training time means less
    effective context and higher cost per document — the governance
    number that decides whether the merge table needs rebalancing before
    a 100 TB tokenization run. Consumes the SAME trained rounds as
    text_bpe_train/apply via the _bpe_rounds session memo (one training
    chain per session, ADVICE r8 item 3), so the fertility table can
    never disagree with the tokenizer that produced it; the oracle
    shares the identical CTE chain via _BPE_CHAIN_SQL for the same
    reason.

    Scale shape: the apply pass is already paid (memo); this adds one
    doc-keyed count, one join to the corpus metadata, and a |langs|-row
    rollup. Integer ppm ratios (rule 25)."""
    _, _, t_final = _bpe_rounds(spark, sf_dir)
    after = t_final.groupBy("doc_id").agg(F.count(F.lit(1)).alias("toks"))
    words = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("words"),
        F.length("text").cast("long").alias("chars"),
    )
    return (
        words.join(after, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("words").alias("words"),
            F.sum("chars").alias("chars"),
            F.sum("toks").alias("tokens"),
            F.expr("sum(toks) * 1000000 div sum(words)").alias("tokens_per_word_ppm"),
            F.expr("sum(toks) * 1000000 div sum(chars)").alias("tokens_per_char_ppm"),
        )
    )


@query(
    "corpus_substring_scrub",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    grams AS (
        SELECT doc_id, p,
               md5(array_to_string(ts[p + 1 : p + {RUN_K}], ' ')) AS gh
        FROM (
            SELECT doc_id, ts, unnest(range(len(ts) - {RUN_K} + 1)) AS p
            FROM toks WHERE len(ts) >= {RUN_K}
        )
    ),
    counted AS (
        SELECT doc_id, p, count(*) OVER (PARTITION BY gh) AS c FROM grams
    ),
    dup AS (
        SELECT doc_id, p,
               p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS isl
        FROM counted WHERE c >= 2
    ),
    runs AS (
        SELECT doc_id, min(p)::BIGINT AS run_start,
               count(*)::BIGINT AS n_grams,
               (count(*) + {RUN_K} - 1)::BIGINT AS span_tokens
        FROM dup GROUP BY doc_id, isl
    ),
    fingered AS (
        SELECT r.doc_id, r.run_start, r.span_tokens,
               md5(array_to_string(
                   t.ts[r.run_start + 1 : r.run_start + r.span_tokens], ' '
               )) AS fp
        FROM runs r JOIN toks t ON r.doc_id = t.doc_id
    ),
    removal AS (
        SELECT DISTINCT doc_id, run_start + o AS p
        FROM (
            SELECT doc_id, run_start, span_tokens,
                   row_number() OVER (PARTITION BY fp
                                      ORDER BY doc_id, run_start) AS rn
            FROM fingered
        ) z, unnest(generate_series(0, span_tokens - 1)) g(o)
        WHERE rn > 1
    ),
    alltok AS (
        SELECT doc_id, i AS p, ts[i + 1] AS tok
        FROM toks, unnest(range(len(ts))) u(i)
    ),
    kept AS (
        SELECT a.doc_id, a.p, a.tok
        FROM alltok a LEFT JOIN removal r
          ON a.doc_id = r.doc_id AND a.p = r.p
        WHERE r.p IS NULL
    )
    SELECT t.doc_id,
           len(t.ts)::BIGINT AS n_tokens,
           (len(t.ts) - count(k.p))::BIGINT AS n_removed,
           coalesce(string_agg(k.tok, ' ' ORDER BY k.p), '') AS scrubbed_text
    FROM toks t LEFT JOIN kept k ON t.doc_id = k.doc_id
    GROUP BY t.doc_id, len(t.ts)
    """,
    tags=("llm", "text", "dedup"),
)
def corpus_substring_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4-style boilerplate SCRUB that consumes text_substring_dedup's
    ledger: every corpus-later repeated run (keep = false — the first
    occurrence stays, Lee et al.'s ExactSubstr deletion rule) is removed
    token-for-token and the surviving tokens are reassembled in order.
    Runs' TOKEN coverages can overlap by up to RUN_K-1 even though their
    gram ranges are disjoint, so removal is the UNION of covered
    positions (explode each removal run to its positions, distinct, one
    anti-join) — never an interval-arithmetic special case. Documents
    with no repeated runs pass through byte-identical; a fully-duplicated
    later twin scrubs to the empty string.

    Scale shape: the run ledger is the flagship's plan (one gram-hash
    count window); removal positions explode to at most the corpus token
    count; the kept-token reassembly is text_span_dedup's sort-collect on
    doc_id. All shuffles key on doc_id or the 16-byte gram hash."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("ts"))
    runs = substring_dedup_frame(d)
    removal = (
        runs.filter(~F.col("keep"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.col("run_start"),
                    F.col("run_start") + F.col("span_tokens") - 1,
                )
            ).alias("p"),
        )
        .distinct()
    )
    alltok = toks.select(
        "doc_id",
        F.posexplode("ts").alias("p", "tok"),
    )
    kept = alltok.join(removal, ["doc_id", "p"], "left_anti")
    kept_struct = F.struct("p", "tok")
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept_struct)), lambda x: x.tok),
            " ",
        ).alias("scrubbed_text"),
    )
    return (
        toks.select("doc_id", F.size("ts").cast("long").alias("n_tokens"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
                "n_removed"
            ),
            F.coalesce(F.col("scrubbed_text"), F.lit("")).alias("scrubbed_text"),
        )
    )


# --- round 9: ER blocking quality gate ---------------------------------------


@query(
    "eval_er_quality",
    # compose the full linkage oracle as a nested CTE so the gate can never
    # drift from the op it audits (the _BPE_CHAIN_SQL discipline)
    oracle=f"""
    WITH pairs AS ({{er_oracle}}),
    variants AS (
        SELECT c_custkey + {ER_VARIANT_BASE} AS rec_id
        FROM customer WHERE c_custkey % 3 = 0
    )
    SELECT
        (SELECT count(*) FROM variants)::BIGINT AS n_variants,
        count(*)::BIGINT AS n_pairs,
        sum(CASE WHEN true_match THEN 1 ELSE 0 END)::BIGINT AS n_true,
        count(DISTINCT CASE WHEN true_match THEN id_b END)::BIGINT
            AS n_recovered,
        (count(DISTINCT CASE WHEN true_match THEN id_b END) * 1000000
            // (SELECT count(*) FROM variants))::BIGINT AS recall_ppm,
        (sum(CASE WHEN true_match THEN 1 ELSE 0 END) * 1000000
            // count(*))::BIGINT AS precision_ppm
    FROM pairs
    """.format(er_oracle=REGISTRY["er_record_linkage"].oracle),
    tags=("llm", "linkage", "eval"),
)
def eval_er_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BLOCKING-QUALITY GATE for the entity-resolution family — what
    eval_lsh_candidate_quality is to the LSH dedup path, this is to
    deletion-neighborhood linkage: pairs completeness (RECALL — the
    fraction of injected dirty re-entries whose true base survived
    blocking + verify; a blocking scheme that silently drops true pairs
    is the classic undetected ER failure) and match PRECISION (deletion
    COLLISIONS — distinct bases whose neighborhoods overlap — surface
    as false pairs). One audit row, integer ppm (rule 25). The oracle
    embeds er_record_linkage's ENTIRE oracle as a nested CTE, so gate
    and op are definitionally in lockstep; the Spark side consumes the
    op's own frame for the same reason.

    At 100 TB this gate is what licenses the linkage output for
    downstream merges: recall below target means the error model or
    window is wrong (the two measured round-8 blocking lessons live in
    the op's docstring); precision below target means the verify rule
    needs tightening — and both are one cheap aggregate over the pair
    ledger the run already produced."""
    pairs = er_record_linkage(spark, sf_dir)
    n_variants = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 3 == 0)
        .agg(F.count(F.lit(1)).alias("n_variants"))
    )
    return pairs.crossJoin(F.broadcast(n_variants)).agg(
        F.max("n_variants").alias("n_variants"),
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("true_match"), 1).otherwise(0)).alias("n_true"),
        F.countDistinct(
            F.when(F.col("true_match"), F.col("id_b"))
        ).alias("n_recovered"),
        F.expr(
            "count(DISTINCT CASE WHEN true_match THEN id_b END) * 1000000"
            " div max(n_variants)"
        ).alias("recall_ppm"),
        F.expr(
            "sum(CASE WHEN true_match THEN 1 ELSE 0 END) * 1000000 div count(*)"
        ).alias("precision_ppm"),
    )


@query(
    "privacy_generalize",
    oracle=f"""
    WITH quasi AS (
        SELECT doc_id, source, lang,
               CASE WHEN n_chars < 200 THEN 'short'
                    WHEN n_chars < 800 THEN 'medium'
                    ELSE 'long' END AS size_band
        FROM documents
    ),
    g0 AS (
        SELECT source, lang, size_band, count(*)::BIGINT AS n
        FROM quasi GROUP BY 1, 2, 3
    ),
    g1 AS (SELECT source, lang, count(*)::BIGINT AS n FROM quasi GROUP BY 1, 2),
    g2 AS (SELECT source, count(*)::BIGINT AS n FROM quasi GROUP BY 1),
    assigned AS (
        SELECT q.doc_id,
               CASE WHEN g0.n >= {K_ANON_K} THEN 0
                    WHEN g1.n >= {K_ANON_K} THEN 1
                    WHEN g2.n >= {K_ANON_K} THEN 2
                    ELSE 3 END AS level
        FROM quasi q
        JOIN g0 ON q.source = g0.source AND q.lang = g0.lang
               AND q.size_band = g0.size_band
        JOIN g1 ON q.source = g1.source AND q.lang = g1.lang
        JOIN g2 ON q.source = g2.source
    )
    SELECT level::BIGINT AS level,
           count(*)::BIGINT AS n_docs,
           (count(*) * 1000000 // (SELECT count(*) FROM quasi))::BIGINT
               AS share_ppm
    FROM assigned GROUP BY level
    """,
    tags=("llm", "privacy", "audit"),
)
def privacy_generalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimal-generalization REPAIR for k-anonymity violations — the step
    privacy_k_anonymity's audit hands its red rows to: each record is
    assigned the FIRST rung of a fixed generalization ladder at which its
    quasi-identifier group reaches K_ANON_K — level 0 = (source, lang,
    size_band) as published, 1 = drop the size band, 2 = source only,
    3 = fully suppressed. Per-record minimal generalization (the
    Mondrian/Datafly idea as a join, not a loop): group sizes at every
    rung come from three partial aggs over ONE corpus scan, the record
    picks its rung with a CASE — no iteration, because the ladder is
    monotone (coarser rung ⇒ larger group, so the first satisfying rung
    is the minimum). Output is the utility ledger a release decision
    reads: how many records publish at each rung and the share (integer
    ppm) — mass at high rungs means the quasi-identifier policy destroys
    utility and the bands need redesign.

    Scale: three partial aggs (each state |distinct tuples|, tiny) + two
    broadcast-sized dimension joins back to the corpus + one 4-row
    rollup. One scan at 100 TB."""
    docs = load(spark, sf_dir, "documents")
    size_band = (
        F.when(F.col("n_chars") < 200, "short")
        .when(F.col("n_chars") < 800, "medium")
        .otherwise("long")
    )
    quasi = docs.select(
        "doc_id", "source", "lang", size_band.alias("size_band")
    )
    g0 = quasi.groupBy("source", "lang", "size_band").agg(
        F.count(F.lit(1)).alias("n0")
    )
    g1 = quasi.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n1"))
    g2 = quasi.groupBy("source").agg(F.count(F.lit(1)).alias("n2"))
    total = quasi.agg(F.count(F.lit(1)).alias("total"))
    level = (
        F.when(F.col("n0") >= K_ANON_K, 0)
        .when(F.col("n1") >= K_ANON_K, 1)
        .when(F.col("n2") >= K_ANON_K, 2)
        .otherwise(3)
    )
    assigned = (
        quasi.join(F.broadcast(g0), ["source", "lang", "size_band"])
        .join(F.broadcast(g1), ["source", "lang"])
        .join(F.broadcast(g2), ["source"])
        .select(level.cast("long").alias("level"))
    )
    return (
        assigned.groupBy("level")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(F.broadcast(total))
        .select(
            "level",
            "n_docs",
            F.expr("n_docs * 1000000 div total").alias("share_ppm"),
        )
    )


@query(
    "corpus_dataset_diff",
    oracle="""
    WITH snap AS (
        SELECT doc_id % 2 AS s,
               len(string_split(text, ' '))::BIGINT AS toks,
               md5(text) AS h, lang
        FROM documents
    ),
    card AS (
        SELECT s,
               count(*)::BIGINT AS n_docs,
               sum(toks)::BIGINT AS n_tokens,
               (sum(toks) * 1000000 // count(*))::BIGINT AS mean_tokens_ppm,
               ((count(*) - count(DISTINCT h)) * 1000000 // count(*))::BIGINT
                   AS dup_ppm,
               count(DISTINCT lang)::BIGINT AS n_langs
        FROM snap GROUP BY s
    ),
    metrics AS (
        SELECT 'n_docs' AS metric, 1 AS ord,
               max(CASE WHEN s = 0 THEN n_docs END)::BIGINT AS v_old,
               max(CASE WHEN s = 1 THEN n_docs END)::BIGINT AS v_new
        FROM card
        UNION ALL
        SELECT 'n_tokens', 2, max(CASE WHEN s = 0 THEN n_tokens END),
               max(CASE WHEN s = 1 THEN n_tokens END) FROM card
        UNION ALL
        SELECT 'mean_tokens_ppm', 3,
               max(CASE WHEN s = 0 THEN mean_tokens_ppm END),
               max(CASE WHEN s = 1 THEN mean_tokens_ppm END) FROM card
        UNION ALL
        SELECT 'dup_ppm', 4, max(CASE WHEN s = 0 THEN dup_ppm END),
               max(CASE WHEN s = 1 THEN dup_ppm END) FROM card
        UNION ALL
        SELECT 'n_langs', 5, max(CASE WHEN s = 0 THEN n_langs END),
               max(CASE WHEN s = 1 THEN n_langs END) FROM card
    )
    SELECT metric, v_old, v_new, (v_new - v_old)::BIGINT AS delta,
           CASE WHEN v_old = 0 THEN NULL
                ELSE ((v_new - v_old) * 1000000 // v_old) END::BIGINT
               AS delta_ppm
    FROM metrics
    """,
    tags=("llm", "corpus", "release"),
)
def corpus_dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-to-release DATASET DIFF — corpus_dataset_card compares a
    release against nothing; this compares two (the doc_id parity halves
    stand in for release N and N+1) and emits the metric-by-metric delta
    table a data-governance review reads before sign-off: document and
    token counts, mean document length, exact-duplicate rate, and
    language coverage, each with absolute and relative (integer-ppm)
    drift. A release whose dup_ppm JUMPED means the dedup stage
    regressed; a mean-length collapse means a filter got too aggressive
    — the two incidents this table exists to catch before training does.

    All metrics are exact integers (counts, floor-division ratios); the
    UNION-of-metrics shape keeps one row per metric so downstream
    thresholds are a WHERE clause, not column surgery. Two scans' worth
    of aggregate state (per-half counts + distinct hashes), free at
    100 TB next to the jobs that produced the releases."""
    d = load(spark, sf_dir, "documents")
    snap = d.select(
        (F.col("doc_id") % 2).alias("s"),
        F.size(F.split("text", " ")).cast("long").alias("toks"),
        F.md5("text").alias("h"),
        "lang",
    )
    card = snap.groupBy("s").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").alias("n_tokens"),
        F.expr("sum(toks) * 1000000 div count(*)").alias("mean_tokens_ppm"),
        F.expr(
            "(count(*) - count(DISTINCT h)) * 1000000 div count(*)"
        ).alias("dup_ppm"),
        F.countDistinct("lang").alias("n_langs"),
    )
    pick = lambda col, s: F.max(F.when(F.col("s") == s, F.col(col)))  # noqa: E731
    wide = card.agg(
        *[
            pick(c, s).alias(f"{c}_{s}")
            for c in ("n_docs", "n_tokens", "mean_tokens_ppm", "dup_ppm", "n_langs")
            for s in (0, 1)
        ]
    )
    metrics = None
    for i, c in enumerate(
        ("n_docs", "n_tokens", "mean_tokens_ppm", "dup_ppm", "n_langs"), start=1
    ):
        row = wide.select(
            F.lit(c).alias("metric"),
            F.col(f"{c}_0").cast("long").alias("v_old"),
            F.col(f"{c}_1").cast("long").alias("v_new"),
        )
        metrics = row if metrics is None else metrics.unionByName(row)
    return metrics.select(
        "metric",
        "v_old",
        "v_new",
        (F.col("v_new") - F.col("v_old")).alias("delta"),
        F.expr(
            "CASE WHEN v_old = 0 THEN NULL"
            " ELSE (v_new - v_old) * 1000000 div v_old END"
        ).alias("delta_ppm"),
    )


SEQLEN_GRID = (128, 256, 512, 1024)  # candidate packing lengths


@query(
    "corpus_seqlen_sweep",
    oracle=f"""
    WITH docs AS (
        SELECT len(string_split(text, ' '))::BIGINT AS toks FROM documents
    ),
    grid AS (SELECT unnest(ARRAY{list(SEQLEN_GRID)}) AS seq_len)
    SELECT seq_len::BIGINT AS seq_len,
           count(*)::BIGINT AS n_docs,
           sum(toks)::BIGINT AS n_tokens,
           sum((toks + seq_len - 1) // seq_len)::BIGINT AS n_seqs_unpacked,
           ((sum(toks) + seq_len - 1) // seq_len)::BIGINT AS n_seqs_packed,
           (sum((toks + seq_len - 1) // seq_len) * seq_len - sum(toks))
               ::BIGINT AS pad_tokens_unpacked,
           ((sum((toks + seq_len - 1) // seq_len) * seq_len - sum(toks))
               * 1000000
               // (sum((toks + seq_len - 1) // seq_len) * seq_len))::BIGINT
               AS pad_ppm_unpacked,
           (((sum(toks) + seq_len - 1) // seq_len) * seq_len - sum(toks))
               ::BIGINT AS pad_tokens_packed
    FROM docs CROSS JOIN grid
    GROUP BY seq_len
    """,
    tags=("llm", "corpus", "packing"),
)
def corpus_seqlen_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length PLANNING SWEEP — the table that decides a training
    run's seq_len before corpus_pack_sequences commits to one: for each
    candidate length, the corpus's cost under the two packing regimes —
    UNPACKED (one-doc-per-sequence, each doc ceil-divided and padded: the
    SFT default) vs fully PACKED (concat-and-chop: the pretraining
    default, waste only in the final chop) — with exact pad-token ledgers
    and integer-ppm waste. The spread between the two columns at each
    length IS the money packing saves; the length where unpacked waste
    crosses a budget threshold is the decision this table exists to read
    off. Complements corpus_length_buckets (fixed power-of-two capacity
    audit) by sweeping the knob instead of auditing one setting.

    All integer ceil-division arithmetic (rule 25); one corpus rollup
    cross-joined with the 4-row literal grid (broadcast), partial-agg
    state = |grid| rows. Free at 100 TB."""
    d = load(spark, sf_dir, "documents")
    docs = d.select(F.size(F.split("text", " ")).cast("long").alias("toks"))
    grid = spark.createDataFrame([(s,) for s in SEQLEN_GRID], "seq_len long")
    return (
        docs.crossJoin(F.broadcast(grid))
        .groupBy("seq_len")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").alias("n_tokens"),
            F.sum(F.expr("(toks + seq_len - 1) div seq_len")).alias(
                "n_seqs_unpacked"
            ),
            F.expr("(sum(toks) + max(seq_len) - 1) div max(seq_len)").alias(
                "n_seqs_packed"
            ),
            F.expr(
                "sum((toks + seq_len - 1) div seq_len) * max(seq_len) - sum(toks)"
            ).alias("pad_tokens_unpacked"),
            F.expr(
                "(sum((toks + seq_len - 1) div seq_len) * max(seq_len) - sum(toks))"
                " * 1000000 div (sum((toks + seq_len - 1) div seq_len) * max(seq_len))"
            ).alias("pad_ppm_unpacked"),
            F.expr(
                "((sum(toks) + max(seq_len) - 1) div max(seq_len)) * max(seq_len)"
                " - sum(toks)"
            ).alias("pad_tokens_packed"),
        )
    )


@query(
    "text_entropy_rate",
    oracle="""
    WITH toks AS (
        SELECT d.lang, t.i AS pos, t.tok,
               lead(t.tok) OVER (PARTITION BY d.doc_id ORDER BY t.i) AS nxt
        FROM documents d,
             LATERAL (
                 SELECT i, ts[i + 1] AS tok
                 FROM (SELECT string_split(d.text, ' ') AS ts),
                      unnest(range(len(ts))) u(i)
             ) t
    ),
    bigrams AS (
        SELECT lang, tok, nxt, count(*)::BIGINT AS c
        FROM toks WHERE nxt IS NOT NULL GROUP BY 1, 2, 3
    ),
    ctx AS (
        SELECT lang, tok, sum(c)::BIGINT AS c_ctx FROM bigrams GROUP BY 1, 2
    ),
    tot AS (SELECT lang, sum(c)::BIGINT AS n FROM bigrams GROUP BY lang)
    SELECT b.lang,
           max(t.n)::BIGINT AS n_bigrams,
           count(*)::BIGINT AS n_distinct_bigrams,
           round(-sum((cast(b.c as double) / t.n)
                      * ln(cast(b.c as double) / x.c_ctx)), 6) + 0.0
               AS entropy_rate_nats,
           round(-sum((cast(b.c as double) / t.n)
                      * ln(cast(b.c as double) / t.n)), 6) + 0.0
               AS bigram_entropy_nats
    FROM bigrams b
    JOIN ctx x ON b.lang = x.lang AND b.tok = x.tok
    JOIN tot t ON b.lang = t.lang
    GROUP BY b.lang
    """,
    tags=("llm", "text", "quality"),
)
def text_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language ENTROPY RATE — the conditional bigram entropy
    H(next | current) = −Σ p(cur,next)·ln p(next|cur), the information-
    theoretic predictability of the corpus (Shannon's estimate, order 1):
    low entropy rate means repetitive/template text (boilerplate detectors
    threshold exactly this), high means diverse prose — the quality axis
    text_repetition approaches from per-doc counts, measured here
    corpus-wide per language, next to the joint bigram entropy H(cur,next)
    for reference (their difference is the unigram context entropy, a
    consistency a reviewer can check by eye).

    Float discipline: all probabilities are ratios of exact BIGINT bigram
    counts; the ln/multiply tree is shared verbatim and the SUM is ordered
    by the aggregate (sum of thousands of distinct f64 terms — rounded
    6dp, rule 8; the sum-order risk is the same class as every entropy op
    already green since r3's agg_entropy). Shape: one lead() window per
    doc, one bigram partial agg per lang (state = bigram vocabulary), two
    lang-keyed joins of tiny aggregates back onto it."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "lang", "doc_id", F.posexplode(F.split("text", " ")).alias("i", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    bigrams = (
        toks.select("lang", "tok", F.lead("tok").over(w).alias("nxt"))
        .filter(F.col("nxt").isNotNull())
        .groupBy("lang", "tok", "nxt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ctx = bigrams.groupBy("lang", "tok").agg(F.sum("c").alias("c_ctx"))
    tot = bigrams.groupBy("lang").agg(F.sum("c").alias("n"))
    return (
        bigrams.join(ctx, ["lang", "tok"])
        .join(tot, "lang")
        .groupBy("lang")
        .agg(
            F.max("n").alias("n_bigrams"),
            F.count(F.lit(1)).alias("n_distinct_bigrams"),
            (
                F.round(
                    -F.sum(
                        (F.col("c").cast("double") / F.col("n"))
                        * F.log(F.col("c").cast("double") / F.col("c_ctx"))
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("entropy_rate_nats"),
            (
                F.round(
                    -F.sum(
                        (F.col("c").cast("double") / F.col("n"))
                        * F.log(F.col("c").cast("double") / F.col("n"))
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("bigram_entropy_nats"),
        )
    )


# --- round 10: unigram-LM (SentencePiece-style) tokenizer training -----------
# VERDICT r9 item 5: the BPE family covers MERGE-based tokenization; the
# unigram model's EM step completes the production tokenizer-training pair.

UNI_L = 4      # max piece length (chars) — bounds the Viterbi DP width;
               # must stay < 16 (the cost*16+k back-pointer base — asserted
               # in _unigram_chain_sql and below)
UNI_WMAX = 12  # max word length admitted to training (SentencePiece trims
               # rare long words the same way; bounds the DP unroll depth)


def _unigram_chain_sql(
    uni_l: int = UNI_L, uni_wmax: int = UNI_WMAX, src: str = "documents"
) -> str:
    """Generate the chained-CTE DuckDB twin of the unigram-LM machinery —
    the _BPE_CHAIN_SQL discipline: one dp CTE per unrolled Viterbi position
    and one bt CTE per backtrace step, all AS MATERIALIZED (each is
    referenced by up to uni_l later steps), derived from the same
    UNI_L/UNI_WMAX constants as the Spark plan so geometry cannot drift.
    Ends after the `used` CTE (one row per chosen piece occurrence per
    word); text_unigram_train and text_unigram_apply append their own
    tails so op and twin share one chain. Parametrized so the differential
    fuzzer can instantiate random piece inventories (uni_l) and DP depths
    (uni_wmax) over corpus slices (src).

    The Viterbi back-pointer is packed as cost*16 + k and decoded via
    min_enc % 16, so piece length k must stay strictly below the base."""
    if not 1 <= uni_l < 16:
        raise ValueError(
            f"uni_l={uni_l}: the cost*16+k back-pointer encoding requires"
            " 1 <= uni_l < 16"
        )
    UNI_L, UNI_WMAX = uni_l, uni_wmax  # noqa: N806 — shadow for the f-strings
    parts = [
        f"""WITH words AS MATERIALIZED (
        SELECT word, count(*)::BIGINT AS wcnt, length(word)::BIGINT AS wlen
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM {src}) z
        WHERE length(word) BETWEEN 1 AND {UNI_WMAX}
        GROUP BY word
    ),
    occ1 AS (
        SELECT word, wcnt, wlen, s
        FROM words, unnest(generate_series(1, wlen)) t(s)
    ),
    occ AS (
        SELECT substring(word, s, k) AS piece, wcnt
        FROM occ1, unnest(generate_series(1, least({UNI_L}, wlen - s + 1))) t2(k)
    ),
    pieces AS (SELECT piece, sum(wcnt)::BIGINT AS init_cnt FROM occ GROUP BY piece),
    tot AS (SELECT sum(init_cnt)::BIGINT AS tot FROM pieces),
    pcost AS MATERIALIZED (
        SELECT piece, init_cnt,
               floor(-ln(init_cnt::DOUBLE / tot) * 1000000 + 0.5)::BIGINT
                   AS cost_micro
        FROM pieces CROSS JOIN tot
    ),
    dp0 AS MATERIALIZED (
        SELECT word, wlen, 0::BIGINT AS pos, 0::BIGINT AS cost,
               0::BIGINT AS back_k
        FROM words
    )"""
    ]
    for i in range(1, UNI_WMAX + 1):
        prev = " UNION ALL ".join(
            f"SELECT word, wlen, pos, cost FROM dp{j}"
            for j in range(max(0, i - UNI_L), i)
        )
        parts.append(
            f""",
    dp{i} AS MATERIALIZED (
        SELECT word, wlen, {i}::BIGINT AS pos,
               (min_enc // 16)::BIGINT AS cost,
               (min_enc % 16)::BIGINT AS back_k
        FROM (
            SELECT p.word, p.wlen,
                   min((p.cost + c.cost_micro) * 16 + ({i} - p.pos))::BIGINT
                       AS min_enc
            FROM ({prev}) p
            JOIN pcost c
              ON c.piece = substring(p.word, p.pos + 1, {i} - p.pos)
            WHERE p.wlen >= {i}
            GROUP BY p.word, p.wlen
        ) q
    )"""
        )
    cells_union = " UNION ALL ".join(
        f"SELECT word, pos, back_k FROM dp{j}" for j in range(0, UNI_WMAX + 1)
    )
    parts.append(
        f""",
    cells AS MATERIALIZED ({cells_union}),
    bt0 AS MATERIALIZED (SELECT word, wlen AS pos FROM words)"""
    )
    for j in range(1, UNI_WMAX + 1):
        src = (
            "SELECT word, pos FROM bt0"
            if j == 1
            else f"SELECT word, pos - back_k AS pos FROM bt{j - 1}"
        )
        parts.append(
            f""",
    bt{j} AS MATERIALIZED (
        SELECT b.word, b.pos, c.back_k
        FROM ({src}) b JOIN cells c ON c.word = b.word AND c.pos = b.pos
        WHERE b.pos > 0
    )"""
        )
    used_union = " UNION ALL ".join(
        f"SELECT word, pos, back_k FROM bt{j}" for j in range(1, UNI_WMAX + 1)
    )
    parts.append(
        f""",
    used AS MATERIALIZED (
        SELECT word, substring(word, pos - back_k + 1, back_k) AS piece
        FROM ({used_union}) u
    )"""
    )
    return "".join(parts)


def _cte_names(sql: str) -> set:
    """CTE names declared in a WITH chain (anchored on WITH/comma so WINDOW
    aliases and column aliases don't match)."""
    import re

    return set(
        re.findall(r"(?:WITH|,)\s*(\w+)\s+AS\s+(?:MATERIALIZED\s+)?\(", sql)
    )


# corpus_tokenizer_compare splices _BPE_CHAIN_SQL and _unigram_chain_sql into
# ONE WITH chain; its docstring claims the namespaces are disjoint, so make
# the claim an import-time invariant (ADVICE r10 item 5).
_CHAIN_OVERLAP = _cte_names(_BPE_CHAIN_SQL) & _cte_names(_unigram_chain_sql())
if _CHAIN_OVERLAP:
    raise RuntimeError(
        f"BPE/unigram oracle CTE namespaces collide: {sorted(_CHAIN_OVERLAP)}"
    )


def _unigram_oracle_sql(
    uni_l: int = UNI_L, uni_wmax: int = UNI_WMAX, src: str = "documents"
) -> str:
    """text_unigram_train's full twin: the shared chain + the M-step tail."""
    return (
        _unigram_chain_sql(uni_l, uni_wmax, src)
        + """,
    uses AS (
        SELECT u.piece, sum(w.wcnt)::BIGINT AS used_cnt
        FROM used u JOIN words w ON w.word = u.word
        GROUP BY u.piece
    ),
    tu AS (SELECT sum(used_cnt)::BIGINT AS tu FROM uses)
    SELECT u.piece, length(u.piece)::BIGINT AS piece_len,
           c.init_cnt, c.cost_micro, u.used_cnt,
           (u.used_cnt * 1000000 // t.tu)::BIGINT AS new_prob_ppm
    FROM uses u JOIN pcost c ON c.piece = u.piece CROSS JOIN tu t"""
    )


# Session memo for the trained chain (the _bpe_rounds discipline): the
# checkpointed frames are materialized lineage, so train/apply consumers
# pay the UNI_WMAX-level DP once per (session, sf_dir).
_UNIGRAM_FRAMES: dict[tuple[str, str], tuple] = {}

# Scale probe for the Viterbi E-step (optimization round 12, the
# CC_DRIVER_MAX_EDGES contract): the DP input is the ADMITTED WORD
# HISTOGRAM — |vocab| rows by construction, not corpus rows — and the
# piece inventory (distinct substrings of length <= UNI_L, bounded by the
# character-4-gram space). When |vocab| is provably below this bound
# (counted from the checkpointed words frame, one cheap job), running the
# UNI_WMAX DP levels + UNI_WMAX backtrace steps as ~26 checkpointed Spark
# jobs is pure per-job planning overhead (the BT-trainer waste class);
# the driver replays the identical integer algebra over the collected
# histogram instead. Above the bound — a 100 TB vocabulary — the
# distributed DP runs unchanged.
UNI_DRIVER_MAX_WORDS = 200_000

# Companion bound on the PIECE inventory (ADVICE r12): the driver DP
# collects the FULL pcost dict, and |pieces| is only boundedly related to
# |words| (up to ~wlen x UNI_L distinct substrings per word — ~8M dict
# entries at the word bound in the worst case, enough to stress
# spark.driver.maxResultSize and the collect path). Gating on the piece
# count directly (one cheap job over the checkpointed inventory) keeps the
# collected payload at ~tens of MB: 2M pieces x (short str + long) ≈
# ~300 MB of Python dict at worst, well inside the local driver. Above
# either bound the distributed DP runs unchanged.
UNI_DRIVER_MAX_PIECES = 2_000_000


def _unigram_words_pcost(spark: SparkSession, sf_dir: str) -> tuple:
    """Corpus passes of the unigram trainer: the admitted word histogram
    and the quantized piece inventory (both eagerly checkpointed). These
    touch the corpus / run the -ln quantizer in Spark on BOTH DP paths,
    so the float->micro-unit boundary is engine-identical regardless of
    where the downstream integer DP runs."""
    from ..session import ensure_checkpoint_dir

    ensure_checkpoint_dir(spark)
    d = load(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter((F.length("word") >= 1) & (F.length("word") <= UNI_WMAX))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcnt"))
        .select("word", "wcnt", F.length("word").cast("long").alias("wlen"))
        .checkpoint(eager=True)
    )
    occ = (
        words.select(
            "word", "wcnt", "wlen",
            F.explode(F.sequence(F.lit(1), F.col("wlen"))).alias("s"),
        )
        .select(
            "word", "wcnt",
            F.explode(
                F.sequence(
                    F.lit(1), F.least(F.lit(UNI_L), F.col("wlen") - F.col("s") + 1)
                )
            ).alias("k"),
            "s",
        )
        .select(F.expr("substring(word, s, k)").alias("piece"), "wcnt")
    )
    pieces = occ.groupBy("piece").agg(F.sum("wcnt").alias("init_cnt"))
    tot = pieces.agg(F.sum("init_cnt").alias("tot"))
    pcost = (
        pieces.crossJoin(F.broadcast(tot))
        .select(
            "piece",
            "init_cnt",
            F.floor(
                -F.log(F.col("init_cnt").cast("double") / F.col("tot")) * 1000000
                + 0.5
            )
            .cast("long")
            .alias("cost_micro"),
        )
        .checkpoint(eager=True)
    )
    return words, pcost


def _driver_viterbi_used(spark: SparkSession, words, pcost):
    """Driver replay of the distributed Viterbi DP + backtrace over the
    collected word histogram — the integer algebra is IDENTICAL to the
    distributed levels (enc = (cost + cost_micro) * 16 + k, minimized;
    cost = enc div 16, back_k = enc % 16; backtrace follows back_k from
    pos = wlen), so the emitted (word, piece) multiset is bit-equal
    (pinned by TestDriverUnigramEquivalence). cost_micro values were
    quantized by the SAME Spark expression on both paths; everything
    after the quantizer is exact integer arithmetic in either engine.

    Materialization follows the _driver_cc_labels rule: parallelized
    driver rows (Scan ExistingRDD) below DRIVER_FRAME_CHECKPOINT_MIN_ROWS
    (the rows ARE the materialization — an eager checkpoint of a tiny
    local frame is ~1 s of pure task overhead), eager checkpoint at or
    above it."""
    cost = {r[0]: r[1] for r in pcost.select("piece", "cost_micro").collect()}
    emit: list[tuple[str, str]] = []
    for (w,) in words.select("word").collect():
        n = len(w)
        dpc = [0] * (n + 1)
        back = [0] * (n + 1)
        for i in range(1, n + 1):
            enc = min(
                (dpc[pos] + cost[w[pos:i]]) * 16 + (i - pos)
                for pos in range(max(0, i - UNI_L), i)
            )
            dpc[i], back[i] = enc // 16, enc % 16
        pos = n
        while pos > 0:
            k = back[pos]
            emit.append((w, w[pos - k : pos]))
            pos -= k
    from .llm_dedup import DRIVER_FRAME_CHECKPOINT_MIN_ROWS

    emit.sort()
    df = spark.createDataFrame(emit, "word string, piece string")
    if len(emit) >= DRIVER_FRAME_CHECKPOINT_MIN_ROWS:
        df = df.checkpoint(eager=True)
    return df


def _unigram_used_frame(
    spark: SparkSession,
    words,
    pcost,
    driver_max_words: int = UNI_DRIVER_MAX_WORDS,
) -> "DataFrame":
    """Viterbi E-step emissions (word, piece) — one row per chosen piece
    occurrence per word, materialized (checkpoint or driver rows — see
    _driver_viterbi_used). Below ``driver_max_words``
    (|words| counted from the already-checkpointed histogram) the DP runs
    on the driver (see UNI_DRIVER_MAX_WORDS); above it, as the unrolled
    distributed levels. Pass 0 to force the distributed DP (the
    equivalence test does) — the `> 0 and` guard keeps that forcing
    contract honest on an empty vocabulary (count() == 0 <= 0 would
    otherwise silently take the driver path — ADVICE r12), and the piece
    inventory is gated separately (see UNI_DRIVER_MAX_PIECES)."""
    if (
        driver_max_words > 0
        and words.count() <= driver_max_words
        and pcost.count() <= UNI_DRIVER_MAX_PIECES
    ):
        return _driver_viterbi_used(spark, words, pcost)
    pb = F.broadcast(pcost.select("piece", "cost_micro"))
    levels = [
        words.select(
            "word",
            "wlen",
            F.lit(0).cast("long").alias("pos"),
            F.lit(0).cast("long").alias("cost"),
            F.lit(0).cast("long").alias("back_k"),
        ).checkpoint(eager=True)
    ]
    for i in range(1, UNI_WMAX + 1):
        prev = levels[max(0, i - UNI_L)]
        for lv in levels[max(0, i - UNI_L) + 1 : i]:
            prev = prev.unionByName(lv)
        cand = (
            prev.filter(F.col("wlen") >= i)
            .select(
                "word",
                "wlen",
                "cost",
                F.expr(f"substring(word, pos + 1, {i} - pos)").alias("piece"),
                F.col("pos"),
            )
            .join(pb, "piece")
        )
        best = (
            cand.select(
                "word",
                "wlen",
                (
                    (F.col("cost") + F.col("cost_micro")) * 16
                    + (F.lit(i) - F.col("pos"))
                ).alias("enc"),
            )
            .groupBy("word", "wlen")
            .agg(F.min("enc").alias("enc"))
            .select(
                "word",
                "wlen",
                F.lit(i).cast("long").alias("pos"),
                F.expr("enc div 16").alias("cost"),
                F.expr("enc % 16").alias("back_k"),
            )
            .checkpoint(eager=True)
        )
        levels.append(best)
    cells = levels[0].select("word", "pos", "back_k")
    for lv in levels[1:]:
        cells = cells.unionByName(lv.select("word", "pos", "back_k"))
    cells = cells.checkpoint(eager=True)
    frontier = words.select("word", F.col("wlen").alias("pos"))
    used = None
    for _ in range(UNI_WMAX):
        step = (
            frontier.filter(F.col("pos") > 0)
            .join(cells, ["word", "pos"])
            .checkpoint(eager=True)
        )
        emit = step.select(
            "word",
            F.expr("substring(word, pos - back_k + 1, back_k)").alias("piece"),
        )
        used = emit if used is None else used.unionByName(emit)
        frontier = step.select("word", (F.col("pos") - F.col("back_k")).alias("pos"))
    return used.checkpoint(eager=True)


def _unigram_frames(spark: SparkSession, sf_dir: str) -> tuple:
    """Build (words, pcost, used) once per (applicationId, sf_dir):
    words = admitted word histogram, pcost = quantized piece inventory,
    used = one row per chosen piece occurrence per word (the Viterbi
    E-step output). All materialized (checkpointed, or parallelized
    driver rows
    from the driver DP) — see text_unigram_train for the full algebra
    and scale rationale, and UNI_DRIVER_MAX_WORDS for the scale-adaptive
    DP placement."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _UNIGRAM_FRAMES:
        return _UNIGRAM_FRAMES[key]
    words, pcost = _unigram_words_pcost(spark, sf_dir)
    used = _unigram_used_frame(spark, words, pcost)
    _UNIGRAM_FRAMES[key] = (words, pcost, used)
    return _UNIGRAM_FRAMES[key]


@query(
    "text_unigram_train",
    oracle=_unigram_oracle_sql(),
    tags=("llm", "text", "tokenizer", "flagship"),
)
def text_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer training (SentencePiece, Kudo 2018) as pure
    relational algebra — ONE EM round over the corpus word histogram, the
    round-10 flagship completing the production tokenizer pair next to
    text_bpe_train (merge-based vs likelihood-based):

    - Candidate inventory: every substring of length <= UNI_L of every
      admitted word (length <= UNI_WMAX), frequency-weighted by word
      count; initial piece cost = -ln(cnt/total) quantized ONCE at the
      inventory level to exact micro-units (the corpus_perplexity_filter
      convention — everything after the quantizer is integer algebra).
    - E-step: per DISTINCT word, the Viterbi-best segmentation over the
      piece lattice. Bounded piece length = bounded-width DP: position
      i's best cost reads only positions i-UNI_L..i-1, so the DP unrolls
      into UNI_WMAX relational steps — each ONE broadcast join of the
      previous <=UNI_L cell frames against the piece table keyed on the
      literal substring(word, pos+1, i-pos), then an integer argmin.
      Tie-breaks are total: candidates minimize (cost*16 + k) so equal
      costs prefer the SHORTEST last piece, deterministically on both
      engines. Each dp level is eagerly checkpointed (the graph_hits
      lesson: levels are referenced by up to UNI_L later steps — without
      the cut the physical plan re-derives subtrees ~4-fold per level).
    - Backtrace: UNI_WMAX frontier joins against the checkpointed cell
      table follow back_k pointers from pos=wlen to 0, emitting the
      chosen pieces (frontiers checkpointed for the same reason).
    - M-step: piece usage re-aggregates word-count-weighted emissions;
      new_prob_ppm is exact integer ppm (rule 25).

    E-step round 1 is replayed token-for-token against a pure-Python
    Viterbi replica (the text_bpe_train discipline) in
    tests/test_round10_properties.py; the oracle is the generated
    chained-CTE twin (_BPE_CHAIN_SQL discipline, AS MATERIALIZED).

    Scale shape: training state is the WORD HISTOGRAM (|vocab| rows, not
    corpus rows — the SentencePiece shape) and the piece inventory
    (bounded by |vocab|*UNI_WMAX*UNI_L); the corpus is touched once by
    the word count. DP frames are vocab-sized per level; the piece table
    broadcasts at fixture scale and hash-joins on the piece key at 100 TB
    vocab. Cost class: iterative trainer (UNI_WMAX checkpointed levels),
    the honest tokenizer-training price text_bpe_train also pays — paid
    ONCE per (session, sf_dir) via the _unigram_frames memo, which
    text_unigram_apply then rides (the _bpe_rounds discipline)."""
    words, pcost, used = _unigram_frames(spark, sf_dir)
    uses = (
        used.join(words.select("word", "wcnt"), "word")
        .groupBy("piece")
        .agg(F.sum("wcnt").alias("used_cnt"))
    )
    tu = uses.agg(F.sum("used_cnt").alias("tu"))
    return (
        uses.join(pcost, "piece")
        .crossJoin(F.broadcast(tu))
        .select(
            "piece",
            F.length("piece").cast("long").alias("piece_len"),
            "init_cnt",
            "cost_micro",
            "used_cnt",
            F.expr("used_cnt * 1000000 div tu").alias("new_prob_ppm"),
        )
    )


@query(
    "text_unigram_apply",
    oracle=_unigram_chain_sql()
    + """,
    seg AS (SELECT word, count(*)::BIGINT AS n_pieces FROM used GROUP BY word),
    toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    )
    SELECT t.doc_id,
           count(*)::BIGINT AS n_words,
           sum(CASE WHEN s.n_pieces IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
               AS n_admitted,
           coalesce(sum(s.n_pieces), 0)::BIGINT AS n_pieces,
           coalesce(sum(CASE WHEN s.n_pieces IS NOT NULL
                             THEN length(t.word) END), 0)::BIGINT
               AS n_chars_admitted,
           (coalesce(sum(s.n_pieces), 0) * 1000000
               // nullif(sum(CASE WHEN s.n_pieces IS NOT NULL
                                  THEN 1 ELSE 0 END), 0))::BIGINT
               AS fertility_ppm
    FROM toks t LEFT JOIN seg s ON s.word = t.word
    GROUP BY t.doc_id
    """,
    tags=("llm", "text", "tokenizer"),
)
def text_unigram_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the trained unigram model — the per-doc
    segmentation ledger (the text_bpe_apply twin for the likelihood-based
    tokenizer): every admitted word is replaced by its Viterbi-best piece
    sequence, and each document reports its word count, admitted-word
    count (words longer than UNI_WMAX fall outside the trained model, the
    SentencePiece rare-long-word trim), piece count, admitted character
    mass, and fertility_ppm — pieces per admitted word in exact integer
    ppm, THE number tokenizer evaluations quote (corpus_bpe_fertility's
    metric for the merge-based family).

    Plan: rides the _unigram_frames session memo (the DP chain is paid
    once by whichever family member runs first), reduces the E-step
    emissions to a per-WORD piece count (|vocab| rows), and joins the
    corpus token stream against that tiny frame — broadcast at fixture
    scale, a word-keyed equi-join at 100 TB vocab. No window anywhere:
    apply is one explode + one join + one rollup. Oracle shares the
    generated chain via _unigram_chain_sql so op and twin cannot drift
    (the corpus_bpe_fertility discipline)."""
    words, _pcost, used = _unigram_frames(spark, sf_dir)
    seg = used.groupBy("word").agg(F.count(F.lit(1)).alias("n_pieces"))
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    return (
        toks.join(F.broadcast(seg), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.when(F.col("n_pieces").isNotNull(), 1).otherwise(0)).alias(
                "n_admitted"
            ),
            F.coalesce(F.sum("n_pieces"), F.lit(0)).alias("n_pieces"),
            F.coalesce(
                F.sum(
                    F.when(F.col("n_pieces").isNotNull(), F.length("word"))
                ),
                F.lit(0),
            ).alias("n_chars_admitted"),
            F.expr(
                "coalesce(sum(n_pieces), 0) * 1000000"
                " div nullif(sum(CASE WHEN n_pieces IS NOT NULL"
                " THEN 1 ELSE 0 END), 0)"
            ).alias("fertility_ppm"),
        )
    )


# --- round 10: cross-tokenizer fertility comparison ----------------------------


@query(
    "corpus_tokenizer_compare",
    oracle=_BPE_CHAIN_SQL
    + ","
    + _unigram_chain_sql()[len("WITH ") :]
    + """,
    bpe_after AS (SELECT doc_id, count(*)::BIGINT AS toks FROM t3 GROUP BY doc_id),
    meta AS (
        SELECT doc_id, lang, len(string_split(text, ' '))::BIGINT AS n_words
        FROM documents
    ),
    seg AS (SELECT word, count(*)::BIGINT AS n_pieces FROM used GROUP BY word),
    doc_toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    uni_after AS (
        SELECT t.doc_id, coalesce(sum(s.n_pieces), 0)::BIGINT AS pieces,
               sum(CASE WHEN s.n_pieces IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                   AS adm
        FROM doc_toks t LEFT JOIN seg s ON s.word = t.word GROUP BY t.doc_id
    )
    SELECT m.lang, count(*)::BIGINT AS n_docs,
           sum(m.n_words)::BIGINT AS words,
           sum(b.toks)::BIGINT AS bpe_tokens,
           sum(u.pieces)::BIGINT AS unigram_pieces,
           sum(u.adm)::BIGINT AS admitted_words,
           (sum(b.toks) * 1000000 // sum(m.n_words))::BIGINT AS bpe_tpw_ppm,
           (sum(u.pieces) * 1000000 // nullif(sum(u.adm), 0))::BIGINT
               AS unigram_ppw_ppm
    FROM meta m JOIN bpe_after b ON b.doc_id = m.doc_id
    JOIN uni_after u ON u.doc_id = m.doc_id
    GROUP BY m.lang
    """,
    tags=("llm", "corpus", "tokenizer"),
)
def corpus_tokenizer_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-TOKENIZER fertility comparison — the table a tokenizer
    bake-off actually publishes: per language, tokens-per-word for the
    trained BPE (merge-based) and pieces-per-admitted-word for the
    trained unigram-LM (likelihood-based), side by side from the SAME
    corpus. The two families optimize different objectives (merge
    frequency vs corpus likelihood), so their per-language fertility gap
    is the signal that picks a tokenizer for a 100 TB run — this op
    makes the comparison a single query instead of two reports glued in
    a notebook.

    Rides BOTH session memos (_bpe_rounds and _unigram_frames — each
    training chain is paid once per session by whichever family member
    runs first); the oracle SPLICES the two generated CTE chains
    (_BPE_CHAIN_SQL + _unigram_chain_sql, disjoint CTE namespaces
    checked at import) so neither side can drift from the op it
    audits. Integer ppm ratios (rule 25); admitted_words counts the
    unigram model's coverage (words <= UNI_WMAX chars), making the
    denominators' difference explicit rather than hidden.

    Scale: two doc-keyed counts + one |langs|-row rollup beyond the
    already-memoized chains."""
    _, _, t_final = _bpe_rounds(spark, sf_dir)
    bpe_after = t_final.groupBy("doc_id").agg(F.count(F.lit(1)).alias("toks"))
    _words, _pcost, used = _unigram_frames(spark, sf_dir)
    seg = used.groupBy("word").agg(F.count(F.lit(1)).alias("n_pieces"))
    doc_toks = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    uni_after = (
        doc_toks.join(F.broadcast(seg), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.coalesce(F.sum("n_pieces"), F.lit(0)).alias("pieces"),
            F.sum(F.when(F.col("n_pieces").isNotNull(), 1).otherwise(0)).alias(
                "adm"
            ),
        )
    )
    meta = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("long").alias("n_words")
    )
    return (
        meta.join(bpe_after, "doc_id")
        .join(uni_after, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("words"),
            F.sum("toks").alias("bpe_tokens"),
            F.sum("pieces").alias("unigram_pieces"),
            F.sum("adm").alias("admitted_words"),
            F.expr("sum(toks) * 1000000 div sum(n_words)").alias("bpe_tpw_ppm"),
            F.expr(
                "sum(pieces) * 1000000 div nullif(sum(adm), 0)"
            ).alias("unigram_ppw_ppm"),
        )
    )


# --- round 11: language identification (CCNet-shape profile classifier) -------


def _lang_id_chain_sql(gram: int = 1, src: str = "documents") -> str:
    """Generated CTE chain shared by text_lang_id and stream_lang_drift
    (ends at the per-doc `pick`), parametrized by word-n-gram
    order (gram) and corpus slice (src) so the differential fuzzer can
    instantiate random feature geometries. gram = 1 is the registered op.

    The smoothed naive-Bayes score is computed WITHOUT a langs x vocab
    grid: s(doc, L) = n_feats(doc) * defq(L) + prior(L)
                      + sum_{observed f} tf(f) * (llq(f, L) - defq(L))
    where llq = floor(ln((cnt+1)/(tot+V)) * 1e6) and defq is the same
    quantizer at cnt = 0 — the unseen-feature mass folds into one exact
    integer per language, so the profile stays |observed pairs| and the
    scoring join touches only observed features (PARITY rule 25 integers;
    the two floor-quantized logs are differenced AFTER quantization, so
    the algebra is exact BIGINT end-to-end)."""
    if gram == 1:
        feats = f"""
        SELECT doc_id, lang, w AS f FROM (
            SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
            FROM {src}
        ) WHERE len(w) >= 1"""
    else:
        feats = f"""
        SELECT doc_id, lang,
               array_to_string(ws[i : i + {gram - 1}], ' ') AS f
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM {src}),
             unnest(generate_series(1, greatest(len(ws) - {gram - 1}, 0))) t(i)"""
    return f"""
    WITH feats AS MATERIALIZED ({feats}
    ),
    tf AS (
        SELECT doc_id, lang, f, count(*)::BIGINT AS tf
        FROM feats GROUP BY doc_id, lang, f
    ),
    doclen AS (
        SELECT doc_id, lang, count(*)::BIGINT AS n_feats
        FROM feats GROUP BY doc_id, lang
    ),
    pc AS (
        SELECT lang AS plang, f, count(*)::BIGINT AS cnt
        FROM feats GROUP BY lang, f
    ),
    pt AS (SELECT plang, sum(cnt)::BIGINT AS tot FROM pc GROUP BY plang),
    vsize AS (SELECT count(DISTINCT f)::BIGINT AS v FROM pc),
    nd AS (SELECT lang AS plang, count(*)::BIGINT AS ndocs FROM {src} GROUP BY lang),
    nn AS (SELECT sum(ndocs)::BIGINT AS n FROM nd),
    lang_model AS MATERIALIZED (
        SELECT pt.plang,
               floor(ln(1.0 / (pt.tot + vs.v)) * 1000000)::BIGINT AS defq,
               floor(ln(nd.ndocs::DOUBLE / nn.n) * 1000000)::BIGINT AS prq
        FROM pt CROSS JOIN vsize vs
        JOIN nd ON nd.plang = pt.plang CROSS JOIN nn
    ),
    prof AS MATERIALIZED (
        SELECT pc.plang, pc.f,
               (floor(ln((pc.cnt + 1)::DOUBLE / (pt.tot + vs.v)) * 1000000)::BIGINT
                - lm.defq)::BIGINT AS dllq
        FROM pc
        JOIN pt ON pt.plang = pc.plang
        CROSS JOIN vsize vs
        JOIN lang_model lm ON lm.plang = pc.plang
    ),
    part AS (
        SELECT t.doc_id, p.plang, sum(t.tf * p.dllq)::BIGINT AS sw
        FROM tf t JOIN prof p ON p.f = t.f
        GROUP BY t.doc_id, p.plang
    ),
    score AS (
        SELECT d.doc_id, d.lang, lm.plang,
               (d.n_feats * lm.defq + lm.prq + COALESCE(pa.sw, 0))::BIGINT AS s
        FROM doclen d CROSS JOIN lang_model lm
        LEFT JOIN part pa ON pa.doc_id = d.doc_id AND pa.plang = lm.plang
    ),
    pick AS (
        SELECT doc_id, lang,
               first(plang ORDER BY s DESC, plang ASC) AS pred_lang
        FROM score GROUP BY doc_id, lang
    )"""


def _lang_id_oracle_sql(gram: int = 1, src: str = "documents") -> str:
    """text_lang_id's full twin: the shared chain + the confusion tail."""
    return (
        _lang_id_chain_sql(gram, src)
        + """,
    ltot AS (SELECT lang, count(*)::BIGINT AS lang_docs FROM pick GROUP BY lang)
    SELECT p.lang, p.pred_lang, count(*)::BIGINT AS n_docs,
           (count(*) * 1000000 // any_value(lt.lang_docs))::BIGINT AS row_share_ppm
    FROM pick p JOIN ltot lt ON lt.lang = p.lang
    GROUP BY p.lang, p.pred_lang"""
    )


def _lang_drift_oracle_sql(gram: int = 1, src: str = "documents") -> str:
    """stream_lang_drift's twin: the shared chain + the drift tail (predicted
    language mix vs the labeled training mix, exact integer ppm)."""
    return (
        _lang_id_chain_sql(gram, src)
        + f""",
    pcounts AS (SELECT pred_lang, count(*)::BIGINT AS n_docs
                FROM pick GROUP BY pred_lang),
    ptot AS (SELECT sum(n_docs)::BIGINT AS n FROM pcounts),
    train AS (SELECT lang, count(*)::BIGINT AS tn FROM {src} GROUP BY lang),
    ttot AS (SELECT sum(tn)::BIGINT AS n FROM train)
    SELECT p.pred_lang, p.n_docs,
           (p.n_docs * 1000000 // t.n)::BIGINT AS pred_share_ppm,
           (tr.tn * 1000000 // tt.n)::BIGINT AS label_share_ppm,
           (p.n_docs * 1000000 // t.n
            - tr.tn * 1000000 // tt.n)::BIGINT AS drift_ppm
    FROM pcounts p CROSS JOIN ptot t
    JOIN train tr ON tr.lang = p.pred_lang CROSS JOIN ttot tt"""
    )


_LANG_ID_MODEL: dict = {}


def _lang_id_model(spark: SparkSession, d: DataFrame, memo_key: str | None = None):
    """Train the quantized NB model once from a (doc_id, lang, text) frame:
    returns (lang_model, prof) — both eagerly checkpointed, and MEMOIZED
    per (applicationId, memo_key) when a key is passed (the _bt_strengths
    convention) so the three consumers (text_lang_id, stream_lang_drift,
    eval_langid_kappa) share one training run per session."""
    from ..session import ensure_checkpoint_dir

    key = (spark.sparkContext.applicationId, memo_key)
    if memo_key is not None and key in _LANG_ID_MODEL:
        return _LANG_ID_MODEL[key]
    ensure_checkpoint_dir(spark)
    feats = (
        d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("f"))
        .filter(F.length("f") >= 1)
    )
    pc = (
        feats.groupBy(F.col("lang").alias("plang"), "f")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # vocab x langs observed pairs; checkpointed so the corpus explode
        # runs ONCE (pt/vsize and prof all derive from this frame)
        .checkpoint(eager=True)
    )
    pt = pc.groupBy("plang").agg(F.sum("cnt").alias("tot"))
    vsize = pc.agg(F.count_distinct("f").alias("v"))
    nd = d.groupBy(F.col("lang").alias("plang")).agg(
        F.count(F.lit(1)).alias("ndocs")
    )
    nn = nd.agg(F.sum("ndocs").alias("n"))
    lang_model = (
        pt.crossJoin(F.broadcast(vsize))
        .join(nd, "plang")
        .crossJoin(F.broadcast(nn))
        .select(
            "plang",
            "tot",
            "v",
            F.expr("floor(ln(1.0 / (tot + v)) * 1000000)").cast("long").alias("defq"),
            F.expr("floor(ln(cast(ndocs as double) / n) * 1000000)")
            .cast("long")
            .alias("prq"),
        )
        # |langs| rows; eagerly checkpointed so the two downstream consumers
        # (prof, score) don't each re-plan the corpus aggregates + scalar
        # folds beneath it (the ml_logreg_train / _unigram_frames convention)
        .checkpoint(eager=True)
    )
    prof = (
        pc.join(lang_model.select("plang", "tot", "v", "defq"), "plang")
        .select(
            "plang",
            "f",
            (
                F.expr("floor(ln(cast(cnt + 1 as double) / (tot + v)) * 1000000)")
                .cast("long")
                - F.col("defq")
            ).alias("dllq"),
        )
    )
    if memo_key is not None:
        _LANG_ID_MODEL[key] = (lang_model, prof)
    return lang_model, prof


_LANG_ID_SCORED: dict = {}


def _lang_id_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score the full fixture corpus with the memoized NB model ONCE per
    (session, sf_dir) and checkpoint the (doc_id, lang, pred_lang) verdict
    frame. The round-12 bench measured the scoring pass (corpus explode →
    tf/doclen partial aggs → profile join → per-doc argmax) at ~2.5-3 s
    PER CONSUMER at sf0.1, paid three times (text_lang_id,
    eval_langid_kappa, corpus_curated_select) while only the |langs|-row
    model was shared. The verdict frame is |docs| rows x 3 narrow columns
    — the same artifact class as the gram_cc_labels / sim_pair_edges
    memos, recomputed from parquet in every fresh process."""
    from ..session import ensure_checkpoint_dir

    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _LANG_ID_SCORED:
        return _LANG_ID_SCORED[key]
    ensure_checkpoint_dir(spark)
    d = load(spark, sf_dir, "documents")
    lang_model, prof = _lang_id_model(spark, d, memo_key=sf_dir)
    feats = (
        d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("f"))
        .filter(F.length("f") >= 1)
    )
    tf = feats.groupBy("doc_id", "lang", "f").agg(F.count(F.lit(1)).alias("tf"))
    doclen = feats.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_feats")
    )
    part = (
        tf.join(prof, "f")
        .groupBy("doc_id", "plang")
        .agg(F.sum(F.col("tf") * F.col("dllq")).alias("sw"))
    )
    pick = _lang_id_pick(doclen, part, lang_model).checkpoint(eager=True)
    _LANG_ID_SCORED[key] = pick
    return pick


def _lang_id_pick(doclen: DataFrame, part: DataFrame, lang_model: DataFrame) -> DataFrame:
    """Score + argmax: doclen (doc_id, lang, n_feats) x broadcast model,
    left-joined with the observed-pair partial sums (doc_id, plang, sw)."""
    score = (
        doclen.crossJoin(F.broadcast(lang_model.select("plang", "defq", "prq")))
        .join(part, ["doc_id", "plang"], "left")
        .select(
            "doc_id",
            "lang",
            "plang",
            (
                F.col("n_feats") * F.col("defq")
                + F.col("prq")
                + F.coalesce(F.col("sw"), F.lit(0))
            ).alias("s"),
        )
    )
    wpick = Window.partitionBy("doc_id").orderBy(
        F.col("s").desc(), F.col("plang").asc()
    )
    return (
        score.withColumn("rn", F.row_number().over(wpick))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", F.col("plang").alias("pred_lang"))
    )


@query(
    "text_lang_id",
    oracle=_lang_id_oracle_sql(),
    tags=("llm", "text", "corpus", "flagship"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language identification — the first gate of corpus curation (the
    CCNet / fastText role): train per-language word-profile classifiers
    IN-PLAN from the labeled fixture and score every document, emitting
    the confusion matrix against the label. The classifier is add-1-
    smoothed multinomial naive Bayes with a document prior: profiles,
    priors and scores are all MICRO-QUANTIZED integers (llq =
    floor(ln((cnt+1)/(tot+V)) * 1e6)), so the argmax is over exact
    BIGINTs and cross-engine libm ulp noise dies at the quantizer
    (PARITY rule 8 applied rule-29-style: quantize the model, not the
    readout). Ties break (score desc, lang asc) — deterministic.

    The unseen-word mass is folded algebraically instead of materialized:
    s(doc, L) = n_tokens(doc)*defq(L) + prior(L) + sum tf*(llq - defq)
    over OBSERVED (lang, word) pairs only — no langs x vocab grid, so the
    model frame is |observed pairs| and the scoring join touches only
    words that exist in a profile. At 100 languages x 10M vocab the grid
    would be 1B rows of mostly-smoothed zeros; this shape never builds it.

    Note the fixture's honest limit: the synthetic languages share one
    31-word vocabulary with near-identical frequencies (total-variation
    distance ~0.04 between any two), so Bayes-optimal accuracy is barely
    above the majority share — the op pins accuracy >= 2x uniform chance,
    and the confusion matrix itself is the hash-checked artifact.

    Execution shape: one corpus pass builds tf / doclen / profile counts
    (all partial-agg); the model is language-count-sized and broadcast;
    scoring is one equi-join on word plus a crossJoin against the
    |langs|-row broadcast model (every classifier scores every class);
    the argmax window is partitioned by doc_id over |langs| rows. At
    100 TB: corpus passes stay partial-agg; the only super-linear term is
    |corpus tokens| x |langs| in the scoring join, the irreducible NB
    cost, shuffled on the word key. The scored verdict frame is shared
    with eval_langid_kappa / corpus_curated_select via the
    _lang_id_scored session memo (one scoring pass per session)."""
    pick = _lang_id_scored(spark, sf_dir)
    conf = pick.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    # per-lang totals as a window over the |langs|^2-row confusion frame —
    # NOT a second consumer of pick (which would re-plan the corpus subtree)
    wl = Window.partitionBy("lang")
    return conf.select(
        "lang",
        "pred_lang",
        "n_docs",
        F.expr("n_docs * 1000000").cast("long").alias("_num"),
        F.sum("n_docs").over(wl).alias("_lang_docs"),
    ).select(
        "lang",
        "pred_lang",
        "n_docs",
        F.expr("_num div _lang_docs").alias("row_share_ppm"),
    )


ARI_CHARS_X1M = 4_710_000   # ARI = 4.71*(chars/words) + 0.5*(words/sents) - 21.43,
ARI_WORDS_X1M = 500_000     # carried in exact ppm (x1e6) integer arithmetic
ARI_CONST_X1M = 21_430_000
LIX_LONG_LEN = 7            # LIX counts words of >= 7 chars as "long"


@query(
    "text_readability",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    per_doc AS (
        SELECT doc_id, any_value(lang) AS lang,
               count(*)::BIGINT AS words,
               sum(len(word))::BIGINT AS chars,
               sum(CASE WHEN len(word) >= {LIX_LONG_LEN} THEN 1 ELSE 0 END)::BIGINT
                   AS long_words
        FROM w GROUP BY doc_id
    )
    SELECT lang,
           count(*)::BIGINT AS n_docs,
           sum(words)::BIGINT AS words,
           sum(chars)::BIGINT AS chars,
           (sum(chars) * 1000000 // sum(words))::BIGINT AS mean_word_len_ppm,
           (sum(long_words) * 1000000 // sum(words))::BIGINT AS long_word_ppm,
           ({ARI_CHARS_X1M} * sum(chars) // sum(words)
            + {ARI_WORDS_X1M} * sum(words) // count(*)
            - {ARI_CONST_X1M})::BIGINT AS ari_x1m,
           (sum(words) * 1000000 // count(*)
            + 100 * (sum(long_words) * 1000000 // sum(words)))::BIGINT AS lix_x1m
    FROM per_doc GROUP BY lang
    """,
    tags=("llm", "text", "corpus"),
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability indices per language — the corpus-quality lens that
    complements text_quality's pass/fail gate with the graded scores
    curation pipelines bucket on (ARI and LIX, the two indices that need
    no syllable dictionary): ARI = 4.71*(chars/word) + 0.5*(words/sent)
    - 21.43 and LIX = words/sent + 100*(long words/words), with the
    fixture's sentence unit = document (the synthetic corpus carries no
    terminal punctuation — stated, not hidden; on punctuated text the
    sentence splitter slots in at the per_doc stage).

    ALL-INTEGER algebra: character/word/long-word counts fold map-side to
    exact BIGINTs per doc, per-lang indices are integer-ppm divisions of
    those sums (rule 25 — never a rounded float ratio), so the 8-column
    readout hashes bit-exactly. 5 output rows.

    At 100 TB: one explode + two partial aggs; no window, no join —
    the cheapest possible shape."""
    d = load(spark, sf_dir, "documents")
    w = d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("word"))
    per_doc = w.groupBy("doc_id").agg(
        F.first("lang").alias("lang"),
        F.count(F.lit(1)).alias("words"),
        F.sum(F.length("word")).alias("chars"),
        F.sum(
            F.when(F.length("word") >= LIX_LONG_LEN, 1).otherwise(0)
        ).alias("long_words"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("words").alias("words"),
        F.sum("chars").alias("chars"),
        F.expr("sum(chars) * 1000000 div sum(words)").alias("mean_word_len_ppm"),
        F.expr("sum(long_words) * 1000000 div sum(words)").alias("long_word_ppm"),
        F.expr(
            f"{ARI_CHARS_X1M} * sum(chars) div sum(words)"
            f" + {ARI_WORDS_X1M} * sum(words) div count(*)"
            f" - {ARI_CONST_X1M}"
        ).alias("ari_x1m"),
        F.expr(
            "sum(words) * 1000000 div count(*)"
            " + 100 * (sum(long_words) * 1000000 div sum(words))"
        ).alias("lix_x1m"),
    )


LDIV_C = 2  # recursive (c,l)-diversity: r1 < c * (r_l + ... + r_m)
LDIV_L = 3


@query(
    "privacy_entropy_ldiv",
    oracle=f"""
    WITH quasi AS (
        SELECT source, lang,
               CASE WHEN n_chars < 200 THEN 'short'
                    WHEN n_chars < 800 THEN 'medium'
                    ELSE 'long' END AS size_band,
               doc_id % 10 AS sensitive_bucket
        FROM documents
    ),
    cells AS (
        SELECT source, lang, size_band, sensitive_bucket,
               count(*)::BIGINT AS c
        FROM quasi GROUP BY 1, 2, 3, 4
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY source, lang, size_band
                                     ORDER BY c DESC, sensitive_bucket ASC)
                      AS rnk,
               sum(c) OVER (PARTITION BY source, lang, size_band)::BIGINT AS n
        FROM cells
    )
    SELECT source, lang, size_band,
           any_value(n)::BIGINT AS group_size,
           count(*)::BIGINT AS distinct_l,
           round(-sum((c::DOUBLE / n) * ln(c::DOUBLE / n)), 6) + 0.0
               AS entropy_nats,
           (max(CASE WHEN rnk = 1 THEN c ELSE 0 END)
            < {LDIV_C} * sum(CASE WHEN rnk >= {LDIV_L} THEN c ELSE 0 END))
               AS satisfies_recursive
    FROM ranked GROUP BY source, lang, size_band
    """,
    tags=("llm", "privacy"),
)
def privacy_entropy_ldiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy and recursive (c,l)-diversity — the STRONGER diversity
    audits layered over privacy_k_anonymity's distinct-count l: a group
    whose sensitive values are 99% one bucket passes distinct-l yet leaks
    almost surely, which entropy l-diversity (H(S|group) >= ln l) and
    Machanavajjhala's recursive test (most-common count r1 <
    c * (r_l + ... + r_m) — the tail must be able to 'absorb' the head)
    both catch. Emits per quasi-group: size, distinct l, entropy in nats,
    and the recursive verdict at the stated (c, l).

    Exactness: the sensitive histogram folds map-side to exact BIGINT
    cells; the recursive test is a PURE INTEGER comparison (rank by count
    desc with deterministic bucket tie-break, tail sum vs c*head); only
    entropy is float — rationals of exact counts, aggregate-rounded 6dp
    (rules 1/6/8). The rank window is PARTITIONED by quasi-group over the
    <= 10-cell sensitive domain.

    At 100 TB: one partial agg to cells; every window and fold runs on
    |groups| x |sensitive domain| rows."""
    docs = load(spark, sf_dir, "documents")
    size_band = (
        F.when(F.col("n_chars") < 200, "short")
        .when(F.col("n_chars") < 800, "medium")
        .otherwise("long")
    )
    cells = (
        docs.select(
            "source",
            "lang",
            size_band.alias("size_band"),
            (F.col("doc_id") % 10).alias("sensitive_bucket"),
        )
        .groupBy("source", "lang", "size_band", "sensitive_bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wg = Window.partitionBy("source", "lang", "size_band")
    ranked = cells.select(
        "*",
        F.row_number()
        .over(wg.orderBy(F.col("c").desc(), F.col("sensitive_bucket").asc()))
        .alias("rnk"),
        F.sum("c").over(wg).alias("n"),
    )
    return ranked.groupBy("source", "lang", "size_band").agg(
        F.max("n").alias("group_size"),
        F.count(F.lit(1)).alias("distinct_l"),
        (
            F.round(
                -F.sum(
                    (F.col("c").cast("double") / F.col("n"))
                    * F.log(F.col("c").cast("double") / F.col("n"))
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("entropy_nats"),
        (
            F.max(F.when(F.col("rnk") == 1, F.col("c")).otherwise(0))
            < LDIV_C
            * F.sum(F.when(F.col("rnk") >= LDIV_L, F.col("c")).otherwise(0))
        ).alias("satisfies_recursive"),
    )


# --- round 11: in-plan quality classifier (the CCNet gate, rule-29 GD) --------

QC_ITERS = 5
QC_STEP_X1M = 20000  # lr * 1e6 => lr = 0.02 in the micro-unit quantizer
# Stated, data-independent feature centerings (the ml_logreg_train rule):
# x1 = lexical-diversity percent - 50, x2 = n_chars div 100 - 3,
# x3 = token count div 10 - 4; label = even-numbered source ("curated" set).
QC_FEATURES_SQL = (
    "len(list_distinct(string_split(text, ' '))) * 1000000"
    " // len(string_split(text, ' ')) // 10000 - 50",
    "n_chars // 100 - 3",
    "len(string_split(text, ' ')) // 10 - 4",
)
QC_LABEL_SQL = "CASE WHEN substr(source, 4)::INT % 2 = 0 THEN 1 ELSE 0 END"


def _qc_chain_sql(prefix: str = "") -> str:
    """Generated chained-CTE GD chain of corpus_quality_classifier (pu,
    w_0..w_T, per-step m_t readouts) — the _logreg_oracle_sql machinery
    instantiated on document features; tails append their own SELECT.
    `prefix` renames every CTE ({prefix}pu, {prefix}w_t, ...) so the chain
    can be SPLICED into a WITH alongside the BT and lang-id chains without
    namespace collisions (rule 29 corollary); the default "" keeps the
    standalone oracles unchanged (modulo one inert `n` alias)."""
    q = prefix
    f1, f2, f3 = QC_FEATURES_SQL
    parts = [
        f"""WITH {q}pu AS MATERIALIZED (
        SELECT doc_id,
               ({f1})::BIGINT AS x1,
               ({f2})::BIGINT AS x2,
               ({f3})::BIGINT AS x3,
               ({QC_LABEL_SQL})::BIGINT AS y
        FROM documents
    ),
    {q}n AS (SELECT count(*)::BIGINT AS n FROM {q}pu),
    {q}w_0 AS (SELECT 0::BIGINT AS w0m, 0::BIGINT AS w1m,
                   0::BIGINT AS w2m, 0::BIGINT AS w3m)"""
    ]
    for t in range(1, QC_ITERS + 1):
        parts.append(
            f""",
    {q}z_{t} AS (
        SELECT p.doc_id, p.x1, p.x2, p.x3, p.y,
               (w.w0m + w.w1m * p.x1 + w.w2m * p.x2 + w.w3m * p.x3)::BIGINT
                   AS zm
        FROM {q}pu p CROSS JOIN {q}w_{t - 1} w
    ),
    {q}g_{t} AS (
        SELECT
            floor(sum(1.0 / (1.0 + exp(-(zm / 1000000.0))) - y) / n.n
                  * {QC_STEP_X1M} + 0.5)::BIGINT AS d0,
            floor(sum((1.0 / (1.0 + exp(-(zm / 1000000.0))) - y) * x1) / n.n
                  * {QC_STEP_X1M} + 0.5)::BIGINT AS d1,
            floor(sum((1.0 / (1.0 + exp(-(zm / 1000000.0))) - y) * x2) / n.n
                  * {QC_STEP_X1M} + 0.5)::BIGINT AS d2,
            floor(sum((1.0 / (1.0 + exp(-(zm / 1000000.0))) - y) * x3) / n.n
                  * {QC_STEP_X1M} + 0.5)::BIGINT AS d3
        FROM {q}z_{t} CROSS JOIN {q}n n GROUP BY n.n
    ),
    {q}w_{t} AS MATERIALIZED (
        SELECT w.w0m - g.d0 AS w0m, w.w1m - g.d1 AS w1m,
               w.w2m - g.d2 AS w2m, w.w3m - g.d3 AS w3m
        FROM {q}w_{t - 1} w CROSS JOIN {q}g_{t} g
    ),
    {q}m_{t} AS (
        SELECT {t}::BIGINT AS iteration, w.w0m, w.w1m, w.w2m, w.w3m,
               (sum(CASE WHEN (zm >= 0) = (y = 1) THEN 1 ELSE 0 END)
                   * 1000000 // count(*))::BIGINT AS accuracy_ppm,
               round(avg(ln(1.0 + exp(-(2 * y - 1) * (zm / 1000000.0)))), 6)
                   + 0.0 AS logloss
        FROM (
            SELECT p.y,
                   (w.w0m + w.w1m * p.x1 + w.w2m * p.x2 + w.w3m * p.x3)::BIGINT
                       AS zm
            FROM {q}pu p CROSS JOIN {q}w_{t} w
        ) q CROSS JOIN {q}w_{t} w
        GROUP BY w.w0m, w.w1m, w.w2m, w.w3m
    )"""
        )
    return "".join(parts)


def _qc_oracle_readout_sql() -> str:
    """corpus_quality_classifier's twin: the chain + per-iteration union."""
    union = " UNION ALL ".join(
        f"SELECT * FROM m_{t}" for t in range(1, QC_ITERS + 1)
    )
    return _qc_chain_sql() + f"\n    {union}"


_QC_WEIGHTS: dict = {}


def _qc_weights(spark: SparkSession, sf_dir: str):
    """Train the quality classifier once per (session, sf_dir): returns
    (pu_frame, trajectory) where trajectory[t] = (iteration, w0..w3,
    accuracy_ppm, logloss_float). Shared by corpus_quality_classifier and
    corpus_classifier_filter."""
    import math

    from ..session import ensure_checkpoint_dir

    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _QC_WEIGHTS:
        return _QC_WEIGHTS[key]
    ensure_checkpoint_dir(spark)
    d = load(spark, sf_dir, "documents")
    pu = d.select(
        "doc_id",
        F.expr(
            "size(array_distinct(split(text, ' '))) * 1000000L"
            " div size(split(text, ' ')) div 10000 - 50"
        ).alias("x1"),
        F.expr("n_chars div 100 - 3").alias("x2"),
        F.expr("size(split(text, ' ')) div 10 - 4").cast("long").alias("x3"),
        F.expr(
            "CASE WHEN cast(substring(source, 4) as int) % 2 = 0"
            " THEN 1 ELSE 0 END"
        ).cast("long").alias("y"),
    ).checkpoint(eager=True)
    n = pu.count()
    w = [0, 0, 0, 0]
    traj = []

    def _zm(wv):
        return (
            F.lit(wv[0])
            + F.lit(wv[1]) * F.col("x1")
            + F.lit(wv[2]) * F.col("x2")
            + F.lit(wv[3]) * F.col("x3")
        )

    def _grad_exprs(zm):
        p = 1.0 / (1.0 + F.exp(-(zm / 1000000.0)))
        return [
            F.sum(p - F.col("y")).alias("g0"),
            F.sum((p - F.col("y")) * F.col("x1")).alias("g1"),
            F.sum((p - F.col("y")) * F.col("x2")).alias("g2"),
            F.sum((p - F.col("y")) * F.col("x3")).alias("g3"),
        ]

    def _metric_exprs(zm):
        return [
            F.sum(
                F.when((zm >= 0) == (F.col("y") == 1), 1).otherwise(0)
            ).alias("correct"),
            F.count(F.lit(1)).alias("cnt"),
            F.avg(
                F.log(1.0 + F.exp(-(2 * F.col("y") - 1) * (zm / 1000000.0)))
            ).alias("ll"),
        ]

    # Step t's post-update metrics and step t+1's gradient are BOTH
    # evaluated at the same weight vector, so they fuse into ONE aggregate
    # pass over the checkpointed feature frame (guide §1.2: fewer full
    # passes): QC_ITERS+1 jobs instead of 2*QC_ITERS. Each sum is the same
    # independent aggregate expression as before — per-column float fold
    # order within a job is unchanged, and the micro-unit quantizer already
    # absorbs engine fold-order noise (the DuckDB twin sums in its own
    # order and hash-matches).
    g = pu.agg(*_grad_exprs(_zm(w))).collect()[0]
    for t in range(1, QC_ITERS + 1):
        for k in range(4):
            w[k] -= math.floor(g[f"g{k}"] / n * QC_STEP_X1M + 0.5)
        zm2 = _zm(w)
        if t < QC_ITERS:
            row = pu.agg(*_metric_exprs(zm2), *_grad_exprs(zm2)).collect()[0]
            g = row
        else:
            row = pu.agg(*_metric_exprs(zm2)).collect()[0]
        traj.append(
            (
                t,
                w[0],
                w[1],
                w[2],
                w[3],
                row["correct"] * 1_000_000 // row["cnt"],
                float(row["ll"]),
            )
        )
    _QC_WEIGHTS[key] = (pu, traj)
    return _QC_WEIGHTS[key]


@query(
    "corpus_quality_classifier",
    oracle=_qc_oracle_readout_sql(),
    tags=("llm", "corpus", "ml"),
)
def corpus_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet-style QUALITY CLASSIFIER trained in-engine — the second
    consumer of the ml_logreg_train machinery (PARITY rule 29) and the
    named stage of corpus curation it exists for: learn to separate a
    'curated' source set from the rest using stated text features
    (lexical-diversity percent, length decile, token-count decile — all
    integer-centered, never fitted), then ship per-iteration weights,
    training accuracy and log-loss so the gate's operating point is
    auditable. In production the label is wiki-vs-crawl; here it is the
    even-numbered sources — stated, deterministic, and enough to prove
    the training loop end-to-end.

    MICRO-QUANTIZED integer weights (delta = floor(mean_grad *
    QC_STEP_X1M + 0.5)) make the trajectory exact BIGINTs; accuracy
    reads the SIGN of the exact integer logit; log-loss is the only
    float, aggregate-rounded 6dp. Execution is the treeAggregate loop:
    the checkpointed doc-feature frame, one distributed gradient
    aggregate per step, O(features) driver state.

    At 100 TB: the feature build is the only corpus pass; QC_ITERS * 2
    aggregates over the checkpointed frame."""
    _, traj = _qc_weights(spark, sf_dir)
    out = spark.createDataFrame(
        traj,
        "iteration long, w0m long, w1m long, w2m long, w3m long,"
        " accuracy_ppm long, ll double",
    )
    return out.select(
        "iteration",
        "w0m",
        "w1m",
        "w2m",
        "w3m",
        "accuracy_ppm",
        (F.round(F.col("ll"), 6) + F.lit(0.0)).alias("logloss"),
    )


KN_D_X100 = 75   # Kneser-Ney absolute discount d = 0.75, carried x100
KN_TOP_N = 200   # emit the top-N bigrams by count (deterministic tie-break)


@query(
    "text_kneser_ney",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    bi AS (
        SELECT ws[i] AS w1, ws[i + 1] AS w2
        FROM toks, unnest(generate_series(1, len(ws) - 1)) t(i)
    ),
    c2 AS (SELECT w1, w2, count(*)::BIGINT AS c FROM bi GROUP BY w1, w2),
    c1 AS (SELECT w1, sum(c)::BIGINT AS c1, count(*)::BIGINT AS fanout
           FROM c2 GROUP BY w1),
    cont AS (SELECT w2, count(*)::BIGINT AS n_hist FROM c2 GROUP BY w2),
    types AS (SELECT count(*)::BIGINT AS n_types FROM c2),
    scored AS (
        SELECT c2.w1, c2.w2, c2.c, c1.c1, c1.fanout, ct.n_hist, ty.n_types,
               round(greatest(c2.c - {KN_D_X100} / 100.0, 0.0) / c1.c1
                     + ({KN_D_X100} / 100.0) * c1.fanout / c1.c1
                       * ct.n_hist / ty.n_types, 6) + 0.0 AS p_kn,
               row_number() OVER (ORDER BY c2.c DESC, c2.w1 ASC, c2.w2 ASC)
                   AS rnk
        FROM c2
        JOIN c1 ON c1.w1 = c2.w1
        JOIN cont ct ON ct.w2 = c2.w2
        CROSS JOIN types ty
    )
    SELECT w1, w2, c AS bigram_count, c1 AS w1_count,
           n_hist AS continuation_types, p_kn
    FROM scored WHERE rnk <= {KN_TOP_N}
    """,
    tags=("llm", "text", "lm"),
)
def text_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney smoothed bigram LM — THE standard n-gram smoothing
    (text_ngram_lm ships raw MLE bigrams; every deployed n-gram model
    interpolates): p_KN(w2|w1) = max(c(w1w2) - d, 0)/c(w1) +
    d*fanout(w1)/c(w1) * p_cont(w2), where the continuation probability
    p_cont(w2) = |{{w: c(w,w2)>0}}| / |bigram types| asks how many
    CONTEXTS a word completes rather than how often it occurs — the
    insight that makes KN the default. Every ingredient is a relational
    count: the bigram table, per-head totals and fanouts, per-tail
    continuation types, the global type count — four partial aggs and
    two equi-joins over the VOCAB-SIZED bigram table (never the corpus).

    Exactness: all counts exact BIGINTs; d is the stated x100 integer
    constant; p_KN is a rational of exact ints evaluated per bigram-type
    row, rounded 6dp (rules 1/6/8). Top-N emission by (count desc, w1,
    w2) — the only global window runs over the bigram-type table and is
    WindowGroupLimit-prunable.

    At 100 TB: one corpus explode folds map-side to bigram types; the
    model algebra never touches row data again (the BPE-pairs scale
    argument)."""
    d = load(spark, sf_dir, "documents")
    bi = (
        d.select(F.split("text", " ").alias("ws"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1),"
                    " i -> struct(ws[i - 1] AS w1, ws[i] AS w2))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
    )
    c2 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    c1 = c2.groupBy("w1").agg(
        F.sum("c").alias("c1"), F.count(F.lit(1)).alias("fanout")
    )
    cont = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("n_hist"))
    types = c2.agg(F.count(F.lit(1)).alias("n_types"))
    d_disc = KN_D_X100 / 100.0
    scored = (
        c2.join(c1, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(types))
        .select(
            "w1",
            "w2",
            "c",
            "c1",
            "n_hist",
            (
                F.round(
                    F.greatest(F.col("c") - d_disc, F.lit(0.0)) / F.col("c1")
                    + d_disc
                    * F.col("fanout")
                    / F.col("c1")
                    * F.col("n_hist")
                    / F.col("n_types"),
                    6,
                )
                + F.lit(0.0)
            ).alias("p_kn"),
        )
    )
    wr = Window.orderBy(F.col("c").desc(), F.col("w1").asc(), F.col("w2").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= KN_TOP_N)
        .select(
            "w1",
            "w2",
            F.col("c").alias("bigram_count"),
            F.col("c1").alias("w1_count"),
            F.col("n_hist").alias("continuation_types"),
            "p_kn",
        )
    )


@query(
    "eval_langid_kappa",
    oracle=_lang_id_chain_sql()
    + """,
    conf AS (
        SELECT lang, pred_lang, count(*)::BIGINT AS n
        FROM pick GROUP BY lang, pred_lang
    ),
    tot AS (SELECT sum(n)::BIGINT AS nn FROM conf),
    diag AS (SELECT sum(CASE WHEN lang = pred_lang THEN n ELSE 0 END)::BIGINT
                 AS agree FROM conf),
    rows_m AS (SELECT lang AS cl, sum(n)::BIGINT AS rn FROM conf GROUP BY lang),
    cols_m AS (SELECT pred_lang AS cl, sum(n)::BIGINT AS cn
               FROM conf GROUP BY pred_lang),
    chance AS (
        SELECT sum(r.rn * c.cn)::BIGINT AS cross_sum
        FROM rows_m r JOIN cols_m c ON c.cl = r.cl
    )
    SELECT t.nn AS n, d.agree,
           (d.agree * 1000000 // t.nn)::BIGINT AS po_ppm,
           (ch.cross_sum * 1000000 // (t.nn * t.nn))::BIGINT AS pe_ppm,
           round((d.agree::DOUBLE / t.nn - ch.cross_sum::DOUBLE / (t.nn * t.nn))
                 / nullif(1.0 - ch.cross_sum::DOUBLE / (t.nn * t.nn), 0), 6)
               + 0.0 AS kappa
    FROM tot t CROSS JOIN diag d CROSS JOIN chance ch
    """,
    tags=("llm", "eval", "ml"),
)
def eval_langid_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa over the language-ID confusion matrix (the
    model-consuming sibling of eval_cohens_kappa's rule-based raters) — agreement
    beyond chance between the classifier and the label, the metric that
    keeps a majority-class-heavy accuracy honest (text_lang_id's ~47%
    accuracy sits just above the 43.6% majority share; kappa strips the
    chance agreement that inflates both). kappa = (p_o - p_e)/(1 - p_e)
    with p_o = diagonal mass and p_e = sum of row x column marginal
    products — every ingredient an exact BIGINT fold over the
    |langs|^2-row confusion frame, the third consumer of the shared
    _lang_id_model / _lang_id_pick path (one model, one argmax — the
    metric audits exactly what the classifier ships).

    p_o/p_e ship as exact integer ppm (rule 25); kappa is a rational of
    exact ints evaluated in the 1-row readout, 6dp (rules 1/6/8).

    At 100 TB: the classifier's one corpus pass (shared per session via
    the _lang_id_scored memo), then arithmetic on |langs|^2 rows."""
    pick = _lang_id_scored(spark, sf_dir)
    conf = pick.groupBy("lang", "pred_lang").agg(F.count(F.lit(1)).alias("n"))
    tot = conf.agg(F.sum("n").alias("nn"))
    diag = conf.agg(
        F.sum(
            F.when(F.col("lang") == F.col("pred_lang"), F.col("n")).otherwise(0)
        ).alias("agree")
    )
    rows_m = conf.groupBy(F.col("lang").alias("cl")).agg(F.sum("n").alias("rn"))
    cols_m = conf.groupBy(F.col("pred_lang").alias("cl")).agg(
        F.sum("n").alias("cn")
    )
    chance = rows_m.join(cols_m, "cl").agg(
        F.sum(F.col("rn") * F.col("cn")).alias("cross_sum")
    )
    po = F.col("agree").cast("double") / F.col("nn")
    pe = F.col("cross_sum").cast("double") / (F.col("nn") * F.col("nn"))
    return (
        tot.crossJoin(F.broadcast(diag))
        .crossJoin(F.broadcast(chance))
        .select(
            F.col("nn").alias("n"),
            "agree",
            F.expr("agree * 1000000 div nn").alias("po_ppm"),
            F.expr("cross_sum * 1000000 div (nn * nn)").alias("pe_ppm"),
            (
                F.round((po - pe) / F.nullif(F.lit(1.0) - pe, F.lit(0.0)), 6)
                + F.lit(0.0)
            ).alias("kappa"),
        )
    )


def _qc_filter_oracle_sql() -> str:
    """corpus_classifier_filter's twin: the GD chain + the filter tail —
    per-doc exact integer logit from the final weights, threshold and
    md5-uniform rejection-sampling verdicts, per-source ledger."""
    t = QC_ITERS
    f1, f2, f3 = QC_FEATURES_SQL
    return (
        _qc_chain_sql()
        + f""",
    scored AS (
        SELECT d.source,
               (w.w0m + w.w1m * ({f1}) + w.w2m * ({f2})
                + w.w3m * ({f3}))::BIGINT AS zm,
               (CAST(('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8)) AS BIGINT)
                   % 1000000)::BIGINT AS u_ppm
        FROM documents d CROSS JOIN w_{t} w
    ),
    verdicts AS (
        SELECT source, zm, u_ppm,
               (zm >= 0) AS keep_threshold,
               (u_ppm < floor(1000000.0
                   / (1.0 + exp(-(zm / 1000000.0))))::BIGINT)
                   AS keep_sampled
        FROM scored
    )
    SELECT source, count(*)::BIGINT AS n_docs,
           sum(CASE WHEN keep_threshold THEN 1 ELSE 0 END)::BIGINT
               AS kept_threshold,
           sum(CASE WHEN keep_sampled THEN 1 ELSE 0 END)::BIGINT
               AS kept_sampled,
           (sum(CASE WHEN keep_sampled THEN 1 ELSE 0 END) * 1000000
               // count(*))::BIGINT AS kept_sampled_ppm
    FROM verdicts GROUP BY source"""
    )


@query(
    "corpus_classifier_filter",
    oracle=_qc_filter_oracle_sql(),
    tags=("llm", "corpus", "ml"),
)
def corpus_classifier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-guided corpus filtering — the stage AFTER
    corpus_quality_classifier trains (CCNet keeps a crawl document with
    probability given by the quality model; a hard threshold is the
    blunter production alternative — this op ships BOTH verdicts so the
    ledger shows what each policy would keep): per document, the exact
    integer logit from the memoized final weights (_qc_weights — one
    training run per session), a threshold keep (logit >= 0), and a
    DETERMINISTIC rejection-sampling keep (md5-uniform ppm of doc_id <
    quantized sigmoid ppm — the suite's seedless uniform, so re-running
    the filter reproduces the corpus exactly; a random coin would not).
    Per-source ledger with exact kept ppm.

    Cross-engine: the logit is exact BIGINT (integer weights x integer
    features); the acceptance probability is floor(1e6 * sigmoid(zm/1e6))
    — one quantized libm value per distinct logit (rule 29's
    quantize-the-model discipline), compared against an exact integer
    uniform, so the verdict is an integer comparison on both engines.

    At 100 TB: scoring is one map-side pass with the 4 weights as
    literals; the ledger is one partial agg. The training cost was paid
    once by the memo."""
    _, traj = _qc_weights(spark, sf_dir)
    w = traj[-1][1:5]
    d = load(spark, sf_dir, "documents")
    zm = (
        F.lit(w[0])
        + F.lit(w[1]) * F.expr(
            "size(array_distinct(split(text, ' '))) * 1000000L"
            " div size(split(text, ' ')) div 10000 - 50"
        )
        + F.lit(w[2]) * F.expr("n_chars div 100 - 3")
        + F.lit(w[3]) * F.expr("size(split(text, ' ')) div 10 - 4")
    ).cast("long")
    u_ppm = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 1000000
    )
    p_ppm = F.floor(
        1000000.0 / (1.0 + F.exp(-(zm.cast("double") / 1000000.0)))
    ).cast("long")
    scored = d.select(
        "source",
        zm.alias("zm"),
        u_ppm.alias("u_ppm"),
        (zm >= 0).alias("keep_threshold"),
        (u_ppm < p_ppm).alias("keep_sampled"),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("keep_threshold"), 1).otherwise(0)).alias(
            "kept_threshold"
        ),
        F.sum(F.when(F.col("keep_sampled"), 1).otherwise(0)).alias(
            "kept_sampled"
        ),
        F.expr(
            "sum(CASE WHEN keep_sampled THEN 1 ELSE 0 END) * 1000000"
            " div count(*)"
        ).alias("kept_sampled_ppm"),
    )


def _qc_mcc_oracle_sql() -> str:
    """eval_mcc's twin: the GD chain + the confusion/MCC tail at the
    sign-of-logit threshold."""
    t = QC_ITERS
    f1, f2, f3 = QC_FEATURES_SQL
    return (
        _qc_chain_sql()
        + f""",
    scored AS (
        SELECT ({QC_LABEL_SQL})::BIGINT AS y,
               CASE WHEN (w.w0m + w.w1m * ({f1}) + w.w2m * ({f2})
                          + w.w3m * ({f3})) >= 0 THEN 1 ELSE 0 END AS yhat
        FROM documents d CROSS JOIN w_{t} w
    ),
    conf AS (
        SELECT sum(CASE WHEN y = 1 AND yhat = 1 THEN 1 ELSE 0 END)::BIGINT AS tp,
               sum(CASE WHEN y = 0 AND yhat = 1 THEN 1 ELSE 0 END)::BIGINT AS fp,
               sum(CASE WHEN y = 0 AND yhat = 0 THEN 1 ELSE 0 END)::BIGINT AS tn,
               sum(CASE WHEN y = 1 AND yhat = 0 THEN 1 ELSE 0 END)::BIGINT AS fn
        FROM scored
    )
    SELECT tp, fp, tn, fn,
           ((tp + tn) * 1000000 // (tp + fp + tn + fn))::BIGINT
               AS accuracy_ppm,
           round((tp::DOUBLE * tn - fp::DOUBLE * fn)
                 / nullif(sqrt((tp + fp)::DOUBLE) * sqrt((tp + fn)::DOUBLE)
                          * sqrt((tn + fp)::DOUBLE) * sqrt((tn + fn)::DOUBLE),
                          0), 6) + 0.0 AS mcc
    FROM conf"""
    )


@query(
    "eval_mcc",
    oracle=_qc_mcc_oracle_sql(),
    tags=("llm", "eval", "ml"),
)
def eval_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient of the quality classifier — the
    single-number confusion summary that stays honest under class
    imbalance where accuracy and even F1 mislead (a classifier that
    labels everything 'curated' scores 50% accuracy here but MCC 0):
    MCC = (TP*TN - FP*FN) / sqrt((TP+FP)(TP+FN)(TN+FP)(TN+FN)), computed
    at corpus_quality_classifier's sign-of-logit operating point from
    the memoized final weights (_qc_weights — consumer #3 of one
    training run; the threshold ledger in corpus_classifier_filter and
    this metric audit the SAME decision boundary).

    Exactness: the confusion cells are exact BIGINT folds of integer
    comparisons (integer weights x integer features, sign threshold);
    accuracy ships as exact ppm (rule 25); MCC is a rational of exact
    ints in the 1-row readout, 6dp — the denominator multiplies FOUR
    sqrt factors instead of sqrt of the product so the 4-way BIGINT
    product cannot overflow (each factor <= N => product <= N^4 ~ 1e24
    at N = 10^6 would overflow; four doubles do not).

    At 100 TB: one map-side scoring pass + one fold."""
    _, traj = _qc_weights(spark, sf_dir)
    w = traj[-1][1:5]
    d = load(spark, sf_dir, "documents")
    zm = (
        F.lit(w[0])
        + F.lit(w[1]) * F.expr(
            "size(array_distinct(split(text, ' '))) * 1000000L"
            " div size(split(text, ' ')) div 10000 - 50"
        )
        + F.lit(w[2]) * F.expr("n_chars div 100 - 3")
        + F.lit(w[3]) * F.expr("size(split(text, ' ')) div 10 - 4")
    )
    y = F.expr(
        "CASE WHEN cast(substring(source, 4) as int) % 2 = 0 THEN 1 ELSE 0 END"
    )
    scored = d.select(
        y.alias("y"), F.when(zm >= 0, 1).otherwise(0).alias("yhat")
    )
    conf = scored.agg(
        F.sum(F.when((F.col("y") == 1) & (F.col("yhat") == 1), 1).otherwise(0)).alias("tp"),
        F.sum(F.when((F.col("y") == 0) & (F.col("yhat") == 1), 1).otherwise(0)).alias("fp"),
        F.sum(F.when((F.col("y") == 0) & (F.col("yhat") == 0), 1).otherwise(0)).alias("tn"),
        F.sum(F.when((F.col("y") == 1) & (F.col("yhat") == 0), 1).otherwise(0)).alias("fn"),
    )
    mcc = (
        F.col("tp").cast("double") * F.col("tn")
        - F.col("fp").cast("double") * F.col("fn")
    ) / F.nullif(
        F.sqrt((F.col("tp") + F.col("fp")).cast("double"))
        * F.sqrt((F.col("tp") + F.col("fn")).cast("double"))
        * F.sqrt((F.col("tn") + F.col("fp")).cast("double"))
        * F.sqrt((F.col("tn") + F.col("fn")).cast("double")),
        F.lit(0.0),
    )
    return conf.select(
        "tp",
        "fp",
        "tn",
        "fn",
        F.expr("(tp + tn) * 1000000 div (tp + fp + tn + fn)").alias(
            "accuracy_ppm"
        ),
        (F.round(mcc, 6) + F.lit(0.0)).alias("mcc"),
    )


HEAPS_CHECKPOINTS = 10  # vocab-growth curve sampled at doc-count deciles
HEAPS_RANGE_BUCKETS = 256  # doc_id range-exchange width for the distributed
                           # rank (VERDICT r11 item 1); widen as corpus grows


@query(
    "text_heaps_law",
    oracle=f"""
    WITH docs_o AS (
        SELECT doc_id, text,
               row_number() OVER (ORDER BY doc_id) AS rn,
               count(*) OVER ()::BIGINT AS nd
        FROM documents
    ),
    ck AS (
        SELECT rn, text,
               least(((rn - 1) * {HEAPS_CHECKPOINTS}) // nd + 1,
                     {HEAPS_CHECKPOINTS})::BIGINT AS cp
        FROM docs_o
    ),
    toks AS (
        SELECT cp, rn, unnest(string_split(text, ' ')) AS w FROM ck
    ),
    tok_per_cp AS (
        SELECT cp, count(*)::BIGINT AS toks FROM toks GROUP BY cp
    ),
    first_seen AS (
        SELECT w, min(cp)::BIGINT AS first_cp, count(*)::BIGINT AS total_occ
        FROM toks GROUP BY w
    ),
    new_vocab AS (
        SELECT first_cp AS cp, count(*)::BIGINT AS new_words
        FROM first_seen GROUP BY first_cp
    ),
    hapax_global AS (
        SELECT first_cp AS cp, count(*)::BIGINT AS hapax_here
        FROM first_seen WHERE total_occ = 1 GROUP BY first_cp
    ),
    curve AS (
        SELECT t.cp,
               sum(t.toks) OVER w::BIGINT AS cum_tokens,
               sum(COALESCE(nv.new_words, 0)) OVER w::BIGINT AS cum_vocab,
               sum(COALESCE(hg.hapax_here, 0)) OVER w::BIGINT AS cum_hapax
        FROM tok_per_cp t
        LEFT JOIN new_vocab nv ON nv.cp = t.cp
        LEFT JOIN hapax_global hg ON hg.cp = t.cp
        WINDOW w AS (ORDER BY t.cp
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    fit AS (
        SELECT count(*)::BIGINT AS k,
               sum(ln(cum_tokens::DOUBLE)) AS sx,
               sum(ln(cum_vocab::DOUBLE)) AS sy,
               sum(ln(cum_tokens::DOUBLE) * ln(cum_tokens::DOUBLE)) AS sxx,
               sum(ln(cum_tokens::DOUBLE) * ln(cum_vocab::DOUBLE)) AS sxy
        FROM curve
    )
    SELECT c.cp AS checkpoint, c.cum_tokens, c.cum_vocab, c.cum_hapax,
           round((f.k * f.sxy - f.sx * f.sy)
                 / nullif(f.k * f.sxx - f.sx * f.sx, 0), 6) + 0.0
               AS heaps_beta,
           round(exp((f.sy - (f.k * f.sxy - f.sx * f.sy)
                      / nullif(f.k * f.sxx - f.sx * f.sx, 0) * f.sx) / f.k),
                 4) + 0.0 AS heaps_k
    FROM curve c CROSS JOIN fit f
    """,
    tags=("llm", "text", "corpus"),
)
def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve — the corpus statistic that
    predicts how the VOCAB (and so every vocab-sized model frame: BPE
    pair tables, NB profiles, bigram types) scales with corpus size:
    V(n) ~ K * n^beta. Sampled at HEAPS_CHECKPOINTS doc-count deciles in
    deterministic doc_id order (stated), with the cumulative hapax count
    (words seen exactly once corpus-wide, attributed to the checkpoint of
    their first occurrence) riding the same curve — the text_zipf_fit
    complement: Zipf describes the frequency SPECTRUM, Heaps the growth.

    The naive curve recomputes count(DISTINCT word) per prefix (quadratic
    in checkpoints); this op derives each word's FIRST-SEEN checkpoint
    once (the agg_distinct_growth decomposition applied to vocabulary) so
    cumulative vocab is a prefix sum over |checkpoints| rows. The log-log
    OLS fit for (K, beta) folds from the 10-point curve — exact BIGINT
    curve columns, the fit floats evaluated in the 1-row fold only
    (6dp/4dp, rules 1/6/8).

    Honest fixture note: the synthetic 31-word vocabulary saturates at
    the first checkpoint, so the fitted beta is exactly 0 here — the op
    ships the mechanism; a natural corpus yields beta ~ 0.5.

    At 100 TB: one corpus explode folds map-side to (word, first_cp,
    total_occ); everything after runs on |vocab|- then |checkpoints|-row
    frames. The doc_id rank itself is DISTRIBUTED (VERDICT r11 item 1 —
    the registered plan used to be a single unpartitioned
    Window.orderBy(doc_id) with the text payload riding through one
    reducer): `corpus_global_shuffle`'s range-exchange applied to an
    ordered key — doc_ids range-bucket by a monotone width derived from
    one broadcast (count, min, max) fold, per-bucket counts become
    broadcast cumulative offsets over the ≤HEAPS_RANGE_BUCKETS-row bucket
    support, and rn = offset + row_number() PARTITIONED by bucket over a
    doc_id-only frame; text joins back on doc_id afterwards. Plan-pinned
    in tests/test_plans.py (every row_number partitioned, no corpus-sized
    sort); the cp labels are the same pure function of doc_id order, so
    the oracle hash is unchanged."""
    d = load(spark, sf_dir, "documents")
    stats = d.agg(
        F.count(F.lit(1)).alias("nd"),
        F.min("doc_id").alias("mn"),
        F.max("doc_id").alias("mx"),
    )
    slim = d.select("doc_id").crossJoin(F.broadcast(stats))
    bucketed = slim.withColumn(
        "bucket",
        F.expr(
            f"(doc_id - mn) div (((mx - mn) div {HEAPS_RANGE_BUCKETS}) + 1)"
        ),
    )
    woff = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    off = (
        bucketed.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("b_n"))
        .select(
            "bucket", (F.sum("b_n").over(woff) - F.col("b_n")).alias("cum_before")
        )
    )
    wrng = Window.partitionBy("bucket").orderBy("doc_id")
    ranked = bucketed.join(F.broadcast(off), "bucket").select(
        "doc_id",
        "nd",
        (F.col("cum_before") + F.row_number().over(wrng)).alias("rn"),
    )
    ck = d.select("doc_id", "text").join(ranked, "doc_id").select(
        "text",
        F.least(
            F.expr(f"((rn - 1) * {HEAPS_CHECKPOINTS}) div nd + 1"),
            F.lit(HEAPS_CHECKPOINTS).cast("long"),
        )
        .cast("long")
        .alias("cp"),
    )
    toks = ck.select("cp", F.explode(F.split("text", " ")).alias("w"))
    tok_per_cp = toks.groupBy("cp").agg(F.count(F.lit(1)).alias("toks"))
    first_seen = toks.groupBy("w").agg(
        F.min("cp").alias("first_cp"), F.count(F.lit(1)).alias("total_occ")
    )
    new_vocab = first_seen.groupBy(F.col("first_cp").alias("cp")).agg(
        F.count(F.lit(1)).alias("new_words")
    )
    hapax = (
        first_seen.filter(F.col("total_occ") == 1)
        .groupBy(F.col("first_cp").alias("cp"))
        .agg(F.count(F.lit(1)).alias("hapax_here"))
    )
    wcum = Window.orderBy("cp").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = (
        tok_per_cp.join(new_vocab, "cp", "left")
        .join(hapax, "cp", "left")
        .select(
            "cp",
            F.sum("toks").over(wcum).alias("cum_tokens"),
            F.sum(F.coalesce(F.col("new_words"), F.lit(0)))
            .over(wcum)
            .alias("cum_vocab"),
            F.sum(F.coalesce(F.col("hapax_here"), F.lit(0)))
            .over(wcum)
            .alias("cum_hapax"),
        )
    )
    lx = F.log(F.col("cum_tokens").cast("double"))
    ly = F.log(F.col("cum_vocab").cast("double"))
    fit = curve.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(lx).alias("sx"),
        F.sum(ly).alias("sy"),
        F.sum(lx * lx).alias("sxx"),
        F.sum(lx * ly).alias("sxy"),
    )
    beta = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.nullif(
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)
    )
    return curve.crossJoin(F.broadcast(fit)).select(
        F.col("cp").alias("checkpoint"),
        "cum_tokens",
        "cum_vocab",
        "cum_hapax",
        (F.round(beta, 6) + F.lit(0.0)).alias("heaps_beta"),
        (
            F.round(
                F.exp((F.col("sy") - beta * F.col("sx")) / F.col("k")), 4
            )
            + F.lit(0.0)
        ).alias("heaps_k"),
    )


# --- round 12: the curated-corpus selector (three trained artifacts, one op) --

CURATED_BUDGET_DOCS = 200  # total selection budget; per-source quota =
                           # floor(mix_weight_ppm * budget / 1e6) (stated)


def _curated_select_oracle_sql() -> str:
    """corpus_curated_select's twin: the BT chain, the QC chain (spliced
    under the qc_ prefix), and the lang-id chain in ONE WITH — the rule-29
    splicing corollary exercised across all three trained artifacts — plus
    the quota/rank/ledger tail."""
    from .ml_eval import BT_ITERS, _bt_chain_sql

    f1, f2, f3 = QC_FEATURES_SQL
    bt = _bt_chain_sql()
    qc = _qc_chain_sql(prefix="qc_")
    assert qc.startswith("WITH ")
    lid = _lang_id_chain_sql()
    head = lid.index("WITH ") + len("WITH ")
    return (
        bt
        + ",\n    "
        + qc[len("WITH "):]
        + ","
        + lid[head:]
        + f""",
    cc_wq AS (
        SELECT item, floor(exp(sm / 1000000.0) * 1000000)::BIGINT AS w_x1m
        FROM s_{BT_ITERS}
    ),
    cc_tot AS (SELECT sum(w_x1m)::BIGINT AS tw FROM cc_wq),
    cc_mixq AS (
        SELECT item AS source,
               (w_x1m * 1000000 // t.tw)::BIGINT AS mix_weight_ppm,
               ((w_x1m * 1000000 // t.tw) * {CURATED_BUDGET_DOCS}
                // 1000000)::BIGINT AS quota_docs
        FROM cc_wq CROSS JOIN cc_tot t
    ),
    cc_scored AS (
        SELECT d.doc_id, d.source,
               len(string_split(d.text, ' '))::BIGINT AS n_tokens,
               (w.w0m + w.w1m * ({f1}) + w.w2m * ({f2})
                + w.w3m * ({f3}))::BIGINT AS zm
        FROM documents d CROSS JOIN qc_w_{QC_ITERS} w
    ),
    cc_eligible AS (
        SELECT s.source, s.doc_id, s.n_tokens, s.zm,
               row_number() OVER (PARTITION BY s.source
                                  ORDER BY s.zm DESC, s.doc_id ASC) AS rk
        FROM cc_scored s JOIN pick p ON p.doc_id = s.doc_id
        WHERE p.pred_lang = p.lang
    )
    SELECT e.source, m.mix_weight_ppm, m.quota_docs,
           count(*)::BIGINT AS n_eligible,
           sum(CASE WHEN e.rk <= m.quota_docs THEN 1 ELSE 0 END)::BIGINT
               AS n_selected,
           sum(CASE WHEN e.rk <= m.quota_docs THEN e.n_tokens ELSE 0 END)::BIGINT
               AS selected_tokens,
           COALESCE(min(CASE WHEN e.rk <= m.quota_docs THEN e.zm END),
                    0)::BIGINT AS bar_logit_micro
    FROM cc_eligible e JOIN cc_mixq m ON m.source = e.source
    GROUP BY e.source, m.mix_weight_ppm, m.quota_docs"""
    )


@query(
    "corpus_curated_select",
    oracle=_curated_select_oracle_sql(),
    tags=("llm", "corpus", "ml", "flagship"),
)
def corpus_curated_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curated-corpus selector — the op that turns the session's THREE
    trained artifacts into one training subset (VERDICT r11 item 6,
    closing the RLHF data loop): Bradley-Terry mix weights set per-source
    QUOTAS, the quality classifier ranks each source's documents, and the
    lang-id model gates contamination — best-of-n selection under a
    reward-model-derived budget, the shape an RLHF data pipeline actually
    runs between reward fitting and SFT.

    Semantics (all stated): a document is ELIGIBLE iff the NB lang-id
    model predicts its labeled language (the eval_langid_kappa agreement
    gate); each BT-ranked source gets quota_docs = floor(mix_weight_ppm *
    CURATED_BUDGET_DOCS / 1e6) (exact integer arithmetic on the memoized
    softmax ppm — corpus_reward_mix's numbers verbatim); within a source,
    eligible docs rank by exact integer QC logit DESC (doc_id ASC ties)
    and the top quota_docs are selected. Ledger per source: quota, pool
    size, selection count/tokens, and the acceptance bar (min selected
    logit; 0 when nothing selected, disambiguated by n_selected = 0).

    All three artifacts ride their session memos (_bt_strengths,
    _qc_weights, _lang_id_model) — zero additional training cost — and
    the DuckDB twin SPLICES all three generated chains into one WITH
    (the rule-29 namespace-disjointness corollary, exercised three-wide
    for the first time: BT unprefixed, QC under qc_, lang-id's own
    names).

    At 100 TB: scoring is one map-side pass (4 integer weights as
    literals); the lang-id join carries (doc_id, verdict) partials; the
    per-source rank window is PARTITIONED by source with quota-bounded
    consumption, and the ledger is one partial agg. Nothing new scales
    super-linearly; the training passes were paid once."""
    import math as _math

    from .ml_eval import _bt_strengths

    _, items, s, _ = _bt_strengths(spark, sf_dir)
    wq = {it: _math.floor(_math.exp(s[it] / 1e6) * 1e6) for it in items}
    tw = sum(wq.values())
    mixppm = {it: wq[it] * 1_000_000 // tw for it in items}
    quota = {
        it: mixppm[it] * CURATED_BUDGET_DOCS // 1_000_000 for it in items
    }
    _, qtraj = _qc_weights(spark, sf_dir)
    w = qtraj[-1][1:5]
    d = load(spark, sf_dir, "documents")
    pick = _lang_id_scored(spark, sf_dir)
    zm = (
        F.lit(w[0])
        + F.lit(w[1]) * F.expr(
            "size(array_distinct(split(text, ' '))) * 1000000L"
            " div size(split(text, ' ')) div 10000 - 50"
        )
        + F.lit(w[2]) * F.expr("n_chars div 100 - 3")
        + F.lit(w[3]) * F.expr("size(split(text, ' ')) div 10 - 4")
    ).cast("long")
    scored = d.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        zm.alias("zm"),
    )
    eligible = scored.join(
        pick.filter(F.col("pred_lang") == F.col("lang")).select("doc_id"),
        "doc_id",
    )
    qf = spark.createDataFrame(
        [(it, mixppm[it], quota[it]) for it in items],
        "source string, mix_weight_ppm long, quota_docs long",
    )
    wsel = Window.partitionBy("source").orderBy(
        F.col("zm").desc(), F.col("doc_id").asc()
    )
    ranked = eligible.join(F.broadcast(qf), "source").withColumn(
        "rk", F.row_number().over(wsel)
    )
    sel = F.col("rk") <= F.col("quota_docs")
    return ranked.groupBy("source", "mix_weight_ppm", "quota_docs").agg(
        F.count(F.lit(1)).alias("n_eligible"),
        F.sum(F.when(sel, 1).otherwise(0)).alias("n_selected"),
        F.sum(F.when(sel, F.col("n_tokens")).otherwise(0)).alias(
            "selected_tokens"
        ),
        F.coalesce(F.min(F.when(sel, F.col("zm"))), F.lit(0)).alias(
            "bar_logit_micro"
        ),
    )


# --- round 12: term burstiness (templated-text detector) -----------------------

BURSTY_TOP_TERMS = 30  # rank the VMR readout over the corpus's head terms


@query(
    "text_burstiness",
    oracle=f"""
    WITH percell AS (
        SELECT doc_id, term, count(*)::BIGINT AS k
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents)
        GROUP BY doc_id, term
    ),
    stats AS (
        SELECT term, sum(k)::BIGINT AS tot, sum(k * k)::BIGINT AS skk,
               count(*)::BIGINT AS df
        FROM percell GROUP BY term
    ),
    nd AS (SELECT count(*)::BIGINT AS n FROM documents),
    ranked AS (
        SELECT term, tot, skk, df,
               row_number() OVER (ORDER BY tot DESC, term ASC) AS rank
        FROM stats
    )
    SELECT r.rank, r.term, r.tot AS total_occ, r.df AS n_docs_with,
           (r.df * 1000000 // nd.n)::BIGINT AS df_ppm,
           round((r.skk::DOUBLE / nd.n - pow(r.tot::DOUBLE / nd.n, 2))
                 / nullif(r.tot::DOUBLE / nd.n, 0), 4) + 0.0 AS vmr
    FROM ranked r CROSS JOIN nd
    WHERE r.rank <= {BURSTY_TOP_TERMS}
    """,
    tags=("llm", "text", "corpus"),
)
def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness (variance-to-mean ratio) over the corpus's head
    terms — the Church-Gale contagion diagnostic a curation pipeline runs
    to catch TEMPLATED text: natural-language content words are bursty
    (a doc that uses a term once tends to use it again, VMR >> 1) while
    boilerplate tokens spread Poisson-like (VMR ~= 1), and a head term
    whose VMR collapses between crawls signals template injection
    (text_zipf_fit watches the frequency spectrum; this watches the
    DISPERSION).

    Exactness: per-doc term counts, their corpus sums/squares and doc
    frequencies are exact BIGINT folds (zeros enter through the exact
    corpus doc count, not materialized rows); VMR = (E[k^2] - E[k]^2) /
    E[k] evaluates only in the readout row (rules 1/6, 4dp).

    Scale: one explode to (doc, term) partials, one term rollup; the
    rank is rank<=K over the |vocab|-bounded term-stats frame (the
    text_kneser_ney WindowGroupLimit class, stated)."""
    d = load(spark, sf_dir, "documents")
    percell = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    stats = percell.groupBy("term").agg(
        F.sum("k").alias("tot"),
        F.sum(F.col("k") * F.col("k")).alias("skk"),
        F.count(F.lit(1)).alias("df"),
    )
    nd = d.agg(F.count(F.lit(1)).alias("n"))
    wr = Window.orderBy(F.col("tot").desc(), F.col("term").asc())
    ranked = stats.withColumn("rank", F.row_number().over(wr)).filter(
        F.col("rank") <= BURSTY_TOP_TERMS
    )
    mean = F.col("tot").cast("double") / F.col("n")
    vmr = (
        F.col("skk").cast("double") / F.col("n") - mean * mean
    ) / F.nullif(mean, F.lit(0.0))
    return ranked.crossJoin(F.broadcast(nd)).select(
        "rank",
        "term",
        F.col("tot").alias("total_occ"),
        F.col("df").alias("n_docs_with"),
        F.expr("df * 1000000 div n").alias("df_ppm"),
        (F.round(vmr, 4) + F.lit(0.0)).alias("vmr"),
    )


# --- round 12: BM25 retrieval --------------------------------------------------

BM25_K1_X10 = 12    # k1 = 1.2 (stated Robertson defaults, exact rationals)
BM25_B_X100 = 75    # b = 0.75
BM25_NQUERIES = 5   # the first N docs by doc_id serve as queries
BM25_TOPK = 5       # hits returned per query (self-match excluded)


_BM25_CHAIN_SQL_HEAD = f"""tf AS (
        SELECT doc_id, term, count(*)::BIGINT AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents)
        GROUP BY doc_id, term
    ),
    dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id),
    corp AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS tot FROM dl),
    df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
    w AS (
        SELECT t.doc_id, t.term,
               floor(ln((c.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
                     * (t.tf * ({BM25_K1_X10} / 10.0 + 1))
                     / (t.tf + ({BM25_K1_X10} / 10.0)
                        * (1 - {BM25_B_X100} / 100.0
                           + ({BM25_B_X100} / 100.0) * l.dl
                             / (c.tot / (c.n * 1.0))))
                     * 1000000)::BIGINT AS wq
        FROM tf t
        JOIN dl l ON l.doc_id = t.doc_id
        JOIN df d ON d.term = t.term
        CROSS JOIN corp c
    ),
    q AS (
        SELECT doc_id AS qid, term, tf AS qtf FROM tf
        WHERE doc_id < {BM25_NQUERIES}
    ),
    scores AS (
        SELECT q.qid, w.doc_id, sum(q.qtf * w.wq)::BIGINT AS score_micro
        FROM q JOIN w ON w.term = q.term
        WHERE w.doc_id <> q.qid
        GROUP BY q.qid, w.doc_id
    ),
    bm25_ranked AS (
        SELECT qid, doc_id, score_micro,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY score_micro DESC, doc_id ASC)
                   AS rank
        FROM scores
    )"""
# ^ BM25 postings chain (tf/dl/df/quantized weights/scores/bm25_ranked),
# shared by text_bm25_topk and the hybrid RRF fusion: the f-string
# constants interpolate ONCE so both oracles replay identical geometry.


@query(
    "text_bm25_topk",
    oracle="WITH " + _BM25_CHAIN_SQL_HEAD + f"""
    SELECT qid, rank, doc_id, score_micro
    FROM bm25_ranked WHERE rank <= {BM25_TOPK}
    """,
    tags=("llm", "text", "similarity"),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval — the lexical-search baseline every RAG /
    retrieval-eval pipeline needs next to the embedding searchers
    (sim_topk is dense; this is the sparse side of hybrid retrieval;
    text_tfidf weighs terms but never RANKS documents for a query):
    Robertson k1/b defaults, Lucene's non-negative idf, the first
    BM25_NQUERIES documents as queries, self-match excluded (stated).

    The determinism insight (rule 25 applied to IR scoring): each
    (term, doc) BM25 weight is a PER-ROW float expression of exact
    integer inputs (tf, df, dl, corpus totals) quantized once to micro
    units — so per-(query, doc) scores are exact BIGINT sums of integer
    contributions and the top-k rank (score DESC, doc_id ASC) is an
    integer sort with no float fold-order anywhere. Both engines replay
    the identical integer postings.

    Scale: tf/df/dl are one-explode partial aggs; the score join is the
    classic postings equi-join on term (the text_contamination shape) —
    the only fan-out is query-terms x matching postings, linear in
    postings for a bounded query set; the rank is per-query
    WindowGroupLimit. At 100 TB the postings join IS the inverted-index
    plan a search engine runs. The ranked frame is shared with
    sim_hybrid_rrf / eval_hybrid_gain via the _bm25_topk_frame session
    memo (one postings pass per session)."""
    return _bm25_topk_frame(spark, sf_dir)


# Session memos for the two searcher rankings the hybrid family fuses:
# the BM25 postings chain and the dense cosine ranking were each computed
# up to three times per session (text_bm25_topk, sim_hybrid_rrf,
# eval_hybrid_gain — ~1-2 s per recomputation at sf0.1 in the round-12
# bench). Both ranked frames are k-per-query sized, so one eager
# checkpoint each serves all consumers (the sim_pair_edges convention);
# a fresh process recomputes on demand.
#
# Round-13 counter-experiment (VERDICT r12 item 7), measured and
# REVERTED: materializing these as collected driver rows
# (collect_materialize) saves the one checkpoint write per session but
# makes EVERY consumer action re-ship the rows through Python workers
# (applySchemaToPythonRDD — ~0.37 s vs ~0.08 s per count() at sf0.1,
# interleaved medians; the whole hybrid family measured ~+1.9 s per
# bench run). A checkpoint scan is pure JVM; for Spark-COMPUTED frames
# read by several downstream actions the checkpoint wins. The
# driver-rows rule remains correct where r12 applied it — frames whose
# rows were ALREADY collected for a driver fold.
_HYBRID_FRAMES: dict = {}


def _bm25_topk_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..session import ensure_checkpoint_dir

    key = (spark.sparkContext.applicationId, sf_dir, "bm25")
    if key in _HYBRID_FRAMES:
        return _HYBRID_FRAMES[key]
    ensure_checkpoint_dir(spark)
    d = load(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    corp = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("tot")
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    k1 = BM25_K1_X10 / 10.0
    b = BM25_B_X100 / 100.0
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tfnorm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf")
        + k1
        * (1 - b + b * F.col("dl") / (F.col("tot") / (F.col("n") * 1.0)))
    )
    w = (
        tf.join(dl, "doc_id")
        .join(df, "term")
        .crossJoin(F.broadcast(corp))
        .select(
            "doc_id",
            "term",
            F.floor(idf * tfnorm * 1000000).cast("long").alias("wq"),
        )
    )
    q = tf.filter(F.col("doc_id") < BM25_NQUERIES).select(
        F.col("doc_id").alias("qid"), "term", F.col("tf").alias("qtf")
    )
    scores = (
        q.join(w, "term")
        .filter(F.col("doc_id") != F.col("qid"))
        .groupBy("qid", "doc_id")
        .agg(F.sum(F.col("qtf") * F.col("wq")).alias("score_micro"))
    )
    wr = Window.partitionBy("qid").orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    )
    _HYBRID_FRAMES[key] = (
        scores.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= BM25_TOPK)
        .select("qid", "rank", "doc_id", "score_micro")
        .checkpoint(eager=True)
    )
    return _HYBRID_FRAMES[key]


def _dense_topk_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hybrid family's dense ranking: (qid, doc_id, rank) for the
    SIM_TOPK_NQUERIES query block, rank <= SIM_TOPK_K by (raw_dot DESC,
    vec_id ASC) — memoized + checkpointed per (session, sf_dir); see
    _HYBRID_FRAMES for the round-13 driver-rows counter-experiment."""
    from ..session import ensure_checkpoint_dir
    from .llm_sim import SIM_TOPK_K, SIM_TOPK_NQUERIES, dot

    key = (spark.sparkContext.applicationId, sf_dir, "dense")
    if key in _HYBRID_FRAMES:
        return _HYBRID_FRAMES[key]
    ensure_checkpoint_dir(spark)
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < SIM_TOPK_NQUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    wdense = Window.partitionBy("qid").orderBy(
        F.col("raw_dot").desc(), F.col("vec_id").asc()
    )
    _HYBRID_FRAMES[key] = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "vec_id", dot(F.col("q_emb"), F.col("embedding")).alias("raw_dot")
        )
        .withColumn("rank", F.row_number().over(wdense))
        .filter(F.col("rank") <= SIM_TOPK_K)
        .select("qid", F.col("vec_id").alias("doc_id"), "rank")
        .checkpoint(eager=True)
    )
    return _HYBRID_FRAMES[key]


# --- round 12: hybrid retrieval fusion -----------------------------------------

RRF_K = 60          # the Cormack/Clarke reciprocal-rank-fusion constant
RRF_SCALE = 10**9   # contributions quantized as 1e9 div (k + rank): exact ints


def _hybrid_chain_sql() -> str:
    """BM25 chain + dense cosine ranking + RRF fusion, through the `fused`
    CTE — shared by sim_hybrid_rrf and eval_hybrid_gain."""
    from .llm_sim import SIM_TOPK_K, SIM_TOPK_NQUERIES

    return (
        "WITH "
        + _BM25_CHAIN_SQL_HEAD
        + f""",
    dense_ranked AS (
        SELECT qid, vec_id, rank FROM (
            SELECT q.vec_id AS qid, e.vec_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_dot_product(q.embedding::DOUBLE[],
                                                 e.embedding::DOUBLE[]) DESC,
                                e.vec_id ASC) AS rank
            FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
            WHERE q.vec_id < {SIM_TOPK_NQUERIES}
        ) WHERE rank <= {SIM_TOPK_K}
    ),
    contrib AS (
        SELECT qid, doc_id,
               ({RRF_SCALE} // ({RRF_K} + rank))::BIGINT AS c,
               1::BIGINT AS lex, 0::BIGINT AS den
        FROM bm25_ranked WHERE rank <= {BM25_TOPK}
        UNION ALL
        SELECT qid, vec_id AS doc_id,
               ({RRF_SCALE} // ({RRF_K} + rank))::BIGINT AS c,
               0::BIGINT AS lex, 1::BIGINT AS den
        FROM dense_ranked
    ),
    fused AS (
        SELECT qid, doc_id, sum(c)::BIGINT AS rrf_x1e9,
               max(lex)::BIGINT AS in_lexical, max(den)::BIGINT AS in_dense
        FROM contrib GROUP BY qid, doc_id
    )"""
    )


def _hybrid_rrf_oracle_sql() -> str:
    from .llm_sim import SIM_TOPK_K

    return (
        _hybrid_chain_sql()
        + f"""
    SELECT qid, rank, doc_id, rrf_x1e9, in_lexical, in_dense FROM (
        SELECT *, row_number() OVER (PARTITION BY qid
                       ORDER BY rrf_x1e9 DESC, doc_id ASC) AS rank
        FROM fused
    ) WHERE rank <= {SIM_TOPK_K}"""
    )


@query(
    "sim_hybrid_rrf",
    oracle=_hybrid_rrf_oracle_sql(),
    tags=("llm", "similarity", "text"),
)
def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion — the standard combiner
    of the repo's two searcher families (text_bm25_topk = sparse/lexical,
    sim_topk = dense/cosine; production RAG runs BOTH and fuses): for
    each query, every document in either top-k list scores
    sum 1/(60 + rank) over the lists that retrieved it, re-ranked on the
    fused score. Queries are the shared id space (doc_id == vec_id in
    the fixtures, stated), self-matches excluded by both searchers.

    Exactness: each contribution quantizes as RRF_SCALE div (60 + rank)
    — EXACT integer division of integer ranks (both input rankings are
    already integer-deterministic: BM25 ranks integer micro scores,
    cosine ranks break float ties by vec_id ASC) — so fused scores are
    exact BIGINT sums and the final rank is an integer sort. Provenance
    flags (in_lexical/in_dense) ship with each hit.

    Scale: rides the two searcher constructions unchanged (postings
    equi-join; broadcast query block); fusion itself is a union of two
    k-per-query frames + one partial agg — negligible. At 100 TB the
    searchers dominate and each keeps its own documented plan."""
    from .llm_sim import SIM_TOPK_K

    lex = _bm25_topk_frame(spark, sf_dir).select(
        "qid",
        "doc_id",
        F.expr(f"{RRF_SCALE} div ({RRF_K} + rank)").alias("c"),
        F.lit(1).cast("long").alias("lex"),
        F.lit(0).cast("long").alias("den"),
    )
    dense = _dense_topk_frame(spark, sf_dir).select(
        "qid",
        "doc_id",
        F.expr(f"{RRF_SCALE} div ({RRF_K} + rank)").alias("c"),
        F.lit(0).cast("long").alias("lex"),
        F.lit(1).cast("long").alias("den"),
    )
    fused = (
        lex.unionAll(dense)
        .groupBy("qid", "doc_id")
        .agg(
            F.sum("c").alias("rrf_x1e9"),
            F.max("lex").alias("in_lexical"),
            F.max("den").alias("in_dense"),
        )
    )
    wr = Window.partitionBy("qid").orderBy(
        F.col("rrf_x1e9").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= SIM_TOPK_K)
        .select("qid", "rank", "doc_id", "rrf_x1e9", "in_lexical", "in_dense")
    )


def _hybrid_gain_oracle_sql() -> str:
    from .llm_sim import SIM_TOPK_K

    return (
        _hybrid_chain_sql()
        + f""",
    hg_lists AS (
        SELECT 'lexical' AS searcher, qid, doc_id
        FROM bm25_ranked WHERE rank <= {SIM_TOPK_K}
        UNION ALL
        SELECT 'dense' AS searcher, qid, vec_id AS doc_id FROM dense_ranked
        UNION ALL
        SELECT 'hybrid_rrf' AS searcher, qid, doc_id FROM (
            SELECT qid, doc_id,
                   row_number() OVER (PARTITION BY qid
                       ORDER BY rrf_x1e9 DESC, doc_id ASC) AS rank
            FROM fused
        ) WHERE rank <= {SIM_TOPK_K}
    ),
    hg_labeled AS (
        SELECT l.searcher, l.qid,
               CASE WHEN eh.label = eq.label THEN 1 ELSE 0 END AS hit
        FROM hg_lists l
        JOIN embeddings eh ON eh.vec_id = l.doc_id
        JOIN embeddings eq ON eq.vec_id = l.qid
    )
    SELECT searcher,
           count(DISTINCT qid)::BIGINT AS n_queries,
           count(*)::BIGINT AS n_hits_listed,
           sum(hit)::BIGINT AS n_relevant,
           (sum(hit) * 1000000 // count(*))::BIGINT AS precision_ppm
    FROM hg_labeled GROUP BY searcher"""
    )


@query(
    "eval_hybrid_gain",
    oracle=_hybrid_gain_oracle_sql(),
    tags=("llm", "similarity", "eval"),
)
def eval_hybrid_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval ablation — does the RRF fusion actually BEAT its
    two ingredient searchers? Label-relevance precision@k (a hit is
    relevant iff its embedding label equals the query's — the knn_label
    ground-truth convention) for lexical, dense and fused lists side by
    side: the ablation table every hybrid-search rollout is justified
    by, computed in-engine on the same chains the searchers ship.

    Exactness: all three rankings are integer-deterministic (BM25 micro
    scores, vec_id tie-breaks, integer RRF), relevance is an integer
    label compare, precision is exact integer ppm — no floats anywhere
    downstream of the already-pinned dense ranks.

    Scale: rides the searcher constructions; the ablation adds two
    broadcast-joinable label lookups on k-per-query frames and one
    partial agg."""
    from .llm_sim import SIM_TOPK_K

    fused = sim_hybrid_rrf(spark, sf_dir)
    lex = _bm25_topk_frame(spark, sf_dir).select(
        F.lit("lexical").alias("searcher"), "qid", "doc_id"
    )
    # dense list = the fusion's dense branch verbatim (one memoized code
    # path — both rank by raw_dot / vec_id)
    dense = _dense_topk_frame(spark, sf_dir).select(
        F.lit("dense").alias("searcher"), "qid", "doc_id"
    )
    e = load(spark, sf_dir, "embeddings")
    hyb = fused.select(
        F.lit("hybrid_rrf").alias("searcher"), "qid", "doc_id"
    )
    lists = lex.unionAll(dense).unionAll(hyb)
    labels = e.select("vec_id", "label")
    labeled = (
        lists.join(
            F.broadcast(labels.select(F.col("vec_id").alias("doc_id"),
                                      F.col("label").alias("hl"))),
            "doc_id",
        )
        .join(
            F.broadcast(labels.select(F.col("vec_id").alias("qid"),
                                      F.col("label").alias("ql"))),
            "qid",
        )
        .select(
            "searcher",
            "qid",
            F.when(F.col("hl") == F.col("ql"), 1).otherwise(0).alias("hit"),
        )
    )
    return labeled.groupBy("searcher").agg(
        F.count_distinct("qid").alias("n_queries"),
        F.count(F.lit(1)).alias("n_hits_listed"),
        F.sum("hit").alias("n_relevant"),
        F.expr("sum(hit) * 1000000 div count(*)").alias("precision_ppm"),
    )


def _spiegelhalter_oracle_sql() -> str:
    t = QC_ITERS
    f1, f2, f3 = QC_FEATURES_SQL
    return (
        _qc_chain_sql()
        + f""",
    sp_scored AS (
        SELECT ({QC_LABEL_SQL})::BIGINT AS y,
               floor(1000000.0 / (1.0 + exp(-((w.w0m + w.w1m * ({f1})
                     + w.w2m * ({f2}) + w.w3m * ({f3})) / 1000000.0))))::BIGINT
                   AS p_ppm
        FROM documents CROSS JOIN w_{t} w
    ),
    sp_sums AS (
        SELECT count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos,
               sum(((y * 1000000 - p_ppm)
                    * (1000000 - 2 * p_ppm))::HUGEINT) AS num,
               sum((1000000 - 2 * p_ppm)::HUGEINT
                   * (1000000 - 2 * p_ppm)::HUGEINT
                   * p_ppm::HUGEINT * (1000000 - p_ppm)::HUGEINT) AS den
        FROM sp_scored
    )
    SELECT n, n_pos,
           round(num::DOUBLE / nullif(sqrt(den::DOUBLE), 0), 4) + 0.0
               AS z_spiegelhalter
    FROM sp_sums"""
    )


@query(
    "eval_calibration_spiegelhalter",
    oracle=_spiegelhalter_oracle_sql(),
    tags=("llm", "eval", "ml", "stats"),
)
def eval_calibration_spiegelhalter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spiegelhalter's Z test of calibration — the SIGNIFICANCE companion
    to eval_brier_decomposition (which decomposes the Brier score) and
    eval_isotonic_calibration (which repairs miscalibration): is the QC
    classifier's predicted probability actually calibrated, as a single
    z-statistic? Z = sum (y-p)(1-2p) / sqrt(sum (1-2p)^2 p(1-p)), the
    Brier score's excess over its calibrated expectation, standardized.
    Fourth consumer of the memoized _qc_weights fit — zero training cost.

    The exactness trick (rule 31's integer-sum discipline at a scale
    BIGINT cannot hold): p quantizes per-row to integer ppm (the
    corpus_classifier_filter value, verbatim), and both sums run in
    128-bit integers — Spark decimal(38,0), DuckDB HUGEINT — because the
    denominator's per-row term (1-2p)^2 p (1-p) reaches ~2.5e23 in ppm
    units, past int64; the decimal sums stay EXACT and order-free up to
    ~1e38 (1e12 documents), and the ppm scales cancel in Z
    (1e12/sqrt(1e24) = 1), so the only float is the final readout
    (4dp, rules 1/6).

    At 100 TB: one map-side scoring pass (4 integer weights as
    literals) + one partial agg; the training was paid once by the
    memo."""
    _, qtraj = _qc_weights(spark, sf_dir)
    w = qtraj[-1][1:5]
    d = load(spark, sf_dir, "documents")
    zm = (
        F.lit(w[0])
        + F.lit(w[1]) * F.expr(
            "size(array_distinct(split(text, ' '))) * 1000000L"
            " div size(split(text, ' ')) div 10000 - 50"
        )
        + F.lit(w[2]) * F.expr("n_chars div 100 - 3")
        + F.lit(w[3]) * F.expr("size(split(text, ' ')) div 10 - 4")
    ).cast("long")
    y = F.expr(
        "CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN 1 ELSE 0 END"
    ).cast("long")
    p_ppm = F.floor(
        1000000.0 / (1.0 + F.exp(-(zm.cast("double") / 1000000.0)))
    ).cast("long")
    scored = d.select(y.alias("y"), p_ppm.alias("p_ppm"))
    dec = lambda c: c.cast("decimal(38,0)")
    sums = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("n_pos"),
        F.sum(
            dec(
                (F.col("y") * 1000000 - F.col("p_ppm"))
                * (1000000 - 2 * F.col("p_ppm"))
            )
        ).alias("num"),
        F.sum(
            dec(1000000 - 2 * F.col("p_ppm"))
            * dec(1000000 - 2 * F.col("p_ppm"))
            * dec(F.col("p_ppm"))
            * dec(1000000 - F.col("p_ppm"))
        ).alias("den"),
    )
    return sums.select(
        "n",
        "n_pos",
        (
            F.round(
                F.col("num").cast("double")
                / F.nullif(F.sqrt(F.col("den").cast("double")), F.lit(0.0)),
                4,
            )
            + F.lit(0.0)
        ).alias("z_spiegelhalter"),
    )
