"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID (stopword heuristic), document
fingerprinting. All built-in-function compositions — no Python UDFs in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

def stage_checkpoint(df, eager=True):
    """Lazy proxy for functions.plan_tools.stage_checkpoint: this
    module is imported by functions/__init__, so a module-level
    import of the functions package would be circular."""
    from the_framework_for_clustering_time_series_data_spark.functions.plan_tools import (
        stage_checkpoint as _sc,
    )

    return _sc(df, eager=eager)



TOKEN_RE = r"\s+"


def length_balanced(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decouple per-task tokenize volume from the parquet FILE LAYOUT
    (round-10 verdict ask #3 — the heavy-tail straggler lever): scan
    splits balance COMPRESSED bytes, but the heavy-tail stratum of a
    skewed corpus (40×-median docs, which as repeated/boilerplate text
    also compress ~40:1) packs far more DECOMPRESSED char volume into
    a byte-sized split than its compressed size shows — so a few scan
    tasks carry most of the per-doc tokenize/pair-scan work (measured:
    bpe_apply/bpe_merges 1.3-1.4× over their uniform decade ratios
    under the skewed decade). One row-level hash repartition on the
    doc id spreads docs uniformly at random, bounding per-task char
    volume by concentration regardless of layout or compression
    clustering. Costs one corpus shuffle — pay it only in front of
    kernels whose per-doc work rides the text length (tokenize, pair
    scans, shingling), not for metadata scans."""
    return docs.repartition(F.col(id_col))

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deterministic, dependency-free.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "for", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "del", "se", "las"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "un", "du", "une"),
    "de": ("der", "die", "und", "das", "von", "den", "im", "ein", "mit", "des"),
    "zh": ("的", "是", "在", "了", "和", "有", "我", "他", "这", "中"),
}


def tokens_expr(text_col: str = "text") -> Column:
    return F.split(F.lower(F.trim(F.col(text_col))), TOKEN_RE)


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + char count + mean token length."""
    toks = tokens_expr(text_col)
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.round(
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
            / F.size(toks),
            6,
        ).alias("avg_token_len"),
    )


def quality_expr(text_col: str = "text") -> Column:
    """The combined [0,1] quality-gate score as a bare column
    expression (rounded to 6 dp) — composable into any projection so
    consumers (corpus_token_budget) can fold it into an existing scan
    instead of joining :func:`quality_score` output back on doc_id."""
    toks = tokens_expr(text_col)
    text = F.col(text_col)
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    sw = LANG_STOPWORDS["en"]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*sw)))
    score = (
        F.least(F.size(toks) / F.lit(100.0), F.lit(1.0)) * 0.3
        + (n_alpha / F.length(text)) * 0.4
        + F.least((n_stop / F.size(toks)) * 5, F.lit(1.0)) * 0.3
    )
    return F.round(score, 6)


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality signals: length, alpha ratio, punctuation
    ratio, English-stopword ratio, and a combined [0,1] score (the
    usual pretraining-data quality gates).
    """
    text = F.col(text_col)
    toks = tokens_expr(text_col)
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"]", ""))
    sw = LANG_STOPWORDS["en"]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*sw)))
    alpha_ratio = n_alpha / n_chars
    punct_ratio = n_punct / n_chars
    stop_ratio = n_stop / F.size(toks)
    return df.select(
        F.col(id_col),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        # the combined score is quality_expr — ONE definition of the
        # gate formula, shared with corpus_token_budget's folded scan
        quality_expr(text_col).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language ID: per language, count token hits in its
    stopword list; predict the argmax (ties → lexicographic language
    order). One pass over the token array, no shuffle at all.
    """
    toks = tokens_expr(text_col)
    langs = sorted(LANG_STOPWORDS)

    def hits(lang: str) -> F.Column:
        sw = LANG_STOPWORDS[lang]
        return F.size(F.filter(toks, lambda t: t.isin(*sw)))

    # struct(hits, -rank): array_max → max hits, ties → smallest rank
    # (lexicographically first language). Deterministic.
    best = F.array_max(
        F.array(
            *[
                F.struct(hits(lang).alias("hits"), F.lit(-rank).alias("neg_rank"))
                for rank, lang in enumerate(langs)
            ]
        )
    )
    lang_arr = F.array(*[F.lit(lang) for lang in langs])
    return df.select(
        F.col(id_col),
        F.element_at(lang_arr, -best["neg_rank"] + 1).alias("pred_lang"),
        best["hits"].alias("stopword_hits"),
    )


def fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 8,
    use_md5: bool = False,
) -> DataFrame:
    """Winnowing-style document fingerprint: hash every w-token window
    (rolling over the token array), keep the minimum window hash as the
    document fingerprint plus the count of distinct window hashes.
    JVM-only: transform + hash over array slices.

    ``use_md5=True`` switches the window hash from xxhash64 (fastest)
    to md5 hex strings — portable across engines, used by the
    DuckDB-oracle plan variant (min/distinct semantics identical).
    """
    toks = tokens_expr(text_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - F.lit(w), F.lit(0)))
    hash_fn = F.md5 if use_md5 else F.xxhash64
    win_hashes = F.transform(
        idx, lambda i: hash_fn(F.concat_ws(" ", F.slice(toks, i + 1, w)))
    )
    return df.select(
        F.col(id_col),
        F.array_min(win_hashes).alias("min_fp"),
        F.size(F.array_distinct(win_hashes)).alias("n_distinct_windows"),
    )


BPE_ISH_RE = r"'[a-z]{1,2}| ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+"


def bpe_tokens_expr(text_col: str = "text") -> Column:
    """GPT-2-style pre-tokenization approximation: contractions,
    space-prefixed letter runs, digit runs, punctuation runs — the
    regex-only part of BPE (no merge table). Portable across Java and
    DuckDB regex dialects."""
    return F.expr(
        f"regexp_extract_all(lower(trim({text_col})), \"{BPE_ISH_RE}\", 0)"
    )


def bpe_token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counts under both tokenizers: whitespace words and the
    BPE-ish regex (a cheap proxy for LLM token budgeting at corpus
    scale — pure JVM regex, no Python)."""
    ws = tokens_expr(text_col)
    bpe = bpe_tokens_expr(text_col)
    return df.select(
        F.col(id_col),
        F.size(ws).alias("n_words"),
        F.size(bpe).alias("n_bpe_tokens"),
        F.round(F.size(bpe) / F.size(ws), 6).alias("tokens_per_word"),
    )


def tfidf_vectors(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_features: int = 4096,
    min_doc_freq: int = 2,
) -> DataFrame:
    """TF-IDF document vectors, fully distributed: whitespace tokenize →
    HashingTF (feature hashing: fixed-width sparse vectors, no
    vocabulary broadcast — the property that matters at billions of
    docs) → IDF (one aggregate pass for document frequencies) → L2
    normalize, so downstream euclidean k-means ≈ cosine k-means.
    Returns (id, features) with ``features`` an MLlib sparse vector."""
    from pyspark.ml.feature import IDF, HashingTF, Normalizer

    toks = df.select(
        F.col(id_col).alias("id"),
        F.split(F.lower(F.trim(F.col(text_col))), TOKEN_RE).alias("toks"),
    )
    tf = HashingTF(inputCol="toks", outputCol="_tf", numFeatures=num_features).transform(toks)
    idf_model = IDF(inputCol="_tf", outputCol="_tfidf", minDocFreq=min_doc_freq).fit(tf)
    tfidf = idf_model.transform(tf)
    out = Normalizer(inputCol="_tfidf", outputCol="features", p=2.0).transform(tfidf)
    return out.select("id", "features")


def bigram_fluency(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus-trained bigram language-model score per document: the mean
    log-probability of the doc's word bigrams under p(w2|w1) estimated
    by MLE over the WHOLE corpus — the classic cheap "fluency /
    typicality" filter for training-data curation (low scores flag
    word-salad and boilerplate-free outliers; no external model needed).

    Shape: posexplode tokens → lead() bigram pairing (one shuffle on
    doc_id) → bigram counts (shuffle on (w1,w2)) → context totals
    derived from the ALREADY-AGGREGATED bigram counts (shuffle on w1,
    input is vocab²-bounded, not corpus-bounded) → probabilities joined
    back → per-doc mean log-prob. No broadcast of corpus-sized state —
    the model itself stays distributed, unlike vocabulary-broadcast
    vectorizers.

    Skew note: bigram frequencies are Zipfian, so the score-join's
    shuffle key is hot for top bigrams — but the probability side has
    exactly ONE row per key, which is the shape AQE skew-join splitting
    handles (split the hot left partition, replicate the 1-row right);
    the aggregations themselves absorb skew via map-side partials.
    Docs with <2 tokens have no bigrams and drop out.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), TOKEN_RE)
    ex = df.select(F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos", "w1"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        ex.select("doc_id", "w1", F.lead("w1").over(w).alias("w2"))
        .where(F.col("w2").isNotNull())
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("n12"))
    c1 = c2.groupBy("w1").agg(F.sum("n12").alias("n1"))
    p = c2.join(c1, "w1").select("w1", "w2", (F.col("n12") / F.col("n1")).alias("prob"))
    return (
        bg.join(p, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(F.log("prob")), 6).alias("fluency"),
        )
    )


def _word_ngrams(df: DataFrame, n: int, text_col: str, id_col: str) -> DataFrame:
    """(id, gram) rows of word n-grams as strings via posexplode +
    lead() — one shuffle on the doc id. String grams keep the op
    oracle-comparable; at corpus scale substitute the 64-bit composed
    shingle hashes of dedup._hashed_shingles (same plan shape, long
    equality instead of string equality)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), TOKEN_RE)
    ex = df.select(F.col(id_col).alias("id"), F.posexplode(toks).alias("pos", "w0"))
    w = Window.partitionBy("id").orderBy("pos")
    cols = [F.col("w0")] + [F.lead("w0", j).over(w).alias(f"w{j}") for j in range(1, n)]
    named = ex.select("id", *cols)
    return named.where(F.col(f"w{n - 1}").isNotNull()).select(
        "id", F.concat_ws(" ", *[f"w{j}" for j in range(n)]).alias("gram")
    )


def repetition_score(df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Intra-document repetition: 1 - distinct/total word n-grams — the
    boilerplate / loop-generation quality signal (high ratio = the doc
    repeats itself). One gram pass, one grouped aggregate. Docs with
    fewer than ``n`` tokens have no grams and drop out. The ratio is
    rounded through the explicit floor identity: gram counts are small
    integers, so exact .5 ties at the 6th decimal occur (e.g. k/128)
    and Spark/DuckDB round-half modes differ."""
    grams = _word_ngrams(df, n, text_col, id_col)
    agg = grams.groupBy("id").agg(
        F.count("*").alias("n_grams"),
        F.count_distinct("gram").alias("n_distinct"),
    )
    ratio = 1.0 - F.col("n_distinct") / F.col("n_grams")
    return agg.select(
        F.col("id").alias("doc_id"),
        "n_grams",
        "n_distinct",
        (F.floor(ratio * 1e6 + 0.5) / 1e6).alias("rep_ratio"),
    )


def boilerplate_shingles(
    df: DataFrame,
    n: int = 3,
    min_df: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-frequency boilerplate measurement (the CCNet/RefinedWeb
    template-removal signal, one level up from
    :func:`repetition_score`'s INTRA-doc ratio): a word n-gram is
    *boilerplate* when it appears in at least ``min_df`` distinct
    documents (headers, footers, nav chrome, license blurbs), and each
    document reports how much of it is made of such grams.

    Returns ``(doc_id, n_grams, n_boiler, boiler_frac)`` — instances,
    boilerplate instances, and their exact-integer ratio (floor
    identity, cross-engine parity). Docs with fewer than ``n`` tokens
    have no grams and drop out (both engines).

    Shape: one gram pass (posexplode + lead, shuffle on doc id), a
    document-frequency aggregate (shuffle on gram; Zipfian hot grams
    absorb into map-side partials), the gram→df join back (1 row per
    key on the build side — the AQE skew-join shape), and a per-doc
    aggregate. No driver state; the gram "model" stays distributed.
    At 100 TB substitute the composed 64-bit shingle hashes of
    dedup._hashed_shingles for gram strings (same plan, long keys).
    """
    grams = _word_ngrams(df, n, text_col, id_col)
    dfreq = grams.groupBy("gram").agg(F.count_distinct("id").alias("gram_df"))
    flagged = grams.join(dfreq, "gram").select(
        "id", (F.col("gram_df") >= min_df).cast("int").alias("is_boiler")
    )
    agg = flagged.groupBy("id").agg(
        F.count("*").alias("n_grams"),
        F.sum("is_boiler").alias("n_boiler"),
    )
    return agg.select(
        F.col("id").alias("doc_id"),
        "n_grams",
        F.col("n_boiler").cast("long").alias("n_boiler"),
        (
            F.floor(F.col("n_boiler") / F.col("n_grams") * 1e6 + 0.5) / 1e6
        ).alias("boiler_frac"),
    )


def decontaminate_overlap(
    corpus: DataFrame,
    eval_set: DataFrame,
    n: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing word
    n-grams with an evaluation set — the standard pre-training hygiene
    pass. Distinct grams per corpus doc JOIN the eval set's distinct
    gram union (a semi-join-shaped equi-join on the gram), then one
    grouped count per contaminated doc with its overlap ratio.

    Scale: the eval-gram side is benchmark-sized (≪ corpus) and
    broadcastable; the corpus side streams through one gram pass. With
    string grams swapped for 64-bit shingle hashes the probe set is a
    few hundred MB for a full eval suite — still broadcast range.
    """
    corpus_grams = _word_ngrams(corpus, n, text_col, id_col).distinct()
    eval_grams = (
        _word_ngrams(eval_set, n, text_col, id_col).select("gram").distinct()
    )
    per_doc = corpus_grams.groupBy("id").agg(F.count("*").alias("n_grams"))
    hits = (
        corpus_grams.join(eval_grams, "gram")
        .groupBy("id")
        .agg(F.count("*").alias("n_overlap"))
    )
    ratio = F.col("n_overlap") / F.col("n_grams")
    return hits.join(per_doc, "id").select(
        F.col("id").alias("doc_id"),
        "n_overlap",
        "n_grams",
        (F.floor(ratio * 1e6 + 0.5) / 1e6).alias("overlap_ratio"),
    )


def quality_classifier_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 11,
) -> DataFrame:
    """Model-based quality scoring: distill the heuristic quality gates
    into a logistic-regression classifier (the FastText/CCNet-style
    quality-classifier stage of a pretraining pipeline, with MLlib in
    place of FastText).

    Weak supervision: the top quartile of the heuristic score is
    labeled good, the bottom quartile bad; a LogisticRegression is fit
    on those extremes over richer features (ratios, log-length, token
    shape, lexical diversity) and then scores EVERY document — the
    model interpolates over the middle mass the heuristic can't rank
    confidently. Training data is the two quartile extremes only
    (bounded, sampled if huge); inference is one distributed transform.

    Returns (id, weak_label ∈ {-1,0,1}; -1 = unlabeled middle,
    quality_prob ∈ [0,1]).
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import vector_to_array

    text = F.col(text_col)
    toks = tokens_expr(text_col)
    n_chars = F.length(text)
    n_tok = F.size(toks)
    feats = df.select(
        F.col(id_col).alias("id"),
        (F.length(F.regexp_replace(text, r"[^A-Za-z]", "")) / n_chars).alias("alpha_ratio"),
        (F.length(F.regexp_replace(text, r"[^.,;:!?'\"]", "")) / n_chars).alias("punct_ratio"),
        (F.size(F.filter(toks, lambda t: t.isin(*LANG_STOPWORDS["en"]))) / n_tok).alias("stop_ratio"),
        F.log1p(n_tok).alias("log_tokens"),
        (n_chars / n_tok).alias("avg_tok_len"),
        (F.size(F.array_distinct(toks)) / n_tok).alias("distinct_ratio"),
    )
    heur = quality_score(df, text_col, id_col).select(
        F.col(id_col).alias("id"), "quality"
    )
    base = feats.join(heur, "id").transform(stage_checkpoint, eager=True)
    lo, hi = base.stat.approxQuantile("quality", [0.25, 0.75], 0.001)
    labeled = base.withColumn(
        "weak_label",
        F.when(F.col("quality") >= hi, 1)
        .when(F.col("quality") <= lo, 0)
        .otherwise(-1),
    )
    cols = ["alpha_ratio", "punct_ratio", "stop_ratio", "log_tokens", "avg_tok_len", "distinct_ratio"]
    va = VectorAssembler(inputCols=cols, outputCol="_features")
    train = va.transform(labeled.where(F.col("weak_label") >= 0)).withColumn(
        "label", F.col("weak_label").cast("double")
    )
    model = LogisticRegression(
        maxIter=50, regParam=0.01, featuresCol="_features", labelCol="label"
    ).fit(train)
    scored = model.transform(va.transform(labeled))
    return scored.select(
        "id",
        "weak_label",
        F.round(vector_to_array("probability")[1], 6).alias("quality_prob"),
    )


def quality_features6(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The deterministic 6-feature quality frame shared by
    :func:`quality_logit_det` (training) and :func:`quality_feature_auc`
    (evaluation): ``(id, x1..x6, quality)`` with every feature a SINGLE
    division / log of exact counts quantized to a 6-dp grid
    (cross-engine-safe — no reduction is involved; ``ln`` carries the
    measure-zero ulp caveat), plus the heuristic gate's ``quality``
    score the weak labels derive from. One JVM-side pass per input."""

    def r6(c: Column) -> Column:
        return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    text = F.col(text_col)
    toks = tokens_expr(text_col)
    n_chars = F.length(text)
    n_tok = F.size(toks)
    sw = LANG_STOPWORDS["en"]
    feats = df.select(
        F.col(id_col).alias("id"),
        r6(F.length(F.regexp_replace(text, r"[^A-Za-z]", "")) / n_chars).alias("x1"),
        r6(F.length(F.regexp_replace(text, r"[^.,;:!?'\"]", "")) / n_chars).alias("x2"),
        r6(F.size(F.filter(toks, lambda t: t.isin(*sw))) / n_tok).alias("x3"),
        r6(F.log(F.lit(1.0) + n_tok)).alias("x4"),
        r6(n_chars / n_tok).alias("x5"),
        r6(F.size(F.array_distinct(toks)) / n_tok).alias("x6"),
    )
    heur = quality_score(df, text_col, id_col).select(
        F.col(id_col).alias("id"), "quality"
    )
    return feats.join(heur, "id")


def quality_feature_auc(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-feature ROC-AUC against the weak quality labels — the
    feature audit a curation pipeline runs before trusting a distilled
    classifier: for each of the six deterministic quality features,
    how well does the feature ALONE rank the top weak-label quartile
    above the bottom one (labels exactly as quality_logit_det trains
    on: exact quartiles of (quality, id), q4=4 positive, q4=1
    negative).

    AUC via the Mann-Whitney identity on HALF-UNIT midrank integers
    (the ab_mann_whitney discipline: 2*midrank = 2*rank_below + t + 1
    per tie group, so no .5 float ever exists): AUC =
    (R2_pos - n1*(n1+1)) / (2*n1*n0), exact integers into one
    division. The rank pass is a grouped count per distinct
    (feature, x) + one RUNNING window over the distinct-value table —
    never a per-row global sort; shuffles on (feature, x) then
    feature, both key-bounded.
    """
    lab = with_global_ntiles_quality(df, text_col, id_col)
    train = lab.where(F.col("weak_label") >= 0)
    xs = [f"x{j}" for j in range(1, 7)]
    long = train.select(
        F.col("weak_label").alias("y"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(x).alias("feature"), F.col(x).alias("x")
                    )
                    for x in xs
                ]
            )
        ).alias("fx"),
    ).select("y", F.col("fx.feature").alias("feature"), F.col("fx.x").alias("x"))
    grp = long.groupBy("feature", "x").agg(
        F.count("*").alias("t"),
        F.sum("y").alias("t1"),
    )
    wb = (
        Window.partitionBy("feature")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rk = grp.withColumn("below", F.sum("t").over(wb))
    mo = rk.groupBy("feature").agg(
        F.sum(
            F.col("t1") * (2 * F.coalesce("below", F.lit(0)) + F.col("t") + 1)
        ).alias("r2_1"),
        F.sum("t1").alias("n1"),
        F.sum(F.col("t") - F.col("t1")).alias("n0"),
    )
    return mo.select(
        "feature",
        F.col("n1").cast("long").alias("n_pos"),
        F.col("n0").cast("long").alias("n_neg"),
        (
            F.floor(
                (F.col("r2_1") - F.col("n1") * (F.col("n1") + 1)).cast("double")
                / (F.lit(2.0) * F.col("n1") * F.col("n0"))
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("auc"),
    )


def with_global_ntiles_quality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Quality feature frame + exact-quartile weak labels
    (``weak_label`` 1 = top quartile, 0 = bottom, -1 = middle) — the
    shared labeling stage of quality_logit_det and
    quality_feature_auc."""
    from the_framework_for_clustering_time_series_data_spark.operators.rank import with_global_ntiles

    base = quality_features6(df, text_col, id_col)
    lab = with_global_ntiles(base, 4, [("_q4", ["quality", "id"], None)])
    return lab.withColumn(
        "weak_label",
        F.when(F.col("_q4") == 4, 1).when(F.col("_q4") == 1, 0).otherwise(-1),
    ).drop("_q4")


def quality_logit_det(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rounds: int = 8,
    lr: float = 0.5,
) -> DataFrame:
    """DETERMINISTIC quality-classifier twin of
    :func:`quality_classifier_scores` — the same weak-supervision
    distillation (quartile extremes of the heuristic gate train a
    logistic model that scores every document), with every
    non-replayable piece swapped for a replayable form:

    * labels: exact quartiles of (quality, id) via the distributed
      ``with_global_ntiles`` (approxQuantile is a Greenwald-Khanna
      sketch — implementation-defined); top quartile → 1, bottom → 0;
    * features quantize to 6-dp (each a SINGLE division / log of
      exact counts — cross-engine-safe because no reduction is
      involved; ``ln`` may differ by an ulp between libms, a
      measure-zero 6-dp hazard — the c7b exp discipline);
    * training: ``rounds`` fixed FULL-BATCH gradient-descent steps
      from zero weights (LBFGS's float reduction order is not
      replayable). The per-round sigmoid rounds to 6 dp, so each
      residual·feature product is an exact 1e-12-grid rational summed
      as exact int64 PICO-units (association-order-proof); gradients
      round back to their grid, weights to 6-dp quanta — both engines
      run the identical schedule on identical doubles.

    Returns ``(id, weak_label ∈ {-1,0,1}, quality_prob)``.

    Shape: features + heuristic in one pass; with_global_ntiles'
    two bounded jobs; each GD round is ONE map-side-combinable
    aggregate over the (checkpointed, two-quartile) training frame,
    whose 1-row gradient (7 doubles of model state) is fetched to the
    driver and folded into the weight schedule in Python — the same
    IEEE-754 ops, so values are bit-identical to the in-plan form.
    The fetch is the bounded-model-state pattern (e2c/e3b): chaining
    the 1-row weight frame through crossJoins instead makes round t's
    plan contain TWO copies of round t-1's (gradient + update), and
    Spark does not dedupe common subtrees — the final plan re-ran the
    train aggregate 2^rounds≈256 times (8.4 s at sf0.1; 2.0 s fixed).
    The DuckDB oracle needed the same fix as MATERIALIZED CTEs.
    """
    import math

    from the_framework_for_clustering_time_series_data_spark.functions.plan_tools import stage_checkpoint

    def r6(c: Column) -> Column:
        return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    labeled = with_global_ntiles_quality(df, text_col, id_col)
    train = (
        labeled.where(F.col("weak_label") >= 0)
        .withColumn("y", F.col("weak_label").cast("double"))
        .transform(stage_checkpoint, eager=False)
    )

    xs = [f"x{j}" for j in range(1, 7)]
    w = {"b": 0.0, **{f"w{j}": 0.0 for j in range(1, 7)}}

    def r6py(v: float) -> float:
        # the Python twin of r6(): floor on an IEEE double then an
        # exact-integer / 1e6 division — bit-identical to the JVM form
        return math.floor(v * 1e6 + 0.5) / 1e6

    def _p(weights: dict, frame: DataFrame) -> DataFrame:
        z = F.lit(weights["b"])
        for i, x in enumerate(xs, start=1):
            z = z + F.lit(weights[f"w{i}"]) * F.col(x)
        return frame.withColumn(
            "p", r6(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
        )

    for _ in range(rounds):
        pdf = _p(w, train)
        e = F.col("p") - F.col("y")
        # exact-grid gradient means: e is a 6-dp quantum, x a 6-dp
        # quantum → e·x is an exact 1e-12-grid rational recovered by
        # the pico round (double error « half a pico unit at these
        # magnitudes); exact integer sums are association-order-proof.
        # Sums run in decimal(38,0) (per-row quantum → decimal(28,0)):
        # DuckDB's sum(BIGINT) is HUGEINT, so int64 Spark sums would
        # wrap first (~1e7 training rows for the 1e12-grid terms)
        # while the oracle kept going (plan_tools.exact_mean6 note).
        aggs = [
            (
                F.floor(
                    F.sum(
                        F.floor(e * F.lit(1e6) + F.lit(0.5)).cast("decimal(28,0)")
                    ).cast("double")
                    / F.count("*")
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("gb")
        ]
        for i, x in enumerate(xs, start=1):
            aggs.append(
                (
                    F.floor(
                        F.sum(
                            F.floor(e * F.col(x) * F.lit(1e12) + F.lit(0.5)).cast(
                                "decimal(28,0)"
                            )
                        ).cast("double")
                        / F.count("*")
                        + F.lit(0.5)
                    )
                    / F.lit(1e12)
                ).alias(f"g{i}")
            )
        g = pdf.agg(*aggs).collect()[0]  # 1 row / 7 doubles of model state
        w = {
            "b": r6py(w["b"] - lr * g["gb"]),
            **{
                f"w{i}": r6py(w[f"w{i}"] - lr * g[f"g{i}"])
                for i in range(1, 7)
            },
        }

    scored = _p(w, labeled)
    return scored.select(
        "id", "weak_label", F.col("p").alias("quality_prob")
    )


# Gopher rule thresholds (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", Table A1) — the
# standard pretraining-corpus document gates.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.10   # '#' or '…'/'...' per word
GOPHER_MIN_ALPHA_WORD_FRAC = 0.80
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_STOP_HITS = 2


def gopher_rules(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style document quality rules, one JVM-side pass per doc —
    no shuffle, no Python. Emits each rule's measurement, its boolean,
    and the conjunction (``passes_gopher``). Replaces the reference's
    eyeball-the-plot quality control (SURVEY.md §5) with the published
    rule set used for pretraining corpora; at 100 TB this is a pure
    map stage that AQE can fuse with the scan.
    """
    toks = tokens_expr(text_col)
    text = F.col(text_col)
    n_words = F.size(toks)
    mean_wl = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / n_words
    n_symbols = (
        F.length(text) - F.length(F.regexp_replace(text, r"#", ""))
        + F.floor(
            (F.length(text) - F.length(F.regexp_replace(text, r"\.\.\.", "x")))
            / F.lit(2)
        )
    )
    alpha_frac = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))) / n_words
    stop_hits = F.size(
        F.array_intersect(toks, F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]))
    )
    ok_words = n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    ok_wl = mean_wl.between(GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN)
    ok_sym = (n_symbols / n_words) < GOPHER_MAX_SYMBOL_RATIO
    ok_alpha = alpha_frac > GOPHER_MIN_ALPHA_WORD_FRAC
    ok_stop = stop_hits >= GOPHER_MIN_STOP_HITS
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(n_symbols / n_words, 6).alias("symbol_word_ratio"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        stop_hits.alias("stop_hits"),
        ok_words.alias("ok_word_count"),
        ok_wl.alias("ok_mean_word_len"),
        ok_sym.alias("ok_symbol_ratio"),
        ok_alpha.alias("ok_alpha_words"),
        ok_stop.alias("ok_stopwords"),
        (ok_words & ok_wl & ok_sym & ok_alpha & ok_stop).alias("passes_gopher"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping fixed-token chunking (training-sample / RAG prep):
    windows of ``chunk_tokens`` whitespace tokens every ``stride``
    tokens (overlap = chunk_tokens - stride). Generalizes the
    reference's single-series sliding window (G5, app.py:285-295) to a
    corpus of documents: starts generated with ``sequence`` and
    exploded — pure narrow fan-out, chunking parallelism is inherited
    from the scan partitioning, so 100 TB chunks without any shuffle.
    Chunk text is emitted as md5 so downstream dedup/packing can join
    on it without carrying the payload.
    """
    toks = tokens_expr(text_col)
    out = (
        df.select(F.col(id_col), toks.alias("toks"))
        .select(
            id_col,
            "toks",
            F.posexplode(
                F.sequence(F.lit(1), F.greatest(F.size("toks"), F.lit(1)), F.lit(stride))
            ).alias("chunk_id", "start"),
        )
        .select(
            id_col,
            "chunk_id",
            F.col("start").alias("chunk_start"),
            F.slice("toks", F.col("start"), chunk_tokens).alias("chunk"),
        )
    )
    return out.select(
        id_col,
        "chunk_id",
        "chunk_start",
        F.size("chunk").alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", "chunk")).alias("chunk_md5"),
    )


def bpe_learn_merges(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Learn Byte-Pair-Encoding merges over the corpus (Sennrich et al.
    2016) — tokenizer FITTING, the step upstream of every token-count /
    packing operator in this module.

    Spark-first decomposition: the corpus collapses to a WORD-FREQUENCY
    table first (one corpus-sized aggregate materialized ONCE;
    everything after runs on the vocabulary, which is orders of
    magnitude smaller than 100 TB of text). Each word's symbol
    sequence lives as a MARKER-WRAPPED string (chr(30)||sym||chr(31)
    per symbol), because on that representation the greedy
    left-to-right pair merge is exactly the built-in ``replace`` —
    non-overlapping, resuming after each replacement — so each of the
    ``n_merges`` rounds is pure JVM expressions (no Python, no Arrow
    round-trips; round-6 rework of the former per-round pandas-UDF
    kernel):

      1. split the wrapped string back to symbols and explode adjacent
         pairs (two ``slice``s zipped — pure narrow fan-out);
      2. ONE vocab-sized groupBy summing word frequencies per pair;
      3. argmax pair (ties → lexicographic (left, right) so the merge
         sequence is deterministic cross-run) — a 1-row collect, the
         only driver data per round;
      4. chain one ``replace`` onto the (lazily composed) symbol
         expression — round k's aggregate evaluates k replaces in
         flight over the one materialized vocab table, keeping the
         whole learn at one corpus scan + n_merges vocab-local jobs.

    The same wrapped representation replays in the DuckDB oracle
    (plans/text_plans._bpe_learn_ctes) and serves application
    (text_bpe_apply). Returns ``(rank, left, right, pair_count)`` —
    the ordered merge table a BPE tokenizer is. The classic hug/pug
    merge-order example is pinned in tests/test_text_extra.py.
    """
    RS, US = "\x1e", "\x1f"
    spark = df.sparkSession
    words = (
        df.select(
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    cur = words.select(
        "freq",
        F.regexp_replace("word", "(.)", RS + "$1" + US).alias("s"),
    ).transform(stage_checkpoint, eager=True)

    s_expr = F.col("s")
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        sy = F.split(
            F.regexp_replace(s_expr, "^" + RS + "|" + US + "$", ""), US + RS
        )
        l_arr = F.slice(sy, 1, F.size(sy) - 1)
        r_arr = F.slice(sy, 2, F.size(sy) - 1)
        pairs = (
            cur.where(F.size(sy) >= 2)
            .select("freq", F.explode(F.arrays_zip(l_arr.alias("l"), r_arr.alias("r"))).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("n"))
        )
        best = pairs.orderBy(F.desc("n"), "l", "r").limit(1).collect()
        if not best:
            break
        l, r, n = best[0]["l"], best[0]["r"], int(best[0]["n"])
        merges.append((rank, l, r, n))
        s_expr = F.replace(
            s_expr, F.lit(RS + l + US + RS + r + US), F.lit(RS + l + r + US)
        )

    cur.unpersist()
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count long"
    )


def _unigram_best_seg(
    word: str, lp: dict[str, int], max_piece: int
) -> tuple[int, str] | None:
    """Deterministic Viterbi over a word: enumerate every segmentation
    into vocab pieces (lengths 1..max_piece) and pick the one
    maximizing the INTEGER micro-nat score Σ lp(piece), ties broken by
    fewer pieces then lexicographically smallest piece-length string —
    the same (score DESC, np ASC, lens ASC) argmax the DuckDB oracle's
    row_number applies, exactly comparable because scores are exact
    int64 sums and piece lengths are single digits. Returns
    (score, lens_digits) or None when no segmentation exists (a char
    outside the vocabulary — impossible when the vocab was seeded from
    the same corpus)."""
    n = len(word)
    best: tuple[int, int, str] | None = None  # (-score, np, lens)

    def rec(pos: int, score: int, lens: list[str]) -> None:
        nonlocal best
        if pos == n:
            key = (-score, len(lens), "".join(lens))
            if best is None or key < best:
                best = key
            return
        for pl in range(1, min(max_piece, n - pos) + 1):
            piece = word[pos : pos + pl]
            if piece in lp:
                rec(pos + pl, score + lp[piece], lens + [str(pl)])

    rec(0, 0, [])
    return None if best is None else (-best[0], best[2])


def unigram_lm_fit(
    df: DataFrame,
    rounds: int = 3,
    top_k: int = 40,
    max_piece: int = 4,
    max_word: int = 18,
    text_col: str = "text",
    driver_words: int = 10_000,
) -> tuple[list[tuple[int, str, int, int]], DataFrame]:
    """Unigram-LM tokenizer fitting (Kudo 2018, the SentencePiece
    objective) as a DETERMINISTIC fixed-round twin — round-9 verdict
    ask #6, the c7b_gmm_md5em discipline applied to tokenizer EM:

    - seed vocabulary = every single character plus the ``top_k``
      most frequent substrings of length 2..max_piece, counts weighted
      by word frequency with overlapping occurrences, deterministic
      (count DESC, piece ASC) selection — a BOUNDED model state;
    - ``rounds`` hard-EM iterations: the E-step segments each distinct
      word by exact-integer Viterbi over 6-dp-quantized log-probs
      (lp = floor(ln(count/total)·1e6 + 0.5) micro-nats — int64 sums,
      no float folds, so the argmax replays bit-for-bit in DuckDB),
      the M-step recounts piece usage weighted by word frequency with
      +1 smoothing over the FIXED vocabulary (no pruning — vocabulary
      stability is what lets the oracle enumerate segmentations once);
    - corpus-sized work is Spark-side (the word-frequency aggregate
      and the substring-count explode), and the per-distinct-word
      E-step segmentation is SIZE-GATED (round-9 review fix: the
      vocabulary is corpus-dependent, so an unconditional driver loop
      would be single-threaded CPU scaling with distinct words): at or
      below ``driver_words`` distinct words it runs driver-side in
      exact Python ints (4 chained Spark jobs cost ~1.2 s in
      scheduling constants alone — measured, the e3b discipline),
      above it each round is an Arrow-batched mapInPandas over the
      word-frequency frame with the ≤100-entry lp table in closure
      and a vocab-sized int64 groupBy — identical values either way
      (same exact-integer kernel). The bounded (≤ alphabet+top_k)-row
      COUNT state always folds driver-side between rounds.

    Returns (schedule, npf_df): schedule rows are
    (round, piece, count, lp_micro) for rounds 0..``rounds`` — the
    vocabulary schedule — and npf_df is a ``(word, np)`` DataFrame of
    FINAL-round segment counts per distinct word (fertility
    application joins it back to the corpus; it is never collected).
    Reference: app.py has no tokenizer; this extends the text family
    the packing/token-budget plans presuppose (SURVEY §6)."""
    import math

    if not 1 <= max_piece <= 9:
        # the one-digit-per-piece lens encoding is load-bearing for
        # the DuckDB oracle's lens-string tie-break (review finding)
        raise ValueError(f"max_piece must be 1..9, got {max_piece}")

    wf_df = (
        df.select(F.explode(tokens_expr(text_col)).alias("word"))
        .where((F.col("word") != "") & (F.length("word") <= max_word))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .persist()
    )
    # substring counts: one JVM-side explode over (start, len) — the
    # corpus-sized aggregate; overlapping occurrences counted, weighted
    # by word frequency
    sub = (
        wf_df.select(
            "freq",
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, length(word)), s -> "
                    f"transform(sequence(s, least(s + {max_piece - 1}, length(word))), "
                    "e -> substring(word, s, e - s + 1))))"
                )
            ).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )
    singles = sub.where(F.length("piece") == 1)
    extras = (
        sub.where(F.length("piece") >= 2)
        .orderBy(F.desc("cnt"), "piece")
        .limit(top_k)
    )
    vocab0 = {
        r["piece"]: int(r["cnt"])
        for r in singles.unionByName(extras).collect()
    }

    def lp_table(counts: dict[str, int]) -> dict[str, int]:
        tot = float(sum(counts.values()))
        return {
            p: int(math.floor(math.log(c / tot) * 1_000_000 + 0.5))
            for p, c in counts.items()
        }

    def apply_seg(word: str, freq: int, lp: dict[str, int], acc: dict[str, int]) -> None:
        seg = _unigram_best_seg(word, lp, max_piece)
        assert seg is not None, word
        pos = 0
        for d in seg[1]:
            piece = word[pos : pos + int(d)]
            acc[piece] = acc.get(piece, 0) + freq
            pos += int(d)

    n_words = wf_df.count()
    wf_local: dict[str, int] | None = None
    if n_words <= driver_words:
        wf_local = {r["word"]: int(r["freq"]) for r in wf_df.collect()}

    def seg_usage(lp: dict[str, int]) -> dict[str, int]:
        """One E-step: per-distinct-word exact-int Viterbi — driver
        loop below the gate, Arrow-batched mapInPandas + vocab-sized
        int64 groupBy above it. Identical values either way."""
        if wf_local is not None:
            acc: dict[str, int] = {}
            for word, freq in wf_local.items():
                apply_seg(word, freq, lp, acc)
            return acc
        import pandas as pd

        def run(batches):
            for pdf in batches:
                acc: dict[str, int] = {}
                for word, freq in zip(pdf["word"], pdf["freq"]):
                    apply_seg(str(word), int(freq), lp, acc)
                yield pd.DataFrame(
                    {"piece": list(acc), "used": list(acc.values())}
                )

        return {
            r["piece"]: int(r["used"])
            for r in wf_df.mapInPandas(run, schema="piece string, used long")
            .groupBy("piece")
            .agg(F.sum("used").alias("used"))
            .collect()
        }

    schedule: list[tuple[int, str, int, int]] = []
    counts = dict(vocab0)
    lp: dict[str, int] = {}
    for r in range(rounds + 1):
        lp = lp_table(counts)
        schedule += [(r, p, counts[p], lp[p]) for p in sorted(counts)]
        if r == rounds:
            break
        used = seg_usage(lp)
        counts = {p: 1 + used.get(p, 0) for p in counts}

    # final-round per-word segment counts for fertility application —
    # as a DataFrame (broadcast-join fodder), built from the gated
    # local table when one exists, else computed where the words live
    lp_final = dict(lp)
    mp = max_piece
    if wf_local is not None:
        npf_df = df.sparkSession.createDataFrame(
            sorted(
                (w, len(_unigram_best_seg(w, lp_final, mp)[1]))
                for w in wf_local
            ),
            "word string, np long",
        )
    else:

        def np_run(batches):
            import pandas as pd

            for pdf in batches:
                words = [str(w) for w in pdf["word"]]
                nps = [
                    len(_unigram_best_seg(w, lp_final, mp)[1]) for w in words
                ]
                yield pd.DataFrame({"word": words, "np": nps})

        npf_df = wf_df.mapInPandas(np_run, schema="word string, np long")
    # deterministic reclamation: the E-step rounds are done; a
    # distributed npf_df lazily recomputes the word-frequency
    # aggregate if consumed later (one corpus scan — cheaper than
    # leaking cached blocks)
    wf_df.unpersist()
    return schedule, npf_df
