"""Deterministic corpus sampling / splitting and corpus-level statistics.

Training-data pipelines need train/valid/test splits that are (a) stable
across reruns and cluster sizes, (b) independent of row order and partition
count, and (c) reproducible by any engine reading the same table.  Random
splits (``df.randomSplit``) violate all three.  The portable answer is
content hashing: bucket = first 8 hex chars of md5(salt ‖ id); a document's
split is a pure function of its id.

The md5-hex prefix is uniform over 16^8 buckets, and because both Spark and
DuckDB emit lowercase hex, the threshold comparison is a plain string
compare — the DuckDB oracle mirrors the expression byte-for-byte (no engine
hash functions, which never match across engines).

Scale: one scan, no shuffle (the split column is a row-local expression
pushed into whole-stage codegen); a groupBy on the split adds one partial-agg
shuffle.  No Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphina_spark.functions.textstats import quality_score, token_count

_HEX_SPACE = 16**8


def _hex_threshold(frac: float) -> str:
    """Cumulative fraction → zero-padded 8-char lowercase hex threshold."""
    return format(min(_HEX_SPACE, int(frac * _HEX_SPACE)), "08x")


def split_bucket(id_col: Column, salt: str = "split") -> Column:
    """First 8 hex chars of md5('<salt>:' ‖ id-as-string)."""
    return F.substring(
        F.md5(F.concat(F.lit(salt + ":"), id_col.cast("string"))), 1, 8
    )


def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """(id, split) — hash-stratified assignment, e.g. 80/10/10.

    ``weights`` maps split name → fraction (must sum to ~1; the last split
    absorbs rounding).  Assignment depends only on (salt, id): adding or
    removing other rows never moves a document between splits — the property
    that keeps eval sets uncontaminated across corpus versions.
    """
    if weights is None:
        weights = {"train": 0.8, "valid": 0.1, "test": 0.1}
    if len(weights) < 2:
        raise ValueError("need at least two splits")
    names = list(weights)
    bucket = split_bucket(F.col(id_col), salt)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name]
        cond = bucket < F.lit(_hex_threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = expr.otherwise(names[-1])
    return df.select(F.col(id_col).alias("id"), expr.alias("split"))


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, str]]:
    """[(name, cumulative-hex-threshold)] for all but the last split — the
    exact constants the SQL oracle embeds."""
    names = list(weights)
    out, cum = [], 0.0
    for name in names[:-1]:
        cum += weights[name]
        out.append((name, _hex_threshold(cum)))
    return out


def corpus_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """(split, n_docs, total_tokens, avg_tokens, median_tokens, avg_quality)
    — per-split corpus health counters over the deterministic split.

    Token counts are exact integers (sums are order-independent); the two
    float columns (mean quality, interpolated median) are rounded by the
    caller's gate.  One shuffle (the groupBy)."""
    splits = deterministic_split(df, id_col=id_col, weights=weights, salt=salt)
    stats = df.select(
        F.col(id_col).alias("id"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        quality_score(F.col(text_col)).alias("quality"),
    )
    return (
        splits.join(stats, "id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.avg("n_tokens").alias("avg_tokens"),
            F.expr("percentile(n_tokens, 0.5)").alias("median_tokens"),
            F.avg("quality").alias("avg_quality"),
        )
    )


def filter_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int | None = None,
    min_quality: float = 0.3,
    langs: list[str] | None = None,
) -> DataFrame:
    """(id, n_tokens, quality, lang_pred, keep, reject_reason) — the standard
    corpus quality gate, as one codegen'd scan (no shuffle, no UDFs).

    ``reject_reason`` names the FIRST failing rule in a fixed order
    (too_short, too_long, low_quality, lang) so drop accounting is stable;
    ``keep`` = no rule failed.  Rules mirror exactly into the SQL oracle."""
    from graphina_spark.functions.textstats import lang_id

    t = F.col(text_col)
    base = df.select(
        F.col(id_col).alias("id"),
        token_count(t).cast("long").alias("n_tokens"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
    )
    reason = F.when(F.col("n_tokens") < min_tokens, "too_short")
    if max_tokens is not None:
        reason = reason.when(F.col("n_tokens") > max_tokens, "too_long")
    reason = reason.when(F.col("quality") < min_quality, "low_quality")
    if langs is not None:
        reason = reason.when(~F.col("lang_pred").isin(list(langs)), "lang")
    reason = reason.otherwise(F.lit(None).cast("string"))
    return base.select(
        "id",
        "n_tokens",
        "quality",
        "lang_pred",
        reason.isNull().alias("keep"),
        reason.alias("reject_reason"),
    )


def top_ngrams(
    df: DataFrame,
    n: int = 2,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """(ngram, freq, docs) — the k most frequent word n-grams with total
    occurrence count (multiset) and document frequency; ties broken by the
    n-gram string ascending so top-k is deterministic.

    Classic corpus-health / contamination probe.  Shape: one explode scan →
    one partial+final hash aggregation → a k-row ordered take (rank via a
    single max-k aggregation boundary, executed as TakeOrdered — no global
    sort materialization)."""
    from graphina_spark.functions.textstats import ngrams_col, tokens_col

    grams = ngrams_col(tokens_col(F.col(text_col)), n)
    per_doc = df.select(F.explode(grams).alias("ngram"))
    agg = per_doc.groupBy("ngram").agg(F.count("*").alias("freq"))
    docs = (
        df.select(F.explode(F.array_distinct(grams)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("docs"))
    )
    return (
        agg.join(docs, "ngram")
        .orderBy(F.desc("freq"), "ngram")
        .limit(k)
    )


def vocab_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """1 row (vocab_size, total_tokens, hapax_count, max_token_freq) —
    corpus vocabulary health: distinct tokens, total token mass, hapax
    legomena (frequency-1 tokens, the classic OCR-garbage indicator), and
    the modal token's frequency.  Exact integers: one explode scan + two
    hash aggregations."""
    from graphina_spark.functions.textstats import tokens_col

    freq = (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("tk"))
        .groupBy("tk")
        .agg(F.count("*").alias("f"))
    )
    # zero-row freq table (every doc tokenizes to nothing): the health
    # readout says 0, not NULL — sum/max over no rows is NULL in BOTH
    # engines, a mirrored blind spot the parity gate can't see
    # (tests/test_readout_edgecases.py)
    zero = F.lit(0).cast("long")
    return freq.agg(
        F.count("*").alias("vocab_size"),
        F.coalesce(F.sum("f"), zero).alias("total_tokens"),
        F.coalesce(
            F.sum(F.when(F.col("f") == 1, 1).otherwise(0)).cast("long"), zero
        ).alias("hapax_count"),
        F.coalesce(F.max("f"), zero).alias("max_token_freq"),
    )


def doc_repetition(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_tokens, distinct_token_ratio, top_bigram_frac, dup_bigram_frac)
    — Gopher-style repetition signals (Rae et al. 2021 §A1.1 family):
    fraction of token mass in the modal bigram, fraction in any repeated
    bigram, and the distinct-token ratio.  High values flag boilerplate and
    degenerate generations.

    Shape: one explode scan → (doc, bigram) hash aggregation → per-doc
    re-aggregation — two shuffles keyed by doc id, no UDFs.  All ratios are
    single integer divisions, bit-identical across engines (no rounding)."""
    from graphina_spark.functions.textstats import ngrams_col, tokens_col

    base = df.select(
        F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("t")
    )
    tok = base.select(
        "id",
        F.size("t").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("t")).cast("long").alias("n_distinct"),
    )
    cnt = (
        base.select("id", F.explode(ngrams_col(F.col("t"), 2)).alias("g"))
        .groupBy("id", "g")
        .agg(F.count("*").alias("c"))
    )
    rep = cnt.groupBy("id").agg(
        F.sum("c").alias("nb"),
        F.max("c").alias("top_c"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("dup_c"),
    )
    return tok.join(rep, "id", "left").select(
        "id",
        "n_tokens",
        (
            F.col("n_distinct") / F.greatest(F.col("n_tokens"), F.lit(1))
        ).alias("distinct_token_ratio"),
        F.coalesce(F.col("top_c") / F.col("nb"), F.lit(0.0)).alias(
            "top_bigram_frac"
        ),
        F.coalesce(F.col("dup_c") / F.col("nb"), F.lit(0.0)).alias(
            "dup_bigram_frac"
        ),
    )


def split_contamination(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """(split, n_docs, contaminated, frac) for every non-train split — a doc
    is contaminated when it shares at least one k-token shingle with any
    train document.  The standard eval-leakage audit run before training.

    Shape: shingle inverted index (explode + distinct), one left-semi join
    of eval shingles against the distinct train shingle set keyed by
    shingle (hot shingles dedup before the join — no pair blowup), one
    per-split count.  Scales as O(total shingles), never O(docs²)."""
    from graphina_spark.functions.textstats import shingles_col

    sp = deterministic_split(df, id_col=id_col, weights=weights, salt=salt)
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles_col(F.col(text_col), k)).alias("sg"),
    )
    train_ids = sp.where(F.col("split") == "train").select("id")
    train_sh = sh.join(train_ids, "id", "left_semi").select("sg").distinct()
    eval_sp = sp.where(F.col("split") != "train")
    dirty = (
        sh.join(train_sh, "sg", "left_semi")
        .select("id")
        .distinct()
        .withColumn("dirty", F.lit(1))
    )
    return (
        eval_sp.join(dirty, "id", "left")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce(F.col("dirty"), F.lit(0)))
            .cast("long")
            .alias("contaminated"),
        )
        .select(
            "split",
            "n_docs",
            "contaminated",
            (F.col("contaminated") / F.col("n_docs")).alias("frac"),
        )
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """(id, rnk, term, tfidf) — each document's k highest-scoring terms by
    smoothed tf-idf (idf = ln((N+1)/(df+1)) + 1, scikit-learn's smooth_idf),
    ties broken by term ascending.

    Shape: explode → (doc, term) count → term df aggregation → shuffle join
    on term → per-doc top-k window (row_number over the doc partition; the
    partition is one document's vocabulary, so the window never spills)."""
    from pyspark.sql import Window

    from graphina_spark.functions.textstats import tokens_col

    tf = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(tokens_col(F.col(text_col))).alias("term"),
        )
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = df.agg(F.count("*").alias("n"))
    scored = (
        tf.join(dfq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "id",
            "term",
            (
                F.col("tf")
                * (F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + 1.0)
            ).alias("s"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("s"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("id", "rnk", "term", F.round("s", 6).alias("tfidf"))
    )


def sample_vertices(
    g,
    frac: float,
    salt: str = "vsample",
) -> DataFrame:
    """(id) — deterministic vertex sample: keep id iff its md5 bucket falls
    below the ``frac`` threshold (same primitive as :func:`deterministic_split`).
    Stable across reruns, row order, partitioning, and corpus versions —
    the reproducible alternative to ``DataFrame.sample`` for training-data
    graph subsets.  Zero shuffle (row-local predicate, pushed to the scan)."""
    return g.vertices.select("id").where(
        split_bucket(F.col("id"), salt) < F.lit(_hex_threshold(frac))
    )


def sample_edges(
    g,
    frac: float,
    salt: str = "esample",
) -> DataFrame:
    """(src, dst, weight) — deterministic edge sample keyed on the edge pair
    (md5 of 'src:dst'), same stability contract as :func:`sample_vertices`."""
    key = F.concat(
        F.lit(salt + ":"),
        F.col("src").cast("string"),
        F.lit(":"),
        F.col("dst").cast("string"),
    )
    bucket = F.substring(F.md5(key), 1, 8)
    return g.edges.where(bucket < F.lit(_hex_threshold(frac)))


def induced_sample_subgraph(g, frac: float, salt: str = "vsample"):
    """LinkGraph induced on a deterministic vertex sample — the standard
    "debug at 1%" graph: vertex predicate + two semi-joins, no shuffle
    beyond the joins themselves."""
    from graphina_spark.graph import LinkGraph

    verts = sample_vertices(g, frac, salt)
    edges = (
        g.edges.join(verts.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(verts.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .select("src", "dst", "weight")
    )
    return LinkGraph(vertices=verts, edges=edges, directed=g.directed)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fracs: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "strata",
    default_frac: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling — the data-mixing primitive: keep
    each row iff its md5 bucket falls below its stratum's threshold, so a
    training mix like {"wiki": 1.0, "crawl": 0.1} is one row-local predicate
    (zero shuffle, pushes to the scan) and is stable across reruns,
    partitioning, and corpus growth (a row's fate depends only on its id).

    Strata absent from ``fracs`` fall back to ``default_frac`` (0.0 = drop —
    the allowlist behavior a curated mix wants)."""
    thr = F.lit(_keep_threshold(default_frac))
    for s, frac in sorted(fracs.items()):
        thr = F.when(F.col(strata_col) == s, F.lit(_keep_threshold(frac))).otherwise(thr)
    return df.where(split_bucket(F.col(id_col), salt) < thr)


def _keep_threshold(frac: float) -> str:
    """Like _hex_threshold but safe at frac=1.0 for a `bucket < thr` keep
    predicate: 16^8 formats to 9 chars ('100000000'), which sorts BELOW
    most 8-char hex buckets lexicographically and would silently drop
    ~94% of a keep-everything stratum; 'g' sorts above every hex string."""
    return "g" if frac >= 1.0 else _hex_threshold(frac)


def mixture_plan(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    max_epochs: float = 4.0,
) -> DataFrame:
    """(source, available_tokens, target_tokens, rate, epochs) — the sampling
    plan that realizes a target domain mixture under a token budget.

    Every pretraining run starts here (GPT-3 Table 2.2, The Pile, LLaMA's
    mixture tables): given per-source mixture ``weights`` (normalized over
    the sources present) and a ``token_budget``, compute per source the
    available token mass, the target mass ``budget · weight``, the sampling
    ``rate = target / available`` (rate > 1 = the source must repeat), and
    ``epochs = ceil(rate)`` capped at ``max_epochs`` — the practical repeat
    guard (Muennighoff 2023: ≥4 epochs of repeated data stops helping).
    Sources in the corpus but not in ``weights`` get weight 0 (rate 0 =
    dropped); weights for absent sources are ignored (renormalization is
    over PRESENT sources, so the plan always spends the full budget).

    Scale shape: one groupBy(source) token aggregation (map-side combined) +
    a broadcast weights table + closed-form arithmetic — a 100 TB corpus
    plan is one pass, no collect.  The plan frame is #sources rows: feed it
    to :func:`stratified_sample`'s rates to materialize the mixture.
    DuckDB twin: oracles_text.py::mixture_plan_sql (identical
    renormalization and rounding).
    """
    from graphina_spark.functions.textstats import token_count

    spark = df.sparkSession
    avail = (
        df.select(
            F.col(source_col).alias("source"),
            token_count(F.col(text_col)).cast("long").alias("n"),
        )
        .groupBy("source")
        .agg(F.sum("n").alias("available_tokens"))
    )
    wdf = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(weights.items())], "source string, w double"
    )
    j = avail.join(F.broadcast(wdf), "source", "left").select(
        "source", "available_tokens", F.coalesce("w", F.lit(0.0)).alias("w")
    )
    tot = j.agg(F.sum("w").alias("tw"))
    return (
        j.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "available_tokens",
            F.round(
                F.lit(float(token_budget)) * F.col("w") / F.col("tw"), 6
            ).alias("target_tokens"),
            F.round(
                F.lit(float(token_budget))
                * F.col("w")
                / F.col("tw")
                / F.col("available_tokens"),
                6,
            ).alias("rate"),
            F.least(
                F.ceil(
                    F.lit(float(token_budget))
                    * F.col("w")
                    / F.col("tw")
                    / F.col("available_tokens")
                ),
                F.lit(int(max_epochs)),
            )
            .cast("long")
            .alias("epochs"),
        )
    )


def source_divergence(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(source, n_tokens, kl_bits) — KL(p_source ‖ p_corpus) in bits over
    unigram token distributions: how far each source's language drifts from
    the corpus mixture.  The standard domain-shift readout a data pipeline
    tracks per crawl/source (CCNet monitors exactly this family; DSIR's
    importance weights are the per-document form — this is the per-source
    dashboard scalar).  No smoothing is needed: every source token occurs
    in the corpus by construction, so the ratio is always finite.

    Scale shape: one (source, token) count (map-side combined, ≤
    vocab × sources rows) joined to the corpus token counts on the same key
    plus two broadcast 1-row totals — two shuffles on the token key, no
    per-doc state, no pairs.  DuckDB twin: oracles_text.py::source_kl_sql.
    """
    from graphina_spark.functions.textstats import tokens_col

    tok = df.select(
        F.col(source_col).alias("source"),
        F.explode(tokens_col(F.col(text_col))).alias("w"),
    )
    per = tok.groupBy("source", "w").agg(F.count("*").alias("cs"))
    corpus = per.groupBy("w").agg(F.sum("cs").alias("c"))
    tots = per.groupBy("source").agg(F.sum("cs").alias("ts"))
    grand = corpus.agg(F.sum("c").alias("t"))
    return (
        per.join(corpus, "w")
        .join(F.broadcast(tots), "source")
        .crossJoin(F.broadcast(grand))
        .groupBy("source")
        .agg(
            F.sum("cs").cast("long").alias("n_tokens"),
            F.round(
                F.sum(
                    (F.col("cs") / F.col("ts"))
                    * F.log2(
                        (F.col("cs") / F.col("ts")) / (F.col("c") / F.col("t"))
                    )
                ),
                6,
            ).alias("kl_bits"),
        )
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """(id, weight, es_key) — k-item weighted sample WITHOUT replacement
    (Efraimidis & Spirakis 2006): draw u_i ~ U(0,1), keep the k largest
    u_i^(1/w_i) — equivalently the k largest ln(u_i)/w_i.  P(item in
    sample) is exactly proportional-without-replacement, the distributed
    one-pass answer to "sample 1M docs ∝ quality score".

    Determinism (the repo's sampling convention, operators/sampling.py::
    deterministic_split): u_i is not random but md5-derived —
    ``hexint = first 8 hex chars of md5(salt:id)``, ``u = (hexint + 1) /
    (16^8 + 1)`` ∈ (0,1) — so the sample is reproducible across runs,
    partitionings and engines, and refreshes only when ``salt`` changes.
    Rows with weight ≤ 0 are excluded (ES domain).

    Scale shape: one projection + one global top-k (TakeOrdered — per
    partition a k-row heap, then a k·partitions merge on the driver; k
    rows of driver state, no full sort, no shuffle of the corpus).
    DuckDB twin: oracles_text.py::weighted_sample_sql.
    """
    hexint = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = (hexint + 1) / F.lit(float(16**8 + 1))
    scored = (
        df.where(F.col(weight_col) > 0)
        .select(
            F.col(id_col).alias("id"),
            F.col(weight_col).cast("double").alias("weight"),
            (F.log(u) / F.col(weight_col)).alias("_key"),
        )
    )
    return (
        scored.orderBy(F.desc("_key"), F.asc("id"))
        .limit(k)
        .select("id", "weight", F.round("_key", 6).alias("es_key"))
    )


def zipf_fit(
    df: DataFrame,
    top_n: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """1 row (n_terms, alpha, intercept) — least-squares fit of the Zipf
    rank–frequency law over the top ``top_n`` corpus tokens:
    ln f(r) ≈ intercept − alpha·ln r.  The corpus-health readout every
    tokenizer/dedup report includes (a natural corpus sits near α ≈ 1;
    template/boilerplate-heavy crawls flatten it).

    Rank order is total — (frequency desc, token asc) — so the fit is
    deterministic across engines and partitionings.  Scale shape: one token
    count aggregation (map-side combined over the corpus), a top-N
    TakeOrdered (N rows of driver-adjacent state, never a vocab-wide global
    window), then closed-form regression sums over N rows.  DuckDB twin:
    oracles_text.py::zipf_fit_sql.
    """
    from pyspark.sql import Window

    from graphina_spark.functions.textstats import tokens_col

    tok = df.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
    counts = tok.groupBy("w").agg(F.count("*").alias("f"))
    top = counts.orderBy(F.desc("f"), F.asc("w")).limit(top_n)
    # rank within the ≤ top_n surviving rows: bounded single-task window by
    # construction (the limit precedes it), not a vocab-wide sort
    w = Window.orderBy(F.desc("f"), F.asc("w"))
    xy = top.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("f").cast("double")).alias("y"),
    )
    s = xy.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    # degenerate corpora (0 or 1 distinct tokens): the slope is 0/0 —
    # DuckDB's double division yields NULL, but Spark's ANSI mode THROWS
    # DIVIDE_BY_ZERO, so guard to the twin's NULL convention explicitly
    # (tests/test_readout_edgecases.py)
    num = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    den = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    slope = F.when((F.col("n") > 0) & (den != 0), num / den)
    return s.select(
        F.col("n").cast("long").alias("n_terms"),
        F.round(-slope, 6).alias("alpha"),
        F.round(F.col("sy") / F.col("n") - slope * F.col("sx") / F.col("n"), 6).alias(
            "intercept"
        ),
    )
