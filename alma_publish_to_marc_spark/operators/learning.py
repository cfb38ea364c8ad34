"""Distributed classifier TRAINING in pure DataFrame ops — the train
half of the quality-filter story (`plans/corpus_queries.py::
quality_classifier_score` serves a frozen logistic model; this induces
one from the corpus).

Full-batch gradient descent on logistic loss, K unrolled rounds, in
**quantized integer space** (the `operators/clustering.py` recipe):

- features are exact micro-unit integers (×1e6), labels ∈ {0, 1e6};
- the margin z is one int64 dot product (≤4e12, no overflow) divided
  once by 1e12 — a single correctly-rounded IEEE division;
- the sigmoid is the ONLY transcendental; its output is immediately
  quantized to micro units, so a ≤1-ulp exp() difference between
  engines can only surface if a value lands within 1 ulp of a .5 micro
  boundary (measure-zero; every other step is exact integer math);
- gradients are exact integer sums (map-side combinable), and the
  weight update rounds once back to micro units.

Scale: each round is ONE corpus scan into a 1-row gradient aggregate
(partial-aggregated, 4 numbers per partition) cross-joined back as a
broadcast — the weight state never lives on the driver and the corpus
never shuffles. K rounds = K scans, the same driver-paced shape as the
BPE trainer and connected components; at 100 TB you'd persist the
featurized projection once and stage rounds from it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load

MICRO = 1_000_000
N_ROUNDS = 2
FEATURES = ("bias", "chars", "tokens", "mwl")


def _featurized(docs: DataFrame) -> DataFrame:
    """Micro-unit integer features per doc.

    x_bias = 1; x_chars = n_chars/1000; x_tokens = n_tokens/100;
    x_mwl = mean word length / 10 — all ~[0, 1] so a unit learning rate
    is stable, all exact integers in micro units. Label: lang = 'en'.
    """
    n_tokens = F.size(F.split(F.trim("text"), r"\s+"))
    return docs.select(
        F.lit(MICRO).cast("long").alias("x_bias"),
        (F.col("n_chars") * 1000).cast("long").alias("x_chars"),
        (n_tokens * 10000).cast("long").alias("x_tokens"),
        F.round(F.lit(100000) * F.col("n_chars") / n_tokens, 0)
         .cast("long").alias("x_mwl"),
        F.when(F.col("lang") == "en", F.lit(MICRO).cast("long"))
         .otherwise(F.lit(0).cast("long")).alias("y"))


def _z(w_prefix: str = "w_") -> Column:
    """Margin: fixed-order int64 dot product, one division to double."""
    total = F.lit(0).cast("long")
    for name in FEATURES:
        total = total + F.col(f"{w_prefix}{name}") * F.col(f"x_{name}")
    return total / F.lit(float(MICRO) * MICRO)


def _p_micro() -> Column:
    """Quantized sigmoid of the margin, in micro units."""
    return F.round(F.lit(MICRO) / (F.lit(1.0) + F.exp(-_z())), 0) \
        .cast("long")


def logreg_train(docs: DataFrame, n_rounds: int = N_ROUNDS) -> DataFrame:
    """Train the quality/language classifier; returns ONE row:
    (n_examples, w_bias, w_chars, w_tokens, w_mwl — micro ints —
    train_accuracy)."""
    feats = _featurized(docs)
    w = docs.sparkSession.range(1).select(*[
        F.lit(0).cast("long").alias(f"w_{n}") for n in FEATURES])
    for _ in range(n_rounds):
        p = _p_micro()
        grads = (feats.crossJoin(F.broadcast(w))
                 .select((p - F.col("y")).alias("err"),
                         *[F.col(f"x_{n}") for n in FEATURES])
                 .groupBy()
                 .agg(F.count(F.lit(1)).alias("n"),
                      *[F.sum(F.col("err") * F.col(f"x_{n}"))
                        .alias(f"g_{n}") for n in FEATURES]))
        w = w.crossJoin(F.broadcast(grads)).select(*[
            (F.col(f"w_{n}")
             - F.round(F.col(f"g_{n}") / (F.col("n") * MICRO), 0)
                .cast("long")).alias(f"w_{n}")
            for n in FEATURES])
    acc = (feats.crossJoin(F.broadcast(w))
           .agg(F.count(F.lit(1)).alias("n_examples"),
                F.round(F.avg(
                    F.when((_z() > 0) == (F.col("y") == MICRO), 1.0)
                     .otherwise(0.0)), 4).alias("train_accuracy")))
    return (w.crossJoin(F.broadcast(acc))
            .select("n_examples", *[F.col(f"w_{n}") for n in FEATURES],
                    "train_accuracy"))


def _logreg_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return logreg_train(load(spark, sf_dir, "documents"))


def _feat_sql() -> str:
    return r"""feats AS (
    SELECT CAST({m} AS BIGINT) AS x_bias,
           CAST(n_chars * 1000 AS BIGINT) AS x_chars,
           CAST(nt * 10000 AS BIGINT) AS x_tokens,
           CAST(round(100000 * n_chars / nt, 0) AS BIGINT) AS x_mwl,
           CAST(CASE WHEN lang = 'en' THEN {m} ELSE 0 END AS BIGINT) AS y
    FROM (SELECT n_chars, lang,
                 len(regexp_split_to_array(trim(text), '\s+')) AS nt
          FROM documents)
)""".format(m=MICRO)


def _z_sql(w_cte: str) -> str:
    dot = " + ".join(f"{w_cte}.w_{n} * feats.x_{n}" for n in FEATURES)
    return f"(({dot}) / {float(MICRO) * MICRO})"


def _logreg_sql(n_rounds: int = N_ROUNDS) -> str:
    ctes = [_feat_sql(),
            "w0 AS (SELECT "
            + ", ".join(f"CAST(0 AS BIGINT) AS w_{n}" for n in FEATURES)
            + ")"]
    for i in range(n_rounds):
        z = _z_sql(f"w{i}")
        gsel = ", ".join(
            f"CAST(sum((CAST(round({MICRO} / (1.0 + exp(-{z})), 0) AS BIGINT)"
            f" - feats.y) * feats.x_{n}) AS BIGINT) AS g_{n}"
            for n in FEATURES)
        ctes.append(f"""g{i} AS (
    SELECT count(*) AS n, {gsel}
    FROM feats CROSS JOIN w{i}
)""")
        wsel = ", ".join(
            f"w{i}.w_{n} - CAST(round(g{i}.g_{n} / (g{i}.n * {MICRO}), 0)"
            f" AS BIGINT) AS w_{n}" for n in FEATURES)
        ctes.append(f"w{i + 1} AS (SELECT {wsel} FROM w{i} CROSS JOIN g{i})")
    zf = _z_sql(f"w{n_rounds}")
    wcols = ", ".join(f"w{n_rounds}.w_{n}" for n in FEATURES)
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT acc.n_examples, {wcols}, acc.train_accuracy
FROM w{n_rounds} CROSS JOIN (
    SELECT count(*) AS n_examples,
           round(avg(CASE WHEN ({zf} > 0) = (feats.y = {MICRO})
                          THEN 1.0 ELSE 0.0 END), 4) AS train_accuracy
    FROM feats CROSS JOIN w{n_rounds}
) acc
""")


QUERIES = {
    "logreg_train_fixed_point": (_logreg_query, _logreg_sql()),
}
