"""LLM post-training / serving analytics (round 9).

The corpus/lm/preference families cover pre-training curation and
preference QA; this module adds the operators the POST-training and
serving side of an LLM pipeline runs at scale:

- ``grpo_group_advantage``    — GRPO-style group-relative advantage
  normalization ((r − mean)/std within a prompt's response group) —
  the reward-shaping aggregate of critic-free RLHF.
- ``gae_advantage_fold``      — GAE(γ, λ) advantage recursion per
  episode (backward fold over per-user event sequences) — the
  actor-critic counterpart, in exact small-denominator fixed point.
- ``prompt_prefix_cache_stats`` — shared-prefix KV-cache analysis:
  how many prompt tokens a radix/prefix cache could skip, by
  prefix-group size — the serving-cost planner's first question.
- ``int8_quantization_error`` — per-vector symmetric int8
  post-training quantization of the embedding table: reconstruction
  max-error / MSE by label — the PTQ audit before shipping a
  quantized index.
- ``heaps_law_log2_fit``      — per-document type/token power-law
  (Heaps) slope via EXACT integer least squares on floor-log2
  coordinates (``length(bin(x)) - 1``) — the scaling-curve fit
  without a single libm call.
- ``epsilon_greedy_replay``   — offline bandit policy replay (matched-
  step estimator, fully integer argmax policy).
- ``context_window_waste``    — truncation-waste / fill curve per
  candidate context window (the serving/packing planner's trade-off).
- ``moe_router_balance``      — MoE dispatch balance + switch auxiliary
  loss from hash routing.
- ``checkpoint_interval_daly`` — Young/Daly optimal checkpoint interval
  from measured failure MTBF.
- ``model_cascade_cost``      — small→big routing cost curve over
  candidate confidence thresholds (TTR-gated cascade planning).
- ``speculative_draft_policy`` — speculative-decoding DEPTH planning
  (round 10): expected accepted tokens and per-round speedup for each
  candidate draft length, from the measured bigram acceptance rate —
  the policy curve on top of ``speculative_accept_rate``'s
  measurement (ir_queries).
- ``kv_cache_memory_budget``  — KV-cache capacity table per context
  cap (round 10): worst-case vs expected batch size under a fixed
  HBM cache pool — the contiguous-vs-paged overcommit headroom.
- ``paged_attention_fragmentation`` — internal fragmentation per
  candidate KV page size vs contiguous reservation waste (round 10):
  the vLLM block-size sizing curve.
- ``serving_queue_wait_curve``   — replica-count sizing from the
  measured arrival rate and token-derived service time, M/D/1 wait
  per candidate R (round 10).

Reference scope: beyond-reference large-scale-pipeline surface (the
reference ETL has no RL/serving analytics); no file:line parity
citations apply.

Determinism: rewards/moments are exact integers (cents alphabet);
the only doubles are single per-row expressions over exact integers
(mul/div/sqrt — IEEE-correctly-rounded, no ln/exp); every sequential
recursion is an integer fold with small-denominator rationals
(Spark ``aggregate`` == DuckDB ``list_reduce``, single-value or LIST
accumulators only — never struct, per the CLAUDE.md fold rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load

QUERIES: dict = {}

_CENTS = "cast(round(value * 100, 0) as bigint)"
_CENTS_DUCK = "CAST(round(value * 100, 0) AS BIGINT)"


# ---------------------------------------------------------------------------
# grpo_group_advantage
# ---------------------------------------------------------------------------

def _grpo_group_advantage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRPO group-relative advantage: prompts = user_id % 256, each
    user event is one sampled response with reward = value cents.
    Within a prompt group, a = (r − mean)/std, computed as the exact
    identity a = (n·r − s)/sqrt(n·ss − s²) so the only double is ONE
    per-row expression over exact integer moments (sqrt is correctly
    rounded — no float aggregation anywhere). Output: the
    advantage-bucket histogram (a_e6 div 250000) — bounded regardless
    of corpus size. Groups need n ≥ 2 and positive variance.

    Scale: one keyed shuffle to the ≤256-group moment table, broadcast
    back onto the response scan, map-side-combinable histogram. At
    100 TB prompts number in the millions — the moment join becomes a
    shuffle join on the prompt key; nothing else changes.
    """
    ev = load(spark, sf_dir, "events").select(
        (F.col("user_id") % 256).alias("p"),
        F.expr(_CENTS).alias("r"))
    mom = (ev.groupBy("p")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("r").alias("s"),
                F.sum(F.col("r") * F.col("r")).alias("ss"))
           .where((F.col("n") >= 2) & (F.col("n") * F.col("ss")
                                       > F.col("s") * F.col("s"))))
    a = (ev.join(F.broadcast(mom), "p")
         .select(F.expr(
             "cast(floor(1000000 * (n * r - s) /"
             " sqrt(cast(n * ss - s * s as double))) as bigint)")
             .alias("a_e6")))
    return (a.groupBy(F.expr("a_e6 div 250000").alias("a_bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_responses"),
                 F.sum("a_e6").cast("long").alias("sum_a_e6")))


_GRPO_SQL = f"""
WITH resp AS (
  SELECT user_id % 256 AS p, {_CENTS_DUCK} AS r FROM events
),
mom AS (
  SELECT p, count(*) AS n, CAST(sum(r) AS BIGINT) AS s,
         CAST(sum(r * r) AS BIGINT) AS ss
  FROM resp GROUP BY p
  HAVING count(*) >= 2
     AND count(*) * CAST(sum(r * r) AS BIGINT)
         > CAST(sum(r) AS BIGINT) * CAST(sum(r) AS BIGINT)
),
adv AS (
  SELECT CAST(floor(1000000 * (m.n * e.r - m.s) /
              sqrt(CAST(m.n * m.ss - m.s * m.s AS DOUBLE))) AS BIGINT)
         AS a_e6
  FROM resp e JOIN mom m USING (p)
)
SELECT a_e6 // 250000 AS a_bucket,
       CAST(count(*) AS BIGINT) AS n_responses,
       CAST(sum(a_e6) AS BIGINT) AS sum_a_e6
FROM adv GROUP BY 1
"""

QUERIES["grpo_group_advantage"] = (_grpo_group_advantage, _GRPO_SQL)


# ---------------------------------------------------------------------------
# gae_advantage_fold
# ---------------------------------------------------------------------------
# γ = 9/10, γλ = 855/1000 (λ = 0.95) — small-denominator rationals so
# every step is an exact integer quotient (truncation toward zero,
# identical in Spark `div` and DuckDB `//` — measured r8).

def _gae_advantage_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAE(γ=0.9, λ=0.95) advantage at each user episode's FIRST step.
    Episode = a user's events ordered by (ts, event_id); reward
    r_t = value cents; the critic baseline is the naive one-step
    predictor v_t = r_{t−1} (lag, default 0). TD residual
    δ_t = r_t + (9·v_{t+1}) div 10 − v_t is exact-integer per row
    (lead/lag windows, keyed by user), and the GAE recursion
    A_t = δ_t + (855·A_{t+1}) div 1000 folds BACKWARD over the
    episode (list ordered ts DESC), single BIGINT accumulator — the
    CLAUDE.md-safe fold shape. Output: histogram of first-step
    advantages (A_0 div 500) — bounded.

    Scale: two keyed window passes + one groupBy(user) collect + a
    per-user interpreted fold (episodes are session-length, tens of
    steps) + a map-side-combinable histogram. Everything partitions
    on user; no global ordering anywhere.
    """
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    ev = (load(spark, sf_dir, "events")
          .select("user_id", "event_id",
                  F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
                  F.expr(_CENTS).alias("r"))
          .withColumn("v", F.lag("r", 1, 0).over(w))
          .withColumn("vnext", F.lead("v", 1, 0).over(w))
          .select("user_id", "us", "event_id",
                  (F.col("r") + F.expr("(9 * vnext) div 10")
                   - F.col("v")).alias("d")))
    a0 = (ev.groupBy("user_id")
          .agg(F.expr(
              "aggregate(sort_array(collect_list(struct(-us as nus,"
              " -event_id as nid, d as d))), cast(0 as bigint),"
              " (acc, e) -> e.d + (855 * acc) div 1000)").alias("a0")))
    return (a0.groupBy(F.expr("a0 div 500").alias("a0_bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_users"),
                 F.sum("a0").cast("long").alias("sum_a0")))


_GAE_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, {_CENTS_DUCK} AS r
  FROM events
),
lagged AS (
  SELECT user_id, us, event_id, r,
         coalesce(lag(r) OVER (PARTITION BY user_id
                               ORDER BY us, event_id), 0) AS v
  FROM ev
),
delta AS (
  SELECT user_id, us, event_id,
         r + (9 * coalesce(lead(v) OVER (PARTITION BY user_id
                                         ORDER BY us, event_id), 0)) // 10
           - v AS d
  FROM lagged
),
folded AS (
  SELECT user_id,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
                        list(d ORDER BY us DESC, event_id DESC)),
           (acc, d) -> d + (855 * acc) // 1000) AS a0
  FROM delta GROUP BY user_id
)
SELECT a0 // 500 AS a0_bucket,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(a0) AS BIGINT) AS sum_a0
FROM folded GROUP BY 1
"""

QUERIES["gae_advantage_fold"] = (_gae_advantage_fold, _GAE_SQL)


# ---------------------------------------------------------------------------
# prompt_prefix_cache_stats
# ---------------------------------------------------------------------------
_PFX = 64  # shared-prefix window (chars)


def _prompt_prefix_cache_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radix/prefix KV-cache planning: prompts (documents.text) that
    share their first {_PFX} characters can reuse one KV prefix; for
    each prefix group of size n, a cache skips (n−1)·prefix_tokens
    prefill tokens. Output per group-size bucket: group count, total
    cacheable tokens, total prefix tokens — the data a serving planner
    sizes its prefix cache with.

    Determinism: tokens = whitespace split with empties dropped (the
    lm_queries idiom); groups key on unhex(md5(prefix)) — fixed-width
    shuffle payload per the CLAUDE.md text-key rule.

    Scale: one scan → one keyed shuffle on the 16-byte prefix hash →
    a bounded histogram. The prefix-group aggregate is map-side
    combinable; no joins.
    """
    docs = load(spark, sf_dir, "documents").select(
        F.unhex(F.md5(F.expr(f"substr(text, 1, {_PFX})"))).alias("pk"),
        F.expr(f"size(filter(split(substr(text, 1, {_PFX}), ' '),"
               " t -> t <> ''))").cast("long").alias("ptoks"))
    grp = (docs.groupBy("pk")
           .agg(F.count(F.lit(1)).alias("n"),
                F.min("ptoks").alias("ptoks")))
    return (grp.groupBy(F.col("n").alias("group_size"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_groups"),
                 F.sum((F.col("n") - 1) * F.col("ptoks")).cast("long")
                  .alias("cacheable_tokens"),
                 F.sum(F.col("n") * F.col("ptoks")).cast("long")
                  .alias("prefix_tokens")))


_PREFIX_SQL = f"""
WITH docs AS (
  SELECT unhex(md5(substr(text, 1, {_PFX}))) AS pk,
         CAST(len(list_filter(string_split(substr(text, 1, {_PFX}), ' '),
                              t -> t <> '')) AS BIGINT) AS ptoks
  FROM documents
),
grp AS (
  SELECT pk, count(*) AS n, min(ptoks) AS ptoks
  FROM docs GROUP BY pk
)
SELECT n AS group_size,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum((n - 1) * ptoks) AS BIGINT) AS cacheable_tokens,
       CAST(sum(n * ptoks) AS BIGINT) AS prefix_tokens
FROM grp GROUP BY 1
"""

QUERIES["prompt_prefix_cache_stats"] = (_prompt_prefix_cache_stats,
                                        _PREFIX_SQL)


# ---------------------------------------------------------------------------
# int8_quantization_error
# ---------------------------------------------------------------------------

def _int8_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 PTQ audit over the embedding table:
    q_i = floor(127·x_i/maxabs + 0.5) (round-half-up in one per-element
    double expression), reconstruction x'_i = q_i·maxabs/127; per
    vector, max |x−x'| (greatest-fold — exact) and MSE from an
    explicit LEFT fold in array order (the CLAUDE.md float-reduction
    rule — never an engine-default association). Per label: vector
    count, mean per-vector max-error (e9) and mean MSE (e12), both
    averaged in exact integer space after per-vector flooring.

    Scale: pure scan + per-row array folds (interpreted — single
    consumer, so no persist needed) + one keyed shuffle to the
    bounded label table.
    """
    maxabs = ("aggregate(transform(embedding, x -> abs(cast(x as double))),"
              " cast(0.0 as double), (a, x) -> greatest(a, x))")
    err = ("transform(embedding, x -> abs(cast(x as double)"
           " - floor(127.0 * cast(x as double) / ma + 0.5) * ma / 127.0))")
    vec = (load(spark, sf_dir, "embeddings")
           .select("label", F.expr(maxabs).alias("ma"), "embedding")
           .where(F.col("ma") > 0)
           .select(
               "label",
               F.expr(f"cast(floor(1e9 * aggregate({err},"
                      " cast(0.0 as double), (a, x) -> greatest(a, x)))"
                      " as bigint)").alias("maxerr_e9"),
               F.expr(f"cast(floor(1e12 * aggregate({err},"
                      " cast(0.0 as double), (a, x) -> a + x * x)"
                      " / size(embedding)) as bigint)").alias("mse_e12")))
    return (vec.groupBy("label")
            .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"),
                 F.expr("sum(maxerr_e9) div count(1)")
                  .alias("avg_maxerr_e9"),
                 F.expr("sum(mse_e12) div count(1)").alias("avg_mse_e12")))


_INT8_SQL = """
WITH base AS (
  SELECT label, embedding,
         list_reduce(list_prepend(0.0,
             list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
           (a, x) -> greatest(a, x)) AS ma
  FROM embeddings
),
vec AS (
  SELECT label,
         CAST(floor(1e9 * list_reduce(list_prepend(0.0,
             list_transform(embedding, x -> abs(CAST(x AS DOUBLE)
               - floor(127.0 * CAST(x AS DOUBLE) / ma + 0.5)
                 * ma / 127.0))),
           (a, x) -> greatest(a, x))) AS BIGINT) AS maxerr_e9,
         CAST(floor(1e12 * list_reduce(list_prepend(0.0,
             list_transform(embedding, x -> abs(CAST(x AS DOUBLE)
               - floor(127.0 * CAST(x AS DOUBLE) / ma + 0.5)
                 * ma / 127.0))),
           (a, x) -> a + x * x) / len(embedding)) AS BIGINT) AS mse_e12
  FROM base WHERE ma > 0
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(maxerr_e9) AS BIGINT) // count(*) AS avg_maxerr_e9,
       CAST(sum(mse_e12) AS BIGINT) // count(*) AS avg_mse_e12
FROM vec GROUP BY label
"""

QUERIES["int8_quantization_error"] = (_int8_quantization_error, _INT8_SQL)


# ---------------------------------------------------------------------------
# heaps_law_log2_fit
# ---------------------------------------------------------------------------

def _heaps_law_log2_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law (type/token power-law) slope fit, libm-free: per
    document, x = ⌊log2(tokens)⌋ and y = ⌊log2(distinct tokens)⌋ via
    ``length(bin(n)) − 1`` (exact integers — the decision_queries
    bucket idiom), then the least-squares slope in log2 space from the
    EXACT integer normal equations:
    slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²), emitted at e6 via
    integer division (headroom: coords ≤ 14, so n·Σxy ≤ n²·196 —
    int64-safe beyond 10⁸ docs; at larger corpora the sums widen to
    DECIMAL, a one-line change).

    Scale: one scan, one map-side-combinable global aggregate, 1-row
    output.
    """
    toks = "filter(split(text, ' '), t -> t <> '')"
    d = load(spark, sf_dir, "documents").select(
        F.expr(f"length(bin(size({toks}))) - 1").cast("long").alias("lx"),
        F.expr(f"length(bin(size(array_distinct({toks})))) - 1")
         .cast("long").alias("ly"))
    agg = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lx").alias("sx"), F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"))
    return agg.select(
        F.col("n").cast("long").alias("n_docs"),
        F.expr("(1000000 * (n * sxy - sx * sy))"
               " div (n * sxx - sx * sx)").alias("slope_e6"),
        F.expr("(1000000 * sx) div n").alias("mean_lx_e6"),
        F.expr("(1000000 * sy) div n").alias("mean_ly_e6"))


_HEAPS_SQL = """
WITH d AS (
  SELECT CAST(length(bin(len(list_filter(string_split(text, ' '),
                t -> t <> '')))) - 1 AS BIGINT) AS lx,
         CAST(length(bin(len(list_distinct(list_filter(
                string_split(text, ' '), t -> t <> ''))))) - 1 AS BIGINT)
           AS ly
  FROM documents
),
agg AS (
  SELECT count(*) AS n, CAST(sum(lx) AS BIGINT) AS sx,
         CAST(sum(ly) AS BIGINT) AS sy,
         CAST(sum(lx * ly) AS BIGINT) AS sxy,
         CAST(sum(lx * lx) AS BIGINT) AS sxx
  FROM d
)
SELECT CAST(n AS BIGINT) AS n_docs,
       (1000000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx) AS slope_e6,
       (1000000 * sx) // n AS mean_lx_e6,
       (1000000 * sy) // n AS mean_ly_e6
FROM agg
"""

QUERIES["heaps_law_log2_fit"] = (_heaps_law_log2_fit, _HEAPS_SQL)


# ---------------------------------------------------------------------------
# epsilon_greedy_replay
# ---------------------------------------------------------------------------
_EG_T = 4096        # replay prefix length (bounded regardless of corpus)
_EG_THRESH_C = 3000  # reward threshold (cents)
_EG_ARMS = 5


def _eg_step(spark_side: bool) -> str:
    """Generate the ε-greedy replay fold step for one engine.

    Accumulator layout (LIST<BIGINT>, the CLAUDE.md-safe fold shape;
    1-based in DuckDB / 0-based in Spark): [pulls×5, rewards×5,
    matched, cum_reward, steps]. Element: struct(arm, r) in Spark /
    [arm, r] list in DuckDB. The exploit pick is the argmax of the
    e6-FLOORED per-arm mean (exact integers; unpulled arms count as
    mean 0; ties to the lowest arm index) — a fully integer policy, so
    the replay trajectory is bit-identical across engines by
    construction (no UCB-style libm bonus anywhere).
    """
    def sl(i: int) -> str:  # accumulator slot (engine-local indexing)
        return f"acc[{i if spark_side else i + 1}]"

    arm = "e.arm" if spark_side else "e[1]"
    rew = "e.r" if spark_side else "e[2]"
    dv = "div" if spark_side else "//"
    t = f"({sl(12)} + 1)"
    means = [f"((1000000 * {sl(5 + i)}) {dv} greatest({sl(i)}, 1))"
             for i in range(_EG_ARMS)]
    best = f"greatest({', '.join(means)})"
    exploit = "CASE " + " ".join(
        f"WHEN {means[i]} = {best} THEN {i + 1}"
        for i in range(_EG_ARMS)) + " END"
    policy = (f"(CASE WHEN {t} % 10 = 0"
              f" THEN (({t} {dv} 10) % {_EG_ARMS}) + 1"
              f" ELSE {exploit} END)")
    hit = f"(CASE WHEN {policy} = {arm} THEN 1 ELSE 0 END)"
    slots = []
    for i in range(_EG_ARMS):
        slots.append(f"{sl(i)} + (CASE WHEN {policy} = {arm}"
                     f" AND {arm} = {i + 1} THEN 1 ELSE 0 END)")
    for i in range(_EG_ARMS):
        slots.append(f"{sl(5 + i)} + (CASE WHEN {policy} = {arm}"
                     f" AND {arm} = {i + 1} THEN {rew} ELSE 0 END)")
    slots.append(f"{sl(10)} + {hit}")
    slots.append(f"{sl(11)} + {hit} * {rew}")
    slots.append(t)
    body = ", ".join(f"cast({s} as bigint)" for s in slots) \
        if spark_side else ", ".join(f"CAST({s} AS BIGINT)" for s in slots)
    return (f"(acc, e) -> array({body})" if spark_side
            else f"(acc, e) -> [{body}]")


_EG_ARM_CASE = ("CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2"
                " WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4"
                " ELSE 5 END")


def _epsilon_greedy_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline ε-greedy bandit replay (Li et al.'s replay estimator,
    the deterministic sibling of ``ips_offline_policy_eval``): stream
    the first {_EG_T} logged events in (ts, event_id) order; arms =
    the 5 event types, reward = 1 when value ≥ 30.00. The policy
    explores deterministically every 10th step (round-robin arm) and
    otherwise exploits the e6-floored-mean argmax; only steps where
    the policy's pick MATCHES the logged arm update the estimate —
    the unbiased-replay counting rule. Output: matched-step count,
    cumulative matched reward, and the final best arm.

    Scale: TakeOrdered bounds the replay prefix (policy replay is
    inherently sequential — the fold is over ≤{_EG_T} rows fed by a
    limit, passing the bounded-feeder gate); reward labeling is a
    corpus-scan-free projection of the same prefix.
    """
    prefix = (load(spark, sf_dir, "events")
              .select(F.expr("unix_micros(cast(ts as timestamp))")
                      .alias("us"), "event_id",
                      F.expr(_EG_ARM_CASE).alias("arm"),
                      F.expr(f"CASE WHEN {_CENTS} >= {_EG_THRESH_C}"
                             " THEN 1 ELSE 0 END").alias("r"))
              .orderBy("us", "event_id").limit(_EG_T))
    init = ", ".join(["cast(0 as bigint)"] * 13)
    folded = prefix.agg(F.expr(
        f"aggregate(sort_array(collect_list(struct(us, event_id,"
        f" arm, r))), array({init}), {_eg_step(True)})").alias("s"))
    means = [f"((1000000 * s[{5 + i}]) div greatest(s[{i}], 1))"
             for i in range(_EG_ARMS)]
    best = f"greatest({', '.join(means)})"
    best_arm = "CASE " + " ".join(
        f"WHEN {means[i]} = {best} THEN {i + 1}"
        for i in range(_EG_ARMS)) + " END"
    return folded.select(
        F.expr("s[12]").alias("n_steps"),
        F.expr("s[10]").alias("matched"),
        F.expr("s[11]").alias("cum_reward"),
        F.expr(f"cast({best_arm} as bigint)").alias("best_arm"),
        F.expr(f"cast({best} as bigint)").alias("best_mean_e6"))


def _eg_sql() -> str:
    means = [f"((1000000 * s[{6 + i}]) // greatest(s[{i + 1}], 1))"
             for i in range(_EG_ARMS)]
    best = f"greatest({', '.join(means)})"
    best_arm = "CASE " + " ".join(
        f"WHEN {means[i]} = {best} THEN {i + 1}"
        for i in range(_EG_ARMS)) + " END"
    init = ", ".join(["CAST(0 AS BIGINT)"] * 13)
    return f"""
WITH prefix AS (
  SELECT epoch_us(ts) AS us, event_id,
         {_EG_ARM_CASE} AS arm,
         CASE WHEN {_CENTS_DUCK} >= {_EG_THRESH_C} THEN 1 ELSE 0 END AS r
  FROM events ORDER BY us, event_id LIMIT {_EG_T}
),
folded AS (
  SELECT list_reduce(
           list_prepend([{init}],
                        list([CAST(arm AS BIGINT), CAST(r AS BIGINT)]
                             ORDER BY us, event_id)),
           {_eg_step(False)}) AS s
  FROM prefix
)
SELECT s[13] AS n_steps, s[11] AS matched, s[12] AS cum_reward,
       CAST({best_arm} AS BIGINT) AS best_arm,
       CAST({best} AS BIGINT) AS best_mean_e6
FROM folded
"""


QUERIES["epsilon_greedy_replay"] = (_epsilon_greedy_replay, _eg_sql())


# ---------------------------------------------------------------------------
# context_window_waste
# ---------------------------------------------------------------------------
_CTX_WINDOWS = (256, 512, 1024, 2048)


def _context_window_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window sizing: for each candidate window W, how many
    documents truncate, what share of corpus tokens the truncation
    discards, and how full a one-doc-per-window batch runs
    (fill = Σ min(n, W) / (docs·W)) — the serving/packing planner's
    trade-off curve (its packed sibling is ``token_stream_packing``).

    Scale: one scan computes per-doc token counts; a constant ×4
    explode feeds one map-side-combinable aggregate per window.
    """
    wins = ", ".join(str(w) for w in _CTX_WINDOWS)
    d = (load(spark, sf_dir, "documents")
         .select(F.expr("cast(size(filter(split(text, ' '),"
                        " t -> t <> '')) as bigint)").alias("n"))
         .select("n", F.explode(F.expr(f"array({wins})")).alias("w")))
    return (d.groupBy("w")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum(F.expr("CASE WHEN n > w THEN 1 ELSE 0 END"))
                  .cast("long").alias("docs_truncated"),
                 F.sum("n").cast("long").alias("tokens_total"),
                 F.sum(F.least("n", F.col("w").cast("long"))).cast("long")
                  .alias("tokens_kept"))
            .select("w", "n_docs", "docs_truncated", "tokens_total",
                    "tokens_kept",
                    F.expr("(1000000 * (tokens_total - tokens_kept))"
                           " div tokens_total").alias("waste_share_e6"),
                    F.expr("(1000000 * tokens_kept) div (n_docs * w)")
                     .alias("fill_e6")))


_CTX_SQL = f"""
WITH d AS (
  SELECT CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
              AS BIGINT) AS n,
         unnest([{", ".join(str(w) for w in _CTX_WINDOWS)}]) AS w
  FROM documents
),
agg AS (
  SELECT w, count(*) AS n_docs,
         CAST(sum(CASE WHEN n > w THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_truncated,
         CAST(sum(n) AS BIGINT) AS tokens_total,
         CAST(sum(least(n, CAST(w AS BIGINT))) AS BIGINT) AS tokens_kept
  FROM d GROUP BY w
)
SELECT CAST(w AS INT) AS w, CAST(n_docs AS BIGINT) AS n_docs,
       docs_truncated, tokens_total, tokens_kept,
       (1000000 * (tokens_total - tokens_kept)) // tokens_total
         AS waste_share_e6,
       (1000000 * tokens_kept) // (n_docs * w) AS fill_e6
FROM agg
"""

QUERIES["context_window_waste"] = (_context_window_waste, _CTX_SQL)


# ---------------------------------------------------------------------------
# moe_router_balance
# ---------------------------------------------------------------------------
_MOE_EXPERTS = 8


def _moe_router_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MoE router load-balance audit: documents route to
    {_MOE_EXPERTS} experts by content hash (the deterministic stand-in
    for an argmax router); per expert, the dispatch fraction f_e
    (token-weighted) and probability mass P_e (byte-weighted proxy)
    feed the switch-transformer auxiliary loss
    L_aux = E·Σ f_e·P_e — reported at e6 alongside each expert's load,
    plus the max/mean load imbalance the capacity factor must absorb.
    Exact integers end-to-end (shares are integer e6 quotients; the
    loss is a sum of ≤{_MOE_EXPERTS} e6-share products).

    Scale: one scan → one keyed aggregate to the {_MOE_EXPERTS}-row
    expert table → bounded-panel algebra with a broadcast 1-row total.
    """
    toks = "size(filter(split(text, ' '), t -> t <> ''))"
    d = load(spark, sf_dir, "documents").select(
        F.expr(f"cast(conv(substr(md5(text), 1, 8), 16, 10) as bigint)"
               f" % {_MOE_EXPERTS}").alias("expert"),
        F.expr(f"cast({toks} as bigint)").alias("tok"),
        F.expr("cast(n_chars as bigint)").alias("b"))
    per = (d.groupBy("expert")
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("tok").cast("long").alias("toks"),
                F.sum("b").cast("long").alias("bytes")))
    tot = per.agg(F.sum("toks").alias("tt"), F.sum("bytes").alias("tb"),
                  F.sum(F.lit(1)).alias("ne"))
    sh = (per.crossJoin(F.broadcast(tot))
          .select("expert", "n_docs", "toks",
                  F.expr("(1000000 * toks) div tt").alias("f_e6"),
                  F.expr("(1000000 * bytes) div tb").alias("p_e6")))
    loss = sh.agg(
        F.expr(f"cast({_MOE_EXPERTS} * sum(f_e6 * p_e6) div 1000000"
               " as bigint)").alias("aux_loss_e6"),
        F.expr("max(f_e6)").alias("max_f_e6"))
    return (sh.crossJoin(F.broadcast(loss))
            .select("expert", "n_docs", "toks", "f_e6", "p_e6",
                    "aux_loss_e6",
                    F.expr(f"(max_f_e6 * {_MOE_EXPERTS})")
                     .alias("capacity_factor_e6")))


_MOE_SQL = f"""
WITH d AS (
  SELECT CAST('0x' || substr(md5(text), 1, 8) AS BIGINT)
           % {_MOE_EXPERTS} AS expert,
         CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
              AS BIGINT) AS tok,
         CAST(n_chars AS BIGINT) AS b
  FROM documents
),
per AS (
  SELECT expert, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(tok) AS BIGINT) AS toks,
         CAST(sum(b) AS BIGINT) AS bytes
  FROM d GROUP BY 1
),
tot AS (
  SELECT CAST(sum(toks) AS BIGINT) AS tt,
         CAST(sum(bytes) AS BIGINT) AS tb,
         count(*) AS ne
  FROM per
),
sh AS (
  SELECT expert, n_docs, toks,
         (1000000 * toks) // tt AS f_e6,
         (1000000 * bytes) // tb AS p_e6
  FROM per, tot
),
loss AS (
  SELECT CAST({_MOE_EXPERTS} * CAST(sum(f_e6 * p_e6) AS BIGINT)
              // 1000000 AS BIGINT) AS aux_loss_e6,
         max(f_e6) AS max_f_e6
  FROM sh
)
SELECT expert, n_docs, toks, f_e6, p_e6, aux_loss_e6,
       (max_f_e6 * {_MOE_EXPERTS}) AS capacity_factor_e6
FROM sh, loss
"""

QUERIES["moe_router_balance"] = (_moe_router_balance, _MOE_SQL)


# ---------------------------------------------------------------------------
# checkpoint_interval_daly
# ---------------------------------------------------------------------------
_CKPT_COST_S = 120  # checkpoint write cost (seconds)


def _checkpoint_interval_daly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Young/Daly optimal checkpoint interval from MEASURED failure
    data: MTBF = mean interarrival of 'error' events (exact integer
    seconds from epoch micros), T_opt = sqrt(2·C·MTBF) with
    C = {_CKPT_COST_S}s — the knob every long training run sets, here
    derived from the event stream instead of a guess. Also reports the
    expected overhead fraction C/T_opt + T_opt/(2·MTBF) at e6 (both
    terms integer-floored from one sqrt expression each).

    Scale: one filtered scan (predicate pushed to parquet) → a global
    1-row aggregate; interarrival mean needs only min/max/count (the
    telescoping identity Σ(tᵢ−tᵢ₋₁) = t_max − t_min), so no window at
    all.
    """
    err = (load(spark, sf_dir, "events")
           .where(F.col("event_type") == "error")
           .select(F.expr("unix_micros(cast(ts as timestamp))"
                          " div 1000000").alias("s")))
    agg = err.agg(F.count(F.lit(1)).alias("n"),
                  F.min("s").alias("lo"), F.max("s").alias("hi"))
    topt = f"sqrt(2.0 * {_CKPT_COST_S} * cast(mtbf_s as double))"
    return (agg.select(F.col("n").cast("long").alias("n_failures"),
                       F.expr("(hi - lo) div (n - 1)").alias("mtbf_s"))
            .select("n_failures", "mtbf_s",
                    F.expr(f"cast(floor({topt}) as bigint)")
                     .alias("t_opt_s"),
                    F.expr(f"cast(floor(1000000 * ({_CKPT_COST_S}"
                           f" / {topt} + {topt} / (2.0 * mtbf_s)))"
                           " as bigint)").alias("overhead_e6")))


_CKPT_SQL = f"""
WITH err AS (
  SELECT epoch_us(ts) // 1000000 AS s FROM events
  WHERE event_type = 'error'
),
agg AS (
  SELECT count(*) AS n, min(s) AS lo, max(s) AS hi FROM err
),
m AS (
  SELECT CAST(n AS BIGINT) AS n_failures,
         (hi - lo) // (n - 1) AS mtbf_s
  FROM agg
)
SELECT n_failures, mtbf_s,
       CAST(floor(sqrt(2.0 * {_CKPT_COST_S} * CAST(mtbf_s AS DOUBLE)))
            AS BIGINT) AS t_opt_s,
       CAST(floor(1000000 * ({_CKPT_COST_S}
            / sqrt(2.0 * {_CKPT_COST_S} * CAST(mtbf_s AS DOUBLE))
            + sqrt(2.0 * {_CKPT_COST_S} * CAST(mtbf_s AS DOUBLE))
              / (2.0 * mtbf_s))) AS BIGINT) AS overhead_e6
FROM m
"""

QUERIES["checkpoint_interval_daly"] = (_checkpoint_interval_daly,
                                       _CKPT_SQL)


# ---------------------------------------------------------------------------
# model_cascade_cost
# ---------------------------------------------------------------------------
_CASCADE_TS = (500_000, 600_000, 700_000, 800_000)  # e6 TTR thresholds
_CASCADE_SMALL_COST = 1    # cost units per doc on the small model
_CASCADE_BIG_COST = 12     # cost units per doc on the big model


def _model_cascade_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small→big model cascade planning: route a document to the cheap
    model when its type-token ratio (distinct/total tokens, e6 — the
    repetitiveness signal: repetitive text is the easy case) clears a
    confidence threshold T, to the expensive model otherwise. For each
    candidate T, the routed share and the blended cost per 1k docs
    (small={_CASCADE_SMALL_COST}, big={_CASCADE_BIG_COST} units) — the
    curve a serving planner picks its cascade operating point from.
    Exact integers throughout (TTR is an integer e6 quotient).

    Scale: one scan computes per-doc TTR; a constant ×{len(_CASCADE_TS)}
    threshold explode feeds one map-side-combinable aggregate.
    """
    toks = "filter(split(text, ' '), t -> t <> '')"
    ts = ", ".join(str(t) for t in _CASCADE_TS)
    d = (load(spark, sf_dir, "documents")
         .select(F.expr(
             f"(1000000 * cast(size(array_distinct({toks})) as bigint))"
             f" div greatest(cast(size({toks}) as bigint), 1)")
             .alias("ttr_e6"))
         .select("ttr_e6", F.explode(F.expr(f"array({ts})")).alias("t")))
    return (d.groupBy("t")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum(F.expr("CASE WHEN ttr_e6 < t THEN 1 ELSE 0 END"))
                  .cast("long").alias("n_small"))
            .select(F.col("t").cast("long").alias("threshold_e6"),
                    "n_docs", "n_small",
                    F.expr("(1000000 * n_small) div n_docs")
                     .alias("small_share_e6"),
                    F.expr(f"(1000 * (n_small * {_CASCADE_SMALL_COST}"
                           f" + (n_docs - n_small) * {_CASCADE_BIG_COST}))"
                           " div n_docs").alias("cost_per_1k_docs")))


_CASCADE_SQL = f"""
WITH d AS (
  SELECT (1000000 * CAST(len(list_distinct(list_filter(
              string_split(text, ' '), t -> t <> ''))) AS BIGINT))
         // greatest(CAST(len(list_filter(string_split(text, ' '),
              t -> t <> '')) AS BIGINT), 1) AS ttr_e6,
         unnest([{", ".join(str(t) for t in _CASCADE_TS)}]) AS t
  FROM documents
)
SELECT CAST(t AS BIGINT) AS threshold_e6,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN ttr_e6 < t THEN 1 ELSE 0 END) AS BIGINT)
         AS n_small,
       (1000000 * CAST(sum(CASE WHEN ttr_e6 < t THEN 1 ELSE 0 END)
                   AS BIGINT)) // count(*) AS small_share_e6,
       (1000 * (CAST(sum(CASE WHEN ttr_e6 < t THEN 1 ELSE 0 END)
                 AS BIGINT) * {_CASCADE_SMALL_COST}
                + (count(*) - CAST(sum(CASE WHEN ttr_e6 < t THEN 1
                    ELSE 0 END) AS BIGINT)) * {_CASCADE_BIG_COST}))
         // count(*) AS cost_per_1k_docs
FROM d GROUP BY t
"""

QUERIES["model_cascade_cost"] = (_model_cascade_cost, _CASCADE_SQL)


# ---------------------------------------------------------------------------
# speculative_draft_policy (round 10)
# ---------------------------------------------------------------------------
_DRAFT_MAX_K = 8       # candidate draft lengths 1..K
_DRAFT_COST_E3 = 60    # draft-model cost per token, e3 of a target forward


def _speculative_draft_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Speculative-decoding DEPTH planning — the policy curve on top of
    ``speculative_accept_rate``'s measurement: given the corpus-wide
    bigram-draft acceptance rate p, a draft of length k yields
    E_k = Σ_{i=1..k} p^i expected accepted tokens per verify round
    (acceptance is position-independent under the i.i.d. assumption of
    Leviathan et al., "Fast Inference from Transformers via Speculative
    Decoding"), plus the one token the target model always emits. With
    a draft forward costing {_DRAFT_COST_E3}/1000 of a target forward,
    the per-round speedup is (E_k + 1) / (1 + k·c) — the curve a
    serving planner reads the optimal k from (it is unimodal in k).

    Determinism: p is an exact integer e6 quotient; p^i is a SEQUENTIAL
    integer fold (each step floors once — Spark ``aggregate`` with a
    2-slot array accumulator == DuckDB ``list_reduce`` with a LIST
    accumulator, per the CLAUDE.md fold rules); every output is an
    integer division of exact int64 terms.

    Scale: one corpus scan builds word pairs (lead over doc position —
    no self-join); the bigram argmax is a vocab²-bounded keyed
    aggregate on md5 keys; everything after is a 1-row acceptance
    aggregate broadcast onto {_DRAFT_MAX_K} constant rows.
    """
    docs = (load(spark, sf_dir, "documents")
            .select("doc_id",
                    F.split(F.trim(F.lower(F.col("text"))), r"\s+")
                    .alias("w")))
    toks = docs.select("doc_id", F.posexplode("w").alias("pos", "cur"))
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (toks.withColumn("nxt", F.lead("cur").over(wdoc))
             .where(F.col("nxt").isNotNull())
             .select(F.unhex(F.md5("cur")).alias("ck"), "nxt"))
    model = (pairs.groupBy("ck", "nxt")
             .agg(F.count(F.lit(1)).alias("c"))
             .groupBy("ck")
             .agg(F.min(F.struct((-F.col("c")).alias("nc"),
                                 F.col("nxt").alias("t")))
                  .getField("t").alias("draft")))
    p = (pairs.join(model, "ck")
         .agg(F.count(F.lit(1)).alias("n_pairs"),
              F.sum(F.when(F.col("nxt") == F.col("draft"), 1)
                    .otherwise(0)).alias("n_acc"))
         .select(F.expr("1000000 * n_acc div greatest(n_pairs, 1)")
                 .alias("accept_e6")))
    ks = spark.range(1, _DRAFT_MAX_K + 1).select(F.col("id").alias("k"))
    fold = ("aggregate(sequence(1, cast(k as int)),"
            " array(1000000L, 0L),"
            " (a, i) -> array(a[0] * accept_e6 div 1000000,"
            "                 a[1] + a[0] * accept_e6 div 1000000),"
            " a -> a[1])")
    return (ks.crossJoin(F.broadcast(p))
            .withColumn("exp_accept_e6", F.expr(fold))
            .select(F.col("k").cast("int").alias("k"),
                    "accept_e6", "exp_accept_e6",
                    F.expr("exp_accept_e6 + 1000000")
                     .alias("tokens_per_round_e6"),
                    F.expr(f"((exp_accept_e6 + 1000000) * 1000)"
                           f" div (1000 + k * {_DRAFT_COST_E3})")
                     .alias("speedup_e6")))


_DRAFT_POLICY_SQL = rf"""
WITH docs AS (
    SELECT doc_id,
           regexp_split_to_array(trim(lower(text)), '\s+') AS w
    FROM documents
),
toks AS (
    SELECT doc_id, t.i - 1 AS pos, w[t.i] AS cur
    FROM docs, unnest(range(1, len(w) + 1)) AS t(i)
),
prs AS (
    SELECT unhex(md5(cur)) AS ck,
           lead(cur) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
    FROM toks
),
prs_ne AS (SELECT * FROM prs WHERE nxt IS NOT NULL),
model AS (
    SELECT ck, (min(struct_pack(nc := -c, t := nxt))).t AS draft
    FROM (SELECT ck, nxt, CAST(count(*) AS BIGINT) AS c
          FROM prs_ne GROUP BY 1, 2)
    GROUP BY ck
),
acc AS (
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN p.nxt = m.draft THEN 1 ELSE 0 END)
                AS BIGINT) AS n_acc
    FROM prs_ne p JOIN model m USING (ck)
),
pr AS (
    SELECT 1000000 * n_acc // greatest(n_pairs, 1) AS accept_e6 FROM acc
),
ks AS (SELECT unnest(range(1, {_DRAFT_MAX_K + 1})) AS k),
vals AS (
    SELECT k, pr.accept_e6 AS accept_e6,
           list_reduce(
               list_prepend([CAST(1000000 AS BIGINT), CAST(0 AS BIGINT)],
                            list_transform(range(1, k + 1),
                                           i -> [i, CAST(0 AS BIGINT)])),
               (a, e) -> [a[1] * accept_e6 // 1000000,
                          a[2] + a[1] * accept_e6 // 1000000])[2]
               AS exp_accept_e6
    FROM ks, pr
)
SELECT CAST(k AS INT) AS k,
       accept_e6,
       exp_accept_e6,
       exp_accept_e6 + 1000000 AS tokens_per_round_e6,
       ((exp_accept_e6 + 1000000) * 1000)
           // (1000 + k * {_DRAFT_COST_E3}) AS speedup_e6
FROM vals
"""

QUERIES["speculative_draft_policy"] = (_speculative_draft_policy,
                                       _DRAFT_POLICY_SQL)


# ---------------------------------------------------------------------------
# kv_cache_memory_budget (round 10)
# ---------------------------------------------------------------------------
_KV_CAPS = (128, 256, 512, 1024)   # candidate context caps (tokens)
_KV_BYTES_PER_TOKEN = 131072       # 2(K+V) x 32 layers x 8 KV-heads x 128 dim x 2B (fp16, GQA)
_KV_HBM_BUDGET = 16 * 1024 ** 3    # cache-pool bytes reserved per replica


def _kv_cache_memory_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KV-cache capacity planning: for each candidate context cap C,
    the per-request cache footprint over the measured request-length
    distribution (documents' token counts as the proxy) and the batch
    sizes a {_KV_HBM_BUDGET >> 30} GiB cache pool sustains — worst case
    (every request at the cap: HBM // (rate·C)) vs expected
    (HBM // mean-footprint). The gap between the two columns is the
    overcommit headroom a paged allocator can exploit; the contiguous
    allocator must plan on worst case — the sizing table a serving
    planner reads replica counts from.

    Determinism/exactness: token counts and byte products are exact
    int64 (max product ~1e3 tokens x 131072 B/token x corpus docs —
    sums stay far below 2^63 at any SF); means are single integer
    floors.

    Scale: one corpus scan for token counts; a constant
    x{len(_KV_CAPS)} explode feeds one map-side-combinable aggregate.
    """
    caps = ", ".join(str(c) for c in _KV_CAPS)
    d = (load(spark, sf_dir, "documents")
         .select(F.expr("cast(size(filter(split(text, ' '),"
                        " t -> t <> '')) as bigint)").alias("n"))
         .select("n", F.explode(F.expr(f"array({caps})")).alias("c")))
    return (d.groupBy("c")
            .agg(F.count(F.lit(1)).cast("long").alias("n_requests"),
                 F.sum(F.least("n", F.col("c").cast("long"))).cast("long")
                  .alias("tok_clipped"),
                 F.max(F.least("n", F.col("c").cast("long"))).cast("long")
                  .alias("tok_max"))
            .select(F.col("c").cast("int").alias("context_cap"),
                    "n_requests",
                    F.expr(f"{_KV_BYTES_PER_TOKEN} * tok_clipped"
                           " div n_requests").alias("kv_bytes_mean"),
                    F.expr(f"{_KV_BYTES_PER_TOKEN} * tok_max")
                     .alias("kv_bytes_max"),
                    F.expr(f"{_KV_HBM_BUDGET} div"
                           f" ({_KV_BYTES_PER_TOKEN} * c)")
                     .alias("batch_worst_case"),
                    F.expr(f"{_KV_HBM_BUDGET} div greatest("
                           f"{_KV_BYTES_PER_TOKEN} * tok_clipped"
                           " div n_requests, 1)")
                     .alias("batch_expected")))


_KV_BUDGET_SQL = f"""
WITH d AS (
  SELECT CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
              AS BIGINT) AS n,
         unnest([{", ".join(str(c) for c in _KV_CAPS)}]) AS c
  FROM documents
),
agg AS (
  SELECT c, CAST(count(*) AS BIGINT) AS n_requests,
         CAST(sum(least(n, CAST(c AS BIGINT))) AS BIGINT) AS tok_clipped,
         CAST(max(least(n, CAST(c AS BIGINT))) AS BIGINT) AS tok_max
  FROM d GROUP BY c
)
SELECT CAST(c AS INT) AS context_cap,
       n_requests,
       {_KV_BYTES_PER_TOKEN} * tok_clipped // n_requests AS kv_bytes_mean,
       {_KV_BYTES_PER_TOKEN} * tok_max AS kv_bytes_max,
       {_KV_HBM_BUDGET} // ({_KV_BYTES_PER_TOKEN} * CAST(c AS BIGINT))
           AS batch_worst_case,
       {_KV_HBM_BUDGET} // greatest(
           {_KV_BYTES_PER_TOKEN} * tok_clipped // n_requests, 1)
           AS batch_expected
FROM agg
"""

QUERIES["kv_cache_memory_budget"] = (_kv_cache_memory_budget,
                                     _KV_BUDGET_SQL)


# ---------------------------------------------------------------------------
# paged_attention_fragmentation (round 10)
# ---------------------------------------------------------------------------
_PAGE_SIZES = (8, 16, 32, 64)   # candidate KV block sizes (tokens/page)
_PAGE_MAX_LEN = 1024            # contiguous allocator reserves this per request


def _paged_attention_fragmentation(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Paged-KV allocator sizing (the vLLM design question): for each
    candidate page size P, the INTERNAL fragmentation a block allocator
    pays (ceil(len/P)·P − len, the partially-filled last page) against
    the reservation waste of a contiguous allocator that must reserve
    {_PAGE_MAX_LEN} tokens per request (max_len − len). Small pages
    waste less but cost more block-table overhead — this curve plus
    the measured length distribution picks P.

    Determinism/exactness: ceil(len/P) is the exact integer identity
    (len + P − 1) div P; all shares are e6 integer floors of exact
    int64 sums.

    Scale: one corpus scan for token counts (lengths clipped at the
    reservation cap so both allocators price the same requests); a
    constant x{len(_PAGE_SIZES)} explode feeds one map-side-combinable
    aggregate.
    """
    sizes = ", ".join(str(p) for p in _PAGE_SIZES)
    d = (load(spark, sf_dir, "documents")
         .select(F.expr(
             "least(cast(size(filter(split(text, ' '),"
             f" t -> t <> '')) as bigint), {_PAGE_MAX_LEN})").alias("n"))
         .select("n", F.explode(F.expr(f"array({sizes})")).alias("p")))
    return (d.groupBy("p")
            .agg(F.count(F.lit(1)).cast("long").alias("n_requests"),
                 F.sum("n").cast("long").alias("tok_total"),
                 F.sum(F.expr("((n + p - 1) div p)")).cast("long")
                  .alias("pages_total"),
                 F.sum(F.expr(f"cast({_PAGE_MAX_LEN} as bigint) - n"))
                  .cast("long").alias("contig_waste_tok"))
            .select(F.col("p").cast("int").alias("page_size"),
                    "n_requests", "tok_total", "pages_total",
                    F.expr("pages_total * p - tok_total")
                     .alias("frag_tok"),
                    F.expr("(1000000 * (pages_total * p - tok_total))"
                           " div greatest(pages_total * p, 1)")
                     .alias("frag_share_e6"),
                    F.expr(f"(1000000 * contig_waste_tok) div greatest("
                           f"n_requests * {_PAGE_MAX_LEN}, 1)")
                     .alias("contig_waste_share_e6")))


_PAGED_FRAG_SQL = f"""
WITH d AS (
  SELECT least(CAST(len(list_filter(string_split(text, ' '),
                    t -> t <> '')) AS BIGINT), {_PAGE_MAX_LEN}) AS n,
         unnest([{", ".join(str(p) for p in _PAGE_SIZES)}]) AS p
  FROM documents
),
agg AS (
  SELECT p, CAST(count(*) AS BIGINT) AS n_requests,
         CAST(sum(n) AS BIGINT) AS tok_total,
         CAST(sum((n + p - 1) // p) AS BIGINT) AS pages_total,
         CAST(sum({_PAGE_MAX_LEN} - n) AS BIGINT) AS contig_waste_tok
  FROM d GROUP BY p
)
SELECT CAST(p AS INT) AS page_size,
       n_requests, tok_total, pages_total,
       pages_total * p - tok_total AS frag_tok,
       (1000000 * (pages_total * p - tok_total))
           // greatest(pages_total * p, 1) AS frag_share_e6,
       (1000000 * contig_waste_tok)
           // greatest(n_requests * {_PAGE_MAX_LEN}, 1)
           AS contig_waste_share_e6
FROM agg
"""

QUERIES["paged_attention_fragmentation"] = (_paged_attention_fragmentation,
                                            _PAGED_FRAG_SQL)


# ---------------------------------------------------------------------------
# serving_queue_wait_curve (round 10)
# ---------------------------------------------------------------------------
_QW_REPLICAS = (1, 2, 4, 8, 16)   # candidate replica counts
_QW_US_PER_TOK = 5_000            # deterministic service: 5 ms per token


def _serving_queue_wait_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replica-count sizing from MEASURED load: arrivals are the event
    stream's empirical rate (N requests over the observed span), the
    deterministic service time is the mean document token count at
    {_QW_US_PER_TOK} µs/token, and each candidate replica count R is
    priced with the M/D/1 queue under a random split: per-replica
    utilization ρ = λ·s/R and mean wait W = ρ·s / 2(1−ρ) — half the
    M/M/1 wait, the right model when generation length (not arrival
    burstiness) dominates service variance. Saturated candidates
    (ρ ≥ 1) report wait −1: the planner reads the first R whose wait
    clears the latency SLO.

    Determinism/exactness: span/count/token sums are exact int64; ρ
    and W are single integer-floor quotients of exact products
    (λ·s = N·s_us / T_us, all in µs — products ≤ 1e6 docs · 1e9 µs,
    inside int64).

    Scale: two 1-row aggregates (events span/count; documents token
    mean) cross-joined onto {len(_QW_REPLICAS)} constant rows —
    corpus-scan-bound, the aggregates are map-side-combinable.
    """
    reps = ", ".join(str(r) for r in _QW_REPLICAS)
    arr = (load(spark, sf_dir, "events")
           .select(F.expr("unix_micros(cast(ts as timestamp))").alias("us"))
           .agg(F.count(F.lit(1)).alias("n_req"),
                (F.max("us") - F.min("us")).alias("span_us"))
           .where(F.col("span_us") > 0))
    svc = (load(spark, sf_dir, "documents")
           .select(F.expr("cast(size(filter(split(text, ' '),"
                          " t -> t <> '')) as bigint)").alias("tok"))
           .agg(F.sum("tok").alias("tok_sum"),
                F.count(F.lit(1)).alias("n_docs"))
           .select(F.expr(f"{_QW_US_PER_TOK} * tok_sum div n_docs")
                   .alias("s_us")))
    base = (arr.crossJoin(F.broadcast(svc))
            .select("n_req", "span_us", "s_us",
                    F.explode(F.expr(f"array({reps})")).alias("r")))
    rho = "((1000000 * n_req * s_us) div (r * span_us))"
    return base.select(
        F.col("r").cast("int").alias("replicas"),
        "n_req", "s_us",
        F.expr(rho).alias("rho_e6"),
        F.expr(f"CASE WHEN {rho} >= 1000000 THEN -1"
               f" ELSE ({rho} * s_us) div (2 * (1000000 - {rho})) END")
         .alias("wait_us"))


_QW_SQL = f"""
WITH arr AS (
  SELECT CAST(count(*) AS BIGINT) AS n_req,
         CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS span_us
  FROM events
  HAVING CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) > 0
),
svc AS (
  SELECT {_QW_US_PER_TOK} * CAST(sum(len(list_filter(
             string_split(text, ' '), t -> t <> ''))) AS BIGINT)
         // CAST(count(*) AS BIGINT) AS s_us
  FROM documents
),
base AS (
  SELECT n_req, span_us, s_us, unnest([{", ".join(str(r) for r in _QW_REPLICAS)}]) AS r
  FROM arr, svc
)
SELECT CAST(r AS INT) AS replicas,
       n_req, s_us,
       (1000000 * n_req * s_us) // (r * span_us) AS rho_e6,
       CASE WHEN (1000000 * n_req * s_us) // (r * span_us) >= 1000000
            THEN -1
            ELSE ((1000000 * n_req * s_us) // (r * span_us)) * s_us
                 // (2 * (1000000
                          - (1000000 * n_req * s_us) // (r * span_us)))
       END AS wait_us
FROM base
"""

QUERIES["serving_queue_wait_curve"] = (_serving_queue_wait_curve, _QW_SQL)


# ---------------------------------------------------------------------------
# 3D-parallel training plan budget (Megatron/ZeRO arithmetic)
# ---------------------------------------------------------------------------
# Public formulas: pipeline bubble fraction (p-1)/(m+p-1) (Narayanan et
# al., Megatron-LM 1F1B schedule); ring all-reduce volume per rank
# 2·(dp-1)/dp x payload (Baidu ring); ZeRO stage memory tiers for
# mixed-precision Adam at 16 bytes/param — fp16 weights 2 + fp16 grads
# 2 + fp32 master/m/v 12 (Rajbhandari et al.): stage1 shards the 12,
# stage2 also the grads, stage3 everything.
_PP_GPUS = 256                    # cluster size
_PP_PARAMS = 1_000_000_000        # model parameters
_PP_SEQ_LEN = 2048                # packing length (tokens/sequence)
_PP_GB_SEQ = 512                  # global batch (sequences/step)
_PP_MICRO_SEQ = 2                 # microbatch (sequences)
_PP_GRID = tuple((tp, pp) for tp in (1, 2, 4, 8) for pp in (1, 2, 4, 8))


def _parallelism_plan_budget(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Parallelism-plan sizing table: for every (tensor, pipeline)
    split of a {_PP_GPUS}-GPU cluster, the 1F1B pipeline bubble
    fraction, per-GPU memory under ZeRO stages 0-3, the per-step ring
    all-reduce volume, and the MEASURED epoch cost — steps/epoch from
    the corpus's packed-sequence count and the bubble-adjusted
    microbatch-slot total per epoch. The table a training-infra
    planner reads tp/pp/dp and the ZeRO stage from before a run; the
    corpus scan is what ties it to THIS dataset rather than a
    spreadsheet.

    Determinism: every column is integer arithmetic on exact token
    counts (floors via div; constants precomputed Python-side — DuckDB
    literal math is INT32, CLAUDE.md).

    Scale: ONE documents scan to a 1-row token-count aggregate,
    cross-joined (broadcast) with the {len(_PP_GRID)}-row constant
    grid. The config grid never grows with data.
    """
    rows = []
    for tp, pp in _PP_GRID:
        dp = _PP_GPUS // (tp * pp)
        m = _PP_GB_SEQ // (dp * _PP_MICRO_SEQ)
        if dp < 1 or m < 1:
            continue
        shard = _PP_PARAMS // (tp * pp)
        rows.append((tp, pp, dp, m,
                     1_000_000 * (pp - 1) // (m + pp - 1),
                     16 * shard,
                     4 * shard + 12 * shard // dp,
                     2 * shard + 14 * shard // dp,
                     16 * shard // dp,
                     2 * (dp - 1) * 2 * shard // dp))
    grid = spark.createDataFrame(
        rows, "tp int, pp int, dp int, microbatches int, bubble_e6 long,"
        " mem_z0_bytes long, mem_z1_bytes long, mem_z2_bytes long,"
        " mem_z3_bytes long, allreduce_bytes long")
    toks = (load(spark, sf_dir, "documents")
            .agg(F.sum(F.expr(
                "cast(size(filter(split(text, ' '), t -> t <> ''))"
                " as bigint)")).alias("total_tokens")))
    return (grid.crossJoin(F.broadcast(toks))
            .withColumn("n_sequences", F.expr(
                f"(total_tokens + {_PP_SEQ_LEN - 1}) div {_PP_SEQ_LEN}"))
            .withColumn("steps_per_epoch", F.expr(
                f"(n_sequences + {_PP_GB_SEQ - 1}) div {_PP_GB_SEQ}"))
            .select("tp", "pp", "dp", "microbatches", "bubble_e6",
                    "mem_z0_bytes", "mem_z1_bytes", "mem_z2_bytes",
                    "mem_z3_bytes", "allreduce_bytes",
                    "n_sequences", "steps_per_epoch",
                    F.expr("steps_per_epoch * (microbatches + pp - 1)")
                     .cast("long").alias("pipe_slots_per_epoch")))


def _pp_sql() -> str:
    rows = []
    for tp, pp in _PP_GRID:
        dp = _PP_GPUS // (tp * pp)
        m = _PP_GB_SEQ // (dp * _PP_MICRO_SEQ)
        if dp < 1 or m < 1:
            continue
        shard = _PP_PARAMS // (tp * pp)
        rows.append(f"({tp}, {pp}, {dp}, {m},"
                    f" {1_000_000 * (pp - 1) // (m + pp - 1)},"
                    f" {16 * shard}, {4 * shard + 12 * shard // dp},"
                    f" {2 * shard + 14 * shard // dp},"
                    f" {16 * shard // dp},"
                    f" {2 * (dp - 1) * 2 * shard // dp})")
    values = ", ".join(rows)
    return f"""
WITH grid (tp, pp, dp, microbatches, bubble_e6, mem_z0_bytes,
           mem_z1_bytes, mem_z2_bytes, mem_z3_bytes, allreduce_bytes)
    AS (VALUES {values}),
toks AS (
  SELECT CAST(sum(len(list_filter(string_split(text, ' '),
                                  t -> t <> ''))) AS BIGINT)
             AS total_tokens
  FROM documents
)
SELECT CAST(tp AS INT) AS tp, CAST(pp AS INT) AS pp,
       CAST(dp AS INT) AS dp,
       CAST(microbatches AS INT) AS microbatches,
       CAST(bubble_e6 AS BIGINT) AS bubble_e6,
       CAST(mem_z0_bytes AS BIGINT) AS mem_z0_bytes,
       CAST(mem_z1_bytes AS BIGINT) AS mem_z1_bytes,
       CAST(mem_z2_bytes AS BIGINT) AS mem_z2_bytes,
       CAST(mem_z3_bytes AS BIGINT) AS mem_z3_bytes,
       CAST(allreduce_bytes AS BIGINT) AS allreduce_bytes,
       (total_tokens + {_PP_SEQ_LEN - 1}) // {_PP_SEQ_LEN}
           AS n_sequences,
       ((total_tokens + {_PP_SEQ_LEN - 1}) // {_PP_SEQ_LEN}
        + {_PP_GB_SEQ - 1}) // {_PP_GB_SEQ} AS steps_per_epoch,
       (((total_tokens + {_PP_SEQ_LEN - 1}) // {_PP_SEQ_LEN}
         + {_PP_GB_SEQ - 1}) // {_PP_GB_SEQ})
           * (microbatches + pp - 1) AS pipe_slots_per_epoch
FROM grid, toks
"""


QUERIES["parallelism_plan_budget"] = (_parallelism_plan_budget, _pp_sql())


# ---------------------------------------------------------------------------
# preemption_loss_replay (round 11): checkpoint cadence vs real failures
# ---------------------------------------------------------------------------
# The empirical companion to ``checkpoint_interval_daly``: Young/Daly
# gives the OPTIMAL interval under a Poisson failure assumption; this
# replays candidate checkpoint cadences against the ACTUAL failure
# stream ('error' events as preemptions) and charges each cadence its
# realized cost — work lost since the last checkpoint at every
# preemption ((t - t0) mod C, pure integer arithmetic) plus the
# checkpoint writes themselves.
_PRE_GRID_MIN = (5, 15, 30, 60)      # candidate cadences, minutes
_PRE_WRITE_US = 30_000_000           # checkpoint write cost: 30 s


def preemption_loss_replay(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Per candidate checkpoint cadence C: the number of replayed
    preemptions, total work lost (time since last checkpoint at each
    'error' event), total checkpoint-write cost over the observed
    horizon, the combined overhead, and a flag on the grid's argmin —
    the table that validates (or overrides) the Young/Daly analytic
    choice against what the cluster actually did.

    Determinism: all integer microsecond arithmetic; (t - t0) is
    nonnegative so ``%`` agrees across engines; the argmin ties break
    toward the SHORTER cadence via the (overhead, C) struct-min rule.

    Scale: one events scan filtered to the failure type (pushed
    predicate), reduced map-side to per-cadence sums against a
    broadcast 1-row t0/horizon aggregate; the grid is a 4-literal
    explode. |grid| rows out. At 100 TB nothing changes shape — the
    scan dominates.
    """
    ev = (load(spark, sf_dir, "events")
          .where(F.col("event_type") == "error")
          .select(F.expr("unix_micros(cast(ts as timestamp))")
                  .alias("us")))
    span = ev.agg(F.min("us").alias("t0"), F.max("us").alias("t1"),
                  F.count(F.lit(1)).cast("long").alias("n_preempt"))
    grid = F.explode(F.array(*[F.lit(m) for m in _PRE_GRID_MIN])
                     ).alias("c_min")
    per = (ev.crossJoin(F.broadcast(span))
           .select(grid, "us", "t0", "t1", "n_preempt")
           .withColumn("c_us", F.expr("CAST(c_min AS BIGINT)"
                                      " * 60000000"))
           .groupBy("c_min")
           .agg(F.max("c_us").alias("c_us"),
                F.max("t0").alias("t0"), F.max("t1").alias("t1"),
                F.max("n_preempt").alias("n_preempt"),
                F.sum(F.expr("(us - t0) % c_us")).cast("long")
                 .alias("lost_work_us")))
    out = (per.withColumn(
               "ckpt_cost_us",
               F.expr(f"((t1 - t0) div c_us) * "
                      f"CAST({_PRE_WRITE_US} AS BIGINT)"))
           .withColumn("total_overhead_us",
                       F.expr("lost_work_us + ckpt_cost_us")))
    best = (out.agg(F.min(F.struct("total_overhead_us", "c_min"))
                    .alias("b"))
            .select(F.col("b.c_min").alias("best_c")))
    return (out.crossJoin(F.broadcast(best))
            .select(F.col("c_min").cast("long").alias("cadence_min"),
                    "n_preempt", "lost_work_us", "ckpt_cost_us",
                    "total_overhead_us",
                    (F.col("c_min") == F.col("best_c")).cast("long")
                    .alias("is_grid_optimal")))


def _pre_sql() -> str:
    grid = ", ".join(f"({m})" for m in _PRE_GRID_MIN)
    return f"""
WITH ev AS (
    SELECT CAST(epoch_us(ts) AS BIGINT) AS us
    FROM events WHERE event_type = 'error'
),
span AS (
    SELECT CAST(min(us) AS BIGINT) AS t0,
           CAST(max(us) AS BIGINT) AS t1,
           CAST(count(*) AS BIGINT) AS n_preempt
    FROM ev
),
per AS (
    SELECT g.c_min,
           CAST(g.c_min AS BIGINT) * 60000000 AS c_us,
           max(s.t0) AS t0, max(s.t1) AS t1,
           max(s.n_preempt) AS n_preempt,
           CAST(sum((e.us - s.t0)
                    % (CAST(g.c_min AS BIGINT) * 60000000))
                AS BIGINT) AS lost_work_us
    FROM ev e, span s, (VALUES {grid}) g(c_min)
    GROUP BY g.c_min
),
out_rows AS (
    SELECT c_min, n_preempt, lost_work_us,
           ((t1 - t0) // c_us) * CAST({_PRE_WRITE_US} AS BIGINT)
               AS ckpt_cost_us,
           lost_work_us
               + ((t1 - t0) // c_us) * CAST({_PRE_WRITE_US} AS BIGINT)
               AS total_overhead_us
    FROM per
),
best AS (
    SELECT min(struct_pack(o := total_overhead_us, c := c_min)) AS b
    FROM out_rows
)
SELECT CAST(o.c_min AS BIGINT) AS cadence_min, o.n_preempt,
       o.lost_work_us, o.ckpt_cost_us, o.total_overhead_us,
       CAST(CASE WHEN o.c_min = (b.b).c THEN 1 ELSE 0 END AS BIGINT)
           AS is_grid_optimal
FROM out_rows o, best b
"""


QUERIES["preemption_loss_replay"] = (preemption_loss_replay,
                                     _pre_sql())


# ---------------------------------------------------------------------------
# compute_optimal_frontier (round 11): Chinchilla allocation vs supply
# ---------------------------------------------------------------------------
# Hoffmann et al. 2022: compute-optimally, params and tokens scale as
# sqrt(C/6k) with D/N ~ k = 20 tokens/param. The UNCONSTRAINED N*/D*
# per FLOP budget are pure constants (integer-sqrt'd in Python, shipped
# as literals to both engines); the data enters through the MEASURED
# effective token supply — unique corpus words times the r = 3/5
# epoch-decay series from data_epoch_allocation — which clips D and
# rebalances N at fixed compute (the data-constrained regime of
# Muennighoff 2023).
_COF_TPP = 20                       # tokens-per-parameter at optimum
_COF_FLOPS_E15 = (10 ** 3, 10 ** 4, 10 ** 5, 10 ** 6, 10 ** 7)
_COF_EPOCHS = 6                     # max epochs backing the supply
# loss constants (Chinchilla eq. 10, alpha = beta = 0.5 variant)
_COF_E0, _COF_A, _COF_B = "1.69", "406.4", "410.7"


def _cof_rows() -> list[tuple[int, int, int, float]]:
    import math as m

    rows = []
    for c in _COF_FLOPS_E15:
        flops = c * 10 ** 15
        n_opt = m.isqrt(flops // (6 * _COF_TPP))
        rows.append((c, n_opt, _COF_TPP * n_opt, float(flops)))
    return rows


def compute_optimal_frontier(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Per FLOP budget: the compute-optimal parameter/token split, the
    corpus's measured effective token supply, whether the budget is
    DATA-CONSTRAINED at that supply, the clipped token count and the
    rebalanced parameter count at fixed compute, and the scaling-law
    loss estimate — the one-page table a pre-training plan starts
    from, with the "do we even have the tokens" column computed from
    the actual corpus instead of assumed.

    Determinism: unconstrained N*/D* are Python-isqrt integer
    literals; supply is an exact integer rational (e4 floor); the
    rebalance divides an EXACTLY-representable double FLOP literal by
    6*d (< 2^53) — a fixed per-row IEEE tree, same floors both
    engines; loss adds constant-literal A/sqrt, B/sqrt terms (sqrt is
    correctly rounded IEEE — the privacy_composition_budget contract).

    Scale: ONE documents scan reduced map-side to 1 row (total words),
    broadcast against a 5-literal grid. Nothing about the shape
    changes with corpus size.
    """
    supply = (load(spark, sf_dir, "documents")
              .agg(F.sum(F.size(F.split(F.trim("text"), r"\s+")))
                   .cast("long").alias("u")))
    # effective supply multiplier: sum_{i=0}^{E-1} (3/5)^i in e4
    mult_e4 = sum(10 ** 4 * 3 ** i * 5 ** (_COF_EPOCHS - 1 - i)
                  for i in range(_COF_EPOCHS)) // 5 ** (_COF_EPOCHS - 1)
    grid = F.explode(F.array(*[
        F.struct(F.lit(c).cast("long").alias("c_e15"),
                 F.lit(n).cast("long").alias("n_opt"),
                 F.lit(d).cast("long").alias("d_opt"),
                 F.lit(cf).alias("c_flops"))
        for c, n, d, cf in _cof_rows()])).alias("g")
    return (supply.select(grid, "u")
            .select("g.c_e15", "g.n_opt", "g.d_opt",
                    F.expr(f"(u * {mult_e4}) div 10000")
                     .alias("supply_tokens"),
                    F.expr("CAST(g.d_opt > (u * %d) div 10000 AS LONG)"
                           % mult_e4).alias("data_limited"),
                    F.expr(f"least(g.d_opt, (u * {mult_e4})"
                           f" div 10000)").alias("d_clip"),
                    "g.c_flops")
            .withColumn("n_adj",
                        F.expr("CAST(floor(c_flops"
                               " / (6.0D * CAST(d_clip AS DOUBLE)))"
                               " AS BIGINT)"))
            .withColumn("loss_e6",
                        F.expr(f"CAST(floor(1000000.0D * ({_COF_E0}D"
                               f" + {_COF_A}D / sqrt(CAST(n_adj AS"
                               f" DOUBLE)) + {_COF_B}D /"
                               f" sqrt(CAST(d_clip AS DOUBLE))))"
                               f" AS BIGINT)"))
            .select("c_e15", "n_opt", "d_opt", "supply_tokens",
                    "data_limited", "d_clip", "n_adj", "loss_e6"))


def _cof_sql() -> str:
    mult_e4 = sum(10 ** 4 * 3 ** i * 5 ** (_COF_EPOCHS - 1 - i)
                  for i in range(_COF_EPOCHS)) // 5 ** (_COF_EPOCHS - 1)
    rows = ", ".join(f"({c}, {n}, {d}, {cf!r})"
                     for c, n, d, cf in _cof_rows())
    return f"""
WITH supply AS (
    SELECT CAST(sum(len(regexp_split_to_array(trim(text), '\\s+')))
                AS BIGINT) AS u
    FROM documents
),
grid(c_e15, n_opt, d_opt, c_flops) AS (VALUES {rows})
SELECT CAST(g.c_e15 AS BIGINT) AS c_e15,
       CAST(g.n_opt AS BIGINT) AS n_opt,
       CAST(g.d_opt AS BIGINT) AS d_opt,
       (s.u * {mult_e4}) // 10000 AS supply_tokens,
       CAST(CAST(g.d_opt AS BIGINT)
            > (s.u * {mult_e4}) // 10000 AS BIGINT) AS data_limited,
       least(CAST(g.d_opt AS BIGINT),
             (s.u * {mult_e4}) // 10000) AS d_clip,
       CAST(floor(g.c_flops
                  / (6.0 * CAST(least(CAST(g.d_opt AS BIGINT),
                        (s.u * {mult_e4}) // 10000) AS DOUBLE)))
            AS BIGINT) AS n_adj,
       CAST(floor(1000000.0 * ({_COF_E0}
            + {_COF_A} / sqrt(CAST(CAST(floor(g.c_flops
                  / (6.0 * CAST(least(CAST(g.d_opt AS BIGINT),
                        (s.u * {mult_e4}) // 10000) AS DOUBLE)))
                  AS BIGINT) AS DOUBLE))
            + {_COF_B} / sqrt(CAST(least(CAST(g.d_opt AS BIGINT),
                  (s.u * {mult_e4}) // 10000) AS DOUBLE))))
            AS BIGINT) AS loss_e6
FROM supply s, grid g
"""


QUERIES["compute_optimal_frontier"] = (compute_optimal_frontier,
                                       _cof_sql())


# ---------------------------------------------------------------------------
# gradient_noise_scale_proxy (round 11): critical batch size table
# ---------------------------------------------------------------------------
# McCandlish et al. 2018: the critical batch size is the gradient
# noise scale B_simple = tr(Sigma)/|G|^2. Proxied per event-type
# "task" with the scalar cents reward as the per-example gradient:
# B = Var(x)/Mean(x)^2 = (n*sumsq - sum^2)/sum^2 — an exact integer
# rational emitted at e2 via the two-step long-division idiom. x is
# the reward in integer DOLLARS (cents div 100): with cents the raw
# moment n*sumsq already left int64 at sf1's magnitudes (measured —
# ARITHMETIC_OVERFLOW), dollars buy 10^4 headroom on both moments.


def gradient_noise_scale_proxy(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Per event-type: the gradient-noise-scale proxy (critical batch
    size, e2), its integer moments, and the recommended power-of-two
    batch size (largest 2^k <= proxy, 0 when the proxy is < 1) — the
    "how large a batch is worth running" table a training-efficiency
    review reads next to the parallelism and queue-wait budgets.

    Determinism: moments are exact integer DOLLAR sums (cents div
    100 — floor in both engines); the e2 quotient uses floor division
    twice (q * 100 + (rem * 100) div den), exact while s^2 * 100 and
    n * ss stay in int64 — per-group |sum dollars| < 3e8 and
    n * mean-square-dollars < 9e16, i.e. ~10^4 past sf1's measured
    magnitudes; lift the unit again beyond that. The power-of-two
    floor is an integer comparison chain (no log).

    Scale: ONE events scan, map-side combinable to |event_types|
    rows. Nothing else moves.
    """
    m = (load(spark, sf_dir, "events")
         .select("event_type", F.expr(f"({_CENTS}) div 100").alias("x"))
         .groupBy("event_type")
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum("x").cast("long").alias("s"),
              F.sum(F.expr("x * x")).cast("long").alias("ss")))
    num = "(n * ss - s * s)"
    den = "greatest(s * s, 1)"
    gns = (f"({num} div {den}) * 100"
           f" + (({num} % {den}) * 100) div {den}")
    pow2 = " ".join(
        f"WHEN gns_e2 >= {100 * 2 ** k} THEN CAST({2 ** k} AS BIGINT)"
        for k in range(20, -1, -1))
    return (m.withColumn("gns_e2", F.expr(gns))
            .select("event_type", "n", F.col("s").alias("sum_cents"),
                    F.col("ss").alias("sumsq_cents"), "gns_e2",
                    F.expr(f"CASE {pow2} ELSE CAST(0 AS BIGINT) END")
                     .alias("batch_pow2")))


def _gns_sql() -> str:
    num = "(n * ss - s * s)"
    den = "greatest(s * s, 1)"
    gns = (f"({num} // {den}) * 100"
           f" + (({num} % {den}) * 100) // {den}")
    pow2 = " ".join(
        f"WHEN gns_e2 >= {100 * 2 ** k} THEN CAST({2 ** k} AS BIGINT)"
        for k in range(20, -1, -1))
    return f"""
WITH m AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS s,
           CAST(sum(x * x) AS BIGINT) AS ss
    FROM (SELECT event_type, ({_CENTS_DUCK}) // 100 AS x
          FROM events)
    GROUP BY event_type
),
g AS (
    SELECT event_type, n, s AS sum_cents, ss AS sumsq_cents,
           {gns} AS gns_e2
    FROM m
)
SELECT event_type, n, sum_cents, sumsq_cents, gns_e2,
       CASE {pow2} ELSE CAST(0 AS BIGINT) END AS batch_pow2
FROM g
"""


QUERIES["gradient_noise_scale_proxy"] = (gradient_noise_scale_proxy,
                                         _gns_sql())
