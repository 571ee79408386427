package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One (md5 draw, row key) pair flowing into per-group min-k selection. */
case class DrawKey(draw: String, key: Long)

/** Bounded min-k aggregator over (draw asc, key asc): keeps at most the
  * k smallest entries in its buffer, so a billion-row group reduces in
  * O(k) memory with map-side partial aggregation — the same property
  * that makes [[TopKAggregator]] scale, applied to quota selection.
  * Deterministic: md5-draw ties break on ascending key. */
class MinKAggregator(k: Int) extends Aggregator[DrawKey, Seq[DrawKey], Seq[DrawKey]] {
  private def before(a: DrawKey, b: DrawKey): Boolean =
    a.draw < b.draw || (a.draw == b.draw && a.key < b.key)
  override def zero: Seq[DrawKey] = Vector.empty
  override def reduce(buf: Seq[DrawKey], a: DrawKey): Seq[DrawKey] =
    if (buf.size >= k && before(buf.last, a)) buf
    else ((a +: buf).sortWith(before)).take(k)
  override def merge(b1: Seq[DrawKey], b2: Seq[DrawKey]): Seq[DrawKey] =
    (b1 ++ b2).sortWith(before).take(k)
  override def finish(r: Seq[DrawKey]): Seq[DrawKey] = r.sortWith(before)
  override def bufferEncoder: Encoder[Seq[DrawKey]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[DrawKey]] = ExpressionEncoder()
}

/** Deterministic sampling operators for a training-data pipeline.
  *
  * `DataFrame.sample()` draws from a per-partition RNG: the selected set
  * changes with partitioning, retries, and engine version — useless when a
  * 100 TB corpus must be sampled CONSISTENTLY (the same doc either is or
  * isn't in the 1% eval split, today and in next month's rerun, here and
  * in the DuckDB audit job). These operators decide membership from a
  * hash of a stable key instead: pure narrow codegen'd projections, no
  * shuffle, no state, trivially reproducible by any engine with md5.
  *
  * The hash is the integer value of the first 8 hex digits of
  * md5(key) — 32 uniform bits, engine-independent (DuckDB:
  * `('0x' || substr(md5(key), 1, 8))::BIGINT`) — reduced mod 1e6 to a
  * per-row draw in [0, 1e6); a row is kept iff draw < fraction·1e6.
  * Keys hash independently of each other, so subsamples nest: the 1%
  * sample is a subset of the 10% sample (same draw, smaller cutoff) —
  * the property that makes scaling-law subsets comparable.
  */
object Sampling {

  private val buckets = 1000000L

  /** Per-row draw in [0, 1e6) from the stable key. */
  def drawOf(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % buckets

  /** Keep a deterministic `fraction` of rows by key. */
  def consistentSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.filter(drawOf(col(keyCol)) < math.round(fraction * buckets))

  /** Domain-mixture resampling: downsample each domain so the OUTPUT
    * follows the target weights (the "20% code / 80% web" training-mix
    * step). Pure downsampling can't mint rows, so the largest faithful
    * mixture is bounded by the scarcest domain: with observed counts n_d
    * and weights w_d, the binding ratio r = min_d(n_d / w_d) sets each
    * domain's kept count to w_d·r (keep fraction w_d·r/n_d — exactly 1.0
    * for the binding domain). Domains without a weight are dropped.
    *
    * Unlike [[stratifiedSample]], the fractions are DATA-dependent, so
    * they're computed in-plan: per-domain counts (one tiny aggregate),
    * the binding ratio (one global min over |domains| rows), cutoffs
    * broadcast back onto the corpus — no driver collect, and the corpus
    * itself never shuffles. Membership still decides by the md5 key draw:
    * deterministic under rerun/partitioning, and nested across weight
    * rescalings of the whole map. */
  def mixtureSample(df: DataFrame, keyCol: String, domainCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be non-empty and positive")
    val ss = df.sparkSession
    import ss.implicits._
    val w = weights.toSeq.toDF("__dom", "__w")
    val counts = df.groupBy(col(domainCol).as("__dom"))
      .agg(count(lit(1)).cast("double").as("__n"))
      .join(broadcast(w), "__dom")
    val r = counts.agg(min(col("__n") / col("__w")).as("__r"))
    val cutoffs = counts.crossJoin(broadcast(r))
      .select(col("__dom"),
        (col("__w") * col("__r") / col("__n") * buckets).as("__cut"))
    df.join(broadcast(cutoffs), col(domainCol) === col("__dom"))
      .filter(drawOf(col(keyCol)).cast("double") < col("__cut"))
      .drop("__dom", "__cut")
  }

  /** Temperature-scaled resampling (the multilingual data-balancing step:
    * sample languages/domains ∝ p^(1/T) instead of their natural share,
    * flattening the mix toward uniform for T > 1 so rare domains keep
    * representation). The target weights are DERIVED from the observed
    * counts in-plan — w_d = (n_d/N)^(1/T) — and fed through the same
    * binding-ratio cutoff math as [[mixtureSample]]: r = min_d(n_d/w_d)
    * makes the output the largest pure-downsampling realization of the
    * tempered mix. For T > 1 the binding domain is provably the rarest
    * (n_d/w_d ∝ n_d^(1-1/T) is increasing in n_d), i.e. the scarce
    * domain is kept whole and the dominant ones are thinned — exactly
    * the intended flattening. Everything is one tiny per-domain
    * aggregate + two broadcast scalars; the corpus never shuffles, and
    * membership stays the deterministic md5 key draw. */
  def temperatureSample(df: DataFrame, keyCol: String, domainCol: String,
      temperature: Double): DataFrame = {
    require(temperature > 0, "temperature must be positive")
    val counts = df.groupBy(col(domainCol).as("__dom"))
      .agg(count(lit(1)).cast("double").as("__n"))
    val tot = counts.agg(sum(col("__n")).as("__tot"))
    val wts = counts.crossJoin(broadcast(tot))
      .select(col("__dom"), col("__n"),
        pow(col("__n") / col("__tot"), lit(1.0 / temperature)).as("__w"))
    val r = wts.agg(min(col("__n") / col("__w")).as("__r"))
    val cutoffs = wts.crossJoin(broadcast(r))
      .select(col("__dom"),
        (col("__w") * col("__r") / col("__n") * buckets).as("__cut"))
    df.join(broadcast(cutoffs), col(domainCol) === col("__dom"))
      .filter(drawOf(col(keyCol)).cast("double") < col("__cut"))
      .drop("__dom", "__cut")
  }

  /** Per-stratum fractions (e.g. downsample dominant languages, keep all
    * of rare ones). Strata absent from `fractions` fall back to
    * `defaultFraction`. The thresholds compile to one codegen'd CASE —
    * no join, no shuffle; the draw stays a function of the key alone so
    * per-stratum subsets still nest across fraction changes. */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0): DataFrame = {
    val cutoff = fractions.toSeq.sortBy(_._1).foldLeft(
      lit(math.round(defaultFraction * buckets))) { case (acc, (stratum, f)) =>
      when(col(strataCol) === stratum, lit(math.round(f * buckets))).otherwise(acc)
    }
    df.filter(drawOf(col(keyCol)) < cutoff)
  }

  /** Exactly `k` rows per group (fewer when the group is smaller) — the
    * deterministic twin of per-group reservoir sampling. Rank rows inside
    * each group by md5(seed‖key) (a seeded uniform draw any engine can
    * reproduce) and keep ranks ≤ k; the key itself breaks md5 ties.
    * `keyCol` must be an integral, group-unique id (every fixture key
    * is).
    *
    * Unlike a true reservoir the selection is a pure function of
    * (seed, key set): rerun-stable, partitioning-independent, and
    * re-auditable row-for-row. Changing the seed redraws; growing k keeps
    * the smaller sample as a prefix (rank order is seed-fixed).
    *
    * Plan shape (the skew-proof one): the obvious
    * `row_number() over (partition by group order by draw)` shuffles the
    * WHOLE corpus — payload included — and then sorts each group on a
    * single task, so one billion-row domain serializes the stage. Here a
    * k-bounded min-heap aggregator ([[MinKAggregator]]) reduces
    * (group, draw, key) with map-side partials — every map task emits at
    * most k rows per group, whatever the group's size — and the kept
    * (key, rank) set, |groups|·k rows (the QUOTA, tiny by construction),
    * broadcasts back onto the corpus: the corpus itself is scanned, never
    * shuffled, never group-sorted. Results are row-identical to the
    * window formulation (spec-pinned). */
  def groupSample(df: DataFrame, keyCol: String, groupCol: String,
      k: Int, seed: Long): DataFrame = {
    require(k >= 1, "k >= 1")
    val draw = md5(concat_ws("-", lit(seed), col(keyCol).cast("string")))
    val mink = udaf(new MinKAggregator(k))
    val kept = df
      .groupBy(col(groupCol))
      .agg(mink(draw, col(keyCol).cast("long")).as("__kept"))
      .select(posexplode(col("__kept")).as(Seq("__pos", "__dk")))
      .select(col("__dk.key").as("__key"),
        (col("__pos") + 1).cast("long").as("draw_rank"))
    df.join(broadcast(kept), col(keyCol).cast("long") === col("__key"))
      .drop("__key")
  }

  /** Weighted sampling without replacement, deterministic: the
    * Efraimidis–Spirakis A-ES scheme ranks every row by u^(1/w) (u a
    * uniform draw, w the row's weight) and keeps the top k — each row's
    * inclusion probability is proportional to its weight, yet the
    * selected set is a pure function of the key set (u comes from the
    * same md5 draw as the rest of the family, shifted to (0, 1]).
    *
    * This is the "sample training docs proportional to quality score /
    * length" primitive. The ranking key is computed as a narrow
    * codegen'd projection; the top-k is `orderBy(...).limit(k)`, which
    * Spark executes as TakeOrdered — each partition keeps k rows, the
    * driver merges P·k, nothing resembling a global sort ever runs. The
    * emitted score is rounded to 6 decimals; ORDER uses the raw double
    * (a cross-engine last-ulp flip would need two keys within one ulp —
    * with 32-bit draws and varying weights, not a realistic tie). */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    val u = (drawOf(col(keyCol)) + 1L).cast("double") / lit(buckets.toDouble)
    val esKey = pow(u, lit(1.0) / col(weightCol).cast("double"))
    // A-ES precondition is strictly positive weights: w <= 0 makes 1/w
    // negative or ±Inf, and pow(u, ·) then yields degenerate keys that
    // can RANK FIRST instead of excluding the row. Zero/negative weight
    // means "never sample" — enforce it by filtering, not by accident.
    df.filter(col(weightCol).cast("double") > 0.0)
      .withColumn("es_key", esKey)
      .orderBy(col("es_key").desc, col(keyCol))
      .limit(k)
      .withColumn("es_key", round(col("es_key"), 6))
  }

  /** Train/val/test split assignment: the draw partitions [0, 1e6) by the
    * cumulative weight cutoffs, so every row gets exactly one label, the
    * same label on every rerun/engine, and growing one split's weight
    * only MOVES the boundary (rows never hop between non-adjacent
    * splits). Pure codegen'd CASE — no shuffle, no state. */
  /** Deterministic sharded negative sampling for contrastive training:
    * each row gets `k` "negative" partner ids — other rows, chosen by
    * position in a hash ring rather than an RNG, so the pairing is
    * partition-independent, rerun-stable, and engine-reproducible (the
    * properties a resumable 100 TB training job needs from its negatives).
    *
    * Rows hash into `nShards` shards (in-batch-negative practice: pair
    * within a shard, never across); within a shard they are ring-ordered
    * by (md5(key), key) — an order uncorrelated with any data column —
    * and row r takes rows (r+1) mod n, …, (r+k) mod n as negatives, via
    * equi-joins on (shard, ring position). Shuffles touch only (key,
    * shard, position) triples; the window is per-shard, never global.
    * Shards smaller than k+1 rows are dropped (not enough partners).
    * Output: (key, shard, neg_rank ∈ 1..k, neg_key). */
  def negativeSample(df: DataFrame, keyCol: String, k: Int = 2,
      nShards: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ring = df.select(col(keyCol).as("key"),
        (drawOf(col(keyCol)) % nShards).as("shard"),
        md5(col(keyCol).cast("string")).as("__h"))
      .withColumn("rn", row_number()
        .over(Window.partitionBy(col("shard")).orderBy(col("__h"), col("key"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("shard"))))
      .filter(col("n") >= k + 1)
    val partners = ring.select(col("shard").as("p_shard"),
      col("rn").as("p_rn"), col("key").as("neg_key"))
    (1 to k).map { j =>
      ring.select(col("key"), col("shard"),
          lit(j.toLong).as("neg_rank"),
          (((col("rn") - 1 + j) % col("n")) + 1).as("__target"))
        .join(partners,
          col("shard") === col("p_shard") && col("__target") === col("p_rn"))
        .select(col("key"), col("shard"), col("neg_rank"), col("neg_key"))
    }.reduce(_ unionAll _)
  }

  def splitAssign(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val cutoffs = splits.scanLeft(0.0)(_ + _._2).tail
      .map(f => math.round(f * buckets)).zip(splits.map(_._1))
    val d = drawOf(col(keyCol))
    val label = cutoffs.init.reverse.foldLeft(lit(cutoffs.last._2)) {
      case (acc, (cut, name)) => when(d < cut, name).otherwise(acc)
    }
    df.withColumn("split", label)
  }

  /** Curriculum staging: assign each row a difficulty stage 1..4 by the
    * quartiles of `scoreCol` WITHIN its group (per-language quartiles,
    * so one verbose language doesn't push every other language's docs
    * into the "hard" stages). The standard curriculum-ordering pass —
    * train on stage 1 first, anneal upward. Cutoffs are exact
    * interpolated percentiles (the rel_percentiles parity precedent);
    * the stage comparison is the same fixed expression on both engines.
    * One aggregate for the cutoffs (|groups| rows, broadcast back), one
    * corpus projection. */
  def curriculumStages(df: DataFrame, groupCol: String,
      scoreCol: String): DataFrame = {
    val cuts = df.groupBy(col(groupCol)).agg(
      percentile(col(scoreCol), lit(0.25)).as("__q1"),
      percentile(col(scoreCol), lit(0.5)).as("__q2"),
      percentile(col(scoreCol), lit(0.75)).as("__q3"))
    df.join(broadcast(cuts), Seq(groupCol))
      .withColumn("stage",
        (lit(1) + (col(scoreCol) > col("__q1")).cast("int")
          + (col(scoreCol) > col("__q2")).cast("int")
          + (col(scoreCol) > col("__q3")).cast("int")).cast("long"))
      .drop("__q1", "__q2", "__q3")
  }

  /** Data-mixture plan: given per-source integer weights and a total
    * token budget, how much of each source to sample and how many epochs
    * of it to run — the "domain weights → concrete sampling schedule"
    * calculation every mixture-trained run performs (cf. the published
    * practice of up-sampling small high-quality sources over multiple
    * epochs while big crawls run fractional).
    *
    * All arithmetic is exact integer (`div`, no doubles):
    *   target_g   = budget · w_g div Σw
    *   n_epochs_g = ⌈target_g / tokens_g⌉  (how many passes over g)
    *   last_epoch_ppm = parts-per-million of g sampled in the final
    *                    (partial) pass — 10⁶ means full passes only; 0
    *                    when the integer target rounds to zero (skip).
    * Sources with zero weight (or absent from `weights`) are excluded
    * from the plan; duplicate source keys are rejected.
    * One corpus aggregate; the plan frame is |sources| rows. */
  def mixturePlan(df: DataFrame, groupCol: String, textCol: String,
      weights: Seq[(String, Int)], budgetTokens: Long): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0),
      "weights must be non-negative")
    require(weights.exists(_._2 > 0), "at least one weight must be positive")
    require(weights.map(_._1).distinct.length == weights.length,
      "duplicate source keys in weights")
    require(budgetTokens > 0, "budget must be positive")
    val positive = weights.filter(_._2 > 0)
    val sumW = positive.map(_._2.toLong).sum
    val wDf = broadcast(df.sparkSession.createDataFrame(
      positive.map { case (g, w) => (g, w.toLong) })
      .toDF(groupCol, "__w"))
    df.select(col(groupCol),
        size(split(trim(col(textCol)), "\\s+")).cast("long").as("__n"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("n_tokens"))
      .join(wDf, Seq(groupCol))
      .withColumn("target_tokens",
        expr(s"(${budgetTokens}L * __w) div ${sumW}L"))
      .withColumn("n_epochs",
        expr("(target_tokens + n_tokens - 1) div n_tokens"))
      // an integer-rounded-to-zero target means "skip this source": zero
      // epochs AND a zero final pass (without the guard the formula
      // degenerates to 10⁶ ppm — "sample everything" — for a source with
      // no budget)
      .withColumn("last_epoch_ppm",
        expr("CASE WHEN n_epochs = 0 THEN 0L ELSE " +
          "((target_tokens - (n_epochs - 1) * n_tokens) * 1000000L) div n_tokens END"))
      .select(col(groupCol), col("n_docs"), col("n_tokens"),
        col("target_tokens"), col("n_epochs"), col("last_epoch_ppm"))
  }

  /** Leak-free train/val/test assignment: near-duplicate documents must
    * land in the SAME split, or the eval set silently contains training
    * data (the classic benchmark-leak failure). Every member of a
    * duplicate group adopts the split of the group's MINIMUM doc id (the
    * canonical representative — deterministic, so re-running with an
    * extended corpus cannot flip an old doc's split unless its group's
    * minimum changes); singletons keep their own [[splitAssign]] draw.
    *
    * `groups` is the (doc_id, group_id) frame from
    * [[graft.ops.Dedup.duplicateGroups]] — its key column is LITERALLY
    * named `doc_id` (that operator's contract) regardless of `keyCol`,
    * which only names the key in `df`; the values must be the same ids.
    * Only duplicate docs appear in it, so every join here is sized by
    * the duplicate subset, not the corpus; the corpus-wide work is the
    * one md5-draw projection.
    * Output: (doc_id, split, reassigned) — `reassigned` marks docs whose
    * own draw disagreed with their group representative's. */
  def leakFreeSplit(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)], groups: DataFrame): DataFrame = {
    require(groups.columns.contains("doc_id") &&
      groups.columns.contains("group_id"),
      "groups must be the (doc_id, group_id) frame from Dedup.duplicateGroups")
    val assigned = splitAssign(df, keyCol, splits)
      .select(col(keyCol), col("split"))
    val rep = groups.groupBy(col("group_id"))
      .agg(min(col("doc_id")).as("__rep"))
    val repSplit = groups.join(rep, Seq("group_id"))
      .join(assigned.select(col(keyCol).as("__rep"),
        col("split").as("__rep_split")), Seq("__rep"))
      .select(col("doc_id").as(keyCol), col("__rep_split"))
    assigned.join(repSplit, Seq(keyCol), "left")
      .select(col(keyCol),
        coalesce(col("__rep_split"), col("split")).as("split"),
        (col("__rep_split").isNotNull &&
          col("__rep_split") =!= col("split")).as("reassigned"))
  }

  /** Probability-proportional-to-size (PPS) Poisson sampling: row i with
    * size x_i gets inclusion probability π_i = min(1, n·x_i/Σx) and is
    * selected when its deterministic md5 draw falls under π_i — the
    * design whose Horvitz–Thompson estimator Σ_{selected} x_i/π_i is
    * unbiased for the total at expected sample size ≤ n. The same
    * consistent-hash membership contract as [[consistentSample]]: the
    * selected set is partition-, retry-, and engine-independent.
    *
    * Cross-engine exactness: Σx accumulates in integer cents as a
    * 38-digit decimal (exact at any scale — a BIGINT sum overflows
    * around 10¹² high-value rows); π is then one fixed IEEE tree
    * (n·x_i)/Σx of exactly-convertible doubles, and membership compares
    * the integer draw against round(π·10⁶) — an integer-vs-integer
    * gate, so both engines keep exactly the same rows.
    *
    * One broadcast 1-row total, then a narrow codegen'd filter — no
    * shuffle of the corpus. Returns the selected rows' (key, pi_ppm). */
  def ppsSample(df: DataFrame, keyCol: String, valueCol: String,
      totalN: Long): DataFrame = {
    require(totalN >= 1, "totalN >= 1")
    val cents = round(col(valueCol) * 100).cast("long")
    val tot = df.agg(
      sum(cents.cast("decimal(38,0)")).cast("double").as("__tot"))
    val pi = least(lit(1.0),
      lit(totalN.toDouble) * cents.cast("double") / col("__tot"))
    df.crossJoin(broadcast(tot))
      .withColumn("pi_ppm", round(pi * 1000000.0).cast("long"))
      .filter(drawOf(col(keyCol)) < col("pi_ppm"))
      .select(col(keyCol), col("pi_ppm"))
  }

  /** Neyman-optimal stratified sample allocation: stratum h of size N_h
    * and value standard deviation σ_h receives
    * n_h = ⌊ totalN · N_h σ_h / Σ_g N_g σ_g ⌋ — the allocation that
    * minimizes the variance of the stratified mean estimator at a fixed
    * total sample size (Neyman 1934). [[stratifiedSample]] draws at a
    * RATE; this computes the budget SPLIT a fixed-size audit sample
    * should use when strata differ in spread.
    *
    * Exactness across engines: the per-stratum second moment accumulates
    * in integer cents (sum and sum-of-squares as 38-digit decimals —
    * fold-order independent, exact), so the variance both engines carry
    * into sqrt is the SAME double and σ_h is bit-identical. The one
    * cross-engine float hazard left is Σ_g N_g σ_g (a sum over a handful
    * of stratum rows whose order differs between engines), so the share
    * is rounded to 6 decimals before the floor — the repo's standard
    * rounded-algebra gate convention, which makes both engines take the
    * floor on the same value.
    *
    * One aggregate over the corpus (map-side combinable), one broadcast
    * of the |strata|-row frame for the total: nothing here grows with
    * the data. Degenerate strata (n ≤ 1) contribute σ = 0. */
  def neymanAllocation(df: DataFrame, stratumCol: String, valueCol: String,
      totalN: Long): DataFrame = {
    val cents = round(col(valueCol) * 100).cast("decimal(38,0)")
    val per = df
      .select(col(stratumCol).as("stratum"), cents.as("__c"))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_pop"),
        sum(col("__c")).as("__s1"),
        sum(col("__c") * col("__c")).as("__s2"))
    // Sample variance from exact integer moments: (n·S2 − S1²)/(n(n−1)),
    // numerator exact in decimal then one correctly-rounded cast — both
    // engines convert the identical integer, so the doubles agree.
    val n = col("n_pop")
    val varCents2 = when(n > 1,
      (n * col("__s2") - col("__s1") * col("__s1")).cast("double")
        / (n * (n - 1)).cast("double")).otherwise(lit(0.0))
    val withSigma = per
      .withColumn("__sigma", sqrt(varCents2) / lit(100.0))
      .withColumn("__w", n.cast("double") * col("__sigma"))
    val tot = withSigma.agg(sum(col("__w")).as("__wsum"))
    withSigma.crossJoin(broadcast(tot))
      .select(col("stratum"), col("n_pop"),
        round(col("__sigma"), 6).as("sigma"),
        floor(lit(totalN.toDouble)
          * round(col("__w") / col("__wsum"), 6)).cast("long").as("alloc"))
  }
}
