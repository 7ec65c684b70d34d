package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's analytical query surface as named, reusable operators
  * (SURVEY.md §2.4–2.7). All are single-pass declarative plans: Catalyst
  * plans top-k as TakeOrderedAndProject (no full sort at scale), the
  * latest-per-group window as one shuffle on the group key, and grouped
  * aggregates as partial+final hash aggregation.
  */
object Analytics extends AnalyticsStatsOps with AnalyticsTimeSeriesOps
    with AnalyticsGraphOps with AnalyticsInferenceOps
    with AnalyticsSurvivalOps {

  /** Top-k rows by a column, descending, nulls last — pandas
    * `df.nlargest(k, col)` (collect_earthquakes.py:55). Ties broken by
    * `tieBreak` so results are deterministic for oracle testing.
    * Catalyst plans orderBy+limit as TakeOrderedAndProject: each
    * partition keeps a k-row heap, only k*numPartitions rows reach the
    * driver — no global sort even at 100 TB.
    */
  def topK(df: DataFrame, by: Column, k: Int, tieBreak: Column*): DataFrame =
    df.orderBy((by.desc_nulls_last +: tieBreak.map(_.asc)): _*).limit(k)

  /** Latest row per group — pandas
    * `df.loc[df.groupby(keys)[orderCol].idxmax()]`
    * (collect_economic_indicators.py:55,65; multi_source_pipeline.py:114,120).
    * pandas `idxmax` keeps the FIRST max on ties, so `row_number` (never
    * `rank`) with a deterministic tie-break replicates it. One shuffle on
    * the group keys; with AQE, skewed groups split automatically.
    */
  def latestPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderBy: Seq[Column]): DataFrame = {
    val w = Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(orderBy: _*)
    // Collision-free temp name: an input column named __rn must survive.
    val rn = Iterator.from(0).map(i => s"__rn$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(rn, row_number().over(w))
      .where(col(rn) === 1)
      .drop(rn)
  }

  /** Latest row per group as ONE aggregation — `max_by(struct(*), key)`
    * with partial (map-side) + final aggregation, no per-partition sort.
    * Same result as [[latestPerGroup]] with `maxCols.map(_.desc)` when
    * `maxCols` is a total order (include a unique id last — ties are
    * otherwise broken arbitrarily, where the window variant is
    * deterministic). Prefer this at scale: the window variant shuffles
    * AND sorts every group; this shuffles one partially-aggregated row
    * per (group, map partition).
    */
  def latestPerGroupAgg(
      df: DataFrame,
      groupCols: Seq[String],
      maxCols: Seq[Column]): DataFrame = {
    val all = struct(df.columns.toIndexedSeq.map(col): _*)
    df.groupBy(groupCols.map(col): _*)
      .agg(max_by(all, struct(maxCols: _*)).as("__row"))
      .select(col("__row.*"))
  }

  /** Frequency counts of a (possibly derived) column, descending —
    * pandas `.value_counts().head(k)` (collect_earthquakes.py:64).
    * Partial aggregation map-side, then a k-row top-k — the shuffle
    * carries one row per distinct value, not per input row.
    */
  def facetCounts(df: DataFrame, facet: Column, k: Int = 10): DataFrame =
    df.groupBy(facet.as("facet"))
      .agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("facet").asc_nulls_last)
      .limit(k)

  /** Scalar summary stats over a numeric column: mean/median/max/sum
    * (collect_earthquakes.py:71-73; validate_federal_awards.py:170-171).
    *
    * `approx = false` (default) computes the exact, sort-based median —
    * required for oracle value-equality, but the median is the one
    * non-decomposable aggregate here (it buffers the group's values).
    * At 100 TB pass `approx = true`: `approx_percentile` (t-digest
    * style sketch, mergeable map-side, bounded memory) replaces it —
    * THE recommended production mode; `accuracy` trades sketch size for
    * rank error (1/accuracy relative rank error).
    */
  def summaryStats(
      df: DataFrame, c: Column,
      approx: Boolean = false, accuracy: Int = 10000): DataFrame = {
    val med =
      if (approx) percentile_approx(c, lit(0.5), lit(accuracy))
      else median(c)
    df.agg(
      avg(c).as("mean"),
      med.cast("double").as("median"),
      max(c).as("max"),
      sum(c.cast("double")).as("sum"),
      count(c).as("count"))
  }

  /** Grouped interpolated percentiles. `approx = false` is exact
    * (`percentile`, buffers each group — oracle mode); `approx = true`
    * is the 100 TB default (`approx_percentile` sketch, decomposable
    * partial+final aggregation, bounded executor memory).
    */
  def percentiles(
      df: DataFrame, groupCols: Seq[String], c: Column,
      probs: Seq[Double], approx: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    val aggs = probs.map { p =>
      val e =
        if (approx) percentile_approx(c, lit(p), lit(accuracy))
        else percentile(c, lit(p))
      e.cast("double").as(s"p${(p * 100).round}")
    }
    df.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail :+ count(lit(1)).as("n"): _*)
  }

  /** Generic equi-join helper — the reference's only join op,
    * `pd.merge(left, right, left_on, right_on, how)`
    * (orchestrator.py:104-124). pandas keeps BOTH key columns when the
    * names differ; we replicate that. Catalyst picks broadcast vs
    * sort-merge from statistics; pass `broadcastRight = true` to force
    * a broadcast of a known-small dimension.
    */
  def mergeResults(
      left: DataFrame,
      right: DataFrame,
      leftOn: String,
      rightOn: String,
      how: String = "inner",
      broadcastRight: Boolean = false): DataFrame = {
    val r = if (broadcastRight) broadcast(right) else right
    if (leftOn == rightOn) left.join(r, Seq(leftOn), how)
    else left.join(r, left(leftOn) === r(rightOn), how)
  }

  /** Orphan keys in a fact table — referential integrity via anti-join
    * (star_schema.py:140-156). Distinct BEFORE the anti-join: the join
    * then runs on deduplicated keys (tiny), not the raw fact table.
    */
  def orphanKeys(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String): DataFrame =
    fact.select(col(factKey)).distinct()
      .join(dim.select(col(dimKey).as(factKey)).distinct(),
        Seq(factKey), "left_anti")

  /** Union of heterogeneous frames by column name, missing columns →
    * null — pandas `pd.concat(frames)` outer-column behavior
    * (open_meteo.py:88; world_bank.py:81).
    */
  def unionAll(frames: Seq[DataFrame]): DataFrame =
    frames.reduce(_.unionByName(_, allowMissingColumns = true))

  /** Equi-join with explicit key salting for pathological skew: left
    * rows scatter across `salts` sub-keys, the right side replicates
    * ×`salts`, and the join runs on (key, salt) — the hot key's rows
    * spread over `salts` tasks instead of one straggler. Results are
    * identical to the plain join (salt values never affect matching).
    *
    * AQE's skew-join handling covers most cases at runtime; this is the
    * explicit variant for engines/configs without AQE or for skew AQE
    * can't see (post-shuffle explosion). Cost: right side ×salts — use
    * only when the right side is small relative to the skew.
    *
    * `how` is restricted to left-preserving joins: right/full outer
    * would emit each UNMATCHED right row once per salt replica, so the
    * identity with the plain join would not hold.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String,
      how: String = "inner", salts: Int = 8): DataFrame = {
    require(salts >= 1)
    val allowed = Set("inner", "cross", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")
    require(allowed.contains(how.toLowerCase.replace(" ", "")),
      s"saltedJoin: how='$how' would duplicate unmatched right rows " +
        "across salt replicas; use inner/left/left_semi/left_anti")
    val saltedLeft = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt"), how).drop("__salt")
  }

  /** Two-phase aggregation with salting for skewed GROUP BY keys —
    * partial aggregation on (key, salt), final on key. Spark's
    * map-side partial aggregation usually makes this unnecessary; it
    * matters when partial aggregation is defeated (high-cardinality
    * map-side state eviction) AND one key dominates. `aggs` must be
    * decomposable (sum/count/min/max — not avg; build avg from
    * sum+count).
    */
  def saltedSum(
      df: DataFrame, keyCols: Seq[String], valueCols: Seq[String],
      salts: Int = 8): DataFrame = {
    require(salts >= 1)
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val partial = salted
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(sum(valueCols.head).as(valueCols.head),
        valueCols.tail.map(c => sum(c).as(c)): _*)
    partial.groupBy(keyCols.map(col): _*)
      .agg(sum(valueCols.head).as(s"sum_${valueCols.head}"),
        valueCols.tail.map(c => sum(c).as(s"sum_$c")): _*)
  }

  /** Per-key salt factors derived from [[skewReport]] — the bridge
    * from skew DIAGNOSIS to skew REMEDIATION: only the keys the
    * report surfaces (row share ≥ `minFraction`) get a salt factor,
    * ceil(skew_ratio) clamped to [1, maxSalts], so the hot key's
    * shuffle group splits into ~mean-sized pieces while the long tail
    * stays unsalted (and unreplicated on the other join side —
    * [[saltedJoin]] replicates the whole right side ×salts; this
    * replicates only hot-key rows). Output: (`__hotkey` string,
    * `__nsalt` int), a ≤ 1/minFraction-row frame — build it once and
    * reuse across batches of the same distribution.
    */
  def skewSalts(
      df: DataFrame, keyCol: String, minFraction: Double = 0.01,
      maxSalts: Int = 64, exactKeys: Boolean = false): DataFrame = {
    require(maxSalts >= 1)
    skewReport(df, keyCol, minFraction, exactKeys)
      .select(col("key").as("__hotkey"),
        least(lit(maxSalts),
          greatest(lit(1), ceil(col("skew_ratio")).cast("int")))
          .as("__nsalt"))
  }

  /** Salt rows by a [[skewSalts]] frame: hot-key rows get a uniform
    * salt in [0, that key's `__nsalt`); everything else salt 0. The
    * heavy-hitter comparison is on the key's STRING form (the sketch's
    * domain). Package-private so specs can assert the hot key's
    * post-salt group sizes.
    */
  private[operators] def saltBySalts(
      df: DataFrame, keyCol: String, salts: DataFrame): DataFrame =
    df.join(broadcast(salts),
        col(keyCol).cast("string") === col("__hotkey"), "left")
      .withColumn("__n", coalesce(col("__nsalt"), lit(1)))
      .withColumn("__salt",
        pmod(monotonically_increasing_id(), col("__n").cast("long"))
          .cast("int"))
      .drop("__hotkey", "__nsalt", "__n")

  /** [[saltedJoin]] driven by [[skewReport]]: salt ONLY the hot keys
    * the report surfaces, at a per-key factor from its skew_ratio —
    * the left's hot rows spread over `__nsalt` shuffle groups, the
    * right replicates hot-key rows `__nsalt`× (cold rows once), and
    * the join key becomes (key, salt). Results are identical to the
    * plain join (spec-pinned; salts never affect matching), `how` is
    * restricted to left-preserving joins for the same reason as
    * [[saltedJoin]]. Cost over the plain join: the one-time
    * [[skewSalts]] diagnosis pass + hot-row replication on the right
    * — vs [[saltedJoin]]'s whole-right ×salts. Pass a precomputed
    * `salts` frame to amortize the diagnosis across batches.
    */
  def autoSaltedJoin(
      left: DataFrame, right: DataFrame, key: String,
      how: String = "inner", salts: DataFrame): DataFrame = {
    val allowed = Set("inner", "cross", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")
    require(allowed.contains(how.toLowerCase.replace(" ", "")),
      s"autoSaltedJoin: how='$how' would duplicate unmatched right " +
        "rows across salt replicas; use inner/left/left_semi/left_anti")
    val l = saltBySalts(left, key, salts)
    val r = right.join(broadcast(salts),
        col(key).cast("string") === col("__hotkey"), "left")
      .withColumn("__n", coalesce(col("__nsalt"), lit(1)))
      .withColumn("__salt", explode(sequence(lit(0), col("__n") - 1)))
      .drop("__hotkey", "__nsalt", "__n")
    l.join(r, Seq(key, "__salt"), how).drop("__salt")
  }

  /** [[autoSaltedJoin]] with the [[skewSalts]] diagnosis run inline
    * on the left side.
    */
  def autoSaltedJoin(
      left: DataFrame, right: DataFrame, key: String,
      how: String, minFraction: Double, maxSalts: Int,
      exactKeys: Boolean): DataFrame =
    autoSaltedJoin(left, right, key, how,
      skewSalts(left, key, minFraction, maxSalts, exactKeys))

  /** [[saltedSum]] driven by [[skewReport]]: the partial aggregation
    * key is (key, salt) with salts only on the report's hot keys, so
    * a dominant key's partial state spreads over ~skew_ratio groups
    * while the tail aggregates once. Output naming matches
    * [[saltedSum]] (`sum_<col>`); results identical to a plain
    * groupBy-sum (spec-pinned).
    */
  def autoSaltedSum(
      df: DataFrame, keyCol: String, valueCols: Seq[String],
      salts: DataFrame): DataFrame = {
    val partial = saltBySalts(df, keyCol, salts)
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(valueCols.head).as(valueCols.head),
        valueCols.tail.map(c => sum(c).as(c)): _*)
    partial.groupBy(col(keyCol))
      .agg(sum(valueCols.head).as(s"sum_${valueCols.head}"),
        valueCols.tail.map(c => sum(c).as(s"sum_$c")): _*)
  }

  /** As-of join: for each left row, attach the LATEST right row whose
    * `rightTime` is ≤ (`strict=false`) or < (`strict=true`) the left
    * row's `leftTime`, within the same `key`. Left rows with no match
    * keep null asof columns (left-asof semantics). The reference has no
    * as-of operator (SURVEY.md §2.3) — this is the time-series
    * extension a financial engine needs.
    *
    * Scale design: NOT a range join (whose matched-pair blowup is
    * O(left × right-per-key)) — both sides are unioned and a single
    * window pass per key carries the last-seen right values forward
    * (`last(_, ignoreNulls)` over rows-unbounded-preceding). ONE
    * shuffle on the key, state = one row of right columns.
    *
    * Determinism: right rows tying on time resolve by the `rightCols`
    * in order — put a unique id first. All right columns are carried as
    * ONE struct through the window (a single `last(struct,
    * ignoreNulls)`), so every `asof_*` value comes from the SAME right
    * row even when some right columns are null — no cross-row
    * stitching.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      rightCols: Seq[String], prefix: String = "asof_",
      strict: Boolean = false): DataFrame = {
    require(!left.columns.exists(_.startsWith(prefix)),
      s"left side must not have columns starting with '$prefix'")
    require(!left.columns.exists(Set("__t", "__side", "__asof")),
      "left side must not have columns named __t, __side or __asof")
    // at equal times: inclusive puts right rows first (visible to the
    // left row), strict puts the left row first (same-time rights hidden)
    val leftSide = if (strict) 0 else 1
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(leftSide))
    val r = right.select(
      col(key), col(rightTime).as("__t"),
      struct(rightCols.map(col): _*).as("__asof"))
      .withColumn("__side", lit(1 - leftSide))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col("__t").asc, col("__side").asc, col("__asof").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__asof",
      last(col("__asof"), ignoreNulls = true).over(w))
    filled.where(col("__side") === leftSide)
      .select(left.columns.toIndexedSeq.map(col) ++
        rightCols.map(c => col(s"__asof.$c").as(prefix + c)): _*)
  }

  /** Range (interval) join: each point row pairs with every interval
    * row whose [lo, hi) contains the point. A naive formulation is a
    * theta-join — Spark plans it as BroadcastNestedLoopJoin or a
    * cartesian product, both O(points × intervals). This one
    * bucketizes: intervals replicate into each `bucketWidth`-wide
    * bucket they overlap, points map to exactly one bucket, and the
    * join becomes an EQUI-join on bucket id (hash-partitioned, AQE-
    * friendly) with the range predicate as a residual filter. Every
    * matching (point, interval) pair meets in exactly one bucket — the
    * point's — so no dedup pass is needed.
    *
    * Cost: interval rows replicate ×(span / bucketWidth + 1). Pick
    * `bucketWidth` near the typical interval span so replication stays
    * O(1) per interval; the shuffle then carries ~|points| +
    * ~|intervals| rows instead of the theta-join's full cross product.
    */
  def rangeJoin(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(!(points.columns ++ intervals.columns).contains("__bucket"),
      "inputs must not have a column named __bucket")
    val w = lit(bucketWidth)
    // lo > hi would make sequence() count DOWN and fabricate buckets;
    // such intervals are empty under [lo, hi) — drop them up front
    val ivals = intervals
      .where(col(loCol) < col(hiCol))
      .withColumn("__bucket", explode(sequence(
        floor(col(loCol) / w).cast("long"),
        floor(col(hiCol) / w).cast("long"))))
    val pts = points.withColumn("__bucket",
      floor(col(pointCol) / w).cast("long"))
    pts.join(ivals, Seq("__bucket"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }

  /** All deletion variants of `s` up to `maxDeletes` characters,
    * including `s` itself, deduplicated — the symmetric-delete
    * (SymSpell) signature set. Two strings within edit distance d
    * always share at least one signature at deletion depth d, so an
    * equi-join on signatures is a COMPLETE candidate generator for an
    * edit-distance join (no recall loss to verify against).
    *
    * Pure column expressions (no UDF): depth-1 via `transform` over the
    * position sequence, depth-2 as deletions of the deduped depth-1 set.
    * Signature count is O(len^maxDeletes) per string — this blocks
    * SHORT strings (names, codes, titles; `maxLen` guards the fan-out),
    * which is exactly the domain where edit distance is meaningful.
    */
  private def deleteSignatures(s: Column, maxDeletes: Int): Column = {
    def dels(c: Column): Column =
      transform(sequence(lit(1), length(c)),
        i => concat(substring(c, lit(1), i - 1),
          c.substr(i + 1, length(c))))
    val d1 = array_union(array(s), dels(s))
    if (maxDeletes == 1) d1
    else array_distinct(flatten(transform(d1, v =>
      array_union(array(v), dels(v)))))
  }

  /** Edit-distance (Levenshtein) join without a cartesian product:
    * symmetric-delete signature blocking + exact verify.
    *
    * Each side explodes into its deletion signatures (depth =
    * `maxDist`); candidates are the DISTINCT key pairs sharing a
    * signature; the exact `levenshtein(_, _, threshold)` then keeps
    * true matches (early-exit variant — cost is O(len·maxDist), not
    * O(len²), per candidate). Completeness is the symmetric-delete
    * property, so the result is IDENTICAL to the O(n·m) nested-loop
    * join it replaces.
    *
    * Scale: the cross join never exists in the plan — work is one
    * shuffle of each side's signature table (O(n·len^d) narrow rows)
    * plus the grouped distinct on candidate pairs. Equal signatures
    * imply a length gap ≤ maxDist, so length blocking is built in.
    * Signature skew (many strings sharing one deletion) fans out as
    * that signature's pair count; `maxLen` bounds per-row fan-out and
    * AQE splits skewed signature partitions.
    *
    * Returns (`leftOut`, `rightOut`, `dist`), one row per matching
    * DISTINCT value pair.
    */
  def fuzzyJoin(
      left: DataFrame, leftCol: String,
      right: DataFrame, rightCol: String,
      maxDist: Int, maxLen: Int = 64,
      leftOut: String = "left_value", rightOut: String = "right_value")
    : DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      "maxDist must be 1 or 2 (deletion-signature depth)")
    require(maxLen >= 1, s"maxLen must be positive, got $maxLen")
    def sigs(df: DataFrame, c: String, out: String) =
      df.select(col(c).cast("string").as(out))
        .where(col(out).isNotNull && length(col(out)) <= maxLen)
        .distinct()
        .select(col(out),
          explode(deleteSignatures(col(out), maxDist)).as("__sig"))
    val cands = sigs(left, leftCol, leftOut)
      .join(sigs(right, rightCol, rightOut), Seq("__sig"))
      .select(leftOut, rightOut)
      .distinct()
    cands
      .withColumn("dist",
        levenshtein(col(leftOut), col(rightOut), maxDist))
      .where(col("dist") >= 0)
  }

  /** Self fuzzy join: distinct value pairs of `valueCol` within edit
    * distance `maxDist`, each unordered pair once (`value_a` <
    * `value_b`). The blocking/verify machinery of [[fuzzyJoin]].
    */
  def fuzzySelfJoin(
      df: DataFrame, valueCol: String, maxDist: Int,
      maxLen: Int = 64): DataFrame =
    fuzzyJoin(df, valueCol, df, valueCol, maxDist, maxLen,
        leftOut = "value_a", rightOut = "value_b")
      .where(col("value_a") < col("value_b"))

  /** EXACT heavy hitters — every value occurring in strictly more than
    * `minFraction` of the rows, with its exact count — in two bounded
    * passes, never a full `groupBy(value).count()`:
    *
    *   1. one aggregate pass computes N and a Misra–Gries sketch
    *      ([[graft.expressions.MisraGriesSketch]]) sized
    *      k = ⌈1/minFraction⌉, whose retention bound guarantees every
    *      value with count > N/(k+1) ≤ minFraction·N is among its ≤ k
    *      candidates (shuffle payload: ≤ k counters per partition,
    *      constant in distinct-value count);
    *   2. an exact count over ONLY candidate-matching rows (map-side
    *      partial aggregation collapses to ≤ k groups before the
    *      shuffle) keeps the true qualifiers.
    *
    * The ≤ k candidate values pass through the driver as literals —
    * bounded by construction, like the Bloom filter bytes in
    * `dedupAgainstBloom`. Both engines compare `cnt > minFraction · N`
    * in double precision (the oracle uses the same multiply form, so
    * boundary rounding is identical).
    *
    * Returns (`value`, `cnt`, `fraction`), exact, no approximation.
    */
  def heavyHitters(
      df: DataFrame, valueCol: String,
      minFraction: Double): DataFrame = {
    require(minFraction > 0 && minFraction < 1,
      s"minFraction must be in (0, 1), got $minFraction")
    val k = math.ceil(1.0 / minFraction).toInt
    val vals = df.select(col(valueCol).cast("string").as("value"))
    val probe = vals.agg(
      count(col("value")).as("n"),
      graft.expressions.MisraGriesSketch.sketch(k)(col("value"))
        .as("cands")).head()
    val n = probe.getLong(0)
    val cands = probe.getSeq[String](1)
    val base =
      if (cands.isEmpty) vals.where(lit(false))
      else vals.where(col("value").isin(cands: _*))
    base.groupBy("value")
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt").cast("double") > lit(minFraction) * lit(n.toDouble))
      .withColumn("fraction",
        round(col("cnt").cast("double") / lit(math.max(n, 1L).toDouble), 6))
  }

  /** Single-pass numeric profile — the "describe this table" report:
    * one row PER COLUMN with row/null/distinct counts, min/max, mean
    * and sample stddev, computed in ONE scan (every statistic for
    * every column lives in the same aggregation; the per-column rows
    * come from exploding the one result row, never from re-scanning).
    * Exact distinct counts expand the aggregate per column (Spark's
    * multi-count-distinct Expand) — at warehouse scale flip
    * `exactDistinct = false` for one-pass HLL sketches instead.
    *
    * Distinct counts and min/max SELECTION run on the ORIGINAL column
    * values — a double cast first would silently collide >53-bit
    * longs/decimals (fewer distincts, wrong extreme picked). Only the
    * report RENDERING of min/max casts to double (the one-row-per-
    * column report needs a uniform type); a >2^53 extreme may round
    * in display, but it is the true extreme.
    */
  def numericProfile(
      df: DataFrame, cols: Seq[String],
      exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "at least one column to profile")
    def dist(c: Column) =
      if (exactDistinct) count_distinct(c) else approx_count_distinct(c)
    val aggs = cols.flatMap { c =>
      val v = col(c).cast("double")
      Seq(
        count(lit(1)).as(s"__n_$c"),
        (count(lit(1)) - count(v)).as(s"__nulls_$c"),
        dist(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"),
        round(avg(v), 6).as(s"__mean_$c"),
        round(stddev_samp(v), 6).as(s"__sd_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map(c => struct(
      lit(c).as("column_name"),
      col(s"__n_$c").as("n_rows"),
      col(s"__nulls_$c").as("n_nulls"),
      col(s"__dist_$c").as("n_distinct"),
      col(s"__min_$c").as("min"),
      col(s"__max_$c").as("max"),
      col(s"__mean_$c").as("mean"),
      col(s"__sd_$c").as("stddev")))
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** CDC change-feed application: materialize the current state of a
    * snapshot after a stream of keyed I/U/D operations — the batch
    * `MERGE INTO` twin that completes the SCD family (SCD-1 keeps
    * latest, SCD-2 keeps history, this applies explicit deletes).
    *
    * Per key, the LATEST event by (`orderCol`, op precedence on exact
    * ties — deletes win, making same-instant delete+upsert
    * deterministic) decides: upsert rows (op `I`/`U`) carry the new
    * image, a delete (`D`) removes the key. Snapshot rows act as
    * op-`I` observations at `baseOrd` (strictly before every change).
    * One `max_by` aggregation on the key — partial+final, no window
    * sort, no join.
    *
    * Ops outside {I, U, D} (including null) fail fast with
    * `raise_error`: a null winning op would otherwise silently DELETE
    * the key (the `=!= "D"` filter drops null comparisons) and an
    * unrecognized op string would silently upsert — both corrupt the
    * snapshot without a trace.
    */
  def applyChanges(
      snapshot: DataFrame, changes: DataFrame,
      keyCols: Seq[String], opCol: String, orderCol: String,
      baseOrd: Column): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val dataCols = snapshot.columns.filterNot(keyCols.contains)
    val base = snapshot.select(
      keyCols.map(col) ++ dataCols.map(col)
        :+ lit("I").as("__op") :+ baseOrd.as("__ord"): _*)
    val validOp = when(col(opCol).isin("I", "U", "D"), col(opCol))
      .otherwise(raise_error(concat(
        lit("applyChanges: op must be one of I, U, D — got "),
        coalesce(col(opCol), lit("null")))))
    val feed = changes.select(
      keyCols.map(col) ++ dataCols.map(col)
        :+ validOp.as("__op") :+ col(orderCol).as("__ord"): _*)
    val all = base.unionByName(feed)
    val payload = struct(
      (dataCols.map(col) :+ col("__op")).toIndexedSeq: _*)
    // ties on __ord: D (1) outranks I/U (0) — the struct ordering's
    // second field
    val rank = struct(col("__ord"),
      when(col("__op") === "D", lit(1)).otherwise(lit(0)).as("__d"))
    all.groupBy(keyCols.map(col): _*)
      .agg(max_by(payload, rank).as("__row"))
      .where(col("__row.__op") =!= "D")
      .select(keyCols.map(col) ++
        dataCols.map(c => col(s"__row.$c").as(c)): _*)
  }

  /** Time-weighted average of `valueCol` per entity: each observation
    * holds until the entity's NEXT observation, so the average weights
    * each value by how long it was current (sensor/price series
    * semantics), not by how often it was sampled. The last observation
    * carries no weight (nothing follows it); entities whose
    * observations all share one instant have zero span and are
    * excluded (a 0/0 average is noise, not data).
    *
    * Weights are exact inter-event MICROSECOND longs (`unix_micros`) —
    * no float time arithmetic; ties on the timestamp order by
    * `tieBreak` so which same-instant observation absorbs the
    * following interval is deterministic (the zero-length one
    * contributes nothing either way). One window + one aggregation,
    * both on the entity key: single exchange.
    *
    * The value×gap products accumulate in DOUBLE: an integer value
    * times a microsecond gap overflows Long silently with ANSI off
    * (a day is ~8.6e10 µs — a value of ~1e8 already wraps), and the
    * quotient is a double anyway.
    */
  def timeWeightedAvg(
      df: DataFrame, entityCol: String, tsCol: String,
      valueCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val reserved = Set("__t", "__next")
    require(!df.columns.exists(reserved),
      s"input must not have columns named ${reserved.mkString(", ")}")
    val w = Window.partitionBy(col(entityCol))
      .orderBy((col("__t").asc +: tieBreak.map(col(_).asc)): _*)
    df.select(
        (Seq(col(entityCol), unix_micros(col(tsCol)).as("__t"),
          col(valueCol)) ++ tieBreak.map(col)): _*)
      .withColumn("__next", lead(col("__t"), 1).over(w))
      .where(col("__next").isNotNull)
      .groupBy(col(entityCol))
      .agg(
        count(lit(1)).as("n_intervals"),
        (sum(col(valueCol).cast("double") *
            (col("__next") - col("__t")).cast("double")) /
          sum((col("__next") - col("__t")).cast("double"))).as("twa"),
        sum(col("__next") - col("__t")).as("__span"))
      .where(col("__span") > 0)
      .drop("__span")
  }

  /** Snapshot reconciliation: classify every key as `added` (right
    * only), `removed` (left only), `changed` (both sides, differing
    * row content) or `unchanged` — the table-diff that validates an
    * incremental load against its source.
    *
    * Row content is compared as an md5 over a column-ORDER-pinned,
    * PREFIX-FREE rendering of `compareCols`: null renders as `"n"`, a
    * value as `"v" + length + ":" + value`. Null can never collide
    * with any value's rendering (the surrogate-key `"None"` sentinel
    * would call a literal `"None"` string unchanged against null),
    * and the length prefix makes the concatenation injective — a
    * value containing the join delimiter cannot shift bytes into a
    * neighboring column's rendering. The join then
    * carries (key, 32-char digest) per side, never the wide row: at
    * snapshot scale the shuffle payload is keys + digests regardless
    * of row width. One full outer join on the key. Caller
    * contract: the key is unique per side (snapshot semantics) — a
    * repeated key diffs row-per-row like any join fan-out would.
    *
    * Returns (key columns…, `status`).
    */
  def tableDiff(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    require(compareCols.nonEmpty, "at least one compare column")
    def digested(df: DataFrame, as: String) = df.select(
      keyCols.map(col) :+
        md5(concat_ws("|", compareCols.map { c =>
          val s = col(c).cast("string")
          coalesce(
            concat(lit("v"), length(s).cast("string"), lit(":"), s),
            lit("n"))
        }: _*)).as(as): _*)
    val l = digested(left, "__hl")
    val r0 = digested(right, "__hr")
    val r = keyCols.foldLeft(r0)((d, c) =>
      d.withColumnRenamed(c, s"__rk_$c"))
    val cond = keyCols.map(c => col(c) <=> col(s"__rk_$c")).reduce(_ && _)
    l.join(r, cond, "full_outer")
      .select(
        keyCols.map(c => coalesce(col(c), col(s"__rk_$c")).as(c)) :+
          when(col("__hl").isNull, lit("added"))
            .when(col("__hr").isNull, lit("removed"))
            .when(col("__hl") === col("__hr"), lit("unchanged"))
            .otherwise(lit("changed")).as("status"): _*)
  }

  /** Ordered-funnel analysis: for each entity, the timestamp at which
    * it reached each step of `steps` IN ORDER — step k counts only at
    * an event STRICTLY after the entity's step-(k−1) time. The
    * classic product-analytics "view → click → purchase" funnel as
    * one declarative plan.
    *
    * Construction: one window partitioned by the entity and ordered by
    * (ts, tie), advanced once per step —
    * `reach_k = min(ts where type = step_k AND reach_(k−1) < ts)` with
    * the inner `reach_(k−1)` read as a running min up to the CURRENT
    * row (rows unbounded-preceding..current), so an event can never
    * satisfy a step using evidence from its own future. All step
    * windows share the entity partitioning and ordering: ONE exchange
    * and ONE sort serve every step (exchange/sort reuse, same shape as
    * scd2Versions). Per-entity work is linear in its event count —
    * no self-join per step, no collect_list of unbounded event arrays.
    *
    * Returns one row per entity: (`entity`, `step_1_ts` …
    * `step_n_ts`), null from the first unreached step on (reach times
    * are monotone by construction).
    */
  def funnel(
      df: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "at least one funnel step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got $steps")
    val reserved = steps.indices.map(i => s"__r$i").toSet
    require(!df.columns.exists(reserved),
      s"input must not have columns named ${reserved.mkString(", ")}")
    val wRun = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol).asc, col(typeCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // fold steps: each adds a running-min reach column gated on the
    // previous step's running reach at the SAME row
    val withReach = steps.zipWithIndex.foldLeft(df) {
      case (d, (step, i)) =>
        val qualifies =
          if (i == 0) col(typeCol) === lit(step)
          else col(typeCol) === lit(step) &&
            col(s"__r${i - 1}") < col(tsCol)
        d.withColumn(s"__r$i",
          min(when(qualifies, col(tsCol))).over(wRun))
    }
    val reachAggs = steps.indices.map(i =>
      min(col(s"__r$i")).as(s"${steps(i)}_ts"))
    withReach
      .groupBy(col(entityCol).as("entity"))
      .agg(reachAggs.head, reachAggs.tail: _*)
  }

  /** Funnel conversion report: how many entities reached each step (in
    * order). One row per step with its reach count and conversion from
    * step 1.
    */
  def funnelCounts(
      df: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    val f = funnel(df, entityCol, tsCol, typeCol, steps)
    val stepAggs = steps.map(s => count(col(s"${s}_ts")).as(s"__c_$s"))
    val counts = f.agg(stepAggs.head, stepAggs.tail: _*)
    val stepRows = steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).as("step_n"), lit(s).as("step"),
        col(s"__c_$s").as("reached"))
    }
    counts
      .select(explode(array(stepRows: _*)).as("r"), col(s"__c_${steps.head}"))
      .select(
        col("r.step_n"), col("r.step"), col("r.reached"),
        round(col("r.reached").cast("double") /
          nullif(col(s"__c_${steps.head}").cast("double"), lit(0.0)), 6)
          .as("conversion"))
  }

  /** Order-preserving Morton (Z-order) key over two int dimensions —
    * the codegen'd `graft_zorder` expression
    * ([[graft.expressions.ZOrderKey]]).
    */
  def zorderKey(a: Column, b: Column): Column =
    call_function("graft_zorder", a.cast("int"), b.cast("int"))

  /** Z-order data layout: range-partition by the Morton key of
    * (`aCol`, `bCol`) and sort within partitions, so every output file
    * holds a compact Z-curve segment — BOTH dimensions are locally
    * correlated in every file, and parquet min/max zone maps prune
    * selective predicates on EITHER column. A lexicographic
    * (`a`, `b`) sort clusters only `a`; this is the layout job behind
    * lakehouse `OPTIMIZE ZORDER BY`, here one range exchange (sampled
    * bounds, AQE-sized) plus a local sort, no extra pass.
    */
  def clusterByZOrder(
      df: DataFrame, aCol: String, bCol: String,
      numPartitions: Int): DataFrame = {
    require(numPartitions >= 1, "numPartitions must be positive")
    require(!df.columns.contains("__zkey"),
      "input must not have a column named __zkey")
    df.withColumn("__zkey", zorderKey(col(aCol), col(bCol)))
      .repartitionByRange(numPartitions, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
  }

  /** Shuffle-key skew diagnostics — the report to run BEFORE keying a
    * 100 TB join or aggregation on a column: every key holding more
    * than `minFraction` of the rows (exact two-phase Misra-Gries via
    * [[heavyHitters]] — a bounded sketch finds candidates, the exact
    * count touches only candidate-matching rows; the full
    * distinct-key aggregation never runs), with its row count, share,
    * and `skew_ratio` — count ÷ mean-rows-per-key, i.e. the
    * task-imbalance multiplier a hash exchange on this key suffers.
    * A ratio in the hundreds says salt the key ([[saltedJoin]] /
    * [[saltedSum]]) or broadcast the other side.
    *
    * Key cardinality defaults to the HLL sketch (bounded state);
    * `exactKeys = true` for moderate key spaces and oracle checks.
    * Null keys are excluded — they don't participate in equi-joins.
    */
  def skewReport(
      df: DataFrame, keyCol: String, minFraction: Double = 0.01,
      exactKeys: Boolean = false): DataFrame = {
    val keys =
      if (exactKeys) count_distinct(col(keyCol))
      else approx_count_distinct(col(keyCol))
    val ctx = df.agg(count(col(keyCol)).as("n_rows"),
      keys.as("n_keys"))
    heavyHitters(df, keyCol, minFraction)
      .crossJoin(ctx)
      .select(col("value").as("key"), col("cnt").as("n_rows_key"),
        col("fraction"), col("n_rows"), col("n_keys"),
        round(col("cnt").cast("double") * col("n_keys") / col("n_rows"),
          4).as("skew_ratio"))
  }

  /** Join-size forecast — the OTHER pre-flight to run before submitting
    * a 100 TB equi-join (the [[skewReport]] sibling): the exact output
    * cardinality of `left ⋈ right` on the key, decomposed by its top
    * contributing keys. For an inner equi-join the output is EXACTLY
    * `Σ_k cl(k)·cr(k)` over matched keys — two grouped counts and one
    * narrow join on distinct keys buy the number the optimizer only
    * estimates, at a cost dwarfed by the join itself (the per-key
    * frames carry two longs per distinct key, not the payload rows).
    * A `share_micro` concentrated on one key says salt it
    * ([[saltedJoin]]); a `total_out_rows` far above both input sizes
    * says the join fans out and downstream sizing must plan for the
    * PRODUCT, not the inputs.
    *
    * Returns the `topN` keys by output contribution (ties broken on
    * the key, so the cut is deterministic): `key, n_left, n_right,
    * out_rows, total_out_rows, n_matched_keys, share_micro` — the
    * totals ride every row via a one-row broadcast, the registry's
    * scalar-frame idiom. Counts and products are exact BIGINT; shares
    * are exact integer micro-units (floor), computed through
    * DECIMAL(38,0) so a hot key whose product exceeds ~9.2e12 (a few
    * million rows on each side of one key — exactly the salting
    * scenario this pre-flight targets) cannot wrap the `×1e6`
    * numerator negative (`div` on decimals is Spark's IntegralDivide,
    * which returns BIGINT, so the output schema is unchanged).
    * Remaining headroom contract, [[labelNoiseScreen]]-style: the
    * per-key product itself and the grand total stay BIGINT, exact up
    * to 2^63−1 ≈ 9.2e18 output rows — beyond that the join doesn't
    * need a forecast, it needs a redesign. Null keys are excluded —
    * they never match an equi-join.
    */
  def joinSizeForecast(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, topN: Int = 10): DataFrame = {
    require(topN >= 1, "topN must be positive")
    val l = left.where(col(leftKey).isNotNull)
      .groupBy(col(leftKey).as("key"))
      .agg(count(lit(1)).as("n_left"))
    val r = right.where(col(rightKey).isNotNull)
      .groupBy(col(rightKey).as("key"))
      .agg(count(lit(1)).as("n_right"))
    val j = l.join(r, Seq("key"))
      .withColumn("out_rows", col("n_left") * col("n_right"))
    val totals = j.agg(
      sum(col("out_rows")).cast("long").as("total_out_rows"),
      count(lit(1)).as("n_matched_keys"))
    j.crossJoin(broadcast(totals))
      .withColumn("share_micro",
        expr("cast(out_rows as decimal(38,0)) * 1000000" +
          " div total_out_rows"))
      .orderBy(col("out_rows").desc, col("key"))
      .limit(topN)
  }

  /** Winsorization (percentile clipping) — the outlier-robust feature
    * transform a training pipeline applies before normalizing a
    * numeric signal: clamp `valueCol` into its [pLo, pHi] quantile
    * range, globally or per group. Appends `<valueCol>_w` (double);
    * null values pass through as null (a missing value is not an
    * outlier — and `greatest(null, lo)` would silently turn nulls
    * into the floor).
    *
    * Cutoffs default to bounded-state `percentile_approx` (GK sketch
    * — aggregation state independent of group size, the
    * [[graft.text.QualityModel.adaptiveQualityFloor]] treatment);
    * `exact = true` swaps in the interpolated percentile for
    * cross-engine oracle checks. One aggregation on the group key;
    * the narrow cutoff table joins back null-safely with no broadcast
    * hint (group cardinality is data-dependent — AQE decides).
    */
  def winsorize(
      df: DataFrame, valueCol: String,
      pLo: Double = 0.01, pHi: Double = 0.99,
      groupCols: Seq[String] = Nil, exact: Boolean = false,
      approxAccuracy: Int = 10000): DataFrame = {
    require(pLo > 0 && pHi < 1 && pLo < pHi,
      s"need 0 < pLo < pHi < 1, got ($pLo, $pHi)")
    val outCol = valueCol + "_w"
    val reserved = Set(outCol, "__wlo", "__whi") ++
      groupCols.map("__g_" + _)
    require(!df.columns.exists(reserved),
      s"input must not have columns named ${reserved.mkString(", ")}")
    val v = col(valueCol)
    def cut(p: Double) =
      (if (exact) percentile(v, lit(p))
       else percentile_approx(v, lit(p), lit(approxAccuracy)))
        .cast("double")
    val clamped = when(v.isNull, lit(null).cast("double"))
      .otherwise(least(greatest(v.cast("double"), col("__wlo")),
        col("__whi")))
    if (groupCols.isEmpty) {
      val cuts = df.agg(cut(pLo).as("__wlo"), cut(pHi).as("__whi"))
      df.crossJoin(cuts)
        .withColumn(outCol, clamped)
        .drop("__wlo", "__whi")
    } else {
      val cuts = groupCols.foldLeft(
          df.groupBy(groupCols.map(col): _*)
            .agg(cut(pLo).as("__wlo"), cut(pHi).as("__whi"))) {
        (d, c) => d.withColumnRenamed(c, "__g_" + c)
      }
      val cond = groupCols.map(c => col(c) <=> col("__g_" + c))
        .reduce(_ && _)
      df.join(cuts, cond)
        .withColumn(outCol, clamped)
        .drop((Seq("__wlo", "__whi") ++ groupCols.map("__g_" + _)): _*)
    }
  }

  /** Range-partitioned two-pass per-group rank — `row_number() over
    * (partition by group order by …)` semantics without the window
    * form's fatal shape: a plain rank window sends each group's ENTIRE
    * row set through one sort task, so ranking a corpus partitioned by
    * a 5-value segment column runs 5 tasks no matter the cluster size.
    *
    * Two passes instead: (1) `repartitionByRange` on (group, order)
    * spreads every group across MANY partitions, each holding a
    * contiguous slice of the group's sort order (sampled bounds —
    * dominant groups split by the order key); a tiny per-(group,
    * partition) count table turns into per-group prefix offsets (one
    * narrow row per slice through the offset window, never the data).
    * (2) Ranks are the partition-LOCAL row numbers — a window keyed by
    * (group, slice id), so its exchange is balanced by construction —
    * plus the slice's offset (null-safe join; AQE broadcasts the
    * offsets when small). Every exchange carries either balanced
    * slices or the narrow count table; no task is group-sized.
    *
    * `orderBy` must be a TOTAL order (add a unique tie-break column,
    * as the window form also needs for determinism): ties at a range
    * boundary could otherwise rank in either slice.
    *
    * Returns `df` plus `rankCol` (1-based, long).
    */
  def rankByRange(
      df: DataFrame, groupCols: Seq[String], orderBy: Seq[Column],
      rankCol: String, numPartitions: Int = 0): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    val reserved = Set("__pid", "__cnt", "__off", "__lrn", rankCol) ++
      groupCols.map("__g_" + _)
    require(!df.columns.exists(reserved),
      s"input must not have columns named ${reserved.mkString(", ")}")
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val gcols = groupCols.map(col)
    // MATERIALIZE the pid tagging: it feeds BOTH plan legs below
    // (local ranks + per-partition offsets), and spark_partition_id is
    // genuinely nondeterministic — repartitionByRange samples its
    // boundaries with a per-instantiation seed, so if the optimizer
    // does NOT reuse the exchange (it usually does; deep composed
    // inputs — q180's ntile foldLeft — can defeat it), the two legs
    // would re-execute the exchange with DIFFERENT boundaries and the
    // offsets would disagree with the local ranks. The persist pins
    // one pid assignment for both consumers — the
    // checkpoint-before-reuse rule, applied where the reused frame is
    // nondeterministic rather than merely expensive.
    val tagged = graft.core.CacheScope.disk(df
      .repartitionByRange(parts, (gcols ++ orderBy): _*)
      .withColumn("__pid", spark_partition_id()))
    val offW = Window.partitionBy(groupCols.map(c => col("__g_" + c)): _*)
      .orderBy(col("__pid").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = groupCols.foldLeft(
        tagged.groupBy((gcols :+ col("__pid")): _*)
          .agg(count(lit(1)).as("__cnt"))) {
        (d, c) => d.withColumnRenamed(c, "__g_" + c)
      }
      .withColumn("__off", coalesce(sum(col("__cnt")).over(offW), lit(0L)))
      .drop("__cnt")
    val joinCond = groupCols.map(c => col(c) <=> col("__g_" + c))
      .reduce(_ && _) && tagged("__pid") === offsets("__pid")
    val localW = Window.partitionBy((gcols :+ tagged("__pid")): _*)
      .orderBy(orderBy: _*)
    tagged
      .withColumn("__lrn", row_number().over(localW).cast("long"))
      .join(offsets, joinCond)
      .withColumn(rankCol, col("__off") + col("__lrn"))
      .select((df.columns.map(col) :+ col(rankCol)).toIndexedSeq: _*)
  }

  /** `ntile(k)` per group on [[rankByRange]] ranks — Spark's exact
    * bucket arithmetic (the first n mod k buckets take one extra row)
    * computed from the rank and the group size, so decile/quantile
    * bucketing inherits the two-pass scale shape instead of the
    * single-task-per-group window sort. Same total-order requirement.
    *
    * Returns `df` plus `bucketCol` (1-based, int).
    */
  def ntileByRange(
      df: DataFrame, groupCols: Seq[String], orderBy: Seq[Column],
      k: Int, bucketCol: String, numPartitions: Int = 0): DataFrame = {
    require(k >= 1, "k must be positive")
    val reserved = Set("__rrn", "__n", bucketCol) ++
      groupCols.map("__t_" + _)
    require(!df.columns.exists(reserved),
      s"input must not have columns named ${reserved.mkString(", ")}")
    val ranked = rankByRange(df, groupCols, orderBy, "__rrn",
      numPartitions)
    val totals = groupCols.foldLeft(
        df.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as("__n"))) {
      (d, c) => d.withColumnRenamed(c, "__t_" + c)
    }
    val joinCond = groupCols.map(c => col(c) <=> col("__t_" + c))
      .reduce(_ && _)
    // Spark ntile: base = n/k rows per bucket, the first n%k buckets
    // hold one extra (ranks ≤ cut); integer arithmetic in long
    val base = (col("__n") / k).cast("long")
    val extra = col("__n") % k
    val cut = extra * (base + 1)
    val bucket = when(col("__rrn") <= cut,
        ((col("__rrn") - 1) / (base + 1)).cast("long") + 1)
      .otherwise(extra +
        ((col("__rrn") - cut - 1) / base).cast("long") + 1)
    ranked.join(totals, joinCond)
      .withColumn(bucketCol, bucket.cast("int"))
      .select((df.columns.map(col) :+ col(bucketCol)).toIndexedSeq: _*)
  }

  /** Adaptive `ntile(k)` per group — the [[graft.dedup
    * .ConnectedComponents]] `componentsAuto` treatment applied to
    * bucketing: ONE cheap probe (max group size over the grouped
    * counts — group-domain-sized, map-side combined) picks the path.
    * Groups at or under `smallGroupLimit` rows sort in a plain
    * per-group `ntile` window (one task per group is FINE when the
    * group fits a task — the two-pass machinery's three exchanges and
    * two persists are pure overhead there, measured ~1s per measure
    * on q180's 15k-customer frame); anything larger takes
    * [[ntileByRange]]'s two-pass range form, whose no-single-task
    * shape is what survives a 100× group. Both paths produce Spark's
    * exact ntile bucket arithmetic, so the choice is invisible to
    * results (and to the oracle).
    *
    * The probe is an ACTION — callers should persist `df` first when
    * it is expensive (the q180 registry query does).
    */
  def ntileByRangeAdaptive(
      df: DataFrame, groupCols: Seq[String], orderBy: Seq[Column],
      k: Int, bucketCol: String,
      smallGroupLimit: Long = 4000000L,
      numPartitions: Int = 0): DataFrame = {
    require(k >= 1, "k must be positive")
    val maxGroup = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(max(col("__n"))).head()
    val biggest = if (maxGroup.isNullAt(0)) 0L else maxGroup.getLong(0)
    if (biggest <= smallGroupLimit) {
      val w = Window.partitionBy(groupCols.map(col): _*)
        .orderBy(orderBy: _*)
      df.withColumn(bucketCol, ntile(k).over(w))
    } else {
      ntileByRange(df, groupCols, orderBy, k, bucketCol, numPartitions)
    }
  }

  /** Resample an irregular per-entity time series onto a fixed grid
    * with forward fill — the gap-filling operator every downstream
    * window/trend computation assumes (pandas `resample().mean()
    * .ffill()`, SQL `time_bucket` + `LOCF`). Per key: buckets of
    * `stepSec` seconds from the key's first to last observation,
    * `value` = mean of the bucket's observations, empty buckets
    * carry the last seen mean forward (`filled` marks them). Grid
    * edges are the key's OWN min/max bucket — no global scan, no
    * leading nulls to special-case.
    *
    * Scale shape: one (key) aggregation builds buckets, one
    * per-key min/max + `sequence` explode builds the grid — the
    * explode fans out to grid rows, never per-event rows — and the
    * forward fill is ONE window on (key, bucket) whose frame scans
    * only backwards. Everything shuffles on the key exactly once
    * (AQE coalesces the co-partitioned joins). Grid size per key is
    * span/step — size `stepSec` to the span (a year of hourly buckets
    * is 8.8k rows/key), not to the event rate.
    */
  def resampleFfill(
      df: DataFrame, keyCol: String, tsCol: String, valCol: String,
      stepSec: Long): DataFrame = {
    require(stepSec > 0, "stepSec must be positive")
    val stepUs = stepSec * 1000000L
    val bucket = timestamp_micros(
      floor(unix_micros(col(tsCol)) / stepUs).cast("long") * stepUs)
    val buckets = df
      .where(col(tsCol).isNotNull)
      .groupBy(col(keyCol), bucket.as("bucket_ts"))
      .agg(avg(col(valCol)).as("__v"))
    val grid = buckets
      .groupBy(keyCol)
      .agg(min("bucket_ts").as("__lo"), max("bucket_ts").as("__hi"))
      .select(col(keyCol), explode(sequence(col("__lo"), col("__hi"),
        expr(s"INTERVAL $stepSec SECONDS"))).as("bucket_ts"))
    val w = Window.partitionBy(keyCol).orderBy("bucket_ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(buckets, Seq(keyCol, "bucket_ts"), "left")
      .select(col(keyCol), col("bucket_ts"),
        last(col("__v"), ignoreNulls = true).over(w).as("value"),
        col("__v").isNull.as("filled"))
  }

  /** [[resampleFfill]] with LINEAR interpolation instead of LOCF:
    * empty buckets take v0 + (v1 − v0)·(t − t0)/(t1 − t0) between the
    * surrounding observed buckets — the gap-fill mode for continuous
    * signals (sensor readings, prices) where carrying the last value
    * flat biases trends. Grid edges are observed buckets by
    * construction, so every gap is interior (both neighbors exist);
    * the guards still fall back to one-sided fill if a caller feeds a
    * grid with open ends. Same scale shape as [[resampleFfill]]: one
    * key shuffle, TWO frames (backwards + forwards) over ONE window
    * sort.
    */
  def resampleInterp(
      df: DataFrame, keyCol: String, tsCol: String, valCol: String,
      stepSec: Long): DataFrame = {
    require(stepSec > 0, "stepSec must be positive")
    val stepUs = stepSec * 1000000L
    val bucket = timestamp_micros(
      floor(unix_micros(col(tsCol)) / stepUs).cast("long") * stepUs)
    val buckets = df
      .where(col(tsCol).isNotNull)
      .groupBy(col(keyCol), bucket.as("bucket_ts"))
      .agg(avg(col(valCol)).as("__v"))
    val grid = buckets
      .groupBy(keyCol)
      .agg(min("bucket_ts").as("__lo"), max("bucket_ts").as("__hi"))
      .select(col(keyCol), explode(sequence(col("__lo"), col("__hi"),
        expr(s"INTERVAL $stepSec SECONDS"))).as("bucket_ts"))
    val back = Window.partitionBy(keyCol).orderBy("bucket_ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(keyCol).orderBy("bucket_ts")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val tUs = unix_micros(col("bucket_ts"))
    val obsT = when(col("__v").isNotNull, tUs)
    grid.join(buckets, Seq(keyCol, "bucket_ts"), "left")
      .withColumn("__v0", last(col("__v"), ignoreNulls = true).over(back))
      .withColumn("__t0", last(obsT, ignoreNulls = true).over(back))
      .withColumn("__v1", first(col("__v"), ignoreNulls = true).over(fwd))
      .withColumn("__t1", first(obsT, ignoreNulls = true).over(fwd))
      .select(col(keyCol), col("bucket_ts"),
        when(col("__v").isNotNull, col("__v"))
          .when(col("__t1").isNull, col("__v0"))
          .when(col("__t0").isNull, col("__v1"))
          .otherwise(col("__v0") + (col("__v1") - col("__v0")) *
            ((tUs - col("__t0")) / (col("__t1") - col("__t0"))))
          .as("value"),
        col("__v").isNull.as("interpolated"))
  }

  /** Entity resolution (record linkage) over a (id, name) frame — the
    * composed pipeline: SymSpell-blocked edit-distance candidate pairs
    * ([[fuzzySelfJoin]], complete for distance ≤ 2 — never all-pairs),
    * connected components over the matched NAMES
    * ([[graft.dedup.ConnectedComponents]] min-label propagation —
    * string labels propagate fine, the canonical name is the
    * lexicographic minimum of the cluster), then survivorship: every
    * record gets its cluster's `entity_name` (min matched name) and
    * `entity_key` (min id among the cluster's records). Unmatched
    * names are their own entity. Transitivity is the point — "widget
    * co" ~ "widget-co" ~ "widgetco" chain into ONE entity even where
    * the endpoints exceed the pairwise distance.
    *
    * Scale shape: matching runs over DISTINCT names (values, not
    * rows), so a 10^11-row fact table with 10^6 distinct names does
    * its fuzzy work on 10^6 signatures; the CC edge list is
    * match-sized; records rejoin by name (one shuffle) and
    * survivorship is one (entity) aggregation.
    */
  def resolveEntities(
      df: DataFrame, idCol: String, nameCol: String,
      maxDist: Int = 2, maxLen: Int = 64): DataFrame = {
    val pairs = fuzzySelfJoin(df.select(nameCol), nameCol,
        maxDist, maxLen)
      .select("value_a", "value_b")
    val labels = graft.dedup.ConnectedComponents
      .components(pairs, "value_a", "value_b")
    val named = df.join(
        labels.select(col("id").as(nameCol),
          col("component").as("__root")),
        Seq(nameCol), "left")
      .withColumn("entity_name", coalesce(col("__root"), col(nameCol)))
    val keys = named.groupBy("entity_name")
      .agg(min(col(idCol)).as("entity_key"))
    named.join(keys, Seq("entity_name"))
      .select(col(idCol), col(nameCol),
        col("entity_key"), col("entity_name"))
  }

  /** Rolling time-window statistics + z-score anomaly flags over a
    * per-key event stream — the monitoring primitive (rolling mean /
    * std / z of each observation against its own trailing window).
    * The frame is a RANGE frame on event time: every row is scored
    * against the key's observations in `[t − windowSec, t)`, robust
    * to irregular event spacing (a ROWS frame would mean "last k
    * events" — a different, rate-dependent semantics).
    *
    * Exactness: callers pass an INTEGER-scaled value column (cents,
    * micro-units). All window aggregates are then exact long sums
    * (`n`, `Σv`, `Σv²`), and every derived statistic is a fixed
    * op-sequence over those exact integers — mean `Σv/n`, population
    * variance `(n·Σv² − (Σv)²)/n²`, z `((v·n − Σv)/n)/std` — one
    * double division/sqrt each, bit-reproducible across engines (the
    * naive rolling mean-of-doubles depends on summation order and
    * cannot be oracle-hashed). Long headroom: |v| ≤ 3M units and
    * ≤ 100k rows per frame keep `n·Σv²` under 2⁶³.
    *
    * By default the frame EXCLUDES the current row (and its exact-ts
    * peers): the baseline is `[t − windowSec, t)`, so a spike is
    * scored against the history it arrived into. A self-inclusive
    * frame caps |z| at √(n−1) — an n=4 frame can never clear 3σ no
    * matter how large the spike — which is why monitoring systems
    * score against the trailing window, not the containing one.
    * `includeCurrent = true` restores the pandas
    * `rolling().mean()`-style inclusive frame for smoothing use.
    *
    * `is_anomaly` = baseline has ≥ `minCount` observations, positive
    * variance, and |z| > `zThreshold`.
    *
    * Scale shape: ONE shuffle on the key, one time sort per
    * partition, and Spark's sliding-frame processor advances both
    * frame edges monotonically per key — each row enters and leaves
    * the running aggregates exactly once (O(rows), not
    * O(rows·frame)). State is the in-frame slice, bounded by the
    * window span × event rate, independent of key history length.
    */
  def rollingStats(
      df: DataFrame, keyCol: String, tsCol: String, valCol: String,
      windowSec: Long, zThreshold: Double = 3.0,
      minCount: Int = 2, includeCurrent: Boolean = false): DataFrame = {
    require(windowSec > 0, "windowSec must be positive")
    val v = col(valCol).cast("long")
    val hi = if (includeCurrent) 0L else -1L
    val w = Window.partitionBy(keyCol).orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowSec * 1000000L, hi)
    val n = count(v).over(w)
    val s1 = sum(v).over(w)
    val s2 = sum(v * v).over(w)
    val base = df
      .where(col(tsCol).isNotNull && col(valCol).isNotNull)
      .withColumn("roll_n", n)
      .withColumn("__s1", s1)
      .withColumn("__s2", s2)
    val nn = col("roll_n")
    val mean = col("__s1").cast("double") / nn
    // exact long numerator; one double division; IEEE sqrt
    val varPop = (nn * col("__s2") - col("__s1") * col("__s1"))
      .cast("double") / (nn * nn)
    val std = sqrt(varPop)
    val z = ((v * nn - col("__s1")).cast("double") / nn) / std
    base
      .withColumn("roll_mean", mean)
      .withColumn("roll_std", std)
      .withColumn("zscore",
        when(nn >= minCount && varPop > 0, z))
      .withColumn("is_anomaly",
        (nn >= minCount && varPop > 0 && abs(z) > zThreshold)
          .cast("int"))
      .drop("__s1", "__s2")
  }

  /** Exponentially-weighted moving average per key — the trend
    * smoother (pandas `ewm(alpha).mean()` with `adjust=True`),
    * truncated to the last `lags` observations:
    * `y = Σⱼ (1−α)ʲ·x_{t−j} / Σⱼ (1−α)ʲ`, j < lags. Truncation is
    * what makes it a WINDOW computation instead of an unbounded
    * prefix recurrence; at (1−α)^lags below the double ulp the
    * truncated value IS the full EWMA in double arithmetic (α = 0.5,
    * lags = 20 ⇒ tail weight 2⁻²⁰).
    *
    * Both numerator and denominator are LEFT FOLDS over the frame in
    * time order (`acc·(1−α) + x` / `acc·(1−α) + 1`) — a fixed op
    * sequence, deterministic for any α. With a dyadic α (1/2, 1/4,
    * 3/8…) and integer-scaled values, every fold step is EXACT in
    * double (halving is exponent arithmetic; the integer adds fit the
    * 53-bit significand), so the result is order-independent and
    * cross-engine reproducible — the q131 oracle replays it through
    * the closed-form power weights and hashes identically.
    *
    * `tieCols` must make (ts, tieCols) a total order per key —
    * without it, equal timestamps would make the frame contents
    * nondeterministic.
    *
    * Scale shape: one shuffle on the key, one sort per partition,
    * and a ROWS frame of at most `lags` rows — per-row state is the
    * `lags`-element frame buffer, a small constant, independent of
    * key history. No self-join: the O(rows·lags) pair formulation is
    * the oracle's job, not the engine's.
    */
  def ewma(
      df: DataFrame, keyCol: String, tsCol: String, valCol: String,
      alpha: Double, lags: Int = 20,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    require(lags > 0, "lags must be positive")
    val order = unix_micros(col(tsCol)) +: tieCols.map(col)
    val w = Window.partitionBy(keyCol).orderBy(order: _*)
      .rowsBetween(-(lags - 1), 0)
    val lst = collect_list(col(valCol).cast("double")).over(w)
    val keep = lit(1.0d - alpha)
    df.where(col(tsCol).isNotNull && col(valCol).isNotNull)
      .withColumn("__lst", lst)
      .withColumn("ewma_n", size(col("__lst")).cast("long"))
      .withColumn("ewma",
        aggregate(col("__lst"), lit(0.0d),
          (acc, x) => acc * keep + x) /
        aggregate(col("__lst"), lit(0.0d),
          (acc, _) => acc * keep + lit(1.0d)))
      .drop("__lst")
  }

  /** Per-group OLS trend — closed-form least-squares `y = a + b·x`
    * per key from the five sufficient statistics
    * `(n, Σx, Σy, Σx², Σxy [, Σy²])`: slope
    * `b = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`, intercept
    * `a = (Σy − b·Σx)/n`, fit `r² = c²/(vx·vy)`. The grouped-regression
    * primitive (spend trend per customer, price drift per symbol,
    * growth rate per segment) without MLlib — it's one aggregation.
    *
    * Exactness: callers pass INTEGER x and y (epoch days, cents).
    * The sufficient statistics accumulate in DECIMAL(38,0) — exact
    * integer arithmetic to 10³⁸, mirrored by HUGEINT in the oracle —
    * and each output is a fixed double op-sequence over those exact
    * integers (one cast per statistic, one division), so results are
    * bit-reproducible across engines. Degenerate groups guard to
    * null: slope/intercept need ≥ 2 points and x-variance, r² also
    * y-variance.
    *
    * Scale shape: ONE partial+final aggregation (map-side combine on
    * the five sums — 40 bytes of state per group regardless of group
    * size), no window, no join. The textbook two-pass centered form
    * buffers nothing either but costs a second shuffle; sufficient
    * statistics at decimal-38 headroom don't need it.
    */
  def groupTrend(
      df: DataFrame, keyCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val dec = "decimal(38,0)"
    val x = col(xCol).cast(dec)
    val y = col(yCol).cast(dec)
    val agg = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * x).as("__sxx"), sum(x * y).as("__sxy"),
        sum(y * y).as("__syy"))
    val nD = col("n").cast(dec)
    val c = nD * col("__sxy") - col("__sx") * col("__sy")
    val vx = nD * col("__sxx") - col("__sx") * col("__sx")
    val vy = nD * col("__syy") - col("__sy") * col("__sy")
    val slope = c.cast("double") / vx.cast("double")
    val intercept =
      (col("__sy").cast("double") - slope * col("__sx").cast("double")) /
        col("n")
    val r2 = (c.cast("double") * c.cast("double")) /
      (vx.cast("double") * vy.cast("double"))
    agg
      .withColumn("slope", when(col("n") >= 2 && vx > 0, slope))
      .withColumn("intercept", when(col("n") >= 2 && vx > 0, intercept))
      .withColumn("r2", when(col("n") >= 2 && vx > 0 && vy > 0, r2))
      .drop("__sx", "__sy", "__sxx", "__sxy", "__syy")
  }

  /** OLAP subtotal lattice: `cube` (every dim subset) or `rollup`
    * (prefix hierarchies) aggregation over `dims`, with the
    * `grouping_id()` bit vector exposed as `gid` (first dim = most
    * significant bit; both Spark and standard SQL `GROUPING(a, b, …)`
    * agree on this order) so subtotal rows are distinguishable from
    * genuine null dim values — the classic report-cube primitive.
    *
    * Scale shape: Spark plans grouping sets as ONE `Expand` (each
    * input row replicated once per grouping set) feeding a single
    * partial+final hash aggregation — one shuffle total, map-side
    * combined, never one pass per subset (2ᵈ passes is the naive
    * shape). Keep `dims` small: Expand's replication factor is the
    * number of grouping sets (2ᵈ for cube, d+1 for rollup), which is
    * also why rollup beats cube whenever the dims form a hierarchy.
    */
  def subtotals(
      df: DataFrame, dims: Seq[String], aggs: Seq[Column],
      mode: String = "cube"): DataFrame = {
    require(dims.nonEmpty, "dims must not be empty")
    require(aggs.nonEmpty, "aggs must not be empty")
    val grouped = mode match {
      case "cube"   => df.cube(dims.map(col): _*)
      case "rollup" => df.rollup(dims.map(col): _*)
      case other    => throw new IllegalArgumentException(
        s"mode must be cube or rollup, got $other")
    }
    val cols = grouping_id().cast("long").as("gid") +: aggs
    grouped.agg(cols.head, cols.tail: _*)
  }

  /** First-order Markov transition matrix: for every ordered pair of
    * consecutive states within a key's sequence, `(from_state,
    * to_state, transitions, prob)` where `prob` = transitions /
    * total-transitions-out-of-`from_state` — the event-sequence
    * companion to [[funnel]] (which checks ONE fixed path; this
    * measures every observed step). `orderCols` must totally order
    * each key's rows (pass a unique tiebreaker — equal timestamps
    * otherwise make the lag nondeterministic).
    *
    * Scale shape: one shuffle on the key, one sort per key for the
    * `lag(1)` window (frame-bounded state — two rows), then a
    * map-side-combined count aggregation on (from, to); the
    * out-of-state totals frame is at most #states² rows and joins
    * back broadcast-sized. `prob` is a single double division of two
    * exact longs, bit-reproducible across engines. `minCount` prunes
    * rare transitions after counting (totals still include them, so
    * probabilities stay true).
    */
  def transitionMatrix(
      df: DataFrame, keyCol: String, stateCol: String,
      orderCols: Seq[Column], minCount: Long = 1L): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must not be empty")
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
    val pairs = df
      .where(col(keyCol).isNotNull && col(stateCol).isNotNull)
      .withColumn("__from", lag(col(stateCol), 1).over(w))
      .where(col("__from").isNotNull)
      .select(col("__from").as("from_state"), col(stateCol).as("to_state"))
      .groupBy("from_state", "to_state")
      .agg(count(lit(1)).as("transitions"))
    val totals = pairs.groupBy("from_state")
      .agg(sum(col("transitions")).as("__tot"))
    pairs
      .where(col("transitions") >= minCount)
      .join(broadcast(totals), Seq("from_state"))
      .select(col("from_state"), col("to_state"), col("transitions"),
        (col("transitions").cast("double") / col("__tot")).as("prob"))
  }

  /** Market-basket affinity: for every unordered item pair that
    * co-occurs in a basket, `(pair_count, support, confidence,
    * lift)` — the association-mining scores (lift > 1 = the pair
    * co-occurs more than independence predicts). `support` =
    * pair_count / #baskets, `confidence` = P(b | a) = pair_count /
    * count(a), `lift` = pair_count·#baskets / (count(a)·count(b)).
    * Pairs are emitted once with `item_a < item_b`; confidence is
    * reported in that orientation (the reverse is
    * `lift · count(a) / #baskets` — derivable, not duplicated).
    *
    * Scale design — the two classic blowups are both bounded:
    * (1) pair explosion is quadratic in BASKET size, so baskets are
    * capped to their `maxBasket` smallest items (deterministic, both
    * engines agree on item ordering) — the published cap/sample-giant-
    * baskets practice; the cap ranks via [[rankByRange]], so neither
    * an unbounded `collect_set` buffer nor a single-task sort of a
    * bot basket's million items exists anywhere; (2) item and pair
    * counts are plain partial+final aggregations (map-side combined),
    * and the #baskets scalar rides a broadcast one-row frame. All
    * metrics are single double divisions of exact long products
    * (counts to 2³¹ stay exact through the multiply), so results are
    * bit-reproducible across engines. `minPairCount` prunes the pair
    * frame before the metric joins.
    */
  def basketAffinity(
      df: DataFrame, basketCol: String, itemCol: String,
      maxBasket: Int = 64, minPairCount: Long = 1L): DataFrame = {
    require(maxBasket >= 2, "maxBasket must be >= 2")
    val di = df.select(col(basketCol), col(itemCol))
      .where(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .distinct()
    val capped = rankByRange(di, Seq(basketCol), Seq(col(itemCol).asc),
        "__rk")
      .where(col("__rk") <= maxBasket).drop("__rk")
    val nb = capped.agg(count_distinct(col(basketCol)).as("__nb"))
    val ic = capped.groupBy(col(itemCol)).agg(count(lit(1)).as("__c"))
    val pairs = capped.select(col(basketCol), col(itemCol).as("item_a"))
      .join(capped.select(col(basketCol), col(itemCol).as("item_b")),
        Seq(basketCol))
      .where(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("pair_count"))
      .where(col("pair_count") >= minPairCount)
    pairs
      .join(ic.select(col(itemCol).as("item_a"), col("__c").as("__ca")),
        Seq("item_a"))
      .join(ic.select(col(itemCol).as("item_b"), col("__c").as("__cb")),
        Seq("item_b"))
      .crossJoin(broadcast(nb))
      .select(col("item_a"), col("item_b"), col("pair_count"),
        (col("pair_count").cast("double") / col("__nb")).as("support"),
        (col("pair_count").cast("double") / col("__ca"))
          .as("confidence"),
        ((col("pair_count") * col("__nb")).cast("double") /
          (col("__ca") * col("__cb")).cast("double")).as("lift"))
  }

  /** Fixed-point PageRank over a directed edge list — the standard
    * importance measure for entity graphs (here: which suppliers/
    * customers sit at the center of the order graph; in a corpus
    * pipeline: domain authority over a link graph feeding quality
    * priors). Nodes are the distinct edge endpoints; rank seeds
    * uniformly and iterates
    * `r' = teleport + Σ_in-edges damping·r/outdeg` for `iters` rounds.
    *
    * All arithmetic is INTEGER fixed-point at 1e-12 granularity:
    * ranks are BIGINT trillionths, contributions are
    * `(num·r) div (den·outdeg)` integer floor-divisions, so every
    * iteration is an exact long sum — aggregation-order-independent,
    * bit-identical across engines and cluster sizes (double-based
    * PageRank differs in the last ulp per partition layout; after ten
    * iterations that's unreproducible). The floor leaks < 1e-12 of
    * mass per edge per round — far below any ranking consequence —
    * and dangling mass (out-degree-0 nodes never arise here: nodes
    * ARE edge endpoints, and callers wanting undirected walks pass
    * the symmetrized edge list) stays zero.
    *
    * Scale shape: the normalized edge list computes ONCE and persists
    * partitioned on `src`; each iteration is one shuffle-join of the
    * current rank vector (node-sized, re-partitioned on the same key)
    * plus one aggregation on `dst` — the canonical distributed
    * PageRank round. Rank frames localCheckpoint each iteration:
    * lineage stays one round deep instead of `iters` joins tall, so
    * the plan (and any executor recovery) never replays the whole
    * chain.
    *
    * @param edges DataFrame with `srcCol`/`dstCol`; duplicate edges
    *              are collapsed (distinct) before degree counting.
    * @param damping per-mill damping factor (default 850 = 0.85).
    * @return (node, rank_scaled): rank in trillionths, summing to
    *         ≤ 1e12 over all nodes.
    */
  /** Per-group quantile normalization onto the global distribution —
    * batch-effect correction before cross-source thresholds: a score
    * of 0.6 from a source whose scorer runs hot and 0.4 from one that
    * runs cold can both be "the 70th percentile of their source"; this
    * maps every row to the GLOBAL value at its within-group rank, so
    * one threshold means the same thing in every source (the
    * microarray quantile-normalization construction applied to
    * quality scores).
    *
    * Exact integer routing: within-group inclusive rank `i` (RANGE
    * frame — peers count together) and group size `n` are exact
    * longs; the grid index is `min(k, ceil(i·k/n))` in integer
    * arithmetic — so WHICH grid cell a row maps to is bit-exact
    * across engines and partitionings. The k-point global grid is the
    * only estimated part: `percentile_approx` by default (bounded
    * state at corpus scale), `exact = true` for the interpolated
    * exact grid (one unbounded-state agg — the q81/q94 trade). The
    * grid rides one broadcast one-row frame; no row-level join
    * against the global distribution exists anywhere.
    *
    * Output: input columns + (`grid_idx`, `normalized`).
    */
  def quantileNormalize(
      df: DataFrame, groupCol: String, valueCol: String, k: Int = 100,
      exact: Boolean = false, approxAccuracy: Int = 10000): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val reserved = Set("__qn_i", "__qn_n", "__qn_grid", "grid_idx",
      "normalized")
    require(!df.columns.exists(reserved),
      s"input must not have columns named ${reserved.mkString(", ")}")
    val probs = (1 to k).map(_.toDouble / k)
    val v = col(valueCol).cast("double")
    val gridAgg =
      if (exact) percentile(v, typedlit(probs))
      else percentile_approx(v, typedlit(probs), lit(approxAccuracy))
    val grid = df.where(v.isNotNull)
      .agg(gridAgg.cast("array<double>").as("__qn_grid"))
    val wRank = Window.partitionBy(col(groupCol)).orderBy(v)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.where(v.isNotNull)
      .withColumn("__qn_i", count(lit(1)).over(wRank))
      .withColumn("__qn_n", count(lit(1)).over(wAll))
      .crossJoin(broadcast(grid))
      .withColumn("grid_idx",
        least(lit(k.toLong),
          expr(s"(__qn_i * $k + __qn_n - 1) div __qn_n")))
      .withColumn("normalized",
        element_at(col("__qn_grid"), col("grid_idx").cast("int")))
      .drop("__qn_i", "__qn_n", "__qn_grid")
  }

  /** Linear multi-touch attribution: each conversion's credit is
    * split across the touch events that preceded it within the
    * lookback window — the marketing-analytics counterpart of q48's
    * single-touch interval join, and the report that decides channel
    * budgets. Credit is EXACT integer milli-units: 1000 div k per
    * touch with the remainder assigned to the LAST touch before the
    * conversion (closest-touch bias on the indivisible remainder, and
    * Σ credit ≡ 1000 per attributed conversion by construction — no
    * float leakage, engine-identical).
    *
    * Pairing is an equi-join on the key with the window as a residual
    * range predicate — the [[graft.streaming.EventStreams
    * .intervalJoin]] batch shape; per-conversion touch counts and
    * ranks run in ONE window over the pair frame (pair-sized, bounded
    * by touches-per-window, with AQE handling hot keys). Same-instant
    * touches count; ties order by (ts, touch id) — total.
    * Output: one row per (conversion, touch) with `credit_milli`,
    * `touch_rank` (1 = earliest), `n_touches`.
    */
  def linearAttribution(
      conversions: DataFrame, touches: DataFrame, keyCol: String,
      tsCol: String, idCol: String,
      windowDuration: String): DataFrame =
    attributionPairs(conversions, touches, keyCol, tsCol, idCol,
        windowDuration)
      .withColumn("credit_milli",
        expr("1000 div n_touches") +
          when(col("touch_rank") === col("n_touches"),
            expr("1000 % n_touches")).otherwise(lit(0L)))
      .select(col("__k").as(keyCol), col("conversion_id"),
        col("conversion_ts"), col("touch_id"), col("touch_ts"),
        col("touch_rank"), col("n_touches"), col("credit_milli"))

  /** Shared conversion–touch pairing for the attribution family: the
    * interval equi-join plus the (key, conversion) count/rank window
    * (see [[linearAttribution]]'s scaladoc for the shape rationale).
    * Returns `(__k, conversion_id, conversion_ts, touch_id, touch_ts,
    * touch_rank, n_touches)` — credit policies layer on top as pure
    * expressions.
    */
  private def attributionPairs(
      conversions: DataFrame, touches: DataFrame, keyCol: String,
      tsCol: String, idCol: String,
      windowDuration: String): DataFrame = {
    val conv = conversions.select(col(keyCol).as("__k"),
      col(tsCol).as("__cts"), col(idCol).as("__cid"))
      .where(col("__k").isNotNull && col("__cts").isNotNull)
    val tch = touches.select(col(keyCol).as("__k"),
      col(tsCol).as("__tts"), col(idCol).as("__tid"))
      .where(col("__k").isNotNull && col("__tts").isNotNull)
    val paired = conv.join(tch, Seq("__k"))
      .where(col("__tts") <= col("__cts") &&
        col("__tts") > col("__cts") - expr(s"INTERVAL $windowDuration"))
    // partition by (key, conversion id), not conversion id alone:
    // event-log ids are often only unique PER KEY, and merging pairs
    // from different keys that share a conversion id would inflate
    // n_touches and corrupt credit_milli
    val w = Window.partitionBy(col("__k"), col("__cid"))
    val wOrd = w.orderBy(col("__tts").asc, col("__tid").asc)
    paired
      .withColumn("n_touches", count(lit(1)).over(w))
      .withColumn("touch_rank", row_number().over(wOrd))
      .select(col("__k"), col("__cid").as("conversion_id"),
        col("__cts").as("conversion_ts"),
        col("__tid").as("touch_id"), col("__tts").as("touch_ts"),
        col("touch_rank"), col("n_touches"))
  }

  /** Position-based (U-shaped, 40/20/40) multi-touch attribution —
    * [[linearAttribution]]'s sibling for the "first touch found them,
    * last touch closed them" model: first and last touch get 400‰
    * each, the middle touches split the remaining 200‰. Credit stays
    * EXACT integer milli-units: middles get `200 div (n−2)` with the
    * indivisible remainder on the LATEST middle (rank n−1, the
    * closest-touch bias [[linearAttribution]] uses for its
    * remainder); n = 1 → 1000, n = 2 → 500/500. Σ credit ≡ 1000 per
    * attributed conversion by construction at every n.
    */
  def positionAttribution(
      conversions: DataFrame, touches: DataFrame, keyCol: String,
      tsCol: String, idCol: String,
      windowDuration: String): DataFrame =
    attributionPairs(conversions, touches, keyCol, tsCol, idCol,
        windowDuration)
      .withColumn("credit_milli",
        when(col("n_touches") === 1, lit(1000L))
          .when(col("n_touches") === 2, lit(500L))
          .when(col("touch_rank") === 1 ||
            col("touch_rank") === col("n_touches"), lit(400L))
          .otherwise(expr("200 div (n_touches - 2)") +
            when(col("touch_rank") === col("n_touches") - 1,
              expr("200 % (n_touches - 2)")).otherwise(lit(0L))))
      .select(col("__k").as(keyCol), col("conversion_id"),
        col("conversion_ts"), col("touch_id"), col("touch_ts"),
        col("touch_rank"), col("n_touches"), col("credit_milli"))

  /** Shapley-value channel attribution — the coalition-game reading
    * that completes the attribution family ([[linearAttribution]]
    * splits evenly, [[positionAttribution]] by position; Shapley
    * credits each channel its AVERAGE marginal lift over every
    * ordering): per user the SET of touched channels and a converted
    * flag; each coalition's value v(T) is its users' empirical
    * conversion rate (unobserved coalitions contribute v = 0, the
    * empirical convention — when all 2^k coalitions are observed,
    * Σφ telescopes to v(all) − v(∅)); channel i's credit is
    * `φ_i = Σ_{T ⊆ C∖{i}} |T|!(k−1−|T|)!/k! · (v(T∪{i}) − v(T))`.
    *
    * Determinism: each v is ONE mirrored double division of exact
    * counts; each lattice term's rate DIFFERENCE nano-floors to a
    * BIGINT before the integer weight multiply, so the per-channel
    * sum is an exact order-free integer sum with one final mirrored
    * `/k!/1e9` division — bit-identical cross-engine.
    *
    * Scale contract — BOUNDED CHANNEL SET: the coalition lattice is
    * 2^(k−1)·k rows built on the driver from the ≤ `maxChannels`
    * collected distinct channels (the documented bounded collect —
    * the BPE-vocab pattern); users collapse map-side to one
    * set-keyed row, coalition stats to ≤ 2^k rows. Row count never
    * reaches the lattice.
    *
    * Returns `(channel, n_users, n_conv, shapley)` — `n_users`/
    * `n_conv` count users whose set CONTAINS the channel.
    */
  def shapleyAttribution(
      df: DataFrame, userCol: Column, channelCol: Column,
      converted: Column, maxChannels: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val perUser = df
      .select(userCol.as("__u"), channelCol.cast("string").as("__ch"),
        converted.cast("boolean").as("__cv"))
      .where(col("__u").isNotNull)
      .groupBy("__u")
      .agg(sort_array(collect_set(col("__ch"))).as("__set"),
        max(coalesce(col("__cv"), lit(false))).cast("long").as("__conv"))
      .transform(graft.core.CacheScope.disk)
    val setStats = perUser
      .groupBy(concat_ws("|", col("__set")).as("__k"))
      .agg(count(lit(1)).as("__n"), sum(col("__conv")).as("__c"))
    val channels = perUser
      .select(explode(col("__set")).as("__ch")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    require(channels.nonEmpty, "no channels observed")
    require(channels.size <= maxChannels,
      s"${channels.size} channels exceed maxChannels=$maxChannels " +
        "(the 2^k coalition lattice must stay bounded)")
    val k = channels.size
    def fact(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)
    val kFact = fact(k)
    // lattice rows: (channel, without-key, with-key, |T|!·(k−1−|T|)!)
    val lattice = (for {
      i <- channels
      rest = channels.filterNot(_ == i)
      bits <- 0 until (1 << (k - 1))
      t = rest.zipWithIndex.collect {
        case (c, j) if (bits & (1 << j)) != 0 => c
      }
    } yield (i, t.mkString("|"), (t :+ i).sorted.mkString("|"),
      fact(t.size) * fact(k - 1 - t.size)))
      .toDF("channel", "__tk", "__tik", "__w")
    val vOf = setStats.select(col("__k"),
      (col("__c").cast("double") / col("__n").cast("double"))
        .as("__v"))
    val terms = lattice
      .join(vOf.select(col("__k").as("__tik"), col("__v").as("__va")),
        Seq("__tik"), "left")
      .join(vOf.select(col("__k").as("__tk"), col("__v").as("__vb")),
        Seq("__tk"), "left")
      .select(col("channel"),
        (floor((coalesce(col("__va"), lit(0.0)) -
          coalesce(col("__vb"), lit(0.0))) * lit(1000000000.0))
          .cast("long") * col("__w")).as("__term"))
    val phi = terms.groupBy("channel")
      .agg(sum(col("__term")).as("__s"))
    val touched = perUser
      .select(explode(col("__set")).as("channel"), col("__conv"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_users"), sum(col("__conv")).as("n_conv"))
    touched.join(phi, Seq("channel"))
      .select(col("channel"), col("n_users"), col("n_conv"),
        round(col("__s").cast("double") / lit(kFact.toDouble) /
          lit(1000000000.0), 6).as("shapley"))
  }

  /** Frequent contiguous event sequences (n-gram sequence mining):
    * every length-`n` run of consecutive states within a key's
    * time-ordered stream, counted by the number of DISTINCT keys that
    * exhibit it — the sequential-pattern miner behind "what do users
    * do next" funnels and curriculum-ordering audits, restricted to
    * contiguous n-grams (the scalable core of PrefixSpan: support
    * counting needs no candidate generation or multi-pass growth).
    *
    * Scale design: one shuffle on the key + one time sort serve all
    * `n−1` lag frames (ROWS-bounded — state is n rows per key, never
    * the stream); the support count pre-distincts (sequence, key)
    * map-side before counting, so a bot key repeating one n-gram a
    * million times contributes one row per partition to the exchange,
    * not a million; `minSupport` prunes before the share join; the
    * total-keys scalar rides a broadcast one-row frame. `support` =
    * distinct keys containing the sequence / all keys with ≥ n events
    * — an exact-long division, bit-stable across engines.
    *
    * `orderCols` must be a TOTAL order within each key (ties would
    * make lag nondeterministic — same contract as [[transitionMatrix]]
    * tightened to determinism; pass a tie-breaking id).
    */
  def frequentSequences(
      df: DataFrame, keyCol: String, stateCol: String,
      orderCols: Seq[Column], n: Int = 3,
      minSupport: Long = 2L): DataFrame = {
    require(n >= 2, "n must be >= 2")
    require(orderCols.nonEmpty, "orderCols must not be empty")
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
    val lagged = (n - 1 to 1 by -1).foldLeft(
      df.where(col(keyCol).isNotNull && col(stateCol).isNotNull)) {
      (acc, i) => acc.withColumn(s"__s$i", lag(col(stateCol), i).over(w))
    }
    val seqCols = (n - 1 to 1 by -1).map(i => col(s"__s$i")) :+
      col(stateCol)
    val grams = lagged
      .where(seqCols.map(_.isNotNull).reduce(_ && _))
      .select((seqCols.zipWithIndex.map { case (c, i) =>
        c.as(s"step_${i + 1}")
      } :+ col(keyCol)): _*)
      .distinct()
    val stepNames = (1 to n).map(i => s"step_$i")
    val counts = grams.groupBy(stepNames.map(col): _*)
      .agg(count(lit(1)).as("n_keys"))
      .where(col("n_keys") >= minSupport)
    // keys long enough to contain any n-gram: the support denominator
    val eligible = df
      .where(col(keyCol).isNotNull && col(stateCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("__len"))
      .where(col("__len") >= n)
      .agg(count(lit(1)).as("__nkeys"))
    counts.crossJoin(broadcast(eligible))
      .select((stepNames.map(col) :+ col("n_keys") :+
        (col("n_keys").cast("double") / col("__nkeys"))
          .as("support")): _*)
  }

  /** Functional-dependency audit — the schema-profiling question "does
    * column A determine column B" answered with exact counts, for a
    * declared list of candidate FDs: per (determinant, dependent)
    * pair, the number of determinant groups, the groups carrying MORE
    * than one distinct dependent value (FD violations), and the row
    * mass inside violating groups. The audit that catches a
    * denormalization drifting out of sync, a surrogate key silently
    * losing uniqueness, or an upstream join fanning out — before a
    * downstream `first(dep)` silently picks an arbitrary value.
    *
    * Null semantics: rows with a null determinant are excluded (SQL
    * grouping would conflate them into one spurious group); null
    * dependents COUNT as a distinct value against non-null ones
    * (a group holding `x` and null does NOT determine its dependent)
    * — counted via `count(distinct dep) + max(dep is null)`, exact.
    *
    * Scale shape: one grouped aggregation per declared pair
    * (map-side combined; distinct-dependent state is per-group and
    * the violation test needs only "≥ 2", never the value list), each
    * collapsing to a ONE-ROW summary — the pairs then union into a
    * |pairs|-row report. Cost is |pairs| shuffles of group-count
    * rows; nothing is ever pairwise across rows.
    *
    * Returns `(determinant, dependent, n_groups, n_violating_groups,
    * n_rows, n_violating_rows, fd_holds)` ordered as declared.
    */
  def fdAudit(
      df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "at least one (determinant, dependent) pair")
    pairs.map { case (det, dep) =>
      df.where(col(det).isNotNull)
        .groupBy(col(det))
        .agg((countDistinct(col(dep)) +
            max(when(col(dep).isNull, 1L).otherwise(0L))).as("__nd"),
          count(lit(1)).as("__n"))
        .agg(
          count(lit(1)).as("n_groups"),
          sum(when(col("__nd") > 1, 1L).otherwise(0L))
            .as("n_violating_groups"),
          sum(col("__n")).as("n_rows"),
          sum(when(col("__nd") > 1, col("__n")).otherwise(0L))
            .as("n_violating_rows"))
        .select(lit(det).as("determinant"), lit(dep).as("dependent"),
          col("n_groups"), col("n_violating_groups"), col("n_rows"),
          col("n_violating_rows"),
          (col("n_violating_groups") === 0).cast("int").as("fd_holds"))
    }.reduce(_ unionByName _)
  }

}
