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
object Analytics {

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

  /** Pearson χ² test of independence between two categorical columns:
    * one grouped count of the contingency table, marginals re-derived
    * from it (grouped again on each axis — cells, not rows), expected
    * counts E = rowTot·colTot/N, χ² = Σ(O−E)²/E over observed cells
    * PLUS the structurally-zero cells' E (a zero observed cell still
    * contributes E; dropping it would understate χ²) — handled by
    * cross-joining the two marginal sets, which is marginal-sized, not
    * data-sized. Returns one row: (chi2, dof, n).
    *
    * Scale: the corpus is touched once (the contingency count);
    * everything after operates on |A|×|B| cells.
    */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    // the ONE corpus-touching pass; persisted because the marginals,
    // N, the dof levels, and the cell join all read it (the repo's
    // multi-consumer persist convention)
    val cells = df.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__o"))
      .transform(graft.core.CacheScope.disk)
    val rowTot = cells.groupBy("__a").agg(sum("__o").as("__ra"))
      .withColumnRenamed("__a", "__ra_key")
    val colTot = cells.groupBy("__b").agg(sum("__o").as("__cb"))
      .withColumnRenamed("__b", "__cb_key")
    val n = cells.agg(sum("__o").as("__n"))
    // null-safe join back: a null category level is a level like any
    // other — an equi-join would zero its observed counts while its
    // mass still inflated the marginals (a silently wrong statistic)
    val full = rowTot.crossJoin(colTot).crossJoin(n)
      .join(cells,
        col("__ra_key") <=> col("__a") && col("__cb_key") <=> col("__b"),
        "left")
      .select(col("__ra"), col("__cb"), col("__n"),
        coalesce(col("__o"), lit(0L)).as("__o"))
      .withColumn("__e",
        col("__ra").cast("double") * col("__cb").cast("double") /
          col("__n").cast("double"))
    // dof levels from the (persisted, cell-sized) contingency table —
    // one bounded action, no corpus re-scan
    val lv = cells.agg(
      count_distinct(struct(col("__a"))).as("la"),
      count_distinct(struct(col("__b"))).as("lb")).head()
    val dof = ((lv.getLong(0) - 1) * (lv.getLong(1) - 1)).toInt
    full.agg(
      sum(pow(col("__o").cast("double") - col("__e"), 2) / col("__e"))
        .as("chi2"),
      first(col("__n")).as("n"))
      .select(round(col("chi2"), 4).as("chi2"),
        lit(dof).as("dof"), col("n"))
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

  /** Delete-one-group jackknife for a RATIO metric `Σnum / Σden` —
    * the standard-error machinery ratio metrics need (revenue per
    * unit, CTR, cost per token): per-row CLT doesn't apply to a ratio
    * of sums, but the delete-one-bucket pseudo-estimates do (Efron &
    * Stein; the production form of every large-scale experimentation
    * platform's "bucketed jackknife"). Rows land in `buckets` hash
    * buckets; θ₍ᵢ₎ = ratio with bucket i removed; SE =
    * √((B−1)/B · Σ(θ₍ᵢ₎ − θ̄)²).
    *
    * Exactness: per-bucket sums are exact longs; each θ₍ᵢ₎ quantizes
    * to `floor(scale·(S−sᵢ)/(D−dᵢ))` (one double division of two
    * exact longs, then floor — deterministic cross-engine), so the
    * jackknife mean and the squared deviations are EXACT integer
    * arithmetic; doubles reappear only in the final rendered columns.
    * `scale` is the caller's quantization contract — pick it so
    * θ·scale ≲ 1e15 AND the expected bucket deviation × scale stays
    * under √(2⁶³⁻¹/B) (a cents-per-unit ratio ~1e5 wants 1e4, a CTR
    * ~1e-2 wants 1e9; quantization noise ≤ 1/scale per
    * pseudo-estimate, orders below any admissible SE). The bound is
    * enforced LOUD, not silent: an over-cap deviation raises
    * (re-bucket or rescale) instead of wrapping the squared sum.
    *
    * Shape: one map-side-combined aggregation to B bucket rows, then
    * everything downstream is B-sized (B ≤ 1024 enforced — the
    * B×B-free construction: θ₍ᵢ₎ needs only the bucket's own sums and
    * the broadcast totals). Buckets with D−dᵢ = 0 would be a
    * degenerate resample — rejected loud (pick more/fewer buckets)
    * rather than silently skipped, which would bias the SE.
    *
    * Returns one row: `(n_buckets, theta, theta_jack, se)`.
    */
  def jackknifeRatio(
      df: DataFrame, numCol: Column, denCol: Column,
      bucketKey: Column, buckets: Int = 32,
      scale: Double = 1e6): DataFrame = {
    require(buckets >= 2 && buckets <= 1024, "buckets in [2, 1024]")
    require(scale >= 1.0 && scale <= 1e12, "scale in [1, 1e12]")
    val b = df.select(
        (conv(substring(md5(concat(lit("jk:"),
          bucketKey.cast("string"))), 1, 8), 16, 10).cast("long")
          % buckets).as("__b"),
        numCol.cast("long").as("__n"), denCol.cast("long").as("__d"))
      .groupBy("__b")
      .agg(sum(col("__n")).as("__sn"), sum(col("__d")).as("__sd"))
    val tot = b.agg(sum(col("__sn")).as("__tn"),
      sum(col("__sd")).as("__td"), count(lit(1)).as("__nb"))
    val pseudo = b.crossJoin(broadcast(tot))
      .withColumn("__theta_i",
        floor(lit(scale) * (col("__tn") - col("__sn")).cast("double")
          / (col("__td") - col("__sd")).cast("double")).cast("long"))
    // pseudo feeds the mean AND the deviation pass: persist, or the
    // bucket aggregation re-executes per consumer
    val p = pseudo.select(col("__theta_i"),
        ((col("__td") - col("__sd")) === 0).as("__degen"),
        col("__tn"), col("__td"))
      .transform(graft.core.CacheScope.disk)
    val mean = p.agg(count(lit(1)).as("__nb"),
        sum(when(col("__degen"), 1L).otherwise(0L)).as("__ndegen"),
        sum(col("__theta_i")).as("__sum_ti"))
      .select(col("__nb"), col("__ndegen"),
        expr("__sum_ti div __nb").as("__tbar"))
    // √(2⁶³−1 / B): the per-deviation bound under which the squared
    // sum provably fits BIGINT
    val devCap = math.sqrt(Long.MaxValue.toDouble / buckets).toLong
    p.crossJoin(broadcast(mean))
      .withColumn("__dev", col("__theta_i") - col("__tbar"))
      .agg(max(col("__nb")).as("n_buckets"),
        max(col("__ndegen")).as("__ndegen"),
        max(col("__tbar")).as("__tbar"),
        max(abs(col("__dev"))).as("__maxdev"),
        sum(col("__dev") * col("__dev")).as("__ss"),
        max(col("__tn")).as("__tn"), max(col("__td")).as("__td"))
      .select(
        col("n_buckets"),
        round(col("__tn").cast("double")
          / col("__td").cast("double"), 9).as("theta"),
        round(col("__tbar").cast("double") / scale, 9).as("theta_jack"),
        when(col("__ndegen") > 0,
          raise_error(lit("jackknifeRatio: a delete-one bucket " +
            "empties the denominator; adjust buckets")).cast("double"))
          .when(col("__maxdev") > devCap,
            raise_error(lit("jackknifeRatio: bucket deviation " +
              "overflows the exact squared sum; rescale the metric " +
              "or use fewer buckets")).cast("double"))
          .otherwise(round(
            // ss·(B−1) can exceed BIGINT even when ss fits: multiply
            // in double (the oracle spells the identical form)
            sqrt(col("__ss").cast("double")
              * (col("n_buckets") - 1).cast("double")
              / col("n_buckets").cast("double")) / scale, 9)).as("se"))
  }

  /** Lagged cross-correlation of two event streams: Pearson
    * correlation of series A's per-bucket counts against series B's
    * counts `lag` buckets later, for every lag in [−maxLag, maxLag] —
    * the lead/lag screen ("does signup activity LEAD purchase
    * activity, and by how many hours?") behind alerting and
    * attribution hypotheses. A positive-lag peak means A leads B.
    *
    * Shape: events collapse map-side to one row per time bucket
    * (conditional counts — cost scales with event volume once, then
    * everything downstream is BUCKET-sized: span/width rows, not
    * events); the full bucket grid is generated from the min/max
    * scalar so silent gaps count as zeros instead of vanishing from
    * the alignment (the resample lesson); the (2·maxLag+1) lags
    * attach by one generated column and one self-join on
    * `idx + lag` — (2k+1)·buckets rows total, one aggregation.
    * Zero-variance windows yield null correlation (both engines'
    * convention). Output: (lag, n_buckets, corr).
    */
  def crossCorrelation(
      df: DataFrame, tsCol: String, typeCol: String,
      typeA: String, typeB: String, bucketSeconds: Long = 3600L,
      maxLag: Int = 6): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    require(maxLag >= 0, "maxLag must be >= 0")
    val micros = bucketSeconds * 1000000L
    val cnt = df
      .where(col(tsCol).isNotNull)
      .select(expr(s"unix_micros($tsCol) div $micros").as("__idx"),
        col(typeCol).as("__t"))
      .groupBy("__idx")
      .agg(sum(when(col("__t") === typeA, 1L).otherwise(0L)).as("__a"),
        sum(when(col("__t") === typeB, 1L).otherwise(0L)).as("__b"))
    val bounds = cnt.agg(min(col("__idx")).as("__lo"),
      max(col("__idx")).as("__hi"))
    val grid = bounds
      .select(explode(sequence(col("__lo"), col("__hi"))).as("__idx"))
      .join(cnt, Seq("__idx"), "left")
      .select(col("__idx"), coalesce(col("__a"), lit(0L)).as("__a"),
        coalesce(col("__b"), lit(0L)).as("__b"))
      .transform(graft.core.CacheScope.disk)
    val lagged = grid
      .select(col("__idx"), col("__a"),
        explode(sequence(lit(-maxLag), lit(maxLag))).as("lag"))
      .withColumn("__bidx", col("__idx") + col("lag"))
      .join(grid.select(col("__idx").as("__bidx"), col("__b")),
        Seq("__bidx"))
    lagged.groupBy(col("lag"))
      .agg(count(lit(1)).as("n_buckets"),
        corr(col("__a").cast("double"), col("__b").cast("double"))
          .as("corr"))
  }

  /** Two-proportion z-test of every group against the pooled rest —
    * the A/B-flavored segment screen ("is this segment's conversion
    * rate different from everyone else's?") run as ONE aggregation:
    * per group the success count and size, the complement derived
    * from broadcast grand totals, z = (p_g − p_r) /
    * √(p̂(1−p̂)(1/n_g + 1/n_r)) with p̂ the pooled rate, and
    * `significant` at the two-sided threshold `zAlpha`.
    *
    * All inputs to the float math are exact longs from one grouped
    * count (map-side combined) plus one broadcast one-row total, so
    * results are deterministic under any partitioning; groups where a
    * variance term degenerates (empty complement, pooled rate 0 or 1)
    * emit null z rather than ±∞.
    */
  def proportionTest(
      df: DataFrame, groupCol: String, success: Column,
      zAlpha: Double = 1.96): DataFrame = {
    val per = df
      .where(col(groupCol).isNotNull && success.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(success.cast("int").cast("long")).as("successes"))
    val tot = per.agg(sum(col("n")).as("__tn"),
      sum(col("successes")).as("__ts"))
    val joined = per.crossJoin(broadcast(tot))
      .withColumn("__nr", col("__tn") - col("n"))
      .withColumn("__sr", col("__ts") - col("successes"))
    val pg = col("successes").cast("double") / col("n")
    val pr = col("__sr").cast("double") / col("__nr")
    val pp = col("__ts").cast("double") / col("__tn")
    val se = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n") + lit(1.0) / col("__nr")))
    val z = when(col("__nr") > 0 && col("__ts") > 0 &&
        col("__ts") < col("__tn"), (pg - pr) / se)
    joined.select(col(groupCol), col("n"), col("successes"),
      pg.as("rate"), pr.as("rate_rest"), z.as("z"),
      (abs(z) > lit(zAlpha)).as("significant"))
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

  /** Fixed-point integer PageRank over a distinct edge list: `iters`
    * synchronous power-iteration rounds at damping `damping/1000`,
    * every quantity in exact 1e12 fixed-point units (`rank_scaled`) —
    * the per-mill damping split, the per-edge contribution
    * (`damping·rank div (1000·deg)`), and the teleport term are all
    * BIGINT arithmetic, so ranks are bit-identical across engines,
    * partitionings, and cluster sizes.
    *
    * DANGLING-MASS SEMANTICS: nodes with no out-edges contribute
    * NOTHING to the next round — their damped mass is dropped, not
    * redistributed, so total mass shrinks by `damping/1000 ×
    * (dangling mass + per-edge integer-division remainders)` each
    * iteration rather than staying at 1.0 (the standard alternative
    * adds the dangling sum uniformly). This is the right contract for
    * the registry's use (q154 symmetrizes the graph first, so no
    * dangling nodes exist and only the div remainders leak); callers
    * ranking a directed graph with sinks should symmetrize or accept
    * sink-discounted ranks. The per-iteration mass identity is pinned
    * by spec (AnalyticsSpec).
    *
    * Scale shape: the normalized edge list persists once,
    * repartitioned AND sorted on the join key, so each round's join
    * re-sorts only the rank side (node-count rows); per-round lineage
    * truncates via `localCheckpoint`. Per-iteration shuffle of the
    * contribution aggregate is inherent to PageRank.
    */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 6, damping: Int = 850): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(damping >= 0 && damping <= 1000, "damping is per-mill")
    val scale = 1000000000000L // 1e12: fixed-point unit
    // the normalized edge list is consumed THREE times (degrees, the
    // persisted per-iteration join input, the node universe): persist
    // it first or the upstream plan — often a join + distinct over the
    // raw relation — re-executes once per consumer before the
    // iterations even start
    val e = edges
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .where(col("__src").isNotNull && col("__dst").isNotNull)
      .distinct()
      .transform(graft.core.CacheScope.disk)
    val deg = e.groupBy("__src").agg(count(lit(1)).as("__deg"))
    // partition AND sort on the iteration join key before persisting:
    // the cached ordering is visible to the planner, so each round's
    // join re-sorts only the rank side (node-count rows), never the
    // edge list
    val edged = e.join(deg, Seq("__src"))
      .repartition(col("__src"))
      .sortWithinPartitions("__src")
      .transform(graft.core.CacheScope.disk)
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst"))).distinct()
      .transform(graft.core.CacheScope.disk)
    val n = nodes.count()
    val teleport = ((1000L - damping) * scale / 1000L) / n
    var ranks = nodes.select(col("node"),
      lit(scale / n).as("rank_scaled")).localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = edged
        .join(ranks.select(col("node").as("__src"), col("rank_scaled")),
          Seq("__src"))
        .select(col("__dst").as("node"),
          expr(s"($damping * rank_scaled) div (1000 * __deg)")
            .as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__in"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + coalesce(col("__in"), lit(0L)))
            .as("rank_scaled"))
        .localCheckpoint()
    }
    ranks
  }

  /** Stationary distribution of a finite Markov chain by damped power
    * iteration — [[pageRank]] generalized to WEIGHTED transitions:
    * given transition counts `(from, to, cnt)` (e.g. a
    * [[transitionMatrix]] output), iterate
    * `π' = teleport + (damping/1000)·πᵀP` with P the row-normalized
    * count matrix. The "where does a user session settle" /
    * "long-run state mix" summary behind funnel and curriculum
    * audits.
    *
    * Exactness: π lives in 1e9 fixed-point units and each edge
    * probability is pre-quantized to `p = (cnt·1e9) div row_total`;
    * the per-edge update is `((damping·π) div 1000)·p div 1e9` —
    * every intermediate ≤ ~9·10¹⁷, inside BIGINT, so results are
    * bit-identical across engines and partitionings. Like
    * [[pageRank]], mass dropped by div floors and by ABSORBING states
    * (rows with no outgoing transitions) is NOT redistributed — total
    * mass shrinks accordingly; states reachable only as sinks still
    * receive teleport + inflow. Spec pins the replay identity.
    *
    * Scale: state spaces here are post-aggregation domains (event
    * types, funnel stages) — the transition frame is domain², tiny;
    * the iteration is `iters` broadcast-sized joins. For million-node
    * graphs use [[pageRank]]'s persisted-edge-list shape instead.
    */
  def markovStationary(
      trans: DataFrame, fromCol: String, toCol: String,
      cntCol: String, iters: Int = 8, damping: Int = 900): DataFrame = {
    require(iters >= 1 && iters <= 64, "iters in [1, 64]")
    require(damping >= 0 && damping <= 1000, "damping is per-mill")
    val scale = 1000000000L // 1e9: see overflow note in the scaladoc
    val t = trans
      .select(col(fromCol).as("__f"), col(toCol).as("__t"),
        col(cntCol).cast("long").as("__n"))
      .where(col("__f").isNotNull && col("__t").isNotNull &&
        col("__n") > 0)
      .groupBy("__f", "__t").agg(sum(col("__n")).as("__n"))
      .transform(graft.core.CacheScope.disk)
    val tot = t.groupBy("__f").agg(sum(col("__n")).as("__tot"))
    val edged = t.join(tot, Seq("__f"))
      .select(col("__f"), col("__t"),
        expr(s"(__n * $scale) div __tot").as("__p"))
      .transform(graft.core.CacheScope.disk)
    val states = t.select(col("__f").as("state"))
      .union(t.select(col("__t"))).distinct()
      .transform(graft.core.CacheScope.disk)
    val n = states.count()
    val teleport = ((1000L - damping) * scale / 1000L) / n
    var pi = states.select(col("state"),
      lit(scale / n).as("pi_scaled")).localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = edged
        .join(pi.select(col("state").as("__f"), col("pi_scaled")),
          Seq("__f"))
        .select(col("__t").as("state"),
          expr(s"(($damping * pi_scaled) div 1000) * __p div $scale")
            .as("__c"))
        .groupBy("state").agg(sum(col("__c")).as("__in"))
      pi = states.join(contrib, Seq("state"), "left")
        .select(col("state"),
          (lit(teleport) + coalesce(col("__in"), lit(0L)))
            .as("pi_scaled"))
        .localCheckpoint()
    }
    pi
  }

  /** KMV (k-minimum-values) audience-overlap audit: pairwise distinct
    * INTERSECTION estimates between groups from mergeable bottom-k
    * hash sketches — the set operation HLL cannot do — verified
    * in-query against the exact intersection (the q46/q177
    * sketch-honesty pattern; md5 is fixed, so the `within_tol` flag
    * is deterministic, not flaky).
    *
    * Sketch: per group, the k smallest 60-bit md5 values over
    * DISTINCT members (ties on h broken by member id — md5 collisions
    * at 60 bits are possible in principle, ordering stays total);
    * estimate = (k−1)·2⁶⁰/θ_k, exact when the group holds < k
    * members. Union sketches merge by k-smallest-of-union
    * (bottom-k is closed under union — the mergeability that makes
    * this a SHARDED sketch at 100 TB); intersection by
    * inclusion–exclusion, clamped at 0.
    *
    * Shape: one distinct (the data-sized stage, cached), per-group
    * bottom-k windows (partitioned), pair enumeration over the
    * group-DOMAIN (the q78 intended triangle — allowlisted), merges
    * by two equi-joins, and the exact audit legs are id-equi
    * self-joins. Error ~1.3/√k of the union size; `tolFrac` sets the
    * audit band (default 3/√k).
    */
  def kmvOverlap(
      df: DataFrame, groupCol: String, idCol: String,
      k: Int = 256, tolFrac: Double = -1.0): DataFrame = {
    require(k >= 16 && k <= 4096, "k in [16, 4096]")
    val tol = if (tolFrac > 0) tolFrac else 3.0 / math.sqrt(k.toDouble)
    val m = 1152921504606846976L // 2^60
    val distinct = df
      .select(col(groupCol).cast("string").as("__g"),
        col(idCol).cast("string").as("__id"))
      .where(col("__g").isNotNull && col("__id").isNotNull)
      .distinct()
      .withColumn("__h",
        conv(substring(md5(col("__id")), 1, 15), 16, 10).cast("long"))
      .transform(graft.core.CacheScope.disk)
    val w = Window.partitionBy("__g")
      .orderBy(col("__h").asc, col("__id").asc)
    val sketch = distinct
      .withColumn("__r", row_number().over(w)).where(col("__r") <= k)
      .select(col("__g"), col("__h"), col("__id"))
      .transform(graft.core.CacheScope.disk)
    val sizes = distinct.groupBy("__g").agg(count(lit(1)).as("__exact"))
      .transform(graft.core.CacheScope.disk)
    def estimate(nCol: Column, thetaCol: Column): Column =
      when(nCol < k, nCol.cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(m.toDouble)
          / thetaCol.cast("double"))
    val perGroup = sketch.groupBy("__g")
      .agg(count(lit(1)).as("__n"), max("__h").as("__theta"))
      .join(sizes, Seq("__g"))
      .select(col("__g"), col("__exact"),
        estimate(col("__exact"), col("__theta")).as("__est"))
      .transform(graft.core.CacheScope.disk)
    // group-domain pair enumeration (bounded by the label domain,
    // not provable from plan shape — allowlisted like q78)
    val pairs = perGroup.select(col("__g").as("__ga"),
        col("__exact").as("__ea"), col("__est").as("__esta"))
      .join(perGroup.select(col("__g").as("__gb"),
        col("__exact").as("__eb"), col("__est").as("__estb")),
        col("__ga") < col("__gb"))
    val mA = pairs.select(col("__ga"), col("__gb"))
      .join(sketch.withColumnRenamed("__g", "__ga"), Seq("__ga"))
    val mB = pairs.select(col("__ga"), col("__gb"))
      .join(sketch.withColumnRenamed("__g", "__gb"), Seq("__gb"))
    val merged = mA.select(col("__ga"), col("__gb"), col("__h"), col("__id"))
      .union(mB.select(col("__ga"), col("__gb"), col("__h"), col("__id")))
      .dropDuplicates("__ga", "__gb", "__h", "__id")
    val wu = Window.partitionBy("__ga", "__gb")
      .orderBy(col("__h").asc, col("__id").asc)
    val unions = merged.withColumn("__r", row_number().over(wu))
      .groupBy("__ga", "__gb")
      .agg(count(lit(1)).as("__un"),
        max(when(col("__r") === k, col("__h"))).as("__utheta"))
    val exactInt = distinct.select(col("__g").as("__ga"), col("__id"))
      .join(distinct.select(col("__g").as("__gb"), col("__id")),
        Seq("__id"))
      .where(col("__ga") < col("__gb"))
      .groupBy("__ga", "__gb").agg(count(lit(1)).as("__xint"))
    pairs
      .join(unions, Seq("__ga", "__gb"))
      .join(exactInt, Seq("__ga", "__gb"), "left")
      .select(col("__ga"), col("__gb"), col("__ea"), col("__eb"),
        coalesce(col("__xint"), lit(0L)).as("__xi"),
        (col("__ea") + col("__eb") - coalesce(col("__xint"), lit(0L)))
          .as("__xu"),
        col("__esta"), col("__estb"),
        when(col("__un") < k, col("__un").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(m.toDouble)
            / col("__utheta").cast("double")).as("__estu"))
      .select(col("__ga").as("group_a"), col("__gb").as("group_b"),
        col("__ea").as("exact_a"), col("__eb").as("exact_b"),
        col("__xi").as("exact_intersection"),
        col("__xu").as("exact_union"),
        round(col("__esta"), 4).as("est_a"),
        round(col("__estb"), 4).as("est_b"),
        round(col("__estu"), 4).as("est_union"),
        round(greatest(col("__esta") + col("__estb") - col("__estu"),
          lit(0.0)), 4).as("est_intersection"),
        (abs(greatest(col("__esta") + col("__estb") - col("__estu"),
            lit(0.0)) - col("__xi").cast("double")) <=
          lit(tol) * col("__xu").cast("double") + lit(2.0))
          .cast("int").as("within_tol"))
  }

  /** Bradley–Terry preference strengths — the pairwise-comparison
    * ranking model behind RLHF reward data, match outcomes, and A/B
    * preference panels: k rounds of the MM fixed point
    * pᵢ ← Wᵢ / Σⱼ mᵢⱼ/(pᵢ+pⱼ), normalized to mean 1 each round.
    *
    * Exactness (the [[markovStationary]] treatment): strengths live
    * in 1e6-unit BIGINTs; every per-pair denominator term quantizes
    * by `(m·S²) div (Pᵢ+Pⱼ)` BEFORE the per-item sum, and the update
    * and normalization are floor divisions — so the fixed point is
    * bit-identical across engines, partitionings and cluster sizes.
    * Positive-operand `div` (truncation) equals SQL `//` (floor), so
    * an oracle replays it verbatim. Int64 contract: per-pair
    * comparison counts m must satisfy m·10¹² < 2⁶³ (m < 9·10⁶ —
    * pre-aggregate or sample heavier panels).
    *
    * Shape: comparisons collapse map-side to the pair matrix (the
    * only data-sized stage); each round is two joins + one
    * aggregation over item/pair-domain-sized frames, lineage cut per
    * round by localCheckpoint. Items that never win floor at strength
    * 1 micro-unit (exactly-zero would divide a later pair by zero).
    */
  def bradleyTerry(
      comparisons: DataFrame, winnerCol: String, loserCol: String,
      iters: Int = 8): DataFrame = {
    require(iters >= 1 && iters <= 64, "iters in [1, 64]")
    val scale = 1000000L
    val s2 = scale * scale
    val c = comparisons
      .select(col(winnerCol).cast("string").as("__w"),
        col(loserCol).cast("string").as("__l"))
      .where(col("__w").isNotNull && col("__l").isNotNull &&
        col("__w") =!= col("__l"))
      .groupBy("__w", "__l").agg(count(lit(1)).as("__n"))
      .transform(graft.core.CacheScope.disk)
    val pairs = c.select(least(col("__w"), col("__l")).as("__a"),
        greatest(col("__w"), col("__l")).as("__b"), col("__n"))
      .groupBy("__a", "__b").agg(sum("__n").as("__m"))
      .transform(graft.core.CacheScope.disk)
    val wins = c.groupBy(col("__w").as("item"))
      .agg(sum("__n").as("__wn"))
    val items = c.select(col("__w").as("item"))
      .union(c.select(col("__l"))).distinct()
      .join(wins, Seq("item"), "left")
      .select(col("item"), coalesce(col("__wn"), lit(0L)).as("wins"))
      .transform(graft.core.CacheScope.disk)
    val nItems = items.count()
    val ncomp = pairs.select(col("__a").as("item"), col("__m"))
      .union(pairs.select(col("__b"), col("__m")))
      .groupBy("item").agg(sum("__m").as("n_comparisons"))
      .transform(graft.core.CacheScope.disk)
    var p = items.select(col("item"), lit(scale).as("__p"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val withP = pairs
        .join(p.select(col("item").as("__a"), col("__p").as("__pa")),
          Seq("__a"))
        .join(p.select(col("item").as("__b"), col("__p").as("__pb")),
          Seq("__b"))
        .withColumn("__t", expr(s"(__m * ${s2}L) div (__pa + __pb)"))
      val denom = withP.select(col("__a").as("item"), col("__t"))
        .union(withP.select(col("__b"), col("__t")))
        .groupBy("item").agg(sum("__t").as("__d"))
      val updated = items.join(denom, Seq("item"), "left")
        .select(col("item"),
          when(col("__d").isNotNull && col("wins") > 0,
            expr(s"(wins * ${s2}L) div __d")).otherwise(lit(0L))
            .as("__p0"))
      val tot = updated.agg(sum("__p0").as("__tot"))
      p = updated.crossJoin(broadcast(tot))
        .select(col("item"),
          greatest(
            expr(s"(__p0 * ${nItems}L * ${scale}L) div __tot"),
            lit(1L)).as("__p"))
        .localCheckpoint()
    }
    items.join(ncomp, Seq("item"), "left")
      .join(p, Seq("item"))
      .select(col("item"), col("wins"),
        coalesce(col("n_comparisons"), lit(0L)).as("n_comparisons"),
        col("__p").as("strength_micro"),
        round(col("__p").cast("double") / scale, 6).as("strength"))
  }

  /** Mixture-SPRT sequential monitor (Johari et al., "Peeking at A/B
    * tests") — the always-valid alternative to fixed-horizon tests:
    * per group, the cumulative conversion evidence at every period as
    * the Gaussian-mixture likelihood ratio
    * Λₙ = √(σ²/(σ²+n·τ²)) · exp(n²τ²(x̄−p₀)² / (2σ²(σ²+n·τ²)))
    * with the always-valid p-value min(1, 1/max_{m≤n} Λₘ) —
    * monotone, so "look every period" costs no α.
    *
    * Determinism: n and successes are exact BIGINT running sums
    * (rows-frame windows over a per-period pre-aggregation); x̄ and
    * the LOG likelihood ratio recompute per row from those integers
    * with literal σ², τ², p₀ in both engines. The statistic is
    * carried in LOG space on purpose: raw Λ reaches 10²⁰⁺ where
    * `round(·, 4)` can no longer absorb a 1-ulp exp() wobble, while
    * log Λ stays O(10¹) and the p-value exp(−max log Λ) is in [0, 1]
    * — both round-stable.
    *
    * Shape: rows collapse map-side to (group, period) counts; the
    * windows run over period-count-sized frames. One data-sized
    * shuffle.
    */
  def msprtMonitor(
      df: DataFrame, groupCol: String, periodCol: Column,
      labelCol: Column, p0: Double, tau2: Double,
      alpha: Double = 0.05): DataFrame = {
    require(p0 > 0 && p0 < 1, "p0 in (0, 1)")
    require(tau2 > 0, "tau2 must be positive")
    val s2 = p0 * (1.0 - p0)
    val base = df.select(col(groupCol).as("__g"),
        periodCol.cast("long").as("__p"),
        labelCol.cast("boolean").as("__y"))
      .where(col("__p").isNotNull && col("__y").isNotNull)
      .groupBy("__g", "__p")
      .agg(count(lit(1)).as("__c"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__s"))
    val w = Window.partitionBy("__g").orderBy("__p")
      .rowsBetween(Window.unboundedPreceding, 0)
    val nD = col("__cn").cast("double")
    val xbar = col("__cs").cast("double") / nD
    val llam = lit(0.5) * log(lit(s2) / (lit(s2) + nD * lit(tau2))) +
      ((nD * nD * lit(tau2) * (xbar - lit(p0)) * (xbar - lit(p0)))
        / (lit(2.0) * lit(s2) * (lit(s2) + nD * lit(tau2))))
    base
      .withColumn("__cn", sum("__c").over(w))
      .withColumn("__cs", sum("__s").over(w))
      .withColumn("__ll", llam)
      .withColumn("__llmax", max(col("__ll")).over(w))
      .select(col("__g").as(groupCol), col("__p").as("period"),
        col("__cn").as("n_cum"), col("__cs").as("pos_cum"),
        round(xbar, 6).as("rate"),
        round(col("__ll"), 4).as("log_lambda"),
        round(least(lit(1.0), exp(lit(0.0) - col("__llmax"))), 6)
          .as("always_valid_p"),
        (least(lit(1.0), exp(lit(0.0) - col("__llmax"))) < alpha)
          .cast("int").as("rejected_by_now"))
  }

  /** Per-node triangle count and local clustering coefficient over an
    * UNDIRECTED simple graph given as an edge list (either direction;
    * duplicate / self edges tolerated and dropped).
    *
    * Scale shape — degree-ordered orientation (the standard
    * distributed triangle-counting transform; cf. the node-iterator++
    * scheme in Suri & Vassilvitskii, "Counting Triangles and the Curse
    * of the Last Reducer", WWW'11): canonicalize to `a < b` distinct
    * edges, compute degrees, then orient every edge from its lower
    * `(degree, id)` endpoint to the higher one. Wedges are enumerated
    * by self-joining the ORIENTED list on the source, so a hub of
    * degree d contributes `outdeg²` wedges with `outdeg = O(√E)` by
    * the orientation bound — the naive all-orientations join pays
    * `deg²` on every hub, which is the term that kills co-occurrence
    * graphs at scale (a part appearing in 10⁶ orders has deg ~10⁶).
    * Each triangle is produced exactly once (its corners appear in
    * `(deg, id)` order), then exploded back to the three corners for
    * the per-node counts — one aggregation, map-side combinable.
    *
    * Exactness: counts are exact longs; `coeff = 2·T(v) /
    * (deg(v)·(deg(v)−1))` is one division of two exact longs — the
    * same two longs give the same double in every engine.
    *
    * Returns `(node, degree, triangles, coeff)`, nodes of degree ≥ 1.
    */
  def triangleCounts(
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val raw = edges.select(
        col(srcCol).cast("long").as("__x"),
        col(dstCol).cast("long").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull &&
        col("__x") =!= col("__y"))
    // canonical undirected edge set: consumed by degrees AND the
    // orientation join — persist or the upstream pair generator (often
    // a self-join on a fact table) re-executes per consumer
    val und = raw.select(
        least(col("__x"), col("__y")).as("__a"),
        greatest(col("__x"), col("__y")).as("__b"))
      .distinct()
      .transform(graft.core.CacheScope.disk)
    val deg = und.select(col("__a").as("node"))
      .union(und.select(col("__b")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
      .transform(graft.core.CacheScope.disk)
    // orient: src = endpoint with the smaller (degree, id); carry the
    // destination's (degree, id) so the wedge join can order the two
    // far endpoints without re-joining degrees
    val withDeg = und
      .join(deg.select(col("node").as("__a"), col("degree").as("__da")),
        Seq("__a"))
      .join(deg.select(col("node").as("__b"), col("degree").as("__db")),
        Seq("__b"))
    val aFirst = col("__da") < col("__db") ||
      (col("__da") === col("__db") && col("__a") < col("__b"))
    val oriented = withDeg.select(
        when(aFirst, col("__a")).otherwise(col("__b")).as("__s"),
        when(aFirst, col("__b")).otherwise(col("__a")).as("__d"),
        when(aFirst, col("__db")).otherwise(col("__da")).as("__dd"))
      .transform(graft.core.CacheScope.disk)
    // wedges at s: far endpoints ordered by the SAME (degree, id)
    // total order the orientation used, so the closing edge (d1 → d2)
    // — if present — is oriented exactly that way and one equi-join
    // probe decides it
    val w2 = oriented.select(col("__s"), col("__d").as("__d2"),
      col("__dd").as("__dd2"))
    val wedges = oriented.join(w2, Seq("__s"))
      .where(col("__dd") < col("__dd2") ||
        (col("__dd") === col("__dd2") && col("__d") < col("__d2")))
      .select(col("__s"), col("__d"), col("__d2"))
    val triangles = wedges.join(
        oriented.select(col("__s").as("__d"), col("__d").as("__d2")),
        Seq("__d", "__d2"))
    val perNode = triangles
      .select(explode(array(col("__s"), col("__d"), col("__d2")))
        .as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        // degree-1 nodes: 0 triangles over 0 wedges — pin 0.0, never
        // a 0/0 NaN (engines disagree on double 0/0 rendering)
        when(col("degree") < 2, lit(0.0)).otherwise(round(
          (coalesce(col("triangles"), lit(0L)) * 2.0) /
            (col("degree") * (col("degree") - lit(1L)))
            .cast("double"), 6)).as("coeff"))
  }

  /** Link prediction by the Resource-Allocation index (Zhou, Lü &
    * Zhang, EPJ B 2009): for every NON-adjacent pair `(x, y)` with at
    * least one common neighbor, `RA(x,y) = Σ_w 1/deg(w)` over common
    * neighbors `w` — the "which edges are missing" score behind
    * co-purchase recommendation and knowledge-graph completion. RA is
    * the exact-arithmetic member of the common-neighbor family: the
    * per-wedge weight quantizes to `1e6 div deg(w)` micro-units
    * (integer division of exact longs), so the summed score is an
    * exact BIGINT — bit-identical across engines and partitionings,
    * where Adamic-Adar's `1/ln(deg)` would ride on libm's last ulp.
    *
    * Scale shape: wedges are enumerated from the adjacency list
    * center-out — `deg(w)²` pairs per center `w` — so super-hub
    * centers dominate cost while contributing the LEAST per-pair
    * weight (1/deg). `maxCenterDeg` drops centers above the cutoff
    * (the published practice for RA/AA at scale; the dropped weight
    * is ≤ 1/maxCenterDeg per wedge). Candidate pairs then anti-join
    * the existing edge set, and the final top-k is a
    * TakeOrderedAndProject, never a global sort.
    *
    * Returns `(node_a, node_b, common_neighbors, ra_micro)` — the
    * `k` highest-scoring non-adjacent pairs, ties broken by
    * `(node_a, node_b)`.
    */
  def resourceAllocationScores(
      edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, maxCenterDeg: Int = 1024): DataFrame = {
    require(k >= 1, "k must be positive")
    require(maxCenterDeg >= 2, "maxCenterDeg must be >= 2")
    val raw = edges.select(
        col(srcCol).cast("long").as("__x"),
        col(dstCol).cast("long").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull &&
        col("__x") =!= col("__y"))
    val und = raw.select(
        least(col("__x"), col("__y")).as("__a"),
        greatest(col("__x"), col("__y")).as("__b"))
      .distinct()
      .transform(graft.core.CacheScope.disk)
    val adj = und.select(col("__a").as("__w"), col("__b").as("__n"))
      .union(und.select(col("__b"), col("__a")))
    val deg = adj.groupBy("__w").agg(count(lit(1)).as("__deg"))
    // centers: degree-capped, weight pre-quantized once per center
    val centers = adj.join(
        deg.where(col("__deg") <= maxCenterDeg &&
          col("__deg") >= 2), Seq("__w"))
      .withColumn("__wt", expr("1000000 div __deg"))
      .transform(graft.core.CacheScope.disk)
    val far = centers.select(col("__w"), col("__n").as("__n2"))
    val cand = centers.join(far, Seq("__w"))
      .where(col("__n") < col("__n2"))
      .groupBy(col("__n").as("__a"), col("__n2").as("__b"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum(col("__wt")).as("ra_micro"))
    val nonEdges = cand.join(und, Seq("__a", "__b"), "left_anti")
    topK(nonEdges, col("ra_micro"), k, col("__a"), col("__b"))
      .select(col("__a").as("node_a"), col("__b").as("node_b"),
        col("common_neighbors"), col("ra_micro"))
  }

  /** k-core decomposition (the `k`-slice): the maximal subgraph in
    * which every node has degree ≥ `k` within the subgraph, by the
    * classic iterative peel — drop every node with current degree
    * < `k`, restrict the edges to survivors, repeat until a round
    * removes nothing. The k-core is the standard "dense engagement
    * backbone" cut (community cores, spam-ring detection, influence
    * seeding) that plain degree thresholding gets wrong: a degree-k
    * node whose neighbors all peel away is NOT core.
    *
    * Scale shape: each round is one grouped degree count plus two
    * semi-joins of the edge list against the (one row per node)
    * survivor set — all shuffle-partitioned by node id, no driver
    * data. Edges are `localCheckpoint`ed per round to truncate the
    * iterative lineage (the [[graft.dedup.ConnectedComponents]]
    * treatment), and the fixpoint test is a distributed count of
    * removed nodes. Peeling is MONOTONE (survivor sets only shrink,
    * and a stable round stays stable), so running extra rounds past
    * the fixpoint is a no-op — `maxRounds` only matters if the loop
    * is cut off early, which the returned flag exposes. Rounds needed
    * = number of "onion layers" below the core, ≤ peel depth of the
    * graph — single digits on co-occurrence graphs, never the node
    * count.
    *
    * Returns `(labels, converged)` where labels = `(node, core_degree)`
    * for the surviving nodes (`core_degree` = degree within the
    * k-core, ≥ k at a fixpoint). Self-loops and duplicate/reversed
    * edges are canonicalized away first.
    */
  def kCore(
      edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxRounds: Int = 30): (DataFrame, Boolean) = {
    require(k >= 1, "k must be positive")
    require(maxRounds >= 1, "maxRounds must be positive")
    val raw = edges.select(
        col(srcCol).cast("long").as("__x"),
        col(dstCol).cast("long").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull &&
        col("__x") =!= col("__y"))
    var cur = raw.select(
        least(col("__x"), col("__y")).as("__a"),
        greatest(col("__x"), col("__y")).as("__b"))
      .distinct()
      .localCheckpoint(true)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      // LAZY checkpoint + count = ONE action per round: the fixpoint
      // count is the job that materializes the checkpointed degree
      // partitions (count computes every partition, so the checkpoint
      // is complete), and the keep-filter below reads the stored
      // partitions — an eager checkpoint here would run a second,
      // redundant materialization job every round
      val deg = cur.select(col("__a").as("node"))
        .union(cur.select(col("__b")))
        .groupBy("node").agg(count(lit(1)).as("__deg"))
        .localCheckpoint(false)
      val removed = deg.where(col("__deg") < k).count()
      if (removed == 0) {
        converged = true
      } else {
        val keep = deg.where(col("__deg") >= k).select("node")
        cur = cur
          .join(keep.withColumnRenamed("node", "__a"), Seq("__a"),
            "left_semi")
          .join(keep.withColumnRenamed("node", "__b"), Seq("__b"),
            "left_semi")
          .localCheckpoint(true)
      }
      rounds += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"kCore did not reach a fixpoint within $maxRounds rounds; " +
          "the returned set is a SUPERSET of the k-core (raise " +
          "maxRounds)")
    val labels = cur.select(col("__a").as("node"))
      .union(cur.select(col("__b")))
      .groupBy("node").agg(count(lit(1)).as("core_degree"))
    (labels, converged)
  }

  /** Synchronous label propagation (LPA) community detection — the
    * cheap community cut between [[kCore]]'s density slice and
    * [[graft.dedup.ConnectedComponents]]'s reachability classes: every
    * node starts as its own label, and each round every node adopts
    * the MOST COMMON label among its neighbors (ties → the smallest
    * label; isolated label states impossible — every node in an edge
    * has neighbors). Communities are dense neighborhoods that out-vote
    * their boundary, which CC (one bridge merges everything) and
    * k-core (a fixed global k) both miss.
    *
    * Determinism is the design constraint, as everywhere in this
    * registry: updates are SYNCHRONOUS (all nodes switch on the same
    * round's labels — asynchronous LPA is schedule-dependent) and the
    * per-node vote argmax is pinned by (count desc, label asc), so a
    * fixed `rounds` run is a pure function of the edge set and the
    * DuckDB oracle can unroll it round by round. Fixed rounds rather
    * than a convergence test on purpose: sync LPA can 2-cycle on
    * bipartite-ish structures (the known oscillation), so "run k
    * rounds" IS the published stopping rule for the sync variant.
    *
    * Scale shape: per round, one join of the (node-partitioned)
    * adjacency against the one-row-per-node label frame, one
    * (node, label) grouped count (map-side combined — a hub's votes
    * pre-aggregate per partition), and one per-node argmax window over
    * groups bounded by the node's DISTINCT neighbor-label count
    * (≤ degree, shrinking as communities coalesce). Labels
    * `localCheckpoint` per round to truncate the iterative lineage —
    * the [[kCore]] treatment. No driver-side data, rounds fixed.
    *
    * Returns `(node, community)` — `community` is the round-`rounds`
    * label (a member node id; NOT canonicalized to the component
    * minimum, communities are finer than components).
    */
  def labelPropagation(
      edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be positive")
    val und = edges.select(
        col(srcCol).cast("long").as("__x"),
        col(dstCol).cast("long").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull &&
        col("__x") =!= col("__y"))
      .select(least(col("__x"), col("__y")).as("__a"),
        greatest(col("__x"), col("__y")).as("__b"))
      .distinct()
    val adj = und
      .select(col("__a").as("node"), col("__b").as("nbr"))
      .union(und.select(col("__b"), col("__a")))
      .localCheckpoint(true)
    var labels = adj.select(col("node")).distinct()
      .withColumn("community", col("node"))
      .localCheckpoint(true)
    var r = 0
    while (r < rounds) {
      val votes = adj
        .join(labels.withColumnRenamed("node", "nbr"), Seq("nbr"))
        .groupBy("node", "community")
        .agg(count(lit(1)).as("__votes"))
      val w = Window.partitionBy("node")
        .orderBy(col("__votes").desc, col("community").asc)
      labels = votes
        .withColumn("__r", row_number().over(w))
        .where(col("__r") === 1)
        .select("node", "community")
        .localCheckpoint(true)
      r += 1
    }
    labels
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

  /** Newman modularity of a community labeling — the quality score
    * that closes the community-detection loop ([[labelPropagation]]
    * proposes, modularity judges): per community,
    * `q_c = e_c/m − (d_c/2m)²` — internal-edge share minus the share
    * a degree-preserving random graph would give it. Positive
    * contributions mean denser-than-chance; Σ q_c is the labeling's
    * modularity Q ∈ [−0.5, 1].
    *
    * Exact integer arithmetic end-to-end: with m total undirected
    * edges, `q_c·4m² = 4·m·e_c − d_c²` is an exact integer identity,
    * so each community's contribution is computed as
    * `(4·m·e_c − d_c²)·1e6 div 4m²` in DECIMAL(38,0) (products of two
    * edge-count-sized BIGINTs overflow 2^63 at ~10⁹ edges — decimal
    * carries them exactly; the micro result is BIGINT again).
    * Contributions can be NEGATIVE (sparser than chance); integer
    * division truncates TOWARD ZERO in BOTH engines (Spark
    * IntegralDivide and DuckDB `//` agree on negatives — verified;
    * this is the registry's one site where a negative `div` operand
    * is load-bearing), so each community's µ-value is
    * exact-to-truncation and Σ contributions tracks the real Q
    * within |communities| µ-units.
    *
    * Scale shape: one join of the canonical edge list against the
    * labels per endpoint (node-keyed), one community-keyed count for
    * e_c (only same-community edges survive the filter), one for d_c
    * — every aggregate map-side combined, output community-sized.
    *
    * Returns `(community, n_nodes, internal_edges, degree_sum,
    * q_contrib_micro)`; unlabeled endpoints fail loudly via an inner
    * join count contract — callers label every node (the
    * [[labelPropagation]] output does by construction).
    */
  def modularityScore(
      edges: DataFrame, srcCol: String, dstCol: String,
      labels: DataFrame): DataFrame = {
    val und = edges.select(
        col(srcCol).cast("long").as("__x"),
        col(dstCol).cast("long").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull &&
        col("__x") =!= col("__y"))
      .select(least(col("__x"), col("__y")).as("__a"),
        greatest(col("__x"), col("__y")).as("__b"))
      .distinct()
      .transform(graft.core.CacheScope.disk)
    val lab = labels.select(col("node"), col("community"))
    val labeled = und
      .join(lab.select(col("node").as("__a"),
        col("community").as("__ca")), Seq("__a"))
      .join(lab.select(col("node").as("__b"),
        col("community").as("__cb")), Seq("__b"))
      .transform(graft.core.CacheScope.disk)
    val m = labeled.agg(count(lit(1)).as("__m"))
    val eIn = labeled.where(col("__ca") === col("__cb"))
      .groupBy(col("__ca").as("community"))
      .agg(count(lit(1)).as("internal_edges"))
    val deg = labeled
      .select(col("__a").as("node"), col("__ca").as("community"))
      .union(labeled.select(col("__b"), col("__cb")))
      .groupBy("node", "community")
      .agg(count(lit(1)).as("__d"))
    val dSum = deg.groupBy("community")
      .agg(count(lit(1)).as("n_nodes"), sum(col("__d")).as("degree_sum"))
    dSum.join(eIn, Seq("community"), "left")
      .withColumn("internal_edges",
        coalesce(col("internal_edges"), lit(0L)))
      .crossJoin(broadcast(m))
      .withColumn("q_contrib_micro",
        expr("cast((4 * cast(__m as decimal(38,0)) * internal_edges" +
          " - cast(degree_sum as decimal(38,0)) * degree_sum)" +
          " * 1000000 div (4 * cast(__m as decimal(38,0)) * __m)" +
          " as long)"))
      .select("community", "n_nodes", "internal_edges", "degree_sum",
        "q_contrib_micro")
  }

  /** Benford first-significant-digit audit — the forensic-accounting
    * screen for fabricated or mis-binned amounts: per group, the
    * observed distribution of the leading digit of an exact integer
    * amount vs Benford's law (P(d) = log10(1 + 1/d)), with the
    * per-digit deviation and the group's chi-square statistic.
    *
    * `amountCol` must be a positive BIGINT (amounts pre-scaled to
    * cents by the caller) — the leading digit is the first character
    * of the decimal rendering of an integer, which both the engine
    * and any SQL oracle produce identically; extracting the digit
    * from a DOUBLE rendering would be engine-dependent (scientific
    * notation cutoffs differ). Non-positive / null amounts are
    * excluded and reported per group as `n_excluded`.
    *
    * Shape: one grouped count per (group, digit) — map-side combined,
    * ≤10 rows per group out — densified against a (group × digit)
    * grid (group-count-sized generate + one small join) so absent
    * digits report exact zero counts. Chi-square re-aggregates the
    * 9-row frame per group: cost is group-count-sized, not
    * data-sized. At 100 TB this is one shuffle of ≤10·|groups| rows.
    */
  def benfordAudit(
      df: DataFrame, groupCol: String, amountCol: Column): DataFrame = {
    val base = df.select(col(groupCol).as("__g"),
        amountCol.cast("long").as("__v"))
      .withColumn("__d",
        when(col("__v") > 0,
          substring(col("__v").cast("string"), 1, 1).cast("int")))
    val counts = base
      .groupBy(col("__g"), col("__d"))
      .agg(count(lit(1)).as("__n"))
      .transform(graft.core.CacheScope.disk)
    val perGroup = counts.groupBy("__g")
      .agg(sum(when(col("__d").isNotNull, col("__n")).otherwise(0L))
          .as("__tot"),
        sum(when(col("__d").isNull, col("__n")).otherwise(0L))
          .as("__nexcl"))
    // densify: every group gets all nine digit rows, absent → 0
    val longDigits = perGroup
      .select(col("__g"), col("__tot"), col("__nexcl"),
        explode(sequence(lit(1), lit(9))).as("digit"))
      .join(counts.where(col("__d").isNotNull)
          .withColumnRenamed("__d", "digit"),
        Seq("__g", "digit"), "left")
      .select(col("__g"), col("digit"),
        coalesce(col("__n"), lit(0L)).as("n"),
        col("__nexcl").as("n_excluded"), col("__tot"))
    val withTotal = longDigits
    // expected share is a literal per digit: log10(1+1/d) spelled as
    // an exact double literal so the oracle can repeat it verbatim
    val expectedShare = (1 to 9)
      .map(d => d -> math.log10(1.0 + 1.0 / d)).toMap
    val expCol = (1 to 9).foldLeft(lit(null).cast("double")) {
      case (acc, d) =>
        when(col("digit") === d, lit(expectedShare(d))).otherwise(acc)
    }
    val perDigit = withTotal
      .withColumn("__exp", expCol * col("__tot").cast("double"))
      .transform(graft.core.CacheScope.disk)
    val chi = perDigit.groupBy(col("__g"))
      .agg(sum((col("n").cast("double") - col("__exp"))
          * (col("n").cast("double") - col("__exp")) / col("__exp"))
        .as("__chi2"))
    perDigit.join(broadcast(chi), Seq("__g"))
      .select(col("__g").as(groupCol), col("digit"), col("n"),
        col("n_excluded"),
        round(col("__exp"), 4).as("expected_n"),
        round(col("n").cast("double") / col("__tot").cast("double"), 6)
          .as("share"),
        round(col("__chi2"), 4).as("chi2"))
  }

  /** Market-concentration report per group: Herfindahl–Hirschman
    * index, top-1/top-3 entity share, and effective number of
    * entities (1/HHI) over an exact integer value column (cents).
    *
    * Exactness: entity shares quantize to micro-units
    * (s_i = floor(1e6·v_i / Σv), BIGINT), so Σs_i² ≤ (Σs_i)² ≤ 1e12
    * fits BIGINT exactly regardless of data scale — the HHI is a
    * deterministic integer ratio, not an order-dependent double sum.
    * Top-k shares ride the same quantized units via a rank window.
    *
    * Shape: one grouped sum per (group, entity) — map-side combined —
    * then one window rank and one re-aggregation per group, all over
    * entity-count-sized frames. Entities with non-positive totals are
    * kept (their share floors at ≤ 0 momentum toward 0); null
    * entities are excluded.
    */
  def concentrationReport(
      df: DataFrame, groupCol: String, entityCol: String,
      valueCol: Column): DataFrame = {
    val sums = df
      .where(col(entityCol).isNotNull)
      .groupBy(col(groupCol).as("__g"), col(entityCol).as("__e"))
      .agg(sum(valueCol.cast("long")).as("__v"))
    val tot = sums.groupBy("__g")
      .agg(sum(col("__v")).as("__tv"), count(lit(1)).as("__ne"))
    val shares = sums.join(broadcast(tot), Seq("__g"))
      .withColumn("__s",
        floor(lit(1000000L) * col("__v").cast("double")
          / col("__tv").cast("double")).cast("long"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("__g"))
          .orderBy(col("__v").desc, col("__e"))))
    shares.groupBy(col("__g"))
      .agg(max(col("__ne")).as("n_entities"),
        sum(col("__s") * col("__s")).as("__hhi2"),
        max(when(col("__rk") === 1, col("__s"))).as("__top1"),
        sum(when(col("__rk") <= 3, col("__s")).otherwise(0L))
          .as("__top3"))
      .select(col("__g").as(groupCol), col("n_entities"),
        round(col("__top1").cast("double") / 1e6, 6).as("top1_share"),
        round(col("__top3").cast("double") / 1e6, 6).as("top3_share"),
        round(col("__hhi2").cast("double") / 1e12, 6).as("hhi"),
        round(lit(1e12) / col("__hhi2").cast("double"), 4)
          .as("effective_n"))
  }

  /** Kaplan–Meier survival curve per group: at each distinct event
    * time t, the number at risk, events, censorings, and the product-
    * limit survival estimate S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ).
    *
    * Determinism across engines: every input to the float math is an
    * exact integer (at-risk and event counts from one grouped count +
    * a window), each step factor (nᵢ−dᵢ)/nᵢ is ONE correctly-rounded
    * IEEE division, and the running product is an explicit ordered
    * left fold over the group's factor array — IEEE multiply is
    * correctly rounded, so any engine folding the same factors in the
    * same order produces bit-identical doubles (no exp/log detour,
    * whose transcendental rounding is engine-specific).
    *
    * Shape: events collapse to one row per (group, time) map-side;
    * at-risk counts come from a running sum window over that
    * timepoint frame (timepoint-sized, not subject-sized); the fold
    * materializes one sorted factor array per group and computes the
    * k running products by prefix-slice folds — O(k) memory and
    * O(k²) multiplies per group, guarded by `maxTimepoints`
    * (default 10⁴ ≈ 27 years of daily granularity: 10⁸ multiplies
    * worst-case, sub-second). Subjects, however, are unbounded:
    * nothing upstream of the timepoint collapse holds per-subject
    * state.
    */
  def kaplanMeier(
      df: DataFrame, groupCol: String, durationCol: Column,
      eventCol: Column, maxTimepoints: Int = 10000): DataFrame = {
    val base = df.select(col(groupCol).as("__g"),
        durationCol.cast("long").as("__t"),
        eventCol.cast("boolean").as("__e"))
      .where(col("__t").isNotNull && col("__t") >= 0)
    val byTime = base.groupBy("__g", "__t")
      .agg(sum(when(col("__e"), 1L).otherwise(0L)).as("__d"),
        sum(when(col("__e"), 0L).otherwise(1L)).as("__c"))
    val w = Window.partitionBy("__g").orderBy("__t")
    // at risk at t = subjects whose duration >= t = group total minus
    // everything that left strictly before t
    val risked = byTime
      .withColumn("__tot", sum(col("__d") + col("__c"))
        .over(Window.partitionBy("__g")))
      .withColumn("__gone", coalesce(
        sum(col("__d") + col("__c"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", col("__tot") - col("__gone"))
      .withColumn("__f",
        (col("__n") - col("__d")).cast("double")
          / col("__n").cast("double"))
    // one sorted row-array per group; running product i = left fold
    // of the first i factors (slice is 1-based)
    val grouped = risked.groupBy(col("__g"))
      .agg(sort_array(collect_list(struct(col("__t"), col("__n"),
        col("__d"), col("__c"), col("__f")))).as("__rows"))
      .withColumn("__rows",
        when(size(col("__rows")) > maxTimepoints,
          raise_error(lit("kaplanMeier: distinct event times per " +
            "group exceed maxTimepoints; coarsen the duration " +
            "granularity")).cast("array<struct<__t:bigint," +
            "__n:bigint,__d:bigint,__c:bigint,__f:double>>"))
          .otherwise(col("__rows")))
    grouped
      .select(col("__g"), posexplode(col("__rows")).as(Seq("__i", "__r")),
        col("__rows"))
      .withColumn("__surv",
        aggregate(
          slice(col("__rows").getField("__f"), lit(1), col("__i") + 1),
          lit(1.0d), (acc, x) => acc * x))
      .select(col("__g").as(groupCol), col("__r.__t").as("t"),
        col("__r.__n").as("n_at_risk"), col("__r.__d").as("n_events"),
        col("__r.__c").as("n_censored"),
        round(col("__surv"), 6).as("survival"))
  }

  /** Exact ROC-AUC per group via the Mann–Whitney U statistic: the
    * probability a random positive outscores a random negative, ties
    * counting half — the rank-sum identity, never the O(n²) pair join.
    *
    * Exactness: rows collapse to one per (group, distinct score) with
    * positive/negative counts (map-side combined), a running window
    * sum gives each tie block the negatives strictly below it, and
    * `U·2 = Σ np·(2·negBelow + nn)` stays in BIGINT (the `+nn` term IS
    * the tie half-credit, doubled). AUC and the Gini index (2·AUC−1)
    * are each ONE double division at the end — the only float math.
    * Degenerate groups (no positives or no negatives) report null AUC
    * rather than an IEEE Infinity/NaN that would poison a downstream
    * aggregate.
    *
    * Shape: one grouped count (full shuffle, map-side combined) to
    * distinct-score-sized frames, then a per-group window and a
    * re-aggregation over those — cost scales with distinct scores,
    * not rows. At 100 TB with a continuous score the distinct-score
    * frame is still row-sized worst-case; pre-quantizing the score
    * (e.g. to 1e-6) bounds it with negligible AUC movement.
    */
  def rocAuc(
      df: DataFrame, groupCol: String, scoreCol: Column,
      labelCol: Column): DataFrame = {
    val base = df.select(col(groupCol).as("__g"),
        scoreCol.as("__s"), labelCol.cast("boolean").as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
    val byScore = base.groupBy("__g", "__s")
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("__np"),
        sum(when(col("__y"), 0L).otherwise(1L)).as("__nn"))
    val w = Window.partitionBy("__g").orderBy("__s")
    val u = byScore
      .withColumn("__below", coalesce(
        sum(col("__nn")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .groupBy("__g")
      .agg(sum(col("__np")).as("n_pos"), sum(col("__nn")).as("n_neg"),
        sum(col("__np") * (lit(2L) * col("__below") + col("__nn")))
          .as("__u2"))
    u.select(col("__g").as(groupCol), col("n_pos"), col("n_neg"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        round(col("__u2").cast("double")
          / (lit(2.0) * col("n_pos").cast("double")
            * col("n_neg").cast("double")), 6)).as("auc"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        round(col("__u2").cast("double")
          / (col("n_pos").cast("double") * col("n_neg").cast("double"))
          - lit(1.0), 6)).as("gini_idx"))
  }

  /** Per-group decile gains/lift table — the model-evaluation ranking
    * report: within each group, units ranked by score descending are
    * cut into `buckets` equal-frequency bins (ntile; ties broken by
    * `tieCol` so the cut is deterministic and engine-portable), and
    * each bin reports its response rate, cumulative capture of the
    * group's responders ("gain"), and lift vs the group's base rate.
    *
    * Exactness: every statistic is a ratio of BIGINT counts — ONE
    * double division each at the end. ntile's fill rule (the first
    * `n mod buckets` bins get the extra row) is identical in Spark
    * and ANSI SQL engines, so the binning itself is exact.
    *
    * Shape: the ntile window is PARTITIONED by group (a global cut
    * would be one unbounded single-task window — the shape
    * `rankByRange` exists to avoid; callers wanting a whole-
    * population table pass a constant group at their own scale), then
    * one grouped count to a (groups × buckets)-sized frame and
    * windows over its ≤ `buckets` rows per group. One scan, one
    * data-sized shuffle.
    */
  def gainsTable(
      df: DataFrame, groupCol: String, scoreCol: Column,
      labelCol: Column, tieCol: Column, buckets: Int = 10): DataFrame = {
    require(buckets >= 2, "gainsTable: need at least 2 buckets")
    val base = df.select(col(groupCol).as("__g"), scoreCol.as("__s"),
        labelCol.cast("boolean").as("__y"), tieCol.as("__id"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
      .withColumn("__b", ntile(buckets).over(
        Window.partitionBy("__g").orderBy(col("__s").desc, col("__id"))))
    val per = base.groupBy(col("__g"), col("__b").as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"))
    val w = Window.partitionBy("__g").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.partitionBy("__g").rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    per
      .withColumn("__cn", sum(col("n")).over(w))
      .withColumn("__cp", sum(col("n_pos")).over(w))
      .withColumn("__tn", sum(col("n")).over(tot))
      .withColumn("__tp", sum(col("n_pos")).over(tot))
      .select(col("__g").as(groupCol), col("bucket"), col("n"),
        col("n_pos"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("response_rate"),
        round(col("__cp").cast("double") / col("__tp").cast("double"), 6)
          .as("cum_gain"),
        round((col("n_pos").cast("double") / col("n").cast("double"))
          / (col("__tp").cast("double") / col("__tn").cast("double")), 6)
          .as("lift"),
        round((col("__cp").cast("double") / col("__cn").cast("double"))
          / (col("__tp").cast("double") / col("__tn").cast("double")), 6)
          .as("cum_lift"))
  }

  /** CUSUM level-shift detection per group over a dense integer
    * period grid: row counts per (group, period), gaps zero-filled
    * (the resample lesson — a silent month IS a signal), deviations
    * from the group mean accumulated one-sidedly in both directions,
    * with a √mean-scaled decision threshold.
    *
    * Exactness: the recurrence S⁺ᵢ = max(0, S⁺ᵢ₋₁ + dᵢ) is computed
    * by its prefix identity S⁺ᵢ = csᵢ − min(0, min_{j≤i} csⱼ) — pure
    * window functions, no sequential fold. Deviations are scaled to
    * whole units `dᵢ = n·cᵢ − Σc` (BIGINT; exact mean-centering with
    * no division), so the entire accumulation is integer; the final
    * report divides by n once. Needs `periods · Σcount < 2⁶³` —
    * ~9·10¹⁸ row-periods, comfortably above any monthly grid.
    *
    * Shape: rows collapse map-side to (group, period) counts; the
    * dense grid generates from a group-sized bounds frame; windows
    * run over period-count-sized frames per group. At 100 TB the
    * only data-sized stage is the first grouped count.
    */
  def cusumShift(
      df: DataFrame, groupCol: String, periodCol: Column,
      threshold: Double = 5.0): DataFrame = {
    val counts = df.select(col(groupCol).as("__g"),
        periodCol.cast("long").as("__p"))
      .where(col("__p").isNotNull)
      .groupBy("__g", "__p").agg(count(lit(1)).as("__c"))
    val bounds = counts.groupBy("__g")
      .agg(min("__p").as("__lo"), max("__p").as("__hi"))
    val grid = bounds.select(col("__g"),
      explode(sequence(col("__lo"), col("__hi"))).as("__p"))
    val dense = grid.join(counts, Seq("__g", "__p"), "left")
      .select(col("__g"), col("__p"),
        coalesce(col("__c"), lit(0L)).as("__c"))
    val tot = dense.groupBy("__g")
      .agg(sum("__c").as("__tot"), count(lit(1)).as("__n"))
    val w = Window.partitionBy("__g").orderBy("__p")
      .rowsBetween(Window.unboundedPreceding, 0)
    val stepped = dense.join(broadcast(tot), Seq("__g"))
      .withColumn("__d", col("__c") * col("__n") - col("__tot"))
      .withColumn("__cs", sum(col("__d")).over(w))
      .withColumn("__sp",
        col("__cs") - least(min(col("__cs")).over(w), lit(0L)))
      .withColumn("__sn",
        greatest(max(col("__cs")).over(w), lit(0L)) - col("__cs"))
    val h = lit(threshold) * sqrt(col("__tot").cast("double")
      / col("__n").cast("double"))
    stepped.select(col("__g").as(groupCol), col("__p").as("period"),
      col("__c").as("n"),
      round(col("__sp").cast("double") / col("__n").cast("double"), 4)
        .as("cusum_pos"),
      round(col("__sn").cast("double") / col("__n").cast("double"), 4)
        .as("cusum_neg"),
      (col("__sp").cast("double") / col("__n").cast("double") > h)
        .cast("int").as("shift_up"),
      (col("__sn").cast("double") / col("__n").cast("double") > h)
        .cast("int").as("shift_down"))
  }

  /** Fixed-target CUSUM per group — the STREAMABLE variant of
    * [[cusumShift]]: deviations accumulate against a caller-supplied
    * reference rate (`targetMilli` milli-events per period) instead
    * of the realized mean, so the statistic needs no second pass over
    * the data and a streaming monitor can maintain it with O(1) state
    * per group ([[graft.streaming.EventStreams.cusumStream]] is the
    * twin; the spec pins row equality).
    *
    * Fully integer: dᵢ = 1000·cᵢ − targetMilli, the prefix identity
    * gives both one-sided sums in BIGINT, and the decision compares
    * against `hMilli` exactly — no floats anywhere, so batch and
    * stream agree bit-for-bit by construction.
    *
    * Same dense-grid shape as [[cusumShift]]: gap periods are zeros,
    * grid spans the group's observed min..max period.
    */
  def cusumFixedTarget(
      df: DataFrame, groupCol: String, periodCol: Column,
      targetMilli: Long, hMilli: Long): DataFrame = {
    val counts = df.select(col(groupCol).as("__g"),
        periodCol.cast("long").as("__p"))
      .where(col("__p").isNotNull)
      .groupBy("__g", "__p").agg(count(lit(1)).as("__c"))
    val bounds = counts.groupBy("__g")
      .agg(min("__p").as("__lo"), max("__p").as("__hi"))
    val dense = bounds
      .select(col("__g"), explode(sequence(col("__lo"), col("__hi")))
        .as("__p"))
      .join(counts, Seq("__g", "__p"), "left")
      .select(col("__g"), col("__p"),
        coalesce(col("__c"), lit(0L)).as("__c"))
    val w = Window.partitionBy("__g").orderBy("__p")
      .rowsBetween(Window.unboundedPreceding, 0)
    dense
      .withColumn("__cs",
        sum(col("__c") * lit(1000L) - lit(targetMilli)).over(w))
      .withColumn("__sp",
        col("__cs") - least(min(col("__cs")).over(w), lit(0L)))
      .withColumn("__sn",
        greatest(max(col("__cs")).over(w), lit(0L)) - col("__cs"))
      .select(col("__g").as(groupCol), col("__p").as("period"),
        col("__c").as("n"),
        col("__sp").as("cusum_pos_milli"),
        col("__sn").as("cusum_neg_milli"),
        (col("__sp") > hMilli).cast("int").as("shift_up"),
        (col("__sn") > hMilli).cast("int").as("shift_down"))
  }

  /** Single change-point locator per group (binary segmentation,
    * first split): the CUSUM-bridge argmax
    * t* = argmax_t |cs_t − t·Σc/n| over the dense period grid —
    * WHERE the level most plausibly shifted, complementing
    * [[cusumShift]]'s WHETHER/WHEN-detected. Emits the split index,
    * its period, the before/after means, and the bridge height both
    * raw and √S̄-scaled.
    *
    * Exactness: the bridge numerator B_t = |n·cs_t − t·S| is pure
    * BIGINT (needs periods²·Σc < 2⁶³ — any monthly grid qualifies),
    * so the argmax and its smallest-t tie-break are engine-exact via
    * one `min_by((−B, t))` aggregate; the means and the scaled height
    * divide once at the end.
    *
    * Shape: identical to [[cusumShift]] — map-side-combined counts,
    * group-sized grid generation, one per-group window pass, one
    * argmax aggregate. The only data-sized stage is the first count.
    */
  def changePoint(
      df: DataFrame, groupCol: String, periodCol: Column): DataFrame = {
    val counts = df.select(col(groupCol).as("__g"),
        periodCol.cast("long").as("__p"))
      .where(col("__p").isNotNull)
      .groupBy("__g", "__p").agg(count(lit(1)).as("__c"))
    val bounds = counts.groupBy("__g")
      .agg(min("__p").as("__lo"), max("__p").as("__hi"))
    val dense = bounds
      .select(col("__g"), explode(sequence(col("__lo"), col("__hi")))
        .as("__p"))
      .join(counts, Seq("__g", "__p"), "left")
      .select(col("__g"), col("__p"),
        coalesce(col("__c"), lit(0L)).as("__c"))
    val ord = Window.partitionBy("__g").orderBy("__p")
    val full = Window.partitionBy("__g")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val bridged = dense
      .withColumn("__t", row_number().over(ord).cast("long"))
      .withColumn("__cs", sum(col("__c"))
        .over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__n", count(lit(1)).over(full))
      .withColumn("__s", sum(col("__c")).over(full))
      .withColumn("__b",
        abs(col("__n") * col("__cs") - col("__t") * col("__s")))
      .where(col("__t") < col("__n")) // a split needs both sides
    bridged.groupBy("__g")
      .agg(max(col("__n")).as("n_periods"), max(col("__s")).as("total_n"),
        min_by(struct(col("__t"), col("__p"), col("__cs"), col("__b")),
          struct((col("__b") * -1).as("nb"), col("__t"))).as("__best"))
      .select(col("__g").as(groupCol), col("n_periods"), col("total_n"),
        col("__best.__t").as("split_index"),
        col("__best.__p").as("change_period"),
        round(col("__best.__cs").cast("double")
          / col("__best.__t").cast("double"), 4).as("before_mean"),
        round((col("total_n") - col("__best.__cs")).cast("double")
          / (col("n_periods") - col("__best.__t")).cast("double"), 4)
          .as("after_mean"),
        round(col("__best.__b").cast("double")
          / col("n_periods").cast("double"), 4).as("bridge_height"),
        round((col("__best.__b").cast("double")
            / col("n_periods").cast("double"))
          / sqrt(col("total_n").cast("double")
            / col("n_periods").cast("double")), 6).as("bridge_scaled"))
  }

  /** Day-of-week seasonal profile per group over a dense calendar:
    * daily row counts (gap days are zeros — a silent Sunday IS part of
    * the Sunday profile), the per-weekday mean, and how many days
    * deviate from their weekday's mean by more than `sigma`·√mean
    * (the Poisson-scaled anomaly screen).
    *
    * Exactness: weekday means are ratios of BIGINT sums; the anomaly
    * predicate compares `|c − s/n|` against `sigma·√(s/n)` — every
    * operand one correctly-rounded IEEE op from exact integers, so
    * the flag is engine-deterministic. Weekday derives from the epoch
    * day (`(epochDay + 3) mod 7`, 0 = Monday) — calendar-library-free
    * and portable.
    *
    * Shape: rows collapse map-side to (group, day); the dense grid
    * generates from a group-sized bounds frame; the weekday profile
    * is a (groups × 7)-row aggregate broadcast back onto the day
    * frame for flagging, then re-aggregated. The only data-sized
    * stage is the first grouped count.
    */
  def seasonalProfile(
      df: DataFrame, groupCol: String, dateCol: Column,
      sigma: Double = 3.0): DataFrame = {
    val epoch = to_date(lit("1970-01-01"))
    val counts = df.select(col(groupCol).as("__g"),
        datediff(dateCol.cast("date"), epoch).cast("long").as("__p"))
      .where(col("__p").isNotNull)
      .groupBy("__g", "__p").agg(count(lit(1)).as("__c"))
    val bounds = counts.groupBy("__g")
      .agg(min("__p").as("__lo"), max("__p").as("__hi"))
    val dense = bounds
      .select(col("__g"), explode(sequence(col("__lo"), col("__hi")))
        .as("__p"))
      .join(counts, Seq("__g", "__p"), "left")
      .select(col("__g"), col("__p"),
        coalesce(col("__c"), lit(0L)).as("__c"))
      .withColumn("__dow", pmod(col("__p") + 3, lit(7)))
    val profile = dense.groupBy("__g", "__dow")
      .agg(count(lit(1)).as("__nd"), sum("__c").as("__s"))
    val mean = col("__s").cast("double") / col("__nd").cast("double")
    val flagged = dense.join(broadcast(profile), Seq("__g", "__dow"))
      .withColumn("__dev", abs(col("__c").cast("double") - mean))
      .withColumn("__anom",
        (col("__dev") > lit(sigma) * sqrt(mean)).cast("long"))
    flagged.groupBy("__g", "__dow")
      .agg(max(col("__nd")).as("n_days"), max(col("__s")).as("total"),
        sum(col("__anom")).as("n_anomalies"),
        max(col("__dev")).as("__maxdev"))
      .select(col("__g").as(groupCol), col("__dow").as("dow"),
        col("n_days"), col("total"),
        round(col("total").cast("double")
          / col("n_days").cast("double"), 4).as("dow_mean"),
        col("n_anomalies"),
        round(col("__maxdev"), 4).as("max_abs_residual"))
  }

  /** Weight-of-evidence / information-value report over a pre-binned
    * feature — the classic scorecard screen: per bin, the smoothed
    * log-odds of the positive class vs the population, and the bin's
    * IV contribution; the total IV (the feature's screening score)
    * rides every row.
    *
    * Binning is the CALLER's column (fixed-width, a hash, a lookup —
    * anything shuffle-free); an equal-frequency cut would be a global
    * sort window, exactly the shape the plan gate exists to block.
    * Laplace smoothing (`smooth` added per bin, `smooth`·bins to each
    * total) keeps one-class bins finite without dropping them.
    *
    * Exactness: counts are BIGINT; shares and the `ln` ratio are
    * computed once per bin from exact integers. The IV total is a
    * ≤bins-sized double sum rounded to 6 — the benford-chi² pattern.
    *
    * Shape: one map-side-combined grouped count to a bins-sized
    * frame; totals are a one-row broadcast; everything after is
    * bins-sized.
    */
  def binnedWoe(
      df: DataFrame, binCol: Column, labelCol: Column,
      smooth: Double = 0.5): DataFrame = {
    val base = df.select(binCol.cast("long").as("bin"),
        labelCol.cast("boolean").as("__y"))
      .where(col("bin").isNotNull && col("__y").isNotNull)
    val per = base.groupBy("bin")
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("__y"), 0L).otherwise(1L)).as("n_neg"))
    val tot = per.agg(sum("n_pos").as("__tp"), sum("n_neg").as("__tn"),
      count(lit(1)).as("__nb"))
    val ps = (col("n_pos").cast("double") + lit(smooth)) /
      (col("__tp").cast("double") + lit(smooth) * col("__nb").cast("double"))
    val ns = (col("n_neg").cast("double") + lit(smooth)) /
      (col("__tn").cast("double") + lit(smooth) * col("__nb").cast("double"))
    val scored = per.crossJoin(broadcast(tot))
      .withColumn("__woe", log(ps / ns))
      .withColumn("__iv", (ps - ns) * col("__woe"))
    val iv = scored.agg(sum("__iv").as("__ivt"))
    scored.crossJoin(broadcast(iv))
      .select(col("bin"), col("n_pos"), col("n_neg"),
        round(col("__woe"), 6).as("woe"),
        round(col("__iv"), 6).as("iv_term"),
        round(col("__ivt"), 6).as("iv_total"))
  }

  /** Cohen's kappa inter-annotator agreement: the confusion matrix of
    * two label columns plus chance-corrected agreement, computed as
    * the exact integer ratio κ = (N·D − S) / (N² − S) where D is the
    * diagonal count and S = Σₖ rowₖ·colₖ — ONE double division, no
    * intermediate float probabilities.
    *
    * Output: one row per observed (label_a, label_b) cell with its
    * count, plus the scalar columns (n, po, pe, kappa) repeated on
    * every row — the benford-chi² shape, so the full matrix and the
    * statistic travel in one frame.
    *
    * Shape: one grouped count to a K²-sized cell frame (map-side
    * combined); margins and scalars aggregate from the cells, never
    * re-scanning the data; K² is label-domain-bounded so every join
    * is broadcast.
    */
  def cohenKappa(
      df: DataFrame, labelA: Column, labelB: Column): DataFrame = {
    val cells = df.select(labelA.cast("string").as("label_a"),
        labelB.cast("string").as("label_b"))
      .where(col("label_a").isNotNull && col("label_b").isNotNull)
      .groupBy("label_a", "label_b").agg(count(lit(1)).as("n"))
      .transform(graft.core.CacheScope.disk)
    val rows = cells.groupBy("label_a").agg(sum("n").as("__r"))
    val cols_ = cells.groupBy("label_b").agg(sum("n").as("__c"))
    val chance = rows.join(cols_, col("label_a") === col("label_b"))
      .agg(sum(col("__r") * col("__c")).as("__s"))
    val scal = cells.agg(sum("n").as("__n"),
        sum(when(col("label_a") === col("label_b"), col("n"))
          .otherwise(0L)).as("__d"))
      .crossJoin(broadcast(chance))
      .select(col("__n"), col("__d"), coalesce(col("__s"), lit(0L)).as("__s"))
    cells.crossJoin(broadcast(scal))
      .select(col("label_a"), col("label_b"), col("n"),
        col("__n").as("n_total"),
        round(col("__d").cast("double") / col("__n").cast("double"), 6)
          .as("po"),
        round(col("__s").cast("double")
          / (col("__n").cast("double") * col("__n").cast("double")), 6)
          .as("pe"),
        round((col("__n").cast("double") * col("__d").cast("double")
            - col("__s").cast("double"))
          / (col("__n").cast("double") * col("__n").cast("double")
            - col("__s").cast("double")), 6).as("kappa"))
  }

  /** Categorical-association report between two columns: χ², Cramér's
    * V, mutual information (nats), and both uncertainty coefficients
    * (Theil's U) — the feature-redundancy screen run before one-hot
    * explosion or leakage hunts.
    *
    * χ² uses the sparse identity χ² = N·(Σ_{n>0} n²/(r·c) − 1), so
    * zero cells never need densifying — no distinct×distinct grid,
    * no cross join, cost is observed-cell-sized. MI sums only over
    * observed cells by definition. Entropies come from the margin
    * frames. Every count is BIGINT; the double sums are cell-count-
    * sized and rounded (benford-chi² pattern).
    *
    * Shape: one grouped count to the cell frame, margins aggregate
    * from it, cells join margins on their labels (broadcast — margins
    * are domain-sized), scalars ride one-row broadcasts. One data-
    * sized shuffle total.
    */
  def associationReport(
      df: DataFrame, colA: Column, colB: Column): DataFrame = {
    val cells = df.select(colA.cast("string").as("__a"),
        colB.cast("string").as("__b"))
      .where(col("__a").isNotNull && col("__b").isNotNull)
      .groupBy("__a", "__b").agg(count(lit(1)).as("__n"))
      .transform(graft.core.CacheScope.disk)
    val ra = cells.groupBy("__a").agg(sum("__n").as("__r"))
      .transform(graft.core.CacheScope.disk)
    val cb = cells.groupBy("__b").agg(sum("__n").as("__c"))
      .transform(graft.core.CacheScope.disk)
    val n = cells.agg(sum("__n").as("__tt"),
      count(lit(1)).as("__cells"))
    val nA = ra.agg(count(lit(1)).as("__ra"))
    val nB = cb.agg(count(lit(1)).as("__cb"))
    val joined = cells
      .join(broadcast(ra), Seq("__a"))
      .join(broadcast(cb), Seq("__b"))
      .crossJoin(broadcast(n))
    val nD = col("__n").cast("double")
    val ND = col("__tt").cast("double")
    val rD = col("__r").cast("double")
    val cD = col("__c").cast("double")
    val sums = joined.agg(
      sum(nD * nD / (rD * cD)).as("__chiTerm"),
      sum((nD / ND) * log(nD * ND / (rD * cD))).as("__mi"))
    val hA = ra.crossJoin(broadcast(n))
      .agg(sum((col("__r").cast("double") / col("__tt").cast("double"))
        * log(col("__tt").cast("double") / col("__r").cast("double")))
        .as("__ha"))
    val hB = cb.crossJoin(broadcast(n))
      .agg(sum((col("__c").cast("double") / col("__tt").cast("double"))
        * log(col("__tt").cast("double") / col("__c").cast("double")))
        .as("__hb"))
    n.crossJoin(broadcast(nA)).crossJoin(broadcast(nB))
      .crossJoin(broadcast(sums))
      .crossJoin(broadcast(hA)).crossJoin(broadcast(hB))
      .select(col("__tt").as("n"), col("__ra").as("levels_a"),
        col("__cb").as("levels_b"),
        round(ND * (col("__chiTerm") - lit(1.0)), 4).as("chi2"),
        round(sqrt((col("__chiTerm") - lit(1.0))
          / (least(col("__ra"), col("__cb")) - lit(1L)).cast("double")), 6)
          .as("cramers_v"),
        round(col("__mi"), 6).as("mi_nats"),
        round(col("__mi") / col("__ha"), 6).as("u_a_given_b"),
        round(col("__mi") / col("__hb"), 6).as("u_b_given_a"))
  }

  /** Isotonic (monotone non-decreasing) calibration over pre-binned
    * scores, per group — pool-adjacent-violators WITHOUT the
    * sequential pooling loop: the min-max identity
    * `iso_i = max_{k≤i} min_{j≥i} avg(k..j)` over interval averages
    * of prefix sums. O(B³) arithmetic per group in one expression —
    * distributed PAV with no driver round-trips, exact because every
    * interval average is ONE division of BIGINT prefix-sum
    * differences and min/max over those doubles is order-free.
    *
    * Binning is the CALLER's column (same contract as [[binnedWoe]]).
    * Bin count per group is guarded by `maxBins` (default 256:
    * ≤ 2^24 multiplies per group, sub-second; calibration bins in
    * practice are ≤ 100) via the kaplanMeier raise_error pattern.
    *
    * Shape: one map-side-combined grouped count to a (group × bin)
    * frame, one sorted array per group, pure expression arithmetic,
    * posexplode back to rows. The only data-sized stage is the first
    * count.
    */
  def isotonicCalibration(
      df: DataFrame, groupCol: String, binCol: Column,
      labelCol: Column, maxBins: Int = 256): DataFrame = {
    val base = df.select(col(groupCol).as("__g"),
        binCol.cast("long").as("__b"),
        labelCol.cast("boolean").as("__y"))
      .where(col("__b").isNotNull && col("__y").isNotNull)
    val bins = base.groupBy("__g", "__b")
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__p"))
    val grouped = bins.groupBy("__g")
      .agg(sort_array(collect_list(struct(col("__b"), col("__n"),
        col("__p")))).as("__rows"))
      .withColumn("__rows",
        when(size(col("__rows")) > maxBins,
          raise_error(lit("isotonicCalibration: bins per group " +
            "exceed maxBins; coarsen the binning")).cast(
            "array<struct<__b:bigint,__n:bigint,__p:bigint>>"))
          .otherwise(col("__rows")))
      .withColumn("__len", size(col("__rows")))
    // prefix sums with a leading 0 so element_at(cp, k) = cp_{k-1}
    // under 1-based k (the interval (k..j) average needs cp_j − cp_{k−1})
    def prefix(field: String) = concat(array(lit(0L)),
      transform(sequence(lit(1), col("__len")), i =>
        aggregate(slice(col("__rows").getField(field), lit(1), i),
          lit(0L), (acc, x) => acc + x)))
    val withPrefix = grouped
      .withColumn("__cn", prefix("__n"))
      .withColumn("__cp", prefix("__p"))
    val iso = transform(sequence(lit(1), col("__len")), i =>
      array_max(transform(sequence(lit(1), i), k =>
        array_min(transform(sequence(i, col("__len")), j =>
          (element_at(col("__cp"), j + 1) - element_at(col("__cp"), k))
            .cast("double")
            / (element_at(col("__cn"), j + 1) - element_at(col("__cn"), k))
            .cast("double"))))))
    withPrefix.withColumn("__iso", iso)
      .select(col("__g"), posexplode(col("__rows")).as(Seq("__i", "__r")),
        col("__iso"))
      .select(col("__g").as(groupCol), col("__r.__b").as("bin"),
        col("__r.__n").as("n"), col("__r.__p").as("n_pos"),
        round(col("__r.__p").cast("double")
          / col("__r.__n").cast("double"), 6).as("raw_rate"),
        round(element_at(col("__iso"), col("__i") + 1), 6)
          .as("iso_rate"))
  }

  /** Simpson's-paradox screen: a binary-cohort rate difference
    * overall vs within every stratum, flagging strata whose
    * difference REVERSES the aggregate's sign — the aggregation-
    * reversal audit run before any cohort comparison ships.
    *
    * Exactness: rates are ratios of BIGINT counts (one division
    * each); the reversal flag multiplies two exact differences'
    * signs. Strata where either cohort is empty report null rates
    * and flag 0 (no evidence, not a reversal).
    *
    * Shape: one map-side-combined grouped count per stratum plus one
    * ungrouped aggregate for the overall row (a one-row broadcast
    * cross join — the plan gate's allowed scalar shape). One scan,
    * one shuffle.
    */
  def simpsonScreen(
      df: DataFrame, cohortCol: Column, stratumCol: Column,
      labelCol: Column): DataFrame = {
    val base = df.select(cohortCol.cast("boolean").as("__a"),
        stratumCol.cast("string").as("__s"),
        labelCol.cast("boolean").as("__y"))
      .where(col("__a").isNotNull && col("__y").isNotNull &&
        col("__s").isNotNull)
    val aggs = Seq(
      sum(when(col("__a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(col("__a") && col("__y"), 1L).otherwise(0L)).as("pos_a"),
      sum(when(!col("__a"), 1L).otherwise(0L)).as("n_b"),
      sum(when(!col("__a") && col("__y"), 1L).otherwise(0L)).as("pos_b"))
    val strata = base.groupBy(col("__s")).agg(aggs.head, aggs.tail: _*)
    val overall = base.agg(aggs.head, aggs.tail: _*)
      .select(col("n_a").as("__ona"), col("pos_a").as("__opa"),
        col("n_b").as("__onb"), col("pos_b").as("__opb"))
    def rate(p: Column, n: Column) =
      when(n > 0, p.cast("double") / n.cast("double"))
    val joined = strata.crossJoin(broadcast(overall))
      .withColumn("__ra", rate(col("pos_a"), col("n_a")))
      .withColumn("__rb", rate(col("pos_b"), col("n_b")))
      .withColumn("__ora", rate(col("__opa"), col("__ona")))
      .withColumn("__orb", rate(col("__opb"), col("__onb")))
      .withColumn("__d", col("__ra") - col("__rb"))
      .withColumn("__od", col("__ora") - col("__orb"))
    joined.select(col("__s").as("stratum"),
      col("n_a"), col("pos_a"), col("n_b"), col("pos_b"),
      round(col("__ra"), 6).as("rate_a"),
      round(col("__rb"), 6).as("rate_b"),
      round(col("__d"), 6).as("diff"),
      round(col("__od"), 6).as("overall_diff"),
      coalesce((col("__d") * col("__od") < 0).cast("int"), lit(0))
        .as("reversal"))
  }

  /** Hash-randomization test for a two-cohort mean difference: R
    * deterministic pseudo-random relabelings of the per-unit values
    * (md5-keyed Bernoulli assignment — the approximate permutation
    * test, group sizes free, the standard large-sample variant), the
    * observed difference's rank among them, and the resulting
    * p-value (1 + #extreme)/(R_valid + 1).
    *
    * Determinism across engines: assignment is
    * `int(md5(salt:r:unit)[0:8], 16) mod 2` — the Carter-Wegman md5
    * pattern every dedup family here uses, byte-identical in any
    * engine with md5. Per-replica means divide exact BIGINT sums
    * once; the extremeness comparison compares identically-built
    * doubles. Replicas that draw an empty side are excluded from
    * both numerator and denominator (`r_valid`).
    *
    * Shape: units collapse map-side to one row each (data-sized);
    * the replica frame is units × R (the documented cost — R
    * bounds it, default 199) aggregating straight down to R rows.
    * No global sort, no window.
    */
  def permutationTest(
      df: DataFrame, unitCol: Column, valueCol: Column,
      cohortCol: Column, replicas: Int = 199,
      salt: String = "perm"): DataFrame = {
    val units = df.select(unitCol.cast("string").as("__u"),
        valueCol.cast("long").as("__v"),
        cohortCol.cast("boolean").as("__a"))
      .where(col("__u").isNotNull && col("__a").isNotNull)
      .groupBy("__u", "__a").agg(sum("__v").as("__v"))
    val obs = units.agg(
        sum(when(col("__a"), col("__v")).otherwise(0L)).as("__sa"),
        sum(when(col("__a"), 1L).otherwise(0L)).as("__na"),
        sum(when(!col("__a"), col("__v")).otherwise(0L)).as("__sb"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("__nb"))
      .select(col("__na"), col("__nb"),
        (col("__sa").cast("double") / col("__na").cast("double")
          - col("__sb").cast("double") / col("__nb").cast("double"))
          .as("__obs"))
    val assigned = units
      .select(col("__u"), col("__v"),
        explode(sequence(lit(0), lit(replicas - 1))).as("__r"))
      .withColumn("__flip",
        conv(substring(md5(concat_ws(":", lit(salt), col("__r"),
          col("__u"))), 1, 8), 16, 10).cast("long") % 2)
    val perReplica = assigned.groupBy("__r")
      .agg(sum(when(col("__flip") === 0, col("__v")).otherwise(0L))
          .as("__sa"),
        sum(when(col("__flip") === 0, 1L).otherwise(0L)).as("__na"),
        sum(when(col("__flip") === 1, col("__v")).otherwise(0L))
          .as("__sb"),
        sum(when(col("__flip") === 1, 1L).otherwise(0L)).as("__nb"))
      .where(col("__na") > 0 && col("__nb") > 0)
      .select((col("__sa").cast("double") / col("__na").cast("double")
        - col("__sb").cast("double") / col("__nb").cast("double"))
        .as("__d"))
    val tally = perReplica.crossJoin(broadcast(obs))
      .agg(count(lit(1)).as("r_valid"),
        sum((abs(col("__d")) >= abs(col("__obs"))).cast("long"))
          .as("n_extreme"))
    obs.crossJoin(broadcast(tally))
      .select(col("__na").as("n_a"), col("__nb").as("n_b"),
        round(col("__obs"), 4).as("obs_diff"),
        col("r_valid"), col("n_extreme"),
        round((col("n_extreme").cast("double") + lit(1.0))
          / (col("r_valid").cast("double") + lit(1.0)), 6)
          .as("p_value"))
  }

  /** Cumulative Poisson(1) CDF thresholds scaled to 32-bit integer
    * space: weight = #{k : u ≥ T_k} for a 32-bit md5 uniform u — the
    * Poisson-bootstrap draw as PURE INTEGER comparisons (no float
    * compare, no RNG state). Interpolated verbatim into the SQL
    * oracle so both engines draw identical weights.
    */
  private[graft] val poissonThresholds: Seq[Long] =
    (0 to 8).map { k =>
      val cdf = (0 to k).map { i =>
        var fi = 1.0; (1 to i).foreach(j => fi *= j)
        math.exp(-1.0) / fi
      }.sum
      (cdf * 4294967296.0).toLong
    }

  /** Poisson bootstrap confidence interval for a pooled ratio metric
    * (Σnum/Σden — revenue per order, CTR, cost per token): R
    * deterministic replicates where each unit's weight is a
    * Poisson(1) draw keyed by md5(salt:r:unit) — the bootstrap that
    * needs NO resampling shuffle (Chamandy et al., "Estimating
    * uncertainty for massive data streams"), so it runs as one
    * R-fan-out aggregation at any scale.
    *
    * Determinism: weights are integer threshold-counts over the
    * 32-bit md5 value ([[poissonThresholds]] — no float compare);
    * each replicate's ratio is ONE division of exact BIGINT weighted
    * sums; the CI bounds are order statistics of the sorted replicate
    * array picked by exact integer index (ceil(α/2·R)), and the
    * bootstrap mean folds the SORTED array so even its rounding is
    * engine-identical. Zero-denominator replicates drop from the
    * order statistics (`r_valid` reports the survivors).
    *
    * Shape: units collapse map-side; the replica frame is units × R
    * (the documented, R-bounded cost) aggregating straight to R
    * rows; the final fold is one ≤R-element array. R ≤ 999 guard
    * keeps the array driver-friendly.
    */
  def bootstrapRatioCI(
      df: DataFrame, unitCol: Column, numCol: Column, denCol: Column,
      replicas: Int = 199, alpha: Double = 0.05,
      salt: String = "boot"): DataFrame = {
    require(replicas >= 19 && replicas <= 999,
      "replicas must be in [19, 999]")
    require(alpha > 0 && alpha < 0.5, "alpha must be in (0, 0.5)")
    val units = df.select(unitCol.cast("string").as("__u"),
        numCol.cast("long").as("__num"), denCol.cast("long").as("__den"))
      .where(col("__u").isNotNull)
      .groupBy("__u")
      .agg(sum("__num").as("__num"), sum("__den").as("__den"))
    val obs = units.agg(sum("__num").as("__tn"), sum("__den").as("__td"),
        count(lit(1)).as("__nu"))
      .select(col("__nu"), (col("__tn").cast("double")
        / col("__td").cast("double")).as("__obs"))
    val u32 = conv(substring(md5(concat_ws(":", lit(salt), col("__r"),
      col("__u"))), 1, 8), 16, 10).cast("long")
    val weight = poissonThresholds
      .map(t => when(u32 >= t, 1L).otherwise(0L))
      .reduce(_ + _)
    val perReplica = units
      .select(col("__u"), col("__num"), col("__den"),
        explode(sequence(lit(0), lit(replicas - 1))).as("__r"))
      .withColumn("__w", weight)
      .groupBy("__r")
      .agg(sum(col("__w") * col("__num")).as("__wn"),
        sum(col("__w") * col("__den")).as("__wd"))
      .where(col("__wd") > 0)
      .select((col("__wn").cast("double") / col("__wd").cast("double"))
        .as("__ratio"))
    val folded = perReplica
      .agg(sort_array(collect_list(col("__ratio"))).as("__rs"))
      .select(col("__rs"), size(col("__rs")).as("__rv"))
      .withColumn("__lo", greatest(
        ceil(lit(alpha / 2) * col("__rv")).cast("int"), lit(1)))
      .withColumn("__hi",
        ceil(lit(1.0 - alpha / 2) * col("__rv")).cast("int"))
    obs.crossJoin(broadcast(folded))
      .select(col("__nu").as("n_units"),
        col("__rv").cast("long").as("r_valid"),
        round(col("__obs"), 6).as("obs_ratio"),
        round(aggregate(col("__rs"), lit(0.0), (a, x) => a + x)
          / col("__rv").cast("double"), 6).as("boot_mean"),
        round(element_at(col("__rs"), col("__lo")), 6).as("ci_lo"),
        round(element_at(col("__rs"), col("__hi")), 6).as("ci_hi"))
  }

  /** Wilson score interval per group — the small-sample-honest
    * confidence bounds for a conversion/defect/success RATE (the
    * Wald ±z√(p(1−p)/n) interval collapses to zero width at p∈{0,1}
    * and goes negative near the edges; Wilson is the standard fix a
    * rate dashboard should ship). Per group: trials, successes, the
    * raw rate, and the z-score interval
    * `(p + z²/2n ± z·√(p(1−p)/n + z²/4n²)) / (1 + z²/n)`.
    *
    * Cross-engine exactness: the formula uses only +, −, ×, ÷ and
    * `sqrt` — ALL correctly-rounded IEEE-754 core operations — over
    * values derived from exact integer counts, so engine and oracle
    * produce bit-identical doubles with no quantization step needed
    * (`pow`/`ln`, which are NOT correctly rounded, never appear; the
    * [[graft.dedup.Dedup.lshPlan]] argument). One map-side-combined
    * grouped count; output is group-domain-sized.
    *
    * Returns `(groupCols…, n, successes, rate, wilson_lo, wilson_hi)`
    * rounded to 6; zero-trial groups cannot occur (a group exists only
    * through its rows).
    */
  def wilsonRates(
      df: DataFrame, groupCols: Seq[String], success: Column,
      z: Double = 1.96): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    require(z > 0, "z must be positive")
    val g = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(success, 1L).otherwise(0L)).as("successes"))
    val nD = col("n").cast("double")
    val p = col("successes").cast("double") / nD
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / nD
    val center = p + z2 / (lit(2.0) * nD)
    val half = lit(z) * sqrt(p * (lit(1.0) - p) / nD +
      z2 / (lit(4.0) * nD * nD))
    g.select(groupCols.map(col) ++ Seq(
      col("n"), col("successes"),
      round(p, 6).as("rate"),
      round((center - half) / denom, 6).as("wilson_lo"),
      round((center + half) / denom, 6).as("wilson_hi")): _*)
  }

  /** Empirical-Bayes (beta-binomial) rate shrinkage — the fix for
    * ranking groups by a rate when group sizes vary wildly: a 2/2
    * seller must not outrank a 950/1000 one. A Beta(α, β) prior is
    * fit to the BETWEEN-group rate spread by method of moments
    * (`α+β = m(1−m)/v − 1`), and each group's estimate shrinks toward
    * the prior mean by exactly as much as its evidence is thin:
    * `(s + α)/(n + α + β)`.
    *
    * Determinism: group counts are exact integers; the prior moments
    * fold the SORTED rate array (collect to one group-domain-sized
    * array, `sort_array`, then a sequential `aggregate` fold — the
    * [[bootstrapRatioCI]] treatment), so even the float summation
    * order is pinned and an oracle replays it with the same left
    * fold. The collect is bounded by the GROUP DOMAIN (a rate table,
    * never row data). Degenerate priors fall back loudly-by-value:
    * v = 0 (all rates equal) or a non-positive `α+β` (spread wider
    * than binomial allows — MoM invalid) yield null shrunk rates and
    * a zero `prior_strength`, leaving raw rates authoritative.
    *
    * Returns `(group, n, successes, rate, shrunk_rate, prior_mean,
    * prior_strength)` rounded to 6.
    */
  def ebShrinkRates(
      df: DataFrame, groupCol: String, success: Column): DataFrame = {
    val g = df.groupBy(col(groupCol).as("group"))
      .agg(count(lit(1)).as("n"),
        sum(when(success, 1L).otherwise(0L)).as("successes"))
      .transform(graft.core.CacheScope.disk)
    val rates = g.select(
      (col("successes").cast("double") / col("n").cast("double"))
        .as("__p"))
    val prior = rates
      .agg(sort_array(collect_list(col("__p"))).as("__ps"))
      .select(col("__ps"), size(col("__ps")).as("__k"))
      .withColumn("__m",
        aggregate(col("__ps"), lit(0.0), (a, x) => a + x)
          / col("__k").cast("double"))
      .withColumn("__v",
        when(col("__k") < 2, lit(0.0)).otherwise(
          aggregate(col("__ps"), lit(0.0),
            (a, x) => a + (x - col("__m")) * (x - col("__m")))
            / (col("__k") - 1).cast("double")))
      .withColumn("__s",
        when(col("__v") > 0,
          col("__m") * (lit(1.0) - col("__m")) / col("__v") - 1.0)
          .otherwise(lit(null).cast("double")))
      .select(col("__m"), when(col("__s") > 0, col("__s")).as("__s"))
    g.crossJoin(broadcast(prior))
      .select(col("group"), col("n"), col("successes"),
        round(col("successes").cast("double") / col("n").cast("double"),
          6).as("rate"),
        round((col("successes").cast("double") + col("__s") * col("__m"))
          / (col("n").cast("double") + col("__s")), 6).as("shrunk_rate"),
        round(col("__m"), 6).as("prior_mean"),
        round(coalesce(col("__s"), lit(0.0)), 6).as("prior_strength"))
  }

  /** Qini uplift curve over caller-supplied score bins: per bin
    * (descending score), treated/control counts and responders, the
    * bin's uplift, and the cumulative Qini coefficient
    * Q_k = Rt_k − Rc_k·(Nt_k/Nc_k) — the incremental-response audit
    * a targeting model ships with.
    *
    * Bins are the caller's shuffle-free column (the [[binnedWoe]]
    * contract); cumulative sums run as ONE sorted-array fold per the
    * kaplanMeier pattern (no unpartitioned window — the plan-gate
    * shape), guarded by `maxBins`. Counts are BIGINT; uplift and
    * Qini divide once per row.
    */
  def qiniCurve(
      df: DataFrame, binCol: Column, treatedCol: Column,
      labelCol: Column, maxBins: Int = 256): DataFrame = {
    val base = df.select(binCol.cast("long").as("__b"),
        treatedCol.cast("boolean").as("__t"),
        labelCol.cast("boolean").as("__y"))
      .where(col("__b").isNotNull && col("__t").isNotNull &&
        col("__y").isNotNull)
    val bins = base.groupBy("__b").agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("__nt"),
      sum(when(col("__t") && col("__y"), 1L).otherwise(0L)).as("__rt"),
      sum(when(!col("__t"), 1L).otherwise(0L)).as("__nc"),
      sum(when(!col("__t") && col("__y"), 1L).otherwise(0L)).as("__rc"))
    val grouped = bins
      .agg(sort_array(collect_list(struct((col("__b") * -1).as("__nb"),
        col("__b"), col("__nt"), col("__rt"), col("__nc"), col("__rc"))))
        .as("__rows"))
      .withColumn("__rows",
        when(size(col("__rows")) > maxBins,
          raise_error(lit("qiniCurve: bins exceed maxBins; coarsen " +
            "the binning")).cast("array<struct<__nb:bigint," +
            "__b:bigint,__nt:bigint,__rt:bigint,__nc:bigint," +
            "__rc:bigint>>"))
          .otherwise(col("__rows")))
    def prefix(field: String) =
      transform(sequence(lit(1), size(col("__rows"))), i =>
        aggregate(slice(col("__rows").getField(field), lit(1), i),
          lit(0L), (acc, x) => acc + x))
    val withCums = grouped
      .withColumn("__cnt", prefix("__nt"))
      .withColumn("__crt", prefix("__rt"))
      .withColumn("__cnc", prefix("__nc"))
      .withColumn("__crc", prefix("__rc"))
    def at(c: String) = element_at(col(c), col("__i") + 1)
    withCums
      .select(posexplode(col("__rows")).as(Seq("__i", "__row")),
        col("__cnt"), col("__crt"), col("__cnc"), col("__crc"))
      .select(col("__row.__b").as("bin"),
        col("__row.__nt").as("n_treated"),
        col("__row.__rt").as("r_treated"),
        col("__row.__nc").as("n_control"),
        col("__row.__rc").as("r_control"),
        round(when(col("__row.__nt") > 0 && col("__row.__nc") > 0,
          col("__row.__rt").cast("double")
            / col("__row.__nt").cast("double")
          - col("__row.__rc").cast("double")
            / col("__row.__nc").cast("double")), 6).as("uplift"),
        round(when(at("__cnc") > 0,
          at("__crt").cast("double") - at("__crc").cast("double")
            * (at("__cnt").cast("double") / at("__cnc").cast("double"))),
          4).as("cum_qini"))
  }

  /** Disparate-impact (four-fifths rule) audit: per group, the
    * positive-outcome rate and its ratio to the most-favored group's
    * rate, with the EEOC 80 % flag decided by EXACT cross-
    * multiplication — `5·p_g·N < 4·P·n_g` over BIGINTs, so a group
    * sitting on the boundary can't flip with the engine's float
    * rounding. The most-favored group is the micro-quantized rate
    * argmax (ties to the smaller group name) and rides a one-row
    * broadcast.
    *
    * Shape: one map-side-combined grouped count + one bounded argmax
    * aggregate; everything after is group-count-sized. Empty-group
    * division can't occur (groups come from observed rows).
    */
  def disparateImpact(
      df: DataFrame, groupCol: String, labelCol: Column): DataFrame = {
    val per = df.select(col(groupCol).cast("string").as("__g"),
        labelCol.cast("boolean").as("__y"))
      .where(col("__g").isNotNull && col("__y").isNotNull)
      .groupBy("__g")
      .agg(count(lit(1)).as("n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"))
      .transform(graft.core.CacheScope.disk)
    val withRm = per.withColumn("__rm",
      floor(lit(1000000L) * col("n_pos").cast("double")
        / col("n").cast("double")).cast("long"))
    val mx = withRm.agg(max("__rm").as("__mx"))
    val best = withRm.crossJoin(broadcast(mx))
      .where(col("__rm") === col("__mx"))
      .agg(min_by(struct(col("n").as("bn"), col("n_pos").as("bp")),
        col("__g")).as("__b"))
      .select(col("__b.bn").as("__bn"), col("__b.bp").as("__bp"))
    per.crossJoin(broadcast(best))
      .select(col("__g").as(groupCol), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("rate"),
        round((col("n_pos").cast("double") * col("__bn").cast("double"))
          / (col("n").cast("double") * col("__bp").cast("double")), 6)
          .as("impact_ratio"),
        (lit(5L) * col("n_pos") * col("__bn") <
          lit(4L) * col("__bp") * col("n")).cast("int")
          .as("four_fifths_flag"))
  }

  /** CUPED variance reduction (Deng et al. 2013): adjust a per-unit
    * experiment metric by its pre-period covariate,
    * ŷ = ȳ_arm − θ·(x̄_arm − x̄), θ = cov(x,y)/var(x) pooled — the
    * standard A/B sensitivity lift; ρ² is the variance removed.
    *
    * Determinism: every moment (Σx, Σy, Σx², Σy², Σxy, n) is an exact
    * BIGINT from integer-valued unit metrics — the caller's Int64
    * contract: pick units (cents, dollars) so Σx·y fits long — and θ,
    * ρ², and the adjusted means are fixed arithmetic over those longs
    * (long→double conversion is correctly rounded, so any engine
    * computing the same shapes from the same longs agrees bit-for-
    * bit). No order-dependent float summation anywhere.
    *
    * Shape: ONE ungrouped aggregate (pooled moments, one-row
    * broadcast) + one per-arm aggregate off the same scan shape.
    * Degenerate var(x) = 0 reports null θ/adjusted means rather than
    * an IEEE artifact.
    */
  def cuped(
      df: DataFrame, cohortCol: Column, preCol: Column,
      postCol: Column): DataFrame = {
    val base = df.select(cohortCol.cast("boolean").as("__a"),
        preCol.cast("long").as("__x"), postCol.cast("long").as("__y"))
      .where(col("__a").isNotNull && col("__x").isNotNull &&
        col("__y").isNotNull)
    val pooled = base.agg(count(lit(1)).as("__n"),
      sum("__x").as("__sx"), sum("__y").as("__sy"),
      sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__y") * col("__y")).as("__syy"),
      sum(col("__x") * col("__y")).as("__sxy"))
    val arms = base.groupBy(col("__a"))
      .agg(count(lit(1)).as("n"), sum("__x").as("__ax"),
        sum("__y").as("__ay"))
    val nD = col("__n").cast("double")
    // NB: continuation lines must not START with the minus (Scala's
    // semicolon inference would end the expression at the line break
    // and silently discard the subtraction)
    val covN = (nD * col("__sxy").cast("double")) -
      (col("__sx").cast("double") * col("__sy").cast("double"))
    val varXN = (nD * col("__sxx").cast("double")) -
      (col("__sx").cast("double") * col("__sx").cast("double"))
    val varYN = (nD * col("__syy").cast("double")) -
      (col("__sy").cast("double") * col("__sy").cast("double"))
    val theta = when(varXN > 0, covN / varXN)
    val joined = arms.crossJoin(broadcast(pooled))
      .withColumn("__theta", theta)
      .withColumn("__mx", col("__ax").cast("double") / col("n").cast("double"))
      .withColumn("__my", col("__ay").cast("double") / col("n").cast("double"))
      .withColumn("__gx", col("__sx").cast("double") / nD)
    joined.select(col("__a").cast("int").as("cohort"),
      col("n"),
      round(col("__mx"), 4).as("mean_pre"),
      round(col("__my"), 4).as("mean_post"),
      round(col("__my") - col("__theta") * (col("__mx") - col("__gx")), 4)
        .as("adjusted_mean"),
      round(col("__theta"), 6).as("theta"),
      round(when(varXN > 0 && varYN > 0,
        (covN * covN) / (varXN * varYN)), 6).as("rho2"))
  }

  /** Theil-T inequality index with exact within/between
    * decomposition — the concentration reading q89's Gini can't
    * give: Theil is ADDITIVELY DECOMPOSABLE, `T = Σ_g s_g·T_g +
    * T_between` (s_g the group's value share), so the table answers
    * "is spend concentration a within-segment phenomenon or a
    * between-segment one" exactly — the question a mixture-rebalance
    * or key-salting decision actually needs.
    *
    * Exactness: values arrive as caller-quantized integer units;
    * every ratio inside a ln is exact (`x/μ_g = x·n_g/S_g`,
    * `s_g/p_g = S_g·n / (S·n_g)` — HUGEINT/DECIMAL products, one
    * double division), each per-row / per-group term is
    * floor-nano-quantized BEFORE its sum (the order-free
    * integer-aggregation treatment), and the reported identity
    * `T_total = Σ s_g·T_g + T_between` is checked by construction:
    * `theil` on the total row IS that sum of quantized parts, so the
    * decomposition is exact to the artifact, not to float luck.
    * Non-positive values are excluded (ln domain — Theil is defined
    * on positive quantities); the excluded count is visible as
    * n-vs-input-rows.
    *
    * Scale shape: one grouped sum (map-side combined), per-row terms
    * against broadcast group moments, one more grouped sum;
    * between-group terms are group-domain-sized. Output: one row per
    * group plus a `__total__` row carrying the decomposition.
    *
    * Returns `(group, n, value_sum, theil, theil_between,
    * theil_within_weighted)` — the last two null except on
    * `__total__`.
    */
  def theilDecomposition(
      df: DataFrame, groupCol: String, valueCents: Column): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val rows = df
      .select(col(groupCol).cast("string").as("__g"),
        valueCents.cast("long").as("__x"))
      .where(col("__x").isNotNull && col("__x") > 0 &&
        col("__g").isNotNull)
      .transform(graft.core.CacheScope.disk)
    val grp = rows.groupBy("__g")
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__s"))
      .transform(graft.core.CacheScope.disk)
    val tot = grp.agg(sum(col("__n")).as("__nt"), sum(col("__s")).as("__st"))
    // per-row term of T_g: (x/μ_g)·ln(x/μ_g), μ_g = S_g/n_g — the
    // ratio exact as x·n_g/S_g
    val r = (dec(col("__x")) * dec(col("__n"))).cast("double") /
      col("__s").cast("double")
    val withinNano = rows.join(grp, Seq("__g"))
      .select(col("__g"),
        floor(r * log(r) * lit(1000000000.0)).cast("long").as("__t"))
      .groupBy("__g").agg(sum(col("__t")).as("__w_nano"))
    val per = grp.join(withinNano, Seq("__g"))
      .crossJoin(broadcast(tot))
      .transform(graft.core.CacheScope.disk)
    // T_g = (Σ terms)/n_g; group share s_g = S_g/S; between term =
    // s_g·ln(s_g/p_g) with s_g/p_g = S_g·n/(S·n_g) exact
    val tg = (col("__w_nano").cast("double") / 1000000000.0) /
      col("__n").cast("double")
    val sg = col("__s").cast("double") / col("__st").cast("double")
    val ratio = (dec(col("__s")) * dec(col("__nt"))).cast("double") /
      (dec(col("__st")) * dec(col("__n"))).cast("double")
    val parts = per.select(col("__g"),
      col("__n"), col("__s"),
      floor(sg * tg * lit(1000000000.0)).cast("long").as("__sw_nano"),
      floor(sg * log(ratio) * lit(1000000000.0)).cast("long")
        .as("__b_nano"),
      round(tg, 6).as("theil"))
    val groupsOut = parts.select(col("__g").as(groupCol),
      col("__n").as("n"), col("__s").as("value_sum"), col("theil"),
      lit(null).cast("double").as("theil_between"),
      lit(null).cast("double").as("theil_within_weighted"))
    val totalOut = parts
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("value_sum"),
        sum(col("__sw_nano")).as("__sw"), sum(col("__b_nano")).as("__b"))
      .select(lit("__total__").as(groupCol), col("n"), col("value_sum"),
        round((col("__sw") + col("__b")).cast("double") / 1000000000.0,
          6).as("theil"),
        round(col("__b").cast("double") / 1000000000.0, 6)
          .as("theil_between"),
        round(col("__sw").cast("double") / 1000000000.0, 6)
          .as("theil_within_weighted"))
    groupsOut.unionByName(totalOut)
  }

  /** Gini concentration index per group — the bounded-[0,1) sibling
    * of [[theilDecomposition]] (and the Lorenz-curve summary behind
    * the q190 HHI shelf): for each group, `G = (2·Σᵢ i·xᵢ −
    * (n+1)·Σx) / (n·Σx)` over the values sorted ascending within the
    * group (1-based index `i`). The index form is exactly the mean
    * absolute difference / 2μ identity, but computable in one ranked
    * pass instead of an O(n²) pair join.
    *
    * Exactness: values are caller-quantized integers (`valueCents`);
    * the per-group sorted index comes from [[rankByRange]] (the
    * two-pass range-partitioned rank — no single-task per-group
    * window sort, the q180/q212 scale shape) ordered by `(value,
    * id)`; `Σ i·x` is invariant under permutations of tied values,
    * so the id tie-break only pins run-to-run determinism of the
    * intermediate, not the result. Numerator and denominator are
    * exact DECIMAL(38,0) products of BIGINT aggregates (the
    * joinSizeForecast overflow treatment); the ONE double step is
    * the final division before `round(…, 6)` — cross-engine
    * reproducible since both engines round the same exact integers
    * to nearest double.
    *
    * Contract: negative and null values and null groups are
    * excluded; zeros participate (they stretch the Lorenz curve —
    * excluding them would understate concentration). A group whose
    * value sum is 0 gets a null gini (undefined, not 0). Output is
    * group-domain-sized: (groupCol, n, value_sum, gini).
    *
    * Scale shape: one rank (two range exchanges + broadcast-sized
    * offset join, from rankByRange) + one grouped aggregate with
    * map-side combine. No per-row windows, no collects.
    */
  def giniConcentration(
      df: DataFrame, groupCol: String, valueCents: Column,
      idCol: Column): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val rows = df
      .select(col(groupCol).cast("string").as("__g"),
        valueCents.cast("long").as("__x"), idCol.as("__gid"))
      .where(col("__x").isNotNull && col("__x") >= 0 &&
        col("__g").isNotNull)
    val ranked = rankByRange(rows, Seq("__g"),
      Seq(col("__x").asc, col("__gid").asc), "__i")
    ranked.groupBy("__g")
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("value_sum"),
        sum(dec(col("__i")) * dec(col("__x"))).as("__sxr"))
      .select(col("__g").as(groupCol), col("n"), col("value_sum"),
        when(col("value_sum") > 0,
          round(
            (dec(lit(2)) * col("__sxr") -
              dec(col("n") + 1) * dec(col("value_sum"))).cast("double") /
            (dec(col("n")) * dec(col("value_sum"))).cast("double"), 6))
          .otherwise(lit(null).cast("double")).as("gini"))
  }

  /** Split-conformal prediction bands with held-out coverage — the
    * distribution-free uncertainty wrapper every "predict a number"
    * pipeline should ship with: on a CALIBRATION split, residuals
    * against a per-group mean predictor; the band half-width `q̂` is
    * the `⌈(n+1)(1−α)⌉`-th smallest calibration residual (the
    * finite-sample-valid split-conformal quantile — NOT the naive
    * (1−α) empirical quantile, whose coverage undershoots); on the
    * TEST split, the fraction of rows whose residual ≤ q̂ — which
    * conformal theory guarantees ≥ 1−α in expectation, and the
    * table verifies empirically per group.
    *
    * Exactness: values are quantized by the CALLER to integer units
    * (`valueCents`), the predictor is the calibration-group integer
    * mean (`Σ div n` — positive floor division, the labelNoiseScreen
    * contract), residuals are exact BIGINTs, the order statistic is
    * "smallest residual with cumulative count ≥ k" over the
    * per-distinct-residual cumulative shape (the ksTest machinery —
    * bounded by distinct residual values, never a per-row window),
    * and `k = ⌈(n+1)(1000−alphaMilli)/1000⌉` in pure integer ceiling
    * division. Coverage is one double division of exact counts.
    * Everything cross-engine bit-identical.
    *
    * A group whose calibration is too small (`k > n`) has an
    * INFINITE conformal band — q̂ and coverage are null and
    * `degenerate = 1` (the honest answer; clamping to the max
    * residual would claim coverage the theory doesn't give). Groups
    * present only in test are absent (no predictor).
    *
    * Scale shape: two grouped aggregates (means, then residual
    * counts, map-side combined), one group-partitioned running sum
    * over distinct residuals, broadcast q̂ per group, one test-side
    * count. Output is group-domain-sized.
    *
    * Returns `(group…, n_cal, n_test, pred, q_hat, coverage,
    * degenerate)` — `pred`/`q_hat` in the caller's integer units.
    */
  def conformalCoverage(
      cal: DataFrame, test: DataFrame, valueCents: Column,
      groupCols: Seq[String], alphaMilli: Int = 100): DataFrame = {
    require(alphaMilli >= 1 && alphaMilli <= 999,
      "alphaMilli in [1, 999]")
    require(groupCols.nonEmpty, "at least one group column")
    val gcols = groupCols.map(col)
    val calV = cal.select(gcols :+ valueCents.cast("long").as("__v"): _*)
      .where(col("__v").isNotNull)
      .transform(graft.core.CacheScope.disk)
    val pred = calV.groupBy(gcols: _*)
      .agg(count(lit(1)).as("n_cal"), sum(col("__v")).as("__s"))
      .withColumn("pred", expr("__s div n_cal"))
      .drop("__s")
      .transform(graft.core.CacheScope.disk)
    val resid = calV.join(pred, groupCols)
      .select(gcols :+ abs(col("__v") - col("pred")).as("__r"): _*)
      .groupBy(gcols :+ col("__r"): _*)
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(gcols: _*).orderBy(col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val k = expr(s"((n_cal + 1) * (1000 - $alphaMilli) + 999) div 1000")
    val qhat = resid
      .withColumn("__cum", sum(col("__c")).over(w))
      .join(pred, groupCols)
      .where(col("__cum") >= k)
      .groupBy(gcols: _*)
      .agg(min(col("__r")).as("q_hat"))
    val testR = test
      .select(gcols :+ valueCents.cast("long").as("__v"): _*)
      .where(col("__v").isNotNull)
      .join(pred, groupCols)
      .join(qhat, groupCols, "left")
      .groupBy(gcols: _*)
      .agg(max(col("n_cal")).as("n_cal"), max(col("pred")).as("pred"),
        count(lit(1)).as("n_test"),
        max(col("q_hat")).as("q_hat"),
        sum(when(abs(col("__v") - col("pred")) <= col("q_hat"), 1L)
          .otherwise(0L)).as("__cov"))
    testR.select(gcols ++ Seq(
      col("n_cal"), col("n_test"), col("pred"),
      col("q_hat"),
      round(when(col("q_hat").isNotNull,
        col("__cov").cast("double") / col("n_test").cast("double")), 6)
        .as("coverage"),
      col("q_hat").isNull.cast("int").as("degenerate")): _*)
  }

  /** Zero-filled per-type bucket counts: every type's [min, max]
    * bucket range densified (a silent hour is c = 0, not a missing
    * row — skipping gaps would splice distant buckets together and
    * corrupt every lag statistic). Shared by [[autocorrelation]] and
    * [[burstiness]]; the [[crossCorrelation]] grid, per type.
    */
  private def bucketCounts(
      df: DataFrame, tsCol: String, typeCol: String,
      bucketSeconds: Long): DataFrame = {
    val micros = bucketSeconds * 1000000L
    val cnt = df
      .where(col(tsCol).isNotNull && col(typeCol).isNotNull)
      .select(col(typeCol).as("__ty"),
        expr(s"unix_micros($tsCol) div $micros").as("__idx"))
      .groupBy("__ty", "__idx").agg(count(lit(1)).as("__c"))
    cnt.groupBy("__ty")
      .agg(min(col("__idx")).as("__lo"), max(col("__idx")).as("__hi"))
      .select(col("__ty"),
        explode(sequence(col("__lo"), col("__hi"))).as("__idx"))
      .join(cnt, Seq("__ty", "__idx"), "left")
      .select(col("__ty"), col("__idx"),
        coalesce(col("__c"), lit(0L)).as("__c"))
  }

  /** Per-type autocorrelation of bucketed event counts at lags
    * 1..maxLag — [[crossCorrelation]] turned on a single series: the
    * seasonality/self-excitation readout (a daily cycle spikes lag
    * 24 on hourly buckets; retry storms decay geometrically from lag
    * 1) that decides resampling windows and anomaly baselines.
    *
    * Exactness — unlike [[crossCorrelation]]'s float `corr`, the ACF
    * here is an exact integer identity until ONE double division:
    * with n buckets and count sum S, `r_k·(den·n²) = num_k·n²` where
    * `num_k·n² = Σ_{t≤n−k} (n·c_t − S)(n·c_{t+k} − S)` and
    * `den·n² = Σ_t (n·c_t − S)²` — both DECIMAL(38,0) sums of exact
    * products (mean-centering multiplied through by n, so no
    * rational mean ever materializes). Order-free integer sums →
    * bit-identical cross-engine. Constant series (den = 0) emit null
    * r. Buckets are ZERO-FILLED over each type's [min, max] range
    * (gap-skipping would corrupt every lag alignment).
    *
    * Scale shape: one bucketed count (map-side combined), one
    * per-type grid explode, the lag fan-out (grid × maxLag rows)
    * joined back on (type, idx+lag) — equi-join, never pairwise over
    * events — and per-(type, lag) aggregates; per-type one-row
    * moment frames broadcast. Output is types × lags.
    *
    * Returns `(event_type, lag, n_buckets, n_pairs, r)`.
    */
  def autocorrelation(
      df: DataFrame, tsCol: String, typeCol: String,
      bucketSeconds: Long = 3600L, maxLag: Int = 6): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    require(maxLag >= 1 && maxLag <= 512, "maxLag in [1, 512]")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val grid = bucketCounts(df, tsCol, typeCol, bucketSeconds)
      .transform(graft.core.CacheScope.disk)
    val moments = grid.groupBy("__ty")
      .agg(count(lit(1)).as("__n"), sum(col("__c")).as("__s"),
        sum(dec(col("__c")) * dec(col("__c"))).as("__q"))
    // den·n² = Σ(n·c − S)² = n²Q − 2nS·S + nS² = n·(n·Q − S²)
    val den = dec(col("__n")) *
      (dec(col("__n")) * col("__q") - dec(col("__s")) * dec(col("__s")))
    val lagged = grid
      .select(col("__ty"), col("__idx"), col("__c"),
        explode(sequence(lit(1), lit(maxLag))).as("lag"))
      .withColumn("__jidx", col("__idx") + col("lag"))
      .join(grid.select(col("__ty"), col("__idx").as("__jidx"),
        col("__c").as("__c2")), Seq("__ty", "__jidx"))
    lagged
      .join(broadcast(moments), Seq("__ty"))
      .groupBy(col("__ty"), col("lag"))
      .agg(max(col("__n")).as("n_buckets"),
        count(lit(1)).as("n_pairs"),
        sum((dec(col("__n")) * dec(col("__c")) - dec(col("__s"))) *
          (dec(col("__n")) * dec(col("__c2")) - dec(col("__s"))))
          .as("__num"),
        max(den).as("__den"))
      .select(col("__ty").as("event_type"), col("lag"),
        col("n_buckets"), col("n_pairs"),
        round(when(col("__den") > 0,
          col("__num").cast("double") / col("__den").cast("double")),
          6).as("r"))
  }

  /** Per-type burstiness of bucketed event counts — the Fano factor
    * `var/mean` (1 = Poisson; ≫ 1 = clumped arrivals; < 1 =
    * regular/paced) and the Goh–Barabási burstiness
    * `B = (σ − μ)/(σ + μ)` ∈ (−1, 1) — the two standard "is this
    * stream machine-like or bursty" numbers behind rate-limit
    * sizing and bot screening, over the same zero-filled grid as
    * [[autocorrelation]].
    *
    * Exactness: with n buckets, S = Σc, Q = Σc² (DECIMAL-exact),
    * sample variance multiplies through as `(n·Q − S²)/(n(n−1))` and
    * `fano = (n·Q − S²)/((n−1)·S)` — each one double division of
    * exact decimals; σ is one correctly-rounded sqrt and B one
    * mirrored formula. Degenerate cases are null: fano for S = 0,
    * both for n < 2, B when σ + μ = 0.
    *
    * Scale shape: one map-side-combined bucketed count, the per-type
    * grid explode, one type-domain-sized aggregate.
    *
    * Returns `(event_type, n_buckets, n_events, mean_rate, fano,
    * burstiness)`.
    */
  def burstiness(
      df: DataFrame, tsCol: String, typeCol: String,
      bucketSeconds: Long = 3600L): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val m = bucketCounts(df, tsCol, typeCol, bucketSeconds)
      .groupBy("__ty")
      .agg(count(lit(1)).as("n_buckets"), sum(col("__c")).as("n_events"),
        sum(dec(col("__c")) * dec(col("__c"))).as("__q"))
    val n = col("n_buckets")
    val s = col("n_events")
    val varNum = (dec(n) * col("__q") - dec(s) * dec(s)).cast("double")
    val mean = s.cast("double") / n.cast("double")
    val variance = varNum / (n.cast("double") * (n.cast("double") - 1.0))
    val sigma = sqrt(variance)
    m.select(col("__ty").as("event_type"), n, s,
      round(mean, 6).as("mean_rate"),
      round(when(n > 1 && s > 0,
        varNum / ((n.cast("double") - 1.0) * s.cast("double"))), 6)
        .as("fano"),
      round(when(n > 1 && sigma + mean > 0.0,
        (sigma - mean) / (sigma + mean)), 6).as("burstiness"))
  }

  /** Spearman rank correlation per group — the monotone-association
    * measure that survives what breaks Pearson: outliers (a single
    * 10⁶× price row saturates covariance; ranks cap its leverage at
    * "largest") and nonlinear-but-monotone relations (quantity vs
    * revenue is multiplicative — Pearson under-reads it, Spearman
    * sees the monotone map exactly).
    *
    * Exact integer core: average-tie ranks per variable come from the
    * per-distinct-value cumulative shape (counts per (group, value),
    * running sum over values — never a per-row window), in HALF-UNITS
    * so ties stay integral (`rank2 = 2·cum_before + t + 1`); rows
    * join their two rank2 values back by (group, value). Pearson on
    * rank2 is then all-integer until one final division:
    * Σ rank2 per variable is the closed form `n(n+1)` (rank sums are
    * invariant under tie-averaging), and Σ rank2², Σ rank2x·rank2y
    * accumulate in DECIMAL(38,0) (a 2·10⁹-row group's products pass
    * 2^63). `ρ = (n·Sxy − SxSy) / √((n·Sxx − Sx²)(n·Syy − Sy²))`
    * evaluates the exact decimal numerators in double only at the
    * division — bit-reproducible across engines. (The halving scale
    * factors cancel: rank2 = 2·rank applied to BOTH variables leaves
    * ρ unchanged.)
    *
    * Degenerate groups (all x tied or all y tied — zero rank
    * variance) emit null ρ rather than 0/0.
    *
    * Scale shape: two (group, value)-keyed grouped counts with
    * group-partitioned running sums over DISTINCT values (bounded by
    * distinct-value counts), two row-frame joins keyed (group,
    * value), one map-side-combined group aggregate. Output is
    * group-domain-sized.
    *
    * Returns `(group…, n, rho)`.
    */
  def spearmanCorr(
      df: DataFrame, xCol: String, yCol: String,
      groupCols: Seq[String]): DataFrame = {
    // rank on the NATIVE value — casting to double first would merge
    // distinct integral values above 2^53 (BIGINT fixed-point scores
    // like q254's 1e12-unit centralities are the realistic input), and
    // ranks only need the column's own ordering, never its arithmetic
    val rows = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(groupCols.map(col) ++ Seq(
        col(xCol).as("__x"), col(yCol).as("__y")): _*)
      .transform(graft.core.CacheScope.disk)
    def rank2Of(vcol: String, out: String): DataFrame = {
      val w = Window.partitionBy(groupCols.map(col): _*)
        .orderBy(col(vcol).asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      rows.groupBy(groupCols.map(col) :+ col(vcol): _*)
        .agg(count(lit(1)).as("__t"))
        .withColumn(out,
          lit(2L) * coalesce(sum(col("__t")).over(w), lit(0L)) +
            col("__t") + lit(1L))
        .drop("__t")
    }
    val withRanks = rows
      .join(rank2Of("__x", "__rx"), groupCols :+ "__x")
      .join(rank2Of("__y", "__ry"), groupCols :+ "__y")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val agg = withRanks.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(dec(col("__rx")) * dec(col("__ry"))).as("__sxy"),
        sum(dec(col("__rx")) * dec(col("__rx"))).as("__sxx"),
        sum(dec(col("__ry")) * dec(col("__ry"))).as("__syy"))
    // Σ rank2 = n(n+1) exactly, both variables (cast before the
    // product — a 3·10⁹-row group's n(n+1) passes 2^63)
    val s = dec(col("n")) * (dec(col("n")) + lit(1L))
    val nDec = dec(col("n"))
    val covN = (nDec * col("__sxy") - s * s).cast("double")
    val varX = (nDec * col("__sxx") - s * s).cast("double")
    val varY = (nDec * col("__syy") - s * s).cast("double")
    agg.select(groupCols.map(col) ++ Seq(
      col("n"),
      round(when(varX > 0.0 && varY > 0.0,
        covN / sqrt(varX * varY)), 6).as("rho")): _*)
  }

  /** Fixed-point integer HITS (hubs & authorities) over a DIRECTED
    * distinct edge list — the bipartite-role sibling of [[pageRank]]:
    * `iters` synchronous rounds of `h(u) = Σ_{u→v} a(v)` then
    * `a(v) = Σ_{u→v} h(u)`, each side L1-normalized to 1e12
    * fixed-point units after its half-round. On a purchase graph
    * customers score as hubs (they point at many good suppliers) and
    * suppliers as authorities (pointed at by many good customers) —
    * the two-sided "who matters" ranking PageRank's single score
    * conflates.
    *
    * Exactness contract: scores live in BIGINT 1e12 units (init
    * `1e12 div n` per node — sides renormalize to Σ ≤ 1e12 every
    * half-round, so every per-node raw sum is ≤ 1e12); the
    * normalization `raw·1e12 div total` computes through
    * DECIMAL(38,0) (the numerator is ~1e24 — past 2^63; Spark's
    * IntegralDivide returns BIGINT, truncation toward zero, matching
    * DuckDB HUGEINT `//` exactly), and the raw-sum TOTAL also
    * accumulates in DECIMAL(38,0) (Σ_v indeg(v)·a(v) overflows BIGINT
    * at hub degrees ~10⁷). Results are bit-identical across engines
    * and partitionings. L1 rather than the classical L2 norm on
    * purpose: the L1 total is an exact integer sum (L2 needs a
    * square root — no longer integer-exact), and normalization
    * choice does not change the RANKING either way.
    *
    * Mass semantics ([[pageRank]]'s dangling note, adapted): nodes
    * with no out-edges have h = 0, nodes with no in-edges have a = 0
    * — their previous-round mass leaves the system at the next
    * normalization (HITS concentrates mass on the connected core;
    * that is the algorithm, not a leak). Per-round `div` floors drop
    * < n units/round.
    *
    * Scale shape: the edge list persists once, repartitioned+sorted
    * on `__src` (and a dst-keyed twin) so each half-round's join
    * re-sorts only the score side; per-node sums are map-side
    * combined; totals ride a broadcast one-row frame; per-round
    * lineage truncates via `localCheckpoint`. Per-round shuffle of
    * the contribution aggregate is inherent, as in [[pageRank]].
    *
    * Returns `(node, hub_scaled, auth_scaled)` — one row per node in
    * the edge list's node universe.
    */
  def hits(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 4): DataFrame = {
    require(iters >= 1 && iters <= 64, "iters in [1, 64]")
    val scale = 1000000000000L // 1e12 fixed-point unit
    val e = edges
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .where(col("__src").isNotNull && col("__dst").isNotNull)
      .distinct()
      .transform(graft.core.CacheScope.disk)
    // src-sorted and dst-sorted twins: each half-round joins scores on
    // ONE side; pre-sorting both orientations keeps every round's
    // per-edge join a sort-merge against cached order
    val bySrc = e.repartition(col("__src"))
      .sortWithinPartitions("__src")
      .transform(graft.core.CacheScope.disk)
    val byDst = e.repartition(col("__dst"))
      .sortWithinPartitions("__dst")
      .transform(graft.core.CacheScope.disk)
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst"))).distinct()
      .transform(graft.core.CacheScope.disk)
    val n = nodes.count()
    // renormalize `raw` (node-keyed sums) to Σ = scale in exact
    // decimal arithmetic; nodes absent from `raw` score 0
    def normalized(raw: DataFrame, outCol: String): DataFrame = {
      val tot = raw.agg(
        sum(col("__raw").cast("decimal(38,0)")).as("__tot"))
      nodes.join(raw, Seq("node"), "left")
        .crossJoin(broadcast(tot))
        .select(col("node"),
          coalesce(
            expr(s"(cast(__raw as decimal(38,0)) * $scale) div __tot"),
            lit(0L)).as(outCol))
        .localCheckpoint()
    }
    var auth = nodes.select(col("node"),
      lit(scale / n).as("auth_scaled")).localCheckpoint()
    var hub = auth.select(col("node"), col("auth_scaled").as("hub_scaled"))
    for (_ <- 1 to iters) {
      val hraw = bySrc
        .join(auth.select(col("node").as("__dst"),
          col("auth_scaled").as("__s")), Seq("__dst"))
        .groupBy(col("__src").as("node"))
        .agg(sum(col("__s")).as("__raw"))
      hub = normalized(hraw, "hub_scaled")
      val araw = byDst
        .join(hub.select(col("node").as("__src"),
          col("hub_scaled").as("__s")), Seq("__src"))
        .groupBy(col("__dst").as("node"))
        .agg(sum(col("__s")).as("__raw"))
      auth = normalized(araw, "auth_scaled")
    }
    hub.join(auth, Seq("node"))
  }
}
