package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset-splitting operators for
  * training-data pipelines: hash-based train/val/test splits, exact
  * stratified samples, and per-group samples.
  *
  * Everything here keys on a content hash (md5 of a salt + the row's
  * id), never on `rand()` or row position:
  *   - reproducible across runs, engines, partitionings, and cluster
  *     sizes — the split a 100 TB job computes today is the split it
  *     recomputes next month;
  *   - rows keep their assignment when the table grows (new ids hash
  *     independently), so incremental pipelines never reshuffle old
  *     rows between train and test — the property position-based or
  *     rand()-based splits cannot give;
  *   - salt changes produce an independent resample.
  *
  * Scale: [[splitColumn]] / [[hashSplit]] are pure column expressions
  * (no shuffle, whole-stage codegen); [[stratifiedSampleExact]] and
  * [[perGroupSample]] pay one shuffle on the stratum key with a
  * per-partition sort — their hash-threshold variant
  * [[stratifiedSampleByHash]] is shuffle-free and the 100 TB default
  * when exact per-stratum counts aren't mandated.
  */
object Sampling {

  /** Uniform [0, 1) hash of an arbitrary key string: first 8 hex chars
    * of md5(key) scaled by 2^32 — engine-portable (DuckDB md5 of the
    * same string yields the same hex) and uniform to ~9 decimal
    * digits, plenty for split fractions. Callers that need a
    * per-row-varying salt (e.g. one draw per (epoch, id) in
    * [[mixture]]) build the key column themselves.
    */
  def hashFractionOf(key: Column): Column =
    conv(substring(md5(key), 1, 8), 16, 10).cast("long") /
      lit(4294967296.0)

  /** [[hashFractionOf]] with the conventional key layout
    * salt || id-as-string.
    */
  def hashFraction(id: Column, salt: String): Column =
    hashFractionOf(concat(lit(salt), id.cast("string")))

  /** Split-label column: assigns each row to the first split whose
    * cumulative weight bound exceeds the row's [[hashFraction]].
    * `splits` are (label, weight) with weights summing to ~1.0 (the
    * last split absorbs rounding).
    */
  def splitColumn(
      id: Column, splits: Seq[(String, Double)],
      salt: String = "split"): Column = {
    require(splits.nonEmpty, "at least one split")
    val h = hashFraction(id, salt)
    // pin cumulative bounds to 9 decimals: 0.8 + 0.1 accumulates to
    // 0.9000000000000001 in binary, and the bound must equal the
    // literal another engine would write (h's 2^-32 granularity can't
    // distinguish them, but the pinned value removes the question)
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail
      .map(b => math.rint(b * 1e9) / 1e9)
    val init: Column = lit(splits.last._1)
    splits.init.zip(bounds.init).reverse.foldLeft(init) {
      case (acc, ((label, _), bound)) => when(h < bound, label).otherwise(acc)
    }
  }

  /** Tag every row with its split label (e.g. train/val/test). Pure
    * projection — no shuffle, no action, stable under any partitioning.
    */
  /** Stratified k-fold assignment — the cross-validation splitter
    * with a BALANCE GUARANTEE: within every stratum, rows are ordered
    * by (md5(salt‖id), id) and dealt round-robin, so each fold holds
    * ⌈n_s/k⌉ or ⌊n_s/k⌋ rows of stratum s (±1 by construction, not
    * by hash luck — plain `md5 mod k` folds drift ±√n, which skews
    * small strata). Deterministic in (salt, id): re-running or
    * repartitioning never moves a row between folds.
    *
    * Scale shape: the per-stratum rank rides
    * [[graft.operators.Analytics.rankByRange]] (range-partitioned
    * two-pass — a plain per-stratum window would sort each stratum
    * in ONE task, and strata are few and large by nature). One
    * data-sized shuffle, one narrow offset table.
    *
    * Returns `df` plus `foldCol` (0-based int).
    */
  def stratifiedKFold(
      df: DataFrame, idCol: String, stratumCol: String, k: Int,
      foldCol: String = "fold", salt: String = "fold"): DataFrame = {
    require(k >= 2, "k must be at least 2")
    val ranked = graft.operators.Analytics.rankByRange(
      df, Seq(stratumCol),
      Seq(md5(concat_ws(":", lit(salt), col(idCol).cast("string"))).asc,
        col(idCol).asc),
      "__kfr")
    ranked
      .withColumn(foldCol, ((col("__kfr") - 1L) % k).cast("int"))
      .drop("__kfr")
  }

  def hashSplit(
      df: DataFrame, idCol: String, splits: Seq[(String, Double)],
      salt: String = "split"): DataFrame =
    df.withColumn("split", splitColumn(col(idCol), splits, salt))

  /** Approximate stratified sample: keeps each row whose
    * [[hashFraction]] < `fraction`, independently per row. Per-stratum
    * counts are binomial around fraction·n (not exact), but the
    * operator is a shuffle-free scan — the scale default.
    */
  def stratifiedSampleByHash(
      df: DataFrame, idCol: String, fraction: Double,
      salt: String = "sample"): DataFrame =
    df.where(hashFraction(col(idCol), salt) < fraction)

  /** EXACT stratified sample: for each stratum, keeps exactly
    * ceil(fraction · stratum_size) rows — the ones with the smallest
    * hash (deterministic, id tie-break). One shuffle on the stratum
    * key + per-partition sort; prefer [[stratifiedSampleByHash]] when
    * binomial counts are acceptable.
    */
  def stratifiedSampleExact(
      df: DataFrame, idCol: String, stratumCols: Seq[String],
      fraction: Double, salt: String = "sample"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction in [0,1]")
    val w = Window.partitionBy(stratumCols.map(col): _*)
      .orderBy(hashFraction(col(idCol), salt).asc, col(idCol).asc)
    val cw = Window.partitionBy(stratumCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cw))
      .where(col("__rn") <= ceil(col("__n") * lit(fraction)))
      .drop("__rn", "__n")
  }

  /** Deterministic weighted sample WITHOUT replacement (Efraimidis–
    * Spirakis A-RES): each row gets the key ln(u)/w with
    * u = [[hashFraction]] and w = its weight; the k largest keys are
    * the sample, so inclusion probability scales with weight while
    * membership stays pinned by the hash — reproducible across runs
    * and partitionings, like every sampler here. Rows with null or
    * non-positive weight are excluded.
    *
    * Determinism bound: u is exact (md5 arithmetic), but ln(u) is the
    * platform libm's, correctly-rounded only to ~1 ulp — so the key is
    * engine-portable to ~1e-15 relative precision, not bit-for-bit.
    * WITHIN an engine the ordering (key desc, then id asc) is total
    * and reproducible even when two keys agree to the last ulp
    * (adversarial-tie spec); ACROSS engines a pair of keys closer than
    * ~1e-15·|key| can swap, flipping sample membership at the k-th
    * rank boundary. Real-weight corpora put adjacent order-statistic
    * gaps far above that (the q62 oracle hash-matches DuckDB at every
    * tested sf); callers needing a hard cross-engine guarantee should
    * quantize weights so keys cannot tie within the libm band.
    *
    * Scale: the top-k plans as TakeOrderedAndProject (per-partition
    * top-k, k·partitions rows to the driver merge) — no global sort,
    * no shuffle of the corpus.
    */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String, k: Int,
      salt: String = "wsample"): DataFrame = {
    require(k >= 1, "k must be positive")
    require(!df.columns.contains("__wkey"),
      "input must not have a column named __wkey")
    val w = col(weightCol).cast("double")
    df.where(w.isNotNull && w > 0)
      .withColumn("__wkey", log(hashFraction(col(idCol), salt)) / w)
      .orderBy(col("__wkey").desc, col(idCol).asc)
      .limit(k)
      .drop("__wkey")
  }

  /** Deterministic n-per-group sample (the distributed analogue of
    * reservoir sampling with a fixed seed): the `n` rows with the
    * smallest hash in each group. One shuffle on the group key.
    */
  def perGroupSample(
      df: DataFrame, idCol: String, groupCols: Seq[String], n: Int,
      salt: String = "sample"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(hashFraction(col(idCol), salt).asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n)
      .drop("__rn")
  }

  /** [[perGroupSample]] with a count-aware hash pre-filter — the
    * skew-safe form for per-domain quota capping at corpus scale.
    *
    * [[perGroupSample]] sorts EVERY row of a group inside one window
    * partition; with a per-domain cap of 1 000 against a domain
    * holding 10 B rows, that is a 10 B-row sort on one task — the
    * classic skew killer. Here a first aggregation counts each group
    * (one narrow row per group), then only rows whose
    * [[hashFraction]] falls below (n + margin)/group_count survive to
    * the window, so the sorted set is ~n + margin rows per group
    * REGARDLESS of group size, and the exchange never carries the
    * pruned rows. The counts table carries no broadcast HINT: group
    * cardinality is data-dependent (per-domain capping of a web corpus
    * is ~10⁸ domains) — AQE broadcasts it when it is actually small
    * and degrades to a shuffle join instead of an OOM when it isn't.
    *
    * The result equals [[perGroupSample]] (same hash order, same
    * tie-break — null group keys form a group of their own on both
    * paths, hence the null-safe join) unless fewer than n of a group's
    * rows hash under the threshold. margin = 8·√n + 40 puts that more
    * than 8 binomial standard deviations out (per-group miss
    * probability < 1e-15; groups smaller than n + margin are never
    * filtered at all). The exact-at-any-odds alternative is a second
    * pass over deficient groups — the trade Spark's own
    * `sampleByKeyExact` makes; at that point the one-phase form is
    * simpler.
    */
  def cappedPerGroupSample(
      df: DataFrame, idCol: String, groupCols: Seq[String], n: Int,
      salt: String = "sample"): DataFrame = {
    require(n >= 1, "n must be positive")
    val reserved = Set("__gn", "__rn") ++ groupCols.map("__g_" + _)
    require(!df.columns.exists(reserved),
      s"input must not have columns named ${reserved.mkString(", ")}")
    // null-safe (<=>) join: window partitionBy groups null keys
    // together, so the counts join must match them too — a plain
    // equi-join would silently drop every null-key row
    val counts = groupCols.foldLeft(
        df.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as("__gn"))) {
      (d, c) => d.withColumnRenamed(c, "__g_" + c)
    }
    val joinCond = groupCols.map(c => col(c) <=> col("__g_" + c))
      .reduce(_ && _)
    val margin = 8.0 * math.sqrt(n.toDouble) + 40.0
    val h = hashFraction(col(idCol), salt)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(h.asc, col(idCol).asc)
    df.join(counts, joinCond)
      .where(h < least(lit(1.0), lit(n + margin) / col("__gn")))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n)
      .select(df.columns.map(col).toIndexedSeq: _*) // input column order
  }

  /** Training-mixture construction: re-emit each row `weight(group)`
    * times in expectation, as full epochs plus one hash-sampled
    * fractional epoch. A weight of 2.5 yields every row in epochs 0
    * and 1 plus a deterministic 50 % subset in epoch 2; 0.25
    * downsamples to a quarter; 0 drops the group. Each epoch's
    * fractional draw is salted with the epoch number, so the subsets
    * of different epochs are independent — and, like every sampler
    * here, membership is pinned by md5, so the mixture is
    * reproducible across runs, engines, and partitionings, and grows
    * incrementally (new rows hash independently; old rows never flip
    * epochs).
    *
    * Scale: a pure generate-and-filter projection — `explode` of a
    * ≤ ceil(weight)+1 element sequence per row, zero shuffle, stays
    * in whole-stage codegen. Output carries an `epoch` column (0-based)
    * so downstream shuffling/packing can interleave epochs.
    */
  def mixture(
      df: DataFrame, idCol: String, groupCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0,
      salt: String = "mix"): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ >= 0.0),
      "weights must be non-negative")
    require(!df.columns.exists(Set("__w", "epoch")),
      "input must not have columns named __w or epoch")
    // sorted for a deterministic when-chain (Map order is not)
    val w = weights.toSeq.sortBy(_._1).foldLeft(lit(defaultWeight)) {
      case (acc, (g, wt)) =>
        when(col(groupCol) === lit(g), lit(wt)).otherwise(acc)
    }
    df.withColumn("__w", w)
      .withColumn("epoch",
        explode(sequence(lit(0), floor(col("__w")).cast("int"))))
      .where(col("epoch") < floor(col("__w")) ||
        hashFractionOf(concat(lit(salt), col("epoch").cast("string"),
          lit(":"), col(idCol).cast("string")))
          < col("__w") - floor(col("__w")))
      .drop("__w")
  }

  /** Leakage-aware split: assign train/val/test by near-duplicate
    * CLUSTER, not by document, so near-copies of a training document
    * can never land in the eval split (the standard
    * contamination-by-split hazard hash-per-id splitting leaves open).
    * `labels` is an (id, component) frame — e.g. connected components
    * over verified MinHash-LSH pairs; unlabeled rows are singleton
    * clusters (their own representative). All members of a component
    * share its representative's hash draw, hence its split.
    *
    * Scale: `labels` is the labeled-vertex set of the near-dup graph —
    * usually disk-small next to the corpus (only docs WITH a verified
    * duplicate appear), but on a high-duplication corpus it can be a
    * large fraction of n, so there is deliberately no broadcast HINT:
    * AQE broadcasts the join when the label set is actually small and
    * falls back to a shuffle join (instead of a driver OOM) when it
    * isn't. `rep` stays in the input id type (string / UUID ids work;
    * the split hash keys on the string rendering either way).
    */
  def splitByCluster(
      df: DataFrame, idCol: String, labels: DataFrame,
      labelIdCol: String, componentCol: String,
      splits: Seq[(String, Double)],
      salt: String = "split"): DataFrame = {
    val reps = labels.select(col(labelIdCol).as(idCol),
      col(componentCol).as("__rep"))
    df.join(reps, Seq(idCol), "left")
      .withColumn("rep", coalesce(col("__rep"), col(idCol)))
      .drop("__rep")
      .withColumn("split", splitColumn(col("rep"), splits, salt))
  }

  /** Temperature-scaled mixture weights — the multilingual /
    * multi-source "α-sampling" knob (sample group g with probability
    * q_g ∝ p_g^α instead of its natural share p_g, α < 1 upweighting
    * low-resource groups): per group, the repetition factor
    * `weight = q_g / p_g = p_g^(α−1) / Σ_h p_h^α` to feed [[mixture]].
    * That normalization makes the reweighted corpus SIZE-PRESERVING
    * exactly — Σ_g n_g · w_g = N — so temperature changes the mix, not
    * the token budget. α = 1 is the identity (every weight 1); α = 0
    * equalizes groups (q uniform).
    *
    * Weighting by `sizeCol` (token counts) instead of rows changes n_g
    * to token mass — the published convention; default row-count.
    *
    * One aggregation on the group key; everything after operates on
    * the G-row group table (a second tiny agg for the normalizer,
    * joined back — never the corpus). Returns (group, n, p, q,
    * weight); [[mixtureWeights]] collects it to the `Map` form
    * [[mixture]] takes (driver-bounded by group cardinality — for
    * per-domain weighting at web scale keep the frame form and join).
    */
  def temperatureWeights(
      df: DataFrame, groupCol: String, alpha: Double,
      sizeCol: Option[String] = None): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0,
      s"alpha must be in [0, 1], got $alpha")
    val mass = sizeCol match {
      case Some(c) => sum(coalesce(col(c).cast("double"), lit(0.0)))
      case None => count(lit(1)).cast("double")
    }
    val groups = df.groupBy(col(groupCol).as("group"))
      .agg(mass.as("n"))
      .transform(graft.core.CacheScope.disk)
    val tot = groups.agg(sum(col("n")).as("__N"))
    val withP = groups.crossJoin(tot)
      .withColumn("p", col("n") / col("__N"))
      .withColumn("__pa", pow(col("p"), alpha))
    val z = withP.agg(sum(col("__pa")).as("__Z"))
    withP.crossJoin(z)
      .withColumn("q", col("__pa") / col("__Z"))
      .withColumn("weight", col("q") / col("p"))
      .select("group", "n", "p", "q", "weight")
  }

  /** [[temperatureWeights]] as the `Map[String, Double]` form
    * [[mixture]] consumes (string-rendered group keys; null group →
    * key "null"). Collects one row per group — fine for
    * language/source mixing, not for web-scale per-domain weighting.
    */
  def mixtureWeights(
      df: DataFrame, groupCol: String, alpha: Double,
      sizeCol: Option[String] = None): Map[String, Double] =
    temperatureWeights(df, groupCol, alpha, sizeCol)
      .collect()
      .map(r => String.valueOf(r.get(0)) -> r.getDouble(4))
      .toMap

  /** Data-constrained epoch allocation (after Muennighoff et al.
    * 2023, "Scaling Data-Constrained Language Models": repeating data
    * holds its value for ~4 epochs, then decays — so a training
    * budget larger than the corpus should REPEAT good sources up to a
    * cap, not scrape the bottom of bad ones). Water-filling: each
    * round hands every un-capped source its `weightCol`-proportional
    * slice of the remaining budget, clipped at `maxEpochsMilli`
    * thousandths of an epoch over its `tokCol` unique tokens; budget
    * freed by capped sources redistributes to un-capped ones on the
    * next round. `rounds` fixed rounds unroll in the PLAN (no
    * driver loop over data, no actions): each is one ungrouped
    * aggregate broadcast back over the per-source frame.
    *
    * All arithmetic is exact BIGINT floor-division — deterministic
    * across engines and partitionings. Exactness contract:
    * `remaining_budget × max(weight)` must fit in Int64, so at
    * corpus scale pass token counts and budget in consistent COARSE
    * units (mega-tokens) rather than raw tokens. Rows with
    * non-positive `tokCol` or `weightCol` are excluded (they can
    * absorb no budget and would divide by zero).
    *
    * Output per source: (srcCol, unique_tokens, weight,
    * allocated_tokens, epochs_milli, capped).
    */
  def epochAllocation(
      df: DataFrame, srcCol: String, tokCol: String, weightCol: String,
      budget: Long, maxEpochsMilli: Long = 4000L,
      rounds: Int = 3): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(maxEpochsMilli > 0, "maxEpochsMilli must be positive")
    require(rounds >= 1, "at least one round")
    var cur = df
      .select(col(srcCol),
        col(tokCol).cast("long").as("__u"),
        col(weightCol).cast("long").as("__w"))
      .where(col("__u") > 0 && col("__w") > 0)
      .withColumn("__cap", expr(s"(__u * $maxEpochsMilli) div 1000"))
      .withColumn("__alloc", lit(0L))
    for (_ <- 1 to rounds) {
      val tot = cur.agg(
        sum(when(col("__alloc") < col("__cap"), col("__w"))
          .otherwise(lit(0L))).as("__actw"),
        sum(col("__alloc")).as("__spent"))
      cur = cur.crossJoin(broadcast(tot))
        .withColumn("__add",
          when(col("__alloc") < col("__cap") && col("__actw") > 0,
            expr(s"(($budget - __spent) * __w) div __actw"))
            .otherwise(lit(0L)))
        .withColumn("__alloc",
          least(col("__cap"), col("__alloc") + col("__add")))
        .drop("__actw", "__spent", "__add")
    }
    cur.select(col(srcCol),
      col("__u").as("unique_tokens"),
      col("__w").as("weight"),
      col("__alloc").as("allocated_tokens"),
      expr("(__alloc * 1000) div __u").as("epochs_milli"),
      (col("__alloc") === col("__cap")).as("capped"))
  }

  /** PPS Poisson sample + Horvitz–Thompson estimation: include each
    * row with probability proportional to its weight
    * (p_i = min(1, k·w_i/W), expected sample size k), then estimate
    * per-group row counts and weight totals from the SAMPLE alone via
    * inverse-probability weighting — the survey-sampling answer to
    * "report corpus statistics without scanning the corpus": at
    * 100 TB the standing sample is what monitoring reads, and HT
    * correction is what makes its totals unbiased rather than
    * sample-composition artifacts.
    *
    * Exactness, cross-engine: the inclusion test never touches a
    * float — row i is sampled iff h32·W < k·w_i·2³², where h32 is the
    * md5-first-8-hex integer (the [[hashFraction]] family), an exact
    * BIGINT cross-multiplication (p_i = 1 rows satisfy it for every
    * h32 by construction). Inverse probabilities are micro-quantized
    * integral divisions ⌊W·10⁶/(k·w_i)⌋ (p < 1) or exactly 10⁶
    * (p = 1), summed order-free — in DECIMAL(38,0), since a single
    * 1/p_min can reach W·10⁶/k and the group sum multiplies that by
    * the sample. One final /10⁶ per output column, rounded to 4.
    *
    * Rows with non-positive weight have p = 0 and are OUTSIDE the
    * estimable domain — excluded from the true totals too (the
    * comparison must be like-for-like). Output per group: true
    * n_rows/total_weight (for the audit; a production monitor would
    * omit them) beside n_sampled, ht_rows, ht_weight.
    *
    * Scale: one global weight-total aggregate (broadcast back), one
    * filter, one grouped aggregate — the corpus is never shuffled.
    */
  def ppsHorvitzThompson(
      df: DataFrame, idCol: String, weightCol: String,
      groupCols: Seq[String], expectedK: Int,
      salt: String = "pps"): DataFrame = {
    require(expectedK >= 1, "expectedK must be positive")
    val w = col(weightCol).cast("long")
    val rows = df.where(w.isNotNull && w > 0)
      .select(groupCols.map(col) ++ Seq(col(idCol).as("__id"),
        w.as("__w")): _*)
    val tot = rows.agg(sum(col("__w")).as("__totw"))
    val h32 = conv(substring(md5(concat(lit(salt),
      col("__id").cast("string"))), 1, 8), 16, 10).cast("long")
    val inSample = h32 * col("__totw") <
      lit(expectedK.toLong * 4294967296L) * col("__w")
    val invPMicro = when(
      lit(expectedK.toLong) * col("__w") >= col("__totw"),
      lit(1000000L).cast("decimal(38,0)"))
      .otherwise(expr(s"(CAST(__totw AS DECIMAL(38,0)) * 1000000) " +
        s"div ($expectedK * __w)").cast("decimal(38,0)"))
    rows.crossJoin(broadcast(tot))
      .withColumn("__in", inSample)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("__w")).as("total_weight"),
        sum(when(col("__in"), 1L).otherwise(0L)).as("n_sampled"),
        sum(when(col("__in"), invPMicro)
          .otherwise(lit(0L).cast("decimal(38,0)"))).as("__hr"),
        sum(when(col("__in"),
          invPMicro * col("__w").cast("decimal(38,0)"))
          .otherwise(lit(0L).cast("decimal(38,0)"))).as("__hw"))
      .select(groupCols.map(col) ++ Seq(
        col("n_rows"), col("total_weight"), col("n_sampled"),
        round(col("__hr").cast("double") / 1e6, 4).as("ht_rows"),
        round(col("__hw").cast("double") / 1e6, 4).as("ht_weight")): _*)
  }

  /** Deterministic epoch shuffle + worker sharding: the global
    * training-data order for epoch `e` — a reproducible permutation
    * (md5(salt‖epoch‖id) ranks, different per epoch, identical across
    * runs/engines/partitionings) with round-robin worker assignment,
    * so `numWorkers` data-loader shards are balanced to ±1 row with
    * no coordination. The property `rand().orderBy` cannot give: the
    * order a 100 TB job reads today is the order its restarted retry
    * reads tomorrow, per epoch, per worker.
    *
    * The global rank comes from
    * [[graft.operators.Analytics.rankByRange]] under a constant group
    * — range-sliced two-pass ranking, so no single task ever sorts
    * the corpus (the offset stitch reads ≤ numShufflePartitions
    * rows). Output: input columns + (`order_idx` 1-based global
    * position, `worker` 0-based shard, `worker_pos` 1-based position
    * within the shard).
    */
  def epochOrder(
      df: DataFrame, idCol: String, epoch: Int, numWorkers: Int,
      salt: String = "order"): DataFrame = {
    require(numWorkers >= 1, "numWorkers must be >= 1")
    val reserved = Set("__eo_key", "order_idx", "worker", "worker_pos",
      "__eo_g")
    require(!df.columns.exists(reserved),
      s"input must not have columns named ${reserved.mkString(", ")}")
    val keyed = df
      .withColumn("__eo_key", md5(concat(lit(salt), lit(epoch),
        lit(":"), col(idCol).cast("string"))))
      .withColumn("__eo_g", lit(1))
    graft.operators.Analytics.rankByRange(keyed, Seq("__eo_g"),
        Seq(col("__eo_key").asc, col(idCol).asc), "order_idx")
      .withColumn("worker",
        ((col("order_idx") - 1) % numWorkers).cast("int"))
      .withColumn("worker_pos",
        expr(s"(order_idx - 1) div $numWorkers") + 1)
      .drop("__eo_key", "__eo_g")
  }

  /** Uniform negative sampling for contrastive / recommendation
    * training: for each user with at least one interaction, up to `k`
    * items they did NOT interact with, drawn uniformly (with the
    * engine's deterministic hash, not `rand()`) from the item
    * catalog. The complement set is never materialized — a user who
    * touched 10 of 10⁸ items has ~10⁸ negatives; instead each user
    * gets `k · oversample` candidate DRAWS (item index =
    * md5(salt‖user‖slot) mod catalog size), the drawn candidates
    * anti-join the interaction set, and the first `k` survivors in
    * slot order are kept — so the cost is candidate-sized
    * (users × k·oversample rows) regardless of catalog or
    * interaction volume.
    *
    * Determinism end to end: the catalog gets a dense 1..I index via
    * [[graft.operators.Analytics.rankByRange]] over the total order
    * `itemIdCol` asc (never a global window sort); draws are pure md5
    * arithmetic; duplicate draws of one item keep the MIN slot; the
    * per-user keep-first-`k` window sees ≤ k·oversample rows per user
    * by construction. A user whose unseen-item draws come up short
    * (heavy interactor or tiny catalog) emits fewer than `k` rows —
    * deterministic, and the `n_negatives` consumer can resample with
    * another salt.
    *
    * Shuffles: one on (user, item) for the anti-join + collapse, one
    * on user for the bounded keep-window; the catalog index joins the
    * candidates on the draw index (AQE broadcasts it when small).
    */
  def negativeSample(
      interactions: DataFrame, userCol: String, itemCol: String,
      items: DataFrame, itemIdCol: String, k: Int,
      oversample: Int = 4, salt: String = "neg"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(oversample >= 1, "oversample must be >= 1")
    val m = k * oversample
    val indexed = graft.operators.Analytics.rankByRange(
        items.select(col(itemIdCol).as("__item"))
          .where(col("__item").isNotNull).distinct()
          .withColumn("__g", lit(1)),
        Seq("__g"), Seq(col("__item").asc), "__idx")
      .select(col("__idx"), col("__item"))
    val nItems = indexed.agg(count(lit(1)).as("__ni"))
    val draws = interactions
      .select(col(userCol).as("__user")).where(col("__user").isNotNull)
      .distinct()
      .select(col("__user"),
        explode(sequence(lit(0), lit(m - 1))).as("__slot"))
      .crossJoin(broadcast(nItems))
      .withColumn("__idx",
        pmod(conv(substring(md5(concat(lit(salt),
          col("__user").cast("string"), lit(":"),
          col("__slot").cast("string"))), 1, 8), 16, 10).cast("long"),
          col("__ni")) + 1)
      .join(indexed, Seq("__idx"))
    val seen = interactions
      .select(col(userCol).as("__user"), col(itemCol).as("__item"))
      .where(col("__user").isNotNull && col("__item").isNotNull)
      .distinct()
    val fresh = draws
      .join(seen, Seq("__user", "__item"), "left_anti")
      .groupBy(col("__user"), col("__item"))
      .agg(min(col("__slot")).as("__slot"))
    val w = Window.partitionBy(col("__user"))
      .orderBy(col("__slot").asc, col("__item").asc)
    fresh.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .select(col("__user").as(userCol), col("__item").as(itemCol),
        col("__slot").as("draw_slot"), col("__rk").as("neg_rank"))
  }

  /** Effective sample size and design effect under unit weights —
    * Kish's `ESS = (Σw)² / Σw²`, `deff = n·Σw² / (Σw)²`: how many
    * EQUAL-WEIGHT units a weighted sample is actually worth. The
    * honesty check for every weighted-mixture design on this shelf
    * (temperature weights, source caps, quality-proportional draws):
    * a slice whose deff is 3 delivers a third of its row count in
    * statistical information, and variance estimates that ignore it
    * are overconfident by exactly that factor.
    *
    * Exactness: weights are caller-quantized non-negative integers
    * (micro-units for fractional weights); Σw and Σw² accumulate
    * through DECIMAL(38,0) (a 10⁹-row group of 10⁶-scale weights
    * reaches ~10²¹), and ESS / deff are each ONE mirrored double
    * division of exact decimals — bit-identical cross-engine. Rows
    * with null or negative weight are dropped; zero weights
    * participate (they dilute nothing — w and w² are both 0).
    *
    * Scale shape: one map-side-combined grouped aggregate. Output is
    * group-domain-sized.
    *
    * Returns `(group…, n, w_sum, ess, deff)`; null ess/deff for
    * zero-total-weight groups.
    */
  /** Neyman (optimal) allocation for a stratified sample: given a
    * total budget n, allocate nₕ ∝ Nₕ·Sₕ — strata that are big AND
    * internally varied get the samples; a huge homogeneous stratum
    * needs few. The variance-optimal counterpart of the proportional
    * allocation (also emitted, for the comparison the design review
    * actually reads): under a fixed label/inspection budget this is
    * the difference between measuring the corpus and measuring the
    * easy part of it.
    *
    * Integerization is the largest-remainder (Hamilton) method with
    * a deterministic tie-break (remainder desc, stratum asc), so the
    * allocations sum EXACTLY to the budget and replay exactly: Sₕ
    * comes from exact integer moments (n·Σx² − (Σx)², squares in
    * DECIMAL) through one mirrored sqrt, quotas are mirrored doubles,
    * and the rounding is rank arithmetic. Degenerate strata (n < 2
    * or zero variance) carry weight 0 — they need 0 optimal samples
    * beyond what proportional gives; if EVERY stratum is degenerate
    * the Neyman column falls back to the proportional one.
    *
    * Scale: one grouped aggregation to the stratum table; everything
    * after is stratum-cardinality arithmetic (windows included).
    */
  def neymanAllocation(
      df: DataFrame, stratumCol: String, valueCents: Column,
      budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val x = valueCents.cast("long")
    val strata = df.where(x.isNotNull)
      .select(col(stratumCol).as("stratum"), x.as("__x"))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_rows"), sum(col("__x")).as("__s"),
        sum(dec(col("__x")) * dec(col("__x"))).as("__q"))
      .transform(graft.core.CacheScope.disk)
    val nD = col("n_rows").cast("double")
    val varNum = (dec(col("n_rows")) * col("__q") -
      dec(col("__s")) * dec(col("__s"))).cast("double")
    val std = sqrt(varNum / (nD * (nD - 1.0)))
    val w = when(col("n_rows") < 2L, lit(0.0))
      .otherwise(nD * std)
    def hamilton(tag: String)(in: DataFrame): DataFrame = {
      val tot = in.agg(sum(col(s"__w_$tag")).as(s"__tot_$tag"))
      val quota = lit(budget.toDouble) * col(s"__w_$tag") /
        col(s"__tot_$tag")
      val ranked = in.crossJoin(broadcast(tot))
        .withColumn(s"__flo_$tag", floor(quota).cast("long"))
        .withColumn(s"__rem_$tag", quota - floor(quota))
        // global window over the STRATUM frame — bounded by the
        // stratum domain, not the data (pinned in PlanGateSpec)
        .withColumn(s"__rk_$tag", row_number().over(
          Window.orderBy(col(s"__rem_$tag").desc,
            col("stratum").asc)))
      val short = ranked.agg(
        (lit(budget) - sum(col(s"__flo_$tag"))).as(s"__short_$tag"))
      ranked.crossJoin(broadcast(short))
        .withColumn(s"n_$tag",
          col(s"__flo_$tag") +
            when(col(s"__rk_$tag") <= col(s"__short_$tag"), 1L)
              .otherwise(0L))
    }
    val weighted = strata
      .withColumn("__w_neyman", w)
      .withColumn("__w_prop", nD)
    // all-degenerate corpus: fall back to proportional weights
    val anyW = weighted.agg(sum(col("__w_neyman")).as("__wsum"))
    val base = weighted.crossJoin(broadcast(anyW))
      .withColumn("__w_neyman",
        when(col("__wsum") > 0.0, col("__w_neyman"))
          .otherwise(col("__w_prop")))
    val withNeyman = hamilton("neyman")(base)
    val withBoth = hamilton("prop")(withNeyman)
    withBoth.select(col("stratum").as(stratumCol), col("n_rows"),
      round(when(col("n_rows") < 2L, lit(null).cast("double"))
        .otherwise(std), 4).as("std"),
      col("n_neyman"), col("n_prop"))
  }

  def effectiveSampleSize(
      df: DataFrame, groupCols: Seq[String],
      weight: Column): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val agg = df
      .select(groupCols.map(col) :+ weight.cast("long").as("__w"): _*)
      .where(col("__w").isNotNull && col("__w") >= 0L)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__w")).as("w_sum"),
        sum(dec(col("__w")) * dec(col("__w"))).as("__w2"))
    agg.select(groupCols.map(col) ++ Seq(
      col("n"), col("w_sum"),
      round(when(col("__w2") > 0L,
        (dec(col("w_sum")) * dec(col("w_sum"))).cast("double") /
          col("__w2").cast("double")), 4).as("ess"),
      round(when(col("w_sum") > 0L,
        (dec(col("n")) * col("__w2")).cast("double") /
          (dec(col("w_sum")) * dec(col("w_sum"))).cast("double")), 6)
        .as("deff")): _*)
  }

  /** Ratio estimator per group — the survey-sampling expansion
    * beside [[ppsHorvitzThompson]]: when the target y is measured
    * only on a SAMPLE but a correlated auxiliary x is known for the
    * WHOLE population (bytes on disk vs tokens after cleaning, order
    * count vs spend), `Ŷ_ratio = (Σ_s y / Σ_s x) · X_pop` beats the
    * plain expansion by exactly the y–x correlation — the classical
    * Cochran result and the standard way a 100 TB census is priced
    * from a 0.1 % measured slice. The SRS variance estimate
    * `v(Ŷ) = N²(1 − n/N)·s²_e/n` over the ratio residuals
    * `e_i = y_i − R̂·x_i` is emitted beside the point estimate.
    *
    * Exactness: all sums/counts are exact BIGINTs; R̂ is ONE
    * mirrored double division; each residual SQUARE is computed from
    * that shared R̂ and FLOORED to an integer before the order-free
    * sum (quantize-before-sum at a 1-unit² quantum — residuals are
    * in the caller's value units, e.g. cents, where e² already
    * dwarfs 1; a micro quantum would overflow BIGINT at e ~ 10⁸),
    * then the variance chain is a fixed-order mirrored double
    * expression. Two group-sized passes over the sample (R̂ first,
    * residuals against it), one over the population for X — all
    * map-side combined.
    *
    * Returns `(group…, n_pop, n_sample, x_pop, ratio, y_hat, se)`;
    * groups whose sample Σx is 0 or with n < 2 report nulls.
    */
  def ratioEstimator(
      df: DataFrame, groupCols: Seq[String], sampled: Column,
      xCol: Column, yCol: Column): DataFrame = {
    val gc = groupCols.map(col)
    val base = df.select(gc ++ Seq(
        sampled.cast("boolean").as("__in"),
        xCol.cast("long").as("__x"), yCol.cast("long").as("__y")): _*)
      .where(col("__x").isNotNull && col("__in").isNotNull)
      .transform(graft.core.CacheScope.disk)
    val pop = base.groupBy(gc: _*)
      .agg(count(lit(1)).as("n_pop"), sum(col("__x")).as("x_pop"))
    val sSums = base.where(col("__in") && col("__y").isNotNull)
      .groupBy(gc: _*)
      .agg(count(lit(1)).as("n_sample"), sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"))
      .withColumn("__r", when(col("__sx") > 0L,
        col("__sy").cast("double") / col("__sx").cast("double")))
    val resid = base.where(col("__in") && col("__y").isNotNull)
      .join(sSums.select(gc :+ col("__r"): _*), groupCols)
      .withColumn("__e", col("__y").cast("double") -
        col("__r") * col("__x").cast("double"))
      .withColumn("__e2",
        floor(col("__e") * col("__e")).cast("long"))
      .groupBy(gc: _*)
      .agg(sum(col("__e2")).as("__se2"))
    val joined = pop.join(sSums, groupCols, "left")
      .join(resid, groupCols, "left")
    val n = col("n_sample").cast("double")
    val nPop = col("n_pop").cast("double")
    val yHat = col("__r") * col("x_pop").cast("double")
    val s2e = col("__se2").cast("double") / (n - 1.0)
    val vHat = nPop * nPop * (lit(1.0) - n / nPop) * s2e / n
    val ok = col("n_sample") >= 2L && col("__sx") > 0L
    joined.select(gc ++ Seq(
      col("n_pop"), coalesce(col("n_sample"), lit(0L)).as("n_sample"),
      col("x_pop"),
      round(when(ok, col("__r")), 6).as("ratio"),
      round(when(ok, yHat), 4).as("y_hat"),
      round(when(ok, sqrt(vHat)), 4).as("se")): _*)
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every raw
    * document by how much its hashed-unigram profile looks like a
    * TARGET slice rather than the rest of the corpus. Two
    * add-1-smoothed bag-of-hashed-ngrams models — target vs raw —
    * give per-bucket log-likelihood ratios
    * `λ_b = ln((t_b+1)/(T+B)) − ln((r_b+1)/(R+B))`; a document's
    * importance weight is the count-weighted sum of its tokens' λ.
    * This is THE published cheap recipe for "get me more data shaped
    * like my curated set" at crawl scale — the selection step before
    * the engine's mixture/temperature samplers take over.
    *
    * Exactness: every ln is nano-floored ONCE per bucket/total
    * (`floor(ln·1e9)`, the q308 device, mirrored token-for-token in
    * the oracle), so λ is an exact BIGINT and every document weight
    * is an exact BIGINT sum; `avg_lr_nano` (per-token weight — the
    * ranking key, length-debiased) is one exact integer division.
    * Hash buckets are the engine's md5 device (first 8 hex chars →
    * BIGINT, mod B) — engine-portable by construction.
    *
    * Scale shape: ONE token explode persisted and read twice (the
    * bucket-count pass and the per-doc scoring pass); the λ table is
    * B rows (a broadcast); doc scores are one map-side-combinable
    * grouped sum; top-k plans as TakeOrderedAndProject. Nothing
    * row²; nothing driver-side. At 100 TB the λ table is still B
    * rows — the model "trains" in one aggregation.
    */
  def dsirWeights(
      docs: DataFrame, idCol: String, textCol: String,
      targetFlag: Column, buckets: Int = 256,
      topK: Int = 40): DataFrame = {
    require(buckets >= 2, "dsirWeights: need >= 2 buckets")
    val toks = docs
      .where(col(textCol).isNotNull)
      .select(col(idCol),
        coalesce(targetFlag.cast("boolean"), lit(false)).as("__tgt"),
        explode(graft.text.TextAnalysis.words(col(textCol))).as("__w"))
      .select(col(idCol), col("__tgt"),
        pmod(conv(substring(md5(col("__w")), 1, 8), 16, 10)
          .cast("long"), lit(buckets.toLong)).as("__b"))
      .transform(graft.core.CacheScope.disk)
    val perBucket = toks.groupBy("__b")
      .agg(sum(when(col("__tgt"), 1L).otherwise(0L)).as("__tb"),
        sum(when(!col("__tgt"), 1L).otherwise(0L)).as("__rb"))
    val totals = perBucket
      .agg(sum(col("__tb")).as("__tt"), sum(col("__rb")).as("__rt"))
    val nanoLn = (c: Column) =>
      floor(log(c.cast("double")) * 1e9).cast("long")
    val lam = perBucket.crossJoin(broadcast(totals))
      .select(col("__b"),
        (nanoLn(col("__tb") + 1L) -
          nanoLn(col("__tt") + lit(buckets.toLong)) -
          nanoLn(col("__rb") + 1L) +
          nanoLn(col("__rt") + lit(buckets.toLong))).as("__lam"))
    toks
      .join(broadcast(lam), Seq("__b"))
      .groupBy(col(idCol), col("__tgt"))
      .agg(count(lit(1)).as("tokens"), sum(col("__lam")).as("w_nano"))
      .select(col(idCol), col("__tgt").cast("int").as("is_target"),
        col("tokens"), col("w_nano"),
        // FLOOR division (w_nano may be negative; `div` truncates
        // toward zero, the oracle's // floors): subtract the
        // non-negative pmod remainder, then the / is exact
        ((col("w_nano") - pmod(col("w_nano"), col("tokens"))) /
          col("tokens")).cast("long").as("avg_lr_nano"))
      .orderBy(col("avg_lr_nano").desc, col(idCol).asc)
      .limit(topK)
  }
}
