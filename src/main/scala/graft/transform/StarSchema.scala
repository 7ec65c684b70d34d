package graft.transform

import graft.core.TransformationResult
import graft.functions.Fx
import graft.operators.Analytics
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Kimball star-schema table definition
  * (/root/reference/src/transformers/star_schema.py:24-41).
  */
final case class SchemaDefinition(
    name: String,
    tableType: String, // "dimension" | "fact"
    naturalKeys: Seq[String] = Nil,
    columns: Seq[String] = Nil,
    measures: Seq[String] = Nil,
    dimensionKeys: Seq[String] = Nil) {
  require(tableType == "dimension" || tableType == "fact",
    s"tableType must be dimension|fact, got $tableType")
}

/** Builds and persists a star schema: dimensions first, then facts, each
  * written as snappy Parquet (star_schema.py:81-138,
  * base_transformer.py:82-89). Scale notes:
  *   - facts are written with `partitionBy` when a partition column is
  *     registered — at 100 TB, date-partitioned facts are what makes
  *     downstream partition pruning possible;
  *   - referential integrity runs as distinct-key anti-joins
  *     (star_schema.py:140-156), never a row-level pass.
  */
final class StarSchemaBuilder(
    outputPath: String,
    transformerName: String = "star_schema") {

  private val dims = scala.collection.mutable.LinkedHashMap
    .empty[String, SchemaDefinition]
  private val facts = scala.collection.mutable.LinkedHashMap
    .empty[String, SchemaDefinition]
  private val partitionCols = scala.collection.mutable.Map
    .empty[String, Seq[String]]
  private val bucketSpecs = scala.collection.mutable.Map
    .empty[String, (Int, Seq[String])]
  private val tables = scala.collection.mutable.LinkedHashMap
    .empty[String, DataFrame]

  def addDimension(defn: SchemaDefinition): StarSchemaBuilder = {
    require(defn.tableType == "dimension"); dims(defn.name) = defn; this
  }
  def addFact(defn: SchemaDefinition): StarSchemaBuilder = {
    require(defn.tableType == "fact"); facts(defn.name) = defn; this
  }
  /** Register disk partitioning for a table (scale extension). */
  def partitionBy(table: String, cols: Seq[String]): StarSchemaBuilder = {
    partitionCols(table) = cols; this
  }

  /** Register hash bucketing for a table (scale extension): fact and
    * dimension bucketed on the same key with the same bucket count
    * join WITHOUT a shuffle (co-located sort-merge join) — at 100 TB,
    * the difference between re-shuffling the fact table per query and
    * never shuffling it. Bucketed tables write via `saveAsTable`
    * (bucket metadata lives in the catalog).
    */
  def bucketBy(
      table: String, numBuckets: Int, cols: Seq[String]): StarSchemaBuilder = {
    require(numBuckets > 0 && cols.nonEmpty)
    bucketSpecs(table) = (numBuckets, cols); this
  }

  def registeredTables: Seq[String] = (dims.keys ++ facts.keys).toSeq
  def table(name: String): Option[DataFrame] = tables.get(name)

  /** Add a surrogate key column derived from the definition's natural
    * keys (base_transformer.py:53-56).
    */
  def withSurrogateKey(df: DataFrame, defn: SchemaDefinition,
      keyName: String): DataFrame =
    df.withColumn(keyName, Fx.surrogateKey(defn.naturalKeys.map(col): _*))

  /** Write each registered dimension then each fact present in `data`
    * as Parquet; collect row counts/paths/duration
    * (star_schema.py:81-138). Tables absent from `data` are skipped.
    */
  def build(data: Map[String, DataFrame]): TransformationResult = {
    val t0 = System.nanoTime()
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    val created = scala.collection.mutable.ArrayBuffer.empty[String]
    val rows = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val paths = scala.collection.mutable.LinkedHashMap.empty[String, String]

    val ordered = (dims.keys ++ facts.keys).filter(data.contains)
    ordered.foreach { name =>
      try {
        val df = data(name)
        val path = s"$outputPath/$name"
        val writer = df.write.mode(SaveMode.Overwrite)
          .option("compression", "snappy")
        val written = bucketSpecs.get(name) match {
          case Some((n, cols)) =>
            // bucketed: catalog-managed table (bucket metadata cannot
            // live in bare parquet files)
            val w = writer.format("parquet")
              .bucketBy(n, cols.head, cols.tail: _*)
              .sortBy(cols.head, cols.tail: _*)
            partitionCols.get(name).filter(_.nonEmpty)
              .fold(w)(p => w.partitionBy(p: _*))
              .saveAsTable(name)
            paths(name) = s"table:$name"
            df.sparkSession.table(name).count()
          case None =>
            partitionCols.get(name) match {
              case Some(cols) if cols.nonEmpty =>
                writer.partitionBy(cols: _*).parquet(path)
              case _ => writer.parquet(path)
            }
            paths(name) = path
            // Count what was actually written (footer-served, no
            // recompute of the upstream plan — and correct for
            // nondeterministic inputs).
            df.sparkSession.read.parquet(path).count()
        }
        tables(name) = df
        rows(name) = written
        created += name
      } catch {
        case e: Exception => errors += s"$name: ${e.getMessage}"
      }
    }

    TransformationResult(
      transformer = transformerName,
      success = errors.isEmpty,
      tablesCreated = created.toSeq,
      rowsByTable = rows.toMap,
      outputPaths = paths.toMap,
      durationSeconds = (System.nanoTime() - t0) / 1e9,
      errors = errors.toSeq)
  }

  /** Orphan fact keys per dimension reference (star_schema.py:140-156):
    * count of distinct fact keys absent from the dimension.
    */
  def validateReferentialIntegrity(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String): Long =
    Analytics.orphanKeys(fact, dim, factKey, dimKey).count()
}

object StarSchemaBuilder {

  /** SCD type-1 dimension upsert over a bare Parquet path: union the
    * existing rows with `updates`, keep the row with the highest
    * `orderCol` per natural key (`max_by` aggregation — partial+final,
    * no sort), and rewrite.
    *
    * The current state is materialized (`localCheckpoint`) before the
    * overwrite because Spark cannot overwrite a path it is still
    * reading — safe at dimension scale (dims are the small side of a
    * star by construction). At warehouse scale the same logic is a
    * `MERGE INTO` against a table format with snapshot isolation; the
    * keep-latest-per-key semantics here are exactly what that MERGE's
    * `WHEN MATCHED UPDATE` clause expresses.
    *
    * Returns the post-upsert row count.
    */
  def upsertDimension(
      spark: org.apache.spark.sql.SparkSession,
      path: String, updates: DataFrame,
      keyCols: Seq[String], orderCol: String): Long = {
    require(keyCols.nonEmpty, "at least one natural key column")
    // only a genuinely-missing path means "no existing data" — any
    // other read failure (corrupt footer, permission, schema error)
    // must fail the upsert rather than silently discard current rows
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing =
      if (fs.exists(hPath)) Some(spark.read.parquet(path)) else None
    val unioned = existing match {
      case Some(e) => e.unionByName(updates, allowMissingColumns = true)
      case None => updates
    }
    val all = struct(unioned.columns.toIndexedSeq.map(col): _*)
    val latest = unioned
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(all, col(orderCol)).as("__row"))
      .select(unioned.columns.toIndexedSeq.map(c => col(s"__row.$c")): _*)
      .localCheckpoint(true)
    latest.write.mode(SaveMode.Overwrite)
      .option("compression", "snappy").parquet(path)
    spark.read.parquet(path).count()
  }

  /** SCD type-2 version derivation from a change stream: collapse each
    * key's ordered attribute observations into versioned history rows
    * with `valid_from` / `valid_to` / `is_current` / `version_n`.
    *
    * A row opens a new version iff it is the key's first observation or
    * any tracked attribute differs (null-safely, `<=>`) from the
    * previous observation; runs of identical attributes collapse into
    * one version. `valid_to` is the next version's `valid_from` (open
    * versions have null), the half-open convention warehouse SCD-2
    * MERGEs produce. Ties on `orderCol` break on `tieBreak` so the
    * history is deterministic under same-instant observations.
    *
    * Each version also carries `last_seen` — the order value of its
    * LAST collapsed observation. That makes the version row a
    * both-endpoints compaction of its observation run, which is what
    * lets [[upsertDimensionScd2]] re-derive correct attribute
    * SEQUENCES under late-arriving observations (see its scaladoc for
    * the exact guarantee).
    *
    * Scale: every window (change-detection lag, the key-last max, the
    * version filter, `lead`s and the `row_number`) partitions on
    * `keyCols`, so the plan carries ONE exchange on the key. Per-key
    * work is linear in that key's observation count.
    */
  def scd2Versions(
      df: DataFrame, keyCols: Seq[String], attrCols: Seq[String],
      orderCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "at least one natural key column")
    require(attrCols.nonEmpty, "at least one tracked attribute column")
    // the select below drops unrelated columns, so only key/attr names
    // can collide with the emitted version columns
    val reserved =
      Set("__new", "__ord", "__prevOrd", "__keyLast", "valid_from",
        "valid_to", "last_seen", "version_n", "is_current")
    require(!(keyCols ++ attrCols).exists(reserved),
      s"key/attr columns must not be named ${reserved.mkString(", ")}")
    import org.apache.spark.sql.expressions.Window
    val ordCols = col(orderCol) +: tieBreak.map(col)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ordCols.map(_.asc): _*)
    val changed = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val isNew = row_number().over(w) === 1 || changed
    // a version's last observation = the row just before the NEXT
    // opener (its __prevOrd), or the key's overall last observation
    // for the open version — both read through the same key exchange
    val openerW = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ord").asc)
    df.select(
        (keyCols ++ attrCols).map(col) :+ col(orderCol).as("valid_from")
          :+ isNew.as("__new")
          :+ lag(col(orderCol), 1).over(w).as("__prevOrd")
          :+ max(col(orderCol)).over(
              Window.partitionBy(keyCols.map(col): _*)).as("__keyLast")
          :+ struct(ordCols.toIndexedSeq: _*).as("__ord"): _*)
      .where(col("__new"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(openerW))
      .withColumn("last_seen",
        coalesce(lead(col("__prevOrd"), 1).over(openerW),
          col("__keyLast")))
      .withColumn("version_n", row_number().over(openerW))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__new", "__ord", "__prevOrd", "__keyLast")
  }

  /** Point-in-time (as-was) lookup against an SCD-2 version history:
    * each fact row joins the version of its key that was valid AT the
    * fact's own timestamp — `valid_from ≤ ts` and `ts < valid_to`
    * (open-ended current version matches everything from its start).
    * The read half that completes the SCD-2 circle (derive
    * [[scd2Versions]] → upsert [[upsertDimensionScd2]] → stream
    * [[graft.streaming.EventStreams.scd2DimensionSink]] → LOOKUP):
    * "what did we believe about this customer when the order was
    * placed", the as-was reporting join.
    *
    * Shape: an equi-join on the natural key with the interval as a
    * RESIDUAL predicate — versions-per-key is bounded by the key's
    * change count (dimension histories are short; this is not a range
    * join that needs banding), and the half-open intervals partition
    * the timeline, so each fact matches AT MOST one version — the
    * join cannot expand. Facts before their key's first version (or
    * with no key match) keep null version columns under the default
    * left join. Version attributes are emitted under `attrPrefix` so
    * a fact that carries a same-named current-value column (the usual
    * case) never collides.
    */
  def scd2Lookup(
      facts: DataFrame, versions: DataFrame, keyCols: Seq[String],
      tsCol: String, attrCols: Seq[String],
      attrPrefix: String = "dim_", how: String = "left"): DataFrame = {
    require(keyCols.nonEmpty, "at least one natural key column")
    val outAttrs = attrCols.map(a => attrPrefix + a) :+
      (attrPrefix + "version_n")
    require(!facts.columns.exists(outAttrs.toSet),
      s"fact columns must not be named ${outAttrs.mkString(", ")}")
    val v = versions.select(
      keyCols.map(c => col(c).as(s"__k_$c")) ++
        attrCols.map(a => col(a).as(attrPrefix + a)) ++ Seq(
          col("version_n").as(attrPrefix + "version_n"),
          col("valid_from").as("__vfrom"),
          col("valid_to").as("__vto")): _*)
    val keyEq = keyCols.map(c => facts(c) <=> v(s"__k_$c"))
      .reduce(_ && _)
    val inInterval = facts(tsCol) >= v("__vfrom") &&
      (v("__vto").isNull || facts(tsCol) < v("__vto"))
    facts.join(v, keyEq && inInterval, how)
      .select(facts.columns.map(facts(_)) ++ outAttrs.map(col): _*)
  }

  /** SCD type-2 dimension upsert over a bare Parquet path. The stored
    * history IS a compressed change stream — each version row retains
    * BOTH endpoints of its observation run (`valid_from` and
    * `last_seen`) — so the merge re-derives: union the existing
    * versions' endpoint observations with the incoming updates (their
    * `orderCol` becomes the observation time) and re-run
    * [[scd2Versions]]. This makes the upsert idempotent (re-applying
    * an already-seen update changes nothing), no-op-safe (an update
    * equal to the key's latest attributes opens no version), and
    * late-arrival SEQUENCE-correct: an out-of-order observation
    * splices between the retained endpoints around it, so the derived
    * attribute sequence always matches the full-stream derivation
    * (endpoint retention is exactly what makes "A … A, late B in the
    * middle" re-open A afterwards instead of ending on B). The one
    * compaction artifact: observations strictly INSIDE a version's
    * endpoint pair are dropped, so a version re-opened by a late
    * arrival interleaving among them dates from the next RETAINED
    * observation — the tightest bound the compacted evidence allows.
    * Deployments needing exact boundaries under arbitrary replay keep
    * the raw observation log and re-derive from it instead.
    *
    * Same-`orderCol` CONFLICTING observations tie-break on `tieBreak`
    * — by default the attribute values themselves, which is total over
    * everything a version row stores — so the derived history is the
    * same on every re-derivation (the idempotency guarantee would
    * otherwise silently fail: two runs over identical evidence could
    * order a tie differently and disagree on the winning attribute
    * sequence). `tieBreak` columns must be stored key/attr columns,
    * because re-derivation reads only the persisted endpoints.
    *
    * Returns the post-upsert version count.
    */
  def upsertDimensionScd2(
      spark: org.apache.spark.sql.SparkSession,
      path: String, updates: DataFrame,
      keyCols: Seq[String], attrCols: Seq[String],
      orderCol: String, tieBreak: Seq[String] = Nil): Long = {
    require(keyCols.nonEmpty, "at least one natural key column")
    val tb = if (tieBreak.isEmpty) attrCols else tieBreak
    require(tb.forall((keyCols ++ attrCols).contains),
      "tieBreak columns must be stored key/attr columns — " +
        "re-derivation reads only the persisted endpoints")
    val obsCols = (keyCols ++ attrCols).map(col) :+ col(orderCol)
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existingObs =
      if (fs.exists(hPath)) {
        val h = spark.read.parquet(path)
        def endpoint(c: String) = h.select(
          (keyCols ++ attrCols).map(col) :+ col(c).as(orderCol): _*)
        Some(endpoint("valid_from").unionByName(endpoint("last_seen")))
      } else None
    val incoming = updates.select(obsCols: _*)
    val stream = existingObs match {
      case Some(e) => e.unionByName(incoming).distinct()
      case None => incoming.distinct()
    }
    val history = scd2Versions(stream, keyCols, attrCols, orderCol, tb)
      .localCheckpoint(true)
    history.write.mode(SaveMode.Overwrite)
      .option("compression", "snappy").parquet(path)
    spark.read.parquet(path).count()
  }
}
