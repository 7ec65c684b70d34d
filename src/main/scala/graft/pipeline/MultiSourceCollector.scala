package graft.pipeline

import graft.core.ExtractionResult
import graft.extract.BaseClient
import graft.operators.Analytics
import org.apache.spark.sql.DataFrame

/** Multi-source orchestration with error isolation and telemetry rollup
  * (/root/reference/src/pipelines/orchestrator.py).
  *
  * Sources run in registration (insertion) order; a failing source
  * yields an error result WITHOUT blocking the others
  * (orchestrator.py:73-86, tests/test_collector.py:68-84). Because each
  * extract returns a LAZY DataFrame plan, downstream joins of several
  * sources still collapse into one Catalyst-optimized job — the Spark
  * improvement over the reference's eager per-source materialization.
  */
final class MultiSourceCollector {

  private val clients =
    scala.collection.mutable.LinkedHashMap.empty[String, BaseClient]

  def register(client: BaseClient): MultiSourceCollector = {
    clients(client.sourceName) = client; this
  }

  def sources: Seq[String] = clients.keys.toSeq

  /** Run one registered source (orchestrator.py:43-58).
    * @throws NoSuchElementException if the source is not registered.
    */
  def collect(
      name: String,
      params: Map[String, Any] = Map.empty): ExtractionResult = {
    val client = clients.getOrElse(name,
      throw new NoSuchElementException(s"Source '$name' is not registered"))
    client.extract(params)
  }

  /** Run every registered source with per-source params; failures are
    * isolated into error results (orchestrator.py:60-86).
    */
  def collectAll(
      sourceParams: Map[String, Map[String, Any]] = Map.empty)
    : Map[String, ExtractionResult] = {
    val out =
      scala.collection.mutable.LinkedHashMap.empty[String, ExtractionResult]
    clients.foreach { case (name, client) =>
      val params = sourceParams.getOrElse(name, Map.empty[String, Any])
      out(name) =
        try client.extract(params)
        catch {
          case e: Exception =>
            ExtractionResult(
              source = name, success = false, data = None,
              rowCount = 0L, durationSeconds = 0.0,
              errors = Seq(String.valueOf(e.getMessage)))
        }
    }
    // ListMap: plain toMap degrades to an unordered HashMap at 5+
    // entries, breaking the registration-order contract
    scala.collection.immutable.ListMap(out.toSeq: _*)
  }

  /** Parallel variant of [[collectAll]] — sources extract concurrently
    * (the reference's loop is sequential; SURVEY.md §3 E2 flags the
    * parallel upgrade). Error isolation is preserved per source; result
    * map keeps registration order. Concurrency is bounded by the passed
    * execution context; each client's own rate limiter still gates its
    * HTTP calls.
    */
  def collectAllParallel(
      sourceParams: Map[String, Map[String, Any]] = Map.empty)(
      implicit ec: scala.concurrent.ExecutionContext)
    : Map[String, ExtractionResult] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val futures = clients.toSeq.map { case (name, client) =>
      val params = sourceParams.getOrElse(name, Map.empty[String, Any])
      name -> Future(client.extract(params)).recover {
        case e: Exception =>
          ExtractionResult(
            source = name, success = false, data = None,
            rowCount = 0L, durationSeconds = 0.0,
            errors = Seq(String.valueOf(e.getMessage)))
      }
    }
    scala.collection.immutable.ListMap(futures.map { case (name, f) =>
      name -> Await.result(f, Duration.Inf)
    }: _*)
  }

  /** Aggregate telemetry across clients (orchestrator.py:90-102). */
  def telemetry: Map[String, Any] = {
    val perSource = clients.map { case (n, c) => n -> c.telemetry }.toMap
    val totals = Map(
      "api_calls" -> clients.values.map(_.apiCalls).sum,
      "cache_hits" -> clients.values.map(_.cacheHits).sum,
      "errors" -> clients.values.map(_.errorCount).sum)
    Map("totals" -> totals, "per_source" -> perSource)
  }
}

object MultiSourceCollector {
  /** Cross-source merge helper (orchestrator.py:104-124) — pandas
    * `pd.merge` semantics via [[Analytics.mergeResults]].
    */
  def mergeResults(
      left: DataFrame, right: DataFrame,
      leftOn: String, rightOn: String,
      how: String = "inner"): DataFrame =
    Analytics.mergeResults(left, right, leftOn, rightOn, how)
}
