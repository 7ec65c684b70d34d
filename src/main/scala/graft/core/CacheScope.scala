package graft.core

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.storage.StorageLevel

import scala.collection.mutable.ArrayBuffer

/** Cache-lifecycle contract for operators that persist intermediates.
  *
  * Several operators (`Dedup.ngramJaccardPairs`, `minhashLshPairs`,
  * `Similarity.semanticDedup`, `Packing.packIntoShards`,
  * `TextAnalysis.vocabCoverage`, …) `persist()` an intermediate that
  * feeds two or more downstream legs — correct and necessary for a
  * single run, but Spark's `CacheManager` holds a reference to every
  * cached plan, so in a long-lived session (a 73-query verify pass, a
  * notebook, a composed corpus pipeline) the blocks accumulate for the
  * session's lifetime: eviction prevents OOM but churns executor
  * storage under real load. RDD block cleanup via the `ContextCleaner`
  * never applies, because the cache registry itself is the reference.
  *
  * The contract: operators route every internal persist through
  * [[CacheScope.disk]]. Outside any scope that is exactly
  * `persist(MEMORY_AND_DISK)` — the caller owns the lifecycle (or
  * calls `spark.catalog.clearCache()`, as `Bench` does between runs).
  * Inside [[CacheScope.withScope]], each cached dataset is registered
  * with the innermost open scope and unpersisted when the scope exits
  * — so a session-level loop like `Verify`'s holds no cache residue
  * from one query to the next, regardless of how deep the operator
  * composition that produced it was.
  *
  * Laziness caveat, deliberate: a LAZY plan escaping its scope loses
  * only the caching (next action recomputes), never correctness —
  * `unpersist` is always safe. Callers that want the result to
  * survive the scope materialize it inside — `collect()`, a write, or
  * [[CacheScope.materialized]] which eagerly `localCheckpoint`s the
  * result (checkpoint blocks are plan-referenced, not
  * registry-referenced, so the `ContextCleaner` reclaims them once
  * the DataFrame is garbage; exactly the lifecycle the cache registry
  * denies to `persist`).
  *
  * Scopes are thread-confined (a `ThreadLocal` stack): parallel query
  * threads each see their own scope, matching Spark's
  * one-action-per-thread driver idiom. Nesting is supported — inner
  * scopes release their registrations on exit, outer scopes keep
  * theirs.
  */
object CacheScope {

  private val scopes = new ThreadLocal[List[ArrayBuffer[Dataset[_]]]] {
    override def initialValue: List[ArrayBuffer[Dataset[_]]] = Nil
  }

  /** `persist(MEMORY_AND_DISK)` + register with the innermost open
    * scope (no-op registration outside a scope — caller owns the
    * lifecycle there).
    */
  def disk[T](ds: Dataset[T]): Dataset[T] = {
    val p = ds.persist(StorageLevel.MEMORY_AND_DISK)
    scopes.get() match {
      case head :: _ => head += p
      case Nil       =>
    }
    p
  }

  /** Run `body`; on exit unpersist every dataset [[disk]] registered
    * inside it (non-blocking — the cache-registry entry drops
    * immediately, block deletion proceeds async). Anything lazy that
    * escapes stays CORRECT but uncached; materialize inside the scope
    * to keep computed results.
    */
  def withScope[A](body: => A): A = {
    val buf = new ArrayBuffer[Dataset[_]]
    scopes.set(buf :: scopes.get())
    try body
    finally {
      scopes.set(scopes.get().tail)
      buf.foreach(_.unpersist(blocking = false))
    }
  }

  /** Run a pipeline and return its result eagerly materialized
    * (`localCheckpoint`), with every intermediate cache the pipeline
    * created already released — the zero-residue way to run a
    * composed pipeline (`CorpusPipeline.prepareTrainingCorpus`, the
    * q70 cluster-split chain) in a long-lived session.
    */
  def materialized(body: => DataFrame): DataFrame =
    withScope { body.localCheckpoint(eager = true) }
}
