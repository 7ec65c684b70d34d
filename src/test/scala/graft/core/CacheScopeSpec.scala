package graft.core

import graft.SparkSpec
import graft.dedup.{CorpusPipeline, Dedup}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CacheScopeSpec extends SparkSpec {

  private def docsDf = df(
    StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType))),
    Seq(
      Row(1L, "the quick brown fox jumps over the lazy dog today"),
      Row(2L, "the quick brown fox jumps over the lazy dog today"),
      Row(3L, "the quick brown fox jumps over the lazy dog tonight"),
      Row(4L, "entirely different content about spark catalyst plans"),
      Row(5L, "another unrelated document mentioning token budgets"),
      Row(6L, "entirely different content about spark catalyst plans")))

  private def cacheEmpty: Boolean =
    spark.sharedState.cacheManager.isEmpty

  test("withScope releases every cache a composed pipeline persisted") {
    spark.catalog.clearCache()
    assert(cacheEmpty)
    val rows = CacheScope.withScope {
      val out = CorpusPipeline.prepareTrainingCorpus(
        docsDf, "doc_id", "text", minQuality = 0.0)
      val r = out.collect()
      // pipeline operators persisted intermediates inside the scope
      assert(!cacheEmpty,
        "expected pipeline intermediates to be cached inside the scope")
      r
    }
    assert(cacheEmpty,
      "scope exit must leave the session cache registry empty")
    assert(rows.nonEmpty)
  }

  test("scoped and unscoped runs produce identical results") {
    spark.catalog.clearCache()
    val unscoped = Dedup.ngramJaccardPairs(
        docsDf, "doc_id", "text", n = 3, threshold = 0.5,
        maxShingleDf = Some(4))
      .orderBy("id_a", "id_b").collect().toSeq
    spark.catalog.clearCache()
    val scoped = CacheScope.withScope {
      Dedup.ngramJaccardPairs(
          docsDf, "doc_id", "text", n = 3, threshold = 0.5,
          maxShingleDf = Some(4))
        .orderBy("id_a", "id_b").collect().toSeq
    }
    assert(scoped == unscoped)
    assert(cacheEmpty)
  }

  test("outside a scope the caller owns the lifecycle (persist sticks)") {
    spark.catalog.clearCache()
    val pairs = Dedup.ngramJaccardPairs(
      docsDf, "doc_id", "text", n = 3, threshold = 0.5)
    pairs.collect()
    assert(!cacheEmpty,
      "unscoped operator caches must survive for the caller to reuse")
    spark.catalog.clearCache()
    assert(cacheEmpty)
  }

  test("a lazy plan escaping its scope stays correct, just uncached") {
    spark.catalog.clearCache()
    val lazyOut = CacheScope.withScope {
      Dedup.ngramJaccardPairs(docsDf, "doc_id", "text",
        n = 3, threshold = 0.5, maxShingleDf = Some(4))
    }
    assert(cacheEmpty)
    // acting after scope exit recomputes from source — same rows
    val rows = lazyOut.orderBy("id_a", "id_b").collect().toSeq
    spark.catalog.clearCache()
    val expect = Dedup.ngramJaccardPairs(docsDf, "doc_id", "text",
        n = 3, threshold = 0.5, maxShingleDf = Some(4))
      .orderBy("id_a", "id_b").collect().toSeq
    assert(rows == expect)
    spark.catalog.clearCache()
  }

  test("nested scopes release independently") {
    spark.catalog.clearCache()
    CacheScope.withScope {
      val outer = CacheScope.disk(docsDf.select("doc_id"))
      outer.count()
      CacheScope.withScope {
        val inner = CacheScope.disk(docsDf.select("text"))
        inner.count()
      }
      // inner scope released its registration; outer's still cached
      assert(!cacheEmpty)
      assert(spark.sharedState.cacheManager.lookupCachedData(
        outer.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]])
        .isDefined)
    }
    assert(cacheEmpty)
  }

  test("materialized returns a usable result with zero cache residue") {
    spark.catalog.clearCache()
    val out = CacheScope.materialized {
      CorpusPipeline.prepareTrainingCorpus(
        docsDf, "doc_id", "text", minQuality = 0.0)
    }
    assert(cacheEmpty)
    assert(out.count() > 0)
    assert(out.columns.contains("predicted"))
  }
}
