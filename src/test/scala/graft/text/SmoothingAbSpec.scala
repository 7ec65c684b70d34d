package graft.text

import graft.SparkSpec

/** q326 — the BM25 vs Dirichlet-QL A/B: both legs run the q259
  * protocol (their per-system rows must equal the standalone macro
  * queries would), and the table is complete and comparable.
  */
class SmoothingAbSpec extends SparkSpec {

  test("q326 on the real corpus: two complete system rows over the " +
      "same judged query set; the bm25 leg equals q259's standalone " +
      "macro row") {
    graft.core.CacheScope.withScope {
      val ab = graft.registry.TextRegistry
        .smoothingAbQ(spark, "/root/testdata/sf0.001").collect()
      assert(ab.map(_.getString(0)).sorted.toSeq ==
        Seq("bm25", "dirichlet_ql"))
      val byS = ab.map(r => r.getString(0) -> r).toMap
      // identical judgment protocol: same query counts on both legs
      assert(byS("bm25").getLong(1) == byS("dirichlet_ql").getLong(1))
      assert(byS("bm25").getLong(2) == byS("dirichlet_ql").getLong(2))
      // the bm25 leg IS q259: row-for-row equality with the
      // standalone macro query
      val standalone = graft.registry.TextRegistry
        .retrievalMacroQ(spark, "/root/testdata/sf0.001").head()
      val leg = byS("bm25")
      (0 until standalone.length).foreach { i =>
        assert(leg.get(i + 1) == standalone.get(i),
          s"field $i differs: ${leg.get(i + 1)} vs ${standalone.get(i)}")
      }
    }
  }
}
