package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Similarity.rankingEval]] — hand-computed metrics, perfect/empty
  * rankings, the k cutoff on both DCG legs, and judgment-free
  * queries.
  */
class RankingEvalSpec extends SparkSpec {

  import spark.implicits._

  private def eval(results: Seq[(Long, Long, Int)],
      qrels: Seq[(Long, Long, Int)], k: Int = 3) =
    Similarity.rankingEval(
      results.toDF("qid", "did", "rank"), "qid", "did", "rank",
      qrels.toDF("q", "d", "rel"), "q", "d", "rel", k)
      .collect().map(r => r.getLong(0) -> r).toMap

  private def dcgTerm(rel: Int, rank: Int): Double = {
    val t = ((1L << rel) - 1).toDouble /
      (math.log(rank + 1.0) / math.log(2.0)) * 1e9
    math.floor(t) / 1e9
  }

  test("hand-computed scorecard: graded hits at ranks 1 and 3") {
    // q1 retrieves docs 10,11,12; 10 is rel 1, 12 is rel 2; a third
    // relevant doc 13 was never retrieved
    val out = eval(
      results = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3)),
      qrels = Seq((1L, 10L, 1), (1L, 12L, 2), (1L, 13L, 1)))
    val r = out(1L)
    assert(r.getAs[Long]("n_rel") === 3L)
    assert(r.getAs[Long]("n_hit") === 2L)
    assert(r.getAs[Double]("p_at_k") === 0.666667)
    assert(r.getAs[Double]("r_at_k") === 0.666667)
    assert(r.getAs[Double]("rr") === 1.0) // first hit at rank 1
    // DCG = g(1)/log2(2) + g(2)/log2(4); ideal = g(2)/log2(2)
    // + g(1)/log2(3) + g(1)/log2(4)  (all three rels fit in k)
    val dcg = dcgTerm(1, 1) + dcgTerm(2, 3)
    val idcg = dcgTerm(2, 1) + dcgTerm(1, 2) + dcgTerm(1, 3)
    assert(math.abs(r.getAs[Double]("ndcg") - dcg / idcg) < 1e-6)
  }

  test("the ideal ranking reorders judgments by grade: a perfect " +
      "system scores ndcg 1, a grade-inverted one less") {
    val qrels = Seq((1L, 10L, 2), (1L, 11L, 1))
    val perfect = eval(Seq((1L, 10L, 1), (1L, 11L, 2)), qrels)
    assert(perfect(1L).getAs[Double]("ndcg") === 1.0)
    val inverted = eval(Seq((1L, 11L, 1), (1L, 10L, 2)), qrels)
    assert(inverted(1L).getAs[Double]("ndcg") < 1.0)
    assert(inverted(1L).getAs[Double]("rr") === 1.0) // rank-1 IS a hit
  }

  test("no hits: rr 0, ndcg 0 (not null — judgments existed)") {
    val out = eval(Seq((1L, 10L, 1), (1L, 11L, 2)),
      Seq((1L, 99L, 1)))
    val r = out(1L)
    assert(r.getAs[Long]("n_hit") === 0L)
    assert(r.getAs[Double]("rr") === 0.0)
    assert(r.getAs[Double]("p_at_k") === 0.0)
    assert(r.getAs[Double]("ndcg") === 0.0)
  }

  test("a query with no judgments has null recall and ndcg but " +
      "still reports precision") {
    val out = eval(
      Seq((1L, 10L, 1), (2L, 20L, 1)),
      Seq((1L, 10L, 1)))
    val r2 = out(2L)
    assert(r2.isNullAt(r2.fieldIndex("n_rel")))
    assert(r2.isNullAt(r2.fieldIndex("r_at_k")))
    assert(r2.isNullAt(r2.fieldIndex("ndcg")))
    assert(r2.getAs[Double]("p_at_k") === 0.0)
  }

  test("a judged query that retrieved NOTHING scores 0, not absent " +
      "— trec_eval includes it in the macro-average") {
    val out = eval(
      Seq((1L, 10L, 1)),
      Seq((1L, 10L, 1), (2L, 20L, 2), (2L, 21L, 1)))
    assert(out.contains(2L))
    val r2 = out(2L)
    assert(r2.getAs[Long]("n_rel") === 2L)
    assert(r2.getAs[Long]("n_hit") === 0L)
    assert(r2.getAs[Double]("p_at_k") === 0.0)
    assert(r2.getAs[Double]("r_at_k") === 0.0)
    assert(r2.getAs[Double]("rr") === 0.0)
    assert(r2.getAs[Double]("ndcg") === 0.0)
  }

  test("duplicate (query, doc) judgment rows don't double-count " +
      "n_hit or DCG; max rel wins") {
    val clean = eval(
      Seq((1L, 10L, 1), (1L, 11L, 2)),
      Seq((1L, 10L, 2), (1L, 11L, 1)))
    val dup = eval(
      Seq((1L, 10L, 1), (1L, 11L, 2)),
      Seq((1L, 10L, 2), (1L, 10L, 1), (1L, 10L, 2), (1L, 11L, 1)))
    val (c, d) = (clean(1L), dup(1L))
    for (f <- Seq("n_rel", "n_hit"))
      assert(d.getAs[Long](f) === c.getAs[Long](f), f)
    for (f <- Seq("p_at_k", "r_at_k", "rr", "ndcg"))
      assert(d.getAs[Double](f) === c.getAs[Double](f), f)
  }

  test("rankingEvalMacro: means run over judged queries only, " +
      "zero-retrieval judged queries drag them down, unjudged don't") {
    // q1: perfect single hit; q2: judged, retrieved nothing;
    // q3: retrieved but unjudged (excluded from every mean)
    val out = Similarity.rankingEvalMacro(
      Seq((1L, 10L, 1), (3L, 30L, 1)).toDF("qid", "did", "rank"),
      "qid", "did", "rank",
      Seq((1L, 10L, 1), (2L, 20L, 1)).toDF("q", "d", "rel"),
      "q", "d", "rel", k = 1).head()
    assert(out.getAs[Long]("n_queries") === 3L)
    assert(out.getAs[Long]("n_judged") === 2L)
    assert(out.getAs[Long]("n_zero_hit") === 1L)
    // judged metrics: q1 all 1.0, q2 all 0.0 → means 0.5
    assert(out.getAs[Double]("mean_p_at_k") === 0.5)
    assert(out.getAs[Double]("mean_r_at_k") === 0.5)
    assert(out.getAs[Double]("mrr") === 0.5)
    assert(out.getAs[Double]("mean_ndcg") === 0.5)
  }

  test("the k cutoff applies to BOTH legs: hits past k don't count " +
      "and the ideal truncates") {
    // 4 relevant docs, k = 2: recall caps at 2/4 even for a perfect
    // system, and its ndcg is still 1 (ideal truncated at k too)
    val qrels = (10L to 13L).map(d => (1L, d, 1))
    val out = eval(
      (10L to 13L).zipWithIndex.map { case (d, i) => (1L, d, i + 1) },
      qrels, k = 2)
    val r = out(1L)
    assert(r.getAs[Long]("n_hit") === 2L)
    assert(r.getAs[Double]("r_at_k") === 0.5)
    assert(r.getAs[Double]("p_at_k") === 1.0)
    assert(r.getAs[Double]("ndcg") === 1.0)
  }
}
