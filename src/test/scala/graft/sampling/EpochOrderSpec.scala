package graft.sampling

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class EpochOrderSpec extends SparkSpec {

  private def ids(n: Int) = df(
    StructType(Seq(StructField("id", LongType))),
    (1L to n).map(Row(_)))

  private def order(n: Int, epoch: Int, workers: Int, parts: Int = 2) =
    Sampling.epochOrder(ids(n).repartition(parts), "id", epoch, workers)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))

  test("a permutation: every rank once, driver-replayable order") {
    val out = order(100, epoch = 1, workers = 4)
    assert(out.map(_._2).sorted.toSeq === (1L to 100L))
    // replay: md5("order1:" + id) ascending, id tie-break
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long) = md.digest(s"order1:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val want = (1L to 100L).sortBy(id => (key(id), id))
      .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    out.foreach { case (id, idx, _, _) => assert(idx === want(id)) }
  }

  test("different epochs give different permutations; same epoch is " +
      "stable across partitionings") {
    val e1 = order(200, 1, 4).map(t => t._1 -> t._2).toMap
    val e2 = order(200, 2, 4).map(t => t._1 -> t._2).toMap
    assert(e1 !== e2)
    val e1b = order(200, 1, 4, parts = 9).map(t => t._1 -> t._2).toMap
    assert(e1 === e1b)
  }

  test("round-robin shards are balanced to ±1 and positions dense") {
    val out = order(103, 1, workers = 4)
    val byWorker = out.groupBy(_._3)
    assert(byWorker.keySet === Set(0, 1, 2, 3))
    val sizes = byWorker.view.mapValues(_.length).values.toSeq.sorted
    assert(sizes === Seq(25, 26, 26, 26))
    byWorker.values.foreach { rows =>
      assert(rows.map(_._4).sorted.toSeq === (1L to rows.length))
    }
    // worker follows the global order round-robin
    out.foreach { case (_, idx, w, pos) =>
      assert(w === ((idx - 1) % 4).toInt)
      assert(pos === (idx - 1) / 4 + 1)
    }
  }
}
