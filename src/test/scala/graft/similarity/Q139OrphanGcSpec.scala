package graft.similarity

import graft.SparkSpec
import graft.registry.SimilarityRegistry

/** [[SimilarityRegistry.q139ReapOrphans]] — crashed-run warehouse hygiene: a
  * q139 run that died under another pid left its pid-suffixed
  * index/codebook locations behind (its own same-pid cleanup never
  * ran); the reaper deletes exactly those, keyed on process liveness,
  * and touches nothing else.
  */
class Q139OrphanGcSpec extends SparkSpec {

  test("dead-pid graft_q139_* locations are reaped; live-pid, " +
      "same-pid, and unrelated locations survive") {
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val self = java.lang.ProcessHandle.current().pid()
    // pid 999999999 exceeds linux pid_max — never alive; pid 1 is
    // init and always alive
    val dead = new org.apache.hadoop.fs.Path(wh,
      "graft_q139_pq_idx_999999999")
    val dead2 = new org.apache.hadoop.fs.Path(wh,
      "graft_q139_books_999999998")
    val live = new org.apache.hadoop.fs.Path(wh, "graft_q139_vec_idx_1")
    val mine = new org.apache.hadoop.fs.Path(wh,
      s"graft_q139_pq_idx_$self")
    val other = new org.apache.hadoop.fs.Path(wh, "graft_q139_notapid")
    val all = Seq(dead, dead2, live, mine, other)
    try {
      all.foreach(fs.mkdirs)
      SimilarityRegistry.q139ReapOrphans(spark)
      assert(!fs.exists(dead), "dead-pid orphan must be reaped")
      assert(!fs.exists(dead2), "dead-pid orphan must be reaped")
      assert(fs.exists(live), "live-pid location must survive")
      assert(fs.exists(mine), "same-pid location must survive")
      assert(fs.exists(other), "non-pid-suffixed name must survive")
    } finally all.foreach(p => fs.delete(p, true))
  }
}
