package graft

/** Guards on the driver contract itself — the invariants the
  * correctness harness relies on but nothing else checks.
  */
class ContractSpec extends SparkSpec {

  test("every query has an oracle — no rows-only checks left") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty,
      s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty,
      s"orphan oracles (no query): ${(o -- q).toSeq.sorted}")
  }

  test("query names follow the qNN_snake_case convention, NN unique") {
    val names = SparkEntry.queries.keySet.toSeq
    val pat = "^q(\\d+)_[a-z0-9_]+$".r
    val nums = names.map {
      case pat(n) => n.toInt
      case bad => fail(s"query name breaks convention: $bad")
    }
    assert(nums.distinct.size == nums.size, "duplicate query numbers")
  }

  test("oracle SQL carries no raw tab characters (driver JSON safety)") {
    // Verify escapes control chars defensively, but tabs in SQL are
    // also a readability smell — keep the corpus clean
    val offenders = SparkEntry.oracleSql.collect {
      case (name, sql) if sql.contains("\t") => name
    }
    assert(offenders.isEmpty, s"tabs in oracle SQL: $offenders")
  }

  test("flagship entry runs on sf0.001 and returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query executes at sf0.001 and yields a schema with no " +
      "duplicate column names (the compare sorts by name)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      graft.core.CacheScope.withScope {
        val df = fn(spark, "/root/testdata/sf0.001")
        val cols = df.columns.toSeq
        assert(cols.distinct.size == cols.size,
          s"$name has duplicate column names: $cols")
        df.count() // executes; correctness is the oracle gate's job
      }
    }
  }
}
