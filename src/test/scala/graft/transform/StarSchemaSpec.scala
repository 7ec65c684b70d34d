package graft.transform

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class StarSchemaSpec extends SparkSpec {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_star").toString

  private def dimCustomer = df(
    StructType(Seq(
      StructField("customer_id", IntegerType),
      StructField("name", StringType))),
    Seq(Row(1, "alice"), Row(2, "bob")))

  private def factOrders = df(
    StructType(Seq(
      StructField("customer_id", IntegerType),
      StructField("amount", DoubleType))),
    Seq(Row(1, 10.0), Row(1, 20.0), Row(3, 5.0)))

  test("build writes dims before facts, reports counts and paths") {
    val out = tmpDir()
    val b = new StarSchemaBuilder(out)
      .addDimension(SchemaDefinition("dim_customer", "dimension",
        naturalKeys = Seq("customer_id")))
      .addFact(SchemaDefinition("fact_orders", "fact",
        measures = Seq("amount")))
    val res = b.build(Map(
      "fact_orders" -> factOrders, "dim_customer" -> dimCustomer))
    assert(res.success)
    assert(res.tablesCreated == Seq("dim_customer", "fact_orders"))
    assert(res.rowsByTable == Map("dim_customer" -> 2L, "fact_orders" -> 3L))
    assert(res.totalRows == 5L)
    // written parquet is readable with the same counts
    assert(spark.read.parquet(res.outputPaths("dim_customer")).count() == 2)
  }

  test("build skips tables absent from the input map") {
    val b = new StarSchemaBuilder(tmpDir())
      .addDimension(SchemaDefinition("dim_customer", "dimension"))
      .addFact(SchemaDefinition("fact_orders", "fact"))
    val res = b.build(Map("dim_customer" -> dimCustomer))
    assert(res.success)
    assert(res.tablesCreated == Seq("dim_customer"))
  }

  test("withSurrogateKey appends a 12-char deterministic key") {
    val defn = SchemaDefinition("dim_customer", "dimension",
      naturalKeys = Seq("customer_id", "name"))
    val b = new StarSchemaBuilder(tmpDir())
    val keyed = b.withSurrogateKey(dimCustomer, defn, "customer_sk")
    val keys = keyed.select("customer_sk").collect().map(_.getString(0))
    assert(keys.forall(_.length == 12))
    assert(keys.distinct.length == 2)
  }

  test("validateReferentialIntegrity counts orphan fact keys") {
    val b = new StarSchemaBuilder(tmpDir())
    val orphans = b.validateReferentialIntegrity(
      factOrders, dimCustomer, "customer_id", "customer_id")
    assert(orphans == 1L) // customer_id=3
  }

  test("partitionBy writes hive-partitioned output") {
    val out = tmpDir()
    val b = new StarSchemaBuilder(out)
      .addFact(SchemaDefinition("fact_orders", "fact"))
      .partitionBy("fact_orders", Seq("customer_id"))
    val res = b.build(Map("fact_orders" -> factOrders))
    assert(res.success)
    val part = new java.io.File(s"$out/fact_orders/customer_id=1")
    assert(part.exists)
    assert(spark.read.parquet(s"$out/fact_orders").count() == 3)
  }

  test("bucketed fact and dim join without a shuffle (co-located SMJ)") {
    val b = new StarSchemaBuilder(tmpDir())
      .addDimension(SchemaDefinition("dim_cust_bkt", "dimension"))
      .addFact(SchemaDefinition("fact_ord_bkt", "fact"))
      .bucketBy("dim_cust_bkt", 4, Seq("customer_id"))
      .bucketBy("fact_ord_bkt", 4, Seq("customer_id"))
    val res = b.build(Map(
      "dim_cust_bkt" -> dimCustomer, "fact_ord_bkt" -> factOrders))
    assert(res.success)
    assert(res.rowsByTable == Map("dim_cust_bkt" -> 2L, "fact_ord_bkt" -> 3L))
    // with broadcast disabled, the bucketed join must plan with NO
    // shuffle exchange: bucket layout co-locates both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("fact_ord_bkt")
        .join(spark.table("dim_cust_bkt"), "customer_id")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("hashpartitioning"), s"unexpected shuffle:\n$plan")
      assert(j.count() == 2) // customer 3 has no dim row
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS fact_ord_bkt")
      spark.sql("DROP TABLE IF EXISTS dim_cust_bkt")
    }
  }

  test("SchemaDefinition rejects bad table types") {
    intercept[IllegalArgumentException] {
      SchemaDefinition("x", "cube")
    }
  }

  test("upsertDimension: SCD-1 keep-latest-per-key over a parquet dim — " +
      "insert, update, preserve") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("customer_id", IntegerType),
      StructField("name", StringType),
      StructField("version", IntegerType)))
    def rows(r: (Int, String, Int)*) = df(schema,
      r.map { case (k, n, v) => Row(k, n, v) })
    val dir = java.nio.file.Files
      .createTempDirectory("graft_upsert").toString + "/dim_customer"
    // initial load
    val n1 = StarSchemaBuilder.upsertDimension(spark, dir,
      rows((1, "alice", 1), (2, "bob", 1)), Seq("customer_id"), "version")
    assert(n1 == 2)
    // update key 2, insert key 3, stale update for key 1 (version 0 loses)
    val n2 = StarSchemaBuilder.upsertDimension(spark, dir,
      rows((2, "robert", 2), (3, "carol", 1), (1, "al", 0)),
      Seq("customer_id"), "version")
    assert(n2 == 3)
    val out = spark.read.parquet(dir).orderBy("customer_id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
    assert(out == Seq((1, "alice", 1), (2, "robert", 2), (3, "carol", 1)))
  }
}
