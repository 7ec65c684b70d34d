package graft.extract

import graft.SparkSpec

class ExampleSourcesSpec extends SparkSpec {

  /** SEC company_tickers.json shape: dict-of-dicts keyed by index. */
  private val secJson =
    """{"0":{"cik_str":320193,"ticker":"AAPL","title":"Apple Inc."},
       "1":{"cik_str":789019,"ticker":"MSFT","title":"Microsoft Corp"},
       "2":{"cik_str":1652044,"ticker":"GOOGL","title":"Alphabet Inc."}}"""

  private val awardsJson =
    """{"page_metadata":{"page":1},"results":[
       {"Award ID":"W912DY24C0001","Recipient Name":"ACME CORP",
        "Award Amount":"1500000.50","Awarding Agency":"Department of Defense",
        "Start Date":"2024-02-01","End Date":"2025-01-31",
        "Award Type":"A","Description":"WIDGETS"},
       {"Award ID":"75N98024C0002","Recipient Name":"BETA LLC",
        "Award Amount":"not-a-number","Awarding Agency":"HHS",
        "Start Date":"2024-03-15","End Date":"2026-03-14",
        "Award Type":"B","Description":"SERVICES"}]}"""

  test("sec tickers parse explodes the dict-of-dicts and zero-pads cik") {
    val out = ExampleSources.parseSecTickers(spark, secJson)
    assert(out.columns.toSeq == Seq("cik", "ticker", "company_name"))
    val rows = out.orderBy("ticker").collect()
    assert(rows.length == 3)
    assert(rows(0).getString(0) == "0000320193") // AAPL padded
    assert(rows(0).getString(0).length == 10)
    assert(rows(2).getString(2) == "Microsoft Corp")
  }

  test("federal awards parse renames to snake_case and coerces amount") {
    val out = ExampleSources.parseFederalAwards(spark, awardsJson)
    assert(out.columns.toSeq == Seq("award_id", "recipient_name",
      "award_amount", "awarding_agency", "start_date", "end_date",
      "award_type", "description"))
    val rows = out.orderBy("award_id").collect()
    assert(rows.length == 2)
    assert(rows(0).isNullAt(2)) // "not-a-number" coerced to null
    assert(rows(1).getDouble(2) == 1500000.50)
  }

  test("federal awards parse of empty results yields no rows") {
    val out = ExampleSources.parseFederalAwards(
      spark, """{"results":[]}""")
    assert(out.count() == 0)
  }

  test("jdk transport rejects POST on scripted transports by default") {
    val t: HttpTransport = (_, _) => HttpResponse(200, Map.empty, "{}")
    intercept[UnsupportedOperationException] {
      t.post("http://x", "{}")
    }
  }
}
