package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-count honesty, in the build path (VERDICT r15 task 7):
  * `tools/check_counts.py` caught two past drifts between the SURVEY
  * prose counter and the actual registry, but only when someone ran
  * it. This spec makes the same assertions fail `sbt test` instead —
  * density straight off the live registry (a numbering gap means a
  * renamed/deleted query the driver's correctness gate would silently
  * skip) and the SURVEY.md "**N queries total**" statement.
  */
class CountContractSpec extends AnyFunSuite {

  private val nums = SparkEntry.queries.keySet.toSeq
    .map(n => "^q(\\d+)_".r.findFirstMatchIn(n)
      .getOrElse(fail(s"unparseable query name: $n")).group(1).toInt)
    .sorted

  test("query numbers are dense 1..N — no gaps the driver would " +
      "silently skip") {
    val missing = (1 to nums.max).toSet -- nums.toSet
    assert(missing.isEmpty, s"gaps in query numbering: ${missing.toSeq.sorted}")
    assert(nums.distinct.size == nums.size, "duplicate query numbers")
  }

  test("SURVEY.md's '**N queries total**' statement matches the " +
      "registry") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val m = "\\*\\*(\\d+) queries total".r.findFirstMatchIn(survey)
      .getOrElse(fail("SURVEY.md has no '**N queries total' statement"))
    assert(m.group(1).toInt == nums.size,
      s"SURVEY.md says ${m.group(1)} queries; registry has ${nums.size}")
  }
}
