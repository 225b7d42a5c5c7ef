package graft

import graft.ingest.Filters

/** A6-A10 truth table (SURVEY §5.2) — incl. the "ALL" wildcard and
  * empty-list-means-none semantics of /root/reference/main.go:163-175.
  */
class FiltersSpec extends SparkSuite {

  import spark.implicits._

  private val secs = Seq(
    Sec(1, "SBER", "Sberbank", "TQBR", "SHARE", "true"),
    Sec(2, "GAZP", "Gazprom", "TQBR", "SHARE", "true"),
    Sec(0, "ZERO", "ZeroId", "TQBR", "SHARE", "true"),       // A7: secid=0
    Sec(3, "DEAD", "Inactive", "TQBR", "SHARE", "false"),    // A7: !active
    Sec(4, "X2345678901234567", "TooLong", "TQBR", "SHARE", "true"), // A7: len>16
    Sec(5, "OFZ26230", "OFZ 26230 -OFZ", "TQCB", "BOND", "true"),
    Sec(6, "FUTSI", "SiH5", "FUT", "SHARE", "true"))

  private def run(c: org.apache.spark.sql.Column): Set[Int] =
    secs.toDF().filter(c).select("secid").as[Int].collect().toSet

  test("A7 validity gate drops zero-id, inactive, over-long codes") {
    assert(run(Filters.validSecurity) == Set(1, 2, 5, 6))
  }

  test("A6 board membership") {
    assert(run(Filters.boardMember(Seq("TQBR"))) == Set(1, 2, 0, 3, 4))
    assert(run(Filters.boardMember(Nil)) == Set.empty)
  }

  test("A8 exact code match") {
    assert(run(Filters.secCodeMatch(Seq("SBER"))) == Set(1))
  }

  test("A8 substring match (main.go:168 strings.Contains)") {
    assert(run(Filters.secCodeMatch(Seq("AZ"))) == Set(2))
  }

  test("A8 shortname match") {
    assert(run(Filters.secCodeMatch(Seq("SiH5"))) == Set(6))
  }

  test("A8 ALL wildcard matches everything") {
    assert(run(Filters.secCodeMatch(Seq("ALL"))) == secs.map(_.secid).toSet)
  }

  test("A8 empty list matches NOTHING (main.go:163-165)") {
    assert(run(Filters.secCodeMatch(Nil)) == Set.empty)
  }

  test("A9 bond suffix: BOND type AND suffix required") {
    assert(run(Filters.bondSuffix(Seq("-OFZ"))) == Set(5))
    assert(run(Filters.bondSuffix(Seq("H5"))) == Set.empty) // SiH5 is SHARE
  }

  test("A10 period whitelist: empty keeps all") {
    val kinds = Seq((1, 60), (2, 300), (3, 3600)).toDF("kind_id", "period")
    assert(kinds.filter(Filters.periodWhitelist(Nil)).count() == 3)
    assert(kinds.filter(Filters.periodWhitelist(Seq(60, 300))).count() == 2)
  }

  test("A6+A7+A8 subscription cascade composes") {
    assert(run(Filters.subscriptionCascade(Seq("TQBR"), Seq("ALL"))) == Set(1, 2))
    assert(run(Filters.subscriptionCascade(Seq("TQBR", "TQCB", "FUT"), Seq("ALL"))) == Set(1, 2, 5, 6))
    assert(run(Filters.subscriptionCascade(Seq("TQBR"), Nil)) == Set.empty)
  }

  test("A20 env-list parse: empty string is the empty list") {
    assert(Filters.parseList("") == Nil)
    assert(Filters.parseList(null) == Nil)
    assert(Filters.parseList("A,B") == Seq("A", "B"))
  }
}

/** Top-level for Spark encoder derivation. */
case class Sec(secid: Int, seccode: String, shortname: String,
    board: String, sectype: String, active: String)
