package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Robots

class RobotsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val robots = Seq(
    ("h1", "User-agent: *\n# note\n\nDisallow: /a/\nAllow: /a/b\n" +
      "disallow: /low/\nDisallow:\nCrawl-delay: 3\n"),
    ("h2", "User-agent: *\nDisallow: /p/\nAllow: /p/\n"))
    .toDF("host", "robots_txt")

  test("parseRobots: directives case-insensitive; comments, blanks, " +
       "User-agent, Crawl-delay and empty Disallow contribute no rule") {
    val rules = Robots.parseRobots(robots, "host", "robots_txt").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rules == Set(
      ("h1", "disallow", "/a/"), ("h1", "allow", "/a/b"),
      ("h1", "disallow", "/low/"),
      ("h2", "disallow", "/p/"), ("h2", "allow", "/p/")))
  }

  test("robotsGate: longest match wins, Allow wins ties, no match allows, " +
       "unknown host allows") {
    val urls = Seq(
      (1L, "h1", "/a/b/c"),   // Allow /a/b (4) beats Disallow /a/ (3)
      (2L, "h1", "/a/x"),     // only Disallow /a/ matches -> blocked
      (3L, "h1", "/z"),       // no rule matches -> allowed
      (4L, "h1", "/low/q"),   // lowercase directive still blocks
      (5L, "h2", "/p/q"),     // tie at length 3 -> Allow wins
      (6L, "h9", "/a/b"))     // host without robots -> allowed
      .toDF("doc_id", "domain", "path")
    val rules = Robots.parseRobots(robots, "host", "robots_txt")
    val out = Robots.robotsGate(urls, rules).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("allowed")).toMap
    assert(out == Map(1L -> 1, 2L -> 0, 3L -> 1, 4L -> 0, 5L -> 1, 6L -> 1))
  }
}
