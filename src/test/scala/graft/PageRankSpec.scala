package graft

import graft.graph.PageRank
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class PageRankSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .appName("graft-pagerank-spec")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Reference single-threaded integer fixpoint — the exact recurrence. */
  private def oracle(edges: Seq[(Long, Long)], iterations: Int,
      dampingPct: Int = 85, scale: Long = 1000000000000L): Map[Long, Long] = {
    val es = edges.distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val outdeg = es.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n = nodes.size.toLong
    val base = scale * (100 - dampingPct) / 100 / n
    var r = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iterations) {
      val s = es.groupBy(_._2).map { case (dst, in) =>
        dst -> in.map(e => r(e._1) / outdeg(e._1)).sum
      }
      r = nodes.map(v => v -> (base + dampingPct * s.getOrElse(v, 0L) / 100)).toMap
    }
    r
  }

  test("matches the single-threaded integer fixpoint on an asymmetric graph") {
    import spark.implicits._
    // hub (0) -> everyone; chain 1->2->3; 4 links only to the hub; 3 is a sink
    val edges = Seq[(Long, Long)](
      (0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (4, 0))
    val got = PageRank.run(edges.toDF("src", "dst"), "src", "dst", iterations = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = oracle(edges, 8)
    assert(got == want)
    // sanity on the shape: 2 has two in-links (hub + 1) and must outrank 1
    assert(got(2L) > got(1L))
    // determinism across a rerun with different partitioning
    val again = PageRank.run(edges.toDF("src", "dst").repartition(7), "src", "dst", iterations = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == got)
  }

  test("duplicate edges collapse; fractional src rejected; empty graph returns empty") {
    import spark.implicits._
    val dup = Seq[(Long, Long)]((1, 2), (1, 2), (1, 2), (2, 1))
    val got = PageRank.run(dup.toDF("src", "dst"), "src", "dst", iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == oracle(dup, 4))
    val bad = intercept[IllegalArgumentException] {
      PageRank.run(Seq((1.5, 2.0)).toDF("src", "dst"), "src", "dst")
    }
    assert(bad.getMessage.contains("integral"))
    assert(PageRank.run(Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst").count() == 0)
  }
}
