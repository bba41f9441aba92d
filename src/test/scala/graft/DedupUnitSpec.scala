package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Direct pins for d37 build components the fixture corpus never
  * exercises end-to-end: the 31-word synthetic vocabulary makes the
  * adaptive packer finish with pack+tuple rounds only, so the
  * giant-vocabulary fallback (contiguous distributed rank) needs its own
  * contract test. */
class DedupUnitSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-dedup-unit")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  test("denseRankBy: contiguous, order-preserving, duplicate-collapsing, count-exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // duplicated pairs in shuffled order, including negative keys
    val base = Seq.tabulate(500)(_ => (rnd.nextInt(40).toLong - 20, rnd.nextInt(7).toLong))
    val df = rnd.shuffle(base).toDF("rk", "rk2")
    val (ranked, n) = graft.operators.Dedup.denseRankBy(df, Seq("rk", "rk2"), "nrk")
    val rows = ranked.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toSeq
    val distinct = base.distinct
    assert(n == distinct.size.toLong)
    assert(rows.size == distinct.size) // one rank per DISTINCT key
    // contiguous 0..n-1
    assert(rows.map(_._2).sorted == (0L until n).toSeq)
    // order-isomorphic to the lexicographic key order
    val byRank = rows.sortBy(_._2).map(_._1)
    assert(byRank == distinct.sorted)
    // deterministic: a second run assigns identical ranks
    val (ranked2, n2) = graft.operators.Dedup.denseRankBy(df, Seq("rk", "rk2"), "nrk")
    assert(n2 == n)
    assert(ranked2.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toSeq.sortBy(_._2) == rows.sortBy(_._2))
  }
}
