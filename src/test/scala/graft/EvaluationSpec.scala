package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Evaluation

/** pass@k estimator and Bradley-Terry MM fitting on hand-computable
  * fixtures. */
class EvaluationSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def passMap(rows: Seq[(Long, Boolean)], k: Int) =
    Evaluation.passAtK(rows.toDF("p", "ok"), "p", col("ok"), k)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap

  test("passAtK: telescoped product matches the combinatorial value") {
    // n=10, c=3, k=2: 1 - C(7,2)/C(10,2) = 1 - 21/45
    val rows = (1 to 10).map(i => (1L, i <= 3))
    val (n, c, p) = passMap(rows, k = 2)(1L)
    assert(n === 10L && c === 3L)
    assert(math.abs(p - (1.0 - 21.0 / 45.0)) < 1e-12)
  }

  test("passAtK: c=0 is exactly 0, n-c<k is exactly 1") {
    val rows = (1 to 3).map(i => (1L, false)) ++ // n=3,c=0 (n<k too)
      (1 to 4).map(i => (2L, i <= 3)) // n=4, c=3, n-c=1 < k
    val m = passMap(rows, k = 5)
    assert(m(1L)._3 === 0.0)
    assert(m(2L)._3 === 1.0)
  }

  test("passAtK: k=1 degenerates to the empirical pass rate") {
    val rows = (1 to 8).map(i => (7L, i <= 2)) // 2/8
    val (_, _, p) = passMap(rows, k = 1)(7L)
    assert(math.abs(p - 0.25) < 1e-15)
  }

  test("bradleyTerry: two items converge to the win-ratio fixed point") {
    // A beats B 3 times, B beats A once: fixed point (1.5, 0.5) under
    // the sum-to-m rescale, ratio = 3 = the win ratio
    val wins = Seq(("A", "B", 3L), ("B", "A", 1L))
      .toDF("winner", "loser", "w")
    val out = Evaluation.bradleyTerry(wins, iters = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("A") - 1.5) < 1e-9)
    assert(math.abs(out("B") - 0.5) < 1e-9)
    assert(math.abs(out("A") + out("B") - 2.0) < 1e-12)
  }

  test("bradleyTerry: transitive triple orders strengths correctly") {
    // A dominates B, B dominates C; strengths must order A > B > C and
    // sum to 3 after the rescale
    val wins = Seq(("A", "B", 4L), ("B", "A", 1L),
      ("B", "C", 4L), ("C", "B", 1L), ("A", "C", 5L))
      .toDF("winner", "loser", "w")
    val out = Evaluation.bradleyTerry(wins, iters = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("A") > out("B") && out("B") > out("C"))
    assert(math.abs(out.values.sum - 3.0) < 1e-9)
  }

  test("bradleyTerry: never-winning item goes to the zero boundary") {
    val wins = Seq(("A", "B", 5L)).toDF("winner", "loser", "w")
    val out = Evaluation.bradleyTerry(wins, iters = 12)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("B") < 0.01)
    assert(math.abs(out("A") + out("B") - 2.0) < 1e-12)
  }
}
