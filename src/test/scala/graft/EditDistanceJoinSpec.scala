package graft

import org.apache.spark.sql.functions._

import graft.operators.EditDistanceJoin

class EditDistanceJoinSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib
      dist = lev(sa, sb)
      if dist <= k
    } yield (ia, ib, dist)).toSet
  }

  private def joined(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] =
    EditDistanceJoin.selfPairs(rows.toDF("id", "s"), "id", "s", k)
      .as[(Long, Long, Int)].collect().toSet

  test("lossless vs brute force on substitution, INSERT, and DELETE " +
    "edits (the shifted-window part of the pigeonhole lemma)") {
    val base = "the quick brown fox jumps"
    val rows = Seq(
      1L -> base,
      2L -> base.updated(4, 'x').updated(10, 'y'),       // 2 substitutions
      3L -> (base.take(8) ++ base.drop(9)),              // 1 delete (shifts tail)
      4L -> (base.take(12) + "zz" + base.drop(12)),      // 2 inserts
      5L -> (base.take(3) ++ base.drop(5)),              // 2 deletes at the front
      6L -> "completely different text here",
      7L -> base.reverse)
    assert(joined(rows, 2) == bruteForce(rows, 2))
  }

  test("lossless vs brute force on a deterministic pseudo-random corpus " +
    "with mixed lengths, k = 1 and k = 3") {
    // LCG-derived strings over a 4-letter alphabet, lengths 6..17 —
    // small alphabet forces natural near-pairs and hot segments
    var x = 12345L
    def nextInt(n: Int): Int = { x = (x * 6364136223846793005L + 1442695040888963407L); (((x >>> 33) % n).toInt + n) % n }
    val rows = (1L to 60L).map { i =>
      val len = 6 + nextInt(12)
      i -> (0 until len).map(_ => "abcd"(nextInt(4))).mkString
    }
    assert(joined(rows, 1) == bruteForce(rows, 1))
    assert(joined(rows, 3) == bruteForce(rows, 3))
  }

  test("strings of length 0..k (incl. empty) are lossless — empty " +
    "segments are legitimate witness keys (ADVICE r10)") {
    val rows = Seq(1L -> "", 2L -> "x", 3L -> "xy", 4L -> "ab", 5L -> "xyz",
      6L -> "abcd", 7L -> "abcde", 8L -> "wwwwwwww", 9L -> "x", 10L -> "")
    for (k <- 1 to 4) {
      val want = bruteForce(rows, k)
      assert(joined(rows, k) == want, s"k=$k")
      assert(want.contains((1L, 10L, 0)), "empty-empty pair present")
      assert(want.contains((1L, 2L, 1)), "'' vs 'x' present")
    }
  }

  test("candidate generation is an equi-join on (length, slot, segment) " +
    "— no cartesian, no nested loop") {
    val rows = (1L to 20L).map(i => i -> s"string number $i pad pad")
    val p = EditDistanceJoin.selfPairs(rows.toDF("id", "s"), "id", "s", 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pairwise operator in PassJoin plan:\n$p")
  }
}
