package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** k-anonymity: class-size counting, the suppression threshold boundary,
  * null quasi-values as their own class, the generalization-ladder
  * monotonicity that makes the coarsen-and-re-run loop terminate, and
  * partition-layout independence.
  */
class PrivacySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def people(rows: (Int, String, Int)*) = {
    import spark.implicits._
    rows.toDF("zip", "job", "age")
  }

  test("class sizes and the k boundary: size == k is NOT suppressed") {
    val df = people(
      (100, "a", 30), (100, "a", 31), (100, "a", 32), // class of 3
      (200, "b", 40), (200, "b", 41),                 // class of 2
      (300, "c", 50))                                 // class of 1
    val out = Privacy.kAnonymize(df, Seq("zip", "job"), k = 2)
      .collect().map(r => (r.getInt(0), r.getLong(3), r.getBoolean(4)))
    assert(out.filter(_._1 == 100).forall(t => t._2 == 3L && !t._3))
    assert(out.filter(_._1 == 200).forall(t => t._2 == 2L && !t._3)) // == k kept
    assert(out.filter(_._1 == 300).forall(t => t._2 == 1L && t._3))
  }

  test("null quasi-identifier values form their own equivalence class") {
    import spark.implicits._
    val df = Seq((Some(1), "x"), (None, "x"), (None, "x"))
      .toDF("zip", "job")
    val out = Privacy.kAnonymize(df, Seq("zip"), k = 2)
      .collect().map(r => (r.isNullAt(0), r.getLong(2), r.getBoolean(3)))
    assert(out.filter(_._1).forall(t => t._2 == 2L && !t._3))
    assert(out.filter(!_._1).forall(t => t._2 == 1L && t._3))
  }

  test("generalization monotonicity: coarsening a quasi column never shrinks a class") {
    // the property that terminates the coarsen-and-re-run ladder
    import org.apache.spark.sql.functions._
    val df = people((1 to 20).map(i => (i % 10, "j", i % 4)): _*)
    val fine = Privacy.kAnonymize(df, Seq("zip", "age"), k = 3)
      .collect().map(r => ((r.getInt(0) % 2, r.getInt(2)), r.getLong(3)))
    val coarse = Privacy.kAnonymize(df.withColumn("zip", col("zip") % 2),
        Seq("zip", "age"), k = 3)
      .collect().map(r => ((r.getInt(0), r.getInt(2)), r.getLong(3))).toMap
    assert(fine.forall { case (key, fineN) => coarse(key) >= fineN })
  }

  test("report aggregates suppressed counts and the smallest class per slice") {
    val df = people(
      (100, "a", 30), (100, "a", 31), (100, "b", 30),
      (200, "a", 40), (200, "a", 40), (200, "a", 41))
    val out = Privacy.kAnonymityReport(df, Seq("zip", "job", "age"), k = 2,
        groupCols = Seq("zip"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // zip 100: classes (a,30)=1 (a,31)=1 (b,30)=1 -> all 3 suppressed
    assert(out(100) == ((3L, 3L, 1L)))
    // zip 200: (a,40)=2 kept, (a,41)=1 suppressed
    assert(out(200) == ((3L, 1L, 1L)))
  }

  test("l-diversity: homogeneous classes are weak even when large (the k-anonymity gap)") {
    import spark.implicits._
    // class (1): 4 rows but ONE sensitive value -> weak at l=2
    // class (2): 2 rows, two values -> diverse
    val df = Seq((1, "flu"), (1, "flu"), (1, "flu"), (1, "flu"),
        (2, "flu"), (2, "cold"))
      .toDF("zip", "diagnosis")
    val out = Privacy.lDiversityReport(df, Seq("zip"), "diagnosis", l = 2,
        groupCols = Seq("zip"))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1) == ((1L, 1L, 1L, 4L))) // 1 class, weak, diversity 1, 4 rows
    assert(out(2) == ((1L, 0L, 2L, 2L)))
  }

  test("l-diversity boundary: diversity == l is NOT weak; groupCols must be in quasi") {
    import spark.implicits._
    val df = Seq((1, "a", "x"), (1, "a", "y"), (1, "b", "x"))
      .toDF("zip", "ward", "val")
    val out = Privacy.lDiversityReport(df, Seq("zip", "ward"), "val", l = 2,
        groupCols = Seq("zip")).head()
    assert(out.getLong(1) == 2L) // classes (1,a) and (1,b)
    assert(out.getLong(2) == 1L) // only (1,b) with diversity 1 is weak
    intercept[IllegalArgumentException] {
      Privacy.lDiversityReport(df, Seq("zip"), "val", 2, Seq("ward"))
    }
  }

  test("result is partition-layout independent (the gate property)") {
    val df = people((1 to 500).map(i => (i % 23, "j" + (i % 7), i % 11)): _*)
    val a = Privacy.kAnonymize(df, Seq("zip", "job"), k = 4)
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = Privacy.kAnonymize(df.repartition(9), Seq("zip", "job"), k = 4)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq)
  }

  test("t-closeness: variational distance replayed by hand, zero-cell counted") {
    import spark.implicits._
    // global: x appears 4 times, y 2 → P = (4/6, 2/6). Class A = (x,x,y):
    // Q = (2/3, 1/3) = P exactly → distance 0. Class B = (x,x,y... ) no:
    // B = (x, x) → Q = (1, 0); ½(|4/6−1| + |2/6−0|) = ½(2/6+2/6) = 1/3.
    // Class C = (y) → Q = (0, 1); ½(4/6 + 4/6) = 2/3 — the zero-count x
    // cell contributes, which is the left-join subtlety the spec pins.
    val df = Seq(
      ("A", "x"), ("A", "x"), ("A", "y"),
      ("B", "x"), ("B", "x"),
      ("C", "y")).toDF("cls", "v")
    val out = Privacy.tClosenessReport(df, Seq("cls"), "v", tNum = 1L, tDen = 2L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // dist = num/den: A 0/(2·6·3), B: |4·2−2·6| + |2·2−0·6| = 4+4 = 8 over
    // 2·6·2 = 24 → 1/3; C: |4·1−0| + |2·1−6| = 4+4 = 8 over 12 → 2/3.
    assert(out("A") == ((0L, 36L, false)), out)
    assert(out("B") == ((8L, 24L, false)), out) // 1/3 ≤ t = 1/2
    assert(out("C") == ((8L, 12L, true)), out) // 2/3 > 1/2 → breach
  }

  test("t-closeness plan: no window, global distribution broadcast") {
    val df = people((1 to 300).map(i => (i % 13, "j" + (i % 5), i % 7)): _*)
    val rep = Privacy.tClosenessReport(df, Seq("zip", "job"), "age", 1L, 4L)
    val plan = rep.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "t-closeness must not need a window")
    assert(plan.contains("BroadcastExchange") || plan.contains("Broadcast"),
      "global distribution and total must broadcast")
    // exact-gate property: partition-layout independent
    val a = rep.collect().map(_.toSeq).sortBy(_.toString).toSeq
    val b = Privacy.tClosenessReport(df.repartition(11), Seq("zip", "job"), "age", 1L, 4L)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(a == b)
  }
}
