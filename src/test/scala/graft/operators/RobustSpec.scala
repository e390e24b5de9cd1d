package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** MAD robust statistics: hand-computed lower medians (odd, even, and
  * repeated-value multisets), the outlier flag boundary, the breakdown
  * property that motivates MAD over stddev, and partition independence.
  */
class RobustSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df(xs: Seq[Long]) = {
    import spark.implicits._
    xs.toDF("v")
  }

  private def stats(xs: Seq[Long]): (Long, Long, Long) = {
    val r = Robust.madStats(df(xs), "v").head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("odd count: med is the middle, mad the middle deviation") {
    // sorted 1 2 3 4 100 -> med 3; |d| sorted 0 1 1 2 97 -> mad 1
    assert(stats(Seq(3, 1, 100, 2, 4)) == ((3L, 1L, 5L)))
  }

  test("even count uses the LOWER median") {
    // sorted 1 2 3 4 -> lower median 2; |d| 1 0 1 2 sorted 0 1 1 2 -> mad 1
    assert(stats(Seq(4, 2, 3, 1)) == ((2L, 1L, 4L)))
  }

  test("repeated values: counts weight the selection") {
    // 5,5,5,5,9 -> med 5; deviations 0 x4, 4 -> mad 0
    assert(stats(Seq(5, 5, 5, 5, 9)) == ((5L, 0L, 5L)))
  }

  test("breakdown: one wild value moves mean/stddev but not med/mad") {
    val clean = stats(Seq(10, 11, 12, 13, 14))
    val dirty = stats(Seq(10, 11, 12, 13, 1000000))
    assert(clean._1 == 12L && dirty._1 == 12L)
    assert(clean._2 == 1L && dirty._2 == 1L)
  }

  test("outlier report: boundary is strict (> mult*mad, not >=)") {
    import spark.implicits._
    // med 10, deviations 0 0 0 5 5 -> mad 0... use a spread set instead:
    // values 8 9 10 11 12 100: med 10 (lower), devs 2 1 0 1 2 90 ->
    // sorted 0 1 1 2 2 90, n=6 -> k=3 -> mad 1
    val d = Seq(("a", 8L), ("a", 9L), ("a", 10L), ("b", 11L), ("b", 12L), ("b", 100L))
      .toDF("grp", "v")
    val out = Robust.madOutlierReport(d, "v", mult = 2, groupCols = Seq("grp"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // threshold: |v-10| > 2 -> 8(d2) not outlier (strict), 100(d90) is
    assert(out("a") == ((3L, 0L, 10L, 1L)))
    assert(out("b") == ((3L, 1L, 10L, 1L)))
  }

  test("null values are excluded from the stats but counted in n_rows") {
    import spark.implicits._
    val d = Seq((Some(1L), "g"), (Some(2L), "g"), (Some(3L), "g"), (None, "g"))
      .toDF("v", "grp")
    val st = Robust.madStats(d, "v").head()
    assert(st.getLong(0) == 2L && st.getLong(2) == 3L)
    val rep = Robust.madOutlierReport(d, "v", 3, Seq("grp")).head()
    assert(rep.getLong(1) == 4L && rep.getLong(2) == 0L)
  }

  test("result is partition-layout independent (the gate property)") {
    val xs = (1 to 997).map(i => ((i * 37) % 211).toLong)
    val a = Robust.madStats(df(xs), "v").head().toSeq
    val b = Robust.madStats(df(xs).repartition(11), "v").head().toSeq
    assert(a == b)
  }

  test("trimmedMeanReport: trims exactly floor(n*p/1000) from each tail per group") {
    import spark.implicits._
    // g1: values 1..10, trim 10% → t=1 → keep 2..9, sum 44, mean 5.5
    // g2: 3 rows, trim 10% → t=0 → keep all
    val rows = (1 to 10).map(i => ("g1", i.toLong, i)) ++
      Seq(("g2", 100L, 1), ("g2", 200L, 2), ("g2", 900L, 3))
    val d = rows.toDF("grp", "v", "id")
    val r = Robust.trimmedMeanReport(d, "v", Seq("grp"), permille = 100,
        tieCols = Seq("id"))
      .orderBy("grp").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4)))
    assert(r.toSeq == Seq(
      ("g1", 10L, 8L, 44L, 5.5), ("g2", 3L, 3L, 1200L, 400.0)))
  }

  test("trimmedMeanReport (r22 bucketed): matches the rank definition on ties, negatives, skew") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // adversarial multiset: heavy ties (forces straddling buckets to split
    // a tie run across the cut), negatives (trunc-div bucket monotonicity),
    // one huge outlier (bucket width >> typical gap, most mass in bucket 0)
    val rows = (1 to 500).map(i => ("a", ((i * 29) % 37).toLong - 18L, i)) ++
      (1 to 300).map(i => ("a", 5L, 1000 + i)) ++
      Seq(("a", 999999999L, 2000)) ++
      (1 to 40).map(i => ("b", (i % 3).toLong, 3000 + i))
    val d = rows.toDF("grp", "v", "id")
    for (p <- Seq(0, 50, 100, 499)) {
      val got = Robust.trimmedMeanReport(d, "v", Seq("grp"), p, Seq("id"))
        .orderBy("grp").collect()
        .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4)))
      // rank-definition reference, computed independently with a window
      val grpW = Window.partitionBy(col("grp"))
      val w = grpW.orderBy(col("v"), col("id"))
      val ref = d.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(grpW))
        .withColumn("t", expr(s"(n * $p) div 1000"))
        .where(col("rn") > col("t") && col("rn") <= col("n") - col("t"))
        .groupBy("grp")
        .agg(max(col("n")).as("n_rows"), count(lit(1)).as("n_kept"),
          sum(col("v")).as("sum_kept"))
        .withColumn("trimmed_mean",
          col("sum_kept").cast("double") / col("n_kept").cast("double"))
        .orderBy("grp").collect()
        .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4)))
      assert(got.toSeq == ref.toSeq, s"permille=$p")
    }
  }

  test("trimmedMeanReport (r22 bucketed): single-value group and layout independence") {
    import spark.implicits._
    val d = (Seq.fill(50)(7L)).zipWithIndex.map { case (v, i) => ("g", v, i) }
      .toDF("grp", "v", "id")
    val a = Robust.trimmedMeanReport(d, "v", Seq("grp"), 100, Seq("id"))
      .collect()(0)
    assert((a.getLong(1), a.getLong(2), a.getLong(3), a.getDouble(4)) ==
      ((50L, 40L, 280L, 7.0)))
    val b = Robust.trimmedMeanReport(d.repartition(13), "v", Seq("grp"), 100, Seq("id"))
      .collect()(0)
    assert(a.toSeq == b.toSeq)
  }

  test("trimmedMeanReport: trim 0 is the plain mean; outlier falls in the trimmed tail") {
    import spark.implicits._
    val d = (Seq.fill(9)(10L) :+ 10000L).zipWithIndex
      .map { case (v, i) => ("g", v, i) }.toDF("grp", "v", "id")
    val plain = Robust.trimmedMeanReport(d, "v", Seq("grp"), 0, Seq("id"))
      .collect()(0).getDouble(4)
    val trimmed = Robust.trimmedMeanReport(d, "v", Seq("grp"), 100, Seq("id"))
      .collect()(0).getDouble(4)
    assert(plain == 1009.0)
    assert(trimmed == 10.0)
  }

  test("paretoFront: hand-computable frontier, duplicates both on front") {
    import spark.implicits._
    // front = (5,10), (8,20), (9,40); (4,10) dominated by (5,10),
    // (8,30) by (8,20), (3,50) by all; (5,10) duplicated -> both on front
    val df = Seq(
      (1L, 5L, 10L), (2L, 8L, 20L), (3L, 9L, 40L),
      (4L, 4L, 10L), (5L, 8L, 30L), (6L, 3L, 50L), (7L, 5L, 10L)
    ).toDF("doc_id", "q", "c")
    val got = Robust.paretoFront(df, "doc_id", "q", "c")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> true,
      4L -> false, 5L -> false, 6L -> false, 7L -> true), s"got $got")
  }

  test("paretoFront: bucket prefilter is sound — few-bucket result equals brute force") {
    import spark.implicits._
    val rows = (1L to 300L).map(i => (i, i * 37 % 101, i * 53 % 97))
    val got = Robust.paretoFront(rows.toDF("doc_id", "q", "c"), "doc_id", "q", "c",
        buckets = 4)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val brute = rows.map { case (i, q, c) =>
      i -> !rows.exists { case (_, q2, c2) =>
        q2 >= q && c2 <= c && (q2 > q || c2 < c) }
    }.toMap
    assert(got == brute,
      s"diff: ${got.toSet.diff(brute.toSet)} / ${brute.toSet.diff(got.toSet)}")
  }
}
