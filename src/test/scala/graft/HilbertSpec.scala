package graft

import org.apache.spark.sql.functions._

import graft.functions.HilbertIndexExpression
import graft.functions.HilbertIndexExpression.{hilbertD, hilbertIndex, hilbertXY}

/** The Hilbert index kernel and its Catalyst expression: golden
  * values, exhaustive bijectivity + ADJACENCY (the property Z-order
  * lacks and the reason the curve exists), codegen/eval agreement,
  * SQL registration, loud out-of-range failure. */
class HilbertSpec extends SparkTestBase {
  import spark.implicits._

  test("golden order-1 and order-2 values") {
    // order 1: the U — (0,0)=0 (0,1)=1 (1,1)=2 (1,0)=3
    assert(hilbertD(0, 0, 1) == 0 && hilbertD(0, 1, 1) == 1)
    assert(hilbertD(1, 1, 1) == 2 && hilbertD(1, 0, 1) == 3)
    // order 2: first quadrant is the reflected sub-U
    assert(hilbertD(0, 0, 2) == 0 && hilbertD(1, 0, 2) == 1)
    assert(hilbertD(1, 1, 2) == 2 && hilbertD(0, 1, 2) == 3)
    assert(hilbertD(0, 2, 2) == 4) // enters the second quadrant
    assert(hilbertD(3, 0, 2) == 15) // curve exit corner
  }

  test("bijective and ADJACENT over the whole grid (bits = 4, exhaustive)") {
    val bits = 4
    val n = 1 << bits
    val cells = for { x <- 0 until n; y <- 0 until n }
      yield (hilbertD(x, y, bits), x, y)
    // bijection onto [0, n²)
    assert(cells.map(_._1).sorted == (0 until n * n).map(_.toLong))
    // adjacency: consecutive curve positions are grid neighbors —
    // |Δx| + |Δy| == 1 for EVERY step (Z-order violates this at every
    // power-of-two seam; this is the locality parquet boxes feed on)
    val walk = cells.sortBy(_._1)
    walk.sliding(2).foreach { case Seq((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x2 - x1) + math.abs(y2 - y1) == 1,
        s"curve jump between ($x1,$y1) and ($x2,$y2)")
    }
    // forward and inverse kernels agree
    (0 until n * n).foreach { d =>
      val (x, y) = hilbertXY(d, bits)
      assert(hilbertD(x, y, bits) == d.toLong, s"round trip broke at d=$d")
    }
  }

  test("the Catalyst expression matches the kernel through codegen and SQL") {
    val bits = 5
    val df = spark.range(200).select(
      (col("id") % 29).as("x"), (col("id") % 31).as("y"))
    val got = df.select(col("x"), col("y"),
        hilbertIndex(col("x"), col("y"), bits).as("h"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, h) =>
      assert(h == hilbertD(x, y, bits), s"codegen path diverged at ($x,$y)")
    }
    // SQL surface after registration
    HilbertIndexExpression.register(spark)
    df.createOrReplaceTempView("hil_in")
    val sql = spark.sql(s"SELECT x, y, hilbert_index(x, y, $bits) AS h FROM hil_in")
      .as[(Long, Long, Long)].collect()
    sql.foreach { case (x, y, h) => assert(h == hilbertD(x, y, bits)) }
  }

  test("out-of-range buckets fail loudly; guards fire") {
    intercept[IllegalArgumentException](hilbertD(-1, 0, 3))
    intercept[IllegalArgumentException](hilbertD(8, 0, 3))
    intercept[IllegalArgumentException](hilbertD(0, 9, 3))
    intercept[IllegalArgumentException](HilbertIndexExpression(null, null, 0))
    intercept[IllegalArgumentException](HilbertIndexExpression(null, null, 32))
    // and through the distributed path too (wrong bucket → wrong file
    // is a pruning-correctness bug; it must not pass silently)
    intercept[Exception] {
      Seq((99L, 0L)).toDF("x", "y")
        .select(hilbertIndex(col("x"), col("y"), 3)).collect()
    }
  }
}
