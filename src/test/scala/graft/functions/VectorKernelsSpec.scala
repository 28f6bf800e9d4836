package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native vector kernels that replaced HOF spellings must be
  * bit-identical to them on every on-contract input — q101's micro-unit
  * rounding and q91/q92/q75's bucket codes (and their serialized-matrix
  * oracles) all sit downstream of exact equality here. */
class VectorKernelsSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random unit-scale vectors (no RNG in tests)
  private def vec(seed: Int, dim: Int): Seq[Double] =
    (1 to dim).map(i =>
      org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashLong(i.toLong * 1013904223L + seed, seed)
        .toDouble / Int.MaxValue)

  test("squared_l2 is bit-identical to the aggregate(zip_with) fold") {
    val rows = Seq(
      (vec(1, 64), vec(2, 64)),
      (vec(3, 8), vec(4, 8)),
      (vec(5, 64), vec(5, 64)),          // zero distance
      (Seq.empty[Double], Seq.empty[Double]))
    val df = rows.toDF("a", "b").select(
      SquaredL2(col("a"), col("b")).as("got"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0d), (s, x) => s + x).as("want"))
    df.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"squared_l2 diverged from the HOF fold: $r")
    }
    // interpreted path mirrors codegen
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val (a, b) = (vec(6, 64), vec(7, 64))
    val e = SquaredL2(
      Literal(new GenericArrayData(a.toArray), ArrayType(DoubleType)),
      Literal(new GenericArrayData(b.toArray), ArrayType(DoubleType)))
    val want = a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + (x - y) * (x - y) }
    assert(e.eval(null).asInstanceOf[Double] == want)
  }

  test("srp_bucket matches the per-bit when(proj > 0) HOF spelling") {
    val bits = 8; val dim = 64
    val ws: Seq[Seq[Double]] = (0 until bits).map(b =>
      (0 until dim).map(i =>
        if (scala.util.hashing.MurmurHash3.caseClassHash((b, i)) >= 0) 1.0
        else -1.0))
    val rows = Seq(vec(10, dim), vec(11, dim), vec(12, dim),
      Seq.fill(dim)(0.0))                // all-zero vector: no bit fires
    def hofBucket(e: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (0 until bits).map { b =>
        val proj = aggregate(zip_with(e, typedLit(ws(b)), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x)
        when(proj > 0, lit(1 << b)).otherwise(lit(0))
      }.reduce(_ + _)
    val df = rows.toDF("e").select(
      SignedProjectionBucket(col("e"), ws).as("got"),
      hofBucket(col("e")).as("want"))
    df.collect().foreach { r =>
      assert(r.getInt(0) == r.getInt(1), s"srp_bucket diverged: $r")
    }
    // interpreted path mirrors codegen
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    rows.foreach { v =>
      val e = SignedProjectionBucket(
        Literal(new GenericArrayData(v.toArray), ArrayType(DoubleType)),
        ws.map(_.toIndexedSeq).toIndexedSeq)
      val want = (0 until bits).foldLeft(0) { (code, b) =>
        val s = v.zip(ws(b)).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
        if (s > 0) code | (1 << b) else code
      }
      assert(e.eval(null) == want)
    }
  }
}
