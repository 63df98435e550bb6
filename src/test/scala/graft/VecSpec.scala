package graft

import graft.functions.VecOps
import graft.operators.VecAgg
import org.apache.spark.sql.functions._

/** Golden/property tests for the array-form vector math (SURVEY.md §5.2#2-3):
  * the fused higher-order-function paths must agree with independent
  * long-form/driver-side computations on real testdata.
  */
class VecSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf001).cache()

  test("l2norm array form agrees with driver-side recomputation") {
    val rows = emb.select(col("vec_id"), col("embedding"),
      VecOps.l2norm(col("embedding")).as("norm")).limit(50).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](r.fieldIndex("embedding"))
      val expected = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(r.getAs[Double]("norm") - expected) < 1e-9,
        s"vec ${r.get(0)}")
    }
  }

  test("cosine is 1 on self, symmetric, in [-1,1]") {
    val pairs = emb.limit(20).select(col("vec_id").as("id_a"), col("embedding").as("va"))
      .crossJoin(emb.limit(20).select(col("vec_id").as("id_b"), col("embedding").as("vb")))
      .select(col("id_a"), col("id_b"),
        VecOps.cosine(col("va"), col("vb")).as("cab"),
        VecOps.cosine(col("vb"), col("va")).as("cba"))
      .collect()
    pairs.foreach { r =>
      val (cab, cba) = (r.getAs[Double]("cab"), r.getAs[Double]("cba"))
      assert(math.abs(cab - cba) < 1e-12)
      assert(cab <= 1.0 + 1e-9 && cab >= -1.0 - 1e-9)
      if (r.getAs[Long]("id_a") == r.getAs[Long]("id_b"))
        assert(math.abs(cab - 1.0) < 1e-6)
    }
  }

  test("l2sq equals squared l2 distance") {
    val r = emb.limit(2).collect().map(row => row.getSeq[Float](row.fieldIndex("embedding")))
    val d = emb.limit(1).select(
      VecOps.l2sq(col("embedding"), col("embedding")).as("zero")).head()
    assert(d.getAs[Double]("zero") == 0.0)
    val two = emb.filter(col("vec_id") < 2)
      .agg(collect_list(col("embedding"))).head()
      .getSeq[scala.collection.Seq[Float]](0)
    if (two.size == 2) {
      val expected = two(0).zip(two(1)).map { case (a, b) =>
        val dl = a.toDouble - b.toDouble; dl * dl
      }.sum
      val got = emb.filter(col("vec_id") === 0)
        .crossJoin(emb.filter(col("vec_id") === 1).select(col("embedding").as("e2")))
        .select(VecOps.l2sq(col("embedding"), col("e2")).as("d")).head().getDouble(0)
      assert(math.abs(got - expected) < 1e-9)
    }
  }

  test("meanVec aggregator agrees with long-form group mean") {
    val agg = emb.groupBy(col("label"))
      .agg(VecAgg.meanVec(col("embedding")).as("centroid"))
      .collect().map(r => r.getAs[Int]("label") -> r.getSeq[Double](r.fieldIndex("centroid"))).toMap
    val longForm = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("v").cast("double")).as("m"))
      .collect()
    longForm.foreach { r =>
      val got = agg(r.getAs[Int]("label"))(r.getAs[Int]("pos"))
      assert(math.abs(got - r.getAs[Double]("m")) < 1e-6,
        s"label ${r.get(0)} pos ${r.get(1)}")
    }
  }

  test("CKA: self-similarity 1, symmetry, [0,1] range") {
    // pair each vector with itself → CKA must be 1
    val self = emb.limit(100)
      .agg(VecAgg.cka(col("embedding"), col("embedding")).as("c"))
      .head().getAs[Double]("c")
    assert(math.abs(self - 1.0) < 1e-9, s"cka(X,X)=$self")

    // split dims into two halves → symmetric, in [0,1]
    val halves = emb.limit(100).select(
      slice(col("embedding"), 1, 32).as("x"),
      slice(col("embedding"), 33, 32).as("y"))
    val cxy = halves.agg(VecAgg.cka(col("x"), col("y"))).head().getDouble(0)
    val cyx = halves.agg(VecAgg.cka(col("y"), col("x"))).head().getDouble(0)
    assert(math.abs(cxy - cyx) < 1e-9)
    assert(cxy >= 0.0 && cxy <= 1.0 + 1e-9)
  }

  test("CKA matches a driver-side ndarray-style reimplementation") {
    val rows = emb.filter(col("vec_id") < 60).orderBy(col("vec_id"))
      .select(slice(col("embedding"), 1, 8).as("x"), slice(col("embedding"), 9, 8).as("y"))
      .collect()
    val x = rows.map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val y = rows.map(_.getSeq[Float](1).map(_.toDouble).toArray)
    def center(m: Array[Array[Double]]): Array[Array[Double]] = {
      val n = m.length; val d = m(0).length
      val mu = Array.tabulate(d)(j => m.map(_(j)).sum / n)
      m.map(r => Array.tabulate(d)(j => r(j) - mu(j)))
    }
    def gram(a: Array[Array[Double]], b: Array[Array[Double]]): Array[Array[Double]] = {
      val p = a(0).length; val q = b(0).length
      Array.tabulate(p, q)((i, j) => a.indices.map(r => a(r)(i) * b(r)(j)).sum)
    }
    def fro2(m: Array[Array[Double]]): Double = m.flatten.map(v => v * v).sum
    val (xc, yc) = (center(x), center(y))
    val expected = fro2(gram(xc, yc)) / (math.sqrt(fro2(gram(xc, xc))) * math.sqrt(fro2(gram(yc, yc))))
    val got = emb.filter(col("vec_id") < 60)
      .select(slice(col("embedding"), 1, 8).as("x"), slice(col("embedding"), 9, 8).as("y"))
      .agg(VecAgg.cka(col("x"), col("y"))).head().getDouble(0)
    assert(math.abs(got - expected) < 1e-9, s"got $got expected $expected")
  }
}
