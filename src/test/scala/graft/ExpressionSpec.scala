package graft

import org.apache.spark.sql.functions._

/** Uses the shared SparkSpec session — which carries GraftExtensions, the
  * same way Verify/Bench sessions do (extensions are a session-construction
  * concern, so they live in every engine session builder).
  */
class ExpressionSpec extends SparkSpec {

  test("cosine_sim: registered via extensions, agrees with the HOF form, codegens") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = emb.limit(30).select(col("vec_id").as("ia"), col("embedding").as("a"))
      .crossJoin(emb.limit(30).select(col("vec_id").as("ib"), col("embedding").as("b")))
    val both = pairs.select(col("ia"), col("ib"),
      expr("cosine_sim(a, b)").as("native"),
      graft.functions.VecOps.cosine(col("a"), col("b")).as("hof"))
    val rows = both.collect()
    assert(rows.length == 900)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-9,
        s"(${r.get(0)},${r.get(1)}): native=${r.get(2)} hof=${r.get(3)}")
    }
    // the expression must run inside whole-stage codegen, not as a fallback.
    // (checked on a native-only projection: Catalyst's higher-order
    // functions are CodegenFallback, so a project containing BOTH forms is
    // forced out of codegen by the HOF column — itself the reason a native
    // expression is the preferred form.)
    val nativeOnly = pairs.select(expr("cosine_sim(a, b)").as("native"))
    nativeOnly.collect() // finalize the adaptive plan so codegen stages show
    val plan = nativeOnly.queryExecution.executedPlan.toString
    val projectLine = plan.linesIterator.find(_.contains("cosinesimilarity")).get
    assert(projectLine.contains("*("), s"project not codegen'd:\n$plan")
  }

  test("int8_cosine: registered via extensions, agrees with the library kernel") {
    import graft.operators.SimilaritySearch
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = SimilaritySearch.quantizeInt8(emb.limit(20))
      .crossJoin(emb.limit(5).select(col("vec_id").as("qid"), col("embedding").as("fq")))
    val rows = q.select(
        expr("int8_cosine(qv, scale, qnorm, fq)").as("sql_form"),
        org.apache.spark.sql.graft.ColumnBridge.column(
          graft.expressions.Int8Cosine(
            org.apache.spark.sql.graft.ColumnBridge.expression(col("qv")),
            org.apache.spark.sql.graft.ColumnBridge.expression(col("scale")),
            org.apache.spark.sql.graft.ColumnBridge.expression(col("qnorm")),
            org.apache.spark.sql.graft.ColumnBridge.expression(col("fq"))))
          .as("bridge_form"))
      .collect()
    assert(rows.length == 100)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(rows.forall(r => r.getDouble(0) >= -1.01 && r.getDouble(0) <= 1.01))
  }

  test("SQL-registered text/hash functions agree with the Scala composers") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
    val both = docs.select(
      expr("graft_quality(text)").as("q_sql"),
      graft.functions.TextOps.qualityScore(col("text")).as("q_lib"),
      expr("graft_lang_id(text)").as("l_sql"),
      graft.functions.TextOps.langId(col("text")).as("l_lib"),
      expr("graft_knuth32(doc_id)").as("h_sql"),
      graft.operators.Dedup.knuth32(col("doc_id")).as("h_lib"))
    both.collect().foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getString(2) == r.getString(3))
      assert(r.getLong(4) == r.getLong(5))
    }
  }

  test("cosine_sim: null inputs give null, self-similarity is 1") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(1.0f, 2.0f))),
      (None: Option[Seq[Float]], Some(Seq(1.0f, 2.0f))))
      .toDF("a", "b")
    val out = df.select(expr("cosine_sim(a, b)")).collect()
    assert(math.abs(out(0).getDouble(0) - 1.0) < 1e-9)
    assert(out(1).isNullAt(0))
  }

  test("cosine_sim rejects non-array inputs at analysis time") {
    import spark.implicits._
    val df = Seq((1, 2)).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(expr("cosine_sim(a, b)")).collect()
    }
  }

  test("cosine_sim: mismatched lengths and null elements give null, both paths") {
    import spark.implicits._
    val df = Seq(
      (Seq[java.lang.Float](1.0f, 2.0f), Seq[java.lang.Float](1.0f, 2.0f, 3.0f)),
      (Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](1.0f, 2.0f)),
      (Seq[java.lang.Float](3.0f, 4.0f), Seq[java.lang.Float](3.0f, 4.0f)))
      .toDF("a", "b")
    // codegen path
    val out = df.select(expr("cosine_sim(a, b)")).collect()
    assert(out(0).isNullAt(0), "length mismatch must be null, not truncated")
    assert(out(1).isNullAt(0), "null element must poison the result")
    assert(math.abs(out(2).getDouble(0) - 1.0) < 1e-9)
    // interpreted path (eval): force through a CodegenFallback context
    val expr0 = graft.expressions.CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0f, 2.0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, false)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0f, 2.0f, 3.0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, false)))
    assert(expr0.eval(null) == null)
  }

  test("graft_nfc: composes decomposed sequences, idempotent, null-safe, both paths") {
    import spark.implicits._
    val decomposed = "cafe\u0301 A\u030Angstro\u0308m"
    val precomposed = "caf\u00e9 \u00c5ngstr\u00f6m"
    val df = Seq(Tuple1(decomposed), Tuple1(precomposed), Tuple1(null: String))
      .toDF("s")
    // codegen path, via the SQL registration
    val out = df.select(expr("graft_nfc(s)")).collect()
    assert(out(0).getString(0) == precomposed,
      s"composition failed: ${out(0).getString(0).codePoints.toArray.toSeq}")
    assert(out(1).getString(0) == precomposed, "NFC not idempotent")
    assert(out(2).isNullAt(0), "null input must stay null")
    // Scala composer agrees
    val viaApi = df.select(graft.functions.TextOps.nfcNormalize($"s")).collect()
    assert(viaApi(0).getString(0) == precomposed)
    // interpreted path
    val e = graft.expressions.NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(decomposed),
        org.apache.spark.sql.types.StringType))
    assert(e.eval(null).toString == precomposed)
    // stays inside whole-stage codegen (no CodegenFallback eviction) — on
    // a parquet-backed scan; a local Seq constant-folds to LocalTableScan
    val scan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(expr("graft_nfc(text)").as("n"))
    scan.collect()
    val plan = scan.queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("nfcnormalize")).get
    assert(line.contains("*("), s"nfc evicted from codegen:\n$plan")
  }

  test("CollapseNfc: nested normalizations collapse to one in the optimized plan") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(expr("graft_nfc(graft_nfc(graft_nfc(text)))").as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString.toLowerCase
    val occurrences = "nfcnormalize".r.findAllIn(optimized).size
    assert(occurrences == 1,
      s"nested graft_nfc not collapsed ($occurrences nodes):\n$optimized")
    // and the collapsed plan still computes the right thing
    val got = df.limit(1).collect()(0).getString(0)
    val want = java.text.Normalizer.normalize(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("text").limit(1).collect()(0).getString(0),
      java.text.Normalizer.Form.NFC)
    assert(got == want)
  }

  test("graft_quality arity errors name the function at analysis time") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_quality()").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m =>
        m.contains("graft_quality") && m.contains("exactly 1")),
      s"opaque arity error: ${messages(e)}")
  }
}
