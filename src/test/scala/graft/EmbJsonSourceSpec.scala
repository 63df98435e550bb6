package graft

import org.apache.spark.sql.functions._

class EmbJsonSourceSpec extends SparkSpec {

  /** Reference-layout fixture: one {key: [floats]} object per group file,
    * floats written with Float.toString (shortest round-trip repr).
    */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-embjson").toString
    def write(group: String, entries: Seq[(String, Seq[Float])]): Unit = {
      val body = entries.map { case (k, v) =>
        s""""$k": [${v.map(_.toString).mkString(", ")}]"""
      }.mkString("{", ", ", "}")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(d, s"$group.json"),
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    write("modelA", Seq(
      "img1.png" -> Seq(0.5f, -1.25f, 3.75f),
      "img2.png" -> Seq(0.1f, 0.2f, 0.3f)))
    write("modelB", Seq(
      "img3.png" -> Seq(-0.0625f, 2.5f, 1.5f)))
    d
  }

  test("native source rows equal the from_json helper row-for-row") {
    val native = spark.read.format("embjson").load(dir)
      .select(col("group"), col("image_key"),
        col("embedding").cast("string").as("e"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    val helper = graft.sources.ImageIngest
      .readJsonEmbeddings(spark, s"$dir/*.json")
      .select(col("group"), col("image_key"),
        col("embedding").cast("string").as("e"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    assert(native == helper)
    assert(native.size == 3)
    // float round-trip through JSON text is exact
    val a = spark.read.format("embjson").load(dir)
      .filter(col("image_key") === "img3.png")
      .select(explode(col("embedding"))).collect().map(_.getFloat(0)).toSeq
    assert(a == Seq(-0.0625f, 2.5f, 1.5f))
  }

  test("column pruning reaches the scan: key-only projection drops the floats") {
    val df = spark.read.format("embjson").load(dir)
      .select(col("group"), col("image_key"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=[group,image_key]"),
      s"pruned schema not at the scan:\n$plan")
    assert(df.count() == 3)
  }

  test("group filter pushes down to file pruning, no residual filter node") {
    val df = spark.read.format("embjson").load(dir)
      .filter(col("group") === "modelA")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("groups=[modelA]"), s"filter not pushed:\n$plan")
    assert(df.count() == 2)
    // the ScanBuilder consumed the filter entirely (exact file mapping):
    // directly exercise the pushdown contract
    val sb = new graft.sources.EmbJsonScanBuilder(Seq(dir))
    val residual = sb.pushFilters(Array(
      org.apache.spark.sql.sources.EqualTo("group", "modelB"),
      org.apache.spark.sql.sources.GreaterThan("image_key", "a")))
    assert(residual.map(_.toString).toSeq ==
      Seq("""GreaterThan(image_key,a)"""))
    assert(sb.pushedFilters().length == 1)
    val parts = sb.build().toBatch.planInputPartitions()
    assert(parts.length == 1)
    assert(parts(0).asInstanceOf[graft.sources.EmbJsonInputPartition]
      .group == "modelB")
    // IN-list intersects with equality; contradiction prunes everything
    val sb2 = new graft.sources.EmbJsonScanBuilder(Seq(dir))
    sb2.pushFilters(Array(
      org.apache.spark.sql.sources.EqualTo("group", "modelA"),
      org.apache.spark.sql.sources.In("group", Array("modelB"))))
    assert(sb2.build().toBatch.planInputPartitions().isEmpty)
  }

  test("empty and missing directories read as empty relations") {
    val empty = java.nio.file.Files
      .createTempDirectory("graft-embjson-empty").toString
    assert(spark.read.format("embjson").load(empty).count() == 0)
    assert(spark.read.format("embjson").load(s"$empty/nope").count() == 0)
  }

  test("multi-path load unions the directories; duplicates are rejected") {
    val d2 = java.nio.file.Files
      .createTempDirectory("graft-embjson-second").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(d2, "modelC.json"),
      """{"img9.png": [1.0, 2.0]}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val both = spark.read.format("embjson").load(dir, d2)
    assert(both.count() == 4)
    assert(both.select(col("group")).distinct().collect()
      .map(_.getString(0)).toSet == Set("modelA", "modelB", "modelC"))
    // group pruning still prunes across the union
    assert(spark.read.format("embjson").load(dir, d2)
      .filter(col("group") === "modelC").count() == 1)
    // the same dir twice would silently double every row — refuse
    val ex = intercept[Exception] {
      spark.read.format("embjson").load(dir, dir).count()
    }
    assert(ex.getMessage.contains("duplicate"), ex.getMessage)
    // aliases of the same directory (trailing slash, file:-qualified)
    // must be caught too — dedup is on qualified URIs, not raw strings
    val exSlash = intercept[Exception] {
      spark.read.format("embjson").load(dir, dir + "/").count()
    }
    assert(exSlash.getMessage.contains("duplicate"), exSlash.getMessage)
    val exScheme = intercept[Exception] {
      spark.read.format("embjson").load(dir, "file:" + dir).count()
    }
    assert(exScheme.getMessage.contains("duplicate"), exScheme.getMessage)
    // no path at all is a clear contract error, not an NPE
    val ex2 = intercept[Exception] {
      spark.read.format("embjson").load().count()
    }
    assert(ex2.getMessage.contains("path"), ex2.getMessage)
  }

  test("session Hadoop configuration reaches listing and executor-side reads") {
    // a spark.hadoop.*-style setting applied to the session conf must be
    // visible wherever the connector resolves a filesystem; a bare `new
    // Configuration()` would drop it (the ADVICE finding). Set a marker
    // on the session conf and prove the serialized envelope carries it.
    val key = "graft.test.embjson.marker"
    spark.sessionState.conf.setConfString(key, "present")
    try {
      val conf = spark.sessionState.newHadoopConf()
      assert(conf.get(key) == "present")
      // the wire format executors receive: round-trip the envelope
      val env = new graft.sources.SerializableHadoopConf(conf)
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(env); oos.close()
      val back = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
        .readObject().asInstanceOf[graft.sources.SerializableHadoopConf]
      assert(back.value.get(key) == "present",
        "session conf lost through the executor serialization envelope")
      // and the full read path still works with the session conf in play
      assert(spark.read.format("embjson").load(dir).count() == 3)
    } finally spark.sessionState.conf.unsetConf(key)
  }
}
