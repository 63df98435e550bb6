package graft

import graft.functions.TextOps
import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("langId identifies clear-cut samples") {
    val df = Seq(
      (1L, "the cat is in the house and it is warm"),
      (2L, "der hund ist nicht in der stadt und das ist gut"),
      (3L, "le chat est dans la maison et les enfants"),
      (4L, "el perro es un animal que vive por la casa"),
      (5L, "这是一个中文句子用来测试语言识别"),
      (6L, "xyzzy plugh 12345")).toDF("id", "text")
    val out = df.select($"id", TextOps.langId($"text").as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en"); assert(out(2L) == "de")
    assert(out(3L) == "fr"); assert(out(4L) == "es")
    assert(out(5L) == "zh"); assert(out(6L) == "und")
  }

  test("qualityScore is in [0,1], penalizes repetition and symbol soup") {
    val df = Seq(
      (1L, "A reasonably long and varied sentence about distributed query engines and their optimizers, written in plain prose with many distinct words to score well."),
      (2L, "spam spam spam spam spam spam spam spam spam spam"),
      (3L, "@@@ ### $$$ %%% ^^^ &&& *** ((( )))")).toDF("id", "text")
    val out = df.select($"id", TextOps.qualityScore($"text").as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.values.forall(q => q >= 0.0 && q <= 1.0))
    assert(out(1L) > out(2L), s"varied ${out(1L)} should beat repetition ${out(2L)}")
    assert(out(1L) > out(3L), s"prose ${out(1L)} should beat symbols ${out(3L)}")
  }

  test("tokenCount: letters runs, digit runs, symbols count separately") {
    val df = Seq(("hello world 123 f(x)=y!", 1)).toDF("text", "x")
    // hello|world|123|f|(|x|)|=|y|! = 10
    assert(df.select(TextOps.tokenCount($"text")).head().getInt(0) == 10)
  }

  test("fingerprints: shift-robust, distinct for different text") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val shifted = "PREFIX " + base
    val other = "completely unrelated content with no overlap whatsoever here"
    val df = Seq((1L, base), (2L, shifted), (3L, other)).toDF("id", "text")
    val fps = df.select($"id", TextOps.fingerprints($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val overlapShift = (fps(1L) & fps(2L)).size.toDouble / fps(1L).size
    val overlapOther = (fps(1L) & fps(3L)).size.toDouble / fps(1L).size
    assert(overlapShift > 0.8, s"shifted overlap $overlapShift")
    assert(overlapOther < 0.1, s"unrelated overlap $overlapOther")
  }

  test("salted join equals plain join") {
    val li = Tables.lineitem(spark, sf001).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf001).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(o, Seq("l_orderkey")).agg(
      count(lit(1)), sum("l_quantity"), sum("o_totalprice")).head()
    val salted = SkewJoin.saltedEquiJoin(li, o, "l_orderkey", saltFactor = 4).agg(
      count(lit(1)), sum("l_quantity"), sum("o_totalprice")).head()
    assert(plain.getLong(0) == salted.getLong(0))
    assert(math.abs(plain.getDouble(1) - salted.getDouble(1)) < 1e-6)
    assert(math.abs(plain.getDouble(2) - salted.getDouble(2)) < 1e-6)
  }

  test("TF-IDF top terms match hand-computed values; ubiquitous terms score 0") {
    // N=4 docs; "the" appears in all 4 (idf = ln 1 = 0), "cat" in 2,
    // "quark" only in doc 3 (tf=2) — the most characteristic term there
    val docs = Seq(
      (0L, "the cat sat"),
      (1L, "the cat ran far"),
      (2L, "the dog ran"),
      (3L, "the quark quark field")).toDF("doc_id", "text")
    val out = graft.operators.TfIdf.topTerms(docs, k = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getInt(5)))
    val byDoc = out.groupBy(_._1)
    // doc 3: quark tf=2 df=1 → 2·ln4; field tf=1 df=1 → ln4
    val d3 = byDoc(3L).sortBy(_._6)
    assert(d3.map(_._2).toSeq == Seq("quark", "field"))
    assert(math.abs(d3(0)._5 - 2 * math.log(4.0)) < 1e-12)
    assert(math.abs(d3(1)._5 - math.log(4.0)) < 1e-12)
    // "the" (df=4, idf=0) can never rank above any df<4 term; every doc has
    // at least one distinctive term, so "the" is absent from all top-2 sets
    // except via the all-zero tie, which term-asc ordering would expose
    assert(!out.exists(_._2 == "the"), s"boilerplate ranked: ${out.toSeq}")
    // doc 0: cat (tf=1, df=2 → ln2) and sat (tf=1, df=1 → ln4): sat first
    val d0 = byDoc(0L).sortBy(_._6)
    assert(d0.map(_._2).toSeq == Seq("sat", "cat"))
    assert(math.abs(d0(1)._5 - math.log(2.0)) < 1e-12)
  }

  test("ngrams emits ALL occurrences in order, unlike the distinct shingles") {
    val df = Seq("a b a b a", "x", "", null.asInstanceOf[String])
      .toDF("text")
    val out = df.select(TextOps.ngrams($"text", 2).as("g"))
      .collect().map(r => Option(r.getSeq[String](0)).map(_.toSeq))
    assert(out(0).get == Seq("a b", "b a", "a b", "b a"))
    assert(out(1).get == Seq())
    assert(out(2).get == Seq())
    assert(out(3).get == Seq()) // null text folds to empty like shingles
    // the distinct form would collapse the repeats — that is the difference
    val sh = df.limit(1)
      .select(graft.operators.Dedup.shingles($"text", 2).as("s"))
      .collect()(0).getSeq[String](0)
    assert(sh.toSeq == Seq("a b", "b a"))
  }

  test("top-n-gram repetition signal: frac/keep consistent, top gram is a real mode") {
    val q = SparkEntry.queries("t_repetition_topgram")
    val out = q(spark, sf001).filter($"n" === 2).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val frac = r.getAs[Double]("char_frac")
      assert(r.getAs[Boolean]("keep") == (frac <= 0.20))
    }
    // cross-check one doc against a driver-side recount of its bigrams
    val doc = Tables.documents(spark, sf001).orderBy($"doc_id").limit(1)
      .collect()(0)
    val words = doc.getAs[String]("text").split(" ")
    val counts = words.sliding(2).map(_.mkString(" ")).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    val best = counts.toSeq.map { case (g, c) => (-c, g) }.min
    val row = out.find(_.getAs[Long]("doc_id") == doc.getAs[Long]("doc_id")).get
    assert(row.getAs[String]("top_gram") == best._2)
    assert(row.getAs[Long]("top_cnt") == -best._1.toLong)
  }
}
