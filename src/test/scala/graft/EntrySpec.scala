package graft

import scala.jdk.CollectionConverters._

/** Driver-contract invariants (SURVEY.md §5.2#1). */
class EntrySpec extends SparkSpec {

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("query names are unique across packs") {
    val packs = Seq(
      graft.queries.RelationalQueries, graft.queries.EventQueries,
      graft.queries.VectorQueries, graft.queries.TextQueries)
    val names = packs.flatMap(_.all.map(_.name))
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: $dups")
  }

  test("every query runs at sf0.001 and yields a schema with stable column names") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf001)
      val cols = df.columns
      assert(cols.nonEmpty, s"$name has no columns")
      assert(cols.distinct.length == cols.length, s"$name has duplicate columns")
      // no auto-generated aggregate names may leak (oracle compare sorts by name)
      assert(!cols.exists(c => c.contains("(") || c.contains(")")),
        s"$name leaks unaliased column: ${cols.mkString(",")}")
    }
  }

  test("SessionMemo builds once per (session, key) and isolates keys") {
    var builds = 0
    def build(): Object = { builds += 1; new Object }
    val a = SessionMemo.getOrElseUpdate(spark, "entry_spec_memo_a")(build())(_ => ())
    val a2 = SessionMemo.getOrElseUpdate(spark, "entry_spec_memo_a")(build())(_ => ())
    assert(a eq a2, "same (session, key) rebuilt")
    assert(builds == 1)
    val b = SessionMemo.getOrElseUpdate(spark, "entry_spec_memo_b")(build())(_ => ())
    assert(builds == 2 && !(a eq b), "keys not isolated")
  }

  test("SessionMemo: concurrent first callers run exactly one build, share one artifact") {
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val released = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Object]()
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        gate.await()
        results.add(SessionMemo.getOrElseUpdate(spark, "entry_spec_memo_race") {
          builds.incrementAndGet(); new Object
        }(_ => released.incrementAndGet()))
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join())
    assert(builds.get == 1, s"${builds.get} builds ran for one (session, key)")
    assert(results.size == 8 && results.asScala.toSet.size == 1,
      "racing callers saw different artifacts")
    assert(released.get == 0, "a live entry's release hook ran")
  }
}
