package graft.format

import graft.TestSpark
import graft.jobs.AppendJob
import graft.synth.DataGen
import org.scalatest.funsuite.AnyFunSuite

/** Persistent catalog ([[Catalog]]): name -> table-root pointer files
  * under one directory, first-writer-wins registration through the
  * commit protocol's conditional PUT, resolution across sessions. */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("register / resolve / list / unregister lifecycle") {
    val cat = TestSpark.tmpDir("cat1")
    val root = TestSpark.tmpDir("cat1-tbl")
    val t = QTable.create(root, spark, 2)
    AppendJob.append(t, DataGen.generate(spark, 20, 1L, 1).toDF())

    Catalog.register(cat, "imgs", root, spark)
    assert(Catalog.resolve(cat, "imgs", spark).contains(root))
    assert(Catalog.list(cat, spark) == Seq("imgs" -> root))
    // idempotent re-register of the SAME mapping is fine (crash-replay)
    Catalog.register(cat, "imgs", root, spark)
    // re-pointing an existing name refuses — unregister first, explicitly
    intercept[IllegalArgumentException] {
      Catalog.register(cat, "imgs", TestSpark.tmpDir("cat1-other"), spark) }
    assert(Catalog.unregister(cat, "imgs", spark))
    assert(Catalog.resolve(cat, "imgs", spark).isEmpty)
    assert(!Catalog.unregister(cat, "imgs", spark), "double drop = false")
  }

  test("two sessions resolve the same name; SQL views address by name") {
    val cat = TestSpark.tmpDir("cat2")
    val root = TestSpark.tmpDir("cat2-tbl")
    val t = QTable.create(root, spark, 2)
    AppendJob.append(t, DataGen.generate(spark, 30, 2L, 1).toDF())
    Catalog.register(cat, "shared", root, spark)

    // a SECOND session (own conf/state) pointed at the same catalog dir
    val s2 = spark.newSession()
    s2.conf.set(Catalog.ConfKey, cat)
    assert(Catalog.rootFor(s2).contains(cat))
    assert(Catalog.resolveTableArg(s2, "shared") == root)
    assert(QTable(Catalog.resolveTableArg(s2, "shared"), s2).read().count() == 30)

    // SQL: USING qtable OPTIONS (name ...) through the session's catalog
    s2.sql("CREATE OR REPLACE TEMPORARY VIEW catv USING qtable OPTIONS (name 'shared')")
    assert(s2.sql("SELECT count(*) FROM catv").head().getLong(0) == 30)
    // unknown name fails with the catalog named, not a silent empty view
    val e = intercept[Exception] {
      s2.sql("CREATE OR REPLACE TEMPORARY VIEW nopev USING qtable OPTIONS (name 'nope')")
        .collect() }
    assert(e.getMessage.contains("nope"))
  }

  test("path addressing is unchanged; bare-name typo fails loudly") {
    val cat = TestSpark.tmpDir("cat3")
    val root = TestSpark.tmpDir("cat3-tbl")
    QTable.create(root, spark, 2)
    val s2 = spark.newSession()
    s2.conf.set(Catalog.ConfKey, cat)
    // anything with a separator is a path, even with a catalog set
    assert(Catalog.resolveTableArg(s2, root) == root)
    // a bare name that resolves nowhere must fail, not become a
    // relative path in the working directory
    intercept[IllegalArgumentException] {
      Catalog.resolveTableArg(s2, "typo") }
    // with NO catalog configured, bare values stay paths (pre-catalog)
    val s3 = spark.newSession()
    s3.conf.unset(Catalog.ConfKey)
    if (sys.env.get(Catalog.EnvKey).isEmpty)
      assert(Catalog.resolveTableArg(s3, "bare") == "bare")
  }

  test("racing registrations: exactly one winner (conditional PUT)") {
    val cat = TestSpark.tmpDir("cat4")
    val roots = (0 until 8).map(i => TestSpark.tmpDir(s"cat4-t$i"))
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val results = Await.result(Future.sequence(roots.map(r => Future {
      try { Catalog.register(cat, "raced", r, spark); Some(r) }
      catch { case _: IllegalArgumentException => None }
    })), 30.seconds)
    pool.shutdown()
    val winners = results.flatten
    assert(winners.size == 1, s"expected one winner, got ${winners.size}")
    assert(Catalog.resolve(cat, "raced", spark).contains(winners.head))
  }

  test("CALL qtable.register/tables/unregister close the SQL surface") {
    val cat = TestSpark.tmpDir("cat6")
    val root = TestSpark.tmpDir("cat6-tbl")
    val t = QTable.create(root, spark, 2)
    AppendJob.append(t, DataGen.generate(spark, 25, 6L, 1).toDF())
    def call(sql: String) = spark.sql(sql).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    call(s"CALL qtable.register(catalog => '$cat', name => 'sqlimgs', " +
      s"table => '$root')")
    assert(call(s"CALL qtable.tables(catalog => '$cat')") ==
      Map("sqlimgs" -> root))
    // a maintenance CALL resolves the bare name through the same catalog
    val s2 = spark.newSession()
    s2.conf.set(Catalog.ConfKey, cat)
    val a = s2.sql("CALL qtable.analyze(table => 'sqlimgs')").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(a("files").toInt > 0)
    call(s"CALL qtable.unregister(catalog => '$cat', name => 'sqlimgs')")
    assert(call(s"CALL qtable.tables(catalog => '$cat')").isEmpty)
  }

  test("invalid names refuse") {
    val cat = TestSpark.tmpDir("cat5")
    intercept[IllegalArgumentException] {
      Catalog.register(cat, "../escape", "/tmp/x", spark) }
    intercept[IllegalArgumentException] {
      Catalog.register(cat, "a/b", "/tmp/x", spark) }
  }
}
