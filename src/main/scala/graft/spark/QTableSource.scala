package graft.spark

import graft.format.{QTable, Tags}
import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider}

/** The idiomatic Spark read surface for qtables:
  *
  * {{{
  *   spark.read.format("qtable").load("/path/to/table")               // head
  *   spark.read.format("qtable").option("version", 7).load(path)      // time travel
  *   spark.read.format("qtable").option("tag", "release-1").load(path)
  *   // and in SQL:
  *   CREATE TEMPORARY VIEW imgs USING qtable OPTIONS (path '...', tag 'release-1')
  * }}}
  *
  * Resolves to the same manifest-backed stats-skipping relation as
  * [[QTable.readIndexed]] — predicate pushdown, bloom-tested id
  * equality, column pruning, and whole-stage codegen all apply, and
  * listing never touches the filesystem. The snapshot is resolved ONCE
  * at relation creation, so a registered view is snapshot-isolated like
  * any other reader.
  *
  * Limitation (documented, fail-fast): a table with RENAMED columns
  * needs the physical->logical aliasing projection that only the
  * `QTable.read`/`readIndexed` API attaches — a `RelationProvider` has
  * no hook above its relation. Renames are rare (added-column renames
  * only; base columns never rename); such tables read through the
  * library API.
  */
class QTableSource extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "qtable"

  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("qtable source requires a path"))
    val t = QTable(path, ctx.sparkSession)
    require(!(parameters.contains("version") && parameters.contains("tag")),
      "pass either version or tag, not both")
    val snap = parameters.get("tag") match {
      case Some(tag) => t.snapshotAt(Tags.ref(t, tag).version)
      case None => parameters.get("version") match {
        case Some(v) => t.snapshotAt(v.toLong)
        case None => t.currentSnapshot
      }
    }
    require(!snap.hasRenames,
      "this table has renamed columns; read it via QTable.read/readIndexed " +
        "(the DataSource relation cannot attach the aliasing projection)")
    t.relationFor(snap)._1
  }
}
