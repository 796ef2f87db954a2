package graft.spark

import graft.format.{QTable, QTableFileIndex}
import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement, LogicalPlan, SubqueryAlias, UpdateTable, View}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.col

/** Session extensions for the qtable DataSource:
  *
  * {{{
  *   spark-sql --conf spark.sql.extensions=graft.spark.QTableExtensions ...
  *   CREATE TEMPORARY VIEW imgs USING qtable OPTIONS (path '/t');
  *   INSERT INTO imgs SELECT ...;        -- a real commit-protocol append
  *   DELETE FROM imgs WHERE fmt = 'bmp'; -- metadata drops + MOR deletes
  * }}}
  *
  * Without these rules, SQL `INSERT INTO` against a qtable relation
  * would fall through to Spark's generic
  * `InsertIntoHadoopFsRelationCommand`, which writes raw parquet under
  * the relation's rootPaths — bypassing manifests, stats harvest and
  * the atomic version claim entirely (the qtable FileIndex synthesizes
  * rootPaths from manifest entries, so that fallback fails on the
  * filesystem rather than corrupting) — and `DELETE FROM` would be
  * rejected outright (Spark supports it only for DSv2 tables). The
  * rules reroute both through the engine's jobs —
  * the custom-`Rule[LogicalPlan]` integration point
  * `SparkSessionExtensions` exists for.
  *
  * Only relations created by [[QTableSource]] at the CURRENT MAIN HEAD
  * carry [[QTableFileIndex.insertRoot]]; a time-traveled or branch view
  * never matches (the rule skipping = the safe failure mode).
  */
class QTableExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectResolutionRule(s => new ResolveQTableInsert(s))
    e.injectResolutionRule(s => new ResolveQTableDelete(s))
    e.injectResolutionRule(s => new ResolveQTableUpdate(s))
  }
}

/** Rewrites `UPDATE <qtable view> SET c = e, ... [WHERE <cond>]` into
  * the engine's [[graft.jobs.UpdateJob]] (copy-on-write: only files
  * holding matched rows rewrite; the CLI `update --set/--where`
  * semantics from SQL). Assignments and condition travel as SQL text
  * for the same replanning reason as the DELETE rule; only top-level
  * columns are assignable (nested-field SET has no engine analogue —
  * the schema is flat). */
class ResolveQTableUpdate(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case u @ UpdateTable(tbl, assignments, cond)
        if assignments.forall(_.resolved) && cond.forall(_.resolved) =>
      QTableExtensions.unwrap(tbl) match {
        case LogicalRelation(h: HadoopFsRelation, _, _, _, _)
            if QTableExtensions.dmlRoot(h).isDefined =>
          def strip(e: org.apache.spark.sql.catalyst.expressions.Expression) =
            e.transform {
              case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
                a.withQualifier(Nil)
            }
          val sets = assignments.map { a =>
            val name = a.key match {
              case ar: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
                ar.name
              case other => throw new IllegalArgumentException(
                s"only top-level columns can be assigned: ${other.sql}")
            }
            name -> strip(a.value).sql
          }
          UpdateQTableCommand(QTableExtensions.dmlRoot(h).get, sets,
            cond.map(c => strip(c).sql))
        case _ => u
      }
  }
}

/** The rerouted UPDATE — one commit through UpdateJob (stats-pruned
  * matched-file discovery, copy-on-write rewrite of only those). */
case class UpdateQTableCommand(root: String, sets: Seq[(String, String)],
    condSql: Option[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{expr, lit}
    val t = QTable(root, spark)
    graft.jobs.CommitRetry.withCommitRetry()(
      new graft.jobs.UpdateJob(t).run(
        sets.map { case (c, s) => c -> expr(s) },
        condSql.map(expr).getOrElse(lit(true))))
    Seq.empty
  }
}

/** Rewrites `DELETE FROM <qtable view> WHERE <cond>` into the engine's
  * [[graft.jobs.DeleteJob]]: stats-provable whole files drop at
  * METADATA level, surviving rows position-delete (merge-on-read) —
  * the exact CLI `delete --where` semantics, now reachable from SQL.
  * The condition is carried as its SQL text (the command replans it
  * against the table's own scan, exactly like the CLI path — resolved
  * attribute ids from the view's plan would not survive the re-plan). */
class ResolveQTableDelete(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case d @ DeleteFromTable(tbl, cond) if cond.resolved =>
      QTableExtensions.unwrap(tbl) match {
        case LogicalRelation(h: HadoopFsRelation, _, _, _, _)
            if QTableExtensions.dmlRoot(h).isDefined =>
          // Strip view qualifiers: the command replans the condition
          // against the table's own scan, where `viewname.col` would
          // not resolve — only the bare column names carry over.
          val bare = cond.transform {
            case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
              a.withQualifier(Nil)
          }
          DeleteFromQTableCommand(QTableExtensions.dmlRoot(h).get, bare.sql)
        case _ => d
      }
  }
}

/** The rerouted DELETE — one commit through DeleteJob (metadata-level
  * file drops where stats prove them, position deletes elsewhere). */
case class DeleteFromQTableCommand(root: String, condSql: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val t = QTable(root, spark)
    graft.jobs.CommitRetry.withCommitRetry()(
      new graft.jobs.DeleteJob(t).run(org.apache.spark.sql.functions.expr(condSql)))
    Seq.empty
  }
}

object QTableExtensions {
  private[spark] def unwrap(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, c) => unwrap(c)
    case v: View => unwrap(v.child)
    case other => other
  }

  /** The table root a DML statement over this relation may write to —
    * present only on head-of-main relations ([[QTableFileIndex.insertRoot]]). */
  private[spark] def dmlRoot(h: HadoopFsRelation): Option[String] =
    h.location match {
      case q: QTableFileIndex => q.insertRoot
      case _ => None
    }
}

/** Rewrites `InsertIntoStatement` over an insertable qtable relation
  * into [[AppendToQTableCommand]]. Column handling (the work Spark's
  * `PreprocessTableInsertion` would otherwise do): by-position against
  * the relation schema — with or without the derived `pbucket` column,
  * which the append recomputes from the key regardless — or by name
  * when the statement carries an explicit column list or `BY NAME`. */
class ResolveQTableInsert(spark: SparkSession) extends Rule[LogicalPlan] {

  import QTableExtensions.unwrap

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case i: InsertIntoStatement if i.query.resolved =>
      unwrap(i.table) match {
        case LogicalRelation(h: HadoopFsRelation, _, _, _, _)
            if h.location.isInstanceOf[QTableFileIndex] &&
              h.location.asInstanceOf[QTableFileIndex].insertRoot.isDefined =>
          val root = h.location.asInstanceOf[QTableFileIndex].insertRoot.get
          require(!i.overwrite,
            "qtable is append-only through SQL INSERT: use the MERGE/" +
              "DELETE/upsert jobs for row changes (INSERT OVERWRITE " +
              "would discard snapshot history)")
          require(i.partitionSpec.isEmpty,
            "qtable derives its bucket partition from the key; " +
              "PARTITION clauses are not supported")
          val relCols = h.schema.fieldNames.toSeq
          // an explicit column list names TARGETS for the query's
          // positional outputs; only `BY NAME` trusts the query's names
          val byName = i.byName
          val inNames: Seq[String] =
            if (i.userSpecifiedCols.nonEmpty) i.userSpecifiedCols
            else if (i.byName) i.query.output.map(_.name)
            else {
              val sansBucket = relCols.filterNot(_ == "pbucket")
              val n = i.query.output.length
              if (n == relCols.length) relCols
              else if (n == sansBucket.length) sansBucket
              else throw new IllegalArgumentException(
                s"INSERT arity $n does not match qtable columns " +
                  s"${sansBucket.mkString(", ")} (pbucket optional)")
            }
          AppendToQTableCommand(root, inNames, byName, i.query)
        case _ => i
      }
  }
}

/** The rerouted insert: aligns the query's output to the table's
  * declared column types (logical names; the DataSource already refuses
  * renamed tables) and appends through the commit protocol — stats
  * harvest, fresh manifests, optimistic version claim, commit retry —
  * exactly like the library/CLI append path. */
case class AppendToQTableCommand(
    root: String,
    inNames: Seq[String],
    byName: Boolean,
    query: LogicalPlan) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    val t = QTable(root, spark)
    val types = t.currentSnapshot.schemaFields.map(f => f.name -> f.sparkType).toMap
    val need = (t.currentSnapshot.schemaFields.map(_.name).toSet - "pbucket")
    val given = inNames.filterNot(_ == "pbucket")
    require(given.toSet == need, s"INSERT columns ${given.mkString(", ")} " +
      s"must cover the table columns ${need.mkString(", ")} exactly " +
      "(qtable columns are non-nullable; partial inserts have no defaults)")
    val df0 = org.apache.spark.sql.GraftBridge.ofRows(spark, query)
    // by position: rename the query's output to the target names first;
    // by name: the query's columns already carry the right names
    val named = if (byName) df0 else df0.toDF(inNames: _*)
    val aligned = named.select(given.map(n => col(n).cast(types(n)).as(n)): _*)
    graft.jobs.CommitRetry.withCommitRetry()(
      graft.jobs.AppendJob.append(t, aligned))
    Seq.empty
  }
}
