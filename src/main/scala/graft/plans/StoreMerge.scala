package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{Filter, InsertAction, LogicalPlan, MergeIntoTable, Project, SubqueryAlias, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.LongType

import graft.sources.CustomerStoreTable

/** SQL `MERGE INTO` for the graft-store catalog — the third row-level
  * SQL surface beside INSERT INTO (V1 write bridge) and DELETE FROM
  * (SupportsDelete). Spark's own v2 MERGE rewrite requires a
  * group-replacement (copy-on-write) `SupportsRowLevelOperations`
  * writer, which would bypass the store's commit protocol — its change
  * feed, stats manifests, and UNIQUE salvage live in
  * [[graft.pipeline.CustomerStoreApi.merge]]. So the engine instead
  * intercepts the analyzed [[MergeIntoTable]] in a post-hoc resolution
  * rule (the pre-row-level-ops pattern Delta Lake shipped MERGE with)
  * and routes the canonical email-keyed upsert shape to the SAME
  * `merge` the API path uses:
  *
  * {{{
  *   MERGE INTO graft_store.`path` t USING src s
  *   ON t.email = s.email
  *   WHEN MATCHED THEN UPDATE SET
  *     t.first_name = s.first_name, t.last_name = s.last_name,
  *     t.phone = s.phone
  *   WHEN NOT MATCHED THEN INSERT (id, first_name, last_name, email, phone)
  *     VALUES (s.id, s.first_name, s.last_name, s.email, s.phone)
  * }}}
  *
  * Exactly this shape — email equi-key, full payload update, 5-column
  * insert, no extra/conditional actions — because it is exactly the
  * store's merge CONTRACT (update payload + touch modified_ts keeping
  * id/uploaded/created_ts; identical matches untouched — the
  * idempotency refinement; unmatched rows insert unless their id
  * collides, reference UNIQUE-salvage semantics, csv-crm-upload
  * database/database.go:15-20), EXTENDED by the store's additive
  * schema evolution: both legs may additionally assign same-named
  * source copies of EVOLVED columns (the same set on both legs — a
  * per-leg difference is inexpressible through the store's one-batch
  * merge and is rejected rather than silently unified). With Spark's
  * `MERGE WITH SCHEMA EVOLUTION` keyword, the analyzer's own
  * ResolveMergeIntoSchemaEvolution first ADDs the missing source
  * columns through this catalog's `alterTable` (one schema commit,
  * the same path as `ALTER TABLE ADD COLUMN`), re-resolves, and the
  * merge then lands values into the just-evolved column. Any other
  * MERGE shape against a graft store fails ANALYSIS loudly rather
  * than silently bending those semantics. The command returns the
  * same counters as [[graft.pipeline.MergeResult]].
  */
case class MergeIntoStoreCommand(path: String, source: LogicalPlan,
    evolvedCols: Seq[String] = Nil)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("n_updated", LongType, nullable = false)(),
    AttributeReference("n_inserted", LongType, nullable = false)(),
    AttributeReference("n_unchanged", LongType, nullable = false)(),
    AttributeReference("n_conflicts", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.{functions => F}
    val cols = Seq("id", "first_name", "last_name", "email", "phone") ++
      evolvedCols
    val src = org.apache.spark.sql.graft.PlanDataFrame.ofRows(spark, source)
      .select(cols.map(F.col): _*)
    // Standard SQL MERGE (and Delta) raises when multiple source rows
    // would match one target row with CONFLICTING values — the API
    // merge's last-_seq-wins normalization would otherwise pick a
    // nondeterministic winner here, because a SQL source has no ingest
    // order. Payload-IDENTICAL duplicates are harmless and collapse —
    // identity includes any assigned evolved columns.
    val conflicted = src.groupBy(F.col("email"))
      .agg(F.countDistinct(F.struct(
        cols.filterNot(_ == "email").map(F.col): _*)).as("n"))
      .filter(F.col("n") > 1)
    if (conflicted.take(1).nonEmpty)
      throw new IllegalStateException(
        "graft-store MERGE: the source has multiple rows for the same " +
          "email with conflicting values — SQL MERGE requires at most one " +
          "source row per matched target row (deduplicate or pre-aggregate " +
          "the source)")
    // merge() takes a full-schema batch (the INSERT leg lands verbatim):
    // enrich exactly like the ingest path — uploaded=false, fresh
    // created_ts/modified_ts; the UPDATE leg keeps the STORED
    // uploaded/created_ts regardless, per the merge contract.
    // dropDuplicates is value-deterministic: survivors of the check
    // above are payload-identical.
    val batch = graft.pipeline.Ingest.enrich(src.dropDuplicates("email"))
    val r = new graft.pipeline.CustomerStore(spark, path).merge(batch)
    Seq(Row(r.nUpdated, r.nInserted, r.nUnchanged, r.nConflicts))
  }
}

/** Post-hoc resolution rule (registered by [[graft.GraftExtensions]]):
  * rewrites the supported MERGE shape over a graft-store relation into
  * [[MergeIntoStoreCommand]]. Shape checks match on RESOLVED
  * attributes (exprId membership in the target/source outputs), so
  * aliased columns or expressions that merely share a name are
  * rejected, not misread.
  */
object ResolveStoreMerge {
  private val BaseCols = Set("id", "email", "first_name", "last_name", "phone",
    "uploaded", "created_ts", "modified_ts")

  /** EVOLVED column names (lowercased) among a store relation's output:
    * beyond the base contract by PHYSICAL identity — a RENAMED base
    * column carries its original base name in the `physical` metadata
    * and is NOT evolved (assigning it rides the base-shape checks, or
    * fails them, exactly as before evolution existed).
    */
  private[plans] def evolvedColsOf(
      output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute]): Set[String] =
    output.filter { a =>
      !BaseCols(a.name.toLowerCase) &&
        (!a.metadata.contains("physical") ||
          !BaseCols(a.metadata.getString("physical")))
    }.map(_.name.toLowerCase).toSet
}

case class ResolveStoreMerge(session: SparkSession) extends Rule[LogicalPlan] {

  private val Payload = Set("first_name", "last_name", "phone")
  private val InsertCols = Set("id", "first_name", "last_name", "email", "phone")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case m: MergeIntoTable if m.resolved && storeOf(m.targetTable).isDefined =>
      toCommand(m)
    case u: UpdateTable if u.resolved && storeOf(u.table).isDefined =>
      toUpdateCommand(u)
  }

  /** SQL `UPDATE graft_store.\`path\` SET … WHERE …` — routed through
    * the SAME merge: the batch is the current snapshot filtered by the
    * WHERE clause with the SET expressions applied (arbitrary
    * expressions over the row are fine — this is a read + merge, not a
    * metadata delete, so nothing needs to be pushable), and merge's
    * matched leg updates payload + touches modified_ts. The three base
    * payload columns and any EVOLVED columns are assignable: the email
    * key, id, uploaded, and the timestamps are the store's to manage,
    * and an UPDATE that rewrote the merge key would be a delete+insert
    * in disguise.
    */
  private def toUpdateCommand(u: UpdateTable): LogicalPlan = {
    val table = storeOf(u.table).get
    def fail(what: String): Nothing =
      throw new UnsupportedOperationException(
        "graft-store UPDATE supports SET over first_name/last_name/phone " +
          s"and evolved columns, with an optional WHERE: $what")
    if (table.versionAsOf.nonEmpty || table.timestampAsOf.nonEmpty)
      fail("a time-travel table is read-only")
    val evolved = ResolveStoreMerge.evolvedColsOf(u.table.output)
    val targetIds = u.table.output.map(_.exprId).toSet
    val byName: Map[String, org.apache.spark.sql.catalyst.expressions.Expression] =
      u.assignments.map { a =>
        a.key match {
          case ar: AttributeReference
            if targetIds.contains(ar.exprId) &&
               (Payload.contains(ar.name.toLowerCase) ||
                 evolved.contains(ar.name.toLowerCase)) =>
            ar.name.toLowerCase -> a.value
          case other => fail(s"cannot assign $other")
        }
      }.toMap
    if (byName.isEmpty) fail("no payload assignment")
    if (byName.size != u.assignments.length) fail("duplicate assignment")
    val proj = u.table.output.map { a =>
      byName.get(a.name.toLowerCase)
        .map(v => Alias(v, a.name)()).getOrElse(a)
    }
    val child = u.condition.map(Filter(_, u.table)).getOrElse(u.table)
    // Only ASSIGNED evolved columns ride the merge batch: an
    // unassigned evolved column is then batch-absent, so the merge
    // carries its stored value (never nulls it out).
    MergeIntoStoreCommand(table.path, Project(proj, child),
      (byName.keySet & evolved).toSeq.sorted)
  }

  private def unwrap(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, child) => unwrap(child)
    case other => other
  }

  private def storeOf(p: LogicalPlan): Option[CustomerStoreTable] =
    unwrap(p) match {
      case r: DataSourceV2Relation => r.table match {
        case t: CustomerStoreTable => Some(t)
        case _ => None
      }
      case _ => None
    }

  private def toCommand(m: MergeIntoTable): LogicalPlan = {
    val table = storeOf(m.targetTable).get
    def fail(what: String): Nothing =
      throw new UnsupportedOperationException(
        "graft-store MERGE supports exactly the email-keyed upsert shape " +
          "(ON t.email = s.email; WHEN MATCHED UPDATE SET first_name/" +
          "last_name/phone; WHEN NOT MATCHED INSERT the 5 base columns; " +
          "both legs may additionally assign the SAME set of evolved " +
          s"columns as same-named source copies): $what")
    if (table.versionAsOf.nonEmpty || table.timestampAsOf.nonEmpty)
      fail("a time-travel table is read-only")
    // m.schemaEvolutionEnabled needs no handling here: by post-hoc
    // resolution time the analyzer's ResolveMergeIntoSchemaEvolution
    // has already ADDed the missing source columns through the
    // catalog's alterTable and re-resolved the merge against the
    // evolved target — the assignments below simply see the new
    // columns as (resolved) evolved-column copies.
    if (m.notMatchedBySourceActions.nonEmpty)
      fail("WHEN NOT MATCHED BY SOURCE is not supported")
    // Columns beyond the base contract (additive evolution), by their
    // CURRENT logical names — assignable on both legs.
    val evolved = ResolveStoreMerge.evolvedColsOf(m.targetTable.output)

    val targetIds = m.targetTable.output.map(_.exprId).toSet
    val sourceIds = m.sourceTable.output.map(_.exprId).toSet
    def asTarget(e: Expression): Option[String] = e match {
      case a: AttributeReference if targetIds.contains(a.exprId) => Some(a.name.toLowerCase)
      case _ => None
    }
    // Assignment alignment wraps source values in value-preserving
    // shells (AssertNotNull for non-nullable target columns, Alias);
    // strip those — but NOT Cast, a type change is not a column copy.
    def strip(e: Expression): Expression = e match {
      case org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull(c, _) =>
        strip(c)
      case a: org.apache.spark.sql.catalyst.expressions.Alias => strip(a.child)
      case other => other
    }
    def asSource(e: Expression): Option[String] = strip(e) match {
      case a: AttributeReference if sourceIds.contains(a.exprId) => Some(a.name.toLowerCase)
      case _ => None
    }

    m.mergeCondition match {
      case EqualTo(l, r)
        if (asTarget(l).contains("email") && asSource(r).contains("email")) ||
           (asTarget(r).contains("email") && asSource(l).contains("email")) => ()
      case other => fail(s"unsupported ON condition $other")
    }

    // Each assignment must be target-column = same-named source column;
    // the required base set must be covered exactly, and anything
    // beyond it must be an evolved column. Returns the evolved names
    // the leg assigns.
    def sameNamePairs(as: Seq[org.apache.spark.sql.catalyst.plans.logical.Assignment],
        expect: Set[String], what: String): Set[String] = {
      val names = as.map { a =>
        (asTarget(a.key), asSource(a.value)) match {
          case (Some(k), Some(v)) if k == v => k
          case _ => fail(s"$what assignment ${a.key} = ${a.value} is not " +
            "a same-named target-from-source column copy")
        }
      }
      if (names.length != names.toSet.size) fail(s"$what assigns a column twice")
      val extra = names.toSet -- expect
      if (!expect.subsetOf(names.toSet) || !extra.subsetOf(evolved))
        fail(s"$what must assign exactly ${expect.toSeq.sorted.mkString(", ")}" +
          (if (evolved.nonEmpty)
             s" plus optionally evolved columns ${evolved.toSeq.sorted.mkString(", ")}"
           else ""))
      extra
    }

    val updExtra = m.matchedActions match {
      case Seq(UpdateAction(None, as, _)) => sameNamePairs(as, Payload, "UPDATE")
      case other => fail(s"unsupported WHEN MATCHED actions $other")
    }
    val insExtra = m.notMatchedActions match {
      case Seq(InsertAction(None, as)) => sameNamePairs(as, InsertCols, "INSERT")
      case other => fail(s"unsupported WHEN NOT MATCHED actions $other")
    }
    if (updExtra != insExtra)
      fail("the evolved columns assigned by UPDATE and INSERT must be the " +
        s"same set (UPDATE: ${updExtra.toSeq.sorted.mkString(", ")}; " +
        s"INSERT: ${insExtra.toSeq.sorted.mkString(", ")}) — the store's " +
        "one-batch merge applies a carried column to both legs")

    MergeIntoStoreCommand(table.path, m.sourceTable, updExtra.toSeq.sorted)
  }
}
