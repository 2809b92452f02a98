package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BottomK, JaroWinkler, MinHashSignature, SimHash64, SortedJaccard, SortedOverlap, VecDot, VecSum}

/** Session extension registering graft's native expressions as SQL
  * functions, so `spark.sql("SELECT vec_dot(a, b) ...")` works next to
  * the Column API. Install with:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // programmatic, or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * Also injects the SURVEY.md §4.3 similarity-join rewrites:
  * [[graft.plans.JaccardPrefilterRule]] (Jaccard-threshold filters gain
  * a size-ratio prefilter conjunct) and
  * [[graft.plans.CosineBandRule]] (cosine-threshold inner joins gain a
  * projection-band equi-join key with ±1 probes — bucket-then-verify as
  * a plan rewrite), and [[graft.plans.LevenshteinPrefilterRule]]
  * (edit-distance-threshold predicates gain a length-gap prefilter
  * conjunct).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.JaccardPrefilterRule)
    ext.injectOptimizerRule(_ => graft.plans.CosineBandRule)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinPrefilterRule)
    ext.injectOptimizerRule(_ => graft.plans.TopKRewriteRule)
    ext.injectOptimizerRule(_ => graft.plans.BandJoinRule)
    ext.injectOptimizerRule(_ => graft.plans.AsOfRewriteRule)
    // distributed MoR key deletes: large sidecars rewrite the catalog
    // scan into a LEFT ANTI JOIN instead of a driver-collected key set
    ext.injectOptimizerRule(_ => graft.plans.CowMorAntiJoinRule)
    // Whole-operator tier: plans the custom AsOfMergeJoin logical node
    // to its merge exec (SURVEY §4.3 preference (c)).
    ext.injectPlannerStrategy(_ => graft.plans.AsOfMergeStrategy)
    // MERGE INTO on CowCatalog tables: the resolution rule lowers the
    // analyzed MergeIntoTable onto the format's transactional API and
    // the strategy plans the command exec (see CowMergeIntoRule).
    ext.injectResolutionRule(_ => graft.plans.CowMergeIntoRule)
    // UPDATE ... SET on CowCatalog tables: same seam, same strategy
    // (see CowUpdateRule — touched-file rewrite, analysis-time grammar).
    ext.injectResolutionRule(_ => graft.plans.CowUpdateRule)
    ext.injectPlannerStrategy(_ => graft.plans.CowMergeStrategy)
    // Table-valued SQL face for the CowTable format: time travel from
    // plain SQL — `SELECT * FROM cow_snapshot('/path'[, version])`.
    // Args must be literals (the plan is built at analysis time).
    ext.injectTableFunction((
      FunctionIdentifier("cow_snapshot"),
      info("cow_snapshot",
        "cow_snapshot(path[, version]) - read a graft CowTable snapshot (time travel)"),
      (es: Seq[Expression]) => {
        def litOf(e: Expression): Any = {
          if (!e.foldable)
            throw new IllegalArgumentException(
              "cow_snapshot arguments must be literals")
          e.eval()
        }
        val path = litOf(es.head).toString
        val asOf = es.drop(1).headOption.map(e => litOf(e).toString.toInt)
        val spark = org.apache.spark.sql.SparkSession.active
        graft.sinks.CowTable.read(spark, path, asOf).queryExecution.analyzed
      }))
    // The change feed as SQL (CDC-out): row-level insert/update/delete
    // between two snapshots — `SELECT * FROM cow_changes('/p', 'id', 1, 3)`.
    ext.injectTableFunction((
      FunctionIdentifier("cow_changes"),
      info("cow_changes",
        "cow_changes(path, key, fromVersion, toVersion) - CowTable change feed " +
          "(_change_type in insert/update/delete, delete rows carry preimages)"),
      (es: Seq[Expression]) => {
        def litOf(e: Expression): Any = {
          if (!e.foldable)
            throw new IllegalArgumentException(
              "cow_changes arguments must be literals")
          e.eval()
        }
        require(es.sizeIs == 4,
          "cow_changes(path, key, fromVersion, toVersion) takes exactly 4 arguments")
        val spark = org.apache.spark.sql.SparkSession.active
        graft.sinks.CowTable.changes(spark,
            litOf(es(0)).toString, litOf(es(1)).toString,
            litOf(es(2)).toString.toInt, litOf(es(3)).toString.toInt)
          .queryExecution.analyzed
      }))
    // The merge-on-read delete ledger as SQL: the keys a snapshot's
    // sidecars delete — `SELECT * FROM cow_deletes('/p'[, version])`
    // (empty result when the snapshot carries no sidecars).
    ext.injectTableFunction((
      FunctionIdentifier("cow_deletes"),
      info("cow_deletes",
        "cow_deletes(path[, version]) - the snapshot's merge-on-read deleted keys"),
      (es: Seq[Expression]) => {
        def litOf(e: Expression): Any = {
          if (!e.foldable)
            throw new IllegalArgumentException(
              "cow_deletes arguments must be literals")
          e.eval()
        }
        val path = litOf(es.head).toString
        val asOf = es.drop(1).headOption.map(e => litOf(e).toString.toInt)
        val spark = org.apache.spark.sql.SparkSession.active
        val dels = graft.sinks.CowTable.snapshotDeletes(path, asOf)
        val df =
          if (dels.nonEmpty) spark.read.parquet(dels: _*).distinct()
          else {
            // empty ledger: surface the table's key schema-lessly as a
            // 0-row single-column frame (key name unknown without a
            // sidecar to read it from)
            import spark.implicits._
            Seq.empty[String].toDF("key")
          }
        df.queryExecution.analyzed
      }))
    // Metadata tables (the Iceberg `files` / `history` shapes):
    // `SELECT * FROM cow_files('/p'[, version])` — per-file kind+size;
    // `SELECT * FROM cow_history('/p')` — per-retained-version census.
    ext.injectTableFunction((
      FunctionIdentifier("cow_files"),
      info("cow_files",
        "cow_files(path[, version]) - files a CowTable snapshot references (kind, size)"),
      (es: Seq[Expression]) => {
        def litOf(e: Expression): Any = {
          if (!e.foldable)
            throw new IllegalArgumentException(
              "cow_files arguments must be literals")
          e.eval()
        }
        val path = litOf(es.head).toString
        val asOf = es.drop(1).headOption.map(e => litOf(e).toString.toInt)
        val spark = org.apache.spark.sql.SparkSession.active
        graft.sinks.CowTable.filesMeta(spark, path, asOf).queryExecution.analyzed
      }))
    // Per-file column statistics (round 12): what the manifest records
    // for file skipping — `SELECT * FROM cow_stats('/p'[, version])`.
    ext.injectTableFunction((
      FunctionIdentifier("cow_stats"),
      info("cow_stats",
        "cow_stats(path[, version]) - per-(file, column) min/max/nonNullCount the manifest records"),
      (es: Seq[Expression]) => {
        def litOf(e: Expression): Any = {
          if (!e.foldable)
            throw new IllegalArgumentException(
              "cow_stats arguments must be literals")
          e.eval()
        }
        val path = litOf(es.head).toString
        val asOf = es.drop(1).headOption.map(e => litOf(e).toString.toInt)
        val spark = org.apache.spark.sql.SparkSession.active
        graft.sinks.CowTable.statsMeta(spark, path, asOf).queryExecution.analyzed
      }))
    // Per-file key lookup sidecars (round 13): which files carry an
    // exact dictionary vs a bloom for the declared lookup columns —
    // `SELECT * FROM cow_lookups('/p'[, version])`.
    ext.injectTableFunction((
      FunctionIdentifier("cow_lookups"),
      info("cow_lookups",
        "cow_lookups(path[, version]) - per-(file, column) lookup sidecar kind (dict|bloom) + NDV/bits"),
      (es: Seq[Expression]) => {
        def litOf(e: Expression): Any = {
          if (!e.foldable)
            throw new IllegalArgumentException(
              "cow_lookups arguments must be literals")
          e.eval()
        }
        val path = litOf(es.head).toString
        val asOf = es.drop(1).headOption.map(e => litOf(e).toString.toInt)
        val spark = org.apache.spark.sql.SparkSession.active
        graft.sinks.CowTable.lookupsMeta(spark, path, asOf).queryExecution.analyzed
      }))
    ext.injectTableFunction((
      FunctionIdentifier("cow_history"),
      info("cow_history",
        "cow_history(path) - per-retained-snapshot file/sidecar/spec census"),
      (es: Seq[Expression]) => {
        def litOf(e: Expression): Any = {
          if (!e.foldable)
            throw new IllegalArgumentException(
              "cow_history arguments must be literals")
          e.eval()
        }
        val spark = org.apache.spark.sql.SparkSession.active
        graft.sinks.CowTable.history(spark, litOf(es.head).toString)
          .queryExecution.analyzed
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two float/double arrays in double precision"),
      (es: Seq[Expression]) => VecDot(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity of two float/double arrays"),
      (es: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
        Divide(VecDot(es(0), es(1)),
               Multiply(Sqrt(VecDot(es(0), es(0))), Sqrt(VecDot(es(1), es(1)))))
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_sum"),
      info("vec_sum", "vec_sum(a) - element sum of a float/double array in double precision"),
      (es: Seq[Expression]) => VecSum(es.head)))
    ext.injectFunction((
      FunctionIdentifier("sorted_jaccard"),
      info("sorted_jaccard", "sorted_jaccard(a, b) - Jaccard similarity of two sorted-distinct string arrays"),
      (es: Seq[Expression]) => SortedJaccard(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("sorted_overlap"),
      info("sorted_overlap", "sorted_overlap(a, b) - intersection count of two sorted-distinct string arrays"),
      (es: Seq[Expression]) => SortedOverlap(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash"),
      info("minhash", "minhash(tokens[, k]) - k-long MinHash signature of a token array (default k=128)"),
      (es: Seq[Expression]) => es match {
        case Seq(t) => MinHashSignature(t, 128)
        case Seq(t, k) => MinHashSignature(t, literalInt(k, "minhash", "k"))
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash"),
      info("simhash", "simhash(tokens) - 64-bit SimHash of a token array"),
      (es: Seq[Expression]) => SimHash64(es.head)))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler", "jaro_winkler(a, b) - Jaro-Winkler similarity in [0,1] " +
        "(standard parameters: window max/2-1, prefix boost 0.1 up to 4 chars, " +
        "boost only above jaro 0.7)"),
      (es: Seq[Expression]) => JaroWinkler(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("bottom_k"),
      info("bottom_k", "bottom_k(sort_struct, k) - aggregate: the k smallest structs " +
        "(field-by-field ascending), as an ascending array; mergeable bounded heap " +
        "(map-side partials carry <= k rows per group)"),
      (es: Seq[Expression]) => BottomK(es(0),
        literalInt(es(1), "bottom_k", "k")).toAggregateExpression()))
  }

  /** Fold a function argument that must be a literal integer, with a
    * clear analysis-time error instead of the opaque CCE/NPE a
    * non-foldable or non-integral expression would otherwise surface.
    */
  private def literalInt(e: Expression, fn: String, arg: String): Int = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integral = e.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _                                             => false
    }
    val ok = e.foldable && integral
    if (!ok) throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got ${e.sql}")
    e.eval().asInstanceOf[Number].intValue()
  }
}
