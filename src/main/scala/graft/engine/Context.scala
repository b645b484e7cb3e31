package graft.engine

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnresolvedWith}
import org.apache.spark.sql.types.StructType

/** Session/catalog front door — the Spark-native analog of the reference's
  * `SessionContext` (ref: src/execution/context.rs:26-102).
  *
  * The reference keeps a `HashMap<String, ListingTable>` catalog, validates
  * every table referenced by a SQL statement against it before planning
  * (ref: src/execution/context.rs:87-102, src/sql/visitor.rs:33-51), and
  * exposes `read_csv` / `register_csv` / `sql`. Here the same surface is a
  * thin layer over `SparkSession`: tables register as temp views (so both
  * the DataFrame API and `spark.sql` see them), and `sql()` re-implements
  * the reference's catalog-validation pass by collecting
  * `UnresolvedRelation`s from the parsed-but-unresolved Catalyst plan.
  *
  * Everything downstream (optimization, pushdown, shuffle planning) is left
  * to Catalyst — see SURVEY.md §4 for why no custom rules are needed for
  * reference parity.
  */
class Context(val spark: SparkSession) {

  /** Names registered through THIS context (mirrors the reference's local
    * catalog; Spark's own catalog may hold more). */
  private val registered = mutable.LinkedHashSet.empty[String]

  /** Register an existing DataFrame as a named table. */
  def register(name: String, df: DataFrame): Unit = {
    df.createOrReplaceTempView(name)
    registered += name.toLowerCase
  }

  /** Analog of `SessionContext::register_csv` (ref: context.rs:53-63). */
  def registerCsv(name: String, path: String,
      options: CsvOptions = CsvOptions()): Unit =
    register(name, readCsv(path, options))

  /** Parquet twin (the reference is CSV-only; Parquet is our primary format
    * because at 100 TB a row-text format is never the right scan source). */
  def registerParquet(name: String, path: String): Unit =
    register(name, spark.read.parquet(path))

  /** Analog of `SessionContext::read_csv` (ref: context.rs:44-50).
    * Schema is either supplied (CsvReadOptions::with_schema,
    * ref: src/io/reader/csv/options.rs:25-28) or inferred — the reference
    * infers from the first 100 records (ref: src/io/reader/csv/mod.rs:6);
    * Spark's CSV source samples the whole file unless samplingRatio is set,
    * which is strictly better and distributed. */
  def readCsv(path: String, options: CsvOptions = CsvOptions()): DataFrame = {
    var r = spark.read
      .option("header", options.header)
      .option("delimiter", options.delimiter.toString)
      .option("quote", options.quote.toString)
      .option("escape", options.escape.toString)
      .option("mode", options.mode)
    r = options.schema match {
      case Some(s) => r.schema(s)
      case None    => r.option("inferSchema", true)
    }
    r.csv(path)
  }

  def readParquet(path: String): DataFrame = spark.read.parquet(path)
  def readJson(path: String): DataFrame = spark.read.json(path)
  def readOrc(path: String): DataFrame = spark.read.orc(path)
  /** Line-oriented text: one `value` string column per line. */
  def readText(path: String): DataFrame = spark.read.text(path)

  def registerJson(name: String, path: String): Unit = register(name, readJson(path))
  def registerOrc(name: String, path: String): Unit = register(name, readOrc(path))
  def registerText(name: String, path: String): Unit = register(name, readText(path))

  /** Look up a registered table; unknown names raise the same class of error
    * the reference raises from its catalog (ref: context.rs:95-99). */
  def table(name: String): DataFrame = {
    if (!registered.contains(name.toLowerCase))
      throw new IllegalArgumentException(s"Table '$name' not registered")
    spark.table(name)
  }

  def tableNames: Seq[String] = registered.toSeq

  /** SQL front door. Mirrors the reference's two-step: (1) walk the
    * statement collecting table references and validate them against the
    * catalog (ref: src/sql/visitor.rs:23-51 + context.rs:87-102), then
    * (2) plan and run. The grammar is a strict superset of the reference's
    * §2.6 subset since we delegate to Spark SQL.
    *
    * The walk covers expression-level subqueries (EXISTS / IN / scalar),
    * and names defined by WITH clauses are part of the query, not the
    * catalog, so they are excluded from validation — but only within their
    * lexical scope: a WITH's names are visible in its own bodies (each sees
    * the preceding ones plus itself, covering recursive CTEs) and its main
    * plan, never in siblings or ancestors. UnresolvedWith is a UnaryNode —
    * CTE bodies are NOT plan children — so the walk descends explicitly. */
  def sql(text: String): DataFrame = {
    val parsed = spark.sessionState.sqlParser.parsePlan(text)
    def missingIn(p: LogicalPlan, scope: Set[String]): Seq[String] = p match {
      case w: UnresolvedWith =>
        var s = scope
        val fromCtes = w.cteRelations.flatMap { case (name, body, _) =>
          s += name.toLowerCase
          missingIn(body, s)
        }
        fromCtes ++ missingIn(w.child, s)
      case r: UnresolvedRelation =>
        val n = r.multipartIdentifier.last.toLowerCase
        if (registered.contains(n) || scope.contains(n)) Nil else Seq(n)
      case other =>
        val fromSubqueries = other.expressions.flatMap(_.collect {
          case sq: SubqueryExpression => missingIn(sq.plan, scope)
        }.flatten)
        other.children.flatMap(missingIn(_, scope)) ++ fromSubqueries
    }
    val missing = missingIn(parsed, Set.empty).distinct
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"Table(s) not registered: ${missing.mkString(", ")}")
    spark.sql(text)
  }
}

/** CSV read options — analog of `CsvReadOptions` (ref:
  * src/io/reader/csv/options.rs:199-254: header/delimiter/quote/schema),
  * plus the malformed-row policy the reference lacks: PERMISSIVE (null-fill
  * bad cells, the default), DROPMALFORMED (skip bad rows), or FAILFAST
  * (error on first bad row) — at 100 TB a single corrupt row must not be
  * able to kill a job silently OR invisibly poison it, so the policy is
  * explicit. */
case class CsvOptions(
    header: Boolean = true,
    delimiter: Char = ',',
    quote: Char = '"',
    escape: Char = '"', // RFC 4180 doubled quotes (Spark's default is '\\')
    schema: Option[StructType] = None,
    mode: String = "PERMISSIVE")

object Context {
  /** Standard session shape for this engine: AQE on (runtime re-planning,
    * skew-join splitting), shuffle partitions sized for the local harness
    * (the 100 TB deployment would size this to ~2-3x total cores). */
  def session(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.engine.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** One Context per session (weak keys — sessions are not retained). Temp
    * views are session-global, so two Contexts per session could silently
    * disagree about which sf dir a view reads; a single handle rebound on
    * dir switch cannot. */
  private val sessionCtx =
    new java.util.WeakHashMap[SparkSession, (Context, String)]()

  /** A Context with the driver's star-schema tables registered from an
    * sf directory (TESTDATA.md layout). Memoized per session: registration
    * reads 10 parquet footers for schemas, which is pure overhead when
    * repeated per query. Switching dirs within a session re-registers the
    * views on the SAME Context, so every outstanding handle follows the
    * switch instead of mixing data from two directories. */
  def forSfDir(spark: SparkSession, sfDir: String): Context = synchronized {
    Option(sessionCtx.get(spark)) match {
      case Some((ctx, dir)) if dir == sfDir => ctx
      case prev =>
        val ctx = prev.map(_._1).getOrElse(new Context(spark))
        Tables.all.foreach(t => ctx.register(t, Tables.load(spark, sfDir, t)))
        sessionCtx.put(spark, (ctx, sfDir))
        ctx
    }
  }
}

object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Load a driver table. The events table's `ts` has shipped as either
    * nanosecond parquet timestamps (Spark reads them as raw longs under
    * spark.sql.legacy.parquet.nanosAsLong — set in all our sessions) or
    * plain microsecond timestamps without UTC adjustment (Spark 4 infers
    * TimestampNTZ). Canonicalize both to the native microsecond
    * TimestampType: the nanos path uses integer arithmetic (`DIV` — a
    * double roundtrip would lose precision above 2^53 ns), and the NTZ
    * cast is value-preserving because every session pins
    * spark.sql.session.timeZone=UTC. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name != "events") df
    else df.schema("ts").dataType match {
      case LongType => df.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType => df.withColumn("ts",
        org.apache.spark.sql.functions.col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Spread a KERNEL-BOUND operator input to the session's parallelism —
    * guide §2.5's "one huge unsplittable file" fix, applied at OPERATOR
    * granularity. The sf tables ship as one parquet file with one row
    * group, so their scans run as ONE task at any core count and a
    * per-row-expensive kernel (image/audio codecs, deletion-variant
    * neighborhoods) serializes on a 32-core box. Only the operators
    * whose downstream is genuinely compute-bound call this: an
    * A/B-measured GLOBAL repartition-on-load was rejected — it bought
    * 2-2.6x on the codec/kernel queries but taxed every join-heavy
    * query one extra exchange + AQE stage per scan (+0.5-1.4 s each on
    * q_tpch_q2/q11/q21, label_prop, reciprocity...), a net wash across
    * the 319-query sweep. Conditional on the input actually being
    * under-parallel, so at production split counts (or after an
    * upstream shuffle) it is a no-op and never moves big data twice. */
  def spreadForKernel(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    // A/B escape hatch shared with the measurement tools: a floor past
    // any real input (SPARK_GRAFT_SPREAD_MIN=9999999999999) disables
    // kernel-input spreading so before/after comparisons need no checkout
    val disabled = spark.conf.getOption("spark.graft.scan.spreadMinBytes")
      .flatMap(v => scala.util.Try(v.toLong).toOption)
      .exists(_ > (1L << 40))
    val target = spark.sparkContext.defaultParallelism
    val cur = df.rdd.getNumPartitions // planning only, no job
    if (!disabled && cur * 2 < target) df.repartition(target) else df
  }
}
