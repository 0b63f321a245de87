package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, LongType, StructType}

import graft.lake.{Maintenance, Versioned}

/** The SQL MAINTENANCE verbs — the operator loop an engine owner runs
  * daily, spelled exactly as Delta spells them and lowered onto the
  * manifest core's existing maintenance methods:
  *
  *  - `OPTIMIZE graft.`dir`` `[WHERE k = v [AND ...]] [ZORDER BY
  *    (c1[, ..., c4])]` → [[Versioned.optimize]] (binpack compaction;
  *    1 ZORDER column range-sorts; 2–4 rank-bucket per dimension then
  *    interleave via [[Maintenance.mortonKeyN]];
  *    WHERE scopes to the named partitions — the hot-partition
  *    maintenance move; a bare OPTIMIZE on a CLUSTER BY table
  *    self-clusters on the declared columns);
  *  - `VACUUM graft.`dir`` `[RETAIN n HOURS] [DRY RUN]`
  *    → [[Versioned.vacuumRetain]] (default 168 h, Delta's default);
  *    `DRY RUN` previews via [[Versioned.vacuumPlan]], deleting
  *    nothing;
  *  - `DESCRIBE DETAIL graft.`dir`` → the one-row operational
  *    snapshot (version, files, bytes, partition columns, pending MOR
  *    state); claimed only for graft-catalog tables;
  *  - `RESTORE [TABLE] graft.`dir` TO VERSION AS OF v` (or
  *    `TO TIMESTAMP AS OF 'yyyy-MM-dd HH:mm:ss'`) → [[Versioned.restore]];
  *  - `CREATE TABLE graft.`dst` SHALLOW CLONE graft.`src``
  *    `[VERSION AS OF v]` → [[Versioned.cloneAt]];
  *  - `REORG TABLE graft.`dir` APPLY (PURGE)` → Delta's spelling for
  *    "fold the MOR state into the data": [[Versioned.materializeDeletes]]
  *    compacts pending tombstones AND deletion vectors away;
  *  - `ANALYZE TABLE graft.`dir` COMPUTE [BLOOM] STATISTICS FOR
  *    COLUMNS (...)` → [[Versioned.backfillStats]] /
  *    [[Versioned.backfillBlooms]] (bootstrap the commit-time
  *    skipping metadata; claimed ONLY for graft-catalog tables —
  *    Spark's own ANALYZE TABLE statements delegate untouched);
  *  - `COPY INTO graft.`dir` FROM '<path>' FILEFORMAT = ... [PATTERN
  *    = ...] [FORMAT_OPTIONS (...)] [COPY_OPTIONS ('force'='true')]`
  *    → [[graft.lake.CopyInto.run]] (idempotent bulk ingestion with a
  *    file-level ledger + the txn exactly-once rail);
  *  - `CONVERT TO GRAFT graft.`dir` [PARTITIONED BY (...)]` — adopt
  *    an existing parquet directory into the protocol in place
  *    (zero rewrites; the manifest is the only new artifact).
  *
  * This is a PARSER extension (`injectParser`), not analysis: Spark's
  * own grammar has none of these statements, so the session-build hook
  * is the only seam. The delegate parses everything else — this class
  * claims a statement only when its FIRST keyword is one of the verbs
  * above (or a CREATE TABLE whose token stream contains SHALLOW CLONE
  * outside quotes), so the hot `spark.sql` path pays one regex test.
  * Each verb builds a [[LeafRunnableCommand]] that RETURNS METRICS as
  * rows (version committed, file counts) — the operator sees what the
  * command did, Delta-style.
  *
  * Table names resolve through the CATALOG: `cat.`dir`` requires `cat`
  * to be a registered [[GraftCatalog]]; the remaining (backquoted)
  * parts re-join to the lake directory, exactly like the catalog's own
  * `dirOf`. Live sessions built WITHOUT the extensions hook cannot
  * swap their parser — they call the `Versioned` methods directly (or
  * rebuild the session with `spark.sql.extensions=graft.GraftExtensions`).
  */
class GraftSqlParser(spark: SparkSession, delegate: ParserInterface)
  extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    parseMaintenance(spark, sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {

  /** Cheap ownership test, then the real (tiny) recursive-descent
    * parse. None = not a maintenance statement, delegate it. Exposed
    * package-wide so sessions built WITHOUT the extensions hook (whose
    * parser cannot be swapped) can still lower the verbs directly. */
  private[graft] def parseMaintenance(spark: SparkSession,
      sqlText: String): Option[LogicalPlan] = {
    val head = FirstWord.findFirstMatchIn(sqlText).map(_.group(1).toUpperCase)
    head match {
      case Some("OPTIMIZE") | Some("VACUUM") | Some("RESTORE") |
           Some("REORG") | Some("COPY") | Some("CONVERT") =>
        Some(new Parser(spark, sqlText).statement())
      case Some("ANALYZE") =>
        // ANALYZE TABLE is SPARK grammar too — claim it only when the
        // table is catalog-qualified AND the catalog head resolves to
        // a registered GraftCatalog; every other ANALYZE (session
        // catalog, hive, v2) falls through to Spark untouched.
        val toks = try new Lexer(sqlText).all() catch {
          case _: IllegalArgumentException => return None
        }
        val graftTarget = toks match {
          case Word(a) +: Word(t) +: rest
              if a.equalsIgnoreCase("ANALYZE") &&
                t.equalsIgnoreCase("TABLE") =>
            graftQualified(spark, rest)
          case _ => false
        }
        // claim only the shapes the graft grammar accepts (`COMPUTE
        // [BLOOM] STATISTICS FOR COLUMNS ...`): standard Spark
        // spellings on the same table — `COMPUTE STATISTICS [NOSCAN]`,
        // `FOR ALL COLUMNS`, partition specs — delegate untouched
        // (ADVICE r14: a blanket claim made them die with a graft
        // parse error instead of reaching Spark's own ANALYZE)
        if (graftTarget)
          try Some(new Parser(spark, sqlText).statement())
          catch { case _: IllegalArgumentException => None }
        else None
      case Some("DESCRIBE") | Some("DESC") =>
        // DESCRIBE is Spark grammar too — ours are ONLY the Delta-shaped
        // `DESCRIBE DETAIL|HISTORY <graft table>`.
        val toks = try new Lexer(sqlText).all() catch {
          case _: IllegalArgumentException => return None
        }
        val graftTarget = toks match {
          case Word(_) +: Word(d) +: rest
              if d.equalsIgnoreCase("DETAIL") ||
                d.equalsIgnoreCase("HISTORY") =>
            graftQualified(spark, rest)
          case _ => false
        }
        if (graftTarget) Some(new Parser(spark, sqlText).statement())
        else None
      case Some("CREATE") =>
        // only a CREATE whose TOKENS spell SHALLOW CLONE is ours (a
        // string literal or backquoted name containing the words must
        // fall through to Spark) — lex first, decide after
        val toks = try new Lexer(sqlText).all() catch {
          case _: IllegalArgumentException => return None // not lexable by us
        }
        val isClone = toks.sliding(2).exists {
          case Seq(Word(a), Word(b)) =>
            a.equalsIgnoreCase("SHALLOW") && b.equalsIgnoreCase("CLONE")
          case _ => false
        }
        if (isClone) Some(new Parser(spark, sqlText).statement()) else None
      case _ => None
    }
  }

  private val FirstWord = "^\\s*([A-Za-z]+)".r

  /** `rest` starts with `<name> .` where `<name>` is a registered
    * [[GraftCatalog]] — the soft ownership test for verbs Spark's own
    * grammar also spells (ANALYZE, DESCRIBE). */
  private def graftQualified(spark: SparkSession, rest: Seq[Tok]): Boolean = {
    val head = rest.headOption.collect {
      case Word(w) => w
      case Quoted(q) => q
    }
    rest.lift(1).contains(Sym('.')) && head.exists { name =>
      try spark.sessionState.catalogManager.catalog(name)
        .isInstanceOf[GraftCatalog]
      catch { case _: Exception => false }
    }
  }

  // ---- the token stream ---------------------------------------------
  private[sources] sealed trait Tok
  private[sources] final case class Word(raw: String) extends Tok {
    def up: String = raw.toUpperCase
  }
  private[sources] final case class Quoted(s: String) extends Tok // `...`
  private[sources] final case class Str(s: String) extends Tok // '...'
  private[sources] final case class Num(s: String) extends Tok
  private[sources] final case class Sym(c: Char) extends Tok
  private[sources] case object End extends Tok

  /** A maintenance statement we CLAIMED but cannot parse/resolve: the
    * refusal must be loud and self-diagnosing (IllegalArgumentException
    * — Spark 4's ParseException constructors are error-class-keyed and
    * would bury the guidance under a template). */
  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  /** Lexes the SMALL grammar above: words, backquoted identifiers
    * (with `` escapes), single-quoted strings ('' escapes), numbers,
    * and the symbols `.(),`. Anything else refuses — callers treat
    * that as "not ours". */
  private[sources] final class Lexer(text: String) {
    private var i = 0
    def all(): Vector[Tok] = {
      val buf = Vector.newBuilder[Tok]
      var t = next()
      while (t != End) { buf += t; t = next() }
      buf.result()
    }
    private def next(): Tok = {
      while (i < text.length && text(i).isWhitespace) i += 1
      if (i >= text.length) return End
      val c = text(i)
      if (c == '`') {
        val sb = new StringBuilder; i += 1
        while (i < text.length) {
          if (text(i) == '`') {
            if (i + 1 < text.length && text(i + 1) == '`') {
              sb += '`'; i += 2
            } else { i += 1; return Quoted(sb.toString) }
          } else { sb += text(i); i += 1 }
        }
        fail("unterminated backquoted identifier")
      } else if (c == '\'') {
        val sb = new StringBuilder; i += 1
        while (i < text.length) {
          if (text(i) == '\'') {
            if (i + 1 < text.length && text(i + 1) == '\'') {
              sb += '\''; i += 2
            } else { i += 1; return Str(sb.toString) }
          } else { sb += text(i); i += 1 }
        }
        fail("unterminated string literal")
      } else if (c.isDigit) {
        val start = i
        while (i < text.length && (text(i).isDigit || text(i) == '.')) i += 1
        Num(text.substring(start, i))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < text.length &&
          (text(i).isLetterOrDigit || text(i) == '_' || text(i) == '$')) i += 1
        Word(text.substring(start, i))
      } else if (c == '.' || c == '(' || c == ')' || c == ',' ||
          c == ';' || c == '=') {
        i += 1; Sym(c)
      } else fail(s"unexpected character '$c' in maintenance statement")
    }
  }

  private final class Parser(spark: SparkSession, text: String) {
    private val toks: Vector[Tok] = new Lexer(text).all()
      .filterNot(_ == Sym(';'))
    private var p = 0
    private def peek: Tok = if (p < toks.length) toks(p) else End
    private def take(): Tok = { val t = peek; p += 1; t }
    private def kw(expected: String): Unit = take() match {
      case w: Word if w.up == expected =>
      case other => fail(s"expected $expected, found $other in: $text")
    }
    private def optKw(expected: String): Boolean = peek match {
      case w: Word if w.up == expected => p += 1; true
      case _ => false
    }
    private def num(): String = take() match {
      case Num(s) => s
      case other => fail(s"expected a number, found $other in: $text")
    }
    private def namePart(): String = take() match {
      case Quoted(s) => s
      case w: Word => w.raw
      case other => fail(s"expected an identifier, found $other in: $text")
    }
    private def eq(): Unit = take() match {
      case Sym('=') =>
      case other => fail(s"expected =, found $other in: $text")
    }
    /** `('k' = 'v'[, ...])` — the Delta options-map spelling. */
    private def optionsMap(): Map[String, String] = {
      take() match {
        case Sym('(') =>
        case other => fail(s"expected (, found $other in: $text")
      }
      val m = Map.newBuilder[String, String]
      var more = peek != Sym(')')
      while (more) {
        val k = take() match {
          case Str(s) => s
          case other => fail(s"expected a quoted option key, found $other")
        }
        eq()
        val v = take() match {
          case Str(s) => s
          case Num(s) => s
          case w: Word => w.raw
          case other => fail(s"expected an option value, found $other")
        }
        m += (k -> v)
        more = peek == Sym(',')
        if (more) take()
      }
      take() match {
        case Sym(')') =>
        case other => fail(s"expected ), found $other in: $text")
      }
      m.result()
    }
    /** `cat.`dir``: the head must name a registered [[GraftCatalog]];
      * the rest re-joins to the lake directory (the catalog's own
      * `dirOf` convention). */
    private def tableDir(): String = {
      val parts = Vector.newBuilder[String]
      parts += namePart()
      while (peek == Sym('.')) { take(); parts += namePart() }
      val all = parts.result()
      if (all.length < 2)
        fail(s"maintenance verbs need a catalog-qualified table " +
          s"(cat.`dir` where cat is a GraftCatalog), got: ${all.mkString(".")}")
      val cat = try spark.sessionState.catalogManager.catalog(all.head)
        catch { case _: Exception =>
          fail(s"'${all.head}' is not a registered catalog — set " +
            s"spark.sql.catalog.${all.head}=graft.sources.GraftCatalog") }
      if (!cat.isInstanceOf[GraftCatalog])
        fail(s"catalog '${all.head}' is not a graft catalog — " +
          "maintenance verbs apply to graft tables only")
      all.tail.mkString(".")
    }
    private def end(): Unit =
      if (peek != End) fail(s"trailing input after statement: $text")

    def statement(): LogicalPlan = take() match {
      case w: Word if w.up == "OPTIMIZE" =>
        val dir = tableDir()
        // FULL (Delta's spelling): force a complete re-layout of a
        // CLUSTER BY table instead of the incremental stripe
        val full = optKw("FULL")
        // WHERE k = v [AND k2 = v2] — the partition scope (Delta's
        // OPTIMIZE WHERE): equality conjunctions on partition columns
        val where = Map.newBuilder[String, String]
        if (optKw("WHERE")) {
          var more = true
          while (more) {
            val k = namePart()
            eq()
            val v = take() match {
              case Str(s) => s
              case Num(s) => s
              case w2: Word => w2.raw
              case other => fail(s"expected a partition value, found $other")
            }
            where += (k -> v)
            more = optKw("AND")
          }
        }
        val zcols =
          if (optKw("ZORDER")) {
            kw("BY")
            val paren = peek == Sym('(')
            if (paren) take()
            val cols = Vector.newBuilder[String]
            cols += namePart()
            while (peek == Sym(',')) { take(); cols += namePart() }
            if (paren) take() match {
              case Sym(')') =>
              case other => fail(s"expected ), found $other")
            }
            cols.result()
          } else Nil
        end()
        GraftOptimizeCommand(dir, zcols, where.result(), full)
      case w: Word if w.up == "VACUUM" =>
        val dir = tableDir()
        val hours =
          if (optKw("RETAIN")) { val n = num(); kw("HOURS"); n.toDouble }
          else 168.0 // Delta's default retention
        val dry = optKw("DRY")
        if (dry) kw("RUN")
        end()
        if (dry) GraftVacuumDryRunCommand(dir, hours)
        else GraftVacuumCommand(dir, hours)
      case w: Word if w.up == "DESCRIBE" || w.up == "DESC" =>
        take() match {
          case d: Word if d.up == "DETAIL" =>
            val dir = tableDir(); end()
            GraftDescribeDetailCommand(dir)
          case d: Word if d.up == "HISTORY" =>
            val dir = tableDir(); end()
            GraftDescribeHistoryCommand(dir)
          case other => fail(s"expected DETAIL or HISTORY, found $other")
        }
      case w: Word if w.up == "RESTORE" =>
        optKw("TABLE")
        val dir = tableDir()
        kw("TO")
        val cmd = take() match {
          case v: Word if v.up == "VERSION" =>
            kw("AS"); kw("OF"); GraftRestoreCommand(dir, Some(num().toLong), None)
          case t: Word if t.up == "TIMESTAMP" =>
            kw("AS"); kw("OF")
            take() match {
              case Str(s) => GraftRestoreCommand(dir, None, Some(s))
              case Num(n) => GraftRestoreCommand(dir, None, Some(n))
              case other => fail(s"expected a timestamp literal, found $other")
            }
          case other => fail(s"expected VERSION|TIMESTAMP AS OF, found $other")
        }
        end(); cmd
      case w: Word if w.up == "REORG" =>
        kw("TABLE")
        val dir = tableDir()
        kw("APPLY")
        take() match { case Sym('(') =>; case o => fail(s"expected (, found $o") }
        kw("PURGE")
        take() match { case Sym(')') =>; case o => fail(s"expected ), found $o") }
        end()
        GraftReorgPurgeCommand(dir)
      case w: Word if w.up == "CONVERT" =>
        kw("TO"); kw("GRAFT")
        val dir = tableDir()
        val pkeys =
          if (optKw("PARTITIONED")) {
            kw("BY")
            take() match {
              case Sym('(') =>
              case other => fail(s"expected (, found $other")
            }
            val ks = Vector.newBuilder[String]
            ks += namePart()
            while (peek == Sym(',')) { take(); ks += namePart() }
            take() match {
              case Sym(')') =>
              case other => fail(s"expected ), found $other")
            }
            ks.result()
          } else Nil
        end()
        GraftConvertCommand(dir, pkeys)
      case w: Word if w.up == "COPY" =>
        kw("INTO")
        val dir = tableDir()
        kw("FROM")
        val from = take() match {
          case Str(s) => s
          case other => fail(s"expected a quoted source path, found $other")
        }
        kw("FILEFORMAT"); eq()
        val fmt = namePart()
        var pattern: Option[String] = None
        var fmtOpts = Map.empty[String, String]
        var force = false
        while (peek != End) take() match {
          case k: Word if k.up == "PATTERN" =>
            eq()
            pattern = Some(take() match {
              case Str(s) => s
              case other => fail(s"expected a quoted glob, found $other")
            })
          case k: Word if k.up == "FORMAT_OPTIONS" =>
            fmtOpts = optionsMap()
          case k: Word if k.up == "COPY_OPTIONS" =>
            optionsMap().foreach { case (ok, ov) =>
              if (ok.equalsIgnoreCase("force"))
                force = ov.equalsIgnoreCase("true")
              else fail(s"unsupported COPY_OPTIONS key '$ok' — 'force' " +
                "is the supported option")
            }
          case other =>
            fail(s"unexpected COPY INTO clause starting at $other")
        }
        end()
        GraftCopyIntoCommand(dir, from, fmt, pattern, fmtOpts, force)
      case w: Word if w.up == "ANALYZE" =>
        kw("TABLE")
        val dir = tableDir()
        kw("COMPUTE")
        val bloom = optKw("BLOOM")
        kw("STATISTICS")
        kw("FOR"); kw("COLUMNS")
        val paren = peek == Sym('(')
        if (paren) take()
        val cols = Vector.newBuilder[String]
        cols += namePart()
        while (peek == Sym(',')) { take(); cols += namePart() }
        if (paren) take() match {
          case Sym(')') =>
          case other => fail(s"expected ), found $other")
        }
        // bloom sizing knobs (defaults match backfillBlooms)
        var expected = 100000L
        var fpp = 0.01
        if (bloom) {
          if (optKw("EXPECTED")) { expected = num().toLong; kw("ITEMS") }
          if (optKw("FPP")) fpp = num().toDouble
        }
        end()
        GraftAnalyzeCommand(dir, cols.result(), bloom, expected, fpp)
      case w: Word if w.up == "CREATE" =>
        kw("TABLE")
        val dst = tableDir()
        kw("SHALLOW"); kw("CLONE")
        val src = tableDir()
        val version = if (optKw("VERSION")) {
          kw("AS"); kw("OF"); num().toLong
        } else -1L
        end()
        GraftShallowCloneCommand(src, dst, version)
      case other => fail(s"unexpected start of maintenance statement: $other")
    }
  }

  private[sources] def longAttr(name: String): AttributeReference =
    AttributeReference(name, LongType, nullable = false)()

  private[sources] def strAttr(name: String): AttributeReference =
    AttributeReference(name, org.apache.spark.sql.types.StringType,
      nullable = false)()
}

/** `VACUUM ... [RETAIN n HOURS] DRY RUN` → [[Versioned.vacuumPlan]]:
  * the files a real vacuum at this retention would remove, one row
  * each, with NOTHING deleted — Delta's preview verb, the thing an
  * operator runs before the first destructive vacuum on a 100 TB
  * table. */
case class GraftVacuumDryRunCommand(dir: String, retainHours: Double)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    GraftSqlParser.strAttr("path"),
    GraftSqlParser.strAttr("kind"))
  override def run(spark: SparkSession): Seq[Row] = {
    require(retainHours >= 0, "RETAIN hours must be >= 0")
    Versioned.vacuumPlan(spark, dir, (retainHours * 3600 * 1000).toLong)
      .map { case (p, k) => Row(p, k) }
  }
}

/** `DESCRIBE DETAIL graft.`dir`` — the one-row operational snapshot
  * Delta spells the same way: format, location, current version, live
  * file count and bytes, partition columns, pending MOR state. Bytes
  * resolve from the manifests' OWN `#bytes` lines (writers record
  * each staged file's size at commit — [[Versioned.fileSizesAt]]):
  * the snapshot is metadata-only, never one `getFileStatus` RPC per
  * live file (at millions of files that was minutes of sequential
  * driver wall-clock); only files whose recording commit predates the
  * rail or was vacuumed pay the lazy per-file fallback. */
case class GraftDescribeDetailCommand(dir: String)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    GraftSqlParser.strAttr("format"),
    GraftSqlParser.strAttr("location"),
    GraftSqlParser.longAttr("version"),
    GraftSqlParser.longAttr("num_files"),
    GraftSqlParser.longAttr("size_bytes"),
    GraftSqlParser.strAttr("partition_columns"),
    GraftSqlParser.longAttr("num_pending_delete_files"))
  override def run(spark: SparkSession): Seq[Row] = {
    val v = Versioned.currentVersion(spark, dir)
    require(v >= 0, s"not a graft table: $dir")
    val sizes = Versioned.fileSizesAt(spark, dir, v)
    Seq(Row("graft", dir, v, sizes.size.toLong, sizes.values.sum,
      Versioned.layoutPartitionKeys(spark, dir).mkString(","),
      Versioned.deleteFilesAt(spark, dir, v).size.toLong))
  }
}

/** `DESCRIBE HISTORY graft.`dir`` — the commit log as rows, newest
  * first (Delta's verb): version, commit timestamp, operation,
  * checkpoint form, live-file count, pending MOR entries, txn
  * high-waters. Metadata-only — one manifest-listing walk
  * ([[Versioned.history]]); the operator's first question ("what
  * happened to this table?") answered without touching data. */
case class GraftDescribeHistoryCommand(dir: String)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    GraftSqlParser.longAttr("version"),
    GraftSqlParser.longAttr("commit_ts"),
    GraftSqlParser.strAttr("operation"),
    AttributeReference("is_checkpoint",
      org.apache.spark.sql.types.BooleanType, nullable = false)(),
    GraftSqlParser.longAttr("n_files"),
    GraftSqlParser.longAttr("n_pending_delete_files"),
    GraftSqlParser.strAttr("txns"))
  override def run(spark: SparkSession): Seq[Row] = {
    require(Versioned.currentVersion(spark, dir) >= 0,
      s"not a graft table: $dir")
    Versioned.history(spark, dir).collect().toSeq.map { r =>
      Row(r.getLong(0), r.getAs[Any](1) match {
          case null => -1L
          case l: Long => l
          case o => o.toString.toLong
        },
        Option(r.getString(2)).getOrElse(""), r.getBoolean(3),
        r.getLong(4), r.getLong(5), Option(r.getString(6)).getOrElse(""))
    }
  }
}

/** `OPTIMIZE` → [[Versioned.optimize]]: binpack compaction of every
  * partition holding more files than its bytes demand; `ZORDER BY`
  * re-clusters (one column sorts directly; 2–4 take the same
  * RANK-CUT key as declared clustering — [[GraftOptimizeCommand
  * .clusterKey]] buckets each dimension into equal-population cells,
  * then the codegen'd [[Maintenance.mortonKeyN]] interleaves the
  * CELL ids: a TRUE N-dimensional z-order at the same granularity
  * per dimension, domain-size- and type-proof). More than four
  * refuses: per-dimension resolution is `63/N` bits and skip quality
  * collapses past ~4 dims — at 100 TB that silently clusters badly,
  * so the command says so instead. */
case class GraftOptimizeCommand(dir: String, zorderCols: Seq[String],
    where: Map[String, String] = Map.empty, full: Boolean = false)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    GraftSqlParser.longAttr("version"),
    GraftSqlParser.longAttr("files_before"),
    GraftSqlParser.longAttr("files_after"))
  override def run(spark: SparkSession): Seq[Row] = {
    val before = Versioned.filesAt(spark, dir).size.toLong
    val keys = Versioned.layoutPartitionKeys(spark, dir)
    val cluster =
      if (zorderCols.nonEmpty) Nil else Versioned.clusterByOf(spark, dir)
    // INCREMENTAL self-cluster (the liquid steady state): a bare
    // OPTIMIZE on a table already stamped `#clusterat` lays out ONLY
    // the files added since the stamp — one stripe, cut points from
    // the stripe's own distribution, cost priced by ingest churn
    // while the already-clustered bulk is untouched metadata. FULL
    // forces the complete re-layout (and a vacuumed stamp range falls
    // back to it); WHERE keeps its scoped semantics un-stamped.
    val incremental: Option[Set[String]] =
      if (full || cluster.isEmpty || where.nonEmpty) None
      else Versioned.clusterStampOf(spark, dir).flatMap { stamp =>
        try Some(Versioned.filesAddedAfter(spark, dir, stamp))
        catch { case _: IllegalArgumentException => None } // vacuumed
      }
    incremental match {
      case Some(fresh) if fresh.isEmpty =>
        // nothing new since the stamp: the layout is current — no-op
        return Seq(Row(Versioned.currentVersion(spark, dir), before, before))
      case _ =>
    }
    val zorder = zorderCols match {
      case Nil =>
        // no explicit ZORDER: a table with DECLARED clustering columns
        // (CLUSTER BY / graft.clusterBy) self-clusters — the liquid
        // discipline: `OPTIMIZE t` alone maintains the layout. Cut
        // points come from the rows being laid out (the whole table,
        // or just the incremental stripe — each stripe self-normalizes
        // and its per-file boxes stay tight).
        if (cluster.isEmpty) None
        else Some(GraftOptimizeCommand.clusterKey(spark, dir, cluster,
          over = incremental.map(fresh =>
            Versioned.snapshotOfFiles(spark, dir, fresh.toSeq.sorted))))
      case Seq(a) =>
        // single column: a plain range sort IS the optimal layout (no
        // interleave to balance), and raw values keep the boxes exact.
        // Strings sort natively — no cast, no grid.
        Some(col(a))
      case more if more.size <= 4 =>
        // explicit columns OVERRIDE the declared CLUSTER BY list but
        // take the SAME rank-cut discipline: clusterKey buckets each
        // dimension into equal-POPULATION cells (approx_percentile for
        // numerics, sorted-distinct/sampled cuts for strings) before
        // the morton interleave. Interleaving RAW values (the pre-r16
        // path) used only the low min(16, 63/n) bits — on any id domain
        // past 2^16 that is `value mod 65536`, hash noise: every file's
        // min/max box stays domain-wide and skipping dies, silently,
        // exactly at the scale ZORDER exists for; strings crashed (ANSI
        // cast) or clustered on null. Rank cuts are domain- and
        // type-proof, and WHERE-scoped rewrites keep tight boxes too
        // (equal-population cuts from the whole table stay monotone on
        // any subset).
        Some(GraftOptimizeCommand.clusterKey(spark, dir, more))
      case more => throw new IllegalArgumentException(
        s"ZORDER BY supports 1 to 4 columns (got ${more.size}): past " +
          "~4 interleaved dimensions each file's min/max box is tight " +
          "in none of them — cluster on the highest-selectivity " +
          "columns, or build a custom key with " +
          "Versioned.optimize(zorder = ...)")
    }
    // file-size target (Delta's OPTIMIZE maxFileSize, default 1 GiB):
    // without it a ZORDER rewrite lands ONE file per partition — at
    // test scale invisible, on a 10 TB partition catastrophic. The
    // byte target sizes both the binpack trigger (a partition already
    // at ceil(bytes/target) files is a metadata no-op) and the
    // re-cluster's output slices; `0` opts out (the pre-r16 shape).
    val targetBytes: Option[Long] = {
      val raw = spark.conf.get("spark.graft.optimize.targetFileSize", "1g")
      val b = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
      if (b <= 0L) None else Some(b)
    }
    val v = Versioned.optimize(spark, dir, keys, zorder = zorder,
      targetFileSizeBytes = targetBytes,
      partitionFilter = if (where.isEmpty) None else Some(where),
      onlyFiles = incremental,
      stampClusterAt = cluster.nonEmpty && where.isEmpty)
    Seq(Row(v, before, Versioned.filesAt(spark, dir, v).size.toLong))
  }
}

object GraftOptimizeCommand {
  /** The morton key for a table's DECLARED clustering columns — RANK
    * (quantile) bucketing, not linear min-max scaling: each dimension
    * buckets into `2^min(8, 63/N)` equal-POPULATION cells via
    * [[Maintenance.quantileBucket]]'s codegen'd comparison tree.
    *
    *  - NUMERIC dims take their cut points from ONE
    *    `approx_percentile` aggregate over all dims together — a
    *    zipf-skewed id no longer collapses its tail into one linear
    *    cell (the r14 ledger's measured selectivity loss);
    *  - STRING dims cluster LEXICOGRAPHICALLY: cut points come from
    *    the sorted distinct values (collected whole when small, a
    *    seeded sample above 10k distincts — the RangePartitioner
    *    discipline), so `CLUSTER BY (event_type)` needs no numeric
    *    surrogate.
    *
    * Equal-population cells also mean the per-file min/max boxes the
    * stats sidecar skips on stay tight on BOTH dense and sparse
    * regions of the domain. One aggregate (plus a bounded distinct
    * per string dim), paid once per OPTIMIZE, small next to the
    * rewrite it shapes. Constant/all-null dims grid to a single
    * cell. */
  private[sources] def clusterKey(spark: SparkSession, dir: String,
      cluster: Seq[String],
      over: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, percentile_approx, coalesce}
    val bits = math.min(8, 63 / cluster.size)
    val cells = 1 << bits
    val probs = (1 until cells).map(i => i.toDouble / cells).toArray
    val snap = over.getOrElse(Versioned.snapshot(spark, dir))
    val (numCols, strCols) = cluster.partition(c => snap.schema(c)
      .dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
    val numCuts: Map[String, Seq[Double]] =
      if (numCols.isEmpty) Map.empty
      else {
        val aggs = numCols.map(c => percentile_approx(
          col(c).cast("double"),
          lit(probs), lit(10000)).as(c))
        val row = snap.agg(aggs.head, aggs.tail: _*).collect()(0)
        numCols.zipWithIndex.map { case (c, i) =>
          val cuts = if (row.isNullAt(i)) Nil
            else row.getSeq[Double](i).filter(_ != null).distinct.sorted
          c -> cuts
        }.toMap
      }
    val strCuts: Map[String, Seq[String]] = strCols.map { c =>
      val d = snap.select(col(c).cast("string").as(c)).na.drop.distinct()
      val n = d.count()
      val sample =
        if (n <= 10000L) d.orderBy(col(c)).collect().map(_.getString(0)).toSeq
        else d.sample(withReplacement = false, 10000.0 / n, seed = 42L)
          .collect().map(_.getString(0)).sorted.toSeq
      val k = sample.size
      val cuts =
        if (k <= 1) Nil
        else (1 until cells).map(i => sample(math.min(k - 1, i * k / cells)))
          .distinct.sorted
      c -> cuts
    }.toMap
    val dims = cluster.map { c =>
      numCuts.get(c) match {
        case Some(cuts) if cuts.size >= 1 =>
          Maintenance.quantileBucket(col(c).cast("double"), cuts.map(lit(_)))
        case Some(_) => lit(0L) // constant or all-null: one cell
        case None =>
          val cuts = strCuts(c)
          if (cuts.isEmpty) lit(0L)
          else Maintenance.quantileBucket(col(c).cast("string"),
            cuts.map(lit(_)))
      }
    }
    val key = if (dims.size == 1) dims.head
      else Maintenance.mortonKeyN(dims, bits)
    coalesce(key, lit(0L))
  }
}

/** `CONVERT TO GRAFT graft.`dir` [PARTITIONED BY (k1[, k2])]` —
  * adopt an EXISTING parquet directory into the manifest protocol
  * (Delta's CONVERT TO DELTA): v0 references the directory's current
  * files in place (zero rewrites, zero copies — the manifest is the
  * only new artifact), and a declared PARTITIONED BY pins the layout
  * spec so every later writer is spec-checked (it must match the
  * directory's existing Hive nesting; declare-only, no rewrite).
  * Refuses on an already-converted table. The reference's merged
  * parquet lakes onboard with exactly this one statement. */
case class GraftConvertCommand(dir: String, pkeys: Seq[String])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    GraftSqlParser.longAttr("version"),
    GraftSqlParser.longAttr("files_adopted"))
  override def run(spark: SparkSession): Seq[Row] = {
    require(Versioned.currentVersion(spark, dir) < 0,
      s"$dir is already a graft table (version " +
        s"${Versioned.currentVersion(spark, dir)}) — CONVERT adopts " +
        "plain parquet directories only")
    // pre-flight BEFORE any manifest write (ADVICE r14: init-then-check
    // left an empty v0 behind on an empty/mistyped directory, wedging
    // the retry with 'already a graft table' and hiding files that
    // landed later) — an empty or absent directory refuses with
    // nothing written
    val n = Versioned.adoptableFiles(spark, dir).size.toLong
    require(n > 0L,
      s"CONVERT found no parquet data files under $dir — nothing to " +
        "adopt (no manifest was written; fix the path or land the " +
        "files, then re-run)")
    val v = Versioned.init(spark, dir)
    if (pkeys.nonEmpty) Versioned.changePartitionSpec(spark, dir, pkeys)
    Seq(Row(Versioned.currentVersion(spark, dir),
      Versioned.filesAt(spark, dir, v).size.toLong))
  }
}

/** `COPY INTO graft.`dir` FROM '<path>' FILEFORMAT = PARQUET|CSV|JSON
  * [PATTERN = '<glob>'] [FORMAT_OPTIONS (...)] [COPY_OPTIONS ('force'
  * = 'true')]` → [[graft.lake.CopyInto.run]]: idempotent bulk file
  * ingestion — files already named by the COPY ledger are skipped,
  * the fresh ones land as ONE manifest commit riding the streaming
  * sink's txn rail (exactly-once across crashes; see CopyInto's
  * protocol note). This is the reference's ingest loop as a SQL verb:
  * re-run it after every upload drop, it loads only what's new. */
case class GraftCopyIntoCommand(dir: String, from: String, format: String,
    pattern: Option[String], formatOptions: Map[String, String],
    force: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    GraftSqlParser.longAttr("version"),
    GraftSqlParser.longAttr("files_loaded"),
    GraftSqlParser.longAttr("files_skipped"))
  override def run(spark: SparkSession): Seq[Row] = {
    val r = graft.lake.CopyInto.run(spark, dir, from, format, pattern,
      formatOptions, force)
    Seq(Row(r.version, r.filesLoaded, r.filesSkipped))
  }
}

/** `ANALYZE TABLE graft.`dir` COMPUTE [BLOOM] STATISTICS FOR COLUMNS
  * (c1[, c2]) [EXPECTED n ITEMS] [FPP p]` — bootstraps (or repairs,
  * or re-columns) the COMMIT-TIME metadata disciplines over a lake
  * that predates them:
  *  - plain → [[Versioned.backfillStats]]: one distributed footer
  *    pass writes the version's FULL min/max/rows/nulls sidecar;
  *  - BLOOM → [[Versioned.backfillBlooms]]: one data scan builds the
  *    per-file bloom filters (EXPECTED/FPP size them; the defaults
  *    are backfillBlooms' own).
  * From then on EVERY commit extends coverage for its own files
  * automatically (inheritance — see the Versioned sidecar note), so
  * this statement runs once per lake, not per refresh: ANALYZE is the
  * bootstrap of a discipline, never a recurring index build. Spark's
  * own `ANALYZE TABLE` statements are untouched — the parser claims
  * the verb only for catalog-qualified graft tables. */
case class GraftAnalyzeCommand(dir: String, cols: Seq[String],
    bloom: Boolean, expected: Long, fpp: Double)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    GraftSqlParser.longAttr("version"),
    GraftSqlParser.longAttr("files_covered"),
    GraftSqlParser.longAttr("columns_tracked"))
  override def run(spark: SparkSession): Seq[Row] = {
    val v =
      if (bloom) Versioned.backfillBlooms(spark, dir, cols, expected, fpp)
      else Versioned.backfillStats(spark, dir, cols)
    Seq(Row(v, Versioned.filesAt(spark, dir, v).size.toLong,
      cols.size.toLong))
  }
}

/** `VACUUM ... [RETAIN n HOURS]` → [[Versioned.vacuumRetain]]. */
case class GraftVacuumCommand(dir: String, retainHours: Double)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    GraftSqlParser.longAttr("versions_kept"),
    GraftSqlParser.longAttr("oldest_version"))
  override def run(spark: SparkSession): Seq[Row] = {
    require(retainHours >= 0, "RETAIN hours must be >= 0")
    Versioned.vacuumRetain(spark, dir, (retainHours * 3600 * 1000).toLong)
    val vs = Versioned.history(spark, dir).select("version")
      .collect().map(_.getLong(0))
    Seq(Row(vs.length.toLong, vs.min))
  }
}

/** `RESTORE ... TO VERSION|TIMESTAMP AS OF` → [[Versioned.restore]]
  * (a NEW commit that re-publishes the target state — history is
  * append-only, exactly Delta's RESTORE). */
case class GraftRestoreCommand(dir: String, toVersion: Option[Long],
    toTimestamp: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    GraftSqlParser.longAttr("restored_to_version"),
    GraftSqlParser.longAttr("committed_version"))
  override def run(spark: SparkSession): Seq[Row] = {
    val target = toVersion.getOrElse {
      val s = toTimestamp.get
      val millis =
        if (s.forall(c => c.isDigit || c == '.')) s.toDouble.toLong
        else java.sql.Timestamp.valueOf(s).getTime
      Versioned.versionAsOf(spark, dir, millis)
    }
    val v = Versioned.restore(spark, dir, target)
    Seq(Row(target, v))
  }
}

/** `REORG TABLE ... APPLY (PURGE)` — Delta's spelling for "rewrite the
  * MOR state into the data": folds pending equality tombstones and
  * deletion vectors into the affected partitions
  * ([[Versioned.materializeDeletes]]). */
case class GraftReorgPurgeCommand(dir: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    GraftSqlParser.longAttr("version"))
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Versioned.materializeDeletes(spark, dir,
      Versioned.layoutPartitionKeys(spark, dir))))
}

/** `CREATE TABLE dst SHALLOW CLONE src [VERSION AS OF v]` →
  * [[Versioned.cloneAt]]: a metadata-only table whose manifest
  * references the source's files (localized partition-by-partition by
  * later OPTIMIZE/COW commits). */
case class GraftShallowCloneCommand(srcDir: String, dstDir: String,
    version: Long) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    GraftSqlParser.longAttr("version"))
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Versioned.cloneAt(spark, srcDir, dstDir, version)))
}
