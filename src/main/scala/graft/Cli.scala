package graft

import graft.api.Storage
import graft.model.StixId
import org.apache.spark.sql.SparkSession

/** Command-line front end over the Storage verb surface — the reference's
  * CLI (firepit/cli.py: cache/extract/filter/assign/join/lookup/values/
  * tables/views/columns/type/schema/count/appdata/load/merge/remove/rename/
  * value_counts/number_observed/summary/timestamped). The database URL of
  * the reference becomes a workdir path here.
  *
  * Usage: runMain graft.Cli <workdir> <command> [args...]
  * Rows print as JSON lines (the CLI's default format).
  */
object Cli {

  private def usage(): Nothing = {
    System.err.println(
      """usage: graft.Cli <workdir> <command> [args...]
        |  cache <query_id> <bundle_file_or_url>...
        |  extract <name> <sco_type> <query_id> <pattern>
        |  filter <name> <sco_type> <input_view> <pattern>
        |  assign <name> <input> sort|group <by> [asc|desc] [limit]
        |  join <name> <left> <left_on> <right> <right_on>
        |  lookup <view> [limit [offset]]
        |  values <path> <view>
        |  tables | types | views
        |  viewdata [view...]
        |  columns <view> | type <view> | schema <view> | count <view>
        |  set-appdata <view> <json> | get-appdata <view>
        |  merge <name> <view>... | remove <view> | rename <old> <new>
        |  snapshot <table[,table...]> <name> | snapshots <table>
        |  read-snapshot <table> <name> [limit] | drop-snapshot <table> <name>
        |  delete | convert <logfile> [query_id]
        |  value-counts <view> <path>
        |  number-observed <view> <path> [value]
        |  summary <view> [path [value]]
        |  timestamped <view> [path [value]]
        |  sql <select_statement>
        |  load <name> <json_or_csv_file> [--sco-type=T] [--query-id=Q] [--preserve-ids=bool]
        |  reassign <name> <json_file>
        |  splint randomize-ids|dedup-ids|upgrade <bundle_file>
        |  splint limit <n> <bundle_file>
        |  splint timeshift <bundle_file> <new_start> <new_end>""".stripMargin)
    sys.exit(2)
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 2) usage()
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .appName("graft-cli")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try run(spark, args.toSeq) finally spark.stop()
  }

  /** Dispatch one CLI invocation against an existing session (separated
    * from main so the replay suite can drive it without session teardown). */
  /** JSON array of dicts, falling back to headered CSV — the reference
    * load's file contract (cli.py:264-269: json.load, ValueError ->
    * csv.DictReader). A parse error OR a bare-scalar parse (Jackson
    * readTree ignores trailing tokens, so a numeric-headed CSV like
    * "2023,2024\n..." parses as the scalar 2023 — Python raises "Extra
    * data" there) falls back to CSV; well-formed JSON of the wrong shape
    * (an array of scalars) is a real error, not CSV. */
  private def readObjects(path: String): Seq[Map[String, Any]] = {
    val text =
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    val parsed =
      try Some(graft.ingest.Flatten.parseJson(text))
      catch { case _: com.fasterxml.jackson.core.JacksonException => None }
    // RFC-4180 record tokenizer with csv.DictReader semantics: the quote
    // char is special only at FIELD START; quoted fields may contain
    // commas, doubled quotes, and embedded newlines; blank lines skip.
    // Two knowing divergences from csv.DictReader on MALFORMED input
    // (well-formed files are identical): (1) rows wider than the header
    // drop the extra fields — DictReader piles them into restkey (None),
    // which the dict-of-columns load contract has no column for anyway;
    // (2) a lone \r inside an unquoted field terminates the row —
    // DictReader in default newline handling keeps it as field text
    def parseCsv(t: String): Seq[Seq[String]] = {
      val rows = Seq.newBuilder[Seq[String]]
      var fields = Seq.newBuilder[String]
      val sb = new StringBuilder
      var inQ = false
      var fieldStart = true
      var sawAny = false
      var i = 0
      def endField(): Unit = { fields += sb.result(); sb.clear(); fieldStart = true }
      def endRow(): Unit = {
        endField(); rows += fields.result(); fields = Seq.newBuilder; sawAny = false
      }
      while (i < t.length) {
        val ch = t.charAt(i)
        if (inQ) {
          if (ch == '"') {
            if (i + 1 < t.length && t.charAt(i + 1) == '"') { sb.append('"'); i += 1 }
            else inQ = false
          } else sb.append(ch)
        } else ch match {
          case '"' if fieldStart => inQ = true; fieldStart = false; sawAny = true
          case ','               => endField(); sawAny = true
          case '\r' =>
            if (i + 1 < t.length && t.charAt(i + 1) == '\n') i += 1
            if (sawAny || sb.nonEmpty) endRow()
          case '\n' => if (sawAny || sb.nonEmpty) endRow()
          case c    => sb.append(c); fieldStart = false; sawAny = true
        }
        i += 1
      }
      if (sawAny || sb.nonEmpty) endRow()
      rows.result()
    }
    def csv(): Seq[Map[String, Any]] = {
      val rows = parseCsv(text)
      if (rows.isEmpty)
        throw new IllegalArgumentException(s"load: $path is empty")
      val hdr = rows.head
      // rows with fewer fields than the header map the missing keys to null
      // (csv.DictReader's restval=None); extra fields are dropped
      rows.tail.map { vals =>
        hdr.zipWithIndex
          .map { case (h, i) => h -> (if (i < vals.length) vals(i) else null) }
          .toMap[String, Any]
      }
    }
    parsed match {
      case Some(s: Seq[_]) =>
        if (!s.forall(_.isInstanceOf[Map[_, _]]))
          throw new IllegalArgumentException(
            "load: expected a JSON array of objects, found non-object elements")
        s.map(_.asInstanceOf[Map[String, Any]])
      case Some(m: Map[_, _]) => Seq(m.asInstanceOf[Map[String, Any]])
      case _                  => csv() // parse error or scalar-with-trailing-garbage
    }
  }

  /** Which --options each command defines (reference cli.py). Any other
    * command passes leading-dash arguments through as positional data (a
    * file literally named `--x` must reach cache/convert), and an
    * unrecognized --option on an option-taking command is a usage error,
    * not a silent drop. */
  private val knownOpts: Map[String, Set[String]] = Map(
    "lookup" -> Set("--columns", "--limit"),
    "load" -> Set("--sco-type", "--query-id", "--preserve-ids"))

  /** Interactive-safety cap on `lookup` output: an unbounded lookup of a
    * huge view would fetchall into the driver (the reference CLI does too,
    * cli.py lookup -> fetchall; this engine's views can be far larger).
    * Override per call with --limit=N; --limit=0 means unlimited. */
  private val DefaultLookupLimit = 1000

  def run(spark: SparkSession, args: Seq[String]): Unit = {
    if (args.length < 2) usage()
    val s = new Storage(spark, args(0))
    val cmd = args(1)
    val (opts, rest) = knownOpts.get(cmd) match {
      case Some(valid) =>
        val (o, r) = args.drop(2).partition(_.startsWith("--"))
        o.foreach { raw =>
          val name = raw.takeWhile(_ != '=')
          if (!valid(name)) {
            System.err.println(s"unknown option for $cmd: $name")
            usage()
          }
          // a bare known flag would pass validation but never match opt()'s
          // '=' form — error instead of silently ignoring the user's flag
          if (!raw.contains('=')) {
            System.err.println(s"option $name requires =value")
            usage()
          }
        }
        (o, r)
      case None => (Seq.empty[String], args.drop(2))
    }
    def opt(name: String): Option[String] =
      opts.collectFirst { case o if o.startsWith(s"$name=") => o.stripPrefix(s"$name=") }
    val columns = opt("--columns").map(_.split(',').toSeq).getOrElse(Nil)

    def printRows(rows: Seq[Map[String, Any]]): Unit =
      rows.foreach(r => println(StixId.canonicalJson(r.map { case (k, v) =>
        k -> (v match { case null => null; case x: java.lang.Number => x; case x => x.toString })
      })))

    cmd match {
      case "cache"   => s.cache(rest.head, rest.tail)
      case "extract" => s.extract(rest(0), rest(1), rest(2), if (rest.length > 3) rest(3) else null)
      case "filter"  => s.filter(rest(0), rest(1), rest(2), rest(3))
      case "assign" =>
        s.assign(rest(0), rest(1), rest(2), rest(3),
          asc = !rest.lift(4).contains("desc"),
          limit = rest.lift(5).map(_.toInt))
      case "join"   => s.join(rest(0), rest(1), rest(2), rest(3), rest(4))
      case "lookup" =>
        // positional limit (reference arg order) beats --limit beats the
        // 1000-row interactive default; 0 = unlimited
        val limit = rest.lift(1).map(_.toInt)
          .orElse(opt("--limit").map(_.toInt))
          .getOrElse(DefaultLookupLimit)
        printRows(s.lookup(rest.head,
          cols = columns,
          limit = Some(limit).filter(_ > 0),
          offset = rest.lift(2).map(_.toInt).getOrElse(0)))
      case "values"  => s.values(rest(0), rest(1)).foreach(println)
      case "tables"  => s.tables().foreach(println)
      case "types"   => s.types().foreach(println)
      case "views"   => s.views().foreach(println)
      case "viewdata" => printRows(s.getViewData(rest))
      case "columns" => s.columns(rest.head).foreach(println)
      case "type"    => println(s.tableType(rest.head).getOrElse(""))
      case "schema"  => s.schema(rest.head).foreach { case (n, t) => println(s"$n\t$t") }
      case "count"   => println(s.count(rest.head))
      case "set-appdata" => s.setAppdata(rest(0), rest(1))
      case "get-appdata" => println(s.getAppdata(rest.head).getOrElse(""))
      case "merge"   => s.merge(rest.head, rest.tail)
      case "delete"  => s.delete()
      // splint convert: log file -> STIX bundle JSON on stdout (optionally
      // cache it directly with a query id as the 2nd arg)
      case "convert" =>
        val bundle = graft.ingest.LogMapper.convert(rest.head)
        rest.lift(1) match {
          case Some(qid) => s.cache(qid, Seq(bundle))
          case None      => println(bundle)
        }
      case "remove"  => s.removeView(rest.head)
      case "rename"  => s.renameView(rest(0), rest(1))
      // reproducibility pins: snapshot a table's current state by name,
      // list pins, read a pin (bounded like lookup), drop a pin. A
      // comma-separated table list pins a MULTI-TABLE consistent cut
      // (all leases held at once, one journal entry).
      case "snapshot" =>
        if (rest(0).contains(","))
          s.snapshot(rest(0).split(',').toSeq.map(_.trim).filter(_.nonEmpty), rest(1))
        else s.snapshot(rest(0), rest(1))
      case "snapshots"     => s.snapshots(rest.head).foreach(println)
      case "drop-snapshot" => s.dropSnapshot(rest(0), rest(1))
      case "read-snapshot" =>
        val limit = rest.lift(2).map(_.toInt).getOrElse(DefaultLookupLimit)
        val df = s.readSnapshot(rest(0), rest(1))
        (if (limit > 0) df.limit(limit) else df)
          .toJSON.toLocalIterator().forEachRemaining(println(_))
      case "value-counts" =>
        s.valueCounts(rest(0), rest(1)).foreach { case (v, n) => println(s"$v\t$n") }
      case "number-observed" =>
        println(s.numberObserved(rest(0), rest(1), rest.lift(2).orNull))
      case "summary" =>
        val (f, l, n) = s.summary(rest.head, rest.lift(1).orNull, rest.lift(2).orNull)
        println(s"first_observed\t$f")
        println(s"last_observed\t$l")
        println(s"number_observed\t$n")
      case "timestamped" =>
        val df = s.timestamped(rest.head, rest.lift(1).orNull, rest.lift(2).orNull)
        // stream partitions through the driver one at a time instead of
        // materializing the whole result (collect) — timestamped output is
        // observation-sized and unbounded
        df.toJSON.toLocalIterator().forEachRemaining(println(_))
      // validated SQL passthrough (reference cli.py:229-235 runs raw SQL;
      // here every workdir table + view registers as a temp view — dashes
      // become underscores, e.g. network_traffic — and only read-only
      // SELECT/WITH statements run)
      case "sql" =>
        val stmt = rest.mkString(" ").trim
        // read-only guard on the PARSED plan, not the first keyword: a
        // "WITH ... INSERT ..." statement starts with WITH but parses to a
        // Command — reject anything that isn't a pure query
        val parsed =
          try spark.sessionState.sqlParser.parsePlan(stmt)
          catch {
            case e: Exception =>
              System.err.println(s"sql: parse error: ${e.getMessage}")
              sys.exit(2)
          }
        val writes = parsed.collectFirst {
          // Command covers DDL + INSERT OVERWRITE DIRECTORY; ParsedStatement
          // covers INSERT INTO et al. (they parse as statements, not queries)
          case p: org.apache.spark.sql.catalyst.plans.logical.Command          => p
          case p: org.apache.spark.sql.catalyst.plans.logical.ParsedStatement  => p
        }
        if (writes.nonEmpty) {
          System.err.println("sql: only read-only SELECT/WITH statements are allowed")
          sys.exit(2)
        }
        // the engine's scalar surface (in_subnet/match_bin/like_bin/...)
        // as SQL functions, same as the reference registers them on every
        // host-DB connection (sqlitestorage.py:54-87)
        graft.functions.GraftExtensions.install(spark)
        // register, run, then DROP the temp views: on a shared SparkSession
        // driving multiple workdirs, a view left behind for workdir A could
        // silently serve a later `sql` against workdir B for any table name
        // B lacks
        val registered = (graft.ingest.UpsertWriter.tables(s.workDir) ++ s.views()).distinct
          .flatMap { tbl =>
            try {
              val v = tbl.replaceAll("[^A-Za-z0-9_]", "_")
              s.catalog.resolve(tbl).createOrReplaceTempView(v)
              Some(v)
            } catch { case _: Exception => None }
          }
        try spark.sql(stmt).toJSON.collect().foreach(println)
        finally registered.foreach(spark.catalog.dropTempView(_))
      // load a JSON array (or headered CSV) of SCO dicts as a view
      // (cli.py:258-273)
      case "load" =>
        val objs = readObjects(rest(1))
        s.load(rest(0), objs, opt("--sco-type").getOrElse(""),
          opt("--query-id").orNull,
          opt("--preserve-ids").forall(_.toBoolean))
      case "reassign" => s.reassign(rest(0), readObjects(rest(1)))
      // splint bundle transforms (splint.py:50-221): result bundle on stdout
      case "splint" =>
        import graft.ingest.BundleUtil
        def bundleArg(i: Int): BundleUtil.Obj =
          graft.ingest.Flatten.parseJson(
            new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(rest(i))), "UTF-8")
          ).asInstanceOf[Map[String, Any]]
        val out = rest.head match {
          case "randomize-ids" => BundleUtil.randomizeIds(bundleArg(1))
          case "dedup-ids"     => BundleUtil.dedupIds(bundleArg(1))
          case "upgrade"       => BundleUtil.upgrade(bundleArg(1))
          case "limit"         => BundleUtil.limit(bundleArg(2), rest(1).toInt)
          case "timeshift"     => BundleUtil.timeshift(bundleArg(1), rest(2), rest(3))
          case _               => usage()
        }
        println(StixId.canonicalJson(out))
      case _ => usage()
    }
  }
}
