package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Schemas are fixed by the generator; we read them as-is (parquet is
  * self-describing) and rely on Catalyst column pruning + filter pushdown
  * reaching the scan. At 100 TB these would be partitioned/bucketed dirs;
  * the API shape (dir + logical name) stays the same.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Collision-safe tag for scratch/staging paths derived from a data
    * dir: basename for readability + a hash of the full path so two
    * dirs with the same basename never share staging state. */
  def dirTag(dir: String): String = {
    val norm = java.nio.file.Paths.get(dir).toAbsolutePath.normalize.toString
    val base = norm.split('/').last.replaceAll("[^A-Za-z0-9.]", "_")
    f"${base}_${math.abs(norm.hashCode)}%08x"
  }

  /** The scale factor the driver's DuckDB-oracle correctness gate runs
    * at (TESTDATA.md): oracle SQL that references side-files uses this
    * dir's tag. */
  val VerifySfDir = "/root/testdata/sf0.01"

  /** Root for gate scratch and derived artifacts. A co-tenant /tmp
    * sweeper reclaimed mid-session artifacts in a past round and
    * poisoned a bench attempt with first-touch rebuilds, so the root is
    * configurable: `graft.scratch` system property (in-JVM tests), then
    * `GRAFT_SCRATCH` env (forked JVMs inherit sbt's env), default
    * `/tmp`. Every gate path, side file, soak fixture, and
    * oracle-SQL-embedded path derives from this ONE function, so the
    * Spark side and the DuckDB oracle always resolve the same files. */
  def scratchRoot: String = {
    val r = sys.props.get("graft.scratch")
      .orElse(sys.env.get("GRAFT_SCRATCH"))
      .filter(_.nonEmpty).getOrElse("/tmp").stripSuffix("/")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(r))
    r
  }

  /** Fingerprint component derived from the COMPILED code of `cls`
    * (classfile bytes' SHA-256, truncated): folded into derived-artifact
    * fingerprints whose params tag alone would go stale when the
    * derivation code is edited without a version-tag bump — the
    * artifact then rebuilds on any recompile of the deriving object,
    * which errs in the safe (rebuild) direction. Falls back to a
    * constant when the classfile isn't resource-resolvable (never the
    * case under sbt classes dirs or assembly jars). */
  def codeFingerprint(cls: Class[_]): String = {
    val res = cls.getName.replace('.', '/') + ".class"
    val in = cls.getClassLoader.getResourceAsStream(res)
    if (in == null) "nocode"
    else try {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { md.update(buf, 0, n); n = in.read(buf) }
      md.digest().map("%02x".format(_)).mkString.take(16)
    } finally in.close()
  }

  /** Fingerprint of the ENTIRE compiled graft codebase: every classfile
    * under this class's code-source location (relpath:size:mtime), or
    * the enclosing jar's size:mtime. Folded into sourceFingerprint so a
    * code edit to ANY derivation (including helper expressions in other
    * files) invalidates cached derived artifacts without requiring a
    * manual version-tag bump — coarser than strictly necessary, but it
    * errs in the safe (rebuild) direction, and within one Verify/Bench
    * run the value is stable so build-once reuse is unaffected. */
  lazy val codebaseFingerprint: String = {
    import java.nio.file.{Files, Paths}
    val loc = getClass.getProtectionDomain.getCodeSource
    if (loc == null || loc.getLocation == null) "nocodesource"
    else {
      val root = Paths.get(loc.getLocation.toURI)
      val parts = scala.collection.mutable.ArrayBuffer[String]()
      if (Files.isDirectory(root)) {
        val stream = Files.walk(root)
        try stream.sorted().forEach { p =>
          if (Files.isRegularFile(p) && p.toString.endsWith(".class"))
            parts += s"${root.relativize(p)}:${Files.size(p)}:" +
              s"${Files.getLastModifiedTime(p).toMillis}"
        } finally stream.close()
      } else if (Files.exists(root))
        parts += s"${root.getFileName}:${Files.size(root)}:" +
          s"${Files.getLastModifiedTime(root).toMillis}"
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.digest(parts.mkString("\n").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
    }
  }

  /** Content fingerprint of a source parquet file/dir plus a
    * caller-supplied params tag: every regular file's relative path,
    * size, and mtime. Derived-artifact freshness keys on this instead
    * of a bare mtime comparison — a fixture regenerated within one
    * mtime-granularity tick still changes size, and a change to the
    * derivation's parameters (band count, hash seed, dump version)
    * changes the tag, so neither can silently serve a stale artifact.
    *
    * Contract limitation (inherited by EVERY caller): by default a
    * same-SIZE, timestamp-preserving content swap of a source file is
    * invisible — detecting that needs a content hash, i.e. a full
    * source read per freshness check. Callers whose sources can be
    * rewritten in place with `cp -p`-style mtime preservation either
    * bump the params tag (or delete the derived dir), or opt into
    * content mode: `graft.fp.content` sysprop / `GRAFT_FP_CONTENT`
    * env = "1" folds each regular file's SHA-256 into the
    * fingerprint — one extra sequential read of every source per
    * freshness check, the honest price of closing the gap. */
  def sourceFingerprint(sources: Seq[java.nio.file.Path],
      params: String): String = {
    import java.nio.file.Files
    val contentMode = sys.props.get("graft.fp.content")
      .orElse(sys.env.get("GRAFT_FP_CONTENT")).contains("1")
    def fileHash(p: java.nio.file.Path): String =
      if (!contentMode) ""
      else {
        val md = java.security.MessageDigest.getInstance("SHA-256")
        val in = Files.newInputStream(p)
        try {
          val buf = new Array[Byte](1 << 16)
          var n = in.read(buf)
          while (n > 0) { md.update(buf, 0, n); n = in.read(buf) }
        } finally in.close()
        ":" + md.digest().map("%02x".format(_)).mkString.take(16)
      }
    val parts =
      scala.collection.mutable.ArrayBuffer[String](params, codebaseFingerprint)
    sources.foreach { src =>
      if (Files.isDirectory(src)) {
        val stream = Files.walk(src)
        try stream.sorted().forEach { p =>
          if (Files.isRegularFile(p))
            parts += s"${src.relativize(p)}:${Files.size(p)}:" +
              s"${Files.getLastModifiedTime(p).toMillis}${fileHash(p)}"
        } finally stream.close()
      } else if (Files.exists(src))
        parts += s"${src.getFileName}:${Files.size(src)}:" +
          s"${Files.getLastModifiedTime(src).toMillis}${fileHash(src)}"
      else parts += s"${src.getFileName}:missing"
    }
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(parts.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Build-once guard for a derived artifact dir: rebuild when the
    * recorded fingerprint differs from the current one (or the build
    * never completed — the marker is written only after `build`).
    *
    * Concurrency: two sessions/threads racing a COLD cache must not
    * interleave writes into the same dir (an overwrite-mode Spark
    * write torn by a second writer leaves a mix of both builds). The
    * build section is serialized by an O_EXCL sibling lock file — the
    * SnapshotSwap commit-lock discipline — with the freshness check
    * repeated INSIDE the lock, so the race's loser finds the winner's
    * marker and returns without building; both read one consistent
    * artifact. A crashed builder's lock is broken after 10 minutes
    * (all ensureDerived builds are seconds-to-a-minute; the soak
    * fixtures use their own _DONE markers). */
  def ensureDerived(dir: String, fingerprint: String)(
      build: => Unit): String = {
    import java.nio.file.{Files, Paths}
    val marker = Paths.get(dir, "_GRAFT_FINGERPRINT")
    def fresh = Files.exists(marker) &&
      Files.readString(marker).trim == fingerprint
    if (fresh) return dir
    val lock = Paths.get(s"$dir._build_lock")
    if (lock.getParent != null) Files.createDirectories(lock.getParent)
    var acquired = false
    var tries = 0
    while (!acquired) {
      try { Files.createFile(lock); acquired = true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          try {
            val age = System.currentTimeMillis() -
              Files.getLastModifiedTime(lock).toMillis
            if (age > 600000L) Files.deleteIfExists(lock)
          } catch { case _: java.nio.file.NoSuchFileException => () }
          tries += 1
          if (tries > 24000) sys.error(
            s"derived-artifact build lock stuck: $lock")
          Thread.sleep(50)
      }
    }
    try {
      if (!fresh) { // double-check: the lock's previous holder built it
        build
        Files.writeString(marker, fingerprint)
      }
    } finally Files.deleteIfExists(lock)
    dir
  }

  val all = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Fixture generations differ in the `ts` physical type:
    * TIMESTAMP(NANOS) (which Spark's parquet reader rejects unless read
    * nanos-as-long, then truncated to micros — the same truncation
    * DuckDB's CAST(ts AS TIMESTAMP) applies) vs TIMESTAMP(MICROS)
    * (read natively as TIMESTAMP_NTZ). Both normalize to a
    * session-TZ-UTC TimestampType column with identical values. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // The NTZ->timestamp cast below is instant-preserving only when the
    // session zone is UTC (every graft session builder pins it); a
    // non-UTC caller would get silently shifted instants on the MICROS
    // fixture generation but not the NANOS one — fail loudly instead.
    require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
      "Tables.events requires spark.sql.session.timeZone=UTC for " +
        "fixture-generation-independent instants")
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val raw = spark.read.parquet(s"$dir/events.parquet")
      import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}
      raw.schema("ts").dataType match {
        case LongType =>
          // NANOS generation read nanos-as-long. Integer div, not /:
          // true division returns double and rounds the microsecond up,
          // diverging from truncating casts.
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          // MICROS fixture, already truncated at write time; the cast
          // from NTZ reinterprets the wall clock in the session TZ
          // (UTC, required above), matching timestamp_micros' instant.
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case TimestampType => raw // already instant-typed; no-op
        case other => throw new IllegalStateException(
          s"events.parquet ts has unexpected type $other; expected " +
            "INT64 (nanos-as-long), TIMESTAMP_NTZ (micros) or TIMESTAMP")
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  /** Register every table as a temp view so `spark.sql` works over the
    * synced catalog — the Spark analogue of the reference's execute_sql
    * passthrough (reference: collect_plugins.py:220-228). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { n =>
      val df = if (n == "events") events(spark, dir) else t(spark, dir, n)
      df.createOrReplaceTempView(n)
    }

  /** SQL passthrough with bind variables (P16): the reference's
    * execute_sql forwards bind params to the target DBAPI
    * (collect_plugins.py:220-228, exercised with
    * `{"parallel": parallel}` in its own tests); Spark's parameterized
    * SQL (named markers `:name`) is the same contract — values bind as
    * typed literals, never string-spliced, so injection through a bind
    * is impossible. */
  def executeSql(spark: SparkSession, sql: String,
      binds: Map[String, Any] = Map.empty): DataFrame =
    if (binds.isEmpty) spark.sql(sql) else spark.sql(sql, binds)
}
