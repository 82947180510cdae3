package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.BloomBitsetAgg

/** File-level data-skipping index: a per-file stats manifest (row count,
  * min/max per range column, Bloom bitset per equality column) stored
  * beside the data, plus a reader that prunes the file list against a
  * predicate BEFORE the scan is planned.
  *
  * Parquet footers already carry min/max, but the scan still has to open
  * every footer — at 100 TB that is millions of S3 GETs per query before a
  * single row is read. A manifest collapses that to ONE metadata read,
  * which is exactly the trade Delta/Iceberg/Hudi make with their stats
  * manifests; this is the engine-native version for plain parquet layouts
  * (`writeRangeLayout` / `writeZOrderLayout` make the min/max rectangles
  * tight; the manifest makes them reachable without touching the files).
  * Bloom bitsets extend the same trick to point predicates on high-
  * cardinality keys, where min/max spans are useless.
  *
  * Safety contract (pinned in StatsManifestSpec): pruning NEVER loses
  * rows — a data file with no manifest row is always read (stale or
  * partial manifest degrades to a full scan of the unknown files, never to
  * silent data loss), and `readPruned` re-applies the row-level predicate
  * so the result equals the unpruned filter exactly.
  *
  * Reference analogue: the reference's caches answer "what changed since"
  * from a tiny metadata file instead of rescanning the archive
  * (common/cache.py:36); this generalizes that idea to arbitrary
  * range/point predicates over a parquet layout.
  */
object StatsManifest {

  /** Manifest location: an underscore-prefixed sibling directory, which
    * Spark's file listing treats as hidden — data reads never see it. */
  def statsDir(path: String): String = s"$path/_graft_stats"

  /** Row-local Bloom bit positions for value `c`: Kirsch-Mitzenmacher
    * double hashing (pos_i = h1 + i*h2 mod numBits) over two codegen'd
    * xxhash64 evaluations. NULL values yield a NULL array — NULL is not a
    * value an equality predicate can match, so it sets no bits. The SAME
    * expression computes probe positions at prune time, so build and probe
    * can never disagree on the hash. */
  def bloomPositions(c: Column, numBits: Int, numHashes: Int): Column = {
    require(numHashes >= 1 && numHashes <= 16, s"need 1 <= numHashes <= 16, got $numHashes")
    // reduce each hash mod numBits BEFORE combining: (h1 + i*h2) mod n ==
    // ((h1 mod n) + i*(h2 mod n)) mod n, and the reduced form cannot
    // overflow a long under ANSI arithmetic (numHashes*numBits << 2^63)
    val h1 = pmod(xxhash64(c), lit(numBits.toLong))
    val h2 = pmod(xxhash64(lit(0x9E3779B97F4A7C15L), c), lit(numBits.toLong))
    when(c.isNotNull,
      array((0 until numHashes).map(i => pmod(h1 + lit(i.toLong) * h2, lit(numBits.toLong))): _*))
  }

  /** Build (or rebuild) the stats manifest for the parquet table at `path`:
    * one row per data file with `n_rows`, `min_<c>`/`max_<c>` for each
    * range column, and `bloom_<c>` (array<long> words) for each Bloom
    * column. One distributed pass over the data, grouped on
    * `input_file_name()` — the shuffle carries one bounded row per file.
    *
    * Sizing `bloomBits` (per-file bitset width): aim for ~14 bits per
    * DISTINCT key per file (~0.1% false positives at 5 hashes); a
    * saturated bloom (most bits set) never rules anything out and the
    * column silently stops pruning. The default 2^20 bits = 128 KiB per
    * file per column serves up to ~75k distinct keys/file; each manifest
    * row records `bloom_fill_<c>` (fraction of bits set — measured, so a
    * mis-sized index is visible: fill above ~0.5 means size up). */
  def build(spark: SparkSession, path: String,
            rangeCols: Seq[String], bloomCols: Seq[String] = Nil,
            bloomBits: Int = 1 << 20, bloomHashes: Int = 5): Unit =
    statsRows(spark.read.parquet(path), rangeCols, bloomCols, bloomBits, bloomHashes)
      .repartition(1) // metadata output: one row per data file
      .write.mode("overwrite").parquet(statsDir(path))

  /** The one per-file stats aggregation (build and update share it). */
  private def statsRows(df: DataFrame, rangeCols: Seq[String], bloomCols: Seq[String],
                        bloomBits: Int, bloomHashes: Int): DataFrame = {
    val rangeAggs = rangeCols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    }
    val bloomAggs = bloomCols.map { c =>
      BloomBitsetAgg.bloomBitset(bloomPositions(col(c), bloomBits, bloomHashes), bloomBits)
        .as(s"bloom_$c")
    }
    val aggs = (count(lit(1)).as("n_rows") +: (rangeAggs ++ bloomAggs))
    val fills = bloomCols.map { c =>
      (d: DataFrame) => d.withColumn(s"bloom_fill_$c",
        aggregate(col(s"bloom_$c"), lit(0L), (acc, w) => acc + bit_count(w).cast("long"))
          .cast("double") / lit(bloomBits.toDouble))
    }
    fills.foldLeft(
      df.groupBy(input_file_name().as("file")).agg(aggs.head, aggs.tail: _*)
    )((d, f) => f(d))
      .withColumn("bloom_bits", lit(bloomBits))
      .withColumn("bloom_hashes", lit(bloomHashes))
  }

  /** Incrementally extend the manifest: aggregate ONLY data files that
    * have no manifest row yet (the batch appended since the last build)
    * and union them in, dropping rows for files that no longer exist
    * (compacted/vacuumed away). The always-on shape: update cost is bound
    * by the new batch, never the archive — a full `build` pays the whole
    * table again. Bloom parameters are taken from the existing manifest so
    * old and new rows stay probe-compatible; with no existing manifest
    * this IS `build`. Stats columns are inferred from the existing
    * manifest's schema (`min_<c>`/`bloom_<c>` columns), so callers cannot
    * accidentally extend with a different column set. */
  def update(spark: SparkSession, path: String): Unit = {
    val sd = new Path(statsDir(path))
    val fs = sd.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(sd),
      s"no manifest at ${statsDir(path)} — run build() first (update() infers its config from it)")
    val m = spark.read.parquet(statsDir(path)).localCheckpoint() // pre-read: we overwrite below
    val rangeCols = m.columns.filter(_.startsWith("min_")).map(_.stripPrefix("min_")).toSeq
    val bloomCols = m.columns.filter(_.startsWith("bloom_"))
      .filterNot(c => c == "bloom_bits" || c == "bloom_hashes" || c.startsWith("bloom_fill_"))
      .map(_.stripPrefix("bloom_")).toSeq
    val headRows = m.select("bloom_bits", "bloom_hashes").head(1)
    val (bits, hashes) =
      if (headRows.isEmpty) (1 << 20, 5) else (headRows(0).getInt(0), headRows(0).getInt(1))

    val actual = listDataFiles(spark, path)
    val actualNorm = actual.map(normalize).toSet
    val manifestFiles = m.select("file").collect().map(_.getString(0))
    val knownNorm = manifestFiles.map(normalize).toSet
    val newFiles = actual.filterNot(f => knownNorm.contains(normalize(f)))
    // keep only rows whose file still exists (rows are keyed by the
    // input_file_name rendering; compare scheme-normalized, driver-side —
    // both lists are file-count-bounded metadata)
    val surviving = manifestFiles.filter(f => actualNorm.contains(normalize(f))).toSeq
    val survivors =
      if (surviving.isEmpty) m.where(lit(false)) else m.where(col("file").isin(surviving: _*))
    val merged =
      if (newFiles.isEmpty) survivors
      else survivors.unionByName(
        // basePath: partition columns must be visible to the stats
        // aggregation for hive-partitioned layouts (else their min/max
        // would record NULL and range pruning could wrongly drop files)
        statsRows(spark.read.option("basePath", path).parquet(newFiles: _*),
          rangeCols, bloomCols, bits, hashes))
    merged.repartition(1).write.mode("overwrite").parquet(statsDir(path))
  }

  /** Strip the URI scheme so `input_file_name()` URIs and Hadoop listing
    * paths compare equal regardless of `file:` / `file://` rendering. */
  private def normalize(p: String): String = new Path(p).toUri.getPath

  /** Non-hidden parquet data files under `path` (recursing into non-hidden
    * subdirectories, mirroring Spark's own listing rule). */
  private def listDataFiles(spark: SparkSession, path: String): Seq[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def visible(p: Path): Boolean =
      !p.getName.startsWith("_") && !p.getName.startsWith(".")
    def walk(p: Path): Seq[String] =
      fs.listStatus(p).toSeq.filter(s => visible(s.getPath)).flatMap { s =>
        if (s.isDirectory) walk(s.getPath)
        else if (s.getPath.getName.endsWith(".parquet")) Seq(s.getPath.toString)
        else Nil
      }
    walk(root)
  }

  /** Evaluate the (literal-only) probe value's Bloom positions: one
    * single-row local select (Spark 4 Columns are unresolved nodes, so a
    * direct expression eval is unavailable) — a trivial local-relation
    * job, not a data scan. */
  private def probePositions(spark: SparkSession, value: Column,
                             bits: Int, hashes: Int): Seq[Long] = {
    val row = spark.range(1).select(bloomPositions(value, bits, hashes).as("p")).head()
    require(!row.isNullAt(0), "Bloom equality probes require a non-null literal value")
    row.getSeq[Long](0)
  }

  /** Candidate data files for a conjunction of predicates, decided from the
    * manifest alone (one tiny metadata read, zero data-file opens):
    *   - `ranges`: (column, lo, hi) — keep files whose [min, max] interval
    *     overlaps [lo, hi];
    *   - `equalities`: (column, literal) — keep files whose Bloom bitset
    *     might contain the value (and whose min/max interval contains it,
    *     when the column has range stats too).
    * Files absent from the manifest are always kept; manifest rows whose
    * file no longer exists are dropped. With no manifest, returns every
    * data file (pruning degrades to a full scan, never loses rows). */
  def prunedFiles(spark: SparkSession, path: String,
                  ranges: Seq[(String, Column, Column)],
                  equalities: Seq[(String, Column)] = Nil): Seq[String] = {
    val actual = listDataFiles(spark, path)
    val sd = new Path(statsDir(path))
    val fs = sd.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(sd)) return actual

    val m = spark.read.parquet(statsDir(path))
    val cols = m.columns.toSet
    val headRows = m.select("bloom_bits", "bloom_hashes").head(1)
    if (headRows.isEmpty) return actual // empty manifest: nothing to prune with
    val head = headRows(0)
    val (bits, hashes) = (head.getInt(0), head.getInt(1))

    val rangeKeep = ranges.map { case (c, lo, hi) =>
      require(cols.contains(s"min_$c"), s"manifest at ${statsDir(path)} has no range stats for '$c'")
      col(s"max_$c") >= lo && col(s"min_$c") <= hi
    }
    val eqKeep = equalities.map { case (c, v) =>
      val bloomTest = if (cols.contains(s"bloom_$c")) {
        probePositions(spark, v, bits, hashes).map { p =>
          // all masks are driver literals: word p/64 (1-based element_at),
          // bit p%64 — a clear bit anywhere proves the value is absent
          element_at(col(s"bloom_$c"), (p / 64).toInt + 1)
            .bitwiseAND(lit(1L << (p % 64))) =!= lit(0L)
        }.reduce(_ && _)
      } else lit(true)
      val rangeTest =
        if (cols.contains(s"min_$c")) v >= col(s"min_$c") && v <= col(s"max_$c") else lit(true)
      require(cols.contains(s"bloom_$c") || cols.contains(s"min_$c"),
        s"manifest at ${statsDir(path)} has no stats for '$c'")
      bloomTest && rangeTest
    }
    val keep = (rangeKeep ++ eqKeep).foldLeft(lit(true))(_ && _)

    val kept = m.where(keep).select("file").collect().map(r => normalize(r.getString(0))).toSet
    val known = m.select("file").collect().map(r => normalize(r.getString(0))).toSet
    // unknown-to-the-manifest files are ALWAYS read; stale manifest rows
    // (file since compacted away) are ignored via the intersection
    actual.filter(f => { val n = normalize(f); kept.contains(n) || !known.contains(n) })
  }

  /** Read `path` with file-level pruning AND the row-level predicate
    * applied: the result is exactly `spark.read.parquet(path).where(pred)`,
    * computed by scanning only the candidate files. */
  def readPruned(spark: SparkSession, path: String,
                 ranges: Seq[(String, Column, Column)],
                 equalities: Seq[(String, Column)] = Nil): DataFrame = {
    val rowPred = (
      ranges.map { case (c, lo, hi) => col(c) >= lo && col(c) <= hi } ++
      equalities.map { case (c, v) => col(c) === v }
    ).foldLeft(lit(true))(_ && _)
    val files = prunedFiles(spark, path, ranges, equalities)
    if (files.isEmpty) spark.read.parquet(path).where(lit(false))
    // basePath keeps hive-partitioned layouts correct: partition columns
    // are derived from the leaf-file paths even though only an explicit
    // file list is read (without it they'd silently read as NULL)
    else spark.read.option("basePath", path)
      .schema(spark.read.parquet(path).schema)
      .parquet(files: _*).where(rowPred)
  }
}
