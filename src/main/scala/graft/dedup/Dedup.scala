package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFeatures

/** Deduplication family for LLM training-data pipelines.
  *
  * Design for 100 TB (SURVEY.md §5): every method is hash-partitioned on a
  * content key (never a global sort, never n² over the corpus):
  *  - exact: single groupBy on a content hash;
  *  - minhash-LSH: candidate pairs only emerge from shared band buckets;
  *  - ngram-Jaccard: pairs only from shared-shingle buckets (and the caller
  *    bounds the left side or feeds LSH candidates);
  *  - fingerprints (bottom-k) reduce each doc to a constant-size sketch.
  *
  * Hash functions are md5-based so the DuckDB oracle can reproduce every
  * signature byte-for-byte (no engine-private hash).
  */
object Dedup {

  /** Exact dedup: group by full-content hash; emit group size and the id to
    * keep (minimum). The output IS the dedup decision table.
    */
  def exact(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(md5(text).as("text_hash"))
      .agg(count(lit(1)).as("n_dups"), min(id).as("keep_id"))

  /** Bottom-k sketch fingerprint over word n-gram shingles (winnowing-style):
    * the k lexicographically-smallest shingle hashes, joined. Documents with
    * equal fingerprints are near-dup candidates.
    */
  def bottomKFingerprint(df: DataFrame, id: Column, text: Column, n: Int, k: Int): DataFrame =
    df.select(id.as("doc_id"), explode(TextFeatures.shingles(text, n)).as("sh"))
      .distinct()
      .groupBy(col("doc_id"))
      .agg(array_join(slice(array_sort(collect_set(md5(col("sh")))), 1, k), ";").as("fingerprint"))

  /** MinHash signatures: numPerms md5-permutations, each the lexicographic
    * min over the document's distinct shingles of md5("<p>:<shingle>").
    * One explode + one groupBy with numPerms min-aggregates — a single
    * shuffle on doc id.
    */
  def minhashSignatures(df: DataFrame, id: Column, text: Column, n: Int, numPerms: Int): DataFrame = {
    val exploded = df
      .select(id.as("doc_id"), explode(TextFeatures.shingles(text, n)).as("sh"))
      .distinct()
    val sigAggs = (0 until numPerms).map(p =>
      min(md5(concat(lit(s"$p:"), col("sh")))).as(s"sig_$p"))
    exploded.groupBy(col("doc_id")).agg(sigAggs.head, sigAggs.tail: _*)
  }

  /** LSH candidate pairs: split the signature into bands of `bandSize` rows;
    * two documents sharing any full band are candidates. Pairs come from a
    * self-join on (band_id, band_key) — i.e. only within hash buckets, never
    * a cross join. Returns distinct (doc_a, doc_b) with doc_a < doc_b.
    */
  def lshCandidatePairs(signatures: DataFrame, numPerms: Int, bandSize: Int): DataFrame = {
    require(numPerms % bandSize == 0)
    val numBands = numPerms / bandSize
    val bandStructs = (0 until numBands).map { b =>
      val keyCols = (0 until bandSize).map(i => col(s"sig_${b * bandSize + i}"))
      struct(lit(b).as("band"), concat_ws("|", keyCols: _*).as("bk"))
    }
    val banded = signatures
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.bk").as("bk"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** 32-bit SimHash as a bit-string: each distinct token votes its md5 bits
    * (+1/-1) per position; the sign of the per-position sum is the hash bit.
    * Emitted as a 32-char '0'/'1' string so the oracle can reproduce it
    * without engine-specific integer hashing.
    *
    * Plan shape: explode tokens (distinct) x 32 positions, two partial-agg
    * groupBys — both shuffle on doc id only.
    */
  def simhash32(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = df
      .select(id.as("doc_id"), explode(TextFeatures.words(text)).as("tok"))
      .distinct()
      .withColumn("h", md5(col("tok")))
    val positions = toks.select(col("doc_id"), col("h"),
      explode(sequence(lit(0), lit(31))).as("pos"))
    // hex digit at pos div 4, then extract bit (pos % 4) by integer division —
    // pure arithmetic so the oracle reproduces it in any SQL dialect
    val bit = expr(
      "((instr('0123456789abcdef', substr(h, pos div 4 + 1, 1)) - 1)" +
        " div (CASE pos % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END)) % 2")
    val bitVote = positions
      .withColumn("vote", bit * 2 - 1)
      .groupBy(col("doc_id"), col("pos"))
      .agg(sum(col("vote")).as("s"))
    bitVote
      .withColumn("bit", when(col("s") > 0, "1").otherwise("0"))
      .groupBy(col("doc_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("bit").as("b")))),
        x => x.getField("b")), "").as("simhash"))
  }

  /** N-gram Jaccard similarity for candidate pairs sharing at least one
    * shingle. `leftPred` bounds the left side (query set or LSH candidates) —
    * the join itself only touches shared-shingle buckets.
    */
  def ngramJaccard(df: DataFrame, id: Column, text: Column, n: Int,
                   leftPred: Column, minJaccard: Double): DataFrame = {
    val sets = df.select(id.as("doc_id"), explode(TextFeatures.shingles(text, n)).as("sh")).distinct()
    val sizes = sets.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = sets.filter(leftPred).as("a")
      .join(sets.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
