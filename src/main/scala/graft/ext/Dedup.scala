package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed as
  * a shuffle-based plan that survives 100 TB inputs:
  *
  *  - exact: hash-groupBy on content (one shuffle keyed by fingerprint —
  *    never on the raw text, so shuffle payload stays small)
  *  - near-dup by word-set Jaccard: token-inverted-index self-join
  *  - MinHash + LSH banding: shingle → 64-perm signature → band buckets →
  *    candidate pairs → exact verification (no cartesian anywhere)
  *  - SimHash: 64-bit bit-vote fingerprint + banded Hamming pairing
  *
  * Embedding-cosine near-dup lives in [[Similarity]].
  */
object Dedup {

  // ------------------------------------------------------------ exact
  /** One row per distinct content: keeper id (min), duplicate count.
    * Grouping key is the 64-bit md5 prefix of the content, so the
    * shuffle moves 8-byte keys instead of documents.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextStats.fingerprintMd5(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Deduplicated frame: keeps the min-id row per distinct content. */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactGroups(df, idCol, textCol).select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  // ------------------------------------------------- word-set Jaccard
  /** Near-duplicate pairs by Jaccard similarity of distinct token sets.
    * Inverted-index self-join: only documents sharing at least one token
    * are ever paired (no cartesian). `minJaccard` filters the output.
    *
    * `maxDocFreq` (0,1]: tokens present in more than that fraction of
    * documents are dropped from the *index* (not from the set sizes) —
    * the standard stop-token guard that keeps the hottest posting lists
    * from driving the self-join quadratic. 1.0 disables pruning and
    * makes the Jaccard exact; below 1.0 the result is a high-recall
    * approximation (pairs sharing only ultra-common tokens are missed,
    * and intersection counts exclude pruned tokens).
    */
  def wordJaccardPairs(
      df: DataFrame, idCol: String, textCol: String, minJaccard: Double,
      maxDocFreq: Double = 1.0): DataFrame = {
    val allWords = df
      .select(col(idCol).as("id"), explode(array_distinct(TextStats.tokens(col(textCol)))).as("w"))
    val sizes = allWords.groupBy("id").agg(count(lit(1)).as("sz"))
    val words =
      if (maxDocFreq >= 1.0) allWords
      else {
        val nDocs = df.select(col(idCol)).distinct().count()
        val hot = allWords.groupBy("w").agg(count(lit(1)).as("df"))
          .filter(col("df") > lit(maxDocFreq * nDocs))
          .select("w")
        allWords.join(broadcast(hot), Seq("w"), "left_anti")
      }
    val inter = words.as("a")
      .join(words.as("b"), col("a.w") === col("b.w") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  // --------------------------------------------------- MinHash + LSH
  /** Word `n`-gram shingles as an array column. */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextStats.tokens(text)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** MinHash signature of a shingle array: `perms` independent min-hash
    * values, permutation i implemented as xxhash64(seed=i). Stays an
    * expression — per-row, no shuffle. NOTE: higher-order functions are
    * interpreted (CodegenFallback); for bulk signatures use
    * [[minHashSignatures]], which keeps the hashing inside whole-stage
    * codegen.
    */
  def minHashSignature(shingleArr: Column, perms: Int): Column =
    transform(sequence(lit(0), lit(perms - 1)),
      seed => array_min(transform(shingleArr, s => xxhash64(seed, s))))

  /** Bulk MinHash signatures, codegen-shaped: explode shingles to rows,
    * hash each with `perms` codegen'd xxhash64 calls, min-aggregate per
    * doc (map-side partial combine → one keyed shuffle of 64 longs per
    * doc). ~100× the interpreted expression form on wide corpora, and
    * the signature is a materialized column, so downstream joins never
    * re-evaluate the hashing.
    */
  def minHashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, perms: Int): DataFrame = {
    val exploded = df.select(
      col(idCol).as("id"),
      explode(shingles(col(textCol), shingleN)).as("s"))
    val minCols = (0 until perms).map(i => min(xxhash64(lit(i), col("s"))).as(s"mh_$i"))
    exploded.groupBy("id")
      .agg(minCols.head, minCols.tail: _*)
      .select(col("id"), array((0 until perms).map(i => col(s"mh_$i")): _*).as("sig"))
  }

  /** Candidate duplicate pairs via LSH banding of MinHash signatures:
    * signature split into `bands` bands of `perms/bands` rows; documents
    * colliding in any band become candidates; candidates are verified
    * with exact shingle-set Jaccard. Every step is a keyed shuffle —
    * the band join only pairs documents within a bucket.
    */
  def minHashPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, perms: Int = 64, bands: Int = 16,
      minJaccard: Double = 0.7): DataFrame = {
    val rows = perms / bands
    require(bands * rows == perms, "bands must divide perms")

    val sigs = minHashSignatures(df, idCol, textCol, shingleN, perms)

    val banded = sigs.select(
      col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("sig"), b * rows + 1, lit(rows))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_key")

    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

    // exact verification on the candidate set only
    val shingleSets = df.select(
      col(idCol).as("id"),
      array_distinct(shingles(col(textCol), shingleN)).as("shs"))
    candidates
      .join(shingleSets.select(col("id").as("id_a"), col("shs").as("sh_a")), Seq("id_a"))
      .join(shingleSets.select(col("id").as("id_b"), col("shs").as("sh_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  // ----------------------------------------------------------- SimHash
  /** 64-bit SimHash over tokens: per-bit vote of token hashes, expressed
    * with array functions so the whole fingerprint is one projection
    * (no explode, no shuffle): for each bit, count tokens with that bit
    * set vs total, bit set iff votes > half.
    */
  def simHash64(text: Column): Column = {
    val hashes = transform(array_distinct(TextStats.tokens(text)), t => xxhash64(t))
    val nTok = size(hashes)
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, bit) => {
        val ones = aggregate(hashes, lit(0), (c, h) => c + getbit(h, bit).cast("int"))
        acc + when(ones * 2 > nTok,
          call_function("shiftleft", lit(1L), bit)).otherwise(lit(0L))
      })
  }

  /** Bulk SimHash fingerprints, codegen-shaped (see [[minHashSignatures]]
    * for the rationale): explode distinct tokens, hash once per token in
    * codegen, per-bit popcount via 64 partial-aggregated sums, fingerprint
    * reassembled in one per-doc projection.
    */
  def simHashes(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(
      col(idCol).as("id"),
      explode(array_distinct(TextStats.tokens(col(textCol)))).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    val bitSums = (0 until 64).map(b => sum(getbit(col("h"), lit(b))).as(s"b_$b"))
    val agg = toks.groupBy("id")
      .agg(bitSums.head, bitSums.tail :+ count(lit(1)).as("n"): _*)
    val fp = (0 until 64).map(b =>
      when(col(s"b_$b") * 2 > col("n"), lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
    agg.select(col("id"), fp.as("sh"))
  }

  /** Near-dup pairs with Hamming distance ≤ `maxHamming` between SimHash
    * fingerprints, using 16-bit band blocking (any pair within Hamming 3
    * of a 64-bit hash shares at least one of 4 16-bit bands intact).
    */
  def simHashPairs(
      df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val fp = simHashes(df, idCol, textCol)
    val banded = fp.select(col("id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => call_function("shiftright", col("sh"), b * 16).bitwiseAND(0xFFFFL))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
