package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-deduplication operator family for training-data pipelines.
  *
  * Parity target: the reference's duplicate-detection tool groups candidates
  * by blocking keys and compares only within blocks
  * (`tool/DuplicationDetection.scala:428-452,811-833` in
  * /root/reference/src/main/scala/au/org/ala/biocache/). Every variant here
  * keeps that shape — candidate generation is always a *blocked* equi-join
  * (hash bucket, LSH band, SimHash prefix) so the candidate-pair count stays
  * near-linear at 100 TB, never an O(n²) cross join.
  */
object Dedup {

  /** Exact duplicates by normalised-content hash: one shuffle (groupBy). */
  def exactDuplicates(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(count("*").as("n_docs"), min(idCol).as("representative_id"))
      .filter(col("n_docs") > 1)

  /** Exact-duplicate removal keeping the lowest id per content hash. */
  def dropExactDuplicates(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(fingerprint(col(textCol))).orderBy(col(idCol))
    docs.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** MinHash signatures: one base string-hash pass per shingle set, then
    * permutation i = seeded re-hash of the base long (overflow-free under
    * ANSI mode, unlike arithmetic mixing). Returns (id, sig: array<long>).
    * Each stage is a separate projection so the expensive array is computed
    * once, not once per signature element (higher-order functions are
    * interpreted — no common-subexpression elimination — so repeated
    * subtrees are repeated work). */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      shingleLen: Int, numHashes: Int): DataFrame =
    docs
      .select(col(idCol).as("id"),
        charShingles(col(textCol), shingleLen).as("shingles"))
      .select(col("id"),
        transform(col("shingles"), s => xxhash64(s)).as("hs"))
      .select(col("id"), array((0 until numHashes).map { i =>
        array_min(transform(col("hs"), h => xxhash64(h, lit(i))))
      }: _*).as("sig"))

  /** MinHash + LSH near-duplicate candidate pairs.
    * Pipeline: shingle → minhash(numHashes) → band into (numBands) buckets →
    * self-join within band buckets → verify estimated Jaccard ≥ threshold.
    * The band join is an equi-join on (band, bandHash): shuffle is by bucket,
    * never all-pairs. */
  def minhashLshPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 5, numHashes: Int = 32, numBands: Int = 8,
      jaccardThreshold: Double = 0.8): DataFrame = {
    val rowsPerBand = numHashes / numBands
    val sig = minhashSignatures(docs, idCol, textCol, shingleLen, numHashes)

    val banded = sig.select(
      col("id"), col("sig"),
      posexplode(array((0 until numBands).map { b =>
        xxhash64(concat_ws(",",
          slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)), lit(b))
      }: _*)).as(Seq("band", "bandHash")))

    val a = banded.select(col("band"), col("bandHash"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bandHash"),
      col("id").as("id_b"), col("sig").as("sig_b"))

    val estJaccard =
      size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
        when(x === y, 1).otherwise(0)), v => v === 1)).cast("double") / numHashes

    a.join(b, Seq("band", "bandHash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), estJaccard.as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= jaccardThreshold)
  }

  /** 64-bit SimHash from word shingles: weighted bit-vote over shingle
    * hashes, expressed with higher-order functions. */
  /** 64-bit SimHash of a pre-hashed shingle column: per bit, votes =
    * Σ(+1 if set else −1); bit set in result if votes > 0. The bit loop is
    * unrolled over plan-build-time literals; `hashes` must be a materialized
    * column attribute (not an inline expression) or it is re-evaluated 64×. */
  def simhashFromHashes(hashes: Column): Column =
    (0 until 64).map { bit =>
      val votes = aggregate(hashes, lit(0),
        (v, h) => v + when(shiftright(h, bit).bitwiseAND(1L) === 1L, 1).otherwise(-1))
      when(votes > 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** (id, simhash) for each document: shingle → hash → bit-vote, one
    * projection per stage so each array computes once. */
  def simhashes(docs: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 2): DataFrame =
    docs
      .select(col(idCol).as("id"),
        wordShingles(col(textCol), shingleLen).as("shingles"))
      .select(col("id"),
        transform(col("shingles"), s => xxhash64(s)).as("hs"))
      .select(col("id"), simhashFromHashes(col("hs")).as("sh"))

  /** SimHash near-duplicate pairs: block on 16-bit prefix bands of the
    * simhash (4 bands × 16 bits), verify Hamming distance ≤ maxHamming. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sh = simhashes(docs, idCol, textCol)
    val banded = sh.select(col("id"), col("sh"),
      posexplode(array((0 until 4).map { b =>
        shiftright(col("sh"), b * 16).bitwiseAND(0xFFFFL)
      }: _*)).as(Seq("band", "bandKey")))
    val a = banded.select(col("band"), col("bandKey"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bandKey"), col("id").as("id_b"), col("sh").as("sh_b"))
    val hamming = bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("int")
    a.join(b, Seq("band", "bandKey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming.as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity for candidate pairs via explode +
    * equi-join on shingle, then |∩| / (|A|+|B|-|∩|). Blocked by shingle —
    * a pair is only compared if it shares at least one shingle. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      charShingles(col(textCol), n).as("shingles"))
      .withColumn("setSize", size(col("shingles")))
    val exploded = sh.select(col("id"), col("setSize"),
      explode(col("shingles")).as("shingle"))
    val inter = exploded.as("a")
      .join(exploded.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.setSize").as("size_a"), col("b.setSize").as("size_b"))
      .agg(count("*").as("intersection"))
    inter.select(
        col("id_a"), col("id_b"),
        (col("intersection").cast("double") /
          (col("size_a") + col("size_b") - col("intersection")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Embedding near-duplicates: cosine ≥ threshold within LSH buckets.
    * `bits` controls bucket granularity (recall/cost trade-off). */
  def embeddingNearDuplicates(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, bits: Int = 8): DataFrame = {
    import graft.functions.VectorFunctions
    val keyed = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      VectorFunctions.lshSignature(col(vecCol), bits).as("bucket"))
    val a = keyed.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = keyed.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFunctions.cosine(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .distinct()
  }
}
