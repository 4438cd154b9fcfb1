package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Byte-pair-encoding tokenizer training and encoding (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") as a
  * distributed operator — the tokenizer-construction step of a training-data
  * pipeline.
  *
  * Shape at 100 TB: training never touches the corpus after the initial
  * word-count pass. BPE statistics are a function of the word-frequency
  * table (distinct words + counts — ~1e8 rows for web-scale text, far
  * smaller than the corpus and perfectly partitionable), so each merge
  * iteration is one explode+sum over that table plus a single-row argmax
  * collect; the winning pair (a scalar) drives a map-only rewrite of the
  * symbol arrays. Lineage is cut each round by persisting the new vocab
  * and unpersisting the previous. Production trainers additionally sample
  * the word table; the operator takes whatever word table it is given.
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String)

  /** End-of-word marker appended as a distinct final symbol, so merges
    * distinguish word-final from word-internal contexts. */
  val EndOfWord = "</w>"

  /** Whitespace word-frequency table of a text column: `(word, cnt)`. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Greedy left-to-right single pass replacing adjacent (l, r) with l+r —
    * the standard non-overlapping merge application. */
  private[operators] def mergeOnce(symbols: Seq[String], l: String,
      r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < symbols.length) {
      if (i + 1 < symbols.length && symbols(i) == l && symbols(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += symbols(i); i += 1 }
    }
    out.toSeq
  }

  /** Train `numMerges` merges from a `(word, cnt)` frequency table. Pair
    * statistics are weighted by word count; ties break on (left, right)
    * lexically for full determinism. Stops early if no adjacent pair
    * remains.
    *
    * When the word table fits the documented driver contract
    * (`localThreshold` rows — the table is already the AGGREGATED
    * vocabulary, orders of magnitude smaller than the corpus), the merge
    * loop runs on the driver over the collected counts: identical results
    * (same argmax, same tie-breaks — spec-asserted), none of the ~2
    * scheduler round-trips per merge. Above the threshold it runs as the
    * distributed loop. Pass `localThreshold = 0` to force the distributed
    * path. */
  def train(wordCounts: DataFrame, numMerges: Int,
      localThreshold: Long = 200000L): Seq[Merge] = {
    if (localThreshold > 0 &&
        wordCounts.limit((localThreshold + 1).toInt).count() <= localThreshold)
      trainLocal(
        wordCounts.select(col("word"), col("cnt").cast("long"))
          .collect().map(r => (r.getString(0), r.getLong(1))),
        numMerges)
    else trainDistributed(wordCounts, numMerges)
  }

  /** Driver-side merge loop — exact same semantics as the distributed
    * path, for word tables under the size contract. */
  private[operators] def trainLocal(words: Array[(String, Long)],
      numMerges: Int): Seq[Merge] = {
    var vocab: Array[(Seq[String], Long)] = words.map { case (w, c) =>
      (w.map(_.toString) :+ EndOfWord, c)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val ((l, r), _) = pairCounts.minBy { case ((pl, pr), c) =>
          (-c, pl, pr)
        }
        merges += Merge(rank, l, r)
        vocab = vocab.map { case (syms, c) => (mergeOnce(syms, l, r), c) }
        rank += 1
      }
    }
    merges.toSeq
  }

  private def trainDistributed(wordCounts: DataFrame,
      numMerges: Int): Seq[Merge] = {
    val mergeUdf = udf((syms: Seq[String], l: String, r: String) =>
      mergeOnce(syms, l, r))
    var vocab = wordCounts
      .select(concat(split(col("word"), ""),
          array(lit(EndOfWord))).as("syms"),
        col("cnt").cast("long").as("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val best = vocab
        .select(posexplode(slice(col("syms"), lit(1),
            greatest(size(col("syms")) - 1, lit(0)))).as(Seq("i", "l")),
          col("syms"), col("cnt"))
        .select(col("l"),
          element_at(col("syms"), col("i") + 2).as("r"), col("cnt"))
        .groupBy("l", "r").agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (l, r) = (best(0).getString(0), best(0).getString(1))
        merges += Merge(rank, l, r)
        val next = vocab
          .select(mergeUdf(col("syms"), lit(l), lit(r)).as("syms"),
            col("cnt"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count()
        vocab.unpersist()
        vocab = next
        rank += 1
      }
    }
    vocab.unpersist()
    merges.toSeq
  }

  /** Encode one word with a trained merge list: start from characters +
    * end-of-word, repeatedly apply the lowest-rank applicable merge until
    * none applies — the exact inference-time BPE procedure. */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var syms: Seq[String] =
      word.toLowerCase.map(_.toString) :+ EndOfWord
    var continue = syms.length > 1
    while (continue) {
      val pairs = syms.zip(syms.tail)
      val best = pairs.flatMap(p => ranks.get(p).map(p -> _))
        .sortBy(_._2).headOption
      best match {
        case Some(((l, r), _)) => syms = mergeOnce(syms, l, r)
        case None => continue = false
      }
      if (syms.length < 2) continue = false
    }
    syms
  }

  /** Tokenise a text column with a trained merge list: `(id, word, tokens)`
    * per distinct word occurrence position is overkill for a pipeline, so
    * this returns per-word tokenisations for the corpus vocabulary —
    * map-only over the word table with the ranks broadcast. */
  def encodeVocab(wordCounts: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = wordCounts.sparkSession
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val b = spark.sparkContext.broadcast(ranks)
    val enc = udf((w: String) => encodeWord(w, b.value))
    wordCounts.select(col("word"), col("cnt"), enc(col("word")).as("tokens"))
  }
}
