package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Byte-pair-encoding tokenization — the vocabulary step of every LLM data
 * pipeline (token counting for packing/budgeting, subword vocab induction).
 *
 * Scale shape (the subword-nmt/HF-tokenizers decomposition): the corpus-
 * sized work is ONE distributed word histogram (`groupBy(word)` —
 * vocabulary-bounded output); merge learning then iterates on that small
 * word-frequency table driver-side (exactly how reference BPE trainers
 * work — the corpus is never touched again), and encoding re-distributes:
 * segmentation is computed once per DISTINCT word (vocabulary-bounded,
 * merges broadcast) and equi-joined back to the token stream, so a word
 * occurring 10^9 times segments once, not 10^9 times.
 *
 * Semantics pinned for cross-engine reproduction: symbol sequences are
 * space-joined strings (" a b c "), one merge applies as the non-
 * overlapping left-to-right replacement of " l r " with " lr " (Java
 * `String.replace` ≡ SQL `replace` — " a a a " with merge (a,a) gives
 * " aa a "), the best pair is max count with (left, right) lexicographic
 * ascending tiebreak, and encoding applies learned merges in rank order —
 * which reproduces the training segmentation for in-vocab words and
 * generalizes to unseen ones.
 */
object Bpe {

  /** One learned merge: rank is application order. */
  final case class Merge(rank: Int, left: String, right: String)

  private def seqOf(word: String): String =
    word.toCharArray.mkString(" ", " ", " ")

  /** Apply merges in rank order to one word's symbol sequence. */
  private def segment(word: String, merges: Seq[Merge]): Array[String] = {
    var seq = seqOf(word)
    merges.foreach(m => seq = seq.replace(s" ${m.left} ${m.right} ", s" ${m.left}${m.right} "))
    seq.trim.split(" ").filter(_.nonEmpty)
  }

  /**
   * Learn `nMerges` merges from the corpus. `maxVocab` caps the word table
   * the driver iterates on (count-desc, word-asc deterministic cut) — the
   * standard guard against unbounded long-tail vocabularies (URLs, typos)
   * at crawl scale; words past the cap still ENCODE (rank-order apply),
   * they just don't vote during training.
   *
   * Driver loop is O(vocab · avgWordLen) per merge via full pair recount —
   * simple and exactly reproducible; the incremental pair-index of
   * subword-nmt is the known optimization if merge counts grow to 10^4+.
   */
  def learnMerges(df: DataFrame, textCol: String, nMerges: Int,
                  maxVocab: Int = 100000): Seq[Merge] = {
    require(nMerges >= 0 && maxVocab > 0, "need nMerges >= 0, maxVocab > 0")
    val vocab = df.select(explode(TextAnalysis.normTokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc).limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var seqs: Array[(String, Long)] = vocab.map { case (w, c) => (seqOf(w), c) }
    val merges = Vector.newBuilder[Merge]
    for (k <- 0 until nMerges) {
      val counts = new java.util.HashMap[(String, String), Long]()
      seqs.foreach { case (seq, c) =>
        val syms = seq.trim.split(" ").filter(_.nonEmpty)
        var i = 0
        while (i < syms.length - 1) {
          counts.merge((syms(i), syms(i + 1)), c, _ + _); i += 1
        }
      }
      if (counts.isEmpty) return merges.result()
      var best: ((String, String), Long) = null
      counts.forEach { (p, c) =>
        if (best == null || c > best._2 ||
          (c == best._2 && (p._1 < best._1._1 ||
            (p._1 == best._1._1 && p._2 < best._1._2)))) best = (p, c)
      }
      val (l, r) = best._1
      merges += Merge(k, l, r)
      seqs = seqs.map { case (seq, c) => (seq.replace(s" $l $r ", s" $l$r "), c) }
    }
    merges.result()
  }

  /**
   * Encode: per-document BPE token stream under a learned merge table.
   * Returns (id, n_words, n_tokens, bpe_text) where bpe_text is the
   * space-joined symbol stream in document order.
   *
   * Distribution: one distinct-word relation segments under the BROADCAST
   * merge table (vocabulary-bounded typed map), then equi-joins back to
   * the exploded token stream; reassembly is one document-keyed
   * aggregation. The corpus shuffles only by word and by document id.
   */
  def encode(df: DataFrame, idCol: String, textCol: String,
             merges: Seq[Merge]): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(merges.sortBy(_.rank))
    val words = df.select(col(idCol).as("id"),
      posexplode(TextAnalysis.normTokens(col(textCol))).as(Seq("wpos", "w")))
    // tuple encoder: janino rejects the accessor shape of a nested private
    // case class when codegen'ing the serializer (falls back to interpreted
    // per query) — tuples codegen cleanly
    val segEnc = Encoders.product[(String, Array[String])]
    val segs = words.select(col("w")).distinct()
      .map(r => { val w = r.getString(0); (w, segment(w, bc.value)) })(segEnc)
      .toDF("w", "syms")
    val joined = words.join(segs, Seq("w"))
      .select(col("id"), col("wpos"), col("syms"))
    val perDoc = joined.groupBy("id").agg(
      count(lit(1)).cast(IntegerType).as("n_words"),
      sum(size(col("syms"))).cast(IntegerType).as("n_tokens"),
      array_join(transform(array_sort(collect_list(struct(col("wpos"), col("syms")))),
        s => array_join(s.getField("syms"), " ")), " ").as("bpe_text"))
    // id-keyed reattach: aggregate side has no stats -> hint off SortMergeJoin
    df.select(col(idCol).as("id")).join(Joins.shuffleHashUnlessSmall(perDoc), Seq("id"), "left")
      .select(col("id"), coalesce(col("n_words"), lit(0)).as("n_words"),
        coalesce(col("n_tokens"), lit(0)).as("n_tokens"),
        coalesce(col("bpe_text"), lit("")).as("bpe_text"))
  }

  /** Learn + encode in one call (the gate entry point). */
  def learnAndEncode(df: DataFrame, idCol: String, textCol: String,
                     nMerges: Int, maxVocab: Int = 100000): DataFrame =
    encode(df, idCol, textCol, learnMerges(df, textCol, nMerges, maxVocab))
}
