package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding VOCABULARY TRAINING (Sennrich, Haddow & Birch,
  * "Neural Machine Translation of Rare Words with Subword Units", ACL
  * 2016) — the one standard LLM-pipeline preprocessing operator the
  * engine lacked: q96's token-fertility row PRESUMES a tokenizer; this
  * LEARNS one. Extension surface: the reference has nothing of the
  * kind.
  *
  * The classic algorithm is an iterative count-merge-recount: start
  * from characters, repeatedly find the most frequent ADJACENT symbol
  * pair in the current segmentation and merge it, k times; the ranked
  * merge list IS the trained tokenizer. Re-expressed in the engine's
  * integer-relational discipline:
  *
  *   - state is the WORD-FREQUENCY relation (word, freq, seg) — one
  *     groupBy over the corpus tokens builds it, and every later round
  *     works on the VOCABULARY, never the corpus (at 100 TB the corpus
  *     is petabytes; its vocabulary is millions of rows);
  *   - one round = one pair-count aggregation (weighted by freq,
  *     map-side combined) + ONE top-1 collect (the bounded
  *     driver-literal pattern: a single (a, b) row) + one string-map
  *     merge application; k rounds unroll like the q182 MMR steps;
  *   - counts are exact integers and the argmax tiebreak is the total
  *     order (count desc, a asc, b asc), so the learned table is
  *     bit-deterministic in any engine.
  *
  * SEGMENTATION REPRESENTATION — the part that makes the merge step a
  * single codegen'd `replace`: a segmentation is a STRING of wrapped
  * symbols `⟨sym⟩⟨sym⟩…` with ⟨ = \u0001 and ⟩ = \u0002. Merging pair
  * (a, b) is then `replace(seg, "⟨a⟩⟨b⟩", "⟨ab⟩")`:
  *
  *   - the wrappers make matches ALIGN to symbol boundaries (a search
  *     for ⟨a⟩⟨b⟩ cannot start or end inside a longer symbol — ⟨xa⟩⟨b⟩
  *     and ⟨a⟩⟨bc⟩ don't match), the bug a space-joined form has;
  *   - `replace` scans left-to-right non-overlapping, which IS the BPE
  *     merge convention: ⟨a⟩⟨a⟩⟨a⟩ under (a,a) → ⟨aa⟩⟨a⟩;
  *   - DuckDB's `replace` has identical semantics, so the oracle
  *     replays the learned table as k nested replace() calls — the
  *     trained-literal discipline (dsir/centroid pattern) applied to a
  *     learned VOCABULARY.
  *
  * Pair COUNTING deliberately counts overlapping pairs (⟨a⟩⟨a⟩⟨a⟩
  * contributes (a,a) twice — the reference implementation's
  * zip(word, word[1:]) does the same); merge APPLICATION is
  * non-overlapping. Corpus contract: text must not contain \u0001 or
  * \u0002 (they are the symbol delimiters); real pipelines strip
  * control characters in the clean stage anyway.
  */
object Bpe {

  private val Open = "\u0001"
  private val Close = "\u0002"

  /** One learned merge: rank is 0-based training order; `a`/`b` the
    * merged pair, `ab` the resulting symbol.
    */
  final case class Merge(rank: Int, a: String, b: String)

  /** The word-frequency relation with the initial character
    * segmentation — the ONLY corpus-sized pass of training.
    */
  def initialVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("seg",
        regexp_replace(col("word"), "(.)", s"$Open$$1$Close"))

  /** The wrapped-symbol string as an ARRAY of symbols (for pair
    * counting): strip the outer wrappers, split on the inner `⟩⟨`
    * boundary.
    */
  private def symbols(seg: org.apache.spark.sql.Column) =
    split(regexp_replace(seg, s"^$Open|$Close$$", ""), s"$Close$Open")

  /** Adjacent symbol pairs of a segmentation (overlapping, the
    * counting convention). NULL for single-symbol words — explode
    * drops nulls, so they simply contribute no pairs.
    */
  private def adjacentPairs(seg: org.apache.spark.sql.Column) = {
    val syms = symbols(seg)
    F.when(size(syms) >= 2,
      transform(sequence(lit(0), size(syms) - 2),
        i => struct(element_at(syms, i + 1).as("a"),
          element_at(syms, i + 2).as("b"))))
  }

  /** Apply one merge to a segmentation string — a single codegen'd
    * string replace, boundary-aligned by the wrappers.
    */
  def applyMerge(seg: org.apache.spark.sql.Column,
      a: String, b: String): org.apache.spark.sql.Column =
    F.replace(seg, lit(s"$Open$a$Close$Open$b$Close"),
      lit(s"$Open$a$b$Close"))

  /** Train `nMerges` BPE merges on the corpus. Stops early when no
    * pair reaches `minCount`. Returns the ranked merge table (bounded:
    * k rows on the driver — the trained-literal contract).
    *
    * Scale shape: one corpus-sized groupBy builds the vocab; each
    * round is one vocab-sized pair aggregation + a TOP-1 collect + a
    * map-side replace, with the vocab localCheckpoint'ed per round so
    * the plan stays one step deep (the [[Graph.pageRank]] iteration
    * discipline). Driver state: exactly one (a, b, count) row per
    * round.
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L): Seq[Merge] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    var vocab = initialVocab(docs, textCol).localCheckpoint()
    var pinned = vocab // the last checkpointed relation (freed on advance)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val top = vocab
        .select(col("freq"), explode(adjacentPairs(col("seg"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("c"))
        .filter(col("c") >= minCount)
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += Merge(rank, a, b)
        vocab = vocab.withColumn("seg", applyMerge(col("seg"), a, b))
        rank += 1
        // re-materialize every 4th round, not every round: unapplied
        // merges are cheap stacked replace() projections on top of the
        // last checkpoint (≤ 3 deep), while each localCheckpoint costs
        // its own job — this is what keeps training at ~1 job per
        // round instead of ~3. Results are bit-identical either way.
        if (rank % 4 == 0) {
          val prev = pinned
          vocab = vocab.localCheckpoint()
          pinned = vocab
          prev.unpersist(blocking = false)
        }
      }
    }
    pinned.unpersist(blocking = false)
    merges.toSeq
  }

  /** BATCHED BPE training — the SentencePiece-style speedup: per round,
    * take the top-`batchSize` pairs of ONE pair count and accept the
    * ranked prefix that is CONFLICT-FREE (no accepted pair shares a
    * symbol with an earlier accepted pair, nor touches a symbol an
    * earlier acceptance just created), then apply the whole batch and
    * recount once. Disjoint symbols mean the batch's replaces cannot
    * overlap on any occurrence, so applying them in rank order inside
    * one round ≡ applying them simultaneously — the merge table stays a
    * valid, deterministic BPE tokenizer (exact counts, the
    * (count desc, a, b) total order, a bounded `4·batchSize` candidate
    * collect per round).
    *
    * This is a DIFFERENT (published) training variant, not a fast path
    * to [[train]]'s answer: classic BPE recounts after every merge, so
    * from rank 2 on the argmax may differ (a batch cannot see pairs
    * involving symbols it creates until the next round — BpeSpec pins
    * `batchSize = 1` ≡ [[train]] exactly, and pins the round count of
    * the batched run at ~k/batchSize). The payoff at vocabulary scale:
    * a 32k-merge training drops from 32k vocab recounts to ~32k/m.
    */
  def trainBatched(docs: DataFrame, textCol: String, nMerges: Int,
      batchSize: Int, minCount: Long = 2L): Seq[Merge] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    var vocab = initialVocab(docs, textCol).localCheckpoint()
    var pinned = vocab
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    while (merges.size < nMerges && !done) {
      val want = math.min(batchSize, nMerges - merges.size)
      // overfetch 4x: the conflict filter thins the ranked list; the
      // first candidate is always conflict-free, so a non-empty count
      // always advances (no livelock)
      val top = vocab
        .select(col("freq"), explode(adjacentPairs(col("seg"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("c"))
        .filter(col("c") >= minCount)
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(want * 4).collect()
      if (top.isEmpty) done = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val batch = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        val it = top.iterator
        while (batch.size < want && it.hasNext) {
          val r = it.next()
          val (a, b) = (r.getString(0), r.getString(1))
          if (!used(a) && !used(b)) {
            batch += ((a, b))
            used += a; used += b; used += (a + b)
          }
        }
        batch.foreach { case (a, b) =>
          merges += Merge(merges.size, a, b)
          vocab = vocab.withColumn("seg", applyMerge(col("seg"), a, b))
        }
        val prev = pinned
        vocab = vocab.localCheckpoint()
        pinned = vocab
        prev.unpersist(blocking = false)
      }
    }
    pinned.unpersist(blocking = false)
    merges.toSeq
  }

  /** Segment the VOCABULARY under a learned merge table: fold the k
    * merges, in rank order, over the initial character segmentation —
    * k nested replace expressions in one codegen'd projection (no
    * per-round materialization needed at apply time; only training
    * recounts). Returns (word, freq, seg, n_subwords).
    */
  def segmentVocab(docs: DataFrame, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val seg = merges.sortBy(_.rank).foldLeft(
      regexp_replace(col("word"), "(.)", s"$Open$$1$Close")) {
      (acc, m) => F.replace(acc, lit(s"$Open${m.a}$Close$Open${m.b}$Close"),
        lit(s"$Open${m.a}${m.b}$Close"))
    }
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("seg", seg)
      .withColumn("n_subwords",
        (length(col("seg")) -
          length(F.replace(col("seg"), lit(Open), lit("")))).cast("long"))
  }

  /** Per-document subword statistics under a learned merge table: each
    * document's token stream joins the segmented vocabulary (the merge
    * work is vocab-sized; the corpus only tokenizes and joins).
    * Returns (docs.idCol, n_words, n_subwords) with n_subwords the
    * BPE token count q96-style fertility would divide by.
    */
  def segmentCorpus(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val v = segmentVocab(docs, textCol, merges)
      .select(col("word"), col("n_subwords"))
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(v, Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_subwords")).as("n_subwords"))
  }
}
