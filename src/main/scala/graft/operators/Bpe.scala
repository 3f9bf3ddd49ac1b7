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
    * round. Vocabularies within `driverVocabBudget` rows take the
    * bit-identical driver path (see [[trainBatchedCounted]]); 0
    * forces the distributed loop.
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L, driverVocabBudget: Long = 1L << 20): Seq[Merge] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    var vocab = initialVocab(docs, textCol).localCheckpoint()
    val n = vocab.count()
    if (n <= driverVocabBudget) {
      // classic training IS batched training with batchSize=1 (the
      // spec-pinned identity), so the small-vocab path is shared
      System.err.println(s"[bpe] path=driver vocab=$n (budget $driverVocabBudget)")
      val out = trainDriver(collectVocab(vocab), nMerges, batchSize = 1,
        minCount, overfetch = 1)._1
      vocab.unpersist(blocking = false)
      return out
    }
    System.err.println(s"[bpe] path=distributed vocab=$n (budget $driverVocabBudget)")
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
        // last checkpoint (≤ 3 deep). LAZY checkpoint — the boundary
        // truncates the plan now, materialization rides the next
        // round's collect — keeps training at ~1 job per round.
        // Results are bit-identical either way.
        if (rank % 4 == 0) {
          val prev = pinned
          vocab = vocab.localCheckpoint(false)
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
    *
    * `overfetch` sizes the ranked candidate list per recount
    * (`batchSize × overfetch` rows collected — still bounded driver
    * literals). On symbol-dense corpora (ID-like strings where every
    * early pair shares a digit symbol) the conflict filter thins the
    * list hard, and a deeper overfetch is what keeps per-round
    * acceptance near the batch size; 4 is plenty for natural text.
    */
  def trainBatched(docs: DataFrame, textCol: String, nMerges: Int,
      batchSize: Int, minCount: Long = 2L, overfetch: Int = 4,
      driverVocabBudget: Long = 1L << 20): Seq[Merge] =
    trainBatchedCounted(docs, textCol, nMerges, batchSize, minCount,
      overfetch, driverVocabBudget)._1

  /** [[trainBatched]] that also reports its RECOUNT-ROUND count — the
    * number the batching exists to compress (classic training = one
    * recount per merge; batched ≈ nMerges / batchSize, inflated only
    * by conflict thinning). Catalog rows pin it so the at-scale claim
    * ("32k merges in ~k/batch recounts") stays a measured fact.
    *
    * SMALL-VOCAB DRIVER PATH (the [[Dedup.connectedComponents]]
    * driver-union-find idiom applied here): the corpus-sized work is
    * the ONE vocab groupBy; every round after is vocab-sized, and an
    * iterative distributed loop pays ~1 scheduled job per recount
    * regardless of data size. When the vocab fits
    * `driverVocabBudget` rows it is collected once and the rounds run
    * in driver memory — BIT-IDENTICAL merges (same exact counts, the
    * same (count desc, a, b) total order with strings compared as
    * UTF-8 bytes, the same overfetch truncation and conflict filter,
    * the same left-to-right non-overlapping apply) — else the
    * distributed loop runs. One stderr line names the path taken
    * (bench logs must prove which path a measurement measured). Set
    * the budget to 0 to force the distributed loop.
    *
    * The DISTRIBUTED loop maintains the PAIR-COUNT RELATION ACROSS
    * ROUNDS instead of recounting the vocabulary: counts(t+1) =
    * counts(t) + delta, where the delta aggregates only the AFFECTED
    * words — those whose segmentation contains one of the round's
    * merge patterns. Soundness of the filter: batch merges are
    * symbol-disjoint, and a merge replaces two symbols with one NEW
    * symbol, so it can neither create an occurrence of another
    * accepted pattern (the new symbol is not that pattern's a or b,
    * and the pattern's own symbols never become newly adjacent — the
    * merged symbol sits between them) nor destroy one (it cannot
    * consume the other pattern's symbols); a word without any pattern
    * has a zero pair delta. Per-round cost: a TakeOrdered scan of the
    * cached counts relation, a predicate scan of the cached vocab, an
    * affected-sized aggregation, and a co-partitioned full-outer fold
    * into counts (the counts side is checkpoint-pinned hash(a, b) —
    * only the delta moves). Deltas are exact integers, so the
    * maintained relation EQUALS the full recount and the learned
    * table is bit-identical on every path (BpeSpec).
    */
  def trainBatchedCounted(docs: DataFrame, textCol: String, nMerges: Int,
      batchSize: Int, minCount: Long = 2L,
      overfetch: Int = 4, driverVocabBudget: Long = 1L << 20): (Seq[Merge], Int) = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(overfetch >= 1, s"overfetch must be >= 1, got $overfetch")
    var vocab = initialVocab(docs, textCol).localCheckpoint()
    val n = vocab.count()
    if (n <= driverVocabBudget) {
      System.err.println(s"[bpe] path=driver vocab=$n (budget $driverVocabBudget)")
      val out = trainDriver(collectVocab(vocab), nMerges, batchSize,
        minCount, overfetch)
      vocab.unpersist(blocking = false)
      return out
    }
    System.err.println(
      s"[bpe] path=distributed-incremental vocab=$n (budget $driverVocabBudget)")
    def pairsOf(df: DataFrame): DataFrame = df
      .select(col("freq"), explode(adjacentPairs(col("seg"))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("c"))
    // the cached-across-rounds relation: hash(a, b) partitioning is
    // pinned by the checkpoint, so each round's fold moves only the
    // delta (counts below minCount are RETAINED — a merge elsewhere
    // can push them back up; the floor applies at selection time only)
    var counts = pairsOf(vocab).localCheckpoint(false)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rounds = 0
    var done = false
    // retire windows for the LAZY checkpoints: generation g
    // materializes at round g+1's collect, READING generation g-1's
    // cache — so a superseded generation is freed only once the
    // collect frontier has moved two rounds past it (freeing earlier
    // would destroy data a locally-checkpointed child still needs)
    val retireV = scala.collection.mutable.Queue.empty[DataFrame]
    val retireC = scala.collection.mutable.Queue.empty[DataFrame]
    while (merges.size < nMerges && !done) {
      val want = math.min(batchSize, nMerges - merges.size)
      // overfetch: the conflict filter thins the ranked list; the
      // first candidate is always conflict-free, so a non-empty count
      // always advances (no livelock)
      val top = counts
        .filter(col("c") >= minCount)
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(want * overfetch).collect()
      while (retireV.size > 1) retireV.dequeue().unpersist(blocking = false)
      while (retireC.size > 1) retireC.dequeue().unpersist(blocking = false)
      if (top.isEmpty) done = true
      else {
        rounds += 1
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
        val cur = vocab
        val isAffected = batch.map { case (a, b) =>
          col("seg").contains(lit(s"$Open$a$Close$Open$b$Close"))
        }.reduce(_ || _)
        val affected = cur.filter(isAffected)
        val after = batch.foldLeft(affected) { case (df, (a, b)) =>
          df.withColumn("seg", applyMerge(col("seg"), a, b))
        }
        val delta = pairsOf(after).unionByName(
            pairsOf(affected).select(col("a"), col("b"), (-col("c")).as("c")))
          .groupBy(col("a"), col("b")).agg(sum(col("c")).as("dc"))
          .filter(col("dc") =!= 0L)
        batch.foreach { case (a, b) => merges += Merge(merges.size, a, b) }
        retireV.enqueue(cur)
        retireC.enqueue(counts)
        // LAZY checkpoints: the plan truncates to an RDD boundary right
        // away (bounded analysis depth), but materialization rides the
        // NEXT round's collect — ~1 job per round. Results are
        // bit-identical either way.
        counts = counts.join(delta, Seq("a", "b"), "full_outer")
          .select(col("a"), col("b"),
            (coalesce(col("c"), lit(0L)) + coalesce(col("dc"), lit(0L))).as("c"))
          .filter(col("c") =!= 0L)
          .localCheckpoint(false)
        vocab = batch.foldLeft(cur) { case (df, (a, b)) =>
          df.withColumn("seg", applyMerge(col("seg"), a, b))
        }.localCheckpoint(false)
      }
    }
    (retireV ++ retireC).foreach(_.unpersist(blocking = false))
    counts.unpersist(blocking = false)
    vocab.unpersist(blocking = false)
    (merges.toSeq, rounds)
  }

  /** The collected vocab for the driver path: per WORD (rows are never
    * collapsed — parity with the distributed relation) its initial
    * symbol array (one code point per symbol, matching `(.)`) and
    * corpus frequency.
    */
  private def collectVocab(vocab: DataFrame): Array[(Array[String], Long)] =
    vocab.select(col("word"), col("freq")).collect().map { r =>
      val w = r.getString(0)
      val syms = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        syms += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      (syms.toArray, r.getLong(1))
    }

  /** Spark's StringType orders by UTF-8 bytes (unsigned); the driver
    * tiebreak must match it exactly or the two paths could learn
    * different tables on non-ASCII symbols.
    */
  private def utf8Lt(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < a.length && i < b.length) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    a.length < b.length
  }

  /** One merge applied to one symbol array — the left-to-right
    * non-overlapping scan `replace` performs on the wrapped string.
    */
  private def applyMergeDriver(syms: Array[String], a: String,
      b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** The round loop of [[trainBatchedCounted]] run in driver memory —
    * a step-for-step replica of the distributed loop (overlapping pair
    * counts weighted by freq, minCount filter, (count desc, a, b)
    * UTF-8 total order, `want × overfetch` truncation, conflict-free
    * prefix, in-rank-order apply), so the learned table is
    * bit-identical on either path (BpeSpec pins it).
    */
  private def trainDriver(words: Array[(Array[String], Long)], nMerges: Int,
      batchSize: Int, minCount: Long, overfetch: Int): (Seq[Merge], Int) = {
    var vocab = words
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rounds = 0
    var done = false
    while (merges.size < nMerges && !done) {
      val want = math.min(batchSize, nMerges - merges.size)
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      val top = counts.iterator.filter(_._2 >= minCount).toArray
        .sortWith { case (((a1, b1), c1), ((a2, b2), c2)) =>
          if (c1 != c2) c1 > c2
          else if (a1 != a2) utf8Lt(a1, a2)
          else utf8Lt(b1, b2)
        }
        .take(want * overfetch)
      if (top.isEmpty) done = true
      else {
        rounds += 1
        val used = scala.collection.mutable.Set.empty[String]
        val batch = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        val it = top.iterator
        while (batch.size < want && it.hasNext) {
          val ((a, b), _) = it.next()
          if (!used(a) && !used(b)) {
            batch += ((a, b))
            used += a; used += b; used += (a + b)
          }
        }
        batch.foreach { case (a, b) =>
          merges += Merge(merges.size, a, b)
          vocab = vocab.map { case (syms, f) =>
            (applyMergeDriver(syms, a, b), f)
          }
        }
      }
    }
    (merges.toSeq, rounds)
  }

  /** Segment the VOCABULARY under a learned merge table: fold the k
    * merges, in rank order, over the initial character segmentation —
    * nested replace expressions in one codegen'd projection (no
    * per-round materialization needed at apply time; only training
    * recounts). Vocabulary-scale tables (k in the thousands — q234)
    * would overflow Catalyst's recursive analysis as ONE expression
    * tree, so the fold is broken into layers of ≤ 100 replaces with a
    * plan-truncating localCheckpoint between layers (vocab-sized, a
    * handful of layers); a table within one layer keeps the exact
    * single-projection plan and job count it always had. Returns
    * (word, freq, seg, n_subwords).
    */
  def segmentVocab(docs: DataFrame, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val layerSize = 100
    def fold(seed: org.apache.spark.sql.Column, ms: Seq[Merge]) =
      ms.foldLeft(seed) { (acc, m) =>
        F.replace(acc, lit(s"$Open${m.a}$Close$Open${m.b}$Close"),
          lit(s"$Open${m.a}${m.b}$Close"))
      }
    val ranked = merges.sortBy(_.rank)
    val base = docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("seg",
        fold(regexp_replace(col("word"), "(.)", s"$Open$$1$Close"),
          ranked.take(layerSize)))
    val segged = ranked.drop(layerSize).grouped(layerSize)
      .foldLeft(base) { (df, layer) =>
        // lazy: the boundary truncates analysis depth now; the layers
        // materialize inside whatever single job consumes the result
        df.localCheckpoint(false).withColumn("seg", fold(col("seg"), layer))
      }
    segged.withColumn("n_subwords",
      (length(col("seg")) -
        length(F.replace(col("seg"), lit(Open), lit("")))).cast("long"))
  }

  /** Encode the corpus to TOKEN IDS under a learned merge table — the
    * last step of the tokenizer story (train → segment → encode): the
    * text a model actually consumes is an integer sequence, and the id
    * assignment must be deterministic across engines and runs.
    *
    *   - ids: dense 0..V−1 over the DISTINCT subword vocabulary in
    *     UTF-8 binary order, allocated with the
    *     [[Relational.allocateIds]] two-pass sort (no single-partition
    *     window);
    *   - the segmentation work stays vocabulary-sized ([[segmentVocab]]);
    *     the corpus only tokenizes, joins its words to their subword
    *     arrays, and positions subwords with a per-document running
    *     offset (window partitioned BY DOCUMENT — never global);
    *   - output is per-document integer CHECKSUMS of the id sequence:
    *     `n_ids`, `sum_ids` (multiset), and the order-sensitive
    *     `possum_ids` = Σ (pos+1)·id — a transposition of two ids
    *     changes it, so the hash pins the exact sequence without
    *     materializing it. Overflow envelope: safe while
    *     n_ids · (n_ids · V) < 2⁶³ (≈ documents up to ~10⁶ subwords
    *     with a ~10⁶-entry vocabulary).
    *
    * @return (docs.idCol as doc_id, n_ids, sum_ids, possum_ids)
    */
  def encodeCorpusIds(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val sv = segmentVocab(docs, textCol, merges)
      .select(col("word"), symbols(col("seg")).as("subs"),
        col("n_subwords"))
    val vocabIds = Relational.allocateIds(
      sv.select(explode(col("subs")).as("subword")).distinct(),
      "subword", startAfter = -1L, idCol = "tid")
    val tok = docs.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("wpos", "word")))
      .filter(col("word") =!= "")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("wpos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val withOff = tok.join(sv, Seq("word"))
      .withColumn("off", coalesce(sum(col("n_subwords")).over(w), lit(0L)))
    withOff
      .select(col("doc_id"), col("off"),
        posexplode(col("subs")).as(Seq("j", "subword")))
      .join(vocabIds, Seq("subword"))
      .select(col("doc_id"), (col("off") + col("j")).as("pos"), col("tid"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ids"),
        sum(col("tid")).as("sum_ids"),
        sum((col("pos") + 1L) * col("tid")).as("possum_ids"))
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
