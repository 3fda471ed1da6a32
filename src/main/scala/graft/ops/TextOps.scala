package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Checkpointing.LineageSyntax
import graft.Tables

/** Text-analysis operators for training-data pipelines, over the `documents`
  * table (doc_id, text, lang, source, n_chars).
  *
  * Every operator stays inside whole-stage codegen (built-in functions, or
  * native codegen'd expressions like LangId) and scales columnar: at 100 TB
  * these run as a single scan + narrow maps — no driver collects, no
  * per-row JVM round trips, no shuffles.
  *
  * Shared constant lists (stopwords, marker profiles) are the single source
  * of truth for BOTH the Spark plans and the generated DuckDB oracle SQL, so
  * the two sides can never drift.
  */
object TextOps {

  /** Whitespace tokens of `text` (trimmed; empty text → 0 tokens). */
  private def tokens(c: Column): Column = Portable.toks(c)

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "is", "to", "in")

  /** Marker-word profiles for language/domain ID. Over the synthetic corpus
    * vocabulary these behave like character-n-gram language profiles over
    * real text: score = marker hits, classify = argmax with deterministic
    * tie-break (score DESC, lang ASC), no hits → 'und'. Defined next to the
    * native LangId expression (graft.functions.PortableHash) so the Spark
    * plan and the generated oracle SQL share one list.
    */
  val LangProfiles: Seq[(String, Seq[String])] =
    graft.functions.PortableHash.LangProfiles

  /** q16: per-document token statistics (token counting op). */
  def tokenStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documentsPar(spark, sfDir)
      .select(
        col("doc_id"),
        size(tokens(col("text"))).as("n_tokens"),
        length(col("text")).as("len_chars"),
        round(
          length(regexp_replace(col("text"), "\\s+", "")).cast("double") /
            greatest(size(tokens(col("text"))), lit(1)), 4).as("avg_token_len"))

  /** q17: quality scoring — length, stopword-ratio and punctuation-ratio
    * components combined into one deterministic score.
    */
  /** Round-half-up via floor — Spark's round() (BigDecimal HALF_UP on the
    * decimal expansion) and DuckDB's round() (C rounding on the scaled
    * double) disagree by 1 ulp when a value lands exactly on a .5 boundary
    * at the target scale; floor(x*1e4 + 0.5) is bit-identical on both
    * engines given the same input double.
    */
  private def r4(c: Column): Column = Portable.r4(c)

  /** The q17 quality formula over a text column — factored so the q100
    * curation pipeline applies the IDENTICAL (r4-rounded) score its gate
    * threshold compares against.
    */
  private[ops] def qualityCol(text: Column): Column = {
    val toks = tokens(text)
    val nTok = greatest(size(toks), lit(1)).cast("double")
    val stopArr = array(Stopwords.map(lit): _*)
    val nStop = size(filter(toks, t => array_contains(stopArr, t))).cast("double")
    val nPunct = length(regexp_replace(text, "[^.,;:!?]", "")).cast("double")
    val nChars = greatest(length(text), lit(1)).cast("double")
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val stopRatio = nStop / nTok
    val punctRatio = nPunct / nChars
    r4(lit(0.5) * lenScore + lit(0.3) * (lit(1.0) - abs(stopRatio - 0.1))
      + lit(0.2) * (lit(1.0) - punctRatio))
  }

  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = greatest(size(toks), lit(1)).cast("double")
    val stopArr = array(Stopwords.map(lit): _*)
    val nStop = size(filter(toks, t => array_contains(stopArr, t))).cast("double")
    val nPunct = length(regexp_replace(col("text"), "[^.,;:!?]", "")).cast("double")
    val nChars = greatest(length(col("text")), lit(1)).cast("double")
    val stopRatio = nStop / nTok
    val punctRatio = nPunct / nChars
    Tables.documentsPar(spark, sfDir).select(
      col("doc_id"),
      r4(stopRatio).as("stop_ratio"),
      r4(punctRatio).as("punct_ratio"),
      qualityCol(col("text")).as("quality"))
  }

  /** q18: marker-profile language ID — count marker hits per profile,
    * argmax with deterministic tie-break (score DESC, lang ASC), unmatched
    * docs → 'und'.
    *
    * Scale shape: ONE narrow map via the native LangId expression
    * (graft.functions) — no explode, no join, no shuffle; profiles are
    * constants compiled into the expression. (The original
    * explode + broadcast-join + two-agg plan shuffled the exploded token
    * stream twice; PortableHashSpec pins the native semantics to it.)
    */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    // native one-pass LangId expression: the original explode + broadcast
    // join + two-agg form shuffled the exploded token stream twice; this is
    // a single narrow map (same semantics, pinned in PortableHashSpec)
    val r = graft.functions.chess.langId(col("text"))
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      coalesce(r.getField("lang"), lit("und")).as("lang_pred"),
      coalesce(r.getField("score"), lit(0L)).as("score"))
  }

  /** q19: document fingerprint — md5 over whitespace-canonicalized,
    * lowercased text (content-defined identity for exact dedup keys).
    */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      md5(to_binary(lower(regexp_replace(trim(col("text")), "\\s+", " ")), lit("utf-8")))
        .as("fp"))

  // ---- generated oracle SQL (same constants → no drift) ----

  /** Subword vocabulary for the BPE-ish tokenizer (q66). Greedy
    * longest-match segmentation with a fixed learned vocabulary is exactly
    * how BPE/WordPiece behave at INFERENCE time (the merges are learned
    * offline; applying them reduces to longest-prefix matching) — encoded
    * here as an ordered-alternation regex with the vocab sorted longest
    * first plus a single-character fallback. Both Java regex (Spark) and
    * RE2 (DuckDB) use leftmost, first-alternative-wins semantics, so the
    * segmentation is engine-identical; the pattern is generated from this
    * one list on both sides.
    */
  val SubwordVocab: Seq[String] = Seq(
    "stream", "window", "table", "batch", "query", "scan", "join", "sort",
    "merge", "filter", "data", "row", "key", "er", "in", "st", "re", "an",
    "ta", "ow", "me", "al", "ue", "lu")

  private val subwordPattern: String =
    SubwordVocab.sortBy(v => (-v.length, v)).mkString("(", "|", "|[a-z0-9])")

  /** q66: BPE-ish subword tokenization — per-document subword count and
    * distinct-subword count. One scan, narrow map (regex runs inside
    * codegen); the segmentation itself is the deterministic longest-match
    * pass a tokenizer service would run over the corpus at scale.
    */
  def subwordTokens(spark: SparkSession, sfDir: String): DataFrame = {
    val subs = regexp_extract_all(lower(col("text")), lit(subwordPattern), lit(0))
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      size(subs).as("n_subwords"),
      size(array_distinct(subs)).as("n_unique"))
  }

  val subwordTokensSql: String =
    s"""SELECT doc_id,
       |  len(regexp_extract_all(lower(text), '$subwordPattern'))::INT AS n_subwords,
       |  len(list_distinct(regexp_extract_all(lower(text), '$subwordPattern')))::INT AS n_unique
       |FROM documents""".stripMargin

  /** Redaction patterns (q71) — email-shaped tokens, SSN-shaped triples,
    * long digit runs. Plain character-class regexes supported identically
    * by Java regex (Spark) and RE2 (DuckDB); ordered so the more specific
    * pattern runs first (an SSN must not be half-eaten by the digit-run
    * rule). Single source for both engines.
    */
  val RedactPatterns: Seq[(String, String)] = Seq(
    ("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
    ("[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    ("[0-9]{6,}", "<NUM>"))

  /** q71: PII-style redaction — the scrub pass a training-data pipeline
    * runs before anything persists. The synthetic corpus has no PII, so the
    * query plants deterministic id-derived contact strings first (both
    * engines build the identical text), then redacts and reports the
    * per-pattern hit count and an md5 of the scrubbed text (a full-content
    * equality check compressed to 32 hex chars). One scan, narrow maps.
    */
  def redact(spark: SparkSession, sfDir: String): DataFrame = {
    val planted = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com ssn "),
      lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-55-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" acct "), (col("doc_id") * 7919 + 1000000L).cast("string"))
    // count hits SEQUENTIALLY on the progressively-redacted text, exactly
    // mirroring the replacements performed: counting every pattern on the
    // raw text would double-count overlaps (a long doc_id's digits inside
    // the planted email match both the email and the digit-run patterns,
    // but only the email replacement ever runs on them)
    val (redacted, hits) =
      RedactPatterns.foldLeft((planted, lit(0))) { case ((c, h), (pat, repl)) =>
        (regexp_replace(c, pat, repl),
          h + size(regexp_extract_all(c, lit(pat), lit(0))))
      }
    Tables.documentsPar(spark, sfDir).select(
      col("doc_id"),
      hits.as("n_redactions"),
      length(redacted).cast("int").as("redacted_len"),
      md5(to_binary(redacted, lit("utf-8"))).as("redacted_md5"))
  }

  val redactSql: String = {
    val planted =
      """(text || ' contact user' || doc_id || '@example.com ssn ' ||
        | lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-55-' ||
        | lpad((doc_id % 10000)::VARCHAR, 4, '0') ||
        | ' acct ' || (doc_id * 7919 + 1000000)::VARCHAR)""".stripMargin
        .replace("\n", "")
    // same sequential count-then-replace fold as the Spark side
    val (redacted, hitTerms) =
      RedactPatterns.foldLeft((planted, Seq.empty[String])) {
        case ((c, hs), (pat, repl)) =>
          (s"regexp_replace($c, '$pat', '$repl', 'g')",
            hs :+ s"len(regexp_extract_all($c, '$pat'))")
      }
    val hits = hitTerms.mkString("(", " + ", ")::INT")
    s"""SELECT doc_id,
       |  $hits AS n_redactions,
       |  length($redacted)::INT AS redacted_len,
       |  md5($redacted) AS redacted_md5
       |FROM documents""".stripMargin
  }

  /** Minimum document frequency for a shingle to count as boilerplate, and
    * how many to report (q72) — shared with the oracle. The synthetic
    * corpus is i.i.d. random text (max 3-gram df ≈ 9 at gate scale), so the
    * threshold sits where its df tail actually is; a real crawl would use
    * a df *fraction* of the corpus.
    */
  val BoilerplateMinDf = 5
  val BoilerplateTopK = 25

  /** q72: boilerplate detection — the 3-gram shingles shared by the most
    * documents (site chrome, license headers, templates — the stuff corpus
    * curation strips before training). Reuses the dedup stack's distinct
    * shingle hashes: explode → document-frequency aggregation → threshold →
    * deterministic top-k. Map-side combine keeps the shuffle O(distinct
    * shingles); the same inverted-index shape as q21 minus the pairing.
    */
  def boilerplate(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(graft.functions.chess.shingleHashes(col("text"))).as("shingle"))
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= BoilerplateMinDf)
      .orderBy(col("df").desc, col("shingle").asc)
      .limit(BoilerplateTopK)

  val boilerplateSql: String =
    s"""WITH sh AS (${Dedup.shinglesSql})
       |SELECT s AS shingle, count(*) AS df
       |FROM (SELECT unnest(shingles) AS s FROM sh)
       |GROUP BY 1 HAVING count(*) >= $BoilerplateMinDf
       |ORDER BY df DESC, shingle ASC LIMIT $BoilerplateTopK""".stripMargin

  /** q82: intra-document repetition metrics (Gopher-style quality
    * filters): duplicate-token ratio (1 − distinct/total tokens) and
    * duplicate-3-gram ratio (1 − distinct/total shingles) — high values
    * mark degenerate repeated text that corpus curation drops before
    * training. One narrow map per document: the token array and the
    * (already-distinct) native shingle-hash array are computed once in a
    * single projection — no explode, no shuffle, embarrassingly parallel
    * at any corpus size.
    */
  def repetition(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.documents(spark, sfDir).select(
      col("doc_id"),
      tokens(col("text")).as("toks"),
      graft.functions.chess.shingleHashes(col("text")).as("sh"))
    // total 3-grams = max(n_tokens − 2, 0); sh is distinct by construction
    val nTok = size(col("toks"))
    val nShTotal = greatest(nTok - lit(Dedup.ShingleN - 1), lit(0))
    base.select(
      col("doc_id"),
      nTok.as("n_tokens"),
      // a zero-token doc has NO repetition evidence → 0.0, same contract
      // as the dup_shingle_ratio guard (1 − 0/1 = 1.0 would flag empty
      // docs as maximally repetitive)
      r4(when(nTok > 0,
          lit(1.0) - size(array_distinct(col("toks"))).cast("double") /
            nTok.cast("double"))
        .otherwise(lit(0.0))).as("dup_token_ratio"),
      r4(when(nShTotal > 0,
          lit(1.0) - size(col("sh")).cast("double") / nShTotal.cast("double"))
        .otherwise(lit(0.0))).as("dup_shingle_ratio"))
  }

  val repetitionSql: String = {
    val toks = Portable.toksSql
    s"""WITH t AS (SELECT doc_id, $toks AS toks, shingles
       |           FROM documents JOIN (${Dedup.shinglesSql}) USING (doc_id))
       |SELECT doc_id,
       |  len(toks)::INT AS n_tokens,
       |  CASE WHEN len(toks) > 0 THEN
       |    ${Portable.r4Sql("1.0 - len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE")}
       |  ELSE 0.0 END AS dup_token_ratio,
       |  CASE WHEN len(toks) - ${Dedup.ShingleN - 1} > 0 THEN
       |    ${Portable.r4Sql(s"1.0 - len(shingles)::DOUBLE / (len(toks) - ${Dedup.ShingleN - 1})::DOUBLE")}
       |  ELSE 0.0 END AS dup_shingle_ratio
       |FROM t""".stripMargin
  }

  /** q101 scope: merge-candidate ranking depth. */
  val BpeTopK = 30

  /** q101: BPE merge-pair statistics — the first iteration of byte-pair-
    * encoding tokenizer training: count adjacent character pairs across
    * the corpus, weighted by word frequency, and rank the top merge
    * candidates. The standard two-phase shape: words collapse to a
    * (word, freq) vocabulary FIRST (one hash agg — the corpus's token
    * stream never re-shuffles), then the bounded per-word bigram expansion
    * (≤ len−1 pairs) runs over the vocabulary, which is orders of
    * magnitude smaller than the corpus at any scale. Deterministic top-k
    * (weight DESC, pair ASC).
    */
  def bpePairs(spark: SparkSession, sfDir: String): DataFrame = {
    val vocab = Tables.documents(spark, sfDir)
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    vocab
      .filter(length(col("w")) >= 2)
      .select(col("freq"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"), col("w"))
      .select(col("w").substr(col("i"), lit(2)).as("pair"), col("freq"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("weight"))
      .orderBy(col("weight").desc, col("pair").asc)
      .limit(BpeTopK)
  }

  val bpePairsSql: String =
    s"""WITH vocab AS (
       |  SELECT w, count(*) AS freq
       |  FROM (SELECT unnest(${Portable.toksSql}) AS w FROM documents)
       |  GROUP BY 1),
       |pairs AS (
       |  SELECT substr(w, i, 2) AS pair, freq
       |  FROM vocab, LATERAL (SELECT unnest(range(1, len(w))) AS i) r
       |  WHERE len(w) >= 2)
       |SELECT pair, sum(freq)::BIGINT AS weight
       |FROM pairs GROUP BY 1
       |ORDER BY weight DESC, pair ASC LIMIT $BpeTopK""".stripMargin

  /** q102 scope: vocabulary cap and minimum pair document-frequency. */
  val PmiVocabK = 200
  val PmiMinPairDf = 5

  /** q102: PMI collocations — pointwise mutual information over document-
    * level co-occurrence of the top-[[PmiVocabK]] vocabulary:
    * pmi(a,b) = ln(df_ab·N / (df_a·df_b)). The vocabulary cap is the scale
    * contract: co-occurrence is inherently pairwise, so the pair space is
    * bounded at vocab² regardless of corpus size, and the per-doc
    * expansion uses the same sorted posexplode+slice kernel as the dedup
    * inverted indexes (pairs-within-groups, no self-join recompute).
    * Document frequencies are distinct-per-doc (array_distinct before the
    * explode), N rides along as a broadcast 1-row count (the TF-IDF
    * pattern). The single ln() runs on an exact integer ratio — one
    * libm-quality call whose cross-engine ulps die in r4.
    */
  def pmiCollocations(spark: SparkSession, sfDir: String): DataFrame = {
    val toksD = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("w"))
    val vocab = toksD.groupBy(col("w")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("w").asc).limit(PmiVocabK)
    val inVocab = toksD.join(broadcast(vocab.select(col("w"))), "w")
    val pairCounts = inVocab
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("w"))).as("ws"))
      .select(posexplode(col("ws")).as(Seq("i", "a")), col("ws"))
      .select(col("a"),
        explode(slice(col("ws"), col("i") + 2, size(col("ws")))).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("df_ab"))
      .filter(col("df_ab") >= PmiMinPairDf)
    val n = Tables.documents(spark, sfDir).agg(count(lit(1)).as("n_docs"))
    pairCounts
      .join(broadcast(vocab.select(col("w").as("a"), col("df").as("df_a"))), "a")
      .join(broadcast(vocab.select(col("w").as("b"), col("df").as("df_b"))), "b")
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("df_ab"),
        Portable.r4(log(col("df_ab").cast("double") * col("n_docs") /
          (col("df_a") * col("df_b")))).as("pmi"))
  }

  val pmiCollocationsSql: String =
    s"""WITH toks_d AS (
       |  SELECT DISTINCT doc_id, unnest(${Portable.toksSql}) AS w FROM documents),
       |vocab AS (
       |  SELECT w, count(*) AS df FROM toks_d GROUP BY 1
       |  ORDER BY df DESC, w ASC LIMIT $PmiVocabK),
       |iv AS (SELECT doc_id, w FROM toks_d JOIN vocab USING (w)),
       |pc AS (
       |  SELECT x.w AS a, y.w AS b, count(*) AS df_ab
       |  FROM iv x JOIN iv y ON x.doc_id = y.doc_id AND x.w < y.w
       |  GROUP BY 1, 2
       |  HAVING count(*) >= $PmiMinPairDf)
       |SELECT a, b, df_ab,
       |       ${Portable.r4Sql(s"ln(df_ab::DOUBLE * (SELECT count(*) FROM documents) / (va.df * vb.df))")} AS pmi
       |FROM pc
       |JOIN vocab va ON va.w = pc.a
       |JOIN vocab vb ON vb.w = pc.b""".stripMargin

  /** q103: bigram-LM perplexity proxy — score every document by the mean
    * negative log-likelihood of its token bigrams under the corpus's own
    * bigram model (MLE: p(b|a) = C(ab)/C(a·), with C(a·) = Σ_b C(ab) so
    * the conditional is proper). THE classic statistical quality filter:
    * high NLL = text unlike the corpus (garbled, boilerplate-stitched,
    * wrong-language) — the heuristic stand-in for model-based perplexity
    * filtering when no LM is in the container.
    *
    * Scale shape: bigram counting is two hash aggregations over the token
    * stream; scoring joins each doc's bigrams back on the (a, b) equi-key
    * — every bigram in scope is observed (the corpus scored itself), so
    * no smoothing term and no unmatched rows. The ln() runs on an exact
    * integer ratio; the per-doc mean is the same r4-absorbed double
    * aggregation as every avg in the suite.
    */
  /** Adjacent-pair expansion of an array column: one row per (arr[i],
    * arr[i+1]) with the carried columns — the shared kernel of q103's
    * bigram builder and q104's pair counter (and their SQL twins via
    * [[adjacentPairsSql]]).
    */
  private[ops] def adjacentPairs(df: DataFrame, arr: String,
      carry: Seq[String]): DataFrame =
    df.filter(size(col(arr)) >= 2)
      .select(carry.map(col) :+
        explode(sequence(lit(1), size(col(arr)) - 1)).as("i") :+ col(arr): _*)
      .select(carry.map(col) :+
        element_at(col(arr), col("i")).as("a") :+
        element_at(col(arr), col("i") + 1).as("b"): _*)

  /** Oracle twin of [[adjacentPairs]]: `arr` and carried columns in scope. */
  private[ops] def adjacentPairsSql(from: String, arr: String, carry: String): String =
    s"""SELECT $carry $arr[i] AS a, $arr[i + 1] AS b
       |  FROM $from, LATERAL (SELECT unnest(range(1, len($arr))) AS i) r
       |  WHERE len($arr) >= 2""".stripMargin

  def perplexity(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables.documents(spark, sfDir)
      .select(col("doc_id"), tokens(col("text")).as("ts"))
    val bi = adjacentPairs(t, "ts", Seq("doc_id"))
    val cab = bi.groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
    val ca = cab.groupBy(col("a")).agg(sum(col("n_ab")).as("n_a"))
    bi.join(cab, Seq("a", "b"))
      .join(ca, Seq("a"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        r4(-avg(log(col("n_ab").cast("double") / col("n_a").cast("double"))))
          .as("nll"))
  }

  val perplexitySql: String =
    s"""WITH t AS (SELECT doc_id, ${Portable.toksSql} AS ts FROM documents),
       |bi AS (
       |  ${adjacentPairsSql("t", "ts", "doc_id,")}),
       |cab AS (SELECT a, b, count(*) AS n_ab FROM bi GROUP BY 1, 2),
       |ca AS (SELECT a, sum(n_ab)::BIGINT AS n_a FROM cab GROUP BY 1)
       |SELECT doc_id, count(*) AS n_bigrams,
       |       ${Portable.r4Sql("-avg(ln(n_ab::DOUBLE / n_a::DOUBLE))")} AS nll
       |FROM bi JOIN cab USING (a, b) JOIN ca USING (a)
       |GROUP BY 1""".stripMargin

  /** q104: number of BPE merge rounds (unrolled identically in the oracle). */
  val BpeTrainRounds = 3

  /** q104: iterative BPE training — q101 is one merge-pair count; this runs
    * the actual loop: pick the heaviest pair, APPLY the merge to the symbol
    * sequences, recount, repeat.
    *
    * Representation: every symbol is WRAPPED in \u0001 on both sides
    * (`\u0001a\u0001\u0001b\u0001...`), so applying merge (a, b) is the
    * literal replacement `\u0001a\u0001\u0001b\u0001 → \u0001ab\u0001`.
    * The wrapping makes each occurrence's delimiters disjoint from its
    * neighbours', which gives exact BPE semantics under both engines'
    * leftmost non-overlapping `replace`: consecutive occurrences (`abab`)
    * all merge, and a symbol can never false-match across a boundary
    * (matching `a` demands the separator on BOTH its sides, so a suffix of
    * a longer symbol like `za` never matches — a naive single-separator
    * encoding gets exactly that case wrong). Each round's argmax is ONE
    * collected row — the CC/PageRank scalar-probe class — and
    * `localCheckpoint` truncates the per-round lineage (the iterative
    * replay trap). Tokens containing the sentinel are excluded up front on
    * both engines. Output: one row per completed round (step, merged pair,
    * weight); the loop stops early when no pair remains, and the oracle
    * guards its unrolled rounds the same way.
    */
  def bpeTrain(spark: SparkSession, sfDir: String): DataFrame = {
    val vocab = Tables.documents(spark, sfDir)
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    bpeTrainVocab(spark, vocab)
  }

  /** The q104 loop over any (w, freq) vocabulary — also the spec surface
    * (TextOpsSpec drives it with the cross-boundary counterexample corpus
    * that a naive single-separator merge encoding gets wrong).
    */
  def bpeTrainVocab(spark: SparkSession,
      rawVocab: DataFrame): DataFrame = {
    val Sep = "\u0001"
    val vocab = rawVocab.filter(!col("w").contains(Sep))
    var syms = vocab.select(
      regexp_replace(col("w"), "(.)", Sep + "$1" + Sep).as("sym"),
      col("freq")).lineageCheckpoint()
    val merges = scala.collection.mutable.ListBuffer.empty[(Int, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= BpeTrainRounds && !exhausted) {
      val best = adjacentPairs(
          syms.select(col("freq"),
            split(trim(col("sym"), Sep), Sep + Sep).as("ss")),
          "ss", Seq("freq"))
        .groupBy(col("a"), col("b")).agg(sum(col("freq")).as("weight"))
        .orderBy(col("weight").desc, col("a").asc, col("b").asc)
        .limit(1).collect().headOption
      best match {
        case None => exhausted = true
        case Some(row) =>
          val (a, b, w) = (row.getString(0), row.getString(1), row.getLong(2))
          syms = syms.select(
            replace(col("sym"),
              lit(Sep + a + Sep + Sep + b + Sep), lit(Sep + a + b + Sep))
              .as("sym"),
            col("freq")).lineageCheckpoint()
          merges += ((step, a + "+" + b, w))
          step += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("step", "merge", "weight")
  }

  val bpeTrainSql: String = {
    val sep = "chr(1)"
    // every symbol wrapped in the separator on both sides (see bpeTrain
    // scaladoc): s0 wraps each character; pair extraction trims the outer
    // separators and splits on the doubled inter-symbol separator; merge
    // application replaces the fully-delimited occurrence
    def pairsOf(prev: String, k: Int): String =
      s"""p$k AS (
         |  SELECT a, b, sum(freq)::BIGINT AS weight FROM (
         |    ${adjacentPairsSql(
               s"(SELECT string_split(trim(sym, $sep), $sep || $sep) AS ss, freq FROM $prev)",
               "ss", "freq,")})
         |  GROUP BY 1, 2),
         |bp$k AS (SELECT a, b, weight FROM p$k
         |         ORDER BY weight DESC, a ASC, b ASC LIMIT 1)""".stripMargin
    def applyOf(prev: String, k: Int): String =
      s"""s$k AS (
         |  SELECT replace(sym,
         |           (SELECT $sep || a || $sep || $sep || b || $sep FROM bp$k),
         |           (SELECT $sep || a || b || $sep FROM bp$k)) AS sym, freq
         |  FROM $prev)""".stripMargin
    val rounds = (1 to BpeTrainRounds).map { k =>
      val prev = if (k == 1) "s0" else s"s${k - 1}"
      pairsOf(prev, k) +
        (if (k < BpeTrainRounds) ",\n" + applyOf(prev, k) else "")
    }.mkString(",\n")
    val selects = (1 to BpeTrainRounds).map { k =>
      s"""SELECT $k AS step,
         |  (SELECT a || '+' || b FROM bp$k) AS merge,
         |  (SELECT weight FROM bp$k) AS weight
         |WHERE EXISTS (SELECT 1 FROM p$k)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH vocab AS (
       |  SELECT w, count(*) AS freq
       |  FROM (SELECT unnest(${Portable.toksSql}) AS w FROM documents)
       |  WHERE w NOT LIKE '%' || $sep || '%'
       |  GROUP BY 1),
       |s0 AS (
       |  SELECT regexp_replace(w, '(.)', $sep || '\\1' || $sep, 'g') AS sym,
       |         freq
       |  FROM vocab),
       |$rounds
       |$selects""".stripMargin
  }

  private def sqlList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("(", ",", ")")

  val tokenStatsSql: String =
    """SELECT doc_id,
      |  len(list_filter(string_split_regex(trim(text), '\s+'), t -> len(t) > 0))::INT AS n_tokens,
      |  length(text)::INT AS len_chars,
      |  round(length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE /
      |        greatest(len(list_filter(string_split_regex(trim(text), '\s+'), t -> len(t) > 0)), 1), 4) AS avg_token_len
      |FROM documents""".stripMargin

  private def stopRatioSql: String = {
    val toks = """list_filter(string_split_regex(trim(text), '\s+'), t -> len(t) > 0)"""
    s"""len(list_filter($toks, t -> t IN ${sqlList(Stopwords)}))::DOUBLE
       |        / greatest(len($toks), 1)""".stripMargin
  }

  private val punctRatioSql: String =
    s"""length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE
       |        / greatest(length(text), 1)""".stripMargin

  /** Oracle twin of [[qualityCol]] (r4 applied, `text` in scope). */
  private[ops] val qualitySqlExpr: String =
    Portable.r4Sql(s"""0.5 * least(length(text)::DOUBLE / 500.0, 1.0)
      |      + 0.3 * (1.0 - abs($stopRatioSql - 0.1))
      |      + 0.2 * (1.0 - $punctRatioSql)""".stripMargin)

  val qualityScoreSql: String =
    s"""SELECT doc_id,
       |  ${Portable.r4Sql(stopRatioSql)} AS stop_ratio,
       |  ${Portable.r4Sql(punctRatioSql)} AS punct_ratio,
       |  $qualitySqlExpr AS quality
       |FROM documents""".stripMargin

  val langIdSql: String = {
    val markerValues = LangProfiles
      .flatMap { case (l, ws) => ws.map(w => s"('$l','$w')") }.mkString(", ")
    s"""WITH markers(p_lang, word) AS (VALUES $markerValues),
       |toks AS (
       |  SELECT doc_id, unnest(list_filter(string_split_regex(trim(text), '\\s+'),
       |                                    t -> len(t) > 0)) AS word
       |  FROM documents),
       |hits AS (
       |  SELECT doc_id, p_lang, count(*) AS score
       |  FROM toks JOIN markers USING (word)
       |  GROUP BY 1, 2),
       |best AS (
       |  SELECT doc_id, p_lang AS lang_pred, score,
       |         row_number() OVER (PARTITION BY doc_id
       |                            ORDER BY score DESC, p_lang ASC) AS rn
       |  FROM hits)
       |SELECT d.doc_id,
       |       coalesce(b.lang_pred, 'und') AS lang_pred,
       |       coalesce(b.score, 0) AS score
       |FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)""".stripMargin
  }

  val fingerprintSql: String =
    """SELECT doc_id,
      |  md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
      |FROM documents""".stripMargin

  // ------------------------------------------------- q122 BPE encoding

  /** Fixed merge table applied by q122, in application order — the
    * "trained tokenizer" artifact (q104 is the trainer; a production run
    * feeds its merge list here). Chained merges (`th+e`) exercise the
    * merge-of-a-merge path.
    */
  val BpeApplyMerges: Seq[(String, String)] =
    Seq(("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"))

  /** q122: tokenizer application — encode every document with the fixed
    * [[BpeApplyMerges]] table and report per-doc token/char/symbol counts
    * and the chars-per-symbol compression ratio. Training (q104) runs once
    * over a vocabulary; ENCODING runs over the whole corpus on every
    * pipeline pass, which makes it the throughput-critical half of the
    * tokenizer stack.
    *
    * Representation is q104's sentinel-wrapped form (every symbol
    * delimited on both sides), so each merge is one literal
    * leftmost-non-overlapping replace with exact BPE semantics on both
    * engines; symbols per token = split on the doubled separator. Scale
    * shape: ONE narrow map — tokenize, per-token HOF applies the K
    * replaces and counts, two aggregates fold the token array; no
    * explode, no shuffle, no join anywhere. Sentinel-carrying tokens are
    * excluded up front (the q104 rule).
    */
  def bpeEncode(spark: SparkSession, sfDir: String): DataFrame = {
    val Sep = "\u0001"
    def syms(t: Column): Column = {
      val wrapped = regexp_replace(t, "(.)", Sep + "$1" + Sep)
      val applied = BpeApplyMerges.foldLeft(wrapped) { case (acc, (a, b)) =>
        replace(acc, lit(Sep + a + Sep + Sep + b + Sep), lit(Sep + a + b + Sep))
      }
      size(split(trim(applied, Sep), Sep + Sep))
    }
    Tables.documentsPar(spark, sfDir)
      .select(col("doc_id"),
        filter(tokens(col("text")), t => !t.contains(Sep)).as("ws"))
      .select(col("doc_id"),
        size(col("ws")).as("n_tok"),
        aggregate(transform(col("ws"), t => length(t).cast("long")),
          lit(0L), (acc, x) => acc + x).as("n_chars"),
        aggregate(transform(col("ws"), t => syms(t).cast("long")),
          lit(0L), (acc, x) => acc + x).as("n_sym"))
      .select(col("doc_id"), col("n_tok"), col("n_chars"), col("n_sym"),
        when(col("n_sym") === 0L, lit(0.0))
          .otherwise(Portable.r4(col("n_chars").cast("double") / col("n_sym")))
          .as("compression"))
  }

  val bpeEncodeSql: String = {
    val sep = "chr(1)"
    val applied = BpeApplyMerges.foldLeft(
      s"regexp_replace(w, '(.)', $sep || '\\1' || $sep, 'g')") {
      case (acc, (a, b)) =>
        s"replace($acc, $sep || '$a' || $sep || $sep || '$b' || $sep, $sep || '$a$b' || $sep)"
    }
    s"""WITH t AS (
       |  SELECT doc_id,
       |         list_filter(${Portable.toksSql},
       |                     w -> NOT contains(w, $sep)) AS ws
       |  FROM documents),
       |e AS (
       |  SELECT doc_id, len(ws)::INT AS n_tok,
       |         coalesce(list_sum(list_transform(ws, w -> len(w))), 0)::BIGINT AS n_chars,
       |         coalesce(list_sum(list_transform(ws,
       |           w -> len(string_split(trim($applied, $sep), $sep || $sep)))),
       |           0)::BIGINT AS n_sym
       |  FROM t)
       |SELECT doc_id, n_tok, n_chars, n_sym,
       |       CASE WHEN n_sym = 0 THEN 0.0
       |            ELSE ${Portable.r4Sql("n_chars::DOUBLE / n_sym")} END AS compression
       |FROM e""".stripMargin
  }

  // --------------------------------------------- q209 tokenizer fertility

  /** q209: per-language tokenizer fertility — subword symbols per
    * whitespace word and characters per subword, from the q122-applied
    * BPE merge table, aggregated by language. THE multilingual-tokenizer
    * audit (a vocabulary trained on one language's statistics fragments
    * the others — high fertility = more sequence positions per word =
    * that language pays more compute and fits less context per document),
    * read next to q152's OOV coverage and q199's budget table when
    * deciding whether the tokenizer or the mixture is what needs fixing.
    *
    * Scale shape: the q122 encode (one narrow scan) + one hash agg to
    * |langs| rows; all sums exact BIGINTs, two r4'd divisions at the end.
    */
  def fertility(spark: SparkSession, sfDir: String): DataFrame =
    bpeEncode(spark, sfDir)
      .join(Tables.documents(spark, sfDir).select(col("doc_id"), col("lang")),
        "doc_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok").cast("long")).as("n_words"),
        sum(col("n_sym")).as("n_subwords"),
        sum(col("n_chars")).as("nc"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_subwords"),
        when(col("n_words") === 0L, lit(0.0))
          .otherwise(Portable.r4(col("n_subwords").cast("double") /
            col("n_words").cast("double"))).as("fertility"),
        when(col("n_subwords") === 0L, lit(0.0))
          .otherwise(Portable.r4(col("nc").cast("double") /
            col("n_subwords").cast("double"))).as("chars_per_subword"))

  val fertilitySql: String =
    s"""WITH enc AS (${bpeEncodeSql.replace("\n", "\n  ")})
       |SELECT d.lang, count(*) AS n_docs,
       |       sum(e.n_tok)::BIGINT AS n_words,
       |       sum(e.n_sym)::BIGINT AS n_subwords,
       |       CASE WHEN sum(e.n_tok) = 0 THEN 0.0
       |            ELSE ${Portable.r4Sql(
             "sum(e.n_sym)::DOUBLE / sum(e.n_tok)::DOUBLE")} END AS fertility,
       |       CASE WHEN sum(e.n_sym) = 0 THEN 0.0
       |            ELSE ${Portable.r4Sql(
             "sum(e.n_chars)::DOUBLE / sum(e.n_sym)::DOUBLE")} END
       |         AS chars_per_subword
       |FROM enc e JOIN documents d USING (doc_id)
       |GROUP BY 1""".stripMargin

  // --------------------------------------------------------- q141 BM25

  val Bm25K1 = 1.2
  val Bm25B = 0.75
  /** Fixed query-term set (corpus vocabulary words) — the bounded "query
    * sample" a retrieval pipeline scores against; shared with the oracle.
    */
  val Bm25Terms: Seq[String] = Seq("spark", "join", "filter")

  /** q141: BM25 relevance scoring — the classic lexical ranking function
    * (Robertson-Spärck Jones), scoring every document against a fixed term
    * set with per-term idf and length-normalized tf saturation. The
    * retrieval sibling of q54's TF-IDF (whose weights feed vector search;
    * BM25 IS the ranking) — what a RAG/data-curation stack runs for
    * keyword retrieval next to the ANN path (q25–q26), and the first-stage
    * ranker most hybrid search systems still use.
    *
    * Scale shape: per-term tf is a narrow HOF count inside the document
    * scan (|terms| is a small constant — no explode, no posting-list
    * shuffle); corpus statistics (N, Σdl, per-term df) are ONE 1-row
    * aggregate broadcast back; scoring is a pure projection. Total: one
    * scan + one 1-row agg — scan-speed at 100 TB.
    *
    * Parity: idf/tf arithmetic is written in the identical association
    * order on both engines over exact integer inputs, so the only
    * cross-engine wiggle is ln()'s final ulp — absorbed by r4 (the
    * q102/q103 precedent). Constants are interpolated from one Scala
    * definition.
    */
  def bm25(spark: SparkSession, sfDir: String): DataFrame = {
    val toksC = tokens(col("text"))
    val base = Tables.documentsPar(spark, sfDir).select(
      col("doc_id") +: size(toksC).cast("long").as("dl") +:
        Bm25Terms.zipWithIndex.map { case (t, i) =>
          size(filter(toksC, x => x === lit(t))).cast("long").as(s"tf_$i") }: _*)
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl") +:
        Bm25Terms.indices.map(i =>
          sum((col(s"tf_$i") > 0).cast("long")).as(s"df_$i")): _*)
    val k1p1 = Bm25K1 + 1.0
    val oneMinusB = 1.0 - Bm25B
    val score = Bm25Terms.indices.map { i =>
      val tf = col(s"tf_$i").cast("double")
      val dfd = col(s"df_$i").cast("double")
      val idf = log(lit(1.0) +
        (col("n_docs").cast("double") - dfd + lit(0.5)) / (dfd + lit(0.5)))
      idf * (tf * lit(k1p1)) /
        (tf + lit(Bm25K1) * (lit(oneMinusB) +
          lit(Bm25B) * col("dl").cast("double") * col("n_docs").cast("double") /
            col("sum_dl").cast("double")))
    }.reduce(_ + _)
    val tfTotal = Bm25Terms.indices.map(i => col(s"tf_$i")).reduce(_ + _)
    base.crossJoin(broadcast(stats))
      .filter(tfTotal > 0)
      .select(col("doc_id"), tfTotal.as("tf_total"), r4(score).as("score"))
  }

  val bm25Sql: String = {
    val k1p1 = Bm25K1 + 1.0
    val oneMinusB = 1.0 - Bm25B
    val tfCols = Bm25Terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(toks, x -> x = '$t'))::BIGINT AS tf_$i" }.mkString(",\n       |       ")
    val dfCols = Bm25Terms.indices.map(i =>
      s"sum((tf_$i > 0)::INT)::BIGINT AS df_$i").mkString(", ")
    val terms = Bm25Terms.indices.map { i =>
      s"""ln(1.0 + (n_docs::DOUBLE - df_$i::DOUBLE + 0.5) / (df_$i::DOUBLE + 0.5))
         | * (tf_$i::DOUBLE * $k1p1)
         | / (tf_$i::DOUBLE + $Bm25K1 * ($oneMinusB
         |    + $Bm25B * dl::DOUBLE * n_docs::DOUBLE / sum_dl::DOUBLE))""".stripMargin
    }.mkString(" + ")
    val tfTotal = Bm25Terms.indices.map(i => s"tf_$i").mkString(" + ")
    s"""WITH t AS (SELECT doc_id, ${Portable.toksSql} AS toks FROM documents),
       |b AS (SELECT doc_id, len(toks)::BIGINT AS dl,
       |       $tfCols
       |      FROM t),
       |s AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl, $dfCols FROM b)
       |SELECT doc_id, ($tfTotal) AS tf_total,
       |       ${Portable.r4Sql(s"($terms)")} AS score
       |FROM b, s WHERE $tfTotal > 0""".stripMargin
  }

  // ---------------------------------------------- q152 vocabulary coverage

  /** Vocabulary size for the coverage audit (top corpus tokens by count,
    * ties by token — the q102/q143 cap discipline). The synthetic corpus
    * has ~31 distinct tokens, so the budget is set where coverage actually
    * discriminates per language; a production tokenizer build runs the
    * identical plan with K ≈ 32k–256k (the knob is data, not code).
    */
  val CoverageVocabK = 10

  /** q152: tokenizer vocabulary coverage — per language, the share of
    * corpus tokens covered by a top-[[CoverageVocabK]] frequency
    * vocabulary, i.e. the OOV rate a vocabulary of that size would incur.
    * THE sizing number for a tokenizer build (q104 trains merges; this
    * measures what a vocab budget buys) and a per-language fairness
    * check: a shared vocab sized on the majority language starves the
    * tail languages — exactly what this report surfaces before training.
    *
    * Scale shape: one explode feeds the vocab aggregation (hash agg +
    * top-K on the vocab-sized table); the fact-side join against the
    * vocab is a broadcast (constant K), then one |langs|-row aggregation.
    * Counts exact integers; the two rates divide once each, r4'd.
    */
  def vocabCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    val tok = Tables.documents(spark, sfDir)
      .select(col("lang"), explode(tokens(col("text"))).as("w"))
    val vocab = tok.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc).limit(CoverageVocabK)
    tok.join(broadcast(vocab.select(col("w"), lit(1L).as("iv"))), Seq("w"), "left")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(coalesce(col("iv"), lit(0L))).as("n_invocab"))
      .select(col("lang"), col("n_tokens"), col("n_invocab"),
        r4(col("n_invocab").cast("double") / col("n_tokens").cast("double"))
          .as("coverage"),
        r4((col("n_tokens") - col("n_invocab")).cast("double") /
          col("n_tokens").cast("double")).as("oov_rate"))
  }

  val vocabCoverageSql: String =
    s"""WITH tok AS (
       |  SELECT lang, unnest(${Portable.toksSql}) AS w FROM documents),
       |vocab AS (
       |  SELECT w, count(*) AS c FROM tok GROUP BY 1
       |  ORDER BY c DESC, w ASC LIMIT $CoverageVocabK),
       |j AS (
       |  SELECT t.lang, CASE WHEN v.w IS NULL THEN 0 ELSE 1 END AS iv
       |  FROM tok t LEFT JOIN vocab v ON t.w = v.w),
       |s AS (
       |  SELECT lang, count(*) AS n_tokens, sum(iv)::BIGINT AS n_invocab
       |  FROM j GROUP BY 1)
       |SELECT lang, n_tokens, n_invocab,
       |       ${Portable.r4Sql("n_invocab::DOUBLE / n_tokens::DOUBLE")} AS coverage,
       |       ${Portable.r4Sql("(n_tokens - n_invocab)::DOUBLE / n_tokens::DOUBLE")} AS oov_rate
       |FROM s""".stripMargin

  // ------------------------------------------------ q155 feature hashing

  /** Hashed feature dimensionality (buckets). */
  val HashDim = 16

  /** q155: feature hashing (the hashing trick, Weinberger et al. 2009) —
    * sparse token features projected into a fixed [[HashDim]]-bucket
    * space: bucket = h(token) mod D, sign = a second hash bit, weight =
    * signed count. The vocabulary-free featurizer for linear models /
    * collision-tolerant n-gram features: no vocab table to build, ship,
    * or join — which is exactly why it scales where q54/q152's
    * vocabulary-keyed paths need their dimension builds.
    *
    * Scale shape: one explode + one (doc, bucket) hash aggregation —
    * map-side combinable, uniform 8-byte keys, output bounded by
    * docs × D. Emitted sparse (doc_id, bucket, weight): the dense-array
    * assembly is a presentation step, not a shuffle. All integer: the
    * portable h32 supplies bucket and sign bits on both engines.
    */
  def featureHash(spark: SparkSession, sfDir: String): DataFrame = {
    val h = Portable.h32(col("w"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .select(col("doc_id"),
        pmod(h, lit(HashDim.toLong)).cast("int").as("bucket"),
        when(shiftright(h, 4) % 2 === 0, 1L).otherwise(-1L).as("s"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(sum(col("s")).as("weight"))
  }

  val featureHashSql: String = {
    val h = Portable.h32Sql("w")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(${Portable.toksSql}) AS w FROM documents),
       |f AS (
       |  SELECT doc_id,
       |         (($h) % $HashDim)::INT AS bucket,
       |         CASE WHEN (($h) >> 4) % 2 = 0 THEN 1 ELSE -1 END AS s
       |  FROM tok)
       |SELECT doc_id, bucket, sum(s)::BIGINT AS weight
       |FROM f GROUP BY 1, 2""".stripMargin
  }

  // ------------------------------------------------ q160 lang-ID confusion

  /** q160: language-ID confusion matrix — q18's predictions crossed with
    * the labeled `lang` column: one row per (true, predicted) pair with
    * count and per-truth recall. The classifier-evaluation operator that
    * turns q18 from "produces a label" into "measured at X% per
    * language" — and the audit that shows WHICH languages the marker
    * profiles confuse before anyone trusts the labels downstream (q105,
    * q131, q143, q152 all key on lang).
    *
    * Scale shape: one narrow scan (the native LangId map) + one hash
    * aggregation on the |langs|² key space + a broadcast join of the
    * |langs|-row truth totals. Counts exact; recall divides once, r4'd.
    */
  def langConfusion(spark: SparkSession, sfDir: String): DataFrame = {
    val pred = langId(spark, sfDir).select(col("doc_id"), col("lang_pred"))
    val cells = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"))
      .join(pred, "doc_id")
      .groupBy(col("lang").as("lang_true"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy(col("lang_true")).agg(sum(col("n")).as("n_true"))
    cells.join(broadcast(totals), "lang_true")
      .select(col("lang_true"), col("lang_pred"), col("n"),
        r4(col("n").cast("double") / col("n_true").cast("double")).as("recall"))
  }

  val langConfusionSql: String =
    s"""WITH p AS (SELECT doc_id, lang_pred FROM ($langIdSql)),
       |cells AS (
       |  SELECT d.lang AS lang_true, p.lang_pred, count(*) AS n
       |  FROM documents d JOIN p USING (doc_id)
       |  GROUP BY 1, 2),
       |tot AS (SELECT lang_true, sum(n)::BIGINT AS n_true FROM cells GROUP BY 1)
       |SELECT c.lang_true, c.lang_pred, c.n,
       |       ${Portable.r4Sql("c.n::DOUBLE / t.n_true::DOUBLE")} AS recall
       |FROM cells c JOIN tot t USING (lang_true)""".stripMargin

  // ------------------------------------------------ q234 vocabulary prune

  /** Global corpus frequency below which a vocabulary entry is pruned
    * (the SentencePiece-style min-frequency cutoff). Sized to BITE at the
    * sf0.01 correctness gate (the corpus's rare tail sits below it while
    * the head vocabulary is thousands deep), so the char-fallback branch
    * is oracle-exercised, not just spec-exercised.
    */
  val VocabPruneMinFreq = 100L

  /** q234: vocabulary pruning cost — q152 asks what a top-K vocabulary
    * COVERS; this asks what pruning COSTS. Drop every vocabulary entry
    * whose global corpus frequency is below [[VocabPruneMinFreq]] (the
    * standard min-frequency cutoff of a tokenizer build) and charge the
    * pruned occurrences their character-fallback price: an occurrence of
    * a kept word stays one token, a pruned word falls back to its
    * characters (the byte/char-fallback every production tokenizer
    * ships). Per language: occurrence counts, coverage of the pruned
    * vocabulary, and FERTILITY — output tokens per input word after
    * fallback (1.0 = nothing pruned; the number that actually moves the
    * training budget, since a fertility of 1.3 means 30% more sequence
    * positions for the same text). The fairness read is the q152 one
    * sharpened: a GLOBAL cutoff prunes the tail language's core
    * vocabulary first, and its fertility shows the bill.
    *
    * Scale shape: one token explode feeds the global vocab aggregation
    * (hash agg, vocabulary-sized output); the keep-set joins back to the
    * token stream on the word key (broadcast at gate scale, hash join on
    * Zipf-flat word keys beyond), then one |langs|-row rollup. Counts
    * and character sums are exact integers; the two ratios divide once,
    * r4'd.
    */
  def vocabPrune(spark: SparkSession, sfDir: String): DataFrame =
    vocabPruneAt(spark, sfDir, VocabPruneMinFreq)

  /** The q234 frame at any cutoff — the ModeBench sweep surface. */
  def vocabPruneAt(spark: SparkSession, sfDir: String,
      minFreq: Long): DataFrame = {
    val words = Tables.documents(spark, sfDir)
      .select(col("lang"), explode(tokens(col("text"))).as("w"))
    val kept = words.groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minFreq)
      .select(col("w"), lit(1).as("keep"))
    words.join(kept, Seq("w"), "left")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(when(col("keep").isNotNull, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep").isNotNull, 1L)
          .otherwise(length(col("w")).cast("long"))).as("n_out_tokens"))
      .select(col("lang"), col("n_words"), col("n_kept"),
        Portable.r4(col("n_kept").cast("double") /
          col("n_words").cast("double")).as("coverage"),
        Portable.r4(col("n_out_tokens").cast("double") /
          col("n_words").cast("double")).as("fertility"))
  }

  // -------------------------------------------- q237 Heaps-law growth fit

  /** Number of corpus-prefix measurement points of the vocabulary-growth
    * curve, and the TYPE unit: a type is a [[HeapsGramW]]-token window
    * (identified by its 8-byte span fingerprint — the q168 kernel). Word
    * types would be degenerate here (the synthetic generator's word list
    * is ~31 strong and saturates in the first prefix); n-gram types are
    * the open-vocabulary proxy, and are also what the fingerprint-keyed
    * formulation costs at scale: distinct-on-8-bytes, never on strings.
    */
  val HeapsPoints = 10
  val HeapsGramW = 3

  /** q237: Heaps-law type growth — measure V(n), the distinct
    * [[HeapsGramW]]-gram types after the first n tokens, at
    * [[HeapsPoints]] corpus prefixes, and fit V = K·n^β by OLS on the
    * log-log points. THE capacity-planning curve of a tokenizer/vocab
    * build: β says how fast new types keep arriving, so it predicts the
    * type inventory (and q152's OOV rate) at 100× the corpus from a
    * measurement at 1× — extrapolation being the entire point of
    * fitting a power law.
    *
    * The scalable formulation: a naive V(n) runs one count-distinct per
    * prefix (P corpus passes). Instead each type carries its FIRST
    * occurrence (min doc_id over its fingerprint — one hash agg), types
    * bucket by the prefix point their first occurrence falls in, and V
    * at point k is the running sum of bucket counts — P numbers from
    * TWO hash aggs and a [[HeapsPoints]]-element in-array cumulation
    * (no corpus pass per point, no partition-less window; the rankPool
    * collect discipline on a constant-size frame). Type identity is the
    * 8-byte fingerprint — the q168 collision caveat applies (~2⁻⁶⁴ per
    * pair; a collision UNDERCOUNTS V by one).
    *
    * Parity: buckets, first-docs, and cumulative counts are exact
    * integers; the OLS slope divides centered integer-derived log sums
    * once, r4'd (ln skew ≪ the r4 grid, the q103 precedent).
    */
  def heapsLaw(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), tokens(col("text")).as("ts"), col("text"))
    val nDocs = docs.agg((max(col("doc_id")) + 1L).as("nd"))
    // bucket k of a doc: 1..P by doc_id position in [0, nd)
    def bucketOf(d: Column, nd: Column): Column =
      least(floor(d.cast("double") * HeapsPoints / nd.cast("double"))
        .cast("long") + 1L, lit(HeapsPoints.toLong))
    val words = docs.select(col("doc_id"),
      explode(graft.functions.chess.spanHashes(col("text"), HeapsGramW))
        .as("w"))
    val firstK = words.groupBy(col("w")).agg(min(col("doc_id")).as("fd"))
      .crossJoin(broadcast(nDocs))
      .select(bucketOf(col("fd"), col("nd")).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("new_types"))
    val tokK = docs.crossJoin(broadcast(nDocs))
      .select(bucketOf(col("doc_id"), col("nd")).as("k"),
        size(col("ts")).cast("long").as("nt"),
        lit(1L).as("one"))
      .groupBy(col("k"))
      .agg(sum(col("nt")).as("toks"), sum(col("one")).as("docs"))
    // cumulate the P-point frame inside one collected array (constant
    // size), then OLS on the log points from the same exploded frame
    val points = tokK.join(firstK, Seq("k"), "left")
      .agg(sort_array(collect_list(struct(col("k"), col("docs"), col("toks"),
        coalesce(col("new_types"), lit(0L)).as("nv")))).as("ps"))
      .select(explode(expr(
        """transform(ps, (p, i) ->
          |  struct(p.k as k,
          |    aggregate(slice(ps, 1, i + 1), 0L, (a, x) -> a + x.docs) as n_docs,
          |    aggregate(slice(ps, 1, i + 1), 0L, (a, x) -> a + x.toks) as n_tokens,
          |    aggregate(slice(ps, 1, i + 1), 0L, (a, x) -> a + x.nv) as vocab))
          |""".stripMargin)).as("p"))
      .select(col("p.k").as("k"), col("p.n_docs").as("n_docs"),
        col("p.n_tokens").as("n_tokens"), col("p.vocab").as("vocab"))
      .lineageCheckpoint() // P rows; feeds the fit + the output
    val fit = points
      .select(log(col("n_tokens").cast("double")).as("x"),
        log(col("vocab").cast("double")).as("y"))
      .agg(count(lit(1)).cast("double").as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .select(r4((col("sxy") - col("sx") * col("sy") / col("n")) /
        (col("sxx") - col("sx") * col("sx") / col("n"))).as("beta"))
    points.crossJoin(broadcast(fit))
      .select(col("k"), col("n_docs"), col("n_tokens"), col("vocab"),
        col("beta"))
  }

  val heapsLawSql: String = {
    val p = HeapsPoints
    val gw = HeapsGramW
    s"""WITH d AS (SELECT doc_id, ${Portable.toksSql} AS ts FROM documents),
       |nd AS (SELECT max(doc_id) + 1 AS nd FROM d),
       |w AS (
       |  SELECT doc_id,
       |         ${Portable.h64Sql(s"array_to_string(ts[i:i+${gw - 1}], ' ')")} AS w
       |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - ${gw - 2})) AS i
       |        FROM d WHERE len(ts) >= $gw)),
       |fk AS (
       |  SELECT least(floor(min(doc_id)::DOUBLE * $p / nd.nd::DOUBLE)::BIGINT
       |               + 1, $p) AS k,
       |         count(*) AS cnt
       |  FROM w, nd GROUP BY w.w, nd.nd),
       |newt AS (SELECT k, count(*)::BIGINT AS nv FROM fk GROUP BY 1),
       |tk AS (
       |  SELECT least(floor(doc_id::DOUBLE * $p / nd.nd::DOUBLE)::BIGINT
       |               + 1, $p) AS k,
       |         count(*)::BIGINT AS docs, sum(len(ts))::BIGINT AS toks
       |  FROM d, nd GROUP BY 1),
       |pts AS (
       |  SELECT tk.k,
       |         sum(tk.docs) OVER (ORDER BY tk.k
       |           ROWS UNBOUNDED PRECEDING) AS n_docs,
       |         sum(tk.toks) OVER (ORDER BY tk.k
       |           ROWS UNBOUNDED PRECEDING) AS n_tokens,
       |         sum(coalesce(newt.nv, 0)) OVER (ORDER BY tk.k
       |           ROWS UNBOUNDED PRECEDING) AS vocab
       |  FROM tk LEFT JOIN newt USING (k)),
       |fit AS (
       |  SELECT ${Portable.r4Sql(
          "(sum(x*y) - sum(x) * sum(y) / count(*)) / " +
            "(sum(x*x) - sum(x) * sum(x) / count(*))")} AS beta
       |  FROM (SELECT ln(n_tokens::DOUBLE) AS x, ln(vocab::DOUBLE) AS y
       |        FROM pts))
       |SELECT k::BIGINT AS k, n_docs::BIGINT AS n_docs,
       |       n_tokens::BIGINT AS n_tokens, vocab::BIGINT AS vocab,
       |       fit.beta
       |FROM pts, fit""".stripMargin
  }

  val vocabPruneSql: String =
    s"""WITH tok AS (
       |  SELECT lang, unnest(${Portable.toksSql}) AS w FROM documents),
       |keep AS (
       |  SELECT w FROM tok GROUP BY 1
       |  HAVING count(*) >= $VocabPruneMinFreq),
       |j AS (
       |  SELECT t.lang, (k.w IS NOT NULL)::INT AS kept, len(t.w) AS wl
       |  FROM tok t LEFT JOIN keep k ON t.w = k.w),
       |g AS (
       |  SELECT lang, count(*)::BIGINT AS n_words,
       |         sum(kept)::BIGINT AS n_kept,
       |         sum(CASE WHEN kept = 1 THEN 1 ELSE wl END)::BIGINT
       |           AS n_out_tokens
       |  FROM j GROUP BY 1)
       |SELECT lang, n_words, n_kept,
       |       ${Portable.r4Sql("n_kept::DOUBLE / n_words::DOUBLE")} AS coverage,
       |       ${Portable.r4Sql("n_out_tokens::DOUBLE / n_words::DOUBLE")}
       |         AS fertility
       |FROM g""".stripMargin

  // -------------------------------------- q272 canonicalization stability

  /** q272: quality-gate stability under text canonicalization — recompute
    * the q17 quality score on the q20 canonical form (trimmed,
    * whitespace-collapsed, lowercased) and report, per source, how many
    * documents FLIP across the funnel's [[graft.ops.CurationPipeline.QualityMin]]
    * gate and the mean score shift. A keep/drop decision that depends on
    * formatting is a silent nondeterminism between ingest paths (two
    * scrapers of the same page disagreeing on whitespace should not
    * disagree on keep) — this is the robustness audit run before wiring
    * q17 into the funnel, and the per-source breakdown names the feed
    * whose formatting interacts worst with the gate.
    *
    * Scale shape: ONE narrow scan evaluating the quality kernel twice per
    * row (no join, no explode reaching the exchange) → a \|sources\|-row
    * hash agg.
    *
    * Parity: both scores are r4-grid; the gate compares their exact 1e4
    * quantizations against an exact literal; the delta sums exact grid
    * integers; rates/means r4'd once.
    */
  def canonStability(spark: SparkSession, sfDir: String): DataFrame = {
    val tau = math.floor(graft.ops.CurationPipeline.QualityMin * 10000.0 + 0.5)
      .toLong
    val canon = lower(regexp_replace(trim(col("text")), "\\s+", " "))
    def qi(q: Column) = floor(q * 10000.0 + 0.5).cast("long")
    val scored = Tables.documentsPar(spark, sfDir).select(col("source"),
      qi(qualityCol(col("text"))).as("qo"),
      qi(qualityCol(canon)).as("qc"))
    scored
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(((col("qo") >= tau) =!= (col("qc") >= tau)).cast("long"))
          .as("n_flips"),
        sum(col("qc") - col("qo")).as("sd"))
      .select(col("source"), col("n"), col("n_flips"),
        Portable.r4(col("n_flips").cast("double") / col("n").cast("double"))
          .as("flip_rate"),
        Portable.r4(col("sd").cast("double") / (col("n").cast("double") * 10000.0))
          .as("mean_delta"))
  }

  val canonStabilitySql: String = {
    val tau = math.floor(graft.ops.CurationPipeline.QualityMin * 10000.0 + 0.5)
      .toLong
    val canonQuality = qualitySqlExpr.replace("text",
      "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))")
    s"""WITH s AS (
       |  SELECT source,
       |         floor(($qualitySqlExpr) * 10000.0 + 0.5)::BIGINT AS qo,
       |         floor(($canonQuality) * 10000.0 + 0.5)::BIGINT AS qc
       |  FROM documents)
       |SELECT source, count(*)::BIGINT AS n,
       |       sum(((qo >= $tau) <> (qc >= $tau))::INT)::BIGINT AS n_flips,
       |       ${Portable.r4Sql(
          s"sum(((qo >= $tau) <> (qc >= $tau))::INT)::DOUBLE / count(*)::DOUBLE")}
       |         AS flip_rate,
       |       ${Portable.r4Sql(
          "sum(qc - qo)::DOUBLE / (count(*)::DOUBLE * 10000.0)")} AS mean_delta
       |FROM s GROUP BY 1""".stripMargin
  }

  // ------------------------------------------- q257 language purity audit

  /** q257: intra-document language-consistency audit (code-switching /
    * mixed-language detection) — run the q18 marker language ID on each
    * HALF of every document and report the (left-lang × right-lang)
    * agreement matrix. A langid-routed pipeline (per-language quality
    * gates, q199/q218 quotas, q234 vocab budgets) silently mis-buckets a
    * document whose halves disagree: the off-diagonal mass of this matrix
    * is exactly that exposure, and the biggest off-diagonal cells say
    * WHICH language pair is being mixed (boilerplate in one language
    * wrapping content in another is the classic web-extraction failure).
    *
    * Scale shape: q18's native one-pass kernel applied twice in ONE
    * narrow map (no explode, no join — the LangId expression carries its
    * marker table as a compiled constant) → a ≤\|langs\|²-row hash agg.
    * Nothing else moves.
    *
    * Parity: the char-midpoint split is identical substr/len arithmetic
    * on both engines; each half then goes through the q18-proven
    * marker-count + (score DESC, lang ASC) argmax; counts exact integers.
    */
  def langPurity(spark: SparkSession, sfDir: String): DataFrame = {
    val half = (length(col("text")) / lit(2)).cast("int")
    val left = col("text").substr(lit(1), half)
    val right = col("text").substr(half + 1, length(col("text")) - half)
    def langOf(t: Column) =
      coalesce(graft.functions.chess.langId(t).getField("lang"), lit("und"))
    Tables.documents(spark, sfDir)
      .select(langOf(left).as("lang_left"), langOf(right).as("lang_right"))
      .groupBy(col("lang_left"), col("lang_right"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("lang_left"), col("lang_right"), col("n_docs"),
        (col("lang_left") === col("lang_right")).cast("int").as("consistent"))
  }

  val langPuritySql: String = {
    val markerValues = LangProfiles
      .flatMap { case (l, ws) => ws.map(w => s"('$l','$w')") }.mkString(", ")
    s"""WITH halves AS (
       |  SELECT doc_id, 'L' AS part,
       |         substr(text, 1, len(text) // 2) AS txt
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id, 'R',
       |         substr(text, len(text) // 2 + 1, len(text) - len(text) // 2)
       |  FROM documents),
       |markers(p_lang, word) AS (VALUES $markerValues),
       |toks AS (
       |  SELECT doc_id, part,
       |         unnest(list_filter(string_split_regex(trim(txt), '\\s+'),
       |                            t -> len(t) > 0)) AS word
       |  FROM halves),
       |hits AS (
       |  SELECT doc_id, part, p_lang, count(*) AS score
       |  FROM toks JOIN markers USING (word)
       |  GROUP BY 1, 2, 3),
       |best AS (
       |  SELECT doc_id, part, p_lang,
       |         row_number() OVER (PARTITION BY doc_id, part
       |                            ORDER BY score DESC, p_lang ASC) AS rn
       |  FROM hits),
       |lab AS (
       |  SELECT h.doc_id, h.part, coalesce(b.p_lang, 'und') AS lang
       |  FROM (SELECT DISTINCT doc_id, part FROM halves) h
       |  LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
       |    ON h.doc_id = b.doc_id AND h.part = b.part),
       |m AS (
       |  SELECT l.lang AS lang_left, r.lang AS lang_right
       |  FROM lab l JOIN lab r ON l.doc_id = r.doc_id
       |  WHERE l.part = 'L' AND r.part = 'R')
       |SELECT lang_left, lang_right, count(*)::BIGINT AS n_docs,
       |       (lang_left = lang_right)::INT AS consistent
       |FROM m GROUP BY 1, 2""".stripMargin
  }
}
