package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, n-gram language ID, document fingerprinting.
  * All pure Column compositions (codegen'd, partition-parallel, no UDFs) —
  * they run at 100 TB exactly like any projection.
  */
object TextOps {

  /** Whitespace tokens of lowercased text; empty text ⇒ empty array. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(lower(text)), "\\s+"))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: one token per word-piece of ≤4 chars —
    * ceil(len/4) per whitespace word, a standard cheap proxy for byte-pair
    * token counts. */
  def bpeTokenEstimate(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + ceil(length(t).cast("double") / 4.0).cast("long"))

  /** Punctuation character count (explicit class, engine-portable). */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:'\"()\\[\\]{}-]", ""))

  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(punctCount(text).cast("double") / length(text))

  /** Small multilingual stopword inventory for ID + quality scoring. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "nicht", "mit", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "des", "une", "dans", "que", "pour"),
    "es" -> Seq("el", "la", "los", "y", "es", "de", "un", "en", "que", "por"))

  private def hitCount(text: Column, words: Seq[String]): Column = {
    val wordArr = array(words.map(lit): _*)
    size(filter(tokens(text), t => array_contains(wordArr, t)))
  }

  /** Fraction of tokens that are (any-language) stopwords. */
  def stopwordRatio(text: Column): Column = {
    val all = stopwords.values.flatten.toSeq.distinct
    when(tokenCount(text) === 0, lit(0.0))
      .otherwise(hitCount(text, all).cast("double") / tokenCount(text))
  }

  /** n-gram/stopword-heuristic language ID: argmax of per-language stopword
    * hit counts; 'und' (undetermined) when nothing hits. Deterministic
    * tie-break by language code. */
  def langId(text: Column): Column = {
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(hitCount(text, words).as("hits"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("hits") === 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Composite quality score in [0,1]: length band + moderate punctuation +
    * healthy stopword ratio + mean-word-length band. The exact formula is
    * engine-defined; what matters is determinism and portability. */
  def qualityScore(text: Column): Column = {
    val n = length(text).cast("double")
    val lenScore = when(n < 100, n / 100.0).when(n > 20000, lit(0.5)).otherwise(lit(1.0))
    val punct = punctRatio(text)
    val punctScore = when(punct > 0.2, lit(0.3)).otherwise(lit(1.0))
    val sw = stopwordRatio(text)
    val swScore = when(sw >= 0.05 && sw <= 0.6, lit(1.0)).otherwise(lit(0.5))
    // NULL text scores 0, explicitly: every sub-condition above is NULL for
    // NULL input and would fall through to the HIGH-score otherwise()
    // branches, handing null-text docs a free 0.85
    when(text.isNull, lit(0.0))
      .otherwise(round((lenScore * 0.4 + punctScore * 0.3 + swScore * 0.3), 6))
  }

  /** BPE-ish regex token count: one token per word / digit / punctuation
    * mark (the standard cheap proxy for byte-pair tokenizers, engine-
    * portable pattern). */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeTokenPattern), lit(0))).cast("bigint")

  /** Normalized-document fingerprint: md5 of lowercased,
    * whitespace-collapsed text. Identical content ⇒ identical fingerprint,
    * robust to case/spacing noise. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** (doc_id, fingerprint) rows — winnowed k-gram fingerprints per doc
    * (MOSS-style: rolling 64-bit hashes of character k-grams, then the
    * minimum of each sliding window of `window` hashes; documents sharing
    * a substring of ≥ k+window−1 chars share a fingerprint). Computed by
    * the fused native kernel [[graft.functions.WinnowFingerprints]]
    * (O(len) rolling hash + monotonic-deque window minimum — the
    * equivalent HOF composition is O(len·window) with two intermediate
    * arrays per row). */
  def winnowFingerprints(docs: DataFrame, k: Int = 12, window: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
        regexp_replace(trim(lower(col(textCol))), "\\s+", " ").as("__norm"))
      .select(col(idCol),
        explode(graft.functions.WinnowFingerprints(col("__norm"), k, window))
          .as("fp_hash"))

  /** Doc pairs sharing ≥ `minShared` winnowed fingerprints — substring-level
    * duplication candidates. Fingerprints occurring in more than `maxDf`
    * docs are dropped before pairing (common-phrase k-grams are quadratic
    * hot keys with no discriminative value — same skew guard as the n-gram
    * Jaccard path). */
  def winnowNearDupPairs(docs: DataFrame, minShared: Int, maxDf: Int = 500,
      k: Int = 12, window: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val fps = winnowFingerprints(docs, k, window, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hot = fps.groupBy(col("fp_hash"))
      .agg(count(lit(1)).as("df")).filter(col("df") > maxDf)
      .select(col("fp_hash"))
    // persisted: feeds BOTH sides of the pair join below — without this the
    // hot-fingerprint aggregate + anti join recompute per side (same guard
    // as ngramJaccardPairs)
    val filtered = fps.join(hot, Seq("fp_hash"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = filtered.select(col("fp_hash"), col(idCol).as("id_a"))
    val b = filtered.select(col("fp_hash"), col(idCol).as("id_b"))
    a.join(b, Seq("fp_hash")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  // ---------------------------------------------------------- text cleaning

  /** Strip HTML/XML tags. */
  def stripHtml(text: Column): Column =
    regexp_replace(text, "<[^>]*>", " ")

  /** Remove URLs (http/https/www forms). */
  def stripUrls(text: Column): Column =
    regexp_replace(text, "(https?://|www\\.)[^\\s]+", " ")

  /** Remove email addresses. */
  def stripEmails(text: Column): Column =
    regexp_replace(text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", " ")

  /** Full cleaning pass: tags → urls → emails → collapse whitespace. */
  def cleanText(text: Column): Column =
    trim(regexp_replace(stripEmails(stripUrls(stripHtml(text))), "\\s+", " "))

  // -------------------------------------------------- URL / domain mining

  /** Host part of every http(s) URL in the text (capture group 1). */
  private[graft] val UrlDomainRe = "https?://([^/\\s]+)"

  /** All URL domains appearing in `text`, as an array (possibly empty). */
  def extractDomains(text: Column): Column =
    regexp_extract_all(text, lit(UrlDomainRe), lit(1))

  /** Canonicalize a URL for URL-level dedup (the crawl-frontier prep that
    * precedes content fetch — the same page reached via tracking params,
    * default ports, fragments, case-variant hosts, or trailing slashes
    * must collapse to ONE frontier entry). Rules, each pinned by spec:
    * fragment dropped; scheme and host lowercased (path and params are
    * case-SENSITIVE per RFC 3986); default port stripped (`:80` for http,
    * `:443` for https — only for the matching scheme); tracking params
    * removed (`utm_*`, `gclid`, `fbclid`, `ref`); remaining params sorted
    * for order-independence; trailing path slash dropped except on the
    * root. Pure `Column` composition (regex in the shared Java∩RE2
    * subset — no lookbehind — plus split/filter/sort/join), so the DuckDB
    * oracle reproduces it and codegen is preserved; a per-row projection
    * at any corpus scale. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostPort = lower(regexp_extract(rest, "^([^/?]+)", 1))
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val pathQ = regexp_replace(rest, "^[^/?]+", "")
    val path0 = regexp_extract(pathQ, "^([^?]*)", 1)
    val path = when(path0 === "" || path0 === "/", lit("/"))
      .otherwise(regexp_replace(path0, "/$", ""))
    val query = regexp_extract(pathQ, "\\?(.*)$", 1)
    val params = filter(split(query, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)="))
    val qsorted = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(qsorted === "", lit("")).otherwise(concat(lit("?"), qsorted)))
  }

  /** Count of characters matching a regex character class — the same
    * length-diff trick as [[punctCount]], so it stays a pure codegen'd
    * projection. Classes must stay inside the Unicode BMP: Spark's
    * `length` counts UTF-16 code units and a code-point engine (the
    * DuckDB oracle) counts code points, which only agree below U+10000. */
  def charClassCount(text: Column, cls: String): Column =
    length(text) - length(regexp_replace(text, cls, ""))

  /** Unicode-script character classes for corpus audits. Literal BMP
    * ranges (no `\p{...}` script names — Java and RE2 spell those
    * differently), so the identical class works in any regex engine. */
  val scriptClasses: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z]",
    "digit" -> "[0-9]",
    "cyrillic" -> "[Ѐ-ӿ]",
    "cjk" -> "[一-鿿]",
    "arabic" -> "[؀-ۿ]")

  /** Script-mix audit: per-script character counts, the dominant script
    * (first of [[scriptClasses]] order to reach the max — a deterministic
    * tie-break both engines reproduce as a CASE chain), and the
    * non-Latin-script fraction. The standard "is this shard actually the
    * language its label claims" corpus check; one projection, no joins,
    * no shuffle. */
  def scriptMix(text: Column): Column = {
    val counts = scriptClasses.map { case (n, cls) =>
      n -> charClassCount(text, cls)
    }
    val g = greatest(counts.map(_._2): _*)
    val main = counts.init.foldRight(lit(counts.last._1): Column) {
      case ((n, c), rest) => when(c === g, lit(n)).otherwise(rest)
    }
    val nonLatin = counts.collect {
      case (n, c) if n != "latin" && n != "digit" => c
    }.reduce(_ + _)
    struct(
      counts.map { case (n, c) => c.as(s"n_$n") } :+
        main.as("main_script") :+
        round(nonLatin.cast("double") / length(text), 6)
          .as("nonlatin_ratio"): _*)
  }

  /** Corpus-level domain statistics: one row per domain with mention count
    * and distinct-document count. The workhorse behind source-mix audits
    * and domain blocklists — one explode + one hash aggregate, no joins. */
  def domainStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), explode(extractDomains(col(textCol))).as("domain"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n"), countDistinct(col(idCol)).as("n_docs"))

  // --------------------------------------------------- repetition signals

  /** Per-doc word-bigram repetition (Gopher-style boilerplate signal):
    * total bigrams, the count of the most frequent bigram, and its fraction
    * of all bigrams. High `top_frac` ⇒ templated/repetitive text. The
    * token array is BOUND via withColumn before the HOF references it —
    * lambdas don't CSE, an inline array would re-tokenize per element. */
  def bigramRepetition(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.withColumn("__tk", tokens(col(textCol)))
      .filter(size(col("__tk")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(0), size(col("__tk")) - 2),
        i => concat_ws(" ", element_at(col("__tk"), i + 1),
          element_at(col("__tk"), i + 2)))).as("bg"))
      .groupBy(col(idCol), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_bigrams"), max(col("c")).as("top_n"))
      .withColumn("top_frac",
        round(col("top_n").cast("double") / col("n_bigrams"), 6))

  // ------------------------------------------------------- PII redaction

  /** PII patterns kept to the regex subset Java and RE2 agree on (no
    * lookaround), so the DuckDB oracle can run the identical expressions. */
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private[graft] val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Replace emails / IPv4 addresses / NNN-NNN-NNNN phone numbers with typed
    * placeholder tokens (not blanks — downstream token statistics stay
    * meaningful). Pure per-row projection: codegen'd, no shuffle. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Count of matches of `re` in `text`, as bigint. */
  def piiCount(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("bigint")

  // ---------------------------------------------------- document chunking

  /** Split each document into fixed-size token chunks with overlap — the
    * context-window prep every training pipeline runs before packing.
    * Chunk `i` covers tokens `[i*stride, i*stride + chunkSize)` (clipped
    * at the document end), so consecutive chunks share
    * `chunkSize - stride` tokens. Output: (idCol, chunk_idx,
    * n_chunk_tokens, chunk_md5) — the md5 pins the exact token content
    * without materializing duplicated text. Empty documents produce no
    * chunks. Pure projection + explode: no shuffle, partition-parallel,
    * output rows ≈ n_tokens/stride per doc — the 100 TB shape is the
    * input's. */
  def chunkTokens(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", chunkSize: Int = 64,
      stride: Int = 48): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunk=$chunkSize stride=$stride")
    docs.select(col(idCol), tokens(col(textCol)).as("__tk"))
      .withColumn("__n", size(col("__tk")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__tk"), col("__n"),
        explode(sequence(lit(0), col("__n") - 1, lit(stride))).as("__s"))
      .select(col(idCol),
        (col("__s") / stride).cast("int").as("chunk_idx"),
        least(lit(chunkSize), col("__n") - col("__s")).cast("int")
          .as("n_chunk_tokens"),
        md5(concat_ws(" ", slice(col("__tk"), col("__s") + 1, lit(chunkSize))))
          .as("chunk_md5"))
  }

  // ------------------------------------------- cross-document line dedup

  /** Cross-document segment-level dedup — the "line dedup" pass of a
    * crawl pipeline (CCNet-style: dedup paragraphs/lines across the whole
    * corpus, not whole documents): each document is split on `sep`; a
    * segment survives only at its FIRST corpus occurrence (lowest doc id,
    * then lowest position — deterministic on any engine), and not at all
    * if it occurs in more than `maxDf` distinct documents (boilerplate:
    * nav text, cookie banners, repeated headers). Returns (idCol,
    * textCol, n_kept, n_segments) for EVERY input document, text
    * reassembled from the survivors in original order (empty string when
    * nothing survives).
    *
    * Scale shape: the explode is linear; segment stats are two map-side-
    * combined hash aggregates — (fingerprint, doc) → min position, then
    * fingerprint → (first occurrence argmin, exact distinct-doc df); the
    * join back to segments is an ordinary shuffle hash join AQE can
    * rebalance (both sides keyed by fingerprint — a boilerplate segment's
    * fan-out is its df, the thing `maxDf` bounds); reassembly groups by
    * doc id, bounded per group by the source document's own size. No
    * windows, no driver state. Distinct segments colliding on xxhash64
    * would merge (~n²/2⁶⁵ — the same documented trade as
    * [[Dedup.exact]]). */
  def dedupSegments(docs: DataFrame, sep: String = "\n",
      maxDf: Long = Long.MaxValue, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val sepLit = java.util.regex.Pattern.quote(sep)
    val segs = docs
      .select(col(idCol).as("__sd_id"),
        posexplode(split(col(textCol), sepLit)))
      .select(col("__sd_id"), col("pos").as("__sd_pos"),
        col("col").as("__sd_seg"), xxhash64(col("col")).as("__sd_fp"))
    val perDoc = segs.groupBy(col("__sd_fp"), col("__sd_id"))
      .agg(min(col("__sd_pos")).as("__sd_minpos"))
    // the df cap is applied to the per-fingerprint side BEFORE the join:
    // an over-cap (boilerplate) fingerprint then simply has no match and
    // the inner join drops every occurrence — same semantics as a
    // post-join filter, with the join's build side already shrunk
    val perFp = perDoc.groupBy(col("__sd_fp"))
      .agg(min(struct(col("__sd_id").as("d"), col("__sd_minpos").as("p")))
        .as("__sd_first"), count(lit(1)).as("__sd_df"))
      .filter(col("__sd_df") <= maxDf)
    val kept = segs.join(perFp, Seq("__sd_fp"))
      .filter(col("__sd_id") === col("__sd_first").getField("d") &&
        col("__sd_pos") === col("__sd_first").getField("p"))
    val rebuilt = kept.groupBy(col("__sd_id"))
      .agg(count(lit(1)).as("__sd_n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("__sd_pos"), col("__sd_seg")))),
          s => s.getField("__sd_seg")), sep).as("__sd_text"))
    docs.select(col(idCol), col(textCol))
      .join(rebuilt, col(idCol) === col("__sd_id"), "left")
      .select(col(idCol),
        coalesce(col("__sd_text"), lit("")).as(textCol),
        coalesce(col("__sd_n_kept"), lit(0L)).as("n_kept"),
        size(split(col(textCol), sepLit)).cast("bigint").as("n_segments"))
  }

  // ---------------------------------------------------- vocabulary build

  /** Corpus-level vocabulary: one row per distinct token with term
    * frequency `n` and document frequency `df`, filtered to
    * `df >= minDf` (rare-token floor — the tokenizer-vocab prep pass) and
    * optionally truncated to the `topK` most frequent (ties broken by
    * token for a deterministic cut). One explode + one hash aggregate
    * over (doc, token) + one over token — map-side combined, no windows;
    * the top-K sort runs over the FILTERED vocabulary (≪ corpus). */
  def vocabulary(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minDf: Long = 1,
      topK: Int = Int.MaxValue): DataFrame = {
    require(minDf >= 1 && topK >= 1, s"bad dials: minDf=$minDf topK=$topK")
    val v = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("__c"))
      .groupBy(col("token"))
      .agg(sum(col("__c")).as("n"), count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    if (topK == Int.MaxValue) v
    else v.orderBy(col("n").desc, col("token")).limit(topK)
  }

  /** Zipf rank-frequency audit of a corpus: least-squares slope of
    * (ln rank, ln frequency) over the top-`topN` token ranks plus the
    * summary a shard health-check wants (total tokens, vocab size, top-10
    * mass fraction). Natural-language corpora sit near slope −1
    * (Zipf's law); templated/spammy shards flatten or steepen it and
    * pump the top-10 mass — a one-row corpus fingerprint that catches
    * generator bugs and boilerplate floods before training.
    *
    * Scale shape: ONE word-count aggregate over the token stream
    * (map-side combined), a distributed TakeOrdered for the top ranks,
    * and a window over that ≤ topN-row frame only (never the vocab or
    * the corpus); the regression itself is a single-row aggregate of the
    * ln sums. Ranks tie-break (count desc, token asc) so the fit set is
    * engine-deterministic. */
  def zipfAudit(docs: DataFrame, topN: Int = 100,
      textCol: String = "text"): DataFrame = {
    require(topN >= 2, s"topN must be >= 2, got $topN")
    val freq = docs.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val totals = freq.agg(sum(col("n")).cast("bigint").as("n_tokens"),
      count(lit(1)).cast("bigint").as("vocab_size"))
    val top = freq.orderBy(col("n").desc, col("tok")).limit(topN)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("tok"))))
    val x = log(col("rank").cast("double"))
    val y = log(col("n").cast("double"))
    val fit = top.agg(count(lit(1)).cast("double").as("__k"),
      sum(x).as("__sx"), sum(y).as("__sy"),
      sum(x * y).as("__sxy"), sum(x * x).as("__sxx"),
      sum(when(col("rank") <= 10, col("n")).otherwise(0L)).as("__top10"))
    totals.crossJoin(broadcast(fit))
      .select(col("n_tokens"), col("vocab_size"),
        round(col("__top10").cast("double") / col("n_tokens"), 6)
          .as("top10_mass"),
        round((col("__k") * col("__sxy") - col("__sx") * col("__sy"))
          / (col("__k") * col("__sxx") - col("__sx") * col("__sx")), 6)
          .as("zipf_slope"))
  }

  // ------------------------------------------- TF-IDF / BM25 relevance

  /** Per-document top-`k` terms by smoothed TF-IDF (`idf = ln((1+N)/(1+df))
    * + 1`, the sklearn smooth form — never zero, so raw tf still orders
    * terms present in every document). N counts documents with ≥ 1 token.
    *
    * The keyword-extraction pass of a training-data pipeline (doc tagging,
    * topic sharding, relevance features). Scale shape: two hash aggregates
    * over the token stream — (doc, token) tf and token df, both map-side
    * combined — a broadcast 1-row N, one join of tf against the
    * (vocab-sized) df table. N (docs with ≥ 1 token) deliberately derives
    * from the DOCS scan, not the token stream: `size(tokens) > 0` +
    * distinct-count touches each doc row once with no explode — the
    * stateless diamond re-derives branches, so the N branch should be the
    * cheapest possible pass. (A persist of tf was tried and rejected:
    * InMemoryRelation's columnar encode cost 9× the vectorized re-scans
    * it saves.) The only window partitions by document: its partition is
    * the DOC's distinct tokens — bounded by document length, independent
    * of corpus size.
    * `tfidf` is rounded to 4 decimals for cross-engine hash stability
    * (ranks compare unrounded products of integers with a shared ln —
    * exact ties are integer-exact and break on the token). */
  def tfidfTopTerms(docs: DataFrame, k: Int, minDf: Long = 1,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k >= 1 && minDf >= 1, s"bad dials: k=$k minDf=$minDf")
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val n = docs.filter(size(tokens(col(textCol))) > 0)
      .agg(countDistinct(col(idCol)).cast("double").as("__N"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__tfidf").desc, col("token").asc)
    tf.join(df, Seq("token"))
      .crossJoin(broadcast(n))
      .withColumn("__tfidf",
        col("tf") * (log((col("__N") + 1.0) / (col("df") + 1.0)) + 1.0))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("token"), col("tf"), col("df"),
        round(col("__tfidf"), 4).as("tfidf"))
  }

  /** BM25 ranking of documents against a fixed bag of query terms
    * (Robertson/Lucene form: `idf = ln(1 + (N − df + 0.5)/(df + 0.5))`,
    * term weight `idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`) —
    * the retrieval scorer behind quality-targeted corpus selection
    * ("rank the crawl against a textbook-query profile").
    *
    * Scale shape: ONE corpus-scale hash aggregate computes, per document,
    * dl AND a conditional tf per query term (|terms| is a small fixed
    * list, so each term is a `sum(when(token = t, 1))` column — no
    * explode-filter branch, no tf⋈dl join). That doc-scale, narrow
    * (2+|terms| numerics) frame feeds the two consumers — a single 1-row
    * aggregate carrying avgdl, N AND every per-term df (broadcast back),
    * and the scoring projection — so the stateless diamond re-derives it
    * twice, against FOUR corpus derivations in the old dl/tf/df shape
    * (and no tf⋈dl join at all). The final top-`topN` is `orderBy.limit`
    * = distributed TakeOrdered — no single reducer sees more than `topN`
    * survivors per partition. */
  def bm25(docs: DataFrame, queryTerms: Seq[String], topN: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty && topN >= 1, "need query terms and topN >= 1")
    val terms = queryTerms.distinct
    val toks = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("token") === t, 1L).otherwise(0L)).as(s"__tf$i") }
    val perDoc = toks.groupBy(col(idCol))
      .agg(count(lit(1)).as("__dl"), tfCols: _*)
    val dfCols = terms.indices.map(i =>
      sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i"))
    val stats = perDoc.agg(avg(col("__dl")).as("__avgdl"),
      count(lit(1)).cast("double").as("__N") +: dfCols: _*)
    val wCols = terms.indices.map { i =>
      val tf = col(s"__tf$i")
      val df = col(s"__df$i")
      val idf = log(lit(1.0) + (col("__N") - df + 0.5) / (df + 0.5))
      when(tf > 0, idf * tf * (k1 + 1) /
        (tf + lit(k1) * (lit(1 - b) + lit(b) * col("__dl") / col("__avgdl"))))
        .otherwise(lit(0.0))
    }
    val nTerms = terms.indices
      .map(i => when(col(s"__tf$i") > 0, 1L).otherwise(0L)).reduce(_ + _)
    perDoc.crossJoin(broadcast(stats))
      .filter(nTerms > 0)
      .select(col(idCol), nTerms.as("n_terms"), col("__dl").as("dl"),
        round(wCols.reduce(_ + _), 4).as("bm25"))
      .orderBy(col("bm25").desc, col(idCol).asc)
      .limit(topN)
  }

  // ------------------------------------------- lexical diversity signals

  /** Per-document lexical-diversity statistics — the vocabulary-collapse
    * signals (templated/generated text repeats a tiny vocabulary) that
    * complement [[bigramRepetition]]: token count, distinct-token count,
    * type-token ratio, Simpson repeat index `Σc(c-1)/(n(n-1))` (the
    * probability two random tokens are equal — 0 all-distinct, 1
    * single-token spam), and hapax count (tokens occurring once). All
    * ratios are plain divisions of integer aggregates — engine-exact, no
    * transcendental drift. Two hash aggregates, map-side combined; no
    * windows, no joins — the 100 TB shape is a groupBy. Empty documents
    * produce no row. */
  def lexicalDiversity(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
      .groupBy(col(idCol), col("__tok")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("__c") * (col("__c") - 1)).as("__rep"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col(idCol), col("n_tokens"), col("n_types"),
        round(col("n_types").cast("double") / col("n_tokens"), 6).as("ttr"),
        when(col("n_tokens") > 1,
          round(col("__rep").cast("double") /
            (col("n_tokens") * (col("n_tokens") - 1)), 6))
          .otherwise(lit(0.0)).as("simpson"),
        col("n_hapax"))

  // ------------------------------------ Gopher-style quality rule filter

  /** Composite document-quality rule filter in the style of the Gopher /
    * MassiveText heuristics (Rae et al. 2021, table A1 — public): a
    * document passes when ALL of
    *   - word count in [minWords, maxWords]
    *   - mean word length in [3, 10] characters
    *   - ≥ 80% of words contain at least one a–z character
    *   - ≤ 90% of lines start with a bullet (`-`, `*`, `•`)
    *   - ≤ 30% of lines end with an ellipsis (`...` / `…`)
    *   - symbol-to-word ratio (`#` + ellipses per word) < 0.1
    *   - at least `minStopHits` distinct words of `stopList` present (the
    *     "does it look like language" rule — the list is a dial because a
    *     corpus's function words depend on its register/language)
    * Every rule is emitted as its own boolean column (a pipeline tunes
    * and audits rules individually) plus the conjunction `pass`. One pure
    * projection — array/regex expressions over the token and line splits,
    * no joins, no shuffle, per-row at any scale. All ratios are single
    * IEEE divisions of integer counts — engine-exact, oracle-reproducible. */
  def gopherRules(docs: DataFrame, minWords: Int = 50,
      maxWords: Int = 100000,
      stopList: Seq[String] = stopwords("en").take(8),
      minStopHits: Int = 2, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val tk = tokens(col(textCol))
    val nWords = size(tk).cast("long")
    val meanLen = aggregate(tk, lit(0L), (acc, w) => acc + length(w))
      .cast("double") / nWords.cast("double")
    val alphaFrac = size(filter(tk, w => w.rlike("[a-z]")))
      .cast("double") / nWords.cast("double")
    val lines = split(col(textCol), "\n")
    val nLines = size(lines).cast("long")
    val bulletFrac = size(filter(lines, l => l.rlike("^\\s*[-*•]")))
      .cast("double") / nLines.cast("double")
    val ellipsisFrac = size(filter(lines,
        l => l.rlike("(\\.\\.\\.|…)\\s*$")))
      .cast("double") / nLines.cast("double")
    val symbols = regexp_count(col(textCol), lit("#|\\.\\.\\.|…"))
      .cast("long")
    val symbolRatio = symbols.cast("double") / nWords.cast("double")
    val stopHits = stopList.distinct
      .map(s => when(array_contains(tk, s), 1).otherwise(0))
      .reduce(_ + _)
    val rules = Seq(
      "r_word_count" -> (nWords >= minWords && nWords <= maxWords),
      "r_mean_word_len" -> (meanLen >= 3.0 && meanLen <= 10.0),
      "r_alpha_words" -> (alphaFrac >= 0.8),
      "r_bullet_lines" -> (bulletFrac <= 0.9),
      "r_ellipsis_lines" -> (ellipsisFrac <= 0.3),
      "r_symbol_ratio" -> (symbolRatio < 0.1),
      "r_stopwords" -> (stopHits >= minStopHits))
    val guarded = rules.map { case (n, c) =>
      n -> when(nWords === 0, lit(false)).otherwise(c) }
    docs.select(
      (col(idCol) +: nWords.as("n_words") +:
        round(when(nWords === 0, lit(0.0)).otherwise(meanLen), 6)
          .as("mean_word_len") +:
        guarded.map { case (n, c) => c.as(n) }) :+
        guarded.map(_._2).reduce(_ && _).as("pass"): _*)
  }

  // --------------------------------------- unigram LM perplexity scoring

  /** Unigram language model fit on a REFERENCE corpus: one row per token
    * with its occurrence count. ONE map-side-combined aggregate over the
    * reference — the 100 TB shape is a groupBy producing a vocab-sized
    * result, amortizable by materializing it once and scoring many
    * target corpora against it. */
  def unigramModel(ref: DataFrame, textCol: String = "text"): DataFrame =
    ref.select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))

  /** Mean negative log-probability of each document under a reference
    * unigram model (the CCNet-style corpus-filtering signal: score crawl
    * text against a trusted-corpus LM; low = fluent/common, high =
    * gibberish or OOV-heavy). Laplace-`alpha` smoothing reserves one
    * virtual vocab slot for OOV: `p(t) = (n_t + α) / (T + α(V+1))`.
    *
    * Scale shape: totals are a 1-row broadcast; scoring is explode → hash
    * join on token (model side vocab-sized) → per-doc average — no
    * windows, no quadratic step. `avg_nll` is rounded to 4 decimals so
    * the score is stable under float-summation order across engines.
    * Empty documents produce no row (no tokens — consistent with
    * [[lexicalDiversity]]). */
  def unigramLogProb(docs: DataFrame, model: DataFrame, alpha: Double = 1.0,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(alpha > 0, "alpha > 0")
    val totals = model.agg(sum(col("n")).as("__T"),
      count(lit(1)).as("__V"))
    docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .join(model, Seq("token"), "left")
      .crossJoin(broadcast(totals))
      .select(col(idCol),
        (-log((coalesce(col("n"), lit(0L)).cast("double") + alpha) /
          (col("__T").cast("double") + (col("__V") + 1) * alpha))).as("__nll"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("__nll")), 4).as("avg_nll"))
  }

  /** Adjacent token pairs of a token-array column: `zip(tk, tk.tail)` as
    * `(t1, t2)` structs — empty for documents under 2 tokens. */
  private def bigramsOf(tk: Column): Column =
    zip_with(
      slice(tk, lit(1), greatest(size(tk) - 1, lit(0))),
      slice(tk, lit(2), greatest(size(tk) - 1, lit(0))),
      (a, b) => struct(a.as("t1"), b.as("t2")))

  /** Bigram language model fit on a REFERENCE corpus: one row per
    * adjacent token pair with its count. Same 100 TB shape as
    * [[unigramModel]] — ONE map-side-combined aggregate whose output is
    * bigram-vocab-sized, materialized once and reused across target
    * corpora. */
  def bigramModel(ref: DataFrame, textCol: String = "text"): DataFrame =
    ref.select(explode(bigramsOf(tokens(col(textCol)))).as("bg"))
      .select(col("bg.t1").as("t1"), col("bg.t2").as("t2"))
      .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("n"))

  /** Mean negative log-probability of each document's BIGRAMS under a
    * reference bigram model — the second-order sibling of
    * [[unigramLogProb]]: a unigram LM scores vocabulary fluency, this
    * scores local word ORDER (scrambled or templated text keeps its
    * vocabulary but loses its transitions). Laplace-`alpha` smoothing on
    * the conditional: `p(t2|t1) = (n₁₂ + α) / (ctx₁ + α(V+1))`, where
    * `ctx₁ = Σ_w n(t1,w)` (the model's own context totals — no separate
    * unigram fit needed) and `V` counts distinct successor types, with
    * one virtual slot for unseen successors. Unseen CONTEXTS degrade to
    * the uniform `α / α(V+1)` — maximal surprise, which is the point.
    *
    * Scale shape: context totals are a second vocab-sized aggregate OF
    * THE MODEL (not the corpus); scoring is explode → two hash joins
    * (model + contexts, both vocab-sized → broadcast) → per-doc average.
    * No windows, no quadratic step. `avg_nll` rounds to 4 decimals for
    * cross-engine summation-order stability. Documents with < 2 tokens
    * produce no row. */
  def bigramLogProb(docs: DataFrame, model: DataFrame, alpha: Double = 1.0,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(alpha > 0, "alpha > 0")
    val ctx = model.groupBy(col("t1")).agg(sum(col("n")).as("__cn"))
    val v = model.agg(countDistinct(col("t2")).as("__V"))
    docs.select(col(idCol),
        explode(bigramsOf(tokens(col(textCol)))).as("bg"))
      .select(col(idCol), col("bg.t1").as("t1"), col("bg.t2").as("t2"))
      .join(model, Seq("t1", "t2"), "left")
      .join(ctx, Seq("t1"), "left")
      .crossJoin(broadcast(v))
      .select(col(idCol),
        (-log((coalesce(col("n"), lit(0L)).cast("double") + alpha) /
          (coalesce(col("__cn"), lit(0L)).cast("double") +
            (col("__V") + 1) * alpha))).as("__nll"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("__nll")), 4).as("avg_nll"))
  }

  // ------------------------------------------------- top-q quality filter

  /** Keep each stratum's top `q` fraction by `score` (descending, ties
    * broken by ascending `tie`), EXACTLY — the output carries the rank
    * (`rankCol`, 1-based, bigint) and equals
    * `row_number() OVER (PARTITION BY stratum ORDER BY score DESC, tie)`
    * filtered to `rank <= ceil(n_stratum * q)` — but WITHOUT the
    * per-stratum total sort that form implies. A 100 TB corpus is mostly
    * one language, so `Window.partitionBy(lang)` is a single-reducer
    * cliff; this decomposes the rank instead:
    *
    *  1. `groupBy(stratum, score).count()` — one map-side-combined
    *     aggregate whose output is DISTINCT score values per stratum
    *     (bounded for any rounded/banded score; ~400 values for
    *     [[qualityScore]]'s 6-dp formula), not rows.
    *  2. A window over THAT tiny table gives each score group its
    *     strictly-better-row count `cum_before` and the stratum's `k`;
    *     groups with `cum_before >= k` are dropped wholesale — the join
    *     back to the data prunes ~(1-q) of the corpus before any sort
    *     (AQE broadcasts the group table when small).
    *  3. Ranks within a surviving group come from
    *     `row_number() OVER (PARTITION BY stratum, score ORDER BY tie)` —
    *     partitioned by TIE GROUP, so parallelism is the number of
    *     distinct surviving scores, not the number of strata; then
    *     `rank = cum_before + tie_rank`.
    *
    * Caller contract: `score` non-null, `tie` unique within a stratum
    * (same contract as the row_number form). The residual skew is a
    * single score value dominating a stratum — a rounded/banded score
    * makes its MODAL value's tie group nearly the stratum itself. Pass
    * `tieBucket` (any non-decreasing function of `tie`, e.g.
    * `floor(doc_id / 8192)`) to decompose the tie rank the same way the
    * score rank is decomposed: per-bucket counts + a window over the
    * distinct-bucket table + row_number WITHIN a bucket — the largest
    * single-task sort becomes one (stratum, score, bucket) cell. */
  def qualityTopQ(df: DataFrame, stratum: Column, score: Column,
      tie: Column, q: Double, rankCol: String = "rk",
      tieBucket: Option[Column] = None): DataFrame = {
    require(q > 0.0 && q <= 1.0, s"q must be in (0,1], got $q")
    val reserved =
      Seq("__g", "__s", "__c", "__cb", "__n", "__k", "__tr", "__tb", "__tc", "__tcb")
    require(!(df.columns.toSet ++ Seq(rankCol)).exists(reserved.contains),
      s"qualityTopQ uses ${reserved.mkString(", ")} internally")
    val keyed = df.withColumn("__g", stratum).withColumn("__s", score)
    val cnt = keyed.groupBy(col("__g"), col("__s"))
      .agg(count(lit(1)).as("__c"))
    val nPer = cnt.groupBy(col("__g")).agg(sum(col("__c")).as("__n"))
    // distinct-score table: per-stratum sort over score VALUES, not rows
    val wCum = Window.partitionBy(col("__g")).orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val groups = cnt
      .withColumn("__cb", coalesce(sum(col("__c")).over(wCum), lit(0L)))
      .join(nPer, "__g")
      .withColumn("__k", ceil(col("__n") * q).cast("long"))
      .filter(col("__cb") < col("__k"))
      .select(col("__g"), col("__s"), col("__cb"), col("__k"))
    val ranked = tieBucket match {
      case None =>
        val wTie = Window.partitionBy(col("__g"), col("__s")).orderBy(tie)
        keyed.join(groups, Seq("__g", "__s"))
          .withColumn("__tr", row_number().over(wTie).cast("long"))
          .withColumn(rankCol, col("__cb") + col("__tr"))
      case Some(tb) =>
        val cand = keyed.withColumn("__tb", tb).join(groups, Seq("__g", "__s"))
        // distinct-bucket table within each surviving score group: the
        // window sorts BUCKET values, not rows
        val wTb = Window.partitionBy(col("__g"), col("__s")).orderBy(col("__tb"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val tbCum = cand.groupBy(col("__g"), col("__s"), col("__tb"))
          .agg(count(lit(1)).as("__tc"))
          .withColumn("__tcb", coalesce(sum(col("__tc")).over(wTb), lit(0L)))
          .select(col("__g"), col("__s"), col("__tb"), col("__tcb"))
        val wTie = Window.partitionBy(col("__g"), col("__s"), col("__tb"))
          .orderBy(tie)
        cand.join(tbCum, Seq("__g", "__s", "__tb"))
          .withColumn("__tr", row_number().over(wTie).cast("long"))
          .withColumn(rankCol, col("__cb") + col("__tcb") + col("__tr"))
          .drop("__tb", "__tcb")
    }
    ranked.filter(col(rankCol) <= col("__k"))
      .drop("__g", "__s", "__cb", "__k", "__tr")
  }

  /** Exact repeated-span (cross-document substring) duplication signal —
    * the w-token-gram form of "Deduplicating Training Data Makes Language
    * Models Better" (Lee et al. 2021): a gram occurring in ≥ 2 DISTINCT
    * documents marks every position it covers as duplicated text. Per
    * document: gram count, duplicated-position count, their ratio, and a
    * keep flag (`dup_ratio ≤ maxRatio`). Complements [[dedupSegments]]
    * (line-exact) and the winnow fingerprints (sampled): this is the
    * exhaustive every-position signal.
    *
    * Scale shape: one corpus-sized explode (a gram per token — word-count
    * shape), one shuffle on the gram for the distinct-doc count, one
    * semi-join + per-doc count. Never all-pairs. `hashedGrams = true` is
    * the 100 TB form: grams become 64-bit rotate-xor mixes of the token
    * hashes — NO gram string is ever built, and the gram shuffle moves
    * fixed-width longs instead of ~8×-wider strings; identical counts
    * absent 64-bit collisions, which t24 gates in-query against the
    * string twin. */
  def substringDupSignal(docs: DataFrame, w: Int = 8, maxRatio: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text",
      hashedGrams: Boolean = false): DataFrame = {
    require(w >= 2, s"gram width must be >= 2, got $w")
    val tk = tokens(col(textCol))
    // guard BEFORE sequence(): Spark's sequence(1, n) with n < 1 yields a
    // DESCENDING sequence, not an empty one
    val base =
      if (!hashedGrams) {
        val grams = when(size(tk) < w, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), size(tk) - (w - 1)),
            i => array_join(slice(tk, i, lit(w)), " ")))
        docs.select(col(idCol), grams.as("grams"))
      } else {
        // per-POSITION (non-distinct) w-gram hashes via the NATIVE
        // [[graft.functions.GramHashes]] expression — one O(n·w) loop
        // over primitive longs. The HOF predecessor (transform over
        // element_at on a bound token-hash column) degraded to O(n²·w)
        // per doc whenever the optimizer inlined the bound array into
        // the lambda (HOF lambdas don't CSE) — measured 261 s vs the
        // string twin's 30 s on a 50k-doc corpus.
        docs.select(col(idCol),
          graft.functions.GramHashes(
            transform(tk, t => xxhash64(t)), w).as("grams"))
      }
    val pos = base.select(col(idCol), explode(col("grams")).as("gram"))
    val dup = pos.groupBy(col("gram"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= 2).select(col("gram"))
    val dupPerDoc = pos.join(dup, Seq("gram"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("__dup"))
    // keep is decided on the RAW ratio (rounding first would flip docs
    // sitting within 5e-7 of the threshold); dup_ratio is rounded only
    // for display/hash stability
    val raw = when(col("n_grams") === 0, lit(0.0))
      .otherwise(coalesce(col("__dup"), lit(0L)).cast("double")
        / col("n_grams"))
    // n_grams ARITHMETICALLY (max(0, n_tokens − w + 1) — identical to
    // size(grams) by construction): the gram ARRAYS must only ever be
    // evaluated under the explode above. A size(grams) branch here
    // re-built every gram string per doc just to count them, and in the
    // hashed form the collapsed projection re-inlined the token-hash
    // array into every element's lambda — O(n²·w)/doc, measured 263 s at
    // sf1 for a count the token count already knows.
    docs.select(col(idCol),
        when(col(textCol).isNull, lit(null).cast("long"))
          .otherwise(greatest(lit(0), size(tk) - (w - 1)).cast("long"))
          .as("n_grams"))
      .join(dupPerDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("__dup"), lit(0L)).cast("long").as("n_dup_grams"),
        round(raw, 6).as("dup_ratio"),
        (raw <= maxRatio).as("keep"))
  }

  /** Whole-table convenience: annotate a documents frame. */
  def analyze(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("n_regex_tokens", regexTokenCount(t))
      .withColumn("n_bpe_est", bpeTokenEstimate(t))
      .withColumn("punct_ratio", round(punctRatio(t), 6))
      .withColumn("stopword_ratio", round(stopwordRatio(t), 6))
      .withColumn("lang_id", langId(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("fp", fingerprint(t))
  }
}
