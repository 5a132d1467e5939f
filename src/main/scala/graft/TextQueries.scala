package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.{CompressionSignal, Dedup, Multimodal, NumericQuality, Packing, Sampling, Similarity, Sketches, TextOps}
import graft.LlmShared.{t, staging, idOffset, docsWithNearDups, qualitySqlExpr}

/** Text-analysis queries (t01–t25): cleaning, quality scoring,
  * fingerprinting, packing, LM filters, substring dedup, token budgeting.
  * Split out of LlmQueries by family (r11) — pure move; the public surface
  * stays [[graft.LlmQueries.queries]] / [[graft.LlmQueries.oracleSql]]. */
private[graft] object TextQueries {

  /** Text cleaning: HTML/URL/email stripping + whitespace collapse, applied
    * to deterministically-noised documents; cleaned output must equal the
    * cleaned original. */
  private def t03(s: SparkSession, dir: String): DataFrame = {
    val noisy = t(s, dir, "documents").select(col("doc_id"),
      concat(col("text"),
        lit(" <b>bold tag</b> visit https://example.com/x?q=1 or www.foo.org "),
        lit("mail bob@example.com now")).as("text"))
    noisy.select(col("doc_id"),
        TextOps.cleanText(col("text")).as("cleaned"))
      .withColumn("n_chars_clean", length(col("cleaned")).cast("bigint"))
      .orderBy(col("doc_id"))
  }

  private val t03Sql =
    """WITH noisy AS (SELECT doc_id,
      |    text || ' <b>bold tag</b> visit https://example.com/x?q=1 or www.foo.org '
      |         || 'mail bob@example.com now' AS text
      |  FROM documents),
      |cleaned AS (SELECT doc_id,
      |    trim(regexp_replace(
      |      regexp_replace(
      |        regexp_replace(
      |          regexp_replace(text, '<[^>]*>', ' ', 'g'),
      |          '(https?://|www\.)[^\s]+', ' ', 'g'),
      |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', ' ', 'g'),
      |      '\s+', ' ', 'g')) AS cleaned
      |  FROM noisy)
      |SELECT doc_id, cleaned, length(cleaned) AS n_chars_clean
      |FROM cleaned ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------- text analysis

  private def t01(s: SparkSession, dir: String): DataFrame =
    TextOps.analyze(t(s, dir, "documents").select(col("doc_id"), col("text")))
      .drop("text")
      .withColumn("n_tokens", col("n_tokens").cast("bigint"))
      .orderBy(col("doc_id"))

  private val t01Sql = {
    val langHits = TextOps.stopwords.toSeq.sortBy(_._1).map { case (lang, ws) =>
      val arr = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"{'hits': CAST(len(list_filter(tk, x -> list_contains($arr, x))) AS INT), 'lang': '$lang'}"
    }.mkString(",\n        ")
    val allWords = TextOps.stopwords.values.flatten.toSeq.distinct
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH base AS (SELECT doc_id, text,
       |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
       |         ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS tk
       |  FROM documents),
       |scored AS (SELECT doc_id, text, tk,
       |    list_max([
       |        $langHits
       |    ]) AS best,
       |    CAST(len(tk) AS BIGINT) AS n_tokens,
       |    CAST(list_sum(list_transform(tk,
       |        x -> CAST(ceil(length(x) / 4.0) AS BIGINT))) AS BIGINT) AS n_bpe_est,
       |    length(text) - length(regexp_replace(text,
       |        '[.,!?;:''"()\\[\\]{}-]', '', 'g')) AS n_punct,
       |    len(list_filter(tk, x -> list_contains($allWords, x))) AS sw_hits
       |  FROM base)
       |SELECT doc_id, n_tokens,
       |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT)
       |    AS n_regex_tokens,
       |  COALESCE(n_bpe_est, 0) AS n_bpe_est,
       |  round(CASE WHEN length(text) = 0 THEN 0.0
       |             ELSE CAST(n_punct AS DOUBLE) / length(text) END, 6) AS punct_ratio,
       |  round(CASE WHEN n_tokens = 0 THEN 0.0
       |             ELSE CAST(sw_hits AS DOUBLE) / n_tokens END, 6) AS stopword_ratio,
       |  CASE WHEN struct_extract(best, 'hits') = 0 THEN 'und'
       |       ELSE struct_extract(best, 'lang') END AS lang_id,
       |  ${qualitySqlExpr("n_tokens")} AS quality,
       |  md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  /** Winnowed rolling-hash fingerprints (substring-level dup candidates):
    * engine-defined hash family → rows-only check. Doc pairs sharing ≥
    * minShared fingerprints, over docs ∪ near-dup variants. */
  /** Winnowing fingerprint near-dup pairs, SELF-VERIFYING against the
    * injected markers (full-text copies + one token): emits marker count
    * and marker-recall ≥ 0.75 (measured ≈0.90 at sf0.001 and sf0.01 —
    * misses are docs too short to share 20 fingerprints). */
  private def t02(s: SparkSession, dir: String): DataFrame = {
    val docs = docsWithNearDups(s, dir).localCheckpoint()
    val off = LlmShared.markerOffset(s, dir)
    val pairs = TextOps.winnowNearDupPairs(docs, minShared = 20, maxDf = 50)
    val markers = docs.filter(col("doc_id") >= off)
      .agg(count(lit(1)).as("n_markers"))
    val found = pairs.filter(col("id_b") - col("id_a") === off)
      .agg(count(lit(1)).as("n_found"))
    markers.crossJoin(found)
      .select(col("n_markers"),
        (col("n_found").cast("double") / col("n_markers") >= 0.75)
          .as("recall_ok"))
  }

  private val t02Sql =
    """SELECT COUNT(*) AS n_markers, TRUE AS recall_ok
      |FROM documents WHERE doc_id % 7 = 0""".stripMargin

  // ------------------------------------------------ t05 URL/domain mining

  /** Seed each doc with a deterministic URL (two forms), then extract all
    * domains and aggregate per-domain mention + document counts — the
    * source-mix-audit operator. */
  private def t05(s: SparkSession, dir: String): DataFrame = {
    val seeded = t(s, dir, "documents").select(col("doc_id"),
      concat(col("text"), lit(" see "),
        when(col("doc_id") % 3 === 0,
          concat(lit("http://www.m"), (col("doc_id") % 20).cast("string"),
            lit(".net/x?q=1")))
          .otherwise(concat(lit("https://site"),
            (col("doc_id") % 50).cast("string"), lit(".example.org/p/"),
            col("doc_id").cast("string")))).as("text"))
    TextOps.domainStats(seeded).orderBy(col("domain"))
  }

  private val t05Sql =
    """WITH seeded AS (SELECT doc_id, text || ' see ' ||
      |  CASE WHEN doc_id % 3 = 0
      |       THEN 'http://www.m' || CAST(doc_id % 20 AS VARCHAR) || '.net/x?q=1'
      |       ELSE 'https://site' || CAST(doc_id % 50 AS VARCHAR) ||
      |            '.example.org/p/' || CAST(doc_id AS VARCHAR) END AS text
      |  FROM documents),
      |u AS (SELECT doc_id,
      |    unnest(regexp_extract_all(text, 'https?://([^/\s]+)', 1)) AS domain
      |  FROM seeded)
      |SELECT domain, COUNT(*) AS n, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      |FROM u GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------- t06 repetition signals

  /** Gopher-style boilerplate signal: per-doc bigram totals, the modal
    * bigram's count, and its fraction of all bigrams. */
  private def t06(s: SparkSession, dir: String): DataFrame =
    TextOps.bigramRepetition(
        t(s, dir, "documents").select(col("doc_id"), col("text")))
      .orderBy(col("doc_id"))

  private val t06Sql =
    """WITH toks AS (SELECT doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
      |         ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tk
      |  FROM documents),
      |bg AS (SELECT doc_id, array_to_string(tk[i:i+1], ' ') AS bg
      |  FROM toks, UNNEST(range(1, len(tk))) AS u(i) WHERE len(tk) >= 2),
      |c AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2)
      |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
      |  CAST(MAX(c) AS BIGINT) AS top_n,
      |  round(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top_frac
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  /** Quality-percentile filtering: keep each language's top quartile by
    * quality score — the rank-threshold form (row_number ≤ ceil(n/4) with a
    * deterministic tiebreak), which is engine-exact, unlike interpolated
    * percentile cutoffs whose tie semantics differ across engines. Spark
    * side computes the SAME ranks via [[TextOps.qualityTopQ]]'s decomposed
    * form (distinct-score cumulative counts + per-tie-group row_number) —
    * no per-language total sort — while the oracle keeps the plain
    * row_number window, so the decomposition itself is hash-verified. */
  private def t07(s: SparkSession, dir: String): DataFrame = {
    val scored = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextOps.qualityScore(col("text")).as("quality"))
    TextOps.qualityTopQ(scored, col("lang"), col("quality"), col("doc_id"),
        q = 0.25, tieBucket = Some(floor(col("doc_id") / 8192)))
      .select(col("doc_id"), col("lang"), col("quality"), col("rk"))
      .orderBy(col("doc_id"))
  }

  private val t07Sql = {
    val allWords = TextOps.stopwords.values.flatten.toSeq.distinct
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH base AS (SELECT doc_id, lang, text,
       |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
       |         ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS tk
       |  FROM documents),
       |pre AS (SELECT doc_id, lang, text, tk,
       |    length(text) - length(regexp_replace(text,
       |        '[.,!?;:''"()\\[\\]{}-]', '', 'g')) AS n_punct,
       |    len(list_filter(tk, x -> list_contains($allWords, x))) AS sw_hits
       |  FROM base),
       |scored AS (SELECT doc_id, lang,
       |  ${qualitySqlExpr("len(tk)")} AS quality
       |  FROM pre),
       |rk AS (SELECT doc_id, lang, quality,
       |    CAST(row_number() OVER (PARTITION BY lang
       |      ORDER BY quality DESC, doc_id) AS BIGINT) AS rk,
       |    COUNT(*) OVER (PARTITION BY lang) AS n_lang
       |  FROM scored)
       |SELECT doc_id, lang, quality, rk
       |FROM rk WHERE rk <= ceil(n_lang * 0.25) ORDER BY doc_id""".stripMargin
  }

  /** Sequence packing, ORACLE-CHECKED: shard (md5-hex, engine-portable) →
    * cumulative token count → window bins; per-bin document counts, token
    * totals and first/last doc pin the full assignment relationally.
    * `shardHexWidth = 2` (256 shards) exercises the parameterized fan-out
    * end-to-end — the oracle computes the same 2-char prefix, so a width
    * bug anywhere in the keying hash-mismatches. */
  private def t08(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      .withColumn("n_tokens", TextOps.tokenCount(col("text")).cast("long"))
    Packing.packStreaming(docs, col("doc_id"), col("n_tokens"), window = 2048,
        shardHexWidth = 2)
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("shard"), col("bin"))
  }

  private val t08Sql =
    """WITH toks AS (SELECT doc_id,
      |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(regexp_split_to_array(trim(lower(text)), '\s+')) END
      |      AS BIGINT) AS n_tokens,
      |    substring(md5('p' || CAST(doc_id AS VARCHAR)), 1, 2) AS shard
      |  FROM documents),
      |c AS (SELECT doc_id, shard, n_tokens,
      |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM toks)
      |SELECT shard,
      |  CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 2048.0) AS BIGINT) AS bin,
      |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Fixed-size token chunking with overlap (64-token chunks, stride 48 —
    * the context-window prep pass). The md5 of each chunk's exact token
    * content pins the slicing against DuckDB's list-slice semantics. */
  private def t09(s: SparkSession, dir: String): DataFrame =
    TextOps.chunkTokens(t(s, dir, "documents"), chunkSize = 64, stride = 48)
      .orderBy(col("doc_id"), col("chunk_idx"))

  private val t09Sql =
    """WITH toks AS (SELECT doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
      |         ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tk
      |  FROM documents),
      |st AS (SELECT doc_id, tk, len(tk) AS n, unnest(range(0, len(tk), 48)) AS s
      |  FROM toks WHERE len(tk) > 0)
      |SELECT doc_id, CAST(s // 48 AS INT) AS chunk_idx,
      |  CAST(least(64, n - s) AS INT) AS n_chunk_tokens,
      |  md5(array_to_string(tk[s+1:least(s+64, n)], ' ')) AS chunk_md5
      |FROM st ORDER BY doc_id, chunk_idx""".stripMargin

  /** Lexical diversity: type-token ratio, Simpson repeat index, hapax
    * count — integer-aggregate ratios only (engine-exact, no
    * transcendental drift), fully reproduced by the oracle. */
  private def t10(s: SparkSession, dir: String): DataFrame =
    TextOps.lexicalDiversity(t(s, dir, "documents"))
      .orderBy(col("doc_id"))

  private val t10Sql =
    """WITH toks AS (SELECT doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
      |         ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tk
      |  FROM documents),
      |u AS (SELECT doc_id, unnest(tk) AS tok FROM toks WHERE len(tk) > 0),
      |c AS (SELECT doc_id, tok, COUNT(*) AS c FROM u GROUP BY 1, 2)
      |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(*) AS BIGINT) AS n_types,
      |  round(CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS ttr,
      |  CASE WHEN SUM(c) > 1
      |       THEN round(CAST(SUM(c*(c-1)) AS DOUBLE) / (SUM(c)*(SUM(c)-1)), 6)
      |       ELSE 0.0 END AS simpson,
      |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  /** Vocabulary build: top-20 tokens by term frequency (df ≥ 3 floor,
    * deterministic token tiebreak) — the tokenizer-vocab prep pass. topK
    * is sized BELOW the sf0.01 post-floor vocabulary (31 tokens) so the
    * oracle verifies the truncation boundary, not just the aggregation. */
  private def t11(s: SparkSession, dir: String): DataFrame =
    TextOps.vocabulary(t(s, dir, "documents"), minDf = 3, topK = 20)
      .orderBy(col("n").desc, col("token"))

  private val t11Sql =
    """WITH toks AS (SELECT doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
      |         ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tk
      |  FROM documents),
      |u AS (SELECT doc_id, unnest(tk) AS token FROM toks),
      |c AS (SELECT doc_id, token, COUNT(*) AS c FROM u GROUP BY 1, 2),
      |v AS (SELECT token, CAST(SUM(c) AS BIGINT) AS n,
      |    CAST(COUNT(*) AS BIGINT) AS df
      |  FROM c GROUP BY 1 HAVING COUNT(*) >= 3)
      |SELECT token, n, df FROM v ORDER BY n DESC, token LIMIT 20""".stripMargin

  // ------------------------------------- t12 unigram LM perplexity scoring

  /** CCNet-style LM quality filter: fit a unigram model on the train split
    * (d07's doc_id%10 boundary), score the test split by mean negative
    * log-probability under it (Laplace α=1, one virtual OOV slot). The
    * oracle reproduces tokenization, counts, totals, and the smoothed
    * −ln(p) average; avg_nll is rounded to 4 decimals so float-summation
    * order can't flip the hash. */
  private def t12(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val model = TextOps.unigramModel(docs.filter(col("doc_id") % 10 =!= 0))
    TextOps.unigramLogProb(docs.filter(col("doc_id") % 10 === 0), model)
      .orderBy(col("doc_id"))
  }

  private val t12Sql =
    """WITH toks AS (SELECT doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
      |         ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tk
      |  FROM documents),
      |u AS (SELECT doc_id, unnest(tk) AS token FROM toks),
      |model AS (SELECT token, COUNT(*) AS n FROM u
      |  WHERE doc_id % 10 <> 0 GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS t_total,
      |    CAST(COUNT(*) AS DOUBLE) AS v FROM model),
      |test AS (SELECT e.doc_id, COALESCE(m.n, 0) AS n
      |  FROM u e LEFT JOIN model m USING (token) WHERE e.doc_id % 10 = 0)
      |SELECT doc_id, COUNT(*) AS n_tokens,
      |  round(AVG(-ln((n + 1.0) / (t_total + 1.0 * (v + 1)))), 4) AS avg_nll
      |FROM test CROSS JOIN tot
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------- t21 bigram-LM order scoring

  /** Bigram-LM transition scoring — [[TextOps.bigramModel]]/
    * [[TextOps.bigramLogProb]], same held-out split as t12 (fit on
    * doc_id % 10 ≠ 0, score the rest): the unigram t12 scores WHAT words
    * a document uses, this scores the ORDER they come in. The oracle
    * recomputes the pair explode, both vocab-sized aggregates, the
    * Laplace-smoothed conditional, and the rounded per-doc mean. */
  private def t21(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val model = TextOps.bigramModel(docs.filter(col("doc_id") % 10 =!= 0))
    TextOps.bigramLogProb(docs.filter(col("doc_id") % 10 === 0), model)
      .orderBy(col("doc_id"))
  }

  private val t21Sql =
    """WITH toks AS (SELECT doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
      |         ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tk
      |  FROM documents),
      |bg AS (SELECT doc_id, tk[i] AS t1, tk[i + 1] AS t2
      |  FROM toks, unnest(range(1, len(tk))) AS r(i) WHERE len(tk) >= 2),
      |model AS (SELECT t1, t2, COUNT(*) AS n FROM bg
      |  WHERE doc_id % 10 <> 0 GROUP BY 1, 2),
      |ctx AS (SELECT t1, CAST(SUM(n) AS DOUBLE) AS cn FROM model GROUP BY 1),
      |vv AS (SELECT CAST(COUNT(DISTINCT t2) AS DOUBLE) AS v FROM model),
      |test AS (SELECT b.doc_id, COALESCE(m.n, 0) AS n, COALESCE(c.cn, 0) AS cn
      |  FROM bg b LEFT JOIN model m USING (t1, t2)
      |  LEFT JOIN ctx c USING (t1)
      |  WHERE b.doc_id % 10 = 0)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |  round(AVG(-ln((n + 1.0) / (cn + 1.0 * (v + 1)))), 4) AS avg_nll
      |FROM test CROSS JOIN vv
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------ t13 cross-document line dedup

  /** CCNet-style line dedup — [[TextOps.dedupSegments]] over the near-dup
    * corpus re-lined into 4-word segments (the synthetic docs carry no
    * newlines; the re-lining is query prep, the operator is generic over
    * `sep`). Every near-dup doc (identical prefix + one appended marker
    * token) loses all but its final segment to the original's first
    * occurrence, and any segment in > 5 distinct docs drops as
    * boilerplate. The oracle reproduces the re-lining, the two-level
    * (segment, doc) → segment aggregation, the (first doc, first pos)
    * arg-min, and the reassembly byte-for-byte. */
  private def t13(s: SparkSession, dir: String): DataFrame = {
    val words = split(col("text"), " ")
    val nLines = ceil(size(words) / lit(4.0)).cast("int")
    val lined = docsWithNearDups(s, dir).select(col("doc_id"),
      array_join(transform(sequence(lit(0), nLines - 1),
        i => array_join(slice(words, i * 4 + 1, lit(4)), " ")), "\n").as("text"))
    TextOps.dedupSegments(lined, sep = "\n", maxDf = 5)
      .orderBy(col("doc_id"))
  }

  private val t13Sql =
    """WITH docs2 AS (SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents),
      |    text || ' graftmarker'
      |  FROM documents WHERE doc_id % 7 = 0),
      |w AS (SELECT doc_id, string_split(text, ' ') AS wd FROM docs2),
      |lined AS (SELECT doc_id,
      |    array_to_string(list_transform(
      |      range(CAST(ceil(len(wd) / 4.0) AS BIGINT)),
      |      i -> array_to_string(wd[(i*4+1):(i*4+4)], ' ')), chr(10)) AS text
      |  FROM w),
      |segs AS (SELECT doc_id, s.pos AS pos, s.seg AS seg FROM (
      |  SELECT doc_id, unnest(list_transform(range(len(sl)),
      |      i -> {'pos': i, 'seg': sl[CAST(i + 1 AS INT)]})) AS s
      |  FROM (SELECT doc_id, string_split(text, chr(10)) AS sl FROM lined))),
      |perdoc AS (SELECT seg, doc_id, MIN(pos) AS minpos
      |  FROM segs GROUP BY 1, 2),
      |perseg AS (SELECT seg, COUNT(*) AS df, MIN(doc_id) AS d0
      |  FROM perdoc GROUP BY 1),
      |kept AS (SELECT s.doc_id, s.pos, s.seg
      |  FROM segs s
      |  JOIN perseg p ON p.seg = s.seg
      |  JOIN perdoc pd ON pd.seg = s.seg AND pd.doc_id = p.d0
      |  WHERE p.df <= 5 AND s.doc_id = p.d0 AND s.pos = pd.minpos),
      |reb AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
      |    string_agg(seg, chr(10) ORDER BY pos) AS text
      |  FROM kept GROUP BY 1)
      |SELECT l.doc_id, COALESCE(r.text, '') AS text,
      |  COALESCE(r.n_kept, 0) AS n_kept,
      |  CAST(len(string_split(l.text, chr(10))) AS BIGINT) AS n_segments
      |FROM lined l LEFT JOIN reb r USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------- t14 URL canonicalization

  /** URL canonicalization — [[TextOps.canonicalizeUrl]] over seeded
    * per-doc URL variants (the corpus carries no URLs): u1 is the "dirty"
    * form (upper-case scheme/host, explicit `:443`, trailing slash,
    * tracking params, fragment, shuffled param order), u2 the clean twin.
    * They collapse to the same canonical URL except when doc_id % 4 = 0
    * (a genuinely different param value). The oracle reproduces every
    * rule step-for-step in DuckDB CTEs. */
  private def t14(s: SparkSession, dir: String): DataFrame = {
    val k = (col("doc_id") % 50).cast("string")
    val m = (col("doc_id") % 7).cast("string")
    val va = when(col("doc_id") % 4 === 0, lit("9")).otherwise(lit("1"))
    val seeded = t(s, dir, "documents").select(col("doc_id"),
      concat(lit("HTTPS://Site"), k, lit(".Example.ORG:443/Docs/"), m,
        lit("/?b=2&utm_source=feed&a="), va, lit("&fbclid=zz#top")).as("u1"),
      concat(lit("https://site"), k, lit(".example.org/Docs/"), m,
        lit("?a=1&b=2")).as("u2"))
    seeded.select(col("doc_id"),
        TextOps.canonicalizeUrl(col("u1")).as("canon1"),
        TextOps.canonicalizeUrl(col("u2")).as("canon2"))
      .withColumn("collapsed", col("canon1") === col("canon2"))
      .orderBy(col("doc_id"))
  }

  private val t14Sql = {
    def steps(u: String, i: Int): String =
      s"""regexp_replace($u, '#.*$$', '') AS nf$i""" // fragment off
    s"""WITH seeds AS (SELECT doc_id,
       |    'HTTPS://Site' || CAST(doc_id % 50 AS VARCHAR) ||
       |      '.Example.ORG:443/Docs/' || CAST(doc_id % 7 AS VARCHAR) ||
       |      '/?b=2&utm_source=feed&a=' ||
       |      (CASE WHEN doc_id % 4 = 0 THEN '9' ELSE '1' END) ||
       |      '&fbclid=zz#top' AS u1,
       |    'https://site' || CAST(doc_id % 50 AS VARCHAR) ||
       |      '.example.org/Docs/' || CAST(doc_id % 7 AS VARCHAR) ||
       |      '?a=1&b=2' AS u2
       |  FROM documents),
       |s1 AS (SELECT doc_id, ${steps("u1", 1)}, ${steps("u2", 2)} FROM seeds),
       |s2 AS (SELECT *,
       |    lower(regexp_extract(nf1, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch1,
       |    regexp_replace(nf1, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest1,
       |    lower(regexp_extract(nf2, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch2,
       |    regexp_replace(nf2, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest2
       |  FROM s1),
       |s3 AS (SELECT *,
       |    lower(regexp_extract(rest1, '^([^/?]+)', 1)) AS hp1,
       |    regexp_replace(rest1, '^[^/?]+', '') AS pq1,
       |    lower(regexp_extract(rest2, '^([^/?]+)', 1)) AS hp2,
       |    regexp_replace(rest2, '^[^/?]+', '') AS pq2
       |  FROM s2),
       |s4 AS (SELECT *,
       |    CASE WHEN sch1 = 'http' THEN regexp_replace(hp1, ':80$$', '')
       |         WHEN sch1 = 'https' THEN regexp_replace(hp1, ':443$$', '')
       |         ELSE hp1 END AS host1,
       |    regexp_extract(pq1, '^([^?]*)', 1) AS p1,
       |    regexp_extract(pq1, '\\?(.*)$$', 1) AS q1,
       |    CASE WHEN sch2 = 'http' THEN regexp_replace(hp2, ':80$$', '')
       |         WHEN sch2 = 'https' THEN regexp_replace(hp2, ':443$$', '')
       |         ELSE hp2 END AS host2,
       |    regexp_extract(pq2, '^([^?]*)', 1) AS p2,
       |    regexp_extract(pq2, '\\?(.*)$$', 1) AS q2
       |  FROM s3),
       |s5 AS (SELECT *,
       |    CASE WHEN p1 = '' OR p1 = '/' THEN '/'
       |         ELSE regexp_replace(p1, '/$$', '') END AS path1,
       |    array_to_string(list_sort(list_filter(string_split(q1, '&'),
       |      p -> p <> '' AND NOT regexp_matches(p,
       |        '^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)='))), '&') AS qs1,
       |    CASE WHEN p2 = '' OR p2 = '/' THEN '/'
       |         ELSE regexp_replace(p2, '/$$', '') END AS path2,
       |    array_to_string(list_sort(list_filter(string_split(q2, '&'),
       |      p -> p <> '' AND NOT regexp_matches(p,
       |        '^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)='))), '&') AS qs2
       |  FROM s4)
       |SELECT doc_id,
       |  sch1 || '://' || host1 || path1 ||
       |    (CASE WHEN qs1 = '' THEN '' ELSE '?' || qs1 END) AS canon1,
       |  sch2 || '://' || host2 || path2 ||
       |    (CASE WHEN qs2 = '' THEN '' ELSE '?' || qs2 END) AS canon2,
       |  (sch1 || '://' || host1 || path1 ||
       |    (CASE WHEN qs1 = '' THEN '' ELSE '?' || qs1 END)) =
       |  (sch2 || '://' || host2 || path2 ||
       |    (CASE WHEN qs2 = '' THEN '' ELSE '?' || qs2 END)) AS collapsed
       |FROM s5 ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------- t15 script mix

  /** Script-mix audit — [[TextOps.scriptMix]] over per-doc seeded
    * multi-script suffixes (the corpus is ASCII): doc_id-derived repeat
    * counts of one Cyrillic, one CJK, and one Arabic character make every
    * count column exercise a real non-Latin range. The oracle recomputes
    * the identical length-diff counts, CASE-chain dominant script, and
    * ratio. */
  private def t15(s: SparkSession, dir: String): DataFrame = {
    val seeded = t(s, dir, "documents").select(col("doc_id"),
      concat(col("text"), lit(" "),
        expr("repeat('ж', CAST(doc_id % 4 AS INT))"),
        expr("repeat('中', CAST(doc_id % 3 AS INT))"),
        expr("repeat('م', CAST(doc_id % 5 AS INT))")).as("text"))
    seeded.select(col("doc_id"), TextOps.scriptMix(col("text")).as("__m"))
      .select(col("doc_id"), col("__m.n_latin"), col("__m.n_digit"),
        col("__m.n_cyrillic"), col("__m.n_cjk"), col("__m.n_arabic"),
        col("__m.main_script"), col("__m.nonlatin_ratio"))
      .orderBy(col("doc_id"))
  }

  private val t15Sql = {
    def cnt(cls: String): String =
      s"length(text) - length(regexp_replace(text, '$cls', '', 'g'))"
    s"""WITH s AS (SELECT doc_id,
       |    text || ' ' || repeat('ж', CAST(doc_id % 4 AS INT))
       |      || repeat('中', CAST(doc_id % 3 AS INT))
       |      || repeat('م', CAST(doc_id % 5 AS INT)) AS text
       |  FROM documents),
       |c AS (SELECT doc_id, length(text) AS n_chars,
       |    CAST(${cnt("[A-Za-z]")} AS INT) AS n_latin,
       |    CAST(${cnt("[0-9]")} AS INT) AS n_digit,
       |    CAST(${cnt("[Ѐ-ӿ]")} AS INT) AS n_cyrillic,
       |    CAST(${cnt("[一-鿿]")} AS INT) AS n_cjk,
       |    CAST(${cnt("[؀-ۿ]")} AS INT) AS n_arabic
       |  FROM s)
       |SELECT doc_id, n_latin, n_digit, n_cyrillic, n_cjk, n_arabic,
       |  CASE WHEN n_latin = greatest(n_latin, n_digit, n_cyrillic, n_cjk, n_arabic) THEN 'latin'
       |       WHEN n_digit = greatest(n_latin, n_digit, n_cyrillic, n_cjk, n_arabic) THEN 'digit'
       |       WHEN n_cyrillic = greatest(n_latin, n_digit, n_cyrillic, n_cjk, n_arabic) THEN 'cyrillic'
       |       WHEN n_cjk = greatest(n_latin, n_digit, n_cyrillic, n_cjk, n_arabic) THEN 'cjk'
       |       ELSE 'arabic' END AS main_script,
       |  round(CAST(n_cyrillic + n_cjk + n_arabic AS DOUBLE) / n_chars, 6)
       |    AS nonlatin_ratio
       |FROM c ORDER BY doc_id""".stripMargin
  }

  // ----------------------------------------------- t16 TF-IDF top terms

  /** Keyword extraction — [[TextOps.tfidfTopTerms]], top-3 terms per doc
    * at a df ≥ 2 floor. The oracle recomputes tf, df, the smooth idf, the
    * per-doc rank (ties integer-exact, broken on the token), and the
    * 4-decimal score. */
  private def t16(s: SparkSession, dir: String): DataFrame =
    TextOps.tfidfTopTerms(t(s, dir, "documents"), k = 3, minDf = 2)
      .orderBy(col("doc_id"), col("rank"))

  private val t16Sql =
    """WITH toks AS (SELECT doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
      |         ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tk
      |  FROM documents),
      |u AS (SELECT doc_id, unnest(tk) AS token FROM toks),
      |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM u GROUP BY 1, 2),
      |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1
      |  HAVING COUNT(*) >= 2),
      |nn AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS nd FROM tf),
      |sc AS (SELECT doc_id, token, tf, df,
      |    tf * (ln((nd + 1) / (df + 1)) + 1) AS raw
      |  FROM tf JOIN df USING (token) CROSS JOIN nn),
      |r AS (SELECT *, row_number() OVER
      |    (PARTITION BY doc_id ORDER BY raw DESC, token) AS rank FROM sc)
      |SELECT doc_id, CAST(rank AS INT) AS rank, token, tf, df,
      |  round(raw, 4) AS tfidf
      |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  // ------------------------------------------ t17 count-min token counts

  /** Count-min sketch point estimates — [[Sketches.cmsTable]]/`cmsLookup`
    * over the corpus token stream, SELF-VERIFYING: the estimates for the
    * exact top-10 tokens (the in-query exact twin) must never undercount,
    * and the overcount is gated at TWICE the textbook error term
    * `⌈e·total/width⌉`. The 1× bound is only probabilistic (holds w.p.
    * `1 − e^-depth` per item), so a legitimate collision at an untested
    * scale could fail a 1× gate; the 2× headroom drops the per-item
    * violation odds to ~(2e)^-depth ≈ 10⁻³ and, with the FIXED xxhash64
    * seed, the gate is deterministic per dataset — green at every shipped
    * scale factor (sf0.001/0.01/0.1 and the sf1 rehearsal). The oracle
    * reproduces the exact counts and pins the gate TRUE. */
  private def t17(s: SparkSession, dir: String): DataFrame = {
    val depth = 4; val width = 1024
    val toks = t(s, dir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("token"))
    val sketch = Sketches.cmsTable(toks, "token", depth, width)
    val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
    val top10 = exact.orderBy(col("n").desc, col("token")).limit(10)
    val total = toks.agg(count(lit(1)).as("__tot"))
    val est = Sketches.cmsLookup(top10.select("token"), sketch, "token",
      depth, width)
    top10.join(est, Seq("token"))
      .crossJoin(broadcast(total))
      .select(col("token"), col("n"),
        (col("cms_est") >= col("n") && col("cms_est") <= col("n") +
          lit(2) * ceil(lit(math.E) * col("__tot") / width).cast("long"))
          .as("est_ok"))
      .orderBy(col("n").desc, col("token"))
  }

  private val t17Sql =
    """WITH toks AS (SELECT doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
      |         ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tk
      |  FROM documents),
      |u AS (SELECT unnest(tk) AS token FROM toks),
      |c AS (SELECT token, COUNT(*) AS n FROM u GROUP BY 1)
      |SELECT token, n, TRUE AS est_ok FROM c
      |ORDER BY n DESC, token LIMIT 10""".stripMargin

  // ----------------------------------------------------- t18 BM25 ranking

  /** Retrieval-scored corpus selection — [[TextOps.bm25]] against a fixed
    * 3-term query profile, top-20 documents. The oracle recomputes dl,
    * avgdl, per-term tf/df, the Robertson idf, the length-normalized term
    * weights, and the rounded-score/doc-id ordering. */
  private def t18(s: SparkSession, dir: String): DataFrame =
    TextOps.bm25(t(s, dir, "documents"),
      Seq("join", "customer", "vector"), topN = 20)
      .orderBy(col("bm25").desc, col("doc_id"))

  private val t18Sql =
    """WITH toks AS (SELECT doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
      |         ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tk
      |  FROM documents),
      |u AS (SELECT doc_id, unnest(tk) AS token FROM toks),
      |dl AS (SELECT doc_id, COUNT(*) AS dl FROM u GROUP BY 1),
      |st AS (SELECT AVG(dl) AS avgdl, CAST(COUNT(*) AS DOUBLE) AS nd FROM dl),
      |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM u
      |  WHERE token IN ('join', 'customer', 'vector') GROUP BY 1, 2),
      |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
      |w AS (SELECT t.doc_id,
      |    ln(1 + (nd - df + 0.5) / (df + 0.5)) * tf * 2.2 /
      |      (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS w, dl
      |  FROM tf t JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN st)
      |SELECT doc_id, COUNT(*) AS n_terms, MAX(dl) AS dl,
      |  round(SUM(w), 4) AS bm25
      |FROM w GROUP BY 1 ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin

  // ------------------------------------------ t19 compression-ratio signal

  /** Compression-ratio quality signal — [[CompressionSignal.signals]]
    * (real deflate in a single `mapPartitions` pass), SELF-VERIFYING via
    * gates the oracle pins TRUE: deflate never inflates past the stored-
    * block bound, and doubling a ≥ 64-byte document costs strictly less
    * than double (the LZ77 self-similarity property that makes the signal
    * a repetition detector). `n_raw` is exact utf-8 bytes, oracle-checked
    * against DuckDB `strlen` (byte semantics). */
  private def t19(s: SparkSession, dir: String): DataFrame =
    CompressionSignal.signals(t(s, dir, "documents"))
      .select(col("doc_id"), col("n_raw"),
        (col("n_deflate") <= col("n_raw") + 32).as("ok_bounded"),
        (col("n_raw") < 64 || col("n_deflate2") < col("n_deflate") * 2)
          .as("ok_self_similar"))
      .orderBy(col("doc_id"))

  private val t19Sql =
    """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_raw,
      |  TRUE AS ok_bounded, TRUE AS ok_self_similar
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------- t20 Gopher-style quality rules

  /** Gopher/MassiveText-style composite rule filter
    * ([[TextOps.gopherRules]]) — every rule its own boolean column plus
    * the conjunction, fully reproduced by the oracle (all ratios are
    * single IEEE divisions of integer counts; the regex classes live in
    * the Java∩RE2 shared subset). Dials are corpus-appropriate so every
    * rule SPLITS rather than uniformly passing or failing: minWords 20
    * (the synthetic docs are short) and the function-word list drawn from
    * the corpus register ("the"/"a"/"data"/"table") — with the English
    * defaults, r_stopwords failed all 500 docs and `pass` carried no
    * signal. */
  private def t20(s: SparkSession, dir: String): DataFrame =
    TextOps.gopherRules(t(s, dir, "documents"), minWords = 20,
        stopList = Seq("the", "a", "data", "table"))
      .orderBy(col("doc_id"))

  private val t20Sql =
    """WITH d AS (SELECT doc_id, text,
      |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
      |         ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tk,
      |    regexp_split_to_array(text, '\n') AS ln
      |  FROM documents),
      |m AS (SELECT doc_id, len(tk) AS nw,
      |    CASE WHEN len(tk) = 0 THEN 0.0 ELSE
      |      CAST(list_sum(list_transform(tk, w -> length(w))) AS DOUBLE)
      |        / len(tk) END AS mean_len,
      |    CASE WHEN len(tk) = 0 THEN 0.0 ELSE
      |      CAST(len(list_filter(tk, w -> regexp_matches(w, '[a-z]')))
      |        AS DOUBLE) / len(tk) END AS alpha_frac,
      |    CAST(len(list_filter(ln, l -> regexp_matches(l, '^\s*[-*•]')))
      |      AS DOUBLE) / len(ln) AS bullet_frac,
      |    CAST(len(list_filter(ln, l -> regexp_matches(l, '(\.\.\.|…)\s*$')))
      |      AS DOUBLE) / len(ln) AS ellipsis_frac,
      |    CASE WHEN len(tk) = 0 THEN 0.0 ELSE
      |      CAST(len(regexp_extract_all(text, '#|\.\.\.|…')) AS DOUBLE)
      |        / len(tk) END AS symbol_ratio,
      |    (CASE WHEN list_contains(tk, 'the') THEN 1 ELSE 0 END +
      |     CASE WHEN list_contains(tk, 'a') THEN 1 ELSE 0 END +
      |     CASE WHEN list_contains(tk, 'data') THEN 1 ELSE 0 END +
      |     CASE WHEN list_contains(tk, 'table') THEN 1 ELSE 0 END) AS stop_hits
      |  FROM d),
      |r AS (SELECT doc_id, CAST(nw AS BIGINT) AS n_words,
      |    round(mean_len, 6) AS mean_word_len,
      |    nw > 0 AND nw BETWEEN 20 AND 100000 AS r_word_count,
      |    nw > 0 AND mean_len BETWEEN 3 AND 10 AS r_mean_word_len,
      |    nw > 0 AND alpha_frac >= 0.8 AS r_alpha_words,
      |    nw > 0 AND bullet_frac <= 0.9 AS r_bullet_lines,
      |    nw > 0 AND ellipsis_frac <= 0.3 AS r_ellipsis_lines,
      |    nw > 0 AND symbol_ratio < 0.1 AS r_symbol_ratio,
      |    nw > 0 AND stop_hits >= 2 AS r_stopwords
      |  FROM m)
      |SELECT *, r_word_count AND r_mean_word_len AND r_alpha_words AND
      |    r_bullet_lines AND r_ellipsis_lines AND r_symbol_ratio AND
      |    r_stopwords AS pass
      |FROM r ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ t04 PII redaction

  /** Seed every doc with synthetic PII (email, IPv4, phone derived from
    * doc_id — the corpus itself is PII-free), then redact and count. The
    * oracle applies the IDENTICAL regexes in DuckDB (both dialects run the
    * shared RE2∩Java subset). */
  private def t04(s: SparkSession, dir: String): DataFrame = {
    val seeded = t(s, dir, "documents").select(col("doc_id"),
      concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com via 10."), (col("doc_id") % 200).cast("string"),
        lit(".0.7 tel 555-123-4567")).as("text"))
    seeded.select(col("doc_id"),
        TextOps.piiCount(col("text"), TextOps.EmailRe).as("n_emails"),
        TextOps.piiCount(col("text"), TextOps.Ipv4Re).as("n_ips"),
        TextOps.piiCount(col("text"), TextOps.PhoneRe).as("n_phones"),
        md5(TextOps.redactPii(col("text"))).as("red_md5"))
      .orderBy(col("doc_id"))
  }

  private val t04Sql =
    """WITH seeded AS (SELECT doc_id,
      |  text || ' contact user' || CAST(doc_id AS VARCHAR) ||
      |  '@example.com via 10.' || CAST(doc_id % 200 AS VARCHAR) ||
      |  '.0.7 tel 555-123-4567' AS text FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(text,
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
      |  CAST(len(regexp_extract_all(text,
      |    '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
      |  md5(regexp_replace(regexp_replace(regexp_replace(text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
      |    '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g')) AS red_md5
      |FROM seeded ORDER BY doc_id""".stripMargin

  // ------------------------------ t22 exact repeated-span (substring) dedup

  /** Cross-document exact substring duplication, the every-position
    * complement of t02's sampled winnow fingerprints: 8-token grams
    * occurring in ≥ 2 distinct docs mark duplicated span positions
    * (Lee et al. 2021 semantics at gram granularity). Keep flag at
    * dup_ratio ≤ 0.5 — at sf0.001 45/500 docs carry duplicated spans, so
    * the oracle exercises both flag values and the zero-gram short-doc
    * edge. */
  private def t22(s: SparkSession, dir: String): DataFrame =
    TextOps.substringDupSignal(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        w = 8, maxRatio = 0.5)
      .orderBy(col("doc_id"))

  private val t22Sql =
    """WITH toks AS (SELECT doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
      |         ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tk
      |  FROM documents),
      |g AS (SELECT doc_id,
      |    CASE WHEN len(tk) < 8 THEN CAST([] AS VARCHAR[])
      |         ELSE [array_to_string(tk[i:i+7], ' ')
      |               FOR i IN range(1, len(tk)-6)] END AS grams
      |  FROM toks),
      |pos AS (SELECT doc_id, unnest(grams) AS gram FROM g),
      |dup AS (SELECT gram FROM pos GROUP BY 1
      |        HAVING COUNT(DISTINCT doc_id) >= 2),
      |dupc AS (SELECT doc_id, COUNT(*) AS n_dup FROM pos
      |         WHERE gram IN (SELECT gram FROM dup) GROUP BY 1)
      |SELECT t.doc_id, CAST(len(t.grams) AS BIGINT) AS n_grams,
      |  CAST(COALESCE(d.n_dup, 0) AS BIGINT) AS n_dup_grams,
      |  round(CASE WHEN len(t.grams) = 0 THEN 0.0
      |        ELSE CAST(COALESCE(d.n_dup, 0) AS DOUBLE) / len(t.grams) END,
      |        6) AS dup_ratio,
      |  (CASE WHEN len(t.grams) = 0 THEN 0.0
      |        ELSE CAST(COALESCE(d.n_dup, 0) AS DOUBLE) / len(t.grams) END)
      |    <= 0.5 AS keep
      |FROM g t LEFT JOIN dupc d USING (doc_id) ORDER BY t.doc_id""".stripMargin

  // --------------------- t24 substring dedup, hashed-gram form (gated)

  /** t22's 100 TB swap-in, EXECUTED and gated: the same repeated-span
    * signal with `hashedGrams = true` — grams are 64-bit rotate-xor
    * mixes of the token hashes, so no gram STRING is ever built and the
    * gram shuffle moves fixed-width longs (~8× fewer exchange bytes).
    * Joined per doc against the string twin and gated on full row
    * equality (identical absent 64-bit collisions). The string twin's
    * values ride along so the oracle pins the whole row (the d20/dt03
    * pattern). */
  private def t24(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      .localCheckpoint()
    val exact = TextOps.substringDupSignal(docs, w = 8, maxRatio = 0.5)
    val hashed = TextOps.substringDupSignal(docs, w = 8, maxRatio = 0.5,
        hashedGrams = true)
      .select(col("doc_id"), col("n_grams").as("__hn"),
        col("n_dup_grams").as("__hd"), col("keep").as("__hk"))
    exact.join(hashed, "doc_id")
      .select(col("doc_id"), col("n_grams"), col("n_dup_grams"),
        col("dup_ratio"), col("keep"),
        (col("__hn") === col("n_grams") && col("__hd") === col("n_dup_grams")
          && col("__hk") === col("keep")).as("hashed_identical"))
      .orderBy(col("doc_id"))
  }

  private val t24Sql =
    """WITH toks AS (SELECT doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
      |         ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tk
      |  FROM documents),
      |g AS (SELECT doc_id,
      |    CASE WHEN len(tk) < 8 THEN CAST([] AS VARCHAR[])
      |         ELSE [array_to_string(tk[i:i+7], ' ')
      |               FOR i IN range(1, len(tk)-6)] END AS grams
      |  FROM toks),
      |pos AS (SELECT doc_id, unnest(grams) AS gram FROM g),
      |dup AS (SELECT gram FROM pos GROUP BY 1
      |        HAVING COUNT(DISTINCT doc_id) >= 2),
      |dupc AS (SELECT doc_id, COUNT(*) AS n_dup FROM pos
      |         WHERE gram IN (SELECT gram FROM dup) GROUP BY 1)
      |SELECT t.doc_id, CAST(len(t.grams) AS BIGINT) AS n_grams,
      |  CAST(COALESCE(d.n_dup, 0) AS BIGINT) AS n_dup_grams,
      |  round(CASE WHEN len(t.grams) = 0 THEN 0.0
      |        ELSE CAST(COALESCE(d.n_dup, 0) AS DOUBLE) / len(t.grams) END,
      |        6) AS dup_ratio,
      |  (CASE WHEN len(t.grams) = 0 THEN 0.0
      |        ELSE CAST(COALESCE(d.n_dup, 0) AS DOUBLE) / len(t.grams) END)
      |    <= 0.5 AS keep,
      |  TRUE AS hashed_identical
      |FROM g t LEFT JOIN dupc d USING (doc_id) ORDER BY t.doc_id""".stripMargin

  // ------------------------------------------------ t25 Zipf corpus audit

  /** Corpus frequency-distribution fingerprint
    * ([[graft.llm.TextOps.zipfAudit]]): total tokens, vocab size, top-10
    * mass, and the least-squares Zipf slope over the top-100 ranks —
    * the one-row shard health check that catches templated/boilerplate
    * floods (flattened slope, pumped top-10 mass) before training.
    * Value-matched: DuckDB reproduces the rank set (count desc, token
    * tie-break), ln sums, and slope to the 6-decimal round. */
  private def t25(s: SparkSession, dir: String): DataFrame =
    TextOps.zipfAudit(t(s, dir, "documents"), topN = 100)

  private val t25Sql =
    """WITH tok AS (SELECT unnest(
      |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
      |         ELSE regexp_split_to_array(trim(lower(text)), '\s+') END)
      |    AS tok
      |  FROM documents),
      |freq AS (SELECT tok, COUNT(*) AS n FROM tok GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_tokens,
      |    CAST(COUNT(*) AS BIGINT) AS vocab_size FROM freq),
      |top AS (SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS rank
      |  FROM freq ORDER BY n DESC, tok LIMIT 100),
      |fit AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k,
      |    SUM(ln(rank)) AS sx, SUM(ln(n)) AS sy,
      |    SUM(ln(rank) * ln(n)) AS sxy, SUM(ln(rank) * ln(rank)) AS sxx,
      |    SUM(CASE WHEN rank <= 10 THEN n ELSE 0 END) AS top10
      |  FROM top)
      |SELECT t.n_tokens, t.vocab_size,
      |  round(CAST(f.top10 AS DOUBLE) / t.n_tokens, 6) AS top10_mass,
      |  round((f.k * f.sxy - f.sx * f.sy)
      |        / (f.k * f.sxx - f.sx * f.sx), 6) AS zipf_slope
      |FROM tot t, fit f""".stripMargin

  // ------------------------------------------ t23 token-budget greedy fill

  /** Budget-constrained mix assembly: per language, fill a 3000-token
    * budget with the highest-quality documents (greedy by quality desc,
    * doc_id tiebreak, running-token cutoff) — the step that turns scored
    * shards into a fixed-size training mix. Budget sized BELOW each
    * language's total tokens at sf0.001 so the oracle verifies the cutoff
    * boundary, not just the ranking. */
  private def t23(s: SparkSession, dir: String): DataFrame = {
    // the scored slab is persisted (the p01 pattern): tokenBudget's
    // decomposition reads its input twice (distinct-score classify +
    // candidate join), and re-running the quality/token expressions —
    // the dominant cost — doubles the query. The slab is a 4-column
    // narrow projection, the stage output a real pipeline persists anyway.
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextOps.tokenCount(col("text")).cast("bigint").as("n_tokens"),
        TextOps.qualityScore(col("text")).as("quality"))
      .localCheckpoint()
    Sampling.tokenBudget(docs, col("lang"), col("n_tokens"),
        col("quality"), col("doc_id"), budget = 3000L)
      .orderBy(col("doc_id"))
  }

  private val t23Sql = {
    val allWords = TextOps.stopwords.values.flatten.toSeq.distinct
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH base AS (SELECT doc_id, lang, text,
       |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
       |         ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS tk
       |  FROM documents),
       |pre AS (SELECT doc_id, lang, text, tk,
       |    length(text) - length(regexp_replace(text,
       |        '[.,!?;:''"()\\[\\]{}-]', '', 'g')) AS n_punct,
       |    len(list_filter(tk, x -> list_contains($allWords, x))) AS sw_hits
       |  FROM base),
       |scored AS (SELECT doc_id, lang, CAST(len(tk) AS BIGINT) AS n_tokens,
       |  ${qualitySqlExpr("len(tk)")} AS quality
       |  FROM pre),
       |cum AS (SELECT doc_id, lang, n_tokens, quality,
       |    SUM(n_tokens) OVER (PARTITION BY lang
       |      ORDER BY quality DESC, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS c
       |  FROM scored)
       |SELECT doc_id, lang, n_tokens, quality
       |FROM cum WHERE c <= 3000 ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- export

  private[graft] val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t01_text_analysis" -> (t01 _),
    "t02_winnow_fingerprints" -> (t02 _),
    "t03_text_cleaning" -> (t03 _),
    "t04_pii_redact" -> (t04 _),
    "t05_url_domains" -> (t05 _),
    "t06_repetition" -> (t06 _),
    "t07_quality_topq" -> (t07 _),
    "t08_sequence_pack" -> (t08 _),
    "t09_token_chunking" -> (t09 _),
    "t10_lexical_diversity" -> (t10 _),
    "t11_vocabulary" -> (t11 _),
    "t12_unigram_logprob" -> (t12 _),
    "t13_line_dedup" -> (t13 _),
    "t14_url_canon" -> (t14 _),
    "t15_script_mix" -> (t15 _),
    "t16_tfidf_terms" -> (t16 _),
    "t17_cms_counts" -> (t17 _),
    "t18_bm25_rank" -> (t18 _),
    "t19_compress_signal" -> (t19 _),
    "t20_quality_rules" -> (t20 _),
    "t21_bigram_logprob" -> (t21 _),
    "t22_substring_dedup" -> (t22 _),
    "t24_substring_dedup_hashed" -> (t24 _),
    "t25_zipf_audit" -> (t25 _),
    "t23_token_budget" -> (t23 _))

  private[graft] val oracleSql: Map[String, String] = Map(
    "t01_text_analysis" -> t01Sql,
    "t02_winnow_fingerprints" -> t02Sql,
    "t03_text_cleaning" -> t03Sql,
    "t04_pii_redact" -> t04Sql,
    "t05_url_domains" -> t05Sql,
    "t06_repetition" -> t06Sql,
    "t07_quality_topq" -> t07Sql,
    "t08_sequence_pack" -> t08Sql,
    "t09_token_chunking" -> t09Sql,
    "t10_lexical_diversity" -> t10Sql,
    "t11_vocabulary" -> t11Sql,
    "t12_unigram_logprob" -> t12Sql,
    "t13_line_dedup" -> t13Sql,
    "t14_url_canon" -> t14Sql,
    "t15_script_mix" -> t15Sql,
    "t16_tfidf_terms" -> t16Sql,
    "t17_cms_counts" -> t17Sql,
    "t18_bm25_rank" -> t18Sql,
    "t19_compress_signal" -> t19Sql,
    "t20_quality_rules" -> t20Sql,
    "t21_bigram_logprob" -> t21Sql,
    "t22_substring_dedup" -> t22Sql,
    "t24_substring_dedup_hashed" -> t24Sql,
    "t25_zipf_audit" -> t25Sql,
    "t23_token_budget" -> t23Sql)
}
