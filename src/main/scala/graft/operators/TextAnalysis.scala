package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

/** Text-analysis operators over `documents` (BASELINE.json north star):
  * language ID, quality scoring, token counting, fingerprinting. All
  * single-pass projections/aggregations — embarrassingly parallel, no
  * shuffle except the final presentation sort.
  */
object TextAnalysis {

  private def words(c: Column): Column = split(lower(c), " ")

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une"),
    "es" -> Seq("el", "los", "de", "y", "un", "una", "es"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "不"))

  private def hits(ws: Column, lang: String): Column =
    size(filter(ws, w => array_contains(typedLit(stopwords(lang)), w))).cast(LongType)

  private def sqlHits(lang: String): String = {
    val list = stopwords(lang).map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter(string_split(lower(text), ' '), w -> list_contains($list, w)))"
  }

  /** N-gram/stopword-heuristic language ID: score = stopword hits per
    * language, argmax with a fixed preference order for ties. */
  val t1 = GraftQuery(
    "t1_lang_id",
    "Stopword-heuristic language identification + agreement with the labeled lang",
    (s, dir) => {
      val langs = Seq("en", "de", "fr", "es", "zh")
      val d = table(s, dir, "documents")
        .withColumn("ws", words(col("text")))
      val scored = langs.foldLeft(d)((df, l) => df.withColumn(s"s_$l", hits(col("ws"), l)))
      scored
        .withColumn("predicted",
          // explicit argmax with first-wins tiebreak (en, de, fr, es, zh)
          when(col("s_en") >= greatest(col("s_de"), col("s_fr"), col("s_es"), col("s_zh")), "en")
            .when(col("s_de") >= greatest(col("s_fr"), col("s_es"), col("s_zh")), "de")
            .when(col("s_fr") >= greatest(col("s_es"), col("s_zh")), "fr")
            .when(col("s_es") >= col("s_zh"), "es")
            .otherwise("zh"))
        .select(col("doc_id"), col("lang"), col("predicted"),
          (col("predicted") === col("lang")).as("agree"),
          col("s_en"), col("s_de"), col("s_fr"), col("s_es"), col("s_zh"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH scored AS (
        SELECT doc_id, lang,
               ${sqlHits("en")} AS s_en,
               ${sqlHits("de")} AS s_de,
               ${sqlHits("fr")} AS s_fr,
               ${sqlHits("es")} AS s_es,
               ${sqlHits("zh")} AS s_zh
        FROM documents)
      SELECT doc_id, lang,
             CASE WHEN s_en >= greatest(s_de, s_fr, s_es, s_zh) THEN 'en'
                  WHEN s_de >= greatest(s_fr, s_es, s_zh) THEN 'de'
                  WHEN s_fr >= greatest(s_es, s_zh) THEN 'fr'
                  WHEN s_es >= s_zh THEN 'es'
                  ELSE 'zh' END AS predicted,
             (CASE WHEN s_en >= greatest(s_de, s_fr, s_es, s_zh) THEN 'en'
                   WHEN s_de >= greatest(s_fr, s_es, s_zh) THEN 'de'
                   WHEN s_fr >= greatest(s_es, s_zh) THEN 'fr'
                   WHEN s_es >= s_zh THEN 'es'
                   ELSE 'zh' END) = lang AS agree,
             s_en, s_de, s_fr, s_es, s_zh
      FROM scored
      ORDER BY doc_id"""))

  /** Quality scoring: length/word/stopword-ratio features + a composite
    * score — the standard pre-training corpus filter shape. */
  val t2 = GraftQuery(
    "t2_quality_score",
    "Document quality features (length, word count, stopword ratio) + composite score",
    (s, dir) =>
      table(s, dir, "documents")
        .withColumn("ws", words(col("text")))
        .withColumn("n_words", size(col("ws")).cast(LongType))
        .withColumn("sum_word_len",
          aggregate(transform(col("ws"), w => length(w).cast("long")), lit(0L), (a, x) => a + x))
        .withColumn("stop_hits", hits(col("ws"), "en"))
        .select(
          col("doc_id"),
          length(col("text")).cast(LongType).as("n_chars"),
          col("n_words"),
          col("sum_word_len"),
          round(col("sum_word_len").cast("double") / col("n_words"), 4).as("avg_word_len"),
          round(col("stop_hits").cast("double") / col("n_words"), 4).as("stop_ratio"),
          round(least(lit(1.0), col("n_words").cast("double") / 50.0) * 0.5
            + (col("stop_hits").cast("double") / col("n_words")) * 0.5, 4).as("quality_score"))
        .orderBy("doc_id"),
    Some(s"""
      WITH f AS (
        SELECT doc_id, length(text) AS n_chars,
               len(string_split(lower(text), ' ')) AS n_words,
               CAST(list_aggregate(list_transform(string_split(lower(text), ' '),
                 w -> length(w)), 'sum') AS BIGINT) AS sum_word_len,
               ${sqlHits("en")} AS stop_hits
        FROM documents)
      SELECT doc_id, n_chars, n_words, sum_word_len,
             round(CAST(sum_word_len AS DOUBLE) / n_words, 4) AS avg_word_len,
             round(CAST(stop_hits AS DOUBLE) / n_words, 4) AS stop_ratio,
             round(least(1.0, CAST(n_words AS DOUBLE) / 50.0) * 0.5
               + (CAST(stop_hits AS DOUBLE) / n_words) * 0.5, 4) AS quality_score
      FROM f
      ORDER BY doc_id"""))

  /** Token counting: whitespace tokens, regex (BPE-ish word/number/symbol)
    * tokens, and the chars/4 BPE estimate. */
  val t3 = GraftQuery(
    "t3_token_count",
    "Whitespace + regex tokenizer counts and chars/4 BPE estimate",
    (s, dir) =>
      table(s, dir, "documents")
        .select(
          col("doc_id"),
          size(split(col("text"), " ")).cast(LongType).as("ws_tokens"),
          size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))).cast(LongType).as("re_tokens"),
          ceil(length(col("text")) / 4.0).cast(LongType).as("bpe_estimate"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             len(string_split(text, ' ')) AS ws_tokens,
             len(regexp_extract_all(text, '[a-z0-9]+')) AS re_tokens,
             CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_estimate
      FROM documents
      ORDER BY doc_id"""))

  /** Polynomial rolling-hash fingerprint over the character stream
    * (mod 1e9+7, base 31) — deterministic, engine-independent, exact. */
  val t4 = GraftQuery(
    "t4_fingerprint",
    "Rolling-hash document fingerprint + duplicate-fingerprint count",
    (s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"),
          aggregate(
            transform(split(col("text"), ""), c => ascii(c).cast("long")),
            lit(0L),
            (acc, x) => (acc * 31 + x) % 1000000007L).as("fingerprint"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
               (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
      FROM documents
      ORDER BY doc_id"""))

  /** Character-bigram profiles per language (fixed literal profiles, the
    * classic Cavnar–Trenkle n-gram-profile shape reduced to a deterministic
    * scoring rule). Occurrence counting via length arithmetic keeps the
    * whole thing in codegen'd string ops and makes the oracle exact. */
  private val bigramProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("th", "he", "in", "er", "an", "re"),
    "de" -> Seq("ch", "ei", "ie", "un", "sc", "de"),
    "fr" -> Seq("le", "es", "ou", "qu", "ai", "en"),
    "es" -> Seq("la", "os", "el", "ar", "ad", "do"),
    "zh" -> Seq("zh", "xi", "ng", "ao", "uo", "ji"))

  private def bigramHits(c: Column, lang: String): Column =
    bigramProfiles(lang).map { b =>
      ((length(c) - length(regexp_replace(c, b, ""))) / 2).cast(LongType)
    }.reduce(_ + _)

  private def sqlBigramHits(lang: String): String =
    bigramProfiles(lang).map { b =>
      s"(length(t) - length(replace(t, '$b', ''))) // 2"
    }.mkString(" + ")

  /** Character-n-gram language ID — the profile-based variant of t1
    * (stopword heuristic); same argmax/tiebreak contract. */
  val t5 = GraftQuery(
    "t5_lang_ngram",
    "Char-bigram-profile language identification (Cavnar–Trenkle shape)",
    (s, dir) => {
      val d = table(s, dir, "documents").withColumn("t", lower(col("text")))
      val scored = Seq("en", "de", "fr", "es", "zh")
        .foldLeft(d)((df, l) => df.withColumn(s"g_$l", bigramHits(col("t"), l)))
      scored
        .withColumn("predicted",
          when(col("g_en") >= greatest(col("g_de"), col("g_fr"), col("g_es"), col("g_zh")), "en")
            .when(col("g_de") >= greatest(col("g_fr"), col("g_es"), col("g_zh")), "de")
            .when(col("g_fr") >= greatest(col("g_es"), col("g_zh")), "fr")
            .when(col("g_es") >= col("g_zh"), "es")
            .otherwise("zh"))
        .select(col("doc_id"), col("lang"), col("predicted"),
          col("g_en"), col("g_de"), col("g_fr"), col("g_es"), col("g_zh"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH lowered AS (SELECT doc_id, lang, lower(text) AS t FROM documents),
      scored AS (
        SELECT doc_id, lang,
               ${sqlBigramHits("en")} AS g_en,
               ${sqlBigramHits("de")} AS g_de,
               ${sqlBigramHits("fr")} AS g_fr,
               ${sqlBigramHits("es")} AS g_es,
               ${sqlBigramHits("zh")} AS g_zh
        FROM lowered)
      SELECT doc_id, lang,
             CASE WHEN g_en >= greatest(g_de, g_fr, g_es, g_zh) THEN 'en'
                  WHEN g_de >= greatest(g_fr, g_es, g_zh) THEN 'de'
                  WHEN g_fr >= greatest(g_es, g_zh) THEN 'fr'
                  WHEN g_es >= g_zh THEN 'es'
                  ELSE 'zh' END AS predicted,
             g_en, g_de, g_fr, g_es, g_zh
      FROM scored
      ORDER BY doc_id"""))

  /** Per-source corpus quality report — the curation dashboard a pipeline
    * runs before mixing sources into a training set: volume, text-level
    * duplication rate inside the source, language spread, length profile.
    * One scan + one hash aggregate keyed on source (count-distinct of the
    * full text aggregates a fixed-width sha2 digest, never the text — the
    * shuffle carries 32-byte keys at 100 TB). Ratios are exact-integer
    * divisions → bit-identical in both engines. */
  val t6 = GraftQuery(
    "t6_source_quality",
    "Per-source corpus report: volume, distinct-text dup rate, language spread, length profile",
    (s, dir) =>
      table(s, dir, "documents")
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(sha2(col("text"), 256)).as("n_distinct_texts"),
          countDistinct(col("lang")).as("n_langs"),
          min(length(col("text")).cast(LongType)).as("min_chars"),
          max(length(col("text")).cast(LongType)).as("max_chars"),
          (sum(length(col("text")).cast(LongType)).cast("double") / count(lit(1)))
            .as("avg_chars"))
        .withColumn("dup_ratio",
          lit(1.0) - col("n_distinct_texts").cast("double") / col("n_docs"))
        .orderBy("source"),
    Some("""
      SELECT source,
             count(*) AS n_docs,
             count(DISTINCT text) AS n_distinct_texts,
             count(DISTINCT lang) AS n_langs,
             min(length(text)) AS min_chars,
             max(length(text)) AS max_chars,
             CAST(CAST(sum(length(text)) AS BIGINT) AS DOUBLE) / count(*) AS avg_chars,
             1.0 - CAST(count(DISTINCT text) AS DOUBLE) / count(*) AS dup_ratio
      FROM documents
      GROUP BY source
      ORDER BY source"""))

  /** Top-k vocabulary per language: tokenize → (lang, token) hash count →
    * per-language window top-5. The explode is the one genuine fan-out in
    * the text layer (every token becomes a row); at 100 TB the count is
    * partial-aggregated map-side before the shuffle (Spark's hash agg does
    * this automatically), so shuffle volume is |vocab| per partition, not
    * |tokens|. Deterministic with (count desc, token asc) tiebreak. */
  val t7 = GraftQuery(
    "t7_top_tokens",
    "Top-5 tokens per language (explode → map-side-combined count → window top-k)",
    (s, dir) => {
      val toks = table(s, dir, "documents")
        .select(col("lang"), explode(words(col("text"))).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy("lang", "token")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("lang").orderBy(col("n").desc, col("token"))
      toks.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("lang"), col("rank").cast(LongType).as("rank"),
          col("token"), col("n"))
        .orderBy("lang", "rank")
    },
    Some("""
      WITH toks AS (
        SELECT lang, t.token, count(*) AS n
        FROM documents, UNNEST(string_split(lower(text), ' ')) AS t(token)
        WHERE length(t.token) > 0
        GROUP BY lang, t.token)
      SELECT lang, rank, token, n
      FROM (SELECT lang, token, n,
                   row_number() OVER (PARTITION BY lang
                     ORDER BY n DESC, token) AS rank
            FROM toks)
      WHERE rank <= 5
      ORDER BY lang, rank"""))

  /** Content-defined chunking (the FastCDC/rsync idea): chunk boundaries
    * are decided by the CONTENT (a boundary predicate on a local hash), not
    * by fixed offsets — so an insertion early in a document shifts only the
    * chunk it lands in, and chunk-level dedup across the corpus still
    * matches everything downstream of the edit. Boundary rule here is a
    * 1-char predicate (code % 16 == 0) standing in for a gear-hash window
    * (engine-neutral, exactly replayable in SQL); the dataflow — per-doc
    * boundary scan, chunk slicing, digest, corpus-wide digest groupBy — is
    * the real shape. Output: chunks shared by >1 document, the dedup
    * candidates a 100 TB pipeline would deduplicate at block granularity. */
  val t8 = GraftQuery(
    "t8_cdc_chunks",
    "Content-defined chunking + corpus-wide chunk dedup: shared-chunk report",
    (s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
      // chunking via ONE lookbehind-regex split (stays in whole-stage
      // codegen): a chunk ends right after any boundary char (ASCII code
      // ≡ 0 mod 16 — the class below enumerates them), which is exactly
      // the per-position boundary scan the oracle replays list-wise. A
      // per-char HOF scan here ran interpreted and cost 3.4 s at sf0.1;
      // the split is 0.4 s. Trailing empty chunk (text ending on a
      // boundary) is dropped to match the bounds semantics.
      val chunks = docs
        .select(col("doc_id"),
          explode(split(col("text"), "(?<=[\\x10 0@P`p])")).as("chunk"))
        .filter(length(col("chunk")) > 0)
        .select(col("doc_id"),
          md5(col("chunk").cast("binary")).as("chunk_md5"),
          length(col("chunk")).cast("long").as("chunk_len"))
      chunks.groupBy("chunk_md5")
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("doc_id")).as("n_docs"),
          min(col("doc_id")).as("first_doc"),
          max(col("chunk_len")).as("chunk_len"))
        .filter(col("n_docs") > 1)
        .orderBy("chunk_md5")
    },
    Some("""
      WITH b AS (
        SELECT doc_id, text,
               list_sort(list_distinct(
                 [0] ||
                 list_filter(list_transform(range(1, length(text) + 1),
                   p -> CASE WHEN ascii(substring(text, CAST(p AS INTEGER), 1)) % 16 = 0
                             THEN p END), x -> x IS NOT NULL) ||
                 [length(text)])) AS bounds
        FROM documents),
      ch AS (
        SELECT doc_id,
               md5(substring(text, CAST(bounds[i+1] + 1 AS INTEGER),
                   CAST(bounds[i+2] - bounds[i+1] AS INTEGER))) AS chunk_md5,
               CAST(bounds[i+2] - bounds[i+1] AS BIGINT) AS chunk_len
        FROM b, UNNEST(range(0, len(bounds) - 1)) AS t(i))
      SELECT chunk_md5, count(*) AS n_occurrences,
             count(DISTINCT doc_id) AS n_docs,
             min(doc_id) AS first_doc,
             max(chunk_len) AS chunk_len
      FROM ch
      GROUP BY chunk_md5
      HAVING count(DISTINCT doc_id) > 1
      ORDER BY chunk_md5"""))

  /** Gopher-style repetition filters (Rae et al. 2021, "Scaling Language
    * Models", table A1): documents dominated by repeated n-grams or by one
    * word are boilerplate/spam and get filtered before training. Two rules
    * per doc: the fraction of bigram OCCURRENCES that are repeats
    * (1 − distinct/total) and the most-frequent-word share of all words.
    * Dataflow is two skinny aggregations — the shuffle carries (doc_id,
    * hashed gram, count) partial aggregates with map-side combine, never
    * text — then a per-doc join of the two 1-row-per-doc summaries. At
    * 100 TB every stage is key-partitioned on doc_id with bounded rows per
    * doc (vocab-bounded), no driver state. */
  val t9 = GraftQuery(
    "t9_repetition_filter",
    "Gopher repetition rules: duplicate-bigram fraction + top-word share + keep/drop flag",
    (s, dir) => {
      val ws = table(s, dir, "documents")
        .select(col("doc_id"), words(col("text")).as("ws"))
      val bigrams = ws.select(col("doc_id"),
          explode(expr("transform(sequence(1, size(ws) - 1), i -> concat(ws[i-1], ' ', ws[i]))"))
            .as("bg"))
        .groupBy("doc_id", "bg").count()
        .groupBy("doc_id")
        .agg((lit(1.0) - count(lit(1)) / sum(col("count"))).as("raw_dup"))
        .select(col("doc_id"), round(col("raw_dup"), 4).as("dup_bigram_frac"))
      val topword = ws.select(col("doc_id"), explode(col("ws")).as("w"))
        .groupBy("doc_id", "w").count()
        .groupBy("doc_id")
        .agg((max(col("count")) / sum(col("count"))).as("raw_top"))
        .select(col("doc_id"), round(col("raw_top"), 4).as("top_word_frac"))
      bigrams.join(topword, "doc_id")
        .withColumn("keep",
          col("dup_bigram_frac") <= 0.4 && col("top_word_frac") <= 0.2)
        .orderBy("doc_id")
    },
    Some("""
      WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
      bg AS (SELECT doc_id,
                    ws[CAST(i AS INTEGER)] || ' ' || ws[CAST(i + 1 AS INTEGER)] AS bg
             FROM ws, UNNEST(range(1, len(ws))) AS t(i)),
      bgc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg),
      dup AS (SELECT doc_id, round(1.0 - count(*) / CAST(sum(c) AS DOUBLE), 4)
                       AS dup_bigram_frac
              FROM bgc GROUP BY doc_id),
      wc AS (SELECT doc_id, w, count(*) AS c
             FROM (SELECT doc_id, unnest(ws) AS w FROM ws) GROUP BY doc_id, w),
      top AS (SELECT doc_id, round(max(c) / CAST(sum(c) AS DOUBLE), 4) AS top_word_frac
              FROM wc GROUP BY doc_id)
      SELECT dup.doc_id, dup_bigram_frac, top_word_frac,
             dup_bigram_frac <= 0.4 AND top_word_frac <= 0.2 AS keep
      FROM dup JOIN top ON dup.doc_id = top.doc_id
      ORDER BY dup.doc_id"""))

  /** Benchmark-contamination scan (the GPT-3 appendix-C method, scaled
    * down: overlap of held-out eval n-grams against the training corpus).
    * The "benchmark" side is a deterministic slice (doc_id % 50 = 0); its
    * distinct 5-grams are a SMALL set that Spark broadcasts, so the corpus
    * side streams through one hash semi-join probe per 5-gram — no shuffle
    * of corpus text, no pairwise comparison. Output: per contaminated doc,
    * how many benchmark 5-grams it shares and with how many benchmark
    * docs. At 100 TB the benchmark set is fixed-size (an eval suite), so
    * the broadcast stays constant while the corpus scan parallelizes
    * freely — the shape this check has in production pipelines. */
  val t10 = GraftQuery(
    "t10_contamination",
    "Benchmark-contamination scan: corpus docs sharing 5-grams with the benchmark slice",
    (s, dir) => {
      val grams = table(s, dir, "documents")
        .select(col("doc_id"), words(col("text")).as("ws"))
        .select(col("doc_id"),
          explode(expr(
            "transform(sequence(1, greatest(size(ws) - 4, 0)), i -> concat_ws(' ', slice(ws, i, 5)))"))
            .as("gram"))
      val bench = grams.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("bench_id"), col("gram")).distinct()
      grams.filter(col("doc_id") % 50 =!= 0)
        .join(broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(countDistinct(col("gram")).as("n_shared_grams"),
          countDistinct(col("bench_id")).as("n_bench_docs"))
        .filter(col("n_shared_grams") >= 2)
        .orderBy("doc_id")
    },
    Some("""
      WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
      g AS (SELECT doc_id,
                   array_to_string(list_slice(ws, CAST(i AS INTEGER),
                     CAST(i + 4 AS INTEGER)), ' ') AS gram
            FROM ws, UNNEST(range(1, greatest(len(ws) - 4, 0) + 1)) AS t(i)),
      bench AS (SELECT DISTINCT doc_id AS bench_id, gram FROM g WHERE doc_id % 50 = 0)
      SELECT g.doc_id, count(DISTINCT g.gram) AS n_shared_grams,
             count(DISTINCT bench_id) AS n_bench_docs
      FROM g JOIN bench USING (gram)
      WHERE g.doc_id % 50 <> 0
      GROUP BY g.doc_id
      HAVING count(DISTINCT g.gram) >= 2
      ORDER BY g.doc_id"""))

  /** BM25 keyword search (Robertson & Zaragoza 2009; k1=1.2, b=0.75) —
    * the lexical-retrieval complement to the s* embedding queries. The
    * plan is the inverted-index shape: one token explode FILTERED to the
    * query terms (the "posting list" scan — everything else drops before
    * any shuffle), per-(doc, term) tf aggregation, and two broadcast-sized
    * side inputs (per-term document frequencies and the corpus-wide
    * average doc length). Nothing driver-side; corpus text never
    * reshuffles. Scores are IEEE doubles rounded to 4 on both engines. */
  val t11 = GraftQuery(
    "t11_bm25_search",
    "BM25 top-20 over documents for query terms {merge, hash, stream}",
    (s, dir) => {
      val terms = Seq("merge", "hash", "stream")
      val ws = table(s, dir, "documents")
        .select(col("doc_id"), words(col("text")).as("ws"))
        .select(col("doc_id"), size(col("ws")).cast("long").as("dl"), col("ws"))
      val corpus = ws.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
      val tf = ws.select(col("doc_id"), col("dl"), explode(col("ws")).as("term"))
        .filter(col("term").isin(terms: _*))
        .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
      val scored = tf
        .join(broadcast(df), "term")
        .crossJoin(broadcast(corpus))
        .withColumn("idf", log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
        .withColumn("contrib", col("idf") * (col("tf") * 2.2)
          / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
        .groupBy("doc_id")
        .agg(round(sum(col("contrib")), 4).as("bm25"),
          count(lit(1)).as("n_terms"))
      scored
        .orderBy(desc("bm25"), col("doc_id"))
        .limit(20)
        .select(col("doc_id"), col("bm25"), col("n_terms"))
    },
    Some("""
      WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
      d AS (SELECT doc_id, len(ws) AS dl, ws FROM ws),
      corpus AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM d),
      tf AS (SELECT doc_id, dl, term, count(*) AS tf
             FROM (SELECT doc_id, dl, unnest(ws) AS term FROM d)
             WHERE term IN ('merge', 'hash', 'stream')
             GROUP BY doc_id, dl, term),
      df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term)
      SELECT doc_id,
             round(sum(ln((n - df + 0.5) / (df + 0.5) + 1.0)
               * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 4) AS bm25,
             count(*) AS n_terms
      FROM tf JOIN df USING (term) CROSS JOIN corpus
      GROUP BY doc_id
      ORDER BY bm25 DESC, doc_id
      LIMIT 20"""))

  /** Sequence packing for LLM pretraining — the concat-and-chunk shape
    * (GPT-style): per source, document token streams are concatenated in
    * doc_id order and cut every B=512 tokens into fixed-length training
    * sequences; a document whose span crosses a cut contributes to both
    * neighboring chunks. The dataflow is one window cumsum per source (a
    * single shuffle on the group key) plus a bounded explode of each doc's
    * chunk span — no sequential fold, no driver loop; the straddle-allowed
    * contract is exactly what makes packing window-expressible (first-fit
    * bin packing without straddling is a sequential fold and would not
    * distribute). At 100 TB the group key becomes (source, shard) so each
    * cumsum is partition-local and chunk ids stay deterministic in doc_id
    * order. Tokenization matches t3's whitespace contract. Fully
    * deterministic → oracle-checked. */
  val t12 = GraftQuery(
    "t12_sequence_packing",
    "Concat-and-chunk packing: 512-token training sequences per source; docs straddle cuts",
    (s, dir) => {
      val B = 512
      val w = Window.partitionBy("source").orderBy("doc_id")
      val spans = table(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast(LongType).as("tok"))
        .withColumn("e", sum(col("tok")).over(w))
        .withColumn("b", col("e") - col("tok"))
      spans
        .select(col("source"), col("doc_id"), col("b"), col("e"),
          explode(sequence(floor(col("b") / B), floor((col("e") - 1) / B)))
            .as("chunk_id"))
        // tokens this doc contributes to this chunk = span ∩ chunk window
        .withColumn("fill",
          least(col("e"), (col("chunk_id") + 1) * B)
            - greatest(col("b"), col("chunk_id") * B))
        .groupBy("source", "chunk_id")
        .agg(count(lit(1)).as("n_docs"),
          min("doc_id").as("first_doc"),
          max("doc_id").as("last_doc"),
          sum("fill").as("chunk_tokens"))
        .orderBy("source", "chunk_id")
    },
    Some("""
      WITH toks AS (
        SELECT source, doc_id, len(string_split(text, ' ')) AS tok,
               CAST(sum(len(string_split(text, ' '))) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS e
        FROM documents),
      spans AS (SELECT source, doc_id, e - tok AS b, e FROM toks),
      ex AS (SELECT source, doc_id, b, e, chunk_id
             FROM spans, UNNEST(range(b // 512, (e - 1) // 512 + 1)) AS t(chunk_id))
      SELECT source, chunk_id,
             count(*) AS n_docs,
             min(doc_id) AS first_doc,
             max(doc_id) AS last_doc,
             CAST(sum(least(e, (chunk_id + 1) * 512) - greatest(b, chunk_id * 512))
               AS BIGINT) AS chunk_tokens
      FROM ex
      GROUP BY source, chunk_id
      ORDER BY source, chunk_id"""))

  /** Domain-mixture resampling — the data-mixing step of a corpus build
    * (the recipe shape of The Pile / DoReMi mixtures): each language keeps
    * min(round(share × budget), available) documents, chosen by md5 rank —
    * a deterministic, seedless, engine-portable "shuffle" both engines
    * order identically, so the EXACT same documents are selected
    * everywhere. Unlike q48's Bernoulli stratified sample (expected
    * fractions), a token-budgeted mixture needs exact per-domain counts.
    * One row_number window per language = one shuffle on the group key; at
    * 100 TB the same rank runs per (lang, shard) with the budget split
    * proportionally across shards, and the md5 order makes the kept set
    * independent of physical row order. Fully deterministic →
    * oracle-checked. */
  val t13 = GraftQuery(
    "t13_mixture_resample",
    "Exact-count mixture resampling to target language shares (md5-rank selection, capped)",
    (s, dir) => {
      // budget 400 docs; en down-weighted to 0.30, the rest 0.175 each —
      // at sf0.01 en (218 avail) truncates to 120 while fr (64 avail) caps
      // below its 70-doc allocation: both sides of min() are exercised
      val budget = 400
      val weights = Seq("en" -> 0.30, "zh" -> 0.175, "es" -> 0.175,
        "de" -> 0.175, "fr" -> 0.175)
      val wmap = map(weights.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
      val w = Window.partitionBy("lang").orderBy("h", "doc_id")
      table(s, dir, "documents")
        .select(col("lang"), col("doc_id"),
          md5(col("doc_id").cast("string")).as("h"))
        .withColumn("target",
          round(element_at(wmap, col("lang")) * budget, 0).cast(LongType))
        .withColumn("rk", row_number().over(w).cast(LongType))
        .filter(col("rk") <= col("target"))
        .select(col("lang"), col("doc_id"), col("rk"))
        .orderBy("lang", "doc_id")
    },
    Some("""
      WITH t AS (
        SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
               CASE lang WHEN 'en' THEN 120 WHEN 'zh' THEN 70 WHEN 'es' THEN 70
                         WHEN 'de' THEN 70 WHEN 'fr' THEN 70 END AS target,
               row_number() OVER (PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents)
      SELECT lang, doc_id, rk FROM t WHERE rk <= target
      ORDER BY lang, doc_id"""))

  /** CCNet-style boilerplate removal: text is split into 10-token "lines",
    * a line duplicated across ≥2 DISTINCT documents is boilerplate (nav
    * bars, cookie banners, license headers at web scale) and is dropped
    * from every document; the cleaned text is reassembled in line order.
    * Dataflow: posexploded lines → per-line distinct-doc count (one
    * map-side-combined shuffle keyed on the 16-byte line digest, never the
    * corpus text) → digest join back → ordered per-doc reassembly (one
    * shuffle on doc_id). The line-frequency table follows boilerplate
    * density, not corpus size, so at 100 TB the digest join's build side
    * stays proportionally small; both shuffles carry digests + bounded
    * line text. Deterministic → oracle-checked (reassembly included). */
  val t14 = GraftQuery(
    "t14_boilerplate_lines",
    "Corpus-frequency line dedup: drop 10-token lines shared by ≥2 docs, reassemble text",
    (s, dir) => {
      val L = 10
      val toks = table(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
      val lines = toks
        .select(col("doc_id"),
          posexplode(transform(
            sequence(lit(0L), floor((size(col("ws")) + (L - 1)) / lit(L)) - 1),
            i => concat_ws(" ", slice(col("ws"), (i * L + 1).cast("int"), lit(L))))))
        .withColumnRenamed("col", "line")
        .withColumn("h", md5(col("line")))
      // keep ONLY the boilerplate digests (dfreq ≥ 2) as the join side —
      // that set follows boilerplate density, not corpus size, so the join
      // back to lines is broadcast-sized at scale; a non-match means the
      // line is unique and kept
      val boiler = lines.groupBy("h")
        .agg(countDistinct(col("doc_id")).as("dfreq"))
        .filter(col("dfreq") >= 2)
        .select(col("h"), lit(true).as("is_boiler"))
      lines.join(boiler, Seq("h"), "left_outer")
        .withColumn("keep", col("is_boiler").isNull)
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_lines"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("kept_lines"),
          array_join(transform(
            array_sort(collect_list(when(col("keep"),
              struct(col("pos"), col("line"))))),
            s => s("line")), " ").as("text_clean"))
        .orderBy("doc_id")
    },
    Some("""
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      lines AS (SELECT doc_id, i AS pos,
                       array_to_string(ws[i*10+1 : i*10+10], ' ') AS line
                FROM toks, UNNEST(range(0, (len(ws)+9)//10)) t(i)),
      df AS (SELECT line, count(DISTINCT doc_id) AS dfreq
             FROM lines GROUP BY line)
      SELECT l.doc_id, count(*) AS n_lines,
             CAST(sum(CASE WHEN d.dfreq < 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS kept_lines,
             coalesce(string_agg(CASE WHEN d.dfreq < 2 THEN l.line END, ' '
               ORDER BY l.pos), '') AS text_clean
      FROM lines l JOIN df d USING (line)
      GROUP BY l.doc_id
      ORDER BY l.doc_id"""))

  /** Unigram-LM surprisal scoring — the perplexity-shaped quality filter
    * (CCNet trains KenLM; the unigram LM is the distribution-mechanics
    * stand-in): P(w) estimated from corpus counts, each doc scored by its
    * mean token surprisal -avg(ln P(w)). Low = common-word soup, high =
    * rare-token junk; corpus builds drop both tails. Dataflow: token
    * counts are one map-side-combined shuffle (Zipf-bounded vocabulary —
    * orders of magnitude smaller than the corpus, so the LM side of the
    * scoring join is broadcast-sized at any corpus scale; AQE picks the
    * strategy at runtime per the d2 lesson, no hint). Scores rounded to 4
    * decimals so float reduction order can't flip the hash. */
  val t15 = GraftQuery(
    "t15_unigram_surprisal",
    "Mean unigram surprisal per doc (-avg ln P(token), corpus-estimated LM)",
    (s, dir) => {
      val toks = table(s, dir, "documents")
        .select(col("doc_id"), explode(words(col("text"))).as("w"))
      // corpus total as a broadcast 1-row frame, NOT a global window — an
      // empty-partition Window funnels the whole vocab table through one
      // partition (fine at fixture scale, a straggler at a 100 TB vocab)
      val counts = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
      val lm = counts
        .crossJoin(broadcast(counts.agg(sum(col("cnt")).as("tot"))))
        .withColumn("logp", log(col("cnt").cast("double") / col("tot")))
      toks.join(lm.select(col("w"), col("logp")), "w")
        .groupBy("doc_id")
        .agg(round(-avg(col("logp")), 4).as("surprisal"),
          count(lit(1)).as("n_tokens"))
        .orderBy("doc_id")
    },
    Some("""
      WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
                    FROM documents),
      lm AS (SELECT w, count(*) AS cnt,
                    ln(count(*) / CAST(sum(count(*)) OVER () AS DOUBLE)) AS logp
             FROM toks GROUP BY w)
      SELECT doc_id, round(-avg(lm.logp), 4) AS surprisal,
             count(*) AS n_tokens
      FROM toks JOIN lm USING (w)
      GROUP BY doc_id
      ORDER BY doc_id"""))

  /** PII redaction. The fixture text contains no PII, so the query PLANTS
    * deterministic markers first — every doc_id % 7 == 0 gets an email and
    * a phone appended — then proves the redactor strips them; the planting
    * is part of the query contract (both engines derive the identical
    * input), the operator under test is the redaction itself. Patterns are
    * RE2-safe (no backrefs/lookbehind) so Java and DuckDB agree; redaction
    * and counting are row-local `regexp_replace`/`regexp_count` — pure
    * codegen, no shuffle beyond the presentation sort. At 100 TB this is
    * the cheapest class of operator in the engine: embarrassingly parallel
    * over whatever partitioning the scan already has. */
  val t16 = GraftQuery(
    "t16_pii_redact",
    "Regex PII redaction (emails, phones) with per-doc redaction counts",
    (s, dir) => {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\+1-[0-9]{3}-[0-9]{4}"
      val planted = table(s, dir, "documents")
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" contact user"), col("doc_id"),
              lit("@example.com or +1-555-"),
              lpad(col("doc_id").cast("string"), 4, "0")))
            .otherwise(col("text")).as("text"))
      planted
        .select(col("doc_id"),
          (regexp_count(col("text"), lit(email))
            + regexp_count(col("text"), lit(phone))).as("n_redacted"),
          regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"),
            phone, "<PHONE>").as("text_redacted"))
        .orderBy("doc_id")
    },
    Some("""
      WITH planted AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0
                    THEN text || ' contact user' || doc_id
                         || '@example.com or +1-555-'
                         || lpad(CAST(doc_id AS VARCHAR), 4, '0')
                    ELSE text END AS text
        FROM documents)
      SELECT doc_id,
             CAST(len(regexp_extract_all(text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                + len(regexp_extract_all(text, '\+1-[0-9]{3}-[0-9]{4}'))
               AS BIGINT) AS n_redacted,
             regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\+1-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS text_redacted
      FROM planted
      ORDER BY doc_id"""))

  /** Source-distribution drift: KL(source ‖ corpus) over unigram
    * distributions — the monitoring statistic a corpus build tracks per
    * ingest source (a crawler whose token distribution diverges from the
    * corpus is surfacing boilerplate, spam, or a language shift). Every
    * source token appears in the corpus distribution by construction, so
    * KL is finite and exactly defined — no smoothing term to disagree on.
    * Dataflow: two skinny map-side-combined count aggs off one token
    * explode + a vocab-sized join — the same Zipf-bounded shapes as t15;
    * nothing scales with corpus size except the explode itself. Rounded
    * to 4 decimals so float reduction order can't flip the hash. */
  val t17 = GraftQuery(
    "t17_source_drift",
    "Per-source unigram KL divergence vs the corpus distribution (drift monitor)",
    (s, dir) => {
      val toks = table(s, dir, "documents")
        .select(col("source"), explode(words(col("text"))).as("w"))
      val bySrc = toks.groupBy("source", "w").agg(count(lit(1)).as("c_sw"))
        .withColumn("tot_s", sum(col("c_sw")).over(Window.partitionBy("source")))
      // corpus total via broadcast 1-row frame (see t15 — a partition-less
      // Window would single-thread the vocab table)
      val corpusCounts = toks.groupBy("w").agg(count(lit(1)).as("c_w"))
      val corpus = corpusCounts
        .crossJoin(broadcast(corpusCounts.agg(sum(col("c_w")).as("tot"))))
      bySrc.join(corpus, "w")
        .groupBy("source")
        .agg(
          round(sum((col("c_sw") / col("tot_s"))
            * log((col("c_sw") / col("tot_s")) / (col("c_w") / col("tot")))), 4)
            .as("kl"),
          max(col("tot_s")).as("n_tokens"))
        .orderBy("source")
    },
    Some("""
      WITH toks AS (SELECT source, unnest(string_split(lower(text), ' ')) AS w
                    FROM documents),
      by_src AS (SELECT source, w, count(*) AS c_sw,
                        sum(count(*)) OVER (PARTITION BY source) AS tot_s
                 FROM toks GROUP BY source, w),
      corpus AS (SELECT w, count(*) AS c_w, sum(count(*)) OVER () AS tot
                 FROM toks GROUP BY w)
      SELECT source,
             round(sum((CAST(c_sw AS DOUBLE) / tot_s)
               * ln((CAST(c_sw AS DOUBLE) / tot_s)
                    / (CAST(c_w AS DOUBLE) / tot))), 4) AS kl,
             CAST(max(tot_s) AS BIGINT) AS n_tokens
      FROM by_src JOIN corpus USING (w)
      GROUP BY source
      ORDER BY source"""))

  /** End-to-end corpus selection — the capstone composition: exact dedup
    * (d1's canonical key), quality floor (t2's score), Gopher repetition
    * rules (t9), and surprisal band (t15) fused into one per-doc verdict
    * with FIRST-FAILING-STAGE attribution — the funnel accounting a corpus
    * build reports ("how many docs did each filter cost me?"). Stage order
    * is the production order: dedup first (cheapest key, biggest win),
    * distribution filters last. One query proves the operators COMPOSE:
    * all four metrics derive from the same scan and meet in a single
    * doc_id join fan-in; nothing here shuffles corpus text except the
    * bounded metric tables. Thresholds sit far from the fixture's value
    * mass so last-ulp float divergence can't flip a verdict; surprisal is
    * rounded to 4 decimals before comparison on both engines. */
  val t18 = GraftQuery(
    "t18_corpus_select",
    "Composed keep/drop pipeline: dup → quality → repetition → surprisal, first-failing-stage attribution",
    (s, dir) => {
      val docs = table(s, dir, "documents")
      // stage 1: exact-dup rank on d1's canonical key
      val dupRank = docs.select(col("doc_id"),
        row_number().over(Window.partitionBy(Dedup.canonKey(col("text")))
          .orderBy("doc_id")).as("rk"))
      // stage 2: t2's quality score
      val ws = docs.withColumn("ws", words(col("text")))
      val quality = ws.select(col("doc_id"),
        (least(lit(1.0), size(col("ws")).cast("double") / 50.0) * 0.5
          + (hits(col("ws"), "en").cast("double") / size(col("ws"))) * 0.5).as("q"))
      // stage 3: t9's repetition metrics
      val bigrams = ws.select(col("doc_id"),
          explode(expr("transform(sequence(1, size(ws) - 1), i -> concat(ws[i-1], ' ', ws[i]))")).as("bg"))
        .groupBy("doc_id", "bg").count()
        .groupBy("doc_id")
        .agg((lit(1.0) - count(lit(1)) / sum(col("count"))).as("dup_frac"))
      val topword = ws.select(col("doc_id"), explode(col("ws")).as("w"))
        .groupBy("doc_id", "w").count()
        .groupBy("doc_id")
        .agg((max(col("count")) / sum(col("count"))).as("top_frac"))
      // stage 4: t15's surprisal
      val toks = ws.select(col("doc_id"), explode(col("ws")).as("w"))
      val counts = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
      val lm = counts
        .crossJoin(broadcast(counts.agg(sum(col("cnt")).as("tot"))))
        .withColumn("logp", log(col("cnt").cast("double") / col("tot")))
      val surprisal = toks.join(lm.select(col("w"), col("logp")), "w")
        .groupBy("doc_id").agg(round(-avg(col("logp")), 4).as("surp"))
      dupRank.join(quality, "doc_id").join(bigrams, "doc_id")
        .join(topword, "doc_id").join(surprisal, "doc_id")
        .withColumn("stage",
          when(col("rk") > 1, "dup")
            .when(col("q") < 0.25, "quality")
            .when(!(col("dup_frac") <= 0.4 && col("top_frac") <= 0.2), "repetition")
            .when(!col("surp").between(3.40, 3.55), "surprisal")
            .otherwise("keep"))
        .select(col("doc_id"), col("stage"), (col("stage") === "keep").as("keep"))
        .orderBy("doc_id")
    },
    Some("""
      WITH ws AS (SELECT doc_id, text, string_split(lower(text), ' ') AS ws
                  FROM documents),
      dup AS (SELECT doc_id,
                     row_number() OVER (
                       PARTITION BY array_to_string(ws[1:5], ' ')
                       ORDER BY doc_id) AS rk
              FROM ws),
      quality AS (SELECT doc_id,
                         least(1.0, len(ws) / 50.0) * 0.5
                           + (len(list_filter(ws, w -> list_contains(
                               ['the','a','and','of','to','is','in'], w)))
                              * 1.0 / len(ws)) * 0.5 AS q
                  FROM ws),
      bg AS (SELECT doc_id,
                    ws[CAST(i AS INTEGER)] || ' ' || ws[CAST(i + 1 AS INTEGER)] AS bg
             FROM ws, UNNEST(range(1, len(ws))) AS t(i)),
      bgc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg),
      dupfrac AS (SELECT doc_id, 1.0 - count(*) / CAST(sum(c) AS DOUBLE) AS dup_frac
                  FROM bgc GROUP BY doc_id),
      wc AS (SELECT doc_id, w, count(*) AS c
             FROM (SELECT doc_id, unnest(ws) AS w FROM ws) GROUP BY doc_id, w),
      top AS (SELECT doc_id, max(c) / CAST(sum(c) AS DOUBLE) AS top_frac
              FROM wc GROUP BY doc_id),
      toks AS (SELECT doc_id, unnest(ws) AS w FROM ws),
      lm AS (SELECT w, ln(count(*) / CAST(sum(count(*)) OVER () AS DOUBLE)) AS logp
             FROM toks GROUP BY w),
      surp AS (SELECT doc_id, round(-avg(lm.logp), 4) AS surp
               FROM toks JOIN lm USING (w) GROUP BY doc_id),
      v AS (SELECT d.doc_id,
                   CASE WHEN d.rk > 1 THEN 'dup'
                        WHEN q.q < 0.25 THEN 'quality'
                        WHEN NOT (df.dup_frac <= 0.4 AND tp.top_frac <= 0.2)
                          THEN 'repetition'
                        WHEN NOT (sp.surp BETWEEN 3.40 AND 3.55) THEN 'surprisal'
                        ELSE 'keep' END AS stage
            FROM dup d
            JOIN quality q USING (doc_id)
            JOIN dupfrac df USING (doc_id)
            JOIN top tp USING (doc_id)
            JOIN surp sp USING (doc_id))
      SELECT doc_id, stage, stage = 'keep' AS keep
      FROM v
      ORDER BY doc_id"""))

  /** Overlapping fixed-size chunking — the RAG indexing shape (vs t8's
    * content-defined boundaries and t12's no-overlap packing): 128-token
    * windows every 96 tokens, so a fact straddling a cut appears intact in
    * the neighboring chunk — retrieval can't lose it to a boundary. Pure
    * row-local span arithmetic (`sequence` + `slice` inside codegen), no
    * shuffle except the presentation sort; chunk digests feed the same
    * dedup/embedding stages downstream (d1/s-family take chunk_id where
    * they took doc_id). Window 32 / stride 24 (25% overlap) so the fixture's
    * ~60-token docs genuinely split and straddle. Deterministic →
    * oracle-checked including the digest of every chunk's text. */
  val t19 = GraftQuery(
    "t19_rag_chunks",
    "Fixed-size overlapping chunks (32 tokens, stride 24) with per-chunk digests",
    (s, dir) => {
      val (w, stride) = (32, 24)
      table(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), size(col("ws")).as("n"),
          posexplode(transform(
            // chunk starts at i*stride while i*stride < n (last window may
            // be short; a doc shorter than one window yields one chunk)
            sequence(lit(0L), greatest(ceil((size(col("ws")) - w).cast("double") / stride)
              .cast("long"), lit(0L))),
            i => concat_ws(" ", slice(col("ws"), (i * stride + 1).cast("int"), lit(w))))))
        .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
          size(split(col("col"), " ")).cast("long").as("chunk_tokens"),
          md5(col("col")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_id")
    },
    Some("""
      WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      spans AS (SELECT doc_id, i AS chunk_id,
                       array_to_string(ws[CAST(i*24+1 AS INTEGER) :
                                          CAST(i*24+32 AS INTEGER)], ' ') AS chunk
                FROM ws, UNNEST(range(0,
                  greatest(CAST(ceil((len(ws) - 32.0) / 24) AS BIGINT), 0) + 1)) t(i))
      SELECT doc_id, chunk_id,
             len(string_split(chunk, ' ')) AS chunk_tokens,
             md5(chunk) AS chunk_md5
      FROM spans
      ORDER BY doc_id, chunk_id"""))

  /** Corpus trigram vocabulary via the NATIVE `NGrams` Generator (the
    * engine's table-function extension seam): Catalyst plans it as the
    * same `Generate` node as `explode`, but grams stream straight into the
    * generator output instead of materializing a per-row array first —
    * the HOF route allocates a corpus-sized intermediate at 100 TB for
    * nothing. Counting is non-distinct (every occurrence), map-side
    * combined on the gram key. Oracle recomputes the grams in portable
    * SQL → fully hash-checked, which also pins the generator's semantics
    * (positions, short-doc edge, space joining) cross-engine. */
  val t20 = GraftQuery(
    "t20_native_ngram_vocab",
    "Top-20 corpus trigrams via the native ngrams() Generator (no intermediate array)",
    (s, dir) => {
      import org.apache.spark.sql.GraftColumnBridge
      val g = GraftColumnBridge.column(graft.expressions.NGrams(
        GraftColumnBridge.expression(lower(col("text"))), 3))
      table(s, dir, "documents")
        .select(col("doc_id"), g.as(Seq("pos", "ngram")))
        .groupBy("ngram")
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(desc("n"), col("ngram"))
        .limit(20)
    },
    Some("""
      WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
                 FROM documents),
      g AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS ngram
            FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i))
      SELECT ngram, count(*) AS n, count(DISTINCT doc_id) AS n_docs
      FROM g
      GROUP BY ngram
      ORDER BY n DESC, ngram
      LIMIT 20"""))

  /** Interpolated bigram LM surprisal — t15's unigram score upgraded to
    * the shape real quality filtering uses (KenLM-style n-gram scoring à
    * la CCNet/Gopher: low perplexity ≈ fluent text, high ≈ garbage):
    * P(w|prev) from corpus bigram counts, linearly interpolated with the
    * unigram distribution (λ=0.7) so unseen-context tokens never hit
    * log(0), then mean −ln P per doc over bigram positions.
    *
    * Scale posture: bigrams are built ROW-LOCALLY from the token array
    * (a transform over adjacent pairs — no window shuffle, no self-join);
    * the LM tables are Zipf-bounded aggregates (bigram vocab ≪ corpus) and
    * the scoring join keys on (prev, cur) — text itself never re-shuffles,
    * t15's discipline. The conditioning count is Σ_cur C(prev, cur) (prev
    * as a bigram PREFIX), so probabilities sum to 1 per context by
    * construction. */
  val t21 = GraftQuery(
    "t21_bigram_surprisal",
    "Mean interpolated bigram surprisal per doc (0.7·P(w|prev) + 0.3·P(w), corpus LM)",
    (s, dir) => {
      val ws = table(s, dir, "documents")
        .select(col("doc_id"), words(col("text")).as("ws"))
      val bi = ws.filter(size(col("ws")) >= 2)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(1, size(ws) - 1),
             i -> struct(element_at(ws, i) AS prev, element_at(ws, i + 1) AS cur))"""))
          .as("b"))
        .select(col("doc_id"), col("b.prev").as("prev"), col("b.cur").as("cur"))
      val toks = ws.select(explode(col("ws")).as("w"))
      val uniP = toks.groupBy("w").agg(count(lit(1)).as("ucnt"))
        .crossJoin(broadcast(toks.agg(count(lit(1)).as("tot"))))
        .select(col("w").as("cur"),
          (col("ucnt").cast("double") / col("tot")).as("puni"))
      val biCnt = bi.groupBy("prev", "cur").agg(count(lit(1)).as("bcnt"))
      val prevCnt = biCnt.groupBy("prev").agg(sum("bcnt").as("pcnt"))
      val lm = biCnt.join(prevCnt, "prev")
        .select(col("prev"), col("cur"),
          (col("bcnt").cast("double") / col("pcnt")).as("pbi"))
      bi.join(lm, Seq("prev", "cur"))
        .join(uniP, Seq("cur"))
        .select(col("doc_id"),
          log(lit(0.7) * col("pbi") + lit(0.3) * col("puni")).as("lp"))
        .groupBy("doc_id")
        .agg(round(-avg(col("lp")), 4).as("bigram_surprisal"),
          count(lit(1)).as("n_bigrams"))
        .orderBy("doc_id")
    },
    Some("""
      WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
                 FROM documents),
      bi AS (SELECT doc_id, ws[CAST(i AS INTEGER)] AS prev,
                    ws[CAST(i + 1 AS INTEGER)] AS cur
             FROM w, UNNEST(range(1, len(ws))) AS t(i)
             WHERE len(ws) >= 2),
      toks AS (SELECT unnest(ws) AS w FROM w),
      uni AS (SELECT w AS cur,
                     count(*) / CAST(sum(count(*)) OVER () AS DOUBLE) AS puni
              FROM toks GROUP BY w),
      bc AS (SELECT prev, cur, count(*) AS bcnt FROM bi GROUP BY prev, cur),
      pc AS (SELECT prev, sum(bcnt) AS pcnt FROM bc GROUP BY prev),
      lm AS (SELECT prev, cur, bcnt / CAST(pcnt AS DOUBLE) AS pbi
             FROM bc JOIN pc USING (prev))
      SELECT doc_id,
             round(-avg(ln(0.7 * pbi + 0.3 * puni)), 4) AS bigram_surprisal,
             count(*) AS n_bigrams
      FROM bi JOIN lm USING (prev, cur) JOIN uni USING (cur)
      GROUP BY doc_id
      ORDER BY doc_id"""))

  /** Temperature-scaled source mixture design (the Gopher / LLaMA data-mix
    * step that FEEDS t13's resampler): sampling weight w_s ∝ n_s^α with
    * α = 0.5, which up-weights small sources relative to proportional
    * sampling without letting any source dominate (α=1 is proportional,
    * α=0 uniform). Output per source: corpus stats, the normalized mixture
    * share, and the upsample factor vs natural share — exactly the table a
    * training-data config encodes. One tiny groupBy + a broadcast 1-row
    * total; rounded doubles over a ~20-term sum (t15's float discipline). */
  val t22 = GraftQuery(
    "t22_mixture_weights",
    "Temperature mixture design (α=0.5): per-source share and upsample factor vs natural",
    (s, dir) => {
      val stats = table(s, dir, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("n_chars"))
        .withColumn("w", sqrt(col("n_docs").cast("double")))
      val tot = stats.agg(sum("n_docs").as("tot_docs"), sum("w").as("tot_w"))
      stats.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_chars"),
          round(col("w") / col("tot_w"), 6).as("share"),
          round((col("w") / col("tot_w"))
            / (col("n_docs").cast("double") / col("tot_docs")), 4).as("upsample"))
        .orderBy("source")
    },
    Some("""
      WITH s AS (SELECT source, count(*) AS n_docs,
                        CAST(sum(n_chars) AS BIGINT) AS n_chars,
                        sqrt(count(*)) AS w
                 FROM documents GROUP BY source),
      t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tot_docs, sum(w) AS tot_w
            FROM s)
      SELECT source, n_docs, n_chars,
             round(w / tot_w, 6) AS share,
             round((w / tot_w) / (n_docs / CAST(tot_docs AS DOUBLE)), 4) AS upsample
      FROM s, t
      ORDER BY source"""))

  /** Filter-rule ablation report: the diagnostic a corpus owner reads to
    * TUNE a rule battery before running it (t9/t18 apply filters; this
    * explains them). For each rule: how many docs it kills, how many it
    * kills EXCLUSIVELY (every other rule passes — the rule's marginal
    * contribution, the number that says whether dropping it changes the
    * corpus), and the chars lost; plus the union row. All four rules are
    * row-local projections — one scan, one conditional aggregate to a
    * single wide row, `stack` to unpivot; no explode, no join, no per-doc
    * output. Thresholds are integer cross-multiplications (sl·100 > 465·nw,
    * nd·10 < 4·nw) — never a float ratio compare (the q83 lesson). */
  val t23 = GraftQuery(
    "t23_rule_ablation",
    "Quality-rule ablation: per-rule kill/exclusive-kill/chars-lost + union — one pass, no explode",
    (s, dir) => {
      val d = table(s, dir, "documents")
        .withColumn("ws", words(col("text")))
        .withColumn("nw", size(col("ws")).cast(LongType))
        .withColumn("sl",
          aggregate(transform(col("ws"), w => length(w).cast("long")), lit(0L), (a, x) => a + x))
        .withColumn("nd", size(array_distinct(col("ws"))).cast(LongType))
        .withColumn("st", hits(col("ws"), "en"))
        .withColumn("f1", col("nw") < 20 || col("nw") > 90)
        .withColumn("f2", col("sl") * 100 > col("nw") * 465)
        .withColumn("f3", col("st") < 2)
        .withColumn("f4", col("nd") * 10 < col("nw") * 4)
      def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
      def chars(c: Column) = sum(when(c, col("n_chars")).otherwise(0L))
      val Seq(f1, f2, f3, f4) = Seq("f1", "f2", "f3", "f4").map(col)
      val excl = Seq(
        f1 && !f2 && !f3 && !f4, f2 && !f1 && !f3 && !f4,
        f3 && !f1 && !f2 && !f4, f4 && !f1 && !f2 && !f3)
      val any = f1 || f2 || f3 || f4
      val one = d.agg(
        cnt(f1).as("a1"), cnt(excl(0)).as("x1"), chars(f1).as("c1"),
        cnt(f2).as("a2"), cnt(excl(1)).as("x2"), chars(f2).as("c2"),
        cnt(f3).as("a3"), cnt(excl(2)).as("x3"), chars(f3).as("c3"),
        cnt(f4).as("a4"), cnt(excl(3)).as("x4"), chars(f4).as("c4"),
        cnt(any).as("aa"), cnt(excl.reduce(_ || _)).as("xa"), chars(any).as("ca"))
      one.selectExpr(
        """stack(5,
             'r1_word_count',    a1, x1, c1,
             'r2_mean_word_len', a2, x2, c2,
             'r3_stopwords',     a3, x3, c3,
             'r4_diversity',     a4, x4, c4,
             'any_rule',         aa, xa, ca)
           AS (rule, n_failed, n_exclusive, chars_lost)""")
        .orderBy("rule")
    },
    Some("""
      WITH f AS (
        SELECT doc_id, n_chars,
               len(string_split(lower(text), ' ')) AS nw,
               CAST(list_aggregate(list_transform(string_split(lower(text), ' '),
                 w -> length(w)), 'sum') AS BIGINT) AS sl,
               len(list_distinct(string_split(lower(text), ' '))) AS nd,
               len(list_filter(string_split(lower(text), ' '),
                 w -> list_contains(['the', 'a', 'and', 'of', 'to', 'is', 'in'], w))) AS st
        FROM documents),
      r AS (SELECT n_chars,
                   (nw < 20 OR nw > 90) AS f1,
                   (sl * 100 > nw * 465) AS f2,
                   (st < 2) AS f3,
                   (nd * 10 < nw * 4) AS f4
            FROM f),
      agg AS (SELECT
        CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS a1,
        CAST(sum(CASE WHEN f1 AND NOT f2 AND NOT f3 AND NOT f4 THEN 1 ELSE 0 END) AS BIGINT) AS x1,
        CAST(sum(CASE WHEN f1 THEN n_chars ELSE 0 END) AS BIGINT) AS c1,
        CAST(sum(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS a2,
        CAST(sum(CASE WHEN f2 AND NOT f1 AND NOT f3 AND NOT f4 THEN 1 ELSE 0 END) AS BIGINT) AS x2,
        CAST(sum(CASE WHEN f2 THEN n_chars ELSE 0 END) AS BIGINT) AS c2,
        CAST(sum(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS a3,
        CAST(sum(CASE WHEN f3 AND NOT f1 AND NOT f2 AND NOT f4 THEN 1 ELSE 0 END) AS BIGINT) AS x3,
        CAST(sum(CASE WHEN f3 THEN n_chars ELSE 0 END) AS BIGINT) AS c3,
        CAST(sum(CASE WHEN f4 THEN 1 ELSE 0 END) AS BIGINT) AS a4,
        CAST(sum(CASE WHEN f4 AND NOT f1 AND NOT f2 AND NOT f3 THEN 1 ELSE 0 END) AS BIGINT) AS x4,
        CAST(sum(CASE WHEN f4 THEN n_chars ELSE 0 END) AS BIGINT) AS c4,
        CAST(sum(CASE WHEN f1 OR f2 OR f3 OR f4 THEN 1 ELSE 0 END) AS BIGINT) AS aa,
        CAST(sum(CASE WHEN (f1 AND NOT f2 AND NOT f3 AND NOT f4)
                   OR (f2 AND NOT f1 AND NOT f3 AND NOT f4)
                   OR (f3 AND NOT f1 AND NOT f2 AND NOT f4)
                   OR (f4 AND NOT f1 AND NOT f2 AND NOT f3) THEN 1 ELSE 0 END) AS BIGINT) AS xa,
        CAST(sum(CASE WHEN f1 OR f2 OR f3 OR f4 THEN n_chars ELSE 0 END) AS BIGINT) AS ca
        FROM r)
      SELECT 'r1_word_count' AS rule, a1 AS n_failed, x1 AS n_exclusive, c1 AS chars_lost FROM agg
      UNION ALL SELECT 'r2_mean_word_len', a2, x2, c2 FROM agg
      UNION ALL SELECT 'r3_stopwords', a3, x3, c3 FROM agg
      UNION ALL SELECT 'r4_diversity', a4, x4, c4 FROM agg
      UNION ALL SELECT 'any_rule', aa, xa, ca FROM agg
      ORDER BY rule"""))

  /** Duplicate-n-gram fraction — the corpus-overlap quality metric of
    * Lee et al., "Deduplicating Training Data Makes Language Models
    * Better" (ACL 2022): per document, the share of its DISTINCT 5-grams
    * that also occur in at least one OTHER document. Complements t9
    * (intra-doc repetition) and t10 (overlap vs a fixed benchmark): this
    * is all-corpus-vs-all-corpus, the signal a dedup pass is graded on.
    *
    * Scale shape: the only thing that ever shuffles is (doc_id, 60-bit
    * md5 gram digest) — raw 5-gram text dies in the same stage that
    * explodes it. Per-digest doc counts are a hash agg with map-side
    * combine; the join back to per-doc grams is digest-keyed. Because
    * grams are distinct-per-doc first, count(*) per digest IS the
    * document frequency (no countDistinct shuffle of doc ids). Digest
    * collisions are engine-identical (same md5 prefix both sides), so
    * the oracle comparison is exact by construction. */
  val t24 = GraftQuery(
    "t24_dup_ngram_fraction",
    "Per-doc duplicate 5-gram fraction (share of distinct grams seen in another doc), basis points",
    (s, dir) => {
      // distinct-per-doc happens ROW-LOCALLY: a doc's grams all live in its
      // own array, so array_distinct over the digests replaces a corpus-wide
      // distinct() shuffle; dedup is on digests (not gram text) so it is
      // by-construction identical to the oracle's DISTINCT(doc_id, gh)
      val grams = table(s, dir, "documents")
        .select(col("doc_id"), words(col("text")).as("ws"))
        .select(col("doc_id"),
          explode(array_distinct(expr(
            """transform(sequence(1, greatest(size(ws) - 4, 0)),
               i -> CAST(conv(substring(md5(concat_ws(' ', slice(ws, i, 5))), 1, 15), 16, 10) AS BIGINT))""")))
            .as("gh"))
      // document frequency via a whole-partition window over gh: the
      // groupBy(gh)+join-back form planned two gh exchanges (agg + probe
      // side of the join) and re-evaluated the md5-explode scan under
      // both branches; the window attaches the identical per-row count
      // for one gh exchange and one gram pass
      grams
        .withColumn("n_docs",
          count(lit(1)).over(Window.partitionBy("gh")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("dup_grams"))
        .select(col("doc_id"), col("n_grams"), col("dup_grams"),
          floor(col("dup_grams") * 10000.0 / col("n_grams")).as("dup_frac_bp"))
        .orderBy("doc_id")
    },
    Some("""
      WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
      g0 AS (SELECT doc_id,
                    array_to_string(list_slice(ws, CAST(i AS INTEGER),
                      CAST(i + 4 AS INTEGER)), ' ') AS gram
             FROM ws, UNNEST(range(1, greatest(len(ws) - 4, 0) + 1)) AS t(i)),
      g AS (SELECT DISTINCT doc_id,
                   CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT) AS gh
            FROM g0),
      c AS (SELECT gh, count(*) AS n_docs FROM g GROUP BY gh)
      SELECT g.doc_id,
             count(*) AS n_grams,
             CAST(sum(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_grams,
             CAST(floor(sum(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END) * 10000.0
                        / count(*)) AS BIGINT) AS dup_frac_bp
      FROM g JOIN c USING (gh)
      GROUP BY g.doc_id
      ORDER BY g.doc_id"""))

  /** Classifier disagreement matrix — t1 (word-level stopword argmax) vs
    * t5 (char-bigram profile argmax) cross-tabulated, with each method's
    * label agreement inside every cell. This is the standard QA artifact
    * for running two cheap classifiers side by side: the diagonal is
    * consensus volume, off-diagonal cells are exactly the documents to
    * audit, and the per-cell label-match counts say WHICH method to trust
    * per confusion pair (route-to-the-better-model, ensemble-style).
    * One scan computes all ten scores row-locally; the only shuffle is the
    * ≤25-row cross-tab aggregate — at 100 TB this is a map-side-combined
    * hash agg over a fixed 25-key space. */
  val t25 = GraftQuery(
    "t25_langid_confusion",
    "Lang-ID disagreement matrix: stopword vs char-bigram argmax, per-cell label agreement",
    (s, dir) => {
      val langs = Seq("en", "de", "fr", "es", "zh")
      val d0 = table(s, dir, "documents")
        .withColumn("ws", words(col("text")))
        .withColumn("t", lower(col("text")))
      val d1 = langs.foldLeft(d0)((df, l) => df.withColumn(s"s_$l", hits(col("ws"), l)))
      val d2 = langs.foldLeft(d1)((df, l) => df.withColumn(s"g_$l", bigramHits(col("t"), l)))
      d2
        .withColumn("p_stop",
          when(col("s_en") >= greatest(col("s_de"), col("s_fr"), col("s_es"), col("s_zh")), "en")
            .when(col("s_de") >= greatest(col("s_fr"), col("s_es"), col("s_zh")), "de")
            .when(col("s_fr") >= greatest(col("s_es"), col("s_zh")), "fr")
            .when(col("s_es") >= col("s_zh"), "es")
            .otherwise("zh"))
        .withColumn("p_gram",
          when(col("g_en") >= greatest(col("g_de"), col("g_fr"), col("g_es"), col("g_zh")), "en")
            .when(col("g_de") >= greatest(col("g_fr"), col("g_es"), col("g_zh")), "de")
            .when(col("g_fr") >= greatest(col("g_es"), col("g_zh")), "fr")
            .when(col("g_es") >= col("g_zh"), "es")
            .otherwise("zh"))
        .groupBy("p_stop", "p_gram")
        .agg(count(lit(1)).as("n"),
          sum(when(col("lang") === col("p_stop"), 1L).otherwise(0L)).as("stop_correct"),
          sum(when(col("lang") === col("p_gram"), 1L).otherwise(0L)).as("gram_correct"))
        .orderBy("p_stop", "p_gram")
    },
    Some(s"""
      WITH scored AS (
        SELECT doc_id, lang,
               ${sqlHits("en")} AS s_en,
               ${sqlHits("de")} AS s_de,
               ${sqlHits("fr")} AS s_fr,
               ${sqlHits("es")} AS s_es,
               ${sqlHits("zh")} AS s_zh,
               ${sqlBigramHits("en")} AS g_en,
               ${sqlBigramHits("de")} AS g_de,
               ${sqlBigramHits("fr")} AS g_fr,
               ${sqlBigramHits("es")} AS g_es,
               ${sqlBigramHits("zh")} AS g_zh
        FROM (SELECT doc_id, lang, text, lower(text) AS t FROM documents)),
      pred AS (
        SELECT lang,
               CASE WHEN s_en >= greatest(s_de, s_fr, s_es, s_zh) THEN 'en'
                    WHEN s_de >= greatest(s_fr, s_es, s_zh) THEN 'de'
                    WHEN s_fr >= greatest(s_es, s_zh) THEN 'fr'
                    WHEN s_es >= s_zh THEN 'es'
                    ELSE 'zh' END AS p_stop,
               CASE WHEN g_en >= greatest(g_de, g_fr, g_es, g_zh) THEN 'en'
                    WHEN g_de >= greatest(g_fr, g_es, g_zh) THEN 'de'
                    WHEN g_fr >= greatest(g_es, g_zh) THEN 'fr'
                    WHEN g_es >= g_zh THEN 'es'
                    ELSE 'zh' END AS p_gram
        FROM scored)
      SELECT p_stop, p_gram, count(*) AS n,
             CAST(sum(CASE WHEN lang = p_stop THEN 1 ELSE 0 END) AS BIGINT) AS stop_correct,
             CAST(sum(CASE WHEN lang = p_gram THEN 1 ELSE 0 END) AS BIGINT) AS gram_correct
      FROM pred
      GROUP BY p_stop, p_gram
      ORDER BY p_stop, p_gram"""))

  /** Per-document keyword extraction — TF-IDF's ranking core with the
    * transcendental stripped out: score = tf · N / df is order-isomorphic
    * to tf · log-free idf within a document (log is monotone), and unlike
    * log() it is an exact rational of integers → bit-identical
    * cross-engine, so the top-3 CUT is hash-checkable (t11's BM25 needs
    * the log for cross-term calibration; a per-doc top-k does not).
    * Ubiquitous terms drop by integer document-frequency test
    * (df·10 ≤ N — the data-driven stopword cut, no curated list).
    *
    * Scale shape: tf is a (doc, term) hash agg with map-side combine; df
    * rides t24's row-local array_distinct (one row per distinct term per
    * doc, no corpus-wide distinct); the df table is Zipf-bounded (t9/t15
    * posture) and N is a 1-row broadcast. Text itself never shuffles —
    * only (doc_id, term, count) rows. */
  val t26 = GraftQuery(
    "t26_keywords",
    "Top-3 TF-IDF keywords per doc (rational score, df-based stopword cut)",
    (s, dir) => {
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), words(col("text")).as("ws"))
      val n = docs.agg(count(lit(1)).as("n"))
      val tf = docs.select(col("doc_id"), explode(col("ws")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = docs.select(col("doc_id"), explode(array_distinct(col("ws"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("df"))
      val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
        .filter(col("df") * 10 <= col("n"))
        .select(col("doc_id"), col("term"),
          (col("tf") * col("n") / col("df")).as("score"))
      val w = Window.partitionBy("doc_id").orderBy(desc("score"), col("term"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank").cast("long").as("rank"),
          col("term"), round(col("score"), 4).as("score"))
        .orderBy("doc_id", "rank")
    },
    Some("""
      WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
      n AS (SELECT count(*) AS n FROM d),
      tfa AS (SELECT doc_id, term, count(*) AS tf
              FROM (SELECT doc_id, unnest(ws) AS term FROM d)
              GROUP BY doc_id, term),
      dfa AS (SELECT term, count(*) AS df
              FROM (SELECT doc_id, unnest(list_distinct(ws)) AS term FROM d)
              GROUP BY term),
      scored AS (SELECT t.doc_id, t.term, t.tf * n.n / f.df AS score
                 FROM tfa t JOIN dfa f USING (term) CROSS JOIN n
                 WHERE f.df * 10 <= n.n),
      r AS (SELECT doc_id, term, score,
                   row_number() OVER (PARTITION BY doc_id
                     ORDER BY score DESC, term) AS rank
            FROM scored)
      SELECT doc_id, rank, term, round(score, 4) AS score
      FROM r WHERE rank <= 3
      ORDER BY doc_id, rank"""))

  /** Collocation mining — the phrase-discovery pass (Church & Hanks 1990
    * PMI, the NLP classic) that feeds tokenizer-vocab and stop-phrase
    * lists: word pairs that co-occur adjacently far more than their
    * unigram frequencies predict. Scored by INTEGER lift,
    * c_ab·N·10⁴ div (c_a·c_b) — a monotone transform of PMI (PMI =
    * ln(lift/10⁴)), so the ranking is PMI's ranking but every score is
    * exact 64-bit arithmetic both engines agree on, no ln() whose
    * last-ulp could flip a rank (the q100 argument applied to scores).
    * Min-support c_ab ≥ 5 kills the hapax-pair noise PMI is notorious
    * for. Shape at 100 TB: bigrams are t21's row-local adjacent
    * transform (no window, no shuffle to form pairs); the three count
    * tables are Zipf-bounded aggregates; scoring joins key on words.
    * Overflow bound: c_ab·N·10⁴ ≤ N²·10⁴ needs N ≤ ~10⁷ tokens per
    * corpus shard — at scale the lift is computed per-shard from
    * shard-local counts or the factors are pre-divided; here N fits. */
  val t27 = GraftQuery(
    "t27_pmi_collocations",
    "PMI collocations via integer lift (c_ab*N*10^4 div c_a*c_b), min-support 5, top-30",
    (s, dir) => {
      val ws = table(s, dir, "documents")
        .select(col("doc_id"), words(col("text")).as("ws"))
      val bi = ws.filter(size(col("ws")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(ws) - 1),
             i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))"""))
          .as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      val toks = ws.select(explode(col("ws")).as("w"))
      val uni = toks.groupBy("w").agg(count(lit(1)).as("c"))
      val n = toks.agg(count(lit(1)).as("n_tot"))
      bi.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 5)
        .join(uni.select(col("w").as("w1"), col("c").as("c_a")), "w1")
        .join(uni.select(col("w").as("w2"), col("c").as("c_b")), "w2")
        .crossJoin(broadcast(n))
        .withColumn("lift",
          expr("c_ab * n_tot * CAST(10000 AS BIGINT) div (c_a * c_b)"))
        .orderBy(col("lift").desc, col("w1"), col("w2"))
        .limit(30)
        .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
          col("lift"))
    },
    Some("""
      WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
                 FROM documents),
      bi AS (SELECT ws[CAST(i AS INTEGER)] AS w1,
                    ws[CAST(i + 1 AS INTEGER)] AS w2
             FROM w, UNNEST(range(1, len(ws))) AS t(i)
             WHERE len(ws) >= 2),
      toks AS (SELECT unnest(ws) AS w FROM w),
      uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY w),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM toks),
      bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_ab
             FROM bi GROUP BY w1, w2 HAVING count(*) >= 5)
      SELECT bc.w1, bc.w2, bc.c_ab, a.c AS c_a, b.c AS c_b,
             bc.c_ab * n.n_tot * CAST(10000 AS BIGINT) // (a.c * b.c) AS lift
      FROM bc
      JOIN uni a ON a.w = bc.w1
      JOIN uni b ON b.w = bc.w2
      CROSS JOIN n
      ORDER BY lift DESC, bc.w1, bc.w2
      LIMIT 30"""))

  /** Vocabulary growth curve (Heaps' law V ≈ K·nᵝ) — the corpus-scaling
    * diagnostic behind tokenizer-vocab sizing and dedup health checks: a
    * deduplicated corpus grows vocabulary along a smooth power law, while
    * a curve that flattens early signals duplication and one that jumps
    * signals contamination by a new domain. Computed WITHOUT a global
    * rank: each word's first-occurrence doc (a Zipf-bounded min-agg) and
    * each doc's token count are joined against the 10 decile cutoffs of
    * doc_id (one exact-percentile row, broadcast) — vocabulary at cutoff
    * c is just count(first_doc ≤ c). One explode pass over text; the
    * growth math runs on vocab-sized frames. */
  val t28 = GraftQuery(
    "t28_vocab_growth",
    "Heaps-law curve: docs/tokens/vocabulary at each doc_id decile, via first-occurrence mins",
    (s, dir) => {
      val toks = table(s, dir, "documents")
        .select(col("doc_id"), explode(words(col("text"))).as("w"))
      val firstDoc = toks.groupBy("w").agg(min(col("doc_id")).as("fd"))
      val docTok = toks.groupBy("doc_id").agg(count(lit(1)).as("nt"))
      val cuts = table(s, dir, "documents")
        .agg(expr(
          "percentile(doc_id, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D,1.0D))")
          .as("cs"))
        .select(posexplode(col("cs")).as(Seq("i", "c")))
        .select((col("i") + 1).cast("long").as("decile"),
          floor(col("c")).cast("long").as("cutoff"))
      val vocabAt = firstDoc.crossJoin(broadcast(cuts))
        .filter(col("fd") <= col("cutoff"))
        .groupBy("decile", "cutoff").agg(count(lit(1)).as("vocab"))
      val docsAt = docTok.crossJoin(broadcast(cuts))
        .filter(col("doc_id") <= col("cutoff"))
        .groupBy("decile", "cutoff")
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
      docsAt.join(vocabAt, Seq("decile", "cutoff"))
        .select("decile", "cutoff", "n_docs", "n_tokens", "vocab")
        .orderBy("decile")
    },
    Some("""
      WITH w AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
                 FROM documents),
      fd AS (SELECT w, min(doc_id) AS fd FROM w GROUP BY w),
      dt AS (SELECT doc_id, count(*) AS nt FROM w GROUP BY doc_id),
      cuts AS (SELECT CAST(i AS BIGINT) AS decile,
                      CAST(floor(q[CAST(i AS INTEGER)]) AS BIGINT) AS cutoff
               FROM (SELECT quantile_cont(doc_id,
                       [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0]) AS q
                     FROM documents),
                    UNNEST(range(1, 11)) AS t(i)),
      va AS (SELECT decile, cutoff, count(*) AS vocab
             FROM fd JOIN cuts ON fd.fd <= cuts.cutoff
             GROUP BY decile, cutoff),
      da AS (SELECT decile, cutoff, count(*) AS n_docs,
                    CAST(sum(nt) AS BIGINT) AS n_tokens
             FROM dt JOIN cuts ON dt.doc_id <= cuts.cutoff
             GROUP BY decile, cutoff)
      SELECT decile, cutoff, n_docs, n_tokens, vocab
      FROM da JOIN va USING (decile, cutoff)
      ORDER BY decile"""))

  /** Bloom-filter contamination pre-screen + its false-positive audit —
    * how t10's exact 5-gram scan actually deploys at 100 TB: the
    * benchmark gram set compiles into a Bloom filter (m = 2¹⁶ positions,
    * k = 3 hashes sliced from ONE md5 digest per gram — the
    * Kirsch–Mitzenmacher construction; deterministic, no RNG, both
    * engines compute identical positions), the corpus probes the broadcast
    * position set, and ONLY bloom-positive grams would proceed to the
    * exact verify — the filter does the 99% rejection without ever
    * shuffling text. This query emits the audit that sizes m: per
    * flagged doc, gram count, bloom hits, exact hits, and the
    * false-positive overshoot. No false negatives by construction (every
    * exact hit's positions are in the filter) — InvariantSpec pins
    * exact ≤ bloom per doc. Every output is an integer count. */
  val t29 = GraftQuery(
    "t29_bloom_prescreen",
    "Bloom-filter (m=65536, k=3) contamination pre-screen with per-doc false-positive audit",
    (s, dir) => {
      // ONE md5 per gram, then the gram STRING never leaves the scan:
      // gh (60-bit digest slice) keys every join/groupBy and the three
      // Bloom positions are further slices of the same digest
      // (Kirsch-Mitzenmacher — slices of one hash act as independent
      // hash functions). Persisted: four subtrees consume it (filter-set
      // build, corpus probe, both sides of the exact verify).
      val g = table(s, dir, "documents")
        .select(col("doc_id"), words(col("text")).as("ws"))
        .select(col("doc_id"),
          explode(array_distinct(expr(
            "transform(sequence(1, greatest(size(ws) - 4, 0)), i -> md5(concat_ws(' ', slice(ws, i, 5))))")))
            .as("h"))
        .select(col("doc_id"),
          expr("CAST(conv(substring(h, 1, 15), 16, 10) AS BIGINT)").as("gh"),
          expr("""transform(sequence(0, 2),
                  j -> CAST(conv(substring(h, j * 5 + 1, 5), 16, 10) AS BIGINT) % 65536)""").as("ps"))
        .persist()
      val bench = g.filter(col("doc_id") % 50 === 0)
      val corpus = g.filter(col("doc_id") % 50 =!= 0)
      val benchSet = bench.select("gh").distinct()
      val filterSet = bench.select(explode(col("ps")).as("pos")).distinct()
      val bloomHits = corpus
        .select(col("doc_id"), col("gh"), posexplode(col("ps")).as(Seq("j", "pos")))
        .join(broadcast(filterSet), "pos")
        .groupBy("doc_id", "gh")
        .agg(countDistinct(col("j")).as("nj"))
        .filter(col("nj") === 3)
        .select(col("doc_id"), col("gh"), lit(1L).as("bloom_hit"))
      val exactHits = corpus.join(broadcast(benchSet), "gh")
        .select(col("doc_id"), col("gh"), lit(1L).as("exact_hit"))
      corpus
        .join(bloomHits, Seq("doc_id", "gh"), "left")
        .join(exactHits, Seq("doc_id", "gh"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(coalesce(col("bloom_hit"), lit(0L))).as("n_bloom_hits"),
          sum(coalesce(col("exact_hit"), lit(0L))).as("n_exact_hits"),
          sum(coalesce(col("bloom_hit"), lit(0L)) -
            coalesce(col("exact_hit"), lit(0L))).as("n_false_positives"))
        .filter(col("n_bloom_hits") >= 1)
        .orderBy("doc_id")
    },
    Some("""
      WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
      g0 AS (SELECT doc_id,
                    array_to_string(list_slice(ws, CAST(i AS INTEGER),
                      CAST(i + 4 AS INTEGER)), ' ') AS gram
             FROM ws, UNNEST(range(1, greatest(len(ws) - 4, 0) + 1)) AS t(i)),
      g1 AS (SELECT DISTINCT doc_id, md5(gram) AS h FROM g0),
      g AS (SELECT doc_id,
                   CAST(concat('0x', substr(h, 1, 15)) AS BIGINT) AS gh,
                   h
            FROM g1),
      bench AS (SELECT gh, h FROM g WHERE doc_id % 50 = 0),
      benchset AS (SELECT DISTINCT gh FROM bench),
      corpus AS (SELECT doc_id, gh, h FROM g WHERE doc_id % 50 <> 0),
      fpos AS (SELECT DISTINCT
                 CAST(concat('0x', substr(h, CAST(j * 5 + 1 AS INTEGER), 5)) AS BIGINT)
                   % 65536 AS pos
               FROM bench, UNNEST(range(0, 3)) AS t(j)),
      cpos AS (SELECT doc_id, gh, j,
                 CAST(concat('0x', substr(h, CAST(j * 5 + 1 AS INTEGER), 5)) AS BIGINT)
                   % 65536 AS pos
               FROM corpus, UNNEST(range(0, 3)) AS t(j)),
      bh AS (SELECT doc_id, gh, 1 AS bloom_hit
             FROM cpos JOIN fpos USING (pos)
             GROUP BY doc_id, gh
             HAVING count(DISTINCT j) = 3),
      eh AS (SELECT c.doc_id, c.gh, 1 AS exact_hit
             FROM corpus c JOIN benchset b USING (gh))
      SELECT c.doc_id,
             count(*) AS n_grams,
             CAST(sum(coalesce(bh.bloom_hit, 0)) AS BIGINT) AS n_bloom_hits,
             CAST(sum(coalesce(eh.exact_hit, 0)) AS BIGINT) AS n_exact_hits,
             CAST(sum(coalesce(bh.bloom_hit, 0) - coalesce(eh.exact_hit, 0))
               AS BIGINT) AS n_false_positives
      FROM corpus c
      LEFT JOIN bh ON bh.doc_id = c.doc_id AND bh.gh = c.gh
      LEFT JOIN eh ON eh.doc_id = c.doc_id AND eh.gh = c.gh
      GROUP BY c.doc_id
      HAVING sum(coalesce(bh.bloom_hit, 0)) >= 1
      ORDER BY c.doc_id"""))

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS algorithm): per doc, hash every 4-word
    * shingle, slide a window of 5 hashes, keep each window's MINIMUM —
    * the provable-guarantee fingerprinting (any shared run of ≥ w+k−1
    * words yields a shared fingerprint) at a fraction of t24's
    * full-gram volume. The whole selection is ROW-LOCAL array algebra
    * (transform + slice + array_min — no explode until the final
    * distinct fingerprints), so a doc's text is read once and only
    * (doc_id, fingerprint) longs ever shuffle; overlap detection is a
    * fingerprint-keyed self-join — d17's bounded-candidates argument
    * with winnowing's density guarantee (≈ 2/(w+1)) bounding the join
    * input. Docs shorter than k+w−1 = 8 words cannot fill one window
    * and are excluded on BOTH engines (the Spark sequence(1,0)
    * descending gotcha makes an explicit length filter the only safe
    * encoding). */
  val t30 = GraftQuery(
    "t30_winnowing",
    "MOSS winnowing (k=4, w=5): row-local min-hash-per-window fingerprints + overlap pairs ≥ 3",
    (s, dir) => {
      val fps = table(s, dir, "documents")
        .select(col("doc_id"), words(col("text")).as("ws"))
        .filter(size(col("ws")) >= 8)
        .select(col("doc_id"), expr(
          """transform(sequence(1, size(ws) - 3),
             i -> CAST(conv(substring(md5(concat_ws(' ', slice(ws, i, 4))), 1, 15), 16, 10) AS BIGINT))""")
          .as("hs"))
        .select(col("doc_id"),
          explode(array_distinct(expr(
            "transform(sequence(1, size(hs) - 4), j -> array_min(slice(hs, j, 5)))")))
            .as("fp"))
        // persisted: both sides of the overlap self-join consume it — the
        // shingle-hash + winnowing pass runs once, not twice
        .persist()
      fps.select(col("doc_id").as("d1"), col("fp"))
        .join(fps.select(col("doc_id").as("d2"), col("fp")), "fp")
        .filter(col("d1") < col("d2"))
        .groupBy("d1", "d2")
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 3)
        .orderBy("d1", "d2")
    },
    Some("""
      WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
                  FROM documents),
      hs AS (SELECT doc_id,
                    list_transform(range(1, len(ws) - 2),
                      i -> CAST(concat('0x', substr(md5(array_to_string(
                             list_slice(ws, CAST(i AS INTEGER), CAST(i + 3 AS INTEGER)), ' ')),
                             1, 15)) AS BIGINT)) AS hs
             FROM ws WHERE len(ws) >= 8),
      fp AS (SELECT DISTINCT doc_id,
                    unnest(list_distinct(list_transform(range(1, len(hs) - 3),
                      j -> list_aggregate(list_slice(hs, CAST(j AS INTEGER),
                             CAST(j + 4 AS INTEGER)), 'min')))) AS fp
             FROM hs)
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_shared
      FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY d1, d2
      HAVING count(*) >= 3
      ORDER BY d1, d2"""))

  /** Guaranteed-recall heavy hitters via Misra-Gries summaries (Misra &
    * Gries '82; mergeability per Agarwal et al. PODS'12): each partition
    * keeps k=200 counters over its token stream (increment if present,
    * insert if room, else decrement ALL — the classic majority-vote
    * generalization), and any token with global frequency > N/k must
    * survive in at least one partition's summary (if it fell below the
    * local N_p/k bar everywhere, summing those bars bounds it under N/k —
    * pigeonhole). The union of surviving keys is therefore a
    * guaranteed-recall candidate set that is TINY (≤ k per partition)
    * regardless of vocabulary size — the full token vocabulary never
    * shuffles, which is the point at 100 TB where groupBy(token) on a
    * Zipf tail is the dominant exchange. A second pass counts ONLY the
    * candidates exactly (broadcast semi-join before the aggregation) and
    * keeps those strictly above N/k, so the final answer is exact and
    * independent of partitioning even though the intermediate sketch is
    * not (InvariantSpec executes that claim). */
  val t31 = GraftQuery(
    "t31_heavy_hitters",
    "Misra-Gries heavy hitters: tokens with freq > N/200, sketch candidates + exact verify",
    (s, dir) => {
      import s.implicits._
      val k = 200
      val toks = table(s, dir, "documents")
        .select(explode(words(col("text"))).as("token"))
        .filter(length(col("token")) > 0)
      val candidates = toks.as[String].mapPartitions { it =>
        val counts = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { t =>
          counts.get(t) match {
            case Some(c)                 => counts.update(t, c + 1)
            case None if counts.size < k => counts.update(t, 1L)
            case None =>
              val kept = counts.toList.collect { case (w, c) if c > 1 => (w, c - 1) }
              counts.clear()
              kept.foreach { case (w, c) => counts.update(w, c) }
          }
        }
        counts.keysIterator
      }.distinct().toDF("token")
      val total = toks.agg(count(lit(1)).as("n_total"))
      toks.join(broadcast(candidates), Seq("token"), "left_semi")
        .groupBy("token").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(total))
        .filter(col("n") * k > col("n_total"))
        .select(col("token"), col("n"), col("n_total"))
        .orderBy(desc("n"), col("token"))
    },
    Some("""
      WITH toks AS (
        SELECT t.token
        FROM documents, UNNEST(string_split(lower(text), ' ')) AS t(token)
        WHERE length(t.token) > 0),
      c AS (SELECT token, count(*) AS n FROM toks GROUP BY token),
      tot AS (SELECT count(*) AS n_total FROM toks)
      SELECT c.token, c.n, tot.n_total
      FROM c, tot
      WHERE c.n * 200 > tot.n_total
      ORDER BY c.n DESC, c.token"""))

  /** REAL Unicode NFC normalization (java.text.Normalizer — in the JVM,
    * no external lib; the oracle replays it with DuckDB's utf8proc-backed
    * `nfc_normalize`, two independent implementations of UAX #15): the
    * crawl-dedup step d19's ASCII folding cannot do — 'café' spelled
    * precomposed (U+00E9) and decomposed (e + U+0301) are byte-different,
    * length-different strings that byte-exact dedup treats as distinct
    * documents. Every doc is suffixed with BOTH spellings (synthesized
    * deterministically — Spark's chr() is ASCII-mod-256 so the combining
    * mark rides a Scala literal, the oracle builds the identical
    * codepoints with chr(769)/chr(233)), and the query proves per row
    * that NFC converges them: unit counts shrink by exactly the
    * combining mark, and the normalized decomposed form equals the
    * precomposed one. Row-local mapPartitions (the codec-seam pattern);
    * the normalizer call is the operator, everything else is
    * projection. */
  val t32 = GraftQuery(
    "t32_nfc_normalization",
    "Real NFC normalization: decomposed and precomposed spellings converge, per-row proof",
    (s, dir) => {
      import s.implicits._
      val out = table(s, dir, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions { it =>
          val dec = " cafe\u0301" // e + COMBINING ACUTE ACCENT (decomposed)
          val pre = " caf\u00e9"  // U+00E9 precomposed
          it.map { case (id, t) =>
            val d = t + dec
            val n = java.text.Normalizer.normalize(d, java.text.Normalizer.Form.NFC)
            (id, d.length.toLong, n.length.toLong, n == t + pre)
          }
        }
      out.toDF("doc_id", "units_decomposed", "units_nfc", "forms_converge")
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             CAST(length(text || ' cafe' || chr(769)) AS BIGINT) AS units_decomposed,
             CAST(length(nfc_normalize(text || ' cafe' || chr(769))) AS BIGINT) AS units_nfc,
             nfc_normalize(text || ' cafe' || chr(769)) = (text || ' caf' || chr(233))
               AS forms_converge
      FROM documents
      ORDER BY doc_id"""))

  /** Token-budget waterfilling — the allocator behind "spend B tokens
    * across sources as evenly as possible": small sources keep everything
    * (capped at their size), large sources are levelled to a common water
    * line τ, chosen as the largest integer with Σ min(size_i, τ) ≤ B
    * (t22 assigns PROPORTIONS by a temperature rule; t33 solves the
    * constrained max-min allocation). Exact integer construction: sort
    * sources ascending, prefix-sum, the classic feasibility test
    * s_i·(n−i+1) + prefix_{i−1} ≤ B finds the cap point i* (the largest i
    * whose source still fits un-levelled), τ = (B − prefix_{i*}) div
    * (n − i*). All arithmetic is integer so both engines agree bit-for-
    * bit; the un-distributed remainder (< number of levelled sources) is
    * reported, not smeared. The heavy scan (per-source token totals) is
    * one map-side aggregation; the waterfill itself runs on the
    * n-sources frame — bounded window, justified like q88's. */
  val t33 = GraftQuery(
    "t33_budget_waterfill",
    "Waterfilling token budget: cap small sources, level large ones to an exact integer τ",
    (s, dir) => {
      val sizes = table(s, dir, "documents")
        .select(col("source"), size(words(col("text"))).cast("long").as("toks"))
        .groupBy("source").agg(sum(col("toks")).as("sz"))
      val w = Window.orderBy("sz", "source")
      val frame = sizes
        .withColumn("i", row_number().over(w).cast("long"))
        .withColumn("prefix", sum(col("sz")).over(w))
        .crossJoin(broadcast(sizes.agg(
          count(lit(1)).as("n"), expr("sum(sz) * 2 div 5").as("budget"))))
      val cap = frame
        .filter(col("sz") * (col("n") - col("i") + 1) + (col("prefix") - col("sz")) <= col("budget"))
        .agg(max(col("i")).as("istar"), max(col("prefix")).as("prefix_star"))
      frame.crossJoin(broadcast(cap))
        .withColumn("istar", coalesce(col("istar"), lit(0L)))
        .withColumn("prefix_star", coalesce(col("prefix_star"), lit(0L)))
        .withColumn("tau",
          when(col("istar") < col("n"),
            expr("(budget - prefix_star) div (n - istar)")).otherwise(lit(null)))
        .withColumn("alloc",
          when(col("i") <= col("istar"), col("sz")).otherwise(least(col("sz"), col("tau"))))
        .withColumn("capped", col("i") <= col("istar"))
        .select("source", "sz", "alloc", "capped")
        .orderBy("source")
    },
    Some("""
      WITH sizes AS (
        SELECT source, CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS sz
        FROM documents GROUP BY source),
      tot AS (SELECT count(*) AS n, sum(sz) * 2 // 5 AS budget FROM sizes),
      f AS (SELECT source, sz,
                   row_number() OVER (ORDER BY sz, source) AS i,
                   sum(sz) OVER (ORDER BY sz, source
                                 ROWS UNBOUNDED PRECEDING) AS prefix
            FROM sizes),
      cap AS (SELECT COALESCE(max(f.i), 0) AS istar,
                     COALESCE(max(f.prefix), 0) AS prefix_star
              FROM f, tot
              WHERE f.sz * (tot.n - f.i + 1) + (f.prefix - f.sz) <= tot.budget)
      SELECT f.source, f.sz,
             CAST(CASE WHEN f.i <= cap.istar THEN f.sz
                  ELSE least(f.sz, (tot.budget - cap.prefix_star) // (tot.n - cap.istar))
             END AS BIGINT) AS alloc,
             f.i <= cap.istar AS capped
      FROM f, tot, cap
      ORDER BY f.source"""))

  /** Ingestion-order novelty — the contribution metric dedup-aware corpus
    * builds report (RefinedWeb-style "novel content added by this doc"):
    * attribute every distinct 5-gram to its FIRST owner in doc_id
    * (= ingestion) order; a doc's novelty is the share of its grams it
    * owns. t24 asks "is this gram duplicated anywhere" (symmetric); t34
    * asks "who said it first" (asymmetric) — the difference is exactly
    * what an incremental pipeline needs to decide whether a NEW doc adds
    * anything, and novelty_bp = 0 rows are the free prune list. Same
    * shuffle discipline as t24: gram dedup is row-local (array_distinct
    * on digests, never a corpus-wide distinct), the groupBy ships 16-byte
    * (gh, doc_id) pairs, and the min-reduce is the only wide state. */
  val t34 = GraftQuery(
    "t34_novelty_attribution",
    "Per-doc novelty: share of distinct 5-grams first seen in THIS doc (ingestion order), bp",
    (s, dir) => {
      val grams = table(s, dir, "documents")
        .select(col("doc_id"), words(col("text")).as("ws"))
        .select(col("doc_id"),
          explode(array_distinct(expr(
            """transform(sequence(1, greatest(size(ws) - 4, 0)),
               i -> CAST(conv(substring(md5(concat_ws(' ', slice(ws, i, 5))), 1, 15), 16, 10) AS BIGINT))""")))
            .as("gh"))
      // first owner via a whole-partition window over gh (the t24
      // rewrite): one gh exchange and one md5-explode pass instead of
      // groupBy(gh)+join-back's two of each
      grams
        .withColumn("first_doc",
          min(col("doc_id")).over(Window.partitionBy("gh")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("novel_grams"))
        .select(col("doc_id"), col("n_grams"), col("novel_grams"),
          floor(col("novel_grams") * 10000.0 / col("n_grams")).as("novelty_bp"))
        .orderBy("doc_id")
    },
    Some("""
      WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
      g0 AS (SELECT doc_id,
                    array_to_string(list_slice(ws, CAST(i AS INTEGER),
                      CAST(i + 4 AS INTEGER)), ' ') AS gram
             FROM ws, UNNEST(range(1, greatest(len(ws) - 4, 0) + 1)) AS t(i)),
      g AS (SELECT DISTINCT doc_id,
                   CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT) AS gh
            FROM g0),
      f AS (SELECT gh, min(doc_id) AS first_doc FROM g GROUP BY gh)
      SELECT g.doc_id,
             count(*) AS n_grams,
             CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT)
               AS novel_grams,
             CAST(floor(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) * 10000.0
                        / count(*)) AS BIGINT) AS novelty_bp
      FROM g JOIN f USING (gh)
      GROUP BY g.doc_id
      ORDER BY g.doc_id"""))

  /** Distinctive vocabulary per source — the "what makes this corpus
    * slice different" report (Monroe et al.'s log-odds framing, reduced
    * to its EXACT rational core): for token w in source s with token
    * counts a (w in s), b (w elsewhere), c (other tokens in s), d (other
    * tokens elsewhere), the add-1-smoothed odds ratio is
    * (a+1)(d+1) / ((b+1)(c+1)) — monotone in the log-odds score, so
    * ranking by it IS ranking by log-odds, and both numerator and
    * denominator fit in 64-bit integers (counts ≤ corpus tokens). The
    * score ships as integer parts-per-million via cross-multiplied
    * integer division — no float anywhere, hash-exact. Requiring a ≥ 3
    * keeps one-off typos out (the standard frequency floor). Shuffle
    * discipline: one (source, token) count shuffle bounded by Zipf
    * vocabulary, per-source totals ride a bounded re-agg, the global
    * totals broadcast as a 1-row frame. t7 ranks by raw frequency
    * (what a source says most); t35 by contrast (what it says that
    * others don't). */
  val t35 = GraftQuery(
    "t35_distinctive_terms",
    "Top-3 distinctive tokens per source by exact add-1 odds ratio (integer ppm score)",
    (s, dir) => {
      val tok = table(s, dir, "documents")
        .select(col("source"), explode(words(col("text"))).as("w"))
        .filter(length(col("w")) > 0)
      val st = tok.groupBy("source", "w").agg(count(lit(1)).as("a_src"))
      val wTot = st.groupBy("w").agg(sum(col("a_src")).as("w_tot"))
      val srcTot = st.groupBy("source").agg(sum(col("a_src")).as("src_tot"))
      val allTot = broadcast(st.agg(sum(col("a_src")).as("all_tot")))
      val scored = st
        .join(wTot, "w")
        .join(srcTot, "source")
        .crossJoin(allTot)
        .filter(col("a_src") >= 3)
        .select(col("source"), col("w"), col("a_src"),
          (col("w_tot") - col("a_src")).as("b"),
          (col("src_tot") - col("a_src")).as("c"),
          (col("all_tot") - col("w_tot") - col("src_tot") + col("a_src")).as("d"))
        .withColumn("score_ppm",
          expr("(a_src + 1) * (d + 1) * 1000000 div ((b + 1) * (c + 1))"))
      val w = Window.partitionBy("source").orderBy(desc("score_ppm"), col("w"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("source"), col("rank").cast("long").as("rank"),
          col("w").as("token"), col("a_src").as("n_in_source"), col("score_ppm"))
        .orderBy("source", "rank")
    },
    Some("""
      WITH tok AS (SELECT source, unnest(string_split(lower(text), ' ')) AS w
                   FROM documents),
      st AS (SELECT source, w, count(*) AS a_src FROM tok
             WHERE len(w) > 0 GROUP BY source, w),
      wt AS (SELECT w, sum(a_src) AS w_tot FROM st GROUP BY w),
      stot AS (SELECT source, sum(a_src) AS src_tot FROM st GROUP BY source),
      atot AS (SELECT sum(a_src) AS all_tot FROM st),
      sc AS (SELECT st.source, st.w, st.a_src,
                    wt.w_tot - st.a_src AS b,
                    stot.src_tot - st.a_src AS c,
                    atot.all_tot - wt.w_tot - stot.src_tot + st.a_src AS d
             FROM st JOIN wt USING (w) JOIN stot USING (source) CROSS JOIN atot
             WHERE st.a_src >= 3),
      r AS (SELECT source, w, a_src,
                   CAST((a_src + 1) * (d + 1) * 1000000 // ((b + 1) * (c + 1)) AS BIGINT)
                     AS score_ppm
            FROM sc),
      rk AS (SELECT source, w, a_src, score_ppm,
                    row_number() OVER (PARTITION BY source
                      ORDER BY score_ppm DESC, w) AS rank
             FROM r)
      SELECT source, rank, w AS token, a_src AS n_in_source, score_ppm
      FROM rk WHERE rank <= 3
      ORDER BY source, rank"""))

  /** Frequency spectrum — the power-law health check run on every corpus
    * before LM training (Zipf's law predicts a straight rank-frequency
    * line; a bent spectrum means boilerplate floods or dedup failures):
    * vocabulary bucketed by ⌊log₂(count)⌋, computed EXACTLY as
    * len(bin(count))−1 — no floating log anywhere — with per-bucket type
    * and token mass counts. Bucket 0 is the hapax band (the vocabulary's
    * long tail; its type share is the classic heap-health indicator).
    * One Zipf-bounded token-count shuffle + one 64-row-max rollup. */
  val t36 = GraftQuery(
    "t36_frequency_spectrum",
    "Vocabulary frequency spectrum: ⌊log₂ count⌋ buckets, exact integer bucketing, type/token mass",
    (s, dir) => {
      val counts = table(s, dir, "documents")
        .select(explode(words(col("text"))).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("c"))
      counts
        .withColumn("bucket", (length(expr("bin(c)")) - 1).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_types"), sum(col("c")).as("n_tokens"))
        .withColumn("count_lo", expr("shiftleft(1L, CAST(bucket AS INT))"))
        .select("bucket", "count_lo", "n_types", "n_tokens")
        .orderBy("bucket")
    },
    Some("""
      WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS w
                   FROM documents),
      c AS (SELECT w, count(*) AS c FROM tok WHERE len(w) > 0 GROUP BY w),
      b AS (SELECT CAST(length(bin(c)) - 1 AS BIGINT) AS bucket,
                   count(*) AS n_types, CAST(sum(c) AS BIGINT) AS n_tokens
            FROM c GROUP BY bucket)
      SELECT bucket, CAST(1 AS BIGINT) << CAST(bucket AS INTEGER) AS count_lo,
             n_types, n_tokens
      FROM b
      ORDER BY bucket"""))

  /** Greedy decoding from the corpus bigram LM — t21 SCORES text with the
    * LM; this GENERATES with it (the synthetic-data / LM-sanity face of
    * the same model): from each of the 5 most frequent seed tokens, walk
    * 8 steps of argmax successors. The LM collapses to a deterministic
    * successor function (per prev token: max bigram count, token
    * tie-break), so generation is 8 chained equi-joins against a
    * vocabulary-sized frame — generation as dataflow, no driver loop; a
    * dead-end token yields null and concat_ws simply stops the line.
    * Degenerate loops (argmax chains cycle fast — the classic greedy
    * failure mode) are VISIBLE in the output, which is exactly what the
    * sanity check is for. */
  val t37 = GraftQuery(
    "t37_greedy_generation",
    "Greedy 8-step generation from the corpus bigram LM, argmax successors, 5 seeds",
    (s, dir) => {
      val ws = table(s, dir, "documents")
        .select(col("doc_id"), words(col("text")).as("ws"))
      val bi = ws.filter(size(col("ws")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(ws) - 1),
             i -> struct(element_at(ws, i) AS prev, element_at(ws, i + 1) AS cur))"""))
          .as("b"))
        .select(col("b.prev").as("prev"), col("b.cur").as("cur"))
      val wSucc = Window.partitionBy("prev").orderBy(desc("bcnt"), col("cur"))
      val succ = bi.groupBy("prev", "cur").agg(count(lit(1)).as("bcnt"))
        .withColumn("r", row_number().over(wSucc))
        .filter(col("r") === 1)
        .select(col("prev"), col("cur"))
      val wSeed = Window.orderBy(desc("cnt"), col("w"))
      val seeds = ws.select(explode(col("ws")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .withColumn("r", row_number().over(wSeed))
        .filter(col("r") <= 5)
        .select(col("w").as("t0"), col("r").cast("long").as("seed_rank"))
      var gen = seeds
      for (i <- 1 to 8) {
        val si = succ.select(col("prev").as(s"p$i"), col("cur").as(s"t$i"))
        gen = gen.join(broadcast(si), col(s"t${i - 1}") === col(s"p$i"), "left")
          .drop(s"p$i")
      }
      gen.select(col("seed_rank"), col("t0").as("seed"),
          concat_ws(" ", (0 to 8).map(i => col(s"t$i")): _*).as("generated"))
        .orderBy("seed_rank")
    },
    Some("""
      WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
      bi AS (SELECT ws[i] AS prev, ws[i + 1] AS cur
             FROM ws, UNNEST(range(1, len(ws))) AS t(i)
             WHERE len(ws) >= 2),
      bc AS (SELECT prev, cur, count(*) AS bcnt FROM bi GROUP BY prev, cur),
      succ AS (SELECT prev, cur FROM (
                 SELECT prev, cur, row_number() OVER (PARTITION BY prev
                          ORDER BY bcnt DESC, cur) AS r
                 FROM bc)
               WHERE r = 1),
      tok AS (SELECT unnest(ws) AS w FROM ws),
      seeds AS (SELECT w AS t0, CAST(r AS BIGINT) AS seed_rank FROM (
                  SELECT w, row_number() OVER (ORDER BY count(*) DESC, w) AS r
                  FROM tok GROUP BY w)
                WHERE r <= 5),
      g1 AS (SELECT s.*, x.cur AS t1 FROM seeds s LEFT JOIN succ x ON x.prev = s.t0),
      g2 AS (SELECT g.*, x.cur AS t2 FROM g1 g LEFT JOIN succ x ON x.prev = g.t1),
      g3 AS (SELECT g.*, x.cur AS t3 FROM g2 g LEFT JOIN succ x ON x.prev = g.t2),
      g4 AS (SELECT g.*, x.cur AS t4 FROM g3 g LEFT JOIN succ x ON x.prev = g.t3),
      g5 AS (SELECT g.*, x.cur AS t5 FROM g4 g LEFT JOIN succ x ON x.prev = g.t4),
      g6 AS (SELECT g.*, x.cur AS t6 FROM g5 g LEFT JOIN succ x ON x.prev = g.t5),
      g7 AS (SELECT g.*, x.cur AS t7 FROM g6 g LEFT JOIN succ x ON x.prev = g.t6),
      g8 AS (SELECT g.*, x.cur AS t8 FROM g7 g LEFT JOIN succ x ON x.prev = g.t7)
      SELECT seed_rank, t0 AS seed,
             concat_ws(' ', t0, t1, t2, t3, t4, t5, t6, t7, t8) AS generated
      FROM g8
      ORDER BY seed_rank"""))

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) frequency estimation,
    * fully deterministic (md5-derived bucket hashes) so the oracle replays
    * the sketch bit-for-bit — unlike the opaque RNG inside Spark's own
    * `count_min_sketch` aggregate. d=4 rows × w=256 counters; every counter
    * is sum(count) of the tokens landing there, so CMS[i][h_i(t)] ≥
    * exact(t) ALWAYS (one-sided error — pinned in InvariantSpec) and
    * estimate = min_i CMS[i][h_i(t)]. Scale posture: the sketch is built
    * from the TOKEN-COUNT table, not the token stream — explode feeds one
    * map-side-combined groupBy (the t7 shape), and only the vocabulary
    * (Zipf-bounded) is hashed 4×; the sketch itself is ≤ 1024 rows
    * regardless of corpus size, which is the whole point of CMS at 100 TB:
    * a frequency oracle that ships in a broadcast. Probes: the exact
    * top-30 tokens, reporting estimate vs truth and the collision
    * overcount. */
  val t38 = GraftQuery(
    "t38_count_min_sketch",
    "Deterministic 4×256 Count-Min sketch: estimate vs exact for the top-30 tokens",
    (s, dir) => {
      // Persisted: the corpus explode+count feeds three consumers (sketch
      // build, top-30 probe list, probe hash lookup) — one evaluation, not
      // three. Vocab-sized (Zipf-bounded), so the pin is tiny at any scale.
      val counts = table(s, dir, "documents")
        .select(explode(words(col("text"))).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
        .persist()
      val hashed = counts
        .select(col("token"), col("n"), explode(sequence(lit(0), lit(3))).as("row"))
        .withColumn("bucket",
          expr("CAST(conv(substring(md5(concat(token, '#', CAST(row AS STRING))), 1, 8), 16, 10) AS BIGINT) % 256"))
      val cms = hashed.groupBy("row", "bucket").agg(sum(col("n")).as("counter"))
      val top = counts
        .orderBy(col("n").desc, col("token"))
        .limit(30)
      broadcast(top)
        .join(hashed.select(col("token"), col("row"), col("bucket")), "token")
        .join(broadcast(cms), Seq("row", "bucket"))
        .groupBy("token", "n")
        .agg(min(col("counter")).as("cms_est"))
        .select(col("token"), col("n").as("exact_n"), col("cms_est"),
          (col("cms_est") - col("n")).as("overcount"))
        .orderBy(col("exact_n").desc, col("token"))
    },
    Some("""
      WITH toks AS (
        SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents),
      counts AS (
        SELECT token, count(*) AS n FROM toks WHERE len(token) > 0 GROUP BY token),
      hashed AS (
        SELECT token, n, r.row,
               CAST(concat('0x', substr(md5(concat(token, '#', CAST(r.row AS VARCHAR))), 1, 8)) AS BIGINT) % 256
                 AS bucket
        FROM counts, (SELECT unnest(range(4)) AS row) r),
      cms AS (
        SELECT row, bucket, CAST(sum(n) AS BIGINT) AS counter FROM hashed GROUP BY row, bucket),
      top AS (
        SELECT token, n FROM counts ORDER BY n DESC, token LIMIT 30)
      SELECT t.token, t.n AS exact_n, min(c.counter) AS cms_est,
             min(c.counter) - t.n AS overcount
      FROM top t
      JOIN hashed h ON h.token = t.token
      JOIN cms c ON c.row = h.row AND c.bucket = h.bucket
      GROUP BY t.token, t.n
      ORDER BY exact_n DESC, t.token"""))

  /** Corpus-driven stopword discovery — the list every IR/quality pipeline
    * needs but shouldn't hardcode (language- and domain-specific): a token
    * is a stopword candidate when it is BOTH ubiquitous (document
    * frequency ≥ 30% of the corpus) and dispersed (present in every
    * source — Gries' dispersion criterion collapsed to its exact
    * all-sources form), which separates true function words from topical
    * terms that merely spike in one community. DF counts distinct docs
    * (array_distinct before the explode — per-doc token multiplicity
    * never inflates df), ratios are integer basis points. Scale: the
    * shuffle carries (token, doc) once per distinct pair, the report is
    * top-40. */
  val t39 = GraftQuery(
    "t39_stopword_discovery",
    "Stopword candidates: document-frequency ≥30% AND present in all 20 sources, top-40",
    (s, dir) => {
      val docs = table(s, dir, "documents")
      val nDocs = broadcast(docs.agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources")))
      docs
        .select(col("doc_id"), col("source"),
          explode(array_distinct(words(col("text")))).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy("token")
        .agg(count(lit(1)).as("df"),
          countDistinct(col("source")).as("n_src"))
        .crossJoin(nDocs)
        .withColumn("df_bp", expr("df * 10000 div n_docs"))
        .filter(col("df_bp") >= 3000 && col("n_src") === col("n_sources"))
        .select(col("token"), col("df"), col("df_bp"), col("n_src"))
        .orderBy(desc("df"), col("token"))
        .limit(40)
    },
    Some("""
      WITH tot AS (
        SELECT count(*) AS n_docs, count(DISTINCT source) AS n_sources
        FROM documents),
      tok AS (
        SELECT DISTINCT doc_id, source, unnest(string_split(lower(text), ' ')) AS token
        FROM documents),
      df AS (
        SELECT token, count(*) AS df, count(DISTINCT source) AS n_src
        FROM tok WHERE len(token) > 0 GROUP BY token)
      SELECT token, df, df * 10000 // t.n_docs AS df_bp, n_src
      FROM df, tot t
      WHERE df * 10000 // t.n_docs >= 3000 AND n_src = t.n_sources
      ORDER BY df DESC, token
      LIMIT 40"""))

  /** Good-Turing unseen-probability mass — the open-vocabulary question
    * every LM data pipeline answers before choosing vocab size or smoothing
    * ("how much probability belongs to words we have NEVER seen?"): the
    * Good-Turing estimate P₀ = N₁/N (mass of singletons), plus the smoothed
    * count r* = 2·N₂/N₁ for once-seen types — both exact integer basis
    * points here, no transcendentals. Per lang AND the true corpus ALL row:
    * corpus counts are Σ over langs of the per-(lang, word) counts — a
    * re-aggregation of the intermediate count table by word (a word once in
    * en and once in de is a corpus DOUBLETON, so merging per-lang
    * counts-of-counts would be WRONG; the count table, not the
    * counts-of-counts, is the mergeable state). Text shuffles once into
    * (lang, word) counts; everything after is vocabulary-sized. */
  val t40 = GraftQuery(
    "t40_good_turing",
    "Good-Turing unseen mass per lang + corpus ALL: P0=N1/N and r*=2N2/N1 in exact basis points",
    (s, dir) => {
      val langCounts = table(s, dir, "documents")
        .select(col("lang"), explode(words(col("text"))).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("lang", "w").agg(count(lit(1)).as("c"))
      val allCounts = langCounts.groupBy("w")
        .agg(sum("c").as("c")).select(lit("ALL").as("lang"), col("c"))
      val spectrum = langCounts.select("lang", "c").unionByName(allCounts)
        .groupBy("lang", "c").agg(count(lit(1)).as("nr"))
      spectrum.groupBy("lang")
        .agg(sum(expr("c * nr")).as("n_tokens"),
          sum("nr").as("n_types"),
          sum(when(col("c") === 1, col("nr")).otherwise(lit(0L))).as("n1"),
          sum(when(col("c") === 2, col("nr")).otherwise(lit(0L))).as("n2"))
        .withColumn("p0_bp", expr("n1 * 10000 div n_tokens"))
        .withColumn("r1_star_x100",
          expr("CASE WHEN n1 > 0 THEN 2 * n2 * 100 div n1 END"))
        .orderBy("lang")
    },
    Some("""
      WITH lc AS (
        SELECT lang, w, count(*) AS c
        FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS w
              FROM documents)
        WHERE len(w) > 0
        GROUP BY lang, w),
      ac AS (SELECT 'ALL' AS lang, CAST(sum(c) AS BIGINT) AS c
             FROM lc GROUP BY w),
      spectrum AS (
        SELECT lang, c, count(*) AS nr
        FROM (SELECT lang, c FROM lc UNION ALL SELECT lang, c FROM ac)
        GROUP BY lang, c),
      agg AS (
        SELECT lang,
               CAST(sum(c * nr) AS BIGINT) AS n_tokens,
               CAST(sum(nr) AS BIGINT) AS n_types,
               CAST(sum(CASE WHEN c = 1 THEN nr ELSE 0 END) AS BIGINT) AS n1,
               CAST(sum(CASE WHEN c = 2 THEN nr ELSE 0 END) AS BIGINT) AS n2
        FROM spectrum GROUP BY lang)
      SELECT lang, n_tokens, n_types, n1, n2,
             n1 * 10000 // n_tokens AS p0_bp,
             CASE WHEN n1 > 0 THEN 2 * n2 * 100 // n1 END AS r1_star_x100
      FROM agg
      ORDER BY lang"""))

  /** k-ANONYMITY audit — the re-identification risk report privacy review
    * runs before a corpus ships (Sweeney's model): rows sharing a
    * quasi-identifier tuple (lang, source, length bucket) form an
    * equivalence class; classes smaller than k = 5 are re-identifiable
    * and must be suppressed or generalized. Per lang: class count, risky
    * classes, rows at risk, and the suppression cost in basis points —
    * what generalizing the length bucket would have to beat. The ALL row
    * re-aggregates the per-class frame (classes don't cross langs — lang
    * is IN the quasi-identifier — so per-lang partials merge exactly).
    * One corpus shuffle to class grain; everything after is class-sized.
    * With t16 (PII redaction) and q85 (delete cascade) this completes the
    * privacy-governance battery. */
  val t41 = GraftQuery(
    "t41_k_anonymity",
    "k-anonymity (k=5) audit over (lang, source, length-bucket) classes: rows at risk, bp cost",
    (s, dir) => {
      val classes = table(s, dir, "documents")
        .groupBy(col("lang"), col("source"),
          expr("n_chars div 100L").as("len_bucket"))
        .agg(count(lit(1)).as("cnt"))
      val perLang = classes.groupBy("lang")
        .agg(count(lit(1)).as("n_classes"),
          sum(when(col("cnt") < 5, 1L).otherwise(0L)).as("n_risky"),
          sum(when(col("cnt") < 5, col("cnt")).otherwise(lit(0L)))
            .as("rows_at_risk"),
          sum("cnt").as("n_rows"))
      val allRow = perLang.agg(sum("n_classes").as("n_classes"),
          sum("n_risky").as("n_risky"),
          sum("rows_at_risk").as("rows_at_risk"),
          sum("n_rows").as("n_rows"))
        .select(lit("ALL").as("lang"), col("n_classes"), col("n_risky"),
          col("rows_at_risk"), col("n_rows"))
      perLang.unionByName(allRow)
        .withColumn("suppression_bp",
          expr("rows_at_risk * 10000 div n_rows"))
        .orderBy("lang")
    },
    Some("""
      WITH classes AS (
        SELECT lang, source, n_chars // 100 AS len_bucket, count(*) AS cnt
        FROM documents GROUP BY 1, 2, 3),
      per_lang AS (
        SELECT lang, count(*) AS n_classes,
               CAST(sum(CASE WHEN cnt < 5 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_risky,
               CAST(sum(CASE WHEN cnt < 5 THEN cnt ELSE 0 END) AS BIGINT)
                 AS rows_at_risk,
               CAST(sum(cnt) AS BIGINT) AS n_rows
        FROM classes GROUP BY lang),
      with_all AS (
        SELECT * FROM per_lang
        UNION ALL
        SELECT 'ALL', CAST(sum(n_classes) AS BIGINT),
               CAST(sum(n_risky) AS BIGINT),
               CAST(sum(rows_at_risk) AS BIGINT),
               CAST(sum(n_rows) AS BIGINT)
        FROM per_lang)
      SELECT lang, n_classes, n_risky, rows_at_risk, n_rows,
             rows_at_risk * 10000 // n_rows AS suppression_bp
      FROM with_all
      ORDER BY lang"""))

  /** Heavy hitters through a NATIVE mergeable aggregate — t31's algorithm
    * moved into the engine's own aggregation protocol: `misra_gries_agg`
    * is a TypedImperativeAggregate (expressions/SketchAggregates.scala),
    * so the sketch rides Spark's real partial-aggregation path — map-side
    * update, buffer SERIALIZATION into the exchange, reduce-side MERGE
    * (the Agarwal et al. mergeable-summary form), eval — exactly how
    * DataSketches ships in production engines, and the shape that lets
    * the same sketch maintain per-GROUP summaries, which a mapPartitions
    * pass cannot. The summary's guarantee survives both update and merge:
    * every token with frequency > N/k is in the candidate set (recall
    * 1.0); counts are partitioning-dependent, so the candidates
    * broadcast-gate ONE exact counting pass and the strictly-above-bar
    * filter makes the output exact and plan-independent — the DuckDB
    * oracle computes the same answer with no sketch at all. */
  val t42 = GraftQuery(
    "t42_native_sketch_agg",
    "misra_gries_agg TypedImperativeAggregate: map-side sketch partials, merged candidates, exact verify",
    (s, dir) => {
      import org.apache.spark.sql.GraftColumnBridge
      val tokens = table(s, dir, "documents")
        .select(explode(words(col("text"))).as("w"))
        .filter(length(col("w")) > 0)
      val k = 200
      val cands = tokens.agg(GraftColumnBridge.column(
          graft.expressions.MisraGriesAgg(
            GraftColumnBridge.expression(col("w")), k)
            .toAggregateExpression()).as("cand"))
        .select(explode(col("cand")).as("w"))
      val n1 = tokens.agg(count(lit(1)).as("n"))
      tokens.join(broadcast(cands), Seq("w"), "left_semi")
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(n1))
        .filter(col("cnt") * k > col("n"))
        .select(col("w"), col("cnt"))
        .orderBy(desc("cnt"), col("w"))
    },
    Some("""
      WITH tok AS (
        SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents),
      t AS (SELECT w FROM tok WHERE len(w) > 0),
      n1 AS (SELECT count(*) AS n FROM t)
      SELECT w, count(*) AS cnt
      FROM t, n1
      GROUP BY w, n1.n
      HAVING count(*) * 200 > n1.n
      ORDER BY cnt DESC, w"""))

  /** Inverted-index CONSTRUCTION with delta-encoded postings — the
    * artifact build behind t11's BM25 scoring (scoring assumed an index;
    * this op emits one): per frequent term (df ≥ 5% of docs — the head
    * that dominates posting volume), the posting list in doc_id order
    * with each entry carrying its GAP from the predecessor — the delta
    * form is what makes varint/PForDelta compression work, and gaps are
    * computable as one lag window per term (no per-term sequential
    * state). tf rides along for the scorer. The df gate is a broadcast
    * semi-join before the posting shuffle — the Zipf tail (most of the
    * vocabulary, negligible posting mass each) never moves. Flat rows so
    * the driver hash-checks every posting; a real index writer would
    * fold each term's run into a block, a pure format change. */
  val t43 = GraftQuery(
    "t43_posting_lists",
    "Delta-encoded posting lists for frequent terms: per-term lag gaps + tf, df-gated",
    (s, dir) => {
      val postings = table(s, dir, "documents")
        .select(col("doc_id"), explode(words(col("text"))).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w", "doc_id").agg(count(lit(1)).as("tf"))
      val nDocs = table(s, dir, "documents").agg(count(lit(1)).as("nd"))
      val frequent = postings.groupBy("w").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nDocs))
        .filter(col("df") * 20 >= col("nd"))
        .select("w", "df")
      val wLag = Window.partitionBy("w").orderBy("doc_id")
      postings
        .join(broadcast(frequent), Seq("w"))
        .withColumn("delta_doc",
          col("doc_id") - coalesce(lag("doc_id", 1).over(wLag), lit(0L)))
        .select("w", "df", "doc_id", "delta_doc", "tf")
        .orderBy("w", "doc_id")
    },
    Some("""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM documents),
      p AS (SELECT w, doc_id, count(*) AS tf
            FROM tok WHERE len(w) > 0 GROUP BY w, doc_id),
      nd AS (SELECT count(*) AS nd FROM documents),
      f AS (SELECT w, count(*) AS df FROM p GROUP BY w),
      ff AS (SELECT f.w, f.df FROM f, nd WHERE f.df * 20 >= nd.nd)
      SELECT p.w, CAST(ff.df AS BIGINT) AS df, p.doc_id,
             p.doc_id - coalesce(lag(p.doc_id) OVER (PARTITION BY p.w
                                                     ORDER BY p.doc_id), 0)
               AS delta_doc,
             CAST(p.tf AS BIGINT) AS tf
      FROM p JOIN ff ON p.w = ff.w
      ORDER BY p.w, p.doc_id"""))

  /** Lexical BLOCKLIST screening — the safety-filter tier t16's
    * pattern-based PII redaction doesn't cover: a curated term list (with
    * severities) swept over the corpus at TOKEN granularity (word-boundary
    * matches only — substring screens flag "classic" for "ass", the
    * classic false-positive this op exists to avoid). The blocklist
    * broadcasts; per (doc, term) the hit count and first token position
    * are row-local HOF lambdas over the token array (the term is a
    * captured outer column — no explode of the corpus, no token shuffle);
    * the report rolls up per (lang, term) with severity-weighted exposure.
    * At 100 TB the cost is one corpus scan × |blocklist| row-local
    * passes — the shape content-safety sweeps actually run. */
  val t44 = GraftQuery(
    "t44_blocklist_screen",
    "Token-boundary blocklist sweep: per (lang, term) docs hit, counts, first position, weighted exposure",
    (s, dir) => {
      import s.implicits._
      val blocklist = Seq(("dup", 3L), ("hash", 2L), ("stream", 1L))
        .toDF("term", "severity")
      table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), words(col("text")).as("ws"))
        .crossJoin(broadcast(blocklist))
        .withColumn("hits",
          expr("size(filter(ws, x -> x = term))").cast("long"))
        .filter(col("hits") > 0)
        .withColumn("first_pos",
          expr("array_position(ws, term)").cast("long"))
        .groupBy("lang", "term")
        .agg(count(lit(1)).as("n_docs"),
          sum("hits").as("total_hits"),
          min("first_pos").as("min_first_pos"),
          (sum("hits") * first(col("severity"))).as("weighted_exposure"))
        .orderBy("lang", "term")
    },
    Some("""
      WITH bl(term, severity) AS (VALUES ('dup', 3), ('hash', 2), ('stream', 1)),
      scanned AS (
        SELECT d.doc_id, d.lang, bl.term, bl.severity,
               len(list_filter(string_split(lower(d.text), ' '),
                               x -> x = bl.term)) AS hits,
               list_position(string_split(lower(d.text), ' '), bl.term)
                 AS first_pos
        FROM documents d CROSS JOIN bl)
      SELECT lang, term, count(*) AS n_docs,
             CAST(sum(hits) AS BIGINT) AS total_hits,
             CAST(min(first_pos) AS BIGINT) AS min_first_pos,
             CAST(sum(hits) * any_value(severity) AS BIGINT)
               AS weighted_exposure
      FROM scanned
      WHERE hits > 0
      GROUP BY lang, term
      ORDER BY lang, term"""))

  /** MEMORIZATION audit of generated text — the eval run on every LM's
    * samples before anyone calls them "novel" (Carlini et al.'s verbatim-
    * extraction question at trigram granularity): regenerate t37's greedy
    * sequences, slice each into word trigrams, and test every trigram for
    * VERBATIM presence in the training corpus — by construction each
    * generated BIGRAM exists (the LM walks corpus bigrams), so any
    * novelty lives strictly at trigram-and-up compositions, which is
    * exactly what makes the trigram report informative. Scale posture
    * inverted from t34's corpus-vs-corpus diff: the generated side is
    * tiny, so IT broadcasts and the corpus trigram stream (via the native
    * NGrams generator) is semi-joined against it — the corpus never
    * shuffles, never collects. Per seed: trigram count, memorized count,
    * novelty in basis points. */
  val t45 = GraftQuery(
    "t45_memorization_audit",
    "Trigram memorization of t37's generations vs the corpus: per-seed novelty bp",
    (s, dir) => {
      import org.apache.spark.sql.GraftColumnBridge
      val ws = table(s, dir, "documents")
        .select(col("doc_id"), words(col("text")).as("ws"))
      val bi = ws.filter(size(col("ws")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(ws) - 1),
             i -> struct(element_at(ws, i) AS prev, element_at(ws, i + 1) AS cur))"""))
          .as("b"))
        .select(col("b.prev").as("prev"), col("b.cur").as("cur"))
      val wSucc = Window.partitionBy("prev").orderBy(desc("bcnt"), col("cur"))
      val succ = bi.groupBy("prev", "cur").agg(count(lit(1)).as("bcnt"))
        .withColumn("r", row_number().over(wSucc))
        .filter(col("r") === 1)
        .select(col("prev"), col("cur"))
      val wSeed = Window.orderBy(desc("cnt"), col("w"))
      val seeds = ws.select(explode(col("ws")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .withColumn("r", row_number().over(wSeed))
        .filter(col("r") <= 5)
        .select(col("w").as("t0"), col("r").cast("long").as("seed_rank"))
      var gen = seeds
      for (i <- 1 to 8) {
        val si = succ.select(col("prev").as(s"p$i"), col("cur").as(s"t$i"))
        gen = gen.join(broadcast(si), col(s"t${i - 1}") === col(s"p$i"), "left")
          .drop(s"p$i")
      }
      val genTris = gen
        .withColumn("toks", expr(
          "filter(array(t0, t1, t2, t3, t4, t5, t6, t7, t8), x -> x IS NOT NULL)"))
        .select(col("seed_rank"), col("t0").as("seed"),
          explode(expr(
            """CASE WHEN size(toks) >= 3 THEN
                 transform(sequence(1, size(toks) - 2),
                   i -> concat_ws(' ', element_at(toks, i),
                     element_at(toks, i + 1), element_at(toks, i + 2)))
               ELSE array() END"""))
            .as("tri"))
        // tiny frame, eagerly pinned: it both broadcasts into the corpus
        // sweep and anchors the final report
        .localCheckpoint(true)
      val corpusTris = table(s, dir, "documents")
        .select(GraftColumnBridge.column(graft.expressions.NGrams(
          GraftColumnBridge.expression(lower(col("text"))), 3))
          .as(Seq("pos", "ngram")))
        .join(broadcast(genTris.select(col("tri").as("ngram")).distinct()),
          Seq("ngram"), "left_semi")
        .select(col("ngram")).distinct()
        .withColumn("memorized", lit(1L))
      genTris.join(corpusTris, genTris("tri") === corpusTris("ngram"), "left")
        .groupBy("seed_rank", "seed")
        .agg(count(lit(1)).as("n_trigrams"),
          sum(coalesce(col("memorized"), lit(0L))).as("n_memorized"))
        .withColumn("novelty_bp", expr(
          "(n_trigrams - n_memorized) * 10000 div n_trigrams"))
        .orderBy("seed_rank")
    },
    Some("""
      WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
      bi AS (SELECT ws[i] AS prev, ws[i + 1] AS cur
             FROM ws, UNNEST(range(1, len(ws))) AS t(i)
             WHERE len(ws) >= 2),
      bc AS (SELECT prev, cur, count(*) AS bcnt FROM bi GROUP BY prev, cur),
      succ AS (SELECT prev, cur FROM (
                 SELECT prev, cur, row_number() OVER (PARTITION BY prev
                          ORDER BY bcnt DESC, cur) AS r
                 FROM bc)
               WHERE r = 1),
      tok AS (SELECT unnest(ws) AS w FROM ws),
      seeds AS (SELECT w AS t0, CAST(r AS BIGINT) AS seed_rank FROM (
                  SELECT w, row_number() OVER (ORDER BY count(*) DESC, w) AS r
                  FROM tok GROUP BY w)
                WHERE r <= 5),
      g1 AS (SELECT s.*, x.cur AS t1 FROM seeds s LEFT JOIN succ x ON x.prev = s.t0),
      g2 AS (SELECT g.*, x.cur AS t2 FROM g1 g LEFT JOIN succ x ON x.prev = g.t1),
      g3 AS (SELECT g.*, x.cur AS t3 FROM g2 g LEFT JOIN succ x ON x.prev = g.t2),
      g4 AS (SELECT g.*, x.cur AS t4 FROM g3 g LEFT JOIN succ x ON x.prev = g.t3),
      g5 AS (SELECT g.*, x.cur AS t5 FROM g4 g LEFT JOIN succ x ON x.prev = g.t4),
      g6 AS (SELECT g.*, x.cur AS t6 FROM g5 g LEFT JOIN succ x ON x.prev = g.t5),
      g7 AS (SELECT g.*, x.cur AS t7 FROM g6 g LEFT JOIN succ x ON x.prev = g.t6),
      g8 AS (SELECT g.*, x.cur AS t8 FROM g7 g LEFT JOIN succ x ON x.prev = g.t7),
      toks AS (SELECT seed_rank, t0 AS seed,
                      list_filter([t0, t1, t2, t3, t4, t5, t6, t7, t8],
                                  x -> x IS NOT NULL) AS toks
               FROM g8),
      gen_tris AS (
        SELECT seed_rank, seed, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS tri
        FROM toks, UNNEST(range(1, CAST(greatest(len(toks) - 2, 1) AS INTEGER) + 1)) t(i)
        WHERE i + 2 <= len(toks)),
      corpus_tris AS (
        SELECT DISTINCT ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS tri
        FROM ws, UNNEST(range(1, len(ws) - 1)) AS t(i))
      SELECT g.seed_rank, g.seed,
             count(*) AS n_trigrams,
             CAST(sum(CASE WHEN c.tri IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_memorized,
             (count(*) - CAST(sum(CASE WHEN c.tri IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT))
               * 10000 // count(*) AS novelty_bp
      FROM gen_tris g LEFT JOIN corpus_tris c ON g.tri = c.tri
      GROUP BY g.seed_rank, g.seed
      ORDER BY g.seed_rank"""))

  /** Pairwise SOURCE-DIVERGENCE matrix under total-variation distance —
    * the corpus-mixture diagnostic behind dedup-source weighting and
    * "is src7 just a mirror of src3" questions: TV(p,q) = ½Σ|pᵢ−qᵢ| over
    * the two sources' unigram distributions, the ONLY f-divergence that
    * stays integer-exact (KL/JS need logs). Shared-vocabulary algebra
    * removes the full-outer join the naive form wants: for tokens in one
    * source only, Σpᵢ = 1 − Σ_shared pᵢ, so TV derives entirely from the
    * INNER join — |n_a·N_b − n_b·N_a| sums plus two complement terms,
    * all BIGINT (numerators peak at 2·N_a·N_b ≈ 5e9 at sf0.1, ·10⁴ ≪
    * 2⁶³), bp via integral division. Scale shape: ONE documents scan to
    * the (source, token) count frame (the corpus-sized step, pinned);
    * totals broadcast back; the pair join runs on the vocab-sized count
    * frame and fans out S−1 ways per token — quadratic in SOURCE COUNT
    * (a report cardinality, 20 here), never in corpus size. */
  val t46 = GraftQuery(
    "t46_source_divergence_matrix",
    "Pairwise total-variation distance between sources' unigram distributions, in bp",
    (s, dir) => {
      val cnt = table(s, dir, "documents")
        .select(col("source"), explode(split(lower(col("text")), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy("source", "token")
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(true)
      val tot = cnt.groupBy("source").agg(sum("n").as("nt"))
      val sided = cnt.join(broadcast(tot), "source")
      val a = sided.select(col("source").as("src_a"), col("token"),
        col("n").as("na"), col("nt").as("na_tot"))
      val b = sided.select(col("source").as("src_b"), col("token"),
        col("n").as("nb"), col("nt").as("nb_tot"))
      a.join(b, Seq("token"))
        .filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b", "na_tot", "nb_tot")
        .agg(count(lit(1)).as("n_shared"),
          sum(abs(expr("na * nb_tot - nb * na_tot"))).as("diff"),
          sum(expr("na * nb_tot")).as("pa_num"),
          sum(expr("nb * na_tot")).as("pb_num"))
        .select(col("src_a"), col("src_b"), col("n_shared"),
          expr("""(diff + (na_tot * nb_tot - pa_num)
                        + (na_tot * nb_tot - pb_num)) * 10000
                  div (2 * na_tot * nb_tot)""").as("tv_bp"))
        .orderBy("src_a", "src_b")
    },
    Some("""
      WITH cnt AS (
        SELECT source, token, count(*) AS n
        FROM documents, UNNEST(string_split(lower(text), ' ')) AS t(token)
        WHERE token <> ''
        GROUP BY 1, 2),
      tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS nt
              FROM cnt GROUP BY 1),
      sided AS (
        SELECT c.source, c.token, CAST(c.n AS BIGINT) AS n, tot.nt
        FROM cnt c JOIN tot USING (source))
      SELECT a.source AS src_a, b.source AS src_b,
             count(*) AS n_shared,
             CAST((sum(abs(a.n * b.nt - b.n * a.nt))
                   + (a.nt * b.nt - sum(a.n * b.nt))
                   + (a.nt * b.nt - sum(b.n * a.nt))) * 10000
                  // (2 * a.nt * b.nt) AS BIGINT) AS tv_bp
      FROM sided a JOIN sided b
        ON a.token = b.token AND a.source < b.source
      GROUP BY a.source, b.source, a.nt, b.nt
      ORDER BY src_a, src_b"""))

  /** READABILITY scoring — integer-exact Flesch reading ease, the
    * quality-pipeline feature that separates encyclopedic prose from
    * keyword-stuffed spam at a glance: 206.835 − 1.015·(words/sentence)
    * − 84.6·(syllables/word), computed in milli-points with floor'd
    * integral ratios at each step so both engines walk the identical
    * integer sequence (no float in the pipeline; negative finals allowed
    * — subtraction of non-negative terms is exact either way).
    * Sentences count [.!?]+ runs (min 1); syllables approximate as
    * [aeiouy]+ vowel groups — the standard heuristic, same regex both
    * engines. Scale shape: the per-doc score is a row-local projection
    * (three regexp_extract_all counts — embarrassingly parallel, no
    * shuffle); the report rolls up to (lang × difficulty band) with an
    * integer mean, so the only exchange is the tiny band rollup. */
  val t47 = GraftQuery(
    "t47_readability_flesch",
    "Integer-exact Flesch reading ease per doc, banded per (lang, difficulty)",
    (s, dir) => {
      val scored = table(s, dir, "documents")
        .withColumn("w", size(regexp_extract_all(lower(col("text")),
          lit("[a-z0-9]+"), lit(0))).cast("long"))
        .withColumn("sents", greatest(
          size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
            .cast("long"), lit(1L)))
        .withColumn("syll", size(regexp_extract_all(lower(col("text")),
          lit("[aeiouy]+"), lit(0))).cast("long"))
        .filter(col("w") > 0)
        .withColumn("score_milli", expr(
          """206835 - 1015 * ((w * 1000) div sents) div 1000
                    - 84600 * ((syll * 1000) div w) div 1000"""))
        .withColumn("band", expr(
          """CASE WHEN score_milli >= 90000 THEN '1_very_easy'
                  WHEN score_milli >= 60000 THEN '2_standard'
                  WHEN score_milli >= 30000 THEN '3_difficult'
                  ELSE '4_very_difficult' END"""))
      scored.groupBy("lang", "band")
        .agg(count(lit(1)).as("n_docs"),
          expr("sum(score_milli) div count(*)").as("avg_score_milli"),
          min("score_milli").as("min_score_milli"),
          max("score_milli").as("max_score_milli"))
        .orderBy("lang", "band")
    },
    Some("""
      WITH scored AS (
        SELECT lang,
               206835
                 - 1015 * ((w * 1000) // sents) // 1000
                 - 84600 * ((syll * 1000) // w) // 1000 AS score_milli
        FROM (
          SELECT lang,
                 CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                   AS BIGINT) AS w,
                 greatest(CAST(len(regexp_extract_all(text, '[.!?]+'))
                   AS BIGINT), 1) AS sents,
                 CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                   AS BIGINT) AS syll
          FROM documents)
        WHERE w > 0),
      banded AS (
        SELECT lang, score_milli,
               CASE WHEN score_milli >= 90000 THEN '1_very_easy'
                    WHEN score_milli >= 60000 THEN '2_standard'
                    WHEN score_milli >= 30000 THEN '3_difficult'
                    ELSE '4_very_difficult' END AS band
        FROM scored)
      SELECT lang, band, count(*) AS n_docs,
             CAST(sum(score_milli) AS BIGINT) // count(*) AS avg_score_milli,
             CAST(min(score_milli) AS BIGINT) AS min_score_milli,
             CAST(max(score_milli) AS BIGINT) AS max_score_milli
      FROM banded
      GROUP BY lang, band
      ORDER BY lang, band"""))

  /** Term BURSTINESS — Church & Gale's variance-to-mean ratio, the
    * statistic that separates topical words (bursty: absent from most
    * docs, dense in a few) from function words (Poisson-ish: VMR ≈ 1)
    * and thus drives stopword discovery (t39) and tf saturation choices
    * (t11's BM25 k1). Integer-exact via the zero-inclusive identity:
    * over ALL N docs (zeros included), Σc and Σc² come entirely from the
    * docs that CONTAIN the term, so VMR = Var/Mean =
    * (N·Σc² − (Σc)²) / (N·Σc) needs only the (term, doc) count frame
    * plus the corpus doc count — the zeros are algebra, not rows.
    * Numerators peak ≈ N·Σc² ≈ 1e10 at sf0.1, ·10⁴ ≪ 2⁶³ — pure BIGINT.
    * Reported for the top-20 terms by total count (ties by term). Scale
    * shape: ONE documents scan to the (term, doc) counts, a term rollup,
    * and a 20-row TakeOrdered — no global sort of the vocabulary. */
  val t48 = GraftQuery(
    "t48_term_burstiness",
    "Church-Gale burstiness (variance-to-mean ratio) of the top-20 terms, in bp",
    (s, dir) => {
      val docs = table(s, dir, "documents")
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val perDoc = docs
        .select(col("doc_id"),
          explode(split(lower(col("text")), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy("token", "doc_id")
        .agg(count(lit(1)).as("c"))
      perDoc
        .groupBy("token")
        .agg(count(lit(1)).as("n_docs_with"), sum("c").as("sc"),
          sum(expr("c * c")).as("sc2"))
        .crossJoin(broadcast(n))
        .withColumn("vmr_bp", expr(
          "(n_docs * sc2 - sc * sc) * 10000 div (n_docs * sc)"))
        .select("token", "n_docs_with", "sc", "vmr_bp")
        .orderBy(desc("sc"), col("token"))
        .limit(20)
    },
    Some("""
      WITH n AS (SELECT count(*) AS n_docs FROM documents),
      perdoc AS (
        SELECT token, doc_id, count(*) AS c
        FROM documents, UNNEST(string_split(lower(text), ' ')) AS t(token)
        WHERE token <> ''
        GROUP BY 1, 2),
      per_term AS (
        SELECT token, count(*) AS n_docs_with,
               CAST(sum(c) AS BIGINT) AS sc,
               CAST(sum(c * c) AS BIGINT) AS sc2
        FROM perdoc GROUP BY token)
      SELECT token, n_docs_with, sc,
             (n.n_docs * sc2 - sc * sc) * 10000 // (n.n_docs * sc) AS vmr_bp
      FROM per_term, n
      ORDER BY sc DESC, token
      LIMIT 20"""))

  /** BPE-style MERGE INDUCTION — three rounds of the actual byte-pair
    * encoding training loop, run distributed at word granularity: each
    * round counts adjacent-token bigrams across the corpus, picks the
    * most frequent pair (ties → lexicographic), and REWRITES the corpus
    * by fusing that pair (space → underscore) — exactly the greedy
    * left-to-right non-overlapping merge both engines' replace()
    * implements, which is what makes the rounds bit-reproducible
    * cross-engine. Output per round: the chosen pair, its count at
    * selection time, and the corpus vocabulary size after the merge
    * (merges grow vocab by ≤ 1 and shrink token count by the merge
    * count — Zipf in action). Scale shape: each round is one corpus
    * pass for bigram counts (partial-agg before the shuffle), a 1-row
    * top-1 broadcast back, and a row-local rewrite, materialized per
    * round (the posture real distributed BPE trainers take — production
    * runs the loop on the aggregated word-frequency table; three rounds
    * here keep the oracle expressible). */
  val t49 = GraftQuery(
    "t49_bpe_merge_induction",
    "Three BPE merge rounds: top bigram fused per round, corpus vocab tracked",
    (s, dir) => {
      def bigrams(df: org.apache.spark.sql.DataFrame) = df
        .select(explode(expr(
          """filter(zip_with(ws, slice(ws, 2, size(ws)),
                             (a, b) -> concat(a, ' ', b)),
                    p -> NOT p LIKE '% ' AND NOT p LIKE ' %')""")).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
      def vocab(df: org.apache.spark.sql.DataFrame) = df
        .select(explode(col("ws")).as("tok"))
        .filter(col("tok") =!= "").agg(countDistinct("tok").as("v"))
      var txt = table(s, dir, "documents")
        .select(col("doc_id"), lower(col("text")).as("t"))
        .withColumn("ws", split(col("t"), " "))
        .localCheckpoint(true)
      val recs = (1 to 3).map { r =>
        val top = bigrams(txt)
          .orderBy(desc("n"), col("pair")).limit(1)
          .localCheckpoint(true)
        txt = txt.crossJoin(broadcast(top))
          .withColumn("t", expr(
            "replace(t, pair, replace(pair, ' ', '_'))"))
          .select(col("doc_id"), col("t"))
          .withColumn("ws", split(col("t"), " "))
          .localCheckpoint(true)
        top.crossJoin(broadcast(vocab(txt)))
          .select(lit(r.toLong).as("round"), col("pair").as("merged_pair"),
            col("n").as("n_merges"), col("v").as("vocab_after"))
      }
      recs.reduce(_.unionByName(_)).orderBy("round")
    },
    Some("""
      WITH t0 AS (
        SELECT doc_id, lower(text) AS t FROM documents),
      b1 AS (
        SELECT ws[i] || ' ' || ws[i+1] AS pair, count(*) AS n
        FROM (SELECT string_split(t, ' ') AS ws FROM t0),
             UNNEST(range(1, len(ws))) AS u(i)
        WHERE ws[i] <> '' AND ws[i+1] <> ''
        GROUP BY 1 ORDER BY n DESC, pair LIMIT 1),
      t1 AS (
        SELECT doc_id, replace(t, b1.pair, replace(b1.pair, ' ', '_')) AS t
        FROM t0, b1),
      v1 AS (
        SELECT count(DISTINCT tok) AS v
        FROM t1, UNNEST(string_split(t, ' ')) AS s(tok) WHERE tok <> ''),
      b2 AS (
        SELECT ws[i] || ' ' || ws[i+1] AS pair, count(*) AS n
        FROM (SELECT string_split(t, ' ') AS ws FROM t1),
             UNNEST(range(1, len(ws))) AS u(i)
        WHERE ws[i] <> '' AND ws[i+1] <> ''
        GROUP BY 1 ORDER BY n DESC, pair LIMIT 1),
      t2 AS (
        SELECT doc_id, replace(t, b2.pair, replace(b2.pair, ' ', '_')) AS t
        FROM t1, b2),
      v2 AS (
        SELECT count(DISTINCT tok) AS v
        FROM t2, UNNEST(string_split(t, ' ')) AS s(tok) WHERE tok <> ''),
      b3 AS (
        SELECT ws[i] || ' ' || ws[i+1] AS pair, count(*) AS n
        FROM (SELECT string_split(t, ' ') AS ws FROM t2),
             UNNEST(range(1, len(ws))) AS u(i)
        WHERE ws[i] <> '' AND ws[i+1] <> ''
        GROUP BY 1 ORDER BY n DESC, pair LIMIT 1),
      t3 AS (
        SELECT doc_id, replace(t, b3.pair, replace(b3.pair, ' ', '_')) AS t
        FROM t2, b3),
      v3 AS (
        SELECT count(DISTINCT tok) AS v
        FROM t3, UNNEST(string_split(t, ' ')) AS s(tok) WHERE tok <> '')
      SELECT 1 AS round, b1.pair AS merged_pair, b1.n AS n_merges,
             CAST(v1.v AS BIGINT) AS vocab_after FROM b1, v1
      UNION ALL
      SELECT 2, b2.pair, b2.n, CAST(v2.v AS BIGINT) FROM b2, v2
      UNION ALL
      SELECT 3, b3.pair, b3.n, CAST(v3.v AS BIGINT) FROM b3, v3
      ORDER BY round"""))

  /** INSTRUCTION-PAIR construction — the SFT-data assembly step that
    * turns raw documents into (instruction, response) training pairs.
    * Fixture text carries no sentence punctuation, so the split is the
    * word-budget form real pipelines fall back to for un-punctuated
    * corpora: the instruction takes min(12, ⌊words/4⌋) leading words,
    * the response the remainder, and the standard gates apply (document
    * ≥ 20 words; response ≥ 2× the instruction — a pair whose "answer"
    * is shorter than its prompt teaches the model to truncate). The
    * report is the assembly audit per lang: docs in, pairs accepted,
    * acceptance bp, integer mean word counts of both sides. Entirely
    * row-local splitting + one |langs|-sized rollup — pair construction
    * runs inline with the corpus scan at any scale. */
  val t50 = GraftQuery(
    "t50_instruction_pairs",
    "SFT pair assembly: word-budget split, quality gates, per-lang acceptance audit",
    (s, dir) => {
      val gated = table(s, dir, "documents")
        .withColumn("nw", size(split(col("text"), " ")).cast("long"))
        .withColumn("iw", expr("least(12L, greatest(nw div 4, 1L))"))
        .withColumn("rw", col("nw") - col("iw"))
        .withColumn("accept", col("nw") >= 20L && col("rw") >= col("iw") * 2)
      gated.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("accept"), 1L).otherwise(0L)).as("n_pairs"),
          expr("sum(CASE WHEN accept THEN 1 ELSE 0 END) * 10000 div count(*)")
            .as("accept_bp"),
          coalesce(expr(
            "sum(CASE WHEN accept THEN iw END) div sum(CASE WHEN accept THEN 1 END)"),
            lit(0L)).as("mean_instr_words"),
          coalesce(expr(
            "sum(CASE WHEN accept THEN rw END) div sum(CASE WHEN accept THEN 1 END)"),
            lit(0L)).as("mean_resp_words"))
        .orderBy("lang")
    },
    Some("""
      WITH gated AS (
        SELECT lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
               least(12, greatest(CAST(len(string_split(text, ' '))
                 AS BIGINT) // 4, 1)) AS iw
        FROM documents),
      g2 AS (
        SELECT lang, nw, iw, nw - iw AS rw,
               (nw >= 20 AND nw - iw >= iw * 2) AS accept
        FROM gated)
      SELECT lang, count(*) AS n_docs,
             CAST(sum(CASE WHEN accept THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pairs,
             CAST(sum(CASE WHEN accept THEN 1 ELSE 0 END) * 10000 // count(*)
               AS BIGINT) AS accept_bp,
             CAST(coalesce(CAST(sum(CASE WHEN accept THEN iw END) AS BIGINT)
               // sum(CASE WHEN accept THEN 1 END), 0) AS BIGINT)
               AS mean_instr_words,
             CAST(coalesce(CAST(sum(CASE WHEN accept THEN rw END) AS BIGINT)
               // sum(CASE WHEN accept THEN 1 END), 0) AS BIGINT)
               AS mean_resp_words
      FROM g2
      GROUP BY lang
      ORDER BY lang"""))

  /** FEATURE HASHING audit — the hashing trick (Weinberger et al. 2009)
    * that lets text models use fixed-width feature vectors with no
    * vocabulary dictionary: each token maps to bucket md5(token) mod
    * 1024 (portable across engines, unlike murmur), and the audit
    * reports what every user of hashed features needs to know before
    * trusting them — per lang, the occupied bucket count, the collision
    * load (distinct tokens per occupied bucket in milli — the
    * dictionary-free compression's cost), and the heaviest bucket with
    * its token count. The md5→bucket arithmetic reuses the m19 nibble
    * decode (first hex nibble → 16 buckets — the fixture vocabulary is a
    * small controlled set, so a production-width table would never
    * collide; the WIDTH is the knob, the algebra is identical). One
    * documents
    * scan to (lang, token) distincts, one bucket rollup, one lang
    * rollup — vocabulary-sized frames after the first aggregation. */
  val t51 = GraftQuery(
    "t51_feature_hashing",
    "Hashing-trick audit: 16-bucket occupancy, collision load, heaviest bucket per lang",
    (s, dir) => {
      val nib = (i: Int) => s"(instr('0123456789abcdef', substring(h, $i, 1)) - 1)"
      val toks = table(s, dir, "documents")
        .select(col("lang"),
          explode(split(lower(col("text")), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy("lang", "token").agg(count(lit(1)).as("n_occ"))
        .withColumn("h", md5(col("token").cast("binary")))
        .withColumn("bucket", expr(nib(1)))
      val buckets = toks.groupBy("lang", "bucket")
        .agg(countDistinct("token").as("n_tokens"),
          sum("n_occ").as("n_occ"))
        .localCheckpoint(true)
      val heaviest = buckets
        .withColumn("rk", row_number().over(
          Window.partitionBy("lang")
            .orderBy(desc("n_occ"), col("bucket"))))
        .filter(col("rk") === 1)
        .select(col("lang"), col("bucket").as("top_bucket"),
          col("n_occ").as("top_bucket_occ"))
      buckets.groupBy("lang")
        .agg(count(lit(1)).as("n_buckets_used"),
          sum("n_tokens").as("n_distinct_tokens"),
          expr("sum(n_tokens) * 1000 div count(*)").as("collision_load_milli"))
        .join(heaviest, Seq("lang"))
        .orderBy("lang")
    },
    Some("""
      WITH toks AS (
        SELECT lang, token, count(*) AS n_occ
        FROM documents, UNNEST(string_split(lower(text), ' ')) AS t(token)
        WHERE token <> ''
        GROUP BY 1, 2),
      hashed AS (
        SELECT lang, token, n_occ,
               (strpos('0123456789abcdef', substring(md5(token), 1, 1)) - 1)
                 AS bucket
        FROM toks),
      buckets AS (
        SELECT lang, bucket, count(DISTINCT token) AS n_tokens,
               CAST(sum(n_occ) AS BIGINT) AS n_occ
        FROM hashed GROUP BY 1, 2),
      heaviest AS (
        SELECT lang, bucket AS top_bucket, n_occ AS top_bucket_occ
        FROM (SELECT lang, bucket, n_occ,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY n_occ DESC, bucket) AS rk
              FROM buckets)
        WHERE rk = 1)
      SELECT b.lang, count(*) AS n_buckets_used,
             CAST(sum(b.n_tokens) AS BIGINT) AS n_distinct_tokens,
             CAST(sum(b.n_tokens) * 1000 // count(*) AS BIGINT)
               AS collision_load_milli,
             h.top_bucket, h.top_bucket_occ
      FROM buckets b JOIN heaviest h USING (lang)
      GROUP BY b.lang, h.top_bucket, h.top_bucket_occ
      ORDER BY b.lang"""))

  /** SCRIPT-MIX audit — the writing-system profile that catches
    * mislabeled and contaminated documents before language-specific
    * processing runs on the wrong script (a "zh" doc that is mostly
    * Latin is a labeling bug; Latin tokens inside CJK text are often
    * code or spam): every character classifies by CODE POINT range
    * (the m18 idiom — ascii() is the portable code-point primitive in
    * both engines; no regex Unicode classes, whose semantics diverge)
    * into latin / digit / cjk / space / other, ratios land in bp, and
    * the per-lang rollup flags docs whose dominant script disagrees
    * with their label. Row-local HOF arithmetic, |langs| rollup — the
    * audit is one corpus pass. */
  val t52 = GraftQuery(
    "t52_script_mix_audit",
    "Code-point script profile per lang: latin/digit/cjk/space bp + script-label mismatches",
    (s, dir) => {
      val classed = table(s, dir, "documents")
        .withColumn("cps", expr(
          "transform(split(text, ''), c -> CAST(ascii(c) AS BIGINT))"))
        .withColumn("n_chars_t", size(col("cps")).cast("long"))
        .filter(col("n_chars_t") > 0)
        .withColumn("n_latin", expr(
          """size(filter(cps, p -> (p >= 65 AND p <= 90)
                                OR (p >= 97 AND p <= 122)))""").cast("long"))
        .withColumn("n_digit", expr(
          "size(filter(cps, p -> p >= 48 AND p <= 57))").cast("long"))
        .withColumn("n_cjk", expr(
          "size(filter(cps, p -> p >= 19968 AND p <= 40959))").cast("long"))
        .withColumn("n_space", expr(
          "size(filter(cps, p -> p = 32))").cast("long"))
        .withColumn("mismatch", expr(
          """CASE WHEN lang = 'zh' THEN n_latin > n_cjk
                  ELSE n_cjk > n_latin END"""))
      classed.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          expr("sum(n_latin) * 10000 div sum(n_chars_t)").as("latin_bp"),
          expr("sum(n_digit) * 10000 div sum(n_chars_t)").as("digit_bp"),
          expr("sum(n_cjk) * 10000 div sum(n_chars_t)").as("cjk_bp"),
          expr("sum(n_space) * 10000 div sum(n_chars_t)").as("space_bp"),
          sum(when(col("mismatch"), 1L).otherwise(0L)).as("n_mismatched"))
        .orderBy("lang")
    },
    Some("""
      WITH classed AS (
        SELECT lang,
               CAST(length(text) AS BIGINT) AS n_chars_t,
               CAST(len(list_filter(list_transform(string_split(text, ''),
                 c -> ascii(c)), p -> (p >= 65 AND p <= 90)
                                   OR (p >= 97 AND p <= 122))) AS BIGINT)
                 AS n_latin,
               CAST(len(list_filter(list_transform(string_split(text, ''),
                 c -> ascii(c)), p -> p >= 48 AND p <= 57)) AS BIGINT)
                 AS n_digit,
               CAST(len(list_filter(list_transform(string_split(text, ''),
                 c -> ascii(c)), p -> p >= 19968 AND p <= 40959)) AS BIGINT)
                 AS n_cjk,
               CAST(len(list_filter(list_transform(string_split(text, ''),
                 c -> ascii(c)), p -> p = 32)) AS BIGINT) AS n_space
        FROM documents
        WHERE length(text) > 0),
      flagged AS (
        SELECT *, CASE WHEN lang = 'zh' THEN n_latin > n_cjk
                       ELSE n_cjk > n_latin END AS mismatch
        FROM classed)
      SELECT lang, count(*) AS n_docs,
             CAST(sum(n_latin) * 10000 // sum(n_chars_t) AS BIGINT) AS latin_bp,
             CAST(sum(n_digit) * 10000 // sum(n_chars_t) AS BIGINT) AS digit_bp,
             CAST(sum(n_cjk) * 10000 // sum(n_chars_t) AS BIGINT) AS cjk_bp,
             CAST(sum(n_space) * 10000 // sum(n_chars_t) AS BIGINT) AS space_bp,
             CAST(sum(CASE WHEN mismatch THEN 1 ELSE 0 END) AS BIGINT)
               AS n_mismatched
      FROM flagged
      GROUP BY lang
      ORDER BY lang"""))

  /** DATASET DATASHEET — the per-source summary every corpus release
    * ships (Gebru et al.'s datasheets, operationalized): volume (docs,
    * words), language spread, EXACT duplicate rate (md5-identical texts
    * within the source, the d1 discipline, in bp), mean word length in
    * milli-chars (the cheap quality proxy), and the exact median
    * document length (lower median via per-source rank — no collect,
    * no interpolation). One corpus scan feeds the volume/quality
    * numbers and the digest rollup; the median rides a per-source rank
    * window (each source sorts only its own docs). The point of the
    * entry is ASSEMBLY: ten families of metrics exist in this registry
    * — a release needs them in one table. */
  val t54 = GraftQuery(
    "t54_dataset_datasheet",
    "Per-source release datasheet: volume, languages, dup bp, quality proxy, median length",
    (s, dir) => {
      val docs = table(s, dir, "documents")
        .select(col("source"), col("lang"), col("text"),
          length(col("text")).cast("long").as("n_chars_t"),
          size(split(col("text"), " ")).cast("long").as("n_words"),
          md5(col("text").cast("binary")).as("dg"))
        .localCheckpoint(true)
      val dup = docs.groupBy("source", "dg").agg(count(lit(1)).as("k"))
        .groupBy("source")
        .agg(sum(expr("k - 1")).as("n_dup_docs"))
      val wRank = Window.partitionBy("source").orderBy("n_chars_t", "dg")
      val med = docs
        .withColumn("rn", row_number().over(wRank))
        .withColumn("tot", count(lit(1)).over(Window.partitionBy("source")))
        .filter(col("rn") === expr("(tot + 1) div 2"))
        .select(col("source"), col("n_chars_t").as("median_chars"))
      docs.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("lang").as("n_langs"),
          sum("n_words").as("total_words"),
          expr("sum(n_chars_t) * 1000 div sum(n_words)")
            .as("avg_word_len_milli"))
        .join(dup, Seq("source"))
        .join(med, Seq("source"))
        .withColumn("dup_bp", expr("n_dup_docs * 10000 div n_docs"))
        .select("source", "n_docs", "n_langs", "total_words",
          "avg_word_len_milli", "dup_bp", "median_chars")
        .orderBy("source")
    },
    Some("""
      WITH docs AS (
        SELECT source, lang, text,
               CAST(length(text) AS BIGINT) AS n_chars_t,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
               md5(text) AS dg
        FROM documents),
      dup AS (
        SELECT source, CAST(sum(k - 1) AS BIGINT) AS n_dup_docs
        FROM (SELECT source, dg, count(*) AS k FROM docs GROUP BY 1, 2)
        GROUP BY source),
      med AS (
        SELECT source, n_chars_t AS median_chars
        FROM (SELECT source, n_chars_t,
                     row_number() OVER (PARTITION BY source
                       ORDER BY n_chars_t, dg) AS rn,
                     count(*) OVER (PARTITION BY source) AS tot
              FROM docs)
        WHERE rn = (tot + 1) // 2),
      vol AS (
        SELECT source, count(*) AS n_docs,
               count(DISTINCT lang) AS n_langs,
               CAST(sum(n_words) AS BIGINT) AS total_words,
               CAST(sum(n_chars_t) * 1000 // sum(n_words) AS BIGINT)
                 AS avg_word_len_milli
        FROM docs GROUP BY source)
      SELECT v.source, v.n_docs, v.n_langs, v.total_words,
             v.avg_word_len_milli,
             CAST(d.n_dup_docs * 10000 // v.n_docs AS BIGINT) AS dup_bp,
             m.median_chars
      FROM vol v
      JOIN dup d USING (source)
      JOIN med m USING (source)
      ORDER BY source"""))

  /** HARD-NEGATIVE mining — the contrastive-training data op behind
    * every retrieval model: for each query document, the most
    * LEXICALLY CONFUSABLE other documents (high rare-term overlap)
    * that are NOT near-duplicates — confusable-but-different is
    * exactly what the model must learn to separate; random negatives
    * are too easy and near-dups are false negatives. Scoring is
    * integer-exact idf overlap (Σ over shared distinct tokens of
    * 10⁶ div df — rarity-weighted, no logs), the near-dup guard drops
    * pairs with token-set containment ≥ 50 % of the query (the d9
    * asymmetric rule: an excerpt is a false negative even when the
    * full doc is much larger), and each query keeps its top-3 (ties by
    * doc id). Candidates ride the shared-token equi-join off the
    * (doc, token) distinct frame — never all-pairs; the query set is a
    * hash-deterministic slice (doc_id % 100 = 0). */
  val t55 = GraftQuery(
    "t55_hard_negatives",
    "Top-3 idf-overlap hard negatives per query doc, near-dup-guarded, integer scores",
    (s, dir) => {
      val toks = table(s, dir, "documents")
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "").distinct()
        .localCheckpoint(true)
      val df = toks.groupBy("tok").agg(count(lit(1)).as("df"))
      val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val queries = toks.filter(expr("doc_id % 100 = 0"))
        .select(col("doc_id").as("q"), col("tok"))
      val scored = queries
        .join(toks.select(col("doc_id").as("c"), col("tok")), Seq("tok"))
        .filter(col("q") =!= col("c"))
        .join(broadcast(df), Seq("tok"))
        .groupBy("q", "c")
        .agg(count(lit(1)).as("inter"),
          sum(expr("1000000 div df")).as("score"))
        .join(broadcast(sizes.select(col("doc_id").as("q"),
          col("n").as("nq"))), Seq("q"))
        .filter(expr("inter * 10000 div nq < 5000"))
      scored
        .withColumn("rank", row_number().over(
          Window.partitionBy("q").orderBy(desc("score"), col("c"))))
        .filter(col("rank") <= 3)
        .select(col("q").as("query_doc"), col("rank").cast("long").as("rank"),
          col("c").as("negative_doc"), col("inter"), col("score"))
        .orderBy("query_doc", "rank")
    },
    Some("""
      WITH toks AS (
        SELECT DISTINCT doc_id, token AS tok
        FROM documents, UNNEST(string_split(lower(text), ' ')) AS t(token)
        WHERE token <> ''),
      dfreq AS (SELECT tok, count(*) AS df FROM toks GROUP BY tok),
      sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
      scored AS (
        SELECT a.doc_id AS q, b.doc_id AS c, count(*) AS inter,
               CAST(sum(1000000 // dfreq.df) AS BIGINT) AS score
        FROM toks a
        JOIN toks b ON a.tok = b.tok AND a.doc_id <> b.doc_id
        JOIN dfreq ON dfreq.tok = a.tok
        WHERE a.doc_id % 100 = 0
        GROUP BY 1, 2),
      guarded AS (
        SELECT s.q, s.c, s.inter, s.score
        FROM scored s JOIN sizes nq ON nq.doc_id = s.q
        WHERE s.inter * 10000 // nq.n < 5000),
      ranked AS (
        SELECT q, c, inter, score,
               row_number() OVER (PARTITION BY q
                 ORDER BY score DESC, c) AS rank
        FROM guarded)
      SELECT q AS query_doc, CAST(rank AS BIGINT) AS rank,
             c AS negative_doc, inter, score
      FROM ranked WHERE rank <= 3
      ORDER BY query_doc, rank"""))

  /** TOKENIZER FERTILITY AUDIT — the budgeting number every multilingual
    * training run needs before it starts: corpus cost is TOKENS, not
    * characters, and tokens-per-word (fertility) varies several-fold by
    * language/script — a mixture designed in characters silently
    * over-weights low-fertility languages. Subword proxy: greedy runs of
    * ≤4 letters plus single non-letter glyphs (`[A-Za-z]{1,4}|[^A-Za-z\s]`
    * — a deterministic BPE stand-in both engines evaluate identically;
    * CJK costs one token per glyph, the real tokenizer-fertility shape).
    * Per lang: whitespace words, subword tokens, fertility in
    * milli-tokens-per-word, chars-per-token, and bytes-per-char (UTF-8
    * density — the storage-vs-token wedge). ONE corpus scan, one
    * map-side-combined agg: the audit costs a projection at any corpus
    * size; nothing shuffles but 5 longs per language. */
  val t56 = GraftQuery(
    "t56_tokenizer_fertility",
    "Tokens-per-word fertility, chars-per-token, bytes-per-char by language — integer milli",
    (s, dir) =>
      table(s, dir, "documents")
        .filter(length(col("text")) > 0)
        .select(col("lang"),
          length(col("text")).cast("long").as("n_chars"),
          expr("CAST(octet_length(text) AS BIGINT)").as("n_bytes"),
          expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n_words"),
          expr("""CAST(size(regexp_extract_all(text,
            '[A-Za-z]{1,4}|[^A-Za-z\\s]', 0)) AS BIGINT)""").as("n_sub"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_words").as("n_words"),
          sum("n_sub").as("n_sub_tokens"),
          expr("sum(n_sub) * 1000 div sum(n_words)").as("fertility_milli"),
          expr("sum(n_chars) * 1000 div sum(n_sub)").as("chars_per_tok_milli"),
          expr("sum(n_bytes) * 1000 div sum(n_chars)").as("bytes_per_char_milli"))
        .orderBy("lang"),
    Some("""
      WITH d AS (
        SELECT lang,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(strlen(text) AS BIGINT) AS n_bytes,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
               CAST(len(regexp_extract_all(text,
                 '[A-Za-z]{1,4}|[^A-Za-z\s]')) AS BIGINT) AS n_sub
        FROM documents WHERE length(text) > 0)
      SELECT lang, count(*) AS n_docs,
             CAST(sum(n_words) AS BIGINT) AS n_words,
             CAST(sum(n_sub) AS BIGINT) AS n_sub_tokens,
             CAST(sum(n_sub) * 1000 // sum(n_words) AS BIGINT)
               AS fertility_milli,
             CAST(sum(n_chars) * 1000 // sum(n_sub) AS BIGINT)
               AS chars_per_tok_milli,
             CAST(sum(n_bytes) * 1000 // sum(n_chars) AS BIGINT)
               AS bytes_per_char_milli
      FROM d
      GROUP BY lang
      ORDER BY lang"""))

  /** ZIPF RANK-FREQUENCY FIT — the corpus-law companion to t28 (Heaps:
    * vocabulary growth) and t36 (frequency spectrum): natural text obeys
    * freq ∝ rank^(−s) with s ≈ 1, and the fitted slope is a cheap
    * corpus-health signal — machine-generated or heavily-templated text
    * bends the log-log line (|s| drifts, r² drops), so the fit is a
    * one-row screen before expensive per-doc quality models. OLS of
    * ln(freq) on ln(rank) over the top-200 terms (the head is where the
    * law holds; the tail is Heaps' regime): top-k via orderBy+limit —
    * TakeOrderedAndProject, per-partition heaps, never a global vocab
    * sort — then a 200-row local window ranks, and the moments reduce
    * in one agg. Doubles enter ONLY in ln(); all four outputs round to
    * 4 decimals, far above ulp noise (the q180/q42 discipline). The
    * driver fixture itself demonstrates the screen's point: its
    * template-generated text has a ~31-word vocabulary with near-flat
    * frequencies, and the fit duly reports slope ≈ −0.18, r² ≈ 0.06 —
    * the degenerate signature no natural corpus shows (s ≈ 1, r² > .9). */
  val t57 = GraftQuery(
    "t57_zipf_slope",
    "Zipf fit over the top-200 terms: OLS slope/intercept/r2 of ln(freq) vs ln(rank)",
    (s, dir) => {
      val freq = table(s, dir, "documents")
        .select(explode(split(lower(col("text")), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy("term").agg(count(lit(1)).as("f"))
      val top = freq.orderBy(desc("f"), asc("term")).limit(200)
      val pts = top
        .withColumn("rank", row_number().over(
          Window.orderBy(desc("f"), asc("term"))).cast("long"))
        .select(log(col("rank").cast("double")).as("x"),
          log(col("f").cast("double")).as("y"))
      pts.agg(count(lit(1)).cast("double").as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(expr("x * x")).as("sxx"),
          sum(expr("x * y")).as("sxy"),
          sum(expr("y * y")).as("syy"))
        .select(col("n").cast("long").as("n_terms"),
          round(expr("(n * sxy - sx * sy) / (n * sxx - sx * sx)"), 4)
            .as("slope"),
          round(expr("(sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n"), 4)
            .as("intercept"),
          round(expr("""(n * sxy - sx * sy) * (n * sxy - sx * sy)
            / ((n * sxx - sx * sx) * (n * syy - sy * sy))"""), 4).as("r2"))
    },
    Some("""
      WITH freq AS (
        SELECT term, count(*) AS f
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS term
              FROM documents)
        WHERE length(term) > 0
        GROUP BY term),
      top AS (
        SELECT f, row_number() OVER (ORDER BY f DESC, term) AS rank
        FROM freq ORDER BY f DESC, term LIMIT 200),
      pts AS (
        SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(f AS DOUBLE)) AS y
        FROM top),
      mom AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
        FROM pts)
      SELECT CAST(n AS BIGINT) AS n_terms,
             round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
             round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4)
               AS intercept,
             round((n * sxy - sx * sy) * (n * sxy - sx * sy)
               / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) AS r2
      FROM mom"""))

  /** LUHN-VALIDATED PII DETECTION — the checksum tier t16's regex pass
    * lacks: a 13-16 digit run is only PROBABLY a card number, and
    * redacting every long number destroys invoice ids, EANs, and
    * tracking codes — production PII pipelines validate the Luhn mod-10
    * checksum first (doubling every second digit from the right,
    * summing digit-sums) and treat only valid candidates as PII. The
    * corpus is SEEDED deterministically (every 7th doc gets a derived
    * card-shaped number, made Luhn-VALID by construction via its own
    * check digit; every 11th a luhn-INVALID lookalike), candidates
    * extract by regex, and the checksum runs as a pure HOF fold over
    * the digit array — codegen'd, no UDF, the same expression both
    * engines evaluate. Per source: candidates, luhn-valid (true PII),
    * luhn-rejected (saved from over-redaction), precision of the naive
    * regex in bp. */
  val t58 = GraftQuery(
    "t58_luhn_pii_validation",
    "Card-number candidates Luhn-validated with a HOF checksum: naive-regex precision per source",
    (s, dir) => {
      // seed: 15 payload digits derived from doc_id, check digit CHOSEN
      // so the full 16 pass Luhn (valid), or chosen +1 mod 10 (invalid)
      val seeded = table(s, dir, "documents")
        .withColumn("payload",
          expr("lpad(CAST(doc_id * 73 + 1000000 AS STRING), 15, '1')"))
        .withColumn("luhn_sum_payload", expr("""
          aggregate(transform(sequence(1, 15),
            i -> CAST(IF(i % 2 = 1,
                   IF(CAST(substring(payload, 16 - i, 1) AS INT) * 2 > 9,
                      CAST(substring(payload, 16 - i, 1) AS INT) * 2 - 9,
                      CAST(substring(payload, 16 - i, 1) AS INT) * 2),
                   CAST(substring(payload, 16 - i, 1) AS INT)) AS BIGINT)),
            0L, (a, x) -> a + x)"""))
        .withColumn("check_digit",
          expr("CAST((10 - luhn_sum_payload % 10) % 10 AS STRING)"))
        .withColumn("text2", expr("""
          CASE WHEN doc_id % 7 = 0
                 THEN concat(text, ' card ', payload, check_digit)
               WHEN doc_id % 11 = 0
                 THEN concat(text, ' ref ', payload,
                   CAST((CAST(check_digit AS INT) + 1) % 10 AS STRING))
               ELSE text END"""))
      seeded
        .select(col("source"), col("doc_id"),
          explode(expr("regexp_extract_all(text2, '[0-9]{13,16}', 0)")).as("cand"))
        .withColumn("luhn_total", expr("""
          aggregate(transform(sequence(1, length(cand)),
            i -> CAST(IF(i % 2 = 0,
                   IF(CAST(substring(cand, length(cand) - i + 1, 1) AS INT) * 2 > 9,
                      CAST(substring(cand, length(cand) - i + 1, 1) AS INT) * 2 - 9,
                      CAST(substring(cand, length(cand) - i + 1, 1) AS INT) * 2),
                   CAST(substring(cand, length(cand) - i + 1, 1) AS INT)) AS BIGINT)),
            0L, (a, x) -> a + x)"""))
        .withColumn("valid", col("luhn_total") % 10 === 0)
        .groupBy("source")
        .agg(count(lit(1)).as("n_candidates"),
          sum(when(col("valid"), 1L).otherwise(0L)).as("n_luhn_valid"),
          sum(when(!col("valid"), 1L).otherwise(0L)).as("n_luhn_rejected"),
          expr("sum(IF(luhn_total % 10 = 0, 1, 0)) * 10000 div count(1)")
            .as("naive_precision_bp"))
        .orderBy("source")
    },
    Some("""
      WITH seeded AS (
        SELECT source, doc_id,
               lpad(CAST(doc_id * 73 + 1000000 AS VARCHAR), 15, '1') AS payload
        FROM documents),
      sums AS (
        SELECT source, doc_id, payload,
               list_aggregate(list_transform(range(1, 16),
                 i -> CASE WHEN i % 2 = 1 THEN
                        CASE WHEN CAST(substr(payload, CAST(16 - i AS INTEGER), 1) AS INTEGER) * 2 > 9
                             THEN CAST(substr(payload, CAST(16 - i AS INTEGER), 1) AS INTEGER) * 2 - 9
                             ELSE CAST(substr(payload, CAST(16 - i AS INTEGER), 1) AS INTEGER) * 2 END
                      ELSE CAST(substr(payload, CAST(16 - i AS INTEGER), 1) AS INTEGER) END),
                 'sum') AS lsum
        FROM seeded),
      texts AS (
        SELECT s.source, s.doc_id,
               CASE WHEN s.doc_id % 7 = 0
                      THEN d.text || ' card ' || s.payload
                        || CAST((10 - m.lsum % 10) % 10 AS VARCHAR)
                    WHEN s.doc_id % 11 = 0
                      THEN d.text || ' ref ' || s.payload
                        || CAST(((10 - m.lsum % 10) % 10 + 1) % 10 AS VARCHAR)
                    ELSE d.text END AS text2
        FROM seeded s
        JOIN sums m USING (source, doc_id)
        JOIN documents d ON d.doc_id = s.doc_id),
      cands AS (
        SELECT source, unnest(regexp_extract_all(text2, '[0-9]{13,16}')) AS cand
        FROM texts),
      checked AS (
        SELECT source, cand,
               list_aggregate(list_transform(range(1, length(cand) + 1),
                 i -> CASE WHEN i % 2 = 0 THEN
                        CASE WHEN CAST(substr(cand, CAST(length(cand) - i + 1 AS INTEGER), 1) AS INTEGER) * 2 > 9
                             THEN CAST(substr(cand, CAST(length(cand) - i + 1 AS INTEGER), 1) AS INTEGER) * 2 - 9
                             ELSE CAST(substr(cand, CAST(length(cand) - i + 1 AS INTEGER), 1) AS INTEGER) * 2 END
                      ELSE CAST(substr(cand, CAST(length(cand) - i + 1 AS INTEGER), 1) AS INTEGER) END),
                 'sum') AS luhn_total
        FROM cands)
      SELECT source, count(*) AS n_candidates,
             CAST(sum(CASE WHEN luhn_total % 10 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_luhn_valid,
             CAST(sum(CASE WHEN luhn_total % 10 <> 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_luhn_rejected,
             CAST(sum(CASE WHEN luhn_total % 10 = 0 THEN 1 ELSE 0 END)
               * 10000 // count(*) AS BIGINT) AS naive_precision_bp
      FROM checked
      GROUP BY source
      ORDER BY source"""))

  /** READABILITY SCORING — the education-level quality feature (Flesch-
    * Kincaid grade) corpus filters use to band documents by complexity,
    * computed entirely in integer arithmetic so both engines agree
    * bit-for-bit: syllables ≈ non-overlapping vowel-group runs (the
    * standard regex heuristic), sentences = terminal-punctuation runs
    * floored at 1 (the fixture's word-soup text has none, so S=1 here —
    * the formula stays general), and the grade ×100 is one cross-
    * multiplied division (39·W² + 1180·Syll·S − 1559·S·W) div (S·W)
    * with q130's sign-split (Spark div truncates, DuckDB // floors —
    * they differ exactly on negatives). Everything is row-local codegen
    * off one documents scan — zero joins, zero explodes; the only
    * exchange is the presentation sort. Complements t2 (surface ratios)
    * and t15/t21 (LM surprisal) as the readability tier of the quality
    * battery. */
  val t59 = GraftQuery(
    "t59_readability",
    "Per-doc integer-exact Flesch-Kincaid grade ×100 from regex syllable/sentence counts",
    (s, dir) => {
      table(s, dir, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"),
          expr("CAST(size(split(trim(text), '\\\\s+')) AS BIGINT)").as("words"),
          expr("greatest(1L, CAST(regexp_count(text, '[.!?]+') AS BIGINT))")
            .as("sentences"),
          expr("CAST(regexp_count(lower(text), '[aeiouy]+') AS BIGINT)")
            .as("syllables"))
        .withColumn("num",
          expr("39 * words * words + 1180 * syllables * sentences - 1559 * sentences * words"))
        .withColumn("grade_x100",
          expr("CASE WHEN num >= 0 THEN num div (sentences * words) " +
            "ELSE -((-num) div (sentences * words)) END"))
        .select(col("doc_id"), col("words"), col("sentences"), col("syllables"),
          col("grade_x100"),
          expr("CASE WHEN grade_x100 < 800 THEN 'basic' " +
            "WHEN grade_x100 < 1600 THEN 'intermediate' " +
            "ELSE 'advanced' END").as("band"))
        .orderBy("doc_id")
    },
    Some("""
      WITH counts AS (
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                 AS words,
               greatest(1, CAST(len(regexp_extract_all(text, '[.!?]+'))
                 AS BIGINT)) AS sentences,
               CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                 AS BIGINT) AS syllables
        FROM documents WHERE length(trim(text)) > 0),
      scored AS (
        SELECT *,
               39 * words * words + 1180 * syllables * sentences
                 - 1559 * sentences * words AS num
        FROM counts)
      SELECT doc_id, words, sentences, syllables,
             CAST(CASE WHEN num >= 0 THEN num // (sentences * words)
                  ELSE -((-num) // (sentences * words)) END AS BIGINT)
               AS grade_x100,
             CASE WHEN (CASE WHEN num >= 0 THEN num // (sentences * words)
                        ELSE -((-num) // (sentences * words)) END) < 800
                    THEN 'basic'
                  WHEN (CASE WHEN num >= 0 THEN num // (sentences * words)
                        ELSE -((-num) // (sentences * words)) END) < 1600
                    THEN 'intermediate'
                  ELSE 'advanced' END AS band
      FROM scored
      ORDER BY doc_id"""))

  /** BPE MERGE ROUNDS — the tokenizer-TRAINING primitive (Sennrich et al.
    * ACL 2016) as pure dataflow, two rounds unrolled (t37's discipline:
    * iteration count is a constant, each round is one plan): the
    * vocabulary collapses to word TYPES with frequencies (the standard
    * BPE working set — Zipf-bounded, so every round runs at dimension
    * scale no matter the corpus), each type's symbol sequence is encoded
    * as a DOUBLE-SPACED string (' a  b  c ') so one literal `replace`
    * per round applies the chosen merge left-to-right non-overlapping —
    * exactly BPE's convention, and immune to symbol-suffix false matches
    * because every true boundary carries two spaces while symbol
    * interiors carry none. Per round: adjacent-pair counts (row-local
    * zip_with, explode, one Zipf-bounded shuffle), argmax pair by
    * (count DESC, pair ASC) — both engines replay the tie-break — then
    * the broadcast 1-row merge applies in codegen. Emits per round the
    * merge chosen, its count, and the post-merge vocabulary/instance
    * accounting that shows compression progressing. t56 evaluates a
    * FIXED tokenizer's fertility; t60 takes the training step that
    * produces one. */
  val t60 = GraftQuery(
    "t60_bpe_merges",
    "Two unrolled BPE merge rounds over the word-type vocabulary: argmax pair, apply, audit",
    (s, dir) => {
      val vocab = table(s, dir, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy("tok").agg(count(lit(1)).as("freq"))
      val r0 = vocab.select(col("tok"), col("freq"),
        concat(lit(" "), array_join(split(col("tok"), ""), "  "), lit(" ")).as("r"))
      def pairCounts(df: org.apache.spark.sql.DataFrame) = df
        .select(col("freq"), expr("split(trim(r), '  ')").as("l"))
        .select(col("freq"), explode(expr(
          "zip_with(slice(l, 1, size(l) - 1), slice(l, 2, size(l) - 1), " +
            "(x, y) -> struct(x AS a, y AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
      def best(df: org.apache.spark.sql.DataFrame) =
        pairCounts(df).orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
      def apply(df: org.apache.spark.sql.DataFrame,
          b: org.apache.spark.sql.DataFrame) = df
        .crossJoin(broadcast(b.select(col("a").as("ba"), col("b").as("bb"))))
        .select(col("tok"), col("freq"),
          expr("replace(r, ' ' || ba || '  ' || bb || ' ', " +
            "' ' || ba || bb || ' ')").as("r"))
      def audit(df: org.apache.spark.sql.DataFrame, round: Int,
          b: org.apache.spark.sql.DataFrame) = {
        val stats = df
          .select(col("freq"), expr("split(trim(r), '  ')").as("l"))
          .select(col("freq"), col("l"),
            explode(col("l")).as("sym"))
          .agg(countDistinct(col("sym")).as("vocab_symbols"),
            sum(expr("freq")).as("weighted_rows")) // per exploded symbol row
        // weighted_rows = Σ freq over symbol instances = total symbol
        // instances in the corpus after this round's merge
        stats.crossJoin(broadcast(b))
          .select(lit(round.toLong).as("round"), col("a").as("sym_a"),
            col("b").as("sym_b"), concat(col("a"), col("b")).as("merged"),
            col("cnt").as("pair_count"), col("vocab_symbols"),
            col("weighted_rows").as("symbol_instances"))
      }
      val b1 = best(r0)
      val r1 = apply(r0, b1)
      val b2 = best(r1)
      val r2 = apply(r1, b2)
      audit(r1, 1, b1).unionByName(audit(r2, 2, b2)).orderBy("round")
    },
    Some("""
      WITH tok AS (
        SELECT t AS token, CAST(count(*) AS BIGINT) AS freq
        FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS t
              FROM documents)
        WHERE length(t) > 0
        GROUP BY t),
      r0 AS (
        SELECT token, freq,
               ' ' || array_to_string(string_split(token, ''), '  ') || ' '
                 AS r
        FROM tok),
      p1 AS (
        SELECT l[i] AS a, l[i + 1] AS b, freq
        FROM (SELECT freq, string_split(trim(r), '  ') AS l,
                     unnest(generate_series(1, len(string_split(trim(r), '  ')) - 1))
                       AS i
              FROM r0)),
      c1 AS (SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt
             FROM p1 GROUP BY a, b),
      b1 AS (SELECT * FROM c1 ORDER BY cnt DESC, a, b LIMIT 1),
      r1 AS (
        SELECT token, freq,
               replace(r, ' ' || b1.a || '  ' || b1.b || ' ',
                       ' ' || b1.a || b1.b || ' ') AS r
        FROM r0, b1),
      s1 AS (
        SELECT CAST(count(DISTINCT sym) AS BIGINT) AS vocab_symbols,
               CAST(sum(freq) AS BIGINT) AS symbol_instances
        FROM (SELECT freq, unnest(string_split(trim(r), '  ')) AS sym
              FROM r1)),
      p2 AS (
        SELECT l[i] AS a, l[i + 1] AS b, freq
        FROM (SELECT freq, string_split(trim(r), '  ') AS l,
                     unnest(generate_series(1, len(string_split(trim(r), '  ')) - 1))
                       AS i
              FROM r1)),
      c2 AS (SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt
             FROM p2 GROUP BY a, b),
      b2 AS (SELECT * FROM c2 ORDER BY cnt DESC, a, b LIMIT 1),
      r2 AS (
        SELECT token, freq,
               replace(r, ' ' || b2.a || '  ' || b2.b || ' ',
                       ' ' || b2.a || b2.b || ' ') AS r
        FROM r1, b2),
      s2 AS (
        SELECT CAST(count(DISTINCT sym) AS BIGINT) AS vocab_symbols,
               CAST(sum(freq) AS BIGINT) AS symbol_instances
        FROM (SELECT freq, unnest(string_split(trim(r), '  ')) AS sym
              FROM r2))
      SELECT CAST(1 AS BIGINT) AS round, b1.a AS sym_a, b1.b AS sym_b,
             b1.a || b1.b AS merged, b1.cnt AS pair_count,
             s1.vocab_symbols, s1.symbol_instances
      FROM b1, s1
      UNION ALL
      SELECT CAST(2 AS BIGINT), b2.a, b2.b, b2.a || b2.b, b2.cnt,
             s2.vocab_symbols, s2.symbol_instances
      FROM b2, s2
      ORDER BY round"""))

  /** SUFFIX-STEM FAMILIES — Porter-lite stemming as the vocabulary-
    * folding tier between d19's ASCII canonicalization and a real
    * lemmatizer: five ordered suffix rules (sses→ss, ies→i, ing→∅,
    * ed→∅, s→∅; first match wins, stems shorter than 3 chars are left
    * alone — the classic guard) collapse inflected variants onto one
    * stem, and the report ranks stem FAMILIES (≥2 surviving variants)
    * by member count — the signal for whether search/dedup should fold
    * morphology. Entirely row-local CASE/substring codegen over the
    * Zipf-bounded vocabulary; the only exchanges are the two bounded
    * count aggs. Both engines evaluate the identical rule cascade, so
    * the fold is hash-checked end to end. */
  val t61 = GraftQuery(
    "t61_stem_families",
    "Porter-lite suffix stemming: top-20 stem families by variant count over the vocabulary",
    (s, dir) => {
      val base = table(s, dir, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy("tok").agg(count(lit(1)).as("freq"))
      // the word-soup fixture carries no organic inflections, so variants
      // are planted deterministically in BOTH engines (d19's synthesis
      // discipline): every base token of length >= 4 not already ending
      // in s contributes its -s / -ing / -ed forms; the operator's job is
      // to fold them back onto the seed
      val planted = base
        .filter(length(col("tok")) >= 4 && !col("tok").endsWith("s"))
        .select(explode(array(
          concat(col("tok"), lit("s")),
          concat(col("tok"), lit("ing")),
          concat(col("tok"), lit("ed")))).as("tok"),
          col("freq"))
      val vocab = base.unionByName(planted)
        .groupBy("tok").agg(sum("freq").as("freq"))
      val stemmed = vocab.withColumn("stem", expr(
        """CASE
           WHEN tok LIKE '%sses' AND length(tok) >= 7
             THEN substring(tok, 1, length(tok) - 2)
           WHEN tok LIKE '%ies' AND length(tok) >= 6
             THEN concat(substring(tok, 1, length(tok) - 3), 'i')
           WHEN tok LIKE '%ing' AND length(tok) >= 6
             THEN substring(tok, 1, length(tok) - 3)
           WHEN tok LIKE '%ed' AND length(tok) >= 5
             THEN substring(tok, 1, length(tok) - 2)
           WHEN tok LIKE '%s' AND NOT tok LIKE '%ss' AND length(tok) >= 4
             THEN substring(tok, 1, length(tok) - 1)
           ELSE tok END"""))
      stemmed.groupBy("stem")
        .agg(countDistinct("tok").as("n_variants"),
          sum("freq").as("total_freq"),
          min("tok").as("sample_variant"))
        .filter(col("n_variants") >= 2)
        .orderBy(col("n_variants").desc, col("total_freq").desc, col("stem"))
        .limit(20)
    },
    Some("""
      WITH base AS (
        SELECT t AS tok, CAST(count(*) AS BIGINT) AS freq
        FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS t
              FROM documents)
        WHERE length(t) > 0
        GROUP BY t),
      planted AS (
        SELECT tok || sfx AS tok, freq
        FROM base, (SELECT unnest(['s', 'ing', 'ed']) AS sfx)
        WHERE length(tok) >= 4 AND tok NOT LIKE '%s'),
      vocab AS (
        SELECT tok, CAST(sum(freq) AS BIGINT) AS freq
        FROM (SELECT * FROM base UNION ALL SELECT * FROM planted)
        GROUP BY tok),
      stemmed AS (
        SELECT tok, freq,
               CASE
                 WHEN tok LIKE '%sses' AND length(tok) >= 7
                   THEN substr(tok, 1, length(tok) - 2)
                 WHEN tok LIKE '%ies' AND length(tok) >= 6
                   THEN substr(tok, 1, length(tok) - 3) || 'i'
                 WHEN tok LIKE '%ing' AND length(tok) >= 6
                   THEN substr(tok, 1, length(tok) - 3)
                 WHEN tok LIKE '%ed' AND length(tok) >= 5
                   THEN substr(tok, 1, length(tok) - 2)
                 WHEN tok LIKE '%s' AND tok NOT LIKE '%ss' AND length(tok) >= 4
                   THEN substr(tok, 1, length(tok) - 1)
                 ELSE tok END AS stem
        FROM vocab)
      SELECT stem, count(DISTINCT tok) AS n_variants,
             CAST(sum(freq) AS BIGINT) AS total_freq,
             min(tok) AS sample_variant
      FROM stemmed
      GROUP BY stem
      HAVING count(DISTINCT tok) >= 2
      ORDER BY n_variants DESC, total_freq DESC, stem
      LIMIT 20"""))

  /** LEXICAL-DIVERSITY ENTROPY — the information-theoretic member of the
    * per-doc quality battery: Shannon entropy of each document's OWN
    * unigram distribution, H = ln n − Σ c·ln c / n over per-doc token
    * counts, and its exponential e^H = the doc's "effective vocabulary"
    * (perplexity of the doc against itself). Low H = looping/templated
    * text (a doc repeating one token has H=0 no matter how long), high H
    * near ln(n_types) = maximally spread usage — a signal the ratio
    * metrics can't fake: t9's dup-fraction sees COPIES, entropy sees
    * CONCENTRATION (a doc can have zero duplicate 5-grams yet spend 80%
    * of tokens on three words). Distinct from t28 (corpus Heaps growth),
    * t57 (corpus Zipf slope), t36 (corpus spectrum): those grade the
    * CORPUS, this grades each DOCUMENT. Dataflow: one explode to
    * (doc, token) counts — the same doc_id-keyed shuffle every t-entry
    * pays — then a per-doc aggregate in closed form; ln + round-4 is the
    * t15 discipline. The diversity band uses H normalized by its ln(n)
    * maximum (Pielou's evenness, in bp via floor). */
  val t62 = GraftQuery(
    "t62_lexical_entropy",
    "Per-doc Shannon entropy + effective vocabulary + Pielou evenness bands",
    (s, dir) => {
      val counts = table(s, dir, "documents")
        .select(col("doc_id"), explode(words(col("text"))).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      counts.groupBy("doc_id")
        .agg(sum("c").as("n"), count(lit(1)).as("n_types"),
          sum(expr("c * ln(c)")).as("clnc"))
        .select(col("doc_id"), col("n"), col("n_types"),
          round(expr("ln(n) - clnc / n"), 4).as("entropy"),
          round(expr("exp(ln(n) - clnc / n)"), 4).as("eff_vocab"),
          floor(expr(
            "CASE WHEN n_types = 1 THEN 10000.0 " +
              "ELSE (ln(n) - clnc / n) / ln(n_types) * 10000 END"))
            .cast("long").as("evenness_bp"))
        .orderBy("doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM documents),
      counts AS (
        SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
        FROM toks WHERE len(w) > 0 GROUP BY doc_id, w),
      agg AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS n_types,
               sum(c * ln(c)) AS clnc
        FROM counts GROUP BY doc_id)
      SELECT doc_id, n, n_types,
             round(ln(n) - clnc / n, 4) AS entropy,
             round(exp(ln(n) - clnc / n), 4) AS eff_vocab,
             CAST(floor(CASE WHEN n_types = 1 THEN 10000.0
               ELSE (ln(n) - clnc / n) / ln(n_types) * 10000 END) AS BIGINT)
               AS evenness_bp
      FROM agg
      ORDER BY doc_id"""))

  /** EXTRACTIVE SUMMARIZATION SCORING — centrality-based sentence
    * selection (TextRank's degree-centrality core, LexRank's overlap
    * graph): the 2 most CENTRAL lines of each document are the ones
    * sharing the most vocabulary with the rest of the document — the
    * standard way to mine summary/headline training pairs from raw
    * corpora without a model. Lines are the t14/t15 10-token convention;
    * centrality(line) = Σ over sibling lines of |shared distinct
    * tokens|, computed via a WITHIN-DOC token equi-join (doc-bounded:
    * the pair space never crosses documents, so the join is keyed on
    * (doc, token) and a document's cost is its own line count squared,
    * not the corpus's), then one window for top-2 with (score DESC, pos
    * ASC) tie-breaks. Single-line docs score 0 via the left join — kept,
    * because a pipeline must emit SOMETHING for them and dropping them
    * silently skews the pair mix. */
  val t63 = GraftQuery(
    "t63_extractive_summary",
    "Top-2 central lines per doc: within-doc shared-token centrality, TextRank-style",
    (s, dir) => {
      val lines = table(s, dir, "documents")
        .select(col("doc_id"), posexplode(expr(
          """transform(sequence(0, CAST(greatest(ceil(size(split(lower(text), ' ')) / 10.0), 1) AS INT) - 1),
               i -> array_join(slice(split(lower(text), ' '), i * 10 + 1, 10), ' '))"""))
          .as(Seq("pos", "line")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("line"))
      val toks = lines.select(col("doc_id"), col("pos"),
          explode(expr("array_distinct(split(line, ' '))")).as("w"))
        .filter(length(col("w")) > 0)
      // centrality WITHOUT the token self-join: a line's shared-token
      // score is sum over its tokens of (lines-in-doc containing the
      // token − 1) — exactly the partner count the (doc, w)-keyed
      // self-join produced per row, so the per-(doc, pos) sums are
      // identical (a token unique to one line contributes 0 either way;
      // all-zero lines surface with score 0 where the inner join dropped
      // them, which the downstream left-join coalesce already mapped to
      // 0). One (doc, w) window + one aggregate replaces the quadratic
      // within-doc token fan-out — the difference between O(tokens) and
      // O(Σ c_w²) rows at corpus scale.
      val centrality = toks
        .withColumn("cw",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy("doc_id", "w")))
        .groupBy("doc_id", "pos")
        .agg(sum(col("cw") - 1).as("score"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(desc("score"), col("pos"))
      lines.join(centrality, Seq("doc_id", "pos"), "left")
        .withColumn("score", coalesce(col("score"), lit(0L)))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 2)
        .select("doc_id", "rank", "pos", "score", "line")
        .orderBy("doc_id", "rank")
    },
    Some("""
      WITH toks0 AS MATERIALIZED (
        SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
      lines AS (
        SELECT doc_id, CAST(i AS BIGINT) AS pos,
               array_to_string(ws[i*10+1 : i*10+10], ' ') AS line
        FROM toks0, UNNEST(range(0, greatest(CAST(ceil(len(ws) / 10.0) AS BIGINT), 1))) t(i)),
      toks AS (
        SELECT DISTINCT doc_id, pos, unnest(string_split(line, ' ')) AS w
        FROM lines),
      toksf AS (SELECT * FROM toks WHERE len(w) > 0),
      centrality AS (
        SELECT a.doc_id, a.pos, CAST(count(*) AS BIGINT) AS score
        FROM toksf a JOIN toksf b
          ON a.doc_id = b.doc_id AND a.w = b.w AND a.pos <> b.pos
        GROUP BY a.doc_id, a.pos),
      ranked AS (
        SELECT l.doc_id, l.pos, coalesce(c.score, 0) AS score, l.line,
               row_number() OVER (PARTITION BY l.doc_id
                 ORDER BY coalesce(c.score, 0) DESC, l.pos) AS rank
        FROM lines l LEFT JOIN centrality c
          ON l.doc_id = c.doc_id AND l.pos = c.pos)
      SELECT doc_id, CAST(rank AS BIGINT) AS rank, pos,
             CAST(score AS BIGINT) AS score, line
      FROM ranked WHERE rank <= 2
      ORDER BY doc_id, rank"""))

  /** KNESER–NEY COUNT TABLES — the training artifact behind every
    * smoothed n-gram LM (Kneser & Ney 1995; Chen & Goodman's empirical
    * study made it the default): KN's insight is that a word's unigram
    * backoff weight should be its CONTINUATION count (how many DISTINCT
    * left contexts it follows) rather than its raw frequency — "Francisco"
    * is frequent but only ever follows "San", so it must not get backoff
    * mass. This entry emits the exact integer tables a KN estimator
    * consumes: per word, distinct-predecessor count N1+(·w), distinct-
    * successor count N1+(w·) (which scales the backoff-mass discount
    * D·N1+(w·)/c(w·)), total bigram mass in each role, and the
    * continuation probability numerator in bp over the distinct-bigram
    * universe. All counts from ONE bigram explode (t21's mechanics) —
    * two Zipf-bounded rollups full-outer-joined on the word; t21 SCORES
    * with a fixed interpolation, t64 produces the counts TRAINING
    * needs, exactly — no floats anywhere. */
  val t64 = GraftQuery(
    "t64_kneser_ney_counts",
    "Exact KN smoothing tables: continuation/successor counts + bp continuation probability",
    (s, dir) => {
      val ws = table(s, dir, "documents")
        .select(col("doc_id"), words(col("text")).as("ws"))
      val bi = ws.filter(size(col("ws")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(ws) - 1),
             i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))"""))
          .as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      val types = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      val asW2 = types.groupBy(col("w2").as("w"))
        .agg(count(lit(1)).as("n_prev_distinct"), sum("c").as("mass_as_w2"))
      val asW1 = types.groupBy(col("w1").as("w"))
        .agg(count(lit(1)).as("n_next_distinct"), sum("c").as("mass_as_w1"))
      val universe = types.agg(count(lit(1)).as("n_bigram_types"))
      asW2.join(asW1, Seq("w"), "full_outer")
        .select(col("w"),
          coalesce(col("n_prev_distinct"), lit(0L)).as("n_prev_distinct"),
          coalesce(col("n_next_distinct"), lit(0L)).as("n_next_distinct"),
          coalesce(col("mass_as_w2"), lit(0L)).as("mass_as_w2"),
          coalesce(col("mass_as_w1"), lit(0L)).as("mass_as_w1"))
        .filter(col("n_prev_distinct") + col("n_next_distinct") >= 5)
        .crossJoin(broadcast(universe))
        .withColumn("kn_cont_bp",
          expr("n_prev_distinct * 10000 div n_bigram_types"))
        .drop("n_bigram_types")
        .orderBy("w")
    },
    Some("""
      WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
                 FROM documents),
      bi AS (SELECT ws[CAST(i AS INTEGER)] AS w1,
                    ws[CAST(i + 1 AS INTEGER)] AS w2
             FROM w, UNNEST(range(1, len(ws))) AS t(i)
             WHERE len(ws) >= 2),
      types AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
                FROM bi GROUP BY w1, w2),
      as_w2 AS (SELECT w2 AS w, CAST(count(*) AS BIGINT) AS n_prev_distinct,
                       CAST(sum(c) AS BIGINT) AS mass_as_w2
                FROM types GROUP BY w2),
      as_w1 AS (SELECT w1 AS w, CAST(count(*) AS BIGINT) AS n_next_distinct,
                       CAST(sum(c) AS BIGINT) AS mass_as_w1
                FROM types GROUP BY w1),
      uni AS (SELECT CAST(count(*) AS BIGINT) AS n_bigram_types FROM types)
      SELECT coalesce(a.w, b.w) AS w,
             coalesce(a.n_prev_distinct, 0) AS n_prev_distinct,
             coalesce(b.n_next_distinct, 0) AS n_next_distinct,
             coalesce(a.mass_as_w2, 0) AS mass_as_w2,
             coalesce(b.mass_as_w1, 0) AS mass_as_w1,
             CAST(coalesce(a.n_prev_distinct, 0) * 10000 // uni.n_bigram_types
               AS BIGINT) AS kn_cont_bp
      FROM as_w2 a FULL JOIN as_w1 b ON a.w = b.w, uni
      WHERE coalesce(a.n_prev_distinct, 0) + coalesce(b.n_next_distinct, 0) >= 5
      ORDER BY w"""))

  /** TRAINED document classifier — multinomial Naive Bayes with add-one
    * smoothing, trained IN-ENGINE (the fastText-classifier role in a
    * training-data pipeline: lang-ID / quality routing by a model fit on
    * the corpus itself, not a heuristic): an 80/20 doc_id-modulus split,
    * per-(class, word) counts from the train split (one explode + one
    * digest-width groupBy — the model IS a DataFrame), then test docs
    * score every class as log P(c) + Σ_w n_d(w)·log((cnt_{c,w}+1)/(N_c+V))
    * and argmax with a fixed class-preference tiebreak on the ROUNDED
    * score (both engines round before comparing, so reduction-order ulp
    * noise can't flip a winner). t1 is the heuristic twin; this is the
    * learned one, and the oracle retrains the identical model — the whole
    * fit/score path is hash-checked. At 100 TB: the model table is
    * |V|·|classes| rows (broadcastable), scoring is one join + one
    * per-doc aggregate. */
  val t65 = GraftQuery(
    "t65_naive_bayes_langid",
    "In-engine-trained multinomial NB language classifier: 80/20 split, per-doc argmax, agreement",
    (s, dir) => {
      import s.implicits._
      val langs = Seq("en", "de", "fr", "es", "zh")
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), words(col("text")).as("ws"))
      val train = docs.filter(col("doc_id") % 5 =!= 0)
      val test = docs.filter(col("doc_id") % 5 === 0)
      val ttok = train.select(col("lang").as("c"), explode(col("ws")).as("w"))
      val counts = ttok.groupBy("c", "w").agg(count(lit(1)).as("cnt"))
      val classTot = ttok.groupBy("c").agg(count(lit(1)).as("nc"))
      val vocab = ttok.select("w").distinct().agg(count(lit(1)).as("v"))
      val priors = train.groupBy(col("lang").as("c"))
        .agg(count(lit(1)).as("ndocs"))
        .crossJoin(broadcast(train.agg(count(lit(1)).as("ntot"))))
      val pref = langs.zipWithIndex.toDF("c", "pos")
      val scored = test.select(col("doc_id"), col("lang"), explode(col("ws")).as("w"))
        .crossJoin(broadcast(pref))
        .join(counts, Seq("c", "w"), "left")
        .join(broadcast(classTot), "c")
        .crossJoin(broadcast(vocab))
        .groupBy(col("doc_id"), col("lang"), col("c"), col("pos"))
        .agg(sum(log((coalesce(col("cnt"), lit(0L)) + 1).cast("double") /
          (col("nc") + col("v")))).as("ll"))
        .join(broadcast(priors), "c")
        .withColumn("score",
          round(col("ll") + log(col("ndocs").cast("double") / col("ntot")), 4))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(desc("score"), col("pos"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("doc_id"), col("lang"), col("c").as("predicted"),
          (col("c") === col("lang")).as("agree"), col("score"))
        .orderBy("doc_id")
    },
    Some("""
      WITH docs AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS ws
                    FROM documents),
      train AS (SELECT * FROM docs WHERE doc_id % 5 <> 0),
      test AS (SELECT * FROM docs WHERE doc_id % 5 = 0),
      ttok AS (SELECT lang AS c, unnest(ws) AS w FROM train),
      counts AS (SELECT c, w, count(*) AS cnt FROM ttok GROUP BY c, w),
      classtot AS (SELECT c, count(*) AS nc FROM ttok GROUP BY c),
      vocab AS (SELECT count(DISTINCT w) AS v FROM ttok),
      priors AS (SELECT lang AS c, count(*) AS ndocs,
                        (SELECT count(*) FROM train) AS ntot
                 FROM train GROUP BY lang),
      pref AS (SELECT * FROM (VALUES ('en', 0), ('de', 1), ('fr', 2),
                                     ('es', 3), ('zh', 4)) AS t(c, pos)),
      ttest AS (SELECT doc_id, lang, unnest(ws) AS w FROM test),
      scored AS (
        SELECT tt.doc_id, tt.lang, p.c, p.pos,
               round(sum(ln(CAST(coalesce(cn.cnt, 0) + 1 AS DOUBLE)
                   / (ct.nc + vb.v)))
                 + ln(CAST(pr.ndocs AS DOUBLE) / pr.ntot), 4) AS score
        FROM ttest tt
        CROSS JOIN pref p
        LEFT JOIN counts cn ON cn.c = p.c AND cn.w = tt.w
        JOIN classtot ct ON ct.c = p.c
        CROSS JOIN vocab vb
        JOIN priors pr ON pr.c = p.c
        GROUP BY tt.doc_id, tt.lang, p.c, p.pos, pr.ndocs, pr.ntot),
      win AS (SELECT doc_id, lang, c, score,
                     row_number() OVER (PARTITION BY doc_id
                       ORDER BY score DESC, pos) AS rk
              FROM scored)
      SELECT doc_id, lang, c AS predicted, c = lang AS agree, score
      FROM win WHERE rk = 1
      ORDER BY doc_id"""))

  /** DSIR — data selection via importance resampling (Xie et al.,
    * NeurIPS 2023), the published scale answer to "pick the corpus
    * subset that looks like the target domain": hashed n-gram features
    * (here unigram digests folded into 64 buckets), bag-of-buckets
    * language models for target (the en slice, standing in for the
    * curated domain) and source (the whole corpus), per-doc importance
    * weight log w(d) = Σ_b n_d(b)·(log p̂_t(b) − log p̂_s(b)), then keep
    * the top-k. The bucket log-ratio table is 64 rows (broadcast
    * everywhere); the per-doc weight is one join + one aggregate — at
    * 100 TB the whole selector is two scans. Deterministic end to end
    * (hash buckets, add-one smoothing, 4 dp rounding before the rank cut)
    * → fully hash-checked; the selected set's en-enrichment is visible in
    * the output's lang column. */
  val t66 = GraftQuery(
    "t66_dsir_selection",
    "DSIR importance-weighted data selection: hashed-bucket LM ratio, top-200 docs",
    (s, dir) => {
      val tok = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), explode(words(col("text"))).as("w"))
        .withColumn("b", expr(
          "CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT) % 64"))
      val srcTot = tok.agg(count(lit(1)).as("ns"))
      val tgtTot = tok.filter(col("lang") === "en").agg(count(lit(1)).as("nt"))
      val ratios = tok.groupBy("b")
        .agg(count(lit(1)).as("cs"),
          count(when(col("lang") === "en", true)).as("ct"))
        .crossJoin(broadcast(srcTot)).crossJoin(broadcast(tgtTot))
        .select(col("b"),
          (log((col("ct") + 1).cast("double") / (col("nt") + 64)) -
            log((col("cs") + 1).cast("double") / (col("ns") + 64))).as("lr"))
      tok.join(broadcast(ratios), "b")
        .groupBy("doc_id", "lang")
        .agg(round(sum(col("lr")), 4).as("log_weight"))
        .orderBy(desc("log_weight"), col("doc_id"))
        .limit(200)
    },
    Some("""
      WITH tok AS (
        SELECT doc_id, lang,
               CAST(concat('0x', substr(md5(unnest(string_split(lower(text),
                 ' '))), 1, 8)) AS BIGINT) % 64 AS b
        FROM documents),
      tots AS (SELECT count(*) AS ns,
                      count(CASE WHEN lang = 'en' THEN 1 END) AS nt
               FROM tok),
      ratios AS (
        SELECT b,
               ln(CAST(count(CASE WHEN lang = 'en' THEN 1 END) + 1 AS DOUBLE)
                   / (tots.nt + 64))
                 - ln(CAST(count(*) + 1 AS DOUBLE) / (tots.ns + 64)) AS lr
        FROM tok, tots
        GROUP BY b, tots.ns, tots.nt)
      SELECT t.doc_id, t.lang, round(sum(r.lr), 4) AS log_weight
      FROM tok t JOIN ratios r USING (b)
      GROUP BY t.doc_id, t.lang
      ORDER BY log_weight DESC, t.doc_id
      LIMIT 200"""))

  /** FILL-IN-THE-MIDDLE training-example construction (Bavarian et al.,
    * "Efficient Training of Language Models to Fill in the Middle",
    * 2022) — the example-construction family's third member (t12 packs,
    * t19 chunks, this REARRANGES): each document splits into
    * (prefix, middle, suffix) at hash-derived cut points (a production
    * run draws them uniformly; the md5-of-doc_id derivation is the
    * m2/q256 labeled-stand-in discipline for randomness, making the
    * transform replayable cross-engine) and reassembles in PSM order
    * prefix ⊕ <MID> ⊕ suffix ⊕ <MID> ⊕ middle — the format the paper
    * shows teaches infilling "for free". Entirely row-local (one
    * projection, no shuffle before the audit rollup); the audit proves
    * the transform is LOSSLESS (every split reassembles to the original
    * word sequence) and reports the span-length profile per language. */
  val t67 = GraftQuery(
    "t67_fim_construction",
    "FIM (PSM) example construction: hash-derived splits, lossless audit, span profile",
    (s, dir) => {
      val d = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), words(col("text")).as("ws"))
        .withColumn("n", size(col("ws")))
        .filter(col("n") >= 12)
        // cut points: prefix ends at p1 ∈ [20%, 50%), middle ends at
        // p2 ∈ (p1, n) — both derived from md5(doc_id) so every engine
        // draws the same "random" split
        .withColumn("h", expr(
          "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"))
        .withColumn("p1", expr("1 + CAST(n * (20 + h % 30) AS BIGINT) div 100"))
        .withColumn("p2", expr("p1 + 1 + ((n - p1 - 1) * (h div 100 % 100)) div 100"))
        .withColumn("prefix", expr("slice(ws, 1, CAST(p1 AS INT))"))
        .withColumn("middle", expr("slice(ws, CAST(p1 + 1 AS INT), CAST(p2 - p1 AS INT))"))
        .withColumn("suffix", expr("slice(ws, CAST(p2 + 1 AS INT), CAST(n - p2 AS INT))"))
        .withColumn("psm", concat_ws(" ",
          expr("concat_ws(' ', prefix)"), lit("<MID>"),
          expr("concat_ws(' ', suffix)"), lit("<MID>"),
          expr("concat_ws(' ', middle)")))
        .withColumn("lossless", expr(
          "concat(prefix, middle, suffix) = ws"))
      d.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("lossless"), true)).as("n_lossless"),
          sum(expr("size(middle)").cast("long")).as("middle_words"),
          sum(col("n").cast("long")).as("total_words"),
          sum(length(col("psm")).cast("long")).as("psm_chars"))
        .withColumn("middle_bp", expr("middle_words * 10000 div total_words"))
        .select("lang", "n_docs", "n_lossless", "middle_bp", "psm_chars")
        .orderBy("lang")
    },
    Some("""
      WITH d0 AS (
        SELECT doc_id, lang, string_split(lower(text), ' ') AS ws
        FROM documents),
      d1 AS (SELECT doc_id, lang, ws, len(ws) AS n,
                    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                      AS BIGINT) AS h
             FROM d0 WHERE len(ws) >= 12),
      d2 AS (SELECT *,
                    1 + CAST(n * (20 + h % 30) AS BIGINT) // 100 AS p1
             FROM d1),
      d3 AS (SELECT *,
                    p1 + 1 + ((n - p1 - 1) * (h // 100 % 100)) // 100 AS p2
             FROM d2),
      d4 AS (SELECT lang, n, ws,
                    ws[1 : CAST(p1 AS INTEGER)] AS prefix,
                    ws[CAST(p1 + 1 AS INTEGER) : CAST(p2 AS INTEGER)] AS middle,
                    ws[CAST(p2 + 1 AS INTEGER) : CAST(n AS INTEGER)] AS suffix
             FROM d3),
      d5 AS (SELECT lang, n, ws, middle,
                    array_to_string(prefix, ' ') || ' <MID> ' ||
                      array_to_string(suffix, ' ') || ' <MID> ' ||
                      array_to_string(middle, ' ') AS psm,
                    list_concat(list_concat(prefix, middle), suffix) AS back
             FROM d4)
      SELECT lang, count(*) AS n_docs,
             count(CASE WHEN back = ws THEN 1 END) AS n_lossless,
             CAST(sum(len(middle)) AS BIGINT) * 10000
               // CAST(sum(n) AS BIGINT) AS middle_bp,
             CAST(sum(length(psm)) AS BIGINT) AS psm_chars
      FROM d5
      GROUP BY lang
      ORDER BY lang"""))

  /** In-engine BPE MERGE TRAINING (Sennrich et al. ACL'16) — the learned
    * tokenizer the text family's counting tiers (t3 whitespace, t20
    * ngrams) stop short of: learn the first 10 merge rules from the
    * corpus and audit the token-count reduction each rule buys.
    *
    * The split of work is the one production BPE trainers
    * (subword-nmt, HuggingFace tokenizers) actually use: the CORPUS pass
    * is distributed (word-type frequencies — the only step that touches
    * every row; the type table is Zipf-bounded at any corpus size), the
    * FIT is bounded model state on the driver (like s37's 64×64 Jacobi
    * or t65's NB table): iterate — count weighted adjacent symbol pairs
    * (overlapping, the BPE convention), merge the (max-freq,
    * lexicographically-least) pair, re-apply to the types.
    *
    * Merge application is defined as FOUR passes of literal
    * delimiter-string replacement (`" l r "` → `" lr "` on the
    * sentinel-spaced symbol string): leftmost non-overlapping per pass —
    * identical semantics in java.lang.String.replace and DuckDB
    * replace() — and four passes fully converge for the ≤ 8-symbol
    * fixture words (a pass merges at least one remaining occurrence;
    * NOTE this deviates from strictly-greedy BPE on odd runs of a
    * self-pair ≥ 5, where pass-1's consumed trailing delimiter shifts
    * which occurrences merge — same deviation both engines, so the hash
    * still proves the replay). Words restricted to ^[a-z]{2,}$ so
    * Scala's UTF-16 tie-break order equals DuckDB's byte order, and the
    * "l r" pair-string tie-break key is order-equal to the (l, r) tuple
    * because the space sorts below every letter.
    *
    * The oracle replays all 10 steps as chained CTEs — same counts, same
    * argmax, same 4-pass replace — so a wrong merge ORDER anywhere
    * cascades into different later counts and hash-fails. */
  val t68 = GraftQuery(
    "t68_bpe_merge_training",
    "BPE merge training: 10 learned rules (argmax pair, 4-pass replace), token counts audited per step",
    (s, dir) => {
      val types: Array[(String, Long)] = table(s, dir, "documents")
        .select(explode(words(col("text"))).as("w"))
        .filter(col("w").rlike("^[a-z]{2,}$"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      def replace4(str: String, pat: String, rep: String): String = {
        var x = str
        var i = 0
        while (i < 4) { x = x.replace(pat, rep); i += 1 }
        x
      }
      var syms: Array[(String, Long)] =
        types.map { case (w, f) => (" " + w.mkString(" ") + " ", f) }
      val rows = (1 to 10).map { k =>
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        syms.foreach { case (str, f) =>
          val ls = str.trim.split(" ")
          var i = 0
          while (i < ls.length - 1) {
            counts((ls(i), ls(i + 1))) =
              counts.getOrElse((ls(i), ls(i + 1)), 0L) + f
            i += 1
          }
        }
        val ((l, r), f) = counts.minBy { case ((a, b), c) => (-c, s"$a $b") }
        syms = syms.map { case (str, fq) =>
          (replace4(str, s" $l $r ", s" $l$r "), fq)
        }
        val tokensAfter = syms.iterator
          .map { case (str, fq) => str.trim.split(" ").length * fq }.sum
        (k.toLong, l, r, l + r, f, tokensAfter)
      }
      s.createDataFrame(rows)
        .toDF("step", "lhs", "rhs", "merged", "pair_freq", "tokens_after")
        .orderBy("step")
    },
    Some {
      val steps = (1 to 10).map { k =>
        s"""p$k AS MATERIALIZED (
             SELECT ls[CAST(i AS INT)] || ' ' || ls[CAST(i + 1 AS INT)] AS pair,
                    CAST(sum(freq) AS BIGINT) AS f
             FROM (SELECT freq, string_split(trim(s), ' ') AS ls FROM s${k - 1}),
                  UNNEST(range(1, len(ls))) AS u(i)
             GROUP BY 1),
           m$k AS MATERIALIZED (SELECT pair, f FROM p$k ORDER BY f DESC, pair LIMIT 1),
           s$k AS MATERIALIZED (
             SELECT freq,
                    replace(replace(replace(replace(s,
                      ' ' || m$k.pair || ' ', ' ' || replace(m$k.pair, ' ', '') || ' '),
                      ' ' || m$k.pair || ' ', ' ' || replace(m$k.pair, ' ', '') || ' '),
                      ' ' || m$k.pair || ' ', ' ' || replace(m$k.pair, ' ', '') || ' '),
                      ' ' || m$k.pair || ' ', ' ' || replace(m$k.pair, ' ', '') || ' ') AS s
             FROM s${k - 1}, m$k),
           r$k AS MATERIALIZED (
             SELECT CAST($k AS BIGINT) AS step,
                    string_split(pair, ' ')[1] AS lhs,
                    string_split(pair, ' ')[2] AS rhs,
                    replace(pair, ' ', '') AS merged,
                    f AS pair_freq,
                    (SELECT CAST(sum(len(string_split(trim(s), ' ')) * freq)
                       AS BIGINT) FROM s$k) AS tokens_after
             FROM m$k)"""
      }.mkString(",\n")
      val unions = (1 to 10).map(k => s"SELECT * FROM r$k").mkString("\n UNION ALL ")
      s"""
      WITH t AS (
        SELECT word, count(*) AS freq FROM (
          SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        WHERE regexp_matches(word, '^[a-z]{2,}$$')
        GROUP BY word),
      s0 AS MATERIALIZED (
        SELECT freq,
               ' ' || array_to_string(list_transform(
                 generate_series(1, len(word)),
                 i -> substr(word, CAST(i AS INT), 1)), ' ') || ' ' AS s
        FROM t),
      $steps
      $unions
      ORDER BY step"""
    })

  /** AHO–CORASICK MULTI-PATTERN SCAN (Aho & Corasick, CACM 1975) — the
    * blocklist/PII-term primitive at corpus scale: a single automaton
    * pass over each document counts EVERY pattern's occurrences at once,
    * O(text + matches) regardless of how many patterns the list holds —
    * against P per-pattern scans (or P `LIKE`s), the difference between
    * reading 100 TB once and reading it P times. The blocklist is
    * derived deterministically from the corpus (the 12 most frequent
    * `[a-z]{4,12}` tokens whose FIRST character never recurs inside the
    * token — that property makes self-overlapping occurrences
    * impossible, so the oracle's replace-based substring count is
    * exactly the automaton's match count). The automaton (goto trie +
    * BFS failure links + output counts collapsed through the fail
    * chain) builds once on the driver (~150 nodes) and rides the task
    * closure; the scan is mapPartitions (genuinely imperative per-char
    * state-machine work — the documented last-resort tier, like t31's
    * Misra-Gries pass), and only 12 aggregate rows ever shuffle.
    * Patterns that are substrings of other patterns are counted at
    * every end position through the fail chain — the property a naive
    * trie-only matcher silently loses. */
  val t69 = GraftQuery(
    "t69_aho_corasick",
    "Aho-Corasick blocklist scan: one automaton pass counts all patterns' occurrences, per-pattern doc/occurrence totals",
    (s, dir) => {
      import s.implicits._
      val pats: Array[String] = table(s, dir, "documents")
        .select(explode(words(col("text"))).as("w"))
        .filter(col("w").rlike("^[a-z]{4,12}$"))
        .filter(expr("instr(substring(w, 2), substring(w, 1, 1))") === 0)
        .groupBy("w").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("w")).limit(12)
        .collect().map(_.getString(0))
      // --- automaton build (driver-side; ~sum(|pattern|) nodes) ---
      val children = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.Map.empty[Char, Int])
      val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
      pats.zipWithIndex.foreach { case (p, pi) =>
        var v = 0
        p.foreach { c =>
          v = children(v).getOrElseUpdate(c, {
            children += scala.collection.mutable.Map.empty[Char, Int]
            ends += Nil
            children.length - 1
          })
        }
        ends(v) = pi :: ends(v)
      }
      val n = children.length
      val fail = new Array[Int](n)
      val outs: Array[List[Int]] = ends.toArray
      val queue = scala.collection.mutable.Queue.empty[Int]
      children(0).valuesIterator.foreach(queue.enqueue(_))
      while (queue.nonEmpty) {
        val v = queue.dequeue()
        children(v).foreach { case (c, u) =>
          var f = fail(v)
          while (f != 0 && !children(f).contains(c)) f = fail(f)
          fail(u) = if (children(f).contains(c) && children(f)(c) != u)
            children(f)(c) else 0
          outs(u) = outs(u) ++ outs(fail(u)) // fail-chain outputs collapse
          queue.enqueue(u)
        }
      }
      val goto: Array[Map[Char, Int]] = children.map(_.toMap).toArray
      val failA = fail
      val outsA: Array[Array[Int]] = outs.map(_.toArray)
      val nPats = pats.length
      // --- one pass per doc, all patterns at once ---
      val perDoc = table(s, dir, "documents")
        .select(col("doc_id"), lower(col("text")).as("t"))
        .as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (id, t) =>
            val counts = new Array[Long](nPats)
            var st = 0
            var i = 0
            while (i < t.length) {
              val c = t.charAt(i)
              while (st != 0 && !goto(st).contains(c)) st = failA(st)
              st = goto(st).getOrElse(c, 0)
              val os = outsA(st)
              var j = 0
              while (j < os.length) { counts(os(j)) += 1; j += 1 }
              i += 1
            }
            (id, counts)
          }
        }
        .flatMap { case (id, cs) =>
          cs.iterator.zipWithIndex.collect {
            case (c, pi) if c > 0 => (id, pi, c)
          }
        }
        .toDF("doc_id", "pi", "occ")
      val patDf = pats.zipWithIndex.map { case (p, i) => (i, p) }
        .toSeq.toDF("pi", "pat")
      perDoc.join(broadcast(patDf), "pi")
        .groupBy("pat")
        .agg(count(lit(1)).as("n_docs"), sum("occ").as("n_occ"))
        .orderBy("pat")
    },
    Some("""
      WITH p AS (
        SELECT word AS pat FROM (
          SELECT word, count(*) AS n FROM (
            SELECT unnest(string_split(lower(text), ' ')) AS word
            FROM documents)
          WHERE regexp_matches(word, '^[a-z]{4,12}$')
            AND instr(substr(word, 2), substr(word, 1, 1)) = 0
          GROUP BY word)
        ORDER BY n DESC, word LIMIT 12),
      d AS (SELECT doc_id, lower(text) AS t FROM documents),
      hits AS (
        SELECT p.pat,
               (length(d.t) - length(replace(d.t, p.pat, ''))) // length(p.pat)
                 AS occ
        FROM d CROSS JOIN p)
      SELECT pat, count(*) AS n_docs, CAST(sum(occ) AS BIGINT) AS n_occ
      FROM hits WHERE occ > 0
      GROUP BY pat
      ORDER BY pat"""))

  val all: Seq[GraftQuery] = Seq(t1, t2, t3, t4, t5, t6, t7, t8, t9, t10, t11,
    t12, t13, t14, t15, t16, t17, t18, t19, t20, t21, t22, t23, t24, t25, t26,
    t27, t28, t29, t30, t31, t32, t33, t34, t35, t36, t37, t38, t39, t40, t41,
    t42, t43, t44, t45, t46, t47, t48, t49, t50, t51, t52, t54, t55, t56, t57,
    t58, t59, t60, t61, t62, t63, t64, t65, t66, t67, t68, t69)
}
