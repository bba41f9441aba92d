package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` (BASELINE.json north star).
  *
  * Scale posture (100 TB): every variant reduces to hash → shuffle-on-key →
  * per-bucket work. Exact dedup groups on a 256-bit digest (never the full
  * text — the shuffle carries 32 bytes + ids, not documents). Near-dup
  * avoids the O(n²) all-pairs join by LSH banding (MinHash for Jaccard,
  * bit-bands for SimHash): candidates are generated only within hash
  * buckets, so the join fan-out follows the true duplicate density, not n².
  * The exact all-pairs variant (d3) is deliberately bounded to a small
  * doc_id range — it exists as the oracle-checkable ground truth for the
  * LSH path, and is flagged un-scalable by construction.
  */
object Dedup {

  /** Words of the lowercased text. */
  private def words(c: Column): Column = split(lower(c), " ")

  /** Canonicalization key for exact dedup: here the 5-word prefix (the
    * fixture's near-duplicates share prefixes); production would use the
    * whole normalized text. Grouping happens on the sha2 digest so the
    * shuffle key is fixed-width. */
  private def canonKey(c: Column): Column =
    sha2(concat_ws(" ", slice(words(c), 1, 5)), 256)

  /** 3-word shingles (distinct) of a text column. */
  private def shingles(c: Column): Column = {
    val w = words(c)
    array_distinct(transform(
      sequence(lit(0), size(w) - 3),
      i => concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3))))
  }

  /** Exact (canonicalized) dedup: hash-groupBy, keep the smallest doc_id.
    * Reference hook: the distinct() dirname dedup of A13 generalized to
    * content identity. */
  val d1 = GraftQuery(
    "d1_exact_dedup",
    "Exact dedup by content digest: keeper doc_id + copy count per canonical key",
    (s, dir) =>
      table(s, dir, "documents")
        .groupBy(canonKey(col("text")).as("key"))
        .agg(
          min("doc_id").as("doc_id"),
          count(lit(1)).as("n_copies"))
        .select("doc_id", "n_copies")
        .orderBy("doc_id"),
    Some("""
      SELECT min(doc_id) AS doc_id, count(*) AS n_copies
      FROM (SELECT doc_id,
                   array_to_string(string_split(lower(text), ' ')[1:5], ' ') AS key
            FROM documents)
      GROUP BY key
      ORDER BY doc_id"""))

  /** MinHash + LSH banding near-dup detection.
    *
    * signature[j] = min over shingles of xxhash64(j || shingle) — the
    * "hash with seed j" formulation avoids modular arithmetic entirely
    * (no overflow under ANSI, stays in codegen). 64 hashes × 16 bands ×
    * 4 rows; band-bucket equi-join generates candidates, exact Jaccard
    * over shingle sets confirms. Hash values are engine-specific → no SQL
    * oracle (d3 is the oracle-checked ground truth on a subset).
    */
  val d2 = GraftQuery(
    "d2_minhash_lsh",
    "MinHash(64) + LSH(16 bands × 4) candidate generation + exact-Jaccard confirm ≥ 0.5",
    (s, dir) => {
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), shingles(col("text")).as("sh"))
        .filter(size(col("sh")) > 0)
      val sig = docs.withColumn("sig",
        transform(sequence(lit(0), lit(63)),
          j => array_min(transform(col("sh"),
            sh => xxhash64(concat(j.cast("string"), lit("_"), sh))))))
      val banded = sig.select(
        col("doc_id"), col("sh"),
        posexplode(transform(sequence(lit(0), lit(15)),
          b => xxhash64(concat_ws(",",
            element_at(col("sig"), b * 4 + 1).cast("string"),
            element_at(col("sig"), b * 4 + 2).cast("string"),
            element_at(col("sig"), b * 4 + 3).cast("string"),
            element_at(col("sig"), b * 4 + 4).cast("string")))))
      ).withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      val left = banded.select(col("band"), col("bucket"), col("doc_id").as("doc1"), col("sh").as("sh1"))
      val right = banded.select(col("band"), col("bucket"), col("doc_id").as("doc2"), col("sh").as("sh2"))
      left.join(right, Seq("band", "bucket"))
        .filter(col("doc1") < col("doc2"))
        .select(col("doc1"), col("doc2"), col("sh1"), col("sh2"))
        .distinct()
        .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))).cast("long"))
        .withColumn("un", (size(col("sh1")) + size(col("sh2")) - col("inter")).cast("long"))
        .withColumn("jaccard", round(col("inter").cast("double") / col("un"), 4))
        .filter(col("inter").cast("double") / col("un") >= 0.5)
        .select("doc1", "doc2", "inter", "un", "jaccard")
        .orderBy("doc1", "doc2")
    },
    None)

  /** Exact n-gram Jaccard near-dup on a bounded subset — the ground truth
    * for d2, fully oracle-checked. The shingle equi-join is O(pairs sharing
    * a shingle): acceptable for the bounded range, replaced by d2's LSH at
    * scale (see object doc).
    */
  val d3 = GraftQuery(
    "d3_ngram_jaccard",
    "Exact 3-gram Jaccard pairs ≥ 0.5 over doc_id < 300 (LSH ground truth)",
    (s, dir) => {
      val sh = table(s, dir, "documents")
        .filter(col("doc_id") < 300)
        .select(col("doc_id"), explode(shingles(col("text"))).as("s"))
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = sh.as("a").join(sh.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.select(col("doc_id").as("doc1"), col("n").as("n1")), "doc1")
        .join(sizes.select(col("doc_id").as("doc2"), col("n").as("n2")), "doc2")
        .withColumn("un", (col("n1") + col("n2") - col("inter")).cast("long"))
        .filter(col("inter").cast("double") / col("un") >= 0.5)
        .select(col("doc1"), col("doc2"), col("inter"), col("un"),
          round(col("inter").cast("double") / col("un"), 4).as("jaccard"))
        .orderBy("doc1", "doc2")
    },
    Some("""
      WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
                 FROM documents WHERE doc_id < 300),
      sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
             FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i)),
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS inter
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
      SELECT doc1, doc2, inter, (na.n + nb.n - inter) AS un,
             round(CAST(inter AS DOUBLE) / (na.n + nb.n - inter), 4) AS jaccard
      FROM inter
      JOIN sizes na ON na.doc_id = doc1
      JOIN sizes nb ON nb.doc_id = doc2
      WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.5
      ORDER BY doc1, doc2"""))

  /** SimHash near-dup: 64-bit signature from per-word hash bit votes, then
    * 4 × 16-bit band join + Hamming-distance confirm (bit_count(xor) ≤ 8).
    * Banding guarantees recall for distance ≤ 3 and is probabilistic above —
    * standard SimHash ANN semantics. Hash-specific → rows-only check. */
  val d4 = GraftQuery(
    "d4_simhash",
    "SimHash(64-bit) + 16-bit band LSH + Hamming ≤ 8 confirm",
    (s, dir) => {
      val tok = table(s, dir, "documents")
        .select(col("doc_id"), explode(words(col("text"))).as("w"))
        .withColumn("h", xxhash64(col("w")))
      val voteExprs = (0 until 64).map { j =>
        sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j")
      }
      val votes = tok.groupBy("doc_id").agg(voteExprs.head, voteExprs.tail: _*)
      val sim = votes.select(col("doc_id"),
        (0 until 64).map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
      val banded = sim.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map(k =>
          shiftrightunsigned(col("simhash"), k * 16).bitwiseAND(0xFFFFL)): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      val l = banded.select(col("band"), col("bucket"), col("doc_id").as("doc1"), col("simhash").as("h1"))
      val r = banded.select(col("band"), col("bucket"), col("doc_id").as("doc2"), col("simhash").as("h2"))
      l.join(r, Seq("band", "bucket"))
        .filter(col("doc1") < col("doc2"))
        .select("doc1", "doc2", "h1", "h2")
        .distinct()
        .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))).cast("long"))
        .filter(col("hamming") <= 8)
        .select("doc1", "doc2", "hamming")
        .orderBy("doc1", "doc2")
    },
    None)

  val all: Seq[GraftQuery] = Seq(d1, d2, d3, d4)
}
