package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{CharCodeSum, DotProduct, MinHashSignature, NGrams, ShingleJaccard, SimHash64}

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions as SQL functions, so a pure-SQL user of the library
  * (e.g. a notebook running `spark.sql(...)`) gets the same codegen'd
  * kernels as the DataFrame API — no UDF tax, no Scala required:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * SELECT dot_product(a.embedding, b.embedding) FROM ...
  * }}}
  *
  * This is the extension seam the reference exposes through Glue job
  * parameters (`gluettalax.py:254` — the job's SQL runs against whatever
  * functions the remote Spark registers); our engine registers them
  * in-process. Injection happens at session build, so the functions are
  * present on every cloned session (`newSession`, streaming query sessions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, "", name, usage, "", "", "", "", "", "", "internal")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // custom physical operator: grouped top-k via partial/final bounded
    // heaps (no sort, map-side k-pruning) — see graft.plans.GroupedTopK
    ext.injectPlannerStrategy(_ => graft.plans.GroupedTopKStrategy)
    // custom physical operator: backward-inclusive as-of join as one
    // co-partitioned streaming merge — see graft.plans.AsOfJoin (q213)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // optimizer rewrite: the textbook row_number-filter SQL idiom plans
    // through the operator above with no API change (q122 proves it)
    ext.injectOptimizerRule(_ => graft.plans.RankFilterToGroupedTopK)
    // companion rewrite: eliminates the sort-forcing WindowGroupLimit
    // residue Spark's LATERAL decorrelation leaves below the rewritten
    // operator (q144 proves it)
    ext.injectOptimizerRule(_ => graft.plans.RedundantGroupLimitBelowTopK)
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "_FUNC_(a, b) - dot product of two float/double arrays (codegen)"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "_FUNC_(text) - 64-permutation MinHash signature of 3-word shingles"),
      (args: Seq[Expression]) => MinHashSignature(args.head, 64, 7)))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "_FUNC_(text) - 64-bit SimHash of the whitespace tokens"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    ext.injectFunction((FunctionIdentifier("shingle_jaccard"),
      info("shingle_jaccard", "_FUNC_(a, b) - exact 3-gram Jaccard struct(inter, un, jaccard)"),
      (args: Seq[Expression]) => ShingleJaccard(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("char_code_sum"),
      info("char_code_sum", "_FUNC_(s) - sum of Unicode code points (codegen)"),
      (args: Seq[Expression]) => CharCodeSum(args.head)))
    ext.injectFunction((FunctionIdentifier("ngrams"),
      info("ngrams", "_FUNC_(text, n) - table function: one (pos, ngram) row per word n-gram"),
      (args: Seq[Expression]) =>
        NGrams(args(0), args(1).eval().asInstanceOf[Number].intValue())))
  }
}
