package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar expression library — the Spark restatement of the reference's
  * per-row function surface (`FormatUtil`, itdb2html.py:113-179, SURVEY §2.8).
  *
  * Everything here is composed from `org.apache.spark.sql.functions._`
  * built-ins so the whole surface stays inside whole-stage codegen: no Scala
  * UDF appears on any hot path, every expression is evaluated columnar and
  * is usable both from the DataFrame API and (via identical SQL text) from
  * `spark.sql`. At 100 TB these are pure map-side expressions — no shuffle,
  * no driver involvement.
  */
object Exprs {

  /** X1 (itdb2html.py:120-122, 268-271): star bucket from a 0..100 rating,
    * null → 0. `floor` keeps MySQL's CASE/FLOOR semantics.
    */
  def stars(rating: Column): Column =
    coalesce(floor(rating / 20), lit(0)).cast("long")

  /** Harness analogue of X1: l_discount ∈ [0, 0.1] → 0..5 buckets.
    * Same coalesce∘floor shape as the reference's rating → stars.
    */
  def starsFromDiscount(discount: Column): Column =
    coalesce(floor(discount * 50), lit(0)).cast("long")

  /** X2 (itdbloader.py:292): inverse mapping stars → rating. */
  def ratingFromStars(s: Column): Column = (s * 20).cast("long")

  /** X3 (itdb2html.py:124-131): milliseconds → "h:mm:ss" with leading hours
    * stripped when zero. Deliberate deviation: the reference's
    * `lstrip("0:")` also eats a zero MINUTES field (5000 ms → "5" there,
    * "0:05" here, and 0 ms → "" there) — that collapses distinct durations
    * to the same display, so this engine keeps the unambiguous "m:ss" floor.
    * The DuckDB oracle implements this form, so parity is engine-vs-oracle
    * exact.
    */
  def formatTime(ms: Column): Column = {
    val totalSec = (ms / 1000).cast("long")
    val h = (totalSec / 3600).cast("long")
    val m = ((totalSec % 3600) / 60).cast("long")
    val s = (totalSec % 60).cast("long")
    when(h > 0,
      concat(h.cast("string"), lit(":"), lpad(m.cast("string"), 2, "0"),
        lit(":"), lpad(s.cast("string"), 2, "0")))
      .otherwise(concat(m.cast("string"), lit(":"), lpad(s.cast("string"), 2, "0")))
  }

  /** X4 (itdb2html.py:63-71): sanitize to [A-Za-z0-9-_.], empty → "_NONE_". */
  def sanitizeFilename(c: Column): Column = {
    val cleaned = regexp_replace(c, "[^A-Za-z0-9-_.]", "_")
    when(length(coalesce(c, lit(""))) === 0, lit("_NONE_")).otherwise(cleaned)
  }

  /** X20: last path component (basename). */
  def basename(path: Column): Column = element_at(split(path, "/"), -1)

  /** X20: all but last path component (dirname). */
  def dirname(path: Column): Column =
    regexp_replace(path, "/[^/]*$", "")

  /** Portable deterministic hash used by dedup/minhash/simhash: hex md5 of
    * (seed ++ value). Lexicographic order of fixed-width hex == numeric order
    * of the underlying 128-bit value, so `min` over these strings is a valid
    * minhash — and the identical expression exists in any ANSI engine with
    * md5(), which keeps every dedup operator oracle-checkable.
    */
  def seededHash(seed: String, c: Column): Column =
    md5(concat(lit(seed + ":"), c))

  /** Hex digit → 0..15 (ascii arithmetic — portable to any engine with
    * ascii(); used for simhash bit extraction and LSH plane signs).
    */
  def hexVal(c: Column): Column = {
    val a = ascii(c)
    when(a >= 97, a - 87).otherwise(a - 48)
  }

  /** Exact decimal-routed sum of a money-ish double column, returned as
    * double: decimal addition is associative, so the result is identical
    * under any partial-aggregation order AND identical across engines —
    * double-summation order differences can't leak into oracle compares.
    */
  def exactSum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Whitespace tokenization shared by the text-analysis operators. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Word k-shingles of a token array: array of space-joined k-grams.
    * Built from sequence+transform+slice so it stays codegen'd (no UDF/UDTF);
    * this is the generator surface the reference expresses with Python loops
    * (dedup.py:146-154 similar-name variants are the same explode shape).
    */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) < k, array(array_join(toks, " ")))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (k - 1)),
        i => array_join(slice(toks, i, lit(k)), " ")))

  /** Sequential-fold dot product of two double-array columns —
    * deterministic, matching a row-at-a-time oracle engine's fold order.
    * Backed by the native codegen'd expression (graft.plans.DotProductExpr);
    * the builtin `aggregate∘zip_with` form computes the identical value but
    * runs interpreted and allocates per pair.
    */
  def dotProduct(a: Column, b: Column): Column =
    graft.plans.VectorExprs.dotProductNative(a, b)

  /** Float embedding → double vector (for carrying through joins with a
    * precomputed norm — see doubleVectorWithNorm callers).
    */
  def doubleVector(v: Column): Column = transform(v, x => x.cast("double"))

  /** L2 norm of a double-array column (single sequential fold). */
  def l2Norm(v: Column): Column = sqrt(dotProduct(v, v))

  /** Cosine similarity of two float-array embeddings, computed in double
    * precision with a single sequential fold (deterministic, matches a
    * row-at-a-time oracle). zip_with + aggregate are codegen'd builtins;
    * at scale this is a pure map-side expression.
    */
  def cosine(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    val dot = dotProduct(ad, bd)
    val na = sqrt(dotProduct(ad, ad))
    val nb = sqrt(dotProduct(bd, bd))
    dot / (na * nb)
  }

  /** X7 (itdb2html.py:170-171): HTML entity escape for the render surface. */
  def escapeHtml(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      c, "&", "&amp;"), "<", "&lt;"), ">", "&gt;"), "\"", "&quot;")

  /** X22 (itdb2html.py:133-149): star-rating display string — filled stars
    * then empty to 5 (the reference emits img tags; same per-row function
    * shape, text form).
    */
  def starsDisplay(s: Column): Column =
    concat(repeat(lit("★"), s.cast("int")), repeat(lit("☆"), (lit(5) - s).cast("int")))

  /** A10 (itdb2html.py:90-98): gated weighted mean "quality" — 0 unless at
    * least one item is rated AND rated*5 >= total (the reference's exact
    * integer gate `tot < 1 or (tot * 5) < sum(stars)` inverted — i.e. at
    * least 20% rated, boundary inclusive); otherwise Σ(s·n_s)/Σ(n_s) over
    * s=1..5. Exact integer arithmetic, no double-compare boundary drift.
    * Operates on the 6 pivoted star-count columns (A9).
    */
  def quality(s0: Column, s1: Column, s2: Column, s3: Column, s4: Column, s5: Column): Column = {
    val rated = s1 + s2 + s3 + s4 + s5
    val total = s0 + rated
    val weighted = s1 * 1 + s2 * 2 + s3 * 3 + s4 * 4 + s5 * 5
    when(rated >= 1 && rated * 5 >= total,
      weighted.cast("double") / rated.cast("double")).otherwise(lit(0.0))
  }
}
