package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable building blocks.
  *
  * Everything here is (a) deterministic across JVMs/executors — no
  * `hashCode`, no `Math.random` — and (b) reproducible in ANSI-ish SQL
  * (DuckDB) for the correctness oracle. The portable hash family is
  * md5-based: Spark `md5` and DuckDB `md5` both emit lowercase hex, so
  * lexicographic MIN over hex digests and hex-prefix→int parsing agree
  * bit-for-bit across engines.
  *
  * All helpers compose codegen'd built-ins (no UDFs) so they stay
  * inside WholeStageCodegen at 100 TB.
  */
object Portable {

  /** Lowercase md5 hex digest of a string column.
    * DuckDB: `md5(x)` */
  def md5hex(c: Column): Column = md5(c.cast("binary"))

  /** 60-bit non-negative portable hash: first 15 hex chars of md5.
    * DuckDB: `('0x' || substring(md5(x),1,15))::BIGINT` */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** 16-bit portable hash (for compact simhash fingerprints).
    * DuckDB: `('0x' || substring(md5(x),1,4))::BIGINT` */
  def hash16(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 4), 16, 10).cast("long")

  /** Seeded md5 digest — the k "hash functions" of minhash are
    * md5 over a seed-prefixed value.
    * DuckDB: `md5(seed || '|' || x)` */
  def seededMd5(seed: Int, c: Column): Column =
    md5(concat(lit(s"$seed|"), c).cast("binary"))

  /** Whitespace tokenization after trim; empty text → empty array.
    * DuckDB: `regexp_split_to_array(trim(x), '\s+')` (with the same
    * empty-string guard). */
  def words(c: Column): Column = {
    val t = trim(c)
    when(t === "", array().cast("array<string>")).otherwise(split(t, "\\s+"))
  }

  /** Word n-shingles joined by a single space; fewer than n words →
    * empty array. Pure map-side (no explode needed by callers that
    * aggregate with array_min etc.).
    * DuckDB: list_transform(generate_series(1, greatest(len(w)-n+1,0)),
    *           i -> array_to_string(w[i:i+n-1], ' ')) */
  def shingles(c: Column, n: Int): Column = {
    val w = words(c)
    when(size(w) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", slice(w, i + lit(1), lit(n)))))
  }

  /** One minhash signature component: lexicographic min of seeded md5
    * over the doc's shingles. NULL for shingle-less docs.
    * DuckDB: `list_min(list_transform(sh, s -> md5(seed || '|' || s)))` */
  def minhash(shingleCol: Column, seed: Int): Column =
    array_min(transform(shingleCol, s => md5(concat(lit(s"$seed|"), s).cast("binary"))))

  /** Normalization used before exact-dup hashing: lowercase, collapse
    * whitespace runs to single spaces, trim.
    * DuckDB: `trim(regexp_replace(lower(x), '\s+', ' ', 'g'))` */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Dot product of two double-array columns (cast upstream).
    * DuckDB: `list_dot_product(a::DOUBLE[], b::DOUBLE[])` or explicit
    * list_sum(list_transform(...)). Sequential left-to-right sum. */
  def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity of two float-array columns; computed in double.
    * DuckDB: list_cosine_similarity(a::DOUBLE[], b::DOUBLE[]) */
  def cosineD(a: Column, b: Column): Column = {
    val ad = transform(a, _.cast("double"))
    val bd = transform(b, _.cast("double"))
    dotD(ad, bd) / (sqrt(dotD(ad, ad)) * sqrt(dotD(bd, bd)))
  }
}
