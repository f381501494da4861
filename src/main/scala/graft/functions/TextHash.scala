package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftvec.TextHashColumns

/** One-pass text-hash kernels (native codegen expressions — see
  * [[org.apache.spark.sql.graftvec.TextHashImpl]] for the parity
  * contract). These replace the posexplode → window-lead → groupBy
  * shingle pipeline: the whole minhash signature is computed map-side
  * per document, so the dedup family's only shuffle is the band join.
  */
object TextHash {
  /** k-component KM minhash signature over word n-shingles
    * (array<long>, null when the doc has fewer than n words). */
  def kmMinHash(text: Column, n: Int, k: Int): Column =
    TextHashColumns.kmMinHash(text, n, k)

  /** Distinct word n-shingle set (array<string>). */
  def distinctShingles(text: Column, n: Int): Column =
    TextHashColumns.distinctShingles(text, n)

  /** Every word n-shingle in order, duplicates kept (array<string>) —
    * the multiset form n-gram counting explodes. */
  def allShingles(text: Column, n: Int): Column =
    TextHashColumns.allShingles(text, n)

  /** 16-bit simhash fingerprint (long, null when the doc has no words). */
  def simHash16(text: Column): Column = TextHashColumns.simHash16(text)

  /** Width-parameterized simhash (width ≤ 32) — the fingerprint-width
    * knob for Hamming-radius search (d10); see graftvec.SimHashW. */
  def simHashW(text: Column, width: Int): Column =
    TextHashColumns.simHashW(text, width)

  /** Content-defined chunk fingerprints (array<long>, ~div words per
    * chunk) for sub-document dedup (d11); see graftvec.CdcChunks. */
  def cdcChunks(text: Column, div: Int): Column =
    TextHashColumns.cdcChunks(text, div)
}
