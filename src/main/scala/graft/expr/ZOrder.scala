package graft.expr

/** Z-order (Morton) keys as portable integer SQL — the multi-dimensional
  * clustering lever for the 100 TB layout. A single-key sort gives
  * range-pruning on one dimension only (LayoutSpec's `trade_date`/key
  * sort); interleaving the bits of two dimensions gives every layout
  * granule (parquet file / row group) a bounded range in BOTH, so a box
  * predicate `secid IN range AND minute IN range` skips granules on
  * either dimension — ClickHouse reaches the same effect with a
  * composite ORDER BY only when the leading key is selective; z-order
  * does not privilege either dimension.
  *
  * The key is a pure bit-arithmetic expression (shifts, masks, adds) so
  * it stays inside WholeStageCodegen on the Spark side and is verbatim
  * (modulo the shift spelling) in DuckDB — the `layout_zorder_key` entry
  * holds both engines to identical keys.
  */
object ZOrder {

  /** Interleaved 2-D Morton key: bit i of `a` lands at position 2i, bit
    * i of `b` at 2i+1. `bits` bounds both inputs (< 2^bits); the result
    * is < 2^(2·bits). `shiftR` supplies the dialect's right-shift
    * spelling (Spark `shiftright(x, i)`, DuckDB `(x >> i)`), the same
    * seam as [[graft.llm.Text.simhashBalanceSql]].
    */
  def zkeySql(a: String, b: String, bits: Int, shiftR: (String, Int) => String): String = {
    require(bits >= 1 && bits <= 31, "1..31 bits per dimension fit a BIGINT key")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        s"((${shiftR(a, i)}) & 1) * CAST(${1L << (2 * i)} AS BIGINT)",
        s"((${shiftR(b, i)}) & 1) * CAST(${1L << (2 * i + 1)} AS BIGINT)")
    }
    terms.mkString("(", " + ", ")")
  }

  val sparkShift: (String, Int) => String = (e, i) => s"shiftright($e, $i)"
  val duckShift: (String, Int) => String = (e, i) => s"($e >> $i)"
}
