package graft.sources

/** DELETION VECTOR byte format + algebra — row-level deletes WITHOUT
  * file rewrites (the Delta deletion-vector / Iceberg positional-delete
  * shape, reimplemented from the public format docs' *semantics*, not
  * their encodings). A DV marks row POSITIONS of one immutable parquet
  * file as deleted; readers anti-filter `_metadata.row_index` against
  * the file's DV, and the physical bytes leave disk only when a rewrite
  * (purge/compaction) materializes the deletes and vacuum retention
  * reaps the old file — the same two-phase purge contract as
  * [[FileManifest.deleteRange]].
  *
  * Encoding: the sorted distinct row positions as BIG-ENDIAN 4-byte
  * ints, concatenated. No varint/bitmap framing on purpose — the raw
  * array is DIRECTLY binary-searchable with zero deserialization, so
  * the per-row read-side probe is O(log n_deleted) over the manifest's
  * binary cell with no per-batch decode step and no library
  * dependency. At the write-side threshold (a file whose deleted
  * fraction exceeds `maxDvFraction` is rewritten instead — see
  * [[FileManifest.deleteRangeDV]]) a DV stays a small fraction of its
  * file's footprint: 4 bytes/deleted row vs a full row rewrite.
  *
  * Positions are ints: one parquet file holding ≥ 2^31 rows is outside
  * any sane file-sizing regime (row groups alone cap far below), and
  * [[serialize]] fails loud rather than truncate.
  */
object DeletionVectors {

  /** Sorted distinct positions -> DV bytes. Input need not be sorted or
    * distinct; negatives and > Int.MaxValue positions fail loud.
    */
  def serialize(positions: Array[Long]): Array[Byte] = {
    val sorted = positions.distinct.sorted
    val out = new Array[Byte](sorted.length * 4)
    var i = 0
    while (i < sorted.length) {
      val p = sorted(i)
      require(p >= 0 && p <= Int.MaxValue,
        s"deletion-vector position $p out of [0, 2^31) — a parquet file " +
          "cannot hold that row index")
      val v = p.toInt
      out(i * 4) = (v >>> 24).toByte
      out(i * 4 + 1) = (v >>> 16).toByte
      out(i * 4 + 2) = (v >>> 8).toByte
      out(i * 4 + 3) = v.toByte
      i += 1
    }
    out
  }

  /** Position at slot `i` of the DV (0-based). */
  private def posAt(dv: Array[Byte], i: Int): Int =
    ((dv(i * 4) & 0xff) << 24) | ((dv(i * 4 + 1) & 0xff) << 16) |
      ((dv(i * 4 + 2) & 0xff) << 8) | (dv(i * 4 + 3) & 0xff)

  /** Membership probe — binary search straight over the bytes. A null
    * or empty DV deletes nothing; a position outside int range cannot
    * have been serialized, so it is never deleted.
    */
  def contains(dv: Array[Byte], pos: Long): Boolean = {
    if (dv == null || dv.length == 0 || pos < 0 || pos > Int.MaxValue)
      return false
    val target = pos.toInt
    var lo = 0
    var hi = dv.length / 4 - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val v = posAt(dv, mid)
      if (v == target) return true
      else if (v < target) lo = mid + 1
      else hi = mid - 1
    }
    false
  }

  /** Union of two DVs (either may be null/empty) — one linear merge of
    * the two sorted encodings, duplicates collapsed.
    */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val x = if (a == null) Array.emptyByteArray else a
    val y = if (b == null) Array.emptyByteArray else b
    if (x.isEmpty) return y
    if (y.isEmpty) return x
    val nx = x.length / 4
    val ny = y.length / 4
    val out = new Array[Byte]((nx + ny) * 4)
    var i = 0; var j = 0; var k = 0
    var last = -1L
    def emit(v: Int): Unit = {
      if (v.toLong != last) {
        out(k * 4) = (v >>> 24).toByte
        out(k * 4 + 1) = (v >>> 16).toByte
        out(k * 4 + 2) = (v >>> 8).toByte
        out(k * 4 + 3) = v.toByte
        last = v.toLong
        k += 1
      }
    }
    while (i < nx && j < ny) {
      val vx = posAt(x, i)
      val vy = posAt(y, j)
      if (vx <= vy) { emit(vx); i += 1; if (vx == vy) j += 1 }
      else { emit(vy); j += 1 }
    }
    while (i < nx) { emit(posAt(x, i)); i += 1 }
    while (j < ny) { emit(posAt(y, j)); j += 1 }
    if (k == nx + ny) out else java.util.Arrays.copyOf(out, k * 4)
  }

  /** Deleted-row count of a DV (null -> 0). */
  def cardinality(dv: Array[Byte]): Int =
    if (dv == null) 0 else dv.length / 4
}
