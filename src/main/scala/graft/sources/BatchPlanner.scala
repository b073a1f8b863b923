package graft.sources

/** Statistics-driven ingest batch planner (SURVEY.md §4.1; reference
  * `whalefinder/obis.py:166-203`).
  *
  * The reference asks the source API for per-year record counts, then
  * greedily packs consecutive years into fetch windows of at most `size`
  * records; a single year that alone exceeds `size` gets a dedicated
  * window (`obis.py:141-147,184-191`). This is ingest planning with table
  * statistics — the connector-side analog of cost-based optimization — and
  * is a pure function here so it is unit/property-testable in isolation.
  */
object BatchPlanner {

  /** Pack ascending `(year, records)` stats into inclusive year windows
    * whose record totals stay ≤ `size`; oversized years are isolated.
    */
  def planBatches(yearCounts: Seq[(Int, Long)], size: Long): Seq[(Int, Int)] = {
    val sorted = yearCounts.sortBy(_._1)
    val out = Seq.newBuilder[(Int, Int)]
    var start = Option.empty[Int]
    var last = 0
    var acc = 0L
    def flush(): Unit = {
      start.foreach(s => out += ((s, last)))
      start = None; acc = 0L
    }
    sorted.foreach { case (y, c) =>
      if (c > size) { // oversized year: dedicated window
        flush()
        out += ((y, y))
      } else if (start.isDefined && acc + c > size) {
        flush()
        start = Some(y); last = y; acc = c
      } else {
        if (start.isEmpty) start = Some(y)
        last = y; acc += c
      }
    }
    flush()
    out.result()
  }
}
