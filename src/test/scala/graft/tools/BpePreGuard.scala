package graft.tools

/** The PRE-round-11 BPE batch selector, kept as a single reference
  * replica: guards (a)+(b)+(d) as shipped, guard (c) with ONLY the
  * pre-existing-universe cut (no in-batch minted set). Shared by the
  * sf0.01 gate-fixture spec (GraphIndexSpec) and the sf0.1 corpus probe
  * ([[BpeBatchProbe]]) so both provably test the SAME baseline — a
  * divergent copy would silently make the two "batch-size-neutral"
  * claims mean different things. */
object BpePreGuard {
  def apply(top: IndexedSeq[(String, String, Long)], want: Int,
            symbols: String => Boolean)
      : IndexedSeq[(String, String, Long)] = {
    // guards (a)+(b): longest symbol-disjoint prefix, self-pair closes
    val acc = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Long)]
    val used = scala.collection.mutable.Set.empty[String]
    var idx = 0
    var closed = false
    while (!closed && idx < math.min(want, top.length)) {
      val (l, r, _) = top(idx)
      if (idx > 0 && (l == r || used(l) || used(r))) closed = true
      else {
        acc += top(idx); used += l; used += r; idx += 1
        if (l == r) closed = true
      }
    }
    // guard (c) AS OF ROUND 10: only the pre-existing-universe cut
    if (acc.length > 1) {
      val cut = acc.indexWhere(c => symbols(c._1 + c._2))
      if (cut >= 0) acc.dropRightInPlace(acc.length - math.max(1, cut))
    }
    // guard (d): strict gap to the first excluded candidate
    if (acc.length > 1 && top.length > acc.length) {
      val nc = top(acc.length)._3
      while (acc.length > 1 && acc.last._3 == nc) acc.dropRightInPlace(1)
    }
    acc.toIndexedSeq
  }
}
