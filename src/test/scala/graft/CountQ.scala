package graft
object CountQ {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    println(s"COUNT queries=${q.size} oracles=${o.size} rowsOnly=${(q -- o).toSeq.sorted.mkString(",")}")
    val orphan = o -- q
    if (orphan.nonEmpty) println(s"ORPHAN oracles: ${orphan.mkString(",")}")
  }
}
