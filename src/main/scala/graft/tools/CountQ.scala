package graft.tools
object CountQ {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries
    val f = graft.BenchFloors.floor
    println(s"QCOUNT=${q.size} ORACLES=${graft.SparkEntry.oracleSql.size} FLOORS=${f.size}")
    println(s"MISSING_FLOORS=${(q.keySet -- f.keySet).toSeq.sorted.mkString(",")}")
    println(s"EXTRA_FLOORS=${(f.keySet -- q.keySet).toSeq.sorted.mkString(",")}")
  }
}
