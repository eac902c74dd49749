package graft.functions
object TimeInit {
  def main(args: Array[String]): Unit = {
    val t0 = System.nanoTime()
    val h = H3.latLngToCell(40.7, -74.0, 9)
    val t1 = System.nanoTime()
    var i = 0; var acc = 0L
    while (i < 1000000) { acc ^= H3.latLngToCell(40.7 + i * 1e-6, -74.0, 9); i += 1 }
    val t2 = System.nanoTime()
    println(s"init+first: ${(t1 - t0) / 1e6} ms; 1M cells: ${(t2 - t1) / 1e6} ms; $h $acc")
  }
}
