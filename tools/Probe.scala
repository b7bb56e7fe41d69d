// Scratch instrumentation main — run via:
//   sbt 'set Compile/unmanagedSourceDirectories += file("tools")' 'runMain graft.tools.Probe'
// Current shape: focused graph-family timing (small + 10x, min of two) so
// a loop change can be adjudicated without the full ScaleRehearsal sweep.
package graft.tools

object Probe {
  def main(args: Array[String]): Unit = {
    val s = graft.core.Sessions.local()
    val small = "/root/testdata/sf0.1"
    val big = "/tmp/graft_sf1"
    val picks = args.toSeq match {
      case Nil => Seq("l26_pagerank", "l40_label_prop", "l46_kcore")
      case xs  => xs
    }
    // warm-up: classloading/codegen out of the timed window
    try graft.SparkEntry.entry(s).count() catch { case _: Throwable => () }
    graft.core.Caches.releaseAll(s)
    def one(name: String, d: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(s, d).count()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.core.Caches.releaseAll(s)
      dt
    }
    picks.foreach { name =>
      val ts = math.min(one(name, small), one(name, small))
      val tb = math.min(one(name, big), one(name, big))
      val e = math.log(tb / ts) / math.log(10.0)
      println(f"$name%-24s small=$ts%6.2fs  big=$tb%7.2fs  exponent=$e%5.2f")
    }
    s.stop()
  }
}
