package graft.tools

/** Dev probe: print the dialect rewrite of each CLI-arg statement. */
object DialectProbe {
  def main(args: Array[String]): Unit =
    args.foreach(s => println(graft.engine.FlinkDialect.rewrite(s) + "\n----"))
}
