package graft

/** One-line probe for the bench-output contract: the driver parses the
  * final stdout line of `sbt "runMain graft.Bench"` as JSON, which requires
  * `run / outputStrategy := StdoutOutput` (build.sbt) so the forked JVM's
  * stdout is NOT wrapped in sbt's `[info] ` logger prefix. Running this
  * main and checking the line arrives raw verifies the wiring without a
  * full bench run.
  */
object StdoutProbe {
  def main(args: Array[String]): Unit =
    println("""{"probe":true,"stdout":"raw"}""")
}
