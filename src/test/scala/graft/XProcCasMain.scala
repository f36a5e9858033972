package graft

/** Child-process entry for the cross-process CAS race: resolves the
  * target's CommitIo (and pre-warms its FileSystem so the race window is
  * tight), spin-waits for a go-file barrier, then fires ONE
  * publishIfAbsent. Exit codes: 0 = won the CAS, 7 = lost, anything
  * else = crash.
  */
object XProcCasMain {
  def main(args: Array[String]): Unit = {
    val Array(goFile, target, content) = args
    val io = graft.sources.CommitIo.forPath(target)
      .getOrElse(sys.exit(3))
    io.exists(target) // pre-warm FileSystem/conf init outside the race
    while (!java.nio.file.Files.exists(java.nio.file.Paths.get(goFile)))
      Thread.sleep(1)
    val won = io.publishIfAbsent(target, content.getBytes("UTF-8"))
    sys.exit(if (won) 0 else 7)
  }
}
