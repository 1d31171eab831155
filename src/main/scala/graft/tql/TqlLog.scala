package graft.tql

import scala.collection.mutable.ArrayBuffer

/** Task log channel for TQL side effects — WHEN(doLog(…)), SCRIPT console
  * output, sub-routine warnings (reference: node.task.Log* feeding the
  * test harness's ExpectLog). Lines go to stderr; `capture` additionally
  * buffers them for assertions. */
object TqlLog {
  private val buf = new ThreadLocal[Option[ArrayBuffer[String]]] {
    override def initialValue(): Option[ArrayBuffer[String]] = None
  }
  private val levels = Seq("DEBUG", "INFO", "WARN", "ERROR")
  private val threshold = new ThreadLocal[Int] {
    override def initialValue(): Int = 0 // DEBUG
  }

  /** `#pragma log-level=warn` (task_test.go TestPragma): lines below the
    * threshold are dropped. */
  def setLevel(level: String): Unit =
    threshold.set(math.max(0, levels.indexOf(level.toUpperCase)))
  def levelIndex: Int = threshold.get
  def setLevelIndex(i: Int): Unit = threshold.set(i)

  def log(level: String, msg: String): Unit = {
    if (levels.indexOf(level.toUpperCase) < threshold.get) return
    val line = s"[$level] $msg"
    buf.get.foreach(_ += line)
    Console.err.println(line)
  }

  /** Run `f` collecting every log line emitted on this thread. */
  def capture[T](f: => T): (T, Seq[String]) = {
    val b = ArrayBuffer.empty[String]
    val prev = buf.get
    buf.set(Some(b))
    try { val r = f; (r, b.toSeq) } finally buf.set(prev)
  }
}
