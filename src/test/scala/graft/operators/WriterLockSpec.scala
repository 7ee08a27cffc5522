package graft.operators

import graft.SparkTestBase

/** The lock's one hard claim — MUTUAL EXCLUSION — exercised at the
  * syscall level it now rests on: `file:` URIs acquire via java.nio
  * CREATE_NEW (O_EXCL), because Hadoop's local
  * `create(overwrite = false)` is a non-atomic exists-then-create (the
  * r16 ADVICE finding: two racers inside that window could both
  * "acquire" and the class's promise was only as strong as the backing
  * filesystem). StreamCompactLoopSpec covers the loop-facing behavior
  * (refusal surfaces through a failed micro-batch, release on exit);
  * this spec covers the primitive itself under an actual race. */
class WriterLockSpec extends SparkTestBase {

  test("16 threads racing one lock: exactly one holds it at a time, " +
      "every loser is refused loudly, and the holder's exit hands off") {
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInside = new java.util.concurrent.atomic.AtomicInteger(0)
    val held = new java.util.concurrent.atomic.AtomicInteger(0)
    val refused = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (0 until 16).map { _ =>
      new Thread(() =>
        try {
          WriterLock.withLock(spark, "race_spec_table") {
            val now = inside.incrementAndGet()
            maxInside.accumulateAndGet(now, math.max)
            Thread.sleep(5) // widen any non-atomic window
            inside.decrementAndGet()
            held.incrementAndGet()
          }
        } catch {
          case _: WriterLock.LockHeldException => refused.incrementAndGet()
        })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(maxInside.get() === 1,
      s"${maxInside.get()} writers held the exclusive lock simultaneously")
    assert(held.get() + refused.get() === 16)
    assert(held.get() >= 1, "nobody acquired the lock")
    // the last holder released on exit — a fresh writer proceeds
    WriterLock.withLock(spark, "race_spec_table") { () }
  }

  test("break clears a confirmed-dead writer's lock") {
    val p = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), "_locks"),
      "dead_writer_spec.lock")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p.getParent)
    val o = fs.create(p, false); o.write("dead@host\n".getBytes); o.close()
    intercept[WriterLock.LockHeldException] {
      WriterLock.withLock(spark, "dead_writer_spec") { () }
    }
    assert(WriterLock.break(spark, "dead_writer_spec"))
    WriterLock.withLock(spark, "dead_writer_spec") { () }
  }
}
