package graft.store

import org.scalatest.funsuite.AnyFunSuite

/** The per-target swap lock serializes the old-aside/move-in protocol
  * against read-path crash recovery (review finding, round 5): a reader
  * running [[RrdStore.recoverLeftovers]] during a writer's in-flight
  * swap would "recover" the .old dir and make the writer's final move
  * throw. These tests pin the lock's contract without relying on
  * timing: a blocked thread is observed via Thread.getState.
  */
class SwapLockSpec extends AnyFunSuite {

  private def awaitBlocked(t: Thread): Unit = {
    val deadline = System.nanoTime() + 10_000_000_000L
    while (System.nanoTime() < deadline &&
      t.getState != Thread.State.BLOCKED &&
      t.getState != Thread.State.TERMINATED) Thread.onSpinWait()
    assert(t.getState == Thread.State.BLOCKED,
      s"expected contender to block on the swap lock, was ${t.getState}")
  }

  test("withSwapLock is mutually exclusive per normalized target") {
    val target = java.nio.file.Files
      .createTempDirectory("graft_lock").toString + "/rra0"
    val inside = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    @volatile var contenderRan = false
    val holder = new Thread(() => RrdStore.withSwapLock(target) {
      inside.countDown()
      release.await()
    })
    holder.start()
    inside.await()
    // a second spelling of the same path must contend on the same lock
    val contender = new Thread(() =>
      RrdStore.withSwapLock(target + "/../rra0") { contenderRan = true })
    contender.start()
    awaitBlocked(contender)
    assert(!contenderRan)
    release.countDown()
    contender.join(10000)
    holder.join(10000)
    assert(contenderRan)
  }

  test("recoverLeftovers blocks while a swap holds the lock — the " +
      "mid-swap dst-missing/old-present state is never 'recovered'") {
    val root = java.nio.file.Files.createTempDirectory("graft_lock2")
    val target = root.resolve("rra0")
    val old = root.resolve("rra0.old")
    // simulate the writer mid-swap: dst moved aside, replacement not yet
    // in place — exactly the state a concurrent reader used to ruin
    java.nio.file.Files.createDirectories(old)
    java.nio.file.Files.write(old.resolve("part-0"), Array[Byte](1, 2))
    val inside = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val writer = new Thread(() => RrdStore.withSwapLock(target.toString) {
      inside.countDown()
      release.await()
      // writer completes its swap while still holding the lock
      java.nio.file.Files.move(old, target)
    })
    writer.start()
    inside.await()
    val reader = new Thread(() =>
      RrdStore.recoverLeftovers(target.toString))
    reader.start()
    awaitBlocked(reader)
    // the reader must NOT have touched the .old dir while blocked
    assert(java.nio.file.Files.exists(old))
    assert(!java.nio.file.Files.exists(target))
    release.countDown()
    reader.join(10000)
    writer.join(10000)
    // writer won the race it owns: its swap landed, and the reader's
    // subsequent recovery found nothing left to do
    assert(java.nio.file.Files.exists(target.resolve("part-0")))
    assert(!java.nio.file.Files.exists(old))
  }
}
