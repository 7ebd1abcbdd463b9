package graft

import graft.core.{IntBuf, LongBuf}
import org.scalatest.funsuite.AnyFunSuite

class PrimitiveBufSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)

  test("LongBuf round-trips random sequences across doublings") {
    (0 until 50).foreach { _ =>
      val xs = List.fill(rnd.nextInt(200))(rnd.nextLong())
      val b = new LongBuf(2)
      xs.foreach(b.add)
      assert(b.length == xs.length)
      assert(b.toArray.toList == xs)
      xs.indices.foreach(i => assert(b(i) == xs(i)))
    }
  }

  test("IntBuf round-trips, slices, bumps and resets") {
    (0 until 50).foreach { _ =>
      val xs = List.fill(1 + rnd.nextInt(200))(rnd.nextInt())
      val b = new IntBuf(2)
      xs.foreach(b.add)
      assert(b.toArray.toList == xs)
      b.bump(0)
      assert(b(0) == xs.head + 1)
      val from = xs.length / 2
      assert(b.slice(from, xs.length - from).toList ==
        xs.updated(0, xs.head + 1).drop(from))
      b.reset()
      assert(b.length == 0)
      b.add(7)
      assert(b.length == 1 && b(0) == 7)
    }
  }

  test("IntBuf addAll grows across doublings") {
    val b = new IntBuf(2)
    val arr = Array.tabulate(1000)(identity)
    b.addAll(arr, 0, 1000)
    b.addAll(arr, 500, 500)
    assert(b.length == 1500)
    assert(b.toArray.toList == (arr ++ arr.drop(500)).toList)
  }
}
