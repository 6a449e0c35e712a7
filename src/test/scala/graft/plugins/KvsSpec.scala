package graft.plugins

import org.scalatest.funsuite.AnyFunSuite

import graft.plugins.RedisPlugin.InProcessKvs

/** Redis-faithful semantics of the in-process KVS test double — SET clears
  * TTLs, HSET merges hashes and survives a prior string value (Redis would
  * raise WRONGTYPE; the double overwrites rather than crash a partition).
  */
class KvsSpec extends AnyFunSuite {

  test("SET discards a TTL; EXPIRE re-arms one (Redis SET semantics)") {
    val ds = "kvs-spec-ttl"
    InProcessKvs.clear(ds)
    val c = InProcessKvs.client(ds)
    c.set("k", "v1")
    c.expire("k", 60)
    assert(InProcessKvs.get(ds, "k").get._2.contains(60L))
    c.set("k", "v2") // Redis SET clears any TTL on the key
    assert(InProcessKvs.get(ds, "k").get == (("v2", None)))
  }

  test("HSET merges into a hash and replaces a prior string value") {
    val ds = "kvs-spec-hash"
    InProcessKvs.clear(ds)
    val c = InProcessKvs.client(ds)
    c.hset("h", Map("a" -> "1"))
    c.hset("h", Map("b" -> "2"))
    assert(InProcessKvs.get(ds, "h").get._1 == Map("a" -> "1", "b" -> "2"))
    c.set("s", "plain")
    c.hset("s", Map("x" -> "9")) // mixed-encode rerun must not throw
    assert(InProcessKvs.get(ds, "s").get._1 == Map("x" -> "9"))
  }

  test("EXPIRE on a missing key is a no-op") {
    val ds = "kvs-spec-miss"
    InProcessKvs.clear(ds)
    InProcessKvs.client(ds).expire("nope", 10)
    assert(InProcessKvs.get(ds, "nope").isEmpty)
  }
}
