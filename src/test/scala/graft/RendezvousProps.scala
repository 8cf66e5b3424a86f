package graft

import java.security.MessageDigest

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Randomized lock on the rendezvous-hashing model behind
  * curate_shard_assign (ShardAssignSpec pins the gate against this same
  * argmax-of-md5): for ANY removed shard subset, every document whose
  * winner survives keeps its assignment — the general
  * minimal-disruption theorem, of which the spec's single-shard drop is
  * one instance. Highest-random-weight hashing is exactly the scheme
  * with this property; `hash mod N` fails it for almost every removal.
  */
object RendezvousProps extends Properties("rendezvous") {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def assign(docId: Long, shards: Seq[Int]): Int =
    shards.maxBy(sh => md5hex(s"$docId:$sh"))

  private val removal = Gen.someOf(0 until 16).suchThat(_.size < 16)
  private val docs = Gen.listOfN(50, Gen.choose(0L, 1000000L))

  property("surviving winners never move under any removal set") =
    forAll(removal, docs) { (gone, ids) =>
      val remaining = (0 until 16).filterNot(gone.contains(_))
      ids.forall { id =>
        val full = assign(id, 0 until 16)
        gone.contains(full) || assign(id, remaining) == full
      }
    }
}
