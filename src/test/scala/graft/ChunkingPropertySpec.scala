package graft

import scala.util.Random

/** Property coverage for [[graft.queries.Curation.chunkDocs]] across random
  * (window, stride) settings and random token streams: the invariants a
  * packing/RAG consumer relies on, independent of the q78 oracle's fixed
  * (32, 24) point.
  *
  * Seeded `Random` (reproducible, offline-cache-safe — same convention as
  * the other property specs).
  */
class ChunkingPropertySpec extends SparkSpec {

  private case class Doc(doc_id: Long, text: String)

  test("chunking invariants hold across random window/stride/token streams") {
    val rnd = new Random(4242L)
    for (trial <- 1 to 12) {
      val window = 1 + rnd.nextInt(40)
      val stride = 1 + rnd.nextInt(window) // stride <= window: gap-free
      val docs = (0 until 25).map { id =>
        val n = 1 + rnd.nextInt(120)
        Doc(id.toLong, Seq.fill(n)(s"t${rnd.nextInt(50)}").mkString(" "))
      }
      val df = spark.createDataFrame(docs)
      val got = graft.queries.Curation.chunkDocs(df, window, stride)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
        .groupBy(_._1)

      docs.foreach { d =>
        val toks = d.text.split(" ", -1)
        val chunks = got(d.doc_id).sortBy(_._2)
        val label = s"trial $trial (w=$window s=$stride doc=${d.doc_id} n=${toks.length})"
        // chunk ids dense from 0; count = floor((n-1)/stride)+1
        assert(chunks.map(_._2).sameElements(0L until chunks.length), label)
        assert(chunks.length == (toks.length - 1) / stride + 1, label)
        chunks.foreach { case (_, idx, nTok, head, tail) =>
          val start = idx.toInt * stride
          val expect = toks.slice(start, math.min(start + window, toks.length))
          assert(nTok == expect.length && head == expect.head && tail == expect.last,
            s"$label chunk $idx")
        }
        // gap-free coverage: chunk starts tile every position when stride<=window
        val covered = chunks.flatMap { case (_, idx, nTok, _, _) =>
          val start = idx.toInt * stride; start until (start + nTok.toInt)
        }.toSet
        assert(covered == toks.indices.toSet, s"$label: positions uncovered")
      }
    }
  }
}
