package graft.mr

/** Example clients, mirroring the course's sample client (SURVEY.md §2.1
  * R12: map splits input into units emitting (unit, 1); reduce sums).
  */

/** Word frequency over (docId, text) inputs — the flagship workload.
  * The course sample counts chars; words keep the identical
  * map→group→reduce shape while staying SQL-oracle-friendly
  * (SURVEY.md §7.2). */
object WordCountClient
    extends MapReduceClient[Long, String, String, Long, String, Long] {
  override def map(docId: Long, text: String): IterableOnce[(String, Long)] =
    text.split(' ').iterator.filter(_.nonEmpty).map(w => (w, 1L))
  override def reduce(word: String, counts: Iterator[Long]): IterableOnce[(String, Long)] =
    Iterator.single((word, counts.sum))
}

/** Character frequency — the literal course sample client shape. */
object CharCountClient
    extends MapReduceClient[Long, String, String, Long, String, Long] {
  override def map(docId: Long, text: String): IterableOnce[(String, Long)] =
    text.iterator.filterNot(_ == ' ').map(c => (c.toString, 1L))
  override def reduce(ch: String, counts: Iterator[Long]): IterableOnce[(String, Long)] =
    Iterator.single((ch, counts.sum))
}
