package graft.queries

import graft.mr.{CharCountClient, MapReduce, WordCountClient}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queries that exercise the faithful MapReduce kernel end-to-end
  * (typed flatMap → groupByKey shuffle → flatMapGroups), i.e. the
  * reference's actual capability surface (SURVEY.md §2.1).
  */
object KernelQueries extends QueryModule {

  private def docs(s: SparkSession, dir: String) = {
    import s.implicits._
    Tables.documents(s, dir).select("doc_id", "text").as[(Long, String)]
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mr_wordcount" -> ((s, dir) => {
      import s.implicits._
      MapReduce.run(docs(s, dir), WordCountClient)
        .toDF("word", "cnt")
        .orderBy("word")
    }),
    "mr_charcount" -> ((s, dir) => {
      import s.implicits._
      MapReduce.run(docs(s, dir), CharCountClient)
        .toDF("ch", "cnt")
        .orderBy("ch")
    })
  )

  override def oracles: Map[String, String] = Map(
    "mr_wordcount" ->
      """SELECT w AS word, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |WHERE w <> ''
        |GROUP BY w
        |ORDER BY word""".stripMargin,
    "mr_charcount" ->
      """SELECT c AS ch, count(*) AS cnt
        |FROM (SELECT unnest(string_split(replace(text, ' ', ''), '')) AS c
        |      FROM documents)
        |GROUP BY c
        |ORDER BY ch""".stripMargin
  )
}
