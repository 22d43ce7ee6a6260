package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.mr._
import graft.sources.Inputs

/** The reference's canonical MapReduce demo programs
  * (python/demo/main.py word_count / index / phrases;
  * example/.../randomcollisions/CollisionFindingReducer.java;
  * example/.../entitycount CountMapper/CountReducer), executed through the
  * graft.mr programming surface so the check queries exercise the whole
  * §3 lifecycle: Input → Mapper → [Combiner] → shuffle → Reducer.
  *
  * Tokenization contract shared with the DuckDB oracle: split on single
  * spaces, drop empty tokens.
  */
object MapReduceQueries {
  import QueryDef._

  private class TokenizeMapper extends Mapper[String, String, Long] {
    def map(text: String, emit: (String, Long) => Unit): Unit =
      text.split(' ').iterator.filter(_.nonEmpty).foreach(w => emit(w, 1L))
  }

  private object SumCombiner extends Combiner[Long, Long] {
    def zero: Long = 0L
    def reduce(acc: Long, v: Long): Long = acc + v
    def merge(a: Long, b: Long): Long = a + b
  }

  private class SumReducer extends Reducer[String, Long, (String, Long)] {
    def reduce(key: String, values: Iterator[Long],
        emit: ((String, Long)) => Unit): Unit = emit((key, values.sum))
  }

  /** WordCount (python/demo/main.py `word_count_map`/`word_count_reduce`)
    * with map-side partial aggregation via the combiner. */
  val wordCount = sql("mr_wordcount",
    """SELECT w AS word, count(*) AS cnt FROM (
         SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
       WHERE w <> '' GROUP BY w""") { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d).select(col("text")).as[String]
    MapReduceJob.run(MapReduceSpecification(
      jobName = "wordcount",
      input = docs,
      mapper = new TokenizeMapper,
      reducer = new SumReducer,
      combiner = Some(SumCombiner)))
      .toDF("word", "cnt")
  }

  /** Character frequency (example/.../entitycount CountMapper emits one
    * (char, 1) per character; CountReducer sums longs). */
  val charCount = sql("mr_charcount",
    """SELECT c AS ch, count(*) AS cnt FROM (
         SELECT unnest(list_transform(range(1, length(text) + 1),
           i -> substr(text, CAST(i AS INT), 1))) AS c
         FROM documents) t GROUP BY c""") { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d).select(col("text")).as[String]
    MapReduceJob.run(MapReduceSpecification(
      jobName = "charcount",
      input = docs,
      mapper = new Mapper[String, String, Long] {
        def map(text: String, emit: (String, Long) => Unit): Unit =
          text.foreach(c => emit(c.toString, 1L))
      },
      reducer = new SumReducer,
      combiner = Some(SumCombiner)))
      .toDF("ch", "cnt")
  }

  /** Inverted index (python/demo/main.py `index_map`/`index_reduce`:
    * word → set of source files). Set is emitted sorted+joined so the
    * result is deterministic and hash-comparable. */
  val invertedIndex = sql("mr_inverted_index",
    """SELECT w AS word, array_to_string(list_sort(list(DISTINCT source)), ',') AS sources
       FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents) t
       WHERE w <> '' GROUP BY w""") { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select(col("source"), col("text")).as[(String, String)]
    MapReduceJob.run(MapReduceSpecification(
      jobName = "inverted-index",
      input = docs,
      mapper = new Mapper[(String, String), String, String] {
        def map(in: (String, String), emit: (String, String) => Unit): Unit =
          in._2.split(' ').iterator.filter(_.nonEmpty)
            .foreach(w => emit(w, in._1))
      },
      reducer = new Reducer[String, String, (String, String)] {
        def reduce(key: String, values: Iterator[String],
            emit: ((String, String)) => Unit): Unit =
          emit((key, values.toSet.toSeq.sorted.mkString(",")))
      }))
      .toDF("word", "sources")
  }

  /** Phrases (python/demo/main.py `phrases_map`/`phrases_reduce`): sliding
    * word n-grams counted across the corpus, kept over a threshold. The
    * reference uses `":".join(words)` keys and a frequency filter. */
  val phrases = sql("mr_phrases",
    """SELECT p AS phrase, count(*) AS cnt FROM (
         SELECT w[CAST(i AS INT)] || ':' || w[CAST(i AS INT) + 1] || ':' || w[CAST(i AS INT) + 2] AS p
         FROM (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w
               FROM documents) d,
              LATERAL (SELECT unnest(range(1, greatest(len(w) - 1, 1))) AS i) s
       ) t GROUP BY p HAVING count(*) >= 5""") { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d).select(col("text")).as[String]
    MapReduceJob.run(MapReduceSpecification(
      jobName = "phrases",
      input = docs,
      mapper = new Mapper[String, String, Long] {
        def map(text: String, emit: (String, Long) => Unit): Unit = {
          val w = text.split(' ').filter(_.nonEmpty)
          var i = 0
          while (i + 2 < w.length) {
            emit(s"${w(i)}:${w(i + 1)}:${w(i + 2)}", 1L); i += 1
          }
        }
      },
      reducer = new Reducer[String, Long, (String, Long)] {
        def reduce(key: String, values: Iterator[Long],
            emit: ((String, Long)) => Unit): Unit = {
          val n = values.sum
          if (n >= 5L) emit((key, n))
        }
      },
      combiner = Some(SumCombiner)))
      .toDF("phrase", "cnt")
  }

  /** Collision finding (example/.../randomcollisions: SeedToRandomMapper +
    * CollisionFindingReducer keeps values whose generated key collides).
    * The PRNG is a deterministic LCG so the DuckDB oracle can replay it:
    * r(x) = (1103515245 * x + 12345) mod 99991. */
  val collisions = sql("mr_collisions",
    """SELECT r, count(*) AS cnt FROM (
         SELECT (1103515245 * range + 12345) % 99991 AS r
         FROM range(0, 20000)) t
       GROUP BY r HAVING count(*) > 1""") { (s, _) =>
    import s.implicits._
    val nums = Inputs.consecutiveLongs(s, 0L, 20000L, shards = 8)
      .map(_.longValue())
    MapReduceJob.run(MapReduceSpecification(
      jobName = "collisions",
      input = nums,
      mapper = new Mapper[Long, Long, Long] {
        def map(x: Long, emit: (Long, Long) => Unit): Unit =
          emit((1103515245L * x + 12345L) % 99991L, x)
      },
      reducer = new Reducer[Long, Long, (Long, Long)] {
        def reduce(key: Long, values: Iterator[Long],
            emit: ((Long, Long)) => Unit): Unit = {
          val n = values.size.toLong
          if (n > 1L) emit((key, n))
        }
      }))
      .toDF("r", "cnt")
  }

  /** Map-only job (MapOnlyMapper analogue): per-event derived record, no
    * shuffle. */
  val mapOnly = sql("mr_map_only",
    """SELECT event_id, user_id * 1000 + (event_id % 1000) AS tag
       FROM events WHERE event_type = 'purchase'""") { (s, d) =>
    import s.implicits._
    val ev = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id")).as[(Long, Long)]
    MapReduceJob.runMapOnly(
      "map-only-tag", ev,
      new MapOnlyMapper[(Long, Long), (Long, Long)] {
        def map(in: (Long, Long), emit: ((Long, Long)) => Unit): Unit =
          emit((in._1, in._2 * 1000L + in._1 % 1000L))
      })
      .toDF("event_id", "tag")
  }

  /** Combiner path over numeric values: per-user spend in integer cents
    * (exact, order-independent). */
  val combinerSum = sql("mr_combiner_sum",
    """SELECT user_id, CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
       FROM events GROUP BY user_id""") { (s, d) =>
    import s.implicits._
    val ev = Tables.events(s, d)
      .select(col("user_id"), round(col("value") * 100).cast("long")).as[(Long, Long)]
    MapReduceJob.run(MapReduceSpecification(
      jobName = "combiner-sum",
      input = ev,
      mapper = new IdentityMapper[Long, Long],
      reducer = new Reducer[Long, Long, (Long, Long)] {
        def reduce(key: Long, values: Iterator[Long],
            emit: ((Long, Long)) => Unit): Unit = emit((key, values.sum))
      },
      combiner = Some(new Combiner[Long, Long] {
        def zero: Long = 0L
        def reduce(acc: Long, v: Long): Long = acc + v
        def merge(a: Long, b: Long): Long = a + b
      })))
      .toDF("user_id", "total_cents")
  }

  /** DISTINCT via KeyProjectionReducer (reducers/KeyProjectionReducer.java)
    * — the reference's idiom for dedup-by-key. */
  val distinctViaReducer = sql("mr_distinct",
    "SELECT DISTINCT o_orderpriority AS priority FROM orders") { (s, d) =>
    import s.implicits._
    val o = Tables.orders(s, d)
      .select(col("o_orderpriority"), lit(1L)).as[(String, Long)]
    MapReduceJob.run(MapReduceSpecification(
      jobName = "distinct",
      input = o,
      mapper = new IdentityMapper[String, Long],
      reducer = new KeyProjectionReducer[String, Long]))
      .toDF("priority")
  }

  /** Chained two-stage MapReduce (the ChainedMapReduceJob /
    * MapreducePipeline analogue, SURVEY.md §3.2): stage 1 wordcount,
    * stage 2 a second MR over stage 1's output building the
    * occurrence-count histogram. Catalyst fuses both stages into one
    * plan — the reference needed GCS files and four sub-pipelines. */
  val chained = sql("mr_chained",
    """SELECT cnt, count(*) AS n_words FROM (
         SELECT w AS word, count(*) AS cnt FROM (
           SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
         WHERE w <> '' GROUP BY w) wc
       GROUP BY cnt""") { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d).select(col("text")).as[String]
    val stage1 = (in: org.apache.spark.sql.Dataset[String]) =>
      MapReduceJob.run(MapReduceSpecification(
        "wc-stage1", in, new TokenizeMapper, new SumReducer,
        combiner = Some(SumCombiner)))
    val stage2 = (wc: org.apache.spark.sql.Dataset[(String, Long)]) =>
      MapReduceJob.run(MapReduceSpecification(
        "histogram-stage2", wc,
        mapper = new Mapper[(String, Long), Long, Long] {
          def map(in: (String, Long), emit: (Long, Long) => Unit): Unit =
            emit(in._2, 1L)
        },
        reducer = new Reducer[Long, Long, (Long, Long)] {
          def reduce(k: Long, vs: Iterator[Long],
              emit: ((Long, Long)) => Unit): Unit = emit((k, vs.sum))
        },
        combiner = Some(SumCombiner)))
    Pipeline.chain(stage1, stage2)(docs).toDF("cnt", "n_words")
  }

  /** The classic reduce-side join, the reference's only join idiom
    * (SURVEY §2.5: tag both inputs, union, reduce = per-key pairing).
    * `valueOrdering` puts the dimension row first in each group, so the
    * reducer streams fact rows against one held value — no buffering,
    * the secondary-sort join pattern. Spark-native joins are the scale
    * path (join_*); this check pins the MR surface's ability to express
    * the same semantics. */
  val mrJoin = sql("mr_join",
    """SELECT c.c_custkey, n.n_name
       FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey""") { (s, d) =>
    import s.implicits._
    // tag 0 = nation (dimension), tag 1 = customer (fact)
    val nations = Tables.nation(s, d)
      .select(col("n_nationkey").cast("long"), lit(0), lit(-1L), col("n_name"))
      .as[(Long, Int, Long, String)]
    val customers = Tables.customer(s, d)
      .select(col("c_nationkey").cast("long"), lit(1), col("c_custkey"),
        lit("")).as[(Long, Int, Long, String)]
    val tagged = nations.union(customers)
    MapReduceJob.run(MapReduceSpecification(
      jobName = "reduce-side-join",
      input = tagged,
      mapper = new Mapper[(Long, Int, Long, String), Long, (Int, Long, String)] {
        def map(r: (Long, Int, Long, String),
            emit: (Long, (Int, Long, String)) => Unit): Unit =
          emit(r._1, (r._2, r._3, r._4))
      },
      reducer = new Reducer[Long, (Int, Long, String), (Long, String)] {
        def reduce(key: Long, values: Iterator[(Int, Long, String)],
            emit: ((Long, String)) => Unit): Unit = {
          var dimName: String = null
          values.foreach {
            case (0, _, name) => dimName = name
            case (1, custkey, _) =>
              if (dimName != null) emit((custkey, dimName))
            case _ =>
          }
        }
      },
      // dimension rows (tag 0) sort before fact rows within each group
      valueOrdering = Some(Ordering.by((v: (Int, Long, String)) => v._1))))
      .toDF("c_custkey", "n_name")
  }

  val all: Seq[QueryDef] = Seq(
    wordCount, charCount, invertedIndex, phrases, collisions,
    mapOnly, combinerSum, distinctViaReducer, chained, mrJoin)
}
