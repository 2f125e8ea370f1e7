package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Wave 34 — structure and dynamics: the stationary distribution of the
  * event-type Markov chain (integer power iteration, every floor
  * replayed), partition conductance, and density clustering. Same
  * fixed-point discipline as the graph wave (q251/q256): truncating
  * divs on non-negative integers only, so DuckDB replays rounds
  * bit-for-bit.
  */
object StructureQueries extends QueryPack {

  /** DuckDB replica of [[graft.ops.Behavior.markovStationary]]: the
    * q204 one-step matrix, then one CTE per power-iteration round.
    */
  private def stationaryOracleSql(rounds: Int): String = {
    val head =
      """WITH seq AS (
        |  SELECT event_type AS b,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS a
        |  FROM events),
        |n1 AS (SELECT a, b, count(*) AS n FROM seq
        |       WHERE a IS NOT NULL GROUP BY 1, 2),
        |p1 AS (SELECT a, b,
        |         (n * 1000000) // sum(n) OVER (PARTITION BY a) AS p
        |       FROM n1),
        |st AS (SELECT a AS state FROM p1 UNION SELECT b FROM p1),
        |kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM st),
        |r0 AS (SELECT state, 1000000 // k AS pi FROM st CROSS JOIN kk)"""
        .stripMargin
    val rounds_ = (1 to rounds).map { i =>
      s"""
         |,r$i AS (
         |  SELECT st.state, coalesce(m.v // 1000000, 0) AS pi
         |  FROM st LEFT JOIN (
         |    SELECT b AS state2, sum(pi * p) AS v
         |    FROM r${i - 1} r JOIN p1 ON r.state = p1.a GROUP BY 1) m
         |  ON m.state2 = st.state)""".stripMargin
    }.mkString
    head + rounds_ +
      s"\nSELECT state, CAST(pi AS BIGINT) AS pi_micro FROM r$rounds ORDER BY state"
  }

  val all: Seq[Q] = Seq(

    // Stationary distribution of the event-type chain: 6 integer power
    // rounds over the q204 transition matrix — "where does a user
    // session spend its time in the limit".
    Q("q300_markov_stationary",
      (s, d) => {
        import s.implicits._
        graft.ops.Behavior.markovStationary(Tables.events(s, d), rounds = 6)
          .orderBy($"state")
      },
      Some(stationaryOracleSql(6)))
  )
}
