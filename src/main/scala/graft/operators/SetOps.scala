package graft.operators

import org.apache.spark.sql.functions._
import graft.Q

/** Set-algebra operator surface (SURVEY.md §2.6): union, intersection,
  * difference, disjointness checks — the engine's replacements for the
  * reference's sparse-matrix set arithmetic
  * (reference: Utils/dataset.py:1999-2023,
  * Utils/assertions_on_data_for_experiments.py:28-54).
  */
object SetOps {

  def queries: Seq[Q] = Seq(

    // U1/U2 — unionByName of row sets + re-aggregation.
    Q("q13_union_agg", { t =>
        val clicks = t.events.filter(col("event_type") === "click")
          .select("user_id")
        val views = t.events.filter(col("event_type") === "view")
          .select("user_id")
        clicks.unionByName(views).groupBy("user_id")
          .agg(count(lit(1)).as("n_click_view"))
      },
      Some("""SELECT user_id, COUNT(*) AS n_click_view FROM (
             |  SELECT user_id FROM events WHERE event_type = 'click'
             |  UNION ALL
             |  SELECT user_id FROM events WHERE event_type = 'view'
             |) t GROUP BY user_id""".stripMargin)),

    // U3 — intersection: users who both clicked and purchased.
    Q("q14_intersect", { t =>
        val clickers = t.events.filter(col("event_type") === "click")
          .select("user_id").distinct()
        val buyers = t.events.filter(col("event_type") === "purchase")
          .select("user_id").distinct()
        clickers.intersect(buyers)
      },
      Some("""SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
             |INTERSECT
             |SELECT DISTINCT user_id FROM events
             |WHERE event_type = 'purchase'""".stripMargin)),

    // U4 — difference: users who viewed but never clicked.
    Q("q15_except", { t =>
        val viewers = t.events.filter(col("event_type") === "view")
          .select("user_id").distinct()
        val clickers = t.events.filter(col("event_type") === "click")
          .select("user_id").distinct()
        viewers.except(clickers)
      },
      Some("""SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
             |EXCEPT
             |SELECT DISTINCT user_id FROM events
             |WHERE event_type = 'click'""".stripMargin)),

    // U5 — disjointness audit: how many (user, day) cells appear in more
    // than one of two "splits" (click-days vs view-days).
    Q("q16_disjoint_check", { t =>
        val cells = t.events
          .filter(col("event_type").isin("click", "view"))
          .select(col("user_id"), to_date(col("ts")).as("day"),
                  col("event_type"))
          .distinct()
        cells.groupBy("user_id", "day")
          .agg(count(lit(1)).as("n_splits"))
          .filter(col("n_splits") > 1)
          .agg(count(lit(1)).as("n_overlapping_cells"))
      },
      Some("""SELECT COUNT(*) AS n_overlapping_cells FROM (
             |  SELECT user_id, day FROM (
             |    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
             |    FROM events WHERE event_type IN ('click','view')
             |  ) c GROUP BY user_id, day HAVING COUNT(*) > 1
             |) t""".stripMargin))
  )
}
