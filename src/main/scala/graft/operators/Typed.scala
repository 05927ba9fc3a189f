package graft.operators

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Typed Dataset API surface: `groupByKey` + `mapGroups` / `cogroup` with
  * case-class Encoders — the imperative per-key escape hatch for logic a
  * declarative aggregate can't express (the reference's reduce executable
  * is exactly this shape: reference worker/__main__.py:129-141 pipes a
  * sorted key-group through arbitrary code).
  *
  * Scale notes: groupByKey shuffles the ROWS (not pre-aggregated
  * buffers) — strictly more data movement than a declarative groupBy with
  * map-side partial aggregation, which is why these stay the exception.
  * Each group streams through an Iterator: state per task is one group's
  * running accumulators (a handful of longs), never the whole group
  * materialized — the same bounded-memory discipline the pipe path keeps.
  * Money sums accumulate exact long cents (inputs are exact 2-decimal
  * values), so the result is partitioning- and order-independent and the
  * SQL oracle can mirror it digit for digit.
  */
object Typed {

  case class OrderK(o_custkey: Long, o_totalprice: Double)
  case class CustK(c_custkey: Long, c_mktsegment: String)

  val queries: Seq[Q] = Seq(

    // ---- groupByKey + mapGroups ------------------------------------------
    Q("q_typed_groups",
      (s, d) => {
        import s.implicits._
        Tables(s, d, "orders")
          .select(col("o_custkey"), col("o_totalprice"))
          .as[OrderK]
          .groupByKey(_.o_custkey)
          .mapGroups { (k, it) =>
            var n = 0L
            var cents = 0L
            var mx = Double.MinValue
            it.foreach { o =>
              n += 1
              cents += math.round(o.o_totalprice * 100)
              if (o.o_totalprice > mx) mx = o.o_totalprice
            }
            (k, n, cents / 100.0, mx)
          }
          .toDF("o_custkey", "n_orders", "total", "max_price")
          .filter(col("n_orders") >= 20)
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey, COUNT(*) AS n_orders,
              CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                   AS DOUBLE) / 100.0 AS total,
              MAX(o_totalprice) AS max_price
              FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 20
              ORDER BY o_custkey""")),

    // ---- cogroup ----------------------------------------------------------
    // Both sides shuffle on the key and the function sees the two sorted-
    // by-nothing iterators side by side — the typed analog of a full outer
    // join whose per-key merge is arbitrary code. Customers with no orders
    // emit a zero row (the left iterator drives); orders with no customer
    // are dropped, mirroring the oracle's LEFT JOIN.
    Q("q_typed_cogroup",
      (s, d) => {
        import s.implicits._
        val customers = Tables(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
          .as[CustK]
          .groupByKey(_.c_custkey)
        val orders = Tables(s, d, "orders")
          .select(col("o_custkey"), col("o_totalprice"))
          .as[OrderK]
          .groupByKey(_.o_custkey)
        customers.cogroup(orders) { (k, cs, os) =>
          cs.toSeq.headOption.iterator.map { c =>
            var n = 0L
            var cents = 0L
            os.foreach { o =>
              n += 1
              cents += math.round(o.o_totalprice * 100)
            }
            (k, c.c_mktsegment, n, cents / 100.0)
          }
        }
          .toDF("c_custkey", "segment", "n_orders", "total")
          .filter(col("c_custkey") <= 300)
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_mktsegment AS segment,
              COUNT(o_custkey) AS n_orders,
              COALESCE(CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                            AS DOUBLE), 0.0) / 100.0 AS total
              FROM customer LEFT JOIN orders ON o_custkey = c_custkey
              WHERE c_custkey <= 300
              GROUP BY c_custkey, c_mktsegment ORDER BY c_custkey"""))
  )
}
