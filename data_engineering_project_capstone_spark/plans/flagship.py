"""The three flagship analytic queries (reference README.md:169-214).

These exercise the full operator closure of the star schema: multi-hop
join chains fact→airports→city→statistics/temperatures, group-by
aggregates, a scalar cross-join grand total, percent-of-total arithmetic,
and ordered output.

Plan shape at scale: the fact table is the only big input; every dimension
join is a broadcast-hash join (no fact shuffle), the aggregate is
partial+final hash agg on a_city_id / c_id, and only the final
already-small result is globally sorted.

One documented deviation from the reference: ``t_year``/``t_month`` are
integers here, not VARCHAR (the reference stores dates as strings and
filters ``t_year='2013'`` — README.md:213). Same rows, saner types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import pct_of


# spark.sql() forms of the same three queries, runnable after
# pipeline.register_star_views — semantically identical to the DF plans
# (tests assert result equality). Note Spark SQL and the DF API compile to
# the same Catalyst trees; both forms exist because the reference's users
# query in SQL (README.md:169-214).
FLAGSHIP_SQL: dict[str, str] = {
    "q1": """
        SELECT c.c_name, c.c_state_code, s.s_median_age, a.avg_age
        FROM (
            SELECT ap.a_city_id, round(avg(t.p_age), 2) AS avg_age
            FROM travelers t JOIN airports ap ON t.p_airport_id = ap.a_id
            GROUP BY ap.a_city_id
        ) a
        JOIN city c ON a.a_city_id = c.c_id
        JOIN statistics s ON s.s_city_id = c.c_id
        ORDER BY s.s_median_age DESC
    """,
    "q2": """
        SELECT c.c_name, c.c_state_code, cnt.cnt, s.s_per_foreign_born
        FROM (
            SELECT ap.a_city_id, count(*) AS cnt
            FROM travelers t JOIN airports ap ON t.p_airport_id = ap.a_id
            GROUP BY ap.a_city_id
        ) cnt
        JOIN city c ON cnt.a_city_id = c.c_id
        JOIN statistics s ON s.s_city_id = c.c_id
        ORDER BY s.s_per_foreign_born DESC
    """,
    "q3": """
        SELECT c.c_name, c.c_state_code, tp.t_average_temp_month, cnt.cnt,
               round(100 * cnt.cnt / tot.total, 2) AS pct_of_total
        FROM (
            SELECT ap.a_city_id, count(*) AS cnt
            FROM travelers t JOIN airports ap ON t.p_airport_id = ap.a_id
            GROUP BY ap.a_city_id
        ) cnt
        JOIN city c ON cnt.a_city_id = c.c_id
        JOIN temperatures tp ON tp.t_city_id = c.c_id
             AND tp.t_year = 2013 AND tp.t_month = 4
        CROSS JOIN (SELECT count(*) AS total FROM travelers) tot
        ORDER BY pct_of_total DESC
    """,
}


def flagship_q1(star: dict[str, DataFrame]) -> DataFrame:
    """Avg traveler age per city vs city median age (README.md:172-179).

    Output: c_name, c_state_code, s_median_age, avg_age — ordered by
    median age desc (reference selects c_state_code, README.md:173).
    """
    travelers, airports = star["travelers"], star["airports"]
    city, stats = star["city"], star["statistics"]
    avg_age = (
        travelers.join(
            F.broadcast(airports), travelers["p_airport_id"] == airports["a_id"]
        )
        .groupBy("a_city_id")
        .agg(F.round(F.avg("p_age"), 2).alias("avg_age"))
    )
    return (
        avg_age.join(F.broadcast(city), avg_age["a_city_id"] == city["c_id"])
        .join(F.broadcast(stats), F.col("s_city_id") == F.col("c_id"))
        .select("c_name", "c_state_code", "s_median_age", "avg_age")
        .orderBy(F.col("s_median_age").desc())
    )


def flagship_q2(star: dict[str, DataFrame]) -> DataFrame:
    """Traveler count per city vs foreign-born share (README.md:185-194).

    Output: c_name, c_state_code, cnt, s_per_foreign_born — ordered by
    foreign-born desc (reference selects c_state_code, README.md:186).
    """
    travelers, airports = star["travelers"], star["airports"]
    city, stats = star["city"], star["statistics"]
    cnt = (
        travelers.join(
            F.broadcast(airports), travelers["p_airport_id"] == airports["a_id"]
        )
        .join(F.broadcast(city), F.col("a_city_id") == F.col("c_id"))
        .groupBy("c_id", "c_name", "c_state_code")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        cnt.join(F.broadcast(stats), F.col("s_city_id") == F.col("c_id"))
        .select("c_name", "c_state_code", "cnt", "s_per_foreign_born")
        .orderBy(F.col("s_per_foreign_born").desc())
    )


def flagship_q3(star: dict[str, DataFrame], year: int = 2013, month: int = 4) -> DataFrame:
    """Traveler share per city vs that city's April-2013 temperature
    (README.md:200-214).

    Output: c_name, c_state_code, t_average_temp_month, cnt,
    pct_of_total — ordered by pct desc. t_average_temp_month is the
    monthly climatology column the denormalized temperatures dim exists
    to serve (reference README.md:204). The grand total is a 1-row
    cross join (J10), exactly the reference's scalar-subquery shape.
    """
    travelers, airports = star["travelers"], star["airports"]
    city, temps = star["city"], star["temperatures"]
    per_city = (
        travelers.join(
            F.broadcast(airports), travelers["p_airport_id"] == airports["a_id"]
        )
        .join(F.broadcast(city), F.col("a_city_id") == F.col("c_id"))
        .groupBy("c_id", "c_name", "c_state_code")
        .agg(F.count("*").alias("cnt"))
    )
    t = temps.filter((F.col("t_year") == year) & (F.col("t_month") == month))
    total = travelers.agg(F.count("*").alias("total"))
    return (
        per_city.join(F.broadcast(t), F.col("t_city_id") == F.col("c_id"))
        .crossJoin(F.broadcast(total))
        .select(
            "c_name",
            "c_state_code",
            "t_average_temp_month",
            "cnt",
            pct_of("cnt", "total").alias("pct_of_total"),
        )
        .orderBy(F.col("pct_of_total").desc())
    )
