package graft.ops

import org.apache.spark.sql.functions._

/** Scalar function inventory: string / date / math / array / json
  * (SURVEY.md §2.3). Integer-width casts align Spark (int) with DuckDB
  * (BIGINT); regex-based functions are deliberately absent from the
  * oracle-matched set (dialects differ, SURVEY.md §7.3). All of these stay
  * inside whole-stage codegen — no UDFs.
  */
object FuncOps {

  val queries: Map[String, QB] = Map(
    "q_str_funcs" -> ((s, d) =>
      table(s, d, "part")
        .select(col("p_partkey"),
          upper(col("p_name")).as("up"),
          lower(col("p_brand")).as("lo"),
          substring(col("p_name"), 1, 4).as("pre"),
          length(col("p_name")).cast("long").as("len"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("tag"),
          trim(col("p_name")).as("trimmed"),
          translate(col("p_name"), " ", "_").as("und"))
        .orderBy("p_partkey")),

    "q_date_funcs" -> ((s, d) =>
      table(s, d, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          date_trunc("month", col("o_orderdate")).cast("date").as("mon"),
          col("o_orderdate").cast("date").as("dt"))
        .orderBy("o_orderkey")),

    // Calendar arithmetic: day/month shifts and quarter truncation.
    "q_date_shift" -> ((s, d) =>
      table(s, d, "orders")
        .select(col("o_orderkey"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus_30d"),
          add_months(col("o_orderdate").cast("date"), 3).as("plus_3m"),
          date_trunc("quarter", col("o_orderdate")).cast("date").as("qtr"),
          last_day(col("o_orderdate").cast("date")).as("month_end"))
        .orderBy("o_orderkey")),

    // Wide→long reshaping via unpivot/melt; oracle is the UNION ALL
    // equivalent (identical semantics, no dialect risk).
    "q_unpivot" -> ((s, d) =>
      spreadTable(s, d, "lineitem", col("l_orderkey"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
                "l_tax")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "metric", "value")),

    // Date arithmetic across a join: shipping delay in days per order year.
    "q_date_arith" -> ((s, d) =>
      table(s, d, "orders")
        .join(table(s, d, "lineitem"),
              col("o_orderkey") === col("l_orderkey"))
        .withColumn("delay_days",
          datediff(col("l_shipdate").cast("date"),
                   col("o_orderdate").cast("date")).cast("long"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(count(lit(1)).as("n"),
             min(col("delay_days")).as("min_delay"),
             max(col("delay_days")).as("max_delay"),
             r6(sum(col("delay_days")).cast("double") /
                count(col("delay_days"))).as("avg_delay"))
        .orderBy("o_year")),

    "q_math_funcs" -> ((s, d) =>
      table(s, d, "part")
        .select(col("p_partkey"),
          r6(col("p_retailprice") / 7.0).as("div7"),
          abs(col("p_retailprice") - 1000.0).as("ab"),
          floor(col("p_retailprice")).as("fl"),
          ceil(col("p_retailprice")).as("ce"),
          r6(sqrt(col("p_retailprice"))).as("sq"),
          r6(log(col("p_retailprice"))).as("lg"),
          r6(pow(col("p_size"), 2.0)).as("pw"))
        .orderBy("p_partkey")),

    "q_array_funcs" -> ((s, d) =>
      table(s, d, "embeddings")
        .select(col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          element_at(col("embedding"), 1).cast("double").as("first"),
          element_at(col("embedding"), -1).cast("double").as("last"),
          size(filter(col("embedding"), x => x > lit(0.0f)))
            .cast("long").as("n_pos"))
        .orderBy("vec_id")),

    // Array manipulation beyond element access: slice, concat, sort,
    // position, contains-by-predicate. Array results are comma-joined to
    // strings on both engines — array-typed columns break the driver's
    // pandas hash compare.
    "q_array_manip" -> ((s, d) =>
      table(s, d, "documents")
        .withColumn("tok", split(col("text"), " "))
        .select(col("doc_id"),
          array_join(slice(col("tok"), 1, 3), ",").as("head3"),
          // start index computed like the oracle's greatest(len-1, 1) so a
          // single-token doc yields [t, t] on both engines (Spark's
          // slice(-2, 2) would return [] there while DuckDB keeps [t]).
          array_join(
            concat(slice(col("tok"), 1, 2),
                   slice(col("tok"), greatest(size(col("tok")) - 1, lit(1)),
                         lit(2))), ",").as("ends"),
          array_join(sort_array(array_distinct(slice(col("tok"), 1, 10))), ",")
            .as("sorted10"),
          array_position(col("tok"), "data").cast("long").as("pos_data"),
          exists(col("tok"), t => length(t) > 6).as("has_long_tok"))
        .orderBy("doc_id")),

    // Lateral explode with position (posexplode / unnest WITH ORDINALITY):
    // array → rows, keeping the element index — the flatten step before
    // any per-token processing. Generate preserves the input partitioning
    // (no shuffle); output is bounded to the first 8 tokens per doc.
    "q_explode" -> ((s, d) =>
      table(s, d, "documents")
        .select(col("doc_id"),
          posexplode(slice(split(col("text"), " "), 1, 8)))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
                col("col").as("tok"))
        .orderBy("doc_id", "pos")),

    "q_json_funcs" -> ((s, d) =>
      spreadTable(s, d, "events", col("event_id"))
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")),

    // Map-typed column: JSON parsed schema-on-read into MAP<STRING,BIGINT>
    // and worked on with native map functions (keys/values/element/size) —
    // the dynamic-keys sibling of q_json_struct's fixed-schema struct.
    // Map key order follows JSON document order in both engines.
    // Parity contract: the oracle quotes each key into its JSON path
    // ('$."k"'), so keys containing path metacharacters compare correctly;
    // values must all be integers — from_json(MAP<STRING,BIGINT>) nulls
    // the whole map on one non-integer value while the oracle CASTs per
    // key (the events fixture is integer-valued by construction).
    "q_map_funcs" -> ((s, d) =>
      spreadTable(s, d, "events", col("event_id"))
        .withColumn("m", from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.LongType)))
        .select(col("event_id"),
          size(col("m")).cast("long").as("n_keys"),
          array_join(map_keys(col("m")), ",").as("keys"),
          element_at(col("m"), "k").as("k_val"),
          expr("aggregate(map_values(m), CAST(0 AS BIGINT), (a, x) -> a + x)")
            .as("val_sum"))
        .orderBy("event_id")),

    // Typed JSON parsing: from_json into a struct, then field access —
    // the schema-on-read path for semi-structured columns (vs the
    // path-extraction of q_json_funcs).
    "q_json_struct" -> ((s, d) =>
      table(s, d, "events")
        .withColumn("j", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(col("j.k")).as("sum_k"),
             min(col("j.k")).as("min_k"),
             max(col("j.k")).as("max_k"))
        .orderBy("event_type")),
  )

  val oracles: Map[String, String] = Map(
    "q_str_funcs" -> """
      SELECT p_partkey,
             upper(p_name) AS up, lower(p_brand) AS lo,
             substr(p_name, 1, 4) AS pre, length(p_name) AS len,
             concat(p_brand, ':', p_type) AS tag, trim(p_name) AS trimmed,
             replace(p_name, ' ', '_') AS und
      FROM part
      ORDER BY p_partkey""",

    "q_date_funcs" -> """
      SELECT o_orderkey,
             year(o_orderdate) AS y, month(o_orderdate) AS m,
             day(o_orderdate) AS dom,
             date_trunc('month', o_orderdate) AS mon,
             CAST(o_orderdate AS DATE) AS dt
      FROM orders
      ORDER BY o_orderkey""",

    "q_date_shift" -> """
      SELECT o_orderkey,
             CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE)
               AS plus_30d,
             CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
               AS plus_3m,
             CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qtr,
             last_day(CAST(o_orderdate AS DATE)) AS month_end
      FROM orders
      ORDER BY o_orderkey""",

    "q_unpivot" -> """
      SELECT l_orderkey, l_linenumber, metric, value FROM (
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
               l_quantity AS value FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
      ORDER BY l_orderkey, l_linenumber, metric, value""",

    "q_date_arith" -> """
      WITH j AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               date_diff('day', CAST(o_orderdate AS DATE),
                         CAST(l_shipdate AS DATE)) AS delay_days
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
      SELECT o_year, count(*) AS n,
             min(delay_days) AS min_delay, max(delay_days) AS max_delay,
             round(CAST(sum(delay_days) AS DOUBLE) / count(delay_days), 6)
               AS avg_delay
      FROM j
      GROUP BY o_year
      ORDER BY o_year""",

    "q_math_funcs" -> """
      SELECT p_partkey,
             round(p_retailprice / 7.0, 6) AS div7,
             abs(p_retailprice - 1000.0) AS ab,
             CAST(floor(p_retailprice) AS BIGINT) AS fl,
             CAST(ceil(p_retailprice) AS BIGINT) AS ce,
             round(sqrt(p_retailprice), 6) AS sq,
             round(ln(p_retailprice), 6) AS lg,
             round(power(p_size, 2.0), 6) AS pw
      FROM part
      ORDER BY p_partkey""",

    "q_array_funcs" -> """
      SELECT vec_id,
             CAST(len(embedding) AS BIGINT) AS dim,
             CAST(embedding[1] AS DOUBLE) AS first,
             CAST(embedding[-1] AS DOUBLE) AS last,
             CAST(len(list_filter(embedding, x -> x > 0.0)) AS BIGINT) AS n_pos
      FROM embeddings
      ORDER BY vec_id""",

    "q_array_manip" -> """
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok
                 FROM documents)
      SELECT doc_id,
             array_to_string(tok[1:3], ',') AS head3,
             array_to_string(list_concat(tok[1:2],
                         tok[greatest(len(tok)-1, 1):len(tok)]), ',') AS ends,
             array_to_string(list_sort(list_distinct(tok[1:10])), ',')
               AS sorted10,
             CAST(coalesce(list_position(tok, 'data'), 0) AS BIGINT)
               AS pos_data,
             len(list_filter(tok, t2 -> length(t2) > 6)) > 0
               AS has_long_tok
      FROM t
      ORDER BY doc_id""",

    "q_explode" -> """
      WITH t AS (SELECT doc_id, string_split(text, ' ')[1:8] AS tok
                 FROM documents)
      SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, u.tok AS tok
      FROM (SELECT doc_id,
                   unnest(list_transform(range(1, len(tok) + 1),
                     i -> {'pos': i - 1, 'tok': tok[i]})) AS u
            FROM t)
      ORDER BY doc_id, pos""",

    "q_json_funcs" -> """
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
      ORDER BY event_id""",

    "q_map_funcs" -> """
      SELECT event_id,
             CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
             array_to_string(json_keys(props), ',') AS keys,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
             CAST(list_sum(list_transform(json_keys(props),
                    kk -> CAST(json_extract(props, '$."' || kk || '"')
                               AS BIGINT)))
                  AS BIGINT) AS val_sum
      FROM events
      ORDER BY event_id""",

    "q_json_struct" -> """
      WITH j AS (SELECT event_type,
                        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
                 FROM events)
      SELECT event_type, count(*) AS n,
             CAST(sum(k) AS BIGINT) AS sum_k,
             min(k) AS min_k, max(k) AS max_k
      FROM j
      GROUP BY event_type
      ORDER BY event_type""",
  )
}
