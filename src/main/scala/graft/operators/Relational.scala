package graft.operators

import org.apache.spark.sql.functions._
import graft.DeclaredQuery
import graft.sources.Tables

/** §2.2 projection/filter, §2.6 sorts/top-k, §2.7 set ops, §2.8 scalar
  * functions. All built-in Catalyst expressions — fully codegen'd, no UDFs.
  *
  * Float discipline: derived doubles are rounded identically on both
  * sides; `pow`/trig are avoided in favor of plain arithmetic (IEEE-exact
  * across engines); `ceil`/`length`/`year` results are cast to BIGINT.
  */
object Relational {

  def defs: Seq[(String, DeclaredQuery)] = Seq(

    "project_expr" -> DeclaredQuery(
      // Money rounding is floor(x*100 + 0.5)/100 spelled identically on
      // both sides: engines' native round() disagree on half-way doubles
      // (Spark = exact-BigDecimal HALF_UP, DuckDB = float-multiply) —
      // ~0.2% of rows at sf0.01. The shared IEEE formula is bit-exact.
      (s, d) => Tables.lineitem(s, d).select(
        col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        (floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5) / 100.0).as("revenue"),
        (floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")) * 100 + 0.5) / 100.0).as("charged")
        // ORDER BY covers every output column: (okey, line) is not unique
        // in the fixture, and remaining ties are then identical rows.
      ).orderBy(col("l_orderkey"), col("l_linenumber"), col("revenue"), col("charged")),
      Some("SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, " +
        "floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) / 100.0 AS revenue, " +
        "floor(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 100 + 0.5) / 100.0 AS charged " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue, charged")),

    "filter_pred" -> DeclaredQuery(
      (s, d) => Tables.orders(s, d).filter(
        (col("o_orderstatus").isin("O", "P") &&
          col("o_totalprice").between(10000.0, 200000.0) &&
          col("o_orderpriority").like("1-%")) ||
        (col("o_orderstatus") === "F" &&
          !col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW") &&
          col("o_totalprice") < 5000.0)
      ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .orderBy(col("o_orderkey")),
      Some("SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority FROM orders " +
        "WHERE (o_orderstatus IN ('O','P') AND o_totalprice BETWEEN 10000.0 AND 200000.0 " +
        "AND o_orderpriority LIKE '1-%') " +
        "OR (o_orderstatus = 'F' AND o_orderpriority NOT IN ('4-NOT SPECIFIED','5-LOW') " +
        "AND o_totalprice < 5000.0) ORDER BY o_orderkey")),

    "sort_multi" -> DeclaredQuery(
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_returnflag"), col("l_extendedprice"))
        .orderBy(asc_nulls_last("l_returnflag"), desc("l_extendedprice"),
          asc("l_orderkey"), asc("l_linenumber"))
        .limit(100),
      Some("SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_returnflag, " +
        "l_extendedprice FROM lineitem ORDER BY l_returnflag ASC NULLS LAST, " +
        "l_extendedprice DESC NULLS LAST, l_orderkey, l_linenumber LIMIT 100")),

    "topk_global" -> DeclaredQuery(
      // orderBy+limit plans as TakeOrderedAndProject: per-partition top-k
      // then a k-row driver merge — no global sort at any scale.
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          (floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5) / 100.0).as("revenue"))
        .orderBy(desc("revenue"), asc("l_orderkey"), asc("l_linenumber"))
        .limit(50),
      Some("SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, " +
        "floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) / 100.0 AS revenue FROM lineitem " +
        "ORDER BY revenue DESC NULLS LAST, l_orderkey, l_linenumber LIMIT 50")),

    "set_union_all" -> DeclaredQuery(
      (s, d) => {
        val e = Tables.events(s, d).select("event_id", "user_id", "ts", "event_type")
        e.filter(col("event_type") === "view")
          .unionByName(e.filter(col("event_type") === "click"))
          .orderBy(col("event_id"))
      },
      Some("SELECT event_id, user_id, ts, event_type FROM events WHERE event_type='view' " +
        "UNION ALL SELECT event_id, user_id, ts, event_type FROM events WHERE event_type='click' " +
        "ORDER BY event_id")),

    "set_union" -> DeclaredQuery(
      (s, d) => {
        val e = Tables.events(s, d)
        e.filter(col("event_type") === "view").select("user_id")
          .union(e.filter(col("event_type") === "click").select("user_id"))
          .distinct().orderBy(col("user_id"))
      },
      Some("SELECT user_id FROM events WHERE event_type='view' " +
        "UNION SELECT user_id FROM events WHERE event_type='click' ORDER BY user_id")),

    "set_intersect" -> DeclaredQuery(
      (s, d) => {
        val e = Tables.events(s, d).filter(col("event_type") === "purchase")
        val w1 = e.filter(col("ts") < to_timestamp(lit("2024-01-08 00:00:00"))).select("user_id")
        val w3 = e.filter(col("ts") >= to_timestamp(lit("2024-01-22 00:00:00"))).select("user_id")
        w1.intersect(w3).orderBy(col("user_id"))
      },
      Some("SELECT user_id FROM events WHERE event_type='purchase' AND ts < TIMESTAMP '2024-01-08 00:00:00' " +
        "INTERSECT SELECT user_id FROM events WHERE event_type='purchase' AND ts >= TIMESTAMP '2024-01-22 00:00:00' " +
        "ORDER BY user_id")),

    "set_except" -> DeclaredQuery(
      // High-value filter keeps the difference non-empty (every user has
      // every event type in the fixture).
      (s, d) => {
        val e = Tables.events(s, d)
        e.filter(col("event_type") === "view" && col("value") > 90.0).select("user_id")
          .except(e.filter(col("event_type") === "purchase" && col("value") > 90.0).select("user_id"))
          .orderBy(col("user_id"))
      },
      Some("SELECT user_id FROM events WHERE event_type='view' AND value > 90.0 " +
        "EXCEPT SELECT user_id FROM events WHERE event_type='purchase' AND value > 90.0 " +
        "ORDER BY user_id")),

    "fn_string" -> DeclaredQuery(
      (s, d) => Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("up_name"),
        substring(col("p_name"), 1, 5).as("pre5"),
        concat(col("p_brand"), lit("_"), col("p_type")).as("brand_type"),
        length(col("p_name")).cast("long").as("name_len"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word")
      ).orderBy(col("p_partkey")),
      Some("SELECT p_partkey, upper(p_name) AS up_name, substring(p_name, 1, 5) AS pre5, " +
        "p_brand || '_' || p_type AS brand_type, CAST(length(p_name) AS BIGINT) AS name_len, " +
        "regexp_extract(p_name, '^([a-z]+)', 1) AS first_word FROM part ORDER BY p_partkey")),

    "fn_encode" -> DeclaredQuery(
      // Binary encodings: base64 / hex / UTF-8 round-trip. hex is
      // lower()ed on both sides (Spark upper-cases, DuckDB varies by
      // input type); p_name < 76 chars so Spark's legacy chunked-base64
      // question never arises.
      (s, d) => Tables.part(s, d).select(
        col("p_partkey"),
        base64(encode(col("p_name"), "UTF-8")).as("b64"),
        lower(hex(encode(col("p_name"), "UTF-8"))).as("hx"),
        decode(unbase64(base64(encode(col("p_name"), "UTF-8"))), "UTF-8").as("rt")
      ).orderBy(col("p_partkey")),
      Some("SELECT p_partkey, to_base64(encode(p_name)) AS b64, " +
        "lower(hex(p_name)) AS hx, " +
        "decode(from_base64(to_base64(encode(p_name)))) AS rt " +
        "FROM part ORDER BY p_partkey"),
      "base64/hex encodings and a byte-exact decode round-trip"),

    "fn_date" -> DeclaredQuery(
      (s, d) => Tables.orders(s, d).select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("days_since"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30")
      ).orderBy(col("o_orderkey")),
      // DATE-vs-TIMESTAMP casting discipline: date_trunc yields TIMESTAMP
      // in Spark but DATE in DuckDB, and interval adds flip the other way
      // — both sides cast explicitly to DATE (FIXTURES.md rules).
      Some("SELECT o_orderkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start, " +
        "CAST(year(o_orderdate) AS BIGINT) AS yr, CAST(month(o_orderdate) AS BIGINT) AS mo, " +
        "CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow, " +
        "CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since, " +
        "CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus30 " +
        "FROM orders ORDER BY o_orderkey")),

    "fn_math" -> DeclaredQuery(
      // pow() is deliberately spelled x*x (IEEE-exact in every engine);
      // ln/sqrt rounded to 6dp; ceil/floor cast to BIGINT on both sides.
      (s, d) => Tables.part(s, d).select(
        col("p_partkey"),
        round(col("p_retailprice"), 1).as("r1"),
        abs(col("p_retailprice") - lit(1000.0)).as("dist1k"),
        ceil(col("p_retailprice")).as("ce"),
        floor(col("p_retailprice")).as("fl"),
        round(log(col("p_retailprice")), 6).as("lg"),
        round(sqrt(col("p_retailprice")), 6).as("sq"),
        round(col("p_retailprice") * col("p_retailprice") / lit(1000000.0), 6).as("pw")
      ).orderBy(col("p_partkey")),
      Some("SELECT p_partkey, round(p_retailprice, 1) AS r1, abs(p_retailprice - 1000.0) AS dist1k, " +
        "CAST(ceil(p_retailprice) AS BIGINT) AS ce, CAST(floor(p_retailprice) AS BIGINT) AS fl, " +
        "round(ln(p_retailprice), 6) AS lg, round(sqrt(p_retailprice), 6) AS sq, " +
        "round(p_retailprice * p_retailprice / 1000000.0, 6) AS pw FROM part ORDER BY p_partkey")),

    "fn_array" -> DeclaredQuery(
      // Every output column is a SCALAR: the driver's comparator sorts
      // rows by all columns in pandas, which cannot order an array-typed
      // cell (round-2 failure). HOF coverage is unchanged — transform /
      // slice / filter / aggregate / array_sort / array_max all execute;
      // their results surface through element_at or aggregates.
      (s, d) => Tables.embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 4).as("e1"),
        element_at(transform(slice(col("embedding"), 1, 3),
          x => round(x.cast("double"), 4)), 3).as("h3"),
        round(element_at(array_sort(transform(col("embedding"), x => x.cast("double"))), 2), 4).as("s2"),
        round(array_max(transform(col("embedding"), x => x.cast("double"))), 4).as("emax"),
        size(filter(col("embedding"), x => x > lit(0.0f))).cast("long").as("npos"),
        round(aggregate(col("embedding"), lit(0.0), (a, x) => a + x.cast("double")), 4).as("ssum")
      ).orderBy(col("vec_id")),
      // every rounded double carries "+ 0.0": DuckDB round preserves
      // -0.0, Spark's BigDecimal round never emits one (sf0.1 lesson)
      Some("SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim, " +
        "round(CAST(embedding[1] AS DOUBLE), 4) + 0.0 AS e1, " +
        "list_transform(list_slice(embedding, 1, 3), x -> round(CAST(x AS DOUBLE), 4) + 0.0)[3] AS h3, " +
        "round(list_sort(list_transform(embedding, x -> CAST(x AS DOUBLE)))[2], 4) + 0.0 AS s2, " +
        "round(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) + 0.0 AS emax, " +
        "CAST(len(list_filter(embedding, x -> x > 0.0)) AS BIGINT) AS npos, " +
        "round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) + 0.0 AS ssum " +
        "FROM embeddings ORDER BY vec_id")),

    "fn_json" -> DeclaredQuery(
      // The filter-on-parsed-value goes through Q.aggFilterBarrier:
      // without it Catalyst substitutes the alias into the pushed-down
      // predicate and the JSON document is parsed TWICE per row (once in
      // the scan filter, once in the project) — event_id is unique, so
      // the interposed min() aggregate is a no-op semantically but keeps
      // the parse single. At 100 TB, halving a per-row Jackson parse
      // dwarfs the (event_id, k)-pair shuffle the barrier costs.
      // survivors pinned before the global sort: the range exchange's
      // bounds-sampling pass would otherwise run the JSON parse a second
      // time over the full table (the barrier fence removed the exchange
      // the sampler used to read from; see llm_jaccard_pairs)
      (s, d) => graft.Q.aggFilterBarrier(
        Tables.events(s, d)
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k")),
        keys = Seq("event_id"), value = "k", cond = col("k") > 50)
        .localCheckpoint()
        .orderBy(col("event_id")),
      Some("SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events " +
        "WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50 ORDER BY event_id")),

    "fn_null" -> DeclaredQuery(
      // NULL-handling surface: coalesce / nullif / null-aware equality.
      // The join_full-style LEFT JOIN injects genuine nulls to exercise.
      (s, d) => {
        val c = Tables.customer(s, d).select("c_custkey", "c_name", "c_acctbal")
        val o = Tables.orders(s, d).filter(col("o_totalprice") > 350000.0)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("big_n"))
        c.join(o, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"),
            coalesce(col("big_n"), lit(0L)).as("big_or_zero"),
            nullif(col("c_acctbal"), lit(0.0)).as("bal_or_null"),
            col("big_n").isNull.as("no_big"),
            (col("big_n") <=> lit(1L)).as("exactly_one"))
          .orderBy(col("c_custkey"))
      },
      Some("SELECT c_custkey, coalesce(big_n, 0) AS big_or_zero, " +
        "nullif(c_acctbal, 0.0) AS bal_or_null, big_n IS NULL AS no_big, " +
        "big_n IS NOT DISTINCT FROM 1 AS exactly_one FROM customer " +
        "LEFT JOIN (SELECT o_custkey, count(*) AS big_n FROM orders " +
        "WHERE o_totalprice > 350000.0 GROUP BY o_custkey) o ON c_custkey = o_custkey " +
        "ORDER BY c_custkey")),

    "unpivot_melt" -> DeclaredQuery(
      // Wide→long melt via Dataset.unpivot (Spark's UNPIVOT) — a per-row
      // Expand, no shuffle before the final order. Both measures are cast
      // to double up front so the single value column has one type.
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"),
          col("p_retailprice").cast("double").as("p_retailprice"),
          col("p_size").cast("double").as("p_size"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_retailprice"), col("p_size")), "metric", "val")
        .orderBy(col("p_partkey"), col("metric")),
      Some("SELECT p_partkey, 'p_retailprice' AS metric, CAST(p_retailprice AS DOUBLE) AS val FROM part " +
        "UNION ALL SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part " +
        "ORDER BY p_partkey, metric"),
      "wide-to-long unpivot/melt of part measures"),

    "fn_struct" -> DeclaredQuery(
      // Struct ordering as argmax: max(struct(price, key)) is the
      // deterministic one-pass top-1-per-group — lexicographic struct
      // comparison breaks price ties by the unique key, and the hash
      // aggregate keeps shuffle volume at #groups.
      (s, d) => Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(max(struct(col("o_totalprice"), col("o_orderkey"))).as("best"))
        .select(col("o_custkey"),
          col("best.o_totalprice").as("best_price"),
          col("best.o_orderkey").as("best_okey"))
        .orderBy(col("o_custkey")),
      Some("SELECT o_custkey, o_totalprice AS best_price, o_orderkey AS best_okey FROM orders " +
        "QUALIFY row_number() OVER (PARTITION BY o_custkey " +
        "ORDER BY o_totalprice DESC, o_orderkey DESC) = 1 ORDER BY o_custkey"),
      "struct pack / field access / lexicographic argmax per group"),

    "fn_map" -> DeclaredQuery(
      // MapType surface: per-user event_type→count map assembled with
      // map_from_entries(collect_list(struct)), then key lookups.
      // collect_list order is nondeterministic but keys are unique per
      // user, so map lookups (and size) are order-independent.
      (s, d) => {
        val counts = Tables.events(s, d)
          .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
        counts.groupBy("user_id")
          .agg(map_from_entries(collect_list(struct(col("event_type"), col("n")))).as("m"))
          .select(col("user_id"),
            coalesce(element_at(col("m"), "view"), lit(0L)).as("views"),
            coalesce(element_at(col("m"), "purchase"), lit(0L)).as("purchases"),
            size(col("m")).cast("long").as("n_types"))
          .orderBy(col("user_id"))
      },
      Some("SELECT user_id, count(*) FILTER (WHERE event_type = 'view') AS views, " +
        "count(*) FILTER (WHERE event_type = 'purchase') AS purchases, " +
        "count(DISTINCT event_type) AS n_types " +
        "FROM events GROUP BY user_id ORDER BY user_id"),
      "MapType build + key lookup (map_from_entries / element_at / size)"),

    "sub_scalar" -> DeclaredQuery(
      // Uncorrelated scalar subquery — Catalyst plans the aggregate once
      // and broadcasts the single-row result into the filter. The avg is
      // rounded to 4dp on both sides so the boundary decision is shared.
      (s, d) => {
        Tables.part(s, d).createOrReplaceTempView("graft_part_ss")
        s.sql("SELECT p_partkey, p_retailprice FROM graft_part_ss " +
          "WHERE p_retailprice > (SELECT round(avg(p_retailprice), 4) FROM graft_part_ss) " +
          "ORDER BY p_partkey")
      },
      Some("SELECT p_partkey, p_retailprice FROM part " +
        "WHERE p_retailprice > (SELECT round(avg(p_retailprice), 4) FROM part) " +
        "ORDER BY p_partkey"),
      "uncorrelated scalar subquery: parts above global average price"),

    "sub_correlated" -> DeclaredQuery(
      // Correlated scalar subquery — Catalyst de-correlates it into an
      // aggregate + join (RewriteCorrelatedScalarSubquery), i.e. the same
      // shuffle-bounded plan a hand-written self-join would produce; no
      // per-row re-execution at any scale. max() is exact, so no rounding
      // is needed for the equality.
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("graft_orders_sc")
        s.sql("SELECT o_custkey, o_orderkey, o_totalprice FROM graft_orders_sc o " +
          "WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM graft_orders_sc o2 " +
          "WHERE o2.o_custkey = o.o_custkey) ORDER BY o_orderkey")
      },
      Some("SELECT o_custkey, o_orderkey, o_totalprice FROM orders o " +
        "WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2 " +
        "WHERE o2.o_custkey = o.o_custkey) ORDER BY o_orderkey"),
      "correlated scalar subquery: each customer's max-price orders"),

    "fn_case" -> DeclaredQuery(
      (s, d) => Tables.orders(s, d)
        .select(when(col("o_totalprice") >= 300000.0, "high")
          .when(col("o_totalprice") >= 100000.0, "mid")
          .otherwise("low").as("bucket"),
          col("o_totalprice"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("bucket")),
      Some("SELECT CASE WHEN o_totalprice >= 300000.0 THEN 'high' " +
        "WHEN o_totalprice >= 100000.0 THEN 'mid' ELSE 'low' END AS bucket, " +
        "count(*) AS n, round(sum(o_totalprice), 2) AS total FROM orders " +
        "GROUP BY 1 ORDER BY bucket")),

    "fn_regex" -> DeclaredQuery(
      // Regex surface: extract / replace / match-filter. The priority
      // prefix matches on EVERY row, so the engines' no-match conventions
      // (Spark '' vs DuckDB NULL) never come into play.
      (s, d) => Tables.orders(s, d)
        .filter(col("o_orderpriority").rlike("^[0-9]-"))
        .select(col("o_orderkey"),
          regexp_extract(col("o_orderpriority"), "^([0-9])-", 1).as("prio_num"),
          regexp_replace(col("o_orderpriority"), "[AEIOU]", "").as("devoweled"))
        .orderBy(col("o_orderkey")),
      Some("SELECT o_orderkey, regexp_extract(o_orderpriority, '^([0-9])-', 1) AS prio_num, " +
        "regexp_replace(o_orderpriority, '[AEIOU]', '', 'g') AS devoweled " +
        "FROM orders WHERE regexp_matches(o_orderpriority, '^[0-9]-') ORDER BY o_orderkey"),
      "regexp_extract / regexp_replace / regex match filter"),

    "fn_hash" -> DeclaredQuery(
      // Deterministic digests — the content-addressing primitive under
      // exact dedup and fingerprinting. Pure per-row projection.
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text")).as("h_md5"),
          sha2(col("text"), 256).as("h_sha256"))
        .orderBy(col("doc_id")),
      Some("SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256 " +
        "FROM documents ORDER BY doc_id"),
      "cryptographic digest functions (md5 / sha-256)"),

    "fn_bitwise" -> DeclaredQuery(
      // Bitwise ops — bucket assignment / flag packing primitives (the
      // LSH band and SimHash machinery is built from exactly these).
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          (col("o_orderkey").bitwiseAND(255L)).as("b_and"),
          (col("o_orderkey").bitwiseOR(4096L)).as("b_or"),
          (col("o_orderkey").bitwiseXOR(col("o_custkey"))).as("b_xor"),
          shiftleft(col("o_orderkey"), 2).as("b_shl"),
          shiftright(col("o_orderkey"), 3).as("b_shr"),
          bit_count(col("o_orderkey")).cast("long").as("b_pop"),
          (col("o_orderkey") % 97L).as("b_mod"))
        .orderBy(col("o_orderkey")),
      Some("SELECT o_orderkey, o_orderkey & 255 AS b_and, o_orderkey | 4096 AS b_or, " +
        "xor(o_orderkey, o_custkey) AS b_xor, o_orderkey << 2 AS b_shl, " +
        "o_orderkey >> 3 AS b_shr, CAST(bit_count(o_orderkey) AS BIGINT) AS b_pop, " +
        "o_orderkey % 97 AS b_mod FROM orders ORDER BY o_orderkey"),
      "bitwise and/or/xor/shift/popcount/mod"),

    "fn_interval" -> DeclaredQuery(
      // Calendar arithmetic: month-add clamps to month end identically on
      // both engines (Jan 31 + 1 month = Feb 29); dayofweek is Spark
      // 1-based Sunday vs DuckDB dow 0-based Sunday, bridged with +1.
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          (col("o_orderdate") + expr("INTERVAL 3 MONTHS")).as("ship_by"),
          datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
            .cast("long").as("days_to_ref"),
          last_day(col("o_orderdate")).as("eom"),
          dayofweek(col("o_orderdate")).cast("long").as("dow"))
        .orderBy(col("o_orderkey")),
      Some("SELECT o_orderkey, o_orderdate + INTERVAL 3 MONTH AS ship_by, " +
        "CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to_ref, " +
        "last_day(o_orderdate) AS eom, " +
        "CAST(date_part('dow', o_orderdate) + 1 AS BIGINT) AS dow " +
        "FROM orders ORDER BY o_orderkey"),
      "interval add / datediff / last_day / day-of-week arithmetic"),

    "fn_array_set" -> DeclaredQuery(
      // Array set algebra (union/intersect/except), all DISTINCT + sorted
      // + string-joined: Spark's array set ops return distinct elements
      // in discovery order, so the in-row sort is what makes the value
      // deterministic and the string form keeps the comparator scalar.
      (s, d) => {
        val a = array(col("o_orderkey") % 5, col("o_orderkey") % 7, col("o_orderkey") % 11)
        val b = array(col("o_orderkey") % 3, col("o_orderkey") % 5)
        Tables.orders(s, d).select(col("o_orderkey"),
          array_join(array_sort(array_union(a, b)), ",").as("u"),
          array_join(array_sort(array_intersect(a, b)), ",").as("i"),
          array_join(array_sort(array_except(a, b)), ",").as("x"),
          array_contains(a, col("o_orderkey") % 3).as("has3"))
          .orderBy(col("o_orderkey"))
      },
      // every array_to_string is coalesce()d: DuckDB returns NULL for an
      // empty list where Spark's array_join returns ''
      Some("SELECT o_orderkey, " +
        "coalesce(array_to_string(list_sort(list_distinct(list_concat(" +
        "[o_orderkey % 5, o_orderkey % 7, o_orderkey % 11], [o_orderkey % 3, o_orderkey % 5]))), ','), '') AS u, " +
        "coalesce(array_to_string(list_sort(list_distinct(list_intersect(" +
        "[o_orderkey % 5, o_orderkey % 7, o_orderkey % 11], [o_orderkey % 3, o_orderkey % 5]))), ','), '') AS i, " +
        "coalesce(array_to_string(list_sort(list_distinct(list_filter(" +
        "[o_orderkey % 5, o_orderkey % 7, o_orderkey % 11], " +
        "t -> NOT list_contains([o_orderkey % 3, o_orderkey % 5], t)))), ','), '') AS x, " +
        "list_contains([o_orderkey % 5, o_orderkey % 7, o_orderkey % 11], o_orderkey % 3) AS has3 " +
        "FROM orders ORDER BY o_orderkey"),
      "array set algebra: union / intersect / except / contains"),

    "sort_nulls" -> DeclaredQuery(
      // Explicit null-ordering control; value is null on ~10% of events.
      // Tie-break on event_id keeps the order total on both engines.
      (s, d) => Tables.events(s, d)
        .filter(col("user_id") < 3)
        .select(col("event_id"), col("user_id"), col("value"))
        .orderBy(col("value").asc_nulls_first, col("event_id").asc),
      Some("SELECT event_id, user_id, value FROM events WHERE user_id < 3 " +
        "ORDER BY value ASC NULLS FIRST, event_id"),
      "ORDER BY with explicit NULLS FIRST placement"),

    "limit_offset" -> DeclaredQuery(
      // Pagination: total order → skip 50 → take 100. At scale Spark
      // plans a single TakeOrderedAndProject(limit=offset+k) — no global
      // sort materialization for page reads.
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
        .offset(50).limit(100),
      Some("SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey " +
        "LIMIT 100 OFFSET 50"),
      "LIMIT/OFFSET pagination over a total order"),

    "set_intersect_all" -> DeclaredQuery(
      // Multiset intersection — duplicates preserved by multiplicity min,
      // vs set_intersect's dedup. Spark plans both as a single shuffle.
      (s, d) => {
        val lo = Tables.orders(s, d).filter(col("o_totalprice") < 200000.0)
          .select(col("o_custkey"))
        val hi = Tables.orders(s, d).filter(col("o_totalprice") > 100000.0)
          .select(col("o_custkey"))
        lo.intersectAll(hi).orderBy(col("o_custkey"))
      },
      Some("SELECT o_custkey FROM orders WHERE o_totalprice < 200000.0 " +
        "INTERSECT ALL SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0 " +
        "ORDER BY o_custkey"),
      "INTERSECT ALL (multiset semantics, multiplicities preserved)"),

    "set_except_all" -> DeclaredQuery(
      (s, d) => {
        val all = Tables.orders(s, d).select(col("o_custkey"))
        val hi = Tables.orders(s, d).filter(col("o_totalprice") > 100000.0)
          .select(col("o_custkey"))
        all.exceptAll(hi).orderBy(col("o_custkey"))
      },
      Some("SELECT o_custkey FROM orders " +
        "EXCEPT ALL SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0 " +
        "ORDER BY o_custkey"),
      "EXCEPT ALL (multiset difference by multiplicity)")
  )
}
