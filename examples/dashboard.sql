-- A ClickHouse "saved dashboard": the query shapes a reference-stack
-- user actually has in Grafana/metabase panels and cron reports, kept
-- VERBATIM in the ClickHouse dialect. Every statement here runs
-- unchanged through Engine.ch_sql / tools/run_ch_sql.py against the
-- engine's tables (tests/test_examples.py executes this file
-- end-to-end on the sf0.001 fixtures; statements split on ';').
--
-- Table schemas (driver fixtures): events(event_id, ts, user_id,
-- event_type, value, props), orders/customer/lineitem = TPC-H-ish,
-- documents(doc_id, source, text, n_chars, ...).

-- 1. traffic by hour, last-N-days style window
SELECT toStartOfHour(ts) AS h, count() AS hits, uniq(user_id) AS visitors
FROM events
WHERE ts > now() - INTERVAL 3000 DAY
GROUP BY h ORDER BY h LIMIT 100;

-- 2. event mix with CTR-style conditional ratios
SELECT event_type,
       count() AS n,
       countIf(value > 0) AS with_value,
       round(countIf(value > 0) / count(), 4) AS ratio
FROM events GROUP BY event_type ORDER BY n DESC;

-- 3. top users by activity with a bar sparkline
SELECT user_id, count() AS c, bar(count(), 0, 100, 20) AS spark
FROM events GROUP BY user_id ORDER BY c DESC, user_id ASC LIMIT 10;

-- 4. daily actives with WITH FILL-style gap handling (spine via WITH FILL)
SELECT toDate(ts) AS d, uniq(user_id) AS dau
FROM events GROUP BY d ORDER BY d WITH FILL;

-- 5. p50/p95/p99 latency-style quantiles per event type
SELECT event_type, quantiles(0.5, 0.95, 0.99)(value) AS q
FROM events WHERE value IS NOT NULL GROUP BY event_type;

-- 6. funnel depth histogram, 1-day conversion window
SELECT depth, count() AS n_users FROM (
  SELECT user_id,
         windowFunnel(86400)(ts, event_type = 'signup',
                             event_type = 'click',
                             event_type = 'purchase') AS depth
  FROM events
  WHERE event_type IN ('signup', 'click', 'purchase')
  GROUP BY user_id
) GROUP BY depth ORDER BY depth;

-- 7. signup -> purchase conversion flag per user
SELECT countIf(m) AS converted, count() AS total FROM (
  SELECT user_id,
         sequenceMatch('(?1).*(?2)')(ts, event_type = 'signup',
                                     event_type = 'purchase') AS m
  FROM events GROUP BY user_id
);

-- 8. retention pairs (ever signed up x ever purchased).
-- r[1] / r[2] are ClickHouse's 1-BASED subscripts — inside ch_sql the
-- dialect wins (they translate to element_at).
SELECT sum(r[1]) AS signed_up, sum(r[2]) AS retained FROM (
  SELECT user_id, retention(event_type = 'signup',
                            event_type = 'purchase') AS r
  FROM events GROUP BY user_id
);

-- 9. revenue by month with totals row
SELECT toYYYYMM(o_orderdate) AS ym,
       round(sum(o_totalprice), 2) AS revenue
FROM orders GROUP BY ym WITH TOTALS ORDER BY ym;

-- 10. top order priorities per status (parametric topK)
SELECT o_orderstatus, topK(3)(o_orderpriority) AS top_prios
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus;

-- 11. biggest customers via ANY-join enrichment
SELECT c.c_name, sum(o.o_totalprice) AS spend
FROM orders o INNER JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_name ORDER BY spend DESC, c.c_name ASC LIMIT 5;

-- 12. one row per status: the first order (DISTINCT ON)
SELECT DISTINCT ON (o_orderstatus) o_orderstatus, o_orderkey, o_orderdate
FROM orders ORDER BY o_orderstatus, o_orderdate, o_orderkey;

-- 13. device share from the JSON props blob
SELECT JSONExtractString(props, 'device') AS device, count() AS n
FROM events GROUP BY device ORDER BY n DESC LIMIT 5;

-- 14. order-size casting and readable formatting
SELECT o_orderkey, o_totalprice::UInt32 AS price_int,
       formatReadableQuantity(o_totalprice) AS pretty
FROM orders ORDER BY o_totalprice DESC LIMIT 5;

-- 15. per-source document quality panel
SELECT source, count() AS docs,
       round(avg(n_chars), 1) AS avg_chars,
       quantile(n_chars) AS median_chars
FROM documents GROUP BY source ORDER BY docs DESC;

-- 16. tokens of the longest documents (ARRAY JOIN + LIMIT BY)
SELECT source, tok, count() AS n
FROM documents
ARRAY JOIN splitByChar(' ', text) AS tok
PREWHERE n_chars > 200
GROUP BY source, tok
ORDER BY n DESC, source ASC, tok ASC
LIMIT 2 BY source;

-- 17. weekly cohort-style bucketing with relative day numbers
SELECT toMonday(ts) AS week, uniq(user_id) AS wau
FROM events GROUP BY week ORDER BY week;

-- 18. hour-of-day heat strip
SELECT toHour(ts) AS hod, count() AS n, bar(count(), 0, 5000, 10) AS strip
FROM events GROUP BY hod ORDER BY hod;

-- 19. value deltas per user (in-frame window spelling)
SELECT user_id, ts, value,
       value - lagInFrame(value, 1, 0.0)
               OVER (PARTITION BY user_id ORDER BY ts) AS delta
FROM events ORDER BY user_id, ts LIMIT 20;

-- 20. parameter-free health check the CLI runs
SELECT count() AS total_events,
       uniqExact(user_id) AS exact_users,
       min(ts) AS first_event, max(ts) AS last_event
FROM events;

-- 21. subquery dialect: funnel depth per user computed in a derived
-- table, converted users counted outside
SELECT countIf(depth >= 2) AS reached_step2, count() AS funnel_users
FROM (
  SELECT user_id,
         windowFunnel(86400)(ts, event_type = 'signup',
                             event_type = 'click') AS depth
  FROM events PREWHERE event_type IN ['signup', 'click']
  GROUP BY user_id
);

-- 22. bracket literals + 1-based subscripts + interval constructors
SELECT ['mon','tue','wed','thu','fri','sat','sun'][toDayOfWeek(ts)] AS dow,
       count() AS n
FROM events
WHERE ts > now() - toIntervalYear(10)
GROUP BY dow ORDER BY n DESC;

-- 23. per-branch dialect in a UNION: high- vs low-value traffic
SELECT 'high' AS segment, count() AS n FROM events PREWHERE value > 100
UNION ALL
SELECT 'low' AS segment, count() AS n FROM events PREWHERE value <= 100;

-- 24. DDSketch quantiles: the deterministic approximate-latency panel
SELECT event_type,
       round(chDDQuantile(sk, 0.5), 2) AS p50,
       round(chDDQuantile(sk, 0.99), 2) AS p99
FROM (
  SELECT event_type,
         map_from_entries(array_sort(collect_list(struct(k, c)))) AS sk
  FROM (
    SELECT event_type,
           toInt32(1048576 + ceil(ln(value) / ln(1.0202020202020203))) AS k,
           count() AS c
    FROM events WHERE value > 0 GROUP BY event_type, k
  ) GROUP BY event_type
) ORDER BY event_type;

-- 25. weekly traffic with ClickHouse mode-0 week numbers and ISO years
SELECT toISOYear(ts) AS iso_year, toWeek(ts) AS week_no,
       count() AS hits, uniq(user_id) AS visitors
FROM events GROUP BY iso_year, week_no
ORDER BY iso_year, week_no LIMIT 60;

-- 26. latest event per user (DISTINCT ON with a paged trailing limit)
SELECT DISTINCT ON (user_id) user_id, event_id, event_type, value
FROM events
ORDER BY user_id, event_id DESC
LIMIT 10 OFFSET 5;

-- 27. strict funnel health: how deep users get without detours
SELECT depth, count() AS users
FROM (
  SELECT user_id,
         windowFunnel(86400, 'strict_order')(
           ts, event_type = 'view', event_type = 'click',
           event_type = 'purchase') AS depth
  FROM events GROUP BY user_id
) GROUP BY depth WITH TOTALS ORDER BY depth;

-- 28. first numeric token of props, via extract's capture-group form
SELECT extract(props, '"plan": "([a-z]+)"') AS plan, count() AS n
FROM events GROUP BY plan ORDER BY n DESC LIMIT 5;

-- 29. top spenders keeping ties (LIMIT WITH TIES)
SELECT user_id, round(sum(value), 2) AS spend
FROM events GROUP BY user_id
ORDER BY spend DESC LIMIT 5 WITH TIES;

-- 30. token positions via zipped ARRAY JOIN (parallel arrays iterate
-- in lock-step, not a cross product)
SELECT tok, pos, count() AS n
FROM documents
ARRAY JOIN splitByChar(' ', text) AS tok,
           arrayEnumerate(splitByChar(' ', text)) AS pos
WHERE pos <= 2
GROUP BY tok, pos ORDER BY n DESC, tok, pos LIMIT 10;

-- 31. per-type cumulative daily revenue as an array panel
SELECT event_type,
       arrayCumSum(groupArray(10)(d_rev)) AS running
FROM (
  SELECT event_type, toDate(ts) AS d, round(sum(value), 2) AS d_rev
  FROM events GROUP BY event_type, d ORDER BY event_type, d
) GROUP BY event_type ORDER BY event_type;

-- 32. positional accumulators over per-row token vectors (-ForEach):
-- char totals of each document's first three tokens, position-wise
SELECT source,
       sumForEach(arrayMap(w -> length(w),
                           arraySlice(splitByChar(' ', text), 1, 3)))
         AS first3_tok_chars
FROM documents GROUP BY source ORDER BY source LIMIT 10;

-- 33. calendar bookkeeping corner functions per day
SELECT toDate(ts) AS d,
       toInt64(toModifiedJulianDay(toString(toDate(ts)))) AS mjd,
       toStartOfISOYear(ts) AS iso_year_start,
       addQuarters(toStartOfYear(ts), 2) AS h2_start,
       count() AS n
FROM events GROUP BY d, mjd, iso_year_start, h2_start
ORDER BY d LIMIT 10;

-- 34. per-source vocabulary via stacked combinators (no token explode)
SELECT source,
       toInt64(uniqArray(splitByChar(' ', text))) AS vocab,
       toInt64(uniqArrayIf(splitByChar(' ', text), lang = 'en')) AS en_vocab,
       count() AS n_docs
FROM documents GROUP BY source ORDER BY source LIMIT 10;

-- 35. event-mix map report: per-day type->count maps, merged and
-- gap-filled with map algebra
SELECT mapSort(sumMap(m)) AS event_mix
FROM (
  SELECT map(event_type, count()) AS m
  FROM events GROUP BY toDate(ts), event_type
);

-- 36. correlation matrix panel between value and hour-of-day
SELECT corrMatrix(value, toHour(ts) + 0.0) AS m
FROM events WHERE value IS NOT NULL;

-- 37. ops monitoring via star modifiers: per-type extrema for every
-- metric column without spelling the schema (expands server-side)
SELECT event_type,
       * EXCEPT (event_type, ts, props) APPLY (max),
       COLUMNS('^value$') APPLY (min)
FROM events GROUP BY event_type ORDER BY event_type LIMIT 10;

-- 38. strict adjacency conversions: click immediately followed by
-- purchase with NO other tracked event in between (sequenceCount NFA)
SELECT c_adjacent, count() AS n_users FROM (
  SELECT user_id,
         sequenceCount('(?1)(?2)')(ts, event_type = 'click',
                                   event_type = 'purchase',
                                   event_type = 'view') AS c_adjacent
  FROM events WHERE event_type IN ('click', 'purchase', 'view')
  GROUP BY user_id
) GROUP BY c_adjacent ORDER BY c_adjacent;

-- 39. deadline conversions: click-to-purchase chains completing within
-- an hour, greedy non-overlapping with exact re-anchoring (timed NFA)
SELECT countIf(c > 0) AS converting_users,
       count() AS tracked_users,
       round(avg(c), 4) AS avg_conversions
FROM (
  SELECT user_id,
         sequenceCount('(?1)(?t<=3600)(?2)')(
           ts, event_type = 'click', event_type = 'purchase') AS c
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY user_id
);

-- 40. freshness-weighted activity score: each user's running
-- exponentially-decayed event count/value (1-hour decay) at their
-- latest event — the "how hot is this user right now" panel (r7
-- exponentialTimeDecayed window family)
SELECT user_id,
       round(max(decayed_count), 4) AS hotness,
       round(max(decayed_value), 4) AS weighted_value
FROM (
  SELECT user_id,
         exponentialTimeDecayedCount(3600)(ts)
           OVER w AS decayed_count,
         exponentialTimeDecayedSum(3600)(coalesce(value, 0), ts)
           OVER w AS decayed_value
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
GROUP BY user_id ORDER BY hotness DESC, user_id LIMIT 10;

-- 41. value histogram per fixed bucket, one row per event type — the
-- -Resample combinator expanding onto -If spellings (r7)
SELECT event_type,
       countResample(0, 100, 25)(value) AS bucket_counts,
       sumResample(0, 100, 25)(value, value) AS bucket_sums
FROM events WHERE value IS NOT NULL
GROUP BY event_type ORDER BY event_type;

-- 42. typo-tolerant search-term triage: closest vocabulary token for
-- misspelled queries (r7 damerauLevenshteinDistance pandas UDF;
-- vocabulary-first so the DP runs on distinct tokens only)
SELECT probe,
       min(damerauLevenshteinDistance(tok, probe)) AS best_dist,
       countIf(damerauLevenshteinDistance(tok, probe) <= 1) AS near_hits
FROM (
  SELECT DISTINCT arrayJoin(splitByChar(' ', text)) AS tok
  FROM documents
) CROSS JOIN (
  SELECT arrayJoin(['qurey', 'custmer', 'striam']) AS probe
)
GROUP BY probe ORDER BY probe;

-- 43. hostname hygiene for crawl intake: IDNA-normalized domains and
-- CIDR membership for a allow-range (r7 idnaEncode / isIPAddressInRange)
SELECT idnaEncode('München.DE') AS ascii_host,
       punycodeEncode('München') AS puny_label,
       isIPAddressInRange('192.168.1.5', '192.168.0.0/16') AS in_cidr,
       toIPv6('2001:0db8::0001') AS v6_norm;

-- 44. pre-aggregated rollup tree: per-(flag, status) partial states
-- re-merged per flag — the AggregatingMergeTree write/read pair in
-- ad-hoc SQL (r7 -State/-Merge combinators)
SELECT l_returnflag,
       sumMerge(sq) AS qty,
       uniqMerge(us) AS suppliers,
       CAST(avgMerge(ap) AS DOUBLE) AS avg_price
FROM (
  SELECT l_returnflag, l_linestatus,
         sumState(l_quantity) AS sq,
         uniqState(l_suppkey) AS us,
         avgState(l_extendedprice) AS ap
  FROM lineitem GROUP BY l_returnflag, l_linestatus
)
GROUP BY l_returnflag ORDER BY l_returnflag;

-- 45. classifier-quality panel: does event value separate purchases?
-- (r7 arrayROCAUC midrank fold + arrayPRAUC rectangle rule)
SELECT round(arrayROCAUC(groupArray(value),
                         groupArray(if(event_type = 'purchase', 1, 0))),
             4) AS roc_auc,
       round(arrayPRAUC(groupArray(value),
                        groupArray(if(event_type = 'purchase', 1, 0))),
             4) AS pr_auc
FROM events WHERE value IS NOT NULL;

-- 46. 5-minute tumbling-window load board with origin-anchored
-- 15-minute buckets for the ops rotation (r7 tumble family)
SELECT tumbleStart(ts, INTERVAL 5 MINUTE) AS w_start,
       count() AS events,
       uniqExact(user_id) AS users
FROM events
GROUP BY w_start ORDER BY events DESC, w_start LIMIT 10;

-- 47. sliding-window load board (r8 hop windows): 10-minute windows
-- every 5 minutes — each event lands in 2 overlapping windows
SELECT hopStart(hop(ts, INTERVAL 5 MINUTE, INTERVAL 10 MINUTE)) AS ws,
       count() AS events
FROM events
GROUP BY hop(ts, INTERVAL 5 MINUTE, INTERVAL 10 MINUTE)
ORDER BY events DESC, ws LIMIT 10;

-- 48. day-over-day retention via the bitmap set algebra (r8)
SELECT a.day AS day,
       bitmapCardinality(a.users) AS dau,
       bitmapAndCardinality(a.users, b.users) AS retained
FROM (SELECT toDate(ts) AS day, bitmapBuild(groupUniqArray(user_id)) AS users
      FROM events GROUP BY toDate(ts)) a
JOIN (SELECT toDate(ts) AS day, bitmapBuild(groupUniqArray(user_id)) AS users
      FROM events GROUP BY toDate(ts)) b ON b.day = a.day + 1
ORDER BY day LIMIT 10;

-- 49. hourly conditional revenue buckets in one aggregation pass
-- (r8 -Resample x -If stacking)
SELECT event_type,
       sumIfResample(0, 24, 6)(value, value > 1, toHour(ts)) AS sums_6h
FROM events GROUP BY event_type ORDER BY event_type;

-- 50. freshness-weighted activity score per user, top 10 (r8 O(rows)
-- running-window routing: no per-row frame arrays)
SELECT user_id,
       round(max(sc), 4) AS freshness_score
FROM (
  SELECT user_id,
         exponentialTimeDecayedSum(86400)(value, ts)
           OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sc
  FROM events WHERE value IS NOT NULL
)
GROUP BY user_id ORDER BY freshness_score DESC, user_id LIMIT 10;
