SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate
FROM orders_src
WHERE o_orderdate <= TIMESTAMP '{report_date}'
  AND o_totalprice >= {min_price}
