SELECT f.o_custkey,
       CAST(MAX(CAST(f.o_totalprice AS DECIMAL(14,2))) AS DECIMAL(14,2)) AS max_price,
       COUNT(*) AS n_orders
FROM filtered_orders f
JOIN customer_src c ON f.o_custkey = c.c_custkey
GROUP BY f.o_custkey
