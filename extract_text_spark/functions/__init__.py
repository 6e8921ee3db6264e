"""Training-data-pipeline operators: deduplication, similarity search,
text analysis, multimodal plumbing.

Beyond the reference's extraction operators, a 100 TB corpus pipeline needs
corpus-level operators. Everything here is pure DataFrame/Catalyst work
(higher-order array functions, joins, windows) — no Python in the hot path
— and deliberately *engine-portable*: hashes are md5 hex strings and
arithmetic is integer/ordered-fold based, so every operator has an exact
ANSI-SQL oracle (see __spark_entry__.oracle_sql)."""
