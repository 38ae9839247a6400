"""Pipeline plans: config-driven stage DAG with parquet materialization
boundaries and output memoization (SURVEY.md §3.1 Spark design)."""
