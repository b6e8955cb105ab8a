"""Plans: the end-to-end ER pipeline DAG and its lifecycle (run/resume)."""
