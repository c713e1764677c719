"""DataFrame-level operators. Each module re-expresses one reference
workload Spark-first (SURVEY.md §2 inventory)."""
