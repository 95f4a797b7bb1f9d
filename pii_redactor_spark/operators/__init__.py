"""Spark operators: Arrow-batched UDF stages and DataFrame compositions."""
