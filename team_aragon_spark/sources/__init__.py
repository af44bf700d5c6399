from team_aragon_spark.sources.catalog import load_star_tables, read_table

__all__ = ["load_star_tables", "read_table"]
