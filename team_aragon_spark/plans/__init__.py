from team_aragon_spark.plans.star_queries import QUERY_REGISTRY, QueryDef

__all__ = ["QUERY_REGISTRY", "QueryDef"]
