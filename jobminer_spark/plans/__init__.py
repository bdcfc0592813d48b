from jobminer_spark.plans.explain import physical_plan

__all__ = ["physical_plan"]
