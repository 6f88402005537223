from icenetetl_spark.plans.icenet import IceNetPipeline

__all__ = ["IceNetPipeline"]
