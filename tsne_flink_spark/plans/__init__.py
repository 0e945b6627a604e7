from tsne_flink_spark.plans.explain import explain_formatted

__all__ = ["explain_formatted"]
