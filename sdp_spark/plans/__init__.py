from sdp_spark.plans.registry import REGISTRY, QuerySpec, register, load_all  # noqa: F401
