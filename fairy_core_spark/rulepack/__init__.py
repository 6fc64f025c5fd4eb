from fairy_core_spark.rulepack.loader import Rule, Rulepack, load_rulepack, rulepack_from_dict

__all__ = ["Rule", "Rulepack", "load_rulepack", "rulepack_from_dict"]
