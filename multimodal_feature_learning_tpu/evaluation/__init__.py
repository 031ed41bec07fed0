from .anet_eval import ANETCaptionsEvaluator, run_eval  # noqa: F401
