from .defaults import (  # noqa: F401
    load_config,
    load_config_test,
    load_config_train,
    recompute_losses,
)
