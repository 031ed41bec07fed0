from .defaults import load_config, load_config_train, load_config_test  # noqa: F401
